"""LLM-pipeline operators: text stats, dedup family, similarity."""

import math

from pyspark.sql import functions as F

from social_link_prediction_spark.pipelines import dedup as pdd
from social_link_prediction_spark.pipelines import similarity as sim
from social_link_prediction_spark.pipelines import text as ptx


def test_text_stats(spark):
    df = spark.createDataFrame([(1, "the cat the cat !")], ["doc_id", "text"])
    row = ptx.text_stats(df).first()
    assert row.n_tokens == 5
    assert abs(row.distinct_ratio - 3 / 5) < 1e-9
    assert abs(row.punct_ratio - 1 / 5) < 1e-9
    assert abs(row.stopword_ratio - 2 / 5) < 1e-9  # 'the' twice


def test_language_id(spark):
    df = spark.createDataFrame(
        [(1, "the cat and the dog"), (2, "el perro y la casa de que"), (3, "xyz qqq")],
        ["doc_id", "text"],
    )
    out = {r.doc_id: r.lang_pred for r in ptx.language_id(df).collect()}
    assert out == {1: "en", 2: "es", 3: "unknown"}


def test_exact_dedup(documents_df):
    groups = pdd.exact_duplicate_groups(documents_df).collect()
    assert len(groups) == 1 and groups[0].n_docs == 2  # 1 and 101
    kept = pdd.drop_exact_duplicates(documents_df)
    assert kept.count() == documents_df.count() - 1
    assert kept.filter(F.col("doc_id") == 101).count() == 0  # min id kept


def test_minhash_finds_planted_neardups(documents_df):
    pairs = pdd.minhash_dedup_pairs(documents_df, k=8, rows_per_band=2, n=1, threshold=0.8)
    found = {(r.id_a, r.id_b) for r in pairs.collect()}
    assert (0, 100) in found  # shuffled copy: token-set jaccard 1.0
    assert (1, 101) in found  # exact copy
    j = {(r.id_a, r.id_b): r.jaccard for r in pairs.collect()}
    assert j[(1, 101)] == 1.0


def test_jaccard_values(spark):
    df = spark.createDataFrame(
        [(1, "a b c d"), (2, "a b c e")], ["doc_id", "text"]
    )
    sh = pdd.shingle_table(df, n=1)
    pairs = spark.createDataFrame([(1, 2)], ["id_a", "id_b"])
    row = pdd.jaccard_for_pairs(pairs, sh).first()
    assert abs(row.jaccard - 3 / 5) < 1e-9


def test_simhash_similar_docs_close(documents_df):
    sig = {r.doc_id: r.simhash for r in pdd.simhash(documents_df).collect()}
    def ham(a, b):
        return bin(a ^ b).count("1")
    # one-token edit (2 vs 102) must be closer than unrelated docs
    assert ham(sig[2], sig[102]) < ham(sig[2], sig[5])
    assert ham(sig[1], sig[101]) == 0  # identical docs


def test_shingles(spark):
    df = spark.createDataFrame([("a b c d",)], ["text"]).select(
        pdd.shingles("text", n=3).alias("sh")
    )
    assert df.first().sh == ["a b c", "b c d"]


def test_cosine_and_topk(spark):
    rows = [(0, [1.0, 0.0]), (1, [0.9, 0.1]), (2, [0.0, 1.0]), (3, [-1.0, 0.0])]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    out = sim.brute_force_topk(df.filter("vec_id != 0"), [1.0, 0.0], k=2).collect()
    assert [r.vec_id for r in out] == [1, 2]
    assert abs(out[0].cosine - 0.9 / math.hypot(0.9, 0.1)) < 1e-6


def test_srp_bucketed_topk_recall(spark):
    import random

    random.seed(1)
    rows = [(i, [random.gauss(0, 1) for _ in range(8)]) for i in range(200)]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    q = rows[5][1]
    exact = [r.vec_id for r in sim.brute_force_topk(df, q, k=5).collect()]
    approx = [r.vec_id for r in sim.srp_bucketed_topk(df, q, k=5, n_planes=4).collect()]
    # multi-probe SRP should recover most of the exact top-5
    assert len(set(exact) & set(approx)) >= 3


def test_ivf_assign(spark):
    df = spark.createDataFrame([(0, [1.0, 0.0]), (1, [0.0, 1.0])], ["vec_id", "embedding"])
    out = {r.vec_id: r.ivf_cell for r in sim.ivf_assign(df, [[1.0, 0.0], [0.0, 1.0]]).collect()}
    assert out == {0: 0, 1: 1}


def test_simhash_neardup_recovers_planted_pair(spark):
    base = "the quick brown fox jumps over the lazy dog again and again today"
    rows = [
        (1, base),
        (2, base + " ok"),  # near-identical token set -> tiny hamming
        (3, "completely different content about spark shuffles and parquet files"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    from social_link_prediction_spark.pipelines.dedup import simhash_neardup_pairs

    out = simhash_neardup_pairs(df, max_hamming=10).collect()
    pairs = {(r.id_a, r.id_b) for r in out}
    assert (1, 2) in pairs
    assert all(p != (1, 3) and p != (2, 3) for p in pairs)


def test_media_frame_plan_counts(spark):
    rows = [(1, "video", b"x", 3500), (2, "image", b"y", 0)]
    df = spark.createDataFrame(rows, ["media_id", "kind", "content", "duration_ms"])
    from social_link_prediction_spark.pipelines.multimodal import frame_sample_plan

    out = frame_sample_plan(df, every_ms=1000)
    ts = [r.frame_ts_ms for r in out.collect()]
    assert ts == [0, 1000, 2000, 3000]  # image row filtered out


def _winnow_reference(text, k=7, window=4, base=257):
    """Pure-Python winnowing oracle (Schleimer et al. 2003)."""
    import re

    s = re.sub("[^a-z0-9]", "", text.lower())
    hashes = []
    for i in range(len(s) - k + 1):
        h = 0
        for ch in s[i : i + k]:
            h = h * base + ord(ch)
        hashes.append(h)
    return {min(hashes[i : i + window]) for i in range(len(hashes) - window + 1)}


def test_winnow_fingerprints_match_reference(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "pack my box with five dozen liquor jugs"),
        (3, "ab"),  # shorter than k -> no fingerprints
        (4, "exactly7"),  # one gram only -> fewer than `window` grams
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = ptx.winnow_fingerprints(df, "text", k=7, window=4).collect()
    got = {}
    for r in out:
        got.setdefault(r.id, set()).add(r.fp)
    for doc_id, text in rows:
        assert got.get(doc_id, set()) == _winnow_reference(text), doc_id


def test_winnow_shared_substring_guarantee(spark):
    # Winnowing guarantee: a shared substring of length >= k + window - 1
    # (= 10 normalized chars here) always yields a shared fingerprint.
    shared = "identicalpassagehere"
    rows = [
        (1, "left context " + shared + " right tail"),
        (2, "totally other prefix " + shared + " and suffix"),
        (3, "no overlap with anything interesting"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    pairs = ptx.winnow_neardup_pairs(df, "text", k=7, window=4, min_shared=1)
    found = {(r.id_a, r.id_b) for r in pairs.collect()}
    assert (1, 2) in found


def test_winnow_neardup_planted_copy(documents_df):
    # doc 101 is an exact copy of doc 1: every fingerprint is shared.
    pairs = ptx.winnow_neardup_pairs(documents_df, min_shared=3).collect()
    assert (1, 101) in {(r.id_a, r.id_b) for r in pairs}


def test_winnow_stop_fingerprint_cap_bounds_pairs(spark):
    """Skew guard: a boilerplate substring shared by EVERY document
    would alone emit O(n²) pairs from one degenerate fingerprint
    bucket. With max_bucket below the corpus size, boilerplate-only
    fingerprints are dropped: pairs held together only by boilerplate
    vanish, while a pair sharing distinct non-boilerplate content
    survives. With the default (large) cap behavior is unchanged."""
    import hashlib

    boiler = "standardlicenseheaderparagraphrepeatedeverywhere"
    # per-doc filler = md5 hex (no shared >=k-gram between fillers), so
    # the ONLY cross-filler signal is the boilerplate.
    rows = [
        (i, f"{boiler} {hashlib.md5(str(i).encode()).hexdigest()}")
        for i in range(1, 21)
    ]
    # docs 100/101 share REAL content beyond the boilerplate
    rows += [
        (100, boiler + " the quick brown fox jumps over the lazy dog"),
        (101, boiler + " the quick brown fox jumps over the lazy dog again"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    capped = {
        (r.id_a, r.id_b)
        for r in ptx.winnow_neardup_pairs(
            df, "text", k=7, window=4, min_shared=1, max_bucket=10
        ).collect()
    }
    assert (100, 101) in capped  # real shared content survives the cap
    # boilerplate-only pairs are gone: nothing pairs the filler docs
    assert not any(a <= 20 and b <= 20 for a, b in capped)
    uncapped = {
        (r.id_a, r.id_b)
        for r in ptx.winnow_neardup_pairs(
            df, "text", k=7, window=4, min_shared=1
        ).collect()
    }
    # default cap (1000) >> corpus: every doc pairs with every other
    # through the shared boilerplate — the quadratic blowup the guard
    # exists to stop.
    assert len(uncapped) == 22 * 21 // 2


def test_neardup_clusters(spark):
    docs = spark.createDataFrame([(i, f"doc {i}") for i in range(6)], ["doc_id", "text"])
    # pair graph: 0-1, 1-2 chain; 4-5; 3 isolated
    pairs = spark.createDataFrame([(0, 1), (1, 2), (4, 5)], ["id_a", "id_b"])
    out = {r.id: (r.cluster, r.is_canonical) for r in pdd.neardup_clusters(docs, pairs).collect()}
    assert out == {0: (0, 1), 1: (0, 0), 2: (0, 0), 3: (3, 1), 4: (4, 1), 5: (4, 0)}


def test_lexicon_sentiment_arithmetic(spark):
    from social_link_prediction_spark.pipelines import text as ptx

    df = spark.createDataFrame(
        [(1, "fast fast slow other"), (2, "neutral words only here")],
        ["doc_id", "text"],
    )
    out = {r.id: r for r in ptx.lexicon_sentiment(
        df, {"fast": 1.0, "slow": -1.0}
    ).collect()}
    assert out[1].n_tokens == 4 and abs(out[1].valence_sum - 1.0) < 1e-9
    assert abs(out[1].sentiment - 0.25) < 1e-9
    assert out[2].valence_sum == 0.0 and out[2].sentiment == 0.0


def test_sequence_trigrams_order_and_dedup(spark):
    import datetime

    from social_link_prediction_spark.pipelines import trajectory as ptraj

    t0 = datetime.datetime(2024, 1, 1)
    rows = [
        # user 1: a b a b a  -> trigrams a|b|a, b|a|b, a|b|a -> 2 distinct
        (1, "a", t0, 1), (1, "b", t0, 2), (1, "a", t0, 3),
        (1, "b", t0, 4), (1, "a", t0, 5),
        # user 2: too short for any trigram
        (2, "a", t0, 6), (2, "b", t0, 7),
    ]
    df = spark.createDataFrame(rows, ["user_id", "event_type", "ts", "event_id"])
    g = ptraj.sequence_trigrams(df).collect()
    got = {(r.id, r.tg) for r in g}
    assert got == {(1, "a|b|a"), (1, "b|a|b")}


def test_jaccard_pairs_topk_values(spark):
    from social_link_prediction_spark.pipelines import trajectory as ptraj

    grams = spark.createDataFrame(
        [(1, "x"), (1, "y"), (2, "x"), (2, "y"), (3, "x"), (3, "z")],
        ["id", "tg"],
    )
    top = ptraj.jaccard_pairs_topk(grams, k=3).collect()
    by_pair = {(r.id_a, r.id_b): r.jaccard for r in top}
    assert by_pair[(1, 2)] == 1.0
    assert abs(by_pair[(1, 3)] - 1 / 3) < 1e-6  # rounded to 6 before ranking
    assert abs(by_pair[(2, 3)] - 1 / 3) < 1e-6
    assert top[0].id_a == 1 and top[0].id_b == 2  # ranked first


def test_minhash_dedup_auto_finds_planted_neardup(spark):
    from social_link_prediction_spark.pipelines.dedup import minhash_dedup_auto

    base = "the quick brown fox jumps over the lazy dog again and again today"
    near = base.replace("today", "tonight")
    far = "completely different words about spark catalyst tungsten optimizers"
    docs = spark.createDataFrame(
        [(1, base), (2, near), (3, far)], ["doc_id", "text"]
    )
    pairs = minhash_dedup_auto(docs, threshold=0.5).collect()
    found = {(r.id_a, r.id_b) for r in pairs}
    assert (1, 2) in found
    assert all(3 not in p for p in found)


def test_quality_survivors_keeps_best_not_first(spark):
    """Survivor = argmax score (id tie-break), NOT min id: a cluster
    whose best copy has the larger id must keep the larger id."""
    from pyspark.sql import functions as F

    from social_link_prediction_spark.pipelines import dedup as pdd

    docs = spark.createDataFrame(
        [(1, "a b"), (2, "a b c d e"), (3, "x y"), (5, "q"), (4, "x y z")],
        "doc_id long, text string",
    )
    pairs = spark.createDataFrame(
        [(1, 2), (3, 4)], "id_a long, id_b long"
    )
    score = F.size(F.array_distinct(F.split("text", " ")))
    out = {
        r.id: (r.cluster, r.score, r.is_survivor)
        for r in pdd.quality_survivors(docs, pairs, score).collect()
    }
    # cluster {1,2}: doc 2 is richer -> survives despite larger id
    assert out[2][2] == 1 and out[1][2] == 0
    # cluster {3,4}: doc 4 richer
    assert out[4][2] == 1 and out[3][2] == 0
    # singleton survives itself
    assert out[5][2] == 1
    # exactly one survivor per cluster
    assert out[1][0] == out[2][0] and out[3][0] == out[4][0]


def test_ppjoin_equals_brute_force_and_prunes(spark):
    """Prefix-filter completeness: ppjoin finds EXACTLY the pairs a
    brute-force all-pairs Jaccard finds (no false negatives from the
    pruning, no false positives from the verify), and the prefix index
    is strictly smaller than the full inverted index."""
    import random

    from pyspark.sql import functions as F

    from social_link_prediction_spark.pipelines import dedup as pdd

    rng = random.Random(11)
    vocab = [f"w{i}" for i in range(40)]
    base = [" ".join(rng.choice(vocab) for _ in range(30)) for _ in range(20)]
    rows = [(i, t) for i, t in enumerate(base)]
    # planted near-dups: single-token edits of existing docs
    for j, src in enumerate(base[:5]):
        toks = src.split()
        toks[3] = "edited"
        rows.append((100 + j, " ".join(toks)))
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    t = 0.6
    pp = {
        (r.id_a, r.id_b, r.jaccard)
        for r in pdd.ppjoin_pairs(docs, threshold=t, ngram=3).collect()
    }

    # brute force over python sets
    def sh3(s):
        tk = [x for x in s.split(" ") if x]
        return {" ".join(tk[i : i + 3]) for i in range(len(tk) - 2)}

    sets = {i: sh3(t_) for i, t_ in rows}
    brute = set()
    ids = sorted(sets)
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            a, b = sets[ids[i]], sets[ids[j]]
            inter = len(a & b)
            if not a or not b:
                continue
            jac = round(inter / (len(a) + len(b) - inter), 6)
            if jac >= t:
                brute.add((ids[i], ids[j], jac))
    assert pp == brute and len(brute) >= 5


def test_markov_journey_construction(spark):
    """Pinned edge semantics: purchase closes its journey, trailing
    touches absorb to null, touchless purchase is start->conv."""
    from social_link_prediction_spark.pipelines.attribution import (
        journey_transitions,
    )

    ev = spark.createDataFrame(
        [
            (1, 1, 10, "view"), (1, 2, 11, "purchase"),
            (2, 1, 20, "click"),
            (3, 1, 30, "purchase"),
            (4, 1, 40, "view"), (4, 2, 41, "view"),
        ],
        "user_id long, ts long, event_id long, event_type string",
    )
    got = {
        (r["src"], r["dst"]): r["n"] for r in journey_transitions(ev).collect()
    }
    assert got == {
        ("start", "view"): 2,
        ("view", "conv"): 1,
        ("start", "click"): 1,
        ("click", "null"): 1,
        ("start", "conv"): 1,
        ("view", "view"): 1,
        ("view", "null"): 1,
    }


def test_markov_removal_effect_pinned():
    """view carries every conversion -> RE(view)=1 and all credit;
    click never converts -> RE(click)=0."""
    from social_link_prediction_spark.pipelines.attribution import (
        markov_removal_effects,
    )

    trans = [
        ("start", "view", 1), ("view", "conv", 1),
        ("start", "click", 1), ("click", "null", 1),
    ]
    out = {d["channel"]: d for d in markov_removal_effects(trans)}
    assert out["view"]["removal_effect"] == 1.0
    assert out["click"]["removal_effect"] == 0.0
    assert out["view"]["attributed_conversions"] == 1.0
    assert out["click"]["attributed_conversions"] == 0.0
    assert out["view"]["p_conv_base"] == 0.5


def test_markov_no_conversions_is_all_zero():
    from social_link_prediction_spark.pipelines.attribution import (
        markov_removal_effects,
    )

    trans = [("start", "view", 3), ("view", "null", 3)]
    for d in markov_removal_effects(trans):
        assert d["removal_effect"] == 0.0
        assert d["attributed_conversions"] == 0.0


def test_bpe_learn_merges_hand_computed(spark):
    """BPE on a 2-word corpus: freq-weighted pair counts, greedy
    left-to-right merge, deterministic ties — hand-replayable.
    'abab'x2 + 'ab'x3: (a,b) counts 2*2+3=7 beats (b,a)=2; after the
    merge the only adjacent pair is (ab,ab) from 'abab'."""
    from social_link_prediction_spark.pipelines import text as tx

    wf = spark.createDataFrame([("abab", 2), ("ab", 3)], ["word", "freq"])
    out = {r["round"]: r for r in tx.bpe_learn_merges(wf, rounds=2).collect()}
    assert (out[1]["left"], out[1]["right"], out[1]["pair_freq"]) == ("a", "b", 7)
    assert out[1]["merged"] == "ab"
    assert (out[2]["left"], out[2]["right"], out[2]["pair_freq"]) == ("ab", "ab", 2)
    assert out[2]["merged"] == "abab"


def test_blocked_exact_top1_equals_sql_twin(spark):
    """blocked_exact_top1 (numpy block scoring) must equal the pure-SQL
    window top-1 over the single-fold dot device — same rounded cosine,
    same min-id tie-break — and count() must agree with collect()
    (regression: a self-cogroup shape let column pruning empty the
    replicated side under count-only plans)."""
    import random

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    random.seed(7)
    rows = [(i, [random.gauss(0, 1) for _ in range(6)]) for i in range(60)]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    out = sim.blocked_exact_top1(df, n_blocks=4)
    got = {r.ai: (r.bi, r.cos) for r in out.collect()}
    assert out.count() == len(got) == 60

    e = df.select(
        F.col("vec_id").alias("id"),
        F.col("embedding").cast("array<double>").alias("v"),
    ).withColumn("n", sim.l2_norm(F.col("v")))
    a, b = e.alias("a"), e.alias("b")
    sc = a.join(b, F.col("a.id") != F.col("b.id")).select(
        F.col("a.id").alias("ai"),
        F.col("b.id").alias("bi"),
        F.round(
            sim.dot(F.col("a.v"), F.col("b.v")) / (F.col("a.n") * F.col("b.n")), 6
        ).alias("cos"),
    )
    w = Window.partitionBy("ai").orderBy(F.desc("cos"), "bi")
    want = {
        r.ai: (r.bi, r.cos)
        for r in sc.withColumn("rr", F.row_number().over(w))
        .filter("rr = 1")
        .collect()
    }
    assert got == want


def test_blocked_exact_topk_laws(spark):
    """k>1 path: per-vector ranks are exactly 1..k, cosine is
    non-increasing in rank, and rank-1 agrees with blocked_exact_top1."""
    import random

    random.seed(11)
    rows = [(i, [random.gauss(0, 1) for _ in range(5)]) for i in range(40)]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    out = sim.blocked_exact_topk(df, k=3, n_blocks=4).collect()
    per = {}
    for r in out:
        per.setdefault(r.ai, []).append((r.rank, r.cos, r.bi))
    assert len(per) == 40
    for ai, lst in per.items():
        lst.sort()
        assert [x[0] for x in lst] == [1, 2, 3]
        assert lst[0][1] >= lst[1][1] >= lst[2][1]
    top1 = {r.ai: (r.bi, r.cos) for r in sim.blocked_exact_top1(df, n_blocks=4).collect()}
    assert top1 == {ai: (lst[0][2], lst[0][1]) for ai, lst in
                    ((a, sorted(l)) for a, l in per.items())}
