"""Training-data preparation: packing, decontamination, repetition."""

from pyspark.sql import functions as F

from social_link_prediction_spark.pipelines import training_prep as tp


def test_pack_documents_chunk_spans(spark):
    # shard A: 3 docs of 4, 5, 3 tokens; budget 6
    # offsets 0, 4, 9 -> doc1 chunk 0; doc2 spans 0-1 (tokens 4..8);
    # doc3 spans 1-1 (tokens 9..11)
    docs = spark.createDataFrame(
        [
            (1, "A", "a b c d"),
            (2, "A", "e f g h i"),
            (3, "A", "j k l"),
            (4, "B", ""),          # empty doc: zero-width span
            (5, "B", "x y"),
        ],
        ["doc_id", "source", "text"],
    )
    out = {r.doc_id: r for r in tp.pack_documents(docs, budget=6).collect()}
    assert (out[1].start_offset, out[1].first_chunk, out[1].last_chunk) == (0, 0, 0)
    assert (out[2].start_offset, out[2].first_chunk, out[2].last_chunk) == (4, 0, 1)
    assert out[2].n_chunks == 2
    assert (out[3].start_offset, out[3].first_chunk, out[3].last_chunk) == (9, 1, 1)
    # shard B independent; empty doc 4 sits at offset 0 with n_tokens 0
    assert (out[4].n_tokens, out[4].n_chunks) == (0, 1)
    assert out[5].start_offset == 0


def test_pack_documents_shards_are_independent(spark):
    docs = spark.createDataFrame(
        [(i, "S%d" % (i % 3), "w " * 10) for i in range(30)],
        ["doc_id", "source", "text"],
    )
    out = tp.pack_documents(docs, budget=100)
    # per shard, offsets are a prefix-sum permutation: max+its tokens == total
    agg = (
        out.groupBy("source")
        .agg(
            F.max(F.col("start_offset") + F.col("n_tokens")).alias("end"),
            F.sum("n_tokens").alias("total"),
        )
        .collect()
    )
    assert all(r.end == r.total for r in agg)


def test_contamination_check_finds_known_overlap(spark):
    bench = spark.createDataFrame(
        [(100, "the quick brown fox jumps over the lazy dog")],
        ["doc_id", "text"],
    )
    train = spark.createDataFrame(
        [
            (1, "a quick brown fox appeared"),        # shares "quick brown fox"
            (2, "totally unrelated words here now"),  # clean
            (3, "the quick brown fox jumps again"),   # shares 3 trigrams
        ],
        ["doc_id", "text"],
    )
    out = {r.doc_id: r.n_shared for r in tp.contamination_check(train, bench, n=3).collect()}
    assert out[1] == 1
    assert out[3] == 3  # "the quick brown", "quick brown fox", "brown fox jumps"
    assert 2 not in out


def test_contamination_stop_shingle_cap(spark):
    bench = spark.createDataFrame([(100, "x y z")], ["doc_id", "text"])
    train = spark.createDataFrame(
        [(i, "x y z") for i in range(5)], ["doc_id", "text"]
    )
    # cap 3 < train df 5 -> the boilerplate shingle is dropped, nothing flagged
    assert tp.contamination_check(train, bench, n=3, max_doc_freq=3).count() == 0
    assert tp.contamination_check(train, bench, n=3).count() == 5


def test_repetition_stats(spark):
    docs = spark.createDataFrame(
        [
            (1, "a b a b a b"),   # bigrams: ab ba ab ba ab -> 5 total, 2 distinct
            (2, "c d e f"),       # all distinct
            (3, "x"),             # too short: absent
        ],
        ["doc_id", "text"],
    )
    out = {r.doc_id: r for r in tp.repetition_stats(docs, n=2).collect()}
    assert out[1].n_ngrams == 5
    assert abs(out[1].dup_ngram_ratio - (1 - 2 / 5)) < 1e-9
    assert abs(out[1].top_ngram_ratio - 3 / 5) < 1e-9  # "a b" occurs 3x
    assert out[2].dup_ngram_ratio == 0.0
    assert 3 not in out


def test_weighted_sample_deterministic_and_biased(spark):
    from social_link_prediction_spark.pipelines import training_prep as tp

    rows = [(i, 1000.0 if i < 10 else 0.001) for i in range(200)]
    df = spark.createDataFrame(rows, ["k", "w"])
    s1 = {r.k for r in tp.weighted_sample(df, "w", 10, ["k"], seed=1).collect()}
    s2 = {r.k for r in tp.weighted_sample(df, "w", 10, ["k"], seed=1).collect()}
    assert s1 == s2  # deterministic
    # heavy rows (1000x weight) dominate the sample
    assert len(s1 & set(range(10))) >= 8
    # zero/negative weights excluded
    dfz = spark.createDataFrame([(1, 0.0), (2, -1.0), (3, 2.0)], ["k", "w"])
    assert {r.k for r in tp.weighted_sample(dfz, "w", 5, ["k"]).collect()} == {3}


def test_kfold_grouping_stable(spark):
    from social_link_prediction_spark.pipelines import training_prep as tp

    rows = [(i % 7, i) for i in range(100)]
    df = spark.createDataFrame(rows, ["cust", "order_id"])
    out = tp.kfold_assign(df, key_cols=["cust"], n_folds=3)
    per_key = out.groupBy("cust").agg(F.countDistinct("fold").alias("nf")).collect()
    assert all(r.nf == 1 for r in per_key)  # a key never straddles folds
    assert out.select("fold").distinct().count() <= 3


def test_time_decayed_sum_halflife(spark):
    import datetime

    from social_link_prediction_spark.pipelines import training_prep as tp

    t0 = datetime.datetime(2024, 1, 1)
    rows = [
        ("a", t0, 8.0),                                  # 14 days old: w=1/4
        ("a", t0 + datetime.timedelta(days=7), 8.0),     # 7 days old:  w=1/2
        ("a", t0 + datetime.timedelta(days=14), 8.0),    # anchor:      w=1
    ]
    df = spark.createDataFrame(rows, ["g", "ts", "v"])
    out = tp.time_decayed_sum(df, "ts", "v", ["g"], half_life_days=7.0).first()
    assert out.n_events == 3
    assert abs(out.decayed_sum - (2.0 + 4.0 + 8.0)) < 1e-6


def test_mixture_plan_feasible_and_shares(spark):
    from social_link_prediction_spark.pipelines import training_prep as tp

    rows = [("en", i) for i in range(80)] + [("de", i) for i in range(15)] + [
        ("zh", i) for i in range(40)
    ]
    df = spark.createDataFrame(rows, ["lang", "doc_id"])
    plan = {r.lang: r for r in tp.mixture_plan(
        df, "lang", {"en": 0.5, "de": 0.1, "zh": 0.4}
    ).collect()}
    # binding group is en: total = floor(80/0.5) = 160? no — de: 15/0.1=150,
    # zh: 40/0.4=100 -> total=100
    assert plan["en"].planned_rows == 50
    assert plan["de"].planned_rows == 10
    assert plan["zh"].planned_rows == 40
    for r in plan.values():
        assert r.planned_rows <= r.n_available  # never upsample


def test_apply_mixture_deterministic_and_close(spark):
    from social_link_prediction_spark.pipelines import training_prep as tp

    rows = [("en", i) for i in range(400)] + [("de", i + 1000) for i in range(100)]
    df = spark.createDataFrame(rows, ["lang", "doc_id"])
    plan = tp.mixture_plan(df, "lang", {"en": 0.6, "de": 0.4})
    k1 = tp.apply_mixture(df, plan, "lang", ["doc_id"]).collect()
    k2 = tp.apply_mixture(df, plan, "lang", ["doc_id"]).collect()
    assert sorted(map(tuple, k1)) == sorted(map(tuple, k2))
    kept = {}
    for r in k1:
        kept[r.lang] = kept.get(r.lang, 0) + 1
    planned = {r.lang: r.planned_rows for r in plan.collect()}
    # hash sampling lands within a few-sigma band of the plan
    for lang, p in planned.items():
        assert abs(kept.get(lang, 0) - p) <= 4 * max(1, p) ** 0.5


def test_epoch_order_reproducible_and_epoch_dependent(spark):
    from social_link_prediction_spark.pipelines import training_prep as tp

    df = spark.createDataFrame([(i,) for i in range(200)], ["doc_id"])
    o1 = [r.doc_id for r in tp.epoch_order(df, ["doc_id"], epoch=0).collect()]
    o2 = [r.doc_id for r in tp.epoch_order(df, ["doc_id"], epoch=0).collect()]
    o3 = [r.doc_id for r in tp.epoch_order(df, ["doc_id"], epoch=1).collect()]
    assert o1 == o2          # restart replays the same order
    assert o1 != o3          # epochs permute differently
    assert sorted(o1) == list(range(200))  # it's a permutation
    assert o1 != list(range(200))          # and genuinely shuffled


def test_epoch_order_sharded_global_order(spark):
    from social_link_prediction_spark.pipelines import training_prep as tp

    df = spark.createDataFrame([(i,) for i in range(500)], ["doc_id"])
    sharded = tp.epoch_order(df, ["doc_id"], epoch=2, n_shards=4)
    # per-partition __order ranges must not overlap (global order =
    # shard order concatenated)
    parts = sharded.rdd.glom().collect()
    ranges = [
        (min(r["__order"] for r in p), max(r["__order"] for r in p))
        for p in parts if p
    ]
    ranges.sort()
    for (_, hi1), (lo2, _) in zip(ranges, ranges[1:]):
        assert hi1 <= lo2


def test_mixture_plan_infeasible_target_group(spark):
    # ADVICE-r3: a positive-share group with zero corpus rows must not
    # be silently dropped from the plan.
    df = spark.createDataFrame([("en",)] * 10, "lang string")
    plan = tp.mixture_plan(df, "lang", {"en": 0.5, "xx": 0.5})
    rows = {r.lang: r for r in plan.collect()}
    assert set(rows) == {"en", "xx"}
    assert rows["xx"].n_available == 0
    # no-upsample total collapses to 0 — the plan cannot over-claim
    assert rows["en"].planned_rows == 0 and rows["xx"].planned_rows == 0
    assert rows["xx"].keep_rate == 0.0
    import pytest as _pytest

    with _pytest.raises(ValueError, match="xx"):
        tp.mixture_plan(df, "lang", {"en": 0.5, "xx": 0.5}, strict=True)


def test_mixture_plan_feasible_unchanged_by_left_join(spark):
    df = spark.createDataFrame([("en",)] * 80 + [("vi",)] * 20, "lang string")
    plan = {r.lang: r for r in tp.mixture_plan(df, "lang", {"en": 0.5, "vi": 0.5}).collect()}
    # limited by vi: total = floor(20/0.5) = 40 -> 20 rows each
    assert plan["en"].planned_rows == 20 and plan["vi"].planned_rows == 20


def test_greedy_max_coverage_laws(spark):
    """Greedy coverage: gains are non-increasing (submodularity of
    marginal gains along the greedy sequence), covered_total is the
    running sum of gains, picks are distinct, and round 1 picks the
    doc with the most distinct shingles (min-id tie-break)."""
    import pytest as _pytest

    from social_link_prediction_spark.pipelines import training_prep as tp

    docs = spark.createDataFrame(
        [
            (1, "a b c d e f g h"),          # 6 trigrams
            (2, "a b c d e f g h"),          # duplicate of 1 -> gain 0 later
            (3, "x y z w v u"),              # 4 fresh trigrams
            (4, "a b c x y z"),              # mix, partially covered
            (5, "p q r"),                    # 1 trigram
        ],
        "doc_id long, text string",
    )
    rows = tp.greedy_max_coverage(docs, k=4, ngram=3).orderBy("round").collect()
    gains = [r.gain for r in rows]
    assert gains == sorted(gains, reverse=True)
    assert rows[0].doc_id == 1  # most shingles, id 1 beats dup id 2
    run = 0
    for r in rows:
        run += r.gain
        assert r.covered_total == run
    assert len({r.doc_id for r in rows}) == len(rows)
    with _pytest.raises(ValueError):
        tp.greedy_max_coverage(docs, k=0)
    # string doc ids must round-trip: the result schema derives doc_id
    # from the input id column's type instead of hardcoding long.
    sdocs = docs.select(
        F.concat(F.lit("doc-"), F.col("doc_id")).alias("doc_id"), "text"
    )
    srows = tp.greedy_max_coverage(sdocs, k=2, ngram=3).orderBy("round").collect()
    assert srows[0].doc_id == "doc-1"
    assert [r.gain for r in srows] == gains[:2]
