"""Fuzzy search (F1-F4): FIXTURES.md invariants 10."""

from pyspark.sql import functions as F

from social_link_prediction_spark.search import fuzzy


def _index(spark):
    nodes = spark.createDataFrame(
        [
            ("Q1", "Taylor Swift", "human", 0),
            ("Q2", "Taylor Swift", "human", 1),  # homonym
            ("Q3", "Sơn Tùng M-TP", "human", 2),
            ("Q4", "Taylor", "human", 3),
            ("Q5", "Completely Different", "human", 4),
        ],
        ["id", "name", "type", "pyg_id"],
    )
    return nodes, fuzzy.build_search_index(nodes)


def test_exact_match_scores_100(spark):
    _, idx = _index(spark)
    out = fuzzy.fuzzy_lookup(idx, "taylor swift")
    rows = out.collect()
    assert all(r.score == 100.0 for r in rows)
    assert {r.id for r in rows} == {"Q1", "Q2"}  # homonyms both returned


def test_diacritic_exact(spark):
    _, idx = _index(spark)
    out = fuzzy.fuzzy_lookup(idx, "son tung m-tp").collect()
    assert len(out) == 1 and out[0].id == "Q3"


def test_cutoff_drops_garbage(spark):
    _, idx = _index(spark)
    out = fuzzy.fuzzy_lookup(idx, "zzzzqqqq").collect()
    assert out == []  # invariant 10: below threshold 60 dropped


def test_prefix_bonus_ranks_prefix_first(spark):
    _, idx = _index(spark)
    out = fuzzy.fuzzy_lookup(idx, "taylor swif").collect()
    assert out and out[0].name.startswith("Taylor")


def test_pyg_translation(spark):
    nodes, _ = _index(spark)
    fwd = fuzzy.id_to_pyg(nodes, "Q3").first()
    assert (fwd.type, fwd.pyg_id) == ("human", 2)
    back = fuzzy.pyg_to_id(nodes, "human", 2).first()
    assert back.id == "Q3"


def test_fuzzy_levenshtein_scorer_forced(spark):
    idx_src = spark.createDataFrame(
        [(1, "small ring"), (2, "smoke grenade"), (3, "ring")], ["id", "name"]
    )
    from social_link_prediction_spark.search import fuzzy as fz

    idx = fz.build_search_index(idx_src)
    out = fz.fuzzy_lookup(idx, "smal ring", scorer="levenshtein").collect()
    assert out and out[0].id == 1  # 1 edit away, prefix-adjacent


# --- WRatio parity (reference fuzzy_search.py:54-88): pure-Python
# scorer path, pinned expected scores computed from the public WRatio
# recipe (ratio/token/partial combination, scales 0.95/0.9/0.6).
def test_wratio_pure_python_pinned_scores():
    from social_link_prediction_spark.search import wratio as wr

    # identical / empty
    assert wr.wratio("taylor swift", "taylor swift") == 100.0
    assert wr.wratio("", "anything") == 0.0
    # ratio: InDel similarity. "abcd" vs "abce": LCS=3, dist=2, total=8 -> 75
    assert wr.ratio("abcd", "abce") == 75.0
    # token_sort: word order invariant
    assert wr.token_sort_ratio("swift taylor", "taylor swift") == 100.0
    # token-sort reordering through wratio: scaled by 0.95
    assert wr.wratio("swift taylor", "taylor swift") == 95.0
    # token_set: subset tokens score 100 (inter vs inter+diff)
    assert wr.token_set_ratio("taylor", "taylor swift") == 100.0
    # partial path: len_ratio = 12/4 = 3 >= 1.5 -> partial_ratio * 0.9;
    # "ring" appears exactly inside "small ring xx" windows -> 100*0.9
    assert wr.partial_ratio("ring", "small ring xx") == 100.0
    assert wr.wratio("ring", "small ring xx") == 90.0
    # long-vs-short branch: len_ratio >= 8 -> partial scale 0.6
    assert wr.wratio("ab", "ab" + "x" * 14) == 60.0
    # edge-clipped partial alignment (rapidfuzz semantics): the best
    # window for 'abcd' in 'zzzabc' is the clipped suffix 'abc'
    assert abs(wr.partial_ratio("abcd", "zzzabc") - 600.0 / 7.0) < 1e-9


def test_rescore_arithmetic_pinned_both_paths(spark):
    """The reference re-scoring (-30 short, +20 prefix, +10 substring,
    cutoff 60) against recorded expected scores, on the WRatio path and
    the levenshtein path."""
    from social_link_prediction_spark.search import fuzzy as fz

    src = spark.createDataFrame(
        [
            (1, "taylor swift"),     # prefix of the query -> +20, capped ranking
            (2, "taylor swift fan club here"),  # query is substring, not prefix
            (3, "tay"),              # < half query length -> -30
            (4, "unrelated zzz"),
        ],
        ["id", "name"],
    )
    idx = fz.build_search_index(src)
    q = "taylor swift f"
    names = {1: "taylor swift", 2: "taylor swift fan club here", 3: "tay", 4: "unrelated zzz"}

    def expected(base_fn):
        # the reference's arithmetic, replicated driver-side:
        # -30 if len(name)/len(q) < 0.5; +20 if name startswith q;
        # +10 if q in name but not prefix; cutoff 60
        exp = {}
        for i, n in names.items():
            s = base_fn(q, n)
            if len(n) / len(q) < 0.5:
                s -= 30
            if n.startswith(q):
                s += 20
            elif q in n:
                s += 10
            if s >= 60:
                exp[i] = s
        return exp

    # WRatio path (rapidfuzz absent in this sandbox -> pure-Python twin)
    from social_link_prediction_spark.search import wratio as wr

    out = {r.id: r.score for r in fz.fuzzy_lookup(idx, q, scorer="wratio", prefilter=False).collect()}
    exp = expected(wr.wratio)
    assert set(out) == set(exp)
    for i in exp:
        assert abs(out[i] - exp[i]) < 1e-9, (i, out[i], exp[i])
    assert 2 in out and out[2] > wr.wratio(q, names[2])  # prefix bonus applied
    assert 4 not in out  # cutoff

    # levenshtein path: deterministic JVM arithmetic, same re-scoring
    def lev_base(qq, n):
        import math

        # plain Levenshtein DP (names are tiny)
        m, k = len(qq), len(n)
        d = list(range(k + 1))
        for i in range(1, m + 1):
            prev, d[0] = d[0], i
            for j in range(1, k + 1):
                prev, d[j] = d[j], min(d[j] + 1, d[j - 1] + 1, prev + (qq[i - 1] != n[j - 1]))
        return 100.0 * (1.0 - d[k] / max(m, k))

    lev = {r.id: r.score for r in fz.fuzzy_lookup(idx, q, scorer="levenshtein", prefilter=False).collect()}
    lexp = expected(lev_base)
    assert set(lev) == set(lexp)
    for i in lexp:
        assert abs(lev[i] - lexp[i]) < 1e-6, (i, lev[i], lexp[i])
