"""Property-based checks (hypothesis) for the invariants the oracle
can't see: idempotence, partition laws, exact-vs-sketch agreement.
Each test generates small relations driver-side and runs them through
the real Spark operators (few examples — Spark's per-action latency
dominates, the properties don't need volume)."""

import os

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

_needs_testdata = pytest.mark.skipif(
    not os.path.isdir("/root/testdata/sf0.001"),
    reason="driver testdata not present",
)

_ids = st.text(alphabet="abcdef", min_size=1, max_size=4)
_edges = st.lists(st.tuples(_ids, _ids, st.sampled_from(["r1", "r2"])), min_size=1, max_size=30)

_slow = settings(
    max_examples=5, deadline=None, suppress_health_check=list(HealthCheck)
)


@given(rows=_edges)
@_slow
def test_canonicalize_idempotent_and_unique(spark, rows):
    from social_link_prediction_spark.operators.dedup import canonicalize_edges

    df = spark.createDataFrame(rows, ["person", "object", "relationship_label"])
    once = canonicalize_edges(df)
    twice = canonicalize_edges(once)
    assert once.count() == twice.count()
    # canonical (least, greatest, rel) keys are unique after one pass
    keys = once.select(
        F.least("person", "object"), F.greatest("person", "object"), "relationship_label"
    )
    assert keys.count() == keys.dropDuplicates().count()


@given(rows=_edges)
@_slow
def test_link_split_is_a_partition(spark, rows):
    from social_link_prediction_spark.ml import linksplit as mls

    df = spark.createDataFrame(rows, ["src", "dst", "rel"]).dropDuplicates()
    n = df.count()
    train, val, test = mls.link_split(df, val_frac=0.3, test_frac=0.3, seed=5)
    nt, nv, ns = train.count(), val.count(), test.count()
    assert nt + nv + ns == n  # disjoint cover
    # determinism: re-running produces identical buckets
    t2, v2, s2 = mls.link_split(df, val_frac=0.3, test_frac=0.3, seed=5)
    assert t2.count() == nt and v2.count() == nv and s2.count() == ns
    assert train.exceptAll(t2).count() == 0


@given(
    docs=st.lists(
        st.text(alphabet="ab ", min_size=3, max_size=40), min_size=2, max_size=6
    )
)
@_slow
def test_jaccard_matches_python_sets(spark, docs):
    from social_link_prediction_spark.pipelines.dedup import (
        jaccard_for_pairs, shingle_table,
    )

    rows = [(i, d) for i, d in enumerate(docs)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    sh = shingle_table(df, n=1)
    pairs = spark.createDataFrame(
        [(a, b) for a in range(len(docs)) for b in range(a + 1, len(docs))],
        ["id_a", "id_b"],
    )
    got = {(r.id_a, r.id_b): r.jaccard for r in jaccard_for_pairs(pairs, sh).collect()}

    def toks(s):
        return set(t for t in s.split() if t)

    for (a, b), j in got.items():
        sa, sb = toks(docs[a]), toks(docs[b])
        if not sa and not sb:
            continue  # 0/0 division yields null on both paths
        expect = len(sa & sb) / len(sa | sb) if (sa | sb) else 0.0
        assert j is None and not (sa or sb) or abs(j - round(expect, 6)) < 1e-9


@given(names=st.lists(st.text(min_size=0, max_size=12), min_size=1, max_size=8))
@_slow
def test_normalize_name_idempotent(spark, names):
    from social_link_prediction_spark.operators.cleaning import normalize_name

    df = spark.createDataFrame([(n,) for n in names], ["name"])
    out = df.select(
        normalize_name("name").alias("a"),
        normalize_name(normalize_name("name")).alias("b"),
    )
    assert out.filter(~F.col("a").eqNullSafe(F.col("b"))).count() == 0


def test_ccdf_shape_properties(spark):
    """SURVEY §5: CCDF starts at 1 for the minimum degree, is strictly
    positive, non-increasing, and the pdf column sums to 1."""
    import random

    from social_link_prediction_spark.operators.aggregates import degree_distribution

    random.seed(7)
    rows = [(f"u{random.randint(0, 40)}", i) for i in range(300)]
    df = spark.createDataFrame(rows, ["person", "x"])
    out = degree_distribution(df, "person").collect()
    assert abs(sum(r.pdf for r in out) - 1.0) < 1e-9
    assert abs(out[0].ccdf - 1.0) < 1e-9
    ccdfs = [r.ccdf for r in out]
    assert all(a >= b - 1e-12 for a, b in zip(ccdfs, ccdfs[1:]))
    assert all(c > 0 for c in ccdfs)


def test_powerlaw_gamma_recovers_known_exponent(spark):
    """SURVEY §5: the Clauset MLE aggregate recovers the exponent of a
    synthetic discrete power-law tail (inverse-CDF sample, gamma=2.5)
    to within sampling error."""
    import random

    from social_link_prediction_spark.operators.aggregates import powerlaw_gamma

    random.seed(11)
    gamma_true, k_min, n = 2.5, 10, 4000
    # continuous Pareto inverse CDF, floored: standard discrete
    # power-law generator (Clauset et al. 2009, App. D)
    ks = [
        int((k_min - 0.5) * (1.0 - random.random()) ** (-1.0 / (gamma_true - 1.0)) + 0.5)
        for _ in range(n)
    ]
    # one synthetic "edge" row per unit of degree: node i has degree ks[i]
    rows = [(f"n{i}", j) for i, k in enumerate(ks) for j in range(k)]
    df = spark.createDataFrame(rows, ["person", "x"])
    got = powerlaw_gamma(df, "person", k_min=k_min).collect()[0]
    assert got.n_tail == n
    assert abs(got.gamma - gamma_true) < 0.1


@given(
    rows=st.lists(
        st.tuples(st.integers(0, 50), st.integers(0, 1000)), min_size=1, max_size=40
    ),
    n_salts=st.sampled_from([2, 7]),
)
@_slow
def test_salted_aggregate_partition_law(spark, rows, n_salts):
    """Two-phase salted aggregation == plain aggregation for any data
    and salt count (sum/count/min/max are algebraic)."""
    from social_link_prediction_spark.operators import joins as jn

    df = spark.createDataFrame(rows, ["k", "v"])
    plain = {
        (r["k"]): (r["s"], r["c"], r["mn"], r["mx"])
        for r in df.groupBy("k")
        .agg(
            F.sum("v").alias("s"), F.count("v").alias("c"),
            F.min("v").alias("mn"), F.max("v").alias("mx"),
        )
        .collect()
    }
    got = {}
    out = (
        jn.salted_aggregate(df, ["k"], {"v": "sum"}, n_salts)
        .join(jn.salted_aggregate(df, ["k"], {"v": "count"}, n_salts), "k")
        .join(jn.salted_aggregate(df, ["k"], {"v": "min"}, n_salts), "k")
        .join(jn.salted_aggregate(df, ["k"], {"v": "max"}, n_salts), "k")
    )
    for r in out.collect():
        got[r["k"]] = (r["sum_v"], r["count_v"], r["min_v"], r["max_v"])
    assert got == plain


@given(
    fact_keys=st.lists(st.integers(0, 100), min_size=1, max_size=50),
    dim_keys=st.lists(st.integers(0, 100), min_size=1, max_size=20),
)
@_slow
def test_bloom_filter_never_false_negative(spark, fact_keys, dim_keys):
    """Every true match survives the Bloom pre-filter regardless of
    data; the follow-up exact semi-join equals the direct one."""
    from social_link_prediction_spark.operators import joins as jn

    fact = spark.createDataFrame([(k,) for k in fact_keys], ["k"])
    dim = spark.createDataFrame([(k,) for k in dim_keys], ["k"])
    exact = sorted(r["k"] for r in fact.join(dim, "k", "left_semi").collect())
    filtered = jn.bloom_semi_filter(fact, dim, "k", num_bits=1 << 12, n_hashes=3)
    refined = sorted(r["k"] for r in filtered.join(dim, "k", "left_semi").collect())
    assert refined == exact


@given(
    edges=st.lists(
        st.tuples(st.integers(0, 12), st.integers(0, 12)), min_size=1, max_size=40
    ),
    k=st.integers(1, 4),
)
@_slow
def test_k_core_matches_brute_force_peel(spark, edges, k):
    from social_link_prediction_spark.graph.motifs import k_core

    # reference: driver-side peeling over the undirected simple graph
    es = {(min(a, b), max(a, b)) for a, b in edges if a != b}
    while True:
        deg: dict = {}
        for a, b in es:
            deg[a] = deg.get(a, 0) + 1
            deg[b] = deg.get(b, 0) + 1
        live = {v for v, d in deg.items() if d >= k}
        kept = {(a, b) for a, b in es if a in live and b in live}
        if kept == es:
            break
        es = kept
    expect: dict = {}
    for a, b in es:
        expect[a] = expect.get(a, 0) + 1
        expect[b] = expect.get(b, 0) + 1
    expect = {v: d for v, d in expect.items() if d >= k}

    if not edges:
        return
    df = spark.createDataFrame(list(edges), ["src", "dst"])
    got = {r.id: r.degree for r in k_core(df, k=k).collect()}
    assert got == expect


@given(
    vecs=st.lists(
        st.tuples(
            st.integers(0, 10_000),
            st.lists(
                st.floats(-2, 2, allow_nan=False, width=32), min_size=4, max_size=4
            ),
        ),
        min_size=1,
        max_size=12,
        unique_by=lambda t: t[0],
    )
)
@_slow
def test_pq_codes_match_numpy_argmin(spark, vecs):
    import numpy as np

    from social_link_prediction_spark.pipelines.similarity import pq_encode

    books = [[[1.0, 0.0], [0.0, 1.0], [-1.0, 0.0]], [[2.0, 0.0], [0.0, -2.0], [1.0, 1.0]]]
    df = spark.createDataFrame(vecs, ["vec_id", "embedding"])
    got = {r.id: list(r.codes) for r in pq_encode(df, books).collect()}
    for vid, v in vecs:
        v = [float(x) for x in v]
        want = []
        for m, book in enumerate(books):
            sub = np.array(v[m * 2 : (m + 1) * 2])
            d2 = [float(((sub - np.array(c)) ** 2).sum()) for c in book]
            want.append(int(np.argmin(d2)))  # argmin = first min: same tie rule
        assert got[vid] == want


@given(
    texts=st.lists(
        st.text(
            alphabet="ab0123456789.-@ ", min_size=0, max_size=40
        ),
        min_size=1,
        max_size=8,
    )
)
@_slow
def test_scrub_pii_idempotent(spark, texts):
    from social_link_prediction_spark.pipelines.text import scrub_pii

    df = spark.createDataFrame(list(enumerate(texts)), ["doc_id", "text"])
    once = scrub_pii(df)
    again = scrub_pii(
        once.select("doc_id", F.col("text_scrubbed").alias("text"))
    )
    rows1 = {r.doc_id: r.text_scrubbed for r in once.collect()}
    rows2 = {r.doc_id: r.text_scrubbed for r in again.collect()}
    assert rows1 == rows2  # placeholders contain nothing scrubbable


@_needs_testdata
def test_transition_matrix_rows_are_distributions(spark):
    # p_transition sums to ~1 for every from_type (round-off only),
    # and every count is positive.
    from social_link_prediction_spark import queries as q

    df = q.QUERIES["event_transition_matrix"](spark, "/root/testdata/sf0.001")
    rows = df.collect()
    assert rows and all(r.n_transitions > 0 for r in rows)
    sums = {}
    for r in rows:
        sums[r.from_type] = sums.get(r.from_type, 0.0) + r.p_transition
    assert all(abs(s - 1.0) < 1e-4 for s in sums.values()), sums


@_needs_testdata
def test_rolling_wau_bounds_daily_actives(spark):
    # WAU(d) >= DAU(d) (the window contains the day itself) and WAU
    # never exceeds the total distinct-user population.
    from social_link_prediction_spark import queries as q
    from social_link_prediction_spark.queries import _t

    sf = "/root/testdata/sf0.001"
    wau = {r.activity_date: r.wau
           for r in q.QUERIES["rolling_7d_active_users"](spark, sf).collect()}
    ev = _t(spark, sf, "events")
    dau = {r.d: r.dau
           for r in ev.groupBy(F.to_date("ts").alias("d"))
                      .agg(F.countDistinct("user_id").alias("dau")).collect()}
    total = ev.select("user_id").distinct().count()
    assert set(dau) == set(wau)
    assert all(dau[d] <= wau[d] <= total for d in dau)


@_needs_testdata
def test_gapfill_grid_is_dense_and_locf_consistent(spark):
    # Every (event_type, hour) cell between the global bounds exists
    # exactly once; non-gap rows carry their own hourly value; gap rows
    # repeat the latest earlier value (or null before the first).
    from social_link_prediction_spark import queries as q

    df = q.QUERIES["gapfill_locf_hourly"](spark, "/root/testdata/sf0.001")
    rows = df.collect()
    by_type = {}
    for r in rows:
        by_type.setdefault(r.event_type, []).append(r)
    n_hours = {t: len(v) for t, v in by_type.items()}
    assert len(set(n_hours.values())) == 1, "types disagree on grid size"
    for t, v in by_type.items():
        v.sort(key=lambda r: r.bucket)
        # buckets are consecutive hours
        for a, b in zip(v, v[1:]):
            assert (b.bucket - a.bucket).total_seconds() == 3600
        last = None
        for r in v:
            if r.was_gap == 0:
                last = r.filled_value
                assert r.filled_value is not None
            else:
                assert r.filled_value == last


def test_lsh_band_plan_scurve_laws():
    from social_link_prediction_spark.pipelines.dedup import (
        lsh_band_plan,
        lsh_collision_probability,
    )

    for n_hashes, threshold in [(64, 0.5), (128, 0.8), (100, 0.3), (16, 0.9)]:
        b, r = lsh_band_plan(n_hashes, threshold)
        assert b * r == n_hashes
        # the plan's S-curve midpoint approximates the threshold
        assert abs((1 / b) ** (1 / r) - threshold) < 0.25
        # S-curve is monotone in s and steep around the threshold
        probs = [lsh_collision_probability(s / 20, b, r) for s in range(21)]
        assert probs == sorted(probs)
        assert probs[0] == 0.0 and probs[-1] == 1.0
        lo = lsh_collision_probability(max(threshold - 0.25, 0.01), b, r)
        hi = lsh_collision_probability(min(threshold + 0.25, 0.99), b, r)
        assert hi > lo


@_needs_testdata
def test_ktruss_support_law(spark):
    # Every surviving edge of the registered 3-truss has support >= 1
    # within the truss itself (the defining invariant at the fixed
    # point), and the truss is a subset of the sampled input graph.
    from social_link_prediction_spark import queries as q
    from social_link_prediction_spark.graph import truss as gt
    from social_link_prediction_spark.ml import linksplit as mls

    sf = "/root/testdata/sf0.01"
    sup = q._t(spark, sf, "supplier").select(
        F.col("s_suppkey").cast("long").alias("id")
    )
    pairs = (
        sup.select(F.col("id").alias("src"))
        .join(sup.select(F.col("id").alias("dst")), F.col("src") < F.col("dst"))
        .filter(
            mls.hash60(F.format_string("%d-%d", "src", "dst"), F.lit("kt")) % 10000
            < 400
        )
    )
    tr = gt.ktruss(pairs, k=3, max_rounds=3)
    rows = tr.collect()
    assert rows, "3-truss unexpectedly empty at sf0.01"
    assert all(r.support >= 1 for r in rows)
    edge_set = {(r.src, r.dst) for r in pairs.collect()}
    assert all((r.src, r.dst) in edge_set for r in rows)


@_needs_testdata
def test_sliding_chunks_cover_every_token_with_overlap(spark):
    # Chunk starts advance by the stride; consecutive chunks overlap by
    # size - stride tokens; the union of [start, start+n) intervals
    # covers [0, len) for every document.
    from social_link_prediction_spark import queries as q
    from social_link_prediction_spark.queries import _CHUNK_SIZE, _CHUNK_STRIDE, _t

    sf = "/root/testdata/sf0.001"
    rows = q.QUERIES["doc_sliding_chunks"](spark, sf).collect()
    lens = {
        r.doc_id: len(r.text.split(" "))
        for r in _t(spark, sf, "documents").select("doc_id", "text").collect()
    }
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    assert set(by_doc) == set(lens)
    for doc_id, chunks in by_doc.items():
        chunks.sort(key=lambda r: r.chunk_id)
        covered = 0
        for i, r in enumerate(chunks):
            assert r.start_token == i * _CHUNK_STRIDE
            assert 1 <= r.n_tokens <= _CHUNK_SIZE
            assert r.start_token <= covered  # no gap
            covered = max(covered, r.start_token + r.n_tokens)
        assert covered == lens[doc_id]


# ---------------------------------------------------------------------
# KMV sketch laws (operators/aggregates.kmv_*)
# ---------------------------------------------------------------------
def test_kmv_merge_law_membership_and_accuracy(spark):
    """Three laws that make KMV the set-operation sketch:
    1. merge law — sketch(A ∪ B) == kmv_union(sketch(A), sketch(B));
    2. membership exactness — every union-sketch hash that belongs to
       set A appears in A's sketch (h <= kth-min(A∪B) <= kth-min(A));
    3. accuracy — the estimator lands within 30% of the true distinct
       count when the sketch is full, and is EXACT when not full."""
    from social_link_prediction_spark.operators import aggregates as agg

    a_keys = [f"a{i}" for i in range(3000)] + [f"c{i}" for i in range(1000)]
    b_keys = [f"b{i}" for i in range(2000)] + [f"c{i}" for i in range(1000)]
    a = spark.createDataFrame([(k,) for k in a_keys], "key string")
    b = spark.createDataFrame([(k,) for k in b_keys], "key string")
    both = a.unionAll(b)
    k = 128

    sk_a = agg.kmv_sketch(a, "key", k=k)
    sk_b = agg.kmv_sketch(b, "key", k=k)
    merged = sorted(r.h for r in agg.kmv_union(sk_a, sk_b, k=k).collect())
    direct = sorted(r.h for r in agg.kmv_sketch(both, "key", k=k).collect())
    assert merged == direct  # (1)

    ha = {r.h for r in sk_a.collect()}
    from social_link_prediction_spark.ml.linksplit import hash60

    a_hashes = {
        r.h
        for r in a.select(
            hash60(F.col("key").cast("string"), F.lit("kmv")).alias("h")
        ).collect()
    }
    for h in merged:
        if h in a_hashes:
            assert h in ha  # (2)

    est = agg.kmv_estimate(
        agg.kmv_sketch(both, "key", k=k), k
    ).collect()[0]
    true_n = len(set(a_keys) | set(b_keys))
    assert est.kmv_n == k
    assert abs(est.kmv_est - true_n) / true_n < 0.30  # (3)

    # not-full sketch is exact
    small = spark.createDataFrame([(f"s{i}",) for i in range(50)], "key string")
    est_s = agg.kmv_estimate(agg.kmv_sketch(small, "key", k=k), k).collect()[0]
    assert est_s.kmv_n == 50 and est_s.kmv_est == 50.0


def test_kmv_grouped_matches_global_per_group(spark):
    """The grouped (window-rank) path and the global (TakeOrdered)
    path produce identical sketches for each group."""
    from social_link_prediction_spark.operators import aggregates as agg

    rows = [("g1", f"x{i}") for i in range(500)] + [
        ("g2", f"y{i}") for i in range(300)
    ]
    df = spark.createDataFrame(rows, "g string, key string")
    k = 32
    grouped = agg.kmv_sketch(df, "key", k=k, group_cols=["g"])
    for gname in ("g1", "g2"):
        via_group = sorted(
            r.h for r in grouped.filter(F.col("g") == gname).collect()
        )
        via_global = sorted(
            r.h
            for r in agg.kmv_sketch(
                df.filter(F.col("g") == gname), "key", k=k
            ).collect()
        )
        assert via_group == via_global


def test_gini_pinned_distributions(spark):
    """Equal values -> G = 0; one key owns everything -> G = (n-1)/n;
    top-decile share of the single-owner case is 1 when n >= 10."""
    from social_link_prediction_spark.operators.aggregates import (
        concentration_stats,
    )

    equal = spark.createDataFrame(
        [(i, 10.0) for i in range(20)], "k long, x double"
    )
    r = concentration_stats(equal, "x", "k").collect()[0]
    assert r["gini"] == 0.0 and r["n_keys"] == 20 and r["total"] == 200.0

    single = spark.createDataFrame(
        [(i, 0.0) for i in range(19)] + [(19, 100.0)], "k long, x double"
    )
    s = concentration_stats(single, "x", "k").collect()[0]
    assert s["gini"] == round(19 / 20, 6)
    assert s["top_decile_share"] == 1.0


def test_gini_hand_value(spark):
    """x = (1, 2, 3, 4): G = 2*(1+4+9+16)/(4*10) - 5/4 = 0.25."""
    from social_link_prediction_spark.operators.aggregates import (
        concentration_stats,
    )

    df = spark.createDataFrame(
        [(1, 1.0), (2, 2.0), (3, 3.0), (4, 4.0)], "k long, x double"
    )
    assert concentration_stats(df, "x", "k").collect()[0]["gini"] == 0.25


@_needs_testdata
def test_mutual_information_nonnegative_and_marginal_law(spark):
    """Total MI (sum of contributions) is >= 0 up to rounding noise,
    and cell counts sum to the orders row count."""
    from social_link_prediction_spark import queries as q

    sf = "/root/testdata/sf0.001"
    rows = q.QUERIES["mutual_information_priority_segment"](spark, sf).collect()
    assert sum(r["mi_contrib"] for r in rows) >= -1e-6
    n_orders = spark.read.parquet(f"{sf}/orders.parquet").count()
    assert sum(r["n"] for r in rows) == n_orders


@_needs_testdata
def test_frequent_pairs_downward_closure(spark):
    """A-Priori law: every emitted pair's support is <= the support of
    each constituent singleton (checked against raw basket counts)."""
    from social_link_prediction_spark import queries as q

    sf = "/root/testdata/sf0.001"
    rows = q.QUERIES["frequent_itemsets_pairs"](spark, sf).collect()
    assert rows
    li = spark.read.parquet(f"{sf}/lineitem.parquet")
    baskets = li.selectExpr(
        "l_orderkey AS basket", "l_partkey % 500 AS item"
    ).dropDuplicates()
    sing = {r["item"]: r["c"] for r in baskets.groupBy("item").agg(
        F.count(F.lit(1)).alias("c")).collect()}
    for r in rows:
        assert r["pair_cnt"] <= sing[r["item_a"]]
        assert r["pair_cnt"] <= sing[r["item_b"]]


@_needs_testdata
def test_neyman_allocation_laws(spark):
    """Rounded allocations sum to the budget within half a stratum
    each way, and every stratum draws exactly min(alloc, available)."""
    from social_link_prediction_spark import queries as q

    rows = q.QUERIES["neyman_allocation_sample"](
        spark, "/root/testdata/sf0.001"
    ).collect()
    assert rows
    budget_gap = abs(sum(r["n_alloc"] for r in rows) - 1000)
    assert budget_gap <= (len(rows) + 1) // 2
    for r in rows:
        assert r["n_actual"] == min(r["n_alloc"], r["n_rows"])


@_needs_testdata
def test_attribution_credit_conservation(spark):
    """Every model's total credit equals the purchase count — no
    conversion is double-counted or dropped (the 'direct' channel
    absorbs touchless purchases)."""
    from social_link_prediction_spark import queries as q

    sf = "/root/testdata/sf0.001"
    rows = q.QUERIES["multitouch_attribution"](spark, sf).collect()
    n_purchases = (
        q._t(spark, sf, "events").filter(F.col("event_type") == "purchase").count()
    )
    for model in ("first_touch", "last_touch", "linear"):
        assert abs(sum(r[model] for r in rows) - n_purchases) < 0.01


@_needs_testdata
def test_feature_scaling_ranges(spark):
    """Min-max output lies in [0,1]; z and robust agree in sign for
    every row (both are centered monotone transforms)."""
    from social_link_prediction_spark import queries as q

    rows = q.QUERIES["feature_scaling_audit"](
        spark, "/root/testdata/sf0.001"
    ).collect()
    assert rows
    for r in rows:
        assert 0.0 <= r["minmax"] <= 1.0
        if abs(r["z"]) > 0.2 and abs(r["robust"]) > 0.2:
            assert (r["z"] > 0) == (r["robust"] > 0)


def test_ivf_margin_laws(spark):
    """margin >= 0 by construction (own = argmax), and a vector that
    IS a centroid has margin == 1 - next-best similarity with s_own
    == 1."""
    from social_link_prediction_spark.pipelines.similarity import (
        ivf_assignment_margin,
    )

    cents = [[1.0, 0.0, 0.0], [0.0, 1.0, 0.0]]
    emb = spark.createDataFrame(
        [(1, [1.0, 0.0, 0.0]), (2, [0.6, 0.8, 0.0]), (3, [0.5, 0.5, 0.0])],
        "vec_id long, embedding array<float>",
    )
    rows = {r["vec_id"]: r for r in ivf_assignment_margin(emb, cents).collect()}
    assert all(r["margin"] >= 0 for r in rows.values())
    assert rows[1]["ivf_cell"] == 0 and abs(rows[1]["s_own"] - 1.0) < 1e-9
    assert rows[2]["ivf_cell"] == 1
    assert abs(rows[3]["margin"]) < 1e-9  # equidistant -> zero margin


@_needs_testdata
def test_poisson_bootstrap_brackets_exact_mean(spark):
    """The 95% bootstrap CI must contain the exact mean (it is a CI
    around the resampled estimator of that same mean), and the
    bootstrap SE must be positive and small relative to the mean."""
    from social_link_prediction_spark import queries as q

    r = q.QUERIES["poisson_bootstrap_mean"](
        spark, "/root/testdata/sf0.001"
    ).collect()[0]
    assert r["ci_lo"] <= r["exact_mean"] <= r["ci_hi"]
    assert 0 < r["boot_se"] < 0.1 * r["exact_mean"]


@_needs_testdata
def test_join_size_estimate_exactness_law(spark):
    """The exact side must equal the materialized join's row count,
    and the HT estimate must land within a loose 50% band at
    sf0.001 (5% key sample of ~1.5k keys)."""
    from social_link_prediction_spark import queries as q

    sf = "/root/testdata/sf0.001"
    r = q.QUERIES["join_size_estimate"](spark, sf).collect()[0]
    o = spark.read.parquet(f"{sf}/orders.parquet")
    li = spark.read.parquet(f"{sf}/lineitem.parquet")
    true_rows = o.join(
        li, o["o_orderkey"] == li["l_orderkey"]
    ).count()
    assert r["exact_rows"] == true_rows
    assert abs(r["est_rows"] - true_rows) / true_rows < 0.5


@_needs_testdata
def test_information_gain_bounds(spark):
    """0 <= IG(feature) <= H(label) for every feature (conditioning
    never increases entropy; gain can't exceed the prior)."""
    from social_link_prediction_spark import queries as q

    rows = q.QUERIES["information_gain_features"](
        spark, "/root/testdata/sf0.001"
    ).collect()
    assert len(rows) == 3
    for r in rows:
        assert -1e-9 <= r["info_gain"] <= r["h_label"] + 1e-9


@_needs_testdata
def test_conversion_latency_ordering(spark):
    """min <= p50 <= p90 <= max and the mean lies inside [min, max]."""
    from social_link_prediction_spark import queries as q

    r = q.QUERIES["conversion_latency_stats"](
        spark, "/root/testdata/sf0.001"
    ).collect()[0]
    assert r["min_s"] <= r["p50_s"] <= r["p90_s"] <= r["max_s"]
    assert r["min_s"] <= r["mean_s"] <= r["max_s"]


@_needs_testdata
def test_cf_recommend_excludes_anchor_items(spark):
    """Recommendations never contain the anchor's own basket, and
    scores are bounded by the neighbor count (each neighbor's
    Jaccard <= 1)."""
    from social_link_prediction_spark import queries as q

    sf = "/root/testdata/sf0.001"
    rows = q.QUERIES["cf_recommend_parts_c1"](spark, sf).collect()
    assert rows
    li = spark.read.parquet(f"{sf}/lineitem.parquet")
    o = spark.read.parquet(f"{sf}/orders.parquet")
    baskets = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .selectExpr("o_custkey AS u", "l_partkey % 500 AS item")
        .dropDuplicates()
    )
    au = baskets.agg(F.min("u")).collect()[0][0]
    own = {
        r["item"] for r in baskets.filter(F.col("u") == au).collect()
    }
    for r in rows:
        assert r["item"] not in own
        assert 0 < r["score"] <= r["n_recommenders"]
