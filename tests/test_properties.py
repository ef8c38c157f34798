"""Property-based checks (hypothesis) for the invariants the oracle
can't see: idempotence, partition laws, exact-vs-sketch agreement.
Each test generates small relations driver-side and runs them through
the real Spark operators (few examples — Spark's per-action latency
dominates, the properties don't need volume)."""

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

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
