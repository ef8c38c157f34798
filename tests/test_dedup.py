"""Dedup operators (D1-D8): order-sensitivity made explicit."""

from pyspark.sql import functions as F

from social_link_prediction_spark.operators import dedup as dd


def test_priority_dedup_person_beats_object(spark):
    df = spark.createDataFrame(
        [("Q1", "from-object", 1), ("Q1", "from-person", 0), ("Q2", "only-object", 1)],
        ["id", "name", "prio"],
    )
    out = dd.priority_dedup(df, "id", "prio").orderBy("id").collect()
    assert [(r.id, r.name) for r in out] == [("Q1", "from-person"), ("Q2", "only-object")]


def test_canonicalize_edges_collapses_reverse(spark):
    df = spark.createDataFrame(
        [("Q1", "Q2", "spouse"), ("Q2", "Q1", "spouse"), ("Q1", "Q2", "sibling")],
        ["person", "object", "relationship_label"],
    )
    out = dd.canonicalize_edges(df)
    assert out.count() == 2
    # survivor keeps original (possibly reversed) direction columns
    spouse = out.filter(F.col("relationship_label") == "spouse").first()
    assert {spouse.person, spouse.object} == {"Q1", "Q2"}


def test_canonicalize_idempotent(spark):
    df = spark.createDataFrame(
        [("Q1", "Q2", "r"), ("Q2", "Q1", "r"), ("Q3", "Q4", "r")],
        ["person", "object", "relationship_label"],
    )
    once = dd.canonicalize_edges(df)
    twice = dd.canonicalize_edges(once)
    assert once.count() == twice.count() == 2


def test_prune_thin_groups(spark):
    rows = [("big", i) for i in range(10)] + [("small", 0)]
    df = spark.createDataFrame(rows, ["rel", "x"])
    out = dd.prune_thin_groups(df, ["rel"], min_count=5)
    assert out.select("rel").distinct().collect() == [("big",)]


def test_union_all_schema_merge(spark):
    a = spark.createDataFrame([(1, "x")], ["id", "a"])
    b = spark.createDataFrame([(2, "y")], ["id", "b"])
    out = dd.union_all([a, b])
    assert set(out.columns) == {"id", "a", "b"}
    assert out.count() == 2


def test_flip_and_merge_relations(spark):
    df = spark.createDataFrame([("A", "B", "student_of")], ["src", "dst", "relationship_label"])
    flipped = dd.flip_edges(df, "src", "dst")
    assert flipped.first().src == "B"
    merged = dd.merge_relations(df, {"student_of": "advisor_of"})
    assert merged.first().relationship_label == "advisor_of"


def test_priority_dedup_stable_under_repartitioning(spark):
    # SURVEY §7.4.2: "keep first" must not depend on physical layout.
    # The same frame shuffled into different partitionings must elect
    # identical survivors.
    import random

    rng = random.Random(3)
    rows = [
        (f"k{rng.randrange(40)}", rng.randrange(3), rng.randrange(1000))
        for _ in range(500)
    ]
    df = spark.createDataFrame(rows, ["key", "prio", "tie"])
    pick = lambda d: sorted(
        (r.key, r.prio, r.tie)
        for r in dd.priority_dedup(d, "key", "prio", tiebreak=["tie"]).collect()
    )
    base = pick(df)
    assert pick(df.repartition(7)) == base
    assert pick(df.repartition(1)) == base
    assert pick(df.orderBy(F.col("tie").desc())) == base
    # survivor really is the (min prio, min tie) row per key
    import collections

    best = {}
    for k, p, t in rows:
        if k not in best or (p, t) < best[k]:
            best[k] = (p, t)
    assert base == sorted((k, p, t) for k, (p, t) in best.items())
