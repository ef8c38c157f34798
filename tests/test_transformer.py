"""Domain ETL end-to-end + FIXTURES.md invariants."""

from pyspark.sql import functions as F

from social_link_prediction_spark.graph.build import build_graph
from social_link_prediction_spark.pipelines import transformer as tr


def test_transformer_end_to_end(raw_bindings):
    edges, nodes = tr.run_transformer(raw_bindings)
    e = edges.collect()
    # 8 raw rows: -1 exact dup, -1 reverse dup, -3 malformed => 3 edges
    assert len(e) == 3
    rels = sorted(r.relationship_label for r in e)
    assert rels == ["educated_at", "influenced_by", "spouse"]

    # invariant 4: all endpoint ids are valid Q-IDs
    bad = edges.filter(
        ~F.col("person").rlike("^Q\\d+$") | ~F.col("object").rlike("^Q\\d+$")
    ).count()
    assert bad == 0

    # invariant 3: canonical-edge uniqueness
    canon = edges.select(
        F.least("person", "object").alias("a"),
        F.greatest("person", "object").alias("b"),
        "relationship_label",
    )
    assert canon.count() == canon.dropDuplicates().count()

    # control chars scrubbed
    assert edges.filter(F.col("object_label").contains("\t")).count() == 0


def test_nodes_invariants(raw_bindings):
    edges, nodes = tr.run_transformer(raw_bindings)
    n = nodes.collect()
    ids = [r.id for r in n]
    assert len(ids) == len(set(ids))  # unique
    # invariant 5: pyg_id dense 0..n_t-1 per type
    for t in {r.type for r in n}:
        got = sorted(r.pyg_id for r in n if r.type == t)
        assert got == list(range(len(got)))
    # person-sourced attrs beat object-sourced (Q1 appears as both)
    q1 = [r for r in n if r.id == "Q1"][0]
    assert q1.type == "human"


def test_transformer_idempotent(raw_bindings):
    edges, _ = tr.run_transformer(raw_bindings)
    again = tr.build_edges(edges)
    assert again.count() == edges.count()


def test_build_graph_drops_dangling(spark):
    nodes = spark.createDataFrame([("Q1",), ("Q2",)], ["id"])
    edges = spark.createDataFrame(
        [("Q1", "Q2", "r"), ("Q1", "QMISSING", "r")],
        ["person", "object", "relationship_label"],
    )
    v, e = build_graph(nodes, edges)
    assert e.count() == 1  # dangling endpoint dropped (inner-join semantics)
    assert v.count() == 2
