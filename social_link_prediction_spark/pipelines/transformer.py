"""Domain ETL: flattened SPARQL bindings -> cleaned edges + nodes
tables (the reference's GraphTransformer, transformer.py:16-349,
re-expressed as one declarative DataFrame pipeline).

Semantics preserved (and the reference's order-dependent quirks made
explicit):
- D4 "first wins" node merge becomes an explicit priority column
  (person-sourced=0 beats object-sourced=1).
- D5 reverse-edge dedup keeps one row per undirected (n1,n2,rel) with
  a deterministic survivor ordering.
- multi-valued attributes become BOTH an array column and the
  reference's comma-joined string view (SURVEY §1.3).
Scale: every step is an expression or a keyed shuffle; partition the
output by relationship_label for downstream per-relation jobs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from social_link_prediction_spark.operators import cleaning as cl
from social_link_prediction_spark.operators import dedup as dd
from social_link_prediction_spark.operators.windows import per_group_index

EDGE_COLS = [
    "person", "person_label", "person_sub_type",
    "relationship_label", "object", "object_label", "object_sub_type",
]


def clean_bindings(raw: DataFrame) -> DataFrame:
    """P1+P4+P2: project `.value` columns, scrub control chars,
    snake_case names; then P3 URI->Q-ID for person/object."""
    df = cl.strip_value_suffix(raw)
    df = cl.scrub_all_strings(df)
    df = cl.snake_case_columns(df)
    for c in ("person", "object"):
        if c in df.columns:
            df = df.withColumn(c, cl.uri_to_qid(c))
    return df


def filter_edges(df: DataFrame) -> DataFrame:
    """P5 (valid Q-IDs) + P6 (resolved labels) + P7 (non-empty person)."""
    df = cl.filter_non_empty(df, "person")
    df = cl.filter_valid_qids(df, "person", "object")
    return cl.filter_resolved_labels(df, "person_label", "object_label")


def build_edges(df: DataFrame) -> DataFrame:
    """D3 key dedup + D5 reverse-edge canonicalization, deterministic
    survivor = lowest (person, object) ordering."""
    order = [F.col("person").asc(), F.col("object").asc()]
    df = dd.distinct_by_key(df, ["person", "relationship_label", "object"], order_by=order)
    df = dd.canonicalize_edges(df, "person", "object", "relationship_label", order_by=order)
    cols = [c for c in EDGE_COLS if c in df.columns]
    return df.select(*cols)


def aggregate_person_attrs(df: DataFrame, multi_cols: list[str]) -> DataFrame:
    """A2: per-person group-concat-unique of multi-valued attributes.
    Arrays are kept alongside the reference's comma-joined strings."""
    aggs = []
    for c in multi_cols:
        arr = F.array_sort(F.array_distinct(F.collect_list(c)))
        aggs.append(arr.alias(f"{c}_arr"))
        aggs.append(F.concat_ws(", ", arr).alias(c))
    return df.groupBy("person").agg(*aggs)


def build_nodes(
    edges: DataFrame,
    person_attrs: DataFrame | None = None,
    object_attrs: DataFrame | None = None,
) -> DataFrame:
    """Node table: stack person-sourced and object-sourced endpoints,
    priority-dedup on id (person attrs beat object attrs — the
    reference's concat-order dependence, transformer.py:170-172, made
    explicit), enrich, coerce birth_year, assign dense per-type
    pyg_id (W1)."""
    persons = edges.select(
        F.col("person").alias("id"),
        F.col("person_label").alias("name"),
        F.col("person_sub_type").alias("sub_type"),
        F.lit("human").alias("type"),
        F.lit(0).alias("__prio"),
    )
    objects = edges.select(
        F.col("object").alias("id"),
        F.col("object_label").alias("name"),
        F.col("object_sub_type").alias("sub_type"),
        F.col("object_sub_type").alias("type"),
        F.lit(1).alias("__prio"),
    )
    nodes = dd.priority_dedup(
        persons.unionByName(objects), key="id", priority_col="__prio", tiebreak=["name"]
    ).drop("__prio")

    if person_attrs is not None:
        nodes = nodes.join(
            person_attrs.withColumnRenamed("person", "id"), "id", "left"
        )
    if object_attrs is not None:
        nodes = nodes.join(object_attrs, "id", "left")
    if "birth_year" in nodes.columns:
        nodes = nodes.withColumn("birth_year", cl.coerce_int("birth_year"))
    return per_group_index(nodes, "type", ["id"], out="pyg_id")


def run_transformer(
    raw: DataFrame,
    person_multi_cols: list[str] | None = None,
) -> tuple[DataFrame, DataFrame]:
    """End-to-end: flattened bindings -> (edges, nodes). Mirrors the
    reference's run_transformer (transformer.py:352-369) minus file
    IO — callers persist with sources.json_flatten.write_parquet,
    partitioned by relationship_label."""
    df = clean_bindings(raw)
    df = filter_edges(df)

    person_attrs = None
    multi = [c for c in (person_multi_cols or []) if c in df.columns]
    if multi:
        person_attrs = aggregate_person_attrs(df.select("person", *multi), multi)

    edges = build_edges(df)
    nodes = build_nodes(edges, person_attrs=person_attrs)
    return edges, nodes
