"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

The actual catalog lives in ``social_link_prediction_spark.queries``;
this module is a thin adapter.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from social_link_prediction_spark import queries as _catalog  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: pricing summary
    (scan → filter → hash-agg → sort), SURVEY.md §7.2's minimum slice."""
    return _catalog.pricing_summary(spark, "/root/testdata/sf0.001")


# The driver's oracle gate checks the FIRST 50 queries in registration
# order (CORRECTNESS_r02 == first 50 of 85 exactly). Rounds 1-2 verified
# the catalog head; this round the previously-unchecked queries are
# promoted to the front, followed by queries added or changed since the
# r2 gate ran (training-prep trio, round-3 additions, the sessionize
# pair). Everything has also been verified locally via
# tools/verify_local.py at sf0.01 (93/93 green) — the ordering only
# decides which rows the DRIVER re-proves this round. See COVERAGE.md
# "Driver-gate rotation".
_PRIORITY = [
    # unchecked in CORRECTNESS_r01/r02 (driver cap), most load-bearing first
    "etl_clean_edges", "fuzzy_search_parts", "weighted_sssp_s1",
    "pair_features_suppliers", "link_split_counts", "negative_sample_supplies",
    "group_concat_segments", "scan_relationship_cs", "recommend_suppliers_for_s1",
    "simhash_neardup", "embedding_neardup", "srp_topk", "ivf_cell_counts",
    "media_features", "media_frame_plan", "media_resize_plan",
    "six_degrees_summary", "impute_acctbal_by_segment", "pagerank_multiview",
    "order_date_sortedness", "price_percentiles_by_brand",
    "tfidf_top_terms", "stratified_sample_counts", "customer_balance_ranks",
    "rollup_order_revenue", "cube_lineitem_counts", "pivot_status_by_priority",
    "unpivot_nation_stats", "intersect_except_custkeys",
    "referential_integrity_audit", "asof_click_attribution",
    "session_concurrency", "range_join_shipments", "multires_event_rollup",
    "hll_daily_users",
    # added after the r2 gate ran — no driver rows yet
    "pack_documents_chunks", "contamination_overlap", "repetition_ngram_stats",
    "semantic_dedup_pairs", "semantic_dedup_survivors", "pii_scrub_docs",
    "quality_filter_summary", "kcore_partsupp",
    # changed this round — need fresh driver rows
    "sessionize_events", "session_window_stats",
]


def _ordered(d: dict) -> dict:
    head = {k: d[k] for k in _PRIORITY if k in d}
    return head | {k: v for k, v in d.items() if k not in head}


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _ordered(dict(_catalog.QUERIES))


def oracle_sql() -> dict[str, str]:
    return _ordered(dict(_catalog.ORACLES))
