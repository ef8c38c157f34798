"""Physical-plan audit: summarizes every headline query's plan —
join strategies, shuffle (Exchange) count, parquet pushdown/pruning —
and flags scale red-flags (cartesian products, non-broadcast NLJ,
un-pushed scans). Writes PLANS.md.

Usage: python3 tools/plan_audit.py [sf_dir]
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import HEADLINE  # noqa: E402
from social_link_prediction_spark import queries as catalog  # noqa: E402
from social_link_prediction_spark.session import get_spark  # noqa: E402

JOIN_OPS = (
    "BroadcastHashJoin", "SortMergeJoin", "ShuffledHashJoin",
    "BroadcastNestedLoopJoin", "CartesianProduct",
)


def audit(plan: str) -> dict:
    # Count UNIQUE numbered operator nodes from the formatted-explain
    # detail section: "(12) Exchange". Raw token grepping over the whole
    # string double-counts every node (tree + detail) and re-counts the
    # cached subtree that InMemoryRelation reprints per reference —
    # work that executes once, not once per reference.
    nodes = dict(re.findall(r"^\((\d+)\) (\w+)", plan, re.M))
    counts: dict[str, int] = {}
    for op in nodes.values():
        counts[op] = counts.get(op, 0) + 1
    out = {op: counts.get(op, 0) for op in JOIN_OPS}
    out["Exchange"] = counts.get("Exchange", 0)
    out["scans"] = re.findall(r"PushedFilters: (\[[^\]]*\])", plan)
    out["schemas"] = [
        len(s.split(",")) for s in re.findall(r"ReadSchema: struct<([^>]*)>", plan)
    ]
    flags = []
    if out["CartesianProduct"]:
        flags.append("CARTESIAN")
    # BroadcastNestedLoopJoin is fine only for tiny literal sides
    if out["BroadcastNestedLoopJoin"] > 1:
        flags.append("NLJ>1")
    out["flags"] = flags
    return out


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    spark = get_spark("plan-audit")
    spark.sparkContext.setLogLevel("ERROR")
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")

    lines = [
        "# PLANS — physical-plan audit of the headline queries",
        "",
        f"Scale dir: `{sf_dir}`. Columns: join operators chosen by",
        "Catalyst/AQE, shuffle count, parquet scans (pushed filters /",
        "projected column count). Flags: CARTESIAN = unbounded cross",
        "product; NLJ>1 = repeated nested-loop joins.",
        "",
        "| query | joins | exchanges | scans (pushed / cols) | flags |",
        "|---|---|---|---|---|",
    ]
    audited = list(HEADLINE) + sorted(
        n for n in catalog.QUERIES if n.startswith("tpch_") and n not in HEADLINE
    )
    for name in audited:
        fn = catalog.QUERIES.get(name)
        if fn is None:
            continue
        df = fn(spark, sf_dir)
        plan = df._jdf.queryExecution().explainString(mode)
        a = audit(plan)
        joins = ", ".join(
            f"{op}×{n}" if n > 1 else op
            for op in JOIN_OPS
            if (n := a[op]) > 0
        ) or "—"
        scans = "; ".join(
            f"{p if p != '[]' else 'none'}/{c}cols"
            for p, c in zip(a["scans"], a["schemas"])
        )[:120] or "—"
        flags = ", ".join(a["flags"]) or "ok"
        lines.append(f"| {name} | {joins} | {a['Exchange']} | {scans} | {flags} |")
    lines += [
        "",
        "## Notes",
        "",
        "- Iterative queries (pagerank, hits, randomwalk, sssp's",
        "  frontier, kcore) localCheckpoint per round, so the final",
        "  explain shows only the last round's plan — per-round shape",
        "  is documented in the operator docstrings (one keyed join +",
        "  agg per round, edge partitioning reused, score frames",
        "  broadcast under an explicit row guard). Depth-bounded",
        "  betweenness and k-truss use lazy persist, so their rows",
        "  show the WHOLE multi-round DAG in one plan (hence the high",
        "  join/exchange counts — that is 3+ rounds of triangle or",
        "  BFS joins, not one bad join).",
        "- winnow_dedup_clusters at sf0.1 splits 30s pair generation /",
        "  7s clustering (measured): the synthetic corpus is",
        "  pathologically self-similar (907k true near-dup pairs among",
        "  5000 docs, tiny 31-token vocabulary), so the fingerprint",
        "  equi-join's quadratic OUTPUT is inherent to the data, not a",
        "  plan defect; on real text fingerprint collisions are rare",
        "  and the blocking join's cost tracks collisions, not |docs|².",
        "- gapfill_locf_hourly's BroadcastNestedLoopJoin is the 1-row",
        "  bounds-frame cross join (grid synthesis);",
        "  rolling_7d_active_users' BNLJ is the broadcast day-grid",
        "  range join — range predicates cannot hash, and the",
        "  broadcast side is one row per distinct day.",
        "- Per-query bench deltas vs the r2 anchor redistribute cold",
        "  costs, not plan quality: adjacent queries share persisted",
        "  frames (partsupp edge cache, document shingles, embedding",
        "  casts), so adding/reordering bench entries shifts which query",
        "  pays the materialization. Verified by cold/warm A/B at sf0.1:",
        "  embedding_topk_pairs runs 4.2s cold / 1.3s warm with IDENTICAL",
        "  plans across the r2 and r3 query bodies; simhash+minhash pair",
        "  sums are flat round-over-round (9.32s r2, 9.47s r3) while the",
        "  split between them moved.",
        "",
        "## Round 4 re-measure (VERDICT-r3 #5)",
        "",
        "Against the refreshed r3 anchor (BENCH_ANCHOR.json, sf0.1,",
        "local[32]): common-28 subset 66.3s vs 74.0s anchor = 0.90x (10%",
        "faster). The five queries flagged as nominal regressions in r3",
        "all REVERSED under the new anchor, confirming the",
        "cold-cost-redistribution explanation: degree_ccdf 1.22->0.61",
        "(-50%), top10_customers_by_orders 1.00->0.69 (-31%),",
        "canonical_edge_groups 3.48->2.15 (-38%), token_cooccurrence",
        "1.98->1.44 (-28%), cumulative_daily_revenue 0.62->0.43 (-30%).",
        "Closed: no real plan-level regression existed.",
        "",
        "Remaining >15% upticks are sub-second and noise-band-adjacent:",
        "quality_filter_summary 0.53->0.67 (+27%, plan unchanged — one",
        "codegen stage). mixture_rebalance_langs showed +21% from this",
        "round's left-join fix (broadcast hint had landed on the",
        "PRESERVED side of the left-outer, which Spark cannot broadcast",
        "-> silent SMJ fallback); re-hinted onto the counts side,",
        "restoring the broadcast plan.",
        "",
        "New r4 bench entries (first cold measurements, no anchor yet):",
        "cleaning_normalize_customers 0.20s, relation_maintenance_counts",
        "2.79s, media_audio_features 1.43s (real WAV decode through",
        "Arrow), decorated_path_s1 5.09s (3-hop BFS loop + parent",
        "backtrack + decoration joins — same per-round shape as",
        "weighted_sssp_s1 at 5.8s; the loop dominates, the decoration is",
        "broadcast joins).",
    ]
    out_path = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "PLANS.md")
    with open(out_path, "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"wrote {out_path}")
    spark.stop()


if __name__ == "__main__":
    main()
