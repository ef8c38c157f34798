"""Dump .explain('formatted') for catalog queries to plans/<dir>/.

Usage: python tools/dump_plan.py <outdir-suffix> <query> [...]
Writes plans/$PLANS_ROUND/<query>_<suffix>.txt (suffix e.g.
'before'/'after'; PLANS_ROUND defaults to r10).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from social_link_prediction_spark import queries as catalog
from social_link_prediction_spark.session import get_spark


def main() -> None:
    suffix = sys.argv[1]
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    outdir = os.path.join(here, "plans", os.environ.get("PLANS_ROUND", "r10"))
    os.makedirs(outdir, exist_ok=True)
    spark = get_spark(
        "dump-plan", extra_conf={"spark.ui.showConsoleProgress": "false"}
    )
    spark.sparkContext.setLogLevel("ERROR")
    for name in names:
        df = catalog.QUERIES[name](spark, sf_dir)
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        path = os.path.join(outdir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({len(plan)} bytes)")
    spark.stop()


if __name__ == "__main__":
    main()
