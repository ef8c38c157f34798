"""Profile one catalog query: wall time split into Spark job time vs
driver gaps (planning/overhead), per-job durations, and stage stats.

Usage: python tools/profile_query.py <query> [<query> ...]
Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1), SPARK_GRAFT_CPUS.

Uses a StatusTracker-free approach: a SparkListener via the py4j
callback is flaky; instead we read the REST-ish status through
sc.statusTracker after the run (job ids + times are not exposed), so
the robust path is the event log. We enable spark.eventLog.enabled
into a temp dir and parse the JSON lines after each query.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from social_link_prediction_spark import queries as catalog
from social_link_prediction_spark.session import get_spark


def main() -> None:
    names = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    evdir = tempfile.mkdtemp(prefix="spark-ev-")
    spark = get_spark(
        "profile",
        extra_conf={
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": "file://" + evdir,
            "spark.eventLog.compress": "false",
            "spark.eventLog.rolling.enabled": "false",
            "spark.ui.showConsoleProgress": "false",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")

    # warmup
    catalog.QUERIES["pricing_summary"](spark, sf_dir).write.format(
        "noop"
    ).mode("overwrite").save()

    for name in names:
        fn = catalog.QUERIES[name]
        spark.sparkContext.setJobDescription(name)
        t0 = time.perf_counter()
        df = fn(spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        wall = time.perf_counter() - t0
        print(f"\n=== {name}: wall {wall:.2f}s ===")
        report(evdir, spark.sparkContext.applicationId, t0_wall=wall, name=name)
    spark.stop()


_seen_jobs: set[tuple[str, int]] = set()


def report(evdir: str, app_id: str, t0_wall: float, name: str) -> None:
    # event log file is <dir>/<app-id>[.inprogress]
    path = None
    for root, _dirs, files in os.walk(evdir):
        for fn in files:
            if app_id in fn and "crc" not in fn and "appstatus" not in fn:
                path = os.path.join(root, fn)
    if path is None:
        print(f"  (no event log under {evdir}: {os.listdir(evdir)})")
        return
    jobs = {}
    stages = {}
    with open(path) as f:
        for line in f:
            try:
                ev = json.loads(line)
            except ValueError:
                continue
            e = ev.get("Event")
            if e == "SparkListenerJobStart":
                jid = ev["Job ID"]
                jobs[jid] = {
                    "start": ev["Submission Time"],
                    "desc": ev.get("Properties", {}).get(
                        "spark.job.description", ""
                    ),
                    "stages": len(ev.get("Stage Infos", [])),
                }
            elif e == "SparkListenerJobEnd":
                jid = ev["Job ID"]
                if jid in jobs:
                    jobs[jid]["end"] = ev["Completion Time"]
            elif e == "SparkListenerStageCompleted":
                si = ev["Stage Info"]
                sid = si["Stage ID"]
                stages[sid] = {
                    "name": si["Stage Name"].split("\n")[0][:60],
                    "tasks": si["Number of Tasks"],
                    "start": si.get("Submission Time"),
                    "end": si.get("Completion Time"),
                }
    mine = {
        j: v
        for j, v in jobs.items()
        if v.get("desc") == name and "end" in v and (name, j) not in _seen_jobs
    }
    for j in mine:
        _seen_jobs.add((name, j))
    if not mine:
        print("  (no jobs captured)")
        return
    items = sorted(mine.items())
    tmin = min(v["start"] for _, v in items)
    tmax = max(v["end"] for _, v in items)
    jtime = sum(v["end"] - v["start"] for _, v in items) / 1000.0
    span = (tmax - tmin) / 1000.0
    print(
        f"  jobs: {len(items)}  job-time sum {jtime:.2f}s  span {span:.2f}s"
        f"  driver-gap within span {max(span - jtime, 0):.2f}s"
        f"  pre-first-job {t0_wall - span:.2f}s"
    )
    # top jobs by duration
    top = sorted(items, key=lambda kv: kv[1]["start"])
    prev_end = None
    for j, v in top:
        d = (v["end"] - v["start"]) / 1000.0
        gap = (v["start"] - prev_end) / 1000.0 if prev_end else 0.0
        prev_end = v["end"]
        flag = " <== gap" if gap > 0.3 else ""
        if d > 0.2 or gap > 0.3:
            print(
                f"    job {j}: {d:6.2f}s  ({v['stages']} stages)"
                f"  gap-before {gap:5.2f}s{flag}"
            )


if __name__ == "__main__":
    main()
