"""Cross-config stability check: hunt merge-order-sensitive outputs.

The r8 driver gate's one red row (`brier_decomposition_scores`) passed
every local comparison and flipped only at the driver: its rounded
near-zero cancelling difference had a SIGN determined by Spark's
nondeterministic partial-sum merge order, and -0.0 vs 0.0 flips a
value hash. `tools/verify_local.py` could never catch that class —
its float norm collapses -0.0 to "0", and a single Spark run only
samples ONE merge order anyway.

This tool runs every ``queries()`` entry's SPARK side twice, in two
separate processes with deliberately different parallelism
(``local[3]``/shuffle=7 vs ``local[8]``/shuffle=32 — different
partition counts force different partial-aggregation merge trees), and
compares a STRICT per-query hash that keeps the sign of zero and the
full rounded repr. A mismatch means the query's output depends on
execution layout — the exact hazard class that flips a driver hash
across environments while passing locally.

Usage:
    python tools/stability_check.py [sf_dir] [name ...]
    # inner worker mode (one config, dump hashes):
    python tools/stability_check.py --worker OUT.json SF_DIR [name ...]

Writes `.stability_r{N}.json` next to the repo root if
STABILITY_OUT is set; exits 1 on any mismatch.
"""

from __future__ import annotations

import hashlib
import json
import math
import os
import subprocess
import sys
import tempfile

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)


def _norm_strict(v) -> str:
    """Like verify_local._norm but sign-of-zero-PRESERVING: the whole
    point is to see -0.0 differ from 0.0 the way a driver-side
    stringification would."""
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if v == 0.0 and math.copysign(1.0, v) < 0:
            return "-0"
        if v == int(v) and abs(v) < 1e15:
            return str(int(v))
        return repr(round(v, 9))
    if isinstance(v, bool):
        return str(int(v))
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_norm_strict(x) for x in v) + "]"
    return str(v)


def _hash(cols, rows) -> str:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted(
        "\x1f".join(_norm_strict(r[i]) for i in order) for r in rows
    )
    return hashlib.sha256("\n".join(lines).encode()).hexdigest()


def _worker(out_path: str, sf_dir: str, only: set[str]) -> None:
    from social_link_prediction_spark.session import get_spark

    import __spark_entry__ as entrymod

    spark = get_spark("stability-check")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()
    res: dict[str, str] = {}
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            df = fn(spark, sf_dir)
            res[name] = _hash(df.columns, df.collect())
        except Exception as e:  # noqa: BLE001 — record, keep sweeping
            res[name] = f"ERROR: {e}"
    with open(out_path, "w") as f:
        json.dump(res, f)
    spark.stop()


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "--worker":
        _worker(sys.argv[2], sys.argv[3], set(sys.argv[4:]))
        return

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    names = sys.argv[2:]
    configs = [("3", "7"), ("8", "32")]
    outs = []
    for cpus, _shuf in configs:
        fd, path = tempfile.mkstemp(suffix=".json")
        os.close(fd)
        outs.append(path)
        env = dict(os.environ, SPARK_GRAFT_CPUS=cpus)
        # SPARK_GRAFT_CPUS drives both local[n] and the shuffle
        # partition default in session.get_spark; two different values
        # give two different partial-merge trees.
        r = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--worker", path, sf_dir]
            + names,
            env=env,
        )
        if r.returncode != 0:
            print(f"worker (cpus={cpus}) failed", file=sys.stderr)
            sys.exit(2)
    a = json.load(open(outs[0]))
    b = json.load(open(outs[1]))
    diff = sorted(
        k for k in set(a) | set(b) if a.get(k) != b.get(k)
    )
    errs = sorted(
        k for k in set(a) | set(b)
        if str(a.get(k, "")).startswith("ERROR")
        or str(b.get(k, "")).startswith("ERROR")
    )
    report = {
        "sf_dir": sf_dir,
        "n_checked": len(set(a) | set(b)),
        "configs": [
            {"cpus": c, "shuffle_partitions": s} for c, s in configs
        ],
        "unstable": diff,
        "errors": errs,
    }
    out_file = os.environ.get("STABILITY_OUT")
    if out_file:
        with open(out_file, "w") as f:
            json.dump(report, f, indent=1, sort_keys=True)
    print(json.dumps(report))
    for p in outs:
        os.unlink(p)
    sys.exit(1 if diff else 0)


if __name__ == "__main__":
    main()
