"""EP1 CLI end-to-end (VERDICT r5 item 7): the ``python -m
social_link_prediction_spark`` dispatch — --etl runs extraction →
transformation → warehouse write on the offline fixture fetcher
(reference main.py:74-90 + scripts/etl_run.py:13-24 semantics);
--analyze resolves two names and returns a decorated path. The
functions are invoked in-process against the shared test session
(get_spark is getOrCreate, so no second JVM spins up)."""

from __future__ import annotations

from pyspark.sql import functions as F

from social_link_prediction_spark import __main__ as cli


def test_cli_etl_writes_warehouse(spark, tmp_path):
    out = cli.run_etl(str(tmp_path / "raw"), str(tmp_path / "wh"))
    # spouse page carries 6 bindings (2 dups + 2 malformed among them)
    assert out["raw_counts"] == {"spouse": 6, "educated_at": 3, "influenced_by": 2}
    edges = spark.read.parquet(str(tmp_path / "wh" / "edges"))
    nodes = spark.read.parquet(str(tmp_path / "wh" / "nodes"))
    # spouse: 4 raw valid rows -> 2 after exact+reverse dedup and
    # the bad-URI / unresolved-label drops; educated_at 3; influenced 2
    by_rel = {
        r["relationship_label"]: r["n"]
        for r in edges.groupBy("relationship_label")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert by_rel == {"spouse": 2, "educated_at": 3, "influenced_by": 2}
    # endpoints are valid Q-IDs, node ids unique, partition column kept
    assert edges.filter(~F.col("person").rlike(r"^Q\d+$")).count() == 0
    ids = [r.id for r in nodes.select("id").collect()]
    assert len(ids) == len(set(ids))
    assert out["nodes"] == len(ids)


def test_cli_analyze_finds_decorated_path(spark, tmp_path, capsys):
    cli.run_etl(str(tmp_path / "raw"), str(tmp_path / "wh"))
    capsys.readouterr()
    res = cli.run_analyze("Ada Lovelace", "Alan Turing", str(tmp_path / "wh"))
    assert res["success"] is True
    assert res["path"][0] == "Q1" and res["path"][-1] == "Q4"
    # the bridge is the shared institution, not the blacklisted
    # influenced_by edge (weight = +inf never relaxes)
    assert "Q101" in res["path"]
    printed = capsys.readouterr().out
    assert "educated_at" in printed


def test_cli_usage_exit_code():
    assert cli.main([]) == 2
