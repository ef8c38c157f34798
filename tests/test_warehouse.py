"""Bucketed warehouse layout + skew/bloom join helpers.

Evidence that the engine's 100 TB strategies actually change the
physical plan (bucketing removes Exchanges) and preserve semantics
(salted/bloom variants equal their plain counterparts)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from social_link_prediction_spark import warehouse as wh
from social_link_prediction_spark.operators import joins as jn


@pytest.fixture(scope="module")
def tables(spark):
    orders = spark.range(0, 5000).select(
        F.col("id").alias("o_orderkey"),
        (F.pmod(F.col("id"), F.lit(97))).alias("o_custkey"),
        (F.col("id") % 1000 * 1.5).alias("o_totalprice"),
    )
    lineitem = spark.range(0, 20000).select(
        (F.col("id") % 5000).alias("l_orderkey"),
        (F.col("id") % 321).alias("l_partkey"),
        (F.col("id") % 7 + 1.0).alias("l_quantity"),
    )
    return orders, lineitem


def test_bucketed_join_has_no_exchange(spark, tables):
    orders, lineitem = tables
    wh.write_bucketed(orders, "t_orders_b", "o_orderkey", 8)
    wh.write_bucketed(
        lineitem.withColumnRenamed("l_orderkey", "o_orderkey"),
        "t_lineitem_b",
        "o_orderkey",
        8,
    )
    a = wh.read_table(spark, "t_orders_b")
    b = wh.read_table(spark, "t_lineitem_b")
    # forbid broadcast so the co-location claim is actually exercised
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = a.join(b, "o_orderkey")
        assert wh.n_exchanges(joined) == 0
        # same join over the raw (unbucketed) frames shuffles both sides
        raw = tables[0].join(
            tables[1].withColumnRenamed("l_orderkey", "o_orderkey"), "o_orderkey"
        )
        assert wh.n_exchanges(raw) >= 2
        assert joined.count() == raw.count()
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")


def test_bucketed_groupby_has_no_exchange(spark, tables):
    orders, _ = tables
    wh.write_bucketed(orders, "t_orders_g", "o_custkey", 8)
    t = wh.read_table(spark, "t_orders_g")
    agg = t.groupBy("o_custkey").agg(F.sum("o_totalprice").alias("rev"))
    assert wh.n_exchanges(agg) == 0
    plain = orders.groupBy("o_custkey").agg(F.sum("o_totalprice").alias("rev"))
    assert sorted(map(tuple, agg.collect())) == sorted(map(tuple, plain.collect()))


def test_salted_join_matches_plain(spark, tables):
    orders, lineitem = tables
    dim = orders.select("o_orderkey", "o_custkey").withColumnRenamed(
        "o_orderkey", "l_orderkey"
    )
    plain = lineitem.join(dim, "l_orderkey").groupBy("o_custkey").count()
    salted = (
        jn.salted_join(lineitem, dim, "l_orderkey", n_salts=8)
        .groupBy("o_custkey")
        .count()
    )
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_salted_aggregate_matches_plain(spark, tables):
    _, lineitem = tables
    plain = lineitem.groupBy("l_partkey").agg(
        F.sum("l_quantity").alias("sum_l_quantity"),
        F.count("l_quantity").alias("count_l_quantity"),
        F.max("l_quantity").alias("max_l_quantity"),
    )
    salted = jn.salted_aggregate(
        lineitem,
        ["l_partkey"],
        {"l_quantity": "sum"},
        n_salts=8,
    ).join(
        jn.salted_aggregate(lineitem, ["l_partkey"], {"l_quantity": "count"}, 8),
        "l_partkey",
    ).join(
        jn.salted_aggregate(lineitem, ["l_partkey"], {"l_quantity": "max"}, 8),
        "l_partkey",
    )
    p = {r["l_partkey"]: (r["sum_l_quantity"], r["count_l_quantity"], r["max_l_quantity"])
         for r in plain.collect()}
    s = {r["l_partkey"]: (r["sum_l_quantity"], r["count_l_quantity"], r["max_l_quantity"])
         for r in salted.collect()}
    assert p == s


def test_salted_join_rejects_right_preserving(spark, tables):
    orders, lineitem = tables
    dim = orders.select(F.col("o_orderkey").alias("l_orderkey"), "o_custkey")
    import pytest

    for how in ("right", "full", "outer", "full_outer"):
        with pytest.raises(ValueError, match="salted_join"):
            jn.salted_join(lineitem, dim, "l_orderkey", n_salts=4, how=how)
    # left-preserving types still go through
    n_semi = jn.salted_join(lineitem, dim, "l_orderkey", n_salts=4, how="left_semi").count()
    assert n_semi == lineitem.join(dim, "l_orderkey", "left_semi").count()


def test_bloom_semi_filter_non_multiple_of_64_bits(spark, tables):
    """num_bits not divisible by 64 used to truncate the word array and
    IndexError when a hash landed in the last partial word."""
    orders, lineitem = tables
    keys = orders.select(F.col("o_orderkey").alias("l_orderkey"))
    filtered = jn.bloom_semi_filter(lineitem, keys, "l_orderkey", num_bits=1000, n_hashes=3)
    exact = lineitem.join(keys, "l_orderkey", "left_semi")
    assert filtered.join(keys, "l_orderkey", "left_semi").count() == exact.count()


def test_bloom_semi_filter_superset_and_exact_after_join(spark, tables):
    orders, lineitem = tables
    keys = orders.filter(F.col("o_custkey") == 13).select(
        F.col("o_orderkey").alias("l_orderkey")
    )
    filtered = jn.bloom_semi_filter(lineitem, keys, "l_orderkey", num_bits=1 << 16)
    exact = lineitem.join(keys, "l_orderkey", "left_semi")
    # bloom keeps all true matches (no false negatives)
    assert filtered.join(exact, ["l_orderkey", "l_partkey", "l_quantity"], "left_semi").count() == exact.count()
    # and the follow-up exact semi-join removes any false positives
    assert (
        filtered.join(keys, "l_orderkey", "left_semi").count() == exact.count()
    )


def test_zorder_key_matches_python_morton(spark):
    from social_link_prediction_spark import warehouse as wh

    def morton(a, b, bits=16):
        k = 0
        for i in range(bits):
            k |= ((a >> i) & 1) << (2 * i)
            k |= ((b >> i) & 1) << (2 * i + 1)
        return k

    rows = [(0, 0), (1, 0), (0, 1), (3, 5), (65535, 65535), (12345, 54321)]
    df = spark.createDataFrame(rows, ["a", "b"])
    out = df.withColumn("z", wh.zorder_key("a", "b", bits=16)).collect()
    for r in out:
        assert r.z == morton(r.a, r.b), (r.a, r.b)


def test_zorder_key_locality(spark):
    # neighboring (a,b) cells interleave into nearby keys: the max key
    # of a 2x2 block is within the block's morton range (property of
    # the curve), and sorting by z groups the quadrants.
    from social_link_prediction_spark import warehouse as wh

    rows = [(a, b) for a in range(4) for b in range(4)]
    df = spark.createDataFrame(rows, ["a", "b"])
    out = sorted(
        ((r.z, r.a, r.b) for r in df.withColumn("z", wh.zorder_key("a", "b", bits=2)).collect())
    )
    # first four keys = the (0..1, 0..1) quadrant
    first_quadrant = {(a, b) for _, a, b in out[:4]}
    assert first_quadrant == {(0, 0), (1, 0), (0, 1), (1, 1)}


def test_zorder_key_validation(spark):
    import pytest as _pytest

    from social_link_prediction_spark import warehouse as wh

    with _pytest.raises(ValueError):
        wh.zorder_key("a", "b", "c", "d", bits=16)  # 64 bits > 63
    with _pytest.raises(ValueError):
        wh.zorder_key()


def test_compact_parquet_reduces_files_preserves_rows(spark, tmp_path):
    import glob

    from social_link_prediction_spark import warehouse as wh

    path = str(tmp_path / "t")
    # many tiny appended files
    for i in range(6):
        spark.range(i * 100, (i + 1) * 100).withColumnRenamed("id", "k").write.mode(
            "append"
        ).parquet(path)
    before = len(glob.glob(path + "/*.parquet"))
    assert before >= 6
    n = wh.compact_parquet(spark, path, target_file_bytes=1 << 30)
    after = len(glob.glob(path + "/*.parquet"))
    assert n == 1 and after == 1
    out = spark.read.parquet(path)
    assert out.count() == 600
    assert out.agg({"k": "min"}).first()[0] == 0
    assert out.agg({"k": "max"}).first()[0] == 599


def test_compact_parquet_sorted_layout(spark, tmp_path):
    import glob

    from social_link_prediction_spark import warehouse as wh

    path = str(tmp_path / "t2")
    spark.range(0, 1000).withColumnRenamed("id", "k").orderBy(F.rand(7)).write.parquet(path)
    wh.compact_parquet(spark, path, target_file_bytes=4000, sort_cols=["k"])
    files = sorted(glob.glob(path + "/*.parquet"))
    assert len(files) >= 2
    # range-partitioned + sorted: per-file key ranges must not overlap
    ranges = []
    for f in files:
        d = spark.read.parquet(f).agg(F.min("k"), F.max("k")).first()
        ranges.append((d[0], d[1]))
    ranges.sort()
    for (lo1, hi1), (lo2, _hi2) in zip(ranges, ranges[1:]):
        assert hi1 < lo2


def test_compact_parquet_recovers_mid_swap_crash(spark, tmp_path):
    import glob
    import os

    from social_link_prediction_spark import warehouse as wh

    path = str(tmp_path / "t3")
    spark.range(0, 300).withColumnRenamed("id", "k").write.parquet(path)
    # Simulate a crash between rename(path, old) and rename(tmp, path):
    # the table directory is gone, __compact_old holds the only copy,
    # and a partial __compact_tmp is lying around.
    os.rename(path, path + "__compact_old")
    os.makedirs(path + "__compact_tmp")
    (tmp_path / "t3__compact_tmp" / "part-junk.parquet").write_bytes(b"junk")
    n = wh.compact_parquet(spark, path, target_file_bytes=1 << 30)
    assert n == 1
    assert not os.path.exists(path + "__compact_old")
    assert not os.path.exists(path + "__compact_tmp")
    assert spark.read.parquet(path).count() == 300


def test_compact_parquet_can_split_oversized_files(spark, tmp_path):
    import glob

    from social_link_prediction_spark import warehouse as wh

    path = str(tmp_path / "t4")
    # one big file; a tiny target must INCREASE the file count, which
    # coalesce alone can never do
    spark.range(0, 20000).withColumnRenamed("id", "k").coalesce(1).write.parquet(path)
    assert len(glob.glob(path + "/*.parquet")) == 1
    n = wh.compact_parquet(spark, path, target_file_bytes=20000)
    files = glob.glob(path + "/*.parquet")
    assert len(files) >= 2
    assert n == len(files)
    assert spark.read.parquet(path).count() == 20000


def test_partitioned_write_prunes_directories(spark, tmp_path):
    # Predicate on the partition column must land in PartitionFilters
    # (directory pruning), NOT in the row-level PushedFilters; a
    # predicate on a data column must do the opposite.
    path = str(tmp_path / "events_by_day")
    df = spark.range(0, 1000).select(
        F.col("id").alias("event_id"),
        (F.col("id") % 10).alias("day"),
        (F.col("id") % 3).alias("kind"),
    )
    wh.write_partitioned(df, path, "day")

    pruned = spark.read.parquet(path).filter(F.col("day") == 3)
    pf = " ".join(wh.partition_filters(pruned))
    assert "day" in pf, f"partition predicate not pruned: {pf!r}"
    assert pruned.count() == 100
    # the partition predicate must not be a row filter
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    pushed = " ".join(__import__("re").findall(r"PushedFilters: \[([^\]]*)\]", plan))
    assert "day" not in pushed

    data_filtered = spark.read.parquet(path).filter(F.col("kind") == 1)
    assert not wh.partition_filters(data_filtered)
    plan2 = data_filtered._jdf.queryExecution().executedPlan().toString()
    pushed2 = " ".join(__import__("re").findall(r"PushedFilters: \[([^\]]*)\]", plan2))
    assert "kind" in pushed2


def test_partitioned_files_only_under_matching_directory(spark, tmp_path):
    import os

    path = str(tmp_path / "t")
    df = spark.range(0, 100).select(
        F.col("id"), (F.col("id") % 4).alias("p")
    )
    wh.write_partitioned(df, path, ["p"])
    dirs = sorted(d for d in os.listdir(path) if d.startswith("p="))
    assert dirs == ["p=0", "p=1", "p=2", "p=3"]
    back = spark.read.parquet(path)
    assert back.count() == 100
    # round-trip preserves the partition column (as a directory key)
    assert set(back.columns) == {"id", "p"}


def test_skew_report_identifies_heavy_key(spark):
    # 1000 rows of key 'hot' + 10 distinct singleton keys.
    rows = [("hot",)] * 1000 + [(f"k{i}",) for i in range(10)]
    df = spark.createDataFrame(rows, ["key"])
    rep = wh.skew_report(df, "key", k=3).collect()
    assert rep[0].key == "hot" and rep[0].n_rows == 1000
    # share = 1000/1010, x_mean = 1000 / (1010/11 keys)
    assert abs(rep[0].share - 1000 / 1010) < 1e-6
    assert abs(rep[0].x_mean - 1000 / (1010 / 11)) < 0.01
    assert all(r.n_rows == 1 for r in rep[1:])
