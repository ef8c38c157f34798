"""Warehouse merge (upsert / SCD2) and product quantization."""

import datetime

from pyspark.sql import functions as F

from social_link_prediction_spark.operators import merge as mg
from social_link_prediction_spark.pipelines import similarity as sim

D = datetime.date


def test_upsert_replaces_and_appends(spark):
    cur = spark.createDataFrame([(1, "a"), (2, "b")], ["k", "v"])
    upd = spark.createDataFrame([(2, "B"), (3, "c")], ["k", "v"])
    out = {r.k: r.v for r in mg.upsert(cur, upd, "k").collect()}
    assert out == {1: "a", 2: "B", 3: "c"}


def _dim(spark):
    return spark.createDataFrame(
        [
            # (key, attr, valid_from, valid_to, is_current)
            (1, "x", D(2020, 1, 1), None, 1),
            (2, "y", D(2020, 1, 1), None, 1),
            (3, "z", D(2020, 1, 1), None, 1),
            # pre-existing history row for key 1
            (1, "w", D(2019, 1, 1), D(2020, 1, 1), 0),
        ],
        ["k", "attr", "valid_from", "valid_to", "is_current"],
    )


def test_scd2_all_four_paths(spark):
    upd = spark.createDataFrame(
        [
            (1, "X", D(2021, 6, 1)),   # changed -> close + reinsert
            (2, "y", D(2021, 6, 1)),   # no-op -> dropped
            (9, "new", D(2021, 6, 1)), # brand-new key
        ],
        ["k", "attr", "effective_ts"],
    )
    out = mg.scd2_merge(_dim(spark), upd, key="k", tracked=["attr"]).collect()
    rows = {(r.k, r.attr): r for r in out}
    assert len(out) == 6
    # old history untouched
    assert rows[(1, "w")].is_current == 0 and rows[(1, "w")].valid_to == D(2020, 1, 1)
    # key 1 closed at the update ts, new version open
    assert rows[(1, "x")].is_current == 0 and rows[(1, "x")].valid_to == D(2021, 6, 1)
    assert rows[(1, "X")].is_current == 1 and rows[(1, "X")].valid_to is None
    assert rows[(1, "X")].valid_from == D(2021, 6, 1)
    # no-op update: key 2 keeps its original open version, no new row
    assert rows[(2, "y")].is_current == 1 and rows[(2, "y")].valid_from == D(2020, 1, 1)
    # untouched key 3
    assert rows[(3, "z")].is_current == 1
    # brand-new key
    assert rows[(9, "new")].is_current == 1 and rows[(9, "new")].valid_from == D(2021, 6, 1)


def test_scd2_null_safe_attr_compare(spark):
    cur = spark.createDataFrame(
        [(1, None, D(2020, 1, 1), None, 1)],
        "k int, attr string, valid_from date, valid_to date, is_current int",
    )
    # None -> None is a no-op; None -> 'a' is a change
    noop = spark.createDataFrame(
        [(1, None, D(2021, 1, 1))], "k int, attr string, effective_ts date"
    )
    out = mg.scd2_merge(cur, noop, key="k", tracked=["attr"]).collect()
    assert len(out) == 1 and out[0].is_current == 1

    change = spark.createDataFrame(
        [(1, "a", D(2021, 1, 1))], "k int, attr string, effective_ts date"
    )
    out = mg.scd2_merge(cur, change, key="k", tracked=["attr"]).collect()
    assert len(out) == 2
    assert {r.is_current for r in out} == {0, 1}


_BOOKS = [
    [[1.0, 0.0], [0.0, 1.0]],  # subspace 0: dims 0-1
    [[2.0, 0.0], [0.0, 2.0]],  # subspace 1: dims 2-3
]


def test_pq_encode_codes_and_error(spark):
    df = spark.createDataFrame(
        [
            (0, [1.0, 0.0, 0.0, 2.0]),  # exact centroids -> codes [0,1], err 0
            (1, [0.1, 0.9, 1.9, 0.1]),  # near [0,1] and [2,0] -> codes [1,0]
        ],
        ["vec_id", "embedding"],
    )
    out = {r.id: r for r in sim.pq_encode(df, _BOOKS).collect()}
    assert list(out[0].codes) == [0, 1] and abs(out[0].sq_err) < 1e-12
    assert list(out[1].codes) == [1, 0]
    # err: (0.1^2 + 0.1^2) + (0.1^2 + 0.1^2)
    assert abs(out[1].sq_err - 0.04) < 1e-9


def test_pq_encode_tie_first_wins(spark):
    df = spark.createDataFrame([(0, [0.5, 0.5, 1.0, 1.0])], ["vec_id", "embedding"])
    out = sim.pq_encode(df, _BOOKS).first()
    assert list(out.codes)[0] == 0  # equidistant -> first centroid


def test_pq_train_codebooks_shapes(spark):
    import random

    rng = random.Random(3)
    rows = [(i, [rng.gauss(0, 1) for _ in range(8)]) for i in range(60)]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    books = sim.pq_train_codebooks(df, n_subspaces=2, n_centroids=3)
    assert len(books) == 2
    assert all(len(b) == 3 for b in books)
    assert all(len(c) == 4 for b in books for c in b)
    enc = sim.pq_encode(df, books)
    codes = enc.select(F.explode("codes").alias("c")).distinct().collect()
    assert {r.c for r in codes} <= {0, 1, 2}


def test_pq_adc_topk_orders_by_lut_distance(spark):
    df = spark.createDataFrame(
        [
            (0, [1.0, 0.0, 0.0, 2.0]),   # codes [0,1]
            (1, [0.0, 1.0, 2.0, 0.0]),   # codes [1,0]
        ],
        ["vec_id", "embedding"],
    )
    # query = exactly centroid (0,1) pattern -> vec 0's codes give dist 0
    q = [1.0, 0.0, 0.0, 2.0]
    out = sim.pq_adc_topk(df, _BOOKS, q, k=2).collect()
    assert out[0].id == 0 and abs(out[0].approx_sq_dist) < 1e-12
    assert out[1].id == 1 and out[1].approx_sq_dist > 0


def test_scd2_idempotent_on_reapply(spark):
    """Re-applying the same update batch to the merged table is a
    no-op: every changed key's new current version now EQUALS the
    update, so the second pass classifies it no-op and drops it."""
    upd = spark.createDataFrame(
        [(1, "X", D(2021, 6, 1)), (9, "new", D(2021, 6, 1))],
        ["k", "attr", "effective_ts"],
    )
    once = mg.scd2_merge(_dim(spark), upd, key="k", tracked=["attr"])
    twice = mg.scd2_merge(once, upd, key="k", tracked=["attr"])
    a = sorted(map(tuple, once.collect()))
    b = sorted(map(tuple, twice.collect()))
    assert a == b


def test_scd2_asof_join_routes_to_valid_version(spark):
    dim = spark.createDataFrame(
        [
            (1, "old", D(2020, 1, 1), D(2021, 1, 1), 0),
            (1, "new", D(2021, 1, 1), None, 1),
        ],
        "k int, attr string, valid_from date, valid_to date, is_current int",
    )
    fact = spark.createDataFrame(
        [
            (1, D(2020, 6, 1), 10.0),   # -> old version
            (1, D(2021, 1, 1), 20.0),   # boundary: valid_from <= ts < valid_to -> new
            (1, D(2022, 1, 1), 30.0),   # -> new (open-ended)
            (1, D(2019, 1, 1), 40.0),   # before any version -> dropped (inner)
            (2, D(2021, 1, 1), 50.0),   # unknown key -> dropped
        ],
        "k int, ts date, v double",
    )
    out = mg.scd2_asof_join(fact, dim, key=["k"], fact_ts="ts")
    got = {float(r.v): r.attr for r in out.collect()}
    assert got == {10.0: "old", 20.0: "new", 30.0: "new"}


def test_snapshot_diff_classifies_all_cases(spark):
    from social_link_prediction_spark.operators.merge import snapshot_diff
    from pyspark.sql import functions as F

    old = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0), (4, None, 40.0)],
        ["k", "v", "x"],
    )
    new = spark.createDataFrame(
        [(2, "b", 20.0), (3, "c", 31.0), (4, "", 40.0), (5, "e", 50.0)],
        ["k", "v", "x"],
    )
    out = {r.k: r.change_type for r in snapshot_diff(old, new, "k").collect()}
    # 4 flips NULL -> '' : must be detected as changed (sentinel law)
    assert out == {
        1: "removed",
        2: "unchanged",
        3: "changed",
        4: "changed",
        5: "added",
    }


def test_snapshot_diff_compare_cols_subset(spark):
    from social_link_prediction_spark.operators.merge import snapshot_diff

    old = spark.createDataFrame([(1, "a", 1.0)], ["k", "v", "noise"])
    new = spark.createDataFrame([(1, "a", 2.0)], ["k", "v", "noise"])
    out = snapshot_diff(old, new, "k", compare_cols=["v"]).collect()
    assert out[0].change_type == "unchanged"
