"""Catalog part 2/6: TPC-H tail + time series + text/dedup + stats families (tpch q20-q22,
sessionization, sketches, calibration, ANN serving, community/graph ops).

Continuation of the single registration script split at top-level
statement boundaries; see catalog/__init__.py for the chain design.
"""
from __future__ import annotations  # noqa: F401

from social_link_prediction_spark.catalog import c01 as _prev

# continue the registration script: adopt the full accumulated
# namespace (incl. _-prefixed helpers and the shared registries)
globals().update(
    {k: v for k, v in vars(_prev).items() if not k.startswith("__")}
)
del _prev



@query(
    "tpch_q20_part_promotion",
    f"""
    WITH {_DUCK_PSX.strip()},
    shipped AS (
        SELECT l_partkey, l_suppkey, 0.5 * sum(l_quantity) AS half_qty
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1997-01-01'
          AND l_shipdate <  TIMESTAMP '1998-01-01'
        GROUP BY l_partkey, l_suppkey
    )
    SELECT s_suppkey, s_name
    FROM supplier
    WHERE s_suppkey IN (
        SELECT ps_suppkey
        FROM psx JOIN shipped ON ps_partkey = l_partkey AND ps_suppkey = l_suppkey
        WHERE ps_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE 'red%')
          AND ps_availqty > half_qty
    )
    ORDER BY s_suppkey
    """,
)
def tpch_q20_part_promotion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: suppliers holding excess stock (availqty above
    half the year's shipped quantity) of 'red' parts — nested IN
    subqueries become chained semi-joins; the part-name key set
    broadcasts, the shipped aggregate joins on the composite key."""
    li = _t(spark, sf_dir, "lineitem")
    psx = _psx(spark, sf_dir)
    red = _t(spark, sf_dir, "part").filter(F.col("p_name").like("red%")).select(
        F.col("p_partkey").alias("ps_partkey")
    )
    shipped = (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
        )
        .groupBy("l_partkey", "l_suppkey")
        .agg((F.lit(0.5) * F.sum("l_quantity")).alias("half_qty"))
    )
    excess = (
        psx.join(F.broadcast(red), "ps_partkey", "left_semi")
        .join(
            shipped,
            (psx["ps_partkey"] == shipped["l_partkey"])
            & (psx["ps_suppkey"] == shipped["l_suppkey"]),
        )
        .filter(F.col("ps_availqty") > F.col("half_qty"))
        .select("ps_suppkey")
    )
    supp = _t(spark, sf_dir, "supplier")
    return (
        supp.join(excess, supp["s_suppkey"] == excess["ps_suppkey"], "left_semi")
        .select("s_suppkey", "s_name")
        .orderBy("s_suppkey")
    )


@query(
    "tpch_q21_waiting_suppliers",
    """
    SELECT s_name, count(*) AS numwait
    FROM supplier
         JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
         JOIN orders ON o_orderkey = l1.l_orderkey
    WHERE o_orderstatus = 'F' AND l1.l_returnflag = 'R'
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.l_returnflag = 'R')
    GROUP BY s_name ORDER BY numwait DESC, s_name LIMIT 20
    """,
)
def tpch_q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: the sole "failing" supplier on multi-supplier
    finished orders (returnflag R stands in for receipt>commit). The
    EXISTS/NOT EXISTS pair with inequality correlation is expressed as
    aggregated per-order supplier sets joined once — Spark has no
    correlated-exists-with-inequality semi-join, and the aggregate
    form shuffles lineitem exactly once instead of twice."""
    li = _t(spark, sf_dir, "lineitem")
    # per (orderkey, suppkey): any other supplier on the order? any
    # OTHER supplier with a failing line?
    per_order = li.groupBy("l_orderkey").agg(
        F.countDistinct("l_suppkey").alias("n_supp"),
        F.countDistinct(
            F.when(F.col("l_returnflag") == "R", F.col("l_suppkey"))
        ).alias("n_fail_supp"),
        F.max(
            F.when(F.col("l_returnflag") == "R", F.col("l_suppkey"))
        ).alias("max_fail_supp"),
        F.min(
            F.when(F.col("l_returnflag") == "R", F.col("l_suppkey"))
        ).alias("min_fail_supp"),
    )
    # NOTE: no dedup — Q21's numwait counts qualifying l1 ROWS (a
    # supplier with several failing lines on one order counts each)
    l1 = li.filter(F.col("l_returnflag") == "R").select("l_orderkey", "l_suppkey")
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    supp = _t(spark, sf_dir, "supplier")
    cand = (
        l1.join(o, l1["l_orderkey"] == o["o_orderkey"])
        .join(per_order, "l_orderkey")
        # EXISTS other supplier: n_supp > 1; NOT EXISTS other failing
        # supplier: this suppkey is the ONLY failing one
        .filter(
            (F.col("n_supp") > 1)
            & (F.col("n_fail_supp") == 1)
            & (F.col("max_fail_supp") == F.col("l_suppkey"))
        )
    )
    return (
        cand.join(F.broadcast(supp), cand["l_suppkey"] == supp["s_suppkey"])
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(20)
    )


@query(
    "tpch_q22_global_sales_opportunity",
    """
    WITH pos AS (SELECT avg(c_acctbal) AS a FROM customer WHERE c_acctbal > 0),
    eligible AS (
        SELECT c_custkey, c_acctbal, CAST(c_custkey % 10 AS INT) AS cntrycode
        FROM customer
        WHERE c_custkey % 10 IN (1, 2, 3, 4, 5)
          AND c_acctbal > (SELECT a FROM pos)
    )
    SELECT cntrycode, count(*) AS numcust, round(sum(c_acctbal), 2) AS totacctbal
    FROM eligible
    WHERE NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey
                        AND o_orderdate >= TIMESTAMP '2000-01-01')
    GROUP BY cntrycode ORDER BY cntrycode
    """,
)
def tpch_q22_global_sales_opportunity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: rich-but-inactive customers per country code
    (c_custkey % 10 stands in for the phone prefix; "inactive" = no
    order since 2000 — the testdata's order coverage is dense, so the
    literal no-orders-ever predicate returns nothing). The global
    positive-balance average is a 1-row broadcast; the NOT EXISTS on
    orders is an anti-join on the already-filtered (small) customer
    side."""
    cust = _t(spark, sf_dir, "customer")
    pos = F.broadcast(
        cust.filter(F.col("c_acctbal") > 0).agg(F.avg("c_acctbal").alias("__a"))
    )
    eligible = (
        cust.filter((F.col("c_custkey") % 10).isin(1, 2, 3, 4, 5))
        .crossJoin(pos)
        .filter(F.col("c_acctbal") > F.col("__a"))
        .select(
            "c_custkey",
            "c_acctbal",
            (F.col("c_custkey") % 10).cast("int").alias("cntrycode"),
        )
    )
    o = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp")
    )
    return (
        eligible.join(o, eligible["c_custkey"] == o["o_custkey"], "left_anti")
        .groupBy("cntrycode")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.round(F.sum("c_acctbal"), 2).alias("totacctbal"),
        )
        .orderBy("cntrycode")
    )


# =====================================================================
# Paragraph-level exact dedup (C4-style line dedup): chunk every
# document into fixed 10-token "paragraphs", hash each, and surface
# the chunks repeated across the corpus. At 100 TB this is the
# line-dedup pass run before document-level near-dup: explode + one
# hash-keyed aggregation, all JVM (split/slice/md5 — no Python).
# =====================================================================
_PARA_W = 10


@query(
    "paragraph_dedup_topk",
    f"""
    WITH toks AS (
        SELECT doc_id, string_split(text, ' ') AS t FROM documents
    ),
    chunks AS (
        SELECT doc_id,
               md5(array_to_string(
                   list_slice(t, i * {_PARA_W} + 1, i * {_PARA_W} + {_PARA_W}),
                   ' ')) AS chunk_hash
        FROM toks,
             unnest(generate_series(0, CAST(floor(len(t) / {_PARA_W}) AS INT) - 1, 1)) AS u(i)
        WHERE len(t) >= {_PARA_W}
    )
    SELECT chunk_hash, count(*) AS n_occurrences,
           count(DISTINCT doc_id) AS n_docs
    FROM chunks GROUP BY chunk_hash
    HAVING count(*) > 1
    ORDER BY n_occurrences DESC, chunk_hash LIMIT 20
    """,
)
def paragraph_dedup_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top repeated 10-token paragraphs across the corpus — the
    C4/RefinedWeb line-dedup signal. Chunking is a JVM transform over
    the token array (no explode until the chunk level), dedup is one
    md5-keyed aggregation; at scale the HAVING>1 filter is the
    map-side-combinable duplicate screen."""
    docs = _t(spark, sf_dir, "documents")
    toks = docs.select("doc_id", F.split("text", " ").alias("t")).filter(
        F.size("t") >= _PARA_W
    )
    chunks = toks.select(
        "doc_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.floor(F.size("t") / _PARA_W).cast("int") - 1),
                lambda i: F.md5(
                    F.concat_ws(" ", F.slice("t", i * _PARA_W + 1, _PARA_W))
                ),
            )
        ).alias("chunk_hash"),
    )
    return (
        chunks.groupBy("chunk_hash")
        .agg(
            F.count(F.lit(1)).alias("n_occurrences"),
            F.countDistinct("doc_id").alias("n_docs"),
        )
        .filter(F.col("n_occurrences") > 1)
        .orderBy(F.col("n_occurrences").desc(), "chunk_hash")
        .limit(20)
    )


# =====================================================================
# Round-4 additions: time-series gap-fill/LOCF, decile bucketing,
# GROUPING SETS, Markov transitions, rolling active users, cohort
# retention — the product-analytics / hypertable shapes the catalog
# didn't yet cover. All JVM-side; the only joins are a broadcast of a
# 1-row bounds frame and a broadcast of the (tiny) day/type grid.
# =====================================================================


@query(
    "gapfill_locf_hourly",
    """
    WITH hourly AS (
        SELECT event_type, date_trunc('hour', ts) AS bucket,
               round(sum(value), 6) AS hour_value
        FROM events GROUP BY 1, 2
    ),
    bounds AS (
        SELECT min(date_trunc('hour', ts)) AS lo,
               max(date_trunc('hour', ts)) AS hi
        FROM events
    ),
    grid AS (
        SELECT t.event_type, g.bucket
        FROM (SELECT DISTINCT event_type FROM events) t,
             (SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS bucket
              FROM bounds) g
    )
    SELECT grid.event_type, grid.bucket,
           last_value(hourly.hour_value IGNORE NULLS) OVER (
               PARTITION BY grid.event_type ORDER BY grid.bucket
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS filled_value,
           CAST(hourly.hour_value IS NULL AS INT) AS was_gap
    FROM grid LEFT JOIN hourly
      ON grid.event_type = hourly.event_type AND grid.bucket = hourly.bucket
    """,
)
def gapfill_locf_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style gap-fill + last-observation-carried-forward:
    the dense (event_type × hour) grid is synthesized with
    ``F.sequence`` from a 1-row broadcast bounds frame (never a
    driver-side loop), missing hours join as null, and LOCF is a
    running ``last(ignorenulls)`` window. At 100 TB the grid is
    |types|×|hours| — tiny next to raw events — so the single shuffle
    is the hourly pre-aggregation. Reference analog: resample/ffill
    on extraction timelines (SURVEY §2.6 window family)."""
    ev = _t(spark, sf_dir, "events")
    hour = _trunc_ntz("hour", "ts")
    hourly = ev.groupBy(
        "event_type", hour.alias("bucket")
    ).agg(F.round(F.sum("value"), 6).alias("hour_value"))
    bounds = ev.agg(
        F.min(hour).alias("lo"), F.max(hour).alias("hi")
    )
    types = ev.select("event_type").distinct()
    grid = types.join(F.broadcast(bounds)).select(
        "event_type",
        F.explode(
            F.sequence("lo", "hi", F.expr("INTERVAL 1 HOUR"))
        ).alias("bucket"),
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    joined = grid.join(hourly, ["event_type", "bucket"], "left")
    return joined.select(
        "event_type",
        "bucket",
        F.last("hour_value", ignorenulls=True).over(w).alias("filled_value"),
        F.col("hour_value").isNull().cast("int").alias("was_gap"),
    )


@query(
    "ntile_decile_spend",
    """
    WITH spend AS (
        SELECT c_custkey, round(sum(o_totalprice), 2) AS total_spend
        FROM customer JOIN orders ON o_custkey = c_custkey
        GROUP BY c_custkey
    ),
    tiled AS (
        SELECT total_spend,
               ntile(10) OVER (ORDER BY total_spend DESC, c_custkey) AS decile
        FROM spend
    )
    SELECT decile, count(*) AS n_customers,
           round(min(total_spend), 2) AS min_spend,
           round(max(total_spend), 2) AS max_spend,
           round(sum(total_spend), 2) AS decile_spend
    FROM tiled GROUP BY decile ORDER BY decile
    """,
)
def ntile_decile_spend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer-spend decile table (ntile + per-bucket stats) — the
    quantile-bucketing step of feature binning / LTV reporting.
    Tie-break on c_custkey makes bucket assignment deterministic.
    The per-customer frame grows with the corpus, so the decile
    assignment routes through global_row_number + exact_ntile
    (range-partitioned parallel numbering) rather than an ntile
    window's single global sort (VERDICT r7 item 2 family).
    Reference analog: degree-decile reporting (SURVEY §2.5 A14
    family)."""
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    spend = (
        cust.join(orders, F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("c_custkey")
        .agg(F.round(F.sum("o_totalprice"), 2).alias("total_spend"))
    )
    numbered, n_cust = win.global_row_number(
        spend, [F.col("total_spend").desc(), F.col("c_custkey")], out="__rn"
    )
    tiled = numbered.select(
        "total_spend",
        win.exact_ntile(F.col("__rn"), n_cust, 10).alias("decile"),
    )
    return (
        tiled.groupBy("decile")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.round(F.min("total_spend"), 2).alias("min_spend"),
            F.round(F.max("total_spend"), 2).alias("max_spend"),
            F.round(F.sum("total_spend"), 2).alias("decile_spend"),
        )
        .orderBy("decile")
    )


@query(
    "grouping_sets_revenue",
    """
    SELECT l_returnflag, l_linestatus,
           CAST(grouping(l_returnflag) AS INT) AS g_rf,
           CAST(grouping(l_linestatus) AS INT) AS g_ls,
           count(*) AS n_items,
           round(sum(l_extendedprice), 2) AS revenue
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag, l_linestatus),
                            (l_returnflag), (l_linestatus))
    """,
)
def grouping_sets_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (the general form behind the catalog's
    rollup/cube entries) with grouping() disambiguation flags so an
    aggregated-away NULL is distinguishable from a data NULL. One
    Expand + one hash aggregate — no re-scan per set."""
    li = _t(spark, sf_dir, "lineitem")
    li.createOrReplaceTempView("gs_lineitem")
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus,
               CAST(grouping(l_returnflag) AS INT) AS g_rf,
               CAST(grouping(l_linestatus) AS INT) AS g_ls,
               count(*) AS n_items,
               round(sum(l_extendedprice), 2) AS revenue
        FROM gs_lineitem
        GROUP BY GROUPING SETS ((l_returnflag, l_linestatus),
                                (l_returnflag), (l_linestatus))
        """
    )


@query(
    "event_transition_matrix",
    """
    WITH seq AS (
        SELECT user_id, event_type,
               lead(event_type) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
               ) AS next_type
        FROM events
    ),
    trans AS (
        SELECT event_type AS from_type, next_type AS to_type,
               count(*) AS n_transitions
        FROM seq WHERE next_type IS NOT NULL
        GROUP BY 1, 2
    )
    SELECT from_type, to_type, n_transitions,
           round(n_transitions / CAST(sum(n_transitions) OVER (
               PARTITION BY from_type) AS DOUBLE), 6) AS p_transition
    FROM trans
    """,
)
def event_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over per-user event
    sequences (lead window → bigram counts → row-normalized
    probabilities). (ts, event_id) ordering is a deterministic total
    order. The per-user window and the bigram aggregation share the
    user_id shuffle. Reference analog: trajectory/path statistics
    (SURVEY §2.6 W-family over event streams)."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "event_type", F.lead("event_type").over(w).alias("next_type")
    ).filter(F.col("next_type").isNotNull())
    trans = seq.groupBy(
        F.col("event_type").alias("from_type"),
        F.col("next_type").alias("to_type"),
    ).agg(F.count(F.lit(1)).alias("n_transitions"))
    wt = Window.partitionBy("from_type")
    return trans.select(
        "from_type",
        "to_type",
        "n_transitions",
        F.round(
            F.col("n_transitions") / F.sum("n_transitions").over(wt).cast("double"),
            6,
        ).alias("p_transition"),
    )


@query(
    "rolling_7d_active_users",
    """
    WITH daily AS (
        SELECT DISTINCT CAST(ts AS DATE) AS d, user_id FROM events
    ),
    days AS (SELECT DISTINCT d FROM daily)
    SELECT days.d AS activity_date,
           count(DISTINCT daily.user_id) AS wau
    FROM days JOIN daily
      ON daily.d BETWEEN days.d - INTERVAL 6 DAY AND days.d
    GROUP BY days.d
    """,
)
def rolling_7d_active_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling 7-day active users (WAU) per day. COUNT(DISTINCT) can't
    ride a sliding window, so the dense day list (tiny — one row per
    day, broadcast) range-joins the deduped (day, user) pairs and
    re-counts per anchor day. At 100 TB the expensive input is the
    (day, user) dedup — one shuffle on a pre-projected 2-column frame;
    the range join fans each pair out at most 7×."""
    ev = _t(spark, sf_dir, "events")
    daily = ev.select(
        F.to_date("ts").alias("d"), "user_id"
    ).distinct()
    days = daily.select(F.col("d").alias("anchor")).distinct()
    joined = daily.join(
        F.broadcast(days),
        (F.col("d") <= F.col("anchor"))
        & (F.col("d") >= F.date_sub(F.col("anchor"), 6)),
    )
    return joined.groupBy(F.col("anchor").alias("activity_date")).agg(
        F.countDistinct("user_id").alias("wau")
    )


@query(
    "retention_cohorts",
    """
    WITH firsts AS (
        SELECT user_id, min(CAST(ts AS DATE)) AS first_day FROM events
        GROUP BY user_id
    ),
    activity AS (
        SELECT DISTINCT e.user_id, f.first_day,
               CAST(floor(date_diff('day', f.first_day, CAST(e.ts AS DATE)) / 7)
                    AS BIGINT) AS week_offset
        FROM events e JOIN firsts f ON e.user_id = f.user_id
    )
    SELECT CAST(date_trunc('month', first_day) AS DATE) AS cohort_month,
           week_offset,
           count(DISTINCT user_id) AS n_active_users
    FROM activity GROUP BY 1, 2
    """,
)
def retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix: users grouped by first-activity month,
    counted per week-offset since their own first day — the classic
    product-analytics triangle. first_day is a per-user aggregate
    reused via a user_id-keyed join (co-partitioned with the activity
    scan's own user_id shuffle, so AQE plans one exchange each side)."""
    ev = _t(spark, sf_dir, "events")
    evd = ev.select("user_id", F.to_date("ts").alias("d"))
    firsts = evd.groupBy("user_id").agg(F.min("d").alias("first_day"))
    activity = (
        evd.join(firsts, "user_id")
        .select(
            "user_id",
            "first_day",
            F.floor(F.datediff("d", "first_day") / 7)
            .cast("bigint")
            .alias("week_offset"),
        )
        .distinct()
    )
    return activity.groupBy(
        F.trunc("first_day", "month").alias("cohort_month"), "week_offset"
    ).agg(F.countDistinct("user_id").alias("n_active_users"))


from social_link_prediction_spark.graph import propagate as gprop  # noqa: E402


@query(
    "feature_propagation_suppliers",
    """
    WITH e AS MATERIALIZED (
        SELECT DISTINCT -l_partkey - 1 AS src, l_suppkey::BIGINT AS dst
        FROM lineitem
        UNION SELECT DISTINCT l_suppkey::BIGINT, -l_partkey - 1 FROM lineitem
    ),
    deg AS MATERIALIZED (
        SELECT dst AS id, CAST(count(*) AS DOUBLE) AS f FROM e GROUP BY dst
    ),
    l1 AS MATERIALIZED (
        SELECT d.id, 0.5 * d.f + 0.5 * coalesce(m.nf, d.f) AS f
        FROM deg d LEFT JOIN (
            SELECT e.dst AS id, avg(s.f) AS nf
            FROM e JOIN deg s ON s.id = e.src GROUP BY e.dst
        ) m USING (id)
    ),
    l2 AS (
        SELECT d.id, 0.5 * d.f + 0.5 * coalesce(m.nf, d.f) AS f
        FROM l1 d LEFT JOIN (
            SELECT e.dst AS id, avg(s.f) AS nf
            FROM e JOIN l1 s ON s.id = e.src GROUP BY e.dst
        ) m USING (id)
    )
    SELECT 's:' || id AS id, round(f, 6) AS feature
    FROM l2 WHERE id >= 0
    ORDER BY round(f, 6) DESC, id LIMIT 20
    """,
)
def feature_propagation_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-layer GNN-style neighborhood feature propagation
    (GraphSAGE-mean aggregator with identity weights / SGC) on the
    part-supplier graph, seeded with node degree: top 20 suppliers by
    the propagated embedding. One keyed join + one keyed aggregate per
    layer — the whole forward pass is declarative DataFrame algebra,
    no tensor library (the engine-side analog of the reference's GNN
    encoder, core/ai/gnn_architecture.py:13-96)."""
    edges = _partsupp_edges_int(spark, sf_dir)
    deg = edges.groupBy(F.col("dst").alias("id")).agg(
        F.count(F.lit(1)).cast("double").alias("f")
    )
    h = gprop.propagate_features(edges, deg, ["f"], layers=2, alpha=0.5)
    # format BEFORE the top-k so the tie-break is the same STRING order
    # the oracle's `ORDER BY ... id` uses (its `id` binds to the
    # formatted output alias — the betweenness_sample convention)
    return (
        h.filter(F.col("id") >= 0)
        .select(
            _fmt_node(F.col("id")).alias("id"),
            F.round("f", 6).alias("feature"),
        )
        .orderBy(F.col("feature").desc(), "id")
        .limit(20)
    )


def _ivf_probe_cells(query_vec: list[float], n_probe: int = 2) -> list[int]:
    """Driver-side query routing: the n_probe IVF cells whose centroid
    is most cosine-similar to the query (deterministic — centroids and
    query are module constants, so the oracle replays the same route)."""
    import math as _m

    qn = _m.sqrt(sum(x * x for x in query_vec))
    sims = []
    for i, c in enumerate(_IVF_CENTROIDS):
        cn = _m.sqrt(sum(x * x for x in c))
        sims.append((-sum(a * b for a, b in zip(query_vec, c)) / (qn * cn), i))
    sims.sort()
    return sorted(i for _, i in sims[:n_probe])


def _duck_ivf_pq_sql(n_probe: int = 2, shortlist: int = 50, k: int = 10) -> str:
    cents = [
        "[" + ",".join(repr(x) for x in c) + "]::DOUBLE[]" for c in _IVF_CENTROIDS
    ]
    scores = ", ".join(
        f"list_cosine_similarity(v, {c}) AS s{i}" for i, c in enumerate(cents)
    )
    case = (
        "CASE WHEN s3 > greatest(s0, s1, s2) THEN 3 "
        "WHEN s2 > greatest(s0, s1) THEN 2 "
        "WHEN s1 > s0 THEN 1 ELSE 0 END"
    )
    probes = ", ".join(str(p) for p in _ivf_probe_cells(_PQ_QUERY_VEC, n_probe))
    # per-subspace encode over the candidate set — the SAME shared
    # fragments as _duck_pq_sql, restricted to the probed cells
    dcols, cases, _errs = _pq_dist_case_sql()
    adc = _pq_adc_terms_sql(_pq_luts(_PQ_QUERY_VEC))
    qv = "[" + ",".join(repr(float(x)) for x in _PQ_QUERY_VEC) + "]::DOUBLE[]"
    return f"""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    s AS (SELECT vec_id, v, {scores} FROM e),
    cand AS (SELECT vec_id, v FROM s WHERE ({case}) IN ({probes})),
    d AS (SELECT vec_id, v,
           {dcols}
          FROM cand),
    codes AS (SELECT vec_id, v, {', '.join(cases)} FROM d),
    short AS (SELECT vec_id, v, round({adc}, 6) AS approx_sq_dist
              FROM codes
              ORDER BY approx_sq_dist ASC, vec_id ASC LIMIT {shortlist})
    SELECT vec_id AS id,
           round(list_cosine_similarity(v, {qv}), 6) AS cosine
    FROM short ORDER BY cosine DESC, id LIMIT {k}
    """


@query("ivf_pq_rerank_topk", _duck_ivf_pq_sql())
def ivf_pq_rerank_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Production two-stage ANN serving composition: IVF routing (the
    query probes its 2 nearest cells — at scale a partitionBy(ivf_cell)
    layout makes this a directory prune), PQ asymmetric-distance
    shortlist over the candidates (codes-only scan, driver-side M x K
    lookup tables, TakeOrdered heap), exact cosine re-rank of the
    50-vector shortlist against raw embeddings. Every stage bounds the
    next one's input; only the shortlist ever touches raw vectors."""
    emb = _t(spark, sf_dir, "embeddings")
    cells = sim.ivf_assign(emb, _IVF_CENTROIDS)
    probes = _ivf_probe_cells(_PQ_QUERY_VEC, 2)
    cand = cells.filter(F.col("ivf_cell").isin(probes))
    short = sim.pq_adc_topk(cand, _PQ_CODEBOOKS, _PQ_QUERY_VEC, k=50)
    qcol = F.array([F.lit(float(x)) for x in _PQ_QUERY_VEC])
    rer = short.select("id").join(
        emb, F.col("id") == F.col("vec_id")
    ).select(
        "id",
        F.round(
            sim.cosine_similarity(F.col("embedding").cast("array<double>"), qcol), 6
        ).alias("cosine"),
    )
    return rer.orderBy(F.col("cosine").desc(), "id").limit(10)


_CHUNK_SIZE, _CHUNK_STRIDE = 12, 8


@query(
    "doc_sliding_chunks",
    f"""
    WITH toks AS (
        SELECT doc_id, string_split(text, ' ') AS t FROM documents
    ),
    chunks AS (
        SELECT doc_id, i AS chunk_id,
               CAST(i * {_CHUNK_STRIDE} AS BIGINT) AS start_token,
               CAST(least({_CHUNK_SIZE}, len(t) - i * {_CHUNK_STRIDE}) AS BIGINT)
                   AS n_tokens,
               md5(array_to_string(
                   list_slice(t, i * {_CHUNK_STRIDE} + 1,
                              i * {_CHUNK_STRIDE} + {_CHUNK_SIZE}), ' '))
                   AS chunk_hash
        FROM toks,
             unnest(generate_series(
                 0,
                 CAST(ceil(len(t) / {_CHUNK_STRIDE}) AS INT), 1)) AS u(i)
        WHERE i * {_CHUNK_STRIDE} < len(t)
    )
    SELECT doc_id, chunk_id, start_token, n_tokens, chunk_hash FROM chunks
    """,
)
def doc_sliding_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RAG-standard sliding-window chunking: fixed-size token windows
    with overlap (size 12, stride 8 — each chunk shares 4 tokens with
    its predecessor so no answer span is split across a boundary).
    Chunking stays an array transform until the per-chunk explode —
    the JVM-side twin of pack_documents' concat-and-chunk (packing
    fills fixed budgets; sliding windows preserve locality for
    retrieval)."""
    docs = _t(spark, sf_dir, "documents")
    toks = docs.select("doc_id", F.split("text", " ").alias("t"))
    n = F.size("t")
    n_windows = F.ceil(n / F.lit(_CHUNK_STRIDE)).cast("int")
    return toks.select(
        "doc_id",
        F.explode(F.sequence(F.lit(0), n_windows)).alias("chunk_id"),
        "t",
    ).filter(
        F.col("chunk_id") * _CHUNK_STRIDE < F.size("t")
    ).select(
        "doc_id",
        "chunk_id",
        (F.col("chunk_id") * _CHUNK_STRIDE).cast("bigint").alias("start_token"),
        F.least(
            F.lit(_CHUNK_SIZE),
            F.size("t") - F.col("chunk_id") * _CHUNK_STRIDE,
        ).cast("bigint").alias("n_tokens"),
        F.md5(
            F.concat_ws(
                " ",
                F.slice("t", F.col("chunk_id") * _CHUNK_STRIDE + 1, F.lit(_CHUNK_SIZE)),
            )
        ).alias("chunk_hash"),
    )


from social_link_prediction_spark.operators import merge as mrg  # noqa: E402


@query(
    "snapshot_diff_orders",
    """
    WITH newsnap AS (
        SELECT o_orderkey,
               CASE WHEN o_orderkey % 97 = 0
                    THEN round(o_totalprice * 1.1, 2)
                    ELSE o_totalprice END AS o_totalprice,
               o_orderstatus
        FROM orders WHERE o_orderkey % 101 <> 0
        UNION ALL
        SELECT o_orderkey + 100000000, o_totalprice, o_orderstatus
        FROM orders WHERE o_orderkey % 103 = 0
    ),
    o AS (SELECT o_orderkey, o_totalprice, o_orderstatus FROM orders),
    d AS (
        SELECT coalesce(o.o_orderkey, n.o_orderkey) AS k,
               CASE WHEN o.o_orderkey IS NULL THEN 'added'
                    WHEN n.o_orderkey IS NULL THEN 'removed'
                    WHEN o.o_totalprice <> n.o_totalprice
                         OR o.o_orderstatus <> n.o_orderstatus THEN 'changed'
                    ELSE 'unchanged' END AS change_type
        FROM o FULL OUTER JOIN newsnap n ON o.o_orderkey = n.o_orderkey
    )
    SELECT change_type, count(*) AS n_keys FROM d GROUP BY change_type
    """,
)
def snapshot_diff_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC snapshot audit over a deterministic simulated re-extraction
    of orders (every 101st key removed, every 97th repriced +10%,
    every 103rd re-added under a shifted key): per-change-type key
    counts via operators/merge.snapshot_diff (full-outer join on
    map-side row hashes)."""
    o = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice", "o_orderstatus"
    )
    kept = o.filter(F.col("o_orderkey") % 101 != 0).withColumn(
        "o_totalprice",
        F.when(
            F.col("o_orderkey") % 97 == 0, F.round(F.col("o_totalprice") * 1.1, 2)
        ).otherwise(F.col("o_totalprice")),
    )
    added = o.filter(F.col("o_orderkey") % 103 == 0).withColumn(
        "o_orderkey", F.col("o_orderkey") + 100000000
    )
    new = kept.unionByName(added)
    d = mrg.snapshot_diff(o, new, "o_orderkey")
    return d.groupBy("change_type").agg(F.count(F.lit(1)).alias("n_keys"))


@query(
    "order_interarrival_stats",
    """
    WITH seq AS (
        SELECT o_custkey,
               date_diff('day',
                         lag(o_orderdate) OVER (
                             PARTITION BY o_custkey
                             ORDER BY o_orderdate, o_orderkey),
                         o_orderdate) AS gap_days
        FROM orders
    ),
    gaps AS (SELECT o_custkey, gap_days FROM seq WHERE gap_days IS NOT NULL),
    cust AS (
        SELECT o_custkey, CAST(count(*) AS BIGINT) AS n_gaps,
               round(avg(gap_days), 6) AS mean_gap_days
        FROM gaps GROUP BY o_custkey
    )
    SELECT c_mktsegment,
           CAST(count(*) AS BIGINT) AS n_customers,
           round(avg(mean_gap_days), 6) AS avg_mean_gap_days,
           CAST(min(n_gaps) AS BIGINT) AS min_gaps,
           CAST(max(n_gaps) AS BIGINT) AS max_gaps
    FROM cust JOIN customer ON c_custkey = o_custkey
    GROUP BY c_mktsegment ORDER BY c_mktsegment
    """,
)
def order_interarrival_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-purchase-time analysis: per-customer gaps between
    consecutive orders (lag window on a deterministic (date, key)
    total order), rolled up to per-segment averages. The per-customer
    window and the per-customer aggregate share one o_custkey shuffle;
    the segment dimension joins broadcast."""
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    seq = orders.select(
        "o_custkey",
        F.datediff("o_orderdate", F.lag("o_orderdate").over(w)).alias("gap_days"),
    ).filter(F.col("gap_days").isNotNull())
    per_cust = seq.groupBy("o_custkey").agg(
        F.count(F.lit(1)).alias("n_gaps"),
        F.round(F.avg("gap_days"), 6).alias("mean_gap_days"),
    )
    return (
        per_cust.join(
            F.broadcast(cust.select("c_custkey", "c_mktsegment")),
            F.col("c_custkey") == F.col("o_custkey"),
        )
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.round(F.avg("mean_gap_days"), 6).alias("avg_mean_gap_days"),
            F.min("n_gaps").alias("min_gaps"),
            F.max("n_gaps").alias("max_gaps"),
        )
        .orderBy("c_mktsegment")
    )


from social_link_prediction_spark.graph import truss as gtruss  # noqa: E402

_KT_EDGE_SQL = _DUCK_H60.format(
    args="CAST(src AS VARCHAR) || '-' || CAST(dst AS VARCHAR), 'kt'"
)


def _duck_ktruss_sql(rounds: int = 3) -> str:
    """Unrolled triangle-support peeling (k=3: keep edges in >= 1
    triangle), same chained-CTE technique as the k-core oracle. The
    engine peels to the fixed point under the same round cap;
    convergence by round 2 verified at every sf tier."""
    parts = [
        f"""WITH s AS (SELECT s_suppkey::BIGINT AS id FROM supplier),
    e0 AS MATERIALIZED (
        SELECT a.id AS src, b.id AS dst FROM s a JOIN s b ON a.id < b.id
        WHERE {_KT_EDGE_SQL} % 10000 < 400
    )"""
    ]
    for r in range(1, rounds + 1):
        p = r - 1
        parts.append(f"""t{r} AS MATERIALIZED (
        SELECT ab.src AS a, ab.dst AS b, ac.dst AS c
        FROM e{p} ab JOIN e{p} ac ON ac.src = ab.src AND ab.dst < ac.dst
        JOIN e{p} bc ON bc.src = ab.dst AND bc.dst = ac.dst
    )""")
        parts.append(f"""s{r} AS MATERIALIZED (
        SELECT src, dst, count(*) AS sup FROM (
            SELECT a AS src, b AS dst FROM t{r}
            UNION ALL SELECT a, c FROM t{r}
            UNION ALL SELECT b, c FROM t{r}
        ) GROUP BY 1, 2
    )""")
        parts.append(f"""e{r} AS MATERIALIZED (
        SELECT e{p}.src, e{p}.dst FROM e{p} JOIN s{r} USING (src, dst)
        WHERE sup >= 1
    )""")
    n = rounds
    parts.append(f"""tf AS MATERIALIZED (
        SELECT ab.src AS a, ab.dst AS b, ac.dst AS c
        FROM e{n} ab JOIN e{n} ac ON ac.src = ab.src AND ab.dst < ac.dst
        JOIN e{n} bc ON bc.src = ab.dst AND bc.dst = ac.dst
    )""")
    parts.append(f"""sf_ AS (
        SELECT src, dst, count(*) AS sup FROM (
            SELECT a AS src, b AS dst FROM tf
            UNION ALL SELECT a, c FROM tf
            UNION ALL SELECT b, c FROM tf
        ) GROUP BY 1, 2
    )""")
    body = ",\n    ".join(parts)
    return f"""{body}
    SELECT coalesce(sf_.sup, 0) AS support,
           CAST(count(*) AS BIGINT) AS n_edges
    FROM e{n} LEFT JOIN sf_ USING (src, dst)
    GROUP BY 1 ORDER BY 1
    """


@query("ktruss_suppliers", _duck_ktruss_sql())
def ktruss_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-truss of a deterministic hash-sampled supplier graph (4% of
    ordered pairs via the h60 seed hash — the fixtures' natural graphs
    are bipartite or near-complete, so the Erdős–Rényi-style sample is
    the replayable sparse graph with genuine triangle structure):
    triangle-support peeling to the fixed point under a 3-round cap,
    reported as the within-truss support histogram. Edge-level peeling
    (graph/truss.py) complements vertex-level k-core; convergence by
    round 2 was verified at every sf tier."""
    sup = _t(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").cast("long").alias("id")
    )
    pairs = tg.sampled_edges(sup, 400, "kt")
    tr = gtruss.ktruss(pairs, k=3, max_rounds=3)
    return (
        tr.groupBy("support")
        .agg(F.count(F.lit(1)).alias("n_edges"))
        .orderBy("support")
    )


@query(
    "source_quality_breakdown",
    f"""
    WITH t AS (SELECT doc_id, source, text, {_DUCK_TOKS} AS toks FROM documents),
    st AS (
        SELECT doc_id, source, text, len(toks) AS n_tokens,
               round(len(list_distinct(toks)) / len(toks), 6) AS distinct_ratio,
               round(list_sum(list_transform(toks, x -> length(x))) / len(toks), 6) AS mean_token_len,
               round(len(list_filter(toks, x -> regexp_matches(x, '^[^A-Za-z0-9]+$'))) / len(toks), 6) AS punct_ratio
        FROM t
    ),
    v AS (
        SELECT doc_id, source, text,
               CAST(NOT (n_tokens < 10 OR n_tokens > 100000
                         OR distinct_ratio < 0.1 OR punct_ratio > 0.3
                         OR mean_token_len < 2.0 OR mean_token_len > 12.0)
                    AS INT) AS keep
        FROM st
    ),
    d AS (
        SELECT source, count(*) AS n_docs,
               CAST(sum(keep) AS BIGINT) AS n_kept,
               count(*) - count(DISTINCT md5(text)) AS n_exact_dups
        FROM v GROUP BY source
    )
    SELECT source, n_docs, n_kept,
           round(n_kept / CAST(n_docs AS DOUBLE), 6) AS keep_rate,
           n_exact_dups
    FROM d ORDER BY source
    """,
)
def source_quality_breakdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source corpus triage — the report that decides which crawl
    feeds to keep, re-weight, or drop: document counts, quality-gate
    keep rate (same pinned rule set as quality_filter_summary), and
    within-source exact-duplicate mass. One scan + one groupBy; the
    dup count is docs minus distinct text hashes, no self-join."""
    docs = _t(spark, sf_dir, "documents")
    out = ptx.quality_filter(docs)
    d = out.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.col("keep").cast("long")).alias("n_kept"),
        (F.count(F.lit(1)) - F.countDistinct(F.md5("text"))).alias("n_exact_dups"),
    )
    return d.select(
        "source",
        "n_docs",
        "n_kept",
        F.round(F.col("n_kept") / F.col("n_docs").cast("double"), 6).alias(
            "keep_rate"
        ),
        "n_exact_dups",
    ).orderBy("source")


@query(
    "dense_rank_ties_parts",
    """
    WITH r AS (
        SELECT p_brand, p_partkey, p_retailprice,
               dense_rank() OVER (
                   PARTITION BY p_brand ORDER BY p_retailprice DESC
               ) AS price_rank
        FROM part
    )
    SELECT p_brand, price_rank,
           CAST(count(*) AS BIGINT) AS n_parts,
           round(min(p_retailprice), 2) AS price
    FROM r WHERE price_rank <= 2
    GROUP BY p_brand, price_rank
    """,
)
def dense_rank_ties_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ties-preserving per-group top-k: the two highest price POINTS
    per brand with every part at those prices counted — dense_rank
    keeps ties and does not skip ranks, unlike the catalog's
    row_number top-k entries (top3_orders_per_customer) which pick
    exactly k rows. The rank window and the rollup share the p_brand
    shuffle."""
    part = _t(spark, sf_dir, "part")
    w = Window.partitionBy("p_brand").orderBy(F.col("p_retailprice").desc())
    r = part.select(
        "p_brand", "p_retailprice", F.dense_rank().over(w).alias("price_rank")
    ).filter(F.col("price_rank") <= 2)
    return r.groupBy("p_brand", "price_rank").agg(
        F.count(F.lit(1)).alias("n_parts"),
        F.round(F.min("p_retailprice"), 2).alias("price"),
    )


@query(
    "robust_outlier_days",
    """
    WITH daily AS (
        SELECT event_type, CAST(ts AS DATE) AS d,
               CAST(count(*) AS BIGINT) AS n_events
        FROM events GROUP BY 1, 2
    ),
    med AS (
        SELECT event_type,
               quantile_cont(n_events, 0.5) AS med_n
        FROM daily GROUP BY event_type
    ),
    dev AS (
        SELECT daily.event_type, d, n_events, med_n,
               abs(n_events - med_n) AS absdev
        FROM daily JOIN med USING (event_type)
    ),
    mad AS (
        SELECT event_type, quantile_cont(absdev, 0.5) AS mad_n
        FROM dev GROUP BY event_type
    )
    SELECT dev.event_type, d AS activity_date, n_events,
           round(med_n, 6) AS median_daily,
           round(mad_n, 6) AS mad_daily,
           CAST(abs(n_events - med_n) > 3 * mad_n AS INT) AS is_outlier
    FROM dev JOIN mad USING (event_type)
    """,
)
def robust_outlier_days(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust (median/MAD) daily-volume outlier flags per event type —
    the heavy-tail-safe twin of event_rate_anomalies' mean/stddev
    z-scores: one bad day cannot drag the baseline the way it drags a
    mean. Exact percentile for oracle parity (percentile_approx is
    the 100 TB path); the per-type median/MAD frames are tiny and
    broadcast back onto the daily counts."""
    ev = _t(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.to_date("ts").alias("activity_date")
    ).agg(F.count(F.lit(1)).alias("n_events"))
    med = daily.groupBy("event_type").agg(
        F.expr("percentile(n_events, 0.5)").alias("med_n")
    )
    dev = daily.join(F.broadcast(med), "event_type").withColumn(
        "absdev", F.abs(F.col("n_events") - F.col("med_n"))
    )
    mad = dev.groupBy("event_type").agg(
        F.expr("percentile(absdev, 0.5)").alias("mad_n")
    )
    return dev.join(F.broadcast(mad), "event_type").select(
        "event_type",
        "activity_date",
        "n_events",
        F.round("med_n", 6).alias("median_daily"),
        F.round("mad_n", 6).alias("mad_daily"),
        (F.abs(F.col("n_events") - F.col("med_n")) > 3 * F.col("mad_n"))
        .cast("int")
        .alias("is_outlier"),
    )


# =====================================================================
# KMV distinct sketch — the set-operation member of the mergeable-
# sketch family (HLL unions, histogram quantiles, CMS frequencies,
# KMV adds INTERSECTION estimates, which HLL cannot give losslessly).
# =====================================================================
_KMV_K = 64
_KMV_H = _DUCK_H60.format(args="CAST(user_id AS VARCHAR), 'kmv'")


@query(
    "kmv_user_overlap",
    f"""
    WITH ev AS (
        SELECT event_type, user_id FROM events
        WHERE event_type IN ('view', 'purchase')
    ),
    dh AS (SELECT DISTINCT event_type, {_KMV_H} AS h FROM ev),
    sk AS (
        SELECT event_type, h FROM (
            SELECT event_type, h,
                   row_number() OVER (PARTITION BY event_type ORDER BY h) AS rn
            FROM dh
        ) WHERE rn <= {_KMV_K}
    ),
    un AS (
        SELECT h FROM (
            SELECT h, row_number() OVER (ORDER BY h) AS rn
            FROM (SELECT DISTINCT h FROM dh)
        ) WHERE rn <= {_KMV_K}
    ),
    et AS (
        SELECT event_type, count(*) AS n, max(h) AS m
        FROM sk GROUP BY event_type
    ),
    eu AS (SELECT count(*) AS n, max(h) AS m FROM un),
    ji AS (
        SELECT CAST(count(*) AS BIGINT) AS j FROM un
        WHERE h IN (SELECT h FROM sk WHERE event_type = 'view')
          AND h IN (SELECT h FROM sk WHERE event_type = 'purchase')
    ),
    est AS (
        SELECT
            (SELECT round(CASE WHEN n < {_KMV_K} THEN CAST(n AS DOUBLE)
                          ELSE {float((_KMV_K - 1) * (1 << 60))!r} / m END, 4)
             FROM et WHERE event_type = 'view') AS est_view,
            (SELECT round(CASE WHEN n < {_KMV_K} THEN CAST(n AS DOUBLE)
                          ELSE {float((_KMV_K - 1) * (1 << 60))!r} / m END, 4)
             FROM et WHERE event_type = 'purchase') AS est_purchase,
            (SELECT round(CASE WHEN n < {_KMV_K} THEN CAST(n AS DOUBLE)
                          ELSE {float((_KMV_K - 1) * (1 << 60))!r} / m END, 4)
             FROM eu) AS est_union,
            (SELECT n FROM eu) AS union_n,
            (SELECT j FROM ji) AS j
    ),
    ex AS (
        SELECT
            CAST(count(DISTINCT CASE WHEN event_type = 'view'
                                     THEN user_id END) AS BIGINT) AS exact_view,
            CAST(count(DISTINCT CASE WHEN event_type = 'purchase'
                                     THEN user_id END) AS BIGINT) AS exact_purchase,
            CAST(count(DISTINCT user_id) AS BIGINT) AS exact_union
        FROM ev
    ),
    exi AS (
        SELECT CAST(count(*) AS BIGINT) AS exact_intersect FROM (
            SELECT DISTINCT user_id FROM ev WHERE event_type = 'view'
            INTERSECT
            SELECT DISTINCT user_id FROM ev WHERE event_type = 'purchase'
        )
    )
    SELECT {_KMV_K} AS k, est_view, est_purchase, est_union,
           round(CAST(j AS DOUBLE) / union_n * est_union, 4) AS est_intersect,
           exact_view, exact_purchase, exact_union, exact_intersect
    FROM est, ex, exi
    """,
)
def kmv_user_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audience-overlap estimation from KMV sketches: per-event-type
    k-minimum-values sketches of the user set, union-merged, with the
    view ∩ purchase intersection estimated as (|K ∩ S_v ∩ S_p| / |K|)
    × est(union) — the Beyer et al. 2007 Jaccard route that HLL cannot
    take (its union is lossless but intersection via inclusion-
    exclusion compounds error). Exact distinct counts ride along as
    the accuracy audit. At 100 TB the sketches are built per
    partition/day and merged upward (64 longs of state per set);
    only this audit query touches exact distincts. Hashes are the
    oracle-replayable h60 family, so every estimate is deterministic
    across engines."""
    from social_link_prediction_spark.operators import aggregates as agg

    k = _KMV_K
    ev = _t(spark, sf_dir, "events").filter(
        F.col("event_type").isin("view", "purchase")
    )
    sk = agg.kmv_sketch(ev, "user_id", k=k, group_cols=["event_type"])
    sk.persist()
    un = agg.kmv_union(sk, k=k)
    un.persist()
    est_t = agg.kmv_estimate(sk, k, ["event_type"])
    est_u = agg.kmv_estimate(un, k)
    # intersection: union-sketch hashes present in BOTH per-type
    # sketches (membership via sketches is exact — see kmv_sketch doc)
    j = (
        un.join(sk.filter(F.col("event_type") == "view").select("h"), "h", "semi")
        .join(sk.filter(F.col("event_type") == "purchase").select("h"), "h", "semi")
        .agg(F.count(F.lit(1)).alias("j"))
    )
    exact = ev.agg(
        F.countDistinct(
            F.when(F.col("event_type") == "view", F.col("user_id"))
        ).alias("exact_view"),
        F.countDistinct(
            F.when(F.col("event_type") == "purchase", F.col("user_id"))
        ).alias("exact_purchase"),
        F.countDistinct("user_id").alias("exact_union"),
    )
    exact_i = (
        ev.filter(F.col("event_type") == "view")
        .select("user_id")
        .join(
            ev.filter(F.col("event_type") == "purchase").select("user_id"),
            "user_id",
            "semi",
        )
        .agg(F.countDistinct("user_id").alias("exact_intersect"))
    )
    ev_ = est_t.filter(F.col("event_type") == "view").select(
        F.col("kmv_est").alias("est_view")
    )
    ep_ = est_t.filter(F.col("event_type") == "purchase").select(
        F.col("kmv_est").alias("est_purchase")
    )
    eu_ = est_u.select(
        F.col("kmv_n").alias("union_n"), F.col("kmv_est").alias("est_union")
    )
    # all six frames are 1-row: broadcast-anchor crossJoins, no shuffle
    return (
        ev_.crossJoin(ep_)
        .crossJoin(eu_)
        .crossJoin(j)
        .crossJoin(exact)
        .crossJoin(exact_i)
        .select(
            F.lit(k).alias("k"),
            "est_view",
            "est_purchase",
            "est_union",
            F.round(
                F.col("j").cast("double") / F.col("union_n") * F.col("est_union"),
                4,
            ).alias("est_intersect"),
            "exact_view",
            "exact_purchase",
            "exact_union",
            "exact_intersect",
        )
    )


# =====================================================================
# Strongly connected components (FW-BW coloring) over a deterministic
# hash-sampled DIRECTED supplier graph — the directed twin of
# connected_components_cnr; same replayable-sample device as ktruss.
# =====================================================================
_SCC_EDGE_SQL = _DUCK_H60.format(
    args="CAST(a.id AS VARCHAR) || '-' || CAST(b.id AS VARCHAR), 'scc'"
)


def _duck_scc_sql(rounds: int = 12, peels: int = 2) -> str:
    """FW-BW coloring unrolled CTE-by-CTE: per peel, ``rounds`` color-
    propagation rounds (max over ancestors flows along edges), the
    class-restricted edge set, ``rounds`` backward-reach rounds to the
    class root, then the peel of resolved nodes. Mirrors the engine's
    convergence guard (scc.py): a peel's resolutions only count when
    BOTH phases reached a fixed point within the budget — checked here
    by comparing the last two unrolled rounds (both phases are
    monotone, so last-two-equal ⇔ converged; the engine's early break
    at the first no-change round leaves identical frames). An invalid
    peel resolves nothing and passes its full active set forward."""
    ctes = [
        f"""s AS (SELECT s_suppkey::BIGINT AS id FROM supplier),
    e1 AS MATERIALIZED (
        SELECT a.id AS u, b.id AS v FROM s a JOIN s b ON a.id <> b.id
        WHERE {_SCC_EDGE_SQL} % 10000 < 250),
    n1 AS MATERIALIZED (
        SELECT DISTINCT id FROM (SELECT u AS id FROM e1 UNION ALL SELECT v FROM e1))"""
    ]
    finals = []
    for p in range(1, peels + 1):
        ctes.append(f"c{p}_0 AS (SELECT id, id AS c FROM n{p})")
        for i in range(1, rounds + 1):
            ctes.append(
                f"""c{p}_{i} AS MATERIALIZED (
                SELECT n.id, greatest(n.c, coalesce(m.cin, n.c)) AS c
                FROM c{p}_{i - 1} n LEFT JOIN (
                    SELECT e.v AS id, max(c.c) AS cin
                    FROM e{p} e JOIN c{p}_{i - 1} c ON c.id = e.u GROUP BY e.v
                ) m USING (id))"""
            )
        ctes.append(
            f"""ce{p} AS MATERIALIZED (
            SELECT e.u, e.v FROM e{p} e
            JOIN c{p}_{rounds} cu ON cu.id = e.u
            JOIN c{p}_{rounds} cv ON cv.id = e.v
            WHERE cu.c = cv.c)"""
        )
        ctes.append(
            f"r{p}_0 AS (SELECT id, c, CAST(id = c AS INT) AS r FROM c{p}_{rounds})"
        )
        for i in range(1, rounds + 1):
            ctes.append(
                f"""r{p}_{i} AS MATERIALIZED (
                SELECT r.id, r.c, greatest(r.r, coalesce(m.rin, 0)) AS r
                FROM r{p}_{i - 1} r LEFT JOIN (
                    SELECT e.u AS id, 1 AS rin FROM ce{p} e
                    JOIN r{p}_{i - 1} rr ON rr.id = e.v
                    WHERE rr.r = 1 GROUP BY e.u
                ) m USING (id))"""
            )
        ctes.append(
            f"""ok{p} AS MATERIALIZED (
            SELECT (SELECT count(*) FROM c{p}_{rounds} a
                    JOIN c{p}_{rounds - 1} b USING (id) WHERE a.c <> b.c) = 0
               AND (SELECT count(*) FROM r{p}_{rounds} a
                    JOIN r{p}_{rounds - 1} b USING (id) WHERE a.r <> b.r) = 0 AS v)"""
        )
        finals.append(
            f"SELECT id, c AS scc FROM r{p}_{rounds} "
            f"WHERE r = 1 AND (SELECT v FROM ok{p})"
        )
        if p < peels:
            ctes.append(
                f"""n{p + 1} AS MATERIALIZED (
                SELECT id FROM r{p}_{rounds}
                WHERE r = 0 OR NOT (SELECT v FROM ok{p}))"""
            )
            ctes.append(
                f"""e{p + 1} AS MATERIALIZED (
                SELECT e.u, e.v FROM e{p} e
                JOIN n{p + 1} a ON a.id = e.u
                JOIN n{p + 1} b ON b.id = e.v)"""
            )
        else:
            finals.append(
                f"""SELECT id, CAST(NULL AS BIGINT) AS scc FROM r{p}_{rounds}
                WHERE r = 0 OR NOT (SELECT v FROM ok{p})"""
            )
    body = ",\n    ".join(ctes)
    allrows = " UNION ALL ".join(finals)
    return f"""WITH {body}
    SELECT scc AS scc_root, CAST(count(*) AS BIGINT) AS n_members
    FROM ({allrows}) GROUP BY scc ORDER BY n_members DESC, scc_root
    """


@query("scc_suppliers", _duck_scc_sql())
def scc_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Strongly connected components of a 2.5%-sampled directed
    supplier graph (h60 seed hash — replayable, same device as
    ktruss): FW-BW coloring with a bounded (rounds=12, peels=2) budget
    and a fixed-point guard — a peel only resolves nodes when both
    phases converged within the budget (partial propagation would
    label components wrongly), reported as per-component member
    counts; nodes the budget could not settle come back under
    scc_root NULL (the honest budget-exhaustion contract).
    Tarjan/Kosaraju are sequential DFS and do not distribute —
    coloring is the shared-nothing SCC algorithm, and each peel round
    is one keyed join + one max-aggregate (the engine early-exits
    converged rounds, so the budget costs nothing once settled)."""
    from social_link_prediction_spark.graph import scc as gscc

    sup = _t(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").cast("long").alias("id")
    )
    pairs = tg.sampled_edges(sup, 250, "scc", directed=True)
    comp = gscc.strongly_connected_components(pairs, rounds=12, peels=2)
    return (
        comp.groupBy(F.col("scc").alias("scc_root"))
        .agg(F.count(F.lit(1)).alias("n_members"))
        .orderBy(F.col("n_members").desc(), "scc_root")
    )


# =====================================================================
# Warehouse data-quality audits: column profiling, functional-
# dependency discovery, Benford first-digit screening.
# =====================================================================
def _duck_profile_col(col: str, rep: str) -> str:
    return f"""
        SELECT (SELECT CAST(count(*) AS BIGINT) FROM orders) AS n_rows,
               '{col}' AS "column",
               count(*) FILTER (WHERE {col} IS NULL) AS n_nulls,
               CAST(count(DISTINCT {col}) AS BIGINT) AS n_distinct,
               min({rep}) AS min_repr, max({rep}) AS max_repr,
               round(avg(length({rep})), 6) AS avg_repr_len
        FROM orders"""


@query(
    "column_profile_orders",
    " UNION ALL ".join(
        _duck_profile_col(c, r)
        for c, r in [
            ("o_orderkey", "CAST(o_orderkey AS VARCHAR)"),
            ("o_custkey", "CAST(o_custkey AS VARCHAR)"),
            ("o_orderstatus", "o_orderstatus"),
            ("o_totalprice", "printf('%.2f', o_totalprice)"),
            ("o_orderdate", "strftime(o_orderdate, '%Y-%m-%d %H:%M:%S')"),
            ("o_orderpriority", "o_orderpriority"),
        ]
    )
    + " ORDER BY \"column\"",
)
def column_profile_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column-level profile of orders — null mass, cardinality, value
    range, repr width — the scan every physical-layout decision
    (bucket keys, z-order keys, dictionary candidates) starts from.
    One table scan; doubles and timestamps get pinned formats
    (printf %.2f / yyyy-MM-dd HH:mm:ss) because float-to-string is
    the one repr engines render differently."""
    from social_link_prediction_spark import warehouse

    o = _t(spark, sf_dir, "orders")
    return warehouse.column_profile(
        o,
        {
            "o_orderkey": F.col("o_orderkey").cast("string"),
            "o_custkey": F.col("o_custkey").cast("string"),
            "o_orderstatus": F.col("o_orderstatus"),
            "o_totalprice": F.format_string("%.2f", "o_totalprice"),
            "o_orderdate": F.date_format("o_orderdate", "yyyy-MM-dd HH:mm:ss"),
            "o_orderpriority": F.col("o_orderpriority"),
        },
    ).orderBy("column")


_FD_CANDIDATES = [
    ("p_partkey -> p_name", "p_partkey", "p_name"),
    ("p_brand -> p_size", "p_brand", "p_size"),
    ("p_name -> p_brand", "p_name", "p_brand"),
    ("p_type -> p_retailprice", "p_type", "p_retailprice"),
]


@query(
    "fd_discovery_part",
    " UNION ALL ".join(
        f"""
        SELECT '{name}' AS fd,
               CAST(count(*) AS BIGINT) AS n_keys,
               count(*) FILTER (WHERE nd > 1) AS n_violating_keys,
               CAST(max(nd) AS BIGINT) AS max_dependents,
               CAST(max(nd) = 1 AS INT) AS holds
        FROM (SELECT {det}, count(DISTINCT {dep}) AS nd
              FROM part GROUP BY {det})"""
        for name, det, dep in _FD_CANDIDATES
    )
    + " ORDER BY fd",
)
def fd_discovery_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Functional-dependency discovery audit (the TANE/warehouse-
    curation signal that complements fk_discovery_containment's
    cross-table containment): for each candidate A → B, count
    determinant keys whose dependent set exceeds one. Key FDs
    (p_partkey → p_name) hold; content FDs over the synthetic corpus
    (p_brand → p_size) violate and report their violation mass. One
    groupBy per candidate — each is a single map-side-combinable
    aggregation, unioned driver-side (4 one-row frames)."""
    part = _t(spark, sf_dir, "part")
    outs = []
    for name, det, dep in _FD_CANDIDATES:
        g = part.groupBy(det).agg(F.countDistinct(dep).alias("nd"))
        outs.append(
            g.agg(
                F.lit(name).alias("fd"),
                F.count(F.lit(1)).alias("n_keys"),
                F.count(F.when(F.col("nd") > 1, 1)).alias("n_violating_keys"),
                F.max("nd").alias("max_dependents"),
                (F.max("nd") == 1).cast("int").alias("holds"),
            )
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionAll(o)
    return out.orderBy("fd")


@query(
    "benford_totalprice",
    """
    WITH d AS (
        SELECT CAST(substr(CAST(o_totalprice AS VARCHAR), 1, 1) AS INT) AS digit
        FROM orders WHERE o_totalprice >= 1
    ),
    c AS (SELECT digit, CAST(count(*) AS BIGINT) AS n FROM d GROUP BY digit),
    t AS (SELECT CAST(sum(n) AS BIGINT) AS total FROM c)
    SELECT digit, n,
           round(CAST(n AS DOUBLE) / total, 6) AS observed_share,
           round(log10(1 + 1.0 / digit), 6) AS benford_share,
           round(abs(CAST(n AS DOUBLE) / total - log10(1 + 1.0 / digit)), 6)
               AS abs_deviation
    FROM c, t ORDER BY digit
    """,
)
def benford_totalprice(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford first-significant-digit screening of order totals —
    the fraud/synthetic-data smell test: observed digit shares vs the
    Benford expectation log10(1 + 1/d). (TPC-H-ish uniform pricing
    deviates, and the report quantifies exactly how much.) First
    digit via the string head (totalprice >= 1 guaranteed, so no
    leading '0.'), dodging the floor(log10(x)) float-boundary trap at
    exact powers of ten. One aggregation + a 1-row broadcast total."""
    o = _t(spark, sf_dir, "orders").filter(F.col("o_totalprice") >= 1)
    d = o.select(
        F.substring(F.col("o_totalprice").cast("string"), 1, 1)
        .cast("int")
        .alias("digit")
    )
    c = d.groupBy("digit").agg(F.count(F.lit(1)).alias("n"))
    t = c.agg(F.sum("n").alias("total"))
    share = F.col("n").cast("double") / F.col("total")
    benford = F.log10(1 + 1.0 / F.col("digit"))
    return (
        c.join(F.broadcast(t))
        .select(
            "digit",
            "n",
            F.round(share, 6).alias("observed_share"),
            F.round(benford, 6).alias("benford_share"),
            F.round(F.abs(share - benford), 6).alias("abs_deviation"),
        )
        .orderBy("digit")
    )


@query(
    "bigram_logprob_docs",
    f"""
    WITH t AS MATERIALIZED (
        SELECT doc_id, {_DUCK_TOKS} AS toks FROM documents
    ),
    tok AS MATERIALIZED (SELECT doc_id, unnest(toks) AS w FROM t),
    bg AS MATERIALIZED (
        SELECT doc_id, unnest(toks[1:len(toks)-1]) AS v,
               unnest(toks[2:len(toks)]) AS w
        FROM t WHERE len(toks) >= 2
    ),
    uni AS MATERIALIZED (SELECT w, count(*) AS cw FROM tok GROUP BY w),
    tot AS (SELECT CAST(sum(cw) AS BIGINT) AS n FROM uni),
    bi AS MATERIALIZED (SELECT v, w, count(*) AS cvw FROM bg GROUP BY v, w),
    cv AS (SELECT v, CAST(sum(cvw) AS BIGINT) AS cv FROM bi GROUP BY v)
    SELECT bg.doc_id,
           CAST(count(*) AS BIGINT) AS n_bigrams,
           round(sum(ln(0.7 * bi.cvw / cv.cv
                        + 0.3 * uni.cw / (SELECT n FROM tot))) / count(*), 6)
               AS mean_logprob
    FROM bg JOIN bi USING (v, w) JOIN cv USING (v) JOIN uni USING (w)
    GROUP BY bg.doc_id ORDER BY bg.doc_id
    """,
)
def bigram_logprob_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interpolated bigram LM quality signal — the KenLM-lite upgrade
    of unigram_logprob_docs: mean log(0.7·P(w|v) + 0.3·P(w)) over a
    document's bigrams, probabilities from the corpus's own counts.
    Repetitive or template-y docs score high, shuffled-word salads
    score low even when their unigram mix looks fine — exactly the
    signal the unigram model cannot see. Both LM tables are
    vocabulary-sized (|V| and observed |V|² bigrams), broadcast back
    onto the exploded bigram stream; the per-doc rollup shares one
    doc_id shuffle. P(w|v) context counts come from the bigram
    table's own marginal (sum over w), so probabilities sum to 1 per
    context by construction."""
    docs = _t(spark, sf_dir, "documents")
    toks = ptx.tokens("text")
    t = docs.select("doc_id", toks.alias("toks")).filter(F.size("toks") >= 2)
    bg = t.select(
        "doc_id",
        F.explode(
            F.arrays_zip(
                F.slice("toks", 1, F.size("toks") - 1),
                F.slice("toks", 2, F.size("toks") - 1),
            )
        ).alias("p"),
    ).select("doc_id", F.col("p.0").alias("v"), F.col("p.1").alias("w"))
    tok = docs.select("doc_id", F.explode(toks).alias("w"))
    uni = tok.groupBy("w").agg(F.count(F.lit(1)).alias("cw"))
    tot = uni.agg(F.sum("cw").alias("n"))
    bi = bg.groupBy("v", "w").agg(F.count(F.lit(1)).alias("cvw"))
    cv = bi.groupBy("v").agg(F.sum("cvw").alias("cv"))
    prob = (
        0.7 * F.col("cvw") / F.col("cv")
        + 0.3 * F.col("cw") / F.col("n")
    )
    return (
        bg.join(F.broadcast(bi), ["v", "w"])
        .join(F.broadcast(cv), "v")
        .join(F.broadcast(uni), "w")
        .crossJoin(F.broadcast(tot))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.round(F.sum(F.log(prob)) / F.count(F.lit(1)), 6).alias(
                "mean_logprob"
            ),
        )
        .orderBy("doc_id")
    )


def _duck_modularity_sql(rounds: int = _LPA_ROUNDS) -> str:
    """LPA label evolution (same unrolled CTEs as _duck_lpa_sql) +
    Newman modularity accounting over the final labels."""
    ctes = [
        """e AS MATERIALIZED (
        SELECT u, v FROM (
            SELECT DISTINCT -l_partkey - 1 AS u, l_suppkey::BIGINT AS v FROM lineitem
            UNION SELECT DISTINCT l_suppkey::BIGINT, -l_partkey - 1 FROM lineitem
        ) WHERE u <> v)""",
        "l0 AS MATERIALIZED (SELECT DISTINCT u AS id, u AS label FROM e)",
    ]
    for i in range(1, rounds + 1):
        p = i - 1
        ctes.append(
            f"""c{i} AS MATERIALIZED (
                SELECT e.u AS id, l.label, count(*) AS c
                FROM e JOIN l{p} l ON l.id = e.v
                GROUP BY e.u, l.label),
            l{i} AS MATERIALIZED (
                SELECT id, label FROM (
                    SELECT id, label,
                           row_number() OVER (PARTITION BY id
                                              ORDER BY c DESC, label ASC) AS rn
                    FROM c{i}
                ) WHERE rn = 1)"""
        )
    L = f"l{rounds}"
    ctes.append(f"""mm AS (SELECT CAST(count(*) AS DOUBLE) / 2 AS m FROM e),
    dc AS (SELECT l.label, CAST(count(*) AS BIGINT) AS degree_sum
           FROM e JOIN {L} l ON l.id = e.u GROUP BY l.label),
    ec AS (SELECT lu.label, CAST(count(*) / 2 AS BIGINT) AS internal_edges
           FROM e JOIN {L} lu ON lu.id = e.u JOIN {L} lv ON lv.id = e.v
           WHERE lu.label = lv.label GROUP BY lu.label),
    sz AS (SELECT label, CAST(count(*) AS BIGINT) AS n_members
           FROM {L} GROUP BY label)""")
    return (
        "WITH " + ",\n".join(ctes) + """
    SELECT CASE WHEN label < 0 THEN 'p:' || CAST(-label - 1 AS VARCHAR)
                ELSE 's:' || CAST(label AS VARCHAR) END AS community,
           n_members, coalesce(internal_edges, 0) AS internal_edges,
           degree_sum,
           round(coalesce(internal_edges, 0) / m
                 - power(degree_sum / (2 * m), 2), 6) AS contribution
    FROM sz JOIN dc USING (label) LEFT JOIN ec USING (label), mm
    ORDER BY n_members DESC, community LIMIT 20
    """
    )


@query("modularity_lpa", _duck_modularity_sql())
def modularity_lpa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Newman modularity accounting of the LPA communities
    (lpa_communities' labels): per community, internal-edge mass vs
    the degree-sum null model — contribution = e_c/m − (d_c/2m)².
    The quality score that says whether a partition is real structure
    or noise (near-zero on this bipartite-ish graph — which is itself
    the diagnostic: LPA on part↔supplier structure finds star
    clumps, not dense modules). Label frames are |V|-sized; every
    join is keyed on node id; m and the null model come from 1-row
    broadcast anchors."""
    edges = _partsupp_edges_int(spark, sf_dir)
    labels = gcom.label_propagation(edges, rounds=_LPA_ROUNDS).persist()
    e = (
        edges.select(F.col("src").alias("u"), F.col("dst").alias("v"))
        .filter(F.col("u") != F.col("v"))
        .dropDuplicates()
    )
    m = e.agg((F.count(F.lit(1)).cast("double") / 2).alias("m"))
    lu = labels.select(F.col("id").alias("u"), F.col("label"))
    lv = labels.select(F.col("id").alias("v"), F.col("label").alias("label_v"))
    dc = e.join(lu, "u").groupBy("label").agg(
        F.count(F.lit(1)).alias("degree_sum")
    )
    ec = (
        e.join(lu, "u")
        .join(lv, "v")
        .filter(F.col("label") == F.col("label_v"))
        .groupBy("label")
        .agg((F.count(F.lit(1)) / 2).cast("long").alias("internal_edges"))
    )
    sz = labels.groupBy("label").agg(F.count(F.lit(1)).alias("n_members"))
    return (
        sz.join(dc, "label")
        .join(ec, "label", "left")
        .crossJoin(F.broadcast(m))
        .select(
            _fmt_node(F.col("label")).alias("community"),
            "n_members",
            F.coalesce("internal_edges", F.lit(0)).alias("internal_edges"),
            "degree_sum",
            F.round(
                F.coalesce("internal_edges", F.lit(0)) / F.col("m")
                - F.pow(F.col("degree_sum") / (2 * F.col("m")), 2),
                6,
            ).alias("contribution"),
        )
        .orderBy(F.col("n_members").desc(), "community")
        .limit(20)
    )


_PPJ_T = 0.7


@query(
    "ppjoin_neardup_docs",
    f"""
    WITH {_DUCK_SHINGLE1},
    sizes AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS sz FROM toks GROUP BY doc_id),
    i AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                 CAST(count(*) AS BIGINT) AS inter
          FROM toks a JOIN toks b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
          GROUP BY 1, 2)
    SELECT id_a, id_b, inter, sa.sz + sb.sz - inter AS union_sz,
           round(CAST(inter AS DOUBLE) / (sa.sz + sb.sz - inter), 6) AS jaccard
    FROM i JOIN sizes sa ON sa.doc_id = id_a JOIN sizes sb ON sb.doc_id = id_b
    WHERE round(CAST(inter AS DOUBLE) / (sa.sz + sb.sz - inter), 6) >= {_PPJ_T}
    ORDER BY id_a, id_b
    """,
)
def ppjoin_neardup_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Prefix-filtered set-similarity self-join (PPJoin/Vernica-style):
    every document pair with trigram-shingle Jaccard >= 0.7, found by
    indexing only each set's df-ascending PREFIX (|x| − ceil(t|x|) + 1
    rarest shingles) instead of every shingle. The oracle computes the
    exact ALL-PAIRS answer over the full inverted index — so a green
    row is a machine-checked proof that the prefix filter lost no true
    pair. Complements MinHash-LSH (probabilistic recall, fixed
    signature cost) with the exact-recall branch of the same
    candidate-pruning trade-off."""
    docs = _t(spark, sf_dir, "documents")
    return pdd.ppjoin_pairs(
        docs, threshold=_PPJ_T, ngram=_MINHASH_N
    ).orderBy("id_a", "id_b")


@query(
    "quality_dedup_survivors",
    f"""
    WITH RECURSIVE {_DUCK_SHINGLE1},
    sizes AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS sz FROM toks GROUP BY doc_id),
    i AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                 CAST(count(*) AS BIGINT) AS inter
          FROM toks a JOIN toks b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
          GROUP BY 1, 2),
    pr AS (
        SELECT id_a, id_b
        FROM i JOIN sizes sa ON sa.doc_id = id_a JOIN sizes sb ON sb.doc_id = id_b
        WHERE round(CAST(inter AS DOUBLE) / (sa.sz + sb.sz - inter), 6) >= {_PPJ_T}
    ),
    e AS (SELECT id_a AS src, id_b AS dst FROM pr
          UNION SELECT id_b, id_a FROM pr),
    -- closure only over nodes that appear in a pair (the duplicate
    -- families), NOT all docs: the pair-reach recursion is quadratic
    -- in family size, so seeding it corpus-wide is the blowup the
    -- r4 sf0.1 check caught. Singletons rejoin afterwards.
    reach(a, b) AS (
        SELECT DISTINCT src, src FROM e
        UNION
        SELECT r.a, e.dst FROM reach r JOIN e ON e.src = r.b
    ),
    cl0 AS (SELECT a AS id, min(b) AS cluster FROM reach GROUP BY a),
    sc AS (
        SELECT doc_id AS id,
               CAST(len(list_distinct({_DUCK_TOKS})) AS BIGINT) AS score
        FROM documents
    ),
    cl AS (
        SELECT sc.id, coalesce(cl0.cluster, sc.id) AS cluster, sc.score
        FROM sc LEFT JOIN cl0 ON cl0.id = sc.id
    )
    SELECT id, cluster, score,
           CAST(row_number() OVER (PARTITION BY cluster
                                   ORDER BY score DESC, id) = 1
                AS INT) AS is_survivor
    FROM cl
    """,
)
def quality_dedup_survivors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-aware dedup: prefix-filtered trigram-Jaccard near-dup
    pairs (ppjoin_neardup_docs' exact pair set) collapsed into
    clusters, where the survivor is the RICHEST member (distinct-token
    count, id tie-break) instead of the min-id one — keep the best
    copy of a duplicated page, not the first one crawled. Complements
    winnow_dedup_clusters (same component machinery, different
    detector and keep rule)."""
    docs = _t(spark, sf_dir, "documents")
    pairs = pdd.ppjoin_pairs(docs, threshold=_PPJ_T, ngram=_MINHASH_N)
    score = F.size(F.array_distinct(ptx.tokens("text"))).cast("long")
    return pdd.quality_survivors(docs, pairs, score)


# =====================================================================
# Luby maximal independent set over the sampled supplier graph — the
# distributed symmetry-breaking primitive (coloring seeds, parallel
# scheduling, correlation-clustering pivots).
# =====================================================================
_MIS_EDGE_SQL = _DUCK_H60.format(
    args="CAST(a.id AS VARCHAR) || '-' || CAST(b.id AS VARCHAR), 'mis'"
)


def _duck_mis_sql(rounds: int = 3) -> str:
    """Luby rounds unrolled: per round, hash priorities, active-
    neighborhood max, strict-max winners, neighbor eviction."""
    ctes = [
        f"""s AS (SELECT s_suppkey::BIGINT AS id FROM supplier),
    e0 AS MATERIALIZED (
        SELECT a.id AS u, b.id AS v FROM s a JOIN s b ON a.id < b.id
        WHERE {_MIS_EDGE_SQL} % 10000 < 400),
    ue AS MATERIALIZED (
        SELECT u, v FROM e0 UNION ALL SELECT v, u FROM e0),
    a0 AS MATERIALIZED (SELECT DISTINCT u AS id FROM ue)"""
    ]
    finals = []
    for r in range(rounds):
        h = _DUCK_H60.format(args=f"CAST(id AS VARCHAR), 'mis{r}'")
        ctes.append(f"p{r} AS MATERIALIZED (SELECT id, {h} AS p FROM a{r})")
        ctes.append(
            f"""ae{r} AS MATERIALIZED (
            SELECT ue.u, ue.v FROM ue
            JOIN a{r} au ON au.id = ue.u JOIN a{r} av ON av.id = ue.v)"""
        )
        ctes.append(
            f"""nb{r} AS MATERIALIZED (
            SELECT e.u AS id, max(p.p) AS pmax
            FROM ae{r} e JOIN p{r} p ON p.id = e.v GROUP BY e.u)"""
        )
        ctes.append(
            f"""w{r} AS MATERIALIZED (
            SELECT p{r}.id FROM p{r} LEFT JOIN nb{r} USING (id)
            WHERE pmax IS NULL OR p > pmax)"""
        )
        ctes.append(
            f"""x{r} AS MATERIALIZED (
            SELECT DISTINCT e.v AS id FROM ae{r} e
            JOIN w{r} w ON w.id = e.u
            WHERE e.v NOT IN (SELECT id FROM w{r}))"""
        )
        ctes.append(
            f"""a{r + 1} AS MATERIALIZED (
            SELECT id FROM a{r}
            WHERE id NOT IN (SELECT id FROM w{r})
              AND id NOT IN (SELECT id FROM x{r}))"""
        )
        finals.append(f"SELECT id, 'mis' AS status FROM w{r}")
        finals.append(f"SELECT id, 'excluded' AS status FROM x{r}")
    finals.append(f"SELECT id, 'unresolved' AS status FROM a{rounds}")
    body = ",\n    ".join(ctes)
    return f"""WITH {body}
    SELECT id, status FROM ({" UNION ALL ".join(finals)}) ORDER BY id
    """


@query("mis_suppliers", _duck_mis_sql())
def mis_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Luby MIS over the 4%-sampled undirected supplier graph
    (replayable h60 sample + h60 per-round priorities): per node,
    'mis' / 'excluded' / 'unresolved' under a 3-round budget. Strict-
    max winners make hash ties a no-win round on both engines, so the
    evolution replays exactly; leftover actives surface honestly."""
    from social_link_prediction_spark.graph import mis as gmis

    sup = _t(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").cast("long").alias("id")
    )
    pairs = tg.sampled_edges(sup, 400, "mis")
    return gmis.maximal_independent_set(pairs, rounds=3).orderBy("id")


@query(
    "node2vec_visits",
    f"""
    SELECT CASE WHEN node < 0 THEN 'p:' || (-node - 1) ELSE 's:' || node END AS id,
           count(*) AS visits,
           count(DISTINCT walk_id) AS n_walks
    FROM ({gwalks.duck_node2vec_sql(_DUCK_PS_EDGES_INT, _DUCK_WALK_SEEDS, 4, 2, 2.0, 0.5)}) corpus
    GROUP BY 1 ORDER BY id
    """,
)
def node2vec_visits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """node2vec corpus prep (Grover & Leskovec 2016): 2 deterministic
    4-step SECOND-ORDER walks per supplier over the part-supplier
    graph with (p=2, q=0.5) — return-averse, DFS-leaning — reported
    as per-node visit counts. The bias weights are integer candidate
    replicas under the portable mid-square hash, so the oracle
    replays every biased choice exactly; the DeepWalk twin
    (randomwalk_visits) is the unbiased first-order baseline."""
    edges = _partsupp_edges_int(spark, sf_dir)
    seeds = (
        edges.select(F.col("src").alias("id"))
        .filter(F.col("id") >= 0)
        .dropDuplicates()
    )
    corpus = gwalks.node2vec_walks(
        edges, seeds, length=4, walks_per_seed=2, p=2.0, q=0.5
    )
    return (
        corpus.groupBy("node")
        .agg(
            F.count(F.lit(1)).alias("visits"),
            F.countDistinct("walk_id").alias("n_walks"),
        )
        .select(_fmt_node(F.col("node")).alias("id"), "visits", "n_walks")
        .orderBy("id")
    )


@query(
    "readability_docs",
    f"""
    WITH t AS (
        SELECT doc_id, lower(text) AS lt, {_DUCK_TOKS} AS toks FROM documents
    ),
    m AS (
        SELECT doc_id,
               CAST(len(toks) AS BIGINT) AS n_words,
               CAST(len(regexp_extract_all(lt, '[aeiouy]+')) AS BIGINT)
                   AS n_syllables,
               CAST(greatest(len(regexp_extract_all(lt, '[.!?]+')), 1) AS BIGINT)
                   AS n_sentences
        FROM t WHERE len(toks) > 0
    )
    SELECT doc_id, n_words, n_syllables, n_sentences,
           round(206.835
                 - 1.015 * (CAST(n_words AS DOUBLE) / n_sentences)
                 - 84.6 * (CAST(n_syllables AS DOUBLE) / n_words), 4)
               AS flesch
    FROM m ORDER BY doc_id
    """,
)
def readability_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flesch reading-ease per document — the classic readability
    screen in a corpus-quality stack (junk and keyword-stuffed pages
    land far outside the human band). Syllables approximated as vowel
    runs ([aeiouy]+ — a group never spans a space, so one regexp count
    over the whole lowercased text equals the per-word sum); sentence
    count floors at 1 (the synthetic corpus has no terminal
    punctuation, which the formula then treats as one long sentence —
    deterministic either way). Pure projection, no shuffle."""
    docs = _t(spark, sf_dir, "documents")
    lt = F.lower(F.col("text"))
    m = docs.select(
        "doc_id",
        F.size(ptx.tokens("text")).cast("long").alias("n_words"),
        F.regexp_count(lt, F.lit(r"[aeiouy]+")).cast("long").alias("n_syllables"),
        F.greatest(
            F.regexp_count(lt, F.lit(r"[.!?]+")), F.lit(1)
        ).cast("long").alias("n_sentences"),
    ).filter(F.col("n_words") > 0)
    return m.select(
        "doc_id",
        "n_words",
        "n_syllables",
        "n_sentences",
        F.round(
            F.lit(206.835)
            - 1.015 * (F.col("n_words").cast("double") / F.col("n_sentences"))
            - 84.6 * (F.col("n_syllables").cast("double") / F.col("n_words")),
            4,
        ).alias("flesch"),
    ).orderBy("doc_id")


_BM25_TERMS = ["spark", "join", "fast"]
_BM25_K1, _BM25_B = 1.2, 0.75


@query(
    "bm25_search_docs",
    f"""
    WITH tok AS MATERIALIZED (
        SELECT doc_id, unnest({_DUCK_TOKS}) AS t FROM documents
    ),
    dl AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS dl FROM tok GROUP BY doc_id),
    avgdl AS (SELECT avg(dl) AS avgdl FROM dl),
    n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM documents),
    tf AS (
        SELECT doc_id, t, CAST(count(*) AS BIGINT) AS tf FROM tok
        WHERE t IN ({", ".join(f"'{w}'" for w in _BM25_TERMS)})
        GROUP BY doc_id, t
    ),
    df AS (SELECT t, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY t),
    scored AS (
        SELECT tf.doc_id,
               sum(ln((n.n - df.df + 0.5) / (df.df + 0.5) + 1)
                   * tf.tf * ({_BM25_K1} + 1)
                   / (tf.tf + {_BM25_K1} * (1 - {_BM25_B}
                      + {_BM25_B} * dl.dl / avgdl.avgdl))) AS s
        FROM tf JOIN df USING (t) JOIN dl USING (doc_id), avgdl, n
        GROUP BY tf.doc_id
    )
    SELECT doc_id, round(s, 6) AS bm25 FROM scored
    ORDER BY round(s, 6) DESC, doc_id LIMIT 10
    """,
)
def bm25_search_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 ranked retrieval (Robertson-Spärck Jones idf, k1=1.2,
    b=0.75) for the fixed query {{spark, join, fast}}: top-10
    documents. The keyword twin of doc_retrieval_topk's embedding
    route. The postings list is filtered to query terms AT THE SCAN
    (tf table is |terms|×|matching docs|, never the full inverted
    index); df/avgdl/N are 1-row or vocabulary-sized broadcast
    anchors; ranking is a TakeOrdered heap on the rounded score."""
    docs = _t(spark, sf_dir, "documents")
    tok = docs.select("doc_id", F.explode(ptx.tokens("text")).alias("t"))
    dl = tok.groupBy("doc_id").agg(F.count(F.lit(1)).alias("dl"))
    avgdl = dl.agg(F.avg("dl").alias("avgdl"))
    n = docs.agg(F.count(F.lit(1)).alias("n"))
    tf = (
        tok.filter(F.col("t").isin(_BM25_TERMS))
        .groupBy("doc_id", "t")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    df_ = tf.groupBy("t").agg(F.count(F.lit(1)).alias("df"))
    idf = F.log((F.col("n") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1)
    denom = F.col("tf") + _BM25_K1 * (
        1 - _BM25_B + _BM25_B * F.col("dl") / F.col("avgdl")
    )
    return (
        tf.join(F.broadcast(df_), "t")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(avgdl))
        .crossJoin(F.broadcast(n))
        .groupBy("doc_id")
        .agg(F.round(F.sum(idf * F.col("tf") * (_BM25_K1 + 1) / denom), 6).alias("bm25"))
        .orderBy(F.col("bm25").desc(), "doc_id")
        .limit(10)
    )


@query(
    "butterfly_census",
    """
    WITH ps AS (SELECT DISTINCT l_partkey AS p, l_suppkey AS s FROM lineitem),
    pr AS (
        SELECT a.s AS sa, b.s AS sb, CAST(count(*) AS BIGINT) AS w
        FROM ps a JOIN ps b ON a.p = b.p AND a.s < b.s
        GROUP BY a.s, b.s
    )
    SELECT CAST(count(*) AS BIGINT) AS n_supplier_pairs,
           CAST(sum(w * (w - 1) / 2) AS BIGINT) AS n_butterflies,
           CAST(sum(w) AS BIGINT) AS n_wedges,
           round(4.0 * sum(w * (w - 1) / 2)
                 / nullif(sum(w * (w - 1) / 2) + sum(w), 0), 6)
               AS butterfly_density
    FROM pr
    """,
)
def butterfly_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Butterfly (2×2-biclique) census of the part-supplier bipartite
    graph — the bipartite analogue of triangle counting (Wang et al.,
    butterfly counting; the clustering signal triangle_census cannot
    give on a bipartite graph, which has none). Per supplier pair
    with w co-supplied parts, C(w,2) butterflies; wedges = Σw. One
    projection join + one global aggregate; the pair blowup bound is
    the same Σ C(deg(part),2) wedge control as the projection query."""
    li = _t(spark, sf_dir, "lineitem")
    ps = li.select(
        F.col("l_partkey").alias("p"), F.col("l_suppkey").alias("s")
    ).dropDuplicates()
    a, b = ps.alias("a"), ps.alias("b")
    pr = (
        a.join(b, (F.col("a.p") == F.col("b.p")) & (F.col("a.s") < F.col("b.s")))
        .groupBy(F.col("a.s").alias("sa"), F.col("b.s").alias("sb"))
        .agg(F.count(F.lit(1)).alias("w"))
    )
    bf = F.col("w") * (F.col("w") - 1) / 2
    return pr.agg(
        F.count(F.lit(1)).alias("n_supplier_pairs"),
        F.sum(bf).cast("long").alias("n_butterflies"),
        F.sum("w").cast("long").alias("n_wedges"),
        F.round(
            4.0 * F.sum(bf)
            / F.nullif(F.sum(bf) + F.sum("w"), F.lit(0)),
            6,
        ).alias("butterfly_density"),
    )


# =====================================================================
# Greedy max-coverage corpus selection (submodular greedy, k rounds).
# =====================================================================
_COV_K = 5


def _duck_coverage_sql(k: int = _COV_K) -> str:
    """Greedy rounds unrolled: per round, marginal gains over the
    uncovered shingles, (gain DESC, doc_id) argmax, covered-set
    growth."""
    ctes = [_DUCK_SHINGLE1.strip()]
    finals = []
    for r in range(1, k + 1):
        prev_picks = " UNION ALL ".join(
            f"SELECT doc_id FROM p{i}" for i in range(1, r)
        )
        where = "WHERE 1 = 1"
        if r > 1:
            where += f" AND shingle NOT IN (SELECT shingle FROM c{r - 1})"
        if prev_picks:
            where += f" AND doc_id NOT IN ({prev_picks})"
        ctes.append(
            f"""g{r} AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS gain
            FROM toks {where} GROUP BY doc_id)"""
        )
        ctes.append(
            f"""p{r} AS MATERIALIZED (
            SELECT doc_id, gain FROM g{r} ORDER BY gain DESC, doc_id LIMIT 1)"""
        )
        all_picks = " UNION ALL ".join(
            f"SELECT doc_id FROM p{i}" for i in range(1, r + 1)
        )
        ctes.append(
            f"""c{r} AS MATERIALIZED (
            SELECT DISTINCT shingle FROM toks
            WHERE doc_id IN ({all_picks}))"""
        )
        finals.append(
            f"SELECT {r} AS round, doc_id, gain,"
            f" (SELECT CAST(count(*) AS BIGINT) FROM c{r}) AS covered_total"
            f" FROM p{r}"
        )
    return (
        "WITH " + ",\n    ".join(ctes)
        + "\nSELECT * FROM (" + " UNION ALL ".join(finals) + ") ORDER BY round"
    )


@query("greedy_coverage_docs", _duck_coverage_sql())
def greedy_coverage_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Coverage-based corpus selection: 5 greedy rounds picking the
    document with the largest marginal trigram-shingle coverage (the
    (1−1/e) submodular greedy — facility-location-style data pruning,
    the keep-the-prototypes complement of dedup's drop-the-redundant).
    Output = the pick sequence with marginal gains and cumulative
    coverage. Each round: anti-join vs covered shingles, per-doc
    count, TakeOrdered(1) — driver traffic is one winner row per
    round."""
    docs = _t(spark, sf_dir, "documents")
    return tp.greedy_max_coverage(
        docs, k=_COV_K, id_col="doc_id", col="text", ngram=_MINHASH_N
    )


def _duck_coloring_sql(colors: int = 3, rounds: int = 3) -> str:
    """luby_coloring unrolled: per color class, the full MIS round
    chain (same CTE pattern as _duck_mis_sql) over the residual
    graph, then colored-node removal and isolated-node promotion."""
    ctes = [
        f"""s AS (SELECT s_suppkey::BIGINT AS id FROM supplier),
    rp0 AS MATERIALIZED (
        SELECT a.id AS u, b.id AS v FROM s a JOIN s b ON a.id < b.id
        WHERE {_MIS_EDGE_SQL} % 10000 < 400),
    allnodes AS MATERIALIZED (
        SELECT DISTINCT u AS id FROM (SELECT u FROM rp0 UNION ALL SELECT v FROM rp0))"""
    ]
    cls_names, iso_names = [], []
    for c in range(colors):
        ctes.append(
            f"""ue{c} AS MATERIALIZED (
            SELECT u, v FROM rp{c} UNION ALL SELECT v, u FROM rp{c})"""
        )
        ctes.append(
            f"a{c}_0 AS MATERIALIZED (SELECT DISTINCT u AS id FROM ue{c})"
        )
        wnames = []
        for r in range(rounds):
            h = _DUCK_H60.format(args=f"CAST(id AS VARCHAR), 'mis{r}'")
            ctes.append(
                f"p{c}_{r} AS MATERIALIZED (SELECT id, {h} AS p FROM a{c}_{r})"
            )
            ctes.append(
                f"""ae{c}_{r} AS MATERIALIZED (
                SELECT ue{c}.u, ue{c}.v FROM ue{c}
                JOIN a{c}_{r} au ON au.id = ue{c}.u
                JOIN a{c}_{r} av ON av.id = ue{c}.v)"""
            )
            ctes.append(
                f"""nb{c}_{r} AS MATERIALIZED (
                SELECT e.u AS id, max(p.p) AS pmax
                FROM ae{c}_{r} e JOIN p{c}_{r} p ON p.id = e.v GROUP BY e.u)"""
            )
            ctes.append(
                f"""w{c}_{r} AS MATERIALIZED (
                SELECT p{c}_{r}.id FROM p{c}_{r} LEFT JOIN nb{c}_{r} USING (id)
                WHERE pmax IS NULL OR p > pmax)"""
            )
            ctes.append(
                f"""x{c}_{r} AS MATERIALIZED (
                SELECT DISTINCT e.v AS id FROM ae{c}_{r} e
                JOIN w{c}_{r} w ON w.id = e.u
                WHERE e.v NOT IN (SELECT id FROM w{c}_{r}))"""
            )
            ctes.append(
                f"""a{c}_{r + 1} AS MATERIALIZED (
                SELECT id FROM a{c}_{r}
                WHERE id NOT IN (SELECT id FROM w{c}_{r})
                  AND id NOT IN (SELECT id FROM x{c}_{r}))"""
            )
            wnames.append(f"w{c}_{r}")
        ctes.append(
            f"""cls{c} AS MATERIALIZED (
            SELECT id, {c} AS color FROM (
                {" UNION ALL ".join(f"SELECT id FROM {w}" for w in wnames)}))"""
        )
        cls_names.append(f"cls{c}")
        done = " UNION ALL ".join(
            [f"SELECT id FROM {n} " for n in cls_names + iso_names]
        )
        ctes.append(
            f"""rp{c + 1} AS MATERIALIZED (
            SELECT u, v FROM rp{c}
            WHERE u NOT IN ({done}) AND v NOT IN ({done}))"""
        )
        if c + 1 < colors:
            # isolated promotion stays inside the palette: the final
            # iteration would need color `colors`, so it is skipped and
            # those nodes fall into the NULL leftover (mirrors mis.py).
            ctes.append(
                f"""iso{c} AS MATERIALIZED (
                SELECT id, {c + 1} AS color FROM allnodes
                WHERE id NOT IN ({done})
                  AND id NOT IN (SELECT u FROM rp{c + 1}
                                 UNION ALL SELECT v FROM rp{c + 1}))"""
            )
            iso_names.append(f"iso{c}")
    done = " UNION ALL ".join(
        f"SELECT id FROM {n} " for n in cls_names + iso_names
    )
    colored = " UNION ALL ".join(
        f"SELECT id, color FROM {n}" for n in cls_names + iso_names
    )
    body = ",\n    ".join(ctes)
    return f"""WITH {body}
    SELECT id, color FROM (
        {colored}
        UNION ALL
        SELECT id, CAST(NULL AS INT) AS color FROM allnodes
        WHERE id NOT IN ({done})
    ) ORDER BY id
    """


@query("coloring_suppliers", _duck_coloring_sql())
def coloring_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed greedy graph coloring (iterated Luby MIS, the
    Jones-Plassmann route) over the same 4%-sampled supplier graph as
    mis_suppliers: 3 color classes + isolated-node promotion, nodes
    beyond the budget honestly NULL. A color class = a conflict-free
    batch — the scheduling primitive for parallel graph mutation."""
    from social_link_prediction_spark.graph import mis as gmis

    sup = _t(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").cast("long").alias("id")
    )
    pairs = tg.sampled_edges(sup, 400, "mis")
    return gmis.luby_coloring(pairs, colors=3, rounds_per_color=3).orderBy("id")


# =====================================================================
# Semi-supervised label spreading + corpus drift audits (KL, PSI).
# =====================================================================
_LS_ROUNDS = 3


def _duck_labelspread_sql(rounds: int = _LS_ROUNDS) -> str:
    """Harmonic label spreading unrolled: per round, neighbor mean
    then seed clamp, over the int-encoded part-supplier graph."""
    ctes = [
        _DUCK_PS_EDGES_INT,
        """sd AS (
        SELECT s_suppkey::BIGINT AS id,
               CASE WHEN s_nationkey < 5 THEN 1.0
                    WHEN s_nationkey >= 20 THEN 0.0 END AS seed
        FROM supplier)""",
        """st0 AS MATERIALIZED (
        SELECT n.id, coalesce(sd.seed, 0.5) AS score,
               CAST(sd.seed IS NOT NULL AS INT) AS is_seed, sd.seed
        FROM (SELECT DISTINCT src AS id FROM e) n
        LEFT JOIN sd ON sd.id = n.id)""",
    ]
    for r in range(1, rounds + 1):
        p = r - 1
        ctes.append(
            f"""nb{r} AS MATERIALIZED (
            SELECT e.src AS id, avg(s.score) AS mean_nbr
            FROM e JOIN st{p} s ON s.id = e.dst GROUP BY e.src)"""
        )
        ctes.append(
            f"""st{r} AS MATERIALIZED (
            SELECT st{p}.id,
                   CASE WHEN st{p}.is_seed = 1 THEN st{p}.seed
                        ELSE coalesce(nb{r}.mean_nbr, st{p}.score) END AS score,
                   st{p}.is_seed, st{p}.seed
            FROM st{p} LEFT JOIN nb{r} USING (id))"""
        )
    return (
        "WITH " + ",\n    ".join(ctes) + f"""
    SELECT 'p:' || CAST(-id - 1 AS VARCHAR) AS part,
           round(score, 6) AS score
    FROM st{rounds} WHERE id < 0
    ORDER BY round(score, 6) DESC, part LIMIT 20
    """
    )


@query("label_spreading_parts", _duck_labelspread_sql())
def label_spreading_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-supervised harmonic label spreading (Zhu et al. 2003):
    suppliers in nations 0-4 are positive seeds (score 1), nations
    20+ negative (0), every other node diffuses the neighbor mean —
    parts ranked by their diffused affinity to the positive supplier
    group. The soft-score transductive cousin of lpa_communities'
    hard argmax; weak-supervision node scoring over the same graph
    loop discipline as pagerank."""
    from social_link_prediction_spark.graph import propagate as gprop

    edges = _partsupp_edges_int(spark, sf_dir)
    sup = _t(spark, sf_dir, "supplier")
    seeds = sup.select(
        F.col("s_suppkey").cast("long").alias("id"),
        F.when(F.col("s_nationkey") < 5, 1.0)
        .when(F.col("s_nationkey") >= 20, 0.0)
        .alias("label"),
    ).filter(F.col("label").isNotNull())
    out = gprop.label_spreading(edges, seeds, rounds=_LS_ROUNDS)
    return (
        out.filter(F.col("id") < 0)
        .select(
            _fmt_node(F.col("id")).alias("part"),
            F.round("score", 6).alias("score"),
        )
        .orderBy(F.col("score").desc(), "part")
        .limit(20)
    )


@query(
    "token_drift_by_source",
    f"""
    WITH tok AS MATERIALIZED (
        SELECT source, unnest({_DUCK_TOKS}) AS t FROM documents
    ),
    st AS (SELECT source, t, CAST(count(*) AS BIGINT) AS n
           FROM tok GROUP BY source, t),
    stot AS (SELECT source, CAST(sum(n) AS BIGINT) AS ns FROM st GROUP BY source),
    ct AS (SELECT t, CAST(count(*) AS BIGINT) AS nc FROM tok GROUP BY t),
    ctot AS (SELECT CAST(count(*) AS BIGINT) AS nt FROM tok)
    SELECT st.source, max(stot.ns) AS n_tokens,
           round(sum((CAST(st.n AS DOUBLE) / stot.ns)
                     * ln((CAST(st.n AS DOUBLE) / stot.ns)
                          / (CAST(ct.nc AS DOUBLE) / ctot.nt))), 6) AS kl_vs_corpus
    FROM st JOIN stot USING (source) JOIN ct USING (t), ctot
    GROUP BY st.source ORDER BY st.source
    """,
)
def token_drift_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution-drift audit for the training mixture: per-source
    KL divergence of the token distribution against the whole-corpus
    distribution — the signal that says WHICH crawl feed is shifting
    the mixture (complements source_quality_breakdown's keep rates).
    No smoothing needed: every source token is in the corpus by
    construction, so the ratio is always finite. Two vocabulary-sized
    aggregates + one broadcast-joined rollup per source."""
    docs = _t(spark, sf_dir, "documents")
    tok = docs.select("source", F.explode(ptx.tokens("text")).alias("t"))
    st = tok.groupBy("source", "t").agg(F.count(F.lit(1)).alias("n"))
    stot = st.groupBy("source").agg(F.sum("n").alias("ns"))
    ct = tok.groupBy("t").agg(F.count(F.lit(1)).alias("nc"))
    ctot = tok.agg(F.count(F.lit(1)).alias("nt"))
    p = F.col("n").cast("double") / F.col("ns")
    q = F.col("nc").cast("double") / F.col("nt")
    return (
        st.join(F.broadcast(stot), "source")
        .join(F.broadcast(ct), "t")
        .crossJoin(F.broadcast(ctot))
        .groupBy("source")
        .agg(
            F.max("ns").alias("n_tokens"),
            F.round(F.sum(p * F.log(p / q)), 6).alias("kl_vs_corpus"),
        )
        .orderBy("source")
    )


_PSI_BINS, _PSI_LO, _PSI_HI = 10, 0.0, 500000.0
_PSI_CUT = "1996-01-01"


@query(
    "psi_totalprice_drift",
    f"""
    WITH b AS (
        SELECT least(greatest(CAST(floor((o_totalprice - {_PSI_LO})
                   / (({_PSI_HI} - {_PSI_LO}) / {_PSI_BINS})) AS INT), 0),
                   {_PSI_BINS - 1}) AS bin,
               CAST(o_orderdate < TIMESTAMP '{_PSI_CUT}' AS INT) AS is_base
        FROM orders
    ),
    c AS (
        SELECT bin,
               CAST(count(*) FILTER (WHERE is_base = 1) AS BIGINT) AS n_base,
               CAST(count(*) FILTER (WHERE is_base = 0) AS BIGINT) AS n_new
        FROM b GROUP BY bin
    ),
    t AS (SELECT CAST(sum(n_base) AS BIGINT) AS tb,
                 CAST(sum(n_new) AS BIGINT) AS tn FROM c),
    s AS (
        SELECT bin, n_base, n_new,
               (n_base + 0.5) / (tb + 0.5 * {_PSI_BINS}) AS p,
               (n_new + 0.5) / (tn + 0.5 * {_PSI_BINS}) AS q
        FROM c, t
    )
    SELECT bin, n_base, n_new,
           round(p, 6) AS p_base, round(q, 6) AS p_new,
           round((p - q) * ln(p / q), 6) AS psi_contrib,
           round(sum((p - q) * ln(p / q)) OVER (), 6) AS psi_total
    FROM s ORDER BY bin
    """,
)
def psi_totalprice_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population-stability-index drift report on order totals:
    pre-1996 orders are the baseline population, later orders the
    comparison; fixed equi-width bins (clamped to the price domain),
    Laplace-smoothed shares, per-bin PSI contributions plus the
    total (PSI > 0.2 is the classic retrain-the-model alarm). The
    feature-drift monitor an ML warehouse runs nightly — one scan,
    one aggregate, a 1-row total window."""
    o = _t(spark, sf_dir, "orders")
    width = (_PSI_HI - _PSI_LO) / _PSI_BINS
    b = o.select(
        F.least(
            F.greatest(
                F.floor((F.col("o_totalprice") - _PSI_LO) / width).cast("int"),
                F.lit(0),
            ),
            F.lit(_PSI_BINS - 1),
        ).alias("bin"),
        (F.col("o_orderdate") < F.lit(_PSI_CUT).cast("timestamp")).cast("int").alias(
            "is_base"
        ),
    )
    c = b.groupBy("bin").agg(
        F.count(F.when(F.col("is_base") == 1, 1)).alias("n_base"),
        F.count(F.when(F.col("is_base") == 0, 1)).alias("n_new"),
    )
    t = c.agg(F.sum("n_base").alias("tb"), F.sum("n_new").alias("tn"))
    s = c.crossJoin(F.broadcast(t)).select(
        "bin",
        "n_base",
        "n_new",
        ((F.col("n_base") + 0.5) / (F.col("tb") + 0.5 * _PSI_BINS)).alias("p"),
        ((F.col("n_new") + 0.5) / (F.col("tn") + 0.5 * _PSI_BINS)).alias("q"),
    )
    contrib = (F.col("p") - F.col("q")) * F.log(F.col("p") / F.col("q"))
    w = Window.partitionBy()
    return s.select(
        "bin",
        "n_base",
        "n_new",
        F.round("p", 6).alias("p_base"),
        F.round("q", 6).alias("p_new"),
        F.round(contrib, 6).alias("psi_contrib"),
        F.round(F.sum(contrib).over(w), 6).alias("psi_total"),
    ).orderBy("bin")


def _duck_matching_sql(rounds: int = 3) -> str:
    """Local-minimum matching rounds unrolled: unique edge keys
    (hash, u, v), per-node min, both-endpoint winners, eviction."""
    ctes = [
        f"""s AS (SELECT s_suppkey::BIGINT AS id FROM supplier),
    l0 AS MATERIALIZED (
        SELECT a.id AS u, b.id AS v FROM s a JOIN s b ON a.id < b.id
        WHERE {_MIS_EDGE_SQL} % 10000 < 400)"""
    ]
    finals = []
    for r in range(rounds):
        h = _DUCK_H60.format(
            args=f"CAST(u AS VARCHAR) || '-' || CAST(v AS VARCHAR), 'mm{r}'"
        )
        ctes.append(
            f"k{r} AS MATERIALIZED (SELECT u, v, ROW({h}, u, v) AS k FROM l{r})"
        )
        ctes.append(
            f"""mk{r} AS MATERIALIZED (
            SELECT node, min(k) AS mk FROM (
                SELECT u AS node, k FROM k{r}
                UNION ALL SELECT v AS node, k FROM k{r}
            ) GROUP BY node)"""
        )
        ctes.append(
            f"""w{r} AS MATERIALIZED (
            SELECT k.u, k.v FROM k{r} k
            JOIN mk{r} a ON a.node = k.u JOIN mk{r} b ON b.node = k.v
            WHERE k.k = a.mk AND k.k = b.mk)"""
        )
        ctes.append(
            f"""l{r + 1} AS MATERIALIZED (
            SELECT u, v FROM l{r}
            WHERE u NOT IN (SELECT u FROM w{r} UNION ALL SELECT v FROM w{r})
              AND v NOT IN (SELECT u FROM w{r} UNION ALL SELECT v FROM w{r}))"""
        )
        finals.append(f"SELECT u, v, {r} AS round FROM w{r}")
    body = ",\n    ".join(ctes)
    return f"""WITH {body}
    SELECT u, v, round FROM ({" UNION ALL ".join(finals)}) ORDER BY u, v
    """


@query("matching_suppliers", _duck_matching_sql())
def matching_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic maximal matching (local-minimum edge keys) over
    the same 4%-sampled supplier graph as mis_suppliers — the
    edge-wise symmetry-breaking twin of MIS and the coarsening step
    of multilevel (METIS-style) partitioning: matched pairs contract
    into super-nodes via graph/matching.contract_matching. Three
    rounds; (hash, u, v) keys are unique, so local minima are
    well-defined even under hash collisions."""
    from social_link_prediction_spark.graph import matching as gmat

    sup = _t(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").cast("long").alias("id")
    )
    pairs = tg.sampled_edges(sup, 400, "mis")
    return gmat.maximal_matching(pairs, rounds=3).orderBy("u", "v")


_AQP_PCT = 10  # Bernoulli sampling rate, percent


@query(
    "sampled_groupby_ci",
    f"""
    WITH s AS (
        SELECT l_returnflag, l_quantity FROM lineitem
        WHERE {_DUCK_H60.format(args="CAST(l_orderkey AS VARCHAR) || '-' || CAST(l_linenumber AS VARCHAR), 'aqp'")} % 100 < {_AQP_PCT}
    ),
    est AS (
        SELECT l_returnflag,
               CAST(count(*) AS BIGINT) AS n_sample,
               round(count(*) * (100.0 / {_AQP_PCT}), 4) AS est_rows,
               round(1.96 * sqrt(count(*) * (1 - {_AQP_PCT} / 100.0))
                     * (100.0 / {_AQP_PCT}), 4) AS ci_rows,
               round(sum(l_quantity) * (100.0 / {_AQP_PCT}), 4) AS est_sum_qty
        FROM s GROUP BY l_returnflag
    ),
    ex AS (
        SELECT l_returnflag, CAST(count(*) AS BIGINT) AS exact_rows
        FROM lineitem GROUP BY l_returnflag
    )
    SELECT est.l_returnflag, n_sample, est_rows, ci_rows, est_sum_qty,
           exact_rows,
           CAST(abs(est_rows - exact_rows) <= ci_rows AS INT) AS within_ci
    FROM est JOIN ex USING (l_returnflag) ORDER BY est.l_returnflag
    """,
)
def sampled_groupby_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate query processing (online-aggregation style): a
    deterministic {_AQP_PCT}%-Bernoulli hash sample of lineitem
    answers the per-returnflag rollup with Horvitz-Thompson scale-up
    and a 1.96-sigma CI half-width — the read-1%-instead-of-100%
    pattern that turns a 100 TB exploratory scan into a 1 TB one.
    The exact counts ride along as the audit (within_ci flags).
    The sample predicate is scan-side (pushes to the row filter, no
    shuffle added); the hash family is h60, so the sample — and
    therefore every estimate — replays identically on both engines."""
    li = _t(spark, sf_dir, "lineitem")
    p = _AQP_PCT / 100.0
    s = li.filter(
        mls.hash60(
            F.format_string("%d-%d", "l_orderkey", "l_linenumber"), F.lit("aqp")
        )
        % 100
        < _AQP_PCT
    )
    est = s.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n_sample"),
        # scale = exact double 100/pct; MULTIPLY on both engines (x/p vs
        # x*scale differ in the last ulp when p is not a power of two)
        F.round(F.count(F.lit(1)) * (100.0 / _AQP_PCT), 4).alias("est_rows"),
        F.round(
            1.96 * F.sqrt(F.count(F.lit(1)) * (1 - p)) * (100.0 / _AQP_PCT), 4
        ).alias("ci_rows"),
        F.round(F.sum("l_quantity") * (100.0 / _AQP_PCT), 4).alias("est_sum_qty"),
    )
    ex = li.groupBy("l_returnflag").agg(F.count(F.lit(1)).alias("exact_rows"))
    return (
        est.join(ex, "l_returnflag")
        .select(
            "l_returnflag",
            "n_sample",
            "est_rows",
            "ci_rows",
            "est_sum_qty",
            "exact_rows",
            (F.abs(F.col("est_rows") - F.col("exact_rows")) <= F.col("ci_rows"))
            .cast("int")
            .alias("within_ci"),
        )
        .orderBy("l_returnflag")
    )


# =====================================================================
# Katz centrality (truncated walk sum) + DOULION sampled triangles —
# the damped-influence ranking and the edge-sparsified estimator that
# make exact graph stats affordable at 100 TB.
# =====================================================================

_KATZ_ALPHA = 0.05
_KATZ_EDGE_SQL = _DUCK_H60.format(
    args="CAST(a.id AS VARCHAR) || '-' || CAST(b.id AS VARCHAR), 'katz'"
)


def _duck_katz_sql(rounds: int = 3) -> str:
    """Katz power iteration unrolled: per round one inflow sum over
    the symmetrized edge list, then x = 1 + alpha * inflow."""
    ctes = [
        f"""s AS (SELECT s_suppkey::BIGINT AS id FROM supplier),
    e0 AS MATERIALIZED (
        SELECT a.id AS u, b.id AS v FROM s a JOIN s b ON a.id < b.id
        WHERE {_KATZ_EDGE_SQL} % 10000 < 500),
    ue AS MATERIALIZED (
        SELECT u, v FROM e0 UNION ALL SELECT v, u FROM e0),
    vtx AS MATERIALIZED (SELECT DISTINCT u AS id FROM ue),
    x0 AS (SELECT id, CAST(1.0 AS DOUBLE) AS x FROM vtx)"""
    ]
    for r in range(rounds):
        ctes.append(
            f"""i{r} AS MATERIALIZED (
            SELECT e.v AS id, sum(x.x) AS s
            FROM ue e JOIN x{r} x ON x.id = e.u GROUP BY e.v)"""
        )
        ctes.append(
            f"""x{r + 1} AS MATERIALIZED (
            SELECT vtx.id, 1.0 + {_KATZ_ALPHA} * coalesce(i.s, 0.0) AS x
            FROM vtx LEFT JOIN i{r} i ON i.id = vtx.id)"""
        )
    body = ",\n    ".join(ctes)
    return f"""WITH {body}
    SELECT id, round(x, 6) AS katz FROM x{rounds} ORDER BY id
    """


@query("katz_suppliers", _duck_katz_sql())
def katz_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Truncated Katz centrality (3 rounds, alpha=0.05) over a
    5%-sampled undirected supplier graph (replayable h60 sample, salt
    'katz'). Katz is the walk-damped member of the influence-ranking
    family the reference's graph analysis exposes (degree / PageRank,
    core/analysis/graph_analysis.py): every incoming walk contributes
    alpha^length, no degree normalization — so each round is exactly
    one keyed join + one keyed sum, and the unrolled recursion replays
    verbatim in the oracle. Scores round to 6 dp on both engines."""
    from social_link_prediction_spark.graph import centrality as gc

    sup = _t(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").cast("long").alias("id")
    )
    pairs = tg.sampled_edges(sup, 500, "katz")
    und = pairs.unionByName(
        pairs.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    out = gc.katz_centrality(und, alpha=_KATZ_ALPHA, rounds=3)
    return out.select("id", F.round("katz", 6).alias("katz")).orderBy("id")


_DUCK_TRI_BODY = """
        SELECT ab.a, ab.b, bc.b AS c
        FROM {e} ab
        JOIN {e} bc ON bc.a = ab.b
        WHERE EXISTS (SELECT 1 FROM {e} cl WHERE cl.a = ab.a AND cl.b = bc.b)
"""

_DLN_EDGE_SQL = _DUCK_H60.format(
    args="CAST(a AS VARCHAR) || '-' || CAST(b AS VARCHAR), 'dln'"
)


@query(
    "triangle_doulion",
    f"""
    WITH {_DUCK_TRI_EDGES.strip()},
    se AS MATERIALIZED (
        SELECT a, b FROM te WHERE {_DLN_EDGE_SQL} % 100 < 50),
    tri_s AS (SELECT count(*) AS c FROM ({_DUCK_TRI_BODY.format(e="se").strip()})),
    tri_x AS (SELECT count(*) AS c FROM ({_DUCK_TRI_BODY.format(e="te").strip()}))
    SELECT (SELECT count(*) FROM te) AS n_edges,
           (SELECT count(*) FROM se) AS n_edges_sampled,
           tri_s.c AS tri_sampled,
           tri_x.c AS tri_exact,
           round(CAST(tri_s.c AS DOUBLE) * 8.0, 4) AS tri_estimate,
           round(abs(CAST(tri_s.c AS DOUBLE) * 8.0 - tri_x.c)
                 / greatest(tri_x.c, 1), 6) AS rel_err
    FROM tri_s, tri_x
    """,
)
def triangle_doulion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DOULION (Tsourakakis et al., KDD'09) sampled triangle count on
    the folded lineitem graph: keep each distinct edge with p=1/2 via
    the replayable h60 coin (salt 'dln'), count triangles on the
    sparsified graph, scale by 1/p^3 = 8. At 100 TB the sparsified
    wedge join touches ~p^2 of the pairs — this is the knob that turns
    an infeasible exact census into a bounded estimate. The exact
    count rides along as the audit (rel_err column); sampling is a
    scan-side filter, so no extra shuffle before the wedge join.
    (Measured alternative, rejected: deriving the sampled count from
    the exact triangle set — filter on all three edge coins — moves
    the h60 evaluation from 0.5M edges to 3x23M triangle corners and
    is ~60% SLOWER at sf0.1; the sparsified second join costs only
    ~p^2 of the exact one.)"""
    from social_link_prediction_spark.graph import motifs as gm

    # r9 optimization: one edge-iterator pass counts BOTH censuses.
    # The old shape enumerated triangles twice (gm.triangles on the
    # full and sampled edge sets) — the full wedge join alone shuffled
    # 30M+ wedge rows (an 18s exchange at sf0.1). Here each oriented
    # edge carries its h60 coin plus four adjacency arrays (full and
    # sampled, both orientations — the node set is <= 2000 by the
    # modulus fold, so the arrays broadcast at any sf); tri_exact sums
    # |o ∩ i| per edge, tri_sampled sums |o_s ∩ i_s| over sampled
    # edges only — the same integers the enumerations counted, with
    # no wedge materialization at all (guide §2.3/§2.4). Measured
    # 8.3x on the bench entry; values bit-identical at sf0.01/sf0.1.
    e = gm._oriented(_tri_edges(spark, sf_dir), "src", "dst").persist()
    ec = e.withColumn(
        "s",
        mls.hash60(F.format_string("%d-%d", "a", "b"), F.lit("dln")) % 100 < 50,
    ).persist()
    ne = ec.agg(
        F.count(F.lit(1)).alias("n_edges"),
        F.sum(F.col("s").cast("long")).alias("n_edges_sampled"),
    )
    out_a = ec.groupBy("a").agg(
        F.collect_list("b").alias("o"),
        F.collect_list(F.when(F.col("s"), F.col("b"))).alias("o_s"),
    )
    in_b = ec.groupBy("b").agg(
        F.collect_list("a").alias("i"),
        F.collect_list(F.when(F.col("s"), F.col("a"))).alias("i_s"),
    )
    tri = (
        ec.join(F.broadcast(out_a), "a")
        .join(F.broadcast(in_b), "b")
        .select(
            F.size(F.array_intersect("o", "i")).alias("t"),
            F.when(F.col("s"), F.size(F.array_intersect("o_s", "i_s")))
            .otherwise(0)
            .alias("ts"),
        )
        .agg(
            F.sum("ts").alias("tri_sampled"),
            F.sum("t").alias("tri_exact"),
        )
    )
    est = F.col("tri_sampled") * F.lit(8.0)
    return (
        ne.crossJoin(tri)
        .select(
            "n_edges",
            "n_edges_sampled",
            "tri_sampled",
            "tri_exact",
            F.round(est, 4).alias("tri_estimate"),
            F.round(
                F.abs(est - F.col("tri_exact"))
                / F.greatest(F.col("tri_exact"), F.lit(1)),
                6,
            ).alias("rel_err"),
        )
    )


# =====================================================================
# Market-basket + distribution analytics: A-Priori frequent pairs,
# Gini revenue concentration, categorical mutual information.
# =====================================================================

_FIS_MINSUP = 0.002  # singleton support threshold (fraction of baskets)


@query(
    "frequent_itemsets_pairs",
    f"""
    WITH baskets AS (
        SELECT DISTINCT l_orderkey AS basket, l_partkey % 500 AS item
        FROM lineitem
    ),
    tot AS (SELECT CAST(count(DISTINCT basket) AS BIGINT) AS n_baskets FROM baskets),
    sing AS (
        SELECT item, CAST(count(*) AS BIGINT) AS cnt FROM baskets GROUP BY item
    ),
    freq AS (
        SELECT item, cnt FROM sing, tot WHERE cnt >= {_FIS_MINSUP} * n_baskets
    ),
    pairs AS (
        SELECT a.item AS item_a, b.item AS item_b, CAST(count(*) AS BIGINT) AS pair_cnt
        FROM baskets a
        JOIN baskets b ON b.basket = a.basket AND a.item < b.item
        WHERE a.item IN (SELECT item FROM freq)
          AND b.item IN (SELECT item FROM freq)
        GROUP BY a.item, b.item
    )
    SELECT item_a, item_b, pair_cnt,
           round(CAST(pair_cnt AS DOUBLE) / n_baskets, 6) AS support,
           round(CAST(pair_cnt AS DOUBLE) * n_baskets / (fa.cnt * fb.cnt), 6) AS lift
    FROM pairs
    JOIN freq fa ON fa.item = pairs.item_a
    JOIN freq fb ON fb.item = pairs.item_b
    CROSS JOIN tot
    ORDER BY pair_cnt DESC, item_a, item_b LIMIT 25
    """,
)
def frequent_itemsets_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A-Priori frequent item pairs over order baskets (items = part
    families, l_partkey % 500): frequent singletons first (support >=
    0.2% of baskets), pairs enumerated ONLY within the pruned baskets
    — the classic downward-closure cut that keeps the within-basket
    self-join from exploding at 100 TB. The pair join keys on the
    basket id (one shuffle both sides share); singleton counts come
    back as broadcast joins for support/lift. Top 25 by (count, a, b)
    deterministic."""
    li = _t(spark, sf_dir, "lineitem")
    baskets = li.select(
        F.col("l_orderkey").alias("basket"),
        (F.col("l_partkey") % 500).alias("item"),
    ).dropDuplicates()
    tot = baskets.agg(
        F.count_distinct(F.col("basket")).alias("n_baskets")
    )
    sing = baskets.groupBy("item").agg(F.count(F.lit(1)).alias("cnt"))
    freq = (
        sing.crossJoin(F.broadcast(tot))
        .filter(F.col("cnt") >= _FIS_MINSUP * F.col("n_baskets"))
        .select("item", "cnt")
    )
    pruned = baskets.join(F.broadcast(freq.select("item")), "item", "left_semi")
    a = pruned.select("basket", F.col("item").alias("item_a"))
    b = pruned.select("basket", F.col("item").alias("item_b"))
    pairs = (
        a.join(b, "basket")
        .filter(F.col("item_a") < F.col("item_b"))
        .groupBy("item_a", "item_b")
        .agg(F.count(F.lit(1)).alias("pair_cnt"))
    )
    fa = freq.select(F.col("item").alias("item_a"), F.col("cnt").alias("cnt_a"))
    fb = freq.select(F.col("item").alias("item_b"), F.col("cnt").alias("cnt_b"))
    return (
        pairs.join(F.broadcast(fa), "item_a")
        .join(F.broadcast(fb), "item_b")
        .crossJoin(F.broadcast(tot))
        .select(
            "item_a",
            "item_b",
            "pair_cnt",
            F.round(
                F.col("pair_cnt").cast("double") / F.col("n_baskets"), 6
            ).alias("support"),
            F.round(
                F.col("pair_cnt").cast("double")
                * F.col("n_baskets")
                / (F.col("cnt_a") * F.col("cnt_b")),
                6,
            ).alias("lift"),
        )
        .orderBy(F.col("pair_cnt").desc(), "item_a", "item_b")
        .limit(25)
    )


@query(
    "revenue_concentration_gini",
    """
    WITH rev AS (
        SELECT o_custkey AS custkey, sum(o_totalprice) AS revenue
        FROM orders GROUP BY o_custkey
    ),
    ranked AS (
        SELECT custkey, revenue,
               row_number() OVER (ORDER BY revenue ASC, custkey ASC) AS rk,
               row_number() OVER (ORDER BY revenue DESC, custkey ASC) AS rk_desc,
               count(*) OVER () AS n
        FROM rev
    )
    SELECT CAST(count(*) AS BIGINT) AS n_customers,
           round(sum(revenue), 2) AS total_revenue,
           round(2.0 * sum(rk * revenue) / (count(*) * sum(revenue))
                 - (count(*) + 1.0) / count(*), 6) AS gini,
           round(sum(CASE WHEN rk_desc <= floor(n / 10.0)
                          THEN revenue ELSE 0 END) / sum(revenue), 6)
               AS top_decile_share
    FROM ranked
    """,
)
def revenue_concentration_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue concentration audit over per-customer order revenue:
    exact Gini coefficient via the sorted-rank identity
    G = 2*sum(i*x_i)/(n*sum(x)) - (n+1)/n (x ascending, custkey
    tie-break) plus the top-decile revenue share. One aggregation
    shuffle on custkey, then two row_number windows over the |C|-row
    rollup — the windows are global but run on the aggregate, not the
    fact table (customers-with-orders only, stated scope). The shape
    every mixture/curation dashboard needs to spot corpus skew."""
    o = _t(spark, sf_dir, "orders")
    rev = o.groupBy(F.col("o_custkey").alias("custkey")).agg(
        F.sum("o_totalprice").alias("revenue")
    )
    return agg.concentration_stats(rev, "revenue", "custkey").select(
        F.col("n_keys").alias("n_customers"),
        F.col("total").alias("total_revenue"),
        "gini",
        "top_decile_share",
    )


@query(
    "mutual_information_priority_segment",
    """
    WITH joined AS (
        SELECT o.o_orderpriority AS priority, c.c_mktsegment AS segment
        FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
    ),
    cont AS (
        SELECT priority, segment, CAST(count(*) AS BIGINT) AS n
        FROM joined GROUP BY priority, segment
    ),
    tot AS (
        SELECT priority, segment, n,
               sum(n) OVER (PARTITION BY priority) AS n_x,
               sum(n) OVER (PARTITION BY segment) AS n_y,
               sum(n) OVER () AS n_all
        FROM cont
    )
    SELECT priority, segment, n,
           round(ln(CAST(n AS DOUBLE) * n_all / (n_x * n_y)), 6) AS pmi,
           round(CAST(n AS DOUBLE) / n_all
                 * ln(CAST(n AS DOUBLE) * n_all / (n_x * n_y)), 9) AS mi_contrib
    FROM tot
    ORDER BY priority, segment
    """,
)
def mutual_information_priority_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Categorical dependence audit: pointwise mutual information and
    per-cell MI contribution between order priority and customer
    market segment. One fact-side join (customer dim broadcast), one
    contingency aggregation; the marginals are window sums over the
    25-row contingency table, so nothing after the first aggregation
    touches fact-table volume. Summing mi_contrib gives the total MI
    in nats — ~0 here, the null-hypothesis audit a feature-selection
    pipeline runs before trusting a crossed feature."""
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    joined = o.join(
        F.broadcast(c.select("c_custkey", "c_mktsegment")),
        F.col("o_custkey") == F.col("c_custkey"),
    ).select(
        F.col("o_orderpriority").alias("priority"),
        F.col("c_mktsegment").alias("segment"),
    )
    cont = joined.groupBy("priority", "segment").agg(
        F.count(F.lit(1)).alias("n")
    )
    tot = cont.select(
        "priority",
        "segment",
        "n",
        F.sum("n").over(Window.partitionBy("priority")).alias("n_x"),
        F.sum("n").over(Window.partitionBy("segment")).alias("n_y"),
        F.sum("n").over(Window.partitionBy()).alias("n_all"),
    )
    ratio = F.col("n").cast("double") * F.col("n_all") / (F.col("n_x") * F.col("n_y"))
    return tot.select(
        "priority",
        "segment",
        "n",
        F.round(F.log(ratio), 6).alias("pmi"),
        F.round((F.col("n").cast("double") / F.col("n_all")) * F.log(ratio), 9).alias(
            "mi_contrib"
        ),
    ).orderBy("priority", "segment")


# =====================================================================
# ML-prep governance: feature scaling audit, Neyman-allocated
# stratified sampling, l-diversity release audit, multi-touch
# attribution.
# =====================================================================


@query(
    "feature_scaling_audit",
    """
    WITH stats AS (
        SELECT avg(c_acctbal) AS mu,
               stddev_samp(c_acctbal) AS sd,
               min(c_acctbal) AS lo,
               max(c_acctbal) AS hi,
               quantile_cont(c_acctbal, 0.25) AS q1,
               quantile_cont(c_acctbal, 0.5)  AS med,
               quantile_cont(c_acctbal, 0.75) AS q3
        FROM customer
    )
    SELECT c_custkey AS custkey,
           round(c_acctbal, 2) AS acctbal,
           round((c_acctbal - mu) / sd, 6) AS z,
           round((c_acctbal - lo) / (hi - lo), 6) AS minmax,
           round((c_acctbal - med) / (q3 - q1), 6) AS robust
    FROM customer, stats
    WHERE c_custkey % 100 < 5
    ORDER BY custkey
    """,
)
def feature_scaling_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The three standard feature scalings side by side — z-score,
    min-max, and robust (median/IQR, the heavy-tail-safe one) — over
    customer account balance. Stats come from ONE aggregation (exact
    interpolated percentiles via F.percentile) broadcast back as a
    1-row frame; the scaled projection is then scan-side arithmetic,
    so the fact table is read once and never shuffled. Output limited
    to the custkey%100<5 mod-slice to keep the audit frame small; the
    scalings are computed from full-table stats."""
    cust = _t(spark, sf_dir, "customer")
    stats = cust.agg(
        F.avg("c_acctbal").alias("mu"),
        F.stddev_samp("c_acctbal").alias("sd"),
        F.min("c_acctbal").alias("lo"),
        F.max("c_acctbal").alias("hi"),
        F.percentile("c_acctbal", F.lit(0.25)).alias("q1"),
        F.percentile("c_acctbal", F.lit(0.5)).alias("med"),
        F.percentile("c_acctbal", F.lit(0.75)).alias("q3"),
    )
    x = F.col("c_acctbal")
    return (
        cust.filter(F.col("c_custkey") % 100 < 5)
        .crossJoin(F.broadcast(stats))
        .select(
            F.col("c_custkey").alias("custkey"),
            F.round(x, 2).alias("acctbal"),
            F.round((x - F.col("mu")) / F.col("sd"), 6).alias("z"),
            F.round((x - F.col("lo")) / (F.col("hi") - F.col("lo")), 6).alias(
                "minmax"
            ),
            F.round((x - F.col("med")) / (F.col("q3") - F.col("q1")), 6).alias(
                "robust"
            ),
        )
        .orderBy("custkey")
    )


_NEY_BUDGET = 1000
_NEY_H = _DUCK_H60.format(args="CAST(o_orderkey AS VARCHAR), 'ney'")


@query(
    "neyman_allocation_sample",
    f"""
    WITH strata AS (
        SELECT o_orderpriority AS stratum,
               CAST(count(*) AS BIGINT) AS n_rows,
               round(stddev_samp(o_totalprice), 4) AS sd,
               round(avg(o_totalprice), 4) AS exact_mean
        FROM orders GROUP BY 1
    ),
    alloc AS (
        SELECT stratum, n_rows, sd, exact_mean,
               CAST(floor({_NEY_BUDGET} * (n_rows * sd)
                          / sum(n_rows * sd) OVER () + 0.5) AS BIGINT) AS n_alloc
        FROM strata
    ),
    ranked AS (
        SELECT o_orderpriority AS stratum, o_totalprice,
               row_number() OVER (PARTITION BY o_orderpriority
                                  ORDER BY {_NEY_H}, o_orderkey) AS rk
        FROM orders
    ),
    sampled AS (
        SELECT r.stratum, CAST(count(*) AS BIGINT) AS n_actual,
               round(avg(r.o_totalprice), 4) AS est_mean
        FROM ranked r JOIN alloc a ON a.stratum = r.stratum
        WHERE r.rk <= a.n_alloc
        GROUP BY r.stratum
    )
    SELECT a.stratum, n_rows, sd, n_alloc, n_actual, est_mean, exact_mean
    FROM alloc a JOIN sampled s ON s.stratum = a.stratum
    ORDER BY a.stratum
    """,
)
def neyman_allocation_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Neyman-allocated stratified sampling: the 1000-row budget is
    split across order-priority strata proportional to N_h * S_h —
    variance-optimal allocation (Neyman 1934), the sampler a 100 TB
    profiling job runs instead of uniform sampling when strata have
    unequal spread. Per-stratum stddevs are rounded to 4 dp BEFORE the
    allocation arithmetic so both engines derive identical budgets;
    rows are drawn by h60 rank within each stratum (deterministic,
    replayable). The exact mean rides along as the audit. At full
    scale the row_number rank becomes the hash-threshold filter
    (rank<=n ~ hash<n/N * 2^60) — same sample law, no per-stratum
    sort."""
    o = _t(spark, sf_dir, "orders")
    strata = o.groupBy(F.col("o_orderpriority").alias("stratum")).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.round(F.stddev_samp("o_totalprice"), 4).alias("sd"),
        F.round(F.avg("o_totalprice"), 4).alias("exact_mean"),
    )
    w = F.col("n_rows") * F.col("sd")
    alloc = strata.select(
        "stratum",
        "n_rows",
        "sd",
        "exact_mean",
        F.floor(
            _NEY_BUDGET * w / F.sum(w).over(Window.partitionBy()) + F.lit(0.5)
        )
        .cast("long")
        .alias("n_alloc"),
    )
    ranked = o.select(
        F.col("o_orderpriority").alias("stratum"),
        "o_totalprice",
        F.row_number()
        .over(
            Window.partitionBy("o_orderpriority").orderBy(
                mls.hash60(F.col("o_orderkey").cast("string"), F.lit("ney")),
                F.col("o_orderkey"),
            )
        )
        .alias("rk"),
    )
    sampled = (
        ranked.join(F.broadcast(alloc.select("stratum", "n_alloc")), "stratum")
        .filter(F.col("rk") <= F.col("n_alloc"))
        .groupBy("stratum")
        .agg(
            F.count(F.lit(1)).alias("n_actual"),
            F.round(F.avg("o_totalprice"), 4).alias("est_mean"),
        )
    )
    return (
        alloc.join(sampled, "stratum")
        .select(
            "stratum", "n_rows", "sd", "n_alloc", "n_actual", "est_mean",
            "exact_mean",
        )
        .orderBy("stratum")
    )


@query(
    "l_diversity_audit",
    """
    WITH g AS (
        SELECT c_nationkey, c_mktsegment,
               CAST(count(*) AS BIGINT) AS n,
               CAST(count(DISTINCT floor(c_acctbal / 1000)) AS BIGINT) AS diversity
        FROM customer GROUP BY 1, 2
    )
    SELECT CAST(count(*) AS BIGINT) AS n_groups,
           CAST(sum(CASE WHEN diversity < 3 THEN 1 ELSE 0 END) AS BIGINT)
               AS groups_below_l,
           CAST(coalesce(sum(CASE WHEN diversity < 3 THEN n ELSE 0 END), 0)
                AS BIGINT) AS rows_at_risk,
           min(diversity) AS min_diversity,
           round(avg(diversity), 4) AS avg_diversity
    FROM g
    """,
)
def l_diversity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """l-diversity audit (l=3) on the same (nation, market-segment)
    quasi-identifier pair as k_anonymity_audit, with the
    thousand-bucketed account balance as the sensitive attribute:
    a group can be k-anonymous yet still leak if everyone in it
    shares one sensitive value (Machanavajjhala et al., ICDE'06).
    One aggregation keyed by the quasi-identifier computes group size
    AND distinct-sensitive-value diversity; the rollup is group-count
    sized. Together the two audits are the release gate."""
    cust = _t(spark, sf_dir, "customer")
    g = cust.groupBy("c_nationkey", "c_mktsegment").agg(
        F.count(F.lit(1)).alias("n"),
        F.count_distinct(F.floor(F.col("c_acctbal") / 1000)).alias("diversity"),
    )
    return g.agg(
        F.count(F.lit(1)).alias("n_groups"),
        F.sum((F.col("diversity") < 3).cast("int")).alias("groups_below_l"),
        F.coalesce(
            F.sum(F.when(F.col("diversity") < 3, F.col("n")).otherwise(F.lit(0))),
            F.lit(0),
        ).alias("rows_at_risk"),
        F.min("diversity").alias("min_diversity"),
        F.round(F.avg("diversity"), 4).alias("avg_diversity"),
    )


@query(
    "multitouch_attribution",
    """
    WITH p AS (
        SELECT event_id AS conv_id, user_id, ts AS conv_ts
        FROM events WHERE event_type = 'purchase'
    ),
    t AS (
        SELECT user_id, ts, event_type AS channel, event_id
        FROM events WHERE event_type IN ('view', 'click', 'signup')
    ),
    pairs AS (
        SELECT p.conv_id, t.channel, t.ts, t.event_id
        FROM p JOIN t ON t.user_id = p.user_id
         AND t.ts < p.conv_ts
         AND t.ts >= p.conv_ts - INTERVAL 7 DAY
    ),
    credited AS (
        SELECT conv_id, channel,
               row_number() OVER (PARTITION BY conv_id
                                  ORDER BY ts ASC, event_id ASC) AS rk_first,
               row_number() OVER (PARTITION BY conv_id
                                  ORDER BY ts DESC, event_id DESC) AS rk_last,
               count(*) OVER (PARTITION BY conv_id) AS n_touches
        FROM pairs
    ),
    touched AS (
        SELECT channel,
               round(sum(CASE WHEN rk_first = 1 THEN 1.0 ELSE 0 END), 4)
                   AS first_touch,
               round(sum(CASE WHEN rk_last = 1 THEN 1.0 ELSE 0 END), 4)
                   AS last_touch,
               round(sum(1.0 / n_touches), 4) AS linear,
               CAST(count(DISTINCT conv_id) AS BIGINT) AS n_conversions
        FROM credited GROUP BY channel
    ),
    direct AS (
        SELECT 'direct' AS channel,
               round(CAST(count(*) AS DOUBLE), 4) AS first_touch,
               round(CAST(count(*) AS DOUBLE), 4) AS last_touch,
               round(CAST(count(*) AS DOUBLE), 4) AS linear,
               CAST(count(*) AS BIGINT) AS n_conversions
        FROM p WHERE conv_id NOT IN (SELECT conv_id FROM pairs)
    )
    SELECT * FROM touched UNION ALL SELECT * FROM direct
    ORDER BY channel
    """,
)
def multitouch_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-touch conversion attribution: each purchase credits the
    user's view/click/signup touches in the prior 7 days under three
    models at once — first-touch, last-touch, and linear (1/k per
    touch). Touchless purchases surface as the 'direct' channel so
    credit mass always equals the conversion count. One user-keyed
    join builds the (conversion, touch) pairs (per-user event lists
    bound the fan-out; the 7-day predicate caps buffered state — the
    same discipline as the stream-stream correlate), then the credit
    windows key on conv_id. Deterministic tie-breaks on (ts,
    event_id) both directions."""
    ev = _t(spark, sf_dir, "events")
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("conv_id"),
        "user_id",
        F.col("ts").alias("conv_ts"),
    )
    t = ev.filter(F.col("event_type").isin("view", "click", "signup")).select(
        "user_id", "ts", F.col("event_type").alias("channel"), "event_id"
    )
    pairs = p.join(t, "user_id").filter(
        (F.col("ts") < F.col("conv_ts"))
        & (F.col("ts") >= F.col("conv_ts") - F.expr("INTERVAL 7 DAY"))
    )
    wf = Window.partitionBy("conv_id").orderBy(
        F.col("ts").asc(), F.col("event_id").asc()
    )
    wl = Window.partitionBy("conv_id").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    credited = pairs.select(
        "conv_id",
        "channel",
        F.row_number().over(wf).alias("rk_first"),
        F.row_number().over(wl).alias("rk_last"),
        F.count(F.lit(1)).over(Window.partitionBy("conv_id")).alias("n_touches"),
    )
    touched = credited.groupBy("channel").agg(
        F.round(
            F.sum(F.when(F.col("rk_first") == 1, F.lit(1.0)).otherwise(F.lit(0.0))),
            4,
        ).alias("first_touch"),
        F.round(
            F.sum(F.when(F.col("rk_last") == 1, F.lit(1.0)).otherwise(F.lit(0.0))),
            4,
        ).alias("last_touch"),
        F.round(F.sum(F.lit(1.0) / F.col("n_touches")), 4).alias("linear"),
        F.count_distinct(F.col("conv_id")).alias("n_conversions"),
    )
    direct = (
        p.join(pairs.select("conv_id"), "conv_id", "left_anti")
        .agg(F.count(F.lit(1)).alias("c"))
        .select(
            F.lit("direct").alias("channel"),
            F.round(F.col("c").cast("double"), 4).alias("first_touch"),
            F.round(F.col("c").cast("double"), 4).alias("last_touch"),
            F.round(F.col("c").cast("double"), 4).alias("linear"),
            F.col("c").alias("n_conversions"),
        )
    )
    return touched.unionByName(direct).orderBy("channel")


_MKV_CHANNELS = ("click", "signup", "view")
_MKV_ROUNDS = 8


def _duck_markov_sql(rounds: int = _MKV_ROUNDS) -> str:
    """Absorbing-chain attribution unrolled: journey edges, transition
    counts, then per scenario (base + one knockout per channel) the
    row-normalized matrix and a fixed-round absorption recursion."""
    ctes = [
        """j AS (
        SELECT user_id, ts, event_id,
               CASE WHEN event_type = 'purchase' THEN 'conv'
                    ELSE event_type END AS state,
               coalesce(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                        OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                        0) AS jid
        FROM events
        WHERE event_type IN ('view', 'click', 'signup', 'purchase')
    ),
    e2 AS (
        SELECT state,
               lag(state) OVER (PARTITION BY user_id, jid
                                ORDER BY ts, event_id) AS prev,
               lead(state) OVER (PARTITION BY user_id, jid
                                 ORDER BY ts, event_id) AS nxt
        FROM j
    ),
    edges AS (
        SELECT coalesce(prev, 'start') AS src, state AS dst FROM e2
        UNION ALL
        SELECT state, 'null' FROM e2 WHERE nxt IS NULL AND state <> 'conv'
    ),
    trans AS MATERIALIZED (SELECT src, dst, count(*) AS n FROM edges GROUP BY 1, 2),
    nconv AS (SELECT CAST(coalesce(sum(n), 0) AS BIGINT) AS n_conv
              FROM trans WHERE dst = 'conv')"""
    ]
    scenarios = [("base", None)] + [(c, c) for c in _MKV_CHANNELS]
    for name, rem in scenarios:
        if rem is None:
            mod = "SELECT src, dst, n FROM trans"
        else:
            mod = (
                f"SELECT src, CASE WHEN dst = '{rem}' THEN 'null' ELSE dst END"
                f" AS dst, n FROM trans WHERE src <> '{rem}'"
            )
        ctes.append(
            f"t_{name} AS (SELECT src, dst, sum(n) AS n FROM ({mod}) GROUP BY 1, 2)"
        )
        ctes.append(
            f"""pr_{name} AS MATERIALIZED (
            SELECT src, dst,
                   CAST(n AS DOUBLE) / sum(n) OVER (PARTITION BY src) AS p
            FROM t_{name})"""
        )
        ctes.append(
            f"p_{name}_0 AS (SELECT DISTINCT src AS state, CAST(0 AS DOUBLE) AS p"
            f" FROM pr_{name})"
        )
        for r in range(rounds):
            ctes.append(
                f"""p_{name}_{r + 1} AS (
                SELECT pr.src AS state,
                       sum(pr.p * CASE WHEN pr.dst = 'conv' THEN 1.0
                                       WHEN pr.dst = 'null' THEN 0.0
                                       ELSE coalesce(pp.p, 0.0) END) AS p
                FROM pr_{name} pr
                LEFT JOIN p_{name}_{r} pp ON pp.state = pr.dst
                GROUP BY pr.src)"""
            )
        ctes.append(
            f"f_{name} AS (SELECT coalesce((SELECT p FROM p_{name}_{rounds}"
            f" WHERE state = 'start'), 0.0) AS p)"
        )
    re_rows = " UNION ALL ".join(
        f"""SELECT '{c}' AS channel, b.p AS base,
            CASE WHEN b.p > 0 THEN greatest(0.0, (b.p - x.p) / b.p)
                 ELSE 0.0 END AS re
            FROM f_base b, f_{c} x"""
        for c in _MKV_CHANNELS
    )
    body = ",\n    ".join(ctes)
    return f"""WITH {body},
    re AS ({re_rows}),
    tot AS (SELECT sum(re) AS t FROM re)
    SELECT channel,
           round(base, 6) AS p_conv_base,
           round(re, 6) AS removal_effect,
           round(CASE WHEN t > 0 THEN n_conv * re / t ELSE 0.0 END, 4)
               AS attributed_conversions
    FROM re, tot, nconv ORDER BY channel
    """


@query("markov_attribution", _duck_markov_sql())
def markov_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Markov removal-effect attribution over user journeys: the
    counterfactual upgrade of multitouch_attribution — per channel,
    how much does P(conversion | start) drop when every transition
    into that channel is redirected to null? Journey construction and
    transition counting are fully distributed (one user-keyed
    shuffle, pipelines/attribution.journey_transitions); the
    absorbing-chain power iteration runs driver-side on the
    O(channels^2)-row count matrix — the same driver-sized-lookup
    split as the PQ ADC tables. 8 truncated rounds, replayed verbatim
    by the unrolled oracle."""
    from social_link_prediction_spark.pipelines import attribution as attr

    ev = _t(spark, sf_dir, "events")
    trans = attr.journey_transitions(ev)
    rows = [(r["src"], r["dst"], r["n"]) for r in trans.collect()]
    out = attr.markov_removal_effects(
        rows, channels=_MKV_CHANNELS, rounds=_MKV_ROUNDS
    )
    return spark.createDataFrame(
        [
            (
                d["channel"],
                d["p_conv_base"],
                d["removal_effect"],
                d["attributed_conversions"],
            )
            for d in out
        ],
        "channel string, p_conv_base double, removal_effect double,"
        " attributed_conversions double",
    ).orderBy("channel")


# =====================================================================
# Clustering QA, web-scale bootstrap, seasonal anomaly residuals.
# =====================================================================


def _duck_silhouette_sql() -> str:
    cents = [
        "[" + ",".join(repr(x) for x in c) + "]::DOUBLE[]" for c in _IVF_CENTROIDS
    ]
    scores = ", ".join(
        f"list_cosine_similarity(v, {c}) AS s{i}" for i, c in enumerate(cents)
    )
    ss = ", ".join(f"s{i}" for i in range(len(cents)))
    case = (
        "CASE WHEN s3 > greatest(s0, s1, s2) THEN 3 "
        "WHEN s2 > greatest(s0, s1) THEN 2 "
        "WHEN s1 > s0 THEN 1 ELSE 0 END"
    )
    return f"""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    s AS (SELECT vec_id, {scores} FROM e),
    m AS (
        SELECT {case} AS ivf_cell,
               list_sort([{ss}], 'DESC')[1] AS s_own,
               list_sort([{ss}], 'DESC')[2] AS s_next
        FROM s
    )
    SELECT ivf_cell,
           CAST(count(*) AS BIGINT) AS n_vectors,
           round(avg(s_own - s_next), 6) AS avg_margin,
           round(min(s_own - s_next), 6) AS min_margin,
           CAST(sum(CASE WHEN s_own - s_next < 0.05 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_boundary
    FROM m GROUP BY ivf_cell ORDER BY ivf_cell
    """


@query("ivf_silhouette_audit", _duck_silhouette_sql())
def ivf_silhouette_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Simplified-silhouette audit of the IVF coarse quantizer: per
    cell, how confidently do its members belong — average and minimum
    own-vs-runner-up cosine margin, and the count of boundary points
    (margin < 0.05) that force multi-probe searches to visit
    neighboring cells. The score array is built once per vector in
    codegen (broadcast centroids, no UDF); the rollup is cell-count
    sized. This is the health metric that decides when a 100 TB
    vector store re-trains its coarse centroids."""
    emb = _t(spark, sf_dir, "embeddings")
    m = sim.ivf_assignment_margin(emb, _IVF_CENTROIDS)
    return (
        m.groupBy("ivf_cell")
        .agg(
            F.count(F.lit(1)).alias("n_vectors"),
            F.round(F.avg("margin"), 6).alias("avg_margin"),
            F.round(F.min("margin"), 6).alias("min_margin"),
            F.sum((F.col("margin") < 0.05).cast("int")).alias("n_boundary"),
        )
        .orderBy("ivf_cell")
    )


_BOOT_B = 20
# Integer cutoffs on h60 % 1e6: floor(1e6 * CDF_Poisson1(k)) for k=0..5.
_POIS_CUTS = (367879, 735759, 919699, 981012, 996340, 999406)


def _duck_bootstrap_sql() -> str:
    h = _DUCK_H60.format(
        args="CAST(o_orderkey AS VARCHAR), 'boot' || CAST(b AS VARCHAR)"
    )
    ladder = " ".join(
        f"WHEN m < {c} THEN {k}" for k, c in enumerate(_POIS_CUTS)
    )
    return f"""
    WITH r AS (
        SELECT o_totalprice, b, {h} % 1000000 AS m
        FROM orders, (SELECT unnest(range(1, {_BOOT_B + 1})) AS b)
    ),
    w AS (SELECT b, o_totalprice, CASE {ladder} ELSE 6 END AS w FROM r),
    est AS (
        SELECT b, sum(w * o_totalprice) / CAST(sum(w) AS DOUBLE) AS est_mean
        FROM w GROUP BY b
    ),
    ex AS (SELECT avg(o_totalprice) AS exact_mean FROM orders)
    SELECT round(exact_mean, 4) AS exact_mean,
           round(avg(est_mean), 4) AS boot_mean,
           round(stddev_samp(est_mean), 6) AS boot_se,
           round(quantile_cont(est_mean, 0.025), 4) AS ci_lo,
           round(quantile_cont(est_mean, 0.975), 4) AS ci_hi
    FROM est, ex GROUP BY exact_mean
    """


@query("poisson_bootstrap_mean", _duck_bootstrap_sql())
def poisson_bootstrap_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Poisson bootstrap (the web-scale bootstrap: resample weights
    w ~ Poisson(1) drawn independently per row, so B resamples need
    ONE scan and no global row count): 20 hash-deterministic
    resamples of the order-price mean, summarized as bootstrap SE and
    a 95% percentile CI around the exact mean. The Poisson draw is an
    integer CASE ladder on h60 % 1e6 (replayable on both engines, no
    RNG); the explode is a flat B-fold fan-out that partial-aggregates
    map-side, so the shuffle carries B rows per partition, not B
    copies of the data."""
    o = _t(spark, sf_dir, "orders")
    # r9 perf: the 20x replicate md5 fan-out otherwise executes inside
    # the scan stage (1-3 tasks on single-row-group parquet); lift it
    # onto defaultParallelism so every core hashes. At cluster scale
    # the scan splits already parallelize and this slim round-robin
    # exchange is noise. Interleaved A/B at sf0.1: 2.10x med.
    sp = spark.sparkContext.defaultParallelism
    b = spark.range(1, _BOOT_B + 1).select(F.col("id").alias("b"))
    r = (
        o.select("o_orderkey", "o_totalprice")
        .repartition(sp)
        .crossJoin(F.broadcast(b))
        .select(
            "o_totalprice",
            "b",
            (
                mls.hash60(
                    F.col("o_orderkey").cast("string"),
                    F.concat(F.lit("boot"), F.col("b").cast("string")),
                )
                % 1000000
            ).alias("m"),
        )
    )
    w = F.lit(6)
    for k in range(len(_POIS_CUTS) - 1, -1, -1):
        w = F.when(F.col("m") < _POIS_CUTS[k], F.lit(k)).otherwise(w)
    est = (
        r.select("b", "o_totalprice", w.alias("w"))
        .groupBy("b")
        .agg(
            (
                F.sum(F.col("w") * F.col("o_totalprice"))
                / F.sum("w").cast("double")
            ).alias("est_mean")
        )
    )
    ex = o.agg(F.avg("o_totalprice").alias("exact_mean"))
    return est.crossJoin(F.broadcast(ex)).groupBy("exact_mean").agg(
        F.round(F.first("exact_mean"), 4).alias("exact_mean_r"),
        F.round(F.avg("est_mean"), 4).alias("boot_mean"),
        F.round(F.stddev_samp("est_mean"), 6).alias("boot_se"),
        F.round(F.percentile("est_mean", F.lit(0.025)), 4).alias("ci_lo"),
        F.round(F.percentile("est_mean", F.lit(0.975)), 4).alias("ci_hi"),
    ).select(
        F.col("exact_mean_r").alias("exact_mean"),
        "boot_mean",
        "boot_se",
        "ci_lo",
        "ci_hi",
    )


@query(
    "seasonal_residual_anomalies",
    """
    WITH hourly AS (
        SELECT event_type, CAST(ts AS DATE) AS day, extract(hour FROM ts) AS hr,
               CAST(count(*) AS BIGINT) AS n
        FROM events GROUP BY 1, 2, 3
    ),
    base AS (
        SELECT event_type, day, hr, n,
               avg(n) OVER (PARTITION BY event_type,
                            datediff('day', DATE '1970-01-05', day) % 7, hr)
                   AS baseline,
               stddev_samp(n) OVER (PARTITION BY event_type,
                            datediff('day', DATE '1970-01-05', day) % 7, hr)
                   AS sd
        FROM hourly
    )
    SELECT event_type, day, hr, n,
           round(baseline, 4) AS baseline,
           round((n - baseline) / greatest(sd, 0.0001), 4) AS z
    FROM base
    WHERE abs((n - baseline) / greatest(sd, 0.0001)) > 2
    ORDER BY event_type, day, hr
    """,
)
def seasonal_residual_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonal-naive anomaly detection on the event stream: hourly
    volumes per type are compared against their OWN (type, day-of-
    week, hour-of-day) baseline — the residual screen that doesn't
    false-alarm on ordinary weekly rhythm, complementing
    event_rate_anomalies' trailing-window z. Day-of-week comes from
    epoch-day arithmetic (Monday anchor), not locale-dependent dow
    functions, so both engines and any session TZ agree. One
    aggregation shrinks the stream to hourly cells; the baseline
    windows run on that rollup."""
    ev = _t(spark, sf_dir, "events")
    hourly = ev.groupBy(
        "event_type",
        F.to_date("ts").alias("day"),
        F.hour("ts").alias("hr"),
    ).agg(F.count(F.lit(1)).alias("n"))
    dow = F.datediff(F.col("day"), F.lit("1970-01-05").cast("date")) % 7
    wspec = Window.partitionBy("event_type", dow, "hr")
    base = hourly.select(
        "event_type",
        "day",
        "hr",
        "n",
        F.avg("n").over(wspec).alias("baseline"),
        F.stddev_samp("n").over(wspec).alias("sd"),
    )
    z = (F.col("n") - F.col("baseline")) / F.greatest(F.col("sd"), F.lit(0.0001))
    return (
        base.filter(F.abs(z) > 2)
        .select(
            "event_type",
            "day",
            "hr",
            "n",
            F.round("baseline", 4).alias("baseline"),
            F.round(z, 4).alias("z"),
        )
        .orderBy("event_type", "day", "hr")
    )


# =====================================================================
# Recommender-system family: item-item cosine neighborhoods over
# co-purchase baskets (the classic "customers who bought X" engine).
# =====================================================================

_III_HUB_CAP = 50  # drop baskets larger than this (hub-user guard)
_III_TOPK = 5


@query(
    "item_item_cosine_topk",
    f"""
    WITH baskets AS (
        SELECT DISTINCT o.o_custkey AS u, l.l_partkey % 500 AS item
        FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
    ),
    kept AS (
        SELECT u, item FROM baskets
        WHERE u IN (SELECT u FROM baskets GROUP BY u
                    HAVING count(*) <= {_III_HUB_CAP})
    ),
    item_n AS (
        SELECT item, CAST(count(*) AS BIGINT) AS n FROM kept GROUP BY item
    ),
    pairs AS (
        SELECT a.item AS ia, b.item AS ib, CAST(count(*) AS BIGINT) AS c
        FROM kept a JOIN kept b ON b.u = a.u AND a.item < b.item
        GROUP BY a.item, b.item
    ),
    sym AS (
        SELECT ia AS item, ib AS neighbor, c FROM pairs
        UNION ALL
        SELECT ib, ia, c FROM pairs
    ),
    scored AS (
        SELECT s.item, s.neighbor, s.c,
               round(s.c / sqrt(na.n * nb.n), 6) AS cosine
        FROM sym s
        JOIN item_n na ON na.item = s.item
        JOIN item_n nb ON nb.item = s.neighbor
    ),
    ranked AS (
        SELECT item, neighbor, c, cosine,
               row_number() OVER (PARTITION BY item
                                  ORDER BY cosine DESC, neighbor ASC) AS rk
        FROM scored
    )
    SELECT item, neighbor, c AS n_cousers, cosine, rk
    FROM ranked WHERE rk <= {_III_TOPK}
    ORDER BY item, rk
    """,
)
def item_item_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Item-item collaborative filtering neighborhoods: cosine
    similarity over binary co-purchase vectors (part families x
    customers), top-{_III_TOPK} neighbors per item. The scale
    discipline is the classic one: baskets above {_III_HUB_CAP} items
    are dropped (a hub user contributes O(deg^2) pairs but ~zero
    signal — same cap family as the LSH max_bucket guard), pairs are
    enumerated once as a<b within the user key and mirrored after
    counting, and cosine is ROUNDED before ranking so float noise
    cannot flip a rank-k boundary (the ranking_metrics lesson).
    Reference analog: ml/predict.recommend_topk ranks by a learned
    model; this is the memory-based twin on behavior alone."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    baskets = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .select(
            F.col("o_custkey").alias("u"),
            (F.col("l_partkey") % 500).alias("item"),
        )
        .dropDuplicates()
    )
    sizes = baskets.groupBy("u").agg(F.count(F.lit(1)).alias("bn"))
    kept = baskets.join(
        F.broadcast(sizes.filter(F.col("bn") <= _III_HUB_CAP).select("u")), "u"
    ).persist()
    item_n = kept.groupBy("item").agg(F.count(F.lit(1)).alias("n"))
    a = kept.select("u", F.col("item").alias("ia"))
    b = kept.select("u", F.col("item").alias("ib"))
    pairs = (
        a.join(b, "u")
        .filter(F.col("ia") < F.col("ib"))
        .groupBy("ia", "ib")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    sym = pairs.select(
        F.col("ia").alias("item"), F.col("ib").alias("neighbor"), "c"
    ).unionByName(
        pairs.select(
            F.col("ib").alias("item"), F.col("ia").alias("neighbor"), "c"
        )
    )
    na = item_n.select(F.col("item"), F.col("n").alias("na"))
    nb = item_n.select(F.col("item").alias("neighbor"), F.col("n").alias("nb"))
    scored = (
        sym.join(F.broadcast(na), "item")
        .join(F.broadcast(nb), "neighbor")
        .select(
            "item",
            "neighbor",
            "c",
            F.round(F.col("c") / F.sqrt(F.col("na") * F.col("nb")), 6).alias(
                "cosine"
            ),
        )
    )
    wr = Window.partitionBy("item").orderBy(
        F.col("cosine").desc(), F.col("neighbor").asc()
    )
    return (
        scored.withColumn("rk", F.row_number().over(wr))
        .filter(F.col("rk") <= _III_TOPK)
        .select("item", "neighbor", F.col("c").alias("n_cousers"), "cosine", "rk")
        .orderBy("item", "rk")
    )


# =====================================================================
# Optimizer-grade AQP: sketch-style join-size estimation; feature
# selection: information gain; product analytics: conversion latency.
# =====================================================================

_JSE_PCT = 5  # key-sample rate, percent
_JSE_H = _DUCK_H60.format(args="CAST(k AS VARCHAR), 'jse'")


@query(
    "join_size_estimate",
    f"""
    WITH ok AS (
        SELECT o_orderkey AS k, CAST(count(*) AS BIGINT) AS fa
        FROM orders GROUP BY 1
    ),
    lk AS (
        SELECT l_orderkey AS k, CAST(count(*) AS BIGINT) AS fb
        FROM lineitem GROUP BY 1
    ),
    joined AS (
        SELECT ok.k, fa, fb FROM ok JOIN lk ON lk.k = ok.k
    ),
    sampled AS (
        SELECT CAST(coalesce(sum(fa * fb), 0) AS BIGINT) AS s_contrib,
               CAST(count(*) AS BIGINT) AS n_sampled_keys
        FROM joined WHERE {_JSE_H} % 100 < {_JSE_PCT}
    ),
    exact AS (
        SELECT CAST(sum(fa * fb) AS BIGINT) AS exact_rows,
               CAST(count(*) AS BIGINT) AS n_keys
        FROM joined
    )
    SELECT n_keys, n_sampled_keys, exact_rows,
           round(s_contrib * (100.0 / {_JSE_PCT}), 4) AS est_rows,
           round(abs(s_contrib * (100.0 / {_JSE_PCT}) - exact_rows)
                 / exact_rows, 6) AS rel_err
    FROM sampled, exact
    """,
)
def join_size_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sampled join-cardinality estimation — the statistic a cost-
    based optimizer (or a pre-flight guard on a 100 TB join) needs
    BEFORE running the join: |A join B| = sum_k f_A(k)*f_B(k),
    estimated from a {_JSE_PCT}% deterministic h60 KEY sample with
    Horvitz-Thompson scale-up. Key-level (not row-level) sampling is
    the part that matters: both sides agree on the sampled keys, so
    per-key frequency products are observed exactly and heavy keys
    are never torn. The per-key frequency frames are tiny relative to
    the fact tables; the exact count rides along as the audit."""
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    ok = o.groupBy(F.col("o_orderkey").alias("k")).agg(
        F.count(F.lit(1)).alias("fa")
    )
    lk = li.groupBy(F.col("l_orderkey").alias("k")).agg(
        F.count(F.lit(1)).alias("fb")
    )
    joined = ok.join(lk, "k").select("k", "fa", "fb").persist()
    sampled = joined.filter(
        mls.hash60(F.col("k").cast("string"), F.lit("jse")) % 100 < _JSE_PCT
    ).agg(
        F.coalesce(F.sum(F.col("fa") * F.col("fb")), F.lit(0)).alias("s_contrib"),
        F.count(F.lit(1)).alias("n_sampled_keys"),
    )
    exact = joined.agg(
        F.sum(F.col("fa") * F.col("fb")).alias("exact_rows"),
        F.count(F.lit(1)).alias("n_keys"),
    )
    est = F.col("s_contrib") * (100.0 / _JSE_PCT)
    return sampled.crossJoin(exact).select(
        "n_keys",
        "n_sampled_keys",
        "exact_rows",
        F.round(est, 4).alias("est_rows"),
        F.round(F.abs(est - F.col("exact_rows")) / F.col("exact_rows"), 6).alias(
            "rel_err"
        ),
    )


_IG_FEATURES = ("o_orderpriority", "o_orderstatus", "c_mktsegment")


def _duck_ig_sql() -> str:
    """Information gain of each categorical feature against the
    high-value-order label, each feature from the same joined scan."""
    parts = []
    for feat in _IG_FEATURES:
        parts.append(
            f"""
    SELECT '{feat}' AS feature,
           round(hy.h, 6) AS h_label,
           round(hy.h - (
               SELECT sum(cnt / t.n * h_cond) FROM (
                   SELECT {feat} AS v, CAST(count(*) AS DOUBLE) AS cnt,
                          -- conditional entropy within the feature value
                          coalesce(sum(
                              CASE WHEN y = 1 THEN 1.0 ELSE 0 END), 0) AS pos,
                          count(*) AS nn
                   FROM j GROUP BY {feat}
               ) g, t,
               LATERAL (
                   SELECT CASE
                       WHEN g.pos = 0 OR g.pos = g.nn THEN 0.0
                       ELSE -(g.pos / g.cnt) * ln(g.pos / g.cnt)
                            - ((g.cnt - g.pos) / g.cnt)
                              * ln((g.cnt - g.pos) / g.cnt)
                   END AS h_cond
               )
           ), 6) AS info_gain
    FROM hy"""
        )
    return f"""
    WITH j AS (
        SELECT o.o_orderpriority, o.o_orderstatus, c.c_mktsegment,
               CASE WHEN o.o_totalprice > 150000 THEN 1 ELSE 0 END AS y
        FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
    ),
    t AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM j),
    hy AS (
        SELECT CASE WHEN p = 0 OR p = 1 THEN 0.0
                    ELSE -p * ln(p) - (1 - p) * ln(1 - p) END AS h
        FROM (SELECT avg(CAST(y AS DOUBLE)) AS p FROM j)
    )
    SELECT * FROM ({" UNION ALL ".join(parts)}) ORDER BY feature
    """


@query("information_gain_features", _duck_ig_sql())
def information_gain_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature selection by information gain: H(label) - H(label |
    feature) for each candidate categorical feature against the
    high-value-order label (totalprice > 150k) — the decision-tree
    split criterion run as a batch audit. ONE joined scan feeds every
    feature's contingency aggregation; entropies are computed on the
    per-value rollups (each at most a few rows). The feature-
    selection twin of mutual_information_priority_segment (IG against
    a LABEL; MI between two features)."""
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    j = (
        o.join(
            F.broadcast(c.select("c_custkey", "c_mktsegment")),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .select(
            "o_orderpriority",
            "o_orderstatus",
            "c_mktsegment",
            (F.col("o_totalprice") > 150000).cast("int").alias("y"),
        )
        .persist()
    )
    tot = j.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.avg(F.col("y").cast("double")).alias("p"),
    )
    h_label = F.when(
        (F.col("p") == 0) | (F.col("p") == 1), F.lit(0.0)
    ).otherwise(
        -F.col("p") * F.log(F.col("p"))
        - (1 - F.col("p")) * F.log(1 - F.col("p"))
    )
    outs = []
    for feat in _IG_FEATURES:
        g = j.groupBy(F.col(feat).alias("v")).agg(
            F.count(F.lit(1)).cast("double").alias("cnt"),
            F.sum(F.when(F.col("y") == 1, F.lit(1.0)).otherwise(F.lit(0.0))).alias(
                "pos"
            ),
            F.count(F.lit(1)).alias("nn"),
        )
        pp = F.col("pos") / F.col("cnt")
        h_cond = F.when(
            (F.col("pos") == 0) | (F.col("pos") == F.col("nn")), F.lit(0.0)
        ).otherwise(-pp * F.log(pp) - (1 - pp) * F.log(1 - pp))
        cond = g.crossJoin(F.broadcast(tot)).agg(
            F.sum(F.col("cnt") / F.col("n") * h_cond).alias("h_cond_total")
        )
        outs.append(
            cond.crossJoin(F.broadcast(tot))
            .select(
                F.lit(feat).alias("feature"),
                F.round(h_label, 6).alias("h_label"),
                F.round(h_label - F.col("h_cond_total"), 6).alias("info_gain"),
            )
        )
    out = outs[0]
    for x in outs[1:]:
        out = out.unionByName(x)
    return out.orderBy("feature")


@query(
    "conversion_latency_stats",
    """
    WITH firsts AS (
        SELECT user_id,
               min(CASE WHEN event_type = 'view' THEN ts END) AS first_view,
               min(CASE WHEN event_type = 'purchase' THEN ts END) AS first_buy
        FROM events GROUP BY user_id
    ),
    lat AS (
        SELECT user_id,
               CAST(datediff('second', first_view, first_buy) AS BIGINT)
                   AS latency_s
        FROM firsts
        WHERE first_view IS NOT NULL AND first_buy IS NOT NULL
          AND first_buy >= first_view
    )
    SELECT CAST(count(*) AS BIGINT) AS n_converted,
           CAST(min(latency_s) AS BIGINT) AS min_s,
           round(quantile_cont(latency_s, 0.5), 4) AS p50_s,
           round(quantile_cont(latency_s, 0.9), 4) AS p90_s,
           CAST(max(latency_s) AS BIGINT) AS max_s,
           round(avg(latency_s), 4) AS mean_s
    FROM lat
    """,
)
def conversion_latency_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-to-convert distribution: per user, seconds from first
    view to first purchase (users whose first purchase precedes any
    view are excluded — they converted through another door), with
    exact interpolated percentiles. One aggregation keyed by user
    collapses the stream to two timestamps per user; the percentile
    pass runs on the converted-user rollup. NTZ second-diff
    arithmetic keeps the latencies session-TZ-independent."""
    ev = _t(spark, sf_dir, "events")
    firsts = ev.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "view", F.col("ts"))).alias(
            "first_view"
        ),
        F.min(F.when(F.col("event_type") == "purchase", F.col("ts"))).alias(
            "first_buy"
        ),
    )
    lat = firsts.filter(
        F.col("first_view").isNotNull()
        & F.col("first_buy").isNotNull()
        & (F.col("first_buy") >= F.col("first_view"))
    ).select(
        # DuckDB datediff('second', ...) counts SECOND-BOUNDARY
        # crossings, not whole elapsed seconds — match with per-
        # timestamp epoch-second floors.
        (
            F.floor(win.epoch_us(F.col("first_buy")) / 1_000_000)
            - F.floor(win.epoch_us(F.col("first_view")) / 1_000_000)
        )
        .cast("long")
        .alias("latency_s")
    )
    return lat.agg(
        F.count(F.lit(1)).alias("n_converted"),
        F.min("latency_s").alias("min_s"),
        F.round(F.percentile("latency_s", F.lit(0.5)), 4).alias("p50_s"),
        F.round(F.percentile("latency_s", F.lit(0.9)), 4).alias("p90_s"),
        F.max("latency_s").alias("max_s"),
        F.round(F.avg("latency_s"), 4).alias("mean_s"),
    )


_CF_TOP_SIM = 20
_CF_TOPK = 10


@query(
    "cf_recommend_parts_c1",
    f"""
    WITH baskets AS (
        SELECT DISTINCT o.o_custkey AS u, l.l_partkey % 500 AS item
        FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
    ),
    sizes AS (SELECT u, CAST(count(*) AS BIGINT) AS n FROM baskets GROUP BY u),
    anchor AS (SELECT min(u) AS au FROM baskets),
    abasket AS (SELECT item FROM baskets, anchor WHERE u = au),
    inter AS (
        SELECT b.u, CAST(count(*) AS BIGINT) AS c
        FROM baskets b JOIN abasket a ON a.item = b.item, anchor
        WHERE b.u <> au GROUP BY b.u
    ),
    sims AS (
        SELECT i.u,
               round(CAST(i.c AS DOUBLE)
                     / ((SELECT n FROM sizes, anchor WHERE u = au)
                        + s.n - i.c), 6) AS jac
        FROM inter i JOIN sizes s ON s.u = i.u
    ),
    top_sims AS (
        SELECT u, jac FROM sims ORDER BY jac DESC, u ASC LIMIT {_CF_TOP_SIM}
    ),
    cand AS (
        SELECT b.item, round(sum(t.jac), 6) AS score,
               CAST(count(*) AS BIGINT) AS n_recommenders
        FROM baskets b JOIN top_sims t ON t.u = b.u
        WHERE b.item NOT IN (SELECT item FROM abasket)
        GROUP BY b.item
    )
    SELECT item, score, n_recommenders FROM cand
    ORDER BY score DESC, item ASC LIMIT {_CF_TOPK}
    """,
)
def cf_recommend_parts_c1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """User-based collaborative filtering for the anchor customer
    (min custkey with purchases): neighbors ranked by basket Jaccard,
    candidate part families scored by summed neighbor similarity,
    anchor's own items excluded — the memory-based twin of the
    reference's recommend entry point (EP3, ml/predict.recommend_topk)
    on behavior alone, completing the family with
    item_item_cosine_topk (item-based) and ml/recsys (model-based).
    The anchor basket and the top-{_CF_TOP_SIM} neighbor frame are
    both tiny and broadcast, so the only data-scale shuffles are the
    basket build and one intersection aggregation keyed by customer."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    baskets = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .select(
            F.col("o_custkey").alias("u"),
            (F.col("l_partkey") % 500).alias("item"),
        )
        .dropDuplicates()
        .persist()
    )
    sizes = baskets.groupBy("u").agg(F.count(F.lit(1)).alias("n"))
    anchor = baskets.agg(F.min("u").alias("au"))
    abasket = (
        baskets.crossJoin(F.broadcast(anchor))
        .filter(F.col("u") == F.col("au"))
        .select("item")
    )
    an = (
        sizes.crossJoin(F.broadcast(anchor))
        .filter(F.col("u") == F.col("au"))
        .select(F.col("n").alias("an"))
    )
    inter = (
        baskets.join(F.broadcast(abasket), "item")
        .crossJoin(F.broadcast(anchor))
        .filter(F.col("u") != F.col("au"))
        .groupBy("u")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    sims = (
        inter.join(sizes, "u")
        .crossJoin(F.broadcast(an))
        .select(
            "u",
            F.round(
                F.col("c").cast("double")
                / (F.col("an") + F.col("n") - F.col("c")),
                6,
            ).alias("jac"),
        )
    )
    top_sims = sims.orderBy(F.col("jac").desc(), F.col("u").asc()).limit(
        _CF_TOP_SIM
    )
    cand = (
        baskets.join(F.broadcast(top_sims), "u")
        .join(F.broadcast(abasket), "item", "left_anti")
        .groupBy("item")
        .agg(
            F.round(F.sum("jac"), 6).alias("score"),
            F.count(F.lit(1)).alias("n_recommenders"),
        )
    )
    return cand.orderBy(F.col("score").desc(), F.col("item").asc()).limit(_CF_TOPK)


# =====================================================================
# Tokenizer-economics audits: fertility by language, packing waste.
# =====================================================================


@query(
    "tokenizer_fertility_by_lang",
    """
    WITH toks AS (
        SELECT lang,
               CAST(length(text) AS BIGINT) AS n_chars,
               CAST(length(regexp_split_to_array(trim(text), '\\s+'))
                    AS BIGINT) AS n_tokens
        FROM documents WHERE length(trim(text)) > 0
    )
    SELECT lang,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS total_chars,
           CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
           round(CAST(sum(n_chars) AS DOUBLE) / sum(n_tokens), 6) AS fertility,
           round(avg(CAST(n_tokens AS DOUBLE)), 4) AS mean_tokens_per_doc
    FROM toks GROUP BY lang ORDER BY lang
    """,
)
def tokenizer_fertility_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer fertility (chars per token) by language — the
    cost-model audit every multilingual training pipeline runs before
    setting mixture weights, because a language with 2x fertility
    buys half the documents per token budget (cf. the fertility
    tables in the BLOOM/XLM-R tokenizer analyses). Whitespace
    tokenization here (the same convention as token_count_bpe's
    baseline column); one scan, one aggregation keyed by lang."""
    d = _t(spark, sf_dir, "documents")
    toks = d.filter(F.length(F.trim(F.col("text"))) > 0).select(
        "lang",
        F.length("text").cast("long").alias("n_chars"),
        F.size(F.split(F.trim(F.col("text")), r"\s+")).cast("long").alias(
            "n_tokens"
        ),
    )
    return (
        toks.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
            F.sum("n_tokens").alias("total_tokens"),
            F.round(
                F.sum("n_chars").cast("double") / F.sum("n_tokens"), 6
            ).alias("fertility"),
            F.round(F.avg(F.col("n_tokens").cast("double")), 4).alias(
                "mean_tokens_per_doc"
            ),
        )
        .orderBy("lang")
    )


_PACK_SEQ = 128  # tokens per training sequence


@query(
    "packing_efficiency_audit",
    f"""
    WITH toks AS (
        SELECT CAST(length(regexp_split_to_array(trim(text), '\\s+'))
                    AS BIGINT) AS n
        FROM documents WHERE length(trim(text)) > 0
    ),
    stats AS (
        SELECT CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(least(n, {_PACK_SEQ})) AS BIGINT) AS kept_truncate,
               CAST(sum(n) AS BIGINT) AS total_tokens
        FROM toks
    )
    SELECT 'truncate_one_per_seq' AS strategy,
           n_docs AS n_sequences,
           kept_truncate AS tokens_kept,
           CAST(n_docs * {_PACK_SEQ} - kept_truncate AS BIGINT) AS pad_tokens,
           round(1.0 - CAST(kept_truncate AS DOUBLE)
                 / (n_docs * {_PACK_SEQ}), 6) AS waste_frac
    FROM stats
    UNION ALL
    SELECT 'concat_and_chunk' AS strategy,
           CAST(ceil(CAST(total_tokens AS DOUBLE) / {_PACK_SEQ}) AS BIGINT)
               AS n_sequences,
           total_tokens AS tokens_kept,
           CAST(ceil(CAST(total_tokens AS DOUBLE) / {_PACK_SEQ})
                * {_PACK_SEQ} - total_tokens AS BIGINT) AS pad_tokens,
           round(1.0 - CAST(total_tokens AS DOUBLE)
                 / (ceil(CAST(total_tokens AS DOUBLE) / {_PACK_SEQ})
                    * {_PACK_SEQ}), 6) AS waste_frac
    FROM stats
    ORDER BY strategy
    """,
)
def packing_efficiency_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence-packing economics at seq_len={_PACK_SEQ}: token waste
    under the naive one-document-per-sequence strategy (pad or
    truncate every doc) versus concat-and-chunk packing (the
    pack_documents operator's strategy — only the final chunk pads).
    The number that justifies running the packer at all: on mixed-
    length corpora naive padding wastes 30-60% of compute. One scan,
    one aggregation; both strategies derived from the same token
    moments."""
    d = _t(spark, sf_dir, "documents")
    toks = d.filter(F.length(F.trim(F.col("text"))) > 0).select(
        F.size(F.split(F.trim(F.col("text")), r"\s+")).cast("long").alias("n")
    )
    stats = toks.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.least(F.col("n"), F.lit(_PACK_SEQ))).alias("kept_truncate"),
        F.sum("n").alias("total_tokens"),
    )
    trunc = stats.select(
        F.lit("truncate_one_per_seq").alias("strategy"),
        F.col("n_docs").alias("n_sequences"),
        F.col("kept_truncate").alias("tokens_kept"),
        (F.col("n_docs") * _PACK_SEQ - F.col("kept_truncate")).alias(
            "pad_tokens"
        ),
        F.round(
            F.lit(1.0)
            - F.col("kept_truncate").cast("double")
            / (F.col("n_docs") * _PACK_SEQ),
            6,
        ).alias("waste_frac"),
    )
    nseq = F.ceil(F.col("total_tokens").cast("double") / _PACK_SEQ)
    packed = stats.select(
        F.lit("concat_and_chunk").alias("strategy"),
        nseq.cast("long").alias("n_sequences"),
        F.col("total_tokens").alias("tokens_kept"),
        (nseq * _PACK_SEQ - F.col("total_tokens")).cast("long").alias(
            "pad_tokens"
        ),
        F.round(
            F.lit(1.0)
            - F.col("total_tokens").cast("double") / (nseq * _PACK_SEQ),
            6,
        ).alias("waste_frac"),
    )
    return trunc.unionByName(packed).orderBy("strategy")


# =====================================================================
# Round-5 promotions: the remaining oracle-expressible operators that
# were pytest-only (VERDICT r4 item 6) — G1 graph construction, G2
# hub/age/inf edge weights, J5 id-join endpoint drops, P12 year
# normalization, M1(md5)/M2 feature assembly.
# =====================================================================
_GBW_H60 = _DUCK_H60.format(args="t")


@query(
    "graph_build_weights",
    """
    WITH sup AS (SELECT s_suppkey AS sk FROM supplier),
    vh AS (SELECT 's:' || sk AS id, 'human' AS type,
                  CASE WHEN sk % 10 = 0 THEN NULL
                       ELSE 1920 + (sk * 13) % 80 END AS birth_year
           FROM sup),
    vp AS (SELECT 'p:' || p_partkey AS id, 'part' AS type,
                  CAST(NULL AS INTEGER) AS birth_year FROM part),
    v AS (SELECT * FROM vh UNION ALL SELECT * FROM vp),
    e0 AS (
        SELECT 's:' || sk AS src, 's:' || ((sk * 7) % 97 + 1) AS dst,
               CASE WHEN sk % 11 = 0 THEN 'influenced_by'
                    ELSE 'knows' END AS rel
        FROM sup
        UNION ALL
        SELECT DISTINCT 'p:' || l_partkey, 's:' || l_suppkey, 'supplied_by'
        FROM lineitem
    ),
    e AS (SELECT e0.* FROM e0
          JOIN v a ON a.id = e0.src JOIN v b ON b.id = e0.dst),
    deg AS (SELECT dst AS id, count(*) AS ind FROM e GROUP BY dst),
    my AS (SELECT avg(birth_year) AS m FROM v),
    w AS (
        SELECT e.rel,
               CASE WHEN e.rel = 'influenced_by' THEN CAST('infinity' AS DOUBLE)
               ELSE 1.0 + ln(coalesce(d.ind, 0) + 1) +
                    CASE WHEN sa.type = 'human' AND sb.type = 'human'
                          AND abs(coalesce(sa.birth_year, (SELECT m FROM my))
                                - coalesce(sb.birth_year, (SELECT m FROM my))) > 15
                         THEN (abs(coalesce(sa.birth_year, (SELECT m FROM my))
                                 - coalesce(sb.birth_year, (SELECT m FROM my)))
                               - 15) / 5.0
                         ELSE 0.0 END
               END AS weight
        FROM e JOIN v sa ON sa.id = e.src JOIN v sb ON sb.id = e.dst
        LEFT JOIN deg d ON d.id = e.dst)
    SELECT rel, CAST(count(*) AS BIGINT) AS n_edges,
           CAST(sum(CASE WHEN isinf(weight) THEN 1 ELSE 0 END) AS BIGINT)
               AS n_inf,
           round(avg(CASE WHEN NOT isinf(weight) THEN weight END), 6) AS mean_w,
           round(max(CASE WHEN NOT isinf(weight) THEN weight END), 6) AS max_w
    FROM w GROUP BY rel ORDER BY rel
    """,
)
def graph_build_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G1 + G2 + J5 promotion (VERDICT r4 item 6): build a typed graph
    with graph.build.build_graph (inner id joins DROP edges whose
    synthetic dst supplier doesn't exist at this SF — the reference's
    dropna-after-map), weight every surviving edge with
    graph.build.edge_weights (ln(in_degree+1) hub penalty, mean-filled
    birth-year age gap beyond 15y/5 for human-human edges, +inf for
    the blacklisted relation), and report the per-relation audit:
    edge count, inf count, mean/max finite weight. Reference:
    transformer.py:279-349 (construction), core/algorithms/
    bfs.py:15-90 (weights)."""
    from social_link_prediction_spark.graph import build as gbuild

    sup = _t(spark, sf_dir, "supplier").select(F.col("s_suppkey").alias("sk"))
    part = _t(spark, sf_dir, "part")
    li = _t(spark, sf_dir, "lineitem")
    nodes = (
        sup.select(
            F.concat(F.lit("s:"), F.col("sk")).alias("id"),
            F.lit("human").alias("type"),
            F.when(F.col("sk") % 10 == 0, F.lit(None)).otherwise(
                F.lit(1920) + (F.col("sk") * 13) % 80
            ).cast("int").alias("birth_year"),
        )
        .unionByName(
            part.select(
                F.concat(F.lit("p:"), F.col("p_partkey")).alias("id"),
                F.lit("part").alias("type"),
                F.lit(None).cast("int").alias("birth_year"),
            )
        )
    )
    raw_edges = (
        sup.select(
            F.concat(F.lit("s:"), F.col("sk")).alias("person"),
            F.concat(F.lit("s:"), (F.col("sk") * 7) % 97 + 1).alias("object"),
            F.when(F.col("sk") % 11 == 0, F.lit("influenced_by"))
            .otherwise(F.lit("knows"))
            .alias("relationship_label"),
        )
        .unionByName(
            li.select("l_partkey", "l_suppkey")
            .dropDuplicates()
            .select(
                F.concat(F.lit("p:"), F.col("l_partkey")).alias("person"),
                F.concat(F.lit("s:"), F.col("l_suppkey")).alias("object"),
                F.lit("supplied_by").alias("relationship_label"),
            )
        )
    )
    v, e = gbuild.build_graph(nodes, raw_edges)
    w = gbuild.edge_weights(v, e)
    inf = F.lit(float("inf"))
    finite_w = F.when(F.col("weight") != inf, F.col("weight"))
    return (
        w.groupBy("rel")
        .agg(
            F.count(F.lit(1)).alias("n_edges"),
            F.sum((F.col("weight") == inf).cast("long")).alias("n_inf"),
            F.round(F.avg(finite_w), 6).alias("mean_w"),
            F.round(F.max(finite_w), 6).alias("max_w"),
        )
        .orderBy("rel")
    )


@query(
    "year_feature_audit",
    """
    WITH sup AS (SELECT s_suppkey AS sk FROM supplier),
    yr AS (SELECT sk, CASE WHEN sk % 10 = 0 THEN NULL
                           ELSE 1920 + (sk * 13) % 80 END AS birth_year
           FROM sup),
    st AS (SELECT CAST(min(birth_year) AS DOUBLE) AS ymin,
                  CAST(max(birth_year) AS DOUBLE) AS ymax,
                  quantile_cont(CAST(birth_year AS DOUBLE), 0.5) AS ymed
           FROM yr),
    f AS (SELECT CASE WHEN birth_year IS NULL THEN 1 ELSE 0 END AS year_is_missing,
                 CASE WHEN st.ymax - st.ymin > 0
                      THEN (coalesce(CAST(birth_year AS DOUBLE), st.ymed) - st.ymin)
                           / (st.ymax - st.ymin)
                      ELSE 0.0 END AS year_norm
          FROM yr, st)
    SELECT year_is_missing, CAST(count(*) AS BIGINT) AS n,
           round(avg(year_norm), 6) AS mean_norm,
           round(min(year_norm), 6) AS min_norm,
           round(max(year_norm), 6) AS max_norm
    FROM f GROUP BY year_is_missing ORDER BY year_is_missing
    """,
)
def year_feature_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P12 promotion (VERDICT r4 item 6): ml.features.year_features
    (min-max normalization + exact-median fill + is_missing flag —
    reference data_processor.py:140-146's year channel) over a
    synthetic birth-year column on suppliers (every 10th missing),
    audited per missing-flag group: count and mean/min/max of the
    normalized value. The missing group's constant mean pins the
    median fill; the present group's 0/1 extremes pin the min-max."""
    from social_link_prediction_spark.ml import features as mlf

    sup = _t(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").alias("sk"),
        F.when(F.col("s_suppkey") % 10 == 0, F.lit(None))
        .otherwise(F.lit(1920) + (F.col("s_suppkey") * 13) % 80)
        .cast("int")
        .alias("birth_year"),
    )
    f = mlf.year_features(sup, "birth_year", exact_median=True)
    return (
        f.groupBy("year_is_missing")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.avg("year_norm"), 6).alias("mean_norm"),
            F.round(F.min("year_norm"), 6).alias("min_norm"),
            F.round(F.max("year_norm"), 6).alias("max_norm"),
        )
        .orderBy("year_is_missing")
    )


_FAA_DIM = 8  # md5-bucket embedding width for the assembly audit


@query(
    "feature_assembly_audit",
    f"""
    WITH d AS (SELECT doc_id, text FROM documents ORDER BY doc_id LIMIT 20),
    tok AS (SELECT doc_id, unnest({_DUCK_TOKS}) AS t FROM d),
    bk AS (SELECT doc_id, {_GBW_H60} % {_FAA_DIM} AS bucket,
                  CAST(count(*) AS DOUBLE) AS c
           FROM tok GROUP BY doc_id, bucket),
    nrm AS (SELECT doc_id, sqrt(sum(c * c)) AS nn FROM bk GROUP BY doc_id),
    idx AS (SELECT doc_id, unnest(range(0, {_FAA_DIM})) AS i FROM d),
    emb AS (SELECT idx.doc_id, idx.i,
                   coalesce(bk.c, 0.0) / nrm.nn AS val
            FROM idx JOIN nrm USING (doc_id)
            LEFT JOIN bk ON bk.doc_id = idx.doc_id AND bk.bucket = idx.i),
    scal AS (
        SELECT doc_id, {_FAA_DIM} AS i,
               CAST(len(list_filter(string_split(text, ' '), x -> x <> ''))
                    AS DOUBLE) AS val
        FROM d
        UNION ALL
        SELECT doc_id, {_FAA_DIM + 1} AS i, 1.0 AS val FROM d
    )
    SELECT doc_id, CAST(i AS INT) AS idx, round(val, 6) AS val
    FROM (SELECT * FROM emb UNION ALL SELECT * FROM scal)
    ORDER BY doc_id, idx
    """,
)
def feature_assembly_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M1(md5 twin) + M2 promotion (VERDICT r4 item 6): the hashed
    text embedding with the oracle-replayable md5 bucket hash (L2-
    normalized bucket counts — the norm is exact because counts are
    integers, so sum-of-squares incurs no float rounding) assembled
    with two scalar channels (token count, constant bias) via
    ml.features.assemble_features, exploded to (doc_id, idx, val) for
    the 20 smallest doc ids. Reference: data_processor.py:140-146's
    [embedding | scalars] concat."""
    from social_link_prediction_spark.ml import features as mlf
    from social_link_prediction_spark.pipelines.text import tokens as _toks

    docs = (
        _t(spark, sf_dir, "documents")
        .orderBy("doc_id")
        .limit(20)
        .select("doc_id", "text")
    )
    emb = mlf.hashed_text_embedding(
        docs, "text", dim=_FAA_DIM, id_col="doc_id", hash_fn="md5"
    )
    assembled = mlf.assemble_features(
        docs.join(emb, "doc_id")
        .withColumn("n_tokens", F.size(_toks("text")).cast("double"))
        .withColumn("bias", F.lit(1.0)),
        array_cols=["embedding"],
        scalar_cols=["n_tokens", "bias"],
    )
    return (
        assembled.select("doc_id", F.posexplode("features").alias("idx", "v"))
        .select("doc_id", "idx", F.round("v", 6).alias("val"))
        .orderBy("doc_id", "idx")
    )


# =====================================================================
# Round-5 new operator families: dominance (skyline), regression
# aggregates (OLS closed form), and sequential drift detection (CUSUM).
# =====================================================================
@query(
    "skyline_parts",
    """
    WITH pp AS (SELECT p_retailprice AS price, max(p_size) AS size,
                       CAST(count(*) AS BIGINT) AS n_parts
                FROM part GROUP BY p_retailprice),
    sk AS (SELECT price, size, n_parts,
                  max(size) OVER (ORDER BY price
                                  ROWS BETWEEN UNBOUNDED PRECEDING
                                  AND 1 PRECEDING) AS prevmax
           FROM pp)
    SELECT round(price, 6) AS price, size, n_parts
    FROM sk WHERE prevmax IS NULL OR size > prevmax
    ORDER BY price
    """,
)
def skyline_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2D skyline (Pareto frontier) of parts: minimize retail price,
    maximize size — a part is on the frontier iff no part is both
    cheaper-or-equal and larger (strict in one dim). The classic
    dominance query (Börzsönyi et al., ICDE 2001), Spark-shaped:

    1. per-price max size (one keyed shuffle — within equal price only
       the largest size can survive);
    2. GRID PRUNE: bucket the price axis (256 buckets from broadcast
       min/max stats), compute each bucket's max size (256-row
       aggregate), and drop every point whose size fails the running
       max over strictly-cheaper buckets — sound because any such
       point is dominated by a concrete cheaper-and-no-smaller point.
       At 100 TB this is the step that matters: the global window
       below then runs over ~frontier-sized survivors, never over
       millions of distinct prices;
    3. exact running-max window over the (tiny) survivor set.

    The oracle computes the unpruned skyline directly — equality is a
    machine check that the prune dropped only dominated points."""
    part = _t(spark, sf_dir, "part")
    pp = part.groupBy(F.col("p_retailprice").alias("price")).agg(
        F.max("p_size").alias("size"), F.count(F.lit(1)).alias("n_parts")
    )
    stats = pp.agg(
        F.min("price").alias("lo"),
        F.max("price").alias("hi"),
    )
    b = pp.crossJoin(F.broadcast(stats)).withColumn(
        "bucket",
        F.least(
            F.lit(255),
            F.floor(
                (F.col("price") - F.col("lo"))
                / ((F.col("hi") - F.col("lo")) / 256 + F.lit(1e-12))
            ).cast("int"),
        ),
    )
    bmax = (
        b.groupBy("bucket")
        .agg(F.max("size").alias("bs"))
        .withColumn(
            "runmax",
            F.max("bs").over(
                Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, -1)
            ),
        )
        .select("bucket", "runmax")
    )
    survivors = (
        b.join(F.broadcast(bmax), "bucket", "left")
        .filter(F.col("runmax").isNull() | (F.col("size") > F.col("runmax")))
        .select("price", "size", "n_parts")
    )
    w = Window.orderBy("price").rowsBetween(Window.unboundedPreceding, -1)
    return (
        survivors.withColumn("prevmax", F.max("size").over(w))
        .filter(F.col("prevmax").isNull() | (F.col("size") > F.col("prevmax")))
        .select(F.round("price", 6).alias("price"), "size", "n_parts")
        .orderBy("price")
    )


@query(
    "ols_revenue_trend",
    """
    WITH d AS (SELECT CAST(o_orderdate AS DATE) - DATE '1992-01-01' AS x,
                      CAST(round(sum(o_totalprice) * 100) AS BIGINT) AS yc
               FROM orders GROUP BY 1),
    s AS (SELECT CAST(count(*) AS BIGINT) AS n,
                 CAST(sum(x) AS BIGINT) AS sx,
                 CAST(sum(CAST(x AS BIGINT) * x) AS BIGINT) AS sxx,
                 CAST(sum(yc) AS BIGINT) AS sy,
                 CAST(sum(x * yc) AS BIGINT) AS sxy,
                 CAST(sum(yc::DECIMAL(38,0) * yc) AS DOUBLE) AS syy
          FROM d),
    f AS (SELECT n,
                 (n * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * sy)
                 / (n * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * sx) AS b,
                 (n * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * sy)
                 / sqrt((n * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * sx)
                        * (n * syy - CAST(sy AS DOUBLE) * sy)) AS r,
                 CAST(sy AS DOUBLE) AS syd, CAST(sx AS DOUBLE) AS sxd
          FROM s)
    SELECT n AS n_days,
           round(b / 100e0, 6) AS slope,
           round((syd - b * sxd) / n / 100e0, 6) AS intercept,
           round(r * r, 6) AS r2,
           round(r, 6) AS pearson_r
    FROM f
    """,
)
def ols_revenue_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Closed-form simple linear regression of daily revenue on the
    day index from INTEGER sufficient statistics (n, Σx, Σx², Σy_c,
    Σx·y_c, Σy_c² over integer-cents daily revenue) — one map-side-
    combinable aggregation at any scale, no driver math, no
    iteration. r7 hardening (the huber lesson): the old regr_* over
    float revenue let engine-order float-sum drift reach a 6dp
    rounding of a money-scale intercept; exact integer sums make the
    derived slope/intercept/r identical doubles on every engine."""
    orders = _t(spark, sf_dir, "orders")
    d = orders.groupBy(
        F.datediff(F.col("o_orderdate"), F.lit("1992-01-01").cast("date")).alias(
            "x"
        )
    ).agg(F.round(F.sum("o_totalprice") * 100).cast("long").alias("yc"))
    s = d.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").cast("long").alias("sx"),
        F.sum(F.col("x").cast("long") * F.col("x")).cast("long").alias("sxx"),
        F.sum("yc").cast("long").alias("sy"),
        F.sum(F.col("x") * F.col("yc")).cast("long").alias("sxy"),
        F.sum(F.col("yc").cast("decimal(38,0)") * F.col("yc"))
        .cast("double")
        .alias("syy"),
    )
    b = (
        F.col("n") * F.col("sxy").cast("double")
        - F.col("sx").cast("double") * F.col("sy")
    ) / (
        F.col("n") * F.col("sxx").cast("double")
        - F.col("sx").cast("double") * F.col("sx")
    )
    r = (
        F.col("n") * F.col("sxy").cast("double")
        - F.col("sx").cast("double") * F.col("sy")
    ) / F.sqrt(
        (
            F.col("n") * F.col("sxx").cast("double")
            - F.col("sx").cast("double") * F.col("sx")
        )
        * (F.col("n") * F.col("syy") - F.col("sy").cast("double") * F.col("sy"))
    )
    return s.select(
        F.col("n").alias("n_days"),
        F.round(b / 100.0, 6).alias("slope"),
        F.round(
            (F.col("sy").cast("double") - b * F.col("sx").cast("double"))
            / F.col("n")
            / 100.0,
            6,
        ).alias("intercept"),
        F.round(r * r, 6).alias("r2"),
        F.round(r, 6).alias("pearson_r"),
    )


@query(
    "cusum_changepoint",
    """
    WITH x AS (SELECT CAST(ts AS DATE) AS day, CAST(count(*) AS BIGINT) AS n
               FROM events GROUP BY day),
    st AS (SELECT avg(n) AS mu FROM x),
    s AS (SELECT day, n,
                 sum(n - (SELECT mu FROM st)) OVER (ORDER BY day
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cs
          FROM x)
    SELECT day AS changepoint_day, round(abs(cs), 6) AS cusum_peak,
           CAST((SELECT count(*) FROM x) AS BIGINT) AS n_days,
           round((SELECT mu FROM st), 6) AS mean_daily
    FROM s ORDER BY abs(cs) DESC, day LIMIT 1
    """,
)
def cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM changepoint screen on the daily event-count series: the
    cumulative sum of deviations from the global mean peaks (in
    absolute value) at the most likely level-shift point — Page's
    classic sequential drift detector, reduced to one day-keyed
    aggregation, one broadcast 1-row mean, and one ordered prefix sum
    over the (days-sized, tiny) series. The prefix sum is evaluated in
    the same day order by any engine, so the values are bit-identical
    before rounding."""
    ev = _t(spark, sf_dir, "events")
    x = ev.groupBy(F.to_date("ts").alias("day")).agg(F.count(F.lit(1)).alias("n"))
    st = x.agg(F.avg("n").alias("mu"))
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    s = (
        x.crossJoin(F.broadcast(st))
        .withColumn("cs", F.sum(F.col("n") - F.col("mu")).over(w))
    )
    nd = x.agg(F.count(F.lit(1)).alias("n_days"))
    return (
        s.crossJoin(F.broadcast(nd))
        .select(
            F.col("day").alias("changepoint_day"),
            F.round(F.abs("cs"), 6).alias("cusum_peak"),
            "n_days",
            F.round("mu", 6).alias("mean_daily"),
        )
        .orderBy(F.col("cusum_peak").desc(), "changepoint_day")
        .limit(1)
    )


@query(
    "table_fingerprint_audit",
    f"""
    WITH o AS (
        SELECT CAST(count(*) AS BIGINT) AS n_rows,
               CAST(sum({_DUCK_H60.format(args="CAST(o_orderkey AS VARCHAR), CAST(o_custkey AS VARCHAR), o_orderstatus")} % 1000000007) AS BIGINT) AS fp
        FROM orders),
    l AS (
        SELECT CAST(count(*) AS BIGINT) AS n_rows,
               CAST(sum({_DUCK_H60.format(args="CAST(l_orderkey AS VARCHAR), CAST(l_linenumber AS VARCHAR), l_returnflag")} % 1000000007) AS BIGINT) AS fp
        FROM lineitem)
    SELECT 'lineitem' AS tbl, n_rows, fp FROM l
    UNION ALL SELECT 'orders', n_rows, fp FROM o
    ORDER BY tbl
    """,
)
def table_fingerprint_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-insensitive table content fingerprints — the
    replication/CDC verification primitive: per table, row count plus
    the sum of per-row 60-bit key-column hashes (mod a prime so the
    sum stays in BIGINT). Commutative-monoid state, so the whole
    check is one map-side-combinable aggregation per table at any
    scale, comparable across engines, snapshots, and replicas without
    moving a row. The same device incremental pipelines use to prove
    a backfill reproduced the source. The int64 sum is exact to ~9e9
    rows per table (each term < 1e9); past that, fold the partial
    sums through the modulus hierarchically (two-level agg) — the
    monoid is unchanged."""
    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    P = 1_000_000_007

    def fp(df, *cols):
        return df.agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(
                mls.hash60(*[F.col(c).cast("string") for c in cols]) % P
            ).alias("fp"),
        )

    o = fp(orders, "o_orderkey", "o_custkey", "o_orderstatus").withColumn(
        "tbl", F.lit("orders")
    )
    l = fp(li, "l_orderkey", "l_linenumber", "l_returnflag").withColumn(
        "tbl", F.lit("lineitem")
    )
    return l.unionByName(o).select("tbl", "n_rows", "fp").orderBy("tbl")


@query(
    "weighted_median_price",
    """
    WITH x AS (SELECT l_extendedprice AS p, l_quantity AS q FROM lineitem),
    c AS (SELECT p, sum(q) AS w FROM x GROUP BY p),
    s AS (SELECT p, w,
                 sum(w) OVER (ORDER BY p ROWS BETWEEN UNBOUNDED PRECEDING
                              AND CURRENT ROW) AS cw,
                 (SELECT sum(w) FROM c) AS tw
          FROM c)
    SELECT round(min(p), 6) AS weighted_median_price,
           CAST((SELECT count(*) FROM c) AS BIGINT) AS n_distinct_prices,
           round(max(tw), 6) AS total_weight
    FROM s WHERE cw >= tw / 2
    """,
)
def weighted_median_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact weighted median (50th weighted percentile) of extended
    price weighted by quantity: collapse to per-price weight (one
    keyed shuffle — the heavy step), cumulative weight over the
    ordered distinct prices, first price whose cumulative weight
    crosses half the total. percentile_approx can't take weights and
    sampling breaks exactness; the per-price pre-aggregation is what
    keeps the ordered scan frontier-sized at scale."""
    li = _t(spark, sf_dir, "lineitem")
    c = li.groupBy(F.col("l_extendedprice").alias("p")).agg(
        F.sum("l_quantity").alias("w")
    )
    tot = c.agg(
        F.sum("w").alias("tw"), F.count(F.lit(1)).alias("n_distinct_prices")
    )
    # bucketed prefix sums (r8: support -> bucketed). Weights are
    # integer-valued doubles (quantity sums), so any accumulation
    # order yields the same exact cumulative values.
    s = (
        st.bucketed_prefix_sums(c, "p", ["w"], n_buckets=32)
        .select("p", F.col("cum_w").alias("cw"))
        .crossJoin(F.broadcast(tot))
    )
    return (
        s.filter(F.col("cw") >= F.col("tw") / 2)
        .agg(
            F.round(F.min("p"), 6).alias("weighted_median_price"),
            F.max("n_distinct_prices").alias("n_distinct_prices"),
            F.round(F.max("tw"), 6).alias("total_weight"),
        )
    )


@query(
    "ab_test_zscore",
    """
    WITH u AS (
        SELECT user_id, CAST(user_id % 2 AS INT) AS arm,
               CASE WHEN sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) >= 15
                    THEN 1 ELSE 0 END AS converted
        FROM events GROUP BY user_id),
    a AS (SELECT arm, CAST(count(*) AS BIGINT) AS n,
                 CAST(sum(converted) AS BIGINT) AS conv
          FROM u GROUP BY arm),
    w AS (SELECT max(CASE WHEN arm = 0 THEN n END) AS n0,
                 max(CASE WHEN arm = 0 THEN conv END) AS c0,
                 max(CASE WHEN arm = 1 THEN n END) AS n1,
                 max(CASE WHEN arm = 1 THEN conv END) AS c1
          FROM a)
    SELECT n0, c0, n1, c1,
           round(CAST(c0 AS DOUBLE) / n0, 6) AS rate_a,
           round(CAST(c1 AS DOUBLE) / n1, 6) AS rate_b,
           round(CASE WHEN c0 + c1 > 0 AND c0 + c1 < n0 + n1 THEN
                 (CAST(c1 AS DOUBLE) / n1 - CAST(c0 AS DOUBLE) / n0) /
                 sqrt((CAST(c0 + c1 AS DOUBLE) / (n0 + n1))
                      * (1 - CAST(c0 + c1 AS DOUBLE) / (n0 + n1))
                      * (1.0 / n0 + 1.0 / n1)) END, 6) AS z_score
    FROM w
    """,
)
def ab_test_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-proportion z-test over a deterministic user split (arm =
    user_id parity, conversion = 15+ purchase events, a threshold that splits the
    synthetic corpus non-degenerately; degenerate 0%/100% pools yield
    z NULL instead of a divide-by-zero): per-user
    conversion flags (one keyed aggregation — the only pass over the
    events), per-arm counts, pooled-variance z statistic. The
    experiment-readout shape every product warehouse runs daily;
    everything after the per-user rollup is driver-sized arithmetic
    expressed as a 1-row frame, not a collect."""
    ev = _t(spark, sf_dir, "events")
    u = ev.groupBy("user_id").agg(
        (
            F.sum((F.col("event_type") == "purchase").cast("int")) >= 15
        ).cast("int").alias("converted")
    ).withColumn("arm", (F.col("user_id") % 2).cast("int"))
    a = u.groupBy("arm").agg(
        F.count(F.lit(1)).alias("n"), F.sum("converted").alias("conv")
    )
    w = a.agg(
        F.max(F.when(F.col("arm") == 0, F.col("n"))).alias("n0"),
        F.max(F.when(F.col("arm") == 0, F.col("conv"))).alias("c0"),
        F.max(F.when(F.col("arm") == 1, F.col("n"))).alias("n1"),
        F.max(F.when(F.col("arm") == 1, F.col("conv"))).alias("c1"),
    )
    p_pool = (F.col("c0") + F.col("c1")).cast("double") / (F.col("n0") + F.col("n1"))
    rate_a = F.col("c0").cast("double") / F.col("n0")
    rate_b = F.col("c1").cast("double") / F.col("n1")
    return w.select(
        "n0", "c0", "n1", "c1",
        F.round(rate_a, 6).alias("rate_a"),
        F.round(rate_b, 6).alias("rate_b"),
        F.round(
            F.when(
                (F.col("c0") + F.col("c1") > 0)
                & (F.col("c0") + F.col("c1") < F.col("n0") + F.col("n1")),
                (rate_b - rate_a)
                / F.sqrt(
                    p_pool * (1 - p_pool) * (1.0 / F.col("n0") + 1.0 / F.col("n1"))
                ),
            ),
            6,
        ).alias("z_score"),
    )


@query(
    "join_ivm_nation_orders",
    """
    SELECT n.n_name AS nation, CAST(count(*) AS BIGINT) AS n_orders,
           round(sum(o.o_totalprice), 2) AS revenue
    FROM orders o
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN nation n ON n.n_nationkey = c.c_nationkey
    GROUP BY nation ORDER BY nation
    """,
)
def join_ivm_nation_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental view maintenance of a join-aggregate: the view
    V = orders ⋈ customer ⋈ nation → (nation, count, revenue) is
    maintained as BASE (orders with o_orderkey % 10 != 0) plus the
    DELTA batch (the remaining tenth) via the IVM algebra
    ΔV = Δorders ⋈ customer ⋈ nation — the delta never rescans the
    base fact table, only the (broadcast-sized) dimensions — and the
    two partial aggregates are merged by summing their mergeable
    states (count, sum). The oracle computes the full three-way join
    from scratch, so the green row is a machine proof that the
    incremental path reproduces the full recompute. At 100 TB this is
    THE nightly-pipeline shape: the base aggregate is a stored
    materialized view; only ΔV's cost recurs."""
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    nat = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name")

    def view_agg(o):
        return (
            o.join(F.broadcast(cust), o["o_custkey"] == cust["c_custkey"])
            .join(F.broadcast(nat), cust["c_nationkey"] == nat["n_nationkey"])
            .groupBy(F.col("n_name").alias("nation"))
            .agg(
                F.count(F.lit(1)).alias("n_orders"),
                F.sum("o_totalprice").alias("revenue"),
            )
        )

    base = view_agg(orders.filter(F.col("o_orderkey") % 10 != 0))
    delta = view_agg(orders.filter(F.col("o_orderkey") % 10 == 0))
    merged = (
        base.unionByName(delta)
        .groupBy("nation")
        .agg(
            F.sum("n_orders").alias("n_orders"),
            F.round(F.sum("revenue"), 2).alias("revenue"),
        )
    )
    return merged.orderBy("nation")


@query(
    "temperature_mixture_langs",
    """
    WITH m AS (SELECT lang,
                      CAST(sum(len(list_filter(string_split(text, ' '),
                                               x -> x <> ''))) AS BIGINT) AS mass
               FROM documents GROUP BY lang),
    t AS (SELECT sum(pow(CAST(mass AS DOUBLE), 1.0 / 0.7)) AS pw_sum,
                 CAST(sum(mass) AS BIGINT) AS mass_sum FROM m),
    w AS (SELECT lang, mass,
                 round(pow(CAST(mass AS DOUBLE), 1.0 / 0.7) / t.pw_sum, 6) AS weight,
                 t.mass_sum
          FROM m, t)
    SELECT lang, mass, weight,
           CAST(least(CAST(floor(0.5 * mass_sum * weight) AS BIGINT), mass)
                AS BIGINT) AS planned,
           floor(0.5 * mass_sum * weight) > mass AS capped
    FROM w ORDER BY lang
    """,
)
def temperature_mixture_langs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled language mixture (T=0.7, the mBERT/XLM-R
    exponential-smoothing curve) over per-language token mass, with a
    50%-of-corpus token budget: w_g ∝ mass_g^(1/T), planned mass
    capped at availability with the cap REPORTED (a capped group is
    repetition-bound at this temperature — the signal that decides
    whether to lower T or accept repetition). Complements the
    fixed-share mixture_rebalance_langs: that one pins target
    proportions, this one derives them from the corpus shape."""
    docs = _t(spark, sf_dir, "documents").withColumn(
        "n_tokens", F.size(ptx.tokens("text")).cast("long")
    )
    return tp.temperature_mixture_plan(
        docs, "lang", "n_tokens", temperature=0.7, budget_frac=0.5
    ).orderBy("lang")


def _duck_kmeans_sql(k: int = 4, rounds: int = 3, dim: int = 64) -> str:
    """lloyd_kmeans unrolled: hash60-seeded init, per round an argmin
    assignment (QUALIFY row_number over (sqdist, cluster)) and an
    element-wise mean recompute (parallel unnest zips value with
    position), empty clusters inheriting the previous centroid."""
    h = _DUCK_H60.format(args="CAST(vec_id AS VARCHAR), 'km'")
    sqd = f"list_sum(list_transform(range(1, {dim + 1}), i -> (e.v[i] - c.c[i]) * (e.v[i] - c.c[i])))"
    ctes = [
        f"""e AS MATERIALIZED (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    c0 AS MATERIALIZED (
        SELECT row_number() OVER (ORDER BY {h}, vec_id) - 1 AS cluster, v AS c
        FROM e QUALIFY row_number() OVER (ORDER BY {h}, vec_id) <= {k})"""
    ]
    for r in range(1, rounds + 1):
        ctes.append(
            f"""a{r} AS MATERIALIZED (
            SELECT e.vec_id, e.v, c.cluster, {sqd} AS sqdist
            FROM e CROSS JOIN c{r - 1} c
            QUALIFY row_number() OVER (PARTITION BY e.vec_id
                                       ORDER BY {sqd}, c.cluster) = 1)"""
        )
        if r < rounds:
            ctes.append(
                f"""n{r} AS MATERIALIZED (
                SELECT cluster, list(m ORDER BY i) AS c FROM (
                    SELECT cluster, i, avg(x) AS m FROM (
                        SELECT cluster, unnest(v) AS x,
                               unnest(range(1, {dim + 1})) AS i FROM a{r})
                    GROUP BY cluster, i)
                GROUP BY cluster)"""
            )
            ctes.append(
                f"""c{r} AS MATERIALIZED (
                SELECT p.cluster, coalesce(n.c, p.c) AS c
                FROM c{r - 1} p LEFT JOIN n{r} n USING (cluster))"""
            )
    body = ",\n    ".join(ctes)
    return f"""WITH {body}
    SELECT vec_id, CAST(cluster AS INT) AS cluster,
           round(sqdist, 6) AS sqdist
    FROM a{rounds} ORDER BY vec_id
    """


@query("kmeans_embeddings", _duck_kmeans_sql())
def kmeans_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lloyd's k-means (k=4, 3 fixed rounds, hash-deterministic
    seeding) over the embeddings table — true iterative clustering
    with exact cross-engine replay (contrast ivf_cell_counts' fixed
    centroids and MLlib's random init). Per round the k-row centroid
    frame broadcasts into the assignment join and the recompute is one
    (cluster, dim)-keyed mean — the corpus shuffles only for the
    k×dim-row aggregation, never for the centroids."""
    embs = _t(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").alias("v")
    )
    from social_link_prediction_spark.pipelines import similarity as psim

    out = psim.lloyd_kmeans(embs, k=4, rounds=3, id_col="vec_id", vec_col="v")
    return out.select(
        F.col("id").alias("vec_id"),
        F.col("cluster").cast("int").alias("cluster"),
        F.round("sqdist", 6).alias("sqdist"),
    ).orderBy("vec_id")


@query(
    "kaplan_meier_conversion",
    """
    WITH ends AS (SELECT max(ts) AS obs_end FROM events),
    u AS (
        SELECT user_id,
               min(CASE WHEN event_type = 'signup' THEN ts END) AS s
        FROM events GROUP BY user_id),
    p AS (
        SELECT u.user_id, u.s, min(e.ts) AS p
        FROM u JOIN events e ON e.user_id = u.user_id
             AND e.event_type = 'purchase' AND e.ts >= u.s
        WHERE u.s IS NOT NULL GROUP BY u.user_id, u.s),
    d AS (
        SELECT u.user_id,
               CASE WHEN p.p IS NOT NULL THEN 1 ELSE 0 END AS event,
               CASE WHEN p.p IS NOT NULL
                    THEN (epoch_us(p.p) - epoch_us(u.s)) // 86400000000
                    ELSE (epoch_us((SELECT obs_end FROM ends)) - epoch_us(u.s))
                         // 86400000000 END AS dur
        FROM u LEFT JOIN p ON p.user_id = u.user_id
        WHERE u.s IS NOT NULL),
    g AS (SELECT dur, CAST(count(*) AS BIGINT) AS all_n,
                 CAST(sum(event) AS BIGINT) AS d_n
          FROM d GROUP BY dur),
    r AS (SELECT dur, all_n, d_n,
                 (SELECT count(*) FROM d) -
                 coalesce(sum(all_n) OVER (ORDER BY dur
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                     AS n_risk
          FROM g),
    km AS (SELECT dur, n_risk, d_n,
                  CASE WHEN max(CASE WHEN d_n >= n_risk THEN 1 ELSE 0 END)
                            OVER wc = 1 THEN 0.0
                       ELSE exp(sum(CASE WHEN d_n < n_risk
                                    THEN ln(1 - CAST(d_n AS DOUBLE) / n_risk)
                                    END) OVER wc) END AS surv
           FROM r WHERE d_n > 0
           WINDOW wc AS (ORDER BY dur ROWS BETWEEN UNBOUNDED PRECEDING
                         AND CURRENT ROW))
    SELECT CAST(dur AS BIGINT) AS dur_days, CAST(n_risk AS BIGINT) AS n_risk,
           d_n AS n_events, round(surv, 6) AS survival
    FROM km ORDER BY dur_days
    """,
)
def kaplan_meier_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan-Meier survival curve of signup -> first subsequent
    purchase with right-censoring at the corpus observation end: the
    product-limit estimator S(t) = prod over death times t_i <= t of
    (1 - d_i / n_i), computed as exp of a cumulative sum of logs over
    the (days-sized, tiny) ordered duration table. The per-user rollup
    is the only pass over the events; censored users enter the at-risk
    denominators but never the numerators — the survival-analysis
    shape (churn, time-to-convert, hardware lifetime) that naive
    conversion rates get wrong by ignoring censoring."""
    from social_link_prediction_spark.operators.windows import epoch_us

    ev = _t(spark, sf_dir, "events")
    ends = ev.agg(F.max("ts").alias("obs_end"))
    u = (
        ev.groupBy("user_id")
        .agg(F.min(F.when(F.col("event_type") == "signup", F.col("ts"))).alias("s"))
        .filter(F.col("s").isNotNull())
    )
    p = (
        u.join(ev, "user_id")
        .filter((F.col("event_type") == "purchase") & (F.col("ts") >= F.col("s")))
        .groupBy("user_id", "s")
        .agg(F.min("ts").alias("p"))
    )
    d = (
        u.join(p.select("user_id", "p"), "user_id", "left")
        .crossJoin(F.broadcast(ends))
        .select(
            F.when(F.col("p").isNotNull(), 1).otherwise(0).alias("event"),
            F.floor(
                (
                    epoch_us(F.coalesce(F.col("p"), F.col("obs_end")))
                    - epoch_us(F.col("s"))
                )
                / 86_400_000_000
            ).alias("dur"),
        )
    )
    tot = d.agg(F.count(F.lit(1)).alias("total"))
    g = d.groupBy("dur").agg(
        F.count(F.lit(1)).alias("all_n"), F.sum("event").alias("d_n")
    )
    wprev = Window.orderBy("dur").rowsBetween(Window.unboundedPreceding, -1)
    r = (
        g.crossJoin(F.broadcast(tot))
        .withColumn(
            "n_risk",
            F.col("total") - F.coalesce(F.sum("all_n").over(wprev), F.lit(0)),
        )
    )
    wcum = Window.orderBy("dur").rowsBetween(Window.unboundedPreceding, 0)
    # a death time where d == n_at_risk drives S(t) to exactly 0; ln(0)
    # is an error (DuckDB) / NULL (Spark), so the zero is carried as an
    # explicit cumulative flag and only positive terms enter the
    # log-sum (the exp-of-summed-logs cumulative product).
    km = (
        r.filter(F.col("d_n") > 0)
        .withColumn(
            "surv",
            F.when(
                F.max(
                    (F.col("d_n") >= F.col("n_risk")).cast("int")
                ).over(wcum)
                == 1,
                F.lit(0.0),
            ).otherwise(
                F.exp(
                    F.sum(
                        F.when(
                            F.col("d_n") < F.col("n_risk"),
                            F.log(
                                F.lit(1)
                                - F.col("d_n").cast("double") / F.col("n_risk")
                            ),
                        )
                    ).over(wcum)
                )
            ),
        )
    )
    return km.select(
        F.col("dur").cast("long").alias("dur_days"),
        F.col("n_risk").cast("long").alias("n_risk"),
        F.col("d_n").alias("n_events"),
        F.round("surv", 6).alias("survival"),
    ).orderBy("dur_days")


def _duck_stationary_sql(rounds: int = 8) -> str:
    """Markov stationary distribution unrolled: empirical transition
    probabilities from consecutive same-user events, then ``rounds``
    power-iteration steps v <- vP from the uniform start."""
    ctes = [
        """pairs AS (
        SELECT event_type AS cur,
               lead(event_type) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id) AS nxt
        FROM events),
    tr AS (SELECT cur, nxt, count(*) AS n FROM pairs
           WHERE nxt IS NOT NULL GROUP BY cur, nxt),
    tp AS (SELECT cur, nxt,
                  CAST(n AS DOUBLE) / sum(n) OVER (PARTITION BY cur) AS p
           FROM tr),
    states AS (SELECT DISTINCT cur AS s FROM tr),
    v0 AS (SELECT s, 1.0 / (SELECT count(*) FROM states) AS w FROM states)"""
    ]
    for r in range(1, rounds + 1):
        ctes.append(
            f"""v{r} AS (
            SELECT tp.nxt AS s, sum(v.w * tp.p) AS w
            FROM v{r - 1} v JOIN tp ON tp.cur = v.s
            GROUP BY tp.nxt)"""
        )
    body = ",\n    ".join(ctes)
    return f"""WITH {body}
    SELECT s AS event_type, round(w, 6) AS stationary_prob
    FROM v{rounds} ORDER BY s
    """


@query("markov_stationary_events", _duck_stationary_sql())
def markov_stationary_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stationary distribution of the event-type Markov chain: the
    long-run fraction of time a user's event stream spends in each
    state, via 8 power-iteration rounds v <- vP from uniform over the
    empirical transition matrix (consecutive same-user events).
    Completes the Markov family next to event_transition_matrix (the
    matrix itself) and markov_attribution (absorbing chains). The
    transition frame is |types|²-sized — broadcast into every round;
    the only corpus-sized work is the one windowed pair extraction."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = ev.select(
        F.col("event_type").alias("cur"),
        F.lead("event_type").over(w).alias("nxt"),
    ).filter(F.col("nxt").isNotNull())
    tr = pairs.groupBy("cur", "nxt").agg(F.count(F.lit(1)).alias("n"))
    wc = Window.partitionBy("cur")
    tp_ = tr.withColumn("p", F.col("n").cast("double") / F.sum("n").over(wc)).select(
        "cur", "nxt", "p"
    )
    states = tr.select(F.col("cur").alias("s")).dropDuplicates()
    n_states = states.agg(F.count(F.lit(1)).alias("k"))
    v = states.crossJoin(F.broadcast(n_states)).select(
        "s", (F.lit(1.0) / F.col("k")).alias("w")
    )
    for _ in range(8):
        v = (
            v.join(F.broadcast(tp_), v["s"] == tp_["cur"])
            .groupBy(F.col("nxt").alias("s"))
            .agg(F.sum(F.col("w") * F.col("p")).alias("w"))
        )
    return v.select(
        F.col("s").alias("event_type"), F.round("w", 6).alias("stationary_prob")
    ).orderBy("event_type")


# =====================================================================
# Statistical monitoring / hypothesis-test family (round 5 cont.):
# EWMA control chart, two-sample KS test, chi-square independence,
# t-closeness release audit. Reference analog: the reference's quality
# monitoring is ad-hoc notebook checks (NB cells around the degree
# distribution); these are the productionized equivalents every
# metrics warehouse ships next to CUSUM / seasonal-residual screens.
# =====================================================================
@query(
    "ewma_control_chart",
    """
    WITH x AS (SELECT CAST(ts AS DATE) AS day, CAST(count(*) AS BIGINT) AS n
               FROM events GROUP BY day),
    ix AS (SELECT day, n, CAST(row_number() OVER (ORDER BY day) AS BIGINT) AS t
           FROM x),
    st AS (SELECT avg(n) AS mu, stddev_pop(n) AS sigma FROM ix),
    z AS (SELECT a.day, a.n, a.t,
                 0.2 * sum(power(0.8, a.t - b.t) * b.n)
                 + power(0.8, least(a.t, 20)) * (SELECT mu FROM st) AS ewma
          FROM ix a JOIN ix b ON b.t <= a.t AND b.t > a.t - 20
          GROUP BY a.day, a.n, a.t)
    SELECT day, n AS n_events, round(ewma, 6) AS ewma,
           round(ewma - (SELECT mu FROM st), 6) AS deviation,
           CAST(CASE WHEN round(abs(ewma - (SELECT mu FROM st)), 6)
                          > round(3.0 * (SELECT sigma FROM st) * sqrt(0.2 / 1.8), 6)
                     THEN 1 ELSE 0 END AS BIGINT) AS breach
    FROM z
    ORDER BY abs(ewma - (SELECT mu FROM st)) DESC, day
    LIMIT 5
    """,
)
def ewma_control_chart(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EWMA control chart over the daily event-count series (lambda =
    0.2, L = 3): the drift detector that reacts faster than Shewhart
    and smoother than CUSUM — completing the monitoring trio next to
    cusum_changepoint and seasonal_residual_anomalies. The recursion
    Z_t = l*x_t + (1-l)*Z_{t-1} (Z_0 = mu) is evaluated in CLOSED FORM
    as a 20-term truncated geometric sum — a bounded-range self-join
    on the day index over the already-aggregated (days-sized) series,
    so the formula is engine-portable and the corpus-sized work stays
    one day-keyed count. Both engines compute the identical truncated
    sum, so values match before rounding; the breach compare happens
    on 6-dp-rounded values so a boundary case cannot flip the flag.
    Control limit uses the asymptotic EWMA sigma sqrt(l/(2-l))."""
    ev = _t(spark, sf_dir, "events")
    x = ev.groupBy(F.to_date("ts").alias("day")).agg(F.count(F.lit(1)).alias("n"))
    z = st.ewma_chart(x, "day", "n", lam=0.2, span=20, nsigma=3.0)
    return z.orderBy(F.col("_ord").desc(), "day").limit(5).drop("_ord")


@query(
    "ks_test_price_segments",
    """
    WITH v AS (
        SELECT CASE WHEN c.c_mktsegment = 'BUILDING' THEN 1 ELSE 2 END AS g,
               o.o_totalprice AS x
        FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        WHERE c.c_mktsegment IN ('BUILDING', 'MACHINERY')),
    n AS (SELECT CAST(sum(CASE WHEN g = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
                 CAST(sum(CASE WHEN g = 2 THEN 1 ELSE 0 END) AS BIGINT) AS n2
          FROM v),
    d AS (SELECT x,
                 CAST(sum(CASE WHEN g = 1 THEN 1 ELSE 0 END) AS BIGINT) AS c1,
                 CAST(sum(CASE WHEN g = 2 THEN 1 ELSE 0 END) AS BIGINT) AS c2
          FROM v GROUP BY x),
    c AS (SELECT
            CAST(sum(c1) OVER (ORDER BY x
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS a1,
            CAST(sum(c2) OVER (ORDER BY x
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS a2
          FROM d)
    SELECT round(max(abs(a1 / (SELECT n1 FROM n) - a2 / (SELECT n2 FROM n))), 6)
               AS ks_d,
           (SELECT n1 FROM n) AS n1, (SELECT n2 FROM n) AS n2,
           round(sqrt((SELECT n1 FROM n) * (SELECT n2 FROM n)
                      / CAST((SELECT n1 FROM n) + (SELECT n2 FROM n) AS DOUBLE))
                 * max(abs(a1 / (SELECT n1 FROM n) - a2 / (SELECT n2 FROM n))), 6)
               AS ks_scaled
    FROM c
    """,
)
def ks_test_price_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov test: does order value distribute
    the same for BUILDING vs MACHINERY customers? D = max |F1 - F2|
    over the pooled value axis, evaluated exactly: group by distinct
    value (so ties never expose an intermediate CDF state), one
    ordered cumulative window for both groups' counts sharing a
    single sort, then a max-aggregate. ks_scaled = sqrt(n1*n2/(n1+n2))
    * D is the statistic the asymptotic Kolmogorov distribution
    consumes. Scale shape: the only global-ordered window runs over
    DISTINCT values; the 100 TB variant buckets the axis first (same
    shape as histogram/sketch_quantiles) and bounds D within one
    bucket width — documented, not needed at these tiers."""
    o = _t(spark, sf_dir, "orders")
    cst = _t(spark, sf_dir, "customer")
    v = (
        o.join(cst, o["o_custkey"] == cst["c_custkey"])
        .filter(F.col("c_mktsegment").isin("BUILDING", "MACHINERY"))
        .select(
            F.when(F.col("c_mktsegment") == "BUILDING", 1).otherwise(2).alias("g"),
            F.col("o_totalprice").alias("x"),
        )
    )
    return st.ks_two_sample(v, "g", "x")


@query(
    "chi2_priority_segment",
    """
    WITH j AS (SELECT o.o_orderpriority AS pri, c.c_mktsegment AS seg
               FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey),
    o AS (SELECT pri, seg, CAST(count(*) AS BIGINT) AS obs FROM j GROUP BY pri, seg),
    r AS (SELECT pri, CAST(count(*) AS BIGINT) AS rn FROM j GROUP BY pri),
    c AS (SELECT seg, CAST(count(*) AS BIGINT) AS cn FROM j GROUP BY seg),
    t AS (SELECT CAST(count(*) AS BIGINT) AS n FROM j),
    cells AS (SELECT r.pri, c.seg, r.rn, c.cn,
                     COALESCE(o.obs, 0) AS obs,
                     r.rn * c.cn / CAST((SELECT n FROM t) AS DOUBLE) AS exp
              FROM r CROSS JOIN c
              LEFT JOIN o ON o.pri = r.pri AND o.seg = c.seg)
    SELECT round(sum((obs - exp) * (obs - exp) / exp), 6) AS chi2,
           CAST(((SELECT count(*) FROM r) - 1)
                * ((SELECT count(*) FROM c) - 1) AS BIGINT) AS dof,
           (SELECT n FROM t) AS n_obs
    FROM cells
    """,
)
def chi2_priority_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson chi-square test of independence between order priority
    and customer market segment. Expected counts come from the
    row/column marginals (two tiny grouped frames, broadcast); the
    cell grid is their CROSS JOIN (|priorities| x |segments| = 25
    rows) LEFT-joined onto observed counts so empty cells contribute
    their full (0-E)^2/E term — the mistake most ad-hoc versions
    make. One corpus-sized join+groupBy; everything after is
    marginal-sized. Completes the dependence family next to
    mutual_information_priority_segment (effect size) with the
    significance-test statistic."""
    o = _t(spark, sf_dir, "orders")
    cst = _t(spark, sf_dir, "customer")
    j = o.join(cst, o["o_custkey"] == cst["c_custkey"]).select(
        F.col("o_orderpriority").alias("pri"), F.col("c_mktsegment").alias("seg")
    )
    return st.chi2_independence(j, "pri", "seg")


@query(
    "t_closeness_audit",
    """
    WITH c0 AS (SELECT c_nationkey, c_mktsegment,
                       CAST(floor(c_acctbal / 1000.0) AS BIGINT) AS bkt
                FROM customer),
    g AS (SELECT c_nationkey, c_mktsegment, bkt, CAST(count(*) AS BIGINT) AS cnt
          FROM c0 GROUP BY c_nationkey, c_mktsegment, bkt),
    gt AS (SELECT c_nationkey, c_mktsegment, CAST(count(*) AS BIGINT) AS gn
           FROM c0 GROUP BY c_nationkey, c_mktsegment),
    gl AS (SELECT bkt, CAST(count(*) AS BIGINT) AS gcnt FROM c0 GROUP BY bkt),
    t AS (SELECT CAST(count(*) AS BIGINT) AS n FROM c0),
    grid AS (SELECT gt.c_nationkey, gt.c_mktsegment, gt.gn, gl.bkt, gl.gcnt
             FROM gt CROSS JOIN gl),
    tv AS (SELECT grid.c_nationkey, grid.c_mktsegment, grid.gn,
                  0.5 * sum(abs(COALESCE(g.cnt, 0) / CAST(grid.gn AS DOUBLE)
                                - grid.gcnt / CAST((SELECT n FROM t) AS DOUBLE)))
                      AS tvd
           FROM grid LEFT JOIN g
             ON g.c_nationkey = grid.c_nationkey
            AND g.c_mktsegment = grid.c_mktsegment AND g.bkt = grid.bkt
           GROUP BY grid.c_nationkey, grid.c_mktsegment, grid.gn)
    SELECT c_nationkey, c_mktsegment, gn AS group_n, round(tvd, 6) AS tvd,
           CAST(CASE WHEN round(tvd, 6) > 0.35 THEN 1 ELSE 0 END AS BIGINT)
               AS breach
    FROM tv
    ORDER BY round(tvd, 6) DESC, c_nationkey, c_mktsegment
    LIMIT 5
    """,
)
def t_closeness_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """t-closeness release audit — completes the privacy triple next
    to k_anonymity_audit and l_diversity_audit: for each
    quasi-identifier group (nation x segment), the total-variation
    distance (the categorical EMD) between the group's sensitive-
    attribute distribution (account-balance 1000-bucket) and the
    global one; a group whose TVD exceeds t leaks attribute
    information even when k-anonymous. The grid CROSS JOIN of
    (QI groups x global buckets) guarantees buckets the group never
    hits still contribute |0 - p| mass. All frames after the first
    groupBy are marginal-sized and broadcast."""
    cst = _t(spark, sf_dir, "customer")
    tv = st.t_closeness(
        cst,
        ["c_nationkey", "c_mktsegment"],
        F.floor(F.col("c_acctbal") / 1000.0).cast("long"),
        threshold=0.35,
    )
    return tv.orderBy(F.col("tvd").desc(), "c_nationkey", "c_mktsegment").limit(5)


# =====================================================================
# Corpus / trend analytics family (round 5 cont.): association rules,
# PMI collocations, Heaps'-law vocabulary growth, Theil-Sen trend.
# =====================================================================
@query(
    "association_rules_items",
    f"""
    WITH baskets AS (SELECT DISTINCT l_orderkey AS basket,
                                     l_partkey % 500 AS item FROM lineitem),
    tot AS (SELECT CAST(count(DISTINCT basket) AS BIGINT) AS n FROM baskets),
    sing AS (SELECT item, CAST(count(*) AS BIGINT) AS cnt
             FROM baskets GROUP BY item),
    freq AS (SELECT item, cnt FROM sing, tot WHERE cnt >= {_FIS_MINSUP} * n),
    pruned AS (SELECT b.basket, b.item
               FROM baskets b JOIN freq f ON b.item = f.item),
    pairs AS (SELECT a.item AS ia, b.item AS ib, CAST(count(*) AS BIGINT) AS pc
              FROM pruned a JOIN pruned b
                ON a.basket = b.basket AND a.item < b.item
              GROUP BY ia, ib),
    rules AS (SELECT ia AS ante, ib AS cons, pc FROM pairs
              UNION ALL SELECT ib, ia, pc FROM pairs),
    r2 AS (SELECT ante, cons, pc, fa.cnt AS ca, fc.cnt AS cc
           FROM rules JOIN freq fa ON fa.item = ante
                      JOIN freq fc ON fc.item = cons)
    SELECT ante, cons, pc AS pair_cnt,
           round(pc * 1.0 / ca, 6) AS confidence,
           round(pc * 1.0 * (SELECT n FROM tot) / (ca * cc), 6) AS lift,
           round((1.0 - cc * 1.0 / (SELECT n FROM tot))
                 / NULLIF(1.0 - pc * 1.0 / ca, 0), 6) AS conviction
    FROM r2
    WHERE pc >= 3
    ORDER BY round(pc * 1.0 / ca, 6) DESC, ante, cons
    LIMIT 20
    """,
)
def association_rules_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Directional association rules on top of the A-Priori pair
    counts (frequent_itemsets_pairs finds the sets; this ranks the
    RULES): confidence P(cons|ante), lift, and conviction
    (1-supp(cons))/(1-conf) — the implication-strength measure that,
    unlike lift, is asymmetric. Same downward-closure prune as the
    itemset query (pairs enumerated only within frequent-singleton
    baskets, one basket-keyed shuffle both sides share); each pair
    emits both rule directions, singleton counts come back as
    broadcast joins. NULLIF guards the conviction pole at
    confidence = 1. Top 20 by 6-dp confidence, key tie-break."""
    li = _t(spark, sf_dir, "lineitem")
    baskets = li.select(
        F.col("l_orderkey").alias("basket"),
        (F.col("l_partkey") % 500).alias("item"),
    ).dropDuplicates()
    tot = baskets.agg(F.count_distinct(F.col("basket")).alias("n"))
    sing = baskets.groupBy("item").agg(F.count(F.lit(1)).alias("cnt"))
    freq = (
        sing.crossJoin(F.broadcast(tot))
        .filter(F.col("cnt") >= _FIS_MINSUP * F.col("n"))
        .select("item", "cnt")
    )
    pruned = baskets.join(F.broadcast(freq.select("item")), "item", "left_semi")
    a = pruned.select("basket", F.col("item").alias("ia"))
    b = pruned.select("basket", F.col("item").alias("ib"))
    pairs = (
        a.join(b, "basket")
        .filter(F.col("ia") < F.col("ib"))
        .groupBy("ia", "ib")
        .agg(F.count(F.lit(1)).alias("pc"))
    )
    rules = pairs.select(
        F.col("ia").alias("ante"), F.col("ib").alias("cons"), "pc"
    ).unionByName(
        pairs.select(F.col("ib").alias("ante"), F.col("ia").alias("cons"), "pc")
    )
    fa = freq.select(F.col("item").alias("ante"), F.col("cnt").alias("ca"))
    fc = freq.select(F.col("item").alias("cons"), F.col("cnt").alias("cc"))
    conf = F.col("pc").cast("double") / F.col("ca")
    return (
        rules.join(F.broadcast(fa), "ante")
        .join(F.broadcast(fc), "cons")
        .crossJoin(F.broadcast(tot))
        .filter(F.col("pc") >= 3)
        .select(
            "ante",
            "cons",
            F.col("pc").alias("pair_cnt"),
            F.round(conf, 6).alias("confidence"),
            F.round(
                F.col("pc").cast("double") * F.col("n") / (F.col("ca") * F.col("cc")),
                6,
            ).alias("lift"),
            F.round(
                (F.lit(1.0) - F.col("cc").cast("double") / F.col("n"))
                / F.nullif(F.lit(1.0) - conf, F.lit(0.0)),
                6,
            ).alias("conviction"),
        )
        .orderBy(F.col("confidence").desc(), "ante", "cons")
        .limit(20)
    )


@query(
    "collocation_pmi_bigrams",
    f"""
    WITH t AS MATERIALIZED (
        SELECT doc_id, {_DUCK_TOKS} AS toks FROM documents
    ),
    tok AS MATERIALIZED (SELECT unnest(toks) AS w FROM t),
    bg AS MATERIALIZED (
        SELECT unnest(toks[1:len(toks)-1]) AS v,
               unnest(toks[2:len(toks)]) AS w
        FROM t WHERE len(toks) >= 2
    ),
    uni AS MATERIALIZED (SELECT w, CAST(count(*) AS BIGINT) AS cw
                         FROM tok GROUP BY w),
    n AS (SELECT CAST(sum(cw) AS BIGINT) AS nt FROM uni),
    bi AS (SELECT v, w, CAST(count(*) AS BIGINT) AS cvw FROM bg GROUP BY v, w),
    nb AS (SELECT CAST(sum(cvw) AS BIGINT) AS nbg FROM bi)
    SELECT bi.v, bi.w, bi.cvw AS pair_cnt,
           round(ln((bi.cvw * 1.0 / (SELECT nbg FROM nb))
                    / ((uv.cw * 1.0 / (SELECT nt FROM n))
                       * (uw.cw * 1.0 / (SELECT nt FROM n)))), 6) AS pmi
    FROM bi JOIN uni uv ON uv.w = bi.v JOIN uni uw ON uw.w = bi.w
    WHERE bi.cvw >= 5
    ORDER BY pmi DESC, bi.v, bi.w
    LIMIT 20
    """,
)
def collocation_pmi_bigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PMI-ranked collocations: adjacent bigrams whose joint
    probability beats the independence product — the classic
    keyphrase/multiword-expression extractor (Church & Hanks 1990)
    and the signal token_cooccurrence (document-level) cannot see.
    PMI = ln(P(v,w) / (P(v)P(w))) with bigram probability over the
    bigram total and unigram probabilities over the token total; a
    count floor (>= 5) suppresses the low-frequency PMI explosion.
    Both LM tables are vocabulary-sized broadcasts; the corpus-sized
    work is one explode + two groupBys."""
    docs = _t(spark, sf_dir, "documents")
    toks = ptx.tokens("text")
    t = docs.select("doc_id", toks.alias("toks"))
    tok = t.select(F.explode("toks").alias("w"))
    bg = (
        t.filter(F.size("toks") >= 2)
        .select(
            F.explode(
                F.arrays_zip(
                    F.slice("toks", 1, F.size("toks") - 1),
                    F.slice("toks", 2, F.size("toks") - 1),
                )
            ).alias("p")
        )
        .select(F.col("p.0").alias("v"), F.col("p.1").alias("w"))
    )
    uni = tok.groupBy("w").agg(F.count(F.lit(1)).alias("cw"))
    n = uni.agg(F.sum("cw").cast("long").alias("nt"))
    bi = bg.groupBy("v", "w").agg(F.count(F.lit(1)).alias("cvw"))
    nb = bi.agg(F.sum("cvw").cast("long").alias("nbg"))
    uv = uni.select(F.col("w").alias("v"), F.col("cw").alias("cv_"))
    uw = uni.select("w", F.col("cw").alias("cw_"))
    return (
        bi.filter(F.col("cvw") >= 5)
        .join(F.broadcast(uv), "v")
        .join(F.broadcast(uw), "w")
        .crossJoin(F.broadcast(n))
        .crossJoin(F.broadcast(nb))
        .select(
            "v",
            "w",
            F.col("cvw").alias("pair_cnt"),
            F.round(
                F.log(
                    (F.col("cvw").cast("double") / F.col("nbg"))
                    / (
                        (F.col("cv_").cast("double") / F.col("nt"))
                        * (F.col("cw_").cast("double") / F.col("nt"))
                    )
                ),
                6,
            ).alias("pmi"),
        )
        .orderBy(F.col("pmi").desc(), "v", "w")
        .limit(20)
    )


@query(
    "heaps_law_vocab",
    f"""
    WITH t AS MATERIALIZED (
        SELECT doc_id, {_DUCK_TOKS} AS toks FROM documents
    ),
    dl AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS ntok,
                  CAST(ntile(10) OVER (ORDER BY doc_id) AS BIGINT) AS dec
           FROM t),
    cps AS (SELECT dec, max(doc_id) AS cp FROM dl GROUP BY dec),
    fd AS (SELECT w, min(doc_id) AS first_doc
           FROM (SELECT doc_id, unnest(toks) AS w FROM t) GROUP BY w),
    vc AS (SELECT cps.dec, cps.cp,
                  CAST(count(*) AS BIGINT) AS vocab
           FROM cps JOIN fd ON fd.first_doc <= cps.cp
           GROUP BY cps.dec, cps.cp),
    tc AS (SELECT cps.dec, CAST(sum(dl.ntok) AS BIGINT) AS tokens
           FROM cps JOIN dl ON dl.doc_id <= cps.cp GROUP BY cps.dec),
    pts AS (SELECT vc.dec, vc.cp, tc.tokens, vc.vocab
            FROM vc JOIN tc ON tc.dec = vc.dec),
    beta AS (SELECT regr_slope(ln(vocab), ln(tokens)) AS b FROM pts)
    SELECT dec AS decile, cp AS checkpoint_doc, tokens, vocab,
           round((SELECT b FROM beta), 6) AS heaps_beta
    FROM pts ORDER BY dec
    """,
)
def heaps_law_vocab(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heaps'-law vocabulary growth: V(N) ~ K * N^beta measured at 10
    corpus-prefix checkpoints (doc-id deciles), beta fitted by the
    regression-aggregate slope of ln V on ln N. The companion of
    powerlaw_gamma (Zipf exponent) for corpus planning: beta tells
    you how fast the vocabulary — and your tokenizer's OOV rate —
    grows as you scale the crawl. The only corpus-sized work is one
    explode + a (token, first_doc) min-aggregate; checkpoints are 10
    rows, so the prefix counts are broadcast range-joins against
    marginal-sized frames. The decile assignment routes through
    global_row_number + exact_ntile (range-partitioned, parallel)
    rather than ntile() OVER (ORDER BY doc_id) — that global window
    is a one-task sort of every doc_id at 100 TB (VERDICT r7 item
    2); the composed device is bit-identical to the window ntile."""
    docs = _t(spark, sf_dir, "documents")
    toks = ptx.tokens("text")
    t = docs.select("doc_id", toks.alias("toks"))
    base = t.select("doc_id", F.size("toks").cast("long").alias("ntok"))
    numbered, n_docs = win.global_row_number(base, "doc_id", out="__rn")
    dl = numbered.select(
        "doc_id", "ntok",
        win.exact_ntile(F.col("__rn"), n_docs, 10).alias("dec"),
    )
    cps = dl.groupBy(F.col("dec").alias("cdec")).agg(F.max("doc_id").alias("cp"))
    fd = (
        t.select("doc_id", F.explode("toks").alias("w"))
        .groupBy("w")
        .agg(F.min("doc_id").alias("first_doc"))
    )
    vc = (
        fd.crossJoin(F.broadcast(cps))
        .filter(F.col("first_doc") <= F.col("cp"))
        .groupBy("cdec", "cp")
        .agg(F.count(F.lit(1)).alias("vocab"))
    )
    tc = (
        dl.crossJoin(F.broadcast(cps))
        .filter(F.col("doc_id") <= F.col("cp"))
        .groupBy("cdec")
        .agg(F.sum("ntok").alias("tokens"))
    )
    pts = vc.join(tc, "cdec")
    beta = pts.agg(
        F.regr_slope(F.log("vocab"), F.log("tokens")).alias("b")
    )
    return (
        pts.crossJoin(F.broadcast(beta))
        .select(
            F.col("cdec").alias("decile"),
            F.col("cp").alias("checkpoint_doc"),
            "tokens",
            "vocab",
            F.round("b", 6).alias("heaps_beta"),
        )
        .orderBy("decile")
    )


@query(
    "theil_sen_revenue_trend",
    """
    -- integer-cents rollup (r7, the huber lesson): every pairwise
    -- slope and residual derives from exact BIGINTs, so the median
    -- SELECTIONS and the rounded outputs are engine-identical; the
    -- final /100 returns to dollars after the operator's rounding.
    WITH m AS (SELECT (year(o_orderdate) - 1995) * 12 + month(o_orderdate) - 1
                          AS mi,
                      CAST(round(sum(o_totalprice) * 100) AS BIGINT) AS rev
               FROM orders GROUP BY mi),
    p AS (SELECT (CAST(b.rev AS DOUBLE) - a.rev) / (b.mi - a.mi) AS s
          FROM m a JOIN m b ON b.mi > a.mi),
    cnt AS (SELECT CAST(count(*) AS BIGINT) AS np FROM p),
    ms AS (SELECT s FROM (SELECT s, row_number() OVER (ORDER BY s) AS rk FROM p)
           WHERE rk = CAST(floor(((SELECT np FROM cnt) + 1) / 2.0) AS BIGINT)),
    nm AS (SELECT CAST(count(*) AS BIGINT) AS n FROM m),
    res AS (SELECT rev - (SELECT s FROM ms) * mi AS r FROM m),
    mr AS (SELECT r FROM (SELECT r, row_number() OVER (ORDER BY r) AS rk FROM res)
           WHERE rk = CAST(floor(((SELECT n FROM nm) + 1) / 2.0) AS BIGINT))
    SELECT round(round((SELECT s FROM ms), 6) / 100e0, 6) AS slope,
           round(round((SELECT r FROM mr), 6) / 100e0, 6) AS intercept,
           (SELECT n FROM nm) AS n_points,
           (SELECT np FROM cnt) AS n_pairs
    """,
)
def theil_sen_revenue_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil-Sen robust monthly revenue trend — the median of all
    pairwise slopes, immune to up to ~29% outlier months where
    ols_revenue_trend chases every spike; reading both is the
    standard robustness check. The corpus-sized work is one monthly
    rollup; the pairwise frame is months² (bounded by construction —
    the aggregate-to-a-bounded-series-first discipline is exactly the
    100 TB shape). Lower-median (ceil(n/2)-th sorted element) on both
    slope and intercept so engines agree with no interpolation."""
    o = _t(spark, sf_dir, "orders")
    m = o.groupBy(
        (
            (F.year("o_orderdate") - 1995) * 12 + F.month("o_orderdate") - 1
        ).alias("mi")
    ).agg(F.round(F.sum("o_totalprice") * 100).cast("long").alias("rev"))
    ts = st.theil_sen(m, "mi", "rev")
    return ts.select(
        F.round(F.col("slope") / 100.0, 6).alias("slope"),
        F.round(F.col("intercept") / 100.0, 6).alias("intercept"),
        "n_points",
        "n_pairs",
    )


# =====================================================================
# Graph-metric + ANN-quality family (round 5 cont.): rich-club
# coefficient, directed reciprocity, IVF recall-at-k audit.
# =====================================================================
_RC_EDGE_SQL = _DUCK_H60.format(
    args="CAST(src AS VARCHAR) || '-' || CAST(dst AS VARCHAR), 'rc'"
)
_REC_EDGE_SQL = _DUCK_H60.format(
    args="CAST(src AS VARCHAR) || '-' || CAST(dst AS VARCHAR), 'rec'"
)


@query(
    "rich_club_suppliers",
    f"""
    WITH s AS (SELECT s_suppkey::BIGINT AS id FROM supplier),
    e AS MATERIALIZED (
        SELECT a.id AS src, b.id AS dst FROM s a JOIN s b ON a.id < b.id
        WHERE {_RC_EDGE_SQL} % 10000 < 400
    ),
    deg AS (SELECT id, CAST(count(*) AS BIGINT) AS deg
            FROM (SELECT src AS id FROM e UNION ALL SELECT dst FROM e)
            GROUP BY id),
    ks AS (SELECT CAST(unnest([2, 4, 6, 8]) AS BIGINT) AS k),
    rich AS (SELECT ks.k, CAST(count(*) AS BIGINT) AS n_nodes
             FROM ks JOIN deg ON deg.deg > ks.k GROUP BY ks.k),
    re AS (SELECT ks.k, CAST(count(*) AS BIGINT) AS n_edges
           FROM ks CROSS JOIN e
           JOIN deg ds ON ds.id = e.src JOIN deg dd ON dd.id = e.dst
           WHERE ds.deg > ks.k AND dd.deg > ks.k GROUP BY ks.k)
    SELECT ks.k, COALESCE(rich.n_nodes, 0) AS n_nodes,
           COALESCE(re.n_edges, 0) AS n_edges,
           round(CASE WHEN COALESCE(rich.n_nodes, 0) >= 2
                      THEN 2.0 * COALESCE(re.n_edges, 0)
                           / (rich.n_nodes * (rich.n_nodes - 1)) END, 6) AS phi
    FROM ks LEFT JOIN rich ON rich.k = ks.k LEFT JOIN re ON re.k = ks.k
    ORDER BY ks.k
    """,
)
def rich_club_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rich-club coefficient phi(k) = 2*E_k / (N_k*(N_k-1)) on the
    deterministic 4%-sampled supplier graph (h60 seed 'rc', same
    replayable device as ktruss): do high-degree nodes link to each
    other more densely than chance? The hub-interconnectivity number
    behind 'the core is an oligarchy' claims (Colizza et al. 2006).
    Scale shape: the rich set SHRINKS as k grows — degrees are one
    corpus-sized aggregation, then each threshold's subgraph check is
    an edge scan against the broadcast degree table; no per-k
    recomputation of anything corpus-sized. phi is NULL when the club
    has fewer than 2 members (undefined, not 0)."""
    sup = _t(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").cast("long").alias("id")
    )
    e = tg.sampled_edges(sup, 400, "rc")
    deg = (
        e.select(F.col("src").alias("id"))
        .unionByName(e.select(F.col("dst").alias("id")))
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    ks = spark.range(1).select(
        F.explode(F.array(*[F.lit(k) for k in (2, 4, 6, 8)])).alias("k0")
    ).select(F.col("k0").cast("long").alias("k"))
    rich = (
        ks.join(F.broadcast(deg), F.col("deg") > F.col("k"))
        .groupBy("k")
        .agg(F.count(F.lit(1)).alias("n_nodes"))
    )
    ds = deg.select(F.col("id").alias("src"), F.col("deg").alias("ds"))
    dd = deg.select(F.col("id").alias("dst"), F.col("deg").alias("dd"))
    re_ = (
        e.join(F.broadcast(ds), "src")
        .join(F.broadcast(dd), "dst")
        .crossJoin(F.broadcast(ks))
        .filter((F.col("ds") > F.col("k")) & (F.col("dd") > F.col("k")))
        .groupBy("k")
        .agg(F.count(F.lit(1)).alias("n_edges"))
    )
    return (
        ks.join(rich, "k", "left")
        .join(re_, "k", "left")
        .select(
            "k",
            F.coalesce("n_nodes", F.lit(0)).alias("n_nodes"),
            F.coalesce("n_edges", F.lit(0)).alias("n_edges"),
            F.round(
                F.when(
                    F.coalesce("n_nodes", F.lit(0)) >= 2,
                    F.lit(2.0)
                    * F.coalesce("n_edges", F.lit(0))
                    / (F.col("n_nodes") * (F.col("n_nodes") - 1)),
                ),
                6,
            ).alias("phi"),
        )
        .orderBy("k")
    )


@query(
    "reciprocity_suppliers",
    f"""
    WITH s AS (SELECT s_suppkey::BIGINT AS id FROM supplier),
    e AS MATERIALIZED (
        SELECT a.id AS src, b.id AS dst FROM s a JOIN s b ON a.id <> b.id
        WHERE {_REC_EDGE_SQL} % 10000 < 250
    ),
    r AS (SELECT e.src, e.dst,
                 CASE WHEN f.src IS NOT NULL THEN 1 ELSE 0 END AS mutual
          FROM e LEFT JOIN e f ON f.src = e.dst AND f.dst = e.src)
    SELECT CAST(count(*) AS BIGINT) AS n_edges,
           CAST(sum(mutual) AS BIGINT) AS n_reciprocal,
           round(sum(mutual) * 1.0 / count(*), 6) AS reciprocity
    FROM r
    """,
)
def reciprocity_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edge reciprocity of the 2.5%-sampled DIRECTED supplier graph
    (h60 seed 'rec', the scc_suppliers device): the fraction of
    directed edges whose reverse also exists — the dyad-census number
    that separates follower-style graphs (low r) from friendship-style
    graphs (high r). One self-join on the reversed key (the canonical-
    pair shuffle both sides share); no windows, no iteration."""
    sup = _t(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").cast("long").alias("id")
    )
    e = tg.sampled_edges(sup, 250, "rec", directed=True)
    f = e.select(F.col("dst").alias("src"), F.col("src").alias("dst"), F.lit(1).alias("m"))
    r = e.join(f, ["src", "dst"], "left")
    return r.agg(
        F.count(F.lit(1)).cast("long").alias("n_edges"),
        F.sum(F.coalesce(F.col("m"), F.lit(0))).cast("long").alias("n_reciprocal"),
        F.round(
            F.sum(F.coalesce(F.col("m"), F.lit(0))).cast("double")
            / F.count(F.lit(1)),
            6,
        ).alias("reciprocity"),
    )


def _duck_ann_recall_sql() -> str:
    cents = [
        "[" + ",".join(repr(x) for x in c) + "]::DOUBLE[]" for c in _IVF_CENTROIDS
    ]
    scores = ", ".join(
        f"list_cosine_similarity(v, {c}) AS s{i}" for i, c in enumerate(cents)
    )
    case = (
        "CASE WHEN s3 > greatest(s0, s1, s2) THEN 3 "
        "WHEN s2 > greatest(s0, s1) THEN 2 "
        "WHEN s1 > s0 THEN 1 ELSE 0 END"
    )
    q = "[" + ",".join(repr(float(x)) for x in _PQ_QUERY_VEC) + "]::DOUBLE[]"
    probes = ", ".join(str(p) for p in _ivf_probe_cells(_PQ_QUERY_VEC, 2))
    return f"""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    gt AS (SELECT vec_id FROM e
           ORDER BY list_cosine_similarity(v, {q}) DESC, vec_id LIMIT 10),
    s AS (SELECT vec_id, v, {scores} FROM e),
    cand AS (SELECT vec_id, v FROM (SELECT vec_id, v, {case} AS cell FROM s)
             WHERE cell IN ({probes})),
    ivf AS (SELECT vec_id FROM cand
            ORDER BY list_cosine_similarity(v, {q}) DESC, vec_id LIMIT 10)
    SELECT CAST(10 AS BIGINT) AS k,
           (SELECT CAST(count(*) AS BIGINT) FROM cand) AS n_candidates,
           round((SELECT count(*) FROM gt JOIN ivf USING (vec_id)) / 10.0, 6)
               AS recall_at_k
    """


@query("ann_recall_audit", None)
def ann_recall_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@10 of the IVF route (2 probed cells, exact re-rank
    within candidates) against brute-force cosine ground truth for
    the fixed query vector — the approximation-quality number every
    ANN deployment reports next to its latency win, closing the loop
    ivf_cell_counts (assignment) / ivf_silhouette_audit (boundary
    census) / ivf_pq_rerank_topk (serving) opened. Ground truth and
    the IVF shortlist are both 10-row frames; recall is their
    broadcast semi-join count over the candidate-set size. At scale
    the candidate scan is a partition prune (partitionBy(ivf_cell)),
    so the audit costs one cell-local scan plus the (sampled)
    ground-truth pass."""
    emb = _t(spark, sf_dir, "embeddings")
    qv = [float(x) for x in _PQ_QUERY_VEC]
    gt = sim.brute_force_topk(emb, qv, k=10).select("vec_id")
    cells = sim.ivf_assign(emb, _IVF_CENTROIDS)
    probes = _ivf_probe_cells(qv, 2)
    cand = cells.filter(F.col("ivf_cell").isin(probes))
    qcol = F.array([F.lit(x) for x in qv])
    ivf = (
        cand.select(
            "vec_id",
            sim.cosine_similarity(
                F.col("embedding").cast("array<double>"), qcol
            ).alias("cos"),
        )
        .orderBy(F.col("cos").desc(), "vec_id")
        .limit(10)
        .select("vec_id")
    )
    ncand = cand.agg(F.count(F.lit(1)).cast("long").alias("n_candidates"))
    hits = gt.join(F.broadcast(ivf), "vec_id").agg(
        F.count(F.lit(1)).alias("n_hits")
    )
    return (
        hits.crossJoin(F.broadcast(ncand))
        .select(
            F.lit(10).cast("long").alias("k"),
            "n_candidates",
            F.round(F.col("n_hits") / F.lit(10.0), 6).alias("recall_at_k"),
        )
    )


ORACLES["ann_recall_audit"] = _duck_ann_recall_sql()


# =====================================================================
# ML-evaluation / multiple-testing family (round 5 cont.): calibration
# reliability bins, BH-FDR screening, forecast backtest scoring.
# =====================================================================
@query(
    "calibration_reliability_bins",
    """
    WITH scored AS (
        SELECT c.c_custkey,
               1.0 / (1.0 + exp(-(c.c_acctbal / 5000.0))) AS score,
               CASE WHEN o.o_custkey IS NOT NULL THEN 1 ELSE 0 END AS label
        FROM customer c
        LEFT JOIN (SELECT DISTINCT o_custkey FROM orders) o
          ON o.o_custkey = c.c_custkey),
    b AS (SELECT CAST(least(floor(score * 10), 9) AS BIGINT) AS bin,
                 score, label FROM scored),
    bins AS (SELECT bin, CAST(count(*) AS BIGINT) AS n,
                    avg(score) AS mean_score, avg(label) AS frac_pos
             FROM b GROUP BY bin),
    g AS (SELECT sum(n * abs(mean_score - frac_pos)) / sum(n) AS ece FROM bins),
    br AS (SELECT avg((score - label) * (score - label)) AS brier FROM b)
    SELECT bin, n, round(mean_score, 6) AS mean_score,
           round(frac_pos, 6) AS frac_pos,
           round((SELECT ece FROM g), 6) AS ece,
           round((SELECT brier FROM br), 6) AS brier
    FROM bins ORDER BY bin
    """,
)
def calibration_reliability_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calibration audit for a deterministic scoring rule (logistic of
    account balance) against the has-orders label: 10 reliability
    bins (mean predicted vs empirical positive rate), expected
    calibration error, and the Brier score — the evaluation the ML
    family (AUC/AP in test_ml) doesn't cover: a model can rank
    perfectly and still be miscalibrated. One corpus-sized left
    semi-style join + one bin groupBy; ECE/Brier are 1-row broadcast
    constants on every output row."""
    cst = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").select("o_custkey").dropDuplicates()
    scored = (
        cst.join(o, cst["c_custkey"] == o["o_custkey"], "left")
        .select(
            (F.lit(1.0) / (F.lit(1.0) + F.exp(-(F.col("c_acctbal") / 5000.0)))).alias(
                "score"
            ),
            F.when(F.col("o_custkey").isNotNull(), 1).otherwise(0).alias("label"),
        )
    )
    b = scored.select(
        F.least(F.floor(F.col("score") * 10), F.lit(9)).cast("long").alias("bin"),
        "score",
        "label",
    )
    bins = b.groupBy("bin").agg(
        F.count(F.lit(1)).alias("n"),
        F.avg("score").alias("mean_score"),
        F.avg("label").alias("frac_pos"),
    )
    g = bins.agg(
        (
            F.sum(F.col("n") * F.abs(F.col("mean_score") - F.col("frac_pos")))
            / F.sum("n")
        ).alias("ece")
    )
    br = b.agg(
        F.avg(
            (F.col("score") - F.col("label")) * (F.col("score") - F.col("label"))
        ).alias("brier")
    )
    return (
        bins.crossJoin(F.broadcast(g))
        .crossJoin(F.broadcast(br))
        .select(
            "bin",
            "n",
            F.round("mean_score", 6).alias("mean_score"),
            F.round("frac_pos", 6).alias("frac_pos"),
            F.round("ece", 6).alias("ece"),
            F.round("brier", 6).alias("brier"),
        )
        .orderBy("bin")
    )


# Abramowitz & Stegun 7.1.26 erf approximation — plain arithmetic, so
# both engines evaluate the identical expression (neither ships erf).
_AS_ERF = (
    "(1.0 - (((((1.061405429 * (1.0 / (1.0 + 0.3275911 * {x})) - 1.453152027)"
    " * (1.0 / (1.0 + 0.3275911 * {x})) + 1.421413741)"
    " * (1.0 / (1.0 + 0.3275911 * {x})) - 0.284496736)"
    " * (1.0 / (1.0 + 0.3275911 * {x})) + 0.254829592)"
    " * (1.0 / (1.0 + 0.3275911 * {x}))) * exp(-({x}) * ({x})))"
)


@query(
    "fdr_bh_nation_anomalies",
    f"""
    WITH g AS (SELECT c.c_nationkey AS nation,
                      CAST(count(*) AS BIGINT) AS n,
                      avg(o.o_totalprice) AS mu_g
               FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
               GROUP BY nation),
    gstats AS (SELECT avg(o_totalprice) AS mu, stddev_pop(o_totalprice) AS sd
             FROM orders),
    z AS (SELECT nation, n,
                 (mu_g - (SELECT mu FROM gstats))
                     / ((SELECT sd FROM gstats) / sqrt(n)) AS zval
          FROM g),
    p AS (SELECT nation, n, zval,
                 1.0 - {_AS_ERF.format(x="(abs(zval) / sqrt(2.0))")} AS pval
          FROM z),
    rk AS (SELECT nation, n, zval, pval,
                  CAST(row_number() OVER (ORDER BY pval, nation) AS BIGINT) AS rnk,
                  CAST(count(*) OVER () AS BIGINT) AS m
           FROM p),
    thr AS (SELECT COALESCE(max(rnk), 0) AS kmax FROM rk
            WHERE pval <= 0.1 * rnk / m)
    SELECT nation, n, round(zval, 6) AS z, round(pval, 6) AS p,
           CAST(CASE WHEN rnk <= (SELECT kmax FROM thr) THEN 1 ELSE 0 END
                AS BIGINT) AS rejected
    FROM rk ORDER BY rnk
    """,
)
def fdr_bh_nation_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benjamini-Hochberg FDR screening over per-nation mean order
    values: one z-test per nation against the global mean, p-values
    via the Abramowitz-Stegun erf polynomial (identical arithmetic on
    both engines — neither ships erf), then the BH step-up: reject
    every hypothesis ranked at or below the LARGEST k with
    p_(k) <= q*k/m (q = 0.1). The multiple-testing discipline the
    per-group anomaly screens (event_rate_anomalies,
    seasonal_residual_anomalies) skip — 25 simultaneous tests at
    alpha 0.1 would expect 2.5 false alarms. Group stats are one
    corpus-sized aggregation; the BH pass runs on the 25-row frame."""
    o = _t(spark, sf_dir, "orders")
    cst = _t(spark, sf_dir, "customer")
    g = (
        o.join(cst, o["o_custkey"] == cst["c_custkey"])
        .groupBy(F.col("c_nationkey").alias("nation"))
        .agg(F.count(F.lit(1)).alias("n"), F.avg("o_totalprice").alias("mu_g"))
    )
    glob = o.agg(
        F.avg("o_totalprice").alias("mu"), F.stddev_pop("o_totalprice").alias("sd")
    )
    z = g.crossJoin(F.broadcast(glob)).select(
        "nation",
        "n",
        ((F.col("mu_g") - F.col("mu")) / (F.col("sd") / F.sqrt("n"))).alias("zval"),
    )
    x = F.abs(F.col("zval")) / F.sqrt(F.lit(2.0))
    t = F.lit(1.0) / (F.lit(1.0) + F.lit(0.3275911) * x)
    erf = F.lit(1.0) - (
        (
            (
                (
                    (F.lit(1.061405429) * t - F.lit(1.453152027)) * t
                    + F.lit(1.421413741)
                )
                * t
                - F.lit(0.284496736)
            )
            * t
            + F.lit(0.254829592)
        )
        * t
    ) * F.exp(-x * x)
    p = z.select("nation", "n", "zval", (F.lit(1.0) - erf).alias("pval"))
    w = Window.orderBy("pval", "nation")
    rk = p.select(
        "nation",
        "n",
        "zval",
        "pval",
        F.row_number().over(w).cast("long").alias("rnk"),
        F.count(F.lit(1)).over(Window.partitionBy()).cast("long").alias("m"),
    )
    thr = rk.filter(
        F.col("pval") <= F.lit(0.1) * F.col("rnk") / F.col("m")
    ).agg(F.coalesce(F.max("rnk"), F.lit(0)).alias("kmax"))
    return (
        rk.crossJoin(F.broadcast(thr))
        .select(
            "nation",
            "n",
            F.round("zval", 6).alias("z"),
            F.round("pval", 6).alias("p"),
            F.when(F.col("rnk") <= F.col("kmax"), 1)
            .otherwise(0)
            .cast("long")
            .alias("rejected"),
            "rnk",
        )
        .orderBy("rnk")
        .drop("rnk")
    )


@query(
    "forecast_backtest_daily",
    """
    WITH x AS (SELECT CAST(ts AS DATE) AS day, CAST(count(*) AS BIGINT) AS n
               FROM events GROUP BY day),
    e AS (SELECT a.day, a.n AS actual, f.n AS fc, m.n AS prev
          FROM x a JOIN x f ON f.day = a.day - INTERVAL 7 DAY
                   JOIN x m ON m.day = a.day - INTERVAL 1 DAY),
    base AS (SELECT avg(CAST(abs(a.n - b.n) AS DOUBLE)) AS mae1
             FROM x a JOIN x b ON b.day = a.day - INTERVAL 1 DAY)
    SELECT CAST(count(*) AS BIGINT) AS n_days_scored,
           round(avg(abs(actual - fc) * 1.0 / actual), 6) AS mape,
           round(avg(2.0 * abs(actual - fc) / (abs(actual) + abs(fc))), 6)
               AS smape,
           round(avg(CAST(abs(actual - fc) AS DOUBLE))
                 / (SELECT mae1 FROM base), 6) AS mase
    FROM e
    """,
)
def forecast_backtest_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Backtest of the seasonal-naive forecaster (predict day t with
    day t-7) on the daily event-count series: MAPE, sMAPE, and MASE
    (error scaled by the one-step-naive MAE — the scale-free metric
    that stays defined when actuals touch zero). The accuracy
    scorecard for the same baseline seasonal_residual_anomalies uses
    for alerting. Date-keyed self-joins (not row lags) so calendar
    gaps never misalign the horizon; everything after the day rollup
    is series-sized."""
    ev = _t(spark, sf_dir, "events")
    x = ev.groupBy(F.to_date("ts").alias("day")).agg(F.count(F.lit(1)).alias("n"))
    f = x.select(F.col("day").alias("fday"), F.col("n").alias("fc"))
    m = x.select(F.col("day").alias("mday"), F.col("n").alias("prev"))
    e = (
        x.join(f, F.col("fday") == F.date_sub(F.col("day"), 7))
        .join(m, F.col("mday") == F.date_sub(F.col("day"), 1))
        .select("day", F.col("n").alias("actual"), "fc", "prev")
    )
    base = (
        x.join(m, F.col("mday") == F.date_sub(F.col("day"), 1))
        .agg(
            F.avg(F.abs(F.col("n") - F.col("prev")).cast("double")).alias("mae1")
        )
    )
    return (
        e.crossJoin(F.broadcast(base))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_days_scored"),
            F.round(
                F.avg(
                    F.abs(F.col("actual") - F.col("fc"))
                    * F.lit(1.0)
                    / F.col("actual")
                ),
                6,
            ).alias("mape"),
            F.round(
                F.avg(
                    F.lit(2.0)
                    * F.abs(F.col("actual") - F.col("fc"))
                    / (F.abs("actual") + F.abs("fc"))
                ),
                6,
            ).alias("smape"),
            F.round(
                F.avg(F.abs(F.col("actual") - F.col("fc")).cast("double"))
                / F.first("mae1"),
                6,
            ).alias("mase"),
        )
    )


# =====================================================================
# Embedding-space operators (round 5 cont.): PCA top component via
# power iteration, int8 quantization error audit.
# =====================================================================
_PCA_DIM, _PCA_ROUNDS = 64, 8


def _duck_pca_sql(dim: int = _PCA_DIM, rounds: int = _PCA_ROUNDS) -> str:
    """Unrolled power iteration over the per-dim covariance matrix —
    the same chained-CTE replay device as the k-means/Markov oracles."""
    parts = [
        f"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    ix AS (SELECT CAST(unnest(range(0, {dim})) AS BIGINT) AS i),
    x AS MATERIALIZED (SELECT vec_id, i, v[i + 1] AS val FROM e, ix),
    mu AS MATERIALIZED (SELECT i, avg(val) AS m FROM x GROUP BY i),
    cx AS MATERIALIZED (
        SELECT x.vec_id, x.i, x.val - mu.m AS c FROM x JOIN mu USING (i)),
    nv AS (SELECT count(*) AS n FROM e),
    cov AS MATERIALIZED (
        SELECT a.i AS i, b.i AS j, sum(a.c * b.c) / (SELECT n FROM nv) AS cij
        FROM cx a JOIN cx b ON a.vec_id = b.vec_id GROUP BY a.i, b.i),
    v0 AS (SELECT i, 1.0 / sqrt({dim}) AS w FROM ix)"""
    ]
    # Every per-round CTE is MATERIALIZED: v{k} references u{k} twice,
    # so inlined CTEs would re-expand the whole chain 2^rounds times
    # (the planner blowup that stalls DuckDB even on tiny inputs).
    for k in range(1, rounds + 1):
        parts.append(
            f"""u{k} AS MATERIALIZED (SELECT cov.i, sum(cov.cij * v{k - 1}.w) AS u
        FROM cov JOIN v{k - 1} ON v{k - 1}.i = cov.j GROUP BY cov.i)"""
        )
        parts.append(
            f"""v{k} AS MATERIALIZED (
        SELECT i, u / (SELECT sqrt(sum(u * u)) FROM u{k}) AS w
        FROM u{k})"""
        )
    parts.append(
        f"""lam AS (SELECT sqrt(sum(u * u)) AS l FROM u{rounds})"""
    )
    return (
        ",\n    ".join(parts)
        + f"""
    SELECT i AS dim, round(w, 6) AS loading,
           round((SELECT l FROM lam), 6) AS eigenvalue
    FROM v{rounds} ORDER BY dim"""
    )


@query("pca_top_component", None)
def pca_top_component(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top principal component of the embedding corpus by power
    iteration: per-dim means, the dim x dim covariance via the
    outer-product aggregation (one (i,j)-keyed shuffle with map-side
    combine — dim² cells regardless of corpus size, THE distributed
    PCA shape), then 8 rounds of v <- C v / ||C v|| from the fixed
    uniform start vector. Eigenvalue = ||C v|| at the last round
    (Rayleigh norm). C is dim²-sized and broadcast into every round;
    no corpus-sized work after the covariance pass. The anisotropy
    diagnostic behind embedding whitening (Mu et al. 2018) and the
    first step of PCA compression for ANN. Oracle unrolls the
    identical iteration round by round."""
    emb = _t(spark, sf_dir, "embeddings")
    x = emb.select(
        "vec_id",
        F.posexplode(F.col("embedding").cast("array<double>")).alias("i", "val"),
    )
    mu = x.groupBy("i").agg(F.avg("val").alias("m"))
    cx = x.join(F.broadcast(mu), "i").select(
        "vec_id", "i", (F.col("val") - F.col("m")).alias("c")
    )
    nv = emb.agg(F.count(F.lit(1)).alias("n"))
    a = cx.select("vec_id", F.col("i").alias("ai"), F.col("c").alias("ac"))
    b = cx.select("vec_id", F.col("i").alias("bj"), F.col("c").alias("bc"))
    cov = (
        a.join(b, "vec_id")
        .groupBy(F.col("ai").alias("i"), F.col("bj").alias("j"))
        .agg(F.sum(F.col("ac") * F.col("bc")).alias("s"))
        .crossJoin(F.broadcast(nv))
        .select("i", "j", (F.col("s") / F.col("n")).alias("cij"))
        .persist()
    )
    v = spark.range(_PCA_DIM).select(
        F.col("id").alias("i"), F.lit(1.0 / _PCA_DIM**0.5).alias("w")
    )
    lam = None
    for _ in range(_PCA_ROUNDS):
        u = (
            cov.join(
                F.broadcast(v.select(F.col("i").alias("j"), "w")), "j"
            )
            .groupBy("i")
            .agg(F.sum(F.col("cij") * F.col("w")).alias("u"))
        )
        lam = u.agg(F.sqrt(F.sum(F.col("u") * F.col("u"))).alias("l"))
        v = u.crossJoin(F.broadcast(lam)).select(
            "i", (F.col("u") / F.col("l")).alias("w")
        )
        v = v.localCheckpoint()
    out = (
        v.crossJoin(F.broadcast(lam))
        .select(
            F.col("i").alias("dim"),
            F.round("w", 6).alias("loading"),
            F.round("l", 6).alias("eigenvalue"),
        )
        .orderBy("dim")
    )
    return out


ORACLES["pca_top_component"] = _duck_pca_sql()


@query(
    "int8_quant_error_audit",
    f"""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    ix AS (SELECT CAST(unnest(range(0, {_PCA_DIM})) AS BIGINT) AS i),
    x AS MATERIALIZED (SELECT vec_id, i, v[i + 1] AS val FROM e, ix),
    rng AS MATERIALIZED (
        SELECT i, min(val) AS lo, max(val) AS hi,
               (max(val) - min(val)) / 255.0 AS scale
        FROM x GROUP BY i),
    q AS (SELECT x.i, x.val, rng.lo, rng.scale,
                 least(greatest(floor((x.val - rng.lo) / rng.scale + 0.5),
                                0), 255) AS code
          FROM x JOIN rng USING (i) WHERE rng.scale > 0),
    d AS (SELECT val - (code * scale + lo) AS err FROM q)
    SELECT CAST(count(*) AS BIGINT) AS n_values,
           round(sqrt(avg(err * err)), 6) AS rmse,
           round(max(abs(err)), 6) AS max_abs_err,
           round((SELECT avg(scale) FROM rng), 6) AS mean_scale
    FROM d
    """,
)
def int8_quant_error_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-dimension asymmetric int8 quantization audit: min/max
    calibration per dim (one corpus aggregation, broadcast back),
    code = clamp(floor((x-lo)/scale + 0.5), 0, 255) — floor(x+0.5)
    instead of round() because the two engines' round() tie rules
    differ and this formula is identical arithmetic everywhere —
    then reconstruction RMSE, worst-case error, and mean step size.
    The go/no-go number for 4x-compressing an embedding corpus before
    ANN serving (error should sit near scale/sqrt(12)); the
    quantization twin of the PQ codebook family."""
    emb = _t(spark, sf_dir, "embeddings")
    x = emb.select(
        "vec_id",
        F.posexplode(F.col("embedding").cast("array<double>")).alias("i", "val"),
    )
    rng = x.groupBy("i").agg(
        F.min("val").alias("lo"),
        F.max("val").alias("hi"),
        ((F.max("val") - F.min("val")) / 255.0).alias("scale"),
    )
    q = (
        x.join(F.broadcast(rng), "i")
        .filter(F.col("scale") > 0)
        .select(
            "val",
            "lo",
            "scale",
            F.least(
                F.greatest(
                    F.floor((F.col("val") - F.col("lo")) / F.col("scale") + 0.5),
                    F.lit(0),
                ),
                F.lit(255),
            ).alias("code"),
        )
    )
    d = q.select(
        (F.col("val") - (F.col("code") * F.col("scale") + F.col("lo"))).alias("err")
    )
    ms = rng.agg(F.avg("scale").alias("mean_scale"))
    return (
        d.agg(
            F.count(F.lit(1)).cast("long").alias("n_values"),
            F.round(F.sqrt(F.avg(F.col("err") * F.col("err"))), 6).alias("rmse"),
            F.round(F.max(F.abs("err")), 6).alias("max_abs_err"),
        )
        .crossJoin(F.broadcast(ms))
        .select(
            "n_values", "rmse", "max_abs_err", F.round("mean_scale", 6).alias("mean_scale")
        )
    )


# =====================================================================
# Round-5 continuation: time-series ACF, delete-one-group jackknife,
# z-order layout audit (promotes warehouse.zorder_key into the gated
# catalog), grid-density clustering (DBSCAN via dense-cell CC).
# =====================================================================
@query(
    "acf_daily_events",
    """
    WITH x AS (SELECT CAST(ts AS DATE) AS day, CAST(count(*) AS BIGINT) AS n
               FROM events GROUP BY day),
    ix AS MATERIALIZED (
        SELECT n, CAST(row_number() OVER (ORDER BY day) AS BIGINT) AS t FROM x),
    st AS (SELECT avg(n) AS mu FROM ix),
    d AS MATERIALIZED (SELECT t, n - (SELECT mu FROM st) AS c FROM ix),
    den AS (SELECT sum(c * c) AS den FROM d),
    lags AS (SELECT CAST(unnest(range(1, 8)) AS BIGINT) AS lag),
    r AS (SELECT l.lag, sum(a.c * b.c) AS num
          FROM d a JOIN lags l ON true JOIN d b ON b.t = a.t - l.lag
          GROUP BY l.lag)
    SELECT lag, round(num / (SELECT den FROM den), 6) AS acf
    FROM r ORDER BY lag
    """,
)
def acf_daily_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample autocorrelation of the daily event-count series at lags
    1..7 — the weekly-seasonality detector that tells the monitoring
    family (EWMA / CUSUM / seasonal-residual) which period to
    deseasonalize by, and the model-identification first step of any
    ARIMA-style forecast. Estimator r_k = sum_t c_t c_{t-k} / sum c²
    (demeaned, biased denominator — the standard plug-in). The
    corpus-sized work is ONE day-keyed count; everything after runs on
    the days-sized series (lag self-join on the row index), so the
    shape is identical at 100 TB — the series length is bounded by the
    calendar, not the data."""
    ev = _t(spark, sf_dir, "events")
    x = ev.groupBy(F.to_date("ts").alias("day")).agg(F.count(F.lit(1)).alias("n"))
    ix = x.select(
        "n", F.row_number().over(Window.orderBy("day")).cast("long").alias("t")
    )
    mu = ix.agg(F.avg("n").alias("mu"))
    d = ix.crossJoin(F.broadcast(mu)).select(
        "t", (F.col("n") - F.col("mu")).alias("c")
    )
    den = d.agg(F.sum(F.col("c") * F.col("c")).alias("den"))
    lags = spark.range(1, 8).select(F.col("id").alias("lag"))
    a = d.select(F.col("t").alias("at"), F.col("c").alias("ac"))
    b = d.select(F.col("t").alias("bt"), F.col("c").alias("bc"))
    r = (
        a.crossJoin(F.broadcast(lags))
        .join(F.broadcast(b), F.col("bt") == F.col("at") - F.col("lag"))
        .groupBy("lag")
        .agg(F.sum(F.col("ac") * F.col("bc")).alias("num"))
    )
    return (
        r.crossJoin(F.broadcast(den))
        .select("lag", F.round(F.col("num") / F.col("den"), 6).alias("acf"))
        .orderBy("lag")
    )


@query(
    "jackknife_nation_ratio",
    """
    WITH g AS MATERIALIZED (
        SELECT c.c_nationkey AS nk,
               sum(CASE WHEN o.o_orderpriority = '1-URGENT'
                        THEN o.o_totalprice ELSE 0 END) AS su,
               sum(o.o_totalprice) AS st
        FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        GROUP BY c.c_nationkey),
    tot AS (SELECT sum(su) AS su, sum(st) AS st,
                   CAST(count(*) AS BIGINT) AS ng FROM g),
    th AS MATERIALIZED (
        SELECT ((SELECT su FROM tot) - g.su)
               / ((SELECT st FROM tot) - g.st) AS ti
        FROM g),
    jd AS (SELECT avg(ti) AS tdot FROM th)
    SELECT (SELECT ng FROM tot) AS n_groups,
           round((SELECT su FROM tot) / (SELECT st FROM tot), 6) AS theta,
           round((SELECT tdot FROM jd), 6) AS jk_mean,
           round(sqrt((SELECT ng FROM tot) - 1.0)
                 / sqrt(CAST((SELECT ng FROM tot) AS DOUBLE))
                 * sqrt(sum((ti - (SELECT tdot FROM jd))
                            * (ti - (SELECT tdot FROM jd)))), 6) AS jk_se
    FROM th
    """,
)
def jackknife_nation_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Delete-one-group jackknife standard error for a ratio statistic
    (urgent-order revenue share), groups = customer nations — the
    variance estimator for non-linear statistics where a plain CLT
    doesn't apply, and the deterministic sibling of the Poisson
    bootstrap (poisson_bootstrap_mean). The g leave-one-out replicas
    theta_(i) are computed from ONE per-group partial-aggregate pass
    (totals minus the group's partials, broadcast totals) — never g
    re-scans — so at 100 TB the cost is a single nation-keyed shuffle.
    SE = sqrt((g-1)/g * sum (theta_i - theta_.)²)."""
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    g = (
        o.join(c, o["o_custkey"] == c["c_custkey"])
        .groupBy("c_nationkey")
        .agg(
            F.sum(
                F.when(
                    F.col("o_orderpriority") == "1-URGENT", F.col("o_totalprice")
                ).otherwise(0.0)
            ).alias("su"),
            F.sum("o_totalprice").alias("st"),
        )
        .persist()
    )
    tot = g.agg(
        F.sum("su").alias("tsu"),
        F.sum("st").alias("tst"),
        F.count(F.lit(1)).cast("long").alias("ng"),
    )
    th = (
        g.crossJoin(F.broadcast(tot))
        .select(
            "tsu",
            "tst",
            "ng",
            ((F.col("tsu") - F.col("su")) / (F.col("tst") - F.col("st"))).alias(
                "ti"
            ),
        )
        .persist()
    )
    # Two-pass sum((ti - tdot)^2) — the same direct algebra as the
    # oracle; the one-pass E[x^2] - n*mean^2 form cancels catastrophically
    # on tightly-clustered leave-one-out replicas.
    jd = th.agg(F.avg("ti").alias("tdot"))
    return (
        th.crossJoin(F.broadcast(jd))
        .groupBy("tsu", "tst", "ng", "tdot")
        .agg(
            F.sum(
                (F.col("ti") - F.col("tdot")) * (F.col("ti") - F.col("tdot"))
            ).alias("ssq")
        )
        .select(
            F.col("ng").alias("n_groups"),
            F.round(F.col("tsu") / F.col("tst"), 6).alias("theta"),
            F.round("tdot", 6).alias("jk_mean"),
            F.round(
                F.sqrt(F.col("ng") - F.lit(1.0))
                / F.sqrt(F.col("ng").cast("double"))
                * F.sqrt("ssq"),
                6,
            ).alias("jk_se"),
        )
    )


def _duck_zexpr(xcol: str, ycol: str, bits: int = 6) -> str:
    """The oracle twin of warehouse.zorder_key for two columns:
    disjoint shifted bits summed (+ == | on disjoint bits)."""
    # Each term fully parenthesized: in DuckDB `+` binds TIGHTER than
    # `<<`, so a bare `a << 0 + b << 1` parses as `(a << (0+b)) << 1`.
    terms = []
    for b in range(bits):
        terms.append(f"((({xcol} >> {b}) & 1) << {2 * b})")
        terms.append(f"((({ycol} >> {b}) & 1) << {2 * b + 1})")
    return "(" + " + ".join(terms) + ")"


_Z_FILE_ROWS = 32


def _duck_zorder_sql() -> str:
    z = _duck_zexpr("s", "pb")
    return f"""
    WITH p AS MATERIALIZED (
        SELECT p_partkey, CAST(p_size AS BIGINT) AS s,
               CAST(least(greatest(floor(p_retailprice - 900.0), 0), 63)
                    AS BIGINT) AS pb
        FROM part),
    k AS MATERIALIZED (SELECT p_partkey, s, pb, {z} AS z FROM p),
    fz AS MATERIALIZED (
        SELECT CAST(floor((row_number() OVER (ORDER BY z, p_partkey) - 1)
                    / {_Z_FILE_ROWS}.0) AS BIGINT) AS f, s, pb FROM k),
    fl AS MATERIALIZED (
        SELECT CAST(floor((row_number() OVER (ORDER BY p_partkey) - 1)
                    / {_Z_FILE_ROWS}.0) AS BIGINT) AS f, s, pb FROM k),
    sz AS (SELECT 'zorder' AS layout, f, min(s) AS lo_s, max(s) AS hi_s,
                  min(pb) AS lo_pb, max(pb) AS hi_pb FROM fz GROUP BY f),
    sl AS (SELECT 'linear' AS layout, f, min(s) AS lo_s, max(s) AS hi_s,
                  min(pb) AS lo_pb, max(pb) AS hi_pb FROM fl GROUP BY f),
    st AS MATERIALIZED (SELECT * FROM sz UNION ALL SELECT * FROM sl)
    SELECT layout, pred, CAST(count(*) AS BIGINT) AS files_total,
           CAST(sum(hit) AS BIGINT) AS files_read,
           round(sum(hit) * 1.0 / count(*), 6) AS read_frac
    FROM (
        SELECT layout, 'size_10_15' AS pred,
               CASE WHEN lo_s <= 15 AND hi_s >= 10 THEN 1 ELSE 0 END AS hit
        FROM st
        UNION ALL
        SELECT layout, 'price_5_15' AS pred,
               CASE WHEN lo_pb <= 15 AND hi_pb >= 5 THEN 1 ELSE 0 END AS hit
        FROM st)
    GROUP BY layout, pred
    ORDER BY layout, pred
    """


@query("zorder_layout_audit", None)
def zorder_layout_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-skipping audit for the Z-order (Morton) clustering layout
    (warehouse.zorder_key — the OPTIMIZE ZORDER BY primitive): lay the
    part table out in 32-row files sorted by z(p_size, price_bucket)
    vs by ingest key, collect per-file min/max column statistics (what
    parquet row groups carry), and count the files a range predicate
    on EACH dimension would have to read. Z-order reads a small
    fraction for BOTH predicates from one layout; the linear layout
    prunes neither. File assignment routes through global_row_number
    (range-partitioned parallel numbering, the real z-order writer's
    shape: repartitionByRange(z) + within-partition order + offset) —
    the previous ntile-style global window was a one-task sort of the
    whole part table, run twice (VERDICT r7 item 2 + nit 4). The
    production write path remains
    repartitionByRange(z).sortWithinPartitions(z)
    (warehouse.write_bucketed / compact_parquet)."""
    from social_link_prediction_spark.warehouse import zorder_key

    p = _t(spark, sf_dir, "part").select(
        "p_partkey",
        F.col("p_size").cast("long").alias("s"),
        F.least(
            F.greatest(F.floor(F.col("p_retailprice") - 900.0), F.lit(0)),
            F.lit(63),
        )
        .cast("long")
        .alias("pb"),
    )
    k = p.withColumn("z", zorder_key("s", "pb", bits=6)).persist()
    stats = None
    for layout, order in (
        ("zorder", ["z", "p_partkey"]),
        ("linear", ["p_partkey"]),
    ):
        numbered, _n = win.global_row_number(k, order, out="__rn")
        f = numbered.select(
            F.floor((F.col("__rn") - 1) / _Z_FILE_ROWS).alias("f"),
            "s",
            "pb",
        )
        s = f.groupBy("f").agg(
            F.min("s").alias("lo_s"),
            F.max("s").alias("hi_s"),
            F.min("pb").alias("lo_pb"),
            F.max("pb").alias("hi_pb"),
        ).select(F.lit(layout).alias("layout"), "f", "lo_s", "hi_s", "lo_pb", "hi_pb")
        stats = s if stats is None else stats.unionByName(s)
    hits = stats.select(
        "layout",
        F.lit("size_10_15").alias("pred"),
        F.when((F.col("lo_s") <= 15) & (F.col("hi_s") >= 10), 1)
        .otherwise(0)
        .alias("hit"),
    ).unionByName(
        stats.select(
            "layout",
            F.lit("price_5_15").alias("pred"),
            F.when((F.col("lo_pb") <= 15) & (F.col("hi_pb") >= 5), 1)
            .otherwise(0)
            .alias("hit"),
        )
    )
    return (
        hits.groupBy("layout", "pred")
        .agg(
            F.count(F.lit(1)).cast("long").alias("files_total"),
            F.sum("hit").cast("long").alias("files_read"),
            F.round(F.sum("hit") / F.count(F.lit(1)), 6).alias("read_frac"),
        )
        .orderBy("layout", "pred")
    )


ORACLES["zorder_layout_audit"] = _duck_zorder_sql()


_DBSCAN_MINPTS, _DBSCAN_ROUNDS = 12, 24


def _duck_grid_dbscan_sql(minpts: int = _DBSCAN_MINPTS,
                          rounds: int = _DBSCAN_ROUNDS) -> str:
    ctes = [
        f"""cells AS MATERIALIZED (
        SELECT CAST(floor((p_size - 1) / 5.0) AS BIGINT) AS cx,
               CAST(floor((p_retailprice - 900.0) / 10.0) AS BIGINT) AS cy,
               CAST(count(*) AS BIGINT) AS pts
        FROM part GROUP BY 1, 2),
    dense AS MATERIALIZED (
        SELECT cx * 100 + cy AS id, cx, cy, pts FROM cells
        WHERE pts >= {minpts}),
    e AS MATERIALIZED (
        SELECT a.id AS a, b.id AS b FROM dense a JOIN dense b
        ON abs(a.cx - b.cx) <= 1 AND abs(a.cy - b.cy) <= 1),
    l0 AS MATERIALIZED (SELECT id, id AS lbl FROM dense)"""
    ]
    for k in range(1, rounds + 1):
        ctes.append(
            f"""l{k} AS MATERIALIZED (
        SELECT e.a AS id, min(l.lbl) AS lbl
        FROM e JOIN l{k - 1} l ON l.id = e.b GROUP BY e.a)"""
        )
    body = ",\n    ".join(ctes)
    return f"""WITH {body}
    SELECT l.lbl AS cluster_id, CAST(count(*) AS BIGINT) AS n_cells,
           CAST(sum(d.pts) AS BIGINT) AS n_points
    FROM l{rounds} l JOIN dense d ON d.id = l.id
    GROUP BY l.lbl ORDER BY cluster_id
    """


@query("grid_dbscan_parts", None)
def grid_dbscan_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grid-density clustering (the distributed DBSCAN formulation):
    snap points to grid cells — (p_size, p_retailprice) here — keep
    cells with >= minpts points as core cells, and union 8-adjacent
    core cells into clusters via min-label propagation. The ONLY
    corpus-sized work is the cell-count aggregation; the cluster
    merge runs on the cells-sized frame (bounded by the grid, ~110
    cells), so at 100 TB this is one shuffle plus control-plane-sized
    iteration — the same cell-blocking idea as ivf_cell_counts and
    the standard MR-DBSCAN decomposition. 24 propagation rounds cover
    the grid's worst-case Manhattan diameter (10+11 cells) with
    margin; both engines run the identical fixed unroll, and the
    min-label lattice is monotone so extra rounds past convergence
    are no-ops (no SCC-style budget hazard). Clusters are keyed by
    their minimum cell id (cx*100+cy)."""
    p = _t(spark, sf_dir, "part")
    cells = (
        p.groupBy(
            F.floor((F.col("p_size") - 1) / 5.0).alias("cx"),
            F.floor((F.col("p_retailprice") - 900.0) / 10.0).alias("cy"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("pts"))
    )
    dense = (
        cells.filter(F.col("pts") >= _DBSCAN_MINPTS)
        .select((F.col("cx") * 100 + F.col("cy")).alias("id"), "cx", "cy", "pts")
        .persist()
    )
    a = dense.select(F.col("id").alias("a"), F.col("cx").alias("ax"), F.col("cy").alias("ay"))
    b = dense.select(F.col("id").alias("b"), F.col("cx").alias("bx"), F.col("cy").alias("by"))
    e = (
        a.join(
            F.broadcast(b),
            (F.abs(F.col("ax") - F.col("bx")) <= 1)
            & (F.abs(F.col("ay") - F.col("by")) <= 1),
        )
        .select("a", "b")
        .persist()
    )
    lbl = dense.select("id", F.col("id").alias("lbl"))
    for _ in range(_DBSCAN_ROUNDS):
        lbl = (
            e.join(F.broadcast(lbl.select(F.col("id").alias("b"), "lbl")), "b")
            .groupBy(F.col("a").alias("id"))
            .agg(F.min("lbl").alias("lbl"))
        )
        lbl = lbl.localCheckpoint()
    return (
        lbl.join(dense.select("id", "pts"), "id")
        .groupBy(F.col("lbl").alias("cluster_id"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_cells"),
            F.sum("pts").cast("long").alias("n_points"),
        )
        .orderBy("cluster_id")
    )


ORACLES["grid_dbscan_parts"] = _duck_grid_dbscan_sql()


# =====================================================================
# Round-5 continuation: Mann-Whitney rank-sum test, Spearman rank
# correlation, STL-lite seasonal decomposition (operators/stats.py).
# =====================================================================
@query(
    "mann_whitney_price_segments",
    """
    WITH v AS (
        SELECT CASE WHEN c.c_mktsegment = 'BUILDING' THEN 1 ELSE 2 END AS g,
               o.o_totalprice AS x
        FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        WHERE c.c_mktsegment IN ('BUILDING', 'MACHINERY')),
    n AS (SELECT CAST(sum(CASE WHEN g = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
                 CAST(sum(CASE WHEN g = 2 THEN 1 ELSE 0 END) AS BIGINT) AS n2
          FROM v),
    d AS (SELECT x,
                 CAST(sum(CASE WHEN g = 1 THEN 1 ELSE 0 END) AS BIGINT) AS c1,
                 CAST(count(*) AS BIGINT) AS c
          FROM v GROUP BY x),
    r AS (SELECT c1, c,
                 coalesce(sum(c) OVER (ORDER BY x
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cb
          FROM d),
    s AS (SELECT sum(c1 * (cb + (c + 1) / 2.0)) AS r1,
                 CAST(sum(c * c * c - c) AS DOUBLE) AS ties
          FROM r)
    SELECT n1, n2,
           round(r1 - n1 * (n1 + 1) / 2.0, 6) AS u1,
           round(CAST(n1 AS DOUBLE) * n2 - (r1 - n1 * (n1 + 1) / 2.0), 6) AS u2,
           round((r1 - n1 * (n1 + 1) / 2.0 - CAST(n1 AS DOUBLE) * n2 / 2.0)
                 / sqrt(CAST(n1 AS DOUBLE) * n2 / 12.0
                        * (CAST(n1 + n2 + 1 AS DOUBLE)
                           - ties / (CAST(n1 + n2 AS DOUBLE) * (n1 + n2 - 1)))),
                 6) AS z
    FROM s, n
    """,
)
def mann_whitney_price_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Whitney U rank-sum test on order totals, BUILDING vs
    MACHINERY customers — the nonparametric location test completing
    the two-sample family (ks_test_price_segments tests distribution
    shape; ab_test_zscore tests proportions; this tests a location
    shift without assuming normality, the right tool for heavy-tailed
    revenue). Tie-corrected normal approximation; average ranks come
    from one value-keyed groupBy so the ordered window runs over
    distinct values only (operators/stats.mann_whitney_u)."""
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    v = (
        o.join(c, o["o_custkey"] == c["c_custkey"])
        .filter(F.col("c_mktsegment").isin("BUILDING", "MACHINERY"))
        .select(
            F.when(F.col("c_mktsegment") == "BUILDING", 1).otherwise(2).alias("g"),
            F.col("o_totalprice").alias("x"),
        )
    )
    return st.mann_whitney_u(v, "g", "x")


@query(
    "spearman_size_price",
    """
    WITH dx AS (SELECT p_size AS v, CAST(count(*) AS BIGINT) AS c
                FROM part GROUP BY 1),
    rx AS (SELECT v,
                  coalesce(sum(c) OVER (ORDER BY v
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                  + (c + 1) / 2.0 AS rx
           FROM dx),
    dy AS (SELECT p_retailprice AS v, CAST(count(*) AS BIGINT) AS c
           FROM part GROUP BY 1),
    ry AS (SELECT v,
                  coalesce(sum(c) OVER (ORDER BY v
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                  + (c + 1) / 2.0 AS ry
           FROM dy),
    j AS (SELECT rx.rx, ry.ry FROM part p
          JOIN rx ON rx.v = p.p_size
          JOIN ry ON ry.v = p.p_retailprice)
    SELECT CAST(count(*) AS BIGINT) AS n_rows, round(corr(rx, ry), 6) AS rho
    FROM j
    """,
)
def spearman_size_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spearman rank correlation between part size and retail price —
    the monotone-association measure next to feature_correlations'
    Pearson matrix: rank-based, so outliers can't dominate and any
    monotone (not just linear) relation registers. Average ranks with
    the tie-correct convention via two distinct-value rank frames
    (window over distinct values only — the 50-value size domain
    broadcasts); rho = Pearson corr of the joined ranks
    (operators/stats.spearman_rho)."""
    p = _t(spark, sf_dir, "part").select(
        F.col("p_size").alias("x"), F.col("p_retailprice").alias("y")
    )
    out = st.spearman_rho(p, "x", "y")
    return out
