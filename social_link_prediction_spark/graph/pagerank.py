"""Iterative DataFrame PageRank (G7) and connected components.

Reference: core/ai/data_processor.py:35-107 runs igraph pagerank per
relation subgraph. Here: a join-agg loop — contributions flow along
edges (one shuffle keyed by dst per iteration), with localCheckpoint
every iteration to truncate lineage (otherwise the plan tree grows
linearly and Catalyst re-analysis dominates).

Scale notes (100 TB): pre-partition edges by src once (the join key of
every iteration) so only the small rank frame reshuffles; dangling
mass is redistributed analytically instead of via a collect-heavy fix.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    damping: float = 0.85,
    iterations: int = 10,
    src: str = "src",
    dst: str = "dst",
    broadcast_max_rows: int = 2_000_000,
) -> DataFrame:
    """Fixed-iteration PageRank over a directed edge list. Returns
    (id, pagerank). Vertices = union of endpoints. Dangling nodes'
    mass is spread uniformly each iteration (classic formulation), so
    ranks sum to 1 every round.

    When the vertex set is small (≤ broadcast_max_rows — the count is
    already computed for the 1/n seed), the per-iteration rank and
    contribution frames are broadcast-hinted: the big edge table then
    never re-sorts/re-shuffles inside the loop, and each round costs
    one contribution shuffle instead of three. Past the threshold the
    loop stays fully shuffle-based — ranks are |V| rows and must not
    be broadcast on a billion-node graph.
    """
    # Cache (lazily) the edge list up front: nodes, out-degrees, and
    # the weighted edge table all derive from it, and without this the
    # upstream plan (scans, dedups, joins) re-executes for each.
    # persist() over localCheckpoint(): same reuse once materialized,
    # but no dedicated up-front materialization job — the first reader
    # (the nodes count below) pays it as part of its own job. Lineage
    # here is one select over the input, so checkpoint's truncation
    # buys nothing.
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst")).persist()
    # ONE (id, out-degree, has-in-edge) aggregation replaces the three
    # separate setup passes the r9 shape paid (nodes dedup + count, the
    # dangling/sourceless countDistinct probe, and the out-degree
    # groupBy): ~5.9M rows shuffled in setup drops to ~2.4M at bench
    # scale and three probe jobs become one (r10; A/B 1.14x med).
    # Out-degree still attaches to the RANK frame (|V| rows), not the
    # edge table — ranks ⋈ outdeg is a small-small join, so the big
    # edge table is never materialized with an extra column and each
    # round scans the 2-column persisted edges directly.
    deg = (
        e.select(F.col("src").alias("id"), F.lit(1).alias("o"))
        .unionAll(e.select(F.col("dst").alias("id"), F.lit(0).alias("o")))
        .groupBy("id")
        .agg(
            F.sum("o").cast("long").alias("od"),
            F.max(1 - F.col("o")).alias("has_in"),
        )
        .persist()
    )
    # Dangling nodes (no out-edges) exist iff some vertex never appears
    # as a src; sourceless nodes (no in-edges) iff some vertex never
    # appears as a dst. On symmetric graphs (the common case here:
    # undirected part-supplier / co-occurrence views) neither exists,
    # and both per-iteration fixups — the dangling-mass aggregation and
    # the completeness join (nodes ⟕ contribs, a full |V| shuffle per
    # round on big directed graphs) — can be skipped. All three counts
    # read the one materialized degree frame.
    row = deg.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum((F.col("od") > 0).cast("long")).alias("n_src"),
        F.sum("has_in").cast("long").alias("n_dst"),
    ).first()
    n, n_src, n_dst = row["n"], row["n_src"], row["n_dst"]
    # |V|-sized frames get a partition count that tracks |V| (one
    # partition per ~500k rows), not the session's shuffle setting —
    # a 4k-row rank frame has no business occupying 32 shuffle
    # partitions' worth of per-round task launches and checkpoint
    # blocks, and at 1e9 vertices the same formula returns to full
    # parallelism. coalesce() narrows the shuffle read without adding
    # an exchange.
    n_part = max(1, min(e.sparkSession.sparkContext.defaultParallelism, n // 500_000 + 1))
    nodes = deg.select("id")
    outdeg = deg.filter(F.col("od") > 0).select(F.col("id").alias("src"), "od")
    has_dangling = n_src < n
    has_sourceless = n_dst < n

    small = n <= broadcast_max_rows

    def _v(df: DataFrame) -> DataFrame:
        return F.broadcast(df) if small else df

    # Checkpoint cadence. When dangling/sourceless machinery is live,
    # contribs is read twice per round (dangling-mass agg + rank join),
    # so checkpoint EVERY round — the expensive edge-join + aggregate
    # then runs exactly once per round and both readers hit
    # materialized data. On the clean fast path (symmetric graphs:
    # no dangling mass, no sourceless vertices) contribs is read once,
    # and a checkpoint's only job is lineage truncation — every 3rd
    # round is enough to keep the plan shallow while letting Spark run
    # ~3 iterations as ONE job (broadcast-exchange stages inside it).
    # Measured at sf0.1/local[32]: 13.7s -> 10.6s for 5 iterations.
    every_round = has_dangling or has_sourceless
    ranks = nodes.withColumn("pr", F.lit(1.0 / n))
    for it in range(iterations):
        r_od = ranks.withColumnRenamed("id", "src").join(outdeg, "src")
        contribs = (
            e.join(_v(r_od), "src")
            .select(F.col("dst").alias("id"), (F.col("pr") / F.col("od")).alias("c"))
            .groupBy("id")
            .agg(F.sum("c").alias("flow"))
            .coalesce(n_part)
        )
        if every_round or it % 3 == 2:
            contribs = contribs.localCheckpoint()
        if has_sourceless:
            base = nodes.join(_v(contribs), "id", "left").na.fill({"flow": 0.0})
        else:
            base = contribs
        if has_dangling:
            # Rank mass is conserved at 1.0 each round, so the dangling
            # mass (nodes without out-edges) is 1 − Σ flow — one
            # aggregation over the materialized contribs frame, no
            # anti-join scan of ranks.
            dangling = contribs.agg(
                (F.lit(1.0) - F.coalesce(F.sum("flow"), F.lit(0.0))).alias("dm")
            )
            ranks = base.crossJoin(F.broadcast(dangling)).select(
                "id",
                (
                    F.lit((1.0 - damping) / n)
                    + F.lit(damping) * (F.col("flow") + F.col("dm") / n)
                ).alias("pr"),
            )
        else:
            ranks = base.select(
                "id",
                (F.lit((1.0 - damping) / n) + F.lit(damping) * F.col("flow")).alias("pr"),
            )
    return ranks.select("id", F.col("pr").alias("pagerank"))


def personalized_pagerank(
    edges: DataFrame,
    sources: Sequence,
    damping: float = 0.85,
    iterations: int = 10,
    src: str = "src",
    dst: str = "dst",
    broadcast_max_rows: int = 2_000_000,
) -> DataFrame:
    """Personalized PageRank: the restart mass returns to ``sources``
    (uniformly) instead of spreading over all vertices — rank becomes
    proximity-to-the-seed, the standard recommendation/similarity
    centrality (what the reference's hub-penalized recommendation
    approximates locally). Same loop discipline as :func:`pagerank`:
    one contribution shuffle per round, broadcast rank frames while
    they're small, lineage kept shallow.

    Assumes every vertex has an in-edge (true for the symmetric views
    used here); on general digraphs compose with the dangling fixups
    of :func:`pagerank`.
    """
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst")).persist()
    nodes = (
        e.select(F.col("src").alias("id"))
        .unionAll(e.select(F.col("dst").alias("id")))
        .dropDuplicates()
        .cache()
    )
    n = nodes.count()
    # a typo'd / absent seed would silently contribute no restart mass
    # (the seed term applies via isin over contrib rows) and shrink
    # every rank with no error — fail loudly instead. One broadcast
    # semi-count against the already-cached nodes frame.
    n_found = nodes.filter(F.col("id").isin(list(sources))).count()
    if n_found != len(set(sources)):
        missing = set(sources) - {
            r.id for r in nodes.filter(F.col("id").isin(list(sources))).collect()
        }
        raise ValueError(
            f"personalized_pagerank: seed ids not in the edge list's "
            f"vertex set: {sorted(missing)!r}"
        )
    # degree on the rank side, not the edge side — see pagerank();
    # |V|-tracking partition count for the small frames, ditto
    n_part = max(1, min(e.sparkSession.sparkContext.defaultParallelism, n // 500_000 + 1))
    outdeg = e.groupBy("src").agg(F.count(F.lit(1)).alias("od")).coalesce(n_part).persist()

    seed_mass = 1.0 / len(sources)
    seed_col = F.when(
        F.col("id").isin(list(sources)), F.lit(seed_mass)
    ).otherwise(F.lit(0.0))

    def _v(df: DataFrame) -> DataFrame:
        return F.broadcast(df) if n <= broadcast_max_rows else df

    ranks = nodes.select("id", seed_col.alias("pr"))
    for it in range(iterations):
        r_od = ranks.withColumnRenamed("id", "src").join(outdeg, "src")
        contribs = (
            e.join(_v(r_od), "src")
            .select(F.col("dst").alias("id"), (F.col("pr") / F.col("od")).alias("c"))
            .groupBy("id")
            .agg(F.sum("c").alias("flow"))
            .coalesce(n_part)
        )
        ranks = contribs.select(
            "id",
            (
                F.when(F.col("id").isin(list(sources)), F.lit((1.0 - damping) * seed_mass))
                .otherwise(F.lit(0.0))
                + F.lit(damping) * F.col("flow")
            ).alias("pr"),
        )
        if it % 3 == 2:
            ranks = ranks.localCheckpoint()
    return ranks.select("id", F.col("pr").alias("pagerank"))


def pagerank_per_relation(
    edges: DataFrame,
    rel: str = "rel",
    damping: float = 0.85,
    iterations: int = 10,
) -> DataFrame:
    """G7 multi-view PageRank: one rank column context per relation
    label, returned long-form as (rel, id, pagerank) — pivot to the
    reference's [N x num_rels] matrix shape with groupBy(id).pivot(rel).
    Relations iterate driver-side (44 in the reference) but each loop
    body is a full-cluster job.
    """
    rels = [r[0] for r in edges.select(rel).distinct().collect()]
    out = None
    for r in sorted(rels):
        sub = edges.filter(F.col(rel) == r)
        pr = pagerank(sub, damping, iterations).withColumn("rel", F.lit(r))
        out = pr if out is None else out.unionByName(pr)
    return out.select("rel", "id", "pagerank")


def connected_components(
    edges: DataFrame, src: str = "src", dst: str = "dst", max_iterations: int = 50
) -> DataFrame:
    """Undirected connected components by alternating large-star /
    small-star (Kiveris et al., "Connected Components in MapReduce and
    Beyond"): converges in O(log n) rounds regardless of component
    diameter, unlike min-label propagation whose round count equals the
    longest chain — the degenerate case for near-dup chains of crawl
    snapshots, where duplicate chains can be arbitrarily long.

    Each round is two shuffles (one groupBy per star op) plus one cheap
    convergence aggregate. Returns (id, component) where component =
    min node id reachable, for every id appearing in the edge list.
    """
    pairs = edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
    nodes = (
        pairs.select(F.col("u").alias("id"))
        .unionAll(pairs.select(F.col("v").alias("id")))
        .dropDuplicates()
        .localCheckpoint()
    )
    e = pairs.filter(F.col("u") != F.col("v")).dropDuplicates().localCheckpoint()
    prev_sig = None
    for _ in range(max_iterations):
        # large-star: each node u attaches its strictly-larger
        # neighbors to m = min(N(u) ∪ {u}); every undirected edge is
        # emitted once, from its smaller endpoint's group
        nbrs = e.unionAll(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
        mins = nbrs.groupBy("u").agg(F.min("v").alias("mn"))
        large = (
            nbrs.join(mins, "u")
            .filter(F.col("v") > F.col("u"))
            .select(F.col("v").alias("u"), F.least("mn", F.col("u")).alias("v"))
            .filter(F.col("u") != F.col("v"))
            .dropDuplicates()
        )
        # small-star: orient big→small, then each node attaches all its
        # smaller neighbors (and itself) to the min of that set
        canon = large.select(
            F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
        )
        mins2 = canon.groupBy("u").agg(F.min("v").alias("mn"))
        joined = canon.join(mins2, "u")
        small = (
            joined.select(F.col("v").alias("u"), F.col("mn").alias("v"))
            .unionAll(joined.select("u", F.col("mn").alias("v")))
            .filter(F.col("u") != F.col("v"))
            .dropDuplicates()
            .localCheckpoint()
        )
        # type-agnostic edge-set signature (ids may be strings);
        # bit_xor can't overflow under ANSI mode, unlike sum
        sig = small.agg(
            F.count(F.lit(1)), F.bit_xor(F.xxhash64("u", "v"))
        ).collect()[0]
        e = small
        if prev_sig is not None and tuple(sig) == tuple(prev_sig):
            break
        prev_sig = sig
    # at the fixed point e is a star forest: u → component root (min id);
    # the groupBy(min) is belt-and-braces against a signature collision
    labels = e.groupBy(F.col("u").alias("id")).agg(F.min("v").alias("component"))
    roots = nodes.join(labels, "id", "left_anti").withColumn("component", F.col("id"))
    return labels.unionByName(roots)
