"""Deterministic random-walk corpus generation (DeepWalk-style).

Perozzi et al., "DeepWalk: online learning of social representations"
(KDD 2014) turns a graph into a token corpus by running short random
walks and feeding them to a word2vec-style trainer. The reference's
GNN replacement (SURVEY §7.4.3) uses wedge features instead of learned
embeddings; this operator supplies the corpus-prep half of the
embedding route so both are available.

Determinism: instead of an RNG, step t of walk w at node u picks the
neighbor v minimizing a portable arithmetic hash

    s = (1000003*w + 7919*t + 104729*v + 12345) mod p,  p = 2^31 - 1
    h = (s * s) mod p                 (mid-square mixing)

with ties broken by smaller v. Every quantity stays inside int64
(|s| < 2^31 so s*s < 2^62), the same expression evaluates identically
in Spark SQL and DuckDB, and re-runs are exactly reproducible — the
property a training-data pipeline needs from its samplers (same
rationale as ml/linksplit.hash60).

Scale shape: the frontier is one row per live walk; each step is one
join keyed on the current node (reusing the edge table's partitioning
every round, like the PageRank loop) plus a per-walk min_by aggregate.
Cost per step is O(sum of frontier-node degrees); hub nodes fan out
but the aggregate collapses back to one row per walk before the next
step. Walks at dead-end nodes (no out-edges) terminate early via the
inner join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_P = 2_147_483_647  # 2^31 - 1


def _step_key(walk: F.Column, step: int, v: F.Column) -> F.Column:
    """Deterministic selection key: hash first, node id as tie-break.
    Mirrors the oracle expression character-for-character in spirit —
    pmod keeps the residue non-negative on negative node ids."""
    s = F.pmod(
        F.lit(1000003) * walk + F.lit(7919 * step) + F.lit(104729) * v + F.lit(12345),
        F.lit(_P),
    )
    h = F.pmod(s * s, F.lit(_P))
    # h < 2^31; shift it above the 2^32-wide tie-break band.
    return h * F.lit(4294967296) + (v + F.lit(2147483648))


def random_walks(
    edges: DataFrame,
    seeds: DataFrame,
    length: int = 4,
    walks_per_seed: int = 2,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Run ``walks_per_seed`` deterministic walks of ``length`` steps
    from every row of ``seeds`` (column ``id``). Returns the corpus as
    (walk_id, step, node) — one row per visited position, step 0 being
    the seed itself. walk_id = seed_id * walks_per_seed + replica, so
    seed ids must be non-negative for walk ids to stay unique.
    """
    e = edges.select(F.col(src).alias("cur"), F.col(dst).alias("nxt")).persist()
    replicas = [F.lit(r) for r in range(walks_per_seed)]
    frontier = (
        seeds.select(F.col("id").alias("seed"))
        .select(F.explode(F.array(*replicas)).alias("r"), "seed")
        .select(
            (F.col("seed") * walks_per_seed + F.col("r")).alias("walk_id"),
            F.col("seed").alias("node"),
        )
        .localCheckpoint()
    )
    corpus = [frontier.withColumn("step", F.lit(0))]
    for t in range(1, length + 1):
        frontier = (
            frontier.join(e, frontier["node"] == e["cur"])
            .groupBy("walk_id")
            .agg(
                F.min_by("nxt", _step_key(F.col("walk_id"), t, F.col("nxt"))).alias(
                    "node"
                )
            )
            .localCheckpoint()
        )
        corpus.append(frontier.withColumn("step", F.lit(t)))
    out = corpus[0]
    for part in corpus[1:]:
        out = out.unionByName(part)
    return out.select("walk_id", "step", "node")


def duck_walk_sql(
    edges_cte: str,
    seeds_cte: str,
    length: int = 4,
    walks_per_seed: int = 2,
) -> str:
    """Unrolled-CTE DuckDB twin of :func:`random_walks`. ``edges_cte``
    must define e(src, dst); ``seeds_cte`` must define seeds(id).
    Returns SQL producing (walk_id, step, node)."""
    reps = ", ".join(f"({r})" for r in range(walks_per_seed))
    ctes = [
        edges_cte.strip(),
        seeds_cte.strip(),
        f"w0 AS (SELECT id * {walks_per_seed} + r AS walk_id, id AS node"
        f" FROM seeds, (VALUES {reps}) reps(r))",
    ]
    sel = ["SELECT walk_id, 0 AS step, node FROM w0"]
    for t in range(1, length + 1):
        key = (
            f"((((1000003*walk_id + {7919 * t} + 104729*e.dst + 12345) % {_P}"
            f" + {_P}) % {_P}) * (((1000003*walk_id + {7919 * t} + 104729*e.dst"
            f" + 12345) % {_P} + {_P}) % {_P})) % {_P} * 4294967296"
            f" + (e.dst + 2147483648)"
        )
        ctes.append(
            f"w{t} AS (SELECT walk_id, min_by(e.dst, {key}) AS node"
            f" FROM w{t-1} JOIN e ON e.src = w{t-1}.node GROUP BY walk_id)"
        )
        sel.append(f"SELECT walk_id, {t} AS step, node FROM w{t}")
    return "WITH " + ",\n".join(ctes) + "\n" + "\nUNION ALL\n".join(sel)


# ---------------------------------------------------------------------
# node2vec (Grover & Leskovec 2016): second-order biased walks.
# ---------------------------------------------------------------------
def _n2v_weights(p: float, q: float, base: int = 4) -> tuple[int, int, int]:
    """Integer replica weights (w_return, w_bfs, w_dfs) =
    (base/p, base, base/q). Integer weighting keeps the deterministic
    selection in exact int64 arithmetic on both engines — float keys
    (ln(u)/alpha, the Efraimidis-Spirakis route) would hang engine
    parity on libm's last ulp."""
    ws = (base / p, float(base), base / q)
    out = []
    for w in ws:
        if not w.is_integer() or not 1 <= w <= 8:
            raise ValueError(
                f"p/q must give integer replica weights in [1, 8]; got {ws}"
            )
        out.append(int(w))
    return tuple(out)


def node2vec_walks(
    edges: DataFrame,
    seeds: DataFrame,
    length: int = 4,
    walks_per_seed: int = 2,
    p: float = 2.0,
    q: float = 0.5,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Deterministic node2vec walk corpus: step 1 is the uniform
    first-order choice (no previous node yet); steps >= 2 weight each
    candidate v from (prev -> cur -> v) by the node2vec alpha —
    1/p when v == prev (return), 1 when v neighbors prev (BFS-ish),
    1/q otherwise (DFS-ish) — with weights realized as integer
    candidate REPLICAS (w copies of v, sub-indexed) under the same
    mid-square hash argmin as :func:`random_walks`. Replica counts
    approximate alpha-proportional choice (min-hash over w copies);
    what is EXACT is determinism — every run and both engines pick
    identical walks. Returns (walk_id, step, node).

    Per step: the frontier join on the current node (edge partitioning
    reused), one left join against the adjacency for the BFS flag, a
    <= 8x replica explode, one min_by collapse back to a row per walk.
    Pass a symmetrized edge table for the standard undirected
    semantics."""
    wr, wb, wd = _n2v_weights(p, q)
    e = edges.select(F.col(src).alias("cur"), F.col(dst).alias("nxt")).persist()
    adj = (
        edges.select(F.col(src).alias("prev"), F.col(dst).alias("nxt"))
        .dropDuplicates()
        .withColumn("__adj", F.lit(1))
    )
    replicas = [F.lit(r) for r in range(walks_per_seed)]
    frontier = (
        seeds.select(F.col("id").alias("seed"))
        .select(F.explode(F.array(*replicas)).alias("r"), "seed")
        .select(
            (F.col("seed") * walks_per_seed + F.col("r")).alias("walk_id"),
            F.col("seed").alias("prev"),
            F.col("seed").alias("cur"),
        )
        .localCheckpoint()
    )
    corpus = [frontier.select("walk_id", F.lit(0).alias("step"), F.col("cur").alias("node"))]
    for t in range(1, length + 1):
        cand = frontier.join(e, frontier["cur"] == e["cur"]).select(
            "walk_id", "prev", frontier["cur"].alias("here"), "nxt"
        )
        if t == 1:
            scored = cand.withColumn(
                "key", _step_key(F.col("walk_id"), t, F.col("nxt"))
            )
        else:
            w = (
                F.when(F.col("nxt") == F.col("prev"), F.lit(wr))
                .when(F.col("__adj").isNotNull(), F.lit(wb))
                .otherwise(F.lit(wd))
            )
            scored = (
                cand.join(adj, ["prev", "nxt"], "left")
                .withColumn("j", F.explode(F.sequence(F.lit(0), w - 1)))
                .withColumn(
                    "key",
                    _step_key(
                        F.col("walk_id"), t, F.col("nxt") * 8 + F.col("j")
                    ),
                )
            )
        frontier = (
            scored.groupBy("walk_id")
            .agg(
                F.min("here").alias("prev"),
                F.min_by("nxt", F.col("key")).alias("cur"),
            )
            .localCheckpoint()
        )
        corpus.append(
            frontier.select("walk_id", F.lit(t).alias("step"), F.col("cur").alias("node"))
        )
    out = corpus[0]
    for part in corpus[1:]:
        out = out.unionByName(part)
    return out.select("walk_id", "step", "node")


def _duck_key(walk: str, t: int, v: str) -> str:
    """SQL for the mid-square selection key over an arbitrary v expr."""
    s = f"(((1000003*{walk} + {7919 * t} + 104729*({v}) + 12345) % {_P} + {_P}) % {_P})"
    return f"({s} * {s}) % {_P} * 4294967296 + (({v}) + 2147483648)"


def duck_node2vec_sql(
    edges_cte: str,
    seeds_cte: str,
    length: int = 4,
    walks_per_seed: int = 2,
    p: float = 2.0,
    q: float = 0.5,
) -> str:
    """Unrolled-CTE DuckDB twin of :func:`node2vec_walks`."""
    wr, wb, wd = _n2v_weights(p, q)
    maxw = max(wr, wb, wd)
    reps = ", ".join(f"({r})" for r in range(walks_per_seed))
    ctes = [
        edges_cte.strip(),
        seeds_cte.strip(),
        "adj AS MATERIALIZED (SELECT DISTINCT src, dst FROM e)",
        f"f0 AS (SELECT id * {walks_per_seed} + r AS walk_id, id AS prev,"
        f" id AS cur FROM seeds, (VALUES {reps}) reps(r))",
    ]
    sel = ["SELECT walk_id, 0 AS step, cur AS node FROM f0"]
    for t in range(1, length + 1):
        if t == 1:
            key = _duck_key("f.walk_id", t, "e.dst")
            ctes.append(
                f"""f{t} AS (SELECT f.walk_id, min(f.cur) AS prev,
                min_by(e.dst, {key}) AS cur
                FROM f{t - 1} f JOIN e ON e.src = f.cur GROUP BY f.walk_id)"""
            )
        else:
            key = _duck_key("c.walk_id", t, "c.v * 8 + rep.j")
            ctes.append(
                f"""c{t} AS (
                SELECT f.walk_id, f.prev, f.cur AS here, e.dst AS v,
                       CASE WHEN e.dst = f.prev THEN {wr}
                            WHEN a.src IS NOT NULL THEN {wb}
                            ELSE {wd} END AS w
                FROM f{t - 1} f JOIN e ON e.src = f.cur
                LEFT JOIN adj a ON a.src = f.prev AND a.dst = e.dst)"""
            )
            ctes.append(
                f"""f{t} AS (
                SELECT c.walk_id, min(c.here) AS prev,
                       min_by(c.v, {key}) AS cur
                FROM c{t} c, (SELECT unnest(generate_series(0, {maxw - 1})) AS j) rep
                WHERE rep.j < c.w
                GROUP BY c.walk_id)"""
            )
        sel.append(f"SELECT walk_id, {t} AS step, cur AS node FROM f{t}")
    return "WITH " + ",\n".join(ctes) + "\n" + "\nUNION ALL\n".join(sel)
