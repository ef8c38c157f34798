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
