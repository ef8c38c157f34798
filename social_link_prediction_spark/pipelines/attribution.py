"""Markov-chain (removal-effect) conversion attribution.

The heuristic multi-touch models (first/last/linear — see
queries.multitouch_attribution) assign credit by position; the Markov
model assigns it by COUNTERFACTUAL: build the journey transition chain
start -> touch channels -> {conv, null}, compute the absorption
probability P(conv | start), then for each channel recompute it with
that channel knocked out (every transition into it redirected to
null). Removal effect RE_c = (P - P_c) / P; credit is RE-normalized
conversion mass (Anderl et al. 2014, "Mapping the customer journey").

Scale split, same discipline as the PQ ADC lookup tables
(pipelines/similarity.py): the JOURNEY construction is the data-scale
part — one shuffle of the event stream keyed by user — and stays fully
distributed; the absorbing-chain arithmetic runs on the transition
COUNT matrix, which is O(channels^2) rows regardless of input scale
(~30 rows here), so it is solved driver-side after a documented
driver-sized collect. Truncated power iteration (fixed rounds) rather
than a linear solve keeps the arithmetic replayable as unrolled SQL.

Journey semantics (pinned, mirrored by the oracle):
  - rows: touch events + purchases, per user ordered by (ts, event_id);
  - journey id = number of PRIOR purchases, so each purchase is the
    last row of the journey it converts;
  - edges: start -> first state, state -> next state, and last
    non-conv state -> null (abandoned journeys absorb to null);
  - a purchase with no preceding touch contributes start -> conv.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

ABSORBING = ("conv", "null")


def journey_transitions(
    events: DataFrame,
    touch_types: tuple[str, ...] = ("view", "click", "signup"),
    conversion_type: str = "purchase",
) -> DataFrame:
    """Distributed journey construction: (src, dst, n) transition
    counts over per-user event sequences. One shuffle (user key) for
    the ordering windows, one aggregation for the counts."""
    keep = list(touch_types) + [conversion_type]
    base = events.filter(F.col("event_type").isin(keep)).select(
        "user_id",
        "ts",
        "event_id",
        F.when(F.col("event_type") == conversion_type, F.lit("conv"))
        .otherwise(F.col("event_type"))
        .alias("state"),
    )
    w_user = Window.partitionBy("user_id").orderBy("ts", "event_id")
    j = base.withColumn(
        "jid",
        F.coalesce(
            F.sum((F.col("state") == "conv").cast("int")).over(
                w_user.rowsBetween(Window.unboundedPreceding, -1)
            ),
            F.lit(0),
        ),
    )
    w_j = Window.partitionBy("user_id", "jid").orderBy("ts", "event_id")
    e2 = j.select(
        "state",
        F.lag("state").over(w_j).alias("prev"),
        F.lead("state").over(w_j).alias("nxt"),
    )
    edges = e2.select(
        F.coalesce(F.col("prev"), F.lit("start")).alias("src"),
        F.col("state").alias("dst"),
    ).unionByName(
        e2.filter(F.col("nxt").isNull() & (F.col("state") != "conv")).select(
            F.col("state").alias("src"), F.lit("null").alias("dst")
        )
    )
    return edges.groupBy("src", "dst").agg(F.count(F.lit(1)).alias("n"))


def _absorption_prob(
    trans: list[tuple[str, str, int]], removed: str | None, rounds: int
) -> float:
    """P(conv | start) under truncated power iteration, with
    ``removed``'s inbound transitions redirected to null and its
    outbound rows dropped. Pure-Python mirror of the unrolled SQL:
    same redirect, same row-normalized probabilities, same
    fixed-round recursion (iteration order is sorted for
    determinism; double arithmetic matches the engines to rounding
    noise absorbed by the caller's round())."""
    mod: dict[tuple[str, str], int] = {}
    for src, dst, n in trans:
        if src == removed:
            continue
        if dst == removed:
            dst = "null"
        mod[(src, dst)] = mod.get((src, dst), 0) + n
    totals: dict[str, int] = {}
    for (src, _), n in mod.items():
        totals[src] = totals.get(src, 0) + n
    prob = {(s, d): n / totals[s] for (s, d), n in mod.items()}
    states = sorted(totals)
    p = {s: 0.0 for s in states}
    for _ in range(rounds):
        nxt = {}
        for s in states:
            acc = 0.0
            for d in sorted(x[1] for x in prob if x[0] == s):
                pr = prob[(s, d)]
                if d == "conv":
                    acc += pr
                elif d != "null":
                    acc += pr * p.get(d, 0.0)
            nxt[s] = acc
        p = nxt
    return p.get("start", 0.0)


def markov_removal_effects(
    trans_rows: list[tuple[str, str, int]],
    channels: tuple[str, ...] = ("view", "click", "signup"),
    rounds: int = 8,
) -> list[dict]:
    """Removal effects + RE-normalized attributed conversions from a
    driver-sized transition count list. Clamps truncation-noise
    negatives to zero; attributes nothing when every removal effect
    is zero."""
    base = _absorption_prob(trans_rows, None, rounds)
    n_conv = sum(n for _, dst, n in trans_rows if dst == "conv")
    effects = {}
    for c in channels:
        if base <= 0.0:
            effects[c] = 0.0
        else:
            effects[c] = max(0.0, (base - _absorption_prob(trans_rows, c, rounds)) / base)
    total = sum(effects.values())
    out = []
    for c in sorted(channels):
        # (n_conv * re) / total — same association order as the SQL
        # oracle's `n_conv * re / t`, so the doubles match bit-for-bit
        # before rounding.
        attributed = n_conv * effects[c] / total if total > 0 else 0.0
        out.append(
            {
                "channel": c,
                "p_conv_base": round(base, 6),
                "removal_effect": round(effects[c], 6),
                "attributed_conversions": round(attributed, 4),
            }
        )
    return out
