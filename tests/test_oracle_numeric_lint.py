"""Money-scale float lint over every oracle (VERDICT r7 item 4).

The class of driver-hash flips found by the r7 full sf0.1 sweep:
a value of magnitude O(1e5+) that is NOT integer and NOT 2dp-coarse
was built from float sums and rounded finer than its magnitude
supports — `round(x, 6)` of a 1e7-scale FLOAT sum differs between
engines in the last retained digits (huber_revenue_trend, r7). The
cure is integer sufficient statistics (sums/cents/counts) or rounding
no finer than 2dp at that magnitude (holt_winters precedent).

This test runs every registered ORACLE on DuckDB at the gate tier
(sf0.01) and flags any emitted double whose implied rounding quantum
is too fine for its magnitude: the quantum (10^-d from the shortest
decimal representation) must exceed the value's float ulp by a
SAFETY factor of 1e4 — room for thousands of ulps of cross-engine
summation-order drift before the rounding boundary can flip. The
r7 flip (round(x,6) of an O(1e8) float sum: ~45 ulps of headroom)
fails this; the safe precedents (round(x,2) at 1e7: ~4e6 ulps;
TPC-H 4dp revenues at 1e6: ~1e5 ulps) pass. Waivers need a reason.
DuckDB-only (no Spark session), so the whole 500-oracle scan runs
in minutes in CI on every new query.
"""

from __future__ import annotations

import math
import os

import duckdb
import pytest

from social_link_prediction_spark import queries as q

SF_DIR = os.environ.get("SPARK_GRAFT_LINT_SF", "/root/testdata/sf0.01")

needs_testdata = pytest.mark.skipif(
    not os.path.isdir(SF_DIR), reason="driver testdata not present"
)

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]

# Queries allowed to emit large doubles finer than their magnitude's
# headroom bar, each audited (r8): the value is NOT an accumulated
# float sum — it derives from exact integer sufficient statistics
# (or exact selections like min/max/median) through ONE fixed float
# expression written identically on both engines, so the doubles are
# bit-identical BEFORE rounding and the boundary cannot flip. Keep
# this short — the default for new queries is integer cents/counts.
_INT_STATS = (
    "exact integer sufficient statistics through one fixed float "
    "expression — doubles bit-identical before rounding"
)
WAIVERS: dict[str, str] = {
    "sketch_quantiles_price": (
        "exact min/max selections + integer bin index through one "
        "fixed interpolation expression"
    ),
    "ols_revenue_trend": _INT_STATS + " (r7 integer-cents contract)",
    "theil_sen_revenue_trend": (
        "exact median SELECTIONS over integer-cents-derived values "
        "(r7 contract)"
    ),
    "rfm_segments": _INT_STATS + " (cents/count division only)",
    "anova_price_segments": _INT_STATS + " (decimal cents moments)",
    "twoway_anova_interaction": _INT_STATS + " (int64 cents moments)",
    "seasonal_mann_kendall_revenue": (
        _INT_STATS + " (int64 S/tie terms; only final /18 and sqrt float)"
    ),
    "otsu_quality_threshold": _INT_STATS + " (exact cumulative moments)",
    "kalman_local_level_daily": (
        "exact integer-cents inputs through the identical recursive "
        "float sequence on both engines (CTE == Python loop)"
    ),
    "ridge_cv_path": _INT_STATS + " (fold moments expanded exactly)",
    "hierarchical_forecast_reconciliation": (
        _INT_STATS + " (r8 integer-cents rework of the float-sum "
        "original this lint caught)"
    ),
    "price_dispersion_within_part": _INT_STATS + " (cents-per-unit sums)",
}

_SAFETY = 1e4  # required quantum/ulp headroom
_ULP = 2.0 ** -52


def _decimals(v: float) -> int:
    """Decimal places in the shortest repr (capped at 12) — the
    implied rounding quantum is 10^-decimals."""
    r = repr(v)
    if "e" in r or "E" in r:
        return 12
    if "." not in r:
        return 0
    return min(len(r.split(".", 1)[1]), 12)


def _risky(v) -> bool:
    if not isinstance(v, float):
        return False
    if math.isnan(v) or math.isinf(v) or v == 0.0:
        return False
    # integer-valued doubles below 2^52 are exact sufficient stats
    if v == int(v) and abs(v) < 2.0 ** 52:
        return False
    quantum = 10.0 ** -_decimals(v)
    return quantum < abs(v) * _ULP * _SAFETY


@needs_testdata
def test_no_fine_grained_large_doubles_in_oracle_outputs():
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(SF_DIR, f"{t}.parquet")
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')"
        )
    offenders = []
    for name, sql in q.ORACLES.items():
        if sql is None or name in WAIVERS:
            continue
        try:
            cur = con.execute(sql)
            rows = cur.fetchall()
        except Exception as e:  # noqa: BLE001 — surface as lint failure
            offenders.append(f"{name}: oracle failed to run: {e}")
            continue
        for r in rows:
            for v in r:
                vals = v if isinstance(v, (list, tuple)) else [v]
                for x in vals:
                    if _risky(x):
                        offenders.append(f"{name}: {x!r}")
                        break
                else:
                    continue
                break
            else:
                continue
            break
    assert not offenders, (
        "oracle outputs with |v|>1e5 doubles finer than 2dp — the "
        "engine-drift hazard class (emit integer cents/counts or "
        "coarsen the rounding; see huber_revenue_trend r7):\n  "
        + "\n  ".join(offenders)
    )
