"""Warehouse merge operators: type-1 upsert and SCD type-2 history
merge.

Not in the reference (its stores are overwrite-only pickles); added
because any periodically re-extracted dimension (the reference
re-crawls Wikidata monthly) needs a merge discipline to avoid
rewriting unchanged history. Expressed as pure DataFrame joins so
Catalyst broadcasts the (small) update batch against the (large)
dimension — the classic MERGE INTO shape without a table format:
at 100 TB the dimension stays partitioned/bucketed by key and only
touched partitions rewrite (pair with warehouse.py bucketing).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def upsert(
    current: DataFrame,
    updates: DataFrame,
    key: str | list[str],
) -> DataFrame:
    """Type-1 merge: updates replace matching keys, unmatched keys
    append. One left-anti join (current minus updated keys) + union —
    the update side is typically the small side and broadcasts."""
    keys = [key] if isinstance(key, str) else list(key)
    kept = current.join(updates.select(*keys), keys, "left_anti")
    return kept.unionByName(updates)


def scd2_merge(
    current: DataFrame,
    updates: DataFrame,
    key: str | list[str],
    tracked: list[str],
    ts_col: str = "effective_ts",
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
    is_current: str = "is_current",
) -> DataFrame:
    """SCD type-2 merge: rows of ``updates`` whose ``tracked``
    attributes differ from the CURRENT version of their key close that
    version (``valid_to`` = update timestamp, ``is_current`` = 0) and
    insert a new current version; no-op updates (identical tracked
    attrs) are dropped; brand-new keys insert directly. History rows
    (``is_current`` = 0) pass through untouched.

    ``current`` must carry (key..., tracked..., ts_col is NOT needed,
    valid_from, valid_to, is_current); ``updates`` carries
    (key..., tracked..., ts_col).

    Shape: one equi-join of updates against the current slice (null-
    safe attr comparison decides changed/no-op), then unions. The
    dimension's history rows never join anything — at scale the only
    shuffled data is the current slice and the update batch, and the
    update batch broadcasts when small.

    A CDC-style batch may carry several updates for one key; a
    duplicate key would match the current row once PER update (the
    same version would close twice and open twice — overlapping
    validity, multiple ``is_current`` rows). The batch is therefore
    resolved to ONE winner per key first: latest ``ts_col``, ties
    broken by the tracked attributes descending (deterministic).
    Intermediate same-batch versions are intentionally not emitted —
    per-batch granularity, the standard micro-batch SCD2 semantics.
    """
    keys = [key] if isinstance(key, str) else list(key)
    w = Window.partitionBy(*keys).orderBy(
        F.col(ts_col).desc(), *[F.col(c).desc_nulls_last() for c in tracked]
    )
    updates = (
        updates.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
    cur = current.filter(F.col(is_current) == 1)
    hist = current.filter(F.col(is_current) != 1)

    upd = updates.select(
        *[F.col(c).alias(f"u_{c}") for c in keys + tracked], F.col(ts_col)
    )
    joined = cur.join(
        upd,
        [F.col(k) == F.col(f"u_{k}") for k in keys],
        "left",
    )
    changed_pred = F.col(f"u_{keys[0]}").isNotNull() & ~F.expr(
        " AND ".join(f"({c} <=> u_{c})" for c in tracked)
    )

    types = dict(cur.dtypes)
    untouched = joined.filter(F.col(f"u_{keys[0]}").isNull() | ~changed_pred).select(
        cur.columns
    )
    closed = joined.filter(changed_pred).select(
        *[F.col(c) for c in cur.columns if c not in (valid_to, is_current)],
        F.col(ts_col).cast(types[valid_to]).alias(valid_to),
        F.lit(0).cast(types[is_current]).alias(is_current),
    ).select(cur.columns)
    new_versions = joined.filter(changed_pred).select(
        *[F.col(f"u_{c}").alias(c) for c in keys],
        *[F.col(f"u_{c}").alias(c) for c in tracked],
        F.col(ts_col).cast(types[valid_from]).alias(valid_from),
        F.lit(None).cast(types[valid_to]).alias(valid_to),
        F.lit(1).cast(types[is_current]).alias(is_current),
    ).select(cur.columns)

    brand_new = (
        updates.join(cur.select(*keys), keys, "left_anti")
        .select(
            *[F.col(c) for c in keys + tracked],
            F.col(ts_col).cast(types[valid_from]).alias(valid_from),
        )
        .withColumn(valid_to, F.lit(None).cast(types[valid_to]))
        .withColumn(is_current, F.lit(1).cast(types[is_current]))
        .select(cur.columns)
    )

    return hist.unionByName(untouched).unionByName(closed).unionByName(
        new_versions
    ).unionByName(brand_new)


def scd2_asof_join(
    fact: DataFrame,
    dim: DataFrame,
    key: str | list[str],
    fact_ts: str,
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
    how: str = "inner",
) -> DataFrame:
    """Join each fact row to the dimension VERSION that was valid at
    the fact's timestamp: key equality plus
    ``valid_from <= ts < coalesce(valid_to, +inf)``. The equi-key
    carries the hash join (the range conjuncts are post-filters on the
    matched key's few versions — never a cartesian), so at 100 TB this
    shuffles exactly like a plain dimension join; version history adds
    a small constant factor per key, not a blowup.

    SCD2 validity intervals are half-open and non-overlapping per key
    by construction (scd2_merge), so each fact row matches at most one
    version. Fact and dim must not share non-key column names (the
    rename-back would create duplicate columns) — checked loudly.
    """
    keys = [key] if isinstance(key, str) else list(key)
    clash = (set(fact.columns) & set(dim.columns)) - set(keys)
    if clash:
        raise ValueError(
            f"scd2_asof_join: fact and dim share non-key columns "
            f"{sorted(clash)!r}; rename one side first"
        )
    d = dim.select(
        *[F.col(c).alias(f"d_{c}") for c in dim.columns]
    )
    cond = [F.col(k) == F.col(f"d_{k}") for k in keys]
    cond.append(F.col(f"d_{valid_from}") <= F.col(fact_ts))
    cond.append(
        F.col(f"d_{valid_to}").isNull() | (F.col(fact_ts) < F.col(f"d_{valid_to}"))
    )
    joined = fact.join(d, cond, how)
    # undo the disambiguation prefix on non-key dim columns
    renames = {
        f"d_{c}": c for c in dim.columns if c not in keys
    }
    for old, new in renames.items():
        joined = joined.withColumnRenamed(old, new)
    return joined.drop(*[f"d_{k}" for k in keys])


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key: str | list[str],
    compare_cols: list[str] | None = None,
) -> DataFrame:
    """CDC-style snapshot comparison: classify every key across two
    snapshots of the same table as added / removed / changed /
    unchanged. The audit tool behind any periodic re-extraction (the
    reference re-crawls Wikidata monthly — this is how you see what
    the month changed before merging it).

    One full-outer join on the key; change detection compares an md5
    over the non-key columns (computed map-side on each branch, so the
    join carries one hash per side instead of every compared column —
    at 100 TB the shuffle width is keys + 32 bytes). Each value is
    hashed INDIVIDUALLY before the row hash: per-value md5 output is
    fixed-width hex, so no value can smuggle a field separator and
    shift field boundaries, and NULL maps to a token no md5 can
    produce — the row hash is injective over the compared tuple.
    """
    keys = [key] if isinstance(key, str) else list(key)
    cols = compare_cols or [c for c in new.columns if c not in keys]

    def _hashed(df: DataFrame, alias: str) -> DataFrame:
        h = F.md5(
            F.concat_ws(
                "|",
                *[
                    F.coalesce(F.md5(F.col(c).cast("string")), F.lit("<null>"))
                    for c in cols
                ],
            )
        )
        return df.select(*keys, h.alias(alias))

    j = _hashed(old, "_old_h").join(_hashed(new, "_new_h"), keys, "full_outer")
    change = (
        F.when(F.col("_old_h").isNull(), F.lit("added"))
        .when(F.col("_new_h").isNull(), F.lit("removed"))
        .when(F.col("_old_h") != F.col("_new_h"), F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    return j.select(*keys, change.alias("change_type"))
