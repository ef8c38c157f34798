"""Training-data preparation operators: sequence packing, benchmark
contamination screening, intra-document repetition metrics.

These are the ops a 100 TB pretraining pipeline runs after dedup/
quality filtering (pipelines/dedup.py, pipelines/text.py):

- ``pack_documents`` — GPT-style concat-and-chunk packing: documents
  are laid out end-to-end per shard in a deterministic order and cut
  into fixed token-budget chunks; each doc learns its byte/token
  offset and chunk span. Pure window arithmetic (one shuffle per
  shard key), no UDF.
- ``contamination_check`` — n-gram overlap screen of a training corpus
  against a benchmark/eval set (the decontamination step every run
  needs): inverted-index semi-join on hashed shingles, never
  all-pairs; a ``max_doc_freq`` stop-shingle cap bounds the join's
  skew exactly like ngram_jaccard's.
- ``repetition_stats`` — Gopher-style repetition quality signals:
  fraction of duplicate word n-grams and the share of the most
  frequent n-gram, per document. explode + two-level aggregation with
  map-side partial agg; shuffle key is (doc_id, ngram).

All three are deterministic and SQL-expressible, so each has a DuckDB
oracle in queries.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from social_link_prediction_spark.pipelines.dedup import shingles
from social_link_prediction_spark.pipelines.text import tokens


def pack_documents(
    df: DataFrame,
    budget: int = 2048,
    shard_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Concat-and-chunk sequence packing: within each shard (ordered by
    ``id_col`` for determinism), documents are concatenated and sliced
    into ``budget``-token training chunks. Output per doc:

    - ``n_tokens``     whitespace token count
    - ``start_offset`` cumulative token offset of the doc's first token
    - ``first_chunk`` / ``last_chunk``  chunk indices the doc spans
      (a doc may straddle a boundary — that IS the packing semantics;
      greedy no-split packing is a different op)
    - ``n_chunks``     how many chunks the doc touches

    One shuffle (window partition by shard). At 100 TB the shard key
    is date/source so each window partition is one input shard — skew
    equals shard skew, not corpus size. Empty docs carry 0 tokens and
    collapse to a zero-width span at their offset.
    """
    n_tok = F.size(tokens(text_col))
    w = Window.partitionBy(shard_col).orderBy(id_col)
    cum = F.sum("n_tokens").over(w.rowsBetween(Window.unboundedPreceding, -1))
    out = (
        df.withColumn("n_tokens", n_tok)
        .withColumn("start_offset", F.coalesce(cum, F.lit(0)).cast("long"))
    )
    first = F.floor(F.col("start_offset") / budget)
    last = F.when(
        F.col("n_tokens") > 0,
        F.floor((F.col("start_offset") + F.col("n_tokens") - 1) / budget),
    ).otherwise(first)
    return (
        out.withColumn("first_chunk", first.cast("long"))
        .withColumn("last_chunk", last.cast("long"))
        .withColumn("n_chunks", (F.col("last_chunk") - F.col("first_chunk") + 1).cast("long"))
        .select(id_col, shard_col, "n_tokens", "start_offset", "first_chunk", "last_chunk", "n_chunks")
    )


def contamination_check(
    train: DataFrame,
    benchmark: DataFrame,
    n: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_doc_freq: int | None = None,
) -> DataFrame:
    """Benchmark decontamination: for every training doc, count the
    distinct word ``n``-grams it shares with ANY benchmark doc.
    Returns (id_col, n_shared) for contaminated docs only.

    Scale shape: both sides explode to (doc, shingle-hash) — 64-bit
    hashes, not strings, cross the shuffle — and meet in an
    inverted-index equi-join on the hash; the benchmark side is
    typically tiny (eval sets) and broadcasts. ``max_doc_freq`` drops
    shingles appearing in more than that many TRAIN docs (boilerplate
    stop-shingles: the df² skew guard, same policy as ngram_jaccard).
    Never all-pairs.
    """
    def _sh(df: DataFrame) -> DataFrame:
        return (
            df.select(F.col(id_col), F.explode(shingles(text_col, n)).alias("shingle"))
            .select(id_col, F.xxhash64("shingle").alias("h"))
            .dropDuplicates([id_col, "h"])
        )

    t = _sh(train)
    if max_doc_freq is not None:
        hot = (
            t.groupBy("h").agg(F.count(F.lit(1)).alias("df"))
            .filter(F.col("df") > max_doc_freq)
            .select("h")
        )
        t = t.join(hot, "h", "left_anti")
    b = _sh(benchmark).select("h").dropDuplicates()
    return (
        t.join(b, "h")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )


def repetition_stats(
    df: DataFrame,
    n: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Gopher-style intra-document repetition metrics per doc:

    - ``n_ngrams``       total word n-grams
    - ``dup_ngram_ratio`` 1 - distinct/total (mass in repeated n-grams)
    - ``top_ngram_ratio`` share of the single most frequent n-gram

    Docs with fewer than ``n`` tokens are absent (no n-grams). Two
    aggregations: (doc, ngram) counts — map-side partial agg collapses
    in-partition repeats before the shuffle — then a per-doc rollup.
    """
    ng = df.select(F.col(id_col), F.explode(shingles(text_col, n)).alias("g"))
    counts = ng.groupBy(id_col, "g").agg(F.count(F.lit(1)).alias("c"))
    return counts.groupBy(id_col).agg(
        F.sum("c").alias("n_ngrams"),
        F.round(F.lit(1.0) - F.count(F.lit(1)) / F.sum("c"), 6).alias("dup_ngram_ratio"),
        F.round(F.max("c") / F.sum("c"), 6).alias("top_ngram_ratio"),
    )


# --- deterministic weighted sampling (A-ES) --------------------------
def weighted_sample(
    df: DataFrame,
    weight_col: str,
    k: int,
    key_cols: list[str],
    seed: int = 42,
) -> DataFrame:
    """Weighted sampling without replacement, deterministic: the
    A-ES / Efraimidis-Spirakis exponential-sort trick. Each row draws
    u = uniform(0,1) from a HASH of its key (not an RNG), and the k
    rows with the largest u^(1/w) — equivalently the smallest
    -ln(u)/w — win. Inclusion probability is proportional to weight,
    the sample is reproducible across engines and runs, and the
    selection is one scan + a TakeOrdered k-heap: no global sort, no
    RNG state, cluster-scale safe.

    Weights must be positive; rows with w <= 0 are excluded.
    """
    from social_link_prediction_spark.ml.linksplit import hash60

    u = hash60(*key_cols, F.lit(str(seed))).cast("double") / F.lit(float(1 << 60))
    # clamp away u=0 (would make -ln(u) infinite for every weight)
    key = -F.log(F.greatest(u, F.lit(1e-18))) / F.col(weight_col)
    return (
        df.filter(F.col(weight_col) > 0)
        .withColumn("__aes", key)
        .orderBy(F.col("__aes").asc(), *key_cols)
        .limit(k)
        .drop("__aes")
    )


def kfold_assign(
    df: DataFrame, key_cols: list[str], n_folds: int = 5, seed: int = 42
) -> DataFrame:
    """Deterministic k-fold assignment: fold = hash(key, seed) mod k.
    Same hash family as the link split, so folds are reproducible and
    grouping-stable (all rows of one key land in one fold — the
    leakage-safe construction when keys repeat)."""
    from social_link_prediction_spark.ml.linksplit import hash60

    fold = hash60(*key_cols, F.lit(str(seed))) % n_folds
    return df.withColumn("fold", fold.cast("int"))


def time_decayed_sum(
    df: DataFrame,
    ts_col: str,
    value_col: str,
    group_cols: list[str],
    half_life_days: float = 30.0,
) -> DataFrame:
    """Exponentially time-decayed aggregation: each value weighted by
    2^(-age/half_life) relative to the corpus max timestamp — recency
    weighting for training-data mixture tuning or feature freshness.
    The max-ts anchor is a 1-row broadcast crossJoin (same pattern as
    impute_mean); everything else is a plain map-side-combinable agg.
    """
    from social_link_prediction_spark.operators.windows import epoch_us

    anchor = df.agg(F.max(ts_col).alias("__maxts"))
    # epoch_us: NTZ-safe (fixtures store TIMESTAMP_NTZ; a direct
    # timestamp->double cast is forbidden under Spark 4 ANSI and
    # unix_micros rejects NTZ); the UTC offset cancels in the age
    age_days = (
        (epoch_us(F.col("__maxts")) / 1e6) - (epoch_us(F.col(ts_col)) / 1e6)
    ) / 86400.0
    w = F.pow(F.lit(2.0), -age_days / half_life_days)
    return (
        df.crossJoin(F.broadcast(anchor))
        .groupBy(*group_cols)
        .agg(
            F.round(F.sum(F.col(value_col) * w), 6).alias("decayed_sum"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )


# --- corpus mixture rebalancing --------------------------------------
def mixture_plan(
    df: DataFrame,
    group_col: str,
    targets: dict[str, float],
    strict: bool = False,
) -> DataFrame:
    """Domain/language mixture planning (the "data mixing" step of a
    pretraining pipeline, cf. The Pile / DoReMi-style fixed-weight
    mixes): given target proportions per group, find the LARGEST total
    corpus size achievable without upsampling any group, and the
    per-group planned row counts and keep rates that hit it.

        total   = min over g of floor(n_g / share_g)
        planned = floor(share_g * total)   (<= n_g by construction)

    Integer floors make the plan exactly replayable in SQL. Groups
    absent from ``targets`` get share 0 (dropped). Cost: one count
    aggregation + arithmetic over G rows — the data itself is not
    touched beyond the count.

    A positive-share target group with ZERO corpus rows makes the mix
    infeasible without upsampling. The join runs from the shares side
    (left), so such a group still appears — with n_available=0 — and
    collapses the no-upsample total to 0: every planned_rows goes to 0
    rather than silently over-claiming target shares the corpus cannot
    satisfy. With ``strict=True`` (an extra tiny action over the G-row
    plan) the infeasibility raises instead.

    Output: (group, n_available, target_share, planned_rows,
    keep_rate) — feed to :func:`apply_mixture`.
    """
    spark = df.sparkSession
    shares = spark.createDataFrame(
        [(k, float(v)) for k, v in targets.items()],
        f"{group_col} string, target_share double",
    )
    counts = df.groupBy(group_col).agg(F.count(F.lit(1)).alias("n_available"))
    # left join FROM the shares side; broadcast the counts side (the
    # preserved side of a left-outer can't be broadcast, the other can
    # — and counts is one row per group after its aggregation)
    g = (
        shares.join(F.broadcast(counts), group_col, "left")
        .withColumn("n_available", F.coalesce("n_available", F.lit(0)))
        .filter(F.col("target_share") > 0)
    )
    total = F.broadcast(
        g.select(
            F.min(F.floor(F.col("n_available") / F.col("target_share"))).alias(
                "__total"
            )
        )
    )
    plan = g.crossJoin(total).select(
        group_col,
        "n_available",
        "target_share",
        F.floor(F.col("target_share") * F.col("__total"))
        .cast("long")
        .alias("planned_rows"),
        F.when(F.col("n_available") == 0, F.lit(0.0))
        .otherwise(
            F.round(
                F.floor(F.col("target_share") * F.col("__total"))
                / F.col("n_available"),
                6,
            )
        )
        .alias("keep_rate"),
    )
    if strict:
        empty = [
            r[group_col]
            for r in plan.filter(F.col("n_available") == 0).collect()
        ]
        if empty:
            raise ValueError(
                f"mixture infeasible: positive-share groups with no corpus rows: {empty}"
            )
    return plan


def temperature_mixture_plan(
    df: DataFrame,
    group_col: str,
    weight_col: str,
    temperature: float = 0.7,
    budget_frac: float = 0.5,
) -> DataFrame:
    """Temperature-scaled mixture planning (the multilingual-LM
    sampling curve, cf. mBERT / XLM-R exponential smoothing): group g
    with mass n_g gets sampling weight w_g ∝ n_g^(1/T). T=1 is
    proportional sampling; T→∞ is uniform; 0<T<1 sharpens toward the
    head. Planned mass = budget × w_g, capped at n_g (a group cannot
    be upsampled without repetition — the cap is reported, not
    silently redistributed, so the caller sees which groups are
    repetition-bound at this temperature).

    Output per group: mass, weight (round 6), planned (floor), capped
    flag. One aggregation + G-row arithmetic against a broadcast
    1-row total — the data is touched once for the count."""
    if temperature <= 0:
        raise ValueError(f"temperature must be > 0, got {temperature}")
    g = df.groupBy(group_col).agg(F.sum(weight_col).alias("mass"))
    pw = F.pow(F.col("mass").cast("double"), 1.0 / temperature)
    gw = g.withColumn("pw", pw)
    tot = gw.agg(
        F.sum("pw").alias("pw_sum"), F.sum("mass").alias("mass_sum")
    )
    # plan from the ROUNDED weight: pw_sum is an order-dependent float
    # sum, so raw-share floors could flip on an ulp across engines;
    # quantizing the share to 6 decimals first makes the integer plan
    # reproducible everywhere (the same round-before-rank discipline
    # the top-k queries use).
    w6 = F.round(F.col("pw") / F.col("pw_sum"), 6)
    raw = F.floor(F.lit(budget_frac) * F.col("mass_sum") * w6).cast("long")
    out = gw.crossJoin(F.broadcast(tot)).select(
        group_col,
        "mass",
        w6.alias("weight"),
        F.least(raw, F.col("mass")).alias("planned"),
        (raw > F.col("mass")).alias("capped"),
    )
    return out


def apply_mixture(
    df: DataFrame,
    plan: DataFrame,
    group_col: str,
    key_cols: list[str],
    seed: int = 42,
) -> DataFrame:
    """Materialize a mixture plan with the deterministic hash-threshold
    sampler: keep a row iff hash(key, seed) mod 1e6 falls under the
    group's keep-rate threshold. Reproducible (no RNG), stable under
    re-runs and engine changes, one broadcast join + filter — no
    shuffle of the corpus. Kept counts are within O(sqrt(n)) of
    planned_rows; exact-count selection would need a per-group top-k
    by hash instead (same sampler family, one extra window)."""
    from social_link_prediction_spark.ml.linksplit import hash60

    thresh = plan.select(
        group_col,
        F.floor(F.col("planned_rows") / F.col("n_available") * 1_000_000).alias(
            "__thresh"
        ),
    )
    h = F.pmod(hash60(*key_cols, F.lit(str(seed))), F.lit(1_000_000))
    return (
        df.join(F.broadcast(thresh), group_col, "inner")
        .filter(h < F.col("__thresh"))
        .drop("__thresh")
    )


def epoch_order(
    df: DataFrame,
    key_cols: list[str],
    epoch: int = 0,
    n_shards: int | None = None,
) -> DataFrame:
    """Deterministic global training-order shuffle: sort key =
    hash(key, epoch). Every epoch is a different but REPRODUCIBLE
    permutation — a restarted job re-derives the identical order (and
    hence the identical batch boundaries), which RNG-shuffled writes
    cannot promise. With ``n_shards``, range-partition by the hash
    before the within-shard sort, so the global order is (shard_id,
    within-shard order) and each shard writes independently — the
    distributed shuffle-then-shard step in front of a data loader.
    Adds ``__order`` (the hash) for downstream inspection."""
    from social_link_prediction_spark.ml.linksplit import hash60

    h = hash60(*key_cols, F.lit(f"epoch{epoch}"))
    out = df.withColumn("__order", h)
    if n_shards:
        return out.repartitionByRange(n_shards, "__order").sortWithinPartitions(
            "__order"
        )
    return out.orderBy("__order")


def greedy_max_coverage(
    df: DataFrame,
    k: int = 5,
    id_col: str = "doc_id",
    col: str = "text",
    ngram: int = 3,
) -> DataFrame:
    """Greedy maximum-coverage document selection (the classic
    (1 − 1/e)-approximate submodular greedy): k rounds, each picking
    the document that covers the most NOT-yet-covered n-gram shingles
    (marginal gain; ties broken by min doc id), then marking its
    shingles covered. Coverage-based selection is the
    facility-location family of data pruning — pick the prototype
    subset that spans the corpus, the complement of dedup's
    drop-the-redundant view.

    Returns (round, doc_id, gain, covered_total): the pick sequence
    with marginal gains and the cumulative distinct-shingle count.

    Scale shape (r7 rework, VERDICT r6 item 3): the shingle table is
    localCheckpointed ONCE (eager block materialization — unlike
    persist(), not subject to lazy-cache eviction, which is what made
    the r6 bench re-derive it per round), and marginal gains are
    maintained INCREMENTALLY: after a pick, only the winner's
    newly-covered shingles (a one-document, driver-bounded frame) are
    broadcast-joined back to subtract their counts — no growing
    anti-join of the full shingle table against the covered set.
    Per round: one broadcast semi-join + one groupBy over the matched
    sliver + a TakeOrdered(1); driver traffic stays k winning rows."""
    if k < 1:
        raise ValueError("k must be >= 1")
    spark = df.sparkSession
    sh = (
        df.select(F.col(id_col).alias("id"), F.explode(shingles(col, ngram)).alias("s"))
        .dropDuplicates()
        .localCheckpoint()
    )
    # round-1 gains = distinct-shingle counts; thereafter gains[doc] -=
    # |sh(doc) ∩ newly_covered| keeps the exact marginal gain without
    # rescanning covered state (submodular greedy's standard delta).
    gains = (
        sh.groupBy("id").agg(F.count(F.lit(1)).alias("gain")).localCheckpoint()
    )
    covered = sh.select("s").limit(0).localCheckpoint()
    picked: list[tuple[int, int, int, int]] = []
    picked_ids: list = []
    total = 0
    for r in range(1, k + 1):
        win = (
            gains.filter(~F.col("id").isin(picked_ids) if picked_ids else F.lit(True))
            .orderBy(F.col("gain").desc(), F.col("id"))
            .limit(1)
            .collect()
        )
        # gain==0 ⇔ the doc has no uncovered shingle ⇔ the old
        # anti-join shape produced no candidate row: same stop rule.
        if not win or win[0].gain <= 0:
            break
        wid, wgain = win[0].id, int(win[0].gain)
        total += wgain
        picked.append((r, wid, wgain, total))
        picked_ids.append(wid)
        if r == k:
            break
        w_new = (
            sh.filter(F.col("id") == wid)
            .select("s")
            .join(covered, "s", "anti")
            .localCheckpoint()
        )
        delta = (
            sh.join(F.broadcast(w_new), "s")
            .groupBy("id")
            .agg(F.count(F.lit(1)).alias("__d"))
        )
        gains = (
            gains.join(delta, "id", "left")
            .select(
                "id",
                (F.col("gain") - F.coalesce(F.col("__d"), F.lit(0))).alias("gain"),
            )
            .localCheckpoint()
        )
        covered = covered.unionAll(w_new).localCheckpoint()
    # doc_id keeps the caller's id type (string ids are as common as
    # integer ones in document corpora) — a hardcoded `long` here would
    # crash createDataFrame after an otherwise-successful k-round run.
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("round", T.IntegerType()),
            T.StructField("doc_id", df.schema[id_col].dataType),
            T.StructField("gain", T.LongType()),
            T.StructField("covered_total", T.LongType()),
        ]
    )
    return spark.createDataFrame(picked, schema)
