"""Document deduplication: exact, MinHash+LSH, SimHash, n-gram Jaccard,
embedding-cosine near-dup.

Hash family: salted md5 (hex) — deterministic, available identically
in Spark and DuckDB, so every stage is oracle-checkable. The MinHash
min is taken lexicographically over hex strings (a uniform order on
the hash space). At 100 TB scale the flow is:

    shingle (explode, map-side)  ->  K salted mins (one hash-agg by doc)
    ->  band keys (projection)   ->  bucket join (shuffle by band key)
    ->  candidate pairs          ->  exact Jaccard on candidates only

so the quadratic pair space is never materialized — only same-bucket
pairs are, and a bucket-size cap guards against degenerate buckets.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from social_link_prediction_spark.pipelines.text import tokens


def spread(df: DataFrame) -> DataFrame:
    """Spread a thin scan across all cores before CPU-heavy
    explode/hash stages. A small parquet file arrives as one input
    split, which would serialize all shingling/hashing on a single
    task; the round-robin shuffle of the (small) raw docs costs far
    less than the hash work it parallelizes. At 100 TB the scan
    already has thousands of splits and this is a no-op.
    """
    target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df


# --- exact dedup -----------------------------------------------------
def exact_duplicate_groups(df: DataFrame, col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Hash-groupBy exact dedup: groups of byte-identical documents.
    Shuffles md5 digests, never document bodies."""
    return (
        df.select(F.md5(F.col(col)).alias("content_hash"), F.col(id_col))
        .groupBy("content_hash")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.min(id_col).alias("keep_id"))
        .filter(F.col("n_docs") > 1)
    )


def drop_exact_duplicates(df: DataFrame, col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Keep the lowest-id representative of each content group."""
    w_keep = (
        df.select(F.md5(F.col(col)).alias("h"), F.col(id_col))
        .groupBy("h")
        .agg(F.min(id_col).alias(id_col))
    )
    return df.join(w_keep.select(id_col), on=id_col, how="left_semi")


# --- shingling -------------------------------------------------------
def shingles(col: Column | str, n: int = 3, sep: str = " ") -> Column:
    """Word n-gram shingles as an array column (higher-order functions,
    no UDF): slice the token array at every start offset. Documents
    shorter than ``n`` tokens yield an empty array (guarded explicitly:
    ``sequence(1, 0)`` would otherwise DESCEND and emit bogus offsets).
    """
    toks = tokens(col, sep)
    starts = F.when(
        F.size(toks) >= n, F.sequence(F.lit(1), F.size(toks) - F.lit(n - 1))
    ).otherwise(F.array().cast("array<int>"))
    return F.transform(starts, lambda i: F.array_join(F.slice(toks, i, n), " "))


def shingle_table(df: DataFrame, id_col: str = "doc_id", col: str = "text", n: int = 3) -> DataFrame:
    """(doc_id, shingle) exploded + deduped — input to MinHash/Jaccard."""
    return (
        df.select(F.col(id_col), F.explode(shingles(col, n)).alias("shingle"))
        .dropDuplicates([id_col, "shingle"])
    )


# --- MinHash + LSH ---------------------------------------------------
def minhash_signatures(
    df: DataFrame, id_col: str = "doc_id", col: str = "text", k: int = 8, n: int = 3
) -> DataFrame:
    """K-permutation MinHash via salted md5: signature_i = min over
    shingles of md5(i || '|' || shingle). One explode + one hash
    aggregation keyed by doc — shuffle volume is K hex strings per doc.
    """
    # No dropDuplicates: min() is idempotent over repeated shingles, so
    # aggregating the raw exploded shingles skips a full shuffle of the
    # shingle table — partial (map-side) aggregation reduces each
    # partition to K mins per doc before anything moves.
    sh = spread(df).select(F.col(id_col), F.explode(shingles(col, n)).alias("shingle"))
    aggs = [
        F.min(F.md5(F.concat(F.lit(f"{i}|"), F.col("shingle")))).alias(f"mh{i}")
        for i in range(k)
    ]
    return sh.groupBy(id_col).agg(*aggs)


def lsh_candidate_pairs(
    signatures: DataFrame,
    id_col: str = "doc_id",
    k: int = 8,
    rows_per_band: int = 2,
    max_bucket: int = 1000,
) -> DataFrame:
    """Band the signature (k/rows_per_band bands), bucket-join docs
    sharing any band value, emit distinct candidate pairs (a < b).
    ``max_bucket`` drops degenerate buckets (e.g. the empty-document
    bucket) that would otherwise explode quadratically — the skew
    guard that matters at scale.
    """
    n_bands = k // rows_per_band
    # One pass over signatures: build every band key as an array of
    # structs and explode — NOT a per-band unionAll, which would make
    # Catalyst re-run the whole signature pipeline once per band (and
    # again for each side of the self-join below).
    buckets = F.array(*[
        F.struct(
            F.lit(b).alias("band"),
            F.md5(
                F.concat_ws(
                    "\x1f",
                    *[F.col(f"mh{b * rows_per_band + r}") for r in range(rows_per_band)],
                )
            ).alias("bucket"),
        )
        for b in range(n_bands)
    ])
    banded = signatures.select(F.col(id_col), F.explode(buckets).alias("bb")).select(
        F.col(id_col), F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket")
    )
    # skew guard as a window count over the bucket key: one shuffle
    # computes sizes AND drops every member of a degenerate bucket —
    # measured faster than the groupBy + broadcast-anti-join pair it
    # replaces (one fewer aggregation job), and the window shuffle
    # pre-partitions banded on the self-join key below.
    from pyspark.sql import Window

    w = Window.partitionBy("band", "bucket")
    banded = (
        banded.withColumn("__n", F.count(F.lit(1)).over(w))
        .filter(F.col("__n") <= max_bucket)
        .drop("__n")
        .persist()  # both self-join sides read it
    )

    a = banded.alias("a")
    b = banded.alias("b")
    return (
        a.join(b, on=["band", "bucket"])
        .filter(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .select(F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b"))
        .dropDuplicates()
    )


# --- n-gram Jaccard --------------------------------------------------
def jaccard_for_pairs(
    pairs: DataFrame, sh: DataFrame, id_col: str = "doc_id", pre_hashed: bool = False
) -> DataFrame:
    """Exact shingle-set Jaccard for candidate pairs, relationally:
    |A ∩ B| from a join on shingle, |A ∪ B| = |A| + |B| − |A ∩ B|.
    Cost is proportional to candidate pairs, not all pairs.
    """
    # Shuffle 64-bit shingle hashes, not shingle strings — set sizes and
    # intersections are preserved (collisions are negligible at per-doc
    # set sizes) and the join compares longs instead of variable-width
    # strings. ``pre_hashed=True`` skips the hashing when the caller
    # already deduped on hashes.
    if pre_hashed:
        shh = sh
    else:
        shh = sh.select(F.col(id_col), F.xxhash64("shingle").alias("shingle"))
    sizes = shh.groupBy(id_col).agg(F.count(F.lit(1)).alias("sz"))
    inter = (
        pairs.join(shh.select(F.col(id_col).alias("id_a"), "shingle"), "id_a")
        .join(shh.select(F.col(id_col).alias("id_b"), F.col("shingle").alias("shingle")), ["id_b", "shingle"])
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    return (
        pairs.join(inter, ["id_a", "id_b"], "left")
        .na.fill({"inter": 0})
        .join(sizes.select(F.col(id_col).alias("id_a"), F.col("sz").alias("sz_a")), "id_a")
        .join(sizes.select(F.col(id_col).alias("id_b"), F.col("sz").alias("sz_b")), "id_b")
        .withColumn(
            "jaccard",
            F.round(F.col("inter") / (F.col("sz_a") + F.col("sz_b") - F.col("inter")), 6),
        )
        .select("id_a", "id_b", "inter", "sz_a", "sz_b", "jaccard")
    )


def minhash_dedup_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    col: str = "text",
    k: int = 8,
    rows_per_band: int = 2,
    n: int = 3,
    threshold: float = 0.8,
) -> DataFrame:
    """Full near-dup flow: MinHash -> LSH candidates -> exact Jaccard
    filter at ``threshold``."""
    # ONE scan+explode feeds both the signature aggregation and the
    # exact-Jaccard shingle set (they were two separate document scans
    # before — at 100 TB the scan is the dominant cost of this stage).
    # The shingle set dedups on the 64-bit hash so the distinct
    # shuffles longs, not strings; min() is idempotent so signatures
    # aggregate the raw (undeduped) explosion directly.
    sh_raw = (
        spread(df)
        .select(F.col(id_col), F.explode(shingles(col, n)).alias("shingle"))
        .persist()
    )
    aggs = [
        F.min(F.md5(F.concat(F.lit(f"{i}|"), F.col("shingle")))).alias(f"mh{i}")
        for i in range(k)
    ]
    sig = sh_raw.groupBy(id_col).agg(*aggs)
    cand = lsh_candidate_pairs(sig, id_col, k, rows_per_band).persist()
    sh = (
        sh_raw.select(F.col(id_col), F.xxhash64("shingle").alias("shingle"))
        .dropDuplicates()
        .persist()
    )
    return jaccard_for_pairs(cand, sh, id_col, pre_hashed=True).filter(
        F.col("jaccard") >= threshold
    )


# --- SimHash ---------------------------------------------------------
SIMHASH_BITS = 60  # 15 hex chars of md5 -> fits signed int64


def simhash(df: DataFrame, id_col: str = "doc_id", col: str = "text") -> DataFrame:
    """60-bit SimHash over tokens: per token take md5's top 60 bits;
    per bit position sum ±1 across tokens; sign -> signature bit.
    Pure expression pipeline: explode -> conv -> bit tests -> one
    aggregation by doc (60 small sums) -> bit reassembly.
    """
    tok = spread(df).select(
        F.col(id_col), F.explode(tokens(col)).alias("tok")
    ).withColumn("h", F.conv(F.substring(F.md5("tok"), 1, 15), 16, 10).cast("bigint"))
    aggs = [
        F.sum(
            F.when(F.shiftright(F.col("h"), i).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
        ).alias(f"b{i}")
        for i in range(SIMHASH_BITS)
    ]
    per_doc = tok.groupBy(id_col).agg(*aggs)
    sig = None
    for i in range(SIMHASH_BITS):
        bit = F.when(F.col(f"b{i}") > 0, F.lit(2**i).cast("bigint")).otherwise(F.lit(0).cast("bigint"))
        sig = bit if sig is None else (sig + bit)
    return per_doc.select(F.col(id_col), sig.alias("simhash"))


def hamming_distance(a: Column, b: Column) -> Column:
    """Popcount of XOR via bit_count (JVM builtin)."""
    return F.bit_count(a.bitwiseXOR(b))


def simhash_neardup_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    col: str = "text",
    max_hamming: int = 6,
    n_bands: int = 4,
) -> DataFrame:
    """SimHash near-dup pairs with band blocking: split the 60-bit
    signature into ``n_bands`` 15-bit bands; by pigeonhole, any pair
    within ``max_hamming`` < n_bands*... shares at least one identical
    band when max_hamming < n_bands, and in practice banding prunes the
    pair space by ~2^15 per band. Candidates join on (band, band_value),
    then the exact Hamming filter runs on candidates only — the same
    candidate-then-verify shape as MinHash-LSH, so the quadratic pair
    space is never materialized.
    """
    bits_per_band = SIMHASH_BITS // n_bands
    sig = simhash(df, id_col, col)
    bands = F.array(*[
        F.struct(
            F.lit(b).alias("band"),
            F.shiftright(F.col("simhash"), b * bits_per_band)
            .bitwiseAND(F.lit((1 << bits_per_band) - 1))
            .alias("bval"),
        )
        for b in range(n_bands)
    ])
    banded = (
        sig.select(F.col(id_col), F.col("simhash"), F.explode(bands).alias("bb"))
        .select(F.col(id_col), F.col("simhash"), F.col("bb.band").alias("band"), F.col("bb.bval").alias("bval"))
        .persist()
    )
    a, b = banded.alias("a"), banded.alias("b")
    return (
        a.join(b, on=["band", "bval"])
        .filter(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            hamming_distance(F.col("a.simhash"), F.col("b.simhash")).alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .dropDuplicates(["id_a", "id_b"])
    )


# --- embedding-cosine near-dup ---------------------------------------
def embedding_neardup_pairs(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    block_col: str | None = None,
    threshold: float = 0.9,
) -> DataFrame:
    """Near-duplicate pairs by embedding cosine. ``block_col`` bounds
    the self-join (same-block pairs only) — at scale use an LSH/IVF
    assignment as the block (see pipelines.similarity); brute force
    all-pairs is only for tests.
    """
    from social_link_prediction_spark.pipelines.similarity import cosine_similarity

    cols = [F.col(id_col).alias("id"), F.col(vec_col).cast("array<double>").alias("v")]
    if block_col:
        cols.append(F.col(block_col).alias("blk"))
    e = emb.select(*cols)
    a, b = e.alias("a"), e.alias("b")
    on = [F.col("a.blk") == F.col("b.blk")] if block_col else []
    pairs = a.join(b, on=on) if on else a.crossJoin(b)
    pairs = pairs.filter(F.col("a.id") < F.col("b.id"))
    cos = cosine_similarity(F.col("a.v"), F.col("b.v"))
    return (
        pairs.select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.round(cos, 6).alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
    )


# --- dedup clustering ------------------------------------------------
def neardup_clusters(
    df: DataFrame, pairs: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """Collapse near-duplicate PAIRS (id_a, id_b — from any detector:
    MinHash-LSH, SimHash, winnowing, embedding cosine) into duplicate
    CLUSTERS: (id, cluster, is_canonical), one row per document,
    cluster = min document id reachable through the pair graph,
    singletons cluster with themselves. The keep-one-per-cluster
    decision a training-data pipeline actually executes is
    ``is_canonical`` — filter on it to dedup the corpus.

    Components by min-label propagation (graph.pagerank.
    connected_components): rounds ≈ duplicate-chain diameter, one
    shuffle per round — no per-cluster collect, so a 100 TB corpus
    with millions of tiny clusters stays fully distributed.
    """
    from social_link_prediction_spark.graph.pagerank import connected_components

    cc = connected_components(
        pairs.select(F.col("id_a").alias("src"), F.col("id_b").alias("dst"))
    )
    return (
        df.select(F.col(id_col).alias("id"))
        .join(cc, "id", "left")
        .select(
            "id",
            F.coalesce(F.col("component"), F.col("id")).alias("cluster"),
        )
        .withColumn("is_canonical", (F.col("id") == F.col("cluster")).cast("int"))
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    col: str = "text",
    n: int = 3,
    threshold: float = 0.5,
    max_doc_freq: int | None = None,
) -> DataFrame:
    """Exact all-pairs n-gram Jaccard via an inverted index: join docs
    on shared shingles (cost ∝ Σ df(shingle)², never |docs|²), count
    intersections, derive |A∪B| = |A|+|B|−|A∩B|. The LSH-free exact
    complement to :func:`minhash_dedup_pairs` — right when recall must
    be 1.0 (audits, eval sets) and the shingle df distribution is sane.

    ``max_doc_freq`` drops stop-shingles (shingles present in more
    than that many documents) BEFORE the join — the df² blowup on a
    ubiquitous shingle is this operator's skew failure mode at scale.
    Sizes are computed after the cap, so Jaccard is over the capped
    shingle sets on both engine and oracle sides.
    """
    sh = shingle_table(df, id_col, col, n)
    if max_doc_freq is not None:
        keep = (
            sh.groupBy("shingle")
            .agg(F.count(F.lit(1)).alias("df"))
            .filter(F.col("df") <= max_doc_freq)
            .select("shingle")
        )
        sh = sh.join(keep, "shingle", "left_semi")
    # join/aggregate on 64-bit shingle hashes, not strings (sizes and
    # intersections preserved; collisions negligible at per-doc scale)
    shh = sh.select(F.col(id_col), F.xxhash64("shingle").alias("h")).persist()
    sizes = shh.groupBy(id_col).agg(F.count(F.lit(1)).alias("sz"))
    a = shh.select(F.col(id_col).alias("id_a"), "h")
    b = shh.select(F.col(id_col).alias("id_b"), "h")
    inter = (
        a.join(b, "h")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    return (
        inter.join(sizes.select(F.col(id_col).alias("id_a"), F.col("sz").alias("sz_a")), "id_a")
        .join(sizes.select(F.col(id_col).alias("id_b"), F.col("sz").alias("sz_b")), "id_b")
        .withColumn(
            "jaccard",
            F.round(F.col("inter") / (F.col("sz_a") + F.col("sz_b") - F.col("inter")), 6),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "inter", "sz_a", "sz_b", "jaccard")
    )


def lsh_collision_probability(s: float, bands: int, rows: int) -> float:
    """P(two docs with MinHash-Jaccard similarity ``s`` share at least
    one LSH band bucket) = 1 - (1 - s^rows)^bands — the S-curve that
    governs the banding trade-off (Leskovec/Rajaraman/Ullman, Mining
    of Massive Datasets §3.4)."""
    if not 0.0 <= s <= 1.0:
        raise ValueError(f"similarity must be in [0, 1], got {s}")
    return 1.0 - (1.0 - s**rows) ** bands


def lsh_band_plan(n_hashes: int, threshold: float) -> tuple[int, int]:
    """Choose (bands, rows_per_band) for an ``n_hashes``-permutation
    MinHash signature so the banding S-curve's midpoint sits closest
    to ``threshold``: over all factorizations b*r = n_hashes, minimize
    |(1/b)^(1/r) - threshold| (the curve's inflection approximation),
    breaking ties toward more bands (higher recall at the threshold —
    the safer default for dedup, where a missed duplicate is worse
    than an extra verified candidate pair). Drive
    :func:`lsh_candidate_pairs`'s n_bands/rows choice from this
    instead of hand-picking."""
    if n_hashes < 1:
        raise ValueError("n_hashes must be positive")
    if not 0.0 < threshold < 1.0:
        raise ValueError(f"threshold must be in (0, 1), got {threshold}")
    best = None
    for rows in range(1, n_hashes + 1):
        if n_hashes % rows:
            continue
        bands = n_hashes // rows
        approx = (1.0 / bands) ** (1.0 / rows)
        key = (abs(approx - threshold), -bands)
        if best is None or key < best[0]:
            best = (key, (bands, rows))
    return best[1]


def minhash_dedup_auto(
    df: DataFrame,
    threshold: float,
    n_hashes: int = 8,
    id_col: str = "doc_id",
    col: str = "text",
    n: int = 3,
) -> DataFrame:
    """Threshold-driven near-dup pairs: pick the LSH banding from
    :func:`lsh_band_plan` (S-curve midpoint nearest ``threshold``)
    and run the full MinHash → banded candidates → exact-Jaccard
    flow. The one-knob entry point a pipeline author actually wants —
    "dedup at 0.8" — with the bands/rows trade-off derived instead of
    hand-tuned."""
    _bands, rows_per_band = lsh_band_plan(n_hashes, threshold)
    return minhash_dedup_pairs(
        df,
        id_col=id_col,
        col=col,
        k=n_hashes,
        rows_per_band=rows_per_band,
        n=n,
        threshold=threshold,
    )


def quality_survivors(
    df: DataFrame,
    pairs: DataFrame,
    score: Column,
    id_col: str = "doc_id",
) -> DataFrame:
    """Quality-aware survivor selection: cluster near-duplicate pairs
    (any detector's output) with :func:`neardup_clusters`, then keep
    the HIGHEST-SCORING member of each cluster instead of the min-id
    one — "keep the best copy, not the first copy", the C4/RefinedWeb-
    style refinement of dedup (boilerplate-stripped or longer variants
    of a duplicated page survive over truncated mirrors). Deterministic
    tie-break on id. Returns one row per document: (id, cluster,
    score, is_survivor).

    The per-cluster argmax is a window rank over the cluster key —
    cluster sizes are duplicate-family sizes (small by construction),
    so the rank never sees a skewed partition; everything stays
    distributed."""
    from pyspark.sql import Window

    cl = neardup_clusters(df, pairs, id_col)
    scored = df.select(F.col(id_col).alias("id"), score.alias("score")).join(
        cl.select("id", "cluster"), "id"
    )
    w = Window.partitionBy("cluster").orderBy(F.col("score").desc(), F.col("id"))
    return (
        scored.withColumn(
            "is_survivor", (F.row_number().over(w) == 1).cast("int")
        )
        .select("id", "cluster", "score", "is_survivor")
    )


def ppjoin_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    col: str = "text",
    threshold: float = 0.8,
    ngram: int | None = None,
) -> DataFrame:
    """Prefix-filtered set-similarity self-join (PPJoin family —
    Chaudhuri et al. 2006 SSJoin; Vernica et al. 2010, the canonical
    MapReduce/Spark formulation): all document pairs whose DISTINCT-
    token Jaccard >= threshold, without the all-pairs join.

    Every document orders its token set by ascending global document
    frequency (rarest first, token tie-break) and indexes only its
    PREFIX of length |x| - ceil(t*|x|) + 1. Two sets with J >= t must
    overlap in >= t*|x| tokens, which cannot fit entirely in the
    (shorter) suffix — so sharing a prefix token is a COMPLETE
    candidate filter (no false negatives; the oracle computes exact
    all-pairs Jaccard, so a green row is a machine-checked
    completeness proof). Candidates are then verified exactly, with
    the intersection join bounded to candidate pairs only.

    Scale shape: the inverted index carries prefixes only (the
    (1-t)-fraction rarest tokens of each set), so the join-key
    frequency of a stop token never explodes — the df-ascending order
    is precisely what keeps prefix buckets small. ``ngram`` switches
    the set elements from unigram tokens to word n-gram shingles
    (far more discriminative on small-vocabulary corpora). Returns
    (id_a, id_b, inter, union_sz, jaccard) with id_a < id_b."""
    from social_link_prediction_spark.pipelines.text import tokens

    elems = tokens(col) if ngram is None else shingles(col, ngram)
    toks = (
        df.select(F.col(id_col).alias("id"), F.explode(elems).alias("t"))
        .dropDuplicates()
    )
    toks.persist()
    dfg = toks.groupBy("t").agg(F.count(F.lit(1)).alias("df"))
    sz = toks.groupBy("id").agg(F.count(F.lit(1)).alias("sz"))
    from pyspark.sql import Window

    w = Window.partitionBy("id").orderBy(F.col("df").asc(), F.col("t").asc())
    ranked = (
        toks.join(F.broadcast(dfg), "t")
        .withColumn("pos", F.row_number().over(w))
        .join(F.broadcast(sz), "id")
    )
    prefix = ranked.filter(
        F.col("pos") <= F.col("sz") - F.ceil(F.lit(threshold) * F.col("sz")) + 1
    ).select("id", "t")
    cand = (
        prefix.select(F.col("id").alias("id_a"), "t")
        .join(prefix.select(F.col("id").alias("id_b"), "t"), "t")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .dropDuplicates()
    )
    inter = (
        cand.join(toks.select(F.col("id").alias("id_a"), "t"), "id_a")
        .join(toks.select(F.col("id").alias("id_b"), "t"), ["id_b", "t"])
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    return (
        inter.join(
            F.broadcast(sz.select(F.col("id").alias("id_a"), F.col("sz").alias("sz_a"))),
            "id_a",
        )
        .join(
            F.broadcast(sz.select(F.col("id").alias("id_b"), F.col("sz").alias("sz_b"))),
            "id_b",
        )
        .withColumn("union_sz", F.col("sz_a") + F.col("sz_b") - F.col("inter"))
        .withColumn(
            "jaccard", F.round(F.col("inter") / F.col("union_sz"), 6)
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "inter", "union_sz", "jaccard")
    )
