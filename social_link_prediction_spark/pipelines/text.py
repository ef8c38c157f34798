"""Text-analysis operators over a documents table.

All JVM-side expressions (split/filter/aggregate higher-order
functions) — no Python UDF anywhere, so these run at scan speed and
whole-stage-codegen at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# Tiny per-language stopword dictionaries for the n-gram/stopword
# language-ID heuristic. Deterministic and SQL-expressible — parity
# with the DuckDB oracle matters more than linguistic coverage; swap
# in bigger dictionaries for production use.
LANG_STOPWORDS: dict[str, list[str]] = {
    "de": ["der", "die", "und", "das", "ist", "nicht"],
    "en": ["the", "and", "of", "to", "is", "a"],
    "es": ["el", "la", "de", "que", "y", "los"],
    "fr": ["le", "la", "et", "les", "des", "une"],
}

# BPE-ish token pattern: letter runs, digit runs, or single punctuation
TOKEN_PATTERN = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"


def tokens(col: Column | str, sep: str = " ") -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.filter(F.split(c, sep), lambda t: t != "")


def text_stats(df: DataFrame, col: str = "text") -> DataFrame:
    """Quality-scoring features: token count, distinct-token ratio,
    mean token length, punctuation ratio, stopword ratio. One
    projection, no shuffle."""
    toks = tokens(col)
    n = F.size(toks)
    en = F.array([F.lit(w) for w in LANG_STOPWORDS["en"]])
    punct = F.size(F.filter(toks, lambda t: t.rlike("^[^A-Za-z0-9]+$")))
    stop = F.size(F.filter(toks, lambda t: F.array_contains(en, t)))
    return df.withColumn("n_tokens", n).withColumn(
        "distinct_ratio", F.round(F.size(F.array_distinct(toks)) / n, 6)
    ).withColumn(
        "mean_token_len",
        F.round(
            F.aggregate(toks, F.lit(0).cast("long"), lambda acc, t: acc + F.length(t)) / n, 6
        ),
    ).withColumn("punct_ratio", F.round(punct / n, 6)).withColumn(
        "stopword_ratio", F.round(stop / n, 6)
    )


def token_count_regex(col: Column | str = "text") -> Column:
    """Token-count estimate via the BPE-ish regex (JVM regexp_extract_all)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.size(F.regexp_extract_all(c, F.lit(TOKEN_PATTERN), F.lit(0)))


def language_id(df: DataFrame, col: str = "text", out: str = "lang_pred") -> DataFrame:
    """Stopword-hit language ID. Rule (mirrored exactly in the oracle):
    count tokens hitting each language's dictionary; predict the
    argmax, alphabetical language-code order breaking ties; zero hits
    everywhere -> 'unknown'."""
    toks = tokens(col)

    def _hits(arr: Column) -> Column:
        # helper binds `arr` properly: a two-parameter lambda would be
        # interpreted by F.filter as (element, index)
        return F.size(F.filter(toks, lambda t: F.array_contains(arr, t)))

    hit_cols = {}
    for lang, words in LANG_STOPWORDS.items():
        hit_cols[lang] = _hits(F.array([F.lit(w) for w in words]))
    best = F.greatest(*hit_cols.values())
    expr = F.when(best == 0, F.lit("unknown"))
    for lang in sorted(hit_cols):  # alphabetical tie-break
        expr = expr.when(hit_cols[lang] == best, F.lit(lang))
    return df.withColumn(out, expr)


def fingerprint(df: DataFrame, col: str = "text", out: str = "fingerprint") -> DataFrame:
    """Content fingerprint: md5 of the whitespace-normalized document.
    Rolling/shingle-level fingerprints live in pipelines.dedup
    (a fingerprint is a k=1 MinHash)."""
    norm = F.concat_ws(" ", tokens(col))
    return df.withColumn(out, F.md5(norm))


# --- Winnowing fingerprints (rolling hash; Schleimer et al. 2003 "MOSS")
WINNOW_BASE = 257


def winnow_fingerprints(
    df: DataFrame,
    col: str = "text",
    k: int = 7,
    window: int = 4,
    id_col: str = "doc_id",
    base: int = WINNOW_BASE,
) -> DataFrame:
    """Winnowing document fingerprints: the distinct minima of every
    ``window`` consecutive k-gram polynomial rolling hashes over the
    normalized (lowercased, non-alphanumerics stripped) document.
    Guarantees any shared substring of length ≥ k + window − 1 yields
    a shared fingerprint — the substring-robust dedup signal
    md5-style whole-doc hashing (``fingerprint``) can't give.
    Returns exploded (id, fp) rows: at 100 TB that layout feeds a
    shuffle-join near-dup detector directly and never materializes
    per-doc arrays downstream.

    Exact 64-bit Horner arithmetic, all JVM-side higher-order
    functions (no UDF); max hash ~122·base^(k-1), so k ≤ 8 stays
    clear of BIGINT overflow under ANSI mode.

    Implementation notes (both load-bearing for performance and
    correctness):
    - Each stage's array is materialized through a ``select`` boundary
      before the next stage's lambdas index into it. Inlining the
      normalized string into the per-gram lambdas instead re-evaluates
      the regexp per character and is catastrophically slow (HOF
      lambdas are interpreted, not codegen'd, and get no common
      subexpression elimination).
    - ``split(s, '(?!^)')`` keeps a trailing empty element (Java split
      with limit=-1), which would inject a spurious 0 char-code — the
      ``filter`` strips it.
    - ``sequence(1, n)`` DESCENDS for n < 1, so short documents
      short-circuit to an empty array explicitly.
    """
    s = F.regexp_replace(F.lower(F.col(col)), "[^a-z0-9]", "")
    chars = df.select(
        F.col(id_col).alias("id"),
        F.transform(
            F.filter(F.split(s, "(?!^)"), lambda c: c != F.lit("")), F.ascii
        ).alias("codes"),
    )
    codes = F.col("codes")
    gram_hashes = F.transform(
        F.sequence(F.lit(1), F.size(codes) - F.lit(k - 1)),
        lambda i: F.aggregate(
            F.slice(codes, i, k),
            F.lit(0).cast("long"),
            lambda acc, x: acc * base + x,
        ),
    )
    grams = chars.select(
        "id",
        F.when(F.size(codes) >= k, gram_hashes)
        .otherwise(F.array().cast("array<bigint>"))
        .alias("gh"),
    )
    gh = F.col("gh")
    minima = F.transform(
        F.sequence(F.lit(1), F.size(gh) - F.lit(window - 1)),
        lambda i: F.array_min(F.slice(gh, i, window)),
    )
    fps = grams.select(
        "id",
        F.when(F.size(gh) >= window, minima)
        .otherwise(F.array().cast("array<bigint>"))
        .alias("fps"),
    )
    return fps.select("id", F.explode(F.array_distinct("fps")).alias("fp"))


def winnow_neardup_pairs(
    df: DataFrame,
    col: str = "text",
    k: int = 7,
    window: int = 4,
    min_shared: int = 3,
    id_col: str = "doc_id",
    max_bucket: int = 1000,
) -> DataFrame:
    """Near-duplicate pairs by shared winnowing fingerprints (id_a <
    id_b, ≥ min_shared common fingerprints). The fingerprint equi-join
    is the blocking step: only docs sharing a fingerprint ever meet,
    so cost tracks fingerprint collisions, not |docs|².

    ``max_bucket`` is the skew guard (same device as
    dedup.lsh_candidate_pairs): a fingerprint shared by more than
    ``max_bucket`` documents — site boilerplate, license headers, the
    empty-ish document class — would alone emit O(bucket²) pairs from
    one task; such "stop fingerprints" are dropped before the
    self-join, exactly as MinHash pipelines drop stop shingles. The
    window count shuffles on ``fp``, pre-partitioning the frame on the
    self-join key, so the guard costs no extra exchange. A true
    near-dup pair sharing ≥ min_shared NON-degenerate fingerprints is
    unaffected; pairs held together only by boilerplate are exactly
    the ones a dedup pipeline should not flag."""
    fps = winnow_fingerprints(df, col, k=k, window=window, id_col=id_col)
    bucket_w = Window.partitionBy("fp")
    fps = (
        fps.withColumn("__n", F.count(F.lit(1)).over(bucket_w))
        .filter(F.col("__n") <= max_bucket)
        .drop("__n")
    )
    a, b = fps.alias("a"), fps.alias("b")
    return (
        a.join(b, (F.col("a.fp") == F.col("b.fp")) & (F.col("a.id") < F.col("b.id")))
        .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("shared_fps"))
        .filter(F.col("shared_fps") >= min_shared)
    )


# --- PII scrubbing ---------------------------------------------------
# Ordered (name, pattern, token): applied in sequence; SSN before
# phone because both are dashed digit runs (3-2-4 never matches the
# phone's 3-3-4, but fixed order makes the composition deterministic
# regardless). Patterns stay within the Java-regex / RE2 common subset
# ([0-9] classes, bounded repeats — no backrefs, no lookaround) so the
# same strings run on the engine and the DuckDB oracle.
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ssn", r"[0-9]{3}-[0-9]{2}-[0-9]{4}", "<SSN>"),
    ("phone", r"[0-9]{3}[-.][0-9]{3}[-.][0-9]{4}", "<PHONE>"),
    ("ipv4", r"[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}", "<IP>"),
]


def scrub_pii(
    df: DataFrame, col: str = "text", out: str = "text_scrubbed"
) -> DataFrame:
    """Redact PII spans (emails, SSNs, phone numbers, IPv4s) with
    typed placeholder tokens, and count redactions per type. Pure
    JVM regexp_replace / regexp_extract_all chain — codegen'd, scan
    speed, no UDF; the pattern list is the policy knob.

    Adds ``out`` (scrubbed text) and one ``n_<type>`` count column per
    pattern. Counts are measured on the ORIGINAL text but with earlier
    patterns' matches already removed (sequential application), so a
    string is only ever counted by the first pattern that owns it."""
    cur = F.col(col)
    counts = {}
    for name, pat, token in PII_PATTERNS:
        counts[name] = F.size(F.regexp_extract_all(cur, F.lit(pat), F.lit(0)))
        cur = F.regexp_replace(cur, pat, token)
    out_df = df.withColumn(out, cur)
    for name, c in counts.items():
        out_df = out_df.withColumn(f"n_{name}", c)
    return out_df


# --- quality filtering ----------------------------------------------
def quality_filter(
    df: DataFrame,
    col: str = "text",
    min_tokens: int = 10,
    max_tokens: int = 100_000,
    min_distinct_ratio: float = 0.1,
    max_punct_ratio: float = 0.3,
    min_mean_token_len: float = 2.0,
    max_mean_token_len: float = 12.0,
) -> DataFrame:
    """Gopher/C4-style heuristic quality gate over :func:`text_stats`
    features: length band, lexical diversity floor, punctuation-noise
    ceiling, mean-token-length band. Adds ``keep`` (1/0) and
    ``drop_reason`` (first failed rule in a fixed order, NULL when
    kept) — the reason column is what a pipeline operator reports to
    its data-quality dashboard. One projection; the stats and the
    verdict fuse into the same codegen stage."""
    stats = text_stats(df, col)
    rules = [
        ("too_short", F.col("n_tokens") < min_tokens),
        ("too_long", F.col("n_tokens") > max_tokens),
        ("low_diversity", F.col("distinct_ratio") < min_distinct_ratio),
        ("punct_noise", F.col("punct_ratio") > max_punct_ratio),
        ("token_len_low", F.col("mean_token_len") < min_mean_token_len),
        ("token_len_high", F.col("mean_token_len") > max_mean_token_len),
    ]
    reason = F.lit(None).cast("string")
    for name, cond in reversed(rules):
        reason = F.when(cond, F.lit(name)).otherwise(reason)
    return stats.withColumn("drop_reason", reason).withColumn(
        "keep", F.when(reason.isNull(), F.lit(1)).otherwise(F.lit(0))
    )


def lexicon_sentiment(
    df: DataFrame,
    lexicon: dict[str, float],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Lexicon-based sentiment scoring (the AFINN/VADER-family
    construction behind large-scale Spark sentiment pipelines, e.g.
    "Large Scale Sentiment Analysis on Twitter with Spark", EDBT 2016):
    score(doc) = sum of per-token lexicon valences / token count.
    Whole pipeline is JVM-side — explode tokens, broadcast-join the
    (tiny) lexicon, one aggregation keyed by doc — so it runs at
    corpus scale with the lexicon as the only driver-side object.
    Returns (id, n_tokens, valence_sum, sentiment)."""
    spark = df.sparkSession
    lex = F.broadcast(
        spark.createDataFrame(
            [(w, float(s)) for w, s in lexicon.items()], "w string, s double"
        )
    )
    tok = df.select(
        F.col(id_col).alias("id"), F.explode(tokens(text_col)).alias("w")
    )
    return (
        tok.join(lex, "w", "left")
        .groupBy("id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum(F.coalesce("s", F.lit(0.0))).alias("valence_sum"),
        )
        .withColumn("sentiment", F.col("valence_sum") / F.col("n_tokens"))
    )


def bpe_learn_merges(
    word_freqs: DataFrame,
    rounds: int = 5,
    word_col: str = "word",
    freq_col: str = "freq",
) -> DataFrame:
    """Distributed BPE merge learning (Sennrich, Haddow & Birch 2016
    — the tokenizer-training core every LLM data stack runs): per
    round, count adjacent symbol pairs over the frequency-weighted
    word table, pick the most frequent pair, merge it everywhere,
    repeat. State is the DISTINCT-WORD table (vocabulary-sized, never
    corpus-sized — the standard word-frequency formulation), so a
    100 TB corpus contributes one word-count aggregation up front and
    the merge loop touches only the vocabulary.

    Engine shape: each word's symbol sequence is a space-delimited
    string (" c a t "); pair counts are one explode + sum per round;
    the winning pair is a 1-row broadcast; the merge is TWO literal
    replace-all passes of " l r " → " lr " (one pass starves an
    immediately-following occurrence whose leading space the first
    replacement consumed; the second pass catches every survivor —
    on an odd same-symbol run the merge POSITIONS can differ from
    the textbook single greedy scan while the merge count matches,
    a deterministic convention both engines replay identically,
    which is what makes the loop oracle-checkable). Deterministic
    ties: (count DESC, left ASC, right ASC). Returns one row per
    round: (round, left, right, merged, pair_freq).
    """
    w = word_freqs.select(
        F.concat(
            F.lit(" "),
            F.regexp_replace(F.col(word_col), "(.)", "$1 "),
        ).alias("sym"),
        F.col(freq_col).cast("long").alias("freq"),
    )
    out = None
    for r in range(1, rounds + 1):
        toks = F.filter(F.split(F.col("sym"), " "), lambda t: t != "")
        pair_arr = F.when(
            F.size(toks) >= 2,
            F.expr(
                "transform(sequence(0, size(filter(split(sym, ' '), "
                "t -> t != '')) - 2), i -> struct("
                "element_at(filter(split(sym, ' '), t -> t != ''), i + 1)"
                " AS pl, "
                "element_at(filter(split(sym, ' '), t -> t != ''), i + 2)"
                " AS pr))"
            ),
        ).otherwise(F.array().cast("array<struct<pl:string,pr:string>>"))
        pairs = (
            w.select(F.explode(pair_arr).alias("p"), "freq")
            .groupBy(F.col("p.pl").alias("pl"), F.col("p.pr").alias("pr"))
            .agg(F.sum("freq").alias("cnt"))
        )
        best = (
            pairs.orderBy(F.col("cnt").desc(), "pl", "pr")
            .limit(1)
            .select("pl", "pr", "cnt")
            .localCheckpoint()
        )
        row = best.select(
            F.lit(r).cast("long").alias("round"),
            F.col("pl").alias("left"),
            F.col("pr").alias("right"),
            F.concat("pl", "pr").alias("merged"),
            F.col("cnt").cast("long").alias("pair_freq"),
        )
        out = row if out is None else out.unionByName(row)
        needle = F.concat(F.lit(" "), "pl", F.lit(" "), "pr", F.lit(" "))
        merged = F.concat(F.lit(" "), "pl", "pr", F.lit(" "))
        w = (
            w.crossJoin(F.broadcast(best))
            .select(
                F.replace(
                    F.replace(F.col("sym"), needle, merged), needle, merged
                ).alias("sym"),
                "freq",
            )
            .localCheckpoint()
        )
    return out
