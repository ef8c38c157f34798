"""Text-analysis operators over a documents table.

All JVM-side expressions (split/filter/aggregate higher-order
functions) — no Python UDF anywhere, so these run at scan speed and
whole-stage-codegen at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
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
