"""Candidate: hybrid_rrf_search_docs with the two multi-referenced
expensive frames pinned: the md5 hashed-embedding table (its per-token
md5 subtree executes twice — once under the broadcast query-vector
branch, once for the scored corpus) and the doc-length table (consumed
by the avgdl broadcast and the bm join, re-running the tokenize
explode each time)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from social_link_prediction_spark.catalog.c01 import _t
from social_link_prediction_spark.catalog.c04 import (
    _BM25_B, _BM25_K1, _BM25_TERMS, _RETR_DIM, _RRF_DEPTH, _RRF_K,
)
from social_link_prediction_spark.pipelines import similarity as sim
from social_link_prediction_spark.pipelines import text as ptx


def candidate(spark: SparkSession, sf_dir: str) -> DataFrame:
    from social_link_prediction_spark.ml import features as mlf

    docs = _t(spark, sf_dir, "documents")
    tok = docs.select("doc_id", F.explode(ptx.tokens("text")).alias("t"))
    dl = (
        tok.groupBy("doc_id").agg(F.count(F.lit(1)).alias("dl"))
        .localCheckpoint()
    )
    avgdl = dl.agg(F.avg("dl").alias("avgdl"))
    n = docs.agg(F.count(F.lit(1)).alias("n"))
    tf = (
        tok.filter(F.col("t").isin(_BM25_TERMS))
        .groupBy("doc_id", "t")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    df_ = tf.groupBy("t").agg(F.count(F.lit(1)).alias("df"))
    idf = F.log((F.col("n") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1)
    denom = F.col("tf") + _BM25_K1 * (
        1 - _BM25_B + _BM25_B * F.col("dl") / F.col("avgdl")
    )
    bm = (
        tf.join(F.broadcast(df_), "t")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(avgdl))
        .crossJoin(F.broadcast(n))
        .groupBy("doc_id")
        .agg(
            F.round(
                F.sum(idf * F.col("tf") * (_BM25_K1 + 1) / denom), 6
            ).alias("s")
        )
        .orderBy(F.col("s").desc(), "doc_id")
        .limit(_RRF_DEPTH)
    )
    bm_rank = bm.withColumn(
        "rb", F.row_number().over(Window.orderBy(F.col("s").desc(), "doc_id"))
    ).select("doc_id", "rb")

    emb = mlf.hashed_text_embedding(
        docs, "text", dim=_RETR_DIM, id_col="doc_id", hash_fn="md5"
    ).localCheckpoint()
    q = emb.filter(F.col("doc_id") == 0).select(F.col("embedding").alias("qv"))
    cos = sim.dot(
        F.col("qv").cast("array<double>"), F.col("embedding").cast("array<double>")
    )
    scored = (
        emb.filter(F.col("doc_id") != 0)
        .crossJoin(F.broadcast(q))
        .select("doc_id", F.round(cos, 6).alias("cosine"))
        .orderBy(F.col("cosine").desc(), "doc_id")
        .limit(_RRF_DEPTH)
    )
    emb_rank = scored.withColumn(
        "re",
        F.row_number().over(Window.orderBy(F.col("cosine").desc(), "doc_id")),
    ).select("doc_id", "re")

    fused = (
        bm_rank.join(emb_rank, "doc_id", "full_outer")
        .select(
            "doc_id",
            F.round(
                F.coalesce(1.0 / (_RRF_K + F.col("rb")), F.lit(0.0))
                + F.coalesce(1.0 / (_RRF_K + F.col("re")), F.lit(0.0)),
                6,
            ).alias("rrf"),
            F.col("rb").cast("long").alias("bm25_rank"),
            F.col("re").cast("long").alias("embedding_rank"),
        )
    )
    return fused.orderBy(F.col("rrf").desc(), "doc_id").limit(10)
