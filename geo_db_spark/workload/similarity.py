"""Similarity-search workload entries over the `embeddings` table."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from geo_db_spark.io import load
from geo_db_spark.operators.similarity import cosine_topk_bruteforce, int_dot, with_quantized
from geo_db_spark.session import tune

_QUANT_SQL = "list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 1048576) AS BIGINT))"
_DOT_SQL = "CAST(list_sum(list_transform(list_zip(a.q, b.q), p -> p[1] * p[2])) AS BIGINT)"


def ann_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact top-5 cosine neighbors for the first 10 vectors (brute force
    baseline; queries broadcast, corpus scanned once)."""
    tune(spark)
    emb = load(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    return cosine_topk_bruteforce(emb, queries, k=5)


ORACLE_ANN = f"""
WITH qe AS (
  SELECT vec_id, {_QUANT_SQL} AS q FROM embeddings
),
normed AS (
  SELECT vec_id, q,
         CAST(list_sum(list_transform(q, x -> x * x)) AS BIGINT) AS n
  FROM qe
)
SELECT a.vec_id AS q_id, b.vec_id AS neighbor_id,
       CAST({_DOT_SQL} AS DOUBLE) / (sqrt(CAST(a.n AS DOUBLE)) * sqrt(CAST(b.n AS DOUBLE))) AS cosine,
       CAST(row_number() OVER (
           PARTITION BY a.vec_id
           ORDER BY CAST({_DOT_SQL} AS DOUBLE) / (sqrt(CAST(a.n AS DOUBLE)) * sqrt(CAST(b.n AS DOUBLE))) DESC,
                    b.vec_id) AS INT) AS rank
FROM normed a JOIN normed b ON a.vec_id < 10 AND a.vec_id <> b.vec_id
QUALIFY rank <= 5
"""


def embedding_near_dup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-duplicate pairs (cosine > 0.3) blocked by the label column —
    the blocked-join shape that keeps near-dup detection feasible at
    corpus scale (all-pairs only within a block, never globally)."""
    tune(spark)
    emb = with_quantized(load(spark, sf_dir, "embeddings"))
    a = emb.select(
        F.col("label"),
        F.col("vec_id").alias("id_a"),
        F.col("q").alias("q_a"),
        F.col("qnorm").alias("n_a"),
    )
    b = emb.select(
        F.col("label"),
        F.col("vec_id").alias("id_b"),
        F.col("q").alias("q_b"),
        F.col("qnorm").alias("n_b"),
    )
    pairs = a.join(b, ["label"]).filter(F.col("id_a") < F.col("id_b"))
    cos = int_dot(F.col("q_a"), F.col("q_b")).cast("double") / (
        F.sqrt(F.col("n_a").cast("double")) * F.sqrt(F.col("n_b").cast("double"))
    )
    return (
        pairs.withColumn("cosine", cos)
        .filter(F.col("cosine") > 0.3)
        .select("label", "id_a", "id_b", "cosine")
    )


ORACLE_NEAR_DUP = f"""
WITH qe AS (
  SELECT vec_id, label, {_QUANT_SQL} AS q FROM embeddings
),
normed AS (
  SELECT vec_id, label, q,
         CAST(list_sum(list_transform(q, x -> x * x)) AS BIGINT) AS n
  FROM qe
)
SELECT a.label AS label, a.vec_id AS id_a, b.vec_id AS id_b,
       CAST({_DOT_SQL} AS DOUBLE) / (sqrt(CAST(a.n AS DOUBLE)) * sqrt(CAST(b.n AS DOUBLE))) AS cosine
FROM normed a JOIN normed b ON a.label = b.label AND a.vec_id < b.vec_id
WHERE CAST({_DOT_SQL} AS DOUBLE) / (sqrt(CAST(a.n AS DOUBLE)) * sqrt(CAST(b.n AS DOUBLE))) > 0.3
"""


QUERIES = {
    "ann_cosine_topk": ann_cosine_topk,
    "embedding_near_dup_pairs": embedding_near_dup_pairs,
}

ORACLES = {
    "ann_cosine_topk": ORACLE_ANN,
    "embedding_near_dup_pairs": ORACLE_NEAR_DUP,
}
