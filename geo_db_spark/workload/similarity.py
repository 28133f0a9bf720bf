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


# sign-LSH: one bucket bit per probed dimension (0-based dims; DuckDB
# lists are 1-based, hence d+1 in the oracle). At corpus scale the join
# is bucket-local: 8 bits ~ 256 buckets -> ~n/256 candidates per query
# instead of n.
LSH_DIMS = (0, 8, 16, 24, 32, 40, 48, 56)


def ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate top-3 cosine neighbors via sign-LSH bucketing: only
    candidates in the query's bucket are scored (recall < exact by
    design; the oracle runs the same algorithm)."""
    from pyspark.sql import Window

    from geo_db_spark.operators.similarity import cosine_from_quantized, int_dot, with_quantized

    tune(spark)
    emb = with_quantized(load(spark, sf_dir, "embeddings"))
    bucket = None
    for i, d in enumerate(LSH_DIMS):
        bit = F.when(F.get(F.col("embedding"), d) >= 0, F.lit(1 << i)).otherwise(F.lit(0))
        bucket = bit if bucket is None else bucket + bit
    emb = emb.withColumn("bucket", bucket.cast("long"))
    c = emb.select(F.col("bucket"), F.col("vec_id").alias("c_id"), F.col("q").alias("c_q"), F.col("qnorm").alias("c_n"))
    qs = emb.filter(F.col("vec_id") < 10).select(
        F.col("bucket"), F.col("vec_id").alias("q_id"), F.col("q").alias("q_q"), F.col("qnorm").alias("q_n")
    )
    pairs = c.join(F.broadcast(qs), "bucket").filter(F.col("c_id") != F.col("q_id"))
    cos = cosine_from_quantized(int_dot(F.col("c_q"), F.col("q_q")), F.col("q_n"), F.col("c_n"))
    w = Window.partitionBy("q_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id"))
    return (
        pairs.select("q_id", F.col("c_id").alias("neighbor_id"), cos.alias("cosine"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 3)
        .select("q_id", "neighbor_id", "cosine", F.col("rank").cast("int").alias("rank"))
    )


_BUCKET_SQL = " + ".join(
    f"CASE WHEN embedding[{d + 1}] >= 0 THEN {1 << i} ELSE 0 END" for i, d in enumerate(LSH_DIMS)
)

ORACLE_ANN_LSH = f"""
WITH qe AS (
  SELECT vec_id, CAST({_BUCKET_SQL} AS BIGINT) AS bucket, {_QUANT_SQL} AS q
  FROM embeddings
),
normed AS (
  SELECT vec_id, bucket, q,
         CAST(list_sum(list_transform(q, x -> x * x)) AS BIGINT) AS n
  FROM qe
)
SELECT a.vec_id AS q_id, b.vec_id AS neighbor_id,
       CAST({_DOT_SQL} AS DOUBLE) / (sqrt(CAST(a.n AS DOUBLE)) * sqrt(CAST(b.n AS DOUBLE))) AS cosine,
       CAST(row_number() OVER (
           PARTITION BY a.vec_id
           ORDER BY CAST({_DOT_SQL} AS DOUBLE) / (sqrt(CAST(a.n AS DOUBLE)) * sqrt(CAST(b.n AS DOUBLE))) DESC,
                    b.vec_id) AS INT) AS rank
FROM normed a JOIN normed b ON a.bucket = b.bucket AND a.vec_id < 10 AND a.vec_id <> b.vec_id
QUALIFY rank <= 3
"""


QUERIES = {
    "ann_cosine_topk": ann_cosine_topk,
    "ann_lsh_topk": ann_lsh_topk,
    "embedding_near_dup_pairs": embedding_near_dup_pairs,
}

ORACLES = {
    "ann_cosine_topk": ORACLE_ANN,
    "ann_lsh_topk": ORACLE_ANN_LSH,
    "embedding_near_dup_pairs": ORACLE_NEAR_DUP,
}
