"""Similarity search over embedding columns (engine-growth contract).

Strategy ladder:
- `cosine_topk_bruteforce`: exact top-k; broadcast the (small) query set
  against the corpus — one pass, no shuffle of the corpus. The baseline.
- `lsh_bucket` (random-hyperplane sign bits): blocks candidates so that
  at corpus scale the join is bucket-local instead of all-pairs.

Determinism for oracle checks: embeddings are quantized to integers
(floor(x * 2^20)) before dot products, so sums are exact and order-
independent; the final cosine is a single IEEE expression over exact
integers and matches DuckDB bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

QUANT = 1 << 20  # 2^20; float32 inputs * 2^20 stay exact in doubles


def quantized(col: Column) -> Column:
    """array<float> -> array<long>, floor(x * 2^20) per element."""
    return F.transform(col, lambda x: F.floor(x.cast("double") * F.lit(QUANT)))


def int_dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )


def cosine_from_quantized(dot: Column, n1: Column, n2: Column) -> Column:
    return dot.cast("double") / (F.sqrt(n1.cast("double")) * F.sqrt(n2.cast("double")))


def with_quantized(df: DataFrame, vec_col: str = "embedding") -> DataFrame:
    q = quantized(F.col(vec_col))
    return df.withColumn("q", q).withColumn("qnorm", int_dot(F.col("q"), F.col("q")))


def cosine_topk_bruteforce(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector.

    Plan shape at scale: queries (small) are broadcast; the corpus is
    scanned once, cosine computed per (query, row) inside codegen, and the
    per-query top-k is one window on q_id — shuffle size = |corpus| * |Q|
    rows of 3 scalar columns, never the vectors themselves.
    """
    c = with_quantized(corpus, vec_col).select(
        F.col(id_col).alias("c_id"), F.col("q").alias("c_q"), F.col("qnorm").alias("c_n")
    )
    qs = with_quantized(queries, vec_col).select(
        F.col(id_col).alias("q_id"), F.col("q").alias("q_q"), F.col("qnorm").alias("q_n")
    )
    pairs = c.join(F.broadcast(qs), F.col("c_id") != F.col("q_id"))
    dot = int_dot(F.col("c_q"), F.col("q_q"))
    scored = pairs.select(
        "q_id",
        F.col("c_id").alias("neighbor_id"),
        cosine_from_quantized(dot, F.col("q_n"), F.col("c_n")).alias("cosine"),
    )
    w = Window.partitionBy("q_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("q_id", "neighbor_id", "cosine", F.col("rank").cast("int").alias("rank"))
    )


def simhash_bits(vec: Column, planes: list[list[float]]) -> Column:
    """Sign-bit LSH code: one bit per hyperplane (deterministic planes
    supplied by the caller). Returns a BIGINT bucket id."""
    bits = [
        F.when(
            F.aggregate(
                F.zip_with(vec, F.array(*[F.lit(p) for p in plane]), lambda x, y: x.cast("double") * y),
                F.lit(0.0),
                lambda acc, v: acc + v,
            )
            >= 0,
            F.lit(1 << i),
        ).otherwise(F.lit(0))
        for i, plane in enumerate(planes)
    ]
    out = F.lit(0)
    for b in bits:
        out = out + b
    return out.cast("long")
