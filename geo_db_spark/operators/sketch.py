"""Approximate aggregates as DETERMINISTIC sketches.

Built-in approx_count_distinct (HLL++) can't be checked against a DuckDB
oracle — different sketch, different estimate. A KMV (k-minimum-values)
sketch over md5 hashes is just as mergeable and streaming-friendly, but
both engines compute bit-identical estimates: estimate = (k-1) * H / h_k
where h_k is the k-th smallest distinct 60-bit hash (exact count when
fewer than k distinct values). Error ~ 1/sqrt(k).

Scale shape: hash + per-group distinct (map-side partial dedup), one
window top-k per group — the shuffle carries (group, hash) longs only,
never the values. The sketch state (k longs per group) is mergeable
across partitions/streams like any bounded synopsis.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

H_MAX = float(1 << 60)  # hashes are 15 md5 hex chars = 60 bits


def hash60(col: Column) -> Column:
    """60-bit uniform hash, identical in DuckDB:
    ('0x'||substr(md5(CAST(x AS VARCHAR)),1,15))::BIGINT."""
    return F.conv(
        F.substring(F.md5(col.cast("string").cast("binary")), 1, 15), 16, 10
    ).cast("long")


def kmv_distinct_per_group(
    df: DataFrame,
    value_col: str,
    group_cols: list[str],
    k: int = 64,
) -> DataFrame:
    """Per-group approximate distinct count of ``value_col``.

    Returns group_cols + (n_sketch, approx_distinct): exact when the
    group has < k distinct values, else the KMV estimate.
    """
    d = df.select(*group_cols, hash60(F.col(value_col)).alias("__h")).distinct()
    w = Window.partitionBy(*group_cols).orderBy("__h")
    topk = d.withColumn("__rn", F.row_number().over(w)).filter(F.col("__rn") <= k)
    agg = topk.groupBy(*group_cols).agg(
        F.max("__h").alias("__hk"), F.count(F.lit(1)).alias("n_sketch")
    )
    est = F.when(
        F.col("n_sketch") < k, F.col("n_sketch").cast("double")
    ).otherwise(F.lit(float(k - 1)) * F.lit(H_MAX) / F.col("__hk"))
    return agg.select(*group_cols, "n_sketch", est.alias("approx_distinct"))


def kmv_oracle_sql(
    table: str, value_col: str, group_cols: list[str], k: int = 64
) -> str:
    """The DuckDB twin of kmv_distinct_per_group (same arithmetic)."""
    g = ", ".join(group_cols)
    return f"""
WITH d AS (
  SELECT DISTINCT {g},
         ('0x' || substr(md5(CAST({value_col} AS VARCHAR)), 1, 15))::BIGINT AS h
  FROM {table}
),
r AS (
  SELECT {g}, h, row_number() OVER (PARTITION BY {g} ORDER BY h) AS rn FROM d
),
a AS (
  SELECT {g}, max(h) AS hk, count(*) AS n_sketch FROM r WHERE rn <= {k} GROUP BY {g}
)
SELECT {g}, n_sketch,
       CASE WHEN n_sketch < {k} THEN CAST(n_sketch AS DOUBLE)
            ELSE {float(k - 1)} * {H_MAX} / hk END AS approx_distinct
FROM a
"""


def kmv_sketch_per_group(
    df: DataFrame,
    value_col: str,
    group_cols: list[str],
    k: int = 64,
) -> DataFrame:
    """The sketch STATE itself: group_cols + ``ks`` (sorted array of the
    k smallest distinct hashes). This is what a distributed aggregation
    ships between nodes — k longs per group regardless of group size —
    and what ``kmv_merge`` combines without touching raw data."""
    d = df.select(*group_cols, hash60(F.col(value_col)).alias("__h")).distinct()
    w = Window.partitionBy(*group_cols).orderBy("__h")
    topk = d.withColumn("__rn", F.row_number().over(w)).filter(F.col("__rn") <= k)
    return topk.groupBy(*group_cols).agg(
        F.array_sort(F.collect_list("__h")).alias("ks")
    )


def kmv_merge(
    sketches: DataFrame,
    merge_cols: list[str],
    k: int = 64,
) -> DataFrame:
    """Merge per-group sketches up to a coarser grouping (empty
    ``merge_cols`` = global): union the hash sets, keep the k smallest —
    EXACTLY the sketch a direct pass over the union of the raw data
    would produce, which is the algebraic property that lets KMV run as
    partial aggregation across partitions, days, or streams."""
    ex = sketches.select(*merge_cols, F.explode("ks").alias("__h")).distinct()
    if merge_cols:
        w = Window.partitionBy(*merge_cols).orderBy("__h")
        topk = ex.withColumn("__rn", F.row_number().over(w)).filter(F.col("__rn") <= k)
        return topk.groupBy(*merge_cols).agg(
            F.array_sort(F.collect_list("__h")).alias("ks")
        )
    # global merge: orderBy+limit plans as TakeOrderedAndProject
    # (per-partition top-k + driver merge), never a single-partition
    # window over the unioned sketch state
    topk = ex.orderBy("__h").limit(k)
    return topk.agg(F.array_sort(F.collect_list("__h")).alias("ks"))


def kmv_estimate(ks: Column, k: int = 64) -> Column:
    """Estimate from sketch state: exact n when |ks| < k, else
    (k-1) * H / h_k."""
    n = F.size(ks)
    return F.when(n < k, n.cast("double")).otherwise(
        F.lit(float(k - 1)) * F.lit(H_MAX) / F.element_at(ks, k)
    )


def kmv_set_estimates(sk_a: DataFrame, sk_b: DataFrame, k: int = 64) -> DataFrame:
    """SET OPERATIONS on two KMV sketch states — union, intersection, and
    Jaccard estimates without touching the raw data (Beyer et al.,
    SIGMOD'07 §4; the same construction DataSketches ships as theta-sketch
    set ops). Inputs are single-row (ks) states from kmv_sketch_per_group
    / kmv_merge; output is one row:

      rho        = |L ∩ A ∩ B| where L = the k smallest of A ∪ B
                   (the union sketch a direct pass would build)
      union_est  = KMV estimate from L
      jaccard_est = rho / |L|        (unbiased Jaccard estimator)
      inter_est  = jaccard_est * union_est

    Everything is integer set algebra over two <= k-element arrays plus
    the one KMV division — deterministic and bit-identical in the DuckDB
    oracle, unlike the engine-private HLL++ sketch. Scale shape: the
    whole computation runs on 2k longs; the expensive part (building the
    per-side sketches) already shuffles hashes only."""
    a = sk_a.select(F.col("ks").alias("ka"))
    b = sk_b.select(F.col("ks").alias("kb"))
    j = a.crossJoin(b)  # 1 row x 1 row
    union_l = F.slice(F.array_sort(F.array_union(F.col("ka"), F.col("kb"))), 1, k)
    return (
        j.select(
            F.size("ka").alias("n_a"),
            F.size("kb").alias("n_b"),
            union_l.alias("__l"),
            F.array_intersect(F.col("ka"), F.col("kb")).alias("__ab"),
        )
        .select(
            "n_a",
            "n_b",
            F.size(F.array_intersect(F.col("__l"), F.col("__ab"))).alias("rho"),
            F.size("__l").alias("k_used"),
            kmv_estimate(F.col("__l"), k).alias("union_est"),
        )
        .select(
            "n_a",
            "n_b",
            "rho",
            "union_est",
            (F.col("rho").cast("double") / F.col("k_used")).alias("jaccard_est"),
            (
                F.col("rho").cast("double") / F.col("k_used") * F.col("union_est")
            ).alias("inter_est"),
        )
    )
