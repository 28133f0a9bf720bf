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
