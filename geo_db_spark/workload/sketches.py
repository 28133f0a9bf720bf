"""Approximate-aggregate workload entries (deterministic KMV sketches)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from geo_db_spark.io import load
from geo_db_spark.operators.sketch import kmv_distinct_per_group, kmv_oracle_sql
from geo_db_spark.session import tune

KMV_K = 64


def sk_kmv_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate distinct users per event type (~12% error at k=64),
    bit-identical to the DuckDB oracle because the sketch is md5-KMV,
    not engine-specific HLL."""
    tune(spark)
    ev = load(spark, sf_dir, "events")
    return kmv_distinct_per_group(ev, "user_id", ["event_type"], k=KMV_K)


def sk_kmv_distinct_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate distinct parts per return flag over lineitem — the
    big-table shape: the shuffle carries (group, hash) longs only."""
    tune(spark)
    li = load(spark, sf_dir, "lineitem")
    return kmv_distinct_per_group(li, "l_partkey", ["l_returnflag"], k=KMV_K)


def sk_kmv_merged_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch MERGEABILITY — the property that makes synopses work as
    distributed partial aggregation: per-event-type user sketches (k
    longs each) merge into a global sketch WITHOUT rescanning events,
    and the merged estimate is bit-identical to a direct global pass.
    Output: one row, the global approx-distinct users from merged
    per-type sketch state only."""
    tune(spark)
    from pyspark.sql import functions as F

    from geo_db_spark.operators.sketch import (
        kmv_estimate,
        kmv_merge,
        kmv_sketch_per_group,
    )

    ev = load(spark, sf_dir, "events")
    per_type = kmv_sketch_per_group(ev, "user_id", ["event_type"], k=KMV_K)
    merged = kmv_merge(per_type, [], k=KMV_K)
    return merged.select(
        F.size("ks").alias("n_sketch"),
        F.round(kmv_estimate(F.col("ks"), k=KMV_K), 4).alias("approx_distinct"),
    )


ORACLE_KMV_MERGED = f"""
WITH d AS (
  SELECT DISTINCT event_type,
         ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))::BIGINT AS h
  FROM events
),
r AS (
  SELECT event_type, h,
         row_number() OVER (PARTITION BY event_type ORDER BY h) AS rn
  FROM d
),
sketch_union AS (
  SELECT DISTINCT h FROM r WHERE rn <= {KMV_K}
),
g AS (
  SELECT h, row_number() OVER (ORDER BY h) AS rn FROM sketch_union
),
a AS (SELECT max(h) AS hk, count(*) AS n_sketch FROM g WHERE rn <= {KMV_K})
SELECT CAST(n_sketch AS BIGINT) AS n_sketch,
       round(CASE WHEN n_sketch < {KMV_K} THEN CAST(n_sketch AS DOUBLE)
            ELSE {float(KMV_K - 1)} * {float(1 << 60)} / hk END, 4) AS approx_distinct
FROM a
"""


QUERIES = {
    "sk_kmv_distinct_users": sk_kmv_distinct_users,
    "sk_kmv_distinct_parts": sk_kmv_distinct_parts,
    "sk_kmv_merged_global": sk_kmv_merged_global,
}

ORACLES = {
    "sk_kmv_distinct_users": kmv_oracle_sql("events", "user_id", ["event_type"], k=KMV_K),
    "sk_kmv_distinct_parts": kmv_oracle_sql("lineitem", "l_partkey", ["l_returnflag"], k=KMV_K),
    "sk_kmv_merged_global": ORACLE_KMV_MERGED,
}
