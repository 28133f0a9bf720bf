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


QUERIES = {
    "sk_kmv_distinct_users": sk_kmv_distinct_users,
    "sk_kmv_distinct_parts": sk_kmv_distinct_parts,
}

ORACLES = {
    "sk_kmv_distinct_users": kmv_oracle_sql("events", "user_id", ["event_type"], k=KMV_K),
    "sk_kmv_distinct_parts": kmv_oracle_sql("lineitem", "l_partkey", ["l_returnflag"], k=KMV_K),
}
