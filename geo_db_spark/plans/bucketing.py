"""Bucketed (pre-partitioned) tables: the co-located fact⋈fact join path.

At 100 TB the dominant cost of a fact-fact join (lineitem⋈orders on
orderkey) is the shuffle of both sides. Bucketing moves that shuffle to
WRITE time: `bucketBy(n, key)` hash-partitions each table's files by the
join key once, and every later join / groupBy on that key reads the
buckets co-located — the physical plan has NO Exchange on either side.
This is Spark's equivalent of the reference's SQLite covering indexes
(setup.sql:12-73): a storage-time investment that query plans exploit
automatically, and the standard layout for repeatedly-joined 100 TB
fact tables (one shuffle amortized over every downstream query).

Spark specifics encoded here:
- bucketed tables must go through the catalog (`saveAsTable`) — plain
  parquet paths don't carry bucket metadata;
- both sides must agree on bucket count (or be integer multiples);
- `sortBy` within buckets lets the join skip its local sort too;
- AQE coalescing is per-bucket-aware; `spark.sql.sources.bucketing.enabled`
  is on by default and autoBucketedScan can disable it for tiny inputs —
  pin it on in the demo so the plan shape is stable to assert on.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from geo_db_spark.io import load
from geo_db_spark.session import tune


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str,
    num_buckets: int = 8,
    sort: bool = True,
    path: str | None = None,
) -> None:
    """Persist ``df`` as a catalog bucketed parquet table — managed (in
    the warehouse) by default, or EXTERNAL at ``path`` so callers can
    route the files where the rest of their output lives (bucket
    metadata still goes through the catalog either way; plain parquet
    paths can't carry it).

    Drops any stale table AND its directory first: a table left on disk
    by a previous session is invisible to this session's in-memory
    catalog, and saveAsTable then fails with LOCATION_ALREADY_EXISTS
    instead of overwriting."""
    import shutil

    if key not in df.columns:
        raise ValueError(f"bucket key {key!r} not in columns {df.columns}")
    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    if path is None:
        warehouse = spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse")
        loc = os.path.join(warehouse.removeprefix("file:"), table.lower())
    else:
        loc = path
    shutil.rmtree(loc, ignore_errors=True)
    # one file per bucket: Spark only trusts write-time sortedness (and
    # skips the join's Sort) when a bucket is a single file; repartition
    # on the bucket key uses the same hash as the bucket writer, so each
    # task holds exactly one bucket
    df = df.repartition(num_buckets, key)
    w = df.write.mode("overwrite").format("parquet").bucketBy(num_buckets, key)
    if path is not None:
        w = w.option("path", path)
    if sort:
        w = w.sortBy(key)
    w.saveAsTable(table)


def bucketed_orders_lineitem_join(
    spark: SparkSession, sf_dir: str, num_buckets: int = 8
) -> DataFrame:
    """Write orders+lineitem bucketed by orderkey, then join through the
    catalog. The returned plan must contain no Exchange — asserted by
    tests/test_bucketing.py via explain introspection."""
    tune(spark)
    spark.conf.set("spark.sql.sources.bucketing.enabled", "true")
    spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
    # since SPARK-28632 the scan no longer advertises per-bucket sort
    # order by default (multi-file buckets made it unsound); our writer
    # guarantees one file per bucket, so opt back in and the join's
    # Sort nodes vanish too
    spark.conf.set("spark.sql.legacy.bucketedTableScan.outputOrdering", "true")
    write_bucketed(
        load(spark, sf_dir, "orders"), "b_orders", "o_orderkey", num_buckets
    )
    write_bucketed(
        load(spark, sf_dir, "lineitem"), "b_lineitem", "l_orderkey", num_buckets
    )
    orders = spark.table("b_orders")
    li = spark.table("b_lineitem")
    return li.join(orders, li.l_orderkey == orders.o_orderkey).select(
        "l_orderkey", "l_extendedprice", "o_orderdate", "o_totalprice"
    )


def physical_plan(df: DataFrame) -> str:
    return df._jdf.queryExecution().executedPlan().toString()
