"""Grid kNN join vs brute force: with points dense relative to the cell
size, every true nearest neighbor lies within one cell — the grid result
must then EQUAL the exact answer, not just approximate it."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from geo_db_spark.operators.spatial import grid_knn_join


def _xy(spark, n, salt, scale=5.0):
    # deterministic pseudo-random coords in a scale x scale degree patch
    h1 = F.pmod(F.xxhash64(F.col("id"), F.lit(salt)), F.lit(100000)) / 100000.0
    h2 = F.pmod(F.xxhash64(F.col("id"), F.lit(salt + 1)), F.lit(100000)) / 100000.0
    return spark.range(n).select(
        F.col("id"), (h1 * scale).alias("lat"), (h2 * scale).alias("lon")
    )


def test_grid_knn_equals_bruteforce_when_dense(spark):
    pts = _xy(spark, 80, 1).withColumnRenamed("id", "point_id")
    sites = _xy(spark, 60, 7).withColumnRenamed("id", "site_id")
    got = grid_knn_join(pts, sites, k=2, cell_deg=30.0)

    dlat = F.col("lat") - F.col("s_lat")
    dlon = F.col("lon") - F.col("s_lon")
    exact = (
        pts.crossJoin(
            sites.select(
                F.col("site_id"), F.col("lat").alias("s_lat"), F.col("lon").alias("s_lon")
            )
        )
        .select("point_id", "site_id", (dlat * dlat + dlon * dlon).alias("dist2"))
        .withColumn(
            "rank",
            F.row_number().over(
                Window.partitionBy("point_id").orderBy("dist2", "site_id")
            ),
        )
        .filter(F.col("rank") <= 2)
        .select("point_id", "site_id", "dist2", F.col("rank").cast("int").alias("rank"))
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, exact.collect()))


def test_grid_knn_no_cartesian_in_plan(spark):
    pts = _xy(spark, 50, 1).withColumnRenamed("id", "point_id")
    sites = _xy(spark, 50, 7).withColumnRenamed("id", "site_id")
    plan = (
        grid_knn_join(pts, sites, k=1)._jdf.queryExecution().executedPlan().toString()
    )
    assert "CartesianProduct" not in plan and "BroadcastNestedLoop" not in plan
