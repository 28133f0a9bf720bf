"""Workload entry for the grid-bucketed spatial kNN join
(operators/spatial.py). The driver tables carry no coordinates, so both
sides get DETERMINISTIC synthetic (lat, lon) derived from their keys by
md5 arithmetic — identical in the DuckDB oracle, so the geometry (and
the grid algorithm itself) is checked bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from geo_db_spark.io import load
from geo_db_spark.operators.dedup import md5_prefix64
from geo_db_spark.operators.spatial import grid_knn_join
from geo_db_spark.session import tune

CELL_DEG = 30.0
KNN_K = 2
_W = int(360 / CELL_DEG)  # longitude columns per row (wrap width)


def _coords(key: F.Column):
    lat = (md5_prefix64(key.cast("string")) % 180_000_000) / 1_000_000.0 - 90.0
    lon = (
        md5_prefix64(F.concat(key.cast("string"), F.lit("x"))) % 360_000_000
    ) / 1_000_000.0 - 180.0
    return lat.alias("lat"), lon.alias("lon")


_COORD_SQL = (
    "(('0x' || substr(md5(CAST({k} AS VARCHAR)), 1, 8))::BIGINT % 180000000) / 1000000.0 - 90.0 AS lat, "
    "(('0x' || substr(md5(CAST({k} AS VARCHAR) || 'x'), 1, 8))::BIGINT % 360000000) / 1000000.0 - 180.0 AS lon"
)


def geo_knn_customer_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2 nearest suppliers per customer by synthetic coordinates, via the
    3x3-neighborhood grid join — never a customers x suppliers product."""
    tune(spark)
    cust = load(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("point_id"), *_coords(F.col("c_custkey"))
    )
    supp = load(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").alias("site_id"), *_coords(F.col("s_suppkey") + 1_000_000)
    )
    return grid_knn_join(cust, supp, k=KNN_K, cell_deg=CELL_DEG).select(
        F.col("point_id").alias("c_custkey"),
        F.col("site_id").alias("s_suppkey"),
        "dist2",
        "rank",
    )


ORACLE_GEO_KNN = f"""
WITH pts AS (
  SELECT c_custkey AS point_id, {_COORD_SQL.format(k='c_custkey')} FROM customer
),
sts AS (
  SELECT s_suppkey AS site_id, {_COORD_SQL.format(k='s_suppkey + 1000000')} FROM supplier
),
s AS (
  -- column wrapped modulo the row width {_W}: lon=+180 == lon=-180
  -- (((x % w) + w) % w is DuckDB's C-style % lifted to Spark's pmod)
  SELECT site_id, lat AS s_lat, lon AS s_lon,
         CAST(FLOOR((lat + 90.0) / {CELL_DEG}) AS BIGINT) * {_W}
           + ((CAST(FLOOR((lon + 180.0) / {CELL_DEG}) AS BIGINT) % {_W}) + {_W}) % {_W} AS cell
  FROM sts
),
p AS (
  -- 3x3 neighborhood from the (row, column) pair: plain row offset,
  -- wrapped column offset — same-row adjacency across the antimeridian
  SELECT point_id, lat AS p_lat, lon AS p_lon,
         (CAST(FLOOR((lat + 90.0) / {CELL_DEG}) AS BIGINT) + o.dy) * {_W}
           + (((CAST(FLOOR((lon + 180.0) / {CELL_DEG}) AS BIGINT) + o.dx) % {_W}) + {_W}) % {_W} AS cell
  FROM pts
  CROSS JOIN (
    SELECT unnest([{", ".join(str(dy) for dy in (-1, -1, -1, 0, 0, 0, 1, 1, 1))}]) AS dy,
           unnest([{", ".join(str(dx) for dx in (-1, 0, 1, -1, 0, 1, -1, 0, 1))}]) AS dx
  ) o
),
cand AS (
  -- wrapped lon delta mirrors the operator: min(|d|, 360-|d|)
  SELECT p.point_id, s.site_id,
         (p.p_lat - s.s_lat) * (p.p_lat - s.s_lat)
           + LEAST(ABS(p.p_lon - s.s_lon), 360.0 - ABS(p.p_lon - s.s_lon))
             * LEAST(ABS(p.p_lon - s.s_lon), 360.0 - ABS(p.p_lon - s.s_lon)) AS dist2
  FROM p JOIN s USING (cell)
)
SELECT point_id AS c_custkey, site_id AS s_suppkey, dist2,
       CAST(row_number() OVER (PARTITION BY point_id ORDER BY dist2, site_id) AS INT) AS rank
FROM cand
QUALIFY rank <= {KNN_K}
"""


KNN_EXACT_K = 3


def geo_knn_exact_customer_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT 3 nearest suppliers per customer (r5 verdict #4): the
    ring-expansion grid join — points the 3x3 neighborhood cannot satisfy
    re-probe at doubling radius until the k-th distance is provably
    inside the covered ring. Oracle is the BRUTE-FORCE wrapped-metric
    kNN, so the green hash proves exactness, not just plausibility
    (suppliers are sparse at small SF — the 3x3 path under-fills here by
    design, which is exactly the regime this variant exists for)."""
    from geo_db_spark.operators.spatial import grid_knn_join_exact

    tune(spark)
    cust = load(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("point_id"), *_coords(F.col("c_custkey"))
    )
    supp = load(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").alias("site_id"), *_coords(F.col("s_suppkey") + 1_000_000)
    )
    return grid_knn_join_exact(cust, supp, k=KNN_EXACT_K, cell_deg=CELL_DEG).select(
        F.col("point_id").alias("c_custkey"),
        F.col("site_id").alias("s_suppkey"),
        "dist2",
        "rank",
    )


ORACLE_GEO_KNN_EXACT = f"""
WITH pts AS (
  SELECT c_custkey AS point_id, {_COORD_SQL.format(k='c_custkey')} FROM customer
),
sts AS (
  SELECT s_suppkey AS site_id, {_COORD_SQL.format(k='s_suppkey + 1000000')} FROM supplier
),
cand AS (
  SELECT p.point_id, s.site_id,
         (p.lat - s.lat) * (p.lat - s.lat)
           + LEAST(ABS(p.lon - s.lon), 360.0 - ABS(p.lon - s.lon))
             * LEAST(ABS(p.lon - s.lon), 360.0 - ABS(p.lon - s.lon)) AS dist2
  FROM pts p CROSS JOIN sts s
)
SELECT point_id AS c_custkey, site_id AS s_suppkey, dist2,
       CAST(row_number() OVER (PARTITION BY point_id ORDER BY dist2, site_id) AS INT) AS rank
FROM cand
QUALIFY rank <= {KNN_EXACT_K}
"""


KNN_SCALED_K = 2


def geo_knn_scaled_customer_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Geodesic-aware variant (r6 verdict #3): exact kNN under the
    equirectangular metric — the wrapped lon delta scaled by cos of the
    pair's mid-latitude, so high-latitude customers rank suppliers by
    (approximate) great-circle distance, not raw degrees. Output carries
    ids + rank but NOT the trig-valued dist2: cos results can differ in
    the last ulp between the JVM and DuckDB libm, which would break the
    value hash while meaning nothing (ranking is ulp-robust here — the
    md5-derived coordinates never produce sub-ulp distance ties)."""
    from geo_db_spark.operators.spatial import grid_knn_join_exact

    tune(spark)
    cust = load(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("point_id"), *_coords(F.col("c_custkey"))
    )
    supp = load(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").alias("site_id"), *_coords(F.col("s_suppkey") + 1_000_000)
    )
    # Exactness is pitch-INDEPENDENT (the ring guarantee does the work;
    # the brute-force oracle pins it). The coarse fixed pitch measures
    # FASTER than the density-derived one here (8.5 s vs 10.9 s at
    # sf0.1): the scaled metric's polar residual (~0.5% of points whose
    # over-the-pole bound stays under their k-th distance) must expand
    # to full grid either way, and a coarse grid reaches covered_all in
    # fewer doubling rounds — round-count latency, not probe volume,
    # dominates this operator locally.
    return grid_knn_join_exact(
        cust, supp, k=KNN_SCALED_K, cell_deg=CELL_DEG, metric="scaled"
    ).select(
        F.col("point_id").alias("c_custkey"),
        F.col("site_id").alias("s_suppkey"),
        "rank",
    )


ORACLE_GEO_KNN_SCALED = f"""
WITH pts AS (
  SELECT c_custkey AS point_id, {_COORD_SQL.format(k='c_custkey')} FROM customer
),
sts AS (
  SELECT s_suppkey AS site_id, {_COORD_SQL.format(k='s_suppkey + 1000000')} FROM supplier
),
cand AS (
  -- equirectangular: wrapped lon delta x cos(mid-lat), then squared
  SELECT p.point_id, s.site_id,
         (p.lat - s.lat) * (p.lat - s.lat)
           + (LEAST(ABS(p.lon - s.lon), 360.0 - ABS(p.lon - s.lon))
              * COS(RADIANS((p.lat + s.lat) / 2.0)))
             * (LEAST(ABS(p.lon - s.lon), 360.0 - ABS(p.lon - s.lon))
                * COS(RADIANS((p.lat + s.lat) / 2.0))) AS dist2
  FROM pts p CROSS JOIN sts s
)
SELECT point_id AS c_custkey, site_id AS s_suppkey,
       CAST(row_number() OVER (PARTITION BY point_id ORDER BY dist2, site_id) AS INT) AS rank
FROM cand
QUALIFY rank <= {KNN_SCALED_K}
"""


QUERIES = {
    "geo_knn_customer_supplier": geo_knn_customer_supplier,
    "geo_knn_exact_customer_supplier": geo_knn_exact_customer_supplier,
    "geo_knn_scaled_customer_supplier": geo_knn_scaled_customer_supplier,
}
ORACLES = {
    "geo_knn_customer_supplier": ORACLE_GEO_KNN,
    "geo_knn_exact_customer_supplier": ORACLE_GEO_KNN_EXACT,
    "geo_knn_scaled_customer_supplier": ORACLE_GEO_KNN_SCALED,
}
