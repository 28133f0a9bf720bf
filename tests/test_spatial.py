"""Grid kNN join vs brute force: with points dense relative to the cell
size, every true nearest neighbor lies within one cell — the grid result
must then EQUAL the exact answer, not just approximate it."""

from __future__ import annotations

import pytest

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


def test_grid_knn_antimeridian_same_row_wrap(spark):
    """r4 verdict #5: a probe at lon≈180 must reach the lon≈-180 cells of
    the SAME latitude row (and rank them by the WRAPPED lon delta), and a
    westmost-column probe must not leak into the adjacent row."""
    pts = spark.createDataFrame(
        [(1, 10.0, 179.9), (2, 10.0, -179.9)], "point_id long, lat double, lon double"
    )
    sites = spark.createDataFrame(
        [
            (100, 10.0, -179.8),  # 0.1° across the wrap from point 1
            (200, 10.0, 179.7),   # 0.2° across the wrap from point 2
            (300, 40.0, -179.9),  # same lon band, 30° away in lat: different row
        ],
        "site_id long, lat double, lon double",
    )
    got = {
        (r.point_id, r.rank): (r.site_id, r.dist2)
        for r in grid_knn_join(pts, sites, k=2, cell_deg=10.0).collect()
    }
    # point 1: same-side site 200 at 0.2°, then site 100 ACROSS the
    # antimeridian at wrapped distance 0.3° (the old code missed it)
    assert got[(1, 1)][0] == 200 and abs(got[(1, 1)][1] - 0.2 * 0.2) < 1e-9
    assert got[(1, 2)][0] == 100 and abs(got[(1, 2)][1] - 0.3 * 0.3) < 1e-9
    # point 2: site 100 same-side at 0.1°, site 200 across the wrap at 0.4°
    assert got[(2, 1)][0] == 100 and abs(got[(2, 1)][1] - 0.1 * 0.1) < 1e-9
    assert got[(2, 2)][0] == 200 and abs(got[(2, 2)][1] - 0.4 * 0.4) < 1e-9
    # the different-row site is NOT reachable from either (row leak fixed)
    assert all(s != 300 for s, _ in got.values())


def test_grid_knn_wrap_matches_bruteforce(spark):
    """Boundary sweep: points scattered within ±0.5° of the antimeridian
    must get EXACTLY the brute-force answer under the wrapped metric."""
    h = F.pmod(F.xxhash64(F.col("id")), F.lit(1000)) / 1000.0
    pts = spark.range(40).select(
        F.col("id").alias("point_id"),
        (h * 10.0).alias("lat"),
        # lon in [179.5, 180) for even ids, [-180, -179.5) for odd
        F.when(F.col("id") % 2 == 0, 179.5 + h * 0.5).otherwise(-180.0 + h * 0.5).alias("lon"),
    )
    sites = spark.range(30).select(
        (F.col("id") + 500).alias("site_id"),
        (h * 10.0 + 0.3).alias("lat"),
        F.when(F.col("id") % 2 == 1, 179.5 + h * 0.5).otherwise(-180.0 + h * 0.5).alias("lon"),
    )
    got = grid_knn_join(pts, sites, k=2, cell_deg=5.0)
    dlat = F.col("lat") - F.col("s_lat")
    dabs = F.abs(F.col("lon") - F.col("s_lon"))
    dlon = F.least(dabs, F.lit(360.0) - dabs)
    exact = (
        pts.crossJoin(
            sites.select("site_id", F.col("lat").alias("s_lat"), F.col("lon").alias("s_lon"))
        )
        .select("point_id", "site_id", (dlat * dlat + dlon * dlon).alias("dist2"))
        .withColumn(
            "rank",
            F.row_number().over(Window.partitionBy("point_id").orderBy("dist2", "site_id")),
        )
        .filter(F.col("rank") <= 2)
        .select("point_id", "site_id", "dist2", F.col("rank").cast("int").alias("rank"))
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, exact.collect()))


def test_cell_deg_must_divide_360(spark):
    """ADVICE r6: a non-divisor cell_deg would truncate the row width and
    fold the last partial column into column 0 — raise instead."""
    import pytest

    from geo_db_spark.operators.spatial import grid_cell

    with pytest.raises(ValueError, match="does not divide 360"):
        grid_cell(F.lit(0.0), F.lit(0.0), cell_deg=0.7)


def _brute_knn(pts, sites, k):
    """Exact kNN under the same wrapped-longitude metric the grid uses."""
    dlat = F.col("lat") - F.col("s_lat")
    dlon_abs = F.abs(F.col("lon") - F.col("s_lon"))
    dlon = F.least(dlon_abs, F.lit(360.0) - dlon_abs)
    return (
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
        .filter(F.col("rank") <= k)
        .select("point_id", "site_id", "dist2", F.col("rank").cast("int").alias("rank"))
    )


def test_grid_knn_exact_ring_expansion_matches_bruteforce_on_sparse_sites(spark):
    """r5 verdict #4: sites so sparse the 3x3 neighborhood holds < k of
    them — grid_knn_join under-fills BY DESIGN; grid_knn_join_exact must
    ring-expand and equal brute force."""
    from geo_db_spark.operators.spatial import grid_knn_join, grid_knn_join_exact

    pts = _xy(spark, 40, 1, scale=60.0).withColumnRenamed("id", "point_id")
    # 5 sites scattered over the whole patch: most 3x3 neighborhoods at
    # cell_deg=5 are empty or hold one site
    sites = _xy(spark, 5, 7, scale=60.0).withColumnRenamed("id", "site_id")
    got = grid_knn_join_exact(pts, sites, k=3, cell_deg=5.0)
    exact = _brute_knn(pts, sites, 3)
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, exact.collect()))
    # the motivating gap: the one-ring version under-fills here
    approx = grid_knn_join(pts, sites, k=3, cell_deg=5.0)
    assert approx.count() < got.count()


def test_grid_knn_exact_k_exceeding_site_count_returns_all(spark):
    """Fewer than k sites on earth: the expansion must terminate at full
    grid coverage and return every site ranked, not loop."""
    from geo_db_spark.operators.spatial import grid_knn_join_exact

    pts = _xy(spark, 6, 1, scale=30.0).withColumnRenamed("id", "point_id")
    sites = _xy(spark, 2, 7, scale=30.0).withColumnRenamed("id", "site_id")
    got = grid_knn_join_exact(pts, sites, k=5, cell_deg=15.0)
    exact = _brute_knn(pts, sites, 5)
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, exact.collect()))
    assert got.count() == 6 * 2


def test_grid_knn_exact_antimeridian(spark):
    """Ring expansion must keep the wrapped-column arithmetic: a point at
    lon=179.5 whose neighbors sit at lon=-179.5."""
    from geo_db_spark.operators.spatial import grid_knn_join_exact

    pts = spark.createDataFrame(
        [(1, 0.0, 179.5), (2, 10.0, -179.5)], "point_id int, lat double, lon double"
    )
    sites = spark.createDataFrame(
        [(10, 0.2, -179.8), (20, 0.0, 170.0), (30, 40.0, 0.0)],
        "site_id int, lat double, lon double",
    )
    got = grid_knn_join_exact(pts, sites, k=2, cell_deg=5.0)
    exact = _brute_knn(pts, sites, 2)
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, exact.collect()))


@pytest.mark.slow
def test_grid_knn_exact_many_rounds_under_tuned_session(spark):
    """Regression (r6): with AQE on (the mid-suite tune() state) and a
    fine grid forcing MANY doubling rounds, the ring loop must neither
    OOM a broadcast on accumulated lineage (fixed: per-round
    localCheckpoint) nor kill whole-stage codegen with a giant probe
    array literal (fixed: broadcast offsets table)."""
    from geo_db_spark.operators.spatial import grid_knn_join_exact
    from geo_db_spark.session import tune

    tune(spark)  # AQE on — the state the full suite runs spatial in
    try:
        # 2 points, 2 sites on opposite corners; cell_deg=2 -> w=180,
        # n_rows=90: satisfying k=2 forces expansion to near-full grid
        pts = spark.createDataFrame(
            [(1, 0.0, 0.0), (2, 50.0, 120.0)], "point_id int, lat double, lon double"
        )
        sites = spark.createDataFrame(
            [(10, -80.0, -170.0), (20, 80.0, 170.0)],
            "site_id int, lat double, lon double",
        )
        got = grid_knn_join_exact(pts, sites, k=2, cell_deg=2.0)
        rows = sorted(map(tuple, got.collect()))
        exact = sorted(map(tuple, _brute_knn(
            pts, sites, 2).collect()))
        assert rows == exact
        assert len(rows) == 4
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", "false")  # restore conftest state


def _brute_knn_scaled(pts, sites, k):
    """Exact kNN under the equirectangular (cos-mid-lat-scaled) metric."""
    dlat = F.col("lat") - F.col("s_lat")
    dlon_abs = F.abs(F.col("lon") - F.col("s_lon"))
    dlon = F.least(dlon_abs, F.lit(360.0) - dlon_abs)
    c = F.cos(F.radians((F.col("lat") + F.col("s_lat")) / F.lit(2.0)))
    return (
        pts.crossJoin(
            sites.select(
                F.col("site_id"), F.col("lat").alias("s_lat"), F.col("lon").alias("s_lon")
            )
        )
        .select("point_id", "site_id", (dlat * dlat + (dlon * c) * (dlon * c)).alias("dist2"))
        .withColumn(
            "rank",
            F.row_number().over(
                Window.partitionBy("point_id").orderBy("dist2", "site_id")
            ),
        )
        .filter(F.col("rank") <= k)
        .select("point_id", "site_id", "dist2", F.col("rank").cast("int").alias("rank"))
    )


def test_scaled_metric_picks_true_neighbor_at_high_latitude(spark):
    """r6 verdict #3: at lat 64 a degree of longitude is worth
    cos(64) ~ 0.44 of a degree of latitude. Site A 10 lon-degrees away is
    TRULY closer (haversine ~4.4 deg of arc) than site B 5 lat-degrees
    away — the pure-degree metric demonstrably picks B (wrong), the
    scaled metric picks A, and A is what great-circle distance says."""
    import math

    from geo_db_spark.operators.spatial import grid_knn_join_exact

    pts = spark.createDataFrame(
        [(1, 64.0, 0.0)], "point_id int, lat double, lon double"
    )
    sites = spark.createDataFrame(
        [(100, 64.0, 10.0), (200, 59.0, 0.0)],
        "site_id int, lat double, lon double",
    )

    def haversine_deg(a, b):
        la1, lo1, la2, lo2 = map(math.radians, (a[0], a[1], b[0], b[1]))
        h = (
            math.sin((la2 - la1) / 2) ** 2
            + math.cos(la1) * math.cos(la2) * math.sin((lo2 - lo1) / 2) ** 2
        )
        return math.degrees(2 * math.asin(math.sqrt(h)))

    d_a = haversine_deg((64.0, 0.0), (64.0, 10.0))
    d_b = haversine_deg((64.0, 0.0), (59.0, 0.0))
    assert d_a < d_b  # great-circle truth: A is nearer

    deg = grid_knn_join_exact(pts, sites, k=1, cell_deg=30.0).collect()
    assert deg[0].site_id == 200  # the degree metric's documented mistake
    sc = grid_knn_join_exact(pts, sites, k=1, cell_deg=30.0, metric="scaled").collect()
    assert sc[0].site_id == 100  # the scaled metric agrees with haversine


def test_grid_knn_exact_scaled_matches_bruteforce_high_lat(spark):
    """The ring guarantee under the scaled metric (per-point widened
    bound) must still be EXACT: sparse sites at lat 50-70 forcing
    expansion rounds, result equals brute force under the same metric."""
    from geo_db_spark.operators.spatial import grid_knn_join_exact

    h1 = F.pmod(F.xxhash64(F.col("id"), F.lit(3)), F.lit(100000)) / 100000.0
    h2 = F.pmod(F.xxhash64(F.col("id"), F.lit(4)), F.lit(100000)) / 100000.0
    pts = spark.range(40).select(
        F.col("id").alias("point_id"),
        (50.0 + h1 * 20.0).alias("lat"),
        (h2 * 360.0 - 180.0).alias("lon"),
    )
    sites = spark.range(6).select(
        F.col("id").alias("site_id"),
        (50.0 + h2 * 20.0).alias("lat"),
        (h1 * 360.0 - 180.0).alias("lon"),
    )
    got = grid_knn_join_exact(pts, sites, k=3, cell_deg=5.0, metric="scaled")
    exact = _brute_knn_scaled(pts, sites, 3)
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, exact.collect()))


def test_derive_cell_deg_scales_with_density(spark):
    """r6 verdict #8: the auto-derived pitch must shrink for dense site
    sets, grow for sparse ones, always divide 360, and make the
    cell_deg=None default equal brute force on a dense patch."""
    from geo_db_spark.operators.spatial import derive_cell_deg, grid_knn_join

    dense = _xy(spark, 4000, 11, scale=10.0).withColumnRenamed("id", "site_id")
    sparse = _xy(spark, 5, 13, scale=120.0).withColumnRenamed("id", "site_id")
    d_dense = derive_cell_deg(dense, k=1)
    d_sparse = derive_cell_deg(sparse, k=1)
    assert d_dense < d_sparse
    for d in (d_dense, d_sparse):
        assert abs(360.0 / d - round(360.0 / d)) < 1e-9  # integer grid holds
    # auto default end-to-end: dense enough that 3x3 at the derived pitch
    # holds the true neighbors -> equals brute force
    pts = _xy(spark, 60, 17, scale=10.0).withColumnRenamed("id", "point_id")
    got = grid_knn_join(pts, dense, k=2, cell_deg=None)
    exact = _brute_knn(pts, dense, 2)
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, exact.collect()))
