"""Grid-bucketed spatial operators over (lat, lon) columns.

The reference extracts city coordinates (C11, src/wiki_data_line.rs:
245-248) but never computes on them; these are the engine-growth spatial
operators that data makes possible — the same blocking idea as the
time-bucketed range join (operators/rangejoin.py) applied to 2-D space.

Distance is SQUARED DEGREES (lat² + lon²·cos²-free): pure arithmetic,
monotone in true planar distance at city scale, and bit-identical across
engines — trig-based haversine is deliberately avoided because libm
results differ in the last ulp between engines and would break the
value-hash oracle. Swap in haversine for display once ranking is done.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def grid_cell(lat: Column, lon: Column, cell_deg: float = 1.0) -> Column:
    """Integer grid cell id for a (lat, lon): row-major over a
    360/cell_deg-wide grid. Pure integer arithmetic — same value in the
    DuckDB oracle."""
    ny = F.floor((lat + F.lit(90.0)) / F.lit(cell_deg)).cast("long")
    nx = F.floor((lon + F.lit(180.0)) / F.lit(cell_deg)).cast("long")
    return ny * F.lit(int(720 / cell_deg)) + nx


def grid_knn_join(
    points: DataFrame,
    sites: DataFrame,
    k: int = 1,
    cell_deg: float = 1.0,
    point_id: str = "point_id",
    site_id: str = "site_id",
) -> DataFrame:
    """k nearest ``sites`` per ``points`` row via grid blocking: every
    site lands in ONE cell, every point probes its own cell plus the 8
    neighbors, candidates are ranked by squared-degree distance.

    Approximate by design (like the LSH/IVF ANN paths): a point whose
    true neighbor is farther than one cell away misses it — pick
    ``cell_deg`` >= the expected nearest-neighbor distance. Points in
    empty neighborhoods return fewer than k rows rather than a wrong
    answer.

    Scale shape: the only join is cell-local (9 probe cells per point,
    each site replicated zero times) — never a cross join of points x
    sites; ranking is a per-point window over the bounded candidate
    set. Deterministic: integer cells, exact double arithmetic, ties
    broken by site id.
    """
    w = int(720 / cell_deg)
    s = sites.select(
        F.col(site_id),
        F.col("lat").alias("s_lat"),
        F.col("lon").alias("s_lon"),
        grid_cell(F.col("lat"), F.col("lon"), cell_deg).alias("cell"),
    )
    # probe side: explode the 3x3 neighborhood (cell ± 1 row/col)
    offsets = [dy * w + dx for dy in (-1, 0, 1) for dx in (-1, 0, 1)]
    p = points.select(
        F.col(point_id),
        F.col("lat").alias("p_lat"),
        F.col("lon").alias("p_lon"),
        F.explode(
            F.array(
                *[
                    (grid_cell(F.col("lat"), F.col("lon"), cell_deg) + F.lit(o))
                    for o in offsets
                ]
            )
        ).alias("cell"),
    )
    dlat = F.col("p_lat") - F.col("s_lat")
    dlon = F.col("p_lon") - F.col("s_lon")
    cand = p.join(s, "cell").select(
        point_id,
        site_id,
        (dlat * dlat + dlon * dlon).alias("dist2"),
    )
    wr = Window.partitionBy(point_id).orderBy(F.col("dist2"), F.col(site_id))
    return (
        cand.withColumn("rank", F.row_number().over(wr))
        .filter(F.col("rank") <= k)
        .select(point_id, site_id, "dist2", F.col("rank").cast("int").alias("rank"))
    )
