"""Mergeable equi-width histogram sketch + deterministic quantile read.

Completes the sketch family (KMV/HLL distinct, count-min frequency) with
a QUANTILE-capable structure: fixed bins over a caller-declared value
range. State is at most ``n_bins`` (bin, cnt) rows however large the
input; shards merge by cell-wise sum (like count-min), so the shuffle
after partial aggregation is bounded by the bin count, not the data.
Quantile readout walks the cumulative counts to the target rank and
reports the bin's LOWER EDGE — a deterministic integer/exact-arithmetic
answer (max error = one bin width) that both engines reproduce
bit-for-bit, unlike t-digest/KLL whose float centroid math is
engine-specific. At 100 TB this is the one-pass, fixed-memory quantile
path; tighten bins (or two-pass: coarse histogram -> re-bin the hot
range) when one bin width is too coarse.

No reference counterpart (SURVEY §2-H engine growth); equi-width
histogram sketches are textbook public material.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

N_BINS = 64


def _bin_of(value: Column, lo: float, hi: float, n_bins: int) -> Column:
    """Bin index in [0, n_bins-1]; values at/over ``hi`` clamp into the
    last bin (closed upper edge), under ``lo`` into the first. The edges
    are exact doubles shared with the oracle."""
    width = (hi - lo) / n_bins
    raw = F.floor((value.cast("double") - F.lit(lo)) / F.lit(width)).cast("long")
    return F.greatest(F.least(raw, F.lit(n_bins - 1)), F.lit(0))


def histogram_build(
    df: DataFrame,
    value_col: str,
    lo: float,
    hi: float,
    n_bins: int = N_BINS,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """(group_cols..., bin, cnt) — at most n_bins rows per group."""
    gcols = group_cols or []
    return (
        df.select(*gcols, _bin_of(F.col(value_col), lo, hi, n_bins).alias("bin"))
        .groupBy(*gcols, "bin")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def histogram_merge(shards: DataFrame) -> DataFrame:
    """Merge shards cell-wise (drop the shard key first): identical to
    building one histogram over the concatenated inputs."""
    return shards.groupBy("bin").agg(F.sum("cnt").alias("cnt"))


def histogram_quantile(
    hist: DataFrame, q: float, lo: float, hi: float, n_bins: int = N_BINS
) -> DataFrame:
    """Lower edge of the bin containing the rank-``ceil(q * N)`` value
    (rank over the total count N): one row (quantile, bin, est_value).
    Exact integer rank + exact double edge arithmetic — bit-identical in
    the oracle."""
    width = (hi - lo) / n_bins
    total = hist.agg(F.sum("cnt").alias("total"))
    # the window is over the SKETCH (<= n_bins rows), never the data —
    # a single-partition ordered walk of 64 rows is the whole cost
    wspec = Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, 0)
    cum = (
        hist.crossJoin(F.broadcast(total))
        .withColumn("cum", F.sum("cnt").over(wspec))
        # smallest bin whose cumulative count reaches ceil(q * total)
        .filter(F.col("cum") >= F.ceil(F.lit(q) * F.col("total")))
        .orderBy("bin")
        .limit(1)
    )
    return cum.select(
        F.lit(q).alias("quantile"),
        "bin",
        (F.lit(lo) + F.col("bin") * F.lit(width)).alias("est_value"),
    )


def histogram_quantile_refined(
    df: DataFrame,
    value_col: str,
    q: float,
    lo: float,
    hi: float,
    n_bins: int = N_BINS,
) -> DataFrame:
    """Two-pass refinement (the module docstring's promised tightening):
    pass 1 builds the coarse ``n_bins`` histogram and locates the bin
    holding rank ``ceil(q*N)`` plus the residual rank within it; pass 2
    re-bins ONLY that bracket into ``n_bins`` sub-bins and walks to the
    residual rank — quantile error (hi-lo)/n_bins² with the same fixed
    ≤ n_bins sketch state per pass, exact integer rank and exact double
    edge arithmetic throughout (bit-identical in the oracle).

    Scale shape: two full scans (the price of the 4096× error
    reduction), zero data shuffles — the bracket is a one-row broadcast,
    the pass-2 filter rides the scan behind it, and both cumulative
    walks run over ≤ n_bins sketch rows. Rows are matched to the
    bracket by their COARSE bin assignment (same clamped `_bin_of`),
    so under-lo / over-hi clamping stays consistent across passes."""
    width = (hi - lo) / n_bins
    sub_width = width / n_bins
    h1 = histogram_build(df, value_col, lo, hi, n_bins)
    total = h1.agg(F.sum("cnt").alias("total"))
    wspec = Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, 0)
    bracket = (
        h1.crossJoin(F.broadcast(total))
        .withColumn("cum", F.sum("cnt").over(wspec))
        .withColumn("rank", F.ceil(F.lit(q) * F.col("total")))
        .filter(F.col("cum") >= F.col("rank"))
        .orderBy("bin")
        .limit(1)
        .select(
            F.col("bin").alias("coarse_bin"),
            (F.col("rank") - (F.col("cum") - F.col("cnt"))).alias("rank_rem"),
        )
    )
    v = F.col(value_col).cast("double")
    blo = F.lit(lo) + F.col("coarse_bin") * F.lit(width)
    sub_bin = F.greatest(
        F.least(
            F.floor((F.col("__v") - F.col("blo")) / F.lit(sub_width)).cast("long"),
            F.lit(n_bins - 1),
        ),
        F.lit(0),
    )
    sub_hist = (
        df.select(_bin_of(F.col(value_col), lo, hi, n_bins).alias("cb"), v.alias("__v"))
        .join(F.broadcast(bracket), F.col("cb") == F.col("coarse_bin"))
        .withColumn("blo", blo)
        .withColumn("sub_bin", sub_bin)
        .groupBy("coarse_bin", "rank_rem", "blo", "sub_bin")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    w2 = Window.orderBy("sub_bin").rowsBetween(Window.unboundedPreceding, 0)
    return (
        sub_hist.withColumn("cum", F.sum("cnt").over(w2))
        .filter(F.col("cum") >= F.col("rank_rem"))
        .orderBy("sub_bin")
        .limit(1)
        .select(
            F.lit(q).alias("quantile"),
            F.col("coarse_bin").alias("bin"),
            "sub_bin",
            (F.col("blo") + F.col("sub_bin") * F.lit(sub_width)).alias("est_value"),
        )
    )
