"""Bucketed range join: equi-key + time-interval predicate at scale.

Spark compiles `l.key = r.key AND r.t BETWEEN l.t+lo AND l.t+hi` into a
sort-merge join on the key alone with the range as a post-filter — one
hot key degenerates to an in-key cross product. The bucketed form makes
the time dimension part of the JOIN KEY: the probe side explodes each
row into the handful of fixed-width time buckets its interval overlaps,
the build side maps each row to the single bucket containing its
timestamp, and the join is a plain hash equi-join on (key, bucket) with
the exact range predicate as a residual. With bucket width >= interval
width each probe row lands in at most 2-3 buckets, so the intermediate
is O(|matches|), never |hot key|^2 — the same trick Flink's interval
join and range-partitioned spatial joins use.

Not in the reference (SQLite nested-loops its range predicates); this is
the engine-growth path for event-correlation workloads (SURVEY.md §2-E).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def bucketed_range_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    lower_s: float = -3600.0,
    upper_s: float = 0.0,
    bucket_s: float | None = None,
    how: str = "inner",
) -> DataFrame:
    """Pairs (l, r) with l.key == r.key and
    l.ts + lower_s <= r.ts <= l.ts + upper_s.

    ``how='left'`` keeps unmatched left rows (right columns NULL) by
    re-attaching the matches to the left input with an anti-join on a
    generated per-key row id — the exploded probe never outer-joins
    directly, so a left row is emitted once, not once per empty bucket.

    Output columns are ``left.columns + right.columns - {key}``; shared
    non-key names would be ambiguous to select from, so they are
    rejected early — rename on the right side before joining (as
    ``right_ts`` usually already is).
    """
    if upper_s < lower_s:
        raise ValueError("upper_s must be >= lower_s")
    if how not in ("inner", "left"):
        raise ValueError(f"unsupported how={how!r}; expected 'inner' or 'left'")
    shared = sorted(set(left.columns) & set(right.columns) - {key})
    if shared:
        raise ValueError(
            f"left and right share non-key column names {shared}; rename the "
            "right side (the output keeps both) before the range join"
        )
    if how == "left":
        # deterministic per-key row identity: full-duplicate rows are
        # indistinguishable, so tie order cannot change the result set.
        # The window is salted by row content — partitioning by key alone
        # would funnel every row of a hot key through ONE task (the exact
        # skew this operator exists to avoid; r4 review); (salt, rn) is
        # still unique per key because salt groups are disjoint.
        salt = F.pmod(F.xxhash64(*[F.col(c) for c in left.columns]), F.lit(64))
        left = left.withColumn("__rjsalt", salt)
        w = Window.partitionBy(key, "__rjsalt").orderBy(
            *[F.col(c) for c in left.columns if c != "__rjsalt"]
        )
        left = left.withColumn(
            "__rowid",
            F.col("__rjsalt") * F.lit(1 << 40) + F.row_number().over(w),
        ).drop("__rjsalt")
    width = max(upper_s - lower_s, 1e-6)
    bucket_us = int((bucket_s if bucket_s is not None else width) * 1_000_000)
    lo_us = int(lower_s * 1_000_000)
    hi_us = int(upper_s * 1_000_000)

    l_us = F.unix_micros(F.col(left_ts).cast("timestamp"))
    r_us = F.unix_micros(F.col(right_ts).cast("timestamp"))

    lb = F.floor((l_us + F.lit(lo_us)) / F.lit(bucket_us))
    ub = F.floor((l_us + F.lit(hi_us)) / F.lit(bucket_us))
    # explicit aliases: both sides often derive from the SAME scan
    # (self-correlation), where bare df[col] references resolve to
    # identical attribute ids and the key equality collapses to true
    probe = left.withColumn("__bucket", F.explode(F.sequence(lb, ub))).alias("__rjl")
    build = right.withColumn("__bucket", F.floor(r_us / F.lit(bucket_us))).alias("__rjr")

    def lcol(c: str):
        return F.col(f"__rjl.{c}")

    def rcol(c: str):
        return F.col(f"__rjr.{c}")

    r_abs = F.unix_micros(rcol(right_ts).cast("timestamp"))
    l_abs = F.unix_micros(lcol(left_ts).cast("timestamp"))
    on = (
        (lcol(key) == rcol(key))
        & (lcol("__bucket") == rcol("__bucket"))
        & (r_abs >= l_abs + F.lit(lo_us))
        & (r_abs <= l_abs + F.lit(hi_us))
    )
    matched = probe.join(build, on, "inner").select(
        *[lcol(c) for c in left.columns],
        *[rcol(c) for c in right.columns if c != key],
    )
    if how == "inner":
        return matched
    # how == 'left': one row per unmatched left row, right columns NULL
    unmatched = left.join(
        matched.select(key, "__rowid"), [key, "__rowid"], "left_anti"
    ).select(
        *[F.col(c) for c in left.columns],
        *[
            F.lit(None).cast(right.schema[c].dataType).alias(c)
            for c in right.columns
            if c != key
        ],
    )
    return matched.unionByName(unmatched).drop("__rowid")
