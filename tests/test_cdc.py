"""Unit tests for operators/cdc.py beyond the oracle sweep: null-safe
update detection, multi-key diff, and merge's target-preservation."""

from __future__ import annotations

from pyspark.sql import functions as F

from geo_db_spark.operators.cdc import merge_upsert, snapshot_diff


def test_snapshot_diff_classifies_and_drops_unchanged(spark):
    old = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", None), (4, "d", 40.0)],
        "k int, name string, v double",
    )
    new = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 99.0), (3, "c", 3.0), (5, "e", 50.0)],
        "k int, name string, v double",
    )
    got = {r.k: r.change_type for r in snapshot_diff(old, new, ["k"]).collect()}
    # 1 unchanged -> absent; 3: NULL -> value must register as update
    assert got == {2: "update", 3: "update", 4: "delete", 5: "insert"}


def test_snapshot_diff_compare_cols_subset(spark):
    old = spark.createDataFrame([(1, "a", 1.0)], "k int, name string, v double")
    new = spark.createDataFrame([(1, "CHANGED", 1.0)], "k int, name string, v double")
    assert snapshot_diff(old, new, ["k"], compare_cols=["v"]).count() == 0
    assert snapshot_diff(old, new, ["k"]).collect()[0].change_type == "update"


def test_snapshot_diff_empty_compare_set_is_presence_only(spark):
    """ADVICE r5: compare_cols=[] must mean insert/delete classification
    only — not silently fall back to comparing every column — and an
    all-key snapshot (no non-key columns) must still diff."""
    old = spark.createDataFrame([(1, "a"), (2, "b")], "k int, name string")
    new = spark.createDataFrame([(1, "CHANGED"), (3, "c")], "k int, name string")
    got = {r.k: r.change_type for r in snapshot_diff(old, new, ["k"], compare_cols=[]).collect()}
    assert got == {2: "delete", 3: "insert"}  # k=1 present both sides: not an update
    # keys covering every column: previously xxhash64() with zero args -> analysis error
    ok = spark.createDataFrame([(1,), (2,)], "k int")
    nk = spark.createDataFrame([(2,), (3,)], "k int")
    got2 = {r.k: r.change_type for r in snapshot_diff(ok, nk, ["k"]).collect()}
    assert got2 == {1: "delete", 3: "insert"}


def test_merge_upsert_source_wins_and_target_kept(spark):
    target = spark.createDataFrame(
        [(1, "old1"), (2, "old2"), (3, "old3")], "k int, v string"
    )
    source = spark.createDataFrame([(2, "NEW2"), (9, "NEW9")], "k int, v string")
    got = sorted(map(tuple, merge_upsert(target, source, ["k"]).collect()))
    assert got == [(1, "old1"), (2, "NEW2"), (3, "old3"), (9, "NEW9")]


def test_merge_then_diff_roundtrip(spark):
    """diff(target, merge(target, batch)) must report exactly the batch's
    effect: updates where values changed, inserts for new keys."""
    target = spark.range(100).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v")
    )
    batch = spark.createDataFrame([(7, 0), (8, 16), (200, 1)], "k long, v long")
    merged = merge_upsert(target, batch, ["k"])
    got = {r.k: r.change_type for r in snapshot_diff(target, merged, ["k"]).collect()}
    # k=8 carries the same value it already had -> unchanged, not reported
    assert got == {7: "update", 200: "insert"}


def test_snapshot_diff_detects_value_moving_across_null_columns(spark):
    """Regression (r4 review): a bare xxhash64(a, b) SKIPS null inputs,
    so ('x', NULL) and (NULL, 'x') collided and the update vanished."""
    old = spark.createDataFrame([(1, "x", None)], "k int, a string, b string")
    new = spark.createDataFrame([(1, None, "x")], "k int, a string, b string")
    got = {r.k: r.change_type for r in snapshot_diff(old, new, ["k"]).collect()}
    assert got == {1: "update"}


def test_table_changes_versioned_feed_and_retention_error(spark, tmp_path):
    """table_changes (Delta CDF shape) over a versioned table: v0->v1
    classifies like snapshot_diff with version stamps; asking for a
    version that retention pruned raises instead of silently diffing
    the wrong snapshot."""
    import pytest as _pytest

    from geo_db_spark.io import write_versioned
    from geo_db_spark.operators.cdc import table_changes

    d = str(tmp_path / "vt")
    v0 = spark.createDataFrame([(1, "a"), (2, "b"), (3, "c")], "k int, v string")
    v1 = spark.createDataFrame([(1, "a"), (2, "CHANGED"), (4, "d")], "k int, v string")
    write_versioned(v0, d, keep=2)
    write_versioned(v1, d, keep=2)
    got = {r.k: r.change_type for r in table_changes(spark, d, 0, 1, keys=["k"]).collect()}
    assert got == {2: "update", 3: "delete", 4: "insert"}
    row = table_changes(spark, d, 0, keys=["k"]).select("from_version", "to_version").first()
    assert (row.from_version, row.to_version) == (0, 1)  # to_version defaults to current
    # a third commit with keep=2 prunes v0: the feed must fail loudly
    write_versioned(v1, d, keep=2)
    with _pytest.raises(FileNotFoundError, match="not retained"):
        table_changes(spark, d, 0, 2, keys=["k"])


def test_table_changes_rejects_reversed_versions(spark, tmp_path):
    """r5 review: reversed bounds would silently invert insert/delete."""
    import pytest as _pytest

    from geo_db_spark.io import write_versioned
    from geo_db_spark.operators.cdc import table_changes

    d = str(tmp_path / "rev")
    write_versioned(spark.createDataFrame([(1, "a")], "k int, v string"), d, keep=3)
    write_versioned(spark.createDataFrame([(2, "b")], "k int, v string"), d, keep=3)
    with _pytest.raises(ValueError, match="must be <="):
        table_changes(spark, d, 1, 0, keys=["k"])


def test_table_changes_across_schema_evolution(spark, tmp_path):
    """A column added between versions (lakehouse schema evolution) must
    not break the CDF feed: common columns are compared, each version
    keeps its own schema on read."""
    from geo_db_spark.io import read_versioned, write_versioned
    from geo_db_spark.operators.cdc import table_changes

    d = str(tmp_path / "evo")
    v0 = spark.createDataFrame([(1, "a"), (2, "b")], "k int, v string")
    v1 = spark.createDataFrame(
        [(1, "a", 10), (2, "CHANGED", 20), (3, "c", 30)], "k int, v string, extra int"
    )
    write_versioned(v0, d, keep=3)
    write_versioned(v1, d, keep=3)
    assert read_versioned(spark, d, version=0).columns == ["k", "v"]
    assert read_versioned(spark, d, version=1).columns == ["k", "v", "extra"]
    got = {r.k: r.change_type for r in table_changes(spark, d, 0, 1, keys=["k"]).collect()}
    # k=1 unchanged on the common column v (extra is new-side only)
    assert got == {2: "update", 3: "insert"}


def test_snapshot_diff_symmetric_raise_and_new_side_warning(spark):
    """ADVICE r6: (a) a keys-only OLD snapshot diffed against a widened
    NEW one must raise (previously it silently degraded to presence-only);
    (b) new-side-only columns that can't be compared must warn."""
    import warnings

    import pytest as _pytest

    # (a) old is keys-only, new has value columns, intersection empty
    old = spark.createDataFrame([(1,), (2,)], "k int")
    new = spark.createDataFrame([(1, "a"), (3, "c")], "k int, v string")
    with _pytest.raises(ValueError, match="share no non-key columns"):
        snapshot_diff(old, new, ["k"])
    # explicit presence-only still works
    got = {r.k: r.change_type for r in snapshot_diff(old, new, ["k"], compare_cols=[]).collect()}
    assert got == {2: "delete", 3: "insert"}

    # (b) shared column exists, but new also grew one -> warn, compare shared
    old2 = spark.createDataFrame([(1, "a"), (2, "b")], "k int, v string")
    new2 = spark.createDataFrame([(1, "a", 9), (2, "X", 9)], "k int, v string, extra int")
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        got2 = {r.k: r.change_type for r in snapshot_diff(old2, new2, ["k"]).collect()}
    assert got2 == {2: "update"}  # k=1 unchanged on the shared column
    assert any("new-side-only" in str(x.message) for x in w)


def test_scd2_history_collapses_and_chains(spark):
    """scd2_history: consecutive identical values open no new interval,
    valid_to chains to the next run's start, the last run is current."""
    from datetime import datetime

    from geo_db_spark.operators.cdc import scd2_history

    t = lambda m: datetime(2024, 1, 1, 12, m)
    feed = spark.createDataFrame(
        [
            (1, "bronze", t(0), 100),
            (1, "bronze", t(5), 101),   # re-assertion: collapsed
            (1, "silver", t(10), 102),
            (1, "bronze", t(20), 103),  # value may RECUR as a new run
            (2, "gold", t(1), 200),
            (3, None, t(0), 300),       # NULL is a real state:
            (3, "gold", t(2), 301),     # null->gold is a CHANGE (null-safe
            (3, None, t(4), 302),       # compare), gold->null too
        ],
        "user_id long, tier string, ts timestamp, event_id long",
    )
    rows = sorted(
        (
            (r.user_id, r.tier, r.valid_from, r.valid_to, r.is_current)
            for r in scd2_history(
                feed, ["user_id"], ["tier"], ts_col="ts", tiebreak_cols=["event_id"]
            ).collect()
        ),
        key=lambda x: (x[0], x[1] or "", x[2]),
    )
    assert rows == [
        (1, "bronze", t(0), t(10), False),
        (1, "bronze", t(20), None, True),
        (1, "silver", t(10), t(20), False),
        (2, "gold", t(1), None, True),
        (3, None, t(0), t(2), False),
        (3, None, t(4), None, True),
        (3, "gold", t(2), t(4), False),
    ]  # note: sort key maps None tier to '' (rows 5-6 sort before 'gold')


def test_incremental_sum_count_matches_recompute(spark):
    """The IVM identity on every change shape at once: group vanishes
    (all rows deleted), group appears (insert into new group), update
    moves a row ACROSS groups, update changes value in place, plus
    untouched rows. Maintained view == from-scratch aggregation of the
    new snapshot, decimal-exact."""
    from pyspark.sql import functions as F

    from geo_db_spark.operators.cdc import incremental_sum_count

    old = spark.createDataFrame(
        [
            (1, "a", 10.0),
            (2, "a", 20.0),
            (3, "b", 5.0),   # group b will vanish
            (4, "c", 7.0),   # moves to group d
            (5, "c", 9.0),   # value change in place
            (6, "e", 1.0),   # untouched
        ],
        "id long, g string, v double",
    )
    new = spark.createDataFrame(
        [
            (1, "a", 10.0),
            (2, "a", 20.0),
            # 3 deleted -> b gone
            (4, "d", 7.5),   # moved c -> d AND value changed
            (5, "c", 11.0),
            (6, "e", 1.0),
            (7, "f", 3.25),  # new group f
        ],
        "id long, g string, v double",
    )
    got = {
        (r["g"], r["n_rows"], float(r["total"]))
        for r in incremental_sum_count(old, new, ["id"], "g", "v").collect()
    }
    want = {
        (r["g"], r["n"], float(r["t"]))
        for r in new.groupBy("g")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("v").cast("decimal(18,2)")).cast("decimal(18,2)").alias("t"),
        )
        .collect()
    }
    assert got == want
    assert not any(g == "b" for g, *_ in got)  # vanished group dropped


def test_scd2_point_in_time_interval_pick(spark):
    """Probes land in the right interval: mid-history, boundary (ts ==
    valid_from belongs to the NEW interval), open current interval, and
    before-first-interval probes drop."""
    import datetime as dt

    from geo_db_spark.operators.cdc import scd2_history, scd2_point_in_time

    T = lambda s: dt.datetime.fromisoformat(s)
    feed = spark.createDataFrame(
        [
            (1, "bronze", T("2024-01-01 00:00:00"), 1),
            (1, "silver", T("2024-01-10 00:00:00"), 2),
            (1, "gold", T("2024-01-20 00:00:00"), 3),
        ],
        "user_id long, tier string, ts timestamp_ntz, event_id long",
    )
    hist = scd2_history(feed, ["user_id"], ["tier"], "ts", ["event_id"])
    probes = spark.createDataFrame(
        [
            (100, 1, T("2023-12-31 23:59:59")),  # before history -> dropped
            (101, 1, T("2024-01-05 00:00:00")),  # bronze
            (102, 1, T("2024-01-10 00:00:00")),  # boundary -> silver
            (103, 1, T("2024-02-01 00:00:00")),  # open interval -> gold
            (104, 2, T("2024-01-05 00:00:00")),  # unknown user -> dropped
        ],
        "probe_id long, user_id long, ts timestamp_ntz",
    )
    got = {
        r["probe_id"]: r["tier"]
        for r in scd2_point_in_time(hist, probes, ["user_id"], "ts").collect()
    }
    assert got == {101: "bronze", 102: "silver", 103: "gold"}


def test_incremental_sum_count_null_group(spark):
    """A NULL group value is a real group: the full-outer merge must be
    null-safe, or the NULL-group's old aggregate and its delta emit as
    TWO partial rows. Exercise value change, insert and delete inside
    the NULL group and assert the maintained view still equals the
    from-scratch recompute (one row for the NULL group)."""
    from pyspark.sql import functions as F

    from geo_db_spark.operators.cdc import incremental_sum_count

    old = spark.createDataFrame(
        [(1, None, 10.0), (2, None, 20.0), (3, "a", 5.0)],
        "id long, g string, v double",
    )
    new = spark.createDataFrame(
        [(1, None, 12.0), (3, "a", 5.0), (4, None, 7.0)],
        "id long, g string, v double",
    )
    out = incremental_sum_count(old, new, ["id"], "g", "v").collect()
    got = {(r["g"], r["n_rows"], float(r["total"])) for r in out}
    want = {
        (r["g"], r["n"], float(r["t"]))
        for r in new.groupBy("g")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("v").cast("decimal(18,2)")).cast("decimal(18,2)").alias("t"),
        )
        .collect()
    }
    assert got == want
    assert len(out) == 2  # exactly one maintained row for the NULL group


def test_cdc_table_changes_plan_is_distributed(spark):
    """r7 verdict #5 'done' assert: the change feed must be a plain
    distributed read of the versioned table — no driver-side
    materialization anywhere in the query path. The r7 form collected
    the feed and re-created it (plan = LocalTableScan); the r8 plan
    must read parquet and contain no local relation."""
    from geo_db_spark.workload.cdc_wl import cdc_table_changes
    from tests.conftest import SF_SMOKE

    df = cdc_table_changes(spark, SF_SMOKE)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "LocalTableScan" not in plan and "Scan ExistingRDD" not in plan
    assert "parquet" in plan
    assert df.count() > 0
