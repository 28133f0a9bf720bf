"""Partitioned parquet sink: layout, roundtrip, and partition pruning."""

from __future__ import annotations

import pytest

import os

from pyspark.sql import functions as F

from geo_db_spark.io import load, save_partitioned
from tests.conftest import SF_SMOKE


def test_partitioned_sink_roundtrip_and_pruning(spark, tmp_path):
    out = str(tmp_path / "events_by_type")
    ev = load(spark, SF_SMOKE, "events")
    save_partitioned(
        ev,
        out,
        partition_by=("event_type",),
        sort_within=("ts",),
        max_records_per_file=100_000,
    )

    # hive-style directories, one per type
    dirs = {d for d in os.listdir(out) if d.startswith("event_type=")}
    assert len(dirs) == 5

    back = spark.read.parquet(out)
    assert back.count() == ev.count()

    # a filter on the partition column must prune at the directory level:
    # it appears in PartitionFilters, not as a data filter, and the scan
    # reads a single partition directory
    q = back.filter(F.col("event_type") == "click").select("event_id", "value")
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(event_type" in plan or "PartitionFilters: [" in plan
    assert "event_type)" not in plan.split("PushedFilters")[1].split("]")[0], plan
    n_click = q.count()
    want = ev.filter(F.col("event_type") == "click").count()
    assert n_click == want > 0


def test_range_clustered_files_have_disjoint_key_ranges(spark, tmp_path):
    """save_range_clustered must give each parquet file a disjoint slice
    of the cluster key (checked via footer min/max), so footer-based file
    skipping works for range predicates."""
    import pyarrow.parquet as pq

    from geo_db_spark.io import load, save_range_clustered

    out = str(tmp_path / "clustered")
    orders = load(spark, "/root/testdata/sf0.001", "orders")
    save_range_clustered(orders, out, ("o_orderkey",), n_files=4)

    ranges = []
    for f in sorted(os.listdir(out)):
        if not f.endswith(".parquet"):
            continue
        md = pq.ParquetFile(os.path.join(out, f)).metadata
        idx = md.schema.to_arrow_schema().get_field_index("o_orderkey")
        mins, maxs = [], []
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(idx).statistics
            mins.append(st.min)
            maxs.append(st.max)
        ranges.append((min(mins), max(maxs)))
    assert len(ranges) >= 2  # the range exchange actually split the data
    ranges.sort()
    for (lo1, hi1), (lo2, hi2) in zip(ranges, ranges[1:]):
        assert hi1 < lo2, f"overlapping file key ranges: {(lo1, hi1)} vs {(lo2, hi2)}"
    # and nothing was lost
    assert spark.read.parquet(out).count() == orders.count()


def test_zorder_files_tight_on_both_dims(spark, tmp_path):
    """save_zorder_clustered must keep each file's footer min/max tight on
    BOTH cluster columns (the Morton curve's locality), unlike linear
    range clustering where the trailing column spans the full range in
    every file — that tightness is what makes either-column predicates
    skip files."""
    import pyarrow.parquet as pq

    from pyspark.sql import functions as F

    from geo_db_spark.io import save_zorder_clustered

    # a 64x64 grid: both dims uniform, so locality is measurable
    grid = spark.range(4096).select(
        (F.col("id") % 64).alias("x"), (F.col("id") / 64).cast("long").alias("y")
    )
    out = str(tmp_path / "zorder")
    save_zorder_clustered(grid, out, ("x", "y"), n_files=16, bits=6)

    def file_spans(col):
        spans = []
        for f in sorted(os.listdir(out)):
            if not f.endswith(".parquet"):
                continue
            md = pq.ParquetFile(os.path.join(out, f)).metadata
            idx = md.schema.to_arrow_schema().get_field_index(col)
            mins, maxs = [], []
            for rg in range(md.num_row_groups):
                st = md.row_group(rg).column(idx).statistics
                mins.append(st.min)
                maxs.append(st.max)
            spans.append(max(maxs) - min(mins))
        return spans

    xs, ys = file_spans("x"), file_spans("y")
    assert len(xs) >= 8  # the range exchange split the data
    # 16 z-ordered files over a 64x64 grid -> each covers roughly a
    # 16x16 tile; allow 2x slack for uneven z-range splits. A linear
    # layout would give span 63 on the trailing dim for every file.
    assert sum(xs) / len(xs) <= 32, f"x spans too wide: {xs}"
    assert sum(ys) / len(ys) <= 32, f"y spans too wide: {ys}"
    # round trip: nothing lost, helper columns dropped
    back = spark.read.parquet(out)
    assert back.columns == ["x", "y"]
    assert back.count() == 4096


def test_versioned_write_commits_atomically_and_prunes(spark, tmp_path):
    from pyspark.sql import functions as F

    from geo_db_spark.io import read_versioned, read_versioned_version, write_versioned

    d = str(tmp_path / "vtable")
    assert write_versioned(spark.range(5).select(F.col("id")), d) == 0
    assert write_versioned(spark.range(9).select(F.col("id")), d) == 1
    assert write_versioned(spark.range(3).select(F.col("id")), d) == 2
    assert read_versioned_version(d) == 2
    assert read_versioned(spark, d).count() == 3
    # only the latest two snapshot dirs survive pruning
    vs = sorted(x for x in os.listdir(d) if x.startswith("v"))
    assert vs == ["v1", "v2"]


def test_versioned_write_concurrent_reservation_raises(spark, tmp_path):
    """ADVICE r5: two writers that both read version N must not both
    commit v(N+1) — the second to reserve gets ConcurrentWriteError and
    the winner's snapshot is untouched."""
    from pyspark.sql import functions as F

    import pytest as _pytest

    from geo_db_spark.io import (
        ConcurrentWriteError,
        read_versioned,
        read_versioned_version,
        write_versioned,
    )

    d = str(tmp_path / "race")
    write_versioned(spark.range(5).select(F.col("id")), d)
    # simulate the loser: writer B reserved v1 (mkdir) while writer A is
    # about to claim the same number
    os.mkdir(os.path.join(d, "v1"))
    with _pytest.raises(ConcurrentWriteError, match="already reserved"):
        write_versioned(spark.range(9).select(F.col("id")), d)
    assert read_versioned_version(d) == 0  # pointer never moved
    assert read_versioned(spark, d).count() == 5


def test_versioned_write_pointer_never_regresses(spark, tmp_path, monkeypatch):
    """If a later version commits while this snapshot is being written,
    the older writer must fail rather than swing the manifest backwards."""
    import geo_db_spark.io as gio
    from pyspark.sql import functions as F

    import pytest as _pytest

    d = str(tmp_path / "regress")
    gio.write_versioned(spark.range(5).select(F.col("id")), d)

    real_read = gio.read_versioned_version
    calls = {"n": 0}

    def hijack(table_dir):
        v = real_read(table_dir)
        calls["n"] += 1
        if calls["n"] == 1:
            # between this writer's version claim and its commit, a
            # concurrent writer commits v2: reserve + write a manifest
            # pointing past the version this writer is about to claim
            import json

            os.mkdir(os.path.join(d, "v2"))
            with open(os.path.join(d, "_MANIFEST.json"), "w") as f:
                json.dump({"version": 2, "note": "concurrent"}, f)
        return v

    monkeypatch.setattr(gio, "read_versioned_version", hijack)
    with _pytest.raises(gio.ConcurrentWriteError, match="committed while"):
        gio.write_versioned(spark.range(9).select(F.col("id")), d)
    monkeypatch.undo()
    assert gio.read_versioned_version(d) == 2  # the newer commit survived


def test_versioned_time_travel_within_retention(spark, tmp_path):
    from pyspark.sql import functions as F

    import pytest as _pytest

    from geo_db_spark.io import read_versioned, write_versioned

    d = str(tmp_path / "tt")
    for n in (4, 7, 9):
        write_versioned(spark.range(n).select(F.col("id")), d, keep=3)
    assert read_versioned(spark, d).count() == 9
    assert read_versioned(spark, d, version=1).count() == 7
    assert read_versioned(spark, d, version=0).count() == 4
    write_versioned(spark.range(2).select(F.col("id")), d, keep=3)  # prunes v0
    with _pytest.raises(FileNotFoundError, match="not retained"):
        read_versioned(spark, d, version=0)


def test_compact_versioned_preserves_rows_bounds_files(spark, tmp_path):
    from pyspark.sql import functions as F

    from geo_db_spark.io import compact_versioned, read_versioned, write_versioned

    d = str(tmp_path / "compact")
    # a fragmented snapshot: 37 partitions -> 37 files
    write_versioned(spark.range(1000).select(F.col("id")).repartition(37), d)
    v = compact_versioned(spark, d, n_files=4)
    assert v == 1
    back = read_versioned(spark, d)
    assert back.count() == 1000
    files = [f for f in os.listdir(os.path.join(d, "v1")) if f.endswith(".parquet")]
    assert len(files) <= 4


def test_versioned_write_failure_unreserves_and_recovers(spark, tmp_path):
    """r5 review: a failed snapshot write must remove its reservation —
    otherwise every retry hits ConcurrentWriteError forever — and must
    not leave an uncommitted directory that time travel could read."""
    from pyspark.sql import functions as F

    import pytest as _pytest

    from geo_db_spark.io import read_versioned, read_versioned_version, write_versioned

    d = str(tmp_path / "failrec")
    write_versioned(spark.range(5).select(F.col("id")), d)

    def boom(pdf_iter):
        raise RuntimeError("simulated executor failure")
        yield  # pragma: no cover

    bad = spark.range(10).mapInPandas(boom, "id long")
    with _pytest.raises(Exception):
        write_versioned(bad, d)
    assert not os.path.isdir(os.path.join(d, "v1"))  # reservation cleaned
    assert read_versioned_version(d) == 0
    # the retry is NOT wedged
    assert write_versioned(spark.range(7).select(F.col("id")), d) == 1
    assert read_versioned(spark, d).count() == 7


def test_read_versioned_refuses_uncommitted_and_partial(spark, tmp_path):
    """r5 review: a version above the manifest pointer (a writer's
    reservation) and a snapshot without its _SUCCESS marker must both be
    unreadable."""
    from pyspark.sql import functions as F

    import pytest as _pytest

    from geo_db_spark.io import read_versioned, write_versioned

    d = str(tmp_path / "refuse")
    write_versioned(spark.range(5).select(F.col("id")), d)
    # a concurrent writer's reservation with data but no commit
    os.mkdir(os.path.join(d, "v1"))
    spark.range(9).select(F.col("id")).write.mode("append").parquet(os.path.join(d, "v1"))
    with _pytest.raises(FileNotFoundError, match="not committed"):
        read_versioned(spark, d, version=1)
    # a crashed writer's partial snapshot: no _SUCCESS marker
    os.remove(os.path.join(d, "v0", "_SUCCESS"))
    with _pytest.raises(FileNotFoundError, match="incomplete"):
        read_versioned(spark, d, version=0)


def test_recover_versioned_unblocks_crashed_reservation(spark, tmp_path):
    """A crashed writer's reservation (no _SUCCESS, newer than the
    manifest) wedges that version number; recover_versioned removes it
    and the next write succeeds — while committed snapshots survive."""
    from pyspark.sql import functions as F

    from geo_db_spark.io import (
        ConcurrentWriteError,
        read_versioned,
        recover_versioned,
        write_versioned,
    )
    import pytest as _pytest

    d = str(tmp_path / "recover")
    write_versioned(spark.range(5).select(F.col("id")), d)
    # crashed writer: reservation with partial data, no _SUCCESS
    os.mkdir(os.path.join(d, "v1"))
    with open(os.path.join(d, "v1", "part-partial.parquet"), "wb") as f:
        f.write(b"partial")
    with open(os.path.join(d, f"._MANIFEST.json.1.tmp"), "w") as f:
        f.write("{}")
    with _pytest.raises(ConcurrentWriteError):
        write_versioned(spark.range(9).select(F.col("id")), d)
    removed = recover_versioned(d)
    assert any(p.endswith("v1") for p in removed)
    assert any(p.endswith(".tmp") for p in removed)
    assert write_versioned(spark.range(9).select(F.col("id")), d) == 1
    assert read_versioned(spark, d).count() == 9
    assert read_versioned(spark, d, version=0).count() == 5  # committed survives


def test_versioned_write_aba_recycled_version_aborts_before_data(spark, tmp_path, monkeypatch):
    """ADVICE r6: prune recycles version numbers. A writer stalled after
    reading current=N can mkdir-reserve v(N+1) after that exact version
    was committed AND pruned; the post-reservation manifest re-check must
    abort (with cleanup) before any data is written."""
    from pyspark.sql import functions as F

    import pytest as _pytest

    import geo_db_spark.io as gio

    d = str(tmp_path / "aba")
    for n in (5, 6, 7, 8):  # commits v0..v3 with keep=2 -> v0, v1 pruned
        gio.write_versioned(spark.range(n).select(F.col("id")), d, keep=2)
    assert not os.path.isdir(os.path.join(d, "v1"))  # recycled number

    # stalled writer: saw the manifest when current was 0, wakes up now —
    # only its FIRST read (the version computation) is stale
    real = gio._read_manifest
    calls = {"n": 0}

    def stale_once(table_dir):
        calls["n"] += 1
        if calls["n"] == 1:
            return {"version": 0, "committed": [0]}
        return real(table_dir)

    monkeypatch.setattr(gio, "_read_manifest", stale_once)
    with _pytest.raises(gio.ConcurrentWriteError, match="recycled by prune"):
        gio.write_versioned(spark.range(99).select(F.col("id")), d, keep=2)
    monkeypatch.setattr(gio, "_read_manifest", real)
    # the bogus reservation was cleaned up; history is intact
    assert not os.path.isdir(os.path.join(d, "v1"))
    assert gio.read_versioned(spark, d).count() == 8
    assert gio.read_versioned(spark, d, version=2).count() == 7


def test_versioned_committed_set_refuses_bogus_snapshot_below_pointer(spark, tmp_path):
    """ADVICE r6, the crash half: an ABA writer that dies AFTER the Spark
    job commits (complete snapshot, _SUCCESS present) but before the
    regress-abort cleanup leaves a never-committed v1 BELOW the manifest
    pointer. The manifest's committed set must refuse to serve it, and
    recover_versioned must remove it."""
    from pyspark.sql import functions as F

    import pytest as _pytest

    from geo_db_spark.io import read_versioned, recover_versioned, write_versioned

    d = str(tmp_path / "aba_crash")
    for n in (5, 6, 7, 8):  # v0..v3, keep=2 -> v1 pruned, current=3
        write_versioned(spark.range(n).select(F.col("id")), d, keep=2)
    # crashed ABA writer's COMPLETE bogus snapshot on the recycled number
    os.mkdir(os.path.join(d, "v1"))
    spark.range(99).select(F.col("id")).write.mode("append").parquet(os.path.join(d, "v1"))
    assert os.path.exists(os.path.join(d, "v1", "_SUCCESS"))

    with _pytest.raises(FileNotFoundError, match="committed set"):
        read_versioned(spark, d, version=1)
    removed = recover_versioned(d)
    assert any(p.endswith("v1") for p in removed)
    # committed history untouched
    assert read_versioned(spark, d).count() == 8
    assert read_versioned(spark, d, version=2).count() == 7


def test_hilbert_index_matches_reference_and_is_a_hilbert_curve(spark):
    """r7: the unrolled column-expression Hilbert index must equal the
    reference Python xy2d on every cell of a 16x16 grid, be bijective,
    and satisfy the defining curve property — consecutive d values are
    unit Manhattan neighbors (the locality Z-order lacks at quadrant
    seams)."""
    from pyspark.sql import functions as F

    from geo_db_spark.io import hilbert_index

    bits = 4
    n = 1 << bits

    def xy2d(x, y):
        d = 0
        s = n // 2
        while s > 0:
            rx = 1 if x & s else 0
            ry = 1 if y & s else 0
            d += s * s * ((3 * rx) ^ ry)
            if ry == 0:
                if rx == 1:
                    x, y = n - 1 - x, n - 1 - y
                x, y = y, x
            s //= 2
        return d

    grid = spark.range(n * n).select(
        (F.col("id") % n).alias("x"), (F.col("id") / n).cast("long").alias("y")
    )
    rows = grid.withColumn(
        "d", hilbert_index(F.col("x"), F.col("y"), bits)
    ).collect()
    pos = {}
    for r in rows:
        assert r.d == xy2d(r.x, r.y), (r.x, r.y, r.d)
        pos[r.d] = (r.x, r.y)
    assert len(pos) == n * n  # bijective
    for d in range(n * n - 1):
        (x0, y0), (x1, y1) = pos[d], pos[d + 1]
        assert abs(x0 - x1) + abs(y0 - y1) == 1, d


@pytest.mark.slow
def test_hilbert_files_tighter_than_zorder(spark, tmp_path):
    """Hilbert files must be tight on BOTH dims like Z-order, and the
    total bounding-box area across files should not exceed Z-order's
    (unit-step locality removes the Morton seam jumps)."""
    import pyarrow.parquet as pq

    from pyspark.sql import functions as F

    from geo_db_spark.io import save_hilbert_clustered, save_zorder_clustered

    grid = spark.range(4096).select(
        (F.col("id") % 64).alias("x"), (F.col("id") / 64).cast("long").alias("y")
    )
    outs = {}
    for name, saver in (("h", save_hilbert_clustered), ("z", save_zorder_clustered)):
        out = str(tmp_path / name)
        saver(grid, out, ("x", "y"), n_files=16, bits=6)
        areas = []
        for f in sorted(os.listdir(out)):
            if not f.endswith(".parquet"):
                continue
            md = pq.ParquetFile(os.path.join(out, f)).metadata
            sch = md.schema.to_arrow_schema()
            span = {}
            for col in ("x", "y"):
                idx = sch.get_field_index(col)
                mins, maxs = [], []
                for rg in range(md.num_row_groups):
                    st = md.row_group(rg).column(idx).statistics
                    mins.append(st.min)
                    maxs.append(st.max)
                span[col] = max(maxs) - min(mins) + 1
            areas.append(span["x"] * span["y"])
        outs[name] = sum(areas)
    # each of 16 files holds 256 cells; a perfect tiling has area 256
    # per file (total 4096); allow slack but Hilbert must not lose to Z
    assert outs["h"] <= outs["z"] * 1.05, outs
    back = spark.read.parquet(str(tmp_path / "h"))
    assert back.columns == ["x", "y"] and back.count() == 4096


def test_token_balanced_shards(spark, tmp_path):
    """save_token_balanced: every doc present exactly once, shards are
    contiguous in id order, each shard's token total stays under
    budget + max single-doc tokens, and every shard dir is ONE file."""
    import glob

    from pyspark.sql import functions as F

    from geo_db_spark.io import load, save_token_balanced
    from tests.conftest import SF_SMOKE

    docs = load(spark, SF_SMOKE, "documents")
    out = str(tmp_path / "tok_balanced")
    budget = 2000
    n_shards = save_token_balanced(docs, out, budget_tokens=budget)
    back = spark.read.parquet(out)

    assert back.count() == docs.count()
    assert back.select("doc_id").distinct().count() == docs.count()
    assert back.select("shard").distinct().count() == n_shards

    tok = F.size(F.split(F.trim(F.col("text")), r"\s+")).cast("long")
    per = (
        back.groupBy("shard")
        .agg(
            F.sum(tok).alias("total"),
            F.min("doc_id").alias("lo"),
            F.max("doc_id").alias("hi"),
        )
        .orderBy("shard")
        .collect()
    )
    max_doc = docs.select(F.max(tok).alias("m")).collect()[0]["m"]
    assert len(per) >= 2  # the budget actually splits this corpus
    for r in per:
        assert r["total"] < budget + max_doc
    # contiguity: shard id ranges don't interleave
    for a, b in zip(per, per[1:]):
        assert a["hi"] < b["lo"]
    # full budget use: every shard except the last is at least budget -
    # max_doc (no premature cut)
    for r in per[:-1]:
        assert r["total"] > budget - max_doc
    # one file per shard dir
    for d in glob.glob(out + "/shard=*"):
        files = [f for f in glob.glob(d + "/*") if f.endswith(".parquet")]
        assert len(files) == 1, d
