"""Table loading for the driver's synthetic TPC-H-ish tables (TESTDATA.md).

All reads go through ``spark.read.parquet`` so Catalyst gets column pruning
and predicate pushdown into the scan for free — at 100 TB the scan is the
dominant cost and `PushedFilters`/`ReadSchema` in the explain output are the
first thing to check.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Tables safe to STATICALLY broadcast: only region (5 rows) and nation (25)
# are fixed-cardinality at every SF. Supplier, part, and customer scale with
# SF (supplier 10->100->1k, part 200->2k->20k across sf0.001/0.01/0.1) — at
# 100 TB they are billions of rows, so they must never carry a forced hint;
# AQE promotes them to broadcast at runtime when the measured size allows.
BROADCAST_TABLES = frozenset({"region", "nation"})


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise ValueError(f"unknown table {name!r}; expected one of {TABLES}")
    if name == "events":
        return _load_events(spark, sf_dir)
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _load_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events.parquet stores `ts` as parquet TIMESTAMP(NANOS), which the
    Spark vectorized reader rejects. Read nanos as long
    (spark.sql.legacy.parquet.nanosAsLong) and truncate to microsecond
    timestamps — the data is µs-aligned, so no information is lost and the
    values match DuckDB's TIMESTAMP view of the same file. Files already
    written with µs timestamps (e.g. the scale-test copies DuckDB emits)
    read through unchanged: nanosAsLong only rewrites NANOS columns."""
    from pyspark.sql import functions as F

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/events.parquet")
    if dict(df.dtypes).get("ts") == "bigint":
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load(spark, sf_dir, t) for t in TABLES}


def save_partitioned(
    df: DataFrame,
    path: str,
    partition_by: tuple[str, ...] = (),
    sort_within: tuple[str, ...] = (),
    mode: str = "overwrite",
    max_records_per_file: int = 0,
    compression: str = "zstd",
) -> None:
    """Parquet sink with the 100 TB layout knobs in one place:

    - ``partition_by``: hive-style directory partitioning — later reads
      with a filter on these columns prune entire directories
      (PartitionFilters in the scan, no file even opened);
    - ``sort_within``: sortWithinPartitions before write so parquet
      min/max page stats are tight and row-group skipping works for
      range predicates on these columns;
    - ``max_records_per_file``: caps file size so a skewed partition
      value does not produce one giant file (the small-file/giant-file
      balance is set here, not by downstream readers);
    - zstd: best scan-speed-per-byte of the built-in codecs.
    """
    if sort_within:
        df = df.sortWithinPartitions(*sort_within)
    w = df.write.mode(mode).option("compression", compression)
    if max_records_per_file:
        w = w.option("maxRecordsPerFile", str(max_records_per_file))
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)


def save_range_clustered(
    df: DataFrame,
    path: str,
    cluster_by: tuple[str, ...],
    n_files: int = 32,
    mode: str = "overwrite",
    compression: str = "zstd",
) -> None:
    """Range-clustered parquet layout: ``repartitionByRange`` assigns each
    output file a disjoint slice of the cluster-key space and the sort
    within each file tightens page-level stats. A later range/point read
    on the cluster key then skips whole FILES on parquet footer min/max —
    the single biggest scan lever after directory partitioning, and the
    right choice when the key is too high-cardinality to partition by
    (order keys, timestamps, doc ids).

    At 100 TB pick ``n_files`` so one file ~ a few hundred MB; the range
    exchange samples the key distribution, so skew produces balanced
    files, unlike hash partitioning on a hot key. Cost: ONE extra range
    shuffle at write time, amortized over every downstream scan.
    """
    if not cluster_by:
        raise ValueError("cluster_by must name at least one column")
    (
        df.repartitionByRange(n_files, *cluster_by)
        .sortWithinPartitions(*cluster_by)
        .write.mode(mode)
        .option("compression", compression)
        .parquet(path)
    )


def save_zorder_clustered(
    df: DataFrame,
    path: str,
    cols: tuple[str, str],
    n_files: int = 32,
    bits: int = 16,
    mode: str = "overwrite",
    compression: str = "zstd",
) -> None:
    """Z-order (Morton-curve) clustered parquet layout over TWO numeric
    columns: each row's values are min/max-normalized to ``bits``-bit
    integers, bit-interleaved into one z-value, and files are
    range-clustered on that z-value. Because the Morton curve preserves
    locality in BOTH dimensions, every file's footer min/max is tight on
    both columns — a point/range predicate on EITHER column skips most
    files, where linear range clustering only skips on its leading
    column (the second column spans the full range in every file).

    The layout Delta/Iceberg expose as OPTIMIZE ZORDER BY, as plain
    DataFrame expressions: the normalization bounds are one broadcast
    row, the interleave is integer shift/mask arithmetic (whole-stage
    codegen), and the only wide exchange is the final range repartition
    — same write cost as ``save_range_clustered``.
    """
    from pyspark.sql import functions as F

    a, b = cols
    scale = (1 << bits) - 1
    bounds = df.agg(
        F.min(F.col(a).cast("double")).alias("__amin"),
        F.max(F.col(a).cast("double")).alias("__amax"),
        F.min(F.col(b).cast("double")).alias("__bmin"),
        F.max(F.col(b).cast("double")).alias("__bmax"),
    )

    def norm(c: str, lo: str, hi: str):
        span = F.col(hi) - F.col(lo)
        frac = F.when(span > 0, (F.col(c).cast("double") - F.col(lo)) / span).otherwise(F.lit(0.0))
        return F.round(frac * scale).cast("long")

    with_keys = df.crossJoin(F.broadcast(bounds)).withColumns(
        {"__ka": norm(a, "__amin", "__amax"), "__kb": norm(b, "__bmin", "__bmax")}
    )
    z = F.lit(0).cast("long")
    for i in range(bits):
        bit_a = F.shiftright(F.col("__ka"), i).bitwiseAND(F.lit(1))
        bit_b = F.shiftright(F.col("__kb"), i).bitwiseAND(F.lit(1))
        z = z + F.shiftleft(bit_a, 2 * i) + F.shiftleft(bit_b, 2 * i + 1)
    (
        with_keys.withColumn("__z", z)
        .repartitionByRange(n_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z", "__ka", "__kb", "__amin", "__amax", "__bmin", "__bmax")
        .write.mode(mode)
        .option("compression", compression)
        .parquet(path)
    )


def hilbert_index(ka, kb, bits: int):
    """Hilbert-curve index of two ``bits``-bit integer columns — the
    rot-by-n variant (coordinates stay in [0, 2^bits) through every
    flip, so no negative-shift semantics are involved). Unrolled into
    pure shift/mask/when expressions: ``bits`` rounds of quadrant
    classification (d += s²·((3·rx) xor ry)) and conditional
    flip+swap — all whole-stage codegen, no UDF. Validated against the
    reference Python implementation and the defining property (unit
    Manhattan steps between consecutive d) in tests."""
    from pyspark.sql import functions as F

    n = 1 << bits
    x, y = ka, kb
    d = F.lit(0).cast("long")
    for i in range(bits - 1, -1, -1):
        s = 1 << i
        rx = F.shiftright(x, i).bitwiseAND(F.lit(1))
        ry = F.shiftright(y, i).bitwiseAND(F.lit(1))
        d = d + F.lit(s * s).cast("long") * (rx * 3).bitwiseXOR(ry).cast("long")
        fx = F.when(rx == 1, F.lit(n - 1) - x).otherwise(x)
        fy = F.when(rx == 1, F.lit(n - 1) - y).otherwise(y)
        x, y = F.when(ry == 0, fy).otherwise(x), F.when(ry == 0, fx).otherwise(y)
    return d


def save_hilbert_clustered(
    df: DataFrame,
    path: str,
    cols: tuple[str, str],
    n_files: int = 32,
    bits: int = 16,
    mode: str = "overwrite",
    compression: str = "zstd",
) -> None:
    """Hilbert-curve clustered parquet layout — ``save_zorder_clustered``
    with the space-filling curve Delta Lake's OPTIMIZE now prefers over
    Morton: consecutive Hilbert positions are ALWAYS unit neighbors
    (the Z curve takes long diagonal jumps at quadrant boundaries), so
    per-file bounding boxes are tighter on average and either-column
    predicates skip more files at equal write cost. Same plan shape:
    broadcast bounds row, codegen curve index, one range exchange."""
    from pyspark.sql import functions as F

    a, b = cols
    scale = (1 << bits) - 1
    bounds = df.agg(
        F.min(F.col(a).cast("double")).alias("__amin"),
        F.max(F.col(a).cast("double")).alias("__amax"),
        F.min(F.col(b).cast("double")).alias("__bmin"),
        F.max(F.col(b).cast("double")).alias("__bmax"),
    )

    def norm(c: str, lo: str, hi: str):
        span = F.col(hi) - F.col(lo)
        frac = F.when(span > 0, (F.col(c).cast("double") - F.col(lo)) / span).otherwise(F.lit(0.0))
        return F.round(frac * scale).cast("long")

    with_keys = df.crossJoin(F.broadcast(bounds)).withColumns(
        {"__ka": norm(a, "__amin", "__amax"), "__kb": norm(b, "__bmin", "__bmax")}
    )
    (
        with_keys.withColumn("__h", hilbert_index(F.col("__ka"), F.col("__kb"), bits))
        .repartitionByRange(n_files, "__h")
        .sortWithinPartitions("__h")
        .drop("__h", "__ka", "__kb", "__amin", "__amax", "__bmin", "__bmax")
        .write.mode(mode)
        .option("compression", compression)
        .parquet(path)
    )


# ------------------------------------------------- versioned table (manifest)

_MANIFEST = "_MANIFEST.json"


class ConcurrentWriteError(RuntimeError):
    """Two writers raced for the same version of a versioned table.

    The loser's snapshot was never made current; retry the whole
    write_versioned call (re-reading the table first if the write
    depends on it, as a CDC merge does)."""


def write_versioned(df: DataFrame, table_dir: str, mode_note: str = "", keep: int = 2) -> int:
    """Atomic table replacement via a manifest pointer — the smallest
    useful slice of the Delta/Iceberg commit protocol, for sinks that
    rewrite a whole snapshot per batch (streaming CDC apply, rollup
    maintenance).

    Layout: ``table_dir/v<N>/`` holds immutable parquet snapshots;
    ``table_dir/_MANIFEST.json`` names the current version. A writer
    writes the NEW snapshot directory completely, then swaps the
    manifest with an atomic rename — readers either see the old version
    or the new one, never a half-written directory (plain
    ``mode("overwrite")`` deletes the target before the new files
    commit, which is exactly the crash window this closes). Old
    versions are pruned after the swap, keeping the latest two.

    Returns the committed version number. ``keep`` retained snapshots
    give bounded time travel (``read_versioned(version=...)``).
    POSIX/HDFS-rename semantics; on S3-class stores swap the rename for
    a conditional PUT.

    Writer coordination (ADVICE r5): the version number is CLAIMED with
    an exclusive ``mkdir`` of the snapshot directory before any data is
    written — two concurrent writers (e.g. a streaming CDC apply racing
    an async compaction) that both read version N cannot both create
    ``v<N+1>``; the loser gets :class:`ConcurrentWriteError` instead of
    silently overwriting the winner's snapshot mid-write. The manifest
    swap then re-checks that no LATER version committed while this
    snapshot was being written, so the pointer never moves backwards —
    the mkdir is Delta's "create the commit file with O_EXCL" in
    directory form. Liveness caveat (documented, like the S3 one): a
    writer that CRASHES after reserving leaves an orphan ``v<N+1>``
    directory that blocks that number; since nothing newer can commit,
    the prune never collects it — run :func:`recover_versioned` (removes
    uncommitted reservations newer than the manifest) once no writer is
    live. Routine operation is still single-writer-at-a-time;
    the guard turns the race from silent corruption into a loud error.

    ABA guard (ADVICE r6): version numbers are only exclusive while their
    directory exists — prune RECYCLES them. A writer that read current=N,
    stalled, and woke after v(N+1) was committed and pruned can mkdir
    v(N+1) successfully and would write a bogus snapshot BELOW the
    manifest pointer. Two closures: (a) the manifest is re-read
    immediately after the mkdir reservation and the write aborts (with
    cleanup) if any version >= ours committed meanwhile — before a single
    data byte is written; (b) the manifest records the COMMITTED version
    set and :func:`read_versioned` validates against it, so even a
    snapshot orphaned with a ``_SUCCESS`` marker by a crash in the abort
    window is never served as committed history.
    """
    import json as _json
    import os as _os

    _os.makedirs(table_dir, exist_ok=True)
    manifest = _read_manifest(table_dir)
    current = manifest["version"] if manifest is not None else None
    version = (current if current is not None else -1) + 1
    snap = _os.path.join(table_dir, f"v{version}")
    try:
        _os.mkdir(snap)  # exclusive reservation of this version number
    except FileExistsError:
        raise ConcurrentWriteError(
            f"version {version} of {table_dir} already reserved by a "
            "concurrent writer; re-read the table and retry"
        ) from None
    tmp = _os.path.join(table_dir, f".{_MANIFEST}.{version}.tmp")
    try:
        # ABA re-check: our mkdir can succeed on a RECYCLED number if
        # this exact version was committed and pruned while we were
        # stalled between the manifest read and the reservation. Abort
        # before writing any data — the crash window of the late regress
        # check (below) would otherwise leave a complete bogus snapshot
        # below the pointer.
        latest = read_versioned_version(table_dir)
        if latest is not None and latest >= version:
            raise ConcurrentWriteError(
                f"version {version} of {table_dir} was already committed "
                f"(current: {latest}); the number was recycled by prune — "
                "re-read the table and retry"
            )
        # append into the just-reserved EMPTY dir == plain write;
        # overwrite mode would delete the directory first, releasing the
        # reservation for the length of the write
        df.write.mode("append").parquet(snap)
        committed = _committed_versions(table_dir)
        committed = [c for c in committed if c > version - keep] + [version]
        with open(tmp, "w") as f:
            _json.dump(
                {"version": version, "note": mode_note, "committed": sorted(committed)},
                f,
            )
        # guard the pointer: with versions claimed exclusively above, a
        # concurrent commit can only have a DIFFERENT (later) number —
        # never replace a newer manifest with ours
        latest = read_versioned_version(table_dir)
        if latest is not None and latest > version:
            raise ConcurrentWriteError(
                f"version {latest} of {table_dir} committed while v{version} "
                "was being written; retry on top of the newer snapshot"
            )
    except BaseException:
        # un-reserve on ANY failure (transient write error, regress
        # abort): otherwise the orphan dir wedges every retry with
        # ConcurrentWriteError, and an abandoned-but-complete snapshot
        # would sit where time travel could read it (r5 review)
        import shutil as _shutil

        _shutil.rmtree(snap, ignore_errors=True)
        try:
            _os.remove(tmp)
        except OSError:
            pass
        raise
    _os.replace(tmp, _os.path.join(table_dir, _MANIFEST))  # the commit point
    # prune by listing once (O(retained)) — iterating 0..version would
    # stat an ever-growing range under the per-batch streaming apply
    import shutil as _shutil

    for name in _os.listdir(table_dir):
        if name.startswith("v") and name[1:].isdigit() and int(name[1:]) <= version - keep:
            _shutil.rmtree(_os.path.join(table_dir, name), ignore_errors=True)
    return version


def recover_versioned(table_dir: str) -> list[str]:
    """Remove crashed-writer leftovers so the version numbers they block
    become claimable again: snapshot directories the manifest's committed
    set does not vouch for — uncommitted reservations newer than the
    pointer (with or without ``_SUCCESS``: a crashed ABA writer can leave
    a COMPLETE bogus snapshot, see write_versioned) — plus orphaned
    manifest temp files. Returns the removed paths. Only call when no
    writer is live — a live writer's in-progress reservation is
    indistinguishable from a crashed one by design (the mkdir IS the
    lock)."""
    import os as _os
    import shutil as _shutil

    committed = set(_committed_versions(table_dir))
    removed: list[str] = []
    for name in sorted(_os.listdir(table_dir)):
        path = _os.path.join(table_dir, name)
        if name.startswith(f".{_MANIFEST}.") and name.endswith(".tmp"):
            _os.remove(path)
            removed.append(path)
        elif name.startswith("v") and name[1:].isdigit() and _os.path.isdir(path):
            # no manifest ever named this version: crashed reservation
            # (above the pointer, complete or not) or an ABA writer's
            # bogus snapshot below it — both unservable, both removable
            if int(name[1:]) not in committed:
                _shutil.rmtree(path, ignore_errors=True)
                removed.append(path)
    return removed


def _read_manifest(table_dir: str) -> dict | None:
    import json as _json
    import os as _os

    m = _os.path.join(table_dir, _MANIFEST)
    if not _os.path.exists(m):
        return None
    with open(m) as f:
        return _json.load(f)


def _committed_versions(table_dir: str) -> list[int]:
    """Versions the manifest vouches for. Manifests written before the
    committed-set existed (r5 and earlier) are migrated by trusting the
    retained directories' ``_SUCCESS`` markers one last time — from the
    next commit on, the explicit set is authoritative."""
    import os as _os

    manifest = _read_manifest(table_dir)
    if manifest is None:
        return []
    if "committed" in manifest:
        return [int(v) for v in manifest["committed"]]
    current = int(manifest["version"])
    out = []
    for name in _os.listdir(table_dir):
        if name.startswith("v") and name[1:].isdigit():
            v = int(name[1:])
            if v <= current and _os.path.exists(_os.path.join(table_dir, name, "_SUCCESS")):
                out.append(v)
    return sorted(out)


def read_versioned_version(table_dir: str) -> int | None:
    manifest = _read_manifest(table_dir)
    return None if manifest is None else int(manifest["version"])


def read_versioned(
    spark: SparkSession, table_dir: str, version: int | None = None
) -> DataFrame:
    """Current snapshot per the manifest (or time-travel to a still-
    retained ``version``); raises if none committed / already pruned."""
    current = read_versioned_version(table_dir)
    v = current if version is None else version
    if v is None:
        raise FileNotFoundError(f"no committed version under {table_dir}")
    # a version above the manifest pointer was never committed — its
    # directory may exist as a concurrent writer's (or crashed writer's)
    # reservation, and serving it would read uncommitted data (r5 review)
    if current is None or v > current:
        raise FileNotFoundError(
            f"version {v} of {table_dir} is not committed (current: {current})"
        )
    import os as _os

    snap = _os.path.join(table_dir, f"v{v}")
    if not _os.path.isdir(snap):
        raise FileNotFoundError(f"version {v} not retained under {table_dir}")
    # the manifest's committed set is the ledger — a bogus snapshot left
    # below the pointer by a crashed ABA writer carries _SUCCESS but was
    # never named in any manifest swap, so it is refused here (ADVICE r6)
    if v not in _committed_versions(table_dir):
        raise FileNotFoundError(
            f"version {v} of {table_dir} is not in the manifest's committed "
            "set (crashed-writer leftover); run recover_versioned"
        )
    if not _os.path.exists(_os.path.join(snap, "_SUCCESS")):
        # a crashed writer's partial snapshot has no job-commit marker
        raise FileNotFoundError(
            f"version {v} of {table_dir} is incomplete (no _SUCCESS marker); "
            "delete the directory to recover"
        )
    return spark.read.parquet(snap)


def compact_versioned(
    spark: SparkSession,
    table_dir: str,
    n_files: int = 16,
    sort_by: tuple[str, ...] = (),
) -> int:
    """OPTIMIZE in miniature: rewrite the current snapshot into
    ``n_files`` right-sized files (optionally re-sorted for tight
    footer stats) and commit it as a NEW version — readers never see a
    half-compacted table, and the previous version stays readable until
    pruned. The streaming CDC apply appends one snapshot per batch;
    running this periodically keeps the file count bounded — the same
    maintenance split (ingest fast / compact async) every lakehouse
    runs. Returns the committed version."""
    df = read_versioned(spark, table_dir)
    df = df.repartition(n_files)
    if sort_by:
        df = df.sortWithinPartitions(*sort_by)
    return write_versioned(df, table_dir, mode_note=f"compaction to {n_files} files")


def save_token_balanced(
    df: DataFrame,
    path: str,
    budget_tokens: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    shard_width: int = 4096,
    mode: str = "overwrite",
    compression: str = "zstd",
) -> int:
    """Token-balanced training-export layout: write the corpus as
    ``shard=K/`` parquet directories where each shard holds consecutive
    (by ``id_col``) documents totalling ~``budget_tokens`` whitespace
    tokens — the shard contract trainers want (equal WORK per file, not
    equal rows: 100 long docs and 100 tweets are very different steps).

    Shard assignment is floor(exclusive-prefix-token-sum / budget) via
    the same two-phase distributed prefix sum the packing layouts use —
    no single-partition window anywhere. Each shard's total is
    < budget_tokens + max single-doc tokens (one doc may straddle the
    boundary and is kept whole in the earlier shard). The payload is
    then hash-repartitioned on the shard id, so every shard is exactly
    one task = one file per directory; the skinny (id, n_tokens) rows
    do the prefix-sum shuffles, the payload moves once.

    Returns the number of shards written.
    """
    from geo_db_spark.operators.packing import _cum_token_positions

    if budget_tokens <= 0:
        raise ValueError(f"budget_tokens must be positive: {budget_tokens}")
    pos = _cum_token_positions(
        df.select(F.col(id_col), F.col(text_col)).withColumn("__src", F.lit("all")),
        "__src",
        id_col,
        text_col,
        shard_width,
    )
    assign = pos.select(
        F.col("id").alias(id_col),
        F.floor(F.col("cum_before") / F.lit(budget_tokens)).alias("shard"),
    )
    out = df.join(assign, id_col)
    (
        out.repartition("shard")
        .write.mode(mode)
        .option("compression", compression)
        .partitionBy("shard")
        .parquet(path)
    )
    n = assign.agg(F.count_distinct("shard").alias("n")).collect()[0]["n"]
    return int(n)
