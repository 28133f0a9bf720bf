"""Custom Spark DataSource for WikiData dump files: ``spark.read.format
("wikidata_dump")`` — the reference's input connector (A1/A4/A5,
src/input/http.rs + src/input/mod.rs) as a first-class Spark source.

What it adds over ``spark.read.text``:

- **Parallel HTTP Range reads.** The reference streams the dump through
  ONE socket (src/input/http.rs:48-152); here the file's byte range is
  split into N partitions and every EXECUTOR issues its own
  ``Range: bytes=start-end`` request — the dump is consumed cluster-wide
  without landing in storage first. Servers without Range support (or
  unknown length) degrade to a single streaming partition.
- **The same splitting for local files** (byte ranges + line-boundary
  ownership), so one code path covers file:// and http(s)://.

Line-boundary ownership rule (the classic text-split contract): a
partition owns every line that STARTS inside [start, end); it skips a
partial first line (owned by the predecessor) and reads past ``end`` to
finish its last line. ``.json.bz2`` inputs are NOT byte-splittable at
this layer — use ``spark.read.text`` (Hadoop's splittable Bzip2Codec,
sources/wikidata.py A2/A3) for those; this source refuses rather than
silently mis-splitting.

Python-level reads are the slow path relative to the JVM text reader —
this source exists for the distributed-HTTP case Spark has no native
reader for; for files already in (object) storage prefer
``read_entity_dump``.

Register once per session, then read:

    spark.dataSource.register(WikidataDumpDataSource)
    lines = spark.read.format("wikidata_dump").option("path", url).load()
    entities = parse_entity_lines(lines)
"""

from __future__ import annotations

import os
import urllib.error
import urllib.request

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
)

DEFAULT_NUM_PARTITIONS = 8
_CHUNK = 1 << 20
# socket-level timeout for HEAD probe + per-partition GET (seconds):
# bounds time-to-first-byte AND each recv() stall, the two ways a
# blackholed server hangs a task indefinitely (ADVICE r5)
HTTP_TIMEOUT_S = 60


class _Slice(InputPartition):
    def __init__(self, start: int, end: int):
        self.start = start
        self.end = end


def _http_probe(url: str) -> tuple[int | None, bool]:
    """(content_length, accepts_ranges) via one HEAD request. A server
    that rejects HEAD (405/403) degrades to the single-streaming-
    partition path instead of failing the whole read."""
    req = urllib.request.Request(url, method="HEAD")
    try:
        # a stalled/blackholed server must fail (and be retried by the
        # task scheduler), not hang the driver's partition planning
        with urllib.request.urlopen(req, timeout=HTTP_TIMEOUT_S) as resp:
            n = resp.headers.get("Content-Length")
            ranges = (resp.headers.get("Accept-Ranges") or "").lower() == "bytes"
            return (int(n) if n is not None else None), ranges
    except urllib.error.URLError:
        return None, False


def _iter_lines_from_stream(stream, start: int, end: int, skip_first: bool):
    """Yield complete lines whose first byte lies in [start, end);
    ``stream`` is positioned at ``start`` and may read past ``end`` to
    finish the final owned line. ``pos`` tracks the absolute offset of
    the end of ``buf``; a line's start offset is therefore
    ``pos - len(buf) - len(line) - 1`` after slicing it off."""
    buf = b""
    pos = start
    skipping = skip_first
    while True:
        chunk = stream.read(_CHUNK)
        at_eof = not chunk
        pos += len(chunk)
        buf += chunk
        while True:
            nl = buf.find(b"\n")
            if nl < 0:
                break
            line, buf = buf[:nl], buf[nl + 1 :]
            if skipping:
                skipping = False  # predecessor owns this partial line
                continue
            line_start = pos - len(buf) - len(line) - 1
            if line_start < end:
                yield line
            else:
                return
        if at_eof:
            # unterminated final line of the file
            if buf and not skipping and (pos - len(buf)) < end:
                yield buf
            return


class _DumpReader(DataSourceReader):
    def __init__(self, options):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("wikidata_dump: option 'path' is required")
        if self.path.endswith(".bz2"):
            raise ValueError(
                "wikidata_dump: .bz2 is not byte-splittable at this layer; "
                "use spark.read.text (splittable Bzip2Codec) instead"
            )
        self.n = int(options.get("numpartitions", DEFAULT_NUM_PARTITIONS))
        self.is_http = self.path.startswith(("http://", "https://"))

    def partitions(self):
        if self.is_http:
            size, ranged = _http_probe(self.path)
            if size is None or not ranged:
                return [_Slice(0, 1 << 62)]  # single streaming partition
        else:
            size = os.stat(self.path).st_size
        if size == 0:
            return [_Slice(0, 0)]
        n = max(1, min(self.n, size))
        step = size // n
        bounds = [i * step for i in range(n)] + [size]
        return [_Slice(bounds[i], bounds[i + 1]) for i in range(n)]

    def read(self, partition: _Slice):
        start, end = partition.start, partition.end
        if start == end:
            return
        # Ownership: this partition owns lines whose first byte is in
        # [start, end). A first line is only PARTIAL (predecessor's) when
        # the byte at start-1 is not a newline — so open one byte early
        # and peek, otherwise a line starting exactly at `start` would be
        # skipped by this partition AND stopped-before by the previous one
        # (caught by test_boundary_exactly_at_line_start_not_lost).
        if self.is_http:
            fetch_from = max(start - 1, 0)
            req = urllib.request.Request(self.path)
            want_range = fetch_from > 0
            if want_range:
                req.add_header("Range", f"bytes={fetch_from}-")
            # timeout: a hung GET would otherwise pin the executor task
            # forever; failing lets Spark's task retry take over
            with urllib.request.urlopen(req, timeout=HTTP_TIMEOUT_S) as stream:
                # a proxy/server may ignore Range and answer 200 with the
                # FULL body — trusting it would re-read the file head as
                # this slice (duplicated early lines, lost tail). Detect
                # via status and discard up to our offset instead.
                if want_range and getattr(stream, "status", 206) != 206:
                    remaining = fetch_from
                    while remaining > 0:
                        skipped = stream.read(min(_CHUNK, remaining))
                        if not skipped:
                            return  # file shorter than our slice start
                        remaining -= len(skipped)
                skip_first = False
                if start > 0:
                    skip_first = stream.read(1) != b"\n"
                for line in _iter_lines_from_stream(stream, start, end, skip_first):
                    yield (line.decode("utf-8", errors="replace"),)
        else:
            yield from _read_local_slice(self.path, start, end)


class WikidataDumpDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "wikidata_dump"

    def schema(self) -> str:
        return "value string"

    def reader(self, schema) -> _DumpReader:
        return _DumpReader(self.options)

    def streamReader(self, schema) -> "_DumpStreamReader":
        return _DumpStreamReader(self.options)


def _read_local_slice(path: str, start: int, end: int):
    """The batch reader's local-file branch as a reusable generator —
    identical ownership rule, shared by the batch and stream readers."""
    if start == end:
        return
    with open(path, "rb") as f:
        skip_first = False
        if start > 0:
            f.seek(start - 1)
            skip_first = f.read(1) != b"\n"
        else:
            f.seek(start)
        for line in _iter_lines_from_stream(f, start, end, skip_first):
            yield (line.decode("utf-8", errors="replace"),)


def _last_line_boundary(path: str, upto: int) -> int:
    """Largest p <= upto such that byte p-1 is a newline (0 if none):
    the stream offset frontier. Scans backwards in chunks from ``upto``
    so a torn final line (a writer mid-append) is never claimed by an
    offset — claiming it would emit a prefix once and then skip the
    completed line forever (the skip_first rule would eat it)."""
    with open(path, "rb") as f:
        pos = upto
        while pos > 0:
            lo = max(0, pos - _CHUNK)
            f.seek(lo)
            buf = f.read(pos - lo)
            nl = buf.rfind(b"\n")
            if nl >= 0:
                return lo + nl + 1
            pos = lo
    return 0


class _DumpStreamReader(DataSourceStreamReader):
    """Streaming tail of a line-ledger file with byte-position offsets —
    the streaming twin of the batch reader. Each micro-batch claims
    [start, end) where ``end`` advances by at most
    ``maxbytespertrigger`` AND always lands one byte past a newline
    (_last_line_boundary), so every emitted line is complete and every
    batch boundary is exactly-once by the same line-ownership rule the
    batch slices use. Offsets live in the query checkpoint; a restarted
    query resumes from the committed position (Spark passes it back via
    partitions(start, end) — the reader keeps no authoritative state).

    Local files only: an HTTP tail cannot give consistent byte offsets
    without validators; the batch reader covers HTTP. Appends must be
    whole-file-append (a ledger), not in-place rewrites.
    """

    def __init__(self, options):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("wikidata_dump stream: option 'path' is required")
        if self.path.startswith(("http://", "https://")):
            raise ValueError(
                "wikidata_dump stream: HTTP tailing is not supported; "
                "stream from a local/mounted ledger file"
            )
        if self.path.endswith(".bz2"):
            raise ValueError(
                "wikidata_dump stream: .bz2 is not byte-splittable"
            )
        self.n = int(options.get("numpartitions", DEFAULT_NUM_PARTITIONS))
        self.max_bytes = int(options.get("maxbytespertrigger", 1 << 20))
        if self.max_bytes <= 0:
            raise ValueError("maxbytespertrigger must be positive")
        # rate-limit bookkeeping only — NEVER authoritative (the
        # checkpoint is); None means "first latestOffset after (re)start",
        # where we allow a full catch-up batch
        self._pos: int | None = None

    def initialOffset(self) -> dict:
        return {"pos": 0}

    def latestOffset(self) -> dict:
        size = os.stat(self.path).st_size
        cap = size if self._pos is None else min(size, self._pos + self.max_bytes)
        off = _last_line_boundary(self.path, cap)
        if self._pos is not None:
            off = max(off, self._pos)  # never regress the frontier
        self._pos = off
        return {"pos": off}

    def partitions(self, start: dict, end: dict):
        s, e = int(start["pos"]), int(end["pos"])
        # restart resync: the checkpointed end is authoritative
        self._pos = max(self._pos or 0, e)
        if e <= s:
            return [_Slice(s, s)]
        n = max(1, min(self.n, e - s))
        step = (e - s) // n
        bounds = [s + i * step for i in range(n)] + [e]
        return [_Slice(bounds[i], bounds[i + 1]) for i in range(n)]

    def read(self, partition: _Slice):
        yield from _read_local_slice(self.path, partition.start, partition.end)

    def commit(self, end: dict) -> None:
        pass  # offsets are checkpoint-managed; nothing external to ack
