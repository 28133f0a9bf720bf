"""Custom wikidata_dump DataSource: byte-range splitting must partition
the file WITHOUT losing or duplicating lines (line-start ownership), for
local files and HTTP Range reads alike."""

from __future__ import annotations

import http.server
import threading

import pytest

from geo_db_spark.sources.dump_source import WikidataDumpDataSource


@pytest.fixture(scope="module")
def registered(spark):
    spark.dataSource.register(WikidataDumpDataSource)
    return spark


def _lines(n=500):
    # variable-length lines so partition bounds land mid-line
    return [f'{{"id": "Q{i}", "pad": "{"x" * (i % 97)}"}}' for i in range(n)]


def test_local_split_matches_read_text(registered, tmp_path):
    spark = registered
    p = tmp_path / "dump.json"
    p.write_text("\n".join(_lines()) + "\n")
    got = (
        spark.read.format("wikidata_dump")
        .option("path", str(p))
        .option("numPartitions", "7")
        .load()
    )
    assert got.rdd.getNumPartitions() == 7
    got_rows = sorted(r.value for r in got.collect())
    want_rows = sorted(r.value for r in spark.read.text(str(p)).collect())
    assert got_rows == want_rows


def test_local_no_trailing_newline(registered, tmp_path):
    spark = registered
    p = tmp_path / "dump2.json"
    p.write_text("\n".join(_lines(101)))  # unterminated last line
    got = sorted(
        r.value
        for r in spark.read.format("wikidata_dump")
        .option("path", str(p))
        .option("numPartitions", "5")
        .load()
        .collect()
    )
    assert got == sorted(_lines(101))


def test_bz2_refused(registered, tmp_path):
    spark = registered
    with pytest.raises(Exception, match="bz2"):
        spark.read.format("wikidata_dump").option(
            "path", str(tmp_path / "d.json.bz2")
        ).load().collect()


class _RangeHandler(http.server.BaseHTTPRequestHandler):
    payload = b""

    def log_message(self, *a):
        pass

    def do_HEAD(self):
        self.send_response(200)
        self.send_header("Content-Length", str(len(self.payload)))
        self.send_header("Accept-Ranges", "bytes")
        self.end_headers()

    def do_GET(self):
        rng = self.headers.get("Range")
        start = 0
        if rng:
            start = int(rng.split("=")[1].rstrip("-").split("-")[0])
            body = self.payload[start:]
            self.send_response(206)
            self.send_header(
                "Content-Range", f"bytes {start}-{len(self.payload) - 1}/{len(self.payload)}"
            )
        else:
            body = self.payload
            self.send_response(200)
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        try:
            self.wfile.write(body)
        except BrokenPipeError:
            pass  # reader stopped early after passing its slice end


def test_http_range_split_reads_all_lines(registered, tmp_path):
    spark = registered
    _RangeHandler.payload = ("\n".join(_lines(300)) + "\n").encode()
    srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), _RangeHandler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        url = f"http://127.0.0.1:{srv.server_address[1]}/dump.json"
        got = sorted(
            r.value
            for r in spark.read.format("wikidata_dump")
            .option("path", url)
            .option("numPartitions", "4")
            .load()
            .collect()
        )
        assert got == sorted(_lines(300))
    finally:
        srv.shutdown()


def test_dump_source_feeds_real_pipeline(registered, tmp_path):
    """The connector's lines drive parse_entity_lines identically to the
    spark.read.text path (read_entity_dump)."""
    import json

    from geo_db_spark.sources.wikidata import parse_entity_lines, read_entity_dump

    p = tmp_path / "entities.json"
    ents = [
        json.dumps({"id": f"Q{i}", "claims": {"P17": [{"mainsnak": {
            "snaktype": "value", "datavalue": {"value": {"id": "Q183"}}}}]}})
        for i in range(50)
    ]
    p.write_text("[\n" + ",\n".join(ents) + "\n]\n")  # dump-style brackets+commas
    via_source = parse_entity_lines(
        registered.read.format("wikidata_dump")
        .option("path", str(p))
        .option("numPartitions", "3")
        .load()
    )
    via_text = read_entity_dump(registered, str(p))
    a = sorted(r.id for r in via_source.select("id").collect())
    b = sorted(r.id for r in via_text.select("id").collect())
    assert a == b and len(a) == 50


def test_boundary_exactly_at_line_start_not_lost(registered, tmp_path):
    """Fixed-width lines + partition bounds landing EXACTLY on line
    starts: the ownership rule must not drop (or double-read) boundary
    lines — the classic off-by-one in byte-range text splitting."""
    spark = registered
    p = tmp_path / "fixed.json"
    lines = [f"line-{i:04d}" for i in range(100)]  # 9 chars + \n = 10 bytes
    p.write_text("\n".join(lines) + "\n")
    assert p.stat().st_size == 1000  # bounds at 250/500/750 = line starts
    got = sorted(
        r.value
        for r in spark.read.format("wikidata_dump")
        .option("path", str(p))
        .option("numPartitions", "4")
        .load()
        .collect()
    )
    assert got == sorted(lines)


def _await_rows(spark, table, want, timeout=60):
    import time

    deadline = time.time() + timeout
    while time.time() < deadline:
        n = spark.sql(f"select count(*) n from {table}").collect()[0]["n"]
        if n >= want:
            return n
        time.sleep(0.3)
    return spark.sql(f"select count(*) n from {table}").collect()[0]["n"]


def test_stream_tail_rate_limited_exactly_once(registered, tmp_path):
    """Streaming twin: a small maxbytespertrigger forces MANY micro-
    batches over one ledger; the union of all batches must be exactly
    the file's lines — no loss, no duplicates — with batch boundaries
    landing mid-file (the ownership rule across OFFSETS, not just
    partitions)."""
    lines = _lines(300)
    p = tmp_path / "ledger.jsonl"
    p.write_text("\n".join(lines) + "\n")
    q = (
        registered.readStream.format("wikidata_dump")
        .option("path", str(p))
        .option("maxbytespertrigger", 2048)
        .option("numpartitions", 3)
        .load()
        .writeStream.format("memory")
        .queryName("dump_tail")
        .outputMode("append")
        .start()
    )
    try:
        got_n = _await_rows(registered, "dump_tail", len(lines))
        got = [r["value"] for r in registered.sql("select value from dump_tail").collect()]
    finally:
        q.stop()
    assert sorted(got) == sorted(lines)
    assert got_n == len(lines)
    # the rate limit must actually have split the work
    assert q.lastProgress is None or q.recentProgress  # progress recorded


def test_stream_tail_never_emits_torn_line(registered, tmp_path):
    """A writer mid-append leaves an unterminated tail; the offset
    frontier must hold BEFORE it (no prefix emission), then emit the
    completed line exactly once after the newline lands."""
    p = tmp_path / "torn.jsonl"
    p.write_text("alpha\nbeta\ngam")  # torn third line
    q = (
        registered.readStream.format("wikidata_dump")
        .option("path", str(p))
        .load()
        .writeStream.format("memory")
        .queryName("torn_tail")
        .outputMode("append")
        .start()
    )
    try:
        _await_rows(registered, "torn_tail", 2)
        got1 = {r["value"] for r in registered.sql("select value from torn_tail").collect()}
        assert got1 == {"alpha", "beta"}  # 'gam' prefix withheld
        with open(p, "a") as f:
            f.write("ma\ndelta\n")  # complete the torn line + one more
        _await_rows(registered, "torn_tail", 4)
        got2 = {r["value"] for r in registered.sql("select value from torn_tail").collect()}
    finally:
        q.stop()
    assert got2 == {"alpha", "beta", "gamma", "delta"}


def test_stream_tail_restart_resumes_from_checkpoint(registered, tmp_path):
    """Exactly-once across a restart: stop after consuming the first
    write, append, restart with the SAME checkpoint — the sink gains
    only the new lines (offsets came from the checkpoint, not the
    reader's memory)."""
    p = tmp_path / "resume.jsonl"
    out = str(tmp_path / "resume_out")
    ckpt = str(tmp_path / "resume_ckpt")
    p.write_text("one\ntwo\n")

    def run(expect):
        q = (
            registered.readStream.format("wikidata_dump")
            .option("path", str(p))
            .load()
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .start()
        )
        try:
            import time

            deadline = time.time() + 60
            while time.time() < deadline:
                try:
                    n = registered.read.parquet(out).count()
                except Exception:
                    n = 0
                if n >= expect:
                    break
                time.sleep(0.3)
        finally:
            q.stop()

    run(2)
    with open(p, "a") as f:
        f.write("three\nfour\n")
    run(4)
    got = sorted(r["value"] for r in registered.read.parquet(out).collect())
    assert got == ["four", "one", "three", "two"]
