"""A1 resumable downloader (sources/download.py) against a local HTTP
server that drops connections mid-body — the failure mode the
reference's reentrant reader is built for (src/input/http.rs:48-152)."""

from __future__ import annotations

import http.server
import os
import threading

import pytest

from geo_db_spark.sources.download import (
    ContentRangeError,
    EtagMismatch,
    download_resumable,
)

PAYLOAD = bytes(range(256)) * 512  # 128 KiB, position-identifiable


class _FlakyHandler(http.server.BaseHTTPRequestHandler):
    """Serves PAYLOAD with ETag + Range support, but closes the socket
    after at most `per_request` body bytes."""

    etag = '"v1"'
    per_request = 20_000
    honor_range = True
    requests_seen: list[str] = []

    def do_GET(self):  # noqa: N802 (stdlib naming)
        cls = type(self)
        cls.requests_seen.append(self.headers.get("Range") or "-")
        start = 0
        rng = self.headers.get("Range")
        if rng and cls.honor_range:
            start = int(rng.split("=")[1].rstrip("-"))
            if start >= len(PAYLOAD):
                self.send_response(416)
                self.end_headers()
                return
            self.send_response(206)
            self.send_header(
                "Content-Range", f"bytes {start}-{len(PAYLOAD) - 1}/{len(PAYLOAD)}"
            )
        else:
            self.send_response(200)
        body = PAYLOAD[start : start + cls.per_request]
        self.send_header("ETag", cls.etag)
        self.send_header("Content-Length", str(len(PAYLOAD) - start))
        self.end_headers()
        self.wfile.write(body)
        # close without sending the rest -> client sees early EOF

    def do_HEAD(self):  # noqa: N802 (stdlib naming)
        cls = type(self)
        self.send_response(200)
        self.send_header("ETag", cls.etag)
        self.send_header("Content-Length", str(len(PAYLOAD)))
        self.end_headers()

    def log_message(self, *a):  # silence
        pass


@pytest.fixture()
def flaky_server():
    _FlakyHandler.etag = '"v1"'
    _FlakyHandler.per_request = 20_000
    _FlakyHandler.honor_range = True
    _FlakyHandler.requests_seen = []
    srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), _FlakyHandler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}/dump.bz2"
    srv.shutdown()


def test_resumes_across_dropped_connections(flaky_server, tmp_path):
    dest = str(tmp_path / "dump.bz2")
    n = download_resumable(flaky_server, dest, retry_interval=0, sleep=lambda s: None)
    assert n == len(PAYLOAD)
    assert open(dest, "rb").read() == PAYLOAD
    # needed ceil(128K/20K) = 7 requests, all but the first with Range
    assert len(_FlakyHandler.requests_seen) == 7
    assert _FlakyHandler.requests_seen[0] == "-"
    assert _FlakyHandler.requests_seen[1] == "bytes=20000-"


def test_resumes_partial_file_from_prior_run(flaky_server, tmp_path):
    dest = str(tmp_path / "dump.bz2")
    with open(dest, "wb") as f:
        f.write(PAYLOAD[:30_000])
    with open(dest + ".etag", "w") as f:
        f.write('"v1"')
    n = download_resumable(flaky_server, dest, retry_interval=0, sleep=lambda s: None)
    assert n == len(PAYLOAD)
    assert open(dest, "rb").read() == PAYLOAD
    assert _FlakyHandler.requests_seen[0] == "bytes=30000-"


def test_etag_change_refuses_to_mix_bytes(flaky_server, tmp_path):
    dest = str(tmp_path / "dump.bz2")
    with open(dest, "wb") as f:
        f.write(PAYLOAD[:30_000])
    with open(dest + ".etag", "w") as f:
        f.write('"v0"')  # downloaded from an older version of the file
    with pytest.raises(EtagMismatch):
        download_resumable(flaky_server, dest, retry_interval=0, sleep=lambda s: None)


def test_range_ignoring_server_restarts_from_scratch(flaky_server, tmp_path):
    _FlakyHandler.honor_range = False
    _FlakyHandler.per_request = len(PAYLOAD)  # but completes in one go
    dest = str(tmp_path / "dump.bz2")
    with open(dest, "wb") as f:
        f.write(b"junk" * 1000)
    with open(dest + ".etag", "w") as f:
        f.write('"v1"')
    n = download_resumable(flaky_server, dest, retry_interval=0, sleep=lambda s: None)
    assert n == len(PAYLOAD)
    assert open(dest, "rb").read() == PAYLOAD


def test_complete_file_hits_416_and_returns(flaky_server, tmp_path):
    dest = str(tmp_path / "dump.bz2")
    with open(dest, "wb") as f:
        f.write(PAYLOAD)
    with open(dest + ".etag", "w") as f:
        f.write('"v1"')
    n = download_resumable(flaky_server, dest, retry_interval=0, sleep=lambda s: None)
    assert n == len(PAYLOAD)


def test_416_with_shrunk_remote_is_an_error(flaky_server, tmp_path):
    """Local file LONGER than the remote: the server answers 416, but the
    HEAD size check must refuse to call that complete (ADVICE r2)."""
    dest = str(tmp_path / "dump.bz2")
    with open(dest, "wb") as f:
        f.write(PAYLOAD + b"extra-bytes")
    with open(dest + ".etag", "w") as f:
        f.write('"v1"')
    with pytest.raises(ContentRangeError):
        download_resumable(flaky_server, dest, retry_interval=0, sleep=lambda s: None)


def test_416_with_changed_etag_is_an_error(flaky_server, tmp_path):
    """416 from a REPLACED remote (different ETag) must raise, not return
    success — the promised ETag catch on 416 (ADVICE r2)."""
    dest = str(tmp_path / "dump.bz2")
    with open(dest, "wb") as f:
        f.write(PAYLOAD)
    with open(dest + ".etag", "w") as f:
        f.write('"v0"')
    with pytest.raises(EtagMismatch):
        download_resumable(flaky_server, dest, retry_interval=0, sleep=lambda s: None)


def test_range_ignoring_dropping_server_caps_restarts(flaky_server, tmp_path):
    """A server that both ignores Range AND drops mid-body makes no
    resume progress; the full-restart cap turns the would-be infinite
    loop into a loud error (ADVICE r2)."""
    from geo_db_spark.sources.download import DownloadError

    _FlakyHandler.honor_range = False
    _FlakyHandler.per_request = 20_000  # drops before the 128 KiB end
    dest = str(tmp_path / "dump.bz2")
    with open(dest, "wb") as f:
        f.write(b"junk" * 1000)
    with open(dest + ".etag", "w") as f:
        f.write('"v1"')
    with pytest.raises(DownloadError, match="ignored Range"):
        download_resumable(flaky_server, dest, retry_interval=0, sleep=lambda s: None)


def test_fetch_entity_json_unwraps_entities(monkeypatch):
    """A8's HTTP half (src/main.rs:241-255): GET Special:EntityData,
    unwrap .entities[qid] — against a local server."""
    import json

    doc = {"entities": {"Q64": {"id": "Q64", "claims": {}}}}

    class H(http.server.BaseHTTPRequestHandler):
        def do_GET(self):  # noqa: N802
            body = json.dumps(doc).encode()
            self.send_response(200)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def log_message(self, *a):
            pass

    srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), H)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        from geo_db_spark import extract

        monkeypatch.setattr(
            extract,
            "ENTITY_DATA_URL",
            f"http://127.0.0.1:{srv.server_address[1]}/{{qid}}.json",
        )
        out = extract.fetch_entity_json("Q64")
        assert json.loads(out) == {"id": "Q64", "claims": {}}
    finally:
        srv.shutdown()


def test_open_failure_exhausts_retries(tmp_path):
    from geo_db_spark.sources.download import DownloadError

    naps = []
    with pytest.raises(DownloadError):
        download_resumable(
            "http://127.0.0.1:9/nope",  # discard port: connection refused
            str(tmp_path / "x"),
            max_open_tries=3,
            retry_interval=8.0,
            sleep=naps.append,
        )
    assert naps == [8.0, 8.0]  # slept between tries, not after the last
