"""Resumable HTTP download to local storage (reference A1).

The reference streams the dump straight into its pipeline through a
reentrant HTTP reader (src/input/http.rs:48-152) with Range+ETag resume
and a 32-try / 8-second open-retry policy (src/input/http.rs:10-11,
:154-177). Spark-first, the dump should land in (object) storage first
and be read with ``spark.read`` — splittable bz2 then parallelizes the
scan the reference's serial socket never could (SURVEY.md §2 A1). This
module is that missing "download first" step, with the same resilience
semantics:

- ``Range: bytes=N-`` resume from the current byte offset (also across
  process restarts: the offset is the destination file's size);
- ETag pinning — if the server's ETag changes between opens the file
  changed mid-download and we refuse to mix bytes (http.rs:82-86);
- a server answering 206 from an EARLIER offset is skipped forward to
  the exact byte (http.rs:119-139); an offset beyond ours is an error
  (http.rs:110-112); a server ignoring Range (plain 200) restarts the
  file from scratch;
- up to 32 open attempts at 8 s intervals (http.rs:10-11), counted per
  (re)open like the reference's ``try_open``.

Stdlib-only (urllib) so the utility works in minimal driver images.
"""

from __future__ import annotations

import os
import time
import urllib.error
import urllib.request

USER_AGENT = "geo-db-spark downloader"
MAX_OPEN_TRIES = 32  # reference src/input/http.rs:10
OPEN_RETRY_INTERVAL_SECS = 8.0  # reference src/input/http.rs:11
_SKIP_CHUNK = 1024  # reference seeks forward in 1 KiB reads (http.rs:123)
# A server that ignores Range restarts the file from scratch each open;
# without a cap that's an unbounded loop (ADVICE r2). The reference
# never hits this (it errors on offset mismatch); we allow a few full
# restarts for flaky CDN fronts, then fail loudly.
MAX_FULL_RESTARTS = 4


class DownloadError(RuntimeError):
    pass


class EtagMismatch(DownloadError):
    """The server's ETag changed mid-download (http.rs:82-86)."""


class ContentRangeError(DownloadError):
    """Content-Range missing/odd or beyond our offset (http.rs:88-112)."""


def _parse_content_range_start(header: str | None) -> int:
    """``bytes <start>-<end>/<size>`` -> start; absent header -> 0
    (mirrors http.rs:88-108: missing Content-Range means offset 0)."""
    if header is None:
        return 0
    parts = header.split(" ")
    if len(parts) != 2 or parts[0] != "bytes":
        raise ContentRangeError(f"unexpected Content-Range {header!r}")
    try:
        return int(parts[1].split("/")[0].split("-")[0])
    except ValueError as e:
        raise ContentRangeError(f"unexpected Content-Range {header!r}") from e


def _open(url: str, offset: int, timeout: float):
    req = urllib.request.Request(url, headers={"User-Agent": USER_AGENT})
    if offset > 0:
        req.add_header("Range", f"bytes={offset}-")
    return urllib.request.urlopen(req, timeout=timeout)


def _verify_complete(url: str, offset: int, etag: str | None, timeout: float) -> int:
    """A 416 only means "file complete" if the remote really is `offset`
    bytes of the same object — a replaced/shrunk remote also answers 416
    (ADVICE r2). HEAD the resource and compare ETag + Content-Length
    before declaring success."""
    req = urllib.request.Request(
        url, method="HEAD", headers={"User-Agent": USER_AGENT}
    )
    with urllib.request.urlopen(req, timeout=timeout) as resp:
        head_etag = resp.headers.get("ETag", "") or ""
        clen = resp.headers.get("Content-Length")
    if etag is not None and head_etag != etag:
        raise EtagMismatch(
            f"416 but etag changed {etag!r} -> {head_etag!r}: remote replaced"
        )
    if clen is not None and int(clen) != offset:
        raise ContentRangeError(
            f"416 but remote is {clen} bytes, local {offset}: size mismatch"
        )
    return offset


def download_resumable(
    url: str,
    dest: str,
    max_open_tries: int = MAX_OPEN_TRIES,
    retry_interval: float = OPEN_RETRY_INTERVAL_SECS,
    chunk_size: int = 1 << 20,
    timeout: float = 60.0,
    sleep=time.sleep,
) -> int:
    """Download ``url`` to ``dest``, resuming any partial file already
    there. Returns the final byte count. The ETag is pinned in a
    ``dest + '.etag'`` sidecar so resumes across process restarts still
    detect a changed source file."""
    etag_path = dest + ".etag"
    offset = os.path.getsize(dest) if os.path.exists(dest) else 0
    etag: str | None = None
    if offset > 0 and os.path.exists(etag_path):
        etag = open(etag_path).read() or None

    full_restarts = 0
    while True:
        resp = None
        tries = 0
        # the reference's try_open loop (http.rs:154-177): fresh budget
        # of MAX_OPEN_TRIES per (re)open
        while resp is None:
            tries += 1
            try:
                resp = _open(url, offset, timeout)
            except urllib.error.HTTPError as e:
                if e.code == 416 and offset > 0:
                    # range not satisfiable: complete — but only after a
                    # HEAD confirms same ETag and exact size (a replaced
                    # or shrunk remote answers 416 too)
                    return _verify_complete(url, offset, etag, timeout)
                if tries >= max_open_tries:
                    raise DownloadError(f"open failed after {tries} tries: {e}") from e
                sleep(retry_interval)
            except OSError as e:
                if tries >= max_open_tries:
                    raise DownloadError(f"open failed after {tries} tries: {e}") from e
                sleep(retry_interval)

        with resp:
            new_etag = resp.headers.get("ETag", "") or ""
            if offset > 0:
                if etag is not None and new_etag != etag:
                    raise EtagMismatch(f"etag changed {etag!r} -> {new_etag!r}")
                if resp.status == 200:
                    # server ignored the Range header: start over — but a
                    # Range-ignoring server that also drops connections
                    # mid-body would loop restart-from-zero forever, so
                    # cap the restarts (the per-open retry budget doesn't
                    # cover this: every open "succeeds")
                    full_restarts += 1
                    if full_restarts > MAX_FULL_RESTARTS:
                        raise DownloadError(
                            f"server ignored Range {full_restarts} times; "
                            "no resume progress possible"
                        )
                    offset = 0
                    res_offset = 0
                else:
                    res_offset = _parse_content_range_start(
                        resp.headers.get("Content-Range")
                    )
                    if res_offset > offset:
                        raise ContentRangeError(
                            f"server offset {res_offset} beyond ours {offset}"
                        )
            else:
                res_offset = 0

            if etag != new_etag:
                etag = new_etag
                tmp = etag_path + ".tmp"
                with open(tmp, "w") as f:
                    f.write(etag)
                os.replace(tmp, etag_path)

            # a dropped connection can surface as a CLEAN early EOF (FIN
            # mid-body), so "read returned empty" only means done when
            # we've reached the advertised end
            clen = resp.headers.get("Content-Length")
            expected_end = res_offset + int(clen) if clen is not None else None

            mode = "r+b" if (offset > 0 and os.path.exists(dest)) else "wb"
            try:
                with open(dest, mode) as out:
                    out.seek(offset)
                    out.truncate()
                    # skip forward if the server started earlier than asked
                    to_skip = offset - res_offset
                    while to_skip > 0:
                        skipped = resp.read(min(_SKIP_CHUNK, to_skip))
                        if not skipped:
                            raise ConnectionError("EOF while seeking to offset")
                        to_skip -= len(skipped)
                    while True:
                        chunk = resp.read(chunk_size)
                        if not chunk:
                            if expected_end is not None and offset < expected_end:
                                raise ConnectionError(
                                    f"early EOF at {offset} < {expected_end}"
                                )
                            return offset
                        out.write(chunk)
                        offset += len(chunk)
            except (OSError, EOFError):
                # connection dropped mid-body: reopen with Range resume
                continue
