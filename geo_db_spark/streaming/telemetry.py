"""Progress telemetry for streaming jobs — the reference's 10-second
ticker (A10: % complete, rows/s, ETA at src/main.rs:192-225) re-expressed
as a StreamingQueryListener.

The reference polls byte offsets on a single stream; Spark already
meters every micro-batch (rows, duration, watermark, state size), so the
Spark-native form is a listener over those progress events. Attach once
per session; every streaming query (ingest, rollup maintenance,
stream-stream joins) reports through it. The numbers land in the
driver log AND in ``IngestTicker.history`` for programmatic assertions
— the e2e test reads the latter.
"""

from __future__ import annotations

import sys
import time
from dataclasses import dataclass, field

from pyspark.sql.streaming import StreamingQueryListener


@dataclass
class BatchStat:
    query: str
    batch_id: int
    n_rows: int
    rows_per_sec: float
    wall_s: float


class IngestTicker(StreamingQueryListener):
    """Logs one line per micro-batch: rows, rows/s, cumulative totals.

    ETA needs a denominator the engine cannot know for an unbounded
    stream; when the caller knows the total (a dump of known size), pass
    ``total_rows`` and the ticker derives % complete and ETA from the
    cumulative rate — exactly the reference's ticker semantics.

    NOT a dataclass: the generated __init__ would skip the listener
    base-class initialization the Py4J bridge needs, and events silently
    stop arriving.
    """

    def __init__(self, total_rows: int | None = None, log: bool = True) -> None:
        super().__init__()
        self.total_rows = total_rows
        self.log = log
        self.history: list[BatchStat] = []
        self._started_at = time.time()
        self._cum_rows = 0

    def onQueryStarted(self, event) -> None:
        self._started_at = time.time()

    def onQueryProgress(self, event) -> None:
        p = event.progress
        n = int(p.numInputRows)
        secs = (p.batchDuration or 0) / 1000.0
        rate = n / secs if secs > 0 else 0.0
        self._cum_rows += n
        stat = BatchStat(
            query=p.name or p.id,
            batch_id=p.batchId,
            n_rows=n,
            rows_per_sec=rate,
            wall_s=secs,
        )
        self.history.append(stat)
        if self.log:
            msg = (
                f"[ingest] {stat.query} batch={stat.batch_id} rows={n} "
                f"({rate:,.0f}/s) cum={self._cum_rows}"
            )
            if self.total_rows:
                frac = min(self._cum_rows / self.total_rows, 1.0)
                elapsed = time.time() - self._started_at
                eta = elapsed * (1 - frac) / frac if frac > 0 else float("inf")
                msg += f" {frac:5.1%} eta={eta:,.0f}s"
            print(msg, file=sys.stderr)

    def onQueryIdle(self, event) -> None:
        pass

    def onQueryTerminated(self, event) -> None:
        pass


def attach_ticker(spark, total_rows: int | None = None, log: bool = True) -> IngestTicker:
    """Create and register an IngestTicker on the session; returns it so
    callers can read ``.history`` or detach with
    ``spark.streams.removeListener(ticker)``."""
    t = IngestTicker(total_rows=total_rows, log=log)
    spark.streams.addListener(t)
    return t
