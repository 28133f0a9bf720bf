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
    ``total_rows`` — an int (applied to each query separately) or a dict
    keyed by query name/id — and the ticker derives % complete and ETA
    from that query's own cumulative rate, exactly the reference's
    ticker semantics. Rows, start time, %, and ETA are all tracked PER
    QUERY ID, so concurrent streams on the session can't skew each
    other's progress.

    NOT a dataclass: the generated __init__ would skip the listener
    base-class initialization the Py4J bridge needs, and events silently
    stop arriving.
    """

    def __init__(self, total_rows: int | dict[str, int] | None = None, log: bool = True) -> None:
        super().__init__()
        self.total_rows = total_rows
        self.log = log
        self.history: list[BatchStat] = []
        # per-query-id accumulators: a session-wide listener sees EVERY
        # streaming query on the session (ingest + rollup maintenance +
        # ...), so a single cum/started pair would blend their rows and
        # skew %/ETA (ADVICE r3)
        self._cum: dict[str, int] = {}
        self._started: dict[str, float] = {}

    def cum_rows(self, query_id: str | None = None) -> int:
        """Cumulative input rows — for one query id, or all queries."""
        if query_id is not None:
            return self._cum.get(query_id, 0)
        return sum(self._cum.values())

    def _total_for(self, name: str | None, qid: str) -> int | None:
        if isinstance(self.total_rows, dict):
            return self.total_rows.get(name or "") or self.total_rows.get(qid)
        return self.total_rows

    def onQueryStarted(self, event) -> None:
        self._started[str(event.id)] = time.time()

    def onQueryProgress(self, event) -> None:
        p = event.progress
        qid = str(p.id)
        n = int(p.numInputRows)
        secs = (p.batchDuration or 0) / 1000.0
        rate = n / secs if secs > 0 else 0.0
        cum = self._cum.get(qid, 0) + n
        self._cum[qid] = cum
        started = self._started.setdefault(qid, time.time() - secs)
        stat = BatchStat(
            query=p.name or qid,
            batch_id=p.batchId,
            n_rows=n,
            rows_per_sec=rate,
            wall_s=secs,
        )
        self.history.append(stat)
        if self.log:
            msg = (
                f"[ingest] {stat.query} batch={stat.batch_id} rows={n} "
                f"({rate:,.0f}/s) cum={cum}"
            )
            total = self._total_for(p.name, qid)
            if total:
                frac = min(cum / total, 1.0)
                elapsed = time.time() - started
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
