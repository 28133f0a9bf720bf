#!/usr/bin/env python
"""Scale-envelope probe: run named workload queries at an arbitrary
sf directory (e.g. a make_scale_data.py 10x/100x copy) and print one
JSON line per query plus a summary line.

The r9 verdict (Missing #2) asked for a SECOND decade: every envelope
stopped at 10x, so "~linear" claims for the heavy families rested on
one point. Usage:

    python scripts/make_scale_data.py /root/testdata/sf0.1 /tmp/sfscale100 100
    python scripts/bench_scale_probe.py /tmp/sfscale100 \
        dedup_containment_pairs dedup_winnow_matches g20_sssp_part_graph

Methodology matches bench.py (force = xxhash64 checksum over every
output column so Catalyst cannot prune the computed work; loadavg
recorded), except RUNS defaults to 1 at 100x — the one-time janino
codegen the min-of-2 exists to amortize is seconds against walls of
minutes (override with SCALE_PROBE_RUNS=2).
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    sf_dir = sys.argv[1]
    names = sys.argv[2:]
    if not names:
        raise SystemExit("usage: bench_scale_probe.py <sf_dir> <query> [query ...]")
    runs = int(os.environ.get("SCALE_PROBE_RUNS", "1"))

    from pyspark.sql import functions as F

    from geo_db_spark import workload
    from geo_db_spark.session import get_spark

    # a 100x corpus needs a bigger heap than the 8g test default (the
    # single local JVM stands in for a whole cluster's executor memory)
    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "96g")
    spark = get_spark(
        "geo_db_spark_scale_probe",
        shuffle_partitions=int(os.environ.get("SCALE_PROBE_SHUFFLE", "128")),
    )
    # extra runtime confs, "k=v,k=v" (e.g. shrink AQE's advisory
    # partition size: coalescing sizes partitions by COMPRESSED shuffle
    # bytes, which wildly underestimates stages whose in-memory state
    # expands — the 100x containment aggregation got coalesced to 33
    # tasks and spilled 40+ GB regardless of the initial partition count)
    for kv in filter(None, os.environ.get("SCALE_PROBE_CONF", "").split(",")):
        k, v = kv.split("=", 1)
        spark.conf.set(k.strip(), v.strip())
    qs = workload.queries()

    def force(df):
        row = df.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.xxhash64(*[F.col(c) for c in df.columns])).alias("chk"),
        ).collect()[0]
        return row["n"]

    # warm the JVM + parquet footers with the cheapest query
    qs["q6_revenue_forecast"](spark, sf_dir).collect()

    results = {}
    for name in names:
        raw = []
        n = -1
        load0 = os.getloadavg()[0]  # once, before ANY run of this query
        for _ in range(runs):
            t0 = time.perf_counter()
            n = force(qs[name](spark, sf_dir))
            raw.append(round(time.perf_counter() - t0, 2))
        results[name] = {"sec": min(raw), "raw": raw, "rows": n,
                         "loadavg_at_start": round(load0, 2)}
        print(json.dumps({"query": name, **results[name]}), flush=True)
    print(json.dumps({"metric": "scale_probe", "sf_dir": sf_dir,
                      "runs": runs, "queries": results}), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
