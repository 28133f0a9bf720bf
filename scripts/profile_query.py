#!/usr/bin/env python
"""Profile declared queries one at a time (optimization-round tooling).

Usage: python scripts/profile_query.py [--runs N] [--noop] [--plan-dir DIR] q1 q2 ...

For each query: build the DataFrame, run it ``--runs`` times with the
bench's xxhash64 full-evaluation force (or the noop sink with ``--noop``),
print per-run walls, and (with ``--plan-dir``) write ``<name>.txt`` with
the ``explain("formatted")`` output plus a one-line Exchange/node census.
Jobs are labelled via setJobDescription so the timeline is attributable.
"""

from __future__ import annotations

import argparse
import os
import re
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--runs", type=int, default=2)
    ap.add_argument("--gc", action="store_true",
                    help="drop python refs + System.gc() between queries "
                         "(isolates per-query cost from accumulated "
                         "localCheckpoint blocks)")
    ap.add_argument("--noop", action="store_true")
    ap.add_argument("--plan-dir", default=None)
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from geo_db_spark import workload
    from geo_db_spark.session import get_spark

    spark = get_spark("profile_query")
    qs = workload.queries()

    def force(df):
        if args.noop:
            df.write.format("noop").mode("overwrite").save()
            return -1
        row = df.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.xxhash64(*[F.col(c) for c in df.columns])).alias("chk"),
        ).collect()[0]
        return row["n"]

    # warm the JVM + parquet footers
    qs["q6_revenue_forecast"](spark, args.sf_dir).collect()

    for name in args.names:
        fn = qs[name]
        if args.plan_dir:
            os.makedirs(args.plan_dir, exist_ok=True)
            df = fn(spark, args.sf_dir)
            plan = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
            )
            census = {
                k: len(re.findall(k, plan))
                for k in ("Exchange", "SinglePartition", "BatchEvalPython",
                          "ArrowEvalPython", "SortMergeJoin", "BroadcastHashJoin",
                          "ShuffledHashJoin", "Sort ")
            }
            with open(os.path.join(args.plan_dir, f"{name}.txt"), "w") as f:
                f.write(f"-- census: {census}\n")
                f.write(plan)
            print(f"{name}: plan -> {args.plan_dir}/{name}.txt  census={census}")
        walls = []
        if not args.runs:
            continue

        def _njobs():
            # r13: submitted-job counter (DAGScheduler.numTotalJobs) —
            # the per-run delta shows the scheduler round-trips a query
            # pays, the thing the lazy-checkpoint reworks remove
            try:
                return spark.sparkContext._jsc.sc().dagScheduler().numTotalJobs()
            except Exception:
                return -1

        jobs = []
        for i in range(args.runs):
            spark.sparkContext.setJobDescription(f"{name} run{i}")
            j0 = _njobs()
            t0 = time.perf_counter()
            n = force(fn(spark, args.sf_dir))
            walls.append(round(time.perf_counter() - t0, 3))
            j1 = _njobs()
            jobs.append(j1 - j0 if (j0 >= 0 and j1 >= 0) else -1)
            spark.sparkContext.setJobDescription(None)
        print(f"{name}: walls={walls} min={min(walls)} jobs={jobs} rows={n} loadavg={os.getloadavg()[0]:.2f}")
        if args.gc:
            import gc

            gc.collect()
            spark._jvm.System.gc()
    spark.stop()


if __name__ == "__main__":
    main()
