#!/usr/bin/env python
"""Per-phase walls of the CURRENT suffix_ranks at sf0.1, cold + warm,
for a given k0 (argv[1], default 64).
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from geo_db_spark.operators.suffix import _dense_rank_by  # noqa: E402
from geo_db_spark.operators.ids import assign_stable_ids  # noqa: E402


def build(docs, log, k0):
    t0 = time.perf_counter()

    def mark(label):
        nonlocal t0
        t1 = time.perf_counter()
        log.append((label, round(t1 - t0, 2)))
        t0 = t1

    slice_len, min_tail = 256, 32
    sliced = docs.filter(F.length("t") >= 1)
    suf = sliced.select(
        "doc_id",
        F.explode(F.sequence(F.lit(1), F.length("t"))).alias("pos"),
        "t",
    ).select("doc_id", "pos", F.expr(f"substring(t, pos, {k0})").alias("k"))
    suf, n_keys = _dense_rank_by(suf, ["k"])
    mark("round0 dense_rank lazy (keys ckpt + ids ckpt + collect)")
    suf = suf.localCheckpoint(eager=True)
    mark("round0 suf checkpoint")
    n_suffixes = suf.count()
    mark(f"count n={n_suffixes} (n_keys0={n_keys})")
    c = k0
    rnd = 0
    while c < slice_len:
        if n_keys == n_suffixes:
            mark(f"early exit after round {rnd}")
            break
        contrib = suf.select(
            "doc_id",
            F.explode(
                F.array(
                    *[
                        F.struct(
                            (F.col("pos") - F.lit(j * c)).alias("p"),
                            F.lit(j).alias("j"),
                            F.col("rank").alias("r"),
                        )
                        for j in range(4)
                    ]
                )
            ).alias("e"),
        ).select(
            "doc_id", F.col("e.p").alias("pos"), F.col("e.j").alias("j"),
            F.col("e.r").alias("r"),
        ).filter(F.col("pos") >= 1)
        keyed = contrib.groupBy("doc_id", "pos").agg(
            F.max(F.when(F.col("j") == 0, F.col("r"))).alias("r0"),
            *[
                F.coalesce(
                    F.max(F.when(F.col("j") == jj, F.col("r"))), F.lit(0)
                ).alias(f"r{jj}")
                for jj in (1, 2, 3)
            ],
        )
        suf, n_keys = _dense_rank_by(keyed, ["r0", "r1", "r2", "r3"])
        mark(f"round{rnd+1} dense_rank lazy")
        suf = suf.localCheckpoint(eager=True)
        mark(f"round{rnd+1} suf checkpoint")
        c *= 4
        rnd += 1
    if min_tail > 1:
        lens = sliced.select(
            F.col("doc_id").alias("__ld"), F.length("t").alias("__n")
        )
        suf = (
            suf.join(lens, F.col("doc_id") == F.col("__ld"))
            .filter(F.col("pos") <= F.col("__n") - F.lit(min_tail - 1))
            .select("doc_id", "pos", "rank")
        )
    out = assign_stable_ids(
        suf, order_cols=["rank", "doc_id", "pos"], id_name="sa_rank"
    ).select("doc_id", "pos", "sa_rank")
    mark("final stable_ids")
    n = out.count()
    mark(f"final count n={n}")
    return out


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    k0 = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    from geo_db_spark.io import load
    from geo_db_spark.session import get_spark

    spark = get_spark("profile_suffix_internals")
    docs = load(spark, sf_dir, "documents").select(
        "doc_id", F.substring("text", 1, 256).alias("t")
    )
    docs.count()
    for attempt in ("cold", "warm"):
        log = []
        t0 = time.perf_counter()
        build(docs, log, k0)
        total = time.perf_counter() - t0
        print(f"--- k0={k0} {attempt}: total {total:.2f}s loadavg={os.getloadavg()[0]:.1f}")
        for label, sec in log:
            print(f"  {sec:7.2f}  {label}")
    spark.stop()


if __name__ == "__main__":
    main()
