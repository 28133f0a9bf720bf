#!/usr/bin/env python
"""Stage-level breakdown of the suffix-array family at sf0.1
(optimization-round tooling): time each materialization boundary of
suffix_ranks -> sa_adjacent_pairs -> sa_pair_lcp -> excision separately.
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from geo_db_spark.io import load
    from geo_db_spark.operators.suffix import (
        excise_substring_dups,
        sa_adjacent_pairs,
        sa_pair_lcp,
        suffix_ranks,
    )
    from geo_db_spark.session import get_spark

    spark = get_spark("profile_suffix")
    sc = spark.sparkContext

    docs = load(spark, sf_dir, "documents").select(
        "doc_id", F.substring("text", 1, 256).alias("t")
    )
    docs.count()  # warm scan

    marks = [("start", time.perf_counter())]

    def mark(label):
        marks.append((label, time.perf_counter()))
        a, b = marks[-2], marks[-1]
        print(f"  {a[0]} -> {label}: {b[1]-a[1]:.2f}s", flush=True)

    sc.setJobDescription("suffix_ranks")
    sa = suffix_ranks(docs, id_col="doc_id", text_col="t", slice_len=256, k0=64, min_tail=32)
    mark("suffix_ranks lazy built (internal actions done)")
    n = sa.count()
    mark(f"sa materialize count={n}")

    sc.setJobDescription("sa_adjacent_pairs")
    pairs = sa_adjacent_pairs(docs, sa, 32)
    mark("pairs lazy built (internal checkpoint done)")
    np_ = pairs.count()
    mark(f"pairs count={np_}")

    sc.setJobDescription("sa_pair_lcp")
    lcp = sa_pair_lcp(docs, pairs, 32, 256)
    n3 = lcp.count()
    mark(f"lcp count={n3}")

    sc.setJobDescription("excise")
    out = excise_substring_dups(docs, lcp)
    row = out.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.xxhash64(*[F.col(c) for c in out.columns])).alias("chk"),
    ).collect()[0]
    mark(f"excise force n={row['n']}")

    total = marks[-1][1] - marks[0][1]
    print(f"total {total:.2f}s")
    spark.stop()


if __name__ == "__main__":
    main()
