"""Ablation for the PPJoin indexing prefix (r6 verdict #4).

Finding (r7): the r6 per-candidate-pair FILTER form was provably
subsumed by the positional filter — the indexed side is the smaller set
|s| <= |l|, and the positional bound pos_s <= |s| - alpha + 1 with
alpha = ceil(t/(1+t)(|s|+|l|)) is always at least as strict as the
indexing bound |s| - ceil(2t/(1+t)|s|) + 1 (equality only at
|s| = |l|). The zero cut measured in r5/r6 was mathematics, not a
corpus property. The operator now applies the indexing prefix
STRUCTURALLY: the index side of the prefix self-join explodes only the
short prefix, shrinking the join's input before any pair is formed —
that is what this script measures (index-side rows, join-output
candidate rows pre-distinct, wall), with/without, on the documents
corpus the bench uses.

Usage: python scripts/ablate_prefix_filter.py [sf_dir]
Prints one JSON line; numbers go to SCALE.md.
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")


def main():
    from pyspark.sql import functions as F

    from geo_db_spark.io import load
    from geo_db_spark.operators.dedup import shingles
    from geo_db_spark.operators.simjoin import set_similarity_join
    from geo_db_spark.session import get_spark, tune

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark()
    tune(spark)
    docs = load(spark, sf_dir, "documents")
    num, den = 1, 2

    # prefix-row accounting, same arithmetic as the operator
    sh = docs.select(
        F.col("doc_id").alias("id"),
        F.explode(shingles(F.col("text"), 3)).alias("token"),
    )
    n = sh.groupBy("id").agg(F.count(F.lit(1)).alias("n"))
    plen = F.expr(f"n - ((n * {num} + {den} - 1) div {den}) + 1")
    idxlen = F.expr(
        f"n - ((2 * {num} * n + {num} + {den} - 1) div ({num} + {den})) + 1"
    )
    row = n.agg(
        F.sum(plen).alias("probe_rows"), F.sum(idxlen).alias("index_rows")
    ).collect()[0]
    out = {
        "sf_dir": sf_dir,
        "probe_prefix_rows": row["probe_rows"],
        "index_prefix_rows": row["index_rows"],
        "index_row_cut_pct": round(
            100.0 * (1 - row["index_rows"] / row["probe_rows"]), 1
        ),
    }
    # warm the shared shingle cache + codegen once so neither arm pays
    # the one-time cost (min-of-2 per arm, bench.py methodology)
    set_similarity_join(docs, num, den).count()
    for flag in (True, False):
        key = "with_indexing_prefix" if flag else "without"
        cand = set_similarity_join(
            docs, num, den, use_indexing_prefix=flag, _return_candidates=True
        ).count()
        walls = []
        for _ in range(2):
            t0 = time.perf_counter()
            res = set_similarity_join(docs, num, den, use_indexing_prefix=flag).count()
            walls.append(round(time.perf_counter() - t0, 2))
        out[key] = {
            "candidate_pairs": cand,
            "result_pairs": res,
            "wall_s": min(walls),
            "walls": walls,
        }
    assert out["with_indexing_prefix"]["result_pairs"] == out["without"]["result_pairs"]
    print(json.dumps(out))


if __name__ == "__main__":
    main()
