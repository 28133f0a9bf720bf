"""Production-scale BPE saturation demo (r9 verdict "What's missing"
#3): run bpe_train_merges to >= 256 merges with batch_m ~ 32 on the
sf0.1 documents vocabulary and report where the conservative
disjoint-selection rule saturates — greedy pairwise-disjoint candidate
sets shrink as the merged vocabulary densifies, so merges-per-round is
the number that decides whether a ~30k-merge production vocabulary is
~1k rounds or ~10k rounds.

Usage: python scripts/bench_bpe_scale.py [sf_dir] [target_merges] [batch_m]
   or: python scripts/bench_bpe_scale.py synth:<n_words> [target] [batch_m]

The sf documents corpus has a deliberately tiny lexicon (31 distinct
[a-z]+ words), which FULLY FUSES after ~89 merges — fine for proving
exhaustion behavior, useless for production shape. synth:<n> builds a
deterministic Zipf-weighted syllable vocabulary of n distinct words
(the shape of a real tokenizer-training word table) so the
disjoint-selection fill rate can be measured at 256+ merges.
Prints one JSON line; the per-round fill curve goes into SCALE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    target = int(sys.argv[2]) if len(sys.argv) > 2 else 256
    batch_m = int(sys.argv[3]) if len(sys.argv) > 3 else 32
    cand_k = int(sys.argv[4]) if len(sys.argv) > 4 else 4 * batch_m

    from pyspark.sql import functions as F

    from geo_db_spark.io import load
    from geo_db_spark.operators.text import bpe_train_merges
    from geo_db_spark.session import get_spark

    spark = get_spark()
    if sf_dir.startswith("synth:"):
        vocab = _synth_vocab(spark, int(sf_dir.split(":", 1)[1]))
    else:
        docs = load(spark, sf_dir, "documents")
        vocab = (
            docs.select(
                F.explode(
                    F.regexp_extract_all(
                        F.lower(F.col("text")), F.lit("[a-z]+"), 0
                    )
                ).alias("word")
            )
            .groupBy("word")
            .agg(F.count(F.lit(1)).alias("n"))
        )
    n_words = vocab.count()
    round_log: list[tuple[int, int]] = []
    t0 = time.time()
    merges = bpe_train_merges(
        vocab,
        rounds=target,  # worst case one merge per round; max_merges stops early
        batch_m=batch_m,
        cand_k=cand_k,
        round_log=round_log,
        max_merges=target,
    )
    wall = time.time() - t0

    per_round = [c for c, _ in round_log]
    fill = [c / batch_m for c in per_round]
    out = {
        "metric": "bpe_saturation",
        "sf_dir": sf_dir,
        "vocab_words": n_words,
        "batch_m": batch_m,
        "cand_k": cand_k,
        "target_merges": target,
        "achieved_merges": len(merges),
        "rounds": len(round_log),
        "merges_per_round": per_round,
        "mean_fill": round(sum(fill) / len(fill), 3) if fill else 0,
        "min_fill": round(min(fill), 3) if fill else 0,
        "wall_sec": round(wall, 2),
        "sec_per_merge": round(wall / max(1, len(merges)), 3),
    }
    print(json.dumps(out))


def _synth_vocab(spark, n_words: int):
    """Deterministic Zipf-weighted syllable vocabulary: word i is 2-5
    syllables drawn from a 64-syllable inventory by a splitmix-style
    integer hash, count ~ n_words/rank. English-like repeated-substring
    structure (shared syllables are what BPE merges), no RNG state."""
    from pyspark.sql import functions as F

    ons = ["b", "d", "f", "g", "k", "l", "m", "n", "p", "r", "s", "t"]
    nuc = ["a", "e", "i", "o", "u"]
    cod = ["", "n", "s", "r", "t"]
    syl = [o + v + c for o in ons for v in nuc for c in cod][:64]
    syl_arr = F.array(*[F.lit(s) for s in syl])
    ids = spark.range(n_words)
    h = F.xxhash64(F.col("id"))
    nsyl = (F.pmod(h, F.lit(4)) + 2).cast("int")
    parts = F.transform(
        F.sequence(F.lit(0), nsyl - 1),
        lambda j: F.element_at(
            syl_arr, (F.pmod(F.xxhash64(F.col("id"), j), F.lit(64)) + 1).cast("int")
        ),
    )
    return (
        ids.select(
            F.array_join(parts, "").alias("word"),
            (F.lit(n_words) / (F.col("id") + 1)).cast("long").alias("n"),
        )
        .filter(F.col("n") >= 1)
        .groupBy("word")
        .agg(F.sum("n").alias("n"))
    )


if __name__ == "__main__":
    main()
