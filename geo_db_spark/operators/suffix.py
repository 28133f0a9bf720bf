"""Distributed suffix-array construction by prefix doubling
(Manber & Myers, SIAM J. Comput. 1993; the distributed formulation
follows Flick & Aluru, SC'15) — the index behind EXACT substring
deduplication (Lee et al., ACL'22 "Deduplicating Training Data Makes
Language Models Better", which dedups exact substrings >= 50 tokens via
a corpus suffix array; the repo's winnowing operator is the sampled
approximation of the same signal).

Spark-first shape: a suffix is a (doc_id, pos) row, never a
materialized string. Round 0 ranks suffixes by their first ``k0``
characters; each doubling round re-keys suffix (d, p) by the pair
(rank[d, p], rank[d, p + L]) — missing second half (suffix shorter
than 2L) keys as 0, which sorts first, matching "abc" < "abcx" — and
re-ranks densely. After ceil(log4(slice_len / k0)) quadrupling rounds the rank
order equals full lexicographic suffix order; ties (identical
remaining text) are broken (doc_id, pos) for a deterministic total
order. Dense ranking is assign_stable_ids (operators/ids.py): a range
exchange + per-partition offsets, NO single-partition window — every
round is a constant number of linear shuffles, so the whole build is
O(log slice_len) linear passes. That is the 100 TB contract: corpus
chars in, log-many skinny (doc, pos, rank) shuffles, no stage that
holds a whole suffix string set.

No reference counterpart (SURVEY §2-H engine growth: the LLM-pipeline
dedup family).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from geo_db_spark.operators.ids import assign_stable_ids


def _dense_rank_by(suf: DataFrame, order_cols: list[str]) -> DataFrame:
    """Replace ``order_cols`` with a dense 1-based ``rank`` consistent
    with their lexicographic order: rank the DISTINCT key tuples with
    assign_stable_ids, then join back — two linear shuffles."""
    keys = suf.select(*order_cols).distinct()
    ranked = assign_stable_ids(keys, order_cols=order_cols, id_name="rank")
    return suf.join(ranked, order_cols).drop(*order_cols)


def suffix_ranks(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    slice_len: int = 256,
    k0: int = 16,
    min_tail: int = 1,
) -> DataFrame:
    """(doc_id, pos, sa_rank) for every suffix position of each
    document's leading ``slice_len``-char slice with at least
    ``min_tail`` characters remaining; ``sa_rank`` is the dense
    1-based position in the suffix array (lexicographic by remaining
    slice text, ties broken by (doc_id, pos)).

    ``slice_len`` bounds per-document work (the decode-family cap
    convention — declared query semantics, mirrored by oracles); the
    re-rank loop runs ceil(log4(slice_len/k0)) rounds (quadrupling —
    see the round comment) regardless of corpus size.

    ``min_tail`` filters the OUTPUT only — the doubling must rank over
    EVERY position, because two kept suffixes that agree through their
    leading characters are ordered by tails SHORTER than min_tail, and
    dropping those positions from the rank domain silently turns that
    comparison into a (doc_id, pos) tiebreak (caught by the sf0.01
    value oracle: 6 of 4405 SA-adjacent pairs differed; the pytest
    brute force had mirrored the filter and missed it)."""
    if k0 < 1 or slice_len < k0:
        raise ValueError(f"need 1 <= k0 <= slice_len, got {k0}/{slice_len}")
    sliced = docs.select(
        F.col(id_col).alias("doc_id"),
        F.substring(F.col(text_col), 1, slice_len).alias("t"),
    )
    # guard BEFORE sequence(): Spark's sequence(1, stop) with stop < 1
    # generates a DESCENDING sequence, not an empty one
    sliced = sliced.filter(F.length("t") >= 1)
    suf = sliced.select(
        "doc_id",
        F.explode(F.sequence(F.lit(1), F.length("t"))).alias("pos"),
        "t",
    ).select("doc_id", "pos", F.expr(f"substring(t, pos, {k0})").alias("k"))
    suf = _dense_rank_by(suf, ["k"]).localCheckpoint(eager=True)
    n_suffixes = suf.count()
    c = k0  # characters covered by the current rank
    while c < slice_len:
        # early exit: dense ranks mean max(rank) == #distinct keys; once
        # every suffix has its own rank, further rounds are identity —
        # on low-duplication text k0 chars already separate almost
        # everything (each probe is one cheap agg on the checkpointed
        # frame; on a replica-heavy corpus ties persist and the loop
        # runs its full depth)
        if suf.agg(F.max("rank")).collect()[0][0] == n_suffixes:
            break
        # QUADrupling, not doubling: the per-round cost here is Spark
        # job latency (a distributed sort per re-rank), not data volume
        # — so combine the ranks at pos, pos+c, pos+2c, pos+3c in ONE
        # round (coverage 4c, log4 rounds: slice 256 at k0=16 takes 2
        # rounds where doubling took 4). Each shifted lookup renames
        # every column so the checkpointed frame self-joins without
        # reference ambiguity (the ids.py/editjoin renaming rule).
        keyed = suf.select("doc_id", "pos", F.col("rank").alias("r0"))
        for j in (1, 2, 3):
            nxt = suf.select(
                F.col("doc_id").alias("__d"),
                (F.col("pos") - F.lit(j * c)).alias("__p"),
                F.col("rank").alias(f"__r{j}"),
            )
            keyed = keyed.join(
                nxt,
                (F.col("doc_id") == F.col("__d")) & (F.col("pos") == F.col("__p")),
                "left",
            ).select(
                "doc_id", "pos",
                *[F.col(f"r{i}") for i in range(j)],
                F.coalesce(F.col(f"__r{j}"), F.lit(0)).alias(f"r{j}"),
            )
        suf = _dense_rank_by(
            keyed, ["r0", "r1", "r2", "r3"]
        ).localCheckpoint(eager=True)
        c *= 4
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
    # checkpoint hygiene: assign_stable_ids materialized its own eager
    # checkpoint, so `out` no longer reads the per-round blocks — but
    # localCheckpoint storage is only reclaimed when the DRIVER GC
    # collects the RDD handles (ContextCleaner). Without the nudge,
    # back-to-back builds in one long-lived session accumulate every
    # round's blocks until eviction thrash (measured: an identical
    # second 10x build ran 132 -> 673 s). Drop our references and ask
    # both collectors politely; harmless when there is nothing to free.
    del suf
    import gc

    gc.collect()
    try:
        sc = docs.sparkSession.sparkContext
        sc._jvm.System.gc()  # type: ignore[union-attr]
    except Exception:
        pass
    return out
