"""Distributed suffix array (operators/suffix.py, prefix doubling):
rank order pinned against an independent brute-force Python suffix
sort, doubling-boundary cases (suffixes separating only in the last
round), the descending-sequence guard, and tie handling."""

from __future__ import annotations

import random

from geo_db_spark.operators.suffix import suffix_ranks


def _brute(docs, slice_len, min_tail=1):
    """Independent oracle: materialize every suffix string and sort.
    min_tail filters the OUTPUT after the sort — the order between two
    kept suffixes can hinge on tails shorter than min_tail (the r10
    domain-filter bug the sf0.01 value oracle caught)."""
    sufs = []
    for doc_id, text in docs:
        t = text[:slice_len]
        for pos in range(1, len(t) + 1):
            sufs.append((t[pos - 1 :], doc_id, pos))
    sufs.sort()
    kept = [(d, p) for (suff, d, p) in sufs if len(suff) >= min_tail]
    return {(d, p): i + 1 for i, (d, p) in enumerate(kept)}


def _check(spark, docs, slice_len, k0, min_tail=1):
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        (r.doc_id, r.pos): r.sa_rank
        for r in suffix_ranks(
            df, slice_len=slice_len, k0=k0, min_tail=min_tail
        ).collect()
    }
    assert got == _brute(docs, slice_len, min_tail)


def test_suffix_ranks_match_brute_force(spark):
    docs = [
        (1, "banana"),
        (2, "bananas are bananas"),
        (3, "an"),
        (4, "a"),
        (5, "nabanaba"),
    ]
    _check(spark, docs, slice_len=32, k0=2)


def test_suffix_ranks_separate_in_last_round(spark):
    """Two suffixes equal through 2*k0-1 chars force the second
    doubling round to do the separation; a third pair stays fully
    equal to the slice end and must tie-break (doc_id, pos)."""
    base = "x" * 15
    docs = [
        (1, base + "a" + "q"),
        (2, base + "b"),
        (3, base),  # proper prefix of both
        (4, base),  # exact tie with doc 3's suffixes
    ]
    _check(spark, docs, slice_len=64, k0=4)


def test_suffix_ranks_random_fuzz(spark):
    rng = random.Random(42)
    docs = [
        (
            i,
            "".join(rng.choice("ab ") for _ in range(rng.randint(1, 40))),
        )
        for i in range(1, 13)
    ]
    _check(spark, docs, slice_len=24, k0=2)
    _check(spark, docs, slice_len=24, k0=16)  # k0 >= most doc lengths


def test_suffix_ranks_min_tail_order_decided_by_short_tail(spark):
    """Regression (r10, caught by the sf0.01 value oracle): the kept
    suffixes 'aac' and 'aab' agree through k0=2 chars and are ordered
    by their 1-char tails — positions BELOW min_tail=3 that a
    domain-filtered doubling would not rank, collapsing the comparison
    to the (doc_id, pos) tiebreak and ranking 'aac' first."""
    docs = [(1, "aac"), (2, "aab")]
    _check(spark, docs, slice_len=8, k0=2, min_tail=3)


def test_suffix_ranks_min_tail_and_short_docs(spark):
    """min_tail drops positions with fewer remaining chars; docs
    shorter than min_tail vanish entirely (the sequence() guard —
    without it Spark generates a DESCENDING range)."""
    docs = [(1, "abcdef"), (2, "ab"), (3, "a")]
    _check(spark, docs, slice_len=8, k0=4, min_tail=3)
