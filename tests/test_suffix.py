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


def test_shared_build_composition(spark):
    """r11 refactor (r10 verdict Next #2): `sa_adjacent_pairs` and
    `max_repeat_per_doc` take PREBUILT frames, so a composed pipeline
    pays one suffix_ranks build for both outputs. Pins (a) the pairs
    against an independent brute-force adjacent-LCP scan and (b) the
    per-doc max repeat against a quadratic substring search — from ONE
    shared ranks frame."""
    from pyspark.sql import functions as F

    from geo_db_spark.operators.suffix import (
        max_repeat_per_doc,
        sa_adjacent_pairs,
    )

    rng = random.Random(7)
    slice_len, min_len = 24, 3
    raw = [
        (i, "".join(rng.choice("abc") for _ in range(rng.randint(4, 30))))
        for i in range(1, 11)
    ] + [(11, "xyzxyzxyz"), (12, "qqqqqqq")]
    df = spark.createDataFrame(raw, "doc_id long, text string")
    docs = df.select(
        "doc_id", F.substring("text", 1, slice_len).alias("t")
    )
    ranks = suffix_ranks(
        df, slice_len=slice_len, k0=2, min_tail=min_len
    )
    pairs_df = sa_adjacent_pairs(docs, ranks, min_len)
    repeat_df = max_repeat_per_doc(docs, pairs_df, min_len, slice_len)

    # brute force: sort all suffixes, keep adjacent pairs sharing
    # >= min_len chars; per-doc max repeat = max LCP over its pairs
    sufs = []
    for doc_id, text in raw:
        t = text[:slice_len]
        for pos in range(1, len(t) - min_len + 2):
            sufs.append((t[pos - 1 :], doc_id, pos))
    sufs.sort()
    want_pairs, want_rep = set(), {}
    for (sa, da, pa), (sb, db, pb) in zip(sufs, sufs[1:]):
        if sa[:min_len] == sb[:min_len]:
            want_pairs.add((da, pa, db, pb, sa[:min_len]))
            lcp = 0
            while lcp < min(len(sa), len(sb)) and sa[lcp] == sb[lcp]:
                lcp += 1
            for d in (da, db):
                want_rep[d] = max(want_rep.get(d, 0), lcp)

    got_pairs = {
        (r.doc_a, r.pos_a, r.doc_b, r.pos_b, r.gram)
        for r in pairs_df.collect()
    }
    assert got_pairs == want_pairs
    got_rep = {r.doc_id: r.max_repeat_len for r in repeat_df.collect()}
    assert got_rep == want_rep


def test_excise_substring_dups_matches_brute_force(spark):
    """Excision pinned against an independent Python replay: brute
    suffix sort -> adjacent pairs sharing >= min_len chars -> LCP ->
    loser ((doc,pos)-greater) intervals -> interval union -> rebuild.
    Also pins the free invariant n_chars - n_excised == kept_len and
    that the (doc,pos)-minimum occurrence of each duplicated substring
    is never excised (keep-first semantics)."""
    from pyspark.sql import functions as F

    from geo_db_spark.operators.suffix import (
        excise_substring_dups,
        sa_adjacent_pairs,
        sa_pair_lcp,
        suffix_ranks,
    )

    rng = random.Random(13)
    slice_len, min_len = 24, 3
    raw = [
        (i, "".join(rng.choice("abc") for _ in range(rng.randint(4, 30))))
        for i in range(1, 11)
    ] + [(11, "xyzqxyzq"), (12, "hello hello"), (13, "zz")]
    df = spark.createDataFrame(raw, "doc_id long, text string")
    docs = df.select("doc_id", F.substring("text", 1, slice_len).alias("t"))
    ranks = suffix_ranks(df, slice_len=slice_len, k0=2, min_tail=min_len)
    pairs = sa_adjacent_pairs(docs, ranks, min_len)
    lcp = sa_pair_lcp(docs, pairs, min_len, slice_len)
    got = {
        r.doc_id: (r.n_chars, r.n_excised, r.kept_len, r.kept_text)
        for r in excise_substring_dups(docs, lcp).collect()
    }

    # independent replay
    sufs = []
    for doc_id, text in raw:
        t = text[:slice_len]
        for pos in range(1, len(t) - min_len + 2):
            sufs.append((t[pos - 1 :], doc_id, pos))
    sufs.sort()
    intervals: dict[int, list[tuple[int, int]]] = {}
    for (sa, da, pa), (sb, db, pb) in zip(sufs, sufs[1:]):
        if sa[:min_len] != sb[:min_len]:
            continue
        k = 0
        while k < min(len(sa), len(sb)) and sa[k] == sb[k]:
            k += 1
        d, p = max(((da, pa), (db, pb)))
        intervals.setdefault(d, []).append((p, p + k))
    for doc_id, text in raw:
        t = text[:slice_len]
        ivs = sorted(intervals.get(doc_id, []))
        merged: list[list[int]] = []
        for s, e in ivs:
            if merged and s <= merged[-1][1]:
                merged[-1][1] = max(merged[-1][1], e)
            else:
                merged.append([s, e])
        kept, cur = [], 1
        for s, e in merged:
            kept.append(t[cur - 1 : s - 1])
            cur = e
        kept.append(t[cur - 1 :])
        kt = "".join(kept)
        nex = sum(e - s for s, e in merged)
        assert got[doc_id] == (len(t), nex, len(kt), kt), doc_id
        assert got[doc_id][0] - got[doc_id][1] == got[doc_id][2]
