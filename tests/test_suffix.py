"""Distributed suffix array (operators/suffix.py, prefix doubling):
rank order pinned against an independent brute-force Python suffix
sort, doubling-boundary cases (suffixes separating only in the last
round), the descending-sequence guard, and tie handling."""

from __future__ import annotations

import pytest

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
    """Pin BOTH build paths against the brute force: the r13 direct
    single-pass sort (slice_len <= direct_max, the default for the
    declared 256-char-slice queries) and the prefix-doubling loop
    (forced via direct_max=0 — the path long slices use)."""
    df = spark.createDataFrame(docs, "doc_id long, text string")
    expected = _brute(docs, slice_len, min_tail)
    for direct_max in (1024, 0):
        got = {
            (r.doc_id, r.pos): r.sa_rank
            for r in suffix_ranks(
                df, slice_len=slice_len, k0=k0, min_tail=min_tail,
                direct_max=direct_max,
            ).collect()
        }
        assert got == expected, f"direct_max={direct_max}"


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


@pytest.mark.slow
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
    # >= min_len chars; per-doc max repeat = max LCP over its pairs.
    # rank_lo (r12) = the 1-based SA index of the pair's lower suffix.
    sufs = []
    for doc_id, text in raw:
        t = text[:slice_len]
        for pos in range(1, len(t) - min_len + 2):
            sufs.append((t[pos - 1 :], doc_id, pos))
    sufs.sort()
    want_pairs, want_rep = set(), {}
    for i, ((sa, da, pa), (sb, db, pb)) in enumerate(zip(sufs, sufs[1:])):
        if sa[:min_len] == sb[:min_len]:
            want_pairs.add((i + 1, da, pa, db, pb, sa[:min_len]))
            lcp = 0
            while lcp < min(len(sa), len(sb)) and sa[lcp] == sb[lcp]:
                lcp += 1
            for d in (da, db):
                want_rep[d] = max(want_rep.get(d, 0), lcp)

    got_pairs = {
        (r.rank_lo, r.doc_a, r.pos_a, r.doc_b, r.pos_b, r.gram)
        for r in pairs_df.collect()
    }
    assert got_pairs == want_pairs
    got_rep = {r.doc_id: r.max_repeat_len for r in repeat_df.collect()}
    assert got_rep == want_rep


def _excision_replay(raw, slice_len, min_len):
    """Independent Python replay of the r12 RUN-BASED excision rule:
    brute suffix sort -> maximal runs of adjacent pairs sharing
    >= min_len chars -> per run, every member except the
    (doc,pos)-minimum marks [pos, pos + max-adjacent-LCP) -> union.
    Returns (intervals per doc (merged), kept text per doc)."""
    sufs = []
    for doc_id, text in raw:
        t = text[:slice_len]
        for pos in range(1, len(t) - min_len + 2):
            sufs.append((t[pos - 1 :], doc_id, pos))
    sufs.sort()
    # adjacent qualifying pairs as (index, lcp)
    plist = []
    for i, ((sa, _, _), (sb, _, _)) in enumerate(zip(sufs, sufs[1:])):
        if sa[:min_len] != sb[:min_len]:
            continue
        k = 0
        while k < min(len(sa), len(sb)) and sa[k] == sb[k]:
            k += 1
        plist.append((i, k))
    intervals: dict[int, list[tuple[int, int]]] = {}
    run: list[tuple[int, int]] = []

    def flush(run):
        if not run:
            return
        members: dict[int, int] = {}  # suffix index -> max adjacent lcp
        for i, k in run:
            for idx in (i, i + 1):
                members[idx] = max(members.get(idx, 0), k)
        mn = min((sufs[idx][1], sufs[idx][2]) for idx in members)
        for idx, x in members.items():
            d, p = sufs[idx][1], sufs[idx][2]
            if (d, p) != mn:
                intervals.setdefault(d, []).append((p, p + x))

    for i, k in plist:
        if run and i != run[-1][0] + 1:
            flush(run)
            run = []
        run.append((i, k))
    flush(run)

    merged_ivs, kept_texts = {}, {}
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
        merged_ivs[doc_id] = [(s, e) for s, e in merged]
        kept_texts[doc_id] = "".join(kept)
    return merged_ivs, kept_texts


def _run_excision(spark, raw, slice_len, min_len):
    from pyspark.sql import functions as F

    from geo_db_spark.operators.suffix import (
        excise_substring_dups,
        sa_adjacent_pairs,
        sa_pair_lcp,
        suffix_ranks,
    )

    df = spark.createDataFrame(raw, "doc_id long, text string")
    docs = df.select("doc_id", F.substring("text", 1, slice_len).alias("t"))
    ranks = suffix_ranks(df, slice_len=slice_len, k0=2, min_tail=min_len)
    pairs = sa_adjacent_pairs(docs, ranks, min_len)
    lcp = sa_pair_lcp(docs, pairs, min_len, slice_len)
    return lcp, {
        r.doc_id: (r.n_chars, r.n_excised, r.kept_len, r.kept_text)
        for r in excise_substring_dups(docs, lcp).collect()
    }


def test_excise_substring_dups_matches_brute_force(spark):
    """Excision pinned against an independent Python replay of the
    run-based rule (r12): brute suffix sort -> maximal qualifying runs
    -> all-but-run-minimum intervals -> union -> rebuild. Also pins the
    free invariant n_chars - n_excised == kept_len."""
    rng = random.Random(13)
    slice_len, min_len = 24, 3
    raw = [
        (i, "".join(rng.choice("abc") for _ in range(rng.randint(4, 30))))
        for i in range(1, 11)
    ] + [(11, "xyzqxyzq"), (12, "hello hello"), (13, "zz")]
    _, got = _run_excision(spark, raw, slice_len, min_len)
    _, kept_texts = _excision_replay(raw, slice_len, min_len)
    for doc_id, text in raw:
        t = text[:slice_len]
        kt = kept_texts[doc_id]
        assert got[doc_id] == (len(t), len(t) - len(kt), len(kt), kt), doc_id
        assert got[doc_id][0] - got[doc_id][1] == got[doc_id][2]


def _assert_at_most_one_survivor(raw, slice_len, min_len, islands):
    """INDEPENDENT guarantee check (not a rule replay): enumerate every
    substring of length >= min_len occurring >= 2 times across the
    slices; an occurrence SURVIVES iff its span intersects no excised
    island of its doc; assert <= 1 survivor per duplicated substring."""
    slices = {d: t[:slice_len] for d, t in raw}
    occ: dict[str, list[tuple[int, int]]] = {}
    for d, t in slices.items():
        for L in range(min_len, len(t) + 1):
            for p in range(1, len(t) - L + 2):
                occ.setdefault(t[p - 1 : p - 1 + L], []).append((d, p))
    checked = 0
    for s, os_ in occ.items():
        if len(os_) < 2:
            continue
        L = len(s)
        survivors = [
            (d, p)
            for d, p in os_
            if not any(
                st < p + L and p < en for st, en in islands.get(d, [])
            )
        ]
        assert len(survivors) <= 1, (s, survivors)
        checked += 1
    assert checked > 0  # fixture actually contained duplicated substrings


def test_excision_keep_one_on_non_monotone_run(spark):
    """The r11 verdict counterexample: docs (1,'abcA'), (9,'abcM'),
    (5,'abcZ') form an SA run whose (doc,pos) order 1,9,5 is
    non-monotone — the r11 per-pair greedy marked only doc 9, leaving
    'abc' duplicated in docs 1 AND 5. The run-based rule keeps only the
    run minimum: at most one kept text still contains 'abc'."""
    from geo_db_spark.operators.suffix import excision_intervals

    raw = [(1, "abcA"), (9, "abcM"), (5, "abcZ")]
    lcp, got = _run_excision(spark, raw, slice_len=8, min_len=3)
    keepers = [d for d, (_, _, _, kt) in got.items() if "abc" in kt]
    assert keepers == [1]
    assert got[9][3] == "M" and got[5][3] == "Z"
    islands = {}
    for r in excision_intervals(lcp).collect():
        islands.setdefault(r.doc_id, []).append((r.s, r.e))
    _assert_at_most_one_survivor(raw, 8, 3, islands)


def test_excision_at_most_one_survivor_fuzz(spark):
    """Guarantee fuzz (independent of the rule): random docs with
    planted shared grams in shuffled doc order (non-monotone runs of
    depth > 2, the class the r11 advice counterexample
    (5,1),(2,1),(7,1),(1,1) sits in) — EVERY substring of length >=
    min_len duplicated anywhere in the corpus must survive excision in
    at most ONE occurrence."""
    from geo_db_spark.operators.suffix import excision_intervals

    rng = random.Random(99)
    slice_len, min_len = 24, 3
    shared = ["abc", "xyzw", "qqq"]
    raw = []
    for i in rng.sample(range(1, 30), 12):
        body = "".join(rng.choice("abcxyz q") for _ in range(rng.randint(2, 14)))
        g = rng.choice(shared)
        cut = rng.randint(0, len(body))
        raw.append((i, body[:cut] + g + body[cut:]))
    lcp, got = _run_excision(spark, raw, slice_len, min_len)
    islands = {}
    for r in excision_intervals(lcp).collect():
        islands.setdefault(r.doc_id, []).append((r.s, r.e))
    _assert_at_most_one_survivor(raw, slice_len, min_len, islands)
    for d, (n, nex, kl, kt) in got.items():
        assert n - nex == kl and len(kt) == kl


def test_sa_pair_lcp_non_default_slice_len(spark):
    """The binary-search round count derives from the slice_len
    ARGUMENT (r11 verdict Next #6): at slice_len=1024 the search runs
    ceil(log2(1024))=10 rounds, so an LCP far beyond the default-256
    envelope is found exactly — a fixed 8-round unroll would truncate
    the search at the wrong boundary."""
    from pyspark.sql import functions as F

    from geo_db_spark.operators.suffix import (
        sa_adjacent_pairs,
        sa_pair_lcp,
        suffix_ranks,
    )

    slice_len, min_len = 1024, 32
    shared = ("abcdefgh" * 88)[:700]  # 700-char shared prefix
    raw = [(1, shared + "XX" + "p" * 40), (2, shared + "YY" + "q" * 40)]
    df = spark.createDataFrame(raw, "doc_id long, text string")
    docs = df.select("doc_id", F.substring("text", 1, slice_len).alias("t"))
    ranks = suffix_ranks(df, slice_len=slice_len, k0=16, min_tail=min_len)
    pairs = sa_adjacent_pairs(docs, ranks, min_len)
    lcp = sa_pair_lcp(docs, pairs, min_len, slice_len)
    got = {
        (r.doc_a, r.pos_a, r.doc_b, r.pos_b): r.lcp for r in lcp.collect()
    }
    # brute-force expectation over the same pair set
    texts = dict(raw)
    for (da, pa, db, pb), v in got.items():
        sa_, sb_ = texts[da][pa - 1 :], texts[db][pb - 1 :]
        k = 0
        while (
            k < min(len(sa_), len(sb_), slice_len) and sa_[k] == sb_[k]
        ):
            k += 1
        assert v == k, (da, pa, db, pb, v, k)
    # the headline pair: position-1 suffixes share exactly 700 chars
    assert got[(1, 1, 2, 1)] == 700


def test_substring_dup_losers_no_surviving_shared_substring(spark):
    """Doc-level guarantee (independent, not a replay): after dropping
    `substring_dup_losers`, NO TWO SURVIVING docs share any substring
    of length >= min_len within the slice domain. Includes the r11
    advice counterexample shape — an SA run with doc order [3,5,1],
    where the per-pair greedy dropped only doc 5 and kept docs 3 and 1
    both holding the shared gram."""
    from pyspark.sql import functions as F

    from geo_db_spark.operators.suffix import (
        sa_adjacent_pairs,
        substring_dup_losers,
        suffix_ranks,
    )

    slice_len, min_len = 24, 3
    crafted = [(3, "abcA"), (5, "abcB"), (1, "abcC")]
    rng = random.Random(7)
    fuzz = [
        (i, "".join(rng.choice("abx") for _ in range(rng.randint(3, 16))))
        for i in range(10, 22)
    ]
    for raw in (crafted, crafted + fuzz):
        df = spark.createDataFrame(raw, "doc_id long, text string")
        docs = df.select(
            "doc_id", F.substring("text", 1, slice_len).alias("t")
        )
        ranks = suffix_ranks(
            df, slice_len=slice_len, k0=2, min_tail=min_len
        )
        losers = {
            r.doc_id
            for r in substring_dup_losers(
                sa_adjacent_pairs(docs, ranks, min_len)
            ).collect()
        }
        surv = {d: t[:slice_len] for d, t in raw if d not in losers}
        grams = {}
        for d, t in surv.items():
            for L in range(min_len, len(t) + 1):
                for p in range(len(t) - L + 1):
                    grams.setdefault(t[p : p + L], set()).add(d)
        assert all(len(ds) == 1 for ds in grams.values()), {
            g: ds for g, ds in grams.items() if len(ds) > 1
        }
    # the crafted run keeps exactly its minimum doc
    assert losers >= {3, 5} and 1 not in losers
