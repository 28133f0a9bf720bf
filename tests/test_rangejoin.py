"""Unit tests for bucketed_range_join (operators/rangejoin.py)."""

from __future__ import annotations

import datetime as dt

import pytest

from geo_db_spark.operators.rangejoin import bucketed_range_join

BASE = dt.datetime(2024, 1, 1)


def _mk(spark, rows, cols):
    return spark.createDataFrame(rows, cols)


def _naive(left, right, lo, hi):
    out = set()
    for lid, lk, lt in left:
        for rid, rk, rt in right:
            if lk == rk and lo <= (rt - lt).total_seconds() <= hi:
                out.add((lid, rid))
    return out


@pytest.mark.parametrize("bucket_s", [None, 10.0, 3600.0])
def test_matches_naive_semantics(spark, bucket_s):
    left = [(i, i % 3, BASE + dt.timedelta(seconds=37 * i)) for i in range(40)]
    right = [(100 + i, i % 3, BASE + dt.timedelta(seconds=29 * i)) for i in range(40)]
    ldf = _mk(spark, [(a, b, c) for a, b, c in left], ["lid", "k", "lts"])
    rdf = _mk(spark, [(a, b, c) for a, b, c in right], ["rid", "k", "rts"])
    got = bucketed_range_join(
        ldf, rdf, key="k", left_ts="lts", right_ts="rts",
        lower_s=-120.0, upper_s=60.0, bucket_s=bucket_s,
    )
    pairs = {(r["lid"], r["rid"]) for r in got.collect()}
    assert pairs == _naive(left, right, -120.0, 60.0)
    # each match appears exactly once even when a probe row spans buckets
    assert got.count() == len(pairs)


def test_self_correlation_distinct_sides(spark):
    # both sides from the SAME dataframe: alias disambiguation must hold
    rows = [(i, 1, BASE + dt.timedelta(seconds=30 * i)) for i in range(10)]
    df = _mk(spark, rows, ["eid", "k", "ts"])
    left = df.selectExpr("eid AS lid", "k", "ts AS lts")
    right = df.selectExpr("eid AS rid", "k", "ts AS rts")
    got = bucketed_range_join(
        left, right, key="k", left_ts="lts", right_ts="rts",
        lower_s=-60.0, upper_s=-1.0,
    )
    pairs = {(r["lid"], r["rid"]) for r in got.collect()}
    want = _naive(
        [(i, 1, t) for i, _, t in rows], [(i, 1, t) for i, _, t in rows], -60.0, -1.0
    )
    assert pairs == want and len(pairs) > 0


def test_left_join_keeps_unmatched_once(spark):
    left = [(i, i % 3, BASE + dt.timedelta(seconds=37 * i)) for i in range(40)]
    # right only covers key 0 -> keys 1/2 rows must survive with NULLs
    right = [(100 + i, 0, BASE + dt.timedelta(seconds=29 * i)) for i in range(40)]
    ldf = _mk(spark, left, ["lid", "k", "lts"])
    rdf = _mk(spark, right, ["rid", "k", "rts"])
    got = bucketed_range_join(
        ldf, rdf, key="k", left_ts="lts", right_ts="rts",
        lower_s=-120.0, upper_s=60.0, how="left",
    ).collect()
    want_pairs = _naive(left, right, -120.0, 60.0)
    got_pairs = {(r["lid"], r["rid"]) for r in got if r["rid"] is not None}
    assert got_pairs == want_pairs
    matched_lids = {a for a, _ in want_pairs}
    # every unmatched left row appears exactly once, rid/rts NULL
    unmatched = [r for r in got if r["rid"] is None]
    assert {r["lid"] for r in unmatched} == {i for i, _, _ in left} - matched_lids
    assert len(unmatched) == len({r["lid"] for r in unmatched})
    assert all(r["rts"] is None for r in unmatched)
    # no left row lost
    assert {r["lid"] for r in got} == {i for i, _, _ in left}


def test_left_join_duplicate_left_rows_preserved(spark):
    rows = [(1, 0, BASE), (1, 0, BASE)]  # exact duplicates, no match
    ldf = _mk(spark, rows, ["lid", "k", "lts"])
    rdf = _mk(spark, [(9, 5, BASE)], ["rid", "k", "rts"])
    got = bucketed_range_join(
        ldf, rdf, key="k", left_ts="lts", right_ts="rts",
        lower_s=-1.0, upper_s=1.0, how="left",
    ).collect()
    assert len(got) == 2 and all(r["rid"] is None for r in got)


def test_shared_nonkey_columns_rejected(spark):
    ldf = _mk(spark, [(1, 0, BASE)], ["lid", "k", "ts"])
    rdf = _mk(spark, [(9, 0, BASE)], ["rid", "k", "ts"])
    with pytest.raises(ValueError, match="share non-key column"):
        bucketed_range_join(ldf, rdf, key="k")


def test_unknown_how_rejected(spark):
    ldf = _mk(spark, [(1, 0, BASE)], ["lid", "k", "lts"])
    rdf = _mk(spark, [(9, 0, BASE)], ["rid", "k", "rts"])
    with pytest.raises(ValueError, match="unsupported how"):
        bucketed_range_join(ldf, rdf, key="k", left_ts="lts", right_ts="rts", how="full")
