"""Winnowing fingerprints (operators/dedup.py, Schleimer SIGMOD'03):
the coverage guarantee, border cases, the position-bits guard, and the
hot-gram cap."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from geo_db_spark.operators.dedup import winnow_fingerprints, winnow_match_pairs


def test_winnow_guarantee_shared_substring(spark):
    """Any duplicated substring of length >= w + k - 1 must contribute
    a shared SELECTED gram in every copy — selection depends only on
    the content-determined hash sequence."""
    shared = "the quick brown fox jumps over it"  # 33 >= 8 + 4 - 1
    docs = spark.createDataFrame(
        [
            (1, "AAAA " + shared + " BBBB"),
            (2, "completely different prefix text " + shared),
            (3, "no duplication whatsoever in here at all"),
        ],
        "doc_id long, text string",
    )
    fp = winnow_fingerprints(docs, k=8, w=4)
    sel = {
        i: {r.gram for r in fp.filter(F.col("id") == i).collect()}
        for i in (1, 2, 3)
    }
    assert sel[1] & sel[2], "copies of a 33-char substring must share a gram"
    # every shared selected gram of 1&2 lies inside the duplicated text
    for g in sel[1] & sel[2]:
        assert g in ("AAAA " + shared + " BBBB")


def test_winnow_short_docs_select_nothing(spark):
    docs = spark.createDataFrame(
        [(1, "0123456789")],  # 10 < w + k - 1 = 11
        "doc_id long, text string",
    )
    assert winnow_fingerprints(docs, k=8, w=4).count() == 0


def test_winnow_position_guard_raises(spark):
    docs = spark.createDataFrame(
        [(1, "x" * (1 << 20))], "doc_id long, text string"
    )
    with pytest.raises(Exception, match="exceeds"):
        winnow_fingerprints(docs, k=8, w=4).count()


def test_winnow_rejects_bad_params(spark):
    docs = spark.createDataFrame([(1, "abc")], "doc_id long, text string")
    with pytest.raises(ValueError, match="need k >= 1"):
        winnow_fingerprints(docs, k=0, w=4)


def test_winnow_hot_cap_drops_boilerplate_gram(spark):
    """A gram selected by every document must not produce quadratic
    pairs once it exceeds hot_cap."""
    boiler = "SHARED-BOILERPLATE-HEADER-LINE"
    rows = [(i, boiler + f" unique tail {i} " + "z" * (i % 7)) for i in range(10)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    capped = winnow_match_pairs(docs, k=8, w=4, min_shared=1, hot_cap=5)
    uncapped = winnow_match_pairs(docs, k=8, w=4, min_shared=1, hot_cap=1000)
    assert uncapped.count() == 45  # all 10-choose-2 pairs via the boilerplate
    assert capped.count() < 45
