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


def test_cdc_chunks_realign_after_insertion(spark):
    """The content-defined property: prepending text to a document
    shifts every byte offset, yet all chunks after the first content
    boundary keep their digests — fixed-size blocks would share
    nothing."""
    import numpy as np

    from geo_db_spark.operators.dedup import cdc_chunks

    rng = np.random.RandomState(8)
    body = "".join(chr(97 + int(c)) for c in rng.randint(0, 26, 600))
    docs = spark.createDataFrame(
        [(1, body), (2, "INSERTED-PREFIX-" + body)],
        "doc_id long, text string",
    )
    ch = cdc_chunks(docs, k=8, mask_bits=5)
    d1 = {r.digest for r in ch.filter("id = 1").collect()}
    d2 = {r.digest for r in ch.filter("id = 2").collect()}
    assert len(d1) >= 5, "body long enough to chunk several times"
    shared = len(d1 & d2)
    assert shared >= len(d1) - 2, (len(d1), shared)  # all but the head realign


def test_cdc_chunks_cover_document_exactly(spark):
    """Chunks partition the document: contiguous, non-overlapping,
    covering [1, len]."""
    from geo_db_spark.operators.dedup import cdc_chunks

    text = "the quick brown fox jumps over the lazy dog " * 20
    docs = spark.createDataFrame([(1, text)], "doc_id long, text string")
    rows = sorted(
        (r.start, r.end) for r in cdc_chunks(docs, k=8, mask_bits=4).collect()
    )
    assert rows[0][0] == 1 and rows[-1][1] == len(text)
    for (s1, e1), (s2, e2) in zip(rows, rows[1:]):
        assert s2 == e1 + 1


def test_cdc_chunks_empty_and_bad_params(spark):
    import pytest

    from geo_db_spark.operators.dedup import cdc_chunks

    docs = spark.createDataFrame([(1, "")], "doc_id long, text string")
    assert cdc_chunks(docs, k=8, mask_bits=5).count() == 0
    with pytest.raises(ValueError, match="need k >= 1"):
        cdc_chunks(docs, k=0, mask_bits=5)


def test_spread_docs_is_conditional(spark):
    """_spread_docs only shuffles under-partitioned inputs: a frame
    already at >= defaultParallelism partitions is returned unchanged
    (identity — no Exchange added), while a 1-partition frame is spread."""
    from geo_db_spark.operators.dedup import _spread_docs

    par = spark.sparkContext.defaultParallelism
    narrow = spark.range(100).repartition(1)
    spread = _spread_docs(narrow)
    assert spread.rdd.getNumPartitions() == par

    wide = spark.range(100).repartition(par)
    assert _spread_docs(wide) is wide
