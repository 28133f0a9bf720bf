"""Unit tests for the corpus-curation operators (Gopher repetition, C4
filter flags, duplicate-span detection) and triangle counting, on crafted
micro-inputs with hand-computed expected values. The sf0.001/sf0.01
oracle sweep covers the same ops end-to-end; these pin the edge cases the
synthetic corpus can't hit (short docs, boilerplate, known triangles).
"""

from __future__ import annotations

import pytest

from geo_db_spark.operators.curation import (
    c4_filter_flags,
    dup_spans,
    gopher_repetition,
)
from geo_db_spark.operators.graph_algos import triangle_count


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_gopher_repetition_crafted(spark):
    # doc 1: "a a a b" -> top word a (3/4), distinct 2 -> dup 0.5,
    # 2-grams: "a a" x2, "a b" -> top 2/3; 3-grams: "a a a", "a a b" -> 1/2
    df = _docs(spark, [(1, "a a a b")])
    row = gopher_repetition(df).collect()[0]
    assert row.n_tokens == 4
    assert row.top_word_frac == pytest.approx(0.75)
    assert row.dup_word_frac == pytest.approx(0.5)
    assert row.top_2gram_frac == pytest.approx(2 / 3)
    assert row.top_3gram_frac == pytest.approx(0.5)


def test_gopher_single_token_doc(spark):
    # one token: no 2/3-grams — fracs coalesce to 0, not null/NaN.
    row = gopher_repetition(_docs(spark, [(1, "solo")])).collect()[0]
    assert row.n_tokens == 1
    assert row.top_word_frac == 1.0
    assert row.top_2gram_frac == 0.0
    assert row.top_3gram_frac == 0.0


def test_c4_flags(spark):
    long_ok = " ".join(["token"] * 40) + "."
    rows = {
        r.doc_id: r
        for r in c4_filter_flags(
            _docs(
                spark,
                [
                    (1, long_ok),
                    (2, "too short"),
                    (3, " ".join(["ok"] * 40)),  # mean word len 2 -> bad
                    (4, " ".join(["curly"] * 40) + " {"),
                    (5, " ".join(["pad"] * 40) + " lorem ipsum dolor"),
                ],
            )
        ).collect()
    }
    assert rows[1].keep == 1 and rows[1].f_no_terminal_punct == 0
    assert rows[2].f_too_short == 1 and rows[2].keep == 0
    assert rows[3].f_bad_word_len == 1 and rows[3].keep == 0
    assert rows[4].f_has_curly == 1 and rows[4].keep == 0
    assert rows[5].f_boilerplate == 1 and rows[5].keep == 0


def test_dup_spans_known_runs(spark):
    # docs 1/2 share tokens 1..12 (w1..w12): 12-7=5 shared stride-1
    # 8-windows, consecutive -> run 5. doc 3 disjoint -> zero dups.
    shared = " ".join(f"w{i}" for i in range(1, 13))
    df = _docs(
        spark,
        [
            (1, shared + " x1 x2 x3"),
            (2, shared + " y1 y2 y3"),
            (3, " ".join(f"z{i}" for i in range(30))),
        ],
    )
    rows = {r.doc_id: r for r in dup_spans(df, k=8).collect()}
    assert rows[1].n_windows == 8  # 15 tokens
    assert rows[1].n_dup_windows == 5 and rows[1].max_dup_run == 5
    assert rows[2].n_dup_windows == 5 and rows[2].max_dup_run == 5
    assert rows[3].n_dup_windows == 0 and rows[3].max_dup_run == 0


def test_dup_spans_short_doc_empty_windows(spark):
    rows = {r.doc_id: r for r in dup_spans(_docs(spark, [(1, "a b c")]), k=8).collect()}
    assert rows[1].n_windows == 0 and rows[1].max_dup_run == 0


def test_dup_spans_intra_doc_repeat_not_dup(spark):
    # the same window repeated WITHIN one doc is not cross-doc dup.
    t = " ".join(["p"] * 20)
    rows = dup_spans(_docs(spark, [(1, t)]), k=8).collect()
    assert rows[0].n_dup_windows == 0


def test_triangle_count_k4(spark):
    # K4 has 4 triangles; extra pendant edge adds none.
    edges = spark.createDataFrame(
        [(a, b) for a in range(4) for b in range(a + 1, 4)] + [(3, 9)],
        "a long, b long",
    )
    assert triangle_count(edges).collect()[0].n_triangles == 4


def test_triangle_count_no_triangles(spark):
    edges = spark.createDataFrame([(1, 2), (2, 3), (3, 4)], "a long, b long")
    assert triangle_count(edges).collect()[0].n_triangles == 0


def test_triangle_count_undirected_dedup(spark):
    # duplicate + reversed edges collapse to one undirected edge set.
    edges = spark.createDataFrame(
        [(1, 2), (2, 1), (2, 3), (3, 1), (1, 3)], "a long, b long"
    )
    assert triangle_count(edges).collect()[0].n_triangles == 1


def test_dup_span_removal_excises_shared_phrase(spark):
    """Two docs sharing an exact 10-token phrase: every token of the
    phrase (covered by the stride-1 dup 8-windows) is removed from BOTH,
    private prose survives, and a doc with no duplication is untouched."""
    import hashlib

    from geo_db_spark.operators.curation import dup_span_removal

    shared = "the quick brown fox jumps over the lazy dog again"  # 10 tokens
    docs = spark.createDataFrame(
        [
            (1, "alpha beta " + shared + " gamma delta"),
            (2, "one two three " + shared),
            (3, "totally unrelated text with enough tokens here ok"),
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id: r for r in dup_span_removal(docs, k=8).collect()}

    md5 = lambda s: hashlib.md5(s.encode()).hexdigest()
    # doc 1: 14 tokens; phrase occupies pos 2..11 -> kept = alpha beta gamma delta
    assert (got[1].n_tokens, got[1].n_kept) == (14, 4)
    assert got[1].kept_md5 == md5("alpha beta gamma delta")
    # doc 2: 13 tokens; kept = one two three
    assert (got[2].n_tokens, got[2].n_kept) == (13, 3)
    assert got[2].kept_md5 == md5("one two three")
    # doc 3 untouched: kept text == original
    assert got[3].n_kept == got[3].n_tokens == 8
    assert got[3].kept_md5 == md5("totally unrelated text with enough tokens here ok")
    assert abs(got[1].kept_frac - 4 / 14) < 1e-12


def test_chunk_windows_edges(spark):
    """chunk/stride geometry: full window, ragged tail, overlap content,
    single-token doc, and the exactly-one-window boundary (n == chunk)."""
    from geo_db_spark.operators.text import chunk_windows

    rows = [
        (1, " ".join(str(i) for i in range(11))),  # n=11: starts 0,4,8
        (2, "solo"),                               # n=1: one window
        (3, " ".join("x" * 1 for _ in range(6))),  # n=6==chunk: ONE window
        (4, " ".join(str(i) for i in range(10))),  # n=10: start 8 is fully
                                                   # inside window 1 -> dropped
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        (r.doc_id, r.chunk_id): r
        for r in chunk_windows(df, "doc_id", "text", chunk=6, stride=4).collect()
    }
    assert {(d, c) for d, c in out} == {
        (1, 0), (1, 1), (1, 2), (2, 0), (3, 0), (4, 0), (4, 1)
    }
    assert out[(1, 0)].chunk_text == "0 1 2 3 4 5"
    assert out[(1, 1)].chunk_text == "4 5 6 7 8 9"   # overlap of 2 with chunk 0
    assert out[(1, 2)].chunk_text == "8 9 10"        # ragged tail
    assert out[(1, 2)].n_chunk_tokens == 3
    assert out[(1, 2)].start == 8
    assert out[(2, 0)].chunk_text == "solo"
    assert out[(3, 0)].n_chunk_tokens == 6
    assert out[(4, 1)].chunk_text == "4 5 6 7 8 9"   # ends AT the last token


def test_chunk_windows_rejects_bad_stride(spark):
    import pytest

    from geo_db_spark.operators.text import chunk_windows

    df = spark.createDataFrame([(1, "a")], "doc_id long, text string")
    with pytest.raises(ValueError):
        chunk_windows(df, stride=0)
    with pytest.raises(ValueError):
        chunk_windows(df, chunk=4, stride=8)
