

def test_bpe_train_merges_sennrich_example(spark):
    """The ACL'16 worked example: {low:5, lower:2, newest:6, widest:3}
    must yield the canonical merge order es(9), est(9), lo(7), low(7)
    — counts include multiplicity across words ('es' appears in both
    newest and widest: 6+3)."""
    from geo_db_spark.operators.text import bpe_train_merges

    vocab = spark.createDataFrame(
        [("low", 5), ("lower", 2), ("newest", 6), ("widest", 3)],
        "word string, n long",
    )
    m = bpe_train_merges(vocab, rounds=4)
    assert m == [
        ("e", "s", "es", 9),
        ("es", "t", "est", 9),
        ("l", "o", "lo", 7),
        ("lo", "w", "low", 7),
    ]


def test_bpe_merge_application_is_left_to_right_nonoverlapping(spark):
    """BPE's within-word rule: 'aaaa' + (a,a) merges positions (0,1)
    and (2,3) — never the overlapping middle pair — and a token formed
    this round does not immediately re-merge. Also: training runs dry
    (returns fewer merges) when every word is one symbol."""
    from geo_db_spark.operators.text import bpe_train_merges

    vocab = spark.createDataFrame([("aaaa", 1)], "word string, n long")
    m = bpe_train_merges(vocab, rounds=3)
    # round 1: (a,a) x3? counts: pairs (a,a) appear 3 times in 'aaaa'
    assert m[0] == ("a", "a", "aa", 3)
    # after merge: <aa><aa> -> round 2 merges (aa,aa); round 3 dry
    assert m[1] == ("aa", "aa", "aaaa", 1)
    assert len(m) == 2


def test_bpe_rejects_non_lowercase_words(spark):
    """r8 review finding: the <sym> framing is only sound for
    bracket-free [a-z]+ words — violations must raise loudly, not
    corrupt symbol boundaries or blow up inside SQL interpolation."""
    import pytest

    from geo_db_spark.operators.text import bpe_train_merges

    vocab = spark.createDataFrame(
        [("ok", 1), ("o'brien", 2)], "word string, n long"
    )
    with pytest.raises(Exception, match=r"requires \[a-z\]\+ words"):
        bpe_train_merges(vocab, rounds=1)


def test_bpe_oracle_dry_round_matches_spark(spark):
    """r8 review finding: the chained-CTE oracle's per-round join must
    LEFT-join the (possibly empty) winning pair, or a corpus that runs
    dry before the scheduled rounds empties the vocabulary. Check the
    degenerate corpus end-to-end against DuckDB."""
    import duckdb

    from geo_db_spark.operators.text import bpe_train_merges
    from geo_db_spark.workload.text import _bpe_oracle

    # every word merges to ONE symbol within 2 rounds; rounds=4 runs dry
    vocab = spark.createDataFrame(
        [("ab", 3), ("abab", 0)], "word string, n long"
    ).filter("n > 0")
    m = bpe_train_merges(vocab, rounds=4)
    assert [x[2] for x in m] == ["ab"]  # one merge, then dry

    con = duckdb.connect()
    con.execute("CREATE TABLE documents AS SELECT 'ab ab ab' AS text")
    got = con.execute(_bpe_oracle(rounds=4)).fetchall()
    assert got == [(1, "a", "b", "ab", 3)]  # dry rounds emit nothing


def test_bpe_batched_m1_identical_to_sequential(spark):
    """r8 verdict next #2 done-criterion: batch_m=1 must be
    bit-identical to the sequential trainer — the rank-1 candidate
    never has a higher-ranked conflict, so the batch degenerates to
    top-1 regardless of the candidate window size."""
    from geo_db_spark.operators.text import bpe_train_merges

    vocab = spark.createDataFrame(
        [("lower", 5), ("lowest", 3), ("newer", 6), ("wider", 2), ("low", 7)],
        "word string, n long",
    )
    seq = bpe_train_merges(vocab, rounds=6)
    m1 = bpe_train_merges(vocab, rounds=6, batch_m=1, cand_k=16)
    assert m1 == seq


def test_bpe_batched_selection_is_disjoint_and_count_invariant(spark):
    """Every batch must be pairwise symbol-disjoint (left, right AND
    merged result), and each batched merge's count must equal what the
    sequential trainer reports when it eventually picks the same pair
    — the count-invariance argument that makes batching sound."""
    from geo_db_spark.operators.text import bpe_train_merges

    vocab = spark.createDataFrame(
        [("lower", 5), ("lowest", 3), ("newer", 6), ("wider", 2), ("slow", 4)],
        "word string, n long",
    )
    batched = bpe_train_merges(vocab, rounds=2, batch_m=4, cand_k=16)
    assert len(batched) > 2  # actually batching, not degenerate
    # per-round disjointness: rounds are contiguous slices; reconstruct
    # them by replaying the round boundaries (<=4 per round)
    seq = bpe_train_merges(vocab, rounds=24)
    seq_counts = {(a, b): c for a, b, _m, c in seq}
    for a, b, m, c in batched:
        assert m == a + b
        # the same pair, whenever sequential training picks it, carries
        # the same count (disjointness => counts invariant within batch)
        if (a, b) in seq_counts:
            assert seq_counts[(a, b)] == c


def test_bpe_batched_reaches_32_merges_in_8_rounds(spark):
    """The throughput claim: 8 rounds x batch_m=8 must deliver >= 32
    merges on the real documents vocabulary (the driver-gated
    text_bpe_merges_batched query pins exact values; this pins the
    merge COUNT the batching exists to deliver)."""
    from pyspark.sql import functions as F

    from geo_db_spark.io import load
    from geo_db_spark.operators.text import bpe_train_merges
    from tests.conftest import SF_SMOKE

    docs = load(spark, SF_SMOKE, "documents")
    vocab = (
        docs.select(
            F.explode(
                F.regexp_extract_all(F.lower(F.col("text")), F.lit("[a-z]+"), 0)
            ).alias("word")
        )
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    merges = bpe_train_merges(vocab, rounds=8, batch_m=8, cand_k=32)
    assert len(merges) >= 32
