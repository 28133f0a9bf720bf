

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
