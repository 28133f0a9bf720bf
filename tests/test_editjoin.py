"""FastSS edit-distance join (operators/editjoin.py): brute-force parity,
case coverage of the single-edit kinds, and the zero-false-negative
claim fuzzed over random short strings — at depth 1 AND depth 2."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from geo_db_spark.operators.editjoin import deletion_variants, edit_distance_join


def _brute(spark, df, max_dist=1):
    a = df.select(F.col("id").alias("id_a"), F.col("s").alias("sa"))
    b = df.select(F.col("id").alias("id_b"), F.col("s").alias("sb"))
    return (
        a.crossJoin(b)
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("editdist", F.levenshtein("sa", "sb"))
        .filter(F.col("editdist") <= max_dist)
        .select("id_a", "id_b", "editdist")
    )


def test_editjoin_single_edit_kinds(spark):
    rows = [
        (1, "kitten"),
        (2, "kittan"),   # substitution of 1
        (3, "kitten"),   # exact dup of 1
        (4, "kittens"),  # insertion on 1
        (5, "kiten"),    # deletion from 1
        (6, "sitting"),  # ed 3 from 1 — must NOT pair
        (7, "a"),        # 1-char string
        (8, ""),         # empty string: ed("", "a") == 1
    ]
    df = spark.createDataFrame(rows, "id long, s string")
    got = sorted(map(tuple, edit_distance_join(df, "id", "s").collect()))
    want = sorted(map(tuple, _brute(spark, df).collect()))
    assert got == want
    pairs = {(a, b) for a, b, _ in got}
    assert {(1, 2), (1, 3), (1, 4), (1, 5), (7, 8)} <= pairs
    assert all(6 not in p for p in pairs)


def test_editjoin_depth2_edit_kinds(spark):
    """Depth 2 must catch every two-edit composition the single-edit
    kinds compose into — sub+sub, sub+indel, indel+indel, 2-del,
    2-ins — and still exclude ed-3 pairs."""
    rows = [
        (1, "kitten"),
        (2, "kattan"),    # 2 substitutions
        (3, "kitte"),     # 1 deletion (also within depth 2)
        (4, "kitt"),      # 2 deletions
        (5, "kittenly"),  # 2 insertions
        (6, "mitten"),    # 1 substitution
        (7, "sitten"),    # 1 substitution
        (8, "sitting"),   # ed 3 from 1 — must NOT pair with 1
        (9, "xy"),
        (10, ""),         # ed("", "xy") == 2
    ]
    df = spark.createDataFrame(rows, "id long, s string")
    got = sorted(
        map(tuple, edit_distance_join(df, "id", "s", max_dist=2).collect())
    )
    want = sorted(map(tuple, _brute(spark, df, max_dist=2).collect()))
    assert got == want
    pairs = {(a, b) for a, b, _ in got}
    assert {(1, 2), (1, 4), (1, 5), (9, 10)} <= pairs
    assert (1, 8) not in pairs


def test_editjoin_bruteforce_fuzz(spark):
    """Random corpus over a 3-letter alphabet (maximizes 1-edit
    collisions): FastSS output == quadratic levenshtein output."""
    import random

    rng = random.Random(1234)
    rows = [
        (i, "".join(rng.choice("abc") for _ in range(rng.randint(0, 5))))
        for i in range(120)
    ]
    df = spark.createDataFrame(rows, "id long, s string")
    got = sorted(map(tuple, edit_distance_join(df, "id", "s").collect()))
    want = sorted(map(tuple, _brute(spark, df).collect()))
    assert got == want
    assert len(got) > 50  # the alphabet is tight enough that pairs exist


@pytest.mark.slow
def test_editjoin_depth2_bruteforce_fuzz(spark):
    """Depth-2 zero-false-negative HYPOTHESIS fuzz (r7 verdict #3):
    tight alphabets maximize deletion-variant collisions; for every
    drawn corpus FastSS(max_dist=2) == quadratic levenshtein <= 2."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=8, deadline=None)
    @given(
        alphabet=st.sampled_from(["ab", "abc"]),
        data=st.data(),
    )
    def fuzz(alphabet, data):
        words = data.draw(
            st.lists(
                st.text(alphabet=alphabet, min_size=0, max_size=6),
                min_size=20,
                max_size=60,
            ),
            label="corpus",
        )
        rows = list(enumerate(words))
        df = spark.createDataFrame(rows, "id long, s string")
        got = sorted(
            map(tuple, edit_distance_join(df, "id", "s", max_dist=2).collect())
        )
        want = sorted(map(tuple, _brute(spark, df, max_dist=2).collect()))
        assert got == want

    fuzz()


def test_deletion_variants_shape(spark):
    df = spark.createDataFrame([("abc",), ("",)], "s string")
    out = df.select(deletion_variants(F.col("s")).alias("v")).collect()
    assert out[0].v == ["abc", "bc", "ac", "ab"]
    assert out[1].v == [""]


def test_deletion_variants_depth2_shape(spark):
    df = spark.createDataFrame([("abc",), ("aaa",), ("x",), ("",)], "s string")
    out = df.select(deletion_variants(F.col("s"), depth=2).alias("v")).collect()
    # identity + 3 single deletions + C(3,2)=3 double deletions
    assert out[0].v == ["abc", "bc", "ac", "ab", "c", "b", "a"]
    # repeated chars: position-distinct deletions collide and dedup
    assert out[1].v == ["aaa", "aa", "a"]
    assert out[2].v == ["x", ""]
    assert out[3].v == [""]


def test_editjoin_rejects_depth_gt_2(spark):
    import pytest

    df = spark.createDataFrame([(1, "x")], "id long, s string")
    with pytest.raises(NotImplementedError):
        edit_distance_join(df, "id", "s", max_dist=3)
