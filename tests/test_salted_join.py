"""salted_join must equal the plain join and key the shuffle on (k, salt)."""

from __future__ import annotations

from pyspark.sql import functions as F

from geo_db_spark.operators.relational import salted_join


def test_salted_join_equals_plain_join(spark):
    # 90% of the big side shares one hot key
    big = spark.createDataFrame(
        [(i, 1 if i % 10 else i) for i in range(1000)], ["row_id", "k"]
    )
    dim = spark.createDataFrame([(k, f"v{k}") for k in range(0, 1000, 10)], ["k", "v"])
    plain = {(r["row_id"], r["v"]) for r in big.join(dim, "k").collect()}
    salted = salted_join(big, dim, "k", n_salts=4, salt_by=["row_id"])
    got = {(r["row_id"], r["v"]) for r in salted.collect()}
    assert got == plain and len(got) > 0


def test_salted_join_left_outer(spark):
    big = spark.createDataFrame([(1, 10), (2, 20), (3, 99)], ["row_id", "k"])
    dim = spark.createDataFrame([(10, "a"), (20, "b")], ["k", "v"])
    got = {
        (r["row_id"], r["v"])
        for r in salted_join(big, dim, "k", n_salts=3, how="left").collect()
    }
    assert got == {(1, "a"), (2, "b"), (3, None)}


def test_salt_splits_hot_key(spark):
    big = spark.createDataFrame([(i, 7) for i in range(100)], ["row_id", "k"])
    dim = spark.createDataFrame([(7, "x")], ["k", "v"])
    out = salted_join(big, dim, "k", n_salts=4, salt_by=["row_id"])
    # the deterministic salt must actually spread the hot key
    n_salts = (
        big.withColumn("__salt", F.pmod(F.xxhash64("row_id"), F.lit(4)))
        .select("__salt").distinct().count()
    )
    assert n_salts == 4
    assert out.count() == 100


def test_salted_join_rejects_right_outer(spark):
    import pytest

    big = spark.createDataFrame([(1, 10)], ["row_id", "k"])
    dim = spark.createDataFrame([(10, "a"), (99, "b")], ["k", "v"])
    with pytest.raises(ValueError, match="duplicate"):
        salted_join(big, dim, "k", how="right")


def test_salted_ordered_concat_matches_unsalted_on_skew(spark):
    """r7 salted two-phase group-concat: on a synthetic hot key (90% of
    rows in one group, spread over many partitions) the salted plan must
    produce byte-identical output to the unsalted ordered concat, with
    duplicates collapsed the same way."""
    from pyspark.sql import functions as F

    from geo_db_spark.operators.relational import (
        ordered_group_concat,
        salted_ordered_concat,
    )

    df = (
        spark.range(0, 20000, 1, 16)
        .select(
            F.when(F.col("id") % 10 < 9, F.lit("hot")).otherwise(F.concat(F.lit("k"), (F.col("id") % 7).cast("string"))).alias("k"),
            # duplicate values on purpose: distinct must collapse them
            F.concat(F.lit("v"), (F.col("id") % 500).cast("string")).alias("v"),
        )
    )
    plain = {
        r.k: r.concat
        for r in ordered_group_concat(df, "k", value="v", order_by=["v"]).collect()
    }
    salted = {
        r.k: r.concat
        for r in salted_ordered_concat(df, "k", value="v", order_by=["v"], n_salts=8).collect()
    }
    assert plain == salted
    assert len(plain["hot"].split(" / ")) == 450  # distinct collapsed (ids =9 mod 10 excluded)


def test_salted_ordered_concat_two_exchange_plan(spark):
    """Plan shape: exactly two hash exchanges — (key, salt) then key —
    and no single-partition stage."""
    from pyspark.sql import functions as F

    from geo_db_spark.operators.relational import salted_ordered_concat

    df = spark.range(100).select(
        (F.col("id") % 3).alias("k"), F.col("id").cast("string").alias("v")
    )
    plan = salted_ordered_concat(df, "k", value="v", order_by=["v"])._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 2
    assert "SinglePartition" not in plan
