"""Bucketed co-located join: neither fact side may shuffle."""

from __future__ import annotations

from tests.conftest import SF_SMOKE


def test_bucketed_join_has_no_shuffle(spark):
    from geo_db_spark.io import load
    from geo_db_spark.plans.bucketing import (
        bucketed_orders_lineitem_join,
        physical_plan,
    )

    joined = bucketed_orders_lineitem_join(spark, SF_SMOKE, num_buckets=4)
    # at smoke scale AQE may broadcast one side (a BroadcastExchange is
    # not a shuffle); the claim is that no side is hash-REPARTITIONED
    plan = physical_plan(joined)
    assert "Exchange hashpartitioning" not in plan, plan
    assert "Bucketed: true" in plan

    # with broadcast off the plan must be the flagship shape: sort-merge
    # join with ZERO exchanges and ZERO sorts (sortBy at write time)
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined2 = bucketed_orders_lineitem_join(spark, SF_SMOKE, num_buckets=4)
        plan2 = physical_plan(joined2)
        assert "SortMergeJoin" in plan2, plan2
        assert "Exchange" not in plan2, plan2
        assert "Sort " not in plan2, plan2

        orders = load(spark, SF_SMOKE, "orders")
        li = load(spark, SF_SMOKE, "lineitem")
        want = li.join(orders, li.l_orderkey == orders.o_orderkey).count()
        assert joined2.count() == want > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
