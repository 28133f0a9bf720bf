"""Partitioned parquet sink: layout, roundtrip, and partition pruning."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from geo_db_spark.io import load, save_partitioned
from tests.conftest import SF_SMOKE


def test_partitioned_sink_roundtrip_and_pruning(spark, tmp_path):
    out = str(tmp_path / "events_by_type")
    ev = load(spark, SF_SMOKE, "events")
    save_partitioned(
        ev,
        out,
        partition_by=("event_type",),
        sort_within=("ts",),
        max_records_per_file=100_000,
    )

    # hive-style directories, one per type
    dirs = {d for d in os.listdir(out) if d.startswith("event_type=")}
    assert len(dirs) == 5

    back = spark.read.parquet(out)
    assert back.count() == ev.count()

    # a filter on the partition column must prune at the directory level:
    # it appears in PartitionFilters, not as a data filter, and the scan
    # reads a single partition directory
    q = back.filter(F.col("event_type") == "click").select("event_id", "value")
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(event_type" in plan or "PartitionFilters: [" in plan
    assert "event_type)" not in plan.split("PushedFilters")[1].split("]")[0], plan
    n_click = q.count()
    want = ev.filter(F.col("event_type") == "click").count()
    assert n_click == want > 0
