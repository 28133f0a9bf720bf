"""KMV mergeability: merging per-group sketch state must equal the
sketch a direct pass over all the raw data produces — exactly."""

from __future__ import annotations

from geo_db_spark.operators.sketch import kmv_merge, kmv_sketch_per_group


def test_merged_sketch_equals_direct(spark):
    rows = [(i % 7, f"v{i % 113}") for i in range(2000)]
    df = spark.createDataFrame(rows, ["g", "v"])
    per_group = kmv_sketch_per_group(df, "v", ["g"], k=16)
    merged = kmv_merge(per_group, [], k=16).collect()[0]["ks"]
    direct = kmv_sketch_per_group(df.selectExpr("1 AS one", "v"), "v", ["one"], k=16)
    want = direct.collect()[0]["ks"]
    assert merged == want and len(merged) == 16
