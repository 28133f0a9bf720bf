"""ingest(bucket_tables=...) writes bucketed tables that post-phase
joins read shuffle-free on the bucket key, with identical contents."""

from __future__ import annotations

import pytest

import bz2

from tests.fixtures_wikidata import CLASS_SETS
from tests.test_pipeline_e2e import _mini_dump


@pytest.mark.slow
def test_ingest_bucketed_object_labels(spark, tmp_path):
    from pyspark.sql import functions as F

    from geo_db_spark.pipeline import ingest

    docs = _mini_dump()
    dump = tmp_path / "dump.json.bz2"
    dump.write_bytes(bz2.compress(("[\n" + ",\n".join(docs) + "\n]\n").encode()))

    plain = ingest(spark, str(dump), CLASS_SETS)
    bucketed = ingest(
        spark,
        str(dump),
        CLASS_SETS,
        out_dir=str(tmp_path / "db"),
        bucket_tables={"object_labels": 4},
    )

    def rows(df):
        cols = sorted(df.columns)
        return sorted(tuple(str(r[c]) for c in cols) for r in df.collect())

    assert rows(bucketed["object_labels"]) == rows(plain["object_labels"])

    # a self-aggregation on the bucket key must not re-shuffle
    agg = bucketed["object_labels"].groupBy("id").agg(F.count(F.lit(1)).alias("n"))
    plan = agg._jdf.queryExecution().executedPlan().toString()
    assert "Exchange hashpartitioning" not in plan, plan
    assert "Bucketed: true" in plan


@pytest.mark.slow
def test_ingest_bucketed_custom_key_and_out_dir(spark, tmp_path):
    """Per-table bucket keys: cities_countries has no 'id' column — a
    bare int spec must raise, a (key, n) spec must work, and the files
    must land under out_dir like every other table (ADVICE r3)."""
    import os

    import pytest

    from geo_db_spark.pipeline import ingest

    docs = _mini_dump()
    dump = tmp_path / "dump.json.bz2"
    dump.write_bytes(bz2.compress(("[\n" + ",\n".join(docs) + "\n]\n").encode()))

    with pytest.raises(ValueError, match="bucket_tables"):
        ingest(
            spark, str(dump), CLASS_SETS,
            out_dir=str(tmp_path / "db1"),
            bucket_tables={"cities_countries": 4},
        )

    out = ingest(
        spark, str(dump), CLASS_SETS,
        out_dir=str(tmp_path / "db2"),
        bucket_tables={"cities_countries": ("city", 4)},
    )
    assert os.path.isdir(str(tmp_path / "db2" / "cities_countries"))
    plain = ingest(spark, str(dump), CLASS_SETS)
    got = sorted(map(tuple, out["cities_countries"].collect()))
    want = sorted(map(tuple, plain["cities_countries"].collect()))
    assert got == want
