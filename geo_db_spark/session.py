"""SparkSession factory and runtime tuning.

Design notes (100 TB target):
- AQE on: runtime coalesce of shuffle partitions, skew-join splitting and
  dynamic broadcast conversion replace hand-tuned partition counts when the
  data is 1000x the local test scale.
- Session timezone pinned to UTC so timestamp semantics are stable across
  the test oracle (DuckDB, naive timestamps) and any cluster TZ.
- Arrow enabled for the (rare) Pandas-UDF paths; built-in expressions are
  preferred everywhere (whole-stage codegen).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Runtime-settable confs we want on every session, including sessions we
# did not create (the correctness driver hands us one).
_RUNTIME_CONFS = {
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # runtime Bloom-filter join prefilter (operators/packing.incremental_dedup
    # relies on it as its scale story; default-on in Spark 4, pinned here in
    # case a cluster profile disabled it)
    "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
    # ANSI off: the reference's semantics are warn-and-skip on malformed
    # data (SURVEY.md §1.4), i.e. NULL on bad cast, not an error.
    "spark.sql.ansi.enabled": "false",
}


def tune(spark: SparkSession) -> SparkSession:
    """Apply runtime confs to an existing session (driver-provided or ours)."""
    for k, v in _RUNTIME_CONFS.items():
        try:
            spark.conf.set(k, v)
        except Exception:
            pass  # non-runtime-settable on this build; startup conf covers it
    return spark


def get_spark(app_name: str = "geo_db_spark", shuffle_partitions: int | None = None) -> SparkSession:
    """Create (or get) a tuned SparkSession.

    Local mode uses ``local[$SPARK_GRAFT_CPUS]`` (default all cores). On a
    real cluster the same code runs unchanged: nothing here assumes a
    single JVM.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions or 32))
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    )
    for k, v in _RUNTIME_CONFS.items():
        builder = builder.config(k, v)
    return tune(builder.getOrCreate())
