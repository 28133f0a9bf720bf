"""Named analytics workload: every implemented operator/query surfaced as
``name -> (spark, sf_dir) -> DataFrame``, each with a DuckDB oracle SQL
(the driver's correctness gate, see __spark_entry__.py).

Numeric-determinism convention (so value hashes match the oracle exactly):
monetary/quantity aggregates are computed in DECIMAL (exact, order-
independent) and cast to double only at the output; averages are one IEEE
division of two exact numbers. Floating sums over arbitrary doubles are
quantized to DECIMAL(18,6) first. See workload/tpch.py.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from geo_db_spark.workload import (
    cdc_wl,
    curation,
    dedup,
    extraction,
    graph,
    labels_wl,
    multimodal,
    ops,
    packing_wl,
    similarity,
    sketches,
    spatial_wl,
    text,
    tpch,
    tpch_ext,
)

_MODULES = (
    tpch,
    tpch_ext,
    ops,
    graph,
    dedup,
    text,
    curation,
    similarity,
    extraction,
    labels_wl,
    multimodal,
    sketches,
    packing_wl,
    cdc_wl,
    spatial_wl,
)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for m in _MODULES:
        out.update(m.QUERIES)
    return out


def oracle_sql() -> dict[str, str]:
    out: dict[str, str] = {}
    for m in _MODULES:
        out.update(m.ORACLES)
    return out


# Single source of truth for "how many queries does this engine declare"
# (r6 verdict #6: README said 147 while 148 were registered — the tally
# now lives HERE, README cites it, and test_workload_oracle asserts the
# registry matches it, so the two can never drift again).
N_QUERIES = 212
