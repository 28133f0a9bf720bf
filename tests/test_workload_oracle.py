"""Mirror of the driver's correctness gate at sf0.001 (fast) — every
workload query must match its DuckDB oracle on count, columns, and
order-insensitive values."""

from __future__ import annotations

import pytest

from geo_db_spark import workload
from geo_db_spark.verify import run_all
from tests.conftest import SF_SMOKE

NAMES = sorted(workload.queries().keys())


# Genuinely non-SQL-expressible ops (Pandas-batch math) would go here;
# since r5 every declared query carries a full value oracle
# (mm_feature_extract gained one via exact int64 chunk sums), so the
# every-query-has-an-oracle assert runs at full strength.
ROWS_ONLY: set[str] = set()


def test_every_query_has_oracle():
    qs = workload.queries()
    oracles = workload.oracle_sql()
    missing = [n for n in qs if n not in oracles and n not in ROWS_ONLY]
    assert missing == [], f"queries without oracle: {missing}"


def test_no_hugeint_oracle_columns():
    """The driver canonicalizes oracle results through pandas; DuckDB HUGEINT
    (what SUM(CASE..) over ints returns) maps to float64 there while Spark's
    side stays int64 — the value hash then fails even on equal values (the r3
    q12/g14 incident). Every oracle must CAST such sums to BIGINT. Cheap:
    DuckDB-only, no Spark session."""
    from geo_db_spark.verify import duckdb_con

    con = duckdb_con(SF_SMOKE)
    bad = {}
    for name, sql in workload.oracle_sql().items():
        rel = con.sql(sql)
        cols = [c for c, t in zip(rel.columns, rel.types) if str(t) in ("HUGEINT", "UHUGEINT")]
        if cols:
            bad[name] = cols
    assert bad == {}, f"oracles with HUGEINT top-level columns (driver canon maps to float64): {bad}"


# r14: the three slowest oracle replays (1-3 min each — DuckDB replays
# a full CC / residual-PQ training chain) are `slow`-marked so the
# driver-facing default run fits its window; the driver's OWN 212-query
# oracle gate still covers them every round, and the slow lane runs
# them locally per commit batch.
SLOW_ORACLE = {
    "emb_semdedup_survivors_recovered",
    "ann_ivf_pq_residual_topk",
    "dedup_simjoin_survivors",
}


@pytest.mark.parametrize(
    "name",
    [
        pytest.param(n, marks=pytest.mark.slow) if n in SLOW_ORACLE else n
        for n in NAMES
    ],
)
def test_query_matches_oracle(spark, name):
    results = run_all(spark, SF_SMOKE, only=[name])
    assert len(results) == 1
    r = results[0]
    assert r.ok, f"{name}: {r.errors}"
    assert r.spark_rows > 0, f"{name}: empty result"


def test_registry_matches_declared_tally():
    """r6 verdict #6: one source of truth for the query count. Any
    add/remove must touch workload.N_QUERIES in the same commit, which
    forces README's citation of it to stay honest."""
    qs = workload.queries()
    assert len(qs) == workload.N_QUERIES, (
        f"registry has {len(qs)} queries but workload.N_QUERIES says "
        f"{workload.N_QUERIES} — update the constant (and README)"
    )
    assert len(workload.oracle_sql()) == workload.N_QUERIES - len(ROWS_ONLY)
