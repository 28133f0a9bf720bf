"""Local mirror of the driver's correctness gate: run each workload query
on Spark and its oracle SQL on DuckDB over the same parquet tables, then
compare row count, column names, and order-insensitive values.

Used by tests/test_workload_oracle.py so regressions surface before the
driver's per-round CORRECTNESS check.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field

import duckdb
from pyspark.sql import SparkSession

from geo_db_spark.io import TABLES


@dataclass
class CompareResult:
    name: str
    ok: bool
    spark_rows: int = 0
    oracle_rows: int = 0
    errors: list[str] = field(default_factory=list)


def _norm_cell(v):
    # normalize timestamps/dates/Decimals to strings; doubles to repr
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    if isinstance(v, (int, str, bool)):
        return v
    return str(v)


def _norm_rows(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(
        (tuple(_norm_cell(r[i]) for i in order) for r in rows),
        key=lambda t: tuple((v is None, str(type(v)), v) for v in t),
    )


def duckdb_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def _pandas_kind(dtype) -> str:
    """Collapse a pandas dtype to a coarse kind for driver-canon checks."""
    k = dtype.kind
    if k in ("i", "u"):
        return "int"
    if k == "f":
        return "float"
    return k  # O, b, M, m, ... — not part of the int/float landmine


def dtype_mismatches(spark_pdf, oracle_pdf) -> list[str]:
    """The driver canonicalizes both sides through pandas before hashing, so a
    column that is int64 on one side and float64 on the other hash-mismatches
    even when every value is equal (the r3 HUGEINT incident: DuckDB SUM(CASE..)
    over ints returns HUGEINT, which pandas maps to float64, vs Spark's int64).
    The repo's fetchall compare cannot see this — this check mirrors the driver.
    Object-dtype vs float is deliberately NOT flagged: DuckDB DECIMAL->float64
    vs Spark Decimal-object passes the driver (q1 has always been green).
    """
    out = []
    for c in sorted(set(spark_pdf.columns) & set(oracle_pdf.columns)):
        sk = _pandas_kind(spark_pdf[c].dtype)
        ok = _pandas_kind(oracle_pdf[c].dtype)
        if {sk, ok} == {"int", "float"}:
            out.append(f"pandas dtype kind differs for '{c}': spark={sk} oracle={ok} (driver hash would fail)")
    return out


def canon_hazards(pdf) -> list[str]:
    """Cells the driver's pandas canonicalization cannot factorize (ndarray,
    list, dict) crash its check outright — the r2 mm_feature_extract incident.
    Applies to rows-only queries too: the driver still canonicalizes them.
    """
    import pandas as pd

    out = []
    for c in pdf.columns:
        if pdf[c].dtype.kind != "O":
            continue
        try:
            pd.factorize(pdf[c])
        except TypeError as e:
            out.append(f"column '{c}' has unhashable cells (driver canon would crash): {e}")
    return out


def compare_query(
    spark: SparkSession,
    con: duckdb.DuckDBPyConnection,
    name: str,
    fn,
    sql: str | None,
    sf_dir: str,
) -> CompareResult:
    res = CompareResult(name=name, ok=True)
    sdf = fn(spark, sf_dir)
    s_rows = sdf.collect()
    s_cols = sdf.columns
    res.spark_rows = len(s_rows)
    if sql is None:
        haz = canon_hazards(sdf.toPandas())
        if haz:
            res.ok = False
            res.errors.extend(haz)
        return res
    rel = con.sql(sql)
    o_cols = rel.columns
    o_rows = rel.fetchall()
    res.oracle_rows = len(o_rows)
    if sorted(s_cols) != sorted(o_cols):
        res.ok = False
        res.errors.append(f"columns differ: spark={sorted(s_cols)} oracle={sorted(o_cols)}")
        return res
    if res.spark_rows != res.oracle_rows:
        res.ok = False
        res.errors.append(f"row count differs: spark={res.spark_rows} oracle={res.oracle_rows}")
        return res
    sn = _norm_rows([tuple(r) for r in s_rows], s_cols)
    on = _norm_rows(o_rows, o_cols)
    if sn != on:
        res.ok = False
        diffs = [i for i, (a, b) in enumerate(zip(sn, on)) if a != b][:3]
        for i in diffs:
            res.errors.append(f"row {i}: spark={sn[i]} oracle={on[i]}")
    # Mirror the driver's pandas canonicalization: dtype-kind drift between the
    # two sides fails the driver's value hash even when fetchall values match.
    spark_pdf = sdf.toPandas()
    mism = dtype_mismatches(spark_pdf, con.sql(sql).fetchdf()) + canon_hazards(spark_pdf)
    if mism:
        res.ok = False
        res.errors.extend(mism)
    return res


def run_all(spark: SparkSession, sf_dir: str, only: list[str] | None = None) -> list[CompareResult]:
    from geo_db_spark import workload

    qs = workload.queries()
    oracles = workload.oracle_sql()
    con = duckdb_con(sf_dir)
    out = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            out.append(compare_query(spark, con, name, fn, oracles.get(name), sf_dir))
        except Exception as e:  # surface, don't abort the sweep
            out.append(CompareResult(name=name, ok=False, errors=[f"exception: {e}"]))
    return out
