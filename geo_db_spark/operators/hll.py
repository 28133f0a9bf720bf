"""HyperLogLog distinct-count sketch, deterministic across engines.

Complements the KMV sketch (operators/sketch.py): HLL state is a FIXED
256-byte register file per group (KMV is k longs), merges by
element-wise max, and never needs a distinct/top-k pass over the input
— the build is a single map-side-combinable ``max`` aggregation, the
cheapest possible shuffle shape for 100 TB cardinality estimation.

Spark's built-in approx_count_distinct is HLL++ but its estimate is
engine-specific, so it can't face a DuckDB oracle. This implementation
pins every step to integer arithmetic both engines compute identically:

- 60-bit md5 hash (same string→hex→int path as the KMV sketch);
- bucket = low 8 bits, rank = leading-zero count of the remaining 52
  bits + 1, computed EXACTLY as ``53 - length(bin(h >> 8))`` — both
  engines' ``bin()`` renders integers without leading zeros, so the
  string length IS the bit length (no float log2, no ULP hazard);
- the harmonic denominator sum(2^-reg) is scaled by 2^53 into an exact
  BIGINT sum (order-independent), so the estimate is ONE float division
  of two identical numbers;
- the small-range linear-counting branch (the only transcendental,
  m*ln(m/V)) is rounded to 4 decimals on both sides.

Standard HLL per Flajolet et al. 2007; the bias constant alpha_256 and
the 2.5*m small-range switch follow the paper.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from geo_db_spark.operators.sketch import hash60

P = 8
M = 1 << P  # 256 registers
R_MAX = 60 - P + 1  # 53: max rank over the 52 value bits
ALPHA = 0.7213 / (1 + 1.079 / M)
# exact double numerator of the raw estimate: alpha * m^2 * 2^R_MAX
NUM = ALPHA * M * M * float(1 << R_MAX)
SMALL = 2.5 * M


def _rank(h: Column) -> Column:
    """Leading-zero rank of the 52 bits above the bucket byte: 1-based,
    53 when they are all zero. Integer-exact via bin() string length."""
    rem = F.shiftright(h, P)
    return F.when(rem == 0, F.lit(R_MAX)).otherwise(
        F.lit(R_MAX) - F.length(F.bin(rem))
    )


def _registers(df: DataFrame, value_col: str, group_cols: list[str]) -> DataFrame:
    """Sparse register rows (group, __b, __reg). Duplicate values cannot
    move a max, so no distinct pass is needed — the groupBy partial-
    aggregates map-side and the shuffle carries at most m rows/group."""
    h = hash60(F.col(value_col))
    d = df.select(
        *group_cols, (h % M).cast("int").alias("__b"), _rank(h).alias("__r")
    )
    return d.groupBy(*group_cols, "__b").agg(F.max("__r").alias("__reg"))


def _estimate(s_present: Column, n_regs: Column) -> Column:
    """HLL estimate from the exact integer harmonic sum of the PRESENT
    registers and their count; absent registers contribute 2^0 = 2^R_MAX
    after scaling. Rounded to 4 decimals (the ln branch is the one
    transcendental; see module docstring)."""
    s_total = (s_present + (F.lit(M) - n_regs) * F.lit(1 << R_MAX)).cast("double")
    raw = F.lit(NUM) / s_total
    lin = F.lit(float(M)) * F.log(F.lit(float(M)) / (F.lit(M) - n_regs).cast("double"))
    return F.round(F.when((n_regs < M) & (raw <= SMALL), lin).otherwise(raw), 4)


def estimate_from_registers(regs: DataFrame, group_cols: list[str]) -> DataFrame:
    """(group..., n_regs, approx_distinct) from a sparse register table —
    the readout shared by the batch path and the streaming sink."""
    agg = regs.groupBy(*group_cols).agg(
        F.sum(F.expr(f"shiftleft(1L, cast({R_MAX} - __reg as int))")).alias("__s"),
        F.count(F.lit(1)).alias("n_regs"),
    )
    return agg.select(
        *group_cols, "n_regs", _estimate(F.col("__s"), F.col("n_regs")).alias("approx_distinct")
    )


def hll_distinct_per_group(
    df: DataFrame, value_col: str, group_cols: list[str]
) -> DataFrame:
    """Per-group approximate distinct count (sigma ~ 1.04/sqrt(256) =
    6.5%). Returns group_cols + (n_regs, approx_distinct)."""
    return estimate_from_registers(_registers(df, value_col, group_cols), group_cols)


def hll_oracle_sql(table: str, value_col: str, group_cols: list[str]) -> str:
    """DuckDB twin of hll_distinct_per_group — same integer arithmetic."""
    g = ", ".join(group_cols)
    return f"""
WITH h AS (
  SELECT {g},
         ('0x' || substr(md5(CAST({value_col} AS VARCHAR)), 1, 15))::BIGINT AS h
  FROM {table}
),
b AS (
  SELECT {g}, h % {M} AS b,
         CASE WHEN h >> {P} = 0 THEN {R_MAX}
              ELSE {R_MAX} - length(bin(h >> {P})) END AS rank
  FROM h
),
r AS (SELECT {g}, b, max(rank) AS reg FROM b GROUP BY {g}, b),
a AS (
  SELECT {g},
         SUM(1::BIGINT << ({R_MAX} - reg)) AS s_present,
         COUNT(*) AS n_regs
  FROM r GROUP BY {g}
)
SELECT {g}, CAST(n_regs AS BIGINT) AS n_regs,
       round(CASE WHEN n_regs < {M}
                   AND {NUM!r} / CAST(s_present + ({M} - n_regs) * (1::BIGINT << {R_MAX}) AS DOUBLE) <= {SMALL!r}
                  THEN {float(M)!r} * ln({float(M)!r} / CAST({M} - n_regs AS DOUBLE))
                  ELSE {NUM!r} / CAST(s_present + ({M} - n_regs) * (1::BIGINT << {R_MAX}) AS DOUBLE)
             END, 4) AS approx_distinct
FROM a
"""


def hll_sketch_per_group(
    df: DataFrame, value_col: str, group_cols: list[str]
) -> DataFrame:
    """The sketch STATE: group_cols + ``regs``, a dense 256-int array
    (0 = empty register). This is what ships between nodes or persists
    between stream batches — 256 small ints per group, period."""
    sparse = _registers(df, value_col, group_cols)
    packed = sparse.groupBy(*group_cols).agg(
        F.map_from_entries(F.collect_list(F.struct("__b", "__reg"))).alias("__m")
    )
    dense = F.transform(
        F.sequence(F.lit(0), F.lit(M - 1)),
        lambda i: F.coalesce(F.element_at(F.col("__m"), i), F.lit(0)),
    )
    return packed.select(*group_cols, dense.alias("regs"))


def hll_merge(sketches: DataFrame, merge_cols: list[str]) -> DataFrame:
    """Merge sketches to a coarser grouping (empty = global) by
    element-wise register max — EXACTLY the register file a direct pass
    over the unioned raw data yields (max is associative/commutative/
    idempotent), which is what makes HLL a distributed partial
    aggregate. The fold is over collect_list'd 256-int arrays: state is
    (merge groups x 256) ints, never the raw data."""
    zero = F.array_repeat(F.lit(0), M)
    merged = F.aggregate(
        F.collect_list("regs"),
        zero,
        lambda acc, x: F.zip_with(acc, x, lambda a, b: F.greatest(a, b)),
    ).alias("regs")
    if merge_cols:
        return sketches.groupBy(*merge_cols).agg(merged)
    return sketches.groupBy().agg(merged)


def hll_estimate_from_state(regs: Column) -> Column:
    """Estimate from a dense register array (for merged sketches).

    The fold keeps the harmonic sum integer-exact: pow(2.0, 53-reg) is
    an exact IEEE double for integer exponents 0..52 (its result is a
    representable power of two), so the long cast and the long addition
    lose nothing — bit-identical to the sparse-path BIGINT sum."""
    present = F.filter(regs, lambda r: r > 0)
    n_regs = F.size(present)
    s_present = F.aggregate(
        present,
        F.lit(0).cast("long"),
        lambda acc, r: acc
        + F.pow(F.lit(2.0), (F.lit(R_MAX) - r).cast("double")).cast("long"),
    )
    return _estimate(s_present, n_regs)
