"""Count-min sketch: frequency estimation / heavy hitters in bounded
memory, deterministic across engines.

The sketch is a d x w grid of counters (here 4 x 512 = 2048 longs —
16 KiB regardless of stream size). Build: every key increments one
counter per row, chosen by that row's salted md5 hash — in Spark this
is a 4-way explode followed by a map-side-combinable count, so the
shuffle carries at most d*w cells per partition, never the keys.
Estimate for a key: MIN over its d counters — always >= the true count
(one-sided error; overshoot only from collisions, P ~ (n_keys/w)^d).

Everything is integer arithmetic on md5-derived hashes, so Spark and
the DuckDB oracle agree bit-for-bit (same convention as the KMV/HLL
sketches). Cormode & Muthukrishnan 2005.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

D = 4  # hash rows
W = 512  # counters per row


def _row_hash(key: Column, i: int) -> Column:
    """Row i's counter index for ``key``: salted 60-bit md5 mod w —
    operators/sketch.hash60 (the shared cross-engine hash convention).
    DuckDB twin: ('0x'||substr(md5('i:' || CAST(k AS VARCHAR)),1,15))::BIGINT % w."""
    from geo_db_spark.operators.sketch import hash60

    return hash60(F.concat(F.lit(f"{i}:"), key.cast("string"))) % W


def cms_build(df: DataFrame, key_col: str) -> DataFrame:
    """Sketch state as sparse counter cells (i, b, cnt) — at most d*w
    rows however large the input. Mergeable: cells from disjoint shards
    ADD (sum is the algebraic merge; see cms_merge)."""
    k = F.col(key_col)
    cells = df.select(
        F.explode(
            F.array(*[F.struct(F.lit(i).alias("i"), _row_hash(k, i).alias("b")) for i in range(D)])
        ).alias("c")
    )
    return cells.groupBy(F.col("c.i").alias("i"), F.col("c.b").alias("b")).agg(
        F.count(F.lit(1)).alias("cnt")
    )


def cms_sketch_per_group(df: DataFrame, key_col: str, group_cols: list[str]) -> DataFrame:
    """One CMS shard per group (group_cols..., i, b, cnt) — the
    partial-sketch form for shard-then-merge pipelines, API twin of
    hll_sketch_per_group. cms_merge over the shards is cell-identical
    to a single cms_build over the concatenated input (counters are an
    algebraic sum)."""
    k = F.col(key_col)
    cells = df.select(
        *group_cols,
        F.explode(
            F.array(*[F.struct(F.lit(i).alias("i"), _row_hash(k, i).alias("b")) for i in range(D)])
        ).alias("c"),
    )
    return cells.groupBy(
        *group_cols, F.col("c.i").alias("i"), F.col("c.b").alias("b")
    ).agg(F.count(F.lit(1)).alias("cnt"))


def cms_merge(sketches: DataFrame) -> DataFrame:
    """Merge sketch shards: counters add cell-wise — exactly the sketch
    a single pass over the concatenated streams would build."""
    return sketches.groupBy("i", "b").agg(F.sum("cnt").alias("cnt"))


def cms_estimate(cms: DataFrame, keys: DataFrame, key_col: str) -> DataFrame:
    """Estimated count per key: min over the key's d counters.

    The sketch is <= d*w rows — broadcast it; the probe explodes each
    key to its d cells and the join never shuffles the key set."""
    k = F.col(key_col)
    probes = keys.select(
        key_col,
        F.explode(
            F.array(*[F.struct(F.lit(i).alias("i"), _row_hash(k, i).alias("b")) for i in range(D)])
        ).alias("c"),
    ).select(key_col, F.col("c.i").alias("i"), F.col("c.b").alias("b"))
    joined = probes.join(F.broadcast(cms), ["i", "b"])
    return joined.groupBy(key_col).agg(F.min("cnt").alias("est_count"))


def cms_oracle_sql(table: str, key_col: str, threshold: int) -> str:
    """DuckDB twin of build + estimate + heavy-hitter filter."""
    rows = " UNION ALL ".join(
        f"SELECT {i} AS i, ('0x' || substr(md5('{i}:' || CAST({key_col} AS VARCHAR)), 1, 15))::BIGINT % {W} AS b FROM {table}"
        for i in range(D)
    )
    probes = " UNION ALL ".join(
        f"SELECT {key_col}, {i} AS i, ('0x' || substr(md5('{i}:' || CAST({key_col} AS VARCHAR)), 1, 15))::BIGINT % {W} AS b FROM keys"
        for i in range(D)
    )
    return f"""
WITH cells AS ({rows}),
cms AS (SELECT i, b, CAST(COUNT(*) AS BIGINT) AS cnt FROM cells GROUP BY i, b),
keys AS (SELECT DISTINCT {key_col} FROM {table}),
probes AS ({probes}),
est AS (
  SELECT p.{key_col}, MIN(c.cnt) AS est_count
  FROM probes p JOIN cms c USING (i, b)
  GROUP BY p.{key_col}
)
SELECT {key_col}, CAST(est_count AS BIGINT) AS est_count
FROM est WHERE est_count >= {threshold}
"""
