"""Deduplication operators for large-scale training-data pipelines.

None of these exist in the reference (its dedup is PK-conflict-ignore at
the SQLite sink, src/database.rs:101-134, generalized here per the
engine-growth contract). All are pure DataFrame compositions — shuffles
only on the blocking keys, no Python in the hot path.

Determinism: hashes are derived from md5 (same algorithm in Spark and
DuckDB) so results are oracle-checkable bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# 8 hex chars of md5 -> fits int32 range in a BIGINT, same value in DuckDB
# via ('0x' || substr(md5(s),1,8))::BIGINT.
def md5_prefix64(col: Column, nchars: int = 8) -> Column:
    return F.conv(F.substring(F.md5(col.cast("binary")), 1, nchars), 16, 10).cast("long")


def normalize_text(col: Column) -> Column:
    """Canonical form for exact dedup: lowercase, collapse whitespace, trim."""
    return F.trim(F.regexp_replace(F.lower(col), r"\s+", " "))


def exact_dedup(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Exact dedup on normalized text: keep the lowest id per digest.

    Scale: group key is a 32-char digest, not the document body — the
    shuffle moves (digest, id) pairs only, not the payload; survivors are
    recovered by a self-semi-join which AQE plans as a broadcast when the
    survivor set is small.
    """
    digest = F.md5(normalize_text(F.col(text_col)).cast("binary"))
    keyed = df.select(F.col(id_col), digest.alias("digest"))
    winners = keyed.groupBy("digest").agg(F.min(id_col).alias(id_col))
    return winners


def shingles(col: Column, n: int = 3) -> Column:
    """Word n-gram shingle array from raw text (lowercased, whitespace
    tokenized). Used by MinHash / Jaccard dedup."""
    toks = F.split(normalize_text(col), " ")
    idx = F.sequence(F.lit(0), F.greatest(F.size(toks) - n, F.lit(0)))
    return F.array_distinct(
        F.transform(idx, lambda i: F.array_join(F.slice(toks, i + 1, n), " "))
    )
