"""Dedup workload entries over the `documents` table."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from geo_db_spark.io import load
from geo_db_spark.operators.dedup import exact_dedup, normalize_text
from geo_db_spark.session import tune


def dedup_exact_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: one surviving doc_id (the smallest) per normalized-text
    digest. Generalizes the reference's PK-conflict-ignore dedup
    (src/database.rs:101-134; SURVEY.md §2 D10) to content hashing."""
    tune(spark)
    docs = load(spark, sf_dir, "documents")
    return exact_dedup(docs, "text", "doc_id").select("digest", "doc_id")


ORACLE_EXACT = r"""
SELECT md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS digest,
       MIN(doc_id) AS doc_id
FROM documents
GROUP BY 1
"""


def dedup_exact_survivors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The surviving documents themselves (semi-join back to the corpus)."""
    tune(spark)
    docs = load(spark, sf_dir, "documents")
    winners = exact_dedup(docs, "text", "doc_id").select("doc_id")
    return docs.join(winners, "doc_id", "left_semi").select("doc_id", "lang", "source")


ORACLE_SURVIVORS = r"""
SELECT doc_id, lang, source FROM documents
WHERE doc_id IN (
    SELECT MIN(doc_id) FROM documents
    GROUP BY md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g')))
)
"""


QUERIES = {
    "dedup_exact_documents": dedup_exact_documents,
    "dedup_exact_survivors": dedup_exact_survivors,
}

ORACLES = {
    "dedup_exact_documents": ORACLE_EXACT,
    "dedup_exact_survivors": ORACLE_SURVIVORS,
}
