"""Workload entries for the training-pipeline assembly operators
(operators/packing.py): sequence packing, incremental dedup, quantile
quality gate, split assignment — plus the salted-join demonstration from
operators/relational.py surfaced under the oracle gate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from geo_db_spark.io import load
from geo_db_spark.operators.packing import (
    incremental_dedup,
    pack_sequences,
    pack_sequences_split,
    quantile_threshold_filter,
    quantile_threshold_filter_approx,
    split_assign,
)
from geo_db_spark.operators.relational import salted_join
from geo_db_spark.session import tune

PACK_BUDGET = 2048


def pack_sequences_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune(spark)
    docs = load(spark, sf_dir, "documents")
    return pack_sequences(docs, budget=PACK_BUDGET).orderBy("source", "seq_id")


ORACLE_PACK = rf"""
WITH toks AS (
  SELECT source, doc_id,
         len(regexp_split_to_array(trim(text), '\s+')) AS n_tokens
  FROM documents
),
placed AS (
  SELECT source, doc_id, n_tokens,
         COALESCE(SUM(n_tokens) OVER (
           PARTITION BY source ORDER BY doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_before
  FROM toks
)
SELECT source,
       CAST(FLOOR(CAST(cum_before AS DOUBLE) / {PACK_BUDGET}) AS BIGINT) AS seq_id,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS seq_tokens,
       MIN(doc_id) AS first_doc,
       MAX(doc_id) AS last_doc
FROM placed
GROUP BY 1, 2
ORDER BY source, seq_id
"""


def pack_sequences_split_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Splitting-layout packing: every sequence exactly PACK_BUDGET
    tokens except each source's final partial."""
    tune(spark)
    docs = load(spark, sf_dir, "documents")
    return pack_sequences_split(docs, budget=PACK_BUDGET).orderBy("source", "seq_id")


ORACLE_PACK_SPLIT = rf"""
WITH toks AS (
  SELECT source, doc_id,
         CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT) AS n_tokens
  FROM documents
),
placed AS (
  -- CAST: DuckDB's SUM over BIGINT returns HUGEINT, which range() rejects
  SELECT source, doc_id, n_tokens,
         CAST(COALESCE(SUM(n_tokens) OVER (
           PARTITION BY source ORDER BY doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS cum_before
  FROM toks WHERE n_tokens > 0
),
spans AS (
  SELECT source, doc_id, n_tokens, cum_before,
         CAST(unnest(range(cum_before // {PACK_BUDGET},
                           (cum_before + n_tokens - 1) // {PACK_BUDGET} + 1)) AS BIGINT) AS seq_id
  FROM placed
)
SELECT source, seq_id,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(LEAST((seq_id + 1) * {PACK_BUDGET}, cum_before + n_tokens)
                - GREATEST(seq_id * {PACK_BUDGET}, cum_before)) AS BIGINT) AS seq_tokens,
       MIN(doc_id) AS first_doc,
       MAX(doc_id) AS last_doc
FROM spans
GROUP BY 1, 2
ORDER BY source, seq_id
"""


def dedup_incremental_bloom(spark: SparkSession, sf_dir: str) -> DataFrame:
    """New-batch-vs-corpus dedup: docs with doc_id % 5 == 0 are 'the new
    crawl', the rest are 'the existing corpus'."""
    tune(spark)
    docs = load(spark, sf_dir, "documents")
    new = docs.filter(F.col("doc_id") % 5 == 0)
    ref = docs.filter(F.col("doc_id") % 5 != 0)
    return incremental_dedup(new, ref).select("doc_id", "source", "n_chars")


ORACLE_INCREMENTAL = r"""
WITH d AS (
  SELECT doc_id, source, n_chars,
         md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS digest
  FROM documents
)
SELECT n.doc_id, n.source, n.n_chars
FROM d n
WHERE n.doc_id % 5 = 0
  AND NOT EXISTS (
    SELECT 1 FROM d r WHERE r.doc_id % 5 != 0 AND r.digest = n.digest
  )
"""


def text_quantile_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality gate: drop the worst quartile by mean token length
    (chars per whitespace token)."""
    tune(spark)
    docs = load(spark, sf_dir, "documents")
    score = F.col("n_chars").cast("double") / F.size(F.split(F.trim("text"), r"\s+"))
    return quantile_threshold_filter(docs, score, q=0.25).orderBy("doc_id")


ORACLE_QUANTILE = r"""
WITH scored AS (
  SELECT doc_id,
         CAST(ROUND(1000000.0 * n_chars / len(regexp_split_to_array(trim(text), '\s+'))) AS BIGINT) AS score_u
  FROM documents
),
thr AS (SELECT quantile_cont(score_u, 0.25) AS t FROM scored)
SELECT d.*, s.score_u / 1000000.0 AS score
FROM documents d JOIN scored s USING (doc_id), thr
WHERE s.score_u >= t
ORDER BY doc_id
"""


def text_quantile_filter_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 100 TB form of the quality gate: identical plan to
    text_quantile_filter but the threshold comes from the one-pass
    approx_percentile sketch (r5 verdict #2 — the documented at-scale
    swap, now actually exercised under the oracle gate). ``accuracy`` is
    set above the corpus row count at every test SF, where the GK sketch
    is exact-rank and equals DuckDB's ``quantile_disc``; production would
    dial it down to the default 10^4 and accept the bracketed survivor
    set (tests/test_packing.py pins the bracket)."""
    tune(spark)
    docs = load(spark, sf_dir, "documents")
    score = F.col("n_chars").cast("double") / F.size(F.split(F.trim("text"), r"\s+"))
    return quantile_threshold_filter_approx(
        docs, score, q=0.25, accuracy=100_000_000
    ).orderBy("doc_id")


ORACLE_QUANTILE_APPROX = r"""
WITH scored AS (
  SELECT doc_id,
         CAST(ROUND(1000000.0 * n_chars / len(regexp_split_to_array(trim(text), '\s+'))) AS BIGINT) AS score_u
  FROM documents
),
thr AS (SELECT quantile_disc(score_u, 0.25) AS t FROM scored)
SELECT d.*, s.score_u / 1000000.0 AS score
FROM documents d JOIN scored s USING (doc_id), thr
WHERE s.score_u >= t
ORDER BY doc_id
"""


def text_split_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune(spark)
    docs = load(spark, sf_dir, "documents")
    toks = F.size(F.split(F.trim("text"), r"\s+")).cast("long")
    return (
        docs.withColumn("split", split_assign())
        .groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(toks).alias("n_tokens"),
            F.min("doc_id").alias("min_doc"),
            F.max("doc_id").alias("max_doc"),
        )
    )


ORACLE_SPLIT = r"""
WITH assigned AS (
  SELECT doc_id,
         len(regexp_split_to_array(trim(text), '\s+')) AS n_tok,
         ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 100 AS band
  FROM documents
)
SELECT CASE WHEN band < 96 THEN 'train' WHEN band < 98 THEN 'val' ELSE 'test' END AS split,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_tok) AS BIGINT) AS n_tokens,
       MIN(doc_id) AS min_doc,
       MAX(doc_id) AS max_doc
FROM assigned
GROUP BY 1
"""


def ids_stable_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed stable-ID assignment (operators/ids.py): the global
    row_number every training corpus needs for sample addressing,
    computed WITHOUT the single-partition window the naive form plans —
    range exchange + per-partition counts + driver prefix sum + the
    monotonic-id ordinal. The oracle is the naive form itself, so the
    green hash proves the two-phase construction equals it exactly."""
    tune(spark)
    from geo_db_spark.operators.ids import assign_stable_ids

    docs = load(spark, sf_dir, "documents").select("doc_id", "source")
    return assign_stable_ids(docs, ["source", "doc_id"]).select(
        "doc_id", "source", "stable_id"
    )


ORACLE_STABLE_IDS = """
SELECT doc_id, source,
       row_number() OVER (ORDER BY source, doc_id) AS stable_id
FROM documents
"""


def g18_salted_join_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-safe equi-join: events (hot user_ids at production scale) vs
    the customer dimension via salted_join — identical result set to the
    plain join, but each hot key is pre-split across 8 shuffle partitions
    AND the downstream per-(key,salt) partial aggregate de-skews too."""
    tune(spark)
    ev = load(spark, sf_dir, "events").select("user_id", "value")
    cust = load(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("user_id"), "c_mktsegment"
    )
    joined = salted_join(ev, cust, "user_id", n_salts=8, salt_by=["user_id", "value"])
    return joined.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("total_value"),
    )


ORACLE_SALTED = r"""
SELECT c_mktsegment,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
FROM events e
JOIN customer c ON c.c_custkey = e.user_id
GROUP BY 1
"""


QUERIES = {
    "pack_sequences_report": pack_sequences_report,
    "pack_sequences_split": pack_sequences_split_report,
    "dedup_incremental_bloom": dedup_incremental_bloom,
    "text_quantile_filter": text_quantile_filter,
    "text_quantile_filter_approx": text_quantile_filter_approx,
    "text_split_assign": text_split_assign,
    "ids_stable_documents": ids_stable_documents,
    "g18_salted_join_events": g18_salted_join_events,
}

ORACLES = {
    "pack_sequences_report": ORACLE_PACK,
    "pack_sequences_split": ORACLE_PACK_SPLIT,
    "dedup_incremental_bloom": ORACLE_INCREMENTAL,
    "text_quantile_filter": ORACLE_QUANTILE,
    "text_quantile_filter_approx": ORACLE_QUANTILE_APPROX,
    "text_split_assign": ORACLE_SPLIT,
    "ids_stable_documents": ORACLE_STABLE_IDS,
    "g18_salted_join_events": ORACLE_SALTED,
}


def pack_length_bucketed_batches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length-bucketed inference batching (r7): the serving-side prep
    that keeps padding waste bounded — docs fall into power-of-2 token
    buckets (integer CASE chain, no float log2 whose rounding could
    flap the band), each bucket batches floor(256/cap) docs in
    (len desc, id) order, and each batch reports real vs padded token
    counts (pad target = in-batch max). One window per bucket partition
    + one batch aggregate; at 100 TB this is the standard two-shuffle
    shape and the bucket key is never skewed (caps are bounded)."""
    tune(spark)
    from pyspark.sql import Window

    docs = load(spark, sf_dir, "documents")
    n_tok = F.size(F.split(F.trim("text"), r"\s+")).cast("long")
    base = docs.select("doc_id", n_tok.alias("n"))
    cap = F.when(F.col("n") <= 1, 1)
    c = 2
    while c <= 1024:
        cap = cap.when(F.col("n") <= c, c)
        c *= 2
    base = base.withColumn("bucket_cap", cap.otherwise(F.lit(2048)).cast("long"))
    per_batch = F.greatest(F.lit(1), (F.lit(256) / F.col("bucket_cap")).cast("long"))
    w = Window.partitionBy("bucket_cap").orderBy(F.col("n").desc(), F.col("doc_id"))
    assigned = base.withColumn(
        "batch_ix", ((F.row_number().over(w) - 1) / per_batch).cast("long")
    )
    return assigned.groupBy("bucket_cap", "batch_ix").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n").alias("real_tokens"),
        (F.count(F.lit(1)) * F.max("n")).alias("padded_tokens"),
    )


ORACLE_LEN_BATCHES = r"""
WITH base AS (
  SELECT doc_id,
         CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT) AS n
  FROM documents
),
b AS (
  SELECT doc_id, n,
         CAST(CASE WHEN n <= 1 THEN 1 WHEN n <= 2 THEN 2 WHEN n <= 4 THEN 4
              WHEN n <= 8 THEN 8 WHEN n <= 16 THEN 16 WHEN n <= 32 THEN 32
              WHEN n <= 64 THEN 64 WHEN n <= 128 THEN 128 WHEN n <= 256 THEN 256
              WHEN n <= 512 THEN 512 WHEN n <= 1024 THEN 1024 ELSE 2048 END AS BIGINT) AS bucket_cap
  FROM base
),
a AS (
  SELECT doc_id, n, bucket_cap,
         CAST((row_number() OVER (PARTITION BY bucket_cap ORDER BY n DESC, doc_id) - 1)
              // GREATEST(1, 256 // bucket_cap) AS BIGINT) AS batch_ix
  FROM b
)
SELECT bucket_cap, batch_ix,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n) AS BIGINT) AS real_tokens,
       CAST(COUNT(*) * MAX(n) AS BIGINT) AS padded_tokens
FROM a GROUP BY bucket_cap, batch_ix
"""

QUERIES["pack_length_bucketed_batches"] = pack_length_bucketed_batches
ORACLES["pack_length_bucketed_batches"] = ORACLE_LEN_BATCHES


def pack_epoch_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic multi-epoch reshuffling (r7b): every training epoch
    gets its own global document order from a pure function of
    (doc_id, epoch) — md5-derived 64-bit keys, so epoch orders are
    independent permutations yet reproducible across runs, machines and
    partitionings (the property epoch shuffling needs: NO data movement,
    the order is computed, not stored). Sequence numbers come from
    assign_stable_ids over (epoch, key) — the range-exchange global rank,
    never a SinglePartition window; epoch is the leading sort key so one
    ranking pass numbers all epochs, and per-epoch seq = global ordinal
    (epochs are equal-sized blocks of the ordering)."""
    tune(spark)
    from geo_db_spark.operators.dedup import md5_prefix64
    from geo_db_spark.operators.ids import assign_stable_ids

    docs = load(spark, sf_dir, "documents").select("doc_id")
    epochs = spark.range(2).select(F.col("id").cast("long").alias("epoch"))
    keyed = docs.crossJoin(epochs).select(
        "doc_id",
        "epoch",
        md5_prefix64(
            F.concat(F.col("doc_id").cast("string"), F.lit("-e"), F.col("epoch").cast("string"))
        ).alias("shuffle_key"),
    )
    return assign_stable_ids(
        keyed, ["epoch", "shuffle_key", "doc_id"], id_name="ord"
    ).select("epoch", "doc_id", "shuffle_key", "ord")


ORACLE_EPOCH_SHUFFLE = """
WITH keyed AS (
  SELECT d.doc_id, e.epoch,
         ('0x' || substr(md5(CAST(d.doc_id AS VARCHAR) || '-e' || CAST(e.epoch AS VARCHAR)), 1, 8))::BIGINT AS shuffle_key
  FROM documents d CROSS JOIN (SELECT 0 AS epoch UNION ALL SELECT 1) e
)
SELECT epoch, doc_id, shuffle_key,
       CAST(row_number() OVER (ORDER BY epoch, shuffle_key, doc_id) AS BIGINT) AS ord
FROM keyed
"""

QUERIES["pack_epoch_shuffle"] = pack_epoch_shuffle
ORACLES["pack_epoch_shuffle"] = ORACLE_EPOCH_SHUFFLE
