"""Corpus-curation workload entries: Gopher repetition signals, C4 filter
flags, exact duplicate-span detection, and per-source quality rollup —
the public quality-filter families of large LLM corpus builds, over the
`documents` table. Core expressions live in operators/curation.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from geo_db_spark.io import load
from geo_db_spark.operators.curation import (
    c4_filter_flags,
    dup_span_removal,
    dup_spans,
    gopher_repetition,
)
from geo_db_spark.session import tune
from geo_db_spark.workload.dedup import SA_SLICE as _SA_SLICE
from geo_db_spark.workload.dedup import SA_T as _SA_T


def text_gopher_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune(spark)
    docs = load(spark, sf_dir, "documents")
    return gopher_repetition(docs).withColumn(
        "n_tokens", F.col("n_tokens").cast("bigint")
    )


ORACLE_GOPHER = r"""
WITH toks AS (
  SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS t FROM documents
),
ex AS (
  SELECT doc_id, t, unnest(generate_series(1, len(t))) AS i FROM toks
),
grams AS (
  SELECT doc_id, t[i] AS w1,
         CASE WHEN i+1 <= len(t) THEN t[i] || ' ' || t[i+1] END AS g2,
         CASE WHEN i+2 <= len(t) THEN t[i] || ' ' || t[i+1] || ' ' || t[i+2] END AS g3
  FROM ex
),
wc AS (SELECT doc_id, w1, count(*) AS c FROM grams GROUP BY 1, 2),
wa AS (SELECT doc_id, max(c) AS mx, sum(c) AS n, count(*) AS d FROM wc GROUP BY 1),
g2c AS (SELECT doc_id, g2, count(*) AS c FROM grams WHERE g2 IS NOT NULL GROUP BY 1, 2),
g2a AS (SELECT doc_id, max(c) AS mx, sum(c) AS n FROM g2c GROUP BY 1),
g3c AS (SELECT doc_id, g3, count(*) AS c FROM grams WHERE g3 IS NOT NULL GROUP BY 1, 2),
g3a AS (SELECT doc_id, max(c) AS mx, sum(c) AS n FROM g3c GROUP BY 1)
SELECT wa.doc_id,
       CAST(wa.n AS BIGINT) AS n_tokens,
       CAST(wa.mx AS DOUBLE) / wa.n AS top_word_frac,
       1.0 - CAST(wa.d AS DOUBLE) / wa.n AS dup_word_frac,
       COALESCE(CAST(g2a.mx AS DOUBLE) / g2a.n, 0.0) AS top_2gram_frac,
       COALESCE(CAST(g3a.mx AS DOUBLE) / g3a.n, 0.0) AS top_3gram_frac
FROM wa LEFT JOIN g2a USING (doc_id) LEFT JOIN g3a USING (doc_id)
"""


def text_c4_filters(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune(spark)
    docs = load(spark, sf_dir, "documents")
    return c4_filter_flags(docs)


ORACLE_C4 = r"""
WITH base AS (
  SELECT doc_id,
         len(regexp_split_to_array(trim(text), '\s+')) AS n_tok,
         length(regexp_replace(text, '\s', '', 'g')) AS n_word_chars,
         regexp_matches(text, '[.!?]\s*$') AS term_punct,
         contains(text, '{') AS curly,
         (contains(lower(text), 'lorem ipsum') OR contains(lower(text), 'javascript')
          OR contains(lower(text), 'terms of use') OR contains(lower(text), 'cookie policy')) AS boiler
  FROM documents
),
calc AS (
  SELECT doc_id, n_tok,
         CAST(n_word_chars AS DOUBLE) / n_tok AS mean_wlen,
         (n_tok < 30) AS too_short, term_punct, curly, boiler
  FROM base
)
SELECT doc_id,
       CAST(n_tok AS INT) AS n_tokens,
       mean_wlen AS mean_word_len,
       CAST(too_short AS INT) AS f_too_short,
       CAST((mean_wlen < 3.0 OR mean_wlen > 10.0) AS INT) AS f_bad_word_len,
       CAST(NOT term_punct AS INT) AS f_no_terminal_punct,
       CAST(curly AS INT) AS f_has_curly,
       CAST(boiler AS INT) AS f_boilerplate,
       CAST(NOT (too_short OR (mean_wlen < 3.0 OR mean_wlen > 10.0) OR curly OR boiler) AS INT) AS keep
FROM calc
"""


def text_dup_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune(spark)
    docs = load(spark, sf_dir, "documents")
    return dup_spans(docs, k=8)


ORACLE_DUP_SPANS = r"""
WITH toks AS (
  SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS t FROM documents
),
ex AS (
  SELECT doc_id, t, unnest(generate_series(1, len(t) - 7)) AS i FROM toks
),
win AS (
  SELECT doc_id, i AS pos, array_to_string(t[i:i+7], ' ') AS w FROM ex
),
duph AS (
  SELECT w FROM win GROUP BY w HAVING count(DISTINCT doc_id) >= 2
),
fl AS (
  SELECT doc_id, pos FROM win WHERE w IN (SELECT w FROM duph)
),
runs AS (
  SELECT doc_id, pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS grp
  FROM fl
),
rl AS (SELECT doc_id, grp, count(*) AS run FROM runs GROUP BY 1, 2),
agg AS (
  SELECT doc_id, max(run) AS max_dup_run, sum(run) AS n_dup_windows
  FROM rl GROUP BY 1
)
SELECT toks.doc_id,
       CAST(greatest(len(t) - 7, 0) AS INT) AS n_windows,
       CAST(COALESCE(n_dup_windows, 0) AS BIGINT) AS n_dup_windows,
       CAST(COALESCE(max_dup_run, 0) AS BIGINT) AS max_dup_run
FROM toks LEFT JOIN agg USING (doc_id)
"""


def text_dup_span_removal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate-span EXCISION (operators/curation.dup_span_removal):
    tokens covered by any cross-document duplicate 8-window are removed
    and the surviving text is rebuilt; the oracle hashes the rebuilt
    text itself, so the value check proves the excision geometry, not
    just counts."""
    tune(spark)
    docs = load(spark, sf_dir, "documents")
    return dup_span_removal(docs, k=8)


ORACLE_DUP_SPAN_REMOVAL = r"""
WITH toks AS (
  SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS t FROM documents
),
tok AS (
  SELECT doc_id, unnest(generate_series(1, len(t))) AS pos, t FROM toks
),
ex AS (
  SELECT doc_id, t, unnest(generate_series(1, len(t) - 7)) AS i FROM toks
),
win AS (
  SELECT doc_id, i AS pos, array_to_string(t[i:i+7], ' ') AS w FROM ex
),
duph AS (
  SELECT w FROM win GROUP BY w HAVING count(DISTINCT doc_id) >= 2
),
fl AS (
  SELECT doc_id, pos FROM win WHERE w IN (SELECT w FROM duph)
),
marked AS (
  SELECT tok.doc_id, tok.pos, tok.t[tok.pos] AS w0,
         fl.pos IS NOT NULL AS is_start
  FROM tok LEFT JOIN fl ON fl.doc_id = tok.doc_id AND fl.pos = tok.pos
),
cov AS (
  SELECT doc_id, pos, w0,
         max(CASE WHEN is_start THEN pos END) OVER (
           PARTITION BY doc_id ORDER BY pos
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS lastst
  FROM marked
),
kept AS (
  SELECT doc_id, count(*) AS n_kept,
         string_agg(w0, ' ' ORDER BY pos) AS kept_text
  FROM cov
  WHERE lastst IS NULL OR pos - lastst > 7
  GROUP BY doc_id
)
SELECT toks.doc_id,
       CAST(len(t) AS BIGINT) AS n_tokens,
       CAST(COALESCE(n_kept, 0) AS BIGINT) AS n_kept,
       CASE WHEN len(t) > 0
            THEN CAST(COALESCE(n_kept, 0) AS DOUBLE) / len(t)
            ELSE 0.0 END AS kept_frac,
       md5(COALESCE(kept_text, '')) AS kept_md5
FROM toks LEFT JOIN kept USING (doc_id)
"""


def source_quality_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source curation rollup: doc count, language spread, exact-dup
    rate (1 - distinct md5 / n), char-weighted alpha ratio, and a keep
    decision. The alpha ratio divides two exact integer sums (one IEEE
    division — oracle-stable, no float accumulation order issues).

    Scale: one groupBy(source) with map-side partial aggregation; the text
    payload reduces to md5 + two ints before the shuffle.
    """
    tune(spark)
    docs = load(spark, sf_dir, "documents")
    t = F.col("text")
    per = docs.select(
        "source",
        "lang",
        F.md5(t.cast("binary")).alias("digest"),
        F.length(F.regexp_replace(t, r"[^a-zA-Z]", "")).alias("n_alpha"),
        F.length(t).alias("n_chars"),
    )
    agg = per.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.count_distinct("lang").alias("n_langs"),
        F.count_distinct("digest").alias("n_unique"),
        F.sum("n_alpha").alias("s_alpha"),
        F.sum("n_chars").alias("s_chars"),
    )
    dup_rate = F.lit(1.0) - F.col("n_unique").cast("double") / F.col("n_docs")
    mean_alpha = F.col("s_alpha").cast("double") / F.col("s_chars")
    return agg.select(
        "source",
        F.col("n_docs").cast("bigint").alias("n_docs"),
        F.col("n_langs").cast("bigint").alias("n_langs"),
        dup_rate.alias("dup_rate"),
        mean_alpha.alias("mean_alpha"),
        ((dup_rate <= 0.2) & (F.col("n_docs") >= 10)).cast("int").alias("keep"),
    )


ORACLE_SOURCE_ROLLUP = r"""
WITH per AS (
  SELECT source, lang, md5(text) AS digest,
         length(regexp_replace(text, '[^a-zA-Z]', '', 'g')) AS n_alpha,
         length(text) AS n_chars
  FROM documents
),
agg AS (
  SELECT source,
         count(*) AS n_docs,
         count(DISTINCT lang) AS n_langs,
         count(DISTINCT digest) AS n_unique,
         sum(n_alpha) AS s_alpha,
         sum(n_chars) AS s_chars
  FROM per GROUP BY 1
)
SELECT source,
       CAST(n_docs AS BIGINT) AS n_docs,
       CAST(n_langs AS BIGINT) AS n_langs,
       1.0 - CAST(n_unique AS DOUBLE) / n_docs AS dup_rate,
       CAST(s_alpha AS DOUBLE) / s_chars AS mean_alpha,
       CAST((1.0 - CAST(n_unique AS DOUBLE) / n_docs) <= 0.2 AND n_docs >= 10 AS INT) AS keep
FROM agg
"""


QUERIES = {
    "text_gopher_repetition": text_gopher_repetition,
    "text_c4_filters": text_c4_filters,
    "text_dup_spans": text_dup_spans,
    "text_dup_span_removal": text_dup_span_removal,
    "source_quality_rollup": source_quality_rollup,
}

ORACLES = {
    "text_gopher_repetition": ORACLE_GOPHER,
    "text_c4_filters": ORACLE_C4,
    "text_dup_spans": ORACLE_DUP_SPANS,
    "text_dup_span_removal": ORACLE_DUP_SPAN_REMOVAL,
    "source_quality_rollup": ORACLE_SOURCE_ROLLUP,
}


def corpus_mixture_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mixture statistics for training-data sampling: per (source, lang)
    bucket, document/token counts and the bucket's token share of the
    corpus — the numbers a sampler turns into per-bucket rates. The share
    is one IEEE division of two exact BIGINT token sums (oracle-stable;
    no pow()-style library-dependent math).

    Scale: token counts are a map-only expression; one groupBy on the
    (source, lang) pair with map-side partial agg, plus a broadcast-sized
    single-row total joined back. Never shuffles text payload.
    """
    tune(spark)
    from geo_db_spark.operators.text import token_count

    docs = load(spark, sf_dir, "documents")
    per = docs.select(
        "source", "lang", token_count(F.col("text")).cast("bigint").alias("n_tok")
    )
    agg = per.groupBy("source", "lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tok").alias("n_tokens"),
    )
    total = agg.agg(F.sum("n_tokens").alias("_tot"))
    return (
        agg.crossJoin(F.broadcast(total))
        .select(
            "source",
            "lang",
            F.col("n_docs").cast("bigint").alias("n_docs"),
            F.col("n_tokens").cast("bigint").alias("n_tokens"),
            (F.col("n_tokens").cast("double") / F.col("_tot")).alias("token_share"),
        )
    )


ORACLE_MIXTURE = r"""
WITH per AS (
  SELECT source, lang,
         CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT) AS n_tok
  FROM documents
),
agg AS (
  SELECT source, lang, count(*) AS n_docs, sum(n_tok) AS n_tokens
  FROM per GROUP BY 1, 2
),
tot AS (SELECT sum(n_tokens) AS t FROM agg)
SELECT source, lang,
       CAST(n_docs AS BIGINT) AS n_docs,
       CAST(n_tokens AS BIGINT) AS n_tokens,
       CAST(n_tokens AS DOUBLE) / CAST(t AS BIGINT) AS token_share
FROM agg, tot
"""

QUERIES["corpus_mixture_weights"] = corpus_mixture_weights
ORACLES["corpus_mixture_weights"] = ORACLE_MIXTURE


OOV_VOCAB_SIZE = 20


def text_oov_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Out-of-vocabulary rate per document against the corpus's top-V
    tokens (count desc, token asc tiebreak) — the cheap lexical
    familiarity proxy used in place of an LM perplexity score (log-prob
    math is libm-dependent and would not hash-match across engines; an
    integer OOV count divided once does).

    Scale: one explode for global token counts (map-side partial agg),
    the V-row vocab broadcasts, and the per-doc pass is one more explode +
    groupBy(doc_id). The global top-V sort runs on the aggregated token
    table (vocabulary-sized, not corpus-sized)."""
    tune(spark)
    docs = load(spark, sf_dir, "documents")
    toks = F.split(F.trim(F.col("text")), r"\s+")
    ex = docs.select("doc_id", F.explode(toks).alias("w"))
    vocab = (
        ex.groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
        .orderBy(F.col("c").desc(), "w")
        .limit(OOV_VOCAB_SIZE)
        .select("w", F.lit(1).alias("_in"))
    )
    return (
        ex.join(F.broadcast(vocab), "w", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum(F.when(F.col("_in").isNull(), 1).otherwise(0)).alias("n_oov"),
        )
        .select(
            "doc_id",
            F.col("n_tokens").cast("bigint").alias("n_tokens"),
            F.col("n_oov").cast("bigint").alias("n_oov"),
            (F.col("n_oov").cast("double") / F.col("n_tokens")).alias("oov_rate"),
        )
    )


ORACLE_OOV = r"""
WITH ex AS (
  SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\s+')) AS w
  FROM documents
),
cnt AS (SELECT w, count(*) AS c FROM ex GROUP BY 1),
vocab AS (SELECT w FROM cnt ORDER BY c DESC, w LIMIT 20)
SELECT doc_id,
       CAST(count(*) AS BIGINT) AS n_tokens,
       CAST(SUM(CASE WHEN w IN (SELECT w FROM vocab) THEN 0 ELSE 1 END) AS BIGINT) AS n_oov,
       CAST(SUM(CASE WHEN w IN (SELECT w FROM vocab) THEN 0 ELSE 1 END) AS DOUBLE) / count(*) AS oov_rate
FROM ex GROUP BY doc_id
"""

QUERIES["text_oov_rate"] = text_oov_rate
ORACLES["text_oov_rate"] = ORACLE_OOV


STRATA_K = 20


def text_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-decile stratified sample: score every document (mean token
    length in integer micro-units), cut the corpus into 10 strata at the
    exact 10..90 percentiles, and keep a deterministic K per stratum
    (ordered by content hash, then id) — the standard recipe for an
    eval/holdout set that spans the quality distribution instead of
    oversampling the bulk.

    Scale shape: the cutpoints are ONE 9-double row (exact `percentile`
    here for the oracle; `approx_percentile` at 100 TB — same plan
    otherwise) broadcast to every executor; stratum assignment is a 9-
    element comparison fold, no join. The per-stratum top-K window does
    partition by stratum (10 partitions) — at real scale prefilter each
    stratum by a hash threshold (the text_sample_deterministic trick)
    to ~4K candidates first and run the window on the survivors."""
    tune(spark)
    docs = load(spark, sf_dir, "documents")
    from pyspark.sql import Window

    score_u = F.round(
        F.lit(1_000_000.0) * F.col("n_chars") / F.size(F.split(F.trim("text"), r"\s+"))
    ).cast("long")
    scored = docs.select("doc_id", score_u.alias("score_u"))
    qs = ", ".join(str(q / 10) for q in range(1, 10))
    cuts = scored.agg(F.expr(f"percentile(score_u, array({qs}))").alias("cs"))
    strat = scored.crossJoin(F.broadcast(cuts)).select(
        "doc_id",
        "score_u",
        F.aggregate(
            "cs",
            F.lit(0),
            lambda acc, c: acc + F.when(F.col("score_u") > c, 1).otherwise(0),
        ).alias("stratum"),
    )
    h = F.conv(
        F.substring(F.md5(F.col("doc_id").cast("string").cast("binary")), 1, 15), 16, 10
    ).cast("long")
    w = Window.partitionBy("stratum").orderBy(h.asc(), F.col("doc_id").asc())
    return (
        strat.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= STRATA_K)
        .select("doc_id", "stratum", (F.col("score_u") / 1_000_000.0).alias("score"))
    )


ORACLE_STRATIFIED = r"""
WITH scored AS (
  SELECT doc_id,
         CAST(ROUND(1000000.0 * n_chars / len(regexp_split_to_array(trim(text), '\s+'))) AS BIGINT) AS score_u
  FROM documents
),
cuts AS (
  SELECT quantile_cont(score_u, [0.1,0.2,0.3,0.4,0.5,0.6,0.7,0.8,0.9]) AS cs FROM scored
),
strat AS (
  SELECT doc_id, score_u,
         len(list_filter(cs, c -> score_u > c)) AS stratum
  FROM scored, cuts
),
ranked AS (
  SELECT doc_id, score_u, stratum,
         row_number() OVER (
           PARTITION BY stratum
           ORDER BY ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT, doc_id
         ) AS rn
  FROM strat
)
SELECT doc_id, CAST(stratum AS INT) AS stratum, score_u / 1000000.0 AS score
FROM ranked WHERE rn <= 20
"""

QUERIES["text_stratified_sample"] = text_stratified_sample
ORACLES["text_stratified_sample"] = ORACLE_STRATIFIED


def text_stratified_sample_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """text_stratified_sample with the PRODUCTION cutpoint path the exact
    version's docstring names for 100 TB (r5 verdict #2): the nine decile
    cutpoints come from one ``approx_percentile`` sketch pass — partial
    GK sketches per partition, merged, never a SinglePartition of the
    scores. ``accuracy`` is above the corpus size at every test SF, where
    the sketch is exact-rank and equals DuckDB ``quantile_disc`` (the
    discrete-element quantile — the approx sketch always answers with a
    real element, unlike ``percentile``'s interpolation), so the full
    result sits under the value-hash oracle; production dials accuracy
    down to ~10^4 and strata boundaries move by <= n/accuracy ranks."""
    tune(spark)
    docs = load(spark, sf_dir, "documents")
    from pyspark.sql import Window

    score_u = F.round(
        F.lit(1_000_000.0) * F.col("n_chars") / F.size(F.split(F.trim("text"), r"\s+"))
    ).cast("long")
    scored = docs.select("doc_id", score_u.alias("score_u"))
    qs = ", ".join(str(q / 10) for q in range(1, 10))
    cuts = scored.agg(
        F.expr(f"approx_percentile(score_u, array({qs}), 100000000)").alias("cs")
    )
    strat = scored.crossJoin(F.broadcast(cuts)).select(
        "doc_id",
        "score_u",
        F.aggregate(
            "cs",
            F.lit(0),
            lambda acc, c: acc + F.when(F.col("score_u") > c, 1).otherwise(0),
        ).alias("stratum"),
    )
    h = F.conv(
        F.substring(F.md5(F.col("doc_id").cast("string").cast("binary")), 1, 15), 16, 10
    ).cast("long")
    w = Window.partitionBy("stratum").orderBy(h.asc(), F.col("doc_id").asc())
    return (
        strat.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= STRATA_K)
        .select("doc_id", "stratum", (F.col("score_u") / 1_000_000.0).alias("score"))
    )


ORACLE_STRATIFIED_APPROX = r"""
WITH scored AS (
  SELECT doc_id,
         CAST(ROUND(1000000.0 * n_chars / len(regexp_split_to_array(trim(text), '\s+'))) AS BIGINT) AS score_u
  FROM documents
),
cuts AS (
  SELECT quantile_disc(score_u, [0.1,0.2,0.3,0.4,0.5,0.6,0.7,0.8,0.9]) AS cs FROM scored
),
strat AS (
  SELECT doc_id, score_u,
         len(list_filter(cs, c -> score_u > c)) AS stratum
  FROM scored, cuts
),
ranked AS (
  SELECT doc_id, score_u, stratum,
         row_number() OVER (
           PARTITION BY stratum
           ORDER BY ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT, doc_id
         ) AS rn
  FROM strat
)
SELECT doc_id, CAST(stratum AS INT) AS stratum, score_u / 1000000.0 AS score
FROM ranked WHERE rn <= 20
"""

QUERIES["text_stratified_sample_approx"] = text_stratified_sample_approx
ORACLES["text_stratified_sample_approx"] = ORACLE_STRATIFIED_APPROX


def corpus_build_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The CAPSTONE composition (r7b; substring stage r11): the full
    training-corpus build as ONE oracle-gated artifact — exact dedup
    (normalized-digest min-id survivors) -> EXACT substring dedup
    (per-SA-run keep-earliest over the 256-char slices, r12 run-based
    rule — the Lee et al. ACL'22 order: substring dedup after exact,
    before quality) ->
    C4 keep gate -> deterministic md5 train/val/test split ->
    token-balanced shard assignment via the distributed prefix sum,
    per split. A user of this engine runs exactly this chain; gating
    the COMPOSITION catches stage-interface bugs (a gate reordering, a
    survivor set leaking dropped docs into the prefix sum) that
    per-stage oracles cannot.

    Every stage is the already-verified operator — exact dedup adds the
    digest window, the substring stage the suffix-array build its
    standalone twins pay (operators/suffix.py, one shared suffix_ranks
    -> sa_adjacent_pairs -> substring_dup_losers), C4/split are
    map-only and fuse into the scan; only skinny frames shuffle after.
    Per-stage row counts ride along as free Observations
    (corpus_exact_kept / corpus_substring_kept — the A10 telemetry
    pattern, zero extra scans), read by the pytest composition gate."""
    tune(spark)
    from pyspark.sql import Observation

    from geo_db_spark.operators.curation import (
        C4_BOILERPLATE,
        C4_MEAN_WORD_LEN_MAX,
        C4_MEAN_WORD_LEN_MIN,
        C4_MIN_TOKENS,
    )
    from geo_db_spark.operators.dedup import normalize_text
    from geo_db_spark.operators.packing import _cum_token_positions, split_assign
    from geo_db_spark.operators.suffix import (
        sa_adjacent_pairs,
        substring_dup_losers,
        suffix_ranks,
    )

    docs = load(spark, sf_dir, "documents")
    # ONE scan computes every per-row signal (digest, C4 keep, split) —
    # the naive operator-by-operator composition re-scanned the parquet
    # 8 times (plan_stats-measured); at 100 TB the text scan IS the
    # cost, so the stages share ONE projection (keep flag inlined from the C4 constants) and only the dedup window
    # + the prefix-sum exchanges remain (their inputs are skinny).
    t = F.col("text")
    n_tok = F.size(F.split(F.trim(t), r"\s+"))
    mean_wlen = F.length(F.regexp_replace(t, r"\s", "")).cast("double") / n_tok
    boiler = F.lit(False)
    for marker in C4_BOILERPLATE:
        boiler = boiler | F.lower(t).contains(marker)
    keep = ~(
        (n_tok < C4_MIN_TOKENS)
        | (mean_wlen < C4_MEAN_WORD_LEN_MIN)
        | (mean_wlen > C4_MEAN_WORD_LEN_MAX)
        | t.contains("{")
        | boiler
    )
    base = docs.select(
        "doc_id",
        "text",
        keep.cast("int").alias("keep"),
        F.md5(normalize_text(t).cast("binary")).alias("__digest"),
        split_assign().alias("__split"),
    )
    w_min = Window.partitionBy("__digest")
    exact_kept = base.withColumn("__min_id", F.min("doc_id").over(w_min)).filter(
        F.col("doc_id") == F.col("__min_id")
    )
    obs_exact = Observation("corpus_exact_kept")
    exact_kept = exact_kept.observe(obs_exact, F.count(F.lit(1)).alias("n"))
    # the suffix build consumes exact_kept THREE ways (ranks, grams,
    # loser anti-join) and checkpoints internally — checkpoint the
    # survivor frame once so the scan + digest window run once
    exact_kept = exact_kept.localCheckpoint(eager=True)
    sliced = exact_kept.select(
        "doc_id", F.substring("text", 1, _SA_SLICE).alias("t")
    )
    ranks = suffix_ranks(
        sliced, id_col="doc_id", text_col="t",
        slice_len=_SA_SLICE, k0=64, min_tail=_SA_T,  # k0=64: 1 quadrupling round (r13)
    )
    losers = substring_dup_losers(sa_adjacent_pairs(sliced, ranks, _SA_T))
    obs_sub = Observation("corpus_substring_kept")
    sub_kept = (
        exact_kept.join(losers, "doc_id", "left_anti")
        .observe(obs_sub, F.count(F.lit(1)).alias("n"))
    )
    gated = sub_kept.filter(F.col("keep") == 1).select(
        "doc_id", "text", "__split"
    )
    pos = _cum_token_positions(gated, "__split", "doc_id", "text", 4096)
    out = pos.select(
        F.col("id").alias("doc_id"),
        F.col("source").alias("split"),
        F.col("n_tokens"),
        F.floor(F.col("cum_before") / F.lit(2000)).alias("shard"),
    )
    out._corpus_observations = {"exact": obs_exact, "substring": obs_sub}
    return out


_SPLIT_CASE_C = (
    "CASE WHEN ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 100 < 96 "
    "THEN 'train' WHEN ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 100 < 98 "
    "THEN 'val' ELSE 'test' END"
)

ORACLE_CORPUS_BUILD = rf"""
WITH surv AS (
  SELECT MIN(doc_id) AS doc_id
  FROM documents
  GROUP BY md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g')))
),
exact_kept AS (
  SELECT d.doc_id, d.text FROM documents d JOIN surv USING (doc_id)
),
-- substring-dedup stage (r11, run-based r12): brute-force suffix sort
-- over the {_SA_SLICE}-char slices of the exact survivors; segment the
-- SA into maximal runs of adjacent suffixes sharing >= {_SA_T} chars
-- and drop every doc in a run except the run's minimum doc_id
-- (keep-earliest; so no two SURVIVING docs share a qualifying
-- substring — the r11 per-pair greedy could keep several)
sl AS MATERIALIZED (
  SELECT doc_id, substr(text, 1, {_SA_SLICE}) AS t FROM exact_kept
),
suf AS MATERIALIZED (
  SELECT doc_id, CAST(pos AS BIGINT) AS pos,
         substr(t, CAST(pos AS INT)) AS suffix,
         substr(t, CAST(pos AS INT), {_SA_T}) AS g
  FROM (SELECT doc_id, t, unnest(range(1, length(t) - {_SA_T - 1} + 1)) AS pos
        FROM sl WHERE length(t) >= {_SA_T})
),
rk AS MATERIALIZED (
  SELECT doc_id, pos, g,
         row_number() OVER (ORDER BY suffix, doc_id, pos) AS rk
  FROM suf
),
subpairs AS MATERIALIZED (
  SELECT a.rk AS rank_lo, a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM rk a JOIN rk b ON b.rk = a.rk + 1 AND a.g = b.g
),
subruns AS (
  SELECT *, rank_lo - row_number() OVER (ORDER BY rank_lo) AS run_id
  FROM subpairs
),
submemb AS (
  SELECT DISTINCT run_id, doc_id FROM (
    SELECT run_id, doc_a AS doc_id FROM subruns
    UNION ALL SELECT run_id, doc_b FROM subruns)
),
sublosers AS MATERIALIZED (
  SELECT DISTINCT doc_id FROM (
    SELECT doc_id, MIN(doc_id) OVER (PARTITION BY run_id) AS mn
    FROM submemb)
  WHERE doc_id <> mn
),
kept AS (
  SELECT * FROM exact_kept
  WHERE doc_id NOT IN (SELECT doc_id FROM sublosers)
),
c4 AS (
  SELECT doc_id,
         len(regexp_split_to_array(trim(text), '\s+')) AS n_tok,
         CAST(length(regexp_replace(text, '\s', '', 'g')) AS DOUBLE)
           / len(regexp_split_to_array(trim(text), '\s+')) AS mean_wlen,
         contains(text, '{{') AS curly,
         (contains(lower(text), 'lorem ipsum') OR contains(lower(text), 'javascript')
          OR contains(lower(text), 'terms of use') OR contains(lower(text), 'cookie policy')) AS boiler
  FROM kept
),
gated AS (
  SELECT k.doc_id, k.text, c.n_tok
  FROM kept k JOIN c4 c USING (doc_id)
  WHERE NOT (c.n_tok < 30 OR c.mean_wlen < 3.0 OR c.mean_wlen > 10.0 OR c.curly OR c.boiler)
),
placed AS (
  SELECT doc_id, {_SPLIT_CASE_C} AS split, CAST(n_tok AS BIGINT) AS n_tokens
  FROM gated
)
SELECT doc_id, split, n_tokens,
       CAST(FLOOR(COALESCE(SUM(n_tokens) OVER (
         PARTITION BY split ORDER BY doc_id
         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) / 2000.0) AS BIGINT) AS shard
FROM placed
"""

QUERIES["corpus_build_pipeline"] = corpus_build_pipeline
ORACLES["corpus_build_pipeline"] = ORACLE_CORPUS_BUILD


def corpus_build_pipeline_excise(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The capstone in EXCISE mode (r12; r11 verdict Next #4): exact
    dedup -> exact substring EXCISION (duplicated spans cut from the
    256-char slice and the text REWRITTEN, tail preserved — the Lee et
    al. ACL'22 span-removal semantics the drop-mode capstone
    approximates at doc level) -> C4 keep gate ON THE REWRITTEN TEXT ->
    md5 split -> token-balanced shards. This gates the
    rewrite-then-filter interface drop mode cannot: the C4 gate and the
    token counts must read the cleaned text (a doc can *pass* the gate
    only because its boilerplate span was excised, and every shard
    boundary shifts with the rewritten token totals). ``text_md5`` of
    the rewritten text rides in the output so the oracle hashes the
    rebuilt PAYLOAD through the whole pipeline, not just counts.

    Scale shape: one shared SA build (checkpointed internally);
    ``gated`` is checkpointed ONCE before fanning out to the prefix sum
    and the hash projection (else both branches re-run the excision
    join; at 100 TB use a parquet stage barrier instead —
    pipeline_corpus.curate_corpus(stage_dir=...) is the library form).
    Stage counts ride as Observations (zero extra scans)."""
    tune(spark)
    from pyspark.sql import Observation

    from geo_db_spark.operators.curation import (
        C4_BOILERPLATE,
        C4_MEAN_WORD_LEN_MAX,
        C4_MEAN_WORD_LEN_MIN,
        C4_MIN_TOKENS,
    )
    from geo_db_spark.operators.dedup import normalize_text
    from geo_db_spark.operators.packing import _cum_token_positions, split_assign
    from geo_db_spark.operators.suffix import (
        excise_substring_dups,
        sa_adjacent_pairs,
        sa_pair_lcp,
        suffix_ranks,
    )

    docs = load(spark, sf_dir, "documents")
    base = docs.select(
        "doc_id",
        "text",
        F.md5(normalize_text(F.col("text")).cast("binary")).alias("__digest"),
        split_assign().alias("__split"),
    )
    w_min = Window.partitionBy("__digest")
    exact_kept = base.withColumn("__min_id", F.min("doc_id").over(w_min)).filter(
        F.col("doc_id") == F.col("__min_id")
    )
    obs_exact = Observation("corpus_x_exact_kept")
    exact_kept = exact_kept.observe(obs_exact, F.count(F.lit(1)).alias("n"))
    exact_kept = exact_kept.localCheckpoint(eager=True)
    sliced = exact_kept.select(
        "doc_id", F.substring("text", 1, _SA_SLICE).alias("t")
    )
    ranks = suffix_ranks(
        sliced, id_col="doc_id", text_col="t",
        slice_len=_SA_SLICE, k0=64, min_tail=_SA_T,  # k0=64: 1 quadrupling round (r13)
    )
    pairs = sa_adjacent_pairs(sliced, ranks, _SA_T)
    lcp = sa_pair_lcp(sliced, pairs, _SA_T, _SA_SLICE)
    kept = excise_substring_dups(sliced, lcp).select(
        F.col("doc_id").alias("__xid"), "kept_text", "n_excised"
    )
    rewritten = (
        exact_kept.join(kept, F.col("doc_id") == F.col("__xid"), "left")
        .withColumn(
            "__rt",
            F.when(F.col("kept_text").isNull(), F.col("text")).otherwise(
                F.concat(
                    F.col("kept_text"),
                    F.expr(f"substring(text, {_SA_SLICE + 1})"),
                )
            ),
        )
    )
    obs_x = Observation("corpus_x_excised_docs")
    rewritten = rewritten.observe(
        obs_x,
        F.sum(
            F.when(F.coalesce(F.col("n_excised"), F.lit(0)) > 0, 1).otherwise(0)
        ).alias("n"),
    )
    # C4 gate on the REWRITTEN text — the stage-order point of the query
    t = F.col("__rt")
    n_tok = F.size(F.split(F.trim(t), r"\s+"))
    mean_wlen = F.length(F.regexp_replace(t, r"\s", "")).cast("double") / n_tok
    boiler = F.lit(False)
    for marker in C4_BOILERPLATE:
        boiler = boiler | F.lower(t).contains(marker)
    keep = ~(
        (n_tok < C4_MIN_TOKENS)
        | (mean_wlen < C4_MEAN_WORD_LEN_MIN)
        | (mean_wlen > C4_MEAN_WORD_LEN_MAX)
        | t.contains("{")
        | boiler
    )
    gated = (
        rewritten.filter(keep)
        .select("doc_id", F.col("__rt").alias("text"), "__split")
        .localCheckpoint(eager=True)  # consumed by prefix sum AND hashes
    )
    pos = _cum_token_positions(gated, "__split", "doc_id", "text", 4096)
    hashes = gated.select(
        F.col("doc_id").alias("__hid"),
        F.md5(F.col("text").cast("binary")).alias("text_md5"),
    )
    out = pos.join(hashes, F.col("id") == F.col("__hid")).select(
        F.col("id").alias("doc_id"),
        F.col("source").alias("split"),
        F.col("n_tokens"),
        F.floor(F.col("cum_before") / F.lit(2000)).alias("shard"),
        "text_md5",
    )
    out._corpus_observations = {"exact": obs_exact, "excised_docs": obs_x}
    return out


ORACLE_CORPUS_BUILD_EXCISE = rf"""
WITH surv AS (
  SELECT MIN(doc_id) AS doc_id
  FROM documents
  GROUP BY md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g')))
),
exact_kept AS MATERIALIZED (
  SELECT d.doc_id, d.text FROM documents d JOIN surv USING (doc_id)
),
sl AS MATERIALIZED (
  SELECT doc_id, substr(text, 1, {_SA_SLICE}) AS t FROM exact_kept
),
suf AS MATERIALIZED (
  SELECT doc_id, CAST(pos AS BIGINT) AS pos,
         substr(t, CAST(pos AS INT)) AS suffix,
         substr(t, CAST(pos AS INT), {_SA_T}) AS g
  FROM (SELECT doc_id, t, unnest(range(1, length(t) - {_SA_T - 1} + 1)) AS pos
        FROM sl WHERE length(t) >= {_SA_T})
),
r AS MATERIALIZED (
  SELECT doc_id, pos, g,
         row_number() OVER (ORDER BY suffix, doc_id, pos) AS rk
  FROM suf
),
pairs AS MATERIALIZED (
  SELECT a.rk AS rank_lo,
         a.doc_id AS doc_a, a.pos AS pos_a, b.doc_id AS doc_b, b.pos AS pos_b
  FROM r a JOIN r b ON b.rk = a.rk + 1 AND a.g = b.g
),
lcp AS MATERIALIZED (
  SELECT rank_lo, doc_a, pos_a, doc_b, pos_b,
         LEAST(MAX(k),
               MIN(length(sa.t) - pos_a + 1),
               MIN(length(sb.t) - pos_b + 1)) AS lcp
  FROM pairs
  JOIN sl sa ON sa.doc_id = doc_a
  JOIN sl sb ON sb.doc_id = doc_b
  CROSS JOIN (SELECT unnest(range({_SA_T}, {_SA_SLICE} + 1)) AS k) ks
  WHERE substr(sa.t, CAST(pos_a AS INT), CAST(k AS INT))
        = substr(sb.t, CAST(pos_b AS INT), CAST(k AS INT))
  GROUP BY rank_lo, doc_a, pos_a, doc_b, pos_b
),
runs AS (
  SELECT *, rank_lo - row_number() OVER (ORDER BY rank_lo) AS run_id
  FROM lcp
),
memb AS (
  SELECT run_id, rk, MAX(doc_id) AS doc_id, MAX(pos) AS pos, MAX(lcp) AS x
  FROM (
    SELECT run_id, rank_lo AS rk, doc_a AS doc_id, pos_a AS pos, lcp FROM runs
    UNION ALL
    SELECT run_id, rank_lo + 1, doc_b, pos_b, lcp FROM runs
  ) GROUP BY run_id, rk
),
iv AS (
  SELECT doc_id, st, en FROM (
    SELECT doc_id, pos AS st, pos + x AS en,
           first_value(doc_id) OVER w AS md,
           first_value(pos) OVER w AS mp
    FROM memb
    WINDOW w AS (PARTITION BY run_id ORDER BY doc_id, pos)
  ) WHERE NOT (doc_id = md AND st = mp)
),
isl AS (
  SELECT doc_id, st, en,
         CASE WHEN st > COALESCE(MAX(en) OVER (
                PARTITION BY doc_id ORDER BY st, en
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1)
              THEN 1 ELSE 0 END AS ni
  FROM iv
),
isl2 AS (
  SELECT doc_id, st, en,
         SUM(ni) OVER (PARTITION BY doc_id ORDER BY st, en) AS island
  FROM isl
),
merged AS MATERIALIZED (
  SELECT doc_id, MIN(st) AS st, MAX(en) AS en
  FROM isl2 GROUP BY doc_id, island
),
pieces AS (
  SELECT doc_id,
         COALESCE(LAG(en) OVER (PARTITION BY doc_id ORDER BY st), 1) AS gs,
         st AS ge
  FROM merged
  UNION ALL
  SELECT doc_id, MAX(en) AS gs, NULL AS ge FROM merged GROUP BY doc_id
),
rebuilt AS MATERIALIZED (
  SELECT p.doc_id,
         string_agg(substr(t, CAST(gs AS INT),
                           CAST(COALESCE(ge, length(t) + 1) - gs AS INT)),
                    '' ORDER BY gs) AS kept
  FROM pieces p JOIN sl USING (doc_id)
  GROUP BY p.doc_id, t
),
rewritten AS MATERIALIZED (
  SELECT e.doc_id,
         COALESCE(rb.kept, sl.t) || substr(e.text, {_SA_SLICE + 1}) AS text
  FROM exact_kept e
  JOIN sl USING (doc_id)
  LEFT JOIN rebuilt rb USING (doc_id)
),
c4 AS (
  SELECT doc_id,
         len(regexp_split_to_array(trim(text), '\s+')) AS n_tok,
         CAST(length(regexp_replace(text, '\s', '', 'g')) AS DOUBLE)
           / len(regexp_split_to_array(trim(text), '\s+')) AS mean_wlen,
         contains(text, '{{') AS curly,
         (contains(lower(text), 'lorem ipsum') OR contains(lower(text), 'javascript')
          OR contains(lower(text), 'terms of use') OR contains(lower(text), 'cookie policy')) AS boiler
  FROM rewritten
),
gated AS (
  SELECT k.doc_id, k.text, c.n_tok
  FROM rewritten k JOIN c4 c USING (doc_id)
  WHERE NOT (c.n_tok < 30 OR c.mean_wlen < 3.0 OR c.mean_wlen > 10.0 OR c.curly OR c.boiler)
),
placed AS (
  SELECT doc_id, {_SPLIT_CASE_C} AS split, CAST(n_tok AS BIGINT) AS n_tokens,
         md5(text) AS text_md5
  FROM gated
)
SELECT doc_id, split, n_tokens,
       CAST(FLOOR(COALESCE(SUM(n_tokens) OVER (
         PARTITION BY split ORDER BY doc_id
         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) / 2000.0) AS BIGINT) AS shard,
       text_md5
FROM placed
"""

QUERIES["corpus_build_pipeline_excise"] = corpus_build_pipeline_excise
ORACLES["corpus_build_pipeline_excise"] = ORACLE_CORPUS_BUILD_EXCISE
