"""Text-analysis workload entries over the `documents` table."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from geo_db_spark.io import load
from geo_db_spark.operators.text import (
    LANG_MARKERS,
    fingerprint,
    lang_scores,
    quality_metrics,
    token_count,
    word_tokens,
)
from geo_db_spark.session import tune


def text_quality_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune(spark)
    docs = load(spark, sf_dir, "documents")
    return quality_metrics(docs, "text").select(
        "doc_id",
        "n_chars_calc",
        "n_tokens",
        "alpha_ratio",
        "space_ratio",
        "punct_ratio",
        "stopword_ratio",
        "mean_token_len",
    )


ORACLE_QUALITY = r"""
SELECT doc_id,
       length(text) AS n_chars_calc,
       len(regexp_split_to_array(trim(text), '\s+')) AS n_tokens,
       CAST(length(regexp_replace(text, '[^a-zA-Z]', '', 'g')) AS DOUBLE) / length(text) AS alpha_ratio,
       CAST(length(regexp_replace(text, '[^ ]', '', 'g')) AS DOUBLE) / length(text) AS space_ratio,
       CAST(length(regexp_replace(text, '[a-zA-Z0-9\s]', '', 'g')) AS DOUBLE) / length(text) AS punct_ratio,
       CAST(len(regexp_extract_all(lower(text), '\b(the|a|an|and|or|of|to|in|is|it)\b')) AS DOUBLE)
           / len(regexp_split_to_array(trim(text), '\s+')) AS stopword_ratio,
       CAST(length(text) AS DOUBLE) / len(regexp_split_to_array(trim(text), '\s+')) AS mean_token_len
FROM documents
"""


def text_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword-marker language ID. Argmax over per-language scores with a
    fixed preference order on ties (en > fr > es > de > unknown)."""
    tune(spark)
    docs = load(spark, sf_dir, "documents")
    scored = docs.select("doc_id", "lang", *lang_scores(F.col("text")))
    s = {lang: F.col(f"score_{lang}") for lang in LANG_MARKERS}
    best = F.greatest(*s.values())
    pred = (
        F.when(best == 0, F.lit("unknown"))
        .when(s["en"] == best, F.lit("en"))
        .when(s["fr"] == best, F.lit("fr"))
        .when(s["es"] == best, F.lit("es"))
        .otherwise(F.lit("de"))
    )
    return scored.select("doc_id", "lang", pred.alias("pred_lang"))


_SCORES_SQL = {
    "en": r"len(regexp_extract_all(lower(text), '\b(the|and|of|is|with)\b'))",
    "fr": r"len(regexp_extract_all(lower(text), '\b(le|la|les|et|est)\b'))",
    "es": r"len(regexp_extract_all(lower(text), '\b(el|los|las|y|es)\b'))",
    "de": r"len(regexp_extract_all(lower(text), '\b(der|die|das|und|ist)\b'))",
}

ORACLE_LANG_ID = f"""
WITH s AS (
  SELECT doc_id, lang,
         {_SCORES_SQL['en']} AS s_en, {_SCORES_SQL['fr']} AS s_fr,
         {_SCORES_SQL['es']} AS s_es, {_SCORES_SQL['de']} AS s_de
  FROM documents
)
SELECT doc_id, lang,
       CASE WHEN greatest(s_en, s_fr, s_es, s_de) = 0 THEN 'unknown'
            WHEN s_en = greatest(s_en, s_fr, s_es, s_de) THEN 'en'
            WHEN s_fr = greatest(s_en, s_fr, s_es, s_de) THEN 'fr'
            WHEN s_es = greatest(s_en, s_fr, s_es, s_de) THEN 'es'
            ELSE 'de' END AS pred_lang
FROM s
"""


def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-insensitive content fingerprint (sorted distinct tokens -> md5)."""
    tune(spark)
    docs = load(spark, sf_dir, "documents")
    return docs.select("doc_id", fingerprint(F.col("text")).alias("fp"))


ORACLE_FINGERPRINT = r"""
SELECT doc_id,
       md5(array_to_string(list_sort(list_distinct(
           regexp_split_to_array(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' '))), ' ')) AS fp
FROM documents
"""


def text_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting for LLM-data budgeting: whitespace tokens plus the
    BPE-ish regex tokenization (words / number runs / punctuation marks)
    and its distinct-token count. Pure expressions, one scan."""
    tune(spark)
    docs = load(spark, sf_dir, "documents")
    toks = word_tokens(F.col("text"))
    return docs.select(
        "doc_id",
        token_count(F.col("text")).alias("n_ws_tokens"),
        F.size(toks).alias("n_bpe_tokens"),
        F.size(F.array_distinct(toks)).alias("n_distinct_tokens"),
    )


ORACLE_TOKEN_STATS = r"""
SELECT doc_id,
       len(regexp_split_to_array(trim(text), '\s+')) AS n_ws_tokens,
       len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]')) AS n_bpe_tokens,
       len(list_distinct(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]'))) AS n_distinct_tokens
FROM documents
"""


def text_top_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide top-50 word bigrams (every occurrence, not per-doc
    distinct). The map-reduce canary: explode -> map-side partial count
    -> one shuffle on the ngram -> TakeOrderedAndProject (per-partition
    top-k + driver merge of 50-row heaps — NOT a single-partition global
    sort). Total order (n DESC, ngram ASC) makes the cut deterministic."""
    tune(spark)
    docs = load(spark, sf_dir, "documents")
    # overlapping bigrams via the lookahead-capture regex (dedup.shingles
    # without the per-doc distinct: frequency wants every occurrence)
    pat = r"(?<= |^)(?=(\S+ \S+))"
    norm = F.trim(F.regexp_replace(F.lower(F.col("text")), r"\s+", " "))
    grams = docs.select(
        F.explode(F.regexp_extract_all(norm, F.lit(pat), 1)).alias("ngram")
    )
    return (
        grams.groupBy("ngram")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), F.col("ngram").asc())
        .limit(50)
    )


ORACLE_TOP_NGRAMS = r"""
WITH toks AS (
  SELECT regexp_split_to_array(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS t
  FROM documents
),
grams AS (
  SELECT unnest(list_filter(list_transform(list_zip(t, t[2:]),
      p -> CASE WHEN p[2] IS NULL THEN NULL ELSE p[1]||' '||p[2] END),
      x -> x IS NOT NULL)) AS ngram
  FROM toks
)
SELECT ngram, COUNT(*) AS n
FROM grams
GROUP BY ngram
ORDER BY n DESC, ngram
LIMIT 50
"""


def text_tfidf_topterms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 characteristic terms per document by tf-idf — the retrieval
    /keyword-extraction primitive. idf is the RATIONAL form (N+1)/(df+1)
    rather than its log: same ranking (log is monotone), but one IEEE
    division of exact integers — ln() is not correctly-rounded and may
    differ in the last ulp across libms, which would flap the hash gate.

    Scale shape: tokenize -> explode once; per-(doc,term) counts and
    per-term doc frequencies are two aggregates over that one exploded
    set; df joins back term-keyed (dimension-sized: the vocabulary);
    per-doc top-3 is one window with a total-order tiebreak."""
    tune(spark)
    docs = load(spark, sf_dir, "documents")
    from pyspark.sql import Window

    norm = F.trim(F.regexp_replace(F.lower(F.col("text")), r"\s+", " "))
    toks = docs.select(
        "doc_id", F.explode(F.split(norm, " ")).alias("term")
    ).filter(F.col("term") != "")
    n_docs = docs.count()  # driver-side scalar: one count job, reused as a literal
    tf = toks.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    df_ = toks.select("doc_id", "term").distinct().groupBy("term").agg(
        F.count(F.lit(1)).alias("df")
    )
    scored = tf.join(df_, "term").select(
        "doc_id",
        "term",
        (
            F.col("tf").cast("double")
            * (F.lit(float(n_docs + 1)) / (F.col("df").cast("double") + F.lit(1.0)))
        ).alias("tfidf"),
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("tfidf").desc(), F.col("term"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 3)
        .select("doc_id", "term", "tfidf", F.col("rank").cast("int").alias("rank"))
    )


ORACLE_TFIDF = r"""
WITH toks AS (
  SELECT doc_id,
         unnest(regexp_split_to_array(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ')) AS term
  FROM documents
),
nz AS (SELECT * FROM toks WHERE term <> ''),
tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM nz GROUP BY doc_id, term),
df AS (SELECT term, COUNT(DISTINCT doc_id) AS df FROM nz GROUP BY term),
n AS (SELECT COUNT(*) AS n_docs FROM documents)
SELECT doc_id, term,
       CAST(tf AS DOUBLE) * (CAST(n_docs + 1 AS DOUBLE) / (CAST(df AS DOUBLE) + 1.0)) AS tfidf,
       CAST(row_number() OVER (PARTITION BY doc_id ORDER BY
            CAST(tf AS DOUBLE) * (CAST(n_docs + 1 AS DOUBLE) / (CAST(df AS DOUBLE) + 1.0)) DESC,
            term) AS INT) AS rank
FROM tf JOIN df USING (term), n
QUALIFY rank <= 3
"""


def text_contamination_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark-contamination detection — the eval-hygiene pass a
    training pipeline must run: which corpus documents share >= 3
    distinct 4-gram shingles with any 'benchmark' document (stand-in:
    doc_id < 20)? Returns (doc_id, bench_id, n_shared).

    Scale shape: the benchmark side is tiny by definition -> its
    exploded shingles broadcast; the corpus explodes once and hash-joins
    map-side (no corpus shuffle), only the candidate hits shuffle for
    the (doc, bench) count. At 100 TB the corpus-side cost is one
    tokenize+explode pass, same as any shingle-based dedup."""
    tune(spark)
    from geo_db_spark.operators.dedup import shingles

    docs = load(spark, sf_dir, "documents")
    sh = docs.select(
        F.col("doc_id"), F.explode(shingles(F.col("text"), 4)).alias("s")
    )
    bench = sh.filter(F.col("doc_id") < 20).select(
        F.col("doc_id").alias("bench_id"), "s"
    )
    return (
        sh.join(F.broadcast(bench), "s")
        .filter(F.col("doc_id") != F.col("bench_id"))
        .groupBy("doc_id", "bench_id")
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .filter(F.col("n_shared") >= 3)
    )


ORACLE_CONTAMINATION = r"""
WITH toks AS (
  SELECT doc_id,
         regexp_split_to_array(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS t
  FROM documents
),
sh AS (
  SELECT doc_id, unnest(list_distinct(list_filter(
      list_transform(list_zip(t, t[2:], t[3:], t[4:]),
        p -> CASE WHEN p[4] IS NULL THEN NULL
             ELSE p[1]||' '||p[2]||' '||p[3]||' '||p[4] END),
      x -> x IS NOT NULL))) AS s
  FROM toks
)
SELECT a.doc_id, b.doc_id AS bench_id, COUNT(*) AS n_shared
FROM sh a JOIN sh b ON a.s = b.s
WHERE b.doc_id < 20 AND a.doc_id <> b.doc_id
GROUP BY a.doc_id, b.doc_id
HAVING COUNT(*) >= 3
"""


def text_pii_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrubbing pass, measurement half: per-document counts of
    email-shaped and URL-shaped spans plus the md5 of the redacted text
    (emails -> <EMAIL>, urls -> <URL>) — the digest proves the rewrite
    is deterministic without shipping the text. Pure regexp expressions,
    one scan; the redaction itself is `regexp_replace`, trivially
    applied as a column when writing a scrubbed corpus."""
    tune(spark)
    docs = load(spark, sf_dir, "documents")
    email = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
    url = r"https?://[^\s]+"
    redacted = F.regexp_replace(
        F.regexp_replace(F.col("text"), email, "<EMAIL>"), url, "<URL>"
    )
    return docs.select(
        "doc_id",
        F.size(F.regexp_extract_all("text", F.lit(email), 0)).alias("n_emails"),
        F.size(F.regexp_extract_all("text", F.lit(url), 0)).alias("n_urls"),
        F.md5(redacted.cast("binary")).alias("redacted_md5"),
    )


ORACLE_PII = r"""
SELECT doc_id,
       len(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS n_emails,
       len(regexp_extract_all(text, 'https?://[^\s]+')) AS n_urls,
       md5(regexp_replace(
           regexp_replace(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
           'https?://[^\s]+', '<URL>', 'g')) AS redacted_md5
FROM documents
"""


def text_chunk_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Passage-level duplication map — the chunk-dedup pass real LLM
    pipelines run UNDER document granularity (boilerplate paragraphs
    repeat across otherwise-distinct pages): split each document into
    non-overlapping 16-token chunks, hash them, and report per document
    how many of its chunks also occur elsewhere in the corpus.

    Shape: one regex pass per document extracts the 16-token chunk
    STRINGS directly (``(?:\\S+ ){1,16}`` matches sequentially, so the
    groups tile the text), the explode carries only (doc_id, chunk) —
    never the token array — then one groupBy(chunk hash) for corpus
    counts (map-side partial), one join back keyed on the 32-char digest,
    and one per-doc aggregate. The r3 shape exploded a chunk INDEX and
    sliced afterwards, which materialized the full token array once PER
    CHUNK: O(tokens x chunks) per doc, measured 15x wall on 10x data
    (r4 scale envelope). This shape is linear: 15x -> ~2x.

    Whitespace-only documents contribute no chunks (and no output row)
    on both sides; the driver corpus has none at any SF."""
    tune(spark)
    docs = load(spark, sf_dir, "documents")
    norm = F.trim(F.regexp_replace(F.lower(F.col("text")), r"\s+", " "))
    # every token gets a trailing space so the {1,16} group pattern tiles
    # the text exactly into ceil(n_tokens/16) non-overlapping chunks
    chunk_strs = F.regexp_extract_all(
        F.concat(norm, F.lit(" ")), F.lit(r"(?:\S+ ){1,16}"), 0
    )
    chunks = docs.select(
        "doc_id", F.explode(chunk_strs).alias("c")
    ).select(
        "doc_id",
        # md5 stays OUTSIDE any lambda (the HOF trap, operators/dedup.py
        # shingles note); rtrim drops the tiling pattern's trailing space
        F.md5(F.rtrim(F.col("c")).cast("binary")).alias("h"),
    )
    corpus_counts = chunks.groupBy("h").agg(F.count(F.lit(1)).alias("n"))
    return (
        chunks.join(corpus_counts, "h")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_chunks"),
            F.sum(F.when(F.col("n") > 1, 1).otherwise(0)).alias("n_dup_chunks"),
        )
    )


ORACLE_CHUNK_DUPS = r"""
WITH toks AS (
  SELECT doc_id,
         regexp_split_to_array(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS t
  FROM documents
  WHERE trim(regexp_replace(lower(text), '\s+', ' ', 'g')) <> ''
),
chunks AS (
  SELECT doc_id,
         md5(array_to_string(t[(i * 16 + 1):(i * 16 + 16)], ' ')) AS h
  FROM toks, unnest(range(CAST(ceil(len(t) / 16.0) AS BIGINT))) u(i)
),
cc AS (SELECT h, COUNT(*) AS n FROM chunks GROUP BY h)
SELECT doc_id, COUNT(*) AS n_chunks,
       CAST(SUM(CASE WHEN n > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_chunks
FROM chunks JOIN cc USING (h)
GROUP BY doc_id
"""


def text_sample_deterministic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reproducible ~20% corpus subsample: keep documents whose content
    hash falls under the rate threshold. Unlike df.sample(), the
    selection is a pure function of doc_id — identical across reruns,
    engines, partitionings, and cluster sizes (the property a training
    pipeline needs for auditable data lineage). Exactly-representable
    threshold so the comparison has no float edge."""
    tune(spark)
    docs = load(spark, sf_dir, "documents")
    # 60-bit hash < floor(0.20 * 2^60): integer compare, no float edge
    threshold = (1 << 60) // 5
    h = F.conv(
        F.substring(F.md5(F.col("doc_id").cast("string").cast("binary")), 1, 15),
        16,
        10,
    ).cast("long")
    return docs.filter(h < threshold).select("doc_id", "lang", "source")


ORACLE_SAMPLE = f"""
SELECT doc_id, lang, source FROM documents
WHERE ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT < {(1 << 60) // 5}
"""

# expected sample size of the weighted Poisson sample — a TARGET COUNT,
# not a rate: the threshold self-scales with total corpus weight, so the
# sample stays ~K documents whether the corpus is 500 docs or 100 TB.
POISSON_K = 100


def text_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Size-weighted Poisson sample: include document d independently
    with probability K * w_d / W (w_d = char count, W = corpus total) —
    the standard PPS (probability-proportional-to-size) pass a training
    pipeline uses so a token-budgeted subsample isn't dominated by tiny
    documents. Like text_sample_deterministic the draw is a pure
    function of doc_id (auditable, rerun- and partitioning-stable), and
    the comparison h * W < K * w * 2^60 is EXACT 128-bit integer
    arithmetic via DECIMAL(38,0) — no float threshold edge. Two scans
    (W, then the filter); W is one long from a map-side-combined sum.
    Magnitudes: h < 2^60 ~ 1.2e18, so W (total chars) up to ~1e19
    stays inside 38 digits — covers 100 TB of text with margin."""
    tune(spark)
    docs = load(spark, sf_dir, "documents")
    w = F.greatest(F.col("n_chars"), F.lit(1)).cast("long")
    tot = docs.agg(F.sum(F.greatest(F.col("n_chars"), F.lit(1))).alias("W"))
    h = F.conv(
        F.substring(F.md5(F.col("doc_id").cast("string").cast("binary")), 1, 15),
        16,
        10,
    ).cast("long")
    d38 = "decimal(38,0)"
    lhs = h.cast(d38) * F.col("W").cast(d38)
    rhs = (
        F.lit(POISSON_K).cast(d38)
        * w.cast(d38)
        * F.lit(1 << 60).cast(d38)
    )
    return (
        docs.crossJoin(F.broadcast(tot))
        .filter(lhs < rhs)
        .select("doc_id", "lang", w.alias("weight"))
    )


ORACLE_WEIGHTED_SAMPLE = f"""
SELECT doc_id, lang, CAST(greatest(n_chars, 1) AS BIGINT) AS weight
FROM documents,
     (SELECT CAST(SUM(greatest(n_chars, 1)) AS HUGEINT) AS w_total FROM documents) t
WHERE CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT AS HUGEINT) * w_total
      < {POISSON_K}::HUGEINT * greatest(n_chars, 1) * (1::HUGEINT << 60)
"""


def text_language_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-mixing pass: cap each language at its 50 highest-quality
    documents (alpha_ratio desc, doc_id tiebreak) — the rebalancing step
    that stops a dominant language from swamping the mixture. One window
    per language partition; at 100 TB the quality score comes from the
    same single-pass metrics, and the per-group cap is the standard
    top-k shuffle shape."""
    tune(spark)
    from pyspark.sql import Window

    docs = load(spark, sf_dir, "documents")
    q = quality_metrics(docs, "text")
    w = Window.partitionBy("lang").orderBy(F.col("alpha_ratio").desc(), F.col("doc_id"))
    return (
        q.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= 50)
        .select("doc_id", "lang", F.col("alpha_ratio"))
    )


ORACLE_LANG_BALANCE = r"""
SELECT doc_id, lang,
       CAST(length(regexp_replace(text, '[^a-zA-Z]', '', 'g')) AS DOUBLE)
         / length(text) AS alpha_ratio
FROM documents
QUALIFY row_number() OVER (
    PARTITION BY lang
    ORDER BY CAST(length(regexp_replace(text, '[^a-zA-Z]', '', 'g')) AS DOUBLE)
               / length(text) DESC,
             doc_id) <= 50
"""


LM_TOP_B = 4096  # bigram LM table cap: keeps the model broadcastable


def text_bigram_lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-based bigram LM scoring — the perplexity-filtering shape
    (CCNet / Wenzek et al. 2020) with the LM trained on the corpus
    itself. The model is the top-4096 bigrams by corpus frequency with
    their scaled conditional probabilities round(1e6·c(w1 w2)/c(w1));
    each document then gets exact-integer sufficient statistics:
    bigram count, in-model hits, summed scaled conditionals, and a
    scaled coverage ratio. (All outputs are rationals of exact integers
    — one IEEE division + half-away-from-zero round, identical across
    engines — because ln() is not cross-libm reproducible; a float
    log-perplexity is a monotone driver-side map of lm_score_u.)

    Scale shape: one explode feeds both count aggregates (map-side
    combine); the LM table is capped at 4096 rows by a total order
    (c2 DESC, ngram) so the per-document scoring join is a BROADCAST
    hash join — the 100 TB plan is two shuffles over skinny (ngram)
    rows plus a broadcast probe, never a vocab-sized shuffle join."""
    tune(spark)
    docs = load(spark, sf_dir, "documents")
    pat = r"(?<= |^)(?=(\S+ \S+))"  # overlapping bigrams (see top_ngrams)
    norm = F.trim(F.regexp_replace(F.lower(F.col("text")), r"\s+", " "))
    grams = docs.select(
        "doc_id", F.explode(F.regexp_extract_all(norm, F.lit(pat), 1)).alias("ngram")
    )
    toks = docs.select(F.explode(F.split(norm, " ")).alias("term")).filter(
        F.col("term") != ""
    )
    ug = toks.groupBy("term").agg(F.count(F.lit(1)).alias("c1"))
    bg = grams.groupBy("ngram").agg(F.count(F.lit(1)).alias("c2"))
    lm = (
        bg.join(ug, F.split(F.col("ngram"), " ")[0] == F.col("term"))
        .orderBy(F.col("c2").desc(), F.col("ngram"))
        .limit(LM_TOP_B)
        .select(
            "ngram",
            F.round(F.lit(1000000.0) * F.col("c2") / F.col("c1"))
            .cast("long")
            .alias("cond_u"),
        )
    )
    per_doc = (
        grams.join(F.broadcast(lm), "ngram", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.count("cond_u").alias("n_hits"),
            F.coalesce(F.sum("cond_u"), F.lit(0)).alias("lm_score_u"),
        )
    )
    nb = F.coalesce(F.col("n_bigrams"), F.lit(0))
    nh = F.coalesce(F.col("n_hits"), F.lit(0))
    return docs.select("doc_id").join(per_doc, "doc_id", "left").select(
        "doc_id",
        nb.cast("long").alias("n_bigrams"),
        nh.cast("long").alias("n_hits"),
        F.coalesce(F.col("lm_score_u"), F.lit(0)).cast("long").alias("lm_score_u"),
        F.when(nb > 0, F.round(F.lit(1000000.0) * nh / nb))
        .otherwise(F.lit(0))
        .cast("long")
        .alias("coverage_u"),
    )


ORACLE_BIGRAM_LM = r"""
WITH toks AS (
  SELECT doc_id, regexp_split_to_array(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS t
  FROM documents
),
grams AS (
  SELECT doc_id, unnest(list_filter(list_transform(list_zip(t, t[2:]),
      p -> CASE WHEN p[2] IS NULL THEN NULL ELSE p[1]||' '||p[2] END),
      x -> x IS NOT NULL)) AS ngram
  FROM toks
),
ug AS (
  SELECT term, COUNT(*) AS c1
  FROM (SELECT unnest(t) AS term FROM toks)
  WHERE term <> '' GROUP BY term
),
bg AS (SELECT ngram, COUNT(*) AS c2 FROM grams GROUP BY ngram),
lm AS (
  SELECT ngram, CAST(ROUND(1000000.0 * c2 / c1) AS BIGINT) AS cond_u
  FROM bg JOIN ug ON split_part(ngram, ' ', 1) = term
  ORDER BY c2 DESC, ngram LIMIT 4096
),
per_doc AS (
  SELECT g.doc_id, COUNT(*) AS n_bigrams, COUNT(lm.cond_u) AS n_hits,
         COALESCE(SUM(lm.cond_u), 0) AS lm_score_u
  FROM grams g LEFT JOIN lm ON g.ngram = lm.ngram
  GROUP BY g.doc_id
)
SELECT d.doc_id,
       CAST(COALESCE(n_bigrams, 0) AS BIGINT) AS n_bigrams,
       CAST(COALESCE(n_hits, 0) AS BIGINT) AS n_hits,
       CAST(COALESCE(lm_score_u, 0) AS BIGINT) AS lm_score_u,
       CAST(CASE WHEN COALESCE(n_bigrams, 0) > 0
            THEN ROUND(1000000.0 * n_hits / n_bigrams) ELSE 0 END AS BIGINT) AS coverage_u
FROM documents d LEFT JOIN per_doc ON d.doc_id = per_doc.doc_id
"""


def text_kneser_ney_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interpolated Kneser-Ney bigram scoring (Kneser & Ney 1995 /
    Chen & Goodman 1999 — the smoothing KenLM-style perplexity filters
    actually use, where text_bigram_lm_score is the raw-MLE shape).
    With absolute discount D = 3/4 held as an exact rational:

      P_KN(w2|w1) = max(c(w1 w2) - D, 0)/c(w1)
                    + D·N1+(w1·)/c(w1) · N1+(·w2)/N1+(··)

    N1+(w1·) = distinct continuations of w1, N1+(·w2) = distinct
    histories of w2 (the continuation count — KN's insight: "Francisco"
    is frequent but follows only "San"), N1+(··) = bigram type count.
    Over the common denominator 4·c(w1)·N1+(··) every term is an exact
    integer, so the model column is round(1e6·num/den) — one IEEE
    division + half-up round, identical across engines (the
    text_bigram_lm_score convention; ln() is not cross-libm safe).

    The model keeps the top-4096 bigrams by frequency (total order:
    c2 DESC, ngram) with KN probabilities computed over the FULL type
    inventory, so the per-document scoring join stays a BROADCAST
    probe. Scale shape: the gram explode feeds map-side-combined
    aggregates; the three model-side statistics (c2, N1+(w1·),
    N1+(·w2)) all derive from the one bg frame — checkpointed so its
    shuffle runs once, corpus-vocabulary-bound (at 100 TB persist the
    model to parquet instead; int64 holds 4·c1·N1+(··) up to ~1e18,
    move to decimal beyond)."""
    tune(spark)
    docs = load(spark, sf_dir, "documents")
    pat = r"(?<= |^)(?=(\S+ \S+))"  # overlapping bigrams (see top_ngrams)
    norm = F.trim(F.regexp_replace(F.lower(F.col("text")), r"\s+", " "))
    grams = docs.select(
        "doc_id", F.explode(F.regexp_extract_all(norm, F.lit(pat), 1)).alias("ngram")
    )
    toks = docs.select(F.explode(F.split(norm, " ")).alias("term")).filter(
        F.col("term") != ""
    )
    ug = toks.groupBy("term").agg(F.count(F.lit(1)).alias("c1"))
    bg = (
        grams.groupBy("ngram")
        .agg(F.count(F.lit(1)).alias("c2"))
        .select(
            "ngram",
            "c2",
            F.split(F.col("ngram"), " ")[0].alias("w1"),
            F.split(F.col("ngram"), " ")[1].alias("w2"),
        )
        # four consumers (top-k, N1+(w1·), N1+(·w2), type count): one
        # materialization instead of four recomputed shuffles
        .localCheckpoint(eager=True)
    )
    n1p_fwd = bg.groupBy("w1").agg(F.count(F.lit(1)).alias("n1p"))
    contc = bg.groupBy("w2").agg(F.count(F.lit(1)).alias("contc"))
    n_types = bg.agg(F.count(F.lit(1)).alias("n_types"))
    num = (
        F.greatest(F.lit(4) * F.col("c2") - F.lit(3), F.lit(0)) * F.col("n_types")
        + F.lit(3) * F.col("n1p") * F.col("contc")
    ).cast("long")
    den = (F.lit(4) * F.col("c1") * F.col("n_types")).cast("long")
    lm = (
        bg.join(ug, F.col("w1") == F.col("term"))
        .join(n1p_fwd, "w1")
        .join(contc, "w2")
        .crossJoin(F.broadcast(n_types))
        .orderBy(F.col("c2").desc(), F.col("ngram"))
        .limit(LM_TOP_B)
        .select(
            "ngram",
            F.round(F.lit(1000000.0) * num / den).cast("long").alias("kn_u"),
        )
    )
    per_doc = (
        grams.join(F.broadcast(lm), "ngram", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.count("kn_u").alias("n_hits"),
            F.coalesce(F.sum("kn_u"), F.lit(0)).alias("kn_score_u"),
        )
    )
    nb = F.coalesce(F.col("n_bigrams"), F.lit(0))
    nh = F.coalesce(F.col("n_hits"), F.lit(0))
    return docs.select("doc_id").join(per_doc, "doc_id", "left").select(
        "doc_id",
        nb.cast("long").alias("n_bigrams"),
        nh.cast("long").alias("n_hits"),
        F.coalesce(F.col("kn_score_u"), F.lit(0)).cast("long").alias("kn_score_u"),
        F.when(nb > 0, F.round(F.lit(1000000.0) * nh / nb))
        .otherwise(F.lit(0))
        .cast("long")
        .alias("coverage_u"),
    )


ORACLE_KNESER_NEY = r"""
WITH toks AS MATERIALIZED (
  SELECT doc_id, regexp_split_to_array(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS t
  FROM documents
),
grams AS MATERIALIZED (
  SELECT doc_id, unnest(list_filter(list_transform(list_zip(t, t[2:]),
      p -> CASE WHEN p[2] IS NULL THEN NULL ELSE p[1]||' '||p[2] END),
      x -> x IS NOT NULL)) AS ngram
  FROM toks
),
ug AS (
  SELECT term, COUNT(*) AS c1
  FROM (SELECT unnest(t) AS term FROM toks)
  WHERE term <> '' GROUP BY term
),
bg AS MATERIALIZED (
  SELECT ngram, COUNT(*) AS c2,
         split_part(ngram, ' ', 1) AS w1, split_part(ngram, ' ', 2) AS w2
  FROM grams GROUP BY ngram
),
n1p_fwd AS (SELECT w1, COUNT(*) AS n1p FROM bg GROUP BY w1),
contc AS (SELECT w2, COUNT(*) AS contc FROM bg GROUP BY w2),
n_types AS (SELECT COUNT(*) AS n_types FROM bg),
lm AS (
  SELECT ngram,
         CAST(ROUND(1000000.0 *
             (greatest(4*c2 - 3, 0) * n_types + 3 * n1p * contc)
             / (4 * c1 * n_types)) AS BIGINT) AS kn_u
  FROM bg
  JOIN ug ON bg.w1 = ug.term
  JOIN n1p_fwd USING (w1)
  JOIN contc USING (w2)
  CROSS JOIN n_types
  ORDER BY c2 DESC, ngram LIMIT 4096
),
per_doc AS (
  SELECT g.doc_id, COUNT(*) AS n_bigrams, COUNT(lm.kn_u) AS n_hits,
         COALESCE(SUM(lm.kn_u), 0) AS kn_score_u
  FROM grams g LEFT JOIN lm ON g.ngram = lm.ngram
  GROUP BY g.doc_id
)
SELECT d.doc_id,
       CAST(COALESCE(n_bigrams, 0) AS BIGINT) AS n_bigrams,
       CAST(COALESCE(n_hits, 0) AS BIGINT) AS n_hits,
       CAST(COALESCE(kn_score_u, 0) AS BIGINT) AS kn_score_u,
       CAST(CASE WHEN COALESCE(n_bigrams, 0) > 0
            THEN ROUND(1000000.0 * n_hits / n_bigrams) ELSE 0 END AS BIGINT) AS coverage_u
FROM documents d LEFT JOIN per_doc ON d.doc_id = per_doc.doc_id
"""


QUERIES = {
    "text_sample_deterministic": text_sample_deterministic,
    "text_kneser_ney_score": text_kneser_ney_score,
    "text_bigram_lm_score": text_bigram_lm_score,
    "text_language_balance": text_language_balance,
    "text_chunk_dups": text_chunk_dups,
    "text_contamination_check": text_contamination_check,
    "text_pii_scan": text_pii_scan,
    "text_tfidf_topterms": text_tfidf_topterms,
    "text_top_ngrams": text_top_ngrams,
    "text_quality_metrics": text_quality_metrics,
    "text_lang_id": text_lang_id,
    "text_fingerprint": text_fingerprint,
    "text_token_stats": text_token_stats,
    "text_weighted_sample": text_weighted_sample,
}

ORACLES = {
    "text_sample_deterministic": ORACLE_SAMPLE,
    "text_kneser_ney_score": ORACLE_KNESER_NEY,
    "text_bigram_lm_score": ORACLE_BIGRAM_LM,
    "text_language_balance": ORACLE_LANG_BALANCE,
    "text_chunk_dups": ORACLE_CHUNK_DUPS,
    "text_contamination_check": ORACLE_CONTAMINATION,
    "text_pii_scan": ORACLE_PII,
    "text_tfidf_topterms": ORACLE_TFIDF,
    "text_top_ngrams": ORACLE_TOP_NGRAMS,
    "text_quality_metrics": ORACLE_QUALITY,
    "text_lang_id": ORACLE_LANG_ID,
    "text_fingerprint": ORACLE_FINGERPRINT,
    "text_token_stats": ORACLE_TOKEN_STATS,
    "text_weighted_sample": ORACLE_WEIGHTED_SAMPLE,
}


def text_chunk_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RAG chunking: 64-token windows at stride 48 over every document
    (overlap 16). One row per (doc, window) with the window text — the
    unit a retrieval index embeds."""
    tune(spark)
    from geo_db_spark.operators.text import chunk_windows

    docs = load(spark, sf_dir, "documents")
    return chunk_windows(docs, "doc_id", "text", chunk=64, stride=48)


ORACLE_CHUNKS = r"""
WITH t AS (
  SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS toks
  FROM documents
)
SELECT doc_id,
       CAST(u.s / 48 AS BIGINT) AS chunk_id,
       CAST(u.s AS BIGINT) AS start,
       CAST(least(64, len(toks) - CAST(u.s AS INT)) AS BIGINT) AS n_chunk_tokens,
       array_to_string(list_slice(toks, CAST(u.s AS INT) + 1, CAST(u.s AS INT) + 64), ' ') AS chunk_text
FROM t, unnest(generate_series(0, len(toks) - 1, 48)) AS u(s)
WHERE u.s = 0 OR u.s - 48 + 64 < len(toks)
"""

QUERIES["text_chunk_windows"] = text_chunk_windows
ORACLES["text_chunk_windows"] = ORACLE_CHUNKS


BM25_TERMS = ("merge", "window", "stream")


def text_bm25_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 document ranking (Robertson & Zaragoza 2009) for a fixed
    3-term query, k1=1.2, b=0.75 — the classic retrieval scorer a RAG
    pipeline runs next to the vector index. Log-free idf variant: the
    raw odds ratio (N - df + 0.5)/(df + 0.5) is used WITHOUT the ln()
    wrapper, same discipline as text_tfidf_topterms (ln is not
    cross-libm reproducible; the ratio is a monotone transform of the
    standard idf per term, and the per-term saturation shape is
    untouched). Caveat: the SUM of per-term odds ratios is NOT a
    monotone transform of the standard ln-BM25 total, so the final
    ranking may diverge from textbook BM25 on multi-term queries whose
    terms differ in df — a deliberate determinism-over-fidelity
    tradeoff.

    Scale shape: tf is explode -> filter(IN terms) -> groupBy doc
    (map-side combined, terms pruned BEFORE the shuffle so only
    matching-token rows move); df/N/avgdl are two 1-row aggregates
    broadcast onto the per-doc score projection; top-100 is
    orderBy+limit (TakeOrderedAndProject, no global sort
    materialization); the rank window runs over the 100 survivors only.
    Every float op is order-mirrored in the oracle so scores are
    bit-identical."""
    tune(spark)
    from pyspark.sql import Window

    docs = load(spark, sf_dir, "documents")
    toks = F.split(F.trim(F.col("text")), r"\s+")
    base = docs.select("doc_id", toks.alias("__t"), F.size(toks).alias("dl"))

    ex = base.select("doc_id", F.explode("__t").alias("w")).filter(
        F.col("w").isin(*BM25_TERMS)
    )
    tf = ex.groupBy("doc_id").agg(
        *[
            F.sum(F.when(F.col("w") == t, F.lit(1)).otherwise(F.lit(0)))
            .cast("long")
            .alias(f"tf_{i}")
            for i, t in enumerate(BM25_TERMS)
        ]
    )
    stats = tf.agg(
        *[
            F.sum((F.col(f"tf_{i}") > 0).cast("long")).alias(f"df_{i}")
            for i in range(len(BM25_TERMS))
        ]
    )
    corpus = base.agg(
        F.count("*").alias("n_docs"), F.sum("dl").cast("long").alias("total_dl")
    )

    scored = (
        base.select("doc_id", "dl")
        .join(tf, "doc_id", "left")
        .crossJoin(F.broadcast(stats))
        .crossJoin(F.broadcast(corpus))
    )
    avgdl = F.col("total_dl").cast("double") / F.col("n_docs").cast("double")

    def part(i: int):
        tfc = F.coalesce(F.col(f"tf_{i}"), F.lit(0)).cast("double")
        idf = (
            (F.col("n_docs") - F.col(f"df_{i}")).cast("double") + F.lit(0.5)
        ) / (F.col(f"df_{i}").cast("double") + F.lit(0.5))
        inner = F.lit(0.25) + F.lit(0.75) * (F.col("dl").cast("double") / avgdl)
        return (idf * (tfc * F.lit(2.2))) / (tfc + F.lit(1.2) * inner)

    score = ((part(0) + part(1)) + part(2)).alias("score")
    top = (
        scored.select("doc_id", score)
        .orderBy(F.col("score").desc(), "doc_id")
        .limit(100)
    )
    w = Window.orderBy(F.col("score").desc(), "doc_id")
    return top.withColumn("rank", F.row_number().over(w).cast("long"))


def _bm25_part(i: int) -> str:
    return (
        f"(((CAST(n_docs - df_{i} AS DOUBLE) + 0.5) / (CAST(df_{i} AS DOUBLE) + 0.5))"
        f" * (CAST(tf_{i} AS DOUBLE) * 2.2))"
        f" / (CAST(tf_{i} AS DOUBLE) + 1.2 * (0.25 + 0.75 *"
        f" (CAST(dl AS DOUBLE) / (CAST(total_dl AS DOUBLE) / CAST(n_docs AS DOUBLE)))))"
    )


ORACLE_BM25 = rf"""
WITH base AS (
  SELECT doc_id,
         regexp_split_to_array(trim(text), '\s+') AS toks,
         len(regexp_split_to_array(trim(text), '\s+')) AS dl
  FROM documents
),
tf AS (
  SELECT doc_id, dl,
         len(list_filter(toks, x -> x = '{BM25_TERMS[0]}')) AS tf_0,
         len(list_filter(toks, x -> x = '{BM25_TERMS[1]}')) AS tf_1,
         len(list_filter(toks, x -> x = '{BM25_TERMS[2]}')) AS tf_2
  FROM base
),
stats AS (
  SELECT CAST(SUM(CASE WHEN tf_0 > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df_0,
         CAST(SUM(CASE WHEN tf_1 > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df_1,
         CAST(SUM(CASE WHEN tf_2 > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df_2,
         COUNT(*) AS n_docs,
         CAST(SUM(dl) AS BIGINT) AS total_dl
  FROM tf
)
SELECT doc_id, score,
       CAST(row_number() OVER (ORDER BY score DESC, doc_id) AS BIGINT) AS rank
FROM (
  SELECT doc_id,
         (({_bm25_part(0)} + {_bm25_part(1)}) + {_bm25_part(2)}) AS score
  FROM tf, stats
)
ORDER BY score DESC, doc_id
LIMIT 100
"""

QUERIES["text_bm25_rank"] = text_bm25_rank
ORACLES["text_bm25_rank"] = ORACLE_BM25


def text_rrf_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reciprocal-rank fusion (Cormack, Clarke & Buettcher, SIGIR'09)
    over three per-document quality signals — the standard way to blend
    incomparable rankers (here: length, lexical diversity, inverse
    stopword load) without score calibration:
    rrf = sum_i 1/(60 + rank_i), k=60 per the paper.

    Scale shape: ALL THREE global ranks come from ONE assign_stable_ids
    pass (range exchange + driver prefix sum) — NOT row_number windows,
    whose SinglePartition sort is the 100 TB killer. The three keyed
    signal sets union into one (signal, key, doc_id) table with the
    signal index as the LEADING sort key; each signal then occupies an
    exactly-n block of the global ordering, so per-signal rank =
    global_ord - signal_idx * n (the pack_epoch_shuffle block trick) —
    one exchange and one materialization instead of three (measured
    5.3 s -> ~2 s of fixed overhead at sf0.1). Negated keys turn the
    ascending contract into DESC ranks. The rank table pivots back to
    one row per doc via a groupBy on doc_id, the fusion arithmetic is
    one projection with a fixed float-add order, and top-100 is
    TakeOrderedAndProject. The final rank window runs over the 100
    survivors only."""
    tune(spark)
    from pyspark.sql import Window

    from geo_db_spark.operators.ids import assign_stable_ids

    docs = load(spark, sf_dir, "documents")
    t = F.col("text")
    toks = F.split(F.trim(t), r"\s+")
    m = docs.select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        F.size(F.array_distinct(toks)).alias("n_distinct"),
        F.size(
            F.regexp_extract_all(
                F.lower(t), F.lit(r"\b(the|a|an|and|or|of|to|in|is|it)\b"), 0
            )
        ).alias("n_stop"),
    )

    n_docs = m.count()  # bounded driver scalar: one count job
    signals = [
        ("r_len", -F.col("n_tokens")),
        ("r_div", -F.col("n_distinct")),
        ("r_stop", F.col("n_stop")),
    ]
    keyed = None
    for i, (_, col) in enumerate(signals):
        part = m.select(
            F.lit(i).alias("__sig"), col.alias("__k"), "doc_id"
        )
        keyed = part if keyed is None else keyed.unionByName(part)
    ranked = assign_stable_ids(keyed, ["__sig", "__k", "doc_id"], "g_ord")
    per_sig = ranked.select(
        "doc_id",
        *[
            F.when(F.col("__sig") == i, F.col("g_ord") - F.lit(i) * F.lit(n_docs))
            .alias(name)
            for i, (name, _) in enumerate(signals)
        ],
    )
    ranks = m.join(
        per_sig.groupBy("doc_id").agg(
            *[F.max(name).alias(name) for name, _ in signals]
        ),
        "doc_id",
    )
    rrf = (
        (
            F.lit(1.0) / (F.lit(60) + F.col("r_len")).cast("double")
            + F.lit(1.0) / (F.lit(60) + F.col("r_div")).cast("double")
        )
        + F.lit(1.0) / (F.lit(60) + F.col("r_stop")).cast("double")
    ).alias("rrf")
    top = (
        ranks.select("doc_id", "r_len", "r_div", "r_stop", rrf)
        .orderBy(F.col("rrf").desc(), "doc_id")
        .limit(100)
    )
    w = Window.orderBy(F.col("rrf").desc(), "doc_id")
    return top.withColumn("rank", F.row_number().over(w).cast("long"))


ORACLE_RRF = r"""
WITH m AS (
  SELECT doc_id,
         len(regexp_split_to_array(trim(text), '\s+')) AS n_tokens,
         len(list_distinct(regexp_split_to_array(trim(text), '\s+'))) AS n_distinct,
         len(regexp_extract_all(lower(text), '\b(the|a|an|and|or|of|to|in|is|it)\b')) AS n_stop
  FROM documents
),
r AS (
  SELECT doc_id,
         CAST(row_number() OVER (ORDER BY -n_tokens, doc_id) AS BIGINT) AS r_len,
         CAST(row_number() OVER (ORDER BY -n_distinct, doc_id) AS BIGINT) AS r_div,
         CAST(row_number() OVER (ORDER BY n_stop, doc_id) AS BIGINT) AS r_stop
  FROM m
)
SELECT doc_id, r_len, r_div, r_stop,
       ((1.0 / CAST(60 + r_len AS DOUBLE) + 1.0 / CAST(60 + r_div AS DOUBLE))
         + 1.0 / CAST(60 + r_stop AS DOUBLE)) AS rrf,
       CAST(row_number() OVER (
         ORDER BY ((1.0 / CAST(60 + r_len AS DOUBLE) + 1.0 / CAST(60 + r_div AS DOUBLE))
                    + 1.0 / CAST(60 + r_stop AS DOUBLE)) DESC, doc_id) AS BIGINT) AS rank
FROM r
ORDER BY rrf DESC, doc_id
LIMIT 100
"""

QUERIES["text_rrf_fusion"] = text_rrf_fusion
ORACLES["text_rrf_fusion"] = ORACLE_RRF


def text_nfc_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unicode NFC + control-strip cleanup over an adversarial
    augmentation of the corpus: each doc gets doc_id%3 BEL controls and
    a trailing e+combining-acute (even ids, composes under NFC) or a
    precomposed \u00e9 (odd ids, already NFC) — so n_controls_removed
    and changed genuinely vary per row and the value oracle exercises
    composition, stripping, and the no-op path."""
    tune(spark)
    from geo_db_spark.operators.text import nfc_normalize_clean

    docs = load(spark, sf_dir, "documents")
    aug = docs.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(" x"),
            F.repeat(F.lit("\u0007"), (F.col("doc_id") % 3).cast("int")),
            F.when(F.col("doc_id") % 2 == 0, F.lit("e\u0301")).otherwise(
                F.lit("\u00e9")
            ),
        ).alias("text"),
    )
    return nfc_normalize_clean(aug, "doc_id", "text")


ORACLE_NFC = r"""
WITH aug AS (
  SELECT doc_id,
         text || ' x' || repeat(chr(7), CAST(doc_id % 3 AS INT))
              || CASE WHEN doc_id % 2 = 0 THEN 'e' || chr(769) ELSE chr(233) END AS text
  FROM documents
),
s AS (
  SELECT doc_id, text,
         regexp_replace(text, '[\x00-\x08\x0B-\x1F\x7F]', '', 'g') AS stripped
  FROM aug
)
SELECT doc_id,
       nfc_normalize(stripped) AS norm_text,
       CAST(length(text) - length(stripped) AS BIGINT) AS n_controls_removed,
       nfc_normalize(stripped) <> text AS changed
FROM s
"""

QUERIES["text_nfc_normalize"] = text_nfc_normalize
ORACLES["text_nfc_normalize"] = ORACLE_NFC


BPE_ROUNDS = 8


def text_bpe_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed BPE tokenizer training (Sennrich ACL'16) over the
    document corpus: lowercase [a-z]+ word vocabulary with counts, then
    8 merge rounds — each one pair-count shuffle over the VOCABULARY
    (never the corpus), one TakeOrdered(1) scalar, one replace
    projection (operators/text.bpe_train_merges). Returns the ordered
    merge table (rank, left, right, merged, cnt) — the artifact a
    tokenizer build actually ships. The oracle replays all 8 rounds as
    chained CTEs: the <sym>-wrapped string representation makes 'apply
    a merge' a plain replace() with identical left-to-right
    non-overlap semantics in both engines, so a tie-break, counting or
    merge-application bug anywhere flips the value hash."""
    tune(spark)
    from geo_db_spark.operators.text import bpe_train_merges

    docs = load(spark, sf_dir, "documents")
    vocab = (
        docs.select(
            F.explode(
                F.regexp_extract_all(F.lower(F.col("text")), F.lit("[a-z]+"), 0)
            ).alias("word")
        )
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    merges = bpe_train_merges(vocab, rounds=BPE_ROUNDS)
    rows = [
        (i + 1, a, b, m, c) for i, (a, b, m, c) in enumerate(merges)
    ]
    return spark.createDataFrame(
        rows, "rank int, left string, right string, merged string, cnt long"
    )


def _bpe_prefix(rounds: int = BPE_ROUNDS) -> str:
    """Chained-CTE BPE training replay: words -> e0 -> (p{r}, b{r},
    e{r}) per round. b{r} holds round r's winning pair, e{rounds} the
    fully-merged vocabulary — shared by the merge-table and the
    vocab-stats oracles."""
    split = "string_split(trim(e, '<>'), '><')"
    sql = r"""
WITH words AS (
  SELECT w AS word, CAST(COUNT(*) AS BIGINT) AS n
  FROM (SELECT unnest(regexp_extract_all(lower(text), '[a-z]+')) AS w FROM documents)
  GROUP BY 1
),
e0 AS (SELECT regexp_replace(word, '(.)', '<\1>', 'g') AS e, n FROM words)"""
    for r in range(1, rounds + 1):
        prev = f"e{r - 1}"
        sql += f""",
p{r} AS (
  SELECT pr[1] AS a, pr[2] AS b, SUM(n) AS c
  FROM {prev},
       UNNEST(list_zip(
           list_slice({split}, 1, len({split}) - 1),
           list_slice({split}, 2, len({split})))) AS t(pr)
  GROUP BY 1, 2
),
b{r} AS (SELECT a, b, c FROM p{r} ORDER BY c DESC, a, b LIMIT 1),
e{r} AS (
  -- LEFT JOIN so a DRY round (no pairs anywhere: b{{r}} empty) leaves
  -- the vocabulary UNCHANGED instead of emptying it — mirroring the
  -- Spark trainer's early break (review r8 finding); '<><>' never
  -- matches a framed symbol, so the coalesced no-op is safe
  SELECT replace({prev}.e,
                 '<' || COALESCE(b{r}.a, '') || '><' || COALESCE(b{r}.b, '') || '>',
                 '<' || COALESCE(b{r}.a, '') || COALESCE(b{r}.b, '') || '>') AS e, n
  FROM {prev} LEFT JOIN b{r} ON TRUE
)"""
    return sql


def _bpe_oracle(rounds: int = BPE_ROUNDS) -> str:
    union = "\nUNION ALL\n".join(
        f"SELECT {r} AS rank, a AS \"left\", b AS \"right\", a || b AS merged, "
        f"CAST(c AS BIGINT) AS cnt FROM b{r}"
        for r in range(1, rounds + 1)
    )
    return _bpe_prefix(rounds) + "\n" + union


QUERIES["text_bpe_merges"] = text_bpe_merges
ORACLES["text_bpe_merges"] = _bpe_oracle()


def text_bpe_vocab_top(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The encoding half of BPE: apply the 8 trained merges to the
    whole vocabulary (the same replace chain, in rank order) and emit
    the corpus's top-20 subword tokens by occurrence count — the vocab
    statistic a tokenizer build reports. Shares the training run with
    text_bpe_merges; everything stays vocabulary-bound, the final
    aggregate is one explode + groupBy + TakeOrdered(20). The oracle
    replays training AND application in one chained-CTE chain."""
    tune(spark)
    from geo_db_spark.operators.text import bpe_train_merges

    docs = load(spark, sf_dir, "documents")
    vocab = (
        docs.select(
            F.explode(
                F.regexp_extract_all(F.lower(F.col("text")), F.lit("[a-z]+"), 0)
            ).alias("word")
        )
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
        .localCheckpoint(eager=True)
    )
    merges = bpe_train_merges(vocab, rounds=BPE_ROUNDS)
    enc = F.regexp_replace(F.col("word"), r"(.)", r"<$1>")
    for a, b, m, _c in merges:
        enc = F.replace(enc, F.lit(f"<{a}><{b}>"), F.lit(f"<{m}>"))
    syms = F.split(F.regexp_replace(enc, r"^<|>$", ""), "><")
    return (
        vocab.select(F.explode(syms).alias("token"), "n")
        .groupBy("token")
        .agg(F.sum("n").alias("cnt"))
        .orderBy(F.col("cnt").desc(), "token")
        .limit(20)
    )


def _bpe_vocab_oracle(rounds: int = BPE_ROUNDS) -> str:
    split = "string_split(trim(e, '<>'), '><')"
    return _bpe_prefix(rounds) + f"""
SELECT token, CAST(SUM(n) AS BIGINT) AS cnt
FROM e{rounds}, UNNEST({split}) AS t(token)
GROUP BY token
ORDER BY cnt DESC, token
LIMIT 20
"""


QUERIES["text_bpe_vocab_top"] = text_bpe_vocab_top
ORACLES["text_bpe_vocab_top"] = _bpe_vocab_oracle()


# Batched BPE (r8 verdict next #2): up to BPE_BATCH_M symbol-disjoint
# merges per round from a BPE_BATCH_K-candidate window — ~m x fewer
# driver round-trips / vocabulary re-materializations per merge than
# the sequential trainer, the step toward production merge counts.
BPE_BATCH_M = 8
BPE_BATCH_K = 32


def text_bpe_merges_batched(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BATCHED BPE training: 8 rounds x up to 8 pairwise-disjoint
    merges per round (operators/text.bpe_train_merges batch_m=8) —
    up to 64 merges for the SAME per-round job count as the 8-merge
    sequential trainer (one pair-count shuffle, one bounded 32-row
    collect, one replace-chain projection per round). Disjointness
    (no shared left/right/merged symbol with any higher-ranked
    candidate) makes each batch order-independent and count-invariant,
    so the oracle can replay the selection rule exactly: rank top-32
    by (count DESC, left, right), anti-join away candidates
    conflicting with a higher-ranked one, keep the first 8 survivors.
    Returns the ordered merge table (rank, left, right, merged, cnt)."""
    tune(spark)
    from geo_db_spark.operators.text import bpe_train_merges

    docs = load(spark, sf_dir, "documents")
    vocab = (
        docs.select(
            F.explode(
                F.regexp_extract_all(F.lower(F.col("text")), F.lit("[a-z]+"), 0)
            ).alias("word")
        )
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    merges = bpe_train_merges(
        vocab, rounds=BPE_ROUNDS, batch_m=BPE_BATCH_M, cand_k=BPE_BATCH_K
    )
    rows = [(i + 1, a, b, m, c) for i, (a, b, m, c) in enumerate(merges)]
    return spark.createDataFrame(
        rows, "rank int, left string, right string, merged string, cnt long"
    )


def _bpe_batched_oracle(
    rounds: int = BPE_ROUNDS, m: int = BPE_BATCH_M, k: int = BPE_BATCH_K
) -> str:
    """Chained-CTE replay of the BATCHED trainer: per round, candidate
    ranking -> conservative disjoint filter (NOT EXISTS against
    higher-ranked candidates) -> first m survivors -> one nested
    replace chain (scalar subqueries per survivor slot, COALESCE'd to
    the never-matching '<><>' no-op when a slot is empty)."""
    split = "string_split(trim(e, '<>'), '><')"
    sql = r"""
WITH words AS (
  SELECT w AS word, CAST(COUNT(*) AS BIGINT) AS n
  FROM (SELECT unnest(regexp_extract_all(lower(text), '[a-z]+')) AS w FROM documents)
  GROUP BY 1
),
e0 AS (SELECT regexp_replace(word, '(.)', '<\1>', 'g') AS e, n FROM words)"""
    for r in range(1, rounds + 1):
        prev = f"e{r - 1}"
        tri = "(x.a, x.b, x.a || x.b)"
        repl = f"{prev}.e"
        for i in range(1, m + 1):
            src = (
                f"COALESCE((SELECT '<' || a || '><' || b || '>' "
                f"FROM k{r} WHERE srk = {i}), '<><>')"
            )
            dst = (
                f"COALESCE((SELECT '<' || a || b || '>' "
                f"FROM k{r} WHERE srk = {i}), '')"
            )
            repl = f"replace({repl},\n       {src},\n       {dst})"
        sql += f""",
p{r} AS (
  SELECT pr[1] AS a, pr[2] AS b, SUM(n) AS c
  FROM {prev},
       UNNEST(list_zip(
           list_slice({split}, 1, len({split}) - 1),
           list_slice({split}, 2, len({split})))) AS t(pr)
  GROUP BY 1, 2
),
c{r} AS MATERIALIZED (
  SELECT a, b, c, row_number() OVER (ORDER BY c DESC, a, b) AS rk
  FROM p{r} ORDER BY c DESC, a, b LIMIT {k}
),
s{r} AS (
  SELECT x.a, x.b, x.c, row_number() OVER (ORDER BY x.rk) AS srk
  FROM c{r} x
  WHERE NOT EXISTS (
    SELECT 1 FROM c{r} y
    WHERE y.rk < x.rk AND (
      y.a IN {tri} OR y.b IN {tri} OR (y.a || y.b) IN {tri}))
),
k{r} AS MATERIALIZED (SELECT a, b, c, srk FROM s{r} WHERE srk <= {m}),
e{r} AS MATERIALIZED (
  SELECT {repl} AS e, n
  FROM {prev}
)"""
    union = "\nUNION ALL\n".join(
        f"SELECT {r} AS round, srk, a, b, c FROM k{r}"
        for r in range(1, rounds + 1)
    )
    return sql + f"""
SELECT CAST(row_number() OVER (ORDER BY round, srk) AS INT) AS rank,
       a AS "left", b AS "right", a || b AS merged, CAST(c AS BIGINT) AS cnt
FROM ({union})
"""


QUERIES["text_bpe_merges_batched"] = text_bpe_merges_batched
ORACLES["text_bpe_merges_batched"] = _bpe_batched_oracle()


def text_bpe_doc_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-DOCUMENT token counts under the trained BPE merges (r9) —
    the "how many tokens is my corpus" question every training run
    starts with. Scale-right application: the replace chain runs over
    the distinct VOCABULARY only (word -> subtoken count, a
    vocabulary-bound table), then each document's word stream joins
    that table and aggregates — the merges never touch per-occurrence
    text. Emits (doc_id, n_words, n_tokens); the oracle replays
    training, per-word encoding and the join."""
    tune(spark)
    from geo_db_spark.operators.text import bpe_train_merges

    docs = load(spark, sf_dir, "documents")
    words = docs.select(
        "doc_id",
        F.explode(
            F.regexp_extract_all(F.lower(F.col("text")), F.lit("[a-z]+"), 0)
        ).alias("word"),
    )
    vocab = (
        words.groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
        .localCheckpoint(eager=True)
    )
    merges = bpe_train_merges(vocab, rounds=BPE_ROUNDS)
    enc = F.regexp_replace(F.col("word"), r"(.)", r"<$1>")
    for a, b, m, _c in merges:
        enc = F.replace(enc, F.lit(f"<{a}><{b}>"), F.lit(f"<{m}>"))
    n_sub = F.size(F.split(F.regexp_replace(enc, r"^<|>$", ""), "><"))
    wtok = vocab.select("word", n_sub.alias("n_sub"))
    return (
        words.join(wtok, "word")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_words"),
            F.sum("n_sub").alias("n_tokens"),
        )
    )


def _bpe_doc_tokens_oracle(rounds: int = BPE_ROUNDS) -> str:
    split = "string_split(trim(e, '<>'), '><')"
    return _bpe_prefix(rounds) + f""",
wtok AS (
  SELECT replace(replace(e, '<', ''), '>', '') AS word,
         len({split}) AS n_sub
  FROM e{rounds}
),
dw AS (
  SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z]+')) AS word
  FROM documents
)
SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_words,
       CAST(SUM(n_sub) AS BIGINT) AS n_tokens
FROM dw JOIN wtok USING (word)
GROUP BY doc_id
"""


QUERIES["text_bpe_doc_tokens"] = text_bpe_doc_tokens
ORACLES["text_bpe_doc_tokens"] = _bpe_doc_tokens_oracle()


def text_odds_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-trained linear text classifier, the fastText-style
    quality/language-filter scoring shape (Joulin et al. 2017 run a
    linear model over pooled token features; CCNet and the Llama/
    RedPajama pipelines deploy exactly such binary keep/drop filters):
    label = (lang = 'en'); per-term weights are LAPLACE-SMOOTHED CLASS
    ODDS kept log-free by the BM25/tfidf discipline (ln is not
    cross-libm reproducible):

      w(term) = round(1e6 * (c_pos+1)(N_neg+V) / ((c_neg+1)(N_pos+V)))

    where c_pos/c_neg are the term's occurrence counts inside/outside
    the class, N_* the class token totals and V the vocabulary size —
    every factor an exact integer, so the weight is one IEEE division
    + half-up round. The model keeps the top-4096 terms by a total
    order ((c_pos+c_neg) DESC, term), so scoring is a BROADCAST probe;
    a document's score is the exact integer sum of matched weights and
    its prediction compares the mean matched odds against neutral 1.0
    (odds_sum_u > 1e6 * n_hits). Train + score are two shuffles over
    skinny (term) rows — the 100 TB plan of text_bigram_lm_score."""
    tune(spark)
    docs = load(spark, sf_dir, "documents")
    norm = F.trim(F.regexp_replace(F.lower(F.col("text")), r"\s+", " "))
    toks = docs.select(
        "doc_id",
        (F.col("lang") == "en").cast("int").alias("pos"),
        F.explode(F.split(norm, " ")).alias("term"),
    ).filter(F.col("term") != "")
    stats = toks.groupBy("term").agg(
        F.sum("pos").alias("c_pos"),
        F.sum(F.lit(1) - F.col("pos")).alias("c_neg"),
    )
    totals = stats.agg(
        F.sum("c_pos").alias("n_pos"),
        F.sum("c_neg").alias("n_neg"),
        F.count(F.lit(1)).alias("v"),
    )
    w = (
        F.round(
            F.lit(1000000.0)
            * ((F.col("c_pos") + 1) * (F.col("n_neg") + F.col("v")))
            / ((F.col("c_neg") + 1) * (F.col("n_pos") + F.col("v")))
        )
        .cast("long")
        .alias("w_u")
    )
    model = (
        stats.crossJoin(F.broadcast(totals))
        .orderBy((F.col("c_pos") + F.col("c_neg")).desc(), F.col("term"))
        .limit(LM_TOP_B)
        .select("term", w)
    )
    per_doc = (
        toks.join(F.broadcast(model), "term", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.count("w_u").alias("n_hits"),
            F.coalesce(F.sum("w_u"), F.lit(0)).alias("odds_sum_u"),
        )
    )
    nh = F.coalesce(F.col("n_hits"), F.lit(0))
    return docs.select("doc_id", (F.col("lang") == "en").cast("int").alias("label")).join(
        per_doc, "doc_id", "left"
    ).select(
        "doc_id",
        "label",
        F.coalesce(F.col("n_tokens"), F.lit(0)).cast("long").alias("n_tokens"),
        nh.cast("long").alias("n_hits"),
        F.coalesce(F.col("odds_sum_u"), F.lit(0)).cast("long").alias("odds_sum_u"),
        (F.coalesce(F.col("odds_sum_u"), F.lit(0)) > F.lit(1000000) * nh)
        .cast("int")
        .alias("pred"),
    )


ORACLE_ODDS_CLASSIFIER = r"""
WITH toks AS MATERIALIZED (
  SELECT doc_id, CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS pos, term
  FROM (
    SELECT doc_id, lang,
           unnest(regexp_split_to_array(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ')) AS term
    FROM documents
  ) WHERE term <> ''
),
stats AS MATERIALIZED (
  SELECT term, SUM(pos) AS c_pos, SUM(1 - pos) AS c_neg
  FROM toks GROUP BY term
),
totals AS (
  SELECT SUM(c_pos) AS n_pos, SUM(c_neg) AS n_neg, COUNT(*) AS v FROM stats
),
model AS (
  SELECT term,
         CAST(ROUND(1000000.0 * ((c_pos + 1) * (n_neg + v))
                    / ((c_neg + 1) * (n_pos + v))) AS BIGINT) AS w_u
  FROM stats CROSS JOIN totals
  ORDER BY (c_pos + c_neg) DESC, term LIMIT 4096
),
per_doc AS (
  SELECT t.doc_id, COUNT(*) AS n_tokens, COUNT(m.w_u) AS n_hits,
         COALESCE(SUM(m.w_u), 0) AS odds_sum_u
  FROM toks t LEFT JOIN model m ON t.term = m.term
  GROUP BY t.doc_id
)
SELECT d.doc_id,
       CAST(CASE WHEN d.lang = 'en' THEN 1 ELSE 0 END AS INT) AS label,
       CAST(COALESCE(n_tokens, 0) AS BIGINT) AS n_tokens,
       CAST(COALESCE(n_hits, 0) AS BIGINT) AS n_hits,
       CAST(COALESCE(odds_sum_u, 0) AS BIGINT) AS odds_sum_u,
       CAST(CASE WHEN COALESCE(odds_sum_u, 0) > 1000000 * COALESCE(n_hits, 0)
            THEN 1 ELSE 0 END AS INT) AS pred
FROM documents d LEFT JOIN per_doc ON d.doc_id = per_doc.doc_id
"""

QUERIES["text_odds_classifier"] = text_odds_classifier
ORACLES["text_odds_classifier"] = ORACLE_ODDS_CLASSIFIER
