"""Corpus-curation operators for training-data pipelines (engine-growth
contract; no reference counterpart). Implements the public quality-filter
families used by large-scale LLM corpus builds:

- Gopher-style repetition signals (Rae et al. 2021, "Scaling Language
  Models: ..."): top-word / top-n-gram fraction, duplicate-word fraction.
- C4-style document filter flags (Raffel et al. 2020): length, word-shape
  and boilerplate heuristics, folded into a single keep decision.
- Exact duplicate-span detection (Lee et al. 2022, "Deduplicating
  Training Data Makes Language Models Better"): stride-1 k-token windows
  shared across documents, plus longest consecutive dup run per doc.

Everything is built-in column expressions + joins — JVM-side, whole-stage
codegen, no Python UDFs. Fractions are a single IEEE division of two
exact integers so DuckDB oracles hash-match bit-for-bit.

Scale shapes (100 TB):
- repetition signals: one explode of the token array shuffled by
  (doc_id, gram) with map-side partial aggregation; gram cardinality is
  bounded by corpus token count, never quadratic.
- filter flags: pure per-row expressions, no shuffle at all.
- dup spans: windows shuffle by a 64-bit xxhash of the window text (the
  payload never shuffles); the dup-hash set is the only join input, and
  the per-doc run-length pass rides one doc_id-partitioned sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from geo_db_spark.operators.text import token_count


def _tokens(text_col: str):
    return F.split(F.trim(F.col(text_col)), r"\s+")


def gopher_repetition(df: DataFrame, id_col: str = "doc_id",
                      text_col: str = "text") -> DataFrame:
    """Per-document repetition signals over whitespace tokens:

    - ``top_word_frac``   = count of the most frequent word / n_tokens
    - ``dup_word_frac``   = 1 - n_distinct_words / n_tokens
    - ``top_2gram_frac``  = count of the most frequent 2-gram / (n_tokens-1)
    - ``top_3gram_frac``  = count of the most frequent 3-gram / (n_tokens-2)

    One explode; 2/3-grams are formed with ``lead`` over the in-document
    position (a single doc_id-partitioned sort), then each gram size is a
    (doc_id, gram) partial-aggregated count. Only the max count per doc is
    kept — the argmax gram itself never leaves the aggregation.
    """
    base = df.select(
        F.col(id_col),
        F.posexplode(_tokens(text_col)).alias("pos", "w1"),
    )
    w = Window.partitionBy(id_col).orderBy("pos")
    grams = (
        base.withColumn("nx1", F.lead("w1", 1).over(w))
        .withColumn("nx2", F.lead("w1", 2).over(w))
        .select(
            id_col,
            "w1",
            F.when(F.col("nx1").isNotNull(),
                   F.concat_ws(" ", "w1", "nx1")).alias("g2"),
            F.when(F.col("nx2").isNotNull(),
                   F.concat_ws(" ", "w1", "nx1", "nx2")).alias("g3"),
        )
    )

    def _top(col: str, distinct: bool) -> DataFrame:
        per = (
            grams.filter(F.col(col).isNotNull())
            .groupBy(id_col, col)
            .agg(F.count(F.lit(1)).alias("c"))
        )
        aggs = [F.max("c").alias(f"max_{col}"), F.sum("c").alias(f"n_{col}")]
        if distinct:
            aggs.append(F.count(F.lit(1)).alias(f"d_{col}"))
        return per.groupBy(id_col).agg(*aggs)

    words = _top("w1", distinct=True)
    g2 = _top("g2", distinct=False)
    g3 = _top("g3", distinct=False)
    out = (
        words.join(g2, id_col, "left")
        .join(g3, id_col, "left")
        .select(
            id_col,
            F.col("n_w1").alias("n_tokens"),
            (F.col("max_w1").cast("double") / F.col("n_w1")).alias("top_word_frac"),
            (F.lit(1.0) - F.col("d_w1").cast("double") / F.col("n_w1")).alias("dup_word_frac"),
            F.coalesce(F.col("max_g2").cast("double") / F.col("n_g2"), F.lit(0.0)).alias("top_2gram_frac"),
            F.coalesce(F.col("max_g3").cast("double") / F.col("n_g3"), F.lit(0.0)).alias("top_3gram_frac"),
        )
    )
    return out


# C4 thresholds (public heuristics; values fixed here for determinism).
C4_MIN_TOKENS = 30
C4_MEAN_WORD_LEN_MIN = 3.0
C4_MEAN_WORD_LEN_MAX = 10.0
C4_BOILERPLATE = ("lorem ipsum", "javascript", "terms of use", "cookie policy")


def c4_filter_flags(df: DataFrame, id_col: str = "doc_id",
                    text_col: str = "text") -> DataFrame:
    """C4-style per-document filter flags, each as 0/1 INT (canon-stable),
    plus the folded ``keep`` decision. Pure row-local expressions — no
    shuffle; at 100 TB this is a map-only pass that fuses into the scan.

    ``f_no_terminal_punct`` is REPORTED but deliberately NOT folded into
    ``keep``: in C4 the terminal-punctuation rule is applied per LINE
    (dropping lines, not documents); folding it at document granularity
    would discard every document whose final line is a heading or list
    item. Callers doing line-level cleanup consume the flag directly.

    mean word length uses non-space chars / n_tokens so it is a single
    IEEE division of two exact integers.
    """
    t = F.col(text_col)
    low = F.lower(t)
    n_tok = token_count(t)
    n_word_chars = F.length(F.regexp_replace(t, r"\s", ""))
    mean_wlen = n_word_chars.cast("double") / n_tok
    too_short = (n_tok < C4_MIN_TOKENS)
    bad_word_len = (mean_wlen < C4_MEAN_WORD_LEN_MIN) | (mean_wlen > C4_MEAN_WORD_LEN_MAX)
    no_terminal_punct = ~t.rlike(r"[.!?]\s*$")
    has_curly = t.contains("{")
    boiler = F.lit(False)
    for marker in C4_BOILERPLATE:
        boiler = boiler | low.contains(marker)
    keep = ~(too_short | bad_word_len | has_curly | boiler)
    return df.select(
        id_col,
        n_tok.alias("n_tokens"),
        mean_wlen.alias("mean_word_len"),
        too_short.cast("int").alias("f_too_short"),
        bad_word_len.cast("int").alias("f_bad_word_len"),
        no_terminal_punct.cast("int").alias("f_no_terminal_punct"),
        has_curly.cast("int").alias("f_has_curly"),
        boiler.cast("int").alias("f_boilerplate"),
        keep.cast("int").alias("keep"),
    )


def dup_spans(df: DataFrame, id_col: str = "doc_id", text_col: str = "text",
              k: int = 8) -> DataFrame:
    """Exact duplicate-span detection: stride-1 windows of ``k`` whitespace
    tokens; a window is *dup* when its text occurs in >= 2 distinct
    documents. Per document returns:

    - ``n_windows``      total stride-1 windows (n_tokens - k + 1, >= 0)
    - ``n_dup_windows``  windows whose text appears in another document
    - ``max_dup_run``    longest consecutive run of dup windows (the
      length proxy for the longest shared substring)

    Scale shape: tokens explode once, the k-token window is assembled as
    ``k-1`` ``lead`` columns over one doc_id-partitioned sort (whole-stage
    codegen — never an interpreted array lambda building window strings),
    and only (xxhash64(k token columns), doc_id, pos) shuffles on. The dup
    decision is a count-distinct-docs per hash riding that shuffle; run
    lengths are gaps-and-islands over the same doc_id partitioning. Window
    text is never materialized as a string anywhere: equality of the k
    hashed token columns IS token-sequence equality.
    """
    base = df.select(F.col(id_col), F.col(text_col))
    ex = base.select(
        id_col, F.posexplode(_tokens(text_col)).alias("pos", "w0")
    )
    lw = Window.partitionBy(id_col).orderBy("pos")
    lead_cols = [F.lead("w0", i).over(lw).alias(f"w{i}") for i in range(1, k)]
    win = (
        ex.select(id_col, "pos", "w0", *lead_cols)
        .filter(F.col(f"w{k - 1}").isNotNull())
        .select(
            id_col,
            "pos",
            F.xxhash64(*[f"w{i}" for i in range(k)]).alias("h"),
        )
    )

    dup_h = (
        win.groupBy("h")
        .agg(F.count_distinct(F.col(id_col)).alias("nd"))
        .filter(F.col("nd") >= 2)
        .select("h")
    )
    flagged = win.join(dup_h, "h", "left_semi")

    # gaps-and-islands: consecutive dup positions share (pos - rank).
    rw = Window.partitionBy(id_col).orderBy("pos")
    runs = (
        flagged.withColumn("grp", F.col("pos") - F.row_number().over(rw))
        .groupBy(id_col, "grp")
        .agg(F.count(F.lit(1)).alias("run"))
        .groupBy(id_col)
        .agg(F.max("run").alias("max_dup_run"),
             F.sum("run").alias("n_dup_windows"))
    )
    totals = base.select(
        id_col,
        F.greatest(token_count(F.col(text_col)) - (k - 1), F.lit(0)).alias("n_windows"),
    )
    return (
        totals.join(runs, id_col, "left")
        .select(
            id_col,
            "n_windows",
            F.coalesce(F.col("n_dup_windows"), F.lit(0)).cast("bigint").alias("n_dup_windows"),
            F.coalesce(F.col("max_dup_run"), F.lit(0)).cast("bigint").alias("max_dup_run"),
        )
    )


def dup_span_removal(df: DataFrame, id_col: str = "doc_id", text_col: str = "text",
                     k: int = 8) -> DataFrame:
    """The EXCISION step on top of `dup_spans` (Lee et al. 2022,
    "Deduplicating Training Data Makes Language Models Better" — remove
    the duplicated substring, keep the rest of both documents): every
    token covered by any cross-document duplicate k-window is dropped,
    the survivors are re-joined in order. Per document returns

    - ``n_tokens``   original whitespace token count
    - ``n_kept``     tokens NOT covered by a dup window
    - ``kept_frac``  n_kept / n_tokens (0.0 for empty docs)
    - ``kept_md5``   md5 of the space-joined kept tokens ('' when none) —
      the value oracle proves the rebuilt TEXT, not just the counts

    Scale shape: same single doc_id-partitioned spine as `dup_spans`
    (windows via lead, dup decision via count-distinct-docs on the window
    hash). Coverage is NOT a range join or a k-wide explode: flagged
    window STARTS are left-joined back to token rows (doc_id, pos) and a
    running max over the same doc partitioning marks every token within
    k-1 of the last start — one window pass, zero extra shuffles beyond
    the hash groupBy that dup_spans already pays. The per-doc
    reassembly (sorted collect of kept tokens) holds one document of
    tokens at a time — the same bound any per-doc text op has.
    """
    base = df.select(F.col(id_col), F.col(text_col))
    ex = base.select(id_col, F.posexplode(_tokens(text_col)).alias("pos", "w0"))
    lw = Window.partitionBy(id_col).orderBy("pos")
    lead_cols = [F.lead("w0", i).over(lw).alias(f"w{i}") for i in range(1, k)]
    win = (
        ex.select(id_col, "pos", "w0", *lead_cols)
        .filter(F.col(f"w{k - 1}").isNotNull())
        .select(id_col, "pos", F.xxhash64(*[f"w{i}" for i in range(k)]).alias("h"))
    )
    dup_h = (
        win.groupBy("h")
        .agg(F.count_distinct(F.col(id_col)).alias("nd"))
        .filter(F.col("nd") >= 2)
        .select("h")
    )
    starts = win.join(dup_h, "h", "left_semi").select(
        F.col(id_col).alias("__sid"),
        F.col("pos").alias("spos"),
        F.lit(True).alias("is_start"),
    )
    marked = ex.join(
        starts,
        (F.col(id_col) == F.col("__sid")) & (F.col("pos") == F.col("spos")),
        "left",
    ).select(id_col, "pos", "w0", "is_start")
    runmax = F.max(F.when(F.col("is_start"), F.col("pos"))).over(
        Window.partitionBy(id_col).orderBy("pos").rowsBetween(
            Window.unboundedPreceding, Window.currentRow
        )
    )
    toks = marked.withColumn(
        "covered",
        runmax.isNotNull() & ((F.col("pos") - runmax) <= F.lit(k - 1)),
    )
    kept = (
        toks.filter(~F.col("covered"))
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_kept"),
            F.concat_ws(
                " ",
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "w0"))),
                    lambda s: s["w0"],
                ),
            ).alias("kept_text"),
        )
    )
    totals = base.select(id_col, token_count(F.col(text_col)).alias("n_tokens"))
    return totals.join(kept, id_col, "left").select(
        id_col,
        F.col("n_tokens").cast("bigint").alias("n_tokens"),
        F.coalesce(F.col("n_kept"), F.lit(0)).cast("bigint").alias("n_kept"),
        F.when(F.col("n_tokens") > 0,
               F.coalesce(F.col("n_kept"), F.lit(0)).cast("double") / F.col("n_tokens"))
         .otherwise(F.lit(0.0)).alias("kept_frac"),
        F.md5(F.coalesce(F.col("kept_text"), F.lit(""))).alias("kept_md5"),
    )
