"""Text-analysis operators for training-data pipelines (engine-growth
contract; no reference counterpart). All built-in expressions — JVM-side,
whole-stage codegen, no UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def token_count(col: Column) -> Column:
    """Whitespace token count."""
    return F.size(F.split(F.trim(col), r"\s+"))


def word_tokens(col: Column) -> Column:
    """BPE-ish regex tokenization: words, numbers, punctuation runs."""
    return F.regexp_extract_all(col, F.lit(r"[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]"), 0)


def quality_metrics(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document quality features: length, token stats, alpha/space/punct
    ratios, stopword ratio. Single pass over the text column; every metric
    is an exact integer or a single IEEE division (oracle-stable).
    """
    t = F.col(text_col)
    n_chars = F.length(t)
    n_alpha = F.length(F.regexp_replace(t, r"[^a-zA-Z]", ""))
    n_space = F.length(F.regexp_replace(t, r"[^ ]", ""))
    n_punct = F.length(F.regexp_replace(t, r"[a-zA-Z0-9\s]", ""))
    n_tok = token_count(t)
    n_stop = F.size(
        F.regexp_extract_all(
            F.lower(t), F.lit(r"\b(the|a|an|and|or|of|to|in|is|it)\b"), 0
        )
    )
    return df.select(
        "*",
        n_chars.alias("n_chars_calc"),
        n_tok.alias("n_tokens"),
        (n_alpha.cast("double") / n_chars).alias("alpha_ratio"),
        (n_space.cast("double") / n_chars).alias("space_ratio"),
        (n_punct.cast("double") / n_chars).alias("punct_ratio"),
        (n_stop.cast("double") / n_tok).alias("stopword_ratio"),
        (n_chars.cast("double") / n_tok).alias("mean_token_len"),
    )


# Tiny per-language marker lexicons for the n-gram/stopword language-ID
# heuristic. Deliberately small and deterministic.
LANG_MARKERS: dict[str, str] = {
    "en": r"\b(the|and|of|is|with)\b",
    "fr": r"\b(le|la|les|et|est)\b",
    "es": r"\b(el|los|las|y|es)\b",
    "de": r"\b(der|die|das|und|ist)\b",
}


def lang_scores(col: Column) -> list[Column]:
    lc = F.lower(col)
    return [
        F.size(F.regexp_extract_all(lc, F.lit(pat), 0)).alias(f"score_{lang}")
        for lang, pat in LANG_MARKERS.items()
    ]


def fingerprint(col: Column) -> Column:
    """64-bit-ish document fingerprint: md5 of the normalized text's sorted
    distinct tokens (a content fingerprint robust to token order)."""
    toks = F.array_sort(
        F.array_distinct(F.split(F.trim(F.regexp_replace(F.lower(col), r"\s+", " ")), " "))
    )
    return F.md5(F.array_join(toks, " ").cast("binary"))


def chunk_windows(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk: int = 64,
    stride: int = 48,
) -> DataFrame:
    """RAG-style sliding-window chunking: whitespace tokens sliced into
    windows of ``chunk`` tokens every ``stride`` tokens (overlap =
    chunk - stride). Returns one row per (doc, window): (id, chunk_id,
    start, n_chunk_tokens, chunk_text) — the retrieval-index unit every
    embedding pipeline feeds.

    Scale shape: rows out ~= n_tokens/stride per doc, produced by one
    posexplode over the per-doc start list (a ~n/stride-element
    sequence — the only interpreted higher-order lambda walks THAT tiny
    list, never the tokens). slice/array_join are codegen'd JVM
    expressions; the token array never shuffles (chunking is a pure
    map — zero exchanges, any partitioning survives). At 100 TB this
    pipelines with the scan; downstream embedding batches group by
    length via the existing bucketed-inference path.
    """
    if not (0 < stride <= chunk):
        raise ValueError(f"need 0 < stride <= chunk: got {stride}, {chunk}")
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    base = df.select(
        F.col(id_col), toks.alias("__toks"), F.size(toks).alias("__n")
    )
    # keep a start only if it begins new content: drop tail windows whose
    # predecessor already reached the end of the doc (start-stride+chunk
    # >= n), the standard splitter contract — the final window always
    # ends AT the last token, never strictly inside the previous window.
    starts = F.filter(
        F.sequence(F.lit(0), F.greatest(F.col("__n") - 1, F.lit(0)), F.lit(stride)),
        lambda s: (s < F.col("__n"))
        & ((s == 0) | (s - F.lit(stride) + F.lit(chunk) < F.col("__n"))),
    )
    return base.select(
        id_col,
        "__toks",
        "__n",
        F.posexplode(starts).alias("chunk_id", "start"),
    ).select(
        id_col,
        F.col("chunk_id").cast("long").alias("chunk_id"),
        F.col("start").cast("long").alias("start"),
        F.least(F.lit(chunk), F.col("__n") - F.col("start"))
        .cast("long")
        .alias("n_chunk_tokens"),
        F.array_join(
            F.slice(F.col("__toks"), F.col("start") + 1, F.lit(chunk)), " "
        ).alias("chunk_text"),
    )


NFC_CONTROL_PATTERN = "[\\x00-\\x08\\x0B-\\x1F\\x7F]"


def nfc_normalize_clean(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Unicode NFC normalization + C0/DEL control stripping — the
    cleanup stage every web-scale text pipeline runs first (mojibake
    from mixed encodings arrives decomposed; stray terminal controls
    break downstream tokenizers). Strip order is STRIP THEN NORMALIZE
    (a control char between base and combining mark would otherwise
    block composition). Keeps \\t and \\n (document structure); strips
    the rest of C0 plus DEL.

    Spark has no Unicode-normalization builtin, so this is the honest
    Pandas path: Arrow-batched mapInPandas over (id, text) only —
    unicodedata's NFC implements the same spec tables utf8proc does, so
    the DuckDB oracle (nfc_normalize) matches codepoint-for-codepoint.

    Scale: pure map, zero exchanges; per-batch cost is linear in text
    bytes; NFC on already-composed batches is a fast quick-check scan
    in CPython."""
    import re
    import unicodedata

    ctrl = re.compile(NFC_CONTROL_PATTERN)
    out_schema = (
        f"{id_col} long, norm_text string, n_controls_removed long, changed boolean"
    )

    def fn(batches):
        import pandas as pd

        for pdf in batches:
            raw = pdf[text_col]
            stripped = raw.map(lambda s: ctrl.sub("", s))
            norm = stripped.map(lambda s: unicodedata.normalize("NFC", s))
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "norm_text": norm,
                    "n_controls_removed": (
                        raw.str.len() - stripped.str.len()
                    ).astype("int64"),
                    "changed": (norm != raw),
                }
            )

    return df.select(id_col, text_col).mapInPandas(fn, out_schema)


def bpe_train_merges(
    vocab: DataFrame,
    rounds: int,
    word_col: str = "word",
    count_col: str = "n",
    batch_m: int = 1,
    cand_k: int | None = None,
    round_log: list | None = None,
    max_merges: int | None = None,
) -> list[tuple[str, str, str, int]]:
    """Distributed BPE merge training (Sennrich, Haddow & Birch, ACL
    2016 "Neural Machine Translation of Rare Words with Subword Units"
    — the public algorithm): from a (word, count) vocabulary, run
    ``rounds`` merge steps — count adjacent symbol pairs weighted by
    word frequency, pick the most frequent pair (deterministic
    tiebreak: count DESC, left ASC, right ASC), fuse it everywhere —
    and return the ordered merge table [(left, right, merged, count)].

    Representation is the ORACLE trick that makes this replayable in
    SQL: each word's symbol sequence is one string with every symbol
    wrapped as ``<sym>`` (words are pre-filtered to ``[a-z]+`` so the
    brackets can't collide). Applying a merge is then a plain
    ``replace(encoded, '<a><b>', '<ab>')`` — string replace scans left
    to right without overlap in BOTH engines, which is exactly BPE's
    within-word merge rule ("aaa" + (a,a) -> "<aa><a>", the new token
    never immediately re-merges with its own right context).

    Scale shape: the state is the VOCABULARY (distinct words + counts,
    editjoin's distinct-first discipline — corpus size only affects
    the initial word count), checkpointed once; each round is one
    split/zip/explode pair count (codegen) + one TakeOrdered(K) (the
    bounded K-row driver scalar, the sssp-source convention) + one
    replace projection.

    ``batch_m`` (r8 verdict next #2) selects up to m SYMBOL-DISJOINT
    merges per round and applies them in ONE replace chain: the top-K
    pairs (K = ``cand_k``, default 4*m) are ranked by (count DESC,
    left, right); a candidate survives iff it shares no symbol — left,
    right, or merged result — with ANY higher-ranked candidate
    (kept-or-not: this conservative rule, unlike greedy-over-kept, is
    expressible as one SQL anti-join, so the DuckDB oracle can replay
    it); the first m survivors are merged. Disjointness makes the
    batch ORDER-INDEPENDENT and count-invariant: merging (a,b) can
    only change counts of pairs touching a, b, or ab, so every other
    chosen pair's count — and its occurrence set — is exactly what
    sequential BPE would see. batch_m=1 is bit-identical to sequential
    BPE (the top-1 candidate never has a higher-ranked conflict).

    CONTRACT CEILING: each merge round still costs one bounded driver
    collect + one vocabulary re-materialization, so a V-merge
    tokenizer needs ~V/m rounds of Spark jobs. rounds*batch_m in the
    low hundreds is practical; a production 30k-50k-merge vocabulary
    needs batch_m in the hundreds AND enough pairwise-disjoint
    frequency mass per round — beyond that, scheduler overhead
    dominates regardless of data size. This trainer is for
    corpus-bound merge tables, not full production vocabularies.

    ``round_log``, if given, receives one (achieved_merges,
    candidates_seen) tuple per executed round — the observability the
    saturation demo (scripts/bench_bpe_scale.py) plots to show where
    conservative disjoint selection stops filling batch_m.
    ``max_merges`` stops the loop once that many merges are learned
    (the final round may overshoot by < batch_m; the overshoot is
    truncated so the returned table is exactly max_merges long).
    """
    if batch_m < 1:
        raise ValueError(f"need batch_m >= 1: got {batch_m}")
    cand_k = cand_k if cand_k is not None else (1 if batch_m == 1 else 4 * batch_m)
    if cand_k < batch_m:
        raise ValueError(f"cand_k={cand_k} must be >= batch_m={batch_m}")
    from geo_db_spark.session import tune

    tune(vocab.sparkSession)
    # the <sym> framing (and the replace-based merge) is only sound for
    # bracket-free symbols: enforce the [a-z]+ precondition LOUDLY
    # instead of silently corrupting symbol boundaries
    guarded = F.when(
        F.col(word_col).rlike("^[a-z]+$"), F.col(word_col)
    ).otherwise(
        F.raise_error(
            F.concat(
                F.lit("bpe_train_merges requires [a-z]+ words, got: "),
                F.col(word_col),
            )
        )
    )
    enc = vocab.select(
        F.regexp_replace(guarded, r"(.)", r"<$1>").alias("e"),
        F.col(count_col).cast("long").alias("cnt"),
    ).localCheckpoint(eager=True)
    merges: list[tuple[str, str, str, int]] = []
    for _ in range(rounds):
        syms = F.split(F.regexp_replace(F.col("e"), r"^<|>$", ""), "><")
        pairs = enc.select(
            F.explode(
                F.arrays_zip(
                    F.slice(syms, 1, F.size(syms) - 1).alias("a"),
                    F.slice(syms, 2, F.size(syms) - 1).alias("b"),
                )
            ).alias("p"),
            "cnt",
        ).groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b")).agg(
            F.sum("cnt").alias("c")
        )
        top = pairs.orderBy(F.col("c").desc(), "a", "b").limit(cand_k).collect()
        if not top:
            break  # every word is a single symbol: nothing left to merge
        # conservative disjoint selection: survive iff no symbol overlap
        # with ANY higher-ranked candidate (kept or not), then first m
        # survivors — the rank-1 candidate always survives, so a
        # non-empty round always merges at least one pair
        chosen: list[tuple[str, str, int]] = []
        prior: list[set[str]] = []
        for row in top:
            a, b, c = row["a"], row["b"], int(row["c"])
            tri = {a, b, a + b}
            if len(chosen) < batch_m and all(not (tri & p) for p in prior):
                chosen.append((a, b, c))
            prior.append(tri)
        if round_log is not None:
            round_log.append((len(chosen), len(top)))
        col = F.col("e")
        for a, b, c in chosen:
            merges.append((a, b, a + b, c))
            # F.replace with literals, never SQL-string interpolation
            col = F.replace(col, F.lit(f"<{a}><{b}>"), F.lit(f"<{a}{b}>"))
        enc = enc.select(col.alias("e"), "cnt").localCheckpoint(eager=True)
        if max_merges is not None and len(merges) >= max_merges:
            return merges[:max_merges]
    return merges
