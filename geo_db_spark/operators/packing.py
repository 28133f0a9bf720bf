"""Training-pipeline assembly operators: sequence packing, incremental
(corpus-vs-corpus) dedup, quantile-threshold filtering, and deterministic
split assignment.

None of these exist in the reference (its pipeline ends at a SQLite file);
they are engine-growth operators for the 100 TB training-data use case the
SURVEY's LLM-pipeline addendum calls out. All are pure DataFrame
compositions — no Python in the hot path — and deterministic, so each has
a bit-exact DuckDB oracle.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from geo_db_spark.operators.dedup import (
    _cache_session_scoped,
    md5_prefix64,
    normalize_text,
)
from geo_db_spark.operators.text import token_count

# Width of the doc-id range shards used for the distributed prefix sum in
# pack_sequences. Any value works; ~4k keeps the per-shard window state
# small while the shard-offset table stays tiny (|corpus| / 4096 rows).
PACK_SHARD_WIDTH = 4096


def pack_sequences(
    docs: DataFrame,
    budget: int = 2048,
    source_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
    shard_width: int = PACK_SHARD_WIDTH,
) -> DataFrame:
    """Concat-and-chunk sequence packing: within each ``source`` stream,
    documents are concatenated in ``id_col`` order and cut into
    fixed-``budget`` token sequences; each document is assigned to the
    sequence containing its FIRST token (the standard pre-training
    packing layout — boundary documents spill into their start sequence,
    so a sequence's token total may exceed the budget by at most one
    document's tail).

    Returns one row per (source, seq_id): n_docs, seq_tokens, first/last
    doc id.

    Scale shape — the naive formulation is a running sum over a window
    partitioned by ``source`` alone, which funnels EVERY document of a
    source through one task (a source at 100 TB is billions of rows).
    This implementation is the classic two-phase distributed prefix sum:

    1. shard each source by ``id_col`` range (``floor(id / shard_width)``)
       and aggregate per-shard token totals — a map-side-combined groupBy
       whose result is |corpus|/shard_width rows;
    2. turn shard totals into shard OFFSETS with a window over that tiny
       aggregate (thousands of rows per source, not billions);
    3. broadcast-join the offsets back and finish with an intra-shard
       running sum, a window partitioned by (source, shard) — bounded at
       ``shard_width`` rows per partition regardless of corpus size.

    The global sort the naive window needs never happens; the only wide
    exchanges are the shard-total groupBy and the bounded intra-shard
    windows. Deterministic: pure integer arithmetic on a fixed ordering.
    """
    placed = _cum_token_positions(docs, source_col, id_col, text_col, shard_width)
    placed = placed.withColumn("seq_id", F.floor(F.col("cum_before") / F.lit(budget)))
    return placed.groupBy("source", "seq_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("seq_tokens"),
        F.min("id").alias("first_doc"),
        F.max("id").alias("last_doc"),
    )


def _cum_token_positions(
    docs: DataFrame,
    source_col: str,
    id_col: str,
    text_col: str,
    shard_width: int,
) -> DataFrame:
    """Phases 1-3 of the distributed prefix sum shared by both packing
    layouts: (source, id, n_tokens, cum_before) where cum_before is the
    exclusive running token total within the source's id order."""
    toks = docs.select(
        F.col(source_col).alias("source"),
        F.col(id_col).alias("id"),
        token_count(F.col(text_col)).cast("long").alias("n_tokens"),
    )
    # the token counts feed two plan branches (shard totals + placement);
    # without a barrier each branch re-scans AND re-tokenizes the corpus —
    # at 100 TB that doubles the dominant text-scan cost. The cached rows
    # are (source, id, n_tokens) ONLY (~16 bytes/row, never the payload),
    # the same session-scoped registry the dedup signatures use.
    sharded = _cache_session_scoped(
        toks.withColumn("shard", F.floor(F.col("id") / F.lit(shard_width)))
    )
    # phase 1: per-shard totals (tiny), phase 2: exclusive prefix over shards
    shard_tot = sharded.groupBy("source", "shard").agg(
        F.sum("n_tokens").alias("shard_tokens")
    )
    w_sh = (
        Window.partitionBy("source")
        .orderBy("shard")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = shard_tot.select(
        "source",
        "shard",
        F.coalesce(F.sum("shard_tokens").over(w_sh), F.lit(0)).alias("shard_offset"),
    )
    # phase 3: bounded intra-shard running sum + global position
    w_in = (
        Window.partitionBy("source", "shard")
        .orderBy("id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    # no forced broadcast on offsets: it's |corpus|/shard_width rows —
    # tiny here, but ~12M rows for a 50B-doc corpus. AQE broadcasts it
    # when small; otherwise the SMJ's (source, shard) exchange is the
    # SAME partitioning the intra-shard window needs, so the join and
    # the window ride one shuffle.
    return sharded.join(offsets, ["source", "shard"]).withColumn(
        "cum_before",
        F.col("shard_offset") + F.coalesce(F.sum("n_tokens").over(w_in), F.lit(0)),
    )


def pack_sequences_split(
    docs: DataFrame,
    budget: int = 2048,
    source_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
    shard_width: int = PACK_SHARD_WIDTH,
) -> DataFrame:
    """The OTHER standard packing layout (r4 verdict #8): documents that
    cross a sequence boundary are SPLIT — head tokens fill the current
    sequence exactly to ``budget``, the tail carries into the next
    sequence(s). Every sequence holds exactly ``budget`` tokens except
    each source's final partial one.

    Same two-phase distributed prefix sum as :func:`pack_sequences`;
    the only addition is exploding each document into the sequence range
    it spans — ``floor(cum/b) .. floor((cum+n-1)/b)`` — with its exact
    per-sequence token contribution computed by interval intersection.
    A document explodes into at most ``ceil(n_tokens/budget)+1`` rows
    (that fan-out IS the work a splitting packer does), so the exchange
    stays proportional to total tokens / budget, never quadratic.

    Returns one row per (source, seq_id): n_docs (documents contributing
    at least one token), seq_tokens, first/last contributing doc id.
    Pure integer arithmetic — bit-exact in the DuckDB oracle.
    """
    placed = _cum_token_positions(docs, source_col, id_col, text_col, shard_width)
    placed = placed.filter(F.col("n_tokens") > 0)
    b = F.lit(budget).cast("long")
    s0 = F.floor(F.col("cum_before") / b)
    s1 = F.floor((F.col("cum_before") + F.col("n_tokens") - F.lit(1)) / b)
    spans = placed.withColumn("seq_id", F.explode(F.sequence(s0, s1)))
    contrib = F.least(
        (F.col("seq_id") + 1) * b, F.col("cum_before") + F.col("n_tokens")
    ) - F.greatest(F.col("seq_id") * b, F.col("cum_before"))
    return spans.groupBy("source", "seq_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(contrib).alias("seq_tokens"),
        F.min("id").alias("first_doc"),
        F.max("id").alias("last_doc"),
    )


def incremental_dedup(
    new_docs: DataFrame,
    ref_docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Keep rows of ``new_docs`` whose normalized text does not already
    appear in ``ref_docs`` — the incremental-crawl case: dedup a new batch
    against an existing (much larger) corpus without re-deduping the
    corpus itself.

    Scale shape: only 32-char digests are joined — the reference corpus
    contributes a distinct-digest set (never its payload), the new batch
    shuffles (id, digest) pairs, and the survivors' payload is recovered
    with a semi-join on id at the end. With
    ``spark.sql.optimizer.runtime.bloomFilter.enabled`` (pinned on in
    session.tune) Catalyst injects a runtime Bloom filter built from the
    survivor ids into the payload-recovery scan
    (``might_contain(bloom_filter_agg(...))`` in the optimized plan — a
    Bloom can't safely prefilter the anti-join itself, since absence
    there *proves* survival), so the second full scan of the new batch
    reads mostly-surviving rows only — the DataFrame-native form of the
    classic "Bloom prefilter + exact confirm" incremental-dedup design.

    Deterministic: md5 digests, exact anti-join semantics (the result
    equals the plain NOT IN, the Bloom is only ever a prefilter).
    """
    digest = F.md5(normalize_text(F.col(text_col)).cast("binary")).alias("digest")
    ref_digests = ref_docs.select(digest).distinct()
    new_keyed = new_docs.select(F.col(id_col).alias("__nid"), digest)
    survivor_ids = new_keyed.join(ref_digests, "digest", "left_anti").select("__nid")
    return new_docs.join(
        survivor_ids, new_docs[id_col] == survivor_ids["__nid"], "left_semi"
    )


def quantile_threshold_filter(
    df: DataFrame,
    score: Column,
    q: float = 0.25,
    id_cols: Sequence[str] = ("doc_id",),
) -> DataFrame:
    """Keep rows whose ``score`` is >= the global q-quantile of the score
    — the "drop the worst quartile" quality gate of corpus curation.

    The score is quantized to integer micro-units BEFORE the quantile so
    threshold and comparison are exact integer/double arithmetic
    (bit-identical in the DuckDB oracle); the exact `percentile` here is
    the oracle-checkable form — at 100 TB swap in `approx_percentile`
    (t-digest, one pass, no global sort) for the threshold and keep the
    rest of the plan unchanged.

    The one-row threshold is crossJoin-broadcast: every executor compares
    locally, no shuffle of the data side. The output is the FULL input
    row plus the quantized ``score`` column (ADVICE r5: the previous
    shape silently projected down to id_cols+score): the quantile runs
    over the skinny (id, score) projection and the survivors semi-join
    back to ``df`` — the payload columns never enter the sort/aggregate.
    ``id_cols`` must uniquely identify rows (they are the join-back key);
    an input that already carries a ``score`` column is rejected rather
    than producing an ambiguous duplicate (r5 review).
    """
    if "score" in df.columns:
        raise ValueError(
            "input already has a 'score' column; rename it before the "
            "quantile gate (the output appends the computed score)"
        )
    scored = df.select(*id_cols, F.round(score * 1_000_000).cast("long").alias("score_u"))
    thr = scored.agg(F.expr(f"percentile(score_u, {q})").alias("__thr"))
    kept = (
        scored.crossJoin(F.broadcast(thr))
        .filter(F.col("score_u") >= F.col("__thr"))
        .select(*id_cols, (F.col("score_u") / 1_000_000.0).alias("score"))
    )
    return df.join(kept, list(id_cols), "inner")


def quantile_threshold_filter_approx(
    df: DataFrame,
    score: Column,
    q: float = 0.25,
    id_cols: Sequence[str] = ("doc_id",),
    accuracy: int = 10_000,
) -> DataFrame:
    """``quantile_threshold_filter`` with the PRODUCTION threshold path:
    ``approx_percentile`` (Greenwald-Khanna sketch — one pass, partial
    aggregation per partition, merged sketches, never a global sort or a
    SinglePartition of the values), the drop-in the exact variant's
    docstring names for 100 TB. Same plan otherwise: skinny (id, score)
    projection, one-row broadcast threshold, semi-join back for payload.

    Accuracy contract: the sketch's relative rank error is 1/accuracy, so
    the threshold lands between the exact (q - 1/accuracy) and
    (q + 1/accuracy) quantiles — the survivor set is bracketed by the
    exact survivor sets at those loosened quantiles (tested). When
    ``accuracy`` exceeds the row count the rank error is < 1 row and the
    sketch returns the EXACT discrete q-quantile (the element at rank
    ceil(q*n)) — which is how the oracle gate pins this query at test
    scale (DuckDB ``quantile_disc``): the oracle-checked form and the
    production form are the same code, only ``accuracy`` moves.
    """
    if "score" in df.columns:
        raise ValueError(
            "input already has a 'score' column; rename it before the "
            "quantile gate (the output appends the computed score)"
        )
    scored = df.select(*id_cols, F.round(score * 1_000_000).cast("long").alias("score_u"))
    thr = scored.agg(
        F.expr(f"approx_percentile(score_u, {q}, {int(accuracy)})").alias("__thr")
    )
    kept = (
        scored.crossJoin(F.broadcast(thr))
        .filter(F.col("score_u") >= F.col("__thr"))
        .select(*id_cols, (F.col("score_u") / 1_000_000.0).alias("score"))
    )
    return df.join(kept, list(id_cols), "inner")


# (fraction numerators out of 100, label) — ordered; remainder is the last
SPLIT_BANDS: tuple[tuple[int, str], ...] = ((96, "train"), (98, "val"), (100, "test"))


def split_assign(id_col: str = "doc_id") -> Column:
    """Deterministic train/val/test assignment: md5 of the id, mod 100,
    banded 96/2/2. A pure function of the id — stable across runs,
    machines, and partitionings, which is the property that matters when
    the corpus is rebuilt incrementally (a document never migrates
    between splits)."""
    band = F.pmod(md5_prefix64(F.col(id_col).cast("string")), F.lit(100))
    expr = None
    for hi, label in SPLIT_BANDS:
        cond = band < F.lit(hi)
        expr = F.when(cond, F.lit(label)) if expr is None else expr.when(cond, F.lit(label))
    return expr
