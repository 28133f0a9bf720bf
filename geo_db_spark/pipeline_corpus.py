"""Training-corpus curation pipeline: the composition the individual
operators exist for.

    raw documents
      -> exact dedup        (content-digest winners; dedup.exact_dedup)
      -> substring dedup    (OPTIONAL, r11: SA-adjacency keep-earliest,
                             operators/suffix.py — the Lee ACL'22 order)
      -> near-dup clusters  (MinHash+LSH pairs -> connected components)
      -> cluster survivors  (min doc_id per component)
      -> quality gate       (text.quality_metrics thresholds)
      -> language split     (partitioned parquet, io.save_partitioned)

Every stage is a DataFrame transformation — one lazy plan per stage
boundary, no driver-side loops; the only materializations are the
connected-components iteration (inherent) and the final write. At
100 TB each arrow above is the same shuffle structure as its
oracle-checked workload twin (dedup_exact_documents, dedup_clusters,
dedup_cluster_survivors, text_quality_metrics), so the pipeline's
correctness decomposes into the per-stage gates the driver already
verifies.

The reference has no corpus pipeline (it is a geo ETL); this is the
engine-growth deliverable SURVEY.md §2's training-data block points at.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from geo_db_spark.io import save_partitioned
from geo_db_spark.operators.components import connected_components
from geo_db_spark.operators.dedup import exact_dedup, minhash_lsh_pairs
from geo_db_spark.operators.text import quality_metrics


@dataclass(frozen=True)
class QualityGate:
    min_tokens: int = 5
    min_alpha_ratio: float = 0.5
    max_mean_token_len: float = 20.0


def curate_corpus(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    jaccard_threshold: float = 0.5,
    gate: QualityGate = QualityGate(),
    stage_dir: str | None = None,
    substring_dedup: bool = False,
    substring_slice: int = 256,
    substring_min_len: int = 32,
    substring_mode: str = "drop",
) -> DataFrame:
    """The curated corpus as a DataFrame (call ``write_curated`` to
    persist). Keeps every original column of the surviving documents.

    ``stage_dir``: when given, the exact-deduped corpus is written to
    parquet there and re-read — the durable stage barrier for the 100 TB
    run, where the near-dup pass re-reads its input several times
    (signatures + candidate re-shingle) and recomputing the exact-dedup
    semi-join each time would re-scan the raw corpus. Locally the lazy
    plan is fine; at scale always pass a stage_dir.

    ``substring_dedup`` (r11): inserts EXACT substring dedup between
    exact dedup and the near-dup pass (the Lee et al. ACL'22 stage
    order) — one shared suffix-array build (operators/suffix.py) over
    the leading ``substring_slice`` chars, segmented into maximal
    SA runs (suffixes whose every adjacent LCP is
    >= ``substring_min_len``). ``substring_mode``: ``"drop"`` removes,
    per run, every doc except the run's minimum doc_id (keep-earliest;
    guarantee: no two SURVIVING docs share a qualifying substring
    within the slice domain); ``"excise"`` is Lee's actual semantics —
    the duplicated SPANS (every run member but the (doc, pos)-minimum;
    at most one occurrence of each duplicated substring survives) are
    cut out of the slice and ``text_col`` rewritten, the tail past the
    slice untouched, so downstream stages (near-dup signatures, the
    quality gate) see the cleaned text. Off by default: the SA build
    is the most expensive stage in the family (measured envelopes in
    SCALE.md), so callers opt in."""
    if substring_mode not in ("drop", "excise"):
        raise ValueError(f"substring_mode must be 'drop' or 'excise': {substring_mode!r}")
    # 1. exact dedup: winner doc_id per normalized-content digest
    exact_winners = exact_dedup(docs, text_col, id_col).select(id_col)
    exact_kept = docs.join(exact_winners, id_col, "left_semi")
    if stage_dir:
        path = f"{stage_dir}/exact_kept"
        exact_kept.write.mode("overwrite").parquet(path)
        exact_kept = docs.sparkSession.read.parquet(path)

    # 1b. optional exact-substring dedup (one shared SA build)
    if substring_dedup:
        from geo_db_spark.operators.suffix import (
            excise_substring_dups,
            sa_adjacent_pairs,
            sa_pair_lcp,
            substring_dup_losers,
            suffix_ranks,
        )

        sliced = exact_kept.select(
            F.col(id_col).alias("doc_id"),
            F.substring(F.col(text_col), 1, substring_slice).alias("t"),
        )
        ranks = suffix_ranks(
            sliced, id_col="doc_id", text_col="t",
            slice_len=substring_slice, k0=64, min_tail=substring_min_len,
        )
        pairs = sa_adjacent_pairs(sliced, ranks, substring_min_len)
        if substring_mode == "drop":
            losers = substring_dup_losers(pairs).withColumnRenamed(
                "doc_id", id_col
            )
            exact_kept = exact_kept.join(losers, id_col, "left_anti")
        else:
            lcp = sa_pair_lcp(sliced, pairs, substring_min_len, substring_slice)
            kept = excise_substring_dups(sliced, lcp).select(
                F.col("doc_id").alias("__xid"), "kept_text"
            )
            exact_kept = (
                exact_kept.join(
                    kept, F.col(id_col) == F.col("__xid"), "left"
                )
                .withColumn(
                    text_col,
                    F.when(
                        F.col("kept_text").isNull(), F.col(text_col)
                    ).otherwise(
                        F.concat(
                            F.col("kept_text"),
                            F.expr(
                                f"substring({text_col}, {substring_slice + 1})"
                            ),
                        )
                    ),
                )
                .drop("__xid", "kept_text")
            )

    # 2-3. near-dup clusters on the exact-deduped corpus; drop every
    # clustered doc except its component's min id
    pairs = minhash_lsh_pairs(
        exact_kept, text_col, id_col, n=3, threshold=jaccard_threshold
    )
    cc = connected_components(pairs, "id_a", "id_b")
    losers = cc.filter(F.col("id") != F.col("cluster_id")).select(
        F.col("id").alias(id_col)
    )
    near_kept = exact_kept.join(losers, id_col, "left_anti")

    # 4. quality gate: pure-expression metrics, thresholds as one filter
    q = quality_metrics(near_kept, text_col)
    return q.filter(
        (F.col("n_tokens") >= gate.min_tokens)
        & (F.col("alpha_ratio") >= gate.min_alpha_ratio)
        & (F.col("mean_token_len") <= gate.max_mean_token_len)
    ).select(*[F.col(c) for c in docs.columns])


def write_curated(
    curated: DataFrame,
    out_dir: str,
    partition_col: str = "lang",
) -> None:
    """Persist the curated corpus partitioned by language (the training
    loader's access pattern), sorted within partitions by doc_id for
    tight parquet stats."""
    save_partitioned(
        curated,
        out_dir,
        partition_by=(partition_col,),
        sort_within=("doc_id",),
        max_records_per_file=5_000_000,
    )


def curate_corpus_observed(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    jaccard_threshold: float = 0.5,
    gate: QualityGate = QualityGate(),
    stage_dir: str | None = None,
):
    """curate_corpus with free pipeline telemetry: returns (curated,
    observations) where ``observations`` maps stage name -> a
    ``pyspark.sql.Observation`` that fills in when the curated plan
    runs an action (write_curated / count / collect).

    This is the batch counterpart of the A10 streaming ticker: metrics
    (row counts, token totals) are computed BY the same job on the rows
    already flowing through — zero extra scans, zero extra shuffles —
    exactly what a 100 TB curation run wants instead of a count() per
    stage (each of which would re-execute the lineage). Read with
    ``obs.get`` after the action; e.g. retention = kept/in.
    """
    from pyspark.sql import Observation

    obs_in = Observation("corpus_in")
    docs = docs.observe(
        obs_in,
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.length(text_col)).alias("n_chars"),
    )
    curated = curate_corpus(
        docs,
        text_col=text_col,
        id_col=id_col,
        jaccard_threshold=jaccard_threshold,
        gate=gate,
        stage_dir=stage_dir,
    )
    obs_out = Observation("corpus_kept")
    curated = curated.observe(
        obs_out,
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.length(text_col)).alias("n_chars"),
    )
    return curated, {"in": obs_in, "kept": obs_out}


def assemble_training_set(
    docs: DataFrame,
    budget: int = 2048,
    text_col: str = "text",
    id_col: str = "doc_id",
    jaccard_threshold: float = 0.5,
    gate: QualityGate = QualityGate(),
    stage_dir: str | None = None,
    packing: str = "spill",
) -> dict[str, DataFrame]:
    """The full corpus-to-training-set assembly: curate (dedup + quality
    gate), assign deterministic train/val/test splits, and pack each
    split's documents into fixed-budget training sequences.

    Returns {"curated", "splits", "sequences"}:
    - curated: the surviving documents (every original column);
    - curated + a ``split`` column (md5-banded 96/2/2 —
      operators/packing.split_assign; a document never migrates);
    - one row per (split, source, seq_id) with n_docs / seq_tokens
      (concat-and-chunk packing, distributed prefix sum per split).

    Composition of oracle-checked pieces (dedup_*, text_quality_metrics,
    text_split_assign, pack_sequences_report) — the 100 TB shape is the
    sum of the per-stage shapes; nothing new shuffles here.

    The curated set feeds FOUR downstream actions (three per-split
    packing passes + whatever the caller does with "curated"/"splits");
    with ``stage_dir`` it is persisted once and re-read, so the
    curation lineage (dedup shuffles, minhash, quality gate) runs once
    instead of once per consumer — at scale always pass a stage_dir
    (same contract as curate_corpus).

    ``packing`` picks the layout: ``"spill"`` (concat-and-chunk,
    boundary docs spill whole into their start sequence) or ``"split"``
    (boundary docs split so every sequence is exactly ``budget`` tokens
    — operators/packing.pack_sequences_split).
    """
    from geo_db_spark.operators.packing import (
        pack_sequences,
        pack_sequences_split,
        split_assign,
    )

    if packing not in ("spill", "split"):
        raise ValueError(f"packing must be 'spill' or 'split', got {packing!r}")
    pack = pack_sequences if packing == "spill" else pack_sequences_split

    curated = curate_corpus(
        docs,
        text_col=text_col,
        id_col=id_col,
        jaccard_threshold=jaccard_threshold,
        gate=gate,
        stage_dir=stage_dir,
    )
    if stage_dir:
        path = f"{stage_dir}/curated"
        curated.write.mode("overwrite").parquet(path)
        curated = docs.sparkSession.read.parquet(path)
    splits = curated.withColumn("split", split_assign(id_col))
    sequences = None
    for name in ("train", "val", "test"):
        part = pack(
            splits.filter(F.col("split") == name),
            budget=budget,
            id_col=id_col,
            text_col=text_col,
        ).withColumn("split", F.lit(name))
        sequences = part if sequences is None else sequences.unionByName(part)
    return {"curated": curated, "splits": splits, "sequences": sequences}
