"""End-to-end corpus curation: stage semantics verified against an
independent DuckDB computation of the same pipeline."""

from __future__ import annotations

import pytest

import os

import duckdb

from geo_db_spark.io import load
from geo_db_spark.pipeline_corpus import QualityGate, curate_corpus, write_curated
from tests.conftest import SF_SMOKE


@pytest.mark.slow
def test_curate_corpus_e2e(spark, tmp_path):
    docs = load(spark, SF_SMOKE, "documents")
    curated = curate_corpus(
        docs,
        gate=QualityGate(min_tokens=5, min_alpha_ratio=0.5),
        stage_dir=str(tmp_path / "stages"),  # the 100 TB stage-barrier path
    )
    got = {r["doc_id"] for r in curated.select("doc_id").collect()}

    # independent oracle: exact dedup + (minhash pairs reused from the
    # oracle-gated workload SQL) + CC + quality thresholds, in DuckDB
    from geo_db_spark.workload.dedup import _minhash_oracle

    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW documents AS SELECT * FROM '{SF_SMOKE}/documents.parquet'"
    )
    con.sql(
        r"""CREATE VIEW exact_kept AS
        SELECT * FROM documents WHERE doc_id IN (
          SELECT MIN(doc_id) FROM documents
          GROUP BY md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))))"""
    )
    # the minhash oracle reads `documents`; the pipeline runs it on the
    # exact-deduped corpus — swap the view
    pairs_sql = _minhash_oracle().replace("FROM documents", "FROM exact_kept")
    want = {
        r[0]
        for r in con.sql(
            rf"""
WITH RECURSIVE p AS ({pairs_sql}),
e AS (SELECT id_a AS a, id_b AS b FROM p UNION SELECT id_b, id_a FROM p),
n AS (SELECT DISTINCT a AS id FROM e),
reach(id, r) AS (
  SELECT id, id FROM n
  UNION
  SELECT e.b, reach.r FROM reach JOIN e ON e.a = reach.id
),
cc AS (SELECT id, MIN(r) AS cluster_id FROM reach GROUP BY id)
SELECT doc_id FROM exact_kept
WHERE doc_id NOT IN (SELECT id FROM cc WHERE id <> cluster_id)
  AND len(regexp_split_to_array(trim(text), '\s+')) >= 5
  AND CAST(length(regexp_replace(text, '[^a-zA-Z]', '', 'g')) AS DOUBLE)
        / length(text) >= 0.5
  AND CAST(length(text) AS DOUBLE)
        / len(regexp_split_to_array(trim(text), '\s+')) <= 20.0
""").fetchall()
    }
    assert got == want and len(got) > 0

    out = str(tmp_path / "curated")
    write_curated(curated, out)
    langs = {d for d in os.listdir(out) if d.startswith("lang=")}
    assert langs
    back = spark.read.parquet(out)
    assert back.count() == len(got)


def test_curate_corpus_observed_metrics_match_counts(spark, tmp_path):
    """The observe() telemetry must report the true per-stage row/char
    totals from the SAME action that writes the corpus — no extra scans."""
    from geo_db_spark.io import load
    from geo_db_spark.pipeline_corpus import curate_corpus_observed, write_curated

    docs = load(spark, "/root/testdata/sf0.001", "documents")
    curated, obs = curate_corpus_observed(docs)
    write_curated(curated, str(tmp_path / "curated"))

    n_in = docs.count()
    back = spark.read.parquet(str(tmp_path / "curated"))
    assert obs["in"].get["n_rows"] == n_in
    assert obs["kept"].get["n_rows"] == back.count()
    assert obs["kept"].get["n_chars"] <= obs["in"].get["n_chars"]
    assert obs["kept"].get["n_rows"] > 0


def test_assemble_training_set_end_to_end(spark):
    """curate -> split -> pack composition: splits partition the curated
    set, packing covers every split's docs exactly once, and sequence
    token totals reconcile with the split token totals."""
    from pyspark.sql import functions as F

    from geo_db_spark.io import load
    from geo_db_spark.pipeline_corpus import assemble_training_set

    docs = load(spark, "/root/testdata/sf0.001", "documents")
    out = assemble_training_set(docs, budget=512)
    n_curated = out["curated"].count()
    split_rows = out["splits"].groupBy("split").count().collect()
    assert sum(r["count"] for r in split_rows) == n_curated
    assert {r["split"] for r in split_rows} <= {"train", "val", "test"}

    seq = out["sequences"]
    per_split_docs = {
        r["split"]: r["n"]
        for r in seq.groupBy("split").agg(F.sum("n_docs").alias("n")).collect()
    }
    for r in split_rows:
        assert per_split_docs.get(r["split"], 0) == r["count"]
    # token reconciliation: sum of sequence tokens == sum of doc tokens per split
    toks = F.size(F.split(F.trim("text"), r"\s+")).cast("long")
    want = {
        r["split"]: r["t"]
        for r in out["splits"].groupBy("split").agg(F.sum(toks).alias("t")).collect()
    }
    got = {
        r["split"]: r["t"]
        for r in seq.groupBy("split").agg(F.sum("seq_tokens").alias("t")).collect()
    }
    assert got == want


def test_assemble_training_set_split_packing_mode(spark):
    """packing='split' routes through pack_sequences_split: token totals
    still reconcile, and within each (split, source) stream every
    sequence but the last carries exactly `budget` tokens."""
    import pytest

    from pyspark.sql import functions as F

    from geo_db_spark.io import load
    from geo_db_spark.pipeline_corpus import assemble_training_set

    docs = load(spark, "/root/testdata/sf0.001", "documents")
    out = assemble_training_set(docs, budget=512, packing="split")
    toks = F.size(F.split(F.trim("text"), r"\s+")).cast("long")
    want = {
        r["split"]: r["t"]
        for r in out["splits"].groupBy("split").agg(F.sum(toks).alias("t")).collect()
    }
    got = {
        r["split"]: r["t"]
        for r in out["sequences"].groupBy("split").agg(F.sum("seq_tokens").alias("t")).collect()
    }
    assert got == want  # conservation holds through split packing
    rows = out["sequences"].collect()
    streams = {}
    for r in rows:
        streams.setdefault((r.split, r.source), []).append(r)
    exact = 0
    for rs in streams.values():
        rs.sort(key=lambda r: r.seq_id)
        assert all(r.seq_tokens == 512 for r in rs[:-1])
        exact += len(rs) - 1
    assert exact > 0  # the exact-fill property was actually exercised
    with pytest.raises(ValueError, match="packing must be"):
        assemble_training_set(docs, packing="nope")


def test_capstone_stage_counts_observed(spark):
    """Capstone v2 (r11): the per-stage row counts ride along as free
    Observations and must equal independently-computed stage sizes —
    raw -> exact survivors -> substring survivors (SA-adjacency
    keep-earliest) -> final gated/sharded rows. The chained DuckDB
    oracle checks the VALUES; this gate checks the TELEMETRY (the
    stage-interface contract pipeline users read)."""
    from pyspark.sql import functions as F

    from geo_db_spark.operators.dedup import normalize_text
    from geo_db_spark.operators.suffix import (
        sa_adjacent_pairs,
        substring_dup_losers,
        suffix_ranks,
    )
    from geo_db_spark.workload.curation import corpus_build_pipeline
    from geo_db_spark.workload.dedup import SA_SLICE, SA_T

    sf = "/root/testdata/sf0.001"
    out = corpus_build_pipeline(spark, sf)
    n_final = out.count()
    got = {k: o.get["n"] for k, o in out._corpus_observations.items()}

    docs = load(spark, sf, "documents")
    dig = docs.select(
        "doc_id", F.md5(normalize_text(F.col("text")).cast("binary")).alias("d")
    )
    winners = dig.groupBy("d").agg(F.min("doc_id").alias("doc_id"))
    exact = docs.join(winners.select("doc_id"), "doc_id", "left_semi")
    want_exact = exact.count()
    sliced = exact.select("doc_id", F.substring("text", 1, SA_SLICE).alias("t"))
    ranks = suffix_ranks(
        sliced, id_col="doc_id", text_col="t",
        slice_len=SA_SLICE, k0=16, min_tail=SA_T,
    )
    losers = substring_dup_losers(sa_adjacent_pairs(sliced, ranks, SA_T))
    want_sub = exact.join(losers, "doc_id", "left_anti").count()

    assert got == {"exact": want_exact, "substring": want_sub}
    assert 0 < n_final <= want_sub < want_exact


@pytest.mark.slow
def test_curate_corpus_substring_stage_optin(spark):
    """curate_corpus(substring_dedup=True) drops later docs sharing a
    >= min_len-char substring with an earlier doc, BEFORE the near-dup
    pass; off by default (the SA build is the family's most expensive
    stage). Doc 3 copies a 40-char span of doc 1 but differs otherwise
    (so exact dedup keeps it and MinHash at 0.9 keeps it); only the
    substring stage can drop it."""
    from pyspark.sql import functions as F  # noqa: F401

    from geo_db_spark.pipeline_corpus import curate_corpus

    span = "the quick brown fox jumps over the lazy dog"
    docs = spark.createDataFrame(
        [
            (1, f"{span} alpha beta gamma delta epsilon zeta", "en"),
            (2, "completely unrelated text with its own words here", "en"),
            (3, f"totally different framing yet {span} appears inside", "en"),
        ],
        "doc_id long, text string, lang string",
    )
    gate_off = dict(jaccard_threshold=0.9)
    base = curate_corpus(docs, **gate_off)
    assert {r.doc_id for r in base.collect()} == {1, 2, 3}
    curated = curate_corpus(
        docs, substring_dedup=True, substring_min_len=32, **gate_off
    )
    assert {r.doc_id for r in curated.collect()} == {1, 2}


@pytest.mark.slow
def test_curate_corpus_substring_excise_mode(spark):
    """substring_mode='excise' rewrites text_col: duplicated spans
    (every run member but the run's (doc,pos)-minimum) cut from the slice,
    the tail past the slice preserved verbatim; docs without duplicated
    spans pass through byte-identical. Hand-computed expectation."""
    import pytest as _pytest
    from pyspark.sql import functions as F  # noqa: F401

    from geo_db_spark.pipeline_corpus import curate_corpus

    span = "the quick brown fox jumps over the lazy dog here"  # 49 chars
    tail = " TAIL" * 3
    # doc 3's slice starts with filler then the span; slice = 64 chars
    d3_text = ("filler words pad " + span + " x" * 20)[:64] + tail
    docs = spark.createDataFrame(
        [
            (1, span + " alpha beta gamma delta epsilon", "en"),
            (2, "completely unrelated text with its own words here", "en"),
            (3, d3_text, "en"),
        ],
        "doc_id long, text string, lang string",
    )
    out = curate_corpus(
        docs, substring_dedup=True, substring_slice=64,
        substring_min_len=32, substring_mode="excise",
        jaccard_threshold=0.99,
    )
    got = {r.doc_id: r.text for r in out.collect()}
    assert got[1] == span + " alpha beta gamma delta epsilon"
    assert got[2] == "completely unrelated text with its own words here"
    # doc 3: the span occurrence (a >=32-char shared substring with
    # doc 1) is excised from its slice; the tail survives verbatim
    assert got[3] != d3_text
    assert got[3].endswith(tail)
    assert span[:32] not in got[3]
    with _pytest.raises(ValueError, match="substring_mode"):
        curate_corpus(docs, substring_dedup=True, substring_mode="nope")
