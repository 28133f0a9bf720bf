#!/usr/bin/env python
"""Benchmark harness: run the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and print ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec, ...}, "sf": ...}.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

HEADLINE = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "q6_revenue_forecast",
    "q10_returned_items",
    "q7_volume_shipping",
    "q13_customer_order_distribution",
    "d2_argmin_order_per_customer",
    "d4_top2_orders_per_customer",
    "d5_customer_names_per_nation",
    "d3_part_hierarchy_closure",
    "w3_sessionize",
    "w4_rate_limit_dedup",
    "g1_rollup_revenue",
    "g9_range_join_clicks",
    "g10_multi_resolution_rollup",
    "dedup_exact_documents",
    "dedup_minhash_lsh_pairs",
    "dedup_ngram_jaccard",
    "text_quality_metrics",
    "ann_cosine_topk",
    "ann_cosine_topk_arrow",
    "ann_lsh_topk",
    "text_chunk_dups",
    "x9_ancestor_label_resolution",
    "sk_hll_distinct_parts",
    "sk_cms_heavy_hitters",
    "emb_semdedup_survivors",
    "text_weighted_sample",
    "text_gopher_repetition",
    "text_dup_spans",
    "g15_triangle_count",
    "pack_sequences_report",
    "dedup_incremental_bloom",
    "g18_salted_join_events",
    "ann_lsh_multitable_topk",
    "text_stratified_sample",
    "cdc_snapshot_diff",
    "merge_upsert_customers",
    "geo_knn_customer_supplier",
    "pack_sequences_split",
    "mm_image_decode",
    "dedup_simjoin_exact",
]

# Tier-2 (r5 verdict #7): the expensive families that had no wall-clock
# record in any BENCH round — graph fixed-point, closure variants, tf-idf,
# the x-family extraction paths — plus every query new this round. Rotate
# membership as new families land; HEADLINE stays stable for
# round-over-round comparison.
TIER2 = [
    "g13_pagerank",
    "d3_closure_doubling",
    "text_tfidf_topterms",
    "x3_population_argmax",
    "x10_labels_by_country",
    "x13_te_extraction",
    "ann_ivf_multiprobe_topk",
    "embedding_near_dup_lsh",
    "dedup_simjoin_survivors",
    "text_pii_scan",
    "text_contamination_check",
    "sk_histogram_quantiles_refined",
    "text_quantile_filter_approx",
    "text_stratified_sample_approx",
    "mm_image_decode_png",
    "geo_knn_exact_customer_supplier",
    "sk_kmv_set_ops_parts",
    "ids_stable_documents",
    # r7 additions
    "geo_knn_scaled_customer_supplier",
    "emb_semdedup_survivors_recovered",
    "mm_audio_decode_wav",
    "text_bigram_lm_score",
    "ann_sq8_topk",
    "d5_salted_group_concat",
    "dedup_editdist_customer_names",
    "text_chunk_windows",
    "text_bm25_rank",
    "text_rrf_fusion",
    "text_nfc_normalize",
    "mm_image_decode_bmp_rle",
    "cdc_incremental_agg",
    "cdc_scd2_point_in_time",
    "g26_kcore_parts",
    "pack_epoch_shuffle",
    "g27_mad_outliers",
    "ann_pq_topk",
    "corpus_build_pipeline",
    # r12: the excise-mode capstone (rewrite-then-filter through the
    # shared SA build) — added the round it was declared so the quiet
    # baseline never lacks it (the r11 baseline's one gap)
    "corpus_build_pipeline_excise",
    "ann_ivf_pq_topk",
    # r8 additions: the slowest never-benched queries in the r7 judge
    # sweep (13.8 s / 10.1 s under contention) — real walls + envelopes
    "dedup_containment_pairs",
    "g20_sssp_part_graph",
    "ann_ivf_pq_residual_topk",
    "mm_image_decode_jpeg",
    "mm_audio_decode_flac",
    "mm_corpus_pipeline",
    "mm_image_decode_jpeg_prog",
    "text_bpe_merges",
    "text_bpe_vocab_top",
    # r9 additions
    "mm_image_decode_webp",
    "ann_opq_topk",
    "text_bpe_merges_batched",
    "dedup_containment_profile",
    "text_winnow_fingerprints",
    "dedup_winnow_matches",
    "text_bpe_doc_tokens",
    "text_cdc_chunk_stats",
    "dedup_cdc_chunk_dupes",
    "mm_audio_decode_g711",
    "mm_image_decode_tiff",
    # r10 additions
    "mm_image_decode_g4",
    "text_kneser_ney_score",
    "mm_image_decode_g3",
    "dedup_suffix_adjacent_dups",
    "dedup_longest_repeat",
    "text_odds_classifier",
    "mm_image_decode_jpeg12",
    # r11 additions
    "dedup_winnow_profile",
    "dedup_substring_excision",
]


def _quiet_comparison(timings, per_query_load, sf, canary=None):
    """Round-over-round quiet comparison (r9 Next #7 / r10 Next #3,
    automated): compare this run's per-query minima against the
    committed quiet-host baseline BENCH_QUIET.json (same SF only) and
    return the table the SCALE.md adjudications used to build by hand —
    median ratio over common queries, the outliers beyond 1.3x each
    way WITH both sides' loadavg, so 'host shift vs code regression' is
    answerable from the artifact alone. Refresh the baseline on an idle
    host with SPARK_GRAFT_SET_QUIET_BASELINE=1."""
    path = os.path.join(REPO, "BENCH_QUIET.json")
    if not os.path.exists(path):
        return {"status": "no baseline (set SPARK_GRAFT_SET_QUIET_BASELINE=1 on a quiet host)"}
    with open(path) as f:
        base = json.load(f)
    # numeric compare when both sides parse (r11 advice: str-compare
    # silently disabled the whole comparison on formatting drift like
    # '0.10' vs '0.1'); string equality only as the non-numeric fallback
    try:
        sf_match = float(base.get("sf")) == float(sf)
    except (TypeError, ValueError):
        sf_match = str(base.get("sf")) == str(sf)
    if not sf_match:
        return {"status": f"baseline sf {base.get('sf')} != run sf {sf}"}
    common = sorted(set(timings) & set(base["queries"]))
    if not common:
        return {"status": "no common queries with baseline"}
    ratios = sorted(
        (round(timings[n] / base["queries"][n], 3), n) for n in common
        if base["queries"][n] > 0
    )
    med = ratios[len(ratios) // 2][0]
    base_load = base.get("per_query_loadavg", {})
    outliers = [
        {
            "query": n,
            "ratio": r,
            "sec": timings[n],
            "base_sec": base["queries"][n],
            "loadavg": per_query_load.get(n),
            "base_loadavg": base_load.get(n),
        }
        for r, n in ratios
        if r > 1.3 or r < 1 / 1.3
    ]
    out = {
        "status": "ok",
        "n_common": len(common),
        "median_ratio": med,
        "baseline_loadavg_start": base.get("loadavg_start"),
        "outliers": outliers,
    }
    # r13 canary gate (r12 verdict Next #1b): when the fixed canary
    # query's own wall moved >1.3x between suite start and end, the
    # host window shifted during the run — per-query ratios are then
    # measuring the host, not the code, so the outlier table is
    # reported as NOT attributable instead of implying regressions.
    if canary:
        start, end = canary
        out["canary_sec"] = {"start": start, "end": end}
        # Gate design, iterated on measurements (r13): a within-run
        # ratio cannot work in either direction — q6 keeps JIT-warming
        # over a 111-query session (0.42 -> 0.25 s idle, so symmetric
        # start-vs-end flags every clean run), while a one-sided
        # end-vs-start gate certified a run whose START window was 8x
        # slow. The like-for-like reference is the BASELINE's canary:
        # same query, same point in the session lifecycle. Dirty when
        # either end of this run reads >1.3x the baseline's same-end
        # canary; falls back to the within-run slowdown gate for
        # baselines promoted before canaries were recorded.
        base_canary = base.get("canary_sec")
        if base_canary:
            rs = start / max(1e-9, base_canary["start"])
            re_ = end / max(1e-9, base_canary["end"])
            out["canary_ratio"] = {"start": round(rs, 3), "end": round(re_, 3)}
            dirty = max(rs, re_) > 1.3
        else:
            out["canary_ratio"] = round(end / max(1e-9, start), 3)
            dirty = out["canary_ratio"] > 1.3
        if dirty:
            out["status"] = "canary-dirty: host window shifted during the run"
            out["outliers_not_attributable"] = out.pop("outliers")
    return out


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]

    from geo_db_spark.session import get_spark
    from geo_db_spark import workload

    spark = get_spark("geo_db_spark_bench")
    qs = workload.queries()

    from pyspark.sql import functions as F

    def force(df):
        """Full-evaluation action: checksum EVERY output column so Catalyst
        cannot prune computed projections — a bare count() lets
        pure-projection queries (e.g. text_quality_metrics) skip the regex
        work they claim to measure. xxhash64 over all columns is JVM-side
        and cheap relative to the query itself."""
        row = df.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.xxhash64(*[F.col(c) for c in df.columns])).alias("chk"),
        ).collect()[0]
        return row["n"]

    # warm the JVM + parquet footers once with the cheapest query
    qs["q6_revenue_forecast"](spark, sf_dir).collect()

    # Two runs per query, report the MIN: run 0 pays one-time janino
    # codegen of each query's expression tree (5-7 s for the 12-hash
    # minhash tree — r1-r3 cold-run variance on identical code was ~1.5x),
    # run 1 is the steady-state per-batch cost, which is what scales to
    # 100 TB. Change from r1/r2 methodology (single cold run) is
    # documented in SCALE.md; "runs" records it in the output.
    #
    # r13 noise floor (r12 verdict Next #1 — measurement fix, not a
    # query change; semantics of every timed query are untouched and
    # the min-of-N statistic is unchanged in kind, only N): queries
    # whose wall is under SHORT_SEC get SHORT_RUNS total runs instead
    # of RUNS — on this host sub-3 s queries flap 2-3x within a day
    # (BENCH_r12's outlier table was dominated by exactly that band), and
    # two extra runs of a <3 s query cost seconds while shrinking the
    # min's variance enough to make the 1.3x outlier threshold
    # meaningful. The short/long decision uses the committed quiet
    # baseline's wall when the query has one (stable across runs), and
    # falls back to this run's first wall for new queries.
    RUNS = 2
    SHORT_RUNS = 4
    SHORT_SEC = 3.0
    base_walls = {}
    try:
        with open(os.path.join(REPO, "BENCH_QUIET.json")) as f:
            base_walls = json.load(f).get("queries", {})
    except Exception:
        pass

    def _canary() -> float:
        t0 = time.perf_counter()
        force(qs["q6_revenue_forecast"](spark, sf_dir))
        return round(time.perf_counter() - t0, 4)

    # canary (r12 verdict Next #1b): one fixed cheap query timed at
    # suite start and end; if the canary itself moved >1.3x, the host
    # window shifted under the run and per-query outliers are not
    # attributable to code — quiet_comparison then reports them as
    # canary-dirty instead of flagging regressions. The canary must
    # measure the HOST, not the session: the first q6 force() in a
    # fresh JVM pays codegen+JIT (measured 1.0 s vs 0.38 s steady on an
    # idle host, which mislabelled clean runs dirty), so burn two
    # untimed warmup forces first and time min-of-2 after.
    _canary(); _canary()
    canary_start = min(_canary(), _canary())
    load_start = os.getloadavg()
    timings: dict[str, float] = {}
    runs_raw: dict[str, list[float]] = {}
    per_query_load: dict[str, float] = {}
    for name in HEADLINE + TIER2:
        fn = qs[name]
        raw = []
        # r13 measurement hygiene (outside every timed wall): before a
        # query's runs, drop python-side frame references and ask both
        # collectors to reclaim the localCheckpoint blocks they pin —
        # accumulated blocks from EARLIER queries otherwise drag on
        # later ones (measured: dedup_minhash_lsh_pairs 6.6 s mid-suite
        # vs 3.2 s isolated on the same quiet host; the suffix build's
        # gc nudge fixed the same class at 10x, SCALE.md r11). Each
        # wall then measures the query, not the session's garbage.
        # Placed BEFORE the runs (not after) so the end canary sees the
        # same session state class as the start canary.
        import gc

        gc.collect()
        spark._jvm.System.gc()
        # per-query 1-min loadavg, captured BEFORE this query's runs
        # (r10 verdict Next #3: a host shift is only adjudicable when
        # every committed wall carries its own load context)
        per_query_load[name] = round(os.getloadavg()[0], 2)
        for _ in range(RUNS):
            t0 = time.perf_counter()
            n = force(fn(spark, sf_dir))
            raw.append(round(time.perf_counter() - t0, 4))
            assert n >= 0
        short = base_walls.get(name, raw[-1]) < SHORT_SEC
        while short and len(raw) < SHORT_RUNS:
            t0 = time.perf_counter()
            n = force(fn(spark, sf_dir))
            raw.append(round(time.perf_counter() - t0, 4))
            assert n >= 0
        runs_raw[name] = raw
        timings[name] = min(raw)
    canary_end = min(_canary(), _canary())
    total = round(sum(timings[n] for n in HEADLINE), 4)
    load_end = os.getloadavg()
    full = {
        "metric": "headline_suite_wall",
        "value": total,
        "unit": "sec",
        "runs": RUNS,
        # r13 noise floor: queries under SHORT_SEC get SHORT_RUNS total
        # runs (additive key; "runs" stays the long-query default so the
        # driver's round-over-round parse is unchanged; runs_raw has the
        # exact per-query walls)
        "short_query_runs": SHORT_RUNS,
        "short_query_sec": SHORT_SEC,
        "queries": timings,
        "runs_raw": runs_raw,
        "per_query_loadavg": per_query_load,
        "tier2": TIER2,
        "value_with_tier2": round(sum(timings.values()), 4),
        "loadavg_start": [round(x, 2) for x in load_start],
        "loadavg_end": [round(x, 2) for x in load_end],
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
    }
    full["canary_sec"] = {"start": canary_start, "end": canary_end}
    full["quiet_comparison"] = _quiet_comparison(
        timings, per_query_load, sf, canary=(canary_start, canary_end)
    )
    if os.environ.get("SPARK_GRAFT_SET_QUIET_BASELINE") == "1":
        # promote THIS run to the committed quiet baseline (run it on an
        # idle host: the whole point is a load-attributed reference)
        with open(os.path.join(REPO, "BENCH_QUIET.json"), "w") as f:
            json.dump(
                {
                    "queries": timings,
                    "per_query_loadavg": per_query_load,
                    "loadavg_start": [round(x, 2) for x in load_start],
                    "sf": full["sf"],
                    "headline_total": total,
                    # the like-for-like reference for future runs'
                    # canary gate (same query, same session lifecycle
                    # points — see _quiet_comparison)
                    "canary_sec": {"start": canary_start, "end": canary_end},
                },
                f,
            )
            f.write("\n")
    # r7 verdict #9: the driver records only the TAIL of stdout, which
    # can truncate the earliest per-query pairs out of BENCH_rN.json.
    # Persist the COMPLETE record to a sibling artifact (referenced from
    # SCALE.md) so every benched query keeps its pair.
    with open(os.path.join(REPO, "BENCH_FULL.json"), "w") as f:
        json.dump(full, f)
        f.write("\n")
    # full per-query line on stdout too, for greps and SCALE.md bookkeeping
    print(json.dumps(full))
    # quiet-baseline comparison on its own line (compact enough to
    # survive the driver's stdout tail next to the summary)
    print(json.dumps({"metric": "quiet_comparison", **full["quiet_comparison"]}))
    # r14 (r13 verdict Next #2): the driver keeps only the TAIL of
    # stdout, and the full per-query line above prints FIRST — so the
    # "queries" dict was truncated out of every BENCH_rN.json and the
    # driver's per-query/scaling tables stayed empty. Emit a compact
    # walls-only line (timings only, no runs_raw/loadavg) immediately
    # before the final summary so it survives the tail. Output-format
    # addition only; no timed semantics change.
    print(json.dumps({"metric": "per_query_walls", "queries": timings, "sf": full["sf"]}))
    # Compact summary LAST (r6 verdict #7): the driver records only the
    # TAIL of stdout, which truncated the full line's leading fields
    # (value included) out of every BENCH_rN.json. This short line always
    # fits whole at the end of the tail, so the headline totals survive
    # in the per-round record; the full per-query line above remains for
    # greps and SCALE.md bookkeeping.
    print(
        json.dumps(
            {
                "metric": "headline_suite_wall",
                "value": total,
                "unit": "sec",
                "runs": RUNS,
                "short_query_runs": SHORT_RUNS,
                "n_queries": len(HEADLINE),
                "value_with_tier2": round(sum(timings.values()), 4),
                "n_with_tier2": len(HEADLINE) + len(TIER2),
                "loadavg_start": [round(x, 2) for x in load_start],
                "loadavg_end": [round(x, 2) for x in load_end],
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
