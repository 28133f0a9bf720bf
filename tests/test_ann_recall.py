"""ANN quality instrumentation: recall@k of the bucketed index paths
(IVF nprobe=1, IVF multi-probe, sign-LSH) against exact brute-force
cosine top-k. Correctness of each path is oracle-checked elsewhere; this
pins the QUALITY ordering the index structure promises — multi-probe
must dominate single-probe, and every path must beat a floor that a
broken bucketing (random candidates) would miss."""

from __future__ import annotations

import pytest

# r14: recall/quality measurement rigs — minutes of wall, statistical
# assertions; correctness of every path is oracle-gated separately
pytestmark = pytest.mark.slow

SF = "/root/testdata/sf0.01"


def _topk_sets(df):
    out = {}
    for r in df.collect():
        out.setdefault(r.q_id, set()).add(r.neighbor_id)
    return out


def _recall(approx, exact):
    hits = sum(len(approx.get(q, set()) & nbrs) for q, nbrs in exact.items())
    total = sum(len(nbrs) for nbrs in exact.values())
    return hits / total


def test_ivf_multiprobe_recall_dominates_single_probe(spark):
    from geo_db_spark.workload.similarity import (
        ann_cosine_topk,
        ann_ivf_multiprobe_topk,
        ann_ivf_topk,
    )

    exact = _topk_sets(ann_cosine_topk(spark, SF))
    one = _recall(_topk_sets(ann_ivf_topk(spark, SF)), exact)
    multi = _recall(_topk_sets(ann_ivf_multiprobe_topk(spark, SF)), exact)
    # probing a superset of cells can only add candidates
    assert multi >= one
    # 4/16 cells probed must land well above the random-candidate floor
    # (expected ~nprobe/C = 0.25 for broken bucketing)
    assert multi >= 0.5, f"multiprobe recall {multi}"


def test_multitable_lsh_recall_dominates_single_table(spark):
    """A 4x4-bit multi-table hash must recall far more true neighbors
    than the single 8-bit table (banding amplification): measured 0.44
    vs 0.02 at sf0.01 when this was pinned."""
    from geo_db_spark.workload.similarity import (
        ann_cosine_topk,
        ann_lsh_multitable_topk,
        ann_lsh_topk,
    )

    exact = _topk_sets(ann_cosine_topk(spark, SF))
    single = _recall(_topk_sets(ann_lsh_topk(spark, SF)), exact)
    multi = _recall(_topk_sets(ann_lsh_multitable_topk(spark, SF)), exact)
    assert multi > single
    assert multi >= 0.3, f"multitable lsh recall {multi}"


def test_arrow_kernel_matches_codegen_on_zero_norm_vectors(spark):
    """Regression (r4 review): a zero-norm vector divides 0/0, which the
    codegen baseline evaluates to NULL (Spark ANSI-off division) and the
    top-k window orders NULLS LAST — the Arrow kernel must KEEP those
    pairs and rank them below every real cosine, not drop them."""
    import math

    from pyspark.sql import functions as F

    from geo_db_spark.operators.similarity import (
        cosine_topk_bruteforce,
        cosine_topk_bruteforce_arrow,
    )

    corpus = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [0.9, 0.1]), (2, [0.0, 0.0]), (3, [0.5, 0.5])],
        "vec_id long, embedding array<float>",
    )
    queries = corpus.filter(F.col("vec_id") < 2)

    def norm(df):
        return sorted(
            (r.q_id, r.neighbor_id, r.rank,
             "null" if r.cosine is None or math.isnan(r.cosine) else round(r.cosine, 12))
            for r in df.collect()
        )

    for k in (1, 2, 3):
        base = norm(cosine_topk_bruteforce(corpus, queries, k=k))
        arrow = norm(cosine_topk_bruteforce_arrow(corpus, queries, k=k))
        assert base == arrow, f"k={k}: {base} != {arrow}"
    # at k=3 the zero-norm corpus vector is kept and ranks LAST
    assert any(n == 2 and r == 3 for (_, n, r, c) in base)
    # at small k it must NOT evict a real neighbor
    top1 = {q: n for (q, n, r, c) in norm(cosine_topk_bruteforce_arrow(corpus, queries, k=1))}
    assert top1 == {0: 1, 1: 0}


def test_semdedup_hot_cell_subsplit_bounds_and_still_pairs(spark):
    """r5 verdict #1: an over-cap cell must no longer be dropped wholesale
    — it sub-splits into <= max_cell chunks that each still pair, so the
    cap stays a hard memory bound while saturation degrades to partial
    recall instead of zero pairs."""
    from geo_db_spark.workload.similarity import semdedup_cell_pairs

    rows = []
    # hot cell 0: 12 identical vectors (cosine 1.0 — would all pair)
    for i in range(12):
        rows.append((0, 100 + i, [1.0, 0.0]))
    # cool cell 1: 3 identical vectors
    for i in range(3):
        rows.append((1, 200 + i, [0.0, 1.0]))
    assigned = spark.createDataFrame(
        rows, "cell long, vec_id long, embedding array<float>"
    )
    pairs = [(r.id_a, r.id_b) for r in semdedup_cell_pairs(assigned, max_cell=10).collect()]
    # chunk 0 = ids 100..109 (C(10,2)=45), chunk 1 = ids 110..111 (1),
    # cool cell = C(3,2)=3; the 20 cross-chunk pairs are the documented
    # recall loss — but the hot cell is NOT a no-op
    assert len(pairs) == 45 + 1 + 3
    hot = [(a, b) for a, b in pairs if a < 200]
    assert len(hot) == 46
    # no pair crosses the chunk boundary (memory bound respected)
    assert all(not (a <= 109 and b >= 110) for a, b in hot)
    # both chunks of the hot cell produced pairs
    assert (110, 111) in hot and (100, 101) in hot
    # and without chunking pressure the result is the full pair set
    uncapped = semdedup_cell_pairs(assigned, max_cell=100).collect()
    assert len(uncapped) == 3 + 66  # C(3,2) + C(12,2)


def test_semdedup_subsplit_oracle_parity_on_saturated_corpus(spark, tmp_path):
    """End-to-end DuckDB parity with the sub-split ACTIVE: a corpus whose
    dominant cell exceeds SEMDEDUP_MAX_CELL (the sf corpora never do) —
    clusters, survivors, and cell sizes must all match the oracle, the
    hot cell must report n_chunks=2, and pairs must still be found."""
    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq

    from geo_db_spark.verify import _norm_rows
    from geo_db_spark.workload import similarity as S

    # 16 centroid vectors pointing in scattered directions, then 600
    # near-identical vectors that all land in one cell (> max_cell=512)
    vecs, labels = [], []
    for i in range(16):
        vecs.append([float((i * 7) % 13 - 6), float((i * 5) % 11 - 5),
                     float((i * 3) % 7 - 3), 1.0])
        labels.append(i % 3)
    for j in range(600):
        vecs.append([100.0, (j % 7) * 0.01, ((j * 3) % 11) * 0.01, 0.5])
        labels.append(j % 3)
    tbl = pa.table(
        {
            "vec_id": pa.array(range(len(vecs)), pa.int64()),
            "embedding": pa.array(vecs, pa.list_(pa.float32())),
            "label": pa.array(labels, pa.int32()),
        }
    )
    d = str(tmp_path)
    pq.write_table(tbl, f"{d}/embeddings.parquet")
    con = duckdb.connect()
    con.sql(f"CREATE VIEW embeddings AS SELECT * FROM '{d}/embeddings.parquet'")

    sizes = S.emb_semdedup_cell_sizes(spark, d)
    hot = [r for r in sizes.collect() if r.is_hot]
    assert hot and any(r.n_chunks == 2 for r in hot)  # sub-split active

    for fn, sql in [
        (S.emb_semdedup_cell_sizes, S.ORACLE_SEMDEDUP_CELL_SIZES),
        (S.emb_semdedup_clusters, S.ORACLE_SEMDEDUP_CLUSTERS),
        (S.emb_semdedup_survivors, S.ORACLE_SEMDEDUP_SURVIVORS),
        (S.emb_semdedup_survivors_recovered, S.ORACLE_SEMDEDUP_SURVIVORS_RECOVERED),
    ]:
        sdf = fn(spark, d)
        s_rows = [tuple(r) for r in sdf.collect()]
        rel = con.sql(sql)
        o_rows = rel.fetchall()
        assert sorted(sdf.columns) == sorted(rel.columns)
        assert _norm_rows(s_rows, sdf.columns) == _norm_rows(o_rows, rel.columns), fn.__name__
    # the saturated cell still deduped: clusters exist and survivors < corpus
    assert S.emb_semdedup_clusters(spark, d).count() > 0
    assert S.emb_semdedup_survivors(spark, d).count() < len(vecs)


def test_semdedup_cell_knob_tames_hot_cells(spark):
    """The production answer to hot cells is scaling the centroid count:
    with few cells (4) the max population is far larger than with many
    (64) — the knob must actually move cell sizes, and 500 vectors over
    64 cells must fit under the cap."""
    from pyspark.sql import functions as F

    from geo_db_spark.workload.similarity import (
        SEMDEDUP_MAX_CELL,
        _ivf_cells_assigned_arrow,
    )

    sizes4 = (
        _ivf_cells_assigned_arrow(spark, SF, n_cells=4)
        .groupBy("cell").count().agg(F.max("count")).collect()[0][0]
    )
    sizes64 = (
        _ivf_cells_assigned_arrow(spark, SF, n_cells=64)
        .groupBy("cell").count().agg(F.max("count")).collect()[0][0]
    )
    assert sizes64 < sizes4  # more cells -> smaller max population
    assert sizes64 <= SEMDEDUP_MAX_CELL  # 500 vectors over 64 cells fits


def test_semdedup_recovery_pass_finds_cross_chunk_pairs(spark):
    """r6 verdict #2: a duplicate pair severed by the sub-split chunking
    must be recovered by pass 2. Construct a hot cell where chunk 0 holds
    one orientation and chunk 1 another: pass 1 finds only within-chunk
    pairs; the pass-1 survivors (one per within-chunk group) then fit one
    chunk together and pair across the old boundary."""
    from geo_db_spark.workload.similarity import (
        semdedup_cell_pairs,
        semdedup_pairs_with_recovery,
    )
    from geo_db_spark.operators.components import connected_components

    rows = []
    # ids 100..109 fill chunk 0 (max_cell=10): 5 "A"-direction + 5 "B"
    for i in range(5):
        rows.append((0, 100 + i, [1.0, 0.0]))
    for i in range(5):
        rows.append((0, 105 + i, [0.0, 1.0]))
    # ids 110..113 land in chunk 1: 2 more A + 2 more B — their A/B
    # partners all sit across the chunk boundary
    rows.append((0, 110, [1.0, 0.0]))
    rows.append((0, 111, [1.0, 0.0]))
    rows.append((0, 112, [0.0, 1.0]))
    rows.append((0, 113, [0.0, 1.0]))
    assigned = spark.createDataFrame(
        rows, "cell long, vec_id long, embedding array<float>"
    )

    p1 = {(r.id_a, r.id_b) for r in semdedup_cell_pairs(assigned, max_cell=10).collect()}
    # pass 1 alone: no pair crosses the boundary
    assert all(not (a <= 109 and b >= 110) for a, b in p1)
    # so pass-1 clustering leaves FOUR groups (A/B x chunk0/chunk1)
    cc1 = connected_components(
        spark.createDataFrame(sorted(p1), "id_a long, id_b long"), "id_a", "id_b"
    )
    assert cc1.select("cluster_id").distinct().count() == 4

    pall = semdedup_pairs_with_recovery(assigned, max_cell=10)
    cross = [(r.id_a, r.id_b) for r in pall.collect() if r.id_a <= 109 and r.id_b >= 110]
    # recovery found cross-chunk duplicates: the surviving representatives
    # (100 and 105 from chunk 0; 110 and 112 from chunk 1) pair up
    assert (100, 110) in cross and (105, 112) in cross
    # final clustering: exactly TWO groups (all A merged, all B merged)
    cc2 = connected_components(pall, "id_a", "id_b")
    got = {r.id: r.cluster_id for r in cc2.collect()}
    assert {got[i] for i in (100, 101, 102, 103, 104, 110, 111)} == {100}
    assert {got[i] for i in (105, 106, 107, 108, 109, 112, 113)} == {105}
    # memory bound unchanged: no recovered pair set exceeded the cap —
    # implied by construction (pass 2 reuses the same chunking); and on a
    # cap-free corpus pass 2 is a no-op (hot set empty)
    cool = spark.createDataFrame(rows[:4], "cell long, vec_id long, embedding array<float>")
    same = {(r.id_a, r.id_b) for r in semdedup_pairs_with_recovery(cool, max_cell=10).collect()}
    assert same == {(r.id_a, r.id_b) for r in semdedup_cell_pairs(cool, max_cell=10).collect()}


def test_sq8_recall_near_exact(spark):
    """r7 SQ8+rescore: the int8-code prefilter keeps 20 candidates for a
    k=5 cut, and exact rescoring means any true neighbor that survives
    the prefilter lands in its true rank — recall should be near-exact,
    far above every bucketed path's floor."""
    from geo_db_spark.workload.similarity import ann_cosine_topk, ann_sq8_topk

    exact = _topk_sets(ann_cosine_topk(spark, SF))
    rec = _recall(_topk_sets(ann_sq8_topk(spark, SF)), exact)
    assert rec >= 0.9, f"sq8 recall {rec}"


def test_mrl_prefix_recall_beats_floor(spark):
    """r7 MRL truncated search: 16/64 dims keep most of the signal on
    this corpus; with a 20-candidate rescore the recall floor is well
    above random (20/N) and the exact rescore puts survivors in true
    rank order."""
    from geo_db_spark.workload.similarity import ann_cosine_topk, ann_mrl_prefix_topk

    exact = _topk_sets(ann_cosine_topk(spark, SF))
    rec = _recall(_topk_sets(ann_mrl_prefix_topk(spark, SF)), exact)
    assert rec >= 0.6, f"mrl recall {rec}"


def test_kmeans_rounds_monotonically_reduce_inertia(spark):
    """r7 k-means trainer: Lloyd's algorithm guarantees non-increasing
    inertia per round (up to the integer re-quantization of means);
    trained centroids must beat the untrained first-K baseline."""
    from geo_db_spark.io import load
    from geo_db_spark.operators.similarity import kmeans_fixed_rounds

    emb = load(spark, SF, "embeddings")
    inertias = []
    for r in (0, 1, 2):
        a, _ = kmeans_fixed_rounds(emb, k=8, rounds=r)
        inertias.append(a.agg({"dist": "sum"}).collect()[0][0])
    assert inertias[1] < inertias[0] and inertias[2] <= inertias[1], inertias


def test_trained_ivf_recall_vs_untrained(spark):
    """r7 trained IVF: k-means cells at nprobe=1 must clear the
    broken-bucketing floor and are expected to match-or-beat the
    untrained first-K assignment at equal probe cost."""
    from geo_db_spark.workload.similarity import (
        ann_cosine_topk,
        ann_ivf_kmeans_topk,
        ann_ivf_topk,
    )

    exact = _topk_sets(ann_cosine_topk(spark, SF))
    untrained = _recall(_topk_sets(ann_ivf_topk(spark, SF)), exact)
    trained = _recall(_topk_sets(ann_ivf_kmeans_topk(spark, SF)), exact)
    # measured 0.60 = 0.60 at K=16; the trained win is cell BALANCE
    # (max cell 42 -> 38), not recall — keep a floor plus no-regression
    assert trained >= 0.45, f"trained-IVF recall {trained}"
    assert trained >= untrained - 0.1, (trained, untrained)


def test_pq_recall_scales_with_rescore_depth(spark):
    """PQ-ADC recall vs brute force: the rescore depth is the recall
    knob (0.48 -> ~0.70 from 20 -> 50 on this unclustered corpus); pin
    the measured operating point with slack and the monotonicity."""
    from pyspark.sql import functions as F

    from geo_db_spark.io import load
    from geo_db_spark.operators.similarity import (
        cosine_topk_bruteforce,
        cosine_topk_pq,
    )
    from tests.conftest import SF_SMOKE

    emb = load(spark, SF_SMOKE, "embeddings")
    q = emb.filter(F.col("vec_id") < 10)
    bf = {
        (r["q_id"], r["neighbor_id"])
        for r in cosine_topk_bruteforce(emb, q, k=5).collect()
    }

    def recall(m):
        pq = {
            (r["q_id"], r["neighbor_id"])
            for r in cosine_topk_pq(emb, q, k=5, rescore_m=m).collect()
        }
        return len(pq & bf) / len(bf)

    r20, r50 = recall(20), recall(50)
    assert r50 >= r20  # deeper rescore never hurts
    assert r50 >= 0.5  # the documented sf0.01 point is 0.70; sf0.001 slack


def test_pq_rejects_indivisible_dim(spark):
    import pytest

    from pyspark.sql import functions as F

    from geo_db_spark.io import load
    from geo_db_spark.operators.similarity import cosine_topk_pq
    from tests.conftest import SF_SMOKE

    emb = load(spark, SF_SMOKE, "embeddings")
    with pytest.raises(ValueError):
        cosine_topk_pq(emb, emb.filter(F.col("vec_id") < 2), m_sub=7)


def test_ivf_pq_recall_near_ivf_ceiling(spark):
    """IVF-PQ's recall is bounded by the coarse probe (trained IVF
    measured 0.60 at sf0.01); PQ + rescore inside the probed cell
    should give up little more. Pin the measured 0.57 with slack and
    that no returned neighbor is outside the query's coarse cell."""
    from pyspark.sql import functions as F

    from geo_db_spark.io import load
    from geo_db_spark.operators.similarity import (
        cosine_topk_bruteforce,
        ivf_pq_topk,
        kmeans_fixed_rounds,
    )
    from tests.conftest import SF_SMOKE

    emb = load(spark, SF_SMOKE, "embeddings")
    q = emb.filter(F.col("vec_id") < 10)
    bf = {
        (r["q_id"], r["neighbor_id"])
        for r in cosine_topk_bruteforce(emb, q, k=3).collect()
    }
    got_rows = ivf_pq_topk(emb, q, k=3, rescore_m=10).collect()
    got = {(r["q_id"], r["neighbor_id"]) for r in got_rows}
    assert len(got & bf) / len(bf) >= 0.4  # sf0.01 point: 0.57

    cells = {
        r["id"]: r["cell"]
        for r in kmeans_fixed_rounds(emb, k=16, rounds=2)[0].collect()
    }
    for qid, nid in got:
        assert cells[qid] == cells[nid]  # probe never leaves the cell


def test_kmeans_seeds_from_smallest_ids_not_id_range(spark):
    """Seeding must come from the k SMALLEST ids, not filter(id < k):
    with 1-based (or sparse) id spaces filter(id < k) silently trains
    with fewer centroids. 1000-based ids must still yield k distinct
    cells; fewer than k vectors must raise instead of degenerating."""
    import pytest
    from pyspark.sql import functions as F

    from geo_db_spark.operators.similarity import kmeans_fixed_rounds

    emb = spark.range(1000, 1030).select(
        F.col("id").alias("vec_id"),
        F.array(
            *[(F.col("id") % 7 + F.lit(float(d))).cast("double") for d in range(4)]
        ).alias("embedding"),
    )
    assigned, cent = kmeans_fixed_rounds(emb, k=4, rounds=1)
    assert cent.count() == 4
    # every vector assigned, and to a real trained cell (non-degenerate)
    rows = assigned.collect()
    assert len(rows) == 30
    assert len({r.cell for r in rows}) >= 2

    with pytest.raises(ValueError, match="needs k=8"):
        kmeans_fixed_rounds(emb.limit(5), k=8, rounds=1)


def test_ivf_pq_residual_beats_raw_on_clustered_corpus(spark):
    """r7 verdict #2: residual encoding is what makes IVF-PQ work on
    corpora WITH cluster structure. Raw codebooks spend their 4x8 code
    budget on the absolute positions of 16 coarse cells; residual
    codebooks encode only the within-cell spread. On a 16-cluster
    corpus (sigma=0.05 around uniform centers) the measured gap is
    0.12 -> 0.54 recall@5 at rescore 20 and 0.36 -> 0.82 at rescore 50
    — pinned loosely below so training-order jitter can't flake it.
    The repo's flat synthetic table shows no gap (documented in the
    workload docstring); this corpus is the one the operator exists
    for."""
    import numpy as np
    from pyspark.sql import functions as F

    from geo_db_spark.operators.similarity import (
        cosine_topk_bruteforce,
        ivf_pq_topk,
    )

    rng = np.random.RandomState(7)
    centers = rng.uniform(-1, 1, (16, 64))
    rows = []
    for i in range(2000):
        v = centers[i % 16] + rng.normal(0, 0.05, 64)
        rows.append((i, [float(x) for x in v]))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    queries = emb.filter(F.col("vec_id") < 10)

    truth = {}
    for r in cosine_topk_bruteforce(emb, queries, k=5).collect():
        truth.setdefault(r.q_id, set()).add(r.neighbor_id)
    n_truth = sum(len(t) for t in truth.values())

    def recall(residual, rescore_m):
        got = {}
        for r in ivf_pq_topk(
            emb, queries, k=5, rescore_m=rescore_m, residual=residual
        ).collect():
            got.setdefault(r.q_id, set()).add(r.neighbor_id)
        return sum(len(got.get(q, set()) & t) for q, t in truth.items()) / n_truth

    for rescore_m, raw_ceil, resid_floor in ((20, 0.35, 0.45), (50, 0.55, 0.70)):
        raw = recall(False, rescore_m)
        resid = recall(True, rescore_m)
        assert resid > raw + 0.10, (rescore_m, raw, resid)
        assert raw <= raw_ceil and resid >= resid_floor, (rescore_m, raw, resid)


def test_ivf_pq_residual_rejects_noncorpus_queries(spark):
    """r8 ADVICE #5: residual=True builds query residuals by corpus
    membership — a query id absent from the corpus must raise, not
    silently produce empty ADC tables and zero results."""
    import pytest
    from pyspark.sql import functions as F

    from geo_db_spark.io import load
    from geo_db_spark.operators.similarity import ivf_pq_topk
    from tests.conftest import SF_SMOKE

    emb = load(spark, SF_SMOKE, "embeddings")
    ghost = emb.filter(F.col("vec_id") < 2).withColumn(
        "vec_id", F.col("vec_id") + F.lit(10_000_000)
    )
    with pytest.raises(ValueError, match="not in the corpus"):
        ivf_pq_topk(emb, ghost, k=3, rescore_m=10, residual=True)


def _recall_rig(spark, mat, n_queries: int = 10):
    """Brute-force truth + recall closure over a numpy corpus. Each hit
    moves recall by 1/(5*n_queries) — margin tests over small measured
    gaps need n_queries large enough that run-to-run codebook jitter
    (threaded-BLAS reduction order flips borderline k-means
    assignments) can't cross the asserted margin."""
    from pyspark.sql import functions as F

    from geo_db_spark.operators.similarity import cosine_topk_bruteforce

    emb = spark.createDataFrame(
        [(i, [float(x) for x in mat[i]]) for i in range(len(mat))],
        "vec_id long, embedding array<float>",
    )
    queries = emb.filter(F.col("vec_id") < n_queries)
    truth = {}
    for r in cosine_topk_bruteforce(emb, queries, k=5).collect():
        truth.setdefault(r.q_id, set()).add(r.neighbor_id)
    n_truth = sum(len(t) for t in truth.values())

    def recall(fn, rescore_m):
        got = {}
        for r in fn(emb, queries, k=5, rescore_m=rescore_m).collect():
            got.setdefault(r.q_id, set()).add(r.neighbor_id)
        return sum(len(got.get(q, set()) & t) for q, t in truth.items()) / n_truth

    return recall


def test_opq_allocation_beats_pq_on_axis_aligned_spectrum(spark):
    """r8 verdict next #3 (Ge CVPR'13): on a steep AXIS-ALIGNED
    spectrum (sigma_d ~ 1/(1+d)), a contiguous split starves 3 of 4
    codebooks, so energy-balanced permutation must win big. Measured:
    PQ 0.12/0.22 -> OPQ-perm 0.34/0.52 at rescore 20/50; the full
    rotation adds a little more (0.36/0.56). Pinned loosely."""
    import numpy as np

    from geo_db_spark.operators.similarity import (
        cosine_topk_opq,
        cosine_topk_opq_rotated,
        cosine_topk_pq,
    )

    rng = np.random.RandomState(7)
    spec = 1.0 / (1.0 + np.arange(64))
    mat = rng.normal(0, 1, (2000, 64)) * spec
    recall = _recall_rig(spark, mat)
    for m, perm_floor in ((20, 0.25), (50, 0.40)):
        pq = recall(cosine_topk_pq, m)
        perm = recall(cosine_topk_opq, m)
        rot = recall(cosine_topk_opq_rotated, m)
        assert perm >= pq + 0.10, (m, pq, perm)
        assert perm >= perm_floor, (m, perm)
        assert rot >= perm - 0.05, (m, perm, rot)


def test_opq_rotation_beats_allocation_on_rotated_latent(spark):
    """The case only the LEARNED rotation can fix: the same steep
    spectrum hidden behind a fixed random orthogonal map, so per-axis
    energies are near-uniform and a permutation has nothing to
    balance, while the Procrustes alternation re-aligns the basis.
    Measured on THIS fixture at rescore 20: PQ 0.14, OPQ-perm 0.16,
    OPQ-rot 0.34 (at 50: 0.36 / 0.24 / 0.42 — permutation can even
    lose to PQ here, which is exactly why the rotation exists).
    Pinned loosely."""
    import numpy as np

    from geo_db_spark.operators.similarity import (
        cosine_topk_opq,
        cosine_topk_opq_rotated,
        cosine_topk_pq,
    )

    rng = np.random.RandomState(7)
    spec = 1.0 / (1.0 + np.arange(64))
    q_rot, _ = np.linalg.qr(rng.normal(0, 1, (64, 64)))
    mat = (rng.normal(0, 1, (2000, 64)) * spec) @ q_rot
    recall = _recall_rig(spark, mat)
    for m, rot_floor in ((20, 0.25), (50, 0.35)):
        pq = recall(cosine_topk_pq, m)
        perm = recall(cosine_topk_opq, m)
        rot = recall(cosine_topk_opq_rotated, m)
        # margins: 0.14/0.16 -> 0.34 at rescore 20; 0.36/0.24 -> 0.42
        # at 50 (the gap narrows as rescore absorbs quantization error)
        margin = 0.08 if m == 20 else 0.04
        assert rot >= max(pq, perm) + margin, (m, pq, perm, rot)
        assert rot >= rot_floor, (m, rot)


def test_opq_ivf_pq_composition_helps_at_tight_rescore(spark):
    """FAISS's production composition OPQ,IVF,PQ (r9): the rotation is
    trained on the sample's coarse-cell RESIDUALS — the distribution
    the PQ actually encodes. On anisotropic within-cluster noise
    hidden behind a random rotation, measured recall@5 over 40 queries:
    0.620 -> 0.685 at rescore 10 (where codebook quality matters most);
    ties at rescore 50 where the exact rescore absorbs quantization
    error — both facts pinned. (A rotation trained on the RAW sample
    measured a tie even at rescore 10: it optimizes flat-PQ distortion,
    which the residual step then discards.) r10: the original 10-query
    rig put the whole +0.05 margin inside two hits (0.02 recall each)
    — cross-host codebook jitter measured the same composition at 0.66
    AND 0.74, so the margin is now asserted over 40 queries where a
    flip moves recall by 0.005."""
    import numpy as np

    from geo_db_spark.operators.similarity import ivf_pq_opq_topk, ivf_pq_topk

    rng = np.random.RandomState(7)
    spec = 1.0 / (1.0 + np.arange(64) / 2.0)
    centers = rng.uniform(-1, 1, (16, 64))
    lat = np.array(
        [centers[i % 16] + rng.normal(0, 0.5, 64) * spec for i in range(2000)]
    )
    q_rot, _ = np.linalg.qr(rng.normal(0, 1, (64, 64)))
    recall = _recall_rig(spark, lat @ q_rot, n_queries=40)

    def plain(c, q, k, rescore_m):
        return ivf_pq_topk(c, q, k=k, rescore_m=rescore_m, residual=True)

    def composed(c, q, k, rescore_m):
        return ivf_pq_opq_topk(c, q, k=k, rescore_m=rescore_m)

    p10, c10 = recall(plain, 10), recall(composed, 10)
    assert c10 >= p10 + 0.04, (p10, c10)
    assert c10 >= 0.65, c10
    # the gap honestly closes once rescore absorbs quantization error
    assert recall(composed, 50) >= 0.9
