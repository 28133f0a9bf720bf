"""Dedup workload entries over the `documents` table."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from geo_db_spark.io import load
from geo_db_spark.operators.dedup import exact_dedup, normalize_text
from geo_db_spark.session import tune, tune_expansion_heavy


def dedup_exact_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: one surviving doc_id (the smallest) per normalized-text
    digest. Generalizes the reference's PK-conflict-ignore dedup
    (src/database.rs:101-134; SURVEY.md §2 D10) to content hashing."""
    tune(spark)
    docs = load(spark, sf_dir, "documents")
    return exact_dedup(docs, "text", "doc_id").select("digest", "doc_id")


ORACLE_EXACT = r"""
SELECT md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS digest,
       MIN(doc_id) AS doc_id
FROM documents
GROUP BY 1
"""


def dedup_exact_survivors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The surviving documents themselves (semi-join back to the corpus)."""
    tune(spark)
    docs = load(spark, sf_dir, "documents")
    winners = exact_dedup(docs, "text", "doc_id").select("doc_id")
    return docs.join(winners, "doc_id", "left_semi").select("doc_id", "lang", "source")


ORACLE_SURVIVORS = r"""
SELECT doc_id, lang, source FROM documents
WHERE doc_id IN (
    SELECT MIN(doc_id) FROM documents
    GROUP BY md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g')))
)
"""


def dedup_minhash_lsh_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash+LSH near-dup pairs (shingle -> 12 minhashes -> 6 band
    buckets -> bucket-join -> exact-Jaccard verify >= 0.5)."""
    tune(spark)
    from geo_db_spark.operators.dedup import minhash_lsh_pairs

    docs = load(spark, sf_dir, "documents")
    return minhash_lsh_pairs(docs, "text", "doc_id", n=3, threshold=0.5)


def _minhash_oracle() -> str:
    from geo_db_spark.operators.dedup import (
        MINHASH_COEFFS,
        MINHASH_MAX_BUCKET,
        MINHASH_P,
        MINHASH_ROWS_PER_BAND,
    )

    h = "(('0x'||substr(md5(s),1,8))::BIGINT)"
    sigs = ",\n    ".join(
        f"list_min(list_transform(sh, s -> ({a} * {h} + {b}) % {MINHASH_P})) AS m{i}"
        for i, (a, b) in enumerate(MINHASH_COEFFS)
    )
    r = MINHASH_ROWS_PER_BAND
    n_bands = len(MINHASH_COEFFS) // r
    band_exprs = ", ".join(
        "'" + str(k) + ",'||" + "||','||".join(f"CAST(m{k * r + j} AS VARCHAR)" for j in range(r))
        for k in range(n_bands)
    )
    return rf"""
WITH toks AS (
  SELECT doc_id AS id,
         regexp_split_to_array(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS t
  FROM documents
),
sh0 AS (
  SELECT id, list_distinct(list_filter(list_transform(list_zip(t, t[2:], t[3:]),
      p -> CASE WHEN p[3] IS NULL THEN NULL ELSE p[1]||' '||p[2]||' '||p[3] END),
      x -> x IS NOT NULL)) AS sh
  FROM toks
),
nz AS (SELECT * FROM sh0 WHERE len(sh) > 0),
sig AS (
  SELECT id, sh,
    {sigs}
  FROM nz
),
buckets AS (SELECT id, unnest([{band_exprs}]) AS bucket FROM sig),
hot AS (SELECT bucket FROM buckets GROUP BY bucket HAVING count(*) > {MINHASH_MAX_BUCKET}),
kept AS (SELECT * FROM buckets WHERE bucket NOT IN (SELECT bucket FROM hot)),
cand AS (
  SELECT DISTINCT a.id AS ia, b.id AS ib
  FROM kept a JOIN kept b USING (bucket) WHERE a.id < b.id
),
pairs AS (
  SELECT ia AS id_a, ib AS id_b,
         CAST(len(list_intersect(x.sh, y.sh)) AS DOUBLE)
           / len(list_distinct(list_concat(x.sh, y.sh))) AS jaccard
  FROM cand JOIN nz x ON x.id = ia JOIN nz y ON y.id = ib
)
SELECT id_a, id_b, jaccard FROM pairs WHERE jaccard >= 0.5
"""


def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """n-gram Jaccard near-dup pairs with min-shingle (1-hash MinHash)
    blocking — the single-shuffle first-pass dedup; see
    operators/dedup.py ngram_jaccard_pairs for the recall trade-off vs
    the 6-band LSH."""
    tune(spark)
    from geo_db_spark.operators.dedup import ngram_jaccard_pairs

    docs = load(spark, sf_dir, "documents")
    return ngram_jaccard_pairs(docs, "text", "doc_id", n=3, threshold=0.5)


def _ngram_jaccard_oracle() -> str:
    from geo_db_spark.operators.dedup import MINHASH_MAX_BUCKET

    return rf"""
WITH toks AS (
  SELECT doc_id AS id,
         regexp_split_to_array(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS t
  FROM documents
),
sh0 AS (
  SELECT id, list_distinct(list_filter(list_transform(list_zip(t, t[2:], t[3:]),
      p -> CASE WHEN p[3] IS NULL THEN NULL ELSE p[1]||' '||p[2]||' '||p[3] END),
      x -> x IS NOT NULL)) AS sh
  FROM toks
),
nz AS (SELECT * FROM sh0 WHERE len(sh) > 0),
keyed AS (
  SELECT id,
         list_min(list_transform(sh, s -> ('0x'||substr(md5(s),1,8))::BIGINT)) AS block
  FROM nz
),
kept AS (
  SELECT id, block FROM keyed
  QUALIFY count(*) OVER (PARTITION BY block) <= {MINHASH_MAX_BUCKET}
),
cand AS (
  SELECT a.id AS ia, b.id AS ib
  FROM kept a JOIN kept b USING (block) WHERE a.id < b.id
),
pairs AS (
  SELECT ia AS id_a, ib AS id_b,
         CAST(len(list_intersect(x.sh, y.sh)) AS DOUBLE)
           / len(list_distinct(list_concat(x.sh, y.sh))) AS jaccard
  FROM cand JOIN nz x ON x.id = ia JOIN nz y ON y.id = ib
)
SELECT id_a, id_b, jaccard FROM pairs WHERE jaccard >= 0.5
"""


def dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup CLUSTERS: minhash-LSH pairs -> connected components
    (min-label propagation with pointer jumping, operators/components.py).
    One row per clustered document: (doc_id, cluster_id), cluster_id =
    min doc_id of the component. Documents in no pair are absent."""
    tune(spark)
    from geo_db_spark.operators.components import connected_components
    from geo_db_spark.operators.dedup import minhash_lsh_pairs

    docs = load(spark, sf_dir, "documents")
    pairs = minhash_lsh_pairs(docs, "text", "doc_id", n=3, threshold=0.5)
    return connected_components(pairs, "id_a", "id_b").select(
        F.col("id").alias("doc_id"), "cluster_id"
    )


def _clusters_oracle() -> str:
    # the pairs CTE is the (nested-WITH) minhash oracle verbatim; on top,
    # undirected reachability via a recursive CTE, min start-node per node
    return rf"""
WITH RECURSIVE p AS ({_minhash_oracle()}),
e AS (SELECT id_a AS a, id_b AS b FROM p
      UNION SELECT id_b, id_a FROM p),
n AS (SELECT DISTINCT a AS id FROM e),
reach(id, r) AS (
  SELECT id, id FROM n
  UNION
  SELECT e.b, reach.r FROM reach JOIN e ON e.a = reach.id
)
SELECT id AS doc_id, MIN(r) AS cluster_id FROM reach GROUP BY id
"""


def dedup_cluster_survivors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The deduplicated corpus: drop every clustered document except its
    component's min doc_id. Anti-join of the corpus against non-min
    cluster members — the final act of the pairs->clusters->survivors
    pipeline; at 100 TB the anti-join side is |clustered docs| only."""
    tune(spark)
    from geo_db_spark.operators.components import connected_components
    from geo_db_spark.operators.dedup import minhash_lsh_pairs

    docs = load(spark, sf_dir, "documents")
    pairs = minhash_lsh_pairs(docs, "text", "doc_id", n=3, threshold=0.5)
    cc = connected_components(pairs, "id_a", "id_b")
    losers = cc.filter(F.col("id") != F.col("cluster_id")).select(
        F.col("id").alias("doc_id")
    )
    return docs.join(losers, "doc_id", "left_anti").select("doc_id", "lang", "source")


def _cluster_survivors_oracle() -> str:
    return rf"""
WITH RECURSIVE p AS ({_minhash_oracle()}),
e AS (SELECT id_a AS a, id_b AS b FROM p
      UNION SELECT id_b, id_a FROM p),
n AS (SELECT DISTINCT a AS id FROM e),
reach(id, r) AS (
  SELECT id, id FROM n
  UNION
  SELECT e.b, reach.r FROM reach JOIN e ON e.a = reach.id
),
cc AS (SELECT id, MIN(r) AS cluster_id FROM reach GROUP BY id)
SELECT doc_id, lang, source FROM documents
WHERE doc_id NOT IN (SELECT id FROM cc WHERE id <> cluster_id)
"""


def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """60-bit SimHash fingerprint per document (majority vote over md5
    token hashes; ties -> 1)."""
    tune(spark)
    from geo_db_spark.operators.dedup import simhash

    docs = load(spark, sf_dir, "documents")
    return simhash(docs, "text", "doc_id")


def _simhash_oracle() -> str:
    from geo_db_spark.operators.dedup import SIMHASH_BITS

    votes = ",\n    ".join(
        f"SUM(((h >> {j}) % 2) * 2 - 1) AS v{j}" for j in range(SIMHASH_BITS)
    )
    fp = " + ".join(
        f"CASE WHEN v{j} >= 0 THEN (1::BIGINT << {j}) ELSE 0 END" for j in range(SIMHASH_BITS)
    )
    return rf"""
WITH toks AS (
  SELECT doc_id AS id,
         unnest(list_distinct(regexp_split_to_array(
             trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' '))) AS tok
  FROM documents
),
h AS (SELECT id, ('0x'||substr(md5(tok),1,15))::BIGINT AS h FROM toks),
votes AS (SELECT id, {votes} FROM h GROUP BY id)
SELECT id AS doc_id, {fp} AS simhash FROM votes
"""




def dedup_simjoin_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT set-similarity join (prefix filtering, AllPairs/PPJoin —
    operators/simjoin.py): every 3-gram-shingle pair with Jaccard >= 1/2,
    no recall loss. The oracle is deliberately the BRUTE-FORCE all-pairs
    form, so a green hash proves the prefix + size + positional filters
    drop zero qualifying pairs."""
    tune(spark)
    from geo_db_spark.operators.simjoin import set_similarity_join

    docs = load(spark, sf_dir, "documents")
    return set_similarity_join(docs, 1, 2).orderBy("id_a", "id_b")


ORACLE_SIMJOIN = r"""
WITH toks AS (
  SELECT doc_id AS id,
         regexp_split_to_array(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS t
  FROM documents
),
sh0 AS (
  SELECT id, list_distinct(list_filter(list_transform(list_zip(t, t[2:], t[3:]),
      p -> CASE WHEN p[3] IS NULL THEN NULL ELSE p[1]||' '||p[2]||' '||p[3] END),
      x -> x IS NOT NULL)) AS sh
  FROM toks
),
nz AS (SELECT * FROM sh0 WHERE len(sh) > 0),
pairs AS (
  SELECT a.id AS id_a, b.id AS id_b,
         CAST(len(list_intersect(a.sh, b.sh)) AS BIGINT) AS inter,
         CAST(len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh)) AS BIGINT) AS uni
  FROM nz a JOIN nz b ON a.id < b.id
)
SELECT id_a, id_b, inter, uni, CAST(inter AS DOUBLE) / uni AS jaccard
FROM pairs WHERE inter * 2 >= uni * 1
ORDER BY id_a, id_b
"""

def dedup_simjoin_survivors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-similarity dedup END-TO-END: the zero-recall-loss pair set
    (prefix-filtered exact Jaccard >= 1/2) -> connected components ->
    survivors. Unlike the MinHash/blocked variants, a duplicate pair can
    never be missed here, so the survivor set is exactly what a
    brute-force dedup would keep — the oracle proves it (all-pairs CTE
    + recursive reachability)."""
    tune(spark)
    from geo_db_spark.operators.components import connected_components
    from geo_db_spark.operators.simjoin import set_similarity_join

    docs = load(spark, sf_dir, "documents")
    pairs = set_similarity_join(docs, 1, 2).select("id_a", "id_b")
    cc = connected_components(pairs, "id_a", "id_b")
    losers = cc.filter(F.col("id") != F.col("cluster_id")).select(
        F.col("id").alias("doc_id")
    )
    return docs.join(losers, "doc_id", "left_anti").select("doc_id", "lang", "source")


def _simjoin_survivors_oracle() -> str:
    return rf"""
WITH RECURSIVE p AS ({ORACLE_SIMJOIN}),
e AS (SELECT id_a AS a, id_b AS b FROM p
      UNION SELECT id_b, id_a FROM p),
n AS (SELECT DISTINCT a AS id FROM e),
reach(id, r) AS (
  SELECT id, id FROM n
  UNION
  SELECT e.b, reach.r FROM reach JOIN e ON e.a = reach.id
),
cc AS (SELECT id, MIN(r) AS cluster_id FROM reach GROUP BY id)
SELECT doc_id, lang, source FROM documents
WHERE doc_id NOT IN (SELECT id FROM cc WHERE id <> cluster_id)
"""


QUERIES = {
    "dedup_exact_documents": dedup_exact_documents,
    "dedup_exact_survivors": dedup_exact_survivors,
    "dedup_minhash_lsh_pairs": dedup_minhash_lsh_pairs,
    "dedup_ngram_jaccard": dedup_ngram_jaccard,
    "dedup_clusters": dedup_clusters,
    "dedup_cluster_survivors": dedup_cluster_survivors,
    "dedup_simhash": dedup_simhash,
    "dedup_simjoin_exact": dedup_simjoin_exact,
    "dedup_simjoin_survivors": dedup_simjoin_survivors,
}

ORACLES = {
    "dedup_clusters": _clusters_oracle(),
    "dedup_cluster_survivors": _cluster_survivors_oracle(),
    "dedup_exact_documents": ORACLE_EXACT,
    "dedup_exact_survivors": ORACLE_SURVIVORS,
    "dedup_minhash_lsh_pairs": _minhash_oracle(),
    "dedup_ngram_jaccard": _ngram_jaccard_oracle(),
    "dedup_simhash": _simhash_oracle(),
    "dedup_simjoin_exact": ORACLE_SIMJOIN,
    "dedup_simjoin_survivors": _simjoin_survivors_oracle(),
}


def dedup_containment_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT asymmetric-containment join (r7): ordered pairs where >= 3/5
    of A's 3-gram shingles appear in B — the quote/subset-duplicate case
    symmetric Jaccard misses. Prefix-filtered on the probing side only
    (containment has no index prefix), with the index pruned to
    prefix-witness tokens so stop-shingles never become join keys.
    Oracle = brute force over all ordered pairs, proving zero recall
    loss.

    Scale guardrail (r11, from the r10 100x probe — SCALE.md
    "second-decade scale probe"): the candidate-pair aggregation is
    EXPANSION-HEAVY (skinny duplicate-laden pair rows compress ~50x;
    the agg state does not), so AQE's compressed-bytes coalescing
    starves it of tasks at scale (33 tasks / ~30-45 GB spill / 2035 s
    at 100x; an 8m advisory re-split to 123 tasks, 1403 s, identical
    output). tune_expansion_heavy applies that advisory here; tune()
    restores the default on the next query's entry."""
    tune(spark)
    tune_expansion_heavy(spark)
    from geo_db_spark.operators.simjoin import containment_join

    docs = load(spark, sf_dir, "documents")
    return containment_join(docs, threshold_num=3, threshold_den=5)


ORACLE_CONTAINMENT_PAIRS = r"""
WITH toks AS (
  SELECT doc_id AS id,
         regexp_split_to_array(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS t
  FROM documents
),
sh0 AS (
  SELECT id, list_distinct(list_filter(list_transform(list_zip(t, t[2:], t[3:]),
      p -> CASE WHEN p[3] IS NULL THEN NULL ELSE p[1]||' '||p[2]||' '||p[3] END),
      x -> x IS NOT NULL)) AS sh
  FROM toks
),
nz AS (SELECT * FROM sh0 WHERE len(sh) > 0),
pairs AS (
  SELECT a.id AS id_a, b.id AS id_b,
         CAST(len(list_intersect(a.sh, b.sh)) AS BIGINT) AS inter,
         CAST(len(a.sh) AS BIGINT) AS n_a
  FROM nz a JOIN nz b ON a.id <> b.id
)
SELECT id_a, id_b, inter, n_a, CAST(inter AS DOUBLE) / n_a AS containment
FROM pairs WHERE inter * 5 >= n_a * 3
"""

QUERIES["dedup_containment_pairs"] = dedup_containment_pairs
ORACLES["dedup_containment_pairs"] = ORACLE_CONTAINMENT_PAIRS


def dedup_split_leakage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/test LEAKAGE audit (r7): near-duplicate pairs that straddle
    different md5-split bands — the governance check every training
    corpus needs (a test document with a train-side near-dup inflates
    eval). Built from the EXACT simjoin (zero recall loss, so "no
    leakage" is a proof, not a probability) crossed with the
    deterministic split assignment; at 100 TB both inputs are already
    computed by their own pipelines and this is one broadcast-band
    annotate + filter on the (small) pair set."""
    tune(spark)
    from geo_db_spark.operators.packing import split_assign
    from geo_db_spark.operators.simjoin import set_similarity_join

    docs = load(spark, sf_dir, "documents")
    pairs = set_similarity_join(docs, 1, 2)
    sa = docs.select(F.col("doc_id").alias("id_a"), split_assign().alias("split_a"))
    sb = docs.select(F.col("doc_id").alias("id_b"), split_assign().alias("split_b"))
    return (
        pairs.join(sa, "id_a")
        .join(sb, "id_b")
        .filter(F.col("split_a") != F.col("split_b"))
        .select("id_a", "id_b", "split_a", "split_b", "inter", "uni", "jaccard")
    )


_SPLIT_CASE = (
    "CASE WHEN ('0x' || substr(md5(CAST({col} AS VARCHAR)), 1, 8))::BIGINT % 100 < 96 "
    "THEN 'train' WHEN ('0x' || substr(md5(CAST({col} AS VARCHAR)), 1, 8))::BIGINT % 100 < 98 "
    "THEN 'val' ELSE 'test' END"
)

ORACLE_SPLIT_LEAKAGE = rf"""
WITH p AS ({ORACLE_SIMJOIN})
SELECT id_a, id_b,
       {_SPLIT_CASE.format(col='id_a')} AS split_a,
       {_SPLIT_CASE.format(col='id_b')} AS split_b,
       inter, uni, jaccard
FROM p
WHERE {_SPLIT_CASE.format(col='id_a')} <> {_SPLIT_CASE.format(col='id_b')}
"""

QUERIES["dedup_split_leakage"] = dedup_split_leakage
ORACLES["dedup_split_leakage"] = ORACLE_SPLIT_LEAKAGE


def dedup_editdist_customer_names(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character-level near-dup: customer-name pairs within levenshtein
    distance 1 (one-digit typos), via the FastSS deletion-neighborhood
    join — the exact char-metric complement to the shingle-set family,
    which cannot see single-char edits in short keys. Oracle is the
    brute-force quadratic levenshtein, so recall loss would be caught."""
    tune(spark)
    from geo_db_spark.operators.editjoin import edit_distance_join

    cust = load(spark, sf_dir, "customer")
    return edit_distance_join(cust, "c_custkey", "c_name").select(
        F.col("id_a").alias("custkey_a"),
        F.col("id_b").alias("custkey_b"),
        F.col("editdist").cast("long").alias("editdist"),
    )


ORACLE_EDITDIST = r"""
SELECT a.c_custkey AS custkey_a, b.c_custkey AS custkey_b,
       CAST(levenshtein(a.c_name, b.c_name) AS BIGINT) AS editdist
FROM customer a JOIN customer b ON a.c_custkey < b.c_custkey
WHERE levenshtein(a.c_name, b.c_name) <= 1
"""

QUERIES["dedup_editdist_customer_names"] = dedup_editdist_customer_names
ORACLES["dedup_editdist_customer_names"] = ORACLE_EDITDIST


def dedup_editdist2_customer_names(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Radius-2 character-level near-dup (r7 verdict #3): customer-name
    pairs within levenshtein distance 2 via the FastSS <=2-deletion
    closure — the radius real fuzzy-dedup of titles/codes/URLs wants
    (two typos, a swapped-and-dropped char). Same vocabulary-bound
    distinct-first shape as depth 1, ~L^2/2 variants per distinct
    string. Oracle is the brute-force quadratic levenshtein, so any
    recall loss in the deeper closure would be caught."""
    tune(spark)
    from geo_db_spark.operators.editjoin import edit_distance_join

    cust = load(spark, sf_dir, "customer")
    return edit_distance_join(cust, "c_custkey", "c_name", max_dist=2).select(
        F.col("id_a").alias("custkey_a"),
        F.col("id_b").alias("custkey_b"),
        F.col("editdist").cast("long").alias("editdist"),
    )


ORACLE_EDITDIST2 = r"""
SELECT a.c_custkey AS custkey_a, b.c_custkey AS custkey_b,
       CAST(levenshtein(a.c_name, b.c_name) AS BIGINT) AS editdist
FROM customer a JOIN customer b ON a.c_custkey < b.c_custkey
WHERE levenshtein(a.c_name, b.c_name) <= 2
"""

QUERIES["dedup_editdist2_customer_names"] = dedup_editdist2_customer_names
ORACLES["dedup_editdist2_customer_names"] = ORACLE_EDITDIST2


def dedup_containment_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Candidate-count observability for the containment join (r8
    verdict next #6): documents, prefix-filter CANDIDATE pairs, and
    qualifying pairs per probe-size class (floor(log2 |A|), per-row and
    integer-exact — a decile would need a global single-task rank
    window). Attributes the bench envelope: candidate growth
    concentrated in large-|A| classes points at Xiao's suffix filter;
    candidates tracking hits means the cost is inherent verification.
    Shares the join's own candidate generator, so the profiled stream
    IS the production stream; the oracle replays the prefix-filter
    candidate rule (rarest-first (tdf, token) order, probe prefix
    |A| - ceil(t|A|) + 1, size filter |B| >= ceil(t|A|)) against
    brute-force hits. Shares the pairs query's expansion-heavy AQE
    profile (see dedup_containment_pairs' scale guardrail note)."""
    tune(spark)
    tune_expansion_heavy(spark)
    from geo_db_spark.operators.simjoin import containment_candidate_profile

    docs = load(spark, sf_dir, "documents")
    return containment_candidate_profile(docs, threshold_num=3, threshold_den=5)


def _containment_profile_oracle() -> str:
    from geo_db_spark.operators.simjoin import FLOORLOG2_SQL

    log2n = FLOORLOG2_SQL.format(col="n")
    return rf"""
WITH toks AS (
  SELECT doc_id AS id,
         regexp_split_to_array(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS t
  FROM documents
),
sh0 AS (
  SELECT id, list_distinct(list_filter(list_transform(list_zip(t, t[2:], t[3:]),
      p -> CASE WHEN p[3] IS NULL THEN NULL ELSE p[1]||' '||p[2]||' '||p[3] END),
      x -> x IS NOT NULL)) AS sh
  FROM toks
),
nz AS (SELECT * FROM sh0 WHERE len(sh) > 0),
ex AS (SELECT id, unnest(sh) AS token FROM nz),
tdf AS (SELECT token, COUNT(*) AS tdf FROM ex GROUP BY token),
szs AS (SELECT id, CAST(len(sh) AS BIGINT) AS n FROM nz),
ordd AS (
  SELECT ex.id, ex.token,
         row_number() OVER (PARTITION BY ex.id ORDER BY t.tdf, ex.token) AS pos
  FROM ex JOIN tdf t USING (token)
),
pref AS (
  SELECT o.id, o.token, s.n
  FROM ordd o JOIN szs s ON s.id = o.id
  WHERE o.pos <= s.n - ((s.n * 3 + 4) // 5) + 1
),
cand0 AS (
  SELECT p.id AS id_a, o.id AS id_b,
         COUNT(*) AS k,
         MIN(o.pos) AS pb_min, MAX(o.pos) AS pb_max,
         MAX(p.n) AS n_a, MAX(sb.n) AS n_b
  FROM pref p
  JOIN ordd o ON o.token = p.token AND o.id <> p.id
  JOIN szs sb ON sb.id = o.id
  WHERE sb.n >= (p.n * 3 + 4) // 5
  GROUP BY 1, 2
),
cand AS (
  -- r10 grouped positional filters (simjoin.py c1/c2): c2 bounds the
  -- overlap by B-positions at/after the smallest common token; c1 by
  -- k exact prefix-region matches plus the suffix remainder
  SELECT id_a, id_b FROM cand0
  WHERE n_b - pb_min + 1 >= (n_a * 3 + 4) // 5
    AND k + least((n_a * 3 + 4) // 5 - 1, n_b - pb_max) >= (n_a * 3 + 4) // 5
),
hits AS (
  SELECT a.id AS id_a
  FROM nz a JOIN nz b ON a.id <> b.id
  WHERE CAST(len(list_intersect(a.sh, b.sh)) AS BIGINT) * 5 >= len(a.sh) * 3
),
cls AS (SELECT id, CAST({log2n} AS INT) AS size_class FROM szs),
dagg AS (SELECT size_class, CAST(COUNT(*) AS BIGINT) AS docs FROM cls GROUP BY 1),
cagg AS (
  SELECT cls.size_class, CAST(COUNT(*) AS BIGINT) AS cand_pairs
  FROM cand JOIN cls ON cls.id = cand.id_a GROUP BY 1
),
hagg AS (
  SELECT cls.size_class, CAST(COUNT(*) AS BIGINT) AS hit_pairs
  FROM hits JOIN cls ON cls.id = hits.id_a GROUP BY 1
)
SELECT dagg.size_class, dagg.docs,
       COALESCE(cand_pairs, 0) AS cand_pairs,
       COALESCE(hit_pairs, 0) AS hit_pairs
FROM dagg
LEFT JOIN cagg USING (size_class)
LEFT JOIN hagg USING (size_class)
"""


QUERIES["dedup_containment_profile"] = dedup_containment_profile
ORACLES["dedup_containment_profile"] = _containment_profile_oracle()


WINNOW_K = 20
WINNOW_W = 8


def text_winnow_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing document fingerprints (r9; Schleimer SIGMOD'03 — the
    MOSS substring-fingerprint algorithm): hash every 20-char gram,
    slide an 8-hash window, keep each window's minimum — any
    duplicated substring of >= 27 chars shares a selected gram in
    every copy. (8-char grams were measured near-quadratic on this
    synthetic vocabulary — 92k of 125k possible pairs matched at
    sf0.001; 20-char grams only match on REAL duplication: 97 pairs.)
    Emits per-doc selection statistics (count + hash/pos checksums);
    the oracle replays gram hashing, the combined-key window minimum
    and the distinct selection. The window is per-DOC (partitioned by
    doc_id), so selection parallelism is document parallelism."""
    tune(spark)
    from geo_db_spark.operators.dedup import winnow_fingerprints

    docs = load(spark, sf_dir, "documents")
    fp = winnow_fingerprints(docs, k=WINNOW_K, w=WINNOW_W)
    return fp.groupBy(F.col("id").alias("doc_id")).agg(
        F.count(F.lit(1)).alias("n_fps"),
        F.sum("gram_hash").alias("hash_sum"),
        F.sum("pos").alias("pos_sum"),
    )


_WINNOW_SEL = f"""
g AS (
  SELECT doc_id, text,
         unnest(range(1, GREATEST(length(text) - {WINNOW_K - 1}, 0) + 1)) AS pos
  FROM documents
),
keyed AS (
  SELECT doc_id, pos,
         CAST(('0x' || substr(md5(substr(text, CAST(pos AS INT), {WINNOW_K})), 1, 8)) AS BIGINT)
           * {1 << 20} + pos AS key
  FROM g
),
win AS (
  SELECT doc_id, pos,
         MIN(key) OVER (PARTITION BY doc_id ORDER BY pos
                        ROWS BETWEEN CURRENT ROW AND {WINNOW_W - 1} FOLLOWING) AS sel,
         COUNT(*) OVER (PARTITION BY doc_id ORDER BY pos
                        ROWS BETWEEN CURRENT ROW AND {WINNOW_W - 1} FOLLOWING) AS nw
  FROM keyed
),
selected AS (SELECT DISTINCT doc_id, sel AS key FROM win WHERE nw = {WINNOW_W})
"""

ORACLE_WINNOW_FPS = f"""
WITH {_WINNOW_SEL}
SELECT doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_fps,
       CAST(SUM(key // {1 << 20}) AS BIGINT) AS hash_sum,
       CAST(SUM(key % {1 << 20}) AS BIGINT) AS pos_sum
FROM selected GROUP BY doc_id
"""


def dedup_winnow_matches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document substring duplication via winnowing (r9; the Lee
    et al. ACL'22 exact-substring dedup signal at fingerprint cost):
    pairs sharing >= 2 distinct SELECTED 20-char grams, gram strings
    compared directly so a hash collision cannot fabricate a match.
    Grams selected by > 64 documents are dropped before the join (the
    minhash hot-bucket convention — boilerplate grams would make the
    join key quadratic at corpus scale; documented recall trade,
    replicated in the oracle)."""
    tune(spark)
    from geo_db_spark.operators.dedup import winnow_match_pairs

    docs = load(spark, sf_dir, "documents")
    return winnow_match_pairs(
        docs, k=WINNOW_K, w=WINNOW_W, min_shared=2, hot_cap=WINNOW_HOT_CAP
    )


ORACLE_WINNOW_MATCHES = f"""
WITH {_WINNOW_SEL},
selgram AS (
  SELECT DISTINCT s.doc_id,
         substr(d.text, CAST(s.key % {1 << 20} AS INT), {WINNOW_K}) AS gram
  FROM selected s JOIN documents d USING (doc_id)
),
hot AS (
  SELECT gram FROM selgram GROUP BY gram HAVING COUNT(*) > 64
),
kept AS (SELECT * FROM selgram WHERE gram NOT IN (SELECT gram FROM hot))
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, CAST(COUNT(*) AS BIGINT) AS shared
FROM kept a JOIN kept b ON a.gram = b.gram AND a.doc_id < b.doc_id
GROUP BY 1, 2
HAVING COUNT(*) >= 2
"""

WINNOW_HOT_CAP = 64


def dedup_winnow_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Observability for the winnow-matches hot_cap=64 recall trade
    (r11; the r9/r10 verdicts' open Next item — the containment-profile
    pattern): the df distribution of SELECTED grams by integer
    floor(log2 df) class, with the capped-gram count and the join work
    each class would contribute, split kept vs capped. ``capped_pairs``
    is exactly the candidate volume the hot-gram prune avoids (the
    quadratic boilerplate blowup) and ``n_capped`` the recall surface
    it costs — the two numbers that make the trade attributable from
    query output instead of SCALE.md prose. Shares the PRODUCTION
    fingerprint generator (winnow_fingerprints, same k/w), so the
    profiled stream is the stream dedup_winnow_matches joins.
    Integer-exact throughout (FLOORLOG2_SQL, div — no doubles)."""
    tune(spark)
    from geo_db_spark.operators.dedup import winnow_fingerprints
    from geo_db_spark.operators.simjoin import FLOORLOG2_SQL

    docs = load(spark, sf_dir, "documents")
    fp = winnow_fingerprints(docs, k=WINNOW_K, w=WINNOW_W)
    dfc = (
        fp.select("id", "gram")
        .distinct()
        .groupBy("gram")
        .agg(F.count(F.lit(1)).alias("df"))
    )
    capped = F.col("df") > WINNOW_HOT_CAP
    work = F.expr("df * (df - 1) div 2")
    return (
        dfc.select(
            F.expr(FLOORLOG2_SQL.format(col="df")).cast("long").alias("df_class"),
            "df",
        )
        .groupBy("df_class")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_grams"),
            F.sum(F.when(capped, 1).otherwise(0)).cast("long").alias("n_capped"),
            F.sum(F.when(~capped, work).otherwise(0)).cast("long").alias("kept_pairs"),
            F.sum(F.when(capped, work).otherwise(0)).cast("long").alias("capped_pairs"),
        )
    )


def _winnow_profile_oracle() -> str:
    from geo_db_spark.operators.simjoin import FLOORLOG2_SQL

    return f"""
WITH {_WINNOW_SEL},
selgram AS (
  SELECT DISTINCT s.doc_id,
         substr(d.text, CAST(s.key % {1 << 20} AS INT), {WINNOW_K}) AS gram
  FROM selected s JOIN documents d USING (doc_id)
),
dfc AS (SELECT gram, CAST(COUNT(*) AS BIGINT) AS df FROM selgram GROUP BY gram)
SELECT CAST({FLOORLOG2_SQL.format(col="df")} AS BIGINT) AS df_class,
       CAST(COUNT(*) AS BIGINT) AS n_grams,
       CAST(SUM(CASE WHEN df > {WINNOW_HOT_CAP} THEN 1 ELSE 0 END) AS BIGINT)
         AS n_capped,
       CAST(SUM(CASE WHEN df <= {WINNOW_HOT_CAP} THEN df * (df - 1) // 2
                ELSE 0 END) AS BIGINT) AS kept_pairs,
       CAST(SUM(CASE WHEN df > {WINNOW_HOT_CAP} THEN df * (df - 1) // 2
                ELSE 0 END) AS BIGINT) AS capped_pairs
FROM dfc GROUP BY 1
"""


QUERIES["text_winnow_fingerprints"] = text_winnow_fingerprints
ORACLES["text_winnow_fingerprints"] = ORACLE_WINNOW_FPS
QUERIES["dedup_winnow_matches"] = dedup_winnow_matches
ORACLES["dedup_winnow_matches"] = ORACLE_WINNOW_MATCHES
QUERIES["dedup_winnow_profile"] = dedup_winnow_profile
ORACLES["dedup_winnow_profile"] = _winnow_profile_oracle()


CDC_K = 8
CDC_MASK_BITS = 5


def text_cdc_chunk_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-defined chunking statistics (r9; Rabin/LBFS boundaries,
    Muthitacharoen SOSP'01): per document, the chunk count, the largest
    chunk, and a digest checksum. Boundaries move WITH content (a gram
    hashing to 0 mod 32 ends a chunk), so near-identical documents
    realign after an edit — the storage/dedup property fixed blocks
    lack. The oracle replays gram hashing, boundary selection, the lag
    spans and the chunk digests."""
    tune(spark)
    from geo_db_spark.operators.dedup import cdc_chunks, md5_prefix64

    docs = load(spark, sf_dir, "documents")
    ch = cdc_chunks(docs, k=CDC_K, mask_bits=CDC_MASK_BITS)
    return ch.groupBy(F.col("id").alias("doc_id")).agg(
        F.count(F.lit(1)).alias("n_chunks"),
        F.max("chunk_len").alias("max_chunk"),
        F.sum(md5_prefix64(F.col("digest"))).alias("digest_sum"),
    )


def dedup_cdc_chunk_dupes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chunk-level duplication: digests whose chunk appears in more
    than one document — the bytes a chunk store would dedupe. Emits
    (digest, chunk_len, n_docs)."""
    tune(spark)
    from geo_db_spark.operators.dedup import cdc_chunks

    docs = load(spark, sf_dir, "documents")
    ch = cdc_chunks(docs, k=CDC_K, mask_bits=CDC_MASK_BITS)
    return (
        ch.groupBy("digest", "chunk_len")
        .agg(F.count_distinct("id").alias("n_docs"))
        .filter(F.col("n_docs") > 1)
    )


_CDC_CHUNKS = f"""
pos AS (
  SELECT doc_id, text,
         unnest(range({CDC_K}, length(text) + 1)) AS p
  FROM documents
),
bnd AS (
  SELECT doc_id, p FROM pos
  WHERE CAST(('0x' || substr(md5(substr(text, CAST(p - {CDC_K - 1} AS INT), {CDC_K})), 1, 8)) AS BIGINT)
        % {1 << CDC_MASK_BITS} = 0
  UNION
  SELECT doc_id, length(text) AS p FROM documents WHERE length(text) > 0
),
spans AS (
  SELECT doc_id,
         COALESCE(LAG(p) OVER (PARTITION BY doc_id ORDER BY p), 0) + 1 AS s,
         p AS e
  FROM bnd
),
ch AS (
  SELECT spans.doc_id,
         e - s + 1 AS chunk_len,
         md5(substr(d.text, CAST(s AS INT), CAST(e - s + 1 AS INT))) AS digest
  FROM spans JOIN documents d ON d.doc_id = spans.doc_id
  WHERE e >= s
)
"""

ORACLE_CDC_STATS = f"""
WITH {_CDC_CHUNKS}
SELECT doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_chunks,
       CAST(MAX(chunk_len) AS BIGINT) AS max_chunk,
       CAST(SUM(('0x' || substr(md5(digest), 1, 8))::BIGINT) AS BIGINT) AS digest_sum
FROM ch GROUP BY doc_id
"""

ORACLE_CDC_DUPES = f"""
WITH {_CDC_CHUNKS}
SELECT digest, CAST(chunk_len AS BIGINT) AS chunk_len,
       CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs
FROM ch GROUP BY digest, chunk_len
HAVING COUNT(DISTINCT doc_id) > 1
"""

QUERIES["text_cdc_chunk_stats"] = text_cdc_chunk_stats
ORACLES["text_cdc_chunk_stats"] = ORACLE_CDC_STATS
QUERIES["dedup_cdc_chunk_dupes"] = dedup_cdc_chunk_dupes
ORACLES["dedup_cdc_chunk_dupes"] = ORACLE_CDC_DUPES


SA_SLICE = 256  # per-doc suffix-array slice (decode-family cap convention)
SA_T = 32  # minimum duplicated-substring length (Lee ACL'22 uses 50 tokens)


def dedup_suffix_adjacent_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT substring duplication via a corpus suffix array (late r10;
    Lee et al. ACL'22 §4.1 — the exact method winnowing approximates):
    build the suffix array of every document's leading 256-char slice
    with distributed prefix doubling (operators/suffix.py — k0=64 base
    ranking + ONE quadrupling round of linear shuffles (r13), dense
    ranks from assign_stable_ids,
    NO single-partition stage), then report every SA-ADJACENT suffix
    pair sharing at least the first SA_T=32 characters. Suffix-array
    adjacency is what makes this exact AND linear in output: any two
    suffixes' common prefix is <= every adjacent LCP between them, so
    each duplicated region surfaces as a chain of adjacent pairs, never
    a quadratic all-pairs set. The 32-gram text rides along for the
    oracle's collision-proof equality (the winnow_match_pairs rule).

    100 TB: suffix rows = corpus chars (the slice cap bounds per-doc
    blowup at 256x), every stage is a skinny (doc, pos, rank) shuffle;
    the adjacency join is rank-keyed. The oracle replays the full sort
    brute-force (suffix strings materialize only there, at oracle SF).

    Thin caller (r11): the pairs derivation lives in
    operators/suffix.py `sa_adjacent_pairs` so composed pipelines share
    ONE suffix_ranks build with `max_repeat_per_doc`."""
    tune(spark)
    from geo_db_spark.operators.suffix import sa_adjacent_pairs, suffix_ranks

    docs = load(spark, sf_dir, "documents").select(
        "doc_id", F.substring("text", 1, SA_SLICE).alias("t")
    )
    sa = suffix_ranks(
        docs, id_col="doc_id", text_col="t",
        slice_len=SA_SLICE, k0=64, min_tail=SA_T,  # k0=64: 1 quadrupling round (r13)
    )
    return sa_adjacent_pairs(docs, sa, SA_T)


ORACLE_SUFFIX_ADJACENT = f"""
WITH s AS MATERIALIZED (
  SELECT doc_id, substr(text, 1, {SA_SLICE}) AS t FROM documents
),
suf AS MATERIALIZED (
  SELECT doc_id, CAST(pos AS BIGINT) AS pos,
         substr(t, CAST(pos AS INT)) AS suffix,
         substr(t, CAST(pos AS INT), {SA_T}) AS g
  FROM (SELECT doc_id, t, unnest(range(1, length(t) - {SA_T - 1} + 1)) AS pos
        FROM s WHERE length(t) >= {SA_T})
),
r AS MATERIALIZED (
  SELECT doc_id, pos, g,
         row_number() OVER (ORDER BY suffix, doc_id, pos) AS rk
  FROM suf
)
SELECT CAST(a.rk AS BIGINT) AS rank_lo,
       a.doc_id AS doc_a, a.pos AS pos_a,
       b.doc_id AS doc_b, b.pos AS pos_b, a.g AS gram
FROM r a JOIN r b ON b.rk = a.rk + 1 AND a.g = b.g
"""


def dedup_longest_repeat(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document LONGEST exact repeated substring (>= SA_T chars,
    within the 256-char slice): the suffix-array property that the
    maximal repeat involving any suffix is achieved against an
    SA-NEIGHBOR makes the per-doc max exact from adjacent pairs alone.
    LCP per surviving pair is computed by a bounded k-explode
    (k in SA_T..SA_SLICE — prefix equality is monotone in k, so
    max(k | equal) is the LCP, capped by the slice); the explode runs
    only on pairs that already share 32 chars, not on the whole
    suffix set. Output: (doc_id, max_repeat_len).

    Thin caller (r11): suffix_ranks builds ONCE here and feeds
    `sa_adjacent_pairs` then `max_repeat_per_doc` (operators/suffix.py)
    — the r10 verdict flagged that this query used to re-run the
    entire ~27 s SA build its sibling had just paid; a composed
    pipeline now shares the build the same way this query does."""
    tune(spark)
    from geo_db_spark.operators.suffix import (
        max_repeat_per_doc,
        sa_adjacent_pairs,
        suffix_ranks,
    )

    docs = load(spark, sf_dir, "documents").select(
        "doc_id", F.substring("text", 1, SA_SLICE).alias("t")
    )
    sa = suffix_ranks(
        docs, id_col="doc_id", text_col="t",
        slice_len=SA_SLICE, k0=64, min_tail=SA_T,  # k0=64: 1 quadrupling round (r13)
    )
    pairs = sa_adjacent_pairs(docs, sa, SA_T)
    return max_repeat_per_doc(docs, pairs, SA_T, SA_SLICE)


ORACLE_LONGEST_REPEAT = f"""
WITH s AS MATERIALIZED (
  SELECT doc_id, substr(text, 1, {SA_SLICE}) AS t FROM documents
),
suf AS MATERIALIZED (
  SELECT doc_id, CAST(pos AS BIGINT) AS pos,
         substr(t, CAST(pos AS INT)) AS suffix,
         substr(t, CAST(pos AS INT), {SA_T}) AS g
  FROM (SELECT doc_id, t, unnest(range(1, length(t) - {SA_T - 1} + 1)) AS pos
        FROM s WHERE length(t) >= {SA_T})
),
r AS MATERIALIZED (
  SELECT doc_id, pos, g,
         row_number() OVER (ORDER BY suffix, doc_id, pos) AS rk
  FROM suf
),
pairs AS MATERIALIZED (
  SELECT a.doc_id AS doc_a, a.pos AS pos_a, b.doc_id AS doc_b, b.pos AS pos_b
  FROM r a JOIN r b ON b.rk = a.rk + 1 AND a.g = b.g
),
lcp AS MATERIALIZED (
  SELECT doc_a, pos_a, doc_b, pos_b,
         LEAST(MAX(k),
               MIN(length(sa.t) - pos_a + 1),
               MIN(length(sb.t) - pos_b + 1)) AS lcp
  FROM pairs
  JOIN s sa ON sa.doc_id = doc_a
  JOIN s sb ON sb.doc_id = doc_b
  CROSS JOIN (SELECT unnest(range({SA_T}, {SA_SLICE} + 1)) AS k) ks
  WHERE substr(sa.t, CAST(pos_a AS INT), CAST(k AS INT))
        = substr(sb.t, CAST(pos_b AS INT), CAST(k AS INT))
  GROUP BY doc_a, pos_a, doc_b, pos_b
)
SELECT doc_id, CAST(MAX(lcp) AS BIGINT) AS max_repeat_len
FROM (
  SELECT doc_a AS doc_id, lcp FROM lcp
  UNION ALL
  SELECT doc_b AS doc_id, lcp FROM lcp
) GROUP BY doc_id
"""

def dedup_substring_excision(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT substring EXCISION (r11, rule strengthened r12; Lee et
    al. ACL'22 §4.1's actual span-removal semantics, where the
    adjacency/drop queries are the doc-level approximations): the SA
    is segmented into maximal runs of adjacent suffixes sharing
    >= SA_T chars; within each run every member except the
    (doc_id, pos)-minimum has its shared span removed and the text
    rebuilt — so every duplicated >= SA_T-char substring survives in
    AT MOST one occurrence (the r11 per-pair greedy kept every LOCAL
    minimum of a non-monotone run; r11 verdict counterexample). One
    shared SA build feeds pairs -> per-pair LCP -> run segmentation
    (assign_stable_ids, no single-partition stage) -> loser intervals
    -> per-doc interval union (gaps-and-islands, per-DOC window) ->
    complement-gap rebuild (bounded higher-order fold: <= slice/SA_T
    islands per doc). The oracle replays the whole chain and hashes
    the REBUILT TEXT, so the value check proves the excision geometry,
    not just counts; the at-most-one guarantee itself is pinned by an
    INDEPENDENT (non-replay) pytest over crafted non-monotone runs;
    n_chars - n_excised == kept_len rides as the free invariant."""
    tune(spark)
    from geo_db_spark.operators.suffix import (
        excise_substring_dups,
        sa_adjacent_pairs,
        sa_pair_lcp,
        suffix_ranks,
    )

    docs = load(spark, sf_dir, "documents").select(
        "doc_id", F.substring("text", 1, SA_SLICE).alias("t")
    )
    sa = suffix_ranks(
        docs, id_col="doc_id", text_col="t",
        slice_len=SA_SLICE, k0=64, min_tail=SA_T,  # k0=64: 1 quadrupling round (r13)
    )
    pairs = sa_adjacent_pairs(docs, sa, SA_T)
    lcp = sa_pair_lcp(docs, pairs, SA_T, SA_SLICE)
    out = excise_substring_dups(docs, lcp)
    return out.select(
        "doc_id", "n_chars", "n_excised", "kept_len",
        F.md5(F.col("kept_text").cast("binary")).alias("kept_md5"),
    )


ORACLE_SUBSTRING_EXCISION = f"""
WITH s AS MATERIALIZED (
  SELECT doc_id, substr(text, 1, {SA_SLICE}) AS t FROM documents
),
suf AS MATERIALIZED (
  SELECT doc_id, CAST(pos AS BIGINT) AS pos,
         substr(t, CAST(pos AS INT)) AS suffix,
         substr(t, CAST(pos AS INT), {SA_T}) AS g
  FROM (SELECT doc_id, t, unnest(range(1, length(t) - {SA_T - 1} + 1)) AS pos
        FROM s WHERE length(t) >= {SA_T})
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
  JOIN s sa ON sa.doc_id = doc_a
  JOIN s sb ON sb.doc_id = doc_b
  CROSS JOIN (SELECT unnest(range({SA_T}, {SA_SLICE} + 1)) AS k) ks
  WHERE substr(sa.t, CAST(pos_a AS INT), CAST(k AS INT))
        = substr(sb.t, CAST(pos_b AS INT), CAST(k AS INT))
  GROUP BY rank_lo, doc_a, pos_a, doc_b, pos_b
),
-- run segmentation (r12): consecutive rank_lo pairs = one maximal run
-- of suffixes whose every adjacent LCP >= min_len; per member
-- X = max adjacent LCP; only each run's (doc,pos)-minimum survives
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
rebuilt AS (
  SELECT p.doc_id,
         string_agg(substr(t, CAST(gs AS INT),
                           CAST(COALESCE(ge, length(t) + 1) - gs AS INT)),
                    '' ORDER BY gs) AS kept
  FROM pieces p JOIN s USING (doc_id)
  GROUP BY p.doc_id, t
),
nex AS (SELECT doc_id, SUM(en - st) AS n_excised FROM merged GROUP BY doc_id)
SELECT s.doc_id,
       CAST(length(s.t) AS BIGINT) AS n_chars,
       CAST(COALESCE(nex.n_excised, 0) AS BIGINT) AS n_excised,
       CAST(length(COALESCE(rebuilt.kept, s.t)) AS BIGINT) AS kept_len,
       md5(COALESCE(rebuilt.kept, s.t)) AS kept_md5
FROM s
LEFT JOIN rebuilt USING (doc_id)
LEFT JOIN nex USING (doc_id)
"""


QUERIES["dedup_suffix_adjacent_dups"] = dedup_suffix_adjacent_dups
ORACLES["dedup_suffix_adjacent_dups"] = ORACLE_SUFFIX_ADJACENT
QUERIES["dedup_longest_repeat"] = dedup_longest_repeat
ORACLES["dedup_longest_repeat"] = ORACLE_LONGEST_REPEAT
QUERIES["dedup_substring_excision"] = dedup_substring_excision
ORACLES["dedup_substring_excision"] = ORACLE_SUBSTRING_EXCISION
