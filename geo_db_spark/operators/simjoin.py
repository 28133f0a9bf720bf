"""Exact set-similarity join via prefix filtering (AllPairs / PPJoin).

The third member of the near-dup family, complementing the two
probabilistic paths in operators/dedup.py: MinHash-LSH (banded, tunable
recall) and min-shingle blocking (1-hash, cheap, recall-trading). This
one is EXACT — every pair with Jaccard >= t is found, no recall loss —
using the prefix-filtering principle (Bayardo et al., WWW'07 "Scaling Up
All Pairs Similarity Search") with PPJoin's size and positional filters
(Xiao et al., WWW'08): if two sets are t-similar, their first
``|s| - ceil(t*|s|) + 1`` elements under ANY global element order must
share at least one element — so candidates are generated only from those
short prefixes, ordered rarest-element-first to make prefix collisions
scarce.

Scale shape: the only wide exchanges are (1) the token document-
frequency groupBy, (2) the token->df attach join, (3) the per-doc
collect groupBy, and (4) the prefix self-join whose keys are each
document's RAREST tokens (by construction of the global order), so no
stop-word-style hot key ever becomes a join key. The size filter
(t*|a| <= |b| <= |a|/t) and the positional upper bound
(min(|a|-pos_a, |b|-pos_b) + 1 >= ceil(t/(1+t) * (|a|+|b|))) prune
candidates BEFORE the distinct, in pure integer arithmetic. Exact
verification recomputes element sets only for documents appearing in a
candidate pair (semi-join first), like the n-gram path.

The threshold is a RATIONAL num/den so every comparison — prefix
lengths, overlap bound, final Jaccard test — is exact integer
arithmetic, bit-identical in the DuckDB oracle (the float form would
hinge on ceil-at-representation-boundary behavior).

No reference counterpart (SURVEY §2-H engine growth); cited algorithms
are public literature.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from geo_db_spark.operators.dedup import _cache_session_scoped, shingles


def set_similarity_join(
    docs: DataFrame,
    threshold_num: int = 1,
    threshold_den: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = 3,
    use_indexing_prefix: bool = True,
    _return_candidates: bool = False,
) -> DataFrame:
    """All pairs (id_a < id_b) whose word-``shingle_n``-gram shingle sets
    have Jaccard >= threshold_num/threshold_den. Returns
    (id_a, id_b, inter, uni, jaccard) — sizes exact ints, jaccard their
    IEEE quotient.

    ``use_indexing_prefix`` toggles the PPJoin indexing prefix for
    ablation (r6 verdict #4): since r7 it is applied STRUCTURALLY — the
    index (processing-earlier) side of the prefix self-join explodes only
    the short indexing prefix, shrinking the join's input rows — because
    the r6 per-pair filter form is provably subsumed by the positional
    filter (see inline proof sketch below; that is why every measured
    corpus showed a zero candidate cut). The result set is IDENTICAL
    either way (zero recall loss, brute-force oracle pinned).
    ``_return_candidates`` short-circuits to the deduped candidate-pair
    set for instrumentation."""
    num, den = threshold_num, threshold_den
    if not (0 < num <= den):
        raise ValueError(f"threshold must be in (0, 1]: got {num}/{den}")

    # (id, token) feeds THREE branches (df count, rank attach, exact
    # verification) — without a barrier each re-scans and re-tokenizes
    # the corpus; cache the skinny exploded rows in the same
    # session-scoped registry the dedup signatures use (never the text)
    sh = _cache_session_scoped(
        docs.select(
            F.col(id_col).alias("id"),
            F.explode(shingles(F.col(text_col), shingle_n)).alias("token"),
        )
    )
    # materialize the cache BEFORE planning the joins: un-materialized
    # InMemoryRelations report the child's size estimate, and under a
    # regex-explode that estimate is garbage-low — the 100x envelope
    # watched the planner statically pick a broadcast build of the FULL
    # token table (36M rows) and kill the driver. After this count the
    # relation carries its real size, so broadcast-vs-merge decisions
    # downstream are made on facts (small corpora still broadcast).
    sh.count()
    # global rarest-first element order: (document frequency, token)
    tdf = sh.groupBy("token").agg(F.count(F.lit(1)).alias("tdf"))
    sets = (
        sh.join(tdf, "token")
        .groupBy("id")
        .agg(
            F.array_sort(F.collect_list(F.struct("tdf", "token"))).alias("toks"),
            F.count(F.lit(1)).alias("n"),
        )
    )
    # prefix length |s| - ceil(t*|s|) + 1, integer ceil = (a+b-1) div b
    plen = F.expr(f"n - ((n * {num} + {den} - 1) div {den}) + 1")
    pref = sets.select(
        "id",
        "n",
        F.posexplode(F.slice("toks", F.lit(1), plen)).alias("pos0", "tk"),
    ).select("id", "n", (F.col("pos0") + 1).alias("pos"), F.col("tk.token").alias("token"))

    # PPJoin indexing prefix (Xiao WWW'08 §3), restructured in r7: a
    # t-similar pair must share a token in the PROBING prefix
    # (|s| - ceil(t|s|) + 1) of the processing-LATER set and in the
    # shorter INDEXING prefix (|s| - ceil(2t/(1+t)|s|) + 1) of the
    # processing-EARLIER one, processing order = (size, id) ascending.
    # The r6 form applied that as a per-candidate-pair FILTER on a
    # symmetric self-join — provably a no-op: the indexed side is the
    # SMALLER set, and for |s| <= |l| the positional filter's bound
    # pos_s <= |s| - alpha + 1 with alpha = ceil(t/(1+t)(|s|+|l|)) is
    # always <= the indexing bound |s| - ceil(2t/(1+t)|s|) + 1 (equality
    # exactly at |s| = |l|) — hence the measured zero cut on EVERY
    # corpus, not a corpus property. The real PPJoin benefit is
    # STRUCTURAL and lands here instead: the index side of the join
    # explodes only the short prefix, so the join's build input shrinks
    # ~(1 - 2t/(1+t))/(1 - t/(1+t)) (t=1/2: one third fewer rows) before
    # any pair is formed. use_indexing_prefix=False keeps the full
    # probing prefix on both sides (the ablation baseline,
    # scripts/ablate_prefix_filter.py).
    idx_len = F.expr(
        f"n - ((2 * {num} * n + {num} + {den} - 1) div ({num} + {den})) + 1"
    )
    index_side = pref.filter(F.col("pos") <= idx_len) if use_indexing_prefix else pref
    # structural merge pin on the self-join: both sides are O(corpus)
    # rows, so no broadcast/shuffle-hash build is ever safe, and the
    # measured 100x envelope runs 39% faster under SMJ (206 s vs 337 s)
    # for ~1 s of sort cost at sf0.1 — the scale target wins the trade.
    a, b = pref.alias("a"), index_side.hint("merge").alias("b")
    # overlap lower bound alpha = ceil(t/(1+t) * (n_a+n_b))
    alpha = F.expr(f"(({num} * (a.n + b.n)) + {num} + {den} - 1) div ({num} + {den})")
    cand = (
        a.join(
            b,
            (F.col("a.token") == F.col("b.token"))
            # b is the processing-earlier (indexed) side: (n, id) smaller
            & (
                (F.col("b.n") < F.col("a.n"))
                | ((F.col("b.n") == F.col("a.n")) & (F.col("b.id") < F.col("a.id")))
            )
            # size filter: t*|a| <= |b| (b.n <= a.n already holds)
            & (F.col("b.n") * den >= F.col("a.n") * num)
            # positional filter: best-possible remaining overlap >= alpha
            & (
                F.least(
                    F.col("a.n") - F.col("a.pos"), F.col("b.n") - F.col("b.pos")
                )
                + 1
                >= alpha
            ),
        )
        .select(
            F.least(F.col("a.id"), F.col("b.id")).alias("id_a"),
            F.greatest(F.col("a.id"), F.col("b.id")).alias("id_b"),
        )
        .distinct()
    )
    if _return_candidates:
        return cand
    # exact verification WITHOUT array payloads: the first cut of this
    # stage collected each candidate doc's token set into an array and
    # joined two array-carrying tables — Spark's size estimate for
    # aggregated array columns is far low, AQE promoted them to
    # broadcasts, and the 100x envelope died in GC. Instead, the
    # intersection is a COUNT over skinny (id, token) equi-joins:
    # cand ⋈ tokens(a) on id_a, ⋈ tokens(b) on (id_b, token) — every
    # shuffled row is (two longs, one token); intermediate volume is
    # sum over pairs of |tokens(a)|, linear in candidate work. A pair
    # missing from the count has inter = 0, which cannot pass any
    # positive threshold — and candidates share >= 1 prefix token by
    # construction, so no qualifying pair is lost.
    a_tok = sh.select(F.col("id").alias("id_a"), "token")
    b_tok = sh.select(F.col("id").alias("id_b"), "token")
    inter = (
        cand.join(a_tok, "id_a")
        .join(b_tok, ["id_b", "token"])
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    # set sizes from the CACHED token table (one cheap count aggregate),
    # not from re-running the sets (sh⋈tdf + collect_list) subtree — the
    # first cut recomputed that twice; carrying n through the candidate
    # distinct instead widened the dominant 44M-row exchange and
    # measured SLOWER at 100x (344 s vs 206 s), so sizes attach late,
    # to the post-aggregation (small) pair set (r5 review, iterated)
    nsz = sh.groupBy("id").agg(F.count(F.lit(1)).alias("n"))
    pairs = (
        inter.join(nsz.select(F.col("id").alias("id_a"), F.col("n").alias("n_a")), "id_a")
        .join(nsz.select(F.col("id").alias("id_b"), F.col("n").alias("n_b")), "id_b")
        .select(
            "id_a",
            "id_b",
            "inter",
            (F.col("n_a") + F.col("n_b") - F.col("inter")).alias("uni"),
        )
        # exact rational comparison: inter/uni >= num/den
        .filter(F.col("inter") * den >= F.col("uni") * num)
    )
    return pairs.select(
        "id_a",
        "id_b",
        "inter",
        "uni",
        (F.col("inter").cast("double") / F.col("uni")).alias("jaccard"),
    )


def _containment_candidates(
    docs: DataFrame,
    threshold_num: int,
    threshold_den: int,
    text_col: str,
    id_col: str,
    shingle_n: int,
) -> tuple[DataFrame, DataFrame, DataFrame, DataFrame]:
    """The candidate-generation half of ``containment_join``, shared
    with the candidate-profile observability query so both see the
    SAME stream: returns (sh = (id, token) shingle rows, nsz = (id, n)
    sizes, sets = per-doc sorted token arrays, cand = one row per
    surviving (id_a, id_b) candidate pair carrying the grouped-filter
    aggregates (k, pb_max, n_a, n_b) that the verification phase
    reuses).

    r10 — the grouped (cumulative) positional filter, the lever the r9
    profile pointed at (it attributed the cost to candidates 275-1600x
    hits). Instead of keeping a pair when ANY single prefix match
    passes a per-row bound, the matches are aggregated per pair first
    (the same shuffle the old .distinct() already paid) and bounds are
    computed from the WHOLE match set. With S1 = shared tokens inside
    A's probe prefix (every one of them is a match row, so k = |S1|
    exactly) and S2 = shared tokens after A's prefix:

      - every S2 token is strictly greater (global rarest-first order,
        per-doc tokens distinct) than every S1 token, so in B it sits
        strictly after pb_max = max pos_b over matches:
        overlap = k + |S2| <= k + min(alpha - 1, n_b - pb_max)   (c1)
      - the globally smallest common token of a truly qualifying pair
        is always inside A's prefix (prefix-filter lemma), i.e. it IS
        a match row, and all common tokens sit at/after it in B:
        overlap <= n_b - pb_min + 1                              (c2)

    Both are exact (any pair with overlap >= alpha = ceil(t|A|)
    satisfies them), and c1/c2 together strictly dominate the r9
    per-row index-side bound, which is therefore dropped from the join
    condition. This is the set-level counterpart of Xiao WWW'08 §4's
    suffix filtering: the recursive middle-token probe itself needs
    both token arrays co-located per pair, which would push array
    payloads through the candidate shuffle — the grouped bounds get
    the candidate cut from aggregates the shuffle already carries."""
    num, den = threshold_num, threshold_den
    if not (0 < num <= den):
        raise ValueError(f"threshold must be in (0, 1]: got {num}/{den}")

    sh = _cache_session_scoped(
        docs.select(
            F.col(id_col).alias("id"),
            F.explode(shingles(F.col(text_col), shingle_n)).alias("token"),
        )
    )
    sh.count()  # materialize before planning (see set_similarity_join)
    tdf = sh.groupBy("token").agg(F.count(F.lit(1)).alias("tdf"))
    sets = (
        sh.join(tdf, "token")
        .groupBy("id")
        .agg(
            F.array_sort(F.collect_list(F.struct("tdf", "token"))).alias("toks"),
            F.count(F.lit(1)).alias("n"),
        )
        # consumed by BOTH the probe-prefix explode and the r9 ranked
        # index explode: materialize so the df-attach join + sort agg
        # run once (the ids.py double-compute rule)
        .localCheckpoint(eager=True)
    )
    # alpha(A) = ceil(t*|A|); probe prefix length = |A| - alpha + 1
    plen = F.expr(f"n - ((n * {num} + {den} - 1) div {den}) + 1")
    probe = sets.select(
        "id",
        "n",
        F.posexplode(F.slice("toks", F.lit(1), plen)).alias("pos0", "tk"),
    ).select(
        "id", "n", (F.col("pos0") + 1).alias("pos"), F.col("tk.token").alias("token")
    )
    # index = every (id, pos, token) WITH its rank under the same
    # rarest-first order (r9: the index-side positional filter below
    # needs pos_b), pruned to tokens some probe prefix holds. NO
    # broadcast hint: prefix_tokens is the distinct set of probe-prefix
    # shingles — O(corpus vocabulary), since most shingles are unique
    # and each doc's rarest (1-t) fraction lands in a prefix. Forcing a
    # corpus-sized broadcast is exactly the hazard the simjoin comments
    # forbid; a plain left_semi lets AQE pick (and can still broadcast
    # if the measured size is genuinely small).
    prefix_tokens = probe.select("token").distinct()
    index = sets.select(
        "id",
        "n",
        F.posexplode("toks").alias("pos0", "tk"),
    ).select(
        "id", "n", (F.col("pos0") + 1).alias("pos"), F.col("tk.token").alias("token")
    ).join(prefix_tokens, "token", "left_semi")
    # sizes come straight off the checkpointed sets frame (n is its
    # token count) — r10: the old sh.groupBy re-aggregated the whole
    # shingle stream for numbers sets already holds
    nsz = sets.select("id", "n")

    a, b = probe.alias("a"), index.hint("merge").alias("b")
    alpha = F.expr(f"((a.n * {num}) + {den} - 1) div {den}")
    matches = a.join(
        b,
        (F.col("a.token") == F.col("b.token"))
        & (F.col("a.id") != F.col("b.id"))
        # size filter: |B| >= ceil(t|A|)
        & (F.col("b.n") >= alpha)
        # positional, probe side: tokens of A at/after pos cover alpha
        # (implied by the prefix slice, kept for plan clarity)
        & (F.col("a.n") - F.col("a.pos") + 1 >= alpha),
    )
    # the grouped positional filter (docstring c1/c2): one row per pair
    # out of the SAME pair-keyed shuffle the old .distinct() paid, with
    # map-side partial aggregation collapsing the per-token match rows
    alpha_a = F.expr(f"((n_a * {num}) + {den} - 1) div {den}")
    cand = (
        matches.groupBy(
            F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b")
        )
        .agg(
            F.count(F.lit(1)).alias("k"),
            F.min(F.col("b.pos")).alias("pb_min"),
            F.max(F.col("b.pos")).alias("pb_max"),
            F.first(F.col("a.n")).alias("n_a"),
            F.first(F.col("b.n")).alias("n_b"),
        )
        # c2: overlap <= n_b - pos_b(smallest common token) + 1
        .filter(F.col("n_b") - F.col("pb_min") + 1 >= alpha_a)
        # c1: overlap = k + |S2| <= k + min(alpha - 1, n_b - pb_max)
        .filter(
            F.col("k")
            + F.least(alpha_a - 1, F.col("n_b") - F.col("pb_max"))
            >= alpha_a
        )
        .select("id_a", "id_b", "k", "pb_max", "n_a", "n_b")
    )
    return sh, nsz, sets, cand


def containment_join(
    docs: DataFrame,
    threshold_num: int = 3,
    threshold_den: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = 3,
) -> DataFrame:
    """EXACT asymmetric-containment join: all ORDERED pairs (a, b),
    a != b, with |A∩B| / |A| >= t — "A's shingles are mostly inside B",
    the doc-quotes-doc / subset-duplicate case symmetric Jaccard
    misses (a short quote of a long document has tiny Jaccard but
    containment ~1).

    Prefix filter, containment form (Bayardo WWW'07 §5 extension to
    asymmetric measures): if |A∩B| >= ceil(t·|A|) then A's first
    |A| - ceil(t·|A|) + 1 tokens under the global rarest-first order
    must hit B — the probe prefix lives on A only; B has no prefix
    (any of B's tokens can witness). The index side is therefore ALL
    of B's tokens, which would make stop-shingles join keys — so it is
    semi-joined down to tokens that occur in SOME probe prefix first:
    prefixes hold each doc's RAREST ~(1-t) fraction, so hot tokens are
    pruned from the index before any pair forms (exactness kept: a
    candidate must share a PREFIX token by the filter above, and every
    prefix token survives the semi-join by construction).

    Filters in pure integer arithmetic like set_similarity_join:
    size |B| >= ceil(t·|A|), the probe-prefix positional bound, and
    (r10) the GROUPED positional filters c1/c2 documented on
    ``_containment_candidates``, which aggregate all prefix matches of
    a pair before bounding its overlap — strictly stronger than any
    per-row bound, at the shuffle the old pair-distinct already paid.

    Verification (r10, prefix-skip): the candidate row already carries
    k = |shared tokens inside A's probe prefix| EXACTLY (every such
    token is a match row), so only the suffix remainder is counted:
    A's tokens AFTER the prefix (alpha - 1 per doc instead of |A|)
    joined against B's tokens — still skinny (id, token) joins, never
    array payloads, but ~t·|A| fewer probe rows per candidate.
    Returns (id_a, id_b, inter, n_a, containment) for the qualifying
    ordered pairs."""
    num, den = threshold_num, threshold_den
    sh, nsz, sets, cand = _containment_candidates(
        docs, threshold_num, threshold_den, text_col, id_col, shingle_n
    )
    # consumed by the k-rows branch AND the suffix-match branch: pin it
    # so the candidate join + groupBy run once (the ids.py rule)
    cand = cand.localCheckpoint(eager=True)
    # A's suffix = everything after the probe prefix (alpha - 1 tokens)
    plen = F.expr(f"n - ((n * {num} + {den} - 1) div {den}) + 1")
    a_suf = sets.select(
        F.col("id").alias("id_a"),
        F.explode(F.slice("toks", plen + 1, F.col("n").cast("int"))).alias("tk"),
    ).select("id_a", F.col("tk.token").alias("token"))
    b_tok = sh.select(F.col("id").alias("id_b"), "token")
    # overlap = k + |suffix matches|: a union into ONE pair-keyed
    # aggregation (no cand-vs-cand self-join, no left-join null fill)
    k_rows = cand.select("id_a", "id_b", F.col("k").alias("c"))
    s2_rows = (
        cand.select("id_a", "id_b")
        .join(a_suf, "id_a")
        .join(b_tok, ["id_b", "token"])
        .select("id_a", "id_b", F.lit(1).cast("long").alias("c"))
    )
    inter = (
        k_rows.unionByName(s2_rows)
        .groupBy("id_a", "id_b")
        .agg(F.sum("c").alias("inter"))
    )
    return (
        inter.join(nsz.select(F.col("id").alias("id_a"), F.col("n").alias("n_a")), "id_a")
        .filter(F.col("inter") * den >= F.col("n_a") * num)
        .select(
            "id_a",
            "id_b",
            "inter",
            "n_a",
            (F.col("inter").cast("double") / F.col("n_a")).alias("containment"),
        )
    )


# integer-exact floor(log2(n)) as a CASE chain usable VERBATIM in both
# Spark SQL and DuckDB (float log2 flaps at exact powers of two; a
# global ntile-style decile would need a single-task rank window)
FLOORLOG2_SQL = (
    "CASE "
    + " ".join(f"WHEN {{col}} >= {1 << k} THEN {k}" for k in range(40, 0, -1))
    + " ELSE 0 END"
)


def containment_candidate_profile(
    docs: DataFrame,
    threshold_num: int = 3,
    threshold_den: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = 3,
) -> DataFrame:
    """Observability companion to ``containment_join`` (r8 verdict next
    #6): per probe-SIZE-CLASS (floor(log2 |A|) — per-row and
    integer-exact, unlike a decile, which would need a global
    single-task rank window), the number of documents, prefix-filter
    CANDIDATE pairs, and final qualifying pairs. cand_pairs/hit_pairs
    per class is what makes a superlinear bench envelope attributable:
    if candidates dominate in the large-|A| classes, Xiao's suffix
    filter is the next lever; if candidates track hits, the cost is
    inherent verification of an exact algorithm.

    Shares ``_containment_candidates`` with the join itself, so the
    profiled stream IS the production stream (r10: including the
    grouped positional filters and the prefix-skip verification); the
    candidate frame is localCheckpoint'ed because the per-class count
    and both verification branches consume it (the ids.py
    double-compute rule)."""
    num, den = threshold_num, threshold_den
    sh, nsz, sets, cand = _containment_candidates(
        docs, threshold_num, threshold_den, text_col, id_col, shingle_n
    )
    cand = cand.localCheckpoint(eager=True)
    plen = F.expr(f"n - ((n * {num} + {den} - 1) div {den}) + 1")
    a_suf = sets.select(
        F.col("id").alias("id_a"),
        F.explode(F.slice("toks", plen + 1, F.col("n").cast("int"))).alias("tk"),
    ).select("id_a", F.col("tk.token").alias("token"))
    b_tok = sh.select(F.col("id").alias("id_b"), "token")
    k_rows = cand.select("id_a", "id_b", F.col("k").alias("c"))
    s2_rows = (
        cand.select("id_a", "id_b")
        .join(a_suf, "id_a")
        .join(b_tok, ["id_b", "token"])
        .select("id_a", "id_b", F.lit(1).cast("long").alias("c"))
    )
    hits = (
        k_rows.unionByName(s2_rows)
        .groupBy("id_a", "id_b")
        .agg(F.sum("c").alias("inter"))
        .join(nsz.select(F.col("id").alias("id_a"), F.col("n").alias("n_a")), "id_a")
        .filter(F.col("inter") * den >= F.col("n_a") * num)
        .select("id_a")
    )
    cls = nsz.select(
        "id", F.expr(FLOORLOG2_SQL.format(col="n")).cast("int").alias("size_class")
    )
    dagg = cls.groupBy("size_class").agg(F.count(F.lit(1)).alias("docs"))
    cagg = (
        cand.join(cls.withColumnsRenamed({"id": "id_a"}), "id_a")
        .groupBy("size_class")
        .agg(F.count(F.lit(1)).alias("cand_pairs"))
    )
    hagg = (
        hits.join(cls.withColumnsRenamed({"id": "id_a"}), "id_a")
        .groupBy("size_class")
        .agg(F.count(F.lit(1)).alias("hit_pairs"))
    )
    return (
        dagg.join(cagg, "size_class", "left")
        .join(hagg, "size_class", "left")
        .select(
            "size_class",
            "docs",
            F.coalesce("cand_pairs", F.lit(0)).alias("cand_pairs"),
            F.coalesce("hit_pairs", F.lit(0)).alias("hit_pairs"),
        )
    )
