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
) -> DataFrame:
    """All pairs (id_a < id_b) whose word-``shingle_n``-gram shingle sets
    have Jaccard >= threshold_num/threshold_den. Returns
    (id_a, id_b, inter, uni, jaccard) — sizes exact ints, jaccard their
    IEEE quotient.
    """
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

    # structural merge pin on the self-join: pref is O(corpus) rows, so
    # no broadcast/shuffle-hash build of it is ever safe, and the
    # measured 100x envelope runs 39% faster under SMJ (206 s vs 337 s)
    # for ~1 s of sort cost at sf0.1 — the scale target wins the trade.
    a, b = pref.alias("a"), pref.hint("merge").alias("b")
    # overlap lower bound alpha = ceil(t/(1+t) * (n_a+n_b))
    alpha = F.expr(f"(({num} * (a.n + b.n)) + {num} + {den} - 1) div ({num} + {den})")
    # PPJoin indexing-prefix refinement (r5 verdict #8, Xiao WWW'08 §3):
    # a t-similar pair must share a token that lies in the PROBING prefix
    # (|s| - ceil(t|s|) + 1, what `pref` explodes) of the processing-
    # later set AND in the shorter INDEXING prefix
    # (|s| - ceil(2t/(1+t)|s|) + 1) of the processing-earlier one —
    # processing order is (size, id) ascending, and a.id < b.id already
    # holds, so on equal sizes `a` is the earlier/indexed side. With
    # 2t/(1+t) = 2*num/(num+den), integer ceil keeps it exact. Each
    # candidate pair must now collide in a strictly shorter window on
    # one side, cutting candidates before the distinct at zero recall
    # loss (the brute-force-derived oracle pins that).
    idx_a = F.expr(
        f"a.n - ((2 * {num} * a.n + {num} + {den} - 1) div ({num} + {den})) + 1"
    )
    idx_b = F.expr(
        f"b.n - ((2 * {num} * b.n + {num} + {den} - 1) div ({num} + {den})) + 1"
    )
    in_index_prefix = F.when(
        F.col("a.n") <= F.col("b.n"), F.col("a.pos") <= idx_a
    ).otherwise(F.col("b.pos") <= idx_b)
    cand = (
        a.join(
            b,
            (F.col("a.token") == F.col("b.token"))
            & (F.col("a.id") < F.col("b.id"))
            # size filter: t*|a| <= |b| and t*|b| <= |a|
            & (F.col("b.n") * den >= F.col("a.n") * num)
            & (F.col("a.n") * den >= F.col("b.n") * num)
            # positional filter: best-possible remaining overlap >= alpha
            & (
                F.least(
                    F.col("a.n") - F.col("a.pos"), F.col("b.n") - F.col("b.pos")
                )
                + 1
                >= alpha
            )
            & in_index_prefix,
        )
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )
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
