"""Exact edit-distance self-join via deletion-neighborhood blocking.

FastSS (Bocek, Hunt, Stiller, Hecht 2007: "Fast Similarity Search in
Large Dictionaries", Univ. of Zurich IFI TR 2007.02 — public): strings
``a``, ``b`` with ``levenshtein(a, b) <= 1`` must share a member of
their 1-deletion neighborhoods ``D1(x) = {x} ∪ {x with char i
deleted}``. Proof by case on the single edit: a substitution at
position ``i`` makes the two position-``i`` deletions equal; an
insert/delete makes the shorter string itself a member of both
neighborhoods; equality shares the identity member. So joining the
exploded neighborhoods is a ZERO-FALSE-NEGATIVE candidate generator,
and the built-in ``levenshtein`` (JVM, whole-stage codegen) removes the
false positives (distinct deletions that collide, e.g. "ab"/"ba" via
"a"... both produce "a" and "b" — ed 2 when longer).

Complements the Jaccard family (dedup.py MinHash/simjoin.py PPJoin):
those measure SET overlap of shingles and miss single-character typos
in short keys entirely (one char changes every shingle it touches);
this one is the character-level metric for short identifier-like
strings (names, codes, URLs).

Scale shape: the join runs over the DISTINCT strings (the vocabulary),
each pinned to a compact long group id; the vocabulary explodes once
into (L+1) skinny ``(xxhash64(variant), gid)`` rows — every wide
exchange (variant self-join, pair distinct, expansion joins) moves
longs, never strings. Identity variants are unique per distinct string
and a deletion variant is shared only by strings one edit apart, so no
hot join keys exist BY CONSTRUCTION — exact-duplicate-heavy corpora
cost only output expansion, not quadratic candidate work (measured at
the name-cloning 10x corpus: 177 s id-level -> 12.8 s distinct-first).
Hash collisions at 64 bits cannot create wrong output (verification is
exact), only a vanishing candidate surplus; the group id is a pinned
monotonic id, never a string hash, so group merging is impossible.

No reference counterpart (SURVEY §2-H engine growth).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def deletion_variants(s, depth: int = 1) -> F.Column:
    """``D<=depth(s)`` as an array column: the string itself, the
    ``len(s)`` single-character deletions, and (depth=2) the
    ``C(len(s), 2)`` two-character deletions. Pure codegen expressions
    (substr/concat over sequences) — no UDF. Deduplicated: repeated
    characters make distinct deletion-position sets collide (e.g.
    every single deletion of "aaa" is "aa"), and array_distinct inside
    the row is far cheaper than exploding the duplicates into the
    join."""
    dels = F.transform(
        F.sequence(F.lit(1), F.length(s)),
        lambda i: F.concat(
            F.substr(s, F.lit(1), i - F.lit(1)),
            F.substr(s, i + F.lit(1), F.length(s) - i),
        ),
    )
    # sequence(1, 0) would count DOWN ([1, 0]); guard the empty string.
    dels = F.when(F.length(s) >= 1, dels).otherwise(
        F.array().cast("array<string>")
    )
    out = F.concat(F.array(s), dels)
    if depth == 2:
        # delete positions i < j: prefix, the i..j gap's interior, suffix
        d2 = F.flatten(
            F.transform(
                F.sequence(F.lit(1), F.length(s) - F.lit(1)),
                lambda i: F.transform(
                    F.sequence(i + F.lit(1), F.length(s)),
                    lambda j: F.concat(
                        F.substr(s, F.lit(1), i - F.lit(1)),
                        F.substr(s, i + F.lit(1), j - i - F.lit(1)),
                        F.substr(s, j + F.lit(1), F.length(s) - j),
                    ),
                ),
            )
        )
        d2 = F.when(F.length(s) >= 2, d2).otherwise(
            F.array().cast("array<string>")
        )
        out = F.concat(out, d2)
    elif depth != 1:
        raise NotImplementedError(f"deletion_variants depth 1 or 2, got {depth}")
    return F.array_distinct(out)


def edit_distance_join(
    df: DataFrame,
    id_col: str,
    str_col: str,
    max_dist: int = 1,
) -> DataFrame:
    """All pairs (id_a < id_b) with ``levenshtein <= max_dist``. Returns
    (id_a, id_b, editdist). Exact — FastSS blocking has no false
    negatives at depth d and candidates are levenshtein-verified.

    Depth-d completeness (Bocek 2007, Thm. 1 generalized): an optimal
    alignment with e <= d ops removes at most d positions from EACH
    string (a substitution deletes the mismatched position from both
    sides, an indel deletes from one side), and what remains is the
    same string — so any pair at ed <= d shares a member of the
    <=d-deletion neighborhoods. Bocek's per-variant deletion-POSITION
    bookkeeping (their candidate distance function, used to avoid full
    DP on a 2007-era CPU) is deliberately dropped: the exact JVM
    ``levenshtein`` verify is whole-stage-codegen'd and subsumes it —
    the position lists would only replace an exact check with an
    upper-bound check of the same cost shape.

    ``max_dist`` of 1 or 2 is implemented. Depth 2 explodes ~L^2/2
    variants per VOCABULARY entry (still vocabulary-bound, the same
    distinct-first / long-keyed shuffles as depth 1) — for L~20 that is
    ~10x depth 1's explode, the honest price of the deeper radius.
    Depth >= 3 (C(L,3) blowup) stays an explicit boundary.
    """
    if max_dist not in (1, 2):
        raise NotImplementedError(
            "edit_distance_join implements FastSS depth 1 and 2 "
            f"(max_dist in {{1, 2}}); got {max_dist}"
        )
    base = df.select(F.col(id_col).alias("id"), F.col(str_col).alias("s"))
    # FastSS runs over DISTINCT strings, not ids: on exact-dup-heavy
    # corpora (the common case — the 10x scale generator clones names
    # verbatim) the neighborhood join and the levenshtein verification
    # would otherwise pay |group|^2 per duplicated string (measured:
    # 177 s vs 84 s at the 10x corpus). Distinct-first makes that work a
    # function of the VOCABULARY; the id-level blowup is deferred to the
    # final expansion joins, where it is pure (already-verified) output.
    #
    # Each distinct string gets a compact LONG group id so every
    # downstream shuffle (variant self-join, pair distinct, expansion
    # joins) moves longs, never the strings (first draft shuffled
    # (string, string) pairs: 3x slower at sf0.1). The gid must NOT be a
    # hash of the string — a collision would merge two groups and emit
    # wrong pairs with no verification to catch it —
    # monotonically_increasing_id is collision-free by construction, and
    # the eager localCheckpoint pins ONE assignment for all the branches
    # that read it (the ids.py cross-job rule).
    strings = (
        base.select("s")
        .distinct()
        .withColumn("gid", F.monotonically_increasing_id())
        .localCheckpoint(eager=True)
        # the checkpointed plan keeps `s`'s attribute id — re-joining it
        # against `base` (which still holds the same id) would be a
        # conflicting-reference error; a RENAMING projection mints a
        # fresh id
        .select(F.col("s").alias("gs"), "gid")
    )
    variants = strings.select(
        "gid",
        F.explode(deletion_variants(F.col("gs"), depth=max_dist)).alias("variant"),
    ).select(F.xxhash64("variant").alias("h"), "gid")

    cand = (
        variants.alias("a")
        .join(variants.alias("b"), "h")
        .filter(F.col("a.gid") < F.col("b.gid"))
        .select(F.col("a.gid").alias("gid_a"), F.col("b.gid").alias("gid_b"))
        .distinct()
    )
    # re-attach the strings to verify; the vocabulary side is
    # dimension-shaped relative to the candidate set, AQE broadcasts it
    sa = strings.select(F.col("gid").alias("gid_a"), F.col("gs").alias("__sa"))
    sb = strings.select(F.col("gid").alias("gid_b"), F.col("gs").alias("__sb"))
    verified = (
        cand.join(sa, "gid_a")
        .join(sb, "gid_b")
        .withColumn("editdist", F.levenshtein("__sa", "__sb"))
        .filter(F.col("editdist") <= max_dist)
        .select("gid_a", "gid_b", "editdist")
    )

    # id <-> group membership: ONE string-keyed join, reused by both
    # expansions
    members = base.join(strings, base["s"] == strings["gs"]).select("id", "gid")
    # expansion 1: cross-group id pairs (groups are disjoint, so
    # least/greatest ordering cannot create duplicates)
    ma = members.select(F.col("gid").alias("gid_a"), F.col("id").alias("__ia"))
    mb = members.select(F.col("gid").alias("gid_b"), F.col("id").alias("__ib"))
    cross = (
        verified.join(ma, "gid_a")
        .join(mb, "gid_b")
        .select(
            F.least("__ia", "__ib").alias("id_a"),
            F.greatest("__ia", "__ib").alias("id_b"),
            "editdist",
        )
    )
    # expansion 2: intra-group pairs — ids sharing one exact string are
    # at distance 0 by definition, no levenshtein needed
    intra = (
        members.alias("x")
        .join(members.alias("y"), "gid")
        .filter(F.col("x.id") < F.col("y.id"))
        .select(
            F.col("x.id").alias("id_a"),
            F.col("y.id").alias("id_b"),
            F.lit(0).alias("editdist"),
        )
    )
    return cross.unionByName(intra)
