"""Exact set-similarity join (operators/simjoin.py): equality with brute
force on planted near-dups, threshold edge behavior, and plan shape."""

from __future__ import annotations

from pyspark.sql import functions as F

from geo_db_spark.operators.dedup import shingles
from geo_db_spark.operators.simjoin import set_similarity_join


def _corpus(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog tonight"),
        (2, "the quick brown fox jumps over the lazy dog today"),  # near-dup of 1
        (3, "a completely different document about spark joins and shuffles"),
        (4, "a completely different document about spark joins and shuffles"),  # exact dup of 3
        (5, "short text only"),  # 3 tokens -> 1 shingle
        (6, "unrelated words entirely disjoint from every other entry here"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def _brute(spark, docs, num, den):
    sh = docs.select(
        F.col("doc_id").alias("id"), shingles(F.col("text"), 3).alias("sh")
    ).filter(F.size("sh") > 0)
    a = sh.select(F.col("id").alias("id_a"), F.col("sh").alias("sa"))
    b = sh.select(F.col("id").alias("id_b"), F.col("sh").alias("sb"))
    inter = F.size(F.array_intersect("sa", "sb")).cast("long")
    uni = (F.size("sa") + F.size("sb")).cast("long") - inter
    return (
        a.crossJoin(b)
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", inter.alias("inter"), uni.alias("uni"))
        .filter(F.col("inter") * den >= F.col("uni") * num)
    )


def test_simjoin_equals_bruteforce(spark):
    docs = _corpus(spark)
    got = sorted(
        (r.id_a, r.id_b, r.inter, r.uni)
        for r in set_similarity_join(docs, 1, 2).collect()
    )
    want = sorted(map(tuple, _brute(spark, docs, 1, 2).collect()))
    assert got == want
    pairs = {(a, b) for a, b, *_ in got}
    assert (3, 4) in pairs  # exact dup -> jaccard 1
    assert (1, 2) in pairs  # near dup above 1/2
    assert all(5 not in p and 6 not in p for p in pairs)


def test_simjoin_threshold_is_exact_rational(spark):
    """jaccard == exactly num/den must be KEPT (>=, integer cross-mult)."""
    # doc 1: shingles {abc bcd cde}, doc 2 shares exactly 2 of 4 union ->
    # construct: 1: "a b c d e" -> 3 shingles; 2: "a b c d x" -> 3 shingles,
    # shares "a b c" and "b c d" -> inter 2, union 4 -> exactly 1/2
    docs = spark.createDataFrame(
        [(1, "a b c d e"), (2, "a b c d x")], "doc_id long, text string"
    )
    rows = set_similarity_join(docs, 1, 2).collect()
    assert len(rows) == 1 and rows[0].inter == 2 and rows[0].uni == 4
    # and at the next-tighter rational it must vanish
    assert set_similarity_join(docs, 51, 100).count() == 0


def test_simjoin_no_cartesian_in_plan(spark):
    docs = _corpus(spark)
    plan = (
        set_similarity_join(docs, 1, 2)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "CartesianProduct" not in plan and "BroadcastNestedLoop" not in plan


def test_containment_finds_quote_case_jaccard_misses(spark):
    """The subset-duplicate case: a short doc fully quoted inside a long
    one has containment 1.0 but tiny Jaccard — containment_join must
    find the ordered pair (short -> long), NOT the reverse, while
    set_similarity_join at t=1/2 misses it. Brute-force parity on the
    whole synthetic corpus."""
    from pyspark.sql import functions as F

    from geo_db_spark.operators.simjoin import containment_join, set_similarity_join

    words = [f"w{i}" for i in range(40)]
    long_doc = " ".join(words)                 # 38 3-gram shingles
    short_doc = " ".join(words[10:16])         # 4 shingles, all in long_doc
    other = " ".join(f"z{i}" for i in range(30))
    docs = spark.createDataFrame(
        [(1, long_doc), (2, short_doc), (3, other)], "doc_id long, text string"
    )
    got = {
        (r.id_a, r.id_b): r.containment
        for r in containment_join(docs, 3, 5).collect()
    }
    assert (2, 1) in got and got[(2, 1)] == 1.0
    assert (1, 2) not in got  # asymmetric: long is NOT contained in short
    jac = {
        (r.id_a, r.id_b)
        for r in set_similarity_join(docs, 1, 2).collect()
    }
    assert (1, 2) not in jac and (2, 1) not in jac  # Jaccard 4/38 misses it


def test_expansion_heavy_profile_scoped_per_query(spark):
    """r11 guardrail (r10 verdict Next #7): tune_expansion_heavy shrinks
    AQE's advisory partition size for expansion-heavy aggregations (the
    100x containment probe's 33-task / 30-45 GB-spill failure mode) and
    tune() — which every query calls on entry — restores the default,
    so the profile cannot leak into the next query."""
    from geo_db_spark.session import tune, tune_expansion_heavy

    key = "spark.sql.adaptive.advisoryPartitionSizeInBytes"
    tune(spark)
    assert spark.conf.get(key) == "64m"
    tune_expansion_heavy(spark)
    assert spark.conf.get(key) == "8m"
    tune(spark)  # next query's entry
    assert spark.conf.get(key) == "64m"


def test_tune_overrides_env_applied_last(spark, monkeypatch):
    """SPARK_GRAFT_TUNE_OVERRIDES (r12) wins over tune()'s pinned
    confs — the fixed-plan measurement escape hatch (every query calls
    tune() on entry, so an AQE-off probe is impossible without it) —
    and unsetting it restores the pinned default on the next tune()."""
    from geo_db_spark.session import tune

    key = "spark.sql.adaptive.enabled"
    monkeypatch.setenv(
        "SPARK_GRAFT_TUNE_OVERRIDES", f"{key}=false, spark.sql.session.timeZone=UTC"
    )
    tune(spark)
    assert spark.conf.get(key) == "false"
    monkeypatch.delenv("SPARK_GRAFT_TUNE_OVERRIDES")
    tune(spark)  # next query's entry without the override
    assert spark.conf.get(key) == "true"
