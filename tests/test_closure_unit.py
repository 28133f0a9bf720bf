"""Unit tests for the closure operators: cycle termination, step bound,
diamond dedup (SURVEY.md §5 property tests; FIXTURES.md §1 graph cases)."""

from __future__ import annotations

import pytest

from geo_db_spark.operators.closure import (
    deepest_qualifying_ancestor,
    transitive_closure,
    transitive_closure_loop,
)

EDGES = [  # chain + diamond + 2-cycle + self-loop
    ("a", "b"),
    ("b", "c"),
    ("d", "b"),
    ("d", "e"),
    ("e", "c"),
    ("x", "y"),
    ("y", "x"),
    ("s", "s"),
]


def _dfs(spark):
    edges = spark.createDataFrame(EDGES, "id string, parent string")
    seeds = spark.createDataFrame([("a",), ("d",), ("x",), ("s",)], "id string")
    return edges, seeds


def test_loop_closure_first_visit_semantics(spark):
    edges, seeds = _dfs(spark)
    out = transitive_closure_loop(edges, seeds, max_steps=100)
    rows = {(r["seed"], r["id"]): r["step"] for r in out.collect()}
    # each (seed, node) appears exactly once, at its minimal distance
    assert len(rows) == len(out.collect())
    assert rows[("a", "c")] == 2
    assert rows[("d", "c")] == 2  # via either diamond arm, recorded once
    # cycles terminate without the step bound being the only guard
    assert rows[("x", "y")] == 1 and rows[("x", "x")] == 0
    assert rows[("s", "s")] == 0


def test_cte_closure_all_paths_bounded(spark):
    edges, seeds = _dfs(spark)
    out = transitive_closure(edges, seeds, max_steps=6)
    rows = [(r["seed"], r["id"], r["step"]) for r in out.collect()]
    # diamond: 'd' reaches c via two paths -> two rows at step 2
    assert rows.count(("d", "c", 2)) == 2
    # 2-cycle enumerates alternating paths up to the bound
    assert ("x", "x", 6) in rows and ("x", "y", 5) in rows
    assert max(s for _, _, s in rows) == 6


@pytest.mark.slow
def test_loop_closure_depth100_with_cycles(spark):
    """Deep-and-cyclic guard (VERDICT r1 #7): a 105-deep chain with a
    back-edge every 10 nodes (many overlapping cycles). The CTE variant
    enumerates alternating cycle paths — row count grows exponentially
    with the bound — so on this shape the LOOP variant is the only
    viable plan; it must terminate in exactly one pass per level with
    first-visit steps and respect the step<=100 bound."""
    import time

    chain = [(i, i + 1) for i in range(105)]
    back = [(i, i - 10) for i in range(10, 105, 10)]
    edges = spark.createDataFrame(chain + back, "id long, parent long")
    seeds = spark.createDataFrame([(0,)], "id long")

    t0 = time.perf_counter()
    out = transitive_closure_loop(edges, seeds, max_steps=100)
    rows = {r["id"]: r["step"] for r in out.collect()}
    wall = time.perf_counter() - t0

    assert rows[100] == 100  # deepest node inside the bound
    assert 101 not in rows  # step bound enforced
    assert rows[50] == 50  # back-edges never shorten forward distances
    # every reachable node recorded exactly once (first visit)
    assert len(rows) == 101
    # termination guard: 100 sequential tiny jobs, not path enumeration
    assert wall < 180, f"loop closure too slow: {wall:.1f}s"


def test_deepest_qualifying_ancestor_tiebreak(spark):
    edges = spark.createDataFrame(
        [("c1", "p1"), ("c1", "p2"), ("p2", "p3")], "id string, parent string"
    )
    seeds = spark.createDataFrame([("c1",)], "id string")
    closure = transitive_closure(edges, seeds, max_steps=10)
    # p1 and p2 both qualify at step 1; p3 qualifies at step 2 -> deepest
    qual = spark.createDataFrame([("p1",), ("p2",), ("p3",)], "id string")
    got = deepest_qualifying_ancestor(closure, qual).collect()
    assert [(r["seed"], r["id"], r["step"]) for r in got] == [("c1", "p3", 2)]
    # only the equal-depth candidates -> ascending-id tiebreak
    qual2 = spark.createDataFrame([("p1",), ("p2",)], "id string")
    got2 = deepest_qualifying_ancestor(closure, qual2).collect()
    assert [(r["seed"], r["id"], r["step"]) for r in got2] == [("c1", "p1", 1)]


def test_doubling_closure_equals_loop(spark):
    """Path doubling must reproduce the loop's first-visit (min-step)
    closure exactly — including on cycles and self-loops, where the
    min-step fixpoint is what guarantees termination."""
    from geo_db_spark.operators.closure import transitive_closure_doubling

    edges, seeds = _dfs(spark)
    want = {
        (r["seed"], r["id"]): r["step"]
        for r in transitive_closure_loop(edges, seeds, max_steps=100).collect()
    }
    got = {
        (r["seed"], r["id"]): r["step"]
        for r in transitive_closure_doubling(edges, seeds, max_steps=100).collect()
    }
    assert got == want


def test_sssp_bellman_ford_prefers_cheap_multihop(spark):
    """r7 SSSP: a 2-hop path of weight 2 must beat the direct weight-10
    edge (distance relaxation, not hop counting), and unreachable nodes
    must not appear."""
    from geo_db_spark.operators.graph_algos import sssp_bellman_ford

    edges = spark.createDataFrame(
        [(1, 2, 10), (1, 3, 1), (3, 2, 1), (2, 4, 1), (5, 6, 1)],
        "a long, b long, w long",
    )
    got = {r.node: r.dist for r in sssp_bellman_ford(edges, 1, rounds=6).collect()}
    assert got == {1: 0, 3: 1, 2: 2, 4: 3}  # 5,6 unreachable


def test_sssp_converged_exact_where_rounds6_insufficient(spark):
    """r7 verdict #4: rounds=None must relax to the TRUE shortest-path
    fixpoint. A 9-hop path needs 9 relaxation rounds — rounds=6
    provably misses the tail (and a late cheap detour means early
    rounds also hold WRONG distances, not just missing ones)."""
    from geo_db_spark.operators.graph_algos import sssp_bellman_ford

    # path 1-2-...-10 (w=1 each) plus an expensive direct edge 1-10
    path = [(i, i + 1, 1) for i in range(1, 10)]
    edges = spark.createDataFrame(
        path + [(1, 10, 100)], "a long, b long, w long"
    )
    bounded = {
        r.node: r.dist for r in sssp_bellman_ford(edges, 1, rounds=6).collect()
    }
    assert bounded[10] == 100  # provably insufficient: direct edge not yet beaten
    exact = {
        r.node: r.dist for r in sssp_bellman_ford(edges, 1, rounds=None).collect()
    }
    assert exact == {i: i - 1 for i in range(1, 11)}  # true fixpoint: 10 at dist 9
