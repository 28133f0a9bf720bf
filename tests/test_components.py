"""Unit tests for connected_components (operators/components.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from geo_db_spark.operators.components import connected_components


def _cc(spark, edges):
    df = spark.createDataFrame(edges, ["src", "dst"])
    out = connected_components(df, "src", "dst")
    return {(r["id"], r["cluster_id"]) for r in out.collect()}


def test_two_components(spark):
    got = _cc(spark, [(1, 2), (2, 3), (10, 11)])
    assert got == {(1, 1), (2, 1), (3, 1), (10, 10), (11, 10)}


def test_chain_converges_via_pointer_jumping(spark):
    # a 40-node path: plain propagation needs 40 rounds; pointer jumping
    # must close it within the 50-iteration cap with room to spare
    edges = [(i, i + 1) for i in range(1, 40)]
    got = _cc(spark, edges)
    assert got == {(i, 1) for i in range(1, 41)}


def test_cycle_terminates(spark):
    got = _cc(spark, [(1, 2), (2, 3), (3, 1)])
    assert got == {(1, 1), (2, 1), (3, 1)}


def test_edge_direction_irrelevant(spark):
    # min id appearing on the dst side still wins
    got = _cc(spark, [(5, 2), (9, 5)])
    assert got == {(2, 2), (5, 2), (9, 2)}


def test_self_loop_singleton(spark):
    got = _cc(spark, [(7, 7)])
    assert got == {(7, 7)}


def test_nonconvergence_raises(spark):
    import pytest

    # a 40-node path cannot converge in 1 round
    edges = [(i, i + 1) for i in range(1, 40)]
    df = spark.createDataFrame(edges, ["src", "dst"])
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(df, "src", "dst", max_iters=1)


def test_kcore_peel_cascades(spark):
    """The defining k-core property: peeling CASCADES. A chain hanging
    off a triangle dies one link per round (degree drops below k only
    after the outer node peels); the triangle is the exact 2-core."""
    from geo_db_spark.operators.graph_algos import kcore_peel

    # triangle 1-2-3, chain 3-4-5
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3), (3, 4), (4, 5)], "a long, b long"
    )
    out = {r["node"]: r["degree"] for r in kcore_peel(edges, k=2, rounds=3).collect()}
    assert out == {1: 2, 2: 2, 3: 2}  # chain fully peeled, triangle intact

    # one round is NOT enough: node 4 still alive (5 peels first)
    partial = {r["node"] for r in kcore_peel(edges, k=2, rounds=1).collect()}
    assert 4 in partial and 5 not in partial


def test_kcore_rejects_bad_params(spark):
    import pytest

    from geo_db_spark.operators.graph_algos import kcore_peel

    edges = spark.createDataFrame([(1, 2)], "a long, b long")
    with pytest.raises(ValueError):
        kcore_peel(edges, k=0)
    with pytest.raises(ValueError):
        kcore_peel(edges, k=2, rounds=0)


def test_kcore_converged_exact_where_rounds4_insufficient(spark):
    """r7 verdict #4: rounds=None must peel to the TRUE k-core. A
    6-link chain hanging off a triangle needs 6 cascading rounds (one
    outer node dies per round) — rounds=4 provably leaves chain nodes
    alive, the converged form returns exactly the triangle."""
    from geo_db_spark.operators.graph_algos import kcore_peel

    # triangle 1-2-3, chain 3-4-5-6-7-8-9
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3), (3, 4), (4, 5), (5, 6), (6, 7), (7, 8), (8, 9)],
        "a long, b long",
    )
    bounded = {r["node"] for r in kcore_peel(edges, k=2, rounds=4).collect()}
    assert bounded > {1, 2, 3}  # provably insufficient: chain remnants alive
    exact = {
        r["node"]: r["degree"] for r in kcore_peel(edges, k=2, rounds=None).collect()
    }
    assert exact == {1: 2, 2: 2, 3: 2}


def test_kcore_converged_empty_core(spark):
    """Convergence must also terminate when the k-core is EMPTY (the
    surviving edge set peels to nothing)."""
    from geo_db_spark.operators.graph_algos import kcore_peel

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4)], "a long, b long"  # a path has no 2-core
    )
    assert kcore_peel(edges, k=2, rounds=None).count() == 0
