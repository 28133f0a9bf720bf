"""Iterative numerical graph algorithms, hash-gate deterministic.

PageRank's float arithmetic is engine- and order-dependent (per-node
sums of double contributions), so a naive port can never pass a
value-hash oracle. This implementation runs in FIXED-POINT integer
arithmetic: ranks are BIGINTs scaled by 1e12, every operation is
integer multiply / floor-divide / sum — exact, order-independent, and
bit-identical in any engine. The truncation error per operation is
< 1e-12 of total mass, far below the algorithm's own convergence
tolerance; dangling-node mass is dropped (the standard simplification).

Scale shape per iteration: one join (edges ⋈ ranks, both keyed by the
node id — co-partitionable), one groupBy(dst) with map-side partial
SUM, one left join back to the node list. State is (id, rank) pairs —
16 bytes per node per iteration, same as connected components.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

PR_SCALE = 10**12


def pagerank_fixedpoint(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    iterations: int | None = 5,
    damping_pct: int = 85,
    max_iterations: int = 400,
) -> DataFrame:
    """(id, rank_fp) after ``iterations`` rounds; rank_fp is the rank
    scaled by PR_SCALE. A fixed iteration count keeps the plan static
    and the oracle expressible as K chained CTEs — that form stays the
    g13 contract (both engines run the same fixed-round algorithm, so
    parity is exact regardless of convergence).

    ``iterations=None`` (r8 verdict next #4, the house fixpoint pattern
    from k-core/SSSP) iterates until a round changes NO node's rank —
    an EXACT fixpoint, which integer arithmetic makes well-defined:
    once every per-node update lands on the same BIGINT, all later
    rounds are the identity. The probe is one bounded driver scalar per
    round (count of changed (id, rank) pairs — the emptiness probe on a
    checkpointed frame, so nothing re-runs prior rounds). Deltas shrink
    ~0.85x per round, so the fixpoint lands around
    log(base)/log(1/0.85) ≈ 110-170 rounds at PR_SCALE=1e12 — use it
    for correctness-critical ranks, not for the 5-round demo wall;
    ``max_iterations`` raises rather than spin if the integer dynamics
    ever enter a >1-cycle instead of a fixpoint.
    """
    if iterations is None and max_iterations < 1:
        raise ValueError(f"need max_iterations >= 1: got {max_iterations}")
    e = edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
    # r13: lazy checkpoints; the node-count guard below materializes
    # `nodes` in the same job (components.py probe pattern), and `ed`
    # rides inside the first job that consumes it — lineage truncation
    # (each loop frame starts from materialized-or-marked rows, never a
    # growing plan) is unchanged
    nodes = (
        e.select(F.col("src").alias("id"))
        .unionByName(e.select(F.col("dst").alias("id")))
        .distinct()
        .localCheckpoint(eager=False)
    )
    deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("d"))
    ed = e.join(deg, "src").localCheckpoint(eager=False)

    n = nodes.count()
    if n == 0:
        return nodes.select("id", F.lit(0).cast("long").alias("rank_fp"))
    base = PR_SCALE // n
    teleport = (base * (100 - damping_pct)) // 100

    ranks = nodes.withColumn("r", F.lit(base).cast("long"))
    converge = iterations is None
    r_no = 0
    while converge or r_no < iterations:
        r_no += 1
        if converge and r_no > max_iterations:
            raise ValueError(
                f"PageRank not at a fixpoint after {max_iterations} rounds "
                "— raise max_iterations or use a fixed iteration count"
            )
        contrib = (
            ed.join(ranks, ed["src"] == ranks["id"])
            .select("dst", F.expr("r div d").alias("c"))
        )
        in_sum = contrib.groupBy(F.col("dst").alias("nid")).agg(
            F.sum("c").alias("s")
        )
        new_ranks = (
            nodes.join(in_sum, nodes["id"] == F.col("nid"), "left")
            .select(
                "id",
                (
                    F.lit(teleport)
                    + F.expr(f"({damping_pct} * coalesce(s, 0L)) div 100")
                ).cast("long").alias("r"),
            )
            .localCheckpoint(eager=False)
        )
        if converge:
            # the change-count is the round's one materializing job; in
            # fixed-round mode the final action materializes the (plan-
            # truncated) chain in one job
            changed = (
                new_ranks.withColumnsRenamed({"id": "nid2", "r": "r2"})
                .join(ranks, F.col("nid2") == ranks["id"])
                .filter(F.col("r2") != F.col("r"))
                .count()
            )
            if changed == 0:
                break
        ranks = new_ranks
    return ranks.select("id", F.col("r").alias("rank_fp"))


def pagerank_oracle_sql(
    edges_sql: str,
    iterations: int = 5,
    damping_pct: int = 85,
) -> str:
    """DuckDB twin: the same integer arithmetic as K chained CTEs.
    ``edges_sql`` must select columns (src, dst)."""
    d = damping_pct
    parts = [
        f"e AS ({edges_sql})",
        "nodes AS (SELECT DISTINCT src AS id FROM e UNION SELECT DISTINCT dst FROM e)",
        "deg AS (SELECT src, count(*) AS dg FROM e GROUP BY src)",
        f"cn AS (SELECT count(*) AS n FROM nodes)",
        f"r0 AS (SELECT id, CAST({PR_SCALE} // n AS BIGINT) AS r FROM nodes, cn)",
    ]
    for i in range(iterations):
        parts.append(
            f"""r{i + 1} AS (
  SELECT nodes.id,
         CAST(({PR_SCALE} // cn.n) * {100 - d} // 100
              + {d} * coalesce(s.insum, 0) // 100 AS BIGINT) AS r
  FROM nodes CROSS JOIN cn
  LEFT JOIN (
    SELECT e.dst AS id, SUM(r{i}.r // deg.dg) AS insum
    FROM e JOIN r{i} ON e.src = r{i}.id JOIN deg ON e.src = deg.src
    GROUP BY e.dst
  ) s ON nodes.id = s.id
)"""
        )
    return (
        "WITH " + ",\n".join(parts)
        + f"\nSELECT id, r AS rank_fp FROM r{iterations}"
    )


def triangle_count(edges: DataFrame, a: str = "a", b: str = "b") -> DataFrame:
    """Global triangle count via the degree-ordered node-iterator
    ("compact-forward", Latapy 2008 — public algorithm). Returns a
    single-row DataFrame ``(n_triangles BIGINT)``.

    Every undirected edge is oriented from the endpoint with the lower
    (degree, id) to the higher, which bounds each node's out-degree by
    O(sqrt(m)); wedges are then pairs of out-edges from a common node and
    a triangle is a wedge whose closing pair is itself an oriented edge.

    Scale shape: one shuffle to dedup the edge set, one to compute
    degrees, one groupBy to build per-node OUT-adjacency arrays (bounded
    at O(sqrt(m)) elements by the orientation — no hub explosion), then
    each oriented edge (u, v) counts |out(u) ∩ out(v)| via a JVM-native
    ``array_intersect``. Wedges are never materialized or shuffled: the
    O(m·sqrt(m)) intersection work happens inside the map stage, and the
    only wide exchanges carry (node, array) rows whose size the
    orientation bounds. No driver-side state.
    """
    e = (
        edges.select(
            F.least(F.col(a), F.col(b)).alias("u"),
            F.greatest(F.col(a), F.col(b)).alias("v"),
        )
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )
    deg = (
        e.select(F.col("u").alias("id"))
        .unionAll(e.select(F.col("v").alias("id")))
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("dg"))
    )
    ed = (
        e.join(deg.withColumnsRenamed({"id": "u", "dg": "du"}), "u")
        .join(deg.withColumnsRenamed({"id": "v", "dg": "dv"}), "v")
    )
    fwd = F.struct("du", "u") < F.struct("dv", "v")
    oriented = ed.select(
        F.when(fwd, F.col("u")).otherwise(F.col("v")).alias("src"),
        F.when(fwd, F.col("v")).otherwise(F.col("u")).alias("dst"),
    )
    # r14: checkpoint the ADJACENCY table and recover everything below
    # from it. The r13 shape consumed `oriented` from three plan
    # branches (the wedge stream plus both adjacency joins), so the
    # whole edges+degrees+orientation chain re-ran ~3x per query (g15's
    # final plan: 64 Exchanges / 16 SortMergeJoins even with the edge
    # input checkpointed by the caller); checkpointing `oriented` alone
    # was measured SLOWER in r13 (7.2 -> 10.0 s) because the stats loss
    # demoted ~30 duplicated-subtree broadcasts. Checkpointing adj
    # instead leaves exactly ONE post-checkpoint join: each (src, dst)
    # oriented edge is recovered by EXPLODING adj's own nbrs array
    # (collect_list over the distinct oriented edges — every edge back
    # exactly once, with the u-side array already on the row for free),
    # so only the dst-side adjacency lookup remains a join. That join
    # is node-scale x node-scale with sqrt(m)-bounded arrays — never
    # broadcastable at 100 TB anyway, so the checkpoint costs no
    # legitimate broadcast (the r13 objection does not apply).
    adj = (
        oriented.groupBy("src")
        .agg(F.collect_list("dst").alias("nbrs"))
        .localCheckpoint(eager=True)
    )
    # each triangle {a,b,c} ordered a<b<c by (deg,id) is counted exactly
    # once, at its (a,b) edge: c is the common out-neighbor.
    # inner join: an endpoint absent from adj has no out-edges, so the
    # intersection would be empty anyway — dropping the row changes nothing.
    wedge = adj.select(
        F.col("nbrs").alias("nu"), F.explode("nbrs").alias("dst")
    )
    closed = wedge.join(
        adj.select(F.col("src").alias("_jv"), F.col("nbrs").alias("nv")),
        F.col("dst") == F.col("_jv"),
    ).select(F.size(F.array_intersect("nu", "nv")).alias("t"))
    return closed.agg(
        F.coalesce(F.sum("t"), F.lit(0)).cast("bigint").alias("n_triangles")
    )


def sssp_bellman_ford(
    edges: DataFrame,
    source: int,
    src_col: str = "a",
    dst_col: str = "b",
    weight_col: str = "w",
    rounds: int | None = 6,
    max_rounds: int | None = None,
) -> DataFrame:
    """Single-source shortest paths by synchronous Bellman-Ford
    relaxations over an UNDIRECTED weighted graph (edges are
    symmetrized here). Returns (node, dist) for every reached node.

    ``rounds=None`` (r7 verdict #4) relaxes TO THE FIXPOINT: the loop
    stops when a round improves NO node — exact by monotonicity (each
    node's dist only ever decreases under min over integer weights),
    guaranteed within |V| rounds on positive weights. A fixed
    ``rounds=K`` keeps the old semantics (the chained-CTE-oracle
    convention); with K < the graph's weighted-hop radius that result
    is a round-bounded approximation, NOT the shortest path.

    ``max_rounds`` (converge mode only) raises if any round BEYOND it
    still improves a node — for callers whose correctness oracle is a
    fixed chained-CTE relaxation of that depth: a graph whose radius
    outgrows the oracle then fails LOUDLY at run time instead of
    surfacing as a silent value mismatch (r8 ADVICE #3).

    Scale shape (r8: FRONTIER relaxation, delta Bellman-Ford): only
    nodes improved in the previous round can improve a neighbor, so
    each round joins the shrinking frontier — not the whole dist table
    — against the edge list (both partitioned by node key), takes a
    min-aggregate, and anti-join-merges the improvements back. Late
    rounds touch a handful of nodes instead of the full reachable set
    (sf0.1 part graph, warm: 7.8 -> 6.0 s — modest locally because the
    graph's radius is ~4 so the frontier only collapses on the last
    round; the win is structural at scale, where a dense round moves
    the entire reachable set every time). Every intermediate
    is localCheckpoint'ed so lineage stays O(1) and the emptiness probe
    never re-runs prior rounds (the components.py/ids.py rule). Integer
    weights and min() keep every round exact and order-independent;
    fixed-round results are identical to the dense form because
    non-improved sources can never re-improve a neighbor."""
    # r13: every per-round materialization in this loop is a LAZY
    # checkpoint whose materializing job is the round's frontier count
    # (the components.py probe pattern): sym and the merged dist ride
    # along inside the round-1 / next-round count job instead of each
    # paying a separate eager job plus a probe re-scan — one Spark job
    # per round where there were three (guide §2.4). Lineage is
    # truncated at mark time either way, so the emptiness probe still
    # never re-runs prior rounds.
    sym = edges.select(
        F.col(src_col).alias("u"), F.col(dst_col).alias("v"), F.col(weight_col).alias("w")
    ).unionByName(
        edges.select(
            F.col(dst_col).alias("u"), F.col(src_col).alias("v"), F.col(weight_col).alias("w")
        )
    ).localCheckpoint(eager=False)
    dist = sym.sparkSession.createDataFrame(
        [(int(source), 0)], "node long, dist long"
    )
    converge = rounds is None
    # frontier relaxation (delta Bellman-Ford): only nodes whose dist
    # IMPROVED last round can improve a neighbor this round, so each
    # round joins the (shrinking) frontier against the edges, not the
    # whole dist table — late rounds touch a handful of nodes instead
    # of the full reachable set. Convergence = empty frontier (exact:
    # no improvement anywhere means the fixpoint, and a fixed round
    # count relaxes identically to the dense form because min() over
    # candidates never re-improves from non-improved sources).
    frontier = dist
    r = 0
    while True:
        if not converge and r >= rounds:
            break
        r += 1
        relaxed = frontier.join(sym, frontier["node"] == sym["u"]).select(
            F.col("v").alias("node"), (F.col("dist") + F.col("w")).alias("cand")
        )
        best = relaxed.groupBy("node").agg(F.min("cand").alias("cand"))
        improved = (
            best.join(dist.withColumnsRenamed({"dist": "old", "node": "onode"}),
                      best["node"] == F.col("onode"), "left")
            .filter(F.col("old").isNull() | (F.col("cand") < F.col("old")))
            .select("node", F.col("cand").alias("dist"))
            .localCheckpoint(eager=False)
        )
        # the ONE job of the round: counting the frontier evaluates the
        # relax + min-aggregate + improvement filter, materializing
        # `improved` (and, transitively, last round's lazy dist merge
        # and sym on round 1) in the same pass
        n_improved = improved.count()
        if converge and n_improved == 0:
            break
        if converge and max_rounds is not None and r > max_rounds:
            raise ValueError(
                f"SSSP still improving at round {r} but the caller's "
                f"fixed-depth oracle only relaxes {max_rounds} rounds — "
                "deepen the oracle (the weighted-hop radius outgrew it)"
            )
        dist = (
            dist.join(improved.select(F.col("node").alias("inode")),
                      dist["node"] == F.col("inode"), "left_anti")
            .unionByName(improved)
            .localCheckpoint(eager=False)
        )
        frontier = improved
        if not converge and n_improved == 0:
            # fixed-round form: remaining rounds are identity
            break
    return dist


def kcore_peel(
    edges: DataFrame,
    k: int,
    src_col: str = "a",
    dst_col: str = "b",
    rounds: int | None = 4,
) -> DataFrame:
    """k-core peeling (Seidman 1983 "Network structure and minimum
    degree" — public): synchronous rounds of dropping every node whose
    degree in the SURVIVING subgraph is < k. Returns (node, degree) for
    nodes alive after the last peel, with their degree in the surviving
    subgraph.

    ``rounds=None`` (r7 verdict #4) peels TO THE FIXPOINT — the exact
    k-core (maximal subgraph of min-degree >= k). The convergence check
    is exact AND early-exiting: each round's degree aggregate (needed
    anyway) also yields, as one bounded driver scalar, (nodes-in-graph,
    nodes-with-deg>=k); when they are equal the filter is the identity,
    so the loop stops BEFORE the two semi-joins — a converged round
    costs one aggregate, not a full peel. A fixed ``rounds=K`` keeps
    the old plan-static behavior (the chained-CTE-oracle convention);
    with K < the peel depth that result is NOT the k-core.

    Scale shape: each round = one degree aggregate over the surviving
    symmetric edge list + one semi-join filter of edges against
    surviving nodes — both keyed on the node, riding one exchange; the
    edge list is localCheckpoint'ed per round (lineage O(1), the
    components.py rule), which also keeps the convergence scalar from
    re-running prior rounds. Monotone: the surviving set only shrinks,
    so per-round cost falls.
    """
    if k < 1 or (rounds is not None and rounds < 1):
        raise ValueError(f"need k >= 1 and rounds >= 1: got k={k}, rounds={rounds}")
    # r13: lazy checkpoints — in converge mode each round's degree
    # aggregate (the probe the loop needs anyway) is the job that
    # materializes the previous round's peeled edge list, so a round
    # costs one job instead of a peel job plus a probe re-scan (the
    # components.py pattern); lineage is truncated at mark time, so the
    # probe still never re-runs prior rounds
    sym = (
        edges.select(F.col(src_col).alias("u"), F.col(dst_col).alias("v"))
        .unionByName(
            edges.select(F.col(dst_col).alias("u"), F.col(src_col).alias("v"))
        )
        .localCheckpoint(eager=False)
    )
    converge = rounds is None
    r = 0
    while converge or r < rounds:
        r += 1
        deg = sym.groupBy("u").agg(F.count(F.lit(1)).alias("deg"))
        if converge:
            row = deg.agg(
                F.count(F.lit(1)).alias("n"),
                F.sum((F.col("deg") >= k).cast("long")).alias("a"),
            ).collect()[0]
            if row["n"] is None or row["n"] == (row["a"] or 0):
                break  # every surviving node already has deg >= k (or graph empty)
        alive = deg.filter(F.col("deg") >= k).select("u")
        sym = (
            sym.join(alive, "u")
            .join(alive.withColumnsRenamed({"u": "v"}), "v")
            .select("u", "v")
            .localCheckpoint(eager=False)
        )
    return (
        sym.groupBy("u")
        .agg(F.count(F.lit(1)).alias("degree"))
        .select(F.col("u").alias("node"), "degree")
    )
