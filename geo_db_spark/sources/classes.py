"""Class-set side input (reference A7, src/wiki_sparql.rs).

The reference fetches six class closures from the WikiData SPARQL
endpoint (``SELECT ?s WHERE { ?s wdt:P279+ wd:<root> }``,
src/wiki_sparql.rs:9-67) and assembles them into six membership sets
(src/wiki_sparql.rs:79-130). Three equivalent providers here:

1. ``class_sets_from_p279_edges`` — OFFLINE fallback: compute the same
   closures from a P279 subclass-of edge table with the existing
   cycle-safe ``transitive_closure_loop`` (the server-side ``P279+`` is
   exactly a transitive closure; SURVEY.md §2 A7).
2. ``fetch_class_sets_sparql`` — driver-side HTTP fetch with an on-disk
   JSON cache, matching the reference's query shape. Gated behind an
   import-try (requests may be absent / network may be blocked).
3. ``extract.class_sets_from_dict`` — precomputed dict (tests).

All three produce the same (class_id, set_name) tagged DataFrame
consumed by ``extract.with_class_flags``.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from geo_db_spark.operators.closure import transitive_closure_loop

# Set roots, verbatim from src/wiki_sparql.rs:79-120. Every set contains
# its root(s) AND the P279+ descendants (the reference inserts the root
# after each fetch, e.g. :80-81).
CLASS_SET_ROOTS: dict[str, tuple[str, ...]] = {
    # territorial entity (:80-81)
    "territorial_entities": ("Q56061",),
    # human settlement (:83-84)
    "human_settlements": ("Q486972",),
    # lost cities / neighborhoods / farm / prisons / airbase (:86-100);
    # Q19953632 deliberately NOT a root (:93-94 — would exclude Moscow)
    "excluded": ("Q2974842", "Q123705", "Q131596", "Q40357", "Q695850"),
    # Plusregio / urban agglomeration / linear pottery culture /
    # bodendenkmal (:102-112)
    "excluded_settlements": ("Q941150", "Q159313", "Q106505045", "Q22969563"),
    # first-level administrative subdivision (:114-117)
    "second_level_admin_div": ("Q10864048",),
    # language (:119-120)
    "languages": ("Q34770",),
}

SPARQL_ENDPOINT = "https://query.wikidata.org/sparql"


def class_sets_from_p279_edges(
    edges: DataFrame,
    roots: dict[str, tuple[str, ...]] | None = None,
    max_steps: int = 100,
    child_col: str = "id",
    parent_col: str = "parent",
) -> DataFrame:
    """Build the six class sets from a P279 edge table: ``(id, parent)``
    meaning *id is a subclass of parent*.

    ``?s wdt:P279+ wd:root`` = every node with a P279 path to the root =
    the DESCENDANT closure of the root in the edge table. One
    cycle-safe loop run covers all roots at once (seeded together,
    tagged after); each set then contains its roots plus descendants,
    exactly src/wiki_sparql.rs:79-130.
    """
    spark = edges.sparkSession
    roots = roots or CLASS_SET_ROOTS
    tag_rows = [(qid, name) for name, qids in roots.items() for qid in qids]
    tags = spark.createDataFrame(tag_rows, "root string, set_name string")
    seeds = tags.select(F.col("root").alias("id")).distinct()
    # descend the subclass tree: swap the closure's edge roles so each
    # step goes parent -> child (loop variant: P279 has real cycles)
    cl = transitive_closure_loop(
        edges, seeds, max_steps=max_steps, child_col=parent_col, parent_col=child_col
    )
    return (
        cl.join(tags, cl["seed"] == tags["root"])
        .select(F.col("id").alias("class_id"), "set_name")
        .distinct()
    )


def fetch_class_sets_sparql(
    spark: SparkSession,
    cache_path: str,
    roots: dict[str, tuple[str, ...]] | None = None,
    endpoint: str = SPARQL_ENDPOINT,
    timeout: float = 120.0,
) -> DataFrame:
    """Driver-side SPARQL fetch of the class sets with an on-disk JSON
    cache (one file holding {set_name: [qid, ...]}).

    Mirrors src/wiki_sparql.rs:9-67: one ``P279+`` query per root, the
    trailing URI segment is the Q-id, the root itself is added to the
    set. Cached results are reused so ingest runs are reproducible
    offline after one fetch — but only when the cache was built for the
    SAME roots (ADVICE r2: a stale cache for different roots must
    trigger a refetch, not be returned verbatim). Legacy caches without
    a recorded roots dict are treated as stale.
    """
    from geo_db_spark.extract import class_sets_from_dict

    roots = roots or CLASS_SET_ROOTS
    roots_norm = {name: sorted(qids) for name, qids in roots.items()}
    if os.path.exists(cache_path):
        with open(cache_path) as f:
            cached = json.load(f)
        if isinstance(cached, dict) and cached.get("roots") == roots_norm:
            return class_sets_from_dict(spark, cached["sets"])

    try:
        import requests
    except ImportError as e:  # pragma: no cover - env-dependent
        raise RuntimeError(
            "requests unavailable and no cache at "
            f"{cache_path}; use class_sets_from_p279_edges or provide a cache"
        ) from e

    sets: dict[str, list[str]] = {}
    for name, qids in roots.items():
        members = set(qids)
        for root in qids:
            resp = requests.get(
                endpoint,
                params={"query": f"SELECT ?s WHERE {{ ?s wdt:P279+ wd:{root} . }}"},
                headers={"Accept": "application/sparql-results+json;charset=utf-8"},
                timeout=timeout,
            )
            resp.raise_for_status()
            for b in resp.json()["results"]["bindings"]:
                members.add(b["s"]["value"].rstrip("/").rsplit("/", 1)[-1])
        sets[name] = sorted(members)

    tmp = f"{cache_path}.tmp"
    with open(tmp, "w") as f:
        json.dump({"roots": roots_norm, "sets": sets}, f)
    os.replace(tmp, cache_path)
    return class_sets_from_dict(spark, sets)
