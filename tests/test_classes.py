"""A7 class-set providers (sources/classes.py): offline P279 closure
fallback + SPARQL cache path, mirroring src/wiki_sparql.rs:79-130."""

from __future__ import annotations

import bz2
import json

import pytest

from tests.fixtures_wikidata import CLASS_SETS


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "id string, parent string")


@pytest.fixture(scope="module")
def tag_sets(spark):
    """P279 fixture: each real root gets a small subclass tree, plus an
    unrelated component and a cycle (P279 has real cycles in the wild)."""
    from geo_db_spark.sources.classes import class_sets_from_p279_edges

    edges = _edges(
        spark,
        [
            # territorial: Q56061 <- QT1 <- QT2, with a QT2<->QT3 cycle
            ("QT1", "Q56061"),
            ("QT2", "QT1"),
            ("QT3", "QT2"),
            ("QT2", "QT3"),
            # settlements: Q486972 <- QH1
            ("QH1", "Q486972"),
            # excluded roots (two of the five get descendants)
            ("QP1", "Q40357"),
            ("QN1", "Q123705"),
            ("QN2", "QN1"),
            # excluded settlements
            ("QU1", "Q159313"),
            # first-level admin
            ("QA1", "Q10864048"),
            # languages: Q34770 <- QL1 <- QL2
            ("QL1", "Q34770"),
            ("QL2", "QL1"),
            # unrelated component — must not appear in any set
            ("QZ2", "QZ1"),
        ],
    )
    tags = class_sets_from_p279_edges(edges)
    out: dict[str, set[str]] = {}
    for r in tags.collect():
        out.setdefault(r["set_name"], set()).add(r["class_id"])
    return out


def test_territorial_set_includes_root_and_descendants_cycle_safe(tag_sets):
    assert tag_sets["territorial_entities"] == {"Q56061", "QT1", "QT2", "QT3"}


def test_settlement_and_admin_and_language_sets(tag_sets):
    assert tag_sets["human_settlements"] == {"Q486972", "QH1"}
    assert tag_sets["second_level_admin_div"] == {"Q10864048", "QA1"}
    assert tag_sets["languages"] == {"Q34770", "QL1", "QL2"}


def test_excluded_sets_union_all_roots(tag_sets):
    # all five roots present even without descendants (wiki_sparql.rs:86-100)
    assert tag_sets["excluded"] == {
        "Q2974842", "Q123705", "Q131596", "Q40357", "Q695850",
        "QP1", "QN1", "QN2",
    }
    assert tag_sets["excluded_settlements"] == {
        "Q941150", "Q159313", "Q106505045", "Q22969563", "QU1",
    }


def test_no_unrelated_members(tag_sets):
    everything = set().union(*tag_sets.values())
    assert "QZ1" not in everything and "QZ2" not in everything


@pytest.mark.slow
def test_e2e_build_from_p279_edges(spark, tmp_path):
    """The e2e pipeline fed by edge-DERIVED class sets (not a hand dict):
    each fixture tag class is made a P279 subclass of the real root, and
    the final cities table must match the dict-driven run."""
    from geo_db_spark.pipeline import build_geo_db
    from geo_db_spark.sources.classes import class_sets_from_p279_edges
    from tests.test_pipeline_e2e import _mini_dump

    root_of = {
        "territorial_entities": "Q56061",
        "human_settlements": "Q486972",
        "excluded": "Q2974842",
        "excluded_settlements": "Q941150",
        "second_level_admin_div": "Q10864048",
        "languages": "Q34770",
    }
    edges = _edges(
        spark,
        [(qid, root_of[name]) for name, qids in CLASS_SETS.items() for qid in qids],
    )
    tags = class_sets_from_p279_edges(edges)

    raw = "[\n" + ",\n".join(_mini_dump()) + "\n]\n"
    dump = tmp_path / "dump.json.bz2"
    dump.write_bytes(bz2.compress(raw.encode()))

    finals = build_geo_db(spark, str(dump), tags)
    cities = {r["id"]: r.asDict() for r in finals["cities"].collect()}
    assert set(cities) == {"QV1", "QV2"}
    assert cities["QV1"]["2nd_id"] == "QS1"
    assert cities["QV1"]["country"] == "aa"


def _cache_payload(roots, sets):
    return json.dumps(
        {"roots": {k: sorted(v) for k, v in roots.items()}, "sets": sets}
    )


def test_sparql_fetch_uses_cache_offline(spark, tmp_path):
    """With a cache built for the SAME roots the fetch path never touches
    the network and matches class_sets_from_dict output."""
    from geo_db_spark.sources.classes import CLASS_SET_ROOTS, fetch_class_sets_sparql

    cache = tmp_path / "class_sets.json"
    cache.write_text(_cache_payload(CLASS_SET_ROOTS, CLASS_SETS))
    tags = fetch_class_sets_sparql(spark, str(cache))
    got = {(r["class_id"], r["set_name"]) for r in tags.collect()}
    want = {(qid, name) for name, qids in CLASS_SETS.items() for qid in qids}
    assert got == want


def test_sparql_fetch_refetches_on_roots_mismatch(spark, tmp_path, monkeypatch):
    """A cache built for DIFFERENT roots (or the legacy roots-less format)
    is stale: the fetch must go back to the endpoint and rewrite the
    cache (ADVICE r2)."""
    import sys
    import types

    from geo_db_spark.sources import classes as mod

    calls = []

    class _Resp:
        status_code = 200

        def raise_for_status(self):
            pass

        def json(self):
            return {
                "results": {
                    "bindings": [
                        {"s": {"value": "http://www.wikidata.org/entity/QFETCHED"}}
                    ]
                }
            }

    fake_requests = types.SimpleNamespace(
        get=lambda *a, **k: calls.append(a) or _Resp()
    )
    monkeypatch.setitem(sys.modules, "requests", fake_requests)

    cache = tmp_path / "class_sets.json"
    # legacy format: sets only, no recorded roots -> stale
    cache.write_text(json.dumps(CLASS_SETS))
    roots = {"only_set": ("Q1",)}
    tags = mod.fetch_class_sets_sparql(spark, str(cache), roots=roots)
    got = {(r["class_id"], r["set_name"]) for r in tags.collect()}
    assert got == {("Q1", "only_set"), ("QFETCHED", "only_set")}
    assert len(calls) == 1

    # the rewritten cache now records the roots: second call is offline
    mod.fetch_class_sets_sparql(spark, str(cache), roots=roots)
    assert len(calls) == 1

    # different roots again -> refetch
    mod.fetch_class_sets_sparql(spark, str(cache), roots={"other": ("Q2",)})
    assert len(calls) == 2
