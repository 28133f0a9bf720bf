"""Golden-row tests for the extraction front-end, one per FIXTURES.md §2
case (rule citations in geo_db_spark/extract.py docstrings)."""

from __future__ import annotations

import pytest

from geo_db_spark.extract import class_sets_from_dict, extract_all
from geo_db_spark.functions.wiki_time import NOW_KEY_DEFAULT, wiki_time_key_py
from geo_db_spark.sources.wikidata import parse_entity_lines
from tests.fixtures_wikidata import (
    CLASS_SETS,
    FUTURE,
    PAST,
    entity,
    entity_stmt,
    labels_map,
    q_flag,
    q_time,
    stmt,
)


def run_extract(spark, docs: list[str]) -> dict[str, list]:
    # include array-boundary + trailing-comma raw-dump framing (A5/A6)
    lines = ["["] + [d + "," for d in docs[:-1]] + [docs[-1]] + ["]"]
    df = spark.createDataFrame([(line,) for line in lines], "value string")
    tags = class_sets_from_dict(spark, CLASS_SETS)
    outs = extract_all(parse_entity_lines(df), tags, NOW_KEY_DEFAULT)
    return {k: [r.asDict() for r in v.collect()] for k, v in outs.items()}


CITY_CLAIMS = {
    "P31": [entity_stmt("QCITY")],
    "P17": [entity_stmt("Q183", q_time("P580", "+1990-10-03T00:00:00Z"))],
    "P131": [entity_stmt("Q1208")],
    "P625": [stmt({"latitude": 52.52, "longitude": 13.405})],
    "P1082": [
        stmt({"amount": "+3677472", "unit": "1"}, q_time("P585", "+2019-12-31T00:00:00Z"))
    ],
    "P1705": [stmt({"language": "de", "text": "Berlin"})],
}


def test_plain_qualifying_city(spark):
    out = run_extract(spark, [entity("Q64", CITY_CLAIMS, labels_map(en="Berlin"))])
    assert out["cities"] == [
        {"id": "Q64", "population": 3677472, "lat": 52.52, "lon": 13.405}
    ]
    assert out["cities_countries"] == [
        {"city": "Q64", "priority": 0, "country": "Q183"}
    ]
    assert out["territorial_entities_parents"] == [{"id": "Q64", "parent": "Q1208"}]
    labels = sorted(out["object_labels"], key=lambda r: (r["lang"], r["native_order"] or -1))
    assert {"id": "Q64", "lang": "de", "native_order": 0, "label": "Berlin"} in labels
    assert {"id": "Q64", "lang": "en", "native_order": None, "label": "Berlin"} in labels
    assert out["missing_p17"] == []


def test_defunct_filters(spark):
    replaced = dict(CITY_CLAIMS, P1366=[entity_stmt("Q9")])
    kept_part = dict(CITY_CLAIMS, P1366=[entity_stmt("Q9", q_flag("P518"))])
    dissolved = dict(CITY_CLAIMS, P576=[entity_stmt("Q9")])
    out = run_extract(
        spark,
        [
            entity("Q1", replaced, labels_map(en="a")),
            entity("Q2", kept_part, labels_map(en="b")),
            entity("Q3", dissolved, labels_map(en="c")),
        ],
    )
    assert [r["id"] for r in out["cities"]] == ["Q2"]


def test_settlement_without_p17(spark):
    claims = {"P31": [entity_stmt("QCITY")], "P131": [entity_stmt("Q5")]}
    out = run_extract(spark, [entity("Q10", claims, labels_map(en="x"))])
    assert out["missing_p17"] == [{"id": "Q10"}]
    assert out["cities"] == []
    # no P17 -> handler returns before parents (reference :125-131)
    assert out["territorial_entities_parents"] == []


def test_city_country_priorities_and_expiry(spark):
    claims = {
        "P31": [entity_stmt("QCITY")],
        "P17": [
            entity_stmt("QDEAD", q_time("P582", PAST)),  # ended -> skipped
            entity_stmt("QDATED", q_time("P580", PAST)),  # dated -> prio = idx 1
            entity_stmt("QUNDATED"),  # undated -> prio = 1000 + idx 2
            entity_stmt("QFUT", q_time("P580", FUTURE)),  # not started -> skipped
        ],
    }
    out = run_extract(spark, [entity("Q20", claims, labels_map(en="x"))])
    rows = sorted(out["cities_countries"], key=lambda r: r["priority"])
    assert rows == [
        {"city": "Q20", "priority": 1, "country": "QDATED"},
        {"city": "Q20", "priority": 1002, "country": "QUNDATED"},
    ]


def test_population_rules(spark):
    claims = {
        "P31": [entity_stmt("QCITY")],
        "P17": [entity_stmt("Q183")],
        "P1082": [
            stmt({"amount": "+100", "unit": "1"}, q_time("P585", "+2010-01-01T00:00:00Z")),
            # same time, later entry -> wins over the first (>= fold)
            stmt({"amount": "+200", "unit": "1"}, q_time("P585", "+2010-01-01T00:00:00Z")),
            # newest time but female-only -> excluded
            stmt(
                {"amount": "+300", "unit": "1"},
                {**q_time("P585", "+2020-01-01T00:00:00Z"), **q_flag("P1539")},
            ),
            # newest time but wrong unit -> excluded
            stmt({"amount": "+400", "unit": "km2"}, q_time("P585", "+2021-01-01T00:00:00Z")),
            # no P585 -> never wins
            stmt({"amount": "+500", "unit": "1"}),
        ],
    }
    out = run_extract(spark, [entity("Q30", claims, labels_map(en="x"))])
    assert out["cities"][0]["population"] == 200


def test_population_quantity_parsing(spark):
    def city(eid, amount):
        return entity(
            eid,
            {
                "P31": [entity_stmt("QCITY")],
                "P17": [entity_stmt("Q183")],
                "P1082": [stmt({"amount": amount, "unit": "1"}, q_time("P585", PAST))],
            },
            labels_map(en="x"),
        )

    out = run_extract(spark, [city("Q40", "1,234,567"), city("Q41", "1.5"), city("Q42", "-5")])
    pops = {r["id"]: r["population"] for r in out["cities"]}
    assert pops == {"Q40": 1234567, "Q41": 15, "Q42": None}  # u64 parse fails on '-'


def test_somevalue_coordinates(spark):
    claims = {
        "P31": [entity_stmt("QCITY")],
        "P17": [entity_stmt("Q183")],
        "P625": [stmt({"latitude": 1.0, "longitude": 2.0}, snaktype="somevalue")],
    }
    out = run_extract(spark, [entity("Q50", claims, labels_map(en="x"))])
    assert out["cities"] == [{"id": "Q50", "population": None, "lat": None, "lon": None}]


def test_native_label_precedence(spark):
    has_1705 = {
        "P31": [entity_stmt("QCITY")],
        "P17": [entity_stmt("Q183")],
        "P1705": [stmt({"language": "de", "text": "A"})],
        "P1448": [stmt({"language": "fr", "text": "B"})],
    }
    only_1448 = {
        "P31": [entity_stmt("QCITY")],
        "P17": [entity_stmt("Q183")],
        "P1448": [
            stmt({"language": "fr", "text": "C"}, q_time("P582", PAST)),  # inactive
            stmt({"language": "es", "text": "D"}),
            stmt({"language": "nl", "text": "E"}),
        ],
    }
    out = run_extract(spark, [entity("Q60", has_1705), entity("Q61", only_1448)])
    native = [r for r in out["object_labels"] if r["native_order"] is not None]
    by_id = {}
    for r in native:
        by_id.setdefault(r["id"], []).append((r["native_order"], r["lang"], r["label"]))
    assert by_id["Q60"] == [(0, "de", "A")]
    # P1448 fallback: inactive 'fr' skipped, running order over kept
    assert sorted(by_id["Q61"]) == [(0, "es", "D"), (1, "nl", "E")]


def test_routing_te_and_settlement(spark):
    both = {
        "P31": [entity_stmt("QCITY"), entity_stmt("QTE")],
        "P17": [entity_stmt("Q183")],
    }
    excluded_te = {"P31": [entity_stmt("QTE"), entity_stmt("QEXC")]}
    excluded_city = {
        "P31": [entity_stmt("QCITY"), entity_stmt("QEXCS")],
        "P17": [entity_stmt("Q183")],
    }
    out = run_extract(
        spark,
        [
            entity("Q70", both, labels_map(en="x")),
            entity("Q71", excluded_te, labels_map(en="y")),
            entity("Q72", excluded_city, labels_map(en="z")),
        ],
    )
    assert [r["id"] for r in out["territorial_entities"]] == ["Q70"]
    assert [r["id"] for r in out["cities"]] == ["Q70"]
    # both routes emit the same plain label; SQLite UNIQUE(NULL) keeps both
    q70_plain = [
        r for r in out["object_labels"] if r["id"] == "Q70" and r["native_order"] is None
    ]
    assert len(q70_plain) == 2


def test_class_membership_denied_by_qualifiers(spark):
    via_p1366 = {"P31": [entity_stmt("QCITY", q_flag("P1366"))], "P17": [entity_stmt("Q1")]}
    via_expiry = {
        "P31": [entity_stmt("QCITY", q_time("P582", PAST))],
        "P17": [entity_stmt("Q1")],
    }
    out = run_extract(
        spark,
        [entity("Q80", via_p1366, labels_map(en="x")), entity("Q81", via_expiry, labels_map(en="y"))],
    )
    assert out["cities"] == []


def test_country_branch(spark):
    claims = {
        "P297": [
            entity_stmt("ignored", q_time("P582", PAST)),  # inactive -> not first
            stmt("DE", q_time("P580", PAST)),
        ],
        "P37": [
            entity_stmt("QL1"),
            entity_stmt("QLDEAD", q_time("P582", PAST)),  # skipped, index not bumped
            entity_stmt("QL2"),
        ],
    }
    out = run_extract(spark, [entity("Q183", claims)])
    assert out["countries"] == [{"id": "Q183", "iso": "de"}]
    langs = sorted(out["object_languages"], key=lambda r: r["lang_index"])
    assert langs == [
        {"id": "Q183", "lang_id": "QL1", "lang_index": 0},
        {"id": "Q183", "lang_id": "QL2", "lang_index": 1},
    ]


def test_te_language_fallback_p2936(spark):
    claims = {
        "P31": [entity_stmt("QTE")],
        "P2936": [entity_stmt("QL9")],
    }
    out = run_extract(spark, [entity("Q90", claims)])
    assert out["object_languages"] == [{"id": "Q90", "lang_id": "QL9", "lang_index": 0}]
    assert out["territorial_entities"] == [{"id": "Q90", "is_2nd": False, "iso": None}]


def test_second_level_iso(spark):
    claims = {
        "P31": [entity_stmt("QTE"), entity_stmt("Q2ND")],
        "P300": [stmt("US-CA")],
    }
    out = run_extract(spark, [entity("Q95", claims)])
    assert out["territorial_entities"] == [{"id": "Q95", "is_2nd": True, "iso": "US-CA"}]


def test_language_entity(spark):
    with_code = {"P31": [entity_stmt("QLANG")], "P424": [stmt("eo")]}
    without = {"P31": [entity_stmt("QLANG")]}
    out = run_extract(spark, [entity("Q100", with_code), entity("Q101", without)])
    assert out["languages"] == [{"id": "Q100", "code": "eo"}]


def test_malformed_label_skipped(spark):
    doc = (
        '{"id":"Q110","claims":{"P31":[{"mainsnak":{"snaktype":"value",'
        '"datavalue":{"value":{"id":"QCITY"}}}}],"P17":[{"mainsnak":{"snaktype":"value",'
        '"datavalue":{"value":{"id":"Q1"}}}}]},'
        '"labels":{"en":{"language":"en","value":"ok"},"de":42}}'
    )
    out = run_extract(spark, [doc])
    plain = [r for r in out["object_labels"] if r["id"] == "Q110"]
    assert plain == [{"id": "Q110", "lang": "en", "native_order": None, "label": "ok"}]


def test_wiki_time_edge_cases():
    k = wiki_time_key_py
    assert k("+0000-00-00T00:00:00Z") is not None  # year 0, month/day 00
    assert k("-0500-01-01T00:00:00Z") < k("+0000-00-00T00:00:00Z")
    assert k("+2019-01-01T00:00:00Z") < k("+2019-06-01T00:00:00Z")
    # timezone carry: +2019-01-01T00:00 with tz=-60 -> 2018-12-31T23:00
    assert k("+2019-01-01T00:00:00Z", -60) < k("+2019-01-01T00:00:00Z")
    assert k("+2019-01-01T00:30:00Z", 45) > k("+2019-01-01T00:30:00Z")
    assert k("not a time") is None
    assert k("+999999999999999999-01-01T00:00:00Z") is None  # i32-overflow parity


def test_wiki_time_spark_matches_python(spark):
    from pyspark.sql import functions as F

    from geo_db_spark.functions.wiki_time import wiki_time_key

    cases = [
        ("+2019-12-31T23:59:59Z", 0),
        ("+0000-00-00T00:00:00Z", 0),
        ("-0500-06-15T12:00:00Z", 0),
        ("+2019-01-01T00:00:00Z", -60),
        ("+2019-01-01T00:30:00Z", 45),
        ("+1990-10-03T00:00:00Z", 720),
        ("garbage", 0),
    ]
    df = spark.createDataFrame(cases, "t string, tz int")
    got = df.select(wiki_time_key(F.col("t"), F.col("tz")).alias("k")).collect()
    want = [wiki_time_key_py(t, tz) for t, tz in cases]
    assert [r["k"] for r in got] == want


def test_rule_trace_per_entity_flags(spark):
    """A8 parity (src/wiki_data_line.rs:421-426, src/main.rs:276-281):
    explain-mode must say WHICH gate failed per entity. One fixture per
    failing rule."""
    from geo_db_spark.extract import rule_trace

    docs = [
        # replaced (B1) AND would otherwise be a TE
        entity("QREP", {"P1366": [entity_stmt("QN")], "P31": [entity_stmt("QTE")]}),
        # dissolved (B1)
        entity("QDIS", {"P576": [entity_stmt("QD")]}),
        # TE but excluded -> no territorial route
        entity("QEXCD", {"P31": [entity_stmt("QTE"), entity_stmt("QEXC")]}),
        # settlement excluded via excluded_settlements only
        entity("QEXS", {"P31": [entity_stmt("QCITY"), entity_stmt("QEXCS")]}),
        # settlement missing P17 (B6 side-output)
        entity("QNOP17", {"P31": [entity_stmt("QCITY")]}),
        # clean TE + country branch
        entity("QOK", {"P31": [entity_stmt("QTE")], "P297": [stmt("de")]}),
        # language entity
        entity("QLG", {"P31": [entity_stmt("QLANG")]}),
        # class membership denied by P1366 qualifier on the P31 stmt
        entity("QDENY", {"P31": [entity_stmt("QTE", {"P1366": [{"snaktype": "value"}]})]}),
    ]

    df = spark.createDataFrame([(d,) for d in docs], "value string")
    tags = class_sets_from_dict(spark, CLASS_SETS)
    ents = parse_entity_lines(df)
    rows = {r["id"]: r.asDict() for r in rule_trace(ents, tags, NOW_KEY_DEFAULT).collect()}

    assert rows["QREP"]["is_replaced"] and not rows["QREP"]["is_dissolved"]
    assert rows["QREP"]["is_territorial_entities"]  # flag shown even though defunct
    assert rows["QDIS"]["is_dissolved"]
    assert rows["QEXCD"]["is_territorial_entities"] and rows["QEXCD"]["is_excluded"]
    assert not rows["QEXCD"]["routes_territorial"]
    assert rows["QEXS"]["is_human_settlements"] and rows["QEXS"]["is_excluded_settlements"]
    assert not rows["QEXS"]["routes_settlement"]
    assert rows["QNOP17"]["routes_settlement"] and rows["QNOP17"]["missing_p17"]
    assert rows["QOK"]["routes_territorial"] and rows["QOK"]["routes_country"]
    assert rows["QLG"]["routes_language"]
    assert not rows["QDENY"]["is_territorial_entities"]  # qualifier denies membership


def test_explain_entity_includes_rules(spark):
    from geo_db_spark.extract import explain_entity

    tags = class_sets_from_dict(spark, CLASS_SETS)
    out = explain_entity(spark, entity("QEXCD", {"P31": [entity_stmt("QEXC")]}), tags)
    assert "rules" in out and len(out["rules"]) == 1
    r = out["rules"][0].asDict()
    assert r["is_excluded"] and not r["routes_territorial"]
