"""Extraction front-end rules as DuckDB-oracle-checked queries.

Round-1 gap (VERDICT "Next round" #2): rules B1-C12 ran only under
pytest goldens — no CORRECTNESS row could catch a regression. Here the
sharpest-edged rules run against the driver's DuckDB gate: a fixture
entity dump (JSON strings embedded in this module) is fed through the
REAL extraction pipeline on the Spark side, while the oracle re-derives
the same rows with DuckDB's JSON functions from the same embedded JSON.

Covered rules and their reference sources:
- x1_defunct_filter      B1  src/wiki_data_line.rs:353-374
- x2_country_priority    C9  src/wiki_data_line.rs:135-163 (+B2 temporal)
- x3_population_argmax   C10 src/wiki_data_line.rs:165-240 (>= tie,
                             B7 qualifier excl., F5 quantity parse)
- x4_native_labels       C8  src/wiki_data_line.rs:286-331
- x5_time_keys           F6  src/wiki_time.rs:99-137 (year 0, negative,
                             month/day 00, i32 guard, tz offset)
- x6_country_languages   C3  src/wiki_data_line.rs:392-407 (index over
                             KEPT entries; no snaktype guard — the
                             faithful asymmetry vs the TE branch)
- x7_te_languages_fallback C5 src/wiki_data_line.rs:58-85 (array-level
                             P37-else-P2936 coalesce; empty P37 wins)
- x8_class_membership    B4  src/wiki_data_line.rs:464-497 (active P31,
                             no P1366 qualifier, set join -> flags)
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from geo_db_spark.functions.wiki_time import NOW_KEY_DEFAULT
from geo_db_spark.session import tune
from geo_db_spark.sources.wikidata import parse_entity_lines

# ------------------------------------------------------------ fixtures


def _q(qid: str, quals: dict | None = None, snaktype: str = "value") -> dict:
    s: dict = {"mainsnak": {"snaktype": snaktype, "datavalue": {"value": {"id": qid}}}}
    if quals is not None:
        s["qualifiers"] = quals
    return s


def _t(time: str, tz: int = 0, snaktype: str = "value") -> dict:
    return {"snaktype": snaktype, "datavalue": {"value": {"time": time, "timezone": tz}}}


def _pop(amount: str, unit: str = "1", quals: dict | None = None) -> dict:
    s: dict = {
        "mainsnak": {"snaktype": "value", "datavalue": {"value": {"amount": amount, "unit": unit}}}
    }
    if quals is not None:
        s["qualifiers"] = quals
    return s


def _mono(lang, text) -> dict:
    v: dict = {}
    if lang is not None:
        v["language"] = lang
    if text is not None:
        v["text"] = text
    return {"mainsnak": {"snaktype": "value", "datavalue": {"value": v}}}


_PAST = "+2000-01-01T00:00:00Z"
_FUTURE = "+2030-01-01T00:00:00Z"
_FLAG = {"snaktype": "value", "datavalue": {"value": {"id": "QX"}}}

# B1: survivors are X1, X3, X5 (see each comment)
_DEFUNCT_ENTITIES = {
    "X1": {},  # no P1366 / P576 -> survives
    "X2": {"P1366": [_q("QN")]},  # replaced, no P518 -> dropped
    "X3": {"P1366": [_q("QN"), _q("QM", {"P518": [_FLAG]})]},  # P518 saves it
    "X4": {"P576": [_q("QD")]},  # dissolved -> dropped
    "X5": {"P1366": []},  # empty array -> survives (size>0 false)
    "X6": {"P1366": [_q("QN", {"P518": [_FLAG]})], "P576": [_q("QD")]},  # dissolved anyway
}

# C9: raw-array index, active filter, dated-vs-undated priority
_PRIORITY_ENTITIES = {
    "Y1": {
        "P17": [
            _q("QA", {"P580": [_t(_PAST)]}),            # dated active  -> prio 0
            _q("QB"),                                    # undated       -> prio 1001
            _q("QC", {"P582": [_t(_PAST)]}),             # ended         -> skipped
            _q("QD", {"P580": [_t(_FUTURE)]}),           # not started   -> skipped
            _q("QE", {"P580": [_t("garbage")]}),         # malformed=active, dated -> prio 4
            _q("QF", {"P582": [_t(_PAST, snaktype="somevalue")]}),  # non-value snak=active -> 1005
        ]
    },
    "Y2": {
        "P17": [
            _q("QG", {"P582": [_t(_FUTURE)]}),           # ends later -> active, undated... P582 only -> prio 1000
        ]
    },
}

# C10 + B7 + F5: argmax by (P585 key, raw index) with `>=` tie
_POPULATION_ENTITIES = {
    "Z1": {
        "P1082": [
            _pop("+1,000", quals={"P585": [_t("+2010-01-01T00:00:00Z")]}),
            _pop("2000", quals={"P585": [_t("+2020-01-01T00:00:00Z")]}),
            _pop("3000", quals={"P585": [_t("+2020-01-01T00:00:00Z")]}),  # tie: later wins
            _pop("9999", quals={"P585": [_t("+2021-01-01T00:00:00Z")], "P518": [_FLAG]}),
            _pop("8888", unit="km2", quals={"P585": [_t("+2022-01-01T00:00:00Z")]}),
            _pop("7777"),  # no P585 -> never wins
            _pop("6666", quals={"P585": [_t("+2023-01-01T00:00:00Z", snaktype="somevalue")]}),
        ]
    },
    "Z2": {"P1082": [_pop("1.5", quals={"P585": [_t("+2015-01-01T00:00:00Z")]})]},  # -> 15 (F5)
    "Z3": {
        "P1082": [
            _pop("500", quals={"P585": [_t("+2001-01-01T00:00:00Z")], "P1539": [_FLAG]}),
            _pop("600", quals={"P585": [_t("garbage")]}),  # unparseable time -> skipped
        ]
    },  # no qualifying reading -> no row
}

# C8: P1705-if-key-exists else active P1448; running order over kept
_NATIVE_LABEL_ENTITIES = {
    "N1": {
        "P1705": [_mono("aa", "Alpha"), _mono("bb", "Beta")],
        "P1448": [_mono("cc", "Never")],
    },
    "N2": {"P1705": [], "P1448": [_mono("cc", "NoFallback")]},  # empty P1705 wins: no rows
    "N3": {
        "P1448": [
            _mono("dd", "Old", ) | {"qualifiers": {"P582": [_t(_PAST)]}},  # ended -> skipped
            _mono("ee", None),  # invalid (no text) -> skipped
            _mono("ff", "Kept0"),
            _mono("gg", "Kept1"),
        ]
    },
}


def _lines(ents: dict[str, dict]) -> list[str]:
    return [json.dumps({"id": eid, "claims": claims}) for eid, claims in ents.items()]


def _entities_df(spark: SparkSession, ents: dict[str, dict]) -> DataFrame:
    rows = [(line,) for line in _lines(ents)]
    return parse_entity_lines(spark.createDataFrame(rows, "value string"))


def _values_cte(ents: dict[str, dict]) -> str:
    """VALUES(id, json) rows with the SAME JSON the Spark side parses."""
    rows = ",\n    ".join(
        "('" + eid + "', '" + json.dumps({"id": eid, "claims": claims}).replace("'", "''") + "')"
        for eid, claims in ents.items()
    )
    return f"entities(id, j) AS (\n  SELECT * FROM (VALUES\n    {rows}\n  ) t(id, j)\n)"


# ------------------------------------------------- DuckDB expression kit

_TIME_RE_SQL = r"^([+-]?\d+)-(\d{2})-(\d{2})T(\d{2}):(\d{2}):(\d{2})Z$"


def _tkey_sql(t: str, tz: str = "NULL") -> str:
    """The F6 linear time key (functions/wiki_time.py docstring) in DuckDB
    SQL: NULL unless the string matches the shape and the year fits i32."""
    g = lambda n: f"TRY_CAST(regexp_extract({t}, '{_TIME_RE_SQL}', {n}) AS BIGINT)"  # noqa: E731
    year, mo, dy, hh, mi, ss = (g(n) for n in range(1, 7))
    key = (
        f"(((({year}*12 + greatest({mo}-1, 0))*31 + greatest({dy}-1, 0))*24 + {hh})*60 "
        f"+ {mi})*60 + {ss} + coalesce(TRY_CAST({tz} AS BIGINT), 0)*60"
    )
    return (
        f"CASE WHEN regexp_matches({t}, '{_TIME_RE_SQL}') "
        f"AND abs({year}) <= 2147483647 THEN {key} ELSE NULL END"
    )


def _qual_key_sql(stmt: str, prop: str) -> str:
    """Time key of qualifier ``prop[0]`` of a statement JSON expression;
    NULL when absent / non-'value' snaktype / unparseable."""
    q0 = f"json_extract({stmt}, '$.qualifiers.{prop}[0]')"
    t = f"json_extract_string({q0}, '$.datavalue.value.time')"
    tz = f"json_extract_string({q0}, '$.datavalue.value.timezone')"
    return (
        f"CASE WHEN {q0} IS NOT NULL "
        f"AND json_extract_string({q0}, '$.snaktype') = 'value' "
        f"THEN {_tkey_sql(t, tz)} ELSE NULL END"
    )


def _active_sql(stmt: str) -> str:
    """B2 (src/wiki_time.rs:185-201): active unless P582[0] ended before
    now or P580[0] starts after now; everything missing/malformed counts
    active. ``stmt`` is a JSON statement expression."""
    ek = _qual_key_sql(stmt, "P582")
    sk = _qual_key_sql(stmt, "P580")
    return (
        f"(json_extract({stmt}, '$.qualifiers') IS NULL OR NOT ("
        f"coalesce({ek} < {NOW_KEY_DEFAULT}, FALSE) "
        f"OR coalesce({sk} > {NOW_KEY_DEFAULT}, FALSE)))"
    )


# ------------------------------------------------------------- queries


def x1_defunct_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B1 through the real pipeline: surviving entity ids."""
    tune(spark)
    from geo_db_spark.extract import filter_defunct

    return filter_defunct(_entities_df(spark, _DEFUNCT_ENTITIES)).select("id")


ORACLE_X1 = f"""
WITH {_values_cte(_DEFUNCT_ENTITIES)}
SELECT id FROM entities e
WHERE NOT (
    coalesce(json_array_length(e.j, '$.claims.P1366'), 0) > 0
    AND NOT coalesce(
      len(list_filter(CAST(json_extract(e.j, '$.claims.P1366') AS JSON[]),
          s -> coalesce(json_array_length(s, '$.qualifiers.P518'), 0) > 0)) > 0,
      FALSE)
  )
  AND coalesce(json_array_length(e.j, '$.claims.P576'), 0) = 0
"""


def _explode_sql(prop: str) -> str:
    """One row per statement of ``claims.<prop>``: (id, pos, stmt) —
    DuckDB's zipped-unnest idiom (no json_each / lateral range in 1.0)."""
    arr = f"CAST(json_extract(e.j, '$.claims.{prop}') AS JSON[])"
    return (
        f"SELECT e.id, unnest(range(len({arr}))) AS pos, unnest({arr}) AS stmt\n"
        f"  FROM entities e"
    )


def x2_country_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C9 through the real pipeline: (city, priority, country)."""
    tune(spark)
    from geo_db_spark.extract import city_countries

    return city_countries(_entities_df(spark, _PRIORITY_ENTITIES))


ORACLE_X2 = f"""
WITH {_values_cte(_PRIORITY_ENTITIES)},
exploded AS (
  {_explode_sql('P17')}
)
SELECT id AS city,
       CAST(CASE WHEN json_extract(stmt, '$.qualifiers.P580[0]') IS NOT NULL
            THEN pos ELSE pos + 1000 END AS INT) AS priority,
       json_extract_string(stmt, '$.mainsnak.datavalue.value.id') AS country
FROM exploded
WHERE {_active_sql('stmt')}
  AND json_extract_string(stmt, '$.mainsnak.datavalue.value.id') IS NOT NULL
"""


def x3_population_argmax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C10 through the real pipeline: (id, population)."""
    tune(spark)
    from geo_db_spark.extract import population

    return population(_entities_df(spark, _POPULATION_ENTITIES))


def _x3_oracle() -> str:
    p585 = "json_extract(stmt, '$.qualifiers.P585[0]')"
    tkey = _tkey_sql(
        f"json_extract_string({p585}, '$.datavalue.value.time')",
        f"json_extract_string({p585}, '$.datavalue.value.timezone')",
    )
    cleaned = "regexp_replace(json_extract_string(stmt, '$.mainsnak.datavalue.value.amount'), '[\\s,.+]+', '', 'g')"
    return f"""
WITH {_values_cte(_POPULATION_ENTITIES)},
exploded AS (
  {_explode_sql('P1082')}
),
cand AS (
  SELECT id, pos,
         CASE WHEN regexp_matches({cleaned}, '^\\d+$')
              THEN TRY_CAST({cleaned} AS BIGINT) END AS population,
         {tkey} AS tkey
  FROM exploded
  WHERE {p585} IS NOT NULL
    AND json_extract_string({p585}, '$.snaktype') = 'value'
    AND json_extract(stmt, '$.qualifiers.P518[0]') IS NULL
    AND json_extract(stmt, '$.qualifiers.P1539[0]') IS NULL
    AND json_extract(stmt, '$.qualifiers.P1540[0]') IS NULL
    AND json_extract_string(stmt, '$.mainsnak.datavalue.value.unit') = '1'
)
SELECT id, population
FROM cand
WHERE tkey IS NOT NULL AND population IS NOT NULL
QUALIFY row_number() OVER (PARTITION BY id ORDER BY tkey DESC, pos DESC) = 1
"""


def x4_native_labels(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C8 through the real pipeline: (id, lang, native_order, label)."""
    tune(spark)
    from geo_db_spark.extract import native_labels

    return native_labels(_entities_df(spark, _NATIVE_LABEL_ENTITIES))


def _x4_oracle() -> str:
    lang = "json_extract_string(stmt, '$.mainsnak.datavalue.value.language')"
    text = "json_extract_string(stmt, '$.mainsnak.datavalue.value.text')"
    return f"""
WITH {_values_cte(_NATIVE_LABEL_ENTITIES)},
p1705 AS (
  SELECT * FROM ({_explode_sql('P1705')})
  WHERE {lang} IS NOT NULL AND {text} IS NOT NULL
),
p1448 AS (
  SELECT * FROM ({_explode_sql('P1448')})
  WHERE {lang} IS NOT NULL AND {text} IS NOT NULL
    AND {_active_sql('stmt')}
),
chosen AS (
  SELECT * FROM p1705
  UNION ALL
  SELECT p.* FROM p1448 p
  WHERE json_extract(
      (SELECT e2.j FROM entities e2 WHERE e2.id = p.id), '$.claims.P1705') IS NULL
)
SELECT id, {lang} AS lang,
       CAST(row_number() OVER (PARTITION BY id ORDER BY pos) - 1 AS INT) AS native_order,
       {text} AS label
FROM chosen
"""


# F6 edge cases: (tid, time string, tz minutes)
_TIME_FIXTURES = [
    (1, "+2020-03-15T10:30:00Z", 0),
    (2, "+2020-00-00T00:00:00Z", 0),      # month/day 00 -> saturating -1
    (3, "+0000-01-01T00:00:00Z", 0),      # year zero
    (4, "-0500-06-15T12:00:00Z", 0),      # negative year
    (5, "+2020-03-15T10:30:00Z", 120),    # tz offset adds 120*60
    (6, "+2020-03-15T10:30:00Z", -30),
    (7, "+99999999999999999999-01-01T00:00:00Z", 0),  # > i32 -> NULL
    (8, "2020-03-15T10:30:00Z", 0),       # signless: valid
    (9, "garbage", 0),                    # -> NULL
    (10, "+2020-3-15T10:30:00Z", 0),      # 1-digit month -> NULL
    (11, "+2147483647-01-01T00:00:00Z", 0),  # i32 max: valid
    (12, "+2147483648-01-01T00:00:00Z", 0),  # i32 max + 1 -> NULL
    (13, "+1999-12-31T23:59:59Z", 0),
]


def x5_time_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F6: the sortable linear key over the edge-case fixtures."""
    tune(spark)
    from geo_db_spark.functions.wiki_time import wiki_time_key

    df = spark.createDataFrame(_TIME_FIXTURES, "tid int, t string, tz int")
    return df.select("tid", wiki_time_key(F.col("t"), F.col("tz")).alias("tkey"))


def _x5_oracle() -> str:
    rows = ",\n    ".join(f"({tid}, '{t}', {tz})" for tid, t, tz in _TIME_FIXTURES)
    return f"""
WITH fixtures(tid, t, tz) AS (
  SELECT * FROM (VALUES
    {rows}
  ) v(tid, t, tz)
)
SELECT tid, {_tkey_sql('t', 'tz')} AS tkey FROM fixtures
"""


# C3 vs C5 asymmetry fixtures: country branch has NO snaktype guard but
# requires a P297 key; TE branch coalesces P37-else-P2936 at ARRAY level
# and guards snaktype.
_C3_ENTITIES = {
    "L1": {
        "P297": [_q("AA")],
        "P37": [
            _q("QL0"),                                 # kept -> index 0
            _q("QLX", {"P582": [_t(_PAST)]}),          # ended -> skipped
            {"mainsnak": {"snaktype": "somevalue"}},   # no id -> skipped
            _q("QLY", {"P580": [_t(_FUTURE)]}),        # not started -> skipped
            _q("QL1"),                                 # kept -> index 1
        ],
    },
    "L2": {"P37": [_q("QL9")]},  # no P297 key -> country branch skips entirely
}

_C5_ENTITIES = {
    "W1": {"P37": [_q("QA")], "P2936": [_q("QB")]},   # P37 wins
    "W2": {"P2936": [_q("QC"), _q("QD")]},            # fallback path
    "W3": {"P37": [], "P2936": [_q("QE")]},           # EMPTY P37 still wins: no rows
    "W4": {
        "P2936": [
            {"mainsnak": {"snaktype": "somevalue"}},   # snaktype guard -> skipped
            _q("QF"),                                  # kept -> index 0
        ]
    },
}

# B4 fixtures: membership needs an ACTIVE P31 without a P1366 qualifier
_B4_CLASS_SETS = {
    "territorial_entities": ["QT"],
    "human_settlements": ["QS"],
    "excluded": [],
    "excluded_settlements": [],
    "second_level_admin_div": [],
    "languages": [],
}
_B4_ENTITIES = {
    "M1": {"P31": [_q("QT")]},                          # TE flag
    "M2": {"P31": [_q("QT", {"P1366": [_FLAG]})]},      # replaced claim -> no flag
    "M3": {"P31": [_q("QT", {"P582": [_t(_PAST)]})]},   # ended -> no flag
    "M4": {"P31": [_q("QU")]},                          # unknown class -> no flag
    "M5": {"P31": [_q("QS"), _q("QT")]},                # both flags
    "M6": {},                                            # no P31 at all
}


def x6_country_languages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C3 through the real pipeline: running lang_index over KEPT entries
    (posexplode AFTER the filter), P297-keyed entities only, no snaktype
    guard in this branch."""
    tune(spark)
    from geo_db_spark.extract import country_object_languages

    return country_object_languages(_entities_df(spark, _C3_ENTITIES))


def _x6_oracle() -> str:
    sid = "json_extract_string(stmt, '$.mainsnak.datavalue.value.id')"
    return f"""
WITH {_values_cte(_C3_ENTITIES)},
exploded AS (
  {_explode_sql('P37')}
),
kept AS (
  SELECT id, pos, {sid} AS lang_id
  FROM exploded
  WHERE json_extract((SELECT e2.j FROM entities e2 WHERE e2.id = exploded.id),
                     '$.claims.P297') IS NOT NULL
    AND {_active_sql('stmt')}
    AND {sid} IS NOT NULL
)
SELECT id, lang_id,
       CAST(row_number() OVER (PARTITION BY id ORDER BY pos) - 1 AS INT) AS lang_index
FROM kept
"""


def x7_te_languages_fallback(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C5 through the real pipeline: array-level P37-else-P2936 coalesce
    (an EMPTY P37 still wins), snaktype guard, running index."""
    tune(spark)
    from geo_db_spark.extract import te_object_languages

    return te_object_languages(_entities_df(spark, _C5_ENTITIES))


def _x7_oracle() -> str:
    sid = "json_extract_string(stmt, '$.mainsnak.datavalue.value.id')"
    arr = (
        "coalesce(CAST(json_extract(e.j, '$.claims.P37') AS JSON[]), "
        "CAST(json_extract(e.j, '$.claims.P2936') AS JSON[]))"
    )
    return f"""
WITH {_values_cte(_C5_ENTITIES)},
exploded AS (
  SELECT e.id, unnest(range(len({arr}))) AS pos, unnest({arr}) AS stmt
  FROM entities e
),
kept AS (
  SELECT id, pos, {sid} AS lang_id
  FROM exploded
  WHERE json_extract_string(stmt, '$.mainsnak.snaktype') = 'value'
    AND {_active_sql('stmt')}
    AND {sid} IS NOT NULL
)
SELECT id, lang_id,
       CAST(row_number() OVER (PARTITION BY id ORDER BY pos) - 1 AS INT) AS lang_index
FROM kept
"""


def x8_class_membership(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B4 through the real pipeline: explode P31 -> active filter ->
    no-P1366-qualifier -> broadcast set join -> per-entity flags."""
    tune(spark)
    from geo_db_spark.extract import class_sets_from_dict, with_class_flags

    ents = _entities_df(spark, _B4_ENTITIES)
    tags = class_sets_from_dict(spark, _B4_CLASS_SETS)
    return with_class_flags(ents, tags).select(
        "id",
        F.col("is_territorial_entities").alias("is_te"),
        F.col("is_human_settlements").alias("is_settlement"),
    )


def _x8_oracle() -> str:
    sid = "json_extract_string(stmt, '$.mainsnak.datavalue.value.id')"
    return f"""
WITH {_values_cte(_B4_ENTITIES)},
exploded AS (
  {_explode_sql('P31')}
),
kept AS (
  SELECT id, {sid} AS class_id
  FROM exploded
  WHERE {sid} IS NOT NULL
    AND {_active_sql('stmt')}
    AND json_extract(stmt, '$.qualifiers.P1366[0]') IS NULL
)
SELECT e.id,
       coalesce(bool_or(k.class_id = 'QT'), FALSE) AS is_te,
       coalesce(bool_or(k.class_id = 'QS'), FALSE) AS is_settlement
FROM entities e LEFT JOIN kept k ON e.id = k.id
GROUP BY e.id
"""


QUERIES = {
    "x6_country_languages": x6_country_languages,
    "x7_te_languages_fallback": x7_te_languages_fallback,
    "x8_class_membership": x8_class_membership,
    "x1_defunct_filter": x1_defunct_filter,
    "x2_country_priority": x2_country_priority,
    "x3_population_argmax": x3_population_argmax,
    "x4_native_labels": x4_native_labels,
    "x5_time_keys": x5_time_keys,
}

ORACLES = {
    "x6_country_languages": _x6_oracle(),
    "x7_te_languages_fallback": _x7_oracle(),
    "x8_class_membership": _x8_oracle(),
    "x1_defunct_filter": ORACLE_X1,
    "x2_country_priority": ORACLE_X2,
    "x3_population_argmax": _x3_oracle(),
    "x4_native_labels": _x4_oracle(),
    "x5_time_keys": _x5_oracle(),
}


# B5/B6 routing fixtures: every route and every defunct edge in one dump
_B5_CLASS_SETS = {
    "territorial_entities": ["QT"],
    "human_settlements": ["QS"],
    "excluded": ["QX"],
    "excluded_settlements": ["QXS"],
    "second_level_admin_div": [],
    "languages": ["QL"],
}

_B5_ENTITIES = {
    "R01": {"P31": [_q("QS")], "P17": [_q("QC")]},  # settlement+P17 -> city
    "R02": {"P31": [_q("QS")]},                      # settlement, no P17 -> missing_p17
    "R03": {"P31": [_q("QT")]},                      # te route
    "R04": {"P31": [_q("QS")], "P17": [_q("QC")], "P1366": [_q("QNEW")]},  # replaced -> dropped
    "R05": {"P31": [_q("QS"), _q("QX")], "P17": [_q("QC")]},   # excluded -> no routes
    "R06": {
        "P31": [_q("QL")],
        "P424": [{"mainsnak": {"snaktype": "value", "datavalue": {"value": "eo"}}}],
    },                                                # language route
    "R07": {},                                        # routes nowhere
    # replaced-by WITH P518 qualifier -> the defunct exception, still a city
    "R08": {"P31": [_q("QS")], "P17": [_q("QC")], "P1366": [_q("QNEW", {"P518": [_FLAG]})]},
    "R09": {"P31": [_q("QT")], "P576": [_q("QANY")]},  # dissolved -> dropped
    "R10": {"P31": [_q("QS"), _q("QXS")], "P17": [_q("QC")]},  # excluded settlement
    "R11": {"P31": [_q("QT"), _q("QS")], "P17": [_q("QC")]},   # te AND city
}


def x11_routing_side_outputs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B5+B6+B1 through the REAL extract_all: one row per (entity, route
    membership) across the cities / missing_p17 / territorial_entities /
    languages outputs — the routing predicate, the missing-P17 side
    output, and both defunct edges (plain P1366 drop vs the P518
    exception) checked as one driver-gated query."""
    tune(spark)
    from geo_db_spark.extract import class_sets_from_dict, extract_all

    outs = extract_all(
        _entities_df(spark, _B5_ENTITIES),
        class_sets_from_dict(spark, _B5_CLASS_SETS),
    )
    return (
        outs["cities"].select("id", F.lit("city").alias("route"))
        .unionByName(outs["missing_p17"].select("id", F.lit("missing_p17").alias("route")))
        .unionByName(outs["territorial_entities"].select("id", F.lit("te").alias("route")))
        .unionByName(outs["languages"].select("id", F.lit("language").alias("route")))
        .orderBy("id", "route")
    )


def _x11_oracle() -> str:
    sid = "json_extract_string(stmt, '$.mainsnak.datavalue.value.id')"
    return f"""
WITH {_values_cte(_B5_ENTITIES)},
p1366 AS (
  {_explode_sql('P1366')}
),
defunct AS (
  SELECT e.id FROM entities e
  WHERE (json_array_length(json_extract(e.j, '$.claims.P1366')) > 0
         AND NOT EXISTS (SELECT 1 FROM p1366 x WHERE x.id = e.id
                         AND json_extract(x.stmt, '$.qualifiers.P518[0]') IS NOT NULL))
     OR json_array_length(json_extract(e.j, '$.claims.P576')) > 0
),
p31 AS (
  {_explode_sql('P31')}
),
kept AS (
  SELECT id, {sid} AS class_id FROM p31
  WHERE {sid} IS NOT NULL AND {_active_sql('stmt')}
    AND json_extract(stmt, '$.qualifiers.P1366[0]') IS NULL
),
flags AS (
  SELECT e.id,
         coalesce(bool_or(k.class_id = 'QT'), FALSE) AS is_te,
         coalesce(bool_or(k.class_id = 'QS'), FALSE) AS is_s,
         coalesce(bool_or(k.class_id = 'QX'), FALSE) AS is_x,
         coalesce(bool_or(k.class_id = 'QXS'), FALSE) AS is_xs,
         coalesce(bool_or(k.class_id = 'QL'), FALSE) AS is_l,
         bool_or(json_extract(e.j, '$.claims.P17') IS NOT NULL) AS has_p17,
         bool_or(json_extract(e.j, '$.claims.P424[0].mainsnak.datavalue.value') IS NOT NULL) AS has_code
  FROM entities e LEFT JOIN kept k ON e.id = k.id
  WHERE e.id NOT IN (SELECT id FROM defunct)
  GROUP BY e.id
)
SELECT id, route FROM (
  SELECT id, 'city' AS route FROM flags WHERE is_s AND NOT is_x AND NOT is_xs AND has_p17
  UNION ALL
  SELECT id, 'missing_p17' FROM flags WHERE is_s AND NOT is_x AND NOT is_xs AND NOT has_p17
  UNION ALL
  SELECT id, 'te' FROM flags WHERE is_te AND NOT is_x
  UNION ALL
  SELECT id, 'language' FROM flags WHERE is_l AND has_code
)
ORDER BY id, route
"""


QUERIES["x11_routing_side_outputs"] = x11_routing_side_outputs
ORACLES["x11_routing_side_outputs"] = _x11_oracle()


# C7 fixtures: labels maps with valid, partial, and malformed values
_C7_ENTITIES_LABELS = {
    "L1": {"en": {"language": "en", "value": "Alpha"}, "de": {"language": "de", "value": "Beta"}},
    "L2": {"eo": {"language": "eo", "value": "Gamo"}},
    "L3": {"en": {"language": "en"}},               # no value -> dropped
    "L4": {"fr": {"value": "SansLangue"}},          # no language -> dropped
    "L5": {},                                        # empty map -> no rows
    "L6": {"zh-hans": {"language": "zh-hans", "value": "Han"}},  # hyphenated code
}
_C7_LABEL_LANGS = sorted({k for v in _C7_ENTITIES_LABELS.values() for k in v})


def x12_label_explosion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C7 through the real pipeline: every labels-map value with valid
    language+value -> (id, lang, label); partial entries silently
    dropped (src/wiki_data_line.rs:87-103)."""
    tune(spark)
    from geo_db_spark.extract import plain_labels

    rows = [
        (json.dumps({"id": eid, "labels": labels, "claims": {}}),)
        for eid, labels in _C7_ENTITIES_LABELS.items()
    ]
    ents = parse_entity_lines(spark.createDataFrame(rows, "value string"))
    return plain_labels(ents).select("id", "lang", "label").orderBy("id", "lang")


def _x12_oracle() -> str:
    rows = ",\n    ".join(
        "('" + eid + "', '" + json.dumps(labels).replace("'", "''") + "')"
        for eid, labels in _C7_ENTITIES_LABELS.items()
    )
    langs = ", ".join(f"'{l}'" for l in _C7_LABEL_LANGS)
    return f"""
WITH entities(id, j) AS (SELECT * FROM (VALUES
    {rows}
  ) t(id, j)),
ex AS (
  SELECT e.id,
         json_extract_string(e.j, '$."' || k.k || '".language') AS lang,
         json_extract_string(e.j, '$."' || k.k || '".value') AS label
  FROM entities e CROSS JOIN (SELECT unnest([{langs}]) AS k) k
  WHERE json_extract(e.j, '$."' || k.k || '"') IS NOT NULL
)
SELECT id, lang, label FROM ex
WHERE lang IS NOT NULL AND label IS NOT NULL
ORDER BY id, lang
"""


QUERIES["x12_label_explosion"] = x12_label_explosion
ORACLES["x12_label_explosion"] = _x12_oracle()


# C4/C6 fixtures: is_2nd iso rule (raw P300[0], no guards) + P131 edges
# (active + id-value guard) on one dump
_C4_CLASS_SETS = {
    "territorial_entities": ["QT"],
    "human_settlements": [],
    "excluded": [],
    "excluded_settlements": [],
    "second_level_admin_div": ["Q2"],
    "languages": [],
}

_C4_ENTITIES = {
    # 2nd-level with iso: P300[0] taken RAW (even inactive/ended)
    "T1": {"P31": [_q("QT"), _q("Q2")],
           "P300": [{"mainsnak": {"snaktype": "value", "datavalue": {"value": "de-by"}},
                     "qualifiers": {"P582": [_t(_PAST)]}}],
           "P131": [_q("P_A")]},
    # 2nd-level without P300 -> iso NULL
    "T2": {"P31": [_q("QT"), _q("Q2")], "P131": [_q("P_A"), _q("P_B")]},
    # NOT 2nd-level: iso suppressed even though P300 present
    "T3": {"P31": [_q("QT")],
           "P300": [{"mainsnak": {"snaktype": "value", "datavalue": {"value": "fr-01"}}}]},
    # edges: ended P131 dropped, novalue dropped, active kept
    "T4": {"P31": [_q("QT")],
           "P131": [_q("P_OLD", {"P582": [_t(_PAST)]}), _q("P_NEW"),
                    {"mainsnak": {"snaktype": "novalue"}}]},
}


def x13_te_extraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4+C6 through the REAL pipeline: territorial_entities_out (is_2nd
    flag, RAW P300[0] iso only when 2nd-level) unioned with parent_edges
    (active P131 with a value id) as tagged rows."""
    tune(spark)
    from geo_db_spark.extract import (
        class_sets_from_dict,
        parent_edges,
        territorial_entities_out,
        with_class_flags,
    )

    ents = with_class_flags(
        _entities_df(spark, _C4_ENTITIES), class_sets_from_dict(spark, _C4_CLASS_SETS)
    )
    te = territorial_entities_out(ents).select(
        "id",
        F.lit("te").alias("kind"),
        F.col("is_2nd").cast("int").cast("string").alias("v1"),
        F.col("iso").alias("v2"),
    )
    edges = parent_edges(ents).select(
        "id", F.lit("edge").alias("kind"), F.col("parent").alias("v1"),
        F.lit(None).cast("string").alias("v2"),
    )
    return te.unionByName(edges).orderBy("id", "kind", "v1")


def _x13_oracle() -> str:
    sid = "json_extract_string(stmt, '$.mainsnak.datavalue.value.id')"
    return f"""
WITH {_values_cte(_C4_ENTITIES)},
p31 AS (
  {_explode_sql('P31')}
),
kept AS (
  SELECT id, {sid} AS class_id FROM p31
  WHERE {sid} IS NOT NULL AND {_active_sql('stmt')}
    AND json_extract(stmt, '$.qualifiers.P1366[0]') IS NULL
),
flags AS (
  SELECT e.id,
         coalesce(bool_or(k.class_id = 'Q2'), FALSE) AS is_2nd,
         json_extract_string(e.j, '$.claims.P300[0].mainsnak.datavalue.value') AS iso0
  FROM entities e LEFT JOIN kept k ON e.id = k.id
  GROUP BY e.id, iso0
),
te AS (
  SELECT id, 'te' AS kind, CAST(CAST(is_2nd AS INT) AS VARCHAR) AS v1,
         CASE WHEN is_2nd THEN iso0 END AS v2
  FROM flags
),
p131 AS (
  {_explode_sql('P131')}
),
edges AS (
  SELECT id, 'edge' AS kind, {sid} AS v1, NULL AS v2 FROM p131
  WHERE {sid} IS NOT NULL AND {_active_sql('stmt')}
)
SELECT id, kind, v1, v2 FROM (SELECT * FROM te UNION ALL SELECT * FROM edges)
ORDER BY id, kind, v1
"""


QUERIES["x13_te_extraction"] = x13_te_extraction
ORACLES["x13_te_extraction"] = _x13_oracle()


# C11/C12 fixtures: coordinate guards + first-P424 language code
_C11_ENTITIES = {
    "G1": {"P625": [{"mainsnak": {"snaktype": "value",
                     "datavalue": {"value": {"latitude": 48.1375, "longitude": 11.575}}}}],
           "P424": [{"mainsnak": {"snaktype": "value", "datavalue": {"value": "de"}}}]},
    # novalue snak -> both NULL
    "G2": {"P625": [{"mainsnak": {"snaktype": "novalue"}}]},
    # missing longitude -> both NULL (all-or-nothing)
    "G3": {"P625": [{"mainsnak": {"snaktype": "value",
                     "datavalue": {"value": {"latitude": -3.5}}}}]},
    # only the FIRST P625 counts, even when a later one is complete
    "G4": {"P625": [{"mainsnak": {"snaktype": "novalue"}},
                    {"mainsnak": {"snaktype": "value",
                     "datavalue": {"value": {"latitude": 1.0, "longitude": 2.0}}}}],
           "P424": [{"mainsnak": {"snaktype": "value", "datavalue": {"value": "eo"}}},
                    {"mainsnak": {"snaktype": "value", "datavalue": {"value": "xx"}}}]},
    "G5": {},  # nothing at all
}


def x14_coordinates_language(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C11+C12 through the real pipeline: first-P625 coordinate with
    snaktype/lat/lon all-or-nothing guards, and first-P424 language
    code (later statements ignored)."""
    tune(spark)
    from geo_db_spark.extract import coordinates, languages_out

    ents = _entities_df(spark, _C11_ENTITIES)
    coords = coordinates(ents)
    codes = languages_out(ents).withColumnRenamed("code", "lang_code")
    return (
        coords.join(codes, "id", "left")
        .select("id", "lat", "lon", "lang_code")
        .orderBy("id")
    )


def _x14_oracle() -> str:
    snak = "json_extract(e.j, '$.claims.P625[0].mainsnak')"
    lat = f"TRY_CAST(json_extract({snak}, '$.datavalue.value.latitude') AS DOUBLE)"
    lon = f"TRY_CAST(json_extract({snak}, '$.datavalue.value.longitude') AS DOUBLE)"
    ok = (
        f"({snak} IS NOT NULL AND json_extract_string({snak}, '$.snaktype') = 'value' "
        f"AND {lat} IS NOT NULL AND {lon} IS NOT NULL)"
    )
    return f"""
WITH {_values_cte(_C11_ENTITIES)}
SELECT e.id,
       CASE WHEN {ok} THEN {lat} END AS lat,
       CASE WHEN {ok} THEN {lon} END AS lon,
       json_extract_string(e.j, '$.claims.P424[0].mainsnak.datavalue.value') AS lang_code
FROM entities e
ORDER BY e.id
"""


QUERIES["x14_coordinates_language"] = x14_coordinates_language
ORACLES["x14_coordinates_language"] = _x14_oracle()
