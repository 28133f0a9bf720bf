"""Builders for WikiData entity JSON fixtures (FIXTURES.md §2)."""

from __future__ import annotations

import json

# class-set tags used across extraction tests
CLASS_SETS = {
    "territorial_entities": ["QTE"],
    "human_settlements": ["QCITY"],
    "excluded": ["QEXC"],
    "excluded_settlements": ["QEXCS"],
    "second_level_admin_div": ["Q2ND"],
    "languages": ["QLANG"],
}


def time_snak(time: str, tz: int = 0, snaktype: str = "value") -> dict:
    return {
        "snaktype": snaktype,
        "datavalue": {"value": {"time": time, "timezone": tz}},
    }


def q_time(prop: str, time: str, tz: int = 0, snaktype: str = "value") -> dict:
    return {prop: [time_snak(time, tz, snaktype)]}


def q_flag(prop: str) -> dict:
    """Presence-only qualifier (P518/P1539/P1540/P1366)."""
    return {prop: [{"snaktype": "value", "datavalue": {"value": {"id": "QX"}}}]}


def stmt(value, qualifiers: dict | None = None, snaktype: str = "value") -> dict:
    s = {"mainsnak": {"snaktype": snaktype, "datavalue": {"value": value}}}
    if qualifiers is not None:
        s["qualifiers"] = qualifiers
    return s


def entity_stmt(qid: str, qualifiers: dict | None = None, snaktype: str = "value") -> dict:
    return stmt({"id": qid}, qualifiers, snaktype)


def entity(eid: str, claims: dict | None = None, labels: dict | None = None) -> str:
    doc = {"id": eid, "claims": claims or {}}
    if labels is not None:
        doc["labels"] = labels
    return json.dumps(doc)


def labels_map(**kv) -> dict:
    return {lang: {"language": lang, "value": v} for lang, v in kv.items()}


PAST = "+2000-01-01T00:00:00Z"
FUTURE = "+2030-01-01T00:00:00Z"
