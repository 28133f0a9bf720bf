"""WikiData timestamp handling.

WikiData times look like ``+yyyy-mm-ddThh:mm:ssZ`` (sign may be ``-``,
year may be 0 / negative / huge, month/day may be ``00``) plus a timezone
offset in minutes. They cannot round-trip through TimestampType (year 0,
month 0 are invalid Gregorian). The reference parses them into a
(year, month0, day0, h, m, s) tuple with saturating 1-subtraction on
month/day, then adds the timezone offset with a carry chain using radices
(60, 60, 24, 31, 12) — "31-day months, close enough" (reference
src/wiki_time.rs:99-137 parse, :36-68 carry) — and compares tuples
lexicographically.

Key insight for a UDF-free encoding (SURVEY.md §2 F6): the carry chain
preserves the linear total

    key = ((((year*12 + month0)*31 + day0)*24 + hour)*60 + min)*60 + sec
          + tz_minutes*60

and fully normalized tuples (which the carry produces) compare
lexicographically exactly as this total compares numerically. So ONE
linear expression reproduces the reference's ordering AND equality —
no carry logic, no UDF, a tiny expression tree (this helper is inlined
into every temporal predicate, so tree size directly drives Catalyst
analysis cost).

Malformed strings yield NULL — callers treat NULL as "could not parse",
which the reference maps to "statement stays active" / "population entry
skipped" (src/wiki_time.rs:148,171 `if let Ok(time)`). Years beyond i32
fail the reference's parse (src/wiki_time.rs:115), so |year| > 2^31-1
-> NULL for exact parity.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_TIME_RE = r"^([+-]?\d+)-(\d{2})-(\d{2})T(\d{2}):(\d{2}):(\d{2})Z$"
_I32_MAX = 2_147_483_647

# Frozen "now" default for deterministic pipelines/tests (the reference
# uses wall clock, src/wiki_time.rs:69-79; we freeze it as a parameter —
# SURVEY.md §2 B2). 2026-01-01T00:00:00Z.
NOW_KEY_DEFAULT_TUPLE = (2026, 0, 0, 0, 0, 0)


def _key_from_parts(year, month0, day0, hour, minute, second):
    return ((((year * 12 + month0) * 31 + day0) * 24 + hour) * 60 + minute) * 60 + second


NOW_KEY_DEFAULT = _key_from_parts(*NOW_KEY_DEFAULT_TUPLE)


def wiki_time_key_py(s: str, tz_minutes: float = 0.0) -> int | None:
    """Python twin of :func:`wiki_time_key` for fixtures/goldens."""
    import re

    m = re.match(_TIME_RE, s or "")
    if not m:
        return None
    try:
        year = int(m.group(1))
    except ValueError:
        return None
    if abs(year) > _I32_MAX:  # reference parses year as i32
        return None
    month0 = max(int(m.group(2)) - 1, 0)
    day0 = max(int(m.group(3)) - 1, 0)
    return _key_from_parts(
        year, month0, day0, int(m.group(4)), int(m.group(5)), int(m.group(6))
    ) + int(tz_minutes) * 60


def wiki_time_key(time_str: Column, tz_minutes: Column | None = None) -> Column:
    """Sortable BIGINT key for a WikiData time string (NULL if malformed).

    Reference parity: src/wiki_time.rs:99-137 (parse + saturating month/day
    1-subtraction + timezone carry). See module docstring for why the
    carry chain collapses into this single linear expression.
    """
    valid = time_str.rlike(_TIME_RE)
    sign = F.when(time_str.startswith("-"), F.lit(-1)).otherwise(F.lit(1)).cast("long")
    parts = F.split(F.regexp_replace(time_str, r"^[+-]|Z$", ""), r"[-T:]")
    p = lambda i: F.get(parts, i).cast("long")  # noqa: E731
    year = sign * p(0)  # > ~19 digits overflows the cast -> NULL
    tz = F.coalesce((tz_minutes if tz_minutes is not None else F.lit(0)).cast("long"), F.lit(0))
    key = (
        _key_from_parts(
            year,
            F.greatest(p(1) - 1, F.lit(0)),
            F.greatest(p(2) - 1, F.lit(0)),
            p(3),
            p(4),
            p(5),
        )
        + tz * 60
    )
    return F.when(
        valid & year.isNotNull() & (F.abs(year) <= F.lit(_I32_MAX)), key
    ).otherwise(F.lit(None).cast("long"))


def _qual_time_key(qual_snak: Column) -> Column:
    """Key of a time-valued qualifier snak (struct<snaktype, datavalue
    struct<value struct<time, timezone>>>); NULL unless snaktype=='value'
    and the time parses."""
    v = qual_snak["datavalue"]["value"]
    return F.when(
        qual_snak.isNotNull() & (qual_snak["snaktype"] == "value"),
        wiki_time_key(v["time"], v["timezone"]),
    )


def is_qualifier_active(qualifiers: Column, now_key: int = NOW_KEY_DEFAULT) -> Column:
    """The reference's ``is_object_active`` (src/wiki_time.rs:185-201):
    a statement is active unless its P582[0] end-time is strictly before
    *now* or its P580[0] start-time is strictly after *now*; absent
    qualifiers, absent snaks, non-'value' snaktypes and unparseable times
    all count as active."""
    end0 = F.get(F.element_at(qualifiers, "P582"), 0)
    start0 = F.get(F.element_at(qualifiers, "P580"), 0)
    end_key = _qual_time_key(end0)
    start_key = _qual_time_key(start0)
    ended = end0.isNotNull() & end_key.isNotNull() & (end_key < F.lit(now_key))
    not_started = start0.isNotNull() & start_key.isNotNull() & (start_key > F.lit(now_key))
    return qualifiers.isNull() | ~(
        F.coalesce(ended, F.lit(False)) | F.coalesce(not_started, F.lit(False))
    )


def start_qualifier_present(qualifiers: Column) -> Column:
    """``is_object_start_active(...).is_some()`` — i.e. a P580[0] qualifier
    snak exists at all (reference src/wiki_data_line.rs:144 uses this for
    the dated-country priority trick)."""
    return qualifiers.isNotNull() & F.get(F.element_at(qualifiers, "P580"), 0).isNotNull()
