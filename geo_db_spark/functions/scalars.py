"""Misc scalar expressions for the WikiData domain."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def parse_quantity(amount: Column) -> Column:
    """WikiData quantity-string to BIGINT, faithful to the reference
    (src/wiki_data_line.rs:507-523): strip whitespace / ',' / '.' / '+'
    (thousands separators and leading plus — note ``"1.5" -> 15``), then
    integer-parse; non-numeric leftovers (incl. a '-' sign: the reference
    parses u64, so negatives fail) -> NULL."""
    cleaned = F.regexp_replace(amount, r"[\s,.+]+", "")
    n = F.when(cleaned.rlike(r"^\d+$"), cleaned.cast("long"))
    return n


def lang_family(code: Column) -> Column:
    """Language-family prefix: the code up to the first '-'
    (``zh-hans`` -> ``zh``). Derived join key that keeps the reference's
    ``label.lang = code OR label.lang LIKE prefix || '-%'`` match
    (src/post/per_city.sql:35) hash-joinable (SURVEY.md §2 D6)."""
    return F.substring_index(code, "-", 1)
