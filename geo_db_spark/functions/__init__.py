"""Scalar expression helpers for the WikiData domain.

Everything here is a composition of built-in Spark expressions (JVM-side,
whole-stage codegen) — no Python UDFs (SURVEY.md §7 "UDFs avoidable
everywhere").
"""

from geo_db_spark.functions.wiki_time import (  # noqa: F401
    NOW_KEY_DEFAULT,
    is_qualifier_active,
    start_qualifier_present,
    wiki_time_key,
    wiki_time_key_py,
)
from geo_db_spark.functions.scalars import lang_family, parse_quantity  # noqa: F401
