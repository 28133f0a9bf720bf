"""WikiData dump source: line-delimited entity JSON -> typed entity rows.

The dump is one JSON entity per line inside an array (``[`` / ``]``
boundary lines, trailing commas — reference src/wiki_data_line.rs:342-349;
SURVEY.md §2 A5/A6). WikiData's ``labels``/``claims`` are dynamically
keyed, but the reference only ever touches ~15 fixed property keys
(SURVEY.md §1.1), so we use a *projection schema* naming exactly those
keys: each property gets the statement shape of its value kind, Catalyst
prunes everything else at parse time (``from_json`` only materializes
accessed fields).

bz2 note: ``spark.read.text`` handles ``.bz2`` transparently via Hadoop
codecs, and bzip2 is splittable — the scan parallelizes across the dump,
which the reference's serial decompressor cannot do (SURVEY.md §2 A2).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

# qualifier snaks: we only ever need (a) key presence and (b) time values
# (P580/P582/P585). Non-time qualifier values parse as NULL structs but
# keep their array slot, which is all presence checks need.
_QUAL_SNAK = T.StructType(
    [
        T.StructField("snaktype", T.StringType()),
        T.StructField(
            "datavalue",
            T.StructType(
                [
                    T.StructField(
                        "value",
                        T.StructType(
                            [
                                T.StructField("time", T.StringType()),
                                T.StructField("timezone", T.DoubleType()),
                            ]
                        ),
                    )
                ]
            ),
        ),
    ]
)

QUALIFIERS_TYPE = T.MapType(T.StringType(), T.ArrayType(_QUAL_SNAK))


def _stmt(value_type: T.DataType) -> T.ArrayType:
    return T.ArrayType(
        T.StructType(
            [
                T.StructField(
                    "mainsnak",
                    T.StructType(
                        [
                            T.StructField("snaktype", T.StringType()),
                            T.StructField(
                                "datavalue",
                                T.StructType([T.StructField("value", value_type)]),
                            ),
                        ]
                    ),
                ),
                T.StructField("qualifiers", QUALIFIERS_TYPE),
            ]
        )
    )


_ENTITY_VALUE = T.StructType([T.StructField("id", T.StringType())])
_MONO_VALUE = T.StructType(
    [T.StructField("language", T.StringType()), T.StructField("text", T.StringType())]
)
_QUANTITY_VALUE = T.StructType(
    [T.StructField("amount", T.StringType()), T.StructField("unit", T.StringType())]
)
_COORD_VALUE = T.StructType(
    [T.StructField("latitude", T.DoubleType()), T.StructField("longitude", T.DoubleType())]
)

# property keys actually consumed by the reference (SURVEY.md §2 B/C):
CLAIMS_TYPE = T.StructType(
    [
        T.StructField("P31", _stmt(_ENTITY_VALUE)),    # instance of
        T.StructField("P131", _stmt(_ENTITY_VALUE)),   # located in admin TE
        T.StructField("P17", _stmt(_ENTITY_VALUE)),    # country
        T.StructField("P37", _stmt(_ENTITY_VALUE)),    # official language
        T.StructField("P2936", _stmt(_ENTITY_VALUE)),  # language used
        T.StructField("P1366", _stmt(_ENTITY_VALUE)),  # replaced by
        T.StructField("P576", _stmt(_ENTITY_VALUE)),   # dissolved
        T.StructField("P297", _stmt(T.StringType())),  # ISO 3166-1 alpha-2
        T.StructField("P300", _stmt(T.StringType())),  # ISO 3166-2
        T.StructField("P424", _stmt(T.StringType())),  # wikimedia lang code
        T.StructField("P1082", _stmt(_QUANTITY_VALUE)),  # population
        T.StructField("P625", _stmt(_COORD_VALUE)),    # coordinates
        T.StructField("P1705", _stmt(_MONO_VALUE)),    # native label
        T.StructField("P1448", _stmt(_MONO_VALUE)),    # official name
    ]
)

ENTITY_SCHEMA = T.StructType(
    [
        T.StructField("id", T.StringType()),
        # map values kept as RAW JSON strings: a single malformed label
        # must not null out the whole map (the reference skips just the bad
        # label, src/wiki_data_line.rs:100); extract.plain_labels parses
        # each value individually.
        T.StructField("labels", T.MapType(T.StringType(), T.StringType())),
        T.StructField("claims", CLAIMS_TYPE),
    ]
)


def parse_entity_lines(lines: DataFrame, value_col: str = "value") -> DataFrame:
    """Raw dump lines -> one row per entity with columns (id, labels,
    claims). Reproduces the reference's line trimming: skip length<=1
    lines (``[``/``]``), strip one trailing comma, then JSON-parse
    (src/wiki_data_line.rs:342-350). Malformed JSON -> NULL id, dropped
    (warn-and-skip semantics, SURVEY.md §1.4)."""
    v = F.col(value_col)
    cleaned = F.regexp_replace(v, r",\s*$", "")
    parsed = F.from_json(cleaned, ENTITY_SCHEMA)  # PERMISSIVE: bad paths -> NULL
    return (
        lines.filter(F.length(F.trim(v)) > 1)
        .select(parsed.alias("e"))
        .select("e.id", "e.labels", "e.claims")
        .filter(F.col("id").isNotNull())
    )


def read_entity_dump(spark: SparkSession, path: str) -> DataFrame:
    """Read a dump file (.json / .json.bz2; bz2 is splittable so the read
    parallelizes — improvement over the reference's serial decompress,
    SURVEY.md §2 A1-A5). Download-to-storage replaces the reference's
    resumable-HTTP source (A1): at cluster scale the dump lives in object
    storage, not behind a flaky socket. Use
    ``geo_db_spark.sources.download.download_resumable`` for the
    download step (Range+ETag resume, 32x8s retry — the reference's
    resilience semantics, src/input/http.rs:10-11, 48-152)."""
    return parse_entity_lines(spark.read.text(path))
