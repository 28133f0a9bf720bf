from geo_db_spark.sources.wikidata import (  # noqa: F401
    ENTITY_SCHEMA,
    parse_entity_lines,
    read_entity_dump,
)
