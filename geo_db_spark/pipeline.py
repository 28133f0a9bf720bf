"""End-to-end pipeline: WikiData dump file -> nine extracted tables ->
final cities/cities_labels/cities_languages (the reference's two phases,
src/main.rs:123-234 + src/post/mod.rs:4-198, as one Spark application).

Storage layout at scale: each extracted table is written to parquet
partitioned by nothing (they are id-keyed and modest) EXCEPT
object_labels — the big skewed table — which benefits from being written
bucketed/sorted by id if re-queried repeatedly. The write is the stage
barrier the reference gets from SQLite; re-reading parquet gives every
post stage pruned scans instead of recomputing the extraction DAG.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from geo_db_spark.extract import class_sets_from_dict, extract_all
from geo_db_spark.functions.wiki_time import NOW_KEY_DEFAULT
from geo_db_spark.plans.geo_post import post_process
from geo_db_spark.sources.wikidata import read_entity_dump

FINAL_TABLES = ("cities", "cities_labels", "cities_languages")


def _as_class_tags(spark: SparkSession, class_sets) -> DataFrame:
    """Accept any A7 provider output: a precomputed dict, or a tagged
    (class_id, set_name) DataFrame from sources.classes
    (class_sets_from_p279_edges / fetch_class_sets_sparql)."""
    if isinstance(class_sets, DataFrame):
        return class_sets
    return class_sets_from_dict(spark, class_sets)


def ingest(
    spark: SparkSession,
    dump_path: str,
    class_sets,
    out_dir: str | None = None,
    now_key: int = NOW_KEY_DEFAULT,
) -> dict[str, DataFrame]:
    """Phase 1 (reference src/main.rs:123-234): parse + extract the nine
    tables. With ``out_dir`` each table is persisted to parquet and
    re-read (a durable stage barrier, replacing the SQLite sink A9)."""
    entities = read_entity_dump(spark, dump_path)
    tags = _as_class_tags(spark, class_sets)
    outs = extract_all(entities, tags, now_key)
    if out_dir:
        persisted = {}
        for name, df in outs.items():
            path = f"{out_dir}/{name}"
            df.write.mode("overwrite").parquet(path)
            persisted[name] = spark.read.parquet(path)
        return persisted
    return outs


def build_geo_db(
    spark: SparkSession,
    dump_path: str,
    class_sets,
    out_dir: str | None = None,
    now_key: int = NOW_KEY_DEFAULT,
    max_steps: int = 100,
) -> dict[str, DataFrame]:
    """Full build: ingest + post-process. Returns the three final tables
    (and persists everything under ``out_dir`` when given)."""
    tables = ingest(
        spark, dump_path, class_sets,
        out_dir=f"{out_dir}/raw" if out_dir else None,
        now_key=now_key,
    )
    finals = post_process(tables, max_steps=max_steps)
    if out_dir:
        persisted = {}
        for name in FINAL_TABLES:
            path = f"{out_dir}/{name}"
            finals[name].write.mode("overwrite").parquet(path)
            persisted[name] = spark.read.parquet(path)
        return persisted
    return finals
