"""geo_db_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of the reference AksoEo/geo-db (a Rust
streaming ETL over the WikiData dump + a battery of SQLite post-processing
scripts; see SURVEY.md), re-expressed Spark-first:

- declarative DataFrame/SQL plans (Catalyst optimizes; no hand scheduling)
- generic relational operator library (``operators.relational``) covering
  the reference's post-phase SQL battery (SURVEY.md §2 D1-D12)
- iterative graph closure (``operators.closure``) replacing SQLite's
  recursive CTEs (reference src/post/find_subdivision.sql:12-22)
- WikiData extraction front-end (``sources.wikidata``) replacing the
  per-line Rust extractor (reference src/wiki_data_line.rs)
- large-scale training-data ops (dedup / similarity / text analysis /
  multimodal plumbing) that a 100 TB pipeline needs

Everything here is built on public PySpark APIs only.
"""

__version__ = "0.1.0"

from geo_db_spark.session import get_spark, tune  # noqa: F401
