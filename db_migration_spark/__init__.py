"""db_migration_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of WormBase/db-migration (azanium).

The reference (/root/reference, read-only snapshot @ 2024-10-08) orchestrates an
ACeDB -> Datomic migration through four external engines (tace, pseudoace,
GNU sort, the Datomic transactor).  This package re-expresses every operator at
those subprocess boundaries as native Spark DataFrame transformations — see
SURVEY.md §2 for the full inventory — and adds the large-scale
training-data-pipeline operators (dedup, similarity search, multimodal columns,
text analysis) mandated by BASELINE.json.

Layout:
    session.py    — tuned SparkSession builder (AQE, shuffle partitions, Arrow)
    catalog.py    — testdata table loading / view registration
    functions/    — scalar expression helpers (SURVEY §2.8), text & vector fns
    operators/    — relational slice, EAV transforms, dedup, similarity
    sources/      — .ace / EDN / id-catalog / models-file parsers, CSV sinks
    plans/        — resumable step-DAG orchestration (process_steps analog)
    streaming/    — datom-log streaming import, late-patch merge, windowed aggs
    multimodal/   — binary-column plumbing (decode steps stubbed)
"""

__version__ = "0.1.0"
