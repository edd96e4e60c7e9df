"""rdw_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of SmarterApp/RDW (see SURVEY.md).

Layout:
  session    — SparkSession builder tuned for the workload
  io         — parquet table loaders / temp-view registration
  schemas    — hand-declared StructTypes for the warehouse tables
  sources/   — input-format parsers (TRT XML, package CSV, org JSON, ...)
  warehouse/ — import log, upsert/merge, audit, incremental migrate
  operators/ — engine operators Spark lacks natively (as-of join, dedup,
               similarity search, text analysis)
  plans/     — the query catalog (SURVEY §2 inventory) + RDW report queries
  streaming/ — Structured Streaming variants of the incremental semantics
"""

__version__ = "0.1.0"
