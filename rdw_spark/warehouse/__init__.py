"""Warehouse layer: normalized tables with import lineage, MERGE-style
upsert with audit capture, the import-log lifecycle, and the checkpointed
incremental migrate engine (SURVEY.md §2.2 K1-K3, §2.10 T1-T6, §4 X12)."""

from rdw_spark.warehouse.import_log import ImportLog, ImportStatus
from rdw_spark.warehouse.migrate import MigrateEngine, MigrateStatus, migrate_status_dim
from rdw_spark.warehouse.store import TableStore

__all__ = ["ImportLog", "ImportStatus", "MigrateEngine", "MigrateStatus",
           "TableStore", "migrate_status_dim"]
