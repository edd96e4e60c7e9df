"""Multi-tenancy (SURVEY.md §1.5): schema-per-tenant → path-prefix-per-tenant.

The reference runs ``warehouse_<tenant>`` / ``reporting_<tenant>`` schemas on
shared servers plus per-tenant S3 prefixes (docs/Runbook.MultiTenancy.md:58-94,
config/application.yml:70-76 ``path-prefix``). Spark-native equivalent: one
directory namespace per tenant, identical code parameterized by tenant id —
a sandbox is just another tenant (reference Architecture.md:1).

SQL access mirrors the schema-per-tenant naming: views are registered as
``<tenant>_<table>`` so ``spark.sql`` queries read like the reference's
``warehouse_<tenant>.<table>``.
"""

from __future__ import annotations

import os
import re

from pyspark.sql import SparkSession

from rdw_spark.warehouse.import_log import ImportLog
from rdw_spark.warehouse.migrate import MigrateEngine
from rdw_spark.warehouse.store import TableStore

_TENANT_RE = re.compile(r"^[a-z][a-z0-9_]{0,30}$")


class Tenant:
    """All storage roots for one tenant, derived from a shared base path."""

    def __init__(self, base: str, tenant_id: str, migrate_batch_size: int = 2000):
        if not _TENANT_RE.fullmatch(tenant_id):
            raise ValueError(f"invalid tenant id: {tenant_id!r}")
        self.tenant_id = tenant_id
        self.root = os.path.join(base, tenant_id)
        self.warehouse = TableStore(os.path.join(self.root, "warehouse"))
        self.import_log = ImportLog(
            self.warehouse, archive_root=os.path.join(self.root, "archive")
        )
        self.migrate = MigrateEngine(
            self.warehouse, os.path.join(self.root, "mart"),
            batch_size=migrate_batch_size,
        )

    def register_views(self, spark: SparkSession,
                       tables: tuple[str, ...] = ("import", "district", "school",
                                                  "student", "asmt", "exam")) -> None:
        """``spark.sql``-able views named <tenant>_<table> (+ marts when
        published)."""
        for t in tables:
            self.warehouse.read(spark, t).createOrReplaceTempView(
                f"{self.tenant_id}_{t}"
            )
        for mart in ("reporting_exam", "olap_exam", "olap_iab_exam",
                     "olap_exam_longitudinal", "olap_exam_score",
                     "olap_exam_target_score"):
            try:
                self.migrate.read_mart(spark, mart).createOrReplaceTempView(
                    f"{self.tenant_id}_{mart}"
                )
            except FileNotFoundError:
                continue


def list_tenants(base: str) -> list[str]:
    if not os.path.isdir(base):
        return []
    return sorted(
        d for d in os.listdir(base)
        if _TENANT_RE.fullmatch(d) and os.path.isdir(os.path.join(base, d))
    )
