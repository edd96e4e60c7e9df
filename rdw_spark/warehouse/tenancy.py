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


# --------------------------------------------------------------------------
# Sandbox datasets (docs/Runbook.MultiTenancy.md:127-162, 320-356)
# --------------------------------------------------------------------------


def publish_dataset(
    spark: SparkSession, wh, datasets_root: str, dataset_id: str,
    label: str | None = None,
) -> dict[str, int]:
    """Dump a prepared warehouse's resolved state as a named sandbox
    dataset: plain-parquet table dumps plus a manifest annotating the id,
    label, and table list — the engine analog of the runbook's mysqldump →
    ``sandbox-datasets/<id>/warehouse`` upload with ``manifest.txt`` and
    the admin-service ``sandboxDatasets`` label annotation."""
    import json

    from rdw_spark.sources.admin_flows import snapshot_warehouse

    root = os.path.join(datasets_root, dataset_id)
    counts = snapshot_warehouse(
        spark, wh, os.path.join(root, "warehouse"), include_audit=False
    )
    if not counts:
        raise ValueError(
            f"dataset {dataset_id!r}: the warehouse has no published tables "
            "— nothing to publish"
        )
    # the snapshot only creates dirs for non-empty tables; the manifest
    # needs the dataset root regardless
    os.makedirs(root, exist_ok=True)
    manifest = {
        "id": dataset_id,
        "label": label or dataset_id,
        "tables": sorted(counts),
        "rows": counts,
    }
    with open(os.path.join(root, "manifest.json"), "w", encoding="utf-8") as fh:
        json.dump(manifest, fh, indent=1)
    return counts


def list_datasets(datasets_root: str) -> list[dict]:
    """Available datasets, newest manifest schema — what the sandbox
    creation UI offers the administrator to select from."""
    import json

    out = []
    if not os.path.isdir(datasets_root):
        return out
    for entry in sorted(os.listdir(datasets_root)):
        mpath = os.path.join(datasets_root, entry, "manifest.json")
        if os.path.isfile(mpath):
            with open(mpath, encoding="utf-8") as fh:
                out.append(json.load(fh))
    return out


def create_sandbox(
    spark: SparkSession, base: str, tenant_id: str, datasets_root: str,
    dataset_id: str, migrate: bool = True,
) -> Tenant:
    """Create a sandbox tenant seeded from a published dataset: restore
    the dataset's tables into the new tenant's warehouse, then migrate to
    its reporting and OLAP marts (the runbook loads the warehouse *without*
    migrating when building the dataset; migration happens per-sandbox on
    creation). A sandbox IS a tenant — identical code paths, isolated
    storage roots."""
    from rdw_spark.sources.admin_flows import restore_warehouse

    t = Tenant(base, tenant_id)
    src = os.path.join(datasets_root, dataset_id, "warehouse")
    if not os.path.isdir(src):
        raise ValueError(
            f"dataset {dataset_id!r} not found under {datasets_root} "
            f"(available: {[d['id'] for d in list_datasets(datasets_root)]})"
        )
    restore_warehouse(spark, src, t.warehouse)
    if migrate:
        t.migrate.run_until_caught_up(spark, "reporting")
        t.migrate.run_until_caught_up(spark, "olap")
    return t


def diagnostic_status(spark: SparkSession, tenant: Tenant, level: int = 0) -> dict:
    """The /status endpoint shape (docs/API.md:1006-1028): a leveled
    health summary for one tenant. Level 0 is the cheap rating (driven by
    migrate health — a self-disabled migrate is the reference's
    'degraded' condition); higher levels add the import backlog and
    per-table row counts (increasingly expensive, like the reference's
    level param)."""
    from pyspark.sql import functions as F

    mig = tenant.migrate.status(spark)
    healthy = all(j["enabled"] for j in mig.values())
    out: dict = {
        "statusText": "Ideal" if healthy else "Degraded",
        "statusRating": 4 if healthy else 1,
        "level": level,
        "tenant": tenant.tenant_id,
    }
    if level >= 1:
        out["migrate"] = mig
        out["imports_by_status"] = {
            int(r["status"]): int(r["n"])
            for r in tenant.import_log.read(spark)
            .groupBy("status").agg(F.count("*").alias("n")).collect()
        }
    if level >= 2:
        out["warehouse_rows"] = {
            name: tenant.warehouse.read(spark, name).count()
            for name in sorted(tenant.warehouse.schemas)
        }
    return out
