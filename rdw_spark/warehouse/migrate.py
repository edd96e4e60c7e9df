"""Checkpointed incremental migrate: warehouse → reporting mart → OLAP facts.

Reference semantics (SURVEY.md §2.10 T1-T4, §2.2 K2/K3, §2.4 J9):
- migrate tails the import log: consumes ``status=PROCESSED`` imports beyond
  the last checkpoint, in import-id order, batch at a time (reporting every
  ~minute batch 2000; OLAP daily batch 10M — reference docs/Runbook.md:160-193,
  config/rdw-ingest-migrate-reporting.yml:3-14, config/rdw-ingest-migrate-olap.yml:12-21);
- each run writes a ``migrate`` control row with the status machine
  STARTED=10 / COMPLETED=20 / FAILED=-20 / ABANDONED=-10 and the
  ``(first_import_id, last_import_id]`` range it covered (reference
  docs/Troubleshooting.md:225-253, docs/Monitoring.md:168-189);
- a FAILED run *disables* the job until manually enabled (halt-on-failure,
  reference docs/Troubleshooting.md:241-253);
- two-phase staging: the mart write lands in a new snapshot version whose
  ``_SUCCESS`` marker is the atomic publish; a crashed run leaves no visible
  partial state (T3, reference docs/Runbook.md:164);
- single consumer per target (reference docs/Runbook.md:162) — enforced here
  by the serial control-row protocol.

Mart shapes:
- **reporting.exam** — denormalized per-student query table: exam joined to
  student/school/district/asmt display columns (reference reporting schema,
  docs/Troubleshooting.md:415-455 query shape). Dims are broadcast; the only
  shuffle is the mart MERGE itself.
- **olap.exam / olap.iab_exam** — star-schema facts split by assessment type
  (IAB separate — reference docs/Runbook.BulkDeleteExams.md:109-118),
  partitioned by ``school_year`` on disk so year-scoped aggregate queries
  prune partitions.
- **olap.exam_longitudinal** — summative trend fact keyed
  (student, subject, school_year) (reference docs/Runbook.BulkDeleteExams.md:116).
- **olap.exam_score** — per-claim score fact (docs/Runbook.BulkDeleteExams.md:30).

Scale: the incremental batch is ``update_import_id ∈ (first, last]`` — a
filter the parquet scan pushes down; mart MERGE joins the (small) batch
against the mart on the id key with the batch side broadcast. At 100 TB the
mart tables are partitioned by school_year so the rewrite touches only the
years present in the batch.
"""

from __future__ import annotations

import json
import os
from datetime import datetime, timezone

from pyspark.sql import DataFrame, Row, SparkSession, functions as F, types as T

from rdw_spark.warehouse.store import TableStore

MIGRATE_SCHEMA = T.StructType([
    T.StructField("id", T.LongType(), False),
    T.StructField("job", T.StringType(), False),             # reporting | olap
    T.StructField("status", T.IntegerType(), False),
    T.StructField("first_import_id", T.LongType(), True),
    T.StructField("last_import_id", T.LongType(), True),
    T.StructField("created", T.TimestampType(), False),
    T.StructField("updated", T.TimestampType(), False),
    T.StructField("message", T.StringType(), True),
])


class MigrateStatus:
    """Reference codes (docs/Monitoring.md:171-180)."""

    STARTED = 10
    COMPLETED = 20
    ABANDONED = -10
    FAILED = -20


def _reporting_exam(wh: TableStore, spark: SparkSession) -> DataFrame:
    """Full denormalized reporting rows (caller filters to the batch)."""
    exam = wh.read(spark, "exam")
    student = wh.read(spark, "student").select(
        F.col("id").alias("student_id"), "ssid",
        F.col("first_name").alias("student_first_name"),
        F.col("last_or_surname").alias("student_last_name"),
    )
    school = wh.read(spark, "school").select(
        F.col("id").alias("school_id"),
        F.col("natural_id").alias("school_natural_id"),
        F.col("name").alias("school_name"), "district_id",
    )
    district = wh.read(spark, "district").select(
        F.col("id").alias("district_id"),
        F.col("natural_id").alias("district_natural_id"),
        F.col("name").alias("district_name"),
    )
    asmt = wh.read(spark, "asmt").select(
        F.col("id").alias("asmt_id"),
        F.col("natural_id").alias("asmt_natural_id"),
        F.col("label").alias("asmt_label"),
        F.col("subject_code"),
    )
    return (
        exam
        .join(F.broadcast(student), "student_id")
        .join(F.broadcast(school), "school_id")
        .join(F.broadcast(district), "district_id")
        .join(F.broadcast(asmt), "asmt_id")
    )


class MigrateEngine:
    JOBS = ("reporting", "olap")

    def __init__(self, warehouse: TableStore, mart_root: str, batch_size: int = 2000):
        self.wh = warehouse
        self.batch_size = batch_size
        # mart store is schema-free (schemas come from the transform output);
        # control table has a declared schema
        self.mart = TableStore(mart_root, audit_enabled=False,
                               schemas={"migrate": MIGRATE_SCHEMA}, natural_keys={})

    # ---------- control table (T4) ----------

    def control(self, spark: SparkSession) -> DataFrame:
        return self.mart.read(spark, "migrate")

    def _append_control(self, spark: SparkSession, row: Row) -> None:
        cur = self.control(spark)
        self.mart.write_snapshot(
            cur.unionByName(spark.createDataFrame([row], MIGRATE_SCHEMA)), "migrate"
        )

    def _update_control(self, spark: SparkSession, run_id: int, status: int,
                        message: str | None) -> None:
        """One control row per run, status updated in place (the reference
        mutates its migrate row through the lifecycle,
        docs/Troubleshooting.md:228-239)."""
        cur = self.control(spark)
        self.mart.write_snapshot(cur.withColumns({
            "status": F.when(F.col("id") == run_id, F.lit(status))
                       .otherwise(F.col("status")),
            "message": F.when(F.col("id") == run_id, F.lit(message))
                        .otherwise(F.col("message")),
            "updated": F.when(F.col("id") == run_id, F.current_timestamp())
                        .otherwise(F.col("updated")),
        }), "migrate")

    def _last_row(self, spark: SparkSession, job: str) -> Row | None:
        rows = (
            self.control(spark).filter(F.col("job") == job)
            .orderBy(F.desc("id")).limit(1).collect()
        )
        return rows[0] if rows else None

    def enabled(self, spark: SparkSession, job: str) -> bool:
        last = self._last_row(spark, job)
        return last is None or last["status"] != MigrateStatus.FAILED

    def enable(self, spark: SparkSession, job: str) -> None:
        """Manual re-enable: mark the FAILED run ABANDONED (reference
        docs/Troubleshooting.md:241-262 — abandoned staging data is cleaned,
        which for us is automatic: unpublished snapshot versions are invisible)."""
        last = self._last_row(spark, job)
        if last is None or last["status"] != MigrateStatus.FAILED:
            return
        cur = self.control(spark)
        fixed = cur.withColumn(
            "status",
            F.when(F.col("id") == last["id"], F.lit(MigrateStatus.ABANDONED))
            .otherwise(F.col("status")),
        )
        self.mart.write_snapshot(fixed, "migrate")

    def checkpoint(self, spark: SparkSession, job: str) -> int:
        row = (
            self.control(spark)
            .filter((F.col("job") == job) & (F.col("status") == MigrateStatus.COMPLETED))
            .agg(F.max("last_import_id")).collect()[0]
        )
        return int(row[0] or 0)

    # ---------- the incremental run ----------

    def run_once(self, spark: SparkSession, job: str,
                 import_log: DataFrame | None = None) -> dict:
        if job not in self.JOBS:
            raise ValueError(f"unknown migrate job: {job}")

        from rdw_spark.warehouse.import_log import ImportStatus

        # the control table is tiny: one collect serves the enabled check,
        # checkpoint, and run-id instead of four separate driver jobs
        ctrl_rows = self.control(spark).collect()
        job_rows = [r for r in ctrl_rows if r["job"] == job]
        last = max(job_rows, key=lambda r: r["id"], default=None)
        if last is not None and last["status"] == MigrateStatus.FAILED:
            return {"state": "disabled", "migrated": 0}

        log = import_log if import_log is not None else self.wh.read(spark, "import")
        ckpt = max(
            (int(r["last_import_id"]) for r in ctrl_rows
             if r["job"] == job and r["status"] == MigrateStatus.COMPLETED
             and r["last_import_id"] is not None),
            default=0,
        )
        batch = (
            log.filter((F.col("status") == ImportStatus.PROCESSED) & (F.col("id") > ckpt))
            .orderBy("id").limit(self.batch_size)
            .agg(F.min("id").alias("first"), F.max("id").alias("last"),
                 F.count("*").alias("n")).collect()[0]
        )
        if not batch["n"]:
            return {"state": "noop", "migrated": 0}
        first, last = int(batch["first"]), int(batch["last"])

        now = datetime.now(timezone.utc).replace(tzinfo=None)
        run_id = int(max((r["id"] for r in ctrl_rows), default=0) + 1)
        self._append_control(spark, Row(
            id=run_id, job=job, status=MigrateStatus.STARTED,
            first_import_id=first, last_import_id=last,
            created=now, updated=now, message=None,
        ))
        try:
            n = self._migrate_batch(spark, job, first, last)
            status, msg = MigrateStatus.COMPLETED, None
        except Exception as exc:  # noqa: BLE001 — recorded + job halted (T4)
            n, status, msg = 0, MigrateStatus.FAILED, json.dumps({"error": str(exc)[:500]})
        self._update_control(spark, run_id, status, msg)
        return {"state": MigrateStatus.COMPLETED == status and "completed" or "failed",
                "migrated": n, "first_import_id": first, "last_import_id": last}

    def run_until_caught_up(self, spark: SparkSession, job: str, max_runs: int = 1000) -> int:
        """AvailableNow-style drain: batches until the log is exhausted (T2)."""
        total = 0
        for _ in range(max_runs):
            res = self.run_once(spark, job)
            if res["state"] in ("noop", "disabled"):
                break
            if res["state"] == "failed":
                break
            total += res["migrated"]
        return total

    # ---------- per-job transforms ----------

    def _batch_filter(self, df: DataFrame, first: int, last: int) -> DataFrame:
        """J9: content rows whose lineage falls in (first-1, last] — a
        pushed-down range predicate on update_import_id."""
        return df.filter(
            (F.col("update_import_id") >= first) & (F.col("update_import_id") <= last)
        )

    def _merge_mart(self, spark: SparkSession, name: str, batch_rows: DataFrame,
                    key: list[str], partition_by: list[str] | None = None) -> int:
        cur_v = self.mart.latest_version(name)
        # count + write both consume the batch: cache so the upstream
        # (batch scan + dim joins) computes once
        batch_rows = batch_rows.cache()
        n = batch_rows.count()
        if n == 0:
            batch_rows.unpersist()
            return 0
        if cur_v is None:
            out = batch_rows
        else:
            cur = spark.read.parquet(
                os.path.join(self.mart.root, name, f"v={cur_v}")
            )
            out = cur.join(
                F.broadcast(batch_rows.select(*key).distinct()), key, "left_anti"
            ).unionByName(batch_rows)
        if partition_by:
            # Z-ORDER analog (reference X1): cluster rows within each
            # school_year partition by school so school-scoped queries touch
            # few row groups (parquet min/max file skipping)
            sort_cols = [c for c in ("school_id", "student_id") if c in out.columns]
            if sort_cols:
                out = out.sortWithinPartitions(*partition_by, *sort_cols)
        writer = out.write.mode("overwrite")
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        writer.parquet(os.path.join(
            self.mart.root, name, f"v={(cur_v or 0) + 1}"
        ))
        batch_rows.unpersist()
        return n

    def _migrate_batch(self, spark: SparkSession, job: str, first: int, last: int) -> int:
        if job == "reporting":
            rows = self._batch_filter(_reporting_exam(self.wh, spark), first, last)
            return self._merge_mart(spark, "reporting_exam", rows, ["id"])

        # olap: fact fan-out (reference docs/Runbook.BulkDeleteExams.md:109-118).
        # All five facts derive from the same batch scan + asmt join — cache
        # it once so each fact's count/write reads the materialized batch.
        exam = self._batch_filter(self.wh.read(spark, "exam"), first, last)
        asmt = self.wh.read(spark, "asmt").select(
            F.col("id").alias("asmt_id"), F.col("subject_code"),
        )
        exam = exam.join(F.broadcast(asmt), "asmt_id").cache()
        n = self._merge_mart(
            spark, "olap_exam",
            exam.filter(F.col("type_code").isin("ica", "sum")),
            ["id"], partition_by=["school_year"],
        )
        n += self._merge_mart(
            spark, "olap_iab_exam", exam.filter(F.col("type_code") == "iab"),
            ["id"], partition_by=["school_year"],
        )
        longitudinal = (
            exam.filter((F.col("type_code") == "sum") & (~F.col("deleted")))
            .select("id", "student_id", "subject_code", "school_year",
                    "scale_score", "performance_level", "grade_code")
        )
        n += self._merge_mart(spark, "olap_exam_longitudinal", longitudinal, ["id"])

        scores = self.wh.read(spark, "exam_score").join(
            F.broadcast(exam.select(F.col("id").alias("exam_id"))), "exam_id", "left_semi"
        )
        self._merge_mart(
            spark, "olap_exam_score",
            scores.join(
                exam.select(F.col("id").alias("exam_id"), "school_year",
                            "subject_code"),
                "exam_id",
            ),
            ["exam_id", "claim_code"],
        )
        exam.unpersist()
        return n

    def read_mart(self, spark: SparkSession, name: str) -> DataFrame:
        v = self.mart.latest_version(name)
        if v is None:
            raise FileNotFoundError(f"mart table {name} has no published snapshot")
        return spark.read.parquet(os.path.join(self.mart.root, name, f"v={v}"))
