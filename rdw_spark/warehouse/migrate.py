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
filter the parquet scan pushes down. Mart tables live in manifest-versioned
``PartitionedTable`` storage keyed by ``school_year``: a MERGE reads,
anti-joins, and rewrites only the year partitions present in the batch
(O(batch years), never O(mart)); the control table is bucketed by
(job, run-id range) so the per-run status transitions touch one small
bucket. ``maintain()`` compacts fragmented partitions and GCs superseded
snapshot versions after a drain.
"""

from __future__ import annotations

import json
import os
from datetime import datetime, timezone

from pyspark.sql import DataFrame, Row, SparkSession, functions as F, types as T

from rdw_spark.warehouse.partstore import PartitionedTable
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


def migrate_status_dim(spark: SparkSession) -> DataFrame:
    """The ``migrate_status`` lookup table, exactly the documented rows
    (``select * from migrate_status``, docs/Monitoring.md:170-180)."""
    return spark.createDataFrame(
        [(MigrateStatus.ABANDONED, "ABANDONED"),
         (MigrateStatus.COMPLETED, "COMPLETED"),
         (MigrateStatus.FAILED, "FAILED"),
         (MigrateStatus.STARTED, "STARTED")],
        "id int, name string",
    )


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
    # student is fact-sized (docs/Troubleshooting.md:434-455 treats it as a
    # big table) — a forced broadcast OOMs executors at state scale, so the
    # student join is left to AQE; true dims keep their broadcast hints
    return (
        exam
        .join(student, "student_id")
        .join(F.broadcast(school), "school_id")
        .join(F.broadcast(district), "district_id")
        .join(F.broadcast(asmt), "asmt_id")
    )


class MigrateEngine:
    JOBS = ("reporting", "olap")

    # mart tables: merge key + school_year partitioning (a batch rewrites
    # only the years it touches — an exam's school_year is immutable, it
    # derives from the asmt natural key, so replace-by-key never strands a
    # row in another year's partition)
    MART_KEYS = {
        "reporting_exam": ["id"],
        "olap_exam": ["id"],
        "olap_iab_exam": ["id"],
        "olap_exam_longitudinal": ["id"],
        "olap_exam_score": ["exam_id", "claim_code"],
        "olap_exam_target_score": ["exam_id", "claim_code", "target_code"],
    }

    def __init__(self, warehouse: TableStore, mart_root: str,
                 batch_size: int = 2000, expectations: list | None = None,
                 psi_gate: tuple | None = None):
        """``expectations``: optional declarative data-quality rules
        (``operators.expectations`` ``(name, kind, column, param)``
        tuples) evaluated against every admitted exam batch BEFORE it
        migrates. ``psi_gate``: optional ``(column, cuts, threshold)``
        drift check — the batch's distribution of ``column`` is compared
        (PSI over the pinned ``cuts``) against everything ALREADY
        admitted below the batch range; a PSI above ``threshold`` halts.
        The first batch has no baseline and passes vacuously. Either
        gate failing records its full report under the mart's
        ``gate_report/`` and fails the run — the same
        halt-until-manually-enabled protocol as any migrate failure
        (T4), extended to data quality."""
        self.wh = warehouse
        self.batch_size = batch_size
        self.expectations = expectations
        self.psi_gate = psi_gate
        self._gate_root = os.path.join(mart_root, "gate_report")
        # control table: one row per run, bucketed by (job, id range) so a
        # status transition rewrites one small bucket, never the whole
        # run history
        self.mart = TableStore(
            mart_root, audit_enabled=False,
            schemas={"migrate": MIGRATE_SCHEMA}, natural_keys={},
            partitioned={"migrate": (
                "concat(job, '_', CAST(id DIV 1000 AS STRING))", ["id"], ("id",),
            )},
        )
        self._mart_tables = {
            name: PartitionedTable(
                mart_root, name, "school_year", keys,
                sort_cols=("school_id", "student_id"),
            )
            for name, keys in self.MART_KEYS.items()
        }

    # ---------- control table (T4) ----------

    def control(self, spark: SparkSession) -> DataFrame:
        return self.mart.read(spark, "migrate")

    def _append_control(self, spark: SparkSession, row: Row) -> None:
        # partition-scoped append: touches one (job, id-range) bucket
        self.mart.merge_rows(
            spark, "migrate", spark.createDataFrame([row], MIGRATE_SCHEMA), ["id"]
        )

    def _update_control(self, spark: SparkSession, job: str, run_id: int,
                        status: int, message: str | None) -> None:
        """One control row per run, status updated in place (the reference
        mutates its migrate row through the lifecycle,
        docs/Troubleshooting.md:228-239). Reads and rewrites only the run's
        own control bucket."""
        part = f"{job}_{run_id // 1000}"
        row = (
            self.mart.read_partitions(spark, "migrate", [part])
            .filter(F.col("id") == run_id)
            .withColumns({
                "status": F.lit(status),
                "message": F.lit(message),
                "updated": F.current_timestamp(),
            })
        )
        self.mart.merge_rows(spark, "migrate", row, ["id"])

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
        self._update_control(spark, job, int(last["id"]),
                             MigrateStatus.ABANDONED, last["message"])

    def status(self, spark: SparkSession) -> dict[str, dict]:
        """The GET /migrate response shape (docs/API.md:988-1002): per job,
        enabled flag + the checkpoint the last COMPLETED run reached (the
        timestamp-of-last-record semantics — our ordering key is the
        import id, so that is what 'COMPLETED to' means here)."""
        out: dict[str, dict] = {}
        for job in ("reporting", "olap"):
            last = self._last_row(spark, job)
            out[job] = {
                "enabled": self.enabled(spark, job),
                "last_status": None if last is None else int(last["status"]),
                "completed_to": self.checkpoint(spark, job),
            }
        return out

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

        # one aggregation row serves the enabled check, checkpoint, and
        # run-id — never a full collect of the run history (it grows one row
        # per run, ~500k/year at reference cadence)
        ctrl = self.control(spark)
        agg = ctrl.agg(
            F.max("id").alias("max_id"),
            F.max_by("status", F.when(F.col("job") == job, F.col("id"))).alias("last_status"),
            F.max(F.when(
                (F.col("job") == job) & (F.col("status") == MigrateStatus.COMPLETED),
                F.col("last_import_id"),
            )).alias("ckpt"),
        ).collect()[0]
        if agg["last_status"] == MigrateStatus.FAILED:
            return {"state": "disabled", "migrated": 0}

        ckpt = int(agg["ckpt"] or 0)
        if import_log is not None:
            log = import_log
        else:
            log = self.wh.read(spark, "import")
            pt = self.wh.part_table("import")
            if pt is not None:
                # manifest-level pruning: ids are increasing, so buckets
                # below the checkpoint's can never hold new work
                from rdw_spark.warehouse.store import IMPORT_ID_BUCKET

                _, man = pt.latest()
                live = [p for p in man if int(p) >= ckpt // IMPORT_ID_BUCKET]
                log = pt.read(spark, parts=live)
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
        run_id = int(agg["max_id"] or 0) + 1
        self._append_control(spark, Row(
            id=run_id, job=job, status=MigrateStatus.STARTED,
            first_import_id=first, last_import_id=last,
            created=now, updated=now, message=None,
        ))
        try:
            self._gate_batch(spark, job, run_id, first, last)
            n = self._migrate_batch(spark, job, first, last)
            status, msg = MigrateStatus.COMPLETED, None
        except Exception as exc:  # noqa: BLE001 — recorded + job halted (T4)
            n, status, msg = 0, MigrateStatus.FAILED, json.dumps({"error": str(exc)[:500]})
        self._update_control(spark, job, run_id, status, msg)
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

    # ---------- data-quality admission gate ----------

    def _gate_batch(self, spark: SparkSession, job: str, run_id: int,
                    first: int, last: int) -> None:
        """Evaluate the configured expectations against the exam rows the
        batch is about to admit. The report (O(rules) rows) is persisted
        whether it passes or not — a clean audit trail per run; a failing
        rule raises, which the run_once handler records as FAILED and the
        job halts until ``enable()`` (the reference's halt-on-failure
        protocol, docs/Troubleshooting.md:241-253, applied to quality)."""
        if not (self.expectations or self.psi_gate):
            return
        rows: list = []
        exam = self.wh.read(spark, "exam")
        batch = self._batch_filter(exam, first, last)
        if self.expectations:
            from rdw_spark.operators.expectations import check_expectations

            rows += [r.asDict() for r in
                     check_expectations(batch, self.expectations).collect()]
        if self.psi_gate:
            from rdw_spark.operators.diff import population_stability_index

            col, cuts, threshold = self.psi_gate
            baseline = exam.filter(F.col("update_import_id") < first)
            if baseline.limit(1).count() > 0:
                psi = float(population_stability_index(
                    baseline, batch, col, list(cuts)
                ).select("psi").limit(1).collect()[0]["psi"])
                rows.append({
                    "rule": "psi_drift", "kind": "psi", "column": col,
                    # the report frame is per-rule counts; encode the PSI
                    # in micro-units so the schema stays integral
                    "n_violations": int(psi * 1_000_000),
                    "passed": psi <= threshold,
                })
        if not rows:
            return
        report = spark.createDataFrame(
            [(r["rule"], r["kind"], r["column"], int(r["n_violations"]),
              bool(r["passed"])) for r in rows],
            "rule string, kind string, column string, n_violations long, "
            "passed boolean",
        ).withColumns({
            "job": F.lit(job), "run_id": F.lit(run_id).cast("long"),
            "first_import_id": F.lit(first).cast("long"),
            "last_import_id": F.lit(last).cast("long"),
        })
        report.coalesce(1).write.mode("append").parquet(self._gate_root)
        failed = sorted(r["rule"] for r in rows if not r["passed"])
        if failed:
            raise RuntimeError(
                "expectations gate failed: " + ", ".join(failed))

    def gate_reports(self, spark: SparkSession) -> DataFrame:
        """Every persisted admission-gate report row, one per rule per
        gated run."""
        from pyspark.errors import AnalysisException

        try:
            return spark.read.parquet(self._gate_root)
        except AnalysisException:
            return spark.createDataFrame(
                [], "rule string, kind string, column string, "
                    "n_violations long, passed boolean, job string, "
                    "run_id long, first_import_id long, last_import_id long")

    # ---------- per-job transforms ----------

    def _batch_filter(self, df: DataFrame, first: int, last: int) -> DataFrame:
        """J9: content rows whose lineage falls in (first-1, last] — a
        pushed-down range predicate on update_import_id."""
        return df.filter(
            (F.col("update_import_id") >= first) & (F.col("update_import_id") <= last)
        )

    def _merge_mart(self, spark: SparkSession, name: str,
                    batch_rows: DataFrame) -> int:
        """Partition-scoped MERGE: only the school_year partitions present
        in the batch are read, anti-joined, and rewritten — O(batch years),
        never O(mart). The previous design rewrote the entire mart per
        2000-row batch, which at the reference's batch-per-minute cadence is
        O(mart) I/O per minute — the clearest scale-killer this replaces."""
        return self._mart_tables[name].merge_rows(spark, batch_rows)

    def _delete_mart(self, spark: SparkSession, name: str,
                     keys_df: DataFrame, keys: list[str]) -> int:
        """Physically remove mart rows — the reference deletes migrated
        soft-deletes from both marts ("the system has already deleted the
        records in the data mart", docs/Runbook.BulkDeleteExams.md:104-111)."""
        return self._mart_tables[name].delete_rows(spark, keys_df, keys)

    def _migrate_batch(self, spark: SparkSession, job: str, first: int, last: int) -> int:
        if job == "reporting":
            rows = self._batch_filter(_reporting_exam(self.wh, spark), first, last).cache()
            n = self._merge_mart(spark, "reporting_exam",
                                 rows.filter(~F.col("deleted")))
            dead = rows.filter(F.col("deleted")).select("id", "school_year")
            n += self._delete_mart(spark, "reporting_exam", dead, ["id"])
            rows.unpersist()
            return n

        # olap: fact fan-out (reference docs/Runbook.BulkDeleteExams.md:109-118).
        # All five facts derive from the same batch scan + asmt join — cache
        # it once so each fact's count/write reads the materialized batch.
        exam = self._batch_filter(self.wh.read(spark, "exam"), first, last)
        asmt = self.wh.read(spark, "asmt").select(
            F.col("id").alias("asmt_id"), F.col("subject_code"),
        )
        exam = exam.join(F.broadcast(asmt), "asmt_id").cache()
        # soft-deleted exams in the batch leave every OLAP fact physically
        # (the reference "automatically deletes the records in the OLAP
        # data mart during migration", docs/Runbook.BulkDeleteExams.md:111)
        live = exam.filter(~F.col("deleted"))
        dead = exam.filter(F.col("deleted")).select(
            "id", F.col("id").alias("exam_id"), "school_year")
        n = self._merge_mart(
            spark, "olap_exam", live.filter(F.col("type_code").isin("ica", "sum")),
        )
        n += self._merge_mart(
            spark, "olap_iab_exam", live.filter(F.col("type_code") == "iab"),
        )
        longitudinal = (
            live.filter(F.col("type_code") == "sum")
            .select("id", "student_id", "subject_code", "school_year",
                    "scale_score", "performance_level", "grade_code")
        )
        n += self._merge_mart(spark, "olap_exam_longitudinal", longitudinal)

        scores = self.wh.read(spark, "exam_score").join(
            F.broadcast(live.select(F.col("id").alias("exam_id"))), "exam_id", "left_semi"
        )
        self._merge_mart(
            spark, "olap_exam_score",
            scores.join(
                live.select(F.col("id").alias("exam_id"), "school_year",
                            "subject_code"),
                "exam_id",
            ),
        )
        # 5th fact: exam_target_score — "scored target data for Summative
        # exams" (docs/Runbook.BulkDeleteExams.md:117). The target of each
        # item comes from the package (item.claim_code/target_code); the
        # per-(exam, target) score is the earned/possible point aggregate
        # over the exam's scored items. (The reference's exact residual
        # formula lives in unvendored RDW_Ingest source; the fact grain,
        # summative-only filter, and target identity follow the docs.)
        sum_exam = live.filter(F.col("type_code") == "sum").select(
            F.col("id").alias("exam_id"), "asmt_id", "school_year", "subject_code",
        )
        exam_items = self.wh.read(spark, "exam_item").join(
            F.broadcast(sum_exam.select("exam_id")), "exam_id", "left_semi"
        )
        item_dim = self.wh.read(spark, "item").select(
            "asmt_id", F.col("key").alias("item_key"),
            "claim_code", "target_code", "max_points",
        )
        target_scores = (
            exam_items.join(F.broadcast(sum_exam), "exam_id")
            .join(F.broadcast(item_dim), ["asmt_id", "item_key"])
            .filter(F.col("target_code").isNotNull() & F.col("score").isNotNull())
            .groupBy("exam_id", "claim_code", "target_code")
            .agg(F.first("asmt_id").alias("asmt_id"),
                 F.first("school_year").alias("school_year"),
                 F.first("subject_code").alias("subject_code"),
                 F.count("*").alias("num_items"),
                 F.sum("score").alias("points_earned"),
                 F.sum("max_points").cast("double").alias("points_possible"))
        )
        self._merge_mart(spark, "olap_exam_target_score", target_scores)

        if not dead.isEmpty():
            n += self._delete_mart(spark, "olap_exam", dead, ["id"])
            n += self._delete_mart(spark, "olap_iab_exam", dead, ["id"])
            self._delete_mart(spark, "olap_exam_longitudinal", dead, ["id"])
            self._delete_mart(spark, "olap_exam_score", dead, ["exam_id"])
            self._delete_mart(spark, "olap_exam_target_score", dead, ["exam_id"])
        exam.unpersist()
        return n

    def refresh_aggregate_cache(self, spark: SparkSession) -> int:
        """X10 analog of the reference's aggregate repository cache (flushed
        daily after the OLAP migrate,
        config/rdw-reporting-aggregate-service.yml:28-34): materialize the
        A7 per-performance-level counts from the olap_exam fact into an
        ``aggregate_cache`` mart table, partition-scoped by school year.
        Returns rows materialized. Run after ``run_until_caught_up("olap")``
        on the same cadence the reference schedules the flush."""
        from rdw_spark.plans.rdw_reports import aggregate_report

        olap = self.read_mart(spark, "olap_exam")
        rows = aggregate_report(
            olap, group_cols=["school_id", "school_year", "subject_code",
                              "grade_code"],
        )
        cache = PartitionedTable(
            self.mart.root, "aggregate_cache", "school_year",
            ["school_id", "school_year", "subject_code", "grade_code",
             "performance_level"],
        )
        if olap.isEmpty():
            return 0
        cache.overwrite(spark, rows)
        return rows.count()

    def read_aggregate_cache(self, spark: SparkSession,
                             school_years: list[int] | None = None) -> DataFrame:
        cache = PartitionedTable(
            self.mart.root, "aggregate_cache", "school_year",
            ["school_id", "school_year", "subject_code", "grade_code",
             "performance_level"],
        )
        parts = [str(y) for y in school_years] if school_years is not None else None
        return cache.read(spark, parts=parts)

    def read_mart(self, spark: SparkSession, name: str,
                  school_years: list[int] | None = None) -> DataFrame:
        """Current mart snapshot; pass ``school_years`` for a
        manifest-pruned read that opens only those year partitions (the
        common year-scoped report never touches history)."""
        parts = [str(y) for y in school_years] if school_years is not None else None
        return self._mart_tables[name].read(spark, parts=parts)

    def failed_runs(self, spark: SparkSession) -> DataFrame:
        """The documented failure check (``SELECT * FROM migrate WHERE
        status = -20``, docs/Monitoring.md:182-189) with the status name
        resolved from the ``migrate_status`` lookup — "requires immediate
        attention": the job self-suspends until :meth:`enable`."""
        dim = migrate_status_dim(spark).select(
            F.col("id").alias("status"), F.col("name").alias("status_name"))
        return (
            self.control(spark)
            .filter(F.col("status") == MigrateStatus.FAILED)
            .join(F.broadcast(dim), "status")
        )

    # ---------- migrate data-integrity validation ----------

    def validate_integrity(self, spark: SparkSession) -> DataFrame:
        """Reconcile warehouse content against every mart fact — the
        RDW_Schema ``validation`` folder analog ("a script that reports on
        data discrepancies between the data warehouse and the reporting
        data mart(s)", docs/Monitoring.md:161-162; the runbook requires a
        run before bulk operations, docs/Runbook.BulkDeleteExams.md:41-42).

        Key-level, not just counts: each fact's expected key set is derived
        from the warehouse (live rows whose ``update_import_id`` is inside
        the job's checkpoint — rows still pending migration are excused on
        both sides) and full-outer-joined against the mart. Returns one row
        per (table, school_year):
        ``expected_rows, mart_rows, missing_in_mart, orphaned_in_mart``.
        Every comparison is an equi-join on the fact key grouped by the
        year partition — shuffle-partitionable at any scale."""
        exam = self.wh.read(spark, "exam").select(
            "id", "asmt_id", "school_year", "type_code", "deleted",
            "update_import_id",
        )

        def compare(table: str, wh_side: DataFrame, keys: list[str],
                    ckpt: int) -> DataFrame:
            w = wh_side.select(
                *keys, "school_year", "deleted", "update_import_id"
            ).withColumn("_in_wh", F.lit(True))
            try:
                mart = self.read_mart(spark, table)
            except FileNotFoundError:
                # fact never published (e.g. no IAB exams yet): an empty
                # mart is a legitimate state to reconcile against
                mart = w.select(*keys, "school_year").limit(0)
            m = mart.select(
                *keys, F.col("school_year").alias("_m_year"),
            ).withColumn("_in_mart", F.lit(True))
            j = w.join(m, keys, "full_outer")
            inside_ckpt = F.coalesce(
                F.col("update_import_id") <= F.lit(ckpt), F.lit(False))
            pending = F.coalesce(
                F.col("update_import_id") > F.lit(ckpt), F.lit(False))
            expected = F.coalesce(
                F.col("_in_wh") & ~F.col("deleted"), F.lit(False)) & inside_ckpt
            missing = expected & F.col("_in_mart").isNull()
            orphan = F.col("_in_mart").isNotNull() & ~pending & (
                F.col("_in_wh").isNull() | F.col("deleted")
            )
            return (
                j.groupBy(
                    F.lit(table).alias("table"),
                    F.coalesce("school_year", "_m_year").alias("school_year"),
                )
                .agg(
                    F.sum(expected.cast("long")).alias("expected_rows"),
                    F.sum(F.col("_in_mart").isNotNull().cast("long")).alias("mart_rows"),
                    F.sum(missing.cast("long")).alias("missing_in_mart"),
                    F.sum(F.coalesce(orphan, F.lit(False)).cast("long"))
                    .alias("orphaned_in_mart"),
                )
            )

        rep_ckpt = self.checkpoint(spark, "reporting")
        olap_ckpt = self.checkpoint(spark, "olap")
        frames = [
            compare("reporting_exam", exam, ["id"], rep_ckpt),
            compare("olap_exam",
                    exam.filter(F.col("type_code").isin("ica", "sum")),
                    ["id"], olap_ckpt),
            compare("olap_iab_exam",
                    exam.filter(F.col("type_code") == "iab"), ["id"], olap_ckpt),
            compare("olap_exam_longitudinal",
                    exam.filter(F.col("type_code") == "sum"), ["id"], olap_ckpt),
        ]
        # child facts: the expected grain derives from the warehouse
        # children of in-checkpoint live exams (same derivation migrate
        # fans out, so a divergence is a real discrepancy, not model drift)
        exam_keyed = exam.select(
            F.col("id").alias("exam_id"), "asmt_id", "school_year",
            "deleted", "update_import_id",
        )
        scores = self.wh.read(spark, "exam_score").select(
            "exam_id", "claim_code").join(exam_keyed, "exam_id")
        frames.append(compare("olap_exam_score", scores,
                              ["exam_id", "claim_code"], olap_ckpt))
        sum_exams = exam.filter(F.col("type_code") == "sum").select(
            F.col("id").alias("exam_id"), "asmt_id", "school_year",
            "deleted", "update_import_id",
        )
        item_dim = self.wh.read(spark, "item").select(
            "asmt_id", F.col("key").alias("item_key"),
            "claim_code", "target_code",
        )
        targets = (
            self.wh.read(spark, "exam_item")
            .filter(F.col("score").isNotNull())
            .select("exam_id", "item_key")
            .join(sum_exams, "exam_id")
            .join(F.broadcast(item_dim), ["asmt_id", "item_key"])
            .filter(F.col("target_code").isNotNull())
            .select("exam_id", "claim_code", "target_code", "school_year",
                    "deleted", "update_import_id")
            .distinct()
        )
        frames.append(compare("olap_exam_target_score", targets,
                              ["exam_id", "claim_code", "target_code"], olap_ckpt))
        out = frames[0]
        for f in frames[1:]:
            out = out.unionByName(f)
        result = out.orderBy("table", "school_year")
        return result

    # ---------- post-migrate maintenance (reference X3, docs/Performance.md:9-28) ----------

    def maintain(self, spark: SparkSession, max_files: int = 4,
                 keep_manifests: int = 2) -> dict[str, dict[str, int]]:
        """OPTIMIZE/VACUUM analog, run after a migrate drain: compact
        partitions fragmented by many small merges, then drop snapshot
        versions (partition dirs + manifests) older than ``keep_manifests``.
        Without this, per-minute merges accumulate one version dir per run
        forever — the same failure mode the reference schedules ANALYZE /
        OPTIMIZE for."""
        report: dict[str, dict[str, int]] = {}
        for name, pt in self._mart_tables.items():
            compacted = pt.compact(spark, max_files=max_files)
            removed = pt.gc(keep_manifests=keep_manifests)
            report[name] = {"compacted_partitions": compacted, "removed_dirs": removed}
        ctrl = self.mart.part_table("migrate")
        if ctrl is not None:
            report["migrate"] = {
                "compacted_partitions": ctrl.compact(spark, max_files=max_files),
                "removed_dirs": ctrl.gc(keep_manifests=keep_manifests),
            }
        # the warehouse's own partitioned tables (import log, exam fact)
        # accumulate versions at the same cadence — one maintenance pass
        # covers the whole pipeline
        for name, rep in self.wh.maintain(
            spark, max_files=max_files, keep_manifests=keep_manifests
        ).items():
            report[f"warehouse.{name}"] = rep
        return report
