"""Import-log lifecycle: the append-only change stream that drives everything.

Reference semantics (SURVEY.md §2.10 T1/T5/T6):
- every inflow creates an ``import`` row with a status lifecycle
  (reference docs/Runbook.ImportMigrate.md:22-33);
- payload digest dedup: submitting the same payload twice safely no-ops and
  returns the existing import — except GROUPS content, which always
  reprocesses (reference docs/API.md:263);
- negative status = error, queryable by name or id (reference
  docs/API.md:429; UNKNOWN_SCHOOL=-6 docs/Troubleshooting.md:326);
- ordering is by strictly-increasing ``import_id``, never wall clock
  (reference docs/Runbook.md:162, ManualDataModifications.md:115-135).

Scale note: accepts are metadata-only (one row per payload); the id counter
is a single-row max() over the latest log snapshot — at 100 TB of *data*
the import log is still tiny (reference production: ~10.9M imports,
docs/Monitoring.md:111). Payload bytes go to the archive zone keyed by
content/digest-prefix (docs/Troubleshooting.md:336-338), not into the log.
"""

from __future__ import annotations

import hashlib
import json
import os
from dataclasses import dataclass
from datetime import datetime, timezone

from pyspark.sql import DataFrame, Row, SparkSession, functions as F

from rdw_spark.warehouse.store import TableStore


class ImportStatus:
    """Codes from the reference's import_status table (docs/API.md:429,
    docs/Troubleshooting.md:326; names observed across the runbooks)."""

    ACCEPTED = 0
    PROCESSED = 1
    BAD_FORMAT = -2
    BAD_DATA = -3
    UNKNOWN_ASMT = -5
    UNKNOWN_SCHOOL = -6
    PIPELINE_FAILURE = -7

    NAMES = {
        0: "ACCEPTED", 1: "PROCESSED", -2: "BAD_FORMAT", -3: "BAD_DATA",
        -5: "UNKNOWN_ASMT", -6: "UNKNOWN_SCHOOL", -7: "PIPELINE_FAILURE",
    }


class ImportContent:
    """Content-type codes (reference docs/Runbook.ImportMigrate.md:9-20;
    EXAM observed as content=1 in docs/Monitoring.md:43)."""

    EXAM = 1
    CODES = 2
    PACKAGE = 3
    ORGANIZATION = 4
    GROUPS = 5
    NORMS = 6
    SUBJECT = 7
    EMBARGO = 8
    ACCOMMODATIONS = 9

    NAMES = {
        1: "EXAM", 2: "CODES", 3: "PACKAGE", 4: "ORGANIZATION", 5: "GROUPS",
        6: "NORMS", 7: "SUBJECT", 8: "EMBARGO", 9: "ACCOMMODATIONS",
    }


@dataclass(frozen=True)
class ImportRecord:
    id: int
    status: int
    content: int
    digest: str
    existing: bool  # True → digest dedup no-op returned the prior import


class ImportLog:
    def __init__(self, store: TableStore, archive_root: str | None = None):
        self.store = store
        self.archive_root = archive_root

    def read(self, spark: SparkSession) -> DataFrame:
        return self.store.read(spark, "import")

    def _next_id(self, spark: SparkSession) -> int:
        # ids are strictly increasing, so the max lives in the top id bucket
        # — read one partition, not the whole log
        pt = self.store.part_table("import")
        if pt is not None:
            _, man = pt.latest()
            if not man:
                return 1
            top = max(man, key=int)
            src = pt.read(spark, parts=[top])
        else:
            src = self.read(spark)
        row = src.agg(F.max("id")).collect()[0]
        return int(row[0] or 0) + 1

    def _archive(self, content: int, digest: str, payload: bytes) -> None:
        """Raw-zone archive keyed by content + digest prefix pairs, mirroring
        the reference's s3://archive/EXAM/18/B9/<digest> layout
        (docs/Troubleshooting.md:336-338)."""
        if self.archive_root is None:
            return
        d = os.path.join(
            self.archive_root, ImportContent.NAMES[content],
            digest[0:2].upper(), digest[2:4].upper(),
        )
        os.makedirs(d, exist_ok=True)
        with open(os.path.join(d, digest), "wb") as fh:
            fh.write(payload)

    def accept(
        self,
        spark: SparkSession,
        content: int,
        payload: bytes,
        content_type: str = "application/xml",
        batch: str | None = None,
        creator: str | None = None,
    ) -> ImportRecord:
        """Archive + digest-dedup + insert ACCEPTED import row (T5)."""
        return self.accept_batch(
            spark, content, [payload], content_type=content_type,
            batch=batch, creator=creator,
        )[0]

    def accept_batch(
        self,
        spark: SparkSession,
        content: int,
        payloads: list[bytes],
        content_type: str = "application/xml",
        batch: str | None = None,
        creator: str | None = None,
    ) -> list[ImportRecord]:
        """Set-based accept: ONE log read + ONE snapshot write for the whole
        batch (the reference accepts per REST call; a Spark-native bulk path
        must not pay per-document jobs). Ids are assigned in input order so
        serial-ordering semantics (T6) hold within the batch."""
        digests = [hashlib.md5(p).hexdigest().upper() for p in payloads]
        recs = self.accept_digests(
            spark, content, digests, content_type=content_type,
            batch=batch, creator=creator,
        )
        archived: set[str] = set()
        for rec, payload in zip(recs, payloads):
            if not rec.existing and rec.digest not in archived:
                self._archive(content, rec.digest, payload)
                archived.add(rec.digest)
        return recs

    def accept_digests(
        self,
        spark: SparkSession,
        content: int,
        digests: list[str],
        content_type: str = "application/xml",
        batch: str | None = None,
        creator: str | None = None,
    ) -> list[ImportRecord]:
        """Metadata-only accept: dedup + id assignment + import rows for
        already-computed payload digests, WITHOUT the payload bytes. This is
        the streaming-scale entry point — digests are computed executor-side
        (``md5`` over the payload column) and only the O(rows) digest
        strings reach the driver; archiving the bytes stays the caller's
        (distributed) concern. ``accept_batch`` is this plus driver-side
        hashing + archiving for the bounded REST-style path."""
        log = self.read(spark)
        prior: dict[str, Row] = {}
        # GROUPS always reprocess (docs/API.md:263); everything else no-ops
        if content != ImportContent.GROUPS and digests:
            rows = (
                log.filter(
                    (F.col("content") == content) & F.col("digest").isin(*set(digests))
                )
                .orderBy("id").collect()
            )
            prior = {r["digest"]: r for r in rows}  # latest id wins

        now = datetime.now(timezone.utc).replace(tzinfo=None)
        next_id = self._next_id(spark)
        out: list[ImportRecord] = []
        new_rows: list[Row] = []
        seen_new: dict[str, int] = {}
        for digest in digests:
            if digest in prior:
                p = prior[digest]
                out.append(ImportRecord(p["id"], p["status"], content, digest,
                                        existing=True))
                continue
            if content != ImportContent.GROUPS and digest in seen_new:
                out.append(ImportRecord(seen_new[digest], ImportStatus.ACCEPTED,
                                        content, digest, existing=True))
                continue
            new_rows.append(Row(
                id=next_id, status=ImportStatus.ACCEPTED, content=content,
                contentType=content_type, digest=digest, batch=batch,
                creator=creator, created=now, updated=now, message=None,
            ))
            seen_new[digest] = next_id
            out.append(ImportRecord(next_id, ImportStatus.ACCEPTED, content,
                                    digest, existing=False))
            next_id += 1

        if new_rows:
            from rdw_spark.warehouse import schemas as S

            # partition-scoped append: only the tail id-bucket is rewritten,
            # the rest of the log stays untouched on disk (T6 ordering is by
            # id, which the bucketing preserves)
            self.store.merge_rows(
                spark, "import", spark.createDataFrame(new_rows, S.IMPORT), ["id"]
            )
        return out

    def set_status(
        self, spark: SparkSession, import_id: int, status: int,
        message: str | list | dict | None = None,
    ) -> None:
        """Point status transition: reads and rewrites ONE id bucket —
        O(bucket) I/O per transition instead of the O(table) full-snapshot
        rewrite this used to cost."""
        from rdw_spark.warehouse.store import IMPORT_ID_BUCKET

        if message is not None and not isinstance(message, str):
            message = json.dumps(message)
        bucket = str(import_id // IMPORT_ID_BUCKET)
        row = (
            self.store.read_partitions(spark, "import", [bucket])
            .filter(F.col("id") == import_id)
            .withColumns({
                "status": F.lit(status),
                "message": F.lit(message),
                "updated": F.current_timestamp(),
            })
        )
        self.store.merge_rows(spark, "import", row, ["id"])

    def by_status(self, spark: SparkSession, status: int) -> DataFrame:
        """Backlog by status — the resubmit entry point (docs/API.md:422-449):
        after reference data arrives, failed imports (e.g. UNKNOWN_SCHOOL)
        are re-parsed from the archive in import-id order."""
        return self.read(spark).filter(F.col("status") == status).orderBy("id")

    def archived_payload_path(self, content: int, digest: str) -> str:
        """Archive path for a payload — digest-prefix-pair layout
        (docs/Troubleshooting.md:336-338). Used both for driver-side reads
        (bounded replay) and to build path lists for distributed reads
        (mass replay / streaming)."""
        return os.path.join(
            self.archive_root, ImportContent.NAMES[content],
            digest[0:2].upper(), digest[2:4].upper(), digest,
        )

    def read_archived_payload(self, content: int, digest: str) -> bytes:
        with open(self.archived_payload_path(content, digest), "rb") as fh:
            return fh.read()
