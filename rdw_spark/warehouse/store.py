"""Parquet-backed warehouse table store with MERGE-upsert + audit capture.

Reference semantics being reproduced (SURVEY.md §2.2 K1, §4 X12):
- every validated entity is *upserted* keyed by its natural id, carrying
  import lineage (`import_id` on create, `update_import_id` on every
  mutation, µs `created`/`updated` — reference docs/Runbook.ImportMigrate.md:22-33);
- deletes are *soft* (`deleted` flag) where the reference has one
  (reference docs/Runbook.BulkDeleteExams.md:24-30);
- audited tables get a before-image row per mutation in `audit_<table>`
  with `(action, audited, database_user)` — the reference does this with
  MySQL triggers (docs/Runbook.Audit.md:68-76); we emit the audit rows from
  the MERGE itself, controlled by an ``audit_enabled`` switch mirroring the
  reference's AUDIT_TRIGGER_ENABLE setting (docs/Runbook.Audit.md:81-101).

Storage model — versioned snapshots:
    <root>/<table>/v=N/part-*.parquet
Readers pick the highest N whose ``_SUCCESS`` marker exists, so a writer
crash mid-write is invisible (T3 two-phase semantics: the new version *is*
the staging area and the ``_SUCCESS`` rename is the atomic publish).
Audit tables are append-only version dirs read with a glob (no index —
reference keeps audit tables unindexed on purpose, docs/Runbook.Audit.md:78-79).

Scale notes (100 TB): snapshot-rewrite is correct-but-heavy for the full
fact table; on a cluster the same class swaps its write path for Delta/Iceberg
``MERGE INTO`` without changing callers. The change-detection join is an
equi-join on the natural key — the updates side of a micro-batch is orders of
magnitude smaller than the table, so AQE broadcasts it; the snapshot rewrite
is partitioned by ``school_year`` for facts so only touched partitions
need rewriting (partition-overwrite, reference X7).

Surrogate ids are ``xxhash64`` of the natural key: deterministic across
retries and fully distributed (no sequence bottleneck at 1000 executors).
"""

from __future__ import annotations

import os
import re

from pyspark.sql import DataFrame, SparkSession, functions as F, types as T

from rdw_spark.warehouse import schemas as S
from rdw_spark.warehouse.morstore import MergeOnReadTable
from rdw_spark.warehouse.partstore import PartitionedTable

# Tables whose write path must be O(touched partitions), not O(table):
# - the import log takes a status transition per payload at a batch per
#   minute (reference docs/Runbook.md:160-193) — bucketed by id range so a
#   transition rewrites one ~100k-row bucket, never the whole 10.9M-row
#   log (reference production size, docs/Monitoring.md:111);
# - exam is the 100 TB fact table, ingest batches cluster on the current
#   school year, and an exam's year is immutable (it derives from the
#   asmt in the natural key) — a year-partitioned merge touches one
#   partition. (student is NOT here: its natural key is uniformly
#   random, so every batch touches every bucket and partitioning buys
#   nothing for the write path.)
IMPORT_ID_BUCKET = 100_000

# name -> (partition expr, merge keys, within-partition cluster columns —
# the cluster sort also coalesces each partition write to one file instead
# of one file per shuffle task)
DEFAULT_PARTITIONED: dict[str, tuple[str, list[str], tuple[str, ...]]] = {
    "import": (f"id DIV {IMPORT_ID_BUCKET}", ["id"], ("id",)),
    "exam": ("school_year", ["opp_id", "asmt_id"], ("school_id", "student_id")),
}

# Tables whose natural key is uniformly random (every batch touches every
# partition, so partitioning cannot scope the write): merge-on-read —
# upserts append O(batch) delta files, reads resolve latest-per-key with
# the W1 window, maintain() compacts deltas back into the base snapshot.
DEFAULT_MERGE_ON_READ: dict[str, list[str]] = {
    "student": ["ssid"],
}

# Fact-sized child tables written replace-per-parent (an exam update
# rewrites its items/scores/accommodations, docs/API.md:369). exam_item is
# the reference's largest production table; their parent keys are hashes,
# so — like student — partitioning can't scope the write and the old
# whole-snapshot rewrite was O(table) per micro-batch. Group-mode
# merge-on-read appends the batch (complete per-parent content) and
# resolves newest-sequence-per-parent at read.
DEFAULT_MERGE_ON_READ_GROUPS: dict[str, str] = {
    "exam_item": "exam_id",
    "exam_score": "exam_id",
    "exam_available_accommodation": "exam_id",
    "exam_item_trait_score": "exam_id",
    "student_ethnicity": "student_id",
}

_AUDIT_FIELDS = [
    T.StructField("action", T.StringType(), False),      # update | delete
    T.StructField("audited", T.TimestampType(), False),
    T.StructField("database_user", T.StringType(), False),
]

# child tables the reference audits (docs/Runbook.Audit.md:54-64): a
# replace-per-parent write records the replaced rows as 'delete'
# before-images (the reference's triggers fire per child DELETE)
AUDITED_CHILDREN = {
    "exam_item", "exam_score", "exam_available_accommodation",
    "student_ethnicity", "student_group_membership", "user_student_group",
}


def surrogate_id(*key_cols: str):
    """Deterministic 64-bit surrogate id from the natural key."""
    return F.xxhash64(*[F.col(c) for c in key_cols])


class TableStore:
    def __init__(self, root: str, audit_enabled: bool = True, user: str = "rdw_spark",
                 schemas: dict | None = None, natural_keys: dict | None = None,
                 partitioned: dict[str, tuple[str, list[str]]] | None = None,
                 merge_on_read: dict[str, list[str]] | None = None,
                 merge_on_read_groups: dict[str, str] | None = None):
        self.root = root
        self.audit_enabled = audit_enabled
        self._settings: dict[str, str] | None = None
        self.user = user
        self.schemas = schemas if schemas is not None else S.SCHEMAS
        self.natural_keys = natural_keys if natural_keys is not None else S.NATURAL_KEYS
        if partitioned is None:
            partitioned = DEFAULT_PARTITIONED
        self._part_tables = {
            name: PartitionedTable(root, name, spec[0], spec[1],
                                   schema=self.schemas[name],
                                   sort_cols=tuple(spec[2]) if len(spec) > 2 else ())
            for name, spec in partitioned.items()
            if name in self.schemas
        }
        if merge_on_read is None:
            merge_on_read = DEFAULT_MERGE_ON_READ
        self._mor_tables = {
            name: MergeOnReadTable(root, name, keys, schema=self.schemas[name])
            for name, keys in merge_on_read.items()
            if name in self.schemas
        }
        if merge_on_read_groups is None:
            merge_on_read_groups = DEFAULT_MERGE_ON_READ_GROUPS
        self._mor_tables.update({
            name: MergeOnReadTable(root, name, [group_col],
                                   schema=self.schemas[name], mode="group")
            for name, group_col in merge_on_read_groups.items()
            if name in self.schemas
        })
        os.makedirs(root, exist_ok=True)

    # ---------- snapshot plumbing ----------

    def _table_dir(self, name: str) -> str:
        return os.path.join(self.root, name)

    def _versions(self, name: str) -> list[int]:
        d = self._table_dir(name)
        if not os.path.isdir(d):
            return []
        out = []
        for entry in os.listdir(d):
            m = re.fullmatch(r"v=(\d+)", entry)
            if m and os.path.exists(os.path.join(d, entry, "_SUCCESS")):
                out.append(int(m.group(1)))
        return sorted(out)

    def latest_version(self, name: str) -> int | None:
        vs = self._versions(name)
        return vs[-1] if vs else None

    def _ensure_part_layout(self, spark: SparkSession, name: str) -> None:
        """Auto-convert a legacy whole-snapshot ``<table>/v=N`` dir into the
        manifest-based partitioned layout the first time the table is
        touched. Without this, a warehouse written by an older version would
        silently read as empty (no manifest → empty frame)."""
        pt = self._part_tables[name]
        ver, _ = pt.latest()
        if ver:
            return
        legacy = self._versions(name)
        if not legacy:
            return
        df = spark.read.schema(self.schemas[name]).parquet(
            os.path.join(self._table_dir(name), f"v={legacy[-1]}")
        )
        pt.overwrite(spark, df)

    def _ensure_mor_layout(self, spark: SparkSession, name: str) -> None:
        """Same auto-conversion as ``_ensure_part_layout`` for merge-on-read
        tables: fold a legacy ``<table>/v=N`` snapshot into the base."""
        mor = self._mor_tables[name]
        base, deltas = mor._scan()
        if base is not None or deltas:
            return
        legacy = self._versions(name)
        if not legacy:
            return
        df = spark.read.schema(self.schemas[name]).parquet(
            os.path.join(self._table_dir(name), f"v={legacy[-1]}")
        )
        mor.overwrite(df)

    def read(self, spark: SparkSession, name: str) -> DataFrame:
        """Current snapshot, or an empty frame with the declared schema."""
        if name in self._mor_tables:
            self._ensure_mor_layout(spark, name)
            return self._mor_tables[name].read(spark)
        if name in self._part_tables:
            self._ensure_part_layout(spark, name)
            return self._part_tables[name].read(spark)
        v = self.latest_version(name)
        if v is None:
            return spark.createDataFrame([], self.schemas[name])
        return spark.read.schema(self.schemas[name]).parquet(
            os.path.join(self._table_dir(name), f"v={v}")
        )

    def read_partitions(self, spark: SparkSession, name: str, parts: list[str]) -> DataFrame:
        """Partition-scoped read (manifest-level pruning); falls back to the
        full snapshot for unpartitioned tables."""
        if name in self._part_tables:
            self._ensure_part_layout(spark, name)
            return self._part_tables[name].read(spark, parts=parts)
        return self.read(spark, name)

    def write_snapshot(self, df: DataFrame, name: str) -> int:
        """Write the next version dir; the _SUCCESS marker is the atomic publish."""
        if name in self._mor_tables:
            return self._mor_tables[name].overwrite(df)
        if name in self._part_tables:
            return self._part_tables[name].overwrite(df.sparkSession, df)
        v = (self.latest_version(name) or 0) + 1
        path = os.path.join(self._table_dir(name), f"v={v}")
        df.write.mode("overwrite").parquet(path)
        return v

    def merge_rows(self, spark: SparkSession, name: str, rows: DataFrame,
                   keys: list[str] | None = None) -> int:
        """Replace-by-key upsert. Partitioned tables rewrite only the
        partitions the rows land in; unpartitioned tables fall back to a
        whole-snapshot anti-join merge."""
        if name in self._mor_tables:
            # replace-by-key under latest-wins resolution IS an append
            self._ensure_mor_layout(spark, name)
            n = rows.count()
            self._mor_tables[name].append_delta(rows)
            return n
        if name in self._part_tables:
            self._ensure_part_layout(spark, name)
            return self._part_tables[name].merge_rows(spark, rows, keys)
        keys = keys or self.natural_keys[name]
        cur = self.read(spark, name)
        kept = cur.join(rows.select(*keys).distinct(), keys, "left_anti")
        out = kept.unionByName(rows.select(*cur.columns))
        self.write_snapshot(out, name)
        return rows.count()

    def part_table(self, name: str) -> PartitionedTable | None:
        return self._part_tables.get(name)

    def mor_table(self, name: str) -> MergeOnReadTable | None:
        return self._mor_tables.get(name)

    def maintain(self, spark: SparkSession, max_files: int = 4,
                 keep_manifests: int = 2) -> dict[str, dict[str, int]]:
        """Compact + GC every partitioned table this store owns (import
        log, exam fact) and rebase merge-on-read tables (student). Without
        this the per-batch merges accumulate one version/delta dir per
        write forever — same hook MigrateEngine.maintain provides for the
        marts; run it on the same cadence."""
        report = {
            name: {
                "compacted_partitions": pt.compact(spark, max_files=max_files),
                "removed_dirs": pt.gc(keep_manifests=keep_manifests),
            }
            for name, pt in self._part_tables.items()
        }
        for name, mor in self._mor_tables.items():
            report[name] = {"folded_deltas": mor.compact(spark)}
        return report

    # ---------- settings (docs/Runbook.Audit.md:83-101) ----------

    AUDIT_SETTING = "AUDIT_TRIGGER_ENABLE"
    # embargo auditing may not be disabled (docs/Runbook.Audit.md:82)
    ALWAYS_AUDITED = {"state_embargo", "district_embargo"}

    def setting(self, spark: SparkSession, name: str) -> str | None:
        """Current value of a ``setting`` row, None when unset. Values are
        cached per store instance, keyed by the setting table's snapshot
        version: a change made through ANY store instance (or out-of-band)
        bumps the version, so a long-lived store picks it up on its next
        read instead of honoring a stale value until restart. The version
        probe is a directory listing — no Spark job."""
        if "setting" not in self.schemas:
            return None  # store built without control tables (e.g. marts)
        ver = self.latest_version("setting")
        if self._settings is None or self._settings[0] != ver:
            self._settings = (ver, {
                r["name"]: r["value"]
                for r in self.read(spark, "setting").collect()
            })
        return self._settings[1].get(name)

    def set_setting(self, spark: SparkSession, name: str, value: str) -> None:
        """UPDATE setting SET value=… WHERE name=… (docs/Runbook.Audit.md:91-101)."""
        row = spark.createDataFrame([(name, value)], S.SETTING)
        self.merge_rows(spark, "setting", row, ["name"])
        self._settings = None

    def _audit_on(self, spark: SparkSession, table: str) -> bool:
        """The reference's trigger gate: audit rows are written only when
        the AUDIT_TRIGGER_ENABLE setting is TRUE (defaulting to on when no
        setting row exists) — except embargo tables, whose auditing the
        setting may not disable. ``audit_enabled=False`` at construction
        means the store has no audit capture at all (the runtime toggle
        refines an audit-capable store, it cannot conjure one)."""
        if not self.audit_enabled:
            return False
        if table in self.ALWAYS_AUDITED:
            return True
        val = self.setting(spark, self.AUDIT_SETTING)
        return True if val is None else val.upper() == "TRUE"

    # ---------- audit ----------

    def _audit_schema(self, name: str) -> T.StructType:
        return T.StructType(list(self.schemas[name].fields) + _AUDIT_FIELDS)

    def read_audit(self, spark: SparkSession, name: str) -> DataFrame:
        d = self._table_dir(f"audit_{name}")
        if not os.path.isdir(d) or not os.listdir(d):
            return spark.createDataFrame([], self._audit_schema(name))
        return spark.read.schema(self._audit_schema(name)).parquet(os.path.join(d, "v=*"))

    def _append_audit(self, before_image: DataFrame, name: str, action: str) -> None:
        if not self._audit_on(before_image.sparkSession, name):
            return
        rows = before_image.withColumns({
            "action": F.lit(action),
            "audited": F.current_timestamp(),
            "database_user": F.lit(self.user),
        })
        d = self._table_dir(f"audit_{name}")
        nxt = 1 + max(
            [int(m.group(1)) for e in (os.listdir(d) if os.path.isdir(d) else [])
             if (m := re.fullmatch(r"v=(\d+)", e))],
            default=0,
        )
        rows.write.mode("overwrite").parquet(os.path.join(d, f"v={nxt}"))

    # ---------- MERGE upsert (K1 / X12) ----------

    def merge_upsert(
        self,
        spark: SparkSession,
        name: str,
        updates: DataFrame,
        import_id: int,
        keys: list[str] | None = None,
    ) -> dict[str, int]:
        """Upsert ``updates`` into ``name`` keyed by the table's natural key.

        ``updates`` carries natural-key + payload columns (no lineage except,
        optionally, a per-row ``import_id`` column — the reference stamps each
        entity with the exact import that created/updated it, and a batch may
        span many imports; rows without it fall back to the ``import_id``
        argument). Returns counts {"inserted": n, "updated": n, "unchanged": n}.

        For partitioned tables the whole MERGE — change-detection join,
        audit, and write — is scoped to the partitions the updates land in
        (valid because the partition value is immutable per natural key),
        so "unchanged" counts rows of touched partitions only.
        """
        keys = keys or self.natural_keys[name]
        schema = self.schemas[name]
        has_delete = "deleted" in schema.fieldNames()
        lineage = {"import_id", "update_import_id", "created", "updated", "id"}
        payload_cols = [
            f.name for f in schema.fields
            if f.name not in lineage and f.name not in keys and f.name != "deleted"
        ]

        upd = updates.dropDuplicates(keys)
        if "import_id" not in upd.columns:
            upd = upd.withColumn("import_id", F.lit(import_id).cast("long"))
        else:
            upd = upd.withColumn(
                "import_id", F.coalesce(F.col("import_id").cast("long"),
                                        F.lit(import_id).cast("long"))
            )
        # normalize updates to declared payload types so change-detection
        # compares like-for-like
        for f in schema.fields:
            if f.name in upd.columns and f.name not in lineage:
                upd = upd.withColumn(f.name, F.col(f.name).cast(f.dataType))
        for c in payload_cols:
            if c not in upd.columns:
                upd = upd.withColumn(c, F.lit(None).cast(schema[c].dataType))

        pt = self._part_tables.get(name)
        mor = self._mor_tables.get(name)
        if mor is not None and mor.mode == "group":
            raise ValueError(
                f"merge_upsert({name}): group-mode tables take complete "
                "per-parent content via replace_children, not row upserts"
            )
        if mor is not None:
            # merge-on-read: the change-detection join needs only the
            # touched keys' current values — the semi-join runs before the
            # resolution window, and the write below appends only the
            # inserted/changed rows (O(batch) bytes)
            self._ensure_mor_layout(spark, name)
            current = mor.read(spark, keys_of=upd)
        elif pt is not None:
            self._ensure_part_layout(spark, name)
            parts = pt.parts_of(upd)
            # fail fast on a null partition value: silently routing to the
            # __NULL__ partition would leave the real partition unread and
            # duplicate the natural key across two partitions
            if "__NULL__" in parts:
                raise ValueError(
                    f"merge_upsert({name}): updates produce a null partition "
                    f"value for expression `{pt.part_expr}` — the partition "
                    "source columns must be present and non-null"
                )
            current = pt.read(spark, parts=parts)
        else:
            current = self.read(spark, name)

        def fingerprint(df: DataFrame) -> DataFrame:
            return df.withColumn(
                "_fp", F.md5(F.to_json(F.struct(*[F.col(c) for c in payload_cols])))
            )

        cur = fingerprint(current).alias("cur")
        new = fingerprint(upd).alias("new")
        # counts, audit-key selection, and the snapshot write all consume the
        # merge join — cache so the table scan + fingerprints run once
        joined = cur.join(new, on=keys, how="full_outer").cache()

        now = F.current_timestamp()
        is_insert = F.col("cur._fp").isNull()
        is_changed = F.col("new._fp").isNotNull() & F.col("cur._fp").isNotNull() & (
            F.col("cur._fp") != F.col("new._fp")
        )

        sel = [F.coalesce(F.col(f"cur.id"), surrogate_id(*keys)).alias("id")] if (
            "id" in schema.fieldNames()
        ) else []
        sel += [F.col(k) for k in keys]
        for c in payload_cols:
            sel.append(
                F.when(F.col("new._fp").isNotNull(), F.col(f"new.{c}"))
                .otherwise(F.col(f"cur.{c}")).alias(c)
            )
        if has_delete:
            sel.append(
                F.when(F.col("new._fp").isNotNull(), F.lit(False))
                .otherwise(F.col("cur.deleted")).alias("deleted")
            )
        sel += [
            F.coalesce(F.col("cur.import_id"), F.col("new.import_id")).alias("import_id"),
            F.when(is_insert | is_changed, F.col("new.import_id"))
            .otherwise(F.col("cur.update_import_id")).alias("update_import_id"),
            F.coalesce(F.col("cur.created"), now).alias("created"),
            F.when(is_insert | is_changed, now).otherwise(F.col("cur.updated")).alias("updated"),
        ]
        # a payload-identical update still clears a soft-delete flag
        # (re-importing a reset exam resurrects it, API.md:369) — count
        # those so the skip-write shortcut below cannot drop them
        is_resurrect = (
            (~is_insert & ~is_changed & F.col("new._fp").isNotNull()
             & F.col("cur.deleted"))
            if has_delete else F.lit(False)
        )
        # _dirty marks the rows a merge-on-read delta must carry
        merged = joined.select(
            *sel, (is_insert | is_changed | is_resurrect).alias("_dirty")
        ).select(*schema.fieldNames(), "_dirty")
        counts = joined.agg(
            F.sum(is_insert.cast("long")).alias("inserted"),
            F.sum(is_changed.cast("long")).alias("updated"),
            F.sum((~is_insert & ~is_changed).cast("long")).alias("unchanged"),
            F.sum(is_resurrect.cast("long")).alias("resurrected"),
        ).collect()[0]

        if int(counts["updated"] or 0):  # audit job only when something changed
            changed_keys = joined.filter(is_changed).select(*keys)
            before = current.join(F.broadcast(changed_keys), on=keys, how="left_semi")
            self._append_audit(before, name, "update")

        if (not int(counts["inserted"] or 0) and not int(counts["updated"] or 0)
                and not int(counts["resurrected"] or 0)):
            # pure no-op batch (digest-identical replay, nothing to
            # un-delete): the merged frame is byte-identical to the
            # current snapshot — skip the write
            pass
        elif mor is not None:
            # append only the inserted/changed/resurrected rows: the
            # untouched keys' current rows stay authoritative in the base
            mor.append_delta(merged.filter(F.col("_dirty")).drop("_dirty"))
        elif pt is not None:
            # merged IS the complete new content of the touched partitions
            pt.replace_parts(spark, merged.drop("_dirty"))
        else:
            self.write_snapshot(merged.drop("_dirty"), name)
        joined.unpersist()
        return {
            "inserted": int(counts["inserted"] or 0),
            "updated": int(counts["updated"] or 0),
            "unchanged": int(counts["unchanged"] or 0),
        }

    def soft_delete(
        self, spark: SparkSession, name: str, keys_df: DataFrame, import_id: int
    ) -> int:
        """Soft-delete rows matching ``keys_df`` (J10 write-side; audit 'delete')."""
        keys = self.natural_keys[name]
        current = self.read(spark, name)
        hit = current.join(F.broadcast(keys_df.select(*keys).distinct()), keys, "left_semi")
        n = hit.count()
        if n == 0:
            return 0
        self._append_audit(hit, name, "delete")
        mor = self._mor_tables.get(name)
        if mor is not None:
            flipped = hit.withColumns({
                "deleted": F.lit(True),
                "update_import_id": F.lit(import_id).cast("long"),
                "updated": F.current_timestamp(),
            })
            mor.append_delta(flipped.select(*self.schemas[name].fieldNames()))
            return n
        pt = self._part_tables.get(name)
        if pt is not None:
            # merge only the flipped rows — rewrites just their partitions
            flipped = hit.withColumns({
                "deleted": F.lit(True),
                "update_import_id": F.lit(import_id).cast("long"),
                "updated": F.current_timestamp(),
            })
            pt.merge_rows(spark, flipped.select(*self.schemas[name].fieldNames()), keys)
            return n
        merged = (
            current.join(keys_df.select(*keys).distinct().withColumn("_del", F.lit(True)),
                         keys, "left")
            .withColumn("deleted", F.when(F.col("_del"), F.lit(True)).otherwise(F.col("deleted")))
            .withColumn("update_import_id",
                        F.when(F.col("_del"), F.lit(import_id))
                        .otherwise(F.col("update_import_id")))
            .withColumn("updated",
                        F.when(F.col("_del"), F.current_timestamp())
                        .otherwise(F.col("updated")))
            .drop("_del")
        )
        self.write_snapshot(merged.select(*self.schemas[name].fieldNames()), name)
        return n

    # ---------- child tables (replace-by-parent, reference exam children diffing) ----------

    def replace_children(
        self,
        spark: SparkSession,
        name: str,
        parent_col: str,
        children: DataFrame,
    ) -> None:
        """Replace all child rows whose parent appears in ``children``
        (reference rewrites exam_item/exam_score/… when an exam is updated,
        docs/API.md:369 update semantics)."""
        schema = self.schemas[name]
        typed = children.select(
            *[F.col(f.name).cast(f.dataType).alias(f.name) for f in schema.fields]
        )
        parents = typed.select(parent_col).distinct()
        mor = self._mor_tables.get(name)
        if mor is not None and mor.mode == "group":
            # O(batch): the delta IS the complete new content of its
            # parents; read resolves newest-sequence-per-parent
            self._ensure_mor_layout(spark, name)
            if name in AUDITED_CHILDREN and self._audit_on(spark, name):
                replaced = mor.read(spark, keys_of=parents)
                if not replaced.isEmpty():
                    self._append_audit(replaced, name, "delete")
            mor.append_delta(typed)
            return
        current = self.read(spark, name)
        kept = current.join(F.broadcast(parents), parent_col, "left_anti")
        if name in AUDITED_CHILDREN and self._audit_on(spark, name):
            replaced = current.join(F.broadcast(parents), parent_col, "left_semi")
            if not replaced.isEmpty():
                self._append_audit(replaced, name, "delete")
        self.write_snapshot(kept.unionByName(typed), name)
