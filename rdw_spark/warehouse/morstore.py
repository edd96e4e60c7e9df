"""Merge-on-read tables: O(batch) writes for uniformly-keyed upsert targets.

The student table is the one warehouse table where partitioning cannot make
writes cheap: its natural key (``ssid``) is uniformly random, so every
micro-batch touches every partition and a partition-scoped MERGE degenerates
to a full rewrite (see store.py DEFAULT_PARTITIONED notes). The reference
faces no such problem — MySQL updates rows in place
(docs/Runbook.ImportMigrate.md:22-33) — so this class restores the
row-update cost model on immutable files the way Delta/Iceberg
merge-on-read deletion-vector tables do:

- **Write = append.** An upsert batch lands as a new *delta* directory
  containing only the inserted/changed rows — O(batch) bytes, never
  O(table).
- **Read = resolve.** The current state is ``base ∪ deltas`` with
  latest-sequence-wins per natural key (the same W1 window the reference
  uses for "most recent exam wins", docs/Runbook.Audit.md:441).
- **Compact = rebase.** ``compact()`` resolves and rewrites the base
  snapshot, after which the folded deltas are dead; run from ``maintain()``
  on the same cadence as partition compaction.

Layout::

    <root>/<table>/base-s=<M>/part-*.parquet   -- snapshot folding deltas ≤ M
    <root>/<table>/delta-s=<N>/part-*.parquet  -- append-only, N monotonic

Sequence numbers are global: a base dir named ``base-s=M`` supersedes every
delta with sequence ≤ M, so a crash between publishing a compacted base and
removing the folded delta dirs is invisible to readers (they filter
``delta s > M``). ``_SUCCESS`` markers gate visibility exactly as in
TableStore — a torn write is never read.

Invariants: one writer at a time (the migrate control protocol's
single-consumer rule, docs/Runbook.md:162); rows within one delta are
unique per key (upstream ``dropDuplicates``).
"""

from __future__ import annotations

import os
import re
import shutil

from pyspark.sql import DataFrame, SparkSession, Window, functions as F, types as T

_SEQ = "_mor_seq"


class MergeOnReadTable:
    """``mode="key"``: a delta row replaces the current row of its key
    (upsert). ``mode="group"``: a delta carries the COMPLETE new content of
    each group key it mentions (the reference's replace-children-per-parent
    write, docs/API.md:369 update semantics) — at read, a group resolves to
    all rows of the newest sequence that contains it."""

    def __init__(self, root: str, name: str, keys: list[str],
                 schema: T.StructType | None = None,
                 order_col: str | None = None, mode: str = "key",
                 auto_compact_at: int = 64):
        self.root = root
        self.name = name
        self.keys = keys
        self.schema = schema
        # tie-break within a key beyond the sequence (defensive; deltas
        # hold unique keys so it rarely fires)
        self.order_col = order_col
        self.mode = mode
        # rebase automatically once this many deltas are outstanding: at a
        # batch per minute (reference cadence, docs/Runbook.md:160-193) an
        # unmaintained table would otherwise union thousands of delta dirs
        # per read. Amortized cost: one O(table) rebase per N batches.
        self.auto_compact_at = auto_compact_at

    # ---------- layout ----------

    def _dir(self) -> str:
        return os.path.join(self.root, self.name)

    def _scan(self) -> tuple[int | None, list[int]]:
        """(base sequence or None, sorted delta sequences) — only dirs whose
        ``_SUCCESS`` marker exists (torn writes invisible)."""
        d = self._dir()
        if not os.path.isdir(d):
            return None, []
        base, deltas = None, []
        for entry in os.listdir(d):
            if not os.path.exists(os.path.join(d, entry, "_SUCCESS")):
                continue
            if m := re.fullmatch(r"base-s=(\d+)", entry):
                s = int(m.group(1))
                base = s if base is None else max(base, s)
            elif m := re.fullmatch(r"delta-s=(\d+)", entry):
                deltas.append(int(m.group(1)))
        return base, sorted(deltas)

    def current_seq(self) -> int:
        base, deltas = self._scan()
        return max([base or 0] + deltas)

    def delta_count(self) -> int:
        base, deltas = self._scan()
        return sum(1 for s in deltas if base is None or s > base)

    # ---------- read ----------

    def _load(self, spark: SparkSession, path: str, seq: int) -> DataFrame:
        reader = spark.read
        if self.schema is not None:
            reader = reader.schema(self.schema)
        return reader.parquet(path).withColumn(_SEQ, F.lit(seq))

    def read(self, spark: SparkSession, keys_of: DataFrame | None = None) -> DataFrame:
        """Resolved current state. Pass ``keys_of`` (a frame carrying the
        key columns) to scope the resolution to those keys — the semi-join
        runs *before* the window so the shuffle is O(matching rows), the
        merge-on-read analog of partition pruning."""
        base, deltas = self._scan()
        parts: list[DataFrame] = []
        if base is not None:
            parts.append(self._load(spark, os.path.join(self._dir(), f"base-s={base}"), base))
        parts += [
            self._load(spark, os.path.join(self._dir(), f"delta-s={s}"), s)
            for s in deltas if base is None or s > base
        ]
        if not parts:
            if self.schema is None:
                raise FileNotFoundError(f"merge-on-read table {self.name} is empty "
                                        "and has no declared schema")
            return spark.createDataFrame([], self.schema)
        df = parts[0]
        for p in parts[1:]:
            df = df.unionByName(p)
        if keys_of is not None:
            df = df.join(keys_of.select(*self.keys).distinct(), self.keys, "left_semi")
        if len(parts) == 1:
            # base only (post-compaction steady state): no window needed
            return df.drop(_SEQ)
        if self.mode == "group":
            w = Window.partitionBy(*self.keys)
            return (
                df.withColumn("_mx", F.max(_SEQ).over(w))
                .filter(F.col(_SEQ) == F.col("_mx")).drop("_mx", _SEQ)
            )
        order = [F.desc(_SEQ)] + (
            [F.desc_nulls_last(self.order_col)] if self.order_col else []
        )
        w = Window.partitionBy(*self.keys).orderBy(*order)
        return (
            df.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1).drop("_rn", _SEQ)
        )

    # ---------- write ----------

    def append_delta(self, df: DataFrame) -> int | None:
        """Append ``df`` (latest values for its keys) as the next delta.
        O(batch) bytes; single output file — deltas are micro-batch-sized
        and compaction rebases them away before fragmentation matters."""
        if df.isEmpty():
            return None
        seq = self.current_seq() + 1
        out = df.drop(_SEQ) if _SEQ in df.columns else df
        out.coalesce(1).write.mode("overwrite").parquet(
            os.path.join(self._dir(), f"delta-s={seq}")
        )
        if self.auto_compact_at and self.delta_count() >= self.auto_compact_at:
            self.compact(df.sparkSession)
        return seq

    def overwrite(self, df: DataFrame) -> int:
        """Publish ``df`` as the complete table content (snapshot
        semantics): a base at the current high sequence supersedes every
        existing delta; folded dirs are then dropped."""
        seq = self.current_seq() + 1
        df.write.mode("overwrite").parquet(
            os.path.join(self._dir(), f"base-s={seq}")
        )
        self.gc()
        return seq

    # ---------- maintenance ----------

    def compact(self, spark: SparkSession, min_deltas: int = 1) -> int:
        """Fold deltas into a new base snapshot (merge-on-read → copy-on-
        write rebase). No-op below ``min_deltas`` outstanding deltas.
        Returns deltas folded."""
        n = self.delta_count()
        if n < min_deltas:
            return 0
        resolved = self.read(spark)
        seq = self.current_seq()
        # stage under a dot-dir (ignored by _scan) then publish via rename:
        # the read above lazily scans the live dirs, so writing the new base
        # directly would overlap input and output
        stage = os.path.join(self._dir(), f".compact-s={seq}")
        resolved.write.mode("overwrite").parquet(stage)
        dest = os.path.join(self._dir(), f"base-s={seq}")
        if os.path.isdir(dest):
            shutil.rmtree(dest)
        os.rename(stage, dest)
        self.gc()
        return n

    def gc(self) -> int:
        """Drop dirs superseded by the newest base (folded deltas, older
        bases). Returns dirs removed."""
        base, deltas = self._scan()
        if base is None:
            return 0
        removed = 0
        d = self._dir()
        for entry in os.listdir(d):
            m = re.fullmatch(r"(?:base|delta)-s=(\d+)", entry)
            if not m:
                continue
            s = int(m.group(1))
            if s < base or (s == base and entry.startswith("delta")):
                shutil.rmtree(os.path.join(d, entry))
                removed += 1
        return removed
