"""Manifest-versioned, partition-scoped parquet tables.

The whole-snapshot ``TableStore`` layout (``<table>/v=N``) is correct but
O(table) per write: every micro-batch rewrites every row. At the 100 TB
target the marts and the import log take a batch per minute
(reference docs/Runbook.md:160-193), so the write path must be
O(touched partitions), not O(table). This module is the storage layer that
makes that true — the same role Delta/Iceberg MERGE INTO plays on a real
cluster, reduced to the two primitives we need (replace-rows-by-key and
whole-partition rewrite) with no external dependency:

Layout::

    <root>/<table>/part=<value>/v=<N>/part-*.parquet   -- partition data
    <root>/<table>/_manifests/v<N>.json                -- snapshot manifests

A *snapshot* is a manifest: ``{"version": N, "parts": {part_value: M, ...}}``
mapping each partition to the version directory holding its current data —
or, for append-accumulated partitions, to a LIST of directories
(``[M, "aB1", "aB7", ...]``) whose union is the partition's content (the
Iceberg append-manifest model; ``compact()``/``merge_rows`` collapse the
list back to one directory).
Writers stage new partition dirs, then publish by atomically renaming a new
manifest into place — a crashed writer leaves unreferenced dirs, never a
torn table (same two-phase contract as TableStore's ``_SUCCESS`` publish,
reference docs/Runbook.md:164). Readers resolve the newest manifest and read
exactly the referenced dirs, so a merge that touched one school year leaves
every other year's files byte-identical and unread.

Invariants callers must hold:
- the partition value is a deterministic expression over data columns
  (``part_expr``), e.g. ``school_year``, ``id DIV 100000`` — it is
  recomputed, never stored;
- a key's partition value is immutable (an exam's school_year never moves;
  an import id never changes buckets). A moved key would strand its old
  copy in the old partition;
- one writer per table at a time (the reference's single-consumer rule,
  docs/Runbook.md:162, which the migrate control protocol already
  enforces). Concurrent writers could both stage version N+1; the last
  manifest rename would win and orphan the other's dirs — readers would
  still never see a torn table.
"""

from __future__ import annotations

import json
import os
import shutil
import urllib.parse

from pyspark.sql import DataFrame, SparkSession, functions as F, types as T

_MANIFEST_DIR = "_manifests"


class PartitionedTable:
    def __init__(
        self,
        root: str,
        name: str,
        part_expr: str,
        keys: list[str],
        schema: T.StructType | None = None,
        sort_cols: tuple[str, ...] = (),
    ):
        self.root = root
        self.name = name
        self.part_expr = part_expr
        self.keys = keys
        self.schema = schema
        self.sort_cols = sort_cols

    # ---------- layout ----------

    def _dir(self) -> str:
        return os.path.join(self.root, self.name)

    def _part_dir(self, part: str, version: int | str) -> str:
        return os.path.join(self._dir(), f"part={urllib.parse.quote(part, safe='')}",
                            f"v={version}")

    @staticmethod
    def _vers(man_value) -> list:
        """Normalize a manifest parts value: plain version (int) or
        append-accumulated list of versions."""
        return man_value if isinstance(man_value, list) else [man_value]

    def _manifest_path(self, version: int) -> str:
        return os.path.join(self._dir(), _MANIFEST_DIR, f"v{version:012d}.json")

    def versions(self) -> list[int]:
        """Snapshot versions still on disk, oldest first — the time-travel
        window (bounded by gc's ``keep_manifests``)."""
        d = os.path.join(self._dir(), _MANIFEST_DIR)
        if not os.path.isdir(d):
            return []
        out = []
        for entry in os.listdir(d):
            if entry.startswith("v") and entry.endswith(".json"):
                try:
                    out.append(int(entry[1:-5]))
                except ValueError:
                    continue
        return sorted(out)

    def manifest(self, version: int) -> dict[str, int]:
        """{partition value: data version} as of snapshot ``version``."""
        with open(self._manifest_path(version)) as fh:
            return dict(json.load(fh)["parts"])

    def latest(self) -> tuple[int, dict[str, int]]:
        """(snapshot version, {partition value: data version}); (0, {}) when
        the table has never been published."""
        vs = self.versions()
        if not vs:
            return 0, {}
        return vs[-1], self.manifest(vs[-1])

    def _publish(self, version: int, parts: dict[str, int],
                 schema_json: str | None = None) -> None:
        d = os.path.join(self._dir(), _MANIFEST_DIR)
        os.makedirs(d, exist_ok=True)
        tmp = os.path.join(d, f".tmp-v{version}.json")
        body = {"version": version, "parts": parts}
        if schema_json is None:
            schema_json = self._manifest_schema()
        if schema_json is not None:
            # persisted so an all-rows-deleted table still reads as a typed
            # empty frame (schema-less tables would otherwise be unreadable
            # once their last partition is dropped)
            body["schema"] = schema_json
        with open(tmp, "w") as fh:
            json.dump(body, fh)
        os.replace(tmp, self._manifest_path(version))  # atomic publish

    def _manifest_schema(self) -> str | None:
        """Schema JSON recorded by the newest manifest, if any."""
        ver, _ = self.latest()
        if not ver:
            return None
        with open(self._manifest_path(ver)) as fh:
            return json.load(fh).get("schema")

    # ---------- read ----------

    def read(self, spark: SparkSession, parts: list[str] | None = None,
             version: int | None = None) -> DataFrame:
        """Current snapshot — all partitions, or just ``parts`` (the
        manifest-level analog of partition pruning; year- or bucket-scoped
        readers pass the values they need and never open other dirs).

        ``version`` reads an older snapshot instead (time travel): every
        manifest still on disk — bounded by ``gc(keep_manifests=…)`` — is a
        complete, immutable view, because data dirs are copy-on-write and
        gc only deletes dirs unreferenced by every kept manifest. The same
        read-at-a-manifest mechanism Delta/Iceberg expose as VERSION AS OF."""
        if version is not None:
            if version not in self.versions():
                raise ValueError(
                    f"{self.name}: snapshot v{version} not on disk "
                    f"(available: {self.versions() or 'none'})"
                )
            man = self.manifest(version)
        else:
            _, man = self.latest()
        full_man = man
        if parts is not None:
            man = {p: v for p, v in man.items() if p in set(parts)}
        paths = [
            self._part_dir(p, v)
            for p, vs in sorted(man.items())
            for v in self._vers(vs)
        ]
        if not paths:
            if self.schema is not None:
                return spark.createDataFrame([], self.schema)
            if full_man:
                # published table, but no partition matches the filter
                # (e.g. a report year with no data yet): empty frame with
                # the table's real schema, not an error
                p, v = next(iter(sorted(full_man.items())))
                return spark.read.parquet(
                    self._part_dir(p, self._vers(v)[0])).limit(0)
            stored = self._manifest_schema()
            if stored is not None:
                # every row was deleted — typed empty frame from the
                # schema the last publish recorded
                return spark.createDataFrame([], T.StructType.fromJson(json.loads(stored)))
            raise FileNotFoundError(f"partitioned table {self.name} has no published snapshot")
        reader = spark.read
        if self.schema is not None:
            reader = reader.schema(self.schema)
        return reader.parquet(*paths)

    def read_changes(
        self,
        spark: SparkSession,
        from_version: int,
        to_version: int | None = None,
    ) -> DataFrame:
        """Change-data feed between two snapshots: every row inserted or
        deleted going from ``from_version`` to ``to_version`` (default
        latest), tagged ``_change_type`` ('insert' | 'delete'; an update
        appears as delete + insert of the key). Downstream consumers
        apply the feed instead of rescanning:
        ``old − deletes + inserts == new`` exactly (pytest-locked).

        Scale shape: the manifests are compared DRIVER-SIDE (O(parts)
        dicts), and only partitions whose data-version sets differ are
        read at all — an unchanged 100 TB table with one changed
        partition reads one partition twice, nothing else. Within a
        changed partition the row diff is two ``exceptAll`` multiset
        differences (exact, null-safe, duplicate-correct). Both
        snapshots must still be on disk (``gc(keep_manifests=…)``
        bounds the CDC window exactly like the time-travel window)."""
        vs = self.versions()
        if from_version not in vs:
            raise ValueError(
                f"{self.name}: snapshot v{from_version} not on disk "
                f"(available: {vs or 'none'})")
        if to_version is None:
            to_version = vs[-1]
        elif to_version not in vs:
            raise ValueError(
                f"{self.name}: snapshot v{to_version} not on disk "
                f"(available: {vs or 'none'})")
        m_old = self.manifest(from_version)
        m_new = self.manifest(to_version)
        changed = [
            p for p in set(m_old) | set(m_new)
            if self._vers(m_old.get(p, [])) != self._vers(m_new.get(p, []))
        ]

        def _read_parts(man: dict, parts: list[str]) -> DataFrame | None:
            paths = [
                self._part_dir(p, v)
                for p in sorted(parts) if p in man
                for v in self._vers(man[p])
            ]
            if not paths:
                return None
            reader = spark.read
            if self.schema is not None:
                reader = reader.schema(self.schema)
            return reader.parquet(*paths)

        old_df = _read_parts(m_old, changed)
        new_df = _read_parts(m_new, changed)
        if old_df is None and new_df is None:
            empty = self.read(spark, parts=[])
            return empty.withColumn("_change_type", F.lit(""))
        if old_df is None:
            old_df = new_df.limit(0)
        if new_df is None:
            new_df = old_df.limit(0)
        inserts = new_df.exceptAll(old_df).withColumn(
            "_change_type", F.lit("insert"))
        deletes = old_df.exceptAll(new_df).withColumn(
            "_change_type", F.lit("delete"))
        return inserts.unionByName(deletes)

    # ---------- write ----------

    def _part_col(self):
        # null partition values get a sentinel so the directory name, the
        # manifest key, and the recomputed value on read-back all agree
        # (Spark's own __HIVE_DEFAULT_PARTITION__ would NOT round-trip: the
        # recomputed expression yields null, never the sentinel string)
        return F.coalesce(F.expr(self.part_expr).cast("string"), F.lit("__NULL__"))

    def parts_of(self, df: DataFrame) -> list[str]:
        """Partition values a frame's rows land in (collect is bounded by
        the partition count, e.g. school years)."""
        return [
            r["_p"] for r in df.select(self._part_col().alias("_p")).distinct().collect()
        ]

    def _write_parts(self, out: DataFrame, version: int | str) -> list[str]:
        """Stage ``out`` (which carries ``_part``) as one partitioned write,
        then move each staged partition dir into its versioned home. Returns
        the partition values written."""
        stage = os.path.join(self._dir(), f"_stage-v{version}")
        sort_cols = [c for c in self.sort_cols if c in out.columns]
        if sort_cols:
            # cluster within each partition so min/max row-group stats prune
            # file reads for the common scoped queries (Z-ORDER analog)
            out = out.repartition(F.col("_part")).sortWithinPartitions("_part", *sort_cols)
        out.write.mode("overwrite").partitionBy("_part").parquet(stage)
        written: list[str] = []
        for entry in os.listdir(stage):
            if not entry.startswith("_part="):
                continue
            part = urllib.parse.unquote(entry[len("_part="):])
            dest = self._part_dir(part, version)
            os.makedirs(os.path.dirname(dest), exist_ok=True)
            if os.path.isdir(dest):
                shutil.rmtree(dest)  # leftover from a crashed writer
            os.rename(os.path.join(stage, entry), dest)
            written.append(part)
        shutil.rmtree(stage, ignore_errors=True)
        return written

    def merge_rows(self, spark: SparkSession, rows: DataFrame, keys: list[str] | None = None) -> int:
        """Replace-by-key upsert touching only the partitions ``rows`` lands
        in: read those partitions' current data, anti-join on the key, union
        the new rows, rewrite those partitions, publish. Everything else is
        untouched on disk."""
        keys = keys or self.keys
        batch = rows.withColumn("_part", self._part_col()).cache()
        try:
            touched = [r["_part"] for r in batch.select("_part").distinct().collect()]
            if not touched:
                return 0
            n = batch.count()
            ver, man = self.latest()
            cols = rows.columns
            cur_paths = [
                self._part_dir(p, v)
                for p in touched if p in man
                for v in self._vers(man[p])
            ]
            if cur_paths:
                reader = spark.read
                if self.schema is not None:
                    reader = reader.schema(self.schema)
                cur = reader.parquet(*cur_paths)
                kept = (
                    cur.join(batch.select(*keys).distinct(), keys, "left_anti")
                    .withColumn("_part", self._part_col())
                )
                out = kept.select(*cols, "_part").unionByName(batch.select(*cols, "_part"))
            else:
                out = batch.select(*cols, "_part")
            new_ver = ver + 1
            written = self._write_parts(out, new_ver)
            man2 = dict(man)
            man2.update({p: new_ver for p in written})
            self._publish(new_ver, man2, out.drop("_part").schema.json())
            return n
        finally:
            batch.unpersist()

    def append_rows(self, spark: SparkSession, rows: DataFrame, tag: str) -> int:
        """INSERT-ONLY fast path: stage ``rows`` as NEW version dirs
        (``v=a<tag>``) next to each touched partition's existing data and
        publish a manifest that lists both — never reading or rewriting
        what is already there. ``merge_rows`` is O(touched partition
        bytes) per call because replace-by-key must read+anti-join+rewrite;
        for keys the caller KNOWS are new (index deltas: a dedup index only
        ever learns digests it just proved absent), that read-modify-write
        is pure waste — at scale it makes every micro-batch cost O(state),
        the amortization killer. Append is O(batch) regardless of state
        size.

        Idempotent under replay by the ``tag`` (pass the micro-batch id):
        the version dir name is ``a<tag>``, so a replayed batch overwrites
        its own dirs byte-for-byte and the manifest list gains no
        duplicate — replace-by-key idempotency without the read.

        Caller contract: rows' keys must not already exist in the table
        (violations surface as duplicate rows on read, exactly like
        appending twice to any log). ``compact()`` folds accumulated
        append dirs back into one file per partition; ``merge_rows`` /
        ``replace_parts`` also collapse the list for the partitions they
        rewrite."""
        tag_ver = f"a{tag}"
        batch = rows.withColumn("_part", self._part_col())
        ver, man = self.latest()
        written = self._write_parts(batch, tag_ver)
        if not written:
            return 0
        man2 = dict(man)
        for p in written:
            vs = self._vers(man2[p]) if p in man2 else []
            if tag_ver not in vs:
                man2[p] = vs + [tag_ver]
        self._publish(ver + 1, man2, batch.drop("_part").schema.json())
        return len(written)

    def replace_parts(self, spark: SparkSession, df: DataFrame,
                      parts: list[str] | None = None) -> int:
        """Publish ``df`` as the complete new content of exactly the
        partitions it contains; every other partition keeps its current
        version untouched. This is the primitive under merge_rows — use it
        directly when the caller has already assembled the full partition
        content (e.g. a MERGE that computed old∪new itself).

        Pass ``parts`` to declare the partitions being replaced explicitly:
        a declared partition with no surviving rows in ``df`` is dropped
        from the manifest (a partition-write of zero rows produces no dir,
        so without the declaration it would silently keep its old data)."""
        ver, man = self.latest()
        new_ver = ver + 1
        out = df.withColumn("_part", self._part_col())
        written = self._write_parts(out, new_ver)
        man2 = dict(man)
        man2.update({p: new_ver for p in written})
        if parts is not None:
            for p in parts:
                if p not in written:
                    man2.pop(p, None)
        self._publish(new_ver, man2, out.drop("_part").schema.json())
        return new_ver

    def delete_rows(self, spark: SparkSession, keys_df: DataFrame,
                    keys: list[str] | None = None) -> int:
        """Remove rows matching ``keys_df`` — partition-scoped like
        merge_rows, so ``keys_df`` must carry the partition expression's
        source columns (the caller knows which partitions its keys live
        in). ``keys`` may be a prefix of the table key to delete all of a
        parent's child rows (e.g. every claim row of an exam)."""
        keys = keys or self.keys
        parts = self.parts_of(keys_df)
        _, man = self.latest()
        parts = [p for p in parts if p in man]
        if not parts:
            return 0
        cur = self.read(spark, parts=parts)
        drop = keys_df.select(*keys).distinct()
        n = cur.join(drop, keys, "left_semi").count()
        if n == 0:
            return 0
        kept = cur.join(drop, keys, "left_anti")
        self.replace_parts(spark, kept, parts=parts)
        return n

    def rebase(self, spark: SparkSession, df: DataFrame,
               keep_versions: set[str] | None = None) -> int:
        """Publish ``df`` as the table's complete content EXCEPT rows
        living in ``keep_versions`` dirs, which stay referenced verbatim.
        This is the compaction primitive for append-accumulated tables
        whose NEWEST tag must survive the fold: ``overwrite`` would
        absorb a still-replayable batch's rows into plain version dirs,
        so a replayed ``append_rows`` with the same tag would add them a
        second time — keeping the tag dir referenced keeps the replay an
        idempotent self-overwrite. Partitions absent from both ``df``
        and ``keep_versions`` are dropped."""
        keep = {str(v) for v in (keep_versions or set())}
        ver, man = self.latest()
        new_ver = ver + 1
        out = df.withColumn("_part", self._part_col())
        written = self._write_parts(out, new_ver)
        man2: dict[str, list] = {p: [new_ver] for p in written}
        for p, vs in man.items():
            kept = [v for v in self._vers(vs) if str(v) in keep]
            if kept:
                man2[p] = man2.get(p, []) + kept
        flat = {
            p: (vs[0] if len(vs) == 1 else vs) for p, vs in man2.items()
        }
        self._publish(new_ver, flat, out.drop("_part").schema.json())
        return new_ver

    def overwrite(self, spark: SparkSession, df: DataFrame) -> int:
        """Full rewrite: the new snapshot references exactly the partitions
        present in ``df`` (a partition absent from ``df`` is dropped)."""
        ver, _ = self.latest()
        new_ver = ver + 1
        out = df.withColumn("_part", self._part_col())
        written = self._write_parts(out, new_ver)
        self._publish(new_ver, {p: new_ver for p in written},
                      out.drop("_part").schema.json())
        return new_ver

    # ---------- maintenance (reference X3, docs/Performance.md:9-28) ----------

    def newest_append_tag(self) -> str | None:
        """The most recent ``append_rows`` tag still referenced by the
        manifest (numeric tags compare as ints — micro-batch ids — other
        tags lexicographically), or None if no append dirs exist. This is
        the tag a crashed-then-restarted stream may replay, so maintenance
        must keep its dirs referenced verbatim (see ``compact``)."""
        _, man = self.latest()
        tags = {
            str(v)[1:]
            for vs in man.values()
            for v in self._vers(vs)
            if str(v).startswith("a")
        }
        if not tags:
            return None
        if all(t.lstrip("-").isdigit() for t in tags):
            return max(tags, key=int)
        return max(tags)

    def compact(self, spark: SparkSession, max_files: int = 4,
                keep_versions: set[str] | None = None) -> int:
        """Rewrite partitions fragmented past ``max_files`` data files into
        one file each (OPTIMIZE analog). Returns partitions compacted.

        ``keep_versions`` dirs stay referenced verbatim and are excluded
        from both the fragmentation count and the fold — the same replay
        contract as ``rebase``: folding a still-replayable batch's
        ``a<tag>`` dirs into a plain version dir would turn that batch's
        replayed ``append_rows`` into a duplicate insert instead of an
        idempotent self-overwrite."""
        keep = {str(v) for v in (keep_versions or set())}
        ver, man = self.latest()
        frag = []
        for p, vs in man.items():
            n_files = sum(
                1
                for v in self._vers(vs)
                if str(v) not in keep
                for f in os.listdir(self._part_dir(p, v))
                if f.endswith(".parquet")
            )
            if n_files > max_files:
                frag.append(p)
        if not frag:
            return 0
        reader = spark.read
        if self.schema is not None:
            reader = reader.schema(self.schema)
        out = (
            reader.parquet(*[
                self._part_dir(p, v)
                for p in frag
                for v in self._vers(man[p])
                if str(v) not in keep
            ])
            .withColumn("_part", self._part_col())
            .repartition(F.col("_part"))  # one task → one file per partition
        )
        new_ver = ver + 1
        written = self._write_parts(out, new_ver)
        man2 = dict(man)
        for p in frag:
            kept = [v for v in self._vers(man[p]) if str(v) in keep]
            folded = [new_ver] if p in written else []
            vs2 = folded + kept
            if not vs2:  # all-empty fold: drop the now-rowless partition
                man2.pop(p, None)
                continue
            man2[p] = vs2[0] if len(vs2) == 1 else vs2
        self._publish(new_ver, man2)
        return len(frag)

    def gc(self, keep_manifests: int = 2) -> int:
        """Drop partition version dirs (and manifests) no longer referenced
        by the ``keep_manifests`` newest snapshots. Returns dirs removed.

        Default keeps the two newest snapshots: Spark reads are lazy, so a
        DataFrame handle created just before a maintain() can still be
        evaluated afterwards — keeping N-1 alive gives in-flight readers in
        the same process a grace window."""
        d = os.path.join(self._dir(), _MANIFEST_DIR)
        if not os.path.isdir(d):
            return 0
        versions = sorted(
            int(e[1:-5]) for e in os.listdir(d)
            if e.startswith("v") and e.endswith(".json")
        )
        keep = versions[-keep_manifests:]
        # version ids compared as strings: plain snapshot numbers and
        # append tags ("a<batch>") both round-trip through the dir name
        live: set[tuple[str, str]] = set()
        for v in keep:
            with open(self._manifest_path(v)) as fh:
                for p, pv in json.load(fh)["parts"].items():
                    live.update((p, str(x)) for x in self._vers(pv))
        removed = 0
        table_dir = self._dir()
        for entry in os.listdir(table_dir):
            if not entry.startswith("part="):
                continue
            part = urllib.parse.unquote(entry[len("part="):])
            pdir = os.path.join(table_dir, entry)
            for vdir in os.listdir(pdir):
                if vdir.startswith("v=") and (part, vdir[2:]) not in live:
                    shutil.rmtree(os.path.join(pdir, vdir))
                    removed += 1
        for v in versions:
            if v not in keep:
                os.remove(self._manifest_path(v))
        return removed
