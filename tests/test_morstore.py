"""Merge-on-read student table (morstore.MergeOnReadTable): the scale gate
is that a student micro-batch writes O(batch) bytes — never a full snapshot
rewrite — while merge_upsert semantics (lineage, audit, no-op skip) are
preserved. Reference context: student rows are updated in place by MySQL
(docs/Runbook.ImportMigrate.md:22-33); at warehouse scale the ssid key is
uniformly random, so partitioning can't scope the write and merge-on-read
(append delta + latest-wins resolve + compaction) is the Spark-native
equivalent."""

from __future__ import annotations

import os

from pyspark.sql import Row, functions as F

from rdw_spark.warehouse import TableStore


def _dir_bytes(path):
    total = 0
    for dirpath, _dirs, files in os.walk(path):
        total += sum(os.path.getsize(os.path.join(dirpath, f)) for f in files)
    return total


def _students(spark, rng):
    return spark.createDataFrame(
        [Row(ssid=f"SS{i:06d}", first_name=f"F{i}", last_or_surname=f"L{i}",
             middle_name=None, gender="f" if i % 2 else "m", birthday=None)
         for i in rng],
        "ssid string, first_name string, last_or_surname string, "
        "middle_name string, gender string, birthday date",
    )


class TestMergeOnReadStudent:
    def test_batch_writes_obatch_bytes(self, spark, tmp_path):
        """After seeding 2,000 students and compacting, a 20-student update
        batch must append a delta of exactly those rows and leave every base
        file byte-identical — O(batch), not O(table)."""
        wh = TableStore(str(tmp_path / "wh"), audit_enabled=False)
        wh.merge_upsert(spark, "student", _students(spark, range(2000)), 1)
        wh.maintain(spark)  # fold the seed delta into a base snapshot
        mor = wh.mor_table("student")
        base_dir = os.path.join(str(tmp_path / "wh"), "student",
                                f"base-s={mor.current_seq()}")
        assert os.path.isdir(base_dir)
        base_files = {
            f: os.path.getmtime(os.path.join(base_dir, f))
            for f in os.listdir(base_dir)
        }
        base_bytes = _dir_bytes(base_dir)

        changed = _students(spark, range(20)).withColumn(
            "first_name", F.concat(F.col("first_name"), F.lit("_v2")))
        stats = wh.merge_upsert(spark, "student", changed, 2)
        assert stats == {"inserted": 0, "updated": 20, "unchanged": 0}

        # base untouched, delta carries exactly the changed rows
        assert {
            f: os.path.getmtime(os.path.join(base_dir, f))
            for f in os.listdir(base_dir)
        } == base_files
        delta_dir = os.path.join(str(tmp_path / "wh"), "student",
                                 f"delta-s={mor.current_seq()}")
        assert spark.read.parquet(delta_dir).count() == 20
        assert _dir_bytes(delta_dir) < base_bytes / 10

        # resolution: updated values win, everything else intact, lineage
        rows = {r["ssid"]: r for r in wh.read(spark, "student").collect()}
        assert len(rows) == 2000
        assert rows["SS000001"]["first_name"] == "F1_v2"
        assert rows["SS000001"]["update_import_id"] == 2
        assert rows["SS001999"]["first_name"] == "F1999"
        assert rows["SS001999"]["update_import_id"] == 1

    def test_compact_folds_deltas(self, spark, tmp_path):
        wh = TableStore(str(tmp_path / "wh"), audit_enabled=False)
        wh.merge_upsert(spark, "student", _students(spark, range(100)), 1)
        for i in range(3):
            upd = _students(spark, range(i * 10, i * 10 + 10)).withColumn(
                "last_or_surname", F.lit(f"U{i}"))
            wh.merge_upsert(spark, "student", upd, 2 + i)
        mor = wh.mor_table("student")
        assert mor.delta_count() == 4
        report = wh.maintain(spark)
        assert report["student"]["folded_deltas"] == 4
        assert mor.delta_count() == 0
        rows = {r["ssid"]: r for r in wh.read(spark, "student").collect()}
        assert len(rows) == 100
        assert rows["SS000005"]["last_or_surname"] == "U0"
        assert rows["SS000015"]["last_or_surname"] == "U1"
        assert rows["SS000025"]["last_or_surname"] == "U2"
        assert rows["SS000099"]["last_or_surname"] == "L99"

    def test_legacy_snapshot_auto_converts(self, spark, tmp_path):
        """A student table written by the pre-MOR version (<table>/v=N
        snapshots) must read and merge correctly after upgrade."""
        root = str(tmp_path / "wh")
        legacy = TableStore(root, merge_on_read={}, audit_enabled=False)
        legacy.merge_upsert(spark, "student", _students(spark, range(30)), 1)
        assert os.path.isdir(os.path.join(root, "student", "v=1"))

        wh = TableStore(root, audit_enabled=False)
        assert wh.read(spark, "student").count() == 30
        stats = wh.merge_upsert(
            spark, "student",
            _students(spark, range(30, 35)), 2)
        assert stats["inserted"] == 5
        assert wh.read(spark, "student").count() == 35


class TestGroupModeChildren:
    def _items(self, spark, exam_ids, tag="a", per_exam=4):
        return spark.createDataFrame(
            [(e, f"k{j}", j, 1.0, "SCORED", f"{tag}:{e}:{j}:" + f"{e*7919+j:09d}" * 20)
             for e in exam_ids for j in range(per_exam)],
            "exam_id long, item_key string, position int, score double, "
            "score_status string, response string",
        )

    def test_replace_children_writes_obatch_bytes(self, spark, tmp_path):
        """exam_item is the reference's largest table: a child-replace batch
        must append O(batch) bytes, leave base files byte-identical, and the
        newest batch's content must fully replace each touched parent's rows."""
        wh = TableStore(str(tmp_path / "wh"), audit_enabled=False)
        wh.replace_children(spark, "exam_item", "exam_id",
                            self._items(spark, range(1000), "v1"))
        wh.maintain(spark)
        mor = wh.mor_table("exam_item")
        base_dir = os.path.join(str(tmp_path / "wh"), "exam_item",
                                f"base-s={mor.current_seq()}")
        base_files = sorted(os.listdir(base_dir))
        base_bytes = _dir_bytes(base_dir)

        # update 5 exams: fewer items per exam (2 instead of 4)
        wh.replace_children(spark, "exam_item", "exam_id",
                            self._items(spark, range(5), "v2", per_exam=2))
        assert sorted(os.listdir(base_dir)) == base_files
        delta_dir = os.path.join(str(tmp_path / "wh"), "exam_item",
                                 f"delta-s={mor.current_seq()}")
        assert spark.read.parquet(delta_dir).count() == 10  # O(batch) rows
        assert _dir_bytes(delta_dir) < base_bytes / 5

        rows = wh.read(spark, "exam_item")
        assert rows.count() == 995 * 4 + 5 * 2  # replaced parents shrank
        touched = rows.filter("exam_id < 5").collect()
        assert all(r["response"].startswith("v2:") for r in touched)
        assert wh.read(spark, "exam_item").filter("exam_id = 7").count() == 4

    def test_compact_folds_group_deltas(self, spark, tmp_path):
        wh = TableStore(str(tmp_path / "wh"), audit_enabled=False)
        for i in range(3):
            wh.replace_children(spark, "exam_item", "exam_id",
                                self._items(spark, range(10), f"v{i}"))
        report = wh.maintain(spark)
        assert report["exam_item"]["folded_deltas"] == 3
        rows = wh.read(spark, "exam_item")
        assert rows.count() == 40
        assert all(r["response"].startswith("v2:") for r in rows.collect())


class TestAutoCompaction:
    def test_delta_count_stays_bounded(self, spark, tmp_path):
        """At a batch per minute an unmaintained table would union
        thousands of delta dirs per read — append_delta rebases itself once
        auto_compact_at deltas are outstanding."""
        from rdw_spark.warehouse.morstore import MergeOnReadTable

        mor = MergeOnReadTable(str(tmp_path), "t", ["k"], auto_compact_at=5)
        for i in range(12):
            mor.append_delta(spark.createDataFrame([(i % 3, i)], "k int, v int"))
        assert mor.delta_count() < 5
        rows = {r["k"]: r["v"] for r in mor.read(spark).collect()}
        assert rows == {0: 9, 1: 10, 2: 11}  # latest write per key survived


class TestSchemaEvolution:
    def test_widened_schema_reads_old_deltas_with_nulls(self, spark, tmp_path):
        """Add-a-column evolution: a table re-opened with a WIDENED declared
        schema must read pre-evolution base/delta files (column absent in
        parquet → NULL) alongside new deltas carrying the column, resolve
        latest-wins across the boundary, and survive compaction."""
        from pyspark.sql import types as T

        from rdw_spark.warehouse.morstore import MergeOnReadTable

        v1 = T.StructType([
            T.StructField("k", T.LongType()),
            T.StructField("v", T.StringType()),
        ])
        old = MergeOnReadTable(str(tmp_path), "t", ["k"], schema=v1,
                               auto_compact_at=100)
        old.append_delta(spark.createDataFrame([(1, "a"), (2, "b")], v1))

        v2 = v1.add("extra", T.DoubleType())  # fresh StructType from add()
        new = MergeOnReadTable(str(tmp_path), "t", ["k"], schema=v2,
                               auto_compact_at=100)
        new.append_delta(
            spark.createDataFrame([(2, "b2", 9.5), (3, "c", 1.0)], v2)
        )

        got = {r.k: (r.v, r.extra) for r in new.read(spark).collect()}
        assert got == {1: ("a", None), 2: ("b2", 9.5), 3: ("c", 1.0)}

        new.compact(spark)
        got2 = {r.k: (r.v, r.extra) for r in new.read(spark).collect()}
        assert got2 == got
