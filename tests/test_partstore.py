"""Partition-scoped storage (partstore.PartitionedTable) + the scale gates
the verdict asked for: a one-year batch rewrites O(partition) files, point
status transitions touch one bucket, the student join is not force-broadcast,
and maintenance prunes superseded snapshot versions."""

from __future__ import annotations

import os
from datetime import datetime

import pytest
from pyspark.sql import Row, functions as F

from rdw_spark.warehouse import ImportLog, ImportStatus, MigrateEngine, TableStore
from rdw_spark.warehouse.import_log import ImportContent
from rdw_spark.warehouse.migrate import _reporting_exam
from rdw_spark.warehouse.partstore import PartitionedTable


def _files_under(root):
    out = []
    for dirpath, _dirs, files in os.walk(root):
        out += [os.path.join(dirpath, f) for f in files if f.endswith(".parquet")]
    return out


class TestPartitionedTable:
    def test_merge_touches_only_batch_partitions(self, spark, tmp_path):
        pt = PartitionedTable(str(tmp_path), "fact", "school_year", ["id"])
        base = spark.createDataFrame(
            [Row(id=i, school_year=2015 + (i % 4), v="a") for i in range(40)]
        )
        pt.overwrite(spark, base)
        files_before = {
            p: set(os.listdir(os.path.join(str(tmp_path), "fact", f"part={p}")))
            for p in ("2015", "2016", "2017", "2018")
        }

        # a batch touching ONLY 2018 (updates + an insert)
        batch = spark.createDataFrame(
            [Row(id=3, school_year=2018, v="UPDATED"), Row(id=99, school_year=2018, v="NEW")]
        )
        n = pt.merge_rows(spark, batch)
        assert n == 2

        # untouched years keep their exact version dirs; 2018 gained one
        for p in ("2015", "2016", "2017"):
            after = set(os.listdir(os.path.join(str(tmp_path), "fact", f"part={p}")))
            assert after == files_before[p], f"partition {p} was rewritten"
        p2018 = set(os.listdir(os.path.join(str(tmp_path), "fact", "part=2018")))
        assert p2018 == files_before["2018"] | {"v=2"}

        # merged content is correct: replaced row + new row + all others
        rows = {r["id"]: r for r in pt.read(spark).collect()}
        assert len(rows) == 41
        assert rows[3]["v"] == "UPDATED" and rows[99]["v"] == "NEW"
        assert rows[7]["v"] == "a"

    def test_read_scoped_to_partitions(self, spark, tmp_path):
        pt = PartitionedTable(str(tmp_path), "fact", "school_year", ["id"])
        pt.overwrite(spark, spark.createDataFrame(
            [Row(id=i, school_year=2015 + (i % 2)) for i in range(10)]
        ))
        only_2016 = pt.read(spark, parts=["2016"]).collect()
        assert {r["school_year"] for r in only_2016} == {2016}

    def test_gc_prunes_superseded_versions(self, spark, tmp_path):
        pt = PartitionedTable(str(tmp_path), "fact", "school_year", ["id"])
        pt.overwrite(spark, spark.createDataFrame(
            [Row(id=1, school_year=2018, v="a")]
        ))
        for i in range(3):
            pt.merge_rows(spark, spark.createDataFrame(
                [Row(id=1, school_year=2018, v=f"u{i}")]
            ))
        pdir = os.path.join(str(tmp_path), "fact", "part=2018")
        assert len(os.listdir(pdir)) == 4  # v=1..v=4 accumulate
        removed = pt.gc(keep_manifests=1)
        assert removed == 3
        assert os.listdir(pdir) == ["v=4"]
        assert pt.read(spark).collect()[0]["v"] == "u2"

    def test_compact_merges_small_files(self, spark, tmp_path):
        pt = PartitionedTable(str(tmp_path), "fact", "school_year", ["id"])
        # many single-row merges fragment the partition
        pt.overwrite(spark, spark.createDataFrame(
            [Row(id=i, school_year=2018) for i in range(8)]).repartition(8))
        n_before = len(_files_under(os.path.join(str(tmp_path), "fact", "part=2018", "v=1")))
        assert n_before > 4
        assert pt.compact(spark, max_files=4) == 1
        _, man = pt.latest()
        n_after = len(_files_under(
            os.path.join(str(tmp_path), "fact", "part=2018", f"v={man['2018']}")))
        assert n_after == 1
        assert pt.read(spark).count() == 8

    def test_append_rows_is_insert_only_and_tag_idempotent(self, spark, tmp_path):
        """append_rows never reads or rewrites existing data (the O(batch)
        state-maintenance path streaming micro-batches need): existing
        version dirs stay byte-identical, the manifest lists base+append
        dirs, and replaying the same tag neither duplicates rows nor
        grows the manifest."""
        pt = PartitionedTable(str(tmp_path), "idx", "pmod(id, 4)", ["id"])
        pt.overwrite(spark, spark.createDataFrame(
            [Row(id=i, v="base") for i in range(8)]))
        pdir = os.path.join(str(tmp_path), "idx", "part=0")
        before = set(os.listdir(pdir))

        batch = spark.createDataFrame([Row(id=100, v="b7"), Row(id=101, v="b7")])
        assert pt.append_rows(spark, batch, tag=7) == 2  # parts 0 and 1
        assert set(os.listdir(pdir)) == before | {"v=a7"}
        _, man = pt.latest()
        assert man["0"] == [1, "a7"] and man["1"] == [1, "a7"]
        assert man["2"] == 1 and man["3"] == 1  # untouched stay plain

        rows = {r["id"]: r["v"] for r in pt.read(spark).collect()}
        assert len(rows) == 10 and rows[100] == "b7" and rows[0] == "base"

        # replay of the same micro-batch: same tag, same rows — idempotent
        pt.append_rows(spark, batch, tag=7)
        _, man = pt.latest()
        assert man["0"] == [1, "a7"]
        assert pt.read(spark).count() == 10

        # pruned read still unions base + append dirs of the partition
        part0 = pt.read(spark, parts=["0"]).collect()
        assert {r["id"] for r in part0} == {0, 4, 100}

    def test_append_then_merge_collapses_and_compact_gc_interplay(
            self, spark, tmp_path):
        """merge_rows over an append-accumulated partition folds the dir
        list back to one version; compact counts files ACROSS append dirs;
        gc keeps live append dirs and drops superseded ones."""
        pt = PartitionedTable(str(tmp_path), "idx", "pmod(id, 2)", ["id"],
                              sort_cols=("id",))
        pt.overwrite(spark, spark.createDataFrame([Row(id=0, v="base")]))
        for b in range(4):
            pt.append_rows(spark, spark.createDataFrame(
                [Row(id=10 + 2 * b, v=f"b{b}")]), tag=b)
        _, man = pt.latest()
        assert man["0"] == [1, "a0", "a1", "a2", "a3"]
        assert pt.read(spark).count() == 5

        # compact folds the five 1-file dirs into one dir with one file
        assert pt.compact(spark, max_files=4) == 1
        _, man = pt.latest()
        assert isinstance(man["0"], int)
        assert pt.read(spark).count() == 5
        removed = pt.gc(keep_manifests=1)
        assert removed == 5  # v=1 + four append dirs superseded
        assert {r["v"] for r in pt.read(spark).collect()} == {
            "base", "b0", "b1", "b2", "b3"}

        # merge over appends also collapses: new appends then replace-by-key
        pt.append_rows(spark, spark.createDataFrame([Row(id=20, v="x")]), tag=9)
        pt.merge_rows(spark, spark.createDataFrame([Row(id=20, v="UPD")]))
        _, man = pt.latest()
        assert isinstance(man["0"], int)
        rows = {r["id"]: r["v"] for r in pt.read(spark).collect()}
        assert rows[20] == "UPD" and rows[0] == "base"


class TestImportLogPartitioned:
    def test_set_status_touches_one_bucket(self, spark, tmp_path):
        wh = TableStore(str(tmp_path / "wh"))
        log = ImportLog(wh)
        recs = log.accept_batch(
            spark, ImportContent.EXAM, [f"<p{i}/>".encode() for i in range(5)]
        )
        imp_dir = str(tmp_path / "wh" / "import")
        bucket_dir = os.path.join(imp_dir, "part=0")
        vers_before = set(os.listdir(bucket_dir))
        log.set_status(spark, recs[2].id, ImportStatus.PROCESSED)
        # one new version in the single id bucket, and the row is updated
        assert len(set(os.listdir(bucket_dir)) - vers_before) == 1
        rows = {r["id"]: r["status"] for r in log.read(spark).collect()}
        assert rows[recs[2].id] == ImportStatus.PROCESSED
        assert rows[recs[0].id] == ImportStatus.ACCEPTED


class TestMigratePartitionScoped:
    def _seed(self, spark, wh, log, years=(2017, 2018)):
        wh.merge_upsert(spark, "district", spark.createDataFrame(
            [Row(natural_id="D1", name="D1")]), 1)
        d_id = wh.read(spark, "district").collect()[0]["id"]
        wh.merge_upsert(spark, "school", spark.createDataFrame(
            [Row(natural_id="S1", name="S1", district_id=d_id)]), 1)
        s_id = wh.read(spark, "school").collect()[0]["id"]
        wh.merge_upsert(spark, "asmt", spark.createDataFrame([
            Row(natural_id=f"A{y}", name=f"A{y}", label="a", version="1",
                type_code="sum", subject_code="Math", grade_code="06",
                school_year=y, min_score=2000.0, max_score=3000.0,
                cut_point_1=2380.0, cut_point_2=2490.0, cut_point_3=2600.0)
            for y in years
        ]), 1)
        asmt = {r["school_year"]: r["id"] for r in wh.read(spark, "asmt").collect()}
        wh.merge_upsert(spark, "student", spark.createDataFrame(
            [Row(ssid=f"SS{i}", first_name="F", last_or_surname="L")
             for i in range(4)]), 1)
        students = [r["id"] for r in wh.read(spark, "student").collect()]
        return d_id, s_id, asmt, students

    def _exams(self, spark, wh, log, year, asmt, students, s_id, tag):
        recs = log.accept_batch(
            spark, ImportContent.EXAM,
            [f"<e {tag} {year} {i}/>".encode() for i in range(len(students))],
        )
        rows = [
            Row(opp_id=f"{tag}-{year}-{i}", asmt_id=asmt[year], opportunity=1,
                asmt_version="1", type_code="sum", school_year=year,
                student_id=students[i], school_id=s_id, grade_code="06",
                completeness="Complete", administration_condition="Valid",
                session_id="s", scale_score=2400.0 + i, scale_score_std_err=20.0,
                performance_level=2, completed_at=datetime(year, 4, 1 + i),
                iep=False, lep=False,
                section504=False, economic_disadvantage=False,
                migrant_status=False, language_code="eng",
                military_connected="No", import_id=recs[i].id)
            for i in range(len(students))
        ]
        wh.merge_upsert(spark, "exam", spark.createDataFrame(rows), recs[-1].id)
        for r in recs:
            log.set_status(spark, r.id, ImportStatus.PROCESSED)

    def test_one_year_batch_rewrites_one_partition(self, spark, tmp_path):
        wh = TableStore(str(tmp_path / "wh"), audit_enabled=False)
        log = ImportLog(wh)
        eng = MigrateEngine(wh, str(tmp_path / "mart"), batch_size=100)
        d_id, s_id, asmt, students = self._seed(spark, wh, log)

        # batch 1: exams across 2017 + 2018 → both partitions created
        self._exams(spark, wh, log, 2017, asmt, students, s_id, "b1")
        self._exams(spark, wh, log, 2018, asmt, students, s_id, "b2")
        assert eng.run_until_caught_up(spark, "olap") == 16  # 8 olap_exam + 8 longitudinal
        olap_dir = str(tmp_path / "mart" / "olap_exam")
        f2017 = set(os.listdir(os.path.join(olap_dir, "part=2017")))
        assert f2017

        # batch 2: exams ONLY in 2018 → 2017's files must be untouched
        self._exams(spark, wh, log, 2018, asmt, students, s_id, "b3")
        assert eng.run_until_caught_up(spark, "olap") == 8  # 4 olap_exam + 4 longitudinal
        assert set(os.listdir(os.path.join(olap_dir, "part=2017"))) == f2017
        assert eng.read_mart(spark, "olap_exam").count() == 12

    def test_maintain_compacts_and_gcs(self, spark, tmp_path):
        wh = TableStore(str(tmp_path / "wh"), audit_enabled=False)
        log = ImportLog(wh)
        eng = MigrateEngine(wh, str(tmp_path / "mart"), batch_size=2)
        d_id, s_id, asmt, students = self._seed(spark, wh, log)
        self._exams(spark, wh, log, 2018, asmt, students, s_id, "b1")
        # batch_size=2 → several merge runs → several version dirs
        assert eng.run_until_caught_up(spark, "reporting") == 4
        rep_dir = str(tmp_path / "mart" / "reporting_exam" / "part=2018")
        assert len(os.listdir(rep_dir)) > 1
        # default keep_manifests=2 leaves a grace version for in-flight
        # lazy readers; keep_manifests=1 prunes to exactly the live version
        report = eng.maintain(spark, keep_manifests=1)
        assert report["reporting_exam"]["removed_dirs"] >= 1
        assert len(os.listdir(rep_dir)) == 1  # only the live version remains
        assert eng.read_mart(spark, "reporting_exam").count() == 4


class TestNoStudentBroadcast:
    def test_reporting_join_leaves_student_to_aqe(self, spark, tmp_path):
        """The student side must carry no broadcast hint: with the auto
        threshold disabled, hinted dims still broadcast but the student join
        must plan as a shuffle join (at state scale student is fact-sized;
        a forced broadcast OOMs executors)."""
        wh = TableStore(str(tmp_path / "wh"), audit_enabled=False)
        log = ImportLog(wh)
        d_id, s_id, asmt, students = TestMigratePartitionScoped()._seed(
            spark, wh, log)
        TestMigratePartitionScoped()._exams(
            spark, wh, log, 2018, asmt, students, s_id, "b1")
        old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        try:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
            plan = _reporting_exam(wh, spark)._jdf.queryExecution().executedPlan().toString()
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        assert plan.count("BroadcastHashJoin") == 3  # school/district/asmt only
        assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan


class TestNullPartitionValues:
    def test_null_part_round_trips(self, spark, tmp_path):
        pt = PartitionedTable(str(tmp_path), "fact", "school_year", ["id"])
        pt.overwrite(spark, spark.createDataFrame(
            [(1, 2018, "a"), (2, None, "b")], "id long, school_year int, v string"
        ))
        assert os.path.isdir(os.path.join(str(tmp_path), "fact", "part=__NULL__"))
        # merge into the null partition replaces by key there, not elsewhere
        pt.merge_rows(spark, spark.createDataFrame(
            [(2, None, "B2")], "id long, school_year int, v string"))
        rows = {r["id"]: r["v"] for r in pt.read(spark).collect()}
        assert rows == {1: "a", 2: "B2"}


class TestManifestPruning:
    def test_read_mart_school_years_opens_only_those_files(self, spark, tmp_path):
        wh = TableStore(str(tmp_path / "wh"), audit_enabled=False)
        log = ImportLog(wh)
        eng = MigrateEngine(wh, str(tmp_path / "mart"), batch_size=100)
        helper = TestMigratePartitionScoped()
        d_id, s_id, asmt, students = helper._seed(spark, wh, log)
        helper._exams(spark, wh, log, 2017, asmt, students, s_id, "b1")
        helper._exams(spark, wh, log, 2018, asmt, students, s_id, "b2")
        eng.run_until_caught_up(spark, "olap")

        pruned = eng.read_mart(spark, "olap_exam", school_years=[2018])
        files = pruned.inputFiles()
        assert files and all("part=2018" in f for f in files)
        assert pruned.count() == 4
        full = eng.read_mart(spark, "olap_exam")
        assert any("part=2017" in f for f in full.inputFiles())


class TestWarehouseMaintain:
    def test_import_log_versions_pruned(self, spark, tmp_path):
        wh = TableStore(str(tmp_path / "wh"))
        log = ImportLog(wh)
        recs = log.accept_batch(
            spark, ImportContent.EXAM, [f"<m{i}/>".encode() for i in range(3)]
        )
        for r in recs:  # three point transitions → three more versions
            log.set_status(spark, r.id, ImportStatus.PROCESSED)
        bucket = os.path.join(str(tmp_path / "wh"), "import", "part=0")
        assert len(os.listdir(bucket)) == 4
        # default (keep_manifests=2) leaves one superseded version as a
        # grace window for lazy readers created before the maintain()
        report = wh.maintain(spark)
        assert report["import"]["removed_dirs"] == 2
        assert len(os.listdir(bucket)) == 2
        report = wh.maintain(spark, keep_manifests=1)
        assert report["import"]["removed_dirs"] == 1
        assert len(os.listdir(bucket)) == 1
        # content survives maintenance
        assert {r["status"] for r in log.read(spark).collect()} == {
            ImportStatus.PROCESSED}


class TestLayoutMigration:
    def _import_rows(self, spark, n):
        from rdw_spark.warehouse import schemas as S

        now = datetime(2018, 1, 1)
        return spark.createDataFrame(
            [(i, 1, 4, "xml", f"d{i}", "b", "t", now, now, "m")
             for i in range(1, n + 1)],
            S.SCHEMAS["import"],
        )

    def test_legacy_snapshot_auto_converts(self, spark, tmp_path):
        """A warehouse written by a pre-partstore version (<table>/v=N
        whole-snapshot dirs) must stay readable: the first touch through the
        partitioned layout auto-converts it instead of reading empty."""
        root = str(tmp_path / "wh")
        legacy = TableStore(root, partitioned={})  # old layout writer
        legacy.write_snapshot(self._import_rows(spark, 5), "import")
        assert os.path.isdir(os.path.join(root, "import", "v=1"))

        wh = TableStore(root)  # new layout (import is partitioned by default)
        got = wh.read(spark, "import")
        assert got.count() == 5
        # converted into the manifest layout, not re-read from legacy dirs
        assert wh.part_table("import").latest()[0] == 1
        # and writes keep working partition-scoped afterwards
        wh.merge_rows(spark, "import",
                      self._import_rows(spark, 6).filter(F.col("id") == 6), ["id"])
        assert wh.read(spark, "import").count() == 6

    def test_merge_upsert_rejects_null_partition_value(self, spark, tmp_path):
        """An exam update batch missing its school_year must fail fast, not
        silently land in the __NULL__ partition (which would duplicate the
        natural key across partitions)."""
        wh = TableStore(str(tmp_path / "wh"), audit_enabled=False)
        bad = spark.createDataFrame(
            [("o1", 1, None, 1, 1, "06", "sum", datetime(2018, 4, 1))],
            "opp_id string, asmt_id long, school_year int, student_id long, "
            "school_id long, grade_code string, type_code string, "
            "completed_at timestamp",
        )
        with pytest.raises(ValueError, match="null partition"):
            wh.merge_upsert(spark, "exam", bad, 1)


class TestTimeTravel:
    def test_read_as_of_version(self, spark, tmp_path):
        """Every manifest still on disk is a complete immutable snapshot:
        reading VERSION AS OF returns the pre-merge state even after later
        merges; gc'd versions raise with the available window."""
        import pytest as _pytest

        pt = PartitionedTable(str(tmp_path), "fact", "school_year", ["id"])
        pt.overwrite(spark, spark.createDataFrame(
            [Row(id=i, school_year=2017 + (i % 2), v="a") for i in range(10)]
        ))
        pt.merge_rows(spark, spark.createDataFrame(
            [Row(id=1, school_year=2018, v="CHANGED")]
        ))
        pt.merge_rows(spark, spark.createDataFrame(
            [Row(id=50, school_year=2018, v="NEW")]
        ))
        assert pt.versions() == [1, 2, 3]

        v1 = {r["id"]: r["v"] for r in pt.read(spark, version=1).collect()}
        assert len(v1) == 10 and v1[1] == "a"
        v2 = {r["id"]: r["v"] for r in pt.read(spark, version=2).collect()}
        assert v2[1] == "CHANGED" and 50 not in v2
        now = {r["id"]: r["v"] for r in pt.read(spark).collect()}
        assert now[1] == "CHANGED" and now[50] == "NEW"

        # gc bounds the window; a pruned version is an explicit error
        pt.gc(keep_manifests=2)
        assert pt.versions() == [2, 3]
        assert {r["id"] for r in pt.read(spark, version=2).collect()} == set(range(10))
        with _pytest.raises(ValueError, match="v1 not on disk"):
            pt.read(spark, version=1)


def test_rebase_keeps_tag_dirs_replay_idempotent(spark, tmp_path):
    """rebase() is the compaction primitive for append-accumulated state:
    the fold rewrites everything EXCEPT the kept tag dirs, so a
    structured-streaming replay of the newest batch self-overwrites its
    own dirs instead of double-counting against the absorbed base."""
    pt = PartitionedTable(str(tmp_path), "state", "g % 2", ["g", "batch_id"])
    for b in range(3):
        pt.append_rows(spark, spark.createDataFrame(
            [Row(g=i, batch_id=b, n=1) for i in range(4)]), tag=b)
    assert pt.read(spark).count() == 12

    # fold batches 0-1 into a base; batch 2's tag dirs stay referenced
    base = spark.createDataFrame(
        [Row(g=i, batch_id=-1, n=2) for i in range(4)])
    pt.rebase(spark, base, keep_versions={"a2"})
    got = {(r["g"], r["batch_id"]): r["n"] for r in pt.read(spark).collect()}
    assert len(got) == 8  # 4 base rows + batch 2's 4 rows
    assert got[(0, -1)] == 2 and got[(0, 2)] == 1

    # the kept dirs are the ORIGINAL a2 dirs, untouched on disk
    for part in ("0", "1"):
        d = os.path.join(str(tmp_path), "state", f"part={part}")
        assert "v=a2" in os.listdir(d)

    # replayed newest batch = idempotent self-overwrite
    pt.append_rows(spark, spark.createDataFrame(
        [Row(g=i, batch_id=2, n=1) for i in range(4)]), tag=2)
    assert pt.read(spark).count() == 8

    # empty base + only kept tags: partitions live purely on tag dirs
    pt2 = PartitionedTable(str(tmp_path / "t2"), "state", "g % 2", ["g"])
    pt2.append_rows(spark, spark.createDataFrame([Row(g=1, n=1)]), tag=7)
    empty = spark.createDataFrame([], "g long, n long")
    pt2.rebase(spark, empty, keep_versions={"a7"})
    assert [r["g"] for r in pt2.read(spark).collect()] == [1]

    # a partition absent from both base and kept tags is dropped
    pt3 = PartitionedTable(str(tmp_path / "t3"), "state", "g % 2", ["g"])
    pt3.append_rows(spark, spark.createDataFrame(
        [Row(g=0, n=1), Row(g=1, n=1)]), tag=0)
    pt3.rebase(spark, spark.createDataFrame([Row(g=1, n=5)]),
               keep_versions=set())
    assert {(r["g"], r["n"]) for r in pt3.read(spark).collect()} == {(1, 5)}


def test_compact_keep_versions_preserves_replayable_tag(spark, tmp_path):
    """compact(keep_versions={a<top>}) folds history but leaves the newest
    append tag's dirs referenced verbatim — the crash-replay contract: a
    stream that died before its checkpoint commit replays the newest
    batch, whose append_rows must self-overwrite, not duplicate against a
    compacted dir that already absorbed it."""
    pt = PartitionedTable(str(tmp_path), "idx", "pmod(id, 2)", ["id"])
    for b in range(5):
        pt.append_rows(spark, spark.createDataFrame(
            [Row(id=10 * b, v=f"b{b}"), Row(id=10 * b + 1, v=f"b{b}")]),
            tag=b)
    assert pt.newest_append_tag() == "4"
    assert pt.read(spark).count() == 10

    assert pt.compact(spark, max_files=1, keep_versions={"a4"}) == 2
    _, man = pt.latest()
    for p in ("0", "1"):
        assert "a4" in man[p]
        assert os.path.isdir(os.path.join(str(tmp_path), "idx",
                                          f"part={p}", "v=a4"))
    assert pt.read(spark).count() == 10

    # crash-replay of the newest batch: idempotent self-overwrite
    pt.append_rows(spark, spark.createDataFrame(
        [Row(id=40, v="b4"), Row(id=41, v="b4")]), tag=4)
    assert pt.read(spark).count() == 10

    # ...whereas a keep-less compact would have absorbed a4 and the same
    # replay WOULD duplicate (the bug the guard exists for)
    pt2 = PartitionedTable(str(tmp_path / "t2"), "idx", "pmod(id, 2)", ["id"])
    for b in range(5):
        pt2.append_rows(spark, spark.createDataFrame(
            [Row(id=10 * b, v=f"b{b}"), Row(id=10 * b + 1, v=f"b{b}")]),
            tag=b)
    pt2.compact(spark, max_files=1)
    pt2.append_rows(spark, spark.createDataFrame(
        [Row(id=40, v="b4"), Row(id=41, v="b4")]), tag=4)
    assert pt2.read(spark).count() == 12  # duplicated — hence keep_versions


def test_newest_append_tag_numeric_ordering(spark, tmp_path):
    """Micro-batch ids compare as integers: tag 10 is newer than tag 9
    (string max would say '9')."""
    pt = PartitionedTable(str(tmp_path), "idx", "pmod(id, 2)", ["id"])
    assert pt.newest_append_tag() is None
    pt.append_rows(spark, spark.createDataFrame([Row(id=0, v="x")]), tag=9)
    pt.append_rows(spark, spark.createDataFrame([Row(id=1, v="y")]), tag=10)
    assert pt.newest_append_tag() == "10"


class TestChangeDataFeed:
    def test_read_changes_tracks_upserts_and_deletes(self, spark, tmp_path):
        """CDC between snapshots: updates appear as delete+insert, pure
        inserts as insert, delete_rows as delete; applying the feed to
        the old snapshot reproduces the new one exactly; unchanged
        partitions are not even listed for reading."""
        pt = PartitionedTable(str(tmp_path), "fact", "school_year", ["id"])
        base = spark.createDataFrame(
            [Row(id=i, school_year=2015 + (i % 4), v="a") for i in range(40)])
        pt.overwrite(spark, base)  # v1
        batch = spark.createDataFrame(
            [Row(id=3, school_year=2018, v="UPDATED"),
             Row(id=99, school_year=2018, v="NEW")])
        pt.merge_rows(spark, batch)  # v2
        pt.delete_rows(  # v3 (keys_df carries the partition source column)
            spark, spark.createDataFrame([Row(id=0, school_year=2015)]),
            keys=["id"])

        c12 = pt.read_changes(spark, 1, 2).collect()
        by_type = {}
        for r in c12:
            by_type.setdefault(r["_change_type"], []).append((r["id"], r["v"]))
        assert sorted(by_type["insert"]) == [(3, "UPDATED"), (99, "NEW")]
        assert by_type["delete"] == [(3, "a")]  # the update's before-image

        c23 = pt.read_changes(spark, 2, 3).collect()
        assert [(r["id"], r["_change_type"]) for r in c23] == [(0, "delete")]

        # feed application: old - deletes + inserts == new (multiset-exact)
        old = pt.read(spark, version=1)
        feed = pt.read_changes(spark, 1, 3)
        dels = feed.filter("_change_type = 'delete'").drop("_change_type")
        ins = feed.filter("_change_type = 'insert'").drop("_change_type")
        applied = old.exceptAll(dels).unionByName(ins)
        new = pt.read(spark, version=3)
        assert sorted(map(tuple, applied.collect())) == sorted(
            map(tuple, new.collect()))

        # same-version feed is empty; missing snapshot raises
        assert pt.read_changes(spark, 3, 3).count() == 0
        with pytest.raises(ValueError, match="not on disk"):
            pt.read_changes(spark, 999)

    def test_read_changes_prunes_unchanged_partitions(self, spark, tmp_path):
        """Only changed partitions' paths enter the scan (the driver-side
        manifest diff is the pruning)."""
        pt = PartitionedTable(str(tmp_path), "fact", "school_year", ["id"])
        base = spark.createDataFrame(
            [Row(id=i, school_year=2015 + (i % 4), v="a") for i in range(40)])
        pt.overwrite(spark, base)
        pt.merge_rows(spark, spark.createDataFrame(
            [Row(id=99, school_year=2018, v="NEW")]))
        feed = pt.read_changes(spark, 1, 2)
        files = feed.inputFiles()
        assert files and all("part%3D2018" in f or "part=2018" in f
                             for f in files), files
