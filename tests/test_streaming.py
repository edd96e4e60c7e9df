"""Streaming tier: watermarked windowed aggregation and stateful
sessionization — stream results must match their batch twins."""

from __future__ import annotations

import shutil

import pytest
from pyspark.sql import functions as F

from rdw_spark.io import load_table
from rdw_spark.streaming.events import (
    read_events_stream, sessionize, sessionize_batch, windowed_event_counts,
)


def _drain(q, timeout: int = 600) -> None:
    """Block until an availableNow query finishes. awaitTermination(t)
    returns False (silently!) when t expires first — under a loaded box
    a 120 s bound let tests read state mid-drain (r10 shard flake), so
    completion is asserted with a bound only a genuine hang can hit."""
    assert q.awaitTermination(timeout), f"stream drain exceeded {timeout}s"

EVENTS_PATH = "/root/testdata/sf0.001/events.parquet"


@pytest.fixture(scope="module")
def events_dir(tmp_path_factory):
    # file-source readStream requires a directory; stage the single
    # driver-generated file into one
    d = tmp_path_factory.mktemp("events_stream")
    shutil.copy(EVENTS_PATH, d / "part-0.parquet")
    return str(d)


def _batch_events(spark):
    return load_table(spark, "/root/testdata/sf0.001", "events")


class TestWindowedCounts:
    def test_stream_matches_batch(self, spark, events_dir):
        stream = read_events_stream(spark, events_dir, max_files_per_trigger=1)
        q = (
            windowed_event_counts(stream, window="1 hour", watermark="2 hours")
            .writeStream.format("memory").queryName("win_counts")
            .outputMode("complete").trigger(availableNow=True).start()
        )
        _drain(q)
        got = {
            (r["window_start"], r["event_type"]): (r["n_events"], round(r["total_value"], 6))
            for r in spark.sql("SELECT * FROM win_counts").collect()
        }
        want = {
            (r["window_start"], r["event_type"]): (r["n_events"], round(r["total_value"], 6))
            for r in windowed_event_counts(_batch_events(spark), window="1 hour").collect()
        }
        assert got == want and len(got) > 10


class TestDedupEvents:
    def test_duplicates_dropped_within_and_across_batches(self, spark, tmp_path):
        """Replayed event_ids collapse to one row even when the replay
        lands in a LATER micro-batch (within the watermark horizon) —
        the at-least-once → effectively-once contract."""
        from rdw_spark.streaming.events import dedup_events

        d = tmp_path / "ev"
        d.mkdir()
        rows1 = [(1, "2024-01-01 10:00:00", 7, "view", 1.0),
                 (2, "2024-01-01 10:01:00", 7, "view", 2.0),
                 (2, "2024-01-01 10:01:00", 7, "view", 2.0)]  # in-batch dup
        rows2 = [(1, "2024-01-01 10:00:00", 7, "view", 1.0),  # cross-batch replay
                 (3, "2024-01-01 10:05:00", 8, "purchase", 9.0)]
        schema = "event_id long, ts_s string, user_id long, event_type string, value double"
        for name, rows in (("b1", rows1), ("b2", rows2)):
            (spark.createDataFrame(rows, schema)
             .selectExpr("event_id", "CAST(ts_s AS TIMESTAMP) AS ts",
                         "user_id", "event_type", "value")
             .coalesce(1).write.mode("overwrite")
             .parquet(str(tmp_path / "stage" / name)))
            import glob as g
            src = g.glob(str(tmp_path / "stage" / name / "*.parquet"))[0]
            shutil.copy(src, str(d / f"{name}.parquet"))

        stream = read_events_stream(spark, str(d), max_files_per_trigger=1)
        q = (
            dedup_events(stream, keys=["event_id"], watermark="1 hour")
            .writeStream.format("memory").queryName("dedup_ev")
            .outputMode("append").trigger(availableNow=True).start()
        )
        _drain(q)
        got = spark.sql("SELECT event_id FROM dedup_ev").collect()
        ids = sorted(r.event_id for r in got)
        assert ids == [1, 2, 3]

    def test_batch_twin_is_exact(self, spark):
        from rdw_spark.streaming.events import dedup_events

        ev = _batch_events(spark)
        doubled = ev.unionByName(ev)
        assert dedup_events(doubled).count() == ev.select("event_id").distinct().count()


class TestSessionize:
    def test_batch_sessions(self, spark):
        ev = _batch_events(spark)
        sessions = sessionize_batch(ev, gap_minutes=30).cache()
        # invariants: per-user event counts preserved; sessions don't overlap
        per_user = sessions.groupBy("user_id").agg(F.sum("n_events").alias("n"))
        src = ev.groupBy("user_id").agg(F.count("*").alias("n"))
        diff = per_user.join(src, "user_id").filter("per_user.n != src.n") if False else (
            per_user.alias("a").join(src.alias("b"), "user_id")
            .filter(F.col("a.n") != F.col("b.n"))
        )
        assert diff.count() == 0
        gaps = sessions.filter(F.col("session_end") < F.col("session_start"))
        assert gaps.count() == 0
        assert sessions.count() > ev.select("user_id").distinct().count()

    def test_stream_sessions_match_batch_closed_sessions(self, spark, events_dir):
        stream = read_events_stream(spark, events_dir)
        q = (
            sessionize(stream, gap_minutes=30)
            .writeStream.format("memory").queryName("sessions")
            .outputMode("append").trigger(availableNow=True).start()
        )
        # BOUNDED wait on purpose (not _drain): the stateful query's
        # processing-time timeouts make termination timing variable, and
        # the containment assertion below is valid on a PARTIAL read —
        # every emitted closed session must exist in the batch result.
        # (45s measured ample for the first closed-session emissions; the
        # r12 suite spent the full 120s here on every run.)
        q.awaitTermination(45)
        got = spark.sql(
            "SELECT user_id, session_start, n_events FROM sessions"
        ).collect()
        q.stop()
        batch = sessionize_batch(_batch_events(spark), gap_minutes=30)
        want = {(r["user_id"], r["session_start"], r["n_events"])
                for r in batch.collect()}
        # availableNow ends before the last timeout fires, so the stream emits
        # only *closed* sessions — every one must exist in the batch result
        assert len(got) > 0
        for r in got:
            assert (r["user_id"], r["session_start"], r["n_events"]) in want


class TestStreamToMart:
    def test_foreachbatch_mart_matches_batch_agg(self, spark, events_dir, tmp_path):
        """T7 sink: drain the stream into a PartitionedTable mart and the
        mart must equal the batch aggregation — and a second drain over the
        same checkpoint must be a no-op (exactly-once effective)."""
        from rdw_spark.streaming.events import stream_events_to_mart
        from rdw_spark.warehouse.partstore import PartitionedTable

        mart_root = str(tmp_path / "mart")
        ckpt = str(tmp_path / "ckpt")
        q = stream_events_to_mart(spark, events_dir, mart_root, ckpt)
        _drain(q)

        pt = PartitionedTable(
            mart_root, "event_counts", "CAST(window_start AS DATE)",
            keys=["window_start", "window_end", "event_type"],
        )
        got = {
            (r["window_start"], r["event_type"]): (r["n_events"], r["total_value"])
            for r in pt.read(spark).collect()
        }
        expect = {
            (r["window_start"], r["event_type"]): (r["n_events"], r["total_value"])
            for r in windowed_event_counts(_batch_events(spark)).collect()
        }
        assert got == expect

        # replay over the same checkpoint: no new data -> snapshot unchanged
        ver_before, _ = pt.latest()
        q2 = stream_events_to_mart(spark, events_dir, mart_root, ckpt)
        _drain(q2)
        ver_after, _ = pt.latest()
        assert ver_after == ver_before


class TestStreamAheadOfData:
    def test_stream_starts_on_empty_source_dir(self, spark, tmp_path):
        """A stream defined before the first file lands must fall back to
        the canonical declared schema instead of raising at definition."""
        empty = str(tmp_path / "not_yet_created")
        stream = read_events_stream(spark, empty)
        assert stream.isStreaming
        assert dict(stream.dtypes)["ts"] == "timestamp"


def test_stream_exam_ingest_end_to_end(spark, tmp_path):
    """The async-queue analog: TRT files dropped in a landing dir are
    ingested exactly-once — the file-source checkpoint skips already-seen
    files across restarts, and digest dedup no-ops a re-dropped payload."""
    from rdw_spark.sources.package import parse_package, read_package_csv
    from rdw_spark.sources.org import parse_org_json, resolve_school_district_ids
    from rdw_spark.streaming.ingest import stream_exam_ingest
    from rdw_spark.warehouse import ImportLog, TableStore
    from rdw_spark.warehouse.import_log import ImportContent, ImportStatus

    from tests.test_sources import ORG_JSON, PACKAGE_CSV, make_trt

    wh = TableStore(str(tmp_path / "warehouse"))
    log = ImportLog(wh, archive_root=str(tmp_path / "archive"))
    rec = log.accept(spark, ImportContent.PACKAGE, PACKAGE_CSV.encode())
    wh.merge_upsert(spark, "asmt",
                    parse_package(read_package_csv(spark, PACKAGE_CSV))["asmt"],
                    rec.id)
    rec2 = log.accept(spark, ImportContent.ORGANIZATION, ORG_JSON.encode())
    org = parse_org_json(spark, ORG_JSON)
    wh.merge_upsert(spark, "district", org["district"], rec2.id)
    wh.merge_upsert(
        spark, "school",
        resolve_school_district_ids(org["school"], wh.read(spark, "district")),
        rec2.id)

    landing = tmp_path / "landing"
    landing.mkdir()
    ckpt = str(tmp_path / "ckpt")
    (landing / "a.xml").write_bytes(make_trt(opp_id="S-1", ssid="STU001"))
    (landing / "b.xml").write_bytes(make_trt(opp_id="S-2", ssid="STU002"))

    q = stream_exam_ingest(spark, wh, log, str(landing), ckpt)
    _drain(q)
    assert sorted(
        r["opp_id"] for r in wh.read(spark, "exam").select("opp_id").collect()
    ) == ["S-1", "S-2"]

    # drop one new file + one byte-identical duplicate of a.xml, restart
    (landing / "c.xml").write_bytes(make_trt(opp_id="S-3", ssid="STU001"))
    (landing / "a_again.xml").write_bytes(make_trt(opp_id="S-1", ssid="STU001"))
    q = stream_exam_ingest(spark, wh, log, str(landing), ckpt)
    _drain(q)

    exams = sorted(
        r["opp_id"] for r in wh.read(spark, "exam").select("opp_id").collect()
    )
    assert exams == ["S-1", "S-2", "S-3"]  # duplicate payload no-opped
    imports = log.read(spark).filter(F.col("content") == ImportContent.EXAM)
    # 3 distinct digests; the re-dropped payload reused its import row
    assert imports.count() == 3
    assert imports.filter(F.col("status") == ImportStatus.PROCESSED).count() == 3


def test_stream_exam_ingest_payloads_stay_distributed(spark, tmp_path, monkeypatch):
    """Scale gate for the streaming sink: payload bytes must never funnel
    through the driver — process_accepted receives the micro-batch as a
    DataFrame (parse runs where the data is), and the archive bytes are
    written by executor-side tasks with the same content/digest-prefix
    layout the driver-side accept uses."""
    from pyspark.sql import DataFrame as SparkDataFrame

    import rdw_spark.streaming.ingest as SI
    from rdw_spark.sources.package import parse_package, read_package_csv
    from rdw_spark.sources.org import parse_org_json, resolve_school_district_ids
    from rdw_spark.warehouse import ImportLog, TableStore
    from rdw_spark.warehouse.import_log import ImportContent

    from tests.test_sources import ORG_JSON, PACKAGE_CSV, make_trt

    wh = TableStore(str(tmp_path / "warehouse"))
    log = ImportLog(wh, archive_root=str(tmp_path / "archive"))
    rec = log.accept(spark, ImportContent.PACKAGE, PACKAGE_CSV.encode())
    wh.merge_upsert(spark, "asmt",
                    parse_package(read_package_csv(spark, PACKAGE_CSV))["asmt"],
                    rec.id)
    rec2 = log.accept(spark, ImportContent.ORGANIZATION, ORG_JSON.encode())
    org = parse_org_json(spark, ORG_JSON)
    wh.merge_upsert(spark, "district", org["district"], rec2.id)
    wh.merge_upsert(
        spark, "school",
        resolve_school_district_ids(org["school"], wh.read(spark, "district")),
        rec2.id)

    seen_types = []
    orig = SI.process_accepted

    def spy(s, w, lg, accepted):
        seen_types.append(type(accepted))
        return orig(s, w, lg, accepted)

    monkeypatch.setattr(SI, "process_accepted", spy)

    landing = tmp_path / "landing"
    landing.mkdir()
    payload = make_trt(opp_id="S-9", ssid="STU001")
    (landing / "a.xml").write_bytes(payload)
    q = SI.stream_exam_ingest(spark, wh, log, str(landing), str(tmp_path / "ckpt"))
    _drain(q)

    assert seen_types and all(issubclass(t, SparkDataFrame) for t in seen_types)
    assert [r["opp_id"] for r in wh.read(spark, "exam").collect()] == ["S-9"]
    # archive parity with the driver-side path: bytes land at the digest
    # address and read back identical through the ImportLog API
    import hashlib
    digest = hashlib.md5(payload).hexdigest().upper()
    assert log.read_archived_payload(ImportContent.EXAM, digest) == payload


def _drop_docs(spark, tmp_path, landing, name, rows):
    from rdw_spark.streaming.corpus import DOC_SCHEMA

    spark.createDataFrame(rows, DOC_SCHEMA).coalesce(1).write.mode(
        "overwrite"
    ).parquet(str(tmp_path / "stage" / name))
    import glob as g
    import shutil

    src = g.glob(str(tmp_path / "stage" / name / "*.parquet"))[0]
    shutil.copy(src, str(landing / f"{name}.parquet"))


def test_stream_corpus_build_dedups_across_batches(spark, tmp_path):
    """Continuous corpus build: batches of documents land as parquet, each
    micro-batch dedups against the maintained fingerprint index (never
    rescanning the corpus), survivors append, duplicates across batches
    and across restarts are dropped exactly once."""
    from rdw_spark.streaming.corpus import corpus_tables, stream_corpus_build

    landing = tmp_path / "landing"
    landing.mkdir()
    out_root = str(tmp_path / "corpus_store")
    ckpt = str(tmp_path / "ckpt")

    def drop(name, rows):
        _drop_docs(spark, tmp_path, landing, name, rows)

    drop("b1", [
        (1, "the quick brown fox", "en", "src0", 19),
        (2, "completely different text", "en", "src0", 25),
        (3, "the quick brown fox", "en", "src1", 19),  # in-batch dup of 1
    ])
    q = stream_corpus_build(spark, str(landing), out_root, ckpt)
    _drain(q)

    t = corpus_tables(out_root)
    corpus, index = t["corpus"], t["fpindex"]
    assert sorted(r["doc_id"] for r in corpus.read(spark).collect()) == [1, 2]
    assert index.read(spark).count() == 2

    # batch 2 lands after a restart: one cross-batch dup, one new doc
    drop("b2", [
        (4, "the quick brown fox", "en", "src2", 19),   # dup of corpus doc 1
        (5, "a genuinely new document", "en", "src2", 24),
    ])
    q = stream_corpus_build(spark, str(landing), out_root, ckpt)
    _drain(q)

    assert sorted(r["doc_id"] for r in corpus.read(spark).collect()) == [1, 2, 5]
    idx = {r["canonical_id"] for r in index.read(spark).collect()}
    assert idx == {1, 2, 5}
    # exact drops recorded with their canonical: in-batch dup 3 and
    # cross-batch dup 4 both point at doc 1
    drops = {r["doc_id"]: (r["stage"], r["detail"])
             for r in t["drops"].read(spark).collect()}
    assert drops == {3: ("exact_dup", "1"), 4: ("exact_dup", "1")}


def test_stream_corpus_repetition_stage(spark, tmp_path):
    """The streaming twin of build_corpus's repetition stage: a
    phrase-looping doc in a micro-batch is dropped with stage
    'repetition' before it touches the dedup indexes."""
    from rdw_spark.streaming.corpus import corpus_tables, stream_corpus_build

    landing = tmp_path / "landing"
    landing.mkdir()

    _drop_docs(spark, tmp_path, landing, "b1", [
        (1, _wordy("clean", 40), "en", "src0", 200),
        (2, "buy now " * 100, "en", "src0", 800),
    ])
    q = stream_corpus_build(
        spark, str(landing), str(tmp_path / "corpus_store"),
        str(tmp_path / "ckpt"), near_dup=False,
        repetition_thresholds={},
    )
    _drain(q)

    t = corpus_tables(str(tmp_path / "corpus_store"))
    assert [r["doc_id"] for r in t["corpus"].read(spark).collect()] == [1]
    drops = {r["doc_id"]: r["stage"] for r in t["drops"].read(spark).collect()}
    assert drops == {2: "repetition"}
    # the dropped doc never entered the fingerprint index
    assert {r["canonical_id"] for r in t["fpindex"].read(spark).collect()} == {1}


def _wordy(prefix: str, n: int) -> str:
    return " ".join(f"{prefix}{i}" for i in range(n))


def test_stream_corpus_near_dup_across_batches_matches_batch_build(spark, tmp_path):
    """The near-dup tier of the streaming build: near-identical (NOT
    byte-identical) documents arriving in different micro-batches across
    restarts keep exactly one survivor, transitive chains collapse via the
    cluster map, and the final corpus equals the batch ``build_corpus``
    survivors on the same data."""
    from rdw_spark.plans.corpus import build_corpus
    from rdw_spark.streaming.corpus import (
        DOC_SCHEMA, corpus_tables, stream_corpus_build,
    )

    landing = tmp_path / "landing"
    landing.mkdir()
    out_root = str(tmp_path / "corpus_store")
    ckpt = str(tmp_path / "ckpt")

    base = _wordy("tok", 60)
    near1 = base.replace("tok3 ", "zzz3 ")           # ~0.93 jaccard vs base
    near2 = base.replace("tok7 ", "qqq7 ")           # near-dup of base AND near1
    other = _wordy("unrelated", 40)
    fresh = _wordy("fresh", 40)
    rows = {
        1: (1, base, "en", "src0", len(base)),
        2: (2, other, "en", "src0", len(other)),
        3: (3, near1, "en", "src1", len(near1)),
        4: (4, fresh, "en", "src1", len(fresh)),
        5: (5, near2, "en", "src2", len(near2)),
    }

    _drop_docs(spark, tmp_path, landing, "b1", [rows[1], rows[2]])
    q = stream_corpus_build(spark, str(landing), out_root, ckpt)
    _drain(q)

    # restart; a near-dup of corpus doc 1 plus a genuinely new doc land
    _drop_docs(spark, tmp_path, landing, "b2", [rows[3], rows[4]])
    q = stream_corpus_build(spark, str(landing), out_root, ckpt)
    _drain(q)

    t = corpus_tables(out_root)
    assert sorted(r["doc_id"] for r in t["corpus"].read(spark).collect()) == [1, 2, 4]
    cmap = {r["doc_id"]: r["canonical_id"]
            for r in t["clusters"].read(spark).collect()}
    assert cmap == {3: 1}

    # restart again; a THIRD near-variant arrives — the transitive chain
    # (5 ~ dropped 3 ~ kept 1) must still resolve to canonical 1
    _drop_docs(spark, tmp_path, landing, "b3", [rows[5]])
    q = stream_corpus_build(spark, str(landing), out_root, ckpt)
    _drain(q)

    assert sorted(r["doc_id"] for r in t["corpus"].read(spark).collect()) == [1, 2, 4]
    cmap = {r["doc_id"]: r["canonical_id"]
            for r in t["clusters"].read(spark).collect()}
    assert cmap == {3: 1, 5: 1}
    # the drop report explains every non-survivor
    drops = {r["doc_id"]: (r["stage"], r["detail"])
             for r in t["drops"].read(spark).collect()}
    assert drops == {3: ("near_dup", "1"), 5: ("near_dup", "1")}

    # parity: the batch pipeline over the SAME five docs keeps the same set
    all_docs = spark.createDataFrame(list(rows.values()), DOC_SCHEMA)
    batch = build_corpus(
        all_docs,
        quality_thresholds={"min_chars": 1, "min_tokens": 1,
                            "min_avg_token_len": 0.0, "max_avg_token_len": 99.0,
                            "max_punct_ratio": 1.0, "min_alpha_ratio": 0.0},
        eval_fraction=0.0,
    )
    kept_batch = sorted(
        r["doc_id"]
        for r in batch["train"].unionByName(batch["eval"]).collect()
    )
    assert kept_batch == [1, 2, 4]


def test_stream_corpus_bridge_doc_merges_canonicals(spark, tmp_path):
    """A new doc similar to TWO existing corpus canonicals merges their
    components: the min-id canonical survives, the other is physically
    deleted from the corpus and recorded in the cluster map — the stream
    converges to batch-CC semantics instead of keeping both."""
    from rdw_spark.streaming.corpus import corpus_tables, stream_corpus_build

    landing = tmp_path / "landing"
    landing.mkdir()
    out_root = str(tmp_path / "corpus_store")
    ckpt = str(tmp_path / "ckpt")

    shared = [f"core{i}" for i in range(40)]
    only_a = [f"alpha{i}" for i in range(30)]
    only_b = [f"beta{i}" for i in range(30)]
    doc_a = " ".join(shared + only_a)            # J(a,b) = 40/100 = 0.4
    doc_b = " ".join(shared + only_b)
    bridge = " ".join(shared + only_a + only_b)  # J(bridge,a)=J(bridge,b)=0.7

    kw = dict(near_dup=True, num_hashes=32, bands=16, threshold=0.5)
    _drop_docs(spark, tmp_path, landing, "b1",
               [(10, doc_a, "en", "srcA", len(doc_a))])
    q = stream_corpus_build(spark, str(landing), out_root, ckpt, **kw)
    _drain(q)
    _drop_docs(spark, tmp_path, landing, "b2",
               [(20, doc_b, "en", "srcB", len(doc_b))])
    q = stream_corpus_build(spark, str(landing), out_root, ckpt, **kw)
    _drain(q)

    t = corpus_tables(out_root)
    assert sorted(r["doc_id"] for r in t["corpus"].read(spark).collect()) == [10, 20]

    _drop_docs(spark, tmp_path, landing, "b3",
               [(30, bridge, "en", "srcC", len(bridge))])
    q = stream_corpus_build(spark, str(landing), out_root, ckpt, **kw)
    _drain(q)

    assert sorted(r["doc_id"] for r in t["corpus"].read(spark).collect()) == [10]
    cmap = {r["doc_id"]: r["canonical_id"]
            for r in t["clusters"].read(spark).collect()}
    assert cmap == {20: 10, 30: 10}
    drops = {r["doc_id"]: r["stage"] for r in t["drops"].read(spark).collect()}
    assert drops == {20: "merged", 30: "near_dup"}


@pytest.mark.exhaustive
def test_stream_corpus_probe_reads_only_touched_buckets(spark, tmp_path, monkeypatch):
    """The O(batch) probe gate: with a populated corpus, a small batch's
    index probes must pass explicit partition lists (manifest pruning) —
    never a full-index read — and the lists must be batch-sized, not
    index-sized."""
    from rdw_spark.streaming.corpus import stream_corpus_build
    from rdw_spark.warehouse.partstore import PartitionedTable

    landing = tmp_path / "landing"
    landing.mkdir()
    out_root = str(tmp_path / "corpus_store")
    ckpt = str(tmp_path / "ckpt")

    _drop_docs(spark, tmp_path, landing, "big", [
        (i, _wordy(f"doc{i}word", 30), "en", "src0", 100) for i in range(1, 41)
    ])
    q = stream_corpus_build(spark, str(landing), out_root, ckpt)
    q.awaitTermination(180)

    calls = []
    orig_read = PartitionedTable.read

    def spy(self, s, parts=None, version=None):
        calls.append((self.name, None if parts is None else len(parts)))
        return orig_read(self, s, parts=parts, version=version)

    monkeypatch.setattr(PartitionedTable, "read", spy)
    _drop_docs(spark, tmp_path, landing, "small", [
        (100, _wordy("small100word", 30), "en", "src0", 100),
        (101, _wordy("small101word", 30), "en", "src0", 100),
    ])
    q = stream_corpus_build(spark, str(landing), out_root, ckpt)
    _drain(q)

    probes = [(n, p) for n, p in calls
              if n in ("fpindex", "bandindex", "sigindex", "clusters")]
    assert probes, "expected pruned index probes during the micro-batch"
    assert all(p is not None for _, p in probes), f"unpruned full read: {probes}"
    by_name = {}
    for n, p in probes:
        by_name.setdefault(n, []).append(p)
    # 2 docs -> <=2 digest prefixes; <=16 band buckets of 128
    assert max(by_name["fpindex"]) <= 2
    assert max(by_name.get("bandindex", [0])) <= 16


def test_maintain_corpus_compacts_and_preserves_state(spark, tmp_path):
    """Maintenance over the streaming corpus store: after several
    micro-batches fragment the buckets, maintain_corpus folds files and
    GCs superseded versions while every table reads back identically."""
    from rdw_spark.streaming.corpus import (
        corpus_tables, maintain_corpus, stream_corpus_build,
    )

    landing = tmp_path / "landing"
    landing.mkdir()
    out_root = str(tmp_path / "corpus_store")
    for b in range(3):
        _drop_docs(spark, tmp_path, landing, f"b{b}", [
            (b * 10 + i, _wordy(f"doc{b}x{i}", 12), "en", "src0", 60)
            for i in range(3)
        ])
        q = stream_corpus_build(spark, str(landing), out_root,
                                str(tmp_path / "ckpt"), near_dup=False)
        _drain(q)

    t = corpus_tables(out_root)
    before = {n: sorted(map(tuple, pt.read(spark).collect()))
              for n, pt in t.items()}
    report = maintain_corpus(spark, out_root, max_files=1)
    assert set(report) == set(t)
    after = {n: sorted(map(tuple, pt.read(spark).collect()))
             for n, pt in t.items()}
    assert after == before  # maintenance never changes content
    # something actually got folded or GC'd across the 3-batch history
    assert sum(r["compacted_partitions"] + r["removed_dirs"]
               for r in report.values()) > 0


def test_stream_corpus_csv_input_with_reject_quarantine(spark, tmp_path):
    """CSV landing shards (header row, multiLine off per the docsource
    contract): good rows flow through, type-corrupt lines land in the
    drops table as 'rejected' with negative synthetic ids."""
    from rdw_spark.streaming.corpus import corpus_tables, stream_corpus_build

    landing = tmp_path / "landing"
    landing.mkdir()
    (landing / "shard1.csv").write_text(
        "doc_id,text,lang,source,n_chars\n"
        "1,the quick brown fox,en,s0,19\n"
        "2,another document entirely,en,s0,\n"
        "oops,not a number id,en,s0,5\n"
    )
    q = stream_corpus_build(spark, str(landing), str(tmp_path / "store"),
                            str(tmp_path / "ckpt"), input_format="csv",
                            near_dup=False)
    _drain(q)

    t = corpus_tables(str(tmp_path / "store"))
    rows = {r["doc_id"]: r for r in t["corpus"].read(spark).collect()}
    assert sorted(rows) == [1, 2]
    assert rows[2]["n_chars"] == len("another document entirely")
    drops = t["drops"].read(spark).collect()
    assert len(drops) == 1
    assert drops[0]["stage"] == "rejected"
    assert drops[0]["doc_id"] < 0


@pytest.mark.exhaustive
def test_stream_corpus_with_stats_records_batch_metrics(spark, tmp_path):
    """with_stats=True: each micro-batch records input/written/wall_ms plus
    one row per drop stage, and a later batch's exact-dups show up in its
    own batch's counters."""
    from rdw_spark.streaming.corpus import corpus_tables, stream_corpus_build

    landing = tmp_path / "landing"
    landing.mkdir()
    out_root = str(tmp_path / "store")
    ckpt = str(tmp_path / "ckpt")

    docs1 = spark.createDataFrame(
        [(1, "the quick brown fox jumps", "en", "s0", 25),
         (2, "the quick brown fox jumps", "en", "s0", 25),  # in-batch dup
         (3, "a different text entirely here", "en", "s0", 30)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    docs1.coalesce(1).write.parquet(str(landing / "b1"))
    q = stream_corpus_build(spark, str(landing) + "/*", out_root, ckpt,
                            near_dup=False, with_stats=True)
    _drain(q)

    t = corpus_tables(out_root)
    stats = {(r["batch_id"], r["stage"]): r["n"]
             for r in t["stats"].read(spark).collect()}
    b0 = {k[1]: v for k, v in stats.items() if k[0] == 0}
    assert b0["input"] == 3
    assert b0["exact_dup"] == 1
    assert b0["written"] == 2
    assert b0["wall_ms"] >= 0

    # batch 2: one cross-batch dup, one fresh doc
    docs2 = spark.createDataFrame(
        [(9, "the quick brown fox jumps", "en", "s1", 25),
         (10, "yet another brand new doc", "en", "s1", 25)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    docs2.coalesce(1).write.parquet(str(landing / "b2"))
    q = stream_corpus_build(spark, str(landing) + "/*", out_root, ckpt,
                            near_dup=False, with_stats=True)
    _drain(q)
    stats = {(r["batch_id"], r["stage"]): r["n"]
             for r in t["stats"].read(spark).collect()}
    batches = {k[0] for k in stats}
    assert len(batches) == 2
    b1 = {k[1]: v for k, v in stats.items() if k[0] == max(batches)}
    assert b1["input"] == 2
    assert b1["exact_dup"] == 1
    assert b1["written"] == 1


@pytest.mark.exhaustive
def test_stream_corpus_normalize_unicode_cross_batch_dedup(spark, tmp_path):
    """normalize_unicode='NFC': a decomposed rendering arriving in a later
    micro-batch exact-dedups against its precomposed twin from an earlier
    one (their digests differ without the stage)."""
    from rdw_spark.streaming.corpus import corpus_tables, stream_corpus_build

    landing = tmp_path / "landing"
    landing.mkdir()
    out_root = str(tmp_path / "store")
    ckpt = str(tmp_path / "ckpt")
    schema = "doc_id long, text string, lang string, source string, n_chars long"
    body = "a repeated piece about caf\u00e9 culture in town " * 4

    spark.createDataFrame([(1, body, "en", "s0", len(body))], schema) \
        .coalesce(1).write.parquet(str(landing / "b1"))
    q = stream_corpus_build(spark, str(landing) + "/*", out_root, ckpt,
                            near_dup=False, normalize_unicode="NFC")
    _drain(q)

    decomposed = body.replace("\u00e9", "e\u0301")
    assert decomposed != body
    spark.createDataFrame([(9, decomposed, "en", "s1", len(decomposed))],
                          schema).coalesce(1).write.parquet(str(landing / "b2"))
    q = stream_corpus_build(spark, str(landing) + "/*", out_root, ckpt,
                            near_dup=False, normalize_unicode="NFC")
    _drain(q)

    t = corpus_tables(out_root)
    assert sorted(r["doc_id"] for r in t["corpus"].read(spark).collect()) == [1]
    d = {r["doc_id"]: (r["stage"], r["detail"])
         for r in t["drops"].read(spark).collect()}
    assert d[9] == ("exact_dup", "1")


@pytest.mark.exhaustive
def test_corpus_drift_between_store_versions(spark, tmp_path):
    """Composition: time-travel the streaming corpus table and feed two
    versions to the batch corpus_drift report — 'what did the last N
    micro-batches do to the language mix' with no extra state."""
    from rdw_spark.plans.corpus import corpus_drift
    from rdw_spark.streaming.corpus import corpus_tables, stream_corpus_build

    landing = tmp_path / "landing"
    landing.mkdir()
    out_root = str(tmp_path / "store")
    ckpt = str(tmp_path / "ckpt")
    mk = lambda i, lang: (  # noqa: E731
        i, f"document {i} body entirely its own {i}", lang, "s0", 30)
    schema = "doc_id long, text string, lang string, source string, n_chars long"

    spark.createDataFrame([mk(1, "en"), mk(2, "en")], schema) \
        .coalesce(1).write.parquet(str(landing / "b1"))
    q = stream_corpus_build(spark, str(landing) + "/*", out_root, ckpt,
                            near_dup=False)
    _drain(q)
    corpus = corpus_tables(out_root)["corpus"]
    v_before = corpus.latest()[0]

    spark.createDataFrame([mk(3, "de"), mk(4, "de"), mk(5, "de")], schema) \
        .coalesce(1).write.parquet(str(landing / "b2"))
    q = stream_corpus_build(spark, str(landing) + "/*", out_root, ckpt,
                            near_dup=False)
    _drain(q)

    drift = {r["lang"]: r for r in corpus_drift(
        corpus.read(spark, version=v_before), corpus.read(spark)
    ).collect()}
    assert drift["en"]["n_docs_before"] == 2
    assert drift["en"]["n_docs_after"] == 2
    assert drift["de"]["n_docs_before"] == 0
    assert drift["de"]["n_docs_after"] == 3
    assert drift["de"]["share_delta"] > 0.5
    assert abs(drift["en"]["share_delta"] - (0.4 - 1.0)) < 1e-9


@pytest.mark.exhaustive
def test_validate_corpus_store_clean_and_corrupted(spark, tmp_path):
    """A store built by the stream validates clean; an injected
    inconsistency (a cluster loser still present in the corpus) flips the
    matching check and only that check."""
    from pyspark.sql import Row

    from rdw_spark.streaming.corpus import (
        corpus_tables, stream_corpus_build, validate_corpus_store,
    )

    landing = tmp_path / "landing"
    landing.mkdir()
    out_root = str(tmp_path / "store")
    base = "the quick brown fox jumps over the lazy dog again and again "
    docs = spark.createDataFrame(
        [(1, base * 3, "en", "s0", 183),
         (2, base * 3 + "tail", "en", "s0", 187),   # near-dup of 1
         (3, "a completely different document about sailing ships", "en", "s0", 51)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    docs.coalesce(1).write.parquet(str(landing / "b1"))
    q = stream_corpus_build(spark, str(landing) + "/*", out_root,
                            str(tmp_path / "ckpt"))
    _drain(q)

    rep = validate_corpus_store(spark, out_root)
    assert rep["ok"], rep
    assert all(v["count"] == 0 for v in rep["violations"].values())

    # corrupt: claim doc 3 merged into 1 while leaving it in the corpus
    t = corpus_tables(out_root)
    t["clusters"].merge_rows(
        spark, spark.createDataFrame([Row(doc_id=3, canonical_id=1)])
    )
    rep2 = validate_corpus_store(spark, out_root)
    assert not rep2["ok"]
    assert rep2["violations"]["cluster_loser_in_corpus"]["count"] == 1
    assert rep2["violations"]["cluster_loser_in_corpus"]["sample"] == [3]
    others = {k: v for k, v in rep2["violations"].items()
              if k != "cluster_loser_in_corpus"}
    assert all(v["count"] == 0 for v in others.values())


@pytest.mark.exhaustive
def test_stream_corpus_semantic_near_dup_across_batches(spark, tmp_path):
    """semantic=True: paraphrase pairs — lexically DISSIMILAR texts with
    near-identical embeddings — collapse in-batch and across micro-batches
    via the SRP-bucket-pruned embedding index; null-embedding rows skip
    the stage but still dedup lexically."""
    from rdw_spark.streaming.corpus import corpus_tables, stream_corpus_build

    landing = tmp_path / "landing"
    landing.mkdir()
    out_root = str(tmp_path / "store")
    ckpt = str(tmp_path / "ckpt")
    schema = ("doc_id long, text string, lang string, source string, "
              "n_chars long, embedding array<float>")
    e1 = [1.0, 0.2, 0.0, 0.1, 0.0, 0.3, 0.0, 0.0]
    e2 = [0.0, 0.0, 1.0, 0.0, 0.4, 0.0, 0.2, 0.0]  # far from e1

    b1 = spark.createDataFrame(
        [(1, "the cat sat on the warm mat today", "en", "s0", 33, e1),
         (2, "a feline rested upon a heated rug", "en", "s0", 33, e1),
         (3, "completely unrelated topic about ships", "en", "s0", 38, e2)],
        schema,
    )
    b1.coalesce(1).write.parquet(str(landing / "b1"))
    q = stream_corpus_build(spark, str(landing) + "/*", out_root, ckpt,
                            semantic=True, semantic_threshold=0.95)
    q.awaitTermination(180)

    t = corpus_tables(out_root)
    assert sorted(r["doc_id"] for r in t["corpus"].read(spark).collect()) == [1, 3]
    d = {r["doc_id"]: (r["stage"], r["detail"])
         for r in t["drops"].read(spark).collect()}
    assert d[2] == ("near_dup", "1")  # in-batch paraphrase collapsed

    # batch 2: a cross-batch paraphrase of doc 1, plus a null-embedding doc
    b2 = spark.createDataFrame(
        [(9, "one more paraphrase of that cat sentence", "en", "s1", 40, e1),
         (10, "fresh doc with no vector at all", "en", "s1", 31, None)],
        schema,
    )
    b2.coalesce(1).write.parquet(str(landing / "b2"))
    q = stream_corpus_build(spark, str(landing) + "/*", out_root, ckpt,
                            semantic=True, semantic_threshold=0.95)
    q.awaitTermination(180)

    assert sorted(r["doc_id"] for r in t["corpus"].read(spark).collect()) == [1, 3, 10]
    d = {r["doc_id"]: (r["stage"], r["detail"])
         for r in t["drops"].read(spark).collect()}
    assert d[9] == ("near_dup", "1")  # resolved through the embedding index
    # the embedding index holds every exact-survivor's vector (9 included)
    emb_ids = sorted(r["doc_id"] for r in t["embindex"].read(spark).collect())
    assert emb_ids == [1, 2, 3, 9]


def test_stream_corpus_semantic_matches_batch_build(spark, tmp_path):
    """Parity: streaming semantic dedup over micro-batches keeps exactly
    the survivors batch build_corpus(embeddings=...) keeps on the same
    docs — same SRP hyperplanes, same exact-cosine verification, same
    cluster resolution."""
    from rdw_spark.plans.corpus import build_corpus
    from rdw_spark.streaming.corpus import corpus_tables, stream_corpus_build

    landing = tmp_path / "landing"
    landing.mkdir()
    out_root = str(tmp_path / "store")
    ckpt = str(tmp_path / "ckpt")
    schema = ("doc_id long, text string, lang string, source string, "
              "n_chars long, embedding array<float>")
    e1 = [0.9, 0.1, 0.0, 0.2, 0.0, 0.0, 0.1, 0.0]
    e2 = [0.0, 0.1, 0.8, 0.0, 0.5, 0.0, 0.0, 0.2]
    rows = [
        (1, "alpha beta gamma delta epsilon words", "en", "s0", 36, e1),
        (2, "totally different phrasing same meaning", "en", "s0", 39, e1),
        (3, "independent subject matter entirely here", "en", "s0", 40, e2),
        (4, "yet another restatement of the first idea", "en", "s1", 41, e1),
        (5, "second independent subject stays put", "en", "s1", 36, e2),
    ]
    for name, batch in (("b1", rows[:3]), ("b2", rows[3:])):
        spark.createDataFrame(batch, schema).coalesce(1).write.parquet(
            str(landing / name))
        q = stream_corpus_build(spark, str(landing) + "/*", out_root, ckpt,
                                semantic=True, semantic_threshold=0.95)
        q.awaitTermination(180)

    stream_kept = sorted(
        r["doc_id"]
        for r in corpus_tables(out_root)["corpus"].read(spark).collect()
    )

    all_docs = spark.createDataFrame(
        [r[:5] for r in rows],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    emb = spark.createDataFrame(
        [(r[0], r[5]) for r in rows], "doc_id long, embedding array<float>"
    )
    batch_out = build_corpus(
        all_docs, embeddings=emb, cosine_threshold=0.95, eval_fraction=0.0,
        quality_thresholds={"min_chars": 1, "min_tokens": 1,
                            "min_avg_token_len": 0.0, "max_avg_token_len": 99.0,
                            "max_punct_ratio": 1.0, "min_alpha_ratio": 0.0},
    )
    batch_kept = sorted(
        r["doc_id"]
        for r in batch_out["train"].unionByName(batch_out["eval"]).collect()
    )
    assert stream_kept == batch_kept == [1, 3]


@pytest.mark.exhaustive
def test_stream_corpus_jsonl_input_with_reject_quarantine(spark, tmp_path):
    """JSONL landing shards: good rows flow through the full dedup path,
    malformed / empty-text / id-less lines land in the drops table with
    stage 'rejected' (negative synthetic ids for the id-less ones), and
    a replayed landing file stays idempotent via the same checkpoint."""
    from rdw_spark.streaming.corpus import corpus_tables, stream_corpus_build

    landing = tmp_path / "landing"
    landing.mkdir()
    out_root = str(tmp_path / "corpus_store")
    ckpt = str(tmp_path / "ckpt")

    (landing / "shard1.jsonl").write_text(
        '{"doc_id": 1, "text": "the quick brown fox", "lang": "en", "source": "s0", "n_chars": 19}\n'
        '{"doc_id": 2, "text": "another document entirely", "lang": "en", "source": "s0"}\n'
        'not json at all {\n'
        '{"doc_id": 3, "text": "", "lang": "en", "source": "s0"}\n'
        '{"doc_id": null, "text": "orphan text"}\n'
    )
    q = stream_corpus_build(spark, str(landing), out_root, ckpt,
                            input_format="jsonl", near_dup=False)
    _drain(q)

    t = corpus_tables(out_root)
    rows = {r["doc_id"]: r for r in t["corpus"].read(spark).collect()}
    assert sorted(rows) == [1, 2]
    # missing n_chars derived from the text
    assert rows[2]["n_chars"] == len("another document entirely")
    drops = t["drops"].read(spark).collect()
    by_stage = {}
    for r in drops:
        by_stage.setdefault(r["detail"], []).append(r["doc_id"])
    assert set(by_stage) == {"malformed", "empty_text", "null_id"}
    assert by_stage["empty_text"] == [3]          # real id kept
    assert all(i < 0 for i in by_stage["malformed"] + by_stage["null_id"])
    assert all(r["stage"] == "rejected" for r in drops)

    # second shard: a cross-batch exact dup dedups against the index
    (landing / "shard2.jsonl").write_text(
        '{"doc_id": 9, "text": "the quick brown fox", "lang": "en", "source": "s1"}\n'
    )
    q = stream_corpus_build(spark, str(landing), out_root, ckpt,
                            input_format="jsonl", near_dup=False)
    _drain(q)
    assert sorted(r["doc_id"] for r in t["corpus"].read(spark).collect()) == [1, 2]
    dmap = {r["doc_id"]: (r["stage"], r["detail"])
            for r in t["drops"].read(spark).collect() if r["doc_id"] == 9}
    assert dmap == {9: ("exact_dup", "1")}


def test_stream_ann_index_maintenance(spark, tmp_path, sf_dir):
    """Streaming IVF maintenance: embedding shards land, each micro-batch
    appends to the fixed-quantizer index (argmin cell, cell-pruned
    anti-join), probes see landed vectors immediately, and a restart
    replaying the same files is a no-op."""
    import glob
    import shutil

    from pyspark.sql import functions as F

    from rdw_spark.io import load_table
    from rdw_spark.operators.similarity import ivf_index, ivf_topk
    from rdw_spark.streaming.ann import stream_ann_index

    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    path = str(tmp_path / "ivf")
    _, centroids = ivf_index(spark, emb, path, n_centroids=8)
    n0 = spark.read.parquet(path + "/vectors").count()

    landing = tmp_path / "landing"
    landing.mkdir()
    ckpt = str(tmp_path / "ckpt")

    twin = emb.filter(F.col("vec_id") == 3).first()

    def drop(name, rows):
        spark.createDataFrame(
            rows, "vec_id long, embedding array<float>"
        ).coalesce(1).write.mode("overwrite").parquet(
            str(tmp_path / "stage" / name))
        src = glob.glob(str(tmp_path / "stage" / name / "*.parquet"))[0]
        shutil.copy(src, str(landing / f"{name}.parquet"))

    drop("b1", [
        (100001, [float(x) + 0.001 for x in twin["embedding"]]),
        (100002, [float(x) - 0.001 for x in twin["embedding"]]),
    ])
    q = stream_ann_index(spark, str(landing), path, ckpt)
    _drain(q)
    idx = spark.read.parquet(path + "/vectors")
    assert idx.count() == n0 + 2

    # probe freshness: the landed twin is vec 3's nearest neighbor
    qdf = spark.createDataFrame(
        [(3, list(twin["embedding"]))], "query_id long, query_vec array<float>"
    )
    top = ivf_topk(idx, centroids, qdf, k=2, nprobe=4).collect()
    assert {r["vec_id"] for r in top} == {100001, 100002}

    # restart with no new files: checkpoint replays nothing, count holds
    q = stream_ann_index(spark, str(landing), path, ckpt)
    _drain(q)
    assert spark.read.parquet(path + "/vectors").count() == n0 + 2

    # next shard carries one replayed id + one new: only the new id lands
    drop("b2", [
        (100001, [float(x) + 0.001 for x in twin["embedding"]]),
        (100003, [float(x) + 0.002 for x in twin["embedding"]]),
    ])
    q = stream_ann_index(spark, str(landing), path, ckpt)
    _drain(q)
    final = spark.read.parquet(path + "/vectors")
    assert final.count() == n0 + 3
    assert final.filter(F.col("vec_id") == 100001).count() == 1

    # the stream maintains, it does not bootstrap
    import pytest

    with pytest.raises(ValueError):
        stream_ann_index(spark, str(landing), str(tmp_path / "none"), ckpt)


class TestStreamAttribution:
    def test_stream_matches_batch_across_microbatches(self, spark, tmp_path):
        """Views and purchases split into separate files (separate
        micro-batches at maxFilesPerTrigger=1): cross-batch pairs must
        still join, and the appended result must equal the batch twin."""
        from rdw_spark.streaming.events import attribution_pairs, stream_attribution

        evs = _batch_events(spark)
        src = tmp_path / "events_split"
        src.mkdir()
        # stage views and purchases as separate files so pairs span batches
        evs.filter(F.col("event_type") == "view").coalesce(1).write.parquet(
            str(src / "f1"))
        evs.filter(F.col("event_type") != "view").coalesce(1).write.parquet(
            str(src / "f2"))
        import glob as g
        import shutil as sh
        for i, f in enumerate(
            g.glob(str(src / "f*" / "*.parquet"))
        ):
            sh.copy(f, src / f"part-{i}.parquet")
        sh.rmtree(src / "f1"), sh.rmtree(src / "f2")

        out = str(tmp_path / "pairs")
        q = stream_attribution(
            spark, str(src), out, str(tmp_path / "ckpt"), window_minutes=60
        )
        _drain(q)

        got = {
            (r.view_id, r.purchase_id)
            for r in spark.read.parquet(out).collect()
        }
        exp = {
            (r.view_id, r.purchase_id)
            for r in attribution_pairs(
                evs.filter(F.col("event_type") == "view"),
                evs.filter(F.col("event_type") == "purchase"),
                60,
            ).collect()
        }
        assert exp, "fixture should produce at least one attribution pair"
        assert got == exp


def test_layout_manifest_pins_bucket_counts(spark, tmp_path):
    """The state dir is self-describing: the first open records the
    bucket layout, later opens reuse it, an explicit mismatch errors
    instead of silently mis-pruning probes, and a legacy dir (tables but
    no layout file) demands explicit opts once."""
    import json
    import os

    import pytest

    from rdw_spark.streaming.corpus import resolve_table_opts

    root = str(tmp_path / "store")
    opts = resolve_table_opts(root, {"fp_prefix_len": 3})
    assert opts["fp_prefix_len"] == 3 and opts["band_buckets"] == 128
    # reopen with no opts -> stored layout wins (NOT the module defaults)
    assert resolve_table_opts(root, None)["fp_prefix_len"] == 3
    with pytest.raises(ValueError, match="different layout"):
        resolve_table_opts(root, {"fp_prefix_len": 2})

    legacy = tmp_path / "old_store"
    (legacy / "fpindex").mkdir(parents=True)
    with pytest.raises(ValueError, match="predates the layout manifest"):
        resolve_table_opts(str(legacy), None)
    got = resolve_table_opts(
        str(legacy),
        {"fp_prefix_len": 3, "band_buckets": 512, "kv_buckets": 256})
    assert got["band_buckets"] == 512
    assert json.load(open(os.path.join(str(legacy), "_layout.json")))[
        "kv_buckets"] == 256


@pytest.mark.exhaustive
def test_validate_flags_duplicate_doc_ids(spark, tmp_path):
    """A producer re-sending an existing doc_id with different text
    violates the id-immutability contract; validation surfaces it."""
    from rdw_spark.streaming.corpus import (
        corpus_tables, resolve_table_opts, validate_corpus_store,
    )

    root = str(tmp_path / "store")
    resolve_table_opts(root, None)
    corpus = corpus_tables(root)["corpus"]
    rows = spark.createDataFrame(
        [(1, "one text", "en", "s0", 8), (2, "two text", "en", "s0", 8)],
        "doc_id long, text string, lang string, source string, n_chars long")
    corpus.append_rows(spark, rows, tag=0)
    conflicting = spark.createDataFrame(
        [(1, "DIFFERENT text", "en", "s0", 14)],
        "doc_id long, text string, lang string, source string, n_chars long")
    corpus.append_rows(spark, conflicting, tag=1)

    report = validate_corpus_store(spark, root)
    assert report["violations"]["duplicate_doc_id"]["count"] == 1
    assert report["violations"]["duplicate_doc_id"]["sample"] == [1]
    assert not report["ok"]


class TestSessionizeWindowed:
    def test_batch_parity_with_lag_rewrite(self, spark):
        """The JVM-native session_window produces the EXACT session set of
        the lag+cumsum rewrite — including the exactly-gap merge edge."""
        import datetime as dt

        from rdw_spark.streaming.events import sessionize_windowed

        t0 = dt.datetime(2024, 1, 1)
        m = lambda mins: t0 + dt.timedelta(minutes=mins)
        edge = spark.createDataFrame(
            [(1, m(0), 1.0), (1, m(30), 2.0),      # exactly gap: merges
             (1, m(60, ), 3.0), (1, m(90.02), 4.0),  # just over: splits
             (2, m(0), 5.0)],
            "user_id int, ts timestamp, value double")

        def canon(df):
            return {
                (r["user_id"], r["session_start"], r["session_end"],
                 r["n_events"], r["total_value"])
                for r in df.collect()
            }

        for ev in (edge, _batch_events(spark)):
            got = canon(sessionize_windowed(ev, gap_minutes=30))
            want = canon(sessionize_batch(ev, gap_minutes=30))
            assert got == want
        assert len(canon(sessionize_windowed(edge, gap_minutes=30))) == 3

    def test_stream_sessions_flush_on_watermark(self, spark, tmp_path):
        """Streaming: append mode emits a session once the watermark
        passes its close; a far-future sentinel closes everything real."""
        import datetime as dt
        import os

        from rdw_spark.streaming.events import sessionize_windowed

        t0 = dt.datetime(2024, 1, 1)
        m = lambda mins: t0 + dt.timedelta(minutes=mins)
        real = [(1, m(0), 1.0), (1, m(10), 2.0), (1, m(120), 3.0),
                (2, m(5), 4.0)]
        sentinel = [(99, m(10_000), 0.0)]
        land = str(tmp_path / "land")
        os.makedirs(land)
        schema = "user_id int, ts timestamp, value double"
        for i, rows in enumerate((real, sentinel)):
            spark.createDataFrame(rows, schema).coalesce(1).write.mode(
                "overwrite").parquet(f"{land}/_stage{i}")
            # the file source doesn't scan subdirs: surface each drop as
            # a top-level file (ordered so mtimes pin batch order)
            for f in os.listdir(f"{land}/_stage{i}"):
                if f.endswith(".parquet"):
                    os.rename(f"{land}/_stage{i}/{f}",
                              f"{land}/drop_{i}.parquet")

        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "1").parquet(land)
        )
        q = (
            sessionize_windowed(stream, gap_minutes=30, watermark_minutes=5)
            .writeStream.format("memory").queryName("native_sessions")
            .outputMode("append").trigger(availableNow=True).start()
        )
        _drain(q)
        got = {
            (r["user_id"], r["session_start"], r["n_events"])
            for r in spark.sql(
                "SELECT * FROM native_sessions WHERE user_id != 99"
            ).collect()
        }
        want = {
            (r["user_id"], r["session_start"], r["n_events"])
            for r in sessionize_batch(
                spark.createDataFrame(real, schema), 30).collect()
        }
        assert got == want


@pytest.mark.exhaustive
def test_maintain_corpus_crash_then_maintain_then_replay(spark, tmp_path):
    """The aggstate crash contract, for the corpus store: if the stream
    died after its state appends but BEFORE the checkpoint commit, and
    maintenance ran before restart, the replayed batch's
    append_rows(tag=top) must land as an idempotent self-overwrite.
    maintain_corpus keeps the newest append tag's dirs referenced
    verbatim (compact(keep_versions={a<top>})), so the replay overwrites
    its own dirs instead of duplicating rows a compacted dir absorbed."""
    import glob
    import os

    from rdw_spark.streaming.corpus import (
        corpus_tables, maintain_corpus, stream_corpus_build,
    )

    landing = tmp_path / "landing"
    landing.mkdir()
    out_root = str(tmp_path / "corpus_store")
    for b in range(3):
        _drop_docs(spark, tmp_path, landing, f"b{b}", [
            (b * 10 + i, _wordy(f"doc{b}x{i}", 12), "en", "src0", 60)
            for i in range(3)
        ])
        q = stream_corpus_build(spark, str(landing), out_root,
                                str(tmp_path / "ckpt"), near_dup=False)
        _drain(q)

    t = corpus_tables(out_root)
    top = t["corpus"].newest_append_tag()
    assert top is not None
    # capture the newest batch's exact append payload per table (what a
    # restarted stream would re-emit) BEFORE maintenance touches anything
    replays = {}
    for name, pt in t.items():
        dirs = glob.glob(os.path.join(out_root, name, "part=*", f"v=a{top}"))
        if dirs:
            replays[name] = spark.read.parquet(*dirs).collect()
    assert replays  # the newest batch appended to at least one table
    before = {n: sorted(map(tuple, pt.read(spark).collect()))
              for n, pt in t.items()}

    maintain_corpus(spark, out_root, max_files=1)

    # the replayable tag dirs survived maintenance on disk
    for name in replays:
        assert glob.glob(os.path.join(out_root, name, "part=*", f"v=a{top}"))

    # crash-replay: same rows, same tag → content identical, no dupes
    for name, rows in replays.items():
        t[name].append_rows(
            spark, spark.createDataFrame(rows, t[name].schema or None),
            tag=top)
    after = {n: sorted(map(tuple, pt.read(spark).collect()))
             for n, pt in t.items()}
    assert after == before
