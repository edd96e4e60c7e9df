"""Round-12 additions: streaming states pinned against the DRIVER-WINDOW
catalog entries they twin (VERDICT r11 task 5 — the parity tests must
reference the catalog entry functions directly, so a drift in either the
entry or the state shows up here, not just in hand-rolled fixtures)."""

from __future__ import annotations

from pyspark.sql import functions as F

from rdw_spark.plans.catalog import get_catalog

from .conftest import SF_DIR


class TestStreamingTwinsMatchWindowEntries:
    def test_skipgram_state_equals_text_skipgrams_entry(self, spark, tmp_path):
        """Replay the driver documents table through the skip-gram
        streaming state; the read (same window/min_count as the window
        entry) must equal ``catalog['text_skipgrams']`` frame-for-frame."""
        from rdw_spark.streaming.aggstate import (
            read_skipgram_state, stream_skipgram_state,
        )

        entry = get_catalog()["text_skipgrams"].fn
        want = sorted(map(tuple, entry(spark, SF_DIR).collect()))

        docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
            "doc_id", "text")
        landing = str(tmp_path / "landing")
        docs.repartition(6).write.parquet(landing)
        out, ckpt = str(tmp_path / "state"), str(tmp_path / "ckpt")
        q = stream_skipgram_state(spark, landing, docs.schema, out, ckpt,
                                  window=2, max_files_per_trigger=2)
        assert q.awaitTermination(180)

        got = sorted(map(tuple, read_skipgram_state(
            spark, out, min_count=5).collect()))
        assert got == want

    def test_confusion_state_equals_eval_langid_entry(self, spark, tmp_path):
        """Replay the langid (truth, guess) stream built by the SAME
        scorer the window entry uses; the streaming report must equal
        ``catalog['eval_langid']`` frame-for-frame."""
        from rdw_spark.operators import text as X
        from rdw_spark.streaming.aggstate import (
            read_confusion_report, stream_confusion_state,
        )

        entry = get_catalog()["eval_langid"].fn
        want = sorted(map(tuple, entry(spark, SF_DIR).collect()))

        labeled = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
            F.col("lang").alias("truth"),
            X.language_guess(F.col("text")).alias("pred"))
        landing = str(tmp_path / "landing")
        labeled.repartition(6).write.parquet(landing)
        out, ckpt = str(tmp_path / "state"), str(tmp_path / "ckpt")
        q = stream_confusion_state(spark, landing, labeled.schema, out, ckpt,
                                   "truth", "pred", max_files_per_trigger=2)
        assert q.awaitTermination(180)

        got = sorted(map(tuple, read_confusion_report(spark, out).collect()))
        assert got == want
