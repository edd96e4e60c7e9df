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


class TestKsTest:
    def test_hand_solved_two_sample(self, spark):
        """a = [1,2,3], b = [2,3,4]: ECDF gap peaks at v=1 (1/3 vs 0)
        and v=3 (1 vs 2/3) -> D = 1/3; d_num = |cum_a*n_b - cum_b*n_a|
        max = 3; z = sqrt(9/6) * (1/3)."""
        import math

        from rdw_spark.operators.profiling import ks_test

        df = spark.createDataFrame(
            [("a", 1.0), ("a", 2.0), ("a", 3.0),
             ("b", 2.0), ("b", 3.0), ("b", 4.0)], "g string, v double")
        r = ks_test(df, "v", "g", "a", "b").collect()[0]
        assert r["n_a"] == 3 and r["n_b"] == 3
        assert r["d_num"] == 3
        assert r["d_stat"] == 3.0 / 9.0
        assert r["z"] == math.sqrt(9.0 / 6.0) * (3.0 / 9.0)

    def test_identical_samples_zero(self, spark):
        from rdw_spark.operators.profiling import ks_test

        rows = [("a", float(v)) for v in range(10)] + [
            ("b", float(v)) for v in range(10)]
        df = spark.createDataFrame(rows, "g string, v double")
        r = ks_test(df, "v", "g", "a", "b").collect()[0]
        assert r["d_num"] == 0 and r["d_stat"] == 0.0 and r["z"] == 0.0

    def test_disjoint_samples_max(self, spark):
        """Fully separated distributions -> D = 1."""
        from rdw_spark.operators.profiling import ks_test

        rows = [("a", float(v)) for v in range(5)] + [
            ("b", float(v + 100)) for v in range(7)]
        df = spark.createDataFrame(rows, "g string, v double")
        r = ks_test(df, "v", "g", "a", "b").collect()[0]
        assert r["d_stat"] == 1.0
        assert r["d_num"] == 35  # n_a * n_b

    def test_matches_scipy_model(self, spark):
        """Pure-Python ECDF model on a pseudorandom mixed sample."""
        import random

        from rdw_spark.operators.profiling import ks_test

        rnd = random.Random(12)
        a = [round(rnd.gauss(0, 1), 3) for _ in range(80)]
        b = [round(rnd.gauss(0.4, 1.3), 3) for _ in range(60)]
        rows = [("a", v) for v in a] + [("b", v) for v in b]
        df = spark.createDataFrame(rows, "g string, v double")
        support = sorted(set(a) | set(b))
        want = max(
            abs(sum(1 for x in a if x <= v) * len(b)
                - sum(1 for x in b if x <= v) * len(a))
            for v in support)
        r = ks_test(df, "v", "g", "a", "b").collect()[0]
        assert r["d_num"] == want
        assert r["d_stat"] == want / (80.0 * 60.0)


class TestRougeN:
    def test_hand_solved_unigram(self, spark):
        """cand 'the cat sat', ref 'the cat ate food': clipped overlap
        {the:1, cat:1} = 2; P = 2/3, R = 2/4, F1 = 2*2/(3+4)."""
        from rdw_spark.operators.text import rouge_n

        df = spark.createDataFrame(
            [(1, "the cat sat", "the cat ate food")],
            "pair_id long, cand string, ref string")
        r = rouge_n(df, "cand", "ref", n=1).collect()[0]
        assert (r["n_cand"], r["n_ref"], r["overlap"]) == (3, 4, 2)
        assert r["precision"] == 2.0 / 3.0
        assert r["recall"] == 2.0 / 4.0
        assert r["f1"] == 4.0 / 7.0

    def test_clipping_repeated_grams(self, spark):
        """cand 'a a a a' vs ref 'a a': overlap clips to ref's count 2
        (the anti-gaming core of ROUGE)."""
        from rdw_spark.operators.text import rouge_n

        df = spark.createDataFrame(
            [(1, "a a a a", "a a")], "pair_id long, cand string, ref string")
        r = rouge_n(df, "cand", "ref", n=1).collect()[0]
        assert (r["n_cand"], r["n_ref"], r["overlap"]) == (4, 2, 2)
        assert r["precision"] == 0.5 and r["recall"] == 1.0

    def test_bigrams_and_normalization(self, spark):
        """ROUGE-2 on normalized text: 'The CAT sat!' == 'the cat sat';
        bigrams {the cat, cat sat} fully overlap."""
        from rdw_spark.operators.text import rouge_n

        df = spark.createDataFrame(
            [(1, "The CAT sat!", "the cat sat")],
            "pair_id long, cand string, ref string")
        r = rouge_n(df, "cand", "ref", n=2).collect()[0]
        assert (r["n_cand"], r["n_ref"], r["overlap"]) == (2, 2, 2)
        assert r["f1"] == 1.0

    def test_short_side_null_metric(self, spark):
        """Candidate shorter than n -> zero cand grams: precision NULL,
        recall 0; both sides too short -> no row."""
        from rdw_spark.operators.text import rouge_n

        df = spark.createDataFrame(
            [(1, "word", "two words here"), (2, "a", "b")],
            "pair_id long, cand string, ref string")
        out = {r["pair_id"]: r for r in
               rouge_n(df, "cand", "ref", n=2).collect()}
        assert 2 not in out
        r = out[1]
        assert r["n_cand"] == 0 and r["n_ref"] == 2
        assert r["precision"] is None and r["recall"] == 0.0

    def test_n_validated(self, spark):
        import pytest

        from rdw_spark.operators.text import rouge_n

        df = spark.createDataFrame([(1, "a", "b")],
                                   "pair_id long, cand string, ref string")
        with pytest.raises(ValueError, match="n must be"):
            rouge_n(df, "cand", "ref", n=0)


class TestBlockingEval:
    def test_hand_solved_metrics(self, spark):
        """5x4 universe; blocker emits 6 distinct pairs (one duplicated
        -> counted once); truth has 3 pairs, 2 recovered:
        PC = 2/3, RR = 1 - 6/20."""
        from rdw_spark.operators.joins import blocking_eval

        cand = spark.createDataFrame(
            [(1, 10), (1, 11), (2, 10), (3, 12), (4, 13), (5, 10), (1, 10)],
            "id_a long, id_b long")
        truth = spark.createDataFrame(
            [(1, 10), (3, 12), (2, 13)], "id_a long, id_b long")
        r = blocking_eval(cand, truth, 5, 4).collect()[0]
        assert r["n_candidates"] == 6 and r["n_truth"] == 3
        assert r["n_hits"] == 2 and r["n_possible"] == 20
        assert r["pair_completeness"] == 2.0 / 3.0
        assert r["reduction_ratio"] == 1.0 - 6.0 / 20.0

    def test_validates_sizes(self, spark):
        import pytest

        from rdw_spark.operators.joins import blocking_eval

        df = spark.createDataFrame([(1, 2)], "id_a long, id_b long")
        with pytest.raises(ValueError, match="corpus sizes"):
            blocking_eval(df, df, 0, 5)
        with pytest.raises(ValueError, match="overflows"):
            blocking_eval(df, df, 2**32, 2**32)
        with pytest.raises(ValueError, match="n_possible"):
            blocking_eval(df, df)

    def test_lazy_n_possible_frame(self, spark):
        """A 1-row n_possible frame (the self-dedup n·(n−1)/2 space)
        keeps the plan fully lazy and sets the RR denominator."""
        from pyspark.sql import functions as F

        from rdw_spark.operators.joins import blocking_eval

        cand = spark.createDataFrame([(1, 2), (1, 3)], "id_a long, id_b long")
        truth = spark.createDataFrame([(1, 2)], "id_a long, id_b long")
        possible = spark.range(5).agg(
            F.expr("count(1) * (count(1) - 1) DIV 2").cast("long")
            .alias("n_possible"))
        r = blocking_eval(cand, truth, n_possible=possible).collect()[0]
        assert r["n_possible"] == 10
        assert r["reduction_ratio"] == 1.0 - 2.0 / 10.0
        assert r["pair_completeness"] == 1.0


class TestCalibrationReport:
    def test_hand_solved_bins(self, spark):
        """conf {0.05 x2 wrong, 0.95 x4 with 3 right}: bin 0 has n=2
        acc=0, mean .05; bin 9 has n=4 acc=.75 mean .95; conf=1.0 lands
        in the TOP bin, not bins."""
        from rdw_spark.operators.profiling import calibration_report

        rows = [(0.05, 0), (0.05, 0),
                (0.95, 1), (0.95, 1), (0.95, 1), (0.95, 0), (1.0, 1)]
        df = spark.createDataFrame(rows, "conf double, ok long")
        out = {r["bin"]: r for r in
               calibration_report(df, "conf", "ok", bins=10).collect()}
        assert set(out) == {0, 9}
        assert out[0]["n"] == 2 and out[0]["accuracy"] == 0.0
        assert out[0]["mean_conf"] == 0.05
        b9 = out[9]
        assert b9["n"] == 5 and b9["n_correct"] == 4
        assert b9["accuracy"] == 0.8
        assert b9["mean_conf"] == (0.95 * 4 + 1.0) / 5.0

    def test_out_of_range_and_null_dropped(self, spark):
        from rdw_spark.operators.profiling import calibration_report

        rows = [(0.5, 1), (1.5, 1), (-0.1, 0), (None, 1)]
        df = spark.createDataFrame(rows, "conf double, ok long")
        out = calibration_report(df, "conf", "ok", bins=4).collect()
        assert len(out) == 1 and out[0]["bin"] == 2 and out[0]["n"] == 1

    def test_bins_validated(self, spark):
        import pytest

        from rdw_spark.operators.profiling import calibration_report

        df = spark.createDataFrame([(0.5, 1)], "conf double, ok long")
        with pytest.raises(ValueError, match="bins"):
            calibration_report(df, "conf", "ok", bins=0)


class TestDsirWeights:
    @staticmethod
    def _model_weight(raw_docs, target_docs, doc, n=2, ph=3, alpha=1.0):
        """Pure-Python DSIR model: hashed-gram multinomial log-ratio."""
        import hashlib
        import math
        import re
        from collections import Counter

        def grams(text):
            toks = [t for t in
                    re.sub(r"[^a-z0-9]+", " ", text.lower()).strip().split()
                    if t]
            out = []
            for k in range(1, n + 1):
                out += [" ".join(toks[i:i + k])
                        for i in range(len(toks) - k + 1)]
            return [hashlib.md5(g.encode()).hexdigest()[:ph] for g in out]

        nb = 16 ** ph
        cr = Counter(b for d in raw_docs for b in grams(d))
        ct = Counter(b for d in target_docs for b in grams(d))
        nr, nt = sum(cr.values()), sum(ct.values())
        dc = Counter(grams(doc))
        # fold in sorted bucket order, matching the engine contract
        w = 0.0
        for b in sorted(dc):
            lr = (math.log((ct.get(b, 0) + alpha) / (nt + alpha * nb))
                  - math.log((cr.get(b, 0) + alpha) / (nr + alpha * nb)))
            w = w + dc[b] * lr
        return sum(dc.values()), round(w, 10)

    def test_matches_python_model(self, spark):
        from rdw_spark.operators.text import dsir_weights

        raw = ["the cat sat on the mat", "stocks rallied on earnings",
               "el gato come pescado", "the dog ran home",
               "rates fell as markets rallied"]
        target = ["stocks rallied on earnings",
                  "rates fell as markets rallied"]
        rdf = spark.createDataFrame(
            [(i, t) for i, t in enumerate(raw)], "doc_id long, text string")
        tdf = spark.createDataFrame(
            [(i, t) for i, t in enumerate(target)],
            "doc_id long, text string")
        got = {r["doc_id"]: (r["n_grams"], r["log_weight"])
               for r in dsir_weights(rdf, tdf).collect()}
        for i, d in enumerate(raw):
            assert got[i] == self._model_weight(raw, target, d), f"doc {i}"

    def test_target_like_docs_rank_higher(self, spark):
        """Finance docs must outscore the off-domain cat doc when the
        target model is finance text — the selection property DSIR
        exists for."""
        from rdw_spark.operators.text import dsir_weights

        raw = ["the cat sat on the mat", "stocks rallied on earnings"]
        target = ["markets rallied as stocks rose on earnings season"]
        rdf = spark.createDataFrame(
            [(i, t) for i, t in enumerate(raw)], "doc_id long, text string")
        tdf = spark.createDataFrame(
            [(9, target[0])], "doc_id long, text string")
        got = {r["doc_id"]: r["log_weight"]
               for r in dsir_weights(rdf, tdf).collect()}
        assert got[1] > got[0]

    def test_validates_params(self, spark):
        import pytest

        from rdw_spark.operators.text import dsir_weights

        df = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
        with pytest.raises(ValueError, match="n must"):
            dsir_weights(df, df, n=0)
        with pytest.raises(ValueError, match="prefix_hex"):
            dsir_weights(df, df, prefix_hex=0)
        with pytest.raises(ValueError, match="alpha"):
            dsir_weights(df, df, alpha=0.0)


class TestTokenizerFertility:
    def test_hand_solved_counts(self, spark):
        """'hello, world' -> 2 words; subwords: hell+o+','+worl+d = 5;
        12 bytes. 'hi' -> 1 word, 1 subword, 2 bytes."""
        from rdw_spark.operators.text import tokenizer_fertility

        df = spark.createDataFrame(
            [("en", "hello, world"), ("de", "hi"), ("de", None),
             ("de", "  ")], "lang string, text string")
        out = {r["lang"]: r for r in
               tokenizer_fertility(df, "lang").collect()}
        en = out["en"]
        assert (en["n_docs"], en["n_words"], en["n_subwords"],
                en["n_bytes"]) == (1, 2, 5, 12)
        assert en["fertility"] == 2.5
        assert en["bytes_per_subword"] == 12.0 / 5.0
        de = out["de"]   # null/blank docs dropped
        assert (de["n_docs"], de["n_words"], de["n_subwords"]) == (1, 1, 1)


class TestCurriculumOrder:
    def test_stages_and_positions_hand_solved(self, spark):
        """8 docs, scores 0..7, 4 stages -> exactly 2 per stage in score
        order; positions are a permutation of 0..7 that never crosses a
        stage boundary."""
        from rdw_spark.operators.packing import curriculum_order

        df = spark.createDataFrame(
            [(i, float(i)) for i in range(8)], "doc_id long, score double")
        rows = curriculum_order(df, "score", 4).collect()
        by_doc = {r["doc_id"]: r for r in rows}
        for i in range(8):
            assert by_doc[i]["stage"] == i // 2
        assert sorted(r["position"] for r in rows) == list(range(8))
        # stage blocks are contiguous in position space
        for r in rows:
            assert r["stage"] == r["position"] // 2

    def test_descending_and_determinism(self, spark):
        from rdw_spark.operators.packing import curriculum_order

        df = spark.createDataFrame(
            [(i, float(i % 5)) for i in range(20)],
            "doc_id long, score double")
        a = {r["doc_id"]: (r["stage"], r["position"])
             for r in curriculum_order(df, "score", 3,
                                       ascending=False).collect()}
        b = {r["doc_id"]: (r["stage"], r["position"])
             for r in curriculum_order(df.repartition(7), "score", 3,
                                       ascending=False).collect()}
        assert a == b   # partitioning-independent
        # hard-first: the max-score docs sit in stage 0
        hardest = [d for d, (s, _) in a.items() if d % 5 == 4]
        assert all(a[d][0] == 0 for d in hardest)

    def test_validates_stages(self, spark):
        import pytest

        from rdw_spark.operators.packing import curriculum_order

        df = spark.createDataFrame([(1, 0.5)], "doc_id long, score double")
        with pytest.raises(ValueError, match="n_stages"):
            curriculum_order(df, "score", 0)


class TestStreamingKsDrift:
    def test_drift_equals_batch_ks(self, spark, tmp_path):
        """Stream group-a values through the value-counts state; KS vs a
        frozen reference must equal batch ks_test over the union frame
        bit-for-bit (shared ks_from_counts core)."""
        from rdw_spark.operators.profiling import ks_test
        from rdw_spark.streaming.aggstate import (
            read_ks_drift, stream_value_counts_state,
        )

        import random
        rnd = random.Random(5)
        a_vals = [round(rnd.gauss(0, 1), 2) for _ in range(200)]
        b_vals = [round(rnd.gauss(0.5, 1.2), 2) for _ in range(150)]
        adf = spark.createDataFrame([(v,) for v in a_vals], "v double")
        landing = str(tmp_path / "landing")
        adf.repartition(5).write.parquet(landing)
        out, ckpt = str(tmp_path / "state"), str(tmp_path / "ckpt")
        q = stream_value_counts_state(spark, landing, adf.schema, out, ckpt,
                                      "v", max_files_per_trigger=2)
        assert q.awaitTermination(120)

        ref = spark.createDataFrame([(v,) for v in b_vals], "v double")
        got = read_ks_drift(spark, out, ref, "v").collect()[0]
        union = spark.createDataFrame(
            [("a", v) for v in a_vals] + [("b", v) for v in b_vals],
            "g string, v double")
        want = ks_test(union, "v", "g", "a", "b").collect()[0]
        assert got.asDict() == want.asDict()

    def test_no_drift_on_identical_reference(self, spark, tmp_path):
        from rdw_spark.streaming.aggstate import (
            read_ks_drift, stream_value_counts_state,
        )

        vals = [float(v % 13) for v in range(100)]
        adf = spark.createDataFrame([(v,) for v in vals], "v double")
        landing = str(tmp_path / "landing")
        adf.coalesce(1).write.parquet(landing)
        out, ckpt = str(tmp_path / "state"), str(tmp_path / "ckpt")
        q = stream_value_counts_state(spark, landing, adf.schema, out, ckpt, "v")
        assert q.awaitTermination(120)
        r = read_ks_drift(spark, out, adf, "v").collect()[0]
        assert r["d_num"] == 0 and r["d_stat"] == 0.0


class TestImageCodec:
    def _bmp24(self, img):
        import struct

        import numpy as np
        h, w = img.shape[:2]
        bgr = img[:, :, ::-1]
        stride = (w * 3 + 3) & ~3
        rows = b"".join(bgr[y].tobytes() + b"\x00" * (stride - w * 3)
                        for y in range(h - 1, -1, -1))
        return (b"BM" + struct.pack("<IHHI", 54 + len(rows), 0, 0, 54)
                + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0,
                              len(rows), 0, 0, 0, 0) + rows)

    def test_roundtrips_all_formats(self):
        import numpy as np

        from rdw_spark.functions.imagecodec import (
            decode_image, encode_png_gray, encode_ppm,
        )

        rng = np.random.default_rng(3)
        rgb = rng.integers(0, 256, (11, 7, 3), dtype=np.uint8)
        gray = rng.integers(0, 256, (6, 9), dtype=np.uint8)
        assert np.array_equal(decode_image(encode_ppm(rgb)), rgb)
        assert np.array_equal(decode_image(encode_ppm(gray))[:, :, 0], gray)
        assert np.array_equal(
            decode_image(encode_png_gray(gray))[:, :, 0], gray)
        assert np.array_equal(decode_image(self._bmp24(rgb)), rgb)

    def test_png_filters_sub_up_avg_paeth(self):
        """Hand-encode each PNG filter type and check the decoder
        inverts it (the spec's mod-256 recurrences)."""
        import struct
        import zlib

        import numpy as np

        from rdw_spark.functions.imagecodec import PNG_SIG, decode_image

        a = (np.arange(40, dtype=np.uint8).reshape(5, 8) * 7 + 3).astype(
            np.uint8)
        h, w = a.shape

        def chunk(ct, body):
            return (struct.pack(">I", len(body)) + ct + body
                    + struct.pack(">I", zlib.crc32(ct + body)))

        def paeth(al, b, c):
            p = int(al) + int(b) - int(c)
            pa, pb, pc = abs(p - al), abs(p - b), abs(p - c)
            return al if pa <= pb and pa <= pc else (b if pb <= pc else c)

        raw = bytearray()
        prev = np.zeros(w, np.uint8)
        for y in range(h):
            f = y % 5
            line = a[y]
            enc = np.zeros(w, np.uint8)
            for x in range(w):
                left = int(line[x - 1]) if x else 0
                up = int(prev[x])
                ul = int(prev[x - 1]) if x else 0
                cur = int(line[x])
                if f == 0:
                    enc[x] = cur
                elif f == 1:
                    enc[x] = (cur - left) % 256
                elif f == 2:
                    enc[x] = (cur - up) % 256
                elif f == 3:
                    enc[x] = (cur - (left + up) // 2) % 256
                else:
                    enc[x] = (cur - paeth(left, up, ul)) % 256
            raw += bytes([f]) + enc.tobytes()
            prev = line
        png = (PNG_SIG
               + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0))
               + chunk(b"IDAT", zlib.compress(bytes(raw)))
               + chunk(b"IEND", b""))
        assert np.array_equal(decode_image(png)[:, :, 0], a)

    def test_unsupported_rejected(self):
        import pytest

        from rdw_spark.functions.imagecodec import decode_image

        with pytest.raises(ValueError):
            decode_image(b"\xff\xd8\xff\xe0 jpeg-ish")

    def test_ahash_near_dup_property(self):
        import numpy as np

        from rdw_spark.functions.imagecodec import ahash64

        rng = np.random.default_rng(11)
        img = rng.integers(0, 256, (40, 40, 3), dtype=np.uint8)
        noisy = np.clip(img.astype(int)
                        + rng.integers(-2, 3, img.shape), 0, 255
                        ).astype(np.uint8)
        d_noise = bin(ahash64(img) ^ ahash64(noisy)).count("1")
        d_inv = bin(ahash64(img) ^ ahash64(255 - img)).count("1")
        assert d_noise <= 8 < 40 <= d_inv


class TestDecodeImagesOperator:
    def test_mixed_formats_and_error_policy(self, spark):
        import numpy as np

        from rdw_spark.functions.imagecodec import (
            ahash64, encode_png_gray, encode_ppm, to_gray,
        )
        from rdw_spark.operators.multimodal import decode_images

        rng = np.random.default_rng(5)
        rgb = rng.integers(0, 256, (8, 6, 3), dtype=np.uint8)
        gray = rng.integers(0, 256, (4, 4), dtype=np.uint8)
        rows = [(1, bytearray(encode_ppm(rgb))),
                (2, bytearray(encode_png_gray(gray))),
                (3, bytearray(b"not an image"))]
        df = spark.createDataFrame(rows, "doc_id long, media binary")
        out = {r["doc_id"]: r for r in decode_images(df).collect()}
        r1 = out[1]
        assert (r1["fmt"], r1["width"], r1["height"], r1["channels"]) == (
            "pnm", 6, 8, 3)
        assert r1["luma_sum"] == int(to_gray(rgb).sum(dtype="uint64"))
        assert r1["ahash_hex"] == f"{ahash64(rgb):016x}"
        r2 = out[2]
        assert (r2["fmt"], r2["channels"]) == ("png", 1)
        assert r2["luma_sum"] == int(gray.sum(dtype="uint64"))
        assert out[3]["error"] is not None and out[3]["width"] is None
        skipped = decode_images(df, on_error="skip").collect()
        assert sorted(r["doc_id"] for r in skipped) == [1, 2]

    def test_resize_real_nearest_model(self, spark):
        import numpy as np

        from rdw_spark.functions.imagecodec import decode_image, encode_ppm
        from rdw_spark.operators.multimodal import resize_images_real

        rng = np.random.default_rng(9)
        img = rng.integers(0, 256, (10, 14, 3), dtype=np.uint8)
        df = spark.createDataFrame(
            [(1, bytearray(encode_ppm(img))), (2, bytearray(b"junk"))],
            "doc_id long, media binary")
        out = resize_images_real(df, width=7, height=5).collect()
        assert len(out) == 1 and out[0]["doc_id"] == 1   # junk dropped
        got = decode_image(bytes(out[0]["media"]))
        ys = (np.arange(5) * 10) // 5
        xs = (np.arange(7) * 14) // 7
        assert np.array_equal(got, img[np.ix_(ys, xs)])


class TestWavCodec:
    def test_roundtrip_mono_stereo_8_16(self):
        import numpy as np

        from rdw_spark.functions.wavcodec import decode_wav, encode_wav

        rng = np.random.default_rng(4)
        mono16 = rng.integers(-30000, 30000, (50, 1)).astype(np.int32)
        s, r = decode_wav(encode_wav(mono16, 16000, 16))
        assert r == 16000 and np.array_equal(s, mono16)
        st = rng.integers(-100, 100, (33, 2)).astype(np.int32)
        s2, _ = decode_wav(encode_wav(st, 8000, 16))
        assert np.array_equal(s2, st)
        e8 = rng.integers(-128, 128, (20, 1)).astype(np.int32)
        s3, _ = decode_wav(encode_wav(e8, 8000, 8))
        assert np.array_equal(s3, e8)

    def test_features_hand_solved(self):
        import numpy as np

        from rdw_spark.functions.wavcodec import wav_features

        f = wav_features(np.array([[1], [2], [0], [-3], [-1], [4]],
                                  np.int32))
        assert f["n_frames"] == 6
        assert f["energy"] == 1 + 4 + 0 + 9 + 1 + 16
        assert f["peak"] == 4
        assert f["zero_crossings"] == 2   # +..(0 carries +)..- then -..+
        assert wav_features(np.array([[0], [0], [5], [-5]],
                                      np.int32))["zero_crossings"] == 1

    def test_rejects_non_pcm(self):
        import pytest

        from rdw_spark.functions.wavcodec import decode_wav

        with pytest.raises(ValueError):
            decode_wav(b"RIFF\x00\x00\x00\x00WAVEjunk")
        with pytest.raises(ValueError):
            decode_wav(b"not audio at all")


class TestDecodeAudioOperator:
    def test_mixed_blobs_and_features(self, spark):
        import numpy as np

        from rdw_spark.functions.wavcodec import encode_wav, wav_features
        from rdw_spark.operators.multimodal import decode_audio

        rng = np.random.default_rng(6)
        sig = rng.integers(-2000, 2000, (64, 2)).astype(np.int32)
        rows = [(1, bytearray(encode_wav(sig, 22050, 16))),
                (2, bytearray(b"definitely not a wav"))]
        df = spark.createDataFrame(rows, "doc_id long, media binary")
        out = {r["doc_id"]: r for r in decode_audio(df).collect()}
        want = wav_features(sig)
        r1 = out[1]
        assert (r1["sample_rate"], r1["n_channels"]) == (22050, 2)
        assert r1["n_frames"] == want["n_frames"]
        assert r1["energy"] == want["energy"]
        assert r1["peak"] == want["peak"]
        assert r1["zero_crossings"] == want["zero_crossings"]
        assert out[2]["error"] is not None
        assert len(decode_audio(df, on_error="skip").collect()) == 1


class TestGifCodec:
    def test_roundtrip_multiframe(self):
        import numpy as np

        from rdw_spark.functions.gifcodec import decode_gif, encode_gif

        rng = np.random.default_rng(2)
        pal = rng.integers(0, 256, (8, 3), dtype=np.uint8)
        frames = [rng.integers(0, 8, (6, 9), dtype=np.uint8)
                  for _ in range(3)]
        out = decode_gif(encode_gif(frames, pal))
        assert len(out) == 3
        for fi, fr in zip(frames, out):
            assert np.array_equal(fr, pal[fi])

    def test_lzw_decodes_real_compressor_stream(self):
        """The decoder must handle dictionary growth and 4096-resets —
        verified against a classic compressing GIF-LZW encoder written
        inline (the fixture encoder never grows the table)."""
        import numpy as np

        from rdw_spark.functions.gifcodec import _lzw_decode

        def lzw_compress(min_code, data):
            clear = 1 << min_code
            end = clear + 1
            table = {bytes([i]): i for i in range(clear)}
            next_code = end + 1
            width = min_code + 1
            acc = nbits = 0
            out = bytearray()

            def emit(code, w):
                nonlocal acc, nbits
                acc |= code << nbits
                nbits += w
                while nbits >= 8:
                    out.append(acc & 255)
                    acc >>= 8
                    nbits -= 8

            emit(clear, width)
            s = b""
            for ch in data:
                t = s + bytes([ch])
                if t in table:
                    s = t
                    continue
                emit(table[s], width)
                table[t] = next_code
                next_code += 1
                if next_code - 1 == (1 << width) and width < 12:
                    width += 1
                if next_code >= 4096:
                    emit(clear, width)
                    table = {bytes([i]): i for i in range(clear)}
                    next_code = end + 1
                    width = min_code + 1
                s = bytes([ch])
            if s:
                emit(table[s], width)
            emit(end, width)
            if nbits:
                out.append(acc & 255)
            return bytes(out)

        rng = np.random.default_rng(8)
        data = bytes(rng.integers(0, 8, 5000, dtype=np.uint8)) * 3
        assert _lzw_decode(3, lzw_compress(3, data), len(data)) == data

    def test_rejects_non_gif(self):
        import pytest

        from rdw_spark.functions.gifcodec import decode_gif

        with pytest.raises(ValueError):
            decode_gif(b"RIFF....WAVE")


class TestSampleFramesReal:
    def test_even_sampling_and_features(self, spark):
        import numpy as np

        from rdw_spark.functions.gifcodec import encode_gif
        from rdw_spark.functions.imagecodec import ahash64
        from rdw_spark.operators.multimodal import sample_frames_real

        rng = np.random.default_rng(13)
        pal = np.stack([np.arange(16)] * 3, axis=1).astype(np.uint8) * 17
        frames = [rng.integers(0, 16, (8, 8), dtype=np.uint8)
                  for _ in range(10)]
        rows = [(1, bytearray(encode_gif(frames, pal))),
                (2, bytearray(b"nope"))]
        df = spark.createDataFrame(rows, "doc_id long, media binary")
        out = [r for r in sample_frames_real(df, n_frames=4).collect()
               if r["doc_id"] == 1]
        # evenly: (i*10) DIV 4 for i in 0..3 -> frames 0, 2, 5, 7
        assert sorted(r["frame_index"] for r in out) == [0, 2, 5, 7]
        for r in out:
            rgb = pal[frames[r["frame_index"]]]
            assert r["width"] == 8 and r["n_frames_total"] == 10
            # cast every channel up front: under NumPy 2 scalar
            # promotion, 150 * uint8 wraps mod 256
            g = ((77 * rgb[:, :, 0].astype(np.uint32)
                  + 150 * rgb[:, :, 1].astype(np.uint32)
                  + 29 * rgb[:, :, 2].astype(np.uint32)) >> 8)
            assert r["luma_sum"] == int(g.sum())
            assert r["ahash_hex"] == f"{ahash64(rgb):016x}"
        err = [r for r in sample_frames_real(df, n_frames=4).collect()
               if r["doc_id"] == 2]
        assert len(err) == 1 and err[0]["error"] is not None

    def test_short_animation_no_repeats(self, spark):
        import numpy as np

        from rdw_spark.functions.gifcodec import encode_gif
        from rdw_spark.operators.multimodal import sample_frames_real

        pal = np.zeros((4, 3), np.uint8)
        frames = [np.zeros((4, 4), np.uint8), np.ones((4, 4), np.uint8)]
        df = spark.createDataFrame(
            [(1, bytearray(encode_gif(frames, pal)))],
            "doc_id long, media binary")
        out = sample_frames_real(df, n_frames=8).collect()
        assert sorted(r["frame_index"] for r in out) == [0, 1]


class TestDirtyMediaPolicy:
    def test_every_corruption_mode_respects_on_error(self, spark):
        """Truncated headers (struct.error), broken deflate (zlib.error),
        short buffers (IndexError), and zero-dim images must all surface
        as error ROWS under on_error='keep' — never task crashes."""
        import struct
        import zlib

        import numpy as np

        from rdw_spark.functions.imagecodec import PNG_SIG
        from rdw_spark.operators.multimodal import (
            decode_audio, decode_images, sample_frames_real,
        )

        def chunk(ct, body):
            return (struct.pack(">I", len(body)) + ct + body
                    + struct.pack(">I", zlib.crc32(ct + body)))

        bad_png_hdr = PNG_SIG + struct.pack(">I", 3) + b"IHDR" + b"\x01\x02\x03"
        bad_deflate = (PNG_SIG
                       + chunk(b"IHDR",
                               struct.pack(">IIBBBBB", 2, 2, 8, 0, 0, 0, 0))
                       + chunk(b"IDAT", b"\xff\xff notdeflate")
                       + chunk(b"IEND", b""))
        zero_dim = b"P5 0 0 255\n"
        low_maxval = b"P6 2 2 15\n" + bytes(12)
        rows = [(1, bytearray(bad_png_hdr)), (2, bytearray(bad_deflate)),
                (3, bytearray(zero_dim)), (4, bytearray(low_maxval))]
        df = spark.createDataFrame(rows, "doc_id long, media binary")
        out = decode_images(df, on_error="keep").collect()
        assert len(out) == 4 and all(r["error"] is not None for r in out)
        assert decode_images(df, on_error="skip").count() == 0

        wav_rows = [(1, bytearray(b"RIFF\x10\x00\x00\x00WAVEfmt \x02\x00ab"))]
        wdf = spark.createDataFrame(wav_rows, "doc_id long, media binary")
        w = decode_audio(wdf, on_error="keep").collect()
        assert len(w) == 1 and w[0]["error"] is not None

        gif_rows = [(1, bytearray(b"GIF89a\x01\x00"))]
        gdf = spark.createDataFrame(gif_rows, "doc_id long, media binary")
        g = sample_frames_real(gdf, n_frames=2).collect()
        assert len(g) == 1 and g[0]["error"] is not None


class TestGifSelectiveDecode:
    def test_only_decodes_picked_frames(self):
        import numpy as np

        from rdw_spark.functions.gifcodec import (
            decode_gif, encode_gif, gif_frame_count,
        )

        rng = np.random.default_rng(3)
        pal = rng.integers(0, 256, (4, 3), dtype=np.uint8)
        frames = [rng.integers(0, 4, (5, 5), dtype=np.uint8)
                  for _ in range(9)]
        blob = encode_gif(frames, pal)
        assert gif_frame_count(blob) == 9
        sel = decode_gif(blob, only={1, 7})
        assert len(sel) == 2
        assert np.array_equal(sel[0], pal[frames[1]])
        assert np.array_equal(sel[1], pal[frames[7]])
        assert len(decode_gif(blob)) == 9  # only=None decodes all


class TestDsirXxhashPath:
    def test_fast_path_sane_and_deterministic(self, spark):
        from rdw_spark.operators.text import dsir_weights

        raw = ["alpha beta gamma", "alpha beta", "delta epsilon zeta"]
        rdf = spark.createDataFrame(
            [(i, t) for i, t in enumerate(raw)], "doc_id long, text string")
        tdf = rdf.filter("doc_id < 2")
        a = {r["doc_id"]: r for r in
             dsir_weights(rdf, tdf, hash="xxhash64").collect()}
        b = {r["doc_id"]: r for r in
             dsir_weights(rdf.repartition(4), tdf,
                          hash="xxhash64").collect()}
        assert set(a) == {0, 1, 2}
        for k in a:
            assert a[k]["log_weight"] == b[k]["log_weight"]   # deterministic
            assert a[k]["n_grams"] == {0: 5, 1: 3, 2: 5}[k]
        # target-like docs outscore the off-domain one
        assert min(a[0]["log_weight"], a[1]["log_weight"]) \
            > a[2]["log_weight"]

    def test_bogus_hash_rejected(self, spark):
        import pytest

        from rdw_spark.operators.text import dsir_weights

        df = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
        with pytest.raises(ValueError, match="hash"):
            dsir_weights(df, df, hash="sha1")


class TestWavFingerprint:
    def test_properties(self, spark):
        """Deterministic; robust to small noise and exact level scaling
        (delta SIGNS are scale-invariant); far from unrelated audio;
        surfaced as hex by decode_audio."""
        import numpy as np

        from rdw_spark.functions.wavcodec import encode_wav, wav_fingerprint
        from rdw_spark.operators.multimodal import decode_audio

        rng = np.random.default_rng(1)
        sig = rng.integers(-5000, 5000, (8000, 1)).astype(np.int32)
        fp = wav_fingerprint(sig)
        assert fp == wav_fingerprint(sig)
        assert wav_fingerprint(sig * 3) == fp          # scale-invariant
        noisy = sig + rng.integers(-50, 51, sig.shape)
        other = rng.integers(-5000, 5000, (8000, 1)).astype(np.int32)
        assert bin(fp ^ wav_fingerprint(noisy)).count("1") <= 8
        assert bin(fp ^ wav_fingerprint(other)).count("1") >= 16

        df = spark.createDataFrame(
            [(1, bytearray(encode_wav(sig, 16000, 16)))],
            "doc_id long, media binary")
        r = decode_audio(df).collect()[0]
        assert r["fingerprint_hex"] == f"{fp:016x}"

    def test_short_signal_tiles(self):
        import numpy as np

        import pytest

        from rdw_spark.functions.wavcodec import wav_fingerprint

        short = np.arange(10, dtype=np.int32)[:, None]
        assert 0 <= wav_fingerprint(short) < 2**64
        assert wav_fingerprint(np.zeros((0, 1), np.int32)) == 0
        with pytest.raises(ValueError, match="bits"):
            wav_fingerprint(short, bits=0)
