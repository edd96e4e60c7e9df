"""Round-11 operators: single-changepoint binary segmentation and
skip-gram context-pair counts."""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F


class TestChangepointSingle:
    def test_obvious_level_shift_hand_solved(self, spark):
        """Series 0,0,0,0,10,10,10,10: the best split is k=4 (cost 0 —
        both segments constant), gain = total SSE = 8·25 = 200
        (mean 5, every deviation ±5)."""
        from rdw_spark.operators.timeseries import changepoint_single

        rows = [Row(k="a", t=i, v=float(0 if i < 4 else 10))
                for i in range(8)]
        df = spark.createDataFrame(rows, "k string, t int, v double")
        out = changepoint_single(df, ["k"], "t", "v", min_seg=2).collect()
        assert len(out) == 1
        r = out[0]
        assert r["cp_index"] == 4 and r["cp_order"] == 3
        assert r["cost"] == 0.0
        assert r["gain"] == 200.0
        assert r["n_points"] == 8

    def test_tie_breaks_to_smallest_index(self, spark):
        """A constant series costs 0 at every split — the reported
        changepoint must be the smallest admissible k."""
        from rdw_spark.operators.timeseries import changepoint_single

        rows = [Row(k="c", t=i, v=7.0) for i in range(10)]
        df = spark.createDataFrame(rows, "k string, t int, v double")
        r = changepoint_single(df, ["k"], "t", "v", min_seg=2).collect()[0]
        assert r["cp_index"] == 2
        assert r["cost"] == 0.0 and r["gain"] == 0.0

    def test_min_seg_validated(self, spark):
        """min_seg < 1 admits zero-length right segments (divide-by-zero
        NaN costs in the argmin) — rejected up front."""
        import pytest

        from rdw_spark.operators.timeseries import changepoint_single

        df = spark.createDataFrame(
            [Row(k="a", t=0, v=1.0)], "k string, t int, v double")
        with pytest.raises(ValueError, match="min_seg"):
            changepoint_single(df, ["k"], "t", "v", min_seg=0)

    def test_short_series_and_nulls_dropped(self, spark):
        """Keys with fewer than 2*min_seg non-null points emit no row;
        NULL values are dropped before ranking."""
        from rdw_spark.operators.timeseries import changepoint_single

        rows = (
            [Row(k="short", t=i, v=1.0) for i in range(3)]
            + [Row(k="padded", t=i,
                   v=None if i % 2 else float(i)) for i in range(6)]
            + [Row(k="ok", t=i, v=float(i >= 5)) for i in range(10)]
        )
        df = spark.createDataFrame(rows, "k string, t int, v double")
        out = {r["k"]: r for r in changepoint_single(
            df, ["k"], "t", "v", min_seg=2).collect()}
        assert "short" not in out          # 3 < 4 points
        assert "padded" not in out         # 3 non-null < 4
        assert out["ok"]["cp_index"] == 5  # split before the step

    def test_partitioning_invariance(self, spark):
        """Decimal prefix sums + pinned double tree: the result is
        bit-identical under repartitioning."""
        from rdw_spark.operators.timeseries import changepoint_single

        rows = [Row(k=f"g{i % 3}", t=j, v=float((i * 7 + j * j) % 13))
                for i in range(3) for j in range(20)]
        df = spark.createDataFrame(rows, "k string, t int, v double")
        a = sorted(map(tuple, changepoint_single(
            df, ["k"], "t", "v").collect()))
        b = sorted(map(tuple, changepoint_single(
            df.repartition(17), ["k"], "t", "v").collect()))
        assert a == b


class TestSkipgramCounts:
    def test_hand_counted_pairs(self, spark):
        """'a b c a b': window=2 forward pairs —
        d=1: (a,b)x2 (b,c) (c,a); d=2: (a,c) (b,a) (c,b)."""
        from rdw_spark.operators.text import skipgram_counts

        df = spark.createDataFrame(
            [Row(doc_id=1, text="a b c a b")], "doc_id long, text string")
        got = {(r["tok_a"], r["tok_b"], r["dist"]): r["n_pairs"]
               for r in skipgram_counts(df, window=2, min_count=1).collect()}
        assert got == {
            ("a", "b", 1): 2, ("b", "c", 1): 1, ("c", "a", 1): 1,
            ("a", "c", 2): 1, ("b", "a", 2): 1, ("c", "b", 2): 1,
        }

    def test_min_count_floor_and_window_1(self, spark):
        from rdw_spark.operators.text import skipgram_counts

        df = spark.createDataFrame(
            [Row(doc_id=i, text="x y z") for i in range(3)],
            "doc_id long, text string")
        out = skipgram_counts(df, window=1, min_count=3).collect()
        got = {(r["tok_a"], r["tok_b"], r["dist"]): r["n_pairs"]
               for r in out}
        assert got == {("x", "y", 1): 3, ("y", "z", 1): 3}
        with pytest.raises(ValueError, match="window"):
            skipgram_counts(df, window=0)

    def test_pairs_never_cross_documents(self, spark):
        """The last token of doc 1 and the first of doc 2 must not pair."""
        from rdw_spark.operators.text import skipgram_counts

        df = spark.createDataFrame(
            [Row(doc_id=1, text="alpha beta"),
             Row(doc_id=2, text="gamma delta")],
            "doc_id long, text string")
        got = {(r["tok_a"], r["tok_b"]) for r in
               skipgram_counts(df, window=2, min_count=1).collect()}
        assert ("beta", "gamma") not in got
        assert got == {("alpha", "beta"), ("gamma", "delta")}


class TestRollingMedian:
    def test_hand_solved_window(self, spark):
        """Series 1..5, lookback 3: windows [1],[1,2],[1,2,3],[2,3,4],
        [3,4,5] -> lower medians 1,1,2,3,4."""
        from rdw_spark.operators.timeseries import rolling_median

        rows = [Row(k="a", t=i, v=i) for i in range(1, 6)]
        df = spark.createDataFrame(rows, "k string, t int, v long")
        out = sorted(rolling_median(df, ["k"], "t", "v", lookback=3)
                     .collect(), key=lambda r: r["t"])
        assert [r["rolling_median"] for r in out] == [1, 1, 2, 3, 4]
        assert [r["n_window"] for r in out] == [1, 2, 3, 3, 3]

    def test_spike_immune_vs_mean(self, spark):
        """A single 1000-spike leaves the trailing median at the baseline."""
        from rdw_spark.operators.timeseries import rolling_median

        vals = [10, 10, 10, 1000, 10, 10, 10]
        rows = [Row(k="a", t=i, v=v) for i, v in enumerate(vals)]
        df = spark.createDataFrame(rows, "k string, t int, v long")
        out = {r["t"]: r["rolling_median"] for r in rolling_median(
            df, ["k"], "t", "v", lookback=3).collect()}
        assert all(out[t] == 10 for t in (4, 5, 6))

    def test_lookback_validation(self, spark):
        import pytest
        from rdw_spark.operators.timeseries import rolling_median

        df = spark.createDataFrame([Row(k="a", t=1, v=1)],
                                   "k string, t int, v long")
        with pytest.raises(ValueError, match="lookback"):
            rolling_median(df, ["k"], "t", "v", lookback=0)


class TestBurstiness:
    def test_perfect_clock_is_minus_one(self, spark):
        """Equal gaps: sigma=0 -> B=(0-mu)/(0+mu) = -1, CV=0."""
        from datetime import datetime, timezone

        from rdw_spark.operators.timeseries import burstiness_report

        base = datetime(2024, 1, 1, tzinfo=timezone.utc)
        rows = [Row(k="clock", ts=base.replace(minute=i)) for i in range(5)]
        df = spark.createDataFrame(rows, "k string, ts timestamp")
        r = burstiness_report(df, ["k"], "ts").collect()[0]
        assert r["n_gaps"] == 4
        assert r["mean_gap_us"] == 60_000_000.0
        assert r["sigma_gap_us"] == 0.0
        assert r["cv"] == 0.0 and r["burstiness"] == -1.0

    def test_hand_solved_two_gaps(self, spark):
        """Gaps 1s and 3s: mu=2e6, var=((2*10e12)-(4e6)^2)/4=1e12,
        sigma=1e6, CV=0.5, B=(1-2)/(1+2)=-1/3."""
        from datetime import datetime, timezone

        from rdw_spark.operators.timeseries import burstiness_report

        base = datetime(2024, 1, 1, tzinfo=timezone.utc)
        ts = [base, base.replace(second=1), base.replace(second=4)]
        df = spark.createDataFrame([Row(k="x", ts=t) for t in ts],
                                   "k string, ts timestamp")
        r = burstiness_report(df, ["k"], "ts").collect()[0]
        assert r["mean_gap_us"] == 2_000_000.0
        assert r["sigma_gap_us"] == 1_000_000.0
        assert r["cv"] == 0.5
        assert r["burstiness"] == (1_000_000.0 - 2_000_000.0) / (
            1_000_000.0 + 2_000_000.0)

    def test_min_events_floor(self, spark):
        from datetime import datetime, timezone

        from rdw_spark.operators.timeseries import burstiness_report

        base = datetime(2024, 1, 1, tzinfo=timezone.utc)
        rows = [Row(k="two", ts=base), Row(k="two", ts=base.replace(second=9))]
        df = spark.createDataFrame(rows, "k string, ts timestamp")
        assert burstiness_report(df, ["k"], "ts", min_events=3).count() == 0


class TestClassificationReport:
    def test_hand_solved_two_class(self, spark):
        """truth a,a,a,b,b ; pred a,a,b,b,b:
        a: n_true=3 n_pred=2 correct=2 -> p=1.0 r=2/3 f1=0.8
        b: n_true=2 n_pred=3 correct=2 -> p=2/3 r=1.0 f1=0.8"""
        from rdw_spark.operators.profiling import classification_report

        rows = list(zip("aaabb", "aabbb"))
        df = spark.createDataFrame(rows, "t string, p string")
        out = {r["cls"]: r for r in classification_report(
            df, "t", "p").collect()}
        a, b = out["a"], out["b"]
        assert (a["n_true"], a["n_pred"], a["n_correct"]) == (3, 2, 2)
        assert a["precision"] == 1.0 and a["recall"] == 2 / 3
        assert a["f1"] == (2.0 * 1.0 * (2 / 3)) / (1.0 + 2 / 3)
        assert (b["n_true"], b["n_pred"], b["n_correct"]) == (2, 3, 2)
        assert b["precision"] == 2 / 3 and b["recall"] == 1.0

    def test_never_predicted_and_phantom_class(self, spark):
        """A class never predicted has NULL precision (not 0); a class
        predicted but never true has NULL recall; both get NULL f1."""
        from rdw_spark.operators.profiling import classification_report

        df = spark.createDataFrame(
            [("x", "y"), ("x", "y")], "t string, p string")
        out = {r["cls"]: r for r in classification_report(
            df, "t", "p").collect()}
        assert out["x"]["n_pred"] == 0 and out["x"]["precision"] is None
        assert out["x"]["recall"] == 0.0 and out["x"]["f1"] is None
        assert out["y"]["n_true"] == 0 and out["y"]["recall"] is None
        assert out["y"]["precision"] == 0.0 and out["y"]["f1"] is None


class TestRetrievalEval:
    def test_hand_solved_metrics(self, spark):
        """q1: rel {d1,d3,d9}; returned ranks d2=1,d3=2,d1=3 ->
        first_rel=2, rr=0.5, hits@2=1, recall@2=1/3.
        q2 in qrels but no results -> rr 0.0, recall 0.0."""
        from rdw_spark.operators.similarity import retrieval_eval

        results = spark.createDataFrame(
            [("q1", "d2", 1), ("q1", "d3", 2), ("q1", "d1", 3)],
            "query_id string, doc_id string, rank long")
        qrels = spark.createDataFrame(
            [("q1", "d1"), ("q1", "d3"), ("q1", "d9"), ("q2", "d5")],
            "query_id string, doc_id string")
        out = {r["query_id"]: r for r in retrieval_eval(
            results, qrels, k=2).collect()}
        q1, q2 = out["q1"], out["q2"]
        assert q1["n_relevant"] == 3 and q1["n_returned"] == 3
        assert q1["first_rel_rank"] == 2 and q1["rr"] == 0.5
        assert q1["hits_at_2"] == 1 and q1["recall_at_2"] == 1 / 3
        assert q2["n_returned"] == 0 and q2["rr"] == 0.0
        assert q2["recall_at_2"] == 0.0 and q2["first_rel_rank"] is None
        # nDCG@2: q1 hit ranks [2] -> dcg = 1/log2(3);
        # idcg = 1/log2(2) + 1/log2(3); q2 has no hits -> 0.0
        import math
        dcg = 1.0 / math.log2(3.0)
        idcg = 1.0 / math.log2(2.0) + 1.0 / math.log2(3.0)
        assert q1["ndcg_at_2"] == round(dcg / idcg, 10)
        assert q2["ndcg_at_2"] == 0.0

    def test_perfect_ranking(self, spark):
        from rdw_spark.operators.similarity import retrieval_eval

        results = spark.createDataFrame(
            [("q", "d1", 1), ("q", "d2", 2)],
            "query_id string, doc_id string, rank long")
        qrels = spark.createDataFrame(
            [("q", "d1"), ("q", "d2")], "query_id string, doc_id string")
        r = retrieval_eval(results, qrels, k=10).collect()[0]
        assert r["rr"] == 1.0 and r["recall_at_10"] == 1.0
        assert r["ndcg_at_10"] == 1.0

    def test_tied_ranks_are_strictified(self, spark):
        """Two distinct relevant docs tied at rank 1 re-rank to
        positions (1, 2) by (rank, doc) — nDCG stays <= 1.0 instead of
        double-counting the rank-1 DCG term."""
        from rdw_spark.operators.similarity import retrieval_eval

        results = spark.createDataFrame(
            [("q", "d1", 1), ("q", "d2", 1)],
            "query_id string, doc_id string, rank long")
        qrels = spark.createDataFrame(
            [("q", "d1"), ("q", "d2")], "query_id string, doc_id string")
        r = retrieval_eval(results, qrels, k=10).collect()[0]
        assert r["ndcg_at_10"] == 1.0          # not 2/idcg > 1
        assert r["first_rel_rank"] == 1 and r["hits_at_10"] == 2


class TestOverlapJoin:
    def test_hand_solved_pairs_and_inclusive_ends(self, spark):
        """L=[0,10],[20,30]; R=[10,12],[15,19],[28,40]:
        ([0,10],[10,12]) touch at 10 (inclusive -> pair),
        ([20,30],[28,40]) overlap, [15,19] matches nothing."""
        from rdw_spark.operators.joins import overlap_join

        L = spark.createDataFrame(
            [(0, 10), (20, 30)], "ls long, le long")
        R = spark.createDataFrame(
            [(10, 12), (15, 19), (28, 40)], "rs long, re long")
        got = sorted((r["ls"], r["le"], r["rs"], r["re"]) for r in
                     overlap_join(L, R, "ls", "le", "rs", "re",
                                  cell=4).collect())
        assert got == [(0, 10, 10, 12), (20, 30, 28, 40)]

    def test_multi_cell_pair_emitted_exactly_once(self, spark):
        """Two long intervals sharing MANY grid cells must pair once —
        the canonical-cell filter replaces a dedup shuffle."""
        from rdw_spark.operators.joins import overlap_join

        L = spark.createDataFrame([(0, 100)], "ls long, le long")
        R = spark.createDataFrame([(5, 95)], "rs long, re long")
        out = overlap_join(L, R, "ls", "le", "rs", "re", cell=3).collect()
        assert len(out) == 1

    def test_matches_naive_range_join(self, spark):
        """Grid plan == naive range-join result on random intervals,
        across cell sizes (incl. cell larger than every interval)."""
        from rdw_spark.operators.joins import overlap_join

        import random
        rnd = random.Random(7)
        L = [(rnd.randrange(0, 500), 0) for _ in range(60)]
        L = [(s, s + rnd.randrange(0, 60)) for s, _ in L]
        R = [(rnd.randrange(0, 500), 0) for _ in range(60)]
        R = [(s, s + rnd.randrange(0, 60)) for s, _ in R]
        ldf = spark.createDataFrame(L, "ls long, le long")
        rdf = spark.createDataFrame(R, "rs long, re long")
        naive = sorted(
            (ls, le, rs, re)
            for ls, le in L for rs, re in R
            if ls <= re and rs <= le)
        for cell in (7, 64, 1000):
            got = sorted((r["ls"], r["le"], r["rs"], r["re"]) for r in
                         overlap_join(ldf, rdf, "ls", "le", "rs", "re",
                                      cell=cell).collect())
            assert got == naive, f"cell={cell}"

    def test_keyed_and_null_bounds(self, spark):
        from rdw_spark.operators.joins import overlap_join

        import pytest
        L = spark.createDataFrame(
            [("a", 0, 10), ("b", 0, 10), ("a", None, 5)],
            "k string, ls long, le long")
        R = spark.createDataFrame(
            [("a", 5, 15), ("c", 5, 15)], "k string, rs long, re long")
        out = overlap_join(L, R, "ls", "le", "rs", "re",
                           cell=4, on=["k"]).collect()
        assert len(out) == 1 and out[0]["k"] == "a"
        with pytest.raises(ValueError, match="cell"):
            overlap_join(L, R, "ls", "le", "rs", "re", cell=0)

    def test_negative_coordinates_hand_solved(self, spark):
        """Cells use exact floor division, so intervals straddling or
        below zero pair correctly (truncating DIV would put -1 and +1
        in the same cell 0 and break canonical-cell exactly-once)."""
        from rdw_spark.operators.joins import overlap_join

        L = [(-10, -4), (-3, 3), (-100, -50)]
        R = [(-5, -5), (0, 1), (-60, -55), (10, 20)]
        ldf = spark.createDataFrame(L, "ls long, le long")
        rdf = spark.createDataFrame(R, "rs long, re long")
        naive = sorted(
            (ls, le, rs, re)
            for ls, le in L for rs, re in R
            if ls <= re and rs <= le)
        for cell in (1, 4, 7, 1000):
            got = sorted((r["ls"], r["le"], r["rs"], r["re"]) for r in
                         overlap_join(ldf, rdf, "ls", "le", "rs", "re",
                                      cell=cell).collect())
            assert got == naive, f"cell={cell}"


class TestCompressionRatio:
    def test_repetition_below_prose_below_noise(self, spark):
        from rdw_spark.operators.text import compression_ratio

        rep = "spam ham " * 200
        prose = ("the quick brown fox jumps over the lazy dog and then "
                 "wanders through nineteen distinct meadows discussing "
                 "philosophy with surprisingly articulate squirrels ") * 10
        import random
        rnd = random.Random(3)
        noise = "".join(rnd.choice("abcdefghijklmnopqrstuvwxyz0123456789")
                        for _ in range(1800))
        df = spark.createDataFrame(
            [Row(doc_id=1, text=rep), Row(doc_id=2, text=prose),
             Row(doc_id=3, text=noise), Row(doc_id=4, text="")],
            "doc_id long, text string")
        out = {r["doc_id"]: r for r in compression_ratio(df).collect()}
        assert out[1]["ratio"] < out[2]["ratio"] < out[3]["ratio"]
        assert out[1]["ratio"] < 0.05           # repetition crushes
        assert out[3]["ratio"] > 0.5            # noise barely compresses
        assert out[4]["ratio"] is None          # empty -> NULL
        assert out[2]["n_bytes"] == len(
            "".join(["the quick brown fox jumps over the lazy dog and then "
                     "wanders through nineteen distinct meadows discussing "
                     "philosophy with surprisingly articulate squirrels "] * 10))

    def test_level_validation(self, spark):
        from rdw_spark.operators.text import compression_ratio

        df = spark.createDataFrame([Row(doc_id=1, text="x")],
                                   "doc_id long, text string")
        with pytest.raises(ValueError, match="level"):
            compression_ratio(df, level=0)


class TestHomoglyphs:
    def test_cloaked_duplicate_collides_on_skeleton(self, spark):
        """'hello world' with Cyrillic 'о' swapped in differs raw but
        collides after skeletonization; the honest doc reports zero
        confusables."""
        from rdw_spark.operators.text import homoglyph_report

        cloaked = "hellо wоrld"   # Cyrillic о twice
        df = spark.createDataFrame(
            [Row(doc_id=1, text="hello world"),
             Row(doc_id=2, text=cloaked),
             Row(doc_id=3, text="HELLO ХΑ club")],  # Cyr Х, Grk Α
            "doc_id long, text string")
        out = {r["doc_id"]: r for r in homoglyph_report(df).collect()}
        assert out[1]["n_confusable_chars"] == 0
        assert out[1]["is_cloaked"] is False
        assert out[2]["n_confusable_chars"] == 2
        assert out[2]["is_cloaked"] is True
        assert out[1]["raw_digest"] != out[2]["raw_digest"]
        assert out[1]["skeleton_digest"] == out[2]["skeleton_digest"]
        assert out[3]["n_confusable_chars"] == 2

    def test_skeleton_column_roundtrip(self, spark):
        from rdw_spark.operators.text import homoglyph_skeleton

        df = spark.createDataFrame(
            [Row(text="Саsh")], "text string")  # Сash cloaked
        got = df.select(homoglyph_skeleton(F.col("text")).alias("s")
                        ).collect()[0]["s"]
        assert got == "Cash"


class TestCorpusCompressionStage:
    def test_compression_bounds_drop_spam_and_noise(self, spark):
        """compression_bounds=(0.1, 0.45): templated spam (ratio ~0.01)
        drops low, random-word noise (~0.62) drops high, small-vocabulary
        prose (~0.25) survives to the split — all three pass the quality
        gates so the stage attribution is unambiguous."""
        import random

        from rdw_spark.plans.corpus import build_corpus

        rnd = random.Random(11)
        words = ["alpha", "bridge", "cobalt", "derive", "ember", "fjord",
                 "glyph", "harbor", "iodine", "jungle", "kernel", "lumen",
                 "matrix", "nectar", "onyx", "prism", "quartz", "ripple",
                 "sonnet", "tundra", "umber", "vertex", "willow", "xenon"]
        prose = " ".join(rnd.choice(words) for _ in range(300))
        noise = " ".join(
            "".join(rnd.choice("abcdefghijklmnopqrstuvwxyz")
                    for _ in range(rnd.randrange(3, 9)))
            for _ in range(300))
        docs = spark.createDataFrame(
            [Row(doc_id=1, text="spam ham " * 400, lang="en", source="s",
                 n_chars=3600),
             Row(doc_id=2, text=prose, lang="en", source="s",
                 n_chars=len(prose)),
             Row(doc_id=3, text=noise, lang="en", source="s",
                 n_chars=len(noise))],
            "doc_id long, text string, lang string, source string, n_chars long")
        out = build_corpus(
            docs, quality_thresholds={"min_chars": 1},
            compression_bounds=(0.1, 0.45),
            minhash_threshold=0.99, eval_fraction=0.0)
        dropped = {(r["doc_id"], r["stage"])
                   for r in out["drop_report"].collect()}
        assert (1, "compression") in dropped
        assert (3, "compression") in dropped
        kept = {r["doc_id"] for r in out["train"].collect()}
        assert kept == {2}

    def test_compression_stage_checkpoints_and_resumes(self, spark, tmp_path):
        from rdw_spark.plans.corpus import build_corpus

        docs = spark.createDataFrame(
            [Row(doc_id=i, text=f"doc {i} body with words {i * 3} and "
                                f"unique tail {i * i}", lang="en",
                 source="s", n_chars=60) for i in range(12)]
            + [Row(doc_id=99, text="x " * 500, lang="en", source="s",
                   n_chars=1000)],
            "doc_id long, text string, lang string, source string, n_chars long")
        kw = dict(quality_thresholds={"min_chars": 1},
                  compression_bounds=(0.15, 0.95),
                  minhash_threshold=0.99, eval_fraction=0.0)
        plain = build_corpus(docs, **kw)
        ck = build_corpus(docs, checkpoint_root=str(tmp_path / "ck"), **kw)
        resumed = build_corpus(docs, checkpoint_root=str(tmp_path / "ck"), **kw)
        want = sorted(r["doc_id"] for r in plain["train"].collect())
        assert sorted(r["doc_id"] for r in ck["train"].collect()) == want
        assert sorted(r["doc_id"] for r in resumed["train"].collect()) == want
        assert 99 not in want  # the templated doc dropped at compression


class TestStreamingSkipgrams:
    def test_streaming_equals_batch(self, spark, tmp_path):
        """Additive merge: drained micro-batches + read-side min_count
        floor == one-shot skipgram_counts over the full corpus — pairs
        below the floor in one batch still count once peers arrive."""
        from rdw_spark.operators.text import skipgram_counts
        from rdw_spark.streaming.aggstate import (
            read_skipgram_state, stream_skipgram_state,
        )

        rows = [Row(doc_id=i, text=f"alpha beta tail{i % 5} alpha beta")
                for i in range(30)] + [Row(doc_id=99, text="omega zeta")]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        landing = str(tmp_path / "landing")
        df.repartition(6).write.parquet(landing)
        out, ckpt = str(tmp_path / "state"), str(tmp_path / "ckpt")

        q = stream_skipgram_state(spark, landing, df.schema, out, ckpt,
                                  window=2, max_files_per_trigger=2)
        assert q.awaitTermination(120)

        got = sorted(map(tuple, read_skipgram_state(
            spark, out, min_count=3).collect()))
        want = sorted(map(tuple, skipgram_counts(
            df, window=2, min_count=3).collect()))
        assert got == want
        # the floor really filtered something (tail{i} pairs are rare)
        all_rows = read_skipgram_state(spark, out, min_count=1).count()
        assert all_rows > len(got)


class TestChangepointDecimalExactness:
    def test_twelfth_decimal_subtraction_stays_exact(self, spark):
        """Values whose squares carry nonzero 12th-decimal digits: the
        total−prefix subtraction must stay exact (prefix sums carried at
        DECIMAL(37,12) — a (38,12)−(38,12) subtraction rounds to scale
        11 in Spark and diverges from this pure-Python exact model at
        every split of this fixture)."""
        from decimal import Decimal

        from rdw_spark.operators.timeseries import changepoint_single

        vals = [Decimal("1.000001"), Decimal("2.000003"),
                Decimal("1.000007"), Decimal("3.000011"),
                Decimal("9.000013"), Decimal("9.000017"),
                Decimal("9.000019"), Decimal("9.000023")]
        n = len(vals)
        s1 = [sum(vals[:i + 1]) for i in range(n)]
        s2 = [sum(v * v for v in vals[:i + 1]) for i in range(n)]
        t1, t2 = s1[-1], s2[-1]

        def cost(k):
            a = float(s2[k - 1]) - (float(s1[k - 1]) * float(s1[k - 1])) / float(k)
            r1, r2 = t1 - s1[k - 1], t2 - s2[k - 1]
            return a + (float(r2) - (float(r1) * float(r1)) / float(n - k))

        want_cost, want_k = min((cost(k), k) for k in range(2, n - 1))
        want_gain = (float(t2) - (float(t1) * float(t1)) / float(n)
                     - want_cost)

        df = spark.createDataFrame(
            [Row(k="a", t=i, v=float(v)) for i, v in enumerate(vals)],
            "k string, t int, v double")
        r = changepoint_single(df, ["k"], "t", "v", min_seg=2).collect()[0]
        assert r["cp_index"] == want_k
        assert r["cost"] == want_cost
        assert r["gain"] == want_gain


class TestStreamingConfusion:
    def test_streaming_equals_batch_report(self, spark, tmp_path):
        """Additive confusion deltas + the shared metric tail: drained
        micro-batches == one-shot classification_report over the full
        labeled stream."""
        from rdw_spark.operators.profiling import classification_report
        from rdw_spark.streaming.aggstate import (
            read_confusion_report, stream_confusion_state,
        )

        langs = ["en", "de", "fr"]
        rows = [Row(truth=langs[i % 3], pred=langs[(i + (i % 7 == 0)) % 3])
                for i in range(60)]
        df = spark.createDataFrame(rows, "truth string, pred string")
        landing = str(tmp_path / "landing")
        df.repartition(6).write.parquet(landing)
        out, ckpt = str(tmp_path / "state"), str(tmp_path / "ckpt")

        q = stream_confusion_state(spark, landing, df.schema, out, ckpt,
                                   "truth", "pred", max_files_per_trigger=2)
        assert q.awaitTermination(120)

        got = sorted(map(tuple, read_confusion_report(spark, out).collect()))
        want = sorted(map(tuple, classification_report(
            df, "truth", "pred").collect()))
        assert got == want
        assert len(got) == 3


class TestRetrievalEvalDupDocs:
    def test_duplicate_result_rows_cannot_inflate_metrics(self, spark):
        """A (query, doc) duplicated in results counts ONCE at its best
        rank: nDCG stays within [0,1], hits/recall don't double-count."""
        from rdw_spark.operators.similarity import retrieval_eval

        results = spark.createDataFrame(
            [("q", "d1", 1), ("q", "d1", 2), ("q", "d2", 3)],
            "query_id string, doc_id string, rank long")
        qrels = spark.createDataFrame(
            [("q", "d1")], "query_id string, doc_id string")
        r = retrieval_eval(results, qrels, k=10).collect()[0]
        assert r["n_returned"] == 2            # d1 deduped
        assert r["hits_at_10"] == 1
        assert r["recall_at_10"] == 1.0
        assert r["ndcg_at_10"] == 1.0          # not 1.63
        assert r["rr"] == 1.0
