"""Round-10 operators: hand-checkable semantics and edge cases beyond
the DuckDB oracle entries (which pin engine parity on the synthetic
corpus — these pin the MATH on shapes the corpus never produces)."""

from __future__ import annotations

import math

from pyspark.sql import Row
from pyspark.sql import functions as F


class TestQuantileNormalize:
    def test_single_group_is_identity(self, spark):
        # one group: within-group rank == global rank, so every row maps
        # to its own value
        from rdw_spark.operators.quantiles import quantile_normalize

        rows = [Row(id=i, g="a", v=(i * 37) % 11) for i in range(20)]
        df = spark.createDataFrame(rows, "id long, g string, v long")
        out = quantile_normalize(df, "g", "v", "id").collect()
        assert len(out) == 20
        for r in out:
            assert r["normalized"] == r["v"], r

    def test_groups_map_onto_pooled_distribution(self, spark):
        # two groups with disjoint ranges: after normalization each
        # group's values span the POOLED range, rank order preserved
        from rdw_spark.operators.quantiles import quantile_normalize

        rows = [Row(id=i, g="lo", v=i) for i in range(10)] + [
            Row(id=100 + i, g="hi", v=1000 + i) for i in range(10)]
        df = spark.createDataFrame(rows, "id long, g string, v long")
        out = {r["id"]: r for r in
               quantile_normalize(df, "g", "v", "id").collect()}
        # both group minima map to the pooled minimum (rank 1)
        assert out[0]["normalized"] == 0
        assert out[100]["normalized"] == 0
        # both maxima map to the pooled maximum
        assert out[9]["normalized"] == 1009
        assert out[109]["normalized"] == 1009
        # rank order preserved within each group
        lo = [out[i]["normalized"] for i in range(10)]
        assert lo == sorted(lo)

    def test_singleton_group_maps_to_pooled_median(self, spark):
        from rdw_spark.operators.quantiles import quantile_normalize

        rows = [Row(id=i, g="big", v=i) for i in range(9)] + [
            Row(id=99, g="solo", v=12345)]
        df = spark.createDataFrame(rows, "id long, g string, v long")
        out = {r["id"]: r["normalized"] for r in
               quantile_normalize(df, "g", "v", "id").collect()}
        # N=10 -> target (10-1) DIV 2 + 1 = 5 -> 5th smallest = 4
        assert out[99] == 4


class TestMannWhitney:
    def test_hand_computed_with_ties(self, spark):
        from rdw_spark.operators.profiling import mann_whitney_u

        # a: [1, 2, 2]; b: [2, 3]  (midranks: 1=1, 2s=(2+3+4)/3=3, 3=5)
        # R_a = 1 + 3 + 3 = 7 -> 2R=14; U_a = 7 - 3*4/2 = 1 -> 2U=2
        rows = ([Row(g="a", v=1), Row(g="a", v=2), Row(g="a", v=2),
                 Row(g="b", v=2), Row(g="b", v=3)])
        df = spark.createDataFrame(rows, "g string, v int")
        r = mann_whitney_u(df, "v", "g", "a", "b").collect()[0]
        assert r["n_a"] == 3 and r["n_b"] == 2
        assert r["u2_a"] == 2
        # tie term: three 2s -> 3^3-3 = 24; sigma^2 = (6/12)*(6 - 24/20)
        want_sigma = math.sqrt(0.5 * (6.0 - 24.0 / 20.0))
        assert abs(r["sigma"] - want_sigma) < 1e-12
        assert abs(r["z"] - (2.0 - 6.0) / (2.0 * want_sigma)) < 1e-12

    def test_degenerate_group_reports_null(self, spark):
        from rdw_spark.operators.profiling import mann_whitney_u

        df = spark.createDataFrame(
            [Row(g="a", v=1), Row(g="a", v=2)], "g string, v int")
        r = mann_whitney_u(df, "v", "g", "a", "b").collect()[0]
        assert r["n_b"] == 0 and r["sigma"] is None and r["z"] is None


class TestAssociationRules:
    def test_hand_checked_counts(self, spark):
        from rdw_spark.operators.freqitems import association_rules

        rows = [
            (1, "milk"), (1, "bread"), (1, "milk"),   # dup collapses
            (2, "milk"), (2, "bread"),
            (3, "milk"),
            (4, "beer"),
        ]
        df = spark.createDataFrame(rows, "basket int, item string")
        out = {(r["antecedent"], r["consequent"]): r
               for r in association_rules(df, ["basket"], "item").collect()}
        r = out[("bread", "milk")]
        assert r["support_pair"] == 2 and r["support_a"] == 2
        assert r["confidence"] == 1.0
        # lift = 2*4/(2*3)
        assert abs(r["lift"] - 8.0 / 6.0) < 1e-12
        assert ("milk", "beer") not in out  # never co-occur

    def test_min_support_filters(self, spark):
        from rdw_spark.operators.freqitems import association_rules

        df = spark.createDataFrame(
            [(1, "a"), (1, "b")], "basket int, item string")
        assert association_rules(df, ["basket"], "item",
                                 min_support=2).count() == 0


class TestMadOutliers:
    def test_known_outlier_flagged(self, spark):
        from rdw_spark.operators.profiling import mad_outliers

        vals = [10.0, 11.0, 12.0, 13.0, 14.0, 1000.0]
        df = spark.createDataFrame(
            [Row(g="x", v=v) for v in vals], "g string, v double")
        r = mad_outliers(df, "g", "v", k=3.0).collect()[0]
        # lower median of 6 values (rank 3) = 12; |dev| = [2,1,0,1,2,988]
        # lower median of devs (rank 3) = 1 -> MAD=1 -> outliers: |d|>3
        assert r["median"] == 12.0 and r["mad"] == 1.0
        assert r["n_outliers"] == 1

    def test_constant_group_no_outliers(self, spark):
        from rdw_spark.operators.profiling import mad_outliers

        df = spark.createDataFrame(
            [Row(g="c", v=5.0)] * 4, "g string, v double")
        r = mad_outliers(df, "g", "v").collect()[0]
        assert r["mad"] == 0.0 and r["n_outliers"] == 0


class TestForecastBacktest:
    def test_seasonal_series_snaive_wins(self, spark):
        from rdw_spark.operators.timeseries import forecast_backtest

        # perfect period-3 seasonality: snaive MAE 0, naive MAE > 0
        season = [10.0, 50.0, 30.0]
        rows = [Row(k="s", t=i, v=season[i % 3]) for i in range(12)]
        df = spark.createDataFrame(rows, "k string, t int, v double")
        r = forecast_backtest(df, ["k"], "t", "v", season=3).collect()[0]
        assert r["mae_snaive"] == 0.0 and r["mae_naive"] > 0
        assert r["snaive_vs_naive"] == 0.0
        assert r["n_eval_snaive"] == 9 and r["n_eval_naive"] == 11

    def test_constant_series_ratio_null(self, spark):
        from rdw_spark.operators.timeseries import forecast_backtest

        rows = [Row(k="c", t=i, v=7.0) for i in range(8)]
        df = spark.createDataFrame(rows, "k string, t int, v double")
        r = forecast_backtest(df, ["k"], "t", "v", season=2).collect()[0]
        assert r["mae_naive"] == 0.0 and r["snaive_vs_naive"] is None


class TestHardNegatives:
    def test_same_label_never_returned_and_nearest_wins(self, spark):
        from rdw_spark.operators.similarity import hard_negatives

        rows = [
            Row(vec_id=0, embedding=[1.0, 0.0], label="a"),   # anchor
            Row(vec_id=1, embedding=[0.99, 0.1], label="a"),  # same label
            Row(vec_id=2, embedding=[0.9, 0.2], label="b"),   # near, other
            Row(vec_id=3, embedding=[-1.0, 0.0], label="b"),  # far, other
        ]
        df = spark.createDataFrame(rows)
        anchors = df.filter("vec_id = 0").select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("query_vec"),
            F.col("label").alias("query_label"))
        out = hard_negatives(df, anchors, k=2).collect()
        assert [r["vec_id"] for r in sorted(out, key=lambda r: r["rank"])] \
            == [2, 3]
        assert all(r["label"] != "a" for r in out)


class TestPmiAndIndex:
    def test_pmi_surprising_pair_beats_frequent_pair(self, spark):
        from rdw_spark.operators.text import pmi_collocations

        # "los angeles" is the only EXCLUSIVE pair; the/cat/sat all
        # occur in two different contexts so their pairs dilute
        texts = (["los angeles"] * 5
                 + ["the cat sat"] * 5 + ["sat the cat"] * 5)
        df = spark.createDataFrame(
            [Row(doc_id=i, text=t) for i, t in enumerate(texts)],
            "doc_id long, text string")
        out = pmi_collocations(df, k=10, min_count=5).collect()
        top = out[0]
        assert (top["tok_a"], top["tok_b"]) == ("los", "angeles")
        best = {(r["tok_a"], r["tok_b"]): r["pmi_ratio"] for r in out}
        assert best[("los", "angeles")] > best[("the", "cat")]

    def test_inverted_index_positions(self, spark):
        from rdw_spark.operators.text import inverted_index

        df = spark.createDataFrame(
            [Row(doc_id=1, text="to be or not to be"),
             Row(doc_id=2, text="be quick")],
            "doc_id long, text string")
        out = {(r["token"], r["doc_id"]): r
               for r in inverted_index(df).collect()}
        r = out[("be", 1)]
        assert r["tf"] == 2 and list(r["positions"]) == [1, 5]
        assert r["doc_freq"] == 2
        assert out[("to", 1)]["positions"] == [0, 4]
        assert out[("quick", 2)]["doc_freq"] == 1


class TestStreamingPostings:
    def test_streaming_index_equals_batch(self, spark, tmp_path):
        from rdw_spark.operators.text import inverted_index
        from rdw_spark.streaming.aggstate import (
            read_postings_state, stream_postings_state,
        )

        rows = [Row(doc_id=i, text=f"alpha beta doc{i} alpha")
                for i in range(40)]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        landing = str(tmp_path / "landing")
        df.repartition(8).write.parquet(landing)
        out, ckpt = str(tmp_path / "state"), str(tmp_path / "ckpt")

        q = stream_postings_state(
            spark, landing, df.schema, out, ckpt, max_files_per_trigger=2)
        q.awaitTermination()

        got = sorted(
            (r["token"], r["doc_id"], r["tf"], tuple(r["positions"]),
             r["doc_freq"])
            for r in read_postings_state(spark, out).collect())
        want = sorted(
            (r["token"], r["doc_id"], r["tf"], tuple(r["positions"]),
             r["doc_freq"])
            for r in inverted_index(df).collect())
        assert got == want

    def test_reingest_last_writer_wins(self, spark, tmp_path):
        """A doc_id landing again in a LATER micro-batch supersedes its
        earlier postings entirely: changed tokens revise, dropped tokens
        retire, doc_freq reflects only latest versions — the live index
        equals a batch build over the final corpus."""
        from rdw_spark.operators.text import inverted_index
        from rdw_spark.streaming.aggstate import (
            read_postings_state, stream_postings_state,
        )

        schema = "doc_id long, text string"
        v1 = spark.createDataFrame(
            [Row(doc_id=1, text="alpha beta gamma"),
             Row(doc_id=2, text="alpha delta")], schema)
        landing = str(tmp_path / "landing")
        v1.coalesce(1).write.parquet(landing)
        out, ckpt = str(tmp_path / "state"), str(tmp_path / "ckpt")

        q = stream_postings_state(spark, landing, v1.schema, out, ckpt)
        assert q.awaitTermination(120)

        # re-ingest doc 1: beta kept, alpha/gamma dropped, omega added
        v2 = spark.createDataFrame(
            [Row(doc_id=1, text="beta omega")], schema)
        v2.coalesce(1).write.mode("append").parquet(landing)
        q = stream_postings_state(spark, landing, v1.schema, out, ckpt)
        assert q.awaitTermination(120)

        final = spark.createDataFrame(
            [Row(doc_id=1, text="beta omega"),
             Row(doc_id=2, text="alpha delta")], schema)
        got = sorted(
            (r["token"], r["doc_id"], r["tf"], tuple(r["positions"]),
             r["doc_freq"])
            for r in read_postings_state(spark, out).collect())
        want = sorted(
            (r["token"], r["doc_id"], r["tf"], tuple(r["positions"]),
             r["doc_freq"])
            for r in inverted_index(final).collect())
        assert got == want
        # the retired (gamma,1) and (alpha,1) postings are truly gone
        toks = {(t, d) for t, d, *_ in got}
        assert ("gamma", 1) not in toks and ("alpha", 1) not in toks

    def test_within_batch_duplicate_doc_collapses_to_one_version(
            self, spark, tmp_path):
        """A doc_id landing TWICE in the SAME micro-batch (one file →
        one batch) indexes exactly one version — the lexicographically
        greatest text, the documented total-order winner — instead of
        inflating tf/doc_freq with two same-batch_id versions."""
        from rdw_spark.operators.text import inverted_index
        from rdw_spark.streaming.aggstate import (
            read_postings_state, stream_postings_state,
        )

        schema = "doc_id long, text string"
        dup = spark.createDataFrame(
            [Row(doc_id=1, text="alpha beta"),
             Row(doc_id=1, text="zeta omega"),
             Row(doc_id=2, text="alpha")], schema)
        landing = str(tmp_path / "landing")
        dup.coalesce(1).write.parquet(landing)
        out, ckpt = str(tmp_path / "state"), str(tmp_path / "ckpt")

        q = stream_postings_state(spark, landing, dup.schema, out, ckpt)
        assert q.awaitTermination(120)

        winner = spark.createDataFrame(
            [Row(doc_id=1, text="zeta omega"),   # "zeta..." > "alpha..."
             Row(doc_id=2, text="alpha")], schema)
        got = sorted(
            (r["token"], r["doc_id"], r["tf"], tuple(r["positions"]),
             r["doc_freq"])
            for r in read_postings_state(spark, out).collect())
        want = sorted(
            (r["token"], r["doc_id"], r["tf"], tuple(r["positions"]),
             r["doc_freq"])
            for r in inverted_index(winner).collect())
        assert got == want
        assert ("beta", 1) not in {(t, d) for t, d, *_ in got}

    def test_compaction_preserves_last_writer_wins(self, spark, tmp_path):
        """compact_postings_state folds old deltas WITH the per-doc
        max-batch dedupe (the generic identity-merge compactor would
        erase batch_id and keep both versions of a re-ingested doc
        forever); reads equal the batch build before and after, across
        two compaction cycles."""
        from rdw_spark.operators.text import inverted_index
        from rdw_spark.streaming.aggstate import (
            compact_postings_state, read_postings_state,
            stream_postings_state,
        )

        schema = "doc_id long, text string"
        landing = str(tmp_path / "landing")
        out, ckpt = str(tmp_path / "state"), str(tmp_path / "ckpt")

        def drop(rows):
            df = spark.createDataFrame(rows, schema)
            df.coalesce(1).write.mode("append").parquet(landing)
            q = stream_postings_state(spark, landing, df.schema, out, ckpt)
            assert q.awaitTermination(120)

        def snapshot():
            return sorted(
                (r["token"], r["doc_id"], r["tf"], tuple(r["positions"]),
                 r["doc_freq"])
                for r in read_postings_state(spark, out).collect())

        drop([Row(doc_id=1, text="alpha beta"),
              Row(doc_id=2, text="gamma")])
        drop([Row(doc_id=1, text="beta omega")])       # re-ingest v2
        drop([Row(doc_id=3, text="alpha delta")])      # fresh doc
        # fold everything but the newest batch
        assert compact_postings_state(spark, out) > 0
        final = spark.createDataFrame(
            [Row(doc_id=1, text="beta omega"),
             Row(doc_id=2, text="gamma"),
             Row(doc_id=3, text="alpha delta")], schema)
        want = sorted(
            (r["token"], r["doc_id"], r["tf"], tuple(r["positions"]),
             r["doc_freq"])
            for r in inverted_index(final).collect())
        assert snapshot() == want

        # second cycle: another re-ingest + compaction over the base
        drop([Row(doc_id=2, text="epsilon")])
        assert compact_postings_state(spark, out) > 0
        final2 = spark.createDataFrame(
            [Row(doc_id=1, text="beta omega"),
             Row(doc_id=2, text="epsilon"),
             Row(doc_id=3, text="alpha delta")], schema)
        want2 = sorted(
            (r["token"], r["doc_id"], r["tf"], tuple(r["positions"]),
             r["doc_freq"])
            for r in inverted_index(final2).collect())
        assert snapshot() == want2


class TestMarkovAttribution:
    def test_two_path_chain_hand_solved(self, spark):
        """START->A->CONV (always) and START->B->NULL (always):
        p(conv)=n_A/(n_A+n_B); removing A kills every conversion
        (effect 1), removing B changes nothing (effect 0)."""
        from rdw_spark.operators.attribution import markov_attribution

        rows = []
        eid = 0
        for j in range(6):      # six A->purchase journeys
            rows += [(j, 1, eid, "ad"), (j, 2, eid + 1, "purchase")]
            eid += 2
        for j in range(10, 14):  # four B->nothing journeys
            rows += [(j, 1, eid, "email")]
            eid += 1
        df = spark.createDataFrame(
            rows, "jid long, t long, event_id long, event_type string")
        out = {r["channel"]: r for r in markov_attribution(
            df, ["jid"], ts_col="t").collect()}
        assert abs(out["ad"]["p_conversion"] - 0.6) < 1e-12
        assert abs(out["ad"]["removal_effect"] - 1.0) < 1e-12
        assert abs(out["email"]["removal_effect"] - 0.0) < 1e-12
        assert abs(out["ad"]["attribution_share"] - 1.0) < 1e-12
        assert abs(out["ad"]["attributed_conversions"] - 6.0) < 1e-12

    def test_two_step_path_solves_through_matrix(self, spark):
        """START->A->B->CONV: both channels are essential — removing
        either zeroes conversion, so effects tie and credit splits."""
        from rdw_spark.operators.attribution import markov_attribution

        rows = []
        for j in range(5):
            rows += [(j, 1, 3 * j, "ad"), (j, 2, 3 * j + 1, "search"),
                     (j, 3, 3 * j + 2, "purchase")]
        df = spark.createDataFrame(
            rows, "jid long, t long, event_id long, event_type string")
        out = {r["channel"]: r for r in markov_attribution(
            df, ["jid"], ts_col="t").collect()}
        assert abs(out["ad"]["p_conversion"] - 1.0) < 1e-12
        for c in ("ad", "search"):
            assert abs(out[c]["removal_effect"] - 1.0) < 1e-12
            assert abs(out[c]["attribution_share"] - 0.5) < 1e-12
            assert abs(out[c]["attributed_conversions"] - 2.5) < 1e-12

    def test_immediate_conversion_journey(self, spark):
        """A journey whose first event IS the conversion contributes
        START->CONV (no touchpoints) and no channel credit."""
        from rdw_spark.operators.attribution import markov_attribution

        rows = [(1, 1, 0, "purchase"),
                (2, 1, 1, "ad"), (2, 2, 2, "purchase")]
        df = spark.createDataFrame(
            rows, "jid long, t long, event_id long, event_type string")
        out = {r["channel"]: r for r in markov_attribution(
            df, ["jid"], ts_col="t").collect()}
        # p = P(START->CONV) + P(START->ad)*1 = 0.5 + 0.5 = 1
        assert abs(out["ad"]["p_conversion"] - 1.0) < 1e-12
        # removing ad still leaves the direct conversion: effect = 0.5
        assert abs(out["ad"]["removal_effect"] - 0.5) < 1e-12


class TestMatchScore:
    def test_hand_computed_odds_and_null_disagrees(self, spark):
        from rdw_spark.operators.joins import match_score

        pairs = spark.createDataFrame(
            [(1, 2, True, True), (3, 4, False, None)],
            "left_id long, right_id long, same_a boolean, same_b boolean")
        rules = [("a", F.col("same_a"), 0.8, 0.2),
                 ("b", F.col("same_b"), 0.9, 0.1)]
        out = {r["left_id"]: r for r in
               match_score(pairs, rules, prior_odds=2.0).collect()}
        # agree/agree: 2 * (0.8/0.2) * (0.9/0.1) = 2*4*9 = 72
        assert abs(out[1]["match_odds"] - 72.0) < 1e-12
        # disagree + NULL(=disagree): 2 * (0.2/0.8) * (0.1/0.9)
        want = 2.0 * (0.2 / 0.8) * (0.1 / 0.9)
        assert abs(out[3]["match_odds"] - want) < 1e-12
        assert abs(out[3]["lr_b"] - 0.1 / 0.9) < 1e-12

    def test_rejects_degenerate_params(self, spark):
        import pytest

        from rdw_spark.operators.joins import match_score

        pairs = spark.createDataFrame([(1, 2)], "l long, r long")
        with pytest.raises(ValueError, match="non-empty"):
            match_score(pairs, [])
        with pytest.raises(ValueError, match="m/u"):
            match_score(pairs, [("x", F.lit(True), 1.0, 0.5)])


class TestClassicalDecompose:
    def test_pure_seasonal_series_recovers_pattern(self, spark):
        from rdw_spark.operators.timeseries import classical_decompose

        pattern = [10.0, 40.0, 10.0]  # period 3, mean 20
        rows = [Row(k="s", t=i, v=pattern[i % 3]) for i in range(15)]
        df = spark.createDataFrame(rows, "k string, t int, v double")
        out = {r["t"]: r for r in classical_decompose(
            df, ["k"], "t", "v", period=3).collect()}
        # trend undefined at the edges (half-window = 1)
        assert out[0]["trend"] is None and out[14]["trend"] is None
        # interior: trend = cycle mean, seasonal = pattern - mean,
        # remainder = 0 (exact — the series IS trend+seasonal)
        for t in range(1, 14):
            assert abs(out[t]["trend"] - 20.0) < 1e-12
            assert abs(out[t]["seasonal"]
                       - (pattern[t % 3] - 20.0)) < 1e-9
            assert abs(out[t]["remainder"]) < 1e-9

    def test_even_period_rejected(self, spark):
        import pytest

        from rdw_spark.operators.timeseries import classical_decompose

        df = spark.createDataFrame(
            [Row(k="s", t=1, v=1.0)], "k string, t int, v double")
        with pytest.raises(ValueError, match="odd"):
            classical_decompose(df, ["k"], "t", "v", period=4)


class TestBenford:
    def test_hand_counts_and_chi2(self, spark):
        import math

        from rdw_spark.operators.profiling import BENFORD_P, benford_report

        # 10 values: first digits 1 x5, 2 x3, 9 x2 (strings avoid any
        # float-format ambiguity: decimals render exactly)
        vals = [1.5, 19.0, 100.0, 0.12, 0.0015,  # digit 1 (incl <1 values)
                2.0, 25.0, 0.29,                 # digit 2
                9.9, 0.9]                        # digit 9
        df = spark.createDataFrame(
            [(float(v),) for v in vals], "v double")
        out = {r["digit"]: r for r in benford_report(df, "v").collect()}
        assert len(out) == 9
        assert out[1]["n_obs"] == 5 and out[2]["n_obs"] == 3
        assert out[9]["n_obs"] == 2 and out[5]["n_obs"] == 0
        want_chi = sum(
            (c - 10 * BENFORD_P[d]) ** 2 / (10 * BENFORD_P[d])
            for d, c in ((1, 5), (2, 3), (9, 2), (3, 0), (4, 0), (5, 0),
                         (6, 0), (7, 0), (8, 0)))
        assert abs(out[1]["chi2"] - want_chi) < 1e-9
        assert math.isclose(sum(r["share"] for r in out.values()), 1.0)
