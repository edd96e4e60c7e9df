"""Physical-plan assertions: the plans we ship are the plans we designed.

Locks in the scale properties SURVEY.md §4 promises: dims broadcast (no
sort-merge shuffle for fact→dim), range/equality predicates reach the
parquet scan (PushedFilters), and projection pruning reaches ReadSchema.
A regression that silently turns a broadcast join into a shuffle or loses
pushdown fails here long before it shows up as a 100 TB incident."""

from __future__ import annotations

import contextlib
import io

import pytest

from rdw_spark.plans.catalog import get_catalog

SF = "/root/testdata/sf0.001"


def explain_str(df, mode: str = "formatted") -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode)
    return buf.getvalue()


@pytest.fixture(scope="module")
def catalog():
    return get_catalog()


def _plan(spark, catalog, name: str) -> str:
    return explain_str(catalog[name].fn(spark, SF))


class TestJoinStrategies:
    def test_fact_dim_joins_broadcast(self, spark, catalog):
        for q in ("zz_j1_star_revenue", "j3_snowflake_hierarchy", "j11_audit_union_dims"):
            plan = _plan(spark, catalog, q)
            assert "BroadcastHashJoin" in plan, f"{q}: dim join must broadcast"
            assert "SortMergeJoin" not in plan, f"{q}: unexpected shuffle join"

    def test_semi_and_anti_joins_broadcast(self, spark, catalog):
        plan = _plan(spark, catalog, "zz_j4_semi_join")
        assert "LeftSemi" in plan and "Broadcast" in plan
        plan = _plan(spark, catalog, "zz_j5_anti_join")
        assert "LeftAnti" in plan and "Broadcast" in plan

    def test_embargo_row_filter_broadcasts_allowed_set(self, spark, catalog):
        plan = _plan(spark, catalog, "p9_embargo_row_filter")
        assert "BroadcastHashJoin" in plan
        assert "SortMergeJoin" not in plan


class TestPushdownAndPruning:
    def test_range_predicate_pushed_to_both_scans(self, spark, catalog):
        plan = _plan(spark, catalog, "j9_migrate_batch_range")
        assert plan.count("PushedFilters: [IsNotNull") >= 2
        assert "GreaterThan(o_orderkey,1000)" in plan
        assert "GreaterThan(l_orderkey,1000)" in plan

    def test_filter_pushdown_events(self, spark, catalog):
        plan = _plan(spark, catalog, "zz_p_scoped_filter_agg")
        assert "EqualTo(event_type,purchase)" in plan

    def test_column_pruning_pricing_summary(self, spark, catalog):
        plan = _plan(spark, catalog, "zz_a1_pricing_summary")
        scan = plan[plan.index("ReadSchema"):].splitlines()[0]
        # only the 7 needed lineitem columns — no keys, no linestatus noise
        for col in ("l_quantity", "l_extendedprice", "l_discount", "l_tax",
                    "l_returnflag", "l_linestatus", "l_shipdate"):
            assert col in scan
        for col in ("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber"):
            assert col not in scan, f"a1 scan reads unneeded column {col}"

    def test_map_side_partial_aggregation(self, spark, catalog):
        # partial_sum before the exchange = map-side combine: the shuffle
        # carries one row per group per partition, not per input row
        plan = explain_str(
            catalog["zz_a1_pricing_summary"].fn(spark, SF), "simple"
        )
        assert "partial_sum" in plan
        assert plan.index("partial_sum") > plan.index("Exchange")  # below it


class TestNormalizeTsPushdown:
    def test_ts_filter_pushes_through_normalization(self, spark):
        """normalize_ts's NTZ→LTZ cast must not block predicate pushdown:
        the time-range filter has to reach the parquet scan (a scan reading
        all of events for a 24h window is wrong at any scale)."""
        from pyspark.sql import functions as F

        from rdw_spark.io import load_table

        ev = load_table(spark, "/root/testdata/sf0.001", "events")
        q = ev.filter(F.col("ts") >= "2024-06-01").select("event_id", "ts")
        plan = q._jdf.queryExecution().toString()
        assert "PushedFilters: [IsNotNull(ts), GreaterThanOrEqual(ts," in plan


class TestTrainingOpPlans:
    """Scale gates for the training-data operators added in r5."""

    def test_sampling_is_map_only(self, spark, catalog):
        # Bernoulli/stratified sampling must be a pure scan+filter: no
        # Exchange anywhere in the plan at any scale
        for name in ("zz_sample_stratified", "zz_sample_train_eval_split"):
            plan = _plan(spark, catalog, name)
            assert "Exchange" not in plan, f"{name} shuffles"

    def test_winnowing_is_map_only(self, spark, catalog):
        plan = _plan(spark, catalog, "zz_text_winnowing")
        assert "Exchange" not in plan  # fingerprints = scan + generate only

    def test_k_per_stratum_single_shuffle_with_map_side_topk(self, spark, catalog):
        # exact-k = ONE hash exchange on the stratum key, and Spark's
        # WindowGroupLimit prunes to the top k per stratum BEFORE the
        # exchange (Partial below, Final above) — only k rows per stratum
        # per mapper ever shuffle, the true reservoir-sampling behavior
        import re

        plan = _plan(spark, catalog, "zz_sample_k_per_stratum")
        # formatted explain numbers nodes bottom-up: "(N) <Node>" headers
        # with the node's Arguments below — smaller id = earlier in
        # execution. Split into per-node detail blocks and classify.
        blocks = re.split(r"\n\((\d+)\) ", "\n" + plan.split("== Physical Plan ==")[-1])
        nodes = {}  # id -> block text
        for i in range(1, len(blocks) - 1, 2):
            nodes[int(blocks[i])] = blocks[i + 1]
        exchanges = [i for i, b in nodes.items() if b.startswith("Exchange")]
        partials = [i for i, b in nodes.items()
                    if b.startswith("WindowGroupLimit") and "Partial" in b]
        finals = [i for i, b in nodes.items()
                  if b.startswith("WindowGroupLimit") and "Final" in b]
        assert len(exchanges) == 1  # exactly one shuffle
        assert partials and finals
        assert partials[0] < exchanges[0] < finals[0]

    def test_pii_scan_is_map_only(self, spark, catalog):
        # regexp_count/regexp_replace over planted text: scan + project,
        # zero Exchange — a 100 TB PII pass is embarrassingly parallel
        plan = _plan(spark, catalog, "zz_text_pii")
        assert "Exchange" not in plan

    def test_shuffle_order_has_no_single_task_window(self, spark, catalog):
        # the global rank must come from the two-phase scan: every Window
        # in the plan must be PARTITIONED (by the physical partition id) —
        # a windowspecdefinition whose first argument is the sort spec
        # (no partition columns) would drag the table through one task.
        # The range repartition itself is invisible here: it materialized
        # into the localCheckpoint the scan reads.
        import re

        plan = _plan(spark, catalog, "zz_shuffle_order")
        specs = re.findall(r"windowspecdefinition\(([^)]*)", plan)
        assert specs, "expected a Window node"
        for s in specs:
            first = s.split(",")[0].strip()
            assert "#" in first and " ASC" not in first and " DESC" not in first, (
                f"unpartitioned Window in shuffle_order plan: {s!r}"
            )

    def test_token_rarity_partial_aggregates(self, spark, catalog):
        # both groupBys must partial-aggregate map-side (wordcount shape):
        # HashAggregate appears with partial_ forms below each exchange
        plan = _plan(spark, catalog, "zz_text_token_rarity")
        assert plan.count("Exchange") >= 2
        assert "partial_count" in plan or "partial_sum" in plan

    def test_sample_filter_stays_in_scan_stage(self, spark, catalog):
        # the md5-threshold predicate is not parquet-pushable (expression
        # over a column), but it must evaluate inside the scan's codegen
        # stage: WholeStageCodegen(1) contains both Scan and Filter
        plan = _plan(spark, catalog, "zz_sample_train_eval_split")
        assert "Filter" in plan and "Scan parquet" in plan


class TestSpanDedupAndLmPlans:
    def test_span_dedup_broadcasts_duplicated_window_stats(self, spark, catalog):
        # the duplicated-window stats (a small fraction of the corpus)
        # must come back to the occurrence stream as a broadcast, and the
        # flagged-starts rebuild join against the docs must broadcast too
        # — the full window set is never shuffle-joined
        plan = _plan(spark, catalog, "zz_dedup_spans_exact")
        assert "BroadcastHashJoin" in plan
        assert "SortMergeJoin" not in plan

    def test_bigram_lm_partial_aggregates(self, spark, catalog):
        # model fit + scoring: every groupBy must show map-side partial
        # aggregation (HashAggregate pairs), never a raw full shuffle
        plan = _plan(spark, catalog, "zz_text_lm_score")
        assert plan.count("HashAggregate") >= 4

    def test_overlap_join_equi_not_cartesian(self, spark, catalog):
        # the interval-overlap join must plan as the grid-cell EQUI-join
        # (SortMergeJoin/ShuffledHashJoin on (u, _cell)), never a
        # cartesian or a nested-loop range join
        plan = _plan(spark, catalog, "j_overlap_intervals")
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoop" not in plan

    def test_quantized_cosine_no_python_and_blocked_join(self, spark, catalog):
        # int8 quantization stays JVM-side (no BatchEvalPython / arrow
        # eval in the plan) and the pair join is the blocked equi-join,
        # never a cartesian product
        plan = _plan(spark, catalog, "zz_sim_quantized_cosine")
        assert "EvalPython" not in plan
        assert "CartesianProduct" not in plan and "BroadcastNestedLoop" not in plan

    def test_export_shards_no_single_task_global_sort(self, spark, catalog):
        # shard assignment rides the distributed two-phase prefix scan:
        # every Sort/Window in the plan is partition-local (the global
        # single-partition window would be "Window [...]" with no
        # partitionBy — locked out the same way as shuffle_order)
        plan = _plan(spark, catalog, "zz_export_shards")
        import re

        for m in re.finditer(r"Arguments: \[[^\]]*row_number[^\]]*\]", plan):
            assert "_pid" in m.group(0) or "partition" in m.group(0).lower()

    def test_strip_boilerplate_text_never_shuffles(self, spark, catalog):
        # the digest pipeline shuffles 32-char hashes and (id, digest)
        # pairs; with the offender map broadcastable (the common case,
        # asserted here) the document text appears only in scan/project
        # nodes, never in an Exchange's output — and per-LINE text never
        # shuffles at any scale (worst case is one doc-grain id join)
        plan = _plan(spark, catalog, "zz_text_strip_boilerplate")
        import re

        blocks = re.split(r"\n\((\d+)\) ", "\n" + plan.split("== Physical Plan ==")[-1])
        nodes = {}
        for i in range(1, len(blocks) - 1, 2):
            nodes[int(blocks[i])] = blocks[i + 1]
        exchange_blocks = [b for b in nodes.values() if b.startswith("Exchange")]
        assert exchange_blocks  # the frequency count does shuffle digests
        for b in exchange_blocks:
            assert "text#" not in b, "document text entered a shuffle"

    def test_doc_features_single_scan_no_exchange(self, spark, catalog):
        # the fused feature pass must be one scan + projection: no
        # Exchange, no join, no Python eval — the whole point is that
        # every map-only signal shares the single 100 TB read
        plan = _plan(spark, catalog, "zz_doc_features")
        assert "Exchange" not in plan
        assert "Join" not in plan
        assert "EvalPython" not in plan


class TestGlobalPlanHygiene:
    def test_no_cartesian_product_anywhere_in_catalog(self, spark, catalog):
        """EVERY catalog entry must plan without a CartesianProduct — the
        one operator that cannot survive a 100x scale-up. (1-row stat
        broadcasts legitimately plan as BroadcastNestedLoopJoin; a
        CartesianProduct means two real relations crossed.)"""
        offenders = []
        for name in sorted(catalog):
            plan = _plan(spark, catalog, name)
            if "CartesianProduct" in plan:
                offenders.append(name)
        assert not offenders, f"cartesian products in: {offenders}"


class TestRound7Plans:
    def test_bpe_pairs_partial_agg_and_takeordered(self, spark, catalog):
        # wordcount shape: the pair groupBy partial-aggregates map-side and
        # the top-k is TakeOrdered, never a global sort of the pair counts
        plan = _plan(spark, catalog, "zz_text_bpe_pairs")
        assert "partial_count" in plan or "HashAggregate" in plan
        assert "TakeOrderedAndProject" in plan
        assert "Sort [" not in plan.replace("TakeOrderedAndProject", "")

    def test_length_buckets_single_shuffle(self, spark, catalog):
        # map-only log2 bucket assignment + ONE partial-agg groupBy: the
        # plan carries exactly one shuffle node (formatted explain lists
        # each node in the tree AND the details — count tree nodes)
        import re

        plan = _plan(spark, catalog, "zz_length_buckets")
        assert "Window" not in plan
        assert len(re.findall(r"\(\d+\) Exchange", plan)) == 1

    def test_olap_cube_single_expand_single_shuffle(self, spark, catalog):
        # all 2^k granularities from one Expand + one shuffle — k separate
        # GROUP BYs would scan the fact k times
        import re

        plan = _plan(spark, catalog, "olap_cube")
        assert len(re.findall(r"\(\d+\) Expand", plan)) == 1
        assert len(re.findall(r"\(\d+\) Exchange", plan)) == 1

    def test_containment_no_sort_merge_join(self, spark, catalog):
        # the inverted-index self-join shares the shingle-hash partitioning
        # from the window pass — no extra SMJ shuffle, no cartesian
        plan = _plan(spark, catalog, "zz_dedup_containment")
        assert "CartesianProduct" not in plan

    def test_sketch_rollup_partial_aggregates(self, spark, catalog):
        # sketch build and union both partial-aggregate map-side
        plan = _plan(spark, catalog, "zz_distinct_sketch_rollup")
        assert plan.count("HashAggregate") >= 2 or plan.count("ObjectHashAggregate") >= 2


class TestRound8Plans:
    def test_mixture_sample_apply_is_map_only(self, spark):
        # the DRAW is a pure hash-threshold filter: zero shuffles — only
        # the O(sources) sizing pass (a separate action) aggregates
        import re

        from rdw_spark.io import load_table
        from rdw_spark.operators.sampling import mixture_sample

        docs = load_table(spark, SF, "documents")
        _, sample = mixture_sample(
            docs, "source", {"src1": 0.5, "src2": 0.5}, 5_000.0,
            "n_chars", "doc_id")
        plan = explain_str(sample)
        assert len(re.findall(r"\(\d+\) Exchange", plan)) == 0
        assert "Filter" in plan

    def test_bpe_train_round_counts_partial_agg(self, spark):
        # one induction round's counting pass: partial-agg shuffle on the
        # pair, never a global sort of the counts (argmax is a limit-1
        # TakeOrdered on the entry path; here we gate the count frame)
        import re

        from rdw_spark.io import load_table
        from rdw_spark.operators.text import bpe_pair_frequencies, bpe_word_symbols

        docs = load_table(spark, SF, "documents")
        counts = bpe_pair_frequencies(bpe_word_symbols(docs))
        plan = explain_str(counts)
        assert "HashAggregate" in plan
        # word-symbol build (1 shuffle) + pair count (1 shuffle)
        assert len(re.findall(r"\(\d+\) Exchange", plan)) == 2

    def test_pagerank_round_broadcasts_rank_frame(self, spark, catalog):
        # edges are the big cached side; the O(nodes) rank frame joins in
        # via broadcast at this scale (AQE may pick SMJ when ranks
        # outgrow the threshold — the gate is NO cartesian and no
        # fact-side re-sort of the cached edges)
        plan = _plan(spark, catalog, "graph_pagerank")
        assert "CartesianProduct" not in plan
        assert "BroadcastHashJoin" in plan

    def test_incremental_agg_partial_states(self, spark, catalog):
        # two deltas + a merge: every aggregate is hash-based (mergeable
        # partial state), no sort-based aggregation, no window
        plan = _plan(spark, catalog, "zz_incremental_agg")
        assert "HashAggregate" in plan
        assert "Window" not in plan
        assert "SortAggregate" not in plan


class TestRound8LatePlans:
    def test_ewma_single_operator_shuffle(self, spark, catalog):
        # daily-grain groupBy + key-grain fold groupBy: exactly two
        # Exchanges, no window, no join — the fold happens where the key
        # lives
        import re

        plan = _plan(spark, catalog, "zz_ts_ewma")
        assert "Window" not in plan and "Join" not in plan
        assert len(re.findall(r"\(\d+\) Exchange", plan)) == 2

    def test_holt_single_operator_shuffle(self, spark, catalog):
        import re

        plan = _plan(spark, catalog, "zz_holt_smoothing")
        assert "Window" not in plan and "Join" not in plan
        assert len(re.findall(r"\(\d+\) Exchange", plan)) == 2

    def test_anomaly_window_partitioned_and_bounded(self, spark, catalog):
        # one key-partitioned bounded window over the daily grain — no
        # unpartitioned window, no join back
        import re

        plan = _plan(spark, catalog, "zz_ts_anomaly")
        assert "Join" not in plan
        for s in re.findall(r"windowspecdefinition\(([^)]*)", plan):
            first = s.split(",")[0].strip()
            assert " ASC" not in first and " DESC" not in first, (
                f"unpartitioned window: {s!r}")

    def test_transitions_windows_partitioned(self, spark, catalog):
        # the lead() runs per user and the row-normalization per
        # from_state — every window partitioned; counts frame is tiny
        import re

        plan = _plan(spark, catalog, "zz_event_transitions")
        specs = re.findall(r"windowspecdefinition\(([^)]*)", plan)
        assert specs
        for s in specs:
            first = s.split(",")[0].strip()
            assert " ASC" not in first and " DESC" not in first, (
                f"unpartitioned window: {s!r}")

    def test_triangles_no_cartesian_no_unpartitioned_window(
            self, spark, catalog):
        # wedge enumeration and close are equi-joins on vertex keys; the
        # degree-rank attach is an equi-join too — nothing degenerates
        # to a cartesian and nothing needs a window at all
        plan = _plan(spark, catalog, "zz_graph_triangles")
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan
        assert "windowspecdefinition" not in plan

    def test_funnel_stage_filters_pushed(self, spark, catalog):
        # each stage's event_type filter reaches the parquet scan
        plan = _plan(spark, catalog, "zz_funnel_stages")
        assert "CartesianProduct" not in plan
        assert "PushedFilters:" in plan
        assert plan.count("event_type") >= 3


class TestRound9Plans:
    def test_bpe_encode_python_runs_over_distinct_words_only(self, spark):
        # the r8-weak plan, fixed: the Python merge-replay stage consumes
        # the GLOBAL distinct-word frame (one row per vocabulary entry),
        # never the per-instance word stream — the MapInPandas node's
        # input is exactly [word] and it sits above the distinct's final
        # HashAggregate; tokens join back and posexplode JVM-side
        import re

        from rdw_spark.io import load_table
        from rdw_spark.operators.text import bpe_encode

        docs = load_table(spark, SF, "documents")
        enc = bpe_encode(docs, [("e", "</w>"), ("t", "h")])
        plan = explain_str(enc)
        assert len(re.findall(r"\(\d+\) MapInPandas", plan)) == 1
        m = re.search(r"\(\d+\) MapInPandas\nInput \[1\]: \[word#", plan)
        assert m, "MapInPandas must consume only the distinct word column"
        assert re.search(
            r"\(\d+\) HashAggregate\nInput \[1\]: \[word#", plan
        ), "distinct-word aggregate must feed the Python stage"


class TestRound10Plans:
    def test_bloom_pruned_join_fact_never_shuffles(self, spark, catalog):
        # the bloom shape's whole point: the fact is filtered map-side by
        # the broadcast bitmap and the residual join builds on the dim —
        # ZERO shuffle Exchanges anywhere, one BroadcastHashJoin, and the
        # Python stage is the Arrow-vectorized probe only
        import re

        plan = _plan(spark, catalog, "j_bloom_pruned_join")
        assert len(re.findall(r"\(\d+\) Exchange", plan)) == 0
        assert len(re.findall(r"\(\d+\) BroadcastHashJoin", plan)) == 1
        assert len(re.findall(r"\(\d+\) SortMergeJoin", plan)) == 0

    def test_sequence_match_single_shuffle_and_symbol_pushdown(
            self, spark, catalog):
        # one ObjectHashAggregate pair around ONE Exchange on the entity
        # key (partial collect map-side), and the symbol-map filter
        # reaches the scan so unmapped events never shuffle
        import re

        plan = _plan(spark, catalog, "zz_t_sequence_match")
        assert len(re.findall(r"\(\d+\) Exchange", plan)) == 1
        assert "PushedFilters: [In(event_type" in plan

    def test_bpe_heap_corpus_pass_is_one_wordcount(self, spark):
        # the collect-then-heap trainer's only Spark job is the word-
        # frequency pass: one Exchange (the wordcount), no Python nodes
        import re

        from rdw_spark.io import load_table
        from rdw_spark.operators.text import bpe_word_symbols

        docs = load_table(spark, SF, "documents")
        plan = explain_str(bpe_word_symbols(docs))
        assert len(re.findall(r"\(\d+\) Exchange", plan)) == 1
        assert not re.search(r"MapInPandas|BatchEvalPython|ArrowEvalPython",
                             plan)
