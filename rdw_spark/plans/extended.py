"""Extended operator catalog: migrate/admin join shapes (J3/J9/J10/J11),
permission & embargo row/column filters (P9/P10), conditional aggregates
(A2/A3), and the streaming tier's batch twins (windowed counts,
sessionization) — all DuckDB-oracle-checked on the driver testdata.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..io import load_table
from ..operators.joins import fuzzy_join, hot_keys, salted_join
from ..streaming.events import sessionize_batch, windowed_event_counts
from .registry import register
from .relational import _davg, _dsum


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


@register(
    "j3_snowflake_hierarchy",
    oracle="""
    SELECT r.r_name AS region_name, n.n_name AS nation_name,
           COUNT(*) AS n_items,
           CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(27,6))) AS DOUBLE) AS revenue
    FROM lineitem l
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      JOIN nation n   ON s.s_nationkey = n.n_nationkey
      JOIN region r   ON n.n_regionkey = r.r_regionkey
    GROUP BY r.r_name, n.n_name
    """,
    survey="J3 (school→district→district_group snowflake joins, "
           "docs/Troubleshooting.md:369, docs/Monitoring.md:271-275; chained "
           "broadcast dim joins — the fact is the only shuffled side)",
)
def j3_snowflake_hierarchy(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    sup = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nat = _t(spark, sf_dir, "nation").select("n_nationkey", "n_regionkey", "n_name")
    reg = _t(spark, sf_dir, "region").select("r_regionkey", "r_name")
    return (
        li.join(F.broadcast(sup), li.l_suppkey == sup.s_suppkey)
        .join(F.broadcast(nat), sup.s_nationkey == nat.n_nationkey)
        .join(F.broadcast(reg), nat.n_regionkey == reg.r_regionkey)
        .groupBy(F.col("r_name").alias("region_name"),
                 F.col("n_name").alias("nation_name"))
        .agg(
            F.count("*").alias("n_items"),
            _dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"),
        )
    )


@register(
    "j9_migrate_batch_range",
    oracle="""
    SELECT o.o_orderpriority,
           COUNT(DISTINCT o.o_orderkey) AS n_orders,
           COUNT(*) AS n_items
    FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE o.o_orderkey > 1000 AND o.o_orderkey <= 5000
    GROUP BY o.o_orderpriority
    """,
    survey="J9 (migrate batch join: rows within checkpointed "
           "(first_import_id, last_import_id] range joined to content, "
           "docs/Troubleshooting.md:228-239, Runbook.ImportMigrate.md:47-50; "
           "the range predicate is pushed to both parquet scans)",
)
def j9_migrate_batch_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    first, last = 1000, 5000  # checkpoint range (first, last]
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderkey") > first) & (F.col("o_orderkey") <= last)
    )
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_orderkey") > first) & (F.col("l_orderkey") <= last)
    )
    return (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .groupBy("o_orderpriority")
        .agg(F.countDistinct("o_orderkey").alias("n_orders"),
             F.count("*").alias("n_items"))
    )


@register(
    "j10_delete_cascade_antijoin",
    oracle="""
    SELECT l.l_linestatus, COUNT(*) AS n_kept,
           CAST(SUM(CAST(l.l_quantity AS DECIMAL(27,6))) AS DOUBLE) AS sum_qty
    FROM lineitem l
    WHERE NOT EXISTS (
      SELECT 1 FROM orders o
      WHERE o.o_orderkey = l.l_orderkey AND o.o_orderstatus = 'F'
        AND o.o_orderdate < DATE '1993-01-01'
    )
    GROUP BY l.l_linestatus
    """,
    survey="J10 (delete-cascade: child DELETE … JOIN deleted parent rewritten "
           "as keep = anti-join, docs/Runbook.BulkDeleteExams.md:166-187; "
           "write-side MERGE DELETE equivalent)",
)
def j10_delete_cascade_antijoin(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    deleted_parents = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderstatus") == "F")
        & (F.col("o_orderdate") < F.lit("1993-01-01").cast("date"))
    ).select(F.col("o_orderkey").alias("l_orderkey"))
    return (
        li.join(deleted_parents, "l_orderkey", "left_anti")
        .groupBy("l_linestatus")
        .agg(F.count("*").alias("n_kept"),
             _dsum(F.col("l_quantity")).alias("sum_qty"))
    )


@register(
    "j11_audit_union_dims",
    oracle="""
    SELECT state, c.c_mktsegment AS segment, COUNT(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(27,6))) AS DOUBLE) AS total
    FROM (
      SELECT o_orderkey, o_custkey, o_totalprice, 'current' AS state
      FROM orders WHERE o_orderdate >= DATE '1997-01-01'
      UNION ALL
      SELECT o_orderkey, o_custkey, o_totalprice, 'audit' AS state
      FROM orders WHERE o_orderdate < DATE '1997-01-01'
    ) u JOIN customer c ON u.o_custkey = c.c_custkey
    GROUP BY state, c.c_mktsegment
    """,
    survey="J11 U1 (multi-way audit union current ∪ audit_… then dim joins, "
           "docs/Runbook.Audit.md:232-309)",
)
def j11_audit_union_dims(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    cutoff = F.lit("1997-01-01").cast("date")
    current = o.filter(F.col("o_orderdate") >= cutoff).withColumn("state", F.lit("current"))
    audit = o.filter(F.col("o_orderdate") < cutoff).withColumn("state", F.lit("audit"))
    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    unioned = current.unionByName(audit).select(
        "o_orderkey", "o_custkey", "o_totalprice", "state"
    )
    return (
        unioned.join(F.broadcast(cust), unioned.o_custkey == cust.c_custkey)
        .groupBy("state", F.col("c_mktsegment").alias("segment"))
        .agg(F.count("*").alias("n_orders"),
             _dsum(F.col("o_totalprice")).alias("total"))
    )


@register(
    "p9_embargo_row_filter",
    oracle="""
    WITH embargo AS (
      SELECT r_regionkey,
             CASE WHEN r_name IN ('AMERICA','EUROPE','ASIA') THEN 2 ELSE 1 END AS aggregate_status
      FROM region
    ), allowed_nations AS (
      SELECT n_nationkey FROM nation n
        JOIN embargo e ON n.n_regionkey = e.r_regionkey
      WHERE e.aggregate_status = 2
    )
    SELECT c.c_nationkey AS nation_key, COUNT(*) AS n_orders
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    WHERE c.c_nationkey IN (SELECT n_nationkey FROM allowed_nations)
    GROUP BY c.c_nationkey
    """,
    survey="P9 (embargo/permission row filter: visibility gated by embargo "
           "status dim + allowed-org semi-join, docs/Runbook.md:305-331, "
           "docs/Runbook.ManualDataModifications.md:23-38 statuses "
           "0=Loading,1=Reviewing,2=Released; view-level filter by construction)",
)
def p9_embargo_row_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    region = _t(spark, sf_dir, "region").withColumn(
        "aggregate_status",
        F.when(F.col("r_name").isin("AMERICA", "EUROPE", "ASIA"), 2).otherwise(1),
    )
    released = region.filter(F.col("aggregate_status") == 2).select("r_regionkey")
    allowed = (
        _t(spark, sf_dir, "nation")
        .join(F.broadcast(released), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("n_nationkey")
    )
    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    scoped_cust = cust.join(F.broadcast(allowed),
                            cust.c_nationkey == F.col("n_nationkey"), "left_semi")
    o = _t(spark, sf_dir, "orders")
    return (
        o.join(F.broadcast(scoped_cust), o.o_custkey == scoped_cust.c_custkey)
        .groupBy(F.col("c_nationkey").alias("nation_key"))
        .agg(F.count("*").alias("n_orders"))
    )


@register(
    "zz_p10_column_visibility",
    oracle="""
    SELECT c_custkey, c_name,
           CAST(NULL AS INTEGER) AS c_nationkey,
           CAST(NULL AS DOUBLE) AS c_acctbal,
           c_mktsegment
    FROM customer WHERE c_custkey <= 500
    """,
    survey="P10 (column-level visibility: student fields Enabled/Admin/"
           "Disabled select the projection per role at view build, "
           "config/application.yml:25-42 — 'teacher' role sees identity "
           "columns, PII/financial columns projected out as NULL)",
)
def p10_column_visibility(spark: SparkSession, sf_dir: str) -> DataFrame:
    visibility = {  # reference semantics: Disabled columns never leave the view
        "c_custkey": "Enabled", "c_name": "Enabled", "c_nationkey": "Admin",
        "c_acctbal": "Admin", "c_mktsegment": "Enabled",
    }
    role_sees = {"Enabled"}  # current role: teacher (non-admin)
    cust = _t(spark, sf_dir, "customer").filter(F.col("c_custkey") <= 500)
    cols = [
        F.col(c).alias(c) if vis in role_sees
        else F.lit(None).cast(dict(cust.dtypes)[c]).alias(c)
        for c, vis in visibility.items()
    ]
    return cust.select(*cols)


@register(
    "zz_a2_conditional_minmax",
    oracle="""
    SELECT l_linestatus,
           CAST(SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS BIGINT) AS n_returned,
           MIN(l_extendedprice) AS min_price,
           MAX(l_extendedprice) AS max_price,
           CAST(SUM(CAST(DATEDIFF('day', l_shipdate, TIMESTAMP '1998-12-01 00:00:00') AS DECIMAL(27,6))) AS DOUBLE) / COUNT(*) AS avg_age_days
    FROM lineitem
    GROUP BY l_linestatus
    """,
    survey="A2 A3 (SUM(CASE WHEN…), MIN/MAX, AVG(TIMESTAMPDIFF(...)), "
           "docs/Runbook.Audit.md:189/452, docs/Monitoring.md:197-209)",
)
def a2_conditional_minmax(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    ref = F.lit("1998-12-01 00:00:00").cast("timestamp")
    return li.groupBy("l_linestatus").agg(
        F.sum(F.when(F.col("l_returnflag") == "R", 1).otherwise(0)).alias("n_returned"),
        F.min("l_extendedprice").alias("min_price"),
        F.max("l_extendedprice").alias("max_price"),
        _davg(F.datediff(F.to_date(ref), F.to_date("l_shipdate"))).alias("avg_age_days"),
    )


@register(
    "zz_t_windowed_event_counts",
    oracle="""
    SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start,
           time_bucket(INTERVAL '1 hour', ts) + INTERVAL '1 hour' AS window_end,
           event_type, COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(27,6))) AS DOUBLE) AS total_value
    FROM events
    GROUP BY 1, 2, 3
    """,
    survey="T7 ext (streaming tier batch twin: tumbling event-time window "
           "aggregation, rdw_spark.streaming.events.windowed_event_counts — "
           "identical plan runs under readStream with a watermark)",
)
def t_windowed_event_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    return windowed_event_counts(ev, window="1 hour")


@register(
    "t_sessionize",
    oracle="""
    WITH g AS (
      SELECT user_id, ts, value,
             CASE WHEN LAG(ts) OVER w IS NULL
                       OR ts - LAG(ts) OVER w > INTERVAL '30 minutes'
                  THEN 1 ELSE 0 END AS new_s
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts)
    ), s AS (
      SELECT *, SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts
                                 ROWS UNBOUNDED PRECEDING) AS sess
      FROM g
    )
    SELECT user_id, MIN(ts) AS session_start, MAX(ts) AS session_end,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(27,6))) AS DOUBLE) AS total_value
    FROM s GROUP BY user_id, sess
    """,
    survey="T ext (gap-based sessionization: batch twin of the "
           "applyInPandasWithState stateful operator, "
           "rdw_spark.streaming.events.sessionize; lag + cumulative-sum "
           "session ids, one shuffle on user_id)",
)
def t_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    return sessionize_batch(ev, gap_minutes=30)


@register(
    "zz_j_band_proximity_join",
    oracle="""
    -- floor each epoch BEFORE subtracting: Spark's unix_timestamp
    -- truncates per-timestamp, so the fractional seconds must drop on
    -- each side, not on the difference
    SELECT e.user_id, e.event_id AS error_id, p.event_id AS purchase_id,
           CAST(floor(epoch(p.ts)) - floor(epoch(e.ts)) AS BIGINT) AS gap_sec
    FROM events e JOIN events p ON e.user_id = p.user_id
    WHERE e.event_type = 'error' AND p.event_type = 'purchase'
      AND abs(floor(epoch(e.ts)) - floor(epoch(p.ts))) <= 300
    """,
    survey="ext/scale (band join: |a−b| <= eps as an EQUI-join — the "
           "right side lands in one floor(val/eps) bucket, the left "
           "probes its bucket ± 1, each qualifying pair meets exactly "
           "once, then a cheap post-filter; hash-partitioned and "
           "skew-splittable where a raw range predicate nested-loops. "
           "Result identical to the naive range join — the oracle IS the "
           "naive join. operators/joins.py::band_join)",
)
def j_band_proximity_join_entry(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.joins import band_join

    ev = _t(spark, sf_dir, "events")
    err = ev.filter(F.col("event_type") == "error").select(
        "user_id", F.col("event_id").alias("error_id"),
        F.unix_timestamp("ts").alias("_le"))
    pur = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("_ru"), F.col("event_id").alias("purchase_id"),
        F.unix_timestamp("ts").alias("_re"))
    j = band_join(
        err, pur.withColumnRenamed("_ru", "user_id"),
        "_le", "_re", 300, on=["user_id"])
    return j.select(
        "user_id", "error_id", "purchase_id",
        (F.col("_re") - F.col("_le")).alias("gap_sec"))


@register(
    "seq_top_journeys",
    oracle="""
    WITH mapped AS (
        SELECT user_id, ts, event_id,
               CASE event_type WHEN 'view' THEN 'v' WHEN 'click' THEN 'c'
                    WHEN 'purchase' THEN 'p' WHEN 'signup' THEN 's'
                    WHEN 'error' THEN 'e' END AS sym
        FROM events
        WHERE event_type IN ('view', 'click', 'purchase', 'signup', 'error')
    ), ranked AS (
        SELECT user_id, sym,
               ROW_NUMBER() OVER (PARTITION BY user_id
                                  ORDER BY ts, sym, event_id) AS rn
        FROM mapped
    ), paths AS (
        SELECT user_id, string_agg(sym, '' ORDER BY rn) AS path
        FROM ranked WHERE rn <= 8 GROUP BY user_id
    ), counts AS (
        SELECT path, CAST(COUNT(*) AS BIGINT) AS n_entities
        FROM paths GROUP BY path
    ), t AS (SELECT CAST(SUM(n_entities) AS BIGINT) AS tot FROM counts)
    SELECT CAST(rnk AS INT) AS rank, path, n_entities,
           CAST(n_entities AS DOUBLE) / tot AS pct
    FROM (
        SELECT *, ROW_NUMBER() OVER (
            ORDER BY n_entities DESC, path ASC) AS rnk
        FROM counts
    ), t WHERE rnk <= 10 ORDER BY rnk
    """,
    survey="ext: top user journeys (path mining) — each entity's first 8 "
           "mapped events as a deterministic symbol path, counted and "
           "ranked (ties by path string, so engine-exact); built on the "
           "sequence_delta machinery, path counts are a partial-agg "
           "shuffle over bounded-length strings, only n heads survive. "
           "operators/sequence.py::top_sequences",
)
def seq_top_journeys_entry(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.sequence import top_sequences

    ev = _t(spark, sf_dir, "events")
    return top_sequences(
        ev,
        {"view": "v", "click": "c", "purchase": "p", "signup": "s",
         "error": "e"},
        ["user_id"], n=10, max_events=8)


@register(
    "zz_t_peak_concurrency",
    # the sweep-line running sum's intermediate values depend on
    # within-tie order, but the MAX and its first timestamp are
    # permutation-invariant (−1 sorts before +1, so ties resolve to the
    # same extremes) — hence hash-exact across engines
    oracle="""
    WITH iv AS (
        SELECT event_type, CAST(floor(epoch(ts)) AS BIGINT) AS s,
               CAST(floor(epoch(ts)) AS BIGINT)
                   + CAST(floor(value) AS BIGINT) AS e
        FROM events WHERE ts IS NOT NULL AND value IS NOT NULL
    ), ev AS (
        SELECT event_type, s AS ts, 1 AS delta FROM iv
        UNION ALL SELECT event_type, e, -1 FROM iv
    ), run AS (
        SELECT event_type, ts,
               SUM(delta) OVER (PARTITION BY event_type
                                ORDER BY ts ASC, delta ASC
                                ROWS UNBOUNDED PRECEDING) AS c
        FROM ev
    )
    SELECT event_type, CAST(c AS BIGINT) AS peak_concurrent,
           ts AS peak_at
    FROM run
    QUALIFY ROW_NUMBER() OVER (PARTITION BY event_type
                               ORDER BY c DESC, ts ASC) = 1
    """,
    survey="ext: sweep-line peak concurrency (capacity planning: max "
           "simultaneously-active intervals per group, and when) — "
           "map-side ±1 event explode, ONE shuffle to the group grain, "
           "one ordered running-sum window; −1 sorts before +1 so "
           "back-to-back intervals never double-count, and the peak is "
           "tie-permutation-invariant, so the entry is oracle-EXACT. "
           "operators/timeseries.py::peak_concurrency",
)
def t_peak_concurrency_entry(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.timeseries import peak_concurrency

    ev = _t(spark, sf_dir, "events")
    iv = ev.filter(F.col("ts").isNotNull() & F.col("value").isNotNull()).select(
        "event_type",
        F.unix_timestamp("ts").alias("s"),
        (F.unix_timestamp("ts") + F.floor("value").cast("long")).alias("e"),
    )
    return peak_concurrency(iv, "s", "e", ["event_type"])


@register(
    "zz_t_sequence_match",
    oracle="""
    WITH mapped AS (
        SELECT user_id, ts, event_id,
               CASE event_type WHEN 'view' THEN 'v' WHEN 'click' THEN 'c'
                    WHEN 'purchase' THEN 'p' END AS sym
        FROM events WHERE event_type IN ('view', 'click', 'purchase')
    ), seqs AS (
        SELECT user_id,
               string_agg(sym, '' ORDER BY ts, sym, event_id) AS seq
        FROM mapped GROUP BY user_id
    )
    SELECT user_id, CAST(LENGTH(seq) AS INT) AS seq_len,
           CAST(len(regexp_extract_all(seq, 'v+c+p')) AS INT) AS n_matches,
           len(regexp_extract_all(seq, 'v+c+p')) > 0 AS matched,
           COALESCE(regexp_extract(seq, 'v+c+p'), '') AS first_match
    FROM seqs
    """,
    survey="ext: MATCH_RECOGNIZE-lite event-sequence matching — each "
           "entity's events become a symbol string in a deterministic "
           "(ts, symbol, id) total order and the behavioral pattern is a "
           "plain regex over it ('v+c+p': views, then clicks, then a "
           "purchase, adjacent); richer than funnels (repetition/"
           "alternation/adjacency) yet engine-portable, so the entry is "
           "oracle-EXACT. One shuffle; unmapped events drop map-side. "
           "operators/sequence.py",
)
def t_sequence_match_entry(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.sequence import sequence_match

    ev = _t(spark, sf_dir, "events")
    return sequence_match(
        ev, "v+c+p",
        {"view": "v", "click": "c", "purchase": "p"},
        ["user_id"],
    )


@register(
    "zz_j_salted_skew_join",
    oracle="""
    SELECT o.o_orderpriority, l.l_linestatus, COUNT(*) AS n_items,
           CAST(SUM(CAST(l.l_quantity AS DECIMAL(27,6))) AS DOUBLE) AS sum_qty
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    GROUP BY o.o_orderpriority, l.l_linestatus
    """,
    survey="X4/skew (salted equi-join: deterministic left salt + replicated "
           "right side spreads a hot key over `salt` reducers; "
           "result-identical to the plain join — the oracle IS the plain "
           "join. Scale path for hot school/district keys where AQE "
           "skew-splitting can't engage; operators/joins.py::salted_join)",
)
def j_salted_skew_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_linestatus", "l_quantity")
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority").withColumnRenamed(
        "o_orderkey", "l_orderkey"
    )
    # split-salting, the production config: a cheap pre-count picks the
    # heaviest keys (the hot_keys diagnostic), ONLY those are salted/
    # replicated — the rest of the right side is never inflated. (Salting
    # everything, the old config here, replicated the entire right side x8
    # and was the single most expensive catalog entry; result is identical
    # either way.) Top-N by count rather than an absolute threshold so the
    # replicated path stays exercised on this data (TPC-H lineitem tops
    # out ~7 rows/key; a real deployment would use a threshold tied to
    # reducer capacity).
    hot = [
        r[0] for r in
        hot_keys(li, ["l_orderkey"], k=20).select("l_orderkey").collect()
    ]
    j = salted_join(li, o, on="l_orderkey", how="inner", salt=8,
                    hot_keys=hot or [-1])
    return j.groupBy("o_orderpriority", "l_linestatus").agg(
        F.count("*").alias("n_items"),
        _dsum(F.col("l_quantity")).alias("sum_qty"),
    )


@register(
    "j_bloom_pruned_join",
    oracle="""
    SELECT o.o_orderkey, o.o_custkey, c.c_name
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    WHERE c.c_mktsegment = 'BUILDING' AND c.c_acctbal > 5000
    """,
    survey="ext/scale (explicit runtime-filter join: a Bloom filter of "
           "the build side's keys broadcasts where the ROWS can't — "
           "Kirsch-Mitzenmacher double xxhash64, per-partition numpy "
           "bitmaps OR-merged through one single-group reduce — and the "
           "fact drops non-matching rows MAP-SIDE before the join "
           "shuffle; false positives are removed by the join itself so "
           "the result is bit-exactly the plain join — the oracle IS the "
           "plain join. operators/bloom.py)",
)
def j_bloom_pruned_join_entry(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.bloom import bloom_pruned_join

    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    c = _t(spark, sf_dir, "customer").filter(
        (F.col("c_mktsegment") == "BUILDING") & (F.col("c_acctbal") > 5000)
    ).select("c_custkey", "c_name")
    return bloom_pruned_join(
        o, c, "o_custkey", "c_custkey", n_bits=1 << 16,
    ).select("o_orderkey", "o_custkey", "c_name")


@register(
    "zz_drift_psi",
    # psi terms carry ln(): libm vs JVM log can differ in the last ulp,
    # so the logged terms/total are ROUNDed to 10 decimals on both sides
    # (the shares themselves are exact integer/total divisions)
    oracle="""
    WITH e AS (
        SELECT CAST((o_totalprice > 100000.0)::INT
                  + (o_totalprice > 200000.0)::INT
                  + (o_totalprice > 300000.0)::INT AS INT) AS bin
        FROM orders WHERE o_totalprice IS NOT NULL AND year(o_orderdate) < 1996
    ), a AS (
        SELECT CAST((o_totalprice > 100000.0)::INT
                  + (o_totalprice > 200000.0)::INT
                  + (o_totalprice > 300000.0)::INT AS INT) AS bin
        FROM orders WHERE o_totalprice IS NOT NULL AND year(o_orderdate) >= 1996
    ), bins(bin, lo, hi) AS (
        VALUES (0, CAST('-infinity' AS DOUBLE), 100000.0),
               (1, 100000.0, 200000.0), (2, 200000.0, 300000.0),
               (3, 300000.0, CAST('infinity' AS DOUBLE))
    ), ec AS (SELECT bin, CAST(COUNT(*) AS BIGINT) AS n_expected FROM e GROUP BY bin
    ), ac AS (SELECT bin, CAST(COUNT(*) AS BIGINT) AS n_actual FROM a GROUP BY bin
    ), g AS (
        SELECT b.bin, b.lo, b.hi,
               COALESCE(ec.n_expected, 0) AS n_expected,
               COALESCE(ac.n_actual, 0) AS n_actual
        FROM bins b LEFT JOIN ec ON b.bin = ec.bin
                    LEFT JOIN ac ON b.bin = ac.bin
    ), t AS (
        SELECT CAST(SUM(n_expected) AS DOUBLE) AS te,
               CAST(SUM(n_actual) AS DOUBLE) AS ta FROM g
    ), s AS (
        SELECT g.*, GREATEST(n_expected / te, 1e-6) AS share_expected,
               GREATEST(n_actual / ta, 1e-6) AS share_actual
        FROM g, t
    ), terms AS (
        SELECT *, (share_actual - share_expected)
                  * ln(share_actual / share_expected) AS term
        FROM s
    ), tot AS (
        SELECT list_reduce(list_transform(list_sort(
                   list(struct_pack(bin := bin, term := term))),
                   x -> x['term']), (acc, x) -> acc + x) AS psi
        FROM terms
    )
    SELECT bin, lo, hi, n_expected, n_actual, share_expected, share_actual,
           ROUND(term, 10) AS psi_term, ROUND(psi, 10) AS psi
    FROM terms, tot ORDER BY bin
    """,
    survey="ext/governance: Population Stability Index drift gate "
           "between a baseline and a current snapshot — EXPLICIT pinned "
           "bin cuts (recomputed cuts hide drift in the bins), map-side "
           "bin assignment over the broadcast cut array, one partial-agg "
           "shuffle per side at the bin grain, eps-floored shares, "
           "sorted-fold total. operators/diff.py::population_stability_index",
)
def zz_drift_psi_entry(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.diff import population_stability_index

    o = _t(spark, sf_dir, "orders")
    # one synthetic-but-pinned drift question: early vs late order years
    expected = o.filter(F.year("o_orderdate") < 1996)
    actual = o.filter(F.year("o_orderdate") >= 1996)
    r = population_stability_index(
        expected, actual, "o_totalprice",
        cuts=[100_000.0, 200_000.0, 300_000.0])
    return r.select(
        "bin", "lo", "hi", "n_expected", "n_actual",
        "share_expected", "share_actual",
        F.round("psi_term", 10).alias("psi_term"),
        F.round("psi", 10).alias("psi"),
    )


@register(
    "gate_expectations",
    oracle="""
    WITH agg AS (
        SELECT
            CAST(SUM(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS v_nn,
            CAST(SUM(CASE WHEN o_orderstatus IS NOT NULL
                           AND o_orderstatus NOT IN ('O', 'F') THEN 1 ELSE 0 END) AS BIGINT) AS v_set,
            CAST(SUM(CASE WHEN o_totalprice IS NOT NULL
                           AND (o_totalprice < 0.0 OR o_totalprice > 400000.0) THEN 1 ELSE 0 END) AS BIGINT) AS v_rng,
            CAST(SUM(CASE WHEN o_orderpriority IS NOT NULL
                           AND NOT regexp_matches(o_orderpriority, '^[1-5]-') THEN 1 ELSE 0 END) AS BIGINT) AS v_re,
            CAST(SUM(CASE WHEN NOT COALESCE(o_custkey > 0, FALSE) THEN 1 ELSE 0 END) AS BIGINT) AS v_ex
        FROM orders
    ), uq AS (
        SELECT CAST(COALESCE(SUM(c - 1), 0) AS BIGINT) AS v_uq FROM (
            SELECT COUNT(*) AS c FROM orders
            WHERE o_orderkey IS NOT NULL GROUP BY o_orderkey)
    )
    SELECT rule, kind, "column", n_violations, n_violations = 0 AS passed
    FROM (
        SELECT 'r_key_not_null' AS rule, 'not_null' AS kind,
               'o_orderkey' AS "column", v_nn AS n_violations FROM agg
        UNION ALL SELECT 'r_key_unique', 'unique', 'o_orderkey', v_uq FROM uq
        UNION ALL SELECT 'r_price_range', 'between', 'o_totalprice', v_rng FROM agg
        UNION ALL SELECT 'r_priority_shape', 'matches', 'o_orderpriority', v_re FROM agg
        UNION ALL SELECT 'r_status_set', 'in_set', 'o_orderstatus', v_set FROM agg
        UNION ALL SELECT 'r_custkey_pos', 'expr', '', v_ex FROM agg
    ) ORDER BY rule
    """,
    survey="ext/governance: declarative data-quality expectations "
           "(admission gate for any table) — not_null / unique / in_set "
           "/ between / matches / expr rules evaluated as conditional "
           "counts in ONE aggregate pass over the fact (plan-gated: one "
           "scan, one partial agg; unique adds one value-grain groupBy), "
           "plus a map-only quarantine tagger (violating_rows). "
           "operators/expectations.py",
)
def gate_expectations_entry(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.expectations import check_expectations

    o = _t(spark, sf_dir, "orders")
    rules = [
        ("r_key_not_null", "not_null", "o_orderkey", None),
        ("r_key_unique", "unique", "o_orderkey", None),
        ("r_price_range", "between", "o_totalprice", (0.0, 400000.0)),
        ("r_priority_shape", "matches", "o_orderpriority", r"^[1-5]-"),
        ("r_status_set", "in_set", "o_orderstatus", ["O", "F"]),
        ("r_custkey_pos", "expr", None, "o_custkey > 0"),
    ]
    return check_expectations(o, rules)


@register(
    "zz_k_anonymity",
    oracle="""
    SELECT c_nationkey, c_mktsegment, CAST(COUNT(*) AS BIGINT) AS n,
           COUNT(*) >= 15 AS is_k_anonymous
    FROM customer GROUP BY c_nationkey, c_mktsegment
    """,
    survey="ext/governance: k-anonymity release check (Sweeney) — "
           "equivalence-class sizes over the quasi-identifier grain with "
           "below-k flags, one partial-agg shuffle; suppression arm "
           "(suppress_small_classes) enforces the property via one "
           "broadcast semi-join on the class table. "
           "operators/profiling.py::k_anonymity_report",
)
def zz_k_anonymity_entry(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.profiling import k_anonymity_report

    c = _t(spark, sf_dir, "customer")
    return k_anonymity_report(c, ["c_nationkey", "c_mktsegment"], k=15)


@register(
    "cdc_table_feed",
    oracle="""
    WITH base AS (
        SELECT c_custkey, c_mktsegment, c_acctbal FROM customer
        WHERE c_custkey % 2 = 0
    )
    SELECT c_custkey, c_mktsegment, c_acctbal + 100 AS c_acctbal,
           'insert' AS _change_type
    FROM base WHERE c_custkey % 10 = 0
    UNION ALL
    SELECT c_custkey, c_mktsegment, c_acctbal, 'insert'
    FROM customer WHERE c_custkey % 2 = 1
    UNION ALL
    SELECT c_custkey, c_mktsegment, c_acctbal, 'delete'
    FROM base WHERE c_custkey % 10 = 0
    """,
    survey="ext/storage: change-data feed between table snapshots "
           "(partstore.read_changes) — manifests diff DRIVER-side so only "
           "partitions whose data-version sets changed are read at all "
           "(one changed partition on a 100 TB table reads one partition "
           "twice); row diffs are exact exceptAll multiset differences, "
           "updates surface as delete(before)+insert(after), and "
           "old − deletes + inserts == new exactly — so the feed is "
           "oracle-EXACT from the known upsert batch. The CDC window is "
           "the time-travel window (gc keep_manifests)",
)
def cdc_table_feed_entry(spark: SparkSession, sf_dir: str) -> DataFrame:
    import hashlib
    import os
    import tempfile

    from ..warehouse.partstore import PartitionedTable

    c = _t(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment", "c_acctbal")
    # fresh-enough table root per dataset build (same keying as the IVF
    # index entries): reruns add snapshots, but the feed is computed
    # between the two versions THIS run publishes, so output is stable
    st = os.stat(os.path.join(sf_dir, "customer.parquet"))
    key = hashlib.sha1(
        f"{os.path.abspath(sf_dir)}|{st.st_mtime_ns}|{st.st_size}".encode()
    ).hexdigest()[:12]
    root = os.path.join(tempfile.gettempdir(), f"rdw_cdc_{key}")
    pt = PartitionedTable(root, "cust", "c_mktsegment", ["c_custkey"])
    pt.overwrite(spark, c.filter("c_custkey % 2 = 0"))
    v1 = pt.latest()[0]
    batch = c.filter("c_custkey % 10 = 0").withColumn(
        "c_acctbal", F.col("c_acctbal") + 100
    ).unionByName(c.filter("c_custkey % 2 = 1"))
    pt.merge_rows(spark, batch)
    v2 = pt.latest()[0]
    return pt.read_changes(spark, v1, v2)


@register(
    "zz_incremental_join",
    oracle="""
    SELECT c.c_mktsegment, CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(o.o_totalprice AS DECIMAL(27,6))) AS DOUBLE)
               AS sum_price
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    GROUP BY c.c_mktsegment
    """,
    survey="ext: incremental view maintenance for JOINs — the delta-join "
           "identity dV = (dA join B_new) UNION (A_old join dB) keeps a "
           "materialized join view exact under interleaved insert-only "
           "loads of BOTH sides at O(delta*match) per batch (deltas "
           "broadcast; the big old sides are never shuffled — "
           "plan-gated); the accumulated view is bit-exactly the plain "
           "join, so the oracle IS the plain join + GROUP BY. "
           "operators/ivm.py::join_delta",
)
def zz_incremental_join_entry(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.ivm import join_delta

    o = _t(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("c_custkey"), "o_totalprice")
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    o0, o1 = o.filter("c_custkey % 2 = 0"), o.filter("c_custkey % 2 = 1")
    c0, c1 = c.filter("c_custkey % 3 = 0"), c.filter("c_custkey % 3 <> 0")
    eo, ec = o.limit(0), c.limit(0)
    # interleaved loads: orders batch, customers batch, orders, customers
    v = join_delta(eo, o0, ec, ec, ["c_custkey"])
    v = v.unionByName(join_delta(o0, eo, ec, c0, ["c_custkey"]))
    v = v.unionByName(join_delta(o0, o1, c0, ec, ["c_custkey"]))
    v = v.unionByName(join_delta(o0.unionByName(o1), eo, c0, c1, ["c_custkey"]))
    return v.groupBy("c_mktsegment").agg(
        F.count("*").alias("n_orders"),
        _dsum(F.col("o_totalprice")).alias("sum_price"),
    )


@register(
    "zz_corpus_overlap",
    oracle=None,  # KMV arrays are xxhash64-order statistics (no DuckDB
                  # twin); bit-determinism under any partitioning, EXACT
                  # merge-equals-rebuild, and ground-truth overlap
                  # envelopes are pytest-locked (tests/test_kmv.py)
    survey="ext: corpus-overlap / contamination-rate estimation via KMV "
           "set-operation sketches (Bar-Yossef et al.; Beyer et al.) — "
           "k-minimum xxhash64 values per corpus (one distinct shuffle + "
           "WindowGroupLimit top-k; raw shingles never shuffle), then "
           "union/Jaccard/intersection/containment from pure array "
           "expressions over the two sketch rows: the set algebra HLL "
           "registers cannot do, at O(k) state per corpus",
)
def zz_corpus_overlap_entry(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.dedup import shingles
    from ..operators.kmv import kmv_overlap, kmv_sketch

    d = load_table(spark, sf_dir, "documents")
    # two halves of the corpus share content exactly where the generator
    # planted duplicates — the contamination-measurement shape
    sh = shingles(d, n=3, hashed=True).withColumn("g", F.lit("corpus"))
    a = kmv_sketch(sh.filter(F.col("doc_id") % 2 == 0), ["g"], "shingle")
    b = kmv_sketch(sh.filter(F.col("doc_id") % 2 == 1), ["g"], "shingle")
    r = kmv_overlap(a, b, ["g"])
    return r.select(
        "g", F.round("n_a", 1).alias("n_shingles_even"),
        F.round("n_b", 1).alias("n_shingles_odd"),
        F.round("union_est", 1).alias("union_est"),
        F.round("jaccard_est", 4).alias("jaccard_est"),
        F.round("intersect_est", 1).alias("intersect_est"),
        F.round("containment_a_in_b", 4).alias("containment_even_in_odd"),
        F.round("containment_b_in_a", 4).alias("containment_odd_in_even"),
    )


@register(
    "zz_skew_hotkeys",
    oracle="""
    WITH c AS (
        SELECT l_suppkey, COUNT(*) AS n FROM lineitem GROUP BY l_suppkey
    ), t AS (SELECT SUM(n) AS total FROM c)
    SELECT l_suppkey, n, CAST(n AS DOUBLE) / total AS share,
           CAST(ROW_NUMBER() OVER (ORDER BY n DESC, l_suppkey) AS INT) AS rank
    FROM c, t
    ORDER BY n DESC, l_suppkey
    LIMIT 20
    """,
    survey="X4/skew diagnostic (exact heavy hitters over a prospective "
           "shuffle key: one partial-aggregated count shuffle — map-side "
           "combine condenses to distinct keys — TakeOrderedAndProject "
           "top-k, share from re-aggregating the per-key counts, never a "
           "second input scan; feeds salted_join's hot-key list — "
           "operators/joins.py::hot_keys)",
)
def zz_skew_hotkeys_entry(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").select("l_suppkey")
    return hot_keys(li, ["l_suppkey"], k=20)


@register(
    "j_fuzzy_join",
    oracle="""
    SELECT a.c_custkey AS left_id, b.c_custkey AS right_id,
           a.c_name AS left_value, b.c_name AS right_value,
           CAST(levenshtein(a.c_name, b.c_name) AS BIGINT) AS dist
    FROM customer a JOIN customer b ON a.c_custkey < b.c_custkey
    WHERE levenshtein(a.c_name, b.c_name) <= 1
    """,
    survey="ext: edit-distance fuzzy join (entity resolution) — all pairs "
           "within levenshtein<=k, EXACT result via FastSS symmetric-"
           "delete blocking (two strings within edit distance k share an "
           "up-to-k-deletion key): map-only key explode with ~L-choose-"
           "<=k fan-out, one equi-shuffle on deletion keys whose "
           "frequency tracks true near-dup density (immune to shared-"
           "prefix/hot-token skew, unlike q-gram blocking), codegen'd "
           "levenshtein verify on distinct candidates only — never a "
           "cross join; oracle is the DuckDB brute-force cross join",
)
def zz_fuzzy_join_entry(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..io import spread_scan

    # deletion-key explosion is CPU-dense and pre-exchange: spread the
    # single-row-group scan so it isn't generated by one task
    cust = spread_scan(
        load_table(spark, sf_dir, "customer").select("c_custkey", "c_name"))
    return fuzzy_join(cust, None, "c_name", left_id_col="c_custkey",
                      max_dist=1)


@register(
    "zz_olap_rollup",
    oracle="""
    WITH base AS (
        SELECT r_name, n_name,
               l_extendedprice * (1 - l_discount) AS rev
        FROM lineitem
          JOIN orders   ON l_orderkey = o_orderkey
          JOIN customer ON o_custkey = c_custkey
          JOIN nation   ON c_nationkey = n_nationkey
          JOIN region   ON n_regionkey = r_regionkey
    )
    SELECT r_name, n_name,
           CAST(GROUPING(r_name, n_name) AS BIGINT) AS gid,
           CAST(COUNT(*) AS BIGINT) AS n_items,
           CAST(SUM(CAST(rev AS DECIMAL(27,6))) AS DOUBLE) AS revenue
    FROM base GROUP BY ROLLUP(r_name, n_name)
    """,
    survey="ext: OLAP ROLLUP with grouping_id — region→nation revenue at "
           "detail + per-region subtotal + grand total in ONE aggregation "
           "pass (Spark expands grouping sets map-side; a single shuffle "
           "on the padded keys, not one job per level); gid bitmask "
           "(first col = MSB) distinguishes subtotal rows from genuine "
           "NULL dimension values, parity with DuckDB GROUPING()",
)
def zz_olap_rollup_entry(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_extendedprice", "l_discount")
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n = _t(spark, sf_dir, "nation").select("n_nationkey", "n_regionkey", "n_name")
    r = _t(spark, sf_dir, "region").select("r_regionkey", "r_name")
    base = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .select(
            "r_name", "n_name",
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("rev"),
        )
    )
    return base.rollup("r_name", "n_name").agg(
        F.grouping_id().alias("gid"),
        F.count("*").alias("n_items"),
        _dsum(F.col("rev")).alias("revenue"),
    ).select("r_name", "n_name", "gid", "n_items", "revenue")


@register(
    "zz_event_funnel",
    oracle="""
    WITH s1 AS (
        SELECT user_id,
               MIN(ts) FILTER (WHERE event_type = 'signup') AS t1
        FROM events GROUP BY user_id
    ),
    s2 AS (
        SELECT e.user_id, MIN(e.ts) AS t2
        FROM events e JOIN s1 ON e.user_id = s1.user_id
        WHERE e.event_type = 'view'
          AND e.ts > s1.t1 AND e.ts <= s1.t1 + INTERVAL 24 HOUR
        GROUP BY e.user_id
    ),
    s3 AS (
        SELECT e.user_id, MIN(e.ts) AS t3
        FROM events e JOIN s2 ON e.user_id = s2.user_id
        WHERE e.event_type = 'purchase'
          AND e.ts > s2.t2 AND e.ts <= s2.t2 + INTERVAL 24 HOUR
        GROUP BY e.user_id
    ),
    c AS (
        SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM s1) AS total,
               (SELECT CAST(COUNT(t1) AS BIGINT) FROM s1) AS c1,
               (SELECT CAST(COUNT(*) AS BIGINT) FROM s2) AS c2,
               (SELECT CAST(COUNT(*) AS BIGINT) FROM s3) AS c3
    )
    SELECT * FROM (
        SELECT CAST(1 AS INT) AS stage, 'signup' AS stage_event, c1 AS users,
               CAST(c1 AS DOUBLE) / NULLIF(total, 0) AS conversion FROM c
        UNION ALL
        SELECT 2, 'view', c2, CAST(c2 AS DOUBLE) / NULLIF(c1, 0) FROM c
        UNION ALL
        SELECT 3, 'purchase', c3, CAST(c3 AS DOUBLE) / NULLIF(c2, 0) FROM c
    )
    """,
    survey="ext: ordered event funnel (signup → first view within 24h → "
           "first purchase within 24h of that view) — built on the shared "
           "timeseries.funnel_stage_frames core (one funnel engine for "
           "both catalog variants): multi-pass "
           "conditional-min aggregation, NOT a per-user collect_list fold: "
           "each stage is one equi-shuffle on user_id (Spark reuses the "
           "hash partitioning across the join→groupBy pairs), so a user "
           "with 10^8 events never materializes an array; strict-ts "
           "ordering and bounded windows match the DuckDB sequential-min "
           "oracle exactly",
)
def zz_event_funnel_entry(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.timeseries import funnel_stage_frames

    evs = _t(spark, sf_dir, "events").select("user_id", "ts", "event_type")
    frames = funnel_stage_frames(
        evs, "user_id", "ts", "event_type",
        ["signup", "view", "purchase"], within_seconds=24 * 3600,
    )
    counts = (
        evs.agg(F.count_distinct("user_id").alias("total"))
        .crossJoin(frames[0].agg(F.count("*").alias("c1")))
        .crossJoin(frames[1].agg(F.count("*").alias("c2")))
        .crossJoin(frames[2].agg(F.count("*").alias("c3")))
    )
    return counts.select(
        F.expr(
            "stack(3,"
            " CAST(1 AS INT), 'signup',   c1, CAST(c1 AS DOUBLE) / nullif(total, 0),"
            " CAST(2 AS INT), 'view',     c2, CAST(c2 AS DOUBLE) / nullif(c1, 0),"
            " CAST(3 AS INT), 'purchase', c3, CAST(c3 AS DOUBLE) / nullif(c2, 0)"
            ") AS (stage, stage_event, users, conversion)"
        )
    )


@register(
    "zz_cohort_retention",
    oracle="""
    WITH f AS (
        SELECT user_id, CAST(DATE_TRUNC('week', MIN(ts)) AS DATE) AS cohort
        FROM events WHERE event_type = 'purchase' AND value >= 190
        GROUP BY user_id
    ),
    a AS (
        SELECT DISTINCT e.user_id, f.cohort,
               CAST(DATEDIFF('day', f.cohort,
                             CAST(DATE_TRUNC('week', e.ts) AS DATE)) / 7 AS INT)
                   AS offset_w
        FROM events e JOIN f ON e.user_id = f.user_id
        WHERE CAST(DATE_TRUNC('week', e.ts) AS DATE) >= f.cohort
    ),
    sz AS (SELECT cohort, CAST(COUNT(*) AS BIGINT) AS cohort_users
           FROM f GROUP BY cohort)
    SELECT a.cohort AS cohort_week, a.offset_w,
           CAST(COUNT(*) AS BIGINT) AS active_users,
           CAST(COUNT(*) AS DOUBLE) / ANY_VALUE(sz.cohort_users) AS retention
    FROM a JOIN sz ON a.cohort = sz.cohort
    GROUP BY a.cohort, a.offset_w
    """,
    survey="ext: cohort retention — cohort = ISO week of a user's first "
           "high-value purchase (value>=190, a rare trigger so cohorts "
           "spread), retention = share of the cohort active in week "
           "cohort+k: two groupBys and one user_id equi-join, cohort "
           "sizes joined back as a broadcast (distinct weeks are tiny); "
           "week-truncation (Monday start) and day/7 offsets are "
           "bit-identical across Spark and DuckDB",
)
def zz_cohort_retention_entry(spark: SparkSession, sf_dir: str) -> DataFrame:
    evs = _t(spark, sf_dir, "events").select("user_id", "ts", "event_type", "value")
    f = (
        evs.filter((F.col("event_type") == "purchase") & (F.col("value") >= 190))
        .groupBy("user_id")
        .agg(F.to_date(F.date_trunc("week", F.min("ts"))).alias("cohort"))
    )
    a = (
        evs.join(f, "user_id")
        .select(
            "user_id", "cohort",
            F.to_date(F.date_trunc("week", F.col("ts"))).alias("wk"),
        )
        .filter(F.col("wk") >= F.col("cohort"))
        .select(
            "user_id", "cohort",
            (F.datediff("wk", "cohort") / 7).cast("int").alias("offset_w"),
        )
        .distinct()
    )
    sz = f.groupBy("cohort").agg(F.count("*").alias("cohort_users"))
    return (
        a.groupBy("cohort", "offset_w")
        .agg(F.count("*").alias("active_users"))
        .join(F.broadcast(sz), "cohort")
        .select(
            F.col("cohort").alias("cohort_week"), "offset_w", "active_users",
            (F.col("active_users").cast("double") / F.col("cohort_users")).alias("retention"),
        )
    )


@register(
    "zz_rolling_range_avg",
    oracle="""
    SELECT event_id, user_id, ts,
           CAST(n_win AS BIGINT) AS n_win,
           CAST(sum_d AS DOUBLE) / n_win AS rolling_avg
    FROM (
        SELECT event_id, user_id, ts,
               COUNT(*) OVER w AS n_win,
               SUM(CAST(value AS DECIMAL(27,6))) OVER w AS sum_d
        FROM events WHERE event_type = 'purchase'
        WINDOW w AS (
            PARTITION BY user_id ORDER BY ts
            RANGE BETWEEN INTERVAL 7 DAY PRECEDING AND CURRENT ROW
        )
    )
    """,
    survey="ext: time-RANGE window frame — 7-day trailing per-user average "
           "purchase value: one shuffle on user_id, per-partition sort, "
           "frame evaluated by Spark's sliding window (no self-join, no "
           "explode-per-day); ordering key is unix_micros so the frame "
           "bounds are bit-identical to DuckDB's µs-precision INTERVAL "
           "arithmetic, and the frame sum uses the decimal-accumulate "
           "pattern so the double result is order-independent",
)
def zz_rolling_range_avg_entry(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    evs = (
        _t(spark, sf_dir, "events")
        .filter(F.col("event_type") == "purchase")
        .select("event_id", "user_id", "ts", "value")
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros("ts"))
        .rangeBetween(-7 * 24 * 3600 * 1_000_000, 0)
    )
    return evs.select(
        "event_id", "user_id", "ts",
        F.count("*").over(w).alias("n_win"),
        (
            F.sum(F.col("value").cast("decimal(27,6)")).over(w).cast("double")
            / F.count("*").over(w)
        ).alias("rolling_avg"),
    )


@register(
    "zz_pivot_matrix",
    oracle="""
    SELECT n_name,
           CAST(SUM(CAST(CASE WHEN o_orderpriority = '1-URGENT' THEN o_totalprice END AS DECIMAL(27,6))) AS DOUBLE) AS p1_urgent,
           CAST(SUM(CAST(CASE WHEN o_orderpriority = '2-HIGH' THEN o_totalprice END AS DECIMAL(27,6))) AS DOUBLE) AS p2_high,
           CAST(SUM(CAST(CASE WHEN o_orderpriority = '3-MEDIUM' THEN o_totalprice END AS DECIMAL(27,6))) AS DOUBLE) AS p3_medium,
           CAST(SUM(CAST(CASE WHEN o_orderpriority = '4-NOT SPECIFIED' THEN o_totalprice END AS DECIMAL(27,6))) AS DOUBLE) AS p4_not_specified,
           CAST(SUM(CAST(CASE WHEN o_orderpriority = '5-LOW' THEN o_totalprice END AS DECIMAL(27,6))) AS DOUBLE) AS p5_low
    FROM orders JOIN customer ON o_custkey = c_custkey
    JOIN nation ON c_nationkey = n_nationkey
    GROUP BY n_name
    """,
    survey="ext: pivot (long→wide crosstab) — nation × order-priority "
           "revenue matrix: pivot values passed EXPLICITLY so Spark skips "
           "the extra distinct-values job and the aggregation is a single "
           "shuffle (pivot-with-values compiles to the same plan as "
           "SUM(CASE WHEN) conditional aggregation — which is exactly the "
           "oracle's formulation); decimal-accumulated sums for hash "
           "parity",
)
def zz_pivot_matrix_entry(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders").select("o_custkey", "o_orderpriority", "o_totalprice")
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    prios = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
    wide = (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .pivot("o_orderpriority", prios)
        .agg(F.sum(F.col("o_totalprice").cast("decimal(27,6)")).cast("double"))
    )
    return wide.select(
        "n_name",
        *[
            F.col(f"`{p}`").alias("p" + p.lower().replace("-", "_").replace(" ", "_"))
            for p in prios
        ],
    )


@register(
    "zz_scd2_intervals",
    oracle="""
    WITH chg AS (
        SELECT user_id, event_id, ts, event_type,
               CASE WHEN LAG(event_type) OVER w IS NULL
                         OR LAG(event_type) OVER w <> event_type
                    THEN 1 ELSE 0 END AS is_chg
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), seg AS (
        SELECT user_id, ts, event_type,
               SUM(is_chg) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS UNBOUNDED PRECEDING) AS seg_id
        FROM chg
    ), runs AS (
        SELECT user_id, CAST(seg_id AS BIGINT) AS seg_id, event_type,
               MIN(ts) AS effective_from,
               CAST(COUNT(*) AS BIGINT) AS n_events
        FROM seg GROUP BY user_id, seg_id, event_type
    )
    SELECT user_id, event_type, effective_from,
           LEAD(effective_from) OVER w2 AS effective_to,
           LEAD(effective_from) OVER w2 IS NULL AS is_current,
           CAST(ROW_NUMBER() OVER w2 AS BIGINT) AS version,
           n_events
    FROM runs
    WINDOW w2 AS (PARTITION BY user_id ORDER BY effective_from)
    """,
    survey="ext: SCD Type-2 historization / gaps-and-islands — collapse a "
           "per-entity change log into validity intervals "
           "[effective_from, effective_to) with version numbers and an "
           "is_current flag: lag-based change detection + running-sum "
           "island ids + one groupBy, all over the SAME (user_id) "
           "partitioning so Spark plans a single shuffle and reuses the "
           "sort across both window passes; total (ts, event_id) order "
           "makes the result deterministic under ts ties",
)
def zz_scd2_intervals_entry(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    evs = _t(spark, sf_dir, "events").select("user_id", "event_id", "ts", "event_type")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev = F.lag("event_type").over(w)
    chg = (prev.isNull() | (prev != F.col("event_type"))).cast("int")
    seg = (
        evs.withColumn("is_chg", chg)
        .withColumn(
            "seg_id",
            F.sum("is_chg").over(w.rowsBetween(Window.unboundedPreceding, 0)),
        )
        .groupBy("user_id", "seg_id", "event_type")
        .agg(
            F.min("ts").alias("effective_from"),
            F.count("*").alias("n_events"),
        )
    )
    w2 = Window.partitionBy("user_id").orderBy("effective_from")
    nxt = F.lead("effective_from").over(w2)
    return seg.select(
        "user_id", "event_type", "effective_from",
        nxt.alias("effective_to"),
        nxt.isNull().alias("is_current"),
        F.row_number().over(w2).cast("long").alias("version"),
        "n_events",
    )


@register(
    "zz_profile_columns",
    oracle="""
    SELECT 'o_orderkey' AS column_name, 'bigint' AS dtype,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(COUNT(*) - COUNT(o_orderkey) AS BIGINT) AS n_null,
           CAST(COUNT(DISTINCT o_orderkey) AS BIGINT) AS n_distinct,
           CAST(MIN(o_orderkey) AS DOUBLE) AS min_num,
           CAST(MAX(o_orderkey) AS DOUBLE) AS max_num,
           CAST(SUM(CAST(o_orderkey AS DECIMAL(27,6))) AS DOUBLE) / COUNT(o_orderkey) AS avg_num,
           CAST(-1 AS BIGINT) AS min_len, CAST(-1 AS BIGINT) AS max_len
    FROM orders
    UNION ALL
    SELECT 'o_totalprice', 'double', CAST(COUNT(*) AS BIGINT),
           CAST(COUNT(*) - COUNT(o_totalprice) AS BIGINT),
           CAST(COUNT(DISTINCT o_totalprice) AS BIGINT),
           CAST(MIN(o_totalprice) AS DOUBLE), CAST(MAX(o_totalprice) AS DOUBLE),
           CAST(SUM(CAST(o_totalprice AS DECIMAL(27,6))) AS DOUBLE) / COUNT(o_totalprice),
           CAST(-1 AS BIGINT), CAST(-1 AS BIGINT)
    FROM orders
    UNION ALL
    SELECT 'o_orderstatus', 'string', CAST(COUNT(*) AS BIGINT),
           CAST(COUNT(*) - COUNT(o_orderstatus) AS BIGINT),
           CAST(COUNT(DISTINCT o_orderstatus) AS BIGINT),
           CAST(-1 AS DOUBLE), CAST(-1 AS DOUBLE), CAST(-1 AS DOUBLE),
           CAST(MIN(LENGTH(o_orderstatus)) AS BIGINT),
           CAST(MAX(LENGTH(o_orderstatus)) AS BIGINT)
    FROM orders
    UNION ALL
    SELECT 'o_orderpriority', 'string', CAST(COUNT(*) AS BIGINT),
           CAST(COUNT(*) - COUNT(o_orderpriority) AS BIGINT),
           CAST(COUNT(DISTINCT o_orderpriority) AS BIGINT),
           CAST(-1 AS DOUBLE), CAST(-1 AS DOUBLE), CAST(-1 AS DOUBLE),
           CAST(MIN(LENGTH(o_orderpriority)) AS BIGINT),
           CAST(MAX(LENGTH(o_orderpriority)) AS BIGINT)
    FROM orders
    """,
    survey="ext: one-pass table profiler — per-column null counts, EXACT "
           "distinct counts, numeric min/max/decimal-accumulated mean, "
           "string length bounds, all in a single df.agg (multi-distinct "
           "Expand plan, one scan) unpivoted via stack — no per-column "
           "jobs, no driver collect; approx=True switches distincts to "
           "HLL++ and drops the Expand for monitoring-grade profiles — "
           "operators/profiling.py::profile_columns",
)
def zz_profile_columns_entry(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.profiling import profile_columns

    o = _t(spark, sf_dir, "orders")
    prof = profile_columns(
        o, ["o_orderkey", "o_totalprice", "o_orderstatus", "o_orderpriority"]
    )
    # sentinel-fill the per-type NULL stats: the driver's multiset compare
    # sorts row tuples, and mixed None/value columns don't sort
    return prof.fillna({"min_num": -1.0, "max_num": -1.0, "avg_num": -1.0,
                        "min_len": -1, "max_len": -1})


@register(
    "zz_stream_attribution",
    oracle="""
    SELECT v.user_id, v.event_id AS view_id, v.ts AS view_ts,
           p.event_id AS purchase_id, p.ts AS purchase_ts,
           p.value AS purchase_value
    FROM events v JOIN events p
      ON v.user_id = p.user_id
     AND v.event_type = 'view' AND p.event_type = 'purchase'
     AND p.ts >= v.ts AND p.ts < v.ts + INTERVAL 60 MINUTE
    """,
    survey="ext/T7: view→purchase attribution interval join — the batch "
           "twin of the stream-stream join in streaming/events.py::"
           "stream_attribution (watermarked both sides, time-bounded join "
           "condition ⇒ O(window) state): one equi-shuffle on user_id "
           "with the interval bounds as a post-join filter, never a "
           "cross product; the streaming twin is pytest-checked "
           "batch-equal across micro-batch splits",
)
def zz_stream_attribution_entry(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..streaming.events import attribution_pairs

    evs = _t(spark, sf_dir, "events")
    return attribution_pairs(
        evs.filter(F.col("event_type") == "view"),
        evs.filter(F.col("event_type") == "purchase"),
        window_minutes=60,
    ).select(
        "user_id", "view_id", "view_ts", "purchase_id", "purchase_ts",
        "purchase_value",
    )


@register(
    "zz_stat_corr_matrix",
    oracle="""
    WITH m AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n,
               SUM(CAST(l_quantity AS DECIMAL(38,12))) AS s_q,
               SUM(CAST(l_quantity * l_quantity AS DECIMAL(38,12))) AS ss_q,
               SUM(CAST(l_extendedprice AS DECIMAL(38,12))) AS s_p,
               SUM(CAST(l_extendedprice * l_extendedprice AS DECIMAL(38,12))) AS ss_p,
               SUM(CAST(l_discount AS DECIMAL(38,12))) AS s_d,
               SUM(CAST(l_discount * l_discount AS DECIMAL(38,12))) AS ss_d,
               SUM(CAST(l_quantity * l_extendedprice AS DECIMAL(38,12))) AS sp_qp,
               SUM(CAST(l_quantity * l_discount AS DECIMAL(38,12))) AS sp_qd,
               SUM(CAST(l_extendedprice * l_discount AS DECIMAL(38,12))) AS sp_pd
        FROM lineitem
        WHERE l_quantity IS NOT NULL AND l_extendedprice IS NOT NULL
          AND l_discount IS NOT NULL
    )
    SELECT 'l_quantity' AS col_a, 'l_extendedprice' AS col_b, n,
           CASE WHEN (CAST(n AS DOUBLE) * CAST(ss_q AS DOUBLE) - CAST(s_q AS DOUBLE) * CAST(s_q AS DOUBLE)) <= 0
                  OR (CAST(n AS DOUBLE) * CAST(ss_p AS DOUBLE) - CAST(s_p AS DOUBLE) * CAST(s_p AS DOUBLE)) <= 0
                THEN CAST(NULL AS DOUBLE)
                ELSE (CAST(n AS DOUBLE) * CAST(sp_qp AS DOUBLE) - CAST(s_q AS DOUBLE) * CAST(s_p AS DOUBLE))
                     / (sqrt(CAST(n AS DOUBLE) * CAST(ss_q AS DOUBLE) - CAST(s_q AS DOUBLE) * CAST(s_q AS DOUBLE))
                        * sqrt(CAST(n AS DOUBLE) * CAST(ss_p AS DOUBLE) - CAST(s_p AS DOUBLE) * CAST(s_p AS DOUBLE))) END AS corr
    FROM m
    UNION ALL
    SELECT 'l_quantity', 'l_discount', n,
           CASE WHEN (CAST(n AS DOUBLE) * CAST(ss_q AS DOUBLE) - CAST(s_q AS DOUBLE) * CAST(s_q AS DOUBLE)) <= 0
                  OR (CAST(n AS DOUBLE) * CAST(ss_d AS DOUBLE) - CAST(s_d AS DOUBLE) * CAST(s_d AS DOUBLE)) <= 0
                THEN CAST(NULL AS DOUBLE)
                ELSE (CAST(n AS DOUBLE) * CAST(sp_qd AS DOUBLE) - CAST(s_q AS DOUBLE) * CAST(s_d AS DOUBLE))
                     / (sqrt(CAST(n AS DOUBLE) * CAST(ss_q AS DOUBLE) - CAST(s_q AS DOUBLE) * CAST(s_q AS DOUBLE))
                        * sqrt(CAST(n AS DOUBLE) * CAST(ss_d AS DOUBLE) - CAST(s_d AS DOUBLE) * CAST(s_d AS DOUBLE))) END
    FROM m
    UNION ALL
    SELECT 'l_extendedprice', 'l_discount', n,
           CASE WHEN (CAST(n AS DOUBLE) * CAST(ss_p AS DOUBLE) - CAST(s_p AS DOUBLE) * CAST(s_p AS DOUBLE)) <= 0
                  OR (CAST(n AS DOUBLE) * CAST(ss_d AS DOUBLE) - CAST(s_d AS DOUBLE) * CAST(s_d AS DOUBLE)) <= 0
                THEN CAST(NULL AS DOUBLE)
                ELSE (CAST(n AS DOUBLE) * CAST(sp_pd AS DOUBLE) - CAST(s_p AS DOUBLE) * CAST(s_d AS DOUBLE))
                     / (sqrt(CAST(n AS DOUBLE) * CAST(ss_p AS DOUBLE) - CAST(s_p AS DOUBLE) * CAST(s_p AS DOUBLE))
                        * sqrt(CAST(n AS DOUBLE) * CAST(ss_d AS DOUBLE) - CAST(s_d AS DOUBLE) * CAST(s_d AS DOUBLE))) END
    FROM m
    """,
    survey="ext: exact one-pass Pearson correlation matrix — Σx/Σx²/Σxy "
           "accumulated as DECIMAL (exact + associative ⇒ bit-identical "
           "across partitionings, unlike F.corr's double Welford), corr "
           "assembled as a fixed-order double expression with IEEE sqrt; "
           "one scan + one 1-row agg for k + C(k,2) accumulators — "
           "operators/profiling.py::correlation_matrix",
)
def zz_corr_matrix_entry(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.profiling import correlation_matrix

    li = _t(spark, sf_dir, "lineitem")
    return correlation_matrix(
        li, ["l_quantity", "l_extendedprice", "l_discount"]
    )


@register(
    "zz_table_diff",
    oracle="""
    WITH new_snap AS (
        SELECT o_orderkey,
               CASE WHEN o_orderkey % 89 = 0 THEN o_totalprice + 100.0
                    ELSE o_totalprice END AS o_totalprice,
               o_orderstatus
        FROM orders WHERE o_orderkey % 97 <> 0
        UNION ALL
        SELECT o_orderkey + 10000000, 1.0, 'N'
        FROM orders WHERE o_orderkey % 101 = 0
    ), l AS (
        SELECT o_orderkey, o_totalprice, o_orderstatus FROM orders
    )
    SELECT COALESCE(l.o_orderkey, r.o_orderkey) AS o_orderkey,
           CASE WHEN l.o_orderkey IS NULL THEN 'added'
                WHEN r.o_orderkey IS NULL THEN 'removed'
                ELSE 'changed' END AS diff_type,
           CASE WHEN l.o_orderkey IS NULL OR r.o_orderkey IS NULL THEN ''
                ELSE ARRAY_TO_STRING(LIST_SORT(LIST_FILTER(
                    [CASE WHEN l.o_totalprice IS DISTINCT FROM r.o_totalprice THEN 'o_totalprice' END,
                     CASE WHEN l.o_orderstatus IS DISTINCT FROM r.o_orderstatus THEN 'o_orderstatus' END],
                    x -> x IS NOT NULL)), ',') END AS changed_cols
    FROM l FULL OUTER JOIN new_snap r ON l.o_orderkey = r.o_orderkey
    WHERE l.o_orderkey IS NULL OR r.o_orderkey IS NULL
       OR l.o_totalprice IS DISTINCT FROM r.o_totalprice
       OR l.o_orderstatus IS DISTINCT FROM r.o_orderstatus
    """,
    survey="ext: row-level table diff (snapshot reconciliation) — "
           "added/removed/changed with per-column attribution: one "
           "full-outer equi-join (bucket both snapshots at scale and the "
           "shuffle disappears), codegen'd null-safe comparisons, "
           "unchanged keys dropped pre-materialization; the row-level "
           "complement of K4's count reconciliation — "
           "operators/diff.py::table_diff",
)
def zz_table_diff_entry(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.diff import table_diff

    o = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice", "o_orderstatus"
    )
    new_snap = (
        o.filter(F.col("o_orderkey") % 97 != 0)
        .withColumn(
            "o_totalprice",
            F.when(F.col("o_orderkey") % 89 == 0, F.col("o_totalprice") + 100.0)
            .otherwise(F.col("o_totalprice")),
        )
        .unionByName(
            o.filter(F.col("o_orderkey") % 101 == 0).select(
                (F.col("o_orderkey") + 10000000).alias("o_orderkey"),
                F.lit(1.0).alias("o_totalprice"),
                F.lit("N").alias("o_orderstatus"),
            )
        )
    )
    return table_diff(o, new_snap, ["o_orderkey"])


@register(
    "zz_set_intersect_except",
    oracle="""
    SELECT 'intersect' AS op, c_custkey, CAST(COUNT(*) AS BIGINT) AS n
    FROM (
        SELECT o_custkey AS c_custkey FROM orders
        WHERE o_orderdate >= DATE '1997-01-01' AND o_orderdate < DATE '1998-01-01'
        INTERSECT ALL
        SELECT o_custkey FROM orders
        WHERE o_orderdate >= DATE '1996-01-01' AND o_orderdate < DATE '1997-01-01'
    ) GROUP BY c_custkey
    UNION ALL
    SELECT 'except', c_custkey, CAST(COUNT(*) AS BIGINT)
    FROM (
        SELECT o_custkey AS c_custkey FROM orders
        WHERE o_orderdate >= DATE '1997-01-01' AND o_orderdate < DATE '1998-01-01'
        EXCEPT ALL
        SELECT o_custkey FROM orders
        WHERE o_orderdate >= DATE '1996-01-01' AND o_orderdate < DATE '1997-01-01'
    ) GROUP BY c_custkey
    """,
    survey="ext/U-series completion: INTERSECT ALL and EXCEPT ALL "
           "(multiset semantics — retained multiplicities, not the "
           "distinct variants): Spark plans both as a single "
           "count-per-key aggregation + generate (one shuffle each, no "
           "join explosion); year-over-year retained/churned customer "
           "order multiplicities, rolled up for a stable driver window",
)
def zz_set_intersect_except_entry(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    def yr(y: int) -> DataFrame:
        return o.filter(
            (F.col("o_orderdate") >= F.lit(f"{y}-01-01").cast("date"))
            & (F.col("o_orderdate") < F.lit(f"{y + 1}-01-01").cast("date"))
        ).select(F.col("o_custkey").alias("c_custkey"))
    cur, prev = yr(1997), yr(1996)
    inter = cur.intersectAll(prev).groupBy("c_custkey").agg(
        F.count("*").alias("n")).withColumn("op", F.lit("intersect"))
    exc = cur.exceptAll(prev).groupBy("c_custkey").agg(
        F.count("*").alias("n")).withColumn("op", F.lit("except"))
    return inter.unionByName(exc).select("op", "c_custkey", "n")


@register(
    "zz_last_touch_attribution",
    oracle="""
    SELECT user_id, purchase_id, purchase_ts, view_id AS last_view_id,
           view_ts AS last_view_ts, purchase_value
    FROM (
        SELECT v.user_id, v.event_id AS view_id, v.ts AS view_ts,
               p.event_id AS purchase_id, p.ts AS purchase_ts,
               p.value AS purchase_value,
               ROW_NUMBER() OVER (
                   PARTITION BY p.event_id
                   ORDER BY v.ts DESC, v.event_id DESC) AS rn
        FROM events v JOIN events p
          ON v.user_id = p.user_id
         AND v.event_type = 'view' AND p.event_type = 'purchase'
         AND p.ts >= v.ts AND p.ts < v.ts + INTERVAL 60 MINUTE
    ) WHERE rn = 1
    """,
    survey="ext/T7: LAST-touch attribution — argmax over the interval-join "
           "pairs: per-purchase row_number window with (view_ts, view_id) "
           "total order; WindowGroupLimit prunes to 1 row per purchase "
           "map-side before the window shuffle",
)
def zz_last_touch_attribution_entry(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from ..streaming.events import attribution_pairs

    evs = _t(spark, sf_dir, "events")
    pairs = attribution_pairs(
        evs.filter(F.col("event_type") == "view"),
        evs.filter(F.col("event_type") == "purchase"),
        window_minutes=60,
    )
    w = Window.partitionBy("purchase_id").orderBy(
        F.col("view_ts").desc(), F.col("view_id").desc()
    )
    return (
        pairs.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "user_id", "purchase_id", "purchase_ts",
            F.col("view_id").alias("last_view_id"),
            F.col("view_ts").alias("last_view_ts"),
            "purchase_value",
        )
    )


@register(
    "zz_equidepth_histogram",
    oracle="""
    SELECT bucket, CAST(COUNT(*) AS BIGINT) AS n,
           MIN(o_totalprice) AS lo, MAX(o_totalprice) AS hi,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(27,6))) AS DOUBLE) AS total
    FROM (
        SELECT o_totalprice,
               CAST(NTILE(10) OVER (ORDER BY o_totalprice, o_orderkey) AS INT)
                   AS bucket
        FROM orders
    ) GROUP BY bucket
    """,
    survey="ext: equi-depth histogram — NTILE(10) over a TOTAL order "
           "(value + key tiebreak ⇒ deterministic bucket boundaries, "
           "unlike bare NTILE under ties) then per-bucket min/max/count/"
           "decimal-sum; complements A6's equi-width buckets; the 100 TB "
           "path SHIPS as equi_depth_histogram(exact=False) — "
           "approx_percentile cuts + map-side bucketing, zero windows, "
           "plan-gated in tests/test_profiling.py",
)
def zz_equidepth_histogram_entry(spark: SparkSession, sf_dir: str) -> DataFrame:
    # exact=True (oracle-comparable NTILE). The 100 TB plan is
    # equi_depth_histogram(exact=False): approx_percentile cuts + map-side
    # bucket assignment, zero windows — plan-gated in tests/test_plans.py.
    from ..operators.profiling import equi_depth_histogram

    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    return equi_depth_histogram(
        o, "o_totalprice", buckets=10, exact=True, order_cols=["o_orderkey"]
    )


@register(
    "zz_ratio_to_report",
    oracle="""
    WITH nat AS (
        SELECT r_name, n_name,
               SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(27,6))) AS rev_d
        FROM lineitem
          JOIN orders   ON l_orderkey = o_orderkey
          JOIN customer ON o_custkey = c_custkey
          JOIN nation   ON c_nationkey = n_nationkey
          JOIN region   ON n_regionkey = r_regionkey
        GROUP BY r_name, n_name
    )
    SELECT r_name, n_name, CAST(rev_d AS DOUBLE) AS revenue,
           CAST(rev_d AS DOUBLE)
             / CAST(SUM(rev_d) OVER (PARTITION BY r_name) AS DOUBLE)
               AS share_in_region,
           CAST(rev_d AS DOUBLE) / CAST(SUM(rev_d) OVER () AS DOUBLE)
               AS share_of_total
    FROM nat
    """,
    survey="ext: ratio-to-report analytics — per-nation revenue share "
           "within region and of grand total: window sums accumulate in "
           "DECIMAL (exact/associative — a double window sum is partial-"
           "order-dependent) over the 25-row AGGREGATED result, so the "
           "unpartitioned grand-total window is a single tiny task, "
           "never a global shuffle of the fact",
)
def zz_ratio_to_report_entry(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_extendedprice", "l_discount")
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n = _t(spark, sf_dir, "nation").select("n_nationkey", "n_regionkey", "n_name")
    r = _t(spark, sf_dir, "region").select("r_regionkey", "r_name")
    nat = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(
            F.sum(
                (F.col("l_extendedprice") * (1 - F.col("l_discount")))
                .cast("decimal(27,6)")
            ).alias("rev_d")
        )
    )
    wr = Window.partitionBy("r_name")
    wt = Window.partitionBy()
    return nat.select(
        "r_name", "n_name",
        F.col("rev_d").cast("double").alias("revenue"),
        (F.col("rev_d").cast("double") / F.sum("rev_d").over(wr).cast("double"))
            .alias("share_in_region"),
        (F.col("rev_d").cast("double") / F.sum("rev_d").over(wt).cast("double"))
            .alias("share_of_total"),
    )


@register(
    "zz_outlier_mad",
    oracle="""
    WITH med AS (
        SELECT c_mktsegment AS segment,
               quantile_cont(o_totalprice, 0.5) AS med
        FROM orders JOIN customer ON o_custkey = c_custkey
        GROUP BY c_mktsegment
    ), dev AS (
        SELECT c.c_mktsegment AS segment, o.o_totalprice, m.med,
               ABS(o.o_totalprice - m.med) AS adev
        FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN med m ON c.c_mktsegment = m.segment
    ), mad AS (
        SELECT segment, ANY_VALUE(med) AS med,
               quantile_cont(adev, 0.5) AS mad,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM dev GROUP BY segment
    )
    SELECT d.segment, m.med, m.mad, m.n,
           CAST(COUNT(*) FILTER (
               WHERE d.adev > 3.0 * 1.4826 * m.mad) AS BIGINT) AS n_outliers
    FROM dev d JOIN mad m ON d.segment = m.segment
    GROUP BY d.segment, m.med, m.mad, m.n
    """,
    survey="ext: robust outlier detection (median absolute deviation) — "
           "per-segment median, MAD, and |x−med| > 3·1.4826·MAD counts: "
           "two exact-percentile aggregation passes (Spark percentile() "
           "is bit-identical to DuckDB quantile_cont) with the tiny "
           "per-segment stats broadcast back — robust z-scores where "
           "mean/stddev would chase their own outliers",
)
def zz_outlier_mad_entry(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders").select("o_custkey", "o_totalprice")
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    # No broadcast hint on customer: it is a fact-sized side (15 M rows at
    # TPC-H sf100) and a forced broadcast OOMs at the 100x tier.  AQE still
    # picks a broadcast join at small SF where it fits; at scale it falls
    # back to a shuffle join.  The med/mad broadcasts below stay — those
    # frames are <= one row per segment.
    base = o.join(c, o.o_custkey == c.c_custkey).select(
        F.col("c_mktsegment").alias("segment"), "o_totalprice"
    )
    med = base.groupBy("segment").agg(
        F.expr("percentile(o_totalprice, 0.5D)").alias("med")
    )
    dev = base.join(F.broadcast(med), "segment").withColumn(
        "adev", F.abs(F.col("o_totalprice") - F.col("med"))
    )
    mad = dev.groupBy("segment").agg(
        F.first("med").alias("med"),
        F.expr("percentile(adev, 0.5D)").alias("mad"),
        F.count("*").alias("n"),
    )
    return (
        dev.drop("med")
        .join(F.broadcast(mad), "segment")
        .groupBy("segment", "med", "mad", "n")
        .agg(
            F.sum(
                (F.col("adev") > 3.0 * 1.4826 * F.col("mad")).cast("long")
            ).alias("n_outliers")
        )
    )


# --------------------------------------------------------------------------
# Round 7: CUBE, ordered string_agg, per-group OLS
# --------------------------------------------------------------------------

@register(
    "olap_cube",
    oracle="""
    SELECT o_orderpriority, o_orderstatus,
           CAST(GROUPING(o_orderpriority, o_orderstatus) AS BIGINT) AS gid,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(27,6))) AS DOUBLE) AS total
    FROM orders
    GROUP BY CUBE (o_orderpriority, o_orderstatus)
    """,
    survey="ext: OLAP CUBE with grouping_id — all 2^k dim subsets in ONE "
           "pass (Spark Expand duplicates map-side, a single shuffle "
           "carries every granularity; k separate GROUP BYs would scan "
           "the fact k times at 100 TB); gid bitmask parity with DuckDB "
           "GROUPING()",
)
def zz_olap_cube_entry(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders").select(
        "o_orderpriority", "o_orderstatus", "o_totalprice"
    )
    return (
        o.cube("o_orderpriority", "o_orderstatus")
        .agg(
            F.grouping_id().alias("gid"),
            F.count("*").alias("n_orders"),
            _dsum(F.col("o_totalprice")).alias("total"),
        )
        .select("o_orderpriority", "o_orderstatus", "gid", "n_orders", "total")
    )


@register(
    "zz_olap_string_agg",
    oracle="""
    SELECT r.r_name AS region_name,
           CAST(COUNT(*) AS BIGINT) AS n_nations,
           string_agg(n.n_name, ',' ORDER BY n.n_name) AS nations
    FROM nation n JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY r.r_name
    """,
    survey="ext: deterministic ordered string aggregation (LISTAGG/"
           "string_agg ORDER BY) — Spark's collect_list is partial-order-"
           "nondeterministic, so the entry sorts the collected array "
           "before joining (array_sort ∘ collect_list ≡ string_agg ORDER "
           "BY); the group cardinality bounds the array, never the fact",
)
def zz_olap_string_agg_entry(spark: SparkSession, sf_dir: str) -> DataFrame:
    n = _t(spark, sf_dir, "nation").select("n_regionkey", "n_name")
    r = _t(spark, sf_dir, "region").select("r_regionkey", "r_name")
    return (
        n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy(F.col("r_name").alias("region_name"))
        .agg(
            F.count("*").alias("n_nations"),
            F.array_join(F.array_sort(F.collect_list("n_name")), ",")
                .alias("nations"),
        )
    )


@register(
    "stat_group_regression",
    oracle="""
    WITH m AS (
        SELECT l_linestatus,
               CAST(COUNT(*) AS BIGINT) AS n,
               SUM(CAST(CAST(l_quantity AS DOUBLE) AS DECIMAL(38,12))) AS sx,
               SUM(CAST(CAST(l_extendedprice AS DOUBLE) AS DECIMAL(38,12))) AS sy,
               SUM(CAST(CAST(l_quantity AS DOUBLE) * CAST(l_quantity AS DOUBLE) AS DECIMAL(38,12))) AS sxx,
               SUM(CAST(CAST(l_extendedprice AS DOUBLE) * CAST(l_extendedprice AS DOUBLE) AS DECIMAL(38,12))) AS syy,
               SUM(CAST(CAST(l_quantity AS DOUBLE) * CAST(l_extendedprice AS DOUBLE) AS DECIMAL(38,12))) AS sxy
        FROM lineitem
        WHERE l_quantity IS NOT NULL AND l_extendedprice IS NOT NULL
        GROUP BY l_linestatus
    )
    SELECT l_linestatus, n,
           CASE WHEN CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) > 0
                THEN (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                     / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) END AS slope,
           CASE WHEN CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) > 0
                THEN (CAST(sy AS DOUBLE)
                      - ((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                         / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)))
                        * CAST(sx AS DOUBLE))
                     / CAST(n AS DOUBLE) END AS intercept,
           CASE WHEN CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) > 0
                 AND CAST(n AS DOUBLE) * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) > 0
                THEN ((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                      / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)))
                     * ((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                        / (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))) END AS r2
    FROM m
    """,
    survey="ext: per-group simple OLS (slope/intercept/R²) with decimal-"
           "accumulated moments — exact/associative partial aggregation "
           "(F.corr's Welford-on-doubles is partial-order-dependent), "
           "coefficients assembled as fixed-order double expressions so "
           "the result is bit-identical across partitionings and engines; "
           "one groupBy, map-side combine",
)
def zz_group_regression_entry(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.profiling import group_regression

    li = _t(spark, sf_dir, "lineitem").select(
        "l_linestatus", "l_quantity", "l_extendedprice"
    )
    return group_regression(li, ["l_linestatus"], "l_quantity", "l_extendedprice")


@register(
    "zz_distinct_sketch_rollup",
    oracle=None,  # DataSketches HLL estimates have no DuckDB twin; the
                  # estimate-accuracy + deterministic-merge contracts are
                  # pytest-locked (tests/test_profiling.py)
    survey="ext: mergeable HLL distinct-count cube — per-group Apache "
           "DataSketches sketches built ONCE (one partial-agg shuffle), "
           "every coarser rollup answered by unioning the O(groups) "
           "sketch table without rescanning the fact; the 100 TB pattern "
           "for COUNT(DISTINCT) over arbitrary slices, incremental by "
           "per-batch sketch union",
)
def zz_distinct_sketch_rollup_entry(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.profiling import distinct_sketch_rollup, merge_distinct_sketches

    o = _t(spark, sf_dir, "orders").select(
        "o_orderstatus", F.year("o_orderdate").alias("o_year"), "o_custkey"
    )
    fine = distinct_sketch_rollup(o, ["o_orderstatus", "o_year"], "o_custkey")
    coarse = merge_distinct_sketches(fine, ["o_orderstatus"])
    return coarse.select("o_orderstatus", F.col("estimate").alias("approx_customers"))


@register(
    "zz_stat_chi_square",
    # both engines fold the R×C cell terms in sorted (a, b) order — a
    # deterministic sequential double sum (the float analog of the
    # decimal-accumulate pattern, valid because cells are few), so chi2
    # and Cramér's V hash-match bit-exactly
    oracle="""
    WITH c AS (
        SELECT o_orderstatus AS a, o_orderpriority AS b,
               CAST(COUNT(*) AS BIGINT) AS o
        FROM orders
        WHERE o_orderstatus IS NOT NULL AND o_orderpriority IS NOT NULL
        GROUP BY 1, 2
    ), rt AS (SELECT a, CAST(SUM(o) AS BIGINT) AS r FROM c GROUP BY 1
    ), ct AS (SELECT b, CAST(SUM(o) AS BIGINT) AS t FROM c GROUP BY 1
    ), nn AS (SELECT CAST(SUM(o) AS DOUBLE) AS n FROM c
    ), grid AS (
        SELECT rt.a, ct.b, rt.r, ct.t, CAST(COALESCE(c.o, 0) AS BIGINT) AS o
        FROM rt CROSS JOIN ct LEFT JOIN c ON c.a = rt.a AND c.b = ct.b
    ), t1 AS (
        SELECT a, b, CAST(o AS DOUBLE) AS od,
               (CAST(r AS DOUBLE) * CAST(t AS DOUBLE)) / n AS e
        FROM grid, nn
    ), cells AS (
        SELECT struct_pack(a := a, b := b,
                           term := (od - e) * (od - e) / e) AS cell
        FROM t1
    ), agg AS (
        SELECT list_reduce(list_transform(list_sort(list(cell)),
                                          x -> x['term']),
                           (acc, x) -> acc + x) AS chi2,
               COUNT(DISTINCT cell['a']) AS nr,
               COUNT(DISTINCT cell['b']) AS nc
        FROM cells
    )
    SELECT chi2,
           CAST((nr - 1) * (nc - 1) AS INT) AS dof,
           CAST((SELECT n FROM nn) AS BIGINT) AS n,
           sqrt(chi2 / ((SELECT n FROM nn) * LEAST(nr - 1, nc - 1)))
               AS cramers_v
    FROM agg
    """,
    survey="ext: Pearson chi-square independence test + Cramér's V over "
           "two categorical columns — ONE partial-agg pass over the fact "
           "builds the contingency counts; margins/grid are O(categories²) "
           "broadcast; the statistic folds cell terms in sorted order "
           "(deterministic sequential double sum) so the value is "
           "bit-identical across runs, partitionings, and engines",
)
def zz_stat_chi_square_entry(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.profiling import chi_square_independence

    return chi_square_independence(
        _t(spark, sf_dir, "orders"), "o_orderstatus", "o_orderpriority")


@register(
    "zz_topk_sketch",
    # capacity (m=64) exceeds every group's item cardinality here, so the
    # sketch is EXACT and a plain GROUP-BY/rank oracle can hash-check it
    # end to end (fine grain AND merged rollup); the truncation bounds /
    # Misra-Gries guarantee on over-capacity zipf data are pytest-locked
    # (tests/test_freqitems.py)
    oracle="""
    WITH f AS (
        SELECT o_orderstatus AS scope, o_orderpriority AS item, COUNT(*) AS c,
               SUM(COUNT(*)) OVER (PARTITION BY o_orderstatus) AS n_total
        FROM orders GROUP BY 1, 2
    ), g AS (
        SELECT 'ALL' AS scope, o_orderpriority AS item, COUNT(*) AS c,
               SUM(COUNT(*)) OVER () AS n_total
        FROM orders GROUP BY 2
    ), u AS (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY scope
                                     ORDER BY c DESC, item) AS rk
        FROM (SELECT * FROM f UNION ALL SELECT * FROM g)
    )
    SELECT scope, CAST(rk AS INT) AS rank, item,
           CAST(c AS BIGINT) AS count_lo, CAST(c AS BIGINT) AS count_hi,
           CAST(n_total AS BIGINT) AS n_total
    FROM u WHERE rk <= 5 ORDER BY scope, rank
    """,
    survey="ext: mergeable frequent-items (heavy-hitter) sketch cube — "
           "the top-k member of the sketch family (HLL distinct, t-digest "
           "quantiles): exact per-partition counts truncated to m items + "
           "tracked dropped mass, merged per group in ONE shuffle; any "
           "coarser top-k answers from the O(groups*m) summary with "
           "[count_lo, count_hi] bounds and the Misra-Gries presence "
           "guarantee",
)
def zz_topk_sketch_entry(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.freqitems import (
        merge_topk_sketches, sketch_topk, topk_sketch_rollup,
    )

    o = _t(spark, sf_dir, "orders").select("o_orderstatus", "o_orderpriority")
    fine = topk_sketch_rollup(o, ["o_orderstatus"], "o_orderpriority", m=64)
    merged = merge_topk_sketches(
        fine.withColumn("_all", F.lit("ALL")), ["_all"], m=64)
    per_flag = sketch_topk(fine, 5).select(
        F.col("o_orderstatus").alias("scope"), "rank", "item",
        "count_lo", "count_hi", "n_total")
    overall = sketch_topk(merged, 5).select(
        F.col("_all").alias("scope"), "rank", "item",
        "count_lo", "count_hi", "n_total")
    return per_flag.unionByName(overall).orderBy("scope", "rank")


@register(
    "graph_pagerank",
    # Three synchronous rounds in chained CTEs over the undirected
    # customer↔supplier bipartite graph. Integer micro-unit arithmetic
    # (floor division both engines) makes every round bit-exact — the
    # engine-parity trick that decimal sums play for aggregates, applied
    # to an ITERATIVE algorithm.
    oracle="""
    WITH raw AS (
        SELECT DISTINCT o_custkey AS s, l_suppkey + 1000000000 AS d
        FROM orders JOIN lineitem ON l_orderkey = o_orderkey
    ), e AS (
        SELECT s, d FROM raw UNION SELECT d, s FROM raw
    ), deg AS (
        SELECT s, COUNT(*) AS outdeg FROM e GROUP BY s
    ), nodes AS (
        SELECT DISTINCT s AS node FROM e
    ), r0 AS (
        SELECT node, CAST(1000000000000 AS BIGINT) AS r FROM nodes
    ), i1 AS (
        SELECT e.d AS node, SUM(r0.r // deg.outdeg) AS insum
        FROM e JOIN r0 ON e.s = r0.node JOIN deg ON e.s = deg.s GROUP BY e.d
    ), r1 AS (
        SELECT n.node, 150000000000 + (85 * COALESCE(i1.insum, 0)) // 100 AS r
        FROM nodes n LEFT JOIN i1 ON n.node = i1.node
    ), i2 AS (
        SELECT e.d AS node, SUM(r1.r // deg.outdeg) AS insum
        FROM e JOIN r1 ON e.s = r1.node JOIN deg ON e.s = deg.s GROUP BY e.d
    ), r2 AS (
        SELECT n.node, 150000000000 + (85 * COALESCE(i2.insum, 0)) // 100 AS r
        FROM nodes n LEFT JOIN i2 ON n.node = i2.node
    ), i3 AS (
        SELECT e.d AS node, SUM(r2.r // deg.outdeg) AS insum
        FROM e JOIN r2 ON e.s = r2.node JOIN deg ON e.s = deg.s GROUP BY e.d
    ), r3 AS (
        SELECT n.node, 150000000000 + (85 * COALESCE(i3.insum, 0)) // 100 AS r
        FROM nodes n LEFT JOIN i3 ON n.node = i3.node
    )
    SELECT node, CAST(r AS BIGINT) AS rank_units FROM r3
    ORDER BY rank_units DESC, node LIMIT 20
    """,
    survey="ext: integer-scaled PageRank (Page et al.) — per round one "
           "equi-join (edges cached once with degrees) + one partial-agg "
           "groupBy; only the O(nodes) rank frame moves between rounds; "
           "64-bit micro-unit floor arithmetic is bit-identical across "
           "partitionings AND engines, proven by a 3-round chained-CTE "
           "oracle on the customer↔supplier bipartite graph",
)
def zz_graph_pagerank_entry(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.graph import pagerank

    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    edges = (
        o.join(li, o["o_orderkey"] == li["l_orderkey"])
        .select(
            F.col("o_custkey").alias("src"),
            (F.col("l_suppkey") + F.lit(1_000_000_000)).alias("dst"),
        )
    )
    pr = pagerank(edges, iters=3, undirected=True)
    return pr.orderBy(F.desc("rank_units"), F.asc("node")).limit(20)


@register(
    "zz_graph_khop",
    oracle="""
    WITH raw AS (
        SELECT DISTINCT o_custkey AS s, l_suppkey + 1000000000 AS d
        FROM orders JOIN lineitem ON l_orderkey = o_orderkey
    ), e AS (
        SELECT s, d FROM raw UNION SELECT d, s FROM raw
    ), seed AS (
        SELECT DISTINCT s AS node FROM raw ORDER BY s LIMIT 1
    ), h1 AS (
        SELECT DISTINCT e.d AS node FROM e JOIN seed ON e.s = seed.node
        WHERE e.d NOT IN (SELECT node FROM seed)
    ), h2 AS (
        SELECT DISTINCT e.d AS node FROM e JOIN h1 ON e.s = h1.node
        WHERE e.d NOT IN (SELECT node FROM seed)
          AND e.d NOT IN (SELECT node FROM h1)
    ), h3 AS (
        SELECT DISTINCT e.d AS node FROM e JOIN h2 ON e.s = h2.node
        WHERE e.d NOT IN (SELECT node FROM seed)
          AND e.d NOT IN (SELECT node FROM h1)
          AND e.d NOT IN (SELECT node FROM h2)
    )
    SELECT node, CAST(0 AS INT) AS hop FROM seed
    UNION ALL SELECT node, 1 FROM h1
    UNION ALL SELECT node, 2 FROM h2
    UNION ALL SELECT node, 3 FROM h3
    """,
    survey="ext: k-hop BFS neighborhoods (blast radius / reachability — "
           "what does this node's outage touch within k tiers): per hop "
           "one equi-join expanding the frontier rim against the cached "
           "hash-partitioned edges + one anti-join against the reached "
           "set; pure set algebra, so the entry is chained-CTE "
           "oracle-EXACT. operators/graph.py::k_hop_neighbors",
)
def zz_graph_khop_entry(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.graph import k_hop_neighbors

    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    raw = (
        o.join(li, o["o_orderkey"] == li["l_orderkey"])
        .select(
            F.col("o_custkey").alias("src"),
            (F.col("l_suppkey") + F.lit(1_000_000_000)).alias("dst"),
        )
    )
    seeds = [r["src"] for r in
             raw.select("src").distinct().orderBy("src").limit(1).collect()]
    return k_hop_neighbors(raw, seeds, k=3, undirected=True)


@register(
    "graph_ppr",
    # Personalized PageRank: teleport mass restarts at the two smallest
    # customer nodes; integer micro-unit floor arithmetic keeps every
    # round bit-exact across engines (the graph_pagerank parity trick)
    oracle="""
    WITH raw AS (
        SELECT DISTINCT o_custkey AS s, l_suppkey + 1000000000 AS d
        FROM orders JOIN lineitem ON l_orderkey = o_orderkey
    ), e AS (
        SELECT s, d FROM raw UNION SELECT d, s FROM raw
    ), deg AS (
        SELECT s, COUNT(*) AS outdeg FROM e GROUP BY s
    ), nodes AS (
        SELECT DISTINCT s AS node FROM e
    ), seeds AS (
        SELECT DISTINCT s AS node FROM raw ORDER BY s LIMIT 2
    ), r0 AS (
        SELECT n.node,
               CASE WHEN sd.node IS NOT NULL
                    THEN CAST(1000000000000 AS BIGINT)
                    ELSE CAST(0 AS BIGINT) END AS r
        FROM nodes n LEFT JOIN seeds sd ON n.node = sd.node
    ), i1 AS (
        SELECT e.d AS node, SUM(r0.r // deg.outdeg) AS insum
        FROM e JOIN r0 ON e.s = r0.node JOIN deg ON e.s = deg.s GROUP BY e.d
    ), r1 AS (
        SELECT n.node,
               (CASE WHEN sd.node IS NOT NULL THEN 150000000000 ELSE 0 END)
               + (85 * COALESCE(i1.insum, 0)) // 100 AS r
        FROM nodes n LEFT JOIN seeds sd ON n.node = sd.node
                     LEFT JOIN i1 ON n.node = i1.node
    ), i2 AS (
        SELECT e.d AS node, SUM(r1.r // deg.outdeg) AS insum
        FROM e JOIN r1 ON e.s = r1.node JOIN deg ON e.s = deg.s GROUP BY e.d
    ), r2 AS (
        SELECT n.node,
               (CASE WHEN sd.node IS NOT NULL THEN 150000000000 ELSE 0 END)
               + (85 * COALESCE(i2.insum, 0)) // 100 AS r
        FROM nodes n LEFT JOIN seeds sd ON n.node = sd.node
                     LEFT JOIN i2 ON n.node = i2.node
    ), i3 AS (
        SELECT e.d AS node, SUM(r2.r // deg.outdeg) AS insum
        FROM e JOIN r2 ON e.s = r2.node JOIN deg ON e.s = deg.s GROUP BY e.d
    ), r3 AS (
        SELECT n.node,
               (CASE WHEN sd.node IS NOT NULL THEN 150000000000 ELSE 0 END)
               + (85 * COALESCE(i3.insum, 0)) // 100 AS r
        FROM nodes n LEFT JOIN seeds sd ON n.node = sd.node
                     LEFT JOIN i3 ON n.node = i3.node
    )
    SELECT node, CAST(r AS BIGINT) AS rank_units FROM r3
    WHERE r > 0 ORDER BY rank_units DESC, node LIMIT 20
    """,
    survey="ext: personalized PageRank — teleport mass restarts at the "
           "seed set, so ranks measure proximity TO the seeds (the "
           "recommendation / similar-entities variant); same per-round "
           "shape as pagerank (cached hash-partitioned edges, O(nodes) "
           "rank frame moves) and the same integer micro-unit parity, "
           "proven by a 3-round chained-CTE oracle with dynamic seeds",
)
def graph_ppr_entry(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.graph import personalized_pagerank

    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    raw = (
        o.join(li, o["o_orderkey"] == li["l_orderkey"])
        .select(
            F.col("o_custkey").alias("src"),
            (F.col("l_suppkey") + F.lit(1_000_000_000)).alias("dst"),
        )
    )
    # bounded driver collect: the 2-node seed set (the query input)
    seeds = [r["src"] for r in
             raw.select("src").distinct().orderBy("src").limit(2).collect()]
    pr = personalized_pagerank(raw, seeds, iters=3, undirected=True)
    return (
        pr.filter(F.col("rank_units") > 0)
        .orderBy(F.desc("rank_units"), F.asc("node")).limit(20)
    )


@register(
    "graph_communities",
    # Three synchronous rounds in chained CTEs; min-label tie-break makes
    # every round an integer argmax — bit-exact across engines, the same
    # parity trick as graph_pagerank.
    oracle="""
    WITH raw AS (
        SELECT DISTINCT o_custkey AS s, l_suppkey + 1000000000 AS d
        FROM orders JOIN lineitem ON l_orderkey = o_orderkey
    ), e AS (
        SELECT s, d FROM raw UNION SELECT d, s FROM raw
    ), nodes AS (
        SELECT DISTINCT s AS node FROM e
    ), l0 AS (
        SELECT node, CAST(node AS BIGINT) AS label FROM nodes
    ), c1 AS (
        SELECT e.d AS node, l0.label, COUNT(*) AS cnt
        FROM e JOIN l0 ON e.s = l0.node GROUP BY 1, 2
    ), l1 AS (
        SELECT node, label FROM c1
        QUALIFY ROW_NUMBER() OVER (
            PARTITION BY node ORDER BY cnt DESC, label ASC) = 1
    ), c2 AS (
        SELECT e.d AS node, l1.label, COUNT(*) AS cnt
        FROM e JOIN l1 ON e.s = l1.node GROUP BY 1, 2
    ), l2 AS (
        SELECT node, label FROM c2
        QUALIFY ROW_NUMBER() OVER (
            PARTITION BY node ORDER BY cnt DESC, label ASC) = 1
    ), c3 AS (
        SELECT e.d AS node, l2.label, COUNT(*) AS cnt
        FROM e JOIN l2 ON e.s = l2.node GROUP BY 1, 2
    ), l3 AS (
        SELECT node, label FROM c3
        QUALIFY ROW_NUMBER() OVER (
            PARTITION BY node ORDER BY cnt DESC, label ASC) = 1
    )
    SELECT CAST(label AS BIGINT) AS community,
           CAST(COUNT(*) AS BIGINT) AS size
    FROM l3 GROUP BY label
    ORDER BY size DESC, community LIMIT 20
    """,
    survey="ext: label-propagation community detection (Raghavan et al.) "
           "— synchronous rounds with min-label tie-break: per round one "
           "equi-join moving the O(nodes) label frame against the cached "
           "hash-partitioned edges, one partial-agg (node,label) count, "
           "one argmax AGGREGATE (max(struct(cnt,−label)) — no window); "
           "integer argmax is bit-exact across partitionings AND engines, "
           "proven by a 3-round chained-CTE oracle — the 4th member of "
           "the graph tier (pagerank/triangles/k-core/LPA)",
)
def graph_communities_entry(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.graph import label_propagation

    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    edges = (
        o.join(li, o["o_orderkey"] == li["l_orderkey"])
        .select(
            F.col("o_custkey").alias("src"),
            (F.col("l_suppkey") + F.lit(1_000_000_000)).alias("dst"),
        )
    )
    lp = label_propagation(edges, iters=3, undirected=True)
    return (
        lp.groupBy(F.col("label").alias("community"))
        .agg(F.count(F.lit(1)).alias("size"))
        .orderBy(F.desc("size"), F.asc("community"))
        .limit(20)
    )


@register(
    "zz_incremental_agg",
    # the oracle is ONE direct GROUP BY over all rows — the entry builds
    # the same answer from two per-batch partial states merged together,
    # so a hash match proves the maintenance identity
    # merge(delta(A), delta(B)) == agg(A ∪ B) bit-exactly
    oracle="""
    SELECT o_orderstatus,
           CAST(year(o_orderdate) AS INT) AS order_year,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(COUNT(o_totalprice) AS BIGINT) AS n_values,
           CAST(MIN(o_totalprice) AS DOUBLE) AS min_val,
           CAST(MAX(o_totalprice) AS DOUBLE) AS max_val,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(27,6))) AS DOUBLE) AS sum_val,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(27,6))) AS DOUBLE)
               / COUNT(o_totalprice) AS avg_val
    FROM orders GROUP BY 1, 2
    """,
    survey="ext: incremental aggregate maintenance (materialized-view "
           "pattern) — per-batch O(groups) partial states (count/sum-in-"
           "decimal/min/max) merged by a groupBy over STATE rows; a "
           "continuously-loaded fact answers dashboard aggregates without "
           "rescans, and the decimal accumulation makes the maintained "
           "answer bit-identical to a one-shot GROUP BY in any batch "
           "order or engine",
)
def zz_incremental_agg_entry(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.ivm import agg_delta, agg_readout, merge_agg_state

    keys = ["o_orderstatus", "order_year"]
    o = _t(spark, sf_dir, "orders").select(
        "o_orderstatus",
        F.year("o_orderdate").cast("int").alias("order_year"),
        "o_totalprice", "o_orderkey",
    )
    batch0 = o.filter(F.col("o_orderkey") % 2 == 0)
    batch1 = o.filter(F.col("o_orderkey") % 2 == 1)
    state = merge_agg_state(
        agg_delta(batch0, keys, "o_totalprice"),
        agg_delta(batch1, keys, "o_totalprice"),
        group_cols=keys,
    )
    return agg_readout(state)


@register(
    "zz_quantile_sketch_cube",
    oracle=None,  # t-digest estimates have no DuckDB twin; the accuracy,
                  # merge-vs-rebuild, and deterministic-merge contracts
                  # are pytest-locked (tests/test_profiling.py) — the
                  # HLL entry's verification pattern
    survey="ext: mergeable t-digest quantile cube — per-group digests "
           "built ONCE via mapInPandas partial digests (user-space "
           "map-side combine: the fact's values never shuffle, only "
           "O(delta) centroids per partition-group do) + ONE merge "
           "shuffle; every coarser percentile question answers from the "
           "O(groups) digest table without rescanning the fact — the "
           "percentile twin of the HLL distinct cube",
)
def zz_quantile_sketch_cube_entry(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.quantiles import (
        merge_quantile_sketches, quantile_sketch_rollup, sketch_quantiles,
    )

    o = _t(spark, sf_dir, "orders").select(
        "o_orderstatus", F.year("o_orderdate").alias("o_year"), "o_totalprice"
    )
    fine = quantile_sketch_rollup(o, ["o_orderstatus", "o_year"], "o_totalprice")
    coarse = merge_quantile_sketches(fine, ["o_orderstatus"])
    est = sketch_quantiles(coarse, [0.5, 0.95])
    return est.select(
        "o_orderstatus", "n",
        F.col("vmin").alias("min_price"), F.col("vmax").alias("max_price"),
        F.round("q_5", 2).alias("approx_p50"),
        F.round("q_95", 2).alias("approx_p95"),
    )


@register(
    "zz_summary_cube",
    oracle=None,  # the distinct sketch is deterministic-but-non-SQL
                  # (xxhash64 HLL registers); the single-Exchange plan,
                  # per-family accuracy, merge-vs-rebuild, register
                  # bit-identity, and streaming-twin contracts are
                  # pytest-locked (tests/test_summary.py)
    survey="ext: UNIFIED sketch cube — t-digest quantiles + Misra-Gries "
           "top-k + HLL distinct materialized per group in ONE scan of "
           "the fact (one mapInPandas partial pass carrying every "
           "family's partials, ONE hash Exchange, one grouped merge — "
           "plan-gated), vs three separate scans for the per-sketch "
           "rollups; registers hash JVM-side (xxhash64) and max-merge, "
           "so the distinct state is bit-identical under any "
           "partitioning; streaming maintenance via "
           "streaming.aggstate.stream_summary_state",
)
def zz_summary_cube_entry(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.summary import merge_summary_cubes, summary_cube, summary_readout

    spec = [
        ("chars", "quantile", "n_chars", 200),
        ("src", "topk", "source", 16),
        ("docs", "distinct", "doc_id", 12),
        ("docset", "kmv", "doc_id", 1024),
    ]
    d = load_table(spark, sf_dir, "documents")
    fine = summary_cube(d, ["lang", "source"], spec)
    # the dashboard question answers from the cube, not the fact:
    # roll the (lang, source) grain up to lang and read all three
    coarse = merge_summary_cubes(fine, ["lang"], spec)
    out = summary_readout(coarse, spec, quantiles=(0.5, 0.95), topk=3)
    return out.select(
        "lang", F.col("chars_n").alias("n_values"),
        F.round("chars_q5", 2).alias("approx_p50_chars"),
        F.round("chars_q95", 2).alias("approx_p95_chars"),
        F.col("src_top").alias("top_sources"),
        F.col("src_ntotal").alias("n_docs"),
        F.round("docs_distinct", 0).alias("approx_distinct_docs"),
        F.round("docset_distinct", 0).alias("kmv_distinct_docs"),
    ).orderBy("lang")


@register(
    "zz_sketch_percentile_of",
    oracle=None,  # digest estimates have no SQL twin; the inverse-map,
                  # envelope, and clamp contracts are pytest-locked
                  # (tests/test_profiling.py::test_sketch_percentile_of_*)
    survey="ext: inverse quantile lookup off the t-digest cube — score "
           "incoming values' percentile within their group's STORED "
           "digest (no history rescan): the O(groups) digest table "
           "broadcasts into the join, estimation is one vectorized "
           "Arrow pass, the scored frame never shuffles; exact inverse "
           "of sketch_quantiles on the same interpolation curve. "
           "operators/quantiles.py::sketch_percentile_of",
)
def zz_sketch_percentile_of_entry(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.quantiles import quantile_sketch_rollup, sketch_percentile_of

    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderstatus",
                                           "o_totalprice")
    cube = quantile_sketch_rollup(o, ["o_orderstatus"], "o_totalprice")
    probes = o.filter(F.col("o_orderkey") % 100 == 0)
    return sketch_percentile_of(
        cube, probes, ["o_orderstatus"], "o_totalprice"
    ).select("o_orderkey", "o_orderstatus", "o_totalprice",
             F.round("pct_est", 6).alias("pct_est"))


@register(
    "stat_rank_statistics",
    oracle="""
    SELECT c_mktsegment AS segment, c_acctbal, c_custkey,
           PERCENT_RANK() OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal)
               AS percent_rank,
           CUME_DIST() OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal)
               AS cume_dist
    FROM customer
    """,
    survey="ext: per-row PERCENT_RANK/CUME_DIST via VALUE-level rewrite — "
           "per-(partition,value) counts + a cumulative window over "
           "DISTINCT VALUES + equi-join back: exactly the SQL window "
           "semantics (both stats are tie-invariant) with O(distinct "
           "values) window state instead of O(rows) — the skewed-window "
           "fix for rank stats on a 5-partition 100 TB fact",
)
def zz_rank_statistics_entry(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.profiling import rank_statistics

    c = _t(spark, sf_dir, "customer").select(
        F.col("c_mktsegment").alias("segment"), "c_acctbal", "c_custkey"
    )
    return rank_statistics(
        c, ["segment"], "c_acctbal", keep_cols=["c_custkey"]
    )


@register(
    "zz_t_gap_interpolate",
    oracle="""
    WITH d AS (
        SELECT user_id % 100 AS u, CAST(ts AS DATE) AS day,
               CAST(SUM(CAST(value AS DECIMAL(27,6))) AS DOUBLE) AS daily_value
        FROM events WHERE event_type = 'purchase' GROUP BY 1, 2
    ), b AS (
        SELECT u, MIN(day) AS lo, MAX(day) AS hi FROM d GROUP BY u
    ), cal AS (
        SELECT u, lo + CAST(gs AS INT) AS day
        FROM b, generate_series(0, 100000) t(gs)
        WHERE lo + CAST(gs AS INT) <= hi
    ), j AS (
        SELECT cal.u, cal.day, d.daily_value AS v
        FROM cal LEFT JOIN d ON cal.u = d.u AND cal.day = d.day
    ), w AS (
        SELECT u, day, v,
            last_value(v IGNORE NULLS) OVER (PARTITION BY u ORDER BY day
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pv,
            last_value(CASE WHEN v IS NOT NULL THEN day END IGNORE NULLS)
                OVER (PARTITION BY u ORDER BY day
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pt,
            first_value(v IGNORE NULLS) OVER (PARTITION BY u ORDER BY day
                ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv,
            first_value(CASE WHEN v IS NOT NULL THEN day END IGNORE NULLS)
                OVER (PARTITION BY u ORDER BY day
                ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nt
        FROM j
    )
    SELECT u, day,
           CASE WHEN v IS NOT NULL THEN v
                ELSE pv + (nv - pv)
                     * (CAST(date_diff('day', pt, day) AS DOUBLE)
                        / CAST(date_diff('day', pt, nt) AS DOUBLE)) END
               AS daily_value,
           v IS NULL AS interpolated
    FROM w
    """,
    survey="ext: time-series gap fill + linear interpolation (the "
           "hypertable interpolate() shape, extending U3's densify from "
           "counts to values) — per-key calendar generated where the key "
           "lives (bounds agg + map-only sequence explode, no global "
           "calendar cross join), bracketing neighbors from two "
           "PARTITIONED ignore-nulls window passes, fixed-order double "
           "interpolation arithmetic (bit-equal to the DuckDB oracle)",
)
def zz_ts_interpolate_entry(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.timeseries import gap_fill_interpolate

    ev = _t(spark, sf_dir, "events").filter(
        F.col("event_type") == "purchase"
    ).select(
        (F.col("user_id") % 100).alias("u"),
        F.to_date("ts").alias("day"),
        "value",
    )
    daily = ev.groupBy("u", "day").agg(_dsum(F.col("value")).alias("daily_value"))
    return gap_fill_interpolate(daily, ["u"], "day", "daily_value")


@register(
    "zz_ts_ewma",
    # bit-exact fold parity: both engines run the SAME left-to-right
    # sequential recursion alpha*x + (1-alpha)*acc in doubles over the
    # day-ordered series (Spark aggregate() over sort_array∘collect_list;
    # DuckDB list_reduce over list(… ORDER BY day), whose seed is likewise
    # the first element) — no float-window trickery, no rounding needed
    oracle="""
    WITH d AS (
        SELECT user_id % 50 AS u, event_type, CAST(ts AS DATE) AS day,
               CAST(SUM(CAST(value AS DECIMAL(27,6))) AS DOUBLE) AS dval
        FROM events GROUP BY 1, 2, 3
    )
    SELECT u, event_type,
           CAST(COUNT(*) AS BIGINT) AS n_points,
           MAX(day) AS last_day,
           list_reduce(list(dval ORDER BY day),
                       (acc, x) -> CAST(0.2 AS DOUBLE) * x
                                   + CAST(0.8 AS DOUBLE) * acc) AS ewma
    FROM d GROUP BY u, event_type
    """,
    survey="ext: per-key EWMA smoothing (timeseries.ewma) — ONE shuffle to "
           "the key grain, codegen'd aggregate() fold where the key lives "
           "(O(rows-per-key) in one task, the honest cost of an "
           "order-dependent recursion; keys parallelize); window-sum "
           "formulations overflow on long series, the fold never leaves "
           "[min,max]",
)
def zz_ts_ewma_entry(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.timeseries import ewma

    ev = _t(spark, sf_dir, "events").select(
        (F.col("user_id") % 50).alias("u"),
        "event_type",
        F.to_date("ts").alias("day"),
        "value",
    )
    daily = ev.groupBy("u", "event_type", "day").agg(
        _dsum(F.col("value")).alias("dval")
    )
    return ewma(daily, ["u", "event_type"], "day", "dval", alpha=0.2)


def _copurchase_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Part co-occurrence edges (src, dst) within orders — the shared
    edge source for the graph entries. ONE partial-agg shuffle to the
    order grain + map-side pair explosion (bounded by per-order basket
    size), not a fact self-join: the self-join shuffles the fact twice
    and was measured at 4.2s of the triangles entry's 6s at sf0.1."""
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    # repartition BY THE GROUP KEY before the set-build: the single-row-
    # group parquet scan otherwise feeds the ObjectHashAggregate partial
    # serially from one task (guide §6 scan-parallelism floor); keyed
    # repartition keeps it to ONE exchange (the groupBy reuses the
    # partitioning) while the set-build runs on every core
    baskets = li.repartition("l_orderkey").groupBy("l_orderkey").agg(
        F.sort_array(F.collect_set("l_partkey")).alias("ps")
    )
    return baskets.select(
        F.explode(
            F.flatten(F.transform(
                "ps",
                lambda x, i: F.transform(
                    F.slice(F.col("ps"), i + 2,
                            F.greatest(F.size("ps") - i - 1, F.lit(0))),
                    lambda y: F.struct(x.alias("src"), y.alias("dst")),
                ),
            ))
        ).alias("p")
    ).select("p.src", "p.dst")


@register(
    "zz_graph_triangles",
    # exact enumeration with total-order orientation a<b<c — every
    # triangle found exactly once; pure integer counting, bit-exact
    oracle="""
    WITH raw AS (
        SELECT DISTINCT l1.l_partkey AS a, l2.l_partkey AS b
        FROM lineitem l1 JOIN lineitem l2
          ON l1.l_orderkey = l2.l_orderkey
         AND l1.l_partkey < l2.l_partkey
    ), w AS (
        SELECT e1.a AS a, e1.b AS b, e2.b AS c
        FROM raw e1 JOIN raw e2 ON e1.b = e2.a
    ), t AS (
        SELECT w.a, w.b, w.c
        FROM w JOIN raw e3 ON w.a = e3.a AND w.c = e3.b
    ), x AS (
        SELECT a AS node FROM t
        UNION ALL SELECT b FROM t
        UNION ALL SELECT c FROM t
    )
    SELECT node, CAST(COUNT(*) AS BIGINT) AS n_triangles
    FROM x GROUP BY node
    """,
    survey="ext: exact triangle counting (graph.triangle_count) over the "
           "part co-purchase graph — canonical a<b orientation bounds "
           "wedge enumeration by oriented out-degrees (the standard "
           "work-bound), two equi-joins (AQE skew-split covers hub "
           "vertices), integer counts; completes the graph tier next to "
           "connected components (dedup) and PageRank",
)
def zz_graph_triangles_entry(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.graph import triangle_count

    return triangle_count(_copurchase_pairs(spark, sf_dir))


@register(
    "zz_funnel_stages",
    # strict-after ordering (ts > previous stage's min) is deterministic
    # under ties; averages are exact integer microsecond sums divided
    # once — identical expression structure both engines
    oracle="""
    WITH s0 AS (
        SELECT user_id AS u, MIN(ts) AS t
        FROM events WHERE event_type = 'view' GROUP BY 1
    ), s1 AS (
        SELECT e.user_id AS u, MIN(e.ts) AS t, MIN(s0.t) AS pt
        FROM events e JOIN s0 ON e.user_id = s0.u
        WHERE e.event_type = 'click' AND e.ts > s0.t GROUP BY 1
    ), s2 AS (
        SELECT e.user_id AS u, MIN(e.ts) AS t, MIN(s1.t) AS pt
        FROM events e JOIN s1 ON e.user_id = s1.u
        WHERE e.event_type = 'purchase' AND e.ts > s1.t GROUP BY 1
    )
    SELECT CAST(0 AS INT) AS stage_idx, 'view' AS stage,
           CAST(COUNT(*) AS BIGINT) AS n_users,
           CAST(0 AS DOUBLE) AS avg_step_seconds
    FROM s0
    UNION ALL
    SELECT CAST(1 AS INT), 'click', CAST(COUNT(*) AS BIGINT),
           CAST(SUM(epoch_us(t) - epoch_us(pt)) AS DOUBLE) / COUNT(*)
               / CAST(1000000 AS DOUBLE)
    FROM s1
    UNION ALL
    SELECT CAST(2 AS INT), 'purchase', CAST(COUNT(*) AS BIGINT),
           CAST(SUM(epoch_us(t) - epoch_us(pt)) AS DOUBLE) / COUNT(*)
               / CAST(1000000 AS DOUBLE)
    FROM s2
    """,
    survey="ext: ordered funnel analysis (timeseries.funnel) — per stage "
           "one co-partitioned equi-join on the user key against the "
           "previous stage's per-user mins (tiny; AQE broadcasts) plus a "
           "partial-aggregated min, stage filter pushed to the scan; no "
           "windows, no per-user arrays — the product-analytics staple "
           "over the events stream",
)
def zz_funnel_stages_entry(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.timeseries import funnel

    ev = _t(spark, sf_dir, "events")
    return funnel(ev, "user_id", "ts", "event_type",
                  ["view", "click", "purchase"])


@register(
    "zz_ts_anomaly",
    # exact decimal Σx/Σx² window moments assembled into doubles in ONE
    # fixed expression order on both engines — the profile_columns
    # decimal-moment pattern inside a bounded window; integer daily
    # counts enter the decimal cast exactly, so no rounding ambiguity
    oracle="""
    WITH d AS (
        SELECT user_id % 20 AS u, CAST(ts AS DATE) AS day,
               CAST(COUNT(*) AS BIGINT) AS n_events
        FROM events GROUP BY 1, 2
    ), w AS (
        SELECT u, day, n_events,
               COUNT(n_events) OVER win AS n,
               SUM(CAST(n_events AS DECIMAL(27,6))) OVER win AS s,
               SUM(CAST(n_events AS DECIMAL(27,6))
                   * CAST(n_events AS DECIMAL(27,6))) OVER win AS s2
        FROM d
        WINDOW win AS (PARTITION BY u ORDER BY day
                       ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING)
    ), v AS (
        SELECT u, day, n_events, n,
               CAST(s AS DOUBLE) / n AS mean,
               (CAST(CAST(s2 AS VARCHAR) AS DOUBLE)
                - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / n) / (n - 1)
                   AS var
        FROM w
    )
    SELECT u, day, n_events,
           CAST(n AS BIGINT) AS baseline_n,
           CASE WHEN n >= 7 AND var > 0
                THEN (CAST(n_events AS DOUBLE) - mean) / sqrt(var) END
               AS zscore,
           COALESCE(n >= 7 AND var > 0
                    AND abs((CAST(n_events AS DOUBLE) - mean) / sqrt(var))
                        > 2.5,
                    false) AS is_anomaly
    FROM v
    """,
    survey="ext: rolling-window anomaly scores (timeseries.rolling_zscore) "
           "— each point vs the mean/std of the 7 points STRICTLY before "
           "it (self-excluded baseline), two decimal window sums over ONE "
           "partitioned bounded window, state O(lookback) per key; "
           "zscore withheld until the baseline is full (partial baselines "
           "alarm on noise)",
)
def zz_ts_anomaly_entry(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.timeseries import rolling_zscore

    daily = (
        _t(spark, sf_dir, "events")
        .select((F.col("user_id") % 20).alias("u"), F.to_date("ts").alias("day"))
        .groupBy("u", "day")
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
    return rolling_zscore(daily, ["u"], "day", "n_events",
                          lookback=7, z_threshold=2.5)


@register(
    "ts_holt_winters",
    # The triple-smoothing fold unrolled as a RECURSIVE CTE carrying the
    # period-7 seasonal profile as a DOUBLE[] state column (the CUSUM
    # pattern extended with list state). Every double op is written in
    # the exact tree Spark's struct-fold evaluates — a*(x−sm)+(1−a)(l+b)
    # etc. with (1−β)=(1−γ)=0.7 bit-exact as a literal — so level,
    # trend, and the h=1 forecast hash-match with NO rounding.
    oracle="""
    WITH RECURSIVE d AS (
        SELECT user_id % 10 AS u, CAST(ts AS DATE) AS day,
               CAST(SUM(CAST(value AS DECIMAL(27,6))) AS DOUBLE) AS dval
        FROM events GROUP BY 1, 2
    ), s AS (
        SELECT u, CAST(COUNT(*) AS BIGINT) AS n_points,
               list(dval ORDER BY day) AS arr
        FROM d GROUP BY u HAVING COUNT(*) > 7
    ), seed AS (
        SELECT u, n_points, arr,
               (arr[1] + arr[2] + arr[3] + arr[4] + arr[5] + arr[6]
                + arr[7]) / 7.0 AS l0
        FROM s
    ), r AS (
        SELECT u, n_points, arr, 7 AS i, l0 AS l,
               CAST(0 AS DOUBLE) AS b,
               list_transform(generate_series(1, 7), j -> arr[j] - l0) AS se,
               0 AS pos
        FROM seed
        UNION ALL
        SELECT u, n_points, arr, i2 AS i, l_new AS l,
               0.3 * (l_new - l_old) + 0.7 * b_old AS b,
               list_transform(generate_series(1, 7),
                   j -> CASE WHEN j = pos_old + 1
                        THEN 0.3 * (x - l_new) + 0.7 * sm
                        ELSE se_old[j] END) AS se,
               (pos_old + 1) % 7 AS pos
        FROM (
            SELECT u, n_points, arr, i + 1 AS i2,
                   arr[i + 1] AS x, se[pos + 1] AS sm,
                   0.5 * (arr[i + 1] - se[pos + 1]) + 0.5 * (l + b) AS l_new,
                   l AS l_old, b AS b_old, se AS se_old, pos AS pos_old
            FROM r WHERE i < n_points
        )
    )
    SELECT u, n_points, l AS level, b AS trend,
           l + 1.0 * b + se[pos + 1] AS forecast_1
    FROM r WHERE i = n_points
    """,
    survey="ext: additive Holt-Winters triple smoothing — level + trend "
           "+ period-m seasonal profile folded per key via a struct "
           "accumulator carrying the seasonal array (one shuffle, the "
           "ewma/holt/cusum sequential-fold pattern), standard "
           "first-season seeding, h-step forecast off the right seasonal "
           "slot; bit-exact recursive-CTE oracle with DOUBLE[] seasonal "
           "state. operators/timeseries.py::holt_winters_additive",
)
def ts_holt_winters_entry(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.timeseries import holt_winters_additive

    ev = _t(spark, sf_dir, "events")
    d = ev.groupBy(
        (F.col("user_id") % 10).alias("u"), F.to_date("ts").alias("day"),
    ).agg(_dsum(F.col("value")).alias("dval"))
    r = holt_winters_additive(d, ["u"], "day", "dval", period=7)
    return r.select(
        "u", "n_points", "level", "trend",
        F.col("forecast_h").alias("forecast_1"),
    ).orderBy("u")


@register(
    "stat_cusum",
    # the CUSUM fold unrolled as a RECURSIVE CTE (the holt_smoothing
    # pattern — every double op explicit, identical left-to-right
    # sequence, so the five-field state hash-matches bit-exactly)
    oracle="""
    WITH RECURSIVE d AS (
        SELECT user_id % 50 AS u, event_type, CAST(ts AS DATE) AS day,
               CAST(SUM(CAST(value AS DECIMAL(27,6))) AS DOUBLE) AS dval
        FROM events GROUP BY 1, 2, 3
    ), s AS (
        SELECT u, event_type,
               CAST(COUNT(*) AS BIGINT) AS n_points,
               list(dval ORDER BY day) AS arr,
               list(day ORDER BY day) AS days
        FROM d GROUP BY u, event_type
    ), r AS (
        SELECT u, event_type, 0 AS i,
               CAST(0 AS DOUBLE) AS hi, CAST(0 AS DOUBLE) AS lo,
               CAST(0 AS BIGINT) AS na, CAST(NULL AS BIGINT) AS fi,
               CAST(0 AS DOUBLE) AS mx, len(arr) AS n, arr
        FROM s
        UNION ALL
        SELECT u, event_type, i + 1,
               CASE WHEN GREATEST(CAST(0 AS DOUBLE), hi + arr[i + 1] - 100.0 - 10.0) > 300.0
                    THEN CAST(0 AS DOUBLE)
                    ELSE GREATEST(CAST(0 AS DOUBLE), hi + arr[i + 1] - 100.0 - 10.0) END,
               CASE WHEN GREATEST(CAST(0 AS DOUBLE), lo + 100.0 - arr[i + 1] - 10.0) > 300.0
                    THEN CAST(0 AS DOUBLE)
                    ELSE GREATEST(CAST(0 AS DOUBLE), lo + 100.0 - arr[i + 1] - 10.0) END,
               na + CAST(GREATEST(CAST(0 AS DOUBLE), hi + arr[i + 1] - 100.0 - 10.0) > 300.0
                         OR GREATEST(CAST(0 AS DOUBLE), lo + 100.0 - arr[i + 1] - 10.0) > 300.0
                         AS BIGINT),
               COALESCE(fi, CASE WHEN
                   GREATEST(CAST(0 AS DOUBLE), hi + arr[i + 1] - 100.0 - 10.0) > 300.0
                   OR GREATEST(CAST(0 AS DOUBLE), lo + 100.0 - arr[i + 1] - 10.0) > 300.0
                   THEN CAST(i + 1 AS BIGINT) END),
               GREATEST(mx,
                        GREATEST(CAST(0 AS DOUBLE), hi + arr[i + 1] - 100.0 - 10.0),
                        GREATEST(CAST(0 AS DOUBLE), lo + 100.0 - arr[i + 1] - 10.0)),
               n, arr
        FROM r WHERE i < n
    )
    SELECT s.u, s.event_type, s.n_points, r.na AS n_alarms,
           COALESCE(CAST(s.days[CAST(r.fi AS INT)] AS VARCHAR), '')
               AS first_alarm_day,
           r.mx AS max_cusum
    FROM s JOIN r ON s.u = r.u AND s.event_type = r.event_type
                 AND r.i = r.n
    """,
    survey="ext: two-sided CUSUM change detection (Page 1954) — the "
           "drift alarm EWMA/zscore don't give: cumulative deviations "
           "from a target with slack, alarm + reset past the threshold; "
           "struct-state left fold per key (one shuffle, the ewma/holt "
           "engine-parity pattern), proven bit-exact vs a recursive-CTE "
           "oracle. operators/timeseries.py::cusum_alarms",
)
def stat_cusum_entry(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.timeseries import cusum_alarms

    ev = _t(spark, sf_dir, "events")
    d = ev.groupBy(
        (F.col("user_id") % 50).alias("u"), "event_type",
        F.to_date("ts").alias("day"),
    ).agg(_dsum(F.col("value")).alias("dval"))
    r = cusum_alarms(d, ["u", "event_type"], "day", "dval",
                     target=100.0, slack=10.0, threshold=300.0)
    # no-alarm keys carry NULL first_alarm_day; '' keeps the report
    # frame total-orderable (the expectations-report convention)
    return r.withColumn(
        "first_alarm_day",
        F.coalesce(F.col("first_alarm_day").cast("string"), F.lit("")))


@register(
    "zz_holt_smoothing",
    # the two-state extension of the zz_ts_ewma fold parity: both
    # engines run the identical left-to-right double sequence. The
    # oracle unrolls the fold as a RECURSIVE CTE rather than a
    # list_reduce struct accumulator — DuckDB 1.0's multi-field lambda
    # accumulators mis-evaluate cross-field references (probed: an
    # {a,b} fold over [1,2,3] returns b=70 where the left fold gives
    # 40), while the CTE makes every double op explicit; level_t is
    # recomputed inside the trend update on both sides
    oracle="""
    WITH RECURSIVE d AS (
        SELECT user_id % 50 AS u, event_type, CAST(ts AS DATE) AS day,
               CAST(SUM(CAST(value AS DECIMAL(27,6))) AS DOUBLE) AS dval
        FROM events GROUP BY 1, 2, 3
    ), s AS (
        SELECT u, event_type,
               CAST(COUNT(*) AS BIGINT) AS n_points,
               MAX(day) AS last_day,
               list(dval ORDER BY day) AS arr
        FROM d GROUP BY u, event_type
    ), r AS (
        SELECT u, event_type, 1 AS i, arr[1] AS l, CAST(0 AS DOUBLE) AS t,
               len(arr) AS n, arr
        FROM s
        UNION ALL
        SELECT u, event_type, i + 1,
               CAST(0.5 AS DOUBLE) * arr[i + 1]
                   + CAST(0.5 AS DOUBLE) * (l + t),
               CAST(0.3 AS DOUBLE)
                   * (CAST(0.5 AS DOUBLE) * arr[i + 1]
                      + CAST(0.5 AS DOUBLE) * (l + t) - l)
                   + CAST(0.7 AS DOUBLE) * t,
               n, arr
        FROM r WHERE i < n
    )
    SELECT s.u, s.event_type, s.n_points, s.last_day,
           r.l AS level, r.t AS trend, r.l + r.t AS forecast_1
    FROM s JOIN r ON s.u = r.u AND s.event_type = r.event_type
                 AND r.i = r.n
    """,
    survey="ext: Holt double-exponential smoothing "
           "(timeseries.holt_smoothing) — level+trend struct fold, one "
           "shuffle to the key grain, O(rows-per-key) in one task, "
           "one-step-ahead forecast; bit-exact vs a DuckDB list_reduce "
           "struct-state oracle",
)
def zz_ts_holt_entry(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.timeseries import holt_smoothing

    ev = _t(spark, sf_dir, "events").select(
        (F.col("user_id") % 50).alias("u"),
        "event_type",
        F.to_date("ts").alias("day"),
        "value",
    )
    daily = ev.groupBy("u", "event_type", "day").agg(
        _dsum(F.col("value")).alias("dval")
    )
    return holt_smoothing(daily, ["u", "event_type"], "day", "dval",
                          alpha=0.5, beta=0.3)


@register(
    "zz_event_transitions",
    # exact integer pair counts; prob is one integer-exact division —
    # the tiebreak on event_id makes same-timestamp sequences (and so
    # the counts) deterministic
    oracle="""
    WITH p AS (
        SELECT event_type AS from_state,
               LEAD(event_type) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id) AS to_state
        FROM events
    ), c AS (
        SELECT from_state, to_state, CAST(COUNT(*) AS BIGINT) AS n_transitions
        FROM p WHERE to_state IS NOT NULL GROUP BY 1, 2
    )
    SELECT from_state, to_state, n_transitions,
           CAST(n_transitions AS DOUBLE)
               / SUM(n_transitions) OVER (PARTITION BY from_state) AS prob
    FROM c
    """,
    survey="ext: first-order Markov transition matrix "
           "(timeseries.event_transitions) over per-user event sequences "
           "— one lead() over a key-PARTITIONED window (tiebroken by "
           "event_id: same-ts events never make counts "
           "partitioning-dependent), one partial-agg shuffle to the "
           "O(states²) pair grain, row-normalize on that tiny frame; the "
           "behavioral-modeling / synthetic-sequence primitive",
)
def zz_event_transitions_entry(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.timeseries import event_transitions

    ev = _t(spark, sf_dir, "events").select("user_id", "ts",
                                            "event_type", "event_id")
    return event_transitions(ev, "user_id", "ts", "event_type", "event_id")


def _kcore_oracle(k: int, rounds: int) -> str:
    """Chained-CTE peel: the PageRank fixed-iteration parity pattern
    applied to k-core — both engines run the SAME bounded number of
    synchronous peeling passes, so the outputs are equal at any scale;
    once a pass is a fixpoint every further pass is a no-op, so
    overshooting rounds never changes the answer."""
    parts = ["""
    WITH raw AS (
        SELECT DISTINCT l1.l_partkey AS a, l2.l_partkey AS b
        FROM lineitem l1 JOIN lineitem l2
          ON l1.l_orderkey = l2.l_orderkey
         AND l1.l_partkey < l2.l_partkey
    ), e AS (
        SELECT a, b FROM raw UNION ALL SELECT b, a FROM raw
    ), a0 AS (SELECT DISTINCT a AS node FROM e)"""]
    prev = "a0"
    for i in range(1, rounds + 1):
        parts.append(f""", d{i} AS (
        SELECT e.a AS node, COUNT(*) AS core_degree
        FROM e JOIN {prev} x ON e.a = x.node
               JOIN {prev} y ON e.b = y.node
        GROUP BY e.a HAVING COUNT(*) >= {k}
    ), a{i} AS (SELECT node FROM d{i})""")
        prev = f"a{i}"
    parts.append(
        f"\n    SELECT node, CAST(core_degree AS BIGINT) AS core_degree"
        f" FROM d{rounds}"
    )
    return "".join(parts)


@register(
    "graph_kcore",
    # k=60 sits just above the co-purchase graph's min degree at the
    # oracle SFs (peels a handful of nodes, fixpoint within 2-4 passes,
    # verified at sf0.001 and sf0.01); at larger SFs degrees grow past
    # k and the first pass is already the fixpoint — 6 rounds overshoot
    # safely in every regime because post-fixpoint passes are no-ops
    oracle=_kcore_oracle(k=60, rounds=6),
    survey="ext: k-core decomposition (graph.kcore) — bounded-round bulk "
           "peeling: mirrored edges cached once, each pass two semi-joins "
           "against the O(alive) node set (AQE broadcasts) + one "
           "partial-agg degree count; integer degrees, chained-CTE "
           "oracle runs the identical passes (the PageRank "
           "fixed-iteration parity trick applied to peeling)",
)
def zz_graph_kcore_entry(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.graph import kcore

    return kcore(_copurchase_pairs(spark, sf_dir), k=60, rounds=6)


@register(
    "zz_winsorize",
    # exact percentile cuts (linear interpolation: Spark percentile ==
    # DuckDB quantile_cont bit-for-bit), clamp via least/greatest —
    # identical expressions both engines
    oracle="""
    WITH cuts AS (
        SELECT event_type,
               quantile_cont(value, 0.05) AS lo,
               quantile_cont(value, 0.95) AS hi
        FROM events GROUP BY event_type
    )
    SELECT e.event_type, e.event_id, e.value,
           CASE WHEN e.value IS NOT NULL
                THEN least(greatest(e.value, c.lo), c.hi) END AS winsorized,
           COALESCE(CASE WHEN e.value IS NOT NULL
                         THEN least(greatest(e.value, c.lo), c.hi) END
                    <> e.value, false) AS clipped
    FROM events e JOIN cuts c ON e.event_type IS NOT DISTINCT FROM c.event_type
    """,
    survey="ext: per-group winsorization (profiling.winsorize) — exact "
           "percentile cut points (one partial-agg shuffle to the group "
           "grain), broadcast join back, codegen'd clamp; the fact never "
           "shuffles. Group keys join null-safe (the rank_statistics "
           "lesson); the outlier-taming transform before normalization "
           "in a training pipeline",
)
def zz_winsorize_entry(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.profiling import winsorize

    ev = _t(spark, sf_dir, "events").select("event_type", "event_id", "value")
    return winsorize(ev, ["event_type"], "value",
                     lower=0.05, upper=0.95, keep_cols=["event_id"])


@register(
    "zz_target_encode",
    # decimal category sums, decimal subtraction, ONE double division
    # per row; singleton categories fall back to the global mean
    oracle="""
    WITH stats AS (
        SELECT c_mktsegment,
               SUM(CAST(c_acctbal AS DECIMAL(27,6))) AS s,
               COUNT(c_acctbal) AS n
        FROM customer GROUP BY c_mktsegment
    ), gm AS (
        SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(27,6))) AS DOUBLE)
                   / COUNT(c_acctbal) AS g
        FROM customer
    )
    SELECT c.c_mktsegment, c.c_custkey, c.c_acctbal,
           CASE WHEN c.c_acctbal IS NULL AND st.n >= 1
                THEN CAST(st.s AS DOUBLE) / st.n
                WHEN c.c_acctbal IS NOT NULL AND st.n > 1
                THEN CAST(st.s - CAST(c.c_acctbal AS DECIMAL(27,6))
                          AS DOUBLE) / (st.n - 1)
                ELSE gm.g END AS encoded
    FROM customer c
    JOIN stats st ON c.c_mktsegment IS NOT DISTINCT FROM st.c_mktsegment
    CROSS JOIN gm
    """,
    survey="ext: leave-one-out target encoding "
           "(profiling.target_encode_loo) — the leakage-safe categorical "
           "feature ((S_cat - y_i)/(n_cat - 1); plain mean encoding leaks "
           "each row's own label), decimal-exact sums with one double "
           "division, one partial-agg shuffle + broadcast join back, "
           "null-safe category keys, global-mean fallback for singletons",
)
def zz_target_encode_entry(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.profiling import target_encode_loo

    c = _t(spark, sf_dir, "customer").select(
        "c_mktsegment", "c_custkey", "c_acctbal")
    return target_encode_loo(c, ["c_mktsegment"], "c_acctbal",
                             keep_cols=["c_custkey"])


@register(
    "zz_sessionize_native",
    # same sessions as t_sessionize, produced by the JVM-native
    # session_window instead of the lag+cumsum rewrite — the same lag
    # oracle proves both (a new session iff ts - prev > gap; an event at
    # exactly the gap merges in both formulations)
    oracle="""
    WITH g AS (
      SELECT user_id, ts, value,
             CASE WHEN LAG(ts) OVER w IS NULL
                       OR ts - LAG(ts) OVER w > INTERVAL '30 minutes'
                  THEN 1 ELSE 0 END AS new_s
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts)
    ), s AS (
      SELECT *, SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts
                                 ROWS UNBOUNDED PRECEDING) AS sess
      FROM g
    )
    SELECT user_id, MIN(ts) AS session_start, MAX(ts) AS session_end,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(27,6))) AS DOUBLE) AS total_value
    FROM s GROUP BY user_id, sess
    """,
    survey="T ext: gap sessions via the JVM-native session_window "
           "(streaming.events.sessionize_windowed) — merging session "
           "windows in the JVM state store, watermark-evicted in "
           "streaming, no per-group Python loop (the scale path next to "
           "the applyInPandasWithState sessionizer); one shuffle on the "
           "user key, batch/stream the same code",
)
def zz_sessionize_native_entry(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..streaming.events import sessionize_windowed

    ev = _t(spark, sf_dir, "events")
    return sessionize_windowed(ev, gap_minutes=30)


@register(
    "zz_mix_concentration",
    # every metric is a single double division of EXACT integer
    # aggregates (rank-weighted Gini numerator decomposed as
    # 2*sum(i*w) - (k+1)*sum(w)); ranks order by (weight, group) so
    # ties are deterministic in both engines
    oracle="""
    WITH c AS (
        SELECT source, CAST(COUNT(*) AS BIGINT) AS w
        FROM documents GROUP BY source
    ), r AS (
        SELECT w, ROW_NUMBER() OVER (ORDER BY w, source) AS i FROM c
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_groups,
           CAST(SUM(w) AS BIGINT) AS total_weight,
           CAST(2 * SUM(i * w) - (COUNT(*) + 1) * SUM(w) AS DOUBLE)
               / (CAST(COUNT(*) AS DOUBLE) * CAST(SUM(w) AS DOUBLE))
               AS gini,
           CAST(SUM(w * w) AS DOUBLE)
               / (CAST(SUM(w) AS DOUBLE) * CAST(SUM(w) AS DOUBLE)) AS hhi,
           CAST(MAX(w) AS DOUBLE) / CAST(SUM(w) AS DOUBLE) AS top1_share
    FROM r
    """,
    survey="ext: training-mix concentration diagnostics "
           "(profiling.concentration_stats) — Gini / Herfindahl / top-1 "
           "share of the per-source corpus weights: one partial-agg "
           "shuffle to the source grain, a rank window + final aggregate "
           "over the O(sources) frame, every metric one double division "
           "of exact integers; the balance report a mixture sampler "
           "(zz_sample_mixture) acts on",
)
def zz_mix_concentration_entry(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.profiling import concentration_stats

    return concentration_stats(
        _t(spark, sf_dir, "documents"), ["source"])


@register(
    "graph_wcc",
    # Exact component minima via a recursive reachability CTE (node
    # carries every label that can reach it; MIN per node is the
    # component id) — tractable because the bipartite graph's giant
    # component bounds the reach table at |C|^2 label pairs at this SF.
    # The Spark side is the large/small-star algorithm (Kiveris et al.),
    # O(log^2 n) rounds — the two converge to the SAME (node, min) map.
    oracle="""
    WITH RECURSIVE raw AS (
        SELECT DISTINCT o_custkey AS s, l_suppkey + 1000000000 AS d
        FROM orders JOIN lineitem ON l_orderkey = o_orderkey
    ), e AS (
        SELECT s, d FROM raw UNION SELECT d, s FROM raw
    ), nodes AS (
        SELECT DISTINCT s AS node FROM e
    ), reach(node, lbl) AS (
        SELECT node, node AS lbl FROM nodes
        UNION
        SELECT e.d AS node, r.lbl FROM reach r JOIN e ON e.s = r.node
    ), comp AS (
        SELECT node, MIN(lbl) AS cluster_id FROM reach GROUP BY node
    )
    SELECT cluster_id, CAST(COUNT(*) AS BIGINT) AS n_nodes,
           CAST(MAX(node) AS BIGINT) AS max_node
    FROM comp GROUP BY cluster_id
    ORDER BY n_nodes DESC, cluster_id LIMIT 20
    """,
    survey="ext: weakly-connected components over the customer↔supplier "
           "interaction graph — alternating large/small-star with "
           "pointer jumping (Kiveris et al. SoCC 2014), O(log² n) "
           "rounds independent of diameter, per-round lineage cut; "
           "entry reports the 20 largest components (id = component-min "
           "node), proven equal to a DuckDB recursive-reachability "
           "oracle",
)
def zz_graph_wcc_entry(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.dedup import connected_components

    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    pairs = (
        o.join(li, o["o_orderkey"] == li["l_orderkey"])
        .select(
            F.col("o_custkey").alias("a"),
            (F.col("l_suppkey") + F.lit(1000000000)).alias("b"),
        )
    )
    # wide, low-diameter bipartite graph: converges in 2-3 star rounds
    # either way, so the pointer jump's doubled star recompute is pure
    # cost here (measured up to 1.7x; identical result — see
    # connected_components docstring). Chainy dedup inputs keep the
    # default jump.
    cc = connected_components(pairs, pointer_jump=False)
    return (
        cc.groupBy("cluster_id")
        .agg(F.count(F.lit(1)).cast("long").alias("n_nodes"),
             F.max("node").cast("long").alias("max_node"))
        .orderBy(F.desc("n_nodes"), F.asc("cluster_id"))
        .limit(20)
        .select(F.col("cluster_id").cast("long"), "n_nodes", "max_node")
    )


@register(
    "quantile_normalize",
    oracle="""
    WITH base AS (
        SELECT doc_id, lang, n_chars FROM documents
        WHERE n_chars IS NOT NULL
    ), g AS (
        SELECT doc_id, lang, n_chars,
               ROW_NUMBER() OVER (PARTITION BY lang
                                  ORDER BY n_chars, doc_id) AS rg,
               COUNT(*) OVER (PARTITION BY lang) AS ng
        FROM base
    ), n AS (SELECT COUNT(*) AS total FROM base
    ), ranked AS (
        SELECT n_chars AS ref_v,
               ROW_NUMBER() OVER (ORDER BY n_chars, doc_id) AS rnk
        FROM base
    ), t AS (
        SELECT doc_id, lang, n_chars,
               CASE WHEN ng = 1 THEN (n.total - 1) // 2 + 1
                    ELSE ((rg - 1) * (n.total - 1)) // (ng - 1) + 1
               END AS target
        FROM g, n
    )
    SELECT t.doc_id, t.lang, t.n_chars,
           CAST(r.ref_v AS BIGINT) AS normalized
    FROM t JOIN ranked r ON t.target = r.rnk
    """,
    survey="ext: quantile normalization across groups (Bolstad et al. "
           "2003; the score-equating transform) — within-group rank via "
           "a group-partitioned window, global order statistics via the "
           "two-phase distributed prefix scan (range partitions + "
           "O(partitions) offset collect, no single-task sort), integer "
           "target-rank arithmetic (DIV) bit-exact across engines, one "
           "integer equi-join lookup",
)
def zz_quantile_normalize_entry(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.quantiles import quantile_normalize

    docs = _t(spark, sf_dir, "documents").select("doc_id", "lang", "n_chars")
    return quantile_normalize(docs, "lang", "n_chars", "doc_id")


@register(
    "stat_mann_whitney",
    # Doubled-rank integer arithmetic: midranks are half-integers, so
    # the rank-sum and U are carried x2 as exact integers; sigma/z are
    # the only float ops, in a pinned evaluation order with one
    # correctly-rounded sqrt — bit-identical across engines.
    oracle="""
    WITH d AS (
        SELECT n_chars AS v, CAST(lang = 'en' AS BIGINT) AS ia
        FROM documents WHERE lang IN ('en', 'de') AND n_chars IS NOT NULL
    ), per_val AS (
        SELECT v, SUM(ia) AS ca, COUNT(*) AS ct FROM d GROUP BY v
    ), pv AS (
        SELECT *, COALESCE(SUM(ct) OVER (ORDER BY v
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS clt
        FROM per_val
    ), agg AS (
        SELECT CAST(SUM(ca) AS BIGINT) AS n_a,
               CAST(SUM(ct - ca) AS BIGINT) AS n_b,
               CAST(SUM(ca * (2 * clt + ct + 1)) AS BIGINT) AS r2_a,
               CAST(SUM(ct * ct * ct - ct) AS BIGINT) AS ties
        FROM pv
    )
    SELECT n_a, n_b,
           CAST(r2_a - n_a * (n_a + 1) AS BIGINT) AS u2_a,
           sqrt((CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE) / 12.0)
                * ((CAST(n_a + n_b AS DOUBLE) + 1.0)
                   - CAST(ties AS DOUBLE)
                     / (CAST(n_a + n_b AS DOUBLE) * (CAST(n_a + n_b AS DOUBLE) - 1.0))))
               AS sigma,
           (CAST(r2_a - n_a * (n_a + 1) AS DOUBLE)
            - CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE))
           / (2.0 * sqrt((CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE) / 12.0)
                * ((CAST(n_a + n_b AS DOUBLE) + 1.0)
                   - CAST(ties AS DOUBLE)
                     / (CAST(n_a + n_b AS DOUBLE) * (CAST(n_a + n_b AS DOUBLE) - 1.0)))))
               AS z
    FROM agg
    """,
    survey="ext: Mann–Whitney U / Wilcoxon rank-sum with midrank ties "
           "and tie-corrected normal approximation — doubled-rank exact "
           "integer arithmetic, one partial-agg shuffle onto the "
           "distinct-value frame + a running-sum window over that "
           "bounded support (the fact never sorts); the A/B "
           "distribution-shift test for quality scores",
)
def zz_stat_mann_whitney_entry(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.profiling import mann_whitney_u

    return mann_whitney_u(
        _t(spark, sf_dir, "documents"), "n_chars", "lang", "en", "de")


@register(
    "zz_assoc_rules",
    # baskets = (user, day); items = event types. Confidence and lift
    # are single divisions of exact integers (decimal product for the
    # lift numerator) — bit-identical across engines.
    oracle="""
    WITH bi AS (
        SELECT DISTINCT user_id, CAST(ts AS DATE) AS day, event_type AS i
        FROM events
    ), n AS (
        SELECT COUNT(*) AS total FROM (
            SELECT DISTINCT user_id, day FROM bi)
    ), pairs AS (
        SELECT a.i AS antecedent, b.i AS consequent,
               CAST(COUNT(*) AS BIGINT) AS support_pair
        FROM bi a JOIN bi b
          ON a.user_id = b.user_id AND a.day = b.day AND a.i <> b.i
        GROUP BY 1, 2
        HAVING COUNT(*) >= 2
    ), sup AS (
        SELECT i, CAST(COUNT(*) AS BIGINT) AS s FROM bi GROUP BY i
    )
    SELECT p.antecedent, p.consequent, p.support_pair,
           sa.s AS support_a, sb.s AS support_b,
           CAST(p.support_pair AS DOUBLE) / sa.s AS confidence,
           CAST(CAST(p.support_pair AS DECIMAL(19,0))
                * CAST(n.total AS DECIMAL(19,0)) AS DOUBLE)
           / CAST(CAST(sa.s AS DECIMAL(19,0))
                  * CAST(sb.s AS DECIMAL(19,0)) AS DOUBLE) AS lift
    FROM pairs p JOIN sup sa ON p.antecedent = sa.i
                 JOIN sup sb ON p.consequent = sb.i, n
    """,
    survey="ext: pairwise association rules (Agrawal et al. 1993, "
           "2-itemset tier) over (user, day) event baskets — map-only "
           "pair generation from each basket's sorted item array (never "
           "a basket self-join shuffle), one pair partial-agg shuffle, "
           "vocabulary-sized support joins, exact-integer confidence/"
           "lift arithmetic",
)
def zz_assoc_rules_entry(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.freqitems import association_rules

    evs = _t(spark, sf_dir, "events").select(
        "user_id", F.to_date("ts").alias("day"), "event_type")
    return association_rules(evs, ["user_id", "day"], "event_type",
                             min_support=2)


@register(
    "zz_ts_forecast_backtest",
    oracle="""
    WITH series AS (
        SELECT event_type, CAST(ts AS DATE) AS day,
               CAST(SUM(CAST(value AS DECIMAL(27,6))) AS DOUBLE) AS v
        FROM events GROUP BY 1, 2
    ), lagged AS (
        SELECT event_type, v,
               LAG(v, 1) OVER (PARTITION BY event_type ORDER BY day) AS l1,
               LAG(v, 7) OVER (PARTITION BY event_type ORDER BY day) AS lm
        FROM series
    ), agg AS (
        SELECT event_type,
               CAST(COUNT(*) AS BIGINT) AS n_points,
               CAST(COUNT(l1) AS BIGINT) AS n_eval_naive,
               CAST(COUNT(lm) AS BIGINT) AS n_eval_snaive,
               CAST(SUM(CAST(abs(v - l1) AS DECIMAL(27,10))) AS DOUBLE)
                   / COUNT(l1) AS mae_naive,
               CAST(SUM(CAST(abs(v - lm) AS DECIMAL(27,10))) AS DOUBLE)
                   / COUNT(lm) AS mae_snaive
        FROM lagged GROUP BY event_type
    )
    SELECT *, CASE WHEN mae_naive > 0 THEN mae_snaive / mae_naive END
              AS snaive_vs_naive
    FROM agg
    """,
    survey="ext: forecast-baseline backtest (Hyndman & Koehler MASE "
           "denominators) — naive and seasonal-naive one-step MAEs per "
           "series with decimal-exact accumulation; two lags over one "
           "key-partitioned window + one partial-agg groupBy over the "
           "already-aggregated series frame",
)
def zz_ts_forecast_backtest_entry(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.timeseries import forecast_backtest

    evs = _t(spark, sf_dir, "events")
    series = evs.groupBy(
        "event_type", F.to_date("ts").alias("day")
    ).agg(F.sum(F.col("value").cast("decimal(27,6)")).cast("double").alias("v"))
    return forecast_backtest(series, ["event_type"], "day", "v", season=7)


@register(
    "zz_stat_mad_outliers",
    # Both medians are the LOWER median (nearest-rank (n+1)//2 order
    # statistic) — a data value selected by integer rank arithmetic, so
    # the report is bit-identical across engines with no interpolation.
    oracle="""
    WITH d AS (
        SELECT event_type AS g, value AS v FROM events WHERE value IS NOT NULL
    ), sz AS (
        SELECT g, COUNT(*) AS n FROM d GROUP BY g
    ), med AS (
        SELECT g, v AS median FROM (
            SELECT d.g, d.v,
                   ROW_NUMBER() OVER (PARTITION BY d.g ORDER BY d.v) AS r,
                   sz.n
            FROM d JOIN sz USING (g)
        ) WHERE r = (n + 1) // 2
    ), dev AS (
        SELECT d.g, d.v, med.median, abs(d.v - med.median) AS ad
        FROM d JOIN med USING (g)
    ), mad AS (
        SELECT g, ad AS mad FROM (
            SELECT dev.g, dev.ad,
                   ROW_NUMBER() OVER (PARTITION BY dev.g ORDER BY dev.ad) AS r,
                   sz.n
            FROM dev JOIN sz USING (g)
        ) WHERE r = (n + 1) // 2
    )
    SELECT dev.g AS event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           ANY_VALUE(dev.median) AS median,
           ANY_VALUE(mad.mad) AS mad,
           CAST(SUM(CAST(dev.ad > 3.0 * mad.mad AS BIGINT)) AS BIGINT)
               AS n_outliers
    FROM dev JOIN mad USING (g)
    GROUP BY dev.g
    """,
    survey="ext: MAD robust outlier screen (Hampel's rule, 50% breakdown "
           "point) — lower-median order statistics by integer rank "
           "arithmetic (bit-exact, no interpolation), two group-"
           "partitioned ranking windows + O(groups) median joins + one "
           "partial-agg groupBy",
)
def zz_stat_mad_outliers_entry(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.profiling import mad_outliers

    return mad_outliers(
        _t(spark, sf_dir, "events").select(
            F.col("event_type"), F.col("value")),
        "event_type", "value", k=3.0)


@register(
    "zz_pivot_daily_events",
    oracle="""
    SELECT CAST(ts AS DATE) AS day,
           CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS n_view,
           CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS n_click,
           CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS n_purchase,
           CAST(SUM(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS BIGINT) AS n_signup,
           CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS n_error,
           CAST(COUNT(*) AS BIGINT) AS n_total
    FROM events
    WHERE event_type IN ('view', 'click', 'purchase', 'signup', 'error')
    GROUP BY 1
    """,
    survey="ext: pivoted daily activity report — groupBy().pivot() with "
           "PINNED values (no extra distinct-values pass, a single "
           "partial-agg shuffle exactly like the CASE-sum formulation "
           "Catalyst rewrites it to); both sides filter to the pinned "
           "kinds so n_total is honestly the pivoted-kind total even if "
           "new event types appear; the wide-report shape",
)
def zz_pivot_daily_events_entry(spark: SparkSession, sf_dir: str) -> DataFrame:
    kinds = ["view", "click", "purchase", "signup", "error"]
    evs = _t(spark, sf_dir, "events").filter(
        F.col("event_type").isin(kinds)
    ).select(F.to_date("ts").alias("day"), "event_type")
    wide = (
        evs.groupBy("day")
        .pivot("event_type", kinds)
        .agg(F.count(F.lit(1)))
    )
    cols = [F.coalesce(F.col(f"`{k}`"), F.lit(0)).cast("long")
            .alias(f"n_{k}") for k in kinds]
    total = None
    for k in kinds:
        c = F.coalesce(F.col(f"`{k}`"), F.lit(0)).cast("long")
        total = c if total is None else total + c
    return wide.select("day", *cols, total.alias("n_total"))


@register(
    "zz_l_diversity",
    oracle="""
    SELECT lang, source,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(COUNT(DISTINCT quality_tier) AS BIGINT) AS n_sensitive_distinct,
           COUNT(DISTINCT quality_tier) >= 2 AS is_l_diverse
    FROM (
        SELECT lang, source,
               CASE WHEN n_chars >= 900 THEN 'long'
                    WHEN n_chars >= 400 THEN 'mid'
                    ELSE 'short' END AS quality_tier
        FROM documents
    )
    GROUP BY lang, source
    """,
    survey="ext: l-diversity release check (Machanavajjhala et al.) — "
           "the leak k-anonymity misses: a large QI class whose members "
           "all share one sensitive value; one partial-agg shuffle at "
           "the QI grain (count + count_distinct together), composes "
           "with k_anonymity_report as the release gate pair",
)
def zz_l_diversity_entry(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.profiling import l_diversity_report

    d = _t(spark, sf_dir, "documents").withColumn(
        "quality_tier",
        F.when(F.col("n_chars") >= 900, "long")
        .when(F.col("n_chars") >= 400, "mid")
        .otherwise("short"),
    )
    return l_diversity_report(d, ["lang", "source"], "quality_tier", l=2)


_FS_RULES = [
    # (name, m = P(agree|match), u = P(agree|non-match))
    ("exact_name", 0.95, 0.001),
    ("same_nation", 0.9, 0.04),
    ("same_segment", 0.85, 0.2),
]


def _fs_oracle() -> str:
    lrs = []
    for name, m, u in _FS_RULES:
        agree, disagree = repr(m / u), repr((1.0 - m) / (1.0 - u))
        cond = {
            "exact_name": "levenshtein(a.c_name, b.c_name) = 0",
            "same_nation": "a.c_nationkey = b.c_nationkey",
            "same_segment": "a.c_mktsegment = b.c_mktsegment",
        }[name]
        # CAST: DuckDB parses bare decimal literals as DECIMAL and the
        # chained product overflows scale 38 — force double like Spark
        lrs.append((name, f"CASE WHEN {cond} THEN CAST({agree} AS DOUBLE) "
                          f"ELSE CAST({disagree} AS DOUBLE) END"))
    prod = "1.0"
    for name, _ in lrs:
        prod = f"({prod} * lr_{name})"
    cols = ",\n           ".join(f"{expr} AS lr_{name}" for name, expr in lrs)
    return f"""
    WITH cand AS (
        SELECT a.c_custkey AS left_id, b.c_custkey AS right_id,
               CAST(levenshtein(a.c_name, b.c_name) AS BIGINT) AS dist,
           {cols}
        FROM customer a JOIN customer b ON a.c_custkey < b.c_custkey
        WHERE a.c_nationkey < 13 AND b.c_nationkey < 13
          AND levenshtein(a.c_name, b.c_name) <= 1
    )
    SELECT left_id, right_id, dist,
           lr_exact_name, lr_same_nation, lr_same_segment,
           {prod} AS match_odds
    FROM cand
    """


@register(
    "match_scores",
    oracle=_fs_oracle(),
    survey="ext: Fellegi–Sunter probabilistic record linkage — candidate "
           "pairs from the FastSS fuzzy join scored by pinned-order "
           "products of per-attribute likelihood ratios (m/u on "
           "agreement, (1-m)/(1-u) on disagreement, NULL = disagree); "
           "map-only over the blocked pairs, per-rule lr_ columns expose "
           "the evidence decomposition; oracle recomputes the same "
           "ratios over the brute-force pair set",
)
def zz_match_scores_entry(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.joins import fuzzy_join, match_score

    # scoped to half the nations: the entry demonstrates the scoring
    # shape; the full-corpus fuzzy join already has its own entry
    cust = _t(spark, sf_dir, "customer").filter(
        F.col("c_nationkey") < 13).select(
        "c_custkey", "c_name", "c_nationkey", "c_mktsegment")
    pairs = fuzzy_join(
        cust, None, "c_name", left_id_col="c_custkey", max_dist=1)
    la = cust.select(
        F.col("c_custkey").alias("left_id"),
        F.col("c_nationkey").alias("_ln"), F.col("c_mktsegment").alias("_ls"))
    rb = cust.select(
        F.col("c_custkey").alias("right_id"),
        F.col("c_nationkey").alias("_rn"), F.col("c_mktsegment").alias("_rs"))
    enriched = pairs.join(la, "left_id").join(rb, "right_id")
    rules = [
        ("exact_name", F.col("dist") == 0,
         _FS_RULES[0][1], _FS_RULES[0][2]),
        ("same_nation", F.col("_ln") == F.col("_rn"),
         _FS_RULES[1][1], _FS_RULES[1][2]),
        ("same_segment", F.col("_ls") == F.col("_rs"),
         _FS_RULES[2][1], _FS_RULES[2][2]),
    ]
    return match_score(enriched, rules).select(
        "left_id", "right_id", "dist",
        "lr_exact_name", "lr_same_nation", "lr_same_segment", "match_odds")


@register(
    "zz_attr_markov",
    # rows-only: the absorbing-chain solve is LAPACK float linear
    # algebra — no cross-engine bit contract; the math is pinned by
    # hand-solvable pytest chains (tests/test_round10_ops.py)
    oracle=None,
    survey="ext: Markov removal-effect attribution (Anderl et al. 2014) "
           "— journeys truncate at first conversion, transition counts "
           "via one journey-partitioned window + one partial-agg "
           "shuffle, the O(channels²) absorbing-chain solve and "
           "per-channel removal re-solves run driver-side (the "
           "collect-the-tiny-summary split); data-driven attribution "
           "over the funnel/journey tier",
)
def zz_attr_markov_entry(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.attribution import markov_attribution

    evs = _t(spark, sf_dir, "events").withColumn("day", F.to_date("ts"))
    return markov_attribution(
        evs, ["user_id", "day"], conversion="purchase"
    ).orderBy("channel")


@register(
    "ts_decompose",
    oracle="""
    WITH series AS (
        SELECT event_type, CAST(ts AS DATE) AS day,
               CAST(SUM(CAST(value AS DECIMAL(27,6))) AS DOUBLE) AS v
        FROM events GROUP BY 1, 2
    ), idx AS (
        SELECT event_type, day, v,
               ROW_NUMBER() OVER w AS i,
               COUNT(*) OVER (PARTITION BY event_type ORDER BY day
                   ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS wn,
               SUM(CAST(v AS DECIMAL(27,6))) OVER (
                   PARTITION BY event_type ORDER BY day
                   ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS wsum
        FROM series WINDOW w AS (PARTITION BY event_type ORDER BY day)
    ), t AS (
        SELECT *, (i - 1) % 7 AS phase,
               CASE WHEN wn = 7 THEN CAST(wsum AS DOUBLE) / 7 END AS trend
        FROM idx
    ), praw AS (
        SELECT event_type, phase,
               CAST(SUM(CAST(v AS DECIMAL(27,6)) * 7 - wsum) AS DOUBLE)
                   / (COUNT(*) * 7) AS praw
        FROM t WHERE trend IS NOT NULL GROUP BY 1, 2
    ), pm AS (
        SELECT event_type,
               list_reduce(list_transform(list_sort(
                   list(struct_pack(p := phase, v := praw))),
                   x -> x['v']), (acc, x) -> acc + x)
                   / COUNT(*) AS pmean
        FROM praw GROUP BY 1
    ), seas AS (
        SELECT praw.event_type, phase, praw - pmean AS seasonal
        FROM praw JOIN pm ON praw.event_type = pm.event_type
    )
    SELECT t.event_type, t.day, t.v AS value, t.trend, s.seasonal,
           t.v - t.trend - s.seasonal AS remainder
    FROM t LEFT JOIN seas s
      ON t.event_type = s.event_type AND t.phase = s.phase
    """,
    survey="ext: classical additive seasonal decomposition (centered "
           "moving average trend, re-centered per-phase seasonal means "
           "— the method STL refines) — no messy double ever re-casts "
           "to decimal: phase means use the exact decimal numerator "
           "sum(P*v - wsum), re-centering is a pinned-order fold of the "
           "few phase means; one bounded ROWS window per series + one "
           "phase-grain partial-agg; odd periods only (documented)",
)
def zz_ts_decompose_entry(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.timeseries import classical_decompose

    evs = _t(spark, sf_dir, "events")
    series = evs.groupBy(
        "event_type", F.to_date("ts").alias("day")
    ).agg(F.sum(F.col("value").cast("decimal(27,6)")).cast("double").alias("v"))
    return classical_decompose(series, ["event_type"], "day", "v", period=7)


@register(
    "benford_screen",
    oracle="""
    WITH exp_p AS (
        SELECT digit, CAST(p AS DOUBLE) AS expected_share FROM (VALUES
            (1, 0.3010299956639812), (2, 0.17609125905568124),
            (3, 0.12493873660829992), (4, 0.09691001300805642),
            (5, 0.07918124604762482), (6, 0.06694678963061322),
            (7, 0.05799194697768673), (8, 0.05115252244738129),
            (9, 0.04575749056067514)) AS v(digit, p)
    ), c AS (
        SELECT CAST(substring(regexp_replace(
                   CAST(l_extendedprice AS VARCHAR), '^[-0.]+', ''),
                   1, 1) AS INT) AS digit,
               CAST(COUNT(*) AS BIGINT) AS n_obs
        FROM lineitem WHERE l_extendedprice IS NOT NULL
        GROUP BY 1 HAVING digit BETWEEN 1 AND 9
    ), g AS (
        SELECT e.digit, e.expected_share, COALESCE(c.n_obs, 0) AS n_obs
        FROM exp_p e LEFT JOIN c ON e.digit = c.digit
    ), t AS (SELECT CAST(SUM(n_obs) AS DOUBLE) AS n FROM g
    ), terms AS (
        SELECT g.digit, g.n_obs,
               CAST(g.n_obs AS DOUBLE) / t.n AS share,
               g.expected_share,
               (CAST(g.n_obs AS DOUBLE) - t.n * g.expected_share)
               * (CAST(g.n_obs AS DOUBLE) - t.n * g.expected_share)
               / (t.n * g.expected_share) AS chi_term
        FROM g, t
    ), tot AS (
        SELECT list_reduce(list_transform(list_sort(
                   list(struct_pack(d := digit, v := chi_term))),
                   x -> x['v']), (acc, x) -> acc + x) AS chi2
        FROM terms
    )
    SELECT digit, n_obs, share, expected_share, chi_term, chi2
    FROM terms, tot ORDER BY digit
    """,
    survey="ext/governance: Benford's-law first-digit screen (Nigrini "
           "audit shape) — first digit read from the decimal's STRING "
           "form (never floor/log10 libm), pinned expected-share "
           "literals, fixed-order chi terms + sorted-fold statistic; "
           "one map-side projection + one 9-row partial-agg shuffle",
)
def zz_benford_screen_entry(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.profiling import benford_report

    # examined for the scan-parallelism floor (r12): a spread_scan before
    # the digit projection measured a WASH — the round-robin exchange's
    # map side still runs in the single scan task, so serializing 600k
    # rows costs what the parallel regex saves. spread_scan only pays
    # when per-row work is heavy relative to row shipping (Python
    # codecs, key explosion); a cast+regex is not.
    return benford_report(_t(spark, sf_dir, "lineitem"), "l_extendedprice")


@register(
    "ts_changepoint",
    # Prefix sums Σx, Σx² accumulate in DECIMAL on both sides (exact,
    # order-invariant); every division runs in DOUBLE through the same
    # pinned tree  S2 − (S1·S1)/len  per segment, so cost and gain are
    # bit-identical. Ties on cost break to the smallest split index.
    oracle="""
    WITH d AS (
        SELECT user_id % 10 AS u, CAST(ts AS DATE) AS day,
               CAST(SUM(CAST(value AS DECIMAL(27,6))) AS DECIMAL(16,6))
                   AS dval
        FROM events GROUP BY 1, 2
    ), pre AS (
        SELECT u, day,
               CAST(ROW_NUMBER() OVER w AS BIGINT) AS rn,
               CAST(SUM(dval) OVER w AS DECIMAL(37,12)) AS s1,
               CAST(SUM(CAST(CAST(dval AS DECIMAL(19,6)) * dval
                             AS DECIMAL(33,12))) OVER w
                    AS DECIMAL(37,12)) AS s2
        FROM d WINDOW w AS (PARTITION BY u ORDER BY day)
    ), tot AS (
        SELECT u, MAX(rn) AS n,
               max_by(s1, rn) AS t1, max_by(s2, rn) AS t2
        FROM pre GROUP BY u
    ), cand AS (
        -- decimal->double goes through VARCHAR: DuckDB's direct
        -- DECIMAL(38,12)->DOUBLE cast double-rounds (int128 then /1e12)
        -- while Spark's BigDecimal.doubleValue is correctly rounded;
        -- the string parse is correctly rounded in both
        SELECT p.u, p.day, p.rn, t.n, t.t1, t.t2,
               (CAST(CAST(p.s2 AS VARCHAR) AS DOUBLE)
                - (CAST(CAST(p.s1 AS VARCHAR) AS DOUBLE)
                   * CAST(CAST(p.s1 AS VARCHAR) AS DOUBLE))
                  / CAST(p.rn AS DOUBLE))
               + (CAST(CAST(t.t2 - p.s2 AS VARCHAR) AS DOUBLE)
                  - (CAST(CAST(t.t1 - p.s1 AS VARCHAR) AS DOUBLE)
                     * CAST(CAST(t.t1 - p.s1 AS VARCHAR) AS DOUBLE))
                    / CAST(t.n - p.rn AS DOUBLE)) AS cost
        FROM pre p JOIN tot t ON p.u = t.u
        WHERE p.rn >= 3 AND p.rn <= t.n - 3
    ), best AS (
        SELECT *, ROW_NUMBER() OVER (
            PARTITION BY u ORDER BY cost, rn) AS pick
        FROM cand
    )
    SELECT u, n AS n_points, rn AS cp_index, day AS cp_order, cost,
           (CAST(CAST(t2 AS VARCHAR) AS DOUBLE)
            - (CAST(CAST(t1 AS VARCHAR) AS DOUBLE)
               * CAST(CAST(t1 AS VARCHAR) AS DOUBLE)) / CAST(n AS DOUBLE))
           - cost AS gain
    FROM best WHERE pick = 1
    """,
    survey="ext: single best changepoint per series (one round of binary "
           "segmentation / CUSUM-of-squares) — argmin over two-segment "
           "SSE via decimal prefix sums + one pinned double tree per "
           "candidate; one key-grain window pass, map-side candidate "
           "filter, argmin partial-agg, broadcastable O(keys) totals "
           "join. operators/timeseries.py::changepoint_single",
)
def zz_ts_changepoint_entry(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.timeseries import changepoint_single

    ev = _t(spark, sf_dir, "events")
    d = ev.groupBy(
        (F.col("user_id") % 10).alias("u"), F.to_date("ts").alias("day"),
    ).agg(F.sum(F.col("value").cast("decimal(27,6)"))
          .cast("decimal(16,6)").alias("dval"))
    return changepoint_single(d, ["u"], "day", "dval", min_seg=3)


@register(
    "ts_rolling_median",
    # zero float arithmetic — the lower median PICKS a value, so parity
    # is free: both engines sort the same bounded frame and index
    # (n+1) DIV 2
    oracle="""
    WITH d AS (
        SELECT user_id % 10 AS u, CAST(ts AS DATE) AS day,
               CAST(COUNT(*) AS BIGINT) AS n_events
        FROM events GROUP BY 1, 2
    ), r AS (
        SELECT u, day, n_events,
               list_sort(list(n_events) OVER (
                   PARTITION BY u ORDER BY day
                   ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)) AS arr
        FROM d
    )
    SELECT u, day, n_events,
           CAST(len(arr) AS BIGINT) AS n_window,
           arr[(len(arr) + 1) // 2] AS rolling_median
    FROM r
    """,
    survey="ext: exact trailing-window LOWER median per series (robust "
           "rolling baseline vs rolling_zscore's spike-sensitive mean) — "
           "order-statistic pick over a bounded ROWS frame, O(lookback) "
           "state per row, one key-grain shuffle, zero float ops. "
           "operators/timeseries.py::rolling_median",
)
def zz_ts_rolling_median_entry(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.timeseries import rolling_median

    ev = _t(spark, sf_dir, "events")
    d = ev.groupBy(
        (F.col("user_id") % 10).alias("u"), F.to_date("ts").alias("day"),
    ).agg(F.count(F.lit(1)).alias("n_events"))
    return rolling_median(d, ["u"], "day", "n_events", lookback=7)


@register(
    "ts_burstiness",
    # exact integer gap moments; variance through the pinned tree
    # (n·Σg² − Σg·Σg)/(n·n) in DOUBLE, one correctly-rounded sqrt, then
    # the CV and B divisions — the mann_whitney sigma pattern
    oracle="""
    WITH e AS (
        SELECT user_id % 50 AS u, ts,
               LAG(ts) OVER (PARTITION BY user_id % 50 ORDER BY ts)
                   AS prev_ts
        FROM events
    ), g AS (
        SELECT u,
               CAST(epoch_us(ts) - epoch_us(prev_ts) AS DECIMAL(18,0))
                   AS gap
        FROM e WHERE prev_ts IS NOT NULL
    ), agg AS (
        -- widen one multiplicand to force DuckDB's int128 multiply (a
        -- µs gap squared can pass int64); Σ casts to double go through
        -- VARCHAR (s2 can pass 2^53 — the registry's DuckDB pitfalls)
        SELECT u, CAST(COUNT(*) AS BIGINT) AS n_gaps,
               CAST(SUM(gap) AS DECIMAL(38,0)) AS s1,
               CAST(SUM(CAST(gap AS DECIMAL(19,0)) * gap)
                    AS DECIMAL(38,0)) AS s2
        FROM g GROUP BY u HAVING COUNT(*) >= 2
    )
    SELECT u, n_gaps,
           CAST(CAST(s1 AS VARCHAR) AS DOUBLE) / CAST(n_gaps AS DOUBLE) AS mean_gap_us,
           sqrt((CAST(n_gaps AS DOUBLE) * CAST(CAST(s2 AS VARCHAR) AS DOUBLE)
                 - CAST(CAST(s1 AS VARCHAR) AS DOUBLE) * CAST(CAST(s1 AS VARCHAR) AS DOUBLE))
                / (CAST(n_gaps AS DOUBLE) * CAST(n_gaps AS DOUBLE)))
               AS sigma_gap_us,
           CASE WHEN CAST(CAST(s1 AS VARCHAR) AS DOUBLE) / CAST(n_gaps AS DOUBLE) <> 0.0
                THEN sqrt((CAST(n_gaps AS DOUBLE) * CAST(CAST(s2 AS VARCHAR) AS DOUBLE)
                           - CAST(CAST(s1 AS VARCHAR) AS DOUBLE) * CAST(CAST(s1 AS VARCHAR) AS DOUBLE))
                          / (CAST(n_gaps AS DOUBLE) * CAST(n_gaps AS DOUBLE)))
                     / (CAST(CAST(s1 AS VARCHAR) AS DOUBLE) / CAST(n_gaps AS DOUBLE))
                END AS cv,
           CASE WHEN sqrt((CAST(n_gaps AS DOUBLE) * CAST(CAST(s2 AS VARCHAR) AS DOUBLE)
                           - CAST(CAST(s1 AS VARCHAR) AS DOUBLE) * CAST(CAST(s1 AS VARCHAR) AS DOUBLE))
                          / (CAST(n_gaps AS DOUBLE) * CAST(n_gaps AS DOUBLE)))
                     + CAST(CAST(s1 AS VARCHAR) AS DOUBLE) / CAST(n_gaps AS DOUBLE) <> 0.0
                THEN (sqrt((CAST(n_gaps AS DOUBLE) * CAST(CAST(s2 AS VARCHAR) AS DOUBLE)
                            - CAST(CAST(s1 AS VARCHAR) AS DOUBLE) * CAST(CAST(s1 AS VARCHAR) AS DOUBLE))
                           / (CAST(n_gaps AS DOUBLE) * CAST(n_gaps AS DOUBLE)))
                      - CAST(CAST(s1 AS VARCHAR) AS DOUBLE) / CAST(n_gaps AS DOUBLE))
                     / (sqrt((CAST(n_gaps AS DOUBLE) * CAST(CAST(s2 AS VARCHAR) AS DOUBLE)
                              - CAST(CAST(s1 AS VARCHAR) AS DOUBLE) * CAST(CAST(s1 AS VARCHAR) AS DOUBLE))
                             / (CAST(n_gaps AS DOUBLE) * CAST(n_gaps AS DOUBLE)))
                        + CAST(CAST(s1 AS VARCHAR) AS DOUBLE) / CAST(n_gaps AS DOUBLE))
                END AS burstiness
    FROM agg
    """,
    survey="ext: inter-arrival burstiness screen (Goh & Barabási 2008) — "
           "B=(σ−μ)/(σ+μ) + CV of integer-second gap moments per key; "
           "the human-vs-cron detector. One ordered lag window + one "
           "integer-moment partial-agg groupBy. "
           "operators/timeseries.py::burstiness_report",
)
def zz_ts_burstiness_entry(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.timeseries import burstiness_report

    ev = _t(spark, sf_dir, "events").select(
        (F.col("user_id") % 50).alias("u"), "ts")
    return burstiness_report(ev, ["u"], "ts", min_events=3)


@register(
    "j_overlap_intervals",
    # oracle is the plain range join — the grid-cell plan is internal to
    # the operator; only the pair set must match. Bounds are exact
    # integer µs, so parity is free.
    oracle="""
    WITH v AS (
        SELECT user_id % 100 AS u, CAST(ts AS DATE) AS l_day,
               CAST(MIN(epoch_us(ts)) AS BIGINT) AS v_start,
               CAST(MAX(epoch_us(ts)) AS BIGINT) AS v_end
        FROM events WHERE event_type = 'view' GROUP BY 1, 2
    ), e AS (
        SELECT user_id % 100 AS u, CAST(ts AS DATE) AS r_day,
               CAST(MIN(epoch_us(ts)) AS BIGINT) AS e_start,
               CAST(MAX(epoch_us(ts)) AS BIGINT) AS e_end
        FROM events WHERE event_type = 'error' GROUP BY 1, 2
    )
    SELECT v.u, v.l_day, v.v_start, v.v_end, e.r_day, e.e_start, e.e_end
    FROM v JOIN e ON v.u = e.u
     AND v.v_start <= e.e_end AND e.e_start <= v.v_end
    """,
    survey="ext: big×big interval-overlap join via grid cells — each "
           "interval explodes onto cell-width buckets, overlap becomes "
           "an equi-join on (keys, cell) + post-filter, pairs kept only "
           "in their canonical first-shared cell (exactly-once by "
           "arithmetic, no dedup shuffle); the session-overlap / "
           "concurrency-correlation shape a raw range predicate plans "
           "as a cartesian. operators/joins.py::overlap_join",
)
def j_overlap_intervals_entry(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.joins import overlap_join

    ev = _t(spark, sf_dir, "events")
    v = ev.filter(F.col("event_type") == "view").groupBy(
        (F.col("user_id") % 100).alias("u"),
        F.to_date("ts").alias("l_day"),
    ).agg(F.min(F.unix_micros("ts")).alias("v_start"),
          F.max(F.unix_micros("ts")).alias("v_end"))
    e = ev.filter(F.col("event_type") == "error").groupBy(
        (F.col("user_id") % 100).alias("u"),
        F.to_date("ts").alias("r_day"),
    ).agg(F.min(F.unix_micros("ts")).alias("e_start"),
          F.max(F.unix_micros("ts")).alias("e_end"))
    return overlap_join(
        v, e, "v_start", "v_end", "e_start", "e_end",
        cell=3_600_000_000, on=["u"],
    ).select("u", "l_day", "v_start", "v_end", "r_day", "e_start", "e_end")


@register(
    "zz_stat_ks_test",
    # Cross-multiplied integer ECDF gaps (|cum_a*n_b - cum_b*n_a|, max as
    # an integer) with one double division + one pinned sqrt expression at
    # the end — bit-identical across engines (the mann_whitney pattern).
    oracle="""
    WITH d AS (
        SELECT n_chars AS v, CAST(lang = 'en' AS BIGINT) AS ia
        FROM documents WHERE lang IN ('en', 'de') AND n_chars IS NOT NULL
    ), per_val AS (
        SELECT v, SUM(ia) AS ca, SUM(1 - ia) AS cb FROM d GROUP BY v
    ), pv AS (
        SELECT SUM(ca) OVER (ORDER BY v
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cuma,
               SUM(cb) OVER (ORDER BY v
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cumb,
               SUM(ca) OVER () AS na, SUM(cb) OVER () AS nb
        FROM per_val
    ), agg AS (
        SELECT CAST(MAX(na) AS BIGINT) AS n_a,
               CAST(MAX(nb) AS BIGINT) AS n_b,
               CAST(MAX(ABS(cuma * nb - cumb * na)) AS BIGINT) AS d_num
        FROM pv
    )
    SELECT n_a, n_b, d_num,
           CAST(d_num AS DOUBLE)
               / (CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE)) AS d_stat,
           sqrt(CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE)
                / (CAST(n_a AS DOUBLE) + CAST(n_b AS DOUBLE)))
               * (CAST(d_num AS DOUBLE)
                  / (CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE))) AS z
    FROM agg
    """,
    survey="ext: two-sample Kolmogorov–Smirnov drift test — exact "
           "integer cross-multiplied ECDF gaps over the distinct-value "
           "support (one partial-agg shuffle + bounded running-sum "
           "window, the fact never sorts); the any-shape drift "
           "companion to stat_mann_whitney and migrate's PSI gate. "
           "operators/profiling.py::ks_test",
)
def zz_stat_ks_test_entry(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.profiling import ks_test

    return ks_test(
        _t(spark, sf_dir, "documents"), "n_chars", "lang", "en", "de")


@register(
    "zz_eval_calibration",
    # conf is an exact multiple of 1/64 (integer ratio), so the
    # decimal(27,15) accumulation is exact and order-invariant in both
    # engines; mean_conf/accuracy are one double division each.
    oracle="""
    WITH d AS (
        SELECT CAST(n_chars % 65 AS DOUBLE) / 64.0 AS conf,
               CAST(lang = 'en' AS BIGINT) AS ok
        FROM documents WHERE n_chars IS NOT NULL
    ), binned AS (
        SELECT CAST(LEAST(CAST(FLOOR(conf * 10) AS INT), 9) AS INT) AS bin,
               CAST(conf AS DECIMAL(27,15)) AS c, ok
        FROM d WHERE conf >= 0 AND conf <= 1
    ), per AS (
        SELECT bin, CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(ok) AS BIGINT) AS n_correct,
               CAST(SUM(c) AS DECIMAL(37,15)) AS sc
        FROM binned GROUP BY bin
    )
    SELECT bin, n, n_correct,
           CAST(sc AS DOUBLE) / CAST(n AS DOUBLE) AS mean_conf,
           CAST(n_correct AS DOUBLE) / CAST(n AS DOUBLE) AS accuracy
    FROM per
    """,
    survey="ext: reliability-diagram calibration table (per-bin support, "
           "mean confidence, accuracy — the ECE inputs) for probabilistic "
           "labelers; map-only bin assignment + one partial-agg shuffle "
           "at the <=bins grain, decimal confidence accumulation. "
           "operators/profiling.py::calibration_report",
)
def zz_eval_calibration_entry(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.profiling import calibration_report

    d = _t(spark, sf_dir, "documents").filter(
        F.col("n_chars").isNotNull()).select(
        ((F.col("n_chars") % 65).cast("double") / F.lit(64.0)).alias("conf"),
        (F.col("lang") == "en").cast("long").alias("ok"),
    )
    return calibration_report(d, "conf", "ok", bins=10)
