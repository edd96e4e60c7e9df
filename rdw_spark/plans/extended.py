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
    "p10_column_visibility",
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
    "a2_conditional_minmax",
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
    "t_windowed_event_counts",
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
    "j_salted_skew_join",
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
    "zz_fuzzy_join",
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
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    return fuzzy_join(cust, None, "c_name", left_id_col="c_custkey",
                      max_dist=1)
