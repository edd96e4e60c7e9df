"""Relational operator catalog (SURVEY.md §2.3–§2.9) over the driver
testdata star schema.

Each query re-expresses a documented RDW query shape on the TPC-H-ish
tables so the DuckDB oracle can verify it. Survey ids cited per query;
the RDW-domain versions of the same shapes (over warehouse tables) live
in ``rdw_spark.plans.rdw_reports`` and are exercised by pytest fixtures.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..io import load_table
from ..operators.joins import asof_join
from .registry import register


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


def _dsum(col) -> F.Column:
    """Deterministic double sum: accumulate exactly in decimal, cast back.

    Plain double summation is order-dependent; Spark's partial-agg order
    differs run to run and from DuckDB's. Decimal addition is exact and
    associative — both engines produce the identical value, and the final
    decimal→double conversion is correctly rounded in both. Oracle-side
    equivalent: ``CAST(SUM(CAST(x AS DECIMAL(27,6))) AS DOUBLE)``.

    Outputs derived this way are emitted RAW (never ``ROUND(double, n)``):
    the two engines' double-round implementations disagree by 1 ulp near
    rounding boundaries (Java BigDecimal HALF_UP on the exact binary value
    vs DuckDB's scaled-multiply round), which is exactly the failure class
    the driver's exact value-hash catches. A bit-identical raw double
    hashes identically; a rounded one may not.
    """
    return F.sum(col.cast("decimal(27,6)")).cast("double")


def _davg(col) -> F.Column:
    return _dsum(col) / F.count("*")


# --------------------------------------------------------------------------
# Flagship aggregation (A1/A2/A3/A13 — pricing-summary shape)
# --------------------------------------------------------------------------

@register(
    "zz_a1_pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_quantity AS DECIMAL(27,6))) AS DOUBLE)      AS sum_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(27,6))) AS DOUBLE) AS sum_base_price,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(27,6))) AS DOUBLE) AS sum_disc_price,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax) AS DECIMAL(27,6))) AS DOUBLE) AS sum_charge,
           CAST(SUM(CAST(l_quantity AS DECIMAL(27,6))) AS DOUBLE) / COUNT(*)      AS avg_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(27,6))) AS DOUBLE) / COUNT(*) AS avg_price,
           CAST(SUM(CAST(l_discount AS DECIMAL(27,6))) AS DOUBLE) / COUNT(*)      AS avg_disc,
           COUNT(*)                                                              AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
    survey="A1 A2 A3 A13 (docs/Monitoring.md:41-65 count/group shapes)",
)
def a1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    disc = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            _dsum(F.col("l_quantity")).alias("sum_qty"),
            _dsum(F.col("l_extendedprice")).alias("sum_base_price"),
            _dsum(disc).alias("sum_disc_price"),
            _dsum(disc * (1 + F.col("l_tax"))).alias("sum_charge"),
            _davg(F.col("l_quantity")).alias("avg_qty"),
            _davg(F.col("l_extendedprice")).alias("avg_price"),
            _davg(F.col("l_discount")).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


# --------------------------------------------------------------------------
# Projections / filters / predicates (P1–P8)
# --------------------------------------------------------------------------

@register(
    "zz_p_scoped_filter_agg",
    oracle="""
    SELECT user_id, COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(27,6))) AS DOUBLE) AS total_value
    FROM events
    WHERE event_type = 'purchase'
      AND ts BETWEEN TIMESTAMP '2024-01-05 00:00:00' AND TIMESTAMP '2024-01-20 00:00:00'
    GROUP BY user_id
    """,
    survey="P1 P2 P4 (docs/Troubleshooting.md:434-450 scoping; Runbook.Audit.md:164 BETWEEN)",
)
def p_scoped_filter_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    return (
        ev.filter(
            (F.col("event_type") == "purchase")
            & F.col("ts").between("2024-01-05 00:00:00", "2024-01-20 00:00:00")
        )
        .groupBy("user_id")
        .agg(F.count("*").alias("n_events"), _dsum(F.col("value")).alias("total_value"))
    )


@register(
    "zz_p3_status_code_filter",
    oracle="""
    SELECT CASE event_type WHEN 'error' THEN -6 WHEN 'signup' THEN 0
                           WHEN 'view' THEN 1 WHEN 'click' THEN 2
                           ELSE 3 END AS status,
           COUNT(*) AS n,
           MAX(ts) AS last_seen
    FROM events
    WHERE CASE event_type WHEN 'error' THEN -6 WHEN 'signup' THEN 0
                          WHEN 'view' THEN 1 WHEN 'click' THEN 2
                          ELSE 3 END < 1
    GROUP BY status
    """,
    survey="P3 (docs/Monitoring.md:41-51 status<0; docs/Troubleshooting.md:326-337 status=-6)",
)
def p3_status_code_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Enumerated int status codes with negative error states: the
    monitoring shape ``SELECT status, count(*) FROM import WHERE status < 0
    GROUP BY status``. The decode stays a Catalyst CASE expression, so the
    derived predicate is constant-folded into the scan filter."""
    status = (
        F.when(F.col("event_type") == "error", -6)
        .when(F.col("event_type") == "signup", 0)
        .when(F.col("event_type") == "view", 1)
        .when(F.col("event_type") == "click", 2)
        .otherwise(3)
    )
    ev = _t(spark, sf_dir, "events").withColumn("status", status)
    return (
        ev.filter(F.col("status") < 1)
        .groupBy("status")
        .agg(F.count("*").alias("n"), F.max("ts").alias("last_seen"))
    )


@register(
    "zz_p5_like_patterns",
    oracle="""
    SELECT c_custkey, c_name, c_mktsegment,
           substr(c_name, length(c_name) - 1, 2) = '42' AS ends_42
    FROM customer
    WHERE (c_name LIKE '%42%' AND c_mktsegment LIKE 'B%')
       OR substr(c_name, length(c_name) - 1, 2) = '42'
    """,
    survey="P5 (docs/Troubleshooting.md:369,427 LIKE prefix/contains) + "
           "P7 (docs/Troubleshooting.md:385 substr(natural_id,8)='0000000') — "
           "one entry covers both string-predicate families so all "
           "oracle-bearing queries fit the driver's 50-row window",
)
def p5_like_patterns(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    substr_pred = F.expr("substring(c_name, length(c_name) - 1, 2) = '42'")
    return c.filter(
        (F.col("c_name").like("%42%") & F.col("c_mktsegment").like("B%"))
        | substr_pred
    ).select("c_custkey", "c_name", "c_mktsegment", substr_pred.alias("ends_42"))


@register(
    "zz_p8_relative_interval",
    oracle="""
    SELECT event_id, user_id, event_type, ts
    FROM events
    WHERE ts >= (SELECT MAX(ts) - INTERVAL 24 HOUR FROM events)
    """,
    survey="P8 (docs/API.md:430-432 after=-PT1H; docs/Monitoring.md:100 NOW()-INTERVAL)",
)
def p8_relative_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    cutoff = ev.agg(
        (F.max("ts") - F.expr("INTERVAL 24 HOURS")).alias("__cutoff")
    )
    return (
        ev.join(F.broadcast(cutoff))
        .filter(F.col("ts") >= F.col("__cutoff"))
        .select("event_id", "user_id", "event_type", "ts")
    )


# --------------------------------------------------------------------------
# Joins (J1–J8)
# --------------------------------------------------------------------------

@register(
    "zz_j1_star_revenue",
    oracle="""
    SELECT r_name, n_name,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(27,6))) AS DOUBLE) AS revenue,
           COUNT(*) AS n_items
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation   ON c_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    GROUP BY r_name, n_name
    """,
    survey="J1 J3 (docs/Runbook.Audit.md:128-134 fact→dim joins; broadcast dims)",
)
def j1_star_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(
            _dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"),
            F.count("*").alias("n_items"),
        )
    )


@register(
    "zz_j2_left_join_conditional_counts",
    oracle="""
    SELECT c_custkey,
           COUNT(o_orderkey)                                         AS n_orders,
           CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_finished,
           COALESCE(CAST(SUM(CAST(o_totalprice AS DECIMAL(27,6))) AS DOUBLE), 0.0) AS total_spend
    FROM customer
    LEFT JOIN orders ON c_custkey = o_custkey
    GROUP BY c_custkey
    """,
    survey="J2 A2 (docs/Runbook.Audit.md:129,189-192 LEFT JOIN + SUM(CASE WHEN))",
)
def j2_left_join_conditional_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            F.sum(F.when(F.col("o_orderstatus") == "F", 1).otherwise(0)).alias("n_finished"),
            F.coalesce(_dsum(F.col("o_totalprice")), F.lit(0.0)).alias("total_spend"),
        )
    )


@register(
    "zz_j4_semi_join",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer
    WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_totalprice > 300000)
    """,
    survey="J4 P6 (docs/Runbook.Audit.md:133,195 IN (SELECT ...) semi-joins)",
)
def j4_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 300000)
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select("c_custkey", "c_name")


@register(
    "zz_j5_anti_join",
    oracle="""
    SELECT n_name, COUNT(*) AS n_customers_without_orders
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    GROUP BY n_name
    """,
    survey="J5 (docs/Troubleshooting.md:409-412 NOT EXISTS before delete)",
)
def j5_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    n = _t(spark, sf_dir, "nation")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_anti")
        .join(F.broadcast(n), F.col("c_nationkey") == n.n_nationkey)
        .groupBy("n_name")
        .agg(F.count("*").alias("n_customers_without_orders"))
    )


@register(
    "zz_j6_expression_self_join",
    oracle="""
    SELECT a.p_brand AS brand, COUNT(*) AS n_same_size_pairs
    FROM part a
    JOIN part b
      ON a.p_brand = b.p_brand AND a.p_size = b.p_size AND a.p_partkey < b.p_partkey
    GROUP BY a.p_brand
    """,
    survey="J6 (docs/Troubleshooting.md:385 expression self-join duplicate detection)",
)
def j6_expression_self_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = _t(spark, sf_dir, "part")
    a = p.alias("a")
    b = p.alias("b")
    return (
        a.join(
            b,
            (F.col("a.p_brand") == F.col("b.p_brand"))
            & (F.col("a.p_size") == F.col("b.p_size"))
            & (F.col("a.p_partkey") < F.col("b.p_partkey")),
        )
        .groupBy(F.col("a.p_brand").alias("brand"))
        .agg(F.count("*").alias("n_same_size_pairs"))
    )


@register(
    "zz_j7_cumulative_distinct_users",
    oracle="""
    WITH first_seen AS (
        SELECT user_id, MIN(CAST(ts AS DATE)) AS d FROM events GROUP BY user_id
    ), per_day AS (
        SELECT d, COUNT(*) AS new_users FROM first_seen GROUP BY d
    )
    SELECT d, new_users,
           CAST(SUM(new_users) OVER (ORDER BY d ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cumulative_users
    FROM per_day
    """,
    survey="J7 A4 (docs/Monitoring.md:244-256 cumulative distinct-by-date; window rewrite of the range join)",
)
def j7_cumulative_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    first_seen = ev.groupBy("user_id").agg(F.min(F.to_date("ts")).alias("d"))
    per_day = first_seen.groupBy("d").agg(F.count("*").alias("new_users"))
    w = Window.orderBy("d").rowsBetween(Window.unboundedPreceding, 0)
    return per_day.select(
        "d", "new_users", F.sum("new_users").over(w).alias("cumulative_users")
    )


@register(
    "j8_asof_percentile_bands",
    oracle="""
    SELECT o_orderkey,
           (SELECT MAX(b.rank) FROM (VALUES (1, 0.0), (2, 50000.0), (3, 100000.0),
                                            (4, 150000.0), (5, 200000.0), (6, 250000.0),
                                            (7, 300000.0), (8, 400000.0)) AS b(rank, score)
            WHERE b.score <= o_totalprice) AS price_band
    FROM orders
    """,
    survey="J8 A9 (docs/Norms.md:25-36 percentile assignment: max(rank) where score<=scale_score)",
)
def j8_asof_percentile_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    bands = spark.createDataFrame(
        [(1, 0.0), (2, 50000.0), (3, 100000.0), (4, 150000.0),
         (5, 200000.0), (6, 250000.0), (7, 300000.0), (8, 400000.0)],
        "rank INT, score DOUBLE",
    )
    joined = asof_join(
        o, bands, on="o_totalprice", right_on="score",
        value_cols=["rank"], strategy="broadcast",
    )
    return joined.select("o_orderkey", F.col("rank").alias("price_band"))


# --------------------------------------------------------------------------
# Aggregations (A4–A13)
# --------------------------------------------------------------------------

@register(
    "zz_a4_count_distinct",
    oracle="""
    SELECT o_orderpriority,
           COUNT(DISTINCT o_custkey) AS n_customers,
           COUNT(*) AS n_orders
    FROM orders
    GROUP BY o_orderpriority
    """,
    survey="A4 (docs/Monitoring.md:244-256 COUNT(DISTINCT); approx variant for the 100TB tier)",
)
def a4_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.countDistinct("o_custkey").alias("n_customers"),
        F.count("*").alias("n_orders"),
    )


@register(
    "zz_a5_having_postfilter",
    oracle="""
    SELECT p_brand, COUNT(*) AS n_parts
    FROM part
    GROUP BY p_brand
    HAVING COUNT(*) > 5
    """,
    survey="A5 (docs/Monitoring.md:263-268 HAVING)",
)
def a5_having_postfilter(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = _t(spark, sf_dir, "part")
    return (
        p.groupBy("p_brand")
        .agg(F.count("*").alias("n_parts"))
        .filter(F.col("n_parts") > 5)
    )


@register(
    "zz_a6_histogram_buckets",
    oracle="""
    SELECT CAST(FLOOR(date_diff('day', o_orderdate, l_shipdate) / 30) AS INT) AS delay_bucket_months,
           COUNT(*) AS n_items
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    GROUP BY 1
    """,
    survey="A6 (docs/Monitoring.md:109-158 TIMESTAMPDIFF histogram buckets)",
)
def a6_histogram_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .withColumn(
            "delay_bucket_months",
            F.floor(F.datediff(F.to_date("l_shipdate"), F.to_date("o_orderdate")) / 30).cast("int"),
        )
        .groupBy("delay_bucket_months")
        .agg(F.count("*").alias("n_items"))
    )


@register(
    "a7_aggregate_report",
    oracle="""
    SELECT c_mktsegment,
           CAST(year(o_orderdate) AS INT) AS order_year,
           COUNT(*) AS n_orders,
           CAST(SUM(CASE WHEN o_totalprice < 100000 THEN 1 ELSE 0 END) AS BIGINT) AS lvl1_count,
           CAST(SUM(CASE WHEN o_totalprice >= 100000 AND o_totalprice < 200000 THEN 1 ELSE 0 END) AS BIGINT) AS lvl2_count,
           CAST(SUM(CASE WHEN o_totalprice >= 200000 AND o_totalprice < 300000 THEN 1 ELSE 0 END) AS BIGINT) AS lvl3_count,
           CAST(SUM(CASE WHEN o_totalprice >= 300000 THEN 1 ELSE 0 END) AS BIGINT) AS lvl4_count,
           100.0 * SUM(CASE WHEN o_totalprice >= 300000 THEN 1 ELSE 0 END) / COUNT(*) AS lvl4_pct
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY c_mktsegment, CAST(year(o_orderdate) AS INT)
    """,
    survey="A7 (aggregate report: per-performance-level counts/percents sliced by dims; "
    "config/rdw-reporting-aggregate-service.yml:4-27)",
)
def a7_aggregate_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    lvl = [
        F.col("o_totalprice") < 100000,
        (F.col("o_totalprice") >= 100000) & (F.col("o_totalprice") < 200000),
        (F.col("o_totalprice") >= 200000) & (F.col("o_totalprice") < 300000),
        F.col("o_totalprice") >= 300000,
    ]
    return (
        o.join(c, o.o_custkey == c.c_custkey)
        .groupBy("c_mktsegment", F.year("o_orderdate").alias("order_year"))
        .agg(
            F.count("*").alias("n_orders"),
            *[
                F.sum(F.when(cond, 1).otherwise(0)).alias(f"lvl{i + 1}_count")
                for i, cond in enumerate(lvl)
            ],
            (100.0 * F.sum(F.when(lvl[3], 1).otherwise(0)) / F.count("*")).alias("lvl4_pct"),
        )
    )


@register(
    "a8_target_report",
    oracle="""
    WITH g AS (
        SELECT p_brand AS target,
               COUNT(*) AS n,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(27,6))) AS DOUBLE) AS sx,
               CAST(SUM(CAST(l_extendedprice * l_extendedprice AS DECIMAL(38,10))) AS DOUBLE) AS sxx
        FROM lineitem JOIN part ON l_partkey = p_partkey
        GROUP BY p_brand
    )
    SELECT target,
           n AS n_measurements,
           sx / n AS avg_price,
           CASE WHEN n > 1 THEN SQRT((sxx - sx * sx / n) / (n - 1)) END AS stddev_price,
           (n < 50 OR CASE WHEN n > 1 THEN SQRT((sxx - sx * sx / n) / (n - 1)) END / SQRT(n) > 200.0)
               AS insufficient_data
    FROM g
    """,
    survey="A8 (target report with std-err 'Insufficient Data' cutoff; config/application.yml:44-53)",
)
def a8_target_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    # stddev via exact decimal moment sums so the value (and the
    # "Insufficient Data" threshold decision) is summation-order-independent;
    # Spark's stddev_samp (Welford over doubles) is not.
    x = F.col("l_extendedprice")
    g = (
        li.join(p, li.l_partkey == p.p_partkey)
        .groupBy(F.col("p_brand").alias("target"))
        .agg(
            F.count("*").alias("n"),
            _dsum(x).alias("sx"),
            F.sum((x * x).cast("decimal(38,10)")).cast("double").alias("sxx"),
        )
    )
    n, sx, sxx = F.col("n"), F.col("sx"), F.col("sxx")
    std = F.when(n > 1, F.sqrt((sxx - sx * sx / n) / (n - 1)))
    return g.select(
        "target",
        n.alias("n_measurements"),
        (sx / n).alias("avg_price"),
        std.alias("stddev_price"),
        ((n < 50) | (std / F.sqrt(n) > 200.0)).alias("insufficient_data"),
    )


@register(
    "a9_percentile_rank",
    oracle="""
    SELECT o_orderkey,
           CAST(year(o_orderdate) AS INT) AS order_year,
           PERCENT_RANK() OVER (PARTITION BY year(o_orderdate)
                                ORDER BY o_totalprice, o_orderkey) AS price_percentile
    FROM orders
    """,
    survey="A9 (docs/Norms.md percentile assignment — window variant)",
)
def a9_percentile_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy(F.year("o_orderdate")).orderBy("o_totalprice", "o_orderkey")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").alias("order_year"),
        F.percent_rank().over(w).alias("price_percentile"),
    )


@register(
    "zz_a12_distribution_report",
    oracle="""
    SELECT source,
           COUNT(*) AS n_docs,
           100.0 * SUM(CASE WHEN n_chars > 300 THEN 1 ELSE 0 END) / COUNT(*) AS pct_long,
           CAST(SUM(CAST(n_chars AS DECIMAL(27,6))) AS DOUBLE) / COUNT(*) AS avg_chars
    FROM documents
    GROUP BY source
    """,
    survey="A12 (docs/Runbook.DataSpecifications.md:95-132 missing-data %-populated report)",
)
def a12_distribution_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    return d.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        (100.0 * F.sum(F.when(F.col("n_chars") > 300, 1).otherwise(0)) / F.count("*")).alias("pct_long"),
        _davg(F.col("n_chars")).alias("avg_chars"),
    )


@register(
    "zz_a13_expression_groupby",
    oracle="""
    SELECT CAST(ts AS DATE) AS event_date,
           event_type,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(27,6))) AS DOUBLE) AS total_value
    FROM events
    GROUP BY CAST(ts AS DATE), event_type
    """,
    survey="A13 (docs/Monitoring.md:55-65 GROUP BY DATE(updated))",
)
def a13_expression_groupby(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    return ev.groupBy(
        F.to_date("ts").alias("event_date"), "event_type"
    ).agg(F.count("*").alias("n_events"), _dsum(F.col("value")).alias("total_value"))


# --------------------------------------------------------------------------
# Windows (W1–W5), sorts/limits (O1), set ops (U1–U3)
# --------------------------------------------------------------------------

@register(
    "zz_w1_latest_per_entity",
    oracle="""
    SELECT c_custkey, o_orderkey AS latest_orderkey, o_orderdate AS latest_orderdate,
           o_totalprice AS latest_totalprice
    FROM (
        SELECT c_custkey, o_orderkey, o_orderdate, o_totalprice,
               ROW_NUMBER() OVER (PARTITION BY c_custkey
                                  ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
        FROM customer JOIN orders ON c_custkey = o_custkey
    ) WHERE rn = 1
    """,
    survey="W1 (docs/Runbook.Audit.md:441 latest-exam-per-student → inferred_school_id)",
)
def w1_latest_per_entity(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("c_custkey").orderBy(
        F.col("o_orderdate").desc(), F.col("o_orderkey").desc()
    )
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "c_custkey",
            F.col("o_orderkey").alias("latest_orderkey"),
            F.col("o_orderdate").alias("latest_orderdate"),
            F.col("o_totalprice").alias("latest_totalprice"),
        )
    )


@register(
    "zz_w2_ordered_history_lag",
    oracle="""
    SELECT event_id, user_id, value,
           LAG(value) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_value,
           value - COALESCE(LAG(value) OVER (PARTITION BY user_id ORDER BY ts, event_id), 0.0) AS delta
    FROM events
    WHERE event_type = 'purchase'
    """,
    survey="W2 (docs/Runbook.Audit.md:309 ordered audit history + before/after diffs)",
)
def w2_ordered_history_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev = F.lag("value").over(w)
    return ev.select(
        "event_id", "user_id", "value",
        prev.alias("prev_value"),
        (F.col("value") - F.coalesce(prev, F.lit(0.0))).alias("delta"),
    )


@register(
    "zz_w3_first_row_metadata",
    oracle="""
    SELECT DISTINCT user_id,
           FIRST_VALUE(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS first_event_type,
           FIRST_VALUE(value) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS first_value
    FROM events
    """,
    survey="W3 (docs/Norms.md:32-36 identity-row carries group metadata)",
)
def w3_first_row_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        ev.select(
            "user_id",
            F.first("event_type").over(w).alias("first_event_type"),
            F.first("value").over(w).alias("first_value"),
        )
        .distinct()
    )


@register(
    "zz_w4_year_over_year",
    oracle="""
    WITH yearly AS (
        SELECT o_custkey, CAST(year(o_orderdate) AS INT) AS order_year,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(27,6))) AS DOUBLE) AS spend
        FROM orders GROUP BY o_custkey, CAST(year(o_orderdate) AS INT)
    )
    SELECT o_custkey, order_year, spend,
           LAG(spend) OVER (PARTITION BY o_custkey ORDER BY order_year) AS prev_year_spend,
           spend - COALESCE(LAG(spend) OVER (PARTITION BY o_custkey ORDER BY order_year), 0.0) AS yoy_delta
    FROM yearly
    """,
    survey="W4 A10 (docs/Runbook.BulkDeleteExams.md:116 exam_longitudinal year-over-year)",
)
def w4_year_over_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    yearly = o.groupBy(
        "o_custkey", F.year("o_orderdate").alias("order_year")
    ).agg(_dsum(F.col("o_totalprice")).alias("spend"))
    w = Window.partitionBy("o_custkey").orderBy("order_year")
    prev = F.lag("spend").over(w)
    return yearly.select(
        "o_custkey", "order_year", "spend",
        prev.alias("prev_year_spend"),
        (F.col("spend") - F.coalesce(prev, F.lit(0.0))).alias("yoy_delta"),
    )


@register(
    "zz_w5_bounded_batches",
    oracle="""
    SELECT user_id, event_id, ts
    FROM (
        SELECT user_id, event_id, ts,
               ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
        FROM events WHERE event_type = 'error'
    ) WHERE rn <= 5
    """,
    survey="W5 (docs/API.md:434 resubmit limit=N batches over ordered backlog)",
)
def w5_bounded_batches(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").filter(F.col("event_type") == "error")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 5)
        .select("user_id", "event_id", "ts")
    )


@register(
    "zz_o1_top_k",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 10
    """,
    survey="O1 (docs/Monitoring.md:211-220 ORDER BY … LIMIT k)",
)
def o1_top_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    return (
        o.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(10)
        .select("o_orderkey", "o_custkey", "o_totalprice")
    )


@register(
    "zz_u1_union_all_tagged",
    oracle="""
    SELECT src, o_orderpriority, COUNT(*) AS n
    FROM (
        SELECT 'finished' AS src, o_orderpriority FROM orders WHERE o_orderstatus = 'F'
        UNION ALL
        SELECT 'open' AS src, o_orderpriority FROM orders WHERE o_orderstatus = 'O'
    )
    GROUP BY src, o_orderpriority
    """,
    survey="U1 (docs/Runbook.Audit.md:232-301 UNION ALL current ∪ audit)",
)
def u1_union_all_tagged(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    fin = o.filter(F.col("o_orderstatus") == "F").select(
        F.lit("finished").alias("src"), "o_orderpriority"
    )
    op = o.filter(F.col("o_orderstatus") == "O").select(
        F.lit("open").alias("src"), "o_orderpriority"
    )
    return fin.unionByName(op).groupBy("src", "o_orderpriority").agg(F.count("*").alias("n"))


@register(
    "zz_u2_union_distinct",
    oracle="""
    SELECT n_name FROM (
        SELECT c_nationkey AS nk FROM customer
        UNION
        SELECT s_nationkey AS nk FROM supplier
    ) JOIN nation ON nk = n_nationkey
    """,
    survey="U2 (docs/StudentGroups.md:265-291 UNION-dedup members ∪ users)",
)
def u2_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nk"))
    s = _t(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nk"))
    n = _t(spark, sf_dir, "nation")
    return (
        c.unionByName(s)
        .distinct()
        .join(F.broadcast(n), F.col("nk") == n.n_nationkey)
        .select("n_name")
    )


@register(
    "zz_u3_date_dim_densify",
    oracle="""
    WITH bounds AS (
        SELECT CAST(MIN(o_orderdate) AS DATE) AS lo, CAST(MAX(o_orderdate) AS DATE) AS hi FROM orders
    ), dates AS (
        SELECT lo + CAST(gs AS INT) AS d
        FROM bounds, generate_series(0, 20000) AS t(gs)
        WHERE lo + CAST(gs AS INT) <= hi
    ), daily AS (
        SELECT CAST(o_orderdate AS DATE) AS d, COUNT(*) AS n FROM orders GROUP BY 1
    )
    SELECT dates.d AS order_date, COALESCE(daily.n, 0) AS n_orders
    FROM dates LEFT JOIN daily ON dates.d = daily.d
    """,
    survey="U3 (docs/Monitoring.md:229-233 synthesized date dimension, densified counts)",
)
def u3_date_dim_densify(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    bounds = o.agg(
        F.min(F.to_date("o_orderdate")).alias("lo"), F.max(F.to_date("o_orderdate")).alias("hi")
    )
    dates = bounds.select(
        F.explode(F.sequence("lo", "hi", F.expr("INTERVAL 1 DAY"))).alias("order_date")
    )
    daily = o.groupBy(F.to_date("o_orderdate").alias("d")).agg(F.count("*").alias("n"))
    return (
        dates.join(daily, dates.order_date == daily.d, "left")
        .select("order_date", F.coalesce("n", F.lit(0)).alias("n_orders"))
    )


# --------------------------------------------------------------------------
# Scalar function surface (§2.9)
# --------------------------------------------------------------------------

@register(
    "zz_f_scalar_functions",
    oracle="""
    SELECT c_custkey,
           concat(c_name, ' [', c_mktsegment, ']')        AS display_name,
           coalesce(nullif(c_mktsegment, 'BUILDING'), 'DEFAULT') AS segment_or_default,
           substr(c_name, 1, 8)                           AS name_prefix,
           md5(c_name)                                    AS name_digest,
           regexp_replace(c_name, '[0-9]', '', 'g')       AS name_no_digits,
           CASE WHEN c_acctbal < 0 THEN 'debit'
                WHEN c_acctbal < 5000 THEN 'normal'
                ELSE 'premium' END                        AS balance_class,
           abs(c_acctbal)                                 AS abs_balance
    FROM customer
    WHERE c_custkey <= 500
    """,
    survey="§2.9 scalar fns (CONCAT/COALESCE/SUBSTR/MD5/CASE/regex — docs/Runbook.Audit.md:121, "
    "docs/PerformanceTuning.Redshift.md:69-133, docs/Monitoring.md:448-453)",
)
def f_scalar_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer").filter(F.col("c_custkey") <= 500)
    return c.select(
        "c_custkey",
        F.concat(F.col("c_name"), F.lit(" ["), F.col("c_mktsegment"), F.lit("]")).alias(
            "display_name"
        ),
        F.coalesce(F.nullif(F.col("c_mktsegment"), F.lit("BUILDING")), F.lit("DEFAULT")).alias(
            "segment_or_default"
        ),
        F.substring("c_name", 1, 8).alias("name_prefix"),
        F.md5("c_name").alias("name_digest"),
        F.regexp_replace("c_name", "[0-9]", "").alias("name_no_digits"),
        F.when(F.col("c_acctbal") < 0, "debit")
        .when(F.col("c_acctbal") < 5000, "normal")
        .otherwise("premium")
        .alias("balance_class"),
        F.abs("c_acctbal").alias("abs_balance"),
    )


@register(
    "zz_f_json_extraction",
    oracle="""
    SELECT CAST(regexp_extract(props, '"k": (-?\\d+)', 1) AS INT) AS k,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(27,6))) AS DOUBLE) / COUNT(*) AS avg_value
    FROM events
    GROUP BY 1
    """,
    survey="§2.9 JSON extraction (docs/Troubleshooting.md:427-429 report_request JSON)",
)
def f_json_extraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    return (
        ev.withColumn(
            "k", F.regexp_extract("props", r'"k": (-?\d+)', 1).cast("int")
        )
        .groupBy("k")
        .agg(F.count("*").alias("n_events"), _davg(F.col("value")).alias("avg_value"))
    )
