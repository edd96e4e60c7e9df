"""Time-series gap fill + linear interpolation — the hypertable/continuous-
aggregate companion to U3's date densification (reference analog:
docs/Monitoring.md:229-233 synthesizes a date dimension to densify counts;
this extends that to VALUE interpolation across the synthesized gaps, the
`interpolate()` shape time-series stores ship).

Scale shape: one partial-aggregated groupBy to the (key, bucket) grain,
one per-key bounds aggregate + map-only ``sequence`` explode for the
calendar (each key's calendar is generated where the key lives — no
driver-side date loop, no cross join against a global calendar), a
left join back, then two PARTITIONED window passes (per key, ordered by
bucket) for the bracketing non-null neighbors. Window state is O(rows
per key), which is the honest cost of neighbor lookup; keys parallelize.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def gap_fill_interpolate(
    df: DataFrame,
    key_cols: list[str],
    day_col: str,
    value_col: str,
) -> DataFrame:
    """Densify each key's daily series between its own min and max day and
    linearly interpolate missing values: for a gap day ``t`` between the
    bracketing observed days ``(pt, pv)`` and ``(nt, nv)``,

        value(t) = pv + (nv - pv) * (t - pt) / (nt - pt)

    Output: ``(key…, day, value, interpolated)`` — observed rows carry
    their value with ``interpolated = false``; synthesized rows carry the
    interpolation with ``true``. Fixed-order double arithmetic (exact
    integer day differences promoted once) so the result is reproducible
    across engines/partitionings. Endpoints are always observed by
    construction (the calendar spans min..max of the key's own data), so
    no extrapolation case exists.
    """
    k = list(key_cols)
    observed = df.select(*k, F.col(day_col).alias("_d"),
                         F.col(value_col).alias("_v"))
    bounds = observed.groupBy(*k).agg(
        F.min("_d").alias("_lo"), F.max("_d").alias("_hi")
    )
    calendar = bounds.select(
        *k,
        F.explode(F.sequence("_lo", "_hi", F.expr("INTERVAL 1 DAY")))
        .alias("_d"),
    )
    dense = calendar.join(observed, [*k, "_d"], "left")

    w_back = (
        Window.partitionBy(*k).orderBy("_d")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_fwd = (
        Window.partitionBy(*k).orderBy("_d")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    pv = F.last("_v", ignorenulls=True).over(w_back)
    pt = F.last(F.when(F.col("_v").isNotNull(), F.col("_d")),
                ignorenulls=True).over(w_back)
    nv = F.first("_v", ignorenulls=True).over(w_fwd)
    nt = F.first(F.when(F.col("_v").isNotNull(), F.col("_d")),
                 ignorenulls=True).over(w_fwd)
    frac = (
        F.datediff(F.col("_d"), F.col("_pt")).cast("double")
        / F.datediff(F.col("_nt"), F.col("_pt")).cast("double")
    )
    return (
        dense
        .withColumn("_pv", pv).withColumn("_pt", pt)
        .withColumn("_nv", nv).withColumn("_nt", nt)
        .select(
            *k,
            F.col("_d").alias(day_col),
            F.when(F.col("_v").isNotNull(), F.col("_v"))
            .otherwise(
                F.col("_pv")
                + (F.col("_nv") - F.col("_pv")) * frac
            ).alias(value_col),
            F.col("_v").isNull().alias("interpolated"),
        )
    )
