"""One-pass table profiling — per-column null rates, exact distinct
counts, numeric min/max/mean, string length bounds.

The data-quality primitive in front of every large ingest (reference
analog: the input-validation tier of docs/Runbook.DataSpecifications.md —
schema/row validation before load; this is its statistical counterpart
over a landed table).

Everything is ONE ``df.agg`` over the input: Spark plans the multiple
exact ``count_distinct`` aggregates as a single scan with an Expand
(one duplicated stream per distinct aggregate — the standard
multi-distinct plan; cost is #profiled-columns × scan width, which is
why ``cols`` is an explicit argument rather than "all"). The single
1-row result is then unpivoted to long format with ``stack`` — no
driver-side collect, no per-column jobs.

At 100 TB: profile the columns you need, not the table; for
monitoring-grade profiles where exactness doesn't matter pass
``approx=True`` and the distinct counts switch to HLL++
(``approx_count_distinct``, one pass, NO Expand) at ~5% rsd.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_NUMERIC = {"tinyint", "smallint", "int", "bigint", "float", "double"}


def profile_columns(
    df: DataFrame, cols: list[str] | None = None, approx: bool = False
) -> DataFrame:
    """Long-format profile: one row per column with
    ``(column, dtype, n_rows, n_null, n_distinct, min_num, max_num,
    avg_num, min_len, max_len)``. ``*_num`` are NULL for non-numeric
    columns, ``*_len`` NULL for non-string; ``n_distinct`` ignores NULLs
    (COUNT DISTINCT semantics). ``avg_num`` uses the decimal-accumulate
    pattern so it is reproducible across partitionings and engines.
    """
    cols = cols or df.columns
    dtypes = dict(df.dtypes)
    unknown = [c for c in cols if c not in dtypes]
    if unknown:
        raise ValueError(f"unknown columns: {unknown}")
    ndistinct = F.approx_count_distinct if approx else F.count_distinct

    aggs = [F.count(F.lit(1)).alias("_n")]
    for c in cols:
        col = F.col(f"`{c}`")
        aggs += [
            F.count(col).alias(f"_nn_{c}"),
            ndistinct(col).cast("long").alias(f"_nd_{c}"),
        ]
        if dtypes[c] in _NUMERIC or dtypes[c].startswith("decimal"):
            aggs += [
                F.min(col).cast("double").alias(f"_min_{c}"),
                F.max(col).cast("double").alias(f"_max_{c}"),
                (
                    F.sum(col.cast("decimal(27,6)")).cast("double")
                    / F.count(col)
                ).alias(f"_avg_{c}"),
            ]
        elif dtypes[c] == "string":
            aggs += [
                F.min(F.length(col)).cast("long").alias(f"_minl_{c}"),
                F.max(F.length(col)).cast("long").alias(f"_maxl_{c}"),
            ]
    one = df.agg(*aggs)

    parts = []
    for c in cols:
        num = dtypes[c] in _NUMERIC or dtypes[c].startswith("decimal")
        s = dtypes[c] == "string"
        parts.append(
            f"'{c}', '{dtypes[c]}', _n, _n - `_nn_{c}`, `_nd_{c}`, "
            + (f"`_min_{c}`, `_max_{c}`, `_avg_{c}`, " if num
               else "CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE), ")
            + (f"`_minl_{c}`, `_maxl_{c}`" if s
               else "CAST(NULL AS BIGINT), CAST(NULL AS BIGINT)")
        )
    stack = (
        f"stack({len(cols)}, " + ", ".join(parts) + ") AS (column_name, "
        "dtype, n_rows, n_null, n_distinct, min_num, max_num, avg_num, "
        "min_len, max_len)"
    )
    return one.select(F.expr(stack))
