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
                    # decimal(38,12): 12 fractional digits keeps sub-1e-6
                    # magnitudes from rounding to 0 and 26 integer digits
                    # covers sums up to ~1e26 (the correlation_matrix
                    # accumulator width — see ADVICE r6).
                    F.sum(col.cast("decimal(38,12)")).cast("double")
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


def correlation_matrix(df: DataFrame, cols: list[str]) -> DataFrame:
    """Exact Pearson correlation for every pair of ``cols`` in ONE pass —
    long format ``(col_a, col_b, n, corr)`` for the C(k,2) pairs.

    All moments (Σx, Σx², Σxy) accumulate as DECIMAL — exact and
    associative, so unlike ``F.corr`` (Welford on doubles, partial-agg
    order-dependent) the result is bit-identical across partitionings and
    engines. The correlation itself is one fixed-order double expression
    per pair: ``(n·Sxy − Sx·Sy) / (sqrt(n·Sxx − Sx²)·sqrt(n·Syy − Sy²))``
    (sqrt is IEEE-correctly-rounded everywhere). Constant columns yield
    NULL (0/0 guarded via NULLIF-style predicate).

    One scan, one 1-row agg, no shuffle beyond the final partial-agg
    reduce; the k + C(k,2) decimal accumulators are the whole state, so
    at 100 TB this costs exactly one pass over the projected columns.
    Rows where ANY profiled column is NULL are excluded (pairwise-complete
    would need per-pair counts; listwise keeps one shared n).
    """
    if len(cols) < 2:
        raise ValueError("need at least two columns")
    d = df.select(*[F.col(c).cast("double").alias(c) for c in cols]).na.drop()
    dec = "decimal(38,12)"
    aggs = [F.count(F.lit(1)).alias("_n")]
    for c in cols:
        aggs.append(F.sum(F.col(c).cast(dec)).alias(f"_s_{c}"))
        aggs.append(F.sum((F.col(c) * F.col(c)).cast(dec)).alias(f"_ss_{c}"))
    pairs = [(a, b) for i, a in enumerate(cols) for b in cols[i + 1:]]
    for a, b in pairs:
        aggs.append(F.sum((F.col(a) * F.col(b)).cast(dec)).alias(f"_sp_{a}_{b}"))
    one = d.agg(*aggs)

    parts = []
    for a, b in pairs:
        num = (
            f"(CAST(_n AS DOUBLE) * CAST(`_sp_{a}_{b}` AS DOUBLE)"
            f" - CAST(`_s_{a}` AS DOUBLE) * CAST(`_s_{b}` AS DOUBLE))"
        )
        va = (
            f"(CAST(_n AS DOUBLE) * CAST(`_ss_{a}` AS DOUBLE)"
            f" - CAST(`_s_{a}` AS DOUBLE) * CAST(`_s_{a}` AS DOUBLE))"
        )
        vb = (
            f"(CAST(_n AS DOUBLE) * CAST(`_ss_{b}` AS DOUBLE)"
            f" - CAST(`_s_{b}` AS DOUBLE) * CAST(`_s_{b}` AS DOUBLE))"
        )
        corr = (
            f"CASE WHEN {va} <= 0 OR {vb} <= 0 THEN CAST(NULL AS DOUBLE)"
            f" ELSE {num} / (sqrt({va}) * sqrt({vb})) END"
        )
        parts.append(f"'{a}', '{b}', _n, {corr}")
    stack = (
        f"stack({len(pairs)}, " + ", ".join(parts)
        + ") AS (col_a, col_b, n, corr)"
    )
    return one.select(F.expr(stack))


def rank_statistics(
    df: DataFrame,
    part_cols: list[str],
    value_col: str,
    keep_cols: list[str] | None = None,
) -> DataFrame:
    """Per-row ``percent_rank`` and ``cume_dist`` within each partition —
    computed at VALUE granularity, not row granularity: aggregate to per-
    (partition, value) counts first, run the tiny cumulative window over
    DISTINCT VALUES, then join the stats back to the rows on
    (partition, value).

    Exactly equal to the SQL window functions (``PERCENT_RANK() =
    (min_rank-1)/(n-1)``, ``CUME_DIST() = rows_le_value/n`` — both are
    tie-invariant, which is what makes the value-level rewrite exact),
    but the window state is O(distinct values per partition) instead of
    O(rows per partition): a 100 TB fact with a 5-value partition key and
    a bounded-cardinality measure never drags rows through a per-
    partition sort — the classic skewed-window fix. The join back is a
    NULL-SAFE equi-join on (partition, value): SQL window functions rank
    NULL values (they sort as a tie group) rather than dropping the rows,
    so a plain equi-join would silently lose every row with a NULL
    partition key or NULL value — ``eqNullSafe`` keeps them and still
    plans as a hash equi-join, reusing the counts shuffle partitioning.
    """
    keep = list(keep_cols or [])
    counts = df.groupBy(*part_cols, value_col).agg(
        F.count(F.lit(1)).alias("_c")
    )
    from pyspark.sql import Window

    wp = Window.partitionBy(*part_cols).orderBy(value_col)
    wall = Window.partitionBy(*part_cols)
    stats = (
        counts
        .withColumn("_cum", F.sum("_c").over(
            wp.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .withColumn("_n", F.sum("_c").over(wall))
        .select(
            *part_cols, value_col,
            # min rank of the tie group = rows strictly below + 1
            F.when(F.col("_n") > 1,
                   (F.col("_cum") - F.col("_c")).cast("double")
                   / (F.col("_n") - 1)).otherwise(F.lit(0.0))
                .alias("percent_rank"),
            (F.col("_cum").cast("double") / F.col("_n")).alias("cume_dist"),
        )
    )
    join_keys = [*part_cols, value_col]
    rhs = stats
    for c in join_keys:
        rhs = rhs.withColumnRenamed(c, f"__r_{c}")
    lhs = df.select(*join_keys, *keep)
    cond = None
    for c in join_keys:
        eq = lhs[c].eqNullSafe(rhs[f"__r_{c}"])
        cond = eq if cond is None else (cond & eq)
    return lhs.join(rhs, cond).drop(*[f"__r_{c}" for c in join_keys])


def distinct_sketch_rollup(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    lgk: int = 12,
) -> DataFrame:
    """Mergeable distinct-count sketches — the 100 TB pattern for
    COUNT(DISTINCT) over arbitrary slices: build one Apache DataSketches
    HLL per fine-grained group ONCE (``(group…, sketch, estimate)``),
    then answer any coarser-grained distinct question by merging sketches
    (:func:`merge_distinct_sketches`) without ever rescanning the fact.

    A raw COUNT(DISTINCT) re-shuffles the full fact per question asked;
    a stored sketch cube answers every rollup from O(groups) bytes. The
    estimate is within ~1.6%/sqrt(2^lgk) rsd (lgk=12 → ~2.5%). Merging
    is commutative/associative and deterministic, and the merged
    estimate stays inside the same rsd envelope — but it is NOT
    bit-identical to a direct single-pass sketch (the union gadget's
    internal representation differs from a freshly built sketch), so
    incremental maintenance agrees with a full rebuild to within the
    error bound, not exactly — pytest-locked at 5% against exact.

    One partial-aggregated shuffle; the sketch binary is the only state.
    """
    return df.groupBy(*group_cols).agg(
        F.hll_sketch_agg(F.col(value_col), F.lit(lgk)).alias("sketch")
    ).withColumn("estimate", F.hll_sketch_estimate("sketch"))


def merge_distinct_sketches(
    sketches: DataFrame, group_cols: list[str]
) -> DataFrame:
    """Roll a sketch table up to a coarser grain: union the HLL binaries
    per surviving group and re-estimate. Input is the (tiny) sketch
    table, so this never touches the fact — the whole point."""
    return sketches.groupBy(*group_cols).agg(
        F.hll_union_agg("sketch").alias("sketch")
    ).withColumn("estimate", F.hll_sketch_estimate("sketch"))


def equi_depth_histogram(
    df: DataFrame,
    value_col: str,
    buckets: int = 10,
    exact: bool = True,
    order_cols: list[str] | None = None,
) -> DataFrame:
    """Equi-depth (equal-frequency) histogram over ``value_col``:
    ``(bucket, n, lo, hi, total)`` with ``total`` decimal-accumulated.

    ``exact=True`` is NTILE over a TOTAL order (``value_col`` plus
    ``order_cols`` tiebreak for deterministic boundaries under ties) —
    bit-reproducible and oracle-comparable, but the global sort is a
    SINGLE-TASK window at scale: correct at any size, pathological
    beyond ~10^8 rows per executor.

    ``exact=False`` is the 100 TB plan: ONE ``approx_percentile`` pass
    computes the ``buckets-1`` interior cut points (tiny array on the
    driver plan as a literal-free aggregate), then a map-only pass
    assigns each row its bucket by counting cuts below the value
    (``F.aggregate`` over the cut array — the a9/j8 broadcast-tiny-stats
    pattern), then one groupBy. No window, no global sort, two scans.
    Bucket populations are approximate at the cut boundaries
    (approx_percentile error + ties all land one side), bucket COUNT is
    exact per assigned bucket. Empty buckets (possible under heavy ties)
    are absent from the output rather than zero-filled.
    """
    if buckets < 2:
        raise ValueError("buckets must be >= 2")
    v = F.col(value_col)
    if exact:
        from pyspark.sql import Window

        w = Window.orderBy(value_col, *(order_cols or []))
        assigned = df.withColumn("bucket", F.ntile(buckets).over(w))
    else:
        probs = [i / buckets for i in range(1, buckets)]
        cuts = df.agg(
            F.percentile_approx(
                v.cast("double"), F.array(*[F.lit(p) for p in probs]), 10_000
            ).alias("_cuts")
        )
        # Tiny 1-row frame: broadcast cross-join, then bucket = 1 + number
        # of interior cuts strictly below the value — pure map-side.
        assigned = df.crossJoin(F.broadcast(cuts)).withColumn(
            "bucket",
            (
                F.lit(1)
                + F.aggregate(
                    F.col("_cuts"),
                    F.lit(0),
                    lambda acc, c: acc
                    + F.when(v.cast("double") > c, 1).otherwise(0),
                )
            ).cast("int"),
        )
    return (
        assigned.groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min(v).alias("lo"),
            F.max(v).alias("hi"),
            F.sum(v.cast("decimal(27,6)")).cast("double").alias("total"),
        )
    )


def group_regression(
    df: DataFrame, group_cols: list[str], x_col: str, y_col: str
) -> DataFrame:
    """Per-group simple OLS ``y = slope·x + intercept`` with the same
    exactness contract as :func:`correlation_matrix`: decimal-accumulated
    moments (one groupBy, map-side partial agg), coefficients assembled
    as fixed-order double expressions — reproducible across
    partitionings and engines. Output per group: ``(group…, n, slope,
    intercept, r2)``; groups with zero x-variance yield NULLs. Rows with
    NULL x or y are excluded.
    """
    dec = "decimal(38,12)"
    x = F.col(x_col).cast("double")
    y = F.col(y_col).cast("double")
    d = df.filter(x.isNotNull() & y.isNotNull())
    m = d.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(x.cast(dec)).alias("_sx"),
        F.sum(y.cast(dec)).alias("_sy"),
        F.sum((x * x).cast(dec)).alias("_sxx"),
        F.sum((y * y).cast(dec)).alias("_syy"),
        F.sum((x * y).cast(dec)).alias("_sxy"),
    )
    nd = F.col("n").cast("double")
    sx, sy = F.col("_sx").cast("double"), F.col("_sy").cast("double")
    sxx, syy = F.col("_sxx").cast("double"), F.col("_syy").cast("double")
    sxy = F.col("_sxy").cast("double")
    varx = nd * sxx - sx * sx
    vary = nd * syy - sy * sy
    cov = nd * sxy - sx * sy
    slope = F.when(varx > 0, cov / varx)
    intercept = F.when(varx > 0, (sy - (cov / varx) * sx) / nd)
    r2 = F.when((varx > 0) & (vary > 0), (cov / varx) * (cov / vary))
    return m.select(
        *group_cols, "n",
        slope.alias("slope"),
        intercept.alias("intercept"),
        r2.alias("r2"),
    )


def chi_square_independence(
    df: DataFrame, col_a: str, col_b: str
) -> DataFrame:
    """Pearson chi-square test of independence between two categorical
    columns, plus Cramér's V effect size: one row
    ``(chi2, dof, n, cramers_v)``.

    Scale shape: ONE partial-agg shuffle builds the contingency counts
    (the only pass over the fact); margins and the full R×C grid
    (including zero cells — they contribute their expected mass) are
    O(categories²) and broadcast. The final statistic folds the cell
    terms in SORTED (a, b) order via ``F.aggregate`` — a deterministic
    sequential double sum, so the value is bit-identical across runs,
    partitionings, and engines (the ordered-fold trick: the float-sum
    analog of the decimal-accumulate pattern, usable because cells are
    few). NULL categories participate as their own level is NOT standard
    chi-square — NULL rows are excluded (SQL GROUP BY would keep them;
    callers wanting a "missing" level should fillna first).
    """
    a, b = F.col(col_a).cast("string"), F.col(col_b).cast("string")
    counts = (
        df.filter(a.isNotNull() & b.isNotNull())
        .select(a.alias("_a"), b.alias("_b"))
        .groupBy("_a", "_b")
        .agg(F.count(F.lit(1)).alias("_o"))
    )
    rt = counts.groupBy("_a").agg(F.sum("_o").alias("_r"))
    ct = counts.groupBy("_b").agg(F.sum("_o").alias("_t"))
    grid = (
        rt.crossJoin(F.broadcast(ct))
        .join(counts, ["_a", "_b"], "left")
        .select(
            "_a", "_b", "_r", "_t",
            F.coalesce("_o", F.lit(0)).cast("long").alias("_o"),
        )
    )
    e = (F.col("_r").cast("double") * F.col("_t").cast("double")) / F.col("_n")
    d = F.col("_o").cast("double") - e
    cells = (
        grid.crossJoin(F.broadcast(
            counts.agg(F.sum("_o").cast("double").alias("_n"))))
        .select(
            F.struct(
                F.col("_a"), F.col("_b"), (d * d / e).alias("term")
            ).alias("_cell"),
            "_n",
            F.col("_r"), F.col("_t"),
        )
    )
    agg = cells.agg(
        F.aggregate(
            F.transform(
                F.array_sort(F.collect_list("_cell")), lambda x: x["term"]
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ).alias("chi2"),
        F.count_distinct(F.col("_cell")["_a"]).alias("_nr"),
        F.count_distinct(F.col("_cell")["_b"]).alias("_nc"),
        F.first("_n").alias("n_d"),
    )
    return agg.select(
        F.col("chi2"),
        ((F.col("_nr") - 1) * (F.col("_nc") - 1)).cast("int").alias("dof"),
        F.col("n_d").cast("long").alias("n"),
        F.sqrt(
            F.col("chi2")
            / (F.col("n_d") * F.least(F.col("_nr") - 1, F.col("_nc") - 1))
        ).alias("cramers_v"),
    )


def winsorize(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    lower: float = 0.01,
    upper: float = 0.99,
    keep_cols: list[str] | None = None,
) -> DataFrame:
    """Per-group winsorization: clamp ``value_col`` to the group's exact
    [``lower``, ``upper``] percentiles — the standard outlier-taming
    transform a training pipeline applies before normalization. Output:
    ``(group…, keep…, <value_col>, winsorized, clipped)``.

    Exact ``percentile`` (linear interpolation — the quantile_cont
    contract, engine-parity bit-exact) rather than approx: the cut
    points ARE the operator's semantics. Scale shape: one partial-agg
    shuffle to the group grain for the two cut points, one equi-join
    back (the O(groups) cut frame broadcasts), a codegen'd
    least∘greatest clamp — the fact is scanned once and never shuffles.
    Group keys join NULL-SAFE, so a NULL group winsorizes within its own
    stratum instead of silently passing through (the rank_statistics
    lesson). NULL values stay NULL with ``clipped = false``.
    """
    if not 0.0 <= lower < upper <= 1.0:
        raise ValueError(f"need 0 <= lower < upper <= 1, got "
                         f"({lower}, {upper})")
    g = list(group_cols)
    # group keys renamed in the derived frame: joining a frame back onto
    # its own ancestor with shared column lineage is ambiguous to Spark
    cuts = df.groupBy(*g).agg(
        F.expr(f"percentile({value_col}, {lower!r}D)").alias("_lo"),
        F.expr(f"percentile({value_col}, {upper!r}D)").alias("_hi"),
    ).select(
        *[F.col(c).alias(f"_g_{c}") for c in g], "_lo", "_hi"
    )
    cond = None
    for c in g:
        e = F.col(c).eqNullSafe(F.col(f"_g_{c}"))
        cond = e if cond is None else (cond & e)
    v = F.col(value_col)
    # guard NULL values explicitly: least/greatest SKIP nulls in both
    # engines, so an unguarded clamp would pin a NULL to the lower cut
    win = F.when(
        v.isNotNull(), F.least(F.greatest(v, F.col("_lo")), F.col("_hi"))
    )
    return (
        df.join(F.broadcast(cuts), cond)
        .select(
            *g,
            *(keep_cols or []),
            v,
            win.alias("winsorized"),
            F.coalesce(win != v, F.lit(False)).alias("clipped"),
        )
    )


def target_encode_loo(
    df: DataFrame,
    cat_cols: list[str],
    target_col: str,
    keep_cols: list[str] | None = None,
) -> DataFrame:
    """Leave-one-out target encoding: each row's category encoded as the
    mean target of the OTHER rows in its category,
    ``(S_cat - y_i) / (n_cat - 1)`` — the leakage-safe form (plain mean
    encoding leaks each row's own label into its feature; LOO is the
    standard fix). A NULL-target row contributes nothing to leak, so it
    is encoded as the category's plain mean over the non-null targets
    (``S_cat / n_cat``). Rows with no "other rows" evidence — singleton
    categories, and NULL-target rows in an all-null category — fall
    back to the global mean. Output:
    ``(cat…, keep…, <target_col>, encoded)``.

    Engine-parity exact: category sums accumulate in decimal(27,6), the
    subtraction stays decimal, and each encoding is ONE double division
    (no float running sums). Scale shape: one partial-agg shuffle to the
    category grain, one null-safe equi-join back (O(categories) frame —
    broadcasts), one 1-row global-mean frame cross-joined; the fact is
    scanned twice (stats + encode) and never shuffles.
    """
    g = list(cat_cols)
    dec = F.col(target_col).cast("decimal(27,6)")
    # category keys renamed in the derived frame (self-join lineage)
    stats = df.groupBy(*g).agg(
        F.sum(dec).alias("_s"), F.count(target_col).alias("_n")
    ).select(*[F.col(c).alias(f"_g_{c}") for c in g], "_s", "_n")
    gm = df.agg(
        (F.sum(dec).cast("double") / F.count(target_col)).alias("_gm")
    )
    cond = None
    for c in g:
        e = F.col(c).eqNullSafe(F.col(f"_g_{c}"))
        cond = e if cond is None else (cond & e)
    enc = (
        F.when(
            dec.isNull() & (F.col("_n") >= 1),
            F.col("_s").cast("double") / F.col("_n"),
        )
        .when(
            dec.isNotNull() & (F.col("_n") > 1),
            (F.col("_s") - dec).cast("double") / (F.col("_n") - F.lit(1)),
        )
        .otherwise(F.col("_gm"))
    )
    return (
        df.join(F.broadcast(stats), cond)
        .crossJoin(F.broadcast(gm))
        .select(
            *g,
            *(keep_cols or []),
            F.col(target_col),
            enc.alias("encoded"),
        )
    )


def concentration_stats(
    df: DataFrame,
    group_cols: list[str],
    weight_col: str | None = None,
) -> DataFrame:
    """Mix-concentration diagnostics over the ``group_cols`` partition of
    the data — how balanced is a training mix across its sources:
    one row ``(n_groups, total_weight, gini, hhi, top1_share)`` where
    ``gini`` is the Gini coefficient of the per-group totals
    (0 = perfectly balanced, →1 = one group holds everything), ``hhi``
    the Herfindahl–Hirschman index (Σ share²), and ``top1_share`` the
    largest group's fraction. ``weight_col`` weights rows (token counts,
    bytes); default is row count.

    Engine-parity exact: per-group totals are exact integers (or
    decimal sums cast once), the Gini numerator ``Σ (2i−k−1)·w_i`` over
    rank-ordered totals is pure integer arithmetic, and every metric is
    a single double division of exact quantities — no float folds at
    all. Scale shape: one partial-agg shuffle to the group grain, then
    a rank window + final aggregate over the O(groups) frame (the
    bounded-window pattern — group counts are small by definition of
    "mix"). Ranks order by (total, group) so ties are deterministic.
    """
    from pyspark.sql import Window

    g = list(group_cols)
    w = (F.count(F.lit(1)) if weight_col is None
         else F.sum(F.col(weight_col).cast("long")))
    counts = df.groupBy(*g).agg(w.alias("_w"))
    win = Window.orderBy("_w", *g)
    ranked = counts.select("_w", F.row_number().over(win).alias("_i"))
    # Σ(2i−k−1)·w_i decomposed as 2·Σ(i·w) − (k+1)·Σw so k never needs
    # to be visible per row — everything is a plain integer aggregate
    k = F.count(F.lit(1))
    total = F.sum("_w")
    si = F.sum(F.col("_i") * F.col("_w"))
    return ranked.agg(
        k.cast("long").alias("n_groups"),
        total.cast("long").alias("total_weight"),
        (
            (2 * si - (k + 1) * total).cast("double")
            / (k.cast("double") * total.cast("double"))
        ).alias("gini"),
        (
            F.sum(F.col("_w") * F.col("_w")).cast("double")
            / (total.cast("double") * total.cast("double"))
        ).alias("hhi"),
        (F.max("_w").cast("double") / total.cast("double"))
        .alias("top1_share"),
    )


def k_anonymity_report(
    df: DataFrame,
    qi_cols: list[str],
    k: int = 5,
) -> DataFrame:
    """Privacy-governance check before a data release: group by the
    quasi-identifier combination and flag equivalence classes smaller
    than ``k`` — rows in those classes are re-identifiable by joining
    the QI columns against outside data (Sweeney's k-anonymity). Returns
    one row per class: ``(qi…, n, is_k_anonymous)``; feed the flags to
    :func:`suppress_small_classes` to enforce the property.

    One partial-agg shuffle at the QI grain; NULL QI values form their
    own class (SQL GROUP BY semantics — a NULL birthdate is itself a
    linkable signal)."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    return df.groupBy(*qi_cols).agg(F.count(F.lit(1)).alias("n")).withColumn(
        "is_k_anonymous", F.col("n") >= k)


def suppress_small_classes(
    df: DataFrame,
    qi_cols: list[str],
    k: int = 5,
) -> DataFrame:
    """Enforce k-anonymity by suppression: drop every row whose QI
    equivalence class has fewer than ``k`` members. The classic
    generalize-or-suppress tradeoff's suppression arm — lossless for the
    surviving rows. One aggregate + one broadcastable semi-join on the
    (usually tiny relative to the fact) class table."""
    ok = k_anonymity_report(df, qi_cols, k).filter(
        F.col("is_k_anonymous")).select(*qi_cols)
    cond = None
    for c in qi_cols:
        eq = df[c].eqNullSafe(ok[c])
        cond = eq if cond is None else cond & eq
    return df.join(F.broadcast(ok), cond, "left_semi")


def _two_group_values(
    df: DataFrame, value_col: str, group_col: str, group_a, group_b
) -> DataFrame:
    """Shared two-sample projection for the drift-test siblings
    (:func:`mann_whitney_u`, :func:`ks_test`): ``(_v, _ia)`` with NULL
    values dropped and ``_ia = 1`` marking group-a membership."""
    return df.filter(F.col(group_col).isin([group_a, group_b])).select(
        F.col(value_col).alias("_v"),
        (F.col(group_col) == F.lit(group_a)).cast("long").alias("_ia"),
    ).filter(F.col("_v").isNotNull())


def mann_whitney_u(
    df: DataFrame,
    value_col: str,
    group_col: str,
    group_a,
    group_b,
) -> DataFrame:
    """Mann–Whitney U (Wilcoxon rank-sum) test between two groups — the
    nonparametric "did the distribution shift" check that needs no
    normality assumption (A/B quality scores, pre/post-filter length
    distributions), with the standard midrank tie handling and the
    tie-corrected normal approximation.

    Exactness: midranks are half-integers, so the rank-sum is carried
    DOUBLED as an exact integer (``r2_a = Σ c_a·(2·c_lt + c_eq + 1)``),
    ``u2_a = r2_a − n_a(n_a+1)`` likewise; the only float ops are the
    final fixed-order sigma/z expressions (one sqrt, correctly rounded
    everywhere). Bit-identical across engines and partitionings.

    Scale shape: one partial-agg shuffle onto the DISTINCT value frame
    (per-value group-a/total counts), one running-sum window over that
    bounded distinct-value frame (the measure's support, not the
    fact), one global aggregate. The fact never sorts."""
    from pyspark.sql import Window

    d = _two_group_values(df, value_col, group_col, group_a, group_b)
    per_val = d.groupBy("_v").agg(
        F.sum("_ia").alias("_ca"), F.count(F.lit(1)).alias("_ct"))
    w = (Window.orderBy("_v")
         .rowsBetween(Window.unboundedPreceding, -1))
    pv = per_val.withColumn(
        "_clt", F.coalesce(F.sum("_ct").over(w), F.lit(0)))
    agg = pv.agg(
        F.sum("_ca").alias("n_a"),
        F.sum(F.col("_ct") - F.col("_ca")).alias("n_b"),
        F.sum(F.col("_ca") * (F.lit(2) * F.col("_clt") + F.col("_ct")
                              + F.lit(1))).alias("r2_a"),
        F.sum(F.col("_ct") * F.col("_ct") * F.col("_ct") - F.col("_ct"))
        .alias("_ties"),
    )
    n = F.col("n_a") + F.col("n_b")
    u2a = F.col("r2_a") - F.col("n_a") * (F.col("n_a") + F.lit(1))
    var = (
        (F.col("n_a").cast("double") * F.col("n_b").cast("double") / F.lit(12.0))
        * ((n.cast("double") + F.lit(1.0))
           - F.col("_ties").cast("double")
           / (n.cast("double") * (n.cast("double") - F.lit(1.0))))
    )
    # degenerate inputs (a group absent, or every value tied so sigma=0)
    # report NULL sigma/z rather than engine-specific 0-division values
    ok = (F.col("n_a") > 0) & (F.col("n_b") > 0) & (n > 1)
    sigma = F.when(ok, F.sqrt(var))
    z = F.when(
        ok & (sigma > 0),
        (u2a.cast("double") - F.col("n_a").cast("double")
         * F.col("n_b").cast("double")) / (F.lit(2.0) * sigma))
    return agg.select(
        F.col("n_a").cast("long").alias("n_a"),
        F.col("n_b").cast("long").alias("n_b"),
        u2a.cast("long").alias("u2_a"),
        sigma.alias("sigma"),
        z.alias("z"),
    )


def ks_from_counts(per_val: DataFrame) -> DataFrame:
    """KS statistic from a per-distinct-value count frame
    ``(_v, _ca, _cb)`` — the shared core of :func:`ks_test` (batch, two
    groups of one frame) and ``streaming.aggstate.read_ks_drift`` (live
    ingest counts vs a frozen reference). Cumulative counts run over
    the bounded distinct-value support; the gap is the exact integer
    ``|cum_a·n_b − cum_b·n_a|``; d/z are one pinned double expression
    each (see ks_test for the full parity contract)."""
    from pyspark.sql import Window

    w = (Window.orderBy("_v")
         .rowsBetween(Window.unboundedPreceding, 0))
    wtot = (Window.orderBy("_v")
            .rowsBetween(Window.unboundedPreceding,
                         Window.unboundedFollowing))
    pv = per_val.select(
        F.sum("_ca").over(w).alias("_cuma"),
        F.sum("_cb").over(w).alias("_cumb"),
        F.sum("_ca").over(wtot).alias("_na"),
        F.sum("_cb").over(wtot).alias("_nb"))
    agg = pv.agg(
        F.max("_na").alias("n_a"),
        F.max("_nb").alias("n_b"),
        F.max(F.abs(F.col("_cuma") * F.col("_nb")
                    - F.col("_cumb") * F.col("_na"))).alias("d_num"),
    )
    na = F.col("n_a").cast("double")
    nb = F.col("n_b").cast("double")
    ok = (F.col("n_a") > 0) & (F.col("n_b") > 0)
    d_stat = F.when(ok, F.col("d_num").cast("double") / (na * nb))
    z = F.when(ok, F.sqrt(na * nb / (na + nb)) * d_stat)
    return agg.select(
        F.col("n_a").cast("long").alias("n_a"),
        F.col("n_b").cast("long").alias("n_b"),
        F.col("d_num").cast("long").alias("d_num"),
        d_stat.alias("d_stat"),
        z.alias("z"),
    )


def ks_test(
    df: DataFrame,
    value_col: str,
    group_col: str,
    group_a,
    group_b,
) -> DataFrame:
    """Two-sample Kolmogorov–Smirnov statistic between two groups — the
    distribution-drift companion to :func:`mann_whitney_u` (MW sees
    location shifts; KS sees ANY ECDF divergence: variance, shape,
    multimodality — the standard "did this feature drift between
    snapshots/domains" screen next to migrate's PSI gate, without PSI's
    binning choice).

    Exactness: at every distinct value the ECDF gap is carried as the
    exact integer ``|cum_a·n_b − cum_b·n_a|`` (cross-multiplied — no
    per-step division), the max is an integer max, and
    ``d = d_num / (n_a·n_b)`` plus the asymptotic
    ``z = sqrt(n_a·n_b/(n_a+n_b))·d`` are each one fixed-order double
    expression. Bit-identical across engines and partitionings.

    Scale shape: one partial-agg shuffle onto the DISTINCT value frame
    (per-value per-group counts), one running-sum window over that
    support, one global max — the fact never sorts (the mann_whitney_u
    shape exactly). The window is single-task over the SUPPORT, so for
    continuous measures (distinct ≈ rows) pre-quantize — e.g.
    ``F.round(v, 3)`` — to bound it; KS on quantized values is the KS
    of the binned ECDFs, the standard practice at scale."""
    d = _two_group_values(df, value_col, group_col, group_a, group_b)
    per_val = d.groupBy("_v").agg(
        F.sum("_ia").alias("_ca"),
        F.sum(F.lit(1) - F.col("_ia")).alias("_cb"))
    return ks_from_counts(per_val)


def mad_outliers(
    df: DataFrame,
    group_col: str,
    value_col: str,
    k: float = 3.0,
) -> DataFrame:
    """Robust per-group outlier screen via the median absolute deviation
    (Hampel's rule): a point is flagged when ``|v − median| > k · MAD``.
    Unlike the z-score screen the estimator itself cannot be dragged by
    the outliers it is hunting (50% breakdown point).

    Exactness: both medians are the LOWER median (nearest-rank
    ``ceil(n/2)`` order statistic) — a VALUE FROM THE DATA selected by
    integer rank arithmetic, no interpolation, no floats — so results
    are bit-identical across engines; the final comparison is one
    exact-IEEE subtraction per row against ``k·MAD`` (one multiply).

    Output per group: ``(group, n, median, mad, n_outliers)``.

    Scale shape: two ranking windows partitioned BY GROUP (never
    global) + two joins of the O(groups) median frames back; one final
    partial-agg groupBy. Groups bound window state."""
    from pyspark.sql import Window

    d = df.filter(F.col(value_col).isNotNull())
    wg = Window.partitionBy(group_col).orderBy(value_col)
    sizes = d.groupBy(group_col).agg(F.count(F.lit(1)).alias("_n"))
    med = (
        d.withColumn("_r", F.row_number().over(wg))
        .join(F.broadcast(sizes), group_col)
        .filter(F.col("_r") == F.expr("(_n + 1) DIV 2"))
        .select(group_col, F.col(value_col).alias("median"))
    )
    dev = d.join(F.broadcast(med), group_col).withColumn(
        "_ad", F.abs(F.col(value_col) - F.col("median")))
    wd = Window.partitionBy(group_col).orderBy("_ad")
    mad = (
        dev.withColumn("_r", F.row_number().over(wd))
        .join(F.broadcast(sizes), group_col)
        .filter(F.col("_r") == F.expr("(_n + 1) DIV 2"))
        .select(group_col, F.col("_ad").alias("mad"))
    )
    return (
        dev.join(F.broadcast(mad), group_col)
        .groupBy(group_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.first("median").alias("median"),
            F.first("mad").alias("mad"),
            F.sum((F.col("_ad") > F.lit(float(k)) * F.col("mad"))
                  .cast("long")).alias("n_outliers"),
        )
    )


def l_diversity_report(
    df: DataFrame,
    qi_cols: list[str],
    sensitive_col: str,
    l: int = 2,  # noqa: E741 — the literature's own letter
) -> DataFrame:
    """The companion check k-anonymity misses (Machanavajjhala et al.
    2007): an equivalence class can be large yet still leak when every
    member shares the SAME sensitive value — group size protects
    identity, not the attribute. One row per QI class:
    ``(qi…, n, n_sensitive_distinct, is_l_diverse)`` with distinct
    sensitive values counted NULL-exclusive (an absent attribute
    discloses nothing).

    Same scale shape as ``k_anonymity_report``: ONE partial-agg shuffle
    at the QI grain (count + count_distinct together); release gate =
    both reports pass."""
    if l < 1:
        raise ValueError(f"l must be >= 1, got {l}")
    return (
        df.groupBy(*qi_cols)
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.count_distinct(F.col(sensitive_col))
            .alias("n_sensitive_distinct"),
        )
        .withColumn("is_l_diverse", F.col("n_sensitive_distinct") >= l)
    )


# log10(1 + 1/d), d = 1..9 — pinned literals so Spark and any oracle
# engine compare against the IDENTICAL doubles (no runtime libm)
BENFORD_P = {
    1: 0.3010299956639812, 2: 0.17609125905568124, 3: 0.12493873660829992,
    4: 0.09691001300805642, 5: 0.07918124604762482, 6: 0.06694678963061322,
    7: 0.05799194697768673, 8: 0.05115252244738129, 9: 0.04575749056067514,
}


def benford_report(
    df: DataFrame,
    value_col: str,
) -> DataFrame:
    """Benford's-law first-digit screen — the classic fabricated-numbers
    / data-entry-anomaly detector for naturally-occurring positive
    amounts (Benford 1938; Nigrini's audit use): one row per leading
    digit with observed count/share, the Benford expectation, the
    digit's chi-square term, and the folded chi-square statistic on
    every row (8 df; > 20.09 rejects at α=0.01).

    Exactness: the first digit comes from the value's STRING form (a
    decimal column renders identically everywhere — never floor/log10,
    whose libm rounding differs); the expected shares are pinned
    literals; chi terms are fixed-order double expressions and the
    statistic is a pinned digit-order fold — bit-identical across
    engines and partitionings.

    Scale: one map-side digit projection + ONE partial-agg shuffle at
    the 9-row digit grain; everything after is O(9)."""
    first = F.substring(
        F.regexp_replace(F.col(value_col).cast("string"), r"^[-0.]+", ""),
        1, 1).cast("int")
    counts = (
        df.filter(F.col(value_col).isNotNull())
        .select(first.alias("digit"))
        .filter(F.col("digit").between(1, 9))
        .groupBy("digit").agg(F.count(F.lit(1)).alias("n_obs"))
    )
    spark = df.sparkSession
    expected = spark.createDataFrame(
        [(d, p) for d, p in BENFORD_P.items()],
        "digit int, expected_share double")
    g = expected.join(counts, "digit", "left").na.fill({"n_obs": 0})
    tot = g.agg(F.sum("n_obs").alias("_n"))
    terms = (
        g.crossJoin(F.broadcast(tot))
        .withColumn("share", F.col("n_obs").cast("double") / F.col("_n"))
        .withColumn(
            "chi_term",
            (F.col("n_obs").cast("double")
             - F.col("_n") * F.col("expected_share"))
            * (F.col("n_obs").cast("double")
               - F.col("_n") * F.col("expected_share"))
            / (F.col("_n") * F.col("expected_share")))
    )
    chi = terms.agg(F.aggregate(
        F.transform(
            F.array_sort(F.collect_list(F.struct("digit", "chi_term"))),
            lambda x: x["chi_term"]),
        F.lit(0.0), lambda acc, x: acc + x).alias("chi2"))
    return (
        terms.crossJoin(F.broadcast(chi))
        .select("digit", F.col("n_obs").cast("long").alias("n_obs"),
                "share", "expected_share", "chi_term", "chi2")
        .orderBy("digit")
    )


def classification_report(
    df: DataFrame,
    truth_col: str,
    pred_col: str,
) -> DataFrame:
    """Per-class precision / recall / F1 from (truth, prediction) pairs —
    the eval tail for any labeling operator (language-ID vs the labeled
    lang, quality-tier predictions vs audits): one row per class seen on
    EITHER side, with support counts kept alongside the rates so a
    99%-precision class with support 3 reads as what it is.

    Engine parity: counts are exact integers; precision = correct/pred,
    recall = correct/truth, F1 = (2·p·r)/(p+r) — each a pinned double
    tree over exact ints, NULL where the denominator is 0 (a class never
    predicted has no precision, not a fake 0).

    Scale shape: one partial-agg shuffle to the confusion grain
    (truth, pred) — O(classes²) rows from there, driver-free; the class
    rollups are O(classes) joins."""
    t, p = F.col(truth_col), F.col(pred_col)
    conf = df.groupBy(t.alias("_t"), p.alias("_p")).agg(
        F.count(F.lit(1)).alias("_n"))
    return confusion_to_report(conf)


def confusion_to_report(conf: DataFrame) -> DataFrame:
    """Metric tail over a pre-aggregated confusion frame
    ``(_t, _p, _n)`` — shared by :func:`classification_report` and the
    streaming twin (``streaming.aggstate.read_confusion_report``), so
    batch and streaming reports are identical by construction."""
    truth_tot = conf.groupBy(F.col("_t").alias("cls")).agg(
        F.sum("_n").cast("long").alias("n_true"))
    pred_tot = conf.groupBy(F.col("_p").alias("cls")).agg(
        F.sum("_n").cast("long").alias("n_pred"))
    diag = conf.filter(F.col("_t") == F.col("_p")).select(
        F.col("_t").alias("cls"), F.col("_n").cast("long").alias("n_correct"))
    base = (
        truth_tot.join(pred_tot, "cls", "full_outer")
        .join(diag, "cls", "left")
        .select(
            "cls",
            F.coalesce("n_true", F.lit(0)).alias("n_true"),
            F.coalesce("n_pred", F.lit(0)).alias("n_pred"),
            F.coalesce("n_correct", F.lit(0)).alias("n_correct"),
        )
    )
    prec = F.when(F.col("n_pred") > 0,
                  F.col("n_correct").cast("double")
                  / F.col("n_pred").cast("double"))
    rec = F.when(F.col("n_true") > 0,
                 F.col("n_correct").cast("double")
                 / F.col("n_true").cast("double"))
    out = base.withColumn("precision", prec).withColumn("recall", rec)
    f1 = F.when(
        (F.col("precision") + F.col("recall")) > 0.0,
        (F.lit(2.0) * F.col("precision") * F.col("recall"))
        / (F.col("precision") + F.col("recall")),
    )
    return out.withColumn("f1", f1)


def calibration_report(
    df: DataFrame,
    conf_col: str,
    correct_col: str,
    bins: int = 10,
) -> DataFrame:
    """Reliability-diagram table for a probabilistic classifier: equal-
    width confidence bins with per-bin support, mean confidence, and
    accuracy — the inputs to expected calibration error (ECE =
    Σ (n_b/N)·|acc_b − conf̄_b|, computable from these rows with a
    pinned fold). An overconfident quality/langid labeler shows up as
    accuracy tracking below the diagonal.

    Exactness: bin assignment is integer floor(conf·bins) clamped to
    the top bin (conf = 1.0 lands in bin bins−1); per-bin counts are
    exact integers; confidence accumulates in DECIMAL(27,15) — exact
    for inputs representable at 15 decimals, the documented envelope
    (scores built from integer ratios like k/64 qualify; the decimal
    sum is order-invariant where a double sum is not) — and mean
    confidence / accuracy are one double division each.

    Scale shape: map-only bin assignment + ONE partial-agg shuffle at
    the bin grain (≤ ``bins`` reduce groups); the N total for bin
    weights comes from re-aggregating the bin frame downstream, never
    a second scan."""
    if bins < 1:
        raise ValueError(f"bins must be >= 1, got {bins}")
    c = F.col(conf_col).cast("double")
    d = df.filter(c.isNotNull() & (c >= 0.0) & (c <= 1.0)).select(
        F.least(F.floor(c * F.lit(bins)).cast("int"), F.lit(bins - 1))
        .alias("bin"),
        c.cast("decimal(27,15)").alias("_conf"),
        F.col(correct_col).cast("long").alias("_ok"),
    )
    per = d.groupBy("bin").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("_ok").cast("long").alias("n_correct"),
        F.sum("_conf").cast("decimal(37,15)").alias("_sc"),
    )
    return per.select(
        "bin", "n", "n_correct",
        (F.col("_sc").cast("double") / F.col("n").cast("double"))
        .alias("mean_conf"),
        (F.col("n_correct").cast("double") / F.col("n").cast("double"))
        .alias("accuracy"),
    )
