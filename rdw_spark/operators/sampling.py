"""Deterministic sampling operators for training-data pipelines.

`df.sample()` is non-reproducible across runs/partitionings (seed is
per-partition), which breaks the two properties a 100 TB corpus pipeline
needs from a sample: (1) the same row set on re-run (resumable jobs,
auditable experiments), and (2) consistency across tables — sampling
`documents` and `embeddings` by the same key yields aligned rows.

All operators here key the decision on md5(seed || key): a pure map-side
expression (zero shuffle for Bernoulli/stratified), stable under
repartitioning, identical across engines (the oracle runs the same
predicate in DuckDB). The first 8 hex chars of md5 are compared
lexicographically against a precomputed hex threshold — fixed-width
lowercase hex compares identically to the numeric value, so no
hex->int conversion is needed on either side.

Reference analog: the RDW reporting stack has no sampler (samples are a
training-data concern); this extends the engine per the build brief.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

HASH_SPACE = 16 ** 8  # first 8 hex chars of md5


def _hash_hex(key: Column, seed: str) -> Column:
    return F.substring(F.md5(F.concat(F.lit(seed), key.cast("string"))), 1, 8)


def threshold_hex(fraction: float) -> str:
    """Lexicographic cutoff: keep rows whose 8-hex-char prefix sorts below
    it. Exposed so oracles can embed the same literal."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0, 1], got {fraction}")
    return format(min(int(fraction * HASH_SPACE), HASH_SPACE - 1), "08x")


def hash_sample(
    df: DataFrame, fraction: float, key_col: str, seed: str = "s0"
) -> DataFrame:
    """Deterministic Bernoulli sample: keep ~fraction of rows, chosen by
    md5(seed || key). Map-only (no shuffle, no driver state); changing the
    seed draws an independent sample; the same (seed, key) always decides
    the same way, in any engine."""
    return df.filter(_hash_sample_pred(F.col(key_col), fraction, seed))


def _hash_sample_pred(key: Column, fraction: float, seed: str) -> Column:
    # fraction == 1.0 means keep-everything EXACTLY: the strict '<' against
    # the max threshold would drop keys whose 8-hex md5 prefix is ffffffff
    # (~2^-32 per key — a handful of rows at corpus scale)
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0, 1], got {fraction}")
    if fraction >= 1.0:
        return F.lit(True)
    return _hash_hex(key, seed) < F.lit(threshold_hex(fraction))


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    fractions: dict[str, float] | float,
    key_col: str,
    seed: str = "s0",
) -> DataFrame:
    """Per-stratum deterministic Bernoulli: ``fractions`` is either one
    rate for every stratum or a per-stratum dict (missing strata keep
    nothing — explicit is safer than a silent 100%). A fraction >= 1.0
    keeps the stratum EXACTLY in full (see ``_hash_sample_pred``). Still
    map-only: the stratum picks the threshold, the hash picks the rows."""
    # salt the hash with the stratum so per-stratum draws are independent:
    # without it, a row kept at rate r in one stratum is always kept at
    # rate r' >= r in another — correlated samples across strata
    key = F.concat(F.col(strata_col).cast("string"), F.lit("|"),
                   F.col(key_col).cast("string"))
    if not isinstance(fractions, dict):
        return df.filter(_hash_sample_pred(key, float(fractions), seed))
    pred = None
    for value, frac in sorted(fractions.items()):
        cond = F.col(strata_col) == value
        keep = _hash_sample_pred(key, float(frac), seed)
        pred = F.when(cond, keep) if pred is None else pred.when(cond, keep)
    pred = pred.otherwise(F.lit(False)) if pred is not None else F.lit(False)
    return df.filter(pred)


def sample_k_per_stratum(
    df: DataFrame, strata_col: str, k: int, key_col: str, seed: str = "s0"
) -> DataFrame:
    """Exactly min(k, |stratum|) rows per stratum, uniform without
    replacement: rank rows by their hash within the stratum and keep the
    first k. The distributed reservoir-sampling equivalent — one shuffle
    on the stratum key, no driver pass. Ties broken by key for full
    determinism (md5 collisions on distinct keys notwithstanding)."""
    h = _hash_hex(F.col(key_col), seed)
    w = Window.partitionBy(strata_col).orderBy(h, F.col(key_col))
    return (
        df.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= k)
        .drop("_rk")
    )


def split_train_eval(
    df: DataFrame,
    key_col: str,
    eval_fraction: float = 0.01,
    seed: str = "split0",
) -> tuple[DataFrame, DataFrame]:
    """Disjoint, exhaustive, deterministic train/eval split by key — the
    contamination guard: a key lands on the same side in every table and
    every run. Returns (train, eval)."""
    pred = _hash_sample_pred(F.col(key_col), eval_fraction, seed)
    return df.filter(~pred), df.filter(pred)


def weighted_sample_k(
    df: DataFrame, k: int, weight_col: str, key_col: str, seed: str = "w0"
) -> DataFrame:
    """Deterministic weighted sampling WITHOUT replacement (Efraimidis–
    Spirakis A-ES): each row draws ``u = (h+1)/2^32`` from its md5 hash
    and ranks by ``u^(1/w)``; the top ``k`` keys are the sample. Inclusion
    probability is proportional to weight at each sequential draw —
    the length/quality-weighted corpus subset selector.

    Same determinism contract as the rest of this module: the draw is a
    pure function of (seed, key), so the sample is identical across runs,
    partitionings, and engines up to libm ``pow`` rounding (the es_key is
    a transcendental — two candidates within 1 ulp could order
    differently across engines; for audit-exact cross-engine parity
    compare the selected KEY SETS, which the catalog oracle does on the
    fixed driver data). Rows with weight <= 0 or NULL are excluded.

    Map-only scoring + a single TakeOrderedAndProject top-k: no shuffle
    of the input, no per-stratum state; at 100 TB this is one scan.
    """
    if k <= 0:
        raise ValueError(f"k must be positive, got {k}")
    h = F.conv(_hash_hex(F.col(key_col), seed), 16, 10).cast("double")
    u = (h + F.lit(1.0)) / F.lit(float(HASH_SPACE))
    es_key = F.pow(u, F.lit(1.0) / F.col(weight_col))
    w = Window.orderBy(F.col("es_key").desc(), F.col(key_col).asc())
    return (
        df.filter(F.col(weight_col).isNotNull() & (F.col(weight_col) > 0))
        .withColumn("es_key", es_key)
        .withColumn("sample_rank", F.row_number().over(w).cast("long"))
        .filter(F.col("sample_rank") <= k)
        .drop("es_key")
    )


def mixture_sample(
    df: DataFrame,
    source_col: str,
    weights: dict[str, float],
    token_budget: float,
    size_col: str,
    key_col: str,
    seed: str = "mix0",
) -> tuple[DataFrame, DataFrame]:
    """Budgeted mixture resampling — the training-mix planner: given
    target mixture ``weights`` (source -> share of the budget) and a
    ``token_budget``, derive each source's keep fraction
    ``min(1, weight·budget / available)`` and draw that fraction with the
    module's deterministic per-stratum hash predicate. Sources not in
    ``weights`` contribute nothing (explicit mixes only); a source with
    less material than its target is capped at exactly keep-everything
    (the 1.0 fraction short-circuits the hash threshold, so no key is
    lost to the strict '<' at the top of the hash space; its
    deficit is reported, not silently shifted onto other sources —
    rebalancing policy belongs to the caller).

    Returns ``(plan, sample)``: ``plan`` has one row per weighted source
    (``source, available, target, keep_fraction``), ``sample`` is the
    drawn subset of ``df``.

    Scale shape: one partial-agg shuffle over O(sources) keys to size the
    pool, an O(sources) driver collect for the fraction math, then a
    map-only filter — the fact is scanned twice and never shuffled.
    Every arithmetic step (exact integer-valued sums, double divide,
    floor to the hex threshold) is engine-reproducible, so the drawn KEY
    SET is identical across runs, partitionings, and engines.
    """
    sizes = {
        r["_s"]: r["_t"] or 0
        for r in df.groupBy(F.col(source_col).alias("_s"))
        .agg(F.sum(size_col).cast("long").alias("_t"))
        .collect()
    }
    plan_rows = []
    fracs: dict[str, float] = {}
    for srcv, w in sorted(weights.items()):
        avail = int(sizes.get(srcv, 0))
        target = float(w) * float(token_budget)
        frac = 0.0 if avail == 0 else min(1.0, target / avail)
        fracs[srcv] = frac
        plan_rows.append((srcv, avail, target, frac))
    spark = df.sparkSession
    plan = spark.createDataFrame(
        plan_rows,
        "source string, available long, target double, keep_fraction double",
    )
    return plan, stratified_sample(df, source_col, fracs, key_col, seed)


def temperature_weights(
    df: DataFrame,
    source_col: str,
    size_col: str,
    tau: float = 2.0,
) -> DataFrame:
    """Temperature-scaled mixture weights (the multilingual-LM data
    balancing rule: ``weight ∝ share^(1/τ)``) — τ > 1 flattens the
    natural mix toward uniform so low-resource sources are upsampled,
    τ = 1 keeps natural proportions. Returns one row per source:
    ``(source, available, share, weight)`` with weights summing to 1;
    feed ``dict`` of (source → weight) into :func:`mixture_sample` to
    draw the rebalanced corpus.

    Scale shape: ONE partial-agg pass sizes the sources; everything
    after operates on the O(sources) frame (broadcast total, sorted-fold
    normalizer — a deterministic sequential double sum, the chi-square
    pattern, valid because sources are few). At τ = 2.0 the exponent is
    computed as ``sqrt`` (IEEE-exact in every engine), so the whole plan
    is bit-reproducible and oracle-checkable; other τ use ``pow`` (1-ulp
    envelope, still deterministic per engine)."""
    if tau <= 0:
        raise ValueError(f"tau must be > 0, got {tau}")
    sizes = df.groupBy(F.col(source_col).alias("source")).agg(
        F.sum(size_col).cast("long").alias("available"))
    total = sizes.agg(F.sum("available").alias("_total"))
    shared = sizes.crossJoin(F.broadcast(total)).withColumn(
        "share", F.col("available").cast("double") / F.col("_total"))
    if tau == 2.0:
        scaled = F.sqrt(F.col("share"))
    else:
        scaled = F.pow(F.col("share"), F.lit(1.0 / float(tau)))
    shared = shared.withColumn("_scaled", scaled)
    # normalizer: fold the per-source terms in sorted source order — the
    # deterministic sequential double sum (sources are few by definition)
    norm = shared.agg(
        F.aggregate(
            F.transform(
                F.array_sort(F.collect_list(F.struct("source", "_scaled"))),
                lambda s: s["_scaled"],
            ),
            F.lit(0.0), lambda acc, x: acc + x,
        ).alias("_norm"))
    return (
        shared.crossJoin(F.broadcast(norm))
        .select(
            "source", "available", "share",
            (F.col("_scaled") / F.col("_norm")).alias("weight"),
        )
    )
