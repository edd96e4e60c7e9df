"""As-of / interval join helpers.

The reference needs these for percentile (norms) assignment: each exam's
``completed_at`` falls in a percentile table's ``[start_date, end_date]``
window, then the exam's scale score maps to ``max(percentile_rank)`` whose
band score <= scale_score (reference: docs/Norms.md:17-36, SURVEY.md J8/A9).
Spark has no native as-of join, so two strategies:

- ``broadcast``: right side is small (a band/lookup table). Broadcast
  non-equi join + groupBy-max. Explosion is bounded by len(right) per left
  row, and the join is map-side — scales linearly in the left at 100 TB.
- ``union``: both sides large. Tag + unionByName + window with
  ``last(..., ignorenulls=True)`` ordered by the as-of key — a single
  shuffle on ``by`` keys, no pairwise explosion. This is the classic
  merge-asof-as-a-window rewrite and survives arbitrary right-side sizes
  as long as ``by`` keys give enough partitions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: list[str] | None = None,
    right_on: str | None = None,
    value_cols: list[str] | None = None,
    strategy: str = "union",
) -> DataFrame:
    """For each left row, attach the latest right row with
    ``right[right_on] <= left[on]`` (within ``by`` groups).

    Returns left columns + requested right value columns (null when no
    right row precedes the left row).
    """
    by = by or []
    right_on = right_on or on
    value_cols = value_cols or [c for c in right.columns if c not in set(by) | {right_on}]

    if strategy == "broadcast":
        lid = left.withColumn("__lid", F.monotonically_increasing_id())
        cond = [lid[k] == right[k] for k in by] + [right[right_on] <= lid[on]]
        j = lid.join(F.broadcast(right), cond, "left")
        # keep the greatest preceding right row per left row. Hash aggregate
        # with max_by (partial agg map-side, no global sort) — a window over
        # per-row partition keys would sort the whole fact table.
        out = (
            j.groupBy("__lid", *[lid[c] for c in left.columns])
            .agg(*[F.max_by(F.col(c), F.col(right_on)).alias(c) for c in value_cols])
            .drop("__lid")
        )
        return out

    if strategy == "union":
        lt = left.withColumn("__is_left", F.lit(1))
        for c in value_cols:
            lt = lt.withColumn(c, F.lit(None).cast(right.schema[c].dataType))
        rt = right.select(
            *by,
            F.col(right_on).alias(on),
            F.lit(0).alias("__is_left"),
            *[F.col(c) for c in value_cols],
        )
        for c in left.columns:
            if c not in rt.columns:
                rt = rt.withColumn(c, F.lit(None).cast(left.schema[c].dataType))
        u = lt.unionByName(rt.select(lt.columns))
        # right rows sort before left rows at equal keys so <= is inclusive
        w = (
            Window.partitionBy(*by)
            .orderBy(F.col(on).asc(), F.col("__is_left").asc())
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        filled = u.select(
            "*",
            *[
                F.last(F.when(F.col("__is_left") == 0, F.col(c)), ignorenulls=True)
                .over(w)
                .alias(f"__v_{c}")
                for c in value_cols
            ],
        )
        out = filled.filter(F.col("__is_left") == 1).select(
            *[c for c in left.columns if c != "__is_left"],
            *[F.col(f"__v_{c}").alias(c) for c in value_cols],
        )
        return out

    raise ValueError(f"unknown asof strategy: {strategy}")


def interval_join(
    left: DataFrame,
    right: DataFrame,
    left_point: str,
    right_start: str,
    right_end: str,
    by: list[str] | None = None,
) -> DataFrame:
    """Point-in-interval join (exam.completed_at ∈ [start_date, end_date],
    docs/Norms.md:17-18). Right side is broadcast (interval tables are
    dims); inclusive on both ends to match the reference's BETWEEN.
    """
    by = by or []
    cond = [left[k] == right[k] for k in by] + [
        left[left_point] >= right[right_start],
        left[left_point] <= right[right_end],
    ]
    return left.join(F.broadcast(right), cond, "left")


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    how: str = "inner",
    salt: int = 16,
    hot_keys: list | None = None,
) -> DataFrame:
    """Equi-join robust to heavy skew in ``left[on]`` — result-identical to
    ``left.join(right, on, how)``.

    Left rows get a deterministic salt in ``[0, salt)`` (hash of the whole
    row, so re-runs partition identically); matching right rows are
    replicated once per salt value, so one hot key spreads over ``salt``
    reducers instead of melting a single task. When ``hot_keys`` is given,
    only those keys are salted/replicated and the rest of the right side is
    not inflated — the classic split-salting plan for 100 TB facts where
    AQE skew-splitting can't kick in (e.g. the skewed side feeds an
    aggregation in the same stage). ``how`` ∈ {inner, left}: right-side
    rows are replicated, so right/outer would duplicate unmatched rows.
    """
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports how='inner'|'left' only")
    row_hash = F.xxhash64(*[F.col(c) for c in left.columns])
    is_hot_l = F.col(on).isin(hot_keys) if hot_keys is not None else F.lit(True)
    lt = left.withColumn(
        "__salt",
        F.when(is_hot_l, F.pmod(row_hash, F.lit(salt)).cast("int")).otherwise(0),
    )
    is_hot_r = F.col(on).isin(hot_keys) if hot_keys is not None else F.lit(True)
    rt = right.withColumn(
        "__salt",
        F.explode(
            F.when(is_hot_r, F.sequence(F.lit(0), F.lit(salt - 1)))
            .otherwise(F.array(F.lit(0)))
        ),
    )
    return lt.join(rt, [on, "__salt"], how).drop("__salt")


def hot_keys(df: DataFrame, key_cols: list[str], k: int = 20) -> DataFrame:
    """Exact heavy-hitter report over a prospective shuffle key — the skew
    diagnostic run BEFORE a big join/aggregation to decide whether (and
    with what key list) to deploy :func:`salted_join`, AQE skew hints, or
    repartitioning. Returns the top ``k`` key groups with exact counts,
    corpus share, and a deterministic rank (count desc, then key asc).

    Scale shape: one partial-aggregated count shuffle — map-side combine
    condenses each partition to its distinct keys, so the reduce side
    carries O(distinct keys), not O(rows); the top-k is
    TakeOrderedAndProject (no global sort), and the total for the share
    column comes from re-aggregating the (small) per-key counts rather
    than a second scan of the input — the counts frame is materialized
    once (lazy localCheckpoint: the scan runs when the CALLER first acts
    on the result, not at build time) so the total/top fan-out cannot
    re-run the input scan. Trade-off: localCheckpoint blocks are
    executor-local and non-replicated — on a cluster, losing an executor
    after materialization fails downstream actions instead of recomputing
    (acceptable for a one-shot diagnostic; use cache() if the report is
    re-read across stages). No sketch needed: exact heavy hitters at
    100 TB cost one combiner shuffle, which the downstream join was about
    to pay anyway."""
    counts = (
        df.groupBy(*key_cols).agg(F.count("*").alias("n"))
        .localCheckpoint(eager=False)
    )
    total = counts.agg(F.sum("n").alias("_total"))
    top = counts.orderBy(F.desc("n"), *key_cols).limit(k)
    w = Window.orderBy(F.desc("n"), *key_cols)
    return (
        top.crossJoin(F.broadcast(total))
        .withColumn("share", F.col("n") / F.col("_total"))
        .withColumn("rank", F.row_number().over(w))
        .drop("_total")
    )


def _deletion_keys(s, max_dist: int):
    """Array of all strings reachable from ``s`` by UP TO ``max_dist``
    single-character deletions (including ``s`` itself) — the FastSS /
    symmetric-delete neighborhood. Pure array expressions (codegen'd):
    each expansion round maps every current variant to its single-char
    deletions and flattens + distincts."""
    del1 = lambda v: F.when(F.length(v) == 0, F.array().cast("array<string>")).otherwise(
        F.transform(
            F.sequence(F.lit(1), F.greatest(F.length(v), F.lit(1))),
            lambda i: F.concat(
                F.substring(v, F.lit(1), i - 1),
                F.substring(v, i + 1, F.length(v)),
            ),
        )
    )
    out = F.array(s)
    for _ in range(max_dist):
        out = F.array_distinct(
            F.flatten(F.transform(out, lambda v: F.concat(F.array(v), del1(v))))
        )
    return out


def fuzzy_join(
    left: DataFrame,
    right: DataFrame | None,
    left_col: str,
    right_col: str | None = None,
    left_id_col: str | None = None,
    right_id_col: str | None = None,
    max_dist: int = 1,
) -> DataFrame:
    """Edit-distance join: all (left, right) pairs with
    ``levenshtein(left_col, right_col) <= max_dist`` — EXACTLY (candidate
    generation is guaranteed-complete, so the result equals the brute-force
    cross join's). The entity-resolution workhorse (near-identical names /
    codes / ids across feeds).

    ``right=None`` → self-pairs mode over ``left``: unordered pairs with
    ``left_id < right_id``.

    Blocking is the FastSS symmetric-delete scheme: two strings within
    edit distance k share at least one member of their up-to-k-deletion
    neighborhoods, so candidates = pairs sharing a deletion key — an
    equi-join, never a cross join. Per-row key fan-out is ~L choose
    <=k (L = string length; ~L+1 keys at k=1), and key frequency tracks
    TRUE near-duplicate density, not vocabulary skew — unlike q-gram
    blocking, a shared prefix or hot token does not inflate candidates.
    Verification (``levenshtein``) runs only on distinct candidate pairs.

    100 TB shape: one explode (map-only, bounded fan-out), one equi-shuffle
    on short deletion keys, a distinct, and a codegen'd levenshtein filter.
    ``max_dist`` is capped at 2: the deletion-neighborhood size is
    O(L^k) — at k>2 switch to a metric tree / trie strategy instead.
    """
    if max_dist not in (1, 2):
        raise ValueError("max_dist must be 1 or 2")
    self_mode = right is None
    if self_mode:
        right, right_col, right_id_col = left, left_col, left_id_col
    right_col = right_col or left_col
    lid = left_id_col or left.columns[0]
    rid = right_id_col or right.columns[0]
    l = left.select(F.col(lid).alias("_lid"), F.col(left_col).alias("_lval"))
    r = right.select(F.col(rid).alias("_rid"), F.col(right_col).alias("_rval"))
    lk = l.select(
        "_lid", "_lval",
        F.explode(_deletion_keys(F.col("_lval"), max_dist)).alias("_key"),
    )
    rk = r.select(
        "_rid", "_rval",
        F.explode(_deletion_keys(F.col("_rval"), max_dist)).alias("_key"),
    )
    cand = lk.join(rk, "_key").select("_lid", "_lval", "_rid", "_rval")
    if self_mode:
        cand = cand.filter(F.col("_lid") < F.col("_rid"))
    # verify FIRST, dedup the survivors: candidates sharing several
    # deletion keys are re-verified once per key (a few % extra codegen'd
    # levenshtein calls), but the distinct then shuffles only the TRUE
    # matches instead of the full candidate multiset (at sf0.1: 19.5k
    # rows instead of 956k — the distinct bought almost nothing there
    # because 98% of candidates were already unique). distinct∘filter ≡
    # filter∘distinct for a deterministic predicate, so the result is
    # unchanged.
    return (
        cand
        .withColumn("dist", F.levenshtein("_lval", "_rval").cast("long"))
        .filter(F.col("dist") <= max_dist)
        .distinct()
        .select(
            F.col("_lid").alias("left_id"), F.col("_rid").alias("right_id"),
            F.col("_lval").alias("left_value"), F.col("_rval").alias("right_value"),
            "dist",
        )
    )


def band_join(
    left: DataFrame,
    right: DataFrame,
    left_val: str,
    right_val: str,
    eps,
    on: list[str] | None = None,
    how: str = "inner",
) -> DataFrame:
    """Numeric band join: pairs where ``|left_val − right_val| <= eps``
    (optionally also equi-keyed on ``on``) WITHOUT the cartesian/
    nested-loop plan a raw range predicate produces.

    The bucket trick: the right side lands in ONE bucket
    ``floor(val / eps)``; the left probes its own bucket and both
    neighbors (any pair within eps differs by at most one bucket). That
    turns the range condition into an EQUI-join on (on…, bucket) —
    hash-partitioned, AQE-skew-splittable, broadcastable — followed by a
    cheap post-filter; each qualifying pair meets exactly once because
    the right row has exactly one bucket, so no dedup pass. The classic
    band/range-join optimization (e.g. proximity joins on event time or
    numeric near-joins) expressed in three map-side expressions.

    Left rows explode 3x before the shuffle (the bounded price of
    bucketing); eps must be > 0 and values non-NULL to pair (SQL range
    semantics). ``how`` supports 'inner' and 'semi'/'left_semi'."""
    if not eps or eps <= 0:
        raise ValueError(f"eps must be > 0, got {eps}")
    if how not in ("inner", "semi", "left_semi", "leftsemi"):
        raise ValueError(f"band_join supports inner/semi, got {how!r}")
    on = on or []
    lb = F.floor(F.col(left_val).cast("double") / F.lit(float(eps)))
    rb = F.floor(F.col(right_val).cast("double") / F.lit(float(eps)))
    lhs = left.filter(F.col(left_val).isNotNull()).withColumn(
        "_band", F.explode(F.array(lb - 1, lb, lb + 1)))
    rhs = right.filter(F.col(right_val).isNotNull()).withColumn("_band", rb)
    keys = [*on, "_band"]
    close = (
        F.abs(F.col(left_val).cast("double")
              - F.col(right_val).cast("double")) <= F.lit(float(eps))
    )
    if how != "inner":
        return (
            left.join(
                lhs.join(rhs, keys).filter(close).select(*on, left_val).distinct(),
                [*on, left_val], "left_semi")
        )
    return lhs.join(rhs, keys).filter(close).drop("_band")


def match_score(
    pairs: DataFrame,
    rules: "list[tuple[str, object, float, float]]",
    prior_odds: float = 1.0,
) -> DataFrame:
    """Fellegi–Sunter probabilistic record-linkage scoring over candidate
    pairs (Fellegi & Sunter 1969): each rule ``(name, agree_expr, m, u)``
    contributes likelihood ratio ``m/u`` when the pair AGREES on the
    attribute and ``(1−m)/(1−u)`` when it disagrees (m = P(agree | true
    match), u = P(agree | non-match)); the pair's ``match_odds`` is the
    prior times the product of its per-rule ratios, and per-rule
    ``lr_<name>`` columns expose the evidence decomposition. Downstream
    picks the accept/review/reject thresholds on the odds.

    ``agree_expr`` is a boolean Column (or SQL string) over the pair
    frame — equality, banded numeric closeness, edit-distance caps, any
    predicate. A NULL agreement is treated as DISAGREEMENT (missing
    evidence can't support a match claim).

    Determinism: the ratios are constants; the product is a PINNED-ORDER
    chain of double multiplications (rule list order), bit-identical
    across engines — no groupBy-product whose partial order could vary.

    Scale: map-only over the candidate-pair frame (blocking —
    ``fuzzy_join``, LSH, band join — already bounded it); no shuffle."""
    if not rules:
        raise ValueError("rules must be non-empty")
    out = pairs
    odds = F.lit(float(prior_odds))
    for name, agree, m, u in rules:
        if not (0.0 < u < 1.0 and 0.0 < m < 1.0):
            raise ValueError(f"rule {name!r}: m/u must be in (0, 1)")
        cond = F.expr(agree) if isinstance(agree, str) else agree
        lr = F.when(F.coalesce(cond, F.lit(False)),
                    F.lit(m / u)).otherwise(F.lit((1.0 - m) / (1.0 - u)))
        out = out.withColumn(f"lr_{name}", lr)
        odds = odds * F.col(f"lr_{name}")
    return out.withColumn("match_odds", odds)


def overlap_join(
    left: DataFrame,
    right: DataFrame,
    left_start: str,
    left_end: str,
    right_start: str,
    right_end: str,
    cell,
    on: list[str] | None = None,
) -> DataFrame:
    """Interval-OVERLAP join at scale: pairs where
    ``[left_start, left_end]`` and ``[right_start, right_end]``
    intersect (inclusive ends — SQL ``l.s <= r.e AND r.s <= l.e``),
    for BIG×BIG interval sets where :func:`interval_join`'s
    broadcast-the-dim shape doesn't apply and a raw range predicate
    plans a cartesian.

    The grid trick: both sides explode each interval onto a grid of
    ``cell``-width buckets (``start DIV cell .. end DIV cell``), the
    join becomes an EQUI-join on (on…, cell) — hash-partitioned,
    AQE-skew-splittable — with the true overlap as a post-filter. A
    pair meets once per SHARED cell, so instead of a distinct pass
    each pair is kept only in its CANONICAL cell (the first shared
    one, ``greatest(l.start, r.start) DIV cell``) — exactly-once by
    arithmetic, no dedup shuffle.

    ``cell`` sets the explode factor: each row lands in
    ``span/cell + 1`` cells, so pick cell ≈ the median interval length
    (explode ~2×). Cells use exact integer FLOOR division
    (``(x - pmod(x, c)) DIV c`` — never through double), so negative
    coordinates are handled correctly. NULL bounds drop (no overlap
    semantics)."""
    if not cell or cell <= 0:
        raise ValueError(f"cell must be > 0, got {cell}")
    on = on or []
    c = int(cell)

    def fdiv(expr: str) -> str:
        # exact integer floor division for any sign: subtract the
        # non-negative pmod so DIV's truncation is exact division
        return f"(({expr}) - pmod({expr}, {c})) DIV {c}"

    lhs = (
        left.filter(F.col(left_start).isNotNull()
                    & F.col(left_end).isNotNull())
        .withColumn("_cell", F.explode(F.sequence(
            F.expr(fdiv(left_start)),
            F.expr(fdiv(left_end)))))
    )
    rhs = (
        right.filter(F.col(right_start).isNotNull()
                     & F.col(right_end).isNotNull())
        .withColumn("_cell", F.explode(F.sequence(
            F.expr(fdiv(right_start)),
            F.expr(fdiv(right_end)))))
    )
    overlap = (
        (F.col(left_start) <= F.col(right_end))
        & (F.col(right_start) <= F.col(left_end))
    )
    canonical = (
        F.col("_cell")
        == F.expr(fdiv(f"greatest({left_start}, {right_start})"))
    )
    return (
        lhs.join(rhs, [*on, "_cell"])
        .filter(overlap & canonical)
        .drop("_cell")
    )


def blocking_eval(
    cand_pairs: DataFrame,
    truth_pairs: DataFrame,
    n_left: int | None = None,
    n_right: int | None = None,
    id_cols: tuple[str, str] = ("id_a", "id_b"),
    n_possible: DataFrame | int | None = None,
) -> DataFrame:
    """Blocking-quality report for the record-linkage stack: given the
    candidate pairs a blocker emitted (the input :func:`match_score`
    consumes) and the labeled true matches, the two numbers every
    linkage paper grades blockers on — PAIR COMPLETENESS (recall:
    what fraction of true matches survived blocking) and REDUCTION
    RATIO (what fraction of the possible pair space the blocker
    avoided). A blocker change that boosts RR while PC drops is
    trading recall for speed; this makes that trade measurable.

    The pair-space size: pass ``n_left``/``n_right`` for a two-corpus
    linkage (space = n_left·n_right), or ``n_possible`` directly — an
    int, or a 1-row DataFrame with an ``n_possible`` column for a fully
    LAZY plan (e.g. ``corpus.agg((count*(count-1)/2)...)`` for
    self-dedup's unordered ``id_a < id_b`` space, where n·n would
    overstate the denominator more than 2×).

    Exactness: all counts are exact integers over DISTINCT pairs (a
    blocker emitting a pair twice isn't better); PC and RR are one
    double division each.

    Scale shape: two distinct partial-aggs + one left-semi join at the
    pair grain; the 1-row aggregates meet in broadcast crossJoins (the
    codebase's global-aggregate idiom). No collect."""
    if n_possible is None:
        if n_left is None or n_right is None:
            raise ValueError("pass n_left and n_right, or n_possible")
        if n_left <= 0 or n_right <= 0:
            raise ValueError(
                f"corpus sizes must be > 0, got {n_left}, {n_right}")
        if n_left * n_right >= 2**63:
            raise ValueError("n_left * n_right overflows a signed long")
        n_possible = n_left * n_right
    if isinstance(n_possible, int):
        if n_possible <= 0:
            raise ValueError(f"n_possible must be > 0, got {n_possible}")
        possible = cand_pairs.sparkSession.range(1).select(
            F.lit(n_possible).cast("long").alias("n_possible"))
    else:
        possible = n_possible.select(
            F.col("n_possible").cast("long").alias("n_possible"))
    a, b = id_cols
    c = cand_pairs.select(a, b).distinct()
    t = truth_pairs.select(a, b).distinct()
    hits = c.join(t, [a, b], "left_semi")
    stats = (
        c.agg(F.count(F.lit(1)).cast("long").alias("n_candidates"))
        .crossJoin(t.agg(F.count(F.lit(1)).cast("long").alias("n_truth")))
        .crossJoin(hits.agg(F.count(F.lit(1)).cast("long").alias("n_hits")))
        .crossJoin(F.broadcast(possible))
    )
    return stats.select(
        "n_candidates", "n_truth", "n_hits", "n_possible",
        F.when(F.col("n_truth") > 0,
               F.col("n_hits").cast("double")
               / F.col("n_truth").cast("double"))
        .alias("pair_completeness"),
        (F.lit(1.0) - F.col("n_candidates").cast("double")
         / F.col("n_possible").cast("double")).alias("reduction_ratio"),
    )
