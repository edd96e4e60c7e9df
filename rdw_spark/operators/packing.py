"""Sequence packing + token-budget rebalancing: the last-mile operators
between a cleaned corpus and a training run.

``pack_sequences`` is concat-and-chunk packing: documents are laid out on
one global token stream (in a deterministic key order) and cut into
fixed-length training sequences; each doc learns its stream offset and
which sequences it spans. The core primitive is a DISTRIBUTED exclusive
prefix sum — the naive ``Window.orderBy(key)`` with no partitionBy drags
the whole table through ONE task, the classic local-mode trap that dies
at scale. Here: range-repartition on the key, per-partition running sums,
then a partition-offset map from one tiny collect (#partitions rows) —
two passes, every stage parallel, the textbook two-phase scan.

``token_budget_sample`` rebalances the domain mix: each stratum is
downsampled to a target token budget with the deterministic map-only
Bernoulli from ``operators.sampling`` — rates derive from one partial-agg
aggregate, decisions never shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .sampling import stratified_sample


def with_global_offset(
    df: DataFrame, weight_col: str, order_col: str = "doc_id",
    out_col: str = "offset", num_partitions: int | None = None,
) -> DataFrame:
    """Exclusive prefix sum of ``weight_col`` in ``order_col`` order (which
    must be unique), computed distributed:

    1. range-repartition on the key (equal keys co-located, partitions
       ordered);
    2. running sum per partition (window partitioned by the physical
       partition id — parallel, no global sort task);
    3. per-partition totals → exclusive partition offsets via one
       #partitions-row collect, joined back as a broadcast map.

    The result is independent of the partition boundaries the range
    sampler picked, so it is deterministic across runs; a localCheckpoint
    pins the partitioning between the totals job and the final plan (on a
    cluster, a reliable checkpoint does the same)."""
    rp = (
        df.repartitionByRange(num_partitions, F.col(order_col))
        if num_partitions is not None
        # default: AQE sizes the exchange (coalesces when tiny, splits when
        # not) — the per-partition phase below is correct either way
        else df.repartitionByRange(F.col(order_col))
    )
    d = rp.withColumn("_pid", F.spark_partition_id()).localCheckpoint(eager=True)
    w = (
        Window.partitionBy("_pid").orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    d = d.withColumn("_cum", F.sum(weight_col).over(w))
    totals = (
        d.groupBy("_pid").agg(F.max("_cum").alias("_tot"))
        .orderBy("_pid").collect()
    )
    if not totals:
        return df.withColumn(out_col, F.lit(0).cast("long"))
    offsets: dict[int, int] = {}
    run = 0
    for r in totals:
        offsets[r["_pid"]] = run
        run += int(r["_tot"])
    omap = F.create_map(
        *[F.lit(x) for pid, off in offsets.items() for x in (pid, off)]
    )
    return (
        d.withColumn(
            out_col,
            (F.col("_cum") - F.col(weight_col) + omap[F.col("_pid")]).cast("long"),
        )
        .drop("_pid", "_cum")
    )


def pack_sequences(
    df: DataFrame,
    seq_len: int,
    weight_col: str = "n_tokens",
    order_col: str = "doc_id",
    max_doc_tokens: int | None = None,
) -> DataFrame:
    """Concat-and-chunk packing plan: with documents concatenated in
    ``order_col`` order, annotate each doc with its global token
    ``offset`` and the training sequences it lands in (``first_seq``,
    ``last_seq``, ``n_seqs`` for docs spanning a boundary). Rows with
    non-positive weight are dropped (they occupy no stream positions).
    This is the *plan* the actual tensor writer executes per sequence —
    producing it is one distributed prefix sum, no text moves.

    ``max_doc_tokens`` applies the standard long-document truncation
    policy: a doc contributes at most that many tokens to the stream
    (``weight_col`` is capped; ``truncated`` marks affected docs) — the
    map-only guard that stops one book-length document from spanning
    hundreds of sequences and skewing the mix."""
    d = df.filter(F.col(weight_col) > 0)
    if max_doc_tokens is not None:
        if max_doc_tokens <= 0:
            raise ValueError(f"max_doc_tokens must be positive, got {max_doc_tokens}")
        d = d.withColumn(
            "truncated", F.col(weight_col) > max_doc_tokens
        ).withColumn(
            weight_col, F.least(F.col(weight_col), F.lit(max_doc_tokens))
        )
    d = with_global_offset(d, weight_col, order_col)
    end_incl = F.col("offset") + F.col(weight_col) - 1
    return (
        d.withColumn("first_seq", F.floor(F.col("offset") / seq_len))
        .withColumn("last_seq", F.floor(end_incl / seq_len))
        .withColumn("n_seqs", F.col("last_seq") - F.col("first_seq") + F.lit(1))
    )


def shuffle_order(
    df: DataFrame, key_col: str = "doc_id", seed: str = "sh0",
    out_col: str = "position",
) -> DataFrame:
    """Deterministic global training order: every row gets a dense 0-based
    ``position`` in md5(seed || key) order — a reproducible corpus shuffle
    (same rows, same order, every run and every partitioning; change the
    seed for an independent permutation). The rank is the same distributed
    two-phase scan as :func:`with_global_offset` with unit weights — never
    a single-task ``row_number() OVER (ORDER BY …)``. Ties on the 8-hex
    prefix break by key, so the order is total for unique keys. The
    tiebreak right-aligns the key into a 20-char field (lexicographic ==
    numeric for non-negative integers); keys rendering wider than 20
    chars raise rather than silently truncate into tie ambiguity."""
    ks = F.col(key_col).cast("string")
    padded = F.when(
        F.length(ks) > 20,
        F.raise_error(F.concat(F.lit("shuffle_order key wider than 20 chars: "), ks)),
    ).otherwise(F.lpad(ks, 20, "0"))
    h = F.concat(
        F.substring(F.md5(F.concat(F.lit(seed), ks)), 1, 8),
        F.lit("|"),
        padded,
    )
    d = df.withColumn("_ord", h).withColumn("_one", F.lit(1).cast("long"))
    return (
        with_global_offset(d, "_one", order_col="_ord", out_col=out_col)
        .drop("_ord", "_one")
    )


def assign_shards(
    df: DataFrame,
    tokens_per_shard: int | None = None,
    n_shards: int | None = None,
    weight_col: str = "n_tokens",
    order_col: str = "position",
    out_col: str = "shard",
) -> DataFrame:
    """Deterministic training-shard assignment: rows are laid out on the
    global token stream in ``order_col`` order (the shuffle position) and
    cut into shards of ~``tokens_per_shard`` tokens. A document belongs to
    the shard its FIRST token lands in (start-of-doc rule), so shards are
    contiguous ranges of the training order, documents never split across
    shard files, and the assignment is a pure function of (order, weights)
    — the same on any cluster layout, which is what makes a training run
    resumable from the shard index alone.

    Pass ``n_shards`` instead to derive ``tokens_per_shard`` as
    ceil(total/n_shards) from one aggregate. Adds ``offset`` (global
    stream offset) and ``out_col``; rows with non-positive weight drop
    (they occupy no stream positions). One distributed prefix sum
    (:func:`with_global_offset`) + map-only math — no text moves."""
    if (tokens_per_shard is None) == (n_shards is None):
        raise ValueError("pass exactly one of tokens_per_shard / n_shards")
    d = df.filter(F.col(weight_col) > 0)
    if tokens_per_shard is None:
        total = d.agg(F.sum(weight_col)).first()[0]
        if total is None:
            return (
                d.withColumn("offset", F.lit(0).cast("long"))
                .withColumn(out_col, F.lit(0).cast("long"))
            )
        tokens_per_shard = -(-int(total) // int(n_shards))  # ceil div
    if tokens_per_shard <= 0:
        raise ValueError(f"tokens_per_shard must be positive, got {tokens_per_shard}")
    d = with_global_offset(d, weight_col, order_col=order_col, out_col="offset")
    return d.withColumn(
        out_col, F.floor(F.col("offset") / tokens_per_shard).cast("long")
    )


def write_shards(
    df: DataFrame,
    out_dir: str,
    tokens_per_shard: int | None = None,
    n_shards: int | None = None,
    weight_col: str = "n_tokens",
    order_col: str = "position",
) -> DataFrame:
    """Materialize a shuffled corpus as training shards: assign shards
    (:func:`assign_shards`), write ``shard=K/`` parquet directories under
    ``out_dir``, and write + return the shard index (per shard: doc/token
    counts and the position range) — the manifest a loader needs to plan
    epochs without listing data files.

    Write plan: one hash repartition on the shard id so each shard is
    written by one task as one file — at the target scale size
    ``tokens_per_shard`` to the file size you want (e.g. ~100M tokens
    ≈ several hundred MB); for shards larger than one task should write,
    set ``spark.sql.files.maxRecordsPerFile`` instead of shrinking shards.
    Readers get per-shard partition pruning for free via the ``shard=``
    directory key."""
    d = assign_shards(
        df, tokens_per_shard=tokens_per_shard, n_shards=n_shards,
        weight_col=weight_col, order_col=order_col,
    )
    (
        d.repartition(F.col("shard"))
        .sortWithinPartitions(order_col)
        .write.partitionBy("shard").mode("overwrite").parquet(out_dir)
    )
    spark = df.sparkSession
    back = spark.read.parquet(out_dir)
    index = (
        back
        .groupBy("shard")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(weight_col).alias("n_tokens"),
            F.min(order_col).alias("first_position"),
            F.max(order_col).alias("last_position"),
            F.min("offset").alias("first_offset"),
            _shard_digest(back, partition_col="shard"),
        )
        .orderBy("shard")
    )
    index.coalesce(1).write.mode("overwrite").parquet(
        out_dir.rstrip("/") + "_index"
    )
    return index


def _shard_digest(df: DataFrame, partition_col: str = "shard") -> Column:
    """Order-insensitive content digest of a shard's rows: XOR of per-row
    xxhash64 over every data column (name-sorted, partition key excluded —
    the digest describes the rows, the directory key describes placement).
    Commutative aggregate → partial map-side combine, no sort, no collect;
    rows are unique on the stream position so XOR self-cancellation can't
    silently bless a duplicated+dropped row pair."""
    cols = sorted(c for c in df.columns if c != partition_col)
    return F.expr(
        "bit_xor(xxhash64(" + ", ".join(f"`{c}`" for c in cols) + "))"
    ).alias("content_digest")


def validate_shards(spark, out_dir: str, weight_col: str = "n_tokens") -> dict:
    """Pre-flight integrity check for a training run: re-read the shard
    directories, recompute each shard's (n_docs, n_tokens, content_digest),
    and compare against the persisted ``<out_dir>_index`` — the loader-side
    twin of ``migrate.validate_integrity``. Catches a torn/partial shard
    file, a manually edited row, and index/data drift (a shard present on
    disk but absent from the index or vice versa) BEFORE a multi-day run
    consumes it. One partition-parallel aggregation pass over the shards —
    a maintenance/launch-time cost, not per-epoch.

    Returns ``{"ok": bool, "checked": n, "mismatched": [shard, ...],
    "missing_in_data": [...], "missing_in_index": [...]}``."""
    back = spark.read.parquet(out_dir)
    index = spark.read.parquet(out_dir.rstrip("/") + "_index")
    actual = back.groupBy("shard").agg(
        F.count("*").alias("a_docs"),
        F.sum(weight_col).alias("a_tokens"),
        _shard_digest(back, partition_col="shard"),
    ).withColumnRenamed("content_digest", "a_digest")
    j = index.join(actual, "shard", "full_outer")
    rows = j.select(
        "shard", "n_docs", "a_docs", "n_tokens", "a_tokens",
        "content_digest", "a_digest",
    ).collect()
    report: dict = {
        "ok": True, "checked": len(rows), "mismatched": [],
        "missing_in_data": [], "missing_in_index": [],
    }
    for r in rows:
        if r["a_docs"] is None:
            report["missing_in_data"].append(r["shard"])
        elif r["n_docs"] is None:
            report["missing_in_index"].append(r["shard"])
        elif (r["n_docs"], r["n_tokens"], r["content_digest"]) != (
                r["a_docs"], r["a_tokens"], r["a_digest"]):
            report["mismatched"].append(r["shard"])
    report["ok"] = not (report["mismatched"] or report["missing_in_data"]
                        or report["missing_in_index"])
    return report


def length_bucket_plan(
    df: DataFrame,
    length_col: str,
    batch_tokens: int = 8192,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Length-bucketed batching plan: group sequences into power-of-two
    length buckets and size the per-bucket batch schedule. Batching
    same-length sequences minimizes padding waste (the standard
    bucketed-batching trick); this computes the plan a loader executes.

    Per (group, bucket): ``bucket_lo``/``bucket_hi`` (the power-of-two
    range), ``n_seqs``, ``sum_len``, ``batch_size`` (sequences per batch
    = floor(batch_tokens / bucket_hi), >= 1 — sized to the bucket CEILING
    so a batch never overflows ``batch_tokens`` even if all rows are at
    the top of the range), ``n_batches`` (= ceil(n_seqs/batch_size)), and
    ``pad_frac`` — the padding fraction if every sequence pads to
    ``bucket_hi`` (1 - sum_len / (n_seqs*bucket_hi)), the waste metric
    the bucket granularity is tuned against.

    Scale shape: map-only bucket assignment (integer log2 via bit
    length of the value, pure codegen), ONE partial-aggregated groupBy.
    Rows with length <= 0 are excluded.
    """
    g = list(group_cols or [])
    ln = F.col(length_col).cast("long")
    # floor(log2(len)): 63 - leading zeros — expressed portably as the
    # bit length of the value via FLOOR(LOG2(x)) would hit float edges at
    # exact powers of two; use string length of binary representation
    log2f = (F.length(F.conv(ln.cast("string"), 10, 2)) - F.lit(1)).cast("int")
    b = (
        df.filter(ln > 0)
        .withColumn("_b", log2f)
        .groupBy(*g, "_b")
        .agg(
            F.count(F.lit(1)).alias("n_seqs"),
            F.sum(ln).alias("sum_len"),
        )
    )
    # SQL form: the Python F.shiftleft only takes a literal int numBits
    lo = F.expr("shiftleft(CAST(1 AS BIGINT), _b)")
    hi = F.expr("shiftleft(CAST(1 AS BIGINT), _b + 1)") - 1
    bs = F.greatest(F.floor(F.lit(batch_tokens) / hi), F.lit(1)).cast("long")
    return b.select(
        *g,
        F.col("_b").alias("bucket"),
        lo.alias("bucket_lo"),
        hi.alias("bucket_hi"),
        "n_seqs",
        "sum_len",
        bs.alias("batch_size"),
        F.ceil(F.col("n_seqs") / bs).cast("long").alias("n_batches"),
        (F.lit(1.0) - F.col("sum_len") / (F.col("n_seqs") * hi)).alias("pad_frac"),
    )


def token_budget_sample(
    df: DataFrame,
    stratum_col: str,
    budget: float,
    weight_col: str = "n_tokens",
    key_col: str = "doc_id",
    seed: str = "s0",
) -> dict:
    """Downsample every stratum to ~``budget`` total weight: per-stratum
    rate = min(1, budget / stratum total), then the deterministic
    stratified Bernoulli (map-only decisions; a stratum under budget keeps
    everything). Returns ``sample`` plus the ``rates`` actually applied —
    the auditable mix report."""
    totals = {
        r[0]: int(r[1])
        for r in df.groupBy(stratum_col).agg(F.sum(weight_col)).collect()
    }
    rates = {k: min(1.0, float(budget) / v) for k, v in totals.items() if v > 0}
    sample = stratified_sample(df, stratum_col, rates, key_col, seed)
    return {"sample": sample, "rates": rates, "totals": totals}


def plan_epochs(index: DataFrame, n_epochs: int, seed: str = "e0") -> DataFrame:
    """Loader-side epoch schedule from the shard index: for each epoch a
    reproducible pseudorandom shard order (md5 of seed:epoch:shard — the
    same hash-as-order device as :func:`shuffle_order`), so every worker
    on any machine derives the identical schedule from the index alone and
    a resumed run re-enters mid-epoch deterministically. Shards stay the
    shuffle unit (intra-shard order is the training order baked at write
    time); epoch-level reshuffling of shard order is the standard
    large-corpus approximation of a full per-epoch permutation — a true
    re-permutation would rewrite the corpus per epoch.

    Metadata-scale op: the index has one row per shard (~100M tokens
    each), so even a 25T-token corpus is ~250k rows × epochs — the
    per-epoch window is nowhere near data scale. Adds ``epoch`` and
    ``epoch_pos`` (0-based position of the shard within that epoch's
    order) to every index column."""
    epochs = index.sparkSession.range(n_epochs).select(
        F.col("id").cast("int").alias("epoch")
    )
    w = Window.partitionBy("epoch").orderBy("_ord", "shard")
    return (
        index.crossJoin(F.broadcast(epochs))
        .withColumn("_ord", F.md5(F.concat_ws(":", F.lit(seed), "epoch", "shard")))
        .withColumn("epoch_pos", (F.row_number().over(w) - 1).cast("long"))
        .drop("_ord")
    )


def curriculum_order(
    df: DataFrame,
    score_col: str,
    n_stages: int,
    key_col: str = "doc_id",
    seed: str = "cur0",
    ascending: bool = True,
) -> DataFrame:
    """Curriculum training order: split the corpus into ``n_stages``
    equal-count difficulty stages (NTILE over ``score_col``, easy→hard
    when ``ascending``) and give every row a global ``position`` that
    runs stage by stage with a deterministic md5 shuffle INSIDE each
    stage — the standard curriculum-learning schedule (ordered between
    stages so training sees easy examples first, shuffled within a
    stage so batches stay i.i.d. inside the difficulty band).

    Determinism: the stage is NTILE over the total order
    ``(score, key)`` (ties can't float between stages across runs or
    partitionings); the within-stage order ranks by the FULL
    ``md5(seed || key)`` digest with the typed key as tiebreak (NOT
    :func:`shuffle_order`'s 8-hex-prefix + lpad-20 encoding — the two
    permutations differ and are independently pinned by oracles; don't
    "unify" them without re-pinning both) — same rows, same positions,
    every run.

    Scale shape: stage assignment needs a global rank, which here is
    :func:`with_global_offset` with unit weights over the STRUCT order
    key (score, key) — one range shuffle + per-partition running sums,
    never a single-task ``ntile() OVER (ORDER BY …)`` window; rank r of
    N maps to stage ``(r · n_stages) DIV N`` (exact equal-count NTILE
    arithmetic). N attaches as a broadcast 1-row aggregate. The final
    position is a second distributed rank over the struct
    (stage, md5, key). Two range shuffles total, no global sort task.
    NULL scores drop (no difficulty — no stage); NaN sorts as Spark
    orders doubles (greater than any number)."""
    if n_stages < 1:
        raise ValueError(f"n_stages must be >= 1, got {n_stages}")
    score = F.col(score_col).cast("double")
    d = (
        df.filter(score.isNotNull())
        .withColumn("_one", F.lit(1).cast("long"))
        # struct ordering is field-wise ascending; negate the score for
        # hard-first curricula (total order either way via the key)
        .withColumn("_sord", F.struct(
            (score if ascending else -score).alias("s"),
            F.col(key_col).alias("k")))
    )
    ranked = with_global_offset(d, "_one", order_col="_sord",
                                out_col="_rank")
    n1 = F.broadcast(ranked.agg(F.count(F.lit(1)).alias("_n")))
    staged = ranked.crossJoin(n1).withColumn(
        "stage", F.expr(f"(_rank * {int(n_stages)}) DIV _n"))
    h = F.struct(
        F.col("stage").alias("st"),
        F.md5(F.concat(F.lit(seed), F.col(key_col).cast("string")))
        .alias("h"),
        F.col(key_col).alias("k"),
    )
    out = with_global_offset(
        staged.withColumn("_ord", h), "_one",
        order_col="_ord", out_col="position",
    )
    return out.drop("_sord", "_one", "_rank", "_n", "_ord")
