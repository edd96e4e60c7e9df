"""Similarity search over embedding columns (array<float>).

- ``cosine_topk_brute``: exact top-k by cosine — the baseline. One
  broadcast of the query set + a map-side score + TakeOrdered per query.
  Linear scan: right answer at any scale where a full pass is acceptable.
- ``srp_bucket`` / ``ann_topk_srp``: sign-random-projection LSH — each
  vector gets a small bucket code from the signs of deterministic
  pseudo-random projections; queries only score vectors in their bucket
  (+ optional multiprobe neighbors at Hamming distance 1). This is the
  scale path: the scored set shrinks by ~2^bits.
- ``ivf_build`` / ``ivf_topk``: inverted-file index — KMeans centroids
  partition the vectors into cells; a query probes only the ``nprobe``
  nearest cells. The trained assignment column doubles as the physical
  partitioning key at scale (write the table partitioned by cell and a
  probe is a partition-pruned read).

All arithmetic is a sequential double fold (F.aggregate), so scores are
bit-deterministic and reproducible across engines.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _d(c: Column) -> Column:
    return c.cast("double")


def dot_expr(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: _d(x) * _d(y)), F.lit(0.0), lambda acc, x: acc + x
    )


def norm_expr(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(F.transform(a, lambda x: _d(x) * _d(x)), F.lit(0.0), lambda acc, x: acc + x)
    )


def cosine_expr(a: Column, b: Column) -> Column:
    return dot_expr(a, b) / (norm_expr(a) * norm_expr(b))


def cosine_topk_brute(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
) -> DataFrame:
    """Exact top-k neighbors per query row. Queries are broadcast (the
    query set is small); candidates never shuffle — only the per-query
    top-k heads move. Ties broken by id for determinism."""
    from pyspark.sql import Window

    # per-row norms computed once per side; each pair then costs one fold
    j = emb.withColumn("_nc", norm_expr(F.col(vec_col))).crossJoin(
        F.broadcast(queries.withColumn("_nq", norm_expr(F.col(query_vec_col))))
    )
    scored = j.select(
        F.col(query_id_col),
        F.col(id_col),
        (dot_expr(F.col(vec_col), F.col(query_vec_col))
         / (F.col("_nc") * F.col("_nq"))).alias("cosine"),
    ).filter(F.col(id_col) != F.col(query_id_col))
    w = Window.partitionBy(query_id_col).orderBy(F.col("cosine").desc(), F.col(id_col))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select(query_id_col, id_col, "cosine", F.col("rn").alias("rank"))
    )


def srp_bucket(vec: Column, bits: int = 8, dim: int = 64) -> Column:
    """Sign-random-projection bucket code. Projection p is a deterministic
    ±1 vector derived from xxhash-free arithmetic: sign of
    sin(9973*(p+1) + 31*i) — fixed, engine-independent, and good enough
    mixing for bucketing (this is a partitioning heuristic, not crypto)."""
    import math

    code = F.lit(0)
    for p in range(bits):
        signs = [1.0 if math.sin(9973.0 * (p + 1) + 31.0 * i) >= 0 else -1.0 for i in range(dim)]
        proj = F.aggregate(
            F.zip_with(
                vec,
                F.array(*[F.lit(s) for s in signs]),
                lambda x, s: _d(x) * s,
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        code = code + F.when(proj >= 0, F.lit(1 << p)).otherwise(F.lit(0))
    return code


def ann_topk_srp(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 10,
    bits: int = 8,
    dim: int = 64,
    multiprobe: bool = True,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
) -> DataFrame:
    """Approximate top-k: score only candidates whose SRP bucket matches
    the query's bucket (or any Hamming-1 neighbor bucket when multiprobe).
    The candidate join is an equality join on the bucket code — at scale
    this prunes ~ (1+bits)/2^bits of the table instead of scanning it."""
    from pyspark.sql import Window

    cand = emb.select(
        F.col(id_col), F.col(vec_col),
        srp_bucket(F.col(vec_col), bits, dim).alias("bucket"),
        norm_expr(F.col(vec_col)).alias("_nc"),
    )
    qb = queries.select(
        F.col(query_id_col), F.col(query_vec_col),
        srp_bucket(F.col(query_vec_col), bits, dim).alias("qbucket"),
        norm_expr(F.col(query_vec_col)).alias("_nq"),
    )
    if multiprobe:
        probes = F.array(F.col("qbucket"), *[
            F.col("qbucket").bitwiseXOR(F.lit(1 << b)) for b in range(bits)
        ])
        qb = qb.select(query_id_col, query_vec_col, "_nq",
                       F.explode(probes).alias("qbucket"))
    j = cand.join(F.broadcast(qb), cand.bucket == qb.qbucket)
    scored = j.select(
        F.col(query_id_col),
        F.col(id_col),
        (dot_expr(F.col(vec_col), F.col(query_vec_col))
         / (F.col("_nc") * F.col("_nq"))).alias("cosine"),
    ).filter(F.col(id_col) != F.col(query_id_col)).distinct()
    w = Window.partitionBy(query_id_col).orderBy(F.col("cosine").desc(), F.col(id_col))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select(query_id_col, id_col, "cosine", F.col("rn").alias("rank"))
    )


# --------------------------------------------------------------------------
# IVF (inverted file) index — KMeans cells + nprobe search
# --------------------------------------------------------------------------


def ivf_build(
    emb: DataFrame,
    n_centroids: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
    max_iter: int = 10,
    sample_rows: int | None = 8192,
    n_rows: int | None = None,
):
    """Train the coarse quantizer and assign every vector to its cell.

    The quantizer fits on a ``sample_rows``-row sample (pass ``None`` for
    a full fit) — bounded by design, so the fit is a seeded vectorized
    numpy Lloyd's over the collected sample (a few MB; a Spark-ML fit at
    that size is all job-orchestration overhead, measured ~2 s/fit).
    Assignment is always the full table: one Arrow-batched argmin pass,
    map-only. Returns ``(assigned, centroids)``: ``assigned`` = emb +
    ``cell`` column (at 100 TB, persist partitioned by ``cell`` so probes
    prune partitions — :func:`ivf_index` does exactly that);
    ``centroids`` = small driver-side list [(cell_id, [floats])] that
    broadcasts into the search.
    """
    import numpy as np

    fit_on = emb.select(F.col(vec_col).cast("array<double>").alias("_v"))
    if sample_rows is not None:
        # the quantizer only needs a representative sample — fitting on
        # the full table is O(N·k·iters) for no recall benefit. Callers
        # that already know the row count pass n_rows to skip the count
        # job; the fraction (and therefore the seeded Bernoulli sample)
        # is identical either way.
        n = emb.count() if n_rows is None else n_rows
        if n < 1:
            # a stale/undersized n_rows silently disables sampling and
            # collects the FULL table to the driver — fail loudly instead
            raise ValueError(f"n_rows must be the exact current count, got {n}")
        if n > sample_rows:
            fit_on = fit_on.sample(False, sample_rows / n, seed)
    # bounded driver collect: the training SAMPLE, never the table
    x = np.asarray([r["_v"] for r in fit_on.collect()], dtype=np.float64)
    cents = _lloyd(x, n_centroids, seed, max_iter)
    cb = np.asarray(cents, dtype=np.float64)

    assigned = emb.withColumn(
        "cell", _assign_cells_udf(cb)(F.col(vec_col).cast("array<double>")))
    centroids = [(i, [float(v) for v in c]) for i, c in enumerate(cb)]
    return assigned, centroids


def _assign_cells_udf(cb):
    """Arrow-batched nearest-centroid assignment for a driver-side
    codebook array: argmin over ``-2x·c + ||c||^2`` (the ||x||^2 term is
    constant per row). Shared by :func:`ivf_build` and
    :func:`ivfpq_build` so both run the SAME float64 expression the
    driver-side sample assignment uses (bit-identical argmin)."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T2
    from pyspark.sql.functions import pandas_udf

    cb_sq = (cb * cb).sum(axis=1)

    # no type hints: PEP-563 stringified annotations (future-imported in
    # this module) break pandas_udf's signature inference
    @pandas_udf(T2.IntegerType())
    def assign(vs):
        xs = np.vstack(vs.to_numpy()).astype(np.float64)
        d = -2.0 * (xs @ cb.T) + cb_sq[None, :]
        return pd.Series(np.argmin(d, axis=1).astype(np.int32))

    return assign


def ivf_index(
    spark,
    emb: DataFrame,
    index_path: str,
    n_centroids: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
    max_iter: int = 10,
    sample_rows: int | None = 8192,
):
    """Build-once / probe-many IVF: materialize the cell assignment as a
    parquet table **partitioned by cell** plus a centroids sidecar. The
    first call builds (sample-fit quantizer + one assignment pass); every
    later call just reads — so repeated probes pay only the probe, and a
    probe against the cell-partitioned layout is a partition-pruned read
    (this IS the 100 TB layout, not a cache trick).

    Returns ``(assigned, centroids)`` exactly like :func:`ivf_build`.
    """
    import json
    import os

    cfile = os.path.join(index_path, "centroids.json")
    vdir = os.path.join(index_path, "vectors")
    if not os.path.exists(cfile):
        assigned, centroids = ivf_build(
            emb, n_centroids, id_col, vec_col, seed, max_iter,
            sample_rows=sample_rows,
        )
        assigned.write.mode("overwrite").partitionBy("cell").parquet(vdir)
        os.makedirs(index_path, exist_ok=True)
        tmp = os.path.join(index_path, ".centroids.tmp")
        with open(tmp, "w") as fh:
            json.dump(centroids, fh)
        os.replace(tmp, cfile)  # atomic publish: index valid iff sidecar exists
    with open(cfile) as fh:
        centroids = [(int(c), [float(x) for x in v]) for c, v in json.load(fh)]
    return spark.read.parquet(vdir), centroids


def quantize_embeddings(
    df: DataFrame,
    vec_col: str = "embedding",
    scale_col: str = "q_scale",
    out_col: str = "q8",
) -> DataFrame:
    """Symmetric per-vector int8 quantization: ``q_i = floor(x_i/scale +
    0.5)`` with ``scale = max|x| / 127`` — the 4x footprint cut for
    100 TB ANN state (a 1024-dim float32 vector is 4 KB; int8 is 1 KB,
    so the same executor memory holds 4x the index). Cosine is
    scale-invariant, so candidate scoring runs DIRECTLY on the int
    arrays — exact integer dot products, no dequantize pass — at ~1e-2
    cosine error for typical vectors; rescore the final top-k against
    full-precision vectors when that matters (the standard
    quantize-score-rescore ladder).

    Map-only (zero shuffle). The scale lands in its own column FIRST so
    the per-element transform reads a bound value — inlining the
    array_max into the lambda would re-evaluate the O(dim) max per
    element (the HOF re-evaluation trap). Half-up floor rounding, not
    banker's, so the mapping is engine-deterministic and
    oracle-checkable."""
    vec = F.col(vec_col)
    d = df.withColumn(
        scale_col,
        F.greatest(
            F.array_max(F.transform(vec, lambda x: F.abs(_d(x)))) / F.lit(127.0),
            F.lit(1e-30),  # zero vectors quantize to zeros, not NaNs
        ),
    )
    return d.withColumn(
        out_col,
        F.transform(
            vec,
            lambda x: F.floor(_d(x) / F.col(scale_col) + F.lit(0.5)).cast("tinyint"),
        ),
    )


def ivf_append(
    spark,
    new_emb: DataFrame,
    index_path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
):
    """Incremental IVF maintenance: assign NEW vectors to their nearest
    existing centroid and append them to the cell-partitioned index — the
    continuous-ingest path that keeps probes fresh without refitting the
    quantizer per batch. O(batch) work: one broadcast crossJoin against
    the (tiny) centroid list for the argmin, an id anti-join that reads
    ONLY the touched cell partitions (idempotent under replay — an id
    already indexed in its cell is skipped), one partitioned append.

    The quantizer itself stays fixed, so a drifting embedding
    distribution slowly skews cell occupancy (recall stays exact per
    probe; probe cost grows in hot cells). Watch
    :func:`cluster_stats`'s size shares and rebuild with
    :func:`ivf_index` (fresh path or after deleting the sidecar) when the
    hottest cell's share is a few multiples of 1/n_centroids — the
    standard reindex cadence, not a per-batch cost.

    Returns ``(assigned_full, centroids)`` like :func:`ivf_index`.
    ``new_emb`` must carry the index's non-partition columns."""
    import json
    import os

    from pyspark.sql import Window

    cfile = os.path.join(index_path, "centroids.json")
    vdir = os.path.join(index_path, "vectors")
    if not os.path.exists(cfile):
        raise ValueError(
            f"no IVF index at {index_path}; build one with ivf_index first"
        )
    with open(cfile) as fh:
        centroids = [(int(c), [float(x) for x in v]) for c, v in json.load(fh)]
    cent = spark.createDataFrame(
        [(c, v) for c, v in centroids], "cell int, centroid array<double>"
    )
    # same metric KMeans assigns by: squared L2 to the centroid
    d2 = F.aggregate(
        F.zip_with(F.col(vec_col), F.col("centroid"),
                   lambda x, y: (_d(x) - y) * (_d(x) - y)),
        F.lit(0.0), lambda acc, x: acc + x,
    )
    w = Window.partitionBy(id_col).orderBy(F.col("_d2"), F.col("cell"))
    assigned = (
        new_emb.crossJoin(F.broadcast(cent))
        .withColumn("_d2", d2)
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_d2", "_rn", "centroid")
    )
    index_cols = spark.read.parquet(vdir).columns
    assigned = assigned.select(*index_cols).cache()
    try:
        touched = [r[0] for r in assigned.select("cell").distinct().collect()]
        existing = (
            spark.read.parquet(vdir)
            .filter(F.col("cell").isin(touched))  # partition-pruned
            .select(id_col)
        )
        fresh = assigned.join(existing, id_col, "left_anti")
        fresh.write.mode("append").partitionBy("cell").parquet(vdir)
    finally:
        assigned.unpersist()
    return spark.read.parquet(vdir), centroids


def ivf_compact(
    spark,
    index_path: str,
    max_files_per_cell: int = 4,
) -> int:
    """Maintenance for an append-maintained IVF index: every
    :func:`ivf_append` adds a file per touched cell, so probe read cost
    creeps up with batch count until folded. Rewrites only cells whose
    file count exceeds ``max_files_per_cell`` (coalesced to one file
    each, via a staging dir + dot-prefixed backup swap: Spark and the
    cell glob never see in-flight dirs, and a crash mid-swap is healed
    on the next call by re-installing the orphaned backup), leaving cold
    cells untouched. Run on the maintenance cadence alongside
    ``maintain_corpus``. Returns the number of cells compacted."""
    import glob
    import os
    import shutil

    vdir = os.path.join(index_path, "vectors")

    # crash recovery first: a crash between the two renames below leaves
    # an orphaned backup and NO live cell dir — re-install the backup.
    # Backups are dot-prefixed so Spark's partition discovery and the
    # cell=* glob never see them (a 'cell=K.old' sibling would poison the
    # index: partition column inferred as string with bogus values).
    for bak in glob.glob(os.path.join(vdir, ".old-cell-*")):
        cell_name = "cell=" + os.path.basename(bak)[len(".old-cell-"):]
        live = os.path.join(vdir, cell_name)
        if os.path.exists(live):
            shutil.rmtree(bak, ignore_errors=True)  # swap completed; drop it
        else:
            os.rename(bak, live)

    compacted = 0
    for cell_dir in sorted(glob.glob(os.path.join(vdir, "cell=*"))):
        base = os.path.basename(cell_dir).split("=", 1)[1]
        try:
            cell = int(base)
        except ValueError:
            continue  # never ours — cell values are ints; don't crash on it
        files = [f for f in os.listdir(cell_dir) if f.endswith(".parquet")]
        if len(files) <= max_files_per_cell:
            continue
        stage = os.path.join(vdir, f".compact-cell-{cell}")
        shutil.rmtree(stage, ignore_errors=True)  # crashed prior attempt
        (
            spark.read.parquet(cell_dir).coalesce(1)
            .write.mode("overwrite").parquet(stage)
        )
        old = os.path.join(vdir, f".old-cell-{cell}")
        shutil.rmtree(old, ignore_errors=True)
        os.rename(cell_dir, old)
        os.rename(stage, cell_dir)
        shutil.rmtree(old, ignore_errors=True)
        compacted += 1
    return compacted


def mmr_rerank(
    candidates: DataFrame,
    k: int = 10,
    lam: float = 0.7,
    query_id_col: str = "query_id",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    score_col: str = "cosine",
) -> DataFrame:
    """Maximal Marginal Relevance rerank (Carbonell & Goldstein): from a
    per-query candidate pool (e.g. the top-50 of a brute/ANN pass),
    greedily select ``k`` results maximizing
    ``lam·relevance − (1−lam)·max_cosine_to_already_selected`` — the
    diversity pass that keeps a retrieval result (or a RAG context set)
    from being k copies of the same near-duplicate.

    MMR is inherently sequential per query, so this is the honest
    Pandas-path operator: ``applyInPandas`` grouped by query — each
    group's candidate pool is small by construction (it came out of a
    top-N), the greedy loop runs vectorized numpy inside one Arrow
    batch, and queries parallelize across the cluster. Nothing about
    the 100 TB corpus is in play here — only the already-reduced pools.

    Ties break by id; output ``(query, id, relevance, mmr_score,
    mmr_rank)`` with rank 1..k in selection order. Deterministic.
    """
    import numpy as np
    import pandas as pd

    fields = {f.name: f for f in candidates.schema.fields}
    out_schema = T.StructType([
        fields[query_id_col], fields[id_col],
        T.StructField("relevance", T.DoubleType()),
        T.StructField("mmr_score", T.DoubleType()),
        T.StructField("mmr_rank", T.IntegerType()),
    ])

    def per_query(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values([score_col, id_col],
                              ascending=[False, True]).reset_index(drop=True)
        vecs = np.array([np.asarray(v, dtype=np.float64)
                         for v in pdf[vec_col]])
        norms = np.linalg.norm(vecs, axis=1)
        norms[norms == 0.0] = 1.0
        unit = vecs / norms[:, None]
        rel = pdf[score_col].to_numpy(dtype=np.float64)
        n = len(pdf)
        selected: list[int] = []
        scores: list[float] = []
        max_sim = np.full(n, -np.inf)
        remaining = np.ones(n, dtype=bool)
        for _ in range(min(k, n)):
            penalty = np.where(np.isfinite(max_sim), max_sim, 0.0)
            mmr = lam * rel - (1 - lam) * penalty
            mmr[~remaining] = -np.inf
            best = int(np.argmax(mmr))  # argmax takes first ⇒ id tiebreak
            selected.append(best)
            scores.append(float(mmr[best]))
            remaining[best] = False
            sims = unit @ unit[best]
            max_sim = np.maximum(max_sim, sims)
        return pd.DataFrame({
            query_id_col: pdf[query_id_col].iloc[selected].to_numpy(),
            id_col: pdf[id_col].iloc[selected].to_numpy(),
            "relevance": rel[selected],
            "mmr_score": scores,
            "mmr_rank": np.arange(1, len(selected) + 1, dtype=np.int32),
        })

    return candidates.groupBy(query_id_col).applyInPandas(per_query, out_schema)


def ivf_topk(
    assigned: DataFrame,
    centroids: list,
    queries: DataFrame,
    k: int = 10,
    nprobe: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
) -> DataFrame:
    """Approximate top-k by cosine, scoring only vectors in the query's
    ``nprobe`` nearest cells. Probe selection is a driver-free broadcast
    crossJoin (centroid count is tiny); the candidate join is an equality
    join on ``cell`` — the partition-pruned read at scale."""
    from pyspark.sql import Window

    spark = assigned.sparkSession
    cent = spark.createDataFrame(
        [(c, v) for c, v in centroids], "cell int, centroid array<double>"
    )
    # nprobe nearest cells per query (L2 to centroid)
    l2 = F.sqrt(F.aggregate(
        F.zip_with(F.col(query_vec_col), F.col("centroid"),
                   lambda x, y: (_d(x) - y) * (_d(x) - y)),
        F.lit(0.0), lambda acc, x: acc + x,
    ))
    qc = (
        queries.crossJoin(F.broadcast(cent))
        .select(query_id_col, query_vec_col, "cell", l2.alias("_d2"))
    )
    w_probe = Window.partitionBy(query_id_col).orderBy(F.col("_d2"), F.col("cell"))
    probes = (
        qc.withColumn("_pr", F.row_number().over(w_probe))
        .filter(F.col("_pr") <= nprobe)
        .select(query_id_col, query_vec_col, "cell")
    )
    j = assigned.withColumn("_nc", norm_expr(F.col(vec_col))).join(
        F.broadcast(probes.withColumn("_nq", norm_expr(F.col(query_vec_col)))), "cell"
    )
    scored = j.select(
        F.col(query_id_col), F.col(id_col),
        (dot_expr(F.col(vec_col), F.col(query_vec_col))
         / (F.col("_nc") * F.col("_nq"))).alias("cosine"),
    ).filter(F.col(id_col) != F.col(query_id_col))
    w = Window.partitionBy(query_id_col).orderBy(F.col("cosine").desc(), F.col(id_col))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select(query_id_col, id_col, "cosine", F.col("rn").alias("rank"))
    )


def rescore_topk(
    candidates: DataFrame,
    emb: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
) -> DataFrame:
    """The last rung of the quantize→score→rescore ladder: take candidate
    ``(query_id, vec_id)`` pairs from any approximate stage (quantized
    IVF, SRP buckets) and recompute EXACT full-precision cosine for just
    those pairs, returning the re-ranked top ``k`` per query. Candidate
    sets are a few·k per query, so the full-vector join is a semi-join-
    sized read against the embedding table (partition/cell-pruned when
    ``emb`` is the IVF layout) and the scoring is O(candidates) — the
    approximate stage did the heavy pruning, precision costs only the
    final touch."""
    from pyspark.sql import Window

    cand = candidates.select(query_id_col, id_col)
    j = (
        cand.join(emb.select(id_col, vec_col), id_col)
        .join(F.broadcast(queries.select(query_id_col, query_vec_col)),
              query_id_col)
    )
    cos = dot_expr(F.col(vec_col), F.col(query_vec_col)) / (
        norm_expr(F.col(vec_col)) * norm_expr(F.col(query_vec_col))
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("cosine").desc(), F.col(id_col)
    )
    return (
        j.select(query_id_col, id_col, cos.alias("cosine"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select(query_id_col, id_col, "cosine", F.col("rn").alias("rank"))
    )


def cluster_stats(
    assigned: DataFrame,
    centroids: list,
    vec_col: str = "embedding",
) -> DataFrame:
    """Per-cluster corpus topology from an IVF/KMeans assignment: size,
    occupancy share, and dispersion (mean/max L2 distance to the cell
    centroid). The embedding-space analog of ``corpus_stats`` — which
    topics exist, how big, how tight — and the health check for the IVF
    index itself (one mega-cell means the quantizer needs re-fitting or
    more centroids).

    Scale shape: one broadcast join on ``cell`` (centroid list is tiny by
    construction), distances as JVM array expressions, one partial-agg
    shuffle on ``cell`` — no driver pass, no UDF."""
    spark = assigned.sparkSession
    cent = spark.createDataFrame(
        [(c, v) for c, v in centroids], "cell int, centroid array<double>"
    )
    l2 = F.sqrt(F.aggregate(
        F.zip_with(F.col(vec_col), F.col("centroid"),
                   lambda x, y: (_d(x) - y) * (_d(x) - y)),
        F.lit(0.0), lambda acc, x: acc + x,
    ))
    per = (
        assigned.join(F.broadcast(cent), "cell")
        .select("cell", l2.alias("_dist"))
        .groupBy("cell")
        .agg(
            F.count("*").alias("n_vectors"),
            F.avg("_dist").alias("mean_dist"),
            F.max("_dist").alias("max_dist"),
        )
    )
    total = per.select(F.sum("n_vectors").alias("_t"))
    return (
        per.crossJoin(F.broadcast(total))
        .withColumn("share", F.col("n_vectors").cast("double") / F.col("_t"))
        .drop("_t")
    )


# ---------------------------------------------------------------------------
# Product quantization (Jégou, Douze, Schmid 2011) — the memory rung of the
# ANN ladder below int8: an m-subspace code of ceil(log2(k)) bits each turns
# a 1024-dim float32 vector (4 KB) into m bytes (m=8 → 8 B, a 500x cut), and
# asymmetric-distance search scores candidates from an m×k lookup table
# without ever reconstructing them.
# ---------------------------------------------------------------------------

def _lloyd(x, k: int, seed: int, iters: int):
    """Seeded vectorized Lloyd's k-means on a driver-side sample array.
    Deterministic: seeded distinct-row init, argmin ties break low,
    empty clusters re-seeded from the farthest points in a fixed order.
    Returns the (k, dim) centroid array."""
    import numpy as np

    rng = np.random.default_rng(seed)
    uniq = np.unique(x, axis=0)
    if len(uniq) <= k:
        # fewer distinct points than centroids: pad by repeating the
        # last distinct row (assignment is unaffected)
        pad = np.repeat(uniq[-1:], k - len(uniq), axis=0)
        return np.concatenate([uniq, pad]) if len(uniq) < k else uniq
    cents = uniq[rng.choice(len(uniq), size=k, replace=False)]
    for _ in range(iters):
        d = ((x[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
        assign = np.argmin(d, axis=1)
        new = np.empty_like(cents)
        empty = []
        for c in range(k):
            mask = assign == c
            if mask.any():
                new[c] = x[mask].mean(axis=0)
            else:
                empty.append(c)
        if empty:
            far = np.argsort(-d.min(axis=1), kind="stable")
            for i, c in enumerate(empty):
                new[c] = x[far[i]]
        if np.array_equal(new, cents):
            break
        cents = new
    return cents


def pq_train(
    emb: DataFrame,
    m: int = 4,
    k: int = 16,
    vec_col: str = "embedding",
    seed: int = 42,
    max_iter: int = 10,
    sample_rows: int | None = 8192,
    n_rows: int | None = None,
) -> list:
    """Train per-subspace codebooks: split each vector into ``m``
    contiguous subvectors and k-means each subspace to ``k`` centroids
    on a bounded sample. The sample is BOUNDED BY DESIGN (the quantizer
    needs representativeness, not the full table), so the m fits run as
    seeded vectorized numpy Lloyd's on the collected sample — a few MB —
    rather than m Spark-ML jobs whose per-fit orchestration dominates at
    sample scale (measured ~2 s/fit overhead; m=8 codebooks cost more in
    job launches than in math). Returns a small driver-side structure
    ``[(subspace, [[centroid floats] × k])]`` (m·k·(dim/m) floats) that
    broadcasts into encode/search. Seeded, so retrains are reproducible;
    like the IVF quantizer it is NOT engine-portable — parity for the
    PQ tier is pytest recall/distortion contracts, not oracle hashes.

    ``dim`` must divide evenly by ``m`` (validated on the collected
    sample — ragged subspaces silently skew the code budget toward the
    tail otherwise). Validating there instead of via a separate
    ``first()`` probe saves one driver action per train (the probe used
    to re-execute the whole upstream chain when the input was an
    un-materialized residual frame)."""
    import numpy as np

    if m < 1 or k < 2:
        raise ValueError(f"need m >= 1 and k >= 2, got m={m}, k={k}")
    fit_on = emb.select(F.col(vec_col).cast("array<double>").alias("_v"))
    if sample_rows is not None:
        # callers that already know the row count pass n_rows to skip
        # the count job; the fraction (and therefore the seeded
        # Bernoulli sample) is identical either way
        n = emb.count() if n_rows is None else n_rows
        if n < 1:
            # a stale/undersized n_rows silently disables sampling and
            # collects the FULL table to the driver — fail loudly instead
            raise ValueError(f"n_rows must be the exact current count, got {n}")
        if n > sample_rows:
            fit_on = fit_on.sample(False, sample_rows / n, seed)
    # bounded driver collect: the training SAMPLE (≤ sample_rows rows),
    # never the table — the documented quantizer-fit contract
    try:
        x = np.asarray([r["_v"] for r in fit_on.collect()], dtype=np.float64)
    except ValueError as e:
        # NumPy >= 1.24 raises its own 'inhomogeneous shape' error inside
        # asarray for ragged lists, before the ndim check below can run
        raise ValueError("pq_train: ragged vector lengths in input") from e
    if x.size == 0:
        raise ValueError("pq_train: empty input")
    if x.ndim != 2:
        raise ValueError("pq_train: ragged vector lengths in input")
    dim = x.shape[1]
    if dim % m != 0:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    sub = dim // m
    books = []
    for j in range(m):
        cents = _lloyd(x[:, j * sub:(j + 1) * sub], k, seed + j, max_iter)
        books.append((j, [[float(v) for v in c] for c in cents]))
    return books


def pq_encode(
    df: DataFrame,
    codebooks: list,
    vec_col: str = "embedding",
    out_col: str = "pq_code",
) -> DataFrame:
    """Attach the ``m``-byte code array: per subspace, the index of the
    nearest codebook centroid (squared L2). Map-only — an Arrow-batched
    pandas UDF doing one ``argmin`` matrix pass per subspace per batch
    (numpy broadcasting; no per-row Python). Codes are
    ``array<int>`` of length m with values in [0, k)."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T
    from pyspark.sql.functions import pandas_udf

    cbs = [np.asarray(b, dtype=np.float64) for _, b in
           sorted(codebooks, key=lambda t: t[0])]
    sub = cbs[0].shape[1]

    # no type hints: PEP-563 stringified annotations (future-imported in
    # this module) break pandas_udf's signature inference
    @pandas_udf(T.ArrayType(T.IntegerType()))
    def encode(vs):
        x = np.vstack(vs.to_numpy()).astype(np.float64)
        codes = np.empty((x.shape[0], len(cbs)), dtype=np.int32)
        for j, cb in enumerate(cbs):
            xs = x[:, j * sub:(j + 1) * sub]
            # ||x - c||^2 = ||x||^2 - 2x·c + ||c||^2; the x term is
            # constant per row, so argmin needs only the last two
            d = -2.0 * (xs @ cb.T) + (cb * cb).sum(axis=1)[None, :]
            codes[:, j] = np.argmin(d, axis=1)
        return pd.Series(list(codes))

    return df.withColumn(out_col, encode(F.col(vec_col).cast("array<double>")))


def pq_topk(
    encoded: DataFrame,
    codebooks: list,
    queries: list,
    k: int = 10,
    id_col: str = "vec_id",
    code_col: str = "pq_code",
    exclude_self: bool = True,
) -> DataFrame:
    """Asymmetric-distance top-k: per query build the m×k lookup table
    of exact query-subvector→centroid squared distances ONCE, then score
    every candidate as a sum of m table gathers — candidates are never
    reconstructed. ``queries`` is a driver-side ``[(query_id, [floats])]``
    list (query sets are small; the tables broadcast in the UDF
    closure). Returns ``(query_id, vec_id, adc_dist, rank)``.

    ``exclude_self`` (default True) drops candidates whose ``id_col``
    equals the query id — the right default when queries are drawn from
    the corpus (``cosine_topk_brute``'s convention, which assumes a
    SHARED id space). Pass False for externally-numbered queries, where
    an unrelated corpus vector could collide with a query id and be
    silently excluded.

    Scale shape: scoring is mapInPandas over the ENCODED table — the
    big side never shuffles, each Arrow batch pays one vectorized numpy
    gather per query — and only per-query heads move through the
    WindowGroupLimit top-k. Compose with :func:`rescore_topk` for
    exact final ranking (the standard PQ search ladder)."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import Window
    from pyspark.sql import types as T

    cbs = [np.asarray(b, dtype=np.float64) for _, b in
           sorted(codebooks, key=lambda t: t[0])]
    m, sub = len(cbs), cbs[0].shape[1]
    qs = [(qid, np.asarray(v, dtype=np.float64)) for qid, v in queries]
    luts = []
    for qid, qv in qs:
        lut = np.empty((m, cbs[0].shape[0]), dtype=np.float64)
        for j, cb in enumerate(cbs):
            diff = cb - qv[j * sub:(j + 1) * sub][None, :]
            lut[j] = (diff * diff).sum(axis=1)
        luts.append((qid, lut))

    out_schema = T.StructType([
        T.StructField("query_id", T.LongType()),
        T.StructField(id_col, T.LongType()),
        T.StructField("adc_dist", T.DoubleType()),
    ])

    def score(batches):
        for pdf in batches:
            codes = np.vstack(pdf[code_col].to_numpy()).astype(np.int64)
            ids = pdf[id_col].to_numpy()
            rows = np.arange(m)
            for qid, lut in luts:
                d = lut[rows[None, :], codes].sum(axis=1)
                yield pd.DataFrame({
                    "query_id": np.full(len(ids), qid, dtype=np.int64),
                    id_col: ids,
                    "adc_dist": d,
                })

    scored = encoded.select(id_col, code_col).mapInPandas(score, out_schema)
    w = Window.partitionBy("query_id").orderBy(
        F.col("adc_dist").asc(), F.col(id_col))
    if exclude_self:
        scored = scored.filter(F.col("query_id") != F.col(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def ivfpq_build(
    emb: DataFrame,
    n_centroids: int = 16,
    m: int = 4,
    k: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
    max_iter: int = 10,
    sample_rows: int | None = 8192,
):
    """IVFADC build (Jégou et al. 2011 §IV): compose the coarse IVF
    quantizer with PQ codebooks trained on the RESIDUALS ``x − c(x)``.
    Residual encoding is what makes the composition better than either
    rung alone — the coarse centroid absorbs the vector's location so the
    m-byte code only has to describe the (much lower-variance) offset.

    Orchestration: BOTH quantizers fit from ONE collected sample. The
    coarse codebook trains on the sampled vectors; their cells and
    residuals are then computed driver-side with the exact float64
    expressions the distributed path uses (``_assign_cells_udf``'s
    argmin formula; IEEE subtraction), so the per-subspace codebooks are
    bit-identical to sampling the residual frame itself — without
    executing the assignment UDF + broadcast join a second time just to
    re-collect the same rows (the old shape's ``pq_train`` pass), and
    without caching the full residual frame as a side effect. Build cost
    drops to two jobs: one count, one sample collect
    (``tests/test_dedup_similarity.py`` pins the bit-identity).

    Returns ``(encoded, centroids, codebooks)`` where ``encoded`` is
    ``(id_col, cell, pq_code)`` — the search table carries NO
    full-precision vectors (m bytes + a cell id per vector; at scale,
    persist it partitioned by ``cell`` exactly like :func:`ivf_index`
    so probes prune partitions). Scale shape: the residual subtraction
    is a broadcast join on ``cell`` + one JVM ``zip_with`` (map-only);
    training touches only a bounded sample."""
    import numpy as np

    if m < 1 or k < 2:
        raise ValueError(f"need m >= 1 and k >= 2, got m={m}, k={k}")
    fit_on = emb.select(F.col(vec_col).cast("array<double>").alias("_v"))
    if sample_rows is not None:
        n = emb.count()
        if n > sample_rows:
            fit_on = fit_on.sample(False, sample_rows / n, seed)
    # bounded driver collect: the training SAMPLE, never the table
    try:
        x = np.asarray([r["_v"] for r in fit_on.collect()], dtype=np.float64)
    except ValueError as e:
        raise ValueError("ivfpq_build: ragged vector lengths in input") from e
    if x.size == 0:
        raise ValueError("ivfpq_build: empty input")
    if x.ndim != 2:
        raise ValueError("ivfpq_build: ragged vector lengths in input")
    dim = x.shape[1]
    if dim % m != 0:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    cb = np.asarray(_lloyd(x, n_centroids, seed, max_iter), dtype=np.float64)
    # residuals of the SAME sample, driver-side: identical argmin
    # expression to the assignment UDF, IEEE float64 subtraction
    d = -2.0 * (x @ cb.T) + (cb * cb).sum(axis=1)[None, :]
    rx = x - cb[np.argmin(d, axis=1)]
    sub = dim // m
    books = [
        (j, [[float(v) for v in c]
             for c in _lloyd(rx[:, j * sub:(j + 1) * sub], k, seed + j,
                             max_iter)])
        for j in range(m)
    ]
    centroids = [(i, [float(v) for v in c]) for i, c in enumerate(cb)]

    # full-table pass: assignment UDF + broadcast residual + PQ encode,
    # one map-only chain evaluated once by the single consumer
    spark = emb.sparkSession
    cent = spark.createDataFrame(
        [(c, v) for c, v in centroids], "cell int, _centroid array<double>")
    resid = (
        emb.withColumn(
            "cell", _assign_cells_udf(cb)(F.col(vec_col).cast("array<double>")))
        .join(F.broadcast(cent), "cell")
        .withColumn(
            "_resid",
            F.zip_with(F.col(vec_col).cast("array<double>"),
                       F.col("_centroid"), lambda x, y: x - y),
        )
    )
    encoded = pq_encode(resid, books, vec_col="_resid").select(
        id_col, "cell", "pq_code")
    return encoded, centroids, books


def ivfpq_topk(
    encoded: DataFrame,
    centroids: list,
    codebooks: list,
    queries: list,
    k: int = 10,
    nprobe: int = 4,
    shortlist: int | None = None,
    id_col: str = "vec_id",
    code_col: str = "pq_code",
    exclude_self: bool = True,
) -> DataFrame:
    """IVFADC search: probe each query's ``nprobe`` nearest cells and
    ADC-score ONLY the codes in those cells, using a per-(query, cell)
    residual lookup table ``lut[j][c] = ||(q − centroid)_j − codebook_j[c]||²``
    (``||q − (centroid + r̂)||² = ||(q − centroid) − r̂||²``, so summing m
    gathers is the exact asymmetric distance to the reconstruction).

    Returns the top-``shortlist`` (default ``4·k``) candidates per query
    by ADC distance — feed them to :func:`rescore_topk` for the exact
    final ranking (the full ladder: coarse prune → ADC shortlist → exact
    head). vs :func:`ivf_topk` at equal ``nprobe``, the exact-scoring
    stage shrinks from every-candidate-in-probed-cells to the shortlist;
    vs :func:`pq_topk`, the ADC stage shrinks from the whole corpus to
    the probed cells.

    Scale shape: probe selection is driver-side numpy over the tiny
    centroid list; the candidate read is ``cell IN (probed)`` — a
    partition-pruned scan on the IVF layout; scoring is mapInPandas over
    the encoded table (the big side never shuffles, one vectorized gather
    per (query, cell) per Arrow batch); only per-query shortlist heads
    pass through the WindowGroupLimit."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import Window

    if shortlist is None:
        shortlist = 4 * k
    cbs = [np.asarray(b, dtype=np.float64) for _, b in
           sorted(codebooks, key=lambda t: t[0])]
    m, sub = len(cbs), cbs[0].shape[1]
    cent_ids = [c for c, _ in sorted(centroids, key=lambda t: t[0])]
    cent_mat = np.asarray(
        [v for _, v in sorted(centroids, key=lambda t: t[0])],
        dtype=np.float64)
    # cell -> [(query_id, m×k residual LUT)] for the queries probing it
    probe_map: dict[int, list] = {}
    for qid, qv in queries:
        q = np.asarray(qv, dtype=np.float64)
        d2 = ((cent_mat - q[None, :]) ** 2).sum(axis=1)
        order = np.lexsort((np.asarray(cent_ids), d2))  # ties → lower cell id
        for pos in order[:nprobe]:
            r = q - cent_mat[pos]
            lut = np.empty((m, cbs[0].shape[0]), dtype=np.float64)
            for j, cb in enumerate(cbs):
                diff = cb - r[j * sub:(j + 1) * sub][None, :]
                lut[j] = (diff * diff).sum(axis=1)
            probe_map.setdefault(int(cent_ids[pos]), []).append((qid, lut))

    out_schema = T.StructType([
        T.StructField("query_id", T.LongType()),
        T.StructField(id_col, T.LongType()),
        T.StructField("adc_dist", T.DoubleType()),
    ])
    probed_cells = sorted(probe_map)
    rows_j = np.arange(m)

    def score(batches):
        for pdf in batches:
            if pdf.empty:
                continue
            codes = np.vstack(pdf[code_col].to_numpy()).astype(np.int64)
            ids = pdf[id_col].to_numpy()
            cells = pdf["cell"].to_numpy()
            for cell in np.unique(cells):
                mask = cells == cell
                sub_codes, sub_ids = codes[mask], ids[mask]
                for qid, lut in probe_map.get(int(cell), ()):
                    d = lut[rows_j[None, :], sub_codes].sum(axis=1)
                    yield pd.DataFrame({
                        "query_id": np.full(len(sub_ids), qid, dtype=np.int64),
                        id_col: sub_ids,
                        "adc_dist": d,
                    })

    scored = (
        encoded.filter(F.col("cell").isin(probed_cells))
        .select(id_col, "cell", code_col)
        .mapInPandas(score, out_schema)
    )
    if exclude_self:
        scored = scored.filter(F.col("query_id") != F.col(id_col))
    w = Window.partitionBy("query_id").orderBy(
        F.col("adc_dist").asc(), F.col(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= shortlist)
    )


def rrf_fuse(
    ranked: list,
    id_col: str = "doc_id",
    rank_col: str = "rank",
    k: int = 10,
    k0: int = 60,
) -> DataFrame:
    """Reciprocal-rank fusion (Cormack, Clarke, Büttcher 2009) — the
    standard way to combine a sparse (BM25) and a dense (embedding)
    retrieval list into one hybrid ranking: each list contributes
    ``1/(k0 + rank)`` for the ids it ranked, ids are unioned (an id
    missing from a list just lacks that term), and the fused ranking
    orders by the summed score. Rank-based, so it needs no score
    calibration between heterogenous retrievers — and being a rational
    of small integers, it is engine-parity exact where score-weighted
    fusion would be float-order-dependent.

    ``ranked`` is ``[(name, DataFrame)]`` where each frame carries
    ``(id_col, rank_col)`` (1-based ranks, e.g. any *_topk output).
    Output: ``(id_col, rank_<name>… (0 = not ranked), rrf_score,
    rank)``. Scale shape: the inputs are top-k heads (tiny by
    construction); the fusion is full-outer joins + one fixed-order
    score sum + one bounded row_number — negligible next to the
    retrieval stages that produced the lists.
    """
    if not ranked:
        raise ValueError("ranked must be non-empty")
    from functools import reduce

    from pyspark.sql import Window

    frames = [
        df.select(F.col(id_col),
                  F.col(rank_col).cast("long").alias(f"rank_{name}"))
        for name, df in ranked
    ]
    joined = reduce(lambda a, b: a.join(b, id_col, "full_outer"), frames)
    score = None
    for name, _ in ranked:
        term = F.coalesce(
            F.lit(1.0) / (F.lit(k0) + F.col(f"rank_{name}")), F.lit(0.0))
        score = term if score is None else score + term
    w = Window.orderBy(F.col("rrf_score").desc(), F.col(id_col).asc())
    return (
        joined.select(
            id_col,
            *[F.coalesce(F.col(f"rank_{name}"), F.lit(0).cast("long"))
              .alias(f"rank_{name}") for name, _ in ranked],
            score.alias("rrf_score"),
        )
        # bounded window: the union of top-k heads, never the corpus
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def ivfpq_index(
    spark,
    emb: DataFrame,
    index_path: str,
    n_centroids: int = 16,
    m: int = 4,
    k: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
    max_iter: int = 10,
    sample_rows: int | None = 8192,
):
    """Build-once / probe-many IVFADC: materialize the encoded table
    (``id, cell, pq_code`` — m bytes + a cell id per vector, no
    full-precision vectors) as parquet PARTITIONED BY cell, plus a
    single JSON sidecar holding both quantizers. The first call builds
    (one coarse+PQ training pass + one encode pass); every later call
    just reads, and a probe against the cell-partitioned layout is a
    partition-pruned scan — the same publish contract as
    :func:`ivf_index` (sidecar written last via atomic rename: the
    index is valid iff the sidecar exists).

    Returns ``(encoded, centroids, codebooks)`` exactly like
    :func:`ivfpq_build`."""
    import json
    import os

    sidecar = os.path.join(index_path, "quantizers.json")
    vdir = os.path.join(index_path, "codes")
    if not os.path.exists(sidecar):
        encoded, centroids, books = ivfpq_build(
            emb, n_centroids, m, k, id_col, vec_col, seed, max_iter,
            sample_rows)
        encoded.write.mode("overwrite").partitionBy("cell").parquet(vdir)
        os.makedirs(index_path, exist_ok=True)
        tmp = os.path.join(index_path, ".quantizers.tmp")
        with open(tmp, "w") as fh:
            json.dump({"centroids": centroids, "codebooks": books}, fh)
        os.replace(tmp, sidecar)  # atomic publish
    with open(sidecar) as fh:
        q = json.load(fh)
    centroids = [(int(c), [float(x) for x in v]) for c, v in q["centroids"]]
    books = [(int(j), [[float(x) for x in c] for c in b])
             for j, b in q["codebooks"]]
    return spark.read.parquet(vdir), centroids, books


def hard_negatives(
    emb: DataFrame,
    anchors: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
    query_label_col: str = "query_label",
    label_col: str = "label",
) -> DataFrame:
    """Hard-negative mining for contrastive training (the in-batch-
    negatives upgrade): per anchor, the ``k`` candidates MOST similar by
    cosine whose label differs — the near-miss examples that actually
    move an embedding model, vs random negatives that are trivially
    far. Same scale shape as :func:`cosine_topk_brute`: anchors
    broadcast, candidates never shuffle, per-anchor top-k heads via
    WindowGroupLimit; the label-mismatch predicate filters map-side
    BEFORE scoring. Ties break by candidate id."""
    from pyspark.sql import Window

    j = emb.withColumn("_nc", norm_expr(F.col(vec_col))).crossJoin(
        F.broadcast(anchors.withColumn("_nq", norm_expr(F.col(query_vec_col))))
    ).filter(F.col(label_col) != F.col(query_label_col))
    scored = j.select(
        F.col(query_id_col),
        F.col(id_col),
        F.col(label_col),
        (dot_expr(F.col(vec_col), F.col(query_vec_col))
         / (F.col("_nc") * F.col("_nq"))).alias("cosine"),
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("cosine").desc(), F.col(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= k)
        .select(query_id_col, id_col, label_col, "cosine", "rank")
    )


def retrieval_eval(
    results: DataFrame,
    qrels: DataFrame,
    k: int = 10,
    query_col: str = "query_id",
    doc_col: str = "doc_id",
    rank_col: str = "rank",
) -> DataFrame:
    """Per-query IR metrics against a relevance table (TREC qrels
    shape): reciprocal rank of the first relevant hit (0.0 when none
    retrieved), hits@k, recall@k, and binary nDCG@k — the eval tail
    for the BM25 / ANN / RRF retrieval stack. Every query in ``qrels``
    appears in the output, including ones the system returned nothing
    for (the failure you most need to see).

    Engine parity: ranks and hit counts are exact integers;
    ``rr = 1/first_rel_rank`` and ``recall = hits/n_relevant`` are each
    one correctly-rounded double division. nDCG sums ``1/log2(rank+1)``
    over the relevant hit ranks in SORTED fold order (partitioning
    can't reorder the addition) and is rounded to 10 dp — log2 is the
    one libm boundary, the drift_psi precedent (engines differ in the
    last ulps; 1e-10 is far above the accumulated difference).

    Ranks are STRICTIFIED before scoring: after the (query, doc) dedup
    the list is re-ranked by ``row_number() over (rank, doc)`` per
    query, so metrics are positions in the deduplicated,
    deterministically tie-broken ranking (the trec_eval convention).
    Without this, tied rank values across distinct relevant docs each
    contribute a DCG term while IDCG stays capped and nDCG can exceed
    1.0. Strict gap-free input ranks pass through unchanged.

    Scale shape: one equi-join of results to the (deduplicated) qrels
    on (query, doc), one window + groupBy at the SAME query grain (the
    exchange is reused); no collect."""
    from pyspark.sql import Window

    q, d, r = query_col, doc_col, rank_col
    rel = qrels.select(q, d).distinct().withColumn("_rel", F.lit(1))
    # defensive (query, doc) dedup keeping the best rank: a duplicated
    # result row must not double-count a hit (it would push nDCG past
    # 1.0 — each dup adds a DCG term while IDCG stays capped)
    strict = Window.partitionBy(q).orderBy(F.col(r), F.col(d))
    uniq = (
        results.select(q, d, r).groupBy(q, d).agg(F.min(r).alias(r))
        .withColumn(r, F.row_number().over(strict).cast("long"))
    )
    joined = uniq.join(rel, [q, d], "left")
    per_q = joined.groupBy(q).agg(
        F.count(F.lit(1)).cast("long").alias("n_returned"),
        F.min(F.when(F.col("_rel") == 1, F.col(r))).alias("first_rel_rank"),
        F.sort_array(F.collect_list(
            F.when((F.col("_rel") == 1) & (F.col(r) <= k), F.col(r))
        )).alias("_hit_ranks"),
    )
    n_rel = qrels.groupBy(q).agg(
        F.countDistinct(d).cast("long").alias("n_relevant"))
    out = n_rel.join(per_q, q, "left")

    def _dcg(arr):
        return F.aggregate(
            arr, F.lit(0.0),
            lambda acc, x: acc + F.lit(1.0)
            / F.log2(x.cast("double") + F.lit(1.0)))

    hit_ranks = F.coalesce("_hit_ranks", F.array().cast("array<long>"))
    dcg = _dcg(hit_ranks)
    ideal = F.sequence(F.lit(1).cast("long"),
                       F.least(F.col("n_relevant"), F.lit(k).cast("long")))
    idcg = _dcg(ideal)
    return out.select(
        q, "n_relevant",
        F.coalesce("n_returned", F.lit(0)).alias("n_returned"),
        "first_rel_rank",
        F.when(F.col("first_rel_rank").isNotNull(),
               F.lit(1.0) / F.col("first_rel_rank").cast("double"))
        .otherwise(F.lit(0.0)).alias("rr"),
        F.size(hit_ranks).cast("long").alias(f"hits_at_{k}"),
        (F.size(hit_ranks).cast("double")
         / F.col("n_relevant").cast("double")).alias(f"recall_at_{k}"),
        F.round(dcg / idcg, 10).alias(f"ndcg_at_{k}"),
    )
