"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard,
embedding-cosine near-dup.

Scale design (the point of each strategy at 100 TB):

- exact: one hash-shuffle on the digest — the cheapest, always first.
- n-gram Jaccard with an inverted-index candidate step: only pairs sharing
  at least one shingle are compared; the shingle join is the classic
  document-pair inverted index. Hot shingles are capped (stop-shingle
  removal) so no reducer sees a quadratic bucket.
- MinHash+LSH: signature = K min-hashes (one shuffle), banding turns the
  quadratic pair search into equality buckets; only bucket-mates are
  verified. This is the strategy that survives 10^9 documents.
- SimHash: 64-bit signature, near-dup = small Hamming distance; the
  pigeonhole band trick (split into band chunks, equality-join on chunks)
  finds all pairs within the radius without a cross join.
- embedding cosine: blocked pairwise within a blocking key (or LSH bucket)
  — brute force only inside blocks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .text import normalize_text, tokens

# --------------------------------------------------------------------------
# Exact / fingerprint dedup
# --------------------------------------------------------------------------


def text_digest(text, normalized: bool = True):
    """The canonical text fingerprint column every exact-dedup path keys on.
    ONE definition on purpose: the streaming index's digest-prefix
    partition pruning only works if the probe side computes bit-identical
    digests to the indexed side."""
    return F.md5(normalize_text(text)) if normalized else F.md5(text)


def exact_duplicates(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
    normalized: bool = True, with_counts: bool = False,
) -> DataFrame:
    """Map each document to its canonical twin (min id per digest).
    Returns (id, digest, canonical_id, is_canonical[, n_copies]) — one
    partial-aggregated shuffle on the digest, then a join back (both sides
    hash-partitioned on digest, so the join reuses the exchange)."""
    digest = text_digest(F.col(text_col), normalized)
    d = df.select(F.col(id_col), digest.alias("digest"))
    # window over the digest, not groupBy+join-back: one scan of the input
    # and one shuffle instead of two scans, a shuffle, and a join
    w = Window.partitionBy("digest")
    d = d.withColumn("canonical_id", F.min(id_col).over(w))
    if with_counts:
        d = d.withColumn("n_copies", F.count("*").over(w))
    cols = [
        id_col, "digest", "canonical_id",
        (F.col(id_col) == F.col("canonical_id")).alias("is_canonical"),
    ]
    if with_counts:
        cols.append("n_copies")
    return d.select(*cols)


def dedup_exact(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Keep one row per exact (normalized) text."""
    keep = exact_duplicates(df, text_col, id_col).filter("is_canonical").select(id_col)
    return df.join(keep, id_col, "left_semi")


# --------------------------------------------------------------------------
# Shingling + n-gram Jaccard
# --------------------------------------------------------------------------


def shingles(
    df: DataFrame, n: int = 3, text_col: str = "text", id_col: str = "doc_id",
    hashed: bool = False,
) -> DataFrame:
    """Distinct word n-gram shingles per document: (id, shingle).

    ``hashed=True`` replaces the gram string with a hash — set semantics
    are preserved (collisions are ~2^-64 per pair; tokens cannot contain
    spaces so string grams are bijective with token tuples) while the
    distinct/join/min-hash stages downstream shuffle 8-byte longs instead
    of strings. At 10^9 docs that's the difference between shuffling
    terabytes of text and shuffling the hash column.

    The hashed path never builds gram strings at all: each token is hashed
    once, then each n-gram hash is folded from the n token hashes via
    ``zip_with`` over shifted slices — measured 7x faster than the
    slice+concat construction (string slicing was the dominant cost of the
    whole MinHash pipeline) with identical per-document distinct counts."""
    tok = tokens(F.col(text_col))
    if hashed:
        # whitespace-only docs produced one "" gram in the string path and
        # were filtered; here they are dropped before the explode
        d2 = (
            df.filter(F.trim(F.col(text_col)) != "")
            .withColumn("_th", F.transform(tok, lambda t: F.xxhash64(t)))
        )
        thc, size = F.col("_th"), F.size(F.col("_th"))
        cur = thc
        for j in range(1, n):
            # element i of cur after step j = hash of tokens i..i+j
            cur = F.zip_with(cur, F.slice(thc, j + 1, size),
                             lambda a, b: F.xxhash64(a, b))
        grams = F.slice(cur, 1, F.greatest(size - n + 1, F.lit(1)))
        # per-document dedup happens in place (array_distinct) — the rows
        # are unique by construction afterwards, so no global .distinct()
        # shuffle is needed at all
        return d2.select(
            F.col(id_col), F.explode(F.array_distinct(grams)).alias("shingle")
        )
    # let-bind the token array through a single-element-array transform so
    # the split() evaluates once per row, not once per gram element (the
    # nested-HOF re-evaluation trap — see text.winnowing_fingerprints)
    grams = F.element_at(
        F.transform(
            F.array(tok),
            lambda t: F.transform(
                F.sequence(F.lit(0), F.greatest(F.size(t) - n, F.lit(0))),
                lambda i: F.concat_ws(" ", F.slice(t, i + 1, n)),
            ),
        ),
        1,
    )
    return (
        df.select(F.col(id_col),
                  F.explode(F.array_distinct(grams)).alias("shingle"))
        .filter(F.col("shingle") != "")
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    n: int = 3,
    threshold: float = 0.5,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_shingle_freq: int = 1000,
) -> DataFrame:
    """All pairs with shingle-set Jaccard >= threshold, via an inverted
    shingle index (candidate pairs must share >=1 shingle). Shingles in
    more than ``max_shingle_freq`` docs are dropped as stop-shingles so a
    single hot shingle can't create a quadratic bucket at scale; a pair
    sharing ONLY stop-shingles is (by construction) far below any useful
    threshold anyway."""
    # windows instead of agg+join-back: set sizes and doc frequencies are
    # annotated onto the shingle rows in place (the n_sh window runs BEFORE
    # the stop-shingle filter, so Jaccard denominators stay uncapped), and
    # the pair aggregation folds them in with first() — zero post-agg
    # joins, and the shingle-hash window leaves both self-join sides
    # already partitioned on the join key
    sh = shingles(df, n, text_col, id_col, hashed=True)
    both = (
        sh.withColumn("n_sh", F.count("*").over(Window.partitionBy(id_col)))
        .withColumn("df_", F.count("*").over(Window.partitionBy("shingle")))
        .filter(F.col("df_") <= max_shingle_freq)
    )
    a = both.select(F.col(id_col).alias("a"), "shingle", F.col("n_sh").alias("na"))
    b = both.select(F.col(id_col).alias("b"), "shingle", F.col("n_sh").alias("nb"))
    inter = (
        a.join(b, "shingle")
        .filter(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count("*").alias("n_common"),
             F.first("na").alias("na"), F.first("nb").alias("nb"))
    )
    return (
        inter.select(
            "a",
            "b",
            (F.col("n_common") / (F.col("na") + F.col("nb") - F.col("n_common")))
            .alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


def containment_pairs(
    df: DataFrame,
    n: int = 3,
    threshold: float = 0.8,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_shingle_freq: int = 1000,
) -> DataFrame:
    """Asymmetric shingle containment — pairs where one document's
    shingle set is largely a SUBSET of another's: ``C(A,B) = |A∩B|/|A|``.
    Jaccard misses partial copies (a paragraph quoted inside a much
    longer page has tiny Jaccard but containment ~1.0); containment is
    the partial-copy / quotation detector a training corpus runs next to
    symmetric near-dup (cf. Broder's resemblance-vs-containment split).

    Output: ``(a, b, cont_a_in_b, cont_b_in_a, n_common)`` for pairs
    where EITHER direction >= ``threshold``, ``a < b``.

    Scale shape: same capped inverted shingle index as
    :func:`ngram_jaccard_pairs` — candidates must share a live shingle
    (stop-shingles over ``max_shingle_freq`` docs leave the index, set
    sizes stay uncapped), one equi-shuffle on the shingle hash, zero
    post-agg joins.
    """
    sh = shingles(df, n, text_col, id_col, hashed=True)
    both = (
        sh.withColumn("n_sh", F.count("*").over(Window.partitionBy(id_col)))
        .withColumn("df_", F.count("*").over(Window.partitionBy("shingle")))
        .filter(F.col("df_") <= max_shingle_freq)
    )
    a = both.select(F.col(id_col).alias("a"), "shingle", F.col("n_sh").alias("na"))
    b = both.select(F.col(id_col).alias("b"), "shingle", F.col("n_sh").alias("nb"))
    inter = (
        a.join(b, "shingle")
        .filter(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count("*").alias("n_common"),
             F.first("na").alias("na"), F.first("nb").alias("nb"))
    )
    out = inter.select(
        "a", "b",
        (F.col("n_common") / F.col("na")).alias("cont_a_in_b"),
        (F.col("n_common") / F.col("nb")).alias("cont_b_in_a"),
        "n_common",
    )
    return out.filter(
        (F.col("cont_a_in_b") >= threshold) | (F.col("cont_b_in_a") >= threshold)
    )


# --------------------------------------------------------------------------
# MinHash + LSH
# --------------------------------------------------------------------------


def minhash_signatures(
    df: DataFrame,
    num_hashes: int = 32,
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingles_df: DataFrame | None = None,
) -> DataFrame:
    """K min-hash values per document: one explode + one groupBy (single
    shuffle). Hash family = xxhash64(shingle, seed_k). Pass a precomputed
    (cached) ``shingles_df`` to share the explode with other stages."""
    sh = shingles_df if shingles_df is not None else shingles(
        df, n, text_col, id_col, hashed=True
    )
    aggs = [
        F.min(F.xxhash64("shingle", F.lit(k))).alias(f"mh_{k}") for k in range(num_hashes)
    ]
    return sh.groupBy(id_col).agg(*aggs)


def _band_rows(signatures: DataFrame, bands: int, id_col: str) -> DataFrame:
    """(id, band, sig) bucket membership from a minhash signature frame.
    The ONE place the banding layout (band count, per-band hash of the
    mh columns) is defined — both the one-shot LSH and the incremental
    index probe must produce bit-identical bucket keys or near-dups are
    silently missed."""
    mh_cols = [c for c in signatures.columns if c.startswith("mh_")]
    rows_per_band = len(mh_cols) // bands
    band_exprs = [
        F.struct(
            F.lit(bi).alias("band"),
            F.xxhash64(*[F.col(mh_cols[bi * rows_per_band + r])
                         for r in range(rows_per_band)]).alias("sig"),
        )
        for bi in range(bands)
    ]
    return signatures.select(
        F.col(id_col), F.explode(F.array(*band_exprs)).alias("bk")
    ).select(id_col, F.col("bk.band").alias("band"), F.col("bk.sig").alias("sig"))


def lsh_candidate_pairs(
    signatures: DataFrame, bands: int = 8, id_col: str = "doc_id"
) -> DataFrame:
    """Band the signature: docs agreeing on ALL rows of any band become a
    candidate pair. Equality buckets instead of pairwise comparison."""
    banded = _band_rows(signatures, bands, id_col)
    a = banded.select(F.col(id_col).alias("a"), "band", "sig")
    b = banded.select(F.col(id_col).alias("b"), "band", "sig")
    return (
        a.join(b, ["band", "sig"])
        .filter(F.col("a") < F.col("b"))
        .select("a", "b")
        .distinct()
    )


def minhash_dedup_pairs(
    df: DataFrame,
    num_hashes: int = 32,
    bands: int = 8,
    n: int = 3,
    threshold: float = 0.5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Full MinHash-LSH pipeline: signatures → band buckets → candidate
    pairs → exact Jaccard verification on the candidates only. The shingle
    explode is computed once and cached — signatures, sizes, and both sides
    of the verification join reuse it."""
    sh = shingles(df, n, text_col, id_col, hashed=True).cache()
    sigs = minhash_signatures(df, num_hashes, n, text_col, id_col, shingles_df=sh)
    cands = lsh_candidate_pairs(sigs, bands, id_col)
    sizes = sh.groupBy(id_col).agg(F.count("*").alias("n_shingles"))
    sa = sh.select(F.col(id_col).alias("a"), "shingle")
    sb = sh.select(F.col(id_col).alias("b"), "shingle")
    inter = (
        cands.join(sa, "a")
        .join(sb, ["b", "shingle"])
        .groupBy("a", "b")
        .agg(F.count("*").alias("n_common"))
    )
    na = sizes.select(F.col(id_col).alias("a"), F.col("n_shingles").alias("na"))
    nb = sizes.select(F.col(id_col).alias("b"), F.col("n_shingles").alias("nb"))
    return (
        inter.join(na, "a")
        .join(nb, "b")
        .select(
            "a", "b",
            (F.col("n_common") / (F.col("na") + F.col("nb") - F.col("n_common"))).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


# --------------------------------------------------------------------------
# SimHash
# --------------------------------------------------------------------------


_SIMHASH_FOLD = """
aggregate(
  transform(_toks, t -> xxhash64(t)),
  array_repeat(0L, 64),
  (acc, h) -> zip_with(
    acc,
    sequence(0, 63),
    (a, i) -> a + (shiftright(h, i) & 1L) * 2L - 1L),
  acc -> aggregate(
    zip_with(acc, sequence(0, 63), (c, i) -> IF(c > 0, shiftleft(1L, i), 0L)),
    0L, (x, v) -> x | v))
"""


def simhash64(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """64-bit SimHash over word tokens: per bit, majority vote of token
    hashes, folded over the token array as a single MAP-ONLY expression —
    zero shuffle, zero row fan-out. The alternative (explode tokens +
    64-column groupBy) moves docs×tokens rows through an exchange; this
    version's only cost is codegen'd array arithmetic per document, so the
    signature stage scales embarrassingly at any data size. Documents with
    no tokens get signature 0."""
    return (
        df.withColumn("_toks", tokens(F.col(text_col)))
        .select(F.col(id_col), F.expr(_SIMHASH_FOLD).alias("simhash"))
    )


def simhash_near_pairs(
    sig_df: DataFrame, max_hamming: int = 3, id_col: str = "doc_id", chunks: int = 4
) -> DataFrame:
    """All pairs with Hamming(simhash) <= max_hamming. Pigeonhole: split
    the 64-bit signature into ``chunks`` chunks; any pair within radius
    ``chunks-1`` agrees exactly on >=1 chunk → equality-join per chunk,
    then verify with bit_count(xor). Requires max_hamming < chunks."""
    assert max_hamming < chunks, "pigeonhole needs more chunks than the radius"
    # both sides of the chunk self-join read sig_df — cache so the (more
    # expensive) signature stage computes once, not per join side
    sig_df = sig_df.cache()
    width = 64 // chunks
    mask = (1 << width) - 1
    chunk_exprs = [
        F.struct(
            F.lit(ci).alias("chunk"),
            F.shiftright(F.col("simhash"), ci * width).bitwiseAND(F.lit(mask)).alias("ck"),
        )
        for ci in range(chunks)
    ]
    chunked = sig_df.select(
        F.col(id_col), F.col("simhash"), F.explode(F.array(*chunk_exprs)).alias("c")
    ).select(id_col, "simhash", F.col("c.chunk").alias("chunk"), F.col("c.ck").alias("ck"))
    a = chunked.select(F.col(id_col).alias("a"), F.col("simhash").alias("sig_a"), "chunk", "ck")
    b = chunked.select(F.col(id_col).alias("b"), F.col("simhash").alias("sig_b"), "chunk", "ck")
    pairs = (
        a.join(b, ["chunk", "ck"])
        .filter(F.col("a") < F.col("b"))
        .select("a", "b", "sig_a", "sig_b")
        .distinct()
    )
    hamming = F.bit_count(F.col("sig_a").bitwiseXOR(F.col("sig_b")))
    return pairs.select("a", "b", hamming.alias("hamming")).filter(
        F.col("hamming") <= max_hamming
    )


# --------------------------------------------------------------------------
# Embedding cosine near-dup
# --------------------------------------------------------------------------


def embedding_near_duplicates(
    emb: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    block_col: str | None = None,
    allow_full_cross_join: bool = False,
) -> DataFrame:
    """Pairs with cosine similarity >= threshold. Pairwise only within
    ``block_col`` blocks (at scale: an LSH bucket or cluster assignment —
    never unblocked). Cosine computed as a sequential double fold so the
    value is deterministic.

    Without a block column the pair space is O(N^2) — that is a deliberate
    small-data/debug mode and must be requested explicitly with
    ``allow_full_cross_join=True``; silently degrading to a cross join at
    10^9 rows is exactly the failure mode blocking exists to prevent
    (use :func:`~rdw_spark.operators.similarity.srp_bucket` or an IVF cell
    as the block)."""
    from .similarity import dot_expr, norm_expr

    if block_col is None and not allow_full_cross_join:
        raise ValueError(
            "embedding_near_duplicates without block_col is an O(N^2) cross "
            "join; pass a blocking column (SRP bucket, IVF cell, label) or "
            "set allow_full_cross_join=True for small-data use"
        )

    cols = [F.col(id_col), F.col(vec_col)] + ([F.col(block_col)] if block_col else [])
    # norms are per-row: compute them once before the self-join so each
    # pair evaluates one array fold (the dot), not three.
    # The probe side is spread to the session's parallelism first: block
    # joins broadcast the build side, so the pair stream and its per-pair
    # dot-product folds inherit the PROBE side's partitioning — a narrow
    # (single-row-group) input would otherwise run every fold serially in
    # one task (guide §6 parallelism floor; measured 6.7s -> sub-second
    # at sf0.1). Round-robin keeps the multiset identical; at real scale
    # the scan already has >= parallelism partitions and this no-ops.
    sc = emb.sparkSession.sparkContext
    if emb.rdd.getNumPartitions() < sc.defaultParallelism:
        emb = emb.repartition(sc.defaultParallelism)
    e = emb.select(*cols, norm_expr(F.col(vec_col)).alias("_nrm"))
    a = e.select(*[F.col(c).alias(f"{c}_a") for c in e.columns])
    b = e.select(*[F.col(c).alias(f"{c}_b") for c in e.columns])
    cond = [F.col(f"{id_col}_a") < F.col(f"{id_col}_b")]
    if block_col:
        cond.append(F.col(f"{block_col}_a") == F.col(f"{block_col}_b"))
    pairs = a.join(b, cond[1] if block_col else F.lit(True), "inner").filter(cond[0])
    cos = dot_expr(F.col(f"{vec_col}_a"), F.col(f"{vec_col}_b")) / (
        F.col("_nrm_a") * F.col("_nrm_b")
    )
    return pairs.select(
        F.col(f"{id_col}_a").alias("a"),
        F.col(f"{id_col}_b").alias("b"),
        cos.alias("cosine"),
    ).filter(F.col("cosine") >= threshold)


# --------------------------------------------------------------------------
# Cluster resolution: pairs -> connected components -> deduped corpus
# --------------------------------------------------------------------------


def _ann_min(df: DataFrame, skew_safe: bool) -> DataFrame:
    """Annotate each (u, v) row with m = min(v) over u.

    Default: a window — one shuffle, no join. ``skew_safe``: partial-agg
    groupBy + join back. The window sorts a node's whole neighborhood in
    ONE task, which a super-node (a boilerplate near-dup shared by 10^7
    docs) turns into a straggler AQE cannot split; the groupBy variant
    combines map-side (each mapper ships one partial min per hot key) and
    leaves the join's skew to AQE's skew-join splitting — one extra
    shuffle per round, bought back as worst-case robustness."""
    if not skew_safe:
        return df.withColumn("m", F.min("v").over(Window.partitionBy("u")))
    mins = df.groupBy("u").agg(F.min("v").alias("m"))
    return df.join(mins, "u")


def _large_star(edges: DataFrame, skew_safe: bool = False) -> DataFrame:
    """Attach every neighbor LARGER than u to u's minimum neighborhood
    label: emit (v, m) for v in N(u), v > u, m = min(N(u) + {u}).
    Min via window/groupBy, never collect_set — a hot node's neighborhood
    stays row-distributed instead of materializing as one giant array."""
    und = edges.union(edges.select(F.col("v").alias("u"), F.col("u").alias("v")))
    # no distinct here: duplicate edges don't change any min, and the
    # round's closing small-star dedups — saves one shuffle per round
    return (
        _ann_min(und, skew_safe)
        .withColumn("m", F.least(F.col("u"), F.col("m")))
        .filter(F.col("v") > F.col("u"))
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
    )


def _small_star(edges: DataFrame, dedup: bool = True,
                skew_safe: bool = False) -> DataFrame:
    """Attach every neighbor <= u (and u itself) to the minimum label.
    On edges oriented large->small: emit (v, m) for v in N(u), v != m,
    plus the center's own (u, m), m = min(N(u)). ``dedup=False`` skips the
    closing distinct when the caller dedups right after anyway."""
    oriented = edges.select(
        F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
    ).filter(F.col("u") != F.col("v"))
    ann = _ann_min(oriented, skew_safe)
    leaves = ann.filter(F.col("v") != F.col("m")).select(
        F.col("v").alias("u"), F.col("m").alias("v")
    )
    centers = ann.select(F.col("u"), F.col("m").alias("v")).distinct()
    out = leaves.union(centers)
    return out.distinct() if dedup else out


def connected_components(
    pairs: DataFrame,
    a_col: str = "a",
    b_col: str = "b",
    max_iterations: int = 25,
    skew_safe: bool = False,
    pointer_jump: bool = True,
) -> DataFrame:
    """Resolve similarity PAIRS into clusters: (node, cluster_id) for every
    node that appears in ``pairs``, where cluster_id is the minimum node id
    of its connected component.

    This is the step after candidate-pair generation that an actual corpus
    dedup needs — MinHash/SimHash/Jaccard emit PAIRS, but "keep one copy"
    requires the transitive closure (A~B, B~C => drop two of {A,B,C}).

    Algorithm: alternating large-star / small-star (Kiveris et al.,
    "Connected Components in MapReduce and Beyond", SoCC 2014) plus a
    pointer-jump (path-halving) step per round — converges in O(log^2 n)
    rounds independent of component diameter, so a 10^9-node graph with a
    long chain still resolves in ~25 rounds where naive label propagation
    would need one round per hop. Lineage is cut each round
    (localCheckpoint) so the plan doesn't grow with iterations;
    convergence is detected structurally (the round's output IS a star
    forest), not by re-deriving and comparing. ``skew_safe`` swaps the
    per-node window-min for a map-combined groupBy+join (see ``_ann_min``)
    when a super-node would straggle a window task.

    ``pointer_jump`` trades per-round cost against round count, with an
    IDENTICAL result either way (md5-verified over the sorted output on
    every measured input). The jump's self-join re-executes the round's
    un-materialized star output once per join side (the round checkpoint
    is lazy), so each jump round costs ~2x the star work plus a join —
    but it merges chains twice as fast. Measured at sf0.1 (r12):
    chain-shaped and near-dup inputs converge in half the rounds and run
    ~1.9x faster WITH the jump (the streaming per-micro-batch resolver
    regressed 205 -> 57 docs/s without it); the star-friendly bipartite
    wcc input converges in 2-3 rounds either way and runs up to 1.7x
    faster WITHOUT it (the doubled star recompute dominates at 587k
    edges). Default True — right for the chainy cluster graphs dedup
    actually produces; pass False for wide low-diameter graphs.
    """
    edges = (
        pairs.select(F.col(a_col).cast("long").alias("u"),
                     F.col(b_col).cast("long").alias("v"))
        .filter(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint(eager=True)
    )

    def _is_star_forest(e: DataFrame) -> bool:
        # converged ⟺ the edge relation is a star forest: every child has
        # exactly one parent and no parent is itself a child (stars always
        # point at the neighborhood min, so forest roots ARE component
        # minima). Checking the structure directly detects convergence on
        # the round that PRODUCES the forest — the signature-compare
        # alternative burns one extra full round re-deriving it.
        viol = (
            e.select(F.col("u").alias("n"), F.col("v").alias("p"))
            .union(e.select(F.col("v").alias("n"), F.lit(None).alias("p")))
            .groupBy("n")
            .agg(
                F.count_distinct("p").alias("np"),
                F.max(F.col("p").isNull().cast("int")).alias("is_parent"),
            )
            .filter(
                (F.col("np") > 1)
                | ((F.col("np") >= 1) & (F.col("is_parent") == 1))
            )
        )
        return viol.limit(1).count() == 0

    for _ in range(max_iterations):
        # round = large-star then small-star (the Kiveris alternation),
        # optionally followed by the pointer jump (see docstring for the
        # measured trade), closed by one distinct
        edges = _small_star(_large_star(edges, skew_safe), dedup=False,
                            skew_safe=skew_safe)
        if pointer_jump:
            # remap each parent to ITS parent before the next round —
            # path-halving on top of the star alternation
            par = edges.select(F.col("u").alias("_j"), F.col("v").alias("_jv"))
            edges = (
                edges.join(par, edges["v"] == par["_j"], "left")
                .select("u",
                        F.least(F.coalesce("_jv", "v"),
                                F.col("v")).alias("v"))
            )
        # lazy checkpoint: the convergence check below is the round's
        # single action and materializes it as a side effect — eager=True
        # here cost a second job per round for the same work (two driver
        # round-trips per round adds up at 3-5 rounds x job latency;
        # identical plan and bytes at scale)
        edges = edges.distinct().localCheckpoint(eager=False)
        if _is_star_forest(edges):
            break

    # post-convergence the edge set is a star forest: (member, root) with
    # root = component minimum; roots themselves get a self-label
    members = edges.select(F.col("u").alias("node"), F.col("v").alias("cluster_id"))
    roots = edges.select(F.col("v").alias("node")).distinct().withColumn(
        "cluster_id", F.col("node")
    )
    return members.union(roots).distinct()


def dedup_corpus(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    a_col: str = "a",
    b_col: str = "b",
) -> DataFrame:
    """The end-to-end 'keep one copy' resolve: documents minus every
    non-canonical member of a near-dup cluster. Canonical = minimum id per
    connected component of ``pairs``; documents in no pair survive
    untouched. The drop set is (cluster members) minus (cluster minima) —
    broadcast-joined away when small, hash anti-join otherwise (left to
    AQE by size)."""
    cc = connected_components(pairs, a_col, b_col)
    drop = cc.filter(F.col("node") != F.col("cluster_id")).select(
        F.col("node").alias(id_col)
    )
    return df.join(drop, id_col, "left_anti")


# --------------------------------------------------------------------------
# Incremental dedup: new batches against a maintained index
# --------------------------------------------------------------------------


def build_fingerprint_index(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(fingerprint, canonical_id): one row per distinct normalized text —
    the state a streaming/batched corpus pipeline carries between batches.
    At scale this lives as a partition-store table keyed by fingerprint
    prefix, so the per-batch join below prunes to touched buckets."""
    return (
        exact_duplicates(df, text_col, id_col)
        .filter("is_canonical")
        .select("digest", F.col(id_col).alias("canonical_id"))
    )


def incremental_exact_dedup(
    new_docs: DataFrame,
    index: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> dict[str, DataFrame]:
    """Dedup a NEW batch against an existing corpus WITHOUT rescanning the
    corpus: O(batch) hashing + one equality join against the index.

    Returns:
      - ``unique``: batch rows that survive (not a dup of the corpus, and
        one canonical per in-batch duplicate group)
      - ``index_delta``: rows to append to the index (the state update —
        an append, never a rewrite)
      - ``dup_map``: (doc_id, canonical_id) for every dropped batch row,
        whether its twin was in the corpus or in the same batch

    Incremental-equals-batch: applying this per batch and unioning
    ``unique`` yields exactly the canonicals a one-shot dedup of the
    concatenated corpus would keep (given ids assigned in batch order) —
    property-tested in tests/test_dedup_similarity.py."""
    fp = exact_duplicates(new_docs, text_col, id_col, with_counts=False)
    # in-batch canonical per fingerprint, then resolve against the corpus
    batch_canon = fp.filter("is_canonical").select(F.col(id_col), "digest")
    hit = batch_canon.join(
        index.withColumnRenamed("canonical_id", "_corpus_canon"),
        "digest", "left",
    ).select(id_col, "digest", "_corpus_canon")
    fresh = hit.filter(F.col("_corpus_canon").isNull())
    unique = new_docs.join(fresh.select(id_col), id_col, "left_semi")
    index_delta = fresh.select("digest", F.col(id_col).alias("canonical_id"))
    # dropped rows: in-batch dups point at the batch canonical, which may
    # itself forward to a corpus canonical
    canon_resolution = hit.select(
        F.col(id_col).alias("_batch_canon"), "digest",
        F.coalesce("_corpus_canon", F.col(id_col)).alias("_final_canon"),
    )
    dup_map = (
        fp.join(canon_resolution, "digest")
        .filter(F.col(id_col) != F.col("_final_canon"))
        .select(id_col, F.col("_final_canon").alias("canonical_id"))
    )
    return {"unique": unique, "index_delta": index_delta, "dup_map": dup_map}


def build_band_index(
    df: DataFrame,
    num_hashes: int = 32,
    bands: int = 8,
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(band, sig, doc_id): the LSH bucket membership of the corpus — the
    near-dup analog of the fingerprint index. New batches probe it by
    equality join; appends maintain it. Bucket keys come from the same
    ``_band_rows`` the one-shot LSH uses, so probe buckets are
    bit-identical to corpus buckets by construction."""
    sigs = minhash_signatures(df, num_hashes, n, text_col, id_col)
    return _band_rows(sigs, bands, id_col).select("band", "sig", id_col)


def incremental_minhash_candidates(
    new_docs: DataFrame,
    band_index: DataFrame,
    num_hashes: int = 32,
    bands: int = 8,
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> dict[str, DataFrame]:
    """Near-dup candidates of a NEW batch against the indexed corpus plus
    within the batch itself — O(batch bands) probe work, no corpus scan.

    Returns ``candidates`` (a, b), a < b, every bucket-collision pair with
    at least one NEW member (new-vs-corpus in either id order, and
    new-vs-new), and ``index_delta`` band rows to append. Verification
    (exact Jaccard on candidates) stays the caller's step, as in
    ``minhash_dedup_pairs`` — at this stage only bucket-mates have been
    touched."""
    # cache: the batch's band rows feed the probe union, the join's right
    # side, AND the returned index_delta — without it the shingle explode
    # + signature groupBy shuffle would run three times
    new_bands = build_band_index(
        new_docs, num_hashes, bands, n, text_col, id_col
    ).cache()
    probe = band_index.select(
        "band", "sig", F.col(id_col).alias("x")
    ).union(new_bands.select("band", "sig", F.col(id_col).alias("x")))
    cands = (
        probe.join(new_bands.select("band", "sig", F.col(id_col).alias("y")),
                   ["band", "sig"])
        .select(F.least("x", "y").alias("a"), F.greatest("x", "y").alias("b"))
        .filter(F.col("a") < F.col("b"))
        .distinct()
    )
    return {"candidates": cands, "index_delta": new_bands}


# --------------------------------------------------------------------------
# Span-level exact substring dedup (duplicated token windows)
# --------------------------------------------------------------------------

def window_occurrences(
    df: DataFrame, n: int = 8, text_col: str = "text", id_col: str = "doc_id",
) -> DataFrame:
    """Every token n-gram window occurrence WITH its 0-based start
    position: (id, pos, window-hash). Unlike ``shingles`` this is
    positional and NON-distinct — the unit the span-dedup tier needs.

    Windows are 8-byte xxhash64 folds of the raw (whitespace-split)
    tokens, built with the same shifted-slice ``zip_with`` construction as
    the hashed shingles (no gram strings are ever materialized — the
    explode and the shuffles downstream move longs). Docs with fewer than
    ``n`` tokens yield no window rows."""
    tok = tokens(F.col(text_col))
    d2 = (
        df.filter(F.trim(F.col(text_col)) != "")
        .withColumn("_th", F.transform(tok, lambda t: F.xxhash64(t)))
        .filter(F.size("_th") >= n)
    )
    thc, size = F.col("_th"), F.size(F.col("_th"))
    cur = thc
    for j in range(1, n):
        cur = F.zip_with(cur, F.slice(thc, j + 1, size),
                         lambda a, b: F.xxhash64(a, b))
    grams = F.slice(cur, 1, size - n + 1)
    return d2.select(
        F.col(id_col), F.posexplode(grams).alias("pos", "w")
    )


def duplicated_spans(
    df: DataFrame, n: int = 8, text_col: str = "text", id_col: str = "doc_id",
    keep_first: bool = True, broadcast_stats: bool = True,
) -> DataFrame:
    """Start positions of duplicated n-token windows: (id, pos).

    The Spark-friendly form of exact substring dedup (Lee et al.,
    "Deduplicating Training Data Makes Language Models Better" removes
    duplicated >=50-token spans via suffix arrays; fixed-width token
    windows approximate the same semantics with one partial-agg shuffle
    instead of a global suffix sort). A window counts as duplicated when
    the SAME n tokens appear anywhere else in the corpus — another
    document or the same one. With ``keep_first`` the globally-first
    occurrence (min (id, pos)) is exempt, so one copy of every duplicated
    span survives; the rest are flagged for removal.

    Scale shape: window occurrences group by hash with map-side partial
    aggregation; the duplicated-window stats (count >= 2 plus the one kept
    occurrence) are a small fraction of the corpus and broadcast back
    against the occurrence stream (``broadcast_stats=False`` falls back to
    a shuffle join when the duplicated set itself is huge)."""
    occ = window_occurrences(df, n, text_col, id_col)
    stats = (
        occ.groupBy("w")
        .agg(F.count("*").alias("_cnt"),
             F.min(F.struct(F.col(id_col), F.col("pos"))).alias("_keep"))
        .filter(F.col("_cnt") >= 2)
        .select("w", "_keep")
    )
    if broadcast_stats:
        stats = F.broadcast(stats)
    flagged = occ.join(stats, "w")
    if keep_first:
        flagged = flagged.filter(
            ~((F.col(id_col) == F.col(f"_keep.{id_col}"))
              & (F.col("pos") == F.col("_keep.pos")))
        )
    return flagged.select(id_col, "pos")


def remove_duplicated_spans(
    df: DataFrame, n: int = 8, text_col: str = "text", id_col: str = "doc_id",
    keep_first: bool = True, broadcast_stats: bool = True,
) -> DataFrame:
    """Cut duplicated n-token spans OUT of the documents (keeping one
    global copy of each) instead of dropping whole documents — the
    substring-level companion to ``dedup_exact`` / MinHash doc-level
    dedup. Output = input columns plus ``n_tokens`` (pre-cut),
    ``n_tokens_dropped``, and ``clean_text`` (kept tokens re-joined with
    single spaces — reconstruction is whitespace-normalizing by design).

    A token is dropped when any flagged window covers it. The rebuild is
    one map-only pass: flagged starts collect per doc (tiny — only docs
    with duplicated spans have rows), then an indexed ``filter`` over the
    token array tests coverage with ``exists`` — no second explode, no
    per-token join."""
    spans = duplicated_spans(df, n, text_col, id_col, keep_first,
                             broadcast_stats)
    starts = spans.groupBy(id_col).agg(
        F.collect_list("pos").alias("_starts"))
    tok = tokens(F.col(text_col))
    sarr = F.coalesce(F.col("_starts"), F.array().cast("array<int>"))
    kept = F.filter(
        tok,
        lambda t, i: ~F.exists(sarr, lambda s: (i >= s) & (i < s + n)),
    )
    return (
        df.join(starts, id_col, "left")
        .withColumn("n_tokens", F.size(tok))
        .withColumn("clean_text", F.array_join(kept, " "))
        .withColumn("n_tokens_dropped", F.col("n_tokens") - F.size(kept))
        .drop("_starts")
    )


def survivorship(
    df: DataFrame,
    cluster_col: str,
    rules: list,
    id_col: str = "doc_id",
) -> DataFrame:
    """Golden-record selection: after clustering (exact digests, CC over
    near-dup pairs, fuzzy-join components), pick ONE survivor per
    cluster by an ordered rule list instead of the min-id default —
    "keep the longest text, then the highest quality, then the newest".

    ``rules`` is ``[(direction, column)]`` with direction ``"max"`` or
    ``"min"``, applied lexicographically; ``id_col`` ascending is the
    final implicit tiebreak, so selection is total and deterministic.
    NULL rule values lose to non-NULL under ``max`` and win under
    ``min``'s absence — i.e. NULLs sort LAST for both directions (a
    record missing the field never beats one that has it).

    Returns ``df`` + ``is_survivor`` + ``survivor_id`` (every cluster
    member points at its golden record — the rewrite map for
    re-pointing references). One aggregate per cluster via
    ``max(struct(...))`` — partial-agg combines map-side, no window, no
    sort of the fact."""
    for d, _c in rules:
        if d not in ("max", "min"):
            raise ValueError(f"rule direction must be max|min, got {d!r}")

    def _descending_key(v, dtype):
        """An EXACTLY order-reversing key for ``min`` rules, per type.
        ``-v.cast("double")`` would silently NULL out strings/dates
        (turning the rule into a no-op) and lose precision on longs
        beyond 2^53 — so invert losslessly per type and REJECT types
        with no lossless inversion."""
        if isinstance(dtype, (T.ByteType, T.ShortType, T.IntegerType,
                              T.LongType)):
            # ~x = -x-1: a strictly order-reversing bijection over the
            # FULL int64 range (unlike -x, which overflows at MIN_VALUE)
            return F.bitwise_not(v.cast("long"))
        if isinstance(dtype, (T.FloatType, T.DoubleType)):
            return -v  # IEEE negation is exact
        if isinstance(dtype, T.DecimalType):
            return -v  # decimal negation is exact (widened by Spark)
        if isinstance(dtype, T.BooleanType):
            return F.bitwise_not(v.cast("long"))
        if isinstance(dtype, T.DateType):
            return F.bitwise_not(F.unix_date(v))
        if isinstance(dtype, T.TimestampType):
            return F.bitwise_not(F.unix_micros(v))
        raise ValueError(
            f"survivorship 'min' rule on {dtype.simpleString()} column has "
            "no lossless descending key; use 'max' or derive a numeric "
            "sort column first")

    schema = {f.name: f.dataType for f in df.schema.fields}

    def key_cols():
        cols = []
        for i, (d, c) in enumerate(rules):
            v = F.col(c)
            # two-part key per rule: non-NULL beats NULL in BOTH
            # directions, then the value (losslessly inverted for min)
            cols.append(v.isNotNull().cast("int").alias(f"_nn{i}"))
            cols.append((v if d == "max" else _descending_key(v, schema[c]))
                        .alias(f"_k{i}"))
        # unambiguous total order: LOWEST id wins the final tie, and
        # max(struct) picks the largest key — so negate the id
        cols.append((-F.col(id_col).cast("long")).alias("_tid"))
        cols.append(F.col(id_col).alias("_sid"))
        return cols

    best = df.groupBy(cluster_col).agg(
        F.max(F.struct(*key_cols())).alias("_best"))
    winners = best.select(
        cluster_col, F.col("_best._sid").alias("survivor_id"))
    return df.join(winners, cluster_col).withColumn(
        "is_survivor", F.col(id_col) == F.col("survivor_id"))
