"""Training-data pipeline catalog: dedup, similarity search, text
analysis, multimodal plumbing — over the documents/embeddings tables.

These extend the reference's surface (SURVEY.md §7 step 7): the operators
a 100 TB pre-training data pipeline needs, built on the same engine.
SQL-expressible ones carry DuckDB oracles; MinHash/SimHash/SRP-LSH use
engine hash functions with no DuckDB equivalent → rows-only check, with
pytest cross-checks against the exact (oracle-able) computations instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..io import load_table
from ..operators import dedup as D
from ..operators import multimodal as M
from ..operators import sampling as SA
from ..operators import similarity as S
from ..operators import text as X
from .registry import register


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "documents")


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "embeddings")


# --------------------------------------------------------------------------
# Dedup
# --------------------------------------------------------------------------

@register(
    "zz_dedup_fingerprint_canonical",
    oracle="""
    SELECT doc_id,
           md5(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'))) AS fingerprint,
           MIN(doc_id) OVER (PARTITION BY md5(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')))) AS canonical_id,
           doc_id = MIN(doc_id) OVER (PARTITION BY md5(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')))) AS is_canonical,
           CAST(COUNT(*) OVER (PARTITION BY md5(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')))) AS BIGINT) AS n_copies
    FROM documents
    """,
    survey="ext: exact + fingerprint dedup (hash-groupBy digest dedup per "
           "docs/API.md:263; normalize+digest canonical mapping with "
           "per-fingerprint copy counts — subsumes the former "
           "dedup_exact_summary entry so all oracle-bearing queries fit the "
           "driver's 50-row window)",
)
def dedup_fingerprint_canonical(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _docs(spark, sf_dir)
    out = D.exact_duplicates(d, normalized=True, with_counts=True)
    return out.select(
        "doc_id", F.col("digest").alias("fingerprint"), "canonical_id",
        "is_canonical", "n_copies",
    )


@register(
    "zz_dedup_survivorship",
    # survivor = argmax (has n_chars, n_chars, -doc_id) per fingerprint
    # cluster — a total deterministic order, so the golden-record map is
    # engine-exact
    oracle="""
    WITH d AS (
        SELECT doc_id, n_chars,
               md5(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'))) AS fp
        FROM documents
    ), w AS (
        SELECT doc_id, fp, n_chars,
               ROW_NUMBER() OVER (
                   PARTITION BY fp
                   ORDER BY (n_chars IS NOT NULL) DESC, n_chars DESC,
                            doc_id ASC) AS rn
        FROM d
    ), win AS (
        SELECT fp, doc_id AS survivor_id FROM w WHERE rn = 1
    )
    SELECT d.doc_id, d.fp AS cluster, win.survivor_id,
           d.doc_id = win.survivor_id AS is_survivor
    FROM d JOIN win ON d.fp = win.fp
    """,
    survey="ext: golden-record survivorship — after any clustering "
           "(digests, CC components, fuzzy-join groups) pick ONE "
           "survivor per cluster by an ordered max/min rule list with "
           "NULLs-lose semantics and id tiebreak; one max(struct) "
           "aggregate per cluster (partial-agg combines map-side, no "
           "window over the fact), every member mapped to its survivor "
           "for reference re-pointing. operators/dedup.py::survivorship",
)
def zz_dedup_survivorship_entry(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _docs(spark, sf_dir)
    fp = D.exact_duplicates(d, normalized=True).select("doc_id", "digest")
    base = d.select("doc_id", "n_chars").join(fp, "doc_id")
    out = D.survivorship(base, "digest", [("max", "n_chars")])
    return out.select(
        "doc_id", F.col("digest").alias("cluster"), "survivor_id",
        "is_survivor")


@register(
    "dedup_ngram_jaccard",
    oracle="""
    WITH toks AS (
        SELECT doc_id, string_split_regex(trim(text), '\\s+') AS l
        FROM documents
    ), sh AS (
        SELECT DISTINCT doc_id,
               unnest(list_transform(range(1, len(l) - 1),
                                     i -> l[i] || ' ' || l[i+1] || ' ' || l[i+2])) AS shingle
        FROM toks WHERE len(l) >= 3
    ), sizes AS (
        SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id
    ), live AS (
        -- stop-shingle cap: shingles in more than 1000 docs leave the
        -- inverted index (sizes stay uncapped), mirroring the operator
        SELECT shingle FROM sh GROUP BY shingle HAVING COUNT(*) <= 1000
    ), inter AS (
        SELECT a.doc_id AS a, b.doc_id AS b, COUNT(*) AS n_common
        FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        JOIN live l ON a.shingle = l.shingle
        GROUP BY a.doc_id, b.doc_id
    )
    SELECT a, b, CAST(n_common AS DOUBLE) / (sa.n + sb.n - n_common) AS jaccard
    FROM inter JOIN sizes sa ON inter.a = sa.doc_id JOIN sizes sb ON inter.b = sb.doc_id
    WHERE CAST(n_common AS DOUBLE) / (sa.n + sb.n - n_common) >= 0.1
    """,
    survey="ext: n-gram Jaccard dedup via inverted shingle index (exact-verify stage of MinHash-LSH)",
)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    # the oracle-checked entry runs the SAME capped scale path the operator
    # ships with (stop-shingles leave the index); the cap is expressed in
    # the DuckDB oracle too, so correctness covers the real plan
    d = _docs(spark, sf_dir).filter(F.size(X.tokens(F.col("text"))) >= 3)
    return D.ngram_jaccard_pairs(d, n=3, threshold=0.1, max_shingle_freq=1000)


@register(
    "zz_dedup_minhash_lsh",
    oracle=None,  # engine hash family (xxhash64) has no DuckDB twin; see tests/test_dedup.py recall check
    survey="ext: MinHash+LSH near-dup (shingle→minhash→band→bucket-join→exact verify)",
)
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _docs(spark, sf_dir).filter(F.size(X.tokens(F.col("text"))) >= 3)
    # 32 hashes / 8 bands: after the zip_with shingle rewrite the signature
    # aggs are no longer the bottleneck (32/8 and 16/4 measure within noise
    # at sf0.1), so keep the higher-recall banding — halving bands would
    # drop candidate recall at mid similarities (1-(1-s^4)^b) for no win
    return D.minhash_dedup_pairs(d, num_hashes=32, bands=8, n=3, threshold=0.3)


@register(
    "zz_dedup_simhash",
    oracle=None,  # xxhash64-based signature; verified structurally in tests
    survey="ext: SimHash near-dup (64-bit signature, pigeonhole banding, Hamming<=3)",
)
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..io import spread_scan

    # the interpreted 64-bit majority-vote fold (O(64·tokens) HOF ops per
    # doc) is heavy enough per row to clear the spread_scan boundary —
    # A/B 2.3 -> 0.9 s solo at sf0.1; no-op at real scale
    d = spread_scan(_docs(spark, sf_dir))
    sigs = D.simhash64(d)
    return D.simhash_near_pairs(sigs, max_hamming=3)


@register(
    "dedup_embedding_cosine",
    oracle="""
    SELECT a.vec_id AS a, b.vec_id AS b,
           list_dot_product(a.embedding::DOUBLE[], b.embedding::DOUBLE[])
           / (sqrt(list_dot_product(a.embedding::DOUBLE[], a.embedding::DOUBLE[]))
              * sqrt(list_dot_product(b.embedding::DOUBLE[], b.embedding::DOUBLE[]))) AS cosine
    FROM embeddings a JOIN embeddings b
      ON a.label = b.label AND a.vec_id < b.vec_id
    WHERE list_dot_product(a.embedding::DOUBLE[], b.embedding::DOUBLE[])
          / (sqrt(list_dot_product(a.embedding::DOUBLE[], a.embedding::DOUBLE[]))
             * sqrt(list_dot_product(b.embedding::DOUBLE[], b.embedding::DOUBLE[]))) >= 0.3
    """,
    survey="ext: embedding-cosine near-dup, blocked pairwise (block = label; at scale an LSH bucket)",
)
def dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _emb(spark, sf_dir)
    return D.embedding_near_duplicates(e, threshold=0.3, block_col="label")


@register(
    "zz_sim_quantized_cosine",
    oracle="""
    WITH s AS (
        SELECT vec_id, label, embedding::DOUBLE[] AS e,
               greatest(list_max(list_transform(embedding::DOUBLE[],
                                                x -> abs(x))) / 127.0,
                        1e-30) AS sc
        FROM embeddings
    ), q AS (
        SELECT vec_id, label, e,
               list_transform(e, x -> floor(x / sc + 0.5)) AS q8
        FROM s
    ), p AS (
        SELECT a.vec_id AS a, b.vec_id AS b,
               list_dot_product(a.q8, b.q8)
               / (sqrt(list_dot_product(a.q8, a.q8))
                  * sqrt(list_dot_product(b.q8, b.q8))) AS q_cosine,
               list_dot_product(a.e, b.e)
               / (sqrt(list_dot_product(a.e, a.e))
                  * sqrt(list_dot_product(b.e, b.e))) AS cosine
        FROM q a JOIN q b ON a.label = b.label AND a.vec_id < b.vec_id
    )
    SELECT a, b, q_cosine, abs(q_cosine - cosine) AS q_err
    FROM p WHERE cosine >= 0.3
    """,
    survey="ext: int8-quantized cosine scoring — symmetric per-vector "
           "max-abs quantization (map-only, 4x smaller ANN state), "
           "scored directly on the int arrays (cosine is "
           "scale-invariant); the entry also reports the per-pair error "
           "vs full precision, hash-verified against the same math in "
           "DuckDB",
)
def sim_quantized_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.similarity import dot_expr, quantize_embeddings

    # norms are per-ROW: compute both (quantized + full) once before the
    # self-join so each pair evaluates two array folds (the dots), not six
    q = quantize_embeddings(_emb(spark, sf_dir)).select(
        "vec_id", "label", "q8", "embedding",
        F.sqrt(dot_expr(F.col("q8"), F.col("q8"))).alias("_qn"),
        F.sqrt(dot_expr(F.col("embedding"), F.col("embedding"))).alias("_en"),
    )
    a = q.select(F.col("vec_id").alias("a"), "label",
                 F.col("q8").alias("_qa"), F.col("embedding").alias("_ea"),
                 F.col("_qn").alias("_qna"), F.col("_en").alias("_ena"))
    b = q.select(F.col("vec_id").alias("b"), "label",
                 F.col("q8").alias("_qb"), F.col("embedding").alias("_eb"),
                 F.col("_qn").alias("_qnb"), F.col("_en").alias("_enb"))
    qcos = dot_expr(F.col("_qa"), F.col("_qb")) / (F.col("_qna") * F.col("_qnb"))
    cos = dot_expr(F.col("_ea"), F.col("_eb")) / (F.col("_ena") * F.col("_enb"))
    return (
        a.join(b, "label")
        .filter(F.col("a") < F.col("b"))
        # stage the two dot folds into their OWN projection: inlining
        # them into q_err as well evaluates each interpreted
        # (CodegenFallback) O(dim) fold twice per pair — 4 folds instead
        # of 2 over ~200k pairs. CollapseProject keeps the stage (it
        # never duplicates non-cheap expressions referenced twice), so
        # each fold runs once; q_err is plain column arithmetic on the
        # staged results — bit-identical output.
        .select("a", "b", qcos.alias("q_cosine"), cos.alias("_c"))
        .select("a", "b", "q_cosine",
                F.abs(F.col("q_cosine") - F.col("_c")).alias("q_err"), "_c")
        .filter(F.col("_c") >= 0.3)
        .drop("_c")
    )


@register(
    "dedup_cluster_resolution",
    oracle="""
    WITH RECURSIVE pairs AS (
        SELECT CAST(a.vec_id AS BIGINT) AS a, CAST(b.vec_id AS BIGINT) AS b
        FROM embeddings a JOIN embeddings b
          ON a.label = b.label AND a.vec_id < b.vec_id
        WHERE list_dot_product(a.embedding::DOUBLE[], b.embedding::DOUBLE[])
              / (sqrt(list_dot_product(a.embedding::DOUBLE[], a.embedding::DOUBLE[]))
                 * sqrt(list_dot_product(b.embedding::DOUBLE[], b.embedding::DOUBLE[]))) >= 0.3
    ), edges AS (
        SELECT a AS u, b AS v FROM pairs UNION SELECT b, a FROM pairs
    ), reach(u, v) AS (
        SELECT u, v FROM edges
        UNION
        SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u WHERE e.v <> r.u
    )
    SELECT u AS node, LEAST(u, MIN(v)) AS cluster_id FROM reach GROUP BY u
    """,
    survey="ext: near-dup cluster resolution — similarity pairs -> connected "
           "components (alternating large-star/small-star, O(log^2 n) "
           "rounds) -> (node, min-id cluster label); the transitive-closure "
           "step every corpus dedup needs after pair generation",
)
def dedup_cluster_resolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _emb(spark, sf_dir)
    pairs = D.embedding_near_duplicates(e, threshold=0.3, block_col="label")
    return D.connected_components(pairs)


@register(
    "dedup_corpus_resolve",
    oracle="""
    WITH RECURSIVE toks AS (
        SELECT doc_id, string_split_regex(trim(text), '\\s+') AS l
        FROM documents
    ), sh AS (
        SELECT DISTINCT doc_id,
               unnest(list_transform(range(1, len(l) - 1),
                                     i -> l[i] || ' ' || l[i+1] || ' ' || l[i+2])) AS shingle
        FROM toks WHERE len(l) >= 3
    ), sizes AS (
        SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id
    ), live AS (
        SELECT shingle FROM sh GROUP BY shingle HAVING COUNT(*) <= 1000
    ), inter AS (
        SELECT a.doc_id AS a, b.doc_id AS b, COUNT(*) AS n_common
        FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        JOIN live l ON a.shingle = l.shingle
        GROUP BY a.doc_id, b.doc_id
    ), pairs AS (
        SELECT a, b
        FROM inter JOIN sizes sa ON inter.a = sa.doc_id
                   JOIN sizes sb ON inter.b = sb.doc_id
        WHERE CAST(n_common AS DOUBLE) / (sa.n + sb.n - n_common) >= 0.1
    ), edges AS (
        SELECT a AS u, b AS v FROM pairs UNION SELECT b, a FROM pairs
    ), reach(u, v) AS (
        SELECT u, v FROM edges
        UNION
        SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u WHERE e.v <> r.u
    ), drop_set AS (
        SELECT u AS doc_id FROM reach
        GROUP BY u HAVING LEAST(u, MIN(v)) <> u
    )
    SELECT d.doc_id, d.source, d.lang
    FROM documents d ANTI JOIN drop_set x ON d.doc_id = x.doc_id
    """,
    survey="ext: end-to-end corpus dedup resolve — capped n-gram Jaccard "
           "pairs -> connected components -> keep the min-id canonical per "
           "cluster, untouched docs pass through (anti-join drop set)",
)
def dedup_corpus_resolve(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _docs(spark, sf_dir)
    eligible = d.filter(F.size(X.tokens(F.col("text"))) >= 3)
    pairs = D.ngram_jaccard_pairs(eligible, n=3, threshold=0.1, max_shingle_freq=1000)
    return D.dedup_corpus(d, pairs).select("doc_id", "source", "lang")


@register(
    "zz_text_winnowing",
    oracle="""
    WITH toks AS (
        SELECT doc_id, string_split_regex(trim(text), '\\s+') AS l FROM documents
    ), g AS (
        SELECT doc_id, list_transform(range(1, len(l) - 1),
                                      i -> l[i] || ' ' || l[i+1] || ' ' || l[i+2]) AS grams
        FROM toks WHERE len(l) >= 3
    ), h AS (
        SELECT doc_id, list_transform(grams, x -> substr(md5(x), 1, 8)) AS hs FROM g
    ), f AS (
        SELECT doc_id,
               list_distinct(list_transform(range(1, len(hs) - 2),
                                            i -> list_aggregate(hs[i:i+3], 'min'))) AS fps
        FROM h WHERE len(hs) >= 4
    )
    SELECT doc_id, unnest(fps) AS fingerprint FROM f
    """,
    survey="ext: winnowing (MOSS rolling-hash) document fingerprints — "
           "min-hash per sliding window over word-3-gram hashes, map-only "
           "array expressions, guaranteed detection of shared runs >= "
           "window+n-1 tokens from a ~1/window sparse sample",
)
def text_winnowing(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..io import spread_scan

    # spread_scan (guide §6): the entry is MAP-ONLY — md5 per 3-gram plus
    # the rolling window-min fold all run in the single scan task of the
    # one-row-group parquet without it. Interleaved same-JVM A/B at
    # sf0.1: 1.21 -> 0.60 s median, md5-identical fingerprints. (Same
    # A/B on lm_score / hash_embed / simhash_portable read washes — their
    # per-row exprs are too cheap to buy back the spread exchange.)
    return X.winnowing_fingerprints(
        spread_scan(_docs(spark, sf_dir).select("doc_id", "text")),
        n=3, window=4)


@register(
    "zz_text_quality_filter",
    oracle="""
    WITH f AS (
        SELECT doc_id,
               length(text) AS n_chars,
               len(string_split_regex(trim(text), '\\s+')) AS n_tokens,
               len(regexp_extract_all(text, '[.,!?;:]')) AS n_punct,
               len(regexp_extract_all(text, '[A-Za-z]')) AS n_alpha
        FROM documents
    ), r AS (
        SELECT doc_id,
               list_filter([
                   CASE WHEN n_chars < 200 THEN 'min_chars' END,
                   CASE WHEN n_chars > 1000000 THEN 'max_chars' END,
                   CASE WHEN n_tokens < 20 THEN 'min_tokens' END,
                   CASE WHEN CAST(n_chars AS DOUBLE) / n_tokens < 2.0 THEN 'min_avg_token_len' END,
                   CASE WHEN CAST(n_chars AS DOUBLE) / n_tokens > 12.0 THEN 'max_avg_token_len' END,
                   CASE WHEN CAST(n_punct AS DOUBLE) / n_chars > 0.10 THEN 'max_punct_ratio' END,
                   CASE WHEN CAST(n_alpha AS DOUBLE) / n_chars < 0.60 THEN 'min_alpha_ratio' END
               ], x -> x IS NOT NULL) AS q_reasons
        FROM f
    )
    SELECT doc_id, coalesce(array_to_string(q_reasons, ','), '') AS q_reasons,
           len(q_reasons) = 0 AS q_keep FROM r
    """,
    survey="ext: composite quality filter — per-doc keep/drop with the "
           "violated-threshold reasons array (auditable drop set); one "
           "map-only codegen'd pass",
)
def text_quality_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    # The underlying operator keeps q_reasons as an ARRAY (auditable); the
    # catalog entry stringifies it because the driver harness canonicalizes
    # rows via pandas hashing, which cannot hash list cells.
    return X.quality_filter(_docs(spark, sf_dir)).select(
        "doc_id",
        F.array_join("q_reasons", ",").alias("q_reasons"),
        "q_keep",
    )


# --------------------------------------------------------------------------
# Deterministic sampling
# --------------------------------------------------------------------------

@register(
    "zz_sample_stratified",
    oracle="""
    SELECT doc_id, lang, source
    FROM documents
    WHERE substr(md5('s0' || lang || '|' || CAST(doc_id AS VARCHAR)), 1, 8)
          < CASE lang WHEN 'en' THEN '19999999'   -- 10%: downsample the majority
                      WHEN 'de' THEN '80000000'   -- 50%
                      WHEN 'es' THEN '80000000'
                      WHEN 'fr' THEN '80000000'
                      WHEN 'zh' THEN '80000000'
                      ELSE '00000000' END
    """,
    survey="ext: deterministic stratified sampling — per-stratum "
           "md5-threshold Bernoulli, map-only (zero shuffle), reproducible "
           "across runs/engines/partitionings; the language-rebalance shape "
           "a corpus pipeline runs",
)
def sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _docs(spark, sf_dir)
    rates = {"en": 0.1, "de": 0.5, "es": 0.5, "fr": 0.5, "zh": 0.5}
    return SA.stratified_sample(d, "lang", rates, key_col="doc_id").select(
        "doc_id", "lang", "source"
    )


@register(
    "sample_temperature",
    # τ=2 ⇒ the exponent is sqrt (IEEE-exact in both engines) and the
    # normalizer folds per-source terms in sorted order — deterministic
    # sequential double sum, so weights hash-match bit-exactly
    oracle="""
    WITH s AS (
        SELECT source, CAST(SUM(n_chars) AS BIGINT) AS available
        FROM documents GROUP BY source
    ), t AS (SELECT CAST(SUM(available) AS BIGINT) AS total FROM s
    ), sh AS (
        SELECT source, available,
               CAST(available AS DOUBLE) / total AS share,
               sqrt(CAST(available AS DOUBLE) / total) AS scaled
        FROM s, t
    ), nrm AS (
        SELECT list_reduce(list_transform(list_sort(
                   list(struct_pack(source := source, scaled := scaled))),
                   x -> x['scaled']), (acc, x) -> acc + x) AS norm
        FROM sh
    )
    SELECT source, available, share, scaled / norm AS weight
    FROM sh, nrm ORDER BY source
    """,
    survey="ext: temperature-scaled mixture weights (weight ∝ "
           "share^(1/τ), the multilingual-LM rebalance rule — τ>1 "
           "upsamples low-resource sources): one partial-agg sizing "
           "pass, O(sources) plan math, sorted-fold normalizer; at τ=2 "
           "the exponent is sqrt so the plan is bit-exact across "
           "engines; composes with mixture_sample for the draw. "
           "operators/sampling.py::temperature_weights",
)
def sample_temperature_entry(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _docs(spark, sf_dir)
    return SA.temperature_weights(d, "source", "n_chars", tau=2.0).orderBy(
        "source")


@register(
    "zz_sample_mixture",
    # keep_fraction is emitted UNROUNDED: both engines derive it through
    # the same exact-integer sums and double divide, so the doubles are
    # bit-identical (rounding would only add a rounding-mode hazard)
    oracle="""
    WITH w(source, w) AS (
        VALUES ('src1', 0.4), ('src2', 0.3), ('src3', 0.2), ('src4', 0.1)
    ), avail AS (
        SELECT w.source, w.w,
               CAST(COALESCE(SUM(d.n_chars), 0) AS BIGINT) AS available
        FROM w LEFT JOIN documents d ON d.source = w.source
        GROUP BY w.source, w.w
    ), plan AS (
        SELECT source, available,
               CASE WHEN available = 0 THEN 0.0
                    ELSE LEAST(1.0, (w * 20000.0) / available) END AS f
        FROM avail
    ), thr AS (
        SELECT source, available, f,
               printf('%08x', CAST(LEAST(FLOOR(f * 4294967296.0),
                                         4294967295.0) AS BIGINT)) AS t
        FROM plan
    ), kept AS (
        -- f >= 1.0 keeps the stratum in full (the engine short-circuits
        -- the threshold predicate for capped sources)
        SELECT t.source, d.n_chars
        FROM documents d JOIN thr t ON d.source = t.source
        WHERE t.f >= 1.0 OR substr(md5('mix0' || d.source || '|'
                         || CAST(d.doc_id AS VARCHAR)), 1, 8) < t.t
    )
    SELECT t.source, t.available, t.f AS keep_fraction,
           CAST(COUNT(k.n_chars) AS BIGINT) AS n_sampled,
           CAST(COALESCE(SUM(k.n_chars), 0) AS BIGINT) AS sampled_chars
    FROM thr t LEFT JOIN kept k ON k.source = t.source
    GROUP BY t.source, t.available, t.f
    ORDER BY t.source
    """,
    survey="ext: budgeted mixture resampling (training-mix planner) — "
           "per-source keep fraction min(1, weight*budget/available) "
           "derived from one O(sources) partial-agg pass, then the "
           "deterministic md5-threshold draw; map-only apply, fact never "
           "shuffles, capped sources report their deficit instead of "
           "silently borrowing budget",
)
def zz_sample_mixture_entry(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _docs(spark, sf_dir)
    weights = {"src1": 0.4, "src2": 0.3, "src3": 0.2, "src4": 0.1}
    plan, sample = SA.mixture_sample(
        d, "source", weights, 20_000.0, "n_chars", "doc_id")
    stats = sample.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_sampled"),
        F.sum("n_chars").cast("long").alias("sampled_chars"),
    )
    return (
        plan.join(stats, "source", "left")
        .select(
            "source", "available", "keep_fraction",
            F.coalesce("n_sampled", F.lit(0)).alias("n_sampled"),
            F.coalesce("sampled_chars", F.lit(0)).alias("sampled_chars"),
        )
        .orderBy("source")
    )


@register(
    "zz_sample_k_per_stratum",
    oracle="""
    SELECT doc_id, source
    FROM (
        SELECT doc_id, source,
               ROW_NUMBER() OVER (
                   PARTITION BY source
                   ORDER BY substr(md5('s0' || CAST(doc_id AS VARCHAR)), 1, 8),
                            doc_id) AS rk
        FROM documents
    ) WHERE rk <= 5
    """,
    survey="ext: exact-k-per-stratum sampling (distributed reservoir "
           "equivalent) — hash-rank rows within each stratum, keep the "
           "first k; one shuffle on the stratum key, no driver pass",
)
def sample_k_per_stratum(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _docs(spark, sf_dir)
    return SA.sample_k_per_stratum(d, "source", k=5, key_col="doc_id").select(
        "doc_id", "source"
    )


@register(
    "zz_sample_train_eval_split",
    oracle="""
    SELECT doc_id,
           CASE WHEN substr(md5('split0' || CAST(doc_id AS VARCHAR)), 1, 8)
                     < '0ccccccc' THEN 'eval' ELSE 'train' END AS side
    FROM documents
    """,
    survey="ext: deterministic train/eval split by key (contamination "
           "guard) — disjoint + exhaustive, same side for a key in every "
           "table and every run",
)
def sample_train_eval_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _docs(spark, sf_dir)
    train, ev = SA.split_train_eval(d, "doc_id", eval_fraction=0.05)
    return train.select("doc_id", F.lit("train").alias("side")).unionAll(
        ev.select("doc_id", F.lit("eval").alias("side"))
    )


# --------------------------------------------------------------------------
# Text analysis
# --------------------------------------------------------------------------

@register(
    "zz_text_quality_scores",
    oracle="""
    WITH f AS (
        SELECT doc_id,
               length(text) AS q_n_chars,
               len(string_split_regex(trim(text), '\\s+')) AS q_n_tokens,
               len(regexp_extract_all(text, '[.,!?;:]')) AS n_punct,
               len(regexp_extract_all(text, '[A-Za-z]')) AS n_alpha,
               len(regexp_extract_all(lower(text), '\\b(the|and|of|to|in|is)\\b')) AS n_stop
        FROM documents
    )
    SELECT doc_id, q_n_chars, q_n_tokens,
           CAST(q_n_chars AS DOUBLE) / q_n_tokens AS q_avg_token_len,
           CAST(n_punct AS DOUBLE) / q_n_chars AS q_punct_ratio,
           CAST(n_alpha AS DOUBLE) / q_n_chars AS q_alpha_ratio,
           CAST(n_stop AS DOUBLE) / q_n_tokens AS q_stopword_ratio
    FROM f
    """,
    survey="ext: quality scoring (length/punct/stopword ratios) — map-only, codegen'd",
)
def text_quality_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _docs(spark, sf_dir)
    return X.quality_features(d).select(
        "doc_id", "q_n_chars", "q_n_tokens", "q_avg_token_len",
        "q_punct_ratio", "q_alpha_ratio", "q_stopword_ratio",
    )


@register(
    "zz_text_language_id",
    oracle="""
    WITH scored AS (
        SELECT lang,
               len(regexp_extract_all(lower(text), '\\b(the|and|of|to|in|is)\\b')) AS s_en,
               len(regexp_extract_all(lower(text), '\\b(el|la|de|que|los|una)\\b')) AS s_es,
               len(regexp_extract_all(lower(text), '\\b(der|die|und|das|ist|nicht)\\b')) AS s_de,
               len(regexp_extract_all(lower(text), '\\b(le|la|et|les|des|est)\\b')) AS s_fr
        FROM documents
    ), guessed AS (
        SELECT lang,
               CASE WHEN greatest(s_en, s_es, s_de, s_fr) = 0 THEN 'und'
                    WHEN s_en = greatest(s_en, s_es, s_de, s_fr) THEN 'en'
                    WHEN s_es = greatest(s_en, s_es, s_de, s_fr) THEN 'es'
                    WHEN s_de = greatest(s_en, s_es, s_de, s_fr) THEN 'de'
                    ELSE 'fr' END AS guessed_lang
        FROM scored
    )
    SELECT lang, guessed_lang, COUNT(*) AS n_docs
    FROM guessed GROUP BY lang, guessed_lang
    """,
    survey="ext: language-ID (stopword-voting n-gram heuristic), confusion counts vs labeled lang",
)
def text_language_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _docs(spark, sf_dir)
    return (
        d.select("lang", X.language_guess(F.col("text")).alias("guessed_lang"))
        .groupBy("lang", "guessed_lang")
        .agg(F.count("*").alias("n_docs"))
    )


@register(
    "zz_text_token_counts",
    oracle="""
    SELECT source,
           CAST(SUM(len(string_split_regex(trim(text), '\\s+'))) AS BIGINT) AS total_ws_tokens,
           CAST(SUM(len(regexp_extract_all(text, '[A-Za-z]{1,4}|[0-9]|[^A-Za-z0-9\\s]'))) AS BIGINT) AS total_subword_est,
           CAST(SUM(len(string_split_regex(trim(text), '\\s+'))) AS DOUBLE) / COUNT(*) AS avg_ws_tokens
    FROM documents
    GROUP BY source
    """,
    survey="ext: token counting (whitespace + BPE-ish regex estimate) per source",
)
def text_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _docs(spark, sf_dir)
    ws = X.token_count(F.col("text"))
    sw = X.subword_count(F.col("text"))
    return d.groupBy("source").agg(
        F.sum(ws).alias("total_ws_tokens"),
        F.sum(sw).alias("total_subword_est"),
        (F.sum(ws).cast("double") / F.count("*")).alias("avg_ws_tokens"),
    )


# --------------------------------------------------------------------------
# Similarity search
# --------------------------------------------------------------------------

@register(
    "zz_sim_cosine_topk",
    oracle="""
    WITH q AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 0),
    scored AS (
        SELECT e.vec_id,
               list_dot_product(e.embedding::DOUBLE[], q.qv)
               / (sqrt(list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[]))
                  * sqrt(list_dot_product(q.qv, q.qv))) AS cosine
        FROM embeddings e, q
        WHERE e.vec_id <> 0
    )
    SELECT vec_id, cosine,
           CAST(ROW_NUMBER() OVER (ORDER BY cosine DESC, vec_id) AS INT) AS rank
    FROM scored
    ORDER BY cosine DESC, vec_id
    LIMIT 10
    """,
    survey="ext: brute-force cosine top-k ANN baseline (broadcast query, map-side score, TakeOrdered)",
)
def sim_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _emb(spark, sf_dir)
    q = e.filter(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    out = S.cosine_topk_brute(e, q, k=10)
    return out.select("vec_id", "cosine", F.col("rank").cast("int").alias("rank"))


@register(
    "zz_sim_embedding_norms",
    oracle="""
    SELECT label,
           COUNT(*) AS n_vectors,
           CAST(SUM(CAST(sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS DECIMAL(27,6))) AS DOUBLE) / COUNT(*) AS avg_l2_norm
    FROM embeddings
    GROUP BY label
    """,
    survey="ext: embedding norm stats per label (vectorized array math, decimal-exact avg)",
)
def sim_embedding_norms(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _emb(spark, sf_dir)
    norm = S.norm_expr(F.col("embedding"))
    return e.groupBy("label").agg(
        F.count("*").alias("n_vectors"),
        (F.sum(norm.cast("decimal(27,6)")).cast("double") / F.count("*"))
        .alias("avg_l2_norm"),
    )


@register(
    "zz_sim_ann_srp_topk",
    oracle=None,  # approximate by design; recall vs brute force checked in tests/test_similarity.py
    survey="ext: SRP-LSH bucketed approximate top-k (scale path: equality join on bucket code)",
)
def sim_ann_srp_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _emb(spark, sf_dir)
    q = e.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    # bits sized to table density: 2^bits buckets should each hold enough
    # candidates to fill k. For the small testdata that's 4 bits; at 10^9
    # vectors you'd raise it (pruning grows 2^bits while recall per probe
    # depends on similarity concentration).
    return S.ann_topk_srp(e, q, k=10, bits=4)


@register(
    "zz_sim_ann_ivf_topk",
    oracle=None,  # KMeans quantizer is iterative (non-SQL); recall vs brute force in tests/test_dedup_similarity.py
    survey="ext: IVF inverted-file approximate top-k (KMeans cells + nprobe; "
           "cell doubles as the physical partition key at scale so a probe "
           "is a partition-pruned read)",
)
def sim_ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    import hashlib
    import os
    import tempfile

    e = _emb(spark, sf_dir)
    q = e.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    # 16 cells / probe 8 suits the small testdata; at 10^9 vectors you'd use
    # ~sqrt(N) cells and keep nprobe/n_centroids (the scanned fraction) fixed.
    # Build-once/probe-many: the cell-partitioned index persists per sf_dir,
    # so repeated invocations (and bench iterations) time the probe only —
    # exactly how an IVF index is used in production.
    # key includes the source file's identity (mtime+size), not just its
    # path: driver testdata regenerates in place between rounds, and a
    # path-only key would silently serve the previous data's index
    st = os.stat(os.path.join(sf_dir, "embeddings.parquet"))
    key = hashlib.md5(
        f"{os.path.abspath(sf_dir)}|{st.st_mtime_ns}|{st.st_size}".encode()
    ).hexdigest()[:12]
    idx = os.path.join(tempfile.gettempdir(), f"rdw_ivf_{key}_c16")
    assigned, centroids = S.ivf_index(spark, e, idx, n_centroids=16)
    return S.ivf_topk(assigned, centroids, q, k=10, nprobe=8)


@register(
    "zz_text_match_pairs",
    oracle="""
    WITH toks AS (
        SELECT doc_id, string_split_regex(trim(text), '\\s+') AS l FROM documents
    ), g AS (
        SELECT doc_id, list_transform(range(1, len(l) - 1),
                                      i -> l[i] || ' ' || l[i+1] || ' ' || l[i+2]) AS grams
        FROM toks WHERE len(l) >= 3
    ), h AS (
        SELECT doc_id, list_transform(grams, x -> substr(md5(x), 1, 8)) AS hs FROM g
    ), f AS (
        SELECT doc_id,
               list_distinct(list_transform(range(1, len(hs) - 2),
                                            i -> list_aggregate(hs[i:i+3], 'min'))) AS fps
        FROM h WHERE len(hs) >= 4
    ), fp AS (
        SELECT doc_id, unnest(fps) AS fingerprint FROM f
    ), live AS (
        SELECT fingerprint FROM fp GROUP BY fingerprint HAVING COUNT(*) <= 1000
    )
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           CAST(COUNT(*) AS BIGINT) AS n_common
    FROM fp a
    JOIN live l ON a.fingerprint = l.fingerprint
    JOIN fp b ON a.fingerprint = b.fingerprint AND a.doc_id < b.doc_id
    GROUP BY a.doc_id, b.doc_id
    HAVING COUNT(*) >= 2
    """,
    survey="ext: MOSS matcher — document pairs sharing >= k winnowing "
           "fingerprints (guaranteed shared-span detection from the "
           "~1/window sparse sample); stop-fingerprint cap + inverted "
           "index self-join, the shingle-Jaccard shuffle shape at 1/window "
           "the index size",
)
def text_match_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return X.winnowing_match_pairs(_docs(spark, sf_dir), n=3, window=4,
                                   min_common=2, max_fp_freq=1000)


@register(
    "zz_zorder_key",
    oracle="""
    WITH c AS (
        SELECT doc_id, n_chars,
               LEAST(GREATEST(CAST(doc_id AS BIGINT), 0), 65535) AS a,
               LEAST(GREATEST(CAST(n_chars AS BIGINT), 0), 65535) AS b
        FROM documents
    )
    SELECT doc_id, CAST(n_chars AS BIGINT) AS n_chars,
           CAST(list_sum(list_transform(range(0, 16),
                i -> (((a >> i) & 1) << (2*i)) + (((b >> i) & 1) << (2*i + 1))
           )) AS BIGINT) AS zkey
    FROM c
    """,
    survey="ext: Z-order (Morton) layout key — bit-interleaved multi-column "
           "clustering for min/max file pruning (the OPTIMIZE..ZORDER BY "
           "layout tool as plain codegen'd integer arithmetic); "
           "cluster_by_zorder range-partitions + sorts on it",
)
def zorder_key_entry(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators import layout as L

    d = _docs(spark, sf_dir)
    return d.select(
        "doc_id", F.col("n_chars").cast("long").alias("n_chars"),
        L.morton_key([F.col("doc_id"), F.col("n_chars")], bits=16).alias("zkey"),
    )


@register(
    "zz_sim_kmeans_stats",
    oracle=None,  # KMeans quantizer is iterative (non-SQL); invariants (sizes sum to N, nearest-centroid assignment, determinism) in tests/test_textops_extra.py
    survey="ext: embedding-cluster topology report (KMeans cells: size, "
           "share, mean/max dispersion) — the embedding-space corpus_stats "
           "and the IVF index health check; broadcast centroid join + one "
           "partial-agg shuffle",
)
def sim_kmeans_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    import hashlib
    import os
    import tempfile

    e = _emb(spark, sf_dir)
    # build-once / probe-many, same file-identity-keyed index layout as
    # zz_sim_ann_ivf_topk — repeated invocations pay the stats pass only
    st = os.stat(os.path.join(sf_dir, "embeddings.parquet"))
    key = hashlib.md5(
        f"{os.path.abspath(sf_dir)}|{st.st_mtime_ns}|{st.st_size}".encode()
    ).hexdigest()[:12]
    idx = os.path.join(tempfile.gettempdir(), f"rdw_ivf_{key}_c8")
    assigned, centroids = S.ivf_index(spark, e, idx, n_centroids=8)
    return S.cluster_stats(assigned, centroids)


# --------------------------------------------------------------------------
# Multimodal plumbing
# --------------------------------------------------------------------------

@register(
    "zz_mm_binary_features",
    oracle="""
    SELECT doc_id,
           'image/fake' AS media_type,
           CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
           ascii(substr(text, 1, 1)) AS first_byte,
           CAST(octet_length(encode(text)) % 640 AS INT) AS fake_width,
           CAST(octet_length(encode(text)) % 480 AS INT) AS fake_height
    FROM documents
    """,
    survey="ext: multimodal binary-column plumbing (Arrow-batched mapInPandas feature extraction; decode stubbed)",
)
def mm_binary_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _docs(spark, sf_dir)
    media = M.documents_as_media(d)
    return M.decode_image_features(media, fake=True)


@register(
    "zz_mm_frame_sample",
    oracle=None,  # fan-out shape + byte arithmetic verified in tests/test_dedup_similarity.py::test_frame_sample (driver window holds the 50 oracle-bearing entries)
    survey="ext: multimodal frame-sampling plumbing (one media row -> n_frames "
           "rows via Arrow-batched mapInPandas; ffmpeg decode stubbed, byte "
           "slicing real)",
)
def mm_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _docs(spark, sf_dir)
    media = M.documents_as_media(d)
    return M.sample_frames(media, n_frames=4).select(
        "doc_id", "frame_index", "frame_offset", "frame_n_bytes"
    )


# --------------------------------------------------------------------------
# Repetition + eval-set decontamination (Gopher/GPT-3-style hygiene)
# --------------------------------------------------------------------------

@register(
    "zz_text_repetition",
    oracle="""
    WITH toks AS (
        SELECT doc_id, string_split_regex(trim(text), '\\s+') AS l
        FROM documents WHERE trim(text) <> ''
    ), g AS (
        SELECT doc_id,
               unnest(list_transform(range(1, len(l)), i -> l[i] || ' ' || l[i+1])) AS gm
        FROM toks WHERE len(l) >= 2
    ), per AS (
        SELECT doc_id, gm, COUNT(*) AS c FROM g GROUP BY doc_id, gm
    ), tg AS (
        SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_grams,
               CAST(MAX(c) AS BIGINT) AS top_gram_count,
               CAST(MAX(c) AS DOUBLE) / SUM(c) AS top_gram_frac
        FROM per GROUP BY doc_id
    ), lx AS (
        SELECT doc_id,
               list_filter(list_transform(string_split(text, chr(10)), x -> trim(x)),
                           x -> x <> '') AS lines
        FROM documents
    ), ln AS (
        SELECT doc_id,
               CAST(len(lines) AS BIGINT) AS rep_n_lines,
               CASE WHEN len(lines) = 0 THEN 0.0
                    ELSE CAST(len(lines) - len(list_distinct(lines)) AS DOUBLE) / len(lines)
               END AS rep_dup_line_frac
        FROM lx
    )
    SELECT tg.doc_id, tg.n_grams, tg.top_gram_count, tg.top_gram_frac,
           ln.rep_n_lines, ln.rep_dup_line_frac
    FROM tg JOIN ln ON tg.doc_id = ln.doc_id
    """,
    survey="ext: within-document repetition signals (Gopher family) — "
           "top-bigram occupancy share (hashed-gram counts, two partial-agg "
           "shuffles of longs) + duplicate-line fractions (map-only "
           "let-bound array exprs)",
)
def text_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _docs(spark, sf_dir)
    top = X.top_ngram_repetition(d, n=2)
    lines = X.repetition_features(d).select(
        "doc_id", "rep_n_lines", "rep_dup_line_frac"
    )
    return top.join(lines, "doc_id")


@register(
    "zz_text_decontaminate",
    oracle="""
    WITH sides AS (
        SELECT doc_id, text,
               CASE WHEN substr(md5('split0' || CAST(doc_id AS VARCHAR)), 1, 8)
                         < '0ccccccc' THEN 'eval' ELSE 'train' END AS side
        FROM documents
    ), toks AS (
        SELECT doc_id, side, string_split_regex(trim(text), '\\s+') AS l
        FROM sides
    ), sh AS (
        SELECT DISTINCT doc_id, side,
               unnest(list_transform(range(1, len(l) - 1),
                                     i -> l[i] || ' ' || l[i+1] || ' ' || l[i+2])) AS g
        FROM toks WHERE len(l) >= 3
    )
    SELECT t.doc_id AS train_id, e.doc_id AS eval_id,
           CAST(COUNT(*) AS BIGINT) AS n_common
    FROM sh t JOIN sh e ON t.g = e.g AND t.side = 'train' AND e.side = 'eval'
    GROUP BY t.doc_id, e.doc_id
    HAVING COUNT(*) >= 3
    """,
    survey="ext: eval-set decontamination — train docs sharing >= k distinct "
           "word n-grams with any eval doc, via the hashed inverted gram "
           "index (broadcastable eval side); the external-benchmark leak "
           "guard on top of the keyed split",
)
def text_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators import decontam as DC

    d = _docs(spark, sf_dir)
    train, ev = SA.split_train_eval(d, "doc_id", eval_fraction=0.05)
    return DC.contamination_pairs(train, ev, n=3, min_common=3)


# --------------------------------------------------------------------------
# Sequence packing + token-budget mix (training last-mile)
# --------------------------------------------------------------------------

@register(
    "pack_sequences",
    oracle="""
    WITH t AS (
        SELECT doc_id, len(string_split_regex(trim(text), '\\s+')) AS n_tokens
        FROM documents WHERE trim(text) <> ''
    ), c AS (
        SELECT doc_id, n_tokens,
               SUM(n_tokens) OVER (ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tokens
                   AS off
        FROM t
    )
    SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
           CAST(off AS BIGINT) AS offset,
           CAST(off // 2048 AS BIGINT) AS first_seq,
           CAST((off + n_tokens - 1) // 2048 AS BIGINT) AS last_seq,
           CAST((off + n_tokens - 1) // 2048 - off // 2048 + 1 AS BIGINT) AS n_seqs
    FROM c
    """,
    survey="ext: concat-and-chunk sequence packing — per-doc global stream "
           "offset + spanned training sequences via a DISTRIBUTED exclusive "
           "prefix sum (range repartition, per-partition running sums, "
           "partition-offset map from a #partitions-row collect); never a "
           "single-task global window",
)
def pack_sequences_entry(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators import packing as PK

    d = _docs(spark, sf_dir).filter(F.trim(F.col("text")) != "").select(
        "doc_id", X.token_count(F.col("text")).cast("long").alias("n_tokens")
    )
    return PK.pack_sequences(d, seq_len=2048)


@register(
    "zz_export_shards",
    oracle="""
    WITH t AS (
        SELECT doc_id,
               len(string_split_regex(trim(text), '\\s+')) AS n_tokens
        FROM documents WHERE trim(text) <> ''
    ), o AS (
        SELECT *, ROW_NUMBER() OVER (
            ORDER BY substr(md5('sh0' || CAST(doc_id AS VARCHAR)), 1, 8),
                     doc_id) - 1 AS position
        FROM t
    ), c AS (
        SELECT *, SUM(n_tokens) OVER (
            ORDER BY position
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tokens AS off
        FROM o
    )
    SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
           CAST(position AS BIGINT) AS position,
           CAST(off AS BIGINT) AS offset,
           CAST(off // 4000 AS BIGINT) AS shard
    FROM c
    """,
    survey="ext: deterministic training-shard assignment — contiguous "
           "ranges of the shuffled token stream cut at ~tokens_per_shard, "
           "start-of-doc rule so documents never split across shard files; "
           "one distributed prefix sum + map-only math (the physical "
           "writer + shard index are pytest-verified in write_shards)",
)
def export_shards_entry(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators import packing as PK

    d = _docs(spark, sf_dir).filter(F.trim(F.col("text")) != "").select(
        "doc_id", X.token_count(F.col("text")).cast("long").alias("n_tokens")
    )
    ordered = PK.shuffle_order(d, key_col="doc_id", seed="sh0")
    return PK.assign_shards(ordered, tokens_per_shard=4000).select(
        "doc_id", "n_tokens", "position", "offset", "shard"
    )


@register(
    "zz_epoch_plan",
    oracle="""
    WITH t AS (
        SELECT doc_id,
               len(string_split_regex(trim(text), '\\s+')) AS n_tokens
        FROM documents WHERE trim(text) <> ''
    ), o AS (
        SELECT *, ROW_NUMBER() OVER (
            ORDER BY substr(md5('sh0' || CAST(doc_id AS VARCHAR)), 1, 8),
                     doc_id) - 1 AS position
        FROM t
    ), c AS (
        SELECT *, SUM(n_tokens) OVER (
            ORDER BY position
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tokens AS off
        FROM o
    ), sh AS (
        SELECT CAST(off // 4000 AS BIGINT) AS shard,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(n_tokens) AS BIGINT) AS n_tokens
        FROM c GROUP BY 1
    )
    SELECT CAST(e.epoch AS INT) AS epoch,
           CAST(ROW_NUMBER() OVER (
               PARTITION BY e.epoch
               ORDER BY md5(concat_ws(':', 'e0',
                            CAST(e.epoch AS VARCHAR),
                            CAST(sh.shard AS VARCHAR))), sh.shard
           ) - 1 AS BIGINT) AS epoch_pos,
           sh.shard, sh.n_docs, sh.n_tokens
    FROM sh CROSS JOIN range(3) e(epoch)
    """,
    survey="ext: loader epoch planner — per-epoch reproducible shard order "
           "from the shard index alone (md5(seed:epoch:shard) hash-as-"
           "order), so any worker on any machine derives the identical "
           "schedule and a resumed run re-enters mid-epoch "
           "deterministically; metadata-scale (one row per shard × epoch)",
)
def epoch_plan_entry(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators import packing as PK

    d = _docs(spark, sf_dir).filter(F.trim(F.col("text")) != "").select(
        "doc_id", X.token_count(F.col("text")).cast("long").alias("n_tokens")
    )
    ordered = PK.shuffle_order(d, key_col="doc_id", seed="sh0")
    sh = (
        PK.assign_shards(ordered, tokens_per_shard=4000)
        .groupBy("shard")
        .agg(F.count("*").alias("n_docs"),
             F.sum("n_tokens").alias("n_tokens"))
    )
    return PK.plan_epochs(sh, n_epochs=3, seed="e0").select(
        "epoch", "epoch_pos", "shard", "n_docs", "n_tokens"
    )


@register(
    "zz_corpus_quantiles",
    oracle="""
    WITH t AS (
        SELECT lang, n_chars,
               len(string_split_regex(trim(text), '\\s+')) AS n_tokens
        FROM documents WHERE trim(text) <> ''
    )
    SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
           quantile_cont(n_chars, 0.5)  AS p50_chars,
           quantile_cont(n_chars, 0.9)  AS p90_chars,
           quantile_cont(n_chars, 0.99) AS p99_chars,
           quantile_cont(n_tokens, 0.5) AS p50_tokens,
           quantile_cont(n_tokens, 0.9) AS p90_tokens
    FROM t GROUP BY lang
    """,
    survey="ext: per-stratum length-distribution quantiles — the corpus "
           "observability report behind threshold derivation. EXACT "
           "percentiles here (linear interpolation — bit-identical between "
           "Spark percentile() and DuckDB quantile_cont, so the entry is "
           "hash-verifiable); at the 100 TB tier the same report runs on "
           "percentile_approx sketches (operators/text.py::"
           "adaptive_quality_thresholds), whose t-digest output is "
           "engine-specific and pytest-verified instead",
)
def corpus_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _docs(spark, sf_dir).filter(F.trim(F.col("text")) != "").select(
        "lang", "n_chars",
        X.token_count(F.col("text")).cast("long").alias("n_tokens"),
    )
    return d.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.expr("percentile(n_chars, 0.5D)").alias("p50_chars"),
        F.expr("percentile(n_chars, 0.9D)").alias("p90_chars"),
        F.expr("percentile(n_chars, 0.99D)").alias("p99_chars"),
        F.expr("percentile(n_tokens, 0.5D)").alias("p50_tokens"),
        F.expr("percentile(n_tokens, 0.9D)").alias("p90_tokens"),
    )


# the synthetic documents are pure ASCII, so the normalization entry
# PLANTS a decomposed-unicode suffix (e + combining acute, a fullwidth
# digit) identically on both sides; NFC composes the accent on both
# engines (DuckDB has no NFKC, so compatibility folding is pytest-only)
_NFC_PLANT = " cafe\u0301 \uff11"


@register(
    "zz_text_normalize",
    oracle=f"""
    SELECT doc_id,
           nfc_normalize(text || '{_NFC_PLANT}') AS norm_text,
           CAST(length(nfc_normalize(text || '{_NFC_PLANT}')) AS BIGINT)
               AS n_chars_norm
    FROM documents
    """,
    survey="ext: unicode normalization — the pre-dedup hygiene pass that "
           "stops decomposed/precomposed variants defeating exact and "
           "shingle dedup; Arrow-batched pandas_udf (Catalyst has no "
           "normalizer), NFC hash-verified against DuckDB's nfc_normalize",
)
def text_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.scalars import unicode_normalize

    d = _docs(spark, sf_dir)
    norm = unicode_normalize(
        F.concat(F.col("text"), F.lit(_NFC_PLANT)), form="NFC",
        strip_control=False,
    )
    return d.select(
        "doc_id", norm.alias("norm_text"),
        F.length(norm).cast("long").alias("n_chars_norm"),
    )


@register(
    "zz_doc_features",
    oracle="""
    WITH f AS (
        SELECT doc_id,
               length(text) AS q_n_chars,
               len(string_split_regex(trim(text), '\\s+')) AS q_n_tokens,
               len(regexp_extract_all(text, '[.,!?;:]')) AS n_punct,
               len(regexp_extract_all(text, '[A-Za-z]')) AS n_alpha,
               len(regexp_extract_all(lower(text), '\\b(the|and|of|to|in|is)\\b')) AS s_en,
               len(regexp_extract_all(lower(text), '\\b(el|la|de|que|los|una)\\b')) AS s_es,
               len(regexp_extract_all(lower(text), '\\b(der|die|und|das|ist|nicht)\\b')) AS s_de,
               len(regexp_extract_all(lower(text), '\\b(le|la|et|les|des|est)\\b')) AS s_fr,
               len(regexp_extract_all(text, '[A-Za-z]{1,4}|[0-9]|[^A-Za-z0-9\\s]'))
                   AS n_subword,
               list_filter(list_transform(string_split(text, chr(10)),
                                          x -> trim(x)), x -> x <> '') AS lines
        FROM documents
    ), g AS (
        SELECT *,
               coalesce(list_sum(list_transform(lines, x -> length(x))), 0) AS tot,
               coalesce(list_sum(list_transform(list_distinct(lines),
                                                x -> length(x))), 0) AS uniq
        FROM f
    )
    SELECT doc_id,
           CAST(q_n_chars AS BIGINT) AS q_n_chars,
           CAST(q_n_tokens AS BIGINT) AS q_n_tokens,
           CAST(q_n_chars AS DOUBLE) / q_n_tokens AS q_avg_token_len,
           CAST(n_punct AS DOUBLE) / q_n_chars AS q_punct_ratio,
           CAST(n_alpha AS DOUBLE) / q_n_chars AS q_alpha_ratio,
           CAST(s_en AS DOUBLE) / q_n_tokens AS q_stopword_ratio,
           CAST(len(lines) AS BIGINT) AS rep_n_lines,
           CASE WHEN len(lines) = 0 THEN 0.0
                ELSE CAST(len(lines) - len(list_distinct(lines)) AS DOUBLE)
                     / len(lines) END AS rep_dup_line_frac,
           CASE WHEN tot = 0 THEN 0.0
                ELSE CAST(tot - uniq AS DOUBLE) / tot
                END AS rep_dup_line_char_frac,
           CASE WHEN greatest(s_en, s_es, s_de, s_fr) = 0 THEN 'und'
                WHEN s_en = greatest(s_en, s_es, s_de, s_fr) THEN 'en'
                WHEN s_es = greatest(s_en, s_es, s_de, s_fr) THEN 'es'
                WHEN s_de = greatest(s_en, s_es, s_de, s_fr) THEN 'de'
                ELSE 'fr' END AS guessed_lang,
           CAST(n_subword AS BIGINT) AS n_subword
    FROM g
    """,
    survey="ext: fused per-document feature pass — quality ratios, "
           "dup-line repetition, language guess, subword estimate in ONE "
           "scan/projection (operator fusion: at 100 TB the cost is the "
           "read, so every map-only signal shares it; zero Exchange, "
           "plan-gated)",
)
def doc_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = X.repetition_features(X.quality_features(_docs(spark, sf_dir)))
    return d.select(
        "doc_id", "q_n_chars", "q_n_tokens", "q_avg_token_len",
        "q_punct_ratio", "q_alpha_ratio", "q_stopword_ratio",
        "rep_n_lines", "rep_dup_line_frac", "rep_dup_line_char_frac",
        X.language_guess(F.col("text")).alias("guessed_lang"),
        X.subword_count(F.col("text")).cast("long").alias("n_subword"),
    )


@register(
    "zz_pack_truncated",
    oracle="""
    WITH t AS (
        SELECT doc_id,
               LEAST(len(string_split_regex(trim(text), '\\s+')), 60)
                   AS n_tokens,
               len(string_split_regex(trim(text), '\\s+')) > 60 AS truncated
        FROM documents WHERE trim(text) <> ''
    ), c AS (
        SELECT doc_id, n_tokens, truncated,
               SUM(n_tokens) OVER (ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tokens
                   AS off
        FROM t
    )
    SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens, truncated,
           CAST(off AS BIGINT) AS offset,
           CAST(off // 128 AS BIGINT) AS first_seq,
           CAST((off + n_tokens - 1) // 128 AS BIGINT) AS last_seq
    FROM c
    """,
    survey="ext: sequence packing with long-document truncation — a doc "
           "contributes at most max_doc_tokens to the stream (map-only "
           "cap + truncated flag), the standard guard against one "
           "book-length doc spanning hundreds of sequences",
)
def pack_truncated(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators import packing as PK

    d = _docs(spark, sf_dir).filter(F.trim(F.col("text")) != "").select(
        "doc_id", X.token_count(F.col("text")).cast("long").alias("n_tokens")
    )
    return PK.pack_sequences(d, seq_len=128, max_doc_tokens=60).select(
        "doc_id", "n_tokens", "truncated", "offset", "first_seq", "last_seq"
    )


@register(
    "zz_text_token_rarity",
    oracle="""
    WITH toks AS (
        SELECT doc_id,
               unnest(string_split_regex(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')), '\\s+')) AS tok
        FROM documents WHERE trim(text) <> ''
    ), dt AS (
        SELECT doc_id, tok, COUNT(*) AS c
        FROM toks WHERE tok <> '' GROUP BY doc_id, tok
    ), vocab AS (
        SELECT tok, CAST(SUM(c) AS BIGINT) AS cf FROM dt GROUP BY tok
    )
    SELECT dt.doc_id,
           CAST(SUM(dt.c) AS BIGINT) AS n_tokens,
           CAST(COUNT(*) AS BIGINT) AS n_types,
           CAST(MIN(v.cf) AS BIGINT) AS rarest_token_freq,
           CAST(SUM(dt.c * v.cf) AS DOUBLE) / SUM(dt.c) AS mean_token_freq
    FROM dt JOIN vocab v ON dt.tok = v.tok
    GROUP BY dt.doc_id
    """,
    survey="ext: corpus-frequency token rarity (unigram-LM perplexity "
           "proxy) — per-doc rarest-token frequency + tf-weighted mean "
           "corpus frequency; exact integer aggregates with one final "
           "division so the score is engine- and order-independent "
           "(a log-prob sum would not hash-compare)",
)
def text_token_rarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    return X.token_rarity(_docs(spark, sf_dir))


# the synthetic documents are PII-free word soup, so the catalog entry
# PLANTS deterministic PII derived from doc_id (identically in the oracle)
# to give the extraction non-trivial coverage; realistic inputs are covered
# in tests/test_textops_extra.py
_PII_PLANT = (
    "text || repeat(' u' || CAST(doc_id AS STRING) || '@example.com',"
    " CAST(doc_id % 3 AS INT))"
    " || repeat(' 10.0.0.' || CAST(doc_id % 256 AS STRING),"
    " CAST(doc_id % 2 AS INT))"
    " || CASE WHEN doc_id % 5 = 0"
    " THEN ' ssn 123-45-6789 tel 555.123.4567' ELSE '' END"
)


@register(
    "zz_text_pii",
    oracle=f"""
    WITH planted AS (
        SELECT doc_id,
               {_PII_PLANT.replace("AS STRING", "AS VARCHAR")} AS text
        FROM documents
    )
    SELECT doc_id,
           CAST(len(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{{2,}}')) AS BIGINT) AS n_email,
           CAST(len(regexp_extract_all(text, '\\b\\d{{3}}-\\d{{2}}-\\d{{4}}\\b')) AS BIGINT) AS n_ssn,
           CAST(len(regexp_extract_all(text, '\\b\\d{{3}}[-.]\\d{{3}}[-.]\\d{{4}}\\b')) AS BIGINT) AS n_phone,
           CAST(len(regexp_extract_all(text, '\\b\\d{{1,3}}\\.\\d{{1,3}}\\.\\d{{1,3}}\\.\\d{{1,3}}\\b')) AS BIGINT) AS n_ipv4,
           CAST(len(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{{2,}}'))
              + len(regexp_extract_all(text, '\\b\\d{{3}}-\\d{{2}}-\\d{{4}}\\b'))
              + len(regexp_extract_all(text, '\\b\\d{{3}}[-.]\\d{{3}}[-.]\\d{{4}}\\b'))
              + len(regexp_extract_all(text, '\\b\\d{{1,3}}\\.\\d{{1,3}}\\.\\d{{1,3}}\\.\\d{{1,3}}\\b')) AS BIGINT) AS pii_total,
           md5(regexp_replace(regexp_replace(regexp_replace(regexp_replace(text,
               '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{{2,}}', '<EMAIL>', 'g'),
               '\\b\\d{{3}}-\\d{{2}}-\\d{{4}}\\b', '<SSN>', 'g'),
               '\\b\\d{{3}}[-.]\\d{{3}}[-.]\\d{{4}}\\b', '<PHONE>', 'g'),
               '\\b\\d{{1,3}}\\.\\d{{1,3}}\\.\\d{{1,3}}\\.\\d{{1,3}}\\b', '<IPV4>', 'g')) AS redacted_digest
    FROM planted
    """,
    survey="ext: PII surface scan + redaction (email/SSN/phone/IPv4) — "
           "map-only regexp_count/regexp_replace pass, fixed redaction "
           "order; patterns restricted to the Java-regex ∩ RE2 dialect so "
           "the oracle runs them verbatim",
)
def text_pii(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _docs(spark, sf_dir).select("doc_id", F.expr(_PII_PLANT).alias("text"))
    return X.pii_scan(d).select(
        "doc_id", "n_email", "n_ssn", "n_phone", "n_ipv4", "pii_total",
        F.md5(F.col("pii_redacted")).alias("redacted_digest"),
    )


@register(
    "zz_text_strip_boilerplate",
    oracle="""
    WITH docs2 AS (
        SELECT doc_id,
               text || chr(10) || 'accept our cookies to continue'
                    || chr(10) || 'tail ' || CAST(doc_id AS VARCHAR) AS t
        FROM documents
    ), hp AS (
        SELECT DISTINCT doc_id, md5(trim(line)) AS h
        FROM (SELECT doc_id, unnest(string_split(t, chr(10))) AS line
              FROM docs2)
        WHERE trim(line) <> ''
    ), freq AS (
        SELECT h FROM hp GROUP BY h HAVING COUNT(*) >= 2
    ), b AS (
        SELECT coalesce(list(h), []) AS bad FROM freq
    ), kept AS (
        SELECT d.doc_id,
               list_filter(string_split(d.t, chr(10)),
                           x -> trim(x) = ''
                                OR NOT list_contains(b.bad, md5(trim(x))))
                   AS kl,
               len(string_split(d.t, chr(10))) AS n_all
        FROM docs2 d CROSS JOIN b
    )
    SELECT doc_id,
           array_to_string(kl, chr(10)) AS clean_text,
           CAST(n_all - len(kl) AS BIGINT) AS n_lines_removed
    FROM kept
    """,
    survey="ext: C4-style boilerplate-line REMOVAL (the surgery twin of "
           "the line_stats signal): lines in >= min_docs distinct docs "
           "cut from every document, order preserved, text never "
           "shuffles (per-doc offending-digest array + map-only "
           "rebuild); a shared cookie-banner line is planted identically "
           "on both sides since the synthetic docs are single-line",
)
def text_strip_boilerplate(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _docs(spark, sf_dir).withColumn(
        "text",
        F.concat(
            F.col("text"), F.lit("\naccept our cookies to continue\ntail "),
            F.col("doc_id").cast("string"),
        ),
    )
    return X.strip_boilerplate_lines(d, min_docs=2)


@register(
    "zz_text_boilerplate",
    oracle="""
    WITH lx AS (
        SELECT doc_id,
               list_distinct(list_filter(
                   list_transform(string_split(text, chr(10)), x -> trim(x)),
                   x -> x <> '')) AS lines
        FROM documents
    ), pairs AS (
        SELECT doc_id, unnest(lines) AS line FROM lx
    ), hp AS (
        SELECT doc_id, md5(line) AS h FROM pairs
    ), freq AS (
        SELECT h, COUNT(*) AS n_docs FROM hp GROUP BY h
    )
    SELECT p.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_lines,
           CAST(SUM(CASE WHEN f.n_docs >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_boiler_lines,
           CAST(SUM(CASE WHEN f.n_docs >= 2 THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*) AS boiler_frac
    FROM hp p JOIN freq f USING (h)
    GROUP BY p.doc_id
    """,
    survey="ext: C4-style cross-document boilerplate line stats — lines in "
           ">= k distinct docs are boilerplate; md5 line keys so shuffles "
           "move digests not text, per-doc de-dup map-side (the synthetic "
           "docs are single-line, so boilerplate here = exact-dup texts; "
           "multi-line behavior covered in tests/test_textops_extra.py)",
)
def text_boilerplate(spark: SparkSession, sf_dir: str) -> DataFrame:
    return X.line_stats(_docs(spark, sf_dir), min_docs=2)


@register(
    "zz_text_tfidf",
    oracle="""
    WITH toks AS (
        SELECT doc_id,
               unnest(string_split_regex(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')), '\\s+')) AS tok
        FROM documents WHERE trim(text) <> ''
    ), dt AS (
        SELECT doc_id, tok, COUNT(*) AS tf
        FROM toks WHERE tok <> '' GROUP BY doc_id, tok
    ), idf AS (
        SELECT tok, COUNT(*) AS doc_freq FROM dt GROUP BY tok
    ), n AS (
        SELECT COUNT(DISTINCT doc_id) AS nd FROM dt
    ), scored AS (
        SELECT dt.doc_id, dt.tok, dt.tf, idf.doc_freq,
               CAST(dt.tf * n.nd AS DOUBLE) / idf.doc_freq AS score
        FROM dt JOIN idf USING (tok) CROSS JOIN n
    )
    SELECT doc_id, tok AS token, CAST(tf AS BIGINT) AS tf,
           CAST(doc_freq AS BIGINT) AS doc_freq, score,
           CAST(rnk AS BIGINT) AS rank
    FROM (
        SELECT *, ROW_NUMBER() OVER (
            PARTITION BY doc_id ORDER BY score DESC, tok ASC) AS rnk
        FROM scored
    ) WHERE rnk <= 3
    """,
    survey="ext: tf-idf keyword extraction (top-k characteristic terms per "
           "doc) — exact-ratio score tf*N/doc_freq (one integer division, "
           "engine-bit-identical where log-idf would not be), per-doc "
           "top-k via WindowGroupLimit-pruned window",
)
def text_tfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    return X.top_tfidf_terms(_docs(spark, sf_dir), k=3)


@register(
    "zz_shuffle_order",
    oracle="""
    SELECT doc_id,
           CAST(ROW_NUMBER() OVER (
               ORDER BY substr(md5('sh0' || CAST(doc_id AS VARCHAR)), 1, 8),
                        doc_id) - 1 AS BIGINT) AS position
    FROM documents
    """,
    survey="ext: deterministic corpus shuffle order — dense global rank in "
           "md5(seed||key) order via the distributed two-phase prefix scan "
           "(range repartition + per-partition ranks + #partitions-row "
           "offset map), never a single-task global window",
)
def shuffle_order_entry(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators import packing as PK

    return PK.shuffle_order(_docs(spark, sf_dir).select("doc_id"))


@register(
    "zz_sample_token_budget",
    oracle="""
    WITH t AS (
        SELECT doc_id, lang,
               len(string_split_regex(trim(text), '\\s+')) AS n_tokens
        FROM documents
    ), tot AS (
        SELECT lang, SUM(n_tokens) AS tw FROM t GROUP BY lang
    ), r AS (
        SELECT lang, LEAST(1.0, 5000.0 / tw) AS rate,
               printf('%08x', LEAST(CAST(floor(LEAST(1.0, 5000.0 / tw)
                                          * 4294967296.0) AS BIGINT),
                                    4294967295)) AS thr
        FROM tot
    )
    -- rate >= 1.0 keeps the stratum in full (engine short-circuit)
    SELECT t.doc_id, t.lang, CAST(t.n_tokens AS BIGINT) AS n_tokens
    FROM t JOIN r USING (lang)
    WHERE r.rate >= 1.0 OR
          substr(md5('s0' || t.lang || '|' || CAST(t.doc_id AS VARCHAR)), 1, 8)
          < r.thr
    """,
    survey="ext: token-budget domain rebalance — per-stratum rate = "
           "min(1, budget/total tokens) from one partial-agg collect, then "
           "the map-only deterministic Bernoulli; the corpus-mix shaping "
           "step with an auditable rates report",
)
def sample_token_budget_entry(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators import packing as PK

    d = _docs(spark, sf_dir).select(
        "doc_id", "lang",
        X.token_count(F.col("text")).cast("long").alias("n_tokens"),
    )
    return PK.token_budget_sample(d, "lang", 5000.0)["sample"]


@register(
    "zz_dedup_spans_exact",
    oracle=r"""
    WITH toks AS (
        SELECT doc_id, string_split_regex(trim(text), '\s+') AS l
        FROM documents
    ), win AS (
        SELECT doc_id, unnest(list_transform(range(1, len(l) - 6), i ->
              struct_pack(pos := i - 1, w := array_to_string(l[i:i+7], ' ')))) AS s
        FROM toks WHERE len(l) >= 8
    ), flagged AS (
        SELECT doc_id, pos FROM (
            SELECT doc_id, s.pos AS pos,
                   COUNT(*) OVER (PARTITION BY s.w) AS cnt,
                   ROW_NUMBER() OVER (PARTITION BY s.w ORDER BY doc_id, s.pos) AS rn
            FROM win)
        WHERE cnt >= 2 AND rn >= 2
    ), tokpos AS (
        SELECT doc_id, unnest(list_transform(range(1, len(l) + 1), i ->
              struct_pack(p := i - 1, tok := l[i]))) AS s
        FROM toks
    ), kept AS (
        SELECT tp.doc_id, tp.s.p AS p, tp.s.tok AS tok
        FROM tokpos tp
        WHERE NOT EXISTS (SELECT 1 FROM flagged f
                          WHERE f.doc_id = tp.doc_id
                            AND tp.s.p BETWEEN f.pos AND f.pos + 7)
    ), clean AS (
        SELECT doc_id, string_agg(tok, ' ' ORDER BY p) AS clean_text,
               COUNT(*) AS nk
        FROM kept GROUP BY doc_id
    )
    SELECT t.doc_id,
           CAST(len(t.l) AS INT) AS n_tokens,
           CAST(len(t.l) - COALESCE(c.nk, 0) AS INT) AS n_tokens_dropped,
           COALESCE(c.clean_text, '') AS clean_text
    FROM toks t LEFT JOIN clean c USING (doc_id)
    """,
    survey="ext: span-level exact substring dedup — duplicated 8-token "
           "windows are cut out of the text (one global copy survives, "
           "keep-first by (doc_id, pos)), the token-window approximation "
           "of the Lee-et-al. suffix-array substring dedup; document-level "
           "dedup keeps/drops whole docs, this repairs them",
)
def text_dedup_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = D.remove_duplicated_spans(_docs(spark, sf_dir), n=8)
    return out.select("doc_id", "n_tokens", "n_tokens_dropped", "clean_text")


@register(
    "zz_text_lm_score",
    oracle=r"""
    WITH toks AS (
        SELECT doc_id,
               string_split_regex(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')), '\s+') AS l
        FROM documents WHERE trim(text) <> ''
    ), pr AS (
        SELECT doc_id, unnest(list_transform(range(1, len(l)), i ->
              struct_pack(u := l[i], v := l[i+1]))) AS s
        FROM toks WHERE len(l) >= 2
    ), big AS (
        SELECT doc_id, s.u AS u, s.v AS v, COUNT(*) AS c FROM pr GROUP BY 1, 2, 3
    ), bg AS (SELECT u, v, SUM(c) AS cuv FROM big GROUP BY u, v),
    ctx AS (SELECT u, SUM(c) AS cu FROM big GROUP BY u),
    scored AS (
        SELECT big.doc_id, big.c, bg.cuv, CAST(bg.cuv AS DOUBLE) / ctx.cu AS r
        FROM big JOIN bg USING (u, v) JOIN ctx USING (u)
    )
    SELECT doc_id,
           CAST(SUM(c) AS BIGINT) AS n_bigrams,
           CAST(SUM(CASE WHEN cuv = 1 THEN c ELSE 0 END) AS BIGINT) AS n_unique_bigrams,
           CAST(SUM(CAST(c * r AS DECIMAL(27,10))) AS DOUBLE) / SUM(c) AS avg_bigram_prob,
           MIN(r) AS min_bigram_prob
    FROM scored GROUP BY doc_id
    """,
    survey="ext: corpus-trained bigram-LM fluency score (CCNet-style "
           "perplexity filtering with the corpus as its own model) — "
           "tf-weighted mean/min conditional p(v|u), corpus-unique bigram "
           "count; exact-integer counts, one exact double division per "
           "bigram, decimal-accumulated mean (no ROUND(double) anywhere)",
)
def text_lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    return X.bigram_lm_scores(_docs(spark, sf_dir))


@register(
    "zz_text_chunks",
    oracle="""
    WITH t AS (
        SELECT doc_id, string_split_regex(trim(text), '\\s+') AS tk
        FROM documents WHERE trim(text) <> ''
    ), b AS (
        SELECT doc_id, tk, CAST(len(tk) AS BIGINT) AS n_tokens FROM t
    ), st AS (
        SELECT doc_id, n_tokens, tk,
               unnest(generate_series(0, greatest(0, n_tokens - 9), 24))
                   AS tok_start
        FROM b
    )
    SELECT doc_id,
           CAST(tok_start // 24 AS INT) AS chunk_index,
           CAST(tok_start AS BIGINT) AS tok_start,
           CAST(len(list_slice(tk, tok_start + 1, tok_start + 32)) AS BIGINT)
               AS chunk_n_tokens,
           n_tokens,
           array_to_string(list_slice(tk, tok_start + 1, tok_start + 32), ' ')
               AS chunk_text
    FROM st
    """,
    survey="ext: RAG/context-window chunking — fixed-size overlapping "
           "token windows (32-token chunks, 8-token overlap), minimal "
           "deterministic start set (a start exists iff the previous "
           "chunk was truncated by the doc end); one map-only "
           "tokenize→sequence→explode→slice pass, zero shuffles/UDFs",
)
def text_chunks_entry(spark: SparkSession, sf_dir: str) -> DataFrame:
    return X.chunk_documents(_docs(spark, sf_dir), chunk_tokens=32, overlap=8)


@register(
    "zz_text_scripts",
    oracle="""
    WITH c AS (
        SELECT doc_id,
           CAST(len(regexp_extract_all(text, '[A-Za-z\\x{00C0}-\\x{024F}]')) AS BIGINT) AS n_latin,
           CAST(len(regexp_extract_all(text, '[\\x{0400}-\\x{04FF}]')) AS BIGINT) AS n_cyrillic,
           CAST(len(regexp_extract_all(text, '[\\x{0370}-\\x{03FF}]')) AS BIGINT) AS n_greek,
           CAST(len(regexp_extract_all(text, '[\\x{0600}-\\x{06FF}]')) AS BIGINT) AS n_arabic,
           CAST(len(regexp_extract_all(text, '[\\x{0590}-\\x{05FF}]')) AS BIGINT) AS n_hebrew,
           CAST(len(regexp_extract_all(text, '[\\x{0900}-\\x{097F}]')) AS BIGINT) AS n_devanagari,
           CAST(len(regexp_extract_all(text, '[\\x{4E00}-\\x{9FFF}]')) AS BIGINT) AS n_han,
           CAST(len(regexp_extract_all(text, '[\\x{3040}-\\x{30FF}]')) AS BIGINT) AS n_kana,
           CAST(len(regexp_extract_all(text, '[\\x{AC00}-\\x{D7AF}]')) AS BIGINT) AS n_hangul
        FROM documents
    ), g AS (
        SELECT *,
           n_latin + n_cyrillic + n_greek + n_arabic + n_hebrew
             + n_devanagari + n_han + n_kana + n_hangul AS n_script_chars,
           greatest(n_latin, n_cyrillic, n_greek, n_arabic, n_hebrew,
                    n_devanagari, n_han, n_kana, n_hangul) AS m
        FROM c
    )
    SELECT doc_id, n_latin, n_cyrillic, n_greek, n_arabic, n_hebrew,
           n_devanagari, n_han, n_kana, n_hangul, n_script_chars,
           CASE WHEN m = 0 THEN 'none'
                WHEN n_latin = m THEN 'latin'
                WHEN n_cyrillic = m THEN 'cyrillic'
                WHEN n_greek = m THEN 'greek'
                WHEN n_arabic = m THEN 'arabic'
                WHEN n_hebrew = m THEN 'hebrew'
                WHEN n_devanagari = m THEN 'devanagari'
                WHEN n_han = m THEN 'han'
                WHEN n_kana = m THEN 'kana'
                ELSE 'hangul' END AS main_script,
           CASE WHEN m = 0 THEN NULL
                ELSE CAST(m AS DOUBLE) / n_script_chars END AS script_ratio
    FROM g
    """,
    survey="ext: unicode script profiling — per-doc script-block char "
           "histogram + dominant script (argmax, fixed tiebreak order), "
           "the router stage ahead of stopword language ID; one map-only "
           "regexp_count pass per block, zero shuffles (Java regex ∩ RE2 "
           "codepoint-range dialect for engine parity)",
)
def text_scripts_entry(spark: SparkSession, sf_dir: str) -> DataFrame:
    return X.script_profile(_docs(spark, sf_dir)).select(
        "doc_id", *[f"n_{n}" for n in X.SCRIPT_RANGES],
        "n_script_chars", "main_script", "script_ratio",
    )


@register(
    "zz_text_bm25",
    oracle="""
    WITH toks AS (
        SELECT doc_id,
               unnest(string_split_regex(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')), '\\s+')) AS tok
        FROM documents WHERE trim(text) <> ''
    ), pairs AS (
        SELECT doc_id, tok, COUNT(*) AS tf
        FROM toks WHERE tok <> '' GROUP BY doc_id, tok
    ), dl AS (
        SELECT doc_id, SUM(tf) AS dl FROM pairs GROUP BY doc_id
    ), stats AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n_docs, SUM(dl) AS sum_dl FROM dl
    ), dft AS (
        SELECT tok, CAST(COUNT(*) AS BIGINT) AS df_t FROM pairs
        WHERE tok IN ('merge', 'stream', 'window') GROUP BY tok
    ), scored AS (
        SELECT p.doc_id, dl.dl, p.tok,
               ((stats.n_docs - dft.df_t + 0.5) / (dft.df_t + 0.5))
               * ((p.tf * 2.2) / (p.tf + 1.2 * (0.25 + 0.75 * (dl.dl / (CAST(stats.sum_dl AS DOUBLE) / stats.n_docs)))))
                   AS score_t
        FROM pairs p
        JOIN dft ON p.tok = dft.tok
        JOIN dl ON p.doc_id = dl.doc_id
        CROSS JOIN stats
    ), wide AS (
        SELECT doc_id, CAST(dl AS BIGINT) AS dl,
               COALESCE(MAX(CASE WHEN tok = 'merge' THEN score_t END), 0.0) AS score_merge,
               COALESCE(MAX(CASE WHEN tok = 'stream' THEN score_t END), 0.0) AS score_stream,
               COALESCE(MAX(CASE WHEN tok = 'window' THEN score_t END), 0.0) AS score_window
        FROM scored GROUP BY doc_id, dl
    )
    SELECT doc_id, dl, score_merge, score_stream, score_window,
           (score_merge + score_stream) + score_window AS score,
           CAST(rnk AS BIGINT) AS rank
    FROM (
        SELECT *, ROW_NUMBER() OVER (
            ORDER BY (score_merge + score_stream) + score_window DESC,
                     doc_id ASC) AS rnk
        FROM wide
    ) WHERE rnk <= 10
    """,
    survey="ext: BM25 lexical retrieval (top-k docs for a bag-of-words "
           "query) — the sparse twin of the ANN ladder for hybrid search; "
           "rational idf (N-df+0.5)/(df+0.5) keeps every step a plain "
           "fixed-order IEEE expression (engine-bit-identical where libm "
           "log is not); per-term contributions pinned to columns, total "
           "= fixed-order sum, never a float groupBy-sum; plan = shared "
           "wordcount core + broadcast df/stats + TakeOrdered top-k",
)
def text_bm25(spark: SparkSession, sf_dir: str) -> DataFrame:
    return X.bm25_rank(_docs(spark, sf_dir), ["merge", "stream", "window"], k=10)


@register(
    "zz_sample_weighted",
    oracle="""
    WITH t AS (
        SELECT doc_id, CAST(LENGTH(text) AS DOUBLE) AS w,
               POWER((CAST(CONCAT('0x', SUBSTRING(md5(CONCAT('w0', CAST(doc_id AS VARCHAR))), 1, 8)) AS BIGINT) + 1.0) / 4294967296.0,
                     1.0 / CAST(LENGTH(text) AS DOUBLE)) AS es_key
        FROM documents WHERE LENGTH(text) > 0
    )
    SELECT doc_id, w,
           CAST(ROW_NUMBER() OVER (ORDER BY es_key DESC, doc_id ASC) AS BIGINT) AS sample_rank
    FROM t QUALIFY sample_rank <= 50
    """,
    survey="ext: weighted sampling without replacement (Efraimidis–"
           "Spirakis A-ES) — length-proportional corpus subset: "
           "u=(md5-hash+1)/2^32 per (seed,key), rank by u^(1/w), top-k; "
           "deterministic across runs/partitionings/engines (oracle "
           "verifies the SELECTED SET and ranks bit-equal in DuckDB on "
           "the driver data); map-only scoring + TakeOrderedAndProject, "
           "one scan, no shuffle — operators/sampling.py::"
           "weighted_sample_k",
)
def sample_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _docs(spark, sf_dir).select(
        "doc_id", F.length("text").cast("double").alias("w")
    )
    return SA.weighted_sample_k(d, 50, "w", "doc_id")


@register(
    "zz_emb_gram",
    oracle="""
    WITH m AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n,
               SUM(CAST(CAST(embedding[1] AS DOUBLE) AS DECIMAL(38,12))) AS s_0,
               SUM(CAST(CAST(embedding[2] AS DOUBLE) AS DECIMAL(38,12))) AS s_1,
               SUM(CAST(CAST(embedding[3] AS DOUBLE) AS DECIMAL(38,12))) AS s_2,
               SUM(CAST(CAST(embedding[1] AS DOUBLE) * CAST(embedding[1] AS DOUBLE) AS DECIMAL(38,12))) AS g_0_0,
               SUM(CAST(CAST(embedding[1] AS DOUBLE) * CAST(embedding[2] AS DOUBLE) AS DECIMAL(38,12))) AS g_0_1,
               SUM(CAST(CAST(embedding[1] AS DOUBLE) * CAST(embedding[3] AS DOUBLE) AS DECIMAL(38,12))) AS g_0_2,
               SUM(CAST(CAST(embedding[2] AS DOUBLE) * CAST(embedding[2] AS DOUBLE) AS DECIMAL(38,12))) AS g_1_1,
               SUM(CAST(CAST(embedding[2] AS DOUBLE) * CAST(embedding[3] AS DOUBLE) AS DECIMAL(38,12))) AS g_1_2,
               SUM(CAST(CAST(embedding[3] AS DOUBLE) * CAST(embedding[3] AS DOUBLE) AS DECIMAL(38,12))) AS g_2_2
        FROM embeddings WHERE embedding IS NOT NULL
    )
    SELECT CAST(0 AS INT) AS i, CAST(0 AS INT) AS j, n, CAST(g_0_0 AS DOUBLE) AS gram,
           CAST(g_0_0 AS DOUBLE) / n - (CAST(s_0 AS DOUBLE) / n) * (CAST(s_0 AS DOUBLE) / n) AS cov FROM m
    UNION ALL SELECT 0, 1, n, CAST(g_0_1 AS DOUBLE),
           CAST(g_0_1 AS DOUBLE) / n - (CAST(s_0 AS DOUBLE) / n) * (CAST(s_1 AS DOUBLE) / n) FROM m
    UNION ALL SELECT 0, 2, n, CAST(g_0_2 AS DOUBLE),
           CAST(g_0_2 AS DOUBLE) / n - (CAST(s_0 AS DOUBLE) / n) * (CAST(s_2 AS DOUBLE) / n) FROM m
    UNION ALL SELECT 1, 1, n, CAST(g_1_1 AS DOUBLE),
           CAST(g_1_1 AS DOUBLE) / n - (CAST(s_1 AS DOUBLE) / n) * (CAST(s_1 AS DOUBLE) / n) FROM m
    UNION ALL SELECT 1, 2, n, CAST(g_1_2 AS DOUBLE),
           CAST(g_1_2 AS DOUBLE) / n - (CAST(s_1 AS DOUBLE) / n) * (CAST(s_2 AS DOUBLE) / n) FROM m
    UNION ALL SELECT 2, 2, n, CAST(g_2_2 AS DOUBLE),
           CAST(g_2_2 AS DOUBLE) / n - (CAST(s_2 AS DOUBLE) / n) * (CAST(s_2 AS DOUBLE) / n) FROM m
    """,
    survey="ext: exact embedding Gram/covariance (audit path) — per-pair "
           "decimal-accumulated Σx_i·x_j over f64-promoted elements in "
           "ONE agg pass (bit-identical across partitionings/engines); "
           "the wide-d scale twin is the mapInPandas batched XᵀX inside "
           "whiten_embeddings (pytest: whitened covariance ≈ I) — "
           "operators/embstats.py",
)
def emb_gram(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.embstats import embedding_gram

    return embedding_gram(_emb(spark, sf_dir), [0, 1, 2])


@register(
    "zz_split_leakage_safe",
    # the contamination guard in composition: split on the CONTENT
    # fingerprint (md5 of normalized text), not the doc id, so exact
    # near-identical renderings can never straddle train/eval. The oracle
    # recomputes the same md5-threshold predicate and proves (a) identical
    # per-side doc/fingerprint counts and (b) ZERO fingerprints seen on
    # both sides — the invariant that makes the split decontaminated.
    oracle="""
    WITH f AS (
        SELECT doc_id,
               md5(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'))) AS fp
        FROM documents WHERE text IS NOT NULL
    ), tagged AS (
        SELECT doc_id, fp,
               CASE WHEN substr(md5('split0' || fp), 1, 8) < '028f5c28'
                    THEN 'eval' ELSE 'train' END AS side
        FROM f
    ), sides AS (
        SELECT side, CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(COUNT(DISTINCT fp) AS BIGINT) AS n_fingerprints
        FROM tagged GROUP BY side
    ), cross_side AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS c FROM (
            SELECT fp FROM tagged GROUP BY fp
            HAVING COUNT(DISTINCT side) > 1
        )
    )
    SELECT side, n_docs, n_fingerprints,
           (SELECT c FROM cross_side) AS cross_side_fingerprints
    FROM sides ORDER BY side
    """,
    survey="ext: leakage-safe (decontaminated) train/eval split — keyed "
           "on the content fingerprint so byte-different re-renderings of "
           "the same text land on the same side; map-only predicate, "
           "zero shuffle for the split itself; the oracle proves zero "
           "cross-side fingerprints",
)
def zz_split_leakage_safe_entry(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.sampling import split_train_eval
    from ..operators.text import fingerprint

    d = (
        _docs(spark, sf_dir)
        .filter(F.col("text").isNotNull())
        .withColumn("fp", fingerprint(F.col("text")))
    )
    train, ev = split_train_eval(d, "fp", eval_fraction=0.01, seed="split0")
    tagged = train.withColumn("side", F.lit("train")).unionByName(
        ev.withColumn("side", F.lit("eval")))
    sides = tagged.groupBy("side").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.count_distinct("fp").alias("n_fingerprints"),
    )
    cross = (
        tagged.groupBy("fp")
        .agg(F.count_distinct("side").alias("_s"))
        .filter(F.col("_s") > 1)
        .agg(F.count(F.lit(1)).alias("cross_side_fingerprints"))
    )
    return sides.crossJoin(F.broadcast(cross)).orderBy("side")


@register(
    "zz_emb_pca",
    oracle=None,  # eigendecomposition has no DuckDB twin; numpy-parity,
                  # orthonormality, and variance-capture are pytest-locked
                  # (tests/test_embstats.py::test_pca_project_matches_numpy)
    survey="ext: PCA dimensionality reduction for embeddings — one "
           "distributed pass fits mean+covariance (batched numpy Gram "
           "partials, O(d²) state), d×d eigenproblem on the driver, "
           "map-only projection per Arrow batch; the d→k compressor in "
           "front of ANN/clustering with measured variance loss — "
           "operators/embstats.py::pca_project",
)
def zz_emb_pca_entry(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.embstats import pca_project

    projected, model = pca_project(_emb(spark, sf_dir), k=8)
    spark_ = spark
    rows = [
        (i, float(model["explained_variance"][i]),
         float(model["explained_variance_ratio"][i]))
        for i in range(len(model["explained_variance"]))
    ]
    stats = projected.agg(
        F.count(F.lit(1)).alias("n"),
        F.count(F.when(F.col("pca").isNotNull(), 1)).alias("n_projected"),
    ).collect()[0]
    return spark_.createDataFrame(
        [(c, ev, r, int(stats["n"]), int(stats["n_projected"]))
         for c, ev, r in rows],
        "component int, explained_variance double, "
        "explained_variance_ratio double, n long, n_projected long",
    ).orderBy("component")


# --------------------------------------------------------------------------
# Round 7: containment dedup, BPE pair counts, length-bucketed batching
# --------------------------------------------------------------------------

@register(
    "zz_dedup_containment",
    oracle="""
    WITH toks AS (
        SELECT doc_id, string_split_regex(trim(text), '\\s+') AS l
        FROM documents
    ), sh AS (
        SELECT DISTINCT doc_id,
               unnest(list_transform(range(1, len(l) - 1),
                                     i -> l[i] || ' ' || l[i+1] || ' ' || l[i+2])) AS shingle
        FROM toks WHERE len(l) >= 3
    ), sizes AS (
        SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id
    ), live AS (
        SELECT shingle FROM sh GROUP BY shingle HAVING COUNT(*) <= 1000
    ), inter AS (
        SELECT a.doc_id AS a, b.doc_id AS b, COUNT(*) AS n_common
        FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        JOIN live l ON a.shingle = l.shingle
        GROUP BY a.doc_id, b.doc_id
    )
    SELECT a, b,
           CAST(n_common AS DOUBLE) / sa.n AS cont_a_in_b,
           CAST(n_common AS DOUBLE) / sb.n AS cont_b_in_a,
           CAST(n_common AS BIGINT) AS n_common
    FROM inter JOIN sizes sa ON inter.a = sa.doc_id
               JOIN sizes sb ON inter.b = sb.doc_id
    WHERE CAST(n_common AS DOUBLE) / sa.n >= 0.5
       OR CAST(n_common AS DOUBLE) / sb.n >= 0.5
    """,
    survey="ext: asymmetric shingle containment |A∩B|/|A| — the "
           "partial-copy/quotation detector Jaccard misses (Broder's "
           "resemblance-vs-containment split): a paragraph quoted inside "
           "a long page has tiny Jaccard but containment ~1; same capped "
           "inverted-index scale shape as the Jaccard entry",
)
def dedup_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _docs(spark, sf_dir).filter(F.size(X.tokens(F.col("text"))) >= 3)
    return D.containment_pairs(d, n=3, threshold=0.5, max_shingle_freq=1000)


@register(
    "zz_text_bpe_pairs",
    oracle="""
    WITH toks AS (
        SELECT doc_id,
               string_split_regex(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')), '\\s+') AS l
        FROM documents WHERE trim(text) <> ''
    ), p AS (
        SELECT doc_id, l[i] AS tok_a, l[i+1] AS tok_b
        FROM toks, unnest(range(1, len(l))) AS u(i)
        WHERE l[i] <> '' AND l[i+1] <> ''
    )
    SELECT tok_a, tok_b, CAST(COUNT(*) AS BIGINT) AS n_pairs,
           CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs
    FROM p GROUP BY tok_a, tok_b
    ORDER BY n_pairs DESC, tok_a, tok_b LIMIT 50
    """,
    survey="ext: BPE merge-round pair counting (Sennrich et al. "
           "vocabulary induction: adjacent symbol-pair frequencies, word "
           "level) — map-only zip_with pair explode over the let-bound "
           "token array, ONE partial-agg shuffle, TakeOrdered top-k; "
           "never a global sort",
)
def text_bpe_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return X.bpe_pair_counts(_docs(spark, sf_dir), k=50)


# Three full induction rounds in chained CTEs. The merge-application
# trick: a symbol sequence rendered as '|s1||s2||...|' (tokens are
# [a-z0-9</w>]+, never '|') makes one BPE merge a plain replace() of
# '|a||b|' with '|ab|' — left-to-right non-overlapping replacement IS
# the leftmost-greedy merge scan (a replaced occurrence consumes one
# bar of each flanking '||', leaving the string well-formed), the same
# argument that makes the Spark side's array fold exact. Shared by the
# distributed-loop entry AND the heap-trainer entry (same contract).
_BPE_3ROUND_ORACLE = """
    WITH words AS (
        SELECT w AS word, COUNT(*) AS freq FROM (
            SELECT unnest(string_split_regex(
                trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')),
                '\\s+')) AS w
            FROM documents WHERE trim(text) <> ''
        ) WHERE w <> '' GROUP BY 1
    ), s0 AS (
        SELECT '|' || array_to_string(
                   list_append(string_split(word, ''), '</w>'), '||') || '|' AS s,
               freq
        FROM words
    ), p1 AS (
        SELECT l[i] AS a, l[i+1] AS b, SUM(freq) AS n
        FROM (SELECT string_split(trim(s, '|'), '||') AS l, freq FROM s0),
             unnest(range(1, len(l))) AS u(i)
        GROUP BY 1, 2
    ), m1 AS (SELECT a, b, n FROM p1 ORDER BY n DESC, a, b LIMIT 1
    ), s1 AS (
        SELECT replace(s, '|' || m1.a || '||' || m1.b || '|',
                          '|' || m1.a || m1.b || '|') AS s, freq
        FROM s0, m1
    ), p2 AS (
        SELECT l[i] AS a, l[i+1] AS b, SUM(freq) AS n
        FROM (SELECT string_split(trim(s, '|'), '||') AS l, freq FROM s1),
             unnest(range(1, len(l))) AS u(i)
        GROUP BY 1, 2
    ), m2 AS (SELECT a, b, n FROM p2 ORDER BY n DESC, a, b LIMIT 1
    ), s2 AS (
        SELECT replace(s, '|' || m2.a || '||' || m2.b || '|',
                          '|' || m2.a || m2.b || '|') AS s, freq
        FROM s1, m2
    ), p3 AS (
        SELECT l[i] AS a, l[i+1] AS b, SUM(freq) AS n
        FROM (SELECT string_split(trim(s, '|'), '||') AS l, freq FROM s2),
             unnest(range(1, len(l))) AS u(i)
        GROUP BY 1, 2
    ), m3 AS (SELECT a, b, n FROM p3 ORDER BY n DESC, a, b LIMIT 1)
    SELECT * FROM (
        SELECT CAST(1 AS INT) AS merge_round, a AS tok_a, b AS tok_b,
               a || b AS merged, CAST(n AS BIGINT) AS n_pairs FROM m1
        UNION ALL
        SELECT CAST(2 AS INT), a, b, a || b, CAST(n AS BIGINT) FROM m2
        UNION ALL
        SELECT CAST(3 AS INT), a, b, a || b, CAST(n AS BIGINT) FROM m3
    ) ORDER BY merge_round
    """


def _merge_rows_frame(spark: SparkSession, out: dict) -> DataFrame:
    rows = [
        (i + 1, a, b, m, n) for i, (a, b, m, n) in enumerate(out["merges"])
    ]
    return spark.createDataFrame(
        rows, "merge_round int, tok_a string, tok_b string, "
              "merged string, n_pairs long",
    ).orderBy("merge_round")


@register(
    "zz_bpe_train_rounds",
    oracle=_BPE_3ROUND_ORACLE,
    survey="ext: full BPE vocabulary induction (Sennrich et al. 2016) — "
           "iterative merge training over the cached word-frequency symbol "
           "frame: per round ONE partial-agg shuffle (pair count), an O(1) "
           "argmax collect, and a map-only array-fold merge; the corpus is "
           "read exactly once. Entry returns the first three merges "
           "(pair, product, frequency-weighted count).",
)
def bpe_train_rounds(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _merge_rows_frame(
        spark, X.train_bpe(_docs(spark, sf_dir), num_merges=3))


@register(
    "bpe_train_heap",
    oracle=_BPE_3ROUND_ORACLE,
    survey="ext: BPE induction, collect-then-heap path — Spark does the "
           "ONE corpus-sized pass (word-frequency symbol frame, "
           "O(vocabulary)), then the classic lazy-max-heap trainer with "
           "incremental pair-count deltas runs the merge loop driver-side "
           "(32k merges in seconds vs one counting shuffle per round); "
           "bounded by max_driver_words with distributed fallback. Merge "
           "list bit-identical to the distributed loop (pytest property) "
           "and to the DuckDB chained-CTE recurrence (this oracle).",
)
def bpe_train_heap(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _merge_rows_frame(
        spark, X.train_bpe_heap(_docs(spark, sf_dir), num_merges=3))


def _bpe_encode_oracle(rounds: int, top_k: int) -> str:
    """Generated chained-CTE oracle: re-derive ``rounds`` BPE merges (the
    zz_bpe_train_rounds recurrence) then tokenize the corpus with them
    (the same wrapped-string replace = leftmost-greedy merge) and count
    token frequencies weighted by word frequency."""
    head = """
    WITH words AS (
        SELECT w AS word, COUNT(*) AS freq FROM (
            SELECT unnest(string_split_regex(
                trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')),
                '\\s+')) AS w
            FROM documents WHERE trim(text) <> ''
        ) WHERE w <> '' GROUP BY 1
    ), s0 AS (
        SELECT '|' || array_to_string(
                   list_append(string_split(word, ''), '</w>'), '||') || '|' AS s,
               freq
        FROM words
    )"""
    rounds_sql = []
    for k in range(1, rounds + 1):
        rounds_sql.append(f""", p{k} AS (
        SELECT l[i] AS a, l[i+1] AS b, SUM(freq) AS n
        FROM (SELECT string_split(trim(s, '|'), '||') AS l, freq FROM s{k - 1}),
             unnest(range(1, len(l))) AS u(i)
        GROUP BY 1, 2
    ), m{k} AS (SELECT a, b FROM p{k} ORDER BY n DESC, a, b LIMIT 1
    ), s{k} AS (
        SELECT replace(s, '|' || m{k}.a || '||' || m{k}.b || '|',
                          '|' || m{k}.a || m{k}.b || '|') AS s, freq
        FROM s{k - 1}, m{k}
    )""")
    tail = f""", tok AS (
        SELECT unnest(string_split(trim(s, '|'), '||')) AS token, freq
        FROM s{rounds}
    )
    SELECT token, CAST(SUM(freq) AS BIGINT) AS n_occurrences
    FROM tok GROUP BY token
    ORDER BY n_occurrences DESC, token LIMIT {top_k}
    """
    return head + "".join(rounds_sql) + tail


@register(
    "bpe_encode",
    oracle=_bpe_encode_oracle(rounds=10, top_k=20),
    survey="ext: BPE tokenization with a trained vocabulary — merges "
           "replayed in learned order per word (== training-time final "
           "symbols); JVM-side normalization/splitting, Arrow-batched "
           "mapInPandas replay over the GLOBAL distinct-word frame then "
           "a join back to word positions + posexplode (O(vocabulary) "
           "Python rows, not O(tokens)); the entry trains 10 merges via "
           "the heap trainer (ONE corpus pass instead of 10 counting "
           "shuffles; merges bit-identical to the distributed loop, "
           "Hypothesis-proven), encodes the corpus, and reports the "
           "top-20 token frequencies — oracle re-derives the merges AND "
           "the encoding in pure SQL",
)
def zz_bpe_encode_entry(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _docs(spark, sf_dir)
    merges = X.train_bpe_heap(d, num_merges=10)["merges"]
    enc = X.bpe_encode(d, merges)
    return (
        enc.groupBy("token")
        .agg(F.count(F.lit(1)).alias("n_occurrences"))
        .orderBy(F.desc("n_occurrences"), F.asc("token"))
        .limit(20)
    )


@register(
    "zz_length_buckets",
    oracle="""
    WITH t AS (
        SELECT len(string_split_regex(trim(text), '\\s+')) AS n_tokens
        FROM documents WHERE trim(text) <> ''
    ), b AS (
        SELECT CAST(length(bin(CAST(n_tokens AS BIGINT))) - 1 AS INT) AS bucket,
               COUNT(*) AS n_seqs, SUM(n_tokens) AS sum_len
        FROM t WHERE n_tokens > 0 GROUP BY 1
    )
    SELECT bucket,
           CAST(2 ** bucket AS BIGINT) AS bucket_lo,
           CAST(2 ** (bucket + 1) - 1 AS BIGINT) AS bucket_hi,
           CAST(n_seqs AS BIGINT) AS n_seqs,
           CAST(sum_len AS BIGINT) AS sum_len,
           CAST(GREATEST(FLOOR(8192 / (2 ** (bucket + 1) - 1)), 1) AS BIGINT) AS batch_size,
           CAST(CEIL(CAST(n_seqs AS DOUBLE)
                     / GREATEST(FLOOR(8192 / (2 ** (bucket + 1) - 1)), 1)) AS BIGINT) AS n_batches,
           1.0 - CAST(sum_len AS DOUBLE)
                 / CAST(n_seqs * (2 ** (bucket + 1) - 1) AS DOUBLE) AS pad_frac
    FROM b
    """,
    survey="ext: length-bucketed batching plan — power-of-two token-length "
           "buckets with per-bucket batch sizing against a fixed token "
           "budget and the padding-waste fraction (the bucketed-batching "
           "loader schedule); map-only integer log2 via binary bit length "
           "+ ONE partial-agg groupBy",
)
def length_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators import packing as PK

    d = _docs(spark, sf_dir).filter(F.trim(F.col("text")) != "").select(
        X.token_count(F.col("text")).cast("long").alias("n_tokens")
    )
    return PK.length_bucket_plan(d, "n_tokens", batch_tokens=8192)


@register(
    "zz_sim_mmr_rerank",
    oracle=None,  # inherently sequential greedy selection — no SQL twin;
                  # exactness vs the pure-python model locked in
                  # tests/test_dedup_similarity.py (deterministic output)
    survey="ext: MMR diversity rerank (Carbonell & Goldstein) over "
           "per-query candidate pools — the honest Pandas-path operator: "
           "applyInPandas per query group (pools are top-N-small by "
           "construction, queries parallelize across the cluster), "
           "vectorized numpy greedy inside one Arrow batch",
)
def sim_mmr_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _emb(spark, sf_dir)
    q = e.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    pool = S.cosine_topk_brute(e, q, k=20).join(
        e.select("vec_id", "embedding"), "vec_id"
    ).select("query_id", "vec_id", "embedding", "cosine")
    return S.mmr_rerank(pool, k=5, lam=0.7)


@register(
    "zz_text_hash_embed",
    oracle="""
    WITH toks AS (
        SELECT doc_id,
               unnest(string_split_regex(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')), '\\s+')) AS tok
        FROM documents WHERE trim(text) <> ''
    ), sgn AS (
        SELECT doc_id,
               CAST(CAST(CONCAT('0x', substr(md5(tok), 1, 8)) AS BIGINT) % 64 AS INT) AS b,
               1 - 2 * (CAST(CONCAT('0x', substr(md5(tok), 9, 1)) AS BIGINT) % 2) AS s
        FROM toks WHERE tok <> ''
    ), v AS (
        SELECT doc_id, b, CAST(SUM(s) AS DOUBLE) AS val
        FROM sgn GROUP BY doc_id, b
    ), n AS (
        SELECT doc_id, sqrt(SUM(val * val)) AS emb_norm FROM v GROUP BY doc_id
    )
    SELECT n.doc_id, n.emb_norm,
           COALESCE(MAX(CASE WHEN v.b = 0 THEN v.val END), 0) / n.emb_norm AS e0,
           COALESCE(MAX(CASE WHEN v.b = 1 THEN v.val END), 0) / n.emb_norm AS e1,
           COALESCE(MAX(CASE WHEN v.b = 2 THEN v.val END), 0) / n.emb_norm AS e2
    FROM n JOIN v ON n.doc_id = v.doc_id
    WHERE n.emb_norm > 0
    GROUP BY n.doc_id, n.emb_norm
    """,
    survey="ext: feature-hashing embeddings (hashing trick, Weinberger et "
           "al.) — md5-derived bucket + ±1 sign per token, signed tf per "
           "bucket, L2 normalize: model-free deterministic lexical "
           "vectors for similarity/RAG plumbing; map-only explode + one "
           "partial-agg shuffle + per-doc assembly",
)
def text_hash_embed(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = X.hash_embed(_docs(spark, sf_dir), d=64)
    return e.filter(F.col("emb_norm") > 0).select(
        "doc_id", "emb_norm",
        F.element_at("embedding", 1).alias("e0"),
        F.element_at("embedding", 2).alias("e1"),
        F.element_at("embedding", 3).alias("e2"),
    )


@register(
    "zz_rag_retrieval",
    oracle=None,  # end-to-end chain over engine-hash embeddings; each link
                  # is individually verified (chunking: zz_text_chunks;
                  # embeddings: zz_text_hash_embed; brute top-k:
                  # sim_cosine_topk; MMR: model-parity pytest) — the chain
                  # itself is deterministic, rows-only checked
    survey="ext: RAG retrieval chain — chunk (overlapping token windows) "
           "-> feature-hash embed -> brute cosine top-20 -> MMR "
           "diversity rerank to 5 contexts/query: the retrieve-for-"
           "context pipeline end-to-end, every stage the catalog "
           "verifies in isolation; swap ivf_topk for the brute pass at "
           "corpus scale",
)
def rag_retrieval(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir)
    chunks = X.chunk_documents(docs, chunk_tokens=64, overlap=16)
    # stable per-chunk key: doc_id * 1024 + chunk_index (chunk counts are
    # far below 1024 on any input this entry sees)
    emb = X.hash_embed(
        chunks.select(
            (F.col("doc_id") * 1024 + F.col("chunk_index")).alias("chunk_id"),
            F.col("chunk_text"),
        ),
        d=64, text_col="chunk_text", id_col="chunk_id",
    ).filter(F.col("emb_norm") > 0)
    queries = emb.filter(F.col("chunk_id") < 5 * 1024).select(
        F.col("chunk_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
    )
    pool = S.cosine_topk_brute(
        emb, queries, k=20, id_col="chunk_id"
    ).join(emb.select("chunk_id", "embedding"), "chunk_id").select(
        "query_id", "chunk_id", "embedding", "cosine"
    )
    return S.mmr_rerank(pool, k=5, lam=0.7, id_col="chunk_id")


@register(
    "zz_sim_pq_topk",
    oracle=None,  # KMeans codebooks are iterative (non-SQL); pooled ADC
    # recall + seeded-retrain reproducibility locked in
    # tests/test_dedup_similarity.py::test_pq_encode_and_adc_recall
    survey="ext: product-quantization ADC search (Jégou et al.) — the "
           "memory rung of the ANN ladder below int8: m-subspace codes "
           "(m bytes per vector vs 4·dim), per-query m×k lookup tables, "
           "candidates scored by table gathers without reconstruction "
           "(mapInPandas over the encoded table — the big side never "
           "shuffles), exact cosine rescore of the pooled heads",
)
def sim_pq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _emb(spark, sf_dir)
    books = S.pq_train(e, m=8, k=16)
    enc = S.pq_encode(e, books)
    # bounded driver collect: the QUERY set (5 rows), never candidates
    qrows = e.filter(F.col("vec_id") < 5).select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    ).collect()
    queries = [(int(r["vec_id"]), list(r["v"])) for r in qrows]
    pool = S.pq_topk(enc, books, queries, k=20)
    q = e.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
    )
    return S.rescore_topk(pool.select("query_id", "vec_id"), e, q, k=5)


@register(
    "zz_sim_ivfpq_topk",
    oracle=None,  # both quantizers are iterative KMeans (non-SQL); the
    # composition's recall-vs-IVF-alone and exact-scored-row-reduction
    # contracts are locked in
    # tests/test_dedup_similarity.py::test_ivfpq_recall_and_candidate_reduction
    survey="ext: IVFADC (Jégou et al. §IV) — the full ANN ladder "
           "composed: coarse IVF quantizer prunes to nprobe cells "
           "(partition-pruned read on the cell layout), PQ codes trained "
           "on RESIDUALS x−c(x) score the survivors by per-(query,cell) "
           "m×k lookup tables without reconstruction (mapInPandas, big "
           "side never shuffles), exact cosine rescore touches only the "
           "ADC shortlist — vs ivf_topk the exact stage shrinks from "
           "every-candidate-in-probed-cells to 4·k per query",
)
def sim_ivfpq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _emb(spark, sf_dir)
    # L2-normalize so residual-ADC (L2) ordering tracks the cosine
    # ordering the exact rescore uses — the standard cosine-ANN prep.
    # The norm is let-bound into its own column FIRST: inlining norm_expr
    # into the per-element lambda would re-evaluate the O(dim) fold per
    # element (the HOF re-evaluation trap — O(dim²) codegen per row)
    nrm = (
        e.select("vec_id", F.col("embedding").cast("array<double>").alias("_v"))
        .withColumn("_n", F.greatest(S.norm_expr(F.col("_v")), F.lit(1e-30)))
        .select(
            "vec_id",
            F.transform(F.col("_v"), lambda x: x / F.col("_n")).alias("embedding"),
        )
    )
    enc, cents, books = S.ivfpq_build(nrm, n_centroids=16, m=8, k=64)
    # bounded driver collect: the QUERY set (5 rows), never candidates
    qrows = nrm.filter(F.col("vec_id") < 5).collect()
    queries = [(int(r["vec_id"]), list(r["embedding"])) for r in qrows]
    pool = S.ivfpq_topk(enc, cents, books, queries, k=5, nprobe=4)
    q = e.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
    )
    return S.rescore_topk(pool.select("query_id", "vec_id"), e, q, k=5)


@register(
    "zz_hybrid_search_rrf",
    # rank-based fusion is a rational of small integers — engine-parity
    # exact where score-weighted fusion would be float-order-dependent;
    # the sparse branch reuses the zz_text_bm25 oracle shape (k=20), the
    # dense branch the sim_cosine_topk shape, fused by full outer join
    oracle="""
    WITH toks AS (
        SELECT doc_id,
               unnest(string_split_regex(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')), '\\s+')) AS tok
        FROM documents WHERE trim(text) <> ''
    ), pairs AS (
        SELECT doc_id, tok, COUNT(*) AS tf
        FROM toks WHERE tok <> '' GROUP BY doc_id, tok
    ), dl AS (
        SELECT doc_id, SUM(tf) AS dl FROM pairs GROUP BY doc_id
    ), stats AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n_docs, SUM(dl) AS sum_dl FROM dl
    ), dft AS (
        SELECT tok, CAST(COUNT(*) AS BIGINT) AS df_t FROM pairs
        WHERE tok IN ('merge', 'stream', 'window') GROUP BY tok
    ), scored AS (
        SELECT p.doc_id, p.tok,
               ((stats.n_docs - dft.df_t + 0.5) / (dft.df_t + 0.5))
               * ((p.tf * 2.2) / (p.tf + 1.2 * (0.25 + 0.75 * (dl.dl / (CAST(stats.sum_dl AS DOUBLE) / stats.n_docs)))))
                   AS score_t
        FROM pairs p
        JOIN dft ON p.tok = dft.tok
        JOIN dl ON p.doc_id = dl.doc_id
        CROSS JOIN stats
    ), sparse AS (
        SELECT doc_id, CAST(ROW_NUMBER() OVER (
            ORDER BY (COALESCE(MAX(CASE WHEN tok = 'merge' THEN score_t END), 0.0)
                      + COALESCE(MAX(CASE WHEN tok = 'stream' THEN score_t END), 0.0))
                     + COALESCE(MAX(CASE WHEN tok = 'window' THEN score_t END), 0.0) DESC,
                     doc_id ASC) AS BIGINT) AS rs
        FROM scored GROUP BY doc_id
        QUALIFY rs <= 20
    ), q AS (
        SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 0
    ), dense AS (
        SELECT vec_id AS doc_id, CAST(ROW_NUMBER() OVER (
            ORDER BY list_dot_product(e.embedding::DOUBLE[], q.qv)
                     / (sqrt(list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[]))
                        * sqrt(list_dot_product(q.qv, q.qv))) DESC,
                     vec_id ASC) AS BIGINT) AS rd
        FROM embeddings e, q WHERE e.vec_id <> 0
        QUALIFY rd <= 20
    ), fused AS (
        SELECT COALESCE(s.doc_id, d.doc_id) AS doc_id,
               COALESCE(s.rs, CAST(0 AS BIGINT)) AS rank_sparse,
               COALESCE(d.rd, CAST(0 AS BIGINT)) AS rank_dense,
               COALESCE(CAST(1 AS DOUBLE) / (60 + s.rs), CAST(0 AS DOUBLE))
               + COALESCE(CAST(1 AS DOUBLE) / (60 + d.rd), CAST(0 AS DOUBLE))
                   AS rrf_score
        FROM sparse s FULL OUTER JOIN dense d ON s.doc_id = d.doc_id
    )
    SELECT doc_id, rank_sparse, rank_dense, rrf_score,
           CAST(rnk AS INT) AS rank
    FROM (
        SELECT *, ROW_NUMBER() OVER (
            ORDER BY rrf_score DESC, doc_id ASC) AS rnk
        FROM fused
    ) WHERE rnk <= 10
    """,
    survey="ext: hybrid search via reciprocal-rank fusion (Cormack et "
           "al.) — BM25 sparse top-20 + exact-cosine dense top-20 fused "
           "as 1/(60+rank) sums (similarity.rrf_fuse): rank-based, so no "
           "score calibration across retrievers and engine-parity exact; "
           "fusion runs on the tiny top-k heads (full-outer join + "
           "bounded row_number), the retrieval stages keep their own "
           "scale shapes",
)
def hybrid_search_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    sparse = X.bm25_rank(
        _docs(spark, sf_dir), ["merge", "stream", "window"], k=20
    ).select("doc_id", "rank")
    e = _emb(spark, sf_dir)
    q = e.filter(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    dense = S.cosine_topk_brute(e, q, k=20).select(
        F.col("vec_id").alias("doc_id"), "rank"
    )
    return S.rrf_fuse([("sparse", sparse), ("dense", dense)], k=10)


@register(
    "text_pmi",
    oracle="""
    WITH toks AS (
        SELECT string_split_regex(trim(regexp_replace(lower(text),
                   '[^a-z0-9]+', ' ', 'g')), '\\s+') AS l
        FROM documents WHERE trim(text) <> ''
    ), bi_all AS (
        SELECT l[i] AS tok_a, l[i+1] AS tok_b, CAST(COUNT(*) AS BIGINT) AS n_pairs
        FROM toks, unnest(range(1, len(l))) AS u(i)
        WHERE l[i] <> '' AND l[i+1] <> ''
        GROUP BY 1, 2
    ), bi AS (
        SELECT * FROM bi_all WHERE n_pairs >= 5
    ), uni AS (
        SELECT t AS tok, CAST(COUNT(*) AS BIGINT) AS c
        FROM (SELECT unnest(l) AS t FROM toks) WHERE t <> '' GROUP BY 1
    ), n AS (SELECT SUM(n_pairs) AS total FROM bi_all)
    SELECT tok_a, tok_b, n_pairs,
           ca.c AS c_a, cb.c AS c_b,
           CAST(CAST(n_pairs AS DECIMAL(19,0)) * CAST(n.total AS DECIMAL(19,0)) AS DOUBLE)
           / CAST(CAST(ca.c AS DECIMAL(19,0)) * CAST(cb.c AS DECIMAL(19,0)) AS DOUBLE)
               AS pmi_ratio
    FROM bi JOIN uni ca ON bi.tok_a = ca.tok
            JOIN uni cb ON bi.tok_b = cb.tok, n
    ORDER BY pmi_ratio DESC, tok_a, tok_b LIMIT 50
    """,
    survey="ext: PMI collocation extraction (Church & Hanks 1990) — "
           "exp(PMI) as an exact-rational score (decimal products, one "
           "correctly-rounded double division; no libm log), min-count "
           "floor against the hapax-pair failure mode; one bigram "
           "partial-agg shuffle + one wordcount shuffle + two "
           "vocabulary-sized joins + TakeOrdered top-k",
)
def text_pmi(spark: SparkSession, sf_dir: str) -> DataFrame:
    return X.pmi_collocations(_docs(spark, sf_dir), k=50, min_count=5)


@register(
    "zz_sim_hard_negatives",
    oracle="""
    WITH anchors AS (
        SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv, label AS ql
        FROM embeddings WHERE vec_id < 3
    ), scored AS (
        SELECT a.query_id, e.vec_id, e.label,
               list_dot_product(e.embedding::DOUBLE[], a.qv)
               / (sqrt(list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[]))
                  * sqrt(list_dot_product(a.qv, a.qv))) AS cosine
        FROM embeddings e, anchors a
        WHERE e.label <> a.ql
    )
    SELECT query_id, vec_id, label, cosine, CAST(rnk AS INT) AS rank
    FROM (
        SELECT *, ROW_NUMBER() OVER (
            PARTITION BY query_id ORDER BY cosine DESC, vec_id) AS rnk
        FROM scored
    ) WHERE rnk <= 5
    """,
    survey="ext: hard-negative mining for contrastive training — per "
           "anchor the top-k most-cosine-similar DIFFERENT-label "
           "candidates (the near-misses that train embedding models); "
           "anchors broadcast, label-mismatch filtered map-side before "
           "scoring, WindowGroupLimit per-anchor top-k — candidates "
           "never shuffle",
)
def zz_sim_hard_negatives_entry(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.similarity import hard_negatives

    e = _emb(spark, sf_dir)
    anchors = e.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
        F.col("label").alias("query_label"),
    )
    return hard_negatives(e, anchors, k=5)


@register(
    "text_inverted_index",
    oracle="""
    WITH toks AS (
        SELECT doc_id,
               string_split_regex(trim(regexp_replace(lower(text),
                   '[^a-z0-9]+', ' ', 'g')), '\\s+') AS l
        FROM documents WHERE trim(text) <> ''
    ), pos AS (
        SELECT doc_id, l[i] AS token, CAST(i - 1 AS INT) AS p
        FROM toks, unnest(range(1, len(l) + 1)) AS u(i)
        WHERE l[i] <> ''
    ), postings AS (
        SELECT token, doc_id, CAST(COUNT(*) AS BIGINT) AS tf,
               list_sort(list(p)) AS positions
        FROM pos GROUP BY token, doc_id
    ), dfq AS (
        SELECT token, CAST(COUNT(*) AS BIGINT) AS doc_freq
        FROM postings GROUP BY token
    )
    SELECT p.token, p.doc_id, p.tf,
           array_to_string(p.positions, ' ') AS positions,
           d.doc_freq
    FROM postings p JOIN dfq d ON p.token = d.token
    """,
    survey="ext: positional inverted index (search-index export) — one "
           "posexplode + one partial-agg shuffle per (token, doc) "
           "posting with sorted 0-based positions, vocabulary-sized "
           "doc-frequency rollup joined back; the persisted artifact "
           "behind the BM25 ranker. Window entries must project flat "
           "scalars (the driver canonicalizer cannot sort list "
           "columns), so the positions array is serialized "
           "space-joined here; the operator keeps the real array.",
)
def text_inverted_index_entry(spark: SparkSession, sf_dir: str) -> DataFrame:
    idx = X.inverted_index(_docs(spark, sf_dir))
    return idx.select(
        "token", "doc_id", "tf",
        F.array_join(F.col("positions").cast("array<string>"), " ")
        .alias("positions"),
        "doc_freq",
    )


@register(
    "text_skipgrams",
    oracle="""
    WITH toks AS (
        SELECT string_split_regex(trim(regexp_replace(lower(text),
                   '[^a-z0-9]+', ' ', 'g')), '\\s+') AS l
        FROM documents WHERE trim(text) <> ''
    ), p AS (
        SELECT l[i] AS tok_a, l[i + d] AS tok_b, d
        FROM toks,
             unnest(range(1, len(l))) AS u(i),
             unnest([1, 2]) AS dd(d)
        WHERE i + d <= len(l) AND l[i] <> '' AND l[i + d] <> ''
    )
    SELECT tok_a, tok_b, CAST(d AS INT) AS dist,
           CAST(COUNT(*) AS BIGINT) AS n_pairs
    FROM p GROUP BY 1, 2, 3
    HAVING COUNT(*) >= 5
    """,
    survey="ext: skip-gram context-pair counts (word2vec/GloVe co-"
           "occurrence prep) — forward (t_i, t_{i+d}) pairs for d=1..w "
           "at the (pair, distance) grain; map-only shifted zip_with "
           "slices (no self-join, blowup exactly w), one partial-agg "
           "shuffle, exact integers. "
           "operators/text.py::skipgram_counts",
)
def zz_text_skipgrams_entry(spark: SparkSession, sf_dir: str) -> DataFrame:
    return X.skipgram_counts(_docs(spark, sf_dir), window=2, min_count=5)


@register(
    "eval_langid",
    # the language_id confusion SQL extended with the per-class metric
    # rollup; precision/recall/F1 are pinned double trees over exact
    # integer counts (NULL where the denominator is 0)
    oracle="""
    WITH scored AS (
        SELECT lang,
               len(regexp_extract_all(lower(text), '\\b(the|and|of|to|in|is)\\b')) AS s_en,
               len(regexp_extract_all(lower(text), '\\b(el|la|de|que|los|una)\\b')) AS s_es,
               len(regexp_extract_all(lower(text), '\\b(der|die|und|das|ist|nicht)\\b')) AS s_de,
               len(regexp_extract_all(lower(text), '\\b(le|la|et|les|des|est)\\b')) AS s_fr
        FROM documents
    ), guessed AS (
        SELECT lang,
               CASE WHEN greatest(s_en, s_es, s_de, s_fr) = 0 THEN 'und'
                    WHEN s_en = greatest(s_en, s_es, s_de, s_fr) THEN 'en'
                    WHEN s_es = greatest(s_en, s_es, s_de, s_fr) THEN 'es'
                    WHEN s_de = greatest(s_en, s_es, s_de, s_fr) THEN 'de'
                    ELSE 'fr' END AS p
        FROM scored
    ), conf AS (
        SELECT lang AS t, p, CAST(COUNT(*) AS BIGINT) AS n
        FROM guessed GROUP BY 1, 2
    ), tt AS (
        SELECT t AS cls, CAST(SUM(n) AS BIGINT) AS n_true FROM conf GROUP BY t
    ), pt AS (
        SELECT p AS cls, CAST(SUM(n) AS BIGINT) AS n_pred FROM conf GROUP BY p
    ), dg AS (
        SELECT t AS cls, n AS n_correct FROM conf WHERE t = p
    ), base AS (
        SELECT COALESCE(tt.cls, pt.cls) AS cls,
               COALESCE(n_true, 0) AS n_true,
               COALESCE(n_pred, 0) AS n_pred
        FROM tt FULL OUTER JOIN pt ON tt.cls = pt.cls
    ), b2 AS (
        SELECT base.cls, n_true, n_pred,
               COALESCE(dg.n_correct, 0) AS n_correct
        FROM base LEFT JOIN dg ON base.cls = dg.cls
    ), m AS (
        SELECT cls, n_true, n_pred, n_correct,
               CASE WHEN n_pred > 0
                    THEN CAST(n_correct AS DOUBLE) / CAST(n_pred AS DOUBLE)
               END AS "precision",
               CASE WHEN n_true > 0
                    THEN CAST(n_correct AS DOUBLE) / CAST(n_true AS DOUBLE)
               END AS recall
        FROM b2
    )
    SELECT cls, n_true, n_pred, n_correct, "precision", recall,
           CASE WHEN "precision" + recall > 0.0
                THEN (2.0 * "precision" * recall) / ("precision" + recall)
           END AS f1
    FROM m
    """,
    survey="ext: per-class classification report (precision/recall/F1 + "
           "supports) evaluating the language-ID heuristic against the "
           "labeled lang — one confusion-grain partial-agg shuffle, "
           "O(classes) rollup joins, pinned double metric trees. "
           "operators/profiling.py::classification_report",
)
def zz_eval_langid_entry(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.profiling import classification_report

    d = _docs(spark, sf_dir).select(
        "lang", X.language_guess(F.col("text")).alias("guessed"))
    return classification_report(d, "lang", "guessed")


@register(
    "eval_retrieval",
    # system under eval: the naive "longest doc containing the term"
    # contains-ranker (top 20 per query); qrels: docs where the term
    # occurs >= 2 times. MRR/hits@10/recall@10 are exact ints + one
    # correctly-rounded division each.
    oracle="""
    WITH q AS (
        SELECT unnest(['merge', 'stream', 'window']) AS query_id
    ), norm AS (
        SELECT doc_id, n_chars,
               string_split_regex(trim(regexp_replace(lower(text),
                   '[^a-z0-9]+', ' ', 'g')), '\\s+') AS l
        FROM documents
    ), results AS (
        SELECT query_id, doc_id, rank FROM (
            SELECT q.query_id, n.doc_id,
                   CAST(ROW_NUMBER() OVER (
                       PARTITION BY q.query_id
                       ORDER BY n.n_chars DESC, n.doc_id) AS BIGINT) AS rank
            FROM q JOIN norm n ON list_contains(n.l, q.query_id)
        ) WHERE rank <= 20
    ), qrels AS (
        SELECT q.query_id, n.doc_id
        FROM q JOIN norm n
          ON len(list_filter(n.l, x -> x = q.query_id)) >= 2
    ), rel AS (
        SELECT DISTINCT query_id, doc_id, 1 AS is_rel FROM qrels
    ), per_q AS (
        SELECT r.query_id,
               CAST(COUNT(*) AS BIGINT) AS n_returned,
               MIN(CASE WHEN rel.is_rel = 1 THEN r.rank END)
                   AS first_rel_rank,
               list_sort(list(r.rank) FILTER (
                   rel.is_rel = 1 AND r.rank <= 10)) AS hit_ranks
        FROM results r LEFT JOIN rel
          ON r.query_id = rel.query_id AND r.doc_id = rel.doc_id
        GROUP BY r.query_id
    ), nr AS (
        SELECT query_id, CAST(COUNT(DISTINCT doc_id) AS BIGINT)
                   AS n_relevant
        FROM qrels GROUP BY query_id
    )
    SELECT nr.query_id, nr.n_relevant,
           COALESCE(p.n_returned, 0) AS n_returned,
           p.first_rel_rank,
           CASE WHEN p.first_rel_rank IS NOT NULL
                THEN 1.0 / CAST(p.first_rel_rank AS DOUBLE)
                ELSE 0.0 END AS rr,
           CAST(len(COALESCE(p.hit_ranks, [])) AS BIGINT) AS hits_at_10,
           CAST(len(COALESCE(p.hit_ranks, [])) AS DOUBLE)
               / CAST(nr.n_relevant AS DOUBLE) AS recall_at_10,
           ROUND(
               list_reduce(
                   list_prepend(CAST(0.0 AS DOUBLE), list_transform(
                       COALESCE(p.hit_ranks, []),
                       x -> 1.0 / log2(CAST(x AS DOUBLE) + 1.0))),
                   (a, b) -> a + b)
               / list_reduce(
                   list_prepend(CAST(0.0 AS DOUBLE), list_transform(
                       generate_series(1, LEAST(nr.n_relevant, 10)),
                       x -> 1.0 / log2(CAST(x AS DOUBLE) + 1.0))),
                   (a, b) -> a + b),
               10) AS ndcg_at_10
    FROM nr LEFT JOIN per_q p ON nr.query_id = p.query_id
    """,
    survey="ext: per-query IR eval (MRR / hits@k / recall@k vs a qrels "
           "table) — the eval tail for the BM25/ANN/RRF stack; one "
           "(query, doc) equi-join + two partial-agg groupBys, every "
           "qrels query reported even when the system returns nothing. "
           "operators/similarity.py::retrieval_eval",
)
def zz_eval_retrieval_entry(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from ..operators.similarity import retrieval_eval
    from ..operators.text import normalize_text

    terms = ["merge", "stream", "window"]
    qdf = spark.createDataFrame([(t,) for t in terms], "query_id string")
    norm = _docs(spark, sf_dir).select(
        "doc_id", "n_chars",
        F.split(normalize_text(F.col("text")), r"\s+").alias("_l"))
    w = Window.partitionBy("query_id").orderBy(
        F.desc("n_chars"), F.asc("doc_id"))
    results = (
        qdf.join(norm, F.array_contains(F.col("_l"), F.col("query_id")))
        .withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= 20)
        .select("query_id", "doc_id", "rank")
    )
    qrels = qdf.join(
        norm,
        F.size(F.filter(F.col("_l"),
                        lambda x: x == F.col("query_id"))) >= 2,
    ).select("query_id", "doc_id")
    return retrieval_eval(results, qrels, k=10)


@register(
    "zz_text_compress_ratio",
    oracle=None,  # zlib has no SQL twin — rows-only at the gate; the
                  # behavioral contract (repetition < prose < noise,
                  # empty -> NULL) is pytest-pinned
    survey="ext: zlib compression-ratio quality signal (Gopher/FineWeb "
           "redundancy screen — catches long-range and approximate "
           "repetition the n-gram counters miss); Arrow-batched "
           "pandas_udf over UTF-8 bytes, map-only. "
           "operators/text.py::compression_ratio",
)
def zz_text_compress_ratio_entry(spark: SparkSession, sf_dir: str) -> DataFrame:
    return X.compression_ratio(_docs(spark, sf_dir))


@register(
    "text_homoglyphs",
    # translate-delete counting + md5 digests — all JVM/SQL built-ins;
    # the synthetic corpus is pure Latin so every count is exactly 0,
    # which both engines must agree on row-by-row (the REAL behavior is
    # pytest-pinned with Cyrillic/Greek cloaked duplicates)
    oracle="""
    SELECT doc_id,
           md5(text) AS raw_digest,
           md5(translate(text,
               'АВЕКМНОРСТХаеорсухΑΒΕΖΗΙΚΜΝΟΡΤΥΧον',
               'ABEKMHOPCTXaeopcyxABEZHIKMNOPTYXov')) AS skeleton_digest,
           CAST(length(text) - length(translate(text,
               'АВЕКМНОРСТХаеорсухΑΒΕΖΗΙΚΜΝΟΡΤΥΧον',
               '')) AS BIGINT) AS n_confusable_chars,
           (length(text) - length(translate(text,
               'АВЕКМНОРСТХаеорсухΑΒΕΖΗΙΚΜΝΟΡΤΥΧον',
               ''))) > 0 AS is_cloaked
    FROM documents
    """,
    survey="ext: homoglyph-cloaking screen (Unicode TR39 skeleton idea) "
           "— confusable Cyrillic/Greek glyphs mapped to their Latin "
           "skeleton by one JVM translate; skeleton digests group the "
           "cloaked duplicates exact dedup misses; map-only. "
           "operators/text.py::homoglyph_report",
)
def zz_text_homoglyphs_entry(spark: SparkSession, sf_dir: str) -> DataFrame:
    return X.homoglyph_report(_docs(spark, sf_dir))


@register(
    "zz_eval_rouge",
    # pairs = consecutive same-lang doc ids (candidate i vs reference
    # i+1) — ROUGE-2 between near-neighbors in the corpus ordering.
    # Clipped overlap and gram totals are exact integers; P/R/F1 are one
    # double division each (F1 via 2*o/(nc+nr) — algebraically 2PR/(P+R)).
    oracle="""
    WITH norm AS (
        SELECT doc_id, lang,
               string_split_regex(trim(regexp_replace(lower(text),
                   '[^a-z0-9]+', ' ', 'g')), '\\s+') AS l
        FROM documents WHERE trim(text) <> ''
    ), pairs AS (
        SELECT a.doc_id AS pair_id, a.l AS cl, b.l AS rl
        FROM norm a JOIN norm b
          ON b.doc_id = a.doc_id + 1 AND a.lang = b.lang
    ), cg AS (
        SELECT pair_id, array_to_string(cl[i:i+1], ' ') AS g,
               CAST(COUNT(*) AS BIGINT) AS cc
        FROM pairs, unnest(range(1, len(cl))) AS u(i)
        GROUP BY 1, 2
    ), rg AS (
        SELECT pair_id, array_to_string(rl[i:i+1], ' ') AS g,
               CAST(COUNT(*) AS BIGINT) AS cr
        FROM pairs, unnest(range(1, len(rl))) AS u(i)
        GROUP BY 1, 2
    ), j AS (
        SELECT COALESCE(cg.pair_id, rg.pair_id) AS pair_id,
               COALESCE(cc, 0) AS cc, COALESCE(cr, 0) AS cr
        FROM cg FULL OUTER JOIN rg
          ON cg.pair_id = rg.pair_id AND cg.g = rg.g
    ), per AS (
        SELECT pair_id,
               CAST(SUM(cc) AS BIGINT) AS n_cand,
               CAST(SUM(cr) AS BIGINT) AS n_ref,
               CAST(SUM(LEAST(cc, cr)) AS BIGINT) AS overlap
        FROM j GROUP BY pair_id
    )
    SELECT pair_id, n_cand, n_ref, overlap,
           CASE WHEN n_cand > 0 THEN CAST(overlap AS DOUBLE)
                / CAST(n_cand AS DOUBLE) END AS "precision",
           CASE WHEN n_ref > 0 THEN CAST(overlap AS DOUBLE)
                / CAST(n_ref AS DOUBLE) END AS recall,
           CASE WHEN n_cand + n_ref > 0 THEN 2.0 * CAST(overlap AS DOUBLE)
                / CAST(n_cand + n_ref AS DOUBLE) END AS f1
    FROM per
    """,
    survey="ext: ROUGE-N clipped n-gram overlap (precision/recall/F1) "
           "per (candidate, reference) pair — the generation/summariz"
           "ation eval staple and a paraphrase-vs-copy screen; map-only "
           "gram construction, one (pair, gram) partial-agg shuffle per "
           "side, full-join alignment, one pair-grain rollup. "
           "operators/text.py::rouge_n",
)
def zz_eval_rouge_entry(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.text import rouge_n

    d = _docs(spark, sf_dir).filter(F.trim(F.col("text")) != "")
    a = d.select(F.col("doc_id").alias("pair_id"), "lang",
                 F.col("text").alias("cand"))
    b = d.select((F.col("doc_id") - 1).alias("pair_id"), "lang",
                 F.col("text").alias("ref"))
    pairs = a.join(b, ["pair_id", "lang"])
    return rouge_n(pairs, "cand", "ref", n=2, id_col="pair_id")


@register(
    "zz_eval_blocking",
    # blocker = same (lang, n_chars DIV 64) bucket; truth = same
    # first-3-token prefix (the near-dup family proxy). All counts are
    # exact integers over DISTINCT ordered pairs; PC and RR are one
    # double division each.
    oracle="""
    WITH norm AS (
        SELECT doc_id, lang, n_chars,
               array_to_string((string_split_regex(trim(regexp_replace(
                   lower(text), '[^a-z0-9]+', ' ', 'g')),
                   '\\s+'))[1:3], ' ') AS pfx
        FROM documents WHERE trim(text) <> ''
    ), n AS (SELECT COUNT(*) AS nd FROM norm),
    truth AS (
        SELECT DISTINCT a.doc_id AS ia, b.doc_id AS ib
        FROM norm a JOIN norm b ON a.pfx = b.pfx AND a.doc_id < b.doc_id
    ), cand AS (
        SELECT DISTINCT a.doc_id AS ia, b.doc_id AS ib
        FROM norm a JOIN norm b
          ON a.lang = b.lang AND a.n_chars // 64 = b.n_chars // 64
         AND a.doc_id < b.doc_id
    ), agg AS (
        SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM cand) AS n_candidates,
               (SELECT CAST(COUNT(*) AS BIGINT) FROM truth) AS n_truth,
               (SELECT CAST(COUNT(*) AS BIGINT) FROM cand
                SEMI JOIN truth USING (ia, ib)) AS n_hits,
               (SELECT CAST(nd * (nd - 1) // 2 AS BIGINT) FROM n)
                   AS n_possible
    )
    SELECT n_candidates, n_truth, n_hits, n_possible,
           CASE WHEN n_truth > 0 THEN CAST(n_hits AS DOUBLE)
                / CAST(n_truth AS DOUBLE) END AS pair_completeness,
           1.0 - CAST(n_candidates AS DOUBLE)
               / CAST(n_possible AS DOUBLE) AS reduction_ratio
    FROM agg
    """,
    survey="ext: blocking-quality eval (pair completeness + reduction "
           "ratio vs labeled matches) for the record-linkage stack — "
           "grades the blocker that feeds match_scores; two distinct "
           "partial-aggs + one left-semi join at the pair grain, 1-row "
           "broadcast crossJoins. operators/joins.py::blocking_eval",
)
def zz_eval_blocking_entry(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.joins import blocking_eval
    from ..operators.text import normalize_text

    toks = F.split(normalize_text(F.col("text")), r"\s+")
    d = _docs(spark, sf_dir).filter(F.trim(F.col("text")) != "").select(
        "doc_id", "lang", "n_chars",
        F.concat_ws(" ", F.slice(toks, 1, 3)).alias("pfx"),
    )
    # lazy 1-row pair-space frame: unordered id_a < id_b self-dedup
    # space is n·(n−1)/2 (n·n would overstate the RR denominator >2×)
    possible = d.agg(
        F.expr("count(1) * (count(1) - 1) DIV 2").cast("long")
        .alias("n_possible"))
    a = d.select(F.col("doc_id").alias("id_a"), F.col("lang").alias("la"),
                 F.expr("n_chars DIV 64").alias("ba"),
                 F.col("pfx").alias("pa"))
    b = d.select(F.col("doc_id").alias("id_b"), F.col("lang").alias("lb"),
                 F.expr("n_chars DIV 64").alias("bb"),
                 F.col("pfx").alias("pb"))
    cand = a.join(
        b, (F.col("la") == F.col("lb")) & (F.col("ba") == F.col("bb"))
        & (F.col("id_a") < F.col("id_b"))).select("id_a", "id_b")
    truth = a.join(
        b, (F.col("pa") == F.col("pb"))
        & (F.col("id_a") < F.col("id_b"))).select("id_a", "id_b")
    return blocking_eval(cand, truth, n_possible=possible)


@register(
    "zz_dsir_weights",
    # target = English docs, raw = whole corpus. Buckets are
    # substr(md5(gram),1,3) (portable, bit-identical in both engines);
    # ln is the libm boundary, guarded by the sorted per-doc fold +
    # round 10dp (the nDCG/drift_psi precedent). DuckDB's log() is
    # log10 — ln() here.
    oracle="""
    WITH norm AS (
        SELECT doc_id, lang,
               list_filter(string_split_regex(trim(regexp_replace(
                   lower(text), '[^a-z0-9]+', ' ', 'g')), '\\s+'),
                   x -> x <> '') AS l
        FROM documents WHERE doc_id % 4 = 0
    ), db AS (
        SELECT doc_id, lang, substr(md5(l[i]), 1, 3) AS b
        FROM norm, unnest(range(1, len(l) + 1)) AS u(i)
        UNION ALL
        SELECT doc_id, lang, substr(md5(l[i] || ' ' || l[i + 1]), 1, 3) AS b
        FROM norm, unnest(range(1, len(l))) AS u(i)
    ), rm AS (
        SELECT b, CAST(COUNT(*) AS BIGINT) AS cr FROM db GROUP BY b
    ), tm AS (
        SELECT b, CAST(COUNT(*) AS BIGINT) AS ct FROM db
        WHERE lang = 'en' GROUP BY b
    ), m AS (
        SELECT COALESCE(rm.b, tm.b) AS b,
               ln((CAST(COALESCE(ct, 0) AS DOUBLE) + 1.0)
                  / (CAST((SELECT SUM(ct) FROM tm) AS DOUBLE) + 4096.0))
               - ln((CAST(COALESCE(cr, 0) AS DOUBLE) + 1.0)
                    / (CAST((SELECT SUM(cr) FROM rm) AS DOUBLE) + 4096.0))
                   AS lr
        FROM rm FULL OUTER JOIN tm ON rm.b = tm.b
    ), dc AS (
        SELECT doc_id, b, CAST(COUNT(*) AS BIGINT) AS c
        FROM db GROUP BY doc_id, b
    ), per AS (
        SELECT dc.doc_id, CAST(SUM(c) AS BIGINT) AS n_grams,
               list_sort(list(struct_pack(b := dc.b, c := c, lr := lr)))
                   AS terms
        FROM dc JOIN m ON dc.b = m.b
        GROUP BY dc.doc_id
    )
    SELECT doc_id, n_grams,
           ROUND(list_reduce(
               list_prepend(CAST(0.0 AS DOUBLE), list_transform(
                   terms, x -> CAST(x.c AS DOUBLE) * x.lr)),
               (a, t) -> a + t), 10) AS log_weight
    FROM per
    """,
    survey="ext: DSIR importance weights (Xie et al. 2023 data "
           "selection) — hashed uni+bigram multinomial log-likelihood "
           "ratio of a target-domain model vs the raw-corpus model, "
           "per document; bounded md5-prefix bucket space (16^3) so "
           "both model fits broadcast, per-doc sorted fold for engine "
           "parity; feeds sampling.weighted_sample_k for the resample "
           "step. operators/text.py::dsir_weights",
)
def zz_dsir_weights_entry(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.text import dsir_weights

    # deterministic quarter-sample fixture: md5 parity hashing is the
    # honest per-gram price of the oracle twin; the entry proves the
    # pipeline, it shouldn't dominate the bench (production uses
    # hash='xxhash64')
    d = _docs(spark, sf_dir).filter(F.col("doc_id") % 4 == 0)
    return dsir_weights(d, d.filter(F.col("lang") == "en"),
                        n=2, prefix_hex=3, alpha=1.0)


@register(
    "zz_text_fertility",
    oracle="""
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(len(string_split_regex(trim(text), '\\s+')))
               AS BIGINT) AS n_words,
           CAST(SUM(len(regexp_extract_all(text,
               '[A-Za-z]{1,4}|[0-9]|[^A-Za-z0-9\\s]'))) AS BIGINT)
               AS n_subwords,
           CAST(SUM(strlen(text)) AS BIGINT) AS n_bytes,
           CASE WHEN SUM(len(string_split_regex(trim(text), '\\s+'))) > 0
                THEN CAST(SUM(len(regexp_extract_all(text,
                         '[A-Za-z]{1,4}|[0-9]|[^A-Za-z0-9\\s]')))
                         AS DOUBLE)
                     / CAST(SUM(len(string_split_regex(trim(text),
                         '\\s+'))) AS DOUBLE) END AS fertility,
           CASE WHEN SUM(len(regexp_extract_all(text,
                    '[A-Za-z]{1,4}|[0-9]|[^A-Za-z0-9\\s]'))) > 0
                THEN CAST(SUM(strlen(text)) AS DOUBLE)
                     / CAST(SUM(len(regexp_extract_all(text,
                         '[A-Za-z]{1,4}|[0-9]|[^A-Za-z0-9\\s]')))
                         AS DOUBLE) END AS bytes_per_subword
    FROM documents
    WHERE text IS NOT NULL AND trim(text) <> ''
    GROUP BY lang
    """,
    survey="ext: per-language tokenizer fertility report (subwords/word, "
           "bytes/subword — the multilingual tokenizer-equity table) "
           "over the deterministic BPE-ish subword proxy; map-only "
           "counting + one group-grain partial-agg shuffle. "
           "operators/text.py::tokenizer_fertility",
)
def zz_text_fertility_entry(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.text import tokenizer_fertility

    return tokenizer_fertility(_docs(spark, sf_dir), "lang")


@register(
    "zz_curriculum_order",
    # NTILE arithmetic (rank*k DIV N) + md5 within-stage shuffle — all
    # exact integers and portable md5, so the full permutation is
    # bit-identical across engines and partitionings.
    oracle="""
    WITH d AS (
        SELECT doc_id, n_chars FROM documents WHERE n_chars IS NOT NULL
    ), r AS (
        SELECT doc_id, n_chars,
               ROW_NUMBER() OVER (ORDER BY n_chars, doc_id) - 1 AS rk,
               COUNT(*) OVER () AS n
        FROM d
    ), s AS (
        SELECT doc_id, n_chars, CAST(rk * 4 // n AS BIGINT) AS stage
        FROM r
    )
    SELECT doc_id, n_chars, stage,
           CAST(ROW_NUMBER() OVER (
               ORDER BY stage, md5('cur0' || CAST(doc_id AS VARCHAR)),
                        doc_id) - 1 AS BIGINT) AS position
    FROM s
    """,
    survey="ext: curriculum training order — equal-count difficulty "
           "stages (exact NTILE arithmetic over a distributed rank, "
           "never a single-task window) with a deterministic md5 "
           "shuffle inside each stage; two range shuffles total. "
           "operators/packing.py::curriculum_order",
)
def zz_curriculum_order_entry(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.packing import curriculum_order

    d = _docs(spark, sf_dir).select("doc_id", "n_chars")
    return curriculum_order(d, "n_chars", 4, key_col="doc_id", seed="cur0")


@register(
    "zz_mm_image_decode",
    # synthetic 32x32 PGM per doc: payload = first 1024 bytes of the
    # ASCII-sanitized text, space-padded. ASCII-only means char == byte,
    # so the oracle can fold code points; luma of a 1-channel image is
    # the raw payload, making luma_sum = Σ ascii(padded[i]) exactly.
    oracle="""
    WITH pad AS (
        SELECT doc_id,
               substr(rpad(regexp_replace(text, '[^ -~]', '', 'g'),
                           1024, ' '), 1, 1024) AS p
        FROM documents
    )
    SELECT doc_id, 'pnm' AS fmt, 32 AS width, 32 AS height,
           1 AS channels, CAST(1024 AS BIGINT) AS n_pixels,
           CAST(list_reduce(
               list_prepend(0, list_transform(range(1, 1025),
                   i -> ascii(p[i]))),
               (a, b) -> a + b) AS BIGINT) AS luma_sum
    FROM pad
    """,
    survey="ext: REAL image decode (pure numpy/stdlib codec: PPM/PGM, "
           "uncompressed BMP, 8-bit PNG incl. zlib inflate + scanline "
           "unfiltering) over Arrow-batched mapInPandas — exact-integer "
           "luma features oracle-checked byte-for-byte; the ahash64 "
           "perceptual fingerprint (image near-dup key) is pinned by "
           "pytest goldens. operators/multimodal.py::decode_images; "
           "functions/imagecodec.py",
)
def zz_mm_image_decode_entry(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators import multimodal as M2

    d = _docs(spark, sf_dir)
    ascii_only = F.regexp_replace("text", r"[^ -~]", "")
    payload = F.substring(F.rpad(ascii_only, 1024, " "), 1, 1024)
    media = d.select(
        "doc_id",
        F.concat(F.encode(F.lit("P5 32 32 255\n"), "UTF-8"),
                 F.encode(payload, "UTF-8")).alias("media"),
    )
    return M2.decode_images(media).select(
        "doc_id", "fmt", "width", "height", "channels",
        "n_pixels", "luma_sum")


@register(
    "zz_mm_audio_decode",
    # synthetic 8-bit PCM WAV per doc: payload = first 512 bytes of the
    # ASCII-sanitized text, space-padded; decode re-centers to
    # v = ascii(c) − 128. energy/peak are integer folds; zero-crossings
    # fold a (sign, flips) struct accumulator with zeros carrying the
    # previous sign — exactly the codec's convention.
    oracle="""
    WITH pad AS (
        SELECT doc_id,
               substr(rpad(regexp_replace(text, '[^ -~]', '', 'g'),
                           512, ' '), 1, 512) AS p
        FROM documents
    ), v AS (
        SELECT doc_id,
               list_transform(range(1, 513),
                   i -> ascii(p[i]) - 128) AS xs
        FROM pad
    )
    SELECT doc_id, 8000 AS sample_rate, 1 AS n_channels,
           CAST(512 AS BIGINT) AS n_frames,
           CAST(list_reduce(list_prepend(0, list_transform(
               xs, x -> x * x)), (a, b) -> a + b) AS BIGINT) AS energy,
           CAST(list_reduce(list_prepend(0, list_transform(
               xs, x -> abs(x))), (a, b) -> greatest(a, b)) AS INT)
               AS peak,
           CAST((list_reduce(
               list_prepend(struct_pack(s := 0, fl := 0),
                   list_transform(xs, x -> struct_pack(
                       s := CASE WHEN x > 0 THEN 1
                                 WHEN x < 0 THEN -1 ELSE 0 END,
                       fl := 0))),
               (a, x) -> struct_pack(
                   s := CASE WHEN x.s = 0 THEN a.s ELSE x.s END,
                   fl := a.fl + CASE WHEN a.s * x.s < 0
                                     THEN 1 ELSE 0 END))).fl
               AS BIGINT) AS zero_crossings
    FROM v
    """,
    survey="ext: REAL audio decode (pure numpy/stdlib RIFF/WAVE PCM "
           "codec, 8/16-bit) over Arrow-batched mapInPandas — exact-"
           "integer energy/peak/zero-crossing features oracle-checked "
           "sample-for-sample incl. the zero-carry sign convention. "
           "operators/multimodal.py::decode_audio; "
           "functions/wavcodec.py",
)
def zz_mm_audio_decode_entry(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators import multimodal as M2

    d = _docs(spark, sf_dir)
    ascii_only = F.regexp_replace("text", r"[^ -~]", "")
    payload = F.substring(F.rpad(ascii_only, 512, " "), 1, 512)
    # RIFF/WAVE header for 8-bit mono PCM @8000 Hz, 512-byte data chunk,
    # assembled JVM-side: fmt chunk fields are little-endian constants
    header = bytes(
        b"RIFF" + (4 + 8 + 16 + 8 + 512).to_bytes(4, "little") + b"WAVE"
        + b"fmt " + (16).to_bytes(4, "little")
        + (1).to_bytes(2, "little") + (1).to_bytes(2, "little")
        + (8000).to_bytes(4, "little") + (8000).to_bytes(4, "little")
        + (1).to_bytes(2, "little") + (8).to_bytes(2, "little")
        + b"data" + (512).to_bytes(4, "little")
    )
    media = d.select(
        "doc_id",
        F.concat(F.lit(header), F.encode(payload, "UTF-8")).alias("media"),
    )
    return M2.decode_audio(media).select(
        "doc_id", "sample_rate", "n_channels", "n_frames",
        "energy", "peak", "zero_crossings")


@register(
    "zz_dedup_minhash_portable",
    # The SAME MinHash+LSH algorithm as operators/dedup.py (K min-hash
    # values per doc over distinct 3-word shingles, banded equality
    # buckets, candidate pairs a<b) run with a PORTABLE hash family —
    # string-min over substr(md5(seed:shingle),1,16) and md5 band
    # signatures — so the full pipeline is oracle-checkable bit-for-bit
    # (the production path keeps xxhash64 for JVM speed; its banding
    # layout is pinned by pytest instead).
    oracle="""
    WITH norm AS (
        SELECT doc_id,
               list_filter(string_split_regex(trim(regexp_replace(
                   lower(text), '[^a-z0-9]+', ' ', 'g')), '\\s+'),
                   x -> x <> '') AS l
        FROM documents
    ), sh AS (
        SELECT DISTINCT doc_id, array_to_string(l[i:i+2], ' ') AS s
        FROM norm, unnest(range(1, len(l) - 1)) AS u(i)
        WHERE len(l) >= 3
    ), mh AS (
        SELECT doc_id, k,
               MIN(substr(md5(CAST(k AS VARCHAR) || ':' || s), 1, 16))
                   AS m
        FROM sh, unnest(range(0, 16)) AS ks(k)
        GROUP BY doc_id, k
    ), band AS (
        SELECT doc_id, CAST(k // 4 AS INT) AS band,
               md5(string_agg(m, '|' ORDER BY k)) AS sig
        FROM mh GROUP BY doc_id, k // 4
    )
    SELECT DISTINCT a.doc_id AS a, b.doc_id AS b
    FROM band a JOIN band b
      ON a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id
    """,
    survey="ext: MinHash+LSH near-dup candidate generation with a "
           "portable hash family (md5-prefix string-min signatures, "
           "md5 band buckets) — the dedup.py algorithm made oracle-"
           "checkable end-to-end: shingle -> 16-hash signature -> 4 "
           "equality-bucket bands -> a<b distinct pairs, never an "
           "all-pairs compare. Production minhash keeps xxhash64; "
           "this entry proves the ALGORITHM against an independent "
           "engine. operators/dedup.py:238",
)
def zz_dedup_minhash_portable_entry(
        spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.text import normalize_text

    from ..io import spread_scan

    toks = F.filter(F.split(normalize_text(F.col("text")), r"\s+"),
                    lambda x: x != "")
    # spread_scan (guide §6 scan-parallelism floor): the single-row-group
    # parquet scans as ONE task, and the heavy stage here — shingle
    # explode + the 16x md5-min partial SortAggregate — runs map-side
    # BEFORE the doc_id exchange, i.e. serially without the spread.
    # Interleaved same-JVM A/B at sf0.1: 3.34 -> 1.27 s median,
    # md5-identical pairs. (The self-join's duplicated subtree is NOT a
    # cost: ReuseExchange already dedups the identical shuffle — an
    # explicit banded.cache() A/B'd a wash and was dropped.)
    d = spread_scan(_docs(spark, sf_dir).select("doc_id", "text"))
    d = d.select("doc_id", toks.alias("_l"))
    d = d.filter(F.size("_l") >= 3)
    # array_distinct dedups shingles within each doc, so (doc_id, s)
    # rows are already unique — no distinct shuffle needed
    sh = d.select(
        "doc_id",
        F.explode(F.array_distinct(F.transform(
            F.sequence(F.lit(1), F.size("_l") - 2),
            lambda i: F.concat_ws(" ", F.slice("_l", i, 3))))).alias("s"))
    mins = sh.groupBy("doc_id").agg(*[
        F.min(F.substring(
            F.md5(F.concat(F.lit(f"{k}:"), F.col("s"))), 1, 16))
        .alias(f"mh_{k}")
        for k in range(16)
    ])
    band_exprs = [
        F.struct(
            F.lit(bi).cast("int").alias("band"),
            F.md5(F.concat_ws(
                "|", *[F.col(f"mh_{bi * 4 + r}") for r in range(4)]))
            .alias("sig"),
        )
        for bi in range(4)
    ]
    banded = mins.select(
        "doc_id", F.explode(F.array(*band_exprs)).alias("bk")
    ).select("doc_id", F.col("bk.band").alias("band"),
             F.col("bk.sig").alias("sig"))
    a = banded.select(F.col("doc_id").alias("a"), "band", "sig")
    b = banded.select(F.col("doc_id").alias("b"), "band", "sig")
    return (
        a.join(b, ["band", "sig"])
        .filter(F.col("a") < F.col("b"))
        .select("a", "b").distinct()
    )


@register(
    "zz_dedup_simhash_portable",
    # The SimHash construction (tf-weighted ±1 bit votes over token
    # hashes, sign-packed) with a portable 16-bit hash: the first 4 hex
    # chars of md5(token), nibbles decoded via strpos on the hex
    # alphabet — every step exact integer arithmetic in both engines.
    # Production simhash (dedup.py) keeps xxhash64/64-bit.
    oracle="""
    WITH norm AS (
        SELECT doc_id,
               list_filter(string_split_regex(trim(regexp_replace(
                   lower(text), '[^a-z0-9]+', ' ', 'g')), '\\s+'),
                   x -> x <> '') AS l
        FROM documents
    ), tf AS (
        SELECT doc_id, t, CAST(COUNT(*) AS BIGINT) AS c
        FROM norm, unnest(l) AS u(t)
        GROUP BY doc_id, t
    ), bits AS (
        SELECT doc_id, j,
               SUM(c * (2 * ((strpos('0123456789abcdef',
                       substr(md5(t), (j // 4) + 1, 1)) - 1)
                   // CAST(pow(2, 3 - (j % 4)) AS BIGINT) % 2) - 1))
                   AS vote
        FROM tf, unnest(range(0, 16)) AS js(j)
        GROUP BY doc_id, j
    )
    SELECT doc_id,
           CAST(SUM(CASE WHEN vote > 0
                THEN CAST(pow(2, 15 - j) AS BIGINT) ELSE 0 END)
               AS BIGINT) AS simhash16
    FROM bits GROUP BY doc_id
    """,
    survey="ext: SimHash fingerprint with a portable 16-bit hash family "
           "(md5 nibbles, tf-weighted ±1 votes, sign-packed) — the "
           "dedup.py construction proven exact against an independent "
           "engine; one token-grain partial agg + one (doc, bit) "
           "partial agg, all integer arithmetic. operators/dedup.py",
)
def zz_dedup_simhash_portable_entry(
        spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.text import normalize_text

    toks = F.filter(F.split(normalize_text(F.col("text")), r"\s+"),
                    lambda x: x != "")
    tf = (
        _docs(spark, sf_dir).select("doc_id", F.explode(toks).alias("t"))
        .groupBy("doc_id", "t")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    bit = F.expr(
        "(instr('0123456789abcdef', substr(md5(t), CAST(j DIV 4 AS INT)"
        " + 1, 1)) - 1) DIV CAST(pow(2, 3 - j % 4) AS BIGINT) % 2")
    votes = (
        tf.select("doc_id", "t", "c",
                  F.explode(F.sequence(F.lit(0), F.lit(15))).alias("j"))
        .groupBy("doc_id", "j")
        .agg(F.sum(F.col("c") * (F.lit(2) * bit - 1)).alias("vote"))
    )
    return votes.groupBy("doc_id").agg(
        F.sum(F.when(F.col("vote") > 0,
                     F.expr("CAST(pow(2, 15 - j) AS BIGINT)"))
              .otherwise(F.lit(0))).cast("long").alias("simhash16"))


@register(
    "zz_mm_gif_frames",
    # synthetic 4-frame 8x8 GIF per doc: indices = ascii(padded text
    # byte) % 128 over a grayscale palette v -> (v,v,v), whose integer
    # BT.601 luma is exactly v ((77+150+29)*v >> 8 = v). The GIF bytes
    # are LZW-encoded in an Arrow UDF (not SQL-expressible), but the
    # DECODED per-frame luma sums are pure functions of the text —
    # the oracle folds them straight from code points. Frames are kept
    # small (64 px) because LZW decode is a per-code Python loop — the
    # entry proves the codec, it shouldn't dominate the bench.
    oracle="""
    WITH pad AS (
        SELECT doc_id,
               substr(rpad(regexp_replace(text, '[^ -~]', '', 'g'),
                           256, ' '), 1, 256) AS p
        FROM documents
    )
    SELECT doc_id, CAST(f AS INT) AS frame_index,
           4 AS n_frames_total, 8 AS width, 8 AS height,
           CAST(list_reduce(
               list_prepend(0, list_transform(range(1, 65),
                   i -> ascii(p[CAST(f * 64 + i AS INT)]) % 128)),
               (a, b) -> a + b) AS BIGINT) AS luma_sum
    FROM pad, unnest(range(0, 4)) AS fs(f)
    """,
    survey="ext: REAL multi-frame GIF decode (pure-Python LZW in "
           "functions/gifcodec.py, validated against a real compressor's "
           "streams) behind the video-shaped frame-sampling fan-out — "
           "per-frame exact-integer luma oracle-checked code-point-for-"
           "code-point; per-frame ahash64 (static/looping-video screen) "
           "pinned by pytest. operators/multimodal.py::sample_frames_real",
)
def zz_mm_gif_frames_entry(spark: SparkSession, sf_dir: str) -> DataFrame:
    from collections.abc import Iterator

    import pandas as pd

    from ..operators import multimodal as M2

    d = _docs(spark, sf_dir)
    ascii_only = F.regexp_replace("text", r"[^ -~]", "")
    payload = F.substring(F.rpad(ascii_only, 256, " "), 1, 256)
    src = d.select("doc_id", F.encode(payload, "UTF-8").alias("p"))

    def to_gif(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        from ..functions.gifcodec import encode_gif

        pal = np.stack([np.arange(128)] * 3, axis=1).astype(np.uint8)
        for pdf in batches:
            media = []
            for blob in pdf["p"]:
                idx = (np.frombuffer(bytes(blob), np.uint8) % 128)
                frames = [idx[f * 64:(f + 1) * 64].reshape(8, 8)
                          for f in range(4)]
                media.append(encode_gif(frames, pal))
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "media": media})

    # the pure-Python LZW encode+decode chain is the entry's entire cost
    # and sits before any exchange — a single-row-group scan would run
    # it all in ONE task (guide §6 parallelism floor); no-op at real scale
    from ..io import spread_scan

    gifs = spread_scan(src).mapInPandas(
        to_gif, schema="doc_id BIGINT, media BINARY")
    return M2.sample_frames_real(gifs, n_frames=4).select(
        "doc_id", "frame_index", "n_frames_total", "width", "height",
        "luma_sum")
