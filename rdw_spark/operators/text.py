"""Text-analysis operators for large-scale training-data pipelines.

All of these are pure column expressions (JVM-side, whole-stage-codegen) —
no Python UDFs in the hot path. At 100 TB each is a single map-only pass
over the documents table: no shuffle, fully parallel, pushdown-friendly.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Small per-language stopword anchor sets for the n-gram/stopword-voting
# language heuristic. Counting uses \b word boundaries so token duplication
# counts proportionally (frequency evidence, not set membership).
LANG_STOPWORDS = {
    "en": ["the", "and", "of", "to", "in", "is"],
    "es": ["el", "la", "de", "que", "los", "una"],
    "de": ["der", "die", "und", "das", "ist", "nicht"],
    "fr": ["le", "la", "et", "les", "des", "est"],
}


def tokens(text: Column) -> Column:
    """Whitespace tokenization (the cheap baseline counter)."""
    return F.split(F.trim(text), r"\s+")


def token_count(text: Column) -> Column:
    return F.size(tokens(text))


def subword_count(text: Column) -> Column:
    """BPE-ish token estimate: alpha runs are split into <=4-char chunks,
    digits and punctuation count one each — a deterministic regex
    approximation of subword tokenizer output size."""
    return F.size(F.regexp_extract_all(text, F.lit(r"[A-Za-z]{1,4}|[0-9]|[^A-Za-z0-9\s]"), 0))


def stopword_hits(text_lower: Column, words: list[str]) -> Column:
    pat = r"\b(" + "|".join(words) + r")\b"
    return F.size(F.regexp_extract_all(text_lower, F.lit(pat), 0))


def language_scores(text: Column) -> dict[str, Column]:
    lower = F.lower(text)
    return {lang: stopword_hits(lower, words) for lang, words in LANG_STOPWORDS.items()}


def language_guess(text: Column) -> Column:
    """Deterministic argmax over the stopword votes (ties broken by the
    fixed en>es>de>fr order); 'und' (undetermined) when no votes at all."""
    s = language_scores(text)
    best = F.greatest(*s.values())
    out = F.lit("und")
    for lang in reversed(list(LANG_STOPWORDS)):  # earlier langs win ties
        out = F.when(s[lang] == best, F.lit(lang)).otherwise(out)
    return F.when(best == 0, F.lit("und")).otherwise(out)


def quality_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Length / punctuation / stopword quality signals per document
    (the standard pre-training quality-filter feature set)."""
    t = F.col(text_col)
    n_chars = F.length(t)
    n_tok = token_count(t)
    n_punct = F.size(F.regexp_extract_all(t, F.lit(r"[.,!?;:]"), 0))
    n_alpha = F.size(F.regexp_extract_all(t, F.lit(r"[A-Za-z]"), 0))
    n_stop = stopword_hits(F.lower(t), LANG_STOPWORDS["en"])
    return df.select(
        "*",
        # long, not int: lines the declared type up with the oracle's
        # BIGINT length()/len() so typed schema compares are clean
        n_chars.cast("long").alias("q_n_chars"),
        n_tok.cast("long").alias("q_n_tokens"),
        (n_chars.cast("double") / n_tok).alias("q_avg_token_len"),
        (n_punct.cast("double") / n_chars).alias("q_punct_ratio"),
        (n_alpha.cast("double") / n_chars).alias("q_alpha_ratio"),
        (n_stop.cast("double") / n_tok).alias("q_stopword_ratio"),
    )


def let_bind(value: Column, body) -> Column:
    """Let-binding via single-element-array + transform: evaluate
    ``value`` ONCE per row and pass it to ``body`` as a lambda variable.

    Higher-order functions are interpreted (CodegenFallback), so a
    nested expression like ``transform(sequence(1, n), i -> f(slice(t,
    i, k)))`` re-evaluates the whole ``t`` subtree for EVERY element —
    O(grams) tokenizations per document (measured ~5x on the dsir/rouge
    gram stages at sf0.1). Separate projections don't help because
    CollapseProject inlines them right back; routing the value through
    a lambda variable is the one structure the optimizer keeps."""
    return F.element_at(F.transform(F.array(value), body), 1)


def normalize_text(text: Column) -> Column:
    """Canonical form for fingerprinting: lowercase, collapse every
    non-alphanumeric run to a single space, trim."""
    return F.trim(F.regexp_replace(F.lower(text), r"[^a-z0-9]+", " "))


def fingerprint(text: Column) -> Column:
    """Document fingerprint = md5 of the normalized text (the reference
    dedups payloads by md5 digest — docs/API.md:263, docs/Monitoring.md:448)."""
    return F.md5(normalize_text(text))


def winnowing_fingerprints(
    df: DataFrame,
    n: int = 3,
    window: int = 4,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Winnowing document fingerprints (Schleimer/Wilkerson/Aiken, the MOSS
    rolling-hash scheme): hash every word n-gram, slide a window of
    ``window`` consecutive hashes, keep each window's minimum — the
    guaranteed-coverage sparse fingerprint set (any shared run of
    window+n-1 tokens yields a shared fingerprint, so local plagiarism /
    near-dup overlap is detectable from a ~1/window-size sample of the
    grams).

    One map-only pass of array expressions — no shuffle, no UDF; the hash
    is the first 8 hex chars of md5 so the DuckDB oracle computes the
    identical value. Returns (id, fingerprint) exploded pairs; docs
    shorter than n + window - 1 tokens yield none."""
    # Let-binding via single-element-array + transform: a NESTED expression
    # (window mins referencing the hash array referencing the token array)
    # is re-evaluated for every element of the outer transform — O(grams²)
    # md5 calls per document, measured ~100× slower at sf0.1. (Separate
    # projections don't help: ProjectCollapsing inlines them right back.)
    # Wrapping each intermediate in F.array(..) and referencing it through
    # the lambda VARIABLE makes Spark evaluate it once per row.
    def let(value, body):
        return F.element_at(F.transform(F.array(value), body), 1)

    tok = tokens(F.col(text_col))

    def hashes(t):
        return F.transform(
            F.sequence(F.lit(0), F.size(t) - n),
            lambda i: F.substring(
                F.md5(F.concat_ws(" ", F.slice(t, i + 1, n))), 1, 8
            ),
        )

    def window_mins(h):
        return F.array_distinct(
            F.transform(
                F.sequence(F.lit(1), F.size(h) - window + 1),
                lambda i: F.array_min(F.slice(h, i, window)),
            )
        )

    fps = let(tok, lambda t: let(hashes(t), window_mins))
    return (
        df.filter(F.size(tokens(F.col(text_col))) >= n + window - 1)
        .select(F.col(id_col), F.explode(fps).alias("fingerprint"))
    )


def winnowing_match_pairs(
    df: DataFrame,
    n: int = 3,
    window: int = 4,
    min_common: int = 2,
    max_fp_freq: int = 1000,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """The matcher half of the MOSS scheme: document pairs sharing
    >= ``min_common`` winnowing fingerprints — the shared-long-span /
    local-plagiarism detector (any common run of ``window + n - 1`` tokens
    is guaranteed to produce a shared fingerprint, so overlapping spans
    are found from the ~1/window sparse sample instead of a full n-gram
    index).

    Same inverted-index shape as the shingle Jaccard path: fingerprints
    occurring in more than ``max_fp_freq`` docs leave the index (stop
    fingerprints — boilerplate spans that would create quadratic
    reducers), then a self-join on the fingerprint bucket with id-ordered
    pairs. Returns (id_a, id_b, n_common)."""
    # three consumers (the frequency rollup + both sides of the self-join)
    # — cache the exploded fingerprints so the winnowing pass runs once
    fps = winnowing_fingerprints(df, n, window, text_col, id_col).cache()
    live = (
        fps.groupBy("fingerprint").agg(F.count("*").alias("_df"))
        .filter(F.col("_df") <= max_fp_freq)
        .select("fingerprint")
    )
    keep = fps.join(live, "fingerprint")
    a, b = keep.alias("a"), keep.alias("b")
    return (
        a.join(b, on=[
            F.col("a.fingerprint") == F.col("b.fingerprint"),
            F.col(f"a.{id_col}") < F.col(f"b.{id_col}"),
        ])
        .groupBy(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
        )
        .agg(F.count("*").cast("long").alias("n_common"))
        .filter(F.col("n_common") >= min_common)
    )


DEFAULT_QUALITY_THRESHOLDS = {
    "min_chars": 200,        # too short to be a useful training doc
    "max_chars": 1_000_000,  # pathological blobs
    "min_tokens": 20,
    "min_avg_token_len": 2.0,   # OCR noise / char soup
    "max_avg_token_len": 12.0,  # no-whitespace runs / minified code
    "max_punct_ratio": 0.10,
    "min_alpha_ratio": 0.60,
}


def quality_filter(
    df: DataFrame, thresholds: dict | None = None, text_col: str = "text"
) -> DataFrame:
    """The actionable form of :func:`quality_features`: annotate every
    document with ``q_keep`` and the array of threshold names it violated
    (``q_reasons``), so the drop set is auditable — a corpus pipeline
    reports WHY each document fell out, not just how many.

    Single map-only pass; thresholds are plain literals so the whole
    predicate stays in codegen. Filter with ``.filter("q_keep")`` for the
    cleaned corpus or aggregate ``q_reasons`` for the drop report."""
    t = {**DEFAULT_QUALITY_THRESHOLDS, **(thresholds or {})}
    feats = quality_features(df, text_col)
    checks = [
        ("min_chars", F.col("q_n_chars") < t["min_chars"]),
        ("max_chars", F.col("q_n_chars") > t["max_chars"]),
        ("min_tokens", F.col("q_n_tokens") < t["min_tokens"]),
        ("min_avg_token_len", F.col("q_avg_token_len") < t["min_avg_token_len"]),
        ("max_avg_token_len", F.col("q_avg_token_len") > t["max_avg_token_len"]),
        ("max_punct_ratio", F.col("q_punct_ratio") > t["max_punct_ratio"]),
        ("min_alpha_ratio", F.col("q_alpha_ratio") < t["min_alpha_ratio"]),
    ]
    reasons = F.filter(
        F.array(*[F.when(cond, F.lit(name)).otherwise(F.lit(None))
                  for name, cond in checks]),
        lambda x: x.isNotNull(),
    )
    return feats.withColumn("q_reasons", reasons).withColumn(
        "q_keep", F.size("q_reasons") == 0
    )


def adaptive_quality_thresholds(
    df: DataFrame,
    text_col: str = "text",
    lower_pct: float = 0.01,
    upper_pct: float = 0.99,
    accuracy: int = 10_000,
) -> dict:
    """Derive :func:`quality_filter` thresholds from the corpus itself:
    tail percentiles of each quality feature instead of fixed constants —
    fixed thresholds tuned on web text misfire on code, OCR, or non-Latin
    corpora, while "drop the extreme tails of THIS corpus" transfers.

    One pass of ``percentile_approx`` (Greenwald-Khanna sketch, partial-agg
    — a single reduce to one row regardless of scale). Returns a dict in
    the exact shape ``quality_filter(thresholds=...)`` accepts; inspect or
    clamp it before use, it is a starting point, not policy."""
    feats = quality_features(df, text_col)
    p = [lower_pct, upper_pct]
    row = feats.agg(
        F.percentile_approx("q_n_chars", p, accuracy).alias("chars"),
        F.percentile_approx("q_n_tokens", [lower_pct], accuracy).alias("tokens"),
        F.percentile_approx("q_avg_token_len", p, accuracy).alias("atl"),
        F.percentile_approx("q_punct_ratio", [upper_pct], accuracy).alias("punct"),
        F.percentile_approx("q_alpha_ratio", [lower_pct], accuracy).alias("alpha"),
    ).collect()[0]
    return {
        "min_chars": int(row["chars"][0]),
        "max_chars": int(row["chars"][1]),
        "min_tokens": int(row["tokens"][0]),
        "min_avg_token_len": float(row["atl"][0]),
        "max_avg_token_len": float(row["atl"][1]),
        "max_punct_ratio": float(row["punct"][0]),
        "min_alpha_ratio": float(row["alpha"][0]),
    }


def repetition_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Within-document repetition signals (the Gopher-style filters that
    catch boilerplate/spam the length-and-ratio thresholds miss):
    ``rep_n_lines``, ``rep_dup_line_frac`` (share of non-empty lines that
    repeat an earlier line), ``rep_dup_line_char_frac`` (character-weighted
    version). Map-only array expressions — zero shuffle at any scale. The
    line array is let-bound through a single-element-array transform so it
    evaluates once per row (the winnowing_fingerprints lesson)."""
    def let(value, body):
        return F.element_at(F.transform(F.array(value), body), 1)

    lines_expr = F.filter(
        F.transform(F.split(F.col(text_col), "\n"), lambda x: F.trim(x)),
        lambda x: x != "",
    )

    def chars(arr):
        return F.aggregate(arr, F.lit(0).cast("long"),
                           lambda acc, x: acc + F.length(x))

    def feats(L):
        n = F.size(L)
        n_uniq = F.size(F.array_distinct(L))
        tot = chars(L)
        uniq = chars(F.array_distinct(L))
        return F.struct(
            n.cast("long").alias("rep_n_lines"),
            F.when(n == 0, F.lit(0.0))
            .otherwise((n - n_uniq).cast("double") / n)
            .alias("rep_dup_line_frac"),
            F.when(tot == 0, F.lit(0.0))
            .otherwise((tot - uniq).cast("double") / tot)
            .alias("rep_dup_line_char_frac"),
        )

    return (
        df.withColumn("_r", let(lines_expr, feats))
        .select("*", "_r.*").drop("_r")
    )


def _token_pairs(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """(id, normalized token, in-doc count) — the wordcount core shared by
    token_rarity and top_tfidf_terms. One explode + one partial-agg
    shuffle; empty tokens (all-punctuation text normalizes to '' and
    splits to ['']) are dropped."""
    tok = F.explode(
        F.split(normalize_text(F.col(text_col)), r"\s+")
    ).alias("_tok")
    return (
        df.filter(F.trim(F.col(text_col)) != "")
        .select(F.col(id_col), tok)
        .filter(F.col("_tok") != "")
        .groupBy(id_col, "_tok").agg(F.count("*").alias("_c"))
    )


def hash_embed(
    df: DataFrame,
    d: int = 64,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Feature-hashing document embeddings (the hashing trick, Weinberger
    et al. 2009): every normalized token hashes to one of ``d`` buckets
    with a ±1 sign, per-bucket signed term frequencies form the vector,
    L2-normalized. No model, no vocabulary pass, fully deterministic and
    engine-reproducible (md5-derived bucket/sign) — the honest lexical
    embedder for similarity/RAG plumbing where the container has no
    neural encoder, and a real technique in its own right (sign hashing
    makes bucket collisions cancel in expectation).

    Output: ``(id, embedding array<double>, emb_norm)`` — ``emb_norm`` is
    the pre-normalization L2 norm (0 for empty/all-cancelled docs, whose
    embedding is the zero vector, NOT NaNs).

    Scale shape: map-only token explode, ONE partial-agg shuffle on
    (id, bucket), one groupBy(id) to assemble the dense array. O(d)
    state per doc.
    """
    tok = F.explode(
        F.split(normalize_text(F.col(text_col)), r"\s+")
    ).alias("_tok")
    hexed = F.md5(F.col("_tok").cast("binary"))
    bucket = (F.conv(F.substring(hexed, 1, 8), 16, 10).cast("long") % d).cast("int")
    sign = (
        F.lit(1)
        - 2 * (F.conv(F.substring(hexed, 9, 1), 16, 10).cast("long") % 2)
    ).cast("long")
    vals = (
        df.select(F.col(id_col), tok)
        .filter(F.col("_tok") != "")
        .select(F.col(id_col), bucket.alias("_b"), sign.alias("_s"))
        .groupBy(id_col, "_b")
        .agg(F.sum("_s").alias("_v"))
    )
    assembled = vals.groupBy(id_col).agg(
        F.map_from_entries(
            F.collect_list(F.struct(F.col("_b"), F.col("_v")))
        ).alias("_m")
    )
    raw = F.transform(
        F.sequence(F.lit(0), F.lit(d - 1)),
        lambda i: F.coalesce(
            F.element_at(F.col("_m"), i.cast("int")), F.lit(0)
        ).cast("double"),
    )
    # let-bind the raw array so the map lookup evaluates once per element,
    # not once per element per consumer (the nested-HOF re-eval trap)
    out = assembled.withColumn("_raw", raw).withColumn(
        "emb_norm",
        F.sqrt(F.aggregate("_raw", F.lit(0.0), lambda a, x: a + x * x)),
    )
    # docs present in df but with zero live tokens never reach `vals`;
    # keep them with a zero vector via a left join back
    base = df.select(F.col(id_col)).distinct()
    return (
        base.join(out, id_col, "left")
        .select(
            id_col,
            F.when(
                F.col("emb_norm") > 0,
                F.transform(F.col("_raw"), lambda x: x / F.col("emb_norm")),
            )
            .otherwise(
                F.array_repeat(F.lit(0.0), d)
            )
            .alias("embedding"),
            F.coalesce("emb_norm", F.lit(0.0)).alias("emb_norm"),
        )
    )


def bpe_pair_counts(
    df: DataFrame,
    k: int = 50,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """One BPE merge round at word granularity: corpus-wide frequency of
    ADJACENT normalized-token pairs, top ``k``. The vocabulary-induction
    primitive (Sennrich et al. BPE counts symbol-pair frequencies and
    merges the argmax; this is that counting pass, word-level) and a
    collocation detector in its own right.

    Output: ``(tok_a, tok_b, n_pairs, n_docs)`` — total adjacent
    occurrences and distinct documents — ordered by ``n_pairs`` desc with
    a full lexicographic tiebreak so the top-k set is deterministic.

    Scale shape: map-only pair explode (zip_with over the let-bound token
    array — tokenization evaluates once per row, not once per element),
    ONE partial-aggregated shuffle on the pair, then TakeOrdered top-k —
    the wordcount plan, never a global sort.
    """
    toks = F.split(normalize_text(F.col(text_col)), r"\s+")
    # let-bind via single-element-array transform (nested-HOF re-eval trap)
    pairs = F.element_at(
        F.transform(
            F.array(toks),
            lambda t: F.zip_with(
                F.slice(t, 1, F.greatest(F.size(t) - 1, F.lit(0))),
                F.slice(t, 2, F.greatest(F.size(t) - 1, F.lit(0))),
                lambda a, b: F.struct(a.alias("ta"), b.alias("tb")),
            ),
        ),
        1,
    )
    exploded = (
        df.filter(F.trim(F.col(text_col)) != "")
        .select(F.col(id_col), F.explode(pairs).alias("_p"))
        .select(
            F.col(id_col),
            F.col("_p.ta").alias("tok_a"),
            F.col("_p.tb").alias("tok_b"),
        )
        .filter((F.col("tok_a") != "") & (F.col("tok_b") != ""))
    )
    counts = exploded.groupBy("tok_a", "tok_b").agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.count_distinct(F.col(id_col)).alias("n_docs"),
    )
    return counts.orderBy(
        F.desc("n_pairs"), F.asc("tok_a"), F.asc("tok_b")
    ).limit(k)


def pmi_collocations(
    df: DataFrame,
    k: int = 50,
    min_count: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Top-``k`` collocations by pointwise mutual information — the
    statistically-surprising adjacent pairs (Church & Hanks 1990), the
    phrase detector raw counts can't be: ``bpe_pair_counts`` surfaces
    "of the"; PMI surfaces "los angeles".

    The score is ``exp(PMI) = n_pairs · N / (c_a · c_b)`` (N = total
    adjacent-pair occurrences, c_x = token occurrence counts), a
    strictly monotone transform of PMI kept in exact arithmetic: the
    two products are computed in DECIMAL (never overflow, never round)
    and the single division is one correctly-rounded double op — bit
    identical across engines, where ``log`` would inherit libm. Rare
    pairs below ``min_count`` are dropped first (PMI's classic failure
    mode: a 1-occurrence pair of two hapaxes scores N).

    Scale shape: one adjacent-pair explode + partial-agg shuffle
    (reusing the ``bpe_pair_counts`` counting plan), one token
    wordcount shuffle, two vocabulary-sized joins (AQE broadcasts
    them), a 1-row N broadcast, TakeOrdered top-k. Tie-break
    (score desc, tok_a, tok_b) is total."""
    toks = F.split(normalize_text(F.col(text_col)), r"\s+")
    pairs_arr = F.element_at(
        F.transform(
            F.array(toks),
            lambda t: F.zip_with(
                F.slice(t, 1, F.greatest(F.size(t) - 1, F.lit(0))),
                F.slice(t, 2, F.greatest(F.size(t) - 1, F.lit(0))),
                lambda a, b: F.struct(a.alias("ta"), b.alias("tb")),
            ),
        ),
        1,
    )
    bi_all = (
        df.filter(F.trim(F.col(text_col)) != "")
        .select(F.explode(pairs_arr).alias("_p"))
        .select(F.col("_p.ta").alias("tok_a"), F.col("_p.tb").alias("tok_b"))
        .filter((F.col("tok_a") != "") & (F.col("tok_b") != ""))
        .groupBy("tok_a", "tok_b").agg(F.count(F.lit(1)).alias("n_pairs"))
    )
    bi = bi_all.filter(F.col("n_pairs") >= min_count)
    uni = (
        df.filter(F.trim(F.col(text_col)) != "")
        .select(F.explode(toks).alias("_tok"))
        .filter(F.col("_tok") != "")
        .groupBy("_tok").agg(F.count(F.lit(1)).alias("_c"))
    )
    n = bi_all.agg(F.sum("n_pairs").alias("_n"))
    ca = uni.select(F.col("_tok").alias("tok_a"), F.col("_c").alias("c_a"))
    cb = uni.select(F.col("_tok").alias("tok_b"), F.col("_c").alias("c_b"))
    scored = (
        bi.join(ca, "tok_a").join(cb, "tok_b")
        .crossJoin(F.broadcast(n))
        .withColumn(
            "pmi_ratio",
            (F.col("n_pairs").cast("decimal(19,0)")
             * F.col("_n").cast("decimal(19,0)")).cast("double")
            / (F.col("c_a").cast("decimal(19,0)")
               * F.col("c_b").cast("decimal(19,0)")).cast("double"),
        )
    )
    return (
        scored.select("tok_a", "tok_b", "n_pairs",
                      F.col("c_a").cast("long").alias("c_a"),
                      F.col("c_b").cast("long").alias("c_b"), "pmi_ratio")
        .orderBy(F.desc("pmi_ratio"), F.asc("tok_a"), F.asc("tok_b"))
        .limit(k)
    )


def bpe_word_symbols(
    df: DataFrame, text_col: str = "text", end_of_word: str = "</w>"
) -> DataFrame:
    """The BPE training input: the corpus collapsed to its WORD-FREQUENCY
    table, each distinct word as its initial symbol sequence (characters +
    the end-of-word marker, Sennrich et al. 2016 §3.2).

    This is the one corpus-sized pass of BPE training — everything after
    operates on the distinct-word frame, which is O(vocabulary) (tiny vs
    the corpus at any scale; at 100 TB it is still millions of rows, so it
    stays a DataFrame, never driver state).

    Output: ``(symbols array<string>, freq long)``.
    """
    toks = F.split(normalize_text(F.col(text_col)), r"\s+")
    words = (
        df.filter(F.trim(F.col(text_col)) != "")
        .select(F.explode(toks).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    return words.select(
        F.concat(F.split("word", ""), F.array(F.lit(end_of_word))).alias("symbols"),
        "freq",
    )


def bpe_apply_merge(symbols: Column, tok_a: str, tok_b: str) -> Column:
    """Apply one BPE merge (``tok_a``,``tok_b``) → ``tok_a+tok_b`` to a
    symbol array, leftmost-greedy, as a pure array fold (no Python per
    row). The fold "replace the accumulator's last element when it is
    ``tok_a`` and the incoming symbol is ``tok_b``" is EXACTLY the
    left-to-right non-overlapping scan: a cascade would need the merged
    token ``tok_a+tok_b`` to equal ``tok_a``, impossible for non-empty
    ``tok_b`` (covers the self-pair case too: merging (a,a) over
    [a,a,a,a] yields [aa,aa], never [aaa,a])."""
    merged = F.lit(tok_a + tok_b)

    def step(acc: Column, x: Column) -> Column:
        prev = F.try_element_at(acc, F.lit(-1))
        hit = (F.size(acc) > 0) & (prev == F.lit(tok_a)) & (x == F.lit(tok_b))
        return F.when(
            hit, F.concat(F.slice(acc, 1, F.size(acc) - 1), F.array(merged))
        ).otherwise(F.concat(acc, F.array(x)))

    return F.aggregate(symbols, F.slice(symbols, 1, 0), step)


def bpe_pair_frequencies(word_symbols: DataFrame) -> DataFrame:
    """Frequency-weighted adjacent-pair counts over a word-symbol frame
    (one round's counting pass): map-only zip_with explode, ONE
    partial-aggregated shuffle on the pair."""
    sym = F.col("symbols")
    n = F.greatest(F.size(sym) - 1, F.lit(0))
    pairs = F.zip_with(
        F.slice(sym, 1, n), F.slice(sym, 2, n),
        lambda a, b: F.struct(a.alias("ta"), b.alias("tb")),
    )
    return (
        word_symbols.select(F.explode(pairs).alias("_p"), "freq")
        .groupBy(F.col("_p.ta").alias("tok_a"), F.col("_p.tb").alias("tok_b"))
        .agg(F.sum("freq").alias("n_pairs"))
    )


def _bpe_safe_batch(
    rows: list, max_batch: int
) -> list[tuple[str, str, int]]:
    """Select the maximal batch of merges provably equivalent to applying
    them one counting round at a time (the Sennrich sequential trainer).

    Scan the count-desc / lexicographic-sorted pair rows in order and
    accept while (a) under ``max_batch`` and (b) the candidate does not
    interact with any accepted pair — two pairs interact when their
    symbol sets INCLUDING the merged concatenations overlap
    ({a, b, a+b} ∩ {c, d, c+d} ≠ ∅); the concatenation term matters
    because merging (a,b) mints new "ab" symbols that would feed a
    later (ab,c) count. Then truncate the accepted prefix to counts
    STRICTLY greater than the first non-accepted row's count.

    Why this equals sequential: the accepted prefix contains every pair
    ranked above the first rejection, so every non-batch pair's old
    count ≤ the stop count < every kept pair's count. Merging disjoint
    pairs leaves other batch pairs' counts unchanged (a merge fuses two
    symbols, never creates or removes an adjacency of symbols it does
    not touch), and old interacting pairs can only lose occurrences.
    NEW pairs need two bounds: (x, ab) with x outside the trio is
    bounded by the old interacting (x, a) ≤ stop count, but pairs
    minted from the merged pair's OWN occurrences — (ab, ab) from runs
    like x^L or (ab)^k, (a, ab) leftovers — can reach count n−1 (e.g.
    merging (x, x) at count 29 over x^30 mints (xx, xx) at 14; over
    (ab)^k, (ab, ab) reaches k−1). n−1 < n is the only safe margin, so
    the batch is restricted to pairs of EQUAL count: every batch
    member's count n strictly exceeds every minted pair's ≤ n−1 and
    every non-batch old pair's ≤ stop count, hence at sequential round
    k the (count desc, lex) argmax is exactly batch pair k. If
    truncation would empty the batch, the top-1 pair alone is kept
    (plain sequential step, always safe)."""
    acc: list[tuple[str, str, int]] = []
    syms: set[str] = set()
    stop_count = None
    for r in rows:
        a, b, n = r["tok_a"], r["tok_b"], int(r["n_pairs"])
        trio = {a, b, a + b}
        if (len(acc) >= max_batch or (trio & syms)
                or (acc and n != acc[0][2])):
            stop_count = n
            break
        acc.append((a, b, n))
        syms |= trio
    if stop_count is not None:
        kept = [t for t in acc if t[2] > stop_count]
        acc = kept or acc[:1]
    return acc


def train_bpe(
    df: DataFrame,
    num_merges: int,
    text_col: str = "text",
    end_of_word: str = "</w>",
    min_count: int = 1,
    batch_merges: int = 1,
) -> dict:
    """Full BPE vocabulary induction (Sennrich et al. 2016): iterate
    (count adjacent symbol pairs → merge the argmax pair into one symbol)
    ``num_merges`` times. The tokenizer-training primitive —
    ``bpe_pair_counts`` is one counting round of this loop at word
    granularity; this is the real multi-round induction at character
    granularity.

    Driver-side loop of Spark jobs over the cached word-frequency symbol
    frame: per counting round ONE partial-agg shuffle (the pair count),
    an O(batch) head collect (count-desc / lexicographic order), and a
    map-only array-fold merge pass (``bpe_apply_merge``) re-cached so
    lineage stays one round deep. The corpus itself is read exactly
    once (``bpe_word_symbols``).

    ``batch_merges > 1`` applies up to that many PROVABLY NON-INTERACTING
    merges per counting round (``_bpe_safe_batch`` — disjoint symbol
    sets including concatenations, EQUAL counts only: pairs minted from
    a count-n merge's own occurrences can reach n−1, so only equal
    counts are sequential-safe — boundary ties truncated), folding them
    in sequence inside ONE projection. The merge list is bit-identical
    to the sequential trainer's; the counting-round count (the scale
    ceiling — a 32k vocabulary is 32k shuffles at batch 1) drops on the
    heavily-tied Zipf tail where most merge rounds live. Returned as
    ``rounds`` for observability.

    Stops early when no pair reaches ``min_count`` (or none is left).
    Returns ``{"merges": [(tok_a, tok_b, merged, n_pairs), ...],
    "vocab": sorted final symbol inventory, "rounds": counting rounds}``.
    """
    cur = bpe_word_symbols(df, text_col, end_of_word).cache()
    cur.count()  # materialize the corpus pass once
    merges: list[tuple[str, str, str, int]] = []
    rounds = 0
    try:
        while len(merges) < num_merges:
            cap = min(max(batch_merges, 1), num_merges - len(merges))
            head = (
                bpe_pair_frequencies(cur)
                .filter(F.col("n_pairs") >= min_count)
                .orderBy(F.desc("n_pairs"), F.asc("tok_a"), F.asc("tok_b"))
                .limit(cap + 1)
                .collect()
            )
            rounds += 1
            if not head:
                break
            batch = _bpe_safe_batch(head, cap)
            sym = F.col("symbols")
            for a, b, n in batch:
                merges.append((a, b, a + b, n))
                sym = bpe_apply_merge(sym, a, b)
            nxt = cur.select(sym.alias("symbols"), "freq").cache()
            nxt.count()  # materialize before dropping the parent's blocks
            cur.unpersist()
            cur = nxt
        vocab = sorted(
            r["s"]
            for r in cur.select(F.explode("symbols").alias("s")).distinct().collect()
        )
    finally:
        cur.unpersist()
    return {"merges": merges, "vocab": vocab, "rounds": rounds}


def _heap_bpe(
    words: "list[tuple[list[str], int]]",
    num_merges: int,
    min_count: int = 1,
) -> dict:
    """The classic in-memory BPE trainer (Sennrich et al. 2016 §3.2,
    the incremental-statistics variant): a lazy max-heap over pair
    counts with per-word delta updates, so each merge costs O(affected
    words · word length) instead of a full recount.

    Pair counts are ALL adjacencies (overlapping included) and merges
    apply leftmost-greedy non-overlapping — the exact conventions of
    ``bpe_pair_frequencies`` / ``bpe_apply_merge``, so the merge list is
    bit-identical to :func:`train_bpe`'s (argmax by count desc, then
    (tok_a, tok_b) ascending; heap order ``(-n, a, b)`` IS that order).
    Lazy invalidation: every count change pushes a fresh heap entry; a
    popped entry whose count no longer matches is stale and skipped."""
    import heapq
    from collections import defaultdict

    def adj(sym: list) -> dict:
        c: dict = defaultdict(int)
        for x, y in zip(sym, sym[1:]):
            c[(x, y)] += 1
        return c

    stats: dict = defaultdict(int)
    where: dict = defaultdict(set)
    for wi, (sym, freq) in enumerate(words):
        for p, k in adj(sym).items():
            stats[p] += k * freq
            where[p].add(wi)
    heap = [(-n, a, b) for (a, b), n in stats.items()]
    heapq.heapify(heap)

    merges: list[tuple[str, str, str, int]] = []
    while len(merges) < num_merges and heap:
        negn, a, b = heapq.heappop(heap)
        n = -negn
        if stats.get((a, b), 0) != n:
            continue  # stale entry; the live count has its own entry
        if n < min_count:
            break  # heap top is the max — nothing else qualifies
        merged = a + b
        merges.append((a, b, merged, n))
        touched: set = set()
        for wi in list(where[(a, b)]):
            sym, freq = words[wi]
            old = adj(sym)
            out: list[str] = []
            i = 0
            while i < len(sym):
                if i + 1 < len(sym) and sym[i] == a and sym[i + 1] == b:
                    out.append(merged)
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            words[wi] = (out, freq)
            new = adj(out)
            for p in old.keys() | new.keys():
                d = new.get(p, 0) - old.get(p, 0)
                if d:
                    stats[p] += d * freq
                    touched.add(p)
                if old.get(p, 0) and not new.get(p, 0):
                    where[p].discard(wi)
                elif new.get(p, 0) and not old.get(p, 0):
                    where[p].add(wi)
        for p in touched:
            if stats[p] > 0:
                heapq.heappush(heap, (-stats[p], p[0], p[1]))
            else:
                del stats[p]
                where.pop(p, None)
    vocab = sorted({s for sym, _f in words for s in sym})
    return {"merges": merges, "vocab": vocab, "rounds": len(merges)}


def train_bpe_heap(
    df: DataFrame,
    num_merges: int,
    text_col: str = "text",
    end_of_word: str = "</w>",
    min_count: int = 1,
    max_driver_words: int = 5_000_000,
) -> dict:
    """BPE induction with the scale-correct split of work: Spark does
    the ONE corpus-sized pass (``bpe_word_symbols`` — tokenize, count
    word frequencies), then the O(vocabulary) word-frequency table is
    collected and the classic heap trainer runs the merge loop in
    driver memory — 32k merges in seconds, where the distributed loop
    pays one counting shuffle per round (thousands of rounds even with
    equal-count batching, since only tied counts batch safely).

    The distinct-word frame is tiny relative to any corpus (millions of
    rows at 100 TB); ``max_driver_words`` guards the collect, falling
    back to the distributed :func:`train_bpe` loop when the vocabulary
    genuinely doesn't fit. Same return contract as ``train_bpe``
    (``rounds`` = in-memory merge steps on the heap path); the merge
    list is bit-identical — pytest-locked against ``train_bpe`` and the
    pure recount reference on random corpora."""
    frame = bpe_word_symbols(df, text_col, end_of_word)
    rows = frame.limit(max_driver_words + 1).collect()
    if len(rows) > max_driver_words:
        return train_bpe(df, num_merges, text_col, end_of_word, min_count,
                         batch_merges=16)
    words = [(list(r["symbols"]), int(r["freq"])) for r in rows]
    return _heap_bpe(words, num_merges, min_count)


def bpe_index(
    df: DataFrame,
    index_path: str,
    num_merges: int,
    text_col: str = "text",
    end_of_word: str = "</w>",
    min_count: int = 1,
    max_driver_words: int = 5_000_000,
) -> dict:
    """Build-once / encode-many tokenizer artifact: train with
    :func:`train_bpe_heap` on the first call and publish the merge list
    + vocabulary as a single JSON sidecar (written last via atomic
    rename — the artifact is valid iff the sidecar exists, the
    ``ivfpq_index`` publish contract); every later call just loads.
    Hand the returned ``merges`` to :func:`bpe_encode` — a training
    corpus pass per encode job is exactly what a persisted tokenizer
    exists to avoid.

    Returns the ``train_bpe`` dict (``merges`` re-tupled, ``vocab``,
    ``rounds``) plus ``"loaded": True`` when served from the sidecar.
    A stored artifact only serves calls with the SAME training
    parameters — a mismatched ``num_merges``/``end_of_word``/
    ``min_count`` raises rather than silently handing back a tokenizer
    trained to a different spec (point the caller at a fresh
    ``index_path`` to retrain)."""
    import json
    import os

    sidecar = os.path.join(index_path, "tokenizer.json")
    if not os.path.exists(sidecar):
        out = train_bpe_heap(df, num_merges, text_col, end_of_word,
                             min_count, max_driver_words)
        os.makedirs(index_path, exist_ok=True)
        tmp = os.path.join(index_path, ".tokenizer.tmp")
        with open(tmp, "w") as fh:
            json.dump({
                "end_of_word": end_of_word,
                "num_merges": num_merges,
                "min_count": min_count,
                "merges": [list(m) for m in out["merges"]],
                "vocab": out["vocab"],
                "rounds": out["rounds"],
            }, fh)
        os.replace(tmp, sidecar)  # atomic publish
        return {**out, "loaded": False}
    with open(sidecar) as fh:
        art = json.load(fh)
    if "min_count" not in art:
        raise ValueError(
            f"bpe_index artifact at {sidecar} predates the recorded "
            "training spec (no min_count) — its parameters cannot be "
            "validated; retrain at a fresh index_path"
        )
    stored = (int(art["num_merges"]), art["end_of_word"],
              int(art["min_count"]))
    if stored != (num_merges, end_of_word, min_count):
        raise ValueError(
            f"bpe_index artifact at {sidecar} was trained with "
            f"(num_merges, end_of_word, min_count)={stored}, call asked "
            f"for {(num_merges, end_of_word, min_count)}; use a fresh "
            "index_path to retrain"
        )
    return {
        "merges": [(a, b, m, int(n)) for a, b, m, n in art["merges"]],
        "vocab": list(art["vocab"]),
        "rounds": int(art["rounds"]),
        "loaded": True,
    }


def bpe_encode(
    df: DataFrame,
    merges: list,
    text_col: str = "text",
    id_col: str = "doc_id",
    end_of_word: str = "</w>",
) -> DataFrame:
    """Tokenize with a trained BPE vocabulary: replay the learned merges
    in order over each word (exactly the training fold, so a training
    word's tokens equal its final train-time symbols). Output one row per
    token: ``(id, word_pos, token_pos, token)`` — order-reconstructing
    and lossless (concatenating a word's tokens and stripping the marker
    yields the normalized word).

    Scale shape: normalization + word splitting stay JVM-side
    (``normalize_text`` — the engine-parity surface); the merge replay is
    the canonical Python-bound tokenizer step, but it runs over the
    GLOBAL distinct-word frame only (``words.select("word").distinct()``
    → Arrow-batched ``mapInPandas`` → one ``(word, tokens)`` row per
    vocabulary entry), then the token arrays join back onto the word
    positions and ``posexplode``. Python cost is O(global distinct
    words) — NOT O(tokens) and NOT O(Σ per-partition distinct words) as
    a per-partition memoization cache would be — and for real
    vocabularies the encoded frame is small enough that AQE broadcasts
    the join. ``merges`` accepts ``train_bpe``'s
    ``(tok_a, tok_b, merged, n)`` tuples or bare pairs.
    """
    pairs = [(m[0], m[1]) for m in merges]
    toks = F.split(normalize_text(F.col(text_col)), r"\s+")
    words = df.select(
        F.col(id_col), F.posexplode(toks).alias("word_pos", "word")
    ).filter(F.col("word") != "")
    enc_schema = T.StructType([
        T.StructField("word", T.StringType(), False),
        T.StructField("_toks", T.ArrayType(T.StringType(), False), False),
    ])

    def run(batches):
        def enc(w: str) -> list[str]:
            sym = list(w) + [end_of_word]
            for a, b in pairs:
                merged, out, i = a + b, [], 0
                while i < len(sym):
                    if i + 1 < len(sym) and sym[i] == a and sym[i + 1] == b:
                        out.append(merged)
                        i += 2
                    else:
                        out.append(sym[i])
                        i += 1
                sym = out
            return sym

        for pdf in batches:
            ws = pdf["word"]
            yield pd.DataFrame({"word": ws, "_toks": [enc(w) for w in ws]})

    encoded = words.select("word").distinct().mapInPandas(run, enc_schema)
    return words.join(encoded, "word").select(
        id_col, "word_pos", F.posexplode("_toks").alias("token_pos", "token")
    )


def token_rarity(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Corpus-frequency token rarity — the unigram-LM proxy for perplexity
    filtering: score each document by how common its tokens are in the
    WHOLE corpus. Output per doc: ``n_tokens`` (tf-weighted), ``n_types``
    (distinct tokens), ``rarest_token_freq`` (corpus frequency of its
    rarest token — 1 means a corpus-unique token, a strong OCR-noise /
    gibberish signal), ``mean_token_freq`` (tf-weighted mean corpus
    frequency — low means the doc lives in the distribution's tail).

    All aggregates stay in exact integer arithmetic; the single final
    division is the only float op, so the score is bit-identical across
    engines and run orders (a sum of per-token log-probs would not be —
    float addition order varies with partitioning).

    Plan shape at 100 TB: one explode, two partial-agg shuffles (wordcount
    on the token, then per-doc), one join on the token (AQE broadcasts the
    vocab side when it fits). Tokenization normalizes first (lowercase,
    alnum runs) so 'The'/'the.' count as one type."""
    # the pairs fan out to two consumers (vocab rollup + per-doc agg).
    # Deliberately NOT cached: measured at sf0.1, block-manager
    # materialization of the exploded pairs costs 2.5x the recompute
    # (1.87s cached vs 0.73s recomputed), and at 100 TB caching an
    # exploded corpus-sized frame means spilling ~corpus bytes to local
    # disk while recompute is two column-pruned parquet scans
    pairs = _token_pairs(df, text_col, id_col)
    vocab = pairs.groupBy("_tok").agg(F.sum("_c").alias("_cf"))
    return (
        pairs.join(vocab, "_tok")
        .groupBy(id_col)
        .agg(
            F.sum("_c").cast("long").alias("n_tokens"),
            F.count("*").cast("long").alias("n_types"),
            F.min("_cf").cast("long").alias("rarest_token_freq"),
            F.sum(F.col("_c") * F.col("_cf")).alias("_wf"),
        )
        .withColumn(
            "mean_token_freq",
            F.col("_wf").cast("double") / F.col("n_tokens"),
        )
        .drop("_wf")
    )


def top_tfidf_terms(
    df: DataFrame, k: int = 5, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Top-``k`` characteristic terms per document by tf-idf — the corpus
    keyword extractor (topic labeling, cluster naming, search facets).

    The score is the exact-ratio form ``tf * N / doc_freq`` (tf = in-doc
    occurrences, N = docs with any token, doc_freq = docs containing the
    term): rank-equivalent to the classic log-idf within a document, but
    computed as one division of exact integers — bit-identical across
    engines, where ``log`` would inherit libm rounding differences.

    Plan: the wordcount pairs (partial-agg shuffle), doc-frequency rollup,
    a join on the token, the 1-row N as a broadcast cross join, then the
    per-doc top-k window — WindowGroupLimit prunes to k rows per doc
    map-side before that final shuffle. Ties break by token for full
    determinism."""
    from pyspark.sql import Window

    # three consumers of the wordcount pairs (doc-freq rollup, the N
    # scalar, the scored join) — recomputed, not cached: see the
    # token_rarity note (cache materialization measured 2.5x the
    # recompute cost; at scale it spills a corpus-sized frame)
    pairs = _token_pairs(df, text_col, id_col).withColumnRenamed("_c", "tf")
    docfreq = pairs.groupBy("_tok").agg(F.count("*").alias("doc_freq"))
    n = pairs.select(F.count_distinct(F.col(id_col)).alias("_n"))
    w = Window.partitionBy(id_col).orderBy(
        F.col("score").desc(), F.col("_tok").asc()
    )
    return (
        pairs.join(docfreq, "_tok")
        .crossJoin(F.broadcast(n))
        .withColumn(
            "score",
            (F.col("tf") * F.col("_n")).cast("double") / F.col("doc_freq"),
        )
        .withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select(
            id_col, F.col("_tok").alias("token"),
            F.col("tf").cast("long").alias("tf"),
            F.col("doc_freq").cast("long").alias("doc_freq"),
            "score", "rank",
        )
    )


# PII surface patterns. Deliberately simple, deterministic regexes that
# parse identically under Java regex (Spark) and RE2 (DuckDB oracle): no
# lookaround, no backreferences, ASCII word boundaries. Real PII scrubbing
# layers NER models on top; these are the always-on cheap pass.
PII_PATTERNS = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "ssn": r"\b\d{3}-\d{2}-\d{4}\b",
    "phone": r"\b\d{3}[-.]\d{3}[-.]\d{4}\b",
    "ipv4": r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b",
}
# redaction order matters (an SSN redacted first can't be half-eaten by
# the phone pattern); fixed here so every engine applies the same sequence
PII_REDACT_ORDER = ["email", "ssn", "phone", "ipv4"]


def pii_scan(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-document PII surface scan + redaction: counts per pattern class
    (on the ORIGINAL text, so overlapping classes each report), total, and
    the redacted text with each match replaced by its ``<CLASS>`` token.
    One map-only pass of regexp_count/regexp_replace — zero shuffle, full
    codegen; filter ``pii_total > 0`` for the audit queue or train on
    ``pii_redacted`` directly."""
    t = F.col(text_col)
    counts = {
        name: F.regexp_count(t, F.lit(pat)).cast("long")
        for name, pat in PII_PATTERNS.items()
    }
    red = t
    for name in PII_REDACT_ORDER:
        red = F.regexp_replace(red, PII_PATTERNS[name], f"<{name.upper()}>")
    return df.select(
        F.col(id_col),
        *[c.alias(f"n_{name}") for name, c in counts.items()],
        sum(counts.values()).alias("pii_total"),
        red.alias("pii_redacted"),
    )


def line_stats(
    df: DataFrame,
    min_docs: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """C4-style cross-document boilerplate line signal: a line occurring in
    >= ``min_docs`` DISTINCT documents is boilerplate (nav bars, cookie
    banners, license footers). Output per doc: ``n_lines`` (distinct
    non-empty trimmed lines), ``n_boiler_lines``, ``boiler_frac``.

    Lines are keyed by md5 so the two shuffles move 32-char digests, never
    line text; per-doc de-dup happens map-side (array_distinct before the
    explode) so a 10k-repeat spam line costs one pair. Plan: map pass →
    pair groupBy (partial-agg) → line-frequency groupBy → join back →
    per-doc agg. The frequency side is usually tiny after the >= min_docs
    filter, but the join keeps both paths shuffle-safe when it isn't."""
    lines = F.array_distinct(
        F.filter(
            F.transform(F.split(F.col(text_col), "\n"), lambda x: F.trim(x)),
            lambda x: x != "",
        )
    )
    pairs = (
        df.select(F.col(id_col), F.explode(lines).alias("_line"))
        .select(id_col, F.md5(F.col("_line")).alias("_h"))
    )
    freq = pairs.groupBy("_h").agg(F.count("*").alias("_n_docs"))
    boiler = F.when(F.col("_n_docs") >= min_docs, 1).otherwise(0)
    return (
        pairs.join(freq, "_h")
        .groupBy(id_col)
        .agg(
            F.count("*").cast("long").alias("n_lines"),
            F.sum(boiler).cast("long").alias("n_boiler_lines"),
        )
        .withColumn(
            "boiler_frac",
            F.col("n_boiler_lines").cast("double") / F.col("n_lines"),
        )
    )


def strip_boilerplate_lines(
    df: DataFrame,
    min_docs: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """The surgery counterpart of :func:`line_stats` (C4's line-level
    dedup policy): REMOVE every line that occurs in >= ``min_docs``
    distinct documents (nav bars, cookie banners, license footers),
    preserving the order — and the empty-line structure — of what
    remains. Returns ``id_col``, ``clean_text``, ``n_lines_removed``.

    Shuffle budget: the digest pairs→frequency path is the same two
    md5-keyed shuffles as ``line_stats`` (32-char hashes, never line
    text), the per-doc set of OFFENDING digests shuffles as
    ``(id, digest)``, and the rebuild is a map-only ``filter(split(text))
    → concat_ws`` against that per-doc array after ONE id-join — which
    AQE broadcasts when the offender map is small (the common case:
    most docs have no boilerplate and drop out of the left join's build
    side), and otherwise costs the text a single hash partition on id;
    there is no per-LINE text shuffle at any scale. Compare
    ``remove_duplicated_spans`` (token-window grain) — this is the
    line-grain tool for markup-shaped boilerplate."""
    trimmed = F.filter(
        F.transform(F.split(F.col(text_col), "\n"), lambda x: F.trim(x)),
        lambda x: x != "",
    )
    pairs = (
        df.select(F.col(id_col), F.explode(F.array_distinct(trimmed)).alias("_l"))
        .select(id_col, F.md5(F.col("_l")).alias("_h"))
    )
    boiler = (
        pairs.groupBy("_h").agg(F.count("*").alias("_n"))
        .filter(F.col("_n") >= min_docs).select("_h")
    )
    per_doc_bad = (
        pairs.join(boiler, "_h", "left_semi")
        .groupBy(id_col).agg(F.collect_set("_h").alias("_bad"))
    )
    bad = F.coalesce(F.col("_bad"), F.array().cast("array<string>"))
    kept_lines = F.filter(
        F.split(F.col(text_col), "\n"),
        lambda x: (F.trim(x) == "")
        | ~F.array_contains(bad, F.md5(F.trim(x))),
    )
    return (
        df.join(per_doc_bad, id_col, "left")
        .select(
            F.col(id_col),
            F.concat_ws("\n", kept_lines).alias("clean_text"),
            (F.size(F.split(F.col(text_col), "\n")) - F.size(kept_lines))
            .cast("long").alias("n_lines_removed"),
        )
    )


def top_ngram_repetition(
    df: DataFrame, n: int = 2, text_col: str = "text", id_col: str = "doc_id",
) -> DataFrame:
    """Most-frequent word n-gram share per document — a doc dominated by
    one repeated phrase scores near 1 (the other half of the Gopher
    repetition family). Gram occurrences are counted NON-distinct, as
    8-byte token-hash folds (same zip_with construction as the dedup
    shingles, minus the dedup), so the two shuffles (per-gram count,
    per-doc max/sum) move longs, never gram strings. Docs with fewer than
    ``n`` tokens yield no row."""
    tok = tokens(F.col(text_col))
    d2 = (
        df.filter(F.trim(F.col(text_col)) != "")
        .filter(F.size(tok) >= n)
        .withColumn("_th", F.transform(tok, lambda t: F.xxhash64(t)))
    )
    thc, size = F.col("_th"), F.size(F.col("_th"))
    cur = thc
    for j in range(1, n):
        cur = F.zip_with(cur, F.slice(thc, j + 1, size),
                         lambda a, b: F.xxhash64(a, b))
    grams = F.slice(cur, 1, size - n + 1)
    per_gram = (
        d2.select(F.col(id_col), F.explode(grams).alias("_g"))
        .groupBy(id_col, "_g").agg(F.count("*").alias("_c"))
    )
    return (
        per_gram.groupBy(id_col)
        .agg(F.sum("_c").alias("n_grams"), F.max("_c").alias("top_gram_count"))
        .withColumn("top_gram_frac",
                    F.col("top_gram_count").cast("double") / F.col("n_grams"))
    )


def bigram_lm_scores(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Corpus-trained bigram-LM fluency score — the context-conditional
    step up from ``token_rarity``'s unigram proxy (CCNet-style pipelines
    score documents with a KenLM model; with no external model available
    the corpus itself is the training set, which is exactly how you
    bootstrap a quality signal on a fresh crawl). A scrambled-word-order
    document keeps its unigram stats but craters here.

    Per document: ``n_bigrams`` (tf-weighted adjacent-token pairs),
    ``n_unique_bigrams`` (pairs whose corpus frequency is 1 — text nothing
    else in the corpus continues this way), ``avg_bigram_prob``
    (tf-weighted mean of the MLE conditional p(v|u) = c(u,v)/c(u·)), and
    ``min_bigram_prob`` (the least-expected transition).

    Determinism: every count is exact integer; each p(v|u) is ONE double
    division of two longs (correctly rounded, engine-independent); the
    tf-weighted sum accumulates in DECIMAL (the ``_dsum`` pattern — double
    addition order varies with partitioning, decimal addition does not);
    the final mean is a single raw double division. No ROUND(double)
    anywhere (the 1-ulp cross-engine trap).

    Plan shape at 100 TB: one explode into adjacent pairs, a per-doc
    partial-agg wordcount (recomputed per consumer — it feeds the model
    fit AND the scoring join), two partial-agg rollups for the model
    (bigram and context counts), then two joins back; the model side is vocab-sized,
    so AQE broadcasts it when it fits and a shuffle join handles the
    heavy-tailed case."""
    toks = F.split(normalize_text(F.col(text_col)), r"\s+")
    d2 = (
        df.filter(F.trim(F.col(text_col)) != "")
        .select(F.col(id_col), toks.alias("_l"))
        .filter(F.size("_l") >= 2)
    )
    pairs = d2.select(
        F.col(id_col),
        F.explode(
            F.zip_with(
                F.slice("_l", 1, F.size("_l") - 1),
                F.slice("_l", 2, F.size("_l") - 1),
                lambda a, b: F.struct(a.alias("u"), b.alias("v")),
            )
        ).alias("_p"),
    ).select(id_col, "_p.u", "_p.v")
    # per-doc bigram counts fan out to three consumers (bigram rollup,
    # context rollup, scoring) — recomputed, not cached: see the
    # token_rarity note (cache materialization costs more than the
    # recompute at every scale measured)
    big = pairs.groupBy(id_col, "u", "v").agg(F.count("*").alias("c"))
    bg = big.groupBy("u", "v").agg(F.sum("c").alias("cuv"))
    ctx = big.groupBy("u").agg(F.sum("c").alias("cu"))
    scored = (
        big.join(bg, ["u", "v"]).join(ctx, "u")
        .withColumn("r", F.col("cuv").cast("double") / F.col("cu"))
    )
    return scored.groupBy(id_col).agg(
        F.sum("c").cast("long").alias("n_bigrams"),
        F.sum(F.when(F.col("cuv") == 1, F.col("c")).otherwise(F.lit(0)))
        .cast("long").alias("n_unique_bigrams"),
        (
            F.sum((F.col("c").cast("double") * F.col("r"))
                  .cast("decimal(27,10)")).cast("double")
            / F.sum("c")
        ).alias("avg_bigram_prob"),
        F.min("r").alias("min_bigram_prob"),
    )


def chunk_documents(
    df: DataFrame,
    chunk_tokens: int = 256,
    overlap: int = 32,
    text_col: str = "text",
    id_col: str = "doc_id",
    with_text: bool = True,
) -> DataFrame:
    """Fixed-size overlapping token-window chunking — the RAG/context-
    window preparation step: every document becomes a deterministic set of
    ``chunk_tokens``-token chunks whose starts step by
    ``chunk_tokens - overlap``, so consecutive chunks share ``overlap``
    tokens and no retrieval-relevant span is cut without a copy that
    contains it whole.

    Start generation rule: start 0 always; a further start ``s`` exists
    iff ``s < n_tokens - overlap`` — equivalently, iff the PREVIOUS chunk
    was truncated by the document end (a start whose predecessor already
    reached the last token would emit a chunk fully contained in it).
    That makes the chunk set minimal and deterministic: ``chunk_index =
    start / stride`` is dense per document.

    100 TB shape: one map-only pass — tokenize, ``sequence()`` the starts,
    explode, ``slice()`` the window — zero shuffles, zero UDFs; the output
    inherits the input partitioning so a downstream embed/index stage
    starts from co-located chunks of the same document. Empty documents
    produce no chunks.
    """
    if overlap < 0 or chunk_tokens <= 0 or overlap >= chunk_tokens:
        raise ValueError("need 0 <= overlap < chunk_tokens")
    stride = chunk_tokens - overlap
    t = F.col(text_col)
    d = (
        df.filter(F.trim(t) != "")
        .select(id_col, tokens(t).alias("_t"))
        .select(id_col, "_t", F.size("_t").cast("long").alias("n_tokens"))
    )
    starts = F.sequence(
        F.lit(0).cast("long"),
        F.greatest(F.lit(0).cast("long"),
                   F.col("n_tokens") - F.lit(overlap + 1)),
        F.lit(stride).cast("long"),
    )
    chunk = F.slice("_t", F.col("tok_start").cast("int") + F.lit(1),
                    F.lit(chunk_tokens))
    out = (
        d.select(id_col, "n_tokens", F.explode(starts).alias("tok_start"), "_t")
        .select(
            id_col,
            (F.col("tok_start") / stride).cast("int").alias("chunk_index"),
            F.col("tok_start").cast("long").alias("tok_start"),
            F.size(chunk).cast("long").alias("chunk_n_tokens"),
            "n_tokens",
            *([F.array_join(chunk, " ").alias("chunk_text")] if with_text else []),
        )
    )
    return out


# Unicode script ranges used by script_profile. Explicit codepoint ranges
# (not \p{Script=...}) so the Java-regex implementation and the RE2-based
# DuckDB oracle count identically; coverage is the major blocks a corpus
# language router needs, not exhaustive Unicode.
SCRIPT_RANGES: dict[str, str] = {
    "latin": "A-Za-zÀ-ɏ",
    "cyrillic": "Ѐ-ӿ",
    "greek": "Ͱ-Ͽ",
    "arabic": "؀-ۿ",
    "hebrew": "֐-׿",
    "devanagari": "ऀ-ॿ",
    "han": "一-鿿",
    "kana": "぀-ヿ",
    "hangul": "가-힯",
}


def script_profile(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document unicode-script histogram + dominant script — the
    script-detection stage a multilingual corpus router runs before
    language ID (stopword voting only works once you know the text is in
    a script your stopword lists cover).

    One map-only pass: a ``regexp_count`` per script block (JVM regex,
    whole-stage codegen, zero shuffle). ``main_script`` is the argmax
    with ties broken by the fixed SCRIPT_RANGES order, ``'none'`` when no
    letter of any covered script occurs; ``script_ratio`` = dominant
    count / total covered-letter count (NULL for 'none')."""
    t = F.col(text_col)
    counts = {
        name: F.regexp_count(t, F.lit(f"[{rng}]")).cast("long")
        for name, rng in SCRIPT_RANGES.items()
    }
    cols = [c.alias(f"n_{name}") for name, c in counts.items()]
    out = df.select("*", *cols)
    total = sum((F.col(f"n_{n}") for n in SCRIPT_RANGES), F.lit(0).cast("long"))
    best = F.greatest(*[F.col(f"n_{n}") for n in SCRIPT_RANGES])
    main = F.lit("none")
    for name in reversed(list(SCRIPT_RANGES)):  # earlier names win ties
        main = F.when(F.col(f"n_{name}") == best, F.lit(name)).otherwise(main)
    main = F.when(best == 0, F.lit("none")).otherwise(main)
    return out.select(
        "*",
        total.alias("n_script_chars"),
        main.alias("main_script"),
        F.when(best == 0, F.lit(None).cast("double"))
        .otherwise(best.cast("double") / total).alias("script_ratio"),
    )


def bm25_rank(
    df: DataFrame,
    query_terms: list[str],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Top-``k`` documents for a bag-of-words query by BM25 — the lexical
    retrieval twin of the ANN ladder (brute cosine → SRP/IVF), and the
    sparse half of a hybrid search stack.

    Scoring uses the RATIONAL idf ``(N - df + 0.5) / (df + 0.5)`` instead
    of its logarithm: per-term this is a strictly monotone transform of
    the classic Robertson idf (documented divergence — rankings can
    differ for multi-term queries when term contributions trade off), and
    it keeps every arithmetic step a plain IEEE expression with a fixed
    evaluation order, so scores are bit-identical across engines — libm
    ``log`` is not. The tf saturation term is standard:
    ``tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl))``.

    Per-term contributions land in pinned columns (``score_<term>``) and
    the total is their fixed-order sum, never a float groupBy-sum (whose
    partial-agg order varies run to run).

    Plan at 100 TB: one explode + wordcount partial-agg shuffle over the
    corpus (shared `_token_pairs` core), a per-doc length rollup from the
    same pairs, a broadcast of the per-term document frequencies (|query|
    rows), map-side scoring, and a TakeOrderedAndProject top-k — the
    only full shuffles are the two wordcount/doc-length aggregations.
    """
    from pyspark.sql import Window

    if not query_terms:
        raise ValueError("query_terms must be non-empty")
    terms = [t.lower() for t in query_terms]
    # recomputed, not cached: see the token_rarity note; the query-term
    # branch additionally pushes the isin filter into its own recompute
    pairs = _token_pairs(df, text_col, id_col)
    # per-doc length + corpus stats from the same pairs shape
    dl = pairs.groupBy(id_col).agg(F.sum("_c").alias("dl"))
    stats = dl.agg(
        F.count("*").alias("n_docs"),
        F.sum("dl").alias("sum_dl"),
    )
    qp = pairs.filter(F.col("_tok").isin(terms))
    df_t = qp.groupBy("_tok").agg(F.count("*").alias("df_t"))
    scored = (
        qp.join(F.broadcast(df_t), "_tok")
        .join(dl, id_col)
        .crossJoin(F.broadcast(stats))
    )
    avgdl = F.col("sum_dl").cast("double") / F.col("n_docs")
    idf = (F.col("n_docs") - F.col("df_t") + F.lit(0.5)) / (F.col("df_t") + F.lit(0.5))
    sat = (F.col("_c") * F.lit(k1 + 1.0)) / (
        F.col("_c")
        + F.lit(k1) * (F.lit(1.0 - b) + F.lit(b) * (F.col("dl") / avgdl))
    )
    per_term = scored.select(
        id_col, "dl",
        F.col("_tok").alias("term"),
        (idf * sat).alias("score_t"),
    )
    # pivot to pinned per-term columns; total = fixed-order sum
    wide = (
        per_term.groupBy(id_col, "dl")
        .pivot("term", terms)
        .agg(F.first("score_t"))
    )
    total = None
    cols = []
    for t in terms:
        c = F.coalesce(F.col(f"`{t}`"), F.lit(0.0))
        cols.append(c.alias(f"score_{t}"))
        total = c if total is None else total + c
    w = Window.orderBy(F.col("score").desc(), F.col(id_col).asc())
    return (
        wide.select(id_col, F.col("dl").cast("long").alias("dl"), *cols,
                    total.alias("score"))
        .withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
    )


def inverted_index(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Positional inverted index — the search-engine sink: one posting
    row per (token, document) with the term frequency, the sorted
    0-based token positions, and the token's document frequency (what
    BM25 computes transiently, materialized as an artifact other
    systems can consume).

    Scale shape: one posexplode + ONE partial-agg shuffle building the
    per-(token, doc) posting (collect_list over in-doc positions is
    bounded by document length), a vocabulary-sized doc-frequency
    rollup joined back (AQE broadcasts it). Write the result
    partitioned/bucketed by token for pruned term lookups."""
    toks = F.split(normalize_text(F.col(text_col)), r"\s+")
    pos = (
        df.filter(F.trim(F.col(text_col)) != "")
        .select(F.col(id_col), F.posexplode(toks).alias("_pos", "_tok"))
        .filter(F.col("_tok") != "")
    )
    postings = pos.groupBy("_tok", id_col).agg(
        F.count(F.lit(1)).cast("long").alias("tf"),
        F.array_sort(F.collect_list("_pos")).alias("positions"),
    )
    docfreq = postings.groupBy("_tok").agg(
        F.count(F.lit(1)).cast("long").alias("doc_freq"))
    return (
        postings.join(docfreq, "_tok")
        .select(F.col("_tok").alias("token"), id_col, "tf", "positions",
                "doc_freq")
    )


def skipgram_counts(
    df: DataFrame,
    window: int = 2,
    min_count: int = 2,
    text_col: str = "text",
) -> DataFrame:
    """Skip-gram context-pair counts (the word2vec/GloVe co-occurrence
    prep): for every token position, the forward pairs
    ``(t_i, t_{i+d})`` for ``d = 1..window``, counted at the
    (tok_a, tok_b, dist) grain — distance kept exact so any decay
    weighting (1/d, harmonic) is a cheap downstream map instead of an
    order-dependent float sum baked into the engine. ``min_count``
    drops the hapax tail (the same floor word2vec applies before
    training).

    Scale shape: pair generation is MAP-ONLY per document — ``window``
    shifted ``zip_with`` slices of the token array (no self-join, no
    posexplode join-back; blowup factor is exactly ``window``), then
    one partial-agg shuffle at the pair grain. Exact integers
    throughout — bit-identical across engines."""
    if window < 1:
        raise ValueError(f"window must be >= 1, got {window}")
    toks = F.split(normalize_text(F.col(text_col)), r"\s+")

    def pair_struct(d: int):
        # closure (not a default arg): pyspark counts lambda params to
        # bind the higher-order function, and zip_with takes exactly two
        return lambda a, b: F.struct(
            a.alias("ta"), b.alias("tb"), F.lit(d).alias("d"))

    arrays = []
    for dd in range(1, window + 1):
        ln = F.greatest(F.size("_t") - dd, F.lit(0))
        arrays.append(
            F.zip_with(
                F.slice("_t", 1, ln),
                F.slice("_t", 1 + dd, ln),
                pair_struct(dd),
            )
        )
    pairs = F.concat(*arrays) if len(arrays) > 1 else arrays[0]
    return (
        df.filter(F.trim(F.col(text_col)) != "")
        .select(toks.alias("_t"))
        .select(F.explode(pairs).alias("_p"))
        .select(F.col("_p.ta").alias("tok_a"),
                F.col("_p.tb").alias("tok_b"),
                F.col("_p.d").alias("dist"))
        .filter((F.col("tok_a") != "") & (F.col("tok_b") != ""))
        .groupBy("tok_a", "tok_b", "dist")
        .agg(F.count(F.lit(1)).alias("n_pairs"))
        .filter(F.col("n_pairs") >= min_count)
    )


def compression_ratio(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    level: int = 6,
) -> DataFrame:
    """Per-document zlib compression ratio — the redundancy quality
    signal the Gopher/FineWeb-family pipelines use alongside the exact
    repetition counters: templated/repetitive text compresses far
    below prose (ratio ≈ bytes_compressed / bytes_raw), while
    high-entropy noise sits near (or above) 1. A screen the n-gram
    counters can't fully replace: it catches long-range and
    approximate redundancy in one pass.

    Python-bound by necessity (zlib), so it runs as an Arrow-batched
    pandas_udf over UTF-8 bytes — map-only, no shuffle, no driver
    involvement; rows-only at the correctness gate (no SQL zlib) with
    the behavioral contract pytest-pinned (repetition compresses
    below prose below noise; empty text → NULL ratio)."""
    lv = int(level)
    if not 1 <= lv <= 9:
        raise ValueError(f"level must be in 1..9, got {lv}")

    @F.pandas_udf("long")
    def _clen(texts: pd.Series) -> pd.Series:
        import zlib

        return texts.map(
            lambda t: len(zlib.compress(t.encode("utf-8"), lv))
            if t is not None else None)

    raw_len = F.length(F.col(text_col).cast("binary")).cast("long")
    return df.select(
        id_col,
        raw_len.alias("n_bytes"),
        _clen(F.col(text_col)).alias("n_compressed"),
    ).withColumn(
        "ratio",
        F.when(F.col("n_bytes") > 0,
               F.col("n_compressed").cast("double")
               / F.col("n_bytes").cast("double")),
    )


# Public-data confusable subset (Unicode TR39 skeleton idea): the
# Cyrillic and Greek letters most used to clone Latin glyphs. Enough to
# catch the classic homoglyph-cloaked duplicate; extend the table for a
# full TR39 skeleton.
HOMOGLYPH_FROM = "\u0410\u0412\u0415\u041a\u041c\u041d\u041e\u0420\u0421\u0422\u0425\u0430\u0435\u043e\u0440\u0441\u0443\u0445\u0391\u0392\u0395\u0396\u0397\u0399\u039a\u039c\u039d\u039f\u03a1\u03a4\u03a5\u03a7\u03bf\u03bd"
HOMOGLYPH_TO = "ABEKMHOPCTXaeopcyxABEZHIKMNOPTYXov"


def homoglyph_skeleton(text: Column) -> Column:
    """Map confusable Cyrillic/Greek glyphs onto their Latin skeleton
    (one JVM-side ``translate`` — no UDF). Two texts that differ raw
    but collide after skeletonization are homoglyph variants."""
    return F.translate(text, HOMOGLYPH_FROM, HOMOGLYPH_TO)


def homoglyph_report(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Homoglyph-cloaking screen: per document, how many characters are
    confusable stand-ins (skeleton differs from raw), plus the skeleton
    digest — grouping on ``skeleton_digest`` where ``raw_digest``
    differs surfaces the cloaked-duplicate clusters exact dedup misses
    (spam that swaps Latin 'o' for Cyrillic 'о' to dodge digests).

    Map-only: two digests + one char-diff fold per row, all JVM-side;
    compose with ``exact_dedup`` on ``skeleton_digest`` for the actual
    collapse."""
    skel = homoglyph_skeleton(F.col(text_col))
    # confusable count by translate-DELETE (chars in `from` with no `to`
    # counterpart are removed — SQL translate semantics on both engines)
    diff = (F.length(F.col(text_col))
            - F.length(F.translate(F.col(text_col), HOMOGLYPH_FROM, "")))
    return df.select(
        id_col,
        F.md5(F.col(text_col)).alias("raw_digest"),
        F.md5(skel).alias("skeleton_digest"),
        diff.cast("long").alias("n_confusable_chars"),
        (diff > 0).alias("is_cloaked"),
    )


def rouge_n(
    df: DataFrame,
    cand_col: str,
    ref_col: str,
    n: int = 1,
    id_col: str = "pair_id",
) -> DataFrame:
    """ROUGE-N overlap between a candidate and a reference text per
    pair (Lin 2004) — the summarization/generation eval staple: clipped
    word-n-gram overlap with precision, recall, and F1. Feed it the
    (generated, gold) join of an eval run; it's also a sharp
    paraphrase-vs-copy screen between corpus versions.

    Exactness: the clipped overlap ``Σ_g min(c_cand(g), c_ref(g))`` and
    both gram totals are exact integers; precision/recall are one
    double division each, and F1 uses the algebraic identity
    ``2·overlap/(n_cand + n_ref)`` (equal to 2PR/(P+R) for these
    definitions) so it is ALSO a single correctly-rounded division —
    no float composition anywhere, bit-identical across engines.
    Zero-gram sides report NULL for the affected metric; pairs with no
    grams on either side (both texts shorter than ``n`` tokens) emit no
    row.

    Scale shape: gram construction is map-only (transform over token
    slices); BOTH sides' grams leave one fused explode as tagged
    (gram, cand_hit, ref_hit) rows, so the input is read once and the
    counting shuffles once at the (pair, gram) grain — never a per-pair
    collect — then one partial-agg rollup to the pair grain. (The
    previous shape ran the upstream frame twice — once per side — and
    re-aligned the two count frames with a full outer join: one extra
    pass over the input and one extra shuffle for the same integers.)"""
    if n < 1:
        raise ValueError(f"n must be >= 1, got {n}")

    def grams(col: str) -> Column:
        # normalized tokens (lowercase, punctuation stripped) — the
        # standard ROUGE preprocessing and the fingerprinting canon.
        # let-bound so the tokenization runs once per row, not once per
        # gram (the nested-HOF re-evaluation trap — see let_bind)
        toks = F.filter(F.split(normalize_text(F.col(col)), r"\s+"),
                        lambda x: x != "")

        def build(t: Column) -> Column:
            cnt = F.size(t) - n + 1
            # guard: F.sequence(1, 0) generates DESCENDING [1, 0], so a
            # too-short text must return an empty gram array explicitly
            return F.when(
                cnt >= 1,
                F.transform(F.sequence(F.lit(1), cnt),
                            lambda i: F.concat_ws(" ", F.slice(t, i, n))),
            ).otherwise(F.array().cast("array<string>"))

        return let_bind(toks, build)

    tagged = df.select(
        id_col,
        F.explode(F.concat(
            F.transform(grams(cand_col),
                        lambda g: F.struct(g.alias("g"),
                                           F.lit(1).alias("c"),
                                           F.lit(0).alias("r"))),
            F.transform(grams(ref_col),
                        lambda g: F.struct(g.alias("g"),
                                           F.lit(0).alias("c"),
                                           F.lit(1).alias("r"))),
        )).alias("_t"),
    )
    per_gram = (
        tagged.groupBy(id_col, F.col("_t.g").alias("_g"))
        .agg(F.sum("_t.c").cast("long").alias("_cc"),
             F.sum("_t.r").cast("long").alias("_cr"))
    )
    per = per_gram.groupBy(id_col).agg(
        F.sum("_cc").cast("long").alias("n_cand"),
        F.sum("_cr").cast("long").alias("n_ref"),
        F.sum(F.least("_cc", "_cr")).cast("long").alias("overlap"),
    )
    o = F.col("overlap").cast("double")
    return per.select(
        id_col, "n_cand", "n_ref", "overlap",
        F.when(F.col("n_cand") > 0,
               o / F.col("n_cand").cast("double")).alias("precision"),
        F.when(F.col("n_ref") > 0,
               o / F.col("n_ref").cast("double")).alias("recall"),
        F.when(F.col("n_cand") + F.col("n_ref") > 0,
               F.lit(2.0) * o
               / (F.col("n_cand") + F.col("n_ref")).cast("double"))
        .alias("f1"),
    )


def dsir_weights(
    raw: DataFrame,
    target: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 2,
    prefix_hex: int = 3,
    alpha: float = 1.0,
    hash: str = "md5",
) -> DataFrame:
    """DSIR importance weights (Data Selection via Importance
    Resampling, Xie et al. 2023): score every RAW document by the
    log-likelihood ratio of a hashed-n-gram multinomial fitted on the
    TARGET corpus vs one fitted on the raw corpus —
    ``log w(x) = Σ_g c_x(g)·(log p_t(bucket(g)) − log p_r(bucket(g)))``.
    High-weight docs "look like" the target domain; feed the weights to
    :mod:`sampling`'s ``weighted_sample_k`` for the resampling step.

    Buckets are the first ``prefix_hex`` hex chars of ``md5(gram)``
    (16^prefix_hex buckets — md5 is available and bit-identical in
    every engine, so results are SQL-oracle-checkable); pass
    ``hash='xxhash64'`` for the production fast path (same bucket
    count via pmod, ~2-3x cheaper per gram, no cross-engine twin).
    Both models are Laplace-smoothed with ``alpha``. Grams are word
    1..n-grams over normalized tokens (the paper's unigram+bigram
    default at n=2).

    Engine parity: all bucket counts are exact integers; each bucket's
    log-ratio is one pinned double tree; the per-doc sum folds the
    (bucket, count) pairs in SORTED bucket order (partitioning cannot
    reorder the addition — the nDCG precedent) and is rounded to 10 dp
    at the libm log boundary.

    Scale shape: gram construction is map-only; the two model fits are
    one partial-agg shuffle each onto the BOUNDED bucket space
    (≤ 16^prefix_hex rows — broadcastable by construction); scoring
    joins each doc's per-bucket counts (one (doc, bucket) partial agg)
    to the broadcast model and folds per doc. No collect, no cartesian."""
    if n < 1:
        raise ValueError(f"n must be >= 1, got {n}")
    if not 1 <= prefix_hex <= 8:
        raise ValueError(f"prefix_hex must be in 1..8, got {prefix_hex}")
    if alpha <= 0:
        raise ValueError(f"alpha must be > 0, got {alpha}")
    if hash not in ("md5", "xxhash64"):
        raise ValueError(f"hash must be md5|xxhash64, got {hash!r}")
    n_buckets = 16 ** prefix_hex

    def buckets(col: str) -> Column:
        # let-bound so the tokenization runs once per row, not once per
        # gram (the nested-HOF re-evaluation trap — see let_bind)
        toks = F.filter(F.split(normalize_text(F.col(col)), r"\s+"),
                        lambda x: x != "")

        def build(t: Column) -> Column:
            def gram_bucket(k: int):
                # closure factory, NOT a default arg: pyspark counts
                # lambda params to bind higher-order functions, so
                # `lambda i, k=k` would bind as the (element, index)
                # two-arg form
                if hash == "xxhash64":
                    return lambda i: F.pmod(
                        F.xxhash64(F.concat_ws(" ", F.slice(t, i, k))),
                        F.lit(n_buckets)).cast("string")
                return lambda i: F.substring(
                    F.md5(F.concat_ws(" ", F.slice(t, i, k))), 1, prefix_hex)

            out = None
            for k in range(1, n + 1):
                cnt = F.size(t) - k + 1
                g = F.when(
                    cnt >= 1,
                    F.transform(F.sequence(F.lit(1), cnt), gram_bucket(k)),
                ).otherwise(F.array().cast("array<string>"))
                out = g if out is None else F.concat(out, g)
            return out

        return let_bind(toks, build)

    def model(df: DataFrame, total_name: str, cnt_name: str) -> DataFrame:
        per = (
            df.select(F.explode(buckets(text_col)).alias("_b"))
            .groupBy("_b").agg(F.count(F.lit(1)).cast("long").alias(cnt_name))
        )
        w = Window.rowsBetween(Window.unboundedPreceding,
                               Window.unboundedFollowing)
        return per.withColumn(
            total_name, F.sum(cnt_name).over(w).cast("long"))

    from pyspark.sql import Window

    t_model = model(target, "_nt", "_ct")
    # raw corpus is tokenized/hashed ONCE: the per-doc bucket counts are
    # computed first and the raw model is their bounded-bucket rollup
    # (re-scanning raw for its own model would double the dominant cost)
    doc_b = (
        raw.select(F.col(id_col), F.explode(buckets(text_col)).alias("_b"))
        .groupBy(id_col, "_b")
        .agg(F.count(F.lit(1)).cast("long").alias("_c"))
        # doc_b feeds BOTH the raw model and the scoring join; the lazy
        # localCheckpoint pins one materialization (the hot_keys
        # precedent) instead of trusting exchange reuse under AQE
        .localCheckpoint(eager=False)
    )
    wraw = Window.rowsBetween(Window.unboundedPreceding,
                              Window.unboundedFollowing)
    r_model = (
        doc_b.groupBy("_b").agg(F.sum("_c").cast("long").alias("_cr"))
        .withColumn("_nr", F.sum("_cr").over(wraw).cast("long"))
    )
    # full outer join on the bounded bucket space; absent buckets get
    # count 0 (the smoothing keeps the log finite). Totals are constant
    # per side, so re-broadcast via a max window after the join.
    wall = Window.rowsBetween(Window.unboundedPreceding,
                              Window.unboundedFollowing)
    m = (
        t_model.join(r_model, "_b", "full")
        .withColumn("_nt", F.max("_nt").over(wall))
        .withColumn("_nr", F.max("_nr").over(wall))
        .select(
            "_b",
            (
                F.log((F.coalesce("_ct", F.lit(0)).cast("double")
                       + F.lit(float(alpha)))
                      / (F.col("_nt").cast("double")
                         + F.lit(float(alpha * n_buckets))))
                - F.log((F.coalesce("_cr", F.lit(0)).cast("double")
                         + F.lit(float(alpha)))
                        / (F.col("_nr").cast("double")
                           + F.lit(float(alpha * n_buckets))))
            ).alias("_lr"),
        )
    )
    scored = doc_b.join(F.broadcast(m), "_b")
    per_doc = scored.groupBy(id_col).agg(
        F.sum("_c").cast("long").alias("n_grams"),
        F.sort_array(F.collect_list(F.struct(
            F.col("_b").alias("b"), F.col("_c").alias("c"),
            F.col("_lr").alias("lr")))).alias("_terms"),
    )
    fold = F.aggregate(
        "_terms", F.lit(0.0),
        lambda acc, x: acc + x["c"].cast("double") * x["lr"])
    return per_doc.select(
        id_col, "n_grams", F.round(fold, 10).alias("log_weight"))


def tokenizer_fertility(
    df: DataFrame,
    group_col: str = "lang",
    text_col: str = "text",
) -> DataFrame:
    """Per-group tokenizer fertility report — the standard tokenizer-
    equity diagnostic (how many subword tokens per word, and how many
    bytes per subword token, each language pays under the tokenizer):
    high-fertility languages get fewer effective context tokens and
    higher serving cost, which is why multilingual tokenizer papers
    table exactly these ratios. Uses the repo's deterministic BPE-ish
    ``subword_count`` regex as the tokenizer proxy.

    Exactness: word / subword / byte counts are exact integers summed
    exactly; the two fertility ratios are one double division each.

    Scale shape: map-only counting + ONE partial-agg shuffle at the
    group grain (O(groups) result)."""
    words = token_count(F.col(text_col))
    subs = subword_count(F.col(text_col))
    octs = F.octet_length(F.col(text_col))
    agg = (
        df.filter(F.col(text_col).isNotNull()
                  & (F.trim(F.col(text_col)) != ""))
        .groupBy(group_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum(words).cast("long").alias("n_words"),
            F.sum(subs).cast("long").alias("n_subwords"),
            F.sum(octs).cast("long").alias("n_bytes"),
        )
    )
    return agg.select(
        group_col, "n_docs", "n_words", "n_subwords", "n_bytes",
        F.when(F.col("n_words") > 0,
               F.col("n_subwords").cast("double")
               / F.col("n_words").cast("double")).alias("fertility"),
        F.when(F.col("n_subwords") > 0,
               F.col("n_bytes").cast("double")
               / F.col("n_subwords").cast("double"))
        .alias("bytes_per_subword"),
    )
