"""End-to-end training-corpus build: the composition proof that the
training-data operators work as ONE pipeline, not just as isolated
catalog entries.

Stages (each the scale-path variant):
  1. quality filter   — map-only keep/drop with reasons (auditable)
  2. exact dedup      — one digest shuffle, min-id canonical
  3. near-dup resolve — MinHash-LSH pairs -> connected components ->
                        keep the min-id canonical per cluster
  4. span surgery     — (opt-in) duplicated token windows cut from the
                        survivors, one global copy kept
  5. train/eval split — deterministic keyed split (contamination guard)

Returns the per-stage survivor counts alongside the final frames so a
run is auditable end to end (how many docs each stage dropped and why is
the first question any corpus build gets asked).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

import time as _time

from ..io import load_table
from ..operators import dedup as D
from ..operators import sampling as SA
from ..operators import text as X
from .registry import register


def build_corpus(
    docs: DataFrame,
    quality_thresholds: dict | None = None,
    minhash_threshold: float = 0.7,
    eval_fraction: float = 0.01,
    id_col: str = "doc_id",
    eval_benchmarks: DataFrame | None = None,
    decontam_ngram: int = 8,
    decontam_min_common: int = 1,
    repetition_thresholds: dict | None = None,
    compression_bounds: tuple | None = None,
    pii_mode: str | None = None,
    embeddings: DataFrame | None = None,
    cosine_threshold: float = 0.95,
    embedding_block_bits: int = 8,
    span_dedup_n: int | None = None,
    checkpoint_root: str | None = None,
    normalize_unicode: str | None = None,
    boilerplate_min_docs: int | None = None,
) -> dict:
    """Run the full pipeline over ``docs``. Returns a dict with ``train``,
    ``eval`` DataFrames, the ``drop_report`` (doc_id, stage, detail), and
    ``counts`` per stage.

    ``eval_benchmarks`` (doc_id, text) adds the external-benchmark
    decontamination stage after near-dup resolution: documents sharing
    >= ``decontam_min_common`` distinct ``decontam_ngram``-grams with any
    benchmark item are dropped (stage ``contaminated``) before the
    train/eval split — the keyed split guards internal leakage, this
    guards published benchmarks.

    ``repetition_thresholds`` (keys ``max_dup_line_frac`` /
    ``max_top_gram_frac``, defaults 0.3 / 0.2) switches on the Gopher-style
    repetition stage after the quality filter (stage ``repetition``).
    ``compression_bounds`` (lo, hi) switches on the zlib
    compression-ratio screen after repetition (stage ``compression``):
    documents whose ratio falls below ``lo`` (templated/machine spam the
    n-gram counters can miss) or above ``hi`` (binary junk / high-entropy
    noise) drop; NULL ratios (empty text) drop too.

    ``pii_mode`` handles PII before any dedup (so dedup sees the text that
    will actually ship): ``"redact"`` rewrites ``text`` with the pattern
    tokens and drops nothing; ``"drop"`` removes any document with a PII
    hit (stage ``pii``).

    ``embeddings`` (``id_col``, ``embedding array<float>``) adds SEMANTIC
    near-dup pairs: cosine >= ``cosine_threshold`` within SRP buckets
    (``embedding_block_bits`` sign-projections — the documented blocking
    path, never an unblocked cross join), unioned with the MinHash pairs
    before the one cluster resolution, so paraphrases the lexical path
    can't see collapse into the same clusters.

    ``span_dedup_n`` switches on span-level substring surgery AFTER the
    document-level stages (doc-level dedup first — a whole-doc duplicate
    should drop as one unit, not be shredded window by window): duplicated
    ``span_dedup_n``-token windows are cut out of the surviving documents
    (one global copy kept), and documents left empty by the cut drop with
    stage ``span_dedup``.

    ``checkpoint_root`` makes the build RESUMABLE (``plans/stagestore``):
    each completed stage's kept/drop frames persist under
    ``root/<config-fingerprint>/<stage>/`` with a marker written last, a
    re-run with the same root + config loads every completed stage and
    computes only from the first missing one, and downstream stages read
    the persisted parquet instead of the live lineage (a lineage cut — at
    scale the 9-stage DAG never re-executes stage 1 per downstream
    action). ``eval_fraction`` is deliberately OUTSIDE the fingerprint:
    the split is map-only, so re-splitting reuses every dedup stage.

    ``normalize_unicode`` ("NFC" or "NFKC") runs unicode normalization +
    control-char stripping FIRST — before quality and dedup — so
    decomposed/precomposed/width variants of the same document collapse
    to one byte form and can't defeat the exact or shingle stages
    (``functions/scalars.unicode_normalize``; nothing drops here).

    ``boilerplate_min_docs`` switches on C4-style boilerplate-line
    removal right after normalization (before quality, so quality scores
    the text that will actually ship): lines occurring in >= that many
    distinct documents are cut from every document; documents left empty
    drop with stage ``boilerplate``."""
    if pii_mode not in (None, "redact", "drop"):
        raise ValueError(f"pii_mode must be None/'redact'/'drop', got {pii_mode!r}")
    if normalize_unicode not in (None, "NFC", "NFKC"):
        raise ValueError(
            f"normalize_unicode must be None/'NFC'/'NFKC', got {normalize_unicode!r}"
        )
    ck = None
    if checkpoint_root is not None:
        from .stagestore import StageStore

        ck = StageStore(docs.sparkSession, checkpoint_root, {
            "pipeline": "build_corpus",
            "quality_thresholds": quality_thresholds,
            "minhash_threshold": minhash_threshold,
            "id_col": id_col,
            "has_benchmarks": eval_benchmarks is not None,
            "decontam_ngram": decontam_ngram,
            "decontam_min_common": decontam_min_common,
            "repetition_thresholds": repetition_thresholds,
            "compression_bounds": list(compression_bounds)
            if compression_bounds is not None else None,
            "pii_mode": pii_mode,
            "has_embeddings": embeddings is not None,
            "cosine_threshold": cosine_threshold,
            "embedding_block_bits": embedding_block_bits,
            "span_dedup_n": span_dedup_n,
            "normalize_unicode": normalize_unicode,
            "boilerplate_min_docs": boilerplate_min_docs,
        })
    _caches: list[DataFrame] = []

    def _empty_drops() -> DataFrame:
        return docs.select(F.col(id_col)).limit(0).select(
            F.col(id_col), F.lit("").alias("stage"), F.lit("").alias("detail")
        )

    _tl = [("start", _time.perf_counter())]
    n0 = docs.count()
    _tl.append(("input_count", _time.perf_counter()))

    if normalize_unicode is not None:
        if ck is not None and ck.has("normalize"):
            docs = ck.load("normalize", ["kept"])["kept"]
        else:
            from ..functions.scalars import unicode_normalize

            docs = docs.withColumn(
                "text", unicode_normalize(F.col("text"), form=normalize_unicode)
            )
            if ck is not None:
                docs = ck.save("normalize", {"kept": docs})["kept"]
        _tl.append(("normalize", _time.perf_counter()))

    pre_drops: list[DataFrame] = []
    if boilerplate_min_docs is not None:
        if ck is not None and ck.has("boilerplate"):
            fr = ck.load("boilerplate", ["kept", "drops"])
            docs = fr["kept"]
            pre_drops.append(fr["drops"])
        else:
            bp = X.strip_boilerplate_lines(
                docs, min_docs=boilerplate_min_docs, id_col=id_col
            )
            docs = (
                docs.drop("text")
                .join(bp.filter(F.trim("clean_text") != "")
                      .select(id_col, F.col("clean_text").alias("text")),
                      id_col)
                .select(*[c for c in docs.columns])
            )
            drop_bp = bp.filter(F.trim("clean_text") == "").select(
                F.col(id_col), F.lit("boilerplate").alias("stage"),
                F.col("n_lines_removed").cast("string").alias("detail"),
            )
            if ck is not None:
                fr = ck.save("boilerplate", {"kept": docs, "drops": drop_bp})
                docs, drop_bp = fr["kept"], fr["drops"]
            pre_drops.append(drop_bp)
        _tl.append(("boilerplate", _time.perf_counter()))

    if ck is not None and ck.has("quality"):
        fr = ck.load("quality", ["kept", "drops"])
        kept_q, drop_quality = fr["kept"], fr["drops"]
        n1 = ck.stats("quality")["n_kept"]
    else:
        q = X.quality_filter(docs, quality_thresholds).cache()
        _caches.append(q)
        kept_q = q.filter("q_keep").select(docs.columns)
        drop_quality = q.filter("NOT q_keep").select(
            F.col(id_col), F.lit("quality").alias("stage"),
            F.concat_ws(",", "q_reasons").alias("detail"),
        )
        n1 = kept_q.count()
        if ck is not None:
            fr = ck.save("quality", {"kept": kept_q, "drops": drop_quality},
                         {"n_kept": n1})
            kept_q, drop_quality = fr["kept"], fr["drops"]
    _tl.append(("quality", _time.perf_counter()))

    extra_drops: list[DataFrame] = []
    n1r = n1
    if repetition_thresholds is not None:
        if ck is not None and ck.has("repetition"):
            fr = ck.load("repetition", ["kept", "drops"])
            kept_q = fr["kept"]
            extra_drops.append(fr["drops"])
            n1r = ck.stats("repetition")["n_kept"]
        else:
            t = {"max_dup_line_frac": 0.3, "max_top_gram_frac": 0.2,
                 **repetition_thresholds}
            rep = X.repetition_features(kept_q).select(id_col, "rep_dup_line_frac")
            top = X.top_ngram_repetition(kept_q).select(id_col, "top_gram_frac")
            bad = (
                rep.join(top, id_col, "left")
                .filter(
                    (F.col("rep_dup_line_frac") > t["max_dup_line_frac"])
                    | (F.col("top_gram_frac") > t["max_top_gram_frac"])
                )
            )
            drop_rep = bad.select(
                F.col(id_col), F.lit("repetition").alias("stage"),
                F.concat_ws(
                    ",", F.round("rep_dup_line_frac", 4).cast("string"),
                    F.round("top_gram_frac", 4).cast("string"),
                ).alias("detail"),
            )
            kept_q = kept_q.join(bad.select(id_col), id_col, "left_anti")
            n1r = kept_q.count()
            if ck is not None:
                fr = ck.save("repetition", {"kept": kept_q, "drops": drop_rep},
                             {"n_kept": n1r})
                kept_q, drop_rep = fr["kept"], fr["drops"]
            extra_drops.append(drop_rep)
    _tl.append(("repetition", _time.perf_counter()))

    n1c = n1r
    if compression_bounds is not None:
        lo, hi = compression_bounds
        if ck is not None and ck.has("compression"):
            fr = ck.load("compression", ["kept", "drops"])
            kept_q = fr["kept"]
            extra_drops.append(fr["drops"])
            n1c = ck.stats("compression")["n_kept"]
        else:
            cr = X.compression_ratio(kept_q, id_col=id_col).select(
                id_col, "ratio")
            bad_c = cr.filter(
                F.col("ratio").isNull()
                | (F.col("ratio") < lo) | (F.col("ratio") > hi))
            drop_c = bad_c.select(
                F.col(id_col), F.lit("compression").alias("stage"),
                F.round("ratio", 4).cast("string").alias("detail"),
            )
            kept_q = kept_q.join(bad_c.select(id_col), id_col, "left_anti")
            n1c = kept_q.count()
            if ck is not None:
                fr = ck.save("compression", {"kept": kept_q, "drops": drop_c},
                             {"n_kept": n1c})
                kept_q, drop_c = fr["kept"], fr["drops"]
            extra_drops.append(drop_c)
    _tl.append(("compression", _time.perf_counter()))

    n_pii = 0
    if pii_mode is not None:
        if ck is not None and ck.has("pii"):
            fr = ck.load("pii", ["kept", "drops"])
            kept_q = fr["kept"]
            if pii_mode == "drop":
                extra_drops.append(fr["drops"])
            n_pii = ck.stats("pii")["n_pii"]
        else:
            scan = X.pii_scan(kept_q, id_col=id_col)
            drop_pii = _empty_drops()
            if pii_mode == "drop":
                hits = scan.filter("pii_total > 0")
                drop_pii = hits.select(
                    F.col(id_col), F.lit("pii").alias("stage"),
                    F.concat_ws(
                        ",", F.col("n_email").cast("string"),
                        F.col("n_ssn").cast("string"),
                        F.col("n_phone").cast("string"),
                        F.col("n_ipv4").cast("string"),
                    ).alias("detail"),
                )
                n_pii = hits.count()
                kept_q = kept_q.join(hits.select(id_col), id_col, "left_anti")
            else:  # redact: rewrite text in place, nothing drops
                n_pii = scan.filter("pii_total > 0").count()
                kept_q = (
                    kept_q.drop("text")
                    .join(scan.select(id_col, F.col("pii_redacted").alias("text")),
                          id_col)
                    .select(docs.columns)
                )
            if ck is not None:
                fr = ck.save("pii", {"kept": kept_q, "drops": drop_pii},
                             {"n_pii": n_pii})
                kept_q, drop_pii = fr["kept"], fr["drops"]
            if pii_mode == "drop":
                extra_drops.append(drop_pii)

    if ck is not None and ck.has("exact"):
        fr = ck.load("exact", ["kept", "drops"])
        kept_e, drop_exact = fr["kept"], fr["drops"]
        n2 = ck.stats("exact")["n_kept"]
        _tl.append(("pii", _time.perf_counter()))
    else:
        exact = D.exact_duplicates(kept_q, id_col=id_col).cache()
        _caches.append(exact)
        kept_e = kept_q.join(
            exact.filter("is_canonical").select(id_col), id_col, "left_semi"
        )
        drop_exact = exact.filter("NOT is_canonical").select(
            F.col(id_col), F.lit("exact_dup").alias("stage"),
            F.col("canonical_id").cast("string").alias("detail"),
        )
        _tl.append(("pii", _time.perf_counter()))
        n2 = kept_e.count()
        if ck is not None:
            fr = ck.save("exact", {"kept": kept_e, "drops": drop_exact},
                         {"n_kept": n2})
            kept_e, drop_exact = fr["kept"], fr["drops"]
    _tl.append(("exact_dedup", _time.perf_counter()))

    if ck is not None and ck.has("near"):
        fr = ck.load("near", ["kept", "drops"])
        kept_n, drop_near = fr["kept"], fr["drops"]
        st = ck.stats("near")
        n3, n_sem_pairs = st["n_kept"], st["n_sem_pairs"]
    else:
        pairs = D.minhash_dedup_pairs(kept_e, threshold=minhash_threshold,
                                      id_col=id_col).select("a", "b")
        n_sem_pairs = 0
        if embeddings is not None:
            from ..operators.similarity import srp_bucket

            emb = embeddings.join(kept_e.select(id_col), id_col, "left_semi")
            first = emb.select("embedding").first()
            if first is not None:
                emb = emb.withColumn(
                    "_blk", srp_bucket(F.col("embedding"),
                                       bits=embedding_block_bits,
                                       dim=len(first[0])),
                )
                sem = D.embedding_near_duplicates(
                    emb, cosine_threshold, id_col=id_col, vec_col="embedding",
                    block_col="_blk",
                ).select("a", "b")
                n_sem_pairs = sem.count()
                pairs = pairs.unionByName(sem).distinct()
        kept_n = D.dedup_corpus(kept_e, pairs, id_col=id_col)
        cc = D.connected_components(pairs)
        drop_near = (
            cc.filter(F.col("node") != F.col("cluster_id"))
            .select(
                F.col("node").alias(id_col), F.lit("near_dup").alias("stage"),
                F.col("cluster_id").cast("string").alias("detail"),
            )
        )
        n3 = kept_n.count()
        if ck is not None:
            fr = ck.save("near", {"kept": kept_n, "drops": drop_near},
                         {"n_kept": n3, "n_sem_pairs": n_sem_pairs})
            kept_n, drop_near = fr["kept"], fr["drops"]
    _tl.append(("near_dedup", _time.perf_counter()))

    drop_contam = None
    n3d = n3
    if eval_benchmarks is not None:
        if ck is not None and ck.has("decontam"):
            fr = ck.load("decontam", ["kept", "drops"])
            kept_n, drop_contam = fr["kept"], fr["drops"]
            n3d = ck.stats("decontam")["n_kept"]
        else:
            from ..operators.decontam import decontaminate

            res = decontaminate(
                kept_n, eval_benchmarks, n=decontam_ngram,
                min_common=decontam_min_common, id_col=id_col,
                broadcast_eval=True,  # benchmark sets are tiny next to the corpus
            )
            kept_n = res["clean"]
            drop_contam = res["dropped"].select(
                F.col(id_col), F.lit("contaminated").alias("stage"),
                F.concat_ws(
                    ",", F.col("n_eval_docs").cast("string"),
                    F.col("n_common_total").cast("string"),
                ).alias("detail"),
            )
            n3d = kept_n.count()
            if ck is not None:
                fr = ck.save("decontam", {"kept": kept_n, "drops": drop_contam},
                             {"n_kept": n3d})
                kept_n, drop_contam = fr["kept"], fr["drops"]
    _tl.append(("decontam", _time.perf_counter()))

    n_span_docs = 0
    n3s = n3d
    if span_dedup_n is not None:
        if ck is not None and ck.has("span"):
            fr = ck.load("span", ["kept", "drops"])
            kept_n = fr["kept"]
            extra_drops.append(fr["drops"])
            st = ck.stats("span")
            n_span_docs, n3s = st["n_span_docs"], st["n_kept"]
        else:
            sp = D.remove_duplicated_spans(kept_n, n=span_dedup_n, id_col=id_col)
            sp = sp.cache()  # feeds the affected count, the drop rows, AND kept
            _caches.append(sp)
            n_span_docs = sp.filter("n_tokens_dropped > 0").count()
            emptied = sp.filter(F.trim(F.col("clean_text")) == "")
            drop_span = emptied.select(
                F.col(id_col), F.lit("span_dedup").alias("stage"),
                F.col("n_tokens_dropped").cast("string").alias("detail"),
            )
            kept_n = (
                sp.filter(F.trim(F.col("clean_text")) != "")
                .drop("text")
                .withColumnRenamed("clean_text", "text")
                .select(docs.columns)
            )
            n3s = kept_n.count()
            if ck is not None:
                fr = ck.save("span", {"kept": kept_n, "drops": drop_span},
                             {"n_span_docs": n_span_docs, "n_kept": n3s})
                kept_n, drop_span = fr["kept"], fr["drops"]
            extra_drops.append(drop_span)
    _tl.append(("span_dedup", _time.perf_counter()))

    train, ev = SA.split_train_eval(kept_n, id_col, eval_fraction)
    drop_report = drop_quality.unionByName(drop_exact).unionByName(drop_near)
    for extra in pre_drops + extra_drops:
        drop_report = drop_report.unionByName(extra)
    if drop_contam is not None:
        drop_report = drop_report.unionByName(drop_contam)
    counts_train, counts_eval = train.count(), ev.count()
    _tl.append(("split", _time.perf_counter()))
    # the caches only serve the multi-consumer stage fan-out above; every
    # count is materialized by now, so don't pin executor memory for the
    # caller (returned frames recompute from source if re-consumed)
    for c in _caches:
        c.unpersist()
    return {
        "train": train,
        "eval": ev,
        "drop_report": drop_report,
        "counts": {
            "input": n0,
            "after_quality": n1,
            "after_repetition": n1r,
            "after_compression": n1c,
            "pii_affected": n_pii,
            "after_exact_dedup": n2,
            "after_near_dedup": n3,
            "semantic_pairs": n_sem_pairs,
            "after_decontam": n3d,
            "span_affected": n_span_docs,
            "after_span_dedup": n3s,
            "train": counts_train,
            "eval": counts_eval,
        },
        # wall seconds per stage (stage boundary = its materializing count)
        # — the first question after "what dropped" is "what was slow"
        "timings": {
            name: round(t - _tl[i][1], 3)
            for i, (name, t) in enumerate(_tl[1:])
        },
    }


def build_training_mix(
    docs: DataFrame,
    token_budget: float,
    stratum_col: str = "lang",
    seq_len: int = 2048,
    id_col: str = "doc_id",
    text_col: str = "text",
    sample_seed: str = "s0",
    shuffle_seed: str = "sh0",
    max_doc_tokens: int | None = None,
) -> dict:
    """The last mile from a cleaned corpus to a training-ready manifest:

      1. token-budget rebalance — every ``stratum_col`` domain downsampled
         to ~``token_budget`` tokens (map-only decisions, auditable rates)
      2. deterministic shuffle  — dense global ``position`` in
         md5(seed||key) order (distributed two-phase rank)
      3. sequence packing       — global token stream ``offset`` and the
         ``seq_len`` training sequences each doc spans

    Feed it ``build_corpus(...)['train']`` for the full quality→dedup→
    decontam→mix chain. Returns ``manifest`` (one row per surviving doc:
    position, offset, first_seq/last_seq/n_seqs) plus the applied
    ``rates``/``totals`` mix report. Every stage is deterministic, so the
    same inputs produce byte-identical manifests on any cluster layout —
    a training run can be resumed or audited from the manifest alone.
    ``max_doc_tokens`` applies the long-document truncation policy before
    the budget (so rates reflect the tokens that actually ship) and in
    the packing plan."""
    from ..operators import packing as PK

    d = docs.filter(F.trim(F.col(text_col)) != "").select(
        F.col(id_col), F.col(stratum_col),
        X.token_count(F.col(text_col)).cast("long").alias("n_tokens"),
    )
    if max_doc_tokens is not None:
        # cap BEFORE the budget so per-stratum rates reflect the tokens
        # that will actually ship; flag here (capping first would erase
        # the evidence the flag needs)
        d = d.withColumn(
            "truncated", F.col("n_tokens") > max_doc_tokens
        ).withColumn(
            "n_tokens", F.least(F.col("n_tokens"), F.lit(max_doc_tokens))
        )
    tb = PK.token_budget_sample(
        d, stratum_col, token_budget, key_col=id_col, seed=sample_seed
    )
    ordered = PK.shuffle_order(tb["sample"], key_col=id_col, seed=shuffle_seed)
    manifest = PK.pack_sequences(ordered, seq_len=seq_len, order_col="position")
    return {"manifest": manifest, "rates": tb["rates"], "totals": tb["totals"]}


def corpus_to_shards(
    docs: DataFrame,
    out_dir: str,
    token_budget: float,
    tokens_per_shard: int | None = None,
    n_shards: int | None = None,
    build_kwargs: dict | None = None,
    mix_kwargs: dict | None = None,
) -> dict:
    """The whole pipeline as one call: raw documents → cleaned corpus
    (``build_corpus``) → budgeted/shuffled/packed manifest
    (``build_training_mix``) → physical training shards + index
    (``write_shards``). Each layer stays independently callable — this is
    the composition a new user runs first, and the shape a scheduled
    production build takes (pass ``checkpoint_root`` in ``build_kwargs``
    to make the expensive dedup stages resumable).

    Returns the corpus dict (train/eval/drop_report/counts/timings) plus
    ``manifest``, ``rates``, ``totals``, and the written ``shard_index``."""
    from ..operators.packing import write_shards

    out = build_corpus(docs, **(build_kwargs or {}))
    mix = build_training_mix(
        out["train"], token_budget=token_budget, **(mix_kwargs or {})
    )
    index = write_shards(
        mix["manifest"], out_dir,
        tokens_per_shard=tokens_per_shard, n_shards=n_shards,
    )
    return {**out, "manifest": mix["manifest"], "rates": mix["rates"],
            "totals": mix["totals"], "shard_index": index}


@register(
    "e2e_training_manifest",
    oracle="""
    WITH t AS (
        SELECT doc_id, lang,
               len(string_split_regex(trim(text), '\\s+')) AS n_tokens
        FROM documents WHERE trim(text) <> ''
    ), tot AS (
        SELECT lang, SUM(n_tokens) AS tw FROM t GROUP BY lang
    ), r AS (
        SELECT lang,
               printf('%08x', LEAST(CAST(floor(LEAST(1.0, 8000.0 / tw)
                                          * 4294967296.0) AS BIGINT),
                                    4294967295)) AS thr
        FROM tot
    ), s AS (
        SELECT t.* FROM t JOIN r USING (lang)
        WHERE substr(md5('s0' || t.lang || '|' || CAST(t.doc_id AS VARCHAR)), 1, 8)
              < r.thr
    ), o AS (
        SELECT *, ROW_NUMBER() OVER (
            ORDER BY substr(md5('sh0' || CAST(doc_id AS VARCHAR)), 1, 8),
                     doc_id) - 1 AS position
        FROM s
    ), c AS (
        SELECT *, SUM(n_tokens) OVER (
            ORDER BY position
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tokens AS off
        FROM o
    )
    SELECT doc_id, lang, CAST(n_tokens AS BIGINT) AS n_tokens,
           CAST(position AS BIGINT) AS position,
           CAST(off AS BIGINT) AS offset,
           CAST(off // 2048 AS BIGINT) AS first_seq,
           CAST((off + n_tokens - 1) // 2048 AS BIGINT) AS last_seq,
           CAST((off + n_tokens - 1) // 2048 - off // 2048 + 1 AS BIGINT) AS n_seqs
    FROM c
    """,
    survey="ext: end-to-end training manifest — token-budget rebalance → "
           "deterministic shuffle order → sequence packing as ONE verified "
           "chain (the dedup stages compose in build_training_mix via "
           "build_corpus; this entry oracle-checks the SQL-expressible "
           "last mile)",
)
def training_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    out = build_training_mix(docs, token_budget=8000.0)
    return out["manifest"].select(
        "doc_id", "lang", "n_tokens", "position", "offset",
        "first_seq", "last_seq", "n_seqs",
    )


def corpus_drift(
    before: DataFrame,
    after: DataFrame,
    stratum_col: str = "lang",
    text_col: str = "text",
) -> DataFrame:
    """Per-stratum mix drift between two corpus snapshots — the
    observability check after any pipeline change: which domains/languages
    gained or lost share. For each stratum: doc and token counts on both
    sides (missing strata read as 0) and the share-of-corpus delta.

    All counts are exact integers; each share is one division and the
    delta one subtraction, so the report is engine-deterministic. Plan:
    two partial-agg shuffles on the stratum, a full-outer join on it, and
    the 1-row totals as broadcast cross joins — no global window."""
    def side(df: DataFrame, tag: str) -> DataFrame:
        return df.groupBy(stratum_col).agg(
            F.count("*").alias(f"n_docs_{tag}"),
            F.sum(X.token_count(F.col(text_col))).alias(f"n_tokens_{tag}"),
        )

    b, a = side(before, "before"), side(after, "after")
    joined = b.join(a, stratum_col, "full_outer").na.fill(0)
    tot_b = joined.select(F.sum("n_docs_before").alias("_tb"))
    tot_a = joined.select(F.sum("n_docs_after").alias("_ta"))
    share_b = F.col("n_docs_before").cast("double") / F.col("_tb")
    share_a = F.col("n_docs_after").cast("double") / F.col("_ta")
    return (
        joined.crossJoin(F.broadcast(tot_b)).crossJoin(F.broadcast(tot_a))
        .select(
            stratum_col, "n_docs_before", "n_docs_after",
            "n_tokens_before", "n_tokens_after",
            share_b.alias("doc_share_before"),
            share_a.alias("doc_share_after"),
            (share_a - share_b).alias("share_delta"),
        )
    )


@register(
    "zz_corpus_drift",
    oracle="""
    WITH aft AS (
        SELECT * FROM documents
        WHERE substr(md5('d0' || CAST(doc_id AS VARCHAR)), 1, 8) < '40000000'
    ), b AS (
        SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs_before,
               CAST(SUM(len(string_split_regex(trim(text), '\\s+'))) AS BIGINT)
                   AS n_tokens_before
        FROM documents GROUP BY lang
    ), a AS (
        SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs_after,
               CAST(SUM(len(string_split_regex(trim(text), '\\s+'))) AS BIGINT)
                   AS n_tokens_after
        FROM aft GROUP BY lang
    ), j AS (
        SELECT COALESCE(b.lang, a.lang) AS lang,
               COALESCE(n_docs_before, 0) AS n_docs_before,
               COALESCE(n_docs_after, 0) AS n_docs_after,
               COALESCE(n_tokens_before, 0) AS n_tokens_before,
               COALESCE(n_tokens_after, 0) AS n_tokens_after
        FROM b FULL OUTER JOIN a ON b.lang = a.lang
    ), t AS (
        SELECT SUM(n_docs_before) AS tb, SUM(n_docs_after) AS ta FROM j
    )
    SELECT j.lang, j.n_docs_before, j.n_docs_after,
           j.n_tokens_before, j.n_tokens_after,
           CAST(j.n_docs_before AS DOUBLE) / t.tb AS doc_share_before,
           CAST(j.n_docs_after AS DOUBLE) / t.ta AS doc_share_after,
           CAST(j.n_docs_after AS DOUBLE) / t.ta
               - CAST(j.n_docs_before AS DOUBLE) / t.tb AS share_delta
    FROM j CROSS JOIN t
    """,
    survey="ext: corpus mix-drift report — per-stratum doc/token counts "
           "and share deltas between two snapshots (exact integers, one "
           "division per share); the after side here is a deterministic "
           "25% hash sample standing in for a second snapshot",
)
def corpus_drift_entry(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    after = SA.hash_sample(d, 0.25, "doc_id", seed="d0")
    return corpus_drift(d, after)


@register(
    "corpus_stats",
    oracle="""
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(len(string_split_regex(trim(text), '\\s+'))) AS BIGINT) AS n_tokens,
           CAST(SUM(length(text)) AS BIGINT) AS n_chars,
           CAST(SUM(CASE WHEN length(text) >= 200 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_quality_len
    FROM documents
    GROUP BY lang
    """,
    survey="ext: corpus observability rollup — per-language doc/token/char "
           "totals and threshold pass counts; map-side partial agg, one "
           "shuffle on lang",
)
def corpus_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return d.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.sum(X.token_count(F.col("text"))).alias("n_tokens"),
        F.sum(F.length("text")).alias("n_chars"),
        F.sum((F.length("text") >= 200).cast("long")).alias("n_quality_len"),
    )
