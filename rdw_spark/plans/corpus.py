"""End-to-end training-corpus build: the composition proof that the
training-data operators work as ONE pipeline, not just as isolated
catalog entries.

Stages (each the scale-path variant):
  1. quality filter   — map-only keep/drop with reasons (auditable)
  2. exact dedup      — one digest shuffle, min-id canonical
  3. near-dup resolve — MinHash-LSH pairs -> connected components ->
                        keep the min-id canonical per cluster
  4. train/eval split — deterministic keyed split (contamination guard)

Returns the per-stage survivor counts alongside the final frames so a
run is auditable end to end (how many docs each stage dropped and why is
the first question any corpus build gets asked).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

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
) -> dict:
    """Run the full pipeline over ``docs``. Returns a dict with ``train``,
    ``eval`` DataFrames, the ``drop_report`` (doc_id, stage, detail), and
    ``counts`` per stage.

    ``eval_benchmarks`` (doc_id, text) adds the external-benchmark
    decontamination stage after near-dup resolution: documents sharing
    >= ``decontam_min_common`` distinct ``decontam_ngram``-grams with any
    benchmark item are dropped (stage ``contaminated``) before the
    train/eval split — the keyed split guards internal leakage, this
    guards published benchmarks."""
    n0 = docs.count()

    q = X.quality_filter(docs, quality_thresholds).cache()
    kept_q = q.filter("q_keep").select(docs.columns)
    drop_quality = q.filter("NOT q_keep").select(
        F.col(id_col), F.lit("quality").alias("stage"),
        F.concat_ws(",", "q_reasons").alias("detail"),
    )
    n1 = kept_q.count()

    exact = D.exact_duplicates(kept_q, id_col=id_col).cache()
    kept_e = kept_q.join(
        exact.filter("is_canonical").select(id_col), id_col, "left_semi"
    )
    drop_exact = exact.filter("NOT is_canonical").select(
        F.col(id_col), F.lit("exact_dup").alias("stage"),
        F.col("canonical_id").cast("string").alias("detail"),
    )
    n2 = kept_e.count()

    pairs = D.minhash_dedup_pairs(kept_e, threshold=minhash_threshold,
                                  id_col=id_col)
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

    if eval_benchmarks is not None:
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
    else:
        drop_contam = None
    n3d = kept_n.count() if eval_benchmarks is not None else n3

    train, ev = SA.split_train_eval(kept_n, id_col, eval_fraction)
    drop_report = drop_quality.unionByName(drop_exact).unionByName(drop_near)
    if drop_contam is not None:
        drop_report = drop_report.unionByName(drop_contam)
    counts_train, counts_eval = train.count(), ev.count()
    # the caches only serve the multi-consumer stage fan-out above; every
    # count is materialized by now, so don't pin executor memory for the
    # caller (returned frames recompute from source if re-consumed)
    q.unpersist()
    exact.unpersist()
    return {
        "train": train,
        "eval": ev,
        "drop_report": drop_report,
        "counts": {
            "input": n0,
            "after_quality": n1,
            "after_exact_dedup": n2,
            "after_near_dedup": n3,
            "after_decontam": n3d,
            "train": counts_train,
            "eval": counts_eval,
        },
    }


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
