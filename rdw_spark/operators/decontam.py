"""Eval-set decontamination: remove training documents that share n-gram
runs with a benchmark/eval set.

The standard pre-training hygiene step (the keyed train/eval split in
``operators.sampling`` guards against *internal* leakage; this operator
guards against *external* benchmarks whose text may appear verbatim or
near-verbatim inside crawled training documents).

Scale shape: both sides reduce to hashed distinct n-gram rows (the same
``shingles(hashed=True)`` explode the dedup tier uses — 8-byte longs, not
gram strings), the overlap is one equality join on the gram hash, and the
pair aggregation is a partial-agg groupBy. Eval sets are typically tiny
next to the corpus (thousands of benchmark items vs 10^9 docs), so
``broadcast_eval=True`` ships the eval gram index to every executor and
the whole check becomes map-side against the training scan — zero
shuffle of training grams. Hot grams (boilerplate shared by everything)
can be capped out of the index exactly like the Jaccard stop-shingles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .dedup import shingles


def contamination_pairs(
    train: DataFrame,
    eval_df: DataFrame,
    n: int = 8,
    min_common: int = 1,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_gram_freq: int | None = None,
    broadcast_eval: bool = False,
) -> DataFrame:
    """(train_id, eval_id, n_common): every train/eval document pair
    sharing at least ``min_common`` DISTINCT word n-grams. ``n=8``-ish
    catches verbatim benchmark sentences while ignoring common phrases;
    lower n with a higher ``min_common`` approximates fuzzy overlap.

    ``max_gram_freq`` drops grams appearing in more than that many TRAIN
    documents from the index (stop-gram cap — a boilerplate gram shared by
    10^7 docs must not build a quadratic bucket); ``broadcast_eval`` hints
    the (small) eval gram index to a broadcast join."""
    tg = shingles(train, n, text_col, id_col, hashed=True)
    if max_gram_freq is not None:
        tg = (
            tg.withColumn(
                "_df", F.count("*").over(Window.partitionBy("shingle"))
            )
            .filter(F.col("_df") <= max_gram_freq)
            .drop("_df")
        )
    eg = shingles(eval_df, n, text_col, id_col, hashed=True).select(
        F.col(id_col).alias("eval_id"), "shingle"
    )
    if broadcast_eval:
        eg = F.broadcast(eg)
    return (
        tg.join(eg, "shingle")
        .groupBy(F.col(id_col).alias("train_id"), "eval_id")
        .agg(F.count("*").alias("n_common"))
        .filter(F.col("n_common") >= min_common)
    )


def decontaminate(
    train: DataFrame,
    eval_df: DataFrame,
    n: int = 8,
    min_common: int = 1,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_gram_freq: int | None = None,
    broadcast_eval: bool = False,
) -> dict[str, DataFrame]:
    """Drop contaminated training documents. Returns ``clean`` (the
    surviving training rows) and ``dropped`` (doc_id, n_eval_docs,
    n_common_total — the auditable contamination report, mirroring the
    corpus build's per-stage drop accounting)."""
    pairs = contamination_pairs(
        train, eval_df, n, min_common, text_col, id_col,
        max_gram_freq, broadcast_eval,
    )
    dropped = pairs.groupBy(F.col("train_id").alias(id_col)).agg(
        F.count("*").alias("n_eval_docs"),
        F.sum("n_common").alias("n_common_total"),
    )
    clean = train.join(dropped.select(id_col), id_col, "left_anti")
    return {"clean": clean, "dropped": dropped}
