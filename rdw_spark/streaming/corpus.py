"""Streaming corpus build: continuous ingestion + incremental dedup —
exact AND near-duplicate — without ever rescanning the corpus.

The 100 TB-tier shape: document batches land continuously; each
micro-batch is deduped against the corpus-so-far using maintained,
partition-pruned indexes (never a corpus scan), survivors append to a
partition-store corpus table, and every index grows by an O(batch) merge.

Per-batch work, all O(batch):
  1. optional quality filter (map-only, same stage batch ``build_corpus``
     runs first);
  2. exact dedup against the fingerprint index — the probe reads ONLY the
     digest-prefix buckets the batch's digests land in
     (``PartitionedTable.read(parts=...)`` prunes via the manifest; a
     B-doc batch opens <= B of the prefix buckets);
  3. near-dup dedup against the LSH band index — the batch's band rows
     are probed against only the touched band-hash buckets; candidates
     are verified by MinHash-signature agreement (the signatures live in
     a doc-keyed sig index, also bucket-pruned) and resolved through
     connected components plus the running cluster map, so transitive
     chains ACROSS batches collapse exactly like the batch pipeline's CC
     stage (A~B in batch 1, B~C in batch 3 still drops two of {A,B,C});
  4. survivors merge into the corpus; all four state tables take their
     O(batch) deltas.

Verification fidelity note: the batch pipeline verifies candidates with
EXACT shingle-set Jaccard (it holds every text in hand); the stream
verifies with the MinHash signature estimate (fraction of agreeing
hashes), because carrying shingle sets as state would be O(corpus text)
while signatures are ``num_hashes`` longs per doc. With 32 hashes the
estimate's rsd is ~0.09 — pairs far from the threshold (the common case
for true dups) agree with the batch decision; borderline pairs can
differ. That is the honest price of O(batch) streaming state.

Cross-batch cluster semantics: when a new doc bridges two existing
corpus canonicals, the components MERGE — the losing canonical is
physically deleted from the corpus and recorded in the cluster map, so
the stream converges to the same min-id-per-component survivors the
batch build produces (given ids assigned in arrival order). The cluster
map may hold short chains after a merge (D->L written before L->W);
probes resolve them with a bounded pointer-chase of pruned lookups.

Input contract: ``doc_id`` is immutable per content stream (the
docsource readers derive deterministic ids) — re-sending an existing id
with DIFFERENT text is a producer error, not an update: the exact stage
proves DIGESTS new, not ids, so the conflicting row would append a
second doc_id-keyed row rather than replace (upsert-by-id was the old
O(state)-per-batch behavior this design deliberately dropped).
``validate_corpus_store`` surfaces such conflicts as
``duplicate_doc_id`` at maintenance time.

Exactly-once by composition, every layer idempotent under replay:
- the file-source checkpoint assigns each landed file to exactly one
  micro-batch;
- state writes are insert-only appends keyed by the micro-batch id
  (``append_rows(tag=batch_id)`` — a replay overwrites its own version
  dirs byte-for-byte), drops/stats are replace-by-key, and the corpus
  delete is idempotent, so a replayed batch lands idempotently;
- manifest renames publish each table atomically (a crash mid-batch
  leaves the previous snapshot visible, and the replay redoes the batch);
- the FINGERPRINT index is written LAST: it is the gate that makes a
  replayed batch resolve to "already seen", so it must only claim a doc
  after the corpus row and every other index entry are durably published
  (claim-first would drop the doc forever on a crash between the two).

State is seven partition-store tables under ``out_root`` (``stats/`` —
per-batch pipeline metrics, opt-in — plus):
  drops/     — (doc_id, stage, detail): the batch drop_report's streaming
               twin — why each non-surviving doc fell out (quality,
               exact_dup, near_dup, merged-away canonical, or — for JSONL
               input — rejected lines under negative synthetic ids)
  corpus/    — the deduped documents, partitioned by source
  fpindex/   — (digest, canonical_id), partitioned by digest prefix
               (``fp_prefix_len`` hex chars) so the per-batch probe join
               reads only the touched buckets at scale
  bandindex/ — (band, sig, doc_id) LSH bucket membership, partitioned by
               a hash of the bucket key
  sigindex/  — (doc_id, source, sigs) MinHash signatures + the partition
               column the corpus delete path needs, bucketed by doc_id
  clusters/  — (doc_id, canonical_id) for every near-dup-dropped doc and
               merged-away canonical, bucketed by doc_id
"""

from __future__ import annotations

import time as _time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from rdw_spark.operators.dedup import (
    _band_rows, connected_components, incremental_exact_dedup,
    minhash_signatures, text_digest,
)
from rdw_spark.operators.text import (quality_filter, repetition_features, top_ngram_repetition)
from rdw_spark.warehouse.partstore import PartitionedTable

DOC_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType(), False),
    T.StructField("text", T.StringType(), True),
    T.StructField("lang", T.StringType(), True),
    T.StructField("source", T.StringType(), True),
    T.StructField("n_chars", T.LongType(), True),
])

INDEX_SCHEMA = T.StructType([
    T.StructField("digest", T.StringType(), False),
    T.StructField("canonical_id", T.LongType(), False),
])

BAND_SCHEMA = T.StructType([
    T.StructField("band", T.IntegerType(), False),
    T.StructField("sig", T.LongType(), False),
    T.StructField("doc_id", T.LongType(), False),
])

SIG_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType(), False),
    T.StructField("source", T.StringType(), True),
    T.StructField("sigs", T.ArrayType(T.LongType(), False), False),
])

CLUSTER_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType(), False),
    T.StructField("canonical_id", T.LongType(), False),
])

DROPS_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType(), False),
    T.StructField("stage", T.StringType(), False),
    T.StructField("detail", T.StringType(), True),
])

STATS_SCHEMA = T.StructType([
    T.StructField("batch_id", T.LongType(), False),
    T.StructField("stage", T.StringType(), False),
    T.StructField("n", T.LongType(), False),
])

EMB_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType(), False),
    T.StructField("source", T.StringType(), True),
    T.StructField("bucket", T.IntegerType(), False),
    T.StructField("embedding", T.ArrayType(T.FloatType()), False),
])

_DOC_COLS = [f.name for f in DOC_SCHEMA.fields]


_LAYOUT_FILE = "_layout.json"
_LAYOUT_DEFAULTS = {"fp_prefix_len": 2, "band_buckets": 128, "kv_buckets": 64}


def resolve_table_opts(out_root: str, table_opts: dict | None) -> dict:
    """Bucket layout is baked into partition expressions at creation and
    must stay constant for the life of a state directory — so the store
    is SELF-DESCRIBING: the first open writes ``_layout.json`` and every
    later open reads it back, erroring on an explicit mismatch instead of
    silently probing with wrong partition keys (which would read empty
    indexes and re-admit known documents). A directory that already holds
    tables but predates the layout manifest must be opened once with the
    ``table_opts`` it was created with (recorded thereafter)."""
    import json
    import os

    path = os.path.join(out_root, _LAYOUT_FILE)
    if os.path.exists(path):
        with open(path) as fh:
            stored = dict(json.load(fh))
        if table_opts:
            conflict = {
                k: (v, stored.get(k)) for k, v in table_opts.items()
                if stored.get(k) != v
            }
            if conflict:
                raise ValueError(
                    f"corpus store {out_root} was created with a different "
                    f"layout: {conflict} (requested, stored) — bucket "
                    "counts cannot change for an existing state directory"
                )
        return stored
    legacy = any(
        os.path.isdir(os.path.join(out_root, t))
        for t in ("fpindex", "corpus", "bandindex")
    )
    if legacy and table_opts is None:
        raise ValueError(
            f"corpus store {out_root} predates the layout manifest; open it "
            "once with table_opts matching its creation (it will be "
            "recorded) — guessing would silently mis-prune every probe"
        )
    opts = {**_LAYOUT_DEFAULTS, **(table_opts or {})}
    os.makedirs(out_root, exist_ok=True)
    tmp = f"{path}.tmp-{os.getpid()}"
    with open(tmp, "w") as fh:
        json.dump(opts, fh)
    os.replace(tmp, path)
    return opts


def corpus_tables(
    out_root: str,
    fp_prefix_len: int = 2,
    band_buckets: int = 128,
    kv_buckets: int = 64,
) -> dict[str, PartitionedTable]:
    """The corpus table plus its four maintained dedup-state tables.

    Bucket counts trade PROBE read granularity against PER-BATCH write
    fanout: a probe reads ``touched/total`` of the index, but every
    micro-batch's state write creates up to one file per touched bucket —
    and a dynamic-partition parquet write's cost is dominated by file
    count (measured: 5k rows into 4096 dirs = 40 s, into 256 dirs =
    3.5 s, into 16 dirs = 0.6 s on local[32]). Defaults suit batches of
    10^3–10^5 docs; a deployment probing a multi-TB index with TINY
    batches can raise them. The values are baked into partition
    expressions at creation — they must stay CONSTANT for the life of a
    state directory (a change re-buckets nothing and breaks pruning).
    """
    return {
        "corpus": PartitionedTable(
            out_root, "corpus", "source", keys=["doc_id"],
            schema=DOC_SCHEMA, sort_cols=("doc_id",),
        ),
        "fpindex": PartitionedTable(
            out_root, "fpindex", f"substring(digest, 1, {fp_prefix_len})",
            keys=["digest"], schema=INDEX_SCHEMA, sort_cols=("digest",),
        ),
        "bandindex": PartitionedTable(
            out_root, "bandindex", f"pmod(xxhash64(band, sig), {band_buckets})",
            keys=["band", "doc_id"], schema=BAND_SCHEMA, sort_cols=("sig",),
        ),
        "sigindex": PartitionedTable(
            out_root, "sigindex", f"pmod(doc_id, {kv_buckets})", keys=["doc_id"],
            schema=SIG_SCHEMA, sort_cols=("doc_id",),
        ),
        "clusters": PartitionedTable(
            out_root, "clusters", f"pmod(doc_id, {kv_buckets})", keys=["doc_id"],
            schema=CLUSTER_SCHEMA, sort_cols=("doc_id",),
        ),
        # the batch build_corpus drop_report's streaming twin: why each
        # non-surviving doc fell out (quality / exact_dup / near_dup /
        # merged), replace-by-doc_id so replays stay idempotent
        "drops": PartitionedTable(
            out_root, "drops", f"pmod(doc_id, {kv_buckets})", keys=["doc_id"],
            schema=DROPS_SCHEMA, sort_cols=("doc_id",),
        ),
        # SRP-bucketed embeddings for the semantic near-dup stage (only
        # populated when semantic=True): bucket-pruned probes, the
        # embedding twin of sigindex
        "embindex": PartitionedTable(
            out_root, "embindex", f"pmod(bucket, {kv_buckets})", keys=["doc_id"],
            schema=EMB_SCHEMA, sort_cols=("doc_id",),
        ),
        # per-batch pipeline metrics (long format: one row per batch ×
        # stage counter), written only when with_stats=True; replace-by-
        # (batch_id, stage) so replays stay idempotent
        "stats": PartitionedTable(
            out_root, "stats", "pmod(batch_id, 64)", keys=["batch_id", "stage"],
            schema=STATS_SCHEMA, sort_cols=("batch_id", "stage"),
        ),
    }


def maintain_corpus(
    spark: SparkSession, out_root: str, max_files: int = 4,
    keep_manifests: int = 2, table_opts: dict | None = None,
) -> dict[str, dict[str, int]]:
    """Periodic maintenance for the streaming corpus store — every
    micro-batch appends a version to each touched bucket, so file count
    and superseded versions grow with batch count until compacted. Run on
    the reference's maintenance cadence (off-peak, like mart OPTIMIZE):
    compacts fragmented partitions and GCs old manifests/versions for the
    corpus and every state table (dedup indexes, drops, stats). Safe
    between triggers AND across a crash-restart boundary: each compaction
    publishes through the same atomic manifest rename the writers use,
    and the NEWEST append tag's dirs per table are kept referenced
    verbatim (the ``rebase(keep_versions={a<top>})`` contract from
    ``compact_mergeable_state``) — structured streaming may replay the
    last uncommitted batch after a crash, and its ``append_rows`` must
    land as an idempotent self-overwrite, not re-add rows a compacted
    dir already absorbed."""
    out: dict[str, dict[str, int]] = {}
    for name, pt in corpus_tables(
            out_root, **resolve_table_opts(out_root, table_opts)).items():
        top = pt.newest_append_tag()
        keep = {f"a{top}"} if top is not None else None
        out[name] = {
            "compacted_partitions": pt.compact(
                spark, max_files=max_files, keep_versions=keep),
            "removed_dirs": pt.gc(keep_manifests=keep_manifests),
        }
    return out


def validate_corpus_store(
    spark: SparkSession, out_root: str, sample: int = 20,
    table_opts: dict | None = None,
) -> dict:
    """Cross-table integrity validation for the streaming corpus store —
    the corpus twin of ``migrate.validate_integrity`` (the check the
    reference requires before bulk operations). Verifies the invariants
    the exactly-once composition is supposed to maintain, so silent
    drift (a torn write the manifest contract should have prevented, a
    bug in a new stage) is caught at maintenance time instead of by a
    downstream training run:

      - ``cluster_loser_in_corpus``: a doc recorded as merged/near-dup
        in the cluster map must NOT still be in the corpus;
      - ``dropped_in_corpus``: a doc with a drops row must not be in the
        corpus (drops are terminal);
      - ``fp_canonical_unaccounted``: every fingerprint-index canonical
        must be in the corpus or the cluster map (else a digest claims a
        doc that was lost — the claim-before-publish failure);
      - ``corpus_missing_sig``: with the near-dup tier populated, every
        corpus doc needs a signature row (future batches can't dedup
        against it otherwise);
      - ``band_doc_missing_sig``: band-index members must have sig rows
        (verification would silently drop their candidate pairs);
      - ``emb_doc_missing_sig``: embedding-index members (semantic mode)
        must have sig rows — an embindex id the lexical tier never saw
        means a doc skipped the exact stage;
      - ``duplicate_doc_id``: one corpus row per doc_id — a duplicate
        means a producer re-sent an existing id with different text
        (ids are digest-proven-new, not id-proven; see the module
        docstring's input contract).

    Full-table anti-joins, one partition-parallel pass per invariant —
    a maintenance-window check, not a per-batch cost. Returns violation
    counts plus up to ``sample`` offending ids per check."""
    t = corpus_tables(out_root, **resolve_table_opts(out_root, table_opts))
    corpus_ids = t["corpus"].read(spark).select("doc_id")
    clusters = t["clusters"].read(spark)
    drops = t["drops"].read(spark).select("doc_id")
    fp = t["fpindex"].read(spark).select(
        F.col("canonical_id").alias("doc_id")).distinct()
    sig_ids = t["sigindex"].read(spark).select("doc_id")
    band_ids = t["bandindex"].read(spark).select("doc_id").distinct()

    checks = {
        "cluster_loser_in_corpus":
            clusters.select("doc_id").join(corpus_ids, "doc_id", "left_semi"),
        "dropped_in_corpus":
            drops.join(corpus_ids, "doc_id", "left_semi"),
        "fp_canonical_unaccounted":
            fp.join(corpus_ids, "doc_id", "left_anti")
              .join(clusters.select("doc_id"), "doc_id", "left_anti"),
        "corpus_missing_sig":
            (corpus_ids.join(sig_ids, "doc_id", "left_anti")
             if not sig_ids.isEmpty() else corpus_ids.limit(0)),
        "band_doc_missing_sig":
            band_ids.join(sig_ids, "doc_id", "left_anti"),
        "emb_doc_missing_sig":
            t["embindex"].read(spark).select("doc_id")
            .join(sig_ids, "doc_id", "left_anti"),
        "duplicate_doc_id":
            corpus_ids.groupBy("doc_id").count()
            .filter(F.col("count") > 1).select("doc_id"),
    }
    report: dict = {"ok": True, "violations": {}}
    for name, df in checks.items():
        bad = [r["doc_id"] for r in df.limit(sample).collect()]
        n = df.count() if bad else 0
        report["violations"][name] = {"count": n, "sample": bad}
        if n:
            report["ok"] = False
    return report


def _resolve_partners(
    spark: SparkSession, clusters: PartitionedTable, partner_ids: DataFrame,
    max_chain: int = 8,
) -> DataFrame:
    """(doc_id, canonical) for corpus-side candidate partners: chase the
    cluster map until fixpoint. Each hop reads only the doc_id buckets the
    current frontier lands in — O(candidates) per hop, and chains are
    short (one level per historical merge on the doc's component)."""
    resolved = partner_ids.select("doc_id", F.col("doc_id").alias("canonical"))
    for _ in range(max_chain):
        frontier = resolved.select(F.col("canonical").alias("doc_id")).distinct()
        parts = clusters.parts_of(frontier)
        hop = (
            clusters.read(spark, parts=parts)
            .join(frontier, "doc_id", "left_semi")
            .select(F.col("doc_id").alias("canonical"),
                    F.col("canonical_id").alias("_next"))
        )
        if hop.isEmpty():
            break
        resolved = (
            resolved.join(hop, "canonical", "left")
            .select("doc_id",
                    F.coalesce("_next", F.col("canonical")).alias("canonical"))
        )
    return resolved


def stream_corpus_build(
    spark: SparkSession,
    landing_dir: str,
    out_root: str,
    checkpoint: str,
    max_files_per_trigger: int = 100,
    available_now: bool = True,
    near_dup: bool = True,
    num_hashes: int = 32,
    bands: int = 8,
    ngram: int = 3,
    threshold: float = 0.7,
    quality_thresholds: dict | None = None,
    repetition_thresholds: dict | None = None,
    input_format: str = "parquet",
    with_stats: bool = False,
    semantic: bool = False,
    semantic_threshold: float = 0.95,
    semantic_bits: int = 8,
    normalize_unicode: str | None = None,
    table_opts: dict | None = None,
):
    """Watch ``landing_dir`` for document drops in the documents schema,
    dedup each micro-batch against the maintained indexes (exact always;
    near-dup unless ``near_dup=False``), and append the survivors.
    ``quality_thresholds`` switches on the quality stage (pass ``{}`` for
    the defaults batch ``build_corpus`` uses); ``repetition_thresholds``
    (keys ``max_dup_line_frac``/``max_top_gram_frac``) switches on the
    Gopher-style repetition stage, both matching the batch
    ``build_corpus`` semantics; None skips either. Returns the
    StreamingQuery.

    ``input_format="jsonl"`` watches for JSONL shards instead (the
    training-data interchange format — ``sources/docsource.py`` is the
    batch twin), and ``"csv"`` for header-rowed CSV shards (multiLine
    off, per the docsource splittability contract): both use an explicit
    schema (no inference), PERMISSIVE parse, and the same accept/reject
    contract — malformed lines and rows with null/blank text or null id
    land in the ``drops`` table with stage ``rejected`` instead of
    killing the stream or vanishing; a missing ``n_chars`` is derived
    from the text.

    ``with_stats=True`` records per-batch pipeline metrics in the
    ``stats`` table (long format: batch_id × counter — ``input``, one row
    per drop stage, ``written``, ``wall_ms``) — the observability feed a
    continuously-running ingest needs for rate/drop-mix dashboards and
    regression alarms. Opt-in because each batch pays a couple of extra
    small count jobs; replace-by-(batch_id, stage) keeps replays
    idempotent. Empty micro-batches record nothing.

    ``semantic=True`` adds the SEMANTIC near-dup stage — the streaming
    twin of ``build_corpus(embeddings=...)``: landing rows carry an
    ``embedding array<float>`` column (parquet or JSONL; CSV can't),
    each batch's vectors are SRP-bucketed (``semantic_bits`` sign
    projections, the same deterministic hyperplanes as the batch stage)
    and probed against ONLY the touched buckets of a maintained embedding
    index, candidates verified by EXACT cosine >= ``semantic_threshold``
    (full vectors live in the index, so unlike the MinHash estimate this
    matches the batch decision bit-for-bit), and the verified pairs join
    the MinHash pairs in the same cluster resolution — paraphrase pairs
    split across micro-batches collapse exactly like lexical near-dups.
    Rows with a null embedding skip the stage (lexical dedup still
    applies).

    ``normalize_unicode`` ("NFC"/"NFKC") applies unicode normalization +
    control stripping to each batch BEFORE digesting — the batch
    pipeline's first stage — so a decomposed rendering arriving in batch
    7 exact-dedups against its precomposed twin from batch 2 (their
    digests differ without it)."""
    if normalize_unicode not in (None, "NFC", "NFKC"):
        raise ValueError(
            f"normalize_unicode must be None/'NFC'/'NFKC', got {normalize_unicode!r}"
        )
    if semantic and input_format == "csv":
        raise ValueError("semantic=True needs an embedding array column; "
                         "CSV can't carry one — use parquet or jsonl")
    tables = corpus_tables(out_root, **resolve_table_opts(out_root, table_opts))
    corpus, fpindex = tables["corpus"], tables["fpindex"]
    bandindex, sigindex, clusters, drops = (
        tables["bandindex"], tables["sigindex"], tables["clusters"],
        tables["drops"],
    )
    stats, embindex = tables["stats"], tables["embindex"]

    emb_field = [T.StructField("embedding", T.ArrayType(T.FloatType()))]
    if input_format == "parquet":
        read_schema = T.StructType(
            list(DOC_SCHEMA.fields) + (emb_field if semantic else [])
        )
        raw = (
            spark.readStream.schema(read_schema)
            .option("maxFilesPerTrigger", str(max_files_per_trigger))
            .parquet(landing_dir)
        )
    elif input_format in ("jsonl", "csv"):
        in_schema = T.StructType(
            list(DOC_SCHEMA.fields)
            + (emb_field if semantic else [])
            + [T.StructField("_corrupt_record", T.StringType())]
        )
        reader = (
            spark.readStream.schema(in_schema)
            .option("mode", "PERMISSIVE")
            .option("columnNameOfCorruptRecord", "_corrupt_record")
            .option("maxFilesPerTrigger", str(max_files_per_trigger))
        )
        if input_format == "jsonl":
            raw = reader.json(landing_dir)
        else:
            # the docsource CSV contract: header row, multiLine OFF (an
            # embedded newline makes a CSV file unsplittable; multi-line
            # documents belong in JSONL) — such rows land in the reject
            # quarantine instead of stalling the stream
            raw = reader.option("header", "true").csv(landing_dir)
    else:
        raise ValueError(
            "input_format must be 'parquet', 'jsonl' or 'csv', "
            f"got {input_format!r}"
        )

    # intermediate stages carry the embedding column through to the
    # semantic probe; the corpus table itself stays in the doc schema
    keep_cols = _DOC_COLS + (["embedding"] if semantic else [])

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        s = batch_df.sparkSession
        docs = batch_df
        drop_frames: list[DataFrame] = []
        t0 = _time.perf_counter()
        n_in = batch_df.count() if with_stats else 0

        def write_stats(n_written: int) -> None:
            if not with_stats:
                return
            rows = [(int(batch_id), "input", int(n_in))]
            if drop_frames:
                rep = drop_frames[0]
                for f in drop_frames[1:]:
                    rep = rep.unionByName(f)
                rows += [
                    (int(batch_id), r["stage"], int(r["n"]))
                    for r in rep.groupBy("stage").agg(
                        F.count("*").alias("n")).collect()
                ]
            rows.append((int(batch_id), "written", int(n_written)))
            rows.append((int(batch_id), "wall_ms",
                         int((_time.perf_counter() - t0) * 1000)))
            stats.merge_rows(s, s.createDataFrame(rows, STATS_SCHEMA))
        if "_corrupt_record" in docs.columns:
            # JSONL accept/reject split (the docsource contract): rejects
            # are accounted, never silently dropped, never stream-fatal
            reason = (
                F.when(F.col("_corrupt_record").isNotNull(), F.lit("malformed"))
                .when(F.col("text").isNull() | (F.trim("text") == ""),
                      F.lit("empty_text"))
                .when(F.col("doc_id").isNull(), F.lit("null_id"))
            )
            tagged = docs.withColumn("_reject", reason)
            rej = tagged.filter(F.col("_reject").isNotNull())
            # id-less rejects (malformed / null_id) get a deterministic
            # NEGATIVE synthetic key — content-hashed so a replayed batch
            # upserts the same rows (idempotent), negative so it can never
            # collide with a real doc_id; byte-identical reject lines are
            # one fact and collapse to one record
            rid = -F.pmod(
                F.xxhash64(
                    F.coalesce(F.col("_corrupt_record"), F.lit("")),
                    F.coalesce(F.col("text"), F.lit("")),
                    F.coalesce(F.col("lang"), F.lit("")),
                    F.coalesce(F.col("source"), F.lit("")),
                ),
                F.lit(2 ** 62),
            ) - 2
            drop_frames.append(rej.select(
                F.coalesce(F.col("doc_id"), rid).alias("doc_id"),
                F.lit("rejected").alias("stage"),
                F.col("_reject").alias("detail"),
            ).dropDuplicates(["doc_id"]))
            docs = (
                tagged.filter(F.col("_reject").isNull())
                .drop("_reject", "_corrupt_record")
                .withColumn("n_chars", F.coalesce(
                    F.col("n_chars"), F.length("text").cast("long")))
            )
            if docs.isEmpty():
                if not rej.isEmpty():
                    drops.merge_rows(s, drop_frames[0])
                write_stats(0)
                return
        if normalize_unicode is not None:
            from rdw_spark.functions.scalars import unicode_normalize

            docs = docs.withColumn(
                "text", unicode_normalize(F.col("text"), form=normalize_unicode)
            )
        if quality_thresholds is not None:
            q = quality_filter(docs, quality_thresholds)
            drop_frames.append(q.filter("NOT q_keep").select(
                F.col("doc_id"), F.lit("quality").alias("stage"),
                F.concat_ws(",", "q_reasons").alias("detail"),
            ))
            docs = q.filter("q_keep").select(*keep_cols)
        if repetition_thresholds is not None:
            t = {"max_dup_line_frac": 0.3, "max_top_gram_frac": 0.2,
                 **repetition_thresholds}
            rep = repetition_features(docs).select("doc_id", "rep_dup_line_frac")
            top = top_ngram_repetition(docs).select("doc_id", "top_gram_frac")
            bad = (
                rep.join(top, "doc_id", "left")
                .filter((F.col("rep_dup_line_frac") > t["max_dup_line_frac"])
                        | (F.col("top_gram_frac") > t["max_top_gram_frac"]))
            )
            drop_frames.append(bad.select(
                F.col("doc_id"), F.lit("repetition").alias("stage"),
                F.concat_ws(
                    ",", F.round("rep_dup_line_frac", 4).cast("string"),
                    F.round("top_gram_frac", 4).cast("string"),
                ).alias("detail"),
            ))
            docs = docs.join(bad.select("doc_id"), "doc_id", "left_anti")
        cached = [docs.cache()]
        try:
            # ---- exact stage: digest-prefix-pruned index probe ----
            # prefixes come from the table's own partition expression, so
            # the probe stays correct whatever fp_prefix_len the store uses
            pfx = fpindex.parts_of(
                docs.select(text_digest(F.col("text")).alias("digest")))
            idx = fpindex.read(s, parts=pfx)
            out = incremental_exact_dedup(docs, idx)
            drop_frames.append(out["dup_map"].select(
                F.col("doc_id"), F.lit("exact_dup").alias("stage"),
                F.col("canonical_id").cast("string").alias("detail"),
            ))

            def merge_drops() -> None:
                rep = drop_frames[0]
                for f in drop_frames[1:]:
                    rep = rep.unionByName(f)
                drops.merge_rows(s, rep)

            survivors = out["unique"].select(*keep_cols).cache()
            cached.append(survivors)
            if survivors.isEmpty():
                # whole batch was exact-known; indexes already claim it —
                # but the drop accounting still records the duplicates
                merge_drops()
                write_stats(0)
                return

            if not near_dup:
                # exact-survivor ids/digests are proven-new (the probe just
                # anti-joined them) → insert-only appends, O(batch) writes
                corpus.append_rows(s, survivors.select(*_DOC_COLS), tag=batch_id)
                merge_drops()
                fpindex.append_rows(s, out["index_delta"], tag=batch_id)
                write_stats(survivors.count() if with_stats else 0)
                return

            # ---- near-dup stage: band-bucket-pruned LSH probe ----
            sigs = minhash_signatures(
                survivors, num_hashes, ngram
            ).cache()
            cached.append(sigs)
            mh_cols = [c for c in sigs.columns if c.startswith("mh_")]
            new_bands = _band_rows(sigs, bands, "doc_id").select(
                F.col("band").cast("int").alias("band"), "sig", "doc_id"
            ).cache()
            cached.append(new_bands)
            idx_bands = bandindex.read(s, parts=bandindex.parts_of(new_bands))
            probe = idx_bands.select("band", "sig", F.col("doc_id").alias("x")).union(
                new_bands.select("band", "sig", F.col("doc_id").alias("x"))
            )
            cands = (
                probe.join(
                    new_bands.select("band", "sig", F.col("doc_id").alias("y")),
                    ["band", "sig"],
                )
                .select(F.least("x", "y").alias("a"), F.greatest("x", "y").alias("b"))
                .filter(F.col("a") < F.col("b"))
                .distinct()
                .cache()
            )
            cached.append(cands)

            new_ids = survivors.select("doc_id")
            new_sigs = sigs.select(
                "doc_id", F.array(*mh_cols).alias("sigs")
            )
            partner_ids = (
                cands.select(F.col("a").alias("doc_id"))
                .union(cands.select(F.col("b").alias("doc_id")))
                .distinct()
                .join(new_ids, "doc_id", "left_anti")
                .cache()
            )
            cached.append(partner_ids)
            corpus_sigs = (
                sigindex.read(s, parts=sigindex.parts_of(partner_ids))
                .join(partner_ids, "doc_id", "left_semi")
                .select("doc_id", "sigs")
            )
            all_sigs = new_sigs.union(corpus_sigs)

            # verify: fraction of agreeing minhashes >= threshold
            agree = F.aggregate(
                F.zip_with("_sa", "_sb",
                           lambda x, y: (x == y).cast("int")),
                F.lit(0), lambda acc, v: acc + v,
            )
            verified = (
                cands
                .join(all_sigs.select(F.col("doc_id").alias("a"),
                                      F.col("sigs").alias("_sa")), "a")
                .join(all_sigs.select(F.col("doc_id").alias("b"),
                                      F.col("sigs").alias("_sb")), "b")
                .withColumn("_est", agree / F.lit(num_hashes))
                .filter(F.col("_est") >= threshold)
                .select("a", "b")
            )

            # ---- semantic stage: SRP-bucket-pruned embedding probe ----
            new_emb = None
            if semantic and "embedding" in survivors.columns:
                from rdw_spark.operators.similarity import (
                    dot_expr, norm_expr, srp_bucket,
                )

                with_vec = survivors.filter(F.col("embedding").isNotNull())
                first = with_vec.select("embedding").first()
                if first is not None:
                    dim = len(first[0])
                    new_emb = with_vec.select(
                        "doc_id", "source", "embedding",
                        srp_bucket(F.col("embedding"), bits=semantic_bits,
                                   dim=dim).cast("int").alias("bucket"),
                    ).cache()
                    cached.append(new_emb)
                    idx_emb = embindex.read(
                        s, parts=embindex.parts_of(new_emb)
                    ).select("doc_id", "bucket", "embedding")
                    # asymmetric probe: (index ∪ batch) × batch within a
                    # bucket — never index × index (those pairs resolved
                    # when their docs arrived)
                    probe_e = idx_emb.union(
                        new_emb.select("doc_id", "bucket", "embedding")
                    )
                    ea = probe_e.select(
                        F.col("doc_id").alias("x"), "bucket",
                        F.col("embedding").alias("_ex"),
                        norm_expr(F.col("embedding")).alias("_nx"),
                    )
                    eb = new_emb.select(
                        F.col("doc_id").alias("y"), "bucket",
                        F.col("embedding").alias("_ey"),
                        norm_expr(F.col("embedding")).alias("_ny"),
                    )
                    cos = dot_expr(F.col("_ex"), F.col("_ey")) / (
                        F.col("_nx") * F.col("_ny")
                    )
                    sem_pairs = (
                        ea.join(eb, "bucket")
                        .filter(F.col("x") != F.col("y"))
                        .filter(cos >= F.lit(semantic_threshold))
                        .select(F.least("x", "y").alias("a"),
                                F.greatest("x", "y").alias("b"))
                        .distinct()
                    )
                    verified = verified.union(sem_pairs).distinct()

            # resolve corpus partners through the cluster map (new ids stay
            # raw — on replay their old map entries must not self-cancel
            # the edge that re-derives them); semantic partners join the
            # MinHash ones — any corpus-side pair end must chase the map
            resolve_ids = (
                verified.select(F.col("a").alias("doc_id"))
                .union(verified.select(F.col("b").alias("doc_id")))
                .distinct()
                .join(new_ids, "doc_id", "left_anti")
            )
            pmap = _resolve_partners(s, clusters, resolve_ids)
            edges = (
                verified
                .join(pmap.select(F.col("doc_id").alias("a"),
                                  F.col("canonical").alias("_ca")), "a", "left")
                .join(pmap.select(F.col("doc_id").alias("b"),
                                  F.col("canonical").alias("_cb")), "b", "left")
                .select(F.coalesce("_ca", F.col("a")).alias("u"),
                        F.coalesce("_cb", F.col("b")).alias("v"))
                .filter(F.col("u") != F.col("v"))
            )

            if edges.isEmpty():
                final_new = survivors
                new_losers = corpus_losers = None
            else:
                losers = connected_components(edges, "u", "v").filter(
                    F.col("node") != F.col("cluster_id")
                ).select(
                    F.col("node").alias("doc_id"),
                    F.col("cluster_id").alias("canonical_id"),
                ).cache()
                cached.append(losers)
                new_losers = losers.join(new_ids, "doc_id", "left_semi")
                corpus_losers = losers.join(new_ids, "doc_id", "left_anti")
                final_new = survivors.join(
                    new_losers.select("doc_id"), "doc_id", "left_anti"
                )

            # ---- writes; fpindex (the replay gate) strictly last ----
            # Every state write below is INSERT-ONLY (survivor doc_ids,
            # their digests/sigs/bands, and first-time cluster entries are
            # all proven-new by the probes), so they use the O(batch)
            # append path — merge_rows' read+anti-join+rewrite would make
            # each micro-batch O(touched state), the amortization killer
            # at scale. Replays overwrite the same tag dirs (idempotent).
            # drops/stats keep replace-by-key: JSONL reject rows use
            # content-hashed ids that CAN legitimately repeat across
            # batches (the same malformed line in two shards is one fact).
            if corpus_losers is not None and not corpus_losers.isEmpty():
                # a new doc bridged two existing canonicals: the losing
                # canonical leaves the corpus; its source (the partition
                # key) comes from the sig index, not a corpus scan.
                # Delete BEFORE this batch's corpus append: delete_rows
                # rewrites the touched partitions into plain version dirs,
                # which would COLLAPSE a just-appended a<batch_id> dir —
                # a crash before the fpindex gate would then replay the
                # append on top of the absorbed rows (duplicates). The
                # loser is by definition a pre-existing canonical, never a
                # batch row, so deleting first is semantically identical;
                # a replayed delete of an already-gone loser matches zero
                # rows and rewrites nothing (idempotent).
                loser_meta = (
                    sigindex.read(s, parts=sigindex.parts_of(corpus_losers))
                    .join(corpus_losers.select("doc_id"), "doc_id", "left_semi")
                    .select("doc_id", "source")
                )
                corpus.delete_rows(s, loser_meta)
            corpus.append_rows(s, final_new.select(*_DOC_COLS), tag=batch_id)
            if new_losers is not None:
                # first-time entries only: new docs were never in the map,
                # and a losing canonical was (by definition) never a loser
                clusters.append_rows(
                    s, new_losers.unionByName(corpus_losers), tag=batch_id
                )
                drop_frames.append(new_losers.select(
                    F.col("doc_id"), F.lit("near_dup").alias("stage"),
                    F.col("canonical_id").cast("string").alias("detail"),
                ))
                drop_frames.append(corpus_losers.select(
                    F.col("doc_id"), F.lit("merged").alias("stage"),
                    F.col("canonical_id").cast("string").alias("detail"),
                ))
            # ALL exact-survivors (even near-dup losers) are indexed: future
            # docs similar to a dropped doc must still find its buckets and
            # resolve to the canonical through the cluster map
            sigindex.append_rows(
                s, new_sigs.join(
                    survivors.select("doc_id", "source"), "doc_id"
                ).select("doc_id", "source", "sigs"), tag=batch_id
            )
            bandindex.append_rows(s, new_bands, tag=batch_id)
            if new_emb is not None:
                # like sigindex: EVERY exact-survivor's vector is indexed,
                # near-dup losers included — a future doc semantically close
                # to a dropped doc must still find its bucket and resolve
                # to the canonical through the cluster map
                embindex.append_rows(
                    s, new_emb.select("doc_id", "source", "bucket", "embedding"),
                    tag=batch_id,
                )
            merge_drops()
            fpindex.append_rows(s, out["index_delta"], tag=batch_id)
            write_stats(final_new.count() if with_stats else 0)
        finally:
            for c in cached:
                c.unpersist()

    writer = (
        raw.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
