"""Document-corpus file sources: JSONL (the de-facto training-data
interchange format) and CSV, with corrupt-record quarantine.

The RDW reference ingests its domain files through staging tables with
per-row validation and reject tracking (docs/Runbook.DataSpecifications.md
describes the accept/reject contract; sources/validator.py implements it
for the domain formats). This module applies the same contract to the
training-data tier's bulk formats.

Scale notes baked into the API:

- **Explicit schema, never inference.** ``inferSchema``/sampled JSON
  schema inference is an extra full pass over 100 TB before the real one.
  Callers pass a schema or get ``DOCUMENT_SCHEMA``.
- **PERMISSIVE + corrupt-record column.** A malformed line must not kill
  a 10^5-task job (FAILFAST) nor silently vanish (DROPMALFORMED). Bad
  lines land in a quarantine DataFrame with the raw line preserved, so
  the reject rate is auditable and replayable — the same
  accept/reject split the exam validator produces.
- **Compression reality.** Spark picks the codec from the extension.
  gzip is NOT splittable — one task per file, so .jsonl.gz corpora must
  be sharded (the standard ~100-500 MB shard layout is exactly that);
  bzip2 and (with the hadoop-zstd codec) zstd split. Parquet remains the
  engine-native format — these readers are the on-ramp.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: Mirrors the documents table; ``_corrupt_record`` is populated by the
#: PERMISSIVE reader for lines that fail to parse.
DOCUMENT_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("_corrupt_record", T.StringType()),
    ]
)


def _split_rejects(
    raw: DataFrame, id_col: str, text_col: str, derive_ids: bool
) -> dict[str, DataFrame]:
    """Accept/reject split shared by the readers. Rejects carry a
    ``reject_reason`` (parse failure beats field nullity) and the raw
    line when the parser preserved it."""
    corrupt = "_corrupt_record" in raw.columns
    reason = (
        F.when(F.col("_corrupt_record").isNotNull(), F.lit("malformed"))
        if corrupt
        else F.when(F.lit(False), F.lit(""))
    )
    reason = reason.when(
        F.col(text_col).isNull() | (F.trim(F.col(text_col)) == ""),
        F.lit("empty_text"),
    )
    if not derive_ids:
        reason = reason.when(F.col(id_col).isNull(), F.lit("null_id"))
    tagged = raw.withColumn("reject_reason", reason)
    docs = tagged.filter(F.col("reject_reason").isNull()).drop("reject_reason")
    if corrupt:
        docs = docs.drop("_corrupt_record")
    if derive_ids:
        # deterministic id for id-less corpora: hash of the full row —
        # fully-identical rows collapse to ONE document at read time (they
        # are indistinguishable, so keeping n copies of the same id only
        # confuses every id-keyed stage downstream); rows differing in any
        # field keep distinct ids. No monotonically_increasing_id, whose
        # values change with partitioning and break reruns.
        data_cols = [c for c in docs.columns if c != id_col]
        docs = docs.withColumn(
            id_col, F.xxhash64(*[F.col(c) for c in data_cols])
        ).dropDuplicates([id_col])
    rejects = tagged.filter(F.col("reject_reason").isNotNull())
    return {"docs": docs, "rejects": rejects}


def read_documents_jsonl(
    spark: SparkSession,
    path: str,
    schema: T.StructType = DOCUMENT_SCHEMA,
    id_col: str = "doc_id",
    text_col: str = "text",
    derive_ids: bool = False,
) -> dict[str, DataFrame]:
    """Read a JSONL document corpus → ``{"docs", "rejects"}``.

    One JSON object per line (``multiLine=False`` keeps files splittable
    for splittable codecs). Schema is explicit; unparseable lines and
    rows with null/blank ``text`` (or null ``id`` unless ``derive_ids``)
    land in ``rejects`` with a ``reject_reason``."""
    if "_corrupt_record" not in [f.name for f in schema.fields]:
        schema = T.StructType(
            list(schema.fields) + [T.StructField("_corrupt_record", T.StringType())]
        )
    raw = (
        spark.read.schema(schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .json(path)
    )
    return _split_rejects(raw, id_col, text_col, derive_ids)


def read_documents_csv(
    spark: SparkSession,
    path: str,
    schema: T.StructType | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    derive_ids: bool = False,
    header: bool = True,
    sep: str = ",",
) -> dict[str, DataFrame]:
    """CSV twin of :func:`read_documents_jsonl` — same accept/reject
    contract. ``multiLine`` stays off (embedded newlines in quoted text
    make a CSV file unsplittable and the parser stateful; corpora with
    multi-line documents belong in JSONL, where ``\\n`` is escaped)."""
    if schema is None:
        schema = T.StructType(
            [f for f in DOCUMENT_SCHEMA.fields if f.name != "_corrupt_record"]
        )
    if "_corrupt_record" not in [f.name for f in schema.fields]:
        schema = T.StructType(
            list(schema.fields) + [T.StructField("_corrupt_record", T.StringType())]
        )
    raw = (
        spark.read.schema(schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .option("header", str(header).lower())
        .option("sep", sep)
        .csv(path)
    )
    return _split_rejects(raw, id_col, text_col, derive_ids)


def write_documents_jsonl(
    df: DataFrame,
    path: str,
    n_shards: int | None = None,
    shard_col: str | None = None,
    compression: str | None = None,
    order_col: str = "doc_id",
) -> None:
    """The write twin of :func:`read_documents_jsonl` — export a corpus
    (or a corpus-build output) as JSONL shards, the interchange format
    downstream tokenizer/training stacks consume.

    Sharding, pick one:
    - ``n_shards``: round-robin hash split into exactly N files of
      roughly equal row count (one task writes one shard);
    - ``shard_col``: write ``<shard_col>=K/`` directories (e.g. the
      deterministic ``assign_shards`` id, so the JSONL layout matches
      the training order) — each shard dir gets one file;
    - neither: keep the frame's current partitioning (one file per
      partition — the bulk-export path where upstream already sized
      partitions).

    Rows are sorted by ``order_col`` within each file so exports are
    byte-stable for identical inputs. ``compression="gzip"`` trades
    splittability for size — per the module header, gzip shards must
    stay small because re-reading is one task per file."""
    if n_shards is not None and shard_col is not None:
        raise ValueError("pass at most one of n_shards / shard_col")
    w = df
    if n_shards is not None:
        w = w.repartition(n_shards, F.col(order_col))
    elif shard_col is not None:
        w = w.repartition(F.col(shard_col))
    writer = w.sortWithinPartitions(order_col).write.mode("overwrite")
    if compression is not None:
        writer = writer.option("compression", compression)
    if shard_col is not None:
        writer = writer.partitionBy(shard_col)
    writer.json(path)
