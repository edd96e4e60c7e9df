"""Structured Streaming tier (SURVEY.md §2.10).

The reference is incremental micro-batch, not a stream engine (T1-T6 live in
rdw_spark.warehouse.migrate as checkpointed batch — exactly the semantics it
documents). This package is the 100 TB streaming tier on top: the same
import-log/event inputs consumed with ``readStream``, watermarked windowed
aggregation for late data, and a custom stateful operator
(applyInPandasWithState sessionization) for semantics the built-in windows
can't express.
"""
