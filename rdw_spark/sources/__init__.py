"""Source parsers for every ingest format the reference accepts
(SURVEY.md §2.1 S1-S8). Each parser takes raw payload content and returns
warehouse-shaped DataFrames; validation failures come back as row-level
error frames, never exceptions (reference returns element-level messages in
the import record, docs/API.md:288)."""
