"""Declarative data-quality expectations — the generic admission gate
for any table entering the warehouse (the TRT source has its own
config-driven validator in ``sources/validator.py``; this is the
engine-level twin any pipeline can point at any frame).

``check_expectations(df, rules)`` evaluates every rule in ONE aggregate
pass over the fact (each rule becomes a conditional count — no
per-rule scans, no shuffle beyond the single global aggregate) and
returns a report row per rule: ``(rule, kind, column, n_violations,
passed)``. ``violating_rows(df, rules)`` tags offending rows with the
list of rules they break (map-only) for quarantine flows — the same
split-and-quarantine shape the JSONL source uses for corrupt records.

Rules: ``(name, kind, column, param)`` with kinds
- ``not_null``          param ignored
- ``unique``            param ignored (violations = rows beyond the
                        first per value, NULLs exempt — SQL UNIQUE)
- ``in_set``            param = allowed values list (NULL passes;
                        combine with not_null to forbid)
- ``between``           param = (lo, hi) inclusive (NULL passes)
- ``matches``           param = regex the full value must match
- ``expr``              param = SQL boolean over any columns; NULL
                        result counts as a violation (unlike WHERE)

``unique`` is the one rule that cannot ride the single-pass aggregate
(it needs a per-value grain), so it contributes one extra groupBy over
the checked column only — still one pass over the fact per call, not
per rule.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_KINDS = ("not_null", "unique", "in_set", "between", "matches", "expr")


def _violation_expr(kind: str, column: str, param) -> Column:
    """Boolean column: TRUE when the row VIOLATES the rule."""
    c = F.col(column) if column else None
    if kind == "not_null":
        return c.isNull()
    if kind == "in_set":
        return c.isNotNull() & ~c.isin(list(param))
    if kind == "between":
        lo, hi = param
        return c.isNotNull() & ~c.between(F.lit(lo), F.lit(hi))
    if kind == "matches":
        return c.isNotNull() & ~c.rlike(str(param))
    if kind == "expr":
        # NULL predicate = violation: an expectation must PROVE the row
        return ~F.coalesce(F.expr(str(param)), F.lit(False))
    raise ValueError(f"unknown expectation kind {kind!r} (want {_KINDS})")


def _validate(rules) -> None:
    if not rules:
        raise ValueError("rules must be non-empty")
    seen = set()
    for name, kind, _col, _param in rules:
        if kind not in _KINDS:
            raise ValueError(f"unknown expectation kind {kind!r} (want {_KINDS})")
        if name in seen:
            raise ValueError(f"duplicate rule name {name!r}")
        seen.add(name)


def check_expectations(df: DataFrame, rules) -> DataFrame:
    """One report row per rule: ``(rule, kind, column, n_violations,
    passed)``, ordered by rule name. One aggregate pass over the fact
    (plus one groupBy per call if any ``unique`` rule is present)."""
    _validate(rules)
    aggs = []
    names = []
    for name, kind, col, param in rules:
        if kind == "unique":
            continue
        # coalesce: SUM over an EMPTY frame is NULL — an empty table must
        # report 0 violations / passed, not NULL-fail the gate
        aggs.append(F.coalesce(
            F.sum(_violation_expr(kind, col, param).cast("long")),
            F.lit(0)).alias(name))
        names.append((name, kind, col))
    spark = df.sparkSession
    parts = []
    if aggs:
        row = df.agg(*aggs)
        stacked = row.selectExpr(
            "stack({n}, {pairs}) as (rule, n_violations)".format(
                n=len(names),
                pairs=", ".join(f"'{name}', `{name}`" for name, _, _ in names),
            ))
        meta = spark.createDataFrame(
            [(n, k, c) for n, k, c in names], "rule string, kind string, column string")
        parts.append(stacked.join(F.broadcast(meta), "rule"))
    for name, kind, col, _param in rules:
        if kind != "unique":
            continue
        dup = (
            df.filter(F.col(col).isNotNull())
            .groupBy(col).agg((F.count(F.lit(1)) - 1).alias("_extra"))
            .agg(F.coalesce(F.sum("_extra"), F.lit(0)).alias("n_violations"))
            .select(
                F.lit(name).alias("rule"), F.lit("unique").alias("kind"),
                F.lit(col).alias("column"), "n_violations")
        )
        parts.append(dup)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.select(
        "rule", "kind",
        # expr rules span columns: report '' rather than NULL (keeps the
        # report frame total-orderable for downstream sorts/compares)
        F.coalesce(F.col("column"), F.lit("")).alias("column"),
        "n_violations",
        (F.col("n_violations") == 0).alias("passed"),
    ).orderBy("rule")


def violating_rows(df: DataFrame, rules) -> DataFrame:
    """The quarantine side: rows breaking at least one non-``unique``
    rule, with ``_violated`` = sorted array of the rule names they
    break. Map-only (uniqueness is a table-level property, not a row
    property — read it off the report)."""
    _validate(rules)
    flags = [
        F.when(_violation_expr(kind, col, param), F.lit(name))
        for name, kind, col, param in rules if kind != "unique"
    ]
    if not flags:
        raise ValueError("violating_rows needs at least one row-level rule")
    arr = F.array_sort(
        F.filter(F.array(*flags), lambda x: x.isNotNull()))
    return df.withColumn("_violated", arr).filter(F.size("_violated") > 0)
