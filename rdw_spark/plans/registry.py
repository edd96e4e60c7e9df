"""Query catalog registry.

Every operator from SURVEY.md §2 that we claim as implemented registers a
named query over the driver testdata tables plus (where SQL-expressible)
the matching DuckDB oracle. The driver compares both at sf=0.01:
row-count + schema + order-insensitive value hash. Computed columns are
aliased identically on both sides and must match in TYPE as well as
value: float aggregates are made exactly reproducible by summing as
DECIMAL(27,6) then casting to DOUBLE on both sides (never rounded), and
integer aggregates are CAST to BIGINT in the oracle (DuckDB widens
untyped SUMs to HUGEINT, which flips the driver's typed value hash).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class CatalogQuery:
    name: str
    fn: QueryFn
    oracle: str | None  # DuckDB SQL, None → rows-only check
    survey: str  # SURVEY.md §2 operator ids this query covers


REGISTRY: dict[str, CatalogQuery] = {}


def register(name: str, oracle: str | None, survey: str) -> Callable[[QueryFn], QueryFn]:
    def deco(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate catalog query: {name}")
        REGISTRY[name] = CatalogQuery(name=name, fn=fn, oracle=oracle, survey=survey)
        return fn

    return deco
