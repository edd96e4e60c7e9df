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

DuckDB pitfall (found round 11): its direct DECIMAL→DOUBLE cast
double-rounds when the scaled integer exceeds 2^53 (int128 → double,
then /10^scale — e.g. DECIMAL(38,12) '69150577.6905' casts to
…6.69049999), while Spark's BigDecimal.doubleValue is correctly
rounded. When a wide-decimal→double conversion feeds a
cancellation-amplifying expression, route the oracle's cast through
VARCHAR: CAST(CAST(x AS VARCHAR) AS DOUBLE) is correctly rounded.
Also: DuckDB multiplies decimals in the NARROW physical type (an
(18,6)×(18,6) square overflows int64 instead of promoting) — keep
multiplicands at ≤(16,6) and widen one side to (19,6) to force the
int128 path.
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


def nested_columns(schema) -> list[str]:
    """Columns whose type the driver's pandas canonicalizer cannot sort.

    The driver canonicalizes results by sorting rows in pandas;
    list/struct/map-typed cells raise ``TypeError: unhashable type``
    there (round-11 lesson: ``text_inverted_index`` was bit-exact but
    driver-RED). Rule: every un-prefixed (driver-window) catalog entry
    must project flat scalar columns only — serialize arrays via
    ``array_join``/``posexplode`` before returning. ``zz_``-parked
    entries may keep nested outputs."""
    from pyspark.sql import types as T

    return [
        f.name
        for f in schema.fields
        if isinstance(f.dataType, (T.ArrayType, T.StructType, T.MapType))
    ]


def register(name: str, oracle: str | None, survey: str) -> Callable[[QueryFn], QueryFn]:
    def deco(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate catalog query: {name}")
        REGISTRY[name] = CatalogQuery(name=name, fn=fn, oracle=oracle, survey=survey)
        return fn

    return deco
