"""Every catalog query matches its DuckDB oracle at sf0.001 — the same
row-count + column + order-insensitive multiset compare the driver runs
at sf0.01 (SURVEY.md §5 test plan: DuckDB as SQL oracle)."""

from __future__ import annotations

import math
from datetime import date, datetime

import duckdb
import pytest

from rdw_spark.plans.catalog import get_catalog

from .conftest import SF_DIR

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)


def _norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(round(v, 9) + 0.0)
    if isinstance(v, (datetime, date)):
        return v.isoformat()
    if isinstance(v, list):
        return tuple(_norm(x) for x in v)
    return v


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    yield con
    con.close()


@pytest.mark.parametrize("name", sorted(get_catalog()))
def test_query_matches_oracle(name, spark, sf_dir, duck):
    q = get_catalog()[name]
    sdf = q.fn(spark, sf_dir)
    srows = sdf.collect()
    if q.oracle is None:
        assert srows is not None  # rows-only smoke: runs and returns a result
        return
    ddf = duck.sql(q.oracle)
    dcols = list(ddf.columns)
    drows = ddf.fetchall()
    assert sorted(sdf.columns) == sorted(dcols), f"{name}: column mismatch"
    assert len(srows) == len(drows), f"{name}: rowcount mismatch"
    scols = sorted(sdf.columns)
    sidx = [sdf.columns.index(c) for c in scols]
    didx = [dcols.index(c) for c in scols]
    sset = sorted(tuple(_norm(r[i]) for i in sidx) for r in srows)
    dset = sorted(tuple(_norm(r[i]) for i in didx) for r in drows)
    assert sset == dset, f"{name}: value mismatch"


@pytest.mark.parametrize(
    "name", sorted(n for n in get_catalog() if not n.startswith("zz_"))
)
def test_window_entry_projects_flat_scalars(name, spark, sf_dir):
    """Driver-window pre-flight (round-11 lesson): the driver's pandas
    canonicalizer cannot sort list/struct/map cells, so every
    un-prefixed entry must project atomic columns only. Only the schema
    is read (no collect here), but entries whose BUILDERS run eager
    jobs (e.g. pack_sequences' localCheckpoint prefix sum) still execute
    them — this gate is cheap, not free."""
    from rdw_spark.plans.registry import nested_columns

    q = get_catalog()[name]
    bad = nested_columns(q.fn(spark, sf_dir).schema)
    assert not bad, (
        f"{name} is in the driver window but projects nested columns "
        f"{bad}; serialize (array_join/posexplode) or park as zz_"
    )


def test_flat_scalar_gate_rejects_arrays(spark):
    """The gate itself must fail on a synthetic array-column schema."""
    from pyspark.sql import functions as F

    from rdw_spark.plans.registry import nested_columns

    df = spark.range(1).select(
        F.col("id"), F.array(F.lit(1), F.lit(2)).alias("xs"),
        F.struct(F.lit(1).alias("a")).alias("st"),
        F.create_map(F.lit("k"), F.lit(1)).alias("m"),
    )
    assert nested_columns(df.schema) == ["xs", "st", "m"]
