"""Query service layer (X5/X11): pool-scoped execution + deadline cancel."""

from __future__ import annotations

import time

import pytest
from pyspark.sql import functions as F

from rdw_spark.service import DEFAULT_POOLS, QueryService, QueryTimeout, allocation_file


def test_allocation_file_shape():
    path = allocation_file(DEFAULT_POOLS)
    with open(path) as fh:
        xml = fh.read()
    for pool in ("interactive", "aggregate", "admin"):
        assert f'name="{pool}"' in xml
    assert "<weight>4</weight>" in xml


def test_run_returns_result_and_restores_pool(spark):
    svc = QueryService(spark)
    out = svc.run(lambda: spark.range(1000).agg(F.sum("id")).collect()[0][0],
                  pool="aggregate")
    assert out == 499500
    # thread-local props on the service's worker thread don't leak here
    assert spark.sparkContext.getLocalProperty("spark.scheduler.pool") is None


def test_run_propagates_query_error(spark):
    svc = QueryService(spark)
    with pytest.raises(Exception, match="boom"):
        svc.run(lambda: (_ for _ in ()).throw(RuntimeError("boom")))


def test_timeout_cancels_and_session_survives(spark):
    svc = QueryService(spark)

    def slow():
        # a genuinely long Spark job: python sleep inside the tasks
        import pandas as pd  # noqa: PLC0415

        def nap(it):
            for pdf in it:
                time.sleep(30)
                yield pdf

        return spark.range(8).repartition(8).mapInPandas(nap, "id long").count()

    t0 = time.time()
    with pytest.raises(QueryTimeout, match="cancelled"):
        svc.run(slow, pool="interactive", timeout_s=3.0, description="nap query")
    assert time.time() - t0 < 25  # cancelled, not run to completion
    # the session keeps serving queries after a cancel
    assert spark.range(10).count() == 10
