from __future__ import annotations

import sys

import pytest

sys.path.insert(0, "/root/repo")

from rdw_spark.session import get_spark

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    # NOTE (r13, measured): AQE stays ON here — disabling it for the test
    # session was A/B'd (test_dim_ingest 58.3s -> 74.8s) and REJECTED:
    # at test scale AQE's partition coalescing (8 shuffle tasks -> 1)
    # saves more than its re-optimization round-trips cost.
    s = get_spark("rdw-tests", cpus=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_DIR
