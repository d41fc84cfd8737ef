"""Shared fixtures: one SparkSession and one built warehouse per session."""

from __future__ import annotations

import os
import sys

import pytest

try:  # engine import: resolves via `pip install -e .` / `setup.py develop`
    import super_store_datawarehouse_spark  # noqa: F401
except ImportError:  # raw checkout without an editable install
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
else:
    # __spark_entry__ (the driver-contract adapter) lives at the repo
    # root by contract, outside the installed package — always reachable
    # relative to this script, installed or not.
    if os.path.dirname(os.path.dirname(os.path.abspath(__file__))) not in sys.path:
        sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from super_store_datawarehouse_spark.session import get_spark  # noqa: E402

REFERENCE_CSV = "/root/reference/Sample - Superstore.csv"
TESTDATA_SF = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    s = get_spark("tests", shuffle_partitions=8)
    yield s


@pytest.fixture(autouse=True, scope="module")
def _release_scoped_caches_per_module():
    """Release operator-registered scoped caches between test modules.

    Without this, every scoped_cache() an operator takes during a test
    stays in the block manager for the rest of the pytest session — the
    exact accumulation the mechanism exists to prevent. Module scope
    (not per-test) keeps intra-module cache reuse, which some tests
    lean on for speed, while bounding session-wide growth.
    """
    from super_store_datawarehouse_spark.session import release_scoped_caches

    yield
    release_scoped_caches()


@pytest.fixture(scope="session")
def warehouse(spark):
    from super_store_datawarehouse_spark.warehouse import build_warehouse

    if not os.path.exists(REFERENCE_CSV):
        pytest.skip("reference CSV not available")
    return build_warehouse(spark)
