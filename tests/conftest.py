"""Shared Spark fixture for the test suite.

One session per test run (JVM start is ~10 s); small shuffle-partition count
so tiny test shuffles don't pay 32-task overhead.  Multi-partition
determinism (the reference's 1/2/4/16-worker idiom, distinct.rs:15-28) is
exercised by re-running pipelines under different shuffle settings in
test_determinism.py.
"""

from __future__ import annotations

import pytest

from database_stream_processor_spark.session import get_spark


def pytest_addoption(parser):
    parser.addoption(
        "--runslow", action="store_true", default=False,
        help="run tests marked slow (the multi-minute deep tier; the "
             "default run must fit the driver's verification window)")


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "slow: multi-minute deep-tier test, excluded from the default "
        "run; opt in with --runslow (or -m slow)")


def pytest_collection_modifyitems(config, items):
    if config.getoption("--runslow") or config.getoption("-m"):
        return
    skip = pytest.mark.skip(
        reason="slow tier (opt in with --runslow or -m slow)")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="dbsp_spark_tests", shuffle_partitions=8)
    yield s


SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR


def zset_to_dict(z):
    """Collect a (small, test-sized) Z-set into {row_tuple: weight}."""
    cols = z.data_columns
    out = {}
    for r in z.consolidate().df.collect():
        out[tuple(r[c] for c in cols)] = r["__weight"]
    return out
