import sys

import pytest

sys.path.insert(0, "/root/repo")

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    from matrix_multiplication_bigdata_ind_assignments_spark.session import get_spark

    # retainedStages raised for the shuffle-envelope tests: with the
    # default 1000, a full suite run fills the status store and an
    # eviction landing inside a measurement window silently undercounts
    # the cumulative deltas (tests/test_metrics.py; same conf as bench.py)
    s = get_spark(
        "tests",
        cpus=8,
        extra_conf={
            "spark.ui.retainedStages": "40000",
            "spark.ui.retainedJobs": "40000",
        },
    )
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR


def rows_set(df):
    """Order-insensitive canonical form of a DataFrame result."""
    return sorted(tuple(r) for r in df.collect())
