import sys

import pytest

sys.path.insert(0, "/root/repo")

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    from matrix_multiplication_bigdata_ind_assignments_spark.session import get_spark

    s = get_spark("tests", cpus=8)
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR


def rows_set(df):
    """Order-insensitive canonical form of a DataFrame result."""
    return sorted(tuple(r) for r in df.collect())
