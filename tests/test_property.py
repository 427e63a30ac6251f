"""Property-based tests: multiply() against numpy ground truth on
hypothesis-generated matrices — the cross-implementation check the
reference never had (SURVEY.md §5)."""

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

from matrix_multiplication_bigdata_ind_assignments_spark.operators import matrix as M

DIM = 6


def to_coo_df(spark, arr):
    rows = [
        (i, j, float(arr[i, j]))
        for i in range(arr.shape[0])
        for j in range(arr.shape[1])
        if arr[i, j] != 0.0
    ]
    if not rows:
        rows = [(0, 0, 0.0)]
    return spark.createDataFrame(rows, "i long, j long, v double")


matrices = st.lists(
    st.floats(min_value=-10, max_value=10, allow_nan=False, width=32),
    min_size=DIM * DIM,
    max_size=DIM * DIM,
).map(lambda xs: np.array(xs, dtype=np.float64).reshape(DIM, DIM))


@settings(max_examples=8, deadline=None)
@given(a=matrices, b=matrices)
def test_multiply_matches_numpy(spark, a, b):
    expected = a @ b
    got = {
        (r["i"], r["j"]): r["v"]
        for r in M.multiply(to_coo_df(spark, a), to_coo_df(spark, b), strategy="join").collect()
    }
    for i in range(DIM):
        for j in range(DIM):
            assert got.get((i, j), 0.0) == pytest.approx(round(expected[i, j], 6), abs=2e-6)


@settings(max_examples=4, deadline=None)
@given(a=matrices, b=matrices)
def test_blocked_matches_numpy(spark, a, b):
    expected = a @ b
    got = {
        (r["i"], r["j"]): r["v"]
        for r in M.multiply(
            to_coo_df(spark, a), to_coo_df(spark, b), strategy="blocked", block_size=4
        ).collect()
    }
    for i in range(DIM):
        for j in range(DIM):
            assert got.get((i, j), 0.0) == pytest.approx(round(expected[i, j], 6), abs=2e-6)
