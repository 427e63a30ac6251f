"""Algebraic property + strategy-equivalence tests (SURVEY.md §5.2-5.3) —
the cross-checks the reference never did."""

import pytest
from pyspark.sql import functions as F

from matrix_multiplication_bigdata_ind_assignments_spark.operators import matrix as M

from conftest import rows_set


@pytest.fixture(scope="module")
def A(spark, sf_dir):
    return M.mat_A(spark, sf_dir).cache()


@pytest.fixture(scope="module")
def B(spark, sf_dir):
    return M.mat_B(spark, sf_dir).cache()


def test_multiply_identity(spark, A):
    I = M.identity(spark, 64)
    prod = M.multiply(A, I, strategy="join")
    expected = A.select("i", "j", F.round("v", 6).alias("v"))
    assert rows_set(prod) == rows_set(expected)


def test_strategies_agree(A, B):
    dense = rows_set(M.multiply(A, B, strategy="join"))
    assert dense == rows_set(M.multiply(A, B, strategy="broadcast"))
    assert dense == rows_set(M.multiply(A, B, strategy="blocked", block_size=32))
    assert dense == rows_set(M.multiply(A, B, strategy="blocked", block_size=17))


def test_blockmatrix_strategy_removed(A, B):
    """The per-row Python→JVM MatrixEntry bridge is not an exposed strategy."""
    import pytest

    with pytest.raises(ValueError, match="unknown strategy"):
        M.multiply(A, B, strategy="blockmatrix")


def test_blocked_3d_fallback_agrees(A, B, monkeypatch):
    """Force the 3-D (bi,bk,bj) decomposition (the huge-inner-dimension
    path) and check it matches the default 2-D panel result."""
    dense = rows_set(M.multiply(A, B, strategy="join"))
    monkeypatch.setattr(M, "_PANEL_BYTES_LIMIT", 0)
    assert dense == rows_set(M.multiply(A, B, strategy="blocked", block_size=32))


def test_auto_strategy_matches_and_chooses(A, B):
    from matrix_multiplication_bigdata_ind_assignments_spark.plans import choose_multiply_strategy

    # planner: small right operand → broadcast; big dense → blocked; else join
    assert choose_multiply_strategy(10**7, 10**4, 2048) == "broadcast"
    assert choose_multiply_strategy(10**7, 10**7, 2048, density=0.9) == "blocked"
    assert choose_multiply_strategy(10**7, 10**7, 2048, density=0.01) == "join"
    assert rows_set(M.multiply(A, B, strategy="auto")) == rows_set(M.multiply(A, B))


def test_transpose_involution(A):
    assert rows_set(M.transpose(M.transpose(A))) == rows_set(A)


def test_gram_is_symmetric(spark, sf_dir, A):
    gram = M.multiply(M.transpose(A), A, strategy="join").cache()
    flipped = gram.select(F.col("j").alias("i"), F.col("i").alias("j"), "v")
    assert rows_set(gram) == rows_set(flipped)


def test_product_transpose_rule(A, B):
    """(A·B)ᵀ == Bᵀ·Aᵀ."""
    left = M.transpose(M.multiply(A, B, strategy="join"))
    right = M.multiply(M.transpose(B), M.transpose(A), strategy="join")
    assert rows_set(left) == rows_set(right)


def test_sparsify_noop_threshold_equals_dense(A, B):
    """sparse(τ=-1) keeps everything → same product as dense."""
    assert rows_set(M.multiply(M.sparsify(A, -1.0), B)) == rows_set(M.multiply(A, B))


def test_sparsify_filters(A):
    assert M.sparsify(A, 0.05).count() < A.count()


def test_frobenius_positive(A):
    val = M.frobenius(A).collect()[0]["frob_sq"]
    assert val > 0


def test_matmul_shape(A, B):
    out = M.multiply(A, B).collect()
    assert len(out) == 64 * 64
    assert {(r["i"], r["j"]) for r in out} == {(i, j) for i in range(64) for j in range(64)}


def test_auto_stats_memoized_no_extra_jobs(spark, sf_dir, monkeypatch):
    """Repeated strategy="auto" planning over the same logical operands
    must execute ZERO additional stat jobs (stats memoized by plan
    semanticHash — VERDICT r2 item 3).  After warm-up, DataFrame.first is
    poisoned: any re-computation of operand stats would raise.  (A raw
    status-tracker job count can't be used — each load() re-reads parquet
    footers, which shows up as tiny schema jobs unrelated to stats.)"""
    from pyspark.sql import DataFrame

    M._COO_STATS.clear()
    M.multiply(M.mat_A(spark, sf_dir), M.mat_B(spark, sf_dir), strategy="auto")
    assert len(M._COO_STATS) == 2  # A-stats and B-stats warmed

    def boom(self):
        raise AssertionError("stat job re-executed despite memo")

    monkeypatch.setattr(DataFrame, "first", boom)
    # fresh DataFrame objects, same logical plan → memo hit, no stat job
    M.multiply(M.mat_A(spark, sf_dir), M.mat_B(spark, sf_dir), strategy="auto")


def test_knn_graph_count_memoized_no_extra_jobs(spark, sf_dir, monkeypatch):
    """q_knn_graph's grid-sizing count is memoized per sf_dir: building the
    plan a second time executes no count job."""
    from pyspark.sql import DataFrame

    from matrix_multiplication_bigdata_ind_assignments_spark.operators import similarity as S

    S._EMB_COUNTS.clear()
    S.q_knn_graph(spark, sf_dir)  # plan only — warms the memo
    assert sf_dir in S._EMB_COUNTS

    def boom(self):
        raise AssertionError("count job re-executed despite memo")

    monkeypatch.setattr(DataFrame, "count", boom)
    S.q_knn_graph(spark, sf_dir)


def test_planner_partials_gate_and_block_size(A, B):
    """r6 planner upgrades: broadcast is gated on estimated partial-product
    volume (a broadcast-sized right side can still explode the hash agg),
    and the blocked kernel sizes its own tiles from (n, panel budget)."""
    from matrix_multiplication_bigdata_ind_assignments_spark.plans import (
        choose_block_size,
        choose_multiply_strategy,
    )

    # the measured n=2048 bench stats (559k nnz/side → 152M est partials,
    # density 0.13): broadcast-sized nnz, but broadcast measured 10.0s vs
    # blocked 1.8s — the planner must pick blocked
    assert choose_multiply_strategy(559_000, 559_000, 2048, density=0.13) == "blocked"
    # the n=256 bench stats (fully dense, 16.8M partials): broadcast wins
    assert choose_multiply_strategy(65_536, 65_536, 256, density=1.0) == "broadcast"

    assert choose_block_size(1024) == 512  # the measured n=1024 optimum
    assert choose_block_size(2048) == 1024  # measured 1.79s vs 1.96s at 512
    assert choose_block_size(4096) == 1024  # panel cap keeps 2-D (3.3s vs 5.4s 3-D)
    assert choose_block_size(8192) == 512  # budget cap scales down
    assert choose_block_size(50) == 64  # overhead floor
    # n so large NO 2-D panel fits the budget (mem_cap < 64): size for the
    # 3-D decomposition (3·bs² tiles per task) instead of the old floor's
    # degenerate bs=64 → (n/64)³ grid (r6 ADVICE)
    assert choose_block_size(100_000) == 1024
    assert choose_block_size(100_000, panel_bytes=1 << 20) == 128

    # partials-heavy but too sparse/small for blocked: broadcast (if the
    # right side fits) strictly dominates the plain shuffle join — the
    # partials gate only demotes broadcast when blocked actually fires
    # (r6 ADVICE)
    assert choose_multiply_strategy(10**9, 10**6, 2048, density=0.01) == "broadcast"
    assert choose_multiply_strategy(10**9, 10**8, 2048, density=0.01) == "join"

    # blocked with planner-chosen bs (block_size=None) stays correct
    dense = rows_set(M.multiply(A, B, strategy="join"))
    assert dense == rows_set(M.multiply(A, B, strategy="blocked"))


def test_blocked_3d_dense_tiles_rectangular(spark):
    """The 3-D path's reason to exist is a huge INNER dimension (k ≫ n):
    force it on a rectangular product (32×200 · 200×16) and check the
    dense-tile partial sums against the join path."""
    import pyspark.sql.functions as F

    A = (
        spark.range(32 * 200)
        .select(
            (F.col("id") / 200).cast("long").alias("i"),
            F.pmod("id", F.lit(200)).alias("j"),
            (F.pmod(F.col("id") * 37, F.lit(19)) - 9.0).alias("v"),
        )
        .where(F.col("v") != 0)
    )
    B = (
        spark.range(200 * 16)
        .select(
            (F.col("id") / 16).cast("long").alias("i"),
            F.pmod("id", F.lit(16)).alias("j"),
            (F.pmod(F.col("id") * 53, F.lit(23)) - 11.0).alias("v"),
        )
        .where(F.col("v") != 0)
    )
    dense = rows_set(M.multiply(A, B, strategy="join"))
    # panel_bytes=1 forces the 3-D decomposition at any k extent
    assert dense == rows_set(
        M.multiply(A, B, strategy="blocked", block_size=16, panel_bytes=1)
    )


def test_blocked_emits_exact_cancellation_cells(spark):
    """A cell whose partial products cancel to exact 0.0 must appear (as
    v=0.0) in every strategy, because the join form — and the oracle —
    emits every structurally-touched cell (r6 review finding)."""
    A = spark.createDataFrame([(0, 0, 1.0), (0, 1, -1.0)], "i long, j long, v double")
    B = spark.createDataFrame([(0, 0, 1.0), (1, 0, 1.0)], "i long, j long, v double")
    want = rows_set(M.multiply(A, B, strategy="join"))
    assert want == [(0, 0, 0.0)]  # the cancelling cell IS emitted by join
    assert want == rows_set(M.multiply(A, B, strategy="blocked", block_size=32))
    # bs=1 + tiny panel budget → 3-D path with the cancelling partials in
    # DIFFERENT bk tiles, exercising the cross-tile touched-mask OR
    assert want == rows_set(
        M.multiply(A, B, strategy="blocked", block_size=1, panel_bytes=1)
    )


def test_touched_mask_regimes_agree():
    """_touched_from_coo's sparse (per-k OR) and dense (presence GEMM)
    regimes must agree with brute force — randomized over densities that
    exercise BOTH sides of the dispatch."""
    import numpy as np

    rng = np.random.RandomState(7)
    for density in (0.02, 0.3, 0.9):
        for _ in range(5):
            m, k, n = rng.randint(3, 14, size=3)
            a = rng.rand(m, k) < density
            b = rng.rand(k, n) < density
            a_ix = np.nonzero(a)
            b_ix = np.nonzero(b)
            want = (a.astype(float) @ b.astype(float)) > 0
            got = M._touched_from_coo((m, n), a_ix, b_ix)
            assert (got == want).all(), (density, m, k, n)
