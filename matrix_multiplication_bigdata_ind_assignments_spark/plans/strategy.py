"""The engine's only hand-written planner (SURVEY.md §4 conclusion):
physical-strategy choice for `multiply`.  Everything else — pushdown,
pruning, join reordering, partial aggregation, AQE — is Catalyst's job.

Mirrors the reference's CLI algo dispatch
(ref: `Stage 2/Python Implementation/mm_opt.py:96-111`) but chooses from
statistics instead of a flag.
"""

from __future__ import annotations

BROADCAST_NNZ_LIMIT = 2_000_000  # ~48 MB of COO rows — safe to broadcast
BLOCKED_MIN_DIM = 512  # below this the plain join wins (blocking overhead)


def choose_multiply_strategy(
    left_nnz: int,
    right_nnz: int,
    n: int,
    density: float = 1.0,
) -> str:
    """Pick a physical strategy for C = A·B.

    - Small right operand → ``broadcast`` (Stage 3's manual B-broadcast,
      done the Spark way: no shuffle of the big side).
    - Large dense×dense → ``blocked`` (block-grid + per-pair numpy GEMM:
      shuffle O(n²·n/BS) cells instead of materializing O(n³) join rows).
    - Everything else (sparse operands, modest sizes) → ``join``: the COO
      equi-join + hash agg that Catalyst/AQE handles natively; with nnz ≪
      n² only nonzeros flow, which is exactly the reference's CSR point.
    """
    if right_nnz <= BROADCAST_NNZ_LIMIT:
        return "broadcast"
    if n >= BLOCKED_MIN_DIM and density > 0.5:
        return "blocked"
    return "join"
