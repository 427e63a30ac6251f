"""Order-independent numeric aggregation helpers (fixed-point route).

Distributed double sums are add-order nondeterministic, so money-style
aggregates route through 6-dp fixed point: each term becomes an exact
integer count of µunits via `floor(x * 1e6 + 0.5)` — pure IEEE-754
arithmetic (one multiply, one add, one floor) that yields the bit-same
long in Spark and DuckDB — and the per-group reduction is an exact long
sum, associative and commutative, so any partitioning gives the same
result (SURVEY.md §7 FP-reproducibility risk).

Why not DECIMAL(30,6)?  Same determinism, ~7× the cost: Spark's
double→decimal cast allocates a java BigDecimal per row and the wide
decimal sum runs outside the codegen fast path (measured on TPC-H Q1 at
sf0.1: decimal sums 1.8s vs fixed-point 0.7s vs raw doubles 0.26s).

Rounding to r < 6 decimals happens on the per-group total in integer
space ((S+h) - (S+h) % d — half-up for the non-negative measures these
helpers are used on), never by `round()` on a double: Spark's round goes
through the double's shortest decimal representation while DuckDB rounds
the binary value, and those disagree near .5 boundaries.  The final
long→double cast and /1e6 are single IEEE ops, identical in both engines.

Bounds: longs hold ±9.2e18 µunits = ±9.2e12 units per group — far beyond
any fixture sum (sf0.1 sum_charge ≈ 2.3e10).  For group sums beyond 1e12
units (planet-scale money columns), fall back to `dec_sum30`, the
original DECIMAL(30,6) form, and pay the cast.

The DuckDB-side oracle SQL must use the *same* formulas; build it with
`sql_dec_sum` / `sql_dec_avg` / `sql_fx` below instead of hand-writing.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_SCALE = 1_000_000  # 6 decimal places


def _as_col(col) -> Column:
    return F.col(col) if isinstance(col, str) else col


def fx(col) -> Column:
    """Exact per-row fixed-point: x → floor(x*1e6 + 0.5) as long (µunits)."""
    return F.floor(_as_col(col) * F.lit(float(_SCALE)) + F.lit(0.5)).cast("long")


def _fx_round(total: Column, round_to: int) -> Column:
    """µunit long total → double rounded to `round_to` decimals, all in
    integer space (see module docstring for why not F.round)."""
    d = 10 ** (6 - round_to)
    if d > 1:
        shifted = total + F.lit(d // 2)
        total = shifted - shifted % F.lit(d)
    return total.cast("double") / F.lit(float(_SCALE))


def dec_sum(col, round_to: int = 6) -> Column:
    """Deterministic sum of a non-negative money-style double column."""
    return _fx_round(F.sum(fx(col)), round_to)


def dec_avg(col, round_to: int = 6) -> Column:
    """Deterministic avg: exact µunit sum / non-null count, then round."""
    col = _as_col(col)
    return F.round(F.sum(fx(col)).cast("double") / F.lit(float(_SCALE)) / F.count(col), round_to)


def fx_sum_window(col, window) -> Column:
    """Windowed deterministic sum (no reduced-precision rounding)."""
    return F.sum(fx(col)).over(window).cast("double") / F.lit(float(_SCALE))


# ---------------------------------------------------------------- oracle SQL


def sql_fx(expr: str) -> str:
    """DuckDB equivalent of fx()."""
    return f"CAST(floor(({expr}) * 1000000 + 0.5) AS BIGINT)"


def sql_dec_sum(expr: str, r: int) -> str:
    """DuckDB equivalent of dec_sum(expr, r)."""
    s = f"sum({sql_fx(expr)})"
    d = 10 ** (6 - r)
    if d > 1:
        s = f"(({s}+{d // 2}) - (({s}+{d // 2}) % {d}))"
    return f"(CAST({s} AS DOUBLE) / 1000000)"


def sql_dec_avg(expr: str, r: int = 6) -> str:
    """DuckDB equivalent of dec_avg(expr, r)."""
    return f"round(CAST(sum({sql_fx(expr)}) AS DOUBLE) / 1000000 / count({expr}), {r})"


def sql_fx_sum_over(expr: str, over: str) -> str:
    """DuckDB equivalent of fx_sum_window: sum(fx) OVER <over> / 1e6."""
    return f"(CAST(sum({sql_fx(expr)}) OVER {over} AS DOUBLE) / 1000000)"


# ------------------------------------------------- wide-range decimal route


def dec(col, scale: int = 6) -> Column:
    """double → DECIMAL(30,scale): the wide-range fallback term cast."""
    return _as_col(col).cast(f"decimal(30,{scale})")


def dec_sum30(col, round_to: int = 6) -> Column:
    """Original DECIMAL(30,6) sum — for group sums beyond the ±9.2e12-unit
    fixed-point range.  Oracle form:
    CAST(round(sum(CAST(x AS DECIMAL(30,6))), r) AS DOUBLE)."""
    return F.round(F.sum(dec(col)), round_to).cast("double")
