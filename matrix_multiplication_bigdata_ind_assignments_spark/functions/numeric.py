"""Order-independent numeric aggregation helpers.

Distributed double sums are add-order nondeterministic, so money-style
aggregates route through DECIMAL: the per-row product is a deterministic
IEEE double in every engine, the double→DECIMAL(30,6) cast is a
deterministic decimal rounding (a binary double can never land exactly on
a .5×10⁻⁶ tie — that would need a 5⁶ denominator), and decimal summation
is exact.  Result: bit-identical aggregates in Spark and DuckDB no matter
the partitioning (SURVEY.md §7 FP-reproducibility risk, solved rather than
papered over with coarse rounding).

The DuckDB-side equivalents are in the oracle SQL strings:
  dec_sum  ≡ CAST(round(sum(CAST(x AS DECIMAL(30,6))), r) AS DOUBLE)
  dec_avg  ≡ round(CAST(sum(CAST(x AS DECIMAL(30,6))) AS DOUBLE) / count(*), r)
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dec(col, scale: int = 6) -> Column:
    if isinstance(col, str):
        col = F.col(col)
    return col.cast(f"decimal(30,{scale})")


def dec_sum(col, round_to: int = 6) -> Column:
    """Exact decimal sum, rounded, as double."""
    return F.round(F.sum(dec(col)), round_to).cast("double")


def dec_avg(col, round_to: int = 6) -> Column:
    """sum(decimal)/count as double — deterministic avg over any partitioning."""
    if isinstance(col, str):
        col = F.col(col)
    return F.round(F.sum(dec(col)).cast("double") / F.count(col), round_to)
