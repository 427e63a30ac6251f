"""Driver contract for the spark-graft builder (PySpark target).

Thin adapter over the engine's query registry
(`matrix_multiplication_bigdata_ind_assignments_spark.registry`): every implemented operator from
SURVEY.md §2.2/§2.3 is registered there with its DuckDB oracle SQL.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from matrix_multiplication_bigdata_ind_assignments_spark import registry


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: the gram matrix EᵀE of the
    embedding matrix — scan → posexplode → self-join → hash agg, the
    engine's spine (SURVEY.md §7 minimum slice)."""
    from matrix_multiplication_bigdata_ind_assignments_spark.operators.matrix import from_embeddings, multiply, transpose

    E = from_embeddings(spark, "/root/testdata/sf0.001")
    return multiply(transpose(E), E, strategy="join")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator (SURVEY.md §2)."""
    return registry.queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query; omitted keys are rows-only checks."""
    return registry.oracles()
