"""PySpark-native analytics engine with the capabilities of the reference
matrix-multiplication benchmark suite (SURVEY.md), re-expressed Spark-first.

Layout
------
- ``session``    : SparkSession factory (AQE, Arrow, shuffle sizing).
- ``sources``    : table loaders / CSV corpus scan / sinks.
- ``operators``  : matrix algebra, relational, window, set, dedup,
                   similarity, text, multimodal operators.
- ``functions``  : scalar/vector helper column expressions.
- ``plans``      : the tiny Python-side physical-strategy chooser for
                   ``multiply`` (everything else rides on Catalyst).
- ``streaming``  : Structured Streaming queries over the events table.
- ``registry``   : the query registry the driver contract is built from.

Every user-visible capability is registered in ``registry.REGISTRY`` with an
optional DuckDB oracle SQL; ``/root/repo/__spark_entry__.py`` is a thin
adapter over it.
"""

from . import registry  # noqa: F401

__all__ = ["registry"]
__version__ = "0.1.0"
