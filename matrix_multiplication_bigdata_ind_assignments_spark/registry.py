"""Query registry — the single source of truth for the engine surface.

Each capability from SURVEY.md §2.2 (canonical reference operators) and
§2.3 (LLM-data-pipeline extensions) is registered here as a named query:
a callable ``(spark, sf_dir) -> DataFrame`` plus, when SQL-expressible, a
DuckDB oracle SQL string over the same parquet tables (pre-registered
views: region nation customer supplier part orders lineitem events
documents embeddings).  ``__spark_entry__.py`` exposes this registry to
the driver.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Optional

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class Query:
    name: str
    fn: QueryFn
    oracle: Optional[str]  # ANSI SQL for DuckDB; None => rows-only check
    doc: str = ""


REGISTRY: dict[str, Query] = {}


def register(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Decorator: register ``fn`` as query ``name`` with optional oracle SQL."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        REGISTRY[name] = Query(name=name, fn=fn, oracle=oracle, doc=fn.__doc__ or "")
        return fn

    return deco


def queries() -> dict[str, QueryFn]:
    _load_all()
    return {n: q.fn for n, q in REGISTRY.items()}


def oracles() -> dict[str, str]:
    _load_all()
    return {n: q.oracle for n, q in REGISTRY.items() if q.oracle is not None}


_LOADED = False


def _load_all() -> None:
    """Import every module that registers queries (idempotent)."""
    global _LOADED
    if _LOADED:
        return
    from .operators import (  # noqa: F401
        matrix,
        relational,
        aggregates,
        windows,
        setops,
        dedup,
        similarity,
        text,
        multimodal,
        bench_results,
        sampling,
        profiling,
        pipeline,
    )
    from .streaming import queries as streaming_queries  # noqa: F401

    _LOADED = True
