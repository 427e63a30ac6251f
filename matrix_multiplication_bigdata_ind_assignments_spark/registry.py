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


# Driver-facing ordering.  The correctness gate walks queries in dict order
# under a budget (~50 queries/round), so the order IS the verification
# priority.  Round-3 rotation (VERDICT.md r2 item 1): the 35 queries with
# no driver correctness row yet (34 never checked in rounds 1-2 plus the
# round-3-new span dedup) come first, then 15 plan-sensitive round-1/2
# greens as regression canaries (VERDICT.md r2 item 2), then everything
# else in registration order.
_PRIORITY: tuple[str, ...] = (
    # --- never driver-checked (34 from rounds 1-2) ---
    # flagship pipeline composites
    "q_corpus_clean_e2e",
    "q_decontaminate",
    "q_dedup_cross_source",
    "q_corpus_mix",
    "q_token_shards",
    # sampling splits
    "q_sample_hash",
    "q_train_test_split",
    "q_stratified_sample",
    # profiling
    "q_null_profile",
    "q_summary_stats",
    "q_corr",
    "q_hist_bucket",
    "q_data_expectations",
    "q_zscore_outliers",
    "q_hll_union",
    # sources / sinks
    "q_json_scan",
    "q_orc_roundtrip",
    "q_partitioned_sink",
    "q_compact_small_files",
    "q_bucketed_join",
    "q_python_datasource",
    # remaining relational / functions surface
    "q_json_variant",
    "q_interval_arith",
    "q_map_roundtrip",
    "q_window_ntile",
    # streaming variants
    "q_stream_rate_source",
    "q_stream_python_source",
    "q_stream_watermark_late",
    "q_stream_foreach_batch",
    "q_stream_stateful_counter",
    "q_stream_static_join",
    "q_stream_stream_join",
    "q_stream_transform_with_state",
    # multimodal
    "q_multimodal_frame_sample",
    # new in round 3 (needs its first driver row)
    "q_dedup_span_exact",
    # --- regression canaries: plan-sensitive r1/r2 greens (15) ---
    "q_matmul_dense",
    "q_matmul_blocked",
    "q_matmul_sparse",
    "q_range_join",
    "q_asof_join",
    "q_scd2_intervals",
    "q_dedup_exact",
    "q_dedup_minhash",
    "q_dedup_embedding",
    "q_cosine_topk",
    "q_knn_graph",
    "q_tfidf",
    "q_sequence_pack",
    "q_stream_tumbling",
    "q_stream_session",
)


def _ordered() -> list[Query]:
    _load_all()
    # priority names first (in _PRIORITY order), then the rest in
    # registration order
    prioritized = [n for n in _PRIORITY if n in REGISTRY]
    rest = [n for n in REGISTRY if n not in set(_PRIORITY)]
    return [REGISTRY[n] for n in prioritized + rest]


def queries() -> dict[str, QueryFn]:
    return {q.name: q.fn for q in _ordered()}


def oracles() -> dict[str, str]:
    return {q.name: q.oracle for q in _ordered() if q.oracle is not None}


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
