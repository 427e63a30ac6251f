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
# under a budget, so the order IS the verification priority: queries that
# have never earned a driver correctness row come first (LLM-pipeline
# surface — dedup, similarity, text, streaming, sampling, profiling — per
# VERDICT.md r1 item 3), queries already verified green in round 1 come
# last.  Names not listed keep registration order after the listed ones.
_PRIORITY: tuple[str, ...] = (
    # previously-ERR, now fixed — must earn green rows
    "q_range_join",
    "q_asof_join",
    "q_approx_percentiles",
    # §2.2 canonical operators the round-1 gate never reached
    "q_scd2_intervals",
    "q_algo_filter",
    "q_mem_column_resolve",
    "q_results_scan_union",
    "q_csv_sink",
    # deduplication family
    "q_dedup_exact",
    "q_dedup_keep_first",
    "q_dedup_minhash",
    "q_dedup_simhash",
    "q_dedup_ngram_jaccard",
    "q_dedup_embedding",
    "q_dedup_near",
    "q_dedup_components",
    "q_dedup_components_star",
    "q_dedup_semantic_groups",
    "q_dedup_near_ml",
    # similarity search
    "q_cosine_topk",
    "q_ann_lsh",
    "q_ann_ivf",
    "q_ann_pq",
    "q_knn_graph",
    # text analysis
    "q_wordcount",
    "q_tfidf",
    "q_bm25",
    "q_token_count",
    "q_quality_score",
    "q_langid",
    "q_lang_profile",
    "q_doc_fingerprint",
    "q_text_stats",
    "q_repetition_filter",
    "q_pii_scrub",
    "q_udtf_tokens",
    "q_json_extract",
    "q_date_buckets",
    "q_vector_ops",
    "q_chunk_overlap",
    # flagship curation + multimodal ops promoted into the first-50 window
    "q_sequence_pack",
    "q_domain_cap",
    "q_sample_weighted",
    "q_multimodal_features",
    "q_multimodal_phash_dedup",
    # streaming headliners
    "q_stream_tumbling",
    "q_stream_sliding",
    "q_stream_session",
    "q_stream_dedup",
    "q_stream_dedup_incremental",
    "q_stream_watermark_late",
    "q_stream_rate_source",
    "q_stream_python_source",
    # sampling / curation
    "q_sample_hash",
    "q_train_test_split",
    "q_stratified_sample",
    "q_corpus_mix",
    "q_json_variant",
    "q_interval_arith",
    "q_map_roundtrip",
    # profiling
    "q_null_profile",
    "q_summary_stats",
    "q_corr",
    "q_hist_bucket",
    "q_data_expectations",
    "q_zscore_outliers",
    "q_hll_union",
    # pipeline composites
    "q_token_shards",
    "q_decontaminate",
    "q_dedup_cross_source",
    "q_corpus_clean_e2e",
    # multimodal
    "q_multimodal_frame_sample",
    # sources / sinks
    "q_json_scan",
    "q_orc_roundtrip",
    "q_partitioned_sink",
    "q_compact_small_files",
    "q_bucketed_join",
    "q_python_datasource",
    # remaining never-checked
    "q_window_ntile",
    "q_stream_foreach_batch",
    "q_stream_stateful_counter",
    "q_stream_static_join",
    "q_stream_stream_join",
    "q_stream_transform_with_state",
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
