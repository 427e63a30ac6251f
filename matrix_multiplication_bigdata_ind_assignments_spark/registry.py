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


#: An oracle is ANSI SQL for DuckDB — either a literal string, or a
#: callable ``(sf_dir) -> str`` for queries whose oracle embeds DATA
#: derived from the corpus (e.g. q_bpe_encode unrolls the learned merge
#: rules into a replace() chain; the rules depend on which fixture is
#: being checked).  None => rows-only check.
OracleSpec = "str | Callable[[str], str] | None"


@dataclass(frozen=True)
class Query:
    name: str
    fn: QueryFn
    oracle: Optional[object]  # see OracleSpec
    doc: str = ""
    #: Optional semantic invariant over the COLLECTED Spark result,
    #: ``(rows: list[tuple], cols: list[str]) -> str | None`` returning
    #: an error message on violation; a 3-arg form
    #: ``(rows, cols, sf_dir)`` additionally receives the fixture dir
    #: (the unroll-stability certificates use it to re-run the query's
    #: own oracle with one extra round).  Runs in the oracle sweep at the
    #: gate SFs — for fixed-unroll iterative queries whose Spark result
    #: and identically-unrolled oracle could be wrong TOGETHER if the
    #: unroll stopped short of fixpoint (ADVICE r9 on q_kcore: a
    #: regenerated fixture needing >6 peel rounds would hash green with
    #: vertices below the core bound).  The invariant is the
    #: engine-independent certificate the hash compare can't provide.
    post_check: Optional[Callable[[list, list], Optional[str]]] = None


REGISTRY: dict[str, Query] = {}

# The real driver runs its oracle comparison at sf=0.01; callable oracles
# resolve against this fixture when no explicit sf_dir is given.
DRIVER_ORACLE_SF = "/root/testdata/sf0.01"


def register(name: str, oracle=None, post_check=None) -> Callable[[QueryFn], QueryFn]:
    """Decorator: register ``fn`` as query ``name`` with optional oracle SQL
    and optional post_check invariant (see Query.post_check)."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        REGISTRY[name] = Query(
            name=name, fn=fn, oracle=oracle, doc=fn.__doc__ or "", post_check=post_check
        )
        return fn

    return deco


# Driver-facing ordering preferences.  The correctness gate walks queries
# in dict order under a budget (~50 queries/round), so order IS the
# verification priority — but the ORDER ITSELF is computed data-driven in
# _ordered() from the driver's own CORRECTNESS_r*.json records: queries
# with no driver row yet always go first (a new op earns its row the next
# round with no manual rotation), then the _CANARIES below as every-round
# regression cover, then the remaining greens least-recently-verified
# first.  _PRIORITY holds only the preferred ordering for still-unchecked
# names — dormant once every query has a green row (as of r5), but a
# query whose latest row errors re-enters this front, in this order.
_PRIORITY: tuple[str, ...] = (
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
)

# Plan-sensitive greens re-verified EVERY round (placed right after any
# still-unchecked names): one per major physical-plan family, so a plan
# regression can't rot silently while the window chases new rows.
# Ordered by irreplaceability — when unchecked names crowd the ~50-query
# window, canaries are cut from the TAIL, so the single representative of
# each family (streaming, windows+prefix-sum, dedup, similarity, matmul,
# joins) sits before same-family spares.
_CANARIES: tuple[str, ...] = (
    "q_matmul_dense",
    "q_range_join",
    "q_dedup_minhash",
    "q_stream_tumbling",
    "q_sequence_pack",
    "q_knn_graph",
    "q_matmul_blocked",
    "q_asof_join",
    "q_dedup_embedding",
    "q_stream_session",
    "q_cosine_topk",
    "q_scd2_intervals",
    "q_dedup_exact",
    "q_matmul_sparse",
    "q_tfidf",
    # r7 additions: the LSH-family candidate generators whose over-cap
    # policies changed (drop-hot-correct / cap exemption), the fuzzy
    # word-index cap, and the rewritten PageRank loop — all
    # plan-sensitive shapes worth every-round regression cover
    "q_dedup_ngram_jaccard",
    "q_dedup_simhash_pairs",
    "q_fuzzy_match",
    "q_pagerank",
    # r10: the frontier-relaxation family (BFS/widest-path share the
    # delta-propagation plan shape; one canary covers it)
    "q_bfs_hops",
)


def _driver_checked() -> tuple[dict[str, int], int, set]:
    """({name -> round index of its latest successful driver row},
    number of past rounds, {names whose latest row was a rows-only
    check}) from the CORRECTNESS_r*.json files the driver leaves in the
    repo root.  A row only counts as "checked" when the run actually verified
    the query: err is null (or the declared ``no_oracle`` rows-only mode) and
    no match flag is False.  A query whose most recent row errored or
    mismatched re-enters the never-checked front of the gate ordering so it
    is re-verified next round instead of rotating with the green tail.
    Malformed (non-dict) rows are recorded as errored for the same reason —
    they carry no evidence of verification."""
    import glob
    import json
    import os

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    latest: dict[str, tuple[int, dict]] = {}
    rounds = 0
    for p in sorted(glob.glob(os.path.join(root, "CORRECTNESS_r*.json"))):
        rounds += 1
        try:
            with open(p) as f:
                for name, row in json.load(f).items():
                    latest[name] = (rounds, row if isinstance(row, dict) else {"err": "malformed"})
        except (OSError, ValueError):  # pragma: no cover - corrupt/absent file
            pass
    checked = {
        n: rnd
        for n, (rnd, row) in latest.items()
        if row.get("err") in (None, "no_oracle")
        and row.get("rows_match") is not False
        and row.get("schema_match") is not False
        and row.get("hash_match") is not False
    }
    rows_only = {n for n, (_, row) in latest.items() if row.get("err") == "no_oracle"}
    return checked, rounds, rows_only


def _ordered() -> list[Query]:
    """Gate-facing order, DATA-DRIVEN from the driver's own correctness
    records: (1) queries with no driver row yet — every query earns a row
    before any green is re-verified — ordered by _PRIORITY preference then
    registration; (2) PROMOTION-PENDING queries: latest driver row was a
    rows-only check but the query HAS an oracle now (it was promoted
    after that row was recorded) — LRV alone would leave the driver's
    ledger understating oracle coverage for a full rotation (VERDICT r5
    item 6); (3) the _CANARIES (plan-sensitive greens that
    must stay under regression watch every round); (4) all remaining
    greens, least-recently-verified first (by the round of each name's
    latest successful driver row, tie-broken by registration order), so
    with a ~50-query window every green is re-verified within a provable
    bound — no fixed-stride variance."""
    _load_all()
    checked, rounds, rows_only = _driver_checked()
    names = list(REGISTRY)
    pref = {n: i for i, n in enumerate(_PRIORITY)}
    never = sorted(
        (n for n in names if n not in checked), key=lambda n: (pref.get(n, len(pref)), names.index(n))
    )
    # a callable oracle whose builder cannot resolve (fixture dir absent
    # in this environment) would look "promotable" every round and
    # permanently occupy the window head — only count it when its
    # prerequisite exists (r6 review finding)
    import os

    fixture_ok = os.path.isdir(DRIVER_ORACLE_SF)
    promotable = sorted(
        (
            n
            for n in names
            if n in checked
            and n in rows_only
            and REGISTRY[n].oracle is not None
            and (not callable(REGISTRY[n].oracle) or fixture_ok)
        ),
        key=lambda n: (checked[n], names.index(n)),
    )
    canaries = [
        n for n in _CANARIES if n in REGISTRY and n in checked and n not in set(promotable)
    ]
    del rounds  # ordering now depends on per-name last-green rounds only
    front = set(promotable) | set(canaries)
    rest = sorted(
        (n for n in names if n in checked and n not in front),
        key=lambda n: (checked[n], names.index(n)),
    )
    return [REGISTRY[n] for n in never + promotable + canaries + rest]


def queries() -> dict[str, QueryFn]:
    return {q.name: q.fn for q in _ordered()}


def oracles(sf_dir: str = DRIVER_ORACLE_SF) -> dict[str, str]:
    """Resolved oracle SQL per query.  Callable oracles are rendered for
    ``sf_dir`` (the driver's fixed sf0.01 by default; tools/oracle_check.py
    passes the fixture it is actually checking)."""
    import os
    import sys

    if not os.path.isdir(sf_dir):
        # data-dependent callable oracles (q_bpe_*) resolve against this
        # fixture; a missing path would silently degrade them ALL to
        # rows-only (ADVICE r5) — say so once, loudly
        print(
            f"WARNING: oracle fixture dir {sf_dir!r} does not exist; "
            "callable oracle builders will degrade to rows-only checks",
            file=sys.stderr,
        )
    out: dict[str, str] = {}
    for q in _ordered():
        if q.oracle is None:
            continue
        if callable(q.oracle):
            # a failing oracle BUILDER (e.g. the fixture parquet is absent in
            # this environment) degrades that one query to a rows-only check
            # instead of killing the whole oracle_sql() contract call — but
            # never silently (ADVICE r5: a regression in a builder would
            # otherwise quietly remove verification coverage)
            try:
                out[q.name] = q.oracle(sf_dir)
            except Exception as exc:
                print(
                    f"WARNING: oracle builder for {q.name} failed "
                    f"({type(exc).__name__}: {exc}); degrading to rows-only",
                    file=sys.stderr,
                )
                continue
        else:
            out[q.name] = q.oracle
    return out


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
        setsim,
        dedup,
        graph,
        ppr,
        hits,
        closeness,
        heavyhitters,
        clustering,
        similarity,
        fusion,
        text,
        ngram_lm,
        tokenizer,
        multimodal,
        bench_results,
        sampling,
        profiling,
        pipeline,
        regression,
        evaluation,
    )
    from .streaming import queries as streaming_queries  # noqa: F401

    _LOADED = True
