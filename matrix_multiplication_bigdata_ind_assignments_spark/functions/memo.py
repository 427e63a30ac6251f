"""Shared per-plan statistics memo.

Planner stats (operand nnz/extent, skew shares, LSH probe rows, hot-
bucket verdicts) are pure functions of an IMMUTABLE input plan, so each
is computed with one job on first sight and memoized thereafter.  This
module holds the one implementation of the memo discipline the engine
uses everywhere (previously four hand-rolled copies — r6 review
finding):

- keyed on Catalyst's ``semanticHash`` (same key ⇔ same optimized plan
  modulo cosmetic ids) XORed with a caller-supplied extra key;
- a hit is CONFIRMED with ``sameSemantics`` against the stored frames —
  semanticHash is 32-bit and a silent collision would hand a planner
  the wrong stats;
- each hash key holds a small LIST of entries so two colliding plans
  coexist instead of alternately evicting each other;
- ``sameSemantics`` is guarded: a frame from a stopped/replaced
  SparkSession can raise instead of simply missing, in which case the
  stat is recomputed;
- the store is bounded (cleared wholesale past ``max_entries``) so
  distinct plans can't grow it without limit.

CAVEAT (inherited by every caller): the memo assumes a plan's
underlying data is immutable for the session — true for the parquet
fixtures.  A caller whose source gains files under an identical plan
must ``store.clear()`` before re-planning.
"""

from __future__ import annotations

from typing import Callable, TypeVar

from pyspark.sql import DataFrame

T = TypeVar("T")


def plan_memo(
    store: dict,
    frame: DataFrame,
    extra_key,
    compute: Callable[[], T],
    max_entries: int = 256,
) -> T:
    """Return the memoized value for (frame's logical plan, extra_key),
    running ``compute`` (typically one Spark stat job) on first sight."""
    key = frame.semanticHash() ^ hash(extra_key)
    bucket = store.get(key, [])
    for f, ek, val in bucket:
        try:
            if ek == extra_key and frame.sameSemantics(f):
                return val
        except Exception:  # stale frame from a stopped session — recompute
            continue
    val = compute()
    if sum(len(b) for b in store.values()) >= max_entries:
        store.clear()
        bucket = []
    store[key] = (bucket + [(frame, extra_key, val)])[-4:]
    return val
