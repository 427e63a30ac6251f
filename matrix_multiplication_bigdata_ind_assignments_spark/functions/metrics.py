"""Execution-metric capture: per-window shuffle read/write bytes and
spill, from Spark's AppStatusStore (VERDICT r6 item 1).

Why: at local[32] wall time cannot distinguish a plan regression from
box noise (r6 measured ±30% swings on UNCHANGED code), but shuffle
bytes are a property of the physical plan + data — deterministic across
runs — and they are exactly the quantity that decides whether a plan
survives a 100× scale-up.  bench.py records them per query; tests
assert byte envelopes on the plan-guarded queries.

The AppStatusStore is the store behind the UI/REST API but is populated
even with ``spark.ui.enabled=false``, so the same helper serves bench
(UI on) and tests (UI off).  Access is via py4j — ``statusStore()`` is
``private[spark]`` in Scala, which is public in bytecode; the Scala
default arguments of ``stageList`` are materialized through their
compiler-generated ``stageList$default$N`` accessors.

Caveat: the store evicts old stages beyond ``spark.ui.retainedStages``
(default 1000).  Deltas are computed from cumulative totals, so a
measurement window must not span an eviction of stages *inside* the
window — bench raises retainedStages; test windows are a handful of
stages.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

_FIELDS = {
    "shuffle_read_bytes": "shuffleReadBytes",
    "shuffle_write_bytes": "shuffleWriteBytes",
    "spill_memory_bytes": "memoryBytesSpilled",
    "spill_disk_bytes": "diskBytesSpilled",
}


def shuffle_snapshot(spark: SparkSession) -> dict[str, int]:
    """Cumulative shuffle/spill byte totals over all stages the
    AppStatusStore currently retains.  Subtract two snapshots
    (``shuffle_delta``) to charge the stages run in between.

    Two access paths over the same store: when the UI is up (bench), ONE
    REST call returns every stage as JSON — constant py4j traffic no
    matter how many stages have accumulated; with the UI off (tests),
    fall back to iterating the store through py4j, which costs ~4 round
    trips per stage and is only acceptable for small stage counts."""
    base = spark.sparkContext.uiWebUrl
    if base:
        try:
            import json
            import urllib.request

            app = spark.sparkContext.applicationId
            with urllib.request.urlopen(f"{base}/api/v1/applications/{app}/stages", timeout=10) as r:
                stages = json.load(r)
            return {
                k: sum(int(s.get(meth, 0)) for s in stages) for k, meth in _FIELDS.items()
            }
        except Exception:
            pass  # UI race/shutdown → the store path below still works
    ss = spark.sparkContext._jsc.sc().statusStore()
    defaults = [getattr(ss, f"stageList$default${i}")() for i in range(2, 6)]
    stages = ss.stageList(None, *defaults)
    tot = dict.fromkeys(_FIELDS, 0)
    it = stages.iterator()
    while it.hasNext():
        s = it.next()
        for k, meth in _FIELDS.items():
            tot[k] += getattr(s, meth)()
    return tot


def shuffle_delta(before: dict[str, int], after: dict[str, int]) -> dict[str, int]:
    """Byte deltas between two snapshots (clamped at 0: an eviction of
    pre-window stages can only LOWER the cumulative totals)."""
    return {k: max(0, after[k] - before[k]) for k in _FIELDS}


def settled_snapshot(spark: SparkSession) -> dict[str, int]:
    """``shuffle_snapshot`` polled until two consecutive reads agree: the
    AppStatusListener consumes events on an async bus that can lag an
    action's return by a beat, so an un-settled read both undercounts
    work that just finished AND leaks it into the NEXT window's delta.
    Use this on BOTH edges of a measurement window (bench.py does)."""
    import time

    snap = shuffle_snapshot(spark)
    for _ in range(20):
        time.sleep(0.1)
        nxt = shuffle_snapshot(spark)
        if nxt == snap:
            break
        snap = nxt
    return snap


def measure_shuffle(spark: SparkSession, thunk) -> dict[str, int]:
    """Run ``thunk()`` and return the shuffle/spill bytes its jobs moved
    (both window edges settled — see settled_snapshot)."""
    before = settled_snapshot(spark)
    thunk()
    return shuffle_delta(before, settled_snapshot(spark))
