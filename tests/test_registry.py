"""Driver-contract sanity: registry completeness and entry smoke test."""

import __spark_entry__ as entry_mod


def test_queries_and_oracles_consistent():
    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    assert len(qs) >= 60
    assert set(oracles) <= set(qs)
    # the large majority of the surface must be oracle-checked, not rows-only
    # (rows-only is reserved for approximate/iterative/side-effect ops)
    assert len(oracles) / len(qs) > 0.8


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) == 64 * 64
    assert df.columns == ["i", "j", "v"]


def test_all_queries_runnable_and_nonempty(spark, sf_dir):
    """Every registered query must execute and return a stable schema.
    (Value correctness is the oracle checker's job — tools/oracle_check.py.)"""
    for name, fn in entry_mod.queries().items():
        df = fn(spark, sf_dir)
        assert df.columns, name
        n = df.count()
        assert n >= 0, name


def test_priority_names_all_exist():
    """Every name in the gate-ordering priority list must be a registered
    query — a typo would silently push a query to the unchecked tail."""
    from matrix_multiplication_bigdata_ind_assignments_spark import registry

    qs = set(entry_mod.queries())
    missing = [n for n in registry._PRIORITY if n not in qs]
    assert missing == [], missing
    # and the priority list itself has no duplicates
    assert len(registry._PRIORITY) == len(set(registry._PRIORITY))


def test_canary_names_all_exist():
    from matrix_multiplication_bigdata_ind_assignments_spark import registry

    qs = set(entry_mod.queries())
    assert [n for n in registry._CANARIES if n not in qs] == []
    assert len(registry._CANARIES) == len(set(registry._CANARIES))


def test_ordering_is_driver_record_driven(monkeypatch):
    """Never-driver-checked queries always precede checked ones; canaries
    come right after; the green tail is ordered least-recently-verified
    first."""
    from unittest import mock

    from matrix_multiplication_bigdata_ind_assignments_spark import registry

    all_names = set(entry_mod.queries())
    some = {n: 1 for n in sorted(all_names)[:40]}
    with mock.patch.object(registry, "_driver_checked", return_value=(some, 2, set())):
        ordered = list(registry.queries())
        n_never = len(all_names) - len(some)
        assert set(ordered[:n_never]) == all_names - set(some)
    # all green, half verified in round 1 and half in round 2: the round-1
    # (stalest) half must fill the rotating tail before any round-2 name
    names = sorted(all_names)
    last = {n: (1 if i < len(names) // 2 else 2) for i, n in enumerate(names)}
    with mock.patch.object(registry, "_driver_checked", return_value=(last, 2, set())):
        ordered = list(registry.queries())
        assert [n for n in ordered[:50] if n in registry._CANARIES] == list(registry._CANARIES)
        tail = [n for n in ordered if n not in registry._CANARIES]
        stale = {n for n, r in last.items() if r == 1 and n not in registry._CANARIES}
        assert set(tail[: len(stale)]) == stale


def test_lru_rotation_bounds_staleness():
    """Simulate successive driver rounds with a 50-query window over the
    real registry: under least-recently-verified ordering, every query is
    re-verified within ceil(n_rest / slack) rounds of its last check."""
    import math
    from unittest import mock

    from matrix_multiplication_bigdata_ind_assignments_spark import registry

    all_names = list(entry_mod.queries())
    window = 50
    canaries = [n for n in registry._CANARIES if n in all_names]
    n_rest = len(all_names) - len(canaries)
    slack = window - len(canaries)
    bound = math.ceil(n_rest / slack)
    # everyone starts verified in round 0
    last = {n: 0 for n in all_names}
    for rnd in range(1, bound + 3):
        with mock.patch.object(registry, "_driver_checked", return_value=(dict(last), rnd, set())):
            picked = list(registry.queries())[:window]
        for n in picked:
            last[n] = rnd
        staleness = [rnd - r for n, r in last.items()]
        assert max(staleness) <= bound, (rnd, max(staleness))


def test_promotion_pending_queries_jump_the_rotation():
    """A query whose latest driver row was rows-only but which HAS an
    oracle now (promoted since that row) must precede the LRV tail —
    otherwise the driver's ledger understates oracle coverage for a full
    rotation (VERDICT r5 item 6)."""
    from unittest import mock

    from matrix_multiplication_bigdata_ind_assignments_spark import registry

    all_names = list(entry_mod.queries())
    oracled = [n for n in all_names if registry.REGISTRY[n].oracle is not None]
    promoted = oracled[-2:]  # recently verified (round 2) yet rows-only
    last = {n: (2 if n in promoted else 1) for n in all_names}
    with mock.patch.object(
        registry, "_driver_checked", return_value=(last, 2, set(promoted))
    ):
        ordered = list(registry.queries())
    # despite being the FRESHEST rows, they outrank canaries and tail
    assert ordered[: len(promoted)] == sorted(
        promoted, key=lambda n: (last[n], all_names.index(n))
    )
    # a rows-only query with NO oracle does not jump (nothing to promote)
    rows_only_forever = [n for n in all_names if registry.REGISTRY[n].oracle is None][:1]
    with mock.patch.object(
        registry, "_driver_checked", return_value=(last, 2, set(rows_only_forever))
    ):
        ordered2 = list(registry.queries())
    assert ordered2[0] not in rows_only_forever
