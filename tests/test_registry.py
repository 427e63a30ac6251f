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
    come right after; the green tail rotates with the round count."""
    from unittest import mock

    from matrix_multiplication_bigdata_ind_assignments_spark import registry

    all_names = set(entry_mod.queries())
    some = sorted(all_names)[:40]
    with mock.patch.object(registry, "_driver_checked", return_value=(set(some), 2)):
        ordered = list(registry.queries())
        n_never = len(all_names) - len(some)
        assert set(ordered[:n_never]) == all_names - set(some)
    with mock.patch.object(registry, "_driver_checked", return_value=(all_names, 3)) as _:
        r4 = list(registry.queries())[:50]
        assert [n for n in r4 if n in registry._CANARIES] == list(registry._CANARIES)
    with mock.patch.object(registry, "_driver_checked", return_value=(all_names, 4)):
        r5 = list(registry.queries())[:50]
    assert set(r4) != set(r5)  # rotation moves the green slice each round
