"""Funnel + cohort-retention invariants: the temporal ordering that
defines a funnel (each stage strictly after the user's entry into the
previous one), cohort-matrix structure (offset-0 cell = the cohort
itself), and partition invariance of both."""

import duckdb

from matrix_multiplication_bigdata_ind_assignments_spark.operators.aggregates import (
    q_cohort_retention,
    q_funnel,
)

from conftest import SF_DIR, rows_set


def test_funnel_is_monotone_and_temporal(spark, sf_dir):
    rows = {r["stage"]: r for r in q_funnel(spark, sf_dir).collect()}
    assert set(rows) == {"view", "click", "purchase"}
    n1, n2, n3 = (rows[s]["n_users"] for s in ("view", "click", "purchase"))
    assert n1 >= n2 >= n3 >= 0
    assert rows["view"]["conv_vs_first"] == 1.0
    # independent recomputation: the temporal chain, row-at-a-time
    con = duckdb.connect()
    ev = con.execute(
        f"SELECT user_id, event_type, ts FROM '{SF_DIR}/events.parquet' ORDER BY user_id, ts"
    ).fetchall()
    by_user: dict = {}
    for uid, et, ts in ev:
        by_user.setdefault(uid, []).append((ts, et))
    c1 = c2 = c3 = 0
    for evs in by_user.values():
        t1 = min((t for t, e in evs if e == "view"), default=None)
        if t1 is None:
            continue
        c1 += 1
        t2 = min((t for t, e in evs if e == "click" and t > t1), default=None)
        if t2 is None:
            continue
        c2 += 1
        if any(e == "purchase" and t > t2 for t, e in evs):
            c3 += 1
    assert (n1, n2, n3) == (c1, c2, c3)


def test_cohort_offset_zero_is_full_cohort(spark, sf_dir):
    """A user's first event lands in their own cohort week, so the
    offset-0 cell must contain the whole cohort (retention 1.0), every
    offset must be non-negative, and no cell may exceed its cohort."""
    rows = q_cohort_retention(spark, sf_dir).collect()
    assert rows
    by_cohort: dict = {}
    for r in rows:
        assert r["week_offset"] >= 0
        assert 0 < r["n_users"]
        assert r["retention"] is not None and r["retention"] <= 1.0
        by_cohort.setdefault(r["cohort_week"], {})[r["week_offset"]] = r
    for cw, cells in by_cohort.items():
        assert 0 in cells, f"cohort {cw} missing its offset-0 cell"
        assert cells[0]["retention"] == 1.0


def test_event_analytics_partition_invariant(spark, sf_dir):
    f_base = rows_set(q_funnel(spark, sf_dir))
    c_base = rows_set(q_cohort_retention(spark, sf_dir))
    old = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "7")
        assert rows_set(q_funnel(spark, sf_dir)) == f_base
        assert rows_set(q_cohort_retention(spark, sf_dir)) == c_base
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)
