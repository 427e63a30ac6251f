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


def test_markov_rows_normalize_to_one(spark, sf_dir):
    """Each from_type's outgoing probabilities must sum to ~1 (4-dp
    rounding slack), counts must be positive, and the pair count must
    equal the lag-pair total recomputed independently."""
    from matrix_multiplication_bigdata_ind_assignments_spark.operators.aggregates import (
        q_markov_transitions,
    )

    rows = q_markov_transitions(spark, sf_dir).collect()
    assert rows
    by_from: dict = {}
    total_pairs = 0
    for r in rows:
        assert r["n"] > 0
        by_from.setdefault(r["from_type"], []).append(r["prob"])
        total_pairs += r["n"]
    for ft, probs in by_from.items():
        assert abs(sum(probs) - 1.0) < 5e-4 * len(probs), ft
    con = duckdb.connect()
    (expect,) = con.execute(
        f"""SELECT count(*) FROM (
              SELECT lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS p
              FROM '{SF_DIR}/events.parquet') WHERE p IS NOT NULL"""
    ).fetchone()
    assert total_pairs == expect


def test_rfm_segments_cover_all_users(spark, sf_dir):
    """Segment cells must partition the user base (sum of n_users =
    distinct users) and every score must be a 1..5 quintile."""
    from matrix_multiplication_bigdata_ind_assignments_spark.operators.aggregates import (
        q_rfm_segments,
    )

    rows = q_rfm_segments(spark, sf_dir).collect()
    con = duckdb.connect()
    (n_users,) = con.execute(
        f"SELECT count(DISTINCT user_id) FROM '{SF_DIR}/events.parquet'"
    ).fetchone()
    assert sum(r["n_users"] for r in rows) == n_users
    for r in rows:
        for s in (r["r_score"], r["f_score"], r["m_score"]):
            assert 1 <= s <= 5


def test_stream_funnel_equals_batch_and_reruns(spark, sf_dir):
    """The availableNow streaming funnel must land on the identical
    3-row table as the batch operator, and calling it twice in one
    session must work (uniquely-named memory sinks)."""
    from matrix_multiplication_bigdata_ind_assignments_spark.streaming.queries import (
        q_stream_funnel,
    )

    batch = rows_set(q_funnel(spark, sf_dir))
    assert rows_set(q_stream_funnel(spark, sf_dir)) == batch
    assert rows_set(q_stream_funnel(spark, sf_dir)) == batch


def test_funnel_latency_consistent_with_funnel(spark, sf_dir):
    """n_converted must equal the funnel's purchase-stage count, and the
    latency stats must be ordered (0 < p50 <= p90, avg within range)."""
    from matrix_multiplication_bigdata_ind_assignments_spark.operators.aggregates import (
        q_funnel_latency,
    )

    (lat,) = q_funnel_latency(spark, sf_dir).collect()
    purchase = {r["stage"]: r["n_users"] for r in q_funnel(spark, sf_dir).collect()}[
        "purchase"
    ]
    assert lat["n_converted"] == purchase
    if lat["n_converted"]:
        assert 0 < lat["p50_s"] <= lat["p90_s"]
        assert 0 < lat["avg_s"]


def test_degree_powerlaw_matches_numpy(spark, sf_dir):
    """The fitted slope must agree with numpy polyfit over the same
    micro-nat histogram points (guard: the sf0.001 trade graph has 12
    distinct degrees, so the fit is live at test scale)."""
    import numpy as np

    from matrix_multiplication_bigdata_ind_assignments_spark.operators.graph import (
        q_degree_powerlaw,
    )

    (row,) = q_degree_powerlaw(spark, sf_dir).collect()
    con = duckdb.connect()
    for t in ("lineitem", "orders"):
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )
    pts = con.execute(
        """WITH e AS (SELECT DISTINCT l_suppkey*2 AS src, o_custkey*2+1 AS dst
                      FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
           deg AS (SELECT node, count(*) AS d
                   FROM (SELECT src AS node FROM e UNION ALL SELECT dst FROM e) GROUP BY node)
           SELECT d, count(*) AS cnt FROM deg GROUP BY d"""
    ).df()
    x = np.floor(np.log(pts["d"].to_numpy(dtype=float)) * 1e6 + 0.5)
    y = np.floor(np.log(pts["cnt"].to_numpy(dtype=float)) * 1e6 + 0.5)
    slope, _ = np.polyfit(x, y, 1)
    assert row["n_points"] == len(pts)
    assert abs(row["powerlaw_exponent"] - slope) < 1e-3


def test_attribution_hand_fixture(spark):
    """Hand-checkable timeline, one user:
    t=0h view, t=1h click, t=2h purchase(10)  -> first=view, last=click
    t=300h purchase(5)                        -> no touch in 7d window -> none
    t=400h click, t=400h purchase(2)          -> same-µs touch EXCLUDED
                                                 (strictly-before) -> none
    t=500h view, t=500h+1µs purchase(3)       -> 400h click is 100h
        back (inside 7d=168h) -> first=click; 500h view -> last=view."""
    import datetime as dt

    from matrix_multiplication_bigdata_ind_assignments_spark.operators import aggregates as A

    base = dt.datetime(2024, 1, 1)
    h = dt.timedelta(hours=1)
    us = dt.timedelta(microseconds=1)
    rows = [
        (1, base + 0 * h, 7, "view", 0.0, ""),
        (2, base + 1 * h, 7, "click", 0.0, ""),
        (3, base + 2 * h, 7, "purchase", 10.0, ""),
        (4, base + 300 * h, 7, "purchase", 5.0, ""),
        (5, base + 400 * h, 7, "click", 0.0, ""),
        (6, base + 400 * h, 7, "purchase", 2.0, ""),
        (7, base + 500 * h, 7, "view", 0.0, ""),
        (8, base + 500 * h + us, 7, "purchase", 3.0, ""),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    )
    import tempfile, os

    with tempfile.TemporaryDirectory() as d:
        df.coalesce(1).write.parquet(os.path.join(d, "events.parquet"))
        got = {
            (r["model"], r["channel"]): (r["purchases"], r["revenue"])
            for r in A.q_attribution(spark, d).collect()
        }
    assert got == {
        ("first_touch", "view"): (1, 10.0),
        ("first_touch", "click"): (1, 3.0),
        ("first_touch", "none"): (2, 7.0),
        ("last_touch", "click"): (1, 10.0),
        ("last_touch", "view"): (1, 3.0),
        ("last_touch", "none"): (2, 7.0),
    }


def test_copurchase_lift_symmetric_and_supported(spark, sf_dir):
    """Every recommendation row has its mirror pair's statistics
    (lift(a,b) == lift(b,a)), support floors hold, and ranks are a
    proper per-part prefix."""
    from matrix_multiplication_bigdata_ind_assignments_spark.operators.aggregates import (
        _LIFT_MIN_PAIRS,
        _LIFT_TOPK,
        q_copurchase_lift,
    )

    rows = q_copurchase_lift(spark, sf_dir).collect()
    assert rows
    lifts = {}
    for r in rows:
        assert r["n_cooccur"] >= _LIFT_MIN_PAIRS
        assert 1 <= r["rk"] <= _LIFT_TOPK
        lifts[(r["part"], r["partner"])] = r["lift_micro"]
    mirrored = 0
    for (a, b), v in lifts.items():
        if (b, a) in lifts:
            assert lifts[(b, a)] == v
            mirrored += 1
    assert mirrored > 0
    by_part: dict = {}
    for r in rows:
        by_part.setdefault(r["part"], []).append(r["rk"])
    for ranks in by_part.values():
        assert sorted(ranks) == list(range(1, len(ranks) + 1))


def test_revenue_share_sums_to_one_per_region(spark, sf_dir):
    from matrix_multiplication_bigdata_ind_assignments_spark.operators.aggregates import (
        q_revenue_share,
    )

    rows = q_revenue_share(spark, sf_dir).collect()
    assert rows
    by_region: dict = {}
    for r in rows:
        assert 0.0 <= r["share"] <= 1.0 and r["revenue"] > 0
        by_region.setdefault(r["region"], []).append(r["share"])
    for reg, shares in by_region.items():
        assert abs(sum(shares) - 1.0) < 1e-4, reg


def test_ab_test_bruteforce_and_degenerate_guard(spark, sf_dir):
    """z must match a scipy-free recompute; an all-convert fixture
    yields NULL z (pooled-variance guard)."""
    import datetime as dt
    import math
    import os
    import tempfile

    from matrix_multiplication_bigdata_ind_assignments_spark.operators.aggregates import (
        _AB_CONV_MIN,
        q_ab_test,
    )
    from matrix_multiplication_bigdata_ind_assignments_spark.sources import load

    ev = load(spark, sf_dir, "events").select("user_id", "event_type").collect()
    per_user: dict = {}
    for r in ev:
        per_user.setdefault(r["user_id"], [0, 0])
        if r["event_type"] == "purchase":
            per_user[r["user_id"]][0] += 1
    arms = {0: [0, 0], 1: [0, 0]}
    for u, (p, _) in per_user.items():
        arms[u % 2][0] += 1
        arms[u % 2][1] += int(p >= _AB_CONV_MIN)
    (na, ca), (nb, cb) = arms[0], arms[1]
    r = q_ab_test(spark, sf_dir).collect()[0]
    assert (r["n_a"], r["conv_a"], r["n_b"], r["conv_b"]) == (na, ca, nb, cb)
    pool = (ca + cb) / (na + nb)
    z = (ca / na - cb / nb) / math.sqrt(pool * (1 - pool) * (1 / na + 1 / nb))
    assert r["z_score"] == math.floor(z * 1e4 + 0.5) / 1e4
    assert r["significant"] == (abs(r["z_score"]) > 1.96)

    base = dt.datetime(2024, 1, 1)
    rows = []
    eid = 0
    for u in range(10):
        for j in range(_AB_CONV_MIN):
            rows.append((eid, base, u, "purchase", 0.0, ""))
            eid += 1
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    )
    with tempfile.TemporaryDirectory() as d:
        df.coalesce(1).write.parquet(os.path.join(d, "events.parquet"))
        r = q_ab_test(spark, d).collect()[0]
    assert r["z_score"] is None and r["conv_a"] == r["n_a"]


def test_priority_exists_each_order_counted_once(spark, sf_dir):
    """An order with many late lineitems counts once; totals match a
    brute-force recompute."""
    import datetime as dt

    from matrix_multiplication_bigdata_ind_assignments_spark.operators.relational import (
        _Q4_LATE_DAYS,
        q_priority_exists,
    )
    from matrix_multiplication_bigdata_ind_assignments_spark.sources import load

    orders = {
        r["o_orderkey"]: (r["o_orderpriority"], r["o_orderdate"])
        for r in load(spark, sf_dir, "orders").collect()
    }
    late = set()
    for r in load(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate").collect():
        pr, od = orders[r["l_orderkey"]]
        if r["l_shipdate"] > od + dt.timedelta(days=_Q4_LATE_DAYS):
            late.add(r["l_orderkey"])
    expect: dict = {}
    for ok in late:
        expect[orders[ok][0]] = expect.get(orders[ok][0], 0) + 1
    got = {r["o_orderpriority"]: r["n_late_orders"] for r in q_priority_exists(spark, sf_dir).collect()}
    assert got == expect


def test_cohort_value_cumulative_is_prefix_sum(spark, sf_dir):
    """cum_value must be the running total of week_value per cohort and
    the total across cohorts must foot to the fixed-point event sum."""
    import math

    from matrix_multiplication_bigdata_ind_assignments_spark.operators.aggregates import (
        q_cohort_value,
    )
    from matrix_multiplication_bigdata_ind_assignments_spark.sources import load

    rows = sorted(
        q_cohort_value(spark, sf_dir).collect(),
        key=lambda r: (r["cohort_week"], r["week_offset"]),
    )
    assert rows
    run: dict = {}
    for r in rows:
        run[r["cohort_week"]] = run.get(r["cohort_week"], 0.0) + r["week_value"]
        assert abs(run[r["cohort_week"]] - r["cum_value"]) < 1e-6
    total_u = sum(
        math.floor(x["value"] * 1e6 + 0.5)
        for x in load(spark, sf_dir, "events").select("value").collect()
    )
    assert abs(sum(r["week_value"] for r in rows) - total_u / 1e6) < 1e-4


def test_pareto_abc_bruteforce(spark, sf_dir):
    import math

    from matrix_multiplication_bigdata_ind_assignments_spark.operators.aggregates import (
        _ABC_A,
        _ABC_B,
        q_pareto_abc,
    )
    from matrix_multiplication_bigdata_ind_assignments_spark.sources import load

    rev: dict = {}
    for r in load(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_extendedprice", "l_discount"
    ).collect():
        u = math.floor(r["l_extendedprice"] * (1 - r["l_discount"]) * 1e6 + 0.5)
        rev[r["l_partkey"]] = rev.get(r["l_partkey"], 0) + u
    ranked = sorted(rev.items(), key=lambda kv: (-kv[1], kv[0]))
    tot = sum(rev.values())
    expect: dict = {}
    cum = 0
    for _, u in ranked:
        cum += u
        cls = "A" if 100 * cum <= _ABC_A * tot else ("B" if 100 * cum <= _ABC_B * tot else "C")
        n, s = expect.get(cls, (0, 0))
        expect[cls] = (n + 1, s + u)
    got = {r["abc"]: r for r in q_pareto_abc(spark, sf_dir).collect()}
    assert set(got) == set(expect)
    for cls, (n, s) in expect.items():
        assert got[cls]["n_parts"] == n
        assert abs(got[cls]["revenue"] - s / 1e6) < 1e-4
    assert abs(sum(r["share"] for r in got.values()) - 1.0) < 1e-4


def test_rolling_active_users_bruteforce(spark, sf_dir):
    import datetime as dt

    from matrix_multiplication_bigdata_ind_assignments_spark.operators.aggregates import (
        _RAU_WINDOW,
        q_rolling_active_users,
    )
    from matrix_multiplication_bigdata_ind_assignments_spark.sources import load

    ud = set()
    for r in load(spark, sf_dir, "events").select("user_id", "ts").collect():
        ud.add((r["user_id"], int(r["ts"].replace(tzinfo=dt.timezone.utc).timestamp()) // 86400))
    days = [d for _, d in ud]
    lo, hi = min(days), max(days)
    expect = {}
    for d in range(lo, hi + 1):
        expect[d] = len({u for u, day in ud if d - _RAU_WINDOW + 1 <= day <= d})
    got = {r["day"]: r["active_users_7d"] for r in q_rolling_active_users(spark, sf_dir).collect()}
    assert got == expect


def test_ship_latency_percentiles_ordered(spark, sf_dir):
    from matrix_multiplication_bigdata_ind_assignments_spark.operators.aggregates import (
        q_ship_latency,
    )

    rows = q_ship_latency(spark, sf_dir).collect()
    assert len(rows) == 5
    for r in rows:
        assert r["p0"] <= r["p50"] <= r["p90"] <= r["p99"] <= r["p100"]
        # synthetic fixture: shipdate is not causally after orderdate,
        # so negative deltas are legitimate — only the ordering and
        # counts are invariant
        assert r["n"] > 0


def test_week_over_week_growth_recompute(spark, sf_dir):
    import datetime as dt
    import math

    from matrix_multiplication_bigdata_ind_assignments_spark.operators.aggregates import (
        q_week_over_week,
    )
    from matrix_multiplication_bigdata_ind_assignments_spark.sources import load

    weeks: dict = {}
    for r in load(spark, sf_dir, "events").select("ts", "value").collect():
        day = int(r["ts"].replace(tzinfo=dt.timezone.utc).timestamp())
        wk = (int(day // 86400 * 86400) - 1704067200) // 604800
        # recompute with the module's exact bucketing: floor by day first
        wk = math.floor(((day // 86400) * 86400 - 1704067200) / 604800)
        weeks.setdefault(wk, [0, 0])
        weeks[wk][0] += math.floor(r["value"] * 1e6 + 0.5)
        weeks[wk][1] += 1
    got = {r["week"]: r for r in q_week_over_week(spark, sf_dir).collect()}
    assert set(got) == set(weeks)
    prev = None
    for wk in sorted(weeks):
        u, n = weeks[wk]
        r = got[wk]
        assert r["n_events"] == n and abs(r["week_value"] - u / 1e6) < 1e-6
        if prev is None or prev <= 0:
            assert r["wow_growth"] is None
        else:
            assert r["wow_growth"] == math.floor((u - prev) / prev * 1e6 + 0.5) / 1e6
        prev = u


def test_engagement_hist_foots_to_users(spark, sf_dir):
    from matrix_multiplication_bigdata_ind_assignments_spark.operators.aggregates import (
        q_engagement_hist,
    )
    from matrix_multiplication_bigdata_ind_assignments_spark.sources import load

    rows = q_engagement_hist(spark, sf_dir).collect()
    n_users = load(spark, sf_dir, "events").select("user_id").distinct().count()
    assert sum(r["n_users"] for r in rows) == n_users
    assert all(r["active_days"] >= 1 for r in rows)
