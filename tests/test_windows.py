"""Semantic invariants for the window-function queries."""

from pyspark.sql import functions as F

from matrix_multiplication_bigdata_ind_assignments_spark.operators import windows as W
from matrix_multiplication_bigdata_ind_assignments_spark.sources import load


def test_sessionize_partitions_all_events(spark, sf_dir):
    """Sessions tile the event stream: per-user session sizes sum to the
    user's event count, and no session spans a >30-minute internal gap
    start-to-start (start==end for singletons)."""
    sess = W.q_sessionize_batch(spark, sf_dir).cache()
    e = load(spark, sf_dir, "events").where(F.col("user_id").isNotNull())
    per_user = dict(
        sess.groupBy("user_id").agg(F.sum("n_events").alias("n")).collect()
    )
    truth = dict(e.groupBy("user_id").count().collect())
    assert per_user == truth
    bad = sess.where(F.col("session_end") < F.col("session_start")).count()
    assert bad == 0


def test_sessions_separated_by_gap(spark, sf_dir):
    """Consecutive sessions of one user are separated by >30 minutes."""
    sess = W.q_sessionize_batch(spark, sf_dir)
    from pyspark.sql.window import Window

    w = Window.partitionBy("user_id").orderBy("session_id")
    gaps = sess.select(
        "user_id",
        (F.col("session_start") - F.lag("session_end").over(w)).alias("gap"),
    ).where(F.col("gap").isNotNull())
    assert gaps.where(F.col("gap") <= 1800).count() == 0


def test_range_frame_counts_at_least_self(spark, sf_dir):
    df = W.q_window_range_frame(spark, sf_dir)
    assert df.where(F.col("n_last_hour") < 1).count() == 0


def test_nth_value_null_for_singleton_users(spark, sf_dir):
    """nth_value(2) must be NULL exactly for users with one event."""
    df = W.q_nth_value(spark, sf_dir)
    singles = df.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("second_v").isNull().cast("int")).alias("nulls"),
    )
    assert singles.where((F.col("n") == 1) & (F.col("nulls") != 1)).count() == 0
    assert singles.where((F.col("n") > 1) & (F.col("nulls") != 0)).count() == 0


def test_skyline_is_exactly_the_nondominated_set(spark, sf_dir):
    """Brute-force dominance check: the skyline equals the set of parts
    no other part strictly beats on (price lower-or-equal, size
    higher-or-equal, at least one strict)."""
    from matrix_multiplication_bigdata_ind_assignments_spark.operators.windows import q_skyline_2d
    from matrix_multiplication_bigdata_ind_assignments_spark.sources import load

    got = {r["p_partkey"] for r in q_skyline_2d(spark, sf_dir).collect()}
    parts = [
        (r["p_partkey"], r["p_retailprice"], r["p_size"])
        for r in load(spark, sf_dir, "part").collect()
    ]
    expected = set()
    for k, pr, sz in parts:
        dominated = any(
            (pr2 <= pr and sz2 >= sz and (pr2 < pr or sz2 > sz))
            for k2, pr2, sz2 in parts
            if k2 != k
        )
        if not dominated:
            expected.add(k)
    assert got == expected


def test_twap_holds_value_over_interval(spark):
    """Hand timeline: value 10 held for 9 time units, then 100 held for
    1 unit -> TWAP = (10*9 + 100*1)/10 = 19; the final observation
    carries no weight."""
    import datetime as dt
    import os
    import tempfile

    from matrix_multiplication_bigdata_ind_assignments_spark.operators.windows import q_time_weighted_avg

    base = dt.datetime(2024, 1, 1)
    s_ = dt.timedelta(seconds=1)
    rows = [
        (1, base + 0 * s_, 7, "a", 10.0, ""),
        (2, base + 9 * s_, 7, "a", 100.0, ""),
        (3, base + 10 * s_, 7, "a", 55555.0, ""),  # last obs: weightless
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    )
    with tempfile.TemporaryDirectory() as d:
        df.coalesce(1).write.parquet(os.path.join(d, "events.parquet"))
        (r,) = q_time_weighted_avg(spark, d).collect()
    assert r["span_us"] == 10_000_000
    assert abs(r["twap"] - 19.0) < 1e-9


def test_peak_concurrency_bruteforce(spark, sf_dir):
    """The sweep must equal a brute-force max over boundary points."""
    from matrix_multiplication_bigdata_ind_assignments_spark.operators.windows import q_peak_concurrency
    from matrix_multiplication_bigdata_ind_assignments_spark.sources import load

    (r,) = q_peak_concurrency(spark, sf_dir).collect()
    evs = [
        int(row["ts"].timestamp() * 1_000_000)
        for row in load(spark, sf_dir, "events").select("ts").collect()
    ]
    deltas: dict = {}
    for us in evs:
        deltas[us] = deltas.get(us, 0) + 1
        e = us + 1_800_000_000
        deltas[e] = deltas.get(e, 0) - 1
    live = peak = 0
    peak_at = None
    for us in sorted(deltas):
        live += deltas[us]
        if live > peak:
            peak, peak_at = live, us
    assert r["peak_concurrent"] == peak
    assert r["peak_at_us"] == peak_at


def test_burst_intervals_injected_burst(spark):
    """Constant 1/hour background with a 3-hour 100/hour burst -> one
    island covering exactly the burst hours, carrying its event mass."""
    import datetime as dt
    import os
    import tempfile

    from matrix_multiplication_bigdata_ind_assignments_spark.operators.windows import q_burst_intervals

    base = dt.datetime(2024, 3, 1)
    rows, eid = [], 0
    for h in range(100):
        per = 100 if 40 <= h < 43 else 1
        for j in range(per):
            rows.append((eid, base + dt.timedelta(hours=h, seconds=j), j % 7, "a", 0.0, ""))
            eid += 1
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    )
    with tempfile.TemporaryDirectory() as d:
        df.coalesce(1).write.parquet(os.path.join(d, "events.parquet"))
        got = q_burst_intervals(spark, d).collect()
    assert len(got) == 1
    r = got[0]
    h0 = int(base.replace(tzinfo=dt.timezone.utc).timestamp()) // 3600
    assert (r["start_h"], r["end_h"], r["n_hours"]) == (h0 + 40, h0 + 43, 3)
    assert r["n_events"] == 300 and r["n_users"] == 7


def test_burst_intervals_disjoint_and_footed(spark, sf_dir):
    """Fixture intervals per type are disjoint, hours foot, and each
    interval's event count matches a direct recount."""
    from matrix_multiplication_bigdata_ind_assignments_spark.operators.windows import q_burst_intervals
    from matrix_multiplication_bigdata_ind_assignments_spark.sources import load
    from pyspark.sql import functions as F

    rows = q_burst_intervals(spark, sf_dir).collect()
    assert rows
    by_type: dict = {}
    for r in rows:
        assert r["end_h"] - r["start_h"] == r["n_hours"] > 0
        by_type.setdefault(r["event_type"], []).append((r["start_h"], r["end_h"]))
    for ivs in by_type.values():
        ivs.sort()
        for (s1, e1), (s2, e2) in zip(ivs, ivs[1:]):
            assert e1 < s2  # maximal islands leave a gap between intervals
    ev = load(spark, sf_dir, "events").select(
        "event_type", F.floor(F.unix_timestamp("ts") / 3600).cast("long").alias("h")
    ).collect()
    for r in rows[:5]:
        n = sum(
            1 for x in ev
            if x["event_type"] == r["event_type"] and r["start_h"] <= x["h"] < r["end_h"]
        )
        assert n == r["n_events"]


def test_ewma_hand_series_and_renormalization(spark):
    """Known series: newest-first weights 64,32,16,... over µunit
    values; a 3-event user renormalizes by 64+32+16=112."""
    import datetime as dt
    import math
    import os
    import tempfile

    from matrix_multiplication_bigdata_ind_assignments_spark.operators.windows import q_ewma

    base = dt.datetime(2024, 1, 1)
    rows = []
    # user 1: ten events valued 1..10 (10 newest)
    for i in range(10):
        rows.append((i, base + dt.timedelta(minutes=i), 1, "a", float(i + 1), ""))
    # user 2: three events 5, 7, 9 (9 newest)
    for j, v in enumerate((5.0, 7.0, 9.0)):
        rows.append((100 + j, base + dt.timedelta(minutes=j), 2, "a", v, ""))
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    )
    with tempfile.TemporaryDirectory() as d:
        df.coalesce(1).write.parquet(os.path.join(d, "events.parquet"))
        got = {r["user_id"]: r for r in q_ewma(spark, d).collect()}
    w = (64, 32, 16, 8, 4, 2, 1, 1)
    u1_vals = [10, 9, 8, 7, 6, 5, 4, 3]  # newest first, window of 8
    exp1 = sum(wi * v * 10**6 for wi, v in zip(w, u1_vals)) / 128 / 1e6
    assert got[1]["ewma"] == math.floor(exp1 * 1e6 + 0.5) / 1e6
    assert got[1]["n_events"] == 10
    exp2 = (64 * 9 + 32 * 7 + 16 * 5) * 10**6 / (64 + 32 + 16) / 1e6
    assert got[2]["ewma"] == math.floor(exp2 * 1e6 + 0.5) / 1e6
    assert got[2]["n_events"] == 3


def test_ohlc_bruteforce(spark, sf_dir):
    from matrix_multiplication_bigdata_ind_assignments_spark.operators.windows import q_ohlc_bars
    from matrix_multiplication_bigdata_ind_assignments_spark.sources import load

    import datetime as dt

    ev = load(spark, sf_dir, "events").select("event_type", "ts", "event_id", "value").collect()
    bars: dict = {}
    for r in ev:
        h = int(r["ts"].replace(tzinfo=dt.timezone.utc).timestamp()) // 3600
        bars.setdefault((r["event_type"], h), []).append(
            (r["ts"], r["event_id"], r["value"])
        )
    got = {(r["event_type"], r["hour"]): r for r in q_ohlc_bars(spark, sf_dir).collect()}
    assert set(got) == set(bars)
    for k, rows in bars.items():
        rows.sort()
        r = got[k]
        assert r["n"] == len(rows)
        assert r["open"] == round(rows[0][2], 6) and r["close"] == round(rows[-1][2], 6)
        assert r["high"] == round(max(v for _, _, v in rows), 6)
        assert r["low"] == round(min(v for _, _, v in rows), 6)


def test_rolling_median_bruteforce(spark, sf_dir):
    """Every row's trailing-5 median must match a Python recompute over
    the (ts, event_id)-ordered µunit series."""
    import math

    from matrix_multiplication_bigdata_ind_assignments_spark.operators.windows import (
        _RMED_K,
        q_rolling_median,
    )
    from matrix_multiplication_bigdata_ind_assignments_spark.sources import load

    ev = load(spark, sf_dir, "events").select("user_id", "event_id", "ts", "value").collect()
    series: dict = {}
    for r in ev:
        series.setdefault(r["user_id"], []).append(
            (r["ts"], r["event_id"], math.floor(r["value"] * 1e6 + 0.5))
        )
    expect = {}
    for u, s in series.items():
        s.sort()
        for i in range(len(s)):
            win = sorted(v for _, _, v in s[max(0, i - _RMED_K + 1) : i + 1])
            n = len(win)
            tw = 2 * win[(n + 1) // 2 - 1] if n % 2 else win[n // 2 - 1] + win[n // 2]
            expect[s[i][1]] = (n, tw / 2 / 1e6)
    got = {r["event_id"]: (r["n_window"], r["rolling_median"]) for r in q_rolling_median(spark, sf_dir).collect()}
    assert got == expect


def test_rolling_median_outlier_immunity(spark):
    """A single spike moves the EWMA but not the rolling median."""
    import datetime as dt
    import os
    import tempfile

    from matrix_multiplication_bigdata_ind_assignments_spark.operators.windows import (
        q_ewma,
        q_rolling_median,
    )

    base = dt.datetime(2024, 1, 1)
    vals = [10.0, 10.0, 10.0, 1000.0, 10.0, 10.0]
    rows = [
        (i, base + dt.timedelta(minutes=i), 1, "a", v, "") for i, v in enumerate(vals)
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    )
    with tempfile.TemporaryDirectory() as d:
        df.coalesce(1).write.parquet(os.path.join(d, "events.parquet"))
        med = {r["event_id"]: r["rolling_median"] for r in q_rolling_median(spark, d).collect()}
        ew = q_ewma(spark, d).collect()[0]["ewma"]
    assert med[5] == 10.0  # spike inside the window, median unmoved
    assert ew > 40.0  # the spike still dominates the EWMA two steps later
