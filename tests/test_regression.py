"""Regression-operator invariants: the fit must recover known answers
(the matmul cubic), agree with an independent solver (numpy lstsq /
polyfit), drop degenerate series via the shared guard, stay
partition-invariant (the exact-integer-sums property), and keep its
one-pass partial-aggregate plan shape."""

import re

import duckdb
import numpy as np

from matrix_multiplication_bigdata_ind_assignments_spark.operators.regression import (
    _ZIPF_K,
    q_complexity_fit,
    q_linreg,
    q_ols_normal,
    q_zipf_fit,
)

from conftest import SF_DIR, rows_set


def plan_of(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_complexity_fit_recovers_the_cubic(spark, sf_dir):
    """The fixture's C and Python series are the reference's own naive
    matmul timings — the fitted exponent must say 'cubic', and the Java
    thread-sweep series (one size each → zero x-variance) must be
    dropped by the degenerate-series guard, not fitted or crashed on."""
    rows = {(r["lang"], r["algo"], r["threads"]): r for r in q_complexity_fit(spark, sf_dir).collect()}
    assert set(rows) == {("c", "basic", 1), ("python", "basic", 1)}
    for key, r in rows.items():
        assert abs(r["exponent"] - 3.0) < 0.05, (key, r["exponent"])
        assert r["r2"] > 0.999
        assert r["n_points"] == 3


def test_linreg_matches_numpy_polyfit(spark, sf_dir):
    ours = {r["event_type"]: r for r in q_linreg(spark, sf_dir).collect()}
    con = duckdb.connect()
    pts = con.execute(
        f"SELECT event_type, CAST(date_part('hour', ts) AS BIGINT) AS x, value"
        f" FROM '{SF_DIR}/events.parquet'"
    ).df()
    assert set(ours) == set(pts["event_type"].unique())
    for et, grp in pts.groupby("event_type"):
        x = grp["x"].to_numpy(dtype=float)
        # same fixed-point quantization of y the operator applies
        y = np.floor(grp["value"].to_numpy(dtype=float) * 1e6 + 0.5) / 1e6
        slope, intercept = np.polyfit(x, y, 1)
        assert abs(ours[et]["slope"] - slope) < 1e-4, et
        assert abs(ours[et]["intercept"] - intercept) < 1e-3, et
        r = np.corrcoef(x, y)[0, 1]
        assert abs(ours[et]["r2"] - r * r) < 1e-3, et


def test_ols_normal_matches_numpy_lstsq(spark, sf_dir):
    row = q_ols_normal(spark, sf_dir).collect()
    assert len(row) == 1
    row = row[0]
    con = duckdb.connect()
    df = con.execute(f"SELECT text, n_chars FROM '{SF_DIR}/documents.parquet'").df()
    stop = {"the", "a", "of", "and", "to"}
    x1, x2, y = [], [], []
    for text, n_chars in zip(df["text"], df["n_chars"]):
        toks = [t for t in text.split(" ") if t]
        sw = sum(1 for t in toks if t in stop)
        punct = len(re.findall(r"[^a-z0-9 ]", text))
        q = (
            0.4 * min(len(toks) / 100.0, 1.0)
            + 0.3 * (1 - punct / max(n_chars, 1))
            + 0.3 * (sw / max(len(toks), 1))
        )
        x1.append(len(toks))
        x2.append(sw)
        y.append(np.floor(round(q, 6) * 1e6 + 0.5) / 1e6)
    X = np.column_stack([np.ones(len(x1)), x1, x2])
    beta, *_ = np.linalg.lstsq(X, np.asarray(y), rcond=None)
    assert row["n_rows"] == len(x1)
    for got, want in zip((row["b0"], row["b1"], row["b2"]), beta):
        assert abs(got - want) < 1e-4, (got, want)
    resid = np.asarray(y) - X @ beta
    sst = ((np.asarray(y) - np.mean(y)) ** 2).sum()
    assert abs(row["r2"] - (1 - (resid**2).sum() / sst)) < 1e-3


def test_zipf_fit_bounded_and_partition_invariant(spark, sf_dir):
    base = rows_set(q_zipf_fit(spark, sf_dir))
    assert len(base) == 1
    n_points = [v for v in base[0] if isinstance(v, int)][0]
    assert 0 < n_points <= _ZIPF_K
    old = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "7")
        assert rows_set(q_zipf_fit(spark, sf_dir)) == base
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)


def test_linreg_partition_invariant(spark, sf_dir):
    base = rows_set(q_linreg(spark, sf_dir))
    old = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "5")
        assert rows_set(q_linreg(spark, sf_dir)) == base
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)
    assert len(base) > 0


def test_fit_plans_stay_one_pass(spark, sf_dir):
    """The OLS sums must keep the partial/final HashAggregate split (the
    shuffle carries O(groups·d²) sum rows, not data), and the Zipf top-K
    must plan as TakeOrderedAndProject — no global sort of the
    wordcount."""
    lin = plan_of(q_linreg(spark, sf_dir))
    assert lin.count("HashAggregate") >= 2
    zipf = plan_of(q_zipf_fit(spark, sf_dir))
    assert "TakeOrderedAndProject" in zipf
    assert zipf.count("Sort ") <= 1  # only the bounded K-row window sort


def test_ols_predict_residuals_center_and_bound(spark, sf_dir):
    """OLS residuals: the global signed bias is ~0 by the normal
    equations (per-lang biases average out weighted by n), MAE is
    bounded by the score range, and every lang appears."""
    from matrix_multiplication_bigdata_ind_assignments_spark.operators.regression import q_ols_predict
    from matrix_multiplication_bigdata_ind_assignments_spark.sources import load

    rows = q_ols_predict(spark, sf_dir).collect()
    langs = {r["lang"] for r in load(spark, sf_dir, "documents").select("lang").distinct().collect()}
    assert {r["lang"] for r in rows} == langs
    n = sum(r["n_docs"] for r in rows)
    global_bias = sum(r["bias"] * r["n_docs"] for r in rows) / n
    assert abs(global_bias) < 1e-3  # normal equations zero the mean residual
    for r in rows:
        assert 0 <= r["mae"] <= 1.0  # quality scores live in [0, 1]
        assert r["max_abs_err_micro"] >= int(r["mae"] * 1e6) - 1


def test_retention_decay_recovers_injected_halflife(spark):
    """Synthetic cohort with a clean halving each week (16 -> 8 -> 4 ->
    2 returning users) must fit decay = -ln 2 per week, half-life 1.0,
    r2 ~ 1."""
    import datetime as dt
    import math
    import os
    import tempfile

    from matrix_multiplication_bigdata_ind_assignments_spark.operators.regression import (
        q_retention_decay,
    )

    base = dt.datetime(2024, 1, 1)
    wk = dt.timedelta(days=7)
    rows = []
    eid = 0
    for u in range(32):
        rows.append((eid, base, u, "view", 0.0, "")); eid += 1  # cohort week 0
    for offset, alive in ((1, 16), (2, 8), (3, 4), (4, 2)):
        for u in range(alive):
            rows.append((eid, base + offset * wk, u, "view", 0.0, "")); eid += 1
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    )
    with tempfile.TemporaryDirectory() as d:
        df.coalesce(1).write.parquet(os.path.join(d, "events.parquet"))
        (r,) = q_retention_decay(spark, d).collect()
    assert r["n_points"] == 4
    assert abs(r["decay_per_week"] + math.log(2)) < 1e-4
    assert abs(r["half_life_weeks"] - 1.0) < 1e-3
    assert r["r2"] > 0.9999


def test_retention_decay_null_halflife_when_flat(spark, sf_dir):
    """On the dense fixture retention is ~flat: if the fit survives the
    variance guard, a non-negative slope must report NULL half-life;
    an empty result (guard drop) is the degenerate-consistent case."""
    from matrix_multiplication_bigdata_ind_assignments_spark.operators.regression import (
        q_retention_decay,
    )

    rows = q_retention_decay(spark, sf_dir).collect()
    for r in rows:
        if r["decay_per_week"] >= 0:
            assert r["half_life_weeks"] is None
        else:
            assert r["half_life_weeks"] > 0


def test_forecast_eval_perfect_seasonal_pattern(spark):
    """A strict weekly pattern forecasts its holdout exactly -> MAE 0;
    a shifted holdout shows the shift as MAE."""
    import datetime as dt
    import os
    import tempfile

    from matrix_multiplication_bigdata_ind_assignments_spark.operators.regression import (
        q_forecast_eval,
    )

    base = dt.datetime(2024, 1, 1)
    rows, eid = [], 0
    # 28 train days + 7 holdout days, volume = 2 + (weekday of epoch-day)
    for day in range(35):
        epoch_day = int((base + dt.timedelta(days=day)).replace(tzinfo=dt.timezone.utc).timestamp()) // 86400
        per = 2 + (epoch_day % 7)
        shift = 3 if day >= 28 else 0  # holdout shifted for type 'b'
        for t, s in (("a", 0), ("b", shift)):
            for j in range(per + s):
                rows.append((eid, base + dt.timedelta(days=day, minutes=j), 1, t, 0.0, ""))
                eid += 1
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    )
    with tempfile.TemporaryDirectory() as d:
        df.coalesce(1).write.parquet(os.path.join(d, "events.parquet"))
        got = {r["event_type"]: r for r in q_forecast_eval(spark, d).collect()}
    assert got["a"]["mae"] == 0.0 and got["a"]["n_days"] == 7
    assert got["b"]["mae"] == 3.0 and got["b"]["max_err_micro"] == 3_000_000


def test_heaps_fit_growing_vocabulary(spark, tmp_path):
    """On a corpus whose vocabulary genuinely grows (each doc introduces
    sqrt-ish new words), the Heaps fit must report a clearly positive
    beta with a strong r2; on the near-closed-vocabulary fixture it
    reports ~0 (the q_zipf_fit honesty rule — asserted in the oracle
    sweep, not here)."""
    from matrix_multiplication_bigdata_ind_assignments_spark.operators.regression import q_heaps_fit

    rows = []
    w = 0
    for d in range(60):
        novel = [f"w{w + i}" for i in range(3 + d // 8)]  # growing novelty
        w += len(novel)
        common = ["the", "of", "data"] * 5
        text = " ".join(common + novel)
        rows.append((d, text, "en", "s0", len(text)))
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    df.write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    out = q_heaps_fit(spark, str(tmp_path)).collect()
    assert len(out) == 1
    r = out[0]
    assert r["n_points"] == 60
    # clearly positive growth with a strong fit (the synthetic ramps
    # novelty up with doc index, so beta can slightly exceed 1 — the
    # contract here is "real growth, tight fit", vs the fixture's ~0)
    assert 0.3 < r["heaps_beta"] < 1.3
    assert r["r2"] > 0.9
