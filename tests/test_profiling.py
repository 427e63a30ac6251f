"""Profiling invariants: statistics must be partition-invariant (the
reason they route through exact integer sums), and shard packing must
respect the contiguity + budget rules dataloaders assume."""

from pyspark.sql import functions as F

from matrix_multiplication_bigdata_ind_assignments_spark.operators.profiling import (
    q_corr,
    q_summary_stats,
    q_token_shards,
)
from matrix_multiplication_bigdata_ind_assignments_spark.sources import load

from conftest import rows_set


def test_summary_stats_partition_invariant(spark, sf_dir):
    base = rows_set(q_summary_stats(spark, sf_dir))
    old = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "7")
        again = rows_set(q_summary_stats(spark, sf_dir))
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)
    assert base == again and len(base) > 0


def test_corr_matches_spark_builtin_approximately(spark, sf_dir):
    """The deterministic fixed-point corr must agree with F.corr to well
    inside the 1e-4 rounding grain (it is the same statistic)."""
    ours = {r["l_returnflag"]: r["corr_qty_price"] for r in q_corr(spark, sf_dir).collect()}
    ref = {
        r["l_returnflag"]: r["c"]
        for r in load(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(F.corr("l_quantity", "l_extendedprice").alias("c"))
        .collect()
    }
    assert set(ours) == set(ref)
    for k in ours:
        assert abs(ours[k] - ref[k]) < 5e-4


def test_token_shards_contiguous_and_bounded(spark, sf_dir):
    rows = q_token_shards(spark, sf_dir).collect()
    toks = {
        r["doc_id"]: r["n_tokens"]
        for r in load(spark, sf_dir, "documents")
        .select("doc_id", F.size(F.split(F.trim("text"), r"\s+")).alias("n_tokens"))
        .collect()
    }
    by_lang: dict[str, list] = {}
    for r in rows:
        by_lang.setdefault(r["lang"], []).append((r["doc_id"], r["shard"]))
    for lang, docs in by_lang.items():
        docs.sort()
        # shard ids are non-decreasing in doc order (contiguous packing)
        shards = [s for _, s in docs]
        assert shards == sorted(shards)
        # a shard only opens once the previous one has reached the budget:
        # tokens strictly before each shard's first doc are >= shard*2000
        totals: dict[int, int] = {}
        running = 0
        for doc_id, shard in docs:
            assert shard == running // 2000
            running += toks[doc_id]
            totals[shard] = totals.get(shard, 0) + toks[doc_id]


def test_hll_union_tracks_exact_distinct(spark, sf_dir):
    """Merged daily HLL sketches must estimate within HLL error of the
    exact per-type distinct user counts."""
    from pyspark.sql import functions as F

    from matrix_multiplication_bigdata_ind_assignments_spark.operators.aggregates import q_hll_union
    from matrix_multiplication_bigdata_ind_assignments_spark.sources import load

    approx = {r["event_type"]: r["approx_users"] for r in q_hll_union(spark, sf_dir).collect()}
    exact = {
        r["event_type"]: r["n"]
        for r in load(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    assert set(approx) == set(exact)
    for t, n in exact.items():
        assert abs(approx[t] - n) <= max(2, 0.05 * n), (t, approx[t], n)


def test_winsorize_bounds_and_clip_counts(spark, sf_dir):
    """Clip fractions sit near the nominal 5% tails and the winsorized
    mean is inside [lo, hi] for every group."""
    from matrix_multiplication_bigdata_ind_assignments_spark.operators.profiling import q_winsorize

    rows = q_winsorize(spark, sf_dir).collect()
    assert rows
    from matrix_multiplication_bigdata_ind_assignments_spark.sources import load

    n_by_type = {
        r["event_type"]: r["n"]
        for r in load(spark, sf_dir, "events").groupBy("event_type").count().withColumnRenamed("count", "n").collect()
    }
    for r in rows:
        assert r["lo"] <= r["win_avg"] <= r["hi"]
        n = n_by_type[r["event_type"]]
        # interpolated percentiles put <= 5% strictly outside each bound
        assert r["n_clipped_lo"] <= 0.06 * n + 1
        assert r["n_clipped_hi"] <= 0.06 * n + 1


def test_mad_outliers_robust_to_contamination(spark):
    """One pathological value must NOT move the MAD gate (the zscore
    gate it twins would be dragged): 100 unit-spaced values + one 1e9
    spike -> only the spike is flagged."""
    from matrix_multiplication_bigdata_ind_assignments_spark.operators.profiling import q_mad_outliers

    import datetime as dt
    import os
    import tempfile

    base = dt.datetime(2024, 1, 1)
    rows = [
        (i, base, i % 7, "a", float(i % 100), "") for i in range(100)
    ] + [(999, base, 1, "a", 1e9, "")]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    )
    with tempfile.TemporaryDirectory() as d:
        df.coalesce(1).write.parquet(os.path.join(d, "events.parquet"))
        got = q_mad_outliers(spark, d).collect()
    assert [r["event_id"] for r in got] == [999]


def test_join_profile_predicts_actual_join_cardinality(spark, sf_dir):
    """est_out_rows must equal the REAL join's row count — the estimate
    is exact by construction, which is the whole value of the
    diagnostic."""
    from matrix_multiplication_bigdata_ind_assignments_spark.operators.profiling import q_join_profile
    from matrix_multiplication_bigdata_ind_assignments_spark.sources import load

    r = q_join_profile(spark, sf_dir).collect()[0]
    o = load(spark, sf_dir, "orders")
    l = load(spark, sf_dir, "lineitem")
    actual = o.join(l, o.o_orderkey == l.l_orderkey).count()
    assert r["est_out_rows"] == actual
    assert r["n_keys_both"] <= min(r["n_keys_left"], r["n_keys_right"])
    assert r["top_key_out_rows"] <= r["max_left_per_key"] * r["max_right_per_key"]


def test_cusum_finds_injected_level_shift(spark):
    """Synthetic volume series: 2/day for 50 days then 10/day for 50
    days -> the CUSUM peak must land exactly on the last low day."""
    import datetime as dt
    import os
    import tempfile

    from matrix_multiplication_bigdata_ind_assignments_spark.operators.profiling import (
        q_cusum_changepoint,
    )

    base = dt.datetime(2024, 1, 1)
    rows = []
    eid = 0
    for day in range(100):
        per = 2 if day < 50 else 10
        for j in range(per):
            rows.append((eid, base + dt.timedelta(days=day, minutes=j), 1, "a", 0.0, ""))
            eid += 1
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    )
    with tempfile.TemporaryDirectory() as d:
        df.coalesce(1).write.parquet(os.path.join(d, "events.parquet"))
        got = q_cusum_changepoint(spark, d).collect()
    assert len(got) == 1
    r = got[0]
    epoch_day0 = int(base.replace(tzinfo=dt.timezone.utc).timestamp()) // 86400
    assert r["change_day"] == epoch_day0 + 49  # last day of the low regime
    assert r["n_days"] == 100


def test_psi_detects_injected_shift_and_null_case(spark):
    """Identical halves -> PSI ~ 0 (only Laplace noise); a shifted
    second half -> PSI over the 0.2 alert threshold."""
    import datetime as dt
    import os
    import tempfile

    from matrix_multiplication_bigdata_ind_assignments_spark.operators.profiling import q_psi_drift

    base = dt.datetime(2024, 1, 1)
    late = dt.datetime(2024, 1, 20)
    rows = []
    eid = 0
    for i in range(400):
        rows.append((eid, base, 1, "stable", float(i % 100), "")); eid += 1
        rows.append((eid, late, 1, "stable", float(i % 100), "")); eid += 1
        rows.append((eid, base, 1, "shifted", float(i % 100), "")); eid += 1
        rows.append((eid, late, 1, "shifted", float(i % 100) + 80.0, "")); eid += 1
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    )
    with tempfile.TemporaryDirectory() as d:
        df.coalesce(1).write.parquet(os.path.join(d, "events.parquet"))
        got = {r["event_type"]: r for r in q_psi_drift(spark, d).collect()}
    assert got["stable"]["psi"] < 0.01
    assert got["shifted"]["psi"] > 0.2
    assert got["stable"]["n_ref"] == got["stable"]["n_cur"] == 400


def test_ks_matches_scipy_style_bruteforce(spark, sf_dir):
    """d_scaled must equal the brute-force max |nc*F_ref - nr*F_cur|
    over the merged grid, recomputed in Python."""
    from matrix_multiplication_bigdata_ind_assignments_spark.operators.profiling import (
        _DRIFT_SPLIT,
        q_ks_drift,
    )
    from matrix_multiplication_bigdata_ind_assignments_spark.sources import load

    import datetime as dt

    split = dt.datetime.fromisoformat(_DRIFT_SPLIT)
    rows = load(spark, sf_dir, "events").select("event_type", "ts", "value").collect()
    got = {r["event_type"]: r for r in q_ks_drift(spark, sf_dir).collect()}
    by_type: dict = {}
    for r in rows:
        ref = r["ts"].replace(tzinfo=None) < split
        by_type.setdefault(r["event_type"], ([], []))[0 if ref else 1].append(r["value"])
    for et, (a, b) in by_type.items():
        a.sort(); b.sort()
        nr, nc = len(a), len(b)
        import bisect

        best = 0
        for x in sorted(set(a) | set(b)):
            cumr = bisect.bisect_right(a, x)
            cumc = bisect.bisect_right(b, x)
            best = max(best, abs(nc * cumr - nr * cumc))
        r = got[et]
        assert (r["n_ref"], r["n_cur"]) == (nr, nc)
        assert r["d_scaled"] == best, et


def test_equidepth_buckets_are_balanced(spark, sf_dir):
    """Equal-depth property: every bucket holds n_type/8 rows within
    the tie-induced slack, buckets tile [min, max] in order, and
    counts sum back to the type totals."""
    from matrix_multiplication_bigdata_ind_assignments_spark.operators.profiling import (
        _EQD_BUCKETS,
        q_equidepth_hist,
    )
    from matrix_multiplication_bigdata_ind_assignments_spark.sources import load

    rows = q_equidepth_hist(spark, sf_dir).collect()
    totals = {
        r["event_type"]: r["n"]
        for r in load(spark, sf_dir, "events").groupBy("event_type").count().withColumnRenamed("count", "n").collect()
    }
    by_type: dict = {}
    for r in rows:
        by_type.setdefault(r["event_type"], []).append(r)
    for et, bs in by_type.items():
        bs.sort(key=lambda r: r["bucket"])
        assert sum(r["n"] for r in bs) == totals[et]
        target = totals[et] / _EQD_BUCKETS
        for r in bs:
            assert r["n"] <= 2 * target + 1  # depth balance (values are near-continuous)
            assert r["lo"] <= r["hi"]
        for a, b in zip(bs, bs[1:]):
            assert a["hi"] <= b["lo"] + 1e-9  # buckets tile in value order


def test_autocorr_alternating_series_and_bruteforce(spark, sf_dir):
    """Injected period-2 daily volume -> lag-1 ACF strongly negative,
    lag-2 strongly positive; fixture values must equal a Python
    brute-force recompute of the exact integer formula."""
    import datetime as dt
    import math
    import os
    import tempfile

    from matrix_multiplication_bigdata_ind_assignments_spark.operators.profiling import q_autocorr
    from matrix_multiplication_bigdata_ind_assignments_spark.sources import load

    base = dt.datetime(2024, 1, 1)
    rows = []
    eid = 0
    for day in range(60):
        per = 10 if day % 2 == 0 else 2
        for j in range(per):
            rows.append((eid, base + dt.timedelta(days=day, minutes=j), 1, "alt", 0.0, ""))
            eid += 1
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    )
    with tempfile.TemporaryDirectory() as d:
        df.coalesce(1).write.parquet(os.path.join(d, "events.parquet"))
        got = {r["lag"]: r["acf"] for r in q_autocorr(spark, d).collect()}
    assert got[1] < -0.9 and got[2] > 0.9

    # brute force on the real fixture
    ev = load(spark, sf_dir, "events").select("event_type", "ts").collect()
    daily: dict = {}
    for r in ev:
        day = int(r["ts"].replace(tzinfo=dt.timezone.utc).timestamp()) // 86400
        daily[(r["event_type"], day)] = daily.get((r["event_type"], day), 0) + 1
    series: dict = {}
    for (et, day), c in daily.items():
        series.setdefault(et, []).append((day, c))
    got = {(r["event_type"], r["lag"]): r for r in q_autocorr(spark, sf_dir).collect()}
    for et, pts in series.items():
        pts.sort()
        cs = [c for _, c in pts]
        dcnt, t = len(cs), sum(cs)
        v = [dcnt * c - t for c in cs]
        den = sum(x * x for x in v)
        for k in (1, 2, 3):
            if den <= 0:
                assert (et, k) not in got
                continue
            num = sum(v[i] * v[i - k] for i in range(k, len(v)))
            exp = math.floor((num / den) * 1e6 + 0.5) / 1e6
            r = got[(et, k)]
            assert r["acf"] == exp and r["n_days"] == dcnt, (et, k)


def test_chi2_independent_vs_coupled(spark):
    """lang independent of source -> chi2 ~ 0; lang == source -> V ~ 1."""
    import os
    import tempfile

    from matrix_multiplication_bigdata_ind_assignments_spark.operators.profiling import (
        q_chi2_independence,
    )

    def mkdocs(rows):
        return spark.createDataFrame(
            [(i, "w " * 3, l, s, 6) for i, (l, s) in enumerate(rows)],
            "doc_id long, text string, lang string, source string, n_chars int",
        )

    indep = [(l, s) for l in ("en", "fr") for s in ("web", "book") for _ in range(100)]
    coupled = [("en", "web")] * 200 + [("fr", "book")] * 200
    with tempfile.TemporaryDirectory() as d:
        mkdocs(indep).coalesce(1).write.parquet(os.path.join(d, "documents.parquet"))
        r = q_chi2_independence(spark, d).collect()[0]
        assert r["chi2"] == 0.0 and r["dof"] == 1 and r["n_docs"] == 400
    with tempfile.TemporaryDirectory() as d:
        mkdocs(coupled).coalesce(1).write.parquet(os.path.join(d, "documents.parquet"))
        r = q_chi2_independence(spark, d).collect()[0]
        # perfect association: chi2 = N, Cramer's V = 1
        assert abs(r["chi2"] - 400.0) < 1e-6 and abs(r["cramers_v"] - 1.0) < 1e-6


def test_gini_uniform_zero_and_concentrated(spark):
    """Equal token counts -> Gini exactly 0; one doc holding almost all
    tokens -> Gini near (n-1)/n."""
    import os
    import tempfile

    from matrix_multiplication_bigdata_ind_assignments_spark.operators.profiling import q_gini_tokens

    uniform = [(i, "a b c d", "en", "web", 7) for i in range(50)]
    conc = [(i, "a", "fr", "web", 1) for i in range(49)] + [(49, "a " * 10000, "fr", "web", 2)]
    df = spark.createDataFrame(
        uniform + conc, "doc_id long, text string, lang string, source string, n_chars int"
    )
    with tempfile.TemporaryDirectory() as d:
        df.coalesce(1).write.parquet(os.path.join(d, "documents.parquet"))
        got = {r["lang"]: r for r in q_gini_tokens(spark, d).collect()}
    assert got["en"]["gini"] == 0.0 and got["en"]["n_docs"] == 50
    assert got["fr"]["gini"] > 0.9 and got["fr"]["total_tokens"] == 49 + 10000


def test_benford_bruteforce_and_chi2(spark, sf_dir):
    import math

    from matrix_multiplication_bigdata_ind_assignments_spark.operators.profiling import (
        _BENFORD_P,
        q_benford,
    )
    from matrix_multiplication_bigdata_ind_assignments_spark.sources import load

    vals = [r["o_totalprice"] for r in load(spark, sf_dir, "orders").collect() if r["o_totalprice"] >= 1]
    obs = {d: 0 for d in range(1, 10)}
    for v in vals:
        obs[int(str(int(math.floor(v)))[0])] += 1
    n = len(vals)
    chi2_u = sum(
        math.floor((obs[d] - n * float(p)) ** 2 / (n * float(p)) * 1e6 + 0.5)
        for d, p in _BENFORD_P.items()
    )
    got = {r["digit"]: r for r in q_benford(spark, sf_dir).collect()}
    assert set(got) == set(range(1, 10))
    for d in range(1, 10):
        assert got[d]["n_obs"] == obs[d]
        assert got[d]["chi2"] == chi2_u / 1e6
    assert abs(sum(r["frac"] for r in got.values()) - 1.0) < 1e-4


def test_higher_moments_match_numpy(spark, sf_dir):
    """Within the 1e-6 rounding grain of a float recompute; and an
    injected symmetric sample has skew exactly 0."""
    import os
    import tempfile

    from matrix_multiplication_bigdata_ind_assignments_spark.operators.profiling import (
        q_higher_moments,
    )
    from matrix_multiplication_bigdata_ind_assignments_spark.sources import load

    import numpy as np

    got = {r["l_returnflag"]: r for r in q_higher_moments(spark, sf_dir).collect()}
    rows = load(spark, sf_dir, "lineitem").select("l_returnflag", "l_extendedprice").collect()
    by_flag: dict = {}
    for r in rows:
        by_flag.setdefault(r["l_returnflag"], []).append(
            np.floor(r["l_extendedprice"] * 100 + 0.5) / 100
        )
    for fl, xs in by_flag.items():
        a = np.array(xs)
        m2 = ((a - a.mean()) ** 2).mean()
        m3 = ((a - a.mean()) ** 3).mean()
        m4 = ((a - a.mean()) ** 4).mean()
        r = got[fl]
        assert abs(r["mean"] - a.mean()) < 1e-4
        assert abs(r["stddev_pop"] - np.sqrt(m2)) < 1e-4
        assert abs(r["skewness"] - m3 / m2**1.5) < 1e-5
        assert abs(r["kurtosis"] - (m4 / m2**2 - 3)) < 1e-5

    sym = spark.createDataFrame(
        [(1, 1, 1, 1, 10.0 + d, 0.0, 0.0, "S", "x", None) for d in (-2, -1, 0, 1, 2) for _ in range(10)],
        "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber long, l_extendedprice double, l_discount double, l_tax double, l_returnflag string, l_linestatus string, l_shipdate timestamp",
    ).withColumn("l_quantity", F.lit(1.0))
    with tempfile.TemporaryDirectory() as d:
        sym.coalesce(1).write.parquet(os.path.join(d, "lineitem.parquet"))
        r = q_higher_moments(spark, d).collect()
    assert len(r) == 1 and r[0]["skewness"] == 0.0


def test_mutual_info_independent_vs_coupled(spark):
    """Independent -> MI 0; a perfectly coupled 2x2 -> MI = ln 2."""
    import math
    import os
    import tempfile

    from matrix_multiplication_bigdata_ind_assignments_spark.operators.profiling import q_mutual_info

    def mkdocs(rows):
        return spark.createDataFrame(
            [(i, "w", l, s, 1) for i, (l, s) in enumerate(rows)],
            "doc_id long, text string, lang string, source string, n_chars int",
        )

    indep = [(l, s) for l in ("en", "fr") for s in ("web", "book") for _ in range(50)]
    coupled = [("en", "web")] * 100 + [("fr", "book")] * 100
    with tempfile.TemporaryDirectory() as d:
        mkdocs(indep).coalesce(1).write.parquet(os.path.join(d, "documents.parquet"))
        r = q_mutual_info(spark, d).collect()[0]
        assert r["mutual_info_nats"] == 0.0 and r["n_cells"] == 4
    with tempfile.TemporaryDirectory() as d:
        mkdocs(coupled).coalesce(1).write.parquet(os.path.join(d, "documents.parquet"))
        r = q_mutual_info(spark, d).collect()[0]
        assert abs(r["mutual_info_nats"] - math.log(2)) < 1e-5


def test_anova_weekday_detects_injected_seasonality(spark):
    """Flat volume -> F ~ 0; strong weekday pattern -> large F and
    eta_sq near 1; values match a scipy-free recompute."""
    import datetime as dt
    import os
    import tempfile

    from matrix_multiplication_bigdata_ind_assignments_spark.operators.profiling import (
        q_anova_weekday,
    )

    base = dt.datetime(2024, 1, 1)
    rows, eid = [], 0
    for day in range(56):
        epoch_day = int(
            (base + dt.timedelta(days=day)).replace(tzinfo=dt.timezone.utc).timestamp()
        ) // 86400
        flat = 5
        # jitter keeps SSW > 0: a PERFECT pattern has SSW = 0 and is
        # dropped by the divide guard like the flat series
        seasonal = 2 + 10 * (epoch_day % 7) + (1 if (day // 7) % 2 == 0 else 0)
        for t, per in (("flat", flat), ("seasonal", seasonal)):
            for j in range(per):
                rows.append((eid, base + dt.timedelta(days=day, minutes=j), 1, t, 0.0, ""))
                eid += 1
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    )
    with tempfile.TemporaryDirectory() as d:
        df.coalesce(1).write.parquet(os.path.join(d, "events.parquet"))
        got = {r["event_type"]: r for r in q_anova_weekday(spark, d).collect()}
    # flat series: zero between-group variance -> dropped by the SST>SSB guard
    assert "flat" not in got
    assert got["seasonal"]["eta_sq"] > 0.999 and got["seasonal"]["f_stat"] > 1000
    assert got["seasonal"]["n_days"] == 56 and got["seasonal"]["n_groups"] == 7


def test_welch_ttest_bruteforce(spark, sf_dir):
    import math

    from matrix_multiplication_bigdata_ind_assignments_spark.operators.aggregates import (
        q_welch_ttest,
    )
    from matrix_multiplication_bigdata_ind_assignments_spark.sources import load

    arms = {0: [], 1: []}
    for r in load(spark, sf_dir, "events").select("user_id", "value").collect():
        arms[r["user_id"] % 2].append(math.floor(r["value"] * 100 + 0.5))
    a, b = arms[0], arms[1]
    na, nb = len(a), len(b)
    va = (sum(x * x for x in a) - sum(a) ** 2 / na) / (na - 1)
    vb = (sum(x * x for x in b) - sum(b) ** 2 / nb) / (nb - 1)
    t = (sum(a) / na - sum(b) / nb) / math.sqrt(va / na + vb / nb)
    r = q_welch_ttest(spark, sf_dir).collect()[0]
    assert (r["n_a"], r["n_b"]) == (na, nb)
    assert r["t_stat"] == math.floor(t * 1e4 + 0.5) / 1e4
    assert abs(r["mean_a"] - sum(a) / na / 100) < 1e-6


def test_heatmap_foots_to_hourly_totals(spark, sf_dir):
    from matrix_multiplication_bigdata_ind_assignments_spark.operators.profiling import (
        _HM_VBUCKETS,
        q_heatmap_2d,
    )
    from matrix_multiplication_bigdata_ind_assignments_spark.sources import load

    rows = q_heatmap_2d(spark, sf_dir).collect()
    e = load(spark, sf_dir, "events")
    total = e.count()
    assert sum(r["n"] for r in rows) == total
    hourly = {
        r["h"]: r["count"]
        for r in e.selectExpr("CAST(extract(hour FROM ts) AS BIGINT) h").groupBy("h").count().collect()
    }
    got_hourly: dict = {}
    bands: dict = {}
    for r in rows:
        got_hourly[r["hour_of_day"]] = got_hourly.get(r["hour_of_day"], 0) + r["n"]
        bands[r["vbucket"]] = bands.get(r["vbucket"], 0) + r["n"]
    assert got_hourly == hourly
    # equi-depth bands: globally balanced within a loose envelope
    assert set(bands) == set(range(_HM_VBUCKETS))
    for b, n in bands.items():
        assert n > total // (_HM_VBUCKETS * 3), (b, n)


def test_sketch_post_checks_fire_on_injected_violation(spark, sf_dir):
    """The sweep-side sketch certificates (VERDICT r11 item 6) must fail
    loudly on an out-of-bound estimate and pass the real results — the
    test_kcore_post_check_certificate discipline for the sketch family."""
    from matrix_multiplication_bigdata_ind_assignments_spark import registry

    registry._load_all()
    REGISTRY = registry.REGISTRY

    for qname, vcol in (
        ("q_approx_distinct_users", "n_users_approx"),
        ("q_hll_union", "approx_users"),
        ("q_approx_percentiles", None),
    ):
        q = REGISTRY[qname]
        df = q.fn(spark, sf_dir)
        rows = [tuple(r) for r in df.collect()]
        cols = list(df.columns)
        assert q.post_check(rows, cols, sf_dir) is None, qname
        # inject: double one estimate column of the first row
        bad_col = vcol or "p90"
        i = cols.index(bad_col)
        bad = [tuple(2 * v + 10 if j == i else v for j, v in enumerate(rows[0]))] + rows[1:]
        msg = q.post_check(bad, cols, sf_dir)
        assert msg is not None and (bad_col in msg or "approx" in msg or "p90" in msg), (
            qname,
            msg,
        )


def test_f2_ams_certificate_and_injection(spark, sf_dir):
    """The AMS F2 sketch: real output passes its sweep certificate,
    an injected 2x-off estimate fails it loudly, the estimate is
    deterministic across runs/partitionings (fixed seeds, integer Z
    sums), and it actually lands within the documented 25% of exact."""
    import duckdb

    from matrix_multiplication_bigdata_ind_assignments_spark import registry

    registry._load_all()
    q = registry.REGISTRY["q_f2_ams"]
    df = q.fn(spark, sf_dir)
    rows = [tuple(r) for r in df.collect()]
    cols = list(df.columns)
    assert q.post_check(rows, cols, sf_dir) is None
    i = cols.index("f2_est")
    bad = [tuple(2 * v + 10 if j == i else v for j, v in enumerate(rows[0]))]
    assert q.post_check(bad, cols, sf_dir) is not None
    # determinism: a second run is bit-identical
    rows2 = [tuple(r) for r in q.fn(spark, sf_dir).collect()]
    assert rows == rows2
    # and the bound is honest, not just certified
    (f2,) = (
        duckdb.connect()
        .execute(
            "SELECT sum(c * c) FROM (SELECT count(*) AS c FROM ("
            "SELECT unnest(string_split(text, ' ')) AS w"
            f" FROM '{sf_dir}/documents.parquet') WHERE w <> '' GROUP BY w)"
        )
        .fetchone()
    )
    assert abs(rows[0][i] - f2) <= 0.25 * f2
