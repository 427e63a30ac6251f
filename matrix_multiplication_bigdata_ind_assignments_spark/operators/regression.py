"""Regression operators — distributed least-squares as relational algebra.

The reference's analysis stage eyeballs its benchmark series ("Python
looks cubic") from per-size means (`Stage 1/Visualization/
mm_perf_visualizer.py` charts, report tables); this module computes the
claim: ``q_complexity_fit`` fits ``time = c * n^p`` per benchmark series
by ordinary least squares in log-log space and returns the measured
exponent p — 3.0 for a naive matmul, lower for blocked/parallel arms.
Around it sit the general primitives a 100 TB analytics engine needs:
``q_linreg`` (per-group simple OLS at event scale), ``q_ols_normal``
(multivariate OLS via the normal equations — a distributed gram-matrix
pass plus an in-plan Cramer solve, the classic "d is small, N is huge"
regression), and ``q_zipf_fit`` (the corpus-statistics composition:
wordcount → bounded top-K rank → rank-frequency exponent).

Scale posture: every fit is ONE scan producing d² map-side-combinable
integer sums — the shuffle carries O(groups · d²) rows regardless of N,
and the solve itself is a constant-size expression on the aggregated
row (no driver loop, no iterative descent, no second pass).

Determinism (SURVEY.md §7 FP-reproducibility): per-row terms are exact
fixed-point integers (µunits / micro-nats — ``functions.numeric``
route), reductions are exact integer/decimal sums, and the closing
floating-point solve is THE SAME SQL TEXT executed by both engines
(Spark ``selectExpr`` and the DuckDB oracle share the literal strings
built below), so both build the same IEEE-754 expression tree over
bit-identical inputs.  The one residual risk is inherited from the
lm_perplexity micro-nat route (`text.py:727` docstring): where a
micro-nat comes from ``ln()``, a 1-ulp JVM-vs-DuckDB libm divergence
landing within an ulp of a ``floor(x*1e6+0.5)`` boundary could flip one
integer; inputs to every ``ln`` here are bit-identical in both engines
(integer sizes/ranks/counts, locale-fixed CSV doubles), which bounds
but does not eliminate that risk.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..sources import load
from .bench_results import _FIXTURE_CORPUS, read_results_corpus
from .text import _STOPWORDS, quality_expr_6dp

# ---------------------------------------------------------------- shared text
#
# Everything below is SQL text used VERBATIM by both engines: Spark runs
# it through selectExpr/F.expr, DuckDB runs it inside the oracle string.
# Neither engine reassociates floating-point arithmetic, so identical
# text over bit-identical inputs gives bit-identical doubles.

#: exact per-point sums — x, y are exact integer columns (fixed-point);
#: products stay inside long range per-row (each operator documents its
#: bound) and are summed through DECIMAL(38,0), exact at any N.
_SUMS: dict[str, str] = {
    "n": "CAST(count(*) AS DOUBLE)",
    "sx": "CAST(sum(x) AS DOUBLE)",
    "sy": "CAST(sum(y) AS DOUBLE)",
    "sxx": "CAST(sum(CAST(x * x AS DECIMAL(38,0))) AS DOUBLE)",
    "sxy": "CAST(sum(CAST(x * y AS DECIMAL(38,0))) AS DOUBLE)",
    "syy": "CAST(sum(CAST(y * y AS DECIMAL(38,0))) AS DOUBLE)",
}

#: degenerate-series guard: zero x-variance (single point / constant x)
#: or zero y-variance makes the fit undefined — drop the group in BOTH
#: engines.  For such groups the variance expressions are exact zeros
#: (small integer sums, exact in doubles), so the predicate is stable.
_GUARD = "(n * sxx - sx * sx) > 0 AND (n * syy - sy * sy) > 0"

_COV = "(n * sxy - sx * sy)"
_VARX = "(n * sxx - sx * sx)"
_VARY = "(n * syy - sy * sy)"
#: slope/intercept in the x/y fixed-point unit scale; r² is scale-free
_SLOPE_U = f"({_COV} / {_VARX})"
_ICEPT_U = f"((sy - {_SLOPE_U} * sx) / n)"
_R2 = f"(({_COV} * {_COV}) / ({_VARX} * {_VARY}))"


def _rnd(expr: str, dp: int) -> str:
    """Half-up rounding as pure IEEE text (floor/× — never ``round()``,
    whose .5 behavior differs between the engines; `numeric.py`).  The
    result is cast back to DOUBLE explicitly: a ``{s}.0`` literal would
    be DOUBLE in DuckDB but DECIMAL in Spark SQL, changing the output
    type — the integer-divide form is fractional DOUBLE in both."""
    s = 10**dp
    return f"(CAST(floor(({expr}) * {s} + 0.5) AS DOUBLE) / {s})"


def _micro_ln(expr: str) -> str:
    """Micro-nat ln: exact integer ``floor(ln(v)*1e6+0.5)`` (the
    q_lm_perplexity route — same text is valid Spark SQL and DuckDB)."""
    return f"CAST(floor(ln({expr}) * 1000000 + 0.5) AS BIGINT)"


def _fit(points: DataFrame, group_cols: list[str], selects: list[str]) -> DataFrame:
    """Spark side of the simple-OLS tail: exact sums per group, guard,
    shared final-select text."""
    grouped = points.groupBy(*group_cols) if group_cols else points.groupBy()
    g = grouped.agg(*(F.expr(t).alias(k) for k, t in _SUMS.items()))
    return g.where(F.expr(_GUARD)).selectExpr(*group_cols, *selects)


def _fit_sql(points_sql: str, group_cols: list[str], selects: list[str]) -> str:
    """DuckDB side of the same tail — consumes the same `selects`."""
    gc = ", ".join(group_cols)
    gc_pfx = f"{gc}, " if gc else ""
    sums = ", ".join(f"{t} AS {k}" for k, t in _SUMS.items())
    group_by = f"GROUP BY {gc}" if gc else ""
    return f"""
WITH pts AS ({points_sql}),
g AS (SELECT {gc_pfx}{sums} FROM pts {group_by})
SELECT {gc_pfx}{", ".join(selects)} FROM g WHERE {_GUARD}
"""


# ------------------------------------------------------------ complexity fit

#: exponent p is unit-free (µ scales cancel); ln c comes back from µ-nats
_COMPLEXITY_SELECTS = [
    "CAST(n AS BIGINT) AS n_points",
    f"{_rnd(_SLOPE_U, 4)} AS exponent",
    f"{_rnd(f'({_ICEPT_U} / CAST(1000000 AS DOUBLE))', 4)} AS ln_coef",
    f"{_rnd(_R2, 4)} AS r2",
]

#: micro-nat point extraction — identical text both engines (x = ln n,
#: y = ln time_ms; x,y ≤ ~2e7 µnats, x*y ≤ 4e14 per row: inside long)
_COMPLEXITY_POINTS = [
    f"{_micro_ln('CAST(size AS DOUBLE)')} AS x",
    f"{_micro_ln('avg_time_ms')} AS y",
]


def _complexity_oracle_sql() -> str:
    # same per-file normalization as q_analyze_derived's oracle
    # (`bench_results.py:_analyze_oracle_sql`) — schema-heterogeneous
    # read_csv union + decimal-comma locale fix
    def src(fname: str, algo: str, threads: str) -> str:
        return f"""
  SELECT lower(lang) AS lang, {algo} AS algo, CAST({threads} AS INT) AS threads,
         CAST(size AS BIGINT) AS size,
         CAST(replace(avg_time_ms, ',', '.') AS DOUBLE) AS avg_time_ms
  FROM read_csv('{_FIXTURE_CORPUS}/{fname}', header=true, all_varchar=true)"""

    points = f"""
SELECT lang, algo, threads, {", ".join(_COMPLEXITY_POINTS)}
FROM ({src("results_c.csv", "'basic'", "1")}
UNION ALL{src("results_python.csv", "'basic'", "1")}
UNION ALL{src("results_java_par.csv", "algo", "threads")})
WHERE avg_time_ms > 0 AND size > 0
"""
    return _fit_sql(points, ["lang", "algo", "threads"], _COMPLEXITY_SELECTS)


@register("q_complexity_fit", oracle=_complexity_oracle_sql())
def q_complexity_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Empirical complexity-exponent fit over the benchmark-results
    corpus: per (lang, algo, threads) series, OLS of ln(avg_time_ms) on
    ln(size) — ``time = c·n^p`` → exponent p, ln c, r².  The committed
    fixture reproduces the reference's own heterogeneous CSVs; its
    C/Python series fit p ≈ 3.0 (naive matmul is cubic — the claim the
    reference's report makes from eyeballed charts, computed
    relationally here).  Single-point series (the Java thread-sweep
    rows) have zero x-variance and are dropped by the shared guard in
    both engines.  ``sf_dir`` is unused — the corpus is the fixture, as
    it is for the reference's own files (same contract as
    q_analyze_derived)."""
    cleaned = read_results_corpus(spark, os.path.join(_FIXTURE_CORPUS, "results_*.csv"))
    points = cleaned.where("avg_time_ms > 0 AND size > 0").selectExpr(
        "lang", "algo", "threads", *_COMPLEXITY_POINTS
    )
    return _fit(points, ["lang", "algo", "threads"], _COMPLEXITY_SELECTS)


# ------------------------------------------------------------- simple linreg

#: y is µunits (fx of value): slope/intercept come back /1e6; r² scale-free
_LINREG_SELECTS = [
    "CAST(n AS BIGINT) AS n_points",
    f"{_rnd(f'({_SLOPE_U} / CAST(1000000 AS DOUBLE))', 6)} AS slope",
    f"{_rnd(f'({_ICEPT_U} / CAST(1000000 AS DOUBLE))', 4)} AS intercept",
    f"{_rnd(_R2, 4)} AS r2",
]

#: x = hour-of-day (exact small int), y = fx(value) µunits.  Per-row
#: x*y ≤ 23·|value|·1e6 — inside long for any plausible measure; sums go
#: through DECIMAL(38,0) so N never overflows.
_LINREG_POINTS = [
    "CAST(date_part('hour', ts) AS BIGINT) AS x",
    "CAST(floor(value * 1000000 + 0.5) AS BIGINT) AS y",
]


@register(
    "q_linreg",
    oracle=_fit_sql(
        f"SELECT event_type, {', '.join(_LINREG_POINTS)} FROM events",
        ["event_type"],
        _LINREG_SELECTS,
    ),
)
def q_linreg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group simple linear regression at event scale: value ~
    hour-of-day per event_type (slope, intercept, r²).  The statistical
    sibling of q_corr (`profiling.py`): same five exact power sums, one
    map-side-combinable pass, O(groups) shuffle rows — the fit costs a
    profile, not a pipeline, at any N."""
    e = load(spark, sf_dir, "events")
    points = e.selectExpr("event_type", *_LINREG_POINTS)
    return _fit(points, ["event_type"], _LINREG_SELECTS)


# ---------------------------------------------------------------- Zipf's law

_ZIPF_K = 1000

_ZIPF_SELECTS = [
    "CAST(n AS BIGINT) AS n_points",
    f"{_rnd(_SLOPE_U, 4)} AS zipf_exponent",
    f"{_rnd(f'({_ICEPT_U} / CAST(1000000 AS DOUBLE))', 4)} AS ln_coef",
    f"{_rnd(_R2, 4)} AS r2",
]

#: x = ln(rank), y = ln(count) — both logs of exact integers
_ZIPF_POINTS = [
    f"{_micro_ln('CAST(rnk AS DOUBLE)')} AS x",
    f"{_micro_ln('CAST(cnt AS DOUBLE)')} AS y",
]

_ZIPF_ORACLE = _fit_sql(
    f"""
SELECT {", ".join(_ZIPF_POINTS)} FROM (
  SELECT cnt, row_number() OVER (ORDER BY cnt DESC, word) AS rnk
  FROM (
    SELECT w AS word, count(*) AS cnt
    FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
    WHERE w <> '' GROUP BY w
  ) QUALIFY rnk <= {_ZIPF_K}
)""",
    [],
    _ZIPF_SELECTS,
)


@register("q_zipf_fit", oracle=_ZIPF_ORACLE)
def q_zipf_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf's-law fit over the corpus: wordcount → top-K words by
    (count DESC, word) — a TOTAL order, so the K-cutoff is deterministic
    — → rank via row_number → OLS of ln(count) on ln(rank); a Zipfian
    corpus fits slope ≈ −1.  (The synthetic fixture's ~31-word
    near-uniform vocabulary fits ≈ −0.18 at r² ≈ 0.06 — the operator
    reports the corpus as it is; the slope magnitude and fit quality ARE
    the corpus diagnostic.)  Scale shape: the rank is a global order
    statistic, which would mean a global sort — so the fit is bounded to
    the top K=1000 (standard practice for Zipf estimation: the head is
    where the law holds).  Spark then plans orderBy().limit(K) as
    TakeOrderedAndProject — per-partition partial top-K merged on one
    node, NO full-sort shuffle — and the window ranks only K rows."""
    from pyspark.sql.window import Window

    d = load(spark, sf_dir, "documents")
    wc = (
        d.select(F.explode(F.split("text", " ")).alias("word"))
        .where(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    top = wc.orderBy(F.col("cnt").desc(), "word").limit(_ZIPF_K)
    ranked = top.select(
        "cnt",
        F.row_number()
        .over(Window.orderBy(F.col("cnt").desc(), "word"))
        .cast("long")
        .alias("rnk"),
    )
    points = ranked.selectExpr(*_ZIPF_POINTS)
    return _fit(points, [], _ZIPF_SELECTS)


# ------------------------------------------------- multivariate OLS (normal)

# Normal-equations solve, shared text.  A = XᵀX (3×3 symmetric with an
# intercept column of ones), b = Xᵀy; Cramer's rule on the aggregated
# row.  Minors are inlined f-strings so Spark and DuckDB parse the
# exact same arithmetic.
_M11 = "(sxx1 * sxx2 - sx12 * sx12)"
_M12 = "(sx1 * sxx2 - sx12 * sx2)"
_M13 = "(sx1 * sx12 - sxx1 * sx2)"
_DET = f"(n * {_M11} - sx1 * {_M12} + sx2 * {_M13})"
_DET0 = (
    f"(sy * {_M11} - sx1 * (sx1y * sxx2 - sx12 * sx2y)"
    f" + sx2 * (sx1y * sx12 - sxx1 * sx2y))"
)
_DET1 = (
    f"(n * (sx1y * sxx2 - sx12 * sx2y) - sy * {_M12}"
    f" + sx2 * (sx1 * sx2y - sx1y * sx2))"
)
_DET2 = (
    f"(n * (sxx1 * sx2y - sx1y * sx12) - sx1 * (sx1 * sx2y - sx1y * sx2)"
    f" + sy * {_M13})"
)
_B0U = f"({_DET0} / {_DET})"
_B1U = f"({_DET1} / {_DET})"
_B2U = f"({_DET2} / {_DET})"
#: R² = 1 − SSE/SST with SSE = yᵀy − βᵀXᵀy — everything from the sums
_SSE = f"(syy - {_B0U} * sy - {_B1U} * sx1y - {_B2U} * sx2y)"
_SST = "(syy - sy * sy / n)"
_OLS_GUARD = f"{_DET} <> 0 AND {_SST} > 0"

_OLS_SUMS: dict[str, str] = {
    "n": "CAST(count(*) AS DOUBLE)",
    "sx1": "CAST(sum(x1) AS DOUBLE)",
    "sx2": "CAST(sum(x2) AS DOUBLE)",
    "sy": "CAST(sum(y) AS DOUBLE)",
    "sxx1": "CAST(sum(CAST(x1 * x1 AS DECIMAL(38,0))) AS DOUBLE)",
    "sxx2": "CAST(sum(CAST(x2 * x2 AS DECIMAL(38,0))) AS DOUBLE)",
    "sx12": "CAST(sum(CAST(x1 * x2 AS DECIMAL(38,0))) AS DOUBLE)",
    "sx1y": "CAST(sum(CAST(x1 * y AS DECIMAL(38,0))) AS DOUBLE)",
    "sx2y": "CAST(sum(CAST(x2 * y AS DECIMAL(38,0))) AS DOUBLE)",
    "syy": "CAST(sum(CAST(y * y AS DECIMAL(38,0))) AS DOUBLE)",
}

_OLS_SELECTS = [
    "CAST(n AS BIGINT) AS n_rows",
    f"{_rnd(f'({_B0U} / CAST(1000000 AS DOUBLE))', 6)} AS b0",
    f"{_rnd(f'({_B1U} / CAST(1000000 AS DOUBLE))', 6)} AS b1",
    f"{_rnd(f'({_B2U} / CAST(1000000 AS DOUBLE))', 6)} AS b2",
    f"{_rnd(f'(1 - {_SSE} / {_SST})', 4)} AS r2",
]

#: DuckDB point extraction mirrors the PROVEN q_quality_score oracle
#: text (`text.py:177` — hash-green against the Column-API form since
#: r2), then fixes the 6-dp score to exact µunits.  Lambda var is `t`
#: to avoid capturing the x1/x2 aliases.
_OLS_POINTS_SQL = f"""
SELECT CAST(len(toks) AS BIGINT) AS x1,
       CAST(len(list_filter(toks, t -> t IN {_STOPWORDS!r})) AS BIGINT) AS x2,
       CAST(floor(round(0.4 * least(len(toks) / 100.0, 1.0)
           + 0.3 * (1 - n_punct / greatest(n_chars, 1))
           + 0.3 * (len(list_filter(toks, t -> t IN {_STOPWORDS!r})) / greatest(len(toks), 1)), 6)
           * 1000000 + 0.5) AS BIGINT) AS y
FROM (
  SELECT n_chars,
         list_filter(string_split(text, ' '), t -> t <> '') AS toks,
         CAST(len(regexp_extract_all(text, '[^a-z0-9 ]')) AS BIGINT) AS n_punct
  FROM documents
)"""

_OLS_ORACLE = f"""
WITH pts AS ({_OLS_POINTS_SQL}),
g AS (SELECT {", ".join(f"{t} AS {k}" for k, t in _OLS_SUMS.items())} FROM pts)
SELECT {", ".join(_OLS_SELECTS)} FROM g WHERE {_OLS_GUARD}
"""


@register("q_ols_normal", oracle=_OLS_ORACLE)
def q_ols_normal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multivariate OLS via the normal equations, trained wholly
    in-plan: quality ~ b0 + b1·n_tokens + b2·n_stopwords over documents
    (the stopword count varies independently of length, so the gram
    matrix is well-posed; the fixture's punct count is constant-zero and
    would be singular — the det<>0 guard is what caught that).
    The "d small, N huge" regression shape a corpus pipeline needs
    (calibrating a cheap proxy against a scored sample): ONE scan emits
    the d² gram-matrix sums as exact fixed-point integers (map-side
    combinable — the shuffle carries d² numbers, not rows), and
    β = (XᵀX)⁻¹Xᵀy is solved by Cramer's rule as a constant-size
    expression on the single aggregated row — no driver loop, no
    gradient steps, third in-plan-trained model after the NB classifier
    and the unigram LM (`text.py:727,855`).  Per-row products stay
    inside long range (tokens·µquality ≤ ~4e9); sums go through
    DECIMAL(38,0).  The solve text is shared verbatim with the oracle,
    so both engines evaluate the same IEEE tree — conditioning of the
    determinant cancellation is therefore a non-issue for the check
    (both engines get the bit-same answer, whatever its condition
    number)."""
    d = load(spark, sf_dir, "documents")
    toks = F.filter(F.split("text", " "), lambda t: t != "")
    n_stop = F.size(F.filter(toks, lambda t: t.isin(*_STOPWORDS))).cast("long")
    points = d.select(
        F.size(toks).cast("long").alias("x1"),
        n_stop.alias("x2"),
        F.floor(quality_expr_6dp() * 1e6 + 0.5).cast("long").alias("y"),
    )
    g = points.groupBy().agg(*(F.expr(t).alias(k) for k, t in _OLS_SUMS.items()))
    return g.where(F.expr(_OLS_GUARD)).selectExpr(*_OLS_SELECTS)


#: selects for the graph-degree power-law fit (q_degree_powerlaw,
#: operators/graph.py) — same tail, graph-facing names
_POWERLAW_SELECTS = [
    "CAST(n AS BIGINT) AS n_points",
    f"{_rnd(_SLOPE_U, 4)} AS powerlaw_exponent",
    f"{_rnd(f'({_ICEPT_U} / CAST(1000000 AS DOUBLE))', 4)} AS ln_coef",
    f"{_rnd(_R2, 4)} AS r2",
]


#: per-row residual in exact µunits — y is already µ-fixed, the
#: prediction is a shared-text double expression over the (shared,
#: 6-dp-rounded) coefficients, so the floor-quantized residual is
#: bit-identical in both engines
_PRED_RESID = (
    "CAST(floor((CAST(y AS DOUBLE) / 1000000 - (b0 + b1 * x1 + b2 * x2)) "
    "* 1000000 + 0.5) AS BIGINT)"
)

_OLS_POINTS_LANG_SQL = _OLS_POINTS_SQL.replace(
    "SELECT CAST(len(toks) AS BIGINT) AS x1,", "SELECT lang, CAST(len(toks) AS BIGINT) AS x1,"
).replace("  SELECT n_chars,", "  SELECT lang, n_chars,")

_OLS_PREDICT_ORACLE = f"""
WITH pts AS ({_OLS_POINTS_LANG_SQL}),
g AS (SELECT {", ".join(f"{t} AS {k}" for k, t in _OLS_SUMS.items())} FROM pts),
b AS (SELECT {", ".join(_OLS_SELECTS[1:4])} FROM g WHERE {_OLS_GUARD}),
scored AS (SELECT pts.lang, {_PRED_RESID} AS r FROM pts, b)
SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
       {_rnd("CAST(sum(abs(r)) AS DOUBLE) / 1000000 / count(*)", 6)} AS mae,
       CAST(max(abs(r)) AS BIGINT) AS max_abs_err_micro,
       {_rnd("CAST(sum(r) AS DOUBLE) / 1000000 / count(*)", 6)} AS bias
FROM scored GROUP BY lang
"""


@register("q_ols_predict", oracle=_OLS_PREDICT_ORACLE)
def q_ols_predict(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train-then-serve in ONE DAG: the q_ols_normal coefficients
    (gram-sums pass + in-plan Cramer solve) broadcast back onto the
    corpus, every document scored ŷ = b0 + b1·x1 + b2·x2, and the
    µ-quantized residuals rolled up per language (n, MAE, max |err|,
    signed bias) — the calibration-diagnostics shape of a proxy-model
    deployment (score a cheap heuristic everywhere, report where it
    drifts).  Two passes over documents (one for the d² training sums,
    one to score) and a 1-row coefficient broadcast between them — at
    100 TB the trained row is what you'd persist; the scoring pass is
    embarrassingly map-side.  The residual is exact µunit integers
    (shared-text prediction over shared 6-dp coefficients), so every
    per-lang stat is order-proof."""
    d = load(spark, sf_dir, "documents")
    toks = F.filter(F.split("text", " "), lambda t: t != "")
    n_stop = F.size(F.filter(toks, lambda t: t.isin(*_STOPWORDS))).cast("long")
    points = d.select(
        "lang",
        F.size(toks).cast("long").alias("x1"),
        n_stop.alias("x2"),
        F.floor(quality_expr_6dp() * 1e6 + 0.5).cast("long").alias("y"),
    ).localCheckpoint(eager=True)  # scanned twice: training sums + scoring
    g = points.groupBy().agg(*(F.expr(t).alias(k) for k, t in _OLS_SUMS.items()))
    b = g.where(F.expr(_OLS_GUARD)).selectExpr(*_OLS_SELECTS[1:4])
    scored = points.crossJoin(F.broadcast(b)).selectExpr("lang", f"{_PRED_RESID} AS r")
    return scored.groupBy("lang").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.expr(_rnd("CAST(sum(abs(r)) AS DOUBLE) / 1000000 / count(*)", 6)).alias("mae"),
        F.max(F.abs(F.col("r"))).cast("long").alias("max_abs_err_micro"),
        F.expr(_rnd("CAST(sum(r) AS DOUBLE) / 1000000 / count(*)", 6)).alias("bias"),
    )


#: retention-decay selects: y is micro-nat ln(pooled retention), x is the
#: raw week offset, so slope_u/1e6 is nats/week; half-life = ln 2 / -slope
#: (NULL when retention isn't decaying — a fit, not a wish)
_DECAY_SLOPE = f"({_SLOPE_U} / CAST(1000000 AS DOUBLE))"
_RETENTION_SELECTS = [
    "CAST(n AS BIGINT) AS n_points",
    f"{_rnd(_DECAY_SLOPE, 6)} AS decay_per_week",
    f"{_rnd(f'({_ICEPT_U} / CAST(1000000 AS DOUBLE))', 4)} AS intercept",
    f"{_rnd(_R2, 4)} AS r2",
    f"CASE WHEN {_DECAY_SLOPE} >= 0 THEN NULL ELSE {_rnd(f'(ln(2) / (0 - {_DECAY_SLOPE}))', 4)} END AS half_life_weeks",
]


def _retention_points_sql() -> str:
    from .aggregates import _WEEK_DUCK

    wk = _WEEK_DUCK.format(ts="e.ts")
    wk_first = _WEEK_DUCK.format(ts="first_ts")
    return f"""
  SELECT CAST(week_offset AS BIGINT) AS x,
         {_micro_ln("CAST(a AS DOUBLE) / b")} AS y
  FROM (
    SELECT act.week_offset, count(DISTINCT act.user_id) AS a,
           (SELECT count(*) FROM (SELECT user_id FROM events GROUP BY user_id) u) AS b
    FROM (
      SELECT c.cohort_week, {wk} - c.cohort_week AS week_offset, e.user_id
      FROM events e JOIN (
        SELECT user_id, {wk_first} AS cohort_week
        FROM (SELECT user_id, min(ts) AS first_ts FROM events GROUP BY user_id)
      ) c ON e.user_id = c.user_id
    ) act
    WHERE act.week_offset > 0
    GROUP BY act.week_offset
  ) WHERE a > 0"""


@register(
    "q_retention_decay",
    oracle=lambda sf_dir: f"""
WITH pts AS ({_retention_points_sql()}),
g AS (SELECT {", ".join(f"{t} AS {k}" for k, t in _SUMS.items())} FROM pts)
SELECT {", ".join(_RETENTION_SELECTS)} FROM g WHERE {_GUARD}
""",
)
def q_retention_decay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponential retention-decay fit — the summary number a growth
    team quotes from the q_cohort_retention matrix: pooled retention
    per week offset (distinct returning users over the full user base,
    offsets > 0), fit ln(retention) ~ offset by the shared exact-sums
    OLS tail, reported as decay/week, r², and half-life (NULL unless
    actually decaying).  Composition: the cohort family's integral
    week bucketing (aggregates._WEEK_SPARK — shared text with the
    cohort oracle) + the regression family's shared-SQL-text fit;
    shape is two combinable aggs + a ≤(weeks)-row fit input, nothing
    scales past the first exchange."""
    from .aggregates import _WEEK_SPARK

    e = load(spark, sf_dir, "events")
    first_ev = e.groupBy("user_id").agg(F.min("ts").alias("first_ts"))
    cohort = first_ev.selectExpr(
        "user_id", f"{_WEEK_SPARK.format(ts='first_ts')} AS cohort_week"
    )
    act = e.join(cohort, "user_id").selectExpr(
        "user_id", f"{_WEEK_SPARK.format(ts='ts')} - cohort_week AS week_offset"
    ).where(F.col("week_offset") > 0)
    n_users = e.select("user_id").distinct().count()
    pooled = act.groupBy("week_offset").agg(
        F.countDistinct("user_id").alias("a")
    ).where(F.col("a") > 0)
    points = pooled.selectExpr(
        "CAST(week_offset AS BIGINT) AS x",
        f"{_micro_ln(f'CAST(a AS DOUBLE) / {n_users}')} AS y",
    )
    return _fit(points, [], _RETENTION_SELECTS)


_FC_HOLDOUT = 7  # holdout horizon: the trailing week

#: shared texts: half-up integer division for the micro-forecast and the
#: closing MAE ratio — all inputs exact longs
_FC_FORECAST = "CAST((2 * num * 1000000 + den) DIV (2 * den) AS BIGINT)"
_FC_MAE = (
    "(CAST(floor((CAST(sum_err AS DOUBLE) / nh / 1000000) * 1000000 + 0.5) AS DOUBLE)"
    " / 1000000)"
)


@register(
    "q_forecast_eval",
    oracle=f"""
WITH daily AS (
  SELECT event_type,
         CAST(floor(epoch(date_trunc('day', ts)) / 86400) AS BIGINT) AS day,
         count(*) AS c
  FROM events GROUP BY event_type, day
),
horizon AS (SELECT max(day) AS maxd FROM daily),
train AS (
  SELECT event_type, day % 7 AS wd, CAST(sum(c) AS BIGINT) AS num,
         CAST(count(*) AS BIGINT) AS den
  FROM daily, horizon WHERE day <= maxd - {_FC_HOLDOUT}
  GROUP BY event_type, day % 7
),
hold AS (
  SELECT event_type, day, day % 7 AS wd, c
  FROM daily, horizon WHERE day > maxd - {_FC_HOLDOUT}
),
err AS (
  SELECT hold.event_type,
         abs(hold.c * 1000000 - {_FC_FORECAST.replace("DIV", "//")}) AS e
  FROM hold JOIN train ON hold.event_type = train.event_type AND hold.wd = train.wd
)
SELECT event_type, CAST(count(*) AS BIGINT) AS n_days,
       CAST(sum(e) AS BIGINT) AS sum_err_micro,
       CAST(max(e) AS BIGINT) AS max_err_micro,
       {_FC_MAE.replace("sum_err", "sum(e)").replace("nh", "count(*)")} AS mae
FROM err GROUP BY event_type
""",
)
def q_forecast_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonal-naive forecast backtest over daily event volumes: hold
    out the trailing {h} days, forecast each holdout day as the mean
    train-day count of the SAME weekday (epoch-day % 7 — an integer
    weekday both engines compute identically, no calendar functions),
    and report per-type MAE + worst miss — the standard capacity-
    planning baseline every fancier forecaster must beat, and the
    volume-anomaly gate for ingest (an actual day far off its seasonal
    forecast is a source incident; composes with q_cusum_changepoint).
    Exact: the rational train mean never materializes — the forecast
    is half-up integer division in micro units (2*num*1e6 + den) //
    (2*den), errors are exact micro longs, the closing MAE divide is
    shared text.  Shape: one combinable daily agg, a 1-row horizon
    scalar, a (type x 7)-row train table broadcast into the {h}-day
    holdout — nothing scales past the daily rollup.""".replace(
        "{h}", str(_FC_HOLDOUT)
    )
    e = load(spark, sf_dir, "events")
    daily = e.groupBy(
        "event_type",
        F.floor(F.unix_timestamp(F.date_trunc("DAY", F.col("ts"))) / 86400)
        .cast("long")
        .alias("day"),
    ).agg(F.count(F.lit(1)).alias("c")).localCheckpoint(eager=True)  # feeds horizon+train+hold
    horizon = daily.agg(F.max("day").alias("maxd"))
    with_h = daily.crossJoin(F.broadcast(horizon))
    train = (
        with_h.where(F.col("day") <= F.col("maxd") - _FC_HOLDOUT)
        .groupBy("event_type", (F.col("day") % 7).alias("wd"))
        .agg(F.sum("c").cast("long").alias("num"), F.count(F.lit(1)).cast("long").alias("den"))
    )
    hold = with_h.where(F.col("day") > F.col("maxd") - _FC_HOLDOUT).select(
        "event_type", "day", (F.col("day") % 7).alias("wd"), "c"
    )
    err = hold.join(F.broadcast(train), ["event_type", "wd"]).selectExpr(
        "event_type", f"abs(c * 1000000 - {_FC_FORECAST}) AS e"
    )
    return err.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_days"),
        F.sum("e").cast("long").alias("sum_err_micro"),
        F.max("e").cast("long").alias("max_err_micro"),
        F.expr(
            _FC_MAE.replace("sum_err", "sum(e)").replace("nh", "count(*)")
        ).alias("mae"),
    )


# ------------------------------------------------------------- Heaps' law

_HEAPS_SELECTS = [
    "CAST(n AS BIGINT) AS n_points",
    f"{_rnd(_SLOPE_U, 4)} AS heaps_beta",
    f"{_rnd(f'({_ICEPT_U} / CAST(1000000 AS DOUBLE))', 4)} AS ln_k",
    f"{_rnd(_R2, 4)} AS r2",
]

_HEAPS_POINTS_SQL = f"""
SELECT {_micro_ln("CAST(ct AS DOUBLE)")} AS x, {_micro_ln("CAST(cv AS DOUBLE)")} AS y
FROM (
  SELECT tk.doc_id,
         sum(tk.n_tokens) OVER (ORDER BY tk.doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ct,
         sum(coalesce(nw.new_words, 0)) OVER (ORDER BY tk.doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cv
  FROM (
    SELECT doc_id, count(*) AS n_tokens
    FROM (SELECT doc_id, unnest(list_filter(string_split(text, ' '), t -> t <> '')) AS word
          FROM documents) GROUP BY doc_id
  ) tk
  LEFT JOIN (
    SELECT fdoc AS doc_id, count(*) AS new_words
    FROM (SELECT word, min(doc_id) AS fdoc
          FROM (SELECT doc_id, unnest(list_filter(string_split(text, ' '), t -> t <> '')) AS word
                FROM documents) GROUP BY word)
    GROUP BY fdoc
  ) nw ON tk.doc_id = nw.doc_id
)
"""


@register("q_heaps_fit", oracle=_fit_sql(_HEAPS_POINTS_SQL, [], _HEAPS_SELECTS))
def q_heaps_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heaps'-law vocabulary-growth fit: V(n) = K·n^β — distinct
    vocabulary as a function of tokens read, in corpus doc_id order —
    the diagnostic that sizes tokenizer vocabularies and predicts
    OOV/UNK rates before training (natural text fits β ≈ 0.4–0.6; the
    operator reports the corpus as it is, q_zipf_fit's honesty rule).

    Exact inputs: per-doc token counts and NEW-word counts (each word
    charged to its min-doc_id first appearance — a total attribution),
    two prefix sums over the per-doc rollup, micro-nat ln points, the
    shared exact-sum OLS tail (`_fit` / `_SUMS`).  Scale shape: two
    map-side-combinable corpus aggs (token counts, first-appearance),
    then everything runs on the DOCS-sized rollup; the prefix sums are
    one ordered window over that rollup — at extreme doc counts
    q_heaps_fit_scalable computes the SAME sums through the two-pass
    scan (no single-partition window); the fit ships d² integer sums
    regardless of N."""
    from pyspark.sql.window import Window

    win = Window.orderBy("doc_id").rowsBetween(Window.unboundedPreceding, 0)
    cum = _heaps_per_doc(spark, sf_dir).select(
        "doc_id",
        F.sum("n_tokens").over(win).alias("ct"),
        F.sum("new_words").over(win).alias("cv"),
    )
    return _heaps_close(cum)


def _heaps_per_doc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc token and first-appearance-word counts (the combinable
    corpus pass both Heaps forms share)."""
    d = load(spark, sf_dir, "documents")
    words = d.select(
        "doc_id", F.explode(F.split("text", " ")).alias("word")
    ).where(F.col("word") != "")
    tk = words.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_tokens"))
    nw = (
        words.groupBy("word")
        .agg(F.min("doc_id").alias("doc_id"))
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("new_words"))
    )
    return tk.join(nw, "doc_id", "left").select(
        "doc_id", "n_tokens", F.coalesce("new_words", F.lit(0)).alias("new_words")
    )


def _heaps_close(cum: DataFrame) -> DataFrame:
    """Micro-nat log points + the shared exact-sum OLS tail."""
    points = cum.selectExpr(
        f"{_micro_ln('CAST(ct AS DOUBLE)')} AS x",
        f"{_micro_ln('CAST(cv AS DOUBLE)')} AS y",
    )
    return _fit(points, [], _HEAPS_SELECTS)


@register("q_heaps_fit_scalable", oracle=_fit_sql(_HEAPS_POINTS_SQL, [], _HEAPS_SELECTS))
def q_heaps_fit_scalable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q_heaps_fit with the global ordered window replaced by ONE
    distributed two-pass prefix scan carrying BOTH running sums
    (functions/scan.py extra_sums — VERDICT r11 item 2): range-partition
    the docs rollup on doc_id, local cumsums per partition, tiny
    per-partition totals → driver → base offsets broadcast back.
    Bit-identical to the window form for any range-boundary placement
    (same oracle registered), and no stage sorts more than
    |docs| / n_partitions rows."""
    from ..functions.scan import two_pass_scan

    cum, _, _ = two_pass_scan(
        _heaps_per_doc(spark, sf_dir),
        [F.asc("doc_id")],
        sum_col="n_tokens",
        cum_col="ct",
        extra_sums=[("new_words", "cv")],
        inclusive=True,
    )
    return _heaps_close(cum.select("doc_id", "ct", "cv"))
