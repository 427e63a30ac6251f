"""Distributed k-means as a first-class, ORACLE-CHECKED operator
(VERDICT r8 item 3) — the clustering primitive the similarity family was
missing (q_ann_ivf trains its coarse quantizer with k-means; q_kmeans is
the same algorithm promoted to a query with a DuckDB oracle).

Oracle-checkability recipe (the q_pagerank treatment, graph.py:22):
fixed iteration count, a deterministic in-plan init (no RNG: centroid c
starts as the per-dimension mean of the points with vec_id % k == c),
per-iteration 12-dp rounding of BOTH the centroid coordinates and the
squared distances — so different summation orders across engines cannot
drift — and a deterministic argmin tie-break on (dist, cluster).  The
whole fixed-point loop then unrolls into chained DuckDB CTEs that must
reproduce Spark's assignments bit-for-bit.

Scale shape (the canonical distributed Lloyd, Spark-first):

- ASSIGNMENT is shuffle-free: the k centroids collapse to a single
  broadcast row (array<struct<cl, cv>>), and each point computes its
  argmin NARROWLY with JVM higher-order functions — array_min over
  transform(centroids, c -> struct(round(Σ(x−c)², 12), c.cl)) with the
  inner sum a zip_with/aggregate fold.  No n×k join materialization, no
  per-point shuffle, no Python.
- UPDATE is one map-side-combinable hash agg: posexplode the assigned
  vectors to (cluster, dim, x) and avg — partial aggregation reduces
  each partition to ≤ k·d rows before the exchange, so per-iteration
  shuffle is O(k·d·partitions), independent of n.  Empty clusters keep
  their previous centroid (left-join coalesce), mirroring the oracle.
- The loop state (k·d centroid rows) is localCheckpoint'ed each
  iteration — the PageRank lineage-truncation discipline; at 1000
  executors swap for .checkpoint() cadence exactly as graph.pagerank's
  checkpoint_every knob documents.

Cross-engine fp note: embeddings are unit-norm (values O(1), distances
≤ 4), so the 12-dp quantum sits ~100× above the ~d·eps ≈ 1.4e-14
worst-case summation-order divergence — same argument, tighter margin
accounting, as PageRank's 1/N-scaled ranks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..sources import load

_KM_K = 8  # clusters
_KM_ITERS = 4  # fixed Lloyd iterations (assignment count; 3 centroid updates)
_KM_DIMS = 64  # embedding dimensionality (all fixtures; oracle constant)


def _half_up(col, dp: int):
    """Half-up rounding as pure IEEE arithmetic — the repo's shared
    numeric policy (regression.py `_rnd`): never engine-native
    ``round()``, whose .5 behavior differs between Spark (HALF_UP on
    the decimal repr) and DuckDB (banker's on doubles); a value landing
    on a representable .5 boundary would flip one assignment and
    cascade through every later Lloyd iteration (ADVICE r9).  Operand
    magnitudes here (unit-norm coords ≤ 1, squared dists ≤ 4) keep
    x·10^dp ≤ 4e12 ≪ 2^53, so the floor text is exact in both engines."""
    s = float(10**dp)
    return F.floor(col * F.lit(s) + F.lit(0.5)).cast("double") / F.lit(s)


def _half_up_sql(expr: str, dp: int) -> str:
    """The identical half-up text for the DuckDB oracle (same IEEE ops,
    same literals — bit-identical by construction)."""
    s = 10**dp
    return f"(CAST(floor(({expr}) * {s}.0 + 0.5) AS DOUBLE) / {s}.0)"


def _allc(cents: DataFrame) -> DataFrame:
    """k·d centroid rows → k rows of (cl, cv array) → ONE broadcast row
    (array<struct<cl, cv>> sorted by cl)."""
    return (
        cents.groupBy("cl")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("d", "cx"))), lambda s: s["cx"]
            ).alias("cv")
        )
        .agg(F.array_sort(F.collect_list(F.struct("cl", "cv"))).alias("cents"))
    )


def _euclid_best():
    """Narrow argmin over the broadcast centroid row: struct ordering =
    (dist asc, cl asc) tie-break, dist = half-up-12dp Σ(x−c)²."""
    return F.array_min(
        F.transform(
            F.col("cents"),
            lambda c: F.struct(
                _half_up(
                    F.aggregate(
                        F.zip_with(F.col("v"), c["cv"], lambda x, cc: (x - cc) * (x - cc)),
                        F.lit(0.0),
                        lambda a, x: a + x,
                    ),
                    12,
                ).alias("dist"),
                c["cl"].alias("cl"),
            ),
        )
    )


def _assign(points: DataFrame, cents: DataFrame) -> DataFrame:
    """One shuffle-free assignment pass: (vec_id, v, cluster, dist)."""
    return (
        points.crossJoin(F.broadcast(_allc(cents)))
        .select("vec_id", "v", _euclid_best().alias("m"))
        .select("vec_id", "v", F.col("m.cl").alias("cluster"), F.col("m.dist").alias("dist"))
    )


def lloyd_cents(points: DataFrame, k: int, updates: int) -> DataFrame:
    """The ORACLE-CHECKABLE centroid evolution (shared by q_kmeans and
    q_ann_ivf_assign): deterministic vec_id%k-mean init, then ``updates``
    Lloyd update rounds, each = one shuffle-free Euclid-argmin assignment
    + one map-side-combinable (cl, dim) avg with half-up-12dp rounding;
    empty clusters keep their previous centroid.  Returns the (cl, d,
    cx) centroid state — k·d rows, localCheckpoint'ed per round."""
    # init: centroid c = per-dim mean of the vec_id % k == c points
    cents = (
        points.select(
            F.pmod("vec_id", F.lit(k)).alias("cl"), F.posexplode("v").alias("d", "x")
        )
        .groupBy("cl", "d")
        .agg(_half_up(F.avg("x"), 12).alias("cx"))
        .localCheckpoint(eager=True)
    )
    for _ in range(updates):
        assigned = _assign(points, cents)
        ncents = (
            assigned.select(F.col("cluster").alias("cl"), F.posexplode("v").alias("d", "x"))
            .groupBy("cl", "d")
            .agg(_half_up(F.avg("x"), 12).alias("ncx"))
        )
        cents = (
            cents.join(ncents, ["cl", "d"], "left")
            .select("cl", "d", F.coalesce("ncx", "cx").alias("cx"))
            .localCheckpoint(eager=True)
        )
    return cents


def kmeans_assignments(points: DataFrame, k: int = _KM_K, iters: int = _KM_ITERS) -> DataFrame:
    """Fixed-iteration deterministic Lloyd over ``points`` (vec_id,
    v: array<double>) → (vec_id, cluster, dist) after ``iters``
    assignment rounds (= iters−1 updates + one final assignment).  See
    the module docstring for the determinism contract and the
    per-iteration plan shape.

    r12 (guide §5: persist when reuse beats recompute): the points feed
    FIVE passes (init + 3 update assignments + the final assignment) —
    materialize them once instead of re-running the parquet scan +
    cast-transform per pass; the kmeans_centroids_frame trainer already
    followed this discipline (clustering.py:189), this aligns the
    oracle-checked path."""
    pts = points.localCheckpoint(eager=True)
    assigned = _assign(pts, lloyd_cents(pts, k, iters - 1))
    return assigned.select("vec_id", "cluster", _half_up(F.col("dist"), 6).alias("dist"))


def kmeans_centroids_frame(points: DataFrame, k: int, rounds: int) -> DataFrame:
    """Distributed Lloyd returning the k centroids themselves — (cl,
    cv: array<double>) rows — for use as a TRAINER (q_ann_ivf's level-1
    coarse quantizer, VERDICT r8 item 3: the last driver-side training
    loop, re-pointed here at a dataflow loop).

    Same per-iteration plan shape as kmeans_assignments (broadcast-row
    shuffle-free assignment, map-side-combinable (cl, dim) update agg,
    k·d-row localCheckpoint'ed state), but trainer semantics instead of
    the oracle contract:

    - init = the k lexicographically-smallest DISTINCT (9-dp-rounded)
      vectors — the same deterministic choice as the driver trainer
      (_kmeans_fit takes np.unique's first k rows, and np.unique sorts
      rows ascending-lexicographic), so the two trainers start from the
      same seeds;
    - assignment metric is the norm-invariant ‖c‖² − 2x·c (matching
      _kmeans_fit's BLAS identity), 12-dp-rounded with (d2, cl)
      tie-break for run-to-run determinism;
    - clusters that go empty KEEP their previous centroid (left-join
      coalesce).  The driver trainer instead re-seeds empties to
      worst-covered distinct points; with distinct-point init every
      seed starts on a real point, and the measured effect of carrying
      instead of re-seeding is within the ANN recall tolerance
      (ANN_RECALL.md re-run, ±0.02 bar) — re-seeding is a top-|empty|
      sort away if a future geometry needs it.

    Scale: assignment is narrow over n points; the update exchanges
    ≤ k·d rows per partition.  Nothing driver-side anywhere in the
    loop; callers collect only the final k×d centroid matrix."""
    from pyspark.sql import Window

    pts = points.select("v").localCheckpoint(eager=True)
    cents = (
        pts.select(F.transform("v", lambda x: _half_up(x, 9)).alias("cv"))
        .dropDuplicates(["cv"])
        .orderBy("cv")
        .limit(k)
        .select((F.row_number().over(Window.orderBy("cv")) - 1).alias("cl"), "cv")
        .localCheckpoint(eager=True)
    )
    for _ in range(rounds):
        allc = cents.agg(F.array_sort(F.collect_list(F.struct("cl", "cv"))).alias("cents"))

        def d2(c):
            cn2 = F.aggregate(c["cv"], F.lit(0.0), lambda a, x: a + x * x)
            dot = F.aggregate(
                F.zip_with(F.col("v"), c["cv"], lambda x, cc: x * cc),
                F.lit(0.0),
                lambda a, x: a + x,
            )
            return _half_up(cn2 - 2.0 * dot, 12)

        best = F.array_min(
            F.transform(F.col("cents"), lambda c: F.struct(d2(c).alias("d"), c["cl"].alias("cl")))
        )
        ncents = (
            pts.crossJoin(F.broadcast(allc))
            .select(best["cl"].alias("cl"), "v")
            .select("cl", F.posexplode("v").alias("d", "x"))
            .groupBy("cl", "d")
            .agg(_half_up(F.avg("x"), 12).alias("cx"))
            .groupBy("cl")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("d", "cx"))), lambda s: s["cx"]
                ).alias("ncv")
            )
        )
        cents = (
            cents.join(ncents, "cl", "left")
            .select("cl", F.coalesce("ncv", "cv").alias("cv"))
            .localCheckpoint(eager=True)
        )
    return cents


def _sql_lloyd_ctes(k: int, updates: int, dims: int = _KM_DIMS) -> list[str]:
    """The oracle-checkable Lloyd centroid evolution as DuckDB CTEs
    (mirrors ``lloyd_cents``): p (points), c0 (vec_id%k-mean init), then
    per update round l{i} (centroid lists), a{i} (Euclid argmin
    assignment), n{i} (new means), c{i} (coalesce carry for empty
    clusters) — ending with l{updates+1}, the final centroid lists.
    Multi-referenced CTEs are AS MATERIALIZED (the q_triangle_count
    lesson: DuckDB re-inlines by default and can mis-plan the repeated
    subtrees).  All rounding is the shared half-up floor-text
    (_half_up_sql), never engine-native round() — ADVICE r9.  Shared by
    q_kmeans and q_ann_ivf_assign's oracles."""
    sq = f"(p.v[t+1] - c.cv[t+1]) * (p.v[t+1] - c.cv[t+1])"
    cx12 = _half_up_sql("avg(p.v[g.d + 1])", 12)
    dist12 = _half_up_sql(f"list_sum(list_transform(range({dims}), t -> {sq}))", 12)
    ctes = [
        """p AS MATERIALIZED (
  SELECT vec_id, list_transform(embedding, e -> e::DOUBLE) AS v FROM embeddings
)""",
        f"""c0 AS MATERIALIZED (
  SELECT vec_id % {k} AS cl, g.d, {cx12} AS cx
  FROM p, (SELECT unnest(range({dims})) AS d) g
  GROUP BY cl, g.d
)""",
    ]
    for i in range(1, updates + 2):
        ctes.append(
            f"""l{i} AS (SELECT cl, list(cx ORDER BY d) AS cv FROM c{i - 1} GROUP BY cl)"""
        )
        if i > updates:
            break
        ctes.append(
            f"""a{i} AS MATERIALIZED (
  SELECT p.vec_id, c.cl,
         {dist12} AS dist
  FROM p, l{i} c
  QUALIFY row_number() OVER (PARTITION BY p.vec_id ORDER BY dist, c.cl) = 1
)"""
        )
        ctes.append(
            f"""n{i} AS (
  SELECT a.cl, g.d, {cx12} AS cx
  FROM a{i} a JOIN p ON a.vec_id = p.vec_id, (SELECT unnest(range({dims})) AS d) g
  GROUP BY a.cl, g.d
)""",
        )
        ctes.append(
            f"""c{i} AS MATERIALIZED (
  SELECT o.cl, o.d, coalesce(n.cx, o.cx) AS cx
  FROM c{i - 1} o LEFT JOIN n{i} n ON o.cl = n.cl AND o.d = n.d
)"""
        )
    return ctes


def _sql_kmeans(k: int = _KM_K, iters: int = _KM_ITERS, dims: int = _KM_DIMS) -> str:
    """q_kmeans oracle: the Lloyd chain (iters−1 updates) plus one final
    Euclid-argmin assignment — identical text per round to the pre-split
    form (the chain builder emits the same CTEs)."""
    sq = f"(p.v[t+1] - c.cv[t+1]) * (p.v[t+1] - c.cv[t+1])"
    dist12 = _half_up_sql(f"list_sum(list_transform(range({dims}), t -> {sq}))", 12)
    ctes = _sql_lloyd_ctes(k, iters - 1, dims)
    ctes.append(
        f"""a{iters} AS MATERIALIZED (
  SELECT p.vec_id, c.cl,
         {dist12} AS dist
  FROM p, l{iters} c
  QUALIFY row_number() OVER (PARTITION BY p.vec_id ORDER BY dist, c.cl) = 1
)"""
    )
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"""
SELECT vec_id, cl AS cluster, {_half_up_sql("dist", 6)} AS dist FROM a{iters}
"""
    )


@register("q_kmeans", oracle=_sql_kmeans())
def q_kmeans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-means over the embeddings table (k=8, 4 fixed Lloyd
    iterations), returning every vector's final cluster and 6-dp squared
    distance — ORACLE-CHECKED against the same loop unrolled into DuckDB
    CTEs (see module docstring for the determinism contract and the
    shuffle-free-assignment / map-side-combinable-update plan shape)."""
    pts = load(spark, sf_dir, "embeddings").select(
        "vec_id", F.transform("embedding", lambda e: e.cast("double")).alias("v")
    )
    return kmeans_assignments(pts)


_PCA_ITERS = 8  # fixed power-iteration unroll (fixture settles in <=6)
_PCA_DIMS = 64
_V_SCALE = 1_000_000_000_000  # iterate at 1e-12 max-norm fixed point
_G_DIV = 1_000_000  # gram re-scale: 1e12-scale exact sums -> 1e6 scale


def _tdiv(a: int, b: int) -> int:
    """Truncate-toward-zero integer division — Python's // floors, but
    Spark's `div` and DuckDB's `//` both truncate; the driver-side
    iteration must match them on negative numerators."""
    q = abs(a) // b
    return q if (a >= 0) == (b >= 0) else -q


def _pca_sql(iters: int = _PCA_ITERS) -> str:
    """The identical fixed-point power iteration unrolled into DuckDB
    CTEs: exact-integer gram (quantized inputs), max-norm re-scaling by
    truncating division each round — no doubles anywhere inside the
    loop, so there is NOTHING to drift (HUGEINT headroom: |y|·1e12 ≈
    N·1e6·1e12·64·... tops out ~1e36 at 4M vectors vs 1.7e38)."""
    ctes = [
        f"""coo AS MATERIALIZED (
  SELECT vec_id, d,
         CAST(floor(CAST(embedding[d + 1] AS DOUBLE) * 1000000 + 0.5) AS BIGINT) AS xi
  FROM embeddings, (SELECT unnest(range({_PCA_DIMS})) AS d) g
),
gq AS MATERIALIZED (
  SELECT a.d AS i, b.d AS j, sum(a.xi * b.xi) // {_G_DIV} AS g
  FROM coo a JOIN coo b ON a.vec_id = b.vec_id
  GROUP BY a.d, b.d
),
v0 AS (SELECT d AS i, CAST({_V_SCALE // 8} AS HUGEINT) AS v
       FROM (SELECT unnest(range({_PCA_DIMS})) AS d))"""
    ]
    for t in range(1, iters + 1):
        ctes.append(
            f"""y{t} AS MATERIALIZED (
  SELECT gq.i, sum(gq.g * v{t - 1}.v) AS y
  FROM gq JOIN v{t - 1} ON gq.j = v{t - 1}.i GROUP BY gq.i
),
v{t} AS MATERIALIZED (
  SELECT i, (y * {_V_SCALE}) // (SELECT max(abs(y)) FROM y{t}) AS v FROM y{t}
)"""
        )
    last = f"v{iters}"
    return (
        "WITH "
        + ",\n".join(ctes)
        + f""",
sgn AS (
  SELECT CASE WHEN (SELECT v FROM {last}
                    WHERE abs(v) = (SELECT max(abs(v)) FROM {last})
                    ORDER BY i LIMIT 1) < 0 THEN -1 ELSE 1 END AS s
),
vq AS (SELECT i, v // {_G_DIV} AS q FROM {last}),
lam AS (
  SELECT (SELECT sum(gq.g * a.q * b.q)
          FROM gq JOIN vq a ON gq.i = a.i JOIN vq b ON gq.j = b.i)
         // (SELECT sum(q * q) FROM vq) AS l
)
SELECT CAST({last}.i AS BIGINT) AS d,
       CAST({last}.v * sgn.s AS DOUBLE) / {_V_SCALE} AS loading,
       CAST(lam.l AS DOUBLE) / {_G_DIV} AS eigval
FROM {last}, sgn, lam
"""
    )


@register("q_pca_power", oracle=_pca_sql())
def q_pca_power(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top principal direction of the embeddings via power iteration on
    the gram matrix — the whitening / dominant-axis primitive a 100 TB
    embedding pipeline runs before indexing (variance diagnostics,
    mean-centering checks, spectral pre-conditioning).  Two-phase, the
    distributed-Lloyd pattern: (1) the DATA-scale work — G = ΣxxᵀDone —
    runs as one mapInPandas pass emitting per-Arrow-batch partial outer
    products (d² rows per batch, exact integer entries from 1e-6-
    quantized inputs) + one combinable (i,j) agg, so the shuffle is
    O(batches·d²), never O(N·d²) COO-join rows and never an N×N
    anything; (2) the O(d²) power loop on the collected 64×64 gram runs
    driver-side in EXACT INTEGER arithmetic (max-norm re-scaling by
    truncate-division each round — matching Spark `div` / DuckDB `//`
    semantics on negatives), so the unrolled-CTE oracle reproduces it
    bit-for-bit with no fp anywhere inside the loop.  Sign is
    canonicalized (the max-|loading| component made positive, lowest
    index breaking ties); the Rayleigh eigenvalue closes the result.
    Returns (d, loading, eigval) — 64 rows.

    Convergence honesty: power iteration converges at (λ2/λ1)^t, and
    the fixture spectrum is near-flat (λ1/λ2 ≈ 1.02–1.07), so 8 rounds
    land INSIDE the dominant subspace rather than on the exact top
    eigenvector — the deliverable is the refined axis + its Rayleigh
    variance, measured ≥ 0.90·λ1 at every SF (tests pin it against
    numpy eigh).  Exact top-eigvec on a gap-free spectrum needs a
    different algorithm class (block Krylov / shift-invert), not more
    of these rounds; the ORACLE contract (bit-equality of the fixed
    budget) is unconditional either way."""
    import numpy as np
    import pandas as pd

    def gram_partials(batches):
        for pdf in batches:
            M = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
            Mi = np.floor(M * 1e6 + 0.5)  # exact ints as doubles
            G = Mi.T @ Mi  # (64, 64); entries < 2^53 per batch
            ii, jj = np.meshgrid(np.arange(_PCA_DIMS), np.arange(_PCA_DIMS), indexing="ij")
            yield pd.DataFrame(
                {"i": ii.ravel(), "j": jj.ravel(), "p": G.ravel().astype(np.int64)}
            )

    e = load(spark, sf_dir, "embeddings").select("embedding")
    g = (
        e.mapInPandas(gram_partials, "i int, j int, p long")
        .groupBy("i", "j")
        .agg(F.sum("p").alias("g"))
        .selectExpr("i", "j", f"g div {_G_DIV} AS g")
    )
    rows = g.collect()  # bounded: d² = 4096 rows, the kmeans-collect pattern
    G = {}
    for r in rows:
        G[(r["i"], r["j"])] = int(r["g"])
    v = [_V_SCALE // 8] * _PCA_DIMS
    for _ in range(_PCA_ITERS):
        y = [sum(G[(i, j)] * v[j] for j in range(_PCA_DIMS)) for i in range(_PCA_DIMS)]
        m = max(abs(t) for t in y)
        if m == 0:
            raise AssertionError("q_pca_power: zero gram — degenerate fixture")
        v = [_tdiv(t * _V_SCALE, m) for t in y]
    mx = max(abs(t) for t in v)
    s = -1 if next(t for t in v if abs(t) == mx) < 0 else 1
    vq = [_tdiv(t, _G_DIV) for t in v]
    num = sum(G[(i, j)] * vq[i] * vq[j] for i in range(_PCA_DIMS) for j in range(_PCA_DIMS))
    den = sum(q * q for q in vq)
    lam = _tdiv(num, den)
    out = [(int(i), float(v[i] * s) / _V_SCALE, float(lam) / _G_DIV) for i in range(_PCA_DIMS)]
    return spark.createDataFrame(out, "d long, loading double, eigval double")
