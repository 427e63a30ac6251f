"""Join family over the star schema (SURVEY.md §2.3 "Joins").

Spark-first choices, with the 100 TB posture called out per query:
- tiny dims are broadcast (`F.broadcast`) — no shuffle of the fact side;
- the orders⋈lineitem equi-join is a plain shuffle join on the key Spark
  sort-merges (AQE picks SMJ vs shuffled-hash at runtime);
- the 1-hour range join is hour-bucketed (explode each left row into its
  two candidate buckets, equi-join on the bucket, then apply the range
  predicate) so it stays an equi-join at scale instead of a broadcast
  nested-loop O(n²) — the standard interval-bucketing trick;
- the as-of join is the single-pass union+window form: one global sort
  per user partition, no row-vs-row join at all.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.numeric import dec_sum, sql_dec_sum
from ..registry import register
from ..sources import load


@register(
    "q_join_broadcast",
    oracle="""
SELECT n.n_nationkey AS n_nationkey, n.n_name AS n_name, r.r_name AS r_name
FROM nation n JOIN region r ON n.n_regionkey = r.r_regionkey
""",
)
def q_join_broadcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Broadcast hash join of two tiny dims (nation ⋈ region)."""
    nation = load(spark, sf_dir, "nation")
    region = load(spark, sf_dir, "region")
    return nation.join(F.broadcast(region), nation.n_regionkey == region.r_regionkey).select(
        "n_nationkey", "n_name", "r_name"
    )


@register(
    "q_join_smj",
    oracle=f"""
SELECT o.o_orderkey AS o_orderkey,
       CAST(count(*) AS BIGINT) AS n_lines,
       {sql_dec_sum("l.l_extendedprice * (1 - l.l_discount)", 4)} AS revenue
FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
GROUP BY o.o_orderkey
""",
)
def q_join_smj(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shuffle (sort-merge) equi-join orders ⋈ lineitem + per-order rollup."""
    orders = load(spark, sf_dir, "orders")
    lineitem = load(spark, sf_dir, "lineitem")
    return (
        orders.join(lineitem, orders.o_orderkey == lineitem.l_orderkey)
        .groupBy("o_orderkey")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            dec_sum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4).alias("revenue"),
        )
    )


@register(
    "q_star_join",
    oracle=f"""
SELECT r.r_name AS r_name, n.n_name AS n_name,
       CAST(count(*) AS BIGINT) AS n_items,
       {sql_dec_sum("l.l_extendedprice * (1 - l.l_discount)", 4)} AS revenue
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
GROUP BY r.r_name, n.n_name
""",
)
def q_star_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-way star join: fact → orders → customer → broadcast dims."""
    l = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            dec_sum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4).alias("revenue"),
        )
    )


@register(
    "q_semi_join",
    oracle="""
SELECT c_custkey, c_name FROM customer c
WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
""",
)
def q_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left semi join: customers that have at least one order."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select("c_custkey", "c_name")


@register(
    "q_anti_join",
    oracle="""
SELECT c_custkey, c_name FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
""",
)
def q_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left anti join: customers with no orders."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select("c_custkey", "c_name")


_RANGE_STATS: dict[str, tuple] = {}  # sf_dir → (n, lo_us, hi_us) planner stat


@register(
    "q_range_join",
    oracle="""
SELECT e1.event_type AS t1, e2.event_type AS t2, CAST(count(*) AS BIGINT) AS pairs
FROM events e1 JOIN events e2
  ON e2.ts >= e1.ts AND e2.ts <= e1.ts + INTERVAL 1 HOUR
 AND e1.event_id <> e2.event_id
GROUP BY e1.event_type, e2.event_type
""",
)
def q_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theta/range join: event pairs within a 1-hour forward window,
    aggregated to pair counts per (type, type).

    Rate-adaptive physical strategy (one cheap stats pass decides):

    - low event rate → hour-bucketed event-level equi-join: each left
      event explodes into its two candidate hour buckets and the µs-long
      range predicate filters candidates.  Work grows O(N · hourly_rate).
    - high event rate → sum-product decomposition: both sides pre-aggregate
      to per-minute (type, minute, count) buckets; the 59 fully-covered
      interior minutes of each window contribute count products (an
      equi-join of BUCKETS, not events), and only the two boundary minutes
      (m and m+60) are resolved event-level.  Work grows
      O(buckets · 59 + N · minute_rate) — measured at sf0.1: 10× the event
      rate takes the event-level join 2.1s → 17.0s but the sum-product
      form 2.4s → 2.5s (flat), identical counts.

    The crossover sits near ~10 events per minute bucket (below it the
    three extra shuffles of the decomposition cost more than they save).
    The range predicate runs on unix_micros longs, not timestamps: the
    comparison is evaluated once per CANDIDATE pair, so long compares
    instead of timestamp+interval arithmetic halve the join (sf0.1:
    3.3s → 1.8s).  Exactly equivalent to `ts2 <= ts + INTERVAL 1 HOUR` —
    1h = 3.6e9 µs and the fixtures carry µs precision; the oracle keeps
    the timestamp form.
    """
    us_m = 60_000_000  # one minute in microseconds
    e = load(spark, sf_dir, "events").select(
        "event_id", "event_type", F.unix_micros("ts").alias("us")
    )

    # rate estimate from one shuffle-free scan-agg (count + time span);
    # an upper bound on occupied minute buckets is good enough to pick a
    # strategy and avoids countDistinct's extra exchange.  Memoized per
    # fixture dir (immutable driver data) — the planner stat is table
    # metadata, so repeated invocations in one process skip the job.
    if sf_dir not in _RANGE_STATS:
        s = e.agg(
            F.count(F.lit(1)).alias("n"),
            F.min("us").alias("lo"),
            F.max("us").alias("hi"),
        ).first()
        _RANGE_STATS[sf_dir] = (s["n"], s["lo"], s["hi"])
    n, lo, hi = _RANGE_STATS[sf_dir]
    span_minutes = max((hi - lo) / us_m, 1.0) if n else 1.0
    per_minute = n / span_minutes

    if per_minute < 10:
        return _range_join_event_level(e)
    return _range_join_sum_product(e)


def _range_join_event_level(e: DataFrame) -> DataFrame:
    """Hour-bucketed event-level candidate join (low event rates)."""
    us_h = 3_600_000_000
    e1 = e.withColumn("h0", F.floor(F.col("us") / us_h)).withColumn(
        "h", F.explode(F.array(F.col("h0"), F.col("h0") + 1))
    )
    e2 = e.select(
        F.col("event_id").alias("event_id2"),
        F.col("us").alias("us2"),
        F.col("event_type").alias("event_type2"),
    ).withColumn("h", F.floor(F.col("us2") / us_h))
    return (
        e1.join(e2, "h")
        .where(
            (F.col("us2") >= F.col("us"))
            & (F.col("us2") <= F.col("us") + F.lit(us_h))
            & (F.col("event_id") != F.col("event_id2"))
        )
        .select(F.col("event_type").alias("t1"), F.col("event_type2").alias("t2"))
        .groupBy("t1", "t2")
        .agg(F.count(F.lit(1)).alias("pairs"))
    )


def _range_join_sum_product(e: DataFrame) -> DataFrame:
    """Minute-bucket sum-product decomposition (high event rates)."""
    us_h = 3_600_000_000
    us_m = 60_000_000
    em = e.withColumn("m", F.floor(F.col("us") / us_m))
    b = em.groupBy("event_type", "m").agg(F.count(F.lit(1)).alias("c"))
    b1 = b.select(
        F.col("event_type").alias("t1"), F.col("m").alias("m1"), F.col("c").alias("c1")
    ).withColumn("d", F.explode(F.sequence(F.lit(1), F.lit(59))))
    b2 = b.select(
        F.col("event_type").alias("t2"), F.col("m").alias("m2"), F.col("c").alias("c2")
    )
    inner = (
        b1.join(b2, b1.m1 + b1.d == b2.m2)
        .groupBy("t1", "t2")
        .agg(F.sum(F.col("c1") * F.col("c2")).alias("pairs"))
    )
    e1 = em.select(
        F.col("event_type").alias("t1"),
        F.col("event_id").alias("id1"),
        F.col("us").alias("us1"),
        "m",
    )
    e2 = em.select(
        F.col("event_type").alias("t2"),
        F.col("event_id").alias("id2"),
        F.col("us").alias("us2"),
        F.col("m").alias("m2"),
    )
    # same-minute boundary: us2 >= us1 (upper bound auto-satisfied);
    # the same-event self-pair lives only here and is excluded by id
    same = (
        e1.join(e2, e1.m == e2.m2)
        .where((F.col("us2") >= F.col("us1")) & (F.col("id1") != F.col("id2")))
        .groupBy("t1", "t2")
        .agg(F.count(F.lit(1)).alias("pairs"))
    )
    # far boundary minute m+60: us2 <= us1 + 1h (lower bound auto-satisfied)
    far = (
        e1.join(e2, e1.m + 60 == e2.m2)
        .where(F.col("us2") <= F.col("us1") + us_h)
        .groupBy("t1", "t2")
        .agg(F.count(F.lit(1)).alias("pairs"))
    )
    return (
        inner.unionByName(same)
        .unionByName(far)
        .groupBy("t1", "t2")
        .agg(F.sum("pairs").cast("long").alias("pairs"))
    )


@register(
    "q_asof_join",
    oracle="""
WITH tagged AS (
  SELECT user_id, ts, event_id, event_type,
         CASE WHEN event_type = 'view' THEN ts END AS view_ts
  FROM events
  WHERE event_type IN ('view', 'purchase')
),
seq AS (
  SELECT user_id, ts, event_id, event_type,
         last_value(view_ts IGNORE NULLS)
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_view_ts
  FROM tagged
)
SELECT event_id, user_id, epoch_us(last_view_ts) AS last_view_us
FROM seq WHERE event_type = 'purchase'
""",
)
def q_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each purchase matched to the user's latest prior view.

    Single-pass union+window form (no row-vs-row join): one sort per user
    partition scales linearly; this is the canonical distributed as-of.
    """
    e = load(spark, sf_dir, "events").where(F.col("event_type").isin("view", "purchase"))
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    tagged = e.withColumn(
        "view_ts", F.when(F.col("event_type") == "view", F.col("ts"))
    ).withColumn("last_view_ts", F.last("view_ts", ignorenulls=True).over(w))
    return tagged.where(F.col("event_type") == "purchase").select(
        "event_id", "user_id", F.unix_micros("last_view_ts").alias("last_view_us")
    )


@register(
    "q_upsert",
    oracle="""
WITH updates AS (
  SELECT o_orderkey, o_custkey, o_orderstatus,
         round(o_totalprice * 1.1, 4) AS o_totalprice
  FROM orders WHERE o_orderkey % 100 = 0
)
SELECT coalesce(u.o_orderkey, o.o_orderkey) AS o_orderkey,
       coalesce(u.o_custkey, o.o_custkey) AS o_custkey,
       coalesce(u.o_orderstatus, o.o_orderstatus) AS o_orderstatus,
       round(coalesce(u.o_totalprice, o.o_totalprice), 4) AS o_totalprice
FROM orders o FULL OUTER JOIN updates u ON o.o_orderkey = u.o_orderkey
""",
)
def q_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE/upsert semantics on plain parquet: updates full-outer-joined
    onto the base, update wins per column.  The pattern behind SCD-style
    pipeline maintenance when no lakehouse MERGE INTO is available; at
    scale both sides shuffle once on the key (or none, if bucketed)."""
    o = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice"
    )
    updates = o.where(F.col("o_orderkey") % 100 == 0).select(
        F.col("o_orderkey").alias("u_key"),
        F.col("o_custkey").alias("u_cust"),
        F.col("o_orderstatus").alias("u_status"),
        F.round(F.col("o_totalprice") * 1.1, 4).alias("u_price"),
    )
    return (
        o.join(updates, o.o_orderkey == updates.u_key, "full_outer")
        .select(
            F.coalesce("u_key", "o_orderkey").alias("o_orderkey"),
            F.coalesce("u_cust", "o_custkey").alias("o_custkey"),
            F.coalesce("u_status", "o_orderstatus").alias("o_orderstatus"),
            F.round(F.coalesce("u_price", "o_totalprice"), 4).alias("o_totalprice"),
        )
    )


@register(
    "q_keep_latest",
    oracle="""
SELECT user_id, event_id, event_type FROM (
  SELECT user_id, event_id, event_type,
         row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
  FROM events
) WHERE rn = 1
""",
)
def q_keep_latest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keep-latest-per-key (the SCD1 / compaction primitive): deterministic
    row_number over event time descending."""
    from pyspark.sql.window import Window as W

    e = load(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
    return (
        e.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("user_id", "event_id", "event_type")
    )


@register(
    "q_scd2_intervals",
    oracle="""
SELECT user_id, event_id,
       CAST(epoch_us(ts) AS BIGINT) AS valid_from_us,
       CAST(lead(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS BIGINT) AS valid_to_us,
       CAST(CASE WHEN lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
            THEN 1 ELSE 0 END AS INTEGER) AS is_current
FROM events
""",
)
def q_scd2_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD2 (slowly-changing-dimension type 2) interval construction: each
    per-user event becomes a validity interval [valid_from, valid_to),
    closed by the NEXT event's timestamp; the open interval is the current
    row.  One window (lead) per user partition — the temporal-modeling
    primitive for historized dims; µs epochs keep the compare
    engine-neutral."""
    from pyspark.sql.window import Window as W

    e = load(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    return e.select(
        "user_id",
        "event_id",
        F.unix_micros("ts").alias("valid_from_us"),
        F.lead(F.unix_micros("ts")).over(w).alias("valid_to_us"),
    ).withColumn(
        "is_current", F.when(F.col("valid_to_us").isNull(), 1).otherwise(0).cast("int")
    )


@register(
    "q_cross_join",
    oracle="""
SELECT r.r_name AS r_name, s.c_mktsegment AS c_mktsegment
FROM region r CROSS JOIN (SELECT DISTINCT c_mktsegment FROM customer) s
""",
)
def q_cross_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross join of small dims (the matrix outer-product shape)."""
    r = load(spark, sf_dir, "region")
    seg = load(spark, sf_dir, "customer").select("c_mktsegment").distinct()
    return r.select("r_name").crossJoin(F.broadcast(seg))


@register(
    "q_skew_join_salted",
    oracle=f"""
SELECT p.p_brand AS p_brand,
       CAST(count(*) AS BIGINT) AS n_lines,
       {sql_dec_sum("l.l_quantity", 2)} AS total_qty
FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
GROUP BY p_brand
""",
)
def q_skew_join_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-safe salted shuffle join: the fact side gets a deterministic
    salt in [0,16), the dim side is exploded 16x, and the join key becomes
    (partkey, salt) — so a hot partkey that would pin one reducer at 100 TB
    spreads over 16 of them.  The shuffle_hash hint keeps the demo honest
    (a broadcast of the dim would bypass the shuffle being protected);
    in production AQE's skew-join split handles sort-merge skew, and this
    explicit salt is the pattern for when the skew survives AQE (single
    mega-key aggregations feeding a join)."""
    n_salts = 16
    l = load(spark, sf_dir, "lineitem").withColumn(
        "salt", (F.col("l_orderkey") % n_salts).cast("int")
    )
    p = load(spark, sf_dir, "part").withColumn(
        "salt", F.explode(F.array(*[F.lit(s) for s in range(n_salts)]))
    )
    return (
        l.join(p.hint("shuffle_hash"), (l.l_partkey == p.p_partkey) & (l.salt == p.salt))
        .groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            dec_sum("l_quantity", 2).alias("total_qty"),
        )
    )


# plan-identity → top-key share memo (functions.memo.plan_memo) —
# repeated salted_join_auto calls over the same logical fact launch ZERO
# extra stat jobs.
_SKEW_STATS: dict[int, list] = {}


def top_key_share(fact: DataFrame, key: str, topk: int = 8) -> float:
    """Fraction of fact rows owned by the hottest value of ``key``,
    from per-partition top-k histograms (the MapReduce top-k pattern):
    one `mapInPandas` pass emits each partition's ``topk`` hottest keys
    plus its row total — partitions × topk tiny rows to the driver,
    ZERO shuffle of the fact.  A key owning ≥ the salting threshold
    (20%) globally owns ~that share of every partition in expectation,
    so it cannot miss the per-partition top lists; the estimate is a
    lower bound that is exact for exactly the keys the planner cares
    about.  Deterministic (partition splits and value_counts are; no
    RNG, SURVEY.md §1.4).  Memoized per logical plan (the _COO_STATS
    pattern), so repeated planning launches zero extra jobs.  (A
    row-sampling variant was rejected: deterministic full-row-hash
    sampling collapses when a hot key spans few DISTINCT rows — all
    duplicates sample together and the share estimate is garbage.)"""
    from ..functions.memo import plan_memo

    def compute() -> float:
        src = fact.select(F.col(key).cast("string").alias("k"))

        def part_stats(batches):
            from collections import Counter

            import pandas as pd

            cnt: Counter = Counter()
            tot = 0
            for pdf in batches:
                tot += len(pdf)
                # NULL keys are the classic skew source (they all hash to one
                # reducer partition) — count them under a sentinel instead of
                # letting value_counts drop them (and NaN keys would not even
                # merge across partitions in the driver dict)
                cnt.update(pdf["k"].fillna("\x00<NULL>").value_counts().to_dict())
            if not tot:
                return
            top = cnt.most_common(topk)
            # the partition total rides the first row only (summed driver-side)
            yield pd.DataFrame(
                {
                    "k": [str(t[0]) for t in top],
                    "c": [int(t[1]) for t in top],
                    "tot": [int(tot)] + [0] * (len(top) - 1),
                }
            )

        rows = src.mapInPandas(part_stats, schema="k string, c long, tot long").collect()
        total = sum(r["tot"] for r in rows)
        by_key: dict[str, int] = {}
        for r in rows:
            by_key[r["k"]] = by_key.get(r["k"], 0) + r["c"]
        return max(by_key.values(), default=0) / max(total, 1)

    return plan_memo(_SKEW_STATS, fact, (key, topk), compute)


def salted_join_auto(
    fact: DataFrame,
    dim: DataFrame,
    fact_key: str,
    dim_key: str,
    n_salts: int = 16,
    stats: dict | None = None,
) -> DataFrame:
    """Shuffle join fact↔dim with STAT-DRIVEN salting (VERDICT r5 item
    7): a sampled key histogram estimates the hottest fact key's row
    share; past plans.SKEW_TOP_SHARE_THRESHOLD the fact side gets a
    deterministic salt in [0, n_salts) and the dim side is exploded
    n_salts×, spreading the mega-key over n_salts reducers (the measured
    1.7×-over-AQE pattern, SCALING.md "Skewed hot-key join"); below it
    the plain shuffle join runs and nothing pays the dim explosion.
    Results are identical either way (the salt is a join-key refinement,
    not a filter).  ``stats["salted"]`` records the choice."""
    from ..plans import choose_join_salting

    share = top_key_share(fact, fact_key)
    salted = choose_join_salting(share)
    if stats is not None:
        stats["top_key_share"] = share
        stats["salted"] = salted
    if not salted:
        return fact.join(dim.hint("shuffle_hash"), fact[fact_key] == dim[dim_key])
    # the salt must be ROW-unique, not content-derived: a hot key whose
    # rows are byte-identical (constant payload, or a projected fact)
    # would hash every row to ONE salt — still a single reducer, now
    # paying the dim explosion on top (r6 review finding).  Salt routing
    # never affects the RESULT (it only refines the join key), so
    # monotonically_increasing_id's partition-layout dependence is fine.
    f = fact.withColumn(
        "mmbd_salt", F.pmod(F.monotonically_increasing_id(), F.lit(n_salts)).cast("int")
    )
    d = dim.withColumn(
        "mmbd_salt", F.explode(F.array(*[F.lit(s) for s in range(n_salts)]))
    )
    return f.join(
        d.hint("shuffle_hash"),
        (f[fact_key] == d[dim_key]) & (f["mmbd_salt"] == d["mmbd_salt"]),
    ).drop("mmbd_salt")


@register(
    "q_skew_join_auto",
    oracle=f"""
WITH l AS (
  SELECT CASE WHEN l_orderkey % 10 < 9 THEN 1 ELSE l_partkey END AS hot_partkey,
         l_quantity
  FROM lineitem
)
SELECT p.p_brand AS p_brand,
       CAST(count(*) AS BIGINT) AS n_lines,
       {sql_dec_sum("l.l_quantity", 2)} AS total_qty
FROM l JOIN part p ON l.hot_partkey = p.p_partkey
GROUP BY p_brand
""",
)
def q_skew_join_auto(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The stat-driven salting planner end-to-end on a synthetic mega-key:
    90% of lineitem rows are remapped to partkey 1, the sampled histogram
    sees the ~0.9 top-key share, and salted_join_auto salts the join
    (asserted in tests/test_partitioning.py).  Oracle-green because the
    salt refines the join key without changing the join's result."""
    l = load(spark, sf_dir, "lineitem").select(
        F.when(F.col("l_orderkey") % 10 < 9, F.lit(1))
        .otherwise(F.col("l_partkey"))
        .alias("hot_partkey"),
        "l_quantity",
    )
    p = load(spark, sf_dir, "part")
    return (
        salted_join_auto(l, p, "hot_partkey", "p_partkey")
        .groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            dec_sum("l_quantity", 2).alias("total_qty"),
        )
    )


@register(
    "q_lateral_topk",
    oracle="""
SELECT o.o_orderkey, t.l_linenumber, round(t.l_quantity, 2) AS qty
FROM orders o JOIN LATERAL (
  SELECT l_linenumber, l_quantity FROM lineitem l
  WHERE l.l_orderkey = o.o_orderkey
  ORDER BY l_quantity DESC, l_linenumber LIMIT 2) t ON true
WHERE o.o_totalprice > 250000
""",
)
def q_lateral_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL subquery with per-row ORDER BY ... LIMIT: the
    top-2 heaviest lineitems for each big order.  Catalyst decorrelates
    the lateral into a join + partitioned window filter (DomainJoin
    rewrite) — no per-row subquery execution survives in the physical
    plan, so the shape scales like any windowed join.  Filter on the
    outer side reaches the orders scan (pushdown through the lateral)."""
    load(spark, sf_dir, "orders").createOrReplaceTempView("mmbd_lat_orders")
    load(spark, sf_dir, "lineitem").createOrReplaceTempView("mmbd_lat_lineitem")
    return spark.sql("""
      SELECT o.o_orderkey, t.l_linenumber, round(t.l_quantity, 2) AS qty
      FROM mmbd_lat_orders o JOIN LATERAL (
        SELECT l_linenumber, l_quantity FROM mmbd_lat_lineitem l
        WHERE l.l_orderkey = o.o_orderkey
        ORDER BY l_quantity DESC, l_linenumber LIMIT 2) t
      WHERE o.o_totalprice > 250000
    """)


# Bloom semi-join pre-filter: m bits / k hashes sized for ~30k keys at
# sf0.1 (fp ≈ 2%); at real scale size m ≈ 10·|dim keys| bits — a 100M-key
# dim is a ~120 MB broadcast bloom where its join hash table would be GBs.
_BLOOM_BITS = 1 << 18
_BLOOM_HASHES = 3


@register(
    "q_bloom_semi_join",
    oracle=f"""
SELECT l_returnflag,
       CAST(count(*) AS BIGINT) AS n_items,
       {sql_dec_sum("l_extendedprice * (1 - l_discount)", 4)} AS revenue
FROM lineitem
WHERE l_orderkey IN (SELECT o_orderkey FROM orders WHERE o_orderpriority = '1-URGENT')
GROUP BY l_returnflag
""",
)
def q_bloom_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi join with a Bloom-filter pre-filter — THE shuffle-volume
    reducer for fact⋉dim at 100 TB: the dim's key set is folded into an
    m-bit Bloom filter (k=3 xxhash64 probes), stored as a ≤m/64-row
    (word_idx, bits) table that BROADCASTS; the fact side tests membership
    via k broadcast equi-joins on word_idx + bitmask ANDs — all map-side,
    the fact never shuffles for the pre-filter.  Bloom filters admit false
    positives but NO false negatives, so a final exact semi join over the
    pruned survivors restores exactness — which is why the oracle is the
    plain SQL semi join: the bloom must be result-transparent.

    Plan shape: one tiny shuffle to build the bloom (dim keys → bit
    positions → bit_or per word), k+1 broadcast joins on the fact, one agg.
    The exact finish joins only the pre-filtered survivors (~|priority
    slice| + fp·|fact|), which is the shuffle the bloom just shrank ~5×.
    tests/test_bloom_join.py asserts the no-false-negative invariant and
    real pruning."""
    return bloom_semi_join(
        load(spark, sf_dir, "orders"), load(spark, sf_dir, "lineitem")
    )


def bloom_semi_join(orders: DataFrame, lineitem: DataFrame) -> DataFrame:
    """q_bloom_semi_join's pipeline over arbitrary orders/lineitem frames —
    shared with the scaling probe so blow-up corpora run the identical
    plan."""
    dim_keys = orders.where(F.col("o_orderpriority") == "1-URGENT").select(
        F.col("o_orderkey").alias("k")
    )

    m = _BLOOM_BITS

    def positions(col):
        return [
            F.pmod(F.xxhash64(col, F.lit(i)), F.lit(m)) for i in range(_BLOOM_HASHES)
        ]

    # bit masks via shiftleft, not pow() — pow goes through doubles and
    # corrupts the 2^63 bit; the table materializes only words with set bits
    bloom = (
        dim_keys.select(F.explode(F.array(*positions(F.col("k")))).alias("p"))
        .groupBy(F.shiftright("p", 6).alias("word_idx"))
        .agg(F.expr("bit_or(shiftleft(cast(1 as bigint), cast(p % 64 as int)))").alias("bits"))
    )

    fact = lineitem.select(
        "l_orderkey", "l_returnflag", "l_extendedprice", "l_discount"
    )
    probed = fact
    for i in range(_BLOOM_HASHES):
        p = F.pmod(F.xxhash64("l_orderkey", F.lit(i)), F.lit(m))
        b = bloom.select(
            F.col("word_idx").alias(f"w{i}"), F.col("bits").alias(f"bits{i}")
        )
        probed = (
            probed.withColumn(f"p{i}", p)
            .join(F.broadcast(b), F.shiftright(f"p{i}", 6) == F.col(f"w{i}"), "left")
            .where(
                F.expr(
                    f"bits{i} is not null and "
                    f"(bits{i} & shiftleft(cast(1 as bigint), cast(p{i} % 64 as int))) != 0"
                )
            )
            .drop(f"p{i}", f"w{i}", f"bits{i}")
        )
    # exact finish over the pruned survivors: false positives drop here
    survivors = probed.join(
        dim_keys.withColumnRenamed("k", "l_orderkey"), "l_orderkey", "left_semi"
    )
    return survivors.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n_items"),
        dec_sum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4).alias("revenue"),
    )


@register(
    "q_snapshot_diff",
    oracle="""
WITH old AS (
  SELECT o_orderkey, o_orderstatus,
         floor(o_totalprice * 100 + 0.5) / 100 AS price
  FROM orders WHERE o_orderkey % 10 < 9
),
new AS (
  SELECT o_orderkey,
         CASE WHEN o_orderkey % 13 = 0 THEN 'F' ELSE o_orderstatus END AS o_orderstatus,
         CASE WHEN o_orderkey % 7 = 0
              THEN floor(o_totalprice * 1.1 * 100 + 0.5) / 100
              ELSE floor(o_totalprice * 100 + 0.5) / 100 END AS price
  FROM orders WHERE o_orderkey % 10 > 0
)
SELECT coalesce(new.o_orderkey, old.o_orderkey) AS o_orderkey,
       CASE WHEN old.o_orderkey IS NULL THEN 'insert'
            WHEN new.o_orderkey IS NULL THEN 'delete'
            ELSE 'update' END AS op,
       old.o_orderstatus AS old_status, new.o_orderstatus AS new_status,
       old.price AS old_price, new.price AS new_price
FROM old FULL OUTER JOIN new ON old.o_orderkey = new.o_orderkey
WHERE old.o_orderkey IS NULL OR new.o_orderkey IS NULL
   OR old.o_orderstatus <> new.o_orderstatus OR old.price <> new.price
""",
)
def q_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot diff / change-data-capture derivation: given two
    snapshots of a keyed table, emit the minimal change feed — inserts
    (key only in new), deletes (key only in old), and updates (key in
    both with any column changed), dropping unchanged rows.  This is
    the primitive behind incremental pipeline maintenance (feed the
    ops to q_upsert's MERGE to roll a base table forward) and dataset
    versioning diffs; the snapshots here are two deterministic slices
    of orders with seeded status/price mutations.

    Scale shape: ONE full-outer shuffle join on the unique key — skew
    is impossible on a key side (both sides unique), the change
    predicate is a narrow post-join filter, and at 100 TB both
    snapshots would be bucketed on the key (q_bucketed_join) making
    the diff shuffle-free.  Comparisons are exact: prices round
    through the portable 2-dp floor form BEFORE comparing, so the
    update set is bit-stable in both engines."""
    o = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    p2 = lambda c: F.floor(c * 100 + F.lit(0.5)) / 100
    old = o.where(F.col("o_orderkey") % 10 < 9).select(
        F.col("o_orderkey").alias("old_key"),
        F.col("o_orderstatus").alias("old_status"),
        p2(F.col("o_totalprice")).alias("old_price"),
    )
    new = o.where(F.col("o_orderkey") % 10 > 0).select(
        F.col("o_orderkey").alias("new_key"),
        F.when(F.col("o_orderkey") % 13 == 0, F.lit("F"))
        .otherwise(F.col("o_orderstatus"))
        .alias("new_status"),
        F.when(
            F.col("o_orderkey") % 7 == 0, p2(F.col("o_totalprice") * 1.1)
        )
        .otherwise(p2(F.col("o_totalprice")))
        .alias("new_price"),
    )
    j = old.join(new, old.old_key == new.new_key, "full_outer")
    changed = (
        F.col("old_key").isNull()
        | F.col("new_key").isNull()
        | (F.col("old_status") != F.col("new_status"))
        | (F.col("old_price") != F.col("new_price"))
    )
    op = (
        F.when(F.col("old_key").isNull(), F.lit("insert"))
        .when(F.col("new_key").isNull(), F.lit("delete"))
        .otherwise(F.lit("update"))
    )
    return j.where(changed).select(
        F.coalesce("new_key", "old_key").alias("o_orderkey"),
        op.alias("op"),
        "old_status",
        "new_status",
        "old_price",
        "new_price",
    )


#: TPC-H Q3 parameters adapted to the fixture's 1995-2001 date span
_Q3_SEGMENT = "BUILDING"
_Q3_DATE = "1998-06-15"
_Q3_TOPN = 10


@register(
    "q_ship_priority",
    oracle=f"""
SELECT l.l_orderkey,
       {sql_dec_sum("l.l_extendedprice * (1 - l.l_discount)", 4)} AS revenue,
       o.o_orderdate, o.o_orderpriority
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE c.c_mktsegment = '{_Q3_SEGMENT}'
  AND o.o_orderdate < TIMESTAMP '{_Q3_DATE}'
  AND l.l_shipdate  > TIMESTAMP '{_Q3_DATE}'
GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
ORDER BY revenue DESC, o.o_orderdate, l.l_orderkey
LIMIT {_Q3_TOPN}
""",
)
def q_ship_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 (shipping priority): unshipped-at-cutoff revenue for one
    market segment, top-{n} orders — THE canonical selective star-join
    benchmark shape (two date filters + a segment filter feeding a
    3-way join, grouped per order, global top-k).  Scale posture: both
    date predicates and the segment filter PUSH DOWN to their parquet
    scans (plan guard in tests/test_plans.py), the filtered customer
    side broadcasts, orders⋈lineitem stays a co-keyed shuffle join, and
    the top-k is TakeOrderedAndProject (per-partition heap + tiny
    driver merge — the q_top_orders property), never a global sort.
    Ordering is total ((revenue DESC, o_orderdate, l_orderkey)) so the
    LIMIT cut is deterministic in both engines; revenue takes the
    fixed-point route.""".replace("{n}", str(_Q3_TOPN))
    c = load(spark, sf_dir, "customer").where(F.col("c_mktsegment") == _Q3_SEGMENT)
    o = load(spark, sf_dir, "orders").where(F.col("o_orderdate") < _Q3_DATE)
    l = load(spark, sf_dir, "lineitem").where(F.col("l_shipdate") > _Q3_DATE)
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            dec_sum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4).alias("revenue")
        )
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.col("revenue").desc(), "o_orderdate", "l_orderkey")
        .limit(_Q3_TOPN)
    )


_Q18_QTY = 250
_Q18_TOPN = 10


@register(
    "q_large_orders",
    oracle=f"""
WITH big AS (
  SELECT l_orderkey, CAST(sum(l_quantity) AS BIGINT) AS sum_qty
  FROM lineitem GROUP BY l_orderkey HAVING sum(l_quantity) > {_Q18_QTY}
)
SELECT c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate,
       o.o_totalprice, big.sum_qty
FROM big
JOIN orders o ON o.o_orderkey = big.l_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
ORDER BY o.o_totalprice DESC, o.o_orderkey
LIMIT {_Q18_TOPN}
""",
)
def q_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 (large-volume customer): orders whose total lineitem
    quantity exceeds {q}, joined back to customer, top-{n} by
    (o_totalprice DESC, o_orderkey) — the canonical HAVING-driven
    semi-reduction: the expensive side (lineitem) collapses FIRST to a
    per-order aggregate, the >{q} cut leaves a tiny driver-broadcastable
    survivor set (~1% of orders), and everything downstream joins
    AGAINST that survivor set instead of re-scanning the fact.  Scale
    posture: one map-side-combinable agg over lineitem, survivors
    broadcast into orders (plan guard: BroadcastHashJoin, no shuffle of
    orders), customer joined the same way, TakeOrderedAndProject for
    the cut.  Exact: quantities are integral doubles summed exactly in
    binary (< 2^53), cast to BIGINT; totalprice passes through
    unaggregated.  Ordering is total, so the LIMIT is deterministic.
    """.replace("{q}", str(_Q18_QTY)).replace("{n}", str(_Q18_TOPN))
    li = load(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("qd"))
        .where(F.col("qd") > _Q18_QTY)
        .select("l_orderkey", F.col("qd").cast("long").alias("sum_qty"))
    )
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    return (
        o.join(F.broadcast(big), o.o_orderkey == big.l_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .select("c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice", "sum_qty")
        .orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .limit(_Q18_TOPN)
    )


@register(
    "q_nullsafe_join",
    oracle="""
WITH keyed AS (
  SELECT CASE WHEN event_type = 'error' THEN NULL ELSE user_id END AS k,
         event_id, CAST(epoch_us(ts) AS BIGINT) AS us
  FROM events
),
mid AS (SELECT (min(us) + max(us)) // 2 AS m FROM keyed),
a AS (SELECT k, count(*) AS n_first FROM keyed, mid WHERE us <  m GROUP BY k),
b AS (SELECT k, count(*) AS n_second FROM keyed, mid WHERE us >= m GROUP BY k)
SELECT coalesce(a.k, b.k) AS k_out,
       a.k IS NULL AND b.k IS NULL AS is_null_key,
       CAST(coalesce(a.n_first, 0) AS BIGINT) AS n_first,
       CAST(coalesce(b.n_second, 0) AS BIGINT) AS n_second
FROM a FULL OUTER JOIN b ON a.k IS NOT DISTINCT FROM b.k
""",
)
def q_nullsafe_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NULL-safe equality join (<=> / IS NOT DISTINCT FROM): per-key
    activity in the first vs second half of the timeline, where the
    key is NULLABLE by construction (error events carry no user) —
    a plain equi-join silently DROPS the null-key rows from both
    sides; the null-safe join matches them to each other, which is
    the semantics every CDC/diff pipeline wants for nullable business
    keys (q_snapshot_diff's missing cousin).  Both engines treat the
    null bucket as one key; coalesce would be WRONG only if real keys
    collided with the sentinel — the is_null_key flag keeps the null
    bucket distinguishable instead.  Shape: two combinable half
    counts, one tiny null-safe full-outer join (keys, not events)."""
    e = load(spark, sf_dir, "events")
    keyed = e.select(
        F.when(F.col("event_type") == "error", F.lit(None)).otherwise(F.col("user_id")).alias("k"),
        "event_id",
        F.unix_micros("ts").alias("us"),
    )
    mid = keyed.agg(((F.min("us") + F.max("us")) / F.lit(2)).cast("long").alias("m"))
    with_m = keyed.crossJoin(F.broadcast(mid))
    a = with_m.where(F.col("us") < F.col("m")).groupBy("k").agg(F.count(F.lit(1)).alias("n_first"))
    b = (
        with_m.where(F.col("us") >= F.col("m"))
        .groupBy(F.col("k").alias("kb"))
        .agg(F.count(F.lit(1)).alias("n_second"))
    )
    j = a.join(b, a.k.eqNullSafe(F.col("kb")), "full_outer")
    return j.select(
        F.coalesce(a.k, F.col("kb")).alias("k_out"),
        (a.k.isNull() & F.col("kb").isNull()).alias("is_null_key"),
        F.coalesce(F.col("n_first"), F.lit(0)).cast("long").alias("n_first"),
        F.coalesce(F.col("n_second"), F.lit(0)).cast("long").alias("n_second"),
    )


_Q4_LATE_DAYS = 14


@register(
    "q_priority_exists",
    oracle=f"""
SELECT o.o_orderpriority, CAST(count(*) AS BIGINT) AS n_late_orders
FROM orders o
WHERE EXISTS (
  SELECT 1 FROM lineitem l
  WHERE l.l_orderkey = o.o_orderkey
    AND l.l_shipdate > o.o_orderdate + INTERVAL {_Q4_LATE_DAYS} DAY
)
GROUP BY o.o_orderpriority
""",
)
def q_priority_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape (order-priority checking): orders with at least
    one lineitem shipped more than {d} days after the order date,
    counted per priority — the canonical correlated-EXISTS query.
    Catalyst decorrelates the EXISTS into a LEFT SEMI join on
    l_orderkey with the date comparison as the join condition, so the
    fact side is touched once and each order contributes at most once
    regardless of how many lineitems are late (the semantics COUNT +
    plain join would get wrong).  Shape: one co-keyed semi join, one
    combinable 5-row rollup.""".replace("{d}", str(_Q4_LATE_DAYS))
    o = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    late = o.join(
        li,
        on=[
            o.o_orderkey == li.l_orderkey,
            li.l_shipdate > F.col("o_orderdate") + F.expr(f"INTERVAL {_Q4_LATE_DAYS} DAY"),
        ],
        how="left_semi",
    )
    return late.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).cast("long").alias("n_late_orders")
    )


_Q21_LATE_DAYS = 21
_Q21_TOPN = 10


@register(
    "q_waiting_suppliers",
    oracle=f"""
WITH per_order AS (
  SELECT l.l_orderkey,
         count(DISTINCT l.l_suppkey) AS n_supp,
         count(DISTINCT CASE WHEN l.l_shipdate > o.o_orderdate + INTERVAL {_Q21_LATE_DAYS} DAY
                             THEN l.l_suppkey END) AS n_late,
         max(CASE WHEN l.l_shipdate > o.o_orderdate + INTERVAL {_Q21_LATE_DAYS} DAY
                  THEN l.l_suppkey END) AS late_supp
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
  GROUP BY l.l_orderkey
),
blamed AS (
  SELECT late_supp AS s_suppkey, count(*) AS n_orders
  FROM per_order
  WHERE n_supp >= 2 AND n_late = 1
  GROUP BY late_supp
)
SELECT s.s_name, b.s_suppkey, CAST(b.n_orders AS BIGINT) AS n_orders
FROM blamed b JOIN supplier s ON s.s_suppkey = b.s_suppkey
ORDER BY n_orders DESC, b.s_suppkey
LIMIT {_Q21_TOPN}
""",
)
def q_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape (suppliers who kept orders waiting): on
    multi-supplier orders where EXACTLY ONE supplier shipped more than
    {d} days late, blame that supplier; top-{n} offenders.  The classic
    EXISTS + NOT-EXISTS pair collapses into ONE per-order aggregate —
    count of distinct suppliers, count of distinct LATE suppliers, and
    the late supplier itself via a conditional max (well-defined
    exactly when n_late = 1, the only rows kept) — so the fact table
    is scanned once and shuffled once on l_orderkey instead of
    visited three times by correlated subqueries.  Exact integer
    counts; total (count DESC, suppkey) order makes the cut
    deterministic; the supplier-name join is broadcast.""".replace(
        "{d}", str(_Q21_LATE_DAYS)
    ).replace("{n}", str(_Q21_TOPN))
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")
    s = load(spark, sf_dir, "supplier")
    late = F.col("l_shipdate") > F.col("o_orderdate") + F.expr(
        f"INTERVAL {_Q21_LATE_DAYS} DAY"
    )
    per_order = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("l_orderkey")
        .agg(
            F.countDistinct("l_suppkey").alias("n_supp"),
            F.countDistinct(F.when(late, F.col("l_suppkey"))).alias("n_late"),
            F.max(F.when(late, F.col("l_suppkey"))).alias("late_supp"),
        )
    )
    blamed = (
        per_order.where((F.col("n_supp") >= 2) & (F.col("n_late") == 1))
        .groupBy(F.col("late_supp").alias("s_suppkey"))
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )
    return (
        blamed.join(F.broadcast(s), "s_suppkey")
        .select("s_name", "s_suppkey", F.col("n_orders").cast("long").alias("n_orders"))
        .orderBy(F.col("n_orders").desc(), "s_suppkey")
        .limit(_Q21_TOPN)
    )
