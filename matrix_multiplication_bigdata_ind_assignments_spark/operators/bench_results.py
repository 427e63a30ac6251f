"""Harness-analytics operators (SURVEY.md §2.2): the multi-file CSV corpus
scan with lineage + cleaning, and the CSV sink — re-expressing the
reference visualizers' pandas pipeline
(ref: `Stage 1/Visualization/mm_perf_visualizer.py:23-46`) and CSV writers
(ref: `Stage 1/Python Implementation/mm_baseline.py:65-85`).

These have filesystem side effects (write-then-scan a tmp corpus), so they
are rows-only checks; the cleaning logic itself (comma→dot, try_cast) is
oracle-covered via the other queries' try_cast usage and unit tests.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.numeric import dec_sum, sql_dec_sum
from ..registry import register
from ..sources import load


def _write_corpus(spark: SparkSession, sf_dir: str, root: str) -> list[str]:
    """Deterministic 3-file CSV corpus derived from events — stands in for
    the reference's per-language results_*.csv files.  The 'c' file uses
    decimal commas to exercise the locale-fix path
    (ref comma→dot cleaning `Stage 1/Visualization/mm_perf_visualizer.py:39-46`)."""
    e = load(spark, sf_dir, "events")
    base = (
        e.groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.avg("value"), 3).alias("avg_value"))
        .orderBy("event_type")
        .collect()
    )
    paths = []
    for lang in ("python", "c", "java"):
        path = os.path.join(root, f"results_{lang}.csv")
        with open(path, "w") as f:
            if lang == "c":
                # decimal-comma locale + an extra column only this file has
                f.write("lang,event_type,n,avg_value,rss_mb\n")
                for r in base:
                    f.write(f"{lang},{r['event_type']},{r['n']},\"{str(r['avg_value']).replace('.', ',')}\",12\n")
            else:
                f.write("lang,event_type,n,avg_value\n")
                for r in base:
                    f.write(f"{lang},{r['event_type']},{r['n']},{r['avg_value']}\n")
        paths.append(path)
    return paths


# Memory column per source schema, most-specific first — the reference's
# CSVs disagree per stage/language (`Stage 1/Visualization/
# mm_perf_visualizer.py:74-78` carries the same mem_map): C rss_peak_mb,
# Python psutil_peak_rss_mb (Stage 1) / rss_mb (Stage 3), Java
# heap_peak_mb / memory_mb.
_MEM_COLS = ("rss_mb", "rss_peak_mb", "psutil_peak_rss_mb", "memory_mb", "heap_peak_mb")

#: per-node resource columns the engine's own `run` CLI emits (VERDICT
#: r11 item 8: executor peak memory via the REST metrics API, shuffle
#: read/write from the stage-total deltas).  Carried through the corpus
#: union and the derived table ONLY when some source file has them —
#: reference CSVs don't, so q_analyze_derived's fixture schema (and its
#: oracle) is unchanged.
_NODE_COLS = ("exec_peak_mb", "shuffle_read_mb", "shuffle_write_mb")


def read_results_corpus(spark: SparkSession, pattern: str) -> DataFrame:
    """Read a results-CSV corpus with HETEROGENEOUS schemas (the
    reference's own files: Stage 1 has no algo/threads, Stage 3 no algo,
    memory column name varies by language).  Files are grouped by their
    header line, each group read with its own schema, columns normalized
    (algo→'basic', threads→1, first present memory column→rss_mb), then
    unioned by name."""
    import glob as globmod

    paths = sorted(globmod.glob(pattern, recursive=True)) or [pattern]
    by_header: dict[str, list[str]] = {}
    for p in paths:
        try:
            with open(p) as f:
                by_header.setdefault(f.readline().strip(), []).append(p)
        except OSError:
            by_header.setdefault("", []).append(p)

    # node-resource columns appear in the output only if SOME file group
    # carries them (the engine's own run CSVs do; reference CSVs don't)
    any_node_cols = any(
        c in {h.strip() for h in hdr.split(",")} for hdr in by_header for c in _NODE_COLS
    )
    parts = []
    for _, files in sorted(by_header.items()):
        raw = (
            spark.read.option("header", True)
            .csv(files)
            .withColumn("source_file", F.input_file_name())
        )
        cols = set(raw.columns)
        mem = next((c for c in _MEM_COLS if c in cols), None)
        node_sel = [
            (
                F.expr(f"try_cast({c} AS DOUBLE)") if c in cols else F.lit(None).cast("double")
            ).alias(c)
            for c in _NODE_COLS
            if any_node_cols
        ]
        # locale fix + coercion (ref `Stage 1/Visualization/mm_perf_visualizer.py:39-46`)
        parts.append(
            raw.select(
                F.lower("lang").alias("lang"),
                (F.col("algo") if "algo" in cols else F.lit("basic")).alias("algo"),
                F.col("size").cast("long").alias("size"),
                (F.col("threads") if "threads" in cols else F.lit(1)).cast("int").alias("threads"),
                F.expr("try_cast(regexp_replace(avg_time_ms, ',', '.') AS DOUBLE)").alias(
                    "avg_time_ms"
                ),
                (
                    F.expr(f"try_cast(regexp_replace({mem}, ',', '.') AS DOUBLE)")
                    if mem
                    else F.lit(None).cast("double")
                ).alias("rss_mb"),
                *node_sel,
                "source_file",
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def derive_metrics(cleaned: DataFrame) -> DataFrame:
    """Relational speedup/efficiency over the WHOLE table — the reference
    computed this per-process and always got 1.0/0.0 (SURVEY.md §2.1).
    T1 is the lowest-thread-count time of each (lang, algo, size) series
    (avg_time_ms tie-break keeps the window deterministic when a corpus
    repeats a thread count)."""
    from pyspark.sql.window import Window

    w = Window.partitionBy("lang", "algo", "size").orderBy("threads", "avg_time_ms")
    node_cols = [c for c in _NODE_COLS if c in cleaned.columns]
    return cleaned.withColumn("t1", F.first("avg_time_ms").over(w)).select(
        "lang",
        "algo",
        "size",
        "threads",
        "avg_time_ms",
        "rss_mb",
        *node_cols,
        F.round(F.col("t1") / F.col("avg_time_ms"), 3).alias("speedup"),
        F.round(F.col("t1") / F.col("avg_time_ms") / F.col("threads"), 3).alias("efficiency"),
    )


# committed fixture corpus mirroring the reference's own heterogeneous
# results files (Stage 1 C/Python without algo/threads + decimal commas,
# Stage 3 Java thread sweep) — lets the analyze derivation be ORACLE-gated
# (VERDICT r4 task 8) instead of only CLI-tested
_FIXTURE_CORPUS = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "fixtures",
    "results_corpus",
)


def _analyze_oracle_sql() -> str:
    def src(fname: str, algo: str, threads: str, mem: str) -> str:
        return f"""
  SELECT lower(lang) AS lang, {algo} AS algo, CAST(size AS BIGINT) AS size,
         CAST({threads} AS INT) AS threads,
         CAST(replace(avg_time_ms, ',', '.') AS DOUBLE) AS avg_time_ms,
         CAST(replace({mem}, ',', '.') AS DOUBLE) AS rss_mb
  FROM read_csv('{_FIXTURE_CORPUS}/{fname}', header=true, all_varchar=true)"""

    return f"""
WITH u AS ({src("results_c.csv", "'basic'", "1", "rss_peak_mb")}
UNION ALL{src("results_python.csv", "'basic'", "1", "psutil_peak_rss_mb")}
UNION ALL{src("results_java_par.csv", "algo", "threads", "memory_mb")}
),
d AS (
  SELECT lang, algo, size, threads, avg_time_ms, rss_mb,
         first_value(avg_time_ms) OVER (
           PARTITION BY lang, algo, size ORDER BY threads, avg_time_ms) AS t1
  FROM u
)
SELECT lang, algo, size, threads, avg_time_ms, rss_mb,
       round(t1 / avg_time_ms, 3) AS speedup,
       round(t1 / avg_time_ms / threads, 3) AS efficiency
FROM d
"""


@register("q_analyze_derived", oracle=_analyze_oracle_sql())
def q_analyze_derived(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The analyze CLI's derived-metrics table over the committed fixture
    corpus (fixtures/results_corpus/): heterogeneous-schema CSV union →
    normalization (lang casefold, algo/threads defaults, comma→dot locale
    fix, per-schema memory column) → windowed T1 → speedup/efficiency.
    The one reference-facing computation chain (visualizer front-end +
    fixed speedup math) as an oracle-checked query; `sf_dir` is unused —
    the corpus is the fixture, as it is for the reference's own CSVs."""
    cleaned = read_results_corpus(spark, os.path.join(_FIXTURE_CORPUS, "results_*.csv"))
    return derive_metrics(cleaned)


@register(
    "q_results_scan_union",
    oracle="""
WITH base AS (
  SELECT event_type, round(avg(value), 3) AS avg_value FROM events GROUP BY event_type
)
SELECT lang, lang AS source_file_lang,
       CAST(count(*) AS BIGINT) AS n_rows,
       round(sum(avg_value), 3) AS sum_avg_value,
       round(CAST(CASE WHEN lang = 'c' THEN 12 * count(*) ELSE 0 END AS DOUBLE), 3) AS sum_rss
FROM (VALUES ('python'), ('c'), ('java')) l(lang), base
GROUP BY lang
""",
)
def q_results_scan_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CSV corpus scan + lineage + union + cleaning: glob read,
    input_file_name() lineage column, unionByName(allowMissingColumns)
    across heterogeneous schemas, comma→dot locale fix, try_cast coercion —
    the reference visualizer front-end as one declarative pipeline.

    Oracle-checked despite the tmp-file side effect: the corpus content is
    a pure function of events (one row per event_type per lang, c rows
    carrying rss 12 and decimal commas), so the expected aggregate is
    computable straight off the events view — the round-trip through CSV
    text, the per-schema union, and the locale fix all have to survive for
    the hash to match."""
    root = tempfile.mkdtemp(prefix="mmbd_corpus_")
    _write_corpus(spark, sf_dir, root)
    wide = spark.read.option("header", True).csv(os.path.join(root, "results_c.csv"))
    narrow = spark.read.option("header", True).csv(
        [os.path.join(root, "results_python.csv"), os.path.join(root, "results_java.csv")]
    )
    df = wide.unionByName(narrow, allowMissingColumns=True)
    cleaned = df.select(
        "lang",
        "event_type",
        F.col("n").cast("long").alias("n"),
        F.expr("try_cast(regexp_replace(avg_value, ',', '.') AS DOUBLE)").alias("avg_value"),
        F.expr("try_cast(rss_mb AS DOUBLE)").alias("rss_mb"),
        F.regexp_extract(F.input_file_name(), r"results_(\w+)\.csv", 1).alias("source_file_lang"),
    )
    return cleaned.groupBy("lang", "source_file_lang").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.round(F.sum("avg_value"), 3).alias("sum_avg_value"),
        F.round(F.sum(F.coalesce(F.col("rss_mb"), F.lit(0.0))), 3).alias("sum_rss"),
    )


@register(
    "q_json_scan",
    oracle=f"""
SELECT event_type, CAST(count(*) AS BIGINT) AS n,
       {sql_dec_sum("value", 2)} AS total
FROM events WHERE event_type IN ('purchase', 'error') GROUP BY event_type
""",
)
def q_json_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON-lines source/sink round-trip: write a filtered slice of events
    as JSONL, read it back with an explicit schema, aggregate.  The
    aggregate equals the same aggregation over the original parquet, which
    is the oracle — so the round-trip itself is value-checked."""
    out = tempfile.mkdtemp(prefix="mmbd_jsonl_")
    e = load(spark, sf_dir, "events").where(F.col("event_type").isin("purchase", "error"))
    e.select("event_id", "event_type", "value").write.mode("overwrite").json(out)
    back = spark.read.schema("event_id long, event_type string, value double").json(out)
    return back.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        dec_sum("value", 2).alias("total"),
    )


@register(
    "q_csv_sink",
    oracle=f"""
SELECT event_type, CAST(count(*) AS BIGINT) AS n,
       CAST({sql_dec_sum("value", 3)} AS DOUBLE) AS total
FROM events GROUP BY event_type
""",
)
def q_csv_sink(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Results CSV sink + read-back (ref CSV writers
    `Stage 1/Python Implementation/mm_baseline.py:73-84`): write a header
    CSV with explicit schema, read it back, prove round-trip equality by
    returning the re-read aggregate.  The sum is exact fixed-point
    (dec_sum) so the CSV text is deterministic and the read-back equals
    the same aggregation computed directly on the events view — which is
    the oracle; the file side effect is on the path under test, not an
    excuse to skip the check."""
    out = tempfile.mkdtemp(prefix="mmbd_sink_")
    e = load(spark, sf_dir, "events")
    res = e.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"), dec_sum("value", 3).alias("total")
    )
    res.coalesce(1).write.mode("overwrite").option("header", True).csv(out)
    back = spark.read.option("header", True).schema("event_type string, n long, total double").csv(out)
    return back


@register(
    "q_orc_roundtrip",
    oracle=f"""
SELECT l_returnflag AS l_returnflag, CAST(count(*) AS BIGINT) AS n,
       {sql_dec_sum("l_quantity", 2)} AS total_qty
FROM lineitem WHERE l_shipdate >= DATE '1995-01-01' GROUP BY l_returnflag
""",
)
def q_orc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORC source/sink round-trip (the third columnar format Spark ships
    natively beside parquet): write a filtered lineitem slice as ORC, read
    it back, aggregate.  The aggregate equals the same aggregation on the
    original parquet, which is the oracle — value-checking the format
    conversion.  ORC reads get the same pushdown/pruning treatment as
    parquet in the scan node."""
    out = tempfile.mkdtemp(prefix="mmbd_orc_")
    l = load(spark, sf_dir, "lineitem").where(F.col("l_shipdate") >= "1995-01-01")
    l.select("l_returnflag", "l_quantity", "l_shipdate").write.mode("overwrite").orc(out)
    back = spark.read.orc(out)
    return back.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        dec_sum("l_quantity", 2).alias("total_qty"),
    )


@register(
    "q_partitioned_sink",
    oracle=f"""
SELECT CAST(count(*) AS BIGINT) AS n, {sql_dec_sum("value", 2)} AS total
FROM events WHERE event_type = 'purchase'
""",
)
def q_partitioned_sink(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hive-style partitioned write + partition-pruned read: events land as
    parquet partitioned by event_type, then the read filters to one
    partition value.  At 100 TB this is the layout that turns a full-corpus
    scan into a single-directory scan (partition pruning happens at
    planning, before any file is opened); the oracle checks the pruned
    read still returns exactly the right rows.  The pruning itself is
    asserted in tests/test_partitioning.py."""
    out = tempfile.mkdtemp(prefix="mmbd_part_")
    e = load(spark, sf_dir, "events")
    e.select("event_id", "event_type", "value").write.mode("overwrite").partitionBy(
        "event_type"
    ).parquet(out)
    back = spark.read.parquet(out).where(F.col("event_type") == "purchase")
    return back.agg(
        F.count(F.lit(1)).alias("n"),
        dec_sum("value", 2).alias("total"),
    )


@register(
    "q_compact_small_files",
    oracle="""
SELECT CAST(16 AS INT) AS n_files_before, CAST(2 AS INT) AS n_files_after,
       CAST(count(*) AS BIGINT) AS rows_before, CAST(count(*) AS BIGINT) AS rows_after
FROM events WHERE event_type = 'purchase'
""",
)
def q_compact_small_files(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-file compaction: 16 micro-batch-sized parquet files rewritten
    into 2 right-sized ones (repartition → write), with row-count equality
    proven in the result.  The outcome IS oracle-checkable even though the
    mechanism is a file side effect: repartition(k) writes exactly k
    non-empty parquet files and compaction must not change the row count,
    so the expected row equals (16, 2, n_purchase, n_purchase) computed
    straight off the events view.  The operational fix for streaming-ingest debris
    — at 100 TB a table of 10 MB files makes every scan pay per-file open
    + task-schedule cost, and the NameNode/metastore pays the listing; the
    compactor is one shuffle sized by target file count
    (rows_per_file ≈ target_bytes / avg_row_size)."""
    out = tempfile.mkdtemp(prefix="mmbd_compact_")
    e = (
        load(spark, sf_dir, "events")
        .where(F.col("event_type") == "purchase")
        .select("event_id", "user_id", "value")
    )
    e.repartition(16).write.mode("overwrite").parquet(f"{out}/small")
    small = spark.read.parquet(f"{out}/small")
    small.repartition(2).write.mode("overwrite").parquet(f"{out}/compact")
    back = spark.read.parquet(f"{out}/compact")

    def n_parquet(d: str) -> int:
        return sum(1 for f in os.listdir(d) if f.endswith(".parquet"))

    return spark.createDataFrame(
        [
            (
                n_parquet(f"{out}/small"),
                n_parquet(f"{out}/compact"),
                small.count(),
                back.count(),
            )
        ],
        "n_files_before int, n_files_after int, rows_before long, rows_after long",
    )


@register(
    "q_bucketed_join",
    oracle=f"""
SELECT o.o_orderpriority AS priority,
       CAST(count(*) AS BIGINT) AS n_items,
       {sql_dec_sum("l.l_extendedprice", 2)} AS total_price
FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
GROUP BY priority
""",
)
def q_bucketed_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bucketed co-located join: both sides land bucketed+sorted on the
    join key, so the sort-merge join runs with NO exchange and NO sort on
    either side — the storage layout IS the shuffle, paid once at write
    time.  At 100 TB this is the difference between re-shuffling the fact
    table on every query and reading it pre-placed (pair it with
    q_compact_small_files for the maintenance story).  The plan property
    is enforced here, not just in tests: if either side shuffles on the
    join key the query raises instead of returning rows."""
    wh = tempfile.mkdtemp(prefix="mmbd_bucket_")
    orders = load(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    lineitem = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_extendedprice")
    orders.write.mode("overwrite").option("path", f"{wh}/orders").bucketBy(
        8, "o_orderkey"
    ).sortBy("o_orderkey").saveAsTable("mmbd_bucketed_orders")
    lineitem.write.mode("overwrite").option("path", f"{wh}/lineitem").bucketBy(
        8, "l_orderkey"
    ).sortBy("l_orderkey").saveAsTable("mmbd_bucketed_lineitem")
    bo = spark.table("mmbd_bucketed_orders")
    bl = spark.table("mmbd_bucketed_lineitem")
    # merge hint: at fixture scale AQE would broadcast the small side,
    # which hides the co-location property under test
    joined = bo.hint("merge").join(bl, bo.o_orderkey == bl.l_orderkey)
    plan = joined._jdf.queryExecution().executedPlan().toString()
    if (
        "Exchange hashpartitioning(o_orderkey" in plan
        or "Exchange hashpartitioning(l_orderkey" in plan
    ):
        raise AssertionError(f"bucketed join shuffled a side:\n{plan}")
    return joined.groupBy(F.col("o_orderpriority").alias("priority")).agg(
        F.count(F.lit(1)).alias("n_items"),
        dec_sum("l_extendedprice", 2).alias("total_price"),
    )


@register(
    "q_python_datasource",
    oracle="""
SELECT i,
       CAST(count(*) AS BIGINT) AS n,
       round(sum(v), 6) AS row_sum
FROM (
  SELECT a.range AS i, b.range AS j,
         ((a.range * 37 + b.range) % 101) / 100.0 AS v
  FROM range(64) a CROSS JOIN range(64) b
)
GROUP BY i
""",
)
def q_python_datasource(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom scan via the Python DataSource API (sources/pyds.py): the
    deterministic `det_coo` matrix source is registered on the session,
    read as a normal format with 8 pull-based input partitions, and
    row-reduced.  Exercises the Spark-4 extension point for sources Spark
    lacks natively; the generated values are RNG-free so the whole scan is
    oracle-checked value-for-value against a DuckDB range() cross join."""
    from ..sources.pyds import register_det_coo

    register_det_coo(spark)
    m = spark.read.format("det_coo").option("n", "64").option("parts", "8").load()
    return m.groupBy("i").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("v"), 6).alias("row_sum"),
    )


_Z_BITS = 16  # bits per dimension interleaved into the 32-bit z-value


def _zvalue(df: DataFrame, ca: str, cb: str):
    """Morton z-value of two numeric columns, each first RANGE-NORMALIZED
    to the full _Z_BITS width (one min/max agg) — without normalization a
    narrow dimension's high bits are constant and the interleave
    degenerates to single-column ordering (Delta's OPTIMIZE ZORDER
    range-normalizes for the same reason).  Bit ops are pure JVM
    (shiftleft/shiftright/bitwiseAND), no UDF."""
    s = df.agg(
        F.min(ca).alias("a_lo"), F.max(ca).alias("a_hi"),
        F.min(cb).alias("b_lo"), F.max(cb).alias("b_hi"),
    ).first()
    top = (1 << _Z_BITS) - 1

    def norm(col, lo, hi):
        span = max(int(hi) - int(lo), 1)
        # long, not int: bit 15 of dimension b lands on interleaved bit 31,
        # which in an int column is the sign bit — half the rows would sort
        # "b-upper-half first" instead of canonical Morton order.
        return ((col.cast("long") - F.lit(int(lo))) * top / F.lit(span)).cast("long")

    a, b = norm(F.col(ca), s["a_lo"], s["a_hi"]), norm(F.col(cb), s["b_lo"], s["b_hi"])
    z = F.lit(0).cast("long")
    for bit in range(_Z_BITS):
        z = (
            z.bitwiseOR(F.shiftleft(F.shiftright(a, bit).bitwiseAND(F.lit(1)), 2 * bit))
            .bitwiseOR(F.shiftleft(F.shiftright(b, bit).bitwiseAND(F.lit(1)), 2 * bit + 1))
        )
    return z


@register(
    "q_zorder_sink",
    oracle=f"""
SELECT CAST(count(*) AS BIGINT) AS n, {sql_dec_sum("l_quantity", 2)} AS total_qty
FROM lineitem
WHERE l_orderkey BETWEEN 1000 AND 3000 AND l_partkey BETWEEN 500 AND 1500
""",
)
def q_zorder_sink(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order (Morton-curve) file clustering + multi-dimensional pruned
    read — the OPTIMIZE ZORDER technique: lineitem lands as parquet
    range-partitioned AND sorted by the interleaved-bit z-value of
    (l_orderkey, l_partkey), then a 2-D range filter reads it back.

    Why this layout at 100 TB: hive partitioning prunes on ONE column and
    explodes directories at high cardinality; z-ordering keeps rows close
    in BOTH dimensions inside few files, so parquet row-group min/max
    stats prune most of the table for any 2-D box predicate (each file
    covers a compact square-ish region of the key plane, not a full
    stripe).  The oracle checks the clustered read returns exactly the
    plain filter's answer; tests/test_partitioning.py asserts the
    clustering quality (per-file key spans shrink vs an unclustered
    write)."""
    out = tempfile.mkdtemp(prefix="mmbd_zorder_")
    l = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey", "l_quantity")
    (
        l.withColumn("zval", _zvalue(l, "l_orderkey", "l_partkey"))
        .repartitionByRange(8, "zval")
        .sortWithinPartitions("zval")
        .drop("zval")
        .write.mode("overwrite")
        .parquet(out)
    )
    back = spark.read.parquet(out).where(
        F.col("l_orderkey").between(1000, 3000) & F.col("l_partkey").between(500, 1500)
    )
    return back.agg(
        F.count(F.lit(1)).alias("n"),
        dec_sum("l_quantity", 2).alias("total_qty"),
    )
