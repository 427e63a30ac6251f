"""Python DataSource API (sources/pyds.py), UDTF, and VARIANT surface."""

from pyspark.sql import functions as F

from matrix_multiplication_bigdata_ind_assignments_spark.operators.text import q_udtf_tokens
from matrix_multiplication_bigdata_ind_assignments_spark.sources import load
from matrix_multiplication_bigdata_ind_assignments_spark.sources.pyds import register_det_coo


def test_det_coo_parallel_scan(spark):
    register_det_coo(spark)
    m = spark.read.format("det_coo").option("n", "16").option("parts", "4").load()
    assert m.rdd.getNumPartitions() == 4  # one task per InputPartition
    rows = {(r["i"], r["j"]): r["v"] for r in m.collect()}
    assert len(rows) == 16 * 16
    assert rows[(3, 5)] == ((3 * 37 + 5) % 101) / 100.0


def test_det_coo_idempotent_register(spark):
    register_det_coo(spark)
    register_det_coo(spark)  # re-registering the format must not raise
    assert spark.read.format("det_coo").option("n", "4").load().count() == 16


def test_udtf_fanout_matches_builtin_split(spark, sf_dir):
    got = q_udtf_tokens(spark, sf_dir)
    expected = (
        load(spark, sf_dir, "documents")
        .where(F.col("doc_id") < 100)
        .select("doc_id", F.posexplode(F.split("text", " ")).alias("pos", "token"))
    )
    assert got.count() == expected.count()
    a = sorted((r["doc_id"], r["pos"], r["token"]) for r in got.collect())
    b = sorted((r["doc_id"], r["pos"], r["token"]) for r in expected.collect())
    assert a == b


def test_variant_typed_probe(spark):
    df = spark.createDataFrame([('{"k": 41}',), ('{"k": 7}',)], ["props"])
    out = df.select(
        F.variant_get(F.parse_json("props"), "$.k", "long").alias("k"),
        F.schema_of_variant(F.parse_json("props")).alias("sch"),
    ).collect()
    assert sorted(r["k"] for r in out) == [7, 41]
    assert all(r["sch"] == "OBJECT<k: BIGINT>" for r in out)


def test_nullsafe_join_null_bucket_and_footing(spark, sf_dir):
    """The error-event null bucket must appear as ONE matched key, and
    first+second half counts must foot to the event total."""
    from matrix_multiplication_bigdata_ind_assignments_spark.operators.relational import (
        q_nullsafe_join,
    )
    from matrix_multiplication_bigdata_ind_assignments_spark.sources import load

    rows = q_nullsafe_join(spark, sf_dir).collect()
    nulls = [r for r in rows if r["is_null_key"]]
    total_events = load(spark, sf_dir, "events").count()
    n_err = load(spark, sf_dir, "events").where("event_type = 'error'").count()
    assert len(nulls) == 1
    assert nulls[0]["n_first"] + nulls[0]["n_second"] == n_err
    assert sum(r["n_first"] + r["n_second"] for r in rows) == total_events


def test_waiting_suppliers_bruteforce(spark, sf_dir):
    import datetime as dt

    from matrix_multiplication_bigdata_ind_assignments_spark.operators.relational import (
        _Q21_LATE_DAYS,
        _Q21_TOPN,
        q_waiting_suppliers,
    )
    from matrix_multiplication_bigdata_ind_assignments_spark.sources import load

    orders = {r["o_orderkey"]: r["o_orderdate"] for r in load(spark, sf_dir, "orders").collect()}
    per_order: dict = {}
    for r in load(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey", "l_shipdate").collect():
        supp, late = per_order.setdefault(r["l_orderkey"], (set(), set()))
        supp.add(r["l_suppkey"])
        if r["l_shipdate"] > orders[r["l_orderkey"]] + dt.timedelta(days=_Q21_LATE_DAYS):
            late.add(r["l_suppkey"])
    blame: dict = {}
    for supp, late in per_order.values():
        if len(supp) >= 2 and len(late) == 1:
            (s,) = late
            blame[s] = blame.get(s, 0) + 1
    expect = sorted(blame.items(), key=lambda kv: (-kv[1], kv[0]))[:_Q21_TOPN]
    got = [(r["s_suppkey"], r["n_orders"]) for r in q_waiting_suppliers(spark, sf_dir).collect()]
    assert got == expect
