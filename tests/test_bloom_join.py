"""Bloom semi-join invariants: the pre-filter admits EVERY true key (no
false negatives — the property exactness rests on) while actually pruning
the fact side, and the final result equals the plain semi join."""

from pyspark.sql import functions as F

from matrix_multiplication_bigdata_ind_assignments_spark.operators.relational import (
    _BLOOM_BITS,
    _BLOOM_HASHES,
    q_bloom_semi_join,
)
from matrix_multiplication_bigdata_ind_assignments_spark.sources import load


def _bloom_pass_keys(spark, sf_dir):
    """Distinct fact keys surviving the bloom pre-filter, reimplemented
    key-level (the query tests per-row; membership is key-determined)."""
    orders = load(spark, sf_dir, "orders")
    lineitem = load(spark, sf_dir, "lineitem")
    dim = orders.where(F.col("o_orderpriority") == "1-URGENT").select(
        F.col("o_orderkey").alias("k")
    )
    m = _BLOOM_BITS
    bloom = (
        dim.select(
            F.explode(
                F.array(*[F.pmod(F.xxhash64("k", F.lit(i)), F.lit(m)) for i in range(_BLOOM_HASHES)])
            ).alias("p")
        )
        .groupBy(F.shiftright("p", 6).alias("word_idx"))
        .agg(F.expr("bit_or(shiftleft(cast(1 as bigint), cast(p % 64 as int)))").alias("bits"))
    )
    keys = lineitem.select(F.col("l_orderkey").alias("k")).distinct()
    passed = keys
    for i in range(_BLOOM_HASHES):
        p = F.pmod(F.xxhash64("k", F.lit(i)), F.lit(m))
        b = bloom.select(F.col("word_idx").alias(f"w{i}"), F.col("bits").alias(f"bits{i}"))
        passed = (
            passed.withColumn(f"p{i}", p)
            .join(F.broadcast(b), F.shiftright(f"p{i}", 6) == F.col(f"w{i}"), "left")
            .where(
                F.expr(
                    f"bits{i} is not null and "
                    f"(bits{i} & shiftleft(cast(1 as bigint), cast(p{i} % 64 as int))) != 0"
                )
            )
            .drop(f"p{i}", f"w{i}", f"bits{i}")
        )
    return (
        {r["k"] for r in keys.collect()},
        {r["k"] for r in dim.collect()},
        {r["k"] for r in passed.collect()},
    )


def test_bloom_no_false_negatives_and_prunes(spark, sf_dir):
    all_keys, true_keys, passed = _bloom_pass_keys(spark, sf_dir)
    # every true key survives the pre-filter: exactness depends on this
    assert (true_keys & all_keys) <= passed
    # and the filter actually prunes (non-member keys mostly rejected)
    non_members = all_keys - true_keys
    false_pos = passed - true_keys
    if non_members:
        assert len(false_pos) / len(non_members) < 0.2  # fp far below pass-all


def test_bloom_semi_join_equals_plain_semi_join(spark, sf_dir):
    got = {
        r["l_returnflag"]: (r["n_items"], r["revenue"])
        for r in q_bloom_semi_join(spark, sf_dir).collect()
    }
    orders = load(spark, sf_dir, "orders")
    lineitem = load(spark, sf_dir, "lineitem")
    from matrix_multiplication_bigdata_ind_assignments_spark.functions.numeric import dec_sum

    plain = (
        lineitem.join(
            orders.where(F.col("o_orderpriority") == "1-URGENT").select("o_orderkey"),
            lineitem.l_orderkey == F.col("o_orderkey"),
            "left_semi",
        )
        .groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            dec_sum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4).alias("revenue"),
        )
    )
    want = {r["l_returnflag"]: (r["n_items"], r["revenue"]) for r in plain.collect()}
    assert got == want
