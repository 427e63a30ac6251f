"""Deterministic-sampling invariants: the properties RNG sampling lacks
(stability under partitioning; nested samples; disjoint exhaustive splits)."""

from pyspark.sql import functions as F

from matrix_multiplication_bigdata_ind_assignments_spark.operators.sampling import (
    _pct,
    q_sample_hash,
    q_stratified_sample,
    q_train_test_split,
)
from matrix_multiplication_bigdata_ind_assignments_spark.sources import load

from conftest import rows_set


def test_sample_stable_under_repartition(spark, sf_dir):
    base = rows_set(q_sample_hash(spark, sf_dir))
    d = load(spark, sf_dir, "documents").repartition(17)
    again = rows_set(d.where(_pct("doc_id") < 10).select("doc_id", "lang", "n_chars"))
    assert base == again and len(base) > 0


def test_samples_nest(spark, sf_dir):
    """Every row of the 5% sample is in the 10% sample (nested rates)."""
    d = load(spark, sf_dir, "documents")
    five = {r[0] for r in d.where(_pct("doc_id") < 5).select("doc_id").collect()}
    ten = {r[0] for r in d.where(_pct("doc_id") < 10).select("doc_id").collect()}
    assert five <= ten and len(five) < len(ten)


def test_split_partitions_corpus(spark, sf_dir):
    """Splits are disjoint and exhaustive: counts sum to the corpus size."""
    d = load(spark, sf_dir, "documents")
    total = d.count()
    splits = {r["split"]: r["n_docs"] for r in q_train_test_split(spark, sf_dir).collect()}
    assert set(splits) == {"train", "val", "test"}
    assert sum(splits.values()) == total
    assert splits["train"] > splits["val"] and splits["train"] > splits["test"]


def test_stratified_exact_k_per_stratum(spark, sf_dir):
    per_lang = (
        q_stratified_sample(spark, sf_dir)
        .groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    langs = load(spark, sf_dir, "documents").select("lang").distinct().count()
    assert len(per_lang) == langs
    assert all(r["n"] == 20 for r in per_lang)


def test_corpus_mix_hits_budget_and_is_deterministic(spark, sf_dir):
    from matrix_multiplication_bigdata_ind_assignments_spark.operators.sampling import q_corpus_mix
    from matrix_multiplication_bigdata_ind_assignments_spark.sources import load

    out = q_corpus_mix(spark, sf_dir)
    rows = {r["source"]: r for r in out.collect()}
    total_chars = load(spark, sf_dir, "documents").agg(F.sum("n_chars")).first()[0]
    kept = sum(r["chars_kept"] for r in rows.values())
    # ~50% char budget: hash bucketing is approximate, allow wide band
    assert 0.25 * total_chars < kept < 0.75 * total_chars
    # rates are valid percentages and weighting changed them per source
    assert all(0 <= r["pct_keep"] <= 100 for r in rows.values())
    assert len({r["pct_keep"] for r in rows.values()}) > 1
    # deterministic under re-run
    again = {r["source"]: r for r in q_corpus_mix(spark, sf_dir).collect()}
    assert {k: tuple(v) for k, v in rows.items()} == {k: tuple(v) for k, v in again.items()}


def test_corpus_mix_temp_apportionment_exact(spark, sf_dir):
    """Temperature mixing contract: the largest-remainder allocation
    sums EXACTLY to the half-corpus budget, every source gets a
    positive allocation, and τ=0.5 compresses shares toward uniform
    (small sources boosted, dominant sources damped)."""
    from matrix_multiplication_bigdata_ind_assignments_spark.operators.sampling import q_corpus_mix_temp
    from matrix_multiplication_bigdata_ind_assignments_spark.sources.io import load

    rows = q_corpus_mix_temp(spark, sf_dir).collect()
    assert rows
    total = load(spark, sf_dir, "documents").agg({"n_chars": "sum"}).first()[0]
    assert sum(r["alloc_chars"] for r in rows) == total // 2
    for r in rows:
        assert r["alloc_chars"] > 0
        if r["nat_share"] < 1 / len(rows):
            assert r["temp_share"] >= r["nat_share"]  # small sources boosted
        if r["nat_share"] > 1 / len(rows):
            assert r["temp_share"] <= r["nat_share"]  # dominant damped
