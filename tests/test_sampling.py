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
