"""Corpus-quality gate ops: repetition filter and PII scrub."""

from pyspark.sql import functions as F

from matrix_multiplication_bigdata_ind_assignments_spark.operators.text import q_pii_scrub, q_repetition_filter


def test_repetition_filter_is_shuffle_free(spark, sf_dir):
    plan = q_repetition_filter(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # pure projection: scan -> project, no shuffle


def test_repetition_filter_counts(spark, sf_dir):
    rows = {r["doc_id"]: r for r in q_repetition_filter(spark, sf_dir).collect()}
    df = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text").collect()
    for r in df[:50]:
        toks = r["text"].split(" ")
        grams = [" ".join(toks[i : i + 3]) for i in range(len(toks) - 2)]
        got = rows[r["doc_id"]]
        assert got["n_grams"] == len(grams)
        assert got["n_distinct"] == len(set(grams))


def test_pii_scrub_removes_every_injected_match(spark, sf_dir):
    out = q_pii_scrub(spark, sf_dir)
    # every doc got exactly one injected email and one phone
    bad = out.where((F.col("n_emails") != 1) | (F.col("n_phones") != 1)).count()
    assert bad == 0
    # scrubbing shortened or kept length (tokens replaced by short tags)
    assert out.where(F.col("len_after") >= F.col("len_before")).count() == 0


# --- unigram-LM perplexity filter --------------------------------------


def test_lm_perplexity_invariants(spark, sf_dir):
    from matrix_multiplication_bigdata_ind_assignments_spark.operators.text import q_lm_perplexity, _NLL_KEEP

    rows = q_lm_perplexity(spark, sf_dir).collect()
    # every doc tokenizes non-empty at this fixture
    assert len(rows) == 500
    for r in rows:
        assert r["n_tokens"] > 0
        # unigram MLE NLL is positive and bounded by ln(total tokens)
        assert 0.0 < r["avg_nll"] < 20.0
        assert r["keep"] == (r["avg_nll"] <= _NLL_KEEP)
    # the threshold actually splits the fixture (not vacuously all-keep)
    kept = sum(1 for r in rows if r["keep"])
    assert 0 < kept < 500


def test_lm_perplexity_deterministic(spark, sf_dir):
    from matrix_multiplication_bigdata_ind_assignments_spark.operators.text import q_lm_perplexity

    a = sorted(tuple(r) for r in q_lm_perplexity(spark, sf_dir).collect())
    b = sorted(tuple(r) for r in q_lm_perplexity(spark, sf_dir).collect())
    assert a == b


# --- Naive Bayes classifier quality filter -------------------------------


def test_quality_classifier_invariants(spark, sf_dir):
    from matrix_multiplication_bigdata_ind_assignments_spark.operators.text import q_quality_classifier

    rows = q_quality_classifier(spark, sf_dir).collect()
    assert len(rows) == 500
    for r in rows:
        assert r["n_tokens"] > 0
        # the decision rule is the sign of the integer log-odds, exactly
        assert r["pred_keep"] == (r["log_odds_micro"] > 0)
    # the trained model is non-degenerate: both predicted classes occur,
    # and prediction is not a copy of the weak label (NB generalizes /
    # errs, it doesn't memorize a one-feature rule)
    preds = {r["pred_keep"] for r in rows}
    assert preds == {True, False}
    assert any(r["pred_keep"] != r["weak_keep"] for r in rows)


def test_quality_classifier_deterministic(spark, sf_dir):
    from matrix_multiplication_bigdata_ind_assignments_spark.operators.text import q_quality_classifier

    a = sorted(tuple(r) for r in q_quality_classifier(spark, sf_dir).collect())
    b = sorted(tuple(r) for r in q_quality_classifier(spark, sf_dir).collect())
    assert a == b
