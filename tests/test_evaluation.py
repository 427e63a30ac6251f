"""Model-evaluation invariants: the exact Mann-Whitney AUC must equal
the O(n_pos * n_neg) pairwise definition, the confusion row must foot to
the doc count, and the calibration table must be balanced + ordered."""

import math

from matrix_multiplication_bigdata_ind_assignments_spark.operators.evaluation import (
    q_calibration,
    q_classifier_auc,
)
from matrix_multiplication_bigdata_ind_assignments_spark.operators.text import (
    q_quality_classifier,
)


def test_auc_equals_pairwise_definition(spark, sf_dir):
    clf = q_quality_classifier(spark, sf_dir).collect()
    pos = [r["log_odds_micro"] for r in clf if r["weak_keep"]]
    neg = [r["log_odds_micro"] for r in clf if not r["weak_keep"]]
    wins = sum((p > n) + 0.5 * (p == n) for p in pos for n in neg)
    expect = math.floor(wins / (len(pos) * len(neg)) * 1e6 + 0.5) / 1e6

    r = q_classifier_auc(spark, sf_dir).collect()[0]
    assert r["auc"] == expect
    assert r["n_pos"] == len(pos) and r["n_neg"] == len(neg)
    # confusion foots to the corpus and matches the shipped threshold
    assert r["tp"] + r["fp"] + r["fn"] + r["tn"] == len(clf)
    assert r["tp"] == sum(1 for x in clf if x["weak_keep"] and x["pred_keep"])
    # the trained gate must actually rank (far from a coin flip)
    assert r["auc"] > 0.6
    # precision/recall/f1 recompute
    assert r["precision"] == math.floor(r["tp"] / (r["tp"] + r["fp"]) * 1e6 + 0.5) / 1e6
    assert r["recall"] == math.floor(r["tp"] / (r["tp"] + r["fn"]) * 1e6 + 0.5) / 1e6


def test_calibration_balanced_and_ordered(spark, sf_dir):
    rows = sorted(q_calibration(spark, sf_dir).collect(), key=lambda r: r["bucket"])
    total = sum(r["n_docs"] for r in rows)
    clf_n = q_quality_classifier(spark, sf_dir).count()
    assert total == clf_n
    assert [r["bucket"] for r in rows] == list(range(len(rows)))
    # deciles: every bucket within a loose balance envelope
    for r in rows:
        assert r["n_docs"] >= total // 20, rows
    # bucket score ranges are disjoint and ordered; mean inside [lo, hi]
    for a, b in zip(rows, rows[1:]):
        assert a["hi_micro"] <= b["lo_micro"]
    for r in rows:
        assert r["lo_micro"] / 1e6 - 1e-6 <= r["mean_log_odds"] <= r["hi_micro"] / 1e6 + 1e-6
    # a ranking classifier must be directionally calibrated:
    # the top decile keeps more than the bottom one
    assert rows[-1]["frac_pos"] > rows[0]["frac_pos"]


def test_auc_width_guard_fires(spark, sf_dir, monkeypatch):
    """The in-plan SinglePartition rank-walk guard (VERDICT r10
    watch-list): with the bound lowered below the fixture's distinct
    scores the query must raise instead of silently running a
    corpus-wide one-task window; at the shipped bound it passes."""
    import pytest

    from matrix_multiplication_bigdata_ind_assignments_spark.operators import evaluation as EV

    monkeypatch.setattr(EV, "_AUC_MAX_DISTINCT", 1)
    with pytest.raises(Exception, match="rank-walk guard"):
        EV.q_classifier_auc(spark, sf_dir).collect()
