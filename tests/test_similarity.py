"""ANN quality: the approximate paths must be deterministic and overlap
substantially with the exact brute-force baseline."""

from matrix_multiplication_bigdata_ind_assignments_spark.operators import similarity as S


def _pairs(df):
    return {(r["query_id"], r["neighbor_id"]) for r in df.collect()}


def test_lsh_recall_and_determinism(spark, sf_dir):
    exact = _pairs(S.q_cosine_topk(spark, sf_dir))
    approx1 = _pairs(S.q_ann_lsh(spark, sf_dir))
    approx2 = _pairs(S.q_ann_lsh(spark, sf_dir))
    assert approx1 == approx2  # deterministic (md5-derived hyperplanes)
    recall = len(exact & approx1) / len(exact)
    assert recall > 0.05  # 8-bit single-table LSH on near-orthogonal vectors is coarse


def test_ivf_recall_and_determinism(spark, sf_dir):
    exact = _pairs(S.q_cosine_topk(spark, sf_dir))
    approx1 = _pairs(S.q_ann_ivf(spark, sf_dir))
    approx2 = _pairs(S.q_ann_ivf(spark, sf_dir))
    assert approx1 == approx2
    recall = len(exact & approx1) / len(exact)
    assert recall > 0.2  # 2-probe IVF over 10 cells

def test_topk_exact_has_k_rows_per_query(spark, sf_dir):
    df = S.q_cosine_topk(spark, sf_dir)
    counts = {r["query_id"]: 1 for r in df.groupBy("query_id").count().collect()}
    assert len(counts) == S._N_QUERIES
    assert df.count() == S._N_QUERIES * S._TOPK
