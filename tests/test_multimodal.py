"""Multimodal plumbing: schema, Arrow batching, deterministic fake decode."""

from matrix_multiplication_bigdata_ind_assignments_spark.operators import multimodal as MM


def test_media_table_schema(spark, sf_dir):
    m = MM.media_table(spark, sf_dir)
    assert [f.name for f in m.schema.fields] == [
        "doc_id", "media_type", "payload", "width", "height",
    ]
    assert m.schema["payload"].dataType.typeName() == "binary"


def test_decode_features_matches_local_computation(spark, sf_dir):
    m = MM.media_table(spark, sf_dir).limit(20).cache()
    feats = {r["doc_id"]: (r["byte_len"], r["checksum"]) for r in MM.decode_features(m).collect()}
    for row in m.collect():
        expected = MM._fake_decode(bytes(row["payload"]))
        assert feats[row["doc_id"]] == (expected["byte_len"], expected["checksum"])


def test_feature_rollup_covers_all_modalities(spark, sf_dir):
    res = {r["media_type"]: r["n_items"] for r in MM.q_multimodal_features(spark, sf_dir).collect()}
    assert set(res) == {"image", "audio", "video"}
    assert sum(res.values()) == 500
