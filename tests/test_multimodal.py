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


def test_phash_finds_every_exact_duplicate(spark, sf_dir):
    """Identical payloads hash identically (hamming 0) and share every
    band, so every exact-duplicate doc pair MUST appear in the pHash
    candidate output."""
    from pyspark.sql import functions as F

    from matrix_multiplication_bigdata_ind_assignments_spark.operators.multimodal import (
        q_multimodal_phash_dedup,
    )
    from matrix_multiplication_bigdata_ind_assignments_spark.sources import load

    d = load(spark, sf_dir, "documents").select("doc_id", F.md5("text").alias("k"))
    a, b = d.alias("a"), d.alias("b")
    exact = {
        (r["da"], r["db"])
        for r in a.join(
            b, (F.col("a.k") == F.col("b.k")) & (F.col("a.doc_id") < F.col("b.doc_id"))
        )
        .select(F.col("a.doc_id").alias("da"), F.col("b.doc_id").alias("db"))
        .collect()
    }
    got = {(r["da"], r["db"]): r["hamming"] for r in q_multimodal_phash_dedup(spark, sf_dir).collect()}
    assert exact <= set(got)
    assert all(got[p] == 0 for p in exact)
