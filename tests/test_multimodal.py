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
    feats = {
        r["doc_id"]: (r["byte_len"], r["checksum"], r["frame_w"], r["frame_h"])
        for r in MM.decode_features(m).collect()
    }
    for row in m.collect():
        payload = bytes(row["payload"])
        img = MM._decode_image(payload)
        if row["media_type"] == "image":
            # image rows carry a genuine PPM → REAL pixel path
            assert img is not None and img.shape == (16, 16, 3)
            expected = (len(payload), int(img.sum(dtype="int64") % 1_000_003), 16, 16)
        elif row["media_type"] == "audio":
            # audio rows carry a genuine PCM WAV → REAL sample path
            aud = MM._decode_audio(payload)
            assert aud is not None
            samples, rate, n_ch = aud
            assert (rate, n_ch) == (MM._WAV_RATE, 1)
            expected = (len(payload), int(samples.sum(dtype="int64") % 1_000_003), rate, n_ch)
        else:
            assert img is None and MM._decode_audio(payload) is None
            f = MM._fake_decode(payload)
            expected = (f["byte_len"], f["checksum"], -1, -1)
        assert feats[row["doc_id"]] == expected


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


def _ppm(w, h, pix):
    """pix: numpy (h, w, 3) uint8 → binary PPM bytes."""
    return b"P6\n# test\n%d %d\n255\n" % (w, h) + pix.tobytes()


def _bmp24(pix):
    """pix: numpy (h, w, 3) uint8 RGB → uncompressed 24-bit BMP bytes."""
    import struct

    import numpy as np

    h, w, _ = pix.shape
    stride = (w * 3 + 3) & ~3
    rows = np.zeros((h, stride), dtype=np.uint8)
    rows[:, : w * 3] = pix[::-1, :, ::-1].reshape(h, w * 3)  # bottom-up BGR
    data = rows.tobytes()
    header = struct.pack("<2sIHHI", b"BM", 54 + len(data), 0, 0, 54) + struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(data), 2835, 2835, 0, 0
    )
    return header + data


def test_decode_image_ppm_bmp_roundtrip():
    import numpy as np

    rng = np.random.default_rng(7)
    pix = rng.integers(0, 256, size=(5, 9, 3), dtype=np.uint8)
    got_ppm = MM._decode_image(_ppm(9, 5, pix))
    got_bmp = MM._decode_image(_bmp24(pix))
    assert np.array_equal(got_ppm, pix)
    assert np.array_equal(got_bmp, pix)
    assert MM._decode_image(b"not an image at all") is None


def test_decode_audio_stdlib_wave_fixture(tmp_path):
    """A WAV written by Python's own stdlib `wave` module (an independent
    encoder) must decode to the exact samples, rate, and channel count;
    non-PCM and truncated payloads must return None."""
    import wave

    import numpy as np

    rng = np.random.default_rng(3)
    samples = rng.integers(-(2**15), 2**15, 777, dtype=np.int16)
    p = tmp_path / "fixture.wav"
    with wave.open(str(p), "wb") as w:
        w.setnchannels(2)
        w.setsampwidth(2)
        w.setframerate(44100)
        w.writeframes(samples.tobytes())
    got = MM._decode_audio(p.read_bytes())
    assert got is not None
    dec, rate, n_ch = got
    assert (rate, n_ch) == (44100, 2)
    # 777 int16 values = 388 complete 2-channel frames + 1 dangling value
    assert np.array_equal(dec, samples[:776])
    assert MM._decode_audio(b"RIFFxxxxWAVE") is None  # no chunks
    assert MM._decode_audio(b"not audio") is None
    # float-PCM (format 3) is a real WAV we can't decode → None, not junk
    bad = bytearray(MM._wav_bytes(samples[:16]))
    bad[20] = 3
    assert MM._decode_audio(bytes(bad)) is None


def test_wav_roundtrip():
    import numpy as np

    s = np.arange(-50, 50, dtype=np.int16)
    dec, rate, n_ch = MM._decode_audio(MM._wav_bytes(s))
    assert rate == MM._WAV_RATE and n_ch == 1
    assert np.array_equal(dec, s)


def test_real_decode_features_and_phash(spark):
    """PPM/BMP payloads take the REAL pixel path: decoded dims surface in
    frame_w/frame_h, and pHash is perceptual — an image and its
    lightly-noised copy sit within the Hamming threshold while its
    inverse is far away."""
    import numpy as np

    rng = np.random.default_rng(11)
    # textured base (random pixels): the pooled DCT coefficients all carry
    # real magnitude, so sign bits are stable under small noise.  (A pure
    # synthetic gradient has exactly-zero AC coefficients whose signs ARE
    # noise — a known pHash property, not a kernel defect.)
    base = rng.integers(0, 256, (32, 48, 3), dtype=np.uint8)
    noisy = np.clip(base.astype(int) + rng.integers(-6, 7, base.shape), 0, 255).astype(np.uint8)
    rows = [
        (0, "image", bytearray(_ppm(48, 32, base)), 48, 32),
        (1, "image", bytearray(_bmp24(noisy)), 48, 32),
        (2, "image", bytearray(_ppm(48, 32, 255 - base)), 48, 32),
        (3, "audio", bytearray(b"opaque-bytes-no-image-here"), 0, 0),
    ]
    media = spark.createDataFrame(rows, MM.MEDIA_SCHEMA)

    feats = {r["doc_id"]: r for r in MM.decode_features(media).collect()}
    assert (feats[0]["frame_w"], feats[0]["frame_h"]) == (48, 32)
    assert (feats[1]["frame_w"], feats[1]["frame_h"]) == (48, 32)
    assert (feats[3]["frame_w"], feats[3]["frame_h"]) == (-1, -1)  # fake path

    ph = {r["doc_id"]: r["phash"] for r in MM.phash_table(media).collect()}
    ham = lambda a, b: bin((a ^ b) & (2**64 - 1)).count("1")
    assert ham(ph[0], ph[1]) <= 10  # near-dup: tiny pixel noise
    assert ham(ph[0], ph[2]) >= 40  # inverse image flips most DCT signs


def test_empty_text_audio_doc_matches_oracle(spark, tmp_path):
    """ADVICE r5: the wav builder substitutes " " for empty text; the SQL
    oracle must mirror that guard (unguarded it divides by zero and is 2
    bytes short).  Synthetic fixture with an empty-text AUDIO doc
    (doc_id % 3 == 1) checked Spark-vs-DuckDB row for row."""
    import duckdb

    from matrix_multiplication_bigdata_ind_assignments_spark.registry import REGISTRY, _load_all

    rows = [
        (1, "", "en", "s", 0),                      # audio, EMPTY text
        (4, "some audio words here", "en", "s", 21),  # audio, normal
        (0, "an image doc body", "en", "s", 17),      # image
        (2, "a video doc body", "en", "s", 16),       # video
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    df.write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))

    _load_all()
    q = REGISTRY["q_multimodal_features"]
    got = sorted(tuple(r) for r in q.fn(spark, str(tmp_path)).collect())

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{tmp_path}/documents.parquet/*.parquet'"
    )
    want = sorted(tuple(r) for r in con.execute(q.oracle).fetchall())
    assert got == want


def test_phash_pairs_contract(spark, sf_dir):
    """q_phash_pairs (the oracle-checked pairing split, VERDICT r8 item
    5): ordered pairs, Hamming bound respected, and every pair the full
    rows-only phash query would form from the SAME fingerprints is
    found — here checked structurally (da < db, hamming ≤ bound, no
    duplicates); value correctness is the DuckDB oracle's job."""
    from matrix_multiplication_bigdata_ind_assignments_spark.operators import (
        multimodal as MM,
    )

    rows = MM.q_phash_pairs(spark, sf_dir).collect()
    assert rows, "fixture should contain near-dup folds"
    assert all(r["da"] < r["db"] for r in rows)
    assert all(0 <= r["hamming"] <= MM._PHASH_MAX_HAMMING for r in rows)
    assert len({(r["da"], r["db"]) for r in rows}) == len(rows)
