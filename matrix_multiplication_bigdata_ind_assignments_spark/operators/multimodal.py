"""Multimodal columns (SURVEY.md §2.3 north-star): image/audio/video as
opaque ``binary`` columns with typed metadata, processed by Arrow-batched
``mapInPandas`` kernels.

Decode status: payloads in the library-free uncompressed formats get a
REAL numpy decode — binary PPM ``P6`` and uncompressed 24/32-bit BMP via
`_decode_image` (header parse, pixel grid, luminance), and 16-bit PCM
WAV via `_decode_audio` (RIFF chunk walk, int16 sample array) — with
features, pHash, and audio stats computed from actual pixels/samples.
Compressed formats (JPEG/PNG/MP3/video) would need PIL/ffmpeg, which
this container lacks, so any payload that isn't PPM/BMP/PCM-WAV falls
back to the clearly-marked deterministic fake (`_fake_decode`).
Everything Spark-side — schema, partitioning, UDF signature, Arrow batch
shape — is identical on both paths and tested (tests/test_multimodal.py,
including real PPM/BMP/WAV fixtures).
"""

from __future__ import annotations

from typing import Iterable, Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from ..registry import register
from ..sources import load

try:  # pragma: no cover - not installed in this container
    from PIL import Image  # noqa: F401

    _HAVE_PIL = True
except ImportError:
    _HAVE_PIL = False


MEDIA_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("media_type", StringType()),
        StructField("payload", BinaryType()),
        StructField("width", LongType()),
        StructField("height", LongType()),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("media_type", StringType()),
        StructField("byte_len", LongType()),
        StructField("checksum", LongType()),
        StructField("n_frames", LongType()),
        # real pixel dimensions when the payload decoded (PPM/BMP); -1 on
        # the fake-decode fallback path
        StructField("frame_w", LongType()),
        StructField("frame_h", LongType()),
    ]
)


_IMG_W = _IMG_H = 16  # fixture image dims: 16×16 RGB = 768 payload bytes


_WAV_RATE = 8000  # fixture sample rate (8 kHz mono telephone-band PCM)


def _wav_bytes(samples, rate: int = _WAV_RATE, channels: int = 1) -> bytes:
    """Minimal RIFF/WAVE container around int16 PCM samples — header+raw
    like the PPM builder, zero dependencies."""
    import struct

    import numpy as np

    data = np.asarray(samples, dtype="<i2").tobytes()
    return (
        b"RIFF"
        + struct.pack("<I", 36 + len(data))
        + b"WAVE"
        + b"fmt "
        + struct.pack("<IHHIIHH", 16, 1, channels, rate, rate * 2 * channels, 2 * channels, 16)
        + b"data"
        + struct.pack("<I", len(data))
        + data
    )


def media_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixture media table with typed metadata — the schema a real
    image/audio table would have.  IMAGE rows carry a genuine binary-PPM
    payload (header + the document's text bytes as a 16×16 RGB pixel
    grid) and AUDIO rows a genuine 16-bit PCM WAV (RIFF header + the
    text bytes viewed as int16 samples), so the decode kernels run their
    REAL pixel/sample paths end-to-end in the driver gate; video rows
    stay opaque byte blobs and exercise the fallback path (a real video
    decoder would need ffmpeg)."""
    d = load(spark, sf_dir, "documents")
    mtype = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")), (F.col("doc_id") % 3 + 1).cast("int")
    )
    # rpad both pads AND truncates to exactly w*h*3 ascii chars = bytes
    pix = F.encode(F.rpad("text", _IMG_W * _IMG_H * 3, " "), "utf-8")
    ppm = F.concat(F.lit(f"P6\n{_IMG_W} {_IMG_H}\n255\n".encode()), pix)

    @F.pandas_udf("binary")
    def wav_payload(text_s: pd.Series) -> pd.Series:
        import numpy as np

        def one(t: str) -> bytes:
            b = (t or " ").encode("utf-8")
            n = 160 + len(b) % 160  # deterministic per-doc sample count
            reps = (2 * n + len(b) - 1) // len(b)
            return _wav_bytes(np.frombuffer((b * reps)[: 2 * n], dtype="<i2"))

        return text_s.map(one)

    return d.select(
        "doc_id",
        mtype.alias("media_type"),
        F.when(mtype == "image", ppm)
        .when(mtype == "audio", wav_payload("text"))
        .otherwise(F.encode("text", "utf-8"))
        .alias("payload"),
        F.when(mtype == "image", F.lit(_IMG_W)).otherwise(F.col("n_chars") % 640 + 16).cast("long").alias("width"),
        F.when(mtype == "image", F.lit(_IMG_H)).otherwise(F.col("n_chars") % 480 + 16).cast("long").alias("height"),
    )


def _decode_image(payload: bytes):
    """REAL decode of the library-free uncompressed image formats.

    Returns an (H, W, 3) uint8 RGB array, or None when the payload isn't
    binary PPM (``P6``) / uncompressed 24- or 32-bit BMP (``BM`` +
    BI_RGB) — callers fall back to `_fake_decode` on None.  Pure
    numpy + struct; formats needing entropy decoders (JPEG/PNG) stay
    behind the PIL gate."""
    import struct

    import numpy as np

    if payload[:2] == b"P6":
        # header: P6 <w> <h> <maxval> then ONE whitespace then raw RGB;
        # '#' comments may appear between tokens.  Opaque payloads that
        # merely START with 'P6' (e.g. text bytes) fail the parse — any
        # malformed token/comment means "not an image", never a crash.
        try:
            pos, tokens = 2, []
            while len(tokens) < 3 and pos < len(payload):
                c = payload[pos : pos + 1]
                if c.isspace():
                    pos += 1
                elif c == b"#":
                    pos = payload.index(b"\n", pos) + 1
                else:
                    end = pos
                    while end < len(payload) and not payload[end : end + 1].isspace():
                        end += 1
                    tokens.append(int(payload[pos:end]))
                    pos = end
            if len(tokens) < 3 or tokens[2] > 255 or tokens[0] <= 0 or tokens[1] <= 0:
                return None
            w, h = tokens[0], tokens[1]
            raw = payload[pos + 1 : pos + 1 + w * h * 3]
            if len(raw) < w * h * 3:
                return None
            return np.frombuffer(raw, dtype=np.uint8).reshape(h, w, 3).copy()
        except ValueError:
            return None

    if payload[:2] == b"BM" and len(payload) >= 54:
        data_off = struct.unpack_from("<I", payload, 10)[0]
        w, h = struct.unpack_from("<ii", payload, 18)
        bpp = struct.unpack_from("<H", payload, 28)[0]
        compression = struct.unpack_from("<I", payload, 30)[0]
        if compression != 0 or bpp not in (24, 32) or w <= 0 or h == 0:
            return None
        flip, h = h > 0, abs(h)
        ch = bpp // 8
        stride = (w * ch + 3) & ~3  # rows padded to 4 bytes
        if len(payload) < data_off + stride * h:
            return None
        rows = np.frombuffer(
            payload, dtype=np.uint8, count=stride * h, offset=data_off
        ).reshape(h, stride)[:, : w * ch].reshape(h, w, ch)
        if flip:
            rows = rows[::-1]
        return rows[:, :, 2::-1].copy()  # BGR(A) → RGB

    return None


def _decode_audio(payload: bytes):
    """REAL decode of 16-bit PCM WAV (the one audio format parseable with
    stdlib struct + numpy alone — VERDICT r4 task 6).

    Walks the RIFF chunk list (word-aligned), requires a ``fmt `` chunk
    declaring format 1 (PCM) at 16 bits, and returns
    ``(samples int16 ndarray, sample_rate, n_channels)`` — or None for
    anything else (compressed WAV, float WAV, non-RIFF), sending the
    caller to `_fake_decode` exactly like `_decode_image` does."""
    import struct

    import numpy as np

    if len(payload) < 44 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        return None
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        (size,) = struct.unpack_from("<I", payload, pos + 4)
        body = payload[pos + 8 : pos + 8 + size]
        if cid == b"fmt " and len(body) >= 16:
            fmt = struct.unpack_from("<HHIIHH", body, 0)
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks are 2-byte aligned
    if fmt is None or data is None:
        return None
    audio_fmt, n_ch, rate, _byte_rate, _block, bits = fmt
    if audio_fmt != 1 or bits != 16 or n_ch < 1 or rate <= 0:
        return None
    usable = len(data) // (2 * n_ch) * (2 * n_ch)
    return np.frombuffer(data[:usable], dtype="<i2"), rate, n_ch


def _fake_decode(payload: bytes) -> dict:
    """DETERMINISTIC FAKE of a media decode (no PIL/ffmpeg in container).

    Real path would be: Image.open(BytesIO(payload)) → resize → features.
    The fake derives stable pseudo-features from the raw bytes so the
    Spark-side plumbing (batching, schema, partitioning) is fully
    exercised and test-able.
    """
    s = 0
    for i, b in enumerate(payload):
        s = (s * 131 + b + i) % 1_000_003
    return {"byte_len": len(payload), "checksum": s, "n_frames": len(payload) % 30 + 1}


def decode_features(media: DataFrame) -> DataFrame:
    """mapInPandas decode/feature-extract kernel: Arrow batches in, feature
    rows out.  One Python worker per partition, vectorized transfer; the
    pattern (not the fake kernel) is the 100 TB path for multimodal
    preprocessing."""

    def decode_one(payload: bytes) -> dict:
        img = _decode_image(payload)
        if img is not None:
            return {
                "byte_len": len(payload),
                "checksum": int(img.sum(dtype="int64") % 1_000_003),
                "n_frames": 1,
                "frame_w": img.shape[1],
                "frame_h": img.shape[0],
            }
        aud = _decode_audio(payload)
        if aud is not None:
            samples, rate, n_ch = aud
            # audio features FROM THE SAMPLES: checksum over decoded PCM,
            # n_frames = per-channel sample count, (frame_w, frame_h)
            # repurposed as (sample_rate, channels) — ≠ -1 marks the real
            # decode path, same convention as images
            return {
                "byte_len": len(payload),
                "checksum": int(samples.sum(dtype="int64") % 1_000_003),
                "n_frames": len(samples) // n_ch,
                "frame_w": rate,
                "frame_h": n_ch,
            }
        # compressed/opaque payload: deterministic fake (PIL/ffmpeg-gated
        # formats would branch on _HAVE_PIL here)
        return {**_fake_decode(payload), "frame_w": -1, "frame_h": -1}

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterable[pd.DataFrame]:
        for pdf in batches:
            feats = pdf["payload"].map(decode_one)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": pdf["media_type"],
                    "byte_len": feats.map(lambda f: f["byte_len"]),
                    "checksum": feats.map(lambda f: f["checksum"]),
                    "n_frames": feats.map(lambda f: f["n_frames"]),
                    "frame_w": feats.map(lambda f: f["frame_w"]),
                    "frame_h": feats.map(lambda f: f["frame_h"]),
                }
            )

    return media.mapInPandas(kernel, schema=FEATURE_SCHEMA)


# The feature kernels ARE oracle-checkable even though they run over
# binary payloads: every payload is a deterministic function of
# documents.text (PPM = header + rpad'ed text bytes as pixels, WAV =
# header + tiled text bytes as int16 samples, video = raw text bytes into
# the fake byte-fold), and the corpus is pure ASCII (chars = bytes, which
# the builder below relies on via ord()).  The oracle recomputes each
# modality's checksum from text with DuckDB list lambdas — so payload
# construction, the RIFF/PPM header parses, int16 sample decode, and the
# Arrow batching all have to agree end-to-end for the hash to match.
# DuckDB's % follows the dividend sign (C semantics) while numpy's
# follows the divisor (Python semantics): the audio sample sum can be
# negative, hence the pmod wrapper there.
_SQL_MEDIA_FEATURES = """
  SELECT doc_id,
         ['image', 'audio', 'video'][(doc_id % 3 + 1)] AS media_type,
         list_transform(string_split(text, ''), c -> ord(c)) AS b,
         length(text) AS L,
         -- the wav builder substitutes " " for EMPTY text ((t or " "),
         -- multimodal.py wav_payload) — mirror that here (ADVICE r5:
         -- unguarded L made % La a modulo-by-zero and byte_len off by 2
         -- on an empty-text audio doc)
         CASE WHEN length(text) = 0 THEN [32] ELSE list_transform(string_split(text, ''), c -> ord(c)) END AS ab,
         greatest(length(text), 1) AS La
  FROM documents
"""
_SQL_MEDIA_CHECKSUMS = """
  SELECT doc_id, media_type,
    CAST(CASE media_type
      WHEN 'image' THEN 13 + 768
      WHEN 'audio' THEN 44 + 2 * (160 + La % 160)
      ELSE L END AS BIGINT) AS byte_len,
    CAST(CASE media_type
      WHEN 'image' THEN
        list_sum(list_transform(range(768),
          i -> CASE WHEN i < L THEN b[i + 1] ELSE 32 END)) % 1000003
      WHEN 'audio' THEN
        ((list_sum(list_transform(range(160 + La % 160),
            j -> CASE WHEN ab[(2 * j) % La + 1] + 256 * ab[(2 * j + 1) % La + 1] >= 32768
                 THEN ab[(2 * j) % La + 1] + 256 * ab[(2 * j + 1) % La + 1] - 65536
                 ELSE ab[(2 * j) % La + 1] + 256 * ab[(2 * j + 1) % La + 1] END))
          % 1000003) + 1000003) % 1000003
      ELSE
        list_reduce(list_prepend(0, list_transform(range(L), i -> b[i + 1] + i)),
                    (s, e) -> (s * 131 + e) % 1000003)
      END AS BIGINT) AS checksum,
    CAST(CASE media_type WHEN 'video' THEN L % 30 + 1
         WHEN 'audio' THEN 160 + La % 160 ELSE 1 END AS BIGINT) AS n_frames
"""


@register(
    "q_multimodal_features",
    oracle=f"""
WITH m AS ({_SQL_MEDIA_FEATURES}),
feat AS ({_SQL_MEDIA_CHECKSUMS} FROM m)
SELECT media_type, CAST(count(*) AS BIGINT) AS n_items,
       round(avg(byte_len), 6) AS avg_bytes,
       CAST(count(DISTINCT checksum) AS BIGINT) AS n_distinct_checksums
FROM feat GROUP BY media_type
""",
)
def q_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decode + feature-extract over the media table, then a per-modality
    rollup (count, avg byte length, distinct checksums).  Oracle-checked:
    see _SQL_MEDIA_CHECKSUMS — DuckDB re-derives each modality's checksum
    from the text the payload was built from."""
    feats = decode_features(media_table(spark, sf_dir))
    return feats.groupBy("media_type").agg(
        F.count(F.lit(1)).alias("n_items"),
        F.round(F.avg("byte_len"), 6).alias("avg_bytes"),
        F.countDistinct("checksum").alias("n_distinct_checksums"),
    )


@register(
    "q_multimodal_frame_sample",
    oracle=f"""
WITH m AS ({_SQL_MEDIA_FEATURES}),
feat AS ({_SQL_MEDIA_CHECKSUMS} FROM m WHERE media_type = 'video')
SELECT doc_id, CAST(unnest(range(0, n_frames, 10)) AS BIGINT) AS frame_idx, checksum
FROM feat
""",
)
def q_multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-sampling shape: for video rows, emit one row per sampled frame
    index (every 10th frame) — the explode-after-decode pattern."""
    feats = decode_features(media_table(spark, sf_dir)).where(F.col("media_type") == "video")
    return feats.select(
        "doc_id",
        F.explode(F.sequence(F.lit(0), F.col("n_frames") - 1, F.lit(10))).alias("frame_idx"),
        "checksum",
    )


_PHASH_BANDS = 8  # 64-bit hash → 8 bands of 8 bits
_PHASH_MAX_HAMMING = 10


def phash_table(media: DataFrame) -> DataFrame:
    """Perceptual-hash kernel: decode each payload to an 8×8 luminance grid
    (REAL pixels for PPM/BMP via _decode_image — Rec.601 luma +
    nearest-neighbor 8×8 downsample; byte-grid fake for opaque payloads),
    2-D DCT it (one einsum per Arrow batch, no per-row Python), threshold
    the low-frequency block at its median → a 64-bit pHash.
    Near-identical media differing in a few pixels land within a small
    Hamming distance — the image twin of SimHash."""
    import numpy as np

    schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("media_type", StringType()),
            StructField("phash", LongType()),
        ]
    )

    n = 8
    k = np.arange(n)
    # orthonormal DCT-II basis — fixed tiny matrix, baked into the closure
    D = np.sqrt(2.0 / n) * np.cos(np.pi * (2 * k[None, :] + 1) * k[:, None] / (2 * n))
    D[0, :] = np.sqrt(1.0 / n)

    def lum_grid(payload: bytes) -> "np.ndarray":
        img = _decode_image(payload)
        if img is None:  # opaque payload: byte-grid fake (see module doc)
            return np.resize(np.frombuffer(payload, dtype=np.uint8), n * n).reshape(n, n)
        lum = img @ np.array([0.299, 0.587, 0.114])  # Rec.601 luma
        if min(lum.shape) < n:
            # tiny image: repeat-sample (block-mean's reduceat boundaries
            # would repeat → zero-count cells → division by zero)
            return lum[(np.arange(n) * lum.shape[0]) // n][:, (np.arange(n) * lum.shape[1]) // n]
        # block-MEAN pooling to 8×8 (pHash's smoothing step — a
        # nearest-neighbor sample would let per-pixel noise through)
        ys = (np.arange(n) * lum.shape[0]) // n
        xs = (np.arange(n) * lum.shape[1]) // n
        pooled = np.add.reduceat(np.add.reduceat(lum, ys, axis=0), xs, axis=1)
        counts = np.outer(np.diff(np.append(ys, lum.shape[0])), np.diff(np.append(xs, lum.shape[1])))
        return pooled / counts

    def kernel(batches):
        for pdf in batches:
            grids = np.stack([lum_grid(p) for p in pdf["payload"]]).astype(np.float64)
            coeffs = np.einsum("ij,bjk,lk->bil", D, grids, D)  # batched 2-D DCT
            flat = coeffs.reshape(len(pdf), n * n)[:, 1:]  # drop DC term
            # Quantize half-up at 9 dp BEFORE median/threshold (the repo's
            # _half_up discipline): |coeff| ≤ 255·8 so the int64 units fit
            # easily, float-path differences (einsum vs any other
            # summation order) are ~1e-12 ≪ the 5e-10 half-grid, and
            # everything downstream — exact integer median of the 63 AC
            # units, strict > threshold, bit pack — is integer algebra two
            # engines reproduce bit-for-bit.  This is what lets
            # q_phash_values oracle the hash VALUES (VERDICT r10 item 6).
            cu = np.floor(flat * 1e9 + 0.5).astype(np.int64)
            med = np.sort(cu, axis=1)[:, cu.shape[1] // 2][:, None]
            bits = (cu > med).astype(np.uint64)[:, :64]
            weights = (np.uint64(1) << np.arange(63, dtype=np.uint64))[None, :]
            ph = (bits * weights).sum(axis=1).astype(np.int64)
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"], "media_type": pdf["media_type"], "phash": ph}
            )

    return media.mapInPandas(kernel, schema=schema)


def _phash_expected_rows(sf_dir: str) -> list:
    """pHash values recomputed WITHOUT Spark or the numpy kernel: DuckDB
    reads the documents table, plain-Python loops rebuild each media
    payload per media_table's spec (PPM / RIFF-WAV / raw bytes), decode
    it (reusing the pure parsing helper `_decode_image`, the
    _bpe_rules_via_duckdb reuse precedent), luma+pool it, and run an
    explicit double-loop DCT — a different summation order than the
    kernel's einsum, which is exactly what the 9-dp quantization must
    absorb.  The independent path a divergence in payload spec, decode,
    pooling, DCT, median, or bit pack would surface against."""
    import math
    import struct

    import duckdb

    con = duckdb.connect()
    try:
        docs = con.execute(
            "SELECT doc_id, text FROM read_parquet(?) ORDER BY doc_id",
            [f"{sf_dir}/documents.parquet"],
        ).fetchall()
    finally:
        con.close()

    n = 8
    D = [
        [
            math.sqrt((1.0 if i == 0 else 2.0) / n) * math.cos(math.pi * (2 * j + 1) * i / (2 * n))
            for j in range(n)
        ]
        for i in range(n)
    ]

    def grid_of(payload: bytes) -> list:
        img = _decode_image(payload)
        if img is None:
            if not payload:
                return [[0.0] * n for _ in range(n)]
            # np.resize semantics: cycle short payloads, truncate long ones
            return [
                [float(payload[(r * n + c) % len(payload)]) for c in range(n)]
                for r in range(n)
            ]
        h, w = img.shape[0], img.shape[1]
        lum = [
            [px[0] * 0.299 + px[1] * 0.587 + px[2] * 0.114 for px in row] for row in img.tolist()
        ]
        if min(h, w) < n:
            return [[lum[(r * h) // n][(c * w) // n] for c in range(n)] for r in range(n)]
        ys = [(r * h) // n for r in range(n)] + [h]
        xs = [(c * w) // n for c in range(n)] + [w]
        return [
            [
                sum(lum[y][x] for y in range(ys[r], ys[r + 1]) for x in range(xs[c], xs[c + 1]))
                / ((ys[r + 1] - ys[r]) * (xs[c + 1] - xs[c]))
                for c in range(n)
            ]
            for r in range(n)
        ]

    out = []
    for doc_id, text in docs:
        m = doc_id % 3
        mtype = ("image", "audio", "video")[m]
        if m == 0:
            body = (text or "")[: _IMG_W * _IMG_H * 3].ljust(_IMG_W * _IMG_H * 3).encode("utf-8")
            payload = f"P6\n{_IMG_W} {_IMG_H}\n255\n".encode() + body
        elif m == 1:
            b = (text or " ").encode("utf-8")
            ns = 160 + len(b) % 160
            reps = (2 * ns + len(b) - 1) // len(b)
            data = (b * reps)[: 2 * ns]
            payload = (
                b"RIFF"
                + struct.pack("<I", 36 + len(data))
                + b"WAVE"
                + b"fmt "
                + struct.pack("<IHHIIHH", 16, 1, 1, _WAV_RATE, _WAV_RATE * 2, 2, 16)
                + b"data"
                + struct.pack("<I", len(data))
                + data
            )
        else:
            payload = (text or "").encode("utf-8")
        g = grid_of(payload)
        tmp = [[sum(D[i][j] * g[j][k] for j in range(n)) for k in range(n)] for i in range(n)]
        coef = [[sum(tmp[i][k] * D[l][k] for k in range(n)) for l in range(n)] for i in range(n)]
        flat = [coef[i][l] for i in range(n) for l in range(n)][1:]
        cu = [math.floor(c * 1e9 + 0.5) for c in flat]
        med = sorted(cu)[len(cu) // 2]
        ph = 0
        for bit, c in enumerate(cu[:64]):
            if c > med:
                ph |= 1 << bit
        out.append((doc_id, mtype, ph))
    return out


_PHASH_ORACLE_MEMO: dict[str, str] = {}


def _phash_values_oracle(sf_dir: str) -> str:
    """Callable oracle for q_phash_values: the independently-recomputed
    fingerprints emitted as a VALUES list (the q_bpe_train oracle
    pattern — the 'SQL' is just the carrier for a no-Spark recompute)."""
    if sf_dir not in _PHASH_ORACLE_MEMO:
        rows = _phash_expected_rows(sf_dir)
        if rows:
            vals = ", ".join(f"({d}, '{t}', {p})" for d, t, p in rows)
            sql = (
                "SELECT CAST(doc_id AS BIGINT) AS doc_id, media_type,"
                f" CAST(phash AS BIGINT) AS phash FROM (VALUES {vals})"
                " t(doc_id, media_type, phash)"
            )
        else:  # pragma: no cover - empty fixture
            sql = (
                "SELECT CAST(NULL AS BIGINT) AS doc_id, CAST(NULL AS VARCHAR) AS media_type,"
                " CAST(NULL AS BIGINT) AS phash WHERE FALSE"
            )
        _PHASH_ORACLE_MEMO[sf_dir] = sql
    return _PHASH_ORACLE_MEMO[sf_dir]


@register("q_phash_values", oracle=_phash_values_oracle)
def q_phash_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 64-bit perceptual-hash VALUES as an ORACLE-CHECKED query
    (VERDICT r10 item 6): phash_table's full kernel — payload build,
    PPM/WAV/opaque decode, luma + block-mean pooling, 2-D DCT, 9-dp
    half-up quantization, integer median threshold, bit pack — per
    media row, hash-compared against a no-Spark plain-Python recompute
    (`_phash_expected_rows`).  With q_phash_pairs covering the pairing
    stage, only the genuinely-approximate pairing SEMANTICS of
    q_multimodal_phash_dedup remain rows-only."""
    return phash_table(media_table(spark, sf_dir)).select("doc_id", "media_type", "phash")


_SQL_PHASH_PAIRS = f"""
WITH codes AS (
  SELECT doc_id, j % 64 AS i, ord(text[j + 1]) AS c
  FROM (SELECT doc_id, text, unnest(range(length(text))) AS j FROM documents)
),
bits AS (SELECT doc_id, i, sum(c) % 2 AS bit FROM codes GROUP BY doc_id, i),
dense AS (
  SELECT d.doc_id, g.i, coalesce(b.bit, 0) AS bit
  FROM documents d CROSS JOIN (SELECT unnest(range(64)) AS i) g
  LEFT JOIN bits b ON b.doc_id = d.doc_id AND b.i = g.i
),
keys AS (
  SELECT doc_id, i // 8 AS band, sum(bit * (1 << (i % 8))) AS key
  FROM dense GROUP BY doc_id, band
),
karr AS (SELECT doc_id, list(key ORDER BY band) AS keys FROM keys GROUP BY doc_id),
cand AS (
  SELECT doc_id, keys, g.band, keys[g.band + 1] AS bk
  FROM karr, (SELECT unnest(range(8)) AS band) g
)
SELECT DISTINCT a.doc_id AS da, b.doc_id AS db,
  CAST(list_sum(list_transform(range(8), t -> bit_count(xor(a.keys[t+1], b.keys[t+1])))) AS BIGINT) AS hamming
FROM cand a JOIN cand b ON a.band = b.band AND a.bk = b.bk AND a.doc_id < b.doc_id
WHERE list_sum(list_transform(range(8), t -> bit_count(xor(a.keys[t+1], b.keys[t+1])))) <= {_PHASH_MAX_HAMMING}
"""


@register("q_phash_pairs", oracle=_SQL_PHASH_PAIRS)
def q_phash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The band-LSH PAIRING stage of perceptual-hash dedup, split out
    as its own ORACLE-CHECKED query (VERDICT r8 item 5 — the simhash
    treatment: q_multimodal_phash_dedup's DCT fingerprint kernel is
    float/numpy and stays rows-only, but everything AFTER a 64-bit
    fingerprint exists — 8×8-bit band explode, equi-join on (band,
    key), exact Hamming confirm via bit_count(XOR), dedup — is pure
    integer relational algebra, and THIS query hash-checks that whole
    stage end-to-end).

    To make the fingerprint itself portable, the DCT is replaced by a
    positional parity-fold computed IDENTICALLY in both engines with
    integer ops only: bit i = (Σ of the byte codes at text positions
    ≡ i mod 64) mod 2 (the corpus is pure ASCII — chars = bytes, the
    same invariant _SQL_MEDIA_FEATURES relies on), densified to all 64
    dims so short/empty docs get zero bits, packed into 8 one-byte band
    keys.  Near-identical texts produce near-identical folds, so the
    pairing runs over a realistic Hamming distribution (25 pairs ≤ 10
    at sf0.01), not a vacuous empty set.

    Plan shape is q_multimodal_phash_dedup's exactly: candidates form
    ONLY inside (band, key) buckets — an equi-join, never all-pairs —
    then one JVM-side bit_count XOR fold per candidate.  Scale story
    identical to simhash band-LSH: 8 index rows per item, bucket-local
    quadratic work."""
    docs = load(spark, sf_dir, "documents")
    codes = (
        docs.select("doc_id", F.posexplode(F.split("text", "")).alias("j", "ch"))
        .where(F.col("ch") != "")
        .select("doc_id", F.pmod("j", F.lit(64)).alias("i"), F.ascii("ch").alias("c"))
    )
    bits = codes.groupBy("doc_id", "i").agg(F.pmod(F.sum("c"), F.lit(2)).alias("bit"))
    dims = spark.range(64).select(F.col("id").cast("int").alias("i"))
    dense = (
        docs.select("doc_id")
        .crossJoin(F.broadcast(dims))
        .join(bits, ["doc_id", "i"], "left")
        .select("doc_id", "i", F.coalesce("bit", F.lit(0)).alias("bit"))
    )
    keys = dense.groupBy(
        "doc_id", (F.col("i") / 8).cast("int").alias("band")
    ).agg(F.sum(F.col("bit") * F.expr("shiftleft(1, i % 8)")).alias("key"))
    karr = keys.groupBy("doc_id").agg(
        F.transform(F.array_sort(F.collect_list(F.struct("band", "key"))), lambda s: s["key"]).alias(
            "keys"
        )
    )
    cand = karr.select("doc_id", "keys", F.posexplode("keys").alias("band", "bk"))
    a, b = cand.alias("a"), cand.alias("b")
    hamming = F.aggregate(
        F.zip_with(
            F.col("a.keys"), F.col("b.keys"), lambda x, y: F.bit_count(x.bitwiseXOR(y))
        ),
        F.lit(0),
        lambda acc, x: acc + x,
    ).cast("long")
    # first-matching-band emission (the simhash_pairs discipline): the
    # emitted set is duplicate-free by construction, so the distinct —
    # and its exchange of the per-band-duplicated candidate set — is
    # gone; the DuckDB oracle keeps its SELECT DISTINCT form and the
    # pair SET is identical.  Bitmap-of-matching-bands form (the
    # _is_first_block rationale), keys compared element-wise.
    matched = None
    for j in range(_PHASH_BANDS):
        term = (F.col("a.keys").getItem(j) == F.col("b.keys").getItem(j)).cast("int") * F.lit(
            1 << j
        )
        matched = term if matched is None else (matched + term)
    below = F.element_at(
        F.array(*[F.lit((1 << i) - 1) for i in range(_PHASH_BANDS)]), F.col("a.band") + 1
    )
    first_band_ok = matched.bitwiseAND(below) == 0
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bk") == F.col("b.bk"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .where((hamming <= _PHASH_MAX_HAMMING) & first_band_ok)
        .select(
            F.col("a.doc_id").alias("da"),
            F.col("b.doc_id").alias("db"),
            hamming.alias("hamming"),
        )
    )


@register("q_multimodal_phash_dedup", oracle=None)  # binary kernel → rows-only
def q_multimodal_phash_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Media near-dup via pHash + band LSH: candidates share one identical
    8-bit band of the 64-bit hash (a Hamming-≤{h} pair always shares a
    band when differing bits spread over ≤{h} of 8 bands — standard
    pigeonhole guarantee for ≤7 differing bits, probabilistic above);
    candidates are confirmed with an exact Hamming filter, JVM-side
    `bit_count(a XOR b)`.  The pair join is an equi-join on (band,
    band_key) — never all-pairs — mirroring q_dedup_minhash's shape on
    the media column."""
    ph = phash_table(media_table(spark, sf_dir)).localCheckpoint(eager=True)
    bands = ph.select(
        "doc_id",
        "phash",
        F.posexplode(
            F.array(
                *[
                    F.shiftrightunsigned(F.col("phash"), b * 8).bitwiseAND(F.lit(255))
                    for b in range(_PHASH_BANDS)
                ]
            )
        ).alias("band", "band_key"),
    )
    a = bands.alias("a")
    b = bands.alias("b")
    # duplicate-free by construction (the simhash_pairs first-block
    # discipline): a qualifying pair matches in every identical band, so
    # emit it only from the FIRST one — a per-row bit test — instead of
    # exchanging the duplicated candidate set through a distinct
    from .dedup import _is_first_block

    x = F.col("a.phash").bitwiseXOR(F.col("b.phash"))
    # two's-complement wrap: the band-7 mask 255<<56 exceeds signed
    # int64; Java long AND is bitwise on the wrapped value, so the
    # untouched-band test is unchanged
    masks = [
        (255 << (8 * bb)) - (1 << 64) if (255 << (8 * bb)) >= (1 << 63) else (255 << (8 * bb))
        for bb in range(_PHASH_BANDS)
    ]
    hamming = F.bit_count(x)
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .where((hamming <= _PHASH_MAX_HAMMING) & _is_first_block(x, F.col("a.band"), masks))
        .select(
            F.col("a.doc_id").alias("da"),
            F.col("b.doc_id").alias("db"),
            hamming.alias("hamming"),
        )
    )
