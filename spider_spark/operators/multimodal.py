"""Multimodal-column plumbing: image/audio/video as opaque binary columns
with typed metadata, processed by Arrow-batched ``mapInPandas``.

Two decode paths: ``decode_image_real`` is UN-GATED for PNG via the stdlib
zlib codec (:mod:`spider_spark.operators.png` — enough for the reference's
own tile PNGs; other formats would go to Pillow, absent here), and the
deterministic fake decoder derives "pixels" from the payload bytes so the
feature pipeline stays SQL-expressible for the DuckDB value-hash oracle.
Video frame decode remains the one documented stub (no video lib in this
container). Everything Spark-side — schema, partitioning, UDF signature,
batch shape — is real and tested.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql import types as T

from spider_spark.operators import load, query

IMAGE_META_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes", T.IntegerType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("mean_intensity", T.DoubleType()),
        T.StructField("phash", T.LongType()),
    ]
)


def decode_image_real(payload: bytes) -> np.ndarray:
    """Real decode slot, un-gated: the stdlib PNG codec
    (:mod:`spider_spark.operators.png` — zlib + filter undo) handles the
    reference's own tile PNGs (/root/reference/suplicmap_tilemap.py:136-145).
    Non-PNG payloads would go to Pillow here; PNG needs no third-party lib.
    Returns uint8 (h, w) grey or (h, w, c)."""
    from spider_spark.operators.png import decode_png

    return decode_png(payload)


def to_grey8x8(img: np.ndarray) -> np.ndarray:
    """Channel-mean greyscale + 8×8 block-mean downsample — the standard
    average-hash preprocessing, feeding a real decode into the same
    ``phash_batch`` kernel the fake path uses. Requires dims divisible by
    8 (map tiles are 256×256)."""
    if img.ndim == 3:
        img = img.mean(axis=2)
    h, w = img.shape
    if h % 8 or w % 8:
        raise ValueError(f"image dims {h}x{w} not divisible by 8")
    return (
        img.reshape(8, h // 8, 8, w // 8).mean(axis=(1, 3)).astype(np.float64)
    )


def decode_image_fake(payload: bytes) -> np.ndarray:
    """Deterministic stand-in: tile payload bytes into an 8×8 'image'.
    Same input bytes → same pixels, so downstream stats are testable."""
    arr = np.frombuffer(payload, dtype=np.uint8)
    need = 64
    reps = int(np.ceil(need / max(len(arr), 1)))
    return np.tile(arr, reps)[:need].reshape(8, 8)


def _phash(img: np.ndarray) -> int:
    """Scalar average-hash reference (bit per pixel above the mean,
    8×8 → 64-bit) — kept as the parity oracle for ``phash_batch``."""
    bits = (img > img.mean()).flatten()
    v = 0
    for i, b in enumerate(bits):
        if b:
            v |= 1 << i
    return v - (1 << 64) if v >= (1 << 63) else v


def phash_batch(imgs: np.ndarray) -> np.ndarray:
    """Vectorized average-hash over a stacked (n, 8, 8) batch: per-row mean,
    bit matrix, one weighted sum — int64 via two's-complement view so bit 63
    is the sign bit exactly like the scalar reference."""
    flat = imgs.reshape(len(imgs), 64).astype(np.float64)
    bits = flat > flat.mean(axis=1, keepdims=True)
    weights = (np.uint64(1) << np.arange(64, dtype=np.uint64))
    return (bits.astype(np.uint64) * weights).sum(axis=1, dtype=np.uint64).view(
        np.int64
    )


def image_features(
    df: DataFrame,
    id_col: str = "doc_id",
    bin_col: str = "payload",
    decode: str = "fake",
) -> DataFrame:
    """mapInPandas feature extraction over a binary column — the pattern a
    real pipeline uses for decode/resize/embed; batch shape: one Arrow
    batch in → one metadata frame out. Only the decode call is per-row
    (it is the decoder slot); stats and phash are numpy over the whole
    batch. ``decode="real"`` runs the stdlib PNG decoder
    (:func:`decode_image_real`) + channel-mean/8×8 block-mean
    preprocessing; ``"fake"`` keeps the deterministic byte-math stand-in
    that the SQL oracle can reproduce."""
    if decode not in ("fake", "real"):
        raise ValueError(f"decode must be 'fake' or 'real', got {decode!r}")

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = [bytes(p) for p in pdf[bin_col]]
            n = len(payloads)
            if decode == "fake":
                imgs = (
                    np.stack([decode_image_fake(p) for p in payloads])
                    if n
                    else np.empty((0, 8, 8), dtype=np.uint8)
                )
                widths = np.full(n, 8, dtype=np.int32)
                heights = np.full(n, 8, dtype=np.int32)
                flat = imgs.reshape(n, 64).astype(np.float64)
                means = flat.mean(axis=1) if n else np.empty(0)
                small = imgs
            else:
                decoded = [decode_image_real(p) for p in payloads]
                widths = np.fromiter(
                    (d.shape[1] for d in decoded), dtype=np.int32, count=n
                )
                heights = np.fromiter(
                    (d.shape[0] for d in decoded), dtype=np.int32, count=n
                )
                means = np.fromiter(
                    (d.astype(np.float64).mean() for d in decoded),
                    dtype=np.float64,
                    count=n,
                )
                small = (
                    np.stack([to_grey8x8(d) for d in decoded])
                    if n
                    else np.empty((0, 8, 8))
                )
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64").to_numpy(),
                    "n_bytes": np.fromiter(
                        (len(p) for p in payloads), dtype=np.int32, count=n
                    ),
                    "width": widths,
                    "height": heights,
                    "mean_intensity": means,
                    "phash": phash_batch(small)
                    if n
                    else np.empty(0, dtype=np.int64),
                }
            )

    return df.select(id_col, bin_col).mapInPandas(_extract, schema=IMAGE_META_SCHEMA)


# The fake decoder is deterministic byte math (pixel i = payload byte
# i mod n, tiled to 8×8), and documents.text is ASCII at every SF, so the
# whole feature extraction is SQL-expressible: ascii(substr(...)) recovers
# the payload bytes and a HUGEINT bit-sum rebuilds the signed-64 phash.
# That converts this from a rows-only check to a full hash-checked oracle
# of the mapInPandas plumbing (batching, schema, sign handling).
_MM_IMG_ORACLE = """
WITH px AS (
  SELECT doc_id, length(text)::INT AS n_bytes,
         list_transform(range(0, 64),
                        i -> ascii(substr(text, ((i % length(text)) + 1)::INT, 1))
         ) AS pix
  FROM documents
), m AS (
  SELECT doc_id, n_bytes, pix, list_sum(pix) / 64.0 AS mean FROM px
), h AS (
  SELECT doc_id, n_bytes, mean,
    list_sum(list_transform(range(0, 64),
      i -> CASE WHEN pix[(i + 1)::INT] > mean
                THEN (1::HUGEINT << i::INT) ELSE 0::HUGEINT END)) AS raw
  FROM m
)
SELECT doc_id, n_bytes, 8 AS width, 8 AS height,
       round(mean, 4) AS mean_intensity,
       (CASE WHEN raw >= 9223372036854775808::HUGEINT
             THEN raw - 18446744073709551616::HUGEINT
             ELSE raw END)::BIGINT AS phash
FROM h
"""


@query("mm_image_features", _MM_IMG_ORACLE)
def mm_image_features(spark, sf_dir):
    """Binary-column pipeline demo: documents.text encoded to bytes stands
    in for an image payload; extract (n_bytes, dims, intensity, phash)."""
    d = load(spark, sf_dir, "documents").select(
        "doc_id", F.encode("text", "utf-8").alias("payload")
    )
    out = image_features(d)
    return out.withColumn("mean_intensity", F.round("mean_intensity", 4))


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("frame_bytes", T.BinaryType()),
        T.StructField("frame_hash", T.LongType()),
    ]
)


def frame_sample(
    df: DataFrame,
    every_n_bytes: int = 256,
    frame_len: int = 64,
    id_col: str = "doc_id",
    bin_col: str = "payload",
) -> DataFrame:
    """Video-style frame sampling as a one-to-many mapInPandas (UDTF
    shape): each binary payload emits one 'frame' per ``every_n_bytes``
    stride — the partitioning/batching pattern for real video decode,
    with the codec swapped for a deterministic byte-slice. Bookkeeping
    (frame counts, indices, offsets) and hashing are numpy over the whole
    batch; only the byte-slice itself — the decode slot — touches one
    frame at a time."""
    from spider_spark.urlnorm import murmur3_32_batch

    def _sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = list(pdf[bin_col])
            lens = np.fromiter(
                (len(p) for p in payloads), dtype=np.int64, count=len(payloads)
            )
            n_frames = -(-lens // every_n_bytes)  # ceil; 0 frames for empty
            doc_ids = np.repeat(
                pdf[id_col].astype("int64").to_numpy(), n_frames
            )
            row_of = np.repeat(np.arange(len(payloads)), n_frames)
            frame_starts = np.zeros(len(payloads), dtype=np.int64)
            np.cumsum(n_frames[:-1], out=frame_starts[1:])
            frame_idx = np.arange(int(n_frames.sum())) - frame_starts[row_of]
            offs = frame_idx * every_n_bytes
            frames = [
                bytes(payloads[r][o : o + frame_len])
                for r, o in zip(row_of, offs)
            ]
            yield pd.DataFrame(
                {
                    "doc_id": doc_ids,
                    "frame_idx": frame_idx.astype(np.int32),
                    "frame_bytes": frames,
                    "frame_hash": murmur3_32_batch(frames).astype(np.int64),
                }
            )

    return df.select(id_col, bin_col).mapInPandas(_sample, schema=FRAME_SCHEMA)


# the frame slices are substrings of the (ASCII) source text, so md5 over
# them is computable on both engines — that upgrades the one-to-many decode
# plumbing from a rows-only check to a value-hash-checked one. The murmur
# frame_hash column stays in FRAME_SCHEMA for engine use (not SQL-portable;
# its batch kernel is parity-tested in tests/test_operators.py).
_MM_FRAME_ORACLE = """
WITH f AS (
  SELECT doc_id, text,
         unnest(range(0, (length(text) + 255) // 256)) AS frame_idx
  FROM documents
)
SELECT doc_id, frame_idx::INT AS frame_idx,
       md5(substr(text, (frame_idx * 256 + 1)::INT, 64)) AS frame_md5
FROM f
"""


@query("mm_frame_sample", _MM_FRAME_ORACLE)
def mm_frame_sample(spark, sf_dir):
    d = load(spark, sf_dir, "documents").select(
        "doc_id", F.encode("text", "utf-8").alias("payload")
    )
    return frame_sample(d).select(
        "doc_id", "frame_idx", F.md5("frame_bytes").alias("frame_md5")
    )


# ---------------------------------------------------------------------------
# Audio-column plumbing: PCM-style feature extraction over a binary column.
# Real audio decode (wav/mp3) would slot into the per-row decode call; this
# container has no audio lib, so the deterministic fake "decode" treats the
# first 256 payload bytes as 8-bit PCM centered at 96 (printable ASCII
# straddles 96, so real sign changes occur). Everything Spark-side — the
# mapInPandas batching, schema, numpy feature kernels — is the real
# pipeline shape, and the byte math is SQL-expressible for a full
# value-hash oracle (same discipline as the image path above).
# ---------------------------------------------------------------------------

AUDIO_META_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_samples", T.IntegerType()),
        T.StructField("energy", T.DoubleType()),
        T.StructField("zero_crossings", T.IntegerType()),
        T.StructField("peak", T.IntegerType()),
    ]
)


def decode_audio_fake(payload: bytes, max_samples: int = 256) -> np.ndarray:
    """Deterministic stand-in decoder: first ``max_samples`` bytes as
    signed samples centered at 96. Same bytes → same waveform."""
    return (
        np.frombuffer(payload[:max_samples], dtype=np.uint8).astype(np.int64)
        - 96
    )


def audio_features(
    df: DataFrame, id_col: str = "doc_id", bin_col: str = "payload"
) -> DataFrame:
    """mapInPandas audio feature extraction: per batch, decode each payload
    (the per-row decode slot — variable-length waveforms, same pattern as
    ``image_features``) and compute energy (mean sample², exact integer
    sum then one division), zero-crossing count (strict sign flips), and
    peak |amplitude| with numpy kernels."""

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            n = len(pdf)
            n_s = np.zeros(n, dtype=np.int32)
            energy = np.zeros(n, dtype=np.float64)
            zc = np.zeros(n, dtype=np.int32)
            peak = np.zeros(n, dtype=np.int32)
            for i, p in enumerate(pdf[bin_col]):
                s = decode_audio_fake(bytes(p))
                if len(s) == 0:
                    continue
                n_s[i] = len(s)
                # explicit half-up at 4 dp: /256 makes exact .5-ulp halves
                # common, and Python round() (half-even) would disagree
                # with the SQL side there — both engines use floor(+0.5).
                energy[i] = (
                    np.floor(
                        float((s * s).sum()) * 10000.0 / len(s) + 0.5
                    )
                    / 10000.0
                )
                if len(s) > 1:
                    zc[i] = int(np.count_nonzero(s[:-1] * s[1:] < 0))
                peak[i] = int(np.abs(s).max())
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64").to_numpy(),
                    "n_samples": n_s,
                    "energy": energy,
                    "zero_crossings": zc,
                    "peak": peak,
                }
            )

    return df.select(id_col, bin_col).mapInPandas(
        _extract, schema=AUDIO_META_SCHEMA
    )


# documents.text is ASCII at every SF (asserted for the image oracle
# above), so ascii(substr(...)) - 96 reproduces the fake PCM decode and
# the whole feature kernel is SQL-expressible: exact integer sums, one
# rounded division.
_MM_AUDIO_ORACLE = """
WITH s AS (
  SELECT doc_id, least(length(text), 256)::INT AS n,
         list_transform(range(0, least(length(text), 256)::BIGINT),
                        i -> ascii(substr(text, (i + 1)::INT, 1)) - 96) AS smp
  FROM documents)
SELECT doc_id, n AS n_samples,
       floor(list_sum(list_transform(smp, x -> x * x)) * 10000.0 / n + 0.5)
         / 10000.0 AS energy,
       CAST(coalesce(list_sum(list_transform(range(0, (n - 1)::BIGINT),
              i -> CASE WHEN smp[(i + 1)::INT] * smp[(i + 2)::INT] < 0
                        THEN 1 ELSE 0 END)), 0) AS INT) AS zero_crossings,
       CAST(list_max(list_transform(smp, x -> abs(x))) AS INT) AS peak
FROM s
"""


@query("mm_audio_features", _MM_AUDIO_ORACLE)
def mm_audio_features(spark, sf_dir):
    """Audio-as-binary pipeline demo: documents.text encoded to bytes
    stands in for a PCM payload; extract (n_samples, energy,
    zero_crossings, peak) via the Arrow-batched kernel."""
    d = load(spark, sf_dir, "documents").select(
        "doc_id", F.encode("text", "utf-8").alias("payload")
    )
    return audio_features(d)
