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


# ---------------------------------------------------------------------------
# d13 — perceptual-hash image near-dup: the multimodal×dedup composition
# (mapInPandas phash path feeding a d4-style Hamming band join)
# ---------------------------------------------------------------------------

_D13_BANDS = 4
_D13_BAND_BITS = 16
_D13_HAMMING_MAX = 3  # pigeonhole-complete with 4 bands

# Variant corpus: every document contributes its payload twice — verbatim
# (img_id = 2·doc_id) and with the first two characters swapped
# (img_id = 2·doc_id + 1). The fake image is the first 64 payload bytes,
# so for payloads ≥ 64 bytes the swap touches only pixels 0/1 and keeps
# the mean: those planted pairs are within Hamming distance 2 BY
# CONSTRUCTION. Shorter payloads tile (pixel i = byte i mod len) and may
# drift past the threshold — deterministically, identically, in both
# engines. Unrelated 64-bit hashes collide within 3 with probability
# ~2e-14, so the output is exactly the surviving planted (and
# exact-duplicate-text) pairs on any fixture.
_D13_VARIANTS = """
v AS (
  SELECT doc_id * 2 AS img_id, source, text AS payload FROM documents
  UNION ALL
  SELECT doc_id * 2 + 1, source,
         substr(text, 2, 1) || substr(text, 1, 1) || substr(text, 3)
  FROM documents
)"""

_D13_BAND_SELECTS = "\n      UNION ALL ".join(
    f"SELECT img_id, source, phash, {i} AS band,"
    f" (phash >> {i * _D13_BAND_BITS}) & {(1 << _D13_BAND_BITS) - 1} AS bits"
    " FROM h"
    for i in range(_D13_BANDS)
)

_D13_ORACLE = f"""
WITH {_D13_VARIANTS},
px AS (
  SELECT img_id, source,
         list_transform(range(0, 64),
           i -> ascii(substr(payload, ((i % length(payload)) + 1)::INT, 1))
         ) AS pix
  FROM v
), m AS (
  SELECT img_id, source, pix, list_sum(pix) / 64.0 AS mean FROM px
), h AS (
  SELECT img_id, source,
    (CASE WHEN raw >= 9223372036854775808::HUGEINT
          THEN raw - 18446744073709551616::HUGEINT
          ELSE raw END)::BIGINT AS phash
  FROM (
    SELECT img_id, source,
      list_sum(list_transform(range(0, 64),
        i -> CASE WHEN pix[(i + 1)::INT] > mean
                  THEN (1::HUGEINT << i::INT) ELSE 0::HUGEINT END)) AS raw
    FROM m)
), bands AS (
      {_D13_BAND_SELECTS}
)
SELECT DISTINCT a.img_id AS id_a, b.img_id AS id_b,
       CAST(bit_count(xor(a.phash, b.phash)) AS INT) AS hamming
FROM bands a JOIN bands b
  ON a.source = b.source AND a.band = b.band AND a.bits = b.bits
 AND a.img_id < b.img_id
WHERE bit_count(xor(a.phash, b.phash)) <= {_D13_HAMMING_MAX}
"""


@query("d13_phash_neardup", _D13_ORACLE)
def d13_phash_neardup(spark, sf_dir):
    """Perceptual-hash image near-dup — the multimodal×dedup composition:
    the SAME Arrow-batched ``image_features`` mapInPandas kernel that
    mm_image_features exercises feeds a d4-style pigeonhole band join
    (4 bands × 16 bits → Hamming ≤ 3 complete), blocked by source so no
    global band group ever holds a whole corpus. Near-dup images are
    planted deterministically (first-two-character swap: for ≥ 64-byte
    payloads it touches only pixels 0–1 and preserves the mean, so the
    pair differs in ≤ 2 hash bits), making the result exact and
    fixture-independent.

    Scale shape: phash extraction is the batched numpy kernel (decode slot
    per row, everything else whole-batch); candidates come only from
    (source, band, bits) equi-groups — ~corpus/(sources·2^16) images per
    group — and the exact bit_count(xor) verify runs on candidates only.
    The one corpus-sized exchange beyond the band join is the thin
    (img_id ⋈ source) attach after the fixed-schema mapInPandas (the
    kernel's output schema is the shared IMAGE_META_SCHEMA, which does
    not carry block keys)."""
    d = load(spark, sf_dir, "documents")
    variants = d.select(
        (F.col("doc_id") * 2).alias("img_id"),
        "source",
        F.col("text").alias("payload_s"),
    ).unionByName(
        d.select(
            (F.col("doc_id") * 2 + 1).alias("img_id"),
            "source",
            F.concat(
                F.expr("substr(text, 2, 1)"),
                F.expr("substr(text, 1, 1)"),
                F.expr("substr(text, 3)"),
            ).alias("payload_s"),
        )
    )
    feats = image_features(
        variants.select(
            "img_id", F.encode("payload_s", "utf-8").alias("payload")
        ),
        id_col="img_id",
    ).select(F.col("doc_id").alias("img_id"), "phash")
    docs = feats.join(variants.select("img_id", "source"), "img_id")
    mask = (1 << _D13_BAND_BITS) - 1
    bands = docs.select(
        "img_id",
        "source",
        "phash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("band"),
                        F.shiftright(F.col("phash"), i * _D13_BAND_BITS)
                        .bitwiseAND(F.lit(mask))
                        .alias("bits"),
                    )
                    for i in range(_D13_BANDS)
                ]
            )
        ).alias("bb"),
    ).select("img_id", "source", "phash", "bb.band", "bb.bits")
    a, b = bands.alias("a"), bands.alias("b")
    hamming = F.bit_count(F.col("a.phash").bitwiseXOR(F.col("b.phash")))
    return (
        a.join(
            b,
            (F.col("a.source") == F.col("b.source"))
            & (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bits") == F.col("b.bits"))
            & (F.col("a.img_id") < F.col("b.img_id")),
        )
        .filter(hamming <= _D13_HAMMING_MAX)
        .select(
            F.col("a.img_id").alias("id_a"),
            F.col("b.img_id").alias("id_b"),
            hamming.cast("int").alias("hamming"),
        )
        .distinct()
    )
