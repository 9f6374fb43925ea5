"""Multimodal-column plumbing: image/audio/video as opaque binary columns
with typed metadata, processed by Arrow-batched ``mapInPandas``.

The decode step is STUBBED (no image/audio libs in this container): a
deterministic fake decoder derives "pixels" from the payload bytes, and
``decode_image_real`` raises NotImplementedError with the intended library
call documented. Everything Spark-side — schema, partitioning, UDF
signature, batch shape — is real and tested, so swapping in a real decoder
is a one-function change.
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


def decode_image_real(payload: bytes):
    """Real decode slot: ``PIL.Image.open(io.BytesIO(payload))`` →
    np.asarray. Not available in this container."""
    raise NotImplementedError(
        "image decoding requires Pillow/opencv; wire PIL.Image.open here"
    )


def decode_image_fake(payload: bytes) -> np.ndarray:
    """Deterministic stand-in: tile payload bytes into an 8×8 'image'.
    Same input bytes → same pixels, so downstream stats are testable."""
    arr = np.frombuffer(payload, dtype=np.uint8)
    need = 64
    reps = int(np.ceil(need / max(len(arr), 1)))
    return np.tile(arr, reps)[:need].reshape(8, 8)


def _phash(img: np.ndarray) -> int:
    """Tiny average-hash: bit per pixel above the mean (8×8 → 64-bit)."""
    bits = (img > img.mean()).flatten()
    v = 0
    for i, b in enumerate(bits):
        if b:
            v |= 1 << i
    return v - (1 << 64) if v >= (1 << 63) else v


def image_features(df: DataFrame, id_col: str = "doc_id", bin_col: str = "payload") -> DataFrame:
    """mapInPandas feature extraction over a binary column — the pattern a
    real pipeline uses for decode/resize/embed; batch shape: one Arrow
    batch in → one metadata frame out."""

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf[id_col], pdf[bin_col]):
                img = decode_image_fake(payload)
                rows.append(
                    (
                        int(doc_id),
                        len(payload),
                        img.shape[1],
                        img.shape[0],
                        float(img.mean()),
                        _phash(img),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "n_bytes", "width", "height",
                    "mean_intensity", "phash",
                ],
            )

    return df.select(id_col, bin_col).mapInPandas(_extract, schema=IMAGE_META_SCHEMA)


@query("mm_image_features")  # fake-decode features → rows-only oracle check
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
    with the codec swapped for a deterministic byte-slice."""
    from spider_spark.urlnorm import murmur3_32

    def _sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for doc_id, payload in zip(pdf[id_col], pdf[bin_col]):
                for i, off in enumerate(range(0, len(payload), every_n_bytes)):
                    frame = bytes(payload[off : off + frame_len])
                    out.append((int(doc_id), i, frame, murmur3_32(frame)))
            yield pd.DataFrame(
                out, columns=["doc_id", "frame_idx", "frame_bytes", "frame_hash"]
            )

    return df.select(id_col, bin_col).mapInPandas(_sample, schema=FRAME_SCHEMA)


@query("mm_frame_sample")  # one-to-many decode plumbing → rows-only
def mm_frame_sample(spark, sf_dir):
    d = load(spark, sf_dir, "documents").select(
        "doc_id", F.encode("text", "utf-8").alias("payload")
    )
    return frame_sample(d).select("doc_id", "frame_idx", "frame_hash")
