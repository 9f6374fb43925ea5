"""URL-seen layer: partition-wise Bloom-filter pre-screen + exact anti-join.

The reference needs no seen-set — its ID windows are disjoint by
construction (/root/reference/suplicmap_vector.py:146-151). A frontier at
10^10 URLs does: the north_star names a per-partition Bloom/cuckoo filter
over canonicalized+Murmur3'd URLs built with vectorized Arrow UDFs.

Design (SURVEY.md §7 stage 3): the filter is a PRE-SCREEN only — candidates
surviving the bloom probe ("maybe new") skip the expensive confirm for the
definitely-new majority, while bloom hits are confirmed with an exact
``left_anti`` join so the seen set stays EXACT (false positives cannot drop
URLs). Filter blobs are per-partition byte arrays stored in the `seen`
table, versioned by round, so resume rebuilds nothing (hard part #1).

Scale-critical properties (both were round-1 weaknesses, now fixed):
- NO per-row Python hashing: the two Kirsch–Mitzenmacher base hashes are
  computed JVM-side — ``F.hash`` (Murmur3 x86_32 seed 42) and
  ``F.xxhash64`` — and cross Arrow as int columns; the bloom bit math is
  numpy over those arrays. No URL string is ever hashed in Python.
- NO driver-side blob merge/broadcast: candidates are co-grouped with the
  blob rows of their own partition (``pmod(hash(url), P)`` on both sides)
  and each task probes only its partition's blobs. At 10^10 URLs the
  driver never holds a filter; each executor holds 1 MiB × its partitions.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# fixed filter geometry: m bits per partition blob, k hash functions.
# sized for ~1e6 urls/partition at ~1% FPR (m/n≈10, k=7); at 10^10 urls
# over 4096 partitions that is ~2.4M urls/partition → bump M_BITS 4×.
M_BITS = 1 << 23  # 8 Mbit = 1 MiB per partition blob
K_HASHES = 7


def hash_cols(url_col):
    """The two base hashes, JVM-side (whole-stage codegen): h1 = Spark
    ``hash`` = Murmur3 x86_32 seed 42 (bit-identical to
    spider_spark.urlnorm.murmur3_32, tested); h2 = xxhash64, forced odd so
    the double-hash stride is coprime with the power-of-two bit count."""
    c = F.col(url_col) if isinstance(url_col, str) else url_col
    h1 = F.hash(c).cast("long").bitwiseAND(F.lit(0xFFFFFFFF))
    h2 = F.xxhash64(c).bitwiseAND(F.lit(0xFFFFFFFF)).bitwiseOR(F.lit(1))
    return h1, h2


def _positions(h1: np.ndarray, h2: np.ndarray) -> np.ndarray:
    """(n, K_HASHES) bit positions via double hashing
    h_i = (h1 + i*h2) mod 2^32 mod M_BITS (Kirsch–Mitzenmacher)."""
    i = np.arange(K_HASHES, dtype=np.uint64)
    h = (h1.astype(np.uint64)[:, None] + i[None, :] * h2.astype(np.uint64)[:, None])
    return ((h & np.uint64(0xFFFFFFFF)) % np.uint64(M_BITS)).astype(np.int64)


def bloom_build(h1: np.ndarray, h2: np.ndarray) -> bytes:
    """One blob from a batch of pre-hashed URLs — fully vectorized."""
    bits = np.zeros(M_BITS // 8, dtype=np.uint8)
    if len(h1):
        pos = _positions(np.asarray(h1), np.asarray(h2)).ravel()
        np.bitwise_or.at(bits, pos >> 3, (1 << (pos & 7)).astype(np.uint8))
    return bits.tobytes()


def bloom_merge(blobs: list[bytes]) -> bytes:
    out = np.zeros(M_BITS // 8, dtype=np.uint8)
    for b in blobs:
        out |= np.frombuffer(b, dtype=np.uint8)
    return out.tobytes()


def bloom_probe(blob: bytes, h1: np.ndarray, h2: np.ndarray) -> np.ndarray:
    """True = maybe seen; False = definitely new. Vectorized gather."""
    if len(h1) == 0:
        return np.zeros(0, dtype=bool)
    bits = np.frombuffer(blob, dtype=np.uint8)
    pos = _positions(np.asarray(h1), np.asarray(h2))
    hit = (bits[pos >> 3] & (1 << (pos & 7)).astype(np.uint8)) != 0
    return hit.all(axis=1)


_BLOB_SCHEMA = T.StructType(
    [
        T.StructField("partition_id", T.IntegerType()),
        T.StructField("n_urls", T.LongType()),
        T.StructField("filter_blob", T.BinaryType()),
    ]
)


def _with_hash_cols(urls_df: DataFrame, n_partitions: int) -> DataFrame:
    return urls_df.withColumns(
        {
            "_pid": F.pmod(F.hash("url"), F.lit(n_partitions)),
            "_h1": hash_cols("url")[0],
            "_h2": hash_cols("url")[1],
        }
    )


def build_blobs(urls_df: DataFrame, n_partitions: int = 8) -> DataFrame:
    """Per-partition bloom blobs via grouped-map (UDAF-shaped: group state →
    binary). Partition key = murmur3(url) % n_partitions so the same URL
    always lands in — and is probed against — the same blob. Only the two
    int hash columns cross into Python — never the URL strings."""

    def _build(key, pdf):
        return pd.DataFrame(
            {
                "partition_id": [int(key[0])],
                "n_urls": [len(pdf)],
                "filter_blob": [
                    bloom_build(pdf["_h1"].to_numpy(), pdf["_h2"].to_numpy())
                ],
            }
        )

    keyed = _with_hash_cols(urls_df.select("url"), n_partitions).select(
        "_pid", "_h1", "_h2"
    )
    return keyed.groupBy("_pid").applyInPandas(_build, schema=_BLOB_SCHEMA)


def merge_blob_rounds(blobs_df: DataFrame) -> DataFrame:
    """Compact many per-round blob rows into one row per partition_id —
    OR-merge runs executor-side per group, never on the driver."""

    def _merge(key, pdf):
        return pd.DataFrame(
            {
                "partition_id": [int(key[0])],
                "n_urls": [int(pdf["n_urls"].sum())],
                "filter_blob": [bloom_merge(list(pdf["filter_blob"]))],
            }
        )

    return blobs_df.groupBy("partition_id").applyInPandas(
        _merge, schema=_BLOB_SCHEMA
    )


def dedup_new_urls(
    candidates: DataFrame,
    seen_urls: DataFrame,
    blobs_df: DataFrame | None = None,
    n_partitions: int = 8,
) -> DataFrame:
    """Candidates (col `url`) minus seen (col `url`), EXACT.

    With blob rows: candidates are co-grouped with their own partition's
    blobs (same ``pmod(hash(url), P)`` key both sides); each task OR-merges
    and probes just that partition's blobs. Definitely-new rows pass
    through; "maybe seen" rows are confirmed with an exact ``left_anti``.
    Without blobs: plain left_anti (small-scale path, U4 in SURVEY.md §2.7).
    """
    if blobs_df is None:
        return candidates.join(seen_urls, "url", "left_anti")

    out_fields = [f for f in candidates.schema.fields] + [
        T.StructField("_maybe", T.BooleanType())
    ]
    out_schema = T.StructType(out_fields)
    cand_cols = candidates.columns

    def _probe(key, cand_pdf, blob_pdf):
        if len(cand_pdf) == 0:
            return pd.DataFrame(columns=[f.name for f in out_fields])
        out = cand_pdf[cand_cols].copy()
        if len(blob_pdf) == 0:
            out["_maybe"] = False
            return out
        blob = bloom_merge(list(blob_pdf["filter_blob"]))
        out["_maybe"] = bloom_probe(
            blob, cand_pdf["_h1"].to_numpy(), cand_pdf["_h2"].to_numpy()
        )
        return out

    keyed = _with_hash_cols(candidates, n_partitions)
    # the flagged plan is consumed by two branches below; the duplicated
    # exchanges are unified by Spark's ReuseExchange, so the shuffle
    # materializes once and only the (numpy-cheap) probe runs per branch
    flagged = (
        keyed.groupBy("_pid")
        .cogroup(blobs_df.groupBy("partition_id"))
        .applyInPandas(_probe, schema=out_schema)
    )
    definitely_new = flagged.filter(~F.col("_maybe")).drop("_maybe")
    confirmed_new = flagged.filter(F.col("_maybe")).drop("_maybe").join(
        seen_urls, "url", "left_anti"
    )
    return definitely_new.unionByName(confirmed_new)
