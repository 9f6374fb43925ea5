"""URL-seen layer: Bloom-filter pre-screen + exact anti-join confirm.

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

At sandbox scale the blobs are OR-merged on the driver and broadcast; on a
real cluster each partition probes only its own blob (co-partitioned by
``host_hash % n_partitions``).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from spider_spark.urlnorm import murmur3_32

# fixed filter geometry: m bits per partition blob, k hash functions.
# sized for ~1e6 urls/partition at ~1% FPR (m/n≈10, k=7); at 10^10 urls
# over 4096 partitions that is ~2.4M urls/partition → bump M_BITS 4×.
M_BITS = 1 << 23  # 8 Mbit = 1 MiB per partition blob
K_HASHES = 7


def _bit_positions(url: str) -> list[int]:
    # double hashing: h_i = h1 + i*h2 (Kirsch–Mitzenmacher), both murmur3
    h1 = murmur3_32(url, seed=42) & 0xFFFFFFFF
    h2 = (murmur3_32(url, seed=0x9747B28C) & 0xFFFFFFFF) | 1
    return [((h1 + i * h2) & 0xFFFFFFFF) % M_BITS for i in range(K_HASHES)]


def bloom_build(urls: pd.Series) -> bytes:
    """One blob from a batch of URLs (pure, arrow-batch-friendly)."""
    bits = np.zeros(M_BITS // 8, dtype=np.uint8)
    for u in urls:
        for pos in _bit_positions(u):
            bits[pos >> 3] |= 1 << (pos & 7)
    return bits.tobytes()


def bloom_merge(blobs: list[bytes]) -> bytes:
    out = np.zeros(M_BITS // 8, dtype=np.uint8)
    for b in blobs:
        out |= np.frombuffer(b, dtype=np.uint8)
    return out.tobytes()


def bloom_probe(blob: bytes, urls: pd.Series) -> pd.Series:
    """True = maybe seen; False = definitely new."""
    bits = np.frombuffer(blob, dtype=np.uint8)
    def _hit(u: str) -> bool:
        return all(bits[p >> 3] & (1 << (p & 7)) for p in _bit_positions(u))
    return urls.map(_hit)


_BLOB_SCHEMA = T.StructType(
    [
        T.StructField("partition_id", T.IntegerType()),
        T.StructField("n_urls", T.LongType()),
        T.StructField("filter_blob", T.BinaryType()),
    ]
)


def build_blobs(urls_df: DataFrame, n_partitions: int = 8) -> DataFrame:
    """Per-partition bloom blobs via grouped-map (UDAF-shaped: group state →
    binary). Partition key = murmur3(url) % n_partitions so the same URL
    always lands in — and is probed against — the same blob."""

    def _build(key, pdf):
        return pd.DataFrame(
            {
                "partition_id": [int(key[0])],
                "n_urls": [len(pdf)],
                "filter_blob": [bloom_build(pdf["url"])],
            }
        )

    keyed = urls_df.select(
        "url", (F.pmod(F.hash("url"), F.lit(n_partitions))).alias("pid")
    )
    return keyed.groupBy("pid").applyInPandas(_build, schema=_BLOB_SCHEMA)


def dedup_new_urls(
    candidates: DataFrame, seen_urls: DataFrame, blob: bytes | None = None
) -> DataFrame:
    """Candidates (col `url`) minus seen (col `url`), EXACT.

    With a blob: bloom pre-screen splits candidates into definitely-new
    (pass through, no shuffle) and maybe-seen (confirmed via left_anti).
    Without: plain left_anti (small-scale path, U4 in SURVEY.md §2.7).
    """
    if blob is None:
        return candidates.join(seen_urls, "url", "left_anti")

    @F.pandas_udf(T.BooleanType())
    def probe(urls: pd.Series) -> pd.Series:
        return bloom_probe(blob, urls)

    flagged = candidates.withColumn("_maybe_seen", probe(F.col("url")))
    definitely_new = flagged.filter(~F.col("_maybe_seen")).drop("_maybe_seen")
    maybe = flagged.filter(F.col("_maybe_seen")).drop("_maybe_seen")
    confirmed_new = maybe.join(seen_urls, "url", "left_anti")
    return definitely_new.unionByName(confirmed_new)
