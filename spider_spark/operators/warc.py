"""WARC (ISO 28500 / WARC/1.0) sink and source — the Common-Crawl
interchange format for the crawl's fetched pages.

The reference persists fetched payloads as loose per-item files
(/root/reference/suplicmap_tilemap.py:136-145 one PNG per tile;
/root/reference/zjj_sz_gov_cn.py:27-30 one JSON line per page); the
web-archive ecosystem's equivalent is a WARC file of one record per
fetched URI. This module writes the engine's (url, warc_ts, html) rows as
``WARC-Type: resource`` records — the spec's shape for "the resource
itself, no HTTP envelope recorded" — one ``part-{partition}.warc`` per
Spark partition (partition-parallel, no driver funnel), and reads them
back through ``binaryFile`` + an Arrow-batched parser.

Pure stdlib: the record builder/parser are plain-bytes functions shared by
the executor-side writer, the reader, and the tests, so the round-trip is
byte-exact by construction.

Scale shape: one WARC per partition is exactly how Common Crawl shards
(thousands of ~1 GB warc.gz members); the writer streams a partition
iterator to disk without materializing it, and the reader parallelizes per
file. Record IDs are deterministic (md5 of url+date formatted as a
urn:uuid) so re-writing the same rows is idempotent byte-for-byte —
the property the engine's overwrite-based commit protocol relies on.
"""

from __future__ import annotations

import hashlib
import os
from datetime import datetime, timezone

from pyspark.sql import DataFrame, SparkSession

_CRLF = b"\r\n"


def _record_id(url: str, date: str) -> str:
    h = hashlib.md5((url + "\n" + date).encode("utf-8")).hexdigest()
    return (
        f"<urn:uuid:{h[0:8]}-{h[8:12]}-{h[12:16]}-{h[16:20]}-{h[20:32]}>"
    )


def warc_date(ts) -> str:
    """WARC-Date: UTC ISO-8601 with Z, second precision (the spec's
    minimum granularity)."""
    if isinstance(ts, str):
        return ts
    if ts.tzinfo is not None:
        ts = ts.astimezone(timezone.utc)
    return ts.strftime("%Y-%m-%dT%H:%M:%SZ")


def warc_resource_record(url: str, date: str, payload: bytes) -> bytes:
    """One WARC/1.0 ``resource`` record: header block, blank line, payload,
    two CRLFs (the spec's record separator)."""
    headers = [
        b"WARC/1.0",
        b"WARC-Type: resource",
        b"WARC-Target-URI: " + url.encode("utf-8"),
        b"WARC-Date: " + date.encode("ascii"),
        b"WARC-Record-ID: " + _record_id(url, date).encode("ascii"),
        b"Content-Type: text/html",
        b"Content-Length: " + str(len(payload)).encode("ascii"),
    ]
    return _CRLF.join(headers) + _CRLF + _CRLF + payload + _CRLF + _CRLF


def parse_warc_bytes(data: bytes) -> list[dict]:
    """Parse a WARC file's bytes into records — header dict + payload.
    Content-Length-driven (payloads may contain anything, including
    ``\\r\\n\\r\\n``), tolerant of trailing separators."""
    out = []
    pos = 0
    n = len(data)
    while pos < n:
        # skip inter-record separators
        while data.startswith(_CRLF, pos):
            pos += 2
        if pos >= n:
            break
        head_end = data.index(_CRLF + _CRLF, pos)
        head = data[pos:head_end].decode("utf-8")
        lines = head.split("\r\n")
        if not lines[0].startswith("WARC/"):
            raise ValueError(f"bad record header at byte {pos}: {lines[0]!r}")
        fields = {}
        for line in lines[1:]:
            k, _, v = line.partition(":")
            fields[k.strip()] = v.strip()
        length = int(fields["Content-Length"])
        body_start = head_end + 4
        payload = data[body_start : body_start + length]
        if len(payload) != length:
            raise ValueError("truncated payload")
        out.append({"version": lines[0], "headers": fields, "payload": payload})
        pos = body_start + length
    return out


def write_warc(
    df: DataFrame,
    path: str,
    url_col: str = "url",
    ts_col: str = "warc_ts",
    payload_col: str = "html",
) -> None:
    """Partition-parallel WARC sink: each partition streams its rows into
    ``part-{pid:05d}.warc`` under ``path``. On a cluster ``path`` must be
    shared/object storage (same contract as every file sink here); in
    local mode it is a directory. Empty partitions write nothing."""
    os.makedirs(path, exist_ok=True)

    def _write_partition(rows):
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        base = f"part-{pid:05d}"
        fname = os.path.join(path, base + ".warc")
        idxname = os.path.join(path, base + ".cdx")
        tmp, idxtmp = fname + ".tmp", idxname + ".tmp"
        wrote = False
        offset = 0
        with open(tmp, "wb") as f, open(idxtmp, "w") as idx:
            for row in rows:
                payload = row[payload_col]
                if isinstance(payload, str):
                    payload = payload.encode("utf-8")
                payload = bytes(payload)
                date = warc_date(row[ts_col])
                rec = warc_resource_record(row[url_col], date, payload)
                f.write(rec)
                # CDX-style index line: random access into the shard
                # without parsing it (url ts file offset length sha1)
                idx.write(
                    f"{row[url_col]} {date} {base}.warc {offset} "
                    f"{len(rec)} {hashlib.sha1(payload).hexdigest()}\n"
                )
                offset += len(rec)
                wrote = True
        if wrote:
            os.replace(tmp, fname)  # atomic publish, same as the engine
            os.replace(idxtmp, idxname)
        else:
            os.remove(tmp)
            os.remove(idxtmp)

    df.select(url_col, ts_col, payload_col).foreachPartition(_write_partition)


def read_cdx(spark: SparkSession, path: str) -> DataFrame:
    """The sink's CDX-style index as a DataFrame — the Common-Crawl
    url-index pattern: locate any record by url without scanning archive
    bytes. (url, warc_date, filename, offset, length, sha1)."""
    from pyspark.sql import functions as F

    raw = spark.read.text(os.path.join(path, "*.cdx"))
    parts = F.split("value", " ")
    return raw.select(
        parts[0].alias("url"),
        parts[1].alias("warc_date"),
        parts[2].alias("filename"),
        parts[3].cast("long").alias("offset"),
        parts[4].cast("long").alias("length"),
        parts[5].alias("sha1"),
    )


def fetch_record(path: str, filename: str, offset: int, length: int) -> dict:
    """Random-access read of ONE record via its index entry: seek+read
    exactly ``length`` bytes — the archive is never scanned. Returns the
    parsed record."""
    with open(os.path.join(path, filename), "rb") as f:
        f.seek(offset)
        data = f.read(length)
    (rec,) = parse_warc_bytes(data)
    return rec


def read_warc(spark: SparkSession, path: str) -> DataFrame:
    """WARC source: one input task per file via ``binaryFile``, records
    parsed executor-side in Arrow batches. Returns
    (url, warc_date string, payload binary)."""
    import pandas as pd

    files = spark.read.format("binaryFile").load(
        os.path.join(path, "*.warc")
    )

    def _parse(batches):
        for pdf in batches:
            rows = []
            for content in pdf["content"]:
                for rec in parse_warc_bytes(bytes(content)):
                    h = rec["headers"]
                    rows.append(
                        (
                            h["WARC-Target-URI"],
                            h["WARC-Date"],
                            rec["payload"],
                        )
                    )
            yield pd.DataFrame(
                rows, columns=["url", "warc_date", "payload"]
            )

    return files.select("content").mapInPandas(
        _parse, "url string, warc_date string, payload binary"
    )
