"""Fetch layer: Arrow-batched ``mapInPandas`` with retry/backoff semantics.

Re-expresses /root/reference/asyncRequest.py:31-139 (``send_http``): bounded
retries (``:61-66``), multiplicative backoff (``:68-75``), retryable status
codes {500, 502, 503, 504} (``:9``). The reference runs this per-request in
one process; here one Spark task fetches one Arrow batch of URLs, so
parallelism comes from partitioning rather than asyncio barriers.

Two transports:

- ``PagesTableTransport`` — resolves URLs against the Common-Crawl-style
  pages parquet (the sandbox's network stand-in per FIXTURES.md: "every
  fetch resolves against the pages table"). Opens the parquet once per
  executor (module-global cache) and serves lookups from an in-memory dict;
  on a real cluster this slot is an HTTP client pool or a KV store.
- ``FlakyTransport`` — deterministic failure injection for retry tests.

The engine's default fetch path is a plain ``join`` against the pages table
(fully relational, lets Catalyst/AQE plan it); ``fetch_mode="mapinpandas"``
switches to this UDF path. Both must produce identical results (tested).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

RETRYABLE = (500, 502, 503, 504)  # asyncRequest.py:9

_FETCH_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("html", T.BinaryType()),
        T.StructField("status", T.IntegerType()),
        T.StructField("attempts", T.IntegerType()),
    ]
)

_PAGES_CACHE: dict[str, dict[str, bytes]] = {}


def _load_pages(path: str) -> dict[str, bytes]:
    if path not in _PAGES_CACHE:
        import pyarrow.parquet as pq

        tbl = pq.read_table(path, columns=["url", "html"])
        _PAGES_CACHE[path] = dict(
            zip(tbl.column("url").to_pylist(), tbl.column("html").to_pylist())
        )
    return _PAGES_CACHE[path]


class PagesTableTransport:
    """fetch(url) -> (status, html) against the pages parquet."""

    def __init__(self, pages_path: str):
        self.pages_path = pages_path

    def fetch(self, url: str) -> tuple[int, bytes | None]:
        pages = _load_pages(self.pages_path)
        html = pages.get(url)
        return (200, html) if html is not None else (404, None)


class FlakyTransport(PagesTableTransport):
    """Fails the first ``fail_times`` attempts per URL matching ``marker``
    with a retryable 503 — deterministic, per-executor attempt counters."""

    def __init__(self, pages_path: str, marker: str = "/p/1", fail_times: int = 2):
        super().__init__(pages_path)
        self.marker = marker
        self.fail_times = fail_times
        self._attempts: dict[str, int] = {}

    def fetch(self, url: str) -> tuple[int, bytes | None]:
        if self.marker in url:
            n = self._attempts.get(url, 0)
            self._attempts[url] = n + 1
            if n < self.fail_times:
                return (503, None)
        return super().fetch(url)


def fetch_with_retry(
    transport, url: str, retries: int = 3, interval_s: float = 0.0, backoff: float = 1.0
) -> tuple[int, bytes | None, int]:
    """send_http semantics: retry retryable statuses up to ``retries`` times
    with multiplicative backoff. interval defaults to 0 in tests (the
    reference sleeps 5 s, asyncRequest.py:31-38)."""
    import time

    attempt = 0
    wait = interval_s
    while True:
        attempt += 1
        status, html = transport.fetch(url)
        if status == 200 or status not in RETRYABLE or attempt > retries:
            return status, html, attempt
        if wait > 0:
            time.sleep(wait)
            wait *= backoff


def fetch_map_in_pandas(
    df: DataFrame,
    transport_factory,
    retries: int = 3,
    interval_s: float = 0.0,
    backoff: float = 1.0,
) -> DataFrame:
    """df(url, ...) → (url, html, status, attempts) via mapInPandas.

    ``transport_factory`` must be a picklable zero-arg callable; the
    transport is constructed once per task (executor-side), never shipped
    from the driver.
    """

    def _run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        transport = transport_factory()
        for pdf in batches:
            rows = [
                fetch_with_retry(transport, u, retries, interval_s, backoff)
                for u in pdf["url"]
            ]
            yield pd.DataFrame(
                {
                    "url": pdf["url"].values,
                    "html": [h for _, h, _ in rows],
                    "status": pd.array([s for s, _, _ in rows], dtype="int32"),
                    "attempts": pd.array([a for _, _, a in rows], dtype="int32"),
                }
            )

    return df.select("url").mapInPandas(_run, schema=_FETCH_SCHEMA)
