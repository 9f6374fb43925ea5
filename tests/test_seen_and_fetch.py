from __future__ import annotations

import pandas as pd

from spider_spark.engine.seen import bloom_build, bloom_merge, bloom_probe
from spider_spark.engine.fetch import FlakyTransport, PagesTableTransport, fetch_with_retry


def test_bloom_no_false_negatives_and_low_fpr():
    inserted = pd.Series([f"http://h{i % 37}.test/p/{i}" for i in range(20_000)])
    blob = bloom_build(inserted)
    assert bloom_probe(blob, inserted).all()  # zero false negatives
    fresh = pd.Series([f"http://other{i % 11}.test/q/{i}" for i in range(20_000)])
    fpr = bloom_probe(blob, fresh).mean()
    assert fpr < 0.01, f"FPR too high: {fpr}"


def test_bloom_merge_is_union():
    a = pd.Series([f"http://a.test/{i}" for i in range(500)])
    b = pd.Series([f"http://b.test/{i}" for i in range(500)])
    merged = bloom_merge([bloom_build(a), bloom_build(b)])
    assert bloom_probe(merged, a).all()
    assert bloom_probe(merged, b).all()


def test_fetch_retry_semantics(world_dir):
    import os

    pages_path = os.path.join(world_dir, "pages.parquet")
    ok_url = "http://h2.test/p/0"

    # flaky url recovers within retry budget → success, attempts counted
    t = FlakyTransport(pages_path, marker="/p/1", fail_times=2)
    status, html, attempts = fetch_with_retry(t, "http://h2.test/p/1", retries=3)
    assert status == 200 and html is not None and attempts == 3

    # flaky url exceeding budget → last retryable status surfaces
    t2 = FlakyTransport(pages_path, marker="/p/1", fail_times=10)
    status, html, attempts = fetch_with_retry(t2, "http://h2.test/p/1", retries=2)
    assert status == 503 and html is None and attempts == 3  # 1 + 2 retries

    # 404 is not retryable (asyncRequest.py:9 lists only 5xx) → one attempt
    t3 = PagesTableTransport(pages_path)
    status, html, attempts = fetch_with_retry(t3, "http://h2.test/nope", retries=5)
    assert status == 404 and attempts == 1

    status, html, attempts = fetch_with_retry(t3, ok_url, retries=5)
    assert status == 200 and attempts == 1
