from __future__ import annotations

from pyspark.sql import functions as F

from spider_spark.urlnorm import canonicalize_url, host_of, murmur3_32


def test_canonicalize_basic():
    assert canonicalize_url("HTTP://H0.Test:80/p/1#frag") == "http://h0.test/p/1"
    assert canonicalize_url("https://a.b:443/x?q=1") == "https://a.b/x?q=1"
    assert canonicalize_url("https://a.b:8443/x") == "https://a.b:8443/x"
    assert canonicalize_url("http://a.b") == "http://a.b/"
    assert canonicalize_url("http://a.b/x/../y/./z") == "http://a.b/y/z"
    assert canonicalize_url("mailto:x@y.z") is None
    assert canonicalize_url("javascript:void(0)") is None
    assert canonicalize_url("/rel/path", base="http://a.b/dir/page") == "http://a.b/rel/path"
    assert canonicalize_url("sub", base="http://a.b/dir/page") == "http://a.b/dir/sub"


def test_host_of():
    assert host_of("http://h3.test/p/9") == "h3.test"
    assert host_of("https://User@A.B:8443/x") == "a.b"


def test_murmur3_spark_parity(spark):
    """Pure-Python murmur3_32 must equal Spark's hash() bit-for-bit —
    this is what lets the oracle predict partition assignment."""
    samples = [
        "",
        "a",
        "ab",
        "abc",
        "abcd",
        "http://h0.test/p/1",
        "https://a.b:8443/x?q=1&r=2",
        "中文字符串测试",
        "mixed 中英 content/with/slashes?and=params",
        "\x00\x01\xff binary-ish",
    ]
    df = spark.createDataFrame([(s,) for s in samples], ["s"])
    got = {r["s"]: r["h"] for r in df.select("s", F.hash("s").alias("h")).collect()}
    for s in samples:
        assert murmur3_32(s) == got[s], f"mismatch for {s!r}"
