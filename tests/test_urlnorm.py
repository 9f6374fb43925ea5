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


def test_sqlmurmur_duckdb_parity():
    """The generated DuckDB murmur SQL (d3/d4/t7 oracles) must be
    bit-parity with murmur3_32 — the same reference the Spark-parity test
    above pins — for ASCII inputs (all it claims; the documents fixture
    is ASCII at every SF, asserted below), and hashLong must match
    Spark's two-half mix chain."""
    import random

    import duckdb

    from spider_spark.operators.sqlmurmur import (
        hashlong_aliases,
        murmur32_string_aliases,
    )

    random.seed(13)
    samples = ["", "a", "ab", "abc", "abcd", "abcde", "the quick brown fox"]
    samples += [
        "".join(chr(random.randrange(1, 128)) for _ in range(random.randrange(0, 60)))
        for _ in range(60)
    ]
    # single quotes break the SQL literal path; feed via a table instead
    con = duckdb.connect()
    con.execute("CREATE TABLE t (s VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?)", [(s,) for s in samples])
    sql = f"SELECT s, {murmur32_string_aliases('s', 'h', 'q')} FROM t"
    for s, h in con.execute(f"SELECT s, h FROM ({sql})").fetchall():
        assert h == murmur3_32(s), repr(s)

    def _mixk1(k):
        k = (k * 0xCC9E2D51) & 0xFFFFFFFF
        k = ((k << 15) | (k >> 17)) & 0xFFFFFFFF
        return (k * 0x1B873593) & 0xFFFFFFFF

    def _mixh1(h, k):
        h ^= k
        h = ((h << 13) | (h >> 19)) & 0xFFFFFFFF
        return (h * 5 + 0xE6546B64) & 0xFFFFFFFF

    def _fmix(h, n):
        h ^= n
        h ^= h >> 16
        h = (h * 0x85EBCA6B) & 0xFFFFFFFF
        h ^= h >> 13
        h = (h * 0xC2B2AE35) & 0xFFFFFFFF
        h ^= h >> 16
        return h - (1 << 32) if h >= (1 << 31) else h

    def _hashlong(l, seed):  # Spark Murmur3_x86_32.hashLong
        u = l & 0xFFFFFFFFFFFFFFFF
        h = _mixh1(seed & 0xFFFFFFFF, _mixk1(u & 0xFFFFFFFF))
        h = _mixh1(h, _mixk1(u >> 32))
        return _fmix(h, 8)

    longs = [0, 1, -1, 2**31 - 1, -(2**31), 2**62, -(2**62), 123456789012345]
    longs += [random.randrange(-(2**63), 2**63) for _ in range(40)]
    con.execute("CREATE TABLE tl (l BIGINT)")
    con.executemany("INSERT INTO tl VALUES (?)", [(v,) for v in longs])
    sql2 = f"SELECT l, {hashlong_aliases('l', '42', 'h', 'q')} FROM tl"
    for l, h in con.execute(f"SELECT l, h FROM ({sql2})").fetchall():
        assert h == _hashlong(l, 42), l
    # chaining: seed = previous signed output (Spark's multi-column hash)
    sql3 = f"""SELECT l, h2 FROM (
      SELECT l, {hashlong_aliases('l', '42', 'h1', 'qa')},
                {hashlong_aliases('l + 7', 'h1', 'h2', 'qb')} FROM tl)"""
    for l, h in con.execute(sql3).fetchall():
        assert h == _hashlong(l + 7, _hashlong(l, 42)), l


def test_documents_fixture_is_ascii():
    """The sqlmurmur oracles read bytes via unicode(substr()) — valid only
    while documents.text is pure ASCII; pin that property of the testdata."""
    import duckdb

    for sf in ("0.001", "0.01", "0.1"):
        n = duckdb.connect().execute(
            "SELECT count(*) FROM read_parquet("
            f"'/root/testdata/sf{sf}/documents.parquet')"
            " WHERE length(text) != octet_length(encode(text))"
        ).fetchone()[0]
        assert n == 0, sf
