"""WARC sink/source round-trips and robots.txt parsing."""

from __future__ import annotations

import os

from spider_spark.engine.robots_txt import (
    parse_robots_txt,
    robots_table_from_bodies,
)
from spider_spark.operators.warc import (
    parse_warc_bytes,
    read_warc,
    warc_resource_record,
    write_warc,
)

# ---------------------------------------------------------------- WARC


def test_warc_record_roundtrip_pure():
    """Payloads survive byte-exact — including one embedding the record
    separator itself, and an empty one."""
    cases = [
        ("http://a.example/x", "2024-01-02T03:04:05Z", b"<html>hi</html>"),
        ("http://a.example/sep", "2024-01-02T03:04:06Z", b"a\r\n\r\nb"),
        ("http://b.example/", "2024-01-02T03:04:07Z", b""),
    ]
    blob = b"".join(warc_resource_record(u, d, p) for u, d, p in cases)
    recs = parse_warc_bytes(blob)
    assert len(recs) == len(cases)
    for rec, (u, d, p) in zip(recs, cases):
        assert rec["version"] == "WARC/1.0"
        h = rec["headers"]
        assert h["WARC-Type"] == "resource"
        assert h["WARC-Target-URI"] == u
        assert h["WARC-Date"] == d
        assert h["WARC-Record-ID"].startswith("<urn:uuid:")
        assert int(h["Content-Length"]) == len(p)
        assert rec["payload"] == p


def test_warc_record_id_deterministic():
    a = warc_resource_record("http://x/", "2024-01-01T00:00:00Z", b"p")
    b = warc_resource_record("http://x/", "2024-01-01T00:00:00Z", b"p")
    assert a == b


def test_warc_spark_roundtrip_and_idempotent(spark, world_dir, tmp_path):
    """pages.parquet (the brief's exact input shape: url, warc_ts, html,
    text, lang) → WARC shards → read back: url→payload map is byte-exact,
    and a second write produces identical bytes (deterministic record
    IDs + atomic publish)."""
    pages = spark.read.parquet(os.path.join(world_dir, "pages.parquet"))
    out = str(tmp_path / "warcs")
    write_warc(pages.repartition(4), out)

    shards = sorted(f for f in os.listdir(out) if f.endswith(".warc"))
    assert 1 <= len(shards) <= 4
    first = {f: open(os.path.join(out, f), "rb").read() for f in shards}

    got = {
        r["url"]: bytes(r["payload"])
        for r in read_warc(spark, out).collect()
    }
    want = {
        r["url"]: r["html"].encode("utf-8")
        if isinstance(r["html"], str)
        else bytes(r["html"])
        for r in pages.collect()
    }
    assert got == want

    write_warc(pages.repartition(4), out)
    second = {f: open(os.path.join(out, f), "rb").read() for f in shards}
    assert first == second


# ---------------------------------------------------------- robots.txt

ROBOTS = """
# comments are ignored
User-agent: googlebot
Disallow: /private/
Crawl-delay: 1.5

User-agent: spider
User-agent: otherbot
Disallow: /tmp/
Disallow: /draft/
Allow: /tmp/ok/
Crawl-delay: 2

User-agent: *
Disallow:
Crawl-delay: 0.5
"""


def test_robots_group_selection():
    g = parse_robots_txt(ROBOTS, "spider")
    assert g["disallow"] == ["/tmp/", "/draft/"]
    assert g["allow"] == ["/tmp/ok/"]
    assert g["crawl_delay_ms"] == 2000

    # consecutive User-agent lines share the group
    assert parse_robots_txt(ROBOTS, "otherbot")["disallow"] == [
        "/tmp/",
        "/draft/",
    ]

    # product-token prefix match: 'spider/2.1' matches the 'spider' group
    assert parse_robots_txt(ROBOTS, "Spider/2.1")["crawl_delay_ms"] == 2000

    # unknown agent falls back to '*': empty Disallow = allow all
    star = parse_robots_txt(ROBOTS, "nobody")
    assert star["disallow"] == []
    assert star["crawl_delay_ms"] == 500


def test_robots_edge_cases():
    # rules before any User-agent line are treated as a '*' group
    g = parse_robots_txt("Disallow: /x/\n", "any")
    assert g["disallow"] == ["/x/"]
    # empty body / no groups
    assert parse_robots_txt("", "any") == {
        "disallow": [],
        "allow": [],
        "crawl_delay_ms": None,
    }
    # malformed crawl-delay ignored, keys case-insensitive
    g = parse_robots_txt(
        "USER-AGENT: *\nDISALLOW: /a\nCRAWL-DELAY: soon\n", "any"
    )
    assert g["disallow"] == ["/a"] and g["crawl_delay_ms"] is None


def test_robots_bodies_to_engine_table(spark):
    """(host, body) → politeness schema, and the resulting prefixes drive
    the engine's disallowed_col exactly."""
    import pyspark.sql.functions as F

    from spider_spark.engine.politeness import disallowed_col

    bodies = spark.createDataFrame(
        [
            ("a.example", "User-agent: *\nDisallow: /secret/\nCrawl-delay: 3"),
            ("b.example", ""),
            ("c.example", None),
        ],
        "host string, body string",
    )
    table = robots_table_from_bodies(bodies, user_agent="spider")
    rows = {r["host"]: r for r in table.collect()}
    assert rows["a.example"]["disallow_prefixes"] == ["/secret/"]
    assert rows["a.example"]["crawl_delay_ms"] == 3000
    assert rows["b.example"]["disallow_prefixes"] == []
    assert rows["c.example"]["crawl_delay_ms"] == 0

    urls = spark.createDataFrame(
        [
            ("http://a.example/secret/x.html", "a.example"),
            ("http://a.example/public/x.html", "a.example"),
            ("http://b.example/anything", "b.example"),
        ],
        "url string, host string",
    )
    flagged = {
        r["url"]: r["blocked"]
        for r in urls.join(table, "host")
        .select(
            "url",
            disallowed_col(F.col("url"), F.col("disallow_prefixes")).alias(
                "blocked"
            ),
        )
        .collect()
    }
    assert flagged == {
        "http://a.example/secret/x.html": True,
        "http://a.example/public/x.html": False,
        "http://b.example/anything": False,
    }


def test_cdx_index_random_access(spark, world_dir, tmp_path):
    """Every CDX entry seeks to exactly one parseable record whose url,
    date, and payload digest match the index line — no archive scan."""
    import hashlib

    from spider_spark.operators.warc import fetch_record, read_cdx

    pages = spark.read.parquet(os.path.join(world_dir, "pages.parquet"))
    out = str(tmp_path / "warcs_cdx")
    write_warc(pages.repartition(3), out)

    idx = read_cdx(spark, out).collect()
    assert len(idx) == pages.count()
    assert len({r["url"] for r in idx}) == len(idx)
    for r in idx[:10] + idx[-10:]:
        rec = fetch_record(out, r["filename"], r["offset"], r["length"])
        h = rec["headers"]
        assert h["WARC-Target-URI"] == r["url"]
        assert h["WARC-Date"] == r["warc_date"]
        assert hashlib.sha1(rec["payload"]).hexdigest() == r["sha1"]
