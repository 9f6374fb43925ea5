"""Sitemap ingestion tests: stdlib parser edge cases, gzip handling, the
index recursion (dedup + cycle termination), and the bridge into the
engine's seed schema."""

from __future__ import annotations

import gzip

from pyspark.sql import functions as F

from spider_spark.engine.sitemaps import (
    discover_seeds,
    parse_sitemap,
    seeds_for_engine,
    seeds_from_sitemaps,
)

_NS = 'xmlns="http://www.sitemaps.org/schemas/sitemap/0.9"'


def _urlset(*entries):
    body = [f"<urlset {_NS}>"]
    for loc, lastmod, prio in entries:
        body.append("<url><loc>%s</loc>" % loc)
        if lastmod:
            body.append(f"<lastmod>{lastmod}</lastmod>")
        if prio:
            body.append(f"<priority>{prio}</priority>")
        body.append("</url>")
    body.append("</urlset>")
    return "".join(body)


def _index(*locs):
    inner = "".join(f"<sitemap><loc>{x}</loc></sitemap>" for x in locs)
    return f"<sitemapindex {_NS}>{inner}</sitemapindex>"


def test_parse_urlset_fields_and_defaults():
    got = parse_sitemap(
        _urlset(
            ("http://a/x", "2024-03-01", "0.8"),
            ("http://a/y", "2024-03-01T12:30:00Z", None),
            ("http://a/z", None, "bogus"),
        )
    )
    assert got["sitemaps"] == []
    by_loc = {u["loc"]: u for u in got["urls"]}
    assert by_loc["http://a/x"]["priority_ppm"] == 800_000
    assert by_loc["http://a/x"]["lastmod_ms"] == 1709251200000
    assert by_loc["http://a/y"]["lastmod_ms"] == 1709296200000
    assert by_loc["http://a/y"]["priority_ppm"] == 500_000  # default
    assert by_loc["http://a/z"]["lastmod_ms"] is None
    assert by_loc["http://a/z"]["priority_ppm"] == 500_000  # unparsable


def test_parse_tolerates_gzip_no_namespace_and_garbage():
    plain = "<urlset><url><loc>http://h/p</loc></url></urlset>"
    assert parse_sitemap(plain)["urls"][0]["loc"] == "http://h/p"
    gz = gzip.compress(_urlset(("http://h/q", None, None)).encode())
    assert parse_sitemap(gz)["urls"][0]["loc"] == "http://h/q"
    for bad in (None, "", "not xml <", b"\x1f\x8b broken gzip", "<other/>"):
        got = parse_sitemap(bad)
        assert got == {"urls": [], "sitemaps": []}


def test_index_recursion_dedups_and_terminates(spark):
    """Two indexes referencing a shared child, plus a cycle back to the
    root: every urlset parses once, the cycle terminates, and a url listed
    twice keeps its best priority."""
    world = {
        "http://h/sitemap.xml": _index(
            "http://h/idx2.xml", "http://h/map_a.xml"
        ),
        "http://h/idx2.xml": _index(
            "http://h/map_a.xml",  # shared child
            "http://h/map_b.xml",
            "http://h/sitemap.xml",  # cycle
        ),
        "http://h/map_a.xml": _urlset(
            ("http://h/1", "2024-01-02", "0.9"),
            ("http://h/2", None, "0.2"),
        ),
        "http://h/map_b.xml": _urlset(
            ("http://h/2", "2024-02-02", "0.7"),  # dup of /2, better prio
            ("http://h/3", None, None),
        ),
    }
    fetch_calls = []

    def fetch_fn(urls_df):
        urls = [r["url"] for r in urls_df.collect()]
        fetch_calls.append(sorted(urls))
        return spark.createDataFrame(
            [(u, world.get(u, "")) for u in urls],
            "sitemap_url string, body string",
        )

    root = spark.createDataFrame(
        [("http://h/sitemap.xml", world["http://h/sitemap.xml"])],
        "sitemap_url string, body string",
    )
    got = {
        r["url"]: (r["priority_ppm"], r["lastmod_ms"])
        for r in discover_seeds(root, fetch_fn).collect()
    }
    assert set(got) == {"http://h/1", "http://h/2", "http://h/3"}
    assert got["http://h/1"] == (900_000, 1704153600000)
    assert got["http://h/2"] == (700_000, 1706832000000)  # max of both
    assert got["http://h/3"] == (500_000, None)
    # map_a fetched exactly once despite two referencing indexes; the
    # cycle never re-fetches the root
    flat = [u for call in fetch_calls for u in call]
    assert flat.count("http://h/map_a.xml") == 1
    assert "http://h/sitemap.xml" not in flat


def test_seeds_bridge_is_arrow_batched_and_engine_ready(spark):
    bodies = spark.createDataFrame(
        [
            ("http://h/s.xml", _urlset(("http://h/p1", None, "1.0"))),
            ("http://h/t.xml", _index("http://h/u.xml")),
        ],
        "sitemap_url string, body string",
    )
    rows = seeds_from_sitemaps(bodies).collect()
    kinds = {r["url"]: r["kind"] for r in rows}
    assert kinds == {"http://h/p1": "url", "http://h/u.xml": "sitemap"}
    seeds = seeds_for_engine(
        seeds_from_sitemaps(bodies).filter(F.col("kind") == "url")
    ).collect()
    assert [(s["url"], s["priority"]) for s in seeds] == [
        ("http://h/p1", 0)
    ]


def test_discovered_seeds_drive_a_crawl_round(spark, tmp_path, world_dir):
    """End-to-end: seeds discovered from a generated sitemap covering the
    fixture world's seed urls initialize the engine and the first round
    crawls them — the sitemap chain replaces the hand-listed seed table."""
    from spider_spark.engine.crawler import CrawlEngine

    seed_urls = [
        r["url"]
        for r in spark.read.parquet(f"{world_dir}/seeds.parquet").collect()
    ]
    body = _urlset(*[(u, None, "1.0") for u in seed_urls])
    root = spark.createDataFrame(
        [("http://h/sitemap.xml", body)], "sitemap_url string, body string"
    )
    urls = discover_seeds(root, lambda df: df.limit(0).selectExpr(
        "url as sitemap_url", "'' as body"
    ))
    eng = CrawlEngine(
        spark,
        pages_path=f"{world_dir}/pages.parquet",
        robots_path=f"{world_dir}/robots.parquet",
        checkpoint_dir=str(tmp_path / "ckpt"),
        n_partitions=4,
    )
    meta = eng.init_seeds(seeds_for_engine(urls))
    assert meta["pending"] == len(seed_urls)
    out = eng.run(max_rounds=1)
    assert out["fetched"] > 0
