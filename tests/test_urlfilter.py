"""Trap-filter tests: Spark-column ⇄ pure-Python verdict parity on an edge-
case battery, and engine ⇄ oracle equivalence with the filter ON over a
world whose pages link to trap-shaped URLs."""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq

from spider_spark.engine.urlfilter import (
    MAX_PATH_DEPTH,
    MAX_QUERY_PARAMS,
    MAX_URL_LEN,
    is_trap_url,
    with_trap_flags,
)

_BATTERY = [
    # clean
    "http://h.test/",
    "http://h.test/a/b/c?x=1&y=2",
    "https://h.test/p2",
    "h.test/no-scheme/path",
    # long url
    "http://h.test/" + "a" * MAX_URL_LEN,
    # deep path (13 segments) vs exactly at the bound (12)
    "http://h.test/" + "/".join(f"s{i}" for i in range(MAX_PATH_DEPTH + 1)),
    "http://h.test/" + "/".join(f"s{i}" for i in range(MAX_PATH_DEPTH)),
    # repeated segment cycle vs only two repeats
    "http://h.test/a/b/a/b/a",
    "http://h.test/a/b/a/c",
    # many params (13) vs exactly 12
    "http://h.test/p?" + "&".join(f"k{i}=v" for i in range(MAX_QUERY_PARAMS + 1)),
    "http://h.test/p?" + "&".join(f"k{i}=v" for i in range(MAX_QUERY_PARAMS)),
    # session ids: leading, mid-query, case, and the lookalike non-match
    "http://h.test/p?PHPSESSID=abc",
    "http://h.test/p?x=1&jsessionid=9",
    "http://h.test/p?sid=1",
    "http://h.test/p?classid=1",  # 'sid' must not match inside 'classid'
    # query markers in odd places
    "http://h.test/p?",
    "http://h.test/?a=1",
]

_EXPECTED_TRAPS = {
    "http://h.test/" + "a" * MAX_URL_LEN,
    "http://h.test/" + "/".join(f"s{i}" for i in range(MAX_PATH_DEPTH + 1)),
    "http://h.test/a/b/a/b/a",
    "http://h.test/p?" + "&".join(f"k{i}=v" for i in range(MAX_QUERY_PARAMS + 1)),
    "http://h.test/p?PHPSESSID=abc",
    "http://h.test/p?x=1&jsessionid=9",
    "http://h.test/p?sid=1",
}


def test_python_verdicts_match_expectations():
    got = {u for u in _BATTERY if is_trap_url(u)}
    assert got == _EXPECTED_TRAPS


def test_column_math_matches_python_twin(spark):
    df = spark.createDataFrame([(u,) for u in _BATTERY], "url string")
    rows = with_trap_flags(df).collect()
    for r in rows:
        assert r["is_trap"] == is_trap_url(r["url"]), r["url"]


def _trap_world(out_dir: str) -> None:
    """3-page world: the root links to one clean child, one session-id
    trap, one repeating-path trap, and a deep-path trap. The clean child
    exists; trap pages deliberately also exist (a real trap serves 200s —
    the filter must stop the crawler anyway)."""
    import datetime as dt

    trap_cycle = "http://t.test/a/b/a/b/a"
    trap_sess = "http://t.test/page?sid=123"
    trap_deep = "http://t.test/" + "/".join(f"d{i}" for i in range(14))
    root_html = (
        "<html><body>"
        '<a href="http://t.test/child">c</a>'
        f'<a href="{trap_cycle}">x</a>'
        f'<a href="{trap_sess}">y</a>'
        f'<a href="{trap_deep}">z</a>'
        "</body></html>"
    ).encode()
    child_html = b"<html><body>leaf</body></html>"
    ts = dt.datetime(2024, 1, 1, tzinfo=dt.timezone.utc)
    urls = [
        "http://t.test/",
        "http://t.test/child",
        trap_cycle,
        trap_sess,
        trap_deep,
    ]
    htmls = [root_html, child_html, child_html, child_html, child_html]
    pq.write_table(
        pa.table(
            {
                "url": urls,
                "warc_ts": pa.array([ts] * len(urls), pa.timestamp("us", tz="UTC")),
                "html": pa.array(htmls, pa.binary()),
                "text": ["" for _ in urls],
                "lang": ["en" for _ in urls],
            }
        ),
        os.path.join(out_dir, "pages.parquet"),
    )
    pq.write_table(
        pa.table({"url": ["http://t.test/"], "priority": pa.array([0], pa.int32())}),
        os.path.join(out_dir, "seeds.parquet"),
    )
    pq.write_table(
        pa.table(
            {
                "host": ["t.test"],
                "crawl_delay_ms": pa.array([0], pa.int64()),
                "disallow_prefixes": pa.array([[]], pa.list_(pa.string())),
                "fetched_ts": pa.array([ts], pa.timestamp("us", tz="UTC")),
            }
        ),
        os.path.join(out_dir, "robots.parquet"),
    )


def test_engine_matches_oracle_with_trap_filter_on(spark, tmp_path):
    from spider_spark.engine import CrawlEngine
    from spider_spark.oracle import CrawlPolicy, crawl

    world = tmp_path / "world"
    world.mkdir()
    _trap_world(str(world))

    policy = CrawlPolicy(max_per_host=8, round_ms=2_000, trap_filter=True)
    import pyarrow.parquet as _pq

    pages_t = _pq.read_table(str(world / "pages.parquet"))
    pages = dict(zip(pages_t["url"].to_pylist(), pages_t["html"].to_pylist()))
    want = crawl(pages, [("http://t.test/", 0)], {"t.test": (0, [])}, policy)

    eng = CrawlEngine(
        spark,
        pages_path=str(world / "pages.parquet"),
        robots_path=str(world / "robots.parquet"),
        checkpoint_dir=str(tmp_path / "ckpt"),
        policy=policy,
        n_partitions=2,
    )
    eng.run(seeds=spark.read.parquet(str(world / "seeds.parquet")))

    got_order = {
        r["url"]: r["seq"] for r in eng.results().select("url", "seq").collect()
    }
    assert got_order == dict(want.order)
    got_seen = {r["url"] for r in eng.seen().select("url").collect()}
    assert got_seen == want.seen
    # only root + clean child were crawled; no trap URL entered seen
    assert set(got_order) == {"http://t.test/", "http://t.test/child"}
    assert not any("sid=" in u or "/a/b/a" in u for u in got_seen)


def test_trap_filter_off_crawls_the_traps(spark, tmp_path):
    """Default-off control: without the filter the same world crawls all
    five pages — proving the filter (not link extraction) is what stopped
    the traps above."""
    from spider_spark.engine import CrawlEngine
    from spider_spark.oracle import CrawlPolicy

    world = tmp_path / "world"
    world.mkdir()
    _trap_world(str(world))
    eng = CrawlEngine(
        spark,
        pages_path=str(world / "pages.parquet"),
        robots_path=str(world / "robots.parquet"),
        checkpoint_dir=str(tmp_path / "ckpt"),
        policy=CrawlPolicy(max_per_host=8, round_ms=2_000),
        n_partitions=2,
    )
    eng.run(seeds=spark.read.parquet(str(world / "seeds.parquet")))
    assert eng.results().count() == 5
