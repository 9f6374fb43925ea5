from __future__ import annotations

from spider_spark.extract import extract_links, extract_text


HTML = (
    "<html><head><title>T</title><script>skip();</script></head><body>"
    "<h1>Header  text</h1><p> para \n one </p>"
    "<table><tbody>"
    "<tr><td> a </td><td>1</td><td class='img'><img src='x.png'/></td><td>b</td></tr>"
    "<tr><th>k</th><th>v</th></tr>"
    "</tbody></table>"
    '<ul><li><a href="/x">x</a></li><li><a href="http://other.test/y#f">y</a></li>'
    '<li><a href="mailto:z@z">no</a></li><li><a href="/x">dup</a></li></ul>'
    "</body></html>"
)


def test_extract_text_tables_and_blocks():
    text = extract_text(HTML)
    lines = text.split("\n")
    assert "T" in lines  # title
    assert "Header text" in lines  # collapsed whitespace
    assert "para one" in lines
    assert "a\t1\t\tb" in lines  # img cell blanked, tab-joined
    assert "k\tv" in lines
    assert "skip();" not in text  # script dropped
    # byte-determinism: same input → same output
    assert extract_text(HTML) == text
    assert extract_text(HTML.encode("utf-8")) == text


def test_extract_links_canonical_dedup_order():
    links = extract_links(HTML, "http://h0.test/p/3")
    assert links == ["http://h0.test/x", "http://other.test/y"]


def test_single_pass_equals_two_pass():
    """extract_text_and_links must equal (extract_text, extract_links)
    exactly — the engine hot path uses the single-pass variant while the
    oracle uses the two-pass ones."""
    from spider_spark.extract import extract_text_and_links
    from spider_spark.fixtures import build_world

    base = "http://h0.test/p/3"
    t, ls = extract_text_and_links(HTML, base)
    assert t == extract_text(HTML)
    assert ls == extract_links(HTML, base)

    world = build_world(n_hosts=3, median_pages=8, hot_factor=4, seed=7)
    for p in world["pages"]:
        t, ls = extract_text_and_links(p["html"], p["url"])
        assert t == extract_text(p["html"])
        assert ls == extract_links(p["html"], p["url"])


def test_fixture_text_is_golden():
    """pages.text must equal extract_text(pages.html) — the invariant the
    engine UDF is checked against."""
    from spider_spark.fixtures import build_world

    world = build_world(n_hosts=4, median_pages=6, hot_factor=5, seed=42)
    assert len(world["pages"]) > 20
    for p in world["pages"][:50]:
        assert p["text"] == extract_text(p["html"])
    # determinism across builds
    again = build_world(n_hosts=4, median_pages=6, hot_factor=5, seed=42)
    assert [p["url"] for p in again["pages"]] == [p["url"] for p in world["pages"]]
    assert [p["html"] for p in again["pages"]] == [p["html"] for p in world["pages"]]
