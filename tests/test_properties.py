"""Property-based tests (hypothesis) for the pure layers: canonicalization
idempotence, murmur determinism, extraction robustness on arbitrary HTML."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from spider_spark.extract import extract_links, extract_text, extract_text_and_links
from spider_spark.urlnorm import canonicalize_url, host_of, murmur3_32

url_text = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",), max_codepoint=0x2FFF),
    max_size=80,
)


@given(st.binary(max_size=256))
@settings(max_examples=200, deadline=None)
def test_murmur_deterministic_and_int32(data):
    h1 = murmur3_32(data)
    assert h1 == murmur3_32(data)
    assert -(1 << 31) <= h1 < (1 << 31)


@given(url_text)
@settings(max_examples=300, deadline=None)
def test_canonicalize_total_and_idempotent(s):
    """Never raises; canonical output is a fixed point."""
    c = canonicalize_url(s)
    if c is not None:
        assert canonicalize_url(c) == c
        assert c.startswith(("http://", "https://"))
        host_of(c)  # never raises on canonical urls


@given(st.integers(0, 9), st.integers(0, 9), url_text)
@settings(max_examples=100, deadline=None)
def test_canonicalize_with_base_total(a, b, rel):
    base = f"http://h{a}.test/d{b}/page"
    c = canonicalize_url(rel, base=base)
    if c is not None:
        assert canonicalize_url(c) == c


html_chunks = st.lists(
    st.one_of(
        st.text(max_size=30),
        st.sampled_from(
            [
                "<table><tbody>", "</tbody></table>", "<tr>", "</tr>", "<td>",
                "</td>", "<td class='img'>", "<script>", "</script>", "<p>",
                "</p>", "<a href='/x'>", "</a>", "<br>", "&amp;", "&#60;",
                "<div", ">", "<!--", "-->", "</b", "<td", "='",
            ]
        ),
    ),
    max_size=40,
)


@given(html_chunks)
@settings(max_examples=200, deadline=None)
def test_extract_total_on_malformed_html(chunks):
    """Arbitrary tag soup: extraction never raises, is deterministic, and
    the single-pass variant always equals the two-pass pair."""
    html = "".join(chunks)
    t1 = extract_text(html)
    assert t1 == extract_text(html)
    links = extract_links(html, "http://h0.test/p/0")
    t2, l2 = extract_text_and_links(html, "http://h0.test/p/0")
    assert t2 == t1
    assert l2 == links
    for u in links:
        assert canonicalize_url(u) == u  # links come out canonical


# ---------------------------------------------------------------- WARC

_warc_url = st.text(
    alphabet=st.characters(
        min_codepoint=0x21, max_codepoint=0x7E  # printable, no whitespace
    ),
    min_size=1,
    max_size=60,
)


@given(
    st.lists(
        st.tuples(_warc_url, st.binary(max_size=512)),
        min_size=1,
        max_size=8,
    )
)
@settings(max_examples=200, deadline=None)
def test_warc_roundtrip_arbitrary_payloads(items):
    """Concatenated records parse back byte-exact for ARBITRARY payload
    bytes — including payloads that embed CRLF pairs, record separators,
    or fake 'WARC/1.0' headers."""
    from spider_spark.operators.warc import (
        parse_warc_bytes,
        warc_resource_record,
    )

    date = "2024-06-01T00:00:00Z"
    blob = b"".join(
        warc_resource_record(u, date, p) for u, p in items
    )
    recs = parse_warc_bytes(blob)
    assert [(r["headers"]["WARC-Target-URI"], r["payload"]) for r in recs] == [
        (u, p) for u, p in items
    ]


# ---------------------------------------------------------- robots.txt


@given(st.text(max_size=400))
@settings(max_examples=300, deadline=None)
def test_robots_parser_total(body):
    """Never raises on arbitrary input; output shape is stable; disallow
    prefixes are non-empty strings; crawl delay is None or >= 0."""
    from spider_spark.engine.robots_txt import parse_robots_txt

    g = parse_robots_txt(body, "spider")
    assert set(g) == {"disallow", "allow", "crawl_delay_ms"}
    assert all(isinstance(p, str) and p for p in g["disallow"])
    assert g["crawl_delay_ms"] is None or g["crawl_delay_ms"] >= 0


@given(
    st.lists(
        st.tuples(
            st.sampled_from(["User-agent", "user-AGENT"]),
            st.sampled_from(["*", "spider", "other"]),
        ),
        min_size=1,
        max_size=3,
    ),
    st.lists(st.sampled_from(["/a/", "/b/", "/c d/"]), max_size=3),
)
@settings(max_examples=100, deadline=None)
def test_robots_case_and_groups(agents, prefixes):
    """Key case never matters; every Disallow in the matching group is
    returned in order."""
    from spider_spark.engine.robots_txt import parse_robots_txt

    body = "\n".join(f"{k}: {v}" for k, v in agents) + "\n"
    body += "\n".join(f"Disallow: {p}" for p in prefixes)
    g = parse_robots_txt(body, "spider")
    matches = any(v in ("*", "spider") for _, v in agents)
    assert g["disallow"] == (prefixes if matches else [])
