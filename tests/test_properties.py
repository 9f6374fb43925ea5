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
