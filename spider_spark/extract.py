"""Byte-deterministic HTML → text / links extraction.

Re-expresses the reference's two HTML-harvesting shapes (from scratch, on
stdlib ``html.parser`` — the reference uses BeautifulSoup, which is not a
dependency here):

- table grid walk: ``<table><tbody><tr><td>`` rows to cell-text lists, with
  the image column blanked (/root/reference/getRJWData.py:73-97 walks
  tables[1], skips column 5);
- key-value detail harvest: td text ``.strip()``-ed, inner
  newline/space scrub (/root/reference/zjj_sz_gov_cn.py:197-227).

``extract_text`` is the **single shared pure function** used by (a) the
fixture generator to produce the golden ``pages.text`` column, (b) the
pure-Python oracle crawler, and (c) the engine's vectorized pandas UDF —
so the north-rule invariant "byte-identical extracted text per url" is
testable end-to-end.

Spec (deterministic, order of document):
- ``<script>``/``<style>`` contents dropped;
- inside a ``<tr>``: the row becomes one line of tab-joined stripped cell
  texts (``<td>``/``<th>``); a cell whose tag carries class ``img`` is
  blanked (the reference's "column 5 is an image, skip" rule generalized
  to a data-driven marker);
- text outside tables: stripped, whitespace-collapsed, one line per block
  element boundary;
- empty lines dropped; lines joined with ``\n``; no trailing newline.
"""

from __future__ import annotations

import re
from html.parser import HTMLParser

_WS = re.compile(r"[ \t\r\n ]+")

_BLOCK_TAGS = {
    "p", "div", "br", "li", "h1", "h2", "h3", "h4", "h5", "h6",
    "section", "article", "header", "footer", "ul", "ol", "title",
}


class _TextExtractor(HTMLParser):
    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.lines: list[str] = []
        self._buf: list[str] = []
        self._cells: list[str] | None = None
        self._cell_buf: list[str] | None = None
        self._skip_cell = False
        self._drop_depth = 0

    def _flush_buf(self) -> None:
        text = _WS.sub(" ", "".join(self._buf)).strip()
        self._buf = []
        if text:
            self.lines.append(text)

    def handle_starttag(self, tag, attrs):
        if tag in ("script", "style"):
            self._drop_depth += 1
            return
        if self._drop_depth:
            return
        if tag == "tr":
            self._flush_buf()
            self._cells = []
            self._cell_buf = None
        elif tag in ("td", "th") and self._cells is not None:
            classes = dict(attrs).get("class", "") or ""
            self._skip_cell = "img" in classes.split()
            self._cell_buf = []
        elif tag in _BLOCK_TAGS and self._cells is None:
            self._flush_buf()

    def handle_endtag(self, tag):
        if tag in ("script", "style"):
            self._drop_depth = max(0, self._drop_depth - 1)
            return
        if self._drop_depth:
            return
        if tag in ("td", "th") and self._cells is not None:
            if self._cell_buf is not None:
                cell = "" if self._skip_cell else _WS.sub(
                    " ", "".join(self._cell_buf)
                ).strip()
                self._cells.append(cell)
            self._cell_buf = None
            self._skip_cell = False
        elif tag == "tr" and self._cells is not None:
            if self._cells:
                self.lines.append("\t".join(self._cells))
            self._cells = None
        elif tag in _BLOCK_TAGS and self._cells is None:
            self._flush_buf()

    def handle_data(self, data):
        if self._drop_depth:
            return
        if self._cell_buf is not None:
            self._cell_buf.append(data)
        elif self._cells is None:
            self._buf.append(data)

    def close(self):
        super().close()
        self._flush_buf()


class _LinkExtractor(HTMLParser):
    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.hrefs: list[str] = []

    def handle_starttag(self, tag, attrs):
        if tag == "a":
            for k, v in attrs:
                if k == "href" and v:
                    self.hrefs.append(v)


class _TextAndLinkExtractor(_TextExtractor):
    """Single-pass text + href harvest — same outputs as running
    _TextExtractor and _LinkExtractor separately (asserted in tests), at
    half the parse cost. The engine's hot path uses this."""

    def __init__(self) -> None:
        super().__init__()
        self.hrefs: list[str] = []

    def handle_starttag(self, tag, attrs):
        if tag == "a":  # no drop-depth guard: _LinkExtractor has none either
            for k, v in attrs:
                if k == "href" and v:
                    self.hrefs.append(v)
        super().handle_starttag(tag, attrs)


def extract_text(html: str | bytes) -> str:
    """HTML → extracted text. MUST stay byte-deterministic: the golden
    ``pages.text`` fixture column, the oracle, and the engine UDF all call
    this exact function."""
    if isinstance(html, (bytes, bytearray)):
        html = html.decode("utf-8", errors="replace")
    p = _TextExtractor()
    p.feed(html)
    p.close()
    return "\n".join(p.lines)


def _canonicalize_hrefs(hrefs: list[str], base_url: str) -> list[str]:
    from spider_spark.urlnorm import canonicalize_url

    out: list[str] = []
    seen: set[str] = set()
    for href in hrefs:
        canon = canonicalize_url(href, base=base_url)
        if canon is not None and canon not in seen:
            seen.add(canon)
            out.append(canon)
    return out


def extract_text_and_links(html: str | bytes, base_url: str) -> tuple[str, list[str]]:
    """Single-pass (extract_text(html), extract_links(html, base_url)) —
    byte/value-identical to the two separate calls (tested)."""
    if isinstance(html, (bytes, bytearray)):
        html = html.decode("utf-8", errors="replace")
    p = _TextAndLinkExtractor()
    p.feed(html)
    p.close()
    return "\n".join(p.lines), _canonicalize_hrefs(p.hrefs, base_url)


def extract_links(html: str | bytes, base_url: str) -> list[str]:
    """All ``<a href>`` targets, canonicalized against ``base_url``,
    http(s)-only, de-duplicated preserving first-appearance order
    (the reference harvests hrefs at /root/reference/zjj_sz_gov_cn.py:166,201
    in document order)."""
    from spider_spark.urlnorm import canonicalize_url

    if isinstance(html, (bytes, bytearray)):
        html = html.decode("utf-8", errors="replace")
    p = _LinkExtractor()
    p.feed(html)
    p.close()
    return _canonicalize_hrefs(p.hrefs, base_url)
