"""Crawler-trap URL filtering: drop frontier links whose shape marks them
as spider traps (infinite calendars, session-id explosions, repeating
path cycles) before they ever enter the seen set.

The reference crawls a closed id space and cannot loop
(/root/reference/suplicmap_vector.py walks bounded object-id ranges); an
open-web frontier can — the classic public heuristics (Heydon & Najork,
"Mercator: a scalable, extensible web crawler", 1999) are structural:

- ``long_url``    — total length beyond any sane CMS route;
- ``deep_path``   — more path segments than real sites nest;
- ``repeat_seg``  — one path segment repeated ≥ 3 times (the signature of
  a relative-link cycle: /a/b/a/b/a/b/...);
- ``many_params`` — query-parameter count beyond form/tracking reality;
- ``session_param`` — a session-id parameter (each fetch mints a new URL
  for the same page: an unbounded alias family).

Everything is pure column math over the canonicalized URL (split /
filter / exists — no UDF, no shuffle: the filter fuses into the
links-dedup projection), with a pure-Python twin (:func:`is_trap_url`)
that the crawl ORACLE applies identically, so engine ⇄ oracle
equivalence holds with the filter on. The repeated-segment check is
O(depth²) per URL with depth capped by ``deep_path`` at 12 — a bounded
constant, unlike the corpus-sized quadratics the plan gates forbid.
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

MAX_URL_LEN = 512
MAX_PATH_DEPTH = 12
MAX_QUERY_PARAMS = 12
MIN_SEGMENT_REPEATS = 3
_SESSION_RX = r"(^|&)(phpsessid|jsessionid|sessionid|session_id|sid)="

_SCHEME_HOST_RX = r"^[a-z][a-z0-9+.-]*://[^/]*"


def _split_url_py(url: str) -> tuple[str, str]:
    m = re.match(_SCHEME_HOST_RX, url)
    rest = url[m.end():] if m else url
    q = rest.find("?")
    if q >= 0:
        return rest[:q], rest[q + 1:]
    return rest, ""


def is_trap_url(url: str) -> bool:
    """Pure-Python twin of :func:`with_trap_flags` — byte-identical
    verdicts, used by the crawl oracle."""
    if len(url) > MAX_URL_LEN:
        return True
    path, query = _split_url_py(url)
    segs = [s for s in path.split("/") if s]
    if len(segs) > MAX_PATH_DEPTH:
        return True
    for s in set(segs):
        if segs.count(s) >= MIN_SEGMENT_REPEATS:
            return True
    params = [p for p in query.split("&") if p]
    if len(params) > MAX_QUERY_PARAMS:
        return True
    if query and re.search(_SESSION_RX, query.lower()):
        return True
    return False


def _trap_col(url: Column) -> Column:
    rest = F.regexp_replace(url, _SCHEME_HOST_RX, "")
    path = F.substring_index(rest, "?", 1)
    qpos = F.locate("?", rest)
    query = F.when(qpos > 0, F.substring(rest, qpos + 1, 8192)).otherwise(
        F.lit("")
    )
    segs = F.filter(F.split(path, "/"), lambda x: x != "")
    repeat = F.exists(
        segs,
        lambda s: F.size(F.filter(segs, lambda x: x == s))
        >= MIN_SEGMENT_REPEATS,
    )
    params = F.filter(F.split(query, "&"), lambda x: x != "")
    session = (query != "") & F.lower(query).rlike(_SESSION_RX)
    return (
        (F.length(url) > MAX_URL_LEN)
        | (F.size(segs) > MAX_PATH_DEPTH)
        | repeat
        | (F.size(params) > MAX_QUERY_PARAMS)
        | session
    )


def with_trap_flags(df: DataFrame, url_col: str = "url") -> DataFrame:
    """Add an ``is_trap`` boolean column — pure codegen expressions."""
    return df.withColumn("is_trap", _trap_col(F.col(url_col)))


def drop_traps(df: DataFrame, url_col: str = "url") -> DataFrame:
    """Filter trap URLs out — fuses into the surrounding projection."""
    return df.filter(~_trap_col(F.col(url_col)))
