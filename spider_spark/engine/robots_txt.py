"""robots.txt parsing (REP, RFC 9309) → the engine's robots table.

The north-star calls for a "robots.txt cache" feeding the politeness
scheduler; the engine's cache is a (host, crawl_delay_ms,
disallow_prefixes) table (see :mod:`spider_spark.engine.politeness`).
This module closes the loop from RAW fetched robots.txt bodies to that
table: a pure stdlib parser (group selection, rule collection,
crawl-delay) plus an Arrow-batched bridge that turns a DataFrame of
(host, body) into the politeness schema — so a crawl can bootstrap its
politeness state from its own round-0 robots fetches instead of an
externally-provided table.

Parsing rules implemented (RFC 9309 §2.2, plus the de-facto Crawl-delay
extension):
- lines are ``key: value``; keys case-insensitive; ``#`` starts a comment;
- ``User-agent`` lines open a group; CONSECUTIVE User-agent lines share
  one group (a group serves several agents);
- the group chosen for an agent is the longest-prefix match over
  user-agent product tokens, falling back to the ``*`` group;
- rules in non-matching groups are ignored; an empty ``Disallow:`` means
  "allow all" and contributes no prefix;
- ``Crawl-delay`` is seconds (fractional allowed), exposed as ms.

Only Disallow prefixes are emitted to the engine table — the politeness
layer's documented contract is prefix-disallow (Allow records are parsed
and returned by :func:`parse_robots_txt` for callers that want full REP
longest-match semantics, but the engine's column-math check is
``exists(prefixes, p -> startswith(path, p))``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def parse_robots_txt(body: str, user_agent: str = "*") -> dict:
    """Parse one robots.txt body for one user agent.

    Returns {'disallow': [prefixes], 'allow': [prefixes],
    'crawl_delay_ms': int | None}.
    """
    groups: list[dict] = []  # {'agents': [...], 'disallow': [...], ...}
    current: dict | None = None
    last_was_agent = False
    for raw_line in body.splitlines():
        line = raw_line.split("#", 1)[0].strip()
        if not line:
            continue
        key, sep, value = line.partition(":")
        if not sep:
            continue
        key = key.strip().lower()
        value = value.strip()
        if key == "user-agent":
            if not last_was_agent or current is None:
                current = {
                    "agents": [],
                    "disallow": [],
                    "allow": [],
                    "crawl_delay_ms": None,
                }
                groups.append(current)
            current["agents"].append(value.lower())
            last_was_agent = True
            continue
        last_was_agent = False
        if current is None:
            # rules before any User-agent line: REP says they are invalid;
            # treat as a '*' group for robustness (common in the wild)
            current = {
                "agents": ["*"],
                "disallow": [],
                "allow": [],
                "crawl_delay_ms": None,
            }
            groups.append(current)
        if key == "disallow":
            if value:
                current["disallow"].append(value)
        elif key == "allow":
            if value:
                current["allow"].append(value)
        elif key == "crawl-delay":
            try:
                current["crawl_delay_ms"] = int(float(value) * 1000)
            except ValueError:
                pass

    ua = user_agent.lower()
    best: dict | None = None
    best_len = -1
    star: dict | None = None
    for g in groups:
        for agent in g["agents"]:
            if agent == "*":
                if star is None:
                    star = g
            elif ua.startswith(agent) and len(agent) > best_len:
                best, best_len = g, len(agent)
    chosen = best if best is not None else star
    if chosen is None:
        return {"disallow": [], "allow": [], "crawl_delay_ms": None}
    return {
        "disallow": list(chosen["disallow"]),
        "allow": list(chosen["allow"]),
        "crawl_delay_ms": chosen["crawl_delay_ms"],
    }


def robots_table_from_bodies(
    df: DataFrame,
    user_agent: str = "*",
    host_col: str = "host",
    body_col: str = "body",
) -> DataFrame:
    """(host, body) → the engine's robots table
    (host, crawl_delay_ms, disallow_prefixes), Arrow-batched (one Python
    call per batch, not per row). Null/empty bodies → allow-all with no
    delay — the same default the engine applies to hosts missing from the
    table entirely."""
    import pandas as pd
    from pyspark.sql import functions as F  # noqa: F401
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("host", T.StringType()),
            T.StructField("crawl_delay_ms", T.LongType()),
            T.StructField(
                "disallow_prefixes", T.ArrayType(T.StringType())
            ),
        ]
    )

    def _parse(batches):
        for pdf in batches:
            hosts, delays, prefixes = [], [], []
            for host, body in zip(pdf[host_col], pdf[body_col]):
                parsed = parse_robots_txt(body or "", user_agent)
                hosts.append(host)
                delays.append(
                    parsed["crawl_delay_ms"]
                    if parsed["crawl_delay_ms"] is not None
                    else 0
                )
                prefixes.append(parsed["disallow"])
            yield pd.DataFrame(
                {
                    "host": hosts,
                    "crawl_delay_ms": pd.array(delays, dtype="int64"),
                    "disallow_prefixes": prefixes,
                }
            )

    return df.select(host_col, body_col).mapInPandas(_parse, schema)
