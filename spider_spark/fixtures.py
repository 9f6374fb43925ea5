"""Deterministic synthetic web-graph fixture (FIXTURES.md §1).

Generates the engine's canonical input per BASELINE.json ``input_hint``:
an (Iceberg-style) parquet ``pages`` table with columns
``url:string, warc_ts:timestamp, html:binary, text:string, lang:string``,
plus ``seeds(url, priority)`` and
``robots(host, crawl_delay_ms, disallow_prefixes, fetched_ts)``.

Shape mirrors what the reference crawls:

- HTML bodies contain an AQI-style data grid with an image column to skip
  (/root/reference/getRJWData.py:73-97) and a key-value detail table
  (/root/reference/zjj_sz_gov_cn.py:197-216), plus ``<a href>`` nav links
  defining the crawl graph.
- Host sizes are Zipf-like with ONE deliberate hot host (~100× the median)
  to exercise hot-host skew salting (SURVEY.md §5.5).
- Some hosts disallow ``/private`` via robots; some links are dead
  (absent from ``pages``) to exercise retry/dead-link accounting
  (/root/reference/suplicmap_vector2.py:131-142's failed_urls drain).

Everything is seeded (seed=42 default) and wall-clock-free. ``pages.text``
is produced by the shared ``extract_text`` so the byte-identity invariant
is checkable end-to-end. No live network anywhere.
"""

from __future__ import annotations

import os
import random
from datetime import datetime, timedelta, timezone

import pyarrow as pa
import pyarrow.parquet as pq

from spider_spark.extract import extract_text

EPOCH = datetime(2024, 3, 1, tzinfo=timezone.utc)

_STATIONS = ["荔园", "华侨城", "南海", "莲花", "洪湖", "通心岭"]
_KV_KEYS = ["许可证号", "项目名称", "发展商", "所在位置", "批准面积", "批准日期"]


def _page_url(host: str, j: int, private: bool = False) -> str:
    prefix = "/private" if private else ""
    return f"http://{host}{prefix}/p/{j}"


def _make_html(
    rng: random.Random, host: str, j: int, links: list[str], weight: int = 1
) -> str:
    """One synthetic page: title, AQI-like grid, KV detail table, nav links.
    ``weight`` scales the grid size (bench worlds use heavier pages so the
    extract stage carries realistic per-page parse cost)."""
    rows = []
    for r in range(rng.randint(2 * weight, 5 * weight)):
        station = _STATIONS[rng.randrange(len(_STATIONS))]
        cells = [
            f"<td>{station}</td>",
            f"<td>{rng.randint(0, 500)}</td>",
            f"<td>{rng.uniform(0, 250):.1f}</td>",
            f"<td>{rng.uniform(0, 250):.1f}</td>",
            f"<td>{rng.randint(0, 300)}</td>",
            f'<td class="img"><img src="/lvl{rng.randint(1, 6)}.png"/></td>',
            f"<td>{'优良轻度中度重度'[rng.randrange(5)]}</td>",
        ]
        rows.append("<tr>" + "".join(cells) + "</tr>")
    grid = "<table><tbody>" + "".join(rows) + "</tbody></table>"

    kv_rows = []
    for k in _KV_KEYS:
        val = (
            "--"
            if rng.random() < 0.15
            else f"{rng.randint(1000, 99999)}号" if "号" in k else f"值{rng.randint(1, 999)}"
        )
        kv_rows.append(f"<tr><td> {k} </td><td>{val}</td></tr>")
    kv = "<table class='detail'><tbody>" + "".join(kv_rows) + "</tbody></table>"

    anchors = "".join(f'<li><a href="{u}">link</a></li>' for u in links)
    return (
        f"<html><head><title>{host} page {j}</title>"
        "<script>var x = 1;</script></head>"
        f"<body><h1>数据页 {j}</h1><p>host {host} 第 {j} 页。</p>"
        f"{grid}{kv}<ul>{anchors}</ul></body></html>"
    )


def build_world(
    n_hosts: int = 12,
    median_pages: int = 24,
    hot_factor: int = 100,
    seed: int = 42,
    dead_link_rate: float = 0.04,
    branching: int = 2,
    with_text: bool = True,
    delays: list[int] | None = None,
    seed_all_hosts: bool = False,
    page_weight: int = 1,
):
    """Build the synthetic web in memory.

    Returns dict with keys ``pages`` (list of row dicts), ``seeds``,
    ``robots``. host 0 is the hot host (~hot_factor × median size).
    ``branching`` controls BFS-tree fan-out (depth = log_b(host size)) —
    bench worlds use a high branching so crawls are wide and shallow.
    ``with_text=False`` skips the golden text column (bench-only worlds).
    """
    rng = random.Random(seed)
    hosts = [f"h{i}.test" for i in range(n_hosts)]
    sizes = []
    for i in range(n_hosts):
        if i == 0:
            sizes.append(median_pages * hot_factor)
        else:
            sizes.append(max(3, int(median_pages * 2 / (1 + i % 7))))

    # robots: even-index hosts disallow /private; crawl delays vary (incl. 0)
    if delays is None:
        delays = [0, 100, 250, 500, 1000, 2000]
    robots = []
    for i, h in enumerate(hosts):
        robots.append(
            {
                "host": h,
                "crawl_delay_ms": delays[rng.randrange(len(delays))],
                "disallow_prefixes": ["/private"] if i % 2 == 0 else [],
                "fetched_ts": EPOCH - timedelta(hours=rng.randint(1, 72)),
            }
        )

    # enumerate every real page url (a slice of each host is under /private)
    all_urls: dict[str, tuple[str, int, bool]] = {}
    per_host_urls: list[list[str]] = []
    for i, h in enumerate(hosts):
        urls_h = []
        for j in range(sizes[i]):
            private = j % 11 == 10  # ~9% of pages live under /private
            u = _page_url(h, j, private)
            all_urls[u] = (h, j, private)
            urls_h.append(u)
        per_host_urls.append(urls_h)

    pages = []
    for i, h in enumerate(hosts):
        urls_h = per_host_urls[i]
        n = len(urls_h)
        for j, u in enumerate(urls_h):
            # BFS-tree children within host + occasional cross-host root link
            links = [
                urls_h[c]
                for c in range(branching * j + 1, branching * (j + 1) + 1)
                if c < n
            ]
            if j % 5 == 2 and n_hosts > 1:
                links.append(per_host_urls[(i + 1 + j) % n_hosts][0])
            if rng.random() < dead_link_rate:
                links.append(f"http://{h}/missing/{j}")  # dead link
            if j % 7 == 3:
                links.append(u)  # self link — dedup must drop it
            html = _make_html(rng, h, j, links, weight=page_weight)
            pages.append(
                {
                    "url": u,
                    "warc_ts": EPOCH + timedelta(seconds=(i * 100000 + j)),
                    "html": html.encode("utf-8"),
                    "text": extract_text(html) if with_text else "",
                    "lang": "zh" if rng.random() < 0.6 else "en",
                }
            )

    n_seed_hosts = n_hosts if seed_all_hosts else min(n_hosts, 6)
    seeds = [
        {"url": per_host_urls[i][0], "priority": 0} for i in range(n_seed_hosts)
    ]
    return {"pages": pages, "seeds": seeds, "robots": robots}


def write_world(out_dir: str, **kwargs) -> dict[str, str]:
    """Write pages/seeds/robots parquet under ``out_dir``; returns paths."""
    world = build_world(**kwargs)
    os.makedirs(out_dir, exist_ok=True)
    paths = {}

    pages = world["pages"]
    pages_tbl = pa.table(
        {
            "url": [p["url"] for p in pages],
            "warc_ts": pa.array(
                [p["warc_ts"] for p in pages], pa.timestamp("us", tz="UTC")
            ),
            "html": pa.array([p["html"] for p in pages], pa.binary()),
            "text": [p["text"] for p in pages],
            "lang": [p["lang"] for p in pages],
        }
    )
    paths["pages"] = os.path.join(out_dir, "pages.parquet")
    # small row groups: Spark parallelizes parquet reads at row-group
    # granularity — one giant row group would serialize the whole scan
    pq.write_table(pages_tbl, paths["pages"], row_group_size=4096)

    seeds_tbl = pa.table(
        {
            "url": [s["url"] for s in world["seeds"]],
            "priority": pa.array(
                [s["priority"] for s in world["seeds"]], pa.int32()
            ),
        }
    )
    paths["seeds"] = os.path.join(out_dir, "seeds.parquet")
    pq.write_table(seeds_tbl, paths["seeds"])

    robots_tbl = pa.table(
        {
            "host": [r["host"] for r in world["robots"]],
            "crawl_delay_ms": pa.array(
                [r["crawl_delay_ms"] for r in world["robots"]], pa.int64()
            ),
            "disallow_prefixes": pa.array(
                [r["disallow_prefixes"] for r in world["robots"]],
                pa.list_(pa.string()),
            ),
            "fetched_ts": pa.array(
                [r["fetched_ts"] for r in world["robots"]],
                pa.timestamp("us", tz="UTC"),
            ),
        }
    )
    paths["robots"] = os.path.join(out_dir, "robots.parquet")
    pq.write_table(robots_tbl, paths["robots"])
    return paths
