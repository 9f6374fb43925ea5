from __future__ import annotations

from spider_spark.fixtures import build_world
from spider_spark.oracle import CrawlPolicy, crawl, host_budget


def _as_inputs(world):
    pages = {p["url"]: p["html"] for p in world["pages"]}
    seeds = [(s["url"], s["priority"]) for s in world["seeds"]]
    robots = {
        r["host"]: (r["crawl_delay_ms"], r["disallow_prefixes"])
        for r in world["robots"]
    }
    return pages, seeds, robots


def test_oracle_deterministic_and_sane():
    world = build_world(n_hosts=8, median_pages=10, hot_factor=10, seed=42)
    pages, seeds, robots = _as_inputs(world)
    policy = CrawlPolicy(max_per_host=5, max_rounds=30)
    r1 = crawl(pages, seeds, robots, policy)
    r2 = crawl(pages, seeds, robots, policy)
    assert r1.order == r2.order
    assert r1.seen == r2.seen
    assert len(r1.order) > 20
    # seq is dense and ordered
    assert [s for _, s in r1.order] == list(range(len(r1.order)))
    # crawled urls are unique and all in seen
    urls = [u for u, _ in r1.order]
    assert len(set(urls)) == len(urls)
    assert set(urls) <= r1.seen
    # robots exclusion: no /private url crawled on even (disallowing) hosts
    for u in urls:
        host = u.split("//")[1].split("/")[0]
        host_idx = int(host[1:].split(".")[0])
        if host_idx % 2 == 0:
            assert "/private/" not in u
    # some /private pages on odd hosts ARE crawlable (disallow list empty)
    assert any("/private/" in u for u in r1.seen)
    # dead links retried then marked dead
    assert r1.dead, "fixture plants dead links; oracle must mark them dead"
    assert all("/missing/" in u for u in r1.dead)
    # extracted text is golden
    texts = {p["url"]: p["text"] for p in world["pages"]}
    for u, _ in r1.order:
        assert r1.extracted[u] == texts[u]


def test_politeness_budget_math():
    robots = {"slow.test": (2000, []), "fast.test": (0, []), "mid.test": (100, [])}
    policy = CrawlPolicy(max_per_host=8, round_ms=10_000)
    assert host_budget("slow.test", robots, policy) == 5  # 10000/2000
    assert host_budget("fast.test", robots, policy) == 8  # no delay → max
    assert host_budget("mid.test", robots, policy) == 8  # capped at max
    assert host_budget("unknown.test", robots, policy) == 8
    tiny = CrawlPolicy(max_per_host=8, round_ms=1_000)
    assert host_budget("slow.test", robots, tiny) == 1  # floor at 1


def test_budget_limits_per_round_dequeue():
    world = build_world(n_hosts=4, median_pages=12, hot_factor=30, seed=42)
    pages, seeds, robots = _as_inputs(world)
    policy = CrawlPolicy(max_per_host=3, max_rounds=4)
    res = crawl(pages, seeds, robots, policy)
    for m in res.metrics:
        # ≤ K per host per round; ≤ hosts*K overall
        assert m["dequeued"] <= 3 * len({u.split("//")[1].split("/")[0] for u in res.seen})
