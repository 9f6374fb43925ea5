"""Pure-Python reference-semantics crawler — the correctness oracle.

Re-expresses the reference's crawl semantics (SURVEY.md §3) as one
single-threaded deterministic function, so the distributed Spark engine can
be checked against it exactly (north_rule: "matching the reference's crawl
ordering and URL-seen set under the same seed list + politeness budget"):

- sorted ascending dequeue within a scan, the reference's only ordering
  guarantee (ids.sort() /root/reference/suplicmap_vector.py:138-140);
- BFS rounds = the reference's bounded-concurrency barrier batches
  (/root/reference/suplicmap_vector2.py:107-128, concurrence_num=10);
- failed fetches re-queued and retried, then counted dead
  (/root/reference/suplicmap_vector2.py:131-142,155-158);
- politeness budget per host per round derived from robots crawl-delay
  (the reference's fixed sleep-between-requests, e.g.
  /root/reference/suplicmap_vector.py:161, generalized per-host).

THE CONTRACT (the Spark engine implements exactly this, distributed):

1. State: ``seen`` = every canonical URL ever discovered (seeds + links,
   including robots-blocked and dead ones); ``frontier`` = pending rows
   ``(url, host, priority, discovery_time, retries)``.
2. Seeds enter at discovery_time=0 with their given priority (min() if a
   URL is seeded twice). Robots-disallowed URLs enter ``seen`` but never
   the frontier.
3. Round r (r = 1, 2, ...): per-host budget
   ``K_host = max(1, min(max_per_host, round_ms // crawl_delay_ms))``
   (``max_per_host`` when delay is 0). Dequeue = per host, pending rows
   sorted by ``(priority, discovery_time, url)``, first K_host.
4. Fetch resolves against the pages table. Success → the page is
   "crawled"; its links are extracted with the shared ``extract_links``.
   Miss → retries += 1; pending again until ``retries > max_retries``,
   then state=dead.
5. Newly discovered URLs (not in ``seen``): discovery_time = r,
   priority = min(parent priority) + 1 across this round's parents.
6. Global crawl order: within a round, successful fetches sorted by
   ``(priority, discovery_time, url)`` get consecutive ``seq`` numbers.
   Order is a pure function of data — never of scheduling.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from spider_spark.extract import extract_links
from spider_spark.urlnorm import canonicalize_url, host_of


def _is_trap(url: str) -> bool:
    # lazy: engine.urlfilter sits under spider_spark.engine, whose
    # __init__ imports the crawler, which imports THIS module
    from spider_spark.engine.urlfilter import is_trap_url

    return is_trap_url(url)


@dataclass(frozen=True)
class CrawlPolicy:
    """Politeness budget — identical object drives oracle and engine."""

    max_per_host: int = 8
    round_ms: int = 60_000
    max_retries: int = 2
    max_rounds: int = 50
    # drop trap-shaped discovered links (engine/urlfilter.py) before the
    # seen set; off by default — the closed fixture worlds have no traps
    trap_filter: bool = False


@dataclass
class CrawlResult:
    order: list[tuple[str, int]] = field(default_factory=list)  # (url, seq)
    seen: set[str] = field(default_factory=set)
    dead: set[str] = field(default_factory=set)
    blocked: set[str] = field(default_factory=set)
    extracted: dict[str, str] = field(default_factory=dict)  # url -> text
    metrics: list[dict] = field(default_factory=list)  # per-round counters
    rounds: int = 0


def _disallowed(url: str, host: str, robots: dict[str, tuple[int, list[str]]]) -> bool:
    rule = robots.get(host)
    if not rule:
        return False
    rest = url.split("://", 1)[-1]
    path = "/" + rest.split("/", 1)[1] if "/" in rest else "/"
    # strip the query — identical to the engine's path_col (engine/udfs.py),
    # so a disallow prefix reaching the '?' boundary matches the same way
    # on both sides of the equivalence contract
    path = path.split("?", 1)[0]
    return any(path.startswith(p) for p in rule[1])


def host_budget(host: str, robots: dict[str, tuple[int, list[str]]], policy: CrawlPolicy) -> int:
    delay = robots.get(host, (0, []))[0]
    if delay <= 0:
        return policy.max_per_host
    return max(1, min(policy.max_per_host, policy.round_ms // delay))


def crawl(
    pages: dict[str, bytes],
    seeds: list[tuple[str, int]],
    robots: dict[str, tuple[int, list[str]]],
    policy: CrawlPolicy = CrawlPolicy(),
    extract_text_fn=None,
) -> CrawlResult:
    """Run the oracle crawl. ``pages`` maps canonical url -> html bytes;
    ``robots`` maps host -> (crawl_delay_ms, disallow_prefixes)."""
    from spider_spark.extract import extract_text as _xt

    extract_text_fn = extract_text_fn or _xt
    res = CrawlResult()
    frontier: dict[str, list] = {}  # url -> [priority, discovery_time, retries]

    for raw, prio in seeds:
        u = canonicalize_url(raw)
        if u is None:
            continue
        h = host_of(u)
        if u in res.seen:
            if u in frontier:
                frontier[u][0] = min(frontier[u][0], prio)
            continue
        res.seen.add(u)
        if _disallowed(u, h, robots):
            res.blocked.add(u)
        else:
            frontier[u] = [prio, 0, 0]

    seq = 0
    for r in range(1, policy.max_rounds + 1):
        if not frontier:
            break
        res.rounds = r
        # --- dequeue: top-K per host by (priority, discovery_time, url)
        by_host: dict[str, list[str]] = {}
        for u in frontier:
            by_host.setdefault(host_of(u), []).append(u)
        dequeued: list[str] = []
        for h in by_host:
            cand = sorted(by_host[h], key=lambda u: (frontier[u][0], frontier[u][1], u))
            dequeued.extend(cand[: host_budget(h, robots, policy)])

        # --- fetch + extract
        fetched: list[tuple[int, int, str]] = []  # (priority, dt, url)
        failed = 0
        new_prio: dict[str, int] = {}
        for u in dequeued:
            prio, dt, retries = frontier[u]
            if u in pages:
                fetched.append((prio, dt, u))
                del frontier[u]
                res.extracted[u] = extract_text_fn(pages[u])
                for link in extract_links(pages[u], u):
                    child_p = prio + 1
                    if link in new_prio:
                        new_prio[link] = min(new_prio[link], child_p)
                    else:
                        new_prio[link] = child_p
            else:
                failed += 1
                if retries + 1 > policy.max_retries:
                    res.dead.add(u)
                    del frontier[u]
                else:
                    frontier[u][2] = retries + 1

        # --- global order within round: pure function of data
        fetched.sort()
        for prio, dt, u in fetched:
            res.order.append((u, seq))
            seq += 1

        # --- dedup discovered links against seen; insert allowed ones
        new_urls = 0
        blocked = 0
        for link in sorted(new_prio):
            if policy.trap_filter and _is_trap(link):
                continue  # dropped BEFORE seen — mirrors the engine
            if link in res.seen:
                continue
            res.seen.add(link)
            h = host_of(link)
            if _disallowed(link, h, robots):
                res.blocked.add(link)
                blocked += 1
            else:
                frontier[link] = [new_prio[link], r, 0]
                new_urls += 1

        res.metrics.append(
            {
                "round": r,
                "dequeued": len(dequeued),
                "fetched": len(fetched),
                "failed": failed,
                "new_urls": new_urls,
                "blocked": blocked,
                "pending": len(frontier),
            }
        )
    return res
