"""Sequential reference-semantics crawl oracle.

A tiny, deliberately naive reimplementation of the reference's crawl loop
(SURVEY.md §7.2 step 3): FIFO frontier, first-occurrence-wins URL dedup via
an in-memory set (portal_saude_mg.py:417-422), sequential fetches with the
3x retry ladder (:504-537), PDF validity filter (:539-561), politeness
accounting on a virtual clock, and sequential crawl numbering (:439).

Its outputs — ``crawl_order`` (canonical URLs in fetch order), ``seen``
(url_hash set), ``documents`` (interleaved span docs), ``vtimes`` — are the
golden targets the parallel Ray pipeline must match exactly.
"""

from __future__ import annotations

from collections import deque
from dataclasses import dataclass, field

from .config import CrawlConfig, DEFAULT_CRAWL
from .parse import links_of, parse_html_spans, parse_pdf_spans
from .politeness import HostState, assign_vtimes
from .synth import SynthWeb
from .urlnorm import canonicalize, hash64_one, host_of


@dataclass
class OracleResult:
    crawl_order: list[str] = field(default_factory=list)  # canonical urls, fetch order
    statuses: list[int] = field(default_factory=list)
    attempts: list[int] = field(default_factory=list)
    vtimes: list[float] = field(default_factory=list)
    seen: set[int] = field(default_factory=set)           # url_hash64 of every enqueued url
    documents: list[tuple[str, list[dict]]] = field(default_factory=list)
    errors: list[tuple[str, int]] = field(default_factory=list)  # (url, status)


def crawl_oracle_priority(
    web: SynthWeb,
    seeds: list[dict],
    cfg: CrawlConfig = DEFAULT_CRAWL,
    wave_cap: int = 50_000,
    per_host_cap: int = 30,
) -> OracleResult:
    """Sequential oracle for the priority-frontier mode (wave-synchronous
    spec, see pipeline.crawl_priority): backlog scored by recency minus
    depth, each wave fetches the top-priority entries under a per-host cap,
    children enter the backlog at wave boundaries."""
    from urllib.parse import urlsplit

    from .priority import priority_score_one
    from .robots import RobotsIndex

    res = OracleResult()
    host_state: dict[str, HostState] = {}
    robots = RobotsIndex(web.robots_body) if cfg.respect_robots else None
    backlog: list[tuple[float, int, str, int]] = []  # (priority, okey, url, depth)

    def blocked(url: str) -> bool:
        if robots is None:
            return False
        s = urlsplit(url)
        return not robots.allowed(s.hostname or "", s.path)

    def insert(url: str, depth: int, okey: int) -> None:
        if depth > cfg.max_depth or blocked(url):
            return
        h = hash64_one(url)
        if h in res.seen:
            return
        res.seen.add(h)
        backlog.append((priority_score_one(url, depth), okey, url, depth))

    for s in seeds:
        canon = canonicalize(s["url"])
        # okey encoding identical to frontier.order_key(parent_rank=-1, seq)
        insert(canon, 0, s["seq"] - (1 << 32))

    while backlog and len(res.crawl_order) < cfg.max_pages:
        backlog.sort(key=lambda r: (-r[0], r[1]))
        cap = min(wave_cap, cfg.max_pages - len(res.crawl_order))
        host_counts: dict[str, int] = {}
        selected, remaining = [], []
        for row in backlog:
            host = host_of(row[2])
            if len(selected) < cap and host_counts.get(host, 0) < per_host_cap:
                host_counts[host] = host_counts.get(host, 0) + 1
                selected.append(row)
            else:
                remaining.append(row)
        backlog = remaining
        if not selected:
            break
        children: list[tuple[int, str, int]] = []  # (okey, url, child_depth)
        for rank_off, (_prio, _okey, url, depth) in enumerate(selected):
            rank = len(res.crawl_order)
            kind = web.classify(url)
            host = host_of(url)
            delays = None
            if robots is not None and robots.crawl_delay(host) is not None:
                delays = {host: robots.crawl_delay(host)}
            vt = assign_vtimes([host], [kind], host_state, cfg.politeness, delays)[0]
            status, body, attempt = 0, b"", 0
            for attempt in range(1, cfg.retry.max_attempts + 1):
                status, body = web.fetch(url, attempt)
                if status in (200, 404):
                    break
            res.crawl_order.append(url)
            res.statuses.append(status)
            res.attempts.append(attempt)
            res.vtimes.append(vt)
            if status != 200:
                res.errors.append((url, status))
                continue
            if kind == "listing":
                spans = parse_html_spans(body.decode("utf-8"), url)
                res.documents.append((url, spans))
                for pos, (child, _t) in enumerate(links_of(spans)):
                    children.append(((rank << 32) | pos, child, depth + 1))
            elif kind == "pdf":
                if len(body) >= cfg.min_pdf_bytes and body.startswith(cfg.pdf_magic):
                    text = body[len(b"%PDF-1.4\n"):].decode("utf-8")
                    res.documents.append((url, parse_pdf_spans(text)))
                else:
                    res.errors.append((url, -1))
        # wave boundary: dedup children first-wins by okey, then insert
        children.sort(key=lambda c: c[0])
        seen_in_wave: set[str] = set()
        for okey, child, cdepth in children:
            if child in seen_in_wave:
                continue
            seen_in_wave.add(child)
            insert(child, cdepth, okey)
    return res


def crawl_oracle(
    web: SynthWeb,
    seeds: list[dict],
    cfg: CrawlConfig = DEFAULT_CRAWL,
) -> OracleResult:
    """Run the sequential crawl to completion (or cfg.max_pages)."""
    from urllib.parse import urlsplit

    from .robots import RobotsIndex

    res = OracleResult()
    host_state: dict[str, HostState] = {}
    queue: deque[tuple[str, int]] = deque()  # (url_canon, depth)
    robots = RobotsIndex(web.robots_body) if cfg.respect_robots else None

    def blocked(url: str) -> bool:
        if robots is None:
            return False
        s = urlsplit(url)
        return not robots.allowed(s.hostname or "", s.path)

    # Seed enqueue, first-occurrence-wins in seed order.
    for s in seeds:
        canon = canonicalize(s["url"])
        if blocked(canon):
            continue
        h = hash64_one(canon)
        if h in res.seen:
            continue
        res.seen.add(h)
        queue.append((canon, 0))

    while queue and len(res.crawl_order) < cfg.max_pages:
        url, depth = queue.popleft()
        kind = web.classify(url)
        host = host_of(url)
        # politeness vtime for this request (pure fold; shared with engine);
        # robots Crawl-delay overrides the default host delay
        delays = (
            {host: robots.crawl_delay(host)}
            if robots is not None and robots.crawl_delay(host) is not None
            else None
        )
        vt = assign_vtimes([host], [kind], host_state, cfg.politeness, delays)[0]

        status, body, attempt = 0, b"", 0
        for attempt in range(1, cfg.retry.max_attempts + 1):
            status, body = web.fetch(url, attempt)
            if status == 200 or status == 404:
                break  # 404 permanent: no retry; 5xx retries with backoff

        res.crawl_order.append(url)
        res.statuses.append(status)
        res.attempts.append(attempt)
        res.vtimes.append(vt)

        if status != 200:
            res.errors.append((url, status))
            continue

        if kind == "listing":
            spans = parse_html_spans(body.decode("utf-8"), url)
            res.documents.append((url, spans))
            if depth + 1 <= cfg.max_depth:
                for child, _title in links_of(spans):
                    if blocked(child):
                        continue
                    h = hash64_one(child)
                    if h in res.seen:
                        continue
                    res.seen.add(h)
                    queue.append((child, depth + 1))
        elif kind == "pdf":
            if len(body) >= cfg.min_pdf_bytes and body.startswith(cfg.pdf_magic):
                text = body[len(b"%PDF-1.4\n"):].decode("utf-8")
                res.documents.append((url, parse_pdf_spans(text)))
            else:
                res.errors.append((url, -1))  # corrupt-pdf quarantine
    return res
