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
