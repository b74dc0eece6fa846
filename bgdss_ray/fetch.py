"""Fetch stage: frontier rows → fetch results (simulated HTTP).

An actor-pool ``map_batches`` stage (the reference's "one heavyweight
session per worker" pattern — WebDriver/session state in the reference,
portal_saude_mg.py:181-204 — becomes per-actor connection state here). The
retry ladder reproduces portal_saude_mg.py:504-537: up to 3 attempts with
2*attempt-second virtual backoff; 404 is permanent (no retry), 5xx retries.

The sandbox has no network; ``SynthWeb.fetch`` is a pure function of the
URL, which is exactly what lets fetch actors run with zero shared corpus
state at any scale. On a real cluster this class swaps its body for an
aiohttp session (state in __init__, batched async GETs in __call__) without
touching the pipeline.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .config import CrawlConfig, DEFAULT_CRAWL
from .synth import SynthWeb, SynthWebConfig


def probe_site(web, host: str) -> dict:
    """Pre-flight site health probe (reference: GET base_url + status +
    latency, portal_saude_mg.py:730-747). Returns per-host health fields
    for the politeness state; latency is virtual (deterministic)."""
    url = f"https://{host}/resolucoes?by_month=1&by_year=2023&ordering=newest&page=1"
    from .urlnorm import canonicalize

    status, body = web.fetch(canonicalize(url), attempt=1)
    return {
        "host": host,
        "status": status,
        "healthy": status == 200,
        "content_len": len(body),
    }


class FetchStage:
    """map_batches callable over frontier-wave batches.

    Input columns:  url, url_hash, host, depth, crawl_seq, vtime
    Output columns: FETCH_RESULTS (adds status, attempts, body, content_len,
                    kind; vtime becomes completion vtime incl. backoff).
    """

    def __init__(self, web_cfg: SynthWebConfig, cfg: CrawlConfig = DEFAULT_CRAWL):
        self.web = SynthWeb(web_cfg)  # per-actor "session"
        self.cfg = cfg

    def fetch_one(self, url: str) -> tuple[int, bytes, int, float]:
        backoff = 0.0
        status, body, attempt = 0, b"", 0
        for attempt in range(1, self.cfg.retry.max_attempts + 1):
            status, body = self.web.fetch(url, attempt)
            if status in (200, 404):
                break
            backoff += self.cfg.retry.backoff_base_s * attempt
        return status, body, attempt, backoff

    def __call__(self, batch: pa.Table) -> pa.Table:
        urls = batch.column("url").to_pylist()
        statuses = np.empty(len(urls), dtype=np.int32)
        attempts = np.empty(len(urls), dtype=np.int32)
        bodies: list[bytes] = []
        kinds: list[str] = []
        backoffs = np.zeros(len(urls), dtype=np.float64)
        for i, url in enumerate(urls):
            status, body, att, backoff = self.fetch_one(url)
            statuses[i] = status
            attempts[i] = att
            backoffs[i] = backoff
            bodies.append(body)
            kinds.append(self.web.classify(url))
        n = len(urls)
        vtime = batch.column("vtime").to_numpy(zero_copy_only=False) + backoffs
        lens = np.fromiter((len(b) for b in bodies), dtype=np.int64, count=n)
        return pa.Table.from_arrays(
            [
                batch.column("url"),
                batch.column("url_hash"),
                batch.column("host"),
                batch.column("depth"),
                pa.array(statuses),
                pa.array(attempts),
                pa.array(bodies, type=pa.large_binary()),
                pa.array(lens),
                pa.array(kinds, type=pa.string()),
                batch.column("crawl_seq"),
                pa.array(vtime),
            ],
            names=[
                "url", "url_hash", "host", "depth", "status", "attempts",
                "body", "content_len", "kind", "crawl_seq", "vtime",
            ],
        )
