"""Per-host politeness budgets on a virtual clock.

The reference's budget constants (config/sites_config.json:184-217: 2.0 s
default delay, 30 req/min sliding window, burst 5; plus the 0.5 s
inter-download delay, portal_saude_mg.py:479) are applied here as a **pure
fold over each host's ordered request sequence** — no wall clock, no timing
observation. Both the sequential oracle and the Ray engine call the same
function over the same deterministic order, so virtual schedules match
exactly (SURVEY.md §7.5 item 3).

At cluster scale the per-host fold state lives in politeness shard actors
keyed ``hash(host) % n_shards`` (one budget owner per host, north rule); in
the wave-driver it is a small dict folded on the driver because the state is
O(hosts), not O(URLs).
"""

from __future__ import annotations

from collections import deque
from dataclasses import dataclass, field

from .config import PolitenessConfig


@dataclass
class HostState:
    """Fold state for one host."""

    count: int = 0
    last_vtime: float = 0.0
    last_pdf_vtime: float = float("-inf")
    window: deque = field(default_factory=deque)  # vtimes of recent requests


def next_vtime(
    state: HostState,
    kind: str,
    cfg: PolitenessConfig,
    delay_override: float | None = None,
) -> float:
    """Virtual start time for the next request to this host; mutates state.

    ``delay_override`` is the host's robots.txt Crawl-delay when declared
    (north rule: robots + crawl-delay budgets); otherwise the default.
    """
    delay = cfg.default_delay_s if delay_override is None else delay_override
    if state.count < cfg.burst_allowance:
        t = state.last_vtime
    else:
        t = state.last_vtime + delay
    # sliding-window requests_per_minute cap
    if len(state.window) >= cfg.requests_per_minute:
        t = max(t, state.window[0] + 60.0)
    if kind == "pdf":
        t = max(t, state.last_pdf_vtime + cfg.inter_download_delay_s)
    state.count += 1
    state.last_vtime = t
    if kind == "pdf":
        state.last_pdf_vtime = t
    state.window.append(t)
    while len(state.window) > cfg.requests_per_minute:
        state.window.popleft()
    return t


def assign_vtimes(
    hosts: list[str],
    kinds: list[str],
    state: dict[str, HostState],
    cfg: PolitenessConfig,
    delays: dict[str, float] | None = None,
) -> list[float]:
    """Assign virtual fetch times to an ordered request sequence.

    ``state`` carries across calls (waves); pass the same dict to keep one
    continuous per-host budget over the whole crawl. ``delays`` maps hosts
    to robots Crawl-delay overrides.
    """
    out = []
    for h, k in zip(hosts, kinds):
        st = state.get(h)
        if st is None:
            st = state[h] = HostState()
        out.append(next_vtime(st, k, cfg, delays.get(h) if delays else None))
    return out
