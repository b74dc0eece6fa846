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

import pyarrow as pa

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
    # kind may be the string "pdf"/"listing" (oracle path) or a bool/np.bool_
    # is_pdf flag (engine path — precomputed in the parallel wave stage)
    is_pdf = (kind == "pdf") if isinstance(kind, str) else bool(kind)
    delay = cfg.default_delay_s if delay_override is None else delay_override
    if state.count < cfg.burst_allowance:
        t = state.last_vtime
    else:
        t = state.last_vtime + delay
    # sliding-window requests_per_minute cap
    if len(state.window) >= cfg.requests_per_minute:
        t = max(t, state.window[0] + 60.0)
    if is_pdf:
        t = max(t, state.last_pdf_vtime + cfg.inter_download_delay_s)
    state.count += 1
    state.last_vtime = t
    if is_pdf:
        state.last_pdf_vtime = t
    state.window.append(t)
    while len(state.window) > cfg.requests_per_minute:
        state.window.popleft()
    return t


class _PolitenessShardCore:
    """Budget owner for the hosts mapped to one shard (north rule: one
    politeness shard owns each host's budget). Holds HostState dict;
    assigns vtimes for its subsequence of an (ordered) wave."""

    def __init__(self, cfg: PolitenessConfig):
        self.cfg = cfg
        self.state: dict[str, HostState] = {}

    def assign(self, hosts: list[str], kinds: list[str],
               delays: dict[str, float] | None) -> list[float]:
        return assign_vtimes(hosts, kinds, self.state, self.cfg, delays)

    def assign_coded(self, uniques: list[str], codes, kinds,
                     delays: dict[str, float] | None):
        """Compact-transport fold: per-row hosts as (small unique list +
        int codes) instead of a per-row string list — the RPC payload for a
        1M-row wave drops from ~100 MB of pickled strings to a few MB of
        numpy. Fold semantics identical to ``assign``."""
        import numpy as np

        cfg = self.cfg
        state = self.state
        out = np.empty(len(codes), dtype=np.float64)
        # pre-resolve per-unique state + delay once (codes are dense)
        sts = []
        dls = []
        for h in uniques:
            st = state.get(h)
            if st is None:
                st = state[h] = HostState()
            sts.append(st)
            dls.append(delays.get(h) if delays else None)
        for i, (c, k) in enumerate(zip(codes.tolist(), kinds.tolist())):
            out[i] = next_vtime(sts[c], k, cfg, dls[c])
        return out

    def dump_state(self) -> dict:
        from .checkpoint import host_state_to_json

        return host_state_to_json(self.state)

    def load_state(self, obj: dict) -> None:
        from .checkpoint import host_state_from_json

        self.state.update(host_state_from_json(obj))


def make_politeness_shards(n_shards: int, cfg: PolitenessConfig):
    """Actor-backed shard pool (the cluster path)."""
    import ray

    # num_cpus=0: budget shards are lightweight state holders; they must
    # not reserve CPUs away from fetch/parse tasks
    actor = ray.remote(num_cpus=0)(_PolitenessShardCore)
    return [actor.remote(cfg) for _ in range(n_shards)]


class ShardedPoliteness:
    """K-sharded politeness scheduler: hosts are partitioned by stable
    host-hash; each shard folds its hosts' ordered request subsequence in
    parallel. Per-host results are identical to the sequential fold (host
    subsequences are independent) — parity is tested.

    ``use_actors=False`` keeps shards in-process (tests / small runs).
    """

    def __init__(self, cfg: PolitenessConfig, n_shards: int = 8,
                 use_actors: bool = False):
        self.cfg = cfg
        self.n = n_shards
        self.use_actors = use_actors
        if use_actors:
            self.shards = make_politeness_shards(n_shards, cfg)
        else:
            self.shards = [_PolitenessShardCore(cfg) for _ in range(n_shards)]

    @staticmethod
    def shard_of_host(host: str, n: int) -> int:
        from .urlnorm import hash64_one

        return int(hash64_one(host) % n)

    def assign(self, hosts, kinds, delays: dict[str, float] | None = None):
        """Assign vtimes for an ordered wave. ``hosts`` may be a python
        list or a pandas Series; per-host subsequences fold independently,
        so shards run in parallel (actor mode) with compact coded payloads.
        Returns a float64 numpy array in row order."""
        import numpy as np
        import pandas as pd

        n_rows = len(hosts)
        if n_rows == 0:
            return np.empty(0, dtype=np.float64)
        if isinstance(hosts, (pa.Array, pa.ChunkedArray)):
            # Arrow dictionary-encode (C++ hash) — ~5x pandas factorize on
            # million-row waves; this runs on the driver's critical path
            dic = pa.compute.dictionary_encode(hosts)
            if isinstance(dic, pa.ChunkedArray):
                dic = dic.combine_chunks()
            codes = dic.indices.to_numpy(zero_copy_only=False)
            uniques = dic.dictionary.to_pylist()
        else:
            codes, uniques = pd.factorize(
                hosts if isinstance(hosts, pd.Series) else pd.Series(hosts),
                sort=False,
            )
        kinds_arr = np.asarray(kinds, dtype=bool) if not isinstance(
            kinds, np.ndarray
        ) else kinds
        shard_of_unique = np.asarray(
            [self.shard_of_host(h, self.n) for h in uniques], dtype=np.int64
        )
        row_shard = shard_of_unique[codes]
        out = np.zeros(n_rows, dtype=np.float64)
        calls = []
        idxs = []
        for s in range(self.n):
            idx = np.nonzero(row_shard == s)[0]
            if not len(idx):
                continue
            # re-code shard rows against the shard's own unique list
            u_mask = shard_of_unique == s
            u_ids = np.nonzero(u_mask)[0]
            remap = np.full(len(uniques), -1, dtype=np.int64)
            remap[u_ids] = np.arange(len(u_ids))
            sub_uniques = [uniques[i] for i in u_ids]
            sub_codes = remap[codes[idx]]
            sub_kinds = kinds_arr[idx]
            if self.use_actors:
                calls.append(self.shards[s].assign_coded.remote(
                    sub_uniques, sub_codes, sub_kinds, delays))
            else:
                calls.append(self.shards[s].assign_coded(
                    sub_uniques, sub_codes, sub_kinds, delays))
            idxs.append(idx)
        if self.use_actors:
            import ray

            results = ray.get(calls)
        else:
            results = calls
        for idx, vt in zip(idxs, results):
            out[idx] = vt
        return out

    def dump_state(self) -> dict:
        if self.use_actors:
            import ray

            parts = ray.get([s.dump_state.remote() for s in self.shards])
        else:
            parts = [s.dump_state() for s in self.shards]
        merged: dict = {}
        for p in parts:
            merged.update(p)
        return merged

    def load_state(self, obj: dict) -> None:
        by_shard: list[dict] = [{} for _ in range(self.n)]
        for host, st in obj.items():
            by_shard[self.shard_of_host(host, self.n)][host] = st
        if self.use_actors:
            import ray

            ray.get([
                s.load_state.remote(part)
                for s, part in zip(self.shards, by_shard) if part
            ])
        else:
            for s, part in zip(self.shards, by_shard):
                if part:
                    s.load_state(part)


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
