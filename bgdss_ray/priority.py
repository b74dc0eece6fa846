"""Priority frontier: host-bucketed selection with recency/depth scoring.

The reference's crawl order is newest-first listing order (it delegates
ordering to the site's ``ordering=newest`` param, portal_saude_mg.py:37).
BFS mode reproduces that exactly. This module adds the north-star *priority
frontier*: candidates carry a recency score (year*12+month parsed from the
URL, minus a depth penalty), the backlog is a materialized table, and each
wave admits the top-priority candidates under a **per-host cap** (hot-host
skew control: no host may occupy more than ``per_host_cap`` slots of a
wave, so one hot gov.br portal cannot monopolize fetch capacity).

Semantics are wave-synchronous by specification (children enter the
frontier at wave boundaries); ``oracle_priority.crawl_oracle_priority``
implements the same spec sequentially and the engine must match it exactly
(tests/test_priority.py).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

_YEAR_RE = r"(?:by_year=(\d{4}))|(?:/docs/(\d{4})/)"
_MONTH_RE = r"(?:by_month=(\d{1,2}))|(?:/docs/\d{4}/(\d{1,2})/)"


def priority_scores(urls: pd.Series, depths: np.ndarray,
                    depth_penalty: float = 1.0) -> np.ndarray:
    """Vectorized recency score: year*12 + month (from query params or
    /docs/ path), minus depth penalty. Unknown dates score 0."""
    y = urls.str.extract(_YEAR_RE)
    year = pd.to_numeric(y[0].fillna(y[1]), errors="coerce").fillna(0).to_numpy()
    m = urls.str.extract(_MONTH_RE)
    month = pd.to_numeric(m[0].fillna(m[1]), errors="coerce").fillna(0).to_numpy()
    return (year * 12 + month - depth_penalty * depths).astype(np.float64)


def priority_score_one(url: str, depth: int, depth_penalty: float = 1.0) -> float:
    """Scalar twin of priority_scores (oracle side)."""
    return float(
        priority_scores(pd.Series([url]), np.array([depth]), depth_penalty)[0]
    )


def select_wave(
    backlog: pa.Table,
    wave_cap: int,
    per_host_cap: int,
) -> tuple[pa.Table, pa.Table]:
    """Top-priority selection under per-host caps.

    ``backlog`` columns include priority (float64), okey (int64, the
    deterministic tie-break), host. Returns (selected, remaining), both in
    backlog schema; selected is ordered by (-priority, okey) — the crawl
    order of the wave.

    Per-host cap = hot-host skew mitigation: rows beyond the cap stay in
    the backlog for later waves.
    """
    n = backlog.num_rows
    if n == 0:
        return backlog, backlog
    prio = backlog.column("priority").to_numpy(zero_copy_only=False)
    okey = backlog.column("okey").to_numpy(zero_copy_only=False)
    order = np.lexsort((okey, -prio))
    hosts = backlog.column("host").to_pandas()

    host_codes, _ = pd.factorize(hosts, sort=False)
    counts: dict[int, int] = {}
    take_idx = []
    for i in order:
        h = host_codes[i]
        c = counts.get(h, 0)
        if c >= per_host_cap:
            continue
        counts[h] = c + 1
        take_idx.append(i)
        if len(take_idx) >= wave_cap:
            break
    take = np.asarray(take_idx, dtype=np.int64)
    mask = np.zeros(n, dtype=bool)
    mask[take] = True
    selected = backlog.take(pa.array(take))
    remaining = backlog.filter(pa.array(~mask))
    return selected, remaining


def select_wave_ds(backlog_ds, wave_cap: int, per_host_cap: int) -> pa.Table:
    """Distributed twin of :func:`select_wave` over a backlog DATASET.

    Per-host candidate heads come from ``groupby(host).map_groups`` — each
    host contributes its top ``min(per_host_cap, wave_cap)`` rows by
    (-priority, okey), and no row beyond a host's cap can ever be selected
    (the greedy walk never takes more than ``per_host_cap`` from one host),
    so running the exact same greedy walk over ONLY the merged heads yields
    the same selection as over the full backlog. Driver memory:
    O(hosts × cap) heads, never the backlog. Equality with
    :func:`select_wave` is parity-tested.

    Returns the selected rows ordered by (-priority, okey); the caller
    drops them from the backlog dataset by okey anti-join.
    """
    k = min(per_host_cap, wave_cap)

    def partial_heads(b: pd.DataFrame) -> pd.DataFrame:
        # combiner: per-batch per-host top-k BEFORE the shuffle — the
        # global per-host top-k is a subset of the union of per-batch
        # top-ks, so the groupby only moves O(blocks x hosts x k) rows
        # instead of the whole backlog
        return (
            b.sort_values(["priority", "okey"], ascending=[False, True])
            .groupby("host", sort=False)
            .head(k)
        )

    def head(g: pd.DataFrame) -> pd.DataFrame:
        return g.sort_values(
            ["priority", "okey"], ascending=[False, True]
        ).head(k)

    heads_df = (
        backlog_ds.map_batches(partial_heads, batch_format="pandas")
        .groupby("host")
        .map_groups(head, batch_format="pandas")
        .to_pandas()
    )
    heads = pa.Table.from_pandas(heads_df, preserve_index=False)
    selected, _ = select_wave(heads, wave_cap, per_host_cap)
    return selected
