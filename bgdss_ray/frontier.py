"""Frontier primitives: order keys, in-wave dedup, robots masks, seeds.

Crawl order is *computed, not observed* (SURVEY.md §7.5 item 1): a child's
rank derives from ``(parent_rank, link_pos)`` — the order the sequential
reference crawler would have enqueued it — never from task timing, so
first-occurrence-wins semantics (portal_saude_mg.py:417-422,439) hold
under arbitrary parallelism. Three parity-tested dedup implementations:
driver numpy (``dedup_candidates``, priority mode), distributed
groupby + minima join-back (``dedup_candidates_grouped``, ultra-wide
waves), and the shard-parallel admission actors in ``admission.py``
(the BFS hot path, which owns seen-marking as well).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from .urlnorm import url_hash64

CANDIDATE_COLUMNS = ["url", "depth", "parent_rank", "link_pos"]

_HOST_RE = r"^[a-z][a-z0-9+.\-]*://([^/?#:]+)"


def hosts_and_kinds(url_col) -> tuple[list[str], list[str]]:
    """Vectorized host + kind extraction from canonical URLs.

    Equivalent to [host_of(u)] / [SynthWeb.classify(u)] per URL (canonical
    URLs have lowercase hosts already); pandas str kernels instead of
    urlsplit per row. Parity with the scalar path is covered by the
    crawl-vs-oracle equality tests.
    """
    s = pd.Series(url_col.to_pylist() if hasattr(url_col, "to_pylist") else url_col)
    hosts = s.str.extract(_HOST_RE, expand=False).fillna("")
    path = s.str.replace(_HOST_RE, "", regex=True).str.split("?").str[0]
    kinds = np.where(
        path.str.startswith("/docs/") & path.str.endswith(".pdf"),
        "pdf",
        np.where(path.str.startswith("/resolucoes"), "listing", "other"),
    )
    return hosts.tolist(), kinds.tolist()

_ORDER_SHIFT = np.int64(1) << np.int64(32)


def order_key(parent_rank: np.ndarray, link_pos: np.ndarray) -> np.ndarray:
    return parent_rank.astype(np.int64) * _ORDER_SHIFT + link_pos.astype(np.int64)


def dedup_candidates(table: pa.Table) -> pa.Table:
    """In-wave exact dedup, first occurrence (min order key) wins.

    Driver/numpy path — used when the wave's candidate set is small enough
    to sit on the driver. ``dedup_candidates_grouped`` is the distributed
    equivalent; tests assert identical output.
    """
    if table.num_rows == 0:
        if "url_hash" not in table.schema.names:
            table = table.append_column("url_hash", pa.array([], type=pa.uint64()))
        return table
    if "url_hash" in table.schema.names:
        hashes = table.column("url_hash").to_numpy(zero_copy_only=False)
        table = table.drop_columns(["url_hash"])
    else:
        hashes = url_hash64(table.column("url").to_pylist())
    keys = order_key(
        table.column("parent_rank").to_numpy(zero_copy_only=False),
        table.column("link_pos").to_numpy(zero_copy_only=False),
    )
    # stable argsort by (hash, key): first row per hash = min key
    order = np.lexsort((keys, hashes))
    sorted_hashes = hashes[order]
    first = np.ones(len(order), dtype=bool)
    first[1:] = sorted_hashes[1:] != sorted_hashes[:-1]
    keep = order[first]
    keep.sort()  # restore original order for determinism of downstream sort
    out = table.take(pa.array(keep))
    return out.append_column("url_hash", pa.array(hashes[keep], type=pa.uint64()))


def dedup_candidates_grouped(ds) -> pa.Table:
    """Distributed in-wave dedup: hash-keyed groupby, min order key per group.

    The scale path for wide waves (candidate fan-out >> driver memory):
    ``groupby(url_hash)`` co-locates duplicates, each group keeps its
    first-occurrence row. Returns the collected deduped candidates (the
    *admitted wave* is budget-bounded even when the backlog is not).
    """
    import ray.data  # local import: module must import without ray initialised

    def add_keys(batch: pa.Table) -> pa.Table:
        if "url_hash" not in batch.schema.names:
            hashes = url_hash64(batch.column("url").to_pylist())
            batch = batch.append_column("url_hash", pa.array(hashes, type=pa.uint64()))
        keys = order_key(
            batch.column("parent_rank").to_numpy(zero_copy_only=False),
            batch.column("link_pos").to_numpy(zero_copy_only=False),
        )
        # int64 reinterpretation of the hash for the shuffle key: Ray/pandas
        # degrade uint64 columns to float64 (precision loss past 2^53 drops
        # rows); the bit pattern is what matters, not the sign
        h_i64 = batch.column("url_hash").to_numpy(zero_copy_only=False).view(np.int64)
        return batch.append_column(
            "okey", pa.array(keys, type=pa.int64())
        ).append_column("hash_i64", pa.array(h_i64, type=pa.int64()))

    from ray.data.aggregate import Min

    keyed = ds.map_batches(add_keys, batch_format="pyarrow").materialize()
    # native Min aggregate (C-speed shuffle, NO per-group python), then the
    # per-hash minima join BACK distributed (hash-partitioned on hash_i64):
    # a row survives iff its okey is its hash's minimum —
    # first-occurrence-wins with no O(distinct-hashes) driver state
    mins = keyed.groupby("hash_i64").aggregate(Min("okey", alias_name="okey_min"))
    keep_cols = keyed.schema().names

    def keep_winners(t: pa.Table) -> pa.Table:
        m = pa.compute.equal(t.column("okey"), t.column("okey_min"))
        return t.filter(m).select(keep_cols)

    import ray as _ray

    # join partitions sized to the cluster: each hash-shuffle partition is
    # an aggregator slot, and oversubscribing a small node's CPUs deadlocks
    n_part = max(2, min(64, int(_ray.available_resources().get("CPU", 4))))
    winners = keyed.join(
        mins, join_type="inner", num_partitions=n_part, on=("hash_i64",)
    ).map_batches(keep_winners, batch_format="pyarrow")
    parts = [
        b for b in winners.iter_batches(batch_size=None, batch_format="pyarrow")
    ]
    if not parts:
        return dedup_candidates(
            pa.Table.from_arrays(
                [pa.array([], type=t) for t in
                 [pa.string(), pa.int32(), pa.int64(), pa.int32()]],
                names=CANDIDATE_COLUMNS,
            )
        )
    out = pa.concat_tables(parts)
    if out.num_rows:
        out = out.sort_by("okey")
        # exact-duplicate rows (same hash AND same okey — possible when the
        # same candidate row appears twice) both pass the min filter; keep
        # the first of each run
        h = out.column("hash_i64").to_numpy(zero_copy_only=False)
        k = out.column("okey").to_numpy(zero_copy_only=False)
        first = np.ones(len(h), dtype=bool)
        first[1:] = ~((h[1:] == h[:-1]) & (k[1:] == k[:-1]))
        if not first.all():
            out = out.filter(pa.array(first))
        out = out.drop_columns(["okey", "hash_i64"])
        out = out.set_column(
            out.schema.get_field_index("url_hash"),
            "url_hash",
            out.column("url_hash").cast(pa.uint64()),
        )
    return out


def robots_allowed_mask(urls: pd.Series, hosts: pd.Series, robots) -> np.ndarray:
    """Vectorized Disallow-prefix check: one groupby pass to get each
    host's row indices (O(rows)), then subset prefix checks only for hosts
    that actually declare Disallow rules."""
    mask = np.ones(len(urls), dtype=bool)
    host_rows = hosts.groupby(hosts, sort=False).indices
    blocked_hosts = {
        h: robots.rules_for(h).disallow
        for h in host_rows
        if robots.rules_for(h).disallow
    }
    if not blocked_hosts:
        return mask
    # compute paths ONLY for rows of hosts that declare Disallow rules
    # (typically a fraction of the wave) — never the whole column
    sel = np.concatenate([host_rows[h] for h in blocked_hosts])
    sub_urls = urls.iloc[sel]
    paths = sub_urls.str.replace(_HOST_RE, "", regex=True).str.split("?").str[0]
    pos = {h: i for i, h in enumerate(blocked_hosts)}
    bounds = np.cumsum([0] + [len(host_rows[h]) for h in blocked_hosts])
    for host, disallow in blocked_hosts.items():
        i = pos[host]
        seg = paths.iloc[bounds[i]:bounds[i + 1]]
        bad = np.zeros(len(seg), dtype=bool)
        for d in disallow:
            bad |= seg.str.startswith(d).to_numpy()
        mask[host_rows[host]] = ~bad
    return mask


def seeds_to_candidates(seed_rows: list[dict], robots=None) -> pa.Table:
    """Seed list → candidate table (parent_rank=-1, link_pos=seed seq),
    with host/is_pdf/blocked precomputed like crawled candidates carry."""
    from .urlnorm import canonicalize

    urls = [canonicalize(r["url"]) for r in seed_rows]
    hosts, kinds = hosts_and_kinds(pd.Series(urls)) if urls else ([], [])
    is_pdf = np.asarray([k == "pdf" for k in kinds], dtype=bool)
    if robots is not None and urls:
        blocked = ~robots_allowed_mask(pd.Series(urls), pd.Series(hosts), robots)
    else:
        blocked = np.zeros(len(urls), dtype=bool)
    return pa.Table.from_arrays(
        [
            pa.array(urls, type=pa.string()),
            pa.array(np.zeros(len(seed_rows), dtype=np.int32)),
            pa.array(np.full(len(seed_rows), -1, dtype=np.int64)),
            pa.array(np.asarray([r["seq"] for r in seed_rows], dtype=np.int32)),
            pa.array(hosts, type=pa.string()),
            pa.array(is_pdf),
            pa.array(blocked),
            pa.array(url_hash64(urls), type=pa.uint64()),
        ],
        names=CANDIDATE_COLUMNS + ["host", "is_pdf", "blocked", "url_hash"],
    )
