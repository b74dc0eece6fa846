"""Shard-parallel wave admission: the frontier's dedup → seen-check →
filter path as K hash-partitioned actors.

The wave stage pushes each batch's exploded candidate links directly to the
admission shards (candidate ``url_hash % K`` picks the shard), so candidate
rows NEVER flow through the driver. After a wave's map completes, every
shard — in parallel — dedups its accumulated candidates
(first-occurrence-wins by order key, correct because equal hashes always
land on the same shard), applies the depth/robots gates, marks new hashes
seen (enqueue semantics, oracle parity: portal_saude_mg.py:417-422), and
returns its admitted slice sorted by order key. The driver merges K sorted
slices and assigns ranks/vtimes — O(wave) vectorized work only; the
O(candidates) python (seen-set membership, dedup) runs shard-parallel.

This is the north rule's sharded seen set actually owning admission: on a
real cluster each shard co-locates with its slice of the frontier store and
the merge is the only driver touch.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray

from .seen import _ShardCore

# candidate schema pushed by the wave stage / seed bootstrap
CAND_COLS = ["url", "parent_rank", "link_pos", "depth",
             "url_hash", "host", "is_pdf", "blocked"]

_ORDER_SHIFT = np.int64(1) << np.int64(32)


def _okey(parent_rank: np.ndarray, link_pos: np.ndarray) -> np.ndarray:
    return parent_rank.astype(np.int64) * _ORDER_SHIFT + link_pos.astype(np.int64)


class AdmissionShardCore:
    """One shard: pending candidate buffer + seen-set partition.

    ``add`` buffers (cheap, called from wave-stage workers); ``admit`` does
    the whole per-shard admission for the wave. Deterministic regardless of
    add() arrival order — dedup sorts by (hash, okey), never by arrival.
    """

    def __init__(self, seen_mode: str = "exact", max_depth: int = 3,
                 log2_buckets: int = 16):
        self.seen = _ShardCore(mode=seen_mode, log2_buckets=log2_buckets)
        self.max_depth = max_depth
        self.pending: list[pa.Table] = []
        self.pending_refs: list[tuple] = []

    def add(self, t: pa.Table) -> int:
        self.pending.append(t)
        return t.num_rows

    def add_ref(self, wrapped_ref: list, shard_id: int, n_shards: int) -> int:
        """Register a SHARED candidate-table object (put to plasma once by
        the producing task; every shard holds the same ref and slices its
        own hash partition lazily at admit time — zero-copy reads, no
        per-shard table copies on the push path)."""
        self.pending_refs.append((wrapped_ref[0], shard_id, n_shards))
        return 0

    def load_seen(self, hashes: np.ndarray) -> int:
        return self.seen.bulk_add(np.asarray(hashes, dtype=np.uint64))

    def seen_size(self) -> int:
        return self.seen.size()

    def admit(self) -> tuple[pa.Table, np.ndarray, int]:
        """Admit this shard's pending candidates.

        Returns (admitted rows sorted by okey — with an ``okey`` column the
        driver merges on, new hashes marked this wave, total candidate rows
        before dedup — ref-shared rows counted by shard 0 only so the
        driver's sum is the true candidate total).
        """
        parts = list(self.pending)
        self.pending.clear()
        n_in = sum(p.num_rows for p in parts)
        if self.pending_refs:
            refs = [r for r, _s, _n in self.pending_refs]
            metas = [(s, n) for _r, s, n in self.pending_refs]
            self.pending_refs.clear()
            for full, (sid, n_shards) in zip(ray.get(refs), metas):
                if sid == 0:  # count each shared table once across shards
                    n_in += full.num_rows
                h = full.column("url_hash").to_numpy(zero_copy_only=False)
                mine = (h % np.uint64(n_shards)).astype(np.int64) == sid
                if mine.any():
                    parts.append(full.filter(pa.array(mine)))
        if not parts:
            return _empty_admitted(), np.empty(0, dtype=np.uint64), n_in
        t = pa.concat_tables(parts, promote_options="none")

        # depth gate FIRST (oracle never marks too-deep children seen),
        # then robots (blocked flags precomputed in the wave stage)
        depth = t.column("depth").to_numpy(zero_copy_only=False)
        mask = depth <= self.max_depth
        blocked = t.column("blocked").to_numpy(zero_copy_only=False)
        mask &= ~np.asarray(blocked, dtype=bool)
        if not mask.all():
            t = t.filter(pa.array(mask))
        if t.num_rows == 0:
            return _empty_admitted(), np.empty(0, dtype=np.uint64), n_in

        hashes = t.column("url_hash").to_numpy(zero_copy_only=False)
        keys = _okey(
            t.column("parent_rank").to_numpy(zero_copy_only=False),
            t.column("link_pos").to_numpy(zero_copy_only=False),
        )
        # in-wave dedup: first occurrence (min okey) per hash — shard-local
        # IS global because equal hashes shard identically
        order = np.lexsort((keys, hashes))
        sh = hashes[order]
        first = np.ones(len(order), dtype=bool)
        first[1:] = sh[1:] != sh[:-1]
        keep = np.sort(order[first])
        t = t.take(pa.array(keep))
        hashes = hashes[keep]
        keys = keys[keep]

        # seen check in okey order (oracle marks at enqueue, FIFO order)
        o = np.argsort(keys, kind="stable")
        new_mask = np.zeros(len(keys), dtype=bool)
        new_mask[o] = self.seen.check_and_add(hashes[o])
        new_hashes = hashes[new_mask]  # delta is a set on reload; order free
        t = t.filter(pa.array(new_mask))
        keys = keys[new_mask]
        o2 = np.argsort(keys, kind="stable")
        t = t.take(pa.array(o2)).append_column(
            "okey", pa.array(keys[o2], type=pa.int64())
        )
        return t, new_hashes, n_in


def _empty_admitted() -> pa.Table:
    return pa.Table.from_arrays(
        [
            pa.array([], type=pa.string()),
            pa.array([], type=pa.int64()),
            pa.array([], type=pa.int32()),
            pa.array([], type=pa.int32()),
            pa.array([], type=pa.uint64()),
            pa.array([], type=pa.string()),
            pa.array([], type=pa.bool_()),
            pa.array([], type=pa.bool_()),
            pa.array([], type=pa.int64()),
        ],
        names=CAND_COLS + ["okey"],
    )


# num_cpus=0: admission shards are index holders; they must never reserve
# CPUs away from the fetch/parse map tasks (full reservation deadlocks
# small nodes — see BASELINE.md round-1 notes)
AdmissionShardActor = ray.remote(num_cpus=0)(AdmissionShardCore)


class ShardedAdmission:
    """Driver-side handle over K admission shard actors."""

    def __init__(self, n_shards: int, seen_mode: str, max_depth: int,
                 log2_buckets: int = 16):
        self.n = n_shards
        self.shards = [
            AdmissionShardActor.remote(
                seen_mode=seen_mode, max_depth=max_depth,
                log2_buckets=log2_buckets,
            )
            for _ in range(n_shards)
        ]

    def handles(self) -> list:
        return self.shards

    def route_add(self, t: pa.Table) -> None:
        """Driver-side routing (seed bootstrap; resume keeps its queue on
        the driver and reloads the seen set via load_seen)."""
        ray.get(push_candidates(t, self.shards))

    def load_seen(self, hashes: np.ndarray) -> None:
        hashes = np.asarray(hashes, dtype=np.uint64)
        shard_of = (hashes % np.uint64(self.n)).astype(np.int64)
        refs = []
        for s in range(self.n):
            part = hashes[shard_of == s]
            if len(part):
                refs.append(self.shards[s].load_seen.remote(part))
        ray.get(refs)

    def admit_all(self) -> tuple[pa.Table, np.ndarray, int]:
        """Parallel per-shard admission → (globally okey-sorted admitted
        table, new hashes, total candidate rows seen this wave)."""
        out = ray.get([s.admit.remote() for s in self.shards])
        tables = [t for t, _h, _n in out if t.num_rows]
        new_hashes = np.concatenate([h for _t, h, _n in out]) \
            if out else np.empty(0, dtype=np.uint64)
        n_cand = sum(n for _t, _h, n in out)
        if not tables:
            return _empty_admitted(), new_hashes, n_cand
        merged = pa.concat_tables(tables, promote_options="none")
        okeys = merged.column("okey").to_numpy(zero_copy_only=False)
        merged = merged.take(pa.array(np.argsort(okeys, kind="stable")))
        return merged, new_hashes, n_cand

    def seen_size(self) -> int:
        return sum(ray.get([s.seen_size.remote() for s in self.shards]))


def push_candidates_shared(t: pa.Table, shards: list) -> list:
    """Producer-side push: put the candidate table to plasma ONCE and hand
    every shard the same ref (it slices its hash partition at admit time,
    zero-copy). K tiny RPCs instead of K table copies — this is what keeps
    wave-stage tasks from stalling on the push path."""
    if t.num_rows == 0:
        return []
    t = t.select(CAND_COLS)
    ref = ray.put(t)
    n = len(shards)
    return [s.add_ref.remote([ref], i, n) for i, s in enumerate(shards)]


def push_candidates(t: pa.Table, shards: list) -> list:
    """Partition a candidate table by url_hash % K and push each slice to
    its shard. Called from wave-stage workers (and the driver bootstrap);
    returns the in-flight ObjectRefs — caller decides whether to block.
    """
    if t.num_rows == 0:
        return []
    t = t.select(CAND_COLS)  # one canonical schema for shard-side concat
    n = len(shards)
    hashes = t.column("url_hash").to_numpy(zero_copy_only=False)
    shard_of = (hashes % np.uint64(n)).astype(np.int64)
    refs = []
    for s in range(n):
        idx = np.nonzero(shard_of == s)[0]
        if len(idx):
            refs.append(shards[s].add.remote(t.take(pa.array(idx))))
    return refs
