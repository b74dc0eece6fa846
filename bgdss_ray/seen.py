"""URL-seen set: sharded actors (exact set / cuckoo filter).

The reference's seen set is a single in-memory Python set consulted
sequentially (portal_saude_mg.py:417-422). At 10^10-URL scale the seen set
is the shared mutable index the Dataset API cannot express, so it is the one
place this engine drops to raw Ray actors (north rule: sharded cuckoo-filter
URL-seen set): K shard actors, shard = url_hash % K, each holding either an
exact uint64 set (correctness path) or a cuckoo filter (memory path,
~2 bytes/key at 16-bit fingerprints vs ~32 for a set entry).

``check_and_add`` is atomic per shard: it marks every hash seen and returns
the was-new mask — first-occurrence-wins is enforced by the caller feeding
hashes in deterministic order *within* a call and by in-wave dedup *before*
the call, so cross-task timing never affects the outcome.

Insert-only usage keeps the cuckoo path safe (no deletes); on insert
overflow a shard falls back to an exact spill set, so false negatives are
impossible and false positives stay bounded (SURVEY.md §7.5 item 2).
"""

from __future__ import annotations

import numpy as np
import ray


class CuckooFilter:
    """Minimal two-choice cuckoo filter over uint64 keys, insert/contains only.

    buckets: (2^log2_buckets, slots) uint16 fingerprint table, 0 = empty.
    """

    MAX_KICKS = 250

    def __init__(self, log2_buckets: int = 16, slots: int = 4, seed: int = 7):
        self.n_buckets = 1 << log2_buckets
        self.mask = self.n_buckets - 1
        self.table = np.zeros((self.n_buckets, slots), dtype=np.uint16)
        self.seed = np.uint64(seed * 2 + 1)
        self.spill: set[int] = set()  # exact overflow — no false negatives
        self.count = 0

    def _fp(self, h: np.uint64) -> int:
        fp = int((h >> np.uint64(48)) & np.uint64(0xFFFF))
        return fp or 1  # 0 is the empty marker

    def _i1(self, h: np.uint64) -> int:
        return int(h) & self.mask

    def _i2(self, i1: int, fp: int) -> int:
        # partial-key cuckoo: alternate bucket = i1 xor hash(fp)
        return (i1 ^ (fp * 0x5BD1E995)) & self.mask

    def contains(self, h: int) -> bool:
        hu = np.uint64(h)
        fp = self._fp(hu)
        i1 = self._i1(hu)
        if fp in self.table[i1]:
            return True
        i2 = self._i2(i1, fp)
        if fp in self.table[i2]:
            return True
        return h in self.spill

    def add(self, h: int) -> None:
        """Two-choice insert; both buckets full → exact spill set.

        No eviction chains: a kick chain that fails would have to undo
        every displacement or it silently drops a victim fingerprint (a
        false negative — fatal for a seen set). Two-choice + exact spill
        keeps "never forgets a key" trivially true; the spill stays small
        below ~80% load and is part of size/memory accounting.
        """
        hu = np.uint64(h)
        fp = self._fp(hu)
        i1 = self._i1(hu)
        i2 = self._i2(i1, fp)
        for i in (i1, i2):
            row = self.table[i]
            empty = np.nonzero(row == 0)[0]
            if len(empty):
                row[empty[0]] = fp
                self.count += 1
                return
        self.spill.add(h)  # both buckets full: exact spill


class _ShardCore:
    """Shard logic shared by the local and the actor wrappers."""

    def __init__(self, mode: str = "exact", log2_buckets: int = 16):
        self.mode = mode
        self.exact: set[int] = set()
        self.cuckoo = CuckooFilter(log2_buckets=log2_buckets) if mode == "cuckoo" else None

    def check_and_add(self, hashes: np.ndarray) -> np.ndarray:
        """Mark all hashes seen; return bool mask: True where hash was new.

        Duplicate hashes within one call: only the first occurrence is new.
        """
        out = np.zeros(len(hashes), dtype=bool)
        if self.mode == "exact":
            s = self.exact
            for j, h in enumerate(hashes.tolist()):
                if h not in s:
                    s.add(h)
                    out[j] = True
        else:
            cf = self.cuckoo
            for j, h in enumerate(hashes.tolist()):
                if not cf.contains(h):
                    cf.add(h)
                    out[j] = True
        return out

    def bulk_add(self, hashes: np.ndarray) -> int:
        mask = self.check_and_add(hashes)
        return int(mask.sum())

    def size(self) -> int:
        return len(self.exact) if self.mode == "exact" else self.cuckoo.count + len(self.cuckoo.spill)

    def dump(self) -> np.ndarray:
        """Exact contents (checkpointing); cuckoo mode keeps a side exact set
        only when created with mode='exact' — cuckoo checkpoints are rebuilt
        from the crawl-log instead."""
        if self.mode != "exact":
            raise NotImplementedError("dump() only for exact shards")
        return np.fromiter(self.exact, dtype=np.uint64, count=len(self.exact))


# num_cpus=0: shard actors are tiny index holders that must never reserve
# CPUs away from map tasks (a full-reservation pool deadlocks small nodes)
SeenShardActor = ray.remote(num_cpus=0)(_ShardCore)


class ShardedSeenSet:
    """K-sharded seen set; local (in-process) or actor-backed.

    ``use_actors=False`` keeps shards in the driver process — used by tests
    and small runs; the API is identical so the pipeline code doesn't care.
    """

    def __init__(self, n_shards: int = 16, mode: str = "exact", use_actors: bool = False,
                 log2_buckets: int = 16):
        self.n = n_shards
        self.use_actors = use_actors
        if use_actors:
            self.shards = [
                SeenShardActor.remote(mode=mode, log2_buckets=log2_buckets)
                for _ in range(n_shards)
            ]
        else:
            self.shards = [_ShardCore(mode=mode, log2_buckets=log2_buckets) for _ in range(n_shards)]

    def check_and_add(self, hashes: np.ndarray) -> np.ndarray:
        """Vector check-and-add across shards; preserves input order."""
        hashes = np.asarray(hashes, dtype=np.uint64)
        shard_of = (hashes % np.uint64(self.n)).astype(np.int64)
        out = np.zeros(len(hashes), dtype=bool)
        if self.use_actors:
            futures, idxs = [], []
            for s in range(self.n):
                idx = np.nonzero(shard_of == s)[0]
                if len(idx):
                    futures.append(self.shards[s].check_and_add.remote(hashes[idx]))
                    idxs.append(idx)
            for idx, mask in zip(idxs, ray.get(futures)):
                out[idx] = mask
        else:
            for s in range(self.n):
                idx = np.nonzero(shard_of == s)[0]
                if len(idx):
                    out[idx] = self.shards[s].check_and_add(hashes[idx])
        return out

    def size(self) -> int:
        if self.use_actors:
            return sum(ray.get([s.size.remote() for s in self.shards]))
        return sum(s.size() for s in self.shards)

    def dump(self) -> np.ndarray:
        if self.use_actors:
            parts = ray.get([s.dump.remote() for s in self.shards])
        else:
            parts = [s.dump() for s in self.shards]
        return np.concatenate(parts) if parts else np.empty(0, dtype=np.uint64)
