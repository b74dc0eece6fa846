"""Similarity search over an embedding column (list<float>).

- ``brute_force_topk``: exact cosine top-k. The query matrix is broadcast
  once (ray.put) and every batch does one numpy matmul against it; per-batch
  partial top-k rows flow into a tiny final top-k combine — the all-data
  shuffle is avoided entirely (nothing moves but k rows per query per batch).
- ``lsh_topk``: the scale path — random-hyperplane bucketing with multi-probe
  (flip one bit): candidates only from matching buckets, exact re-rank.
  Approximate; recall measured against brute force in tests.

Deterministic tie-break everywhere: (-score, id).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray


def _as_matrix(col) -> np.ndarray:
    return np.asarray(col.to_pylist(), dtype=np.float64)


class BruteForceScorer:
    """map_batches stage: emits per-batch partial top-k (query_id, id, score)."""

    def __init__(self, queries_ref, k: int, id_col: str, vec_col: str):
        # broadcast read: ray.put once on the driver, get once per worker
        q = ray.get(queries_ref) if isinstance(queries_ref, ray.ObjectRef) else queries_ref
        self.qids = q["ids"]
        self.qmat = q["mat"]  # (Q, d), already L2-normalized
        self.k = k
        self.id_col = id_col
        self.vec_col = vec_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column(self.id_col).to_numpy(zero_copy_only=False)
        m = _as_matrix(batch.column(self.vec_col))
        norms = np.linalg.norm(m, axis=1).clip(min=1e-12)
        sims = (m / norms[:, None]) @ self.qmat.T  # (n, Q)
        k = min(self.k, len(ids))
        out_q, out_id, out_s = [], [], []
        for j, qid in enumerate(self.qids):
            col = sims[:, j]
            # partial top-k with deterministic (-score, id) order
            idx = np.lexsort((ids, -col))[:k]
            out_q.append(np.full(k, qid))
            out_id.append(ids[idx])
            out_s.append(col[idx])
        return pa.Table.from_arrays(
            [
                pa.array(np.concatenate(out_q)),
                pa.array(np.concatenate(out_id)),
                pa.array(np.concatenate(out_s)),
            ],
            names=["query_id", "id", "score"],
        )


def brute_force_topk(
    ds,
    query_ids: np.ndarray,
    query_mat: np.ndarray,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> pd.DataFrame:
    """Exact cosine top-k of every query vs the dataset.

    Returns (query_id, id, score, rank) with rank 1..k per query.
    """
    qnorm = query_mat / np.linalg.norm(query_mat, axis=1, keepdims=True).clip(min=1e-12)
    ref = ray.put({"ids": np.asarray(query_ids), "mat": qnorm})
    partials = ds.map_batches(
        BruteForceScorer(ref, k, id_col, vec_col),
        batch_format="pyarrow",
        batch_size=8192,
    ).to_pandas()
    out = []
    for qid, g in partials.groupby("query_id"):
        g = g.sort_values(["score", "id"], ascending=[False, True]).head(k)
        g = g.assign(rank=np.arange(1, len(g) + 1))
        out.append(g)
    return pd.concat(out).reset_index(drop=True)


def lsh_topk(
    ds,
    query_ids: np.ndarray,
    query_mat: np.ndarray,
    k: int = 10,
    n_planes: int = 8,
    n_tables: int = 8,
    seed: int = 13,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> pd.DataFrame:
    """Approximate top-k: multi-table hyperplane LSH + exact re-rank.

    L independent tables of b hyperplane bits each; candidates = union over
    tables of (exact bucket + 1-bit-flip probes). One pass over the data
    computes all table keys; the per-(table,key) groupby is the only
    shuffle. Recall grows with L at linear candidate cost — the standard
    cosine-LSH trade (Indyk-Motwani / Charikar)."""
    d = query_mat.shape[1]
    planes = np.random.RandomState(seed).standard_normal((n_tables, d, n_planes))

    def keys_of(m: np.ndarray) -> np.ndarray:
        """(n, L) uint64 bucket keys."""
        out = np.empty((m.shape[0], n_tables), dtype=np.uint64)
        for t in range(n_tables):
            signs = (m @ planes[t]) > 0
            out[:, t] = (
                signs.astype(np.uint64) << np.arange(n_planes, dtype=np.uint64)
            ).sum(axis=1)
        return out

    def stage(batch: pa.Table) -> pa.Table:
        m = _as_matrix(batch.column(vec_col))
        keys = keys_of(m)
        n = len(m)
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        return pa.Table.from_arrays(
            [
                pa.array(np.repeat(ids, n_tables)),
                pa.array(np.tile(np.arange(n_tables, dtype=np.int32), n)),
                pa.array(keys.reshape(-1), type=pa.uint64()),
            ],
            names=[id_col, "table", "bucket"],
        )

    # one pass for keys; vectors fetched once for the union candidate set
    keyed = ds.map_batches(stage, batch_format="pyarrow", batch_size=8192).to_pandas()
    vecs = ds.map_batches(
        lambda b: b.select([id_col, vec_col]), batch_format="pyarrow"
    ).to_pandas().set_index(id_col)[vec_col]

    qn = query_mat / np.linalg.norm(query_mat, axis=1, keepdims=True).clip(min=1e-12)
    qkeys = keys_of(qn)
    by_bucket = keyed.groupby(["table", "bucket"])[id_col].apply(list)

    out = []
    for qi, qid in enumerate(query_ids):
        cand_ids: set = set()
        for t in range(n_tables):
            qb = int(qkeys[qi, t])
            for p in [qb] + [qb ^ (1 << b) for b in range(n_planes)]:
                if (t, p) in by_bucket.index:
                    cand_ids.update(by_bucket.loc[(t, p)])
        if not cand_ids:
            continue
        cids = np.array(sorted(cand_ids))
        m = np.asarray(vecs.loc[cids].tolist(), dtype=np.float64)
        norms = np.linalg.norm(m, axis=1).clip(min=1e-12)
        score = (m / norms[:, None]) @ qn[qi]
        g = pd.DataFrame({"query_id": qid, "id": cids, "score": score})
        g = g.sort_values(["score", "id"], ascending=[False, True]).head(k)
        g = g.assign(rank=np.arange(1, len(g) + 1))
        out.append(g)
    return pd.concat(out).reset_index(drop=True) if out else pd.DataFrame(
        columns=["query_id", "id", "score", "rank"]
    )


def ivf_topk(
    ds,
    query_ids: np.ndarray,
    query_mat: np.ndarray,
    k: int = 10,
    n_centroids: int = 16,
    n_probe: int = 8,
    seed: int = 17,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> pd.DataFrame:
    """IVF-flat approximate top-k: coarse quantizer = seeded random unit
    directions (no training pass needed, deterministic); vectors are
    assigned to their nearest centroid in one broadcast map pass; queries
    probe the ``n_probe`` nearest centroids and exact-rerank those lists.

    The scale path: the assignment map is the only full pass; per-query
    work touches ~n * n_probe / n_centroids rows.
    """
    d = query_mat.shape[1]
    rng = np.random.RandomState(seed)
    cents = rng.standard_normal((n_centroids, d))
    cents /= np.linalg.norm(cents, axis=1, keepdims=True)

    def assign(batch: pa.Table) -> pa.Table:
        m = _as_matrix(batch.column(vec_col))
        mn = m / np.linalg.norm(m, axis=1, keepdims=True).clip(min=1e-12)
        cid = (mn @ cents.T).argmax(axis=1).astype(np.int32)
        return pa.Table.from_arrays(
            [batch.column(id_col), pa.array(cid), batch.column(vec_col)],
            names=[id_col, "centroid", vec_col],
        )

    df = ds.map_batches(assign, batch_format="pyarrow", batch_size=8192).to_pandas()
    by_cent = {c: g for c, g in df.groupby("centroid")}
    qn = query_mat / np.linalg.norm(query_mat, axis=1, keepdims=True).clip(min=1e-12)
    qprobe = np.argsort(-(qn @ cents.T), axis=1)[:, :n_probe]

    out = []
    for qi, qid in enumerate(query_ids):
        cands = [by_cent[c] for c in qprobe[qi] if c in by_cent]
        if not cands:
            continue
        cand = pd.concat(cands)
        m = np.asarray(cand[vec_col].tolist(), dtype=np.float64)
        norms = np.linalg.norm(m, axis=1).clip(min=1e-12)
        score = (m / norms[:, None]) @ qn[qi]
        g = pd.DataFrame({"query_id": qid, "id": cand[id_col].to_numpy(), "score": score})
        g = g.sort_values(["score", "id"], ascending=[False, True]).head(k)
        g = g.assign(rank=np.arange(1, len(g) + 1))
        out.append(g)
    return pd.concat(out).reset_index(drop=True) if out else pd.DataFrame(
        columns=["query_id", "id", "score", "rank"]
    )


def recall_at_k(approx: pd.DataFrame, exact: pd.DataFrame, k: int) -> float:
    """Fraction of exact top-k retrieved by the approximate search."""
    hits, total = 0, 0
    for qid, g in exact.groupby("query_id"):
        want = set(g.head(k)["id"])
        got = set(approx[approx["query_id"] == qid].head(k)["id"])
        hits += len(want & got)
        total += len(want)
    return hits / total if total else 0.0
