"""Distributed k-means (Lloyd's) over an embedding column.

Scale shape: the model state (k × d centroid matrix) is tiny, so every
iteration is ONE streaming ``map_batches`` pass with the current
centroids broadcast via ``ray.put`` — vectors never leave their workers,
nothing shuffles, and each batch emits an O(k·d) partial (per-cluster
count + per-dimension sums) that the driver folds by plain addition.
This is the canonical 100 TB layout for iterative ML with a small model:
K passes over the data, O(blocks · k · d) driver traffic total.

Determinism contract (SQL pairing): all arithmetic is exact integer.
Vectors are quantized ``floor(x · 2^20) + 2^21`` (the +2^21 offset makes
every value non-negative — assumes |x| < 2, asserted — so the centroid
update ``sum // count`` is plain truncating division on BOTH sides;
squared distances are offset-invariant). Assignment ties break to the
lowest cluster id (numpy argmin over a cid-ascending matrix == SQL
``row_number() OVER (ORDER BY dist, cid)``). Integer sums are
order-independent, so block layout cannot flip a bit, and DuckDB unrolls
the same ``n_iter`` iterations exactly. Seeds are the vectors of the k
smallest ids — found with per-batch partial bottom-k (no sort shuffle).

int64 safety: |q| < 2^22, so a squared-distance term is < 2^44·d and a
per-cluster per-dim sum is < n·2^22 — guard n < 2^40 (far above any
single-reduce size; shard the fold by hash range past that).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray

QUANT = float(1 << 20)
OFFSET = 1 << 21  # makes quantized values non-negative for |x| < 2


def _qmatrix(la, check: bool = True) -> np.ndarray:
    """(n, d) offset-quantized int64 matrix from a list<float> column."""
    from .similarity import _list_matrix

    X = _list_matrix(la)
    if check and X.size and np.abs(X).max() >= 2.0:
        raise ValueError("kmeans quantization assumes |x| < 2")
    return np.floor(X * QUANT).astype(np.int64) + OFFSET


def seed_centroids(ds, k: int, col: str = "embedding",
                   id_col: str = "vec_id") -> tuple[np.ndarray, np.ndarray]:
    """(cids 0..k-1, k × d quantized matrix) from the k smallest-id
    vectors — per-batch partial bottom-k, driver folds k rows per block."""
    def bottomk(t: pa.Table) -> pa.Table:
        ids = t.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
        q = _qmatrix(t.column(col))
        take = np.argsort(ids, kind="stable")[:k]
        return pa.table(
            {
                "id": pa.array(ids[take]),
                "q": pa.array(q[take].tolist(), type=pa.list_(pa.int64())),
            }
        )

    parts = ds.map_batches(bottomk, batch_format="pyarrow").take_all()
    rows = sorted(parts, key=lambda r: r["id"])[:k]
    if len(rows) < k:
        raise ValueError(f"kmeans: need >= {k} rows, got {len(rows)}")
    C = np.asarray([r["q"] for r in rows], dtype=np.int64)
    return np.arange(k, dtype=np.int64), C


def kmeans(ds, k: int = 8, n_iter: int = 3, col: str = "embedding",
           id_col: str = "vec_id") -> pa.Table:
    """Returns the final exploded centroid table
    (cid: int64, j: int32, c: int64, n: int64) after ``n_iter`` Lloyd
    iterations — c is the offset-quantized integer centroid coordinate,
    n the cluster size from the final assignment. Clusters that lose all
    members are dropped (mirrored by the SQL oracle's inner grouping)."""
    if n_iter < 1:
        raise ValueError("kmeans: n_iter must be >= 1")
    cids, C = seed_centroids(ds, k, col, id_col)

    for _ in range(n_iter):
        ref = ray.put((cids, C))

        def partial(t: pa.Table, _ref=ref) -> pa.Table:
            p_cids, p_C = ray.get(_ref)
            # keep the |x| < 2 range check on in the hot path too: it is
            # one vectorized max() per batch, and out-of-range values
            # would silently break the sum//n floor==truncate contract
            q = _qmatrix(t.column(col))
            # (n, k) squared distances; argmin ties -> first (lowest cid)
            d2 = ((q[:, None, :] - p_C[None, :, :]) ** 2).sum(axis=2)
            a = np.argmin(d2, axis=1)
            out_cid, out_j, out_s = [], [], []
            for i in range(len(p_cids)):
                m = a == i
                nm = int(m.sum())
                if not nm:
                    continue
                s = q[m].sum(axis=0)
                d = q.shape[1]
                out_cid.extend([int(p_cids[i])] * (d + 1))
                out_j.extend(range(d))
                out_j.append(-1)
                out_s.extend(s.tolist())
                out_s.append(nm)
            return pa.table(
                {
                    "cid": pa.array(out_cid, type=pa.int64()),
                    "j": pa.array(out_j, type=pa.int32()),
                    "s": pa.array(out_s, type=pa.int64()),
                }
            )

        sums: dict[tuple[int, int], int] = {}
        n_seen = 0
        for t in ds.map_batches(partial, batch_format="pyarrow").iter_batches(
            batch_format="pyarrow"
        ):
            cc = t.column("cid").to_numpy()
            jj = t.column("j").to_numpy()
            ss = t.column("s").to_numpy()
            for c_, j_, s_ in zip(cc, jj, ss):
                key = (int(c_), int(j_))
                sums[key] = sums.get(key, 0) + int(s_)
                if j_ == -1:
                    n_seen += int(s_)
        if n_seen > (1 << 40):
            raise OverflowError("kmeans int64 sum bound: shard the fold")
        counts = {c_: v for (c_, j_), v in sums.items() if j_ == -1}
        live = np.asarray(sorted(counts), dtype=np.int64)
        d = C.shape[1]
        newC = np.empty((len(live), d), dtype=np.int64)
        for row, c_ in enumerate(live):
            n_ = counts[int(c_)]
            for j_ in range(d):
                newC[row, j_] = sums[(int(c_), j_)] // n_  # non-negative //
        cids, C = live, newC
        last_counts = counts

    d = C.shape[1]
    out_cid = np.repeat(cids, d)
    out_j = np.tile(np.arange(d, dtype=np.int32), len(cids))
    return pa.table(
        {
            "cid": pa.array(out_cid.astype(np.int64)),
            "j": pa.array(out_j),
            "c": pa.array(C.ravel().astype(np.int64)),
            "n": pa.array(
                np.repeat(
                    np.asarray([last_counts[int(c_)] for c_ in cids],
                               dtype=np.int64),
                    d,
                )
            ),
        }
    )
