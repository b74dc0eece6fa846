"""Similarity search over an embedding column (list<float>).

- ``brute_force_topk``: exact cosine top-k. The query matrix is broadcast
  once (ray.put) and every batch does one numpy matmul against it; per-batch
  partial top-k rows flow into a tiny final top-k combine — the all-data
  shuffle is avoided entirely (nothing moves but k rows per query per batch).
- ``lsh_topk`` / ``ivf_topk``: the approximate paths — random-hyperplane
  bucketing with multi-probe (flip one bit) / coarse centroid probing.
  Both follow the same broadcast + per-batch-partial-top-k shape as brute
  force: candidate matching, exact scoring, and partial top-k run inside
  one map pass, so vectors never leave the workers and nothing shuffles.
  Recall measured against brute force in tests.

Deterministic tie-break everywhere: (-score, id).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa

import ray


def _as_matrix(col) -> np.ndarray:
    return np.asarray(col.to_pylist(), dtype=np.float64)


# Quantization scale for the SQL-checkable integer-plane mode: multiplying a
# float by 2^20 is an exact exponent shift, and floor() agrees bit-for-bit
# between numpy and DuckDB, so sign bits / centroid argmax computed over the
# quantized int64 vectors are reproducible outside numpy (no RandomState).
QUANT_SCALE = float(1 << 20)


def _quantize(m: np.ndarray) -> np.ndarray:
    return np.floor(m * QUANT_SCALE).astype(np.int64)


def _md5_w(key: str, mod: int) -> int:
    """Signed pseudo-random weight in [-(mod//2), mod//2] from the
    little-endian first 8 bytes of md5(key) — the exact value DuckDB's
    ``md5_number_upper(key) % mod`` reproduces (same trick as
    ``dedup.md5_hash64``)."""
    h = int.from_bytes(hashlib.md5(key.encode("utf-8")).digest()[:8], "little")
    return (h % mod) - mod // 2


def oracle_planes(n_tables: int, dim: int, n_planes: int) -> np.ndarray:
    """Deterministic integer hyperplanes (L, dim, b): md5-derived uniform
    weights, pseudo-random enough for real LSH recall yet regenerable
    bit-for-bit by a DuckDB oracle (``md5_number_upper('pl:t:j:b')``).
    One-time setup cost: L*dim*b tiny hashes on the driver."""
    out = np.empty((n_tables, dim, n_planes), dtype=np.int64)
    for t in range(n_tables):
        for j in range(dim):
            for b in range(n_planes):
                out[t, j, b] = _md5_w(f"pl:{t}:{j}:{b}", 2000001)
    return out


def oracle_centroids(n_centroids: int, dim: int) -> np.ndarray:
    """Deterministic integer coarse-quantizer directions (C, dim),
    md5-derived (``md5_number_upper('ct:c:j')`` in the oracle)."""
    out = np.empty((n_centroids, dim), dtype=np.int64)
    for c in range(n_centroids):
        for j in range(dim):
            out[c, j] = _md5_w(f"ct:{c}:{j}", 2001)
    return out


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
    return _final_topk(partials, k)


def _final_topk(partials: pd.DataFrame, k: int) -> pd.DataFrame:
    """Combine per-batch partial top-k rows into the global top-k per query
    (deterministic (-score, id) order, rank 1..k)."""
    if partials.empty:
        return pd.DataFrame(columns=["query_id", "id", "score", "rank"])
    out = []
    for _qid, g in partials.groupby("query_id"):
        g = g.sort_values(["score", "id"], ascending=[False, True]).head(k)
        out.append(g.assign(rank=np.arange(1, len(g) + 1)))
    return pd.concat(out).reset_index(drop=True)


class LshScorer:
    """map_batches stage for multi-table hyperplane LSH: per batch, compute
    every row's table keys, match rows whose key hits a query's probe set
    (exact bucket + 1-bit flips), exact-score the matches, emit per-batch
    partial top-k. Vectors never leave the worker — only k rows per query
    per batch move (same shape as BruteForceScorer)."""

    def __init__(self, ref, k: int, id_col: str, vec_col: str):
        d = ray.get(ref) if isinstance(ref, ray.ObjectRef) else ref
        self.planes = d["planes"]        # (L, dim, b)
        self.qids = d["qids"]
        self.qn = d["qn"]                # (Q, dim) L2-normalized
        self.probes = d["probes"]        # (Q, L, b+1) uint64 probe keys
        self.k = k
        self.id_col = id_col
        self.vec_col = vec_col

    def keys_of(self, m: np.ndarray) -> np.ndarray:
        n_tables = self.planes.shape[0]
        n_planes = self.planes.shape[2]
        if self.planes.dtype.kind in "iu":
            # exact-integer mode: quantized rows x integer planes (sign of
            # the dot is scale-invariant, so raw unnormalized rows are fine)
            m = _quantize(m)
        out = np.empty((m.shape[0], n_tables), dtype=np.uint64)
        for t in range(n_tables):
            signs = (m @ self.planes[t]) > 0
            out[:, t] = (
                signs.astype(np.uint64) << np.arange(n_planes, dtype=np.uint64)
            ).sum(axis=1)
        return out

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column(self.id_col).to_numpy(zero_copy_only=False)
        m = _as_matrix(batch.column(self.vec_col))
        keys = self.keys_of(m)  # (n, L)
        norms = np.linalg.norm(m, axis=1).clip(min=1e-12)
        mn = m / norms[:, None]
        n_tables = keys.shape[1]
        out_q, out_id, out_s = [], [], []
        for qi, qid in enumerate(self.qids):
            match = np.zeros(len(ids), dtype=bool)
            for t in range(n_tables):
                match |= np.isin(keys[:, t], self.probes[qi, t])
            if not match.any():
                continue
            sub_ids = ids[match]
            scores = mn[match] @ self.qn[qi]
            kk = min(self.k, len(sub_ids))
            idx = np.lexsort((sub_ids, -scores))[:kk]
            out_q.append(np.full(kk, qid))
            out_id.append(sub_ids[idx])
            out_s.append(scores[idx])
        if not out_q:
            return pa.Table.from_arrays(
                [pa.array(np.empty(0, dtype=np.asarray(self.qids).dtype)),
                 pa.array(np.empty(0, dtype=ids.dtype)),
                 pa.array(np.empty(0, dtype=np.float64))],
                names=["query_id", "id", "score"],
            )
        return pa.Table.from_arrays(
            [
                pa.array(np.concatenate(out_q)),
                pa.array(np.concatenate(out_id)),
                pa.array(np.concatenate(out_s)),
            ],
            names=["query_id", "id", "score"],
        )


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
    planes: np.ndarray | None = None,
) -> pd.DataFrame:
    """Approximate top-k: multi-table hyperplane LSH, fully distributed.

    L independent tables of b hyperplane bits each; a row is a candidate
    for a query when its key in any table lands in that query's probe set
    (exact bucket + 1-bit flips). Plane matrix and probe sets are broadcast
    once (ray.put); candidate matching, exact scoring, and partial top-k
    all happen inside one map pass — no shuffle, no vector ever reaches
    the driver. Recall grows with L at linear candidate cost (the standard
    cosine-LSH trade, Indyk-Motwani / Charikar).

    ``planes``: explicit (L, dim, b) plane tensor. An integer dtype selects
    the exact-quantized key path (``oracle_planes`` + floor(x*2^20) int64
    dots) whose every bit a DuckDB oracle can recompute."""
    d = query_mat.shape[1]
    if planes is None:
        planes = np.random.RandomState(seed).standard_normal((n_tables, d, n_planes))
    n_tables, n_planes = planes.shape[0], planes.shape[2]
    qn = query_mat / np.linalg.norm(query_mat, axis=1, keepdims=True).clip(min=1e-12)
    # query probe keys: exact bucket + every 1-bit flip, per table
    # (sign of the dot is scale-invariant: normalized and raw rows agree)
    qkmat = _quantize(query_mat) if planes.dtype.kind in "iu" else qn
    qkeys = np.empty((len(query_ids), n_tables), dtype=np.uint64)
    for t in range(n_tables):
        signs = (qkmat @ planes[t]) > 0
        qkeys[:, t] = (
            signs.astype(np.uint64) << np.arange(n_planes, dtype=np.uint64)
        ).sum(axis=1)
    flips = np.uint64(1) << np.arange(n_planes, dtype=np.uint64)
    probes = np.empty((len(query_ids), n_tables, n_planes + 1), dtype=np.uint64)
    probes[:, :, 0] = qkeys
    probes[:, :, 1:] = qkeys[:, :, None] ^ flips[None, None, :]

    ref = ray.put({"planes": planes, "qids": np.asarray(query_ids),
                   "qn": qn, "probes": probes})
    partials = ds.map_batches(
        LshScorer(ref, k, id_col, vec_col),
        batch_format="pyarrow",
        batch_size=8192,
    ).to_pandas()
    return _final_topk(partials, k)


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
    cents: np.ndarray | None = None,
) -> pd.DataFrame:
    """IVF-flat approximate top-k: coarse quantizer = seeded random unit
    directions (no training pass needed, deterministic); each batch assigns
    its rows to centroids and exact-scores only the rows whose centroid a
    query probes — one broadcast map pass, partial top-k per batch, no
    shuffle, no vector off-worker. Per-query work touches
    ~n * n_probe / n_centroids rows.

    ``cents``: explicit (C, dim) centroid matrix. Integer dtype selects the
    exact-quantized assignment path (``oracle_centroids`` + floor(x*2^20)
    int64 dots, argmax ties to the lowest centroid id) that a DuckDB oracle
    recomputes bit-exactly; scoring stays exact double cosine either way.
    """
    d = query_mat.shape[1]
    if cents is None:
        rng = np.random.RandomState(seed)
        cents = rng.standard_normal((n_centroids, d))
        cents /= np.linalg.norm(cents, axis=1, keepdims=True)
    quantized = cents.dtype.kind in "iu"
    qn = query_mat / np.linalg.norm(query_mat, axis=1, keepdims=True).clip(min=1e-12)
    qdots = (_quantize(query_mat) if quantized else qn) @ cents.T
    # probe the n_probe best centroids; ties broken by lowest centroid id
    # (lexsort secondary key) so the integer mode is order-deterministic
    qprobe = np.empty((len(query_ids), n_probe), dtype=np.int64)
    for qi in range(len(query_ids)):
        order = np.lexsort((np.arange(cents.shape[0]), -qdots[qi]))
        qprobe[qi] = order[:n_probe]

    ref = ray.put({"cents": cents, "qids": np.asarray(query_ids),
                   "qn": qn, "qprobe": qprobe})

    class IvfScorer:
        """Per batch: assign rows to centroids, score each query against
        rows of its probed centroids only, emit partial top-k. One map
        pass; vectors stay on workers."""

        def __init__(self):
            st = ray.get(ref)
            self.cents = st["cents"]
            self.qids = st["qids"]
            self.qn = st["qn"]
            self.qprobe = st["qprobe"]

        def __call__(self, batch: pa.Table) -> pa.Table:
            ids = batch.column(id_col).to_numpy(zero_copy_only=False)
            m = _as_matrix(batch.column(vec_col))
            mn = m / np.linalg.norm(m, axis=1, keepdims=True).clip(min=1e-12)
            am = _quantize(m) if self.cents.dtype.kind in "iu" else mn
            # np.argmax keeps the first (lowest-id) centroid on exact ties —
            # matches the oracle's ORDER BY dot DESC, centroid ASC
            cid = (am @ self.cents.T).argmax(axis=1).astype(np.int32)
            out_q, out_id, out_s = [], [], []
            for qi, qid in enumerate(self.qids):
                match = np.isin(cid, self.qprobe[qi])
                if not match.any():
                    continue
                sub_ids = ids[match]
                scores = mn[match] @ self.qn[qi]
                kk = min(k, len(sub_ids))
                idx = np.lexsort((sub_ids, -scores))[:kk]
                out_q.append(np.full(kk, qid))
                out_id.append(sub_ids[idx])
                out_s.append(scores[idx])
            if not out_q:
                return pa.Table.from_arrays(
                    [pa.array(np.empty(0, dtype=self.qids.dtype)),
                     pa.array(np.empty(0, dtype=ids.dtype)),
                     pa.array(np.empty(0, dtype=np.float64))],
                    names=["query_id", "id", "score"],
                )
            return pa.Table.from_arrays(
                [pa.array(np.concatenate(out_q)),
                 pa.array(np.concatenate(out_id)),
                 pa.array(np.concatenate(out_s))],
                names=["query_id", "id", "score"],
            )

    partials = ds.map_batches(
        IvfScorer(), batch_format="pyarrow", batch_size=8192
    ).to_pandas()
    return _final_topk(partials, k)


def recall_at_k(approx: pd.DataFrame, exact: pd.DataFrame, k: int) -> float:
    """Fraction of exact top-k retrieved by the approximate search."""
    hits, total = 0, 0
    for qid, g in exact.groupby("query_id"):
        want = set(g.head(k)["id"])
        got = set(approx[approx["query_id"] == qid].head(k)["id"])
        hits += len(want & got)
        total += len(want)
    return hits / total if total else 0.0


# ---------------------------------------------------------------------------
# Embedding moments (mergeable exact-integer partials) + PCA projection
# ---------------------------------------------------------------------------
def _list_matrix(la) -> np.ndarray:
    """(n, d) float64 matrix from a list<float> column — handles plain
    Arrow ListArray (zero-copy flat values) and Ray's ArrowTensorArray
    extension (from_pandas datasets)."""
    if isinstance(la, pa.ChunkedArray):
        la = la.combine_chunks()
    if hasattr(la, "flatten"):
        # flatten() is offset-aware; .values on a SLICED ListArray returns
        # the full child buffer ignoring the slice → misaligned matrix
        return (la.flatten().to_numpy(zero_copy_only=False)
                .reshape(len(la), -1).astype(np.float64))
    if hasattr(la, "values"):
        return (la.values.to_numpy(zero_copy_only=False)
                .reshape(len(la), -1).astype(np.float64))
    return np.asarray(la.to_numpy(zero_copy_only=False)).reshape(
        len(la), -1).astype(np.float64)


def embedding_moments(ds, col: str = "embedding"):
    """First and second moments of the embedding matrix as EXACT integer
    sums over the 2^20-quantized vectors — the mergeable-partial pattern
    (cf. the HLL registers / KMV sketch): every batch emits one
    (n, sum-vector, Gram-matrix) row, merged by plain addition in any
    order, so the result is independent of block layout and bit-exactly
    reproducible in SQL.

    Output tidy rows (i, j, v): (i, j>=0) -> Gram_ij; (i, -1) -> sum_i;
    (-1, -1) -> row count. int64 is safe while n * 2^40 < 2^63, i.e. up to
    ~8e6 rows per reduce; shard the reduce by range above that (documented
    scale path)."""
    def partial(t: pa.Table) -> pa.Table:
        X = _list_matrix(t.column(col))
        q = _quantize(X)
        g = q.T @ q  # exact: int64 matmul
        s = q.sum(axis=0)
        d = q.shape[1]
        return pa.table(
            {
                "n": pa.array([len(q)], type=pa.int64()),
                "s": pa.array([s.tolist()], type=pa.list_(pa.int64())),
                "g": pa.array([g.ravel().tolist()], type=pa.list_(pa.int64())),
                "d": pa.array([d], type=pa.int64()),
            }
        )

    n_total = 0
    s_total = None
    g_total = None
    d = 0
    for t in ds.map_batches(partial, batch_format="pyarrow").iter_batches(
        batch_format="pyarrow"
    ):
        for row in range(t.num_rows):
            n_total += int(t.column("n")[row].as_py())
            d = int(t.column("d")[row].as_py())
            s = np.asarray(t.column("s")[row].as_py(), dtype=np.int64)
            g = np.asarray(t.column("g")[row].as_py(), dtype=np.int64)
            s_total = s if s_total is None else s_total + s
            g_total = g if g_total is None else g_total + g
    if n_total == 0 or g_total is None:
        raise ValueError("embedding_moments: empty dataset")
    # int64 safety: |q| <= 2^20 so each Gram cell is <= n * 2^40; past that
    # the numpy accumulation would WRAP silently (the DuckDB side errors
    # loudly on the HUGEINT->BIGINT cast). Shard the reduce by hash range
    # and sum per shard before crossing this bound at real scale.
    if n_total > (1 << 22):
        raise OverflowError(
            "embedding_moments int64 Gram bound exceeded: "
            f"n={n_total} > 2^22; shard the reduce by hash range"
        )
    ii, jj = np.meshgrid(np.arange(d), np.arange(d), indexing="ij")
    return pa.table(
        {
            "i": pa.array(
                np.concatenate([ii.ravel(), np.arange(d), [-1]]).astype(np.int32)
            ),
            "j": pa.array(
                np.concatenate([jj.ravel(), np.full(d, -1), [-1]]).astype(np.int32)
            ),
            "v": pa.array(
                np.concatenate([g_total, s_total, [n_total]]).astype(np.int64)
            ),
        }
    )


def pca_project(ds, k: int = 2, col: str = "embedding", id_col: str = "vec_id"):
    """Project embeddings onto the top-k principal components.

    The covariance comes from :func:`embedding_moments` (one streaming
    pass, mergeable integer partials); the d x d eigendecomposition is
    driver-side (d=64 -- trivial); the projection is a second streaming
    map with the component matrix broadcast in the closure. Deterministic
    sign convention: each component's largest-|coefficient| entry is made
    positive."""
    mom = embedding_moments(ds, col=col)
    iv = mom.column("i").to_numpy(zero_copy_only=False)
    jv = mom.column("j").to_numpy(zero_copy_only=False)
    vv = mom.column("v").to_numpy(zero_copy_only=False)
    n = int(vv[(iv == -1) & (jv == -1)][0])
    d = int(iv.max()) + 1
    s = np.zeros(d)
    s[iv[(jv == -1) & (iv >= 0)]] = vv[(jv == -1) & (iv >= 0)]
    G = np.zeros((d, d))
    m = (iv >= 0) & (jv >= 0)
    G[iv[m], jv[m]] = vv[m]
    mean = s / (n * QUANT_SCALE)
    cov = G / (n * QUANT_SCALE**2) - np.outer(mean, mean)
    w, V = np.linalg.eigh(cov)
    comp = V[:, np.argsort(w)[::-1][:k]]  # d x k, descending variance
    for c in range(k):
        a = comp[:, c]
        if a[np.argmax(np.abs(a))] < 0:
            comp[:, c] = -a
    evr = np.sort(w)[::-1][:k] / max(w.sum(), 1e-300)

    def project(t: pa.Table) -> pa.Table:
        X = _list_matrix(t.column(col))
        P = (X - mean) @ comp
        return pa.table(
            {
                id_col: t.column(id_col),
                "pc": pa.array(P.tolist(), type=pa.list_(pa.float64())),
            }
        )

    return ds.map_batches(project, batch_format="pyarrow"), comp, evr


def label_centroids(ds, col: str = "embedding", label_col: str = "label"):
    """Per-label centroid sums (class prototypes) as EXACT integer
    partials: every batch emits one (label, sum-vector, count) row over
    the 2^20-quantized vectors; partials merge by addition in any order
    (same mergeable contract as :func:`embedding_moments`). The label
    space is the small side (classes, clusters, IVF lists), so the driver
    merge is O(blocks x labels); centroid = s / (n * 2^20) downstream.

    Output tidy rows (label, j, s, n) — one per (label, dimension)."""
    def partial(t: pa.Table) -> pa.Table:
        X = _list_matrix(t.column(col))
        q = _quantize(X)
        lab = t.column(label_col).to_numpy(zero_copy_only=False).astype(np.int64)
        ulab, inv = np.unique(lab, return_inverse=True)
        d = q.shape[1]
        sums = np.zeros((len(ulab), d), dtype=np.int64)
        np.add.at(sums, inv, q)
        counts = np.bincount(inv, minlength=len(ulab)).astype(np.int64)
        return pa.table(
            {
                "label": pa.array(ulab),
                "s": pa.array(sums.tolist(), type=pa.list_(pa.int64())),
                "n": pa.array(counts),
            }
        )

    acc: dict[int, tuple[np.ndarray, int]] = {}
    for t in ds.map_batches(partial, batch_format="pyarrow").iter_batches(
        batch_format="pyarrow"
    ):
        labs = t.column("label").to_numpy(zero_copy_only=False)
        ns = t.column("n").to_numpy(zero_copy_only=False)
        svals = t.column("s").to_pylist()
        for lb, s, n in zip(labs, svals, ns):
            s = np.asarray(s, dtype=np.int64)
            if int(lb) in acc:
                s0, n0 = acc[int(lb)]
                acc[int(lb)] = (s0 + s, n0 + int(n))
            else:
                acc[int(lb)] = (s, int(n))
    labels = sorted(acc)
    rows_l, rows_j, rows_s, rows_n = [], [], [], []
    for lb in labels:
        s, n = acc[lb]
        for j, v in enumerate(s):
            rows_l.append(lb)
            rows_j.append(j)
            rows_s.append(int(v))
            rows_n.append(n)
    return pa.table(
        {
            "label": pa.array(rows_l, type=pa.int64()),
            "j": pa.array(rows_j, type=pa.int32()),
            "s": pa.array(rows_s, type=pa.int64()),
            "n": pa.array(rows_n, type=pa.int64()),
        }
    )
