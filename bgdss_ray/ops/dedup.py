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

from .. import re2pin
from ..urlnorm import url_hash64

_MERSENNE = (1 << 61) - 1
# RE2-pinned \w (ASCII): the minhash/simhash oracles tokenize with DuckDB
# regexp_extract_all(lower(text), '\w+'), and RE2 \w excludes accented
# letters that python's unicode \w includes — see re2pin
_TOKEN_RE = re2pin.WORD_RE


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


_MIX = np.uint64(0xFF51AFD7ED558CCD)  # murmur3 finalizer constant
_GOLD = np.uint64(0x9E3779B97F4A7C15)


def _mix_columns(seed_vec: np.ndarray, cols: np.ndarray) -> np.ndarray:
    """Vectorized 64-bit mix of a (n, r) uint64 matrix into one uint64 per
    row (murmur-style xor-multiply-shift fold) — replaces per-row blake2b."""
    h = seed_vec.copy()
    with np.errstate(over="ignore"):
        for c in range(cols.shape[1]):
            h = (h ^ cols[:, c]) * _MIX
            h ^= h >> np.uint64(33)
    return h


def band_explode(n_bands: int, rows_per_band: int):
    """Stage factory: signature rows → (id, bucket) rows; ``bucket`` is one
    int64 LSH key with the band index mixed in (single shuffle key — a
    cross-band key collision only creates a harmless extra candidate that
    exact verification discards)."""

    def fn(batch: pa.Table) -> pa.Table:
        id_name = batch.schema.names[0]
        ids = batch.column(id_name)
        sigs = np.asarray(batch.column("sig").to_pylist(), dtype=np.uint64)
        n = len(sigs)
        out_hash = np.empty((n_bands, n), dtype=np.uint64)
        for b in range(n_bands):
            seg = sigs[:, b * rows_per_band : (b + 1) * rows_per_band]
            seed = np.full(n, np.uint64(b + 1), dtype=np.uint64)
            with np.errstate(over="ignore"):
                seed *= _GOLD
            out_hash[b] = _mix_columns(seed, seg)
        id_tiled = pa.concat_arrays(
            [ids.combine_chunks() if isinstance(ids, pa.ChunkedArray) else ids]
            * n_bands
        )
        return pa.Table.from_arrays(
            [id_tiled, pa.array(out_hash.reshape(-1).view(np.int64))],
            names=[id_name, "bucket"],
        )

    return fn


# cap beyond which a bucket pairs members against its min-id representative
# instead of all-pairs (O(n) pairs still connects the cluster — a hot bucket
# IS one near-identical cluster; never silently dropped)
HOT_BUCKET_CAP = 200


def _pairs_in_group(g: pd.DataFrame, id_name: str, cap: int = HOT_BUCKET_CAP
                    ) -> pd.DataFrame:
    """Candidate id pairs within one LSH bucket (runs inside map_groups)."""
    ids = np.sort(g[id_name].to_numpy())
    if len(ids) < 2:
        return pd.DataFrame({"id_a": [], "id_b": []})
    if len(ids) > cap:
        # star pairing against the min-id representative: linear pair count,
        # connected components still merge the whole cluster
        return pd.DataFrame({"id_a": np.repeat(ids[0], len(ids) - 1),
                             "id_b": ids[1:]})
    ia, ib = np.triu_indices(len(ids), k=1)
    return pd.DataFrame({"id_a": ids[ia], "id_b": ids[ib]})


def hot_bucket_keys(banded, bucket_col: str = "bucket") -> np.ndarray:
    """Distributed hot-bucket detection: Count aggregate over the slim
    bucket column, filter |bucket| > 1 INSIDE the dataset — only the hot
    keys (O(duplicate clusters), not O(corpus)) reach the driver."""
    from ray.data.aggregate import Count

    counts = (
        banded.select_columns([bucket_col])
        .groupby(bucket_col)
        .aggregate(Count(alias_name="n"))
    )
    hot = counts.map_batches(
        lambda t: t.filter(pa.compute.greater(t.column("n"), 1)).select(
            [bucket_col]
        ),
        batch_format="pyarrow",
    )
    parts = [
        b.column(bucket_col).to_numpy(zero_copy_only=False)
        for b in hot.iter_batches(batch_size=None, batch_format="pyarrow")
    ]
    return np.concatenate(parts) if parts else np.empty(0, dtype=np.int64)


def bucket_pairs_ds(banded, hot_keys: np.ndarray, id_col: str, pair_fn=None):
    """Semi-join banded rows against the broadcast hot-key set, then pair
    members inside ``groupby(bucket).map_groups`` — pair generation happens
    on workers. Returns the pair DATASET (may contain cross-band duplicate
    pairs; downstream groupby/drop_duplicates collapses them)."""
    import ray

    ref = ray.put(np.sort(hot_keys))
    fn = pair_fn or (lambda g: _pairs_in_group(g, id_col))

    def pick(t: pa.Table) -> pa.Table:
        keys = ray.get(ref)
        b = t.column("bucket").to_numpy(zero_copy_only=False)
        pos = np.searchsorted(keys, b)
        pos[pos == len(keys)] = 0
        return t.filter(pa.array(keys[pos] == b))

    return (
        banded.map_batches(pick, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(fn, batch_format="pandas")
    )


def bucket_pairs_distributed(banded, hot_keys: np.ndarray, id_col: str,
                             pair_fn=None) -> pd.DataFrame:
    """Collected variant of :func:`bucket_pairs_ds` — only pairs
    (O(near-dups) when ``pair_fn`` verifies in-group) reach the driver."""
    pairs = bucket_pairs_ds(banded, hot_keys, id_col, pair_fn).to_pandas()
    if pairs.empty:
        return pd.DataFrame({c: [] for c in pairs.columns})
    return pairs.drop_duplicates(["id_a", "id_b"]).reset_index(drop=True)


def minhash_lsh_candidates_ds(ds, n_perm=128, n_bands=16, seed=7, shingle_k=3):
    """(id, text) dataset → candidate pair DATASET, or None when no bucket
    has two members.

    Fully distributed: signatures + banding are one map pass; hot buckets
    come from a Count aggregate filtered dataset-side; members are
    semi-joined against the broadcast hot-key set and paired inside
    ``groupby(bucket).map_groups``. Nothing O(corpus) touches the driver.
    Cross-band duplicate pairs are NOT deduped here — the distributed
    verify (or a caller-side drop_duplicates) collapses them.
    """
    rows_per_band = n_perm // n_bands
    id_col = ds.schema().names[0]
    banded = (
        ds.map_batches(
            MinHasher(n_perm, seed, shingle_k),
            batch_format="pyarrow", batch_size=1024,
        )
        .map_batches(band_explode(n_bands, rows_per_band), batch_format="pyarrow")
        .materialize()  # reused by the counts + member passes
    )
    hot = hot_bucket_keys(banded)
    if not hot.size:
        return None
    return bucket_pairs_ds(banded, hot, id_col)


def minhash_lsh_candidates(ds, n_perm=128, n_bands=16, seed=7, shingle_k=3):
    """Collected variant: unique candidate pair DataFrame (O(near-dups))."""
    pairs_ds = minhash_lsh_candidates_ds(ds, n_perm, n_bands, seed, shingle_k)
    if pairs_ds is None:
        return pd.DataFrame({"id_a": [], "id_b": []})
    pairs = pairs_ds.to_pandas()
    if pairs.empty:
        return pd.DataFrame({"id_a": [], "id_b": []})
    return pairs.drop_duplicates(["id_a", "id_b"]).reset_index(drop=True)


class ShingleExploder:
    """map_batches stage: (id, text) → one (id, bucket) row per distinct
    word-k-gram shingle, bucket = the shingle's 64-bit hash. The exploded
    volume is O(total distinct shingles) of two slim columns; at cluster
    scale cap it by hash-sampling shingles (keep bucket % S == 0) — the
    candidate generator stays unbiased because a shared shingle is sampled
    identically for every document containing it."""

    def __init__(self, shingle_k: int = 3, sample_mod: int = 1):
        self.k = shingle_k
        self.sample_mod = sample_mod

    def __call__(self, batch: pa.Table) -> pa.Table:
        id_name = batch.schema.names[0]
        ids = batch.column(id_name).to_pylist()
        texts = batch.column("text").to_pylist()
        out_ids, out_buckets = [], []
        for i, t in zip(ids, texts):
            sh = shingle_hashes(t, self.k)
            if self.sample_mod > 1:
                sh = sh[sh % np.uint64(self.sample_mod) == 0]
            out_ids.extend([i] * len(sh))
            out_buckets.append(sh)
        buckets = (
            np.concatenate(out_buckets) if out_buckets else np.empty(0, np.uint64)
        )
        return pa.Table.from_arrays(
            [pa.array(out_ids), pa.array(buckets.view(np.int64))],
            names=[id_name, "bucket"],
        )


# posting-row budget for the n-gram inverted index: above this estimated
# volume, shingles are hash-sampled (unbiased — a shared shingle samples
# identically in every doc). ~50M rows of two slim columns ≈ 800 MB.
NGRAM_TARGET_POSTINGS = 50_000_000


def derive_sample_mod(ds, shingle_k: int, id_col: str,
                      target: int = NGRAM_TARGET_POSTINGS) -> int:
    """Estimate total posting rows (n_docs × avg distinct shingles from a
    small sample) and pick the smallest power-of-two hash-sampling modulus
    that bounds the exploded volume under ``target``. Returns 1 (exact)
    for small corpora."""
    n_docs = ds.count()
    if n_docs == 0:
        return 1
    sample = ds.limit(64).to_pandas()
    avg = float(
        np.mean([len(shingle_hashes(t, shingle_k)) for t in sample["text"]])
    ) if len(sample) else 0.0
    est = n_docs * max(avg, 1.0)
    mod = 1
    while est / mod > target:
        mod *= 2
    if mod > 1:
        print(
            f"[ngram_inverted_candidates] estimated {est:.3g} posting rows "
            f"> target {target:.3g}: hash-sampling shingles at 1/{mod} "
            "(unbiased; recall drops for pairs sharing < "
            f"{mod} shingles)",
            flush=True,
        )
    return mod


def ngram_inverted_candidates_ds(ds, shingle_k: int = 3, max_df: int = 5,
                                 sample_mod: int | None = None):
    """Candidate pairs from a RARE-shingle inverted index (no minhash
    approximation): explode (id, shingle) postings, keep shingles shared
    by 2..max_df documents (df==1 is useless, df>max_df is a stopword-ish
    common shingle), pair documents inside each rare posting list via
    ``groupby(bucket).map_groups``. Same distributed shape as the LSH
    bucket machinery — only pairs reach the driver.

    ``sample_mod=None`` (default) derives an unbiased shingle-sampling
    modulus from the corpus size so the posting explode stays bounded
    (exact, mod 1, for small corpora); pass 1 to force exactness."""
    from ray.data.aggregate import Count

    id_col = ds.schema().names[0]
    if sample_mod is None:
        sample_mod = derive_sample_mod(ds, shingle_k, id_col)
    banded = ds.map_batches(
        ShingleExploder(shingle_k, sample_mod),
        batch_format="pyarrow", batch_size=1024,
    ).materialize()
    counts = (
        banded.select_columns(["bucket"])
        .groupby("bucket")
        .aggregate(Count(alias_name="n"))
    )
    rare = counts.map_batches(
        lambda t: t.filter(
            pa.compute.and_(
                pa.compute.greater(t.column("n"), 1),
                pa.compute.less_equal(t.column("n"), max_df),
            )
        ).select(["bucket"]),
        batch_format="pyarrow",
    )
    parts = [
        b.column("bucket").to_numpy(zero_copy_only=False)
        for b in rare.iter_batches(batch_size=None, batch_format="pyarrow")
    ]
    keys = np.concatenate(parts) if parts else np.empty(0, dtype=np.int64)
    if not keys.size:
        return None
    return bucket_pairs_ds(banded, keys, id_col)


def ngram_inverted_candidates(ds, shingle_k: int = 3, max_df: int = 5,
                              sample_mod: int | None = None) -> pd.DataFrame:
    """Collected variant of :func:`ngram_inverted_candidates_ds`: unique
    candidate pair DataFrame."""
    pairs_ds = ngram_inverted_candidates_ds(ds, shingle_k, max_df, sample_mod)
    if pairs_ds is None:
        return pd.DataFrame({"id_a": [], "id_b": []})
    pairs = pairs_ds.to_pandas()
    if pairs.empty:
        return pd.DataFrame({"id_a": [], "id_b": []})
    return pairs.drop_duplicates(["id_a", "id_b"]).reset_index(drop=True)


def verify_jaccard_pairs_ds(pairs_ds, ds, id_col: str, threshold: float,
                            shingle_k: int = 3):
    """Distributed exact-Jaccard verify of a candidate-pair Dataset.

    Two co-group stages; texts and Jaccard math never touch the driver:

    1. Pair-membership rows (node, id_a, id_b, side∈{0,1}) are unioned with
       the pair members' text rows (semi-joined in ``map_batches`` against
       the broadcast candidate-member id set; side=-1) and co-grouped by
       node — each group forwards the node's text onto its membership rows.
    2. ``groupby([id_a, id_b]).map_groups`` shingles both sides and emits
       the pair iff exact Jaccard >= threshold. The pair-key groupby also
       collapses cross-band duplicate candidates.

    Driver memory: the candidate-member ID set (for the broadcast filter)
    only — O(near-dup members), no texts. Returns a Dataset of
    (id_a, id_b, jaccard) verified pairs.
    """
    import ray

    wanted: set = set()
    for b in pairs_ds.select_columns(["id_a", "id_b"]).iter_batches(
        batch_size=8192, batch_format="pandas"
    ):
        wanted.update(b["id_a"])
        wanted.update(b["id_b"])
    wanted_ref = ray.put(wanted)

    def memberships(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "node": pd.concat([b["id_a"], b["id_b"]], ignore_index=True),
                "id_a": pd.concat([b["id_a"], b["id_a"]], ignore_index=True),
                "id_b": pd.concat([b["id_b"], b["id_b"]], ignore_index=True),
                "side": np.repeat(
                    np.array([0, 1], dtype=np.int8), len(b)
                ),
                "text": "",
            }
        )

    def text_rows(b: pd.DataFrame) -> pd.DataFrame:
        w = ray.get(wanted_ref)
        keep = b[b[id_col].isin(w)]
        ids = keep[id_col]
        return pd.DataFrame(
            {
                "node": ids,
                "id_a": ids,  # placeholders (type-stable); ignored at side=-1
                "id_b": ids,
                "side": np.full(len(keep), -1, dtype=np.int8),
                "text": keep["text"],
            }
        )

    member_ds = pairs_ds.map_batches(memberships, batch_format="pandas")
    texts_ds = ds.map_batches(text_rows, batch_format="pandas")

    def forward(g: pd.DataFrame) -> pd.DataFrame:
        tr = g[g["side"] == -1]
        mem = g[g["side"] >= 0]
        if tr.empty or mem.empty:
            return pd.DataFrame(
                {"id_a": [], "id_b": [], "side": [], "text": []}
            )
        return pd.DataFrame(
            {"id_a": mem["id_a"], "id_b": mem["id_b"], "side": mem["side"],
             "text": tr["text"].iloc[0]}
        )

    def verify(g: pd.DataFrame) -> pd.DataFrame:
        a = g.loc[g["side"] == 0, "text"]
        b = g.loc[g["side"] == 1, "text"]
        if a.empty or b.empty:
            return pd.DataFrame({"id_a": [], "id_b": [], "jaccard": []})
        j = jaccard(
            shingle_hashes(a.iloc[0], shingle_k),
            shingle_hashes(b.iloc[0], shingle_k),
        )
        if j < threshold:
            return pd.DataFrame({"id_a": [], "id_b": [], "jaccard": []})
        return pd.DataFrame(
            {"id_a": [g["id_a"].iloc[0]], "id_b": [g["id_b"].iloc[0]],
             "jaccard": [j]}
        )

    return (
        member_ds.union(texts_ds)
        .groupby("node")
        .map_groups(forward, batch_format="pandas")
        .groupby(["id_a", "id_b"])
        .map_groups(verify, batch_format="pandas")
    )


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


_NO_DST = np.int64(-1)          # tag: this row is a label row, not an edge
_LABEL_INF = np.int64(1) << 62  # edge rows carry +inf-ish label (never wins Min)


def label_propagation_components_ds(pairs: pd.DataFrame, max_iter: int = 50
                                    ) -> dict:
    """Distributed min-label propagation ON Datasets: each round co-keys the
    label table with the edge list (one groupby), emits each node's label to
    its neighbors inside ``map_groups``, and folds messages with a
    groupby-Min. Labels and edges never materialize on the driver until the
    final (O(nodes-in-components)) label table is collected. Identical
    output to ``union_find_components`` (parity-tested).

    Deliberately join-free: in this Ray version the hash-join finalize
    breaks on the schema-less empty blocks that hash aggregates emit for
    empty partitions; groupby machinery tolerates them. Numeric ids only
    (sentinel labels + the Sum convergence scalar).
    """
    import ray.data as rd
    from ray.data.aggregate import Min, Sum

    if pairs.empty:
        return {}
    edges_df = pd.concat(
        [
            pairs.rename(columns={"id_a": "src", "id_b": "dst"})[["src", "dst"]],
            pairs.rename(columns={"id_b": "src", "id_a": "dst"})[["src", "dst"]],
        ],
        ignore_index=True,
    ).astype(np.int64)
    edges_tagged = rd.from_arrow(
        pa.Table.from_pandas(
            edges_df.assign(label=_LABEL_INF)[["src", "dst", "label"]],
            preserve_index=False,
        )
    ).materialize()

    # initial label of every node = itself (every node appears as a src
    # because edges are bidirectional)
    labels = (
        edges_tagged.select_columns(["src"])
        .groupby("src")
        .aggregate(Min("src", alias_name="label"))
        .materialize()
    )

    def send(g: pd.DataFrame) -> pd.DataFrame:
        # one label row (dst == _NO_DST, true label) + this node's out-edges:
        # message the label to every neighbor, and to the node itself
        lbl = np.int64(g["label"].min())
        dsts = g.loc[g["dst"] != _NO_DST, "dst"].to_numpy(dtype=np.int64)
        return pd.DataFrame(
            {"src": np.append(dsts, np.int64(g["src"].iloc[0])),
             "label": lbl}
        )

    prev_sum = None
    for _ in range(max_iter):
        ltag = labels.map_batches(
            lambda t: t.append_column(
                "dst", pa.array(np.full(t.num_rows, _NO_DST))
            ).select(["src", "dst", "label"]),
            batch_format="pyarrow",
        )
        new_labels = (
            edges_tagged.union(ltag)
            .groupby("src")
            .map_groups(send, batch_format="pandas")
            .groupby("src")
            .aggregate(Min("label", alias_name="label"))
            .materialize()
        )
        # convergence via a scalar: min-label propagation is monotone
        # non-increasing, so the label sum is a fixpoint detector — one
        # tiny aggregate instead of a full self-join per round
        s = new_labels.aggregate(Sum("label", alias_name="s"))["s"]
        labels = new_labels
        if s == prev_sum:
            break
        prev_sum = s
    out = labels.to_pandas()
    return dict(zip(out["src"].astype(np.int64), out["label"].astype(np.int64)))


# pairs above this size run components distributed (Dataset joins); below,
# driver union-find (the verified-pair set is bounded by true near-dups,
# so the driver path covers all but pathological corpora)
DISTRIBUTED_CC_THRESHOLD = 2_000_000


def connected_components(pairs: pd.DataFrame,
                         distributed_threshold: int = DISTRIBUTED_CC_THRESHOLD
                         ) -> dict:
    """id → component representative (min id); picks the execution path by
    pair count. Both paths produce identical maps (tested). The distributed
    path needs numeric ids (its convergence aggregate sums labels) — string
    ids stay on union-find (hash them upstream for cluster-scale corpora)."""
    if len(pairs) > distributed_threshold and pd.api.types.is_numeric_dtype(
        pairs["id_a"]
    ):
        return label_propagation_components_ds(pairs)
    return union_find_components(pairs)


# ---------------------------------------------------------------- simhash
def md5_hash64(tokens) -> np.ndarray:
    """uint64 token hashes = little-endian first 8 bytes of md5(utf-8).

    Chosen over blake2b for the simhash family because DuckDB's
    ``md5_number_upper(tok)`` computes the identical value, so the whole
    simhash pipeline is SQL-oracle-reproducible end to end."""
    m = hashlib.md5
    return np.fromiter(
        (
            int.from_bytes(m(t.encode("utf-8")).digest()[:8], "little")
            for t in tokens
        ),
        dtype=np.uint64,
        count=len(tokens),
    )


class SimHasher:
    """64-bit simhash over token hashes; map_batches stage."""

    def __init__(self, seed: int = 11):
        self.seed = seed

    def simhash(self, text: str) -> int:
        toks = _TOKEN_RE.findall(text.lower())
        if not toks:
            return 0
        hs = md5_hash64(toks)
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


def _simhash_band_explode(batch: pa.Table) -> pa.Table:
    """(id, simhash) rows → 4 banded rows each: bucket = band<<16 | key16.
    The simhash rides along so hamming verification happens in-group."""
    id_name = batch.schema.names[0]
    h = batch.column("simhash").to_numpy(zero_copy_only=False).astype(np.uint64)
    n = len(h)
    ids = batch.column(id_name)
    id_arr = ids.combine_chunks() if isinstance(ids, pa.ChunkedArray) else ids
    buckets = np.empty((4, n), dtype=np.int64)
    for band in range(4):
        key = (h >> np.uint64(band * 16)) & np.uint64(0xFFFF)
        buckets[band] = (np.int64(band) << np.int64(16)) | key.astype(np.int64)
    return pa.Table.from_arrays(
        [
            pa.concat_arrays([id_arr] * 4),
            pa.array(np.tile(h, 4), type=pa.uint64()),
            pa.array(buckets.reshape(-1)),
        ],
        names=[id_name, "simhash", "bucket"],
    )


def simhash_candidates(ds, max_hamming: int = 3, seed: int = 11) -> pd.DataFrame:
    """Band the 64-bit simhash into 4x16-bit keys (any pair within hamming
    <= 3 shares at least one 16-bit band by pigeonhole when bits spread),
    bucket-join, exact hamming verify — all distributed: banding is a map
    pass, hot buckets come from a filtered Count aggregate, and both pair
    generation AND the hamming verify run inside ``map_groups`` (each row
    carries its simhash). Only verified pairs reach the driver."""
    id_col = ds.schema().names[0]
    banded = (
        ds.map_batches(SimHasher(seed), batch_format="pyarrow", batch_size=2048)
        .map_batches(_simhash_band_explode, batch_format="pyarrow")
        .materialize()
    )
    hot = hot_bucket_keys(banded)
    if not hot.size:
        return pd.DataFrame({"id_a": [], "id_b": [], "hamming": []})

    def verify_group(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(id_col)
        ids = g[id_col].to_numpy()
        hs = g["simhash"].to_numpy().astype(np.uint64)
        if len(ids) < 2:
            return pd.DataFrame({"id_a": [], "id_b": [], "hamming": []})
        if len(ids) > HOT_BUCKET_CAP:
            ia = np.zeros(len(ids) - 1, dtype=np.int64)
            ib = np.arange(1, len(ids), dtype=np.int64)
        else:
            ia, ib = np.triu_indices(len(ids), k=1)
        d = hamming64(hs[ia], hs[ib])
        m = d <= max_hamming
        return pd.DataFrame(
            {"id_a": ids[ia[m]], "id_b": ids[ib[m]], "hamming": d[m]}
        )

    pairs = bucket_pairs_distributed(banded, hot, id_col, pair_fn=verify_group)
    if pairs.empty:
        return pd.DataFrame({"id_a": [], "id_b": [], "hamming": []})
    return pairs.sort_values(["id_a", "id_b"]).reset_index(drop=True)


# --------------------------------------------------------- embedding LSH
from functools import lru_cache


@lru_cache(maxsize=8)
def _hyperplanes(dim: int, n_planes: int, seed: int) -> np.ndarray:
    """Seeded Gaussian hyperplane matrix, built once per worker process
    (deterministic across workers — same seed, same matrix)."""
    return np.random.RandomState(seed).standard_normal((dim, n_planes))


def embedding_neardup_pairs(
    ds,
    threshold: float = 0.95,
    n_planes: int = 16,
    seed: int = 13,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_tables: int = 3,
) -> pd.DataFrame:
    """Cosine near-dup via random-hyperplane LSH buckets + exact verify.

    Sign pattern over n_planes seeded Gaussian hyperplanes → bucket key;
    ``n_tables`` independent plane sets (OR-construction) drive per-pair
    miss probability from ~(θ·n_planes/π) down to its n_tables-th power —
    at cosine ≥ 0.98 recall is effectively 1, which is what lets the
    ``dedup_embedding`` gate pair against a brute-force SQL oracle.
    Verify is an exact normalized dot inside each bucket. Scale path: the
    bucket groupby is the only shuffle; plane matrices are broadcast
    (n_tables× banded rows, same as minhash banding)."""
    def stage(batch: pa.Table) -> pa.Table:
        from .similarity import _list_matrix

        # zero-copy flat-values reshape (no per-row python lists)
        vecs = _list_matrix(batch.column(vec_col))
        norm = np.linalg.norm(vecs, axis=1)
        ids = batch.column(id_col)
        id_arr = ids.combine_chunks() if isinstance(ids, pa.ChunkedArray) else ids
        vec_arr = batch.column(vec_col)
        vec_arr = (
            vec_arr.combine_chunks()
            if isinstance(vec_arr, pa.ChunkedArray)
            else vec_arr
        )
        keys = np.empty((n_tables, len(vecs)), dtype=np.int64)
        for t in range(n_tables):
            planes = _hyperplanes(vecs.shape[1], n_planes, seed + 1000 * t)
            signs = (vecs @ planes) > 0
            key = (
                signs.astype(np.uint64) << np.arange(n_planes, dtype=np.uint64)
            ).sum(axis=1)
            keys[t] = (np.int64(t) << np.int64(n_planes)) | key.view(np.int64)
        return pa.Table.from_arrays(
            [
                pa.concat_arrays([id_arr] * n_tables),
                pa.array(keys.reshape(-1)),
                pa.concat_arrays([vec_arr] * n_tables),
                pa.array(np.tile(norm, n_tables)),
            ],
            names=[id_col, "bucket", vec_col, "norm"],
        )

    keyed = ds.map_batches(stage, batch_format="pyarrow", batch_size=4096).materialize()
    hot = hot_bucket_keys(keyed)
    if not hot.size:
        return pd.DataFrame({"id_a": [], "id_b": [], "cosine": []})

    def verify_group(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"id_a": [], "id_b": [], "cosine": []})
        if len(g) < 2:
            return empty
        g = g.sort_values(id_col)
        m = np.asarray(g[vec_col].tolist(), dtype=np.float64)
        nrm = g["norm"].to_numpy().clip(min=1e-12)
        ids = g[id_col].to_numpy()
        if len(g) > 500:
            # hot bucket = one near-identical cluster: verify against the
            # min-id representative only (linear work, cluster still found)
            sims = (m[1:] @ m[0]) / (nrm[1:] * nrm[0])
            mask = sims >= threshold
            if not mask.any():
                return empty
            return pd.DataFrame(
                {"id_a": np.repeat(ids[0], int(mask.sum())),
                 "id_b": ids[1:][mask], "cosine": sims[mask]}
            )
        sims = (m @ m.T) / np.outer(nrm, nrm)
        ia, ib = np.triu_indices(len(g), k=1)
        mask = sims[ia, ib] >= threshold
        if not mask.any():
            return empty
        return pd.DataFrame(
            {"id_a": ids[ia[mask]], "id_b": ids[ib[mask]],
             "cosine": sims[ia, ib][mask]}
        )

    pairs = bucket_pairs_distributed(keyed, hot, id_col, pair_fn=verify_group)
    if pairs.empty:
        return pd.DataFrame({"id_a": [], "id_b": [], "cosine": []})
    return pairs.sort_values(["id_a", "id_b"]).reset_index(drop=True)


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
                       seed=7, shingle_k=3, id_col="doc_id"):
    """Full minhash near-dedup: returns an (id, cluster) keep-map Dataset —
    every input id, cluster = min id of its near-dup component.

    Fully distributed verify: candidate pairs stay a Dataset, texts are
    co-grouped onto pair memberships on workers, and exact Jaccard runs
    inside ``map_groups`` (see :func:`verify_jaccard_pairs_ds`) — only
    VERIFIED pairs (true near-dups) ever reach the driver, for the
    connected-components fold. The keep-map itself streams — the component
    map (O(near-dup members)) is broadcast and applied inside
    ``map_batches``, never an O(corpus) driver list.
    """
    import ray

    cand_ds = minhash_lsh_candidates_ds(ds, n_perm, n_bands, seed, shingle_k)
    ids_only = ds.select_columns([id_col])
    if cand_ds is None:
        comp: dict = {}
    else:
        verified = verify_jaccard_pairs_ds(
            cand_ds, ds, id_col, threshold, shingle_k
        ).to_pandas()
        comp = connected_components(verified)
    comp_ref = ray.put(comp)

    def attach(df: pd.DataFrame) -> pd.DataFrame:
        # vectorized: this stage touches EVERY corpus row — Series.map
        # against the broadcast keep-map, identity for unmapped ids
        m = ray.get(comp_ref)
        df = df[[id_col]].copy()
        df["cluster"] = (
            df[id_col].map(m).fillna(df[id_col]).astype(df[id_col].dtype)
        )
        return df

    return ids_only.map_batches(attach, batch_format="pandas")
