"""Cardinality sketches: HyperLogLog distinct-count over a Dataset column.

The 100 TB companion to the exact seen-set: distinct URLs/hosts/doc-ids
without O(distinct) memory. Dense HLL (Flajolet et al. 2007) with 2^p
registers; per-batch partial register arrays (4 KiB each at p=12) are the
ONLY thing that leaves workers, merged by elementwise max — associative
and commutative, so any combine tree gives identical registers
(merge-equality is tested, not just estimate closeness).

Deterministic end to end: murmur3 fmix64 for integer columns and the md5
family (``md5_hash64``) for strings — both chosen because the DuckDB
oracle recomputes them exactly (HUGEINT split-multiply / md5_number_upper).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

def hll_idx_ranks(h: np.ndarray, p: int) -> tuple[np.ndarray, np.ndarray]:
    """(register index, rank) for a uint64 hash array — the HLL update
    kernel, shared by the flat and grouped sketches. rank = leading zeros
    of the (64-p)-bit payload + 1, capped at 64-p+1. floor(log2) via
    float64 can over-round for >53-bit values just below a power of two,
    so clamp and correct by one exact shift."""
    h = np.asarray(h, dtype=np.uint64)
    idx = (h >> np.uint64(64 - p)).astype(np.int64)
    rest = h << np.uint64(p)  # payload bits, left-aligned
    nz = rest != 0
    lz = np.full(len(h), np.uint64(64 - p), dtype=np.uint64)
    if nz.any():
        x = rest[nz]
        with np.errstate(divide="ignore"):
            fl = np.floor(np.log2(x.astype(np.float64))).astype(np.uint64)
        fl = np.minimum(fl, np.uint64(63))
        over = (x >> fl) == 0
        fl[over] -= np.uint64(1)
        lz[nz] = np.uint64(63) - fl
    rank = (np.minimum(lz, np.uint64(64 - p)) + np.uint64(1)).astype(np.uint8)
    return idx, rank


class HllSketch:
    """Dense HyperLogLog over uint64 hashes. p in [4, 18]."""

    def __init__(self, p: int = 12):
        if not 4 <= p <= 18:
            raise ValueError("p must be in [4, 18]")
        self.p = p
        self.m = 1 << p
        self.registers = np.zeros(self.m, dtype=np.uint8)

    def add_hashes(self, h: np.ndarray) -> "HllSketch":
        """Vectorized register update from a uint64 hash array."""
        if not len(h):
            return self
        idx, rank = hll_idx_ranks(h, self.p)
        np.maximum.at(self.registers, idx, rank)
        return self

    def add_strings(self, values) -> "HllSketch":
        from .dedup import md5_hash64

        return self.add_hashes(md5_hash64([str(v) for v in values]))

    def merge(self, other: "HllSketch") -> "HllSketch":
        assert other.p == self.p
        np.maximum(self.registers, other.registers, out=self.registers)
        return self

    def estimate(self) -> float:
        """Standard HLL estimator with small-range linear counting.

        The harmonic sum is computed EXACTLY in integer arithmetic
        (sum of 2^(63-rank) as a python int, one float division at the
        end) so the estimate is order-independent and bit-reproducible by
        the DuckDB oracle, which folds the identical integer sum in
        HUGEINT. ``math.log`` (libm, same as DuckDB's ``ln``) rather than
        numpy's SIMD log for the linear-counting branch."""
        import math

        m = float(self.m)
        alpha = 0.7213 / (1.0 + 1.079 / m)
        cnt = np.bincount(self.registers, minlength=64)
        s = sum(int(c) << (63 - r) for r, c in enumerate(cnt) if c)
        inv = s / (1 << 63)
        e = alpha * m * m / inv
        zeros = int(cnt[0])
        if e <= 2.5 * m and zeros:
            return m * math.log(m / zeros)  # linear counting
        return float(e)


def _col_hashes(t: pa.Table, col: str) -> np.ndarray:
    """Per-column uint64 hashes for the HLL gate — both paths are chosen
    to be DuckDB-oracle-reproducible: fmix64 is plain mod-2^64 integer
    arithmetic (HUGEINT split-multiply in SQL) and the string path is the
    md5 family (``md5_number_upper``)."""
    arr = t.column(col)
    if pa.types.is_integer(arr.type):
        # raw ints are NOT uniform — murmur3 fmix64 spreads them
        v = arr.to_numpy(zero_copy_only=False).astype(np.uint64)
        with np.errstate(over="ignore"):
            v = v ^ (v >> np.uint64(33))
            v = v * np.uint64(0xFF51AFD7ED558CCD)
            v = v ^ (v >> np.uint64(33))
            v = v * np.uint64(0xC4CEB9FE1A85EC53)
            v = v ^ (v >> np.uint64(33))
        return v
    from .dedup import md5_hash64

    return md5_hash64([str(v) for v in arr.to_pylist()])


def hll_distinct(ds, col: str, p: int = 12) -> float:
    """Approximate COUNT(DISTINCT col): per-batch partial sketches (one
    4 KiB register row per batch), driver merge = elementwise max. At
    cluster scale the partials are tiny regardless of data volume."""

    def partial(t: pa.Table) -> pa.Table:
        sk = HllSketch(p).add_hashes(_col_hashes(t, col))
        return pa.table({"registers": pa.array([sk.registers.tobytes()],
                                               type=pa.binary())})

    merged = HllSketch(p)
    for b in ds.map_batches(partial, batch_format="pyarrow").iter_batches(
        batch_size=None, batch_format="pyarrow"
    ):
        for buf in b.column("registers").to_pylist():
            other = HllSketch(p)
            other.registers = np.frombuffer(buf, dtype=np.uint8).copy()
            merged.merge(other)
    return merged.estimate()


def hll_distinct_by(ds, group_col: str, col: str, p: int = 12) -> pd.DataFrame:
    """Per-group approximate COUNT(DISTINCT col): one streaming pass emits
    one register row PER (batch, group) — np.maximum.at over a flattened
    (groups-in-batch × m) register matrix, no per-group python loop — and
    the driver merge is elementwise max per group. Partial volume is
    O(blocks × groups × 4 KiB) regardless of data size: the same
    mergeable-partial shape as the flat HLL / KMV / moments sketches (the
    group column is the small side by assumption — event types, languages,
    sources — NOT a high-cardinality key).

    Returns (group, hll_estimate, exact_distinct, rel_error): the exact
    count is a distributed two-level groupby (the self-check a production
    run samples), and every estimate is bit-reproducible by the DuckDB
    oracle (same integer harmonic fold as HllSketch.estimate)."""
    m = 1 << p

    def partial(t: pa.Table) -> pa.Table:
        h = _col_hashes(t, col)
        codes, uniq = pd.factorize(t.column(group_col).to_pandas())
        regs = np.zeros(len(uniq) * m, dtype=np.uint8)
        idx, rank = hll_idx_ranks(h, p)
        # factorize codes nulls as -1: a negative flat index would wrap
        # into the LAST group's registers (silent estimate corruption) or
        # raise on an all-null batch. Nulls carry no key — drop them,
        # matching the exact-count side (groupby excludes null groups).
        ok = codes >= 0
        codes, idx, rank = codes[ok], idx[ok], rank[ok]
        np.maximum.at(regs, codes.astype(np.int64) * m + idx, rank)
        return pa.table(
            {
                "grp": pa.array([str(u) for u in uniq]),
                "registers": pa.array(
                    [regs[i * m:(i + 1) * m].tobytes() for i in range(len(uniq))],
                    type=pa.binary(),
                ),
            }
        )

    merged: dict[str, HllSketch] = {}
    for b in ds.map_batches(partial, batch_format="pyarrow").iter_batches(
        batch_size=None, batch_format="pyarrow"
    ):
        for grp, buf in zip(b.column("grp").to_pylist(),
                            b.column("registers").to_pylist()):
            sk = merged.setdefault(grp, HllSketch(p))
            np.maximum(sk.registers, np.frombuffer(buf, dtype=np.uint8),
                       out=sk.registers)

    # exact per group: distinct pairs first (wide), then count per group
    from ray.data.aggregate import Count

    pairs = ds.groupby([group_col, col]).aggregate(Count(alias_name="n"))
    ex = (
        pairs.map_batches(
            lambda df: df[[group_col]],
            batch_format="pandas",
        )
        .groupby(group_col)
        .aggregate(Count(alias_name="exact"))
        .to_pandas()
    )
    exact = dict(zip(ex[group_col].astype(str), ex["exact"].astype(int)))

    rows = []
    # Ordering contract: groups are emitted in UTF-8 BYTEWISE order (the
    # explicit encode key — for valid UTF-8 this equals codepoint order),
    # which may differ from a SQL engine's collation for non-ASCII keys.
    # The SQL pairing is order-insensitive (both sides re-sorted before
    # comparison); consumers of raw output must not assume SQL collation.
    for grp in sorted(merged, key=lambda s: s.encode("utf-8")):
        est = merged[grp].estimate()
        xc = exact.get(grp, 0)
        rows.append(
            {
                "group": grp,
                "hll_estimate": int(round(est)),
                "exact_distinct": int(xc),
                "rel_error": round(abs(est - xc) / max(1, xc), 4),
            }
        )
    return pd.DataFrame(rows)


def hll_distinct_report(sf_dir: str, specs: list[tuple[str, str]],
                        p: int = 12) -> pd.DataFrame:
    """(table, column) specs → DataFrame of HLL estimates + relative error
    vs the exact distributed distinct count (a groupby Count) — the
    self-check a production pipeline would sample."""
    import ray.data as rd
    from ray.data.aggregate import Count

    rows = []
    for table, col in specs:
        ds = rd.read_parquet(f"{sf_dir}/{table}.parquet", columns=[col])
        est = hll_distinct(ds, col, p)
        exact = ds.groupby(col).aggregate(Count(alias_name="n")).count()
        rows.append(
            {
                "table": table,
                "column": col,
                "hll_estimate": int(round(est)),
                "exact_distinct": int(exact),
                "rel_error": round(abs(est - exact) / max(1, exact), 4),
            }
        )
    return pd.DataFrame(rows)


# ---------------------------------------------------------------------------
# KMV bottom-k quantile sketch
# ---------------------------------------------------------------------------
class KmvQuantileSketch:
    """Mergeable bottom-k (KMV) quantile sketch: keep the k rows with the
    smallest uniform row hashes; any quantile is then the exact quantile of
    that deterministic uniform sample (Bar-Yossef et al. 2002 KMV
    construction, applied to quantiles instead of distinct counts).

    Mergeable: merge(a, b) = bottom-k of the union — associative and
    commutative, so per-batch partials combine in any tree to the same
    sketch (same guarantee shape as the HLL registers above). Per-partial
    payload is k (hash, value) pairs; nothing else leaves a worker.

    Deterministic end to end: the row hash is md5-64 of the row key
    (DuckDB ``md5_number_upper``), ties break by (hash, value), and the
    quantile pick is the lower-index selection floor(p * (n_sample - 1)) —
    every step reproducible bit-for-bit in SQL.
    """

    def __init__(self, k: int = 2048):
        self.k = k
        self.h = np.empty(0, dtype=np.uint64)
        self.v = np.empty(0, dtype=np.int64)

    def add(self, h: np.ndarray, v: np.ndarray) -> "KmvQuantileSketch":
        h = np.concatenate([self.h, np.asarray(h, dtype=np.uint64)])
        v = np.concatenate([self.v, np.asarray(v, dtype=np.int64)])
        order = np.lexsort((v, h))[: self.k]
        self.h, self.v = h[order], v[order]
        return self

    def merge(self, other: "KmvQuantileSketch") -> "KmvQuantileSketch":
        return self.add(other.h, other.v)

    def quantile(self, p: float) -> int:
        if not len(self.v):
            raise ValueError("empty sketch")
        s = np.sort(self.v)
        return int(s[int(np.floor(p * (len(s) - 1)))])


def kmv_quantiles(ds, key_fn, cents_fn, ps, k: int = 2048):
    """Dataset → [(p, est_cents)] via per-batch bottom-k partials.

    ``key_fn(table) -> list[str]`` builds the unique row key (hash input),
    ``cents_fn(table) -> int64 ndarray`` the exact integer value column.
    Partials (k rows each) are the only data leaving workers; the driver
    merge is O(blocks * k), the sketch-combine pattern (cf. HLL)."""
    from ..urlnorm import url_hash64

    def partial(t: pa.Table) -> pa.Table:
        h = url_hash64(key_fn(t))
        v = cents_fn(t)
        order = np.lexsort((v, h))[:k]
        return pa.table({"h": pa.array(h[order], type=pa.uint64()),
                         "v": pa.array(v[order], type=pa.int64())})

    sk = KmvQuantileSketch(k)
    stream = ds.map_batches(partial, batch_format="pyarrow").iter_batches(
        batch_format="pyarrow"
    )
    for t in stream:
        sk.add(t.column("h").to_numpy(zero_copy_only=False),
               t.column("v").to_numpy(zero_copy_only=False))
    return [(p, sk.quantile(p)) for p in ps]


# ---------------------------------------------------------------------------
# Count-Min sketch heavy hitters (two-pass: sketch -> candidates -> verify)
# ---------------------------------------------------------------------------
CMS_DEPTH = 4
CMS_WIDTH = 1024


def _cms_cols(terms: list[str], row: int) -> np.ndarray:
    """Column index of each term in sketch row ``row``: md5-64 of
    'row:term' mod width — DuckDB-reproducible
    (md5_number_upper(CAST(r AS VARCHAR) || ':' || term) % width)."""
    from ..urlnorm import url_hash64

    return (url_hash64([f"{row}:{t}" for t in terms])
            % np.uint64(CMS_WIDTH)).astype(np.int64)


def cms_sketch_terms(ds, text_col: str = "text"):
    """Count-Min sketch (Cormode & Muthukrishnan 2005) of the corpus's
    token-OCCURRENCE stream. Per-batch partial = one depth×width int64
    grid (32 KiB), merged on the driver by plain addition — associative,
    so any combine tree gives identical cells. Hashing is per DISTINCT
    term per batch (occurrence counts enter via np.add.at weights), not
    per occurrence."""
    from .curation import _token_frame

    def partial(t: pa.Table) -> pa.Table:
        _, toks = _token_frame(t.column(text_col).to_pandas())
        grid = np.zeros((CMS_DEPTH, CMS_WIDTH), dtype=np.int64)
        if len(toks):
            terms, counts = np.unique(toks, return_counts=True)
            tl = [str(x) for x in terms]
            for r in range(CMS_DEPTH):
                np.add.at(grid[r], _cms_cols(tl, r), counts)
        return pa.table({"grid": pa.array([grid.tobytes()], type=pa.binary())})

    grid = np.zeros((CMS_DEPTH, CMS_WIDTH), dtype=np.int64)
    for b in ds.map_batches(partial, batch_format="pyarrow").iter_batches(
        batch_size=None, batch_format="pyarrow"
    ):
        for buf in b.column("grid").to_pylist():
            grid += np.frombuffer(buf, dtype=np.int64).reshape(
                CMS_DEPTH, CMS_WIDTH)
    return grid


def cms_estimate(grid: np.ndarray, terms: list[str]) -> np.ndarray:
    """CMS point estimate per term: min over rows of the hashed cell.
    Never underestimates (one-sided error), which is what makes the
    candidate set a guaranteed superset of the true heavy set."""
    if not terms:
        return np.zeros(0, dtype=np.int64)
    ests = np.full(len(terms), np.iinfo(np.int64).max, dtype=np.int64)
    for r in range(CMS_DEPTH):
        np.minimum(ests, grid[r][_cms_cols(terms, r)], out=ests)
    return ests


def cms_heavy_hitters(ds, text_col: str = "text", denom: int = 20
                      ) -> pd.DataFrame:
    """Terms whose exact occurrence count >= total_tokens // denom, with
    their CMS estimates — the classic two-pass heavy-hitter flow at scale:

    1. ONE streaming pass builds the 32 KiB sketch (mergeable partials).
    2. Candidate generation never groups the token stream: each batch
       emits its DISTINCT terms (O(blocks x per-block vocab) slim rows),
       a term-groupby dedups them, and the BROADCAST sketch filters to
       est >= T. CMS never underestimates, so this is a superset of the
       true heavy set.
    3. Exact verify re-counts ONLY the (few) candidates — semi-join
       against the broadcast candidate set inside map_batches, then a
       small groupby(term) sum.

    The full-vocabulary exact groupby never happens; the only wide ops
    are over per-batch-distinct terms and candidate occurrences."""
    import ray

    from .curation import _token_frame

    grid = cms_sketch_terms(ds, text_col)
    total = int(grid[0].sum())  # every row sums to the stream length
    threshold = max(1, total // denom)
    grid_ref = ray.put(grid)

    def batch_vocab(t: pa.Table) -> pa.Table:
        _, toks = _token_frame(t.column(text_col).to_pandas())
        return pa.table({"term": pa.array(
            [str(x) for x in (np.unique(toks) if len(toks) else [])],
            type=pa.string())})

    def estimate(df: pd.DataFrame) -> pd.DataFrame:
        g = ray.get(grid_ref)
        terms = df["term"].astype(str).tolist()
        out = pd.DataFrame({"term": df["term"].astype(str),
                            "cms_est": cms_estimate(g, terms)})
        return out[out["cms_est"] >= threshold]

    from ray.data.aggregate import Count

    cand = (
        ds.map_batches(batch_vocab, batch_format="pyarrow")
        .groupby("term")
        .aggregate(Count(alias_name="nb"))
        .map_batches(lambda df: estimate(df[["term"]]), batch_format="pandas")
        .to_pandas()
    )
    if "term" not in cand.columns or not len(cand):  # zero candidates
        return pd.DataFrame({"term": pd.Series([], dtype=object),
                             "cms_est": pd.Series([], dtype="int64"),
                             "exact_count": pd.Series([], dtype="int64")})
    cand_ref = ray.put(np.sort(cand["term"].to_numpy(dtype=object)))

    def count_cands(t: pa.Table) -> pa.Table:
        cs = ray.get(cand_ref)  # sorted candidate array, broadcast once
        _, toks = _token_frame(t.column(text_col).to_pandas())
        if len(toks):
            terms, counts = np.unique(toks, return_counts=True)
            keep = np.isin(terms, cs)
            terms, counts = terms[keep], counts[keep]
        else:
            terms, counts = np.empty(0, object), np.empty(0, np.int64)
        return pa.table({"term": pa.array([str(x) for x in terms]),
                         "n": pa.array(counts.astype(np.int64))})

    from ray.data.aggregate import Sum

    exact = (
        ds.map_batches(count_cands, batch_format="pyarrow")
        .groupby("term")
        .aggregate(Sum("n", alias_name="exact_count"))
        .to_pandas()
    )
    out = cand.merge(exact, on="term", how="inner")
    out = out[out["exact_count"] >= threshold]
    out["exact_count"] = out["exact_count"].astype("int64")
    return out.sort_values("term").reset_index(drop=True)


# ---------------------------------------------------------------------------
# Bloom filter (build / probe) + bloom-accelerated anti-join
# ---------------------------------------------------------------------------
BLOOM_BITS = 4096  # sized for the demo corpus; scale ~10 bits/key in prod
BLOOM_K = 2


def _bloom_pos(keys: list[str], i: int) -> np.ndarray:
    """Bit position of each key under hash row ``i`` — md5-64 of
    'i:key' mod BLOOM_BITS, DuckDB-reproducible
    (md5_number_upper(CAST(i AS VARCHAR) || ':' || key) % bits), the
    same salt-prefix idiom as the CMS sketch."""
    from ..urlnorm import url_hash64

    return (url_hash64([f"{i}:{k}" for k in keys])
            % np.uint64(BLOOM_BITS)).astype(np.int64)


def bloom_build(ds, key_col: str) -> np.ndarray:
    """ONE streaming pass over the build side → dense uint8 bit array
    (BLOOM_BITS/8 bytes). Per-batch partial = the batch's DISTINCT bit
    positions (slim int32 rows, far smaller than shipping bit arrays);
    the driver ORs them in — associative/idempotent, so block layout is
    irrelevant. Keys are stringified ints (matches the SQL CAST)."""
    def partial(t: pa.Table) -> pa.Table:
        keys = np.unique(
            t.column(key_col).to_numpy(zero_copy_only=False).astype(np.int64)
        )
        ks = [str(k) for k in keys]
        pos = np.unique(
            np.concatenate([_bloom_pos(ks, i) for i in range(BLOOM_K)])
            if len(ks) else np.zeros(0, dtype=np.int64)
        )
        return pa.table({"pos": pa.array(pos.astype(np.int32))})

    bits = np.zeros(BLOOM_BITS, dtype=np.uint8)
    for b in ds.map_batches(partial, batch_format="pyarrow").iter_batches(
        batch_size=None, batch_format="pyarrow"
    ):
        bits[b.column("pos").to_numpy(zero_copy_only=False)] = 1
    return bits


def bloom_maybe(bits: np.ndarray, keys: np.ndarray) -> np.ndarray:
    """Vectorized membership test: True = possibly in the build set
    (needs exact verify), False = DEFINITELY absent (no false
    negatives — the anti-join can emit these without any join)."""
    ks = [str(k) for k in keys]
    m = np.ones(len(keys), dtype=bool)
    for i in range(BLOOM_K):
        m &= bits[_bloom_pos(ks, i)].astype(bool)
    return m


def kmv_group_quantiles(ds, group_col: str, key_fn, cents_fn, ps,
                        k: int = 512):
    """Per-group approximate quantiles via the KMV bottom-k sketch —
    the grouped variant of :func:`kmv_quantiles`. Each batch emits its
    per-group bottom-k (hash, value) partial rows (O(groups·k) egress per
    block); ONE groupby(group) shuffle co-locates each group's partials,
    and the in-group fold (lexsort → cut → quantile picks) runs once per
    group. Same determinism contract as the global sketch: md5 row
    hashes, (hash, value) tie-break, lower-index quantile pick — every
    step bit-reproducible in SQL. Boundary note: rows tied on the exact
    (hash, value) pair may swap across the k-cut, but the kept VALUE
    multiset is identical either way, so estimates cannot differ."""
    from ..urlnorm import url_hash64

    ps = list(ps)

    def partial(t: pa.Table) -> pd.DataFrame:
        empty = pd.DataFrame(
            {"g": pd.Series(dtype=object),
             "h": pd.Series(dtype=np.int64),
             "v": pd.Series(dtype=np.int64)}
        )
        if not t.num_rows:  # empty upstream block: typed empty partial
            return empty
        h = url_hash64(key_fn(t))
        v = cents_fn(t)
        g = t.column(group_col).to_pandas()
        f = pd.DataFrame({"g": g, "h": h.view(np.int64), "v": v})
        out = []
        for gv, sub in f.groupby("g", sort=False):
            order = np.lexsort(
                (sub["v"].to_numpy(),
                 sub["h"].to_numpy().view(np.uint64))
            )[:k]
            out.append(sub.iloc[order])
        return pd.concat(out, ignore_index=True) if out else empty

    def fold(grp: pd.DataFrame) -> pd.DataFrame:
        order = np.lexsort(
            (grp["v"].to_numpy(), grp["h"].to_numpy().view(np.uint64))
        )[:k]
        s = np.sort(grp["v"].to_numpy()[order])
        return pd.DataFrame(
            {
                group_col: [grp["g"].iloc[0]] * len(ps),
                "p": np.asarray(ps, dtype=np.float64),
                "est_cents": np.asarray(
                    [int(s[int(np.floor(p * (len(s) - 1)))]) for p in ps],
                    dtype=np.int64,
                ),
            }
        )

    from .frames import co_group

    # co_group (per-GROUP, typed): fold takes whole-group state
    # (grp["g"].iloc[0], one quantile set per group) — not key-local
    return co_group(
        ds.map_batches(partial, batch_format="pyarrow"),
        "g", fold,
        pa.schema([(group_col, pa.string()), ("p", pa.float64()),
                   ("est_cents", pa.int64())]),
    )
