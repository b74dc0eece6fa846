"""Corpus-curation stages: benchmark decontamination and repetition-based
quality filtering (Gopher-style, Rae et al. 2021, arXiv:2112.11446 §A1.1).

Both are streaming map_batches passes over (doc_id, text):

- :func:`benchmark_ngram_set` / :class:`Decontaminator` — the standard
  eval-set decontamination pattern: the benchmark side's word n-grams are
  hashed once into a SMALL broadcast set (``ray.put`` once, read per
  actor), and every training document counts its n-gram positions that hit
  the set. The benchmark set is the small side by construction (eval sets
  are tiny next to a 100 TB corpus), so this is a broadcast membership
  test, never a shuffle.
- :class:`RepetitionFilter` — per-document repetition statistics computed
  fully vectorized (one exploded (doc, token-bigram) frame per batch, no
  per-document python loop): duplicate-line fraction, most-frequent-bigram
  fraction, symbol-character ratio, and the keep flag under documented
  thresholds.

Determinism contract (SQL pairing): tokens = ``\\s+`` split of
``text.strip()``; n-grams joined with a single space; hashes =
``urlnorm.hash64_one`` == DuckDB ``md5_number_upper``; fractions are
single IEEE double divisions of exact integers on both sides.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
import pyarrow as pa

import ray

from .. import re2pin
from ..urlnorm import url_hash64

# RE2-pinned whitespace/symbol classes (see re2pin): RE2's \s is exactly
# [ \t\n\f\r] — NO \v, NO NBSP (verified against DuckDB) — while python's
# unicode \s (and str.strip()) eats both. Pinning tokenizer, edge-strip AND
# the symbol class keeps engine and DuckDB equal on EVERY input.
_WS = re2pin.WS_RUN
_EDGE_WS = re2pin.EDGE_WS
# explicit ASCII symbol class == RE2's [^A-Za-z0-9\s] (underscore IS a
# symbol here, unlike re2pin.PUNCT's [^\w\s])
_SYMBOL = re.compile(rf"[^A-Za-z0-9{re2pin.WS}]")

# Gopher-inspired keep thresholds (arXiv:2112.11446 table A1; values
# adapted to the synthetic corpus so both branches are exercised)
DUP_LINE_FRAC_MAX = 0.30
TOP_BIGRAM_FRAC_MAX = 0.18
SYMBOL_RATIO_MAX = 0.10


def _token_frame(texts: pd.Series) -> tuple[np.ndarray, np.ndarray]:
    """(doc_index, token) exploded arrays for a batch — one vectorized
    split, no per-doc loop."""
    tok_lists = (texts.fillna("").str.replace(_EDGE_WS, "", regex=True)
                 .str.split(_WS))
    tok_lists = tok_lists.apply(lambda L: [] if L == [""] else L)
    counts = tok_lists.str.len().to_numpy()
    doc_idx = np.repeat(np.arange(len(texts)), counts)
    flat = np.asarray(
        [t for L in tok_lists for t in L], dtype=object
    )
    return doc_idx, flat


def _ngram_strings(doc_idx: np.ndarray, flat: np.ndarray, n: int
                   ) -> tuple[np.ndarray, np.ndarray]:
    """(doc_index, ngram-string) for every n-token window that stays inside
    one document — built from shifted views of the flat token array."""
    if len(flat) < n:
        return np.empty(0, dtype=np.int64), np.empty(0, dtype=object)
    valid = doc_idx[: len(doc_idx) - n + 1] == doc_idx[n - 1:]
    if not valid.any():
        return np.empty(0, dtype=np.int64), np.empty(0, dtype=object)
    starts = np.flatnonzero(valid)
    grams = pd.Series(flat[starts])
    for o in range(1, n):
        grams = grams + " " + pd.Series(flat[starts + o])
    return doc_idx[starts], grams.to_numpy()


def benchmark_ngram_set(ds, n: int = 8, id_mod: int = 37):
    """Hash set of every ``n``-gram of the benchmark slice (docs whose
    int id % ``id_mod`` == 0) — the SMALL side, collected once and
    broadcast. Returns (object_ref, n_benchmark_grams)."""
    def grams(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_pandas()
        mask = (ids.astype("int64") % id_mod) == 0
        texts = t.column("text").to_pandas()[mask.to_numpy()]
        if not len(texts):
            return pa.table({"h": pa.array([], type=pa.uint64())})
        di, flat = _token_frame(texts.reset_index(drop=True))
        _, g = _ngram_strings(di, flat, n)
        hs = url_hash64(list(g)) if len(g) else np.empty(0, dtype=np.uint64)
        return pa.table({"h": pa.array(np.unique(hs), type=pa.uint64())})

    rows = ds.map_batches(grams, batch_format="pyarrow").take_all()
    # np.unique returns SORTED hashes — consumers searchsorted directly
    hset = np.unique(np.asarray([r["h"] for r in rows], dtype=np.uint64))
    return ray.put(hset), int(len(hset))


def contamination_counts(texts: pd.Series, hset_sorted: np.ndarray, n: int
                         ) -> tuple[np.ndarray, np.ndarray]:
    """(n_grams, n_matched) per row — the decontamination kernel (shared
    by the actor stage and the fused curation pass)."""
    di, flat = _token_frame(texts.reset_index(drop=True))
    gi, grams = _ngram_strings(di, flat, n)
    n_grams = np.zeros(len(texts), dtype=np.int64)
    n_matched = np.zeros(len(texts), dtype=np.int64)
    if len(grams):
        np.add.at(n_grams, gi, 1)
        hs = url_hash64(list(grams))
        if len(hset_sorted):
            pos = np.searchsorted(hset_sorted, hs)
            pos[pos == len(hset_sorted)] = 0
            hit = hset_sorted[pos] == hs
            np.add.at(n_matched, gi[hit], 1)
    return n_grams, n_matched


class Decontaminator:
    """map_batches stage: count benchmark n-gram hits per document.

    ``hset_ref`` is the broadcast sorted hash array (``ray.put`` once; Ray
    caches the object per node, so it ships once per worker, not per
    batch). Output: (doc_id, n_grams, n_matched, contaminated).
    """

    def __init__(self, hset_ref, n: int = 8):
        self.hset = ray.get(hset_ref)  # sorted by construction (np.unique)
        self.n = n

    def __call__(self, t: pa.Table) -> pa.Table:
        n_grams, n_matched = contamination_counts(
            t.column("text").to_pandas(), self.hset, self.n
        )
        return pa.table(
            {
                "doc_id": t.column("doc_id"),
                "n_grams": pa.array(n_grams),
                "n_matched": pa.array(n_matched),
                "contaminated": pa.array(n_matched > 0),
            }
        )


def decontaminate(ds, n: int = 8, id_mod: int = 37):
    """documents Dataset → per-doc contamination table. The benchmark-gram
    build and the scan are two streaming passes; only the gram-hash set
    (small by construction) ever sits on the driver."""
    ref, _ = benchmark_ngram_set(ds, n=n, id_mod=id_mod)
    return ds.map_batches(
        Decontaminator, fn_constructor_args=(ref, n),
        batch_format="pyarrow", concurrency=(1, 8),
    )


def plant_repetition(df: pd.DataFrame) -> pd.DataFrame:
    """Deterministic gate-exercising augmentation (same pattern as the
    planted near-dup clones): the synthetic corpus is single-line,
    symbol-free prose, so every repetition stat would be degenerate-zero
    and the keep flag vacuous. Three deterministic id classes plant one
    failure mode each — line duplication (id%11), symbol runs (id%7),
    bigram loops (id%5) — all reconstructible in SQL string-for-string."""
    df = df.copy()
    ids = df["doc_id"].astype("int64")
    t = df["text"].fillna("")
    m11 = (ids % 11 == 0).to_numpy()
    m7 = (~m11) & (ids % 7 == 0).to_numpy()
    m5 = (~m11) & ~m7 & (ids % 5 == 0).to_numpy()
    out = t.copy()
    out[m11] = t[m11] + "\n" + t[m11] + "\n" + t[m11]
    out[m7] = t[m7] + " " + t[m7].str.len().floordiv(4).map(lambda k: "@" * k)
    if m5.any():
        toks = t[m5].str.replace(_EDGE_WS, "", regex=True).str.split(_WS)
        pair = toks.map(
            lambda L: (" " + L[0] + " " + L[1]) * 80 if len(L) >= 2 else ""
        )
        out[m5] = t[m5] + pair
    df["text"] = out
    return df


def plant_clones(df: pd.DataFrame) -> pd.DataFrame:
    """Deterministic exact-duplicate planting for the curation composite:
    docs with id % 13 == 0 collapse onto one of three sentinel texts
    (id % 3), so the exact-dedup leg has real duplicate groups to
    canonicalize (the raw corpus has none). Row-local (no cross-row
    lookup), so it stays a pure map; SQL rebuilds it string-for-string."""
    df = df.copy()
    ids = df["doc_id"].astype("int64")
    m = (ids % 13 == 0).to_numpy()
    if m.any():
        t = df["text"].copy()
        t[m] = "corpus clone sentinel " + (ids[m] % 3).astype(str)
        df["text"] = t
    return df


class RepetitionFilter:
    """map_batches stage: Gopher-style repetition/quality flags per doc.

    Output columns: doc_id, n_lines, dup_line_frac, top_bigram_frac,
    symbol_ratio, keep. All fractions are double divisions of exact
    integer counts (SQL-pairable bit-for-bit).
    """

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        texts = df["text"].fillna("")
        # duplicate-line fraction: 1 - distinct/total over newline splits
        lines = texts.str.split("\n")
        n_lines = lines.str.len().to_numpy(dtype=np.int64)
        n_distinct = lines.apply(lambda L: len(set(L))).to_numpy(np.int64)
        dup_frac = np.where(n_lines > 0, 1.0 - n_distinct / n_lines, 0.0)

        # top-bigram fraction: most frequent token bigram / bigram count,
        # one exploded frame per batch (no per-doc loop)
        di, flat = _token_frame(texts.reset_index(drop=True))
        gi, grams = _ngram_strings(di, flat, 2)
        n_bi = np.zeros(len(df), dtype=np.int64)
        top_bi = np.zeros(len(df), dtype=np.int64)
        if len(grams):
            np.add.at(n_bi, gi, 1)
            bf = pd.DataFrame({"d": gi, "g": grams})
            per = bf.groupby(["d", "g"], sort=False).size()
            mx = per.groupby(level=0).max()
            top_bi[mx.index.to_numpy()] = mx.to_numpy()
        top_frac = np.where(n_bi > 0, top_bi / np.maximum(n_bi, 1), 0.0)

        # symbol ratio over characters (ASCII-explicit class, see _SYMBOL)
        n_chars = texts.str.len().to_numpy(dtype=np.int64)
        n_sym = texts.str.count(_SYMBOL).to_numpy(dtype=np.int64)
        sym_ratio = np.where(n_chars > 0, n_sym / np.maximum(n_chars, 1), 0.0)

        keep = (
            (dup_frac <= DUP_LINE_FRAC_MAX)
            & (top_frac <= TOP_BIGRAM_FRAC_MAX)
            & (sym_ratio <= SYMBOL_RATIO_MAX)
        )
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"],
                "n_lines": n_lines,
                "dup_line_frac": dup_frac,
                "top_bigram_frac": top_frac,
                "symbol_ratio": sym_ratio,
                "keep": keep,
            }
        )


# ---------------------------------------------------------------------------
# Context-window chunking
# ---------------------------------------------------------------------------
CHUNK_SIZE = 200
CHUNK_STRIDE = 150  # 50-char overlap


def chunk_documents(ds, text_col: str = "text", id_col: str = "doc_id",
                    size: int = CHUNK_SIZE, stride: int = CHUNK_STRIDE):
    """Split each document into fixed-size overlapping code-point windows
    (LLM context-window prep). Map-only — no shuffle; chunk boundaries
    depend only on the row, so block layout is irrelevant.

    Vectorization shape: strings are sliced with the Arrow
    ``utf8_slice_codeunits`` kernel, which takes SCALAR offsets — so the
    loop is over chunk ordinals (bounded by ceil(max_len/stride), a few
    iterations), never over rows. Code-point slicing matches both
    python's ``s[a:b]`` and DuckDB's ``substring`` (verified), so the
    chunk text itself is SQL-paired. Empty/null docs emit no chunks."""
    import pyarrow.compute as pc

    def explode(t: pa.Table) -> pa.Table:
        txt = pc.fill_null(t.column(text_col), "")
        lens = pc.utf8_length(txt).to_numpy(zero_copy_only=False)
        ids = t.column(id_col).to_numpy(zero_copy_only=False)
        n_chunks = (lens + stride - 1) // stride  # 0 for empty docs
        max_k = int(n_chunks.max()) if len(n_chunks) else 0
        out_id, out_no, out_start, out_text = [], [], [], []
        for k in range(max_k):
            m = n_chunks > k
            idx = np.flatnonzero(m)
            sl = pc.utf8_slice_codeunits(
                pc.take(txt, pa.array(idx)),
                start=k * stride, stop=k * stride + size,
            )
            out_id.append(ids[idx])
            out_no.append(np.full(len(idx), k, dtype=np.int64))
            out_start.append(np.full(len(idx), k * stride, dtype=np.int64))
            out_text.append(sl)
        if not out_id:
            return pa.table(
                {id_col: pa.array([], type=pa.int64()),
                 "chunk_no": pa.array([], type=pa.int64()),
                 "start": pa.array([], type=pa.int64()),
                 "chunk": pa.array([], type=pa.string())}
            )
        chunk = pa.concat_arrays(
            [c.combine_chunks() if isinstance(c, pa.ChunkedArray) else c
             for c in out_text]
        )
        return pa.table(
            {
                id_col: pa.array(np.concatenate(out_id).astype(np.int64)),
                "chunk_no": pa.array(np.concatenate(out_no)),
                "start": pa.array(np.concatenate(out_start)),
                "chunk": chunk,
            }
        )

    return ds.map_batches(explode, batch_format="pyarrow")


PACK_BUDGET = 256  # chars per packed sequence


def pack_sequences(chunks, budget: int = PACK_BUDGET,
                   n_buckets: int | None = None):
    """Document-local sequence packing: assign each chunk (ordered by
    chunk_no within its doc) to a fixed-budget pack via the streaming
    rule pack_id = (prefix_chars - own_chars) // budget — i.e. a chunk
    starts a new pack when the running total crosses a budget boundary.
    Doc-local packing is the standard LLM-pretraining shape (no
    cross-document attention leakage), and it is embarrassingly parallel
    by doc: ONE hash-bucket shuffle co-locates each doc's chunks, and the
    whole bucket computes its prefix sums VECTORIZED (one sort + one
    grouped cumsum — the sessionize shape, O(buckets) python calls).
    All-integer arithmetic on non-negative values → DuckDB replays it
    with a window cumsum bit-exactly."""
    import pyarrow.compute as pc

    if n_buckets is None:
        n_buckets = 64

    def bucket(t: pa.Table) -> pa.Table:
        d = t.column("doc_id").to_numpy(zero_copy_only=False)
        return t.append_column(
            "b", pa.array((d % n_buckets).astype(np.int64))
        )

    def pack_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["doc_id", "chunk_no"], kind="mergesort")
        n = g["chunk"].str.len().to_numpy(dtype=np.int64)
        cum = (
            pd.Series(n)
            .groupby(g["doc_id"].to_numpy(), sort=False)
            .cumsum()
            .to_numpy(dtype=np.int64)
        )
        return pd.DataFrame(
            {
                "doc_id": g["doc_id"].to_numpy(dtype=np.int64),
                "chunk_no": g["chunk_no"].to_numpy(dtype=np.int64),
                "pack_id": (cum - n) // budget,
                "cum_chars": cum,
            }
        )

    return (
        chunks.map_batches(bucket, batch_format="pyarrow")
        .groupby("b")
        .map_groups(
            lambda g: pack_bucket(g.drop(columns=["b"])),
            batch_format="pandas",
        )
    )
