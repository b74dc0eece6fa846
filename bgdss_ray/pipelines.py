"""Named end-to-end pipelines: the flagship crawl→extract flow plus the
non-SQL-expressible operators exposed through ``__ray_entry__.queries()``
(driver records rows-only checks for these; pytest covers their semantics
against pure-python oracles).
"""

from __future__ import annotations

import os
import shutil
import tempfile

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd

from .checkpoint import CrawlCheckpoint
from .config import CrawlConfig
from .extract import extract_resolutions
from .parse import spanify_flat_documents
from .pipeline import crawl
from .synth import SynthWebConfig

# Fixed small-but-nontrivial crawl web for driver-run pipelines (~500 pages).
DRIVER_WEB = SynthWebConfig(seed=42, n_hosts=10, years=(2022, 2023), months=(1, 2, 3))
DRIVER_CFG = CrawlConfig(max_depth=3, fetch_concurrency=4)

# bump when checkpoint layout/schema changes so stale /tmp caches from an
# older code version are never reused
_CACHE_VERSION = "v4"  # v4: url/content hashes switched to md5 (SQL-pairable)


def _crawl_dir() -> str:
    """Run (or reuse this process's) driver crawl under /tmp."""
    out = os.path.join(tempfile.gettempdir(), f"bgdss_driver_crawl_{_CACHE_VERSION}")
    ck = CrawlCheckpoint(out)
    m = ck.load_manifest()
    if m is None:
        shutil.rmtree(out, ignore_errors=True)
        crawl(DRIVER_WEB, out, DRIVER_CFG)
    return out


def crawl_log_pipeline(sf_dir: str):
    """Full synthetic-web crawl; returns the deterministic crawl log."""
    out = _crawl_dir()
    return CrawlCheckpoint(out).read_all("crawl_log").sort_by("crawl_seq")


def crawl_documents_pipeline(sf_dir: str):
    """Interleaved span documents emitted by the crawl (input_hint schema)."""
    out = _crawl_dir()
    return CrawlCheckpoint(out).read_all("documents")


def crawl_metrics_pipeline(sf_dir: str):
    """Per-wave frontier/fetch metrics table."""
    out = _crawl_dir()
    return CrawlCheckpoint(out).read_all("metrics")


def resolutions_pipeline(sf_dir: str):
    """Crawl documents → deterministic 7-field extraction → 9-col table."""
    docs = crawl_documents_pipeline(sf_dir)
    pdfs = docs.filter(pc.ends_with(docs.column("doc_id"), ".pdf"))
    return extract_resolutions(rd.from_arrow(pdfs))


def spanify_pipeline(sf_dir: str):
    """Flat testdata documents → interleaved-span DOCUMENTS rows."""
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return ds.map_batches(spanify_flat_documents, batch_format="pyarrow")


def flagship(sf_dir: str):
    """entry() pipeline: testdata docs → spans → extraction → quality.

    One streaming pass: spanify (input_hint schema) → 7-field extractor →
    token/quality stats joined on, returning the enriched resolutions table.
    """
    from .ops.textstats import QualityScorer

    spans = spanify_pipeline(sf_dir)
    res = extract_resolutions(spans)
    docs = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    scored = docs.map_batches(QualityScorer(), batch_format="pandas")

    def slim(df: pd.DataFrame) -> pa.Table:
        return pa.Table.from_pandas(
            pd.DataFrame(
                {
                    "doc_id": df["doc_id"].astype(str),
                    "n_words": df["n_words"].astype("int64"),
                    "quality_score": df["quality_score"].astype(float),
                }
            ),
            preserve_index=False,
        )

    # co-keyed one-to-one enrich: a real hash-partitioned Dataset.join on
    # doc_id — neither side is ever collected to the driver; fan-out
    # derives from the corpus row count (the tfidf rule), not a constant
    from .ops.joins import derived_partitions

    joined = res.join(
        scored.map_batches(slim, batch_format="pandas"),
        join_type="left_outer",
        num_partitions=derived_partitions(docs.count()),
        on=("doc_id",),
    )

    def fill(df: pd.DataFrame) -> pd.DataFrame:
        df["n_words"] = df["n_words"].fillna(0).astype("int64")
        df["quality_score"] = df["quality_score"].fillna(0.0).astype(float)
        return df

    return joined.map_batches(fill, batch_format="pandas")


def _llm_fake_transport_factory():
    """Deterministic 'perfect model' transport: applies the rule-based
    field contract to the prompt text and replies with markdown-wrapped
    JSON — exercises the full LLM actor path (rate limiter, retry shell,
    JSON-from-markdown parse) with a stable, checkable answer. A real
    deployment injects an HTTP transport here instead."""
    import json as _json

    from .extract import extract_one

    def transport(messages):
        text = messages[-1]["content"]
        paras = [p for p in text.split("\n\n") if p.strip()]
        return "```json\n" + _json.dumps(
            extract_one(text, paras), ensure_ascii=False
        ) + "\n```"

    return transport


def llm_extract_pipeline(sf_dir: str):
    """Spanified docs → LLM extraction ACTOR pool (client + sliding-window
    limiter per actor, llm.py) with the deterministic fake transport —
    the reference's AI extraction flow (openai_client.py + pdf_call.py)
    as a Ray actor-pool stage."""
    from .llm import SlidingWindowRateLimiter, extract_resolutions_llm

    spans = spanify_pipeline(sf_dir)
    return extract_resolutions_llm(
        spans, _llm_fake_transport_factory, batch_size=128, concurrency=2,
        # offline fake transport: the reference's 50/60 s window would
        # sleep for real — uncap it (the limiter path itself is unit-tested
        # on a virtual clock in tests/test_llm.py)
        limiter=SlidingWindowRateLimiter(max_calls=1_000_000_000),
    )


# ----------------------------------------------------- non-SQL operators
def dedup_minhash_pipeline(sf_dir: str):
    from .ops.dedup import near_dedup_minhash

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return near_dedup_minhash(ds, threshold=0.8)


def dedup_simhash_pipeline(sf_dir: str):
    from .ops.dedup import simhash_candidates

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return simhash_candidates(ds, max_hamming=3)


def dedup_ngram_jaccard_pipeline(sf_dir: str):
    """Exact n-gram-Jaccard near-dup pairs: candidates from the RARE-shingle
    inverted index (no minhash approximation; shingle sampling auto-derived
    from corpus size), then exact Jaccard verify distributed via the
    co-group stage — texts never reach the driver."""
    from .ops.dedup import (
        ngram_inverted_candidates_ds,
        verify_jaccard_pairs_ds,
    )

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    cand = ngram_inverted_candidates_ds(ds, max_df=5)
    if cand is None:
        return pd.DataFrame({"id_a": [], "id_b": [], "jaccard": []})
    out = verify_jaccard_pairs_ds(cand, ds, "doc_id", threshold=0.7).to_pandas()
    if out.empty:
        return pd.DataFrame({"id_a": [], "id_b": [], "jaccard": []})
    out["jaccard"] = out["jaccard"].round(6)
    return out.sort_values(["id_a", "id_b"]).reset_index(drop=True)


def dedup_embedding_pipeline(sf_dir: str):
    """Embedding near-dup over testdata vectors + deterministically planted
    clones (vec_id+1_000_000): the testdata embeddings alone contain no
    pairs at 0.98, which would make this gate vacuous — planting
    guarantees a nonzero, checkable answer. The perturbation is plain
    arithmetic (per-element relative factor 1 + 0.003*(((vid*31+j*17) mod
    13) - 6), cast to float32 exactly like the stored column) so the
    DuckDB oracle reconstructs the identical clone vectors and checks the
    LSH+verify output against brute-force all-pairs cosine."""
    from .ops.dedup import embedding_neardup_pairs

    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet")

    def plant(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        sub = t.filter(pc.less(t["vec_id"], 20))
        if sub.num_rows == 0:
            return t.select(["vec_id", "embedding"])
        ids = sub.column("vec_id").to_numpy(zero_copy_only=False)
        vecs = np.asarray(sub.column("embedding").to_pylist(), dtype=np.float64)
        j = np.arange(vecs.shape[1], dtype=np.int64)
        u = ((ids[:, None] * 31 + j[None, :] * 17) % 13) - 6
        clones = vecs * (1.0 + 0.003 * u)
        clone_t = pa.table(
            {
                "vec_id": pa.array(ids + 1_000_000, type=t.schema.field("vec_id").type),
                "embedding": pa.array(list(clones), type=t.schema.field("embedding").type),
            }
        )
        return pa.concat_tables([t.select(["vec_id", "embedding"]), clone_t])

    planted = ds.map_batches(plant, batch_format="pyarrow")
    out = embedding_neardup_pairs(planted, threshold=0.98)
    if not out.empty:
        out["cosine"] = out["cosine"].round(6)
    out["id_a"] = out["id_a"].astype("int64")
    out["id_b"] = out["id_b"].astype("int64")
    return out


def ann_lsh_pipeline(sf_dir: str):
    """Multi-table hyperplane-LSH ANN gate, SQL-paired: the gate runs the
    integer-arithmetic plane tensor (``oracle_planes``) with exact-quantized
    sign bits (floor(x*2^20) int64 dots), so the DuckDB oracle regenerates
    the same planes, keys, 1-bit probe sets, candidate union and double
    cosine ranking bit-for-bit — the *approximation itself* is verified,
    not just its recall. The default gaussian-seeded mode (and its recall
    vs brute force) stays covered by tests/test_ops_similarity.py."""
    from .ops.similarity import oracle_planes, lsh_topk

    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet")
    qdf = ds.map_batches(
        lambda t: t.filter(pc.less(t["vec_id"], 5)), batch_format="pyarrow"
    ).to_pandas()
    qmat = np.asarray(qdf["embedding"].tolist(), dtype=np.float64)
    planes = oracle_planes(8, qmat.shape[1], 8)
    out = lsh_topk(ds, qdf["vec_id"].to_numpy(), qmat, k=10, planes=planes)
    out = out[["query_id", "id", "score"]].copy()
    out["query_id"] = out["query_id"].astype("int64")
    out["id"] = out["id"].astype("int64")
    out["score"] = out["score"].round(6)
    return out.reset_index(drop=True)


def ann_ivf_pipeline(sf_dir: str):
    """IVF-flat ANN gate, SQL-paired: integer coarse quantizer
    (``oracle_centroids``) + exact-quantized argmax assignment and probe
    selection, so DuckDB recomputes assignment/probing bit-exactly and
    re-ranks candidates with first-principles double cosine."""
    from .ops.similarity import oracle_centroids, ivf_topk

    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet")
    qdf = ds.map_batches(
        lambda t: t.filter(pc.less(t["vec_id"], 5)), batch_format="pyarrow"
    ).to_pandas()
    qmat = np.asarray(qdf["embedding"].tolist(), dtype=np.float64)
    cents = oracle_centroids(16, qmat.shape[1])
    out = ivf_topk(ds, qdf["vec_id"].to_numpy(), qmat, k=10, n_probe=8, cents=cents)
    out = out[["query_id", "id", "score"]].copy()
    out["query_id"] = out["query_id"].astype("int64")
    out["id"] = out["id"].astype("int64")
    out["score"] = out["score"].round(6)
    return out.reset_index(drop=True)


def _prio_dir() -> str:
    """Run (or reuse this process's) driver priority crawl under /tmp —
    the single source of the cache path (cf. _crawl_dir)."""
    from .pipeline import crawl_priority

    out = os.path.join(tempfile.gettempdir(), f"bgdss_driver_prio_{_CACHE_VERSION}")
    ck = CrawlCheckpoint(out)
    if ck.load_manifest() is None:
        shutil.rmtree(out, ignore_errors=True)
        crawl_priority(DRIVER_WEB, out, DRIVER_CFG, wave_cap=200, per_host_cap=25)
    return out


def crawl_priority_pipeline(sf_dir: str):
    """Priority-frontier crawl (north-star mode) on a small corpus."""
    return CrawlCheckpoint(_prio_dir()).read_all("crawl_log").sort_by("crawl_seq")


def crawl_priority_metrics_pipeline(sf_dir: str):
    """Priority-mode per-wave metrics table (runs/reuses the cached
    priority crawl)."""
    return CrawlCheckpoint(_prio_dir()).read_all("metrics")


def lang_quality_pipeline(sf_dir: str):
    from .ops.textstats import LangId, QualityScorer

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    out = ds.map_batches(LangId(), batch_format="pandas").map_batches(
        QualityScorer(), batch_format="pandas"
    )
    return out.map_batches(
        lambda df: df[["doc_id", "lang_pred", "n_words", "quality_score"]],
        batch_format="pandas",
    )


def fingerprint_pipeline(sf_dir: str):
    from .ops.textstats import Fingerprinter

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    out = ds.map_batches(Fingerprinter(), batch_format="pyarrow")
    return out.map_batches(
        lambda t: pa.table(
            {
                "doc_id": t["doc_id"],
                "n_fingerprints": pc.list_value_length(t["fingerprints"]).cast(pa.int64()),
                "doc_sig": t["doc_sig"],
            }
        ),
        batch_format="pyarrow",
    )


def multimodal_pipeline(sf_dir: str):
    """Synth media derived from testdata doc_ids → actor-pool decode.

    Ids come from an order-independent predicate (doc_id < 200, not
    ``limit``) and the output flattens the media_meta struct + 16-dim
    feature list into scalar columns, so the whole gate pairs against a
    DuckDB oracle that re-derives payloads and features from md5."""
    from .ops.multimodal import decode_media, synth_media_table

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id"])
    picked = ds.map_batches(
        lambda t: t.filter(pc.less(t["doc_id"], 200)), batch_format="pyarrow"
    ).to_pandas()
    ids = sorted(f"doc-{i}" for i in picked["doc_id"])
    media = rd.from_arrow(synth_media_table(ids))
    out = decode_media(media, concurrency=2, batch_size=32)

    def flatten(t: pa.Table) -> pa.Table:
        meta = t.column("media_meta")
        feat = np.asarray(t.column("feat").to_pylist(), dtype=np.float64)
        cols = {
            "media_id": t.column("media_id"),
            "mime": pc.struct_field(meta, "mime"),
            "width": pc.struct_field(meta, "width").cast(pa.int64()),
            "height": pc.struct_field(meta, "height").cast(pa.int64()),
            "duration_ms": pc.struct_field(meta, "duration_ms").cast(pa.int64()),
            "n_frames": pc.struct_field(meta, "n_frames").cast(pa.int64()),
            "decoded_ok": t.column("decoded_ok"),
        }
        for j in range(feat.shape[1] if len(feat) else 16):
            cols[f"feat_{j:02d}"] = pa.array(feat[:, j])
        return pa.table(cols)

    return out.map_batches(flatten, batch_format="pyarrow")


def hll_distinct_pipeline(sf_dir: str):
    """HyperLogLog distinct-count sketch over representative columns, with
    the exact distributed distinct count + relative error alongside (the
    production self-check; ops/sketches.py)."""
    from .ops.sketches import hll_distinct_report

    return hll_distinct_report(
        sf_dir,
        [("events", "user_id"), ("orders", "o_custkey"),
         ("documents", "text"), ("lineitem", "l_orderkey")],
    )


def mds_csv_pipeline(sf_dir: str):
    """Deterministic MDS-style CSV payloads → fallback-ladder parse."""
    from .csvio import read_mds_csv

    payloads, ids = [], []
    for i in range(20):
        sep = ";" if i % 3 else ","
        rows = "\n".join(
            f"Município {j}{sep}MG{sep}2023{sep}{1 + j % 12}{sep}R$ {j},00{sep}c{j}{sep}R$ {j * 2},50"
            for j in range(i + 1)
        )
        head = f"municipio{sep}uf{sep}ano{sep}mes{sep}parcela{sep}conta{sep}saldo"
        payloads.append(f"Relatório exportado\n{head}\n{rows}\n".encode("latin-1"))
        ids.append(f"csv-{i:02d}")
    t = pa.table(
        {"csv_id": pa.array(ids, type=pa.string()),
         "payload": pa.array(payloads, type=pa.binary())}
    )
    return read_mds_csv(rd.from_arrow(t))
