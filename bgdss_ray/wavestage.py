"""Combined per-wave stage: fetch + span-parse + link-extract in ONE pass.

One map_batches execution per wave does all the per-page work. In
shard-push mode (BFS hot path) the stage also explodes candidate links
and ships them hash-routed to the admission shard actors as one shared
plasma object per batch — the driver receives only per-batch count rows.
Spans accumulate as flat columns (one ListArray build per batch, no
per-span dicts); documents/crawl-log parquet shards are written
stage-side with idempotent names. Priority mode uses the same stage with
``shards=None`` and gets the candidate link lists back instead.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .config import CrawlConfig
from .fetch import FetchStage
from .parse import SpanParser
from .schemas import SPAN_STRUCT
from .synth import SynthWebConfig

LINK_STRUCT = pa.struct(
    [
        pa.field("url", pa.string()),
        pa.field("pos", pa.int32()),
        pa.field("url_hash", pa.uint64()),
        pa.field("host", pa.string()),
        pa.field("is_pdf", pa.bool_()),
        pa.field("blocked", pa.bool_()),
    ]
)

_STAGE_CACHE: dict = {}


class WaveStage:
    """frontier-wave batch → one row per page with log fields + links.

    All per-page work happens here in ONE Ray execution per wave: fetch,
    span parse, link extraction, AND the documents parquet write — each
    batch writes its span docs straight to ``docs_dir`` under a
    deterministic name (part-{first crawl_seq}.parquet), so a re-run of the
    same wave overwrites identical files (idempotent resume). The returned
    table carries only the small columns: log fields + links + has_doc —
    bodies and spans never leave the stage.
    """

    def __init__(self, web_cfg: SynthWebConfig, cfg: CrawlConfig,
                 docs_dir: str | None = None, log_dir: str | None = None,
                 shards: list | None = None):
        from .robots import RobotsIndex
        from .synth import SynthWeb

        self.fetcher = FetchStage(web_cfg, cfg)
        self.parser = SpanParser(cfg.min_pdf_bytes, cfg.pdf_magic)
        self.docs_dir = docs_dir
        self.log_dir = log_dir
        # admission shard actor handles: when set, candidate links are
        # pushed straight to the shards (hash-routed) and the stage returns
        # only per-batch counts — candidates never flow through the driver
        self.shards = shards
        # robots rules are a pure function of host (web.robots_body), so
        # every worker evaluates Disallow flags locally — the driver never
        # touches per-URL robots work
        self.robots = (
            RobotsIndex(SynthWeb(web_cfg).robots_body)
            if cfg.respect_robots else None
        )

    def __call__(self, batch: pa.Table) -> pa.Table:
        import time as _time

        from .urlnorm import canonicalize, url_hash64

        _t0 = _time.perf_counter()
        fetched = self.fetcher(batch)
        _t_fetch = _time.perf_counter()
        urls = fetched.column("url").to_pylist()
        kinds = fetched.column("kind").to_pylist()
        bodies = fetched.column("body").to_pylist()
        statuses = fetched.column("status").to_numpy(zero_copy_only=False)
        # COLUMNAR span + link accumulation: flat per-span columns with
        # per-doc offsets (one ListArray build per batch) instead of
        # per-span python dicts — the dict path was the stage's hottest
        # CPU (and memory-bandwidth) consumer at 1M+ pages/wave.
        sk: list[str] = []   # span kind
        stx: list[str] = []  # span text
        srf: list[str] = []  # span media_ref
        sof: list[int] = []  # span offset (match index, oracle parity)
        doc_ids: list[str] = []
        doc_offs: list[int] = [0]
        has_doc = np.zeros(len(urls), dtype=bool)
        # flat child-link arrays + per-row offsets → ListArray (so the
        # hash/host/kind computation is one vectorized pass per batch, not
        # per link — this work would otherwise be serial on the driver)
        flat_url: list[str] = []
        flat_pos: list[int] = []
        offsets: list[int] = [0]
        span_re = self.parser.span_re
        min_pdf = self.parser.min_pdf_bytes
        magic = self.parser.pdf_magic
        for ridx, (url, kind, body, status) in enumerate(
            zip(urls, kinds, bodies, statuses)
        ):
            if status != 200 or body is None:
                offsets.append(len(flat_url))
                continue
            if kind == "listing":
                html = body.decode("utf-8", errors="replace")
                link_i = 0
                for i, m in enumerate(span_re.finditer(html)):
                    if m.group(1) is not None:
                        sk.append("text")
                        stx.append(m.group(1))
                        srf.append("")
                        sof.append(i)
                    else:
                        href, title = m.group(2), m.group(3)
                        if not href or not title.strip():
                            continue  # reference skips empty href/text
                        ref = canonicalize(href, base=url)
                        sk.append("media")
                        stx.append(title)
                        srf.append(ref)
                        sof.append(i)
                        flat_url.append(ref)
                        flat_pos.append(link_i)
                        link_i += 1
                has_doc[ridx] = True
                doc_ids.append(url)
                doc_offs.append(len(sk))
            elif kind == "pdf":
                # PDF validity filter (portal_saude_mg.py:539-561)
                if len(body) >= min_pdf and body.startswith(magic):
                    text = body[9:].decode("utf-8", errors="replace")
                    paras = [p for p in text.split("\n\n") if p.strip()]
                    sk.extend(["text"] * len(paras))
                    stx.extend(paras)
                    srf.extend([""] * len(paras))
                    sof.extend(range(len(paras)))
                    has_doc[ridx] = True
                    doc_ids.append(url)
                    doc_offs.append(len(sk))
            offsets.append(len(flat_url))
        _t_parse = _time.perf_counter()
        if self.docs_dir is not None and doc_ids:
            span_struct = pa.StructArray.from_arrays(
                [
                    pa.array(sk, type=pa.string()),
                    pa.array(stx, type=pa.string()),
                    pa.array(srf, type=pa.string()),
                    pa.array(np.asarray(sof, dtype=np.int32)),
                ],
                fields=list(SPAN_STRUCT),
            )
            spans_arr = pa.ListArray.from_arrays(
                pa.array(np.asarray(doc_offs, dtype=np.int32)), span_struct
            )
            seq0 = int(fetched.column("crawl_seq")[0].as_py())
            self._write_docs(doc_ids, spans_arr, seq0)
        _t_write = _time.perf_counter()

        import pandas as pd

        from .frontier import robots_allowed_mask

        from .frontier import hosts_and_kinds

        hashes = url_hash64(flat_url)
        hosts, link_kinds = hosts_and_kinds(flat_url) if flat_url else ([], [])
        is_pdf = np.asarray([k == "pdf" for k in link_kinds], dtype=bool)
        if self.robots is not None and flat_url:
            blocked = ~robots_allowed_mask(
                pd.Series(flat_url), pd.Series(hosts), self.robots
            )
        else:
            blocked = np.zeros(len(flat_url), dtype=bool)
        out = fetched.drop_columns(["body"])
        if self.log_dir is not None:
            # crawl-log shard written here too (same idempotent naming);
            # the driver then only collects the slim control columns
            self._write_shard(self.log_dir, out, fetched)
            out = out.select(["crawl_seq", "depth", "status"])

        if self.shards is not None:
            # shard-push mode: exploded candidate rows go hash-routed to
            # the admission shard actors; only COUNTS return to the driver
            import ray as _ray

            from .admission import push_candidates_shared

            off = np.asarray(offsets, dtype=np.int64)
            counts = np.diff(off)
            seqs = fetched.column("crawl_seq").to_numpy(zero_copy_only=False)
            depths = fetched.column("depth").to_numpy(zero_copy_only=False)
            cand = pa.Table.from_arrays(
                [
                    pa.array(flat_url, type=pa.string()),
                    pa.array(np.repeat(seqs, counts)),
                    pa.array(np.asarray(flat_pos, dtype=np.int32)),
                    pa.array((np.repeat(depths, counts) + 1).astype(np.int32)),
                    pa.array(hashes, type=pa.uint64()),
                    pa.array(hosts, type=pa.string()),
                    pa.array(is_pdf),
                    pa.array(blocked),
                ],
                names=["url", "parent_rank", "link_pos", "depth", "url_hash",
                       "host", "is_pdf", "blocked"],
            )
            # block until delivered: the map task finishing is the driver's
            # signal that every candidate reached its shard (acks are tiny —
            # the data itself is one shared plasma object)
            _ray.get(push_candidates_shared(cand, self.shards))
            _t_push = _time.perf_counter()
            n_err = int((statuses != 200).sum())
            return pa.Table.from_arrays(
                [
                    pa.array([len(urls)], type=pa.int64()),
                    pa.array([int(has_doc.sum())], type=pa.int64()),
                    pa.array([n_err], type=pa.int64()),
                    pa.array([_t_fetch - _t0], type=pa.float64()),
                    pa.array([_t_parse - _t_fetch], type=pa.float64()),
                    pa.array([_t_write - _t_parse], type=pa.float64()),
                    pa.array([_t_push - _t_write], type=pa.float64()),
                ],
                names=["n_pages", "n_docs", "n_err",
                       "t_fetch", "t_parse", "t_write", "t_push"],
            )

        link_struct = pa.StructArray.from_arrays(
            [
                pa.array(flat_url, type=pa.string()),
                pa.array(np.asarray(flat_pos, dtype=np.int32)),
                pa.array(hashes, type=pa.uint64()),
                pa.array(hosts, type=pa.string()),
                pa.array(is_pdf),
                pa.array(blocked),
            ],
            fields=list(LINK_STRUCT),
        )
        links_arr = pa.ListArray.from_arrays(
            pa.array(np.asarray(offsets, dtype=np.int32)), link_struct
        )
        return out.append_column("has_doc", pa.array(has_doc)).append_column(
            "links", links_arr
        )

    def _write_docs(self, doc_ids: list[str], spans_arr, seq0: int) -> None:
        import pyarrow.parquet as pq

        docs = pa.Table.from_arrays(
            [pa.array(doc_ids, type=pa.string()), spans_arr],
            names=["doc_id", "spans"],
        )
        pq.write_table(docs, f"{self.docs_dir}/part-{seq0:012d}.parquet")

    def _write_shard(self, log_dir: str, out: pa.Table, fetched: pa.Table) -> None:
        import pyarrow.parquet as pq

        seq0 = int(fetched.column("crawl_seq")[0].as_py())
        pq.write_table(out, f"{log_dir}/part-{seq0:012d}.parquet")


def wave_stage_batch(batch: pa.Table, *, web_cfg, cfg, docs_dir=None,
                     log_dir=None, shards=None, run_token=None) -> pa.Table:
    """Stateless-task wrapper with per-worker stage cache.

    ``run_token`` is unique per crawl run: two runs over the same out dir
    reuse wave dir names, and a cached stage from the earlier run would
    silently push candidates to that run's (stale) admission shard actors.
    The cache key is per RUN, not per wave — docs_dir/log_dir change every
    wave and are set on the cached stage per call, so the heavy state
    (SynthWeb, RobotsIndex, compiled regexes) genuinely survives between
    waves. Stale runs' entries are evicted on first insert of a new run.
    """
    key = (web_cfg, cfg, run_token)
    st = _STAGE_CACHE.get(key)
    if st is None:
        for k in [k for k in _STAGE_CACHE if k[2] != run_token]:
            del _STAGE_CACHE[k]
        st = _STAGE_CACHE[key] = WaveStage(web_cfg, cfg, shards=shards)
    st.docs_dir = docs_dir
    st.log_dir = log_dir
    return st(batch)


def _cached_stage(web_cfg, cfg, shards, run_token) -> "WaveStage":
    key = (web_cfg, cfg, run_token)
    st = _STAGE_CACHE.get(key)
    if st is None:
        for k in [k for k in _STAGE_CACHE if k[2] != run_token]:
            del _STAGE_CACHE[k]
        st = _STAGE_CACHE[key] = WaveStage(web_cfg, cfg, shards=shards)
    return st


def _push_seed_candidates(st: "WaveStage", raw_urls: list[str],
                          seqs, shards) -> pa.Table:
    """Canonicalize + host/kind/robots/hash seed URLs on a WORKER and push
    the candidate rows hash-routed to the admission shards (one shared
    plasma object per batch), exactly like the wave stage pushes
    discovered links. Returns a single count row."""
    import pandas as pd
    import ray as _ray

    from .admission import push_candidates_shared
    from .frontier import hosts_and_kinds, robots_allowed_mask
    from .urlnorm import canonicalize, url_hash64

    urls = [canonicalize(u) for u in raw_urls]
    hosts, kinds = hosts_and_kinds(urls) if urls else ([], [])
    is_pdf = np.asarray([k == "pdf" for k in kinds], dtype=bool)
    if st.robots is not None and urls:
        blocked = ~robots_allowed_mask(pd.Series(urls), pd.Series(hosts),
                                       st.robots)
    else:
        blocked = np.zeros(len(urls), dtype=bool)
    cand = pa.Table.from_arrays(
        [
            pa.array(urls, type=pa.string()),
            pa.array(np.full(len(urls), -1, dtype=np.int64)),
            pa.array(np.asarray(seqs, dtype=np.int32)),
            pa.array(np.zeros(len(urls), dtype=np.int32)),
            pa.array(url_hash64(urls), type=pa.uint64()),
            pa.array(hosts, type=pa.string()),
            pa.array(is_pdf),
            pa.array(blocked),
        ],
        names=["url", "parent_rank", "link_pos", "depth", "url_hash",
               "host", "is_pdf", "blocked"],
    )
    _ray.get(push_candidates_shared(cand, shards))
    return pa.Table.from_arrays(
        [pa.array([len(urls)], type=pa.int64())], names=["n_seeds"]
    )


def seed_stage_batch(batch: pa.Table, *, web_cfg, cfg, shards,
                     run_token=None) -> pa.Table:
    """Distributed seed bootstrap over an explicit raw seed list: each
    batch carries (url, seq) rows. Replaces the O(seeds) driver python of
    ``seeds_to_candidates`` for large seed lists — at 10^10-frontier scale
    a seed list is itself corpus-sized. Reuses the per-worker stage cache
    so the RobotsIndex built here survives into wave 0."""
    st = _cached_stage(web_cfg, cfg, shards, run_token)
    return _push_seed_candidates(
        st,
        batch.column("url").to_pylist(),
        batch.column("seq").to_numpy(zero_copy_only=False),
        shards,
    )


def seed_gen_stage_batch(batch: pa.Table, *, web_cfg, cfg, shards,
                         run_token=None) -> pa.Table:
    """Distributed seed GENERATION: each batch carries (host_lo, host_hi)
    spec rows; the worker synthesizes its host range's seed rows
    (capacity-spaced seqs — see SynthWeb.seeds_for_hosts — so no global
    prefix sum is needed) and pushes them like seed_stage_batch. The seed
    list never exists on the driver at all."""
    st = _cached_stage(web_cfg, cfg, shards, run_token)
    web = st.fetcher.web
    rows: list[dict] = []
    for lo, hi in zip(
        batch.column("host_lo").to_pylist(), batch.column("host_hi").to_pylist()
    ):
        rows.extend(web.seeds_for_hosts(lo, hi))
    return _push_seed_candidates(
        st,
        [r["url"] for r in rows],
        np.asarray([r["seq"] for r in rows], dtype=np.int64),
        shards,
    )


def explode_links(table: pa.Table) -> pa.Table:
    """Collected (crawl_seq, depth, links) columns → candidate rows
    (url, title, depth, parent_rank, link_pos). Fully vectorized with Arrow
    list kernels (list_parent_indices + flatten) — no Python loop."""
    import pyarrow.compute as pc

    links = table.column("links")
    if isinstance(links, pa.ChunkedArray):
        links = links.combine_chunks()
    parent_idx = pc.list_parent_indices(links)
    flat = pc.list_flatten(links)
    ranks = pc.take(table.column("crawl_seq"), parent_idx)
    depths = pc.add(pc.take(table.column("depth"), parent_idx), 1).cast(pa.int32())
    return pa.Table.from_arrays(
        [
            pc.struct_field(flat, "url"),
            ranks.cast(pa.int64()),
            pc.struct_field(flat, "pos").cast(pa.int32()),
            depths,
            pc.struct_field(flat, "url_hash"),
            pc.struct_field(flat, "host"),
            pc.struct_field(flat, "is_pdf"),
            pc.struct_field(flat, "blocked"),
        ],
        names=["url", "parent_rank", "link_pos", "depth",
               "url_hash", "host", "is_pdf", "blocked"],
    )
