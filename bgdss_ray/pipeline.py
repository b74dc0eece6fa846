"""The crawl pipelines: BFS (reference parity) and priority-frontier modes.

BFS = the queue model. Each wave is ONE Ray Data execution:

    from_arrow(wave slices) → map_batches(wave_stage tasks)
        # fetch + span-parse + link-extract + documents/crawl-log parquet
        # writes all inside the stage; exploded candidate links are pushed
        # hash-routed (url_hash % K) to K admission shard actors as ONE
        # shared plasma object per batch — bodies, spans, and candidates
        # never reach the driver; only per-batch count rows come back

After the map, every admission shard — in parallel — dedups its
candidates first-occurrence-wins by order key (shard-local dedup IS global
because equal hashes co-shard), applies the depth/robots gates (flags
precomputed in the stage), marks new hashes seen (enqueue semantics,
oracle parity), and returns its admitted slice sorted by order key. The
driver merges the K sorted slices into its FIFO queue of admitted rows,
assigns ranks (arange) and politeness vtimes (sharded per-host folds,
coded payloads), and fetches the queue head under the page budget next
wave — so crawl order, seen set, and virtual schedule match the
sequential oracles exactly at any parallelism, with zero O(candidates)
driver work.

Per-wave outputs are checkpointed (documents/, crawl_log/, seen/, metrics/,
frontier_next/ = the queue) with idempotent shard filenames and an atomic
manifest commit per wave: a killed run resumes from the last committed
wave — stale partial files from the crashed wave are cleared
deterministically (tests/test_crawl.py).

Scale notes: the wave table and the admitted queue are the bounded units;
fetched bodies never accumulate — they stream through parse into parquet
within the wave. Driver-held state is the queue + O(hosts) politeness
fold state (the priority-mode backlog checkpoints to parquet each wave).
"""

from __future__ import annotations

import os
import time
from dataclasses import dataclass
from functools import partial

import numpy as np
import pyarrow as pa

import ray.data as rd

from .checkpoint import CrawlCheckpoint
from .config import CrawlConfig, DEFAULT_CRAWL
from .frontier import (
    dedup_candidates,
    dedup_candidates_grouped,
    seeds_to_candidates,
)
from .politeness import ShardedPoliteness
from .seen import ShardedSeenSet
from .synth import SynthWeb, SynthWebConfig
from .wavestage import WaveStage, explode_links, wave_stage_batch

# Above this many candidate rows, in-wave dedup goes through the
# distributed groupby path instead of driver numpy. The numpy path
# handles ~1e6 rows in ~0.3 s and tens of millions comfortably; the
# groupby shuffle only wins when the candidate set exceeds driver
# memory (true 10^9-link waves), so the crossover sits far above any
# sandbox wave. Parity between both paths is tested either way.
DISTRIBUTED_DEDUP_THRESHOLD = 50_000_000

# Waves at least this large use the FetchStage actor pool (startup amortized);
# smaller waves run as stateless tasks with per-worker stage caches.
ACTOR_POOL_WAVE_THRESHOLD = 20_000

# Seed lists at least this large bootstrap distributed (canonicalize + hash +
# robots on workers, pushed straight to the admission shards); smaller lists
# stay on the driver — one Ray execution costs more than the python.
SEED_DISTRIBUTED_THRESHOLD = 20_000

# Priority-mode backlogs above this row count stop living on the driver:
# the backlog becomes ONLY its checkpointed parquet partition, selection
# runs as per-host heads in groupby(host).map_groups, and the driver holds
# O(hosts x cap) heads + O(wave) selected rows. Sticky once entered.
PRIORITY_DISTRIBUTED_THRESHOLD = 2_000_000

CRAWL_LOG_COLUMNS = ["url", "url_hash", "host", "depth", "status", "attempts",
                     "content_len", "kind", "crawl_seq", "vtime"]


@dataclass
class CrawlRunResult:
    out_dir: str
    waves: int
    pages_fetched: int
    seen_size: int
    docs_emitted: int
    wall_s: float


def _ds_to_table(ds) -> pa.Table:
    parts = [b for b in ds.iter_batches(batch_size=None, batch_format="pyarrow")]
    if not parts:
        return None
    return pa.concat_tables(parts)


def crawl(
    web_cfg: SynthWebConfig,
    out_dir: str,
    cfg: CrawlConfig = DEFAULT_CRAWL,
    seeds: list[dict] | None = None,
    seen_mode: str = "exact",
    use_seen_actors: bool = False,
    resume: bool = False,
    fetch_concurrency: int | None = None,
    use_politeness_actors: bool = True,
) -> CrawlRunResult:
    """Run (or resume) the crawl to frontier exhaustion or cfg.max_pages.

    BFS hot path = the queue model: the driver holds a FIFO queue of
    ADMITTED (already seen-marked, oracle "enqueued") rows sorted by order
    key; each wave fetches the queue head under the page budget, the wave
    stage pushes discovered candidates hash-routed to K admission shard
    actors, and the shards — in parallel — dedup, gate, seen-mark, and
    return their admitted slices, which the driver merges back into the
    queue. O(candidate) work never touches the driver; ``use_seen_actors``
    is accepted for compatibility (admission shards ARE actors).
    """
    from .admission import ShardedAdmission
    from .robots import RobotsIndex

    t0 = time.perf_counter()
    web = SynthWeb(web_cfg)
    robots = RobotsIndex(web.robots_body) if cfg.respect_robots else None
    ckpt = CrawlCheckpoint(out_dir)
    adm = ShardedAdmission(cfg.seen_shards, seen_mode, cfg.max_depth)
    run_token = os.urandom(8).hex()  # isolates per-worker stage caches
    sched = ShardedPoliteness(
        cfg.politeness, n_shards=cfg.seen_shards, use_actors=use_politeness_actors
    )
    next_rank = 0
    pages_fetched = 0
    docs_emitted = 0
    wave_no = 0
    concurrency = fetch_concurrency or cfg.fetch_concurrency
    pending_hashes = np.empty(0, dtype=np.uint64)  # seed marks → delta 0

    manifest = ckpt.load_manifest() if resume else None
    if manifest is not None:
        wave_no = manifest["completed_wave"] + 1
        next_rank = manifest["next_rank"]
        pages_fetched = manifest["pages_fetched"]
        sched.load_state(manifest["host_state"])
        seen_hashes = ckpt.load_seen_upto(manifest["completed_wave"])
        if len(seen_hashes):
            adm.load_seen(seen_hashes)
        queue = ckpt.load_frontier_next(manifest["completed_wave"])
    else:
        os.makedirs(out_dir, exist_ok=True)
        est_seeds = (
            len(seeds) if seeds is not None
            else len(web.hosts) * web.seed_capacity_per_host // 2
        )
        if seeds is None and est_seeds >= SEED_DISTRIBUTED_THRESHOLD and (
            len(web.hosts) * web.seed_capacity_per_host < 2**31
        ):
            # distributed seed GENERATION: workers synthesize their host
            # range (capacity-spaced seqs — same okey ordering, no global
            # prefix sum), canonicalize/hash/robots, and push straight to
            # the admission shards — the seed list never exists on the
            # driver (at 10^10-frontier scale it is itself corpus-sized)
            from .wavestage import seed_gen_stage_batch

            _run_seed_stage(
                _host_range_spec(len(web.hosts), concurrency),
                seed_gen_stage_batch, web_cfg, cfg, adm, run_token,
                concurrency,
            )
        elif seeds is not None and len(seeds) >= SEED_DISTRIBUTED_THRESHOLD:
            # explicit large seed list: ship (url, seq) slices to workers
            # for canonicalize/hash/robots + shard push
            from .wavestage import seed_stage_batch

            raw = pa.table(
                {
                    "url": [r["url"] for r in seeds],
                    "seq": np.asarray([r["seq"] for r in seeds],
                                      dtype=np.int32),
                }
            )
            _run_seed_stage(raw, seed_stage_batch, web_cfg, cfg, adm,
                            run_token, concurrency)
        else:
            seed_rows = seeds if seeds is not None else web.seeds()
            cand = seeds_to_candidates(seed_rows, robots=robots)
            adm.route_add(cand)
        queue, pending_hashes, _ = adm.admit_all()

    profile = bool(os.environ.get("BGDSS_PROFILE"))
    if profile:
        print(f"[bootstrap] {time.perf_counter() - t0:.2f}", flush=True)

    import threading

    class _DumpedState:
        """Frozen politeness snapshot for a deferred commit (dump_state is
        taken on the driver BEFORE the next wave mutates the scheduler)."""

        def __init__(self, d: dict):
            self._d = d

        def dump_state(self) -> dict:
            return self._d

    # wave k's checkpoint writes + manifest commit run in this thread while
    # the driver schedules and executes wave k+1 — the atomic-commit story
    # is unchanged (seen/frontier/metrics land before the manifest write,
    # commits stay strictly ordered because each wave joins its
    # predecessor's thread before starting its own), and errors re-raise on
    # join so a failed write is never committed over.
    pending_wr: threading.Thread | None = None
    pending_err: list[BaseException] = []

    def _join_pending():
        nonlocal pending_wr
        if pending_wr is not None:
            pending_wr.join()
            pending_wr = None
            if pending_err:
                raise pending_err[0]

    while queue is not None and queue.num_rows > 0:
        budget_left = cfg.max_pages - pages_fetched
        if budget_left <= 0:
            break
        wt0 = time.perf_counter()
        n_wave = min(queue.num_rows, budget_left)
        sel = queue.slice(0, n_wave)
        rest = queue.slice(n_wave)

        host_col = sel.column("host")
        kinds_np = sel.column("is_pdf").to_numpy(zero_copy_only=False)
        delays = None
        if robots is not None:
            delays = {
                h: robots.crawl_delay(h)
                for h in pa.compute.unique(host_col).to_pylist()
                if robots.crawl_delay(h) is not None
            }
        vtimes = sched.assign(host_col, kinds_np, delays)
        wave = pa.Table.from_arrays(
            [
                sel.column("url"),
                sel.column("url_hash").cast(pa.uint64()),
                sel.column("host"),
                sel.column("depth").cast(pa.int32()),
                pa.array(np.arange(next_rank, next_rank + n_wave, dtype=np.int64)),
                pa.array(vtimes),
            ],
            names=["url", "url_hash", "host", "depth", "crawl_seq", "vtime"],
        )
        next_rank += n_wave
        t_adm = time.perf_counter()

        n_docs, n_err, _ = _execute_wave(
            wave, web_cfg, cfg, concurrency, ckpt, wave_no, profile, wt0,
            shards=adm.handles(), run_token=run_token,
        )
        pages_fetched += n_wave
        docs_emitted += n_docs

        t_a0 = time.perf_counter()
        admitted, new_hashes, n_cand = adm.admit_all()
        if rest.num_rows:
            # oracle FIFO: budget carry-over precedes newly discovered rows
            # (its okeys are strictly smaller — earlier parents)
            queue = (
                pa.concat_tables([rest, admitted]).combine_chunks()
                if admitted.num_rows else rest
            )
        else:
            queue = admitted
        if profile:
            print(f"[admit wave {wave_no}] n_cand={n_cand} "
                  f"admitted={admitted.num_rows} "
                  f"admit={time.perf_counter() - t_a0:.2f} "
                  f"sched={t_adm - wt0:.2f}", flush=True)

        # --- checkpoint -----------------------------------------------
        # join + error-check the PREVIOUS wave's writes (its commit has
        # then landed), snapshot this wave's politeness state, and hand
        # this wave's writes + commit to the background thread — they
        # overlap wave k+1's scheduling and map execution.
        delta = (
            np.concatenate([pending_hashes, new_hashes])
            if len(pending_hashes) else new_hashes
        )
        pending_hashes = np.empty(0, dtype=np.uint64)
        wall = time.perf_counter() - wt0
        t_m = time.perf_counter()
        _join_pending()
        t_j = time.perf_counter()
        sched_snap = _DumpedState(sched.dump_state())

        def _writes(w=wave_no, nh=delta, q=queue, nr=next_rank,
                    pf=pages_fetched, ss=sched_snap, nw=n_wave, ne=n_err,
                    nd=n_docs, nnew=len(new_hashes), ncand=n_cand,
                    wl=wall):
            try:
                ckpt.write_seen_delta(w, nh)
                if q.num_rows:
                    ckpt.write_frontier_next(w, q)
                _write_metrics(
                    ckpt, w, nw, ne, nd,
                    n_new=nnew,
                    n_rejected=max(0, ncand - nnew),
                    wall=wl,
                )
                # a failed write above raises BEFORE this commit — resume
                # can never observe a manifest ahead of its data
                ckpt.commit_wave(w, nr, pf, ss)
            except BaseException as e:  # re-raised at the next join
                pending_err.append(e)

        pending_wr = threading.Thread(target=_writes)
        pending_wr.start()
        if profile:
            print(f"[ckpt wave {wave_no}] prev_join={t_j - t_m:.2f} "
                  f"snap={time.perf_counter() - t_j:.2f}", flush=True)
        wave_no += 1

    _join_pending()
    res = _finish(ckpt, out_dir, wave_no, pages_fetched, adm, docs_emitted, t0)
    if profile:
        print(f"[finish] {res.wall_s:.2f} total", flush=True)
    return res


def _host_range_spec(n_hosts: int, concurrency: int) -> pa.Table:
    """(host_lo, host_hi) spec rows — one per generation task, ~2x the
    fetch concurrency for load balance."""
    n_tasks = max(1, min(concurrency * 2, n_hosts))
    bounds = np.linspace(0, n_hosts, n_tasks + 1).astype(np.int64)
    return pa.table({"host_lo": bounds[:-1], "host_hi": bounds[1:]})


def _run_seed_stage(spec: pa.Table, stage_fn, web_cfg, cfg, adm, run_token,
                    concurrency) -> None:
    """One Ray execution of a seed bootstrap stage over spec/raw slices
    (fractional num_cpus like the wave maps — admission shards + driver
    keep headroom)."""
    import ray as _ray

    total_cpus = float(_ray.cluster_resources().get("CPU", concurrency))
    task_cpus = max(1.0, total_cpus / max(1, concurrency))
    n_blocks = max(1, min(concurrency * 2, -(-spec.num_rows // 2048)
                          if spec.num_rows > 4096 else spec.num_rows))
    step = -(-spec.num_rows // n_blocks)
    slices = [spec.slice(i, step) for i in range(0, spec.num_rows, step)]
    rd.from_arrow(slices).map_batches(
        partial(stage_fn, web_cfg=web_cfg, cfg=cfg,
                shards=adm.handles(), run_token=run_token),
        batch_format="pyarrow", batch_size=None, num_cpus=task_cpus,
    ).materialize()


def _execute_wave(wave, web_cfg, cfg, concurrency, ckpt, wave_no,
                  profile=False, wt0=None, shards=None, run_token=None):
    """ONE heavy Ray execution over a ranked+scheduled wave: fetch + parse +
    link-extract + documents/crawl-log parquet writes inside the stage.
    Bodies and spans never reach the driver.

    With ``shards`` (BFS hot path): exploded candidates are pushed
    hash-routed to the admission shard actors from inside the stage and the
    driver collects only per-batch COUNT rows — returns (n_docs, n_err,
    None). Without shards (priority mode): candidate links return to the
    driver, are exploded + first-occurrence-deduped, and returned as a
    table.

    Blocks are zero-copy slices of the wave table (no repartition
    execution); >=2048 rows per block keeps per-task overhead <5%.
    """
    _t = time.perf_counter
    if wt0 is None:
        wt0 = _t()
    n_wave = wave.num_rows
    wave = wave.combine_chunks()
    n_blocks = max(1, min(concurrency * 2, -(-n_wave // 2048)))
    step = -(-n_wave // n_blocks)
    slices = [wave.slice(i, step) for i in range(0, n_wave, step)]
    ds = rd.from_arrow(slices)
    docs_dir = ckpt.wave_dir("documents", wave_no)
    log_dir = ckpt.wave_dir("crawl_log", wave_no)
    # this wave has no committed manifest entry — clear any stale shards
    # from a crashed prior attempt: shard names derive from block-start
    # crawl_seqs, which shift if fetch_concurrency changed between runs,
    # so overwrite-by-name alone cannot be trusted
    import glob as _glob

    for d in (docs_dir, log_dir):
        for f in _glob.glob(os.path.join(d, "part-*.parquet")):
            os.remove(f)
    t_prep = _t()
    if shards is not None:
        # BFS hot path: STATELESS tasks, not an actor pool — Ray reuses
        # worker processes across executions, so the per-worker stage cache
        # survives between waves (an actor pool pays ~14 process spawns +
        # heavy imports per wave). Fractional num_cpus caps concurrency at
        # `concurrency` tasks so the admission shard actors and driver keep
        # headroom (full reservation oversubscribes and inflates per-task
        # wall 3x — measured).
        import ray as _ray

        total_cpus = float(_ray.cluster_resources().get("CPU", concurrency))
        task_cpus = max(1.0, total_cpus / max(1, concurrency))
        processed = ds.map_batches(
            partial(wave_stage_batch, web_cfg=web_cfg, cfg=cfg,
                    docs_dir=docs_dir, log_dir=log_dir, shards=shards,
                    run_token=run_token),
            batch_format="pyarrow",
            batch_size=None,
            num_cpus=task_cpus,
        )
    elif n_wave >= ACTOR_POOL_WAVE_THRESHOLD:
        processed = ds.map_batches(
            WaveStage,
            fn_constructor_args=(web_cfg, cfg, docs_dir, log_dir, shards),
            batch_format="pyarrow",
            batch_size=None,
            concurrency=concurrency,
            num_cpus=1,
        )
    else:
        processed = ds.map_batches(
            partial(wave_stage_batch, web_cfg=web_cfg, cfg=cfg,
                    docs_dir=docs_dir, log_dir=log_dir, shards=shards,
                    run_token=run_token),
            batch_format="pyarrow",
            batch_size=None,
        )
    out = _ds_to_table(processed)
    t_map = _t()

    if shards is not None:
        n_docs = int(pa.compute.sum(out.column("n_docs")).as_py() or 0)
        n_err = int(pa.compute.sum(out.column("n_err")).as_py() or 0)
        if profile:
            comp = {
                c: round(float(pa.compute.sum(out.column(c)).as_py() or 0), 2)
                for c in ("t_fetch", "t_parse", "t_write", "t_push")
                if c in out.schema.names
            }
            print(f"[wave {wave_no}] n={n_wave} prep={t_prep - wt0:.2f} "
                  f"map={t_map - t_prep:.2f} cpu_s={comp}", flush=True)
        return n_docs, n_err, None

    log_links = out
    n_docs = int(pa.compute.sum(log_links.column("has_doc")).as_py() or 0)
    n_err = int(
        pa.compute.sum(
            pa.compute.not_equal(log_links.column("status"), 200)
        ).as_py() or 0
    )
    t_log = _t()
    links_table = explode_links(log_links)
    if links_table.num_rows > DISTRIBUTED_DEDUP_THRESHOLD:
        # wide wave: first-occurrence-wins dedup as a hash-keyed groupby
        # shuffle (the 10^10-frontier path; parity with the numpy path is
        # tested in test_seen.py)
        cand = dedup_candidates_grouped(rd.from_arrow(links_table))
    elif links_table.num_rows:
        cand = dedup_candidates(links_table)
    else:
        cand = None
    t_links = _t()
    if profile:
        print(
            f"[wave {wave_no}] n={n_wave} prep={t_prep - wt0:.2f} "
            f"map={t_map - t_prep:.2f} agg={t_log - t_map:.2f} "
            f"links_dedup={t_links - t_log:.2f}",
            flush=True,
        )
    return n_docs, n_err, cand


def crawl_priority(
    web_cfg: SynthWebConfig,
    out_dir: str,
    cfg: CrawlConfig = DEFAULT_CRAWL,
    seeds: list[dict] | None = None,
    wave_cap: int = 50_000,
    per_host_cap: int = 30,
    fetch_concurrency: int | None = None,
    resume: bool = False,
) -> CrawlRunResult:
    """Priority-frontier crawl (north-star mode): backlog table scored by
    recency (year*12+month - depth), each wave admits the top-priority
    candidates under a per-host cap (hot-host skew control). Wave-
    synchronous spec; matches oracle.crawl_oracle_priority exactly.

    Unselected candidates REMAIN in the backlog — the frontier is a
    materialized table checkpointed per wave, not a transient batch.
    """
    import pandas as pd

    from .priority import priority_scores, select_wave
    from .robots import RobotsIndex

    t0 = time.perf_counter()
    web = SynthWeb(web_cfg)
    robots = RobotsIndex(web.robots_body) if cfg.respect_robots else None
    ckpt = CrawlCheckpoint(out_dir)
    os.makedirs(out_dir, exist_ok=True)
    # actor-backed shards: the O(candidates) python seen loop runs
    # parallel across shards instead of serially on the driver (hash
    # arrays ship as numpy — cheap RPC payloads)
    seen = ShardedSeenSet(n_shards=cfg.seen_shards, mode="exact",
                          use_actors=True)
    sched = ShardedPoliteness(cfg.politeness, n_shards=cfg.seen_shards)
    from .frontier import (
        _HOST_RE,
        hosts_and_kinds,
        order_key,
        robots_allowed_mask,
    )
    from .politeness import assign_vtimes  # noqa: F401 (scheduler used)

    def to_backlog(cand: pa.Table):
        """Deduped candidates → (backlog rows, new seen hashes): adds okey
        + priority, drops too-deep / robots-blocked / already-seen (seen
        marked at insert). host/is_pdf/blocked are precomputed."""
        empty = np.empty(0, dtype=np.uint64)
        if cand is None or cand.num_rows == 0:
            return None, empty
        depth = cand.column("depth").to_numpy(zero_copy_only=False)
        cand = cand.filter(pa.array(depth <= cfg.max_depth))
        if cand.num_rows == 0:
            return None, empty
        blk = cand.column("blocked").to_numpy(zero_copy_only=False)
        if blk.any():
            cand = cand.filter(pa.array(~blk))
            if cand.num_rows == 0:
                return None, empty
        hashes = cand.column("url_hash").to_numpy(zero_copy_only=False)
        okey = order_key(
            cand.column("parent_rank").to_numpy(zero_copy_only=False),
            cand.column("link_pos").to_numpy(zero_copy_only=False),
        )
        # seen-marking order: ascending okey (first-occurrence-wins spec)
        o = np.argsort(okey, kind="stable")
        new_mask = np.zeros(len(okey), dtype=bool)
        new_mask[o] = seen.check_and_add(hashes[o])
        new_hashes = hashes[new_mask]
        cand = cand.filter(pa.array(new_mask))
        if cand.num_rows == 0:
            return None, new_hashes
        urls = cand.column("url").to_pandas()
        depth = cand.column("depth").to_numpy(zero_copy_only=False)
        prio = priority_scores(urls, depth)
        # canonical column order: seed candidates and exploded-link
        # candidates carry the same columns in different orders, and the
        # backlog concat requires identical schemas
        cand = cand.select(["url", "parent_rank", "link_pos", "depth",
                            "host", "is_pdf", "blocked", "url_hash"])
        return cand.append_column(
            "okey", pa.array(okey[new_mask], type=pa.int64())
        ).append_column("priority", pa.array(prio, type=pa.float64())), new_hashes

    concurrency = fetch_concurrency or cfg.fetch_concurrency
    profile = bool(os.environ.get("BGDSS_PROFILE"))
    next_rank = 0
    pages_fetched = 0
    docs_emitted = 0
    wave_no = 0
    pending_hashes = np.empty(0, dtype=np.uint64)

    # distributed-backlog state (see PRIORITY_DISTRIBUTED_THRESHOLD)
    mode_ds = False
    backlog_dir: str | None = None
    n_backlog = 0

    manifest = ckpt.load_manifest() if resume else None
    if manifest is not None:
        wave_no = manifest["completed_wave"] + 1
        next_rank = manifest["next_rank"]
        pages_fetched = manifest["pages_fetched"]
        sched.load_state(manifest["host_state"])
        seen_hashes = ckpt.load_seen_upto(manifest["completed_wave"])
        if len(seen_hashes):
            seen.check_and_add(seen_hashes)
        fdir = os.path.join(
            out_dir, "frontier_next", f"wave={manifest['completed_wave']}"
        )
        n_files = (
            len([f for f in os.listdir(fdir) if f.endswith(".parquet")])
            if os.path.isdir(fdir) else 0
        )
        backlog = None
        if n_files:
            n = rd.read_parquet(fdir).count()  # parquet-metadata count
            if n > PRIORITY_DISTRIBUTED_THRESHOLD:
                mode_ds, backlog_dir, n_backlog = True, fdir, n
            else:
                backlog = ckpt.load_frontier_next(manifest["completed_wave"])
                if backlog is not None and backlog.num_rows == 0:
                    backlog = None
    else:
        seed_rows = seeds if seeds is not None else web.seeds()
        backlog, pending_hashes = to_backlog(
            dedup_candidates(seeds_to_candidates(seed_rows, robots=robots))
        )

    from .priority import select_wave_ds

    while (n_backlog if mode_ds
           else (backlog.num_rows if backlog is not None else 0)) > 0:
        wt0 = time.perf_counter()
        budget_left = cfg.max_pages - pages_fetched
        if budget_left <= 0:
            break
        if not mode_ds and backlog.num_rows > PRIORITY_DISTRIBUTED_THRESHOLD:
            # spill to parquet once and switch: wave k-1's checkpoint
            # already holds this exact table (the initial pre-wave backlog
            # stages at wave=-1)
            if wave_no == 0:
                ckpt.write_frontier_next(-1, backlog)
            backlog_dir = ckpt.frontier_next_dir(wave_no - 1)
            n_backlog = backlog.num_rows
            backlog = None
            mode_ds = True
        if mode_ds:
            # one decode per wave: the materialized blocks feed BOTH the
            # heads pass and the drop/advance pass (object-store memory,
            # not driver)
            backlog_ds = rd.read_parquet(backlog_dir).materialize()
            selected = select_wave_ds(
                backlog_ds, min(wave_cap, budget_left), per_host_cap
            )
        else:
            selected, backlog = select_wave(
                backlog, min(wave_cap, budget_left), per_host_cap
            )
        n_wave = selected.num_rows
        if n_wave == 0:
            break
        hosts = selected.column("host").to_pylist()
        kinds = selected.column("is_pdf").to_numpy(zero_copy_only=False).tolist()
        delays = None
        if robots is not None:
            delays = {
                h: robots.crawl_delay(h)
                for h in set(hosts)
                if robots.crawl_delay(h) is not None
            }
        vtimes = sched.assign(hosts, kinds, delays)
        wave = pa.Table.from_arrays(
            [
                selected.column("url"),
                selected.column("url_hash").cast(pa.uint64()),
                selected.column("host"),
                selected.column("depth").cast(pa.int32()),
                pa.array(np.arange(next_rank, next_rank + n_wave, dtype=np.int64)),
                pa.array(vtimes),
            ],
            names=["url", "url_hash", "host", "depth", "crawl_seq", "vtime"],
        )
        next_rank += n_wave
        n_docs, n_err, cand = _execute_wave(
            wave, web_cfg, cfg, concurrency, ckpt, wave_no, profile, wt0
        )
        pages_fetched += n_wave
        docs_emitted += n_docs
        incoming, new_hashes = to_backlog(cand)
        ckpt.write_seen_delta(
            wave_no, np.concatenate([pending_hashes, new_hashes])
        )
        pending_hashes = np.empty(0, dtype=np.uint64)
        if mode_ds:
            # next backlog = (backlog dataset) minus selected, plus incoming
            # — okey anti-join against the broadcast selected-key set, all
            # inside map_batches; the result streams straight to the next
            # wave's checkpoint partition (never a driver table)
            import glob as _glob

            import ray as _ray

            ndir = ckpt.frontier_next_dir(wave_no)
            for f in _glob.glob(os.path.join(ndir, "*.parquet")):
                os.remove(f)  # stale files from a crashed attempt
            sel_keys = np.sort(
                selected.column("okey").to_numpy(zero_copy_only=False)
            )
            ref = _ray.put(sel_keys)

            def drop_selected(t: pa.Table) -> pa.Table:
                keys = _ray.get(ref)
                if not len(keys) or t.num_rows == 0:
                    return t
                o = t.column("okey").to_numpy(zero_copy_only=False)
                pos = np.searchsorted(keys, o)
                pos[pos == len(keys)] = 0
                return t.filter(pa.array(keys[pos] != o))

            rest = backlog_ds.map_batches(drop_selected, batch_format="pyarrow")
            if incoming is not None and incoming.num_rows:
                rest = rest.union(rd.from_arrow(incoming))
            rest.write_parquet(ndir)
            n_backlog = n_backlog - n_wave + (
                incoming.num_rows if incoming is not None else 0
            )
            backlog_dir = ndir
        else:
            if incoming is not None:
                backlog = (
                    pa.concat_tables([backlog, incoming]).combine_chunks()
                    if backlog.num_rows
                    else incoming
                )
            if backlog.num_rows:
                ckpt.write_frontier_next(wave_no, backlog)
        n_cand = cand.num_rows if cand is not None else 0
        n_new = incoming.num_rows if incoming is not None else 0
        _write_metrics(
            ckpt, wave_no, n_wave, n_err, n_docs,
            n_new=n_new,
            n_rejected=max(0, n_cand - n_new),
            wall=time.perf_counter() - wt0,
        )
        ckpt.commit_wave(wave_no, next_rank, pages_fetched, sched)
        wave_no += 1

    return _finish(ckpt, out_dir, wave_no, pages_fetched, seen, docs_emitted, t0)


def _write_metrics(ckpt, wave_no, n_wave, n_err, n_docs, n_new, n_rejected,
                   wall):
    # rejected_urls = candidates examined but not admitted this wave
    # (in-wave dups + already-seen + depth-gated + robots-blocked)
    urls_per_s = n_wave / wall if wall > 0 else 0.0
    t = pa.table(
        {
            "wave": pa.array([wave_no], type=pa.int32()),
            "frontier_size": pa.array([n_new], type=pa.int64()),
            "selected": pa.array([n_wave], type=pa.int64()),
            "fetched_ok": pa.array([n_wave - n_err], type=pa.int64()),
            "fetch_errors": pa.array([n_err], type=pa.int64()),
            "new_urls": pa.array([n_new], type=pa.int64()),
            "rejected_urls": pa.array([n_rejected], type=pa.int64()),
            "docs_emitted": pa.array([n_docs], type=pa.int64()),
            "wall_s": pa.array([wall], type=pa.float64()),
            "urls_per_s": pa.array([urls_per_s], type=pa.float64()),
            "frontier_ops_per_s": pa.array(
                [(n_new + n_rejected) / wall if wall > 0 else 0.0],
                type=pa.float64()
            ),
        }
    )
    ckpt.write_table("metrics", wave_no, t)


def _finish(ckpt, out_dir, waves, pages, seen, docs, t0) -> CrawlRunResult:
    # ``seen`` is a ShardedAdmission (BFS) or a ShardedSeenSet (priority)
    size = seen.seen_size() if hasattr(seen, "seen_size") else seen.size()
    return CrawlRunResult(
        out_dir=out_dir,
        waves=waves,
        pages_fetched=pages,
        seen_size=size,
        docs_emitted=docs,
        wall_s=time.perf_counter() - t0,
    )
