"""The big invariant: the parallel Ray crawl == the sequential oracle.

Crawl order, seen set, virtual politeness schedule, and per-row span
sequences must match exactly (BASELINE.json north_rule / input_hint).
"""

import numpy as np
import pytest

from bgdss_ray.checkpoint import CrawlCheckpoint
from bgdss_ray.config import CrawlConfig
from bgdss_ray.oracle import crawl_oracle
from bgdss_ray.pipeline import crawl
from bgdss_ray.synth import SynthWeb, SynthWebConfig
from bgdss_ray.urlnorm import hash64_one

WEB = SynthWebConfig(seed=42, n_hosts=6, years=(2023,), months=(1, 2))
CFG = CrawlConfig(max_depth=3, seen_shards=4, fetch_concurrency=2)


@pytest.fixture(scope="module")
def oracle_result():
    w = SynthWeb(WEB)
    return crawl_oracle(w, w.seeds(), CFG)


@pytest.fixture(scope="module")
def engine_result(tmp_path_factory, ray_session):
    out = str(tmp_path_factory.mktemp("crawl"))
    res = crawl(WEB, out, CFG)
    return res, CrawlCheckpoint(out)


def _engine_log(ckpt):
    log = ckpt.read_all("crawl_log")
    return log.sort_by("crawl_seq")


def test_crawl_order_exact_match(oracle_result, engine_result):
    _res, ckpt = engine_result
    log = _engine_log(ckpt)
    assert log.column("url").to_pylist() == oracle_result.crawl_order
    assert log.column("crawl_seq").to_pylist() == list(range(len(oracle_result.crawl_order)))


def test_statuses_and_attempts_match(oracle_result, engine_result):
    _res, ckpt = engine_result
    log = _engine_log(ckpt)
    assert log.column("status").to_pylist() == oracle_result.statuses
    assert log.column("attempts").to_pylist() == oracle_result.attempts


def test_politeness_vtimes_match(oracle_result, engine_result):
    _res, ckpt = engine_result
    log = _engine_log(ckpt)
    # engine vtime includes retry backoff; reconstruct fetch-start vtime
    # the same way the oracle records it (oracle vtime excludes backoff)
    eng = np.asarray(log.column("vtime").to_pylist())
    att = np.asarray(log.column("attempts").to_pylist())
    backoff = np.zeros(len(att))
    for i, a in enumerate(att):
        backoff[i] = sum(2.0 * k for k in range(1, a))
    assert np.allclose(eng - backoff, np.asarray(oracle_result.vtimes))


def test_seen_set_exact_match(oracle_result, engine_result):
    _res, ckpt = engine_result
    waves = _res.waves
    seen_engine = set(int(h) for h in ckpt.load_seen_upto(waves + 1))
    assert seen_engine == oracle_result.seen


def test_span_sequences_match(oracle_result, engine_result):
    """Per-row span-sequence equality: (kind, text, media_ref, order)."""
    _res, ckpt = engine_result
    docs = ckpt.read_all("documents")
    got = {}
    ids = docs.column("doc_id").to_pylist()
    spans = docs.column("spans").to_pylist()
    for i, s in zip(ids, spans):
        got[i] = [(x["kind"], x["text"], x["media_ref"], x["offset"]) for x in s]
    want = {
        url: [(x["kind"], x["text"], x["media_ref"], x["offset"]) for x in sp]
        for url, sp in oracle_result.documents
    }
    assert set(got) == set(want)
    mismatches = [u for u in want if got[u] != want[u]]
    assert mismatches == []


def test_crawl_deterministic_across_runs(tmp_path, oracle_result):
    out = str(tmp_path / "crawl2")
    res2 = crawl(WEB, out, CFG, fetch_concurrency=4)  # different parallelism
    log = CrawlCheckpoint(out).read_all("crawl_log").sort_by("crawl_seq")
    assert log.column("url").to_pylist() == oracle_result.crawl_order


def test_max_pages_truncation(tmp_path, oracle_result):
    budget = max(3, len(oracle_result.crawl_order) // 3)
    cfg = CrawlConfig(max_depth=3, seen_shards=4, fetch_concurrency=2, max_pages=budget)
    w = SynthWeb(WEB)
    o = crawl_oracle(w, w.seeds(), cfg)
    assert len(o.crawl_order) == budget
    out = str(tmp_path / "trunc")
    crawl(WEB, out, cfg)
    log = CrawlCheckpoint(out).read_all("crawl_log").sort_by("crawl_seq")
    assert log.column("url").to_pylist() == o.crawl_order


def test_resume_equals_uninterrupted(tmp_path, oracle_result):
    """Kill after wave 1, resume: outputs byte-identical to one-shot run."""
    out = str(tmp_path / "resume")
    # phase 1: run with a page budget that stops mid-crawl
    n_seeds = None
    w = SynthWeb(WEB)
    from bgdss_ray.frontier import dedup_candidates, seeds_to_candidates

    n_seeds = dedup_candidates(seeds_to_candidates(w.seeds())).num_rows
    cfg_stop = CrawlConfig(max_depth=3, seen_shards=4, fetch_concurrency=2,
                           max_pages=n_seeds)  # exactly wave 0
    crawl(WEB, out, cfg_stop)
    # phase 2: resume with the full budget
    res = crawl(WEB, out, CFG, resume=True)
    log = CrawlCheckpoint(out).read_all("crawl_log").sort_by("crawl_seq")
    assert log.column("url").to_pylist() == oracle_result.crawl_order
    seen_engine = set(int(h) for h in CrawlCheckpoint(out).load_seen_upto(res.waves + 1))
    assert seen_engine == oracle_result.seen


def test_resume_after_midwave_budget_cut(tmp_path, oracle_result):
    """Budget cut strictly inside wave 1 (NOT at a wave boundary), then
    resume with the full budget: the over-budget admitted remainder must
    carry over (it was already marked seen), so the resumed crawl equals
    the uninterrupted one — order AND seen set."""
    out = str(tmp_path / "cut")
    w = SynthWeb(WEB)
    from bgdss_ray.frontier import dedup_candidates, seeds_to_candidates

    n_seeds = dedup_candidates(seeds_to_candidates(w.seeds())).num_rows
    budget = n_seeds + 1  # one page into wave 1
    assert budget < len(oracle_result.crawl_order)
    cfg_cut = CrawlConfig(max_depth=3, seen_shards=4, fetch_concurrency=2,
                          max_pages=budget)
    crawl(WEB, out, cfg_cut)
    res = crawl(WEB, out, CFG, resume=True)
    log = CrawlCheckpoint(out).read_all("crawl_log").sort_by("crawl_seq")
    assert log.column("url").to_pylist() == oracle_result.crawl_order
    seen_engine = set(int(h) for h in CrawlCheckpoint(out).load_seen_upto(res.waves + 1))
    assert seen_engine == oracle_result.seen


def test_crash_resume_with_different_concurrency(tmp_path, oracle_result):
    """Crash-sim resume with a DIFFERENT fetch_concurrency: block-start
    crawl_seqs shift, so the re-run's shard filenames differ from the
    crashed attempt's — stale shards must be cleared, not concatenated."""
    import json
    import os

    out = str(tmp_path / "crash_cc")
    crawl(WEB, out, CFG)  # fetch_concurrency=2
    ck = CrawlCheckpoint(out)
    met = ck.read_all("metrics").to_pandas().sort_values("wave")
    wave0_pages = int(met["selected"].iloc[0])
    from bgdss_ray.checkpoint import atomic_write_json
    from bgdss_ray.politeness import ShardedPoliteness
    from bgdss_ray.robots import RobotsIndex

    sched = ShardedPoliteness(CFG.politeness, n_shards=CFG.seen_shards)
    full_log = ck.read_all("crawl_log").sort_by("crawl_seq")
    log0 = full_log.slice(0, wave0_pages)
    robots = RobotsIndex(SynthWeb(WEB).robots_body)
    hosts0 = log0.column("host").to_pylist()
    delays = {h: robots.crawl_delay(h) for h in set(hosts0)
              if robots.crawl_delay(h) is not None}
    sched.assign(hosts0, [k == "pdf" for k in log0.column("kind").to_pylist()],
                 delays)
    atomic_write_json(
        os.path.join(out, "manifest.json"),
        {"completed_wave": 0, "next_rank": wave0_pages,
         "pages_fetched": wave0_pages, "host_state": sched.dump_state()},
    )
    # resume with concurrency 3: different block boundaries → different
    # part filenames than the stale wave-1 shards already on disk
    res = crawl(WEB, out, CFG, resume=True, fetch_concurrency=3)
    log = CrawlCheckpoint(out).read_all("crawl_log").sort_by("crawl_seq")
    assert log.column("url").to_pylist() == oracle_result.crawl_order
    seen_engine = set(int(h) for h in ck.load_seen_upto(res.waves + 1))
    assert seen_engine == oracle_result.seen


def test_robots_enforced_end_to_end(tmp_path, oracle_result):
    """Some corpus URLs are robots-blocked: they never appear in crawl
    order or the seen set, and Crawl-delay hosts get stretched schedules —
    identically in oracle and engine (engine parity is test_crawl_order /
    test_seen_set above since respect_robots defaults on)."""
    from dataclasses import replace

    from bgdss_ray.robots import RobotsIndex
    from bgdss_ray.synth import SynthWeb
    from urllib.parse import urlsplit

    w = SynthWeb(WEB)
    cfg_off = CrawlConfig(max_depth=3, respect_robots=False)
    o_off = crawl_oracle(w, w.seeds(), cfg_off)
    o_on = oracle_result  # respect_robots=True via CFG default
    assert len(o_on.crawl_order) < len(o_off.crawl_order), \
        "robots must actually block some URLs in this corpus"
    robots = RobotsIndex(w.robots_body)
    for url in o_on.crawl_order:
        s = urlsplit(url)
        assert robots.allowed(s.hostname, s.path)
    blocked = set(o_off.crawl_order) - set(o_on.crawl_order)
    assert all(
        not robots.allowed(urlsplit(u).hostname, urlsplit(u).path)
        or u not in o_on.seen
        for u in blocked
    )


def test_shard_count_invariance(tmp_path, oracle_result):
    """Admission shard count must never affect crawl output (equal hashes
    co-shard for any K; rank/politeness are assigned on the merged okey
    order) — guard for bench/production configs that tune seen_shards."""
    for k in (1, 7):
        out = str(tmp_path / f"shards{k}")
        cfg = CrawlConfig(max_depth=3, seen_shards=k, fetch_concurrency=2)
        crawl(WEB, out, cfg)
        log = CrawlCheckpoint(out).read_all("crawl_log").sort_by("crawl_seq")
        assert log.column("url").to_pylist() == oracle_result.crawl_order, k


def test_cuckoo_seen_mode_matches_exact(tmp_path, oracle_result):
    """The approximate seen-set path (cuckoo shards) produces the same
    crawl as the exact path on this corpus (insert-only usage, adequate
    capacity — SURVEY.md §7.5 item 2)."""
    out = str(tmp_path / "cuckoo")
    crawl(WEB, out, CFG, seen_mode="cuckoo")
    log = CrawlCheckpoint(out).read_all("crawl_log").sort_by("crawl_seq")
    assert log.column("url").to_pylist() == oracle_result.crawl_order


def test_seen_actor_mode_matches(tmp_path, oracle_result):
    out = str(tmp_path / "actors")
    crawl(WEB, out, CFG, use_seen_actors=True)
    log = CrawlCheckpoint(out).read_all("crawl_log").sort_by("crawl_seq")
    assert log.column("url").to_pylist() == oracle_result.crawl_order


def test_site_probe():
    from bgdss_ray.fetch import probe_site
    from bgdss_ray.synth import SynthWeb

    w = SynthWeb(WEB)
    probes = [probe_site(w, h) for h in w.hosts]
    assert any(p["healthy"] for p in probes)
    assert all(set(p) == {"host", "status", "healthy", "content_len"} for p in probes)


def test_politeness_actor_shards_match(tmp_path, oracle_result):
    """Actor-backed politeness shards produce identical vtimes/order."""
    out = str(tmp_path / "pol_actors")
    crawl(WEB, out, CFG, use_politeness_actors=True)
    log = CrawlCheckpoint(out).read_all("crawl_log").sort_by("crawl_seq")
    assert log.column("url").to_pylist() == oracle_result.crawl_order
    eng = np.asarray(log.column("vtime").to_pylist())
    att = np.asarray(log.column("attempts").to_pylist())
    backoff = np.array([sum(2.0 * k for k in range(1, a)) for a in att])
    assert np.allclose(eng - backoff, np.asarray(oracle_result.vtimes))


def test_resume_overwrites_partial_wave_files(tmp_path, oracle_result):
    """Crash simulation: a wave's data files were written but its manifest
    commit never happened (the real mid-wave kill window). Resume must
    overwrite the partial files deterministically and produce the exact
    oracle outputs."""
    import json
    import os

    out = str(tmp_path / "crash")
    # full run once to produce all files
    crawl(WEB, out, CFG)
    ck = CrawlCheckpoint(out)
    full_log = ck.read_all("crawl_log").sort_by("crawl_seq")
    # roll the manifest back to wave 0 (as if the process died during
    # wave 1, after writing some of its parquet shards)
    with open(os.path.join(out, "manifest.json")) as f:
        m = json.load(f)
    met = ck.read_all("metrics").to_pandas().sort_values("wave")
    wave0_pages = int(met["selected"].iloc[0])
    # reconstruct wave-0 manifest: re-run politeness fold over wave 0 only
    from bgdss_ray.checkpoint import atomic_write_json
    from bgdss_ray.politeness import ShardedPoliteness

    from bgdss_ray.robots import RobotsIndex
    from bgdss_ray.synth import SynthWeb

    sched = ShardedPoliteness(CFG.politeness, n_shards=CFG.seen_shards)
    log0 = full_log.slice(0, wave0_pages)
    robots = RobotsIndex(SynthWeb(WEB).robots_body)
    hosts0 = log0.column("host").to_pylist()
    delays = {h: robots.crawl_delay(h) for h in set(hosts0)
              if robots.crawl_delay(h) is not None}
    sched.assign(
        hosts0,
        [k == "pdf" for k in log0.column("kind").to_pylist()],
        delays,
    )
    atomic_write_json(
        os.path.join(out, "manifest.json"),
        {"completed_wave": 0, "next_rank": wave0_pages,
         "pages_fetched": wave0_pages, "host_state": sched.dump_state()},
    )
    # corrupt one of wave 1's data shards to prove it gets overwritten
    w1 = os.path.join(out, "crawl_log", "wave=1")
    victims = sorted(os.listdir(w1))
    with open(os.path.join(w1, victims[0]), "wb") as f:
        f.write(b"garbage")

    res = crawl(WEB, out, CFG, resume=True)
    log = CrawlCheckpoint(out).read_all("crawl_log").sort_by("crawl_seq")
    assert log.column("url").to_pylist() == oracle_result.crawl_order
    seen_engine = set(int(h) for h in CrawlCheckpoint(out).load_seen_upto(res.waves + 1))
    assert seen_engine == oracle_result.seen


def test_distributed_seed_bootstrap_matches(tmp_path, oracle_result,
                                            monkeypatch, ray_session):
    """Forcing the distributed seed bootstrap (worker-side canonicalize +
    shard push) yields the exact oracle crawl order — parity with the
    driver-side seeds_to_candidates path."""
    import bgdss_ray.pipeline as pl

    monkeypatch.setattr(pl, "SEED_DISTRIBUTED_THRESHOLD", 1)
    out = str(tmp_path / "c")
    crawl(WEB, out, CFG)
    log = _engine_log(CrawlCheckpoint(out))
    assert log.column("url").to_pylist() == oracle_result.crawl_order
    ckpt = CrawlCheckpoint(out)
    waves = max(
        ckpt.read_all("metrics").column("wave").to_pylist()
    )
    seen_engine = set(int(h) for h in ckpt.load_seen_upto(waves + 1))
    assert seen_engine == oracle_result.seen


def test_distributed_explicit_seed_list_matches(tmp_path, oracle_result,
                                                monkeypatch, ray_session):
    """The explicit-seed-list distributed path (url/seq slices shipped to
    workers) also reproduces the oracle crawl order."""
    import bgdss_ray.pipeline as pl

    monkeypatch.setattr(pl, "SEED_DISTRIBUTED_THRESHOLD", 1)
    out = str(tmp_path / "c")
    crawl(WEB, out, CFG, seeds=SynthWeb(WEB).seeds())
    log = _engine_log(CrawlCheckpoint(out))
    assert log.column("url").to_pylist() == oracle_result.crawl_order


def test_seeds_for_hosts_matches_seeds():
    """Capacity-spaced distributed generation covers the same (url, title)
    rows in the same order as the sequential seeds()."""
    web = SynthWeb(WEB)
    want = web.seeds()
    got = []
    for lo in range(0, len(web.hosts), 2):
        got.extend(web.seeds_for_hosts(lo, lo + 2))
    assert [r["url"] for r in got] == [r["url"] for r in want]
    # sparse seqs are strictly increasing in the same order
    seqs = [r["seq"] for r in got]
    assert seqs == sorted(seqs)
