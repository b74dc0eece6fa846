"""Seen-set shards: exact vs cuckoo equality, actor path, dedup-path parity."""

import numpy as np
import pyarrow as pa
import pytest

from bgdss_ray.seen import CuckooFilter, ShardedSeenSet, _ShardCore


def test_exact_first_wins_within_call():
    s = _ShardCore("exact")
    h = np.array([1, 2, 1, 3, 2, 1], dtype=np.uint64)
    mask = s.check_and_add(h)
    assert mask.tolist() == [True, True, False, True, False, False]
    assert s.check_and_add(np.array([1, 4], dtype=np.uint64)).tolist() == [False, True]


def test_cuckoo_no_false_negatives():
    cf = CuckooFilter(log2_buckets=8)  # tiny: forces evictions + spill
    rng = np.random.RandomState(9)
    keys = rng.randint(0, 2**63, size=5000).astype(np.uint64).tolist()
    for k in keys:
        cf.add(int(k))
    missing = [k for k in keys if not cf.contains(int(k))]
    assert missing == [], "cuckoo filter must never forget an inserted key"


def test_cuckoo_false_positive_rate_bounded():
    cf = CuckooFilter(log2_buckets=12)
    rng = np.random.RandomState(10)
    ins = rng.randint(0, 2**62, size=4000).astype(np.uint64)
    for k in ins:
        cf.add(int(k))
    probe = (rng.randint(0, 2**62, size=20000).astype(np.uint64) + np.uint64(2**62))
    fp = sum(cf.contains(int(k)) for k in probe) / len(probe)
    assert fp < 0.05, f"false-positive rate too high: {fp}"


def test_sharded_exact_vs_cuckoo_contract_on_stream():
    """The engine contract: cuckoo mode may differ from exact ONLY by
    false positives (a new hash misread as seen), never false negatives,
    and the FP count stays within the 16-bit-fingerprint expectation
    (~2*slots*2^-16 per lookup)."""
    rng = np.random.RandomState(11)
    stream = rng.randint(0, 2**63, size=30000).astype(np.uint64)
    stream = np.concatenate([stream, stream[:5000]])  # re-insertions
    a = ShardedSeenSet(n_shards=8, mode="exact")
    b = ShardedSeenSet(n_shards=8, mode="cuckoo", log2_buckets=14)
    ma = a.check_and_add(stream)
    mb = b.check_and_add(stream)
    false_negative = (~ma) & mb   # exact: seen, cuckoo: new — forbidden
    assert not false_negative.any()
    false_positive = ma & (~mb)   # exact: new, cuckoo: seen — bounded
    assert false_positive.sum() <= 20
    assert a.size() == ma.sum()


def test_actor_backed_shards(ray_session):
    s = ShardedSeenSet(n_shards=4, mode="exact", use_actors=True)
    h = np.arange(1000, dtype=np.uint64)
    first = s.check_and_add(h)
    second = s.check_and_add(h)
    assert first.all() and not second.any()
    assert s.size() == 1000
    dumped = np.sort(s.dump())
    assert np.array_equal(dumped, h)


def test_grouped_dedup_equals_numpy_path(ray_session):
    """Distributed groupby dedup == driver numpy dedup (same survivors)."""
    import ray.data as rd

    from bgdss_ray.frontier import dedup_candidates, dedup_candidates_grouped

    rng = np.random.RandomState(12)
    n = 5000
    urls = [f"https://h{i % 7}.gov.br/p/{rng.randint(0, 800)}" for i in range(n)]
    t = pa.table(
        {
            "url": pa.array(urls, type=pa.string()),
            "depth": pa.array(np.ones(n, dtype=np.int32)),
            "parent_rank": pa.array(rng.randint(0, 100, n).astype(np.int64)),
            "link_pos": pa.array(rng.randint(0, 50, n).astype(np.int32)),
        }
    )
    a = dedup_candidates(t)
    b = dedup_candidates_grouped(rd.from_arrow(t))
    ka = sorted(zip(a.column("url").to_pylist(),
                    a.column("parent_rank").to_pylist(),
                    a.column("link_pos").to_pylist()))
    kb = sorted(zip(b.column("url").to_pylist(),
                    b.column("parent_rank").to_pylist(),
                    b.column("link_pos").to_pylist()))
    assert ka == kb
