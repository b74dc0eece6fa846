"""HyperLogLog distinct-count sketch: accuracy, merge algebra, Dataset op."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from bgdss_ray.ops.sketches import HllSketch, hll_distinct, hll_distinct_report
from bgdss_ray.urlnorm import url_hash64


def _hashes(n, seed=0):
    return url_hash64([f"item-{seed}-{i}" for i in range(n)])


@pytest.mark.parametrize("n", [100, 5_000, 50_000])
def test_hll_estimate_accuracy(n):
    sk = HllSketch(p=12).add_hashes(_hashes(n))
    est = sk.estimate()
    # p=12 → ~1.6% typical error; allow 5% (deterministic hash, fixed bound)
    assert abs(est - n) / n < 0.05, (n, est)


def test_hll_duplicates_do_not_inflate():
    h = _hashes(1000)
    once = HllSketch().add_hashes(h)
    many = HllSketch().add_hashes(np.tile(h, 20))
    assert np.array_equal(once.registers, many.registers)


def test_hll_merge_is_union_exact_registers():
    """merge(h(A), h(B)) has register-identical state to h(A ∪ B) — the
    associativity/commutativity any combine tree relies on."""
    a, b = _hashes(3000, seed=1), _hashes(4000, seed=2)
    ab = HllSketch().add_hashes(np.concatenate([a, b]))
    merged = HllSketch().add_hashes(b).merge(HllSketch().add_hashes(a))
    assert np.array_equal(ab.registers, merged.registers)


def test_hll_dataset_op_matches_local(ray_session):
    vals = [f"u-{i % 2500}" for i in range(20_000)]  # 2500 distinct
    ds = rd.from_arrow(pa.table({"v": vals}))
    est = hll_distinct(ds, "v")
    local = HllSketch().add_strings(sorted(set(vals))).estimate()
    assert est == pytest.approx(local)  # partial+merge == single pass
    assert abs(est - 2500) / 2500 < 0.05


def test_hll_report_on_testdata(ray_session):
    rep = hll_distinct_report(
        "/root/testdata/sf0.001",
        [("events", "user_id"), ("orders", "o_custkey"), ("documents", "text")],
    )
    assert len(rep) == 3
    assert (rep["rel_error"] < 0.06).all(), rep.to_dict("records")
    assert (rep["exact_distinct"] > 0).all()


def test_kmv_merge_equality_and_determinism():
    from bgdss_ray.ops.sketches import KmvQuantileSketch
    from bgdss_ray.urlnorm import url_hash64

    keys = [f"k{i}" for i in range(10_000)]
    h = url_hash64(keys)
    v = ((np.arange(10_000) * 37) % 100_000).astype(np.int64)
    one = KmvQuantileSketch(k=512).add(h, v)
    # any split + merge order gives the identical sketch
    a = KmvQuantileSketch(k=512).add(h[:3000], v[:3000])
    b = KmvQuantileSketch(k=512).add(h[3000:], v[3000:])
    ab = a.merge(b)
    assert np.array_equal(one.h, ab.h) and np.array_equal(one.v, ab.v)
    b2 = KmvQuantileSketch(k=512).add(h[3000:], v[3000:])
    ba = b2.add(h[:3000], v[:3000])
    assert np.array_equal(one.h, ba.h)


def test_kmv_quantile_accuracy(ray_session):
    """Bottom-k is a uniform sample: quantile error ~ O(1/sqrt(k))."""
    from bgdss_ray.queries import kmv_quantiles_q, _cents
    import pyarrow.parquet as pq

    sf = "/root/testdata/sf0.001"
    got = kmv_quantiles_q(sf)
    t = pq.read_table(f"{sf}/lineitem.parquet", columns=["l_extendedprice"])
    ex = np.sort(_cents(t.column("l_extendedprice")).to_numpy(zero_copy_only=False))
    for _, r in got.iterrows():
        exact = ex[int(np.floor(r["p"] * (len(ex) - 1)))]
        assert abs(r["est_cents"] - exact) / exact < 0.10, (r["p"], r["est_cents"], exact)


def test_bloom_no_false_negatives_and_antijoin_exact(ray_session):
    """Bloom membership can false-positive but NEVER false-negative, so
    the bloom-accelerated anti-join equals the plain set anti-join; fp
    flags only ever mark true non-members."""
    import numpy as np
    import ray.data as rd

    from bgdss_ray.ops.sketches import bloom_build, bloom_maybe
    from bgdss_ray.queries import bloom_antijoin_q

    SF = "/root/testdata/sf0.001"
    ev = rd.read_parquet(f"{SF}/events.parquet", columns=["user_id"])
    bits = bloom_build(ev, "user_id")
    members = np.unique(ev.to_pandas()["user_id"].to_numpy())
    assert bloom_maybe(bits, members).all()  # no false negatives

    got = bloom_antijoin_q(SF).to_pandas().sort_values("custkey")
    custs = np.unique(
        rd.read_parquet(f"{SF}/orders.parquet", columns=["o_custkey"])
        .to_pandas()["o_custkey"].to_numpy()
    )
    want = np.setdiff1d(custs, members)
    assert (got["custkey"].to_numpy() == want).all()
    # every fp-flagged row is genuinely absent from the build set AND
    # was a bloom maybe; every unflagged row was a bloom definite-no
    flagged = got.loc[got["bloom_fp"], "custkey"].to_numpy()
    unflagged = got.loc[~got["bloom_fp"], "custkey"].to_numpy()
    if len(flagged):
        assert bloom_maybe(bits, flagged).all()
    if len(unflagged):
        assert not bloom_maybe(bits, unflagged).any()


def test_kmv_group_quantiles_layout_invariance_and_accuracy(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from bgdss_ray.queries import kmv_group_quantiles_q

    SF = "/root/testdata/sf0.01"
    a = kmv_group_quantiles_q(SF).to_pandas()
    a = a.sort_values(["event_type", "p"]).reset_index(drop=True)

    ev = rd.read_parquet(f"{SF}/events.parquet",
                         columns=["event_type", "value"]).to_pandas()
    ev["cents"] = np.floor(ev["value"].to_numpy() * 100.0 + 0.5).astype(
        np.int64)
    for (g, p), est in zip(
        a[["event_type", "p"]].itertuples(index=False), a["est_cents"]
    ):
        s = np.sort(ev.loc[ev["event_type"] == g, "cents"].to_numpy())
        exact = s[int(np.floor(p * (len(s) - 1)))]
        # standard KMV sample bound at k=512 on ~2k rows/group
        assert abs(est - exact) <= max(200, 0.15 * exact), (g, p, est, exact)
