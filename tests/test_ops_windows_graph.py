"""Sessionization (bucketed), grouped HLL, CMS heavy hitters, PageRank —
algebraic/layout-invariance properties beyond the SQL-oracle gate."""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

SF = "/root/testdata/sf0.001"


def _sorted(df: pd.DataFrame) -> pd.DataFrame:
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def test_sessionize_bucket_width_invariance(ray_session):
    """Bucket fan-out is semantics-free: sessions are per-user, so any
    user-hash bucket width gives the identical session table."""
    from bgdss_ray.ops.windows import sessionize_events

    ds = rd.read_parquet(f"{SF}/events.parquet",
                         columns=["event_id", "user_id", "ts", "value"])
    a = _sorted(sessionize_events(ds, n_buckets=4).to_pandas())
    b = _sorted(sessionize_events(ds, n_buckets=64).to_pandas())
    pd.testing.assert_frame_equal(a, b)
    assert len(a) > 0 and (a["n_events"] >= 1).all()
    assert (a["session_end"] >= a["session_start"]).all()


def test_sessionize_gap_rule():
    """Synthetic micro-case: gaps strictly over 30 min break sessions,
    exactly 30 min does not; ties order by event_id."""
    from bgdss_ray.ops.windows import sessionize_bucket

    t0 = np.datetime64("2024-01-01T00:00:00", "us")
    mins = lambda m: t0 + np.timedelta64(m * 60_000_000, "us")
    g = pd.DataFrame(
        {
            "event_id": [1, 2, 3, 4, 5],
            "user_id": [7, 7, 7, 7, 9],
            "ts": [mins(0), mins(30), mins(61), mins(200), mins(0)],
            "value": [1.0, 2.0, 3.0, 4.0, 5.0],
        }
    )
    out = sessionize_bucket(g).sort_values(
        ["user_id", "session_no"]).reset_index(drop=True)
    # user 7: [0,30] one session (gap == 30min not >), then 61 (gap 31min
    # > 30 → new), then 200 (gap 139min → new); user 9: one session
    assert out[out.user_id == 7]["n_events"].tolist() == [2, 1, 1]
    assert out[out.user_id == 9]["n_events"].tolist() == [1]
    assert out[out.user_id == 7]["session_no"].tolist() == [1, 2, 3]


def test_hll_by_group_matches_flat_per_group(ray_session):
    """The grouped sketch must equal running the FLAT sketch on each
    group's filtered stream — the grouping changes layout, not algebra."""
    from bgdss_ray.ops.sketches import hll_distinct, hll_distinct_by

    ds = rd.read_parquet(f"{SF}/events.parquet",
                         columns=["event_type", "user_id"])
    grouped = hll_distinct_by(ds, "event_type", "user_id", p=12)
    for _, row in grouped.iterrows():
        flat = hll_distinct(
            ds.filter(expr=f"event_type == '{row['group']}'"),
            "user_id", p=12)
        assert int(round(flat)) == row["hll_estimate"], row["group"]


def test_cms_never_underestimates_and_superset(ray_session):
    from bgdss_ray.ops.sketches import (cms_estimate, cms_heavy_hitters,
                                        cms_sketch_terms)

    ds = rd.read_parquet(f"{SF}/documents.parquet",
                         columns=["doc_id", "text"])
    grid = cms_sketch_terms(ds, "text")
    # exact counts via pandas (tiny corpus)
    import re

    texts = pd.read_parquet(f"{SF}/documents.parquet", columns=["text"])
    toks = []
    for t in texts["text"]:
        s = re.sub(r"^[ \t\n\f\r]+|[ \t\n\f\r]+$", "", t or "")
        if s:
            toks.extend(re.split(r"[ \t\n\f\r]+", s))
    exact = pd.Series(toks).value_counts()
    ests = cms_estimate(grid, exact.index.tolist())
    assert (ests >= exact.to_numpy()).all()  # one-sided error
    assert int(grid[0].sum()) == len(toks)  # every row sums to the stream
    hh = cms_heavy_hitters(ds, "text", denom=30)
    t = max(1, len(toks) // 30)
    want = set(exact[exact >= t].index)
    assert set(hh["term"]) == want
    assert (hh["exact_count"].to_numpy()
            == exact[hh["term"]].to_numpy()).all()


def test_pagerank_mass_and_parallelism_invariance(ray_session):
    from bgdss_ray.ops.graph import BASE, SCALE, lineitem_edges, pagerank

    li = rd.read_parquet(f"{SF}/lineitem.parquet",
                         columns=["l_partkey", "l_suppkey"])
    edges = lineitem_edges(li).materialize()
    a = _sorted(pagerank(edges, n_iter=3, num_partitions=4).to_pandas())
    b = _sorted(pagerank(edges, n_iter=3, num_partitions=16).to_pandas())
    pd.testing.assert_frame_equal(a, b)  # integer arithmetic: bit-equal
    n = len(a)
    # damped mass conservation (floor losses only shrink): total rank in
    # (N·BASE, N·SCALE]; every rank >= BASE + floor contribution >= BASE
    assert n > 0 and (a["rank"] >= BASE).all()
    assert n * BASE < a["rank"].sum() <= n * SCALE


def test_pagerank_raises_on_pure_sink_bucket(ray_session):
    """A sink node whose bucket holds ONLY its rank-mass state row (no
    edges at all) must hit the outdeg-0 raised-error contract — the old
    empty-edge early return silently dropped the mass instead."""
    import pytest

    from bgdss_ray.ops.graph import pagerank

    edges = rd.from_pandas(
        pd.DataFrame({"src": [1], "dst": [2]})  # node 2 is a pure sink
    )
    with pytest.raises(Exception) as ei:
        pagerank(edges, n_iter=2, num_partitions=4).to_pandas()
    assert "outdeg 0" in str(ei.value)


def test_labelprop_carries_sink_labels(ray_session):
    """Directed chain 5→3→1: sinks/interior nodes receive labels via
    in-edges and must KEEP them across rounds even when their bucket has
    no out-edges (the old early return dropped them). At fixpoint every
    reachable node carries the chain minimum of its ancestors."""
    from bgdss_ray.ops.graph import labelprop

    edges = rd.from_pandas(pd.DataFrame({"src": [5, 3], "dst": [3, 1]}))
    out = (
        labelprop(edges, n_iter=4, num_partitions=4)
        .to_pandas()
        .set_index("node_id")["label"]
        .to_dict()
    )
    # node 1 (pure sink, bucket may hold only label rows) keeps label 1
    # (its own candidates are min(3,5,1-carry) folds -> 1 never appears:
    # labels arrive only via in-edges, so min(3) then carried min(3))
    assert out[3] == 3  # min(5, own 3... candidates from 5) -> 3
    assert 1 in out  # the sink's label row survived
    assert out[1] <= 3  # received 3's label (or smaller after carry)


def test_kmeans_matches_direct_lloyd_and_layout_invariance(ray_session):
    """Engine k-means == a direct single-process numpy Lloyd's run with
    the same integer contract, bit-exactly; block layout is irrelevant."""
    from bgdss_ray.ops.clustering import OFFSET, QUANT, kmeans

    ds = rd.read_parquet(f"{SF}/embeddings.parquet",
                         columns=["vec_id", "embedding"])
    k, n_iter = 8, 3
    a = _sorted(kmeans(ds, k=k, n_iter=n_iter).to_pandas())
    b = _sorted(
        kmeans(ds.repartition(7), k=k, n_iter=n_iter).to_pandas()
    )
    pd.testing.assert_frame_equal(a, b)

    # direct reference: same quantization, seeds, tie-break, update
    df = ds.to_pandas().sort_values("vec_id").reset_index(drop=True)
    X = np.floor(
        np.asarray(df["embedding"].tolist(), dtype=np.float64) * QUANT
    ).astype(np.int64) + OFFSET
    C = X[:k].copy()
    cids = np.arange(k)
    for _ in range(n_iter):
        d2 = ((X[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
        assign = cids[np.argmin(d2, axis=1)]
        live = np.unique(assign)
        C = np.stack([X[assign == c].sum(axis=0) // (assign == c).sum()
                      for c in live])
        cids = live
    d = X.shape[1]
    want = _sorted(pd.DataFrame({
        "cid": np.repeat(cids, d).astype(np.int64),
        "j": np.tile(np.arange(d, dtype=np.int32), len(cids)),
        "c": C.ravel().astype(np.int64),
        "n": np.repeat(
            np.asarray([(assign == c).sum() for c in cids]), d
        ).astype(np.int64),
    }))
    pd.testing.assert_frame_equal(a, want)


def test_sliding_windows_mass_and_layout_invariance(ray_session):
    """Every event lands in exactly window/stride windows, so total
    n_events == 4 x input rows; block layout is irrelevant (integer
    sums); each window's count equals the brute-force containment
    count."""
    from bgdss_ray.ops.windows import STRIDE_US, WINDOW_US, sliding_window_agg

    ds = rd.read_parquet(f"{SF}/events.parquet",
                         columns=["ts", "value", "event_type"])
    a = _sorted(sliding_window_agg(ds).to_pandas())
    b = _sorted(sliding_window_agg(ds.repartition(5)).to_pandas())
    pd.testing.assert_frame_equal(a, b)
    n_rows = ds.count()
    assert a["n_events"].sum() == (WINDOW_US // STRIDE_US) * n_rows

    ts_us = (rd.read_parquet(f"{SF}/events.parquet", columns=["ts"])
             .to_pandas()["ts"].to_numpy(dtype="datetime64[us]")
             .astype(np.int64))
    for w in a["window_start"].to_numpy()[:5]:
        w_us = int(w) * 1_000_000
        want = int(((ts_us >= w_us) & (ts_us < w_us + WINDOW_US)).sum())
        got = int(a.loc[a["window_start"] == w, "n_events"].iloc[0])
        assert got == want


def test_labelprop_fixpoint_matches_union_find(ray_session):
    """Run min-label propagation far past the graph diameter; labels must
    equal the union-find component minimum for every node. Also bucket
    fan-out invariance at the paired 3-round depth."""
    from bgdss_ray.ops.dedup import union_find_components
    from bgdss_ray.ops.graph import labelprop
    from bgdss_ray.queries import labelprop_q

    li = rd.read_parquet(f"{SF}/lineitem.parquet",
                         columns=["l_partkey", "l_suppkey"]).to_pandas()
    li = li[(li["l_partkey"] + li["l_suppkey"]) % 97 == 0]
    p = li["l_partkey"].to_numpy() * 2
    s = li["l_suppkey"].to_numpy() * 2 + 1
    edges = rd.from_pandas(pd.DataFrame({
        "src": np.concatenate([p, s]).astype("int64"),
        "dst": np.concatenate([s, p]).astype("int64"),
    }))
    got = labelprop(edges, n_iter=16).to_pandas()
    comp = union_find_components(
        pd.DataFrame({"id_a": p, "id_b": s})
    )
    want = {int(n): int(comp.get(n, n)) for n in got["node_id"]}
    assert {int(r.node_id): int(r.label)
            for r in got.itertuples()} == want

    a = _sorted(labelprop_q(SF).to_pandas())
    b = _sorted(labelprop(edges, n_iter=3, num_partitions=5).to_pandas())
    pd.testing.assert_frame_equal(a, b)


def test_triangle_count_matches_bruteforce(ray_session):
    """Engine triangle count == a direct adjacency-set count on the
    collected graph; bucket fan-out is semantics-free."""
    from bgdss_ray.ops.graph import copurchase_edges, triangle_count

    li = rd.read_parquet(f"{SF}/lineitem.parquet",
                         columns=["l_orderkey", "l_partkey"])
    li = li.filter(lambda r: r["l_orderkey"] % 13 == 0)
    edges = copurchase_edges(li).materialize()
    a = triangle_count(edges, num_partitions=64)
    b = triangle_count(edges, num_partitions=7)
    pd.testing.assert_frame_equal(a, b)

    e = edges.to_pandas().drop_duplicates()
    adj: dict = {}
    for u, v in zip(e["u"], e["v"]):
        adj.setdefault(u, set()).add(v)
    tri = 0
    wedges = 0
    for u, nbrs in adj.items():
        ns = sorted(nbrs)
        for i in range(len(ns)):
            for j in range(i + 1, len(ns)):
                wedges += 1
                if ns[j] in adj.get(ns[i], ()):
                    tri += 1
    assert int(a["n_edges"].iloc[0]) == len(e)
    assert int(a["n_wedges"].iloc[0]) == wedges
    assert int(a["n_triangles"].iloc[0]) == tri
