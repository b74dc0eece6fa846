"""Similarity search: brute-force exactness vs numpy oracle, LSH recall."""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from bgdss_ray.ops.similarity import brute_force_topk, lsh_topk, recall_at_k

EMB = "/root/testdata/sf0.001/embeddings.parquet"


@pytest.fixture(scope="module")
def emb(ray_session):
    ds = rd.read_parquet(EMB)
    df = ds.to_pandas()
    q = df[df.vec_id < 5]
    qmat = np.asarray(q["embedding"].tolist(), dtype=np.float64)
    return ds, df, q["vec_id"].to_numpy(), qmat


def test_brute_force_matches_numpy_oracle(emb):
    ds, df, qids, qmat = emb
    got = brute_force_topk(ds, qids, qmat, k=10)
    m = np.asarray(df["embedding"].tolist(), dtype=np.float64)
    mn = m / np.linalg.norm(m, axis=1, keepdims=True)
    qn = qmat / np.linalg.norm(qmat, axis=1, keepdims=True)
    sims = mn @ qn.T
    ids = df["vec_id"].to_numpy()
    for j, qid in enumerate(qids):
        order = np.lexsort((ids, -sims[:, j]))[:10]
        want = ids[order].tolist()
        g = got[got.query_id == qid].sort_values("rank")
        assert g["id"].tolist() == want
        assert np.allclose(g["score"].to_numpy(), sims[order, j])


def test_self_is_top1(emb):
    ds, _df, qids, qmat = emb
    got = brute_force_topk(ds, qids, qmat, k=3)
    top1 = got[got["rank"] == 1]
    assert dict(zip(top1["query_id"], top1["id"])) == {q: q for q in qids}


def test_lsh_recall_reasonable(emb):
    ds, _df, qids, qmat = emb
    exact = brute_force_topk(ds, qids, qmat, k=10)
    approx = lsh_topk(ds, qids, qmat, k=10, n_planes=8)
    r = recall_at_k(approx, exact, k=10)
    assert r >= 0.5, f"LSH recall too low: {r}"
    # self vector always lands in its own bucket
    top1 = approx[approx["rank"] == 1]
    assert dict(zip(top1["query_id"], top1["id"])) == {q: q for q in qids}


def test_ivf_recall_reasonable(emb):
    from bgdss_ray.ops.similarity import ivf_topk

    ds, _df, qids, qmat = emb
    exact = brute_force_topk(ds, qids, qmat, k=10)
    approx = ivf_topk(ds, qids, qmat, k=10)
    r = recall_at_k(approx, exact, k=10)
    assert r >= 0.5, f"IVF recall too low: {r}"
    top1 = approx[approx["rank"] == 1]
    assert dict(zip(top1["query_id"], top1["id"])) == {q: q for q in qids}


def test_oracle_quantized_modes(emb):
    """Integer-plane / integer-centroid exact-quantized modes (the
    SQL-paired gate path): self still retrieves at rank 1 with score 1,
    recall stays reasonable, and the LSH keys match a from-scratch
    pure-python recompute of floor(x*2^20) sign bits over md5 weights."""
    from bgdss_ray.ops.similarity import (
        LshScorer, oracle_centroids, oracle_planes, ivf_topk,
    )

    ds, df, qids, qmat = emb
    exact = brute_force_topk(ds, qids, qmat, k=10)

    planes = oracle_planes(8, qmat.shape[1], 8)
    approx = lsh_topk(ds, qids, qmat, k=10, planes=planes)
    assert recall_at_k(approx, exact, k=10) >= 0.5
    top1 = approx[approx["rank"] == 1]
    assert dict(zip(top1["query_id"], top1["id"])) == {q: q for q in qids}
    assert np.allclose(top1["score"], 1.0)

    cents = oracle_centroids(16, qmat.shape[1])
    approx = ivf_topk(ds, qids, qmat, k=10, n_probe=8, cents=cents)
    assert recall_at_k(approx, exact, k=10) >= 0.5
    top1 = approx[approx["rank"] == 1]
    assert dict(zip(top1["query_id"], top1["id"])) == {q: q for q in qids}

    # keys: independent scalar recompute of the quantized sign-bit path
    sc = LshScorer({"planes": planes, "qids": qids, "qn": qmat,
                    "probes": np.zeros((len(qids), 8, 9), np.uint64)},
                   10, "vec_id", "embedding")
    m = np.asarray(df["embedding"].tolist(), dtype=np.float64)[:20]
    keys = sc.keys_of(m)
    import hashlib

    def w(s, mod):
        h = int.from_bytes(hashlib.md5(s.encode()).digest()[:8], "little")
        return (h % mod) - mod // 2

    for i in range(m.shape[0]):
        qv = [int(np.floor(v * (1 << 20))) for v in m[i]]
        for t in range(8):
            key = 0
            for b in range(8):
                dot = sum(
                    qv[j] * w(f"pl:{t}:{j}:{b}", 2000001)
                    for j in range(len(qv))
                )
                key |= (1 if dot > 0 else 0) << b
            assert key == int(keys[i, t])


def test_embedding_moments_block_layout_invariant(ray_session):
    """Mergeable integer partials: any block layout gives identical sums."""
    import pandas as pd

    from bgdss_ray.ops.similarity import embedding_moments

    df = pd.read_parquet("/root/testdata/sf0.001/embeddings.parquet",
                         columns=["vec_id", "embedding"])
    a = embedding_moments(rd.from_pandas(df)).to_pandas()
    parts = [df.iloc[i::7].reset_index(drop=True) for i in range(7)]
    ds7 = rd.from_pandas(parts)  # 7 blocks, interleaved rows
    b = embedding_moments(ds7).to_pandas()
    a = a.sort_values(["i", "j"]).reset_index(drop=True)
    b = b.sort_values(["i", "j"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


def test_pca_project_properties(ray_session):
    """Components orthonormal, variances = descending eigenvalues, and the
    projection matches a numpy PCA on the same quantized covariance."""
    import pandas as pd

    from bgdss_ray.ops.similarity import QUANT_SCALE, pca_project

    df = pd.read_parquet("/root/testdata/sf0.001/embeddings.parquet",
                         columns=["vec_id", "embedding"])
    ds = rd.from_pandas(df)
    proj, comp, evr = pca_project(ds, k=3)
    assert np.allclose(comp.T @ comp, np.eye(3), atol=1e-9)
    assert evr[0] >= evr[1] >= evr[2] >= 0
    out = proj.to_pandas().sort_values("vec_id")
    P = np.asarray(out["pc"].tolist())
    X = np.asarray(df.sort_values("vec_id")["embedding"].tolist(), dtype=np.float64)
    q = np.floor(X * QUANT_SCALE)
    mean = q.mean(axis=0) / QUANT_SCALE
    cov = (q.T @ q) / (len(q) * QUANT_SCALE**2) - np.outer(mean, mean)
    w, V = np.linalg.eigh(cov)
    lead = np.sort(w)[::-1][:3]
    # projected variance per component equals the eigenvalue (population var)
    pv = (P ** 2).sum(axis=0) / len(P) - (P.sum(axis=0) / len(P)) ** 2
    assert np.allclose(pv, lead, rtol=1e-6)


def test_label_centroids_merge_and_values(ray_session):
    """Partials merge layout-independently; centroid values match a direct
    numpy computation on the quantized matrix."""
    import pandas as pd

    from bgdss_ray.ops.similarity import QUANT_SCALE, label_centroids

    df = pd.read_parquet("/root/testdata/sf0.001/embeddings.parquet",
                         columns=["embedding", "label"])
    a = label_centroids(rd.from_pandas(df)).to_pandas()
    parts = [df.iloc[i::5].reset_index(drop=True) for i in range(5)]
    b = label_centroids(rd.from_pandas(parts)).to_pandas()
    key = ["label", "j"]
    pd.testing.assert_frame_equal(
        a.sort_values(key).reset_index(drop=True),
        b.sort_values(key).reset_index(drop=True),
    )
    X = np.asarray(df["embedding"].tolist(), dtype=np.float64)
    q = np.floor(X * QUANT_SCALE).astype(np.int64)
    lab = df["label"].to_numpy()
    for lb in np.unique(lab):
        sub = a[a.label == lb].sort_values("j")
        assert (sub["s"].to_numpy() == q[lab == lb].sum(axis=0)).all()
        assert (sub["n"] == int((lab == lb).sum())).all()
