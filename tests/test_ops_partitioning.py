"""Explicit hash-range repartitioning: disjoint ranges, completeness."""

import numpy as np
import pyarrow as pa
import ray.data as rd

from bgdss_ray.ops.partitioning import (
    add_hash_range_bucket,
    repartition_by_hash_range,
)
from bgdss_ray.urlnorm import url_hash64


def test_bucket_is_range_partition():
    ids = [f"doc-{i}" for i in range(2000)]
    t = pa.table({"doc_id": pa.array(ids)})
    out = add_hash_range_bucket(t, "doc_id", 8)
    h = url_hash64(ids)
    b = out.column("hash_bucket").to_numpy(zero_copy_only=False)
    # bucket = top-3 bits → monotone in hash: sort by hash, buckets sorted
    order = np.argsort(h)
    assert (np.diff(b[order]) >= 0).all()
    assert set(b) <= set(range(8))
    assert len(set(b)) >= 6  # blake2b spreads well over 2000 keys


def test_repartition_blocks_hold_disjoint_ranges(ray_session):
    ids = [f"url-{i}" for i in range(5000)]
    ds = rd.from_arrow(pa.table({"doc_id": pa.array(ids)}))
    parts = repartition_by_hash_range(ds, "doc_id", 8)

    # contract: every bucket's rows are CO-LOCATED (wholly inside one
    # block — a block may pack several whole buckets), and distinct
    # buckets own disjoint hash ranges
    bucket_blocks: dict[int, set[int]] = {}
    bucket_span: dict[int, list[int]] = {}
    total = 0
    for bi, blk in enumerate(
        parts.iter_batches(batch_size=None, batch_format="pyarrow")
    ):
        if blk.num_rows == 0:
            continue
        total += blk.num_rows
        hs = url_hash64([str(v) for v in blk.column("doc_id").to_pylist()])
        bs = blk.column("hash_bucket").to_numpy(zero_copy_only=False)
        for b in np.unique(bs):
            bucket_blocks.setdefault(int(b), set()).add(bi)
            sub = hs[bs == b]
            sp = bucket_span.setdefault(int(b), [int(sub.min()), int(sub.max())])
            sp[0] = min(sp[0], int(sub.min()))
            sp[1] = max(sp[1], int(sub.max()))
    assert total == len(ids)  # nothing dropped
    for b, blocks in bucket_blocks.items():
        assert len(blocks) == 1, f"bucket {b} split across blocks {blocks}"
    spans = sorted((lo, hi) for lo, hi in bucket_span.values())
    for (_lo1, hi1), (lo2, _hi2) in zip(spans, spans[1:]):
        assert hi1 < lo2


def test_existing_hash_column_reused():
    ids = ["a", "b", "c"]
    h = url_hash64(ids)
    t = pa.table({"u": pa.array(ids), "url_hash": pa.array(h, type=pa.uint64())})
    via_col = add_hash_range_bucket(t, "u", 4)
    via_hash = add_hash_range_bucket(t, "u", 4, hash_col="url_hash")
    assert (
        via_col.column("hash_bucket").to_pylist()
        == via_hash.column("hash_bucket").to_pylist()
    )
