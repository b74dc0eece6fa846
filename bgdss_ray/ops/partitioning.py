"""Explicit hash-range repartitioning (north rule: "explicit repartitioning
by URL-hash range").

The crawl hot path co-locates equal URL hashes via ``url_hash % K`` shard
routing (admission.py); this module is the general Dataset-level form: give
any dataset an explicit hash-RANGE bucket column and materialize one block
(or more) per bucket, so downstream per-bucket stages (dedup, joins,
frontier stores) see disjoint, contiguous hash ranges — the layout a
range-partitioned frontier table (Lance/parquet) would use on a cluster.

Range (high bits), not modulo (low bits), so bucket i owns the contiguous
interval [i * 2^64/P, (i+1) * 2^64/P) and a partition maps 1:1 onto a
storage range — mergeable, splittable, and scan-prunable by hash bound.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..urlnorm import url_hash64


def add_hash_range_bucket(batch: pa.Table, col: str, num_partitions: int,
                          hash_col: str | None = None) -> pa.Table:
    """Vectorized bucket assignment: bucket = high bits of the 64-bit hash
    (hash >> (64 - log2ceil(P)) clipped to P-1), i.e. a RANGE partition of
    hash space. If ``hash_col`` names an existing uint64 column it is used
    directly; otherwise ``col`` values are hashed with the engine-wide
    url_hash64."""
    if hash_col is not None and hash_col in batch.schema.names:
        h = batch.column(hash_col).to_numpy(zero_copy_only=False).astype(np.uint64)
    else:
        h = url_hash64([str(v) for v in batch.column(col).to_pylist()])
    bits = max(1, int(np.ceil(np.log2(num_partitions))))
    bucket = (h >> np.uint64(64 - bits)).astype(np.int64)
    np.minimum(bucket, num_partitions - 1, out=bucket)
    return batch.append_column("hash_bucket", pa.array(bucket))


def repartition_by_hash_range(ds, col: str, num_partitions: int,
                              hash_col: str | None = None):
    """Dataset → Dataset whose blocks hold disjoint hash RANGES of ``col``.

    One map pass assigns the range bucket; the groupby shuffle co-locates
    each bucket (each group emerges as its own block). Downstream
    map_batches stages then see every row of a hash range together —
    the partitioning contract exact dedup / seen-set stores rely on.
    Disjointness is asserted block-level in tests.
    """

    def ident(g):
        return g

    return (
        ds.map_batches(
            lambda b: add_hash_range_bucket(b, col, num_partitions, hash_col),
            batch_format="pyarrow",
        )
        .groupby("hash_bucket")
        .map_groups(ident, batch_format="pyarrow")
    )
