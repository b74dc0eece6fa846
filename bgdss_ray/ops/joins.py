"""Large-side joins: hash-partitioned join when BOTH sides are big.

Two implementations (guide pattern):
- ``native_join``: Ray Data's built-in hash-partitioned ``Dataset.join``
  (available in this Ray version) — the default.
- ``bucketed_join``: the portable explicit pattern — add
  ``bucket = key % B`` to both sides, pad each side to the common schema,
  union, ``groupby(bucket)`` to co-locate, pandas-merge inside
  ``map_groups``. Works on any Ray version, and is where salting hot keys
  plugs in (append a salt digit to the bucket of skewed keys on the build
  side, replicate the probe side across salts).

Both produce identical results (tested); broadcast joins for small dims
live in queries.py (ray.put pattern).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def native_join(left, right, on: str, right_on: str | None = None,
                num_partitions: int = 16, join_type: str = "inner"):
    return left.join(
        right,
        join_type=join_type,
        num_partitions=num_partitions,
        on=(on,),
        right_on=(right_on or on,),
    )


def bucketed_join(
    left,
    right,
    on: str,
    right_on: str | None = None,
    n_buckets: int = 16,
    join_type: str = "inner",
) -> pd.DataFrame:
    """Explicit partitioned hash join; returns the collected join result
    (at cluster scale the per-bucket merge emits partitions instead of
    collecting)."""
    right_key = right_on or on
    l_schema = left.schema()
    r_schema = right.schema()
    l_cols = list(l_schema.names)
    r_cols = list(r_schema.names)
    l_types = dict(zip(l_schema.names, l_schema.types))
    r_types = dict(zip(r_schema.names, r_schema.types))
    all_cols = l_cols + [c for c in r_cols if c not in l_cols]
    all_types = {**r_types, **l_types}

    def tag(side_is_right: bool, key: str):
        def fn(t: pa.Table) -> pa.Table:
            n = t.num_rows
            keys = t.column(key).to_numpy(zero_copy_only=False)
            bucket = (keys.astype(np.int64) % n_buckets).astype(np.int32)
            arrays, names = [], []
            for c in all_cols:
                if c in t.schema.names:
                    arrays.append(t.column(c))
                else:
                    arrays.append(pa.nulls(n, type=all_types[c]))
                names.append(c)
            arrays.append(pa.array(bucket))
            names.append("bucket")
            arrays.append(pa.array(np.full(n, side_is_right)))
            names.append("is_right")
            return pa.Table.from_arrays(arrays, names=names)

        return fn

    lt = left.map_batches(tag(False, on), batch_format="pyarrow")
    rt = right.map_batches(tag(True, right_key), batch_format="pyarrow")

    def merge_bucket(g: pd.DataFrame) -> pd.DataFrame:
        l = g[~g["is_right"]][l_cols]
        r = g[g["is_right"]][r_cols]
        out_cols = l_cols + [c for c in r_cols if c not in l_cols and c != right_key]
        if l.empty and join_type == "inner":
            return pd.DataFrame(columns=out_cols)
        m = l.merge(r, how=join_type, left_on=on, right_on=right_key)
        # match Dataset.join's output: the right key column is redundant
        return m[out_cols]

    both = lt.union(rt)
    out = both.groupby("bucket").map_groups(merge_bucket, batch_format="pandas")
    return out.to_pandas()


def asof_join_backward(
    left,
    right,
    left_by: str,
    right_by: str,
    left_on: str,
    right_on: str,
    right_value_cols: list[str],
    n_buckets: int = 32,
) -> "object":
    """Backward as-of join: for each left row, the right row with the
    greatest ``right_on`` <= ``left_on`` within the same key group
    (inclusive — the usual trades/quotes semantics; DuckDB's
    ``ASOF LEFT JOIN`` with ``l.t >= r.t`` is the oracle pairing).

    Ray-Data-first: both sides are tagged into one union with a common
    (key, time, key-hash bucket) schema, co-located with ONE
    groupby(bucket) shuffle (B buckets, not one group per key), and each
    bucket merges ALL its keys in a single vectorized
    ``merge_asof(..., by=key)`` call — per-key python never runs.
    Unmatched left rows keep nulls. The right side must be unique per
    (key, time) for a deterministic winner — pre-aggregate upstream if it
    is not.
    """
    l_schema = left.schema()
    r_schema = right.schema()
    l_cols = list(l_schema.names)
    l_types = dict(zip(l_schema.names, l_schema.types))
    r_types = dict(zip(r_schema.names, r_schema.types))
    r_keep = [right_by, right_on] + right_value_cols

    def _bucket_of(col) -> pa.Array:
        v = col.to_numpy(zero_copy_only=False)
        if v.dtype.kind in "iu":
            h = v.astype(np.uint64)
            with np.errstate(over="ignore"):  # murmur fmix64 spread
                h = h ^ (h >> np.uint64(33))
                h = h * np.uint64(0xFF51AFD7ED558CCD)
                h = h ^ (h >> np.uint64(33))
        else:
            from ..urlnorm import url_hash64

            h = url_hash64([str(x) for x in v])
        return pa.array((h % np.uint64(n_buckets)).astype(np.int32))

    def tag_left(t: pa.Table) -> pa.Table:
        arrays = [t.column(left_by), t.column(left_on), _bucket_of(t.column(left_by))]
        names = ["__k", "__t", "__b"]
        for c in l_cols:
            arrays.append(t.column(c))
            names.append(c)
        for c in [right_on] + right_value_cols:
            arrays.append(pa.nulls(t.num_rows, type=r_types[c]))
            names.append(f"__r_{c}")
        arrays.append(pa.array(np.zeros(t.num_rows, dtype=bool)))
        names.append("__is_right")
        return pa.Table.from_arrays(arrays, names=names)

    def tag_right(t: pa.Table) -> pa.Table:
        t = t.select(r_keep)
        arrays = [t.column(right_by), t.column(right_on), _bucket_of(t.column(right_by))]
        names = ["__k", "__t", "__b"]
        for c in l_cols:
            arrays.append(pa.nulls(t.num_rows, type=l_types[c]))
            names.append(c)
        for c in [right_on] + right_value_cols:
            arrays.append(t.column(c))
            names.append(f"__r_{c}")
        arrays.append(pa.array(np.ones(t.num_rows, dtype=bool)))
        names.append("__is_right")
        return pa.Table.from_arrays(arrays, names=names)

    lt = left.map_batches(tag_left, batch_format="pyarrow")
    rt = right.map_batches(tag_right, batch_format="pyarrow")
    out_r_cols = [f"__r_{c}" for c in [right_on] + right_value_cols]

    def merge_bucket(g: pd.DataFrame) -> pd.DataFrame:
        lg = g[~g["__is_right"]][l_cols + ["__k", "__t"]].sort_values(
            "__t", kind="mergesort"
        )
        rg = g[g["__is_right"]][out_r_cols + ["__k", "__t"]].sort_values(
            "__t", kind="mergesort"
        )
        if lg.empty:
            return pd.DataFrame(columns=l_cols + out_r_cols)
        merged = pd.merge_asof(
            lg, rg, on="__t", by="__k",
            direction="backward", allow_exact_matches=True,
        )
        return merged[l_cols + out_r_cols]

    out = lt.union(rt).groupby("__b").map_groups(merge_bucket, batch_format="pandas")
    rename = {f"__r_{c}": c for c in [right_on] + right_value_cols}
    return out.map_batches(
        lambda df: df.rename(columns=rename), batch_format="pandas"
    )
