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
