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


def derived_partitions(n_rows: int, rows_per_partition: int = 500_000,
                       floor: int = 8) -> int:
    """Shuffle/join fan-out sized by ROW COUNT (the tfidf rule): ~500k rows
    per partition keeps per-partition frames bounded by data at any corpus
    scale while avoiding pure-overhead partitions on small inputs. Pass the
    LARGER side's count (a parquet-metadata count is free)."""
    return max(floor, int(n_rows) // rows_per_partition + 1)


def derived_buckets(n_rows: int, rows_per_bucket: int = 100_000,
                    floor: int = 32) -> int:
    """Bucket-co-group fan-out sized by ROW COUNT — the companion of
    :func:`derived_partitions` for the key-hash bucket exchanges
    (sessionize, latest-event argmax, transitions, funnel, semi/set
    membership, banded pairs): ~100k rows per bucket keeps in-bucket
    frames bounded at any scale, floor 32 so small inputs still
    parallelize. Bucket count is semantics-free for every caller
    (asserted by their bucket-width-invariance tests); this is the one
    place the policy constants live."""
    return max(floor, int(n_rows) // rows_per_bucket)


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

    # ONE __t type across both tagged sides: the two time columns may
    # carry different timestamp units (e.g. events ts[us] vs orders
    # date[s]) and a unit-mixed union is a real heterogeneous-schema
    # stream. Microseconds is exact for s/ms/us storage. EITHER side
    # being temporal forces the timestamp target — casting only when the
    # LEFT was a timestamp sent a date32 left vs timestamp right through
    # the int64 branch, silently comparing day counts to microseconds;
    # likewise a float on either side forces float64 (an int64 cast
    # would truncate fractional times and move asof boundaries).
    t_type = l_types[left_on]
    rt_type = r_types[right_on]
    if t_type != rt_type:
        if pa.types.is_temporal(t_type) or pa.types.is_temporal(rt_type):
            t_type = pa.timestamp("us")
        elif pa.types.is_floating(t_type) or pa.types.is_floating(rt_type):
            t_type = pa.float64()
        else:
            t_type = pa.int64()

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
        arrays = [t.column(left_by), t.column(left_on).cast(t_type),
                  _bucket_of(t.column(left_by))]
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
        arrays = [t.column(right_by), t.column(right_on).cast(t_type),
                  _bucket_of(t.column(right_by))]
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

    from .frames import co_group_blocks

    out = co_group_blocks(
        lt.union(rt), "__b", merge_bucket,
        # key-local: merge_asof(by=__k) resolves per key ⊂ bucket
        pa.schema([(c, l_types[c]) for c in l_cols]
                  + [(f"__r_{c}", r_types[c])
                     for c in [right_on] + right_value_cols]),
    )
    rename = {f"__r_{c}": c for c in [right_on] + right_value_cols}

    def do_rename(t: pa.Table) -> pa.Table:
        return t.rename_columns([rename.get(c, c) for c in t.column_names])

    return out.map_batches(do_rename, batch_format="pyarrow")


def salted_bucketed_join(
    left,
    right,
    on: str,
    hot_keys: np.ndarray,
    n_salt: int = 8,
    n_buckets: int = 16,
) -> pd.DataFrame:
    """Hot-key-salted variant of :func:`bucketed_join` (inner, both sides
    large, LEFT side skewed on ``hot_keys``).

    Skew mitigation: a hot key's probe rows would all land in one bucket
    and serialize on one task. Instead, probe rows of hot keys fan out to
    ``n_salt`` sub-buckets (salt = a per-row counter mod n_salt — any
    row-local value works; it only balances load), while the BUILD side
    replicates its hot-key rows across all n_salt sub-buckets so every
    probe row still meets every matching build row exactly once. Cold
    keys use the plain single bucket. Result is row-identical to the
    unsalted join (asserted in tests) — salting changes placement, never
    membership. Bucket ids: cold = key % n_buckets, hot =
    n_buckets + hot_index * n_salt + salt (disjoint ranges). Hot-index
    lookup is a searchsorted against the sorted hot list (vectorized —
    the hot rows are by definition the bulk of the skewed side)."""
    hot = np.sort(np.asarray(hot_keys, dtype=np.int64))

    l_schema, r_schema = left.schema(), right.schema()
    l_cols, r_cols = list(l_schema.names), list(r_schema.names)
    l_types = dict(zip(l_schema.names, l_schema.types))
    r_types = dict(zip(r_schema.names, r_schema.types))
    all_types = {**r_types, **l_types}
    out_cols = l_cols + [c for c in r_cols if c not in l_cols]

    def _buckets(keys: np.ndarray):
        bucket = (keys % n_buckets).astype(np.int64)
        is_hot = np.isin(keys, hot)
        hidx = np.searchsorted(hot, keys[is_hot])
        return bucket, is_hot, hidx

    def _pad(t: pa.Table, bucket: np.ndarray, is_r: bool) -> pa.Table:
        cols = {}
        for c in out_cols:
            cols[c] = (t.column(c) if c in t.schema.names
                       else pa.nulls(t.num_rows, type=all_types[c]))
        cols["__b"] = pa.array(bucket)
        cols["__is_r"] = pa.array(np.full(t.num_rows, is_r))
        return pa.table(cols)

    def tag_probe(t: pa.Table) -> pa.Table:
        keys = t.column(on).to_numpy(zero_copy_only=False).astype(np.int64)
        bucket, is_hot, hidx = _buckets(keys)
        if is_hot.any():
            salt = np.arange(t.num_rows, dtype=np.int64) % n_salt
            bucket[is_hot] = n_buckets + hidx * n_salt + salt[is_hot]
        return _pad(t, bucket, False)

    def tag_build(t: pa.Table) -> pa.Table:
        keys = t.column(on).to_numpy(zero_copy_only=False).astype(np.int64)
        bucket, is_hot, hidx = _buckets(keys)
        cold_idx = np.flatnonzero(~is_hot)
        hot_idx = np.flatnonzero(is_hot)
        # replicate hot build rows across every salt sub-bucket
        take = np.concatenate([cold_idx, np.repeat(hot_idx, n_salt)])
        tt = t.take(pa.array(take))
        hb = (
            n_buckets + hidx[:, None] * n_salt
            + np.arange(n_salt, dtype=np.int64)[None, :]
        ).ravel()
        bt = np.concatenate([bucket[cold_idx], hb])
        return _pad(tt, bt, True)

    both = left.map_batches(tag_probe, batch_format="pyarrow").union(
        right.map_batches(tag_build, batch_format="pyarrow")
    )

    def merge_bucket(g: pd.DataFrame) -> pd.DataFrame:
        l = g[~g["__is_r"]][l_cols]
        r = g[g["__is_r"]][r_cols]
        if l.empty or r.empty:
            return pd.DataFrame(columns=out_cols)
        m = l.merge(r, how="inner", on=on, sort=False)
        return m[out_cols]

    out = both.groupby("__b").map_groups(merge_bucket, batch_format="pandas")
    return out.to_pandas()
