"""Typed-frame helpers for per-batch combiners.

Ray 2.49 logs ``RefBundle with a different schema … PandasBlockSchema
(names=[])`` warnings — and has aborted one real pipeline (the tfidf
round-3 incident) — whenever a map_batches UDF returns a schema-less
empty frame that later mixes with typed blocks in a union/shuffle. Every
per-batch combiner must therefore return a TYPED empty frame for an empty
input. This module is the one shared idiom (each combiner previously
hand-rolled its own ``_EMPTY`` constant).
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa

__all__ = ["typed_empty", "arrow_frame", "co_group_blocks"]


def co_group_blocks(ds, key: str, fn, schema: pa.Schema):
    """Bucket co-group without the schema-less-empty-block wart.

    ``groupby(key).map_groups(fn)`` compiles to ``sort(key)`` + one wrapper
    call per sorted block; for an EMPTY sort partition Ray's wrapper yields
    nothing and the operator emits a schema-less empty block (the
    RefBundle-warning / tfidf-r3-abort wart — unreachable from the UDF,
    which never runs). This helper is the same physical plan with two
    changes: ``fn`` runs once per BLOCK (a concatenation of whole groups —
    Ray's sort keeps equal key values in one block, the exact guarantee
    ``map_groups`` itself relies on), and an empty partition yields
    ``schema.empty_table()``.

    Contract: ``fn`` must be KEY-LOCAL — ``fn(concat of groups)`` row-equal
    to ``concat of fn(group)`` — true for any per-key combiner (per-src
    degree/rank folds, per-dst partial sums, per-key merges). ``fn`` takes
    the block as pandas (key column included, like map_groups) and returns
    pandas or Arrow; output is cast to ``schema``. Fewer Python calls than
    map_groups (O(blocks), not O(groups)) and every emitted block provably
    carries ``schema``.

    Known residual (Ray-internal, cosmetic): the Sort operator ITSELF
    emits a zero-field block per empty range partition (duplicate
    sampled boundaries on a low-cardinality key) and map_batches
    BYPASSES the UDF on 0-row input blocks, passing the empty through —
    so the ``schema.empty_table()`` branch below is unreachable on Ray
    2.49.2 and the executor logs one RefBundle-schema warning per empty
    partition: ``new schema: .`` when the sort's input blocks are Arrow,
    ``new schema: PandasBlockSchema(names=[])`` when they are pandas
    (verified with a minimal sort+typed-map repro, and again in round 5
    on the bucket co-group queries). Those blocks are empty and every
    downstream consumer here ends in ``to_pandas``/driver folds, so no
    data mixes schemas; the dangerous class (UDF-emitted untyped PANDAS
    empties unioned with typed blocks — the tfidf r3 abort) is what this
    helper eliminates."""

    def wrapper(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return schema.empty_table()
        out = fn(t.to_pandas())
        if isinstance(out, pd.DataFrame):
            if not len(out):
                return schema.empty_table()
            return pa.Table.from_pandas(out, schema=schema,
                                        preserve_index=False)
        return out.cast(schema)

    wrapper.__name__ = getattr(fn, "__name__", "co_group")
    return ds.sort(key).map_batches(
        wrapper, batch_size=None, batch_format="pyarrow"
    )


def co_group(ds, key: str, fn, schema):
    """Drop-in ``groupby(key).map_groups(fn)`` with typed empty partitions.

    Exactly map_groups semantics — ``fn`` is called once per GROUP (the
    sorted block is sliced at key boundaries, like Ray's own
    ``_apply_udf_to_groups``) — so no key-locality audit is needed; the
    only difference is that an empty sort partition emits
    ``schema.empty_table()`` instead of Ray's schema-less block (see
    :func:`co_group_blocks` for the wart). Use :func:`co_group_blocks`
    instead when ``fn`` is key-local (fewer Python calls).

    ``schema`` may be a ``pa.Schema`` or a zero-argument callable returning
    one (for output schemas only known at runtime, e.g. a data-derived
    pivot vocabulary)."""

    def wrapper(t: pa.Table):
        sch = schema() if callable(schema) else schema
        if t.num_rows == 0:
            return sch.empty_table()
        df = t.to_pandas()
        k = df[key].to_numpy()
        # sorted by key: group boundaries are where adjacent keys differ
        import numpy as np

        bounds = np.flatnonzero(k[1:] != k[:-1]) + 1
        starts = np.concatenate([[0], bounds])
        ends = np.concatenate([bounds, [len(df)]])
        outs = []
        for s, e in zip(starts, ends):
            out = fn(df.iloc[s:e])
            if isinstance(out, pa.Table):
                out = out.to_pandas()
            if len(out):
                outs.append(out)
        if not outs:
            return sch.empty_table()
        return pa.Table.from_pandas(pd.concat(outs, ignore_index=True),
                                    schema=sch, preserve_index=False)

    wrapper.__name__ = getattr(fn, "__name__", "co_group")
    return ds.sort(key).map_batches(
        wrapper, batch_size=None, batch_format="pyarrow"
    )


def arrow_frame(df: pd.DataFrame, schema: pa.Schema) -> pa.Table:
    """A combiner's pandas result as an Arrow block with an EXPLICIT
    schema. Preferred over returning the DataFrame: empty Arrow tables
    are precisely typed (no schema-less ``names=[]`` block, no Ray
    size-estimator warning on 0-row object columns) and every block of
    the stage provably shares one schema."""
    if not len(df):
        return schema.empty_table()
    return pa.Table.from_pandas(df, schema=schema, preserve_index=False)


def typed_empty(spec: dict[str, object]) -> pd.DataFrame:
    """A zero-row DataFrame whose columns carry the dtypes in ``spec``
    (column name → pandas dtype string/object, insertion order kept)."""
    return pd.DataFrame({c: pd.Series([], dtype=t) for c, t in spec.items()})


def fold_binned_counts(partials, keys, schema: pa.Schema,
                       bucket_col: str | None = None,
                       n_buckets: int = 64):
    """Final fold for (*keys, n) count partials WITHOUT Ray's
    groupby().aggregate(): on Ray 2.49 AggregateReduce's merge loop costs
    ~4.5 ms of CPU per OUTPUT group (measured: 55,653 (priority, bin)
    groups → ~250 s of merge CPU → 13 s wall at 32 CPUs, for 147k input
    rows), so any high-cardinality final fold must avoid it. The partials
    are bucketed on ``bucket_col % n_buckets`` (default: the last key; it
    must be an int column that is part of ``keys``) — every row of a key
    tuple shares that column, hence the bucket, hence ONE sorted block —
    so a single vectorized in-block pandas groupby-sum is already the
    FINAL result: one Sort exchange over the compacted partials plus
    O(blocks) python calls, never a per-group merge loop."""
    import numpy as np

    keys = list(keys)
    bcol = bucket_col if bucket_col is not None else keys[-1]

    def add_k(t: pa.Table) -> pa.Table:
        k = t.column(bcol).to_numpy(zero_copy_only=False) % n_buckets
        return t.append_column("_k", pa.array(k, type=pa.int64()))

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby(keys, sort=False, as_index=False)["n"].sum()

    keyed = partials.map_batches(add_k, batch_format="pyarrow")
    return co_group_blocks(keyed, "_k", fold, schema)
