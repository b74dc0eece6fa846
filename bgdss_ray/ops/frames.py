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

__all__ = ["typed_empty", "with_typed_empty", "arrow_frame"]


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


def with_typed_empty(spec: dict[str, object]):
    """Decorator: short-circuit an empty input batch to the typed empty
    frame so the wrapped combiner never emits a schema-less block."""

    def deco(fn):
        def wrapped(df, *a, **kw):
            if not len(df):
                return typed_empty(spec)
            return fn(df, *a, **kw)

        wrapped.__name__ = getattr(fn, "__name__", "wrapped")
        wrapped.__doc__ = fn.__doc__
        return wrapped

    return deco
