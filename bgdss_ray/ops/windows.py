"""Windowed / session aggregations over event streams.

Sessionization is the canonical training-data windowing op (user activity
→ sessions under an idle-gap rule). The distributed shape mirrors
``curate_corpus``: ONE hash-bucket shuffle co-locates each user's events,
then the whole bucket sessionizes VECTORIZED — one sort + diff + cumsum
over the bucket frame. A bucket holds MANY users (the user boundary is
just another break condition), so the python-call count is O(buckets),
not O(users) — the per-user ``map_groups`` shape would make 10^9 python
calls on a 10^9-user stream.

Determinism contract (SQL pairing, same as the ``sessionize`` oracle):
order within user = (ts, event_id); a session breaks when
ts - prev_ts > 30 min (strict); session_no is 1-based per user;
timestamps emitted as whole epoch seconds; money as exact integer cents —
all sums order-independent.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

DEFAULT_GAP_US = 30 * 60 * 1_000_000  # 30 min in microseconds

_EMPTY = {
    "user_id": "int64",
    "session_no": "int64",
    "n_events": "int64",
    "session_start": "int64",
    "session_end": "int64",
    "sum_value_cents": "int64",
}


def sessionize_bucket(g: pd.DataFrame, gap_us: int = DEFAULT_GAP_US
                      ) -> pd.DataFrame:
    """One bucket of users → per-session aggregate rows. Fully vectorized:
    one sort, one diff, one cumsum, one groupby-agg — regardless of how
    many users the bucket holds."""
    if not len(g):
        return pd.DataFrame({c: pd.Series([], dtype=t)
                             for c, t in _EMPTY.items()})
    g = g.sort_values(["user_id", "ts", "event_id"], kind="stable")
    ts_us = g["ts"].to_numpy(dtype="datetime64[us]").astype(np.int64)
    uid = g["user_id"].to_numpy()
    new_user = np.r_[True, uid[1:] != uid[:-1]]
    gap = np.r_[np.int64(0), ts_us[1:] - ts_us[:-1]]
    brk = new_user | (gap > gap_us)
    # session_no restarts at 1 per user: global cumsum of breaks minus the
    # cumsum value at the user's first row, + 1
    sid = np.cumsum(brk)
    first_of_user = np.flatnonzero(new_user)
    base = np.repeat(sid[first_of_user],
                     np.diff(np.r_[first_of_user, len(g)]))
    session_no = (sid - base + 1).astype(np.int64)
    vc = np.floor(g["value"].to_numpy(dtype=np.float64) * 100.0 + 0.5
                  ).astype(np.int64)
    epoch_s = np.floor_divide(ts_us, 1_000_000)  # whole seconds
    frame = pd.DataFrame(
        {
            "user_id": uid,
            "session_no": session_no,
            "epoch": epoch_s,
            "value_cents": vc,
        }
    )
    out = frame.groupby(["user_id", "session_no"], sort=False).agg(
        n_events=("epoch", "size"),
        session_start=("epoch", "min"),
        session_end=("epoch", "max"),
        sum_value_cents=("value_cents", "sum"),
    ).reset_index()
    out["n_events"] = out["n_events"].astype("int64")
    return out


def sessionize_events(ds, gap_us: int = DEFAULT_GAP_US,
                      n_buckets: int | None = None):
    """events Dataset → per-session aggregates. One shuffle (user-hash
    bucket groupby); everything else vectorized inside the bucket."""
    if n_buckets is None:
        # data-derived fan-out (same policy as curate/tfidf): per-bucket
        # frames bounded by data, no pure-overhead groups on small inputs
        from .joins import derived_buckets

        n_buckets = derived_buckets(ds.count())

    def bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["bucket"] = (df["user_id"].to_numpy() % n_buckets).astype(np.int64)
        return df

    from .frames import co_group_blocks

    return co_group_blocks(
        ds.map_batches(bucket, batch_format="pandas"),
        "bucket",  # key-local: sessions are per user_id ⊂ bucket
        lambda g: sessionize_bucket(g.drop(columns=["bucket"]), gap_us),
        pa.schema([("user_id", pa.int64()), ("session_no", pa.int64()),
                   ("n_events", pa.int64()), ("session_start", pa.int64()),
                   ("session_end", pa.int64()),
                   ("sum_value_cents", pa.int64())]),
    )


# ---------------------------------------------------------------------------
# Sliding-window aggregates
# ---------------------------------------------------------------------------
WINDOW_US = 3_600_000_000  # 1 h window
STRIDE_US = 900_000_000    # 15 min stride


def sliding_window_agg(ds, window_us: int = WINDOW_US,
                       stride_us: int = STRIDE_US):
    """Sliding-window event aggregates (count / value-cents sum /
    purchase count per [w, w+window) window, stride-aligned).

    Distributed shape: with window = k·stride every event belongs to
    EXACTLY k windows — (t mod stride) + i·stride < k·stride holds for
    all i in [0, k) — so the map side explodes each batch into its k
    window assignments AND pre-aggregates them per window (the combiner):
    the global ``groupby(window)`` shuffle moves O(blocks × windows)
    partial rows, never O(k × events). All measures are order-independent
    integer sums (cents via the repo-wide floor(v·100+0.5) contract), so
    block layout can't flip a bit and DuckDB replays the explode+group
    exactly.
    """
    if window_us % stride_us:
        raise ValueError("window must be a multiple of stride")
    k = window_us // stride_us

    def partial(t) -> pd.DataFrame:
        # normalize to µs regardless of the column's timestamp unit
        # (a raw cast("int64") would read ns storage as µs — 3.6 ms
        # windows instead of 1 h; same convention as sessionize_bucket)
        ts_us = (
            t.column("ts").to_numpy(zero_copy_only=False)
            .astype("datetime64[us]").astype(np.int64)
        )
        cents = np.floor(
            t.column("value").to_numpy(zero_copy_only=False) * 100.0 + 0.5
        ).astype(np.int64)
        purch = (
            t.column("event_type").to_numpy(zero_copy_only=False)
            == "purchase"
        ).astype(np.int64)
        base = ts_us // stride_us
        w = ((np.repeat(base, k).reshape(-1, k)
              - np.arange(k, dtype=np.int64)) * stride_us).ravel()
        f = pd.DataFrame(
            {
                "w_us": w,
                "cents": np.repeat(cents, k),
                "purch": np.repeat(purch, k),
            }
        )
        out = f.groupby("w_us", sort=False).agg(
            n_events=("cents", "size"),
            sum_value_cents=("cents", "sum"),
            n_purchases=("purch", "sum"),
        ).reset_index()
        out["n_events"] = out["n_events"].astype("int64")
        return out

    from ray.data.aggregate import Sum

    agg = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("w_us")
        .aggregate(
            Sum("n_events", alias_name="n_events"),
            Sum("sum_value_cents", alias_name="sum_value_cents"),
            Sum("n_purchases", alias_name="n_purchases"),
        )
    )

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "window_start": (
                    df["w_us"].to_numpy(dtype=np.int64) // 1_000_000
                ),
                "n_events": df["n_events"].astype("int64"),
                "sum_value_cents": df["sum_value_cents"].astype("int64"),
                "n_purchases": df["n_purchases"].astype("int64"),
            }
        )

    return agg.map_batches(finish, batch_format="pandas")


# Stride guard for band_bounds: the composite-key path needs
# n_codes * width to fit in int64. Module-level so tests can shrink it
# to force (and pin) the per-user-slice fallback.
STRIDE_GUARD = 2**62


def band_bounds(uid: np.ndarray, ts: np.ndarray,
                lo_delta: int, hi_delta: int,
                lo_side: str = "left", hi_side: str = "right"):
    """Per-key band bounds over USER-MAJOR SORTED (uid, ts) arrays: for
    every row i, the half-open index range [lo[i], hi[i]) of the same
    user's rows whose ts falls in the band [ts+lo_delta, ts+hi_delta]
    (band endpoints open or closed per searchsorted ``side`` semantics:
    lo_side='left' includes ties at the lower bound, hi_side='right'
    includes ties at the upper; pass lo_side='right' at delta 0 for a
    STRICTLY-after lower bound). This is the one shared implementation
    of the composite-key stride idiom (``banded_event_pairs``,
    ``range_window_sum``, ``followed_within_hour`` all hang on its
    margin proof).

    Both probes run as ONE vectorized searchsorted pair over the key
    ``codes * width + ts_rel``: with
    ``width = ts_span + max(|lo_delta|, |hi_delta|) + 2`` a probe at
    ``ts_rel + delta`` stays strictly above the previous user's largest
    key and strictly below the next user's smallest, so it can never
    bleed across users. When ``n_codes * width`` would overflow int64
    (ts spans of ~centuries), falls back to a per-user-slice
    searchsorted loop — Python per USER only on that path."""
    n = len(uid)
    lo = np.empty(n, dtype=np.int64)
    hi = np.empty(n, dtype=np.int64)
    if n == 0:
        return lo, hi
    lo_delta = np.int64(lo_delta)
    hi_delta = np.int64(hi_delta)
    ts_rel = ts - ts.min()
    breaks = (uid[1:] != uid[:-1]).astype(np.int64)
    codes = np.cumsum(np.r_[np.int64(0), breaks])
    width = (np.int64(ts_rel.max())
             + max(abs(lo_delta), abs(hi_delta)) + 2)
    n_codes = int(codes[-1]) + 1
    if n_codes > STRIDE_GUARD // int(width):
        starts = np.r_[np.flatnonzero(np.r_[True, uid[1:] != uid[:-1]]),
                       n]
        for s, e in zip(starts[:-1], starts[1:]):
            lo[s:e] = s + np.searchsorted(ts[s:e], ts[s:e] + lo_delta,
                                          side=lo_side)
            hi[s:e] = s + np.searchsorted(ts[s:e], ts[s:e] + hi_delta,
                                          side=hi_side)
    else:
        key = codes * width + ts_rel
        lo[:] = np.searchsorted(key, codes * width + (ts_rel + lo_delta),
                                side=lo_side)
        hi[:] = np.searchsorted(key, codes * width + (ts_rel + hi_delta),
                                side=hi_side)
    return lo, hi
