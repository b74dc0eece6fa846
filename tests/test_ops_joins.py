"""Partitioned hash joins: native vs explicit bucketed pattern."""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from bgdss_ray.ops.joins import bucketed_join, native_join

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def sides(ray_session):
    orders = rd.read_parquet(f"{SF}/orders.parquet",
                             columns=["o_orderkey", "o_custkey", "o_totalprice"])
    cust = rd.read_parquet(f"{SF}/customer.parquet",
                           columns=["c_custkey", "c_nationkey"])
    return orders, cust


def _norm(df):
    df = df[sorted(df.columns)].copy()
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def test_native_equals_bucketed(sides):
    orders, cust = sides
    a = native_join(orders, cust, on="o_custkey", right_on="c_custkey",
                    num_partitions=4).to_pandas()
    b = bucketed_join(orders, cust, on="o_custkey", right_on="c_custkey",
                      n_buckets=4)
    assert len(a) == len(b) > 0
    pd.testing.assert_frame_equal(_norm(a), _norm(b), check_dtype=False)


def test_bucketed_matches_pandas_merge(sides):
    orders, cust = sides
    got = bucketed_join(orders, cust, on="o_custkey", right_on="c_custkey")
    want = orders.to_pandas().merge(
        cust.to_pandas(), left_on="o_custkey", right_on="c_custkey"
    ).drop(columns=["c_custkey"])
    pd.testing.assert_frame_equal(_norm(got), _norm(want), check_dtype=False)


def test_asof_join_backward_matches_global_merge_asof(ray_session):
    """Co-partitioned per-group merge_asof == one global pandas merge_asof
    (by-key), including keys with no right rows (null fill)."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    import pyarrow as pa

    from bgdss_ray.ops.joins import asof_join_backward

    rng = np.random.RandomState(11)
    left = pd.DataFrame(
        {
            "lid": np.arange(60),
            "k": rng.randint(0, 5, 60),
            "t": pd.to_datetime("2024-01-01") + pd.to_timedelta(
                rng.randint(0, 10_000, 60), unit="m"
            ),
        }
    )
    right = pd.DataFrame(
        {
            "rk": rng.randint(0, 4, 25),  # key 4 has NO right rows
            "rt": pd.to_datetime("2024-01-01") + pd.to_timedelta(
                rng.randint(0, 10_000, 25), unit="m"
            ),
            "rv": np.arange(25, dtype=np.int64),
        }
    ).drop_duplicates(["rk", "rt"])  # unique per (key,time): deterministic

    got = asof_join_backward(
        rd.from_arrow(pa.Table.from_pandas(left, preserve_index=False)),
        rd.from_arrow(pa.Table.from_pandas(right, preserve_index=False)),
        left_by="k", right_by="rk", left_on="t", right_on="rt",
        right_value_cols=["rv"],
    ).to_pandas().sort_values("lid").reset_index(drop=True)

    want = pd.merge_asof(
        left.sort_values("t", kind="mergesort"),
        right.sort_values("rt", kind="mergesort"),
        left_on="t", right_on="rt", left_by="k", right_by="rk",
        direction="backward",
    ).sort_values("lid").reset_index(drop=True)

    assert len(got) == len(left)
    assert got["lid"].astype("int64").tolist() == want["lid"].tolist()
    assert got["rv"].fillna(-1).astype("int64").tolist() == \
        want["rv"].fillna(-1).astype("int64").tolist()
    assert got["rt"].fillna(pd.Timestamp(0)).tolist() == \
        want["rt"].fillna(pd.Timestamp(0)).tolist()
    # keys without right rows survive with nulls
    assert got[got["k"] == 4]["rv"].isna().all() or (left["k"] != 4).all()


def test_asof_join_date32_left_vs_timestamp_right(ray_session):
    """Heterogeneous temporal types: a date32 LEFT against a timestamp
    RIGHT must unify to timestamp[us] — the old reconciliation only
    checked whether the LEFT was a timestamp and sent this case through
    the int64 branch, comparing day counts against microseconds."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from bgdss_ray.ops.joins import asof_join_backward

    left_t = pa.table(
        {
            "lid": pa.array(np.arange(4, dtype=np.int64)),
            "k": pa.array([0, 0, 1, 1], type=pa.int64()),
            "d": pa.array(
                [pd.Timestamp("2024-01-02").date(),
                 pd.Timestamp("2024-01-05").date(),
                 pd.Timestamp("2024-01-03").date(),
                 pd.Timestamp("2024-01-01").date()],
                type=pa.date32(),
            ),
        }
    )
    right = pd.DataFrame(
        {
            "rk": np.array([0, 0, 1], dtype=np.int64),
            "rt": pd.to_datetime(
                ["2024-01-01 12:00", "2024-01-04 00:00", "2024-01-02 06:00"]
            ),
            "rv": np.array([10, 20, 30], dtype=np.int64),
        }
    )
    got = asof_join_backward(
        rd.from_arrow(left_t),
        rd.from_arrow(pa.Table.from_pandas(right, preserve_index=False)),
        left_by="k", right_by="rk", left_on="d", right_on="rt",
        right_value_cols=["rv"],
    ).to_pandas().sort_values("lid").reset_index(drop=True)
    # backward asof at day granularity vs intra-day right times:
    # lid0 (Jan 2) -> Jan 1 12:00 (10); lid1 (Jan 5) -> Jan 4 (20);
    # lid2 (Jan 3) -> Jan 2 06:00 (30); lid3 (Jan 1 00:00) -> none
    assert got["rv"].fillna(-1).astype("int64").tolist() == [10, 20, 30, -1]


def test_salted_join_equals_unsalted_on_skewed_keys(ray_session):
    """Salting changes placement, never membership: on a corpus where 3
    hot keys carry 70% of probe rows, the salted join's row multiset is
    identical to the plain bucketed join, and the hot sub-buckets
    actually receive the fanned-out rows."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from bgdss_ray.ops.joins import bucketed_join, salted_bucketed_join

    rng_keys = np.r_[
        np.repeat([7, 13, 42], 700),      # hot keys: 70% of rows
        np.arange(100, 1000)              # cold tail
    ]
    left = pd.DataFrame({
        "k": rng_keys.astype("int64"),
        "lv": np.arange(len(rng_keys), dtype="int64"),
    })
    right = pd.DataFrame({
        "k": np.arange(0, 1000, dtype="int64"),
        "rv": (np.arange(0, 1000, dtype="int64") * 3),
    })
    lds, rds = rd.from_pandas(left), rd.from_pandas(right)

    got = salted_bucketed_join(
        lds, rds, on="k", hot_keys=np.array([7, 13, 42]), n_salt=4
    )
    want = bucketed_join(lds, rds, on="k")
    key = lambda df: df.sort_values(list(df.columns)).reset_index(drop=True)
    pd.testing.assert_frame_equal(
        key(got[sorted(got.columns)]), key(want[sorted(want.columns)])
    )
    # every (hot key, lv) pairing survived exactly once
    hot_rows = got[got["k"].isin([7, 13, 42])]
    assert len(hot_rows) == 3 * 700
    assert hot_rows.duplicated(["k", "lv"]).sum() == 0
