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
