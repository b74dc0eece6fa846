"""Property tests for the round-5 operator additions (mode, transitions,
funnel, grouped corr moments, skyline, semi join). The SQL parity of each
lives in test_driver_contract; these pin the algorithmic kernels against
brute-force oracles and the combiner merge properties."""

import numpy as np
import pandas as pd

from bgdss_ray.queries import _skyline_2d

SF = "/root/testdata/sf0.001"


def _brute_skyline(df: pd.DataFrame) -> set:
    """O(n^2) dominance oracle: keep a iff nobody is (<= price, >= size)
    with one strict."""
    pts = df[["p_partkey", "p_retailprice", "p_size"]].to_numpy()
    keep = set()
    for k, p, s in pts:
        dominated = any(
            (p2 <= p and s2 >= s and (p2 < p or s2 > s))
            for _, p2, s2 in pts
        )
        if not dominated:
            keep.add(int(k))
    return keep


def test_skyline_kernel_matches_bruteforce():
    rng = np.random.default_rng(7)
    for trial in range(5):
        n = int(rng.integers(5, 200))
        df = pd.DataFrame(
            {
                "p_partkey": np.arange(n, dtype=np.int64),
                # few distinct values => plenty of price/size ties
                "p_retailprice": rng.choice([1.0, 2.0, 2.5, 3.0], n),
                "p_size": rng.integers(1, 6, n).astype(np.int32),
            }
        )
        got = set(_skyline_2d(df)["p_partkey"].astype(int))
        assert got == _brute_skyline(df), f"trial {trial}"


def test_skyline_is_mergeable():
    """pareto(A ∪ B) == pareto(pareto(A) ∪ pareto(B)) — the property the
    per-batch combiner relies on, at every split point."""
    rng = np.random.default_rng(11)
    df = pd.DataFrame(
        {
            "p_partkey": np.arange(60, dtype=np.int64),
            "p_retailprice": rng.choice([1.0, 1.5, 2.0], 60),
            "p_size": rng.integers(1, 5, 60).astype(np.int32),
        }
    )
    whole = set(_skyline_2d(df)["p_partkey"])
    for cut in (1, 17, 30, 59):
        a, b = df.iloc[:cut], df.iloc[cut:]
        merged = pd.concat([_skyline_2d(a), _skyline_2d(b)])
        assert set(_skyline_2d(merged)["p_partkey"]) == whole, cut


def test_skyline_keeps_duplicate_points():
    df = pd.DataFrame(
        {
            "p_partkey": np.array([1, 2, 3], dtype=np.int64),
            "p_retailprice": [1.0, 1.0, 2.0],
            "p_size": np.array([5, 5, 4], dtype=np.int32),
        }
    )
    # the two identical (1.0, 5) points are mutually non-dominating
    assert set(_skyline_2d(df)["p_partkey"]) == {1, 2}


def test_event_transitions_matches_pandas(ray_session):
    from bgdss_ray.queries import event_transitions

    got = (
        event_transitions(SF)
        .to_pandas()
        .sort_values(["prev_type", "next_type"])
        .reset_index(drop=True)
    )
    ev = pd.read_parquet(f"{SF}/events.parquet",
                         columns=["event_id", "user_id", "ts", "event_type"])
    ev = ev.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
    same = ev["user_id"].to_numpy()[1:] == ev["user_id"].to_numpy()[:-1]
    et = ev["event_type"].to_numpy()
    want = (
        pd.DataFrame({"prev_type": et[:-1][same], "next_type": et[1:][same]})
        .groupby(["prev_type", "next_type"])
        .size()
        .reset_index(name="n")
        .sort_values(["prev_type", "next_type"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    # transition total == events - users-with-events (n-1 pairs per user)
    assert got["n"].sum() == len(ev) - ev["user_id"].nunique()


def test_funnel_matches_pandas(ray_session):
    from bgdss_ray.queries import funnel_conversion

    got = funnel_conversion(SF)
    ev = pd.read_parquet(f"{SF}/events.parquet",
                         columns=["user_id", "ts", "event_type"])
    firsts = {}
    for step in ("signup", "view", "purchase"):
        firsts[step] = (
            ev[ev["event_type"] == step].groupby("user_id")["ts"].min()
        )
    m = pd.DataFrame(firsts)  # outer-joined on user_id index, NaT missing
    n_signup = int(m["signup"].notna().sum())
    va = m["view"] > m["signup"]
    assert int(got["n_signup"].iloc[0]) == n_signup
    assert int(got["n_view_after"].iloc[0]) == int(va.sum())
    assert int(got["n_funnel"].iloc[0]) == int(
        (va & (m["purchase"] > m["view"])).sum()
    )
    # funnel is monotone non-increasing
    r = got.iloc[0]
    assert r["n_signup"] >= r["n_view_after"] >= r["n_funnel"]


def test_mode_tiebreak_is_brand_ascending(ray_session):
    """Every reported mode row must carry the max count for its size, and
    be the lexicographically smallest brand among count-ties."""
    from bgdss_ray.queries import mode_per_group

    got = mode_per_group(SF)
    part = pd.read_parquet(f"{SF}/part.parquet", columns=["p_size", "p_brand"])
    cnt = part.groupby(["p_size", "p_brand"]).size().reset_index(name="n")
    for _, row in got.iterrows():
        grp = cnt[cnt["p_size"] == row["p_size"]]
        mx = grp["n"].max()
        assert row["n"] == mx
        ties = sorted(grp.loc[grp["n"] == mx, "p_brand"])
        assert row["p_brand"] == ties[0]


def test_cube_extends_rollup_by_cross_margin(ray_session):
    """CUBE = ROLLUP ∪ the (ALL, status) margin rows; the shared rows are
    value-identical (same single-shuffle engine, different level list)."""
    from bgdss_ray.queries import cube_sales_q, rollup_sales_q

    cube = cube_sales_q(SF).to_pandas()
    roll = rollup_sales_q(SF).to_pandas()
    key = ["l_returnflag", "l_linestatus"]
    merged = roll.merge(cube, on=key, suffixes=("_r", "_c"))
    assert len(merged) == len(roll)  # every rollup row appears in cube
    assert (merged["sum_cents_r"] == merged["sum_cents_c"]).all()
    assert (merged["n_rows_r"] == merged["n_rows_c"]).all()
    extra = cube.merge(roll, on=key, how="left", indicator=True)
    extra = extra[extra["_merge"] == "left_only"]
    # the extra grouping set is exactly (ALL, status) per status value
    assert (extra["l_returnflag"] == "::ALL::").all()
    assert (extra["l_linestatus"] != "::ALL::").all()
    # cross margins sum to the grand total
    grand = roll.loc[(roll["l_returnflag"] == "::ALL::")
                     & (roll["l_linestatus"] == "::ALL::"), "sum_cents"]
    assert extra["sum_cents_x"].sum() == int(grand.iloc[0])


def test_set_membership_algebra(ray_session):
    """INTERSECT / EXCEPT / UNION derived from the membership table match
    pandas set ops on the raw keys."""
    from bgdss_ray.queries import set_membership

    m = set_membership(SF).to_pandas()
    ev = set(pd.read_parquet(f"{SF}/events.parquet",
                             columns=["user_id"])["user_id"])
    od = set(pd.read_parquet(f"{SF}/orders.parquet",
                             columns=["o_custkey"])["o_custkey"])
    assert set(m["k"]) == ev | od
    assert set(m.loc[m["in_events"] & m["in_orders"], "k"]) == ev & od
    assert set(m.loc[m["in_orders"] & ~m["in_events"], "k"]) == od - ev
    assert m["k"].is_unique
    assert (m["in_events"] | m["in_orders"]).all()


def test_percentile_cont_reconstructs_quantile_cont(ray_session):
    """The all-integer (lo, hi, frac_centi) triple reconstructs DuckDB's
    quantile_cont double exactly (within float tolerance), and the
    invariants hold: lo <= hi, frac in [0, 100), frac=0 => lo=hi rank."""
    import duckdb

    from bgdss_ray.queries import percentile_cont

    got = percentile_cont(SF)
    assert (got["lo_cents"] <= got["hi_cents"]).all()
    assert got["frac_centi"].between(0, 99).all()
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW orders AS SELECT * FROM read_parquet('{SF}/orders.parquet')"
    )
    qc = con.execute(
        "SELECT o_orderpriority, quantile_cont("
        "CAST(FLOOR(o_totalprice*100+0.5) AS BIGINT), [0.50,0.90,0.99]) q "
        "FROM orders GROUP BY 1"
    ).fetchdf()
    for _, r in qc.iterrows():
        for pct, qv in zip((50, 90, 99), r["q"]):
            e = got[(got["o_orderpriority"] == r["o_orderpriority"])
                    & (got["pct"] == pct)].iloc[0]
            interp = e["lo_cents"] + e["frac_centi"] / 100.0 * (
                e["hi_cents"] - e["lo_cents"])
            assert abs(interp - qv) < 1e-6


def test_funnel_partial_handles_missing_step_types():
    """A batch lacking an ENTIRE step (type-clustered row groups, small
    trailing batches) must still emit typed timestamp columns — the
    pivot omits the column and a float64-NaN stand-in cannot cast to
    Arrow timestamp (the bug the round-5 review caught)."""
    from bgdss_ray.queries import _FUNNEL_PARTIAL, _funnel_partial

    ts = pd.Timestamp("2024-01-01")
    df = pd.DataFrame(
        {"user_id": np.array([1, 2], dtype=np.int64),
         "ts": pd.Series([ts, ts + pd.Timedelta("1h")],
                         dtype="datetime64[us]"),
         "event_type": ["view", "view"]}  # no signup, no purchase
    )
    t = _funnel_partial(df, n_buckets=4)
    assert t.schema.equals(_FUNNEL_PARTIAL)
    assert t.num_rows == 2
    assert t.column("ts_signup").null_count == 2
    assert t.column("ts_purchase").null_count == 2
    # and a batch with no funnel steps at all stays typed-empty
    none = df.assign(event_type="error")
    t0 = _funnel_partial(none, n_buckets=4)
    assert t0.schema.equals(_FUNNEL_PARTIAL) and t0.num_rows == 0


def test_grouped_mad_matches_pandas_oracle(ray_session):
    """Engine MAD == a direct pandas quantile_disc-of-absolute-deviations
    per group, and the defining property holds: at least ceil(n/2) of a
    group lies within mad of its median."""
    from bgdss_ray.queries import grouped_mad

    got = grouped_mad(SF)
    orders = pd.read_parquet(f"{SF}/orders.parquet",
                             columns=["o_orderpriority", "o_totalprice"])
    cents = np.floor(
        orders["o_totalprice"].to_numpy(np.float64) * 100.0 + 0.5
    ).astype(np.int64)
    orders = orders.assign(v=cents)

    def qdisc(a: np.ndarray) -> int:  # smallest x with CDF >= 0.5
        a = np.sort(a)
        return int(a[int(np.ceil(0.5 * len(a))) - 1])

    for _, row in got.iterrows():
        g = orders.loc[orders["o_orderpriority"] == row["o_orderpriority"],
                       "v"].to_numpy()
        med = qdisc(g)
        assert row["median_cents"] == med
        assert row["mad_cents"] == qdisc(np.abs(g - med))
        assert (np.abs(g - med) <= row["mad_cents"]).sum() >= np.ceil(
            len(g) / 2)


def test_mixture_sample_rates_and_determinism(ray_session):
    """Per-source keep decisions equal the md5-threshold rule row-for-row
    (so the sample is deterministic and repartition-invariant), and the
    configured mixture is monotone in source rank."""
    import hashlib

    from bgdss_ray.queries import mixture_sample

    got = mixture_sample(SF).to_pandas()
    docs = pd.read_parquet(f"{SF}/documents.parquet",
                           columns=["doc_id", "source"])
    srcs = sorted(set(docs["source"]), key=lambda s: s.encode())
    n = len(srcs)
    th = {s: int((i + 1) / (n + 1) * 2**32) for i, s in enumerate(srcs)}
    h32 = docs["doc_id"].map(
        lambda i: int.from_bytes(
            hashlib.md5(str(i).encode()).digest()[:4], "big")
    )
    want = docs[h32 < docs["source"].map(th)]
    assert set(got["doc_id"]) == set(want["doc_id"])
    # higher-ranked sources keep larger fractions (weakly, small counts)
    rates = got.groupby("source").size() / docs.groupby("source").size()
    rates = rates.reindex(srcs).fillna(0.0)
    assert rates.iloc[-1] > rates.iloc[0]


def test_topk_with_ties_keeps_all_boundary_ties(ray_session, tmp_path):
    """RANK()<=3 semantics on a crafted table WITH ties: every boundary
    tie survives (rows > 3 per group), matching a pandas RANK oracle —
    the tie case the uniform driver tables never exercise."""
    from bgdss_ray.queries import topk_with_ties

    orders = pd.DataFrame(
        {
            "o_orderkey": np.arange(12, dtype=np.int64),
            "o_orderpriority": ["A"] * 6 + ["B"] * 6,
            # A: top value 9.0 appears 4x -> rank 1 x4, all kept (4 rows)
            # B: 8.0, 7.0, then 6.0 twice at rank 3 -> 4 rows kept
            "o_totalprice": [9.0, 9.0, 9.0, 9.0, 5.0, 4.0,
                             8.0, 7.0, 6.0, 6.0, 5.0, 4.0],
        }
    )
    orders.to_parquet(tmp_path / "orders.parquet")
    got = topk_with_ties(str(tmp_path))
    r = (orders.groupby("o_orderpriority")["o_totalprice"]
         .rank(method="min", ascending=False))
    want = orders[r <= 3]
    assert set(got["o_orderkey"]) == set(want["o_orderkey"])
    assert len(got[got["o_orderpriority"] == "A"]) == 4
    assert len(got[got["o_orderpriority"] == "B"]) == 4


def test_semi_join_complements_antijoin(ray_session):
    """semi(urgent) ∪ anti(urgent) partitions customer exactly."""
    from bgdss_ray.queries import semi_join_urgent

    semi = semi_join_urgent(SF).to_pandas()
    cust = pd.read_parquet(f"{SF}/customer.parquet", columns=["c_custkey"])
    orders = pd.read_parquet(f"{SF}/orders.parquet",
                             columns=["o_custkey", "o_orderpriority"])
    urgent = set(orders.loc[orders["o_orderpriority"] == "1-URGENT",
                            "o_custkey"])
    want = set(cust["c_custkey"]) & urgent
    assert set(semi["c_custkey"]) == want
    assert semi["c_custkey"].is_unique


def test_interarrival_matches_pandas(ray_session):
    from bgdss_ray.queries import interarrival_stats

    got = (interarrival_stats(SF).to_pandas()
           .sort_values("event_type").reset_index(drop=True))
    ev = pd.read_parquet(f"{SF}/events.parquet",
                         columns=["event_id", "user_id", "ts", "event_type"])
    ev = ev.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
    ts_us = ev["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
    uid = ev["user_id"].to_numpy()
    same = uid[1:] == uid[:-1]
    part = pd.DataFrame({"event_type": ev["event_type"].to_numpy()[1:][same],
                         "gap_us": (ts_us[1:] - ts_us[:-1])[same]})
    want = (part.groupby("event_type")["gap_us"]
            .agg(n_gaps="size", sum_gap_us="sum",
                 min_gap_us="min", max_gap_us="max")
            .reset_index().sort_values("event_type").reset_index(drop=True))
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    # every non-first event of each user contributes exactly one gap
    assert got["n_gaps"].sum() == len(ev) - ev["user_id"].nunique()
    assert (got["min_gap_us"] >= 0).all()  # sorted order => no negatives


def test_user_streaks_matches_pandas(ray_session):
    from bgdss_ray.queries import user_streaks

    got = (user_streaks(SF).to_pandas()
           .sort_values("streak_len").reset_index(drop=True))
    ev = pd.read_parquet(f"{SF}/events.parquet", columns=["user_id", "ts"])
    ud = pd.DataFrame({
        "u": ev["user_id"].to_numpy(),
        "d": ev["ts"].to_numpy().astype("datetime64[D]").astype(np.int64),
    }).drop_duplicates().sort_values(["u", "d"])
    isl = ud["d"].to_numpy() - ud.groupby("u").cumcount().to_numpy()
    slen = (pd.DataFrame({"u": ud["u"].to_numpy(), "i": isl})
            .groupby(["u", "i"]).size())
    longest = slen.groupby(level="u").max()
    want = (longest.value_counts().sort_index()
            .rename_axis("streak_len").reset_index(name="n_users"))
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    # each user appears exactly once in the distribution; streaks >= 1
    assert got["n_users"].sum() == ev["user_id"].nunique()
    assert got["streak_len"].min() >= 1


def test_q12_priority_lines_matches_pandas(ray_session):
    from bgdss_ray.queries import q12_priority_lines

    got = (q12_priority_lines(SF).to_pandas()
           .sort_values("l_returnflag").reset_index(drop=True))
    line = pd.read_parquet(f"{SF}/lineitem.parquet",
                           columns=["l_orderkey", "l_returnflag"])
    orders = pd.read_parquet(f"{SF}/orders.parquet",
                             columns=["o_orderkey", "o_orderpriority"])
    m = line.merge(orders, left_on="l_orderkey", right_on="o_orderkey")
    hi = m["o_orderpriority"].isin(["1-URGENT", "2-HIGH"])
    want = (pd.DataFrame({"l_returnflag": m["l_returnflag"],
                          "high_lines": hi.astype(int),
                          "low_lines": (~hi).astype(int)})
            .groupby("l_returnflag").sum().reset_index())
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    # every lineitem row lands in exactly one side of the CASE
    assert got["high_lines"].sum() + got["low_lines"].sum() == len(line)


def test_moving_sum_rows_matches_pandas(ray_session):
    from bgdss_ray.queries import moving_sum_rows

    got = (moving_sum_rows(SF).to_pandas()
           .sort_values("event_id").reset_index(drop=True))
    ev = pd.read_parquet(f"{SF}/events.parquet",
                         columns=["event_id", "user_id", "ts", "value"])
    ev = ev.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
    ev["cents"] = np.floor(ev["value"].to_numpy() * 100.0 + 0.5).astype(
        np.int64)
    want = (ev.assign(moving_sum_cents=(
                ev.groupby("user_id")["cents"]
                .rolling(3, min_periods=1).sum()
                .reset_index(level=0, drop=True).astype(np.int64)))
            [["event_id", "moving_sum_cents"]]
            .sort_values("event_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    # each user's first event windows over itself alone
    firsts = ev.groupby("user_id").head(1)
    lookup = got.set_index("event_id")["moving_sum_cents"]
    assert (lookup.loc[firsts["event_id"]].to_numpy()
            == firsts["cents"].to_numpy()).all()


def test_dense_rank_orders_matches_pandas(ray_session):
    from bgdss_ray.queries import dense_rank_orders

    got = (dense_rank_orders(SF).to_pandas()
           .sort_values("o_orderkey").reset_index(drop=True))
    orders = pd.read_parquet(
        f"{SF}/orders.parquet",
        columns=["o_orderkey", "o_orderpriority", "o_totalprice"])
    cents = np.floor(orders["o_totalprice"].to_numpy() * 100.0 + 0.5
                     ).astype(np.int64)
    want = (orders.assign(
                dense_rank=pd.Series(cents)
                .groupby(orders["o_orderpriority"].to_numpy())
                .rank(method="dense").astype(np.int64).to_numpy())
            [["o_orderkey", "dense_rank"]]
            .sort_values("o_orderkey").reset_index(drop=True))
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    # defining property: within each priority the ranks are exactly
    # 1..n_distinct with no gaps, and equal cents share a rank
    m = got.merge(orders, on="o_orderkey")
    for prio, g in m.groupby("o_orderpriority"):
        ranks = np.sort(g["dense_rank"].unique())
        assert ranks[0] == 1 and ranks[-1] == len(ranks)
        cc = np.floor(g["o_totalprice"].to_numpy() * 100.0 + 0.5)
        assert (pd.DataFrame({"c": cc, "r": g["dense_rank"]})
                .groupby("c")["r"].nunique() == 1).all()


def test_range_window_sum_matches_bruteforce(ray_session):
    from bgdss_ray.queries import range_window_sum

    got = (range_window_sum(SF).to_pandas()
           .sort_values("event_id").reset_index(drop=True))
    ev = pd.read_parquet(f"{SF}/events.parquet",
                         columns=["event_id", "user_id", "ts", "value"])
    cents = np.floor(ev["value"].to_numpy() * 100.0 + 0.5).astype(np.int64)
    ts = ev["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
    uid = ev["user_id"].to_numpy()
    look = np.int64(24 * 3600 * 1_000_000)
    # independent O(n^2)-per-user oracle: position-free [t-24h, t]
    # membership, so equal-ts peers share one frame by construction
    # (the RANGE rule pandas' row-wise rolling gets wrong on ties)
    want = np.empty(len(ev), dtype=np.int64)
    for i in range(len(ev)):
        m = (uid == uid[i]) & (ts >= ts[i] - look) & (ts <= ts[i])
        want[i] = cents[m].sum()
    oracle = (pd.DataFrame({"event_id": ev["event_id"],
                            "range_sum_cents": want})
              .sort_values("event_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(got, oracle, check_dtype=False)
    # frame always contains the row itself: a user's earliest event's
    # frame is exactly its own value
    first = (ev.assign(c=cents, t=ts).sort_values("t")
             .groupby("user_id").first())
    lookup = got.set_index("event_id")["range_sum_cents"]
    assert (lookup.loc[first["event_id"]].to_numpy()
            == first["c"].to_numpy()).all()


def test_above_avg_orders_matches_pandas(ray_session):
    from bgdss_ray.queries import above_avg_orders

    got = set(above_avg_orders(SF).to_pandas()["o_orderkey"])
    orders = pd.read_parquet(
        f"{SF}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_totalprice"])
    cents = np.floor(orders["o_totalprice"].to_numpy() * 100.0 + 0.5
                     ).astype(np.int64)
    grp = pd.Series(cents).groupby(orders["o_custkey"].to_numpy())
    keep = cents * grp.transform("size").to_numpy() > \
        grp.transform("sum").to_numpy()
    want = set(orders["o_orderkey"].to_numpy()[keep])
    assert got == want
    # anti-concentration: per customer the minimum order never qualifies,
    # so every customer keeps strictly fewer orders than they have
    sel = orders[orders["o_orderkey"].isin(got)]
    n_sel = sel.groupby("o_custkey").size()
    n_all = orders.groupby("o_custkey").size()
    assert (n_sel < n_all.loc[n_sel.index]).all()


def test_percent_rank_orders_matches_pandas(ray_session):
    from bgdss_ray.queries import percent_rank_orders

    got = (percent_rank_orders(SF).to_pandas()
           .sort_values("o_orderkey").reset_index(drop=True))
    orders = pd.read_parquet(
        f"{SF}/orders.parquet",
        columns=["o_orderkey", "o_orderpriority", "o_totalprice"])
    cents = np.floor(orders["o_totalprice"].to_numpy() * 100.0 + 0.5
                     ).astype(np.int64)
    grp = pd.Series(cents).groupby(orders["o_orderpriority"].to_numpy())
    want = (orders.assign(
                rnk=grp.rank(method="min").astype(np.int64).to_numpy(),
                n_rows=grp.transform("size").astype(np.int64).to_numpy())
            [["o_orderkey", "rnk", "n_rows"]]
            .sort_values("o_orderkey").reset_index(drop=True))
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    # RANK invariants per priority: min rank is 1, the count of rank-1
    # rows equals the multiplicity of the minimum, max rank + its tie
    # count - 1 == n_rows, and n_rows is the group size
    m = got.merge(orders, on="o_orderkey")
    for prio, g in m.groupby("o_orderpriority"):
        assert g["rnk"].min() == 1
        assert (g["n_rows"] == len(g)).all()
        cc = np.floor(g["o_totalprice"].to_numpy() * 100.0 + 0.5)
        assert (g["rnk"] == 1).sum() == (cc == cc.min()).sum()
        top = g["rnk"].max()
        assert top + (g["rnk"] == top).sum() - 1 == len(g)


def test_row_number_ntile_matches_pandas(ray_session):
    from bgdss_ray.queries import row_number_ntile

    got = (row_number_ntile(SF).to_pandas()
           .sort_values("o_orderkey").reset_index(drop=True))
    orders = pd.read_parquet(
        f"{SF}/orders.parquet",
        columns=["o_orderkey", "o_orderpriority", "o_totalprice"])
    cents = np.floor(orders["o_totalprice"].to_numpy() * 100.0 + 0.5
                     ).astype(np.int64)
    o = orders.assign(cents=cents).sort_values(
        ["o_orderpriority", "cents", "o_orderkey"], kind="mergesort")
    rn = o.groupby("o_orderpriority", sort=False).cumcount().to_numpy() + 1
    n = o.groupby("o_orderpriority", sort=False)["o_orderkey"].transform(
        "size").to_numpy()
    q, r = n // 4, n % 4
    cut = r * (q + 1)
    tile = np.where(rn <= cut, (rn - 1) // (q + 1) + 1,
                    r + (rn - cut - 1) // np.maximum(q, 1) + 1)
    want = (pd.DataFrame({"o_orderkey": o["o_orderkey"].to_numpy(),
                          "rn": rn, "tile": tile.astype(np.int64)})
            .sort_values("o_orderkey").reset_index(drop=True))
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    # invariants: rn is a permutation of 1..n per priority; NTILE sizes
    # are q+1 for the first r tiles, q after, and never increase
    m = got.merge(orders[["o_orderkey", "o_orderpriority"]], on="o_orderkey")
    for prio, g in m.groupby("o_orderpriority"):
        assert sorted(g["rn"]) == list(range(1, len(g) + 1))
        sizes = g.groupby("tile").size()
        assert list(sizes.index) == list(range(1, min(4, len(g)) + 1))
        assert (sizes.diff().dropna() <= 0).all()
        assert sizes.max() - sizes.min() <= 1


def test_event_cooccurrence_matches_pandas(ray_session):
    from bgdss_ray.queries import event_cooccurrence

    got = event_cooccurrence(SF)
    ev = pd.read_parquet(f"{SF}/events.parquet",
                         columns=["user_id", "event_type"])
    d = ev.drop_duplicates()
    j = d.merge(d, on="user_id", suffixes=("_a", "_b"))
    j = j[j["event_type_a"] < j["event_type_b"]]
    want = (j.groupby(["event_type_a", "event_type_b"])
            .size().rename("n_users").reset_index()
            .rename(columns={"event_type_a": "t1", "event_type_b": "t2"})
            .sort_values(["t1", "t2"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    # pair support never exceeds either type's own distinct-user count
    per_type = d.groupby("event_type")["user_id"].nunique()
    assert (got["n_users"] <= got["t1"].map(per_type).to_numpy()).all()
    assert (got["n_users"] <= got["t2"].map(per_type).to_numpy()).all()
    assert (got["t1"] < got["t2"]).all()


def test_all_priority_customers_matches_pandas(ray_session):
    from bgdss_ray.queries import all_priority_customers

    got = (all_priority_customers(SF).to_pandas()
           .sort_values("o_custkey").reset_index(drop=True))
    orders = pd.read_parquet(
        f"{SF}/orders.parquet", columns=["o_custkey", "o_orderpriority"])
    per = orders.groupby("o_custkey")["o_orderpriority"].nunique()
    p = orders["o_orderpriority"].nunique()
    want = pd.DataFrame(
        {"o_custkey": np.sort(per.index[per == p].to_numpy())})
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    # division invariants: every selected customer covers all P classes,
    # and any customer with >= P orders of P distinct classes is selected
    sel = set(got["o_custkey"])
    for ck, g in orders.groupby("o_custkey"):
        assert (ck in sel) == (g["o_orderpriority"].nunique() == p)


def test_spend_deciles_matches_pandas(ray_session):
    from bgdss_ray.queries import spend_deciles

    got = spend_deciles(SF)
    orders = pd.read_parquet(
        f"{SF}/orders.parquet", columns=["o_custkey", "o_totalprice"])
    cents = np.floor(orders["o_totalprice"].to_numpy() * 100.0 + 0.5
                     ).astype(np.int64)
    t = (orders.assign(spend=cents)
         .groupby("o_custkey").agg(n_orders=("spend", "size"),
                                   spend=("spend", "sum"))
         .reset_index().sort_values(["spend", "o_custkey"],
                                    kind="mergesort"))
    n = len(t)
    rn = np.arange(1, n + 1)
    q, r = divmod(n, 10)
    cut = r * (q + 1)
    t["decile"] = np.where(rn <= cut, (rn - 1) // (q + 1) + 1,
                           r + (rn - cut - 1) // max(q, 1) + 1)
    want = (t.groupby("decile")
            .agg(n_customers=("o_custkey", "size"),
                 sum_orders=("n_orders", "sum"),
                 sum_spend_cents=("spend", "sum"))
            .reset_index().astype(np.int64))
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    # NTILE invariants: decile sizes differ by <= 1, first tiles take the
    # extra row, totals reconcile with the raw table
    sizes = got.set_index("decile")["n_customers"]
    assert sizes.max() - sizes.min() <= 1
    assert (sizes.diff().dropna() <= 0).all()
    assert got["sum_orders"].sum() == len(orders)
    assert got["sum_spend_cents"].sum() == cents.sum()


def test_last_purchase_ffill_matches_pandas(ray_session):
    from bgdss_ray.queries import last_purchase_ffill

    got = (last_purchase_ffill(SF).to_pandas()
           .sort_values("event_id").reset_index(drop=True))
    ev = pd.read_parquet(
        f"{SF}/events.parquet",
        columns=["event_id", "user_id", "ts", "event_type", "value"])
    ev = ev.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
    cents = np.floor(ev["value"].to_numpy() * 100.0 + 0.5).astype(np.int64)
    pv = pd.Series(np.where(ev["event_type"].to_numpy() == "purchase",
                            cents.astype(float), np.nan), index=ev.index)
    filled = pv.groupby(ev["user_id"].to_numpy()).ffill()
    want = (pd.DataFrame({"event_id": ev["event_id"].to_numpy(),
                          "last_purchase_cents": filled.fillna(-1)
                          .astype(np.int64).to_numpy()})
            .sort_values("event_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    # invariants: every purchase event carries its OWN cents; a user's
    # rows before their first purchase are all -1
    m = got.merge(ev, on="event_id")
    pur = m[m["event_type"] == "purchase"]
    own = np.floor(pur["value"].to_numpy() * 100.0 + 0.5).astype(np.int64)
    assert (pur["last_purchase_cents"].to_numpy() == own).all()


def test_followed_within_hour_matches_pandas(ray_session):
    from bgdss_ray.queries import followed_within_hour

    got = followed_within_hour(SF)
    ev = pd.read_parquet(f"{SF}/events.parquet",
                         columns=["user_id", "ts", "event_type"])
    j = ev.merge(ev, on="user_id", suffixes=("_a", "_b"))
    j = j[(j["ts_b"] > j["ts_a"])
          & (j["ts_b"] <= j["ts_a"] + pd.Timedelta(hours=1))]
    want = (j.groupby(["event_type_a", "event_type_b"])
            .size().rename("n_pairs").reset_index()
            .rename(columns={"event_type_a": "t1", "event_type_b": "t2"})
            .sort_values(["t1", "t2"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    assert (got["n_pairs"] > 0).all()


def test_activity_orders_full_matches_pandas(ray_session):
    from bgdss_ray.queries import activity_orders_full

    got = (activity_orders_full(SF).to_pandas()
           .sort_values("k").reset_index(drop=True))
    orders = pd.read_parquet(
        f"{SF}/orders.parquet", columns=["o_custkey", "o_orderpriority"])
    ev = pd.read_parquet(f"{SF}/events.parquet", columns=["user_id"])
    o = (orders[orders["o_orderpriority"] == "1-URGENT"]
         .groupby("o_custkey").size().rename("n_orders"))
    e = ev.groupby("user_id").size().rename("n_events")
    want = (pd.concat([o, e], axis=1).fillna(-1).astype(np.int64)
            .rename_axis("k").reset_index()
            .sort_values("k").reset_index(drop=True))
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    # both unmatched directions genuinely occur, and -1 never pairs
    # with -1 (a key appears only if SOME side has rows)
    assert (got["n_orders"] == -1).any()
    assert (got["n_events"] == -1).any()
    assert ((got["n_orders"] != -1) | (got["n_events"] != -1)).all()


def test_priority_sets_matches_pandas(ray_session):
    from bgdss_ray.queries import priority_sets

    got = (priority_sets(SF).to_pandas()
           .sort_values("o_custkey").reset_index(drop=True))
    orders = pd.read_parquet(
        f"{SF}/orders.parquet", columns=["o_custkey", "o_orderpriority"])
    want = (orders.groupby("o_custkey")["o_orderpriority"]
            .agg(lambda s: "|".join(sorted(s.unique())))
            .rename("priority_set").reset_index()
            .sort_values("o_custkey").reset_index(drop=True))
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    # set semantics: parts are sorted, distinct, and from the vocabulary
    vocab = set(orders["o_orderpriority"].unique())
    for s in got["priority_set"]:
        parts = s.split("|")
        assert parts == sorted(set(parts))
        assert set(parts) <= vocab


def test_monthly_order_growth_matches_pandas(ray_session):
    from bgdss_ray.queries import monthly_order_growth

    got = monthly_order_growth(SF)
    orders = pd.read_parquet(
        f"{SF}/orders.parquet", columns=["o_orderdate", "o_totalprice"])
    cents = np.floor(orders["o_totalprice"].to_numpy() * 100.0 + 0.5
                     ).astype(np.int64)
    m = (orders.assign(
             month=orders["o_orderdate"].dt.to_period("M")
             .dt.to_timestamp(), revenue_cents=cents)
         .groupby("month")
         .agg(n_orders=("revenue_cents", "size"),
              revenue_cents=("revenue_cents", "sum"))
         .reset_index().sort_values("month").reset_index(drop=True))
    m["prev_revenue_cents"] = (m["revenue_cents"].shift(1).fillna(-1)
                               .astype(np.int64))
    got2 = got.copy()
    got2["month"] = got2["month"].astype("datetime64[ns]")
    pd.testing.assert_frame_equal(got2, m, check_dtype=False)
    # LAG chain: prev of row i equals revenue of row i-1; first is -1
    assert got["prev_revenue_cents"].iloc[0] == -1
    assert (got["prev_revenue_cents"].iloc[1:].to_numpy()
            == got["revenue_cents"].iloc[:-1].to_numpy()).all()
    assert got["n_orders"].sum() == len(orders)


def test_daily_retention_matches_pandas(ray_session):
    from bgdss_ray.queries import daily_retention

    got = daily_retention(SF)
    ev = pd.read_parquet(f"{SF}/events.parquet",
                         columns=["user_id", "ts"])
    d = (ev.assign(day=ev["ts"].dt.floor("D"))[["user_id", "day"]]
         .drop_duplicates())
    nxt = d.assign(day=d["day"] - pd.Timedelta(days=1))
    mk = d.merge(nxt.assign(ret=1), on=["user_id", "day"], how="left")
    want = (mk.groupby("day")
            .agg(n_active=("user_id", "size"),
                 n_retained=("ret", lambda s: int(s.notna().sum())))
            .reset_index().sort_values("day").reset_index(drop=True))
    got2 = got.copy()
    got2["day"] = got2["day"].astype("datetime64[ns]")
    pd.testing.assert_frame_equal(got2, want, check_dtype=False)
    # retention bound: retained never exceeds active; the span's last
    # day can retain no one beyond the data edge
    assert (got["n_retained"] <= got["n_active"]).all()


def _brute_band_bounds(uid, ts, lo_d, hi_d, lo_side, hi_side):
    """O(n^2) oracle for band_bounds: per-row index range of same-user
    rows whose ts lies in the band, with searchsorted side semantics."""
    n = len(uid)
    lo = np.empty(n, dtype=np.int64)
    hi = np.empty(n, dtype=np.int64)
    for i in range(n):
        a, b = ts[i] + lo_d, ts[i] + hi_d
        same = np.flatnonzero(uid == uid[i])
        in_lo = ((ts[same] >= a) if lo_side == "left" else (ts[same] > a))
        in_hi = ((ts[same] <= b) if hi_side == "right" else (ts[same] < b))
        sel = same[in_lo & in_hi]
        lo[i] = sel[0] if len(sel) else np.searchsorted(
            ts[same], a, side=lo_side) + same[0]
        hi[i] = (sel[-1] + 1) if len(sel) else lo[i]
    return lo, hi


def test_band_bounds_matches_bruteforce_both_paths(monkeypatch):
    """The shared composite-key stride idiom (ops/windows.band_bounds)
    == a per-row brute-force band scan, on BOTH code paths: the
    vectorized single-searchsorted key and the overflow fallback
    (forced by shrinking STRIDE_GUARD), across asymmetric bands and all
    side combinations used by the callers."""
    from bgdss_ray.ops import windows as W

    rng = np.random.default_rng(11)
    n = 400
    uid = np.sort(rng.integers(0, 17, n)).astype(np.int64)
    ts = rng.integers(0, 10_000, n).astype(np.int64)
    # user-major sort, ts ascending within user (the documented precond)
    order = np.lexsort((ts, uid))
    uid, ts = uid[order], ts[order]

    cases = [(-3600, 3600, "left", "right"),   # banded_event_pairs
             (-3600, 0, "left", "right"),      # range_window_sum
             (0, 3600, "right", "right"),      # followed_within_hour
             (-100, -10, "left", "left")]      # asymmetric open band
    for lo_d, hi_d, ls, hs in cases:
        want_lo, want_hi = _brute_band_bounds(uid, ts, lo_d, hi_d, ls, hs)
        got_lo, got_hi = W.band_bounds(uid, ts, lo_d, hi_d, ls, hs)
        np.testing.assert_array_equal(got_lo, want_lo)
        np.testing.assert_array_equal(got_hi, want_hi)
        # force the per-user-slice fallback and pin path equality
        monkeypatch.setattr(W, "STRIDE_GUARD", 1)
        fb_lo, fb_hi = W.band_bounds(uid, ts, lo_d, hi_d, ls, hs)
        monkeypatch.undo()
        np.testing.assert_array_equal(fb_lo, want_lo)
        np.testing.assert_array_equal(fb_hi, want_hi)

    e_lo, e_hi = W.band_bounds(np.empty(0, np.int64),
                               np.empty(0, np.int64), -1, 1)
    assert len(e_lo) == 0 and len(e_hi) == 0


def test_bfs_hops_matches_bruteforce(ray_session):
    """Engine BFS == a driver-side BFS on the collected graph; bucket
    fan-out is semantics-free; hops bounded at n_iter."""
    from bgdss_ray.ops.graph import bfs_hops, lineitem_edges
    from bgdss_ray.queries import bfs_hops_q
    import ray.data as rd

    got = bfs_hops_q(SF).to_pandas()

    li = pd.read_parquet(f"{SF}/lineitem.parquet",
                         columns=["l_partkey", "l_suppkey"])
    li = li[(li["l_partkey"] + li["l_suppkey"]) % 31 == 0]
    pairs = li.drop_duplicates()
    src = np.r_[pairs["l_partkey"].to_numpy() * 2,
                pairs["l_suppkey"].to_numpy() * 2 + 1]
    dst = np.r_[pairs["l_suppkey"].to_numpy() * 2 + 1,
                pairs["l_partkey"].to_numpy() * 2]
    adj: dict = {}
    for u, v in zip(src, dst):
        adj.setdefault(int(u), set()).add(int(v))
    dist = {n: 0 for n in adj if n % 2 == 0 and (n // 2) % 10 == 1}
    frontier = set(dist)
    for d in range(1, 4):
        nxt = set()
        for u in frontier:
            for v in adj.get(u, ()):
                if v not in dist:
                    dist[v] = d
                    nxt.add(v)
        frontier = nxt
    want = (pd.DataFrame({"node_id": list(dist), "hops": list(dist.values())})
            .astype(np.int64).sort_values("node_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(got, want)

    # parallelism invariance: different bucket counts, identical result
    edges = lineitem_edges(
        rd.from_pandas(pairs.reset_index(drop=True)).map_batches(
            lambda t: t, batch_format="pyarrow"))
    pred = lambda n: (n % 2 == 0) & ((n // 2) % 10 == 1)
    a = bfs_hops(edges, pred, n_iter=3, num_partitions=3).to_pandas()
    a = a.sort_values("node_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, want)

    # deeper run exercises the frontier-only relaxation over many rounds
    # (settled nodes must neither re-expand nor lose their distance)
    for d in range(4, 7):
        nxt = set()
        for u in frontier:
            for v in adj.get(u, ()):
                if v not in dist:
                    dist[v] = d
                    nxt.add(v)
        frontier = nxt
    want6 = (pd.DataFrame({"node_id": list(dist),
                           "hops": list(dist.values())})
             .astype(np.int64).sort_values("node_id")
             .reset_index(drop=True))
    b = bfs_hops(edges, pred, n_iter=6, num_partitions=5).to_pandas()
    b = b.sort_values("node_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(b, want6)


def test_new_users_daily_matches_pandas(ray_session):
    from bgdss_ray.queries import new_users_daily

    got = new_users_daily(SF)
    ev = pd.read_parquet(f"{SF}/events.parquet", columns=["user_id", "ts"])
    fd = ev.assign(day=ev["ts"].dt.floor("D")).groupby("user_id")["day"].min()
    want = (fd.value_counts().sort_index().rename("n_new").reset_index()
            .rename(columns={"index": "day"}))
    want["cum_users"] = want["n_new"].cumsum()
    got2 = got.copy()
    got2["day"] = got2["day"].astype("datetime64[ns]")
    pd.testing.assert_frame_equal(got2, want, check_dtype=False,
                                  check_names=False)
    # the last cumulative value IS the global distinct-user count
    assert int(got["cum_users"].iloc[-1]) == ev["user_id"].nunique()


def test_ohlc_daily_matches_pandas(ray_session):
    """Combiner OHLC == a direct pandas rollup under the (ts, event_id)
    total order; merging per-block partials is key-comparison only."""
    from bgdss_ray.queries import ohlc_daily

    got = ohlc_daily(SF)
    ev = pd.read_parquet(f"{SF}/events.parquet",
                         columns=["event_id", "ts", "value"])
    ev = ev.assign(
        day=ev["ts"].dt.floor("D"),
        cents=np.floor(ev["value"].to_numpy() * 100.0 + 0.5).astype(
            np.int64),
    ).sort_values(["day", "ts", "event_id"], kind="mergesort")
    g = ev.groupby("day", sort=True)
    want = pd.DataFrame(
        {"day": np.array(list(g.groups), dtype="datetime64[ns]"),
         "open_cents": g["cents"].first().to_numpy(),
         "high_cents": g["cents"].max().to_numpy(),
         "low_cents": g["cents"].min().to_numpy(),
         "close_cents": g["cents"].last().to_numpy(),
         "n_events": g["cents"].size().to_numpy(dtype=np.int64)})
    got2 = got.copy()
    got2["day"] = got2["day"].astype("datetime64[ns]")
    pd.testing.assert_frame_equal(got2, want, check_dtype=False)
    assert (got["low_cents"] <= got["open_cents"]).all()
    assert (got["open_cents"] <= got["high_cents"]).all()


def test_new_users_daily_multiday_fold(ray_session, tmp_path):
    """Staggered first-seen days across many blocks: pins the driver
    fold's day ordering and cumulative sum on a non-degenerate axis
    (the sf tables concentrate first events on 1-2 days)."""
    from bgdss_ray.queries import new_users_daily

    rng = np.random.default_rng(23)
    n_users, n_days = 300, 17
    first = rng.integers(0, n_days, n_users)
    rows = []
    base = np.datetime64("2024-03-01T00:00:00", "us")
    for u in range(n_users):
        days = [first[u]] + list(
            rng.integers(first[u], n_days, rng.integers(0, 4)))
        for d in days:
            rows.append((u, base + np.timedelta64(
                int(d) * 86400_000_000 + int(rng.integers(0, 86400_000_000)),
                "us")))
    rng.shuffle(rows)
    ev = pd.DataFrame(rows, columns=["user_id", "ts"])
    sf = tmp_path / "sf"
    sf.mkdir()
    ev.to_parquet(sf / "events.parquet", index=False)

    got = new_users_daily(str(sf))
    fd = ev.assign(day=ev["ts"].dt.floor("D")).groupby("user_id")["day"].min()
    want = (fd.value_counts().sort_index().rename("n_new").reset_index()
            .rename(columns={"index": "day"}))
    want["cum_users"] = want["n_new"].cumsum()
    got2 = got.copy()
    got2["day"] = got2["day"].astype("datetime64[ns]")
    pd.testing.assert_frame_equal(got2, want, check_dtype=False,
                                  check_names=False)
    assert int(got["cum_users"].iloc[-1]) == n_users
    assert got["day"].is_monotonic_increasing


def test_active_users_7d_matches_pandas(ray_session, tmp_path):
    """Interval-union diff-array plan == a direct trailing-window count,
    on the sf table AND on a sparse synthetic with >6-day gaps (which
    force interval splits — the sf events are too dense to exercise
    them)."""
    from bgdss_ray.queries import active_users_7d

    def brute(ev: pd.DataFrame) -> pd.DataFrame:
        d = (ev.assign(day=ev["ts"].dt.floor("D"))[["user_id", "day"]]
             .drop_duplicates())
        days = sorted(d["day"].unique())
        rows = [(w, d.loc[(d["day"] >= w - pd.Timedelta(days=6))
                          & (d["day"] <= w), "user_id"].nunique())
                for w in days]
        return pd.DataFrame(rows, columns=["day", "n_active_7d"])

    ev = pd.read_parquet(f"{SF}/events.parquet",
                         columns=["user_id", "ts"])
    got = active_users_7d(SF)
    got2 = got.assign(day=got["day"].astype("datetime64[ns]"))
    pd.testing.assert_frame_equal(got2, brute(ev), check_dtype=False)

    rng = np.random.default_rng(31)
    base = np.datetime64("2024-01-01T12:00:00", "us")
    rows = []
    for u in range(80):
        for d in rng.choice(60, size=rng.integers(1, 6), replace=False):
            rows.append((u, base + np.timedelta64(
                int(d) * 86400_000_000, "us")))
    sev = pd.DataFrame(rows, columns=["user_id", "ts"])
    sf = tmp_path / "sf"
    sf.mkdir()
    sev.to_parquet(sf / "events.parquet", index=False)
    sgot = active_users_7d(str(sf))
    sgot2 = sgot.assign(day=sgot["day"].astype("datetime64[ns]"))
    pd.testing.assert_frame_equal(sgot2, brute(sev), check_dtype=False)


def test_unpivot_roundtrip(ray_session):
    """Melt then local re-pivot reconstructs the wide table exactly."""
    from bgdss_ray.queries import unpivot_parts

    long = unpivot_parts(SF).to_pandas()
    wide = (long.pivot(index="p_partkey", columns="attr", values="val")
            .reset_index())
    part = pd.read_parquet(f"{SF}/part.parquet",
                           columns=["p_partkey", "p_size",
                                    "p_retailprice"])
    part = part.sort_values("p_partkey").reset_index(drop=True)
    assert (wide["size"].to_numpy()
            == part["p_size"].to_numpy()).all()
    assert (wide["retail_cents"].to_numpy()
            == np.floor(part["p_retailprice"].to_numpy() * 100.0
                        + 0.5).astype(np.int64)).all()
    assert len(long) == 2 * len(part)
