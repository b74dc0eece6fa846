"""Iterative graph algorithms on Ray Data: PageRank by power iteration.

The web-crawl companion op (rank frontier hosts/pages by link structure).
Each iteration is the classic pair of wide ops — contributions =
edges ⋈ ranks on src (hash-partitioned ``Dataset.join``, both sides
large), then a groupby(dst) sum — so the whole algorithm is K·(join +
groupby) shuffles with nothing ever collected to the driver; ranks are
materialized per iteration (the next iteration reads them twice:
join probe + node carry).

Determinism contract (SQL pairing): ALL arithmetic is integer fixed-point
— r0 = 10^6 per node, contribution = (r·85) // (100·outdeg) (floor
division of positive ints), new rank = 150000 + Σ contributions. Integer
sums are order-independent, so block layout / join order cannot flip a
single bit, and DuckDB replays K unrolled iterations exactly.

Graph construction here: the bipartite part↔supplier incidence from
lineitem (DISTINCT pairs), made bidirectional; node id = 2·partkey /
2·suppkey+1. Every node therefore has outdeg ≥ 1 and indeg ≥ 1 — no
dangling-mass term needed.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

SCALE = 1_000_000
BASE = 150_000  # 15% of SCALE — the damping teleport share


def pagerank(edges, n_iter: int = 3, num_partitions: int | None = None):
    """edges: Dataset[(src: int64, dst: int64)], assumed deduplicated and
    with every src having outdeg >= 1. Returns Dataset[(node_id, rank)]
    after ``n_iter`` integer power iterations."""
    from ray.data.aggregate import Count, Sum

    if num_partitions is None:
        num_partitions = max(8, edges.count() // 500_000 + 1)

    deg = (
        edges.groupby("src", num_partitions=num_partitions)
        .aggregate(Count(alias_name="deg"))
    )
    edeg = edges.join(
        deg, join_type="inner", num_partitions=num_partitions, on=("src",)
    ).materialize()  # reused every iteration

    def init_ranks(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "src": t.column("src"),
                "r": pa.array(
                    np.full(t.num_rows, SCALE, dtype=np.int64)),
            }
        )

    ranks = deg.map_batches(
        lambda t: init_ranks(t.select(["src"])), batch_format="pyarrow"
    ).materialize()

    def contrib(df: pd.DataFrame) -> pd.DataFrame:
        c = (df["r"].to_numpy(dtype=np.int64) * 85) // (
            100 * df["deg"].to_numpy(dtype=np.int64)
        )
        return pd.DataFrame({"dst": df["dst"], "c": c})

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "src": df["dst"],
                "r": (BASE + df["c"].to_numpy(dtype=np.int64)).astype(
                    np.int64),
            }
        )

    for _ in range(n_iter):
        ranks = (
            edeg.join(ranks, join_type="inner",
                      num_partitions=num_partitions, on=("src",))
            .map_batches(contrib, batch_format="pandas")
            .groupby("dst", num_partitions=num_partitions)
            .aggregate(Sum("c", alias_name="c"))
            .map_batches(finish, batch_format="pandas")
            .materialize()
        )

    return ranks.map_batches(
        lambda df: pd.DataFrame(
            {"node_id": df["src"].astype("int64"),
             "rank": df["r"].astype("int64")}),
        batch_format="pandas",
    )


def lineitem_edges(ds):
    """lineitem → bidirectional bipartite part↔supplier edge Dataset:
    DISTINCT (partkey, suppkey) via a distributed groupby, then both
    directions with disjoint node ids (2k / 2k+1)."""
    from ray.data.aggregate import Count

    pairs = ds.groupby(["l_partkey", "l_suppkey"]).aggregate(
        Count(alias_name="n")
    )

    def both_ways(df: pd.DataFrame) -> pd.DataFrame:
        p = df["l_partkey"].to_numpy(dtype=np.int64) * 2
        s = df["l_suppkey"].to_numpy(dtype=np.int64) * 2 + 1
        return pd.DataFrame(
            {
                "src": np.concatenate([p, s]),
                "dst": np.concatenate([s, p]),
            }
        )

    return pairs.map_batches(both_ways, batch_format="pandas")
