"""Iterative graph algorithms on Ray Data: PageRank by power iteration.

The web-crawl companion op (rank frontier hosts/pages by link structure).
Each iteration joins ranks into edges on src — but NOT via
``Dataset.join``: this Ray version's hash-join operator carries ~15 s of
fixed actor-pool setup per call, which at 3 iterations dominated wall
time 20×. Instead we use the repo's tag-union co-group pattern
(``ops/joins.py``), folded one step further:

- Edges are bucketed by ``hash(src)`` ONCE and materialized — the bucket
  key never changes, so the big side is shuffled exactly once per run
  and reused by every iteration's union.
- Because bucket is a pure function of the node id, a node's FULL
  out-edge set lands in one group — outdeg is the in-group edge count,
  so no degree table or degree join exists at all.
- A node's rank is represented as BASE + Σ(partial contribution rows)
  rather than a materialized total: each iteration's co-group emits its
  in-bucket partial sums keyed by ``bucket(dst)``, and the NEXT
  iteration's ``groupby(bucket)`` is what combines them (the rank-sum
  and the edge co-location ride the same shuffle). An iteration is
  therefore ONE groupby — no separate ``groupby(dst).sum`` — and the
  whole run is K+1 all-to-all ops executed as a single streaming
  pipeline (nothing driver-side, no intermediate materialize; only the
  reused edge side is pinned).

Determinism contract (SQL pairing): ALL arithmetic is integer fixed-point
— r0 = 10^6 per node, contribution = (r·85) // (100·outdeg) (floor
division of positive ints), new rank = 150000 + Σ contributions. Integer
sums are order-independent, so block layout / bucket width / partial-sum
routing cannot flip a single bit, and DuckDB replays K unrolled
iterations exactly.

Graph construction here: the bipartite part↔supplier incidence from
lineitem (DISTINCT pairs), made bidirectional; node id = 2·partkey /
2·suppkey+1. Every node therefore has outdeg ≥ 1 and indeg ≥ 1 — no
dangling-mass term needed. Node ids are non-negative; ``dst = -1`` is
the rank-partial sentinel inside the unioned schema (b, src, dst, r).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

SCALE = 1_000_000
BASE = 150_000  # 15% of SCALE — the damping teleport share


def _bucket_i64(v: np.ndarray, n_buckets: int) -> np.ndarray:
    """fmix64 spread of int node ids → bucket (same mixer as ops/joins)."""
    h = v.astype(np.uint64)
    with np.errstate(over="ignore"):
        h = h ^ (h >> np.uint64(33))
        h = h * np.uint64(0xFF51AFD7ED558CCD)
        h = h ^ (h >> np.uint64(33))
    return (h % np.uint64(n_buckets)).astype(np.int32)


def pagerank(edges, n_iter: int = 3, num_partitions: int | None = None):
    """edges: Dataset[(src: int64, dst: int64)] — duplicate rows allowed
    (exact-deduped in-bucket, where every copy of a pair co-locates);
    node ids >= 0, every src with outdeg >= 1. Returns
    Dataset[(node_id, rank)] after ``n_iter`` integer power iterations."""
    if num_partitions is None:
        # pin upstream lineage ONCE — count() would otherwise execute it
        # and tag_edges' materialize would execute it a second time
        edges = edges.materialize()
        num_partitions = max(32, edges.count() // 250_000 + 1)
    nb = num_partitions

    def tag_edges(t: pa.Table) -> pa.Table:
        src = t.column("src").to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.Table.from_arrays(
            [
                pa.array(_bucket_i64(src, nb)),
                pa.array(src),
                t.column("dst").cast(pa.int64()),
                pa.array(np.zeros(t.num_rows, dtype=np.int64)),
            ],
            names=["b", "src", "dst", "r"],
        )

    # Bucketed once, reused by every iteration's union.
    edges_b = edges.map_batches(tag_edges, batch_format="pyarrow").materialize()

    def step(g: pd.DataFrame, first: bool) -> pd.DataFrame:
        """One bucket's work for one iteration: fold rank partials,
        compute per-edge contributions, emit partial sums routed to
        bucket(dst) for the next iteration's shuffle to combine."""
        is_part = g["dst"].to_numpy() == -1
        # exact dedup rides the mandatory shuffle: every copy of an
        # (src, dst) pair shares bucket(src), so in-group drop_duplicates
        # IS the global DISTINCT — no separate dedup groupby exists.
        e = g.loc[~is_part, ["src", "dst"]].drop_duplicates()
        if e.empty:  # arrow return keeps union block types uniform
            return pa.Table.from_arrays(
                [pa.array([], type=t) for t in
                 (pa.int32(), pa.int64(), pa.int64(), pa.int64())],
                names=["b", "src", "dst", "r"],
            )
        e["deg"] = e.groupby("src", sort=False)["dst"].transform("size")
        if first:
            m = e
            rank = np.full(len(m), SCALE, dtype=np.int64)
        else:
            rk = (
                g.loc[is_part, ["src", "r"]]
                .groupby("src", sort=False, as_index=False)["r"]
                .sum()
            )
            rk["r"] = rk["r"].to_numpy(dtype=np.int64) + BASE
            m = e.merge(rk, on="src", how="inner", sort=False)
            rank = m["r"].to_numpy(dtype=np.int64)
        c = (rank * 85) // (100 * m["deg"].to_numpy(dtype=np.int64))
        part = (
            pd.DataFrame({"dst": m["dst"].to_numpy(dtype=np.int64), "c": c})
            .groupby("dst", sort=False, as_index=False)["c"]
            .sum()  # in-bucket combiner: shuffle moves O(buckets×dst) rows
        )
        out_node = part["dst"].to_numpy(dtype=np.int64)
        return pa.Table.from_arrays(
            [
                pa.array(_bucket_i64(out_node, nb)),
                pa.array(out_node),
                pa.array(np.full(len(out_node), -1, dtype=np.int64)),
                pa.array(part["c"].to_numpy(dtype=np.int64)),
            ],
            names=["b", "src", "dst", "r"],
        )

    def fold_final(g: pd.DataFrame) -> pd.DataFrame:
        p = g[g["dst"].to_numpy() == -1]
        rk = p.groupby("src", sort=False, as_index=False)["r"].sum()
        return pd.DataFrame(
            {
                "node_id": rk["src"].to_numpy(dtype=np.int64),
                "rank": rk["r"].to_numpy(dtype=np.int64) + BASE,
            }
        )

    parts = None
    for i in range(n_iter):
        cur = edges_b if parts is None else edges_b.union(parts)
        first = i == 0
        parts = cur.groupby("b").map_groups(
            lambda g, _f=first: step(g, _f), batch_format="pandas"
        )

    # Final fold: partials → (node_id, rank); same bucket shuffle combines
    # contributions from every producing bucket. Lazy end-to-end — the
    # consumer's execution streams all K+1 shuffles as one pipeline.
    return parts.groupby("b").map_groups(fold_final, batch_format="pandas")


def lineitem_edges(ds):
    """lineitem → bidirectional bipartite part↔supplier edge Dataset:
    both directions with disjoint node ids (2k / 2k+1), locally deduped
    per batch (map-only — NO global DISTINCT groupby: pagerank's bucket
    co-group already co-locates every copy of a pair, so the exact dedup
    happens in-group there for free; a global dedup shuffle here would
    move the same rows one extra time)."""

    def both_ways(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop_duplicates(["l_partkey", "l_suppkey"])
        p = df["l_partkey"].to_numpy(dtype=np.int64) * 2
        s = df["l_suppkey"].to_numpy(dtype=np.int64) * 2 + 1
        return pd.DataFrame(
            {
                "src": np.concatenate([p, s]),
                "dst": np.concatenate([s, p]),
            }
        )

    return ds.map_batches(both_ways, batch_format="pandas")


def labelprop(edges, n_iter: int = 3, num_partitions: int | None = None):
    """Min-label propagation (connected-components relaxation): after
    ``n_iter`` rounds every node's label is the smallest node id within
    ``n_iter`` hops — at fixpoint that is the component minimum (the
    repo's dedup components use the union-find fold; this is the
    Dataset-native iterative form, SQL-unrollable at fixed n_iter).

    Same machinery as :func:`pagerank`: edges bucketed by hash(src) once
    and reused; labels ride as sentinel rows (dst = -1) routed to
    bucket(node); each round is ONE groupby(bucket) co-group that folds
    the node's incoming label candidates by min (order-free, so layout
    cannot change a bit), dedups edges in-group, and emits (a) each
    node's own label back to its bucket and (b) one candidate label per
    out-edge routed to bucket(dst), pre-min-combined per dst in-bucket.
    """
    if num_partitions is None:
        edges = edges.materialize()
        num_partitions = max(32, edges.count() // 250_000 + 1)
    nb = num_partitions

    def tag_edges(t: pa.Table) -> pa.Table:
        src = t.column("src").to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.Table.from_arrays(
            [
                pa.array(_bucket_i64(src, nb)),
                pa.array(src),
                t.column("dst").cast(pa.int64()),
                pa.array(np.zeros(t.num_rows, dtype=np.int64)),
            ],
            names=["b", "src", "dst", "l"],
        )

    edges_b = edges.map_batches(tag_edges, batch_format="pyarrow").materialize()

    def _out(node: np.ndarray, lab: np.ndarray) -> pa.Table:
        return pa.Table.from_arrays(
            [
                pa.array(_bucket_i64(node, nb)),
                pa.array(node),
                pa.array(np.full(len(node), -1, dtype=np.int64)),
                pa.array(lab),
            ],
            names=["b", "src", "dst", "l"],
        )

    def step(g: pd.DataFrame, first: bool) -> pa.Table:
        is_lab = g["dst"].to_numpy() == -1
        e = g.loc[~is_lab, ["src", "dst"]].drop_duplicates()
        if first:
            nodes = np.unique(e["src"].to_numpy(dtype=np.int64))
            lab = pd.Series(nodes, index=nodes)
        else:
            lab = (
                g.loc[is_lab]
                .groupby("src", sort=False)["l"]
                .min()
            )
        m = e.merge(
            lab.rename("l"), left_on="src", right_index=True, how="inner"
        )
        cand = (
            pd.DataFrame(
                {"n": m["dst"].to_numpy(dtype=np.int64),
                 "l": m["l"].to_numpy(dtype=np.int64)}
            )
            .groupby("n", sort=False)["l"]
            .min()  # in-bucket min-combiner before the shuffle
        )
        node = np.concatenate(
            [lab.index.to_numpy(dtype=np.int64),
             cand.index.to_numpy(dtype=np.int64)]
        )
        lv = np.concatenate(
            [lab.to_numpy(dtype=np.int64), cand.to_numpy(dtype=np.int64)]
        )
        return _out(node, lv)

    def fold_final(g: pd.DataFrame) -> pd.DataFrame:
        p = g[g["dst"].to_numpy() == -1]
        lab = p.groupby("src", sort=False, as_index=False)["l"].min()
        return pd.DataFrame(
            {
                "node_id": lab["src"].to_numpy(dtype=np.int64),
                "label": lab["l"].to_numpy(dtype=np.int64),
            }
        )

    parts = None
    for i in range(n_iter):
        cur = edges_b if parts is None else edges_b.union(parts)
        first = i == 0
        parts = cur.groupby("b").map_groups(
            lambda g, _f=first: step(g, _f), batch_format="pandas"
        )

    return parts.groupby("b").map_groups(fold_final, batch_format="pandas")
