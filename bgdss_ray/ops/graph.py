"""Iterative graph algorithms on Ray Data: PageRank and min-label
propagation, both on one shared bucket-co-group iteration skeleton.

The web-crawl companion ops (rank frontier hosts/pages by link structure;
group them into components). Each iteration joins per-node state into
edges on src — but NOT via ``Dataset.join``: this Ray version's hash-join
operator carries ~15 s of fixed actor-pool setup per call, which at 3
iterations dominated wall time 20×. Instead the repo's tag-union co-group
pattern (``ops/joins.py``), folded one step further:

- Edges are normalized to the union schema ONCE and materialized — the
  single pinned copy. The bucket column (fmix64(src) % nb) is attached
  per iteration by a cheap fused map over the materialized blocks, so
  ``num_partitions`` can be derived from the pinned copy's row count
  without holding a second tagged superset in the object store.
- Because bucket is a pure function of the node id, a node's FULL
  out-edge set lands in one group — outdeg / the node set are in-group
  facts, so no degree table or init shuffle exists at all. Exact edge
  dedup also rides this shuffle (in-group ``drop_duplicates`` IS the
  global DISTINCT), so inputs may carry duplicate edges.
- Per-node state (rank partials / label candidates) rides as sentinel
  rows (``dst = -1``) routed to ``bucket(node)``: the NEXT iteration's
  ``groupby(bucket)`` combines state and co-locates it with the node's
  out-edges on the SAME shuffle. An iteration is therefore ONE groupby,
  and a K-iteration run is K+1 all-to-all ops executed as a single lazy
  streaming pipeline (nothing driver-side except the pinned edges).

Determinism contracts (SQL pairing):
- PageRank: ALL arithmetic integer fixed-point — r0 = 10^6 per node,
  contribution = (r·85) // (100·outdeg) (floor division of positive
  ints), new rank = 150000 + Σ. Integer sums are order-independent, so
  block layout / bucket width / partial routing cannot flip a bit, and
  DuckDB replays K unrolled iterations exactly.
- Label propagation: l0(v) = v; l_{k+1}(v) = min(l_k(v), min over
  in-edges of l_k(u)) — min is order-free; DuckDB unrolls the same K
  relaxation rounds. At fixpoint the label is the component minimum
  (pytest asserts parity with the union-find fold).

Graph construction here: the bipartite part↔supplier incidence from
lineitem, made bidirectional; node id = 2·partkey / 2·suppkey+1. Every
node therefore has outdeg ≥ 1 and indeg ≥ 1 — no dangling-mass term
needed. Node ids are non-negative; ``dst = -1`` is the state sentinel
inside the unioned schema (b, src, dst, v).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from .frames import co_group_blocks

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


_EMPTY_STEP = pa.Table.from_arrays(
    [pa.array([], type=t)
     for t in (pa.int32(), pa.int64(), pa.int64(), pa.int64())],
    names=["b", "src", "dst", "v"],
)


def _state_rows(node: np.ndarray, val: np.ndarray, nb: int) -> pa.Table:
    """Sentinel state rows routed to bucket(node) for the next shuffle."""
    return pa.Table.from_arrays(
        [
            pa.array(_bucket_i64(node, nb)),
            pa.array(node),
            pa.array(np.full(len(node), -1, dtype=np.int64)),
            pa.array(val),
        ],
        names=["b", "src", "dst", "v"],
    )


def _iterate(edges, n_iter: int, num_partitions: int | None, make_step,
             fold_final, final_schema: pa.Schema):
    """Run ``n_iter`` rounds of ``step = make_step(nb)`` over the bucket
    co-group of (edges ∪ state), then ``fold_final`` per bucket.
    ``step(g, first)`` sees a pandas frame of whole buckets with columns
    (b, src, dst, v) — edge rows have dst >= 0 and v = 0; state rows
    carry NEGATIVE dst sentinels (-1 canonical via :func:`_state_rows`;
    a step may add further negative sentinels, e.g. bfs_hops' -2
    candidate rows), so edge selection must be ``dst >= 0``, never
    ``dst != -1``. Steps must be key-local (see
    :func:`co_group_blocks`). Lazy end to end; only the normalized edge
    table is pinned."""

    def norm(t: pa.Table) -> pa.Table:
        src = t.column("src").to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.Table.from_arrays(
            [
                pa.array(src),
                t.column("dst").cast(pa.int64()),
                pa.array(np.zeros(t.num_rows, dtype=np.int64)),
            ],
            names=["src", "dst", "v"],
        )

    edges_m = edges.map_batches(norm, batch_format="pyarrow").materialize()
    if num_partitions is None:
        num_partitions = max(32, edges_m.count() // 250_000 + 1)
    nb = num_partitions

    def add_bucket(t: pa.Table) -> pa.Table:
        # emit the SAME column order as _state_rows (b, src, dst, v):
        # the union that follows must not depend on Ray's shuffle
        # tolerating heterogeneous column order across blocks
        src = t.column("src").to_numpy(zero_copy_only=False)
        return pa.Table.from_arrays(
            [pa.array(_bucket_i64(src, nb)),
             t.column("src"), t.column("dst"), t.column("v")],
            names=["b", "src", "dst", "v"],
        )

    step = make_step(nb)
    parts = None
    for i in range(n_iter):
        eb = edges_m.map_batches(add_bucket, batch_format="pyarrow")
        cur = eb if parts is None else eb.union(parts)
        first = i == 0
        # co_group_blocks, not groupby().map_groups: step/fold are
        # key-local (all combines are per-src/per-dst), so one call per
        # sorted block is semantics-identical with O(blocks) python calls
        # — and empty sort partitions emit TYPED empties instead of the
        # schema-less blocks Ray's map_groups wrapper sprays
        parts = co_group_blocks(
            cur, "b", lambda g, _f=first: step(g, _f), _EMPTY_STEP.schema
        )

    return co_group_blocks(parts, "b", fold_final, final_schema)


def pagerank(edges, n_iter: int = 3, num_partitions: int | None = None):
    """edges: Dataset[(src: int64, dst: int64)] — duplicate rows allowed
    (exact-deduped in-bucket, where every copy of a pair co-locates);
    node ids >= 0, every src with outdeg >= 1. Returns
    Dataset[(node_id, rank)] after ``n_iter`` integer power iterations.
    A node's rank is BASE + Σ(partial contribution rows): each bucket
    emits its in-bucket partial sums per dst (a combiner — the shuffle
    moves O(buckets × dst) rows, never O(edges))."""

    def make_step(nb: int):
        def step(g: pd.DataFrame, first: bool) -> pa.Table:
            dst = g["dst"].to_numpy()
            is_part = dst == -1
            e = g.loc[dst >= 0, ["src", "dst"]].drop_duplicates()
            if e.empty:
                # a block with rank-mass state rows but NO edges is the
                # outdeg-0 case too (state routes to bucket(src), so a
                # bucket holding only state rows means those nodes have
                # no out-edges anywhere) — the early return must not
                # bypass the raised-error contract below
                if is_part.any():
                    raise ValueError(
                        "pagerank: node(s) with rank mass but outdeg 0 "
                        f"(e.g. {g.loc[is_part, 'src'].iloc[0]}); the "
                        "contract requires outdeg >= 1 for every node"
                    )
                return _EMPTY_STEP
            e["deg"] = e.groupby("src", sort=False)["dst"].transform("size")
            if first:
                m = e
                rank = np.full(len(m), SCALE, dtype=np.int64)
            else:
                rk = (
                    g.loc[is_part, ["src", "v"]]
                    .groupby("src", sort=False, as_index=False)["v"]
                    .sum()
                )
                rk["v"] = rk["v"].to_numpy(dtype=np.int64) + BASE
                # raised-error contract: edges are bucketed by SRC, so all
                # of a node's out-edges co-locate with its state row — a
                # state src absent from e has outdeg 0 and its rank mass
                # would silently vanish (generic callers: add a sink
                # handling term or make the graph bidirectional first)
                dangling = ~rk["src"].isin(e["src"])
                if dangling.any():
                    raise ValueError(
                        "pagerank: node(s) with rank mass but outdeg 0 "
                        f"(e.g. {rk.loc[dangling, 'src'].iloc[0]}); the "
                        "contract requires outdeg >= 1 for every node"
                    )
                m = e.merge(rk, on="src", how="inner", sort=False)
                rank = m["v"].to_numpy(dtype=np.int64)
            c = (rank * 85) // (100 * m["deg"].to_numpy(dtype=np.int64))
            part = (
                pd.DataFrame(
                    {"dst": m["dst"].to_numpy(dtype=np.int64), "c": c}
                )
                .groupby("dst", sort=False, as_index=False)["c"]
                .sum()
            )
            return _state_rows(
                part["dst"].to_numpy(dtype=np.int64),
                part["c"].to_numpy(dtype=np.int64),
                nb,
            )

        return step

    def fold_final(g: pd.DataFrame) -> pd.DataFrame:
        p = g[g["dst"].to_numpy() == -1]
        rk = p.groupby("src", sort=False, as_index=False)["v"].sum()
        return pd.DataFrame(
            {
                "node_id": rk["src"].to_numpy(dtype=np.int64),
                "rank": rk["v"].to_numpy(dtype=np.int64) + BASE,
            }
        )

    schema = pa.schema([("node_id", pa.int64()), ("rank", pa.int64())])
    return _iterate(edges, n_iter, num_partitions, make_step, fold_final,
                    schema)


def labelprop(edges, n_iter: int = 3, num_partitions: int | None = None):
    """Min-label propagation (connected-components relaxation): after
    ``n_iter`` rounds every node's label is the smallest node id within
    ``n_iter`` hops — at fixpoint the component minimum. Each round the
    bucket co-group min-folds a node's incoming candidates, then emits
    (a) its own label back to its bucket and (b) one candidate per
    out-edge, pre-min-combined per dst in-bucket."""

    def make_step(nb: int):
        def step(g: pd.DataFrame, first: bool) -> pa.Table:
            dst = g["dst"].to_numpy()
            is_lab = dst == -1
            e = g.loc[dst >= 0, ["src", "dst"]].drop_duplicates()
            if e.empty:
                # a block with label rows but no edges = sink nodes:
                # correct min-label semantics is to CARRY the labels
                # (they persist and contribute no candidates) — the old
                # early return silently dropped them
                if is_lab.any():
                    lab0 = g.loc[is_lab].groupby("src", sort=False)["v"].min()
                    return _state_rows(
                        lab0.index.to_numpy(dtype=np.int64),
                        lab0.to_numpy(dtype=np.int64), nb,
                    )
                return _EMPTY_STEP
            if first:
                nodes = np.unique(e["src"].to_numpy(dtype=np.int64))
                lab = pd.Series(nodes, index=nodes)
            else:
                lab = (
                    g.loc[is_lab]
                    .groupby("src", sort=False)["v"]
                    .min()
                )
            m = e.merge(
                lab.rename("v"), left_on="src", right_index=True,
                how="inner",
            )
            cand = (
                pd.DataFrame(
                    {"n": m["dst"].to_numpy(dtype=np.int64),
                     "v": m["v"].to_numpy(dtype=np.int64)}
                )
                .groupby("n", sort=False)["v"]
                .min()
            )
            node = np.concatenate(
                [lab.index.to_numpy(dtype=np.int64),
                 cand.index.to_numpy(dtype=np.int64)]
            )
            lv = np.concatenate(
                [lab.to_numpy(dtype=np.int64),
                 cand.to_numpy(dtype=np.int64)]
            )
            return _state_rows(node, lv, nb)

        return step

    def fold_final(g: pd.DataFrame) -> pd.DataFrame:
        p = g[g["dst"].to_numpy() == -1]
        lab = p.groupby("src", sort=False, as_index=False)["v"].min()
        return pd.DataFrame(
            {
                "node_id": lab["src"].to_numpy(dtype=np.int64),
                "label": lab["v"].to_numpy(dtype=np.int64),
            }
        )

    schema = pa.schema([("node_id", pa.int64()), ("label", pa.int64())])
    return _iterate(edges, n_iter, num_partitions, make_step, fold_final,
                    schema)


def lineitem_edges(ds):
    """lineitem → bidirectional bipartite part↔supplier edge Dataset:
    both directions with disjoint node ids (2k / 2k+1), locally deduped
    per batch (map-only — NO global DISTINCT groupby: the iterate bucket
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


def copurchase_edges(li):
    """lineitem (pre-filtered) → canonical part co-purchase edges
    (u < v, parts sharing an order). Map-only per-bucket: orders are
    hash-bucketed, each bucket self-merges its (order, part) frame —
    an order's lineitems co-locate because bucket is a function of the
    order key — and emits u < v pairs. Cross-order duplicate pairs are
    NOT deduped here: every copy of an edge shares bucket(u) downstream,
    so :func:`triangle_count`'s co-groups dedup in-group for free (the
    same ride-the-shuffle dedup as pagerank)."""
    nb = 64

    def bucket(t: pa.Table) -> pa.Table:
        o = t.column("l_orderkey").to_numpy(zero_copy_only=False)
        return t.append_column(
            "b", pa.array((o.astype(np.int64) % nb).astype(np.int64))
        )

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        f = g[["l_orderkey", "l_partkey"]].drop_duplicates()
        m = f.merge(f, on="l_orderkey", suffixes=("_a", "_b"))
        m = m[m["l_partkey_a"] < m["l_partkey_b"]]
        return pd.DataFrame(
            {"u": m["l_partkey_a"].to_numpy(dtype=np.int64),
             "v": m["l_partkey_b"].to_numpy(dtype=np.int64)}
        )

    return co_group_blocks(
        li.map_batches(bucket, batch_format="pyarrow"),
        "b", pairs,  # key-local on l_orderkey (self-merge per order)
        pa.schema([("u", pa.int64()), ("v", pa.int64())]),
    )


def triangle_count(edges, num_partitions: int = 64) -> pd.DataFrame:
    """Distributed triangle counting by the wedge-check method: wedges
    (v1, v2) around each node u (edges oriented u < v, so every triangle
    is counted exactly once at its smallest vertex) are joined back
    against the edge set. Two co-group shuffles total:

    1. groupby(bucket(u)): dedup edges in-group (all copies of (u, v)
       co-locate), self-merge per u to emit the wedge multiset,
       pre-combined per (v1, v2) in-bucket, routed to bucket(v1).
    2. groupby(bucket(u)) again over edges ∪ wedge partials: a wedge
       (a, b) closes a triangle iff (a, b) is an edge — an in-group merge
       — emitting one partial-count row per bucket.

    The driver folds O(buckets) rows. Counts are order-free integer sums
    → the SQL oracle (two self-joins) replays them exactly. Orientation
    by node id caps wedge blowup at C(max outdeg, 2); the standard
    degree-orientation refinement is the documented scale path for
    graphs with high-degree small-id nodes."""
    nb = num_partitions

    def tag(kind: int):
        def fn(t: pa.Table) -> pa.Table:
            u = t.column("u").to_numpy(zero_copy_only=False).astype(np.int64)
            return pa.Table.from_arrays(
                [
                    pa.array(_bucket_i64(u, nb)),
                    pa.array(u),
                    t.column("v").cast(pa.int64()),
                    pa.array(np.full(t.num_rows, 1, dtype=np.int64)),
                    pa.array(np.full(t.num_rows, kind, dtype=np.int64)),
                ],
                names=["b", "u", "v", "c", "kind"],
            )

        return fn

    edges_t = edges.map_batches(tag(0), batch_format="pyarrow").materialize()

    def wedges(g: pd.DataFrame) -> pd.DataFrame:
        e = g[["u", "v"]].drop_duplicates()
        m = e.merge(e, on="u", suffixes=("_1", "_2"))
        m = m[m["v_1"] < m["v_2"]]
        w = (
            pd.DataFrame(
                {"a": m["v_1"].to_numpy(dtype=np.int64),
                 "b2": m["v_2"].to_numpy(dtype=np.int64)}
            )
            .groupby(["a", "b2"], sort=False, as_index=False)
            .size()  # in-bucket wedge combiner
        )
        a = w["a"].to_numpy(dtype=np.int64)
        return pd.DataFrame(
            {
                # int32 like tag(): every block of the union carries ONE
                # schema (the r4 bench tail had an int64-vs-int32 'b' here)
                "b": _bucket_i64(a, nb),
                "u": a,
                "v": w["b2"].to_numpy(dtype=np.int64),
                "c": w["size"].to_numpy(dtype=np.int64),
                "kind": np.full(len(w), 1, dtype=np.int64),
            }
        )

    tag_schema = pa.schema(
        [("b", pa.int32()), ("u", pa.int64()), ("v", pa.int64()),
         ("c", pa.int64()), ("kind", pa.int64())]
    )
    wedge_parts = co_group_blocks(edges_t, "b", wedges, tag_schema)

    def close(g: pd.DataFrame) -> pd.DataFrame:
        is_e = g["kind"].to_numpy() == 0
        e = g.loc[is_e, ["u", "v"]].drop_duplicates()
        w = g.loc[~is_e, ["u", "v", "c"]]
        hit = w.merge(e, on=["u", "v"], how="inner")
        return pd.DataFrame(
            {
                "n_edges": [np.int64(len(e))],
                "n_wedges": [np.int64(w["c"].sum())],
                "n_triangles": [np.int64(hit["c"].sum())],
            }
        )

    parts = co_group_blocks(
        edges_t.union(wedge_parts), "b", close,
        pa.schema([("n_edges", pa.int64()), ("n_wedges", pa.int64()),
                   ("n_triangles", pa.int64())]),
    ).to_pandas()
    return pd.DataFrame(
        {
            "n_edges": [np.int64(parts["n_edges"].sum())],
            "n_wedges": [np.int64(parts["n_wedges"].sum())],
            "n_triangles": [np.int64(parts["n_triangles"].sum())],
        }
    )


def bfs_hops(edges, seed_pred, n_iter: int = 3,
             num_partitions: int | None = None):
    """Multi-source BFS shortest-hop distances, bounded at ``n_iter``
    hops: every node reachable from the seed set within ``n_iter`` edges
    gets its exact hop count (unreached nodes are absent). The iterative
    frontier expansion rides the same one-co-group-shuffle-per-round
    skeleton as :func:`pagerank` / :func:`labelprop`; state rows carry
    each node's best-known distance and relax by min — min is order-free,
    so block layout cannot change a bit and a SQL ``WITH RECURSIVE`` walk
    bounded at depth ``n_iter`` replays the result exactly.

    ``seed_pred`` must be a PURE VECTORIZED function of the node id
    (ndarray[int64] -> bool mask): seed membership is decided inside each
    bucket with no broadcast, exactly because it depends on nothing but
    the id. Contract (as pagerank): every node appears as a src (make the
    graph bidirectional first) — a sink-only seed would never be seen.

    Relaxation is FRONTIER-ONLY (classic frontier Bellman-Ford): settled
    distances ride as ``dst = -1`` rows and incoming candidates as
    ``dst = -2`` rows, and a round expands out-edges only from nodes
    whose distance actually improved — per-round work tracks the frontier
    size, not the whole settled set, so deep ``n_iter`` runs don't redo
    rounds 1..k-1's candidate generation every round."""
    FRONTIER = -2  # second state sentinel alongside _state_rows' -1

    def make_step(nb: int):
        def step(g: pd.DataFrame, first: bool) -> pa.Table:
            dst = g["dst"].to_numpy()
            e = g.loc[dst >= 0, ["src", "dst"]].drop_duplicates()
            if first:
                nodes = np.unique(e["src"].to_numpy(dtype=np.int64))
                nodes = nodes[seed_pred(nodes)]
                settled = pd.Series(np.zeros(len(nodes), dtype=np.int64),
                                    index=nodes)
                frontier = settled
            else:
                settled = (g.loc[dst == -1].groupby("src", sort=False)
                           ["v"].min())
                cand_in = (g.loc[dst == FRONTIER]
                           .groupby("src", sort=False)["v"].min())
                # a node improves iff its best incoming candidate beats
                # (or first sets) its settled distance; only improved
                # nodes re-expand
                both = cand_in.index.intersection(settled.index)
                better = cand_in[both] < settled[both]
                frontier = pd.concat(
                    [cand_in[cand_in.index.difference(settled.index)],
                     cand_in[both][better]]
                )
                settled = (pd.concat([settled, frontier])
                           .groupby(level=0).min())
            if settled.empty:
                return _EMPTY_STEP
            out = [_state_rows(settled.index.to_numpy(dtype=np.int64),
                               settled.to_numpy(dtype=np.int64), nb)]
            if not (e.empty or frontier.empty):
                m = e.merge(frontier.rename("v"), left_on="src",
                            right_index=True, how="inner")
                cand = (
                    pd.DataFrame(
                        {"n": m["dst"].to_numpy(dtype=np.int64),
                         "v": m["v"].to_numpy(dtype=np.int64) + 1}
                    )
                    .groupby("n", sort=False)["v"]
                    .min()  # in-bucket frontier combiner
                )
                c = _state_rows(cand.index.to_numpy(dtype=np.int64),
                                cand.to_numpy(dtype=np.int64), nb)
                out.append(c.set_column(
                    2, "dst",
                    pa.array(np.full(len(cand), FRONTIER,
                                     dtype=np.int64))))
            return pa.concat_tables(out)

        return step

    def fold_final(g: pd.DataFrame) -> pd.DataFrame:
        # last round's un-folded candidates (-2) count: they are exact
        # <= n_iter-hop distances, same as the settled rows
        p = g[g["dst"].to_numpy() < 0]
        d = p.groupby("src", sort=False, as_index=False)["v"].min()
        return pd.DataFrame(
            {
                "node_id": d["src"].to_numpy(dtype=np.int64),
                "hops": d["v"].to_numpy(dtype=np.int64),
            }
        )

    schema = pa.schema([("node_id", pa.int64()), ("hops", pa.int64())])
    return _iterate(edges, n_iter, num_partitions, make_step, fold_final,
                    schema)
