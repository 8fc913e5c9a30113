"""Whole-graph analytics over the canonical KG: PageRank + components.

The reference exposes its graph only through per-key storage queries
(degree, 1-hop expand — reference storage/neo.go:410-472, kuzu.go); an
engine holding the whole graph as a Dataset should also run whole-graph
analytics.  Both operators here are DETERMINISTIC AND INTEGER-EXACT so the
DuckDB value oracle matches bit-for-bit:

- ``pagerank`` — fixed-point integer PageRank: ranks live in units of
  1/scale (default scale 10^6), damping is the integer pair 85/100, every
  edge contribution is the floor division ``(85·rank_u) // (100·outdeg_u)``
  and mass lost to dangling nodes stays lost (sink-loss PageRank).  All
  arithmetic is int64, so summation order — the classic float-PageRank
  nondeterminism — never enters the result.
- ``components`` — undirected connected components with min-entity-id
  labels, delegating to the dedup clustering engine (stages/dedup.py):
  driver union-find under ``max_driver_pairs``, distributed min-label
  propagation above it.

Scale notes (100 TB): the distributed PageRank round is two segment passes
(``sorted_attach_first`` ships each node's rank onto its out-edges without
a join; ``sorted_reduce`` sums in-contributions) — both are sorts on
uniformly distributed keys with zero per-group Python.  Rank state is
re-materialized per round so lineage stays one round deep.  A graph whose
edge set fits one block short-circuits to a single-task local loop
(bit-identical output) because at that size the round loop's cost is pure
scheduling, not data — the same adaptive switch as ``dedup._cc_min_label``.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

__all__ = ["pagerank", "components", "PAGERANK_SCALE", "PAGERANK_DAMPING_PCT"]

PAGERANK_SCALE = 1_000_000
PAGERANK_DAMPING_PCT = 85


def _graph_sides(graph: ray.data.Dataset) -> tuple[ray.data.Dataset, ray.data.Dataset]:
    nodes = graph.filter(expr="kind == 'node'").select_columns(["entity_id"])
    edges = graph.filter(expr="kind == 'edge'").select_columns(["src", "tgt"])
    return nodes, edges


def pagerank(
    graph: ray.data.Dataset,
    iterations: int = 3,
    scale: int = PAGERANK_SCALE,
    damping_pct: int = PAGERANK_DAMPING_PCT,
    local_threshold: int = 1 << 20,
) -> ray.data.Dataset:
    """Integer fixed-point PageRank over the canonical graph.

    rank⁰(v) = scale;  rankⁱ(v) = base + Σ_{u→v} (d·rankⁱ⁻¹(u)) // (100·out(u))
    with base = (scale·(100−d)) // 100, d = ``damping_pct``.  Directed on the
    stored (src → tgt) edges; edges are already distinct per (src, tgt) in
    the canonical graph.  Returns ``(entity_id, pagerank)`` — pagerank is
    the int64 fixed-point rank (divide by ``scale`` for the float view).
    """
    base = (scale * (100 - damping_pct)) // 100
    nodes, edges = _graph_sides(graph)

    if edges.count() <= local_threshold and nodes.count() <= local_threshold:
        # one-task local loop: at this size the distributed round loop's
        # cost is pure scheduling overhead (dedup._cc_min_label's measured
        # lesson).  Same formula, bit-identical output.
        def tag_nodes(b: pa.Table) -> pa.Table:
            return pa.Table.from_pydict(
                {"u": b.column("entity_id"),
                 "v": pa.nulls(len(b), pa.string())})

        def tag_edges(b: pa.Table) -> pa.Table:
            return pa.Table.from_pydict(
                {"u": b.column("src"), "v": b.column("tgt")})

        both = (
            nodes.map_batches(tag_nodes, batch_format="pyarrow")
            .union(edges.map_batches(tag_edges, batch_format="pyarrow"))
            .repartition(1)
        )

        def local_pr(b: pa.Table) -> pa.Table:
            is_node = pc.is_null(b.column("v"))
            names = sorted(b.filter(is_node).column("u").to_pylist())
            e = b.filter(pc.invert(is_node))
            idx = {n: i for i, n in enumerate(names)}
            n = len(names)
            src = np.array([idx[s] for s in e.column("u").to_pylist()],
                           dtype=np.int64)
            tgt = np.array([idx[t] for t in e.column("v").to_pylist()],
                           dtype=np.int64)
            out = np.bincount(src, minlength=n).astype(np.int64)
            rank = np.full(n, scale, dtype=np.int64)
            for _ in range(iterations):
                contrib = (damping_pct * rank[src]) // (100 * out[src])
                # int64 scatter-add (np.bincount's float weights would lose
                # exactness above 2^53)
                acc = np.zeros(n, dtype=np.int64)
                np.add.at(acc, tgt, contrib)
                rank = base + acc
            return pa.Table.from_pydict(
                {"entity_id": pa.array(names, pa.string()),
                 "pagerank": pa.array(rank, pa.int64())})

        return both.map_batches(local_pr, batch_format="pyarrow",
                                batch_size=None)

    from .sortagg import sorted_attach_count, sorted_attach_first, sorted_reduce

    # each edge needs its source's out-degree: the segment broadcast of the
    # group size (one sort, computed once — outdeg is loop-invariant)
    edges_deg = sorted_attach_count(edges, ["src"], "outdeg").materialize()

    def init_ranks(b: pa.Table) -> pa.Table:
        return pa.Table.from_pydict(
            {"node": b.column("entity_id"),
             "pr": pa.array(np.full(len(b), scale, dtype=np.int64))})

    ranks = nodes.map_batches(init_ranks, batch_format="pyarrow").materialize()

    for _ in range(iterations):
        def rank_rows(b: pa.Table) -> pa.Table:
            n = len(b)
            return pa.Table.from_pydict(
                {"key": b.column("node"), "pr": b.column("pr"),
                 "tgt": pa.nulls(n, pa.string()),
                 "outdeg": pa.array(np.zeros(n, dtype=np.int64)),
                 "is_rank": pa.array(np.ones(n, dtype=np.int8))})

        def edge_rows(b: pa.Table) -> pa.Table:
            n = len(b)
            return pa.Table.from_pydict(
                {"key": b.column("src"),
                 "pr": pa.array(np.zeros(n, dtype=np.int64)),
                 "tgt": b.column("tgt"), "outdeg": b.column("outdeg"),
                 "is_rank": pa.array(np.zeros(n, dtype=np.int8))})

        # segment broadcast: each key's rank row (is_rank desc ⇒ first in
        # its run) ships `pr` onto every co-keyed edge row — the join-free
        # scatter of rank along out-edges
        attached = sorted_attach_first(
            ranks.map_batches(rank_rows, batch_format="pyarrow")
            .union(edges_deg.map_batches(edge_rows, batch_format="pyarrow")),
            ["key"], "pr", "is_rank", attach_name="src_pr",
            order_descending=True,
        )

        def contribs(b: pa.Table) -> pa.Table:
            e = b.filter(pc.equal(b.column("is_rank"), 0))
            src_pr = e.column("src_pr").to_numpy(zero_copy_only=False)
            outdeg = e.column("outdeg").to_numpy(zero_copy_only=False)
            inc = (damping_pct * src_pr) // (100 * outdeg) if len(e) else \
                np.array([], dtype=np.int64)
            return pa.Table.from_pydict(
                {"node": e.column("tgt"),
                 "inc": pa.array(inc.astype(np.int64))})

        def zero_rows(b: pa.Table) -> pa.Table:
            return pa.Table.from_pydict(
                {"node": b.column("node"),
                 "inc": pa.array(np.zeros(len(b), dtype=np.int64))})

        summed = sorted_reduce(
            attached.map_batches(contribs, batch_format="pyarrow")
            .union(ranks.map_batches(zero_rows, batch_format="pyarrow")),
            ["node"], ops=[("sum", "inc", "inc")],
        )

        def finish(b: pa.Table) -> pa.Table:
            inc = b.column("inc").to_numpy(zero_copy_only=False)
            return pa.Table.from_pydict(
                {"node": b.column("node"),
                 "pr": pa.array(base + inc.astype(np.int64))})

        ranks = summed.map_batches(finish, batch_format="pyarrow").materialize()

    def rename(b: pa.Table) -> pa.Table:
        return b.rename_columns(["entity_id", "pagerank"])

    return ranks.map_batches(rename, batch_format="pyarrow")


def components(
    graph: ray.data.Dataset,
    max_driver_pairs: int = 2_000_000,
    cc_local_threshold: int = 1 << 20,
) -> ray.data.Dataset:
    """Undirected connected components of the canonical graph:
    ``(entity_id, component_id)`` with component_id = the lexicographically
    smallest entity id in the component (isolated nodes label themselves).
    Delegates to the dedup clustering engine — driver union-find for small
    pair sets, distributed min-label propagation above ``max_driver_pairs``.
    """
    from .dedup import cluster_duplicates

    nodes, edges = _graph_sides(graph)

    def to_pairs(b: pa.Table) -> pa.Table:
        return pa.Table.from_pydict(
            {"a": b.column("src"), "b": b.column("tgt")})

    out = cluster_duplicates(
        nodes, edges.map_batches(to_pairs, batch_format="pyarrow"),
        id_col="entity_id", max_driver_pairs=max_driver_pairs,
        cc_local_threshold=cc_local_threshold,
    )

    def rename(b: pa.Table) -> pa.Table:
        return b.rename_columns(["entity_id", "component_id"])

    return out.map_batches(rename, batch_format="pyarrow")
