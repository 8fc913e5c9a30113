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

__all__ = ["pagerank", "components", "triangles", "neighbor_jaccard",
           "kcore", "edge_lift", "hop_distance", "weighted_sssp",
           "PAGERANK_SCALE", "PAGERANK_DAMPING_PCT"]

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
    seeds: list[str] | None = None,
) -> ray.data.Dataset:
    """Integer fixed-point PageRank over the canonical graph.

    rank⁰(v) = scale;  rankⁱ(v) = base + Σ_{u→v} (d·rankⁱ⁻¹(u)) // (100·out(u))
    with base = (scale·(100−d)) // 100, d = ``damping_pct``.  Directed on the
    stored (src → tgt) edges; edges are already distinct per (src, tgt) in
    the canonical graph.  Returns ``(entity_id, pagerank)`` — pagerank is
    the int64 fixed-point rank (divide by ``scale`` for the float view).

    ``seeds`` switches to PERSONALIZED PageRank (the retrieval-path ranker:
    rank entities by proximity to the query keywords): initial mass and the
    teleport ``base`` term restrict to the seed set —
    rank⁰(v) = scale·[v∈S], rankⁱ(v) = base·[v∈S] + Σ contributions.  Same
    all-int64 arithmetic, so the unrolled SQL oracle stays bit-exact.  The
    seed set is query-sized (ships in the task closure); a huge seed set
    should go through ``ray.put`` instead.
    """
    base = (scale * (100 - damping_pct)) // 100
    sset = frozenset(seeds) if seeds is not None else None
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
            if sset is None:
                basev = np.full(n, base, dtype=np.int64)
                rank = np.full(n, scale, dtype=np.int64)
            else:
                mask = np.array([nm in sset for nm in names], dtype=np.int64)
                basev = base * mask
                rank = scale * mask
            for _ in range(iterations):
                contrib = (damping_pct * rank[src]) // (100 * out[src])
                # int64 scatter-add (np.bincount's float weights would lose
                # exactness above 2^53)
                acc = np.zeros(n, dtype=np.int64)
                np.add.at(acc, tgt, contrib)
                rank = basev + acc
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
        if sset is None:
            pr = np.full(len(b), scale, dtype=np.int64)
        else:
            pr = scale * np.array(
                [nm in sset for nm in b.column("entity_id").to_pylist()],
                dtype=np.int64)
        return pa.Table.from_pydict(
            {"node": b.column("entity_id"), "pr": pa.array(pr)})

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
            if sset is None:
                basev = base
            else:
                basev = base * np.array(
                    [nm in sset for nm in b.column("node").to_pylist()],
                    dtype=np.int64)
            return pa.Table.from_pydict(
                {"node": b.column("node"),
                 "pr": pa.array(basev + inc.astype(np.int64))})

        ranks = summed.map_batches(finish, batch_format="pyarrow").materialize()

    def rename(b: pa.Table) -> pa.Table:
        return b.rename_columns(["entity_id", "pagerank"])

    return ranks.map_batches(rename, batch_format="pyarrow")


def triangles(
    graph: ray.data.Dataset,
    local_threshold: int = 1 << 20,
) -> ray.data.Dataset:
    """Per-node triangle count over the undirected simple graph →
    ``(entity_id, triangles:int64)`` with explicit 0 rows (the clustering-
    coefficient numerator; completes the analytics family next to degree /
    PageRank / components).

    Distributed shape = the classic degree-ordered node-iterator (count is
    integer and order-independent, so the oracle can enumerate in plain id
    order while the engine uses degree order):

    1. undirected-simple edges (min,max end, distinct, no self loops) via
       one ``sorted_count``;
    2. per-endpoint degree attach — one ``sorted_attach_count`` on the
       symmetrized rows + one ``sorted_attach_first`` union pass for the
       far endpoint (join-free, the PageRank scatter pattern);
    3. keep each edge in FORWARD orientation (deg, id)-ascending — forward
       adjacency lists are O(√m) even at hubs, the standard wedge bound;
    4. wedge emission per center (``groupby().map_groups`` — pair emission
       over many small groups measured faster than segment here,
       CLAUDE.md), closure test by unioning wedge rows with forward-edge
       marker rows and grouping on the wedge pair — no joins anywhere;
    5. credit all three corners of each closed wedge, ``sorted_reduce``
       sum with zero rows unioned in.

    A graph whose edge set fits one block short-circuits to a single-task
    numpy loop (bit-identical counts), like ``pagerank``.
    """
    nodes, edges = _graph_sides(graph)

    def und_rows(b: pa.Table) -> pa.Table:
        s, t = b.column("src"), b.column("tgt")
        keep = pc.not_equal(s, t)
        s, t = s.filter(keep), t.filter(keep)
        return pa.Table.from_pydict({
            "u": pc.min_element_wise(s, t),
            "v": pc.max_element_wise(s, t),
        })

    und_raw = edges.map_batches(und_rows, batch_format="pyarrow")

    if edges.count() <= local_threshold and nodes.count() <= local_threshold:
        def tag_nodes(b: pa.Table) -> pa.Table:
            return pa.Table.from_pydict(
                {"u": b.column("entity_id"),
                 "v": pa.nulls(len(b), pa.string())})

        both = (
            nodes.map_batches(tag_nodes, batch_format="pyarrow")
            .union(und_raw)
            .repartition(1)
        )

        def local_tri(b: pa.Table) -> pa.Table:
            is_node = pc.is_null(b.column("v"))
            names = sorted(b.filter(is_node).column("u").to_pylist())
            e = b.filter(pc.invert(is_node))
            idx = {n: i for i, n in enumerate(names)}
            n = len(names)
            pairs = sorted(set(
                (idx[a], idx[c])
                for a, c in zip(e.column("u").to_pylist(),
                                e.column("v").to_pylist())
            ))
            adj: list[list[int]] = [[] for _ in range(n)]
            for a, c in pairs:
                adj[a].append(c)
                adj[c].append(a)
            deg = np.array([len(x) for x in adj], dtype=np.int64)
            # forward neighbors under (deg, id) order
            fwd = [
                np.array(sorted(
                    (w for w in adj[x]
                     if (deg[w], w) > (deg[x], x)),
                    key=lambda w: (deg[w], w)), dtype=np.int64)
                for x in range(n)
            ]
            fset = set()
            for x in range(n):
                for w in fwd[x]:
                    fset.add((x, int(w)))
            tri = np.zeros(n, dtype=np.int64)
            for x in range(n):
                fx = fwd[x]
                for i in range(len(fx)):
                    for j in range(i + 1, len(fx)):
                        a, c = int(fx[i]), int(fx[j])
                        if (a, c) in fset:
                            tri[x] += 1
                            tri[a] += 1
                            tri[c] += 1
            return pa.Table.from_pydict(
                {"entity_id": pa.array(names, pa.string()),
                 "triangles": pa.array(tri, pa.int64())})

        return both.map_batches(local_tri, batch_format="pyarrow",
                                batch_size=None)

    from .sortagg import (
        sorted_attach_count,
        sorted_attach_first,
        sorted_count,
        sorted_reduce,
    )

    und = sorted_count(und_raw, ["u", "v"]).select_columns(["u", "v"])

    def sym(b: pa.Table) -> pa.Table:
        return pa.Table.from_pydict({
            "a": pa.concat_arrays([
                b.column("u").combine_chunks(),
                b.column("v").combine_chunks()]),
            "b": pa.concat_arrays([
                b.column("v").combine_chunks(),
                b.column("u").combine_chunks()]),
        })

    adj = sorted_attach_count(
        und.map_batches(sym, batch_format="pyarrow"), ["a"], "deg_a"
    ).materialize()

    # far-endpoint degree: union adjacency rows (keyed by b) with degree
    # carrier rows (keyed by node; duplicates harmless — attach_first takes
    # one), segment-broadcast the degree onto every adjacency row
    def adj_keyed_b(b: pa.Table) -> pa.Table:
        n = len(b)
        return pa.Table.from_pydict({
            "key": b.column("b"), "other": b.column("a"),
            "deg_other": b.column("deg_a"),
            "degval": pa.array(np.zeros(n, dtype=np.int64)),
            "is_deg": pa.array(np.zeros(n, dtype=np.int8)),
        })

    def deg_rows(b: pa.Table) -> pa.Table:
        n = len(b)
        return pa.Table.from_pydict({
            "key": b.column("a"),
            "other": pa.nulls(n, b.schema.field("a").type),
            "deg_other": pa.array(np.zeros(n, dtype=np.int64)),
            "degval": b.column("deg_a"),
            "is_deg": pa.array(np.ones(n, dtype=np.int8)),
        })

    attached = sorted_attach_first(
        adj.map_batches(adj_keyed_b, batch_format="pyarrow")
        .union(adj.map_batches(deg_rows, batch_format="pyarrow")),
        ["key"], "degval", "is_deg", attach_name="deg_key",
        order_descending=True,
    )

    # forward edge other→key iff (deg_other, other) < (deg_key, key);
    # each und edge survives in exactly one orientation
    def forward(b: pa.Table) -> pa.Table:
        b = b.filter(pc.equal(b.column("is_deg"), 0))
        do = b.column("deg_other").to_numpy(zero_copy_only=False)
        dk = b.column("deg_key").to_numpy(zero_copy_only=False)
        other = np.asarray(b.column("other").to_pylist(), dtype=object)
        key = np.asarray(b.column("key").to_pylist(), dtype=object)
        keep = (do < dk) | ((do == dk) & (other < key))
        return pa.Table.from_pydict({
            "src": pa.array(other[keep], pa.string()),
            "dst": pa.array(key[keep], pa.string()),
            "deg_src": pa.array(do[keep], pa.int64()),
            "deg_dst": pa.array(dk[keep], pa.int64()),
        })

    fwd = attached.map_batches(forward, batch_format="pyarrow").materialize()

    def wedges(g: pa.Table) -> pa.Table:
        # forward neighbors of one center, ordered by (deg, id); emit all
        # ordered pairs — bounded O(√m) per center by the degree ordering
        order = pc.sort_indices(
            g, sort_keys=[("deg_dst", "ascending"), ("dst", "ascending")])
        nb = g.column("dst").take(order).to_pylist()
        m = len(nb)
        if m < 2:
            return pa.Table.from_pydict({
                "x": pa.array([], pa.string()),
                "y": pa.array([], pa.string()),
                "w": pa.array([], pa.string()),
                "is_edge": pa.array([], pa.int8())})
        ii, jj = np.triu_indices(m, k=1)
        center = g.column("src")[0].as_py()
        nb_arr = np.asarray(nb, dtype=object)
        return pa.Table.from_pydict({
            "x": pa.array(nb_arr[ii], pa.string()),
            "y": pa.array(nb_arr[jj], pa.string()),
            "w": pa.array([center] * len(ii), pa.string()),
            "is_edge": pa.array(np.zeros(len(ii), dtype=np.int8))})

    cand = fwd.groupby("src").map_groups(wedges, batch_format="pyarrow")

    def edge_markers(b: pa.Table) -> pa.Table:
        n = len(b)
        return pa.Table.from_pydict({
            "x": b.column("src"), "y": b.column("dst"),
            "w": pa.nulls(n, pa.string()),
            "is_edge": pa.array(np.ones(n, dtype=np.int8))})

    def close_wedges(g: pa.Table) -> pa.Table:
        marks = g.column("is_edge").to_numpy(zero_copy_only=False)
        if not marks.any():
            return pa.Table.from_pydict({
                "node": pa.array([], pa.string()),
                "inc": pa.array([], pa.int64())})
        c = g.filter(pc.equal(g.column("is_edge"), 0))
        nodes_out = (c.column("w").to_pylist()
                     + c.column("x").to_pylist()
                     + c.column("y").to_pylist())
        return pa.Table.from_pydict({
            "node": pa.array(nodes_out, pa.string()),
            "inc": pa.array(np.ones(len(nodes_out), dtype=np.int64))})

    credits = (
        cand.union(fwd.map_batches(edge_markers, batch_format="pyarrow"))
        .groupby(["x", "y"])
        .map_groups(close_wedges, batch_format="pyarrow")
    )

    def zero_rows(b: pa.Table) -> pa.Table:
        return pa.Table.from_pydict({
            "node": b.column("entity_id"),
            "inc": pa.array(np.zeros(len(b), dtype=np.int64))})

    summed = sorted_reduce(
        credits.union(nodes.map_batches(zero_rows, batch_format="pyarrow")),
        ["node"], ops=[("sum", "inc", "inc")],
    )

    def rename(b: pa.Table) -> pa.Table:
        return b.rename_columns(["entity_id", "triangles"])

    return summed.map_batches(rename, batch_format="pyarrow")


def neighbor_jaccard(
    graph: ray.data.Dataset,
    max_center_degree: int = 0,
    local_threshold: int = 1 << 20,
) -> ray.data.Dataset:
    """Shared-neighbor (adjacency-Jaccard) similarity between entity pairs —
    the classic structural entity-linking / link-prediction score over the
    canonical graph (complements the name/embedding-based candidates in
    ``stages/similarity.py``; reference scope: the graph the storage layer
    exposes per-key, storage/neo.go:410-472).

    For every unordered pair (x, y) with ≥1 common neighbor →
    ``(entity_x, entity_y, common_neighbors, deg_x, deg_y, jaccard)`` with
    jaccard = |N(x)∩N(y)| / |N(x)∪N(y)|, 6-dp floor-rounded
    (``floor(v·10⁶+0.5)/10⁶``, the oracle-stable op sequence).

    Distributed shape — wedge counting, no joins:

    1. distinct undirected simple edges (one ``sorted_count``);
    2. symmetrize; attach each endpoint's degree with one
       ``sorted_attach_count`` and ship the far endpoint's degree onto every
       adjacency row with one ``sorted_attach_first`` union pass (the
       PageRank/triangles scatter pattern);
    3. per center node, emit all neighbor pairs (id-ordered so x < y) with
       both degrees riding along — ``groupby().map_groups`` (many small
       groups: the measured-faster branch, CLAUDE.md);
    4. one ``sorted_count`` over (x, y) with the degrees as carry columns —
       the count IS |N(x)∩N(y)|; jaccard follows vectorized.

    ``max_center_degree`` > 0 skips wedge emission at hub centers (their
    pair fan-out is deg², the same quadratic the dedup buckets cap with
    ``max_group``); 0 = exact mode, used by the oracle queries.  Skipped
    hubs only remove THEIR contribution to common-neighbor counts — the
    standard production trade documented by the dedup family.
    """
    nodes, edges = _graph_sides(graph)

    def und_rows(b: pa.Table) -> pa.Table:
        s, t = b.column("src"), b.column("tgt")
        keep = pc.not_equal(s, t)
        s, t = s.filter(keep), t.filter(keep)
        return pa.Table.from_pydict({
            "u": pc.min_element_wise(s, t),
            "v": pc.max_element_wise(s, t),
        })

    und_raw = edges.map_batches(und_rows, batch_format="pyarrow")

    def finish(b: pa.Table) -> pa.Table:
        c = b.column("common").to_numpy(zero_copy_only=False).astype(np.float64)
        dx = b.column("deg_x").to_numpy(zero_copy_only=False)
        dy = b.column("deg_y").to_numpy(zero_copy_only=False)
        union = (dx + dy).astype(np.float64) - c
        jac = np.floor(c / union * 1e6 + 0.5) / 1e6
        return pa.Table.from_pydict({
            "entity_x": b.column("x"), "entity_y": b.column("y"),
            "common_neighbors": pc.cast(b.column("common"), pa.int64()),
            "deg_x": pc.cast(b.column("deg_x"), pa.int64()),
            "deg_y": pc.cast(b.column("deg_y"), pa.int64()),
            "jaccard": pa.array(jac, pa.float64()),
        })

    if edges.count() <= local_threshold:
        # one-task local counting: below ~10⁶ edges the distributed path's
        # 4 sorts are pure scheduling overhead (the pagerank/triangles
        # short-circuit lesson).  Same formula, bit-identical output.
        def local_jac(b: pa.Table) -> pa.Table:
            pairs = sorted(set(zip(b.column("u").to_pylist(),
                                   b.column("v").to_pylist())))
            adj: dict[str, list[str]] = {}
            for a, c in pairs:
                adj.setdefault(a, []).append(c)
                adj.setdefault(c, []).append(a)
            deg = {k: len(v) for k, v in adj.items()}
            common: dict[tuple[str, str], int] = {}
            for center, nbrs in adj.items():
                if max_center_degree and len(nbrs) > max_center_degree:
                    continue
                ns = sorted(nbrs)
                for i in range(len(ns)):
                    for j in range(i + 1, len(ns)):
                        key = (ns[i], ns[j])
                        common[key] = common.get(key, 0) + 1
            ks = sorted(common)
            return pa.Table.from_pydict({
                "x": pa.array([k[0] for k in ks], pa.string()),
                "y": pa.array([k[1] for k in ks], pa.string()),
                "common": pa.array([common[k] for k in ks], pa.int64()),
                "deg_x": pa.array([deg[k[0]] for k in ks], pa.int64()),
                "deg_y": pa.array([deg[k[1]] for k in ks], pa.int64()),
            })

        counted = und_raw.repartition(1).map_batches(
            local_jac, batch_format="pyarrow", batch_size=None)
        return counted.map_batches(finish, batch_format="pyarrow")

    from .sortagg import sorted_attach_count, sorted_attach_first, sorted_count

    und = sorted_count(und_raw, ["u", "v"]).select_columns(["u", "v"])

    def sym(b: pa.Table) -> pa.Table:
        return pa.Table.from_pydict({
            "a": pa.concat_arrays([
                b.column("u").combine_chunks(),
                b.column("v").combine_chunks()]),
            "b": pa.concat_arrays([
                b.column("v").combine_chunks(),
                b.column("u").combine_chunks()]),
        })

    adj = sorted_attach_count(
        und.map_batches(sym, batch_format="pyarrow"), ["a"], "deg_a"
    ).materialize()

    # ship each neighbor's OWN degree onto the adjacency rows of its center:
    # adjacency rows re-keyed by the far endpoint union degree-carrier rows,
    # one segment broadcast (triangles' attach pattern)
    def adj_keyed_b(b: pa.Table) -> pa.Table:
        n = len(b)
        return pa.Table.from_pydict({
            "key": b.column("b"), "other": b.column("a"),
            "deg_other": b.column("deg_a"),
            "degval": pa.array(np.zeros(n, dtype=np.int64)),
            "is_deg": pa.array(np.zeros(n, dtype=np.int8)),
        })

    def deg_rows(b: pa.Table) -> pa.Table:
        n = len(b)
        return pa.Table.from_pydict({
            "key": b.column("a"),
            "other": pa.nulls(n, b.schema.field("a").type),
            "deg_other": pa.array(np.zeros(n, dtype=np.int64)),
            "degval": b.column("deg_a"),
            "is_deg": pa.array(np.ones(n, dtype=np.int8)),
        })

    attached = sorted_attach_first(
        adj.map_batches(adj_keyed_b, batch_format="pyarrow")
        .union(adj.map_batches(deg_rows, batch_format="pyarrow")),
        ["key"], "degval", "is_deg", attach_name="deg_key",
        order_descending=True,
    )

    # rows keyed by CENTER (= `other` above carries center? no: key=far
    # endpoint): after the broadcast each adjacency row is
    # (key=neighbor, other=center, deg_other=deg(center), deg_key=deg(neighbor))
    # — regroup by the CENTER and pair up its neighbors.
    def center_rows(b: pa.Table) -> pa.Table:
        b = b.filter(pc.equal(b.column("is_deg"), 0))
        return pa.Table.from_pydict({
            "center": b.column("other"),
            "nb": b.column("key"),
            "deg_nb": b.column("deg_key"),
        })

    def wedge_pairs(g: pa.Table) -> pa.Table:
        m = len(g)
        if m < 2 or (max_center_degree and m > max_center_degree):
            return pa.Table.from_pydict({
                "x": pa.array([], pa.string()),
                "y": pa.array([], pa.string()),
                "deg_x": pa.array([], pa.int64()),
                "deg_y": pa.array([], pa.int64())})
        order = pc.sort_indices(g, sort_keys=[("nb", "ascending")])
        nb = np.asarray(g.column("nb").take(order).to_pylist(), dtype=object)
        dg = g.column("deg_nb").take(order).to_numpy(zero_copy_only=False)
        ii, jj = np.triu_indices(m, k=1)
        return pa.Table.from_pydict({
            "x": pa.array(nb[ii], pa.string()),
            "y": pa.array(nb[jj], pa.string()),
            "deg_x": pa.array(dg[ii], pa.int64()),
            "deg_y": pa.array(dg[jj], pa.int64())})

    cand = (
        attached.map_batches(center_rows, batch_format="pyarrow")
        .groupby("center")
        .map_groups(wedge_pairs, batch_format="pyarrow")
    )

    counted = sorted_count(cand, ["x", "y"], carry=["deg_x", "deg_y"])
    return counted.map_batches(finish, batch_format="pyarrow")


def kcore(
    graph: ray.data.Dataset,
    k: int = 2,
    rounds: int = 0,
    local_threshold: int = 1 << 20,
) -> ray.data.Dataset:
    """k-core of the undirected simple graph → ``(entity_id,
    core_degree:int64)`` for every node that survives the peel (the
    density skeleton next to degree / PageRank / components / triangles).

    Peeling is SIMULTANEOUS (Jacobi): each round computes every node's
    degree over the CURRENT edge set, then drops all nodes below ``k`` at
    once — the only order-free (hence deterministic and SQL-unrollable)
    formulation.  ``rounds`` = 0 runs to the fixpoint; > 0 bounds the peel
    (the oracle mode: the SQL twin unrolls the same number of rounds, and
    once the fixpoint is reached further rounds are no-ops on both sides).

    Distributed shape (100 TB): each round is two keyed sorts and nothing
    else — ``sorted_attach_count`` puts each endpoint's degree on its
    directed rows (join-free segment broadcast), the below-``k`` rows drop,
    and a ``sorted_count`` keeps the undirected pairs that survived from
    BOTH endpoints (count == 2).  Edge state re-materializes per round so
    lineage stays one round deep (the PageRank convention).  Rounds are
    data-dependent but each strictly shrinks the edge set; no driver-side
    membership set, no broadcast of removed nodes.  A graph whose edge set
    fits one block short-circuits to a single-task numpy peel
    (bit-identical output).
    """
    if k < 1:
        raise ValueError("kcore requires k >= 1")
    from .sortagg import sorted_attach_count, sorted_count

    _, edges = _graph_sides(graph)

    def und_rows(b: pa.Table) -> pa.Table:
        s, t = b.column("src"), b.column("tgt")
        keep = pc.not_equal(s, t)
        s, t = s.filter(keep), t.filter(keep)
        return pa.Table.from_pydict({
            "u": pc.min_element_wise(s, t),
            "v": pc.max_element_wise(s, t),
        })

    und_raw = edges.map_batches(und_rows, batch_format="pyarrow")

    def sym(b: pa.Table) -> pa.Table:
        return pa.Table.from_pydict({
            "a": pa.concat_arrays([
                b.column("u").combine_chunks(),
                b.column("v").combine_chunks()]),
            "b": pa.concat_arrays([
                b.column("v").combine_chunks(),
                b.column("u").combine_chunks()]),
        })

    if edges.count() <= local_threshold:
        und1 = und_raw.repartition(1)

        def local_peel(b: pa.Table) -> pa.Table:
            pairs = sorted(set(zip(b.column("u").to_pylist(),
                                   b.column("v").to_pylist())))
            r = 0
            while pairs and (rounds <= 0 or r < rounds):
                deg: dict[str, int] = {}
                for u, v in pairs:
                    deg[u] = deg.get(u, 0) + 1
                    deg[v] = deg.get(v, 0) + 1
                kept = [(u, v) for u, v in pairs
                        if deg[u] >= k and deg[v] >= k]
                if len(kept) == len(pairs):
                    break
                pairs = kept
                r += 1
            deg = {}
            for u, v in pairs:
                deg[u] = deg.get(u, 0) + 1
                deg[v] = deg.get(v, 0) + 1
            names = sorted(deg)
            return pa.Table.from_pydict({
                "entity_id": pa.array(names, pa.string()),
                "core_degree": pa.array([deg[n] for n in names], pa.int64()),
            })

        return und1.map_batches(local_peel, batch_format="pyarrow",
                                batch_size=None)

    und = sorted_count(und_raw, ["u", "v"]).select_columns(
        ["u", "v"]).materialize()
    m = und.count()
    r = 0
    while m and (rounds <= 0 or r < rounds):
        dsym = sorted_attach_count(
            und.map_batches(sym, batch_format="pyarrow"), ["a"], "deg_a")
        alive = dsym.filter(expr=f"deg_a >= {int(k)}")

        def to_pair(b: pa.Table) -> pa.Table:
            return pa.Table.from_pydict({
                "u": pc.min_element_wise(b.column("a"), b.column("b")),
                "v": pc.max_element_wise(b.column("a"), b.column("b")),
            })

        counted = sorted_count(
            alive.map_batches(to_pair, batch_format="pyarrow"), ["u", "v"],
            count_name="sides")
        und = counted.filter(expr="sides == 2").select_columns(
            ["u", "v"]).materialize()
        m_new = und.count()
        if m_new == m:
            break
        m = m_new
        r += 1

    if not m:
        return ray.data.from_arrow(
            pa.table({"entity_id": pa.array([], pa.string()),
                      "core_degree": pa.array([], pa.int64())}))

    def rename(b: pa.Table) -> pa.Table:
        return pa.Table.from_pydict({
            "entity_id": b.column("a"),
            "core_degree": pc.cast(b.column("deg"), pa.int64()),
        })

    return sorted_count(
        und.map_batches(sym, batch_format="pyarrow"), ["a"], count_name="deg"
    ).map_batches(rename, batch_format="pyarrow")


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


def edge_lift(
    graph: ray.data.Dataset,
    n_docs: int,
    local_threshold: int = 1 << 20,
) -> ray.data.Dataset:
    """Doc-co-occurrence association strength (lift = exp(PMI)) for every
    canonical edge — the LightRAG-style edge-reweighting step that separates
    informative relationships from ones explained by endpoint frequency
    alone (reference scope: the per-edge weight/refCount the storage layer
    exposes, storage/neo.go:410-472; lift generalizes it to a calibrated
    association score).

    For each edge (x, y): ``lift = N · |D(x,y)| / (|D(x)| · |D(y)|)`` where
    D(x,y) = the edge's distinct source docs (its ``source_ids``, already
    occ-deduped by canonicalize), D(e) = distinct docs over ALL edges
    incident to e (relationship evidence only — self-contained in the edge
    table, no dependence on node-mention bookkeeping), N = corpus doc
    count.  lift > 1 → x,y co-occur more than their popularity predicts;
    the 6-dp floor-round (``floor(v·10⁶+0.5)/10⁶``) keeps the single
    double-division oracle-stable.

    Distributed shape — join-free, the neighbor_jaccard pattern:

    1. per-edge rows (src, tgt, docs_xy = len(source_ids)) — narrow map;
    2. incident (entity, doc) pairs exploded from both endpoints, distinct
       via one ``sorted_count`` over (entity, doc), then counted per
       entity with a second ``sorted_count`` — |D(e)| for every entity;
    3. ship |D(e)| onto edge rows keyed by src, then by tgt, with two
       ``sorted_attach_first`` passes (count rows are the unique carriers
       under the one-hot marker order);
    4. the lift itself is a vectorized tail map.

    Graphs whose edge set fits one block short-circuit to a single local
    task (bit-identical output) — the pagerank/triangles lesson.
    """
    edges = graph.filter(expr="kind == 'edge'").select_columns(
        ["src", "tgt", "source_ids"])

    def finish(b: pa.Table) -> pa.Table:
        xy = b.column("docs_xy").to_numpy(zero_copy_only=False).astype(np.float64)
        ds_ = b.column("docs_src").to_numpy(zero_copy_only=False).astype(np.float64)
        dt = b.column("docs_tgt").to_numpy(zero_copy_only=False).astype(np.float64)
        # oracle op sequence: ((N·xy)/(ds·dt))·1e6 + 0.5 → floor → /1e6
        lift = np.floor(float(n_docs) * xy / (ds_ * dt) * 1e6 + 0.5) / 1e6
        return pa.Table.from_pydict({
            "src": b.column("src"), "tgt": b.column("tgt"),
            "docs_xy": pc.cast(b.column("docs_xy"), pa.int64()),
            "docs_src": pc.cast(b.column("docs_src"), pa.int64()),
            "docs_tgt": pc.cast(b.column("docs_tgt"), pa.int64()),
            "lift": pa.array(lift, pa.float64()),
        })

    if edges.count() <= local_threshold:
        def local_lift(b: pa.Table) -> pa.Table:
            if b.num_rows == 0:
                return pa.Table.from_pydict({
                    "src": pa.array([], pa.string()),
                    "tgt": pa.array([], pa.string()),
                    "docs_xy": pa.array([], pa.int64()),
                    "docs_src": pa.array([], pa.int64()),
                    "docs_tgt": pa.array([], pa.int64()),
                    "lift": pa.array([], pa.float64()),
                })
            srcs = b.column("src").to_pylist()
            tgts = b.column("tgt").to_pylist()
            sids = b.column("source_ids").to_pylist()
            inc: dict[str, set[str]] = {}
            for s, t, docs in zip(srcs, tgts, sids):
                inc.setdefault(s, set()).update(docs)
                inc.setdefault(t, set()).update(docs)
            mid = pa.Table.from_pydict({
                "src": pa.array(srcs, pa.string()),
                "tgt": pa.array(tgts, pa.string()),
                "docs_xy": pa.array([len(d) for d in sids], pa.int64()),
                "docs_src": pa.array([len(inc[s]) for s in srcs], pa.int64()),
                "docs_tgt": pa.array([len(inc[t]) for t in tgts], pa.int64()),
            })
            return finish(mid)

        return edges.repartition(1).map_batches(
            local_lift, batch_format="pyarrow", batch_size=None)

    from .sortagg import sorted_attach_first, sorted_count

    def edge_rows(b: pa.Table) -> pa.Table:
        return pa.Table.from_pydict({
            "src": b.column("src"), "tgt": b.column("tgt"),
            "docs_xy": pc.cast(
                pc.list_value_length(b.column("source_ids")), pa.int64()),
        })

    exy = edges.map_batches(edge_rows, batch_format="pyarrow")

    def inc_rows(b: pa.Table) -> pa.Table:
        sids = b.column("source_ids")
        lens = pc.list_value_length(sids).to_numpy(zero_copy_only=False)
        idx = pa.array(np.repeat(np.arange(len(b)), lens))
        flat = pc.list_flatten(sids)
        t1 = pa.table({"e": pc.take(b.column("src"), idx), "did": flat})
        t2 = pa.table({"e": pc.take(b.column("tgt"), idx), "did": flat})
        return pa.concat_tables([t1, t2]).combine_chunks()

    inc = edges.map_batches(inc_rows, batch_format="pyarrow")
    # distinct (e, did), then |D(e)| per entity — two segment passes
    dist = sorted_count(inc, ["e", "did"], count_name="_m")
    cnt = sorted_count(dist.select_columns(["e", "did"]), ["e"],
                       count_name="docs_e")

    def attach_side(edge_ds: ray.data.Dataset, side: str, out_name: str,
                    edge_cols: list[tuple[str, pa.DataType]]) -> ray.data.Dataset:
        """Ship |D(e)| onto edge rows keyed by ``side`` without a join:
        union the edge rows (carrier marker 1, docs_e placeholder 0) with
        the count rows (marker 0, null-padded to the edge schema), then
        ``sorted_attach_first`` broadcasts each key's count — the unique
        marker-0 carrier — onto its edge rows."""

        def key_edges(b: pa.Table) -> pa.Table:
            n = len(b)
            return (b.append_column("e", b.column(side))
                     .append_column("_carrier", pa.array(
                         np.ones(n, dtype=np.int8), pa.int8()))
                     .append_column("docs_e", pa.array(
                         np.zeros(n, dtype=np.int64), pa.int64())))

        def key_counts(b: pa.Table) -> pa.Table:
            n = len(b)
            d: dict[str, object] = {name: pa.nulls(n, typ)
                                    for name, typ in edge_cols}
            d["e"] = b.column("e")
            d["_carrier"] = pa.array(np.zeros(n, dtype=np.int8), pa.int8())
            d["docs_e"] = pc.cast(b.column("docs_e"), pa.int64())
            return pa.Table.from_pydict(d)

        keyed = edge_ds.map_batches(key_edges, batch_format="pyarrow")
        carriers = cnt.map_batches(key_counts, batch_format="pyarrow")
        attached = sorted_attach_first(
            keyed.union(carriers), ["e"], value_col="docs_e",
            order_col="_carrier", attach_name=out_name)
        return (attached.filter(expr="_carrier == 1")
                .drop_columns(["e", "_carrier", "docs_e"]))

    base_cols = [("src", pa.string()), ("tgt", pa.string()),
                 ("docs_xy", pa.int64())]
    out = attach_side(exy, "src", "docs_src", base_cols)
    out = attach_side(out, "tgt", "docs_tgt",
                      base_cols + [("docs_src", pa.int64())])
    return out.map_batches(finish, batch_format="pyarrow")


def hop_distance(
    graph: ray.data.Dataset,
    seeds: list[str],
    max_depth: int = 3,
    local_threshold: int = 1 << 20,
    broadcast_cap: int = 100_000,
) -> ray.data.Dataset:
    """Bounded-depth BFS hop distance from a seed entity set over the
    undirected canonical graph — the multi-hop generalization of the
    retrieval path's 1-hop expand (J6, reference query.go:349-417):
    depth-2/3 context expansion around the query keywords.  Returns
    ``(entity_id, hops)`` for every entity reachable within ``max_depth``
    (seeds at 0, unreachable entities absent); hops = min over paths,
    integer-exact and deterministic.

    Scale plan, per round (one round per depth level, early-stop when no
    new entity appears — the reached count is monotone):

    - frontier ≤ ``broadcast_cap`` (the normal retrieval case: the k-hop
      ball around query keywords is query-scoped): the frontier ships
      once via ``ray.put`` and the round is ONE vectorized semi-join scan
      of the edge table — no shuffle at all.
    - frontier above the cap (dense small-world expansions): a join-free
      segment attach (``sorted_attach_first`` over union(edges, frontier
      markers)) marks edges whose source is in the frontier — the same
      round shape as the distributed PageRank — followed by the shared
      groupby-min fold.

    The dist table re-materializes per round so lineage stays one round
    deep.  Graphs under ``local_threshold`` short-circuit to one task
    (bit-identical output; dedup._cc_min_label's measured
    scheduling-cost lesson)."""
    import ray
    import ray.data.aggregate as agg

    from .sortagg import sorted_attach_first

    sset = frozenset(seeds)
    nodes, edges = _graph_sides(graph)

    if edges.count() <= local_threshold and nodes.count() <= local_threshold:
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

        def local_bfs(b: pa.Table) -> pa.Table:
            is_node = pc.is_null(b.column("v"))
            names = b.filter(is_node).column("u").to_pylist()
            e = b.filter(pc.invert(is_node))
            adj: dict[str, list[str]] = {}
            for s, t in zip(e.column("u").to_pylist(),
                            e.column("v").to_pylist()):
                adj.setdefault(s, []).append(t)
                adj.setdefault(t, []).append(s)
            dist = {n: 0 for n in names if n in sset}
            frontier = list(dist)
            for d in range(1, max_depth + 1):
                nxt = []
                for u in frontier:
                    for v in adj.get(u, ()):
                        if v not in dist:
                            dist[v] = d
                            nxt.append(v)
                if not nxt:
                    break
                frontier = nxt
            items = sorted(dist.items())
            return pa.Table.from_pydict(
                {"entity_id": pa.array([k for k, _ in items], pa.string()),
                 "hops": pa.array([v for _, v in items], pa.int64())})

        return both.map_batches(local_bfs, batch_format="pyarrow",
                                batch_size=None)

    def und_rows(b: pa.Table) -> pa.Table:
        a = pa.concat_arrays([b.column("src").combine_chunks(),
                              b.column("tgt").combine_chunks()])
        c = pa.concat_arrays([b.column("tgt").combine_chunks(),
                              b.column("src").combine_chunks()])
        return pa.Table.from_arrays([a, c], names=["a", "b"])

    und = edges.map_batches(und_rows, batch_format="pyarrow").materialize()

    seed_arr = pa.array(sorted(sset), pa.string())

    def seed_rows(b: pa.Table) -> pa.Table:
        hit = b.filter(pc.is_in(b.column("entity_id"), value_set=seed_arr))
        return pa.Table.from_pydict(
            {"entity_id": hit.column("entity_id"),
             "hops": pa.nulls(len(hit), pa.int64()).fill_null(0)})

    dist = nodes.map_batches(seed_rows, batch_format="pyarrow").materialize()
    prev = dist.count()

    for d in range(1, max_depth + 1):
        frontier = dist.filter(expr=f"hops == {d - 1}")
        fcount = frontier.count()
        if fcount == 0:
            break

        if fcount <= broadcast_cap:
            # query-scoped frontier: broadcast once, one semi-join scan
            # (take_all is capped at broadcast_cap rows by the branch)
            fref = ray.put(pa.array(
                sorted(r["entity_id"] for r in frontier.take_all()),
                pa.string()))

            def semi(b: pa.Table, _d: int = d, _ref=fref) -> pa.Table:
                fset = ray.get(_ref)
                hit = b.filter(pc.is_in(b.column("a"), value_set=fset))
                return pa.Table.from_pydict(
                    {"entity_id": hit.column("b"),
                     "hops": pa.nulls(len(hit), pa.int64()).fill_null(_d)})

            cand = und.map_batches(semi, batch_format="pyarrow")
        else:
            def mark_rows(b: pa.Table, _d: int = d) -> pa.Table:
                n = len(b)
                return pa.Table.from_pydict(
                    {"a": b.column("entity_id"),
                     "b": pa.nulls(n, pa.string()).fill_null(""),
                     "_carrier": pa.nulls(n, pa.int8()).fill_null(0),
                     "mk": pa.nulls(n, pa.int64()).fill_null(1)})

            def edge_rows2(b: pa.Table) -> pa.Table:
                n = len(b)
                return (b.append_column(
                            "_carrier",
                            pa.nulls(n, pa.int8()).fill_null(1))
                         .append_column(
                            "mk", pa.nulls(n, pa.int64()).fill_null(0)))

            att = sorted_attach_first(
                und.map_batches(edge_rows2, batch_format="pyarrow")
                .union(frontier.map_batches(mark_rows,
                                            batch_format="pyarrow")),
                ["a"], value_col="mk", order_col="_carrier",
                attach_name="in_frontier")

            def to_cand(b: pa.Table, _d: int = d) -> pa.Table:
                keep = pc.and_(pc.equal(b.column("_carrier"), 1),
                               pc.equal(b.column("in_frontier"), 1))
                hit = b.filter(keep)
                return pa.Table.from_pydict(
                    {"entity_id": hit.column("b"),
                     "hops": pa.nulls(len(hit), pa.int64()).fill_null(_d)})

            cand = att.map_batches(to_cand, batch_format="pyarrow")

        dist = (
            dist.union(cand)
            .groupby("entity_id")
            .aggregate(agg.Min("hops", alias_name="hops"))
            .materialize()
        )
        c = dist.count()
        if c == prev:
            break
        prev = c

    return dist


def weighted_sssp(
    graph: ray.data.Dataset,
    seeds: list[str],
    max_hops: int = 3,
    local_threshold: int = 1 << 20,
    broadcast_cap: int = 100_000,
) -> ray.data.Dataset:
    """Bounded-hop weighted shortest path from a seed entity set over the
    undirected canonical graph — ``hop_distance`` with the edge's dyadic
    relationship weight as the length.  Returns ``(entity_id, dist_half)``:
    the minimum total weight in HALF-UNITS (int64 — weights are sums of
    0.5/1.0 mention contributions, so ×2 is exactly integral) over paths
    of at most ``max_hops`` edges; seeds at 0, unreachable entities absent.
    All-integer arithmetic, so min-fold order never matters and the DuckDB
    recursive-CTE oracle matches bit-exactly.

    Scale plan = Bellman-Ford rounds, one per hop level, each round the
    same two shapes as ``hop_distance``: a broadcast relax when the dist
    table is query-scoped (≤ ``broadcast_cap``: ship (entity, dist) once
    via ``ray.put``, one vectorized ``index_in`` scan of the edge table),
    else the join-free segment attach (``sorted_attach_first`` ships each
    node's current dist onto its out-edges).  Early-stop on the
    (reached-count, dist-total) pair — reached is monotone nondecreasing
    and every dist monotone nonincreasing, so the pair is a fixpoint
    certificate.  Graphs under ``local_threshold`` short-circuit to one
    task (bit-identical output)."""
    import ray
    import ray.data.aggregate as agg

    from .sortagg import sorted_attach_first

    sset = frozenset(seeds)
    nodes = graph.filter(expr="kind == 'node'").select_columns(["entity_id"])
    edges = graph.filter(expr="kind == 'edge'").select_columns(
        ["src", "tgt", "weight"])

    def _w2(b: pa.Table) -> np.ndarray:
        # dyadic weights: ×2 then the same floor(x+0.5) op sequence the
        # oracle side uses for integer derivation
        return np.floor(
            b.column("weight").to_numpy(zero_copy_only=False) * 2 + 0.5
        ).astype(np.int64)

    if edges.count() <= local_threshold and nodes.count() <= local_threshold:
        def tag_nodes(b: pa.Table) -> pa.Table:
            n = len(b)
            return pa.Table.from_pydict(
                {"u": b.column("entity_id"),
                 "v": pa.nulls(n, pa.string()),
                 "w2": pa.nulls(n, pa.int64()).fill_null(0)})

        def tag_edges(b: pa.Table) -> pa.Table:
            return pa.Table.from_pydict(
                {"u": b.column("src"), "v": b.column("tgt"),
                 "w2": pa.array(_w2(b), pa.int64())})

        both = (
            nodes.map_batches(tag_nodes, batch_format="pyarrow")
            .union(edges.map_batches(tag_edges, batch_format="pyarrow"))
            .repartition(1)
        )

        def local_bf(b: pa.Table) -> pa.Table:
            is_node = pc.is_null(b.column("v"))
            names = b.filter(is_node).column("u").to_pylist()
            e = b.filter(pc.invert(is_node))
            adj: dict[str, list[tuple[str, int]]] = {}
            for s, t, w in zip(e.column("u").to_pylist(),
                               e.column("v").to_pylist(),
                               e.column("w2").to_pylist()):
                adj.setdefault(s, []).append((t, w))
                adj.setdefault(t, []).append((s, w))
            dist = {n: 0 for n in names if n in sset}
            for _ in range(max_hops):
                changed = False
                for u, du in list(dist.items()):
                    for v, w in adj.get(u, ()):
                        # NOTE: plain Bellman-Ford here would relax dists
                        # set THIS round one hop further; iterate over a
                        # snapshot so each round adds exactly one hop,
                        # matching the distributed rounds and the oracle's
                        # hop-counted walk.
                        if v not in dist or du + w < dist[v]:
                            dist[v] = du + w
                            changed = True
                if not changed:
                    break
            items = sorted(dist.items())
            return pa.Table.from_pydict(
                {"entity_id": pa.array([k for k, _ in items], pa.string()),
                 "dist_half": pa.array([v for _, v in items], pa.int64())})

        return both.map_batches(local_bf, batch_format="pyarrow",
                                batch_size=None)

    def und_rows(b: pa.Table) -> pa.Table:
        w2 = pa.array(_w2(b), pa.int64())
        a = pa.concat_arrays([b.column("src").combine_chunks(),
                              b.column("tgt").combine_chunks()])
        c = pa.concat_arrays([b.column("tgt").combine_chunks(),
                              b.column("src").combine_chunks()])
        w = pa.concat_arrays([w2, w2])
        return pa.Table.from_arrays([a, c, w], names=["a", "b", "w2"])

    und = edges.map_batches(und_rows, batch_format="pyarrow").materialize()

    seed_arr = pa.array(sorted(sset), pa.string())

    def seed_rows(b: pa.Table) -> pa.Table:
        hit = b.filter(pc.is_in(b.column("entity_id"), value_set=seed_arr))
        return pa.Table.from_pydict(
            {"entity_id": hit.column("entity_id"),
             "dist_half": pa.nulls(len(hit), pa.int64()).fill_null(0)})

    dist = nodes.map_batches(seed_rows, batch_format="pyarrow").materialize()

    def _certificate(ds: ray.data.Dataset) -> tuple[int, int]:
        t = ds.aggregate(agg.Count(alias_name="n"),
                         agg.Sum("dist_half", alias_name="s"))
        return (t["n"], t["s"] or 0)

    prev = _certificate(dist)

    for _ in range(max_hops):
        if prev[0] <= broadcast_cap:
            rows = dist.take_all()
            ents = sorted(r["entity_id"] for r in rows)
            dmap = {r["entity_id"]: r["dist_half"] for r in rows}
            fref = ray.put((pa.array(ents, pa.string()),
                            np.array([dmap[e] for e in ents], np.int64)))

            def relax(b: pa.Table, _ref=fref) -> pa.Table:
                fents, fdist = ray.get(_ref)
                idx = pc.index_in(b.column("a"), value_set=fents)
                ok = pc.is_valid(idx).to_numpy(zero_copy_only=False)
                hit = b.filter(pa.array(ok))
                pos = idx.to_numpy(zero_copy_only=False)[ok].astype(np.int64)
                cand = fdist[pos] + hit.column("w2").to_numpy(
                    zero_copy_only=False)
                return pa.Table.from_pydict(
                    {"entity_id": hit.column("b"),
                     "dist_half": pa.array(cand, pa.int64())})

            cand = und.map_batches(relax, batch_format="pyarrow")
        else:
            def mark_rows(b: pa.Table) -> pa.Table:
                n = len(b)
                d = b.column("dist_half").to_numpy(zero_copy_only=False)
                return pa.Table.from_pydict(
                    {"a": b.column("entity_id"),
                     "b": pa.nulls(n, pa.string()).fill_null(""),
                     "w2": pa.nulls(n, pa.int64()).fill_null(0),
                     "_carrier": pa.nulls(n, pa.int8()).fill_null(0),
                     "mk": pa.array(d + 1, pa.int64())})

            def edge_rows2(b: pa.Table) -> pa.Table:
                n = len(b)
                return (b.append_column(
                            "_carrier", pa.nulls(n, pa.int8()).fill_null(1))
                         .append_column(
                            "mk", pa.nulls(n, pa.int64()).fill_null(0)))

            att = sorted_attach_first(
                und.map_batches(edge_rows2, batch_format="pyarrow")
                .union(dist.map_batches(mark_rows, batch_format="pyarrow")),
                ["a"], value_col="mk", order_col="_carrier",
                attach_name="src_mk")

            def to_cand(b: pa.Table) -> pa.Table:
                keep = pc.and_(pc.equal(b.column("_carrier"), 1),
                               pc.greater(b.column("src_mk"), 0))
                hit = b.filter(keep)
                cand = (hit.column("src_mk").to_numpy(zero_copy_only=False)
                        - 1 + hit.column("w2").to_numpy(zero_copy_only=False))
                return pa.Table.from_pydict(
                    {"entity_id": hit.column("b"),
                     "dist_half": pa.array(cand, pa.int64())})

            cand = att.map_batches(to_cand, batch_format="pyarrow")

        dist = (
            dist.union(cand)
            .groupby("entity_id")
            .aggregate(agg.Min("dist_half", alias_name="dist_half"))
            .materialize()
        )
        cert = _certificate(dist)
        if cert == prev:
            break
        prev = cert

    return dist


def graph_summary(graph: ray.data.Dataset) -> ray.data.Dataset:
    """One-row graph data card: ``(n_nodes, n_edges, node_mentions,
    edge_mentions, total_weight_x2)`` over the canonical graph.

    One vectorized scan, ONE partial row per block to the driver (the
    prefix-sum-summary idiom).  Edge weights are dyadic (sums of 1.0/0.5
    — canonicalize's adjacency/glean weights), so ``weight · 2`` is an
    exact int64 and the total is order-independent."""
    import numpy as np

    def partial(b: pa.Table) -> pa.Table:
        is_edge = pc.equal(b.column("kind"), "edge")
        eb = b.filter(is_edge)
        nb = b.filter(pc.invert(is_edge))
        w2 = np.rint(eb.column("weight").to_numpy(
            zero_copy_only=False) * 2).astype(np.int64) if len(eb) else \
            np.empty(0, np.int64)
        def _mc(t):
            if len(t) == 0:
                return 0
            return int(t.column("mention_count").to_numpy(
                zero_copy_only=False).sum())
        return pa.table({
            "n_nodes": pa.array([len(nb)], pa.int64()),
            "n_edges": pa.array([len(eb)], pa.int64()),
            "node_mentions": pa.array([_mc(nb)], pa.int64()),
            "edge_mentions": pa.array([_mc(eb)], pa.int64()),
            "total_weight_x2": pa.array([int(w2.sum())], pa.int64()),
        })

    parts = graph.map_batches(partial, batch_format="pyarrow").take_all()
    agg = {k: sum(r[k] for r in parts) for k in
           ("n_nodes", "n_edges", "node_mentions", "edge_mentions",
            "total_weight_x2")}
    return ray.data.from_arrow(pa.table(
        {k: pa.array([v], pa.int64()) for k, v in agg.items()}))
