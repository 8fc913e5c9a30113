"""Graph analytics: integer PageRank + components, both execution paths.

The distributed PageRank path (segment broadcast + segment sum per round)
must be bit-identical to the single-task local loop, and both must match an
independent pure-Python reference of the fixed-point recurrence.
"""

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from go_light_rag_ray.stages.graphalg import components, pagerank
from go_light_rag_ray.stages.sortagg import sorted_attach_first


def _graph_ds(nodes: list[str], edges: list[tuple[str, str]]) -> ray.data.Dataset:
    """Minimal canonical-graph-shaped dataset (kind/entity_id/src/tgt)."""
    n, e = len(nodes), len(edges)
    return ray.data.from_arrow(pa.table({
        "kind": ["node"] * n + ["edge"] * e,
        "entity_id": nodes + [None] * e,
        "src": [None] * n + [a for a, _ in edges],
        "tgt": [None] * n + [b for _, b in edges],
    })).repartition(4)


def _reference_pagerank(nodes, edges, iterations=3, scale=10**6, d=85):
    """Independent dict-based implementation of the same recurrence."""
    base = (scale * (100 - d)) // 100
    out = {}
    for a, _ in edges:
        out[a] = out.get(a, 0) + 1
    rank = {v: scale for v in nodes}
    for _ in range(iterations):
        new = {v: base for v in nodes}
        for a, b in edges:
            new[b] += (d * rank[a]) // (100 * out[a])
        rank = new
    return rank


NODES = ["A", "B", "C", "D", "E", "F"]
EDGES = [("A", "B"), ("A", "C"), ("B", "C"), ("C", "A"), ("D", "C")]
# E, F isolated; D dangling-in only (contributes, receives nothing)


def _run_pagerank(**kw):
    out = pagerank(_graph_ds(NODES, EDGES), **kw).take_all()
    return {r["entity_id"]: r["pagerank"] for r in out}


def test_pagerank_matches_reference(ray_session):
    want = _reference_pagerank(NODES, EDGES)
    assert _run_pagerank() == want
    # sink-loss sanity: isolated nodes sit at base after ≥1 iteration
    assert want["E"] == 150_000 and want["F"] == 150_000
    assert want["C"] > want["B"]  # C has the most in-links


def test_pagerank_distributed_equals_local(ray_session):
    local = _run_pagerank()
    dist = _run_pagerank(local_threshold=0)
    assert dist == local


def test_pagerank_iterations_change_ranks(ray_session):
    one = _run_pagerank(iterations=1)
    three = _run_pagerank(iterations=3)
    assert one != three
    assert _reference_pagerank(NODES, EDGES, iterations=1) == one


@pytest.mark.parametrize("kw", [{}, {"max_driver_pairs": 0,
                                     "cc_local_threshold": 0}])
def test_components_both_paths(ray_session, kw):
    got = {r["entity_id"]: r["component_id"]
           for r in components(_graph_ds(NODES, EDGES), **kw).take_all()}
    assert got == {"A": "A", "B": "A", "C": "A", "D": "A",
                   "E": "E", "F": "F"}


def test_sorted_attach_first_matches_pandas(ray_session):
    rng = np.random.default_rng(7)
    n = 20_000
    key = rng.integers(0, 4000, size=n)
    order = rng.permutation(n)
    val = rng.integers(0, 1_000_000, size=n)
    ds = ray.data.from_arrow(pa.table({
        "k": key, "ord": order, "v": val.astype(np.int64)
    })).repartition(8)
    got = (
        sorted_attach_first(ds, ["k"], "v", "ord", attach_name="first_v")
        .to_pandas().sort_values(["k", "ord"]).reset_index(drop=True)
    )
    import pandas as pd

    df = pd.DataFrame({"k": key, "ord": order, "v": val.astype(np.int64)})
    first = df.sort_values(["k", "ord"]).groupby("k")["v"].transform("first")
    want = df.assign(first_v=first).sort_values(["k", "ord"]).reset_index(drop=True)
    assert got[["k", "ord", "v", "first_v"]].equals(want[["k", "ord", "v", "first_v"]])


def test_sorted_attach_first_descending_marker(ray_session):
    """The PageRank shape: one marker row per key (is_rank=1 first under
    desc order) broadcasts its value to every other row of the key."""
    ds = ray.data.from_arrow(pa.table({
        "k": [1, 1, 1, 2, 2], "is_rank": [1, 0, 0, 1, 0],
        "v": [100, 0, 0, 200, 0],
    })).repartition(3)
    got = sorted_attach_first(ds, ["k"], "v", "is_rank",
                              attach_name="kv", order_descending=True)
    rows = sorted(got.take_all(), key=lambda r: (r["k"], -r["is_rank"]))
    assert [r["kv"] for r in rows] == [100, 100, 100, 200, 200]


# ---------------------------------------------------------------------------
# triangles
# ---------------------------------------------------------------------------

def _brute_triangles(nodes, edges):
    und = set()
    for a, b in edges:
        if a != b:
            und.add((min(a, b), max(a, b)))
    adj = {x: set() for x in nodes}
    for a, b in und:
        adj[a].add(b)
        adj[b].add(a)
    want = {}
    for x in nodes:
        nb = sorted(adj[x])
        c = 0
        for i in range(len(nb)):
            for j in range(i + 1, len(nb)):
                if nb[j] in adj[nb[i]]:
                    c += 1
        want[x] = c
    return want


def test_triangles_simple():
    from go_light_rag_ray.stages.graphalg import triangles

    nodes = ["A", "B", "C", "D", "E"]
    edges = [("A", "B"), ("B", "C"), ("C", "A"), ("C", "D")]
    rows = triangles(_graph_ds(nodes, edges)).take_all()
    got = {r["entity_id"]: r["triangles"] for r in rows}
    assert got == {"A": 1, "B": 1, "C": 1, "D": 0, "E": 0}


def test_triangles_paths_agree_with_brute():
    from go_light_rag_ray.stages.graphalg import triangles

    rng = np.random.RandomState(11)
    nodes = [f"N{i:02d}" for i in range(30)]
    edges = set()
    for _ in range(90):
        a, b = rng.randint(0, 30, 2)
        if a != b:
            edges.add((nodes[a], nodes[b]))
    edges = sorted(edges)
    want = _brute_triangles(nodes, edges)
    for thr in (1 << 20, 0):  # local short-circuit vs distributed
        rows = triangles(_graph_ds(nodes, edges),
                         local_threshold=thr).take_all()
        got = {r["entity_id"]: r["triangles"] for r in rows}
        assert got == want, f"threshold={thr}"


def test_triangles_ignores_direction_duplicates_and_loops():
    from go_light_rag_ray.stages.graphalg import triangles

    nodes = ["A", "B", "C"]
    # both orientations + a duplicate + a self loop: still ONE triangle
    edges = [("A", "B"), ("B", "A"), ("B", "C"), ("C", "A"),
             ("A", "B"), ("A", "A")]
    for thr in (1 << 20, 0):
        rows = triangles(_graph_ds(nodes, edges),
                         local_threshold=thr).take_all()
        got = {r["entity_id"]: r["triangles"] for r in rows}
        assert got == {"A": 1, "B": 1, "C": 1}


# ---------------------------------------------------------------------------
# neighbor_jaccard
# ---------------------------------------------------------------------------

def _reference_jaccard(edges):
    """Independent dict-based shared-neighbor Jaccard."""
    und = set()
    for a, b in edges:
        if a != b:
            und.add((min(a, b), max(a, b)))
    adj: dict = {}
    for a, b in und:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    out = {}
    names = sorted(adj)
    for i, x in enumerate(names):
        for y in names[i + 1:]:
            c = len(adj[x] & adj[y])
            if c:
                u = len(adj[x] | adj[y])
                import numpy as _np
                out[(x, y)] = (c, len(adj[x]), len(adj[y]),
                               float(_np.floor(c / u * 1e6 + 0.5) / 1e6))
    return out


def _run_jaccard(edges, **kw):
    from go_light_rag_ray.stages.graphalg import neighbor_jaccard
    nodes = sorted({v for e in edges for v in e})
    rows = neighbor_jaccard(_graph_ds(nodes, edges), **kw).take_all()
    return {(r["entity_x"], r["entity_y"]):
            (r["common_neighbors"], r["deg_x"], r["deg_y"], r["jaccard"])
            for r in rows}


def test_neighbor_jaccard_hand_computed(ray_session):
    # star around C plus an A-B edge: A,B share {C}; A,D share {C}; etc.
    edges = [("A", "C"), ("B", "C"), ("D", "C"), ("A", "B")]
    got = _run_jaccard(edges)
    assert got == _reference_jaccard(edges)
    # A and B: common={C}, N(A)={C,B}, N(B)={C,A} → 1/3
    assert got[("A", "B")] == (1, 2, 2, 0.333333)
    # A and D: common={C}, N(D)={C} → 1/2
    assert got[("A", "D")] == (1, 2, 1, 0.5)


def test_neighbor_jaccard_paths_agree(ray_session):
    rng = np.random.RandomState(7)
    names = [f"N{i:02d}" for i in range(20)]
    edges = [(names[rng.randint(20)], names[rng.randint(20)])
             for _ in range(60)]
    local = _run_jaccard(edges)
    dist = _run_jaccard(edges, local_threshold=0)
    assert local == dist == _reference_jaccard(edges)
    # direction + duplicate edges must not matter
    doubled = edges + [(b, a) for a, b in edges]
    assert _run_jaccard(doubled) == local


def test_neighbor_jaccard_center_cap(ray_session):
    # hub H with 4 spokes; cap below 4 removes H-centred wedges entirely
    edges = [("H", s) for s in ["S1", "S2", "S3", "S4"]]
    assert len(_run_jaccard(edges)) == 6  # C(4,2) spoke pairs
    assert _run_jaccard(edges, max_center_degree=3) == {}
    assert _run_jaccard(edges, max_center_degree=3,
                        local_threshold=0) == {}


# ---------------------------------------------------------------------------
# personalized PageRank
# ---------------------------------------------------------------------------

def _reference_ppr(nodes, edges, seeds, iterations=3, scale=10**6, d=85):
    base = (scale * (100 - d)) // 100
    out = {}
    for a, _ in edges:
        out[a] = out.get(a, 0) + 1
    sset = set(seeds)
    rank = {v: (scale if v in sset else 0) for v in nodes}
    for _ in range(iterations):
        new = {v: (base if v in sset else 0) for v in nodes}
        for a, b in edges:
            new[b] += (d * rank[a]) // (100 * out[a])
        rank = new
    return rank


@pytest.mark.parametrize("kw", [{}, {"local_threshold": 0}])
def test_ppr_matches_reference_both_paths(ray_session, kw):
    seeds = ["A", "D"]
    got = {r["entity_id"]: r["pagerank"]
           for r in pagerank(_graph_ds(NODES, EDGES), seeds=seeds,
                             **kw).take_all()}
    assert got == _reference_ppr(NODES, EDGES, seeds)
    # non-seed isolated nodes hold zero mass
    assert got["E"] == 0 and got["F"] == 0
    # seeds keep their teleport base
    assert got["D"] >= 150_000


def test_ppr_empty_seed_set_is_all_zero(ray_session):
    got = {r["entity_id"]: r["pagerank"]
           for r in pagerank(_graph_ds(NODES, EDGES), seeds=[]).take_all()}
    assert set(got.values()) == {0}


def _reference_kcore(edges, k, rounds=0):
    """Independent simultaneous-peel reference."""
    pairs = sorted(set((min(a, b), max(a, b)) for a, b in edges if a != b))
    r = 0
    while pairs and (rounds <= 0 or r < rounds):
        deg = {}
        for u, v in pairs:
            deg[u] = deg.get(u, 0) + 1
            deg[v] = deg.get(v, 0) + 1
        kept = [(u, v) for u, v in pairs if deg[u] >= k and deg[v] >= k]
        if len(kept) == len(pairs):
            break
        pairs = kept
        r += 1
    deg = {}
    for u, v in pairs:
        deg[u] = deg.get(u, 0) + 1
        deg[v] = deg.get(v, 0) + 1
    return deg


@pytest.mark.parametrize("thr", [1 << 20, 0])
def test_kcore_both_paths_match_reference(ray_session, thr):
    from go_light_rag_ray.stages.graphalg import kcore

    # triangle ABC (2-core) + pendant chain C-D-E + isolated F; duplicate
    # and reversed edges plus a self loop must not change anything
    nodes = ["A", "B", "C", "D", "E", "F"]
    edges = [("A", "B"), ("B", "C"), ("C", "A"), ("C", "D"), ("D", "E"),
             ("B", "A"), ("C", "C")]
    got = {r["entity_id"]: r["core_degree"]
           for r in kcore(_graph_ds(nodes, edges), k=2,
                          local_threshold=thr).take_all()}
    assert got == _reference_kcore(edges, 2) == {"A": 2, "B": 2, "C": 2}
    # k=1 keeps every non-isolated node with its simple degree
    got1 = {r["entity_id"]: r["core_degree"]
            for r in kcore(_graph_ds(nodes, edges), k=1,
                           local_threshold=thr).take_all()}
    assert got1 == _reference_kcore(edges, 1)
    # k high enough empties the graph
    assert kcore(_graph_ds(nodes, edges), k=5,
                 local_threshold=thr).take_all() == []


def test_kcore_bounded_rounds_match_reference(ray_session):
    from go_light_rag_ray.stages.graphalg import kcore

    # long pendant chain: each round peels exactly one leaf pair, so a
    # bounded peel stops mid-way — both paths must match the same bound
    chain = [(chr(65 + i), chr(66 + i)) for i in range(8)]  # A-B-…-I
    nodes = sorted({x for e in chain for x in e})
    for rounds in (1, 2, 3):
        want = _reference_kcore(chain, 2, rounds=rounds)
        for thr in (1 << 20, 0):
            got = {r["entity_id"]: r["core_degree"]
                   for r in kcore(_graph_ds(nodes, chain), k=2,
                                  rounds=rounds,
                                  local_threshold=thr).take_all()}
            assert got == want, (rounds, thr)


# ---------------------------------------------------------------------------
# edge lift (doc-co-occurrence association)
# ---------------------------------------------------------------------------

def _lift_ds(edges: list[tuple[str, str, list[str]]]) -> ray.data.Dataset:
    return ray.data.from_arrow(pa.table({
        "kind": ["edge"] * len(edges) + ["node"],
        "src": [a for a, _, _ in edges] + [None],
        "tgt": [b for _, b, _ in edges] + [None],
        "source_ids": [d for _, _, d in edges] + [None],
        "entity_id": [None] * len(edges) + ["X"],
    })).repartition(3)


def _run_lift(edges, n_docs=10, **kw):
    from go_light_rag_ray.stages.graphalg import edge_lift

    out = edge_lift(_lift_ds(edges), n_docs=n_docs, **kw).take_all()
    return {(r["src"], r["tgt"]): (r["docs_xy"], r["docs_src"],
                                   r["docs_tgt"], r["lift"])
            for r in out}


def _reference_lift(edges, n_docs=10):
    inc: dict[str, set] = {}
    for a, b, docs in edges:
        inc.setdefault(a, set()).update(docs)
        inc.setdefault(b, set()).update(docs)
    return {
        (a, b): (len(set(docs)), len(inc[a]), len(inc[b]),
                 float(np.floor(n_docs * len(set(docs))
                                / (len(inc[a]) * len(inc[b])) * 1e6 + 0.5)
                       / 1e6))
        for a, b, docs in edges
    }


LIFT_EDGES = [
    ("A", "B", ["d1", "d2"]),
    ("A", "C", ["d1"]),
    ("B", "C", ["d3"]),
]


def test_edge_lift_hand_computed(ray_session):
    got = _run_lift(LIFT_EDGES)
    # D(A)={d1,d2}, D(B)={d1,d2,d3}, D(C)={d1,d3}
    assert got[("A", "B")] == (2, 2, 3, 3.333333)
    assert got[("A", "C")] == (1, 2, 2, 2.5)
    assert got[("B", "C")] == (1, 3, 2, 1.666667)
    assert got == _reference_lift(LIFT_EDGES)


def test_edge_lift_paths_agree(ray_session):
    rng = np.random.RandomState(11)
    names = [f"N{i:02d}" for i in range(12)]
    docs = [f"doc-{i:03d}" for i in range(30)]
    edges = []
    seen = set()
    for _ in range(40):
        a, b = names[rng.randint(12)], names[rng.randint(12)]
        if a == b or (a, b) in seen:
            continue
        seen.add((a, b))
        k = 1 + rng.randint(4)
        edges.append((a, b, sorted({docs[rng.randint(30)] for _ in range(k)})))
    local = _run_lift(edges, n_docs=30)
    dist = _run_lift(edges, n_docs=30, local_threshold=0)
    assert local == dist == _reference_lift(edges, n_docs=30)


# ---------------------------------------------------------------------------
# hop_distance: bounded BFS from seeds, all three execution paths
# ---------------------------------------------------------------------------

HOP_NODES = ["A", "B", "C", "D", "E", "F", "G"]
HOP_EDGES = [("A", "B"), ("B", "C"), ("C", "D"), ("D", "E"), ("F", "G")]
# chain A-B-C-D-E plus isolated pair F-G


def _hops(**kw):
    from go_light_rag_ray.stages.graphalg import hop_distance

    out = hop_distance(_graph_ds(HOP_NODES, HOP_EDGES), **kw).take_all()
    return {r["entity_id"]: r["hops"] for r in out}


def test_hop_distance_local(ray_session):
    assert _hops(seeds=["A"], max_depth=3) == {"A": 0, "B": 1, "C": 2, "D": 3}
    # undirected: seeding the middle reaches both sides
    assert _hops(seeds=["C"], max_depth=1) == {"B": 1, "C": 0, "D": 1}
    # two seeds, min over paths; unreachable F/G absent from the E seed
    assert _hops(seeds=["A", "E"], max_depth=2) == {
        "A": 0, "B": 1, "C": 2, "D": 1, "E": 0}
    assert _hops(seeds=["F"], max_depth=3) == {"F": 0, "G": 1}


def test_hop_distance_distributed_paths_match_local(ray_session):
    want = _hops(seeds=["A", "F"], max_depth=2)
    # force the distributed round loop, broadcast-frontier flavor
    got_bcast = _hops(seeds=["A", "F"], max_depth=2, local_threshold=0)
    # force the shuffle (segment-attach) flavor
    got_shuf = _hops(seeds=["A", "F"], max_depth=2, local_threshold=0,
                     broadcast_cap=0)
    assert got_bcast == want
    assert got_shuf == want


def test_hop_distance_nonexistent_seed_ignored(ray_session):
    assert _hops(seeds=["ZZZ"], max_depth=3) == {}
    assert _hops(seeds=["ZZZ", "A"], max_depth=1) == {"A": 0, "B": 1}


def test_graph_summary_hand_computed(ray_session):
    import pyarrow as pa
    import ray.data

    from go_light_rag_ray.stages.graphalg import graph_summary

    g = ray.data.from_arrow(pa.table({
        "kind": ["node", "node", "edge", "edge"],
        "entity_id": ["A", "B", "", ""],
        "src": ["", "", "A", "A"],
        "tgt": ["", "", "B", "B"],
        "mention_count": pa.array([3, 2, 4, 1], pa.int64()),
        "weight": [0.0, 0.0, 2.5, 0.5],
    })).repartition(2)
    row = graph_summary(g).take_all()[0]
    assert row["n_nodes"] == 2 and row["n_edges"] == 2
    assert row["node_mentions"] == 5 and row["edge_mentions"] == 5
    assert row["total_weight_x2"] == 6            # (2.5 + 0.5) * 2
