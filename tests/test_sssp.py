"""Weighted shortest path (stages/graphalg.weighted_sssp), both paths."""

import pyarrow as pa
import pytest
import ray.data

from go_light_rag_ray.stages.graphalg import weighted_sssp


def _graph_ds(nodes, wedges):
    """Canonical-graph-shaped dataset with weighted edges."""
    n, e = len(nodes), len(wedges)
    return ray.data.from_arrow(pa.table({
        "kind": ["node"] * n + ["edge"] * e,
        "entity_id": nodes + [None] * e,
        "src": [None] * n + [a for a, _, _ in wedges],
        "tgt": [None] * n + [b for _, b, _ in wedges],
        "weight": [None] * n + [w for _, _, w in wedges],
    })).repartition(4)


NODES = ["A", "B", "C", "D", "E", "F"]
# A→B is expensive (4.0); the 2-hop A→C→B route is cheaper (0.5 + 1.0)
WEDGES = [("A", "B", 4.0), ("A", "C", 0.5), ("C", "B", 1.0),
          ("B", "D", 0.5), ("E", "F", 1.0)]


def _run(seeds, **kw):
    out = weighted_sssp(_graph_ds(NODES, WEDGES), seeds, **kw).take_all()
    return {r["entity_id"]: r["dist_half"] for r in out}


def test_sssp_prefers_cheaper_multihop_path(ray_session):
    d = _run(["A"], max_hops=3)
    # half-units: A=0, C=1, B=min(8, 1+2)=3, D=3+1=4; E/F unreachable
    assert d == {"A": 0, "C": 1, "B": 3, "D": 4}


def test_sssp_hop_bound_limits_relaxation(ray_session):
    d1 = _run(["A"], max_hops=1)
    assert d1 == {"A": 0, "B": 8, "C": 1}  # only direct edges
    d2 = _run(["A"], max_hops=2)
    assert d2 == {"A": 0, "B": 3, "C": 1, "D": 9}  # B via C; D via pricey B


def test_sssp_undirected_and_multi_seed(ray_session):
    d = _run(["D", "E"], max_hops=3)
    # undirected: D reaches B (1), C (3), A (4); E reaches F (2)
    assert d == {"D": 0, "E": 0, "B": 1, "C": 3, "A": 4, "F": 2}


def test_sssp_distributed_paths_match_local(ray_session):
    want = _run(["A"], max_hops=3)
    # force the broadcast-relax distributed path
    got_b = _run(["A"], max_hops=3, local_threshold=0)
    assert got_b == want
    # force the segment-attach path (dist table always above the cap)
    got_a = _run(["A"], max_hops=3, local_threshold=0, broadcast_cap=0)
    assert got_a == want


def test_sssp_no_seed_in_graph(ray_session):
    assert _run(["ZZZ"], max_hops=3) == {}
