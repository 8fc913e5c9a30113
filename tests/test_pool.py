"""auto_pool sizing: cluster-frac bounds + the per-node bandwidth cap."""

import go_light_rag_ray.pool as pool


def test_configured_passthrough():
    assert pool.auto_pool(5) == 5
    assert pool.auto_pool((2, 7)) == (2, 7)
    assert pool.auto_pool((2, 7), per_node_cap=1) == (2, 7)  # explicit wins


def test_frac_bounds(monkeypatch):
    monkeypatch.setattr(pool, "_cluster_cpus", lambda: 32)
    assert pool.auto_pool(None, 0.5) == (8, 16)
    assert pool.auto_pool(None, 0.9) == (14, 28)


def test_per_node_cap(monkeypatch):
    monkeypatch.setattr(pool, "_cluster_cpus", lambda: 32)
    # 0.9×32 = 28, capped at 24 per (one) node
    assert pool.auto_pool(None, 0.9, per_node_cap=24) == (12, 24)
    # two nodes' worth of CPUs → cap doubles
    monkeypatch.setattr(pool, "_cluster_cpus", lambda: 64)
    assert pool.auto_pool(None, 0.9, per_node_cap=24) == (24, 48)
    # small cluster: frac bound is already under the cap
    monkeypatch.setattr(pool, "_cluster_cpus", lambda: 8)
    assert pool.auto_pool(None, 0.9, per_node_cap=24) == (3, 7)


def test_floor_two(monkeypatch):
    monkeypatch.setattr(pool, "_cluster_cpus", lambda: 2)
    assert pool.auto_pool(None, 0.5, per_node_cap=24) == (1, 2)
