"""HyperLogLog sketch: register exactness, merge associativity, estimate."""

import hashlib

import pyarrow as pa
import ray.data

from go_light_rag_ray.stages.hll import (
    HLL_MAX_RANK,
    hll_estimate,
    hll_merge,
    hll_registers,
)


def _ds(values):
    return ray.data.from_arrow(
        pa.table({"v": pa.array(values, pa.string())})).repartition(4)


def _expected_regs(values, salt="hll"):
    regs = {}
    for v in set(values):
        h = hashlib.md5((salt + v).encode()).hexdigest()
        bkt, w = int(h[:3], 16), int(h[3:15], 16)
        rank = HLL_MAX_RANK - w.bit_length() if w else HLL_MAX_RANK
        regs[bkt] = max(regs.get(bkt, 0), rank)
    return regs


def test_hll_registers_exact(ray_session):
    vals = [f"user-{i}" for i in range(200)] * 3  # duplicates don't matter
    got = {r["bucket"]: r["max_rank"]
           for r in hll_registers(_ds(vals), "v").take_all()}
    assert got == _expected_regs(vals)


def test_hll_merge_associative(ray_session):
    vals = [f"item-{i}" for i in range(300)]
    whole = {r["bucket"]: r["max_rank"]
             for r in hll_registers(_ds(vals), "v").take_all()}
    a = hll_registers(_ds(vals[:100]), "v")
    b = hll_registers(_ds(vals[100:250]), "v")
    c = hll_registers(_ds(vals[250:]), "v")
    merged = {r["bucket"]: r["max_rank"]
              for r in hll_merge(a, b, c).take_all()}
    assert merged == whole


def test_hll_estimate_accuracy(ray_session):
    n = 5000
    vals = [f"key-{i}" for i in range(n)]
    est = hll_estimate(hll_registers(_ds(vals), "v"))
    # standard error ~ 1.04/sqrt(4096) ≈ 1.6%; allow 5%
    assert abs(est - n) / n < 0.05
