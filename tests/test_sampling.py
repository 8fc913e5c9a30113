"""Deterministic sampling: hash splits stable under repartitioning."""

import pyarrow as pa
import ray.data

from go_light_rag_ray.stages.sampling import hash_sample, split_assign


def _docs(n=400):
    return ray.data.from_arrow(pa.table({"doc_id": list(range(n))}))


def test_split_assign_fractions_and_determinism(ray_session):
    rows = split_assign(_docs()).take_all()
    counts = {}
    for r in rows:
        counts[r["split"]] = counts.get(r["split"], 0) + 1
    assert set(counts) == {"train", "val", "test"}
    assert counts["train"] > counts["val"] and counts["train"] > counts["test"]
    assert 0.7 < counts["train"] / 400 < 0.9
    # identical under a different physical layout
    again = split_assign(_docs().repartition(7)).take_all()
    assert sorted(map(tuple, (r.items() for r in rows))) == \
        sorted(map(tuple, (r.items() for r in again)))


def test_hash_sample_fraction_and_salt_independence(ray_session):
    a = {r["doc_id"] for r in hash_sample(_docs(), 0.25).take_all()}
    b = {r["doc_id"] for r in hash_sample(_docs(), 0.25, salt="other").take_all()}
    assert 0.15 < len(a) / 400 < 0.35
    assert a != b                      # different salts → different samples
    # sample is a strict subset relationship under larger fraction
    big = {r["doc_id"] for r in hash_sample(_docs(), 0.5).take_all()}
    assert a <= big
