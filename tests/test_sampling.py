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


# ---------------------------------------------------------------------------
# mix_corpora (deterministic weighted interleave)
# ---------------------------------------------------------------------------

def _mix_ds(rows):
    import pyarrow as pa
    import ray.data
    return ray.data.from_arrow(pa.table({
        "doc_id": [r[0] for r in rows],
        "source": [r[1] for r in rows],
    })).repartition(4)


def test_mix_corpora_hand_computed(ray_session):
    from go_light_rag_ray.stages.sampling import mix_corpora
    # A weight 2, B weight 1 → A appears twice per window
    rows = [(f"a{i}", "A") for i in range(4)] + \
           [(f"b{i}", "B") for i in range(2)]
    out = mix_corpora(_mix_ds(rows), {"A": 2, "B": 1}).take_all()
    order = [r["doc_id"] for r in sorted(out, key=lambda r: r["mix_order"])]
    # prio: A r*1 → 0,1,2,3 ; B r*2 → 0,2 ; ties (prio, source, rank)
    assert order == ["a0", "b0", "a1", "a2", "b1", "a3"]
    ranks = {r["doc_id"]: r["src_rank"] for r in out}
    assert ranks["a2"] == 2 and ranks["b1"] == 1


def test_mix_corpora_scale_invariant_weights(ray_session):
    from go_light_rag_ray.stages.sampling import mix_corpora
    rows = [(f"a{i}", "A") for i in range(6)] + \
           [(f"b{i}", "B") for i in range(3)]
    one = mix_corpora(_mix_ds(rows), {"A": 2, "B": 1}).take_all()
    two = mix_corpora(_mix_ds(rows), {"A": 4, "B": 2}).take_all()
    key = lambda rows_: {r["doc_id"]: r["mix_order"] for r in rows_}
    assert key(one) == key(two)  # order is the rational r/w — scale-free


def test_mix_corpora_rejects_bad_weights(ray_session):
    import pytest
    from go_light_rag_ray.stages.sampling import mix_corpora
    with pytest.raises(ValueError):
        mix_corpora(_mix_ds([("a", "A")]), {})
    with pytest.raises(ValueError):
        mix_corpora(_mix_ds([("a", "A")]), {"A": 0})


def test_split_by_cluster_keeps_duplicates_together(ray_session):
    import pyarrow as pa

    from go_light_rag_ray.stages.sampling import split_assign, split_by_cluster

    # three clusters: {1,2,3} under rep 1, {7,8} under 7, singleton 9
    clusters = ray.data.from_arrow(pa.table({
        "doc_id": [1, 2, 3, 7, 8, 9],
        "cluster_id": [1, 1, 1, 7, 7, 9],
    }))
    rows = {r["doc_id"]: r for r in split_by_cluster(clusters).take_all()}
    assert len({rows[d]["split"] for d in (1, 2, 3)}) == 1   # co-assigned
    assert len({rows[d]["split"] for d in (7, 8)}) == 1
    # singleton == plain split_assign on its own id
    solo = split_assign(ray.data.from_arrow(
        pa.table({"doc_id": [9]}))).take_all()[0]["split"]
    assert rows[9]["split"] == solo


def test_bucket_batch_bit_exact_vs_per_row():
    """r5 vectorization (VERDICT r4 #4): the batched md5 bucket and hex
    column must equal the per-row reference exactly, for int and string
    ids, chunked arrays, and the empty batch."""
    import hashlib

    import numpy as np
    import pyarrow as pa

    from go_light_rag_ray.stages.sampling import (_bucket, _bucket_batch,
                                                  _md5_hex8_batch)

    ids_int = pa.array([0, 7, 123456789, 2**62], pa.int64())
    ids_str = pa.array([f"doc-{i}" for i in range(257)])
    chunked = pa.chunked_array([ids_str[:100], ids_str[100:]])
    for ids in (ids_int, ids_str, chunked):
        ref = np.array([_bucket(str(v), "split") for v in ids.to_pylist()],
                       np.uint32)
        assert (ref == _bucket_batch(ids, "split")).all()
        hx = [hashlib.md5(f"s{v}".encode()).hexdigest()[:8]
              for v in ids.to_pylist()]
        assert hx == _md5_hex8_batch(ids, "s").to_pylist()
    assert len(_bucket_batch(pa.array([], pa.string()), "x")) == 0


def test_fnv_fast_mode_deterministic_and_distinct():
    import numpy as np
    import pyarrow as pa

    from go_light_rag_ray.stages.sampling import _fnv1a64_batch

    ids = pa.array([f"doc-{i}" for i in range(1000)])

    def fnv_ref(s: str) -> int:
        m = (1 << 64) - 1
        h = 0xCBF29CE484222325
        for c in s.encode():
            h = ((h ^ c) * 0x100000001B3) & m
        # splitmix64 finalizer, as in _fnv1a64_batch
        h ^= h >> 33
        h = (h * 0xFF51AFD7ED558CCD) & m
        h ^= h >> 33
        h = (h * 0xC4CEB9FE1A85EC53) & m
        h ^= h >> 33
        return h >> 32

    got = _fnv1a64_batch(ids, "x")
    ref = np.array([fnv_ref("x" + v) for v in ids.to_pylist()], np.uint32)
    assert (got == ref).all()
    # ragged lengths exercise the column-wise masking
    ragged = pa.array(["", "a", "ab" * 40, "z"])
    got2 = _fnv1a64_batch(ragged, "")
    ref2 = np.array([fnv_ref(v) for v in ragged.to_pylist()], np.uint32)
    assert (got2 == ref2).all()


def test_split_assign_fast_mode_matches_fractions(ray_session):
    import ray.data
    import pyarrow as pa

    from go_light_rag_ray.stages.sampling import split_assign

    ds = ray.data.from_arrow(pa.table({"doc_id": list(range(2000))}))
    rows = split_assign(ds, hash_fn="fnv1a64").take_all()
    frac = sum(r["split"] == "train" for r in rows) / len(rows)
    assert 0.75 < frac < 0.85          # deterministic, roughly 0.8
    again = split_assign(ds, hash_fn="fnv1a64").take_all()
    assert {r["doc_id"]: r["split"] for r in rows} == \
        {r["doc_id"]: r["split"] for r in again}


def test_systematic_weighted_sample_exact(ray_session):
    """All-integer systematic draw: total picks == k, heavy rows carry
    multiplicity, zero-weight rows never picked, deterministic across
    repartitioning."""
    import pyarrow as pa
    import ray.data

    from go_light_rag_ray.stages.sampling import systematic_weighted_sample

    ds = ray.data.from_arrow(pa.table({
        "doc_id": list(range(6)),
        "w": pa.array([50, 0, 1, 30, 1, 18], pa.int64()),
    })).repartition(3)
    rows = systematic_weighted_sample(ds, "w", k=10).take_all()
    by_id = {r["doc_id"]: r["n_picks"] for r in rows}
    assert sum(by_id.values()) == 10
    assert 1 not in by_id                      # zero weight never picked
    assert by_id[0] == 5                       # 50/100 of the mass → 5 picks
    assert by_id[3] == 3
    rows2 = systematic_weighted_sample(
        ds.repartition(1), "w", k=10).take_all()
    assert {r["doc_id"]: r["n_picks"] for r in rows2} == by_id
    # brute-force check of target membership
    import numpy as np
    w = np.array([50, 0, 1, 30, 1, 18]); W = w.sum(); k = 10
    t = np.array([(2*j+1)*W // (2*k) for j in range(k)])
    off = np.concatenate(([0], np.cumsum(w)))[:-1]
    brute = {i: int(((t >= o) & (t < o+wi)).sum())
             for i, (o, wi) in enumerate(zip(off, w)) if wi}
    assert {i: n for i, n in brute.items() if n} == by_id


def test_systematic_weighted_sample_edges(ray_session):
    import pyarrow as pa
    import pytest
    import ray.data

    from go_light_rag_ray.stages.sampling import systematic_weighted_sample

    zero = ray.data.from_arrow(pa.table({
        "doc_id": [1, 2], "w": pa.array([0, 0], pa.int64())}))
    assert systematic_weighted_sample(zero, "w", k=5).take_all() == []
    neg = ray.data.from_arrow(pa.table({
        "doc_id": [1], "w": pa.array([-1], pa.int64())}))
    with pytest.raises(Exception):
        systematic_weighted_sample(neg, "w", k=5).take_all()
    with pytest.raises(ValueError):
        systematic_weighted_sample(zero, "w", k=0)
