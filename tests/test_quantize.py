"""int8 embedding quantization."""

import numpy as np
import pyarrow as pa
import ray.data

from go_light_rag_ray.stages.quantize import quantize_embeddings


def _emb(vectors):
    return ray.data.from_arrow(pa.table({
        "vec_id": list(range(len(vectors))),
        "embedding": pa.array(vectors, pa.list_(pa.float32())),
    })).repartition(2)


def test_quantize_hand_computed(ray_session):
    out = {r["vec_id"]: r for r in quantize_embeddings(
        _emb([[1.0, -0.5, 0.25], [0.0, 0.0], [2.0]])).take_all()}
    r0 = out[0]
    # scale = 127/1.0; codes floor([127, -63.5, 31.75] + .5) = [127,-63,32]
    assert r0["q"] == [127, -63, 32]
    assert (r0["q_sum"], r0["q_min"], r0["q_max"], r0["q_nonzero"]) == \
        (96, -63, 127, 3)
    assert r0["max_abs"] == 1.0 and r0["n_dims"] == 3
    r1 = out[1]  # all-zero vector: scale 0 → all-zero codes
    assert r1["q"] == [0, 0] and r1["q_sum"] == 0 and r1["q_nonzero"] == 0
    r2 = out[2]  # single element maps to +qmax
    assert r2["q"] == [127] and r2["max_abs"] == 2.0


def test_quantize_matches_reference_kernel(ray_session):
    rng = np.random.RandomState(3)
    vecs = [rng.randn(16).astype(np.float32).tolist() for _ in range(50)]
    out = {r["vec_id"]: r for r in quantize_embeddings(_emb(vecs)).take_all()}
    for i, v in enumerate(vecs):
        x = np.asarray(v, dtype=np.float64)
        m = np.abs(x).max()
        q = np.clip(np.floor(x * (127 / m) + 0.5), -127, 127).astype(int)
        assert out[i]["q"] == q.tolist()
        assert out[i]["q_sum"] == int(q.sum())


def test_quantize_code_dtype(ray_session):
    sch = quantize_embeddings(_emb([[1.0]])).schema()
    assert sch.types[sch.names.index("q")] == pa.list_(pa.int8())


# ---------------------------------------------------------------------------
# product quantization
# ---------------------------------------------------------------------------

def _emb_ds(mat, parts=1):
    import pyarrow as pa
    import ray.data

    ds = ray.data.from_arrow(pa.table({
        "vec_id": pa.array(range(len(mat)), pa.int64()),
        "embedding": [list(map(float, row)) for row in mat],
    }))
    return ds.repartition(parts) if parts > 1 else ds


def test_pq_codes_seed_vectors_encode_to_themselves(ray_session):
    """Each seed centroid vector is distance 0 from its own subvector in
    every subspace, so it must encode to its own index."""
    import numpy as np

    from go_light_rag_ray.stages.quantize import pq_codes

    rng = np.random.RandomState(7)
    mat = rng.randn(32, 16)
    rows = {r["vec_id"]: r
            for r in pq_codes(_emb_ds(mat, parts=3), n_subspaces=4,
                              n_centroids=8).take_all()}
    assert len(rows) == 32
    for i in range(8):
        assert [rows[i][f"code_{s}"] for s in range(4)] == [i, i, i, i]
    for r in rows.values():
        assert all(0 <= r[f"code_{s}"] < 8 for s in range(4))


def test_pq_adc_finds_the_planted_neighbor(ray_session):
    """A corpus vector equal to the query encodes to the query's own codes
    -> ADC distance 0 -> rank 1."""
    import numpy as np

    from go_light_rag_ray.stages.quantize import pq_ann_topk

    rng = np.random.RandomState(11)
    mat = rng.randn(40, 16) * 10
    mat[25] = mat[0]  # plant an exact duplicate of the query
    got = pq_ann_topk(_emb_ds(mat, parts=4), n_subspaces=4, n_centroids=8,
                      k=3).take_all()
    got.sort(key=lambda r: r["rank"])
    assert got[0]["vec_id"] == 25 and got[0]["adist"] == 0


def test_pq_codes_layout_invariant(ray_session):
    import numpy as np

    from go_light_rag_ray.stages.quantize import pq_codes

    rng = np.random.RandomState(3)
    mat = rng.randn(24, 8)
    a = sorted(map(tuple, (
        (r["vec_id"], r["code_0"], r["code_1"])
        for r in pq_codes(_emb_ds(mat), n_subspaces=2,
                          n_centroids=4).take_all())))
    b = sorted(map(tuple, (
        (r["vec_id"], r["code_0"], r["code_1"])
        for r in pq_codes(_emb_ds(mat, parts=5), n_subspaces=2,
                          n_centroids=4).take_all())))
    assert a == b


def test_pq_adc_multi_query_matches_single(ray_session):
    """r5 multi-query ADC: for each query id q, the (rank, vec_id, adist)
    triples must equal the legacy single-query scan run with that query's
    LUT — verified by a numpy reference over the same codes."""
    from go_light_rag_ray.stages.quantize import (_sub_micro_dists,
                                                  pq_ann_topk,
                                                  pq_seed_codebooks)

    rng = np.random.default_rng(13)
    base = rng.normal(size=(10, 8))
    mat = np.concatenate([base, base[:3] + 1e-4 * rng.normal(size=(3, 8))])
    ds = _emb([list(map(float, v)) for v in mat]).repartition(3)

    Q, K = 4, 3
    rows = pq_ann_topk(ds, n_subspaces=4, n_centroids=4, k=K,
                       n_queries=Q).take_all()
    by_q = {}
    for r in rows:
        by_q.setdefault(r["query_id"], []).append(r)
    assert set(by_q) == set(range(Q))

    cb = pq_seed_codebooks(ds, 4, 4)
    m = _sub_micro_dists(mat, cb)
    codes = m.argmin(axis=2)
    qlut = _sub_micro_dists(mat[:Q], cb)
    qlut = qlut * qlut
    ids = np.arange(len(mat))
    for q in range(Q):
        adist = np.zeros(len(mat), np.int64)
        for s in range(4):
            adist += qlut[q, s][codes[:, s]]
        mask = ids != q
        order = np.lexsort((ids[mask], adist[mask]))[:K]
        want = [(int(ids[mask][o]), int(adist[mask][o])) for o in order]
        got = sorted(by_q[q], key=lambda r: r["rank"])
        assert [(r["vec_id"], r["adist"]) for r in got] == want
        assert [r["rank"] for r in got] == list(range(1, K + 1))


def test_pq_adc_single_query_shape_unchanged(ray_session):
    """The n_queries=1 default must keep the legacy (rank, vec_id, adist)
    schema and values — the driver-green oracle contract."""
    from go_light_rag_ray.stages.quantize import pq_ann_topk

    rng = np.random.default_rng(3)
    mat = rng.normal(size=(12, 8))
    ds = _emb([list(map(float, v)) for v in mat]).repartition(2)
    rows = pq_ann_topk(ds, n_subspaces=4, n_centroids=4, k=5).take_all()
    assert len(rows) == 5
    assert set(rows[0]) == {"rank", "vec_id", "adist"}
    assert sorted(r["rank"] for r in rows) == [1, 2, 3, 4, 5]
    adists = [r["adist"] for r in sorted(rows, key=lambda r: r["rank"])]
    assert adists == sorted(adists)
    assert all(r["vec_id"] != 0 for r in rows)


def test_ann_topk_ivfpq_matches_reference(ray_session):
    """IVF-PQ == per-query brute over (own-cell candidates, ADC adist)."""
    from go_light_rag_ray.stages.quantize import (_sub_micro_dists,
                                                  ann_topk_ivfpq,
                                                  pq_seed_codebooks)

    rng = np.random.default_rng(21)
    mat = rng.normal(size=(30, 8))
    ds = _emb([list(map(float, v)) for v in mat]).repartition(3)
    Q, K, C = 3, 4, 5
    rows = ann_topk_ivfpq(ds, n_queries=Q, k=K, n_centroids=C,
                          n_subspaces=4, n_pq_centroids=4).take_all()
    by_q = {}
    for r in rows:
        by_q.setdefault(r["query_id"], []).append(r)

    m32 = mat.astype(np.float32).astype(np.float64)  # stored as f32
    unit = m32 / np.linalg.norm(m32, axis=1, keepdims=True)
    cmat = unit[:C]
    cells = np.argmax(np.round(unit @ cmat.T, 6), axis=1)
    cb = pq_seed_codebooks(ds, 4, 4)
    codes = _sub_micro_dists(m32, cb).argmin(axis=2)
    qlut = _sub_micro_dists(m32[:Q], cb)
    qlut = qlut * qlut
    ids = np.arange(len(mat))
    for q in range(Q):
        adist = np.zeros(len(mat), np.int64)
        for s in range(4):
            adist += qlut[q, s][codes[:, s]]
        mask = (cells == cells[q]) & (ids != q)
        order = np.lexsort((ids[mask], adist[mask]))[:K]
        want = [(int(ids[mask][o]), int(adist[mask][o])) for o in order]
        got = sorted(by_q.get(q, []), key=lambda r: r["rank"])
        assert [(r["vec_id"], r["adist"]) for r in got] == want


def test_ann_topk_ivfpq_nprobe_expands_candidates(ray_session):
    """nprobe=C scans every cell — the result set must be a superset-or-
    equal ranking vs nprobe=1 (monotone recall knob)."""
    from go_light_rag_ray.stages.quantize import ann_topk_ivfpq

    rng = np.random.default_rng(4)
    mat = rng.normal(size=(24, 8))
    ds = _emb([list(map(float, v)) for v in mat])
    one = ann_topk_ivfpq(ds, n_queries=2, k=3, n_centroids=6,
                         n_subspaces=4, n_pq_centroids=4,
                         nprobe=1).take_all()
    full = ann_topk_ivfpq(ds, n_queries=2, k=3, n_centroids=6,
                          n_subspaces=4, n_pq_centroids=4,
                          nprobe=6).take_all()
    # all-cell scan ranks over >= candidates: per query, best adist at
    # rank 1 under nprobe=6 is <= the nprobe=1 rank-1 adist
    best = lambda rows, q: min((r["adist"] for r in rows
                                if r["query_id"] == q and r["rank"] == 1),
                               default=None)
    for q in (0, 1):
        b1, bf = best(one, q), best(full, q)
        if b1 is not None and bf is not None:
            assert bf <= b1
