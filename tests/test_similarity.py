"""Similarity search: brute-force cosine top-k + sign-LSH variant."""

import numpy as np
import pyarrow as pa
import ray.data

from go_light_rag_ray.stages.similarity import ann_topk, ann_topk_lsh, bucket_of


def _embeddings(n=40, dim=16, seed=3):
    rng = np.random.default_rng(seed)
    mat = rng.normal(size=(n, dim))
    mat[1] = mat[0] + rng.normal(scale=1e-3, size=dim)  # planted neighbor
    return ray.data.from_arrow(pa.table({
        "vec_id": list(range(n)),
        "embedding": pa.array([list(map(float, v)) for v in mat],
                              pa.list_(pa.float32())),
    })), mat


def _brute_topk(mat, qid, k):
    unit = mat / np.linalg.norm(mat, axis=1)[:, None]
    sims = np.round(unit @ unit[qid], 6)
    ids = np.arange(len(mat))
    mask = ids != qid
    order = np.lexsort((ids[mask], -sims[mask]))[:k]
    return ids[mask][order].tolist()


def test_ann_topk_matches_numpy_reference():
    ds, mat = _embeddings()
    rows = ann_topk(ds, n_queries=3, k=5).take_all()
    by_q = {}
    for r in rows:
        by_q.setdefault(r["query_id"], []).append(r)
    assert set(by_q) == {0, 1, 2}
    for qid, rs in by_q.items():
        rs.sort(key=lambda r: r["rank"])
        assert [r["rank"] for r in rs] == [1, 2, 3, 4, 5]
        assert [r["neighbor_id"] for r in rs] == _brute_topk(mat, qid, 5)
        sims = [r["cos_sim"] for r in rs]
        assert sims == sorted(sims, reverse=True)
    # planted near-dup is rank 1 both ways
    assert by_q[0][0]["neighbor_id"] == 1
    assert by_q[1][0]["neighbor_id"] == 0


def test_ann_topk_partial_merge_across_blocks():
    ds, mat = _embeddings(n=60)
    ds = ds.repartition(6)  # force multi-block partial top-k merge
    rows = ann_topk(ds, n_queries=1, k=4).take_all()
    rows.sort(key=lambda r: r["rank"])
    assert [r["neighbor_id"] for r in rows] == _brute_topk(mat, 0, 4)


def test_ann_topk_lsh_subset_of_bucket():
    ds, mat = _embeddings()
    rows = ann_topk_lsh(ds, n_queries=2, k=5, sign_bits=2).take_all()
    for r in rows:
        q = mat[r["query_id"]]
        n = mat[r["neighbor_id"]]
        assert bucket_of(q / np.linalg.norm(q), 2) == bucket_of(n, 2)
    # near-identical vectors share every sign → still found
    assert any(r["query_id"] == 0 and r["neighbor_id"] == 1 and r["rank"] == 1
               for r in rows)


def test_ann_topk_ivf_cell_restriction():
    from go_light_rag_ray.stages.similarity import ann_topk_ivf, _unit

    ds, mat = _embeddings(n=40)
    rows = ann_topk_ivf(ds, n_queries=2, k=5, n_centroids=4).take_all()
    # every neighbor shares its query's coarse cell
    unit = _unit(np.asarray(mat, dtype=np.float64))
    cmat = unit[:4]
    cells = np.argmax(np.round(unit @ cmat.T, 6), axis=1)
    for r in rows:
        assert cells[r["query_id"]] == cells[r["neighbor_id"]]
    # the planted near-identical pair lands in the same cell → rank 1
    assert any(r["query_id"] == 0 and r["neighbor_id"] == 1 and r["rank"] == 1
               for r in rows)


def test_ann_min_sim_radius(ray_session):
    """min_sim is the reference's vector-search radius (milvus.go:31):
    neighbors below the cosine threshold are excluded even inside top-k."""
    from go_light_rag_ray.stages.similarity import ann_topk

    ds, _ = _embeddings()
    full = {(r["query_id"], r["neighbor_id"]): r["cos_sim"]
            for r in ann_topk(ds, n_queries=2, k=5).take_all()}
    radius = 0.5
    rows = ann_topk(ds, n_queries=2, k=5, min_sim=radius).take_all()
    assert rows, "radius filter removed everything"
    for r in rows:
        assert r["cos_sim"] >= radius
        assert full[(r["query_id"], r["neighbor_id"])] == r["cos_sim"]
    assert any(v < radius for v in full.values())  # filter actually bites


def test_ann_metadata_where_filter(ray_session):
    """where= scopes the corpus before the scan (chromem.go:49-95
    metadata-scoped search)."""
    from go_light_rag_ray.stages.similarity import ann_topk

    ds, _ = _embeddings()
    rows = ann_topk(ds, n_queries=2, k=10, where="vec_id < 20").take_all()
    assert rows
    assert all(r["neighbor_id"] < 20 for r in rows)
    unscoped = ann_topk(ds, n_queries=2, k=10).take_all()
    assert any(r["neighbor_id"] >= 20 for r in unscoped)  # scope bites


def test_kmeans_ivf_deterministic_and_recall(ray_session):
    """Trained centroids are deterministic run-to-run and lift IVF recall
    on clustered data vs the first-N seed."""
    from go_light_rag_ray.stages.similarity import (
        ann_topk,
        ann_topk_ivf,
        train_kmeans_centroids,
    )

    # 4 tight clusters; the first-8 seed vectors all come from cluster 0,
    # so untrained IVF collapses cells while k-means separates them
    rng = np.random.default_rng(11)
    centers = rng.normal(size=(4, 16)) * 4
    mat = np.concatenate([centers[i % 4] + rng.normal(scale=0.1, size=16)
                          for i in range(120)]).reshape(120, 16)
    mat[:8] = centers[0] + rng.normal(scale=0.1, size=(8, 16))  # seed skew
    ds = ray.data.from_arrow(pa.table({
        "vec_id": list(range(120)),
        "embedding": pa.array([list(map(float, v)) for v in mat],
                              pa.list_(pa.float64())),
    })).repartition(4)

    c1 = train_kmeans_centroids(ds, n_centroids=4, iters=4)
    c2 = train_kmeans_centroids(ds, n_centroids=4, iters=4)
    assert np.array_equal(c1, c2)  # deterministic reduction order

    exact = {(r["query_id"], r["neighbor_id"])
             for r in ann_topk(ds, n_queries=4, k=5).take_all()}

    def recall(rows):
        got = {(r["query_id"], r["neighbor_id"]) for r in rows}
        return len(got & exact) / len(exact)

    r_seed = recall(ann_topk_ivf(ds, n_queries=4, k=5, n_centroids=4,
                                 kmeans_iters=0).take_all())
    r_trained = recall(ann_topk_ivf(ds, n_queries=4, k=5, n_centroids=4,
                                    kmeans_iters=4).take_all())
    assert r_trained >= r_seed
    assert r_trained >= 0.9


def test_ivf_nprobe_recovers_cross_cell_neighbor(ray_session):
    """nprobe is IVF's recall knob: a fixture where the true nearest
    neighbor is quantized into ANOTHER cell — nprobe=1 provably misses it,
    nprobe=2 finds it, and recall@1 is monotone in nprobe."""
    import pyarrow as pa

    from go_light_rag_ray.stages.similarity import ann_topk_ivf

    # centroids = first 2 vectors (oracle mode). id2 is the true NN of the
    # query (cos .61) but lands in centroid 1's cell; id3 (cos .5) is the
    # best within the query's own cell.
    vecs = [[1.0, 0.0],    # id0: query + centroid 0
            [0.0, 1.0],    # id1: centroid 1
            [0.62, 0.8],   # id2: true NN, assigned cell 1
            [0.5, -0.87]]  # id3: decoy in cell 0
    ds = ray.data.from_arrow(pa.table({
        "vec_id": pa.array([0, 1, 2, 3], pa.int64()),
        "embedding": pa.array(vecs, pa.list_(pa.float64())),
    }))

    def top1(nprobe):
        rows = ann_topk_ivf(ds, n_queries=1, k=1, n_centroids=2,
                            nprobe=nprobe).take_all()
        return {r["query_id"]: r["neighbor_id"] for r in rows}[0]

    assert top1(1) == 3          # single-cell scan misses the true NN
    assert top1(2) == 2          # probing the 2nd-nearest cell finds it


def test_lsh_multiprobe_recovers_cross_hyperplane_neighbor(ray_session):
    """Multi-probe LSH: the true NN sits just across the query's
    least-confident hyperplane; nprobe=1 misses, nprobe=2 flips that bit
    first and finds it."""
    import pyarrow as pa

    from go_light_rag_ray.stages.similarity import ann_topk_lsh

    vecs = [[0.05, 1.0],   # id0: query, bucket 1 (coord0 > 0)
            [-0.05, 1.0],  # id1: true NN (cos ~.995), bucket 0
            [1.0, 0.5]]    # id2: decoy in bucket 1 (cos ~.49)
    ds = ray.data.from_arrow(pa.table({
        "vec_id": pa.array([0, 1, 2], pa.int64()),
        "embedding": pa.array(vecs, pa.list_(pa.float64())),
    }))

    def top1(nprobe):
        rows = ann_topk_lsh(ds, n_queries=1, k=1, sign_bits=1,
                            nprobe=nprobe).take_all()
        return {r["query_id"]: r["neighbor_id"] for r in rows}[0]

    assert top1(1) == 2
    assert top1(2) == 1


def test_multiprobe_bucket_sequence_deterministic():
    from go_light_rag_ray.stages.similarity import (
        bucket_of,
        multiprobe_buckets,
    )

    v = [0.9, -0.01, 0.4, -0.7]
    base = bucket_of(v, 4)
    probes = multiprobe_buckets(v, 4, 3)
    assert probes[0] == base
    # flip order by ascending |coord|: bit1 (.01) then bit2 (.4)
    assert probes[1] == base ^ (1 << 1)
    assert probes[2] == base ^ (1 << 2)
    assert list(multiprobe_buckets(v, 4, 1)) == [base]


def test_final_topk_strategies_equivalent(ray_session):
    """The grouped merge and the segment (sorted_topk) merge of partial
    top-k lists agree row-for-row; the threshold picks grouped for small
    query sets."""
    import pyarrow as pa
    import ray.data

    from go_light_rag_ray.stages.similarity import (
        SEGMENT_MIN_GROUPS,
        _final_topk,
    )

    partial = ray.data.from_arrow(pa.table({
        "query_id": [0, 0, 0, 1, 1, 1, 1],
        "neighbor_id": [5, 6, 7, 5, 8, 9, 10],
        "cos_sim": [0.9, 0.8, 0.9, 0.5, 0.7, 0.7, 0.1],
    })).repartition(3)
    key = lambda r: (r["query_id"], r["rank"])  # noqa: E731
    grouped = sorted(_final_topk(partial, 2, n_queries=2).take_all(), key=key)
    segment = sorted(
        _final_topk(partial, 2, n_queries=SEGMENT_MIN_GROUPS).take_all(),
        key=key)
    assert len(grouped) == 4 and grouped == segment
    # rank-1 for query 0 is the 0.9 tie broken by ascending neighbor id
    assert grouped[0]["neighbor_id"] == 5


def test_embed_clusters_matches_numpy_reference():
    from go_light_rag_ray.stages.similarity import embed_clusters, _unit

    ds, mat = _embeddings(n=30)
    rows = embed_clusters(ds, n_centroids=4).take_all()
    unit = _unit(mat.astype(np.float64))
    cmat = unit[:4]
    sims = np.round(unit @ cmat.T, 6)
    want_cell = np.argmax(sims, axis=1)
    got = {r["vec_id"]: (r["cluster_id"], r["cos_sim"]) for r in rows}
    assert len(got) == 30
    for i in range(30):
        assert got[i][0] == want_cell[i]
        assert got[i][1] == sims[i, want_cell[i]]
    # centroid rows score 1.0; vec 1 (planted near-copy of vec 0) TIES at
    # rounded cos 1.0 with centroid 0 and the tie-break picks the LOWER
    # cluster id — the same rule the SQL oracle's (cos DESC, ci ASC) applies
    assert got[0] == (0, 1.0)
    assert got[1] == (0, 1.0)
    assert got[2] == (2, 1.0)
    assert got[3] == (3, 1.0)


def test_embed_clusters_trained_covers_all_rows():
    from go_light_rag_ray.stages.similarity import embed_clusters

    ds, _ = _embeddings(n=30)
    rows = embed_clusters(ds, n_centroids=4, kmeans_iters=2).take_all()
    assert len(rows) == 30
    assert set(r["cluster_id"] for r in rows) <= set(range(4))
    # deterministic: a second run yields identical assignments
    rows2 = embed_clusters(ds, n_centroids=4, kmeans_iters=2).take_all()
    key = lambda rs: sorted((r["vec_id"], r["cluster_id"], r["cos_sim"]) for r in rs)
    assert key(rows) == key(rows2)


def test_ann_topk_tie_heavy_replicated_corpus(ray_session):
    """r5 packed-key partial (vectorized across queries): whole tie
    classes straddle the k boundary on a replicated corpus — the
    (sim desc, id asc) tie-break must pick the LOWEST ids, exactly like
    the per-query reference loop."""
    rng = np.random.default_rng(5)
    base = rng.normal(size=(6, 8))
    rep = 7                                  # 7 exact copies of each vector
    mat = np.tile(base, (rep, 1))
    ds = ray.data.from_arrow(pa.table({
        "vec_id": list(range(len(mat))),
        "embedding": pa.array([list(map(float, v)) for v in mat],
                              pa.list_(pa.float32())),
    })).repartition(4)
    rows = ann_topk(ds, n_queries=2, k=5).take_all()
    by_q = {}
    for r in rows:
        by_q.setdefault(r["query_id"], []).append(r)
    for qid, rs in by_q.items():
        rs.sort(key=lambda r: r["rank"])
        assert [r["neighbor_id"] for r in rs] == _brute_topk(mat, qid, 5)


def test_as_matrix_rectangular_fast_path_and_ragged_fallback():
    from go_light_rag_ray.stages.similarity import _as_matrix

    rect = pa.chunked_array([pa.array([[1.0, 2.0], [3.0, 4.0]],
                                      pa.list_(pa.float32())),
                             pa.array([[5.0, 6.0]], pa.list_(pa.float32()))])
    m = _as_matrix(rect)
    assert m.dtype == np.float64 and m.shape == (3, 2)
    assert np.allclose(m, [[1, 2], [3, 4], [5, 6]])
    # sliced input (non-zero offset) must not misread the values buffer
    sl = rect.combine_chunks().slice(1, 2)
    assert np.allclose(_as_matrix(pa.chunked_array([sl])), [[3, 4], [5, 6]])
    # empty column
    empty = pa.chunked_array([pa.array([], pa.list_(pa.float32()))])
    assert _as_matrix(empty).shape[0] == 0
