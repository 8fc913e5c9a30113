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
