"""Curation pipeline: quality/lang filters + dedup-last keep-first."""

import pyarrow as pa
import ray.data

from go_light_rag_ray.pipelines.curate import curate_corpus


def test_curate_filters_and_dedups():
    docs = ray.data.from_arrow(pa.table({
        "doc_id": [0, 1, 2, 3, 4],
        "text": [
            "the fast spark a the stream",      # en, decent quality
            "the fast spark a the stream",      # exact dup of 0 → dropped
            "a a a a a a",                      # quality 0 → dropped
            "small slow big small slow big",    # lang de → dropped
            "the quick brown fox runs fast",    # en, keeps
        ],
    }))
    rows = {r["doc_id"]: r for r in
            curate_corpus(docs, min_quality=0.3, langs=("en",)).take_all()}
    assert set(rows) == {0, 4}
    assert rows[0]["lang_pred"] == "en"
    assert rows[0]["n_tokens"] == 6
    assert 0.3 <= rows[0]["quality"] <= 1.0


def test_curate_dedup_keeps_smallest_id():
    docs = ray.data.from_arrow(pa.table({
        "doc_id": [9, 3, 7],
        "text": ["the fast one two three"] * 3,
    }))
    rows = curate_corpus(docs, min_quality=0.1, langs=("en",)).take_all()
    assert [r["doc_id"] for r in rows] == [3]


def test_md5_halves_large_string_offsets():
    # large_string ships int64 offsets; the fold must read them as such
    import hashlib
    import numpy as np
    import pyarrow as pa

    from go_light_rag_ray.pipelines.curate import _md5_halves

    texts = ["alpha", "beta", "gamma delta", ""]
    hexes = [hashlib.md5(t.encode()).hexdigest() for t in texts]
    small = pa.chunked_array([pa.array(hexes, pa.string())])
    large = pa.chunked_array([pa.array(hexes, pa.large_string())])
    s1, s2 = _md5_halves(small)
    l1, l2 = _md5_halves(large)
    assert np.array_equal(s1, l1) and np.array_equal(s2, l2)
    # and the values really are the hex halves
    for i, h in enumerate(hexes):
        assert s1[i] == int(h[:16], 16) and s2[i] == int(h[16:], 16)


def test_md5_halves_sliced_offset():
    import hashlib
    import pyarrow as pa

    from go_light_rag_ray.pipelines.curate import _md5_halves

    hexes = [hashlib.md5(str(i).encode()).hexdigest() for i in range(6)]
    arr = pa.array(hexes, pa.large_string()).slice(2, 3)
    h1, h2 = _md5_halves(pa.chunked_array([arr]))
    for i, h in enumerate(hexes[2:5]):
        assert h1[i] == int(h[:16], 16) and h2[i] == int(h[16:], 16)
