"""Distributed prefix-sum + concat-and-chunk sequence packing."""

import numpy as np
import pyarrow as pa
import ray.data

from go_light_rag_ray.stages.packing import pack_sequences, prefix_sum


def _ds(vals, ids=None):
    ids = ids or [f"d{i:04d}" for i in range(len(vals))]
    return ray.data.from_arrow(pa.table({
        "doc_id": ids, "n": pa.array(vals, pa.int64())
    })).repartition(5)


def test_prefix_sum_exclusive_and_ordered():
    vals = [3, 1, 4, 1, 5, 9, 2, 6, 5, 3]
    rows = prefix_sum(_ds(vals), "doc_id", "n", out_col="off").take_all()
    rows.sort(key=lambda r: r["doc_id"])
    want = np.concatenate(([0], np.cumsum(vals)[:-1]))
    assert [r["off"] for r in rows] == list(want)


def test_prefix_sum_many_blocks_matches_numpy():
    rng = np.random.RandomState(4)
    vals = rng.randint(0, 100, size=500).tolist()
    rows = prefix_sum(_ds(vals), "doc_id", "n", out_col="off").take_all()
    rows.sort(key=lambda r: r["doc_id"])
    want = np.concatenate(([0], np.cumsum(vals)[:-1]))
    assert [r["off"] for r in rows] == list(want)


def test_pack_sequences_windows():
    texts = ["a b c", "d e", "f g h i", "", "j"]
    docs = ray.data.from_arrow(pa.table({
        "doc_id": [f"d{i}" for i in range(5)], "text": texts}))
    rows = pack_sequences(docs, budget=4).take_all()
    rows.sort(key=lambda r: r["doc_id"])
    got = [(r["n_tokens"], r["offset"], r["pack_id"], r["offset_in_pack"])
           for r in rows]
    # token stream: d0:[0,3) d1:[3,5) d2:[5,9) d3:[9,9) d4:[9,10)
    assert got == [(3, 0, 0, 0), (2, 3, 0, 3), (4, 5, 1, 1),
                   (0, 9, 2, 1), (1, 9, 2, 1)]
