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


# ---------------------------------------------------------------------------
# rank_buckets (CCNet head/middle/tail)
# ---------------------------------------------------------------------------

def _scored(scores, ids=None):
    ids = ids or [f"d{i:04d}" for i in range(len(scores))]
    return ray.data.from_arrow(pa.table({
        "doc_id": ids,
        "score": pa.array(scores, pa.float64()),
    })).repartition(4)


def test_rank_buckets_hand_computed():
    from go_light_rag_ray.stages.packing import rank_buckets
    # 6 docs, scores with a tie broken by doc_id
    scores = [0.5, 0.1, 0.9, 0.5, 0.3, 0.7]
    rows = rank_buckets(_scored(scores), "score").take_all()
    got = {r["doc_id"]: (r["doc_rank"], r["bucket"]) for r in rows}
    # ascending (score, doc_id): d0001(.1) d0004(.3) d0000(.5) d0003(.5)
    #                            d0005(.7) d0002(.9)
    assert got == {"d0001": (0, 0), "d0004": (1, 0),
                   "d0000": (2, 1), "d0003": (3, 1),
                   "d0005": (4, 2), "d0002": (5, 2)}


def test_rank_buckets_descending_and_total():
    from go_light_rag_ray.stages.packing import rank_buckets
    scores = [0.25, 0.75, 0.5]
    rows = rank_buckets(_scored(scores), "score", n_buckets=3,
                        descending=True).take_all()
    got = {r["doc_id"]: r["doc_rank"] for r in rows}
    assert got == {"d0001": 0, "d0002": 1, "d0000": 2}


def test_rank_buckets_equal_population_many():
    from go_light_rag_ray.stages.packing import rank_buckets
    rng = np.random.RandomState(11)
    # 6-dp-rounded scores, many duplicates → tie-break by id must still
    # yield exactly equal 1/3 populations
    scores = [float(np.floor(s * 1e6 + 0.5) / 1e6)
              for s in rng.rand(300)]
    rows = rank_buckets(_scored(scores), "score").take_all()
    counts = np.bincount([r["bucket"] for r in rows], minlength=3)
    assert list(counts) == [100, 100, 100]
    ranks = sorted(r["doc_rank"] for r in rows)
    assert ranks == list(range(300))


def test_pack_curriculum_hand_computed(ray_session):
    """Highest score packs first; ties break by ascending id; windows cut
    at the budget boundary over the reordered stream."""
    import pyarrow as pa
    import ray.data

    from go_light_rag_ray.stages.packing import pack_curriculum

    scored = ray.data.from_arrow(pa.table({
        "doc_id": [1, 2, 3, 4],
        "n_tokens": pa.array([5, 3, 4, 2], pa.int64()),
        "score": [0.5, 0.9, 0.9, 0.1],
    })).repartition(2)
    rows = {r["doc_id"]: r for r in pack_curriculum(
        scored, "score", budget=6).take_all()}
    # order: 2 (0.9, id 2), 3 (0.9, id 3), 1 (0.5), 4 (0.1)
    assert rows[2]["offset"] == 0 and rows[2]["pack_id"] == 0
    assert rows[3]["offset"] == 3 and rows[3]["pack_id"] == 0
    assert rows[1]["offset"] == 7 and rows[1]["pack_id"] == 1
    assert rows[4]["offset"] == 12 and rows[4]["pack_id"] == 2
    assert rows[1]["offset_in_pack"] == 1
    # ascending mode reverses the curriculum
    rows_asc = {r["doc_id"]: r for r in pack_curriculum(
        scored, "score", budget=6, descending=False).take_all()}
    assert rows_asc[4]["offset"] == 0


def test_pack_stats_hand_computed(ray_session):
    import pyarrow as pa
    import ray.data

    from go_light_rag_ray.stages.packing import pack_stats

    packed = ray.data.from_arrow(pa.table({
        "doc_id": [1, 2, 3, 4],
        "n_tokens": pa.array([5, 3, 4, 2], pa.int64()),
        "offset": pa.array([0, 5, 8, 12], pa.int64()),
        "pack_id": pa.array([0, 0, 1, 2], pa.int64()),
        "offset_in_pack": pa.array([0, 5, 2, 0], pa.int64()),
    })).repartition(2)
    rows = {r["pack_id"]: r for r in pack_stats(packed, budget=6).take_all()}
    assert rows[0]["n_docs"] == 2 and rows[0]["pack_tokens"] == 8
    assert rows[0]["n_straddle"] == 1        # doc 2: 5 + 3 > 6
    assert rows[1]["n_docs"] == 1 and rows[1]["n_straddle"] == 0
    assert rows[2]["pack_tokens"] == 2
