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
