"""Multimodal plumbing: span explosion, featurizer actor pool, frame sampling."""

import hashlib

import pyarrow as pa
import pytest
import ray.data

from go_light_rag_ray.schemas import DOCUMENTS_SCHEMA
from go_light_rag_ray.stages.multimodal import (
    HAVE_PIL,
    MEDIA_FEATURES_SCHEMA,
    MediaFeaturizer,
    extract_media_spans,
    featurize_media,
    frame_sample_refs,
)


def _interleaved_docs():
    rows = {
        "doc_id": ["d0", "d1"],
        "spans": [
            [
                {"kind": "text", "text": "hello world", "media_ref": "", "offset": 0},
                {"kind": "image", "text": "", "media_ref": "media://d0/0", "offset": 11},
                {"kind": "video", "text": "", "media_ref": "media://d0/v", "offset": 11},
            ],
            [
                {"kind": "text", "text": "only text", "media_ref": "", "offset": 0},
            ],
        ],
    }
    return ray.data.from_arrow(pa.Table.from_pydict(rows, schema=DOCUMENTS_SCHEMA))


def test_extract_media_spans_keeps_order_and_kind():
    rows = extract_media_spans(_interleaved_docs()).take_all()
    assert [(r["doc_id"], r["span_index"], r["kind"]) for r in
            sorted(rows, key=lambda r: (r["doc_id"], r["span_index"]))] == [
        ("d0", 1, "image"), ("d0", 2, "video")]


def test_featurizer_deterministic_schema_and_values():
    ds = featurize_media(_interleaved_docs(), backend="fake", concurrency=1)
    tbl = pa.Table.from_pylist(ds.take_all(), schema=MEDIA_FEATURES_SCHEMA)
    assert tbl.schema == MEDIA_FEATURES_SCHEMA
    row = {r["media_ref"]: r for r in tbl.to_pylist()}["media://d0/0"]
    digest = hashlib.md5(b"media://d0/0").digest()
    assert row["width"] == 64 + digest[0] % 192
    assert row["height"] == 64 + digest[1] % 192
    assert [row[f"f{k}"] for k in range(4)] == [digest[k + 2] for k in range(4)]


def test_real_backend_gated():
    if HAVE_PIL:  # pragma: no cover - not in this container
        pytest.skip("PIL present")
    with pytest.raises(NotImplementedError):
        MediaFeaturizer(backend="real")


def test_frame_sampling_expands_video_only():
    media = extract_media_spans(_interleaved_docs())
    rows = frame_sample_refs(media, fps_mod=4).take_all()
    by_kind = {}
    for r in rows:
        by_kind.setdefault(r["kind"], []).append(r["frame_ref"])
    assert by_kind["image"] == ["media://d0/0#frame0"]
    n = 1 + hashlib.md5(b"media://d0/v").digest()[3] % 4
    assert sorted(by_kind["video"]) == [f"media://d0/v#frame{i}" for i in range(n)]
