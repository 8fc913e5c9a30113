"""Corpus snapshot diff: status semantics + physical-layout invariance."""

import pyarrow as pa
import ray.data

from go_light_rag_ray.stages.diff import corpus_diff


def _snap(rows, parts=1):
    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "text": pa.array([r[1] for r in rows], pa.string()),
    }))
    return ds.repartition(parts) if parts > 1 else ds


OLD = [(1, "alpha"), (2, "beta"), (3, "gamma"), (4, "delta")]
NEW = [(2, "beta"), (3, "gamma prime"), (4, "delta"), (5, "epsilon")]
WANT = {1: "removed", 3: "changed", 5: "added"}


def test_corpus_diff_statuses(ray_session):
    got = {r["doc_id"]: r["status"]
           for r in corpus_diff(_snap(OLD), _snap(NEW)).take_all()}
    assert got == WANT


def test_corpus_diff_include_unchanged(ray_session):
    got = {r["doc_id"]: r["status"]
           for r in corpus_diff(_snap(OLD), _snap(NEW),
                                include_unchanged=True).take_all()}
    assert got == {**WANT, 2: "unchanged", 4: "unchanged"}


def test_corpus_diff_layout_invariant(ray_session):
    """Same answer regardless of block layout on either side."""
    got = {r["doc_id"]: r["status"]
           for r in corpus_diff(_snap(OLD, parts=4),
                                _snap(NEW[::-1], parts=3)).take_all()}
    assert got == WANT
