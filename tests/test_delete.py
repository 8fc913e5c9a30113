"""Incremental document deletion: the O(affected-keys) delta path must be
row-for-row identical to a full rebuild over the retained corpus."""

import pyarrow as pa
import ray.data

from go_light_rag_ray.corpus import generate_documents
from go_light_rag_ray.pipelines.kg import (
    update_documents,
    Handler,
    chunk_documents,
    delete_documents,
    extract_mentions,
    kg_pipeline,
)

HANDLER = Handler(
    rules="pattern",
    content_mode="spans",
    max_summaries_token_length=0,
    merge_cap=0,
    salt_buckets=4,
    fused=False,
)


def _rows(ds):
    key = lambda r: (r["kind"], r["entity_id"], r["src"], r["tgt"])
    return sorted(ds.take_all(), key=key)


def test_delete_equals_retained_rebuild(ray_session):
    full = generate_documents(60)
    docs = ray.data.from_arrow(full)
    mentions = extract_mentions(chunk_documents(docs, HANDLER), HANDLER)
    prior = kg_pipeline(docs, HANDLER).materialize()

    # delete the LAST 20 docs (the retained prefix keeps occurrence order,
    # so the rebuilt keys replay the full run's merge order exactly)
    del_ids = sorted({r["doc_id"] for r in mentions.take_all()})[-20:]
    got = _rows(delete_documents(prior, mentions, del_ids, HANDLER))

    keep_tbl = full.filter(
        pa.compute.invert(pa.compute.is_in(
            full.column("doc_id"), value_set=pa.array(del_ids))))
    want = _rows(kg_pipeline(ray.data.from_arrow(keep_tbl), HANDLER))

    assert len(got) == len(want)
    for a, b in zip(got, want):
        assert a == b, (a, b)


def test_delete_empty_set_is_identity(ray_session):
    full = generate_documents(10)
    docs = ray.data.from_arrow(full)
    mentions = extract_mentions(chunk_documents(docs, HANDLER), HANDLER)
    prior = kg_pipeline(docs, HANDLER).materialize()
    got = _rows(delete_documents(prior, mentions, [], HANDLER))
    assert got == _rows(prior)


def test_delete_everything_empties_graph(ray_session):
    full = generate_documents(8)
    docs = ray.data.from_arrow(full)
    mentions = extract_mentions(chunk_documents(docs, HANDLER), HANDLER)
    prior = kg_pipeline(docs, HANDLER).materialize()
    all_ids = sorted({r["doc_id"] for r in mentions.take_all()})
    got = delete_documents(prior, mentions, all_ids, HANDLER)
    assert got.count() == 0


def test_delete_middle_slice_equals_rebuild(ray_session):
    """Deletion from the MIDDLE of the corpus: the rebuilt keys replay
    retained mentions by their REAL occ keys, so merge order is
    position-independent (unlike incremental insert's ordered-split
    requirement)."""
    full = generate_documents(50)
    docs = ray.data.from_arrow(full)
    mentions = extract_mentions(chunk_documents(docs, HANDLER), HANDLER)
    prior = kg_pipeline(docs, HANDLER).materialize()
    ids = sorted({r["doc_id"] for r in mentions.take_all()})
    del_ids = ids[15:30]
    got = _rows(delete_documents(prior, mentions, del_ids, HANDLER))
    keep_tbl = full.filter(
        pa.compute.invert(pa.compute.is_in(
            full.column("doc_id"), value_set=pa.array(del_ids))))
    want = _rows(kg_pipeline(ray.data.from_arrow(keep_tbl), HANDLER))
    assert got == want


def test_update_middle_docs_equals_rebuild(ray_session):
    """Replace 10 MIDDLE docs with different content under the same ids:
    update == full rebuild over the spliced corpus, row-for-row — the
    CRUD case incremental insert alone cannot do exactly."""
    full = generate_documents(50)
    docs = ray.data.from_arrow(full)
    mentions = extract_mentions(chunk_documents(docs, HANDLER), HANDLER)
    prior = kg_pipeline(docs, HANDLER).materialize()

    # replacement content: spans borrowed from OTHER synthetic docs,
    # re-labeled with the ids being replaced (20..29)
    donor = generate_documents(70).slice(60, 70)
    old_ids = full.column("doc_id").to_pylist()[20:30]
    new_tbl = pa.table({
        "doc_id": pa.array(old_ids, pa.string()),
        "spans": donor.column("spans"),
    })
    got = _rows(update_documents(
        prior, mentions, ray.data.from_arrow(new_tbl), HANDLER))

    spliced = pa.concat_tables(
        [full.slice(0, 20), new_tbl, full.slice(30)])
    want = _rows(kg_pipeline(ray.data.from_arrow(spliced), HANDLER))
    assert len(got) == len(want)
    for a, b in zip(got, want):
        assert a == b, (a, b)
