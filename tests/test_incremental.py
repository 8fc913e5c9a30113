"""Incremental insert: prior-snapshot merge equals the one-shot run."""

import pyarrow as pa
import pytest
import ray.data

from go_light_rag_ray.corpus import generate_documents
from go_light_rag_ray.pipelines.kg import (
    Handler,
    kg_pipeline,
    kg_pipeline_incremental,
)
from go_light_rag_ray.stages.canonicalize import GRAPH_SCHEMA, graph_to_partials

# corpus.generate_documents emits the interleaved spans shape with
# zero-padded string doc ids (occurrence order == id order)
HANDLER = Handler(
    rules="pattern",
    content_mode="spans",
    max_summaries_token_length=0,   # summaries off: compare raw lists
    merge_cap=0,
    salt_buckets=4,
)

FLAT_HANDLER = Handler(
    tokenizer="whitespace",
    rules="word_cooccurrence",
    content_mode="text",
    doc_id_format="doc-{:09d}",
    max_summaries_token_length=0,
    merge_cap=0,
    salt_buckets=4,
)


def _rows(ds):
    rows = ds.take_all()
    key = lambda r: (r["kind"], r["entity_id"], r["src"], r["tgt"])
    return sorted(rows, key=key)


def test_incremental_equals_one_shot(ray_session):
    # ordered split: part1 = lower doc ids, so prior-first merge order
    # matches the full run's occurrence order exactly
    full = generate_documents(60)
    part1, part2 = full.slice(0, 40), full.slice(40)

    one_shot = _rows(kg_pipeline(ray.data.from_arrow(full), HANDLER))
    prior = kg_pipeline(ray.data.from_arrow(part1), HANDLER).materialize()
    merged = _rows(
        kg_pipeline_incremental(ray.data.from_arrow(part2), prior, HANDLER)
    )

    assert len(one_shot) == len(merged)
    for a, b in zip(one_shot, merged):
        assert a == b, (a, b)


def test_placeholder_upgrades_in_place(ray_session):
    prior = pa.Table.from_pylist(
        [{"kind": "node", "entity_id": "SPARK", "entity_type": "UNKNOWN",
          "src": "", "tgt": "", "weight": 0.0,
          "descriptions": ["edge-derived desc"], "keywords": [],
          "source_ids": ["c0"], "mention_count": 0}],
        schema=GRAPH_SCHEMA,
    )
    docs = pa.table({"doc_id": [7], "text": ["spark spark"]})
    merged = kg_pipeline_incremental(
        ray.data.from_arrow(docs), ray.data.from_arrow(prior), FLAT_HANDLER
    ).take_all()
    node = next(r for r in merged if r["kind"] == "node"
                and r["entity_id"] == "SPARK")
    # real mentions arrived → placeholder upgraded: typed, real descriptions
    assert node["entity_type"] == "SYSTEM"
    assert node["mention_count"] == 2
    assert all("edge-derived" not in d for d in node["descriptions"])


def test_prior_content_keeps_first_position(ray_session):
    prior = pa.Table.from_pylist(
        [{"kind": "edge", "entity_id": "", "entity_type": "",
          "src": "SPARK", "tgt": "CUSTOMER", "weight": 2.5,
          "descriptions": ["old desc"], "keywords": ["OLD_KW"],
          "source_ids": ["old-chunk"], "mention_count": 3}],
        schema=GRAPH_SCHEMA,
    )
    docs = pa.table({"doc_id": [1], "text": ["spark customer"]})
    merged = kg_pipeline_incremental(
        ray.data.from_arrow(docs), ray.data.from_arrow(prior), FLAT_HANDLER
    ).take_all()
    edge = next(r for r in merged if r["kind"] == "edge")
    assert edge["descriptions"][0] == "old desc"        # stored-first order
    assert edge["keywords"][0] == "OLD_KW"
    assert edge["source_ids"][0] == "old-chunk"
    assert edge["weight"] == pytest.approx(2.5 + 1.0)   # additive
    assert edge["mention_count"] == 4


def test_graph_to_partials_roundtrip_salt_deterministic():
    tbl = pa.Table.from_pylist(
        [{"kind": "node", "entity_id": "X", "entity_type": "DATA",
          "src": "", "tgt": "", "weight": 0.0, "descriptions": ["d"],
          "keywords": [], "source_ids": ["c"], "mention_count": 2}],
        schema=GRAPH_SCHEMA,
    )
    p1 = graph_to_partials(tbl, salt_buckets=8)
    p2 = graph_to_partials(tbl, salt_buckets=8)
    assert p1.equals(p2)
    assert p1.column("salt")[0].as_py() == p2.column("salt")[0].as_py()


def test_mixed_type_vote_reenters_exactly(ray_session):
    """An entity whose mentions carry mixed types must elect the SAME type
    in incremental(graph(p1), p2) as in graph(p1 ∪ p2) — requires the
    snapshot to persist the full vote tally, not just the winner."""
    from go_light_rag_ray.stages.canonicalize import (
        canonicalize,
        canonicalize_incremental,
    )
    from tests.test_canonicalize import _mentions, ent

    # part1: ALPHA×2 + BETA×1 (winner ALPHA, mc=3)
    # part2: BETA×3 → full tally ALPHA=2, BETA=4 → BETA must win.
    # winner×mc re-entry would give ALPHA=3 vs BETA=3 → tie → ALPHA (wrong).
    p1 = _mentions([
        ent("d1", "c1", 0, 0, "X", "ALPHA", "a0"),
        ent("d1", "c1", 0, 1, "X", "ALPHA", "a1"),
        ent("d1", "c1", 0, 2, "X", "BETA", "b0"),
    ])
    p2 = _mentions([
        ent("d2", "c2", 0, 0, "X", "BETA", "b1"),
        ent("d2", "c2", 0, 1, "X", "BETA", "b2"),
        ent("d2", "c2", 0, 2, "X", "BETA", "b3"),
    ])
    full = canonicalize(
        ray.data.from_arrow(pa.concat_tables([p1, p2]))).take_all()
    prior = canonicalize(ray.data.from_arrow(p1)).materialize()
    inc = canonicalize_incremental(ray.data.from_arrow(p2), prior).take_all()

    t_full = next(r["entity_type"] for r in full if r["entity_id"] == "X")
    t_inc = next(r["entity_type"] for r in inc if r["entity_id"] == "X")
    assert t_full == "BETA"
    assert t_inc == t_full


def test_legacy_snapshot_without_tally_columns(ray_session):
    """Pre-tally snapshots (no type_names/type_votes) re-enter the vote as
    winner × max(1, mention_count) — the graph_to_partials legacy branch."""
    full = generate_documents(60)
    part1, part2 = full.slice(0, 40), full.slice(40)
    prior = kg_pipeline(ray.data.from_arrow(part1), HANDLER).materialize()
    # simulate a legacy snapshot: strip the tally columns entirely
    legacy_tbl = pa.Table.from_pylist(
        [{k: v for k, v in r.items()
          if k not in ("type_names", "type_votes")}
         for r in prior.take_all()])
    legacy = ray.data.from_arrow(legacy_tbl)

    with_tally = _rows(kg_pipeline_incremental(
        ray.data.from_arrow(part2), prior, HANDLER))
    from_legacy = _rows(kg_pipeline_incremental(
        ray.data.from_arrow(part2), legacy, HANDLER))

    assert len(with_tally) == len(from_legacy)
    for a, b in zip(with_tally, from_legacy):
        # legacy rows lose the minority votes, so the tally columns and
        # (for mixed-type entities) the elected type may differ; everything
        # accumulated (lists, weights, counts) must be identical
        for col in ("kind", "entity_id", "src", "tgt", "weight",
                    "descriptions", "keywords", "source_ids",
                    "mention_count"):
            assert a[col] == b[col], (col, a, b)


def test_legacy_mixed_with_tally_rows(ray_session):
    """A snapshot where only SOME rows are legacy (empty tally lists)
    exercises the per-row if_else fallback."""
    full = generate_documents(45)
    p1, p2 = full.slice(0, 30), full.slice(30)
    prior_rows = kg_pipeline(ray.data.from_arrow(p1), HANDLER).take_all()
    for i, r in enumerate(prior_rows):
        if i % 2 == 0 and r["kind"] == "node":
            r["type_names"], r["type_votes"] = [], []
    mixed = ray.data.from_arrow(
        pa.Table.from_pylist(prior_rows).cast(GRAPH_SCHEMA))
    out = _rows(kg_pipeline_incremental(
        ray.data.from_arrow(p2), mixed, HANDLER))
    assert out  # merge runs end-to-end; every node elects a type
    assert all(r["entity_type"] for r in out if r["kind"] == "node")


def test_insert_middle_of_corpus_equals_full_rebuild(ray_session):
    """insert_documents rebuilds only affected keys but replays REAL occ
    keys, so a mid-corpus insert is row-for-row equal to the full rebuild
    — the case kg_pipeline_incremental cannot handle (its prior re-entry
    sorts before all new occurrences)."""
    from go_light_rag_ray.pipelines.kg import (
        chunk_documents,
        extract_mentions,
        insert_documents,
    )

    full = generate_documents(60)
    ids = full.column("doc_id").to_pylist()
    middle = pa.compute.is_in(
        full.column("doc_id"), value_set=pa.array(ids[20:30]))
    hole_tbl = full.filter(pa.compute.invert(middle))
    new_tbl = full.filter(middle)

    hole = ray.data.from_arrow(hole_tbl)
    mentions = extract_mentions(
        chunk_documents(hole, HANDLER), HANDLER).materialize()
    prior = kg_pipeline(hole, HANDLER).materialize()

    got = _rows(insert_documents(
        prior, mentions, ray.data.from_arrow(new_tbl), HANDLER))
    want = _rows(kg_pipeline(ray.data.from_arrow(full), HANDLER))
    assert len(got) == len(want)
    for a, b in zip(got, want):
        assert a == b, (a, b)


def test_insert_tail_matches_incremental(ray_session):
    """On an ordered (tail) split both insert paths agree with the one-shot."""
    from go_light_rag_ray.pipelines.kg import (
        chunk_documents,
        extract_mentions,
        insert_documents,
    )

    full = generate_documents(40)
    p1, p2 = full.slice(0, 30), full.slice(30)
    d1 = ray.data.from_arrow(p1)
    mentions = extract_mentions(
        chunk_documents(d1, HANDLER), HANDLER).materialize()
    prior = kg_pipeline(d1, HANDLER).materialize()

    via_rebuild = _rows(insert_documents(
        prior, mentions, ray.data.from_arrow(p2), HANDLER))
    via_reentry = _rows(kg_pipeline_incremental(
        ray.data.from_arrow(p2), prior, HANDLER))
    want = _rows(kg_pipeline(ray.data.from_arrow(full), HANDLER))
    assert via_rebuild == want
    assert via_reentry == want
