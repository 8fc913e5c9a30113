"""Canonicalization merge semantics (reference insert.go:499-690, FIXTURES F4/F6)."""

import pyarrow as pa
import pytest
import ray.data

from go_light_rag_ray.stages.canonicalize import (
    GRAPH_SCHEMA,
    canonicalize,
    combine_mentions,
    sep_join,
)
from go_light_rag_ray.stages.extractor import MENTIONS_SCHEMA


def _mentions(rows):
    cols = {name: [] for name in MENTIONS_SCHEMA.names}
    for r in rows:
        for name in MENTIONS_SCHEMA.names:
            cols[name].append(r.get(name, "" if MENTIONS_SCHEMA.field(name).type == pa.string() else 0))
    # fix non-string defaults
    for i, r in enumerate(rows):
        cols["keywords"][i] = r.get("keywords", [])
        cols["weight"][i] = r.get("weight", 0.0)
    return pa.Table.from_pydict(cols, schema=MENTIONS_SCHEMA)


def ent(doc, chunk, oi, mi, name, typ, desc):
    return dict(doc_id=doc, chunk_id=chunk, order_index=oi, mention_index=mi,
                kind="entity", name=name, type=typ, description=desc)


def rel(doc, chunk, oi, mi, src, tgt, desc, kws, w):
    return dict(doc_id=doc, chunk_id=chunk, order_index=oi, mention_index=mi,
                kind="relationship", src=src, tgt=tgt, description=desc,
                keywords=kws, weight=w)


# The canonical mock payload from reference insert_test.go:28-54 (FIXTURES F4):
# two entities + one relationship per chunk.
F4 = [
    ent("doc1", "doc1-chunk-0", 0, 0, "ENTITY1", "PERSON", "This is a description of Entity1"),
    ent("doc1", "doc1-chunk-0", 0, 1, "ENTITY2", "ORGANIZATION", "This is a description of Entity2"),
    rel("doc1", "doc1-chunk-0", 0, 2, "ENTITY1", "ENTITY2", "Entity1 is related to Entity2",
        ["RELATED_TO", "RELATED", "TO"], 1.0),
]


def _run(rows, salt_buckets=8):
    ds = ray.data.from_arrow(_mentions(rows))
    out = canonicalize(ds, salt_buckets=salt_buckets).take_all()
    nodes = sorted((r for r in out if r["kind"] == "node"), key=lambda r: r["entity_id"])
    edges = sorted((r for r in out if r["kind"] == "edge"), key=lambda r: (r["src"], r["tgt"]))
    return nodes, edges


def test_f4_mock_merge_goldens():
    # expected post-merge goldens per insert_test.go:109-179
    nodes, edges = _run(F4)
    assert [n["entity_id"] for n in nodes] == ["ENTITY1", "ENTITY2"]
    assert nodes[0]["entity_type"] == "PERSON"
    assert nodes[1]["entity_type"] == "ORGANIZATION"
    assert nodes[0]["source_ids"] == ["doc1-chunk-0"]
    assert len(edges) == 1
    e = edges[0]
    assert (e["src"], e["tgt"]) == ("ENTITY1", "ENTITY2")
    assert e["weight"] == 1.0
    assert e["keywords"] == ["RELATED_TO", "RELATED", "TO"]
    assert sep_join(e["source_ids"]) == "doc1-chunk-0"


def test_additive_weight_and_source_union_across_chunks():
    rows = F4 + [
        rel("doc2", "doc2-chunk-0", 0, 0, "ENTITY1", "ENTITY2", "Another relation desc",
            ["RELATED_TO", "NEW_KW"], 2.5),
        ent("doc2", "doc2-chunk-0", 0, 1, "ENTITY1", "UNKNOWN", "Second description of Entity1"),
    ]
    nodes, edges = _run(rows)
    e = edges[0]
    assert e["weight"] == 3.5  # additive (insert.go:595,609-615)
    # ordered-distinct keywords by first occurrence
    assert e["keywords"] == ["RELATED_TO", "RELATED", "TO", "NEW_KW"]
    assert e["source_ids"] == ["doc1-chunk-0", "doc2-chunk-0"]
    assert e["descriptions"] == ["Entity1 is related to Entity2", "Another relation desc"]
    n1 = nodes[0]
    # mode type: PERSON(1) vs UNKNOWN(1) → lexicographic tie-break → PERSON
    assert n1["entity_type"] == "PERSON"
    assert n1["descriptions"] == [
        "This is a description of Entity1", "Second description of Entity1"
    ]


def test_description_dedup_append_if_unique():
    rows = [
        ent("doc1", "c0", 0, 0, "E", "PERSON", "same desc"),
        ent("doc1", "c1", 1, 0, "E", "PERSON", "same desc"),
        ent("doc2", "c2", 0, 0, "E", "PERSON", "other desc"),
    ]
    nodes, _ = _run(rows)
    assert nodes[0]["descriptions"] == ["same desc", "other desc"]
    assert nodes[0]["source_ids"] == ["c0", "c1", "c2"]
    assert nodes[0]["mention_count"] == 3


def test_placeholder_node_for_dangling_endpoint():
    rows = [
        rel("doc1", "c0", 0, 0, "KNOWN", "GHOST", "relates", ["R"], 1.0),
        ent("doc1", "c0", 0, 1, "KNOWN", "PERSON", "desc known"),
    ]
    nodes, edges = _run(rows)
    ghost = [n for n in nodes if n["entity_id"] == "GHOST"][0]
    assert ghost["entity_type"] == "UNKNOWN"  # insert.go:634-641
    assert ghost["descriptions"] == ["relates"]
    assert ghost["source_ids"] == ["c0"]
    assert ghost["mention_count"] == 0
    known = [n for n in nodes if n["entity_id"] == "KNOWN"][0]
    assert known["entity_type"] == "PERSON"
    assert known["descriptions"] == ["desc known"]


def test_mode_type_prefers_most_frequent():
    rows = [
        ent("d", "c0", 0, 0, "E", "ZULU", "a"),
        ent("d", "c0", 0, 1, "E", "ALPHA", "b"),
        ent("d", "c0", 0, 2, "E", "ZULU", "c"),
    ]
    nodes, _ = _run(rows)
    assert nodes[0]["entity_type"] == "ZULU"


@pytest.mark.parametrize("salts", [1, 8, 64])
def test_salt_invariance(salts):
    # F6: identical output at salt counts 1, 8, 64
    base_nodes, base_edges = _run(F4 + [
        rel("doc2", "c", 0, 0, "ENTITY1", "ENTITY2", "d2", ["K"], 1.0)
    ], salt_buckets=8)
    nodes, edges = _run(F4 + [
        rel("doc2", "c", 0, 0, "ENTITY1", "ENTITY2", "d2", ["K"], 1.0)
    ], salt_buckets=salts)
    assert nodes == base_nodes
    assert edges == base_edges


def test_combine_is_partial_aggregation():
    t = combine_mentions(_mentions(F4), salt_buckets=4)
    # distinct keys: 2 entity/endpoint nodes + 1 edge; the vectorized
    # combiner emits ≤3 contribution rows per key (entity-side,
    # placeholder-side, keyword-side) that the merge stages fold together
    keys = list(zip(t.column("kind").to_pylist(), t.column("k1").to_pylist(),
                    t.column("k2").to_pylist()))
    assert set(k[0] for k in keys) == {"node", "edge"}
    assert len(set(keys)) == 3
    from collections import Counter

    assert max(Counter(keys).values()) <= 3


def _skewed_rows():
    """Hot-key fixture: one entity dominating (straddles salt buckets and
    sorted-block boundaries), plus a tail of singleton keys."""
    rows = []
    mi = 0
    for d in range(12):
        doc = f"doc{d:03d}"
        for j in range(10):
            rows.append(ent(doc, f"{doc}-c{j // 4}", j, mi, "HOT",
                            ["PERSON", "ORGANIZATION"][j % 2],
                            f"hot desc {d}-{j}"))
            mi += 1
        rows.append(ent(doc, f"{doc}-c9", 20, mi, f"COLD{d}", "THING",
                        f"cold desc {d}"))
        mi += 1
        rows.append(rel(doc, f"{doc}-c9", 21, mi, "HOT", f"COLD{d}",
                        f"edge desc {d}", [f"kw{d % 3}", "shared"],
                        0.5 if d % 2 else 1.0))
        mi += 1
        rows.append(rel(doc, f"{doc}-c9", 22, mi, "HOT", "GHOST",
                        f"ghost desc {d}", [], 1.0))
        mi += 1
    return rows


@pytest.mark.parametrize("salts,cap", [(1, 0), (8, 0), (8, 3), (64, 2)])
def test_sorted_strategy_equals_groupby(salts, cap):
    """The sorted segment-merge path (default) is row-for-row identical to
    the legacy two-shuffle groupby path, including under skew + merge_cap."""
    tbl = _mentions(_skewed_rows())

    def run(strategy):
        out = canonicalize(ray.data.from_arrow(tbl), salt_buckets=salts,
                           merge_cap=cap, strategy=strategy).take_all()
        return sorted(out, key=lambda r: (r["kind"], r["entity_id"],
                                          r["src"], r["tgt"]))

    assert run("sorted") == run("groupby")


def test_sorted_strategy_equals_groupby_incremental():
    from go_light_rag_ray.stages.canonicalize import canonicalize_incremental

    rows = _skewed_rows()
    split = len(rows) // 2
    p1, p2 = _mentions(rows[:split]), _mentions(rows[split:])

    def run(strategy):
        prior = canonicalize(ray.data.from_arrow(p1),
                             strategy=strategy).materialize()
        out = canonicalize_incremental(ray.data.from_arrow(p2), prior,
                                       strategy=strategy).take_all()
        return sorted(out, key=lambda r: (r["kind"], r["entity_id"],
                                          r["src"], r["tgt"]))

    assert run("sorted") == run("groupby")
