"""Retrieval path: keyword extraction, context assembly, ranking, CSV."""

import pyarrow as pa
import pytest
import ray.data

from go_light_rag_ray.pipelines.query import (
    degrees,
    global_edges,
    global_entities,
    keyword_extract,
    local_entities,
    local_relationships,
    local_sources,
    query_context,
    render_csv_section,
    render_query_result,
)
from go_light_rag_ray.stages.canonicalize import GRAPH_SCHEMA


def _node(eid, etype, mentions, sids):
    return {"kind": "node", "entity_id": eid, "entity_type": etype,
            "src": "", "tgt": "", "weight": 0.0, "descriptions": [],
            "keywords": [], "source_ids": sids, "mention_count": mentions}


def _edge(src, tgt, weight, kws, sids):
    return {"kind": "edge", "entity_id": "", "entity_type": "",
            "src": src, "tgt": tgt, "weight": weight, "descriptions": [],
            "keywords": kws, "source_ids": sids, "mention_count": 1}


@pytest.fixture(scope="module")
def graph(ray_session):
    rows = [
        _node("SPARK", "SYSTEM", 5, ["c0", "c1"]),
        _node("CUSTOMER", "ACTOR", 3, ["c1"]),
        _node("VECTOR", "DATA", 2, ["c2"]),
        _node("LONELY", "DATA", 1, ["c3"]),
        _edge("SPARK", "CUSTOMER", 3.0, ["CO_OCCURS"], ["c0"]),
        _edge("SPARK", "VECTOR", 1.5, ["NEAR"], ["c1"]),
        _edge("CUSTOMER", "VECTOR", 2.0, ["CO_OCCURS", "NEAR"], ["c2"]),
    ]
    tbl = pa.Table.from_pylist(rows, schema=GRAPH_SCHEMA)
    return ray.data.from_arrow(tbl)


def test_keyword_extract_rule():
    high, low = keyword_extract("how does spark merge the customer stream")
    assert low == ["SPARK", "CUSTOMER", "STREAM"]  # gazetteer words in order
    assert high == ["MERGE"]                        # rel-vocab-only word


def test_degrees(graph):
    d = {r["entity_id"]: r["degree"] for r in degrees(graph).take_all()}
    assert d == {"SPARK": 2, "CUSTOMER": 2, "VECTOR": 2, "LONELY": 0}


def test_local_entities_ranked(graph):
    rows = local_entities(graph, ["SPARK", "LONELY"]).take_all()
    rows.sort(key=lambda r: r["rank"])
    assert [(r["rank"], r["entity_id"], r["degree"]) for r in rows] == [
        (1, "SPARK", 2), (2, "LONELY", 0)]


def test_local_relationships_ranked(graph):
    rows = local_relationships(graph, ["SPARK"]).take_all()
    rows.sort(key=lambda r: r["rank"])
    assert [(r["src"], r["tgt"]) for r in rows] == [
        ("SPARK", "CUSTOMER"), ("SPARK", "VECTOR")]  # weight 3.0 then 1.5


def test_local_sources_refcount(graph):
    rows = local_sources(graph, ["SPARK", "CUSTOMER"]).take_all()
    rows.sort(key=lambda r: r["rank"])
    # c1 referenced by both SPARK and CUSTOMER → refcount 2, rank 1
    assert (rows[0]["source_id"], rows[0]["ref_count"]) == ("c1", 2)
    assert {r["source_id"] for r in rows} == {"c0", "c1"}


def test_global_edges_and_entities(graph):
    e = global_edges(graph, ["NEAR"]).take_all()
    e.sort(key=lambda r: r["rank"])
    assert [(r["src"], r["tgt"]) for r in e] == [
        ("CUSTOMER", "VECTOR"), ("SPARK", "VECTOR")]  # weight 2.0 then 1.5
    g = global_entities(graph, ["NEAR"]).take_all()
    assert {r["entity_id"] for r in g} == {"SPARK", "CUSTOMER", "VECTOR"}
    ranks = {r["entity_id"]: r["rank"] for r in g}
    assert ranks["CUSTOMER"] < ranks["SPARK"] < ranks["VECTOR"]  # deg tie → id asc


def test_fused_entities_rrf(graph):
    from go_light_rag_ray.pipelines.query import fused_entities

    rows = fused_entities(graph, ["SPARK", "LONELY"], ["NEAR"]).take_all()
    rows.sort(key=lambda r: r["rank"])
    # local ranks: SPARK=1, LONELY=2; global (NEAR, all deg 2, id asc):
    # CUSTOMER=1, SPARK=2, VECTOR=3.  Integer contributions 10^6//(60+r):
    # SPARK both lists = 16393+16129 = 32522; CUSTOMER 16393; LONELY
    # 16129; VECTOR 15873.  Ties impossible here; order by score desc.
    assert [(r["rank"], r["entity_id"], r["rrf_score"]) for r in rows] == [
        (1, "SPARK", 32522), (2, "CUSTOMER", 16393),
        (3, "LONELY", 16129), (4, "VECTOR", 15873)]


def test_query_context_end_to_end(graph):
    ctx = query_context(graph, "spark near the vector table")
    assert set(ctx) == {"local_entities", "local_relationships",
                       "local_sources", "global_edges", "global_entities"}
    text = render_query_result(ctx)
    assert "-----Local Entities-----" in text
    assert '"SPARK"' in text


def test_csv_quoting():
    tbl = pa.table({"name": ['he said "hi"'], "v": [1]})
    out = render_csv_section("T", tbl)
    assert r'"he said \"hi\""' in out
    assert out.splitlines()[0] == "-----T-----"


def test_entity_similarity_over_graph(graph):
    from go_light_rag_ray.pipelines.query import entity_similarity

    # sign_bits=0 → one bucket → exact all-pairs top-k
    rows = entity_similarity(graph, dims=16, k=2, sign_bits=0).take_all()
    by_e = {}
    for r in rows:
        by_e.setdefault(r["entity_id"], []).append(r)
    assert set(by_e) == {"SPARK", "CUSTOMER", "VECTOR", "LONELY"}
    for ent, rs in by_e.items():
        rs.sort(key=lambda r: r["rank"])
        assert [r["rank"] for r in rs] == [1, 2]
        assert all(r["neighbor_id"] != ent for r in rs)
        sims = [r["cos_sim"] for r in rs]
        assert sims == sorted(sims, reverse=True)


def test_entity_similarity_lsh_subset_of_exact(graph):
    """The bucketed (scale) path only ever returns pairs the exact path
    also ranks, with identical cosine values."""
    from go_light_rag_ray.pipelines.query import entity_similarity

    exact = {(r["entity_id"], r["neighbor_id"]): r["cos_sim"]
             for r in entity_similarity(graph, dims=16, k=3,
                                        sign_bits=0).take_all()}
    lsh = entity_similarity(graph, dims=16, k=3, sign_bits=2).take_all()
    for r in lsh:
        key = (r["entity_id"], r["neighbor_id"])
        assert r["neighbor_id"] != r["entity_id"]
        if key in exact:
            assert exact[key] == r["cos_sim"]


def test_extract_query_and_histories():
    from go_light_rag_ray.pipelines.query import extract_query_and_histories

    convs = [
        {"role": "user", "message": "first question"},
        {"role": "assistant", "message": "answer"},
        {"role": "user", "message": "spark near vector?"},
    ]
    q, hist = extract_query_and_histories(convs)
    assert q == "spark near vector?"
    assert len(hist) == 2 and hist[0]["message"] == "first question"
    with pytest.raises(ValueError):
        extract_query_and_histories([{"role": "assistant", "message": "hi"}])


def test_full_query_analog(graph):
    from go_light_rag_ray.pipelines.query import query

    out = query(graph, [
        {"role": "assistant", "message": "hello"},
        {"role": "user", "message": "how does spark relate near the vector"},
    ])
    assert "-----Local Entities-----" in out
    assert "-----Global Edges-----" in out
    assert '"SPARK"' in out
