"""Alias resolution (merge_entities): relabel + re-merge determinism."""

import pyarrow as pa
import pytest
import ray.data

from go_light_rag_ray.stages.canonicalize import GRAPH_SCHEMA, merge_entities


def _node(eid, typ, mc, descs, srcs, tally=None):
    names, votes = zip(*tally) if tally else ((), ())
    return {"kind": "node", "entity_id": eid, "entity_type": typ,
            "src": "", "tgt": "", "weight": 0.0,
            "descriptions": list(descs), "keywords": [],
            "source_ids": list(srcs), "mention_count": mc,
            "type_names": list(names), "type_votes": list(votes)}


def _edge(s, t, w, mc, descs, kws, srcs):
    return {"kind": "edge", "entity_id": "", "entity_type": "",
            "src": s, "tgt": t, "weight": w,
            "descriptions": list(descs), "keywords": list(kws),
            "source_ids": list(srcs), "mention_count": mc,
            "type_names": [], "type_votes": []}


def _graph(rows, nblocks=3):
    return ray.data.from_arrow(
        pa.Table.from_pylist(rows, schema=GRAPH_SCHEMA)).repartition(nblocks)


def _pairs(pairs):
    return ray.data.from_arrow(pa.table({
        "a": [a for a, _ in pairs], "b": [b for _, b in pairs],
        "jaccard": [1.0] * len(pairs)}))


BASE = [
    _node("ALPHA", "X", 2, ["a-one", "a-two"], ["s1", "s2"],
          tally=[("X", 2)]),
    _node("BETA", "Y", 1, ["b-one"], ["s3"], tally=[("Y", 1)]),
    _node("GAMMA", "Z", 3, ["g-one"], ["s4"], tally=[("Z", 3)]),
    _node("PH", "UNKNOWN", 0, ["ph-desc"], ["s9"]),
    _edge("ALPHA", "GAMMA", 1.5, 2, ["e-ag"], ["K1"], ["s1"]),
    _edge("BETA", "GAMMA", 0.5, 1, ["e-bg"], ["K2"], ["s3"]),
    _edge("GAMMA", "PH", 1.0, 1, ["e-gp"], ["K3"], ["s4"]),
]


def _by_node(out):
    return {r["entity_id"]: r for r in out if r["kind"] == "node"}


def _by_edge(out):
    return {(r["src"], r["tgt"]): r for r in out if r["kind"] == "edge"}


def test_merge_two_real_nodes(ray_session):
    out = merge_entities(_graph(BASE), _pairs([("ALPHA", "BETA")])).take_all()
    nodes, edges = _by_node(out), _by_edge(out)
    assert set(nodes) == {"ALPHA", "GAMMA", "PH"}
    a = nodes["ALPHA"]
    assert a["mention_count"] == 3
    assert a["entity_type"] == "X"           # 2 X votes beat 1 Y
    # constituent lists concatenate in original-id order (ALPHA < BETA)
    assert a["descriptions"] == ["a-one", "a-two", "b-one"]
    assert a["source_ids"] == ["s1", "s2", "s3"]
    # both edges re-point at ALPHA and fold
    assert set(edges) == {("ALPHA", "GAMMA"), ("GAMMA", "PH")}
    ag = edges[("ALPHA", "GAMMA")]
    assert ag["weight"] == 2.0 and ag["mention_count"] == 3
    assert ag["descriptions"] == ["e-ag", "e-bg"]
    assert ag["keywords"] == ["K1", "K2"]


def test_merge_tie_vote_lexicographic(ray_session):
    rows = [
        _node("A1", "ZTYPE", 1, ["d1"], ["s1"], tally=[("ZTYPE", 1)]),
        _node("A2", "ATYPE", 1, ["d2"], ["s2"], tally=[("ATYPE", 1)]),
    ]
    out = merge_entities(_graph(rows), _pairs([("A1", "A2")])).take_all()
    assert _by_node(out)["A1"]["entity_type"] == "ATYPE"  # tie → lexic. min


def test_merge_placeholder_upgrades_in_place(ray_session):
    out = merge_entities(_graph(BASE), _pairs([("GAMMA", "PH")])).take_all()
    nodes, edges = _by_node(out), _by_edge(out)
    assert set(nodes) == {"ALPHA", "BETA", "GAMMA"}
    g = nodes["GAMMA"]
    # placeholder content drops when a real constituent exists (J3)
    assert g["descriptions"] == ["g-one"]
    assert g["mention_count"] == 3 and g["entity_type"] == "Z"
    # the GAMMA→PH edge becomes a self-loop on GAMMA
    assert ("GAMMA", "GAMMA") in edges


def test_merge_duplicate_text_keeps_min_key(ray_session):
    rows = [
        _node("N1", "X", 1, ["shared", "only1"], ["s"], tally=[("X", 1)]),
        _node("N2", "X", 1, ["only2", "shared"], ["s"], tally=[("X", 1)]),
    ]
    out = merge_entities(_graph(rows), _pairs([("N1", "N2")])).take_all()
    n = _by_node(out)["N1"]
    # entries order by (orig id, position); duplicate 'shared' keeps (N1,0)
    assert n["descriptions"] == ["shared", "only1", "only2"]
    # source 's' dedups across constituents
    assert n["source_ids"] == ["s"]


def test_merge_transitive_component(ray_session):
    out = merge_entities(
        _graph(BASE), _pairs([("BETA", "GAMMA"), ("GAMMA", "PH")])).take_all()
    nodes = _by_node(out)
    # BETA-GAMMA-PH collapse onto BETA (min id)
    assert set(nodes) == {"ALPHA", "BETA"}
    assert nodes["BETA"]["mention_count"] == 4


def test_merge_threshold_and_empty_pairs(ray_session):
    low = ray.data.from_arrow(pa.table({
        "a": ["ALPHA"], "b": ["BETA"], "jaccard": [0.05]}))
    out = merge_entities(_graph(BASE), low, threshold=0.1).take_all()
    assert set(_by_node(out)) == {"ALPHA", "BETA", "GAMMA", "PH"}


@pytest.mark.parametrize("nblocks", [1, 7])
def test_merge_block_layout_invariance(ray_session, nblocks):
    want = sorted(
        merge_entities(_graph(BASE, 3),
                       _pairs([("ALPHA", "BETA")])).take_all(),
        key=lambda r: (r["kind"], r["entity_id"], r["src"], r["tgt"]))
    got = sorted(
        merge_entities(_graph(BASE, nblocks),
                       _pairs([("ALPHA", "BETA")])).take_all(),
        key=lambda r: (r["kind"], r["entity_id"], r["src"], r["tgt"]))
    assert got == want


@pytest.mark.parametrize("strategy", ["sorted", "groupby"])
def test_merge_strategies_agree(ray_session, strategy):
    out = merge_entities(_graph(BASE), _pairs([("ALPHA", "BETA")]),
                         strategy=strategy).take_all()
    a = _by_node(out)["ALPHA"]
    assert a["descriptions"] == ["a-one", "a-two", "b-one"]
