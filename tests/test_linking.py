"""Entity-linking candidates: char-n-gram name Jaccard."""

import numpy as np
import pyarrow as pa
import ray.data

from go_light_rag_ray.stages.linking import _char_grams, name_gram_pairs


def _nodes(names):
    return ray.data.from_arrow(pa.table({
        "kind": ["node"] * len(names),
        "entity_id": names,
    })).repartition(3)


def _reference(names, k=3):
    gsets = {n: set(_char_grams(n, k)) for n in names}
    out = {}
    ns = sorted(names)
    for i, a in enumerate(ns):
        for b in ns[i + 1:]:
            c = len(gsets[a] & gsets[b])
            if c:
                u = len(gsets[a] | gsets[b])
                out[(a, b)] = float(np.float64(c) / np.float64(u))
    return out


def _run(names, **kw):
    rows = name_gram_pairs(_nodes(names), **kw).take_all()
    return {(r["a"], r["b"]): r["jaccard"] for r in rows}


def test_char_grams_rules():
    assert _char_grams("ACME", 3) == ["ACM", "CME"]
    assert _char_grams("AB", 3) == ["AB"]      # short → whole string
    assert _char_grams("", 3) == []
    assert _char_grams("AAAA", 3) == ["AAA"]   # distinct only


def test_name_gram_pairs_hand_computed(ray_session):
    got = _run(["ACME CORP", "ACME CORPORATION", "ZEBRA"], max_group=0)
    # grams(ACME CORP)=7, grams(ACME CORPORATION)=14, common=7 → 7/14
    assert got == {("ACME CORP", "ACME CORPORATION"): 0.5}


def test_name_gram_pairs_matches_reference(ray_session):
    names = ["SPARK", "SPARKS", "SHARK", "CUSTOMER", "CUSTOM",
             "VECTOR", "VICTOR", "AB", "AC", "ABC"]
    got = _run(names, max_group=0)
    assert got == _reference(names)


def test_name_gram_pairs_threshold_and_cap(ray_session):
    names = ["SPARK", "SPARKS", "SHARK"]
    all_pairs = _run(names, max_group=0)
    high = _run(names, max_group=0, threshold=0.5)
    assert high == {k: v for k, v in all_pairs.items() if v >= 0.5}
    # every name shares gram "ARK" → a cap of 2 drops that bucket's pairs
    capped = _run(names, max_group=2)
    assert set(capped) <= set(all_pairs)
