"""BM25 lexical retrieval: exact formula hand-case, idf-mode equivalence."""

import math

import numpy as np
import pyarrow as pa
import ray.data

from go_light_rag_ray.stages.bm25 import bm25_topk, doc_term_stats


def _docs(rows):
    return ray.data.from_arrow(pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.string()),
        "text": pa.array([r[1] for r in rows], pa.string()),
    }))


CORPUS = [
    ("d1", "fast merge merge sort"),
    ("d2", "slow scan of the table"),
    ("d3", "merge scan merge scan merge"),
    ("d4", "nothing relevant here at all today"),
    ("d5", ""),
]


def _expected(terms, k1=1.5, b=0.75, lucene=False):
    """Reference implementation straight from the docstring formula."""
    toks = {d: t.split() for d, t in CORPUS}
    n = len(CORPUS)
    sdl = sum(len(v) for v in toks.values())
    out = {}
    for d, tv in toks.items():
        total = 0
        for t in terms:
            df = sum(1 for v in toks.values() if t in v)
            if df == 0:
                continue
            tf = float(tv.count(t))
            dl = float(len(tv))
            idf = (float(n) - float(df) + 0.5) / (float(df) + 0.5)
            if lucene:
                idf = math.log1p(idf)
            contrib = idf * ((tf * 2.5) / (tf + 1.5 * (
                0.25 + (0.75 * (dl * float(n))) / float(sdl))))
            total += int(np.floor(contrib * 1e6 + 0.5))
        if total > 0:
            out[d] = total
    return out


def test_doc_term_stats(ray_session):
    rows = {r["doc_id"]: r
            for r in doc_term_stats(_docs(CORPUS), ["merge", "scan"]).take_all()}
    assert rows["d1"]["dl"] == 4 and rows["d1"]["tf_0"] == 2
    assert rows["d3"]["tf_0"] == 3 and rows["d3"]["tf_1"] == 2
    assert rows["d5"]["dl"] == 0 and rows["d5"]["m_0"] == 0
    assert len(rows) == 5  # zero-token docs still count toward N


def test_bm25_rational_hand_case(ray_session):
    got = bm25_topk(_docs(CORPUS), ["merge", "scan"], k=10,
                    idf="rational").take_all()
    want = _expected(["merge", "scan"])
    assert {r["doc_id"]: r["score_micro"] for r in got} == want
    ranked = sorted(want.items(), key=lambda kv: (-kv[1], kv[0]))
    assert [(r["rank"], r["doc_id"]) for r in sorted(got, key=lambda r: r["rank"])] \
        == [(i + 1, d) for i, (d, _) in enumerate(ranked)]


def test_bm25_lucene_mode_and_topk_cap(ray_session):
    got = bm25_topk(_docs(CORPUS), ["merge"], k=2, idf="lucene").take_all()
    want = _expected(["merge"], lucene=True)
    assert len(got) == 2  # k caps the result
    top2 = sorted(want.items(), key=lambda kv: (-kv[1], kv[0]))[:2]
    assert {r["doc_id"]: r["score_micro"] for r in got} == dict(top2)


def test_bm25_single_term_rank_order_mode_invariant(ray_session):
    """x -> ln(1+x) is monotone, so single-term rankings agree."""
    rat = bm25_topk(_docs(CORPUS), ["scan"], k=10, idf="rational").take_all()
    luc = bm25_topk(_docs(CORPUS), ["scan"], k=10, idf="lucene").take_all()
    order = lambda rows: [r["doc_id"] for r in sorted(rows, key=lambda r: r["rank"])]
    assert order(rat) == order(luc)


def test_hybrid_doc_topk_fuses_leg_ranks(ray_session):
    """Fused score must equal integer RRF over the two legs' own ranks."""
    from go_light_rag_ray.stages.bm25 import hybrid_doc_topk
    from go_light_rag_ray.stages.similarity import ann_topk

    docs = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([0, 1, 2, 3, 4], pa.int64()),
        "text": ["merge merge merge", "merge x", "x y",
                 "merge merge x x", "z"],
    }))
    embs = ray.data.from_arrow(pa.table({
        "vec_id": pa.array([0, 1, 2, 3, 4], pa.int64()),
        "embedding": [[1.0, 0.0], [1.0, 0.0], [1.0, 1.0],
                      [0.0, 1.0], [-1.0, 0.0]],
    }))
    lex = bm25_topk(docs, ["merge"], k=3, idf="rational").take_all()
    vec = ann_topk(embs, n_queries=1, k=3).take_all()
    assert len(lex) == 3 and len(vec) == 3
    want: dict[int, int] = {}
    for r in lex:
        want[r["doc_id"]] = want.get(r["doc_id"], 0) + 10**6 // (60 + r["rank"])
    for r in vec:
        d = r["neighbor_id"]
        want[d] = want.get(d, 0) + 10**6 // (60 + r["rank"])

    got = hybrid_doc_topk(docs, embs, ["merge"], k_leg=3, k=10,
                          idf="rational").take_all()
    assert {r["doc_id"]: r["rrf_score"] for r in got} == want
    order = sorted(want.items(), key=lambda kv: (-kv[1], kv[0]))
    assert [(r["rank"], r["doc_id"]) for r in sorted(got, key=lambda r: r["rank"])] \
        == [(i + 1, d) for i, (d, _) in enumerate(order)]
