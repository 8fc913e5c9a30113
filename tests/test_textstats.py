"""Text analysis: token stats, quality, language ID, fingerprints."""

import hashlib

import pyarrow as pa
import ray.data

from go_light_rag_ray.stages.textstats import (
    fingerprints,
    language_id,
    quality_scores,
    token_stats,
)


def _docs():
    return ray.data.from_arrow(pa.table({
        "doc_id": [0, 1, 2, 3],
        "text": [
            "the quick-brown fox",
            "a a a a",
            "",
            "small slow big big",
        ],
    }))


def test_token_stats():
    rows = {r["doc_id"]: r for r in token_stats(_docs()).take_all()}
    assert rows[0]["n_tokens"] == 3            # whitespace tokens
    assert rows[0]["n_bpe_tokens"] == 5        # the, quick, -, brown, fox
    assert rows[0]["n_chars"] == len("the quick-brown fox")
    assert rows[2]["n_tokens"] == rows[2]["n_bpe_tokens"] == 0


def test_quality_scores():
    rows = {r["doc_id"]: r for r in quality_scores(_docs()).take_all()}
    assert rows[1]["distinct_ratio"] == 0.25
    assert rows[1]["stopword_ratio"] == 1.0    # "a" is a stopword
    assert rows[1]["quality"] == 0.0
    assert rows[0]["distinct_ratio"] == 1.0
    assert rows[0]["stopword_ratio"] == 1 / 3   # "the" of 3 tokens
    assert rows[0]["quality"] == 1.0 * (1 - 1 / 3)
    assert rows[2]["quality"] == 0.0


def test_language_id():
    rows = {r["doc_id"]: r for r in language_id(_docs()).take_all()}
    assert rows[0]["lang_pred"] == "en"        # "the", "a" markers
    assert rows[3]["lang_pred"] == "de"        # small/slow/big markers
    assert rows[3]["lang_score"] == 1.0
    assert rows[2]["lang_pred"] == "de"        # empty → tie → first code
    assert rows[2]["lang_score"] == 0.0


def test_fingerprints():
    rows = {r["doc_id"]: r["fingerprint"]
            for r in fingerprints(_docs(), shingle_k=2).take_all()}
    # doc1 windows: "a a" ×3 → fp = md5("a a")
    assert rows[1] == hashlib.md5(b"a a").hexdigest()
    assert rows[2] == hashlib.md5(b"").hexdigest()
    w = ["the quick-brown", "quick-brown fox"]
    assert rows[0] == min(hashlib.md5(x.encode()).hexdigest() for x in w)


def test_tfidf_top_terms():
    from go_light_rag_ray.stages.textstats import tfidf_top_terms

    docs = ray.data.from_arrow(pa.table({
        "doc_id": [0, 1, 2],
        "text": ["rare common common", "common common", "other common"],
    }))
    rows = tfidf_top_terms(docs, k=2).take_all()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    d0 = sorted(by_doc[0], key=lambda r: r["rank"])
    # "rare": tf=1 df=1 → 1.0 beats "common": tf=2 df=3 → 0.667
    assert (d0[0]["word"], d0[0]["score"]) == ("rare", 1.0)
    assert d0[1]["word"] == "common" and d0[1]["tf"] == 2 and d0[1]["df"] == 3
    d2 = sorted(by_doc[2], key=lambda r: r["rank"])
    assert d2[0]["word"] == "other"        # tf1/df1 beats common tf1/df3
    assert all(len(v) <= 2 for v in by_doc.values())
