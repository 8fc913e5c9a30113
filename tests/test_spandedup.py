"""Duplicate-span (exact substring) dedup: positional k-grams, duplicated
occurrences, per-doc interval union — cross-checked against a brute-force
Python reference on hand-built corpora."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from go_light_rag_ray.stages.spandedup import (
    duplicate_gram_hits,
    duplicate_spans,
    positional_kgrams,
)


def _docs(texts):
    return ray.data.from_arrow(
        pa.table({"doc_id": [f"d{i:03d}" for i in range(len(texts))],
                  "text": texts})
    )


def _brute_spans(texts, k):
    """Reference: count every positional k-gram, mark occurrences of grams
    with total count ≥2, union [pos, pos+k-1] intervals per doc."""
    from collections import Counter

    grams = []  # (doc_idx, pos, gram)
    for d, t in enumerate(texts):
        toks = t.split()
        for i in range(len(toks) - k + 1):
            grams.append((d, i, " ".join(toks[i : i + k])))
    counts = Counter(g for _, _, g in grams)
    covered: dict[int, set[int]] = {}
    for d, i, g in grams:
        if counts[g] >= 2:
            covered.setdefault(d, set()).update(range(i, i + k))
    spans = []
    for d, pos_set in covered.items():
        pos = sorted(pos_set)
        start = prev = pos[0]
        for p in pos[1:]:
            if p == prev + 1:
                prev = p
            else:
                spans.append((f"d{d:03d}", start, prev, prev - start + 1))
                start = prev = p
        spans.append((f"d{d:03d}", start, prev, prev - start + 1))
    return sorted(spans)


def _ray_spans(texts, k):
    rows = duplicate_spans(_docs(texts), k=k).take_all()
    return sorted(
        (r["doc_id"], r["span_start"], r["span_end"], r["span_len"])
        for r in rows
    )


def test_kgram_counts_and_positions():
    texts = ["a b c d e", "x y"]
    rows = positional_kgrams(_docs(texts), k=3).take_all()
    # doc0: 3 grams at pos 0..2; doc1 too short → nothing
    assert sorted((r["doc_id"], r["pos"]) for r in rows) == [
        ("d000", 0), ("d000", 1), ("d000", 2)
    ]


def test_cross_doc_duplicate_span():
    shared = "one two three four five six seven eight"
    texts = [f"{shared} tail alpha beta", f"head {shared} gamma", "unrelated words only here"]
    assert _ray_spans(texts, k=8) == _brute_spans(texts, k=8)
    # the shared 8 tokens are covered in both docs
    spans = dict(
        (d, (s, e)) for d, s, e, _ in _ray_spans(texts, k=8)
    )
    assert spans["d000"] == (0, 7)
    assert spans["d001"] == (1, 8)


def test_within_doc_repeat_counts_as_duplicate():
    block = "p q r s t u v w"
    texts = [f"{block} filler words go here {block}"]
    got = _ray_spans(texts, k=8)
    assert got == _brute_spans(texts, k=8)
    assert len(got) == 2  # two separate islands


def test_adjacent_intervals_merge():
    # overlapping duplicated grams merge into ONE maximal span
    shared = "a b c d e f g h i j"  # 10 tokens → 3 duplicated 8-grams
    texts = [shared, f"prefix {shared} suffix"]
    got = _ray_spans(texts, k=8)
    assert got == _brute_spans(texts, k=8)
    by_doc = {d: (s, e, l) for d, s, e, l in got}
    assert by_doc["d000"] == (0, 9, 10)
    assert by_doc["d001"] == (1, 10, 10)


def test_no_duplicates_returns_empty():
    texts = ["alpha beta gamma delta epsilon zeta eta theta",
             "uno dos tres cuatro cinco seis siete ocho"]
    assert duplicate_gram_hits(_docs(texts), k=8).count() == 0


@pytest.mark.parametrize("k", [2, 3, 5])
def test_randomized_equals_brute(k):
    rng = np.random.RandomState(7)
    vocab = [f"w{i}" for i in range(12)]  # small vocab → many repeats
    texts = [
        " ".join(rng.choice(vocab, size=rng.randint(0, 30)))
        for _ in range(25)
    ]
    assert _ray_spans(texts, k) == _brute_spans(texts, k)


# ---------------------------------------------------------------------------
# winnowing fingerprints (MOSS)
# ---------------------------------------------------------------------------

def _brute_winnow(texts, k, w):
    """Reference: per doc, hash every k-gram (md5 hex), slide a window of w
    hashes, select the min with rightmost tie-break, dedupe selections."""
    import hashlib

    out = set()
    for d, t in enumerate(texts):
        toks = t.split()
        hs = [hashlib.md5(" ".join(toks[i:i + k]).encode()).hexdigest()
              for i in range(len(toks) - k + 1)]
        for s in range(len(hs) - w + 1):
            win = hs[s:s + w]
            m = min(win)
            # rightmost index attaining the min
            j = max(i for i, h in enumerate(win) if h == m)
            out.add((f"d{d:03d}", s + j, m))
    return out


def _run_winnow(texts, k=4, w=4):
    from go_light_rag_ray.stages.spandedup import winnow_fingerprints

    rows = winnow_fingerprints(_docs(texts), k=k, w=w).take_all()
    return {(r["doc_id"], r["pos"], r["gh"]) for r in rows}


def test_winnow_matches_brute(ray_session):
    rng = np.random.RandomState(5)
    vocab = ["a", "b", "c", "d", "e", "f"]
    texts = [" ".join(vocab[rng.randint(6)] for _ in range(rng.randint(2, 40)))
             for _ in range(30)]
    assert _run_winnow(texts) == _brute_winnow(texts, 4, 4)


def test_winnow_guarantee_shared_substring(ray_session):
    # winnowing guarantee: a shared run of >= k+w-1 tokens yields at least
    # one common fingerprint HASH in both docs
    shared = "p q r s t u v"  # 7 tokens = k+w-1 for k=4, w=4
    texts = ["x y z " + shared + " m n", shared + " j k l o"]
    fps = _run_winnow(texts)
    h0 = {h for d, _, h in fps if d == "d000"}
    h1 = {h for d, _, h in fps if d == "d001"}
    assert h0 & h1


def test_winnow_short_docs_emit_nothing(ray_session):
    # fewer than k+w-1 tokens -> no full window -> no fingerprints
    assert _run_winnow(["a b c d e f", "a b", ""]) == set()


def test_winnow_density(ray_session):
    # expected selection rate ~2/(w+1) of grams; loose sanity bounds
    rng = np.random.RandomState(9)
    vocab = [f"w{i}" for i in range(50)]
    text = " ".join(vocab[rng.randint(50)] for _ in range(2000))
    fps = _run_winnow([text], k=4, w=8)
    n_grams = 2000 - 4 + 1
    assert 0.1 * n_grams < len(fps) < 0.4 * n_grams
