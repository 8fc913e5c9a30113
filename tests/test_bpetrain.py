"""Distributed BPE training (stages/bpetrain.py)."""

import numpy as np
import pyarrow as pa
import ray.data

from go_light_rag_ray.stages.bpetrain import (
    _merge_loop,
    byte_pair_counts,
    train_bpe,
    trained_tokenizer,
)


def _docs(texts):
    return ray.data.from_arrow(pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string()),
    }))


def _brute_merges(word_freq, num_merges):
    """Reference trainer: full recount every round, same tie-break."""
    words = {w: (list(w), f) for w, f in word_freq.items()}
    merges = []
    for _ in range(num_merges):
        counts = {}
        for syms, f in words.values():
            for p in zip(syms, syms[1:]):
                counts[p] = counts.get(p, 0) + f
        if not counts:
            break
        best_n = max(counts.values())
        best = min(p for p, n in counts.items() if n == best_n)
        merges.append(best)
        tok = best[0] + best[1]
        for w, (syms, f) in words.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and (syms[i], syms[i + 1]) == best:
                    out.append(tok)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            words[w] = (out, f)
    return merges


def test_merge_loop_matches_bruteforce():
    wf = {"lowering": 5, "lower": 7, "low": 9, "newest": 6, "widest": 3,
          "new": 4, "nest": 2, "aaaa": 3}
    got = _merge_loop([list(w) for w in wf], np.array(list(wf.values())), 12)
    want = _brute_merges(wf, 12)
    assert got == want
    assert len(got) == 12


def test_merge_loop_overlapping_pair_leftmost_first():
    # "aaaa": pair ('a','a') occurs at 3 positions but only 2 merges apply
    # (leftmost-first, non-overlapping) — the classic BPE edge case
    merges = _merge_loop([list("aaaa")], np.array([1]), 2)
    assert merges[0] == ("a", "a")
    assert merges[1] == ("aa", "aa")


def test_train_bpe_end_to_end_and_roundtrip():
    texts = ["the cat sat on the mat", "the hat is on the cat",
             "that cat and that hat"] * 5
    merges = train_bpe(_docs(texts), num_merges=20)
    # the tiny vocab exhausts its pairs before 20 merges — the loop stops
    assert 8 <= len(merges) <= 20
    # "th"/"at" dominate this corpus — both must be early merges
    assert ("t", "h") in merges[:4]
    assert ("a", "t") in merges[:4]
    tok = trained_tokenizer(merges)
    for w in ["that", "cat", "the"]:
        toks = tok.encode(w)
        assert len(toks) < len(w)          # merges actually compress
        assert tok.decode(toks) == w       # lossless


def test_train_matches_bruteforce_on_corpus():
    texts = ["aa bb aa cc", "aa bb dd", "cc cc bb aa aa"]
    got = train_bpe(_docs(texts), num_merges=3)
    wf = {}
    for t in texts:
        for w in t.split():
            wf[w] = wf.get(w, 0) + 1
    assert got == _brute_merges(wf, 3)


def test_byte_pair_counts_oracle_shape():
    ds = byte_pair_counts(_docs(["abab abc", "bab"]), k=5)
    rows = {r["pair"]: (r["rank"], r["cnt"]) for r in ds.take_all()}
    # pairs: abab → ab,ba,ab ; abc → ab,bc ; bab → ba,ab
    assert rows["ab"] == (1, 4)
    assert rows["ba"] == (2, 2)
    assert rows["bc"] == (3, 1)
    assert len(rows) == 3


def test_byte_pair_counts_single_char_words_ignored():
    rows = byte_pair_counts(_docs(["a b c d", "e"]), k=5).take_all()
    assert rows == []
