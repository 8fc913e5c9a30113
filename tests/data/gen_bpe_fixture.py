"""Deterministic generator for the vendored BPE vocabulary fixture.

This sandbox has no network, so the repo cannot vendor OpenAI's published
GPT-2 vocabulary files.  Instead this script TRAINS a genuine byte-level BPE
(the public Sennrich et al. 2016 algorithm, with the GPT-2
``bytes_to_unicode`` alphabet and the engine's pre-tokenization pattern) on
a fixed English corpus and writes real GPT-2-FORMAT files::

    tests/data/bpe_fixture/vocab.json    token string -> id
    tests/data/bpe_fixture/merges.txt    "#version" header + rank-ordered pairs

The output is committed; re-running this script reproduces it byte-for-byte
(fixed corpus, deterministic tie-breaks, no randomness).  The goldens in
``test_bpe_golden.py`` replay the reference's chunker token-identity suite
(handler/default_test.go:12-227) through these files.
"""

from __future__ import annotations

import json
import os
from collections import Counter

import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

from go_light_rag_ray.bpe import BPETokenizer, gpt2_byte_map  # noqa: E402

N_MERGES = 400

# Fixed training corpus: the reference test sentences plus deterministic
# plain-English filler so common bigrams/trigrams earn real merges.
CORPUS = (
    "This is a small text that should fit in a single chunk. "
    + "This sentence contains about nine tokens. " * 50
    + "Short text. " * 30
    + " ".join(
        f"The quick brown fox jumps over the lazy dog number {i}." for i in range(40)
    )
    + " "
    + "the and of to in that it is was he for on are as with his they at be this "
    "have from or had by hot word but what some we can out other were all there "
    "when up use your how said an each she which do their time if will way about "
    "many then them write would like so these her long make thing see him two has "
    "look more day could go come did number sound no most people my over know "
    "water than call first who may down side been now find " * 20
)


def pieces_of(text: str) -> list[str]:
    tok = BPETokenizer({}, [], special_tokens={}, byte_map="gpt2")
    return tok._pieces(text, fill_gaps=True)


def train(corpus: str, n_merges: int):
    b2u = gpt2_byte_map()
    piece_freq = Counter(pieces_of(corpus))
    words: dict[tuple[str, ...], int] = {
        tuple(b2u[b] for b in piece.encode("utf-8")): f
        for piece, f in piece_freq.items()
    }
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pair_freq: Counter = Counter()
        for word, f in words.items():
            for a, b in zip(word, word[1:]):
                pair_freq[(a, b)] += f
        if not pair_freq:
            break
        # most frequent pair; ties break lexicographically (deterministic)
        best = max(pair_freq.items(), key=lambda kv: (kv[1], kv[0]))
        (left, right), freq = best
        if freq < 2:
            break
        merges.append((left, right))
        fused = left + right
        new_words: dict[tuple[str, ...], int] = {}
        for word, f in words.items():
            out, i = [], 0
            while i < len(word):
                if i < len(word) - 1 and word[i] == left and word[i + 1] == right:
                    out.append(fused)
                    i += 2
                else:
                    out.append(word[i])
                    i += 1
            key = tuple(out)
            new_words[key] = new_words.get(key, 0) + f
        words = new_words
    # vocab: the 256 byte symbols in byte order, then merge outputs in rank
    # order (the GPT-2 file layout convention)
    vocab: dict[str, int] = {}
    for b in range(256):
        vocab[b2u[b]] = len(vocab)
    for left, right in merges:
        tok = left + right
        if tok not in vocab:
            vocab[tok] = len(vocab)
    return vocab, merges


def main() -> None:
    out_dir = os.path.join(os.path.dirname(__file__), "bpe_fixture")
    os.makedirs(out_dir, exist_ok=True)
    vocab, merges = train(CORPUS, N_MERGES)
    with open(os.path.join(out_dir, "vocab.json"), "w", encoding="utf-8") as f:
        json.dump(vocab, f, ensure_ascii=False, indent=0, sort_keys=False)
    with open(os.path.join(out_dir, "merges.txt"), "w", encoding="utf-8") as f:
        f.write("#version: 0.2\n")
        for left, right in merges:
            f.write(f"{left} {right}\n")
    print(f"wrote {len(vocab)} vocab entries, {len(merges)} merges to {out_dir}")


if __name__ == "__main__":
    main()
