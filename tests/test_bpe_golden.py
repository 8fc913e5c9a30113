"""Chunker token-identity goldens on the VENDORED BPE vocabulary.

Replays the reference's Default-handler chunker suite
(/root/reference/handler/default_test.go:12-227) through
``Handler(tokenizer="bpe:...")`` with the committed GPT-2-format fixture
(tests/data/bpe_fixture — a genuine byte-level BPE trained deterministically
by gen_bpe_fixture.py; this sandbox has no network to vendor OpenAI's
published files).  The invariants under test are the reference's:

- TokenSize == CountTokens(content) for every emitted chunk
  (default_test.go:112-131 verifyTokenCounts);
- sequential OrderIndexes (default_test.go:148-155);
- the last 20 chars of chunk i appear in chunk i+1
  (default_test.go:174-187 verifyChunkOverlap);
- empty input -> 0 chunks, small input -> 1 identical chunk, custom
  max/overlap respected, unicode preserved (the five scenario cases).
"""

import math
import os

import pytest

from go_light_rag_ray.stages.chunker import chunk_text, clean_content
from go_light_rag_ray.tokenizer import get_tokenizer

_DIR = os.path.join(os.path.dirname(__file__), "data", "bpe_fixture")
BPE_SPEC = (f"bpe:{os.path.join(_DIR, 'vocab.json')}:"
            f"{os.path.join(_DIR, 'merges.txt')}:gpt2")


@pytest.fixture(scope="module")
def bpe():
    return get_tokenizer(BPE_SPEC)


def _verify_token_counts(chunks, tok):
    """default_test.go verifyTokenCounts: reported TokenSize must equal an
    independent re-count of the chunk's content."""
    for content, token_size, _ in chunks:
        if content:
            assert token_size > 0
        assert token_size == tok.count(content)


def _verify_order(chunks):
    assert [idx for _, _, idx in chunks] == list(range(len(chunks)))


def _verify_overlap(chunks):
    """default_test.go verifyChunkOverlap: the tail of each chunk recurs in
    the next chunk (token overlap -> textual containment)."""
    for (c1, _, _), (c2, _, _) in zip(chunks, chunks[1:]):
        assert c1[-20:] in c2


def test_empty_content_zero_chunks(bpe):
    assert chunk_text("", bpe) == []


def test_small_content_single_chunk(bpe):
    text = "This is a small text that should fit in a single chunk."
    chunks = chunk_text(text, bpe)
    assert len(chunks) == 1
    content, token_size, order = chunks[0]
    assert order == 0
    assert content == text
    assert token_size == bpe.count(text)


def test_multi_chunk_span_identity_and_overlap(bpe):
    text = ("This sentence contains about nine tokens. " * 300).strip()
    chunks = chunk_text(text, bpe, max_tokens=1024, overlap_tokens=128)
    n_tokens = len(bpe.encode(text))
    stride = 1024 - 128
    assert len(chunks) == math.ceil(n_tokens / stride)
    assert len(chunks) >= 2
    _verify_order(chunks)
    _verify_token_counts(chunks, bpe)
    _verify_overlap(chunks)


def test_custom_chunk_size_cap(bpe):
    text = ("Short text. " * 30).strip()
    chunks = chunk_text(text, bpe, max_tokens=30, overlap_tokens=5)
    assert len(chunks) >= 3
    for _, token_size, _ in chunks:
        assert token_size <= 30
    _verify_token_counts(chunks, bpe)
    _verify_overlap(chunks)


def test_unicode_preserved(bpe):
    text = ("Special characters: \U0001F680 \U0001F60A üñîçødé\n"
            "New lines\tTabs中文日本語")
    chunks = chunk_text(clean_content(text), bpe)
    assert len(chunks) == 1
    content = chunks[0][0]
    for needle in ("\U0001F680", "üñîçødé", "中文"):
        assert needle in content
    _verify_token_counts(chunks, bpe)


def test_encode_decode_lossless_on_fixture(bpe):
    samples = [
        "the quick brown fox jumps over the lazy dog",
        "  leading and trailing  ",
        "numbers 12345 and punctuation!?; mix",
        "he said 'don't' — contractions",
    ]
    for s in samples:
        assert bpe.decode(bpe.encode(s)) == s


def test_fixture_has_real_merges(bpe):
    """The vendored vocab must contain genuine multi-byte merges (not a
    byte-identity table): common words tokenize to far fewer tokens than
    bytes, and merges.txt ranks are honored (lowest rank fuses first)."""
    word = "sentence"
    toks = bpe.encode(word)
    assert len(toks) < len(word.encode("utf-8"))
    assert any(len(t) >= 4 for t in toks) or len(toks) == 1


def test_fixture_regenerates_identically():
    """gen_bpe_fixture.py is deterministic — the committed files ARE its
    output (provenance check, no randomness anywhere)."""
    import json
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "data"))
    import gen_bpe_fixture as gen

    vocab, merges = gen.train(gen.CORPUS, gen.N_MERGES)
    with open(os.path.join(_DIR, "vocab.json"), encoding="utf-8") as f:
        assert json.load(f) == vocab
    with open(os.path.join(_DIR, "merges.txt"), encoding="utf-8") as f:
        lines = [l.rstrip("\n") for l in f][1:]
    assert lines == [f"{a} {b}" for a, b in merges]


def test_chunker_actor_with_bpe_spec(ray_session):
    """The Handler surface end-to-end: Chunker actors load the vendored
    files per actor (reference T1/T2 deployment shape)."""
    import pyarrow as pa
    import ray.data

    from go_light_rag_ray.stages.chunker import Chunker, ChunkerConfig

    docs = ray.data.from_arrow(pa.table({
        "doc_id": ["a", "b"],
        "text": ["This sentence contains about nine tokens. " * 40,
                 "Short text. " * 10],
    }))
    cfg = ChunkerConfig(max_tokens=64, overlap_tokens=8, tokenizer=BPE_SPEC,
                        content_mode="text")
    chunks = docs.map_batches(
        Chunker, fn_constructor_kwargs={"config": cfg},
        batch_format="pyarrow", concurrency=(1, 2),
    ).take_all()
    assert chunks
    tok = get_tokenizer(BPE_SPEC)
    for r in chunks:
        assert r["token_size"] == tok.count(r["content"])
        assert r["chunk_id"] == f"{r['doc_id']}-chunk-{r['order_index']}"
