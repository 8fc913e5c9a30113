"""Markdown/code/semantic chunkers + dispatching HandlerChunker + encoder."""

import numpy as np
import pyarrow as pa
import ray.data

from go_light_rag_ray.stages.encode import HashEncoder, encode_chunks
from go_light_rag_ray.stages.handlers import (
    HandlerChunker,
    chunk_code,
    chunk_markdown,
    chunk_semantic,
    has_actual_content,
    split_markdown_sections,
)

MD = """# Title

intro para

## Section A

alpha body text here

```
# not a heading, fenced
```

## Section B

beta body
"""

GO_SRC = """package example

import "fmt"

// Add adds.
func Add(a, b int) int {
	return a + b
}

type Pair struct{ X, Y int }
"""


def test_split_markdown_sections_protects_fences():
    sections = split_markdown_sections(MD)
    headings = [h for _, h, _ in sections]
    assert headings == ["Title", "Section A", "Section B"]
    # the fenced pseudo-heading stayed inside Section A's body
    assert "# not a heading" in sections[1][2]


def test_chunk_markdown_merges_small_sections():
    chunks = chunk_markdown(MD, max_chunk_tokens=1024)
    assert len(chunks) == 1  # all sections merge under the budget
    assert chunks[0][2] == 0
    big = chunk_markdown(MD, max_chunk_tokens=12)
    assert len(big) > 1
    assert [c[2] for c in big] == list(range(len(big)))


def test_markdown_syntax_only_filter():
    assert not has_actual_content("---\n###\n> ")
    assert has_actual_content("# H\nreal words")
    chunks = chunk_markdown("---\n\n# \n\n> ", max_chunk_tokens=100)
    assert chunks == []


def test_chunk_code_go_shape():
    chunks = chunk_code(GO_SRC)
    texts = [c[0] for c in chunks]
    assert texts[0].startswith("package example")       # header chunk
    assert any(t.startswith("package example\n\n// Add adds.") for t in texts)
    assert any("type Pair struct" in t for t in texts)
    assert [c[2] for c in chunks] == list(range(len(chunks)))


def test_chunk_code_no_decls_single_chunk():
    chunks = chunk_code("just some text\nwith lines")
    assert len(chunks) == 1


def test_chunk_semantic_small_doc_passthrough():
    text = "hello world " * 20
    assert chunk_semantic(text, max_tokens=16, overlap_tokens=4,
                          threshold_tokens=8000) == \
        chunk_semantic(text, max_tokens=16, overlap_tokens=4,
                       threshold_tokens=8000)
    # equals the default window for small docs
    from go_light_rag_ray.stages.chunker import chunk_text
    from go_light_rag_ray.tokenizer import get_tokenizer

    assert chunk_semantic(text, 16, 4, 8000) == \
        chunk_text(text.strip(), get_tokenizer("regex"), 16, 4)


def test_chunk_semantic_big_doc_sections():
    paras = "\n\n".join(f"para {i} " + ("word " * 30) for i in range(40))
    chunks = chunk_semantic(paras, max_tokens=64, overlap_tokens=8,
                            threshold_tokens=256)
    assert len(chunks) > 1
    # i*100+j order indices: second pre-chunk's sections start at 100
    assert any(c[2] >= 100 for c in chunks)
    # deterministic
    assert chunks == chunk_semantic(paras, max_tokens=64, overlap_tokens=8,
                                    threshold_tokens=256)


def test_handler_chunker_dispatch():
    docs = ray.data.from_arrow(pa.table({
        "doc_id": ["d0", "d1", "d2"],
        "doc_kind": ["markdown", "code", "default"],
        "text": [MD, GO_SRC, "plain text doc"],
    }))
    chunks = docs.map_batches(HandlerChunker, batch_format="pyarrow",
                              concurrency=1).take_all()
    by_doc = {}
    for c in chunks:
        by_doc.setdefault(c["doc_id"], []).append(c)
    assert set(by_doc) == {"d0", "d1", "d2"}
    assert by_doc["d2"][0]["chunk_id"] == "d2-chunk-0"
    assert any("func Add" in c["content"] for c in by_doc["d1"])


def test_hash_encoder_properties():
    enc = HashEncoder(dims=32)
    a = enc.encode("spark table join")
    b = enc.encode("spark table join")
    c = enc.encode("completely different words")
    assert np.allclose(a, b)
    assert abs(np.linalg.norm(a) - 1.0) < 1e-9
    assert a @ c < 0.9
    # overlapping vocab → higher cosine than disjoint
    d = enc.encode("spark table merge")
    assert a @ d > a @ c
    assert set(enc._dirs) >= {"spark", "table", "join"}  # actor-state cache


def test_encode_chunks_stage():
    chunks = ray.data.from_arrow(pa.table({
        "chunk_id": ["c0", "c1"],
        "content": ["spark table join", ""],
    }))
    rows = encode_chunks(chunks, dims=16, concurrency=1).take_all()
    by_id = {r["chunk_id"]: r for r in rows}
    assert by_id["c0"]["dims"] == 16
    assert len(by_id["c0"]["vector"]) == 16
    assert by_id["c0"]["model"] == "hash-proj-v1"
    assert all(v == 0.0 for v in by_id["c1"]["vector"])  # empty content
