"""Chunker goldens mirroring reference handler/default_test.go:12-227."""

import pyarrow as pa

from go_light_rag_ray.schemas import DOCUMENTS_SCHEMA
from go_light_rag_ray.stages.chunker import (
    Chunker,
    ChunkerConfig,
    chunk_text,
    clean_content,
)
from go_light_rag_ray.tokenizer import RegexTokenizer

TK = RegexTokenizer()


def test_empty_returns_no_chunks():
    # default_test.go: empty → 0 chunks
    assert chunk_text("", TK) == []


def test_small_single_chunk_identity():
    # default_test.go:27-39: small text → 1 chunk, content identical, order 0
    text = "This is a small text that should fit in a single chunk."
    chunks = chunk_text(text, TK)
    assert len(chunks) == 1
    content, token_size, order = chunks[0]
    assert content == text
    assert order == 0
    assert token_size == TK.count(text)


def test_multi_chunk_overlap_and_order():
    # default_test.go:41-53, 173-185: long text → multiple chunks, sequential
    # OrderIndex, tail of chunk i appears in chunk i+1 (the overlap window)
    text = "This sentence contains about nine tokens. " * 300
    chunks = chunk_text(text, TK)
    assert len(chunks) >= 3
    for i, (_, _, order) in enumerate(chunks):
        assert order == i
    for (c1, _, _), (c2, _, _) in zip(chunks, chunks[1:]):
        tail = c1[-20:]
        assert tail in c2


def test_custom_sizes_respect_max():
    # default_test.go:55-73: max 30 / overlap 5 → >=3 chunks, every size <= 30
    text = "Short text. " * 30
    chunks = chunk_text(text, TK, max_tokens=30, overlap_tokens=5)
    assert len(chunks) >= 3
    for _, token_size, _ in chunks:
        assert token_size <= 30


def test_unicode_preserved():
    # default_test.go:75-87
    text = "Special characters: 🚀 😊 üñîçødé\nNew lines\tTabs中文日本語"
    chunks = chunk_text(text, TK)
    assert len(chunks) == 1
    assert chunks[0][0] == text


def test_token_size_matches_recount():
    # default_test.go:115-130: TokenSize == CountTokens(content) for every chunk
    text = "The quick brown fox jumps over the lazy dog. " * 120
    for content, token_size, _ in chunk_text(text, TK, max_tokens=64, overlap_tokens=16):
        assert token_size == TK.count(content)


def test_clean_content():
    # rag.go:209-213: trim + strip NULs
    assert clean_content("  a\x00b  ") == "ab"


def test_chunker_batch_spans_mode():
    docs = pa.Table.from_pydict(
        {
            "doc_id": ["d1", "d2"],
            "spans": [
                [
                    {"kind": "text", "text": "Hello world. ", "media_ref": "", "offset": 0},
                    {"kind": "image", "text": "", "media_ref": "media://d1/1", "offset": 13},
                    {"kind": "text", "text": "Second span.", "media_ref": "", "offset": 13},
                ],
                [{"kind": "image", "text": "", "media_ref": "media://d2/0", "offset": 0}],
            ],
        },
        schema=DOCUMENTS_SCHEMA,
    )
    out = Chunker(ChunkerConfig())(docs)
    assert out.num_rows == 1  # d2 has no text → cleaned content empty → 0 chunks
    row = out.to_pylist()[0]
    assert row["chunk_id"] == "d1-chunk-0"
    assert row["doc_id"] == "d1"
    assert row["content"] == "Hello world. Second span."


def test_chunker_batch_text_mode_with_prefix():
    docs = pa.Table.from_pydict({"doc_id": [7], "text": ["some words here"]})
    cfg = ChunkerConfig(content_mode="text", doc_id_format="doc-{:09d}", tokenizer="whitespace")
    out = Chunker(cfg)(docs)
    row = out.to_pylist()[0]
    assert row["chunk_id"] == "doc-000000007-chunk-0"
    assert row["token_size"] == 3


def test_overlap_tail_window_between_stride_and_max():
    """A doc with stride < len(tokens) <= max_tokens emits TWO windows —
    the reference loop advances by stride while start < len(tokens)
    (handler/default.go:53-96).  Regression guard for the single-window
    fast path: only docs at <= stride tokens may take it (the original
    <= max_tokens condition silently dropped these tail windows; the
    chunks value oracle caught it, the unit suite did not)."""
    tok = RegexTokenizer()
    words = " ".join(["ab"] * 30)  # 30 one-token words (letters only)
    assert tok.count(words) == 30
    out = chunk_text(words, tok, max_tokens=25, overlap_tokens=5)  # stride 20
    assert [o[2] for o in out] == [0, 1]
    # tail window covers tokens [20:30]; recount of the trimmed piece
    assert out[1][1] == 10
    # boundary cases: exactly stride -> one window; stride+1 -> two
    exact = " ".join(["ab"] * 20)
    assert len(chunk_text(exact, tok, max_tokens=25, overlap_tokens=5)) == 1
    plus = " ".join(["ab"] * 21)
    assert len(chunk_text(plus, tok, max_tokens=25, overlap_tokens=5)) == 2


def test_chunker_fast_path_equals_per_doc_kernel():
    """The vectorized single-window fast path must emit rows identical to
    the per-doc chunk_text kernel for every content shape — edge cases
    picked to straddle the fast-path guard."""
    import pyarrow as pa

    from go_light_rag_ray.stages.chunker import (
        Chunker,
        ChunkerConfig,
        chunk_text,
        clean_content,
    )
    from go_light_rag_ray.tokenizer import get_tokenizer

    texts = [
        "plain lower words here",
        "",
        "   leading and trailing   ",
        "with\x00nul bytes\x00 inside",
        "UPPER Case Words",
        "digits 12345 mixed 9",
        "punct, here! (and) more?",
        "unicode héllo wörld",
        "tab\tseparated\twords",
        "double  spaces  here",
        "a " * 2000,            # multi-window
        "word",
        "newline\nin text",
        "ends with space ",
    ]
    batch = pa.table({"doc_id": list(range(len(texts))), "text": texts})
    for tokname in ("regex", "whitespace"):
        cfg = ChunkerConfig(tokenizer=tokname, content_mode="text",
                            doc_id_format="doc-{:04d}")
        tok = get_tokenizer(tokname)
        want = []
        for raw_id, text in zip(batch.column("doc_id").to_pylist(), texts):
            doc_id = cfg.doc_id_format.format(raw_id)
            for piece, ts, oi in chunk_text(
                    clean_content(text), tok, cfg.max_tokens,
                    cfg.overlap_tokens):
                want.append((f"{doc_id}-chunk-{oi}", doc_id, oi, piece, ts))
        got = Chunker(cfg)(batch)
        got_rows = list(zip(
            got.column("chunk_id").to_pylist(),
            got.column("doc_id").to_pylist(),
            got.column("order_index").to_pylist(),
            got.column("content").to_pylist(),
            got.column("token_size").to_pylist()))
        assert got_rows == want, tokname
