"""Token-budgeted sliding-window chunker — the flagship stateful stage.

Reproduces the reference Default handler's ``ChunksDocument`` semantics
exactly (reference handler/default.go:53-96):

* empty content → 0 chunks;
* encode whole content; windows of ``max_tokens`` advancing by
  ``max_tokens - overlap_tokens``; loop while ``start < len(tokens)``;
* decode each window slice, ``TrimSpace`` it, re-count tokens of the
  trimmed text;
* emit ``(content, token_size, order_index)``; chunk id is
  ``"{doc_id}-chunk-{order_index}"`` (reference rag.go:264-266,
  insert.go:193-202);
* content is pre-cleaned: trim + strip NUL bytes (reference rag.go:209-213).

Deployed as an actor pool:
``docs.map_batches(Chunker, batch_format="pyarrow", concurrency=N)`` — the
tokenizer is compiled once per actor in ``__init__`` (reference T1, pinned
encoder tables), each ``__call__`` flat-maps one Arrow batch of documents
into an Arrow batch of chunks (1 row in → k rows out).
"""

from __future__ import annotations

from dataclasses import dataclass

import pyarrow as pa

from ..schemas import CHUNKS_SCHEMA
from ..tokenizer import Tokenizer, get_tokenizer

DEFAULT_CHUNK_MAX_TOKENS = 1024     # reference handler/default.go:41
DEFAULT_CHUNK_OVERLAP_TOKENS = 128  # reference handler/default.go:42


def clean_content(text: str) -> str:
    """Reference ``cleanContent`` (rag.go:209-213): trim + strip NULs."""
    return text.strip().replace("\x00", "")


def chunk_text(
    content: str,
    tokenizer: Tokenizer,
    max_tokens: int = DEFAULT_CHUNK_MAX_TOKENS,
    overlap_tokens: int = DEFAULT_CHUNK_OVERLAP_TOKENS,
) -> list[tuple[str, int, int]]:
    """Pure chunking kernel → [(content, token_size, order_index)]."""
    if not content:
        return []
    tokens = tokenizer.encode(content)
    stride = max_tokens - overlap_tokens
    if stride <= 0:
        raise ValueError("overlap_tokens must be smaller than max_tokens")
    if len(tokens) <= stride:
        # single-window fast path (≤ stride, NOT ≤ max_tokens: the
        # reference loop advances by stride while start < len(tokens), so
        # a doc in (stride, max_tokens] still emits an overlap-tail
        # window), exact by the tokenizer losslessness contract
        # ("".join(encode(s)) == s, tokenizer.py): the window is ALL
        # tokens, so decode(tokens) == content and — when strip is a
        # no-op (the chunker pre-cleans) — the reference's re-count equals
        # len(tokens).  Skips the decode + second full tokenization that
        # dominate the flagship chunk stage (~2× per-doc regex work).
        piece = content.strip()
        size = len(tokens) if piece == content else tokenizer.count(piece)
        return [(piece, size, 0)]
    out: list[tuple[str, int, int]] = []
    index = 0
    for start in range(0, len(tokens), stride):
        end = min(start + max_tokens, len(tokens))
        piece = tokenizer.decode(tokens[start:end]).strip()
        out.append((piece, tokenizer.count(piece), index))
        index += 1
    return out


@dataclass
class ChunkerConfig:
    max_tokens: int = DEFAULT_CHUNK_MAX_TOKENS
    overlap_tokens: int = DEFAULT_CHUNK_OVERLAP_TOKENS
    tokenizer: str = "regex"          # "regex" (o200k-ish) | "whitespace" (oracle)
    content_mode: str = "spans"       # "spans" (interleaved docs) | "text" (flat table)
    doc_id_column: str = "doc_id"
    text_column: str = "text"
    # Applied to the raw id: zero-padding keeps string order == numeric order,
    # which the occurrence keys (canonicalize.occ_key) rely on for ordering.
    doc_id_format: str = "{}"         # e.g. "doc-{:09d}" when doc_id is int64


class Chunker:
    """Actor-pool callable: documents batch → chunks batch (Arrow in/out)."""

    def __init__(self, config: ChunkerConfig | None = None) -> None:
        self.config = config or ChunkerConfig()
        self.tokenizer = get_tokenizer(self.config.tokenizer)

    def _doc_content(self, row_spans_or_text) -> str:
        if self.config.content_mode == "spans":
            return "".join(s["text"] for s in row_spans_or_text if s["kind"] == "text")
        return row_spans_or_text or ""

    def __call__(self, batch: pa.Table) -> pa.Table:
        cfg = self.config
        payload_col = "spans" if cfg.content_mode == "spans" else cfg.text_column
        doc_ids = batch.column(cfg.doc_id_column).to_pylist()
        payloads = batch.column(payload_col).to_pylist()

        out_chunk_id: list[str] = []
        out_doc_id: list[str] = []
        out_order: list[int] = []
        out_content: list[str] = []
        out_tokens: list[int] = []
        for raw_id, payload in zip(doc_ids, payloads):
            doc_id = cfg.doc_id_format.format(raw_id)
            content = clean_content(self._doc_content(payload))
            for piece, token_size, order_index in chunk_text(
                content, self.tokenizer, cfg.max_tokens, cfg.overlap_tokens
            ):
                out_chunk_id.append(f"{doc_id}-chunk-{order_index}")
                out_doc_id.append(doc_id)
                out_order.append(order_index)
                out_content.append(piece)
                out_tokens.append(token_size)

        return pa.Table.from_pydict(
            {
                "chunk_id": out_chunk_id,
                "doc_id": out_doc_id,
                "order_index": out_order,
                "content": out_content,
                "token_size": out_tokens,
            },
            schema=CHUNKS_SCHEMA,
        )
