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
    """Actor-pool callable: documents batch → chunks batch (Arrow in/out).

    Vectorized shape: span texts assemble into per-doc content with Arrow
    list kernels, and documents whose content is pure single-spaced ASCII
    lowercase words take a batched single-window fast path — under BOTH
    shipped tokenizers such content tokenizes to exactly one piece per
    word (o200k branch 1 = optional leading space + letter run; \\S+ =
    the word), so token count == word count (one Arrow ``count_substring``)
    and the window is the whole document.  The guard regex also implies
    ``clean_content`` is a no-op.  Everything else — multi-window docs,
    punctuation/digits/unicode, BPE tokenizers — runs the exact per-doc
    kernel unchanged.  Output row order (doc order, then window order) is
    preserved.  The fast path is ~10× on word-bag corpora and is the
    chunk stage's scaling lever (the regex engine was the flagship's
    largest single kernel)."""

    def __init__(self, config: ChunkerConfig | None = None) -> None:
        self.config = config or ChunkerConfig()
        self.tokenizer = get_tokenizer(self.config.tokenizer)
        self._fast_ok = self.config.tokenizer in ("regex", "whitespace")

    def _doc_content(self, row_spans_or_text) -> str:
        if self.config.content_mode == "spans":
            return "".join(s["text"] for s in row_spans_or_text if s["kind"] == "text")
        return row_spans_or_text or ""

    def _contents(self, batch: pa.Table) -> pa.Array:
        """Per-doc raw content (pre-clean), assembled without Python rows."""
        import numpy as np
        import pyarrow.compute as pc

        if self.config.content_mode != "spans":
            return pc.cast(batch.column(self.config.text_column),
                           pa.string()).combine_chunks().fill_null("")
        spans = batch.column("spans").combine_chunks()
        flat = pc.list_flatten(spans)
        par = pc.list_parent_indices(spans).to_numpy(zero_copy_only=False)
        is_text = pc.equal(pc.struct_field(flat, "kind"),
                           "text").to_numpy(zero_copy_only=False)
        sel = np.flatnonzero(is_text)
        counts = np.bincount(par[sel], minlength=batch.num_rows)
        offsets = pa.array(
            np.concatenate(([0], np.cumsum(counts))).astype(np.int32))
        texts = pc.struct_field(flat, "text").take(pa.array(sel))
        return pc.binary_join(
            pa.ListArray.from_arrays(offsets, texts), "")

    def __call__(self, batch: pa.Table) -> pa.Table:
        import numpy as np
        import pyarrow.compute as pc

        cfg = self.config
        n = batch.num_rows
        raw_ids = batch.column(cfg.doc_id_column).to_pylist()
        doc_id_list = [cfg.doc_id_format.format(r) for r in raw_ids]
        doc_ids = pa.array(doc_id_list, pa.string())
        content = self._contents(batch)

        stride = cfg.max_tokens - cfg.overlap_tokens
        fast = np.zeros(n, dtype=bool)
        nwords = None
        if self._fast_ok and n:
            fast = pc.match_substring_regex(
                content, r"^[a-z]+( [a-z]+)*$").to_numpy(
                zero_copy_only=False).astype(bool)
            if fast.any():
                nwords = pc.add(
                    pc.count_substring(content, " "), 1
                ).cast(pa.int64()).to_numpy(zero_copy_only=False)
                fast &= nwords <= stride

        parts: list[pa.Table] = []
        doc_idx_parts: list[np.ndarray] = []
        if fast.any():
            fi = np.flatnonzero(fast)
            fi_a = pa.array(fi)
            f_ids = doc_ids.take(fi_a)
            parts.append(pa.Table.from_pydict({
                "chunk_id": pc.binary_join_element_wise(
                    f_ids, "-chunk-0", ""),
                "doc_id": f_ids,
                "order_index": pa.array(np.zeros(len(fi), np.int64)),
                "content": content.take(fi_a),
                "token_size": pa.array(nwords[fi]),
            }, schema=CHUNKS_SCHEMA))
            doc_idx_parts.append(fi)

        slow = np.flatnonzero(~fast)
        if len(slow):
            slow_contents = content.take(pa.array(slow)).to_pylist()
            out_chunk_id: list[str] = []
            out_doc_id: list[str] = []
            out_order: list[int] = []
            out_content: list[str] = []
            out_tokens: list[int] = []
            out_idx: list[int] = []
            for i, raw in zip(slow, slow_contents):
                doc_id = doc_id_list[i]
                for piece, token_size, order_index in chunk_text(
                    clean_content(raw), self.tokenizer,
                    cfg.max_tokens, cfg.overlap_tokens
                ):
                    out_chunk_id.append(f"{doc_id}-chunk-{order_index}")
                    out_doc_id.append(doc_id)
                    out_order.append(order_index)
                    out_content.append(piece)
                    out_tokens.append(token_size)
                    out_idx.append(i)
            parts.append(pa.Table.from_pydict({
                "chunk_id": out_chunk_id,
                "doc_id": out_doc_id,
                "order_index": out_order,
                "content": out_content,
                "token_size": out_tokens,
            }, schema=CHUNKS_SCHEMA))
            doc_idx_parts.append(np.array(out_idx, np.int64))

        if not parts:
            return CHUNKS_SCHEMA.empty_table()
        out = pa.concat_tables(parts)
        if len(parts) > 1:
            # restore (doc order, window order) — batch-order stability
            idx = np.concatenate(doc_idx_parts)
            order = out.column("order_index").to_numpy(zero_copy_only=False)
            out = out.take(pa.array(np.lexsort((order, idx))))
        return out
