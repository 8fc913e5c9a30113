"""Alternate document handlers: Markdown-section, code-declaration, and
semantic (LLM-sectioned) chunkers.

The reference exposes chunking as the ``DocumentHandler`` extension point
(reference insert.go:21-46) with four implementations: Default (sliding
window, stages/chunker.py), MarkdownAst (handler/markdown.go:121-1071), Go
(handler/go.go:44-166) and Semantic (handler/semantic.go:63-214).  This
module provides the latter three as pure per-row flat-map kernels plus a
``HandlerChunker`` actor-pool stage that dispatches per row on a
``doc_kind`` column (the reference's extension router,
examples/multiple/main.go:416-424) — so one ``map_batches`` pass chunks a
mixed corpus.

All chunkers emit the same CHUNKS_SCHEMA rows the Default chunker does, so
every downstream stage (extraction, canonicalization) is handler-agnostic.
"""

from __future__ import annotations

import re

import pyarrow as pa

from ..schemas import CHUNKS_SCHEMA
from ..tokenizer import get_tokenizer
from .chunker import ChunkerConfig, chunk_text, clean_content

# ---------------------------------------------------------------------------
# Markdown section chunker (reference handler/markdown.go:121-1071)
# ---------------------------------------------------------------------------

_HEADING_RE = re.compile(r"^(#{1,6})\s+(.*)$")
_FENCE_RE = re.compile(r"^(```|~~~)")
_SYNTAX_ONLY_RE = re.compile(r"^[\s#*\-_=`>|:\[\]()!.]*$")


def split_markdown_sections(text: str) -> list[tuple[int, str, str]]:
    """→ [(level, heading, body)] with fenced code blocks protected
    (a heading inside a fence does not split — reference
    markdown.go:681-732's protected ranges)."""
    sections: list[tuple[int, str, list[str]]] = []
    cur_level, cur_heading, cur_body = 0, "", []
    in_fence = False
    for line in text.splitlines():
        if _FENCE_RE.match(line.strip()):
            in_fence = not in_fence
            cur_body.append(line)
            continue
        m = None if in_fence else _HEADING_RE.match(line)
        if m:
            if cur_body or cur_heading:
                sections.append((cur_level, cur_heading, cur_body))
            cur_level, cur_heading, cur_body = len(m.group(1)), m.group(2), []
        else:
            cur_body.append(line)
    if cur_body or cur_heading:
        sections.append((cur_level, cur_heading, cur_body))
    return [(lv, h, "\n".join(b).strip()) for lv, h, b in sections]


def has_actual_content(text: str) -> bool:
    """Drop chunks that are only markdown syntax (reference
    markdown.go:931-987 hasActualContent)."""
    return not _SYNTAX_ONLY_RE.match(text)


def chunk_markdown(
    content: str,
    max_chunk_tokens: int = 1024,
    tokenizer_name: str = "regex",
) -> list[tuple[str, int, int]]:
    """Heading-aware chunking: one chunk per section (heading kept as the
    first line); adjacent small sections merge under the token budget
    (markdown.go:398-461); oversized sections fall back to the sliding
    window (markdown.go:572-928's paragraph/sentence fallback, expressed
    with the Default window for determinism); syntax-only chunks dropped."""
    tok = get_tokenizer(tokenizer_name)
    content = clean_content(content)
    if not content:
        return []
    pieces: list[str] = []
    for level, heading, body in split_markdown_sections(content):
        sect = (("#" * level + " " + heading + "\n") if heading else "") + body
        sect = sect.strip()
        if not sect or not has_actual_content(sect):
            continue
        if tok.count(sect) > max_chunk_tokens:
            for piece, _, _ in chunk_text(sect, tok, max_chunk_tokens,
                                          overlap_tokens=0):
                pieces.append(piece)
        elif pieces and tok.count(pieces[-1]) + tok.count(sect) <= max_chunk_tokens:
            pieces[-1] = pieces[-1] + "\n\n" + sect
        else:
            pieces.append(sect)
    return [(p, tok.count(p), i) for i, p in enumerate(pieces)]


# ---------------------------------------------------------------------------
# Code-declaration chunker (reference handler/go.go:44-166)
# ---------------------------------------------------------------------------

_DECL_RE = re.compile(
    r"^(func|type|const|var|def|class)\b", re.MULTILINE
)
_PACKAGE_RE = re.compile(r"^package\s+(\w+)", re.MULTILINE)


def chunk_code(content: str, tokenizer_name: str = "regex") -> list[tuple[str, int, int]]:
    """Declaration-level chunking: a header chunk (package/imports/module
    prologue), then one chunk per top-level declaration, each prefixed with
    the package line (reference go.go:44-166 emits ``package X\\n\\n`` +
    decl).  Language-agnostic via the decl keyword set (func/type/const/var
    for Go shape, def/class for Python shape); a doc comment directly above
    a declaration travels with it."""
    content = clean_content(content)
    if not content:
        return []
    tok = get_tokenizer(tokenizer_name)
    pm = _PACKAGE_RE.search(content)
    pkg_prefix = f"package {pm.group(1)}\n\n" if pm else ""

    lines = content.splitlines()
    decl_starts = [
        i for i, ln in enumerate(lines) if _DECL_RE.match(ln)
    ]
    if not decl_starts:
        return [(content, tok.count(content), 0)]
    # attach contiguous comment lines above each decl
    adj_starts = []
    for s in decl_starts:
        while s > 0 and lines[s - 1].lstrip().startswith(("//", "#", "/*", "*")):
            s -= 1
        adj_starts.append(s)
    chunks: list[str] = []
    header = "\n".join(lines[: adj_starts[0]]).strip()
    if header:
        chunks.append(header)
    for i, s in enumerate(adj_starts):
        e = adj_starts[i + 1] if i + 1 < len(adj_starts) else len(lines)
        body = "\n".join(lines[s:e]).strip()
        if not body:
            continue
        prefixed = (pkg_prefix + body) if (pkg_prefix and not body.startswith("package")) else body
        chunks.append(prefixed)
    return [(c, tok.count(c), i) for i, c in enumerate(chunks)]


# ---------------------------------------------------------------------------
# Semantic chunker (reference handler/semantic.go:63-214) — deterministic
# sectioner stands in for the LLM (SURVEY.md §7.0 hermetic-LLM decision)
# ---------------------------------------------------------------------------

def _rule_sectioner(text: str, target_sections: int = 4) -> list[tuple[int, int]]:
    """The LLM stand-in: deterministic [(start, end)] char positions at
    paragraph boundaries, aiming for ``target_sections`` even parts."""
    paras = [m.end() for m in re.finditer(r"\n\s*\n", text)]
    bounds = [0] + paras + [len(text)]
    if len(bounds) <= 2:
        step = max(1, len(text) // target_sections)
        bounds = list(range(0, len(text), step)) + [len(text)]
    out = []
    for a, b in zip(bounds, bounds[1:]):
        if b > a:
            out.append((a, b))
    return out


def chunk_semantic(
    content: str,
    max_tokens: int = 1024,
    overlap_tokens: int = 128,
    threshold_tokens: int = 8000,
    tokenizer_name: str = "regex",
    sectioner=None,
) -> list[tuple[str, int, int]]:
    """Semantic chunking shell with the reference's control flow
    (semantic.go:63-214): small docs pass straight to the sliding window;
    big docs are pre-chunked, each piece sectioned (LLM in the reference,
    ``sectioner`` here), invalid sections skipped, oversize sections
    re-chunked with overlap ``min(max/4, 20)``; sub-chunk order index is
    ``i*100 + j`` (semantic.go:101,190); any sectioner failure falls back
    to the Default window."""
    tok = get_tokenizer(tokenizer_name)
    content = clean_content(content)
    if not content:
        return []
    if tok.count(content) <= threshold_tokens:
        return chunk_text(content, tok, max_tokens, overlap_tokens)
    sectioner = sectioner or _rule_sectioner
    out: list[tuple[str, int, int]] = []
    pre = chunk_text(content, tok, threshold_tokens, 0)
    for i, (piece, _, _) in enumerate(pre):
        try:
            sections = sectioner(piece)
        except Exception:
            return chunk_text(content, tok, max_tokens, overlap_tokens)
        j = 0
        for start, end in sections:
            if not (0 <= start < end <= len(piece)):
                continue  # invalid section skipped (semantic.go:168-176)
            sect = piece[start:end].strip()
            if not sect:
                continue
            if tok.count(sect) > max_tokens:
                sub_overlap = min(max_tokens // 4, 20)
                for sub, n, _ in chunk_text(sect, tok, max_tokens, sub_overlap):
                    out.append((sub, n, i * 100 + j))
                    j += 1
            else:
                out.append((sect, tok.count(sect), i * 100 + j))
                j += 1
    return out


# ---------------------------------------------------------------------------
# dispatching actor-pool stage (reference S3 router)
# ---------------------------------------------------------------------------

class HandlerChunker:
    """Actor-pool callable: mixed-corpus chunking with per-row handler
    dispatch on a ``doc_kind`` column ∈ {default, markdown, code,
    semantic}.  Tokenizer pinned per actor; one flat-map pass."""

    def __init__(self, config: ChunkerConfig | None = None,
                 kind_column: str = "doc_kind") -> None:
        self.config = config or ChunkerConfig(content_mode="text")
        self.kind_column = kind_column
        self.tokenizer = get_tokenizer(self.config.tokenizer)

    def _chunks_for(self, kind: str, content: str):
        cfg = self.config
        if kind == "markdown":
            # the faithful MarkdownAst port (char-sized sections, paragraph
            # → sentence → word descent, protected code/tables, char
            # overlap) — reference handler/markdown.go:27-1071
            from .mdchunk import chunk_markdown_ast

            return chunk_markdown_ast(content, tokenizer_name=cfg.tokenizer)
        if kind == "markdown_sections":
            # token-budgeted section merger (the engine-native variant)
            return chunk_markdown(content, cfg.max_tokens, cfg.tokenizer)
        if kind == "go":
            # strict Go parsing (reference handler/go.go errors on invalid
            # source); parse failures surface, they do not silently degrade
            from .gochunk import chunk_go

            return chunk_go(content, cfg.tokenizer)
        if kind == "code":
            return chunk_code(content, cfg.tokenizer)
        if kind == "semantic":
            return chunk_semantic(content, cfg.max_tokens,
                                  cfg.overlap_tokens,
                                  tokenizer_name=cfg.tokenizer)
        return chunk_text(clean_content(content), self.tokenizer,
                          cfg.max_tokens, cfg.overlap_tokens)

    def __call__(self, batch: pa.Table) -> pa.Table:
        cfg = self.config
        doc_ids = batch.column(cfg.doc_id_column).to_pylist()
        texts = batch.column(cfg.text_column).to_pylist()
        kinds = (
            batch.column(self.kind_column).to_pylist()
            if self.kind_column in batch.column_names
            else ["default"] * len(doc_ids)
        )
        rows = {k: [] for k in
                ("chunk_id", "doc_id", "order_index", "content", "token_size")}
        for raw_id, text, kind in zip(doc_ids, texts, kinds):
            doc_id = cfg.doc_id_format.format(raw_id)
            for piece, n, idx in self._chunks_for(kind or "default", text or ""):
                rows["chunk_id"].append(f"{doc_id}-chunk-{idx}")
                rows["doc_id"].append(doc_id)
                rows["order_index"].append(idx)
                rows["content"].append(piece)
                rows["token_size"].append(n)
        return pa.Table.from_pydict(rows, schema=CHUNKS_SCHEMA)
