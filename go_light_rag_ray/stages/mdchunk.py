"""Markdown AST-style chunker — faithful port of reference
handler/markdown.go:27-1071 (the MarkdownAst DocumentHandler).

The reference parses with goldmark and chunks by a descent hierarchy:

* whole doc ≤ MaxChunkSize → ONE "complete" chunk (markdown.go:121-137);
* else: sections from headings (implicit level-0 section before the first
  heading, markdown.go:151-235), optional subsection merging under
  HeaderHierarchy (398-461);
* section ≤ MaxChunkSize → one chunk; else paragraph split (572-670) with
  code-block/table PROTECTED RANGES that a boundary may not cut (681-732);
* no paragraph boundaries → sentence split (756-838) with abbreviation /
  decimal guards (861-876); none → word-boundary split (878-928);
* char-level overlap stitched from the previous chunk's suffix at a word
  boundary (535-569);
* chunks trimmed and filtered by hasActualContent (931-987), token-counted,
  **OrderIndex = the chunk's char StartPos** (markdown.go:1066 — position,
  not sequence; reproduced).

Sizes here are CHARACTER sizes, as in the reference (MaxChunkSize=1200
etc.), so boundary decisions are byte-for-byte comparable.  Instead of
goldmark, a line-scanner builds the element map (headings outside fences,
fenced code blocks, pipe tables) — the only element classes the chunking
decisions actually consume.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from ..tokenizer import get_tokenizer

_HEADING_RE = re.compile(r"^(#{1,6})\s+")
_FENCE_RE = re.compile(r"^(```|~~~)")
_TABLE_SEP_RE = re.compile(r"^\s*\|?[\s:|-]+\|[\s:|-]*$")
_PARA_RE = re.compile(r"\n\s*\n")
_SENTENCE_RE = re.compile(r"[.!?]+(?:\s+|$)")
_ABBREV_RE = re.compile(r"\b[A-Z][a-z]*\.\s*$")
_DECIMAL_RE = re.compile(r"\d+\.\d+")


@dataclass
class ChunkingOptions:
    """markdown.go:39-57 defaults."""

    max_chunk_size: int = 1200
    min_chunk_size: int = 100
    overlap_size: int = 0
    preserve_formatting: bool = False
    respect_code_blocks: bool = True
    respect_tables: bool = True
    header_hierarchy: bool = True


@dataclass
class _Section:
    start: int
    end: int
    level: int
    text: str
    protected: list[tuple[int, int]]  # absolute (start, end) code/table ranges


@dataclass
class _Chunk:
    text: str
    start: int
    end: int


def _scan_elements(content: str):
    """(headings, protected ranges) with absolute char positions; fences
    protect headings and tables inside them from being structural."""
    headings: list[tuple[int, int]] = []  # (pos, level)
    protected: list[tuple[int, int, str]] = []
    lines = content.split("\n")
    pos = 0
    in_fence = False
    fence_start = 0
    table_start: int | None = None
    prev_line = ""
    prev_pos = 0
    for ln in lines:
        end = pos + len(ln)
        stripped = ln.strip()
        if _FENCE_RE.match(stripped):
            if in_fence:
                protected.append((fence_start, end, "code_block"))
                in_fence = False
            else:
                in_fence = True
                fence_start = pos
            if table_start is not None:
                protected.append((table_start, prev_pos + len(prev_line), "table"))
                table_start = None
        elif not in_fence:
            m = _HEADING_RE.match(ln)
            if m:
                headings.append((pos, len(m.group(1))))
            if "|" in ln and stripped:
                if table_start is None:
                    # a table begins at a header row followed by a |---|
                    # separator (GFM shape, markdown.go table elements)
                    table_start = pos
                elif _TABLE_SEP_RE.match(ln):
                    pass  # separator row keeps the run alive
            else:
                if table_start is not None:
                    # run of |-rows must include a separator to be a table
                    run = content[table_start:prev_pos + len(prev_line)]
                    if any(_TABLE_SEP_RE.match(x) for x in run.split("\n")):
                        protected.append(
                            (table_start, prev_pos + len(prev_line), "table"))
                    table_start = None
        prev_line, prev_pos = ln, pos
        pos = end + 1
    if in_fence:
        protected.append((fence_start, len(content), "code_block"))
    if table_start is not None:
        run = content[table_start:len(content)]
        if any(_TABLE_SEP_RE.match(x) for x in run.split("\n")):
            protected.append((table_start, len(content), "table"))
    return headings, protected


def _extract_sections(content: str, opts: ChunkingOptions) -> list[_Section]:
    """markdown.go:151-235: one section per heading + implicit head."""
    headings, protected = _scan_elements(content)
    prot = [(s, e) for s, e, t in protected
            if (t == "code_block" and opts.respect_code_blocks)
            or (t == "table" and opts.respect_tables)]
    bounds: list[tuple[int, int]] = []
    if not headings or headings[0][0] > 0:
        bounds.append((0, 0))  # implicit section, level 0
    bounds.extend(headings)
    sections = []
    for i, (start, level) in enumerate(bounds):
        end = bounds[i + 1][0] if i + 1 < len(bounds) else len(content)
        sections.append(_Section(
            start=start, end=end, level=level, text=content[start:end],
            protected=[(s, e) for s, e in prot if s >= start and s < end],
        ))
    return sections


def _merge_subsections(sections: list[_Section], content: str,
                       opts: ChunkingOptions) -> list[_Section]:
    """markdown.go:398-461: absorb consecutive DEEPER subsections while the
    combined text stays under MaxChunkSize."""
    if len(sections) <= 1:
        return sections
    merged: list[_Section] = []
    i = 0
    while i < len(sections):
        cur = sections[i]
        j = i + 1
        total = len(cur.text)
        while j < len(sections):
            nxt = sections[j]
            if nxt.level <= cur.level:
                break
            if total + len(nxt.text) > opts.max_chunk_size:
                break
            total += len(nxt.text)
            j += 1
        if j > i + 1:
            end = sections[j - 1].end
            prot = [p for s in sections[i:j] for p in s.protected]
            merged.append(_Section(
                start=cur.start, end=end, level=cur.level,
                text=content[cur.start:end], protected=prot,
            ))
            i = j
        else:
            merged.append(cur)
            i += 1
    return merged


def _would_split(chunk_end: int, ranges: list[tuple[int, int]]) -> bool:
    return any(s < chunk_end < e for s, e in ranges)


def _adjust_boundary(chunk_start: int, chunk_end: int,
                     ranges: list[tuple[int, int]]) -> int:
    """markdown.go:719-732: end before the protected range if possible,
    else swallow it whole."""
    for s, e in ranges:
        if s < chunk_end < e:
            if s > chunk_start:
                return s
            return e
    return chunk_end


def _para_boundaries(text: str) -> list[int]:
    bounds = [m.end() for m in _PARA_RE.finditer(text)]
    if not bounds or bounds[-1] != len(text):
        bounds.append(len(text))
    return bounds


def _sentence_boundaries(text: str) -> list[int]:
    bounds = []
    for m in _SENTENCE_RE.finditer(text):
        pos = m.end()
        if _ABBREV_RE.search(text[max(0, pos - 20):pos]):
            continue
        if _DECIMAL_RE.search(text[max(0, pos - 10):min(len(text), pos + 10)]):
            continue
        bounds.append(pos)
    if not bounds or bounds[-1] != len(text):
        bounds.append(len(text))
    return bounds


def _accumulate(section: _Section, boundaries: list[int],
                opts: ChunkingOptions, merge_sep: str,
                protected: list[tuple[int, int]] | None) -> list[_Chunk]:
    """The shared paragraph/sentence accumulation loop
    (markdown.go:589-670 and 775-838): greedily pack pieces up to
    MaxChunkSize; a too-small trailing chunk merges into its predecessor."""
    text = section.text
    chunks: list[_Chunk] = []
    cur_start = 0
    cur = ""
    for bend in boundaries:
        piece = text[cur_start:bend]
        if cur and len(cur) + len(piece) > opts.max_chunk_size:
            if protected is not None and _would_split(
                    section.start + cur_start, protected):
                adjusted = _adjust_boundary(
                    section.start, section.start + cur_start, protected)
                rel = adjusted - section.start
                if rel != cur_start and cur_start < rel < bend:
                    cur = text[cur_start - len(cur):rel]
                    cur_start = rel
            if len(cur) >= opts.min_chunk_size or not chunks:
                out = cur if opts.preserve_formatting else cur.strip()
                chunks.append(_Chunk(out, section.start + cur_start - len(cur),
                                     section.start + cur_start))
            cur = piece
        else:
            cur += piece
        cur_start = bend
    trimmed = cur.strip()
    if trimmed:
        if len(cur) < opts.min_chunk_size and chunks:
            last = chunks[-1]
            add = cur if opts.preserve_formatting else trimmed
            chunks[-1] = _Chunk(last.text + merge_sep + add, last.start,
                                section.end)
        else:
            out = cur if opts.preserve_formatting else trimmed
            chunks.append(_Chunk(out, section.start + cur_start - len(cur),
                                 section.end))
    return chunks


def _chunk_by_words(section: _Section, opts: ChunkingOptions) -> list[_Chunk]:
    """markdown.go:878-928: fixed-size windows backed off to whitespace."""
    text = section.text
    size = opts.max_chunk_size
    if len(text) <= size:
        out = text if opts.preserve_formatting else text.strip()
        return [_Chunk(out, section.start, section.end)]
    chunks = []
    i = 0
    while i < len(text):
        end = min(i + size, len(text))
        if end < len(text):
            while end > i + opts.min_chunk_size and end < len(text) \
                    and not text[end].isspace():
                end -= 1
        piece = text[i:end]
        out = piece if opts.preserve_formatting else piece.strip()
        chunks.append(_Chunk(out, section.start + i, section.start + end))
        i += size
    return chunks


def _chunk_section(section: _Section, opts: ChunkingOptions) -> list[_Chunk]:
    paras = _para_boundaries(section.text)
    if len(paras) <= 1:
        sents = _sentence_boundaries(section.text)
        if len(sents) <= 1:
            return _chunk_by_words(section, opts)
        return _accumulate(section, sents, opts, " ", None)
    return _accumulate(section, paras, opts, "\n\n", section.protected)


def _apply_overlap(chunks: list[_Chunk], opts: ChunkingOptions) -> list[_Chunk]:
    """markdown.go:535-569: previous chunk's char suffix, word-aligned."""
    if len(chunks) <= 1 or not opts.overlap_size:
        return chunks
    out = [chunks[0]]
    for i in range(1, len(chunks)):
        prev = chunks[i - 1].text
        ov = prev[-opts.overlap_size:] if len(prev) > opts.overlap_size else prev
        idx = ov.rfind(" ")
        if idx > 0:
            ov = ov[idx + 1:]
        c = chunks[i]
        out.append(_Chunk(ov + " " + c.text, c.start, c.end))
    return out


def has_actual_content(content: str) -> bool:
    """markdown.go:931-987."""
    if not content:
        return False
    s = content.strip()
    if re.fullmatch(r"#{1,6}\s*", s) or re.fullmatch(r"[-=*]{3,}\s*", s):
        return False
    if re.fullmatch(r"\s*[-*+]\s*", s) or re.fullmatch(r"\s*\d+\.\s*", s):
        return False
    if re.fullmatch(r">\s*", s) or re.fullmatch(r"(```|~~~)\s*", s):
        return False
    cleaned = re.sub(r"[#\-=*+>~`\[\](){}|\\_]", "", content)
    cleaned = re.sub(r"\s+", " ", cleaned).strip()
    if len(cleaned) < 3:
        return False
    if re.fullmatch(r"[\s\d.,;:!?\-]*", cleaned):
        return False
    return True


def chunk_markdown_ast(
    content: str,
    options: ChunkingOptions | None = None,
    tokenizer_name: str = "regex",
) -> list[tuple[str, int, int]]:
    """ChunksDocument parity (markdown.go:1036-1071): returns
    [(content, token_size, order_index)] with order_index = the chunk's
    char START POSITION (markdown.go:1066) — callers sorting by
    order_index get document order; ids stay sparse exactly as the
    reference's do."""
    if not content:
        return []
    opts = options or ChunkingOptions()
    tok = get_tokenizer(tokenizer_name)

    if len(content) <= opts.max_chunk_size:
        text = content if opts.preserve_formatting else content.strip()
        chunks = [_Chunk(text, 0, len(content))]
    else:
        sections = _extract_sections(content, opts)
        if opts.header_hierarchy:
            sections = _merge_subsections(sections, content, opts)
        chunks = []
        for sec in sections:
            if len(sec.text) <= opts.max_chunk_size:
                text = sec.text if opts.preserve_formatting else sec.text.strip()
                chunks.append(_Chunk(text, sec.start, sec.end))
            else:
                chunks.extend(_chunk_section(sec, opts))
        chunks = _apply_overlap(chunks, opts)

    out = []
    for c in chunks:
        trimmed = c.text.strip()
        if not has_actual_content(trimmed):
            continue
        out.append((trimmed, tok.count(trimmed), c.start))
    return out
