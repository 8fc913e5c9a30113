"""Go source chunker with real top-level parsing (reference handler/go.go:44-166).

The reference parses Go with ``go/parser`` and emits:

* ONE header chunk: lines 1 .. (last import spec line + 1)  — or just
  line 1 when there are no imports (go.go:55-75);
* per ``func`` decl: ``package X\n\n`` + doc-comment text + the decl's
  source lines (go.go:83-106);
* per spec of a ``type`` decl: the same chunk REPEATED once per spec —
  the reference's ``for range d.Specs`` loop re-emits the whole decl
  range (go.go:109-134); reproduced faithfully;
* per ``const`` / ``var`` decl: ``package X\n\n`` + decl lines, NO doc
  comment (go.go:135-155);
* an error for invalid Go (go_test.go:21-28: empty content and
  non-Go text must fail).

No ``go/parser`` here, so parsing is a real scanner, not a line regex: a
character-level lexer blanks comments / interpreted strings / raw strings /
runes (tracking line numbers), then declarations are delimited by bracket
depth with semicolon-insertion-aware line continuation.  Handles multi-line
signatures, methods with receivers, nested braces in composite literals,
``//`` and ``/* */`` comments, and backquoted raw strings containing
braces — everything the old line-anchored regex missed.
"""

from __future__ import annotations

import re

from ..tokenizer import get_tokenizer

__all__ = ["GoParseError", "chunk_go"]


class GoParseError(ValueError):
    """Invalid Go source (the reference returns parser errors, go.go:48-50)."""


_DECL_RE = re.compile(r"^(func|type|const|var|import)\b")
_IDENT_RE = re.compile(r"^[A-Za-z_]")
# a line whose cleaned form ends with one of these continues onto the next
# line (Go's semicolon-insertion: no implicit ';' after a binary operator,
# comma, dot or opening delimiter)
_CONTINUation_RE = re.compile(r"[+\-*/%&|^<>=,.(\[{:]$|&&$|\|\|$")


def _clean_lines(content: str) -> list[str]:
    """Blank out comment and string interiors, preserving line structure
    and delimiters; raise GoParseError on unterminated constructs."""
    out: list[list[str]] = [[]]
    i, n = 0, len(content)
    state = "code"  # code | line_comment | block_comment | dq | raw | rune
    while i < n:
        c = content[i]
        nxt = content[i + 1] if i + 1 < n else ""
        if c == "\n":
            if state == "line_comment":
                state = "code"
            out.append([])
            i += 1
            continue
        if state == "code":
            if c == "/" and nxt == "/":
                state = "line_comment"
                out[-1].append("\x01")  # comment marker (for doc scanning)
                i += 2
                continue
            if c == "/" and nxt == "*":
                state = "block_comment"
                out[-1].append("\x01")
                i += 2
                continue
            if c == '"':
                state = "dq"
                out[-1].append('"')
                i += 1
                continue
            if c == "`":
                state = "raw"
                out[-1].append('"')
                i += 1
                continue
            if c == "'":
                state = "rune"
                out[-1].append('"')
                i += 1
                continue
            out[-1].append(c)
            i += 1
            continue
        if state == "line_comment":
            i += 1
            continue
        if state == "block_comment":
            if c == "*" and nxt == "/":
                state = "code"
                i += 2
            else:
                if c == "\n":
                    out.append([])
                i += 1
            continue
        if state in ("dq", "rune"):
            if c == "\\":
                i += 2
                continue
            if (state == "dq" and c == '"') or (state == "rune" and c == "'"):
                out[-1].append('"')
                state = "code"
            i += 1
            continue
        if state == "raw":
            if c == "`":
                out[-1].append('"')
                state = "code"
            i += 1
            continue
    if state in ("block_comment", "dq", "raw"):
        raise GoParseError(f"unterminated {state} at end of file")
    return ["".join(line) for line in out]


def _comment_text(raw_lines: list[str]) -> str:
    """ast.CommentGroup.Text() approximation: markers stripped, one
    leading space dropped, directive comments (``//go:...``) omitted,
    trailing newline (go/ast/comment.go semantics)."""
    texts: list[str] = []
    in_block = False
    for ln in raw_lines:
        s = ln.strip()
        if in_block:
            body = s[:-2].rstrip() if s.endswith("*/") else s
            if body.startswith("*"):
                body = body[1:]
            if body.startswith(" "):
                body = body[1:]
            texts.append(body)
            if s.endswith("*/"):
                in_block = False
            continue
        if s.startswith("//"):
            body = s[2:]
            if re.match(r"^[a-z0-9]+:[^ ]", body):
                continue  # directive comment, dropped by Text()
            if body.startswith(" "):
                body = body[1:]
            texts.append(body)
        elif s.startswith("/*"):
            body = s[2:]
            if body.endswith("*/"):
                body = body[:-2]
                if body.startswith(" "):
                    body = body[1:]
                texts.append(body.rstrip())
            else:
                if body.startswith(" "):
                    body = body[1:]
                texts.append(body)
                in_block = True
    while texts and not texts[0].strip():
        texts.pop(0)
    while texts and not texts[-1].strip():
        texts.pop()
    return "\n".join(texts) + "\n" if texts else ""


def _depth_delta(clean_line: str) -> int:
    return (clean_line.count("{") + clean_line.count("(") + clean_line.count("[")
            - clean_line.count("}") - clean_line.count(")")
            - clean_line.count("]"))


def parse_go(content: str):
    """→ (package_name, import_end_line, decls); decls are
    (kind, start_line, end_line, n_specs, doc_lines) with 1-based
    inclusive line numbers, source order.  Raises GoParseError."""
    if not content.strip():
        raise GoParseError("empty content")
    clean = _clean_lines(content)
    raw = content.split("\n")

    # package clause must be the first code token (parser.ParseFile errors
    # otherwise)
    package_name = None
    for ln in clean:
        s = ln.strip()
        if not s or s == "\x01" or s.startswith("\x01"):
            continue
        m = re.match(r"^package\s+([A-Za-z_]\w*)\s*$", s.replace("\x01", "").strip())
        if not m:
            raise GoParseError("expected package clause")
        package_name = m.group(1)
        break
    if package_name is None:
        raise GoParseError("expected package clause")

    depth = 0
    decls: list[tuple[str, int, int, int, list[str]]] = []
    import_end = 0
    i = 0
    n = len(clean)
    while i < n:
        stripped = clean[i].replace("\x01", "").strip()
        m = _DECL_RE.match(stripped) if depth == 0 else None
        if not m:
            depth += _depth_delta(clean[i])
            if depth < 0:
                raise GoParseError(f"unbalanced delimiter at line {i + 1}")
            i += 1
            continue
        kind = m.group(1)
        start = i
        # consume the declaration: until depth returns to 0 at a line that
        # does not continue
        d = 0
        j = i
        n_specs = 0
        grouped = False
        while j < n:
            cl = clean[j].replace("\x01", "")
            d_before = d
            d += _depth_delta(cl)
            if d < 0:
                raise GoParseError(f"unbalanced delimiter at line {j + 1}")
            s = cl.strip()
            if kind == "import" and '"' in s:
                import_end = j + 1
            if kind == "type":
                if j == start:
                    # grouped iff "(" directly follows the keyword:
                    # ``type (`` vs ``type Handler func(...)``
                    grouped = bool(re.match(r"^type\s*\(", s))
                    if not grouped:
                        n_specs = 1
                elif grouped and d_before == 1 and _IDENT_RE.match(s):
                    n_specs += 1  # spec line at group level (not nested)
            if d == 0 and not _CONTINUation_RE.search(s):
                break
            j += 1
        if j >= n:
            raise GoParseError("unexpected end of file in declaration")
        end = j
        # doc comment: contiguous comment-only lines directly above
        doc_start = start
        while doc_start > 0 and clean[doc_start - 1].strip().startswith("\x01"):
            doc_start -= 1
        doc_lines = raw[doc_start:start] if doc_start < start else []
        if kind != "import":
            decls.append((kind, start + 1, end + 1, max(1, n_specs), doc_lines))
        depth = 0
        i = end + 1
    if depth != 0:
        raise GoParseError("unbalanced delimiters at end of file")
    return package_name, import_end, decls


def _lines_between(content: str, start: int, end: int) -> str:
    """getCodeBetweenLines (go.go:21-31): 1-based inclusive, clamped."""
    lines = content.split("\n")
    start = max(start, 1)
    end = min(end, len(lines))
    return "\n".join(lines[start - 1:end])


def chunk_go(content: str, tokenizer_name: str = "regex") -> list[tuple[str, int, int]]:
    """ChunksDocument parity (go.go:44-166): header chunk, then one chunk
    per func / type-spec / const / var decl, package-prefixed; type chunks
    carry the doc comment, const/var do not (the reference's asymmetry).
    Returns [(content, token_size, order_index)].  Raises GoParseError on
    invalid Go."""
    tok = get_tokenizer(tokenizer_name)
    package_name, import_end, decls = parse_go(content)

    chunks: list[tuple[str, int, int]] = []
    order = 0
    header = _lines_between(content, 1, import_end + 1)
    if header:
        chunks.append((header, tok.count(header), order))
        order += 1
    prefix = f"package {package_name}\n\n"
    for kind, start, end, n_specs, doc_lines in decls:
        code = _lines_between(content, start, end)
        if kind == "func":
            text = prefix + _comment_text(doc_lines) + code
            chunks.append((text, tok.count(text), order))
            order += 1
        elif kind == "type":
            text = prefix + _comment_text(doc_lines) + code
            for _ in range(n_specs):  # go.go:112 ``for range d.Specs``
                chunks.append((text, tok.count(text), order))
                order += 1
        else:  # const / var: no doc comment (go.go:135-155)
            text = prefix + code
            chunks.append((text, tok.count(text), order))
            order += 1
    return chunks
