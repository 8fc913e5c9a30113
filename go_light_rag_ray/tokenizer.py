"""Hermetic deterministic tokenizers.

The reference chunks with the tiktoken GPT-4o (o200k_base) tokenizer
(reference internal/helper.go:39-72: EncodeStringByTiktoken /
DecodeTokensByTiktoken / CountTokens).  This sandbox has no network and no
``tiktoken`` wheel, so we implement the *tokenizer protocol* the chunker
needs — ``encode`` → sequence of tokens, ``decode`` of any token slice →
string, ``count`` — hermetically:

* ``RegexTokenizer`` pre-tokenizes with the public o200k_base
  pre-tokenization regex (from the public tiktoken source); each pre-token
  piece is one "token".  Counts are in the same ballpark as real BPE
  (~1 token per word/punctuation run) and the chunker *semantics*
  (window / stride / trim / recount, reference handler/default.go:53-96)
  are exactly preserved regardless of vocabulary (SURVEY.md §7.0).
* ``WhitespaceTokenizer`` treats each ``\\S+`` run (with trailing
  whitespace) as one token.  Used for the DuckDB-oracle-checked pipelines
  over the word-bag testdata, because its count is SQL-expressible
  (``len(regexp_extract_all(text, '\\S+'))``).

Both are *lossless*: ``"".join(encode(s)) == s`` for every input, so
decoding a token-ID window slice reproduces the exact substring, as
tiktoken does.
"""

from __future__ import annotations

from typing import Protocol, Sequence

import regex

# Public o200k_base pre-tokenization pattern (tiktoken, MIT license).
_O200K_PATTERN = "|".join(
    [
        r"[^\r\n\p{L}\p{N}]?[\p{Lu}\p{Lt}\p{Lm}\p{Lo}\p{M}]*[\p{Ll}\p{Lm}\p{Lo}\p{M}]+(?i:'s|'t|'re|'ve|'m|'ll|'d)?",
        r"[^\r\n\p{L}\p{N}]?[\p{Lu}\p{Lt}\p{Lm}\p{Lo}\p{M}]+[\p{Ll}\p{Lm}\p{Lo}\p{M}]*(?i:'s|'t|'re|'ve|'m|'ll|'d)?",
        r"\p{N}{1,3}",
        r" ?[^\s\p{L}\p{N}]+[\r\n/]*",
        r"\s*[\r\n]+",
        r"\s+(?!\S)",
        r"\s+",
    ]
)


class Tokenizer(Protocol):
    """Tokenizer protocol used by the chunker (reference T1/T2, SURVEY §2.3)."""

    def encode(self, text: str) -> list[str]: ...

    def decode(self, tokens: Sequence[str]) -> str: ...

    def count(self, text: str) -> int: ...


class _PieceTokenizer:
    """Base: regex-piece tokenizer, lossless by gap-filling."""

    _compiled: "regex.Pattern[str]"

    def encode(self, text: str) -> list[str]:
        if not text:
            return []
        # findall runs the match loop in C and returns the pieces directly
        # (the pattern has no capturing groups) — ~2× the per-doc speed of
        # finditer + match-object field access, with far less allocation
        # traffic (this is the flagship chunker's hottest kernel).  The
        # patterns cover every character class, so gaps never occur in
        # practice; the total-length check PROVES losslessness per call
        # and falls back to the gap-filling walk if it ever fails.
        pieces = self._compiled.findall(text)
        if sum(map(len, pieces)) == len(text):
            return pieces
        pieces = []
        pos = 0
        for m in self._compiled.finditer(text):
            if m.start() > pos:  # gap: keep losslessness
                pieces.append(text[pos : m.start()])
            pieces.append(m.group())
            pos = m.end()
        if pos < len(text):
            pieces.append(text[pos:])
        return pieces

    @staticmethod
    def decode(tokens: Sequence[str]) -> str:
        return "".join(tokens)

    def count(self, text: str) -> int:
        return len(self.encode(text))


class RegexTokenizer(_PieceTokenizer):
    """o200k-style pre-token tokenizer (default, mirrors reference T1)."""

    def __init__(self) -> None:
        self._compiled = regex.compile(_O200K_PATTERN)


class WhitespaceTokenizer(_PieceTokenizer):
    """One token per ``\\S+`` run; count is SQL-expressible for oracles."""

    def __init__(self) -> None:
        self._compiled = regex.compile(r"\S+\s*|\s+")


_DEFAULT: RegexTokenizer | None = None


def default_tokenizer() -> RegexTokenizer:
    """Process-wide shared instance (cheap, but avoids recompiling)."""
    global _DEFAULT
    if _DEFAULT is None:
        _DEFAULT = RegexTokenizer()
    return _DEFAULT


def get_tokenizer(name: str) -> Tokenizer:
    """``regex`` | ``whitespace`` | ``bpe:<tokenizer.json>`` |
    ``bpe:<vocab.json>:<merges.txt>[:<byte_map>]`` (real BPE, see ``bpe.py``;
    byte_map ∈ {charmap, gpt2} — GPT-2-format vocab/merges files are written
    in the bytes_to_unicode alphabet, so pass ``gpt2`` for those; paths must
    be readable on every worker node — ship vendored files, not /tmp)."""
    if name == "regex":
        return RegexTokenizer()
    if name == "whitespace":
        return WhitespaceTokenizer()
    if name.startswith("bpe:"):
        from .bpe import BPETokenizer

        paths = name[4:].split(":")
        if len(paths) == 1:
            return BPETokenizer.from_tokenizer_json(paths[0])
        if len(paths) == 2:
            return BPETokenizer.from_files(paths[0], paths[1])
        if len(paths) == 3 and paths[2] in ("charmap", "gpt2"):
            return BPETokenizer.from_files(paths[0], paths[1],
                                           byte_map=paths[2])
        raise ValueError(f"bad bpe tokenizer spec {name!r}")
    raise ValueError(f"unknown tokenizer {name!r}")
