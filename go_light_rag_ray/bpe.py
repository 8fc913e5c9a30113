"""Byte-pair-encoding tokenizer (reference T2, llm/bpetokenizer.go:36-195).

A real BPE implementation — pre-tokenize, byte-map, iterative lowest-rank
pair merging, vocab lookup — not a regex stand-in.  Mirrors the reference's
semantics exactly:

* pre-tokenization regex = the reference's Qwen-style pattern
  (bpetokenizer.go:77: contraction suffixes | letter runs | number runs |
  punctuation runs), with special tokens matched whole;
* byte mapping = ``chr(b)`` per input byte (bpetokenizer.go:174
  ``string(rune(b))``), with the standard GPT-2 ``bytes_to_unicode`` table
  available as ``byte_map="gpt2"`` for real HuggingFace ``merges.txt``
  vocabularies (the reference's DownloadTokenizer pulls exactly those
  files, bpetokenizer.go:198-204);
* merge loop = repeatedly find the present pair with the LOWEST merge rank
  and fuse every (left-to-right, non-overlapping) occurrence
  (bpetokenizer.go:101-146) — byte-identical tokenizations.

Loaders: ``from_files`` (vocab.json + merges.txt, the reference's format)
and ``from_tokenizer_json`` (a HuggingFace ``tokenizer.json``).  No
downloads — this sandbox is offline; point the loaders at vendored files.

Fits the engine's ``Tokenizer`` protocol (string tokens, lossless join) so
``Handler(tokenizer="bpe:<path>")`` drives the sliding-window chunker with
true BPE counts; ``encode_ids`` gives id-level parity with the reference's
``Encode``.
"""

from __future__ import annotations

import json
from functools import lru_cache
from typing import Sequence

import regex

# the reference's pre-tokenization pattern (bpetokenizer.go:77), Python
# regex syntax; case-insensitive contraction suffixes
_REFERENCE_PATTERN = r"(?i:'s|'t|'re|'ve|'m|'ll|'d)|[\p{L}]+|[\p{N}]+|[^\s\p{L}\p{N}]+"

# the reference's example special tokens (bpetokenizer.go:70-74, Qwen family)
REFERENCE_SPECIAL_TOKENS = {
    "<|endoftext|>": 151643,
    "<|im_start|>": 151644,
    "<|im_end|>": 151645,
}


@lru_cache(maxsize=1)
def gpt2_byte_map() -> dict[int, str]:
    """The GPT-2 ``bytes_to_unicode`` table (public domain algorithm used
    by every HF byte-level BPE): printable bytes map to themselves, the
    rest shift into U+0100.."""
    bs = (list(range(ord("!"), ord("~") + 1))
          + list(range(0xA1, 0xAD)) + list(range(0xAE, 0x100)))
    cs = bs[:]
    n = 0
    for b in range(256):
        if b not in bs:
            bs.append(b)
            cs.append(256 + n)
            n += 1
    return dict(zip(bs, map(chr, cs)))


class BPETokenizer:
    """Byte-level BPE with rank-ordered merges.

    ``vocab`` maps token string → id; ``merges`` is the ordered merge list
    (rank = position).  ``byte_map="charmap"`` is the reference's
    ``chr(b)`` mapping; ``"gpt2"`` the HF byte-level table.
    """

    def __init__(
        self,
        vocab: dict[str, int],
        merges: Sequence[tuple[str, str]],
        special_tokens: dict[str, int] | None = None,
        pattern: str = _REFERENCE_PATTERN,
        byte_map: str = "charmap",
    ) -> None:
        self.vocab = vocab
        self.ranks = {pair: i for i, pair in enumerate(merges)}
        self.special_tokens = dict(special_tokens or {})
        if self.special_tokens:
            alt = "|".join(regex.escape(t) for t in sorted(
                self.special_tokens, key=len, reverse=True))
            pattern = f"({alt})|{pattern}"
        self._compiled = regex.compile(pattern)
        if byte_map == "charmap":
            self._b2u = {b: chr(b) for b in range(256)}
        elif byte_map == "gpt2":
            self._b2u = gpt2_byte_map()
        else:
            raise ValueError(f"unknown byte_map {byte_map!r}")
        self._u2b = {u: b for b, u in self._b2u.items()}
        self._cache: dict[str, list[str]] = {}

    # ---- loaders -------------------------------------------------------

    @classmethod
    def from_files(
        cls, vocab_path: str, merges_path: str,
        special_tokens: dict[str, int] | None = None,
        byte_map: str = "charmap",
    ) -> "BPETokenizer":
        """vocab.json + merges.txt, the exact files the reference loads
        (bpetokenizer.go:37-64: first merges line is a header; each line
        is "left right", rank = line order)."""
        with open(vocab_path, encoding="utf-8") as f:
            vocab = json.load(f)
        merges: list[tuple[str, str]] = []
        with open(merges_path, encoding="utf-8") as f:
            for i, line in enumerate(f):
                if i == 0 or not line.strip():
                    continue  # header / blanks, like the reference
                parts = line.split()
                if len(parts) == 2:
                    merges.append((parts[0], parts[1]))
        if special_tokens is None:
            special_tokens = dict(REFERENCE_SPECIAL_TOKENS)
        return cls(vocab, merges, special_tokens, byte_map=byte_map)

    @classmethod
    def from_tokenizer_json(cls, path: str) -> "BPETokenizer":
        """A pinned HuggingFace ``tokenizer.json`` (model.type == "BPE").
        Uses the GPT-2 byte table — HF byte-level BPE vocabularies are
        written in it."""
        with open(path, encoding="utf-8") as f:
            spec = json.load(f)
        model = spec["model"]
        if model.get("type") not in (None, "BPE"):
            raise ValueError(f"unsupported model type {model.get('type')!r}")
        merges = []
        for m in model["merges"]:
            if isinstance(m, str):
                left, right = m.split(" ", 1)
            else:
                left, right = m
            merges.append((left, right))
        special = {t["content"]: t["id"]
                   for t in spec.get("added_tokens", []) if t.get("special")}
        return cls(model["vocab"], merges, special, byte_map="gpt2")

    # ---- core BPE ------------------------------------------------------

    def _bpe(self, piece: str) -> list[str]:
        """bpetokenizer.go:101-146: merge the lowest-rank present pair
        until none remains; occurrences fuse left-to-right."""
        cached = self._cache.get(piece)
        if cached is not None:
            return cached
        tokens = [self._b2u[b] for b in piece.encode("utf-8")]
        while len(tokens) >= 2:
            pairs = set(zip(tokens, tokens[1:]))
            best = min(
                (pair for pair in pairs if pair in self.ranks),
                key=self.ranks.__getitem__,
                default=None,
            )
            if best is None:
                break
            left, right = best
            out: list[str] = []
            i = 0
            while i < len(tokens):
                if (i < len(tokens) - 1 and tokens[i] == left
                        and tokens[i + 1] == right):
                    out.append(left + right)
                    i += 2
                else:
                    out.append(tokens[i])
                    i += 1
            tokens = out
        if len(self._cache) < (1 << 18):
            self._cache[piece] = tokens
        return tokens

    def _pieces(self, text: str, fill_gaps: bool = False) -> list[str]:
        """Pre-tokenize.  The reference pattern has no whitespace branch —
        ``preTokenize`` silently DROPS whitespace (bpetokenizer.go:149-156),
        fine for id counting but lossy.  ``fill_gaps=True`` re-inserts the
        unmatched runs as pieces so the chunker's decode-a-window path
        reproduces exact substrings."""
        if not fill_gaps:
            return [m.group() for m in self._compiled.finditer(text)]
        pieces: list[str] = []
        pos = 0
        for m in self._compiled.finditer(text):
            if m.start() > pos:
                pieces.append(text[pos:m.start()])
            pieces.append(m.group())
            pos = m.end()
        if pos < len(text):
            pieces.append(text[pos:])
        return pieces

    # ---- Tokenizer protocol (string tokens, used by the chunker) -------

    def encode(self, text: str) -> list[str]:
        out: list[str] = []
        for piece in self._pieces(text, fill_gaps=True):
            if piece in self.special_tokens:
                out.append(piece)
            else:
                out.extend(self._bpe(piece))
        return out

    def decode(self, tokens: Sequence[str]) -> str:
        buf = bytearray()
        parts: list[str] = []
        for t in tokens:
            if t in self.special_tokens:
                if buf:
                    parts.append(buf.decode("utf-8", errors="replace"))
                    buf = bytearray()
                parts.append(t)
            else:
                buf.extend(self._u2b[c] for c in t)
        if buf:
            parts.append(buf.decode("utf-8", errors="replace"))
        return "".join(parts)

    def count(self, text: str) -> int:
        return len(self.encode(text))

    # ---- id-level parity with the reference's Encode -------------------

    def encode_ids(self, text: str) -> list[int]:
        """bpetokenizer.go:157-190: special tokens bypass BPE; unknown
        merged tokens raise (the reference returns an error)."""
        ids: list[int] = []
        for piece in self._pieces(text):
            sid = self.special_tokens.get(piece)
            if sid is not None:
                ids.append(sid)
                continue
            for token in self._bpe(piece):
                tid = self.vocab.get(token)
                if tid is None:
                    raise KeyError(f"token not found in vocabulary: {token!r}")
                ids.append(tid)
        return ids
