"""Distributed BPE tokenizer training.

The reference *loads* pretrained BPE vocabularies (bpetokenizer.go); a
training-data engine must also be able to FIT one on its own corpus.  BPE
training is the canonical two-phase 100 TB job:

1. **distributed**: the corpus-wide word-frequency table — the token
   stream never leaves the workers; per-batch Arrow hash-count partials
   shuffle at vocabulary (not token) cardinality (``lm.word_freq_model``,
   the same combiner the unigram LM uses).  This is also how HF tokenizers
   / sentencepiece structure training: everything after the word counter
   is a function of that (small) table.
2. **driver**: the greedy merge loop over the capped word-freq table —
   O(vocab) state, deterministic tie-break (count desc, pair lex asc),
   incremental pair-count maintenance (only words containing the merged
   pair are touched per round, via a pair→words index).

``byte_pair_counts`` is the oracled distributed kernel: adjacent
byte-pair frequencies over the corpus word stream, computed ZERO-COPY
from the Arrow string buffers (the concatenated word bytes + offsets —
no per-word Python, no join) — merge 0 of the trainer, and a corpus
statistic in its own right (alphabet bigram profile).  ASCII corpus ⇒
byte pairs == char pairs == the oracle's ``substring(w, i, 2)``.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data
import ray.data.aggregate as agg

from .lm import _flat_words, word_freq_model

__all__ = ["byte_pair_counts", "train_bpe", "trained_tokenizer"]


def _pair_partial(flat: pa.Array) -> tuple[np.ndarray, np.ndarray]:
    """(distinct uint16 byte-pairs, counts) over a flat word array —
    straight off the Arrow buffers: data = every word concatenated,
    offsets = word boundaries; a pair is invalid iff it straddles one."""
    arr = flat.combine_chunks() if isinstance(flat, pa.ChunkedArray) else flat
    if len(arr) == 0:
        return np.empty(0, np.uint16), np.empty(0, np.int64)
    odt = np.int64 if pa.types.is_large_string(arr.type) else np.int32
    off = np.frombuffer(arr.buffers()[1], odt)[
        arr.offset: arr.offset + len(arr) + 1].astype(np.int64)
    data = np.frombuffer(arr.buffers()[2], np.uint8)[off[0]: off[-1]]
    off = off - off[0]
    n = len(data)
    if n < 2:
        return np.empty(0, np.uint16), np.empty(0, np.int64)
    pairs = (data[:-1].astype(np.uint16) << np.uint16(8)) | data[1:]
    valid = np.ones(n - 1, dtype=bool)
    starts = off[1:-1]  # positions where a new word begins
    starts = starts[(starts > 0) & (starts < n)]
    valid[starts - 1] = False  # (last byte of word i, first of word i+1)
    u, c = np.unique(pairs[valid], return_counts=True)
    return u, c.astype(np.int64)


def _decode_pairs(u: np.ndarray) -> list[str]:
    raw = np.column_stack(
        [(u >> 8).astype(np.uint8), (u & 0xFF).astype(np.uint8)]
    ).tobytes()
    return [raw[2 * i: 2 * i + 2].decode("latin-1") for i in range(len(u))]


def byte_pair_counts(
    docs: ray.data.Dataset, k: int = 20, text_col: str = "text",
) -> ray.data.Dataset:
    """→ (rank 1..k, pair, cnt): the corpus's k most frequent adjacent
    byte pairs within whitespace words, ties broken by ascending pair —
    BPE's merge-0 candidate list."""

    def partial(b: pa.Table) -> pa.Table:
        flat, _ = _flat_words(b, text_col)
        u, c = _pair_partial(flat)
        return pa.table({
            "pair": pa.array(_decode_pairs(u), pa.string()),
            "c": pa.array(c, pa.int64()),
        })

    counts = (
        docs.map_batches(partial, batch_format="pyarrow")
        .groupby("pair")
        .aggregate(agg.Sum("c", alias_name="cnt"))
    )
    top = counts.sort(["cnt", "pair"], descending=[True, False]).limit(k)

    def rank_block(b: pa.Table) -> pa.Table:
        return pa.table({
            "rank": pa.array(np.arange(1, b.num_rows + 1, dtype=np.int32),
                             pa.int32()),
            "pair": b.column("pair"),
            "cnt": pc.cast(b.column("cnt"), pa.int64()),
        })

    return top.repartition(1).map_batches(
        rank_block, batch_format="pyarrow", batch_size=None)


def train_bpe(
    docs: ray.data.Dataset,
    num_merges: int = 100,
    top_vocab: int = 50_000,
    text_col: str = "text",
) -> list[tuple[str, str]]:
    """Fit ``num_merges`` BPE merges on the corpus.  Phase 1 distributed
    (word-frequency table, capped at ``top_vocab`` by count desc / word
    asc — the same cap rule as the unigram LM); phase 2 the greedy driver
    loop.  Returns the rank-ordered merge list — the exact format
    ``bpe.BPETokenizer`` consumes.
    """
    wf = word_freq_model(docs, text_col=text_col, top_vocab=top_vocab)
    words = [list(w) for w in wf.column("word").to_pylist()]
    freqs = wf.column("c").to_numpy(zero_copy_only=False)
    return _merge_loop(words, freqs, num_merges)


def _merge_loop(
    words: list[list[str]], freqs, num_merges: int,
) -> list[tuple[str, str]]:
    """Greedy BPE over (symbol-list, freq) rows with incremental
    pair-count maintenance.  Tie-break: max count, then lexicographically
    smallest pair — fully deterministic (tested against a brute-force
    recount reference)."""
    pair_counts: dict[tuple[str, str], int] = {}
    pair_words: dict[tuple[str, str], set[int]] = {}
    for wi, (syms, f) in enumerate(zip(words, freqs)):
        f = int(f)
        for a, b in zip(syms, syms[1:]):
            pair_counts[(a, b)] = pair_counts.get((a, b), 0) + f
            pair_words.setdefault((a, b), set()).add(wi)

    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        if not pair_counts:
            break
        best_n = max(pair_counts.values())
        if best_n <= 0:
            break
        best = min(p for p, n in pair_counts.items() if n == best_n)
        merges.append(best)
        tok = best[0] + best[1]
        for wi in sorted(pair_words.get(best, ())):
            syms, f = words[wi], int(freqs[wi])
            # retract the word's current pairs …
            for p in zip(syms, syms[1:]):
                pair_counts[p] -= f
                if pair_counts[p] <= 0:
                    del pair_counts[p]
                ws = pair_words.get(p)
                if ws is not None:
                    ws.discard(wi)
                    if not ws:
                        del pair_words[p]
            # … apply the merge (leftmost-first, like the apply loop) …
            out: list[str] = []
            i = 0
            while i < len(syms):
                if (i + 1 < len(syms)
                        and syms[i] == best[0] and syms[i + 1] == best[1]):
                    out.append(tok)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            words[wi] = out
            # … and re-add the new pairs
            for p in zip(out, out[1:]):
                pair_counts[p] = pair_counts.get(p, 0) + f
                pair_words.setdefault(p, set()).add(wi)
    return merges


def trained_tokenizer(merges: list[tuple[str, str]]):
    """Wrap trained merges in a ``bpe.BPETokenizer`` (charmap byte table —
    training symbols ARE chars here).  Vocab = 256 byte tokens + one token
    per merge, ids in that order (the standard BPE id layout)."""
    from ..bpe import BPETokenizer

    vocab = {chr(b): b for b in range(256)}
    for a, b in merges:
        vocab.setdefault(a + b, len(vocab))
    return BPETokenizer(vocab, merges, special_tokens={},
                        byte_map="charmap")
