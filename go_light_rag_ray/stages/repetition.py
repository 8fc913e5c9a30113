"""Gopher-style repetition signals per document.

The published web-corpus quality rules (Rae et al. 2021 "Scaling Language
Models: Methods, Analysis & Insights from Training Gopher" §A1.1; reused by
RefinedWeb / FineWeb) filter on REPETITION WITHIN a document: the fraction
of duplicated words and of duplicated n-grams, and the share taken by the
single most frequent word / n-gram.  These complement ``textstats.py``
(whose scores are shape-based, not repetition-based) and ``dedup.py``
(which is ACROSS documents).

Per-doc signals (all integer-derived ratios, 6-dp floor-rounded so the
DuckDB oracle reproduces them bit-exactly):

- ``dup_word_frac``   = (n_words − n_distinct_words) / n_words
- ``top_word_frac``   = top_word_count / n_words
- ``dup_bigram_frac`` = (n_bigrams − n_distinct_bigrams) / n_bigrams (0 when
  the doc has < 2 words)
- ``top_bigram_frac`` = top_bigram_count / n_bigrams (likewise 0)

Distributed shape: a stateless narrow ``map_batches`` — no shuffle, fuses
with the read.  The per-batch kernel is fully vectorized: one whitespace
split, one Arrow hash-count per (doc, word) and per (doc, bigram), then
``np.bincount`` / ``np.maximum.at`` segment reductions.  Zero-word
(empty/whitespace-only) docs emit no row, matching the SQL oracle's
group-by row set.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from .lm import _flat_words

__all__ = ["repetition_signals"]

# ASCII unit separator: cannot appear inside a whitespace-split word, so
# w1 + SEP + w2 is a collision-free bigram key (same char in the oracle).
_SEP = "\x1f"


def _per_doc_counts(flat: pa.Array, par: np.ndarray, n: int):
    """(total, distinct, top) occurrence counts per doc for one term stream.

    ``flat`` = term stream, ``par`` = parallel doc index per term.  One
    Arrow hash-aggregate over (doc, term) then numpy segment reductions —
    no per-group Python.
    """
    total = np.bincount(par, minlength=n).astype(np.int64)
    if len(par) == 0:
        zero = np.zeros(n, dtype=np.int64)
        return total, zero, zero
    tc = (
        pa.table({"p": pa.array(par, pa.int64()), "t": flat})
        .group_by(["p", "t"])
        .aggregate([("t", "count")])
    )
    p = tc.column("p").to_numpy(zero_copy_only=False).astype(np.int64)
    c = tc.column("t_count").to_numpy(zero_copy_only=False).astype(np.int64)
    distinct = np.bincount(p, minlength=n).astype(np.int64)
    top = np.zeros(n, dtype=np.int64)
    np.maximum.at(top, p, c)
    return total, distinct, top


def _frac(num: np.ndarray, den: np.ndarray) -> np.ndarray:
    # tie-stable 6-dp rounding: floor(x*1e6 + 0.5), the same op sequence as
    # the SQL oracle (np.round half-to-even diverges on dyadic ties)
    safe = np.maximum(den, 1)
    return np.floor(num.astype(np.float64) / safe * 1e6 + 0.5) / 1e6


def repetition_signals(
    docs: ray.data.Dataset, id_col: str = "doc_id", text_col: str = "text",
) -> ray.data.Dataset:
    """documents → per-doc word/bigram repetition statistics."""

    def signals(b: pa.Table) -> pa.Table:
        n = b.num_rows
        flat, par = _flat_words(b, text_col)
        n_words, n_distinct, top_word = _per_doc_counts(flat, par, n)

        # adjacent-pair bigrams within each doc (mask out doc boundaries)
        if len(par) >= 2:
            adj = par[1:] == par[:-1]
            w1 = flat.slice(0, len(flat) - 1)
            w2 = flat.slice(1)
            bigrams = pc.binary_join_element_wise(w1, w2, _SEP)
            keep = pa.array(adj)
            bigrams = bigrams.filter(keep)
            bpar = par[1:][adj]
        else:
            bigrams, bpar = pa.array([], pa.string()), np.empty(0, np.int64)
        n_bi, n_bi_distinct, top_bi = _per_doc_counts(bigrams, bpar, n)

        out = pa.Table.from_pydict({
            "doc_id": b.column(id_col),
            "n_words": pa.array(n_words),
            "n_distinct_words": pa.array(n_distinct),
            "top_word_count": pa.array(top_word),
            "n_bigrams": pa.array(n_bi),
            "n_distinct_bigrams": pa.array(n_bi_distinct),
            "top_bigram_count": pa.array(top_bi),
            "dup_word_frac": pa.array(_frac(n_words - n_distinct, n_words)),
            "top_word_frac": pa.array(_frac(top_word, n_words)),
            "dup_bigram_frac": pa.array(_frac(n_bi - n_bi_distinct, n_bi)),
            "top_bigram_frac": pa.array(_frac(top_bi, n_bi)),
        })
        return out.filter(pa.array(n_words > 0))

    return docs.map_batches(signals, batch_format="pyarrow")
