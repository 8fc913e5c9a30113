"""Corpus-trained unigram language-model scoring (train → broadcast → score).

The missing member of the text-quality family (textstats.py scores are all
per-document): KenLM-style perplexity filtering needs a model TRAINED ON
THE CORPUS then applied to every document.  Hermetically (no KenLM in this
container) the model is the exact unigram frequency table, and the score is
the document's mean token corpus-frequency — the monotone core of unigram
log-likelihood without transcendentals, so the DuckDB oracle can reproduce
it bit-exactly (integer sums, one double division, 6-dp round).

Distributed shape (the 100 TB pattern):

1. TRAIN — per-batch Arrow hash-count partials (the combiner), ONE small
   ``groupby(word).sum`` shuffle → the model table.  ``top_vocab`` > 0
   keeps only the most frequent words (ties break lexicographically) so
   the broadcast stays bounded at web scale — a production LM's vocab cap;
   0 = exact (oracle mode).  Out-of-vocab tokens score 0.
2. BROADCAST — the model ships once via ``ray.put``; every scorer actor
   rebuilds (vocab array, counts array) in ``__init__``.
3. SCORE — per batch: ``ascii_split_whitespace`` → flat word stream,
   ``index_in`` against the vocab, ``np.bincount`` segment sums per doc.
   No joins, no per-row Python.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data
import ray.data.aggregate as agg

from ..pool import auto_pool

__all__ = ["word_freq_model", "unigram_score",
           "bigram_freq_model", "bigram_score",
           "importance_weights"]

# ASCII unit separator joins (w1, w2) into one collision-free key: it can't
# appear inside a whitespace-split word.  The SQL oracle uses chr(31).
_SEP = "\x1f"


def _materialize_model(
    counts: ray.data.Dataset, key_col: str, top_vocab: int,
) -> pa.Table:
    """counts (post-groupby: globally-distinct keys) → model table.

    ``top_vocab`` > 0 trims INSIDE the dataset: per-block partial top-k
    (valid only because each key appears in exactly one row after the
    global groupby) then one bounded merge task — the driver never holds
    more than ``top_vocab`` rows, so a web-scale bigram vocabulary can't
    OOM it.  0 = exact mode: the whole vocabulary IS the model (the
    deliberately small broadcast side)."""

    def blk_topk(b: pa.Table) -> pa.Table:
        if b.num_rows <= top_vocab:
            return b
        return b.sort_by([("c", "descending"), (key_col, "ascending")]
                         ).slice(0, top_vocab)

    if top_vocab:
        counts = (
            counts.map_batches(blk_topk, batch_format="pyarrow",
                               batch_size=None)
            .repartition(1)
            .map_batches(blk_topk, batch_format="pyarrow", batch_size=None)
        )
    rows = counts.take_all()
    model = pa.table({
        key_col: pa.array([r[key_col] for r in rows], pa.string()),
        "c": pa.array([r["c"] for r in rows], pa.int64()),
    })
    return model.sort_by(key_col)


def _flat_words(batch: pa.Table, text_col: str):
    # ascii (not utf8) split: pc.utf8_split_whitespace misclassified a
    # space under concurrent first use inside Ray workers ("   " →
    # ['', ' '] — a thread race in the lazy unicode-table init; observed
    # ~25% of fresh-worker runs 2026-08-18).  The corpus and the oracle's
    # \S+ are ASCII, so the ascii kernel is also the semantically exact one.
    words = pc.ascii_split_whitespace(
        pc.cast(batch.column(text_col), pa.string())).combine_chunks()
    flat_all = pc.list_flatten(words)
    lens = pc.list_value_length(words).to_numpy(zero_copy_only=False)
    lens = np.nan_to_num(lens).astype(np.int64)
    par_all = np.repeat(np.arange(batch.num_rows), lens)
    keep = np.nonzero(
        pc.not_equal(flat_all, "").to_numpy(zero_copy_only=False))[0]
    return flat_all.take(pa.array(keep)), par_all[keep]


def word_freq_model(
    docs: ray.data.Dataset, text_col: str = "text", top_vocab: int = 0,
) -> pa.Table:
    """Train the unigram model: (word, c) counts over the corpus.

    Partial counts inside ``map_batches`` (≤1 row per distinct word per
    batch) keep the shuffle at vocabulary size, not token count.  The
    result is MATERIALIZED (it is the model — the deliberately small side).
    """

    def partial(b: pa.Table) -> pa.Table:
        flat, _ = _flat_words(b, text_col)
        t = pa.table({"word": flat}).group_by("word").aggregate(
            [("word", "count")])
        return pa.table({"word": t.column("word"),
                         "c": pc.cast(t.column("word_count"), pa.int64())})

    counts = (
        docs.map_batches(partial, batch_format="pyarrow")
        .groupby("word")
        .aggregate(agg.Sum("c", alias_name="c"))
    )
    return _materialize_model(counts, "word", top_vocab)


class UnigramScorer:
    """Actor-pool stage: documents → corpus-frequency scores.

    Per-actor state: the broadcast model rebuilt once from the object
    store.  Returns (doc_id, n_tokens, sum_freq, oov_count,
    mean_token_freq) with mean = round(sum_freq / n_tokens, 6) — an
    integer-derived ratio, bit-exact vs the SQL oracle."""

    def __init__(self, model_ref, id_col: str = "doc_id",
                 text_col: str = "text") -> None:
        model = ray.get(model_ref)
        self.vocab = model.column("word").combine_chunks()
        self.counts = model.column("c").to_numpy()
        self.id_col = id_col
        self.text_col = text_col

    def __call__(self, b: pa.Table) -> pa.Table:
        flat, par = _flat_words(b, self.text_col)
        idx = pc.index_in(flat, self.vocab).to_numpy(zero_copy_only=False)
        known = ~np.isnan(idx) if idx.dtype.kind == "f" else idx >= 0
        freqs = np.zeros(len(par), dtype=np.int64)
        if known.any():
            freqs[known] = self.counts[idx[known].astype(np.int64)]
        n = b.num_rows
        n_tokens = np.bincount(par, minlength=n).astype(np.int64)
        sum_freq = np.bincount(par, weights=freqs, minlength=n).astype(np.int64)
        oov = np.bincount(par[~known], minlength=n).astype(np.int64)
        safe = np.maximum(n_tokens, 1)
        # tie-stable 6-dp rounding (floor(x*1e6+0.5), same op sequence as
        # the SQL oracle — np.round half-to-even diverges on dyadic ties)
        mean = np.floor(sum_freq.astype(np.float64) / safe * 1e6 + 0.5) / 1e6
        out = pa.Table.from_pydict({
            "doc_id": b.column(self.id_col),
            "n_tokens": pa.array(n_tokens),
            "sum_freq": pa.array(sum_freq),
            "oov_count": pa.array(oov),
            "mean_token_freq": pa.array(mean),
        })
        # zero-token (empty/whitespace-only) docs: the SQL oracle's
        # join+group-by emits no row for them — match that row set.
        return out.filter(pa.array(n_tokens > 0))


def _flat_bigrams(batch: pa.Table, text_col: str):
    """Adjacent-pair bigram stream + parallel doc index (doc-boundary
    masked), as joined strings — same construction as the SQL oracle's
    ``a.w || chr(31) || b.w``."""
    flat, par = _flat_words(batch, text_col)
    if len(par) < 2:
        return pa.array([], pa.string()), np.empty(0, np.int64)
    adj = par[1:] == par[:-1]
    w1 = flat.slice(0, len(flat) - 1)
    w2 = flat.slice(1)
    bigrams = pc.binary_join_element_wise(w1, w2, _SEP).filter(pa.array(adj))
    return bigrams, par[1:][adj]


def bigram_freq_model(
    docs: ray.data.Dataset, text_col: str = "text", top_vocab: int = 0,
) -> pa.Table:
    """Train the bigram model: (bigram, c) counts over the corpus — the
    same combiner → one-small-shuffle → materialized-model shape as
    ``word_freq_model`` (the broadcast side stays O(vocab²∩seen), and
    ``top_vocab`` caps it for web-scale corpora; 0 = exact, oracle mode)."""

    def partial(b: pa.Table) -> pa.Table:
        flat, _ = _flat_bigrams(b, text_col)
        if len(flat) == 0:
            return pa.table({"bigram": pa.array([], pa.string()),
                             "c": pa.array([], pa.int64())})
        t = pa.table({"bigram": flat}).group_by("bigram").aggregate(
            [("bigram", "count")])
        return pa.table({"bigram": t.column("bigram"),
                         "c": pc.cast(t.column("bigram_count"), pa.int64())})

    counts = (
        docs.map_batches(partial, batch_format="pyarrow")
        .groupby("bigram")
        .aggregate(agg.Sum("c", alias_name="c"))
    )
    return _materialize_model(counts, "bigram", top_vocab)


class BigramScorer:
    """Actor-pool stage: documents → corpus bigram-frequency scores.

    (doc_id, n_bigrams, sum_freq, oov_count, mean_bigram_freq); mean is an
    integer-derived ratio with tie-stable 6-dp rounding.  Docs with < 2
    words emit no row (the SQL oracle's join+group-by row set)."""

    def __init__(self, model_ref, id_col: str = "doc_id",
                 text_col: str = "text") -> None:
        model = ray.get(model_ref)
        self.vocab = model.column("bigram").combine_chunks()
        self.counts = model.column("c").to_numpy()
        self.id_col = id_col
        self.text_col = text_col

    def __call__(self, b: pa.Table) -> pa.Table:
        flat, par = _flat_bigrams(b, self.text_col)
        n = b.num_rows
        idx = pc.index_in(flat, self.vocab).to_numpy(zero_copy_only=False)
        known = ~np.isnan(idx) if idx.dtype.kind == "f" else idx >= 0
        freqs = np.zeros(len(par), dtype=np.int64)
        if known.any():
            freqs[known] = self.counts[idx[known].astype(np.int64)]
        n_bi = np.bincount(par, minlength=n).astype(np.int64)
        sum_freq = np.bincount(par, weights=freqs, minlength=n).astype(np.int64)
        oov = np.bincount(par[~known], minlength=n).astype(np.int64)
        safe = np.maximum(n_bi, 1)
        mean = np.floor(sum_freq.astype(np.float64) / safe * 1e6 + 0.5) / 1e6
        out = pa.Table.from_pydict({
            "doc_id": b.column(self.id_col),
            "n_bigrams": pa.array(n_bi),
            "sum_freq": pa.array(sum_freq),
            "oov_count": pa.array(oov),
            "mean_bigram_freq": pa.array(mean),
        })
        return out.filter(pa.array(n_bi > 0))


def bigram_score(
    docs: ray.data.Dataset,
    model: pa.Table | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    top_vocab: int = 0,
    concurrency: int | tuple[int, int] | None = None,
) -> ray.data.Dataset:
    """Two-pass bigram-LM scoring: train (unless ``model`` given), then
    broadcast + score.  The bigram member of the KenLM-shaped family."""
    if model is None:
        model = bigram_freq_model(docs, text_col, top_vocab)
    model_ref = ray.put(model)
    return docs.map_batches(
        BigramScorer,
        fn_constructor_kwargs={"model_ref": model_ref, "id_col": id_col,
                               "text_col": text_col},
        batch_format="pyarrow",
        concurrency=auto_pool(concurrency),
    )


class _ImportanceScorer:
    """Actor-pool stage: documents → DSIR-style importance signals.

    Holds BOTH broadcast models (target + raw); per batch computes the
    integer token-frequency sums under each and the per-doc ratio
    weight = floor(sum_target / sum_raw · 1e6 + 0.5) / 1e6 — one division,
    tie-stable rounding, bit-exact vs the SQL oracle."""

    def __init__(self, target_ref, raw_ref, id_col: str = "doc_id",
                 text_col: str = "text") -> None:
        target = ray.get(target_ref)
        raw = ray.get(raw_ref)
        self.t_vocab = target.column("word").combine_chunks()
        self.t_counts = target.column("c").to_numpy()
        self.r_vocab = raw.column("word").combine_chunks()
        self.r_counts = raw.column("c").to_numpy()
        self.id_col = id_col
        self.text_col = text_col

    def _sums(self, flat, par, vocab, counts, n: int) -> np.ndarray:
        idx = pc.index_in(flat, vocab).to_numpy(zero_copy_only=False)
        known = ~np.isnan(idx) if idx.dtype.kind == "f" else idx >= 0
        freqs = np.zeros(len(par), dtype=np.int64)
        if known.any():
            freqs[known] = counts[idx[known].astype(np.int64)]
        return np.bincount(par, weights=freqs, minlength=n).astype(np.int64)

    def __call__(self, b: pa.Table) -> pa.Table:
        flat, par = _flat_words(b, self.text_col)
        n = b.num_rows
        n_tokens = np.bincount(par, minlength=n).astype(np.int64)
        sum_t = self._sums(flat, par, self.t_vocab, self.t_counts, n)
        sum_r = self._sums(flat, par, self.r_vocab, self.r_counts, n)
        # raw model covers every corpus token in exact mode (sum_r ≥
        # n_tokens ≥ 1); the max(…,1) only guards the top_vocab-capped mode
        safe = np.maximum(sum_r, 1)
        weight = np.floor(sum_t.astype(np.float64) / safe * 1e6 + 0.5) / 1e6
        out = pa.Table.from_pydict({
            "doc_id": b.column(self.id_col),
            "n_tokens": pa.array(n_tokens),
            "sum_target": pa.array(sum_t),
            "sum_raw": pa.array(sum_r),
            "weight": pa.array(weight),
        })
        return out.filter(pa.array(n_tokens > 0))


def importance_weights(
    docs: ray.data.Dataset,
    target_fraction: float = 0.25,
    target_salt: str = "dsir",
    id_col: str = "doc_id",
    text_col: str = "text",
    top_vocab: int = 0,
    concurrency: int | tuple[int, int] | None = None,
) -> ray.data.Dataset:
    """DSIR-style data-selection importance weights (Xie et al. 2023,
    "Data Selection for Language Models via Importance Resampling").

    DSIR weights raw documents by how target-like their hashed-n-gram LM
    likelihood is relative to the raw-corpus LM.  This is the
    transcendental-free exact core of that estimator: train the unigram
    frequency model on the TARGET slice (a deterministic md5-bucket of the
    corpus — stand-in for "the high-quality domain"; swap in any predicate)
    and on the FULL corpus, broadcast both, and score every document with
    the integer frequency sums plus their ratio.  Resampling then keeps
    docs ∝ weight (``hash_sample`` composes for the coordination-free
    draw).

    Distributed shape: two train passes (combiner → one vocabulary-sized
    shuffle each), two ``ray.put`` broadcasts, one vectorized scoring pass
    — no join against the corpus, the exact KenLM-classifier pattern at
    100 TB.  ``top_vocab`` caps both broadcast models at web scale
    (0 = exact, oracle mode)."""
    import hashlib

    threshold = int(target_fraction * (1 << 32))

    def target_only(b: pa.Table) -> pa.Table:
        ids = b.column(id_col).to_pylist()
        keep = [
            int(hashlib.md5(f"{target_salt}{i}".encode()).hexdigest()[:8], 16)
            < threshold
            for i in ids
        ]
        return b.filter(pa.array(keep, pa.bool_()))

    target_model = word_freq_model(
        docs.map_batches(target_only, batch_format="pyarrow"),
        text_col, top_vocab)
    raw_model = word_freq_model(docs, text_col, top_vocab)
    return docs.map_batches(
        _ImportanceScorer,
        fn_constructor_kwargs={
            "target_ref": ray.put(target_model),
            "raw_ref": ray.put(raw_model),
            "id_col": id_col, "text_col": text_col,
        },
        batch_format="pyarrow",
        concurrency=auto_pool(concurrency),
    )


def unigram_score(
    docs: ray.data.Dataset,
    model: pa.Table | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    top_vocab: int = 0,
    concurrency: int | tuple[int, int] | None = None,
) -> ray.data.Dataset:
    """Two-pass pipeline: train (unless a ``model`` is supplied) then score
    every document against the broadcast model."""
    if model is None:
        model = word_freq_model(docs, text_col, top_vocab)
    model_ref = ray.put(model)
    return docs.map_batches(
        UnigramScorer,
        fn_constructor_kwargs={"model_ref": model_ref, "id_col": id_col,
                               "text_col": text_col},
        batch_format="pyarrow",
        concurrency=auto_pool(concurrency),
    )
