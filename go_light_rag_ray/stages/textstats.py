"""Text-analysis operators: token counting, quality scoring, language ID,
document fingerprinting.

The reference carries only a token counter (CountTokens,
reference internal/helper.go:60-72) used for chunk budgeting; a web-scale
training-data pipeline also filters on quality / language and fingerprints
documents for provenance.  Everything here is a stateless
``map_batches(batch_format="pyarrow")`` stage — narrow, no shuffle — and
every arithmetic step is integer-derived IEEE math so the DuckDB oracle
reproduces values exactly.

Scale notes: these are the cheapest stages in the pipeline (pure per-row
string ops); they fuse with the read and never materialize anything.
"""

from __future__ import annotations

import hashlib
import re

import pyarrow as pa
import pyarrow.compute as pc
import ray.data

# BPE-ish pre-tokenization: word runs vs single non-word-non-space chars
# (the shape of the GPT/Qwen pre-tokenizer regex, reference
# llm/bpetokenizer.go:137-151, without unicode categories so RE2 (DuckDB)
# and python `re` agree byte-for-byte).
BPE_PATTERN = r"[A-Za-z0-9]+|[^A-Za-z0-9\s]"
_BPE_RE = re.compile(BPE_PATTERN)

# deterministic marker-word lists for the n-gram/stopword language
# heuristic; score(lang) = marker hits / tokens, winner = max score with
# lexicographic tie-break (ascending lang code).
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "fast"),
    "de": ("small", "slow", "big"),
    "es": ("join", "merge", "sort"),
    "fr": ("row", "column", "line"),
}

STOPWORDS: tuple[str, ...] = ("the", "a", "of", "and", "to", "in", "is")

FINGERPRINT_SHINGLE_K = 4


def token_stats(docs: ray.data.Dataset) -> ray.data.Dataset:
    """(doc_id, n_tokens, n_bpe_tokens, n_chars) per document."""

    def stats(b: pa.Table) -> pa.Table:
        texts = b.column("text").to_pylist()
        return pa.Table.from_pydict(
            {
                "doc_id": b.column("doc_id"),
                "n_tokens": pa.array(
                    [len((t or "").split()) for t in texts], pa.int64()
                ),
                "n_bpe_tokens": pa.array(
                    [len(_BPE_RE.findall(t or "")) for t in texts], pa.int64()
                ),
                "n_chars": pa.array([len(t or "") for t in texts], pa.int64()),
            }
        )

    return docs.map_batches(stats, batch_format="pyarrow")


def quality_scores(
    docs: ray.data.Dataset, carry: tuple[str, ...] = (),
) -> ray.data.Dataset:
    """Heuristic quality features + combined score.

    distinct_ratio = distinct/total tokens, stopword_ratio, mean_word_len —
    all ratios of integers, so the oracle matches bit-for-bit.
    quality = distinct_ratio * (1 - stopword_ratio).
    ``carry`` columns pass through unchanged (group labels for downstream
    per-key selection — no join needed later).
    """

    def score(b: pa.Table) -> pa.Table:
        texts = b.column("text").to_pylist()
        dr, sr, mwl, q = [], [], [], []
        for t in texts:
            toks = (t or "").split()
            n = len(toks)
            if n == 0:
                dr.append(0.0); sr.append(0.0); mwl.append(0.0); q.append(0.0)
                continue
            distinct_ratio = len(set(toks)) / n
            stop_ratio = sum(1 for w in toks if w in STOPWORDS) / n
            dr.append(distinct_ratio)
            sr.append(stop_ratio)
            mwl.append(sum(len(w) for w in toks) / n)
            q.append(distinct_ratio * (1 - stop_ratio))
        return pa.Table.from_pydict(
            {
                "doc_id": b.column("doc_id"),
                **{c: b.column(c) for c in carry},
                "distinct_ratio": pa.array(dr, pa.float64()),
                "stopword_ratio": pa.array(sr, pa.float64()),
                "mean_word_len": pa.array(mwl, pa.float64()),
                "quality": pa.array(q, pa.float64()),
            }
        )

    return docs.map_batches(score, batch_format="pyarrow")


def language_id(
    docs: ray.data.Dataset, carry: tuple[str, ...] = (),
) -> ray.data.Dataset:
    """Marker-word language heuristic.

    (doc_id, lang_pred, lang_score); winner = highest hits/total with
    ascending-code tie-break (so empty docs deterministically get 'de',
    the first code alphabetically).  ``carry`` columns pass through (e.g.
    the labeled ``lang`` for confusion counting).
    """
    markers = {lang: frozenset(ws) for lang, ws in LANG_MARKERS.items()}

    def lid(b: pa.Table) -> pa.Table:
        texts = b.column("text").to_pylist()
        langs, scores = [], []
        for t in texts:
            toks = (t or "").split()
            n = len(toks) or 1
            best_lang, best_score = None, -1.0
            for lang in sorted(markers):
                s = sum(1 for w in toks if w in markers[lang]) / n
                if s > best_score:
                    best_lang, best_score = lang, s
            langs.append(best_lang)
            scores.append(best_score)
        return pa.Table.from_pydict(
            {
                "doc_id": b.column("doc_id"),
                **{c: b.column(c) for c in carry},
                "lang_pred": pa.array(langs, pa.string()),
                "lang_score": pa.array(scores, pa.float64()),
            }
        )

    return docs.map_batches(lid, batch_format="pyarrow")


def tfidf_top_terms(
    docs: ray.data.Dataset, k: int = 3, n_docs: int | None = None,
    strategy: str = "grouped",
) -> ray.data.Dataset:
    """Per-document top-k distinctive terms by tf/df score.

    Join-free two-shuffle plan (no broadcast vocabulary, so it holds at
    web-scale vocabularies): explode → (doc, word, tf) rows → df attach
    inside the word partition → per-doc rank.  Score = tf/df (a rational of
    two ints, so the DuckDB oracle matches the double exactly); rank ties
    break on ascending word.  Returns (doc_id, rank, word, tf, df, score).

    Two equivalent executions (measured round 3, identical output):

    - ``strategy="grouped"`` (default): ``groupby().map_groups`` for both
      the df attach and the per-doc rank — ONE lazy execution round.  At
      100k docs / 2.5M tf rows it beats the segment path 3× (6.3 s vs
      19.8 s at 32 cpus) because group dispatch (~10µs × #groups) is far
      cheaper than the segment path's two extra materialize rounds and
      second global sort.
    - ``strategy="segment"``: ``sortagg`` sorted-run df attach + segment
      top-k — zero per-group Python.  The asymptotic path once #groups
      (vocabulary, corpus) reaches the ~10⁷-10⁸ range where dispatch alone
      would cost minutes; pick it for web-scale vocab jobs.
    """
    import ray.data.aggregate  # noqa: F401  (keeps parity with module deps)

    def explode(b: pa.Table) -> pa.Table:
        """Vectorized (doc, word, tf): whitespace split + flatten + one
        Arrow hash-count — no Python loop over the token stream."""
        import numpy as np

        words = pc.ascii_split_whitespace(
            pc.cast(b.column("text"), pa.string())).combine_chunks()
        flat_all = pc.list_flatten(words)
        lens = pc.list_value_length(words).to_numpy(zero_copy_only=False)
        lens = np.nan_to_num(lens).astype(np.int64)
        par_all = np.repeat(np.arange(b.num_rows), lens)
        keep = np.nonzero(
            pc.not_equal(flat_all, "").to_numpy(zero_copy_only=False))[0]
        did = b.column("doc_id").combine_chunks()
        counted = (
            pa.table({"doc_id": did.take(pa.array(par_all[keep])),
                      "word": flat_all.take(pa.array(keep))})
            .group_by(["doc_id", "word"])
            .aggregate([("word", "count")])
        )
        return pa.table(
            {"doc_id": counted.column("doc_id"),
             "word": counted.column("word"),
             "tf": pc.cast(counted.column("word_count"), pa.int64())}
        )

    tf_rows = docs.map_batches(explode, batch_format="pyarrow")

    if strategy == "segment":
        from .sortagg import sorted_attach_count, sorted_topk

        with_df = sorted_attach_count(tf_rows, ["word"], "df")

        def score_col(b: pa.Table) -> pa.Table:
            import numpy as np

            tf = b.column("tf").to_numpy(zero_copy_only=False).astype(np.float64)
            df = b.column("df").to_numpy(zero_copy_only=False).astype(np.float64)
            return b.append_column("score", pa.array(tf / df, pa.float64()))

        scored = with_df.map_batches(score_col, batch_format="pyarrow")
        # (doc_id, word) is unique, so (score desc, word asc) totally orders
        # each doc's terms — the same tie-break as the SQL row_number
        ranked = sorted_topk(
            scored, ["doc_id"], order_by=["score", "word"], k=k,
            descending=[True, False], rank_name="rank",
        )
        return ranked.select_columns(["doc_id", "rank", "word", "tf", "df",
                                      "score"])

    def attach_df(group: pa.Table) -> pa.Table:
        return group.append_column(
            "df", pa.nulls(len(group), pa.int64()).fill_null(len(group))
        )

    with_df = tf_rows.groupby("word").map_groups(attach_df,
                                                 batch_format="pyarrow")

    def topk(group: pa.Table) -> pa.Table:
        import numpy as np

        did = group.column("doc_id")[0]
        words = np.array(group.column("word").to_pylist())
        tf = group.column("tf").to_numpy(zero_copy_only=False)
        df = group.column("df").to_numpy(zero_copy_only=False)
        score = tf.astype(np.float64) / df
        order = np.lexsort((words, -score))[:k]
        n = len(order)
        return pa.Table.from_pydict(
            {"doc_id": pa.array([did.as_py()] * n,
                                group.schema.field("doc_id").type),
             "rank": pa.array(np.arange(1, n + 1, dtype=np.int32), pa.int32()),
             "word": pa.array(words[order], pa.string()),
             "tf": pa.array(tf[order], pa.int64()),
             "df": pa.array(df[order], pa.int64()),
             "score": pa.array(score[order], pa.float64())}
        )

    return with_df.groupby("doc_id").map_groups(topk, batch_format="pyarrow")


def fingerprints(docs: ray.data.Dataset, shingle_k: int = FINGERPRINT_SHINGLE_K) -> ray.data.Dataset:
    """Winnowing-style document fingerprint: min md5 over k-word shingles
    (rolling window; the min-of-window-hashes scheme of Schleimer et al.
    2003 with a single global window).  (doc_id, fingerprint)."""

    def fp(b: pa.Table) -> pa.Table:
        texts = b.column("text").to_pylist()
        out = []
        for t in texts:
            toks = (t or "").split()
            if not toks:
                out.append(hashlib.md5(b"").hexdigest())
                continue
            if len(toks) < shingle_k:
                windows = [" ".join(toks)]
            else:
                windows = [
                    " ".join(toks[i : i + shingle_k])
                    for i in range(len(toks) - shingle_k + 1)
                ]
            out.append(min(hashlib.md5(w.encode()).hexdigest() for w in windows))
        return pa.Table.from_pydict(
            {"doc_id": b.column("doc_id"), "fingerprint": pa.array(out, pa.string())}
        )

    return docs.map_batches(fp, batch_format="pyarrow")


def inverted_index(
    docs: ray.data.Dataset,
    min_df: int = 2,
    max_df: int | None = None,
    strategy: str = "grouped",
) -> ray.data.Dataset:
    """Inverted index construction → (word, df, postings) with postings =
    the '|'-joined ascending doc-id list (a string so the value oracle can
    hash it; split on '|' for the list view).

    Distinct (word, doc) pairs are built per batch with the same
    vectorized explode as TF-IDF; the collect is either
    ``groupby().map_groups`` (default — one lazy round, wins below the
    ~10⁵-group dispatch point, the tfidf-measured rule) or
    ``sortagg.sorted_collect`` (``strategy="segment"`` — zero per-group
    Python, the web-scale-vocabulary path).  ``min_df``/``max_df`` bound
    the emitted rows (df caps are how production postings lists drop
    stopword-scale words)."""

    def pairs(b: pa.Table) -> pa.Table:
        import numpy as np

        words = pc.ascii_split_whitespace(
            pc.cast(b.column("text"), pa.string())).combine_chunks()
        flat_all = pc.list_flatten(words)
        lens = pc.list_value_length(words).to_numpy(zero_copy_only=False)
        lens = np.nan_to_num(lens).astype(np.int64)
        par_all = np.repeat(np.arange(b.num_rows), lens)
        keep = np.nonzero(
            pc.not_equal(flat_all, "").to_numpy(zero_copy_only=False))[0]
        did = b.column("doc_id").combine_chunks()
        return (
            pa.table({"word": flat_all.take(pa.array(keep)),
                      "doc_id": did.take(pa.array(par_all[keep]))})
            .group_by(["word", "doc_id"])
            .aggregate([])
        )

    pair_rows = docs.select_columns(["doc_id", "text"]).map_batches(
        pairs, batch_format="pyarrow")

    def finish(b: pa.Table) -> pa.Table:
        df = pc.list_value_length(b.column("postings")).cast(pa.int64())
        # postings collect in the NATIVE id type (numeric ids sort
        # numerically, matching SQL's ORDER BY); render to string only here
        out = pa.Table.from_pydict({
            "word": b.column("word"),
            "df": df,
            "postings": pc.binary_join(
                pc.cast(b.column("postings"), pa.list_(pa.string())), "|"),
        })
        mask = pc.greater_equal(out.column("df"), min_df)
        if max_df is not None:
            mask = pc.and_(mask, pc.less_equal(out.column("df"), max_df))
        return out.filter(mask)

    if strategy == "segment":
        from .sortagg import sorted_collect

        collected = sorted_collect(
            pair_rows, ["word"], "doc_id", "postings", distinct=True)
        return collected.map_batches(finish, batch_format="pyarrow")

    def collect(g: pa.Table) -> pa.Table:
        ids = sorted(set(g.column("doc_id").to_pylist()))
        return pa.Table.from_pydict({
            "word": g.column("word").slice(0, 1),
            "postings": pa.array([ids], pa.list_(
                g.schema.field("doc_id").type)),
        })

    collected = pair_rows.groupby("word").map_groups(
        collect, batch_format="pyarrow")
    return collected.map_batches(finish, batch_format="pyarrow")


def corpus_summary(docs: ray.data.Dataset,
                   text_col: str = "text") -> ray.data.Dataset:
    """One-row corpus data card: ``(n_docs, total_tokens, max_doc_tokens,
    mean_doc_tokens, total_chars, distinct_words)`` — the summary block a
    training-data release ships alongside the corpus.

    Distributed shape: one vectorized scan emits ONE partial row per
    batch (sums + max — the prefix-sum-summary idiom, O(blocks) driver
    rows at any corpus size); ``distinct_words`` rides the existing
    vocabulary-sized ``lm.word_freq_model`` shuffle.  ``mean_doc_tokens``
    is the engine's tie-stable 6-dp ratio (``floor(x·10⁶ + 0.5)/10⁶``);
    ``total_chars`` is BYTE length (== char length for the ASCII corpus,
    the documented io.py contract)."""
    import numpy as np

    from .lm import word_freq_model

    def partial(b: pa.Table) -> pa.Table:
        texts = pc.cast(b.column(text_col), pa.string()).fill_null("")
        split = pc.ascii_split_whitespace(texts)
        par = pc.list_parent_indices(split).to_numpy(zero_copy_only=False)
        nonempty = pc.not_equal(pc.list_flatten(split), "").to_numpy(
            zero_copy_only=False)
        n_tok = np.bincount(par[nonempty], minlength=len(b)).astype(np.int64)
        return pa.table({
            "n_docs": pa.array([len(b)], pa.int64()),
            "total_tokens": pa.array([int(n_tok.sum())], pa.int64()),
            "max_doc_tokens": pa.array([int(n_tok.max(initial=0))],
                                       pa.int64()),
            "total_chars": pa.array(
                [int(pc.sum(pc.binary_length(texts)).as_py() or 0)],
                pa.int64()),
        })

    parts = docs.map_batches(partial, batch_format="pyarrow").take_all()
    n_docs = sum(r["n_docs"] for r in parts)
    total_tokens = sum(r["total_tokens"] for r in parts)
    max_doc = max((r["max_doc_tokens"] for r in parts), default=0)
    total_chars = sum(r["total_chars"] for r in parts)
    distinct = word_freq_model(docs).num_rows
    mean = (np.floor(total_tokens / n_docs * 1e6 + 0.5) / 1e6
            if n_docs else 0.0)
    return ray.data.from_arrow(pa.table({
        "n_docs": pa.array([n_docs], pa.int64()),
        "total_tokens": pa.array([total_tokens], pa.int64()),
        "max_doc_tokens": pa.array([max_doc], pa.int64()),
        "mean_doc_tokens": pa.array([float(mean)], pa.float64()),
        "total_chars": pa.array([total_chars], pa.int64()),
        "distinct_words": pa.array([distinct], pa.int64()),
    }))
