"""Corpus curation: the composed training-data cleaning pipeline.

This is what the operator library exists for at 100 TB: one streaming pass
that keeps exactly the documents a pre-training corpus wants —

    canonical under exact dedup  (smallest doc_id per content hash)
    ∧ quality ≥ threshold        (distinct/stopword heuristics)
    ∧ language ∈ allowed set     (marker-word language ID)

Plan shape: the narrow per-doc stats (quality, language) fuse into one
``map_batches`` pass over the read; the only shuffle is the dedup groupby
on the content hash (uniform key, no skew).  Canonical membership comes
back NOT as a join but by re-deriving it: the dedup winners table is tiny
relative to the corpus only when dup-rate is high, so instead each doc
carries its hash and the groupby keeps the min-id row directly — the
filters run BEFORE the shuffle so discarded docs never enter it.
"""

from __future__ import annotations

import hashlib

import pyarrow as pa
import ray.data

from ..stages.textstats import LANG_MARKERS, STOPWORDS

DEFAULT_MIN_QUALITY = 0.5
DEFAULT_LANGS = ("en",)


def curate_corpus(
    docs: ray.data.Dataset,
    min_quality: float = DEFAULT_MIN_QUALITY,
    langs: tuple[str, ...] = DEFAULT_LANGS,
) -> ray.data.Dataset:
    """→ (doc_id, n_tokens, quality, lang_pred) for kept documents.

    Kept = passes quality + language locally AND is the smallest doc_id
    among surviving docs sharing its text hash (dedup-last, so two
    passing duplicates keep exactly one).
    """
    markers = {lang: frozenset(ws) for lang, ws in LANG_MARKERS.items()}
    allowed = set(langs)

    def score_and_filter(b: pa.Table) -> pa.Table:
        doc_ids = b.column("doc_id").to_pylist()
        texts = b.column("text").to_pylist()
        out = {"text_hash": [], "doc_id": [], "n_tokens": [],
               "quality": [], "lang_pred": []}
        for did, t in zip(doc_ids, texts):
            toks = (t or "").split()
            n = len(toks)
            if n == 0:
                continue
            quality = (len(set(toks)) / n) * (
                1 - sum(1 for w in toks if w in STOPWORDS) / n
            )
            if quality < min_quality:
                continue
            best_lang, best_score = None, -1.0
            for lang in sorted(markers):
                s = sum(1 for w in toks if w in markers[lang]) / n
                if s > best_score:
                    best_lang, best_score = lang, s
            if best_lang not in allowed:
                continue
            out["text_hash"].append(hashlib.md5((t or "").encode()).hexdigest())
            out["doc_id"].append(did)
            out["n_tokens"].append(n)
            out["quality"].append(quality)
            out["lang_pred"].append(best_lang)
        return pa.Table.from_pydict(
            {"text_hash": pa.array(out["text_hash"], pa.string()),
             "doc_id": pa.array(out["doc_id"],
                                b.schema.field("doc_id").type),
             "n_tokens": pa.array(out["n_tokens"], pa.int64()),
             "quality": pa.array(out["quality"], pa.float64()),
             "lang_pred": pa.array(out["lang_pred"], pa.string())}
        )

    survivors = docs.map_batches(score_and_filter, batch_format="pyarrow")

    def keep_min(group: pa.Table) -> pa.Table:
        order = pa.compute.sort_indices(group.column("doc_id"))
        return group.take(order[:1]).drop_columns(["text_hash"])

    return survivors.groupby("text_hash").map_groups(
        keep_min, batch_format="pyarrow"
    )
