"""Entity-linking candidate generation by name-string similarity.

The reference canonicalizes entities by EXACT normalized-name match
(upsert key = the cleaned upper-cased name, reference insert.go:454-520);
everything that is not an exact match stays a distinct node.  A linking
pass over the canonical graph needs the classic complement: CANDIDATE
pairs of entities whose names are nearly identical (typos, inflections,
"ACME CORP" vs "ACME CORPORATION") scored by character-n-gram Jaccard —
the cheap, language-agnostic first stage of every entity-resolution
stack (the Fellegi-Sunter blocking step).  The embedding-side twin is
``pipelines/query.entity_ann``; this is the string side.

Distributed shape: the dedup family's inverted-index skeleton
(stages/dedup.jaccard_pairs_from_index) — explode each name into its
DISTINCT char k-grams, group by gram, emit within-gram pairs carrying
both set sizes, count pair occurrences with ``sorted_count``, score.
Gram keys are near-uniform (there are at most |alphabet|^k of them, so a
``max_group`` cap bounds the stop-gram quadratic exactly like the
stop-shingle cap in ``ngram_jaccard_pairs``).

Names shorter than ``k`` contribute their whole string as one gram —
the same rule as ``dedup._shingles`` and the oracle's
``substr(name, i, k)`` over ``generate_series(1, max(len-k+1, 1))``.
"""

from __future__ import annotations

import pyarrow as pa
import ray.data

from .dedup import _resolve_max_group, jaccard_pairs_from_index

__all__ = ["name_gram_pairs"]


def _char_grams(name: str, k: int) -> list[str]:
    """Distinct char k-grams in first-occurrence order (whole string when
    shorter than k)."""
    if len(name) <= k:
        return [name] if name else []
    seen: dict[str, None] = {}
    for i in range(len(name) - k + 1):
        seen.setdefault(name[i : i + k], None)
    return list(seen)


def name_gram_pairs(
    nodes: ray.data.Dataset,
    k: int = 3,
    threshold: float = 0.0,
    id_col: str = "entity_id",
    max_group: int | None = None,
) -> ray.data.Dataset:
    """Canonical-graph nodes → ``(a, b, jaccard)`` candidate pairs with
    a < b, char-``k``-gram Jaccard ≥ ``threshold``.  ``max_group`` drops
    stop-grams (0 = exact mode, used by the oracle)."""
    max_group = _resolve_max_group(max_group)

    def explode(b: pa.Table) -> pa.Table:
        names = b.column(id_col).to_pylist()
        out_id, out_g, out_n = [], [], []
        for name in names:
            grams = _char_grams(name or "", k)
            for g in grams:
                out_id.append(name)
                out_g.append(g)
                out_n.append(len(grams))
        return pa.Table.from_pydict({
            "doc_id": pa.array(out_id, pa.string()),
            "shingle": pa.array(out_g, pa.string()),
            "n_shingles": pa.array(out_n, pa.int64()),
        })

    index = nodes.select_columns([id_col]).map_batches(
        explode, batch_format="pyarrow")
    return jaccard_pairs_from_index(index, threshold, max_group,
                                    op_label="name_gram_pairs")
