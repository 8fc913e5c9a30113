"""Description summarize-if-long — post-aggregate stage (reference T4).

The reference joins a key's descriptions with ``<SEP>``, counts tokens and,
only when the count reaches ``MaxSummariesTokenLength`` (default 1200,
reference handler/default.go:44), asks the LLM for a condensed description
(reference insert.go:692-723).  Hermetic stand-in: a deterministic
summarizer that keeps the longest prefix of descriptions fitting half the
budget and appends a deterministic tail marker.  Applied as a small
``map_batches`` stage over the (few) hot rows whose merged description
overflows — the cold rows pass through untouched.
"""

from __future__ import annotations

import pyarrow as pa

from .. import GRAPH_FIELD_SEPARATOR
from ..tokenizer import Tokenizer, get_tokenizer

DEFAULT_MAX_SUMMARIES_TOKEN_LENGTH = 1200  # reference handler/default.go:44


def summarize_descriptions(
    descriptions: list[str], tokenizer: Tokenizer, max_tokens: int
) -> list[str]:
    """Deterministic summary of an overflowing description list."""
    joined = GRAPH_FIELD_SEPARATOR.join(descriptions)
    if tokenizer.count(joined) < max_tokens:  # strict <, reference insert.go:703
        return descriptions
    budget = max(1, max_tokens // 2)
    kept: list[str] = []
    used = 0
    for d in descriptions:
        c = tokenizer.count(d)
        if kept and used + c > budget:
            break
        kept.append(d)
        used += c
    dropped = len(descriptions) - len(kept)
    return [GRAPH_FIELD_SEPARATOR.join(kept) + f" (+{dropped} descriptions summarized)"]


class DescriptionSummarizer:
    """Actor-pool callable over the canonicalized graph table."""

    def __init__(self, max_tokens: int = DEFAULT_MAX_SUMMARIES_TOKEN_LENGTH,
                 tokenizer: str = "regex") -> None:
        self.max_tokens = max_tokens
        self.tokenizer = get_tokenizer(tokenizer)

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.max_tokens <= 0:
            return batch
        descs = batch.column("descriptions").to_pylist()
        out = [summarize_descriptions(d, self.tokenizer, self.max_tokens) for d in descs]
        idx = batch.schema.get_field_index("descriptions")
        return batch.set_column(idx, batch.schema.field(idx), pa.array(out, type=pa.list_(pa.string())))
