"""Description summarize-if-long — post-aggregate stage (reference T4).

The reference joins a key's descriptions with ``<SEP>``, counts tokens and,
only when the count reaches ``MaxSummariesTokenLength`` (default 1200,
reference handler/default.go:44), asks the LLM for a condensed description
(reference insert.go:692-723, template prompt.go:213-229).  Two
implementations behind one actor surface:

- ``DescriptionSummarizer`` — hermetic deterministic stand-in: keeps the
  longest prefix of descriptions fitting half the budget and appends a
  deterministic tail marker.
- ``ChatSummarizer`` — the real seam: renders the reference's
  summarize-descriptions template and sends ONE chat turn per overflowing
  key through any ``chat_fn(messages) -> str`` (the same ``Chat`` protocol
  ``ChatRules`` drives); a chat failure falls back to the deterministic
  summary so the pipeline never stalls on a flaky model.

Either way the stage is a small ``map_batches`` over the (few) hot rows
whose merged description overflows — cold rows pass through untouched.
"""

from __future__ import annotations

import pyarrow as pa

from .. import GRAPH_FIELD_SEPARATOR
from ..tokenizer import Tokenizer, get_tokenizer

DEFAULT_MAX_SUMMARIES_TOKEN_LENGTH = 1200  # reference handler/default.go:44

# reference prompt.go:213-229 (summarizeDescriptionsPrompt) — prompts are
# the reference's public template strings; parity requires the exact text
SUMMARIZE_DESCRIPTIONS_PROMPT = """
You are a helpful assistant responsible for generating a comprehensive summary of the data provided below.
Given one or two entities, and a list of descriptions, all related to the same entity or group of entities.
Please concatenate all of these into a single, comprehensive description. Make sure to include information collected from all the descriptions.
If the provided descriptions are contradictory, please resolve the contradictions and provide a single, coherent summary.
Make sure it is written in third person, and include the entity names so we the have full context.
Use {language} as the language.

#######
-Data-
Entities: {entity_name}
Description List: {descriptions}
#######
Output:
"""


def render_summarize_prompt(
    entity_name: str, descriptions: list[str], language: str = "English"
) -> str:
    """insert.go:707-719: descriptions joined ", " and bracketed, then the
    template filled with (EntityName, Descriptions, Language)."""
    desc_string = "[" + ", ".join(descriptions) + "]"
    return SUMMARIZE_DESCRIPTIONS_PROMPT.format(
        language=language, entity_name=entity_name, descriptions=desc_string
    )


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


class ChatSummarizer:
    """LLM-driven description summarizer (reference insert.go:692-723 via
    the ``Chat`` seam).

    Per graph row: join descriptions with ``<SEP>``, count tokens; if the
    count reaches ``max_tokens``, render the reference's
    summarize-descriptions template — ``EntityName`` = entity id for nodes,
    ``"SRC-TGT"`` for edges (the reference's composite relationship key,
    insert.go:581-584) — and replace the list with the model's single
    summary string.  A ``chat_fn`` exception falls back to the
    deterministic ``summarize_descriptions`` for that row (the pipeline
    must not stall on a flaky model; the reference instead fails the whole
    insert, insert.go:541-543 — deviation documented here).

    Deploy exactly like ``DescriptionSummarizer``::

        graph.map_batches(ChatSummarizer,
                          fn_constructor_kwargs={"chat_fn": fn},
                          batch_format="pyarrow", concurrency=(1, 2))
    """

    def __init__(
        self,
        chat_fn,
        max_tokens: int = DEFAULT_MAX_SUMMARIES_TOKEN_LENGTH,
        tokenizer: str = "regex",
        language: str = "English",
    ) -> None:
        self.chat = chat_fn
        self.max_tokens = max_tokens
        self.tokenizer = get_tokenizer(tokenizer)
        self.language = language

    def _name_of(self, row: dict) -> str:
        if row.get("kind") == "edge":
            return f"{row.get('src')}-{row.get('tgt')}"
        return str(row.get("entity_id"))

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.max_tokens <= 0:
            return batch
        descs = batch.column("descriptions").to_pylist()
        names = [
            self._name_of(
                {"kind": k, "entity_id": e, "src": s, "tgt": t})
            for k, e, s, t in zip(
                batch.column("kind").to_pylist(),
                batch.column("entity_id").to_pylist(),
                batch.column("src").to_pylist(),
                batch.column("tgt").to_pylist())
        ] if {"kind", "entity_id", "src", "tgt"} <= set(batch.column_names) \
            else [str(i) for i in range(len(batch))]
        out: list[list[str]] = []
        for name, d in zip(names, descs):
            joined = GRAPH_FIELD_SEPARATOR.join(d)
            if self.tokenizer.count(joined) < self.max_tokens:  # insert.go:703
                out.append(d)
                continue
            prompt = render_summarize_prompt(name, d, self.language)
            try:
                out.append([self.chat([prompt])])
            except Exception:
                out.append(
                    summarize_descriptions(d, self.tokenizer, self.max_tokens))
        idx = batch.schema.get_field_index("descriptions")
        return batch.set_column(
            idx, batch.schema.field(idx), pa.array(out, pa.list_(pa.string())))
