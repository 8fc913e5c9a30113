"""LLM response parsing: scrubbers + JSON repair + schema coercion.

Mirrors the reference's response path (M7/M8): strip markdown backtick
fences (reference llm/common.go:9-27), strip ``<think>…</think>`` blocks
(insert.go:293-296), best-effort JSON repair (insert.go:356 via the
jsonrepair lib), then unmarshal into the extraction wire format
``{"entities": [...], "relationships": [...]}`` (prompt.go:90-108,
rag.go:181-200 field tags).
"""

from __future__ import annotations

import json
import re

EntityMention = tuple[str, str, str]
RelationMention = tuple[str, str, str, list[str], float]

_THINK_RE = re.compile(r"<think>.*?</think>", re.DOTALL)
_TRAILING_COMMA_RE = re.compile(r",\s*([}\]])")


def remove_markdown_backticks(text: str) -> str:
    """Drop ``` fence lines (reference RemoveMarkdownBackticks)."""
    return "\n".join(
        line for line in text.splitlines() if not line.strip().startswith("```")
    )


def remove_think_tags(text: str) -> str:
    return _THINK_RE.sub("", text)


def json_repair(text: str) -> str:
    """Best-effort repair: trim chatter outside the outermost JSON object,
    drop trailing commas.  (The reference leans on the jsonrepair lib for
    the same class of LLM formatting slop.)"""
    start, end = text.find("{"), text.rfind("}")
    if start >= 0 and end > start:
        text = text[start : end + 1]
    return _TRAILING_COMMA_RE.sub(r"\1", text)


def parse_keyword_response(text: str) -> tuple[list[str], list[str]]:
    """Query-path keyword extraction parse (reference query.go:133-145):
    backslash strip FIRST, then think-tag strip, fence strip, repair, parse
    ``{"high_level_keywords": [...], "low_level_keywords": [...]}``.
    Returns (high, low); raises ValueError on unparseable input."""
    cleaned = json_repair(
        remove_markdown_backticks(remove_think_tags(text.replace("\\", "")))
    )
    try:
        obj = json.loads(cleaned)
    except json.JSONDecodeError as exc:
        raise ValueError(f"unparseable keyword response: {exc}") from exc
    if not isinstance(obj, dict):
        raise ValueError("keyword response is not a JSON object")
    high = [str(k) for k in obj.get("high_level_keywords") or []]
    low = [str(k) for k in obj.get("low_level_keywords") or []]
    return high, low


def parse_llm_response(
    text: str,
) -> tuple[list[EntityMention], list[RelationMention]]:
    """Scrub + repair + parse one chat response into mention tuples.

    Raises ``ValueError`` on unparseable input (the reference retries, then
    returns empty maps once retries exhaust — callers choose the policy).
    """
    cleaned = json_repair(remove_think_tags(remove_markdown_backticks(text)))
    try:
        obj = json.loads(cleaned)
    except json.JSONDecodeError as exc:
        raise ValueError(f"unparseable LLM response: {exc}") from exc
    if not isinstance(obj, dict):
        raise ValueError("LLM response is not a JSON object")
    ents: list[EntityMention] = []
    for e in obj.get("entities") or []:
        ents.append(
            (str(e.get("entity_name", "")),
             str(e.get("entity_type", "")),
             str(e.get("entity_description", "")))
        )
    rels: list[RelationMention] = []
    for r in obj.get("relationships") or []:
        kws = r.get("relationship_keywords") or []
        if not isinstance(kws, list):
            kws = [str(kws)]
        try:
            weight = float(r.get("relationship_strength", 1.0))
        except (TypeError, ValueError):
            weight = 1.0
        rels.append(
            (str(r.get("source_entity", "")),
             str(r.get("target_entity", "")),
             str(r.get("relationship_description", "")),
             [str(k) for k in kws],
             weight)
        )
    return ents, rels
