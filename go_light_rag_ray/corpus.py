"""Deterministic synthetic interleaved text+media corpus (FIXTURES.md F1).

Generates the exact `input_hint` shape from BASELINE.json:
``(doc_id: string, spans: list<struct<kind, text, media_ref, offset>>)``.
Text spans are sentences drawn from a seeded template pool that embeds known
entity names and relationship patterns, so the deterministic rule-based
extractor (stages/extractor.py) has ground truth; media spans are interleaved
at deterministic positions.  ``offset`` is the running character length of the
concatenation of preceding *text* spans — the reference's flat ``Content``
(reference insert.go:50-53) is exactly that concatenation.

All generation is seeded and hermetic.  Entity names contain no ``-`` so the
reference's composite-key split-on-dash behavior (reference insert.go:583-585)
agrees with our two-column keys (SURVEY.md §1.4).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .schemas import DOCUMENTS_SCHEMA

# Gazetteer: entity name -> type.  Upper-case names (the reference upper-cases
# all names at normalization, insert.go:478; fixtures start upper so goldens
# are stable).
PEOPLE = ["ADA LOVELACE", "ALAN TURING", "GRACE HOPPER", "EDSGER DIJKSTRA",
          "BARBARA LISKOV", "DONALD KNUTH", "MARGARET HAMILTON", "JOHN MCCARTHY"]
ORGS = ["ACME CORP", "GLOBEX", "INITECH", "UMBRELLA LABS", "STARK INDUSTRIES",
        "WAYNE ENTERPRISES", "TYRELL CORP", "OMNIPRESENT CORP"]
PLACES = ["LONDON", "ZURICH", "KYOTO", "NAIROBI", "BOSTON", "OSLO", "LIMA", "SEOUL"]

GAZETTEER: dict[str, str] = (
    {p: "PERSON" for p in PEOPLE}
    | {o: "ORGANIZATION" for o in ORGS}
    | {c: "LOCATION" for c in PLACES}
)

ENTITY_TYPES = ["PERSON", "ORGANIZATION", "LOCATION"]

# (template, pred keyword, slot kinds).  The FOUNDED pattern is only matched
# by the *glean* rule set (stages/extractor.py), modelling the reference's
# gleaning loop (insert.go:385-446) hermetically.
_REL_TEMPLATES = [
    ("{a} works at {b}.", "WORKS_AT", ("P", "O")),
    ("{a} lives in {b}.", "LIVES_IN", ("P", "C")),
    ("{a} is located in {b}.", "LOCATED_IN", ("O", "C")),
    ("{a} collaborates with {b}.", "COLLABORATES_WITH", ("P", "P")),
    ("{a} founded {b}.", "FOUNDED", ("P", "O")),
    ("{a} acquired {b}.", "ACQUIRED", ("O", "O")),
]

_FILLER = [
    "The weather was unremarkable that day.",
    "Nothing else of note happened.",
    "A long meeting followed in the afternoon.",
    "The report was filed without further comment.",
    "Several unrelated items were discussed.",
]


def _pick(rng: np.random.Generator, pool: list[str]) -> str:
    return pool[int(rng.integers(0, len(pool)))]


def _sentence(rng: np.random.Generator, skew_entity: str | None) -> str:
    r = rng.random()
    if r < 0.25:
        return _FILLER[int(rng.integers(0, len(_FILLER)))]
    tmpl, _, kinds = _REL_TEMPLATES[int(rng.integers(0, len(_REL_TEMPLATES)))]
    pools = {"P": PEOPLE, "O": ORGS, "C": PLACES}
    a = _pick(rng, pools[kinds[0]])
    b = _pick(rng, pools[kinds[1]])
    if skew_entity is not None and rng.random() < 0.5:
        if kinds[0] == "O":
            a = skew_entity
        elif kinds[1] == "O":
            b = skew_entity
    while b == a:
        b = _pick(rng, pools[kinds[1]])
    return tmpl.format(a=a, b=b)


def generate_documents(
    n_docs: int,
    seed: int = 42,
    skew_fraction: float = 0.0,
    skew_entity: str = "OMNIPRESENT CORP",
    doc_prefix: str = "doc",
) -> pa.Table:
    """Build the interleaved documents table deterministically.

    ``skew_fraction`` > 0 makes ``skew_entity`` appear in roughly that share
    of documents (FIXTURES F6 hot-key fixture).
    """
    rng = np.random.default_rng(seed)
    doc_ids: list[str] = []
    all_spans: list[list[dict]] = []
    for i in range(n_docs):
        doc_id = f"{doc_prefix}-{i:06d}"
        n_spans = int(rng.integers(3, 13))
        skew = skew_entity if (skew_fraction > 0 and rng.random() < skew_fraction) else None
        spans: list[dict] = []
        offset = 0
        for j in range(n_spans):
            if rng.random() < 0.8:
                n_sent = int(rng.integers(1, 5))
                text = " ".join(_sentence(rng, skew) for _ in range(n_sent)) + " "
                spans.append({"kind": "text", "text": text, "media_ref": "", "offset": offset})
                offset += len(text)
            else:
                kind = "image" if rng.random() < 0.6 else "audio"
                spans.append(
                    {"kind": kind, "text": "", "media_ref": f"media://{doc_id}/{j}", "offset": offset}
                )
        doc_ids.append(doc_id)
        all_spans.append(spans)
    return pa.Table.from_pydict({"doc_id": doc_ids, "spans": all_spans}, schema=DOCUMENTS_SCHEMA)


def assemble_content(spans: list[dict]) -> str:
    """Reference ``Document.Content``: concatenation of text-span texts in span order."""
    return "".join(s["text"] for s in spans if s["kind"] == "text")
