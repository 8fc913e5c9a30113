"""Deterministic triple extraction with gleaning — the "LLM" stage.

The reference drives a chat model per chunk: an initial extraction prompt,
then up to ``GleanCount`` gleaning rounds that accumulate additional
entities/relationships, then normalization (reference insert.go:298-497).
This sandbox is hermetic (no network, no model), so the extractor is a
deterministic rule engine implementing the same protocol (SURVEY.md §7.0):

* ``ExtractionRules.extract_rounds(...)`` returns one result per round —
  round 0 is the base extraction, rounds 1..glean_count are the gleaning
  passes with a *different* rule set (modelling "find what was missed",
  reference insert.go:385-446); results accumulate across rounds exactly as
  the reference appends them (insert.go:380-418).
* Normalization mirrors ``dedupeLLMResult`` (insert.go:454-497): entity
  types upper-cased and validated against the handler's allowlist else
  ``"UNKNOWN"``; entity names and both relationship endpoints upper-cased.
  Grouping-by-key is deferred to the canonicalization shuffle — keys become
  columns, not map keys.

Deployed as an actor pool:
``chunks.map_batches(Extractor, batch_format="pyarrow", concurrency=N)`` —
rule tables and regexes are compiled once per actor in ``__init__``
(reference T3's pinned client), each ``__call__`` maps a chunk batch to a
combined mentions batch (kind ∈ {"entity", "relationship"}).
"""

from __future__ import annotations

import pyarrow as pa
import regex

from ..corpus import GAZETTEER, ENTITY_TYPES, _REL_TEMPLATES

# Combined mentions schema: entity and relationship mentions in one table so
# extraction runs once; split or co-grouped downstream via the `kind` column.
MENTIONS_SCHEMA = pa.schema(
    [
        pa.field("doc_id", pa.string()),
        pa.field("chunk_id", pa.string()),
        pa.field("order_index", pa.int32()),
        pa.field("mention_index", pa.int32()),
        pa.field("kind", pa.string()),        # "entity" | "relationship"
        pa.field("name", pa.string()),        # entity only, else ""
        pa.field("type", pa.string()),        # entity only, else ""
        pa.field("src", pa.string()),         # relationship only, else ""
        pa.field("tgt", pa.string()),         # relationship only, else ""
        pa.field("description", pa.string()),
        pa.field("keywords", pa.list_(pa.string())),  # relationship only
        pa.field("weight", pa.float64()),     # relationship only, else 0
    ]
)

EntityMention = tuple[str, str, str]                       # name, type, description
RelationMention = tuple[str, str, str, list[str], float]   # src, tgt, desc, keywords, weight


class ExtractionRules:
    """Protocol: deterministic stand-in for the extraction LLM."""

    entity_types: list[str] = ENTITY_TYPES
    glean_count: int = 1

    def extract_rounds(
        self, doc_id: str, chunk_id: str, content: str
    ) -> list[tuple[list[EntityMention], list[RelationMention]]]:
        raise NotImplementedError


_PRED_WEIGHTS = {
    "WORKS_AT": 7.0,
    "LIVES_IN": 5.0,
    "LOCATED_IN": 6.0,
    "COLLABORATES_WITH": 8.0,
    "FOUNDED": 9.0,
    "ACQUIRED": 8.0,
    "FILED_WITH": 3.0,
}

# Gleaning-only predicates: the base pass "misses" these; the glean pass
# finds them (hermetic model of the reference's glean loop).
_GLEAN_PREDS = {"FOUNDED"}


class PatternRules(ExtractionRules):
    """Sentence-template rules for the interleaved corpus (corpus.py).

    Base round: gazetteer entity scan + non-glean relationship templates.
    Glean round: the FOUNDED template only.  "THE REGISTRY" appears only as
    a relationship endpoint (never an entity mention), exercising the
    dangling-endpoint placeholder path (reference insert.go:625-663).
    """

    entity_types = ENTITY_TYPES
    glean_count = 1

    def __init__(self) -> None:
        names = sorted(GAZETTEER, key=len, reverse=True)
        alt = "|".join(regex.escape(n) for n in names)
        self._entity_re = regex.compile(rf"\b({alt})\b")
        self._sentence_re = regex.compile(r"[^.]+\.")
        self._rel_res: list[tuple[regex.Pattern, str]] = []
        for tmpl, pred, _kinds in _REL_TEMPLATES:
            body = regex.escape(tmpl).replace(r"\{a\}", rf"({alt})").replace(
                r"\{b\}", rf"({alt})"
            )
            self._rel_res.append((regex.compile(body), pred))
        self._registry_re = regex.compile(
            rf"({alt}) filed a report with (THE REGISTRY)\."
        )

    def extract_rounds(self, doc_id, chunk_id, content):
        base_ents: list[EntityMention] = []
        base_rels: list[RelationMention] = []
        glean_rels: list[RelationMention] = []
        for sm in self._sentence_re.finditer(content):
            sentence = sm.group().strip()
            for em in self._entity_re.finditer(sentence):
                name = em.group(1)
                base_ents.append((name, GAZETTEER[name], sentence))
            for rel_re, pred in self._rel_res:
                m = rel_re.search(sentence)
                if m:
                    mention: RelationMention = (
                        m.group(1),
                        m.group(2),
                        sentence,
                        [pred, "ASSOCIATION"],
                        _PRED_WEIGHTS[pred],
                    )
                    (glean_rels if pred in _GLEAN_PREDS else base_rels).append(mention)
            m = self._registry_re.search(sentence)
            if m:
                base_rels.append(
                    (m.group(1), m.group(2), sentence, ["FILED_WITH", "ASSOCIATION"],
                     _PRED_WEIGHTS["FILED_WITH"])
                )
        rounds = [(base_ents, base_rels)]
        if self.glean_count > 0:
            rounds.append(([], glean_rels))
            for _ in range(self.glean_count - 1):
                rounds.append(([], []))  # further gleans find nothing new
        return rounds


# Word gazetteer for the driver testdata (word-bag documents); chosen so the
# whole extraction is expressible in DuckDB SQL for the correctness oracle.
WORD_ENTITY_TYPES: dict[str, str] = {
    "spark": "SYSTEM",
    "customer": "ACTOR",
    "vector": "DATA",
    "table": "DATA",
    "stream": "DATA",
    "batch": "DATA",
    "query": "OP",
    "join": "OP",
    "window": "OP",
    "hash": "OP",
}
# Relationship vocabulary is a superset: "merge"/"scan" appear only as
# endpoints → placeholder nodes downstream.
WORD_REL_VOCAB = set(WORD_ENTITY_TYPES) | {"merge", "scan"}
WORD_ALLOWED_TYPES = ["SYSTEM", "ACTOR", "DATA", "OP"]


class WordCooccurrenceRules(ExtractionRules):
    """Gazetteer + co-occurrence rules over whitespace word-bag documents.

    Base round: every occurrence of an entity word is an entity mention
    (description keyed by doc so description-merge dedups across chunks);
    every *adjacent* pair of distinct relationship-vocab words is a
    CO_OCCURS relationship (weight 1.0).  Glean round: pairs at distance 2
    (NEAR, weight 0.5).  Exactly mirrored by SQL in __ray_entry__.oracle_sql.

    Carries a fully vectorized ``extract_batch`` fast path (Arrow split +
    numpy masks over the flattened word stream) that the ``Extractor``
    dispatches to — the per-row ``extract_rounds`` remains the semantic
    definition and the property-test reference.
    """

    entity_types = WORD_ALLOWED_TYPES
    glean_count = 1

    def __init__(self) -> None:
        self._word_re = regex.compile(r"\S+")

    def extract_batch(self, batch: pa.Table) -> pa.Table:
        from .extract_vec import word_cooccurrence_batch

        return word_cooccurrence_batch(batch, glean=self.glean_count > 0)

    def extract_rounds(self, doc_id, chunk_id, content):
        words = self._word_re.findall(content)
        ents: list[EntityMention] = []
        rels: list[RelationMention] = []
        glean: list[RelationMention] = []
        for w in words:
            t = WORD_ENTITY_TYPES.get(w)
            if t is not None:
                u = w.upper()
                ents.append((u, t, f"{u} appears in {doc_id}"))
        for i in range(len(words) - 1):
            a, b = words[i], words[i + 1]
            if a != b and a in WORD_REL_VOCAB and b in WORD_REL_VOCAB:
                ua, ub = a.upper(), b.upper()
                rels.append((ua, ub, f"{ua} co-occurs with {ub} in {doc_id}",
                             ["CO_OCCURS", "ADJACENT"], 1.0))
        for i in range(len(words) - 2):
            a, b = words[i], words[i + 2]
            if a != b and a in WORD_REL_VOCAB and b in WORD_REL_VOCAB:
                ua, ub = a.upper(), b.upper()
                glean.append((ua, ub, f"{ua} near {ub} in {doc_id}",
                              ["NEAR"], 0.5))
        rounds = [(ents, rels)]
        if self.glean_count > 0:
            rounds.append(([], glean))
            for _ in range(self.glean_count - 1):
                rounds.append(([], []))
        return rounds


class TranscriptRules(ExtractionRules):
    """Mock-LLM transcript playback (the reference's MockLLM,
    tests/rag_test.go:102-112) with the exact glean-loop control flow of
    insert.go:385-446:

    * round 0 parses ``base_response``;
    * at least one glean round always runs; after glean round k the loop
      breaks when ``glean_count_done > max_glean_count`` or when the
      decide-continue answer (trimmed of quotes, lower-cased,
      insert.go:438) is not the literal "yes";
    * every parsed round's mentions accumulate — duplicates are the
      canonicalization shuffle's job, exactly as dedupeLLMResult defers
      grouping in the reference.

    ``responses`` rotate like a canned chat: glean round k uses
    ``glean_responses[k % len]``; unparseable rounds raise (the caller's
    retry shell owns the retry policy, reference insert.go:326-336).
    """

    def __init__(
        self,
        base_response: str,
        glean_responses: list[str] | None = None,
        decide_responses: list[str] | None = None,
        entity_types: list[str] | None = None,
        max_glean_count: int = 1,
    ) -> None:
        from .llm_io import parse_llm_response

        self._parse = parse_llm_response
        self.base_response = base_response
        self.glean_responses = glean_responses or [base_response]
        self.decide_responses = decide_responses or []
        self.entity_types = entity_types or ENTITY_TYPES
        self.glean_count = max_glean_count

    def extract_rounds(self, doc_id, chunk_id, content):
        rounds = [self._parse(self.base_response)]
        glean_done = 0
        while True:
            resp = self.glean_responses[glean_done % len(self.glean_responses)]
            rounds.append(self._parse(resp))
            glean_done += 1
            if glean_done > self.glean_count:
                break
            decide = (
                self.decide_responses[(glean_done - 1) % len(self.decide_responses)]
                if self.decide_responses else ""
            )
            decide = decide.strip().strip('"').strip("'").strip().lower()
            if decide != "yes":
                break
        return rounds


RULES_REGISTRY = {
    "pattern": PatternRules,
    "word_cooccurrence": WordCooccurrenceRules,
}


class Extractor:
    """Actor-pool callable: chunks batch → mentions batch (Arrow in/out).

    Normalization fused in (reference dedupeLLMResult, insert.go:454-497):
    upper-case names/endpoints/types; type allowlist else UNKNOWN.  Rule
    tables are compiled once per actor.
    """

    def __init__(self, rules: str | ExtractionRules = "pattern",
                 glean_count: int | None = None,
                 max_retries: int = 3, backoff_s: float = 0.0) -> None:
        self.rules: ExtractionRules = (
            rules if isinstance(rules, ExtractionRules) else RULES_REGISTRY[rules]()
        )
        if glean_count is not None:
            self.rules.glean_count = glean_count
        self._allowed = {t.upper() for t in self.rules.entity_types} | {"UNKNOWN"}
        self.max_retries = max_retries
        self.backoff_s = backoff_s

    def _rounds_with_retry(self, doc_id, chunk_id, content):
        """Reference T6 retry shell (insert.go:326-348): semantic failures
        (unparseable model output → ValueError) retry with backoff up to
        ``max_retries``; once exhausted the chunk yields NO mentions and
        the pipeline continues (the reference's return-empty-maps path,
        insert.go:360-365).  Worker/task death is Ray's task retry, not
        ours."""
        import time

        for attempt in range(self.max_retries):
            try:
                return self.rules.extract_rounds(doc_id, chunk_id, content)
            except ValueError:
                if attempt + 1 < self.max_retries and self.backoff_s:
                    time.sleep(self.backoff_s)
        return []

    def __call__(self, batch: pa.Table) -> pa.Table:
        fast = getattr(self.rules, "extract_batch", None)
        if fast is not None:
            # vectorized kernel: already normalized + allowlisted by
            # construction (gazetteer types ⊂ allowed); equivalence to the
            # per-row path is property-tested and oracle-checked
            return fast(batch)
        cols: dict[str, list] = {name: [] for name in MENTIONS_SCHEMA.names}
        doc_ids = batch.column("doc_id").to_pylist()
        chunk_ids = batch.column("chunk_id").to_pylist()
        orders = batch.column("order_index").to_pylist()
        contents = batch.column("content").to_pylist()
        for doc_id, chunk_id, order_index, content in zip(
            doc_ids, chunk_ids, orders, contents
        ):
            mention_index = 0
            for ents, rels in self._rounds_with_retry(doc_id, chunk_id, content):
                for name, etype, desc in ents:
                    etype = etype.upper()
                    if etype not in self._allowed:
                        etype = "UNKNOWN"
                    cols["doc_id"].append(doc_id)
                    cols["chunk_id"].append(chunk_id)
                    cols["order_index"].append(order_index)
                    cols["mention_index"].append(mention_index)
                    cols["kind"].append("entity")
                    cols["name"].append(name.upper())
                    cols["type"].append(etype)
                    cols["src"].append("")
                    cols["tgt"].append("")
                    cols["description"].append(desc)
                    cols["keywords"].append([])
                    cols["weight"].append(0.0)
                    mention_index += 1
                for src, tgt, desc, kws, weight in rels:
                    cols["doc_id"].append(doc_id)
                    cols["chunk_id"].append(chunk_id)
                    cols["order_index"].append(order_index)
                    cols["mention_index"].append(mention_index)
                    cols["kind"].append("relationship")
                    cols["name"].append("")
                    cols["type"].append("")
                    cols["src"].append(src.upper())
                    cols["tgt"].append(tgt.upper())
                    cols["description"].append(desc)
                    cols["keywords"].append(kws)
                    cols["weight"].append(weight)
                    mention_index += 1
        return pa.Table.from_pydict(cols, schema=MENTIONS_SCHEMA)
