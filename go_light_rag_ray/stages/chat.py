"""Chat-protocol LLM seam (reference rag.go:15-20 ``LLM.Chat``).

The reference's whole model-extension surface is one function:
``Chat(messages []string) (string, error)`` where even indices are user
turns and odd indices assistant turns; five adapters (llm/openai.go,
anthropic.go, ollama.go, openrouter.go, openaicompat.go) implement it.
This module is the Ray-side equivalent: a ``chat_fn(messages) -> str``
callable plugs into ``ChatRules``, which

* renders the reference's prompt templates (prompt.go:71-270) with the
  handler's goal / entity types / language / examples
  (handler/prompt.go:6-12 defaults), and
* drives the EXACT extraction control flow of insert.go:298-452: initial
  extract → scrub (backticks, think-tags) → JSON-repair → parse →
  append-to-history → glean rounds with the glean prompt → after each
  glean, the decide-continue question whose answer must be the literal
  "yes" (trimmed of quotes, lower-cased, insert.go:438-448) to keep
  gleaning, bounded by ``max_glean_count``.

``ChatRules`` is an ``ExtractionRules``, so it deploys exactly like the
hermetic rule sets: once per actor in the ``Extractor`` pool
(``map_batches(Extractor, fn_constructor_kwargs={"rules": ChatRules(fn)})``),
with the Extractor's retry shell (T6) owning parse-failure retries.
``transcript_chat`` turns canned responses into a ``chat_fn`` — the
reference's MockLLM (tests/rag_test.go:102-112) expressed through the same
seam the real adapters use.
"""

from __future__ import annotations

from typing import Callable, Sequence

from .extractor import ExtractionRules
from .llm_io import (
    json_repair,
    parse_llm_response,
    remove_markdown_backticks,
    remove_think_tags,
)

ChatFn = Callable[[list[str]], str]

# handler/prompt.go:6-12 defaults
DEFAULT_ENTITY_EXTRACTION_GOAL = (
    "\nGiven a text document that is potentially relevant to this activity "
    "and a list of entity types, identify all entities of those types from "
    "the text and all relationships among the identified entities."
)
DEFAULT_ENTITY_TYPES = ["organization", "person", "geo", "event", "category"]
DEFAULT_LANGUAGE = "English"


def _entity_types_list(entity_types: Sequence[str]) -> str:
    return ", ".join(entity_types)


def _render_example(i: int, ex: dict) -> str:
    """One ---Examples--- block (prompt.go:113-147)."""
    ents = ",\n".join(
        "    {\n"
        f'      "entity_name": "{e["name"]}",\n'
        f'      "entity_type": "{e["type"]}",\n'
        f'      "entity_description": "{e["description"]}"\n'
        "    }"
        for e in ex.get("entities", [])
    )
    rels = ",\n".join(
        "    {\n"
        f'      "source_entity": "{r["source_entity"]}",\n'
        f'      "target_entity": "{r["target_entity"]}",\n'
        f'      "relationship_description": "{r["description"]}",\n'
        '      "relationship_keywords": ['
        + ", ".join(f'"{k}"' for k in r.get("keywords", []))
        + "],\n"
        f'      "relationship_strength": {r.get("strength", 1)}\n'
        "    }"
        for r in ex.get("relationships", [])
    )
    return (
        f"Example {i + 1}:\n\n"
        f"Text:\n{ex['text']}\n"
        "################\n"
        "Output:\n"
        "{\n"
        f'  "entities": [\n{ents}\n  ],\n'
        f'  "relationships": [\n{rels}\n  ],\n'
        "}\n"
        "#############################"
    )


_STEPS = """---Steps---
1. Identify all entities. For each identified entity, extract the following information:
- entity_name: Name of the entity, use same language as input text. If {language}, capitalized the name.
- entity_type: STRICTLY use ONLY one of the exact entity types provided here (no variations, plurals, or additions): [{entity_types}]
- entity_description: Comprehensive description of the entity's attributes and activities

2. From the entities identified in step 1, identify all pairs of (source_entity, target_entity) that are *clearly related* to each other.
For each pair of related entities, extract the following information:
- source_entity: name of the source entity, as identified in step 1
- target_entity: name of the target entity, as identified in step 1
- relationship_description: explanation as to why you think the source entity and the target entity are related to each other
- relationship_strength: a numeric score indicating strength of the relationship between the source entity and target entity (use a number between 1-10)
- relationship_keywords: one or more high-level key words that summarize the overarching nature of the relationship, focusing on concepts or themes rather than specific details

3. Extract high-level keywords that summarize the main concepts or themes present in the document.

4. Format your output as a VALID JSON object with the following structure:
{{
  "entities": [
    {{
      "entity_name": string,
      "entity_type": string (one of the provided entity types ONLY),
      "entity_description": string
    }}
  ],
  "relationships": [
    {{
      "source_entity": string,
      "target_entity": string,
      "relationship_description": string,
      "relationship_keywords": array of strings,
      "relationship_strength": number (1-10)
    }}
  ],
}}

5. The JSON output MUST be valid JSON with no explanation text before or after it. Do not include any markdown formatting like backticks, and do not include any text outside the JSON structure."""


def render_extract_prompt(
    content: str,
    goal: str = DEFAULT_ENTITY_EXTRACTION_GOAL,
    entity_types: Sequence[str] = tuple(DEFAULT_ENTITY_TYPES),
    language: str = DEFAULT_LANGUAGE,
    examples: Sequence[dict] = (),
) -> str:
    """extractEntitiesPrompt (prompt.go:71-156)."""
    et = _entity_types_list(entity_types)
    parts = [
        f"---Goal---\n{goal}\n",
        _STEPS.format(language=language, entity_types=et),
        "\n######################\n---Examples---\n######################",
    ]
    for i, ex in enumerate(examples):
        parts.append(_render_example(i, ex))
    parts.append(
        "\n#############################\n"
        "---Real Data---\n"
        "######################\n"
        f"Entity_types: [{et}]\n"
        f"Text:\n{content}\n"
        "######################\n"
        "Output:"
    )
    return "\n".join(parts)


def render_glean_prompt(
    entity_types: Sequence[str] = tuple(DEFAULT_ENTITY_TYPES),
    language: str = DEFAULT_LANGUAGE,
) -> str:
    """gleanEntitiesPrompt (prompt.go:158-202)."""
    return (
        "\nMANY entities and relationships were missed in the last "
        "extraction. Please identify additional entities and relationships."
        "\n\n---Remember Steps---\n\n"
        + _STEPS.format(language=language,
                        entity_types=_entity_types_list(entity_types))
        + "\n\n---Output---\n\n"
        "Please provide the additional entities and relationships in valid "
        "JSON format:"
    )


# gleanDecideContinuePrompt (prompt.go:204-212)
GLEAN_DECIDE_CONTINUE_PROMPT = (
    "\n---Goal---\n\n"
    "It appears some entities may have still been missed.\n\n"
    "---Output---\n\n"
    'Answer ONLY by "YES" OR "NO" if there are still entities that need to '
    "be added."
)


def render_keyword_prompt(
    query: str,
    history: str = "",
    goal: str = "",
    examples: Sequence[dict] = (),
) -> str:
    """keywordExtractionPrompt (prompt.go:231-270): query + conversation
    history both inform keyword extraction (query.go:104-126)."""
    parts = [
        "---Role---\n\n"
        "You are a helpful assistant tasked with identifying both "
        "high-level and low-level keywords in the user's query and "
        "conversation history.\n\n"
        f"---Goal---\n\n{goal}\n\n"
        "---Instructions---\n\n"
        "- Consider both the current query and relevant conversation "
        "history when extracting keywords\n"
        "- Output the keywords in JSON format, it will be parsed by a JSON "
        "parser, do not add any extra content in output\n"
        '- The JSON should have two keys:\n'
        '  - "high_level_keywords" for overarching concepts or themes\n'
        '  - "low_level_keywords" for specific entities or details\n\n'
        "######################\n---Examples---\n######################",
    ]
    for i, ex in enumerate(examples):
        high = ", ".join(f'"{k}"' for k in ex.get("high_level_keywords", []))
        low = ", ".join(f'"{k}"' for k in ex.get("low_level_keywords", []))
        parts.append(
            f"Example {i + 1}:\n\n"
            f"Query: {ex['query']}\n"
            "################\n"
            "Output:\n"
            "{\n"
            f'  "high_level_keywords": [{high}],\n'
            f'  "low_level_keywords": [{low}]\n'
            "}\n"
            "#############################"
        )
    parts.append(
        "-Real Data-\n"
        "######################\n"
        f"Conversation History:\n{history}\n\n"
        f"Current Query: {query}\n"
        "######################\n"
        'The "Output" should be human text, not unicode characters. Keep '
        'the same language as "Query".\n'
        "Output:\n"
    )
    return "\n".join(parts)


def _scrub(text: str) -> str:
    """insert.go:345-356 response scrub order: backticks → think → repair."""
    return json_repair(remove_think_tags(remove_markdown_backticks(text)))


class ChatRules(ExtractionRules):
    """Drive any ``Chat(messages) -> str`` through the reference's
    extract → glean → decide loop (insert.go:298-452), yielding one
    mention round per parsed response.

    Parse failures raise ``ValueError`` — the ``Extractor`` retry shell
    (T6, insert.go:326-336) owns backoff/retry, and after exhaustion the
    chunk contributes no mentions (insert.go:360-365).
    """

    def __init__(
        self,
        chat_fn: ChatFn,
        goal: str = DEFAULT_ENTITY_EXTRACTION_GOAL,
        entity_types: Sequence[str] | None = None,
        language: str = DEFAULT_LANGUAGE,
        examples: Sequence[dict] = (),
        max_glean_count: int = 1,
    ) -> None:
        self.chat = chat_fn
        self.goal = goal
        self.entity_types = list(entity_types or DEFAULT_ENTITY_TYPES)
        self.language = language
        self.examples = list(examples)
        self.glean_count = max_glean_count

    def extract_rounds(self, doc_id, chunk_id, content):
        extract_prompt = render_extract_prompt(
            content, self.goal, self.entity_types, self.language, self.examples
        )
        glean_prompt = render_glean_prompt(self.entity_types, self.language)

        histories = [extract_prompt]
        scrubbed = _scrub(self.chat(list(histories)))
        rounds = [parse_llm_response(scrubbed)]
        histories.append(scrubbed)

        glean_done = 0
        while True:
            histories.append(glean_prompt)
            scrubbed = _scrub(self.chat(list(histories)))
            histories.append(scrubbed)
            rounds.append(parse_llm_response(scrubbed))
            glean_done += 1
            if glean_done > self.glean_count:
                break
            decide = self.chat(list(histories) + [GLEAN_DECIDE_CONTINUE_PROMPT])
            decide = decide.strip().strip('"').strip("'").strip().lower()
            if decide != "yes":
                break
        return rounds


# semanticChunkingPrompt (prompt.go:707-730), abridged to the load-bearing
# instruction + output contract (the examples section is advisory)
SEMANTIC_CHUNKING_PROMPT = """---Goal---
Analyze the given text and divide it into semantically coherent sections based on thematic shifts, logical structure, or natural section boundaries.

---Instructions---
1. Carefully read and understand the entire text.
2. Identify natural semantic boundaries where the topic, focus, or theme shifts.
3. Divide the text into non-overlapping sections at these boundaries.
4. For each section, provide:
   - section_summary: A brief summary of the section's content (2-3 sentences)
   - start_position: The position in the text where this section begins (use character index, starting from 0)
   - end_position: The position in the text where this section ends (use character index)

5. Format your output as a VALID JSON object with the following structure:
{
  "sections": [
    {
      "section_summary": string,
      "start_position": number,
      "end_position": number
    }
  ]
}

6. The JSON output MUST be valid JSON with no explanation text before or after it. Do not include any markdown formatting like backticks, and do not include any text outside the JSON structure.

Text:
{content}
"""


def chat_sectioner(chat_fn: ChatFn):
    """Semantic-chunking LLM seam (reference handler/semantic.go:112-163):
    render the sectioning prompt, one chat turn, scrub, parse
    ``{"sections": [{start_position, end_position}, …]}`` with the
    brace-window JSON rescue, clamp positions to the text (semantic.go:
    151-158), and return [(start, end)] spans.  Raises ``ValueError`` on
    unparseable/empty output — ``chunk_semantic`` then falls back to the
    Default window, exactly as the reference does."""
    import json

    def sectioner(piece: str) -> list[tuple[int, int]]:
        prompt = SEMANTIC_CHUNKING_PROMPT.replace("{content}", piece)
        resp = remove_think_tags(remove_markdown_backticks(
            self_chat(prompt)))
        try:
            obj = json.loads(resp)
        except json.JSONDecodeError:
            start, end = resp.find("{"), resp.rfind("}")
            if not (start >= 0 and end > start):
                raise ValueError("no JSON object in sectioner response")
            obj = json.loads(resp[start:end + 1])
        sections = obj.get("sections") or []
        if not sections:
            raise ValueError("LLM did not identify any semantic sections")
        out: list[tuple[int, int]] = []
        for s in sections:
            a = max(0, int(s.get("start_position", 0)))
            b = min(len(piece), int(s.get("end_position", 0)))
            if a < b:
                out.append((a, b))
        if not out:
            raise ValueError("no valid semantic sections")
        return out

    def self_chat(prompt: str) -> str:
        return chat_fn([prompt])

    return sectioner


def transcript_chat(
    base_response: str,
    glean_responses: Sequence[str] | None = None,
    decide_responses: Sequence[str] | None = None,
) -> ChatFn:
    """Canned-response ``chat_fn`` (the reference MockLLM,
    tests/rag_test.go:102-112, expressed through the Chat seam): the last
    message routes the reply — decide prompt → next decide response, glean
    prompt → next glean response, else the base response."""
    gleans = list(glean_responses or [base_response])
    decides = list(decide_responses or [])
    counters = {"glean": 0, "decide": 0}

    def chat(messages: list[str]) -> str:
        last = messages[-1]
        if last == GLEAN_DECIDE_CONTINUE_PROMPT:
            if not decides:
                return "no"
            resp = decides[counters["decide"] % len(decides)]
            counters["decide"] += 1
            return resp
        if last.startswith("\nMANY entities and relationships were missed"):
            resp = gleans[counters["glean"] % len(gleans)]
            counters["glean"] += 1
            return resp
        return base_response

    return chat


def http_chat(
    endpoint: str | None = None,
    model: str | None = None,
    api_key: str | None = None,
    max_retries: int = 3,
    backoff_s: float = 0.5,
    timeout_s: float = 60.0,
    sleep=None,
) -> ChatFn:
    """OpenAI-compatible ``/chat/completions`` adapter behind the Chat
    seam (the reference's llm/openai.go:23-98 / openaicompat.go, stdlib
    ``urllib`` — no extra dependency).

    The reference's ``[]string`` message convention maps to roles by
    index parity (even = user, odd = assistant — llm/openai.go:41-49).
    Transport/HTTP errors retry with exponential backoff, the envelope of
    the reference's insert-loop retry (insert.go:326-348); response
    *content* problems (bad JSON from the model) are NOT retried here —
    the ``Extractor`` retry shell (T6) owns those, exactly as in the
    reference.

    ``endpoint`` defaults to ``$GRAFT_CHAT_ENDPOINT`` (a base URL such as
    ``http://localhost:8080/v1``); the adapter is only constructible when
    one is configured, so hermetic runs never touch the network.
    ``sleep`` is injectable for tests."""
    import json
    import os
    import time
    import urllib.error
    import urllib.request

    endpoint = endpoint or os.environ.get("GRAFT_CHAT_ENDPOINT")
    if not endpoint:
        raise ValueError(
            "http_chat needs an endpoint (arg or $GRAFT_CHAT_ENDPOINT)")
    model = model or os.environ.get("GRAFT_CHAT_MODEL", "default")
    api_key = api_key if api_key is not None else os.environ.get(
        "GRAFT_CHAT_API_KEY")
    url = endpoint.rstrip("/") + "/chat/completions"
    do_sleep = sleep if sleep is not None else time.sleep

    def chat(messages: list[str]) -> str:
        payload = json.dumps({
            "model": model,
            "messages": [
                {"role": "user" if i % 2 == 0 else "assistant", "content": m}
                for i, m in enumerate(messages)
            ],
        }).encode()
        headers = {"Content-Type": "application/json"}
        if api_key:
            headers["Authorization"] = f"Bearer {api_key}"
        last_err: Exception | None = None
        for attempt in range(max_retries + 1):
            try:
                req = urllib.request.Request(url, data=payload,
                                             headers=headers, method="POST")
                with urllib.request.urlopen(req, timeout=timeout_s) as resp:
                    body = json.loads(resp.read().decode("utf-8"))
                return body["choices"][0]["message"]["content"]
            except urllib.error.HTTPError as exc:
                # 4xx (except 429) means the REQUEST is wrong — bad auth,
                # bad model name, malformed payload.  Backoff cannot fix
                # it; fail fast instead of burning max_retries cycles.
                last_err = exc
                if exc.code < 500 and exc.code != 429:
                    raise RuntimeError(
                        f"chat endpoint rejected the request "
                        f"(HTTP {exc.code}, not retryable): {exc}") from exc
                if attempt < max_retries:
                    do_sleep(backoff_s * (2 ** attempt))
            except (urllib.error.URLError, OSError, KeyError,
                    IndexError, json.JSONDecodeError) as exc:
                last_err = exc
                if attempt < max_retries:
                    do_sleep(backoff_s * (2 ** attempt))
        raise RuntimeError(
            f"chat endpoint failed after {max_retries + 1} attempts: "
            f"{last_err}") from last_err

    return chat
