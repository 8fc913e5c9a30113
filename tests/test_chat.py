"""Chat-protocol seam: ChatRules drives the reference's extract/glean/
decide loop (insert.go:298-452) over any ``chat(messages) -> str``; the
canned ``transcript_chat`` must reproduce TranscriptRules mention-for-
mention, and the rendered prompts must carry the reference template
structure (prompt.go:71-270)."""

from go_light_rag_ray.stages.chat import (
    GLEAN_DECIDE_CONTINUE_PROMPT,
    ChatRules,
    render_extract_prompt,
    render_glean_prompt,
    render_keyword_prompt,
    transcript_chat,
)
from go_light_rag_ray.stages.extractor import TranscriptRules
from tests.test_reference_golden import MOCK_RESPONSE


def test_prompt_structure_matches_reference_template():
    p = render_extract_prompt(
        "Some input text.",
        entity_types=["person", "organization"],
        examples=[{
            "text": "Alice works at Acme.",
            "entities": [
                {"name": "Alice", "type": "person",
                 "description": "An engineer"},
            ],
            "relationships": [
                {"source_entity": "Alice", "target_entity": "Acme",
                 "description": "employment", "keywords": ["works_at"],
                 "strength": 7},
            ],
        }],
    )
    # the load-bearing template sections, in order (prompt.go:71-156)
    for needle in ("---Goal---", "---Steps---",
                   "STRICTLY use ONLY one of the exact entity types",
                   "[person, organization]", "---Examples---", "Example 1:",
                   '"entity_name": "Alice"', "---Real Data---",
                   "Text:\nSome input text.", "Output:"):
        assert needle in p, needle
    assert p.index("---Goal---") < p.index("---Steps---") < p.index(
        "---Examples---") < p.index("---Real Data---")

    g = render_glean_prompt(["person"])
    assert g.startswith("\nMANY entities and relationships were missed")
    assert "---Remember Steps---" in g
    assert 'Answer ONLY by "YES" OR "NO"' in GLEAN_DECIDE_CONTINUE_PROMPT


def test_keyword_prompt_includes_history():
    p = render_keyword_prompt(
        "what systems filed reports?",
        history="user: earlier question\nassistant: earlier answer",
        examples=[{"query": "q1", "high_level_keywords": ["H"],
                   "low_level_keywords": ["l"]}],
    )
    assert "Conversation History:\nuser: earlier question" in p
    assert "Current Query: what systems filed reports?" in p
    assert '"high_level_keywords": ["H"]' in p


def test_chat_seam_matches_transcript_rules():
    """Reference-golden control flow through the Chat seam: identical
    mention rounds to the TranscriptRules playback."""
    via_transcript = TranscriptRules(
        MOCK_RESPONSE, entity_types=["PERSON", "ORGANIZATION"],
        max_glean_count=2,
    ).extract_rounds("d", "c", "Test content")
    via_chat = ChatRules(
        transcript_chat(MOCK_RESPONSE),
        entity_types=["PERSON", "ORGANIZATION"],
        max_glean_count=2,
    ).extract_rounds("d", "c", "Test content")
    assert via_chat == via_transcript
    # decide answer is the JSON payload (not "yes") → exactly 2 rounds
    assert len(via_chat) == 2


def test_chat_loop_decide_yes_continues():
    calls = []

    def chat(messages):
        calls.append(list(messages))
        last = messages[-1]
        if last == GLEAN_DECIDE_CONTINUE_PROMPT:
            return ' "YES" '  # quote/space/case-insensitive (insert.go:438)
        return MOCK_RESPONSE

    rounds = ChatRules(chat, max_glean_count=2).extract_rounds("d", "c", "x")
    # insert.go:418-421 breaks only when gleanCount EXCEEDS the max:
    # base + glean1 (yes) + glean2 (yes) + glean3 (counter 3 > 2) = 4 rounds
    assert len(rounds) == 4
    # history grows as user/assistant alternation: extract, response,
    # glean, response, ... (rag.go:17-19 even=user odd=assistant)
    assert len(calls[-1]) % 2 == 1 or calls[-1][-1] == GLEAN_DECIDE_CONTINUE_PROMPT


def test_chat_history_alternation():
    """Every chat call sends an odd-length message list ending in a user
    turn (even indices user, odd assistant — rag.go:17-19)."""
    seen = []

    def chat(messages):
        seen.append(len(messages))
        if messages[-1] == GLEAN_DECIDE_CONTINUE_PROMPT:
            return "no"
        return MOCK_RESPONSE

    ChatRules(chat, max_glean_count=3).extract_rounds("d", "c", "x")
    assert all(n % 2 == 1 for n in seen)


def test_extractor_pool_accepts_chat_rules(ray_session):
    """ChatRules deploys through the same actor-pool Extractor stage."""
    import pyarrow as pa
    import ray.data

    from go_light_rag_ray.stages.canonicalize import canonicalize
    from go_light_rag_ray.stages.extractor import Extractor

    chunks = ray.data.from_arrow(pa.table({
        "doc_id": ["test-doc-1"],
        "chunk_id": ["test-doc-1-chunk-0"],
        "order_index": pa.array([0], pa.int32()),
        "content": ["Test content"],
    }))
    rules = ChatRules(
        transcript_chat(MOCK_RESPONSE),
        entity_types=["PERSON", "ORGANIZATION"],
        max_glean_count=2,
    )
    mentions = chunks.map_batches(
        Extractor, fn_constructor_kwargs={"rules": rules},
        batch_format="pyarrow", concurrency=1,
    )
    rows = canonicalize(mentions, salt_buckets=4).take_all()
    nodes = {r["entity_id"]: r for r in rows if r["kind"] == "node"}
    edges = [r for r in rows if r["kind"] == "edge"]
    assert set(nodes) == {"ENTITY1", "ENTITY2"}
    assert nodes["ENTITY1"]["entity_type"] == "PERSON"
    assert len(edges) == 1 and edges[0]["weight"] == 2.0  # two rounds, additive


def test_keyword_extract_uses_history():
    from go_light_rag_ray.pipelines.query import keyword_extract, render_history

    # entity word only in history, relationship word only in query
    high, low = keyword_extract(
        "how does merge work?",
        render_history([{"role": "user", "message": "tell me about spark"}]))
    assert "SPARK" in low        # from history
    assert "MERGE" in high       # from query
    # no history → history-only words absent
    high2, low2 = keyword_extract("how does merge work?")
    assert "SPARK" not in low2


def test_keyword_extract_chat_seam():
    from go_light_rag_ray.pipelines.query import keyword_extract_chat

    def chat(messages):
        assert "Conversation History:" in messages[0]
        assert "Current Query: q" in messages[0]
        return '{"high_level_keywords": ["THEME"], "low_level_keywords": ["spark"]}'

    high, low = keyword_extract_chat(chat, "q", history="role: user, content: h")
    assert high == ["THEME"] and low == ["spark"]


def test_chat_sectioner_drives_semantic_chunker():
    """The semantic chunker's LLM seam (semantic.go:112-163): a chat fn
    returns sections JSON; invalid positions clamp; garbage falls back to
    the Default window inside chunk_semantic."""
    import json

    from go_light_rag_ray.stages.chat import chat_sectioner
    from go_light_rag_ray.stages.handlers import chunk_semantic

    text = ("alpha " * 300 + "\n\n" + "beta " * 300).strip()

    def chat(messages):
        assert "semantically coherent sections" in messages[0]
        half = len(text) // 2
        return json.dumps({"sections": [
            {"section_summary": "first", "start_position": -5,
             "end_position": half},
            {"section_summary": "second", "start_position": half,
             "end_position": len(text) + 99},
            {"section_summary": "bogus", "start_position": 50,
             "end_position": 10},
        ]})

    chunks = chunk_semantic(text, max_tokens=400, overlap_tokens=0,
                            threshold_tokens=100,
                            sectioner=chat_sectioner(chat))
    assert len(chunks) >= 2
    joined = " ".join(c for c, _, _ in chunks)
    assert "alpha" in joined and "beta" in joined

    def bad_chat(messages):
        return "certainly! here are no sections at all"

    fallback = chunk_semantic(text, max_tokens=400, overlap_tokens=0,
                              threshold_tokens=100,
                              sectioner=chat_sectioner(bad_chat))
    assert fallback  # default-window fallback, not an exception


def test_chat_sectioner_brace_rescue():
    from go_light_rag_ray.stages.chat import chat_sectioner

    def chat(messages):
        return ('Sure! ```json\n{"sections": [{"section_summary": "s", '
                '"start_position": 0, "end_position": 5}]}\n``` hope it helps')

    spans = chat_sectioner(chat)("hello world")
    assert spans == [(0, 5)]


def test_chat_summarizer_seam():
    """T4 through the Chat seam (reference insert.go:692-723): overflow rows
    get ONE rendered summarize-descriptions prompt and become [summary];
    short rows never touch the model; a failing chat_fn falls back to the
    deterministic summary."""
    import pyarrow as pa

    from go_light_rag_ray.stages.summarize import (
        ChatSummarizer,
        summarize_descriptions,
    )
    from go_light_rag_ray.tokenizer import get_tokenizer

    long_descs = [f"description number {i} with several words" for i in range(20)]
    short_descs = ["tiny"]
    batch = pa.table({
        "kind": ["node", "edge"],
        "entity_id": ["ALPHA", None],
        "src": [None, "A"],
        "tgt": [None, "B"],
        "descriptions": [short_descs, long_descs],
    })

    seen_prompts = []

    def chat(messages):
        seen_prompts.append(messages[-1])
        return "A coherent merged summary."

    out = ChatSummarizer(chat_fn=chat, max_tokens=30)(batch)
    got = out.column("descriptions").to_pylist()
    assert got[0] == short_descs                      # under budget: untouched
    assert got[1] == ["A coherent merged summary."]   # overflow: one summary
    assert len(seen_prompts) == 1
    # the rendered prompt carries the reference template's data section:
    # composite SRC-TGT key, bracketed ", "-joined list, language line
    p = seen_prompts[0]
    assert "Entities: A-B" in p
    assert "Description List: [" + ", ".join(long_descs) + "]" in p
    assert "Use English as the language." in p

    def bad_chat(messages):
        raise RuntimeError("model down")

    fb = ChatSummarizer(chat_fn=bad_chat, max_tokens=30)(batch)
    assert fb.column("descriptions").to_pylist()[1] == summarize_descriptions(
        long_descs, get_tokenizer("regex"), 30)


def test_chat_summarizer_in_pipeline():
    """Handler.summarize_chat_fn routes the flagship pipeline's summarize
    stage through the seam; deterministic mode (None) is unchanged."""
    import pyarrow as pa
    import ray.data

    from go_light_rag_ray.pipelines.kg import Handler, kg_pipeline

    docs = ray.data.from_arrow(pa.table({
        "doc_id": ["d1"],
        "text": ["spark query vector " * 40],  # gazetteer words
    }))

    def chat(messages):
        return "seam summary"

    handler = Handler(tokenizer="regex", rules="word_cooccurrence",
                      content_mode="text", max_summaries_token_length=5,
                      summarize_chat_fn=chat,
                      chunker_concurrency=(1, 1), extractor_concurrency=(1, 1))
    rows = kg_pipeline(docs, handler).take_all()
    assert rows
    overflowed = [r for r in rows if r["descriptions"] == ["seam summary"]]
    assert overflowed, "expected at least one summarized row"


# ---------------------------------------------------------------------------
# http_chat: the real-adapter seam against a local fake OpenAI server
# ---------------------------------------------------------------------------

def _fake_openai_server(script):
    """Start a loopback HTTP server; ``script`` is a list of handlers —
    each request pops the next entry: int → respond that status with empty
    body; str → 200 with an OpenAI-shaped completion payload.  Returns
    (base_url, seen_payloads, shutdown_fn)."""
    import json
    import threading
    from http.server import BaseHTTPRequestHandler, HTTPServer

    seen = []

    class H(BaseHTTPRequestHandler):
        def do_POST(self):
            n = int(self.headers.get("Content-Length", 0))
            seen.append(json.loads(self.rfile.read(n).decode()))
            step = script.pop(0) if script else 500
            if isinstance(step, int):
                self.send_response(step)
                self.end_headers()
                return
            body = json.dumps({"choices": [{"message": {
                "role": "assistant", "content": step}}]}).encode()
            self.send_response(200)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def log_message(self, *a):  # quiet
            pass

    srv = HTTPServer(("127.0.0.1", 0), H)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    return (f"http://127.0.0.1:{srv.server_port}/v1", seen,
            srv.shutdown)


def test_http_chat_retries_transport_errors_then_succeeds():
    from go_light_rag_ray.stages.chat import http_chat

    url, seen, stop = _fake_openai_server([500, 500, "hello back"])
    naps = []
    try:
        chat = http_chat(endpoint=url, model="m1", api_key="k",
                         max_retries=3, backoff_s=0.1,
                         sleep=naps.append)
        out = chat(["hi there", "prior reply", "again"])
    finally:
        stop()
    assert out == "hello back"
    assert naps == [0.1, 0.2]                       # exponential envelope
    assert len(seen) == 3
    # []string → role-by-parity mapping (llm/openai.go:41-49)
    assert [m["role"] for m in seen[-1]["messages"]] == [
        "user", "assistant", "user"]
    assert seen[-1]["model"] == "m1"


def test_http_chat_exhausts_and_raises():
    import pytest

    from go_light_rag_ray.stages.chat import http_chat

    url, _seen, stop = _fake_openai_server([500, 500, 500])
    try:
        chat = http_chat(endpoint=url, max_retries=2, backoff_s=0,
                         sleep=lambda s: None)
        with pytest.raises(RuntimeError, match="after 3 attempts"):
            chat(["hi"])
    finally:
        stop()


def test_http_chat_requires_endpoint(monkeypatch):
    import pytest

    from go_light_rag_ray.stages.chat import http_chat

    monkeypatch.delenv("GRAFT_CHAT_ENDPOINT", raising=False)
    with pytest.raises(ValueError, match="endpoint"):
        http_chat()


def test_http_chat_drives_full_glean_loop():
    """The reference extract → glean → decide loop (insert.go:298-452)
    through the REAL network adapter against the fake server: base
    extraction + one glean + a decide-continue 'no'."""
    from go_light_rag_ray.stages.chat import ChatRules, http_chat

    base = (
        '{"entities": [{"entity_name": "ACME", "entity_type":'
        ' "organization", "entity_description": "a company"}],'
        ' "relationships": []}'
    )
    glean = (
        '{"entities": [{"entity_name": "BOB", "entity_type": "person",'
        ' "entity_description": "a person"}], "relationships":'
        ' [{"source_entity": "ACME", "target_entity": "BOB",'
        ' "relationship_description": "employs",'
        ' "relationship_keywords": ["employment"],'
        ' "relationship_strength": 2.0}]}'
    )
    url, seen, stop = _fake_openai_server([base, glean, '"no"'])
    try:
        rules = ChatRules(http_chat(endpoint=url, backoff_s=0,
                                    sleep=lambda s: None),
                          max_glean_count=1)
        rounds = rules.extract_rounds("d1", "c1", "ACME hired BOB.")
    finally:
        stop()
    ents = [e for ents, _ in rounds for e in ents]
    rels = [r for _, rels in rounds for r in rels]
    assert {e[0] for e in ents} == {"ACME", "BOB"}
    assert rels and rels[0][0] == "ACME" and rels[0][1] == "BOB"
    assert len(seen) == 3                 # extract, glean, decide


def test_http_chat_fails_fast_on_4xx():
    """Non-retryable client errors (bad auth, bad model) abort immediately
    instead of burning max_retries backoff cycles; 429 and 5xx still
    retry (ADVICE r4)."""
    import pytest

    from go_light_rag_ray.stages.chat import http_chat

    url, seen, stop = _fake_openai_server([401, 200])
    naps = []
    try:
        chat = http_chat(endpoint=url, max_retries=5, backoff_s=1.0,
                         sleep=naps.append)
        with pytest.raises(RuntimeError, match="HTTP 401"):
            chat(["hi"])
    finally:
        stop()
    assert len(seen) == 1 and naps == []      # no retry, no backoff
    # 429 DOES retry
    url, seen, stop = _fake_openai_server([429, "ok then"])
    try:
        chat = http_chat(endpoint=url, max_retries=2, backoff_s=0,
                         sleep=lambda s: None)
        assert chat(["hi"]) == "ok then"
    finally:
        stop()
    assert len(seen) == 2


def test_http_chat_through_extract_mentions_pipeline(ray_session):
    """VERDICT r4 #7: the full extract → glean → decide loop through the
    REAL network adapter INSIDE the Ray actor pool — ``extract_mentions``
    runs ``ChatRules(http_chat(...))`` per chunk against the local fake
    server, with one transport 500 retried by the in-actor envelope."""
    import pyarrow as pa
    import ray.data

    from go_light_rag_ray.pipelines.kg import (Handler, chunk_documents,
                                               extract_mentions)
    from go_light_rag_ray.sources.io import flat_documents_as_interleaved
    from go_light_rag_ray.stages.chat import ChatRules, http_chat

    base = (
        '{"entities": [{"entity_name": "ACME", "entity_type":'
        ' "organization", "entity_description": "a company"}],'
        ' "relationships": []}'
    )
    glean = (
        '{"entities": [], "relationships":'
        ' [{"source_entity": "ACME", "target_entity": "BOB",'
        ' "relationship_description": "employs",'
        ' "relationship_keywords": ["employment"],'
        ' "relationship_strength": 2.0}]}'
    )
    # 2 docs → 2 chunks, 3 calls each, +1 retried transport 500 up front;
    # both chunks share identical payloads so arrival order is irrelevant
    script = [500] + [base, glean, '"no"'] * 2
    url, seen, stop = _fake_openai_server(script)
    try:
        flat = pa.table({"doc_id": pa.array([1, 2], pa.int64()),
                         "text": ["acme hired bob", "acme fired bob"]})
        docs = ray.data.from_arrow(flat).map_batches(
            flat_documents_as_interleaved, batch_format="pyarrow")
        handler = Handler(
            rules=ChatRules(http_chat(endpoint=url, backoff_s=0,
                                      sleep=lambda s: None),
                            max_glean_count=1),
            chunker_concurrency=1, extractor_concurrency=1)
        rows = extract_mentions(
            chunk_documents(docs, handler), handler).take_all()
    finally:
        stop()
    assert len(seen) == 7                 # 1 retried + (extract/glean/decide)×2
    names = {r["name"] for r in rows if r["kind"] == "entity"}
    assert "ACME" in names
    rels = [r for r in rows if r["kind"] == "relationship"]
    # glean-round relationship with a placeholder endpoint survived the pool
    assert any(r["src"] == "ACME" and r["tgt"] == "BOB" for r in rels)
