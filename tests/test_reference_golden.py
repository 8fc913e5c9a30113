"""Reference-golden parity: the canonical mock-LLM insert scenario.

Replays the reference's TestInsert "Successful insertion"
(reference insert_test.go:21-183: one chunk, the canned extraction JSON,
gleanCount=2, MockLLM returning the same payload every call) through OUR
pipeline — transcript extractor → canonicalize — and asserts the exact
merged node/edge/triple goldens the Go test asserts, plus triple P/R = 1.0
(the BASELINE P/R ≥ 0.95 gate at the unit seam).

Reference control-flow facts encoded here:
* the glean loop always runs once; the decide answer (the JSON payload,
  not "yes") stops it after round 1 → every mention appears TWICE;
* duplicate descriptions/keywords collapse via appendIfUnique
  (rag.go:230-235); relationship weight is additive across mentions
  (insert.go:609-612) → golden weight 2.0;
* chunk id is ``{doc}-chunk-0`` (insert.go:193-202).
"""

import pyarrow as pa
import pytest
import ray.data

from go_light_rag_ray.stages.canonicalize import canonicalize, sep_join
from go_light_rag_ray.stages.extractor import Extractor, TranscriptRules
from go_light_rag_ray.stages.llm_io import parse_llm_response

# verbatim payload of reference insert_test.go:28-54
MOCK_RESPONSE = """
{
  "entities": [
    {
      "entity_name": "ENTITY1",
      "entity_type": "PERSON",
      "entity_description": "This is a description of Entity1"
    },
    {
      "entity_name": "ENTITY2",
      "entity_type": "ORGANIZATION",
      "entity_description": "This is a description of Entity2"
    }
  ],
  "relationships": [
    {
      "source_entity": "ENTITY1",
      "target_entity": "ENTITY2",
      "relationship_description": "Entity1 is related to Entity2",
      "relationship_keywords": ["RELATED_TO", "RELATED", "TO"],
      "relationship_strength": 1.0
    }
  ]
}"""


def _golden_graph(ray_session):
    chunks = ray.data.from_arrow(pa.table({
        "doc_id": ["test-doc-1"],
        "chunk_id": ["test-doc-1-chunk-0"],
        "order_index": pa.array([0], pa.int32()),
        "content": ["Test content"],
    }))
    rules = TranscriptRules(
        base_response=MOCK_RESPONSE,
        entity_types=["PERSON", "ORGANIZATION"],
        max_glean_count=2,          # reference handler gleanCount: 2
    )
    mentions = chunks.map_batches(
        Extractor, fn_constructor_kwargs={"rules": rules},
        batch_format="pyarrow", concurrency=1,
    )
    return canonicalize(mentions, salt_buckets=4).take_all()


@pytest.fixture(scope="module")
def graph(ray_session):
    return _golden_graph(ray_session)


def test_glean_loop_runs_once_with_non_yes_decide():
    rules = TranscriptRules(MOCK_RESPONSE, max_glean_count=2)
    rounds = rules.extract_rounds("d", "c", "x")
    assert len(rounds) == 2          # base + exactly one glean round
    # explicit "yes" continues up to max_glean_count
    rules_yes = TranscriptRules(MOCK_RESPONSE, decide_responses=['"Yes"'],
                                max_glean_count=2)
    assert len(rules_yes.extract_rounds("d", "c", "x")) == 4  # base + 3 gleans


def test_golden_entities(graph):
    nodes = {r["entity_id"]: r for r in graph if r["kind"] == "node"}
    assert set(nodes) == {"ENTITY1", "ENTITY2"}          # insert_test.go:108-110
    e1 = nodes["ENTITY1"]
    assert e1["entity_type"] == "PERSON"                  # :117-119
    assert sep_join(e1["descriptions"]) == "This is a description of Entity1"
    assert sep_join(e1["source_ids"]) == "test-doc-1-chunk-0"   # :123-126
    e2 = nodes["ENTITY2"]
    assert e2["entity_type"] == "ORGANIZATION"            # :134-136
    assert "description of Entity2" in sep_join(e2["descriptions"])


def test_golden_relationship(graph):
    edges = [r for r in graph if r["kind"] == "edge"]
    assert len(edges) == 1                                # :144-146
    rel = edges[0]
    assert rel["src"] == "ENTITY1" and rel["tgt"] == "ENTITY2"  # :154-159
    assert "Entity1 is related to Entity2" in sep_join(rel["descriptions"])
    assert rel["keywords"] == ["RELATED_TO", "RELATED", "TO"]   # :163-175
    assert rel["source_ids"] == ["test-doc-1-chunk-0"]    # :177-180
    # weight: 1.0 per mention × 2 rounds, additive (insert.go:609-612)
    assert rel["weight"] == pytest.approx(2.0)


def test_triple_precision_recall(graph):
    """P/R vs the reference's emitted (subj, pred, obj) — gate ≥ 0.95."""
    ours = {(r["src"], r["keywords"][0], r["tgt"])
            for r in graph if r["kind"] == "edge"}
    golden = {("ENTITY1", "RELATED_TO", "ENTITY2")}
    tp = len(ours & golden)
    precision = tp / len(ours)
    recall = tp / len(golden)
    assert precision == 1.0 >= 0.95
    assert recall == 1.0 >= 0.95


def test_llm_response_scrubbing_paths():
    fenced = "```json\n" + MOCK_RESPONSE + "\n```"
    think = "<think>let me reason…</think>" + MOCK_RESPONSE
    trailing = MOCK_RESPONSE.replace(
        '"relationship_strength": 1.0', '"relationship_strength": 1.0,')
    for variant in (fenced, think, trailing, "chatter " + MOCK_RESPONSE + " bye"):
        ents, rels = parse_llm_response(variant)
        assert [e[0] for e in ents] == ["ENTITY1", "ENTITY2"]
        assert rels[0][3] == ["RELATED_TO", "RELATED", "TO"]
        assert rels[0][4] == 1.0
    with pytest.raises(ValueError):
        parse_llm_response("This is not a valid format")   # insert_test.go:186-216


def test_unknown_type_normalization(ray_session):
    """Types outside the handler allowlist become UNKNOWN (insert.go:454-470)."""
    payload = MOCK_RESPONSE.replace('"PERSON"', '"ALIEN"')
    chunks = ray.data.from_arrow(pa.table({
        "doc_id": ["d"], "chunk_id": ["d-chunk-0"],
        "order_index": pa.array([0], pa.int32()), "content": ["x"],
    }))
    rules = TranscriptRules(payload, entity_types=["PERSON", "ORGANIZATION"],
                            max_glean_count=0)
    rows = chunks.map_batches(
        Extractor, fn_constructor_kwargs={"rules": rules},
        batch_format="pyarrow", concurrency=1,
    ).take_all()
    e1 = next(r for r in rows if r["name"] == "ENTITY1")
    assert e1["type"] == "UNKNOWN"


class _FlakyRules(TranscriptRules):
    """Fails the first N extract calls, then succeeds (retry-shell probe)."""

    def __init__(self, fail_times: int, **kw):
        super().__init__(MOCK_RESPONSE, max_glean_count=0, **kw)
        self.fail_times = fail_times
        self.calls = 0

    def extract_rounds(self, doc_id, chunk_id, content):
        self.calls += 1
        if self.calls <= self.fail_times:
            raise ValueError("flaky model output")
        return super().extract_rounds(doc_id, chunk_id, content)


def test_retry_shell_recovers_then_gives_up():
    """T6: semantic failures retry up to max_retries, then the chunk yields
    no mentions (reference insert.go:326-348, 360-365)."""
    ok = Extractor(rules=_FlakyRules(fail_times=2), max_retries=3)
    batch = pa.table({
        "doc_id": ["d"], "chunk_id": ["d-chunk-0"],
        "order_index": pa.array([0], pa.int32()), "content": ["x"],
    })
    out = ok(batch)
    assert out.num_rows > 0                      # recovered on 3rd attempt

    dead = Extractor(rules=_FlakyRules(fail_times=5), max_retries=3)
    out2 = dead(batch)
    assert out2.num_rows == 0                    # exhausted → empty, no raise


def test_keyword_response_parse_matches_reference_scrub_order():
    """query.go:133-145: backslash strip → think strip → fence strip →
    repair → parse into high/low keyword lists."""
    from go_light_rag_ray.stages.llm_io import parse_keyword_response

    payload = (
        "<think>hmm</think>```json\n"
        '{\\"high_level_keywords\\": [\\"architecture\\"],'
        ' \\"low_level_keywords\\": [\\"spark\\", \\"cache\\"],}'
        "\n```"
    )
    high, low = parse_keyword_response(payload)
    assert high == ["architecture"]
    assert low == ["spark", "cache"]
    import pytest as _pytest
    with _pytest.raises(ValueError):
        parse_keyword_response("not json at all")
