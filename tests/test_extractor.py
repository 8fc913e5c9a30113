import pyarrow as pa

from go_light_rag_ray.schemas import CHUNKS_SCHEMA
from go_light_rag_ray.stages.extractor import (
    Extractor,
    PatternRules,
    WordCooccurrenceRules,
)


def _chunks(rows):
    return pa.Table.from_pydict(
        {
            "chunk_id": [r[0] for r in rows],
            "doc_id": [r[1] for r in rows],
            "order_index": [r[2] for r in rows],
            "content": [r[3] for r in rows],
            "token_size": [0 for _ in rows],
        },
        schema=CHUNKS_SCHEMA,
    )


def test_pattern_rules_base_and_glean():
    content = (
        "ADA LOVELACE works at ACME CORP. The weather was unremarkable that day. "
        "GRACE HOPPER founded GLOBEX. ACME CORP is located in LONDON."
    )
    rules = PatternRules()
    rounds = rules.extract_rounds("d", "c", content)
    assert len(rounds) == 2
    base_ents, base_rels = rounds[0]
    glean_ents, glean_rels = rounds[1]
    names = {e[0] for e in base_ents}
    assert {"ADA LOVELACE", "ACME CORP", "GRACE HOPPER", "GLOBEX", "LONDON"} <= names
    base_preds = {r[3][0] for r in base_rels}
    assert base_preds == {"WORKS_AT", "LOCATED_IN"}
    # FOUNDED is glean-only (the "missed mentions" hermetic glean model)
    assert {r[3][0] for r in glean_rels} == {"FOUNDED"}
    assert glean_ents == []


def test_pattern_rules_placeholder_endpoint():
    content = "ALAN TURING filed a report with THE REGISTRY."
    rounds = PatternRules().extract_rounds("d", "c", content)
    _, rels = rounds[0]
    assert rels[0][0] == "ALAN TURING" and rels[0][1] == "THE REGISTRY"
    ents = rounds[0][0]
    assert all(e[0] != "THE REGISTRY" for e in ents)


def test_word_rules():
    content = "spark join table nothing scan merge"
    rounds = WordCooccurrenceRules().extract_rounds("doc-1", "c", content)
    ents, rels = rounds[0]
    assert [(e[0], e[1]) for e in ents] == [
        ("SPARK", "SYSTEM"), ("JOIN", "OP"), ("TABLE", "DATA")
    ]
    # adjacent rel-vocab pairs: spark-join, join-table, scan-merge
    assert [(r[0], r[1]) for r in rels] == [
        ("SPARK", "JOIN"), ("JOIN", "TABLE"), ("SCAN", "MERGE")
    ]
    _, glean = rounds[1]
    # distance-2 pairs with both sides in the rel vocab
    assert [(r[0], r[1]) for r in glean] == [("SPARK", "TABLE"), ("TABLE", "SCAN")]


def test_extractor_batch_normalization():
    batch = _chunks([("d1-chunk-0", "d1", 0, "ADA LOVELACE works at ACME CORP.")])
    out = Extractor(rules="pattern")(batch)
    rows = out.to_pylist()
    ents = [r for r in rows if r["kind"] == "entity"]
    rels = [r for r in rows if r["kind"] == "relationship"]
    assert {e["name"] for e in ents} == {"ADA LOVELACE", "ACME CORP"}
    assert all(e["type"] in {"PERSON", "ORGANIZATION"} for e in ents)
    assert len(rels) == 1
    assert rels[0]["weight"] == 7.0
    assert rels[0]["keywords"] == ["WORKS_AT", "ASSOCIATION"]
    # mention_index strictly increasing in emission order
    assert [r["mention_index"] for r in rows] == sorted(r["mention_index"] for r in rows)


def test_extractor_glean_count_zero():
    batch = _chunks([("d1-chunk-0", "d1", 0, "GRACE HOPPER founded GLOBEX.")])
    out = Extractor(rules="pattern", glean_count=0)(batch)
    rels = [r for r in out.to_pylist() if r["kind"] == "relationship"]
    assert rels == []  # FOUNDED only findable by gleaning


def test_vectorized_word_rules_match_per_row_path():
    """The Arrow/numpy extract_batch kernel must be row-identical to the
    per-row extract_rounds engine over adversarial word streams (empty
    docs, leading/trailing/multiple whitespace, repeated words, vocab at
    boundaries)."""
    import pyarrow as pa

    from go_light_rag_ray.stages.extractor import (
        Extractor,
        MENTIONS_SCHEMA,
        WordCooccurrenceRules,
    )

    contents = [
        "spark customer vector",
        "",
        "   spark   merge  spark ",
        "noise words only here",
        "query join window hash merge scan",
        "table table stream",          # equal-adjacent excluded
        "spark",                        # single word, no pairs
        "merge scan merge scan merge",  # rel-only vocab (placeholders)
        "\t spark\nquery  ",
    ]
    batch = pa.table({
        "doc_id": [f"doc-{i:09d}" for i in range(len(contents))],
        "chunk_id": [f"doc-{i:09d}-chunk-0" for i in range(len(contents))],
        "order_index": pa.array([0] * len(contents), pa.int32()),
        "content": contents,
    })

    fast = Extractor(rules="word_cooccurrence")(batch)

    slow_rules = WordCooccurrenceRules()
    slow_ex = Extractor(rules=slow_rules)
    # bypass dispatch: force the per-row engine
    delattr_name = "extract_batch"
    class NoFast(WordCooccurrenceRules):
        extract_batch = None
    slow_ex.rules = slow_rules
    orig = WordCooccurrenceRules.extract_batch
    try:
        del WordCooccurrenceRules.extract_batch
        slow = Extractor(rules="word_cooccurrence")(batch)
    finally:
        WordCooccurrenceRules.extract_batch = orig

    key = lambda r: (r["chunk_id"], r["mention_index"])
    fast_rows = sorted(fast.to_pylist(), key=key)
    slow_rows = sorted(slow.to_pylist(), key=key)
    assert fast_rows == slow_rows
    assert fast.schema.equals(MENTIONS_SCHEMA)
