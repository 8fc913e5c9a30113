"""Fused chunk→extract→combine stage: row-for-row equivalence with the
unfused three-operator flagship.

The fused path changes ONLY where batch boundaries fall (docs-per-call
instead of mentions-per-bundle); the combiner/merge algebra is associative
over global occurrence keys, so the canonical graph must be identical —
including merge_cap-truncated lists, whose first-K-by-occurrence selection
is batching-independent by construction (CLAUDE.md merge-cap rule).
"""

import pyarrow as pa
import ray.data

from go_light_rag_ray.corpus import generate_documents
from go_light_rag_ray.pipelines.kg import Handler, kg_pipeline


def _docs(n=60, **kw):
    return ray.data.from_arrow(generate_documents(n, **kw))


def _rows(graph):
    rows = graph.take_all()
    for r in rows:
        for k, v in list(r.items()):
            if isinstance(v, (list, tuple)):
                r[k] = tuple(v)
    return sorted(rows, key=lambda r: (r["kind"], r["entity_id"] or "",
                                       r.get("src") or "", r.get("tgt") or ""))


def test_fused_equals_unfused(ray_session):
    base = dict(chunker_concurrency=1, extractor_concurrency=1,
                salt_buckets=4)
    unfused = kg_pipeline(_docs(60), Handler(fused=False, **base))
    fused = kg_pipeline(_docs(60), Handler(fused=True, **base))
    assert _rows(fused) == _rows(unfused)


def test_fused_equals_unfused_tiny_batches(ray_session):
    # pathological fused batching (4 docs/call, many partial generations)
    # still merges to the identical graph — the associativity witness
    base = dict(chunker_concurrency=1, extractor_concurrency=1,
                salt_buckets=2, merge_cap=8)
    unfused = kg_pipeline(_docs(40), Handler(fused=False, **base))
    fused = kg_pipeline(
        _docs(40), Handler(fused=True, fused_batch_docs=4, **base))
    assert _rows(fused) == _rows(unfused)


def test_fused_empty_corpus(ray_session):
    empty = ray.data.from_arrow(
        pa.table({"doc_id": pa.array([], pa.string()),
                  "text": pa.array([], pa.string())}))
    handler = Handler(fused=True, chunker_concurrency=1,
                      extractor_concurrency=1)
    assert kg_pipeline(empty, handler).count() == 0


def _norm_partials(tbl):
    rows = tbl.to_pylist()
    for r in rows:
        for f in ("descs", "kws", "srcids", "ph_descs", "ph_srcids"):
            r[f] = tuple((e["occ"], e["text"]) for e in r[f])
        r["types"] = tuple(r["types"])
        r["type_counts"] = tuple(r["type_counts"])
    return sorted(rows, key=lambda r: (
        r["kind"], r["k1"], r["k2"], r["salt"], r["descs"], r["kws"]))


def test_deep_wc_kernel_partials_identical():
    """The packed-int word-cooccurrence kernel (stages/wc_fused.py) must
    emit partial rows IDENTICAL to extract→combine, across merge_cap and
    glean variants — occ strings, salts, weights, tallies, everything."""
    from go_light_rag_ray.pipelines.kg import Handler, _chunker_cfg
    from go_light_rag_ray.stages.canonicalize import combine_mentions
    from go_light_rag_ray.stages.chunker import Chunker
    from go_light_rag_ray.stages.extractor import Extractor
    from go_light_rag_ray.stages.wc_fused import word_cooccurrence_partials

    h = Handler(tokenizer="whitespace", rules="word_cooccurrence",
                content_mode="text", doc_id_format="doc-{:09d}")
    words = ("spark customer vector table stream batch query join window "
             "hash merge scan filler other spark spark join join").split()
    texts = [" ".join(words[i % 5: i % 5 + 9]) for i in range(200)]
    texts += ["", "spark", "merge scan merge scan", "zzz yyy xxx"]
    docs = pa.table({"doc_id": list(range(len(texts))), "text": texts})
    ch = Chunker(config=_chunker_cfg(h))
    chunks = ch(docs)
    for cap, glean in [(0, True), (3, True), (512, False), (1, False)]:
        ex = Extractor(rules=h.rules, glean_count=1 if glean else 0)
        generic = combine_mentions(ex(chunks), h.salt_buckets, cap)
        deep = word_cooccurrence_partials(chunks, h.salt_buckets, cap,
                                          glean=glean)
        assert _norm_partials(generic) == _norm_partials(deep), (cap, glean)


def test_deep_wc_kernel_empty_and_no_vocab():
    from go_light_rag_ray.pipelines.kg import Handler, _chunker_cfg
    from go_light_rag_ray.stages.chunker import Chunker
    from go_light_rag_ray.stages.wc_fused import word_cooccurrence_partials

    h = Handler(tokenizer="whitespace", rules="word_cooccurrence",
                content_mode="text")
    ch = Chunker(config=_chunker_cfg(h))
    empty = ch(pa.table({"doc_id": pa.array([], pa.int64()),
                         "text": pa.array([], pa.string())}))
    assert word_cooccurrence_partials(empty, 4, 0).num_rows == 0
    novocab = ch(pa.table({"doc_id": [1, 2], "text": ["aa bb cc", "dd ee"]}))
    assert word_cooccurrence_partials(novocab, 4, 0).num_rows == 0


def test_fused_wc_pipeline_equals_unfused(ray_session):
    """End-to-end: the deep-kernel fused flagship equals the unfused
    pipeline on the word-cooccurrence ruleset (the scale-bench shape)."""
    texts = ["spark customer join window table stream",
             "merge scan spark spark hash query",
             "vector batch table join join window spark"] * 20
    docs = ray.data.from_arrow(
        pa.table({"doc_id": [f"d{i:04d}" for i in range(len(texts))],
                  "text": texts}))
    base = dict(tokenizer="whitespace", rules="word_cooccurrence",
                content_mode="text", chunker_concurrency=1,
                extractor_concurrency=1, salt_buckets=4, merge_cap=8)
    unfused = kg_pipeline(docs, Handler(fused=False, **base))
    fused = kg_pipeline(docs, Handler(fused=True, fused_batch_docs=7, **base))
    assert _rows(fused) == _rows(unfused)
