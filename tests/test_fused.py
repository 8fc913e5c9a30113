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
