"""End-to-end kg pipeline + checkpoint/resume + span invariant."""

import os

import pytest
import ray.data

from go_light_rag_ray.corpus import generate_documents
from go_light_rag_ray.pipelines.kg import (
    Handler,
    chunk_documents,
    edges_view,
    extract_mentions,
    kg_pipeline,
    nodes_view,
    run_kg,
    triples_view,
)
from go_light_rag_ray.stages.verify import verify_spans
from go_light_rag_ray.state import manifest as mf

HANDLER = Handler(chunker_concurrency=1, extractor_concurrency=1, salt_buckets=4)


def _docs(n=40, **kw):
    return ray.data.from_arrow(generate_documents(n, **kw))


@pytest.fixture(scope="module")
def graph(ray_session):
    return kg_pipeline(_docs(40), HANDLER).materialize()


def test_kg_pipeline_end_to_end(graph):
    rows = graph.take_all()
    nodes = [r for r in rows if r["kind"] == "node"]
    edges = [r for r in rows if r["kind"] == "edge"]
    assert len(nodes) > 5
    assert len(edges) > 5
    by_id = {n["entity_id"]: n for n in nodes}
    # glean-only FOUNDED relations present
    assert any("FOUNDED" in e["keywords"] for e in edges)
    # placeholder endpoint THE REGISTRY if the template fired
    if "THE REGISTRY" in by_id:
        assert by_id["THE REGISTRY"]["entity_type"] == "UNKNOWN"
    # every edge endpoint exists as a node (relationship integrity, insert.go:625-663)
    for e in edges:
        assert e["src"] in by_id and e["tgt"] in by_id
    # all names upper-cased
    assert all(n["entity_id"] == n["entity_id"].upper() for n in nodes)


def test_views(graph):
    n = nodes_view(graph).take_all()
    e = edges_view(graph).take_all()
    t = triples_view(graph).take_all()
    assert len(t) == len(e) > 0
    assert set(t[0]) == {"subj", "pred", "obj"}
    assert all("entity_id" in r for r in n)


def test_span_passthrough_invariant():
    docs = _docs(15)
    # the pipeline never touches spans; verify input vs input-projected output
    out = docs.map_batches(lambda b: b, batch_format="pyarrow")
    res = verify_spans(docs, out)
    assert res["ok"], res


def test_run_kg_checkpoint_and_resume(tmp_path):
    corpus_dir = str(tmp_path / "corpus")
    ckpt = str(tmp_path / "ckpt")
    _docs(20).repartition(2).write_parquet(corpus_dir)

    h = Handler(chunker_concurrency=1, extractor_concurrency=1, salt_buckets=1)
    g1 = run_kg(corpus_dir, ckpt, h, n_shards=2)
    rows1 = sorted(
        ((r["kind"], r["entity_id"], r["src"], r["tgt"], r["weight"]) for r in g1.take_all())
    )
    manifests = [f for f in os.listdir(ckpt) if f.startswith("MANIFEST-")]
    assert len(manifests) == 2

    fragments = sorted(
        os.path.join(dp, f)
        for dp, _, fs in os.walk(corpus_dir)
        for f in fs
        if f.endswith(".parquet")
    )
    shards = mf.plan_shards(fragments, 2)
    # resume: nothing pending → extraction skipped, same result
    assert mf.pending_shards(ckpt, shards) == []
    g2 = run_kg(corpus_dir, ckpt, h, n_shards=2)
    rows2 = sorted(
        ((r["kind"], r["entity_id"], r["src"], r["tgt"], r["weight"]) for r in g2.take_all())
    )
    assert rows1 == rows2

    # invalidate one manifest → exactly that shard pending
    os.remove(os.path.join(ckpt, manifests[0]))
    assert len(mf.pending_shards(ckpt, shards)) == 1


def test_mentions_deterministic_across_runs():
    h = Handler(chunker_concurrency=1, extractor_concurrency=1, salt_buckets=1)
    m1 = extract_mentions(chunk_documents(_docs(6), h), h).take_all()
    m2 = extract_mentions(chunk_documents(_docs(6), h), h).take_all()
    key = lambda r: (r["chunk_id"], r["mention_index"])
    assert sorted(m1, key=key) == sorted(m2, key=key)


def test_write_graph_partitioned_with_manifest(graph, tmp_path):
    import json
    import os

    from go_light_rag_ray.pipelines.kg import read_graph, write_graph

    out = str(tmp_path / "graph")
    manifest = write_graph(graph, out, num_buckets=4,
                           lineage={"input": "synthetic-40"})
    nodes, edges = read_graph(out)
    assert manifest["counters"]["nodes"] == nodes.count() > 0
    assert manifest["counters"]["edges"] == edges.count() > 0
    # hash-bucketed directory layout (resumable, never one giant file)
    node_parts = sorted(os.listdir(os.path.join(out, "nodes")))
    assert all(p.startswith("bucket=") for p in node_parts)
    assert len(node_parts) > 1
    on_disk = json.load(open(os.path.join(out, "GRAPH-MANIFEST.json")))
    assert on_disk["lineage"] == {"input": "synthetic-40"}
    assert on_disk["counters"] == manifest["counters"]
    # idempotent re-write: same content, manifest unchanged
    again = write_graph(graph, out, num_buckets=4,
                        lineage={"input": "synthetic-40"})
    assert again["counters"] == manifest["counters"]


def test_staged_two_phase_ingest(tmp_path):
    """S5 parity: stage_chunks (InsertChunk) then process_staged
    (ProcessUnprocessedChunk) — with staged-phase resume."""
    import pyarrow.parquet as pq

    from go_light_rag_ray.pipelines.kg import process_staged, stage_chunks

    inp = str(tmp_path / "docs")
    os.makedirs(inp)
    tbl = generate_documents(30)
    pq.write_table(tbl.slice(0, 15), f"{inp}/part0.parquet")
    pq.write_table(tbl.slice(15), f"{inp}/part1.parquet")
    ckpt = str(tmp_path / "ckpt")

    staged = stage_chunks(inp, ckpt, HANDLER, n_shards=2)
    assert len(staged) == 2
    # phase 1 is resumable: second call stages nothing new
    assert stage_chunks(inp, ckpt, HANDLER, n_shards=2) == []
    chunks = ray.data.read_parquet(os.path.join(ckpt, "chunks"))
    assert chunks.count() > 0
    assert "doc_id" in chunks.schema().names   # carried column, no id parsing

    graph = process_staged(ckpt, HANDLER)
    rows = graph.take_all()
    one_shot = kg_pipeline(ray.data.from_arrow(tbl), HANDLER).take_all()
    key = lambda r: (r["kind"], r["entity_id"], r["src"], r["tgt"])
    assert sorted(rows, key=key) == sorted(one_shot, key=key)


def test_cli_entrypoint_end_to_end(tmp_path):
    """ray-job-submit surface: python -m go_light_rag_ray runs the
    checkpointed pipeline and materializes the graph (fresh process)."""
    import json
    import subprocess
    import sys

    import pyarrow.parquet as pq

    inp = str(tmp_path / "docs")
    os.makedirs(inp)
    pq.write_table(generate_documents(20), f"{inp}/part0.parquet")
    out = str(tmp_path / "graph")
    env = dict(os.environ)
    env["RAY_ADDRESS"] = "local"
    r = subprocess.run(
        [sys.executable, "-m", "go_light_rag_ray",
         "--input", inp, "--ckpt", str(tmp_path / "ckpt"), "--out", out,
         "--shards", "2"],
        capture_output=True, text=True, timeout=300, env=env,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    assert r.returncode == 0, r.stderr[-2000:]
    manifest = json.loads([l for l in r.stdout.splitlines()
                           if l.startswith("{")][-1])
    assert manifest["counters"]["nodes"] > 0
    assert manifest["counters"]["edges"] > 0
    assert os.path.exists(os.path.join(out, "GRAPH-MANIFEST.json"))


def test_cli_incremental_prior(tmp_path):
    """--prior merges new docs into an existing materialized graph."""
    import json
    import subprocess
    import sys

    import pyarrow.parquet as pq

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ)
    env["RAY_ADDRESS"] = "local"

    def run(args):
        r = subprocess.run([sys.executable, "-m", "go_light_rag_ray", *args],
                           capture_output=True, text=True, timeout=300,
                           env=env, cwd=repo)
        assert r.returncode == 0, r.stderr[-2000:]
        return json.loads([l for l in r.stdout.splitlines()
                           if l.startswith("{")][-1])

    full = generate_documents(30)
    inp1, inp2 = str(tmp_path / "d1"), str(tmp_path / "d2")
    os.makedirs(inp1); os.makedirs(inp2)
    pq.write_table(full.slice(0, 20), f"{inp1}/part.parquet")
    pq.write_table(full.slice(20), f"{inp2}/part.parquet")
    g1 = str(tmp_path / "g1")
    m1 = run(["--input", inp1, "--ckpt", str(tmp_path / "c1"), "--out", g1,
              "--shards", "1", "--merge-cap", "0"])
    m2 = run(["--input", inp2, "--ckpt", str(tmp_path / "c2"),
              "--out", str(tmp_path / "g2"), "--shards", "1",
              "--prior", g1, "--merge-cap", "0"])
    assert m2["counters"]["nodes"] >= m1["counters"]["nodes"]
    assert m2["lineage"]["prior"] == g1


def test_ingest_prechunked_content(ray_session):
    """InsertChunks parity: external ContentChunk rows flow through the
    same extract → canonicalize path; external ids become source_ids."""
    import pyarrow as pa

    from go_light_rag_ray.pipelines.kg import Handler, ingest_prechunked

    rows = pa.table({
        "id": ["ext-c1", "ext-c2"],
        "content_id": ["paper-9", "paper-9"],
        "chunk_index": [0, 1],
        "text": ["spark merge customer", "customer join spark"],
        "text_hash": ["h1", "h2"],           # provenance passes through
    })
    h = Handler(tokenizer="whitespace", rules="word_cooccurrence",
                content_mode="text", max_summaries_token_length=0,
                merge_cap=0, salt_buckets=2)
    graph = ingest_prechunked(ray.data.from_arrow(rows), h).take_all()
    nodes = {r["entity_id"]: r for r in graph if r["kind"] == "node"}
    assert "SPARK" in nodes and "CUSTOMER" in nodes
    # source ids are the caller's external chunk ids
    assert set(nodes["SPARK"]["source_ids"]) == {"ext-c1", "ext-c2"}
    edges = [r for r in graph if r["kind"] == "edge"]
    assert any(e["src"] == "SPARK" and e["tgt"] == "MERGE" for e in edges)


def test_verify_spans_detects_mutation_and_missing():
    import pyarrow as pa

    docs = _docs(12)

    def drop_and_mutate(b: pa.Table) -> pa.Table:
        # drop the first row of the batch and blank one doc's span text
        t = b.slice(1)
        spans = t.column("spans").to_pylist()
        if spans and spans[0]:
            spans[0] = [dict(s, text="CORRUPTED") for s in spans[0]]
        return t.set_column(
            t.schema.get_field_index("spans"), "spans",
            pa.array(spans, t.schema.field("spans").type))

    out = docs.repartition(1).map_batches(
        drop_and_mutate, batch_format="pyarrow", batch_size=None)
    res = verify_spans(docs, out)
    assert not res["ok"]
    assert res["mismatched"] == 2      # one missing + one mutated
    assert res["rows"] == 12


def test_span_fingerprint_batch_matches_per_row_reference():
    """r5 vectorization: the Arrow-assembled sha256 input must equal the
    old per-span Python loop byte-for-byte, including sliced batches."""
    import hashlib

    import pyarrow as pa

    from go_light_rag_ray.sources.io import flat_documents_as_interleaved
    from go_light_rag_ray.stages.verify import span_fingerprint_batch

    flat = pa.table({"doc_id": pa.array(list(range(40)), pa.int64()),
                     "text": [" ".join(["w"] * (i % 90)) for i in range(40)]})
    batch = flat_documents_as_interleaved(flat)

    def ref(b):
        out = []
        for row in b.column("spans").to_pylist():
            h = hashlib.sha256()
            for order, s in enumerate(row):
                h.update(f"{s['kind']}\x00{s['text']}\x00"
                         f"{s['media_ref']}\x00{order}\x01".encode())
            out.append(h.hexdigest())
        return out

    assert span_fingerprint_batch(batch).column("span_fp").to_pylist() \
        == ref(batch)
    sl = batch.slice(7, 21)
    assert span_fingerprint_batch(sl).column("span_fp").to_pylist() == ref(sl)
    assert span_fingerprint_batch(batch.slice(0, 0)).num_rows == 0
