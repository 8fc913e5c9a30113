"""Directory source: walk + .gitignore + extension routing + change skip
(reference examples/multiple/main.go:228-443)."""

import json
import os

import pyarrow as pa
import ray.data

from go_light_rag_ray.sources.dirwalk import (
    GitignoreMatcher,
    file_doc_id,
    read_directory_documents,
    save_hash_store,
    walk_documents_dir,
)


def make_tree(tmp_path):
    (tmp_path / "src").mkdir()
    (tmp_path / "src" / "main.go").write_text(
        "package example\n\nfunc A() int { return 1 }")
    (tmp_path / "docs").mkdir()
    (tmp_path / "docs" / "guide.md").write_text("# Guide\n\nwords here")
    (tmp_path / "notes.txt").write_text("plain notes")
    (tmp_path / "build.log").write_text("ignore me")
    (tmp_path / ".gitignore").write_text("*.log\ntmp/\n")
    (tmp_path / "tmp").mkdir()
    (tmp_path / "tmp" / "scratch.txt").write_text("scratch")
    (tmp_path / ".git").mkdir()
    (tmp_path / ".git" / "config").write_text("gitstuff")
    (tmp_path / "src" / ".gitignore").write_text("gen_*.go\n!gen_keep.go\n")
    (tmp_path / "src" / "gen_skip.go").write_text("package gen")
    (tmp_path / "src" / "gen_keep.go").write_text(
        "package example\n\nvar X = 1")
    return tmp_path


def test_walk_honors_gitignore_and_git_dir(tmp_path):
    root = make_tree(tmp_path)
    rels = [rel for _, rel in walk_documents_dir(str(root))]
    assert "src/main.go" in rels
    assert "docs/guide.md" in rels
    assert "notes.txt" in rels
    assert "build.log" not in rels            # *.log in root .gitignore
    assert not any(r.startswith("tmp/") for r in rels)   # dir pattern
    assert not any(r.startswith(".git") for r in rels)   # .git skipped
    assert "src/gen_skip.go" not in rels      # nested matcher
    assert "src/gen_keep.go" in rels          # negation wins


def test_gitignore_matcher_semantics():
    m = GitignoreMatcher(["# comment", "", "*.log", "build/", "/rooted.txt",
                          "!keep.log"])
    assert m.ignores("a/b/x.log")
    assert not m.ignores("a/keep.log")        # negation, last match wins
    assert m.ignores("build/out.bin")
    assert m.ignores("rooted.txt")


def test_read_directory_documents_routes_and_ids(tmp_path, ray_session):
    root = make_tree(tmp_path)
    rows = {r["doc_id"]: r
            for r in read_directory_documents(str(root)).take_all()}
    assert file_doc_id("src/main.go") == "src_main.go"
    assert rows["src_main.go"]["doc_kind"] == "go"
    assert rows["docs_guide.md"]["doc_kind"] == "markdown"
    assert rows["notes.txt"]["doc_kind"] == "default"
    assert "build.log" not in " ".join(rows)
    assert rows["src_main.go"]["text"].startswith("package example")


def test_unchanged_file_skip_roundtrip(tmp_path, ray_session):
    root = make_tree(tmp_path)
    store = str(tmp_path.parent / "hashes_outside.json")
    first = read_directory_documents(str(root), hash_store=store)
    n_first = first.count()
    assert n_first >= 4
    save_hash_store(first, store)
    assert json.load(open(store))  # advanced

    # nothing changed → everything skipped
    second = read_directory_documents(str(root), hash_store=store)
    assert second.count() == 0

    # touch one file → only it re-enters
    (tmp_path / "notes.txt").write_text("plain notes v2")
    third = read_directory_documents(str(root), hash_store=store)
    assert [r["doc_id"] for r in third.take_all()] == ["notes.txt"]


def test_directory_to_kg_end_to_end(tmp_path, ray_session):
    """The full loop: directory tree → HandlerChunker routing → chunks."""
    from go_light_rag_ray.stages.chunker import ChunkerConfig
    from go_light_rag_ray.stages.handlers import HandlerChunker

    root = make_tree(tmp_path)
    docs = read_directory_documents(str(root))
    chunks = docs.map_batches(
        HandlerChunker,
        fn_constructor_kwargs={"config": ChunkerConfig(
            content_mode="text", doc_id_format="{}")},
        batch_format="pyarrow", concurrency=1,
    ).take_all()
    by_doc = {}
    for c in chunks:
        by_doc.setdefault(c["doc_id"], []).append(c)
    # the Go file parsed by the real Go chunker: header + func
    go_chunks = by_doc["src_main.go"]
    assert len(go_chunks) == 2
    assert go_chunks[1]["content"].startswith("package example\n\nfunc A()")


def test_graph_exports(tmp_path, ray_session):
    """Edge-list CSV parts and GraphML render of a canonical graph."""
    import glob
    import xml.etree.ElementTree as ET

    from go_light_rag_ray.sources.export import (
        export_edge_list,
        export_graphml,
    )
    from go_light_rag_ray.stages.canonicalize import GRAPH_SCHEMA

    rows = [
        {"kind": "node", "entity_id": "SPARK", "entity_type": "SYSTEM",
         "src": "", "tgt": "", "weight": 0.0,
         "descriptions": ["a <desc> & more"], "keywords": [],
         "source_ids": ["c0"], "mention_count": 2},
        {"kind": "node", "entity_id": "TABLE", "entity_type": "DATA",
         "src": "", "tgt": "", "weight": 0.0, "descriptions": ["d"],
         "keywords": [], "source_ids": ["c0"], "mention_count": 1},
        {"kind": "edge", "entity_id": "", "entity_type": "",
         "src": "SPARK", "tgt": "TABLE", "weight": 2.0,
         "descriptions": ["e"], "keywords": ["CO_OCCURS", "ADJACENT"],
         "source_ids": ["c0"], "mention_count": 2},
        # keyword-less edge (chat/LLM-extracted relationships may carry no
        # keywords): export must emit an empty pred, not crash
        {"kind": "edge", "entity_id": "", "entity_type": "",
         "src": "TABLE", "tgt": "SPARK", "weight": 1.0,
         "descriptions": ["f"], "keywords": [],
         "source_ids": ["c0"], "mention_count": 1},
    ]
    graph = ray.data.from_arrow(pa.Table.from_pylist(rows, schema=GRAPH_SCHEMA))

    csv_dir = tmp_path / "edges_csv"
    export_edge_list(graph, str(csv_dir))
    parts = glob.glob(str(csv_dir / "*"))
    assert parts
    content = "".join(open(p).read() for p in parts)
    assert '"SPARK","CO_OCCURS","TABLE",2,2' in content
    assert '"TABLE","","SPARK",1,1' in content

    gml = tmp_path / "graph.graphml"
    n = export_graphml(graph, str(gml))
    assert n == 4
    root = ET.parse(gml).getroot()  # well-formed XML incl. escaped chars
    ns = "{http://graphml.graphdrawing.org/xmlns}"
    g = root.find(f"{ns}graph")
    node_ids = [e.get("id") for e in g.findall(f"{ns}node")]
    assert node_ids == ["SPARK", "TABLE"]
    edge = g.find(f"{ns}edge")
    assert edge.get("source") == "SPARK" and edge.get("target") == "TABLE"


# ---------------------------------------------------------------------------
# training-shard export
# ---------------------------------------------------------------------------

def test_export_training_shards(tmp_path):
    import hashlib
    import json
    import os

    import pyarrow as pa
    import ray.data

    from go_light_rag_ray.sources.export import (
        export_training_shards,
        shard_manifest,
    )

    docs = ray.data.from_arrow(pa.table({
        "doc_id": [f"d{i:03d}" for i in range(40)],
        "text": [f"word{i} alpha beta" for i in range(40)],
    }))
    out = str(tmp_path / "shards")
    manifest = export_training_shards(docs, out, n_shards=4)

    # shard dirs exist for every populated shard; total rows round-trip
    back = ray.data.read_parquet(os.path.join(out, "data"))
    assert back.count() == 40
    total = sum(v["n_docs"] for v in manifest["counters"].values())
    assert total == 40
    assert json.load(open(os.path.join(out, "SHARDS-MANIFEST.json"))) == manifest

    # assignment matches the md5 keying exactly
    rows = back.take_all()
    for r in rows:
        want = int(hashlib.md5(f"shard{r['doc_id']}".encode())
                   .hexdigest()[:8], 16) % 4
        assert int(r["shard"]) == want

    # manifest counters agree with the shard_manifest query
    q = {r["shard"]: (r["n_docs"], r["n_tokens"])
         for r in shard_manifest(docs, n_shards=4).take_all()}
    for k, v in manifest["counters"].items():
        assert q[int(k)] == (v["n_docs"], v["n_tokens"])

    # re-run is idempotent (same layout, same manifest)
    manifest2 = export_training_shards(docs, out, n_shards=4)
    assert manifest2 == manifest
    assert ray.data.read_parquet(os.path.join(out, "data")).count() == 40
