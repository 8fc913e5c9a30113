"""Graph export sinks: edge-list CSV parts and GraphML.

The reference persists the graph into store backends (storage/neo4j.go,
kuzu.go); the engine's canonical store is the partitioned parquet graph
(pipelines/kg.write_graph).  These exporters cover the interop surface
those backends provided:

* ``export_edge_list`` — a DIRECTORY of CSV part files
  (src, tgt, pred, weight, mention_count), written distributed via
  ``write_csv`` (resumable parts, never one giant file; bulk-import shape
  for Neo4j ``LOAD CSV`` / Kuzu ``COPY FROM``).
* ``export_graphml`` — one GraphML XML document with node/edge attributes
  (the Neo4j/Gephi/NetworkX interchange format).  The canonical graph is
  the REDUCED output of canonicalization, so a single-file export is a
  driver-side render of an already-small table; for graphs too large for
  one file, export the edge list instead.
"""

from __future__ import annotations

from xml.sax.saxutils import escape

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from .. import GRAPH_FIELD_SEPARATOR


def export_edge_list(graph: ray.data.Dataset, out_dir: str) -> None:
    """Edges → CSV part files; pred = first keyword (canonical order)."""

    def view(b: pa.Table) -> pa.Table:
        b = b.filter(pc.equal(b.column("kind"), "edge"))
        kws = b.column("keywords").combine_chunks()
        # first element with an empty-list guard: list_element raises on ANY
        # empty list (chat/LLM-extracted edges may carry no keywords), so
        # gather values[offsets[i]] manually and blank out empty rows.
        if len(b) == 0 or len(kws.values) == 0:
            pred = pa.nulls(len(b), pa.string()).fill_null("")
        else:
            lens = pc.fill_null(
                pc.list_value_length(kws), 0
            ).to_numpy(zero_copy_only=False)
            starts = np.asarray(kws.offsets)[:-1]
            firsts = kws.values.take(
                pa.array(np.where(lens > 0, starts, 0), pa.int64()))
            pred = pc.if_else(pa.array(lens > 0), firsts,
                              pa.scalar("", pa.string()))
        return pa.Table.from_arrays(
            [b.column("src").combine_chunks(), pred,
             b.column("tgt").combine_chunks(),
             b.column("weight").combine_chunks(),
             b.column("mention_count").combine_chunks()],
            names=["src", "pred", "tgt", "weight", "mention_count"],
        )

    graph.map_batches(view, batch_format="pyarrow").write_csv(out_dir)


def export_graphml(graph: ray.data.Dataset, path: str) -> int:
    """Whole graph → one GraphML file; returns element count written."""
    rows = graph.take_all()
    nodes = [r for r in rows if r["kind"] == "node"]
    edges = [r for r in rows if r["kind"] == "edge"]
    nodes.sort(key=lambda r: r["entity_id"])
    edges.sort(key=lambda r: (r["src"], r["tgt"]))
    sep = GRAPH_FIELD_SEPARATOR

    out = [
        '<?xml version="1.0" encoding="UTF-8"?>',
        '<graphml xmlns="http://graphml.graphdrawing.org/xmlns">',
        '  <key id="d_type" for="node" attr.name="entity_type" attr.type="string"/>',
        '  <key id="d_desc" for="node" attr.name="descriptions" attr.type="string"/>',
        '  <key id="d_mc" for="node" attr.name="mention_count" attr.type="long"/>',
        '  <key id="e_w" for="edge" attr.name="weight" attr.type="double"/>',
        '  <key id="e_kw" for="edge" attr.name="keywords" attr.type="string"/>',
        '  <key id="e_desc" for="edge" attr.name="descriptions" attr.type="string"/>',
        '  <graph id="kg" edgedefault="directed">',
    ]
    for r in nodes:
        out.append(f'    <node id="{escape(r["entity_id"])}">')
        out.append(f'      <data key="d_type">{escape(r["entity_type"])}</data>')
        out.append(
            f'      <data key="d_desc">{escape(sep.join(r["descriptions"]))}</data>')
        out.append(f'      <data key="d_mc">{r["mention_count"]}</data>')
        out.append("    </node>")
    for i, r in enumerate(edges):
        out.append(
            f'    <edge id="e{i}" source="{escape(r["src"])}" '
            f'target="{escape(r["tgt"])}">')
        out.append(f'      <data key="e_w">{r["weight"]}</data>')
        out.append(
            f'      <data key="e_kw">{escape(sep.join(r["keywords"]))}</data>')
        out.append(
            f'      <data key="e_desc">{escape(sep.join(r["descriptions"]))}</data>')
        out.append("    </edge>")
    out.append("  </graph>")
    out.append("</graphml>")
    with open(path, "w", encoding="utf-8") as f:
        f.write("\n".join(out) + "\n")
    return len(nodes) + len(edges)


# ---------------------------------------------------------------------------
# training-shard export (resumable partitioned corpus output)
# ---------------------------------------------------------------------------

def assign_shards(
    docs: ray.data.Dataset,
    n_shards: int = 16,
    id_col: str = "doc_id",
    salt: str = "shard",
) -> ray.data.Dataset:
    """Attach a deterministic ``shard`` column: md5 hash-space bucket of the
    row id (the same coordination-free keying as ``stages/sampling`` — a
    pure per-row function, stable across runs / cluster sizes / block
    layouts) plus the whitespace ``n_tokens`` count used by the manifest."""
    import hashlib

    def assign(b: pa.Table) -> pa.Table:
        ids = b.column(id_col).to_pylist()
        texts = b.column("text").to_pylist()
        shards = [
            int(hashlib.md5(f"{salt}{i}".encode()).hexdigest()[:8], 16)
            % n_shards
            for i in ids
        ]
        return (
            b.append_column("shard", pa.array(shards, pa.int32()))
             .append_column("n_tokens", pa.array(
                 [len((t or "").split()) for t in texts], pa.int64()))
        )

    return docs.map_batches(assign, batch_format="pyarrow")


def shard_manifest(
    docs: ray.data.Dataset,
    n_shards: int = 16,
    id_col: str = "doc_id",
    salt: str = "shard",
) -> ray.data.Dataset:
    """→ (shard, n_docs, n_tokens): the per-shard counters the export
    manifest records.  Pre-aggregated per batch (np.bincount partials), so
    the shuffle moves ≤ ``n_shards`` rows per block regardless of corpus
    size."""
    sharded = assign_shards(docs, n_shards, id_col, salt)

    def partial(b: pa.Table) -> pa.Table:
        sh = b.column("shard").to_numpy(zero_copy_only=False)
        nt = b.column("n_tokens").to_numpy(zero_copy_only=False)
        docs_per = np.bincount(sh, minlength=n_shards)
        toks_per = np.bincount(sh, weights=nt, minlength=n_shards)
        live = np.flatnonzero(docs_per)
        return pa.Table.from_pydict({
            "shard": pa.array(live.astype(np.int32), pa.int32()),
            "n_docs": pa.array(docs_per[live], pa.int64()),
            "n_tokens": pa.array(toks_per[live].astype(np.int64),
                                 pa.int64()),
        })

    def merge(g: pa.Table) -> pa.Table:
        return pa.Table.from_pydict({
            "shard": g.column("shard").slice(0, 1),
            "n_docs": pa.array(
                [int(g.column("n_docs").to_numpy().sum())], pa.int64()),
            "n_tokens": pa.array(
                [int(g.column("n_tokens").to_numpy().sum())], pa.int64()),
        })

    return (
        sharded.map_batches(partial, batch_format="pyarrow")
        .groupby("shard")
        .map_groups(merge, batch_format="pyarrow")
    )


def export_training_shards(
    docs: ray.data.Dataset,
    out_dir: str,
    n_shards: int = 16,
    id_col: str = "doc_id",
    salt: str = "shard",
) -> dict:
    """Write the corpus as hash-sharded parquet partitions + manifest::

        <out_dir>/data/shard=<k>/*.parquet
        <out_dir>/SHARDS-MANIFEST.json   per-shard row/token counters

    The training-output sink: a directory per shard (never one giant
    file), deterministic doc→shard keying so a re-run reproduces the same
    layout, manifest replaced atomically AFTER the write lands (a killed
    run leaves the old manifest, so finished output is always described by
    a consistent manifest — the same contract as ``kg.write_graph``).
    Returns the manifest dict.
    """
    import json
    import os
    import shutil

    from .io import write_table

    sharded = assign_shards(docs, n_shards, id_col, salt).materialize()
    data_dir = os.path.join(out_dir, "data")
    for k in range(n_shards):
        shutil.rmtree(os.path.join(data_dir, f"shard={k}"),
                      ignore_errors=True)
    write_table(sharded, data_dir, partition_cols=["shard"])

    counters = {}
    for r in shard_manifest(docs, n_shards, id_col, salt).take_all():
        counters[str(r["shard"])] = {
            "n_docs": r["n_docs"], "n_tokens": r["n_tokens"]}
    manifest = {"n_shards": n_shards, "salt": salt, "id_col": id_col,
                "counters": counters}
    os.makedirs(out_dir, exist_ok=True)
    tmp = os.path.join(out_dir, ".SHARDS-MANIFEST.tmp")
    with open(tmp, "w") as f:
        json.dump(manifest, f, indent=1)
    os.replace(tmp, os.path.join(out_dir, "SHARDS-MANIFEST.json"))
    return manifest
