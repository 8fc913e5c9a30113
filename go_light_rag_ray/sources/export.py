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
