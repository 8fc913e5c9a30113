"""Driver contract: entry() smoke, queries() vs oracle_sql() correctness gate.

Ray is initialised by the driver BEFORE this module is imported: nothing
here (or in the library) calls ``ray.init()`` / ``ray.shutdown()``.

The KG queries run the full flagship pipeline (chunk → extract → glean →
canonicalize) over the driver testdata ``documents`` table with the
``word_cooccurrence`` rule set (stages/extractor.py), which was designed to
be exactly mirrored in ANSI SQL so DuckDB can serve as the correctness
oracle for the *dataflow* (normalization, grouping, ordered-distinct merge,
weight accumulation, placeholder nodes) — the part of the reference
(insert.go:454-690) this graft exercises.

Column-name and dtype parity with the SQL is deliberate: every aggregate is
cast so both sides produce identical logical types (string / int32 / int64
/ double) and identical column names.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from go_light_rag_ray import GRAPH_FIELD_SEPARATOR
from go_light_rag_ray.pipelines.kg import (
    Handler,
    build_graph,
    chunk_documents,
    extract_mentions,
    kg_pipeline,
)
from go_light_rag_ray.sources import io as table_io

SEP = GRAPH_FIELD_SEPARATOR  # "<SEP>"


# ---------------------------------------------------------------------------
# helpers
# ---------------------------------------------------------------------------

def _docs(sf_dir: str) -> ray.data.Dataset:
    return ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )


def _oracle_handler() -> Handler:
    """Pipeline config whose output is SQL-expressible (1 chunk per doc at
    this data scale: docs are ≤100 whitespace tokens, window is 1024)."""
    return Handler(
        chunk_max_tokens=1024,
        chunk_overlap_tokens=128,
        tokenizer="whitespace",
        rules="word_cooccurrence",
        glean_count=1,
        max_summaries_token_length=0,   # summarizer off for exact SQL parity
        content_mode="text",
        doc_id_format="doc-{:09d}",     # zero-padded: string order == numeric
    )


def _graph(sf_dir: str) -> ray.data.Dataset:
    return kg_pipeline(_docs(sf_dir), _oracle_handler())


def _join_sep(tbl: pa.Table, cols: list[str]) -> pa.Table:
    """list<string> columns → <SEP>-joined string view (reference
    insert.go:538,623 renders the same string form)."""
    for name in cols:
        idx = tbl.schema.get_field_index(name)
        joined = pc.binary_join(tbl.column(name).combine_chunks(), SEP)
        tbl = tbl.set_column(idx, pa.field(name, pa.string()), joined)
    return tbl


# ---------------------------------------------------------------------------
# queries
# ---------------------------------------------------------------------------

def q_kg_nodes(sf_dir: str) -> ray.data.Dataset:
    """Canonicalized entity nodes incl. UNKNOWN dangling-endpoint
    placeholders (reference insert.go:499-566, 625-663)."""
    nodes = _graph(sf_dir).filter(expr="kind == 'node'")

    def view(b: pa.Table) -> pa.Table:
        b = b.select(["entity_id", "entity_type", "mention_count",
                      "descriptions", "source_ids"])
        return _join_sep(b, ["descriptions", "source_ids"])

    return nodes.map_batches(view, batch_format="pyarrow")


def q_kg_edges(sf_dir: str) -> ray.data.Dataset:
    """Deduped edges: additive weight (insert.go:595,609-615),
    ordered-distinct descriptions/keywords/source_ids."""
    edges = _graph(sf_dir).filter(expr="kind == 'edge'")

    def view(b: pa.Table) -> pa.Table:
        b = b.select(["src", "tgt", "weight", "mention_count",
                      "descriptions", "keywords", "source_ids"])
        return _join_sep(b, ["descriptions", "keywords", "source_ids"])

    return edges.map_batches(view, batch_format="pyarrow")


def q_kg_triples(sf_dir: str) -> ray.data.Dataset:
    """(subj, pred, obj) parity view; pred = first keyword in canonical
    (first-occurrence) order."""
    edges = _graph(sf_dir).filter(expr="kind == 'edge'")

    def view(b: pa.Table) -> pa.Table:
        kws = b.column("keywords").combine_chunks()
        pred = pc.list_element(kws, 0) if len(b) else pa.array([], pa.string())
        return pa.Table.from_arrays(
            [b.column("src").combine_chunks(), pred,
             b.column("tgt").combine_chunks()],
            names=["subj", "pred", "obj"],
        )

    return edges.map_batches(view, batch_format="pyarrow")


def q_chunks(sf_dir: str) -> ray.data.Dataset:
    """Sliding-window chunker (reference handler/default.go:53-96) with a
    small window so multi-chunk docs + overlap are actually exercised."""
    handler = _oracle_handler()
    handler.chunk_max_tokens = 16
    handler.chunk_overlap_tokens = 4
    return chunk_documents(_docs(sf_dir), handler)


def q_mentions(sf_dir: str) -> ray.data.Dataset:
    """Raw extraction output (pre-shuffle): entity + relationship mentions
    with gleaning round accumulation (reference insert.go:298-497)."""
    handler = _oracle_handler()
    mentions = extract_mentions(chunk_documents(_docs(sf_dir), handler), handler)

    def view(b: pa.Table) -> pa.Table:
        b = b.select(["chunk_id", "mention_index", "kind", "name", "type",
                      "src", "tgt", "description", "keywords", "weight"])
        return _join_sep(b, ["keywords"])

    return mentions.map_batches(view, batch_format="pyarrow")


def entry() -> Any:
    """Flagship: sf0.001 documents → interleaved spans shape → KG."""
    docs = table_io.read_documents("/root/testdata/sf0.001/documents.parquet")
    docs = docs.map_batches(
        table_io.flat_documents_as_interleaved, batch_format="pyarrow"
    )
    handler = Handler(
        tokenizer="regex",
        rules="word_cooccurrence",
        content_mode="spans",
        max_summaries_token_length=1200,
    )
    return kg_pipeline(docs, handler)


# ---------------------------------------------------------------------------
# oracle SQL (DuckDB) — shared CTE prelude mirroring the rule set exactly
# ---------------------------------------------------------------------------

# Gazetteer literals must match stages/extractor.py WORD_ENTITY_TYPES /
# WORD_REL_VOCAB.
_PRELUDE = r"""
WITH gaz(w, t) AS (
  VALUES ('spark','SYSTEM'),('customer','ACTOR'),('vector','DATA'),
         ('table','DATA'),('stream','DATA'),('batch','DATA'),
         ('query','OP'),('join','OP'),('window','OP'),('hash','OP')
),
relv(w) AS (SELECT w FROM gaz UNION ALL VALUES ('merge'),('scan')),
docs AS (
  SELECT printf('doc-%09d', doc_id) AS did,
         regexp_extract_all(text, '\S+') AS toks
  FROM documents
),
words AS (
  SELECT did, unnest(toks) AS w, unnest(range(1, len(toks)+1)) AS pos
  FROM docs
),
ents AS (
  SELECT wo.did, upper(wo.w) AS name, g.t AS typ, wo.pos
  FROM words wo JOIN gaz g ON wo.w = g.w
),
-- base round: adjacent distinct rel-vocab pairs (r=0); glean round:
-- distance-2 pairs (r=1).  pos = position of the left word.
relm AS (
  SELECT w1.did, upper(w1.w) AS s, upper(w2.w) AS o, 0 AS r, w1.pos,
         upper(w1.w) || ' co-occurs with ' || upper(w2.w) || ' in ' || w1.did AS descr
  FROM words w1
  JOIN words w2 ON w1.did = w2.did AND w2.pos = w1.pos + 1
  WHERE w1.w <> w2.w
    AND w1.w IN (SELECT w FROM relv) AND w2.w IN (SELECT w FROM relv)
  UNION ALL
  SELECT w1.did, upper(w1.w), upper(w2.w), 1, w1.pos,
         upper(w1.w) || ' near ' || upper(w2.w) || ' in ' || w1.did
  FROM words w1
  JOIN words w2 ON w1.did = w2.did AND w2.pos = w1.pos + 2
  WHERE w1.w <> w2.w
    AND w1.w IN (SELECT w FROM relv) AND w2.w IN (SELECT w FROM relv)
),
-- sortable occurrence key: (doc, round, position); zero-padded doc ids make
-- lexicographic order == occurrence order (canonicalize.occ_key semantics)
relk AS (
  SELECT *, did || '|' || r || '|' || lpad(pos::varchar, 6, '0') AS occ
  FROM relm
)
"""

_NODES_SQL = _PRELUDE + r"""
, node_descs AS (
  SELECT name, did, min(did) AS o FROM ents GROUP BY name, did
),
nodes_real AS (
  SELECT e.name AS entity_id, any_value(e.typ) AS entity_type,
         count(*)::BIGINT AS mention_count
  FROM ents e GROUP BY e.name
),
real_rows AS (
  SELECT nr.entity_id, nr.entity_type, nr.mention_count,
         (SELECT string_agg(nd.name || ' appears in ' || nd.did, '<SEP>' ORDER BY nd.did)
          FROM node_descs nd WHERE nd.name = nr.entity_id) AS descriptions,
         (SELECT string_agg(x.did || '-chunk-0', '<SEP>' ORDER BY x.did)
          FROM (SELECT DISTINCT did FROM ents e2 WHERE e2.name = nr.entity_id) x) AS source_ids
  FROM nodes_real nr
),
eps AS (
  SELECT did, s AS ep, descr, occ FROM relk
  UNION ALL
  SELECT did, o AS ep, descr, occ FROM relk
),
ph_eps AS (
  SELECT * FROM eps WHERE ep NOT IN (SELECT entity_id FROM nodes_real)
),
ph_desc AS (
  SELECT ep, descr, min(occ) AS o FROM ph_eps GROUP BY ep, descr
),
ph_rows AS (
  SELECT p.ep AS entity_id, 'UNKNOWN' AS entity_type, 0::BIGINT AS mention_count,
         (SELECT string_agg(d.descr, '<SEP>' ORDER BY d.o)
          FROM ph_desc d WHERE d.ep = p.ep) AS descriptions,
         (SELECT string_agg(x.did || '-chunk-0', '<SEP>' ORDER BY x.did)
          FROM (SELECT DISTINCT did FROM ph_eps e2 WHERE e2.ep = p.ep) x) AS source_ids
  FROM (SELECT DISTINCT ep FROM ph_eps) p
)
SELECT * FROM real_rows UNION ALL SELECT * FROM ph_rows
"""

_EDGES_SQL = _PRELUDE + r"""
, edge_agg AS (
  SELECT s AS src, o AS tgt,
         sum(CASE WHEN r = 0 THEN 1.0 ELSE 0.5 END)::DOUBLE AS weight,
         count(*)::BIGINT AS mention_count
  FROM relk GROUP BY s, o
),
edge_descs AS (
  SELECT s, o, descr, min(occ) AS occ FROM relk GROUP BY s, o, descr
),
-- keyword occurrence = mention occ + keyword index j within the mention
-- (canonicalize.combine_mentions appends "\x00{j:04d}")
edge_kws AS (
  SELECT s, o, kw, min(occ || '|' || j) AS occ FROM (
    SELECT s, o, 'CO_OCCURS' AS kw, 0 AS j, occ FROM relk WHERE r = 0
    UNION ALL
    SELECT s, o, 'ADJACENT', 1, occ FROM relk WHERE r = 0
    UNION ALL
    SELECT s, o, 'NEAR', 0, occ FROM relk WHERE r = 1
  ) GROUP BY s, o, kw
)
SELECT ea.src, ea.tgt, ea.weight, ea.mention_count,
       (SELECT string_agg(d.descr, '<SEP>' ORDER BY d.occ)
        FROM edge_descs d WHERE d.s = ea.src AND d.o = ea.tgt) AS descriptions,
       (SELECT string_agg(k.kw, '<SEP>' ORDER BY k.occ)
        FROM edge_kws k WHERE k.s = ea.src AND k.o = ea.tgt) AS keywords,
       (SELECT string_agg(x.did || '-chunk-0', '<SEP>' ORDER BY x.did)
        FROM (SELECT DISTINCT did FROM relk r2 WHERE r2.s = ea.src AND r2.o = ea.tgt) x) AS source_ids
FROM edge_agg ea
"""

_TRIPLES_SQL = _PRELUDE + r"""
, edge_kws AS (
  SELECT s, o, kw, min(occ || '|' || j) AS occ FROM (
    SELECT s, o, 'CO_OCCURS' AS kw, 0 AS j, occ FROM relk WHERE r = 0
    UNION ALL
    SELECT s, o, 'ADJACENT', 1, occ FROM relk WHERE r = 0
    UNION ALL
    SELECT s, o, 'NEAR', 0, occ FROM relk WHERE r = 1
  ) GROUP BY s, o, kw
)
SELECT s AS subj,
       (SELECT k.kw FROM edge_kws k
        WHERE k.s = e.s AND k.o = e.o ORDER BY k.occ LIMIT 1) AS pred,
       o AS obj
FROM (SELECT DISTINCT s, o FROM relk) e
"""

_CHUNKS_SQL = r"""
WITH docs AS (
  SELECT printf('doc-%09d', doc_id) AS did,
         regexp_extract_all(text, '\S+') AS toks
  FROM documents
),
wins AS (
  SELECT did, toks, unnest(range(0, len(toks), 12)) AS st FROM docs
)
SELECT did || '-chunk-' || (st // 12)::varchar AS chunk_id,
       did AS doc_id,
       (st // 12)::INTEGER AS order_index,
       array_to_string(toks[st+1 : st+16], ' ') AS content,
       least(16, len(toks) - st)::INTEGER AS token_size
FROM wins
"""

_MENTIONS_SQL = _PRELUDE + r"""
, ent_rows AS (
  SELECT did || '-chunk-0' AS chunk_id, did, 0 AS rnd, pos,
         'entity' AS kind, name, typ AS type, '' AS src, '' AS tgt,
         name || ' appears in ' || did AS description,
         '' AS keywords, 0.0::DOUBLE AS weight
  FROM ents
),
rel_rows AS (
  SELECT did || '-chunk-0' AS chunk_id, did, r + 1 AS rnd, pos,
         'relationship' AS kind, '' AS name, '' AS type, s AS src, o AS tgt,
         descr AS description,
         CASE WHEN r = 0 THEN 'CO_OCCURS<SEP>ADJACENT' ELSE 'NEAR' END AS keywords,
         (CASE WHEN r = 0 THEN 1.0 ELSE 0.5 END)::DOUBLE AS weight
  FROM relk
),
allm AS (SELECT * FROM ent_rows UNION ALL SELECT * FROM rel_rows)
SELECT chunk_id,
       (row_number() OVER (PARTITION BY chunk_id ORDER BY rnd, pos) - 1)::INTEGER
         AS mention_index,
       kind, name, type, src, tgt, description, keywords, weight
FROM allm
"""


def queries() -> dict[str, Callable[[str], Any]]:
    return {
        "kg_nodes": q_kg_nodes,
        "kg_edges": q_kg_edges,
        "kg_triples": q_kg_triples,
        "chunks": q_chunks,
        "mentions": q_mentions,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "kg_nodes": _NODES_SQL,
        "kg_edges": _EDGES_SQL,
        "kg_triples": _TRIPLES_SQL,
        "chunks": _CHUNKS_SQL,
        "mentions": _MENTIONS_SQL,
    }
