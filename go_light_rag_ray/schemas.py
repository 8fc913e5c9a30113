"""Arrow schema constants for every logical table (SURVEY.md §1.5, FIXTURES F1/F5).

One ``ray.data.Dataset`` per logical table; blocks are Arrow tables.  The
reference's ``<SEP>``-joined multi-value strings (reference insert.go:62,
522-538) become native ``list<string>`` columns; the joined-string form is
only rendered at the parity boundary (functions/strings.py).
"""

from __future__ import annotations

import pyarrow as pa

# --- input: interleaved text+media documents (BASELINE.json input_hint) ---
SPAN_STRUCT = pa.struct(
    [
        pa.field("kind", pa.string()),       # "text" | "image" | "audio"
        pa.field("text", pa.string()),       # non-empty iff kind == "text"
        pa.field("media_ref", pa.string()),  # non-empty iff kind != "text"
        pa.field("offset", pa.int32()),      # char offset in the assembled document
    ]
)

DOCUMENTS_SCHEMA = pa.schema(
    [
        pa.field("doc_id", pa.string()),
        pa.field("spans", pa.list_(SPAN_STRUCT)),
    ]
)

# --- chunks (reference Source, rag.go:109-114; id "docID-chunk-N" rag.go:264-266) ---
CHUNKS_SCHEMA = pa.schema(
    [
        pa.field("chunk_id", pa.string()),
        pa.field("doc_id", pa.string()),
        pa.field("order_index", pa.int32()),
        pa.field("content", pa.large_string()),
        pa.field("token_size", pa.int32()),
    ]
)

# --- pre-canonical mentions (output of the extractor stage) ---
# occurrence key (doc_id, order_index, mention_index) defines the deterministic
# merge order that replaces the reference's goroutine-completion order
# (SURVEY.md §7.0).
ENTITY_MENTIONS_SCHEMA = pa.schema(
    [
        pa.field("doc_id", pa.string()),
        pa.field("chunk_id", pa.string()),
        pa.field("order_index", pa.int32()),
        pa.field("mention_index", pa.int32()),
        pa.field("name", pa.string()),        # upper-cased (insert.go:478)
        pa.field("type", pa.string()),        # validated vs allowlist else UNKNOWN (insert.go:472-476)
        pa.field("description", pa.string()),
    ]
)

RELATION_MENTIONS_SCHEMA = pa.schema(
    [
        pa.field("doc_id", pa.string()),
        pa.field("chunk_id", pa.string()),
        pa.field("order_index", pa.int32()),
        pa.field("mention_index", pa.int32()),
        pa.field("src", pa.string()),         # upper-cased (insert.go:487)
        pa.field("tgt", pa.string()),         # upper-cased (insert.go:488)
        pa.field("description", pa.string()),
        pa.field("keywords", pa.list_(pa.string())),
        pa.field("weight", pa.float64()),
    ]
)

# --- materialized graph (reference GraphEntity/GraphRelationship, rag.go:181-200) ---
NODES_SCHEMA = pa.schema(
    [
        pa.field("entity_id", pa.string()),
        pa.field("entity_type", pa.string()),
        pa.field("descriptions", pa.list_(pa.string())),
        pa.field("source_ids", pa.list_(pa.string())),
        pa.field("mention_count", pa.int64()),
        pa.field("created_at", pa.timestamp("us")),
    ]
)

EDGES_SCHEMA = pa.schema(
    [
        pa.field("src", pa.string()),
        pa.field("tgt", pa.string()),
        pa.field("weight", pa.float64()),
        pa.field("descriptions", pa.list_(pa.string())),
        pa.field("keywords", pa.list_(pa.string())),
        pa.field("source_ids", pa.list_(pa.string())),
        pa.field("created_at", pa.timestamp("us")),
    ]
)

# --- parity view: the P/R gate set (FIXTURES F5) ---
TRIPLES_SCHEMA = pa.schema(
    [
        pa.field("subj", pa.string()),
        pa.field("pred", pa.string()),  # first relationship keyword in canonical order
        pa.field("obj", pa.string()),
    ]
)

EMBEDDINGS_SCHEMA = pa.schema(
    [
        pa.field("chunk_id", pa.string()),
        pa.field("model", pa.string()),
        pa.field("vector", pa.list_(pa.float32())),
        pa.field("dims", pa.int32()),
    ]
)
