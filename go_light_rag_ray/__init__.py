"""go_light_rag_ray — a Ray-Data-native knowledge-graph construction engine.

From-scratch reimplementation of the data-processing capabilities of
soundprediction/go-light-rag (reference at /root/reference, read-only) on top of
``ray.data.Dataset``: token-budgeted chunking with overlap, deterministic
prompt-driven (subj, pred, obj) triple extraction with gleaning, entity
canonicalization (name-normalization + description-merge), and graph
materialization into node/edge tables — expressed as ``map_batches`` over
zero-copy Arrow batches, actor pools for stateful stages, and salted
groupby-aggregate shuffles for the wide steps.

This is NOT a port: the reference is a single-process Go library whose merge
path is a racy per-key read-modify-write against external DBs
(reference insert.go:499-690); here the same semantics are a pure,
deterministic aggregation over all mentions (SURVEY.md §7.0).
"""

__version__ = "0.1.0"

GRAPH_FIELD_SEPARATOR = "<SEP>"  # reference insert.go:62 (GraphFieldSeparator)


# Public API — constants above must stay defined before these imports
# (submodules import them back from this package).
from .pipelines.kg import (  # noqa: E402
    Handler,
    build_graph,
    chunk_documents,
    extract_mentions,
    ingest_prechunked,
    kg_pipeline,
    kg_pipeline_incremental,
    process_staged,
    read_graph,
    run_kg,
    stage_chunks,
    write_graph,
)
from .pipelines.query import query, query_context  # noqa: E402
from .pipelines.curate import curate_corpus  # noqa: E402
from .sources.dirwalk import (  # noqa: E402
    read_directory_documents,
    save_hash_store,
)
from .sources.export import export_training_shards, shard_manifest  # noqa: E402
from .stages.dedup import (  # noqa: E402
    cluster_duplicates,
    exact_dedup,
    embedding_dup_pairs,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    semantic_dedup,
    simhash_fingerprints,
)
from .stages.graphalg import components, pagerank, triangles  # noqa: E402
from .stages.packing import pack_sequences, prefix_sum  # noqa: E402
from .stages.similarity import (  # noqa: E402
    ann_topk,
    ann_topk_ivf,
    ann_topk_lsh,
    embed_clusters,
)
from .stages.sampling import hash_sample, split_assign  # noqa: E402
from .stages.spandedup import duplicate_spans  # noqa: E402
from .stages.textstats import inverted_index  # noqa: E402

__all__ = [
    "GRAPH_FIELD_SEPARATOR",
    "Handler",
    "ann_topk", "ann_topk_ivf", "ann_topk_lsh",
    "build_graph", "chunk_documents", "cluster_duplicates", "components",
    "curate_corpus", "duplicate_spans", "embed_clusters",
    "embedding_dup_pairs", "exact_dedup", "export_training_shards",
    "extract_mentions", "hash_sample",
    "ingest_prechunked", "inverted_index", "kg_pipeline",
    "kg_pipeline_incremental",
    "minhash_lsh_pairs", "ngram_jaccard_pairs", "pack_sequences",
    "pagerank", "prefix_sum", "process_staged", "query",
    "read_directory_documents", "save_hash_store",
    "query_context", "read_graph", "run_kg", "semantic_dedup",
    "shard_manifest", "simhash_fingerprints",
    "split_assign", "stage_chunks", "triangles", "write_graph",
]
