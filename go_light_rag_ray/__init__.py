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
