"""Driver contract: entry() smoke, queries() vs oracle_sql() correctness gate.

Ray is initialised by the driver BEFORE this module is imported: nothing
here (or in the library) calls ``ray.init()`` / ``ray.shutdown()``.

Query families (34 with DuckDB value oracles, 3 rows-only):

- kg_* / ctx_* / mentions / chunks — the flagship pipeline (chunk →
  extract → glean → canonicalize) and the retrieval path over the driver
  ``documents`` table with the ``word_cooccurrence`` rule set
  (stages/extractor.py), designed to be exactly mirrored in ANSI SQL so
  DuckDB oracles the *dataflow* (normalization, grouping, ordered-distinct
  merge, weight accumulation, placeholder nodes — reference
  insert.go:454-690); the canonical graph is built once per sf_dir and
  cached (``_graph``).
- dedup_* — exact / MinHash-LSH / SimHash / n-gram-Jaccard /
  embedding-cosine near-dup + connected-component clustering.
- text_* / curate / split_assign / hash_sample — text analysis, the
  composed corpus-cleaning pass, deterministic sampling.
- ann_topk(_lsh/_ivf) / media_features / span_check — similarity search,
  multimodal plumbing, the per-row span-sequence invariant.
- window_* / sessions / asof_join — event-time operators over ``events``.
- chunks_by_handler / chunk_embeddings / entity_ann — rows-only (their
  hash-projection vectors / chunker internals are not SQL).

Every value oracle matches BIT-EXACTLY (the driver hashes values): all
hashing is md5, ratios derive from integers, edge weights are dyadic
(order-independent float sums), cosines round to 6 dp on ``DOUBLE``-cast
inputs, and column names/dtypes are aligned on both sides.
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
        merge_cap=0,                    # exact accumulation (no first-K cap)
        content_mode="text",
        doc_id_format="doc-{:09d}",     # zero-padded: string order == numeric
    )


# The canonical graph is the shared base of 9 queries (kg_* + ctx_*); build
# it once per sf_dir and keep the (small — it IS the reduced output) result
# materialized in the object store.  First query pays the build, the rest
# reuse — the realistic "index once, query many" shape.
_GRAPH_CACHE: dict[str, ray.data.Dataset] = {}


def _graph(sf_dir: str) -> ray.data.Dataset:
    ds = _GRAPH_CACHE.get(sf_dir)
    if ds is None:
        ds = kg_pipeline(_docs(sf_dir), _oracle_handler()).materialize()
        _GRAPH_CACHE[sf_dir] = ds
    return ds


_MERGED_GRAPH_CACHE: dict[str, ray.data.Dataset] = {}
_LINK_THRESHOLD = 0.1  # accept char-trigram name candidates at ≥ 0.1


def _merged_graph(sf_dir: str) -> ray.data.Dataset:
    """Canonical graph after alias resolution: name-gram candidate pairs
    at ≥ _LINK_THRESHOLD collapse connected components onto their min-id
    member (stages/canonicalize.merge_entities re-entering the merge
    shuffle via graph_to_partials)."""
    ds = _MERGED_GRAPH_CACHE.get(sf_dir)
    if ds is None:
        from go_light_rag_ray.stages.canonicalize import merge_entities
        from go_light_rag_ray.stages.linking import name_gram_pairs

        g = _graph(sf_dir)
        pairs = name_gram_pairs(g.filter(expr="kind == 'node'"), max_group=0)
        ds = merge_entities(g, pairs, threshold=_LINK_THRESHOLD).materialize()
        _MERGED_GRAPH_CACHE[sf_dir] = ds
    return ds


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


_MENTIONS_CACHE: dict[str, ray.data.Dataset] = {}


def _mentions(sf_dir: str) -> ray.data.Dataset:
    """Materialized oracle-handler mention stream, cached per sf_dir —
    the delete/diff queries both consume it (the _graph() pattern)."""
    ds = _MENTIONS_CACHE.get(sf_dir)
    if ds is None:
        from go_light_rag_ray.pipelines.kg import (chunk_documents,
                                                   extract_mentions)

        handler = _oracle_handler()
        ds = extract_mentions(
            chunk_documents(_docs(sf_dir), handler), handler).materialize()
        _MENTIONS_CACHE[sf_dir] = ds
    return ds


def q_kg_nodes_deleted(sf_dir: str) -> ray.data.Dataset:
    """Incremental DELETE (pipelines/kg.delete_documents): the first 10
    docs retracted from the cached canonical graph by rebuilding ONLY
    the keys they touched from the retained mention stream — O(affected
    keys), never a corpus rebuild.  Value-oracled against the full SQL
    graph over the retained documents."""
    from go_light_rag_ray.pipelines.kg import delete_documents

    del_ids = [f"doc-{i:09d}" for i in range(10)]
    graph = delete_documents(_graph(sf_dir), _mentions(sf_dir), del_ids,
                             _oracle_handler())
    nodes = graph.filter(expr="kind == 'node'")

    def view(b: pa.Table) -> pa.Table:
        b = b.select(["entity_id", "entity_type", "mention_count",
                      "descriptions", "source_ids"])
        return _join_sep(b, ["descriptions", "source_ids"])

    return nodes.map_batches(view, batch_format="pyarrow")


def q_kg_nodes_updated(sf_dir: str) -> ray.data.Dataset:
    """Incremental UPDATE (pipelines/kg.update_documents): docs 0-9
    replaced IN PLACE by the content of docs 10-19 (same ids) — the
    delete path with the replacements' mentions joining the affected-key
    rebuild.  Exact for any corpus position; value-oracled against the
    full SQL graph over the spliced corpus."""
    from go_light_rag_ray.pipelines.kg import update_documents

    def remap(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        keep = pc.and_(pc.greater_equal(b.column("doc_id"), 10),
                       pc.less(b.column("doc_id"), 20))
        b = b.filter(keep)
        return pa.table({"doc_id": pc.subtract(b.column("doc_id"), 10),
                         "text": b.column("text")})

    new_docs = _docs(sf_dir).map_batches(remap, batch_format="pyarrow")
    graph = update_documents(_graph(sf_dir), _mentions(sf_dir), new_docs,
                             _oracle_handler())
    nodes = graph.filter(expr="kind == 'node'")

    def view(b: pa.Table) -> pa.Table:
        b = b.select(["entity_id", "entity_type", "mention_count",
                      "descriptions", "source_ids"])
        return _join_sep(b, ["descriptions", "source_ids"])

    return nodes.map_batches(view, batch_format="pyarrow")


def q_kg_diff(sf_dir: str) -> ray.data.Dataset:
    """Graph snapshot diff: which node keys were added/removed/changed by
    retracting the first 10 docs — stages/diff.corpus_diff re-applied to
    RENDERED node rows (the graph is just another keyed table; one
    side-sum co-shuffle, no joins).  Audits the incremental delete."""
    from go_light_rag_ray.pipelines.kg import delete_documents
    from go_light_rag_ray.stages.diff import corpus_diff

    del_ids = [f"doc-{i:09d}" for i in range(10)]
    new_graph = delete_documents(_graph(sf_dir), _mentions(sf_dir),
                                 del_ids, _oracle_handler())

    def render(b: pa.Table) -> pa.Table:
        b = b.select(["entity_id", "entity_type", "mention_count",
                      "descriptions", "source_ids"])
        b = _join_sep(b, ["descriptions", "source_ids"])
        import pyarrow.compute as pc
        text = pc.binary_join_element_wise(
            b.column("entity_type"),
            pc.cast(b.column("mention_count"), pa.string()),
            b.column("descriptions"), b.column("source_ids"), "|")
        return pa.table({"entity_id": b.column("entity_id"),
                         "text": text})

    old_nodes = _graph(sf_dir).filter(expr="kind == 'node'").map_batches(
        render, batch_format="pyarrow")
    new_nodes = new_graph.filter(expr="kind == 'node'").map_batches(
        render, batch_format="pyarrow")
    return corpus_diff(old_nodes, new_nodes, id_col="entity_id")


def q_kg_edges(sf_dir: str) -> ray.data.Dataset:
    """Deduped edges: additive weight (insert.go:595,609-615),
    ordered-distinct descriptions/keywords/source_ids."""
    edges = _graph(sf_dir).filter(expr="kind == 'edge'")

    def view(b: pa.Table) -> pa.Table:
        b = b.select(["src", "tgt", "weight", "mention_count",
                      "descriptions", "keywords", "source_ids"])
        return _join_sep(b, ["descriptions", "keywords", "source_ids"])

    return edges.map_batches(view, batch_format="pyarrow")


def q_kg_merged_nodes(sf_dir: str) -> ray.data.Dataset:
    """Entity nodes after fuzzy alias resolution (merge_entities over
    name-gram candidates at ≥ 0.1): merged components keep the min id,
    re-voted type, summed mention counts, position-ordered merged lists."""
    nodes = _merged_graph(sf_dir).filter(expr="kind == 'node'")

    def view(b: pa.Table) -> pa.Table:
        b = b.select(["entity_id", "entity_type", "mention_count",
                      "descriptions", "source_ids"])
        return _join_sep(b, ["descriptions", "source_ids"])

    return nodes.map_batches(view, batch_format="pyarrow")


def q_kg_merged_edges(sf_dir: str) -> ray.data.Dataset:
    """Edges after alias resolution: endpoints re-pointed at merged ids,
    co-located duplicates folded (weights/mention counts summed,
    position-ordered merged lists)."""
    edges = _merged_graph(sf_dir).filter(expr="kind == 'edge'")

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


# ---------------------------------------------------------------------------
# training-data operators: dedup / text analysis / similarity / multimodal
# ---------------------------------------------------------------------------

def _raw_docs(sf_dir: str) -> ray.data.Dataset:
    return ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )


def _raw_embeddings(sf_dir: str) -> ray.data.Dataset:
    return ray.data.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )


def q_dedup_exact(sf_dir: str) -> ray.data.Dataset:
    from go_light_rag_ray.stages.dedup import exact_dedup

    return exact_dedup(_raw_docs(sf_dir))


def q_dedup_minhash_lsh(sf_dir: str) -> ray.data.Dataset:
    from go_light_rag_ray.stages.dedup import minhash_lsh_pairs

    return minhash_lsh_pairs(_raw_docs(sf_dir), num_perm=16, bands=4, shingle_k=3,
                             max_group=0)


def q_dedup_simhash(sf_dir: str) -> ray.data.Dataset:
    from go_light_rag_ray.stages.dedup import simhash_fingerprints

    return simhash_fingerprints(_raw_docs(sf_dir), bits=16)


def q_dedup_jaccard(sf_dir: str) -> ray.data.Dataset:
    from go_light_rag_ray.stages.dedup import ngram_jaccard_pairs

    return ngram_jaccard_pairs(_raw_docs(sf_dir), shingle_k=3, threshold=0.3,
                               max_group=0)


_CLUSTER_CACHE: dict[str, ray.data.Dataset] = {}


def _clusters(sf_dir: str) -> ray.data.Dataset:
    """Materialized MinHash duplicate clusters, cached per sf_dir — the
    same shared-intermediate pattern as _graph(): dedup_clusters and
    dedup_keep_best both consume this table, so the pair generation +
    component pass runs once per session."""
    ds = _CLUSTER_CACHE.get(sf_dir)
    if ds is None:
        from go_light_rag_ray.stages.dedup import (cluster_duplicates,
                                                   minhash_lsh_pairs)

        docs = _raw_docs(sf_dir)
        pairs = minhash_lsh_pairs(docs, num_perm=16, bands=4, shingle_k=3,
                                  max_group=0)
        ds = cluster_duplicates(docs, pairs).materialize()
        _CLUSTER_CACHE[sf_dir] = ds
    return ds


def q_dedup_clusters(sf_dir: str) -> ray.data.Dataset:
    """Near-dup clustering: connected components over the MinHash candidate
    pairs; cluster_id = smallest doc id in the component."""
    return _clusters(sf_dir)


def q_dedup_keep_best(sf_dir: str) -> ray.data.Dataset:
    """The production keep-rule after clustering: per duplicate cluster,
    keep the highest-quality member (stages/dedup.keep_best — one
    doc-keyed co-shuffle + associative argmax combiner; the cluster
    exchange carries per-batch partials, never the corpus).  Shares the
    cached cluster table with dedup_clusters (_clusters)."""
    from go_light_rag_ray.stages.dedup import keep_best
    from go_light_rag_ray.stages.textstats import quality_scores

    return keep_best(_clusters(sf_dir), quality_scores(_raw_docs(sf_dir)))


def q_dedup_embedding(sf_dir: str) -> ray.data.Dataset:
    from go_light_rag_ray.stages.dedup import embedding_dup_pairs

    return embedding_dup_pairs(_raw_embeddings(sf_dir), threshold=0.3, sign_bits=8,
                               max_group=0)


def q_text_postings(sf_dir: str) -> ray.data.Dataset:
    """Inverted-index construction: distinct (word, doc) pairs →
    per-word df + '|'-joined ascending postings string."""
    from go_light_rag_ray.stages.textstats import inverted_index

    return inverted_index(_raw_docs(sf_dir), min_df=2)


def q_shard_manifest(sf_dir: str) -> ray.data.Dataset:
    """Per-shard counters of the hash-sharded training export
    (sources/export.shard_manifest): deterministic md5 doc→shard keying,
    batch-level bincount partials, 16-row result."""
    from go_light_rag_ray.sources.export import shard_manifest

    return shard_manifest(_raw_docs(sf_dir), n_shards=16)


def q_pack_sequences(sf_dir: str) -> ray.data.Dataset:
    """Concat-and-chunk sequence packing: exact distributed prefix-sum of
    token counts in doc_id order → per-doc pack window assignment."""
    from go_light_rag_ray.stages.packing import pack_sequences

    return pack_sequences(_raw_docs(sf_dir), budget=1024)


def q_curriculum_pack(sf_dir: str) -> ray.data.Dataset:
    """Curriculum packing (stages/packing.pack_curriculum): concatenate
    documents highest-unigram-score first and cut 1024-token windows —
    the quality-ordered variant of pack_sequences, same one-sort +
    prefix-sum shape, all-integer window arithmetic."""
    from go_light_rag_ray.stages.lm import unigram_score
    from go_light_rag_ray.stages.packing import pack_curriculum

    scored = unigram_score(_raw_docs(sf_dir)).select_columns(
        ["doc_id", "n_tokens", "mean_token_freq"])
    return pack_curriculum(scored, "mean_token_freq", budget=1024)


def q_corpus_summary(sf_dir: str) -> ray.data.Dataset:
    """One-row corpus data card (stages/textstats.corpus_summary): one
    partial row per batch to the driver + the vocabulary-sized word
    shuffle for the distinct count."""
    from go_light_rag_ray.stages.textstats import corpus_summary

    return corpus_summary(_raw_docs(sf_dir))


def q_pack_stats(sf_dir: str) -> ray.data.Dataset:
    """Per-pack shard-balance report (stages/packing.pack_stats) over the
    concat-and-chunk assignment: doc count, token fill, straddler count
    per 1024-token window."""
    from go_light_rag_ray.stages.packing import pack_sequences, pack_stats

    return pack_stats(pack_sequences(_raw_docs(sf_dir), budget=1024),
                      budget=1024)


def q_dedup_semantic(sf_dir: str) -> ray.data.Dataset:
    """SemDeDup: nearest-centroid clusters scope the pairwise cosine check;
    a vector is duplicate iff a lower-id cluster-mate scores ≥ 0.35."""
    from go_light_rag_ray.stages.dedup import semantic_dedup

    return semantic_dedup(_raw_embeddings(sf_dir), n_centroids=8,
                          threshold=0.35)


def q_text_stats(sf_dir: str) -> ray.data.Dataset:
    from go_light_rag_ray.stages.textstats import token_stats

    return token_stats(_raw_docs(sf_dir))


def q_text_quality(sf_dir: str) -> ray.data.Dataset:
    from go_light_rag_ray.stages.textstats import quality_scores

    return quality_scores(_raw_docs(sf_dir))


def q_text_langid(sf_dir: str) -> ray.data.Dataset:
    from go_light_rag_ray.stages.textstats import language_id

    return language_id(_raw_docs(sf_dir))


def q_text_tfidf(sf_dir: str) -> ray.data.Dataset:
    from go_light_rag_ray.stages.textstats import tfidf_top_terms

    return tfidf_top_terms(_raw_docs(sf_dir), k=3)


_BM25_TERMS = ["merge", "dup", "scan"]


def q_text_bm25(sf_dir: str) -> ray.data.Dataset:
    """BM25 top-20 docs for a fixed bag-of-terms query (stages/bm25.py).
    Oracle mode uses the rational (log-free) idf so every double on both
    sides is the same fixed-order rational of exact integers."""
    from go_light_rag_ray.stages.bm25 import bm25_topk

    return bm25_topk(_raw_docs(sf_dir), _BM25_TERMS, k=20, idf="rational")


def q_hybrid_topk(sf_dir: str) -> ray.data.Dataset:
    """Hybrid document retrieval: BM25 lexical leg ⊕ cosine-ANN vector leg
    (query = embedding row 0), fused by integer RRF (stages/bm25.py)."""
    from go_light_rag_ray.stages.bm25 import hybrid_doc_topk

    return hybrid_doc_topk(
        _raw_docs(sf_dir), _raw_embeddings(sf_dir), _BM25_TERMS,
        k_leg=20, k=10, idf="rational")


def q_corpus_diff(sf_dir: str) -> ray.data.Dataset:
    """Snapshot diff between two deterministic views of the documents
    table (old = ids with id%11 != 3; new = ids with id%7 != 2, text
    suffixed ' v2' when id%5 == 0) — added/removed/changed by content
    hash (stages/diff.py)."""
    import pyarrow as _pa
    import pyarrow.compute as _pc

    from go_light_rag_ray.stages.diff import corpus_diff

    docs = _raw_docs(sf_dir)

    def old_side(b: _pa.Table) -> _pa.Table:
        ids = b.column("doc_id").to_numpy()
        return b.filter(_pa.array(ids % 11 != 3))

    def new_side(b: _pa.Table) -> _pa.Table:
        ids = b.column("doc_id").to_numpy()
        b = b.filter(_pa.array(ids % 7 != 2))
        ids = b.column("doc_id").to_numpy()
        bumped = _pc.binary_join_element_wise(
            b.column("text"), _pa.nulls(len(b), _pa.string()).fill_null(" v2"),
            "")
        text = _pc.if_else(_pa.array(ids % 5 == 0), bumped, b.column("text"))
        return b.set_column(b.column_names.index("text"), "text", text)

    return corpus_diff(docs.map_batches(old_side, batch_format="pyarrow"),
                       docs.map_batches(new_side, batch_format="pyarrow"))


def q_split_assign(sf_dir: str) -> ray.data.Dataset:
    """Deterministic train/val/test assignment by md5 hash range — stable
    across runs, cluster sizes, and block layouts (stages/sampling.py)."""
    from go_light_rag_ray.stages.sampling import split_assign

    return split_assign(
        _raw_docs(sf_dir).select_columns(["doc_id"]), id_col="doc_id"
    )


def q_split_leakage_safe(sf_dir: str) -> ray.data.Dataset:
    """Leakage-safe split: hash the near-dup CLUSTER id, not the doc id,
    so every member of a duplicate cluster lands in the same split (no
    train→test contamination through near-duplicates).  Composes the
    cached cluster table with stages/sampling.split_by_cluster."""
    from go_light_rag_ray.stages.sampling import split_by_cluster

    return split_by_cluster(_clusters(sf_dir))


def q_hash_sample(sf_dir: str) -> ray.data.Dataset:
    from go_light_rag_ray.stages.sampling import hash_sample

    return hash_sample(
        _raw_docs(sf_dir).select_columns(["doc_id"]), fraction=0.25
    )


def q_curate(sf_dir: str) -> ray.data.Dataset:
    """Composed curation pass: quality + language filters fused into the
    read, exact dedup keep-first as the only shuffle (pipelines/curate.py)."""
    from go_light_rag_ray.pipelines.curate import curate_corpus

    return curate_corpus(_raw_docs(sf_dir), min_quality=0.5, langs=("en",))


def q_text_fingerprint(sf_dir: str) -> ray.data.Dataset:
    from go_light_rag_ray.stages.textstats import fingerprints

    return fingerprints(_raw_docs(sf_dir), shingle_k=4)


def q_ann_topk(sf_dir: str) -> ray.data.Dataset:
    from go_light_rag_ray.stages.similarity import ann_topk

    return ann_topk(_raw_embeddings(sf_dir), n_queries=8, k=5)


def q_ann_topk_lsh(sf_dir: str) -> ray.data.Dataset:
    from go_light_rag_ray.stages.similarity import ann_topk_lsh

    return ann_topk_lsh(_raw_embeddings(sf_dir), n_queries=8, k=5, sign_bits=4)


def q_ann_topk_ivf(sf_dir: str) -> ray.data.Dataset:
    from go_light_rag_ray.stages.similarity import ann_topk_ivf

    return ann_topk_ivf(_raw_embeddings(sf_dir), n_queries=8, k=5, n_centroids=8)


def q_embed_clusters(sf_dir: str) -> ray.data.Dataset:
    """Nearest-centroid cluster assignment over the embedding table
    (SemDeDup-style semantic bucketing); oracle mode = first-8 seed
    centroids, value-checked."""
    from go_light_rag_ray.stages.similarity import embed_clusters

    return embed_clusters(_raw_embeddings(sf_dir), n_centroids=8)


def q_media_features(sf_dir: str) -> ray.data.Dataset:
    from go_light_rag_ray.sources.io import flat_documents_as_interleaved
    from go_light_rag_ray.stages.multimodal import featurize_media

    docs = _raw_docs(sf_dir).map_batches(
        flat_documents_as_interleaved, batch_format="pyarrow"
    )
    return featurize_media(docs, backend="fake")


def q_media_decode(sf_dir: str) -> ray.data.Dataset:
    """REAL media decode end-to-end (stages/mediadec.py): media spans →
    deterministic payloads synthesized from each ref's md5, cycling slot
    k % 4 through the four decode paths — 8-bit P6 PPM, single-chunk
    PCM-16 WAV, 16-bit P5 PGM (maxval 65535, big-endian samples), and
    multi-``data``-chunk WAV (streaming-writer layout; the decoder
    concatenates chunks, so its features equal the single-chunk case) —
    then actual PNM/RIFF parsing + integer feature math in the actor
    pool.  The oracle recomputes the expected features from md5
    arithmetic; the engine gets them by encoding and then DECODING real
    bytes."""
    from go_light_rag_ray.sources.io import flat_documents_as_interleaved
    from go_light_rag_ray.stages.mediadec import (
        RawMediaFeaturizer,
        synthesize_pgm16,
        synthesize_ppm,
        synthesize_wav,
    )
    from go_light_rag_ray.stages.multimodal import extract_media_spans

    docs = _raw_docs(sf_dir).map_batches(
        flat_documents_as_interleaved, batch_format="pyarrow"
    )

    def attach_payload(b: pa.Table) -> pa.Table:
        refs = b.column("media_ref").to_pylist()
        slots = b.column("span_index").to_pylist()   # k = span_index - 1
        payloads, kinds = [], []
        for r, si in zip(refs, slots):
            par = (si - 1) % 4
            if par == 1:
                payloads.append(synthesize_wav(r))
                kinds.append("audio")
            elif par == 3:
                payloads.append(synthesize_wav(r, n_chunks=2))
                kinds.append("audio")
            elif par == 2:
                payloads.append(synthesize_pgm16(r))
                kinds.append("image")
            else:
                payloads.append(synthesize_ppm(r))
                kinds.append("image")
        return (b.set_column(b.schema.get_field_index("kind"), "kind",
                             pa.array(kinds, pa.string()))
                 .append_column("payload", pa.array(payloads, pa.binary())))

    return (
        extract_media_spans(docs)
        .map_batches(attach_payload, batch_format="pyarrow")
        # small batches: binary payloads × pool concurrency must fit the
        # worker heap (the multimodal batch-sizing rule)
        .map_batches(RawMediaFeaturizer, batch_format="pyarrow",
                     batch_size=256, concurrency=(1, 8))
    )


def q_graph_summary(sf_dir: str) -> ray.data.Dataset:
    """One-row graph data card (stages/graphalg.graph_summary): one
    partial row per block; dyadic edge weights sum exactly as 2x int."""
    from go_light_rag_ray.stages.graphalg import graph_summary

    return graph_summary(_graph(sf_dir))


def q_events_summary(sf_dir: str) -> ray.data.Dataset:
    """One-row events data card (stages/windows.events_summary): scalar
    partials one-row-per-block + ONE tagged-distinct exchange for the two
    exact distinct counts; values as exact integer cents."""
    from go_light_rag_ray.stages.windows import events_summary

    return events_summary(_raw_events(sf_dir))


def q_ann_topk_ivfpq(sf_dir: str) -> ray.data.Dataset:
    """IVF-PQ serving shape (quantize.ann_topk_ivfpq): coarse-cell
    restriction + integer ADC over PQ codes — the composition of the
    ann_topk_ivf cell rule and the pq_ann_topk distance algebra, both
    already oracled, so the combined path is too (nprobe=1)."""
    from go_light_rag_ray.stages.quantize import ann_topk_ivfpq

    return ann_topk_ivfpq(_raw_embeddings(sf_dir), n_queries=4, k=5,
                          n_centroids=8, n_subspaces=4, n_pq_centroids=8)


def q_weighted_sample(sf_dir: str) -> ray.data.Dataset:
    """Deterministic systematic weighted sampling
    (stages/sampling.systematic_weighted_sample): 100 picks proportional
    to token count via the all-integer closed-form target count over one
    prefix-sum — no RNG, stable under repartitioning, bit-exact oracle."""
    from go_light_rag_ray.stages.sampling import systematic_weighted_sample
    from go_light_rag_ray.stages.textstats import token_stats

    counted = token_stats(_raw_docs(sf_dir)).select_columns(
        ["doc_id", "n_tokens"])
    return systematic_weighted_sample(counted, "n_tokens", k=100)


def q_kg_degrees(sf_dir: str) -> ray.data.Dataset:
    """Per-entity degree over the canonical graph (reference A4,
    neo.go:410-472): every node contributes 0, every edge endpoint 1."""
    import ray.data.aggregate as agg

    graph = _graph(sf_dir)

    def unpivot(b: pa.Table) -> pa.Table:
        is_edge = pc.equal(b.column("kind"), "edge")
        edges, nodes = b.filter(is_edge), b.filter(pc.invert(is_edge))
        ent = pa.concat_arrays(
            [
                nodes.column("entity_id").combine_chunks(),
                edges.column("src").combine_chunks(),
                edges.column("tgt").combine_chunks(),
            ]
        )
        ones = pa.concat_arrays(
            [
                pa.nulls(len(nodes), pa.int64()).fill_null(0),
                pa.nulls(2 * len(edges), pa.int64()).fill_null(1),
            ]
        )
        return pa.Table.from_arrays([ent, ones], names=["entity_id", "inc"])

    return (
        graph.map_batches(unpivot, batch_format="pyarrow")
        .groupby("entity_id")
        .aggregate(agg.Sum("inc", alias_name="degree"))
    )


def q_kg_pagerank(sf_dir: str) -> ray.data.Dataset:
    """Fixed-point integer PageRank over the canonical graph
    (stages/graphalg.pagerank — 3 iterations, scale 10⁶, damping 85/100;
    every contribution is int64 floor division so the oracle is bit-exact
    with zero float-order caveats)."""
    from go_light_rag_ray.stages.graphalg import pagerank

    return pagerank(_graph(sf_dir))


def q_kg_ppr(sf_dir: str) -> ray.data.Dataset:
    """Personalized PageRank seeded at the retrieval path's low-level
    keywords — rank entities by proximity to the query seeds (the
    graph-analytics view of local context ranking; same all-int64
    fixed-point arithmetic as kg_pagerank)."""
    from go_light_rag_ray.pipelines.query import DEFAULT_LOW_LEVEL
    from go_light_rag_ray.stages.graphalg import pagerank

    return pagerank(_graph(sf_dir), seeds=list(DEFAULT_LOW_LEVEL))


def q_kg_components(sf_dir: str) -> ray.data.Dataset:
    """Undirected connected components of the canonical graph with
    min-entity-id labels (stages/graphalg.components, delegating to the
    dedup clustering engine)."""
    from go_light_rag_ray.stages.graphalg import components

    return components(_graph(sf_dir))


def q_kg_hops(sf_dir: str) -> ray.data.Dataset:
    """Bounded-depth BFS hop distance from the retrieval seed entities —
    multi-hop context expansion (stages/graphalg.hop_distance)."""
    from go_light_rag_ray.pipelines.query import DEFAULT_LOW_LEVEL
    from go_light_rag_ray.stages.graphalg import hop_distance

    return hop_distance(_graph(sf_dir), list(DEFAULT_LOW_LEVEL), max_depth=3)


def q_kg_sssp(sf_dir: str) -> ray.data.Dataset:
    """Bounded-hop weighted shortest path from the retrieval seeds
    (stages/graphalg.weighted_sssp): hop_distance with the edge's dyadic
    relationship weight (in exact half-units) as the length — Bellman-Ford
    rounds, broadcast relax / segment attach per round."""
    from go_light_rag_ray.pipelines.query import DEFAULT_LOW_LEVEL
    from go_light_rag_ray.stages.graphalg import weighted_sssp

    return weighted_sssp(_graph(sf_dir), list(DEFAULT_LOW_LEVEL), max_hops=3)


def q_kg_kcore(sf_dir: str) -> ray.data.Dataset:
    """2-core of the canonical graph (stages/graphalg.kcore — simultaneous
    Jacobi peel, two keyed sorts per round, no driver-side state); rounds
    bounded at 8 to mirror the unrolled SQL (extra rounds past the
    fixpoint are no-ops on both sides)."""
    from go_light_rag_ray.stages.graphalg import kcore

    return kcore(_graph(sf_dir), k=2, rounds=8)


def q_kg_triangles(sf_dir: str) -> ray.data.Dataset:
    """Per-node triangle counts over the canonical graph
    (stages/graphalg.triangles — degree-ordered node-iterator, integer
    counts, explicit zero rows)."""
    from go_light_rag_ray.stages.graphalg import triangles

    return triangles(_graph(sf_dir))


def q_entity_name_pairs(sf_dir: str) -> ray.data.Dataset:
    """String-side entity-linking candidates: char-trigram Jaccard between
    canonical entity names (stages/linking.name_gram_pairs — the
    Fellegi-Sunter blocking step; embedding-side twin is entity_ann).
    Exact mode (max_group=0) for the oracle."""
    from go_light_rag_ray.stages.linking import name_gram_pairs

    nodes = _graph(sf_dir).filter(expr="kind == 'node'")
    return name_gram_pairs(nodes, max_group=0)


def q_kg_neighbor_jaccard(sf_dir: str) -> ray.data.Dataset:
    """Shared-neighbor (adjacency-Jaccard) entity similarity — the
    structural entity-linking score over the canonical graph
    (stages/graphalg.neighbor_jaccard: wedge counting with degrees riding
    along, 6-dp floor-rounded ratio)."""
    from go_light_rag_ray.stages.graphalg import neighbor_jaccard

    return neighbor_jaccard(_graph(sf_dir))


def q_kg_edge_lift(sf_dir: str) -> ray.data.Dataset:
    """Doc-co-occurrence association (lift = exp PMI) per canonical edge —
    edge re-weighting that separates informative relationships from ones
    explained by endpoint frequency (stages/graphalg.edge_lift: join-free
    segment attaches, 6-dp floor-rounded single division)."""
    import pyarrow.parquet as pq

    from go_light_rag_ray.stages.graphalg import edge_lift

    n_docs = pq.ParquetFile(f"{sf_dir}/documents.parquet").metadata.num_rows
    return edge_lift(_graph(sf_dir), n_docs=n_docs)


# ---------------------------------------------------------------------------
# retrieval path (reference Query, query.go:92-190): local/global context
# assembly over the canonical graph with fixed keyword sets
# ---------------------------------------------------------------------------

def q_ctx_local_entities(sf_dir: str) -> ray.data.Dataset:
    from go_light_rag_ray.pipelines.query import DEFAULT_LOW_LEVEL, local_entities

    return local_entities(_graph(sf_dir), list(DEFAULT_LOW_LEVEL))


def q_ctx_local_relationships(sf_dir: str) -> ray.data.Dataset:
    from go_light_rag_ray.pipelines.query import (
        DEFAULT_LOW_LEVEL,
        local_relationships,
    )

    return local_relationships(_graph(sf_dir), list(DEFAULT_LOW_LEVEL))


def q_ctx_local_sources(sf_dir: str) -> ray.data.Dataset:
    from go_light_rag_ray.pipelines.query import DEFAULT_LOW_LEVEL, local_sources

    return local_sources(_graph(sf_dir), list(DEFAULT_LOW_LEVEL))


def q_ctx_global_edges(sf_dir: str) -> ray.data.Dataset:
    from go_light_rag_ray.pipelines.query import DEFAULT_HIGH_LEVEL, global_edges

    return global_edges(_graph(sf_dir), list(DEFAULT_HIGH_LEVEL))


def q_ctx_global_entities(sf_dir: str) -> ray.data.Dataset:
    from go_light_rag_ray.pipelines.query import (
        DEFAULT_HIGH_LEVEL,
        global_entities,
    )

    return global_entities(_graph(sf_dir), list(DEFAULT_HIGH_LEVEL))


def q_ctx_fused_entities(sf_dir: str) -> ray.data.Dataset:
    from go_light_rag_ray.pipelines.query import (
        DEFAULT_HIGH_LEVEL,
        DEFAULT_LOW_LEVEL,
        fused_entities,
    )

    return fused_entities(
        _graph(sf_dir), list(DEFAULT_LOW_LEVEL), list(DEFAULT_HIGH_LEVEL))


def q_events_hll(sf_dir: str) -> ray.data.Dataset:
    """HyperLogLog registers over events.user_id (stages/hll.py) — the
    mergeable approximate companion to window_distinct's exact path.  The
    oracle checks the int-exact REGISTER table; the float estimator is a
    driver-side function over ≤4096 rows."""
    from go_light_rag_ray.stages.hll import hll_registers

    return hll_registers(
        ray.data.read_parquet(f"{sf_dir}/events.parquet",
                              columns=["user_id"]),
        "user_id")


# ---------------------------------------------------------------------------
# event-time operators over the events table (custom operators Ray Data
# lacks: windowed aggregate, sessionization, as-of join — stages/windows.py)
# ---------------------------------------------------------------------------

def _raw_events(sf_dir: str) -> ray.data.Dataset:
    return ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "ts", "user_id", "event_type", "value"],
    )


def q_window_distinct(sf_dir: str) -> ray.data.Dataset:
    """Tumbling-window distinct-user counts: per-batch (window, user)
    combiner -> one pair-key sorted_reduce -> small window groupby (the
    two-level count-distinct reduction, stages/windows
    .tumbling_distinct_users)."""
    from go_light_rag_ray.stages.windows import tumbling_distinct_users

    return tumbling_distinct_users(_raw_events(sf_dir), window_s=3600)


def q_window_tumbling(sf_dir: str) -> ray.data.Dataset:
    from go_light_rag_ray.stages.windows import tumbling_window_agg

    return tumbling_window_agg(_raw_events(sf_dir), window_s=3600)


def q_window_hopping(sf_dir: str) -> ray.data.Dataset:
    from go_light_rag_ray.stages.windows import hopping_window_agg

    return hopping_window_agg(_raw_events(sf_dir), window_s=3600, hop_s=900)


def q_sessions(sf_dir: str) -> ray.data.Dataset:
    from go_light_rag_ray.stages.windows import sessionize

    return sessionize(_raw_events(sf_dir), gap_s=1800)


def q_asof_join(sf_dir: str) -> ray.data.Dataset:
    from go_light_rag_ray.stages.windows import asof_join_latest

    return asof_join_latest(_raw_events(sf_dir), mark_type="error")


def q_sessions_salted(sf_dir: str) -> ray.data.Dataset:
    """Whale-user path: per-(user, day-bucket) sweep + per-user summary
    merge — value-oracled against the SAME sessions SQL (the salted output
    is identical to the unsalted one by construction)."""
    from go_light_rag_ray.stages.windows import sessionize

    return sessionize(_raw_events(sf_dir), gap_s=1800, salt_bucket_s=86400)


def q_session_events(sf_dir: str) -> ray.data.Dataset:
    """Per-event session membership (stages/windows.session_assign): the
    join of the raw stream back onto its gap sessions without a join —
    one user-keyed shuffle, vectorized break scan."""
    from go_light_rag_ray.stages.windows import session_assign

    return session_assign(_raw_events(sf_dir), gap_s=1800)


def q_session_events_salted(sf_dir: str) -> ray.data.Dataset:
    """Whale-user twin of session_events: per-(user, day-bucket) local
    indexes + an O(user·buckets) summary merge producing per-bucket global
    offsets (broadcast back) — same oracle SQL, identical output."""
    from go_light_rag_ray.stages.windows import session_assign

    return session_assign(_raw_events(sf_dir), gap_s=1800,
                          salt_bucket_s=86400)


def q_events_trending(sf_dir: str) -> ray.data.Dataset:
    """Trending property keys per day window with exact previous-window
    counts (stages/windows.window_trending): vectorized JSON extraction →
    (window, key) combiner → per-window top-5 (sorted_topk) → join-free
    previous-window attach (every count row re-keys to the NEXT window as
    a marker)."""
    from go_light_rag_ray.stages.windows import window_trending

    return window_trending(
        ray.data.read_parquet(f"{sf_dir}/events.parquet",
                              columns=["ts", "props"]),
        window_s=86400, k_top=5)


def q_events_funnel(sf_dir: str) -> ray.data.Dataset:
    """First-touch conversion funnel with a 1-day window
    (stages/funnel.funnel_counts): users completing view → click →
    purchase in strict time order, every later step within 24h of the
    first view.  Bucketed user co-shuffle + K vectorized multi-user
    passes per bucket — never one Ray group per user."""
    from go_light_rag_ray.stages.funnel import funnel_counts

    return funnel_counts(_raw_events(sf_dir),
                         steps=("view", "click", "purchase"),
                         within_s=86400)


def q_events_retention(sf_dir: str) -> ray.data.Dataset:
    """Weekly cohort-retention matrix (stages/funnel.retention_cohorts):
    users bucketed by first-event week, counted in every active week.
    Batch-distinct (user, week) combiner keeps the shuffle at
    |users|×|weeks| cardinality; the cohort broadcast is a vectorized
    run-boundary pass inside the user co-shuffle (no join)."""
    from go_light_rag_ray.stages.funnel import retention_cohorts

    return retention_cohorts(_raw_events(sf_dir), period_s=7 * 86400)


def q_asof_salted(sf_dir: str) -> ray.data.Dataset:
    """Whale-user as-of path: bucket sweep + prefix-carry fix; same oracle
    SQL as the unsalted join."""
    from go_light_rag_ray.stages.windows import asof_join_latest

    return asof_join_latest(_raw_events(sf_dir), mark_type="error",
                            salt_bucket_s=86400)


def q_range_join(sf_dir: str) -> ray.data.Dataset:
    """Bounded-range interval join (stages/windows.range_join_count): per
    event, the count of same-user 'error' events in the 5-minute lookback
    window.  Bucket-replication pattern: marks copy to at most 2 time
    buckets, one keyed shuffle, per-group double bisect — no cross join,
    group size bounded by per-user traffic per window, not history."""
    from go_light_rag_ray.stages.windows import range_join_count

    return range_join_count(_raw_events(sf_dir), mark_type="error",
                            window_s=300)


def q_events_running(sf_dir: str) -> ray.data.Dataset:
    """Per-key running aggregates (stages/windows.running_totals): the
    keyed streaming scan — cumulative cents sum, per-user ROW_NUMBER and
    LAG gap in one range sort + two-pass block scan with O(blocks) driver
    summaries.  No per-user groups, so no whale salting needed."""
    from go_light_rag_ray.stages.windows import running_totals

    return running_totals(_raw_events(sf_dir))


def q_pricing_summary(sf_dir: str) -> ray.data.Dataset:
    """TPC-H Q1 shape over lineitem (stages/relational.pricing_summary):
    per-batch Arrow partial aggregation → tiny keyed groupby; the exchange
    carries #batches × 6 rows, never the fact table.  Money in integer
    cents, discounted price as an integer product — bit-exact."""
    from go_light_rag_ray.stages.relational import pricing_summary

    return pricing_summary(ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_returnflag", "l_linestatus", "l_quantity",
                 "l_extendedprice", "l_discount"]))


_PIVOT_CACHE: dict[str, ray.data.Dataset] = {}
_EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]


def _events_pivot(sf_dir: str) -> ray.data.Dataset:
    """Materialized per-user event pivot, cached per sf_dir (the
    _graph()/_clusters() shared-intermediate pattern) — events_pivot and
    events_unpivot both consume it, so the exchange runs once."""
    ds = _PIVOT_CACHE.get(sf_dir)
    if ds is None:
        from go_light_rag_ray.stages.relational import pivot_counts

        ds = pivot_counts(
            ray.data.read_parquet(
                f"{sf_dir}/events.parquet",
                columns=["user_id", "event_type", "value"]),
            "user_id", "event_type", _EVENT_TYPES,
            cents_col="value").materialize()
        _PIVOT_CACHE[sf_dir] = ds
    return ds


def q_events_pivot(sf_dir: str) -> ray.data.Dataset:
    """PIVOT (stages/relational.pivot_counts): one wide row per user with
    a count per event type + integer-cents value total — per-batch
    factorize+bincount combiner, one keyed sum of wide partials."""
    return _events_pivot(sf_dir)


def q_events_unpivot(sf_dir: str) -> ray.data.Dataset:
    """UNPIVOT (stages/relational.unpivot): the wide per-user pivot
    melted back to (user_id, event_type, n) long form — a stateless
    narrow map over the pivot output, zero-count cells included (exactly
    SQL's user × type grid with coalesce(n, 0))."""
    from go_light_rag_ray.stages.relational import unpivot

    return unpivot(_events_pivot(sf_dir), "user_id",
                   [f"n_{t}" for t in _EVENT_TYPES],
                   var_col="event_type", val_col="n",
                   var_names=_EVENT_TYPES)


def q_pricing_rollup(sf_dir: str) -> ray.data.Dataset:
    """GROUP BY ROLLUP over lineitem (stages/relational.pricing_rollup):
    the OLAP subtotal ladder from ONE fact scan — finest-grain partials
    materialized once (#batches × 6 rows), each coarser grouping set
    re-aggregates the partials, never the fact table."""
    from go_light_rag_ray.stages.relational import pricing_rollup

    return pricing_rollup(ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_returnflag", "l_linestatus", "l_quantity",
                 "l_extendedprice", "l_discount"]))


def q_pricing_cube(sf_dir: str) -> ray.data.Dataset:
    """GROUP BY CUBE over lineitem — the full 2^d grouping-set lattice
    from the same ONE fact scan as the rollup (each grouping set
    re-aggregates the tiny materialized partials, never the facts)."""
    from go_light_rag_ray.stages.relational import pricing_rollup

    return pricing_rollup(ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_returnflag", "l_linestatus", "l_quantity",
                 "l_extendedprice", "l_discount"]), cube=True)


def q_top_revenue_orders(sf_dir: str) -> ray.data.Dataset:
    """TPC-H Q3 shape (stages/relational.top_revenue_orders): the full
    relational plan — segment filter → semi-join → date-pruned lineitem
    revenue combiner → bounded-bucket shuffle join → keyed sum → global
    top-k with a deterministic tie-break.  Revenue stays the integer
    product price_cents × (100 − disc_hundredths); bit-exact."""
    from go_light_rag_ray.stages.relational import top_revenue_orders

    return top_revenue_orders(
        ray.data.read_parquet(f"{sf_dir}/customer.parquet",
                              columns=["c_custkey", "c_mktsegment"]),
        ray.data.read_parquet(f"{sf_dir}/orders.parquet",
                              columns=["o_orderkey", "o_custkey",
                                       "o_orderdate"]),
        ray.data.read_parquet(f"{sf_dir}/lineitem.parquet",
                              columns=["l_orderkey", "l_shipdate",
                                       "l_extendedprice", "l_discount"]))


def q_revenue_by_nation(sf_dir: str) -> ray.data.Dataset:
    """Two chained BROADCAST joins (orders→customer→nation, dimensions via
    ray.put + index_in probe — the fact table never shuffles) feeding the
    partial-agg groupby (stages/relational.revenue_by_nation)."""
    import pyarrow.parquet as pq

    from go_light_rag_ray.stages.relational import revenue_by_nation

    return revenue_by_nation(
        ray.data.read_parquet(f"{sf_dir}/orders.parquet",
                              columns=["o_custkey", "o_totalprice"]),
        pq.read_table(f"{sf_dir}/customer.parquet",
                      columns=["c_custkey", "c_nationkey"]),
        pq.read_table(f"{sf_dir}/nation.parquet",
                      columns=["n_nationkey", "n_name"]),
    )


def q_join_order_lineitem(sf_dir: str) -> ray.data.Dataset:
    """Big-big shuffle join (stages/relational.shuffle_join): lineitem ⋈
    orders on orderkey — neither side broadcastable at 100 TB, so ONE
    co-partitioning shuffle into a bounded bucket count, then a vectorized
    Acero hash join per bucket.  Discounted price is computed pre-join on
    the pruned lineitem read and carried as an integer product."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from go_light_rag_ray.stages.relational import _cents, shuffle_join

    def prep(b: pa.Table) -> pa.Table:
        price_c = _cents(b.column("l_extendedprice"))
        disc_h = _cents(b.column("l_discount"))
        return pa.table({
            "l_orderkey": b.column("l_orderkey"),
            "l_linenumber": pc.cast(b.column("l_linenumber"), pa.int64()),
            "disc_c2": pa.array(price_c * (100 - disc_h), pa.int64()),
        })

    lineitem = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_linenumber", "l_extendedprice",
                 "l_discount"]).map_batches(prep, batch_format="pyarrow")
    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_orderpriority"])
    return shuffle_join(lineitem, orders, "l_orderkey", "o_orderkey",
                        ["l_linenumber", "disc_c2"], ["o_orderpriority"])


def q_join_order_lineitem_salted(sf_dir: str) -> ray.data.Dataset:
    """The whale-key twin of join_order_lineitem: salt=4 splits each
    bucket 4 ways on the lineitem side and replicates the orders side into
    every sub-bucket — identical output row set (same oracle), S× smaller
    worst-case bucket.  Opt-in skew armor, like sessions_salted."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from go_light_rag_ray.stages.relational import _cents, shuffle_join

    def prep(b: pa.Table) -> pa.Table:
        price_c = _cents(b.column("l_extendedprice"))
        disc_h = _cents(b.column("l_discount"))
        return pa.table({
            "l_orderkey": b.column("l_orderkey"),
            "l_linenumber": pc.cast(b.column("l_linenumber"), pa.int64()),
            "disc_c2": pa.array(price_c * (100 - disc_h), pa.int64()),
        })

    lineitem = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_linenumber", "l_extendedprice",
                 "l_discount"]).map_batches(prep, batch_format="pyarrow")
    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_orderpriority"])
    return shuffle_join(lineitem, orders, "l_orderkey", "o_orderkey",
                        ["l_linenumber", "disc_c2"], ["o_orderpriority"],
                        salt=4)


def _orders_big_line(sf_dir: str, anti: bool) -> ray.data.Dataset:
    import pyarrow as pa

    from go_light_rag_ray.stages.relational import (_cents,
                                                    shuffle_semi_join)

    def prep(b: pa.Table) -> pa.Table:
        return pa.table({
            "o_orderkey": b.column("o_orderkey"),
            "o_orderpriority": b.column("o_orderpriority"),
            "total_cents": pa.array(_cents(b.column("o_totalprice")),
                                    pa.int64()),
        })

    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_orderpriority", "o_totalprice"]
    ).map_batches(prep, batch_format="pyarrow")
    big_lines = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_quantity"]).filter(
        expr="l_quantity >= 45").select_columns(["l_orderkey"])
    return shuffle_semi_join(orders, big_lines, "o_orderkey", "l_orderkey",
                             anti=anti)


def q_orders_with_big_line(sf_dir: str) -> ray.data.Dataset:
    """Distributed semi-join (stages/relational.shuffle_semi_join): orders
    having ≥1 lineitem with quantity ≥ 45.  The key side is too big to
    broadcast at scale, so it ships per-batch-deduped keys through the
    same bucketed co-shuffle as the join; probe rows pass row-for-row."""
    return _orders_big_line(sf_dir, anti=False)


def q_orders_no_big_line(sf_dir: str) -> ray.data.Dataset:
    """The anti-join twin: orders with NO quantity ≥ 45 lineitem (SQL
    NOT EXISTS) — same shuffle, inverted per-bucket membership mask."""
    return _orders_big_line(sf_dir, anti=True)


def q_ann_radius(sf_dir: str) -> ray.data.Dataset:
    """Vector search with the reference's cosine radius filter
    (milvus.go:31 RangeFilter): only neighbors with cos ≥ 0.2 rank."""
    from go_light_rag_ray.stages.similarity import ann_topk

    return ann_topk(_raw_embeddings(sf_dir), n_queries=8, k=5, min_sim=0.2)


def q_scrub(sf_dir: str) -> ray.data.Dataset:
    """Policy scrubbing over the corpus: denylist terms masked, PII shapes
    (email-like, long digit runs) redacted, per-doc replacement counts."""
    from go_light_rag_ray.stages.scrub import scrub_text

    return scrub_text(_raw_docs(sf_dir), denylist=["customer", "merge"])


def q_decontam(sf_dir: str) -> ray.data.Dataset:
    """Benchmark decontamination: docs sharing ≥1 3-shingle with the
    "benchmark" slice (doc_id < 20) are flagged with exact overlap stats.
    Broadcast small side + is_in probe — never a corpus shuffle."""
    from go_light_rag_ray.stages.decontam import decontaminate

    corpus = _raw_docs(sf_dir)
    eval_docs = corpus.filter(expr="doc_id < 20")
    return decontaminate(corpus, eval_docs, shingle_k=3, min_matches=1)


def q_decontam_bloom(sf_dir: str) -> ray.data.Dataset:
    """Bloom-filter decontamination twin: the broadcast side is a fixed
    128 KiB bit array instead of the shingle set; matches may include
    deterministic Bloom false positives (the SQL oracle rebuilds the
    same bit positions, so the comparison is still bit-exact)."""
    from go_light_rag_ray.stages.decontam import decontaminate_bloom

    corpus = _raw_docs(sf_dir)
    eval_docs = corpus.filter(expr="doc_id < 20")
    return decontaminate_bloom(corpus, eval_docs, shingle_k=3,
                               min_matches=1)


def q_decontam_multi(sf_dir: str) -> ray.data.Dataset:
    """Decontamination MATRIX: three disjoint benchmark slices checked in
    ONE corpus scan via the shingle→suite-bitmask broadcast
    (stages/decontam.decontaminate_multi) — D suites for the tokenize +
    probe cost of one."""
    from go_light_rag_ray.stages.decontam import decontaminate_multi

    corpus = _raw_docs(sf_dir)
    suites = {
        "suite_a": corpus.filter(expr="doc_id < 20"),
        "suite_b": corpus.filter(expr="doc_id >= 20").filter(
            expr="doc_id < 40"),
        "suite_c": corpus.filter(expr="doc_id >= 40").filter(
            expr="doc_id < 60"),
    }
    return decontaminate_multi(corpus, suites, shingle_k=3, min_matches=1)


def q_text_unigram(sf_dir: str) -> ray.data.Dataset:
    """Corpus-trained unigram LM scoring: train (one small shuffle) →
    broadcast model → vectorized per-doc scoring.  The LM-quality member
    of the text-analysis family; integer-derived ratio → bit-exact SQL."""
    from go_light_rag_ray.stages.lm import unigram_score

    return unigram_score(_raw_docs(sf_dir))


def q_importance_weights(sf_dir: str) -> ray.data.Dataset:
    """DSIR-style importance weighting: unigram models trained on a
    deterministic md5-bucket target slice and on the full corpus, both
    broadcast, every doc scored with integer frequency sums + the
    tie-stable 6-dp ratio (stages/lm.importance_weights)."""
    from go_light_rag_ray.stages.lm import importance_weights

    return importance_weights(_raw_docs(sf_dir))


def q_embed_quantize(sf_dir: str) -> ray.data.Dataset:
    """Symmetric int8 embedding quantization (FAISS/Milvus SQ8 shape):
    per-vector scale, integer-exact code summary (stages/quantize.py);
    the list<int8> codes ride along for sinks and drop from the oracle
    view."""
    from go_light_rag_ray.stages.quantize import quantize_embeddings

    return quantize_embeddings(_raw_embeddings(sf_dir)).drop_columns(["q"])


def q_embed_pq_codes(sf_dir: str) -> ray.data.Dataset:
    """Product-quantization codes (4 subspaces × 8 seed centroids over the
    64-dim embeddings): integer argmin over micro-quantized subspace
    distances — 64× compression, bit-stable (stages/quantize.pq_codes)."""
    from go_light_rag_ray.stages.quantize import pq_codes

    return pq_codes(_raw_embeddings(sf_dir), n_subspaces=4, n_centroids=8)


def q_ann_topk_pq(sf_dir: str) -> ray.data.Dataset:
    """ADC approximate top-5 for query = embedding row 0: integer sums of
    squared micro-distance LUT entries over PQ codes — the scan never
    touches the original vectors (stages/quantize.pq_ann_topk)."""
    from go_light_rag_ray.stages.quantize import pq_ann_topk

    return pq_ann_topk(_raw_embeddings(sf_dir), n_subspaces=4,
                       n_centroids=8, k=5)


def q_ann_topk_pq_multi(sf_dir: str) -> ray.data.Dataset:
    """Multi-query ADC (quantize.pq_ann_topk n_queries=4): broadcast
    per-query LUTs share one per-batch encode; each batch resolves every
    query's tie-safe top-k in one lexsort keyed (query, adist, id)."""
    from go_light_rag_ray.stages.quantize import pq_ann_topk

    return pq_ann_topk(_raw_embeddings(sf_dir), n_subspaces=4,
                       n_centroids=8, k=5, n_queries=4)


def q_top_docs_per_lang(sf_dir: str) -> ray.data.Dataset:
    """Per-language top-3 documents by quality score — the per-domain
    selection step of a curation recipe, via the segment-limit operator
    (stages/sortagg.sorted_topk; quality carried with its lang label so no
    join is needed)."""
    from go_light_rag_ray.stages.sortagg import sorted_topk
    from go_light_rag_ray.stages.textstats import quality_scores

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "lang", "text"])
    scored = quality_scores(docs, carry=("lang",)).select_columns(
        ["lang", "doc_id", "quality"])
    return sorted_topk(scored, ["lang"], ["quality", "doc_id"], k=3,
                       descending=[True, False], rank_name="lang_rank")


def q_langid_confusion(sf_dir: str) -> ray.data.Dataset:
    """Language-ID confusion counts vs the labeled lang column — the
    classifier-evaluation view of the langid heuristic (label carried
    through the scorer, one tiny (lang, pred) shuffle)."""
    import ray.data.aggregate as agg

    from go_light_rag_ray.stages.textstats import language_id

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "lang", "text"])
    pred = language_id(docs, carry=("lang",))

    def ones(b: pa.Table) -> pa.Table:
        import numpy as np
        return pa.table({
            "lang": b.column("lang"), "lang_pred": b.column("lang_pred"),
            "_one": pa.array(np.ones(len(b), dtype=np.int64))})

    return (pred.map_batches(ones, batch_format="pyarrow")
            .groupby(["lang", "lang_pred"])
            .aggregate(agg.Sum("_one", alias_name="n")))


def q_mix_corpora(sf_dir: str) -> ray.data.Dataset:
    """Deterministic weighted corpus interleave over the source column
    (stages/sampling.mix_corpora): weight = (source index % 3) + 1, exact
    integer slot priorities, bit-exact vs the SQL window oracle."""
    from go_light_rag_ray.stages.sampling import mix_corpora

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "source"])
    srcs = [r["source"] for r in docs.groupby("source").count().take_all()]
    weights = {s: (int(s[3:]) % 3) + 1 for s in srcs}
    return mix_corpora(docs, weights)


def q_quality_buckets(sf_dir: str) -> ray.data.Dataset:
    """CCNet-style head/middle/tail corpus split: rank every document by
    its unigram-LM score and cut the rank range into 3 equal-population
    buckets (Wenzek et al. 2020).  One global sort + the exact distributed
    prefix-sum scan (stages/packing.rank_buckets) — all-integer bucket
    arithmetic, bit-exact vs the SQL window oracle."""
    from go_light_rag_ray.stages.lm import unigram_score
    from go_light_rag_ray.stages.packing import rank_buckets

    scored = unigram_score(_raw_docs(sf_dir)).select_columns(
        ["doc_id", "mean_token_freq"])
    return rank_buckets(scored, "mean_token_freq", n_buckets=3)


def q_text_bigram(sf_dir: str) -> ray.data.Dataset:
    """Corpus-trained bigram LM scoring — same train → broadcast →
    vectorized-score shape as text_unigram, over adjacent word pairs."""
    from go_light_rag_ray.stages.lm import bigram_score

    return bigram_score(_raw_docs(sf_dir))


def q_corpus_top_words(sf_dir: str) -> ray.data.Dataset:
    """Global top-20 corpus words: combiner partials → vocabulary-sized
    shuffle → tiny sort+limit.  The exact twin of the Misra-Gries sketch
    path (stages/heavyhitters.py)."""
    from go_light_rag_ray.stages.heavyhitters import corpus_top_words

    return corpus_top_words(_raw_docs(sf_dir), k=20)


def q_bpe_pair_counts(sf_dir: str) -> ray.data.Dataset:
    """Top-20 adjacent byte pairs within whitespace words — BPE training's
    merge-0 candidate list (stages/bpetrain.byte_pair_counts), computed
    zero-copy off the Arrow string buffers.  The distributed half of
    ``train_bpe`` (word-freq table → driver merge loop, the HF/sentencepiece
    training split)."""
    from go_light_rag_ray.stages.bpetrain import byte_pair_counts

    return byte_pair_counts(_raw_docs(sf_dir), k=20)


def q_words_cms(sf_dir: str) -> ray.data.Dataset:
    """Count-Min sketch cells over the corpus word stream — the mergeable
    frequency-estimate companion to the Misra-Gries heavy-hitter sketch
    (stages/heavyhitters.cms_cells); bounded per-batch emission, one
    cell-keyed groupby-sum, all-integer."""
    from go_light_rag_ray.stages.heavyhitters import cms_cells

    return cms_cells(_raw_docs(sf_dir))


def q_text_repetition(sf_dir: str) -> ray.data.Dataset:
    """Gopher-style per-doc repetition signals (dup/top word and bigram
    fractions) — the within-document member of the quality family.
    Stateless narrow map, fuses with the read."""
    from go_light_rag_ray.stages.repetition import repetition_signals

    return repetition_signals(_raw_docs(sf_dir))


def q_stratified_sample(sf_dir: str) -> ray.data.Dataset:
    """Deterministic 10-per-language sample: md5-ranked per-group head via
    the segment-limit operator (one sort, no per-group Python)."""
    from go_light_rag_ray.stages.sampling import stratified_sample

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "lang"])
    out = stratified_sample(docs, group_col="lang", n_per_group=10)
    return out.select_columns(["doc_id", "lang", "sample_rank"])


def q_event_quantiles(sf_dir: str) -> ray.data.Dataset:
    """Exact per-event-type value quantiles (p25/p50/p75/p90): one keyed
    shuffle, vectorized sort+pick per group, picked-element semantics so
    floats match the SQL oracle bit-exactly."""
    from go_light_rag_ray.stages.quantiles import group_quantiles

    events = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_type", "value"])
    return group_quantiles(events, key_col="event_type", value_col="value")


def q_dedup_spans(sf_dir: str) -> ray.data.Dataset:
    """Sub-document exact dedup (Lee et al. 2021): maximal duplicated
    8-gram token spans per document — positional k-grams → segment-counted
    duplicated occurrences → per-doc interval union."""
    from go_light_rag_ray.stages.spandedup import duplicate_spans

    return duplicate_spans(_raw_docs(sf_dir), k=8)


def q_winnow_fp(sf_dir: str) -> ray.data.Dataset:
    """Winnowing document fingerprints (MOSS, Schleimer et al. 2003):
    rightmost-min md5 per sliding window of 4 consecutive 4-gram hashes —
    the ~2/(w+1)-rate local sampling for span-level near-dup detection
    (stages/spandedup.winnow_fingerprints; shuffle-free)."""
    from go_light_rag_ray.stages.spandedup import winnow_fingerprints

    return winnow_fingerprints(_raw_docs(sf_dir), k=4, w=4)


def q_dedup_clusters_dist(sf_dir: str) -> ray.data.Dataset:
    """The distributed min-label-propagation clustering path (forced via
    max_driver_pairs=0) — value-oracled against the same recursive-CTE
    connected-components SQL as the driver union-find path."""
    from go_light_rag_ray.stages.dedup import cluster_duplicates, minhash_lsh_pairs

    docs = _raw_docs(sf_dir)
    pairs = minhash_lsh_pairs(docs, num_perm=16, bands=4, shingle_k=3, max_group=0)
    return cluster_duplicates(docs, pairs, max_driver_pairs=0)


def q_entity_ann(sf_dir: str) -> ray.data.Dataset:
    """Entity vector search over the canonical graph (reference J7 entity
    collection).  Rows-only check (hash-projection vectors not SQL)."""
    from go_light_rag_ray.pipelines.query import entity_similarity

    return entity_similarity(_graph(sf_dir), dims=32, k=3)


def q_span_check(sf_dir: str) -> ray.data.Dataset:
    """Span-sequence invariant (input_hint per-row invariant): fingerprint
    each document's engine-materialized span sequence (kind, text,
    media_ref, order); the oracle derives the same fingerprint from the raw
    table independently — a value mismatch means a stage mutated spans."""
    import hashlib

    from go_light_rag_ray.sources.io import flat_documents_as_interleaved

    docs = _raw_docs(sf_dir).map_batches(
        flat_documents_as_interleaved, batch_format="pyarrow"
    )

    def fingerprint(b: pa.Table) -> pa.Table:
        doc_ids = b.column("doc_id").to_pylist()
        spans = b.column("spans").to_pylist()
        fps, counts = [], []
        for row in spans:
            parts = [
                f"{s['kind']}\x01{s['text']}\x01{s['media_ref']}\x01{i}"
                for i, s in enumerate(row)
            ]
            fps.append(hashlib.md5("\x02".join(parts).encode()).hexdigest())
            counts.append(len(row))
        return pa.Table.from_pydict(
            {"doc_id": pa.array(doc_ids, pa.string()),
             "n_spans": pa.array(counts, pa.int64()),
             "span_fp": pa.array(fps, pa.string())}
        )

    return docs.map_batches(fingerprint, batch_format="pyarrow")


def q_chunks_by_handler(sf_dir: str) -> ray.data.Dataset:
    """Mixed-corpus chunking with per-row handler dispatch (reference S3
    router + markdown/code handlers).  doc_kind derived deterministically
    from doc_id.  Rows-only check (chunker internals are not SQL)."""
    from go_light_rag_ray.stages.chunker import ChunkerConfig
    from go_light_rag_ray.stages.handlers import HandlerChunker

    kinds = pa.array(["default", "markdown", "code"], pa.string())

    def add_kind(b: pa.Table) -> pa.Table:
        import numpy as np

        idx = pa.array(
            b.column("doc_id").combine_chunks().to_numpy() % 3, pa.int64()
        )
        return b.append_column("doc_kind", pc.take(kinds, idx))

    docs = _raw_docs(sf_dir).map_batches(add_kind, batch_format="pyarrow")
    cfg = ChunkerConfig(max_tokens=32, overlap_tokens=4, tokenizer="regex",
                        content_mode="text", doc_id_format="doc-{:09d}")
    return docs.map_batches(
        HandlerChunker,
        fn_constructor_kwargs={"config": cfg},
        batch_format="pyarrow",
        concurrency=(1, 4),
    )


def q_chunks_router_default(sf_dir: str) -> ray.data.Dataset:
    """Value-oracled view of the handler router (reference S3): the SAME
    mixed-kind routed chunking as ``chunks_by_handler`` (whitespace
    tokenizer so the window math is SQL), with the output filtered to the
    default-handler slice (doc_id % 3 == 0) — the one router branch whose
    chunker IS SQL-expressible.  The router dispatch itself runs over the
    full mixed corpus, so a routing bug (wrong kind → wrong chunker)
    changes this result and fails the hash."""
    import numpy as np

    from go_light_rag_ray.stages.chunker import ChunkerConfig
    from go_light_rag_ray.stages.handlers import HandlerChunker

    kinds = pa.array(["default", "markdown", "code"], pa.string())

    def add_kind(b: pa.Table) -> pa.Table:
        idx = pa.array(
            b.column("doc_id").combine_chunks().to_numpy() % 3, pa.int64()
        )
        return b.append_column("doc_kind", pc.take(kinds, idx))

    docs = _raw_docs(sf_dir).map_batches(add_kind, batch_format="pyarrow")
    cfg = ChunkerConfig(max_tokens=32, overlap_tokens=4,
                        tokenizer="whitespace", content_mode="text",
                        doc_id_format="doc-{:09d}")
    chunks = docs.map_batches(
        HandlerChunker,
        fn_constructor_kwargs={"config": cfg},
        batch_format="pyarrow",
        concurrency=(1, 4),
    )

    def keep_default(b: pa.Table) -> pa.Table:
        nums = pc.cast(
            pc.utf8_slice_codeunits(
                pc.cast(b.column("doc_id"), pa.string()), 4, 13),
            pa.int64()).to_numpy(zero_copy_only=False)
        return b.take(pa.array(np.flatnonzero(nums % 3 == 0), pa.int64()))

    return chunks.map_batches(keep_default, batch_format="pyarrow")


def q_chunk_embeddings(sf_dir: str) -> ray.data.Dataset:
    """Chunk → embedding-encoder actor pool (reference T5/S8).  Rows-only
    check (hash-projection vectors are not SQL)."""
    from go_light_rag_ray.stages.encode import encode_chunks

    chunks = chunk_documents(_docs(sf_dir), _oracle_handler())
    return encode_chunks(chunks.select_columns(["chunk_id", "content"]), dims=32)


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

# the default-handler slice of the routed mixed-corpus chunking
# (q_chunks_router_default): window 32 / stride 28 over \S+ tokens of
# doc_id % 3 == 0 docs — identical math to _CHUNKS_SQL at the router's
# chunk sizes
_CHUNKS_ROUTER_DEFAULT_SQL = r"""
WITH docs AS (
  SELECT printf('doc-%09d', doc_id) AS did,
         regexp_extract_all(text, '\S+') AS toks
  FROM documents WHERE doc_id % 3 = 0
),
wins AS (
  SELECT did, toks, unnest(range(0, len(toks), 28)) AS st FROM docs
)
SELECT did || '-chunk-' || (st // 28)::varchar AS chunk_id,
       did AS doc_id,
       (st // 28)::INTEGER AS order_index,
       array_to_string(toks[st+1 : st+32], ' ') AS content,
       least(32, len(toks) - st)::INTEGER AS token_size
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


# ---------------------------------------------------------------------------
# oracle SQL for the training-data operators (DuckDB replicates the md5-based
# algorithms of stages/dedup.py, textstats.py, similarity.py, multimodal.py
# bit-for-bit; see those modules for the scheme docs)
# ---------------------------------------------------------------------------

# duplicate-span oracle: positional 8-grams (no short-doc fallback),
# duplicated = ≥2 occurrences corpus-wide, covered positions merged by
# gaps-and-islands; integer-only → bit-exact
_DEDUP_SPANS_SQL = r"""
WITH toks AS (
  SELECT doc_id, regexp_extract_all(text, '\S+') AS t FROM documents
),
grams AS (
  SELECT doc_id, i AS pos, array_to_string(t[i+1 : i+8], ' ') AS g
  FROM toks, unnest(range(0, greatest(len(t) - 7, 0))) AS u(i)
),
dup AS (SELECT g FROM grams GROUP BY g HAVING count(*) >= 2),
hits AS (SELECT doc_id, pos FROM grams WHERE g IN (SELECT g FROM dup)),
cov AS (
  SELECT DISTINCT doc_id, pos + j AS p
  FROM hits, unnest(range(0, 8)) AS v(j)
),
isl AS (
  SELECT doc_id, p,
         p - row_number() OVER (PARTITION BY doc_id ORDER BY p) AS grp
  FROM cov
)
SELECT doc_id, min(p)::BIGINT AS span_start, max(p)::BIGINT AS span_end,
       count(*)::BIGINT AS span_len
FROM isl GROUP BY doc_id, grp
"""

# winnowing (k=4, w=4): min md5-hex per full window, rightmost tie-break
# (max pos among rows attaining the window min), distinct selections.
# Hex-string min == 128-bit numeric min, so the SELECTION itself is
# oracle-exact, not just the output hashes.
_WINNOW_FP_SQL = r"""
WITH toks AS (
  SELECT doc_id, regexp_extract_all(text, '\S+') AS t FROM documents
),
grams AS (
  SELECT doc_id, i AS pos, md5(array_to_string(t[i+1 : i+4], ' ')) AS h
  FROM toks, unnest(range(0, greatest(len(t) - 3, 0))) AS u(i)
),
gcnt AS (SELECT doc_id, count(*) AS n FROM grams GROUP BY doc_id),
wins AS (
  SELECT g0.doc_id, g0.pos AS wpos, min(g.h) AS mh
  FROM grams g0
  JOIN gcnt c ON c.doc_id = g0.doc_id
  JOIN grams g ON g.doc_id = g0.doc_id AND g.pos BETWEEN g0.pos AND g0.pos + 3
  WHERE g0.pos <= c.n - 4
  GROUP BY g0.doc_id, g0.pos
),
sel AS (
  SELECT w.doc_id, max(g.pos) AS pos, w.mh AS gh
  FROM wins w
  JOIN grams g ON g.doc_id = w.doc_id AND g.pos BETWEEN w.wpos AND w.wpos + 3
             AND g.h = w.mh
  GROUP BY w.doc_id, w.wpos, w.mh
)
SELECT DISTINCT doc_id, pos::BIGINT AS pos, gh FROM sel
"""

_DEDUP_EXACT_SQL = r"""
SELECT md5(text) AS text_hash,
       min(doc_id) AS canonical_doc_id,
       count(*) AS dup_count
FROM documents GROUP BY md5(text)
"""

# shared shingle CTE: distinct k-word shingles per doc (k = 3); docs with no
# tokens produce no shingles (MinHasher skips them)
_SHINGLES_CTE = r"""
WITH toks AS (
  SELECT doc_id, regexp_extract_all(text, '\S+') AS t FROM documents
),
shingles AS (
  SELECT DISTINCT doc_id, s FROM (
    SELECT doc_id,
           CASE WHEN len(t) >= 3
                THEN array_to_string(t[i+1 : i+3], ' ')
                ELSE array_to_string(t, ' ') END AS s
    FROM toks, unnest(CASE WHEN len(t) >= 3
                           THEN range(0, len(t) - 2)
                           ELSE range(0, CASE WHEN len(t) > 0 THEN 1 ELSE 0 END)
                      END) AS u(i)
  )
)
"""

# universal-hash minhash (stages/dedup.py MINHASH_A/B over P = 2^31-1):
# base hash = 60-bit md5 prefix mod P, perm_i = (A_i*h + B_i) mod P
_DEDUP_MINHASH_SQL = _SHINGLES_CTE + """
, perms(i, pa, pb) AS (VALUES (0, 1103515245, 12345), (1, 1299709, 54321), (2, 15485863, 98765), (3, 32452843, 13579), (4, 49979687, 24680), (5, 67867967, 11111), (6, 86028121, 22222), (7, 104395301, 33333), (8, 122949823, 44444), (9, 141650939, 55555), (10, 160481183, 66666), (11, 179424673, 77777), (12, 198491317, 88888), (13, 217645177, 99999), (14, 236887691, 10101), (15, 256203161, 20202)),
base AS (
  SELECT doc_id,
         ('0x' || substr(md5(s), 1, 15))::BIGINT % 2147483647 AS h
  FROM shingles
),
sig AS (
  SELECT doc_id, p.i,
         min((p.pa * base.h + p.pb) % 2147483647) AS h
  FROM base CROSS JOIN perms p
  GROUP BY doc_id, p.i
),
bands AS (
  SELECT doc_id,
         md5((i // 4)::VARCHAR || '|' || string_agg(h::VARCHAR, '|' ORDER BY i)) AS bucket
  FROM sig GROUP BY doc_id, i // 4
)
SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
FROM bands x JOIN bands y ON x.bucket = y.bucket AND x.doc_id < y.doc_id
"""

_DEDUP_CLUSTERS_SQL = _DEDUP_MINHASH_SQL.replace(
    "SELECT DISTINCT x.doc_id AS a, y.doc_id AS b",
    ", cand AS (SELECT DISTINCT x.doc_id AS a, y.doc_id AS b",
).replace(
    "ON x.bucket = y.bucket AND x.doc_id < y.doc_id",
    """ON x.bucket = y.bucket AND x.doc_id < y.doc_id),
edges2 AS (
  SELECT a AS s, b AS d FROM cand UNION ALL SELECT b, a FROM cand
),
reach AS (
  -- undirected reachability closure (pair graph is tiny at oracle scale)
  WITH RECURSIVE r(src, dst) AS (
    SELECT doc_id, doc_id FROM documents
    UNION
    SELECT r.src, e.d FROM r JOIN edges2 e ON r.dst = e.s
  )
  SELECT * FROM r
)
SELECT src AS doc_id, min(dst) AS cluster_id FROM reach GROUP BY src""",
)

_DEDUP_SIMHASH_SQL = r"""
WITH words AS (
  SELECT doc_id, w, count(*) AS c FROM (
    SELECT doc_id, unnest(regexp_extract_all(text, '\S+')) AS w FROM documents
  ) GROUP BY doc_id, w
),
votes AS (
  SELECT doc_id, b,
         sum(CASE WHEN (('0x' || substr(md5(w), 1, 4))::BIGINT >> b) & 1 = 1
                  THEN c ELSE -c END) AS v
  FROM words, unnest(range(0, 16)) AS bits(b)
  GROUP BY doc_id, b
)
SELECT doc_id,
       sum(CASE WHEN v > 0 THEN (1::BIGINT << b) ELSE 0 END)::BIGINT AS simhash
FROM votes GROUP BY doc_id
"""

_DEDUP_JACCARD_SQL = _SHINGLES_CTE + r"""
, sized AS (
  SELECT s.doc_id, md5(s.s) AS sh, n.n
  FROM shingles s
  JOIN (SELECT doc_id, count(*) AS n FROM shingles GROUP BY doc_id) n
    ON s.doc_id = n.doc_id
),
pairs AS (
  SELECT x.doc_id AS a, y.doc_id AS b, x.n AS na, y.n AS nb,
         count(*) AS common
  FROM sized x JOIN sized y ON x.sh = y.sh AND x.doc_id < y.doc_id
  GROUP BY x.doc_id, y.doc_id, x.n, y.n
)
SELECT a, b, common::DOUBLE / (na + nb - common)::DOUBLE AS jaccard
FROM pairs WHERE common::DOUBLE / (na + nb - common)::DOUBLE >= 0.3
"""

# sign-bit LSH bucket over the first 8 dims (1-based list index in DuckDB)
_EMB_BUCKET_EXPR = (
    "("
    + " + ".join(
        f"CASE WHEN embedding[{i + 1}] > 0 THEN {1 << i} ELSE 0 END"
        for i in range(8)
    )
    + ")"
)

_DEDUP_EMBEDDING_SQL = f"""
WITH buckets AS (
  SELECT vec_id, {_EMB_BUCKET_EXPR} AS bucket, embedding FROM embeddings
)
SELECT x.vec_id AS a, y.vec_id AS b,
       round(list_cosine_similarity(x.embedding::DOUBLE[],
                                    y.embedding::DOUBLE[]), 6) AS cos_sim
FROM buckets x JOIN buckets y
  ON x.bucket = y.bucket AND x.vec_id < y.vec_id
WHERE round(list_cosine_similarity(x.embedding::DOUBLE[],
                                   y.embedding::DOUBLE[]), 6) >= 0.3
"""

_TEXT_STATS_SQL = r"""
SELECT doc_id,
       len(regexp_extract_all(text, '\S+')) AS n_tokens,
       len(regexp_extract_all(text, '[A-Za-z0-9]+|[^A-Za-z0-9\s]')) AS n_bpe_tokens,
       length(text) AS n_chars
FROM documents
"""

_STOPWORD_LIST = "('the','a','of','and','to','in','is')"

_TEXT_QUALITY_SQL = rf"""
WITH t AS (
  SELECT doc_id, regexp_extract_all(text, '\S+') AS toks FROM documents
),
m AS (
  SELECT doc_id, len(toks) AS n,
         len(list_distinct(toks)) AS n_distinct,
         len(list_filter(toks, w -> w IN {_STOPWORD_LIST})) AS n_stop,
         list_sum(list_transform(toks, w -> length(w))) AS total_len
  FROM t
)
SELECT doc_id,
       CASE WHEN n = 0 THEN 0.0 ELSE n_distinct::DOUBLE / n::DOUBLE END AS distinct_ratio,
       CASE WHEN n = 0 THEN 0.0 ELSE n_stop::DOUBLE / n::DOUBLE END AS stopword_ratio,
       CASE WHEN n = 0 THEN 0.0 ELSE total_len::DOUBLE / n::DOUBLE END AS mean_word_len,
       CASE WHEN n = 0 THEN 0.0
            ELSE (n_distinct::DOUBLE / n::DOUBLE)
                 * (1 - n_stop::DOUBLE / n::DOUBLE) END AS quality
FROM m
"""

# keep-best composition: clusters CTE = the dedup_clusters oracle, quality
# CTE = the text_quality oracle; selection = row_number over (quality DESC,
# doc_id) — quality doubles are bit-identical on both sides (the
# text_quality oracle proves it), so the DESC comparisons agree exactly
_DEDUP_KEEP_BEST_SQL = f"""
WITH clusters AS ({_DEDUP_CLUSTERS_SQL}),
q AS ({_TEXT_QUALITY_SQL}),
j AS (SELECT c.cluster_id, c.doc_id, q.quality
      FROM clusters c JOIN q ON c.doc_id = q.doc_id),
ranked AS (
  SELECT cluster_id, doc_id, quality,
         row_number() OVER (PARTITION BY cluster_id
                            ORDER BY quality DESC, doc_id) AS rn,
         count(*) OVER (PARTITION BY cluster_id) AS n_members
  FROM j)
SELECT cluster_id, doc_id AS keep_doc_id, quality,
       n_members::BIGINT AS n_members
FROM ranked WHERE rn = 1
"""

# marker lists must match stages/textstats.py LANG_MARKERS
_TEXT_LANGID_SQL = r"""
WITH langs(lang, markers) AS (
  VALUES ('de', ['small','slow','big']),
         ('en', ['the','a','fast']),
         ('es', ['join','merge','sort']),
         ('fr', ['row','column','line'])
),
t AS (
  SELECT doc_id, regexp_extract_all(text, '\S+') AS toks FROM documents
),
scores AS (
  SELECT t.doc_id, l.lang,
         len(list_filter(t.toks, w -> list_contains(l.markers, w)))::DOUBLE
           / (CASE WHEN len(t.toks) = 0 THEN 1 ELSE len(t.toks) END)::DOUBLE AS s
  FROM t CROSS JOIN langs l
),
ranked AS (
  SELECT doc_id, lang, s,
         row_number() OVER (PARTITION BY doc_id ORDER BY s DESC, lang ASC) AS rn
  FROM scores
)
SELECT doc_id, lang AS lang_pred, s AS lang_score FROM ranked WHERE rn = 1
"""

_TEXT_FINGERPRINT_SQL = r"""
WITH t AS (
  SELECT doc_id, regexp_extract_all(text, '\S+') AS toks FROM documents
),
wins AS (
  SELECT doc_id,
         CASE WHEN len(toks) >= 4 THEN array_to_string(toks[i+1 : i+4], ' ')
              ELSE array_to_string(toks, ' ') END AS w
  FROM t, unnest(CASE WHEN len(toks) >= 4 THEN range(0, len(toks) - 3)
                      ELSE range(0, 1) END) AS u(i)
)
SELECT doc_id, min(md5(w)) AS fingerprint FROM wins GROUP BY doc_id
"""

_TEXT_TFIDF_SQL = r"""
WITH tf AS (
  SELECT doc_id, w AS word, count(*)::BIGINT AS tf FROM (
    SELECT doc_id, unnest(regexp_extract_all(text, '\S+')) AS w FROM documents
  ) GROUP BY doc_id, w
),
df AS (SELECT word, count(*)::BIGINT AS df FROM tf GROUP BY word),
scored AS (
  SELECT t.doc_id, t.word, t.tf, d.df,
         t.tf::DOUBLE / d.df::DOUBLE AS score
  FROM tf t JOIN df d USING (word)
),
ranked AS (
  SELECT *, row_number() OVER (
      PARTITION BY doc_id ORDER BY score DESC, word ASC
  )::INTEGER AS rank
  FROM scored
)
SELECT doc_id, rank, word, tf, df, score FROM ranked WHERE rank <= 3
"""

# mirrors stages/bm25.py bm25_topk(idf="rational"): every double is the
# same fixed-order rational of exact integers on both sides, and the
# per-(doc,term) contribution is floor-quantized to micro-units BEFORE the
# per-doc sum, so summation order never matters.
_BM25_CTES = r"""d AS (
  SELECT doc_id, len(regexp_extract_all(text, '\S+'))::BIGINT AS dl,
         regexp_extract_all(text, '\S+') AS toks
  FROM documents
),
c AS (SELECT count(*)::BIGINT AS n, sum(dl)::BIGINT AS sdl FROM d),
q(term) AS (VALUES ('merge'), ('dup'), ('scan')),
tf AS (
  SELECT d.doc_id, q.term,
         len(list_filter(d.toks, w -> w = q.term))::BIGINT AS tf, d.dl
  FROM d CROSS JOIN q
),
df AS (
  SELECT term, sum(CASE WHEN tf > 0 THEN 1 ELSE 0 END)::BIGINT AS df
  FROM tf GROUP BY term
),
contrib AS (
  SELECT t.doc_id,
         floor(((c.n::DOUBLE - f.df::DOUBLE + 0.5) / (f.df::DOUBLE + 0.5))
               * ((t.tf::DOUBLE * 2.5)
                  / (t.tf::DOUBLE + 1.5 * (0.25
                       + (0.75 * (t.dl::DOUBLE * c.n::DOUBLE))
                         / c.sdl::DOUBLE)))
               * 1000000 + 0.5)::BIGINT AS cmicro
  FROM tf t, df f, c
  WHERE t.term = f.term AND f.df > 0
),
s AS (
  SELECT doc_id, sum(cmicro)::BIGINT AS score_micro
  FROM contrib GROUP BY doc_id HAVING sum(cmicro) > 0
)"""

_TEXT_BM25_SQL = "WITH " + _BM25_CTES + r"""
SELECT row_number() OVER (ORDER BY score_micro DESC, doc_id ASC)::INTEGER AS rank,
       doc_id, score_micro
FROM s
ORDER BY rank
LIMIT 20
"""

# mirrors stages/bm25.py hybrid_doc_topk(idf="rational"): RRF over the two
# legs' RANKS only — integer contributions, so each leg's float story stays
# internal (BM25 micro-units; ANN's round-6 cosine already oracle-proven)
_HYBRID_TOPK_SQL = "WITH " + _BM25_CTES + r""",
bmr AS (
  SELECT doc_id,
         row_number() OVER (ORDER BY score_micro DESC, doc_id ASC) AS r
  FROM s
),
qv AS (SELECT embedding FROM embeddings WHERE vec_id = 0),
ann AS (
  SELECT e.vec_id AS doc_id,
         round(list_cosine_similarity(qv.embedding::DOUBLE[],
                                      e.embedding::DOUBLE[]), 6) AS cs
  FROM qv CROSS JOIN embeddings e WHERE e.vec_id <> 0
),
annr AS (
  SELECT doc_id, row_number() OVER (ORDER BY cs DESC, doc_id ASC) AS r
  FROM ann
),
fused AS (
  SELECT doc_id, 1000000 // (60 + r) AS c FROM bmr WHERE r <= 20
  UNION ALL
  SELECT doc_id, 1000000 // (60 + r) FROM annr WHERE r <= 20
)
SELECT row_number() OVER (ORDER BY rrf DESC, doc_id ASC)::INTEGER AS rank,
       doc_id, rrf::BIGINT AS rrf_score
FROM (SELECT doc_id, sum(c) AS rrf FROM fused GROUP BY doc_id)
ORDER BY rank
LIMIT 10
"""

# mirrors pipelines/curate.py: quality/lang filters then keep min doc_id
# per md5(text) among survivors
_CURATE_SQL = r"""
WITH t AS (
  SELECT doc_id, text, regexp_extract_all(text, '\S+') AS toks FROM documents
),
m AS (
  SELECT doc_id, text, len(toks) AS n,
         (len(list_distinct(toks))::DOUBLE / len(toks)::DOUBLE)
           * (1 - len(list_filter(toks, w -> w IN ('the','a','of','and','to','in','is')))::DOUBLE
                  / len(toks)::DOUBLE) AS quality,
         toks
  FROM t WHERE len(toks) > 0
),
langs(lang, markers) AS (
  VALUES ('de', ['small','slow','big']), ('en', ['the','a','fast']),
         ('es', ['join','merge','sort']), ('fr', ['row','column','line'])
),
lid AS (
  SELECT doc_id, lang AS lang_pred FROM (
    SELECT m.doc_id, l.lang,
           row_number() OVER (
             PARTITION BY m.doc_id
             ORDER BY len(list_filter(m.toks, w -> list_contains(l.markers, w)))::DOUBLE
                        / len(m.toks)::DOUBLE DESC, l.lang ASC) AS rn
    FROM m CROSS JOIN langs l
  ) WHERE rn = 1
),
surv AS (
  SELECT m.doc_id, m.n AS n_tokens, m.quality, lid.lang_pred, md5(m.text) AS h
  FROM m JOIN lid USING (doc_id)
  WHERE m.quality >= 0.5 AND lid.lang_pred = 'en'
),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY h ORDER BY doc_id ASC) AS rn
  FROM surv
)
SELECT doc_id, n_tokens, quality, lang_pred FROM ranked WHERE rn = 1
"""

_SPLIT_ASSIGN_SQL = """
SELECT doc_id,
       CASE WHEN ('0x' || substr(md5('split' || doc_id::VARCHAR), 1, 8))::BIGINT < 3435973836
              THEN 'train'
            WHEN ('0x' || substr(md5('split' || doc_id::VARCHAR), 1, 8))::BIGINT < 3865470566
              THEN 'val'
            ELSE 'test' END AS split
FROM documents
"""

# mirrors stages/diff.py corpus_diff over the two deterministic snapshot
# views in q_corpus_diff; text equality stands in for the md5 compare
_CORPUS_DIFF_SQL = r"""
WITH old AS (SELECT doc_id, text FROM documents WHERE doc_id % 11 != 3),
new AS (
  SELECT doc_id,
         CASE WHEN doc_id % 5 = 0 THEN text || ' v2' ELSE text END AS text
  FROM documents WHERE doc_id % 7 != 2
),
j AS (
  SELECT coalesce(o.doc_id, n.doc_id) AS doc_id, o.text AS ot, n.text AS nt
  FROM old o FULL OUTER JOIN new n ON o.doc_id = n.doc_id
)
SELECT doc_id,
       CASE WHEN ot IS NULL THEN 'added'
            WHEN nt IS NULL THEN 'removed'
            ELSE 'changed' END AS status
FROM j
WHERE ot IS NULL OR nt IS NULL OR ot <> nt
"""

_HASH_SAMPLE_SQL = """
SELECT doc_id FROM documents
WHERE ('0x' || substr(md5('sample' || doc_id::VARCHAR), 1, 8))::BIGINT < 1073741824
"""

_ANN_TOPK_SQL = r"""
WITH q AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 8),
scored AS (
  SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id,
         round(list_cosine_similarity(q.embedding::DOUBLE[],
                                      e.embedding::DOUBLE[]), 6) AS cos_sim
  FROM q CROSS JOIN embeddings e WHERE e.vec_id <> q.vec_id
),
ranked AS (
  SELECT *, row_number() OVER (
      PARTITION BY query_id ORDER BY cos_sim DESC, neighbor_id ASC
  )::INTEGER AS rank
  FROM scored
)
SELECT query_id, rank, neighbor_id, cos_sim FROM ranked WHERE rank <= 5
"""

_SCRUB_SQL = r"""
WITH t AS (
  SELECT doc_id, text AS src,
         replace(replace(text, 'customer', '<masked>'),
                 'merge', '<masked>') AS term_masked
  FROM documents
)
SELECT doc_id,
       regexp_replace(regexp_replace(term_masked,
           '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<email>', 'g'),
           '[0-9]{6,}', '<number>', 'g') AS text,
       ((length(src) - length(replace(src, 'customer', ''))) // 8
        + (length(src) - length(replace(src, 'merge', ''))) // 5
        + len(regexp_extract_all(term_masked,
              '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}'))
        + len(regexp_extract_all(
              regexp_replace(term_masked,
                  '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}',
                  '<email>', 'g'),
              '[0-9]{6,}')))::BIGINT
         AS n_masked
FROM t
"""

_DECONTAM_SQL = _SHINGLES_CTE + r"""
, eval_sh AS (SELECT DISTINCT s FROM shingles WHERE doc_id < 20),
stats AS (
  SELECT sh.doc_id,
         count(*) AS n_shingles,
         sum(CASE WHEN e.s IS NOT NULL THEN 1 ELSE 0 END)::BIGINT
           AS matched_shingles
  FROM shingles sh LEFT JOIN eval_sh e ON sh.s = e.s
  GROUP BY sh.doc_id
)
SELECT doc_id, n_shingles, matched_shingles,
       floor(matched_shingles::DOUBLE / n_shingles * 1000000 + 0.5) / 1000000
         AS contamination
FROM stats WHERE matched_shingles >= 1
"""

# the decontam matrix: three disjoint eval slices, one LEFT JOIN per
# suite over the same distinct-shingle stream; integer counts → bit-exact
_DECONTAM_MULTI_SQL = _SHINGLES_CTE + r"""
, e_a AS (SELECT DISTINCT s FROM shingles WHERE doc_id < 20),
e_b AS (SELECT DISTINCT s FROM shingles
        WHERE doc_id >= 20 AND doc_id < 40),
e_c AS (SELECT DISTINCT s FROM shingles
        WHERE doc_id >= 40 AND doc_id < 60),
stats AS (
  SELECT sh.doc_id,
         count(*)::BIGINT AS n_shingles,
         sum(CASE WHEN a.s IS NOT NULL THEN 1 ELSE 0 END)::BIGINT
           AS matched_suite_a,
         sum(CASE WHEN b.s IS NOT NULL THEN 1 ELSE 0 END)::BIGINT
           AS matched_suite_b,
         sum(CASE WHEN c.s IS NOT NULL THEN 1 ELSE 0 END)::BIGINT
           AS matched_suite_c
  FROM shingles sh
  LEFT JOIN e_a a ON sh.s = a.s
  LEFT JOIN e_b b ON sh.s = b.s
  LEFT JOIN e_c c ON sh.s = c.s
  GROUP BY sh.doc_id
)
SELECT doc_id, n_shingles, matched_suite_a, matched_suite_b,
       matched_suite_c
FROM stats
WHERE matched_suite_a >= 1 OR matched_suite_b >= 1 OR matched_suite_c >= 1
"""

# mirrors stages/decontam.py decontaminate_bloom: probe j of shingle s is
# bit ('0x' || substr(md5(s), 1+8j, 8))::BIGINT % 2^20; a shingle "matches"
# iff all 4 probe bits are set by some eval shingle.  False positives are
# part of the (deterministic) contract on both sides.
_DECONTAM_BLOOM_SQL = _SHINGLES_CTE + r"""
, eval_sh AS (SELECT DISTINCT s FROM shingles WHERE doc_id < 20),
bloom AS (
  SELECT DISTINCT
         ('0x' || substr(md5(s), 1 + 8 * j, 8))::BIGINT % 1048576 AS pos
  FROM eval_sh, unnest([0, 1, 2, 3]) AS pr(j)
),
probes AS (
  SELECT sh.doc_id, sh.s,
         ('0x' || substr(md5(sh.s), 1 + 8 * j, 8))::BIGINT % 1048576 AS pos
  FROM shingles sh, unnest([0, 1, 2, 3]) AS pr(j)
),
hits AS (
  SELECT p.doc_id, p.s,
         CASE WHEN count(b.pos) = 4 THEN 1 ELSE 0 END AS hit
  FROM probes p LEFT JOIN bloom b ON p.pos = b.pos
  GROUP BY p.doc_id, p.s
),
stats AS (
  SELECT doc_id, count(*) AS n_shingles, sum(hit)::BIGINT AS matched_shingles
  FROM hits GROUP BY doc_id
)
SELECT doc_id, n_shingles, matched_shingles,
       floor(matched_shingles::DOUBLE / n_shingles * 1000000 + 0.5) / 1000000
         AS contamination
FROM stats WHERE matched_shingles >= 1
"""

_TEXT_UNIGRAM_SQL = r"""
WITH words AS (
  SELECT doc_id, unnest(regexp_extract_all(text, '\S+')) AS w FROM documents
),
model AS (SELECT w, count(*) AS c FROM words GROUP BY w)
SELECT words.doc_id,
       count(*) AS n_tokens,
       sum(model.c)::BIGINT AS sum_freq,
       0::BIGINT AS oov_count,
       floor(sum(model.c)::DOUBLE / count(*) * 1000000 + 0.5) / 1000000
         AS mean_token_freq
FROM words JOIN model ON words.w = model.w
GROUP BY words.doc_id
"""

# int8 quantization summary: every output is integer-derived except
# max_abs (an input element upcast f32→f64, exact); the per-element op
# sequence x·(127/max_abs)+0.5 → floor → clip matches the numpy kernel
# DSIR importance weights: integer frequency sums under the target-slice
# and full-corpus unigram models; weight = one division + tie-stable 6-dp
# floor-round, the same op sequence as the numpy kernel
_IMPORTANCE_WEIGHTS_SQL = r"""
WITH words AS (
  SELECT doc_id, unnest(regexp_extract_all(text, '\S+')) AS w FROM documents
),
target_ids AS (
  SELECT doc_id FROM documents
  WHERE ('0x' || substr(md5('dsir' || doc_id::VARCHAR), 1, 8))::BIGINT
        < 1073741824
),
tmodel AS (
  SELECT w, count(*)::BIGINT AS c
  FROM words JOIN target_ids USING (doc_id) GROUP BY w
),
rmodel AS (SELECT w, count(*)::BIGINT AS c FROM words GROUP BY w)
SELECT words.doc_id,
       count(*) AS n_tokens,
       sum(coalesce(tmodel.c, 0))::BIGINT AS sum_target,
       sum(rmodel.c)::BIGINT AS sum_raw,
       floor(sum(coalesce(tmodel.c, 0))::DOUBLE / sum(rmodel.c)
             * 1000000 + 0.5) / 1000000 AS weight
FROM words
JOIN rmodel ON words.w = rmodel.w
LEFT JOIN tmodel ON words.w = tmodel.w
GROUP BY words.doc_id
"""

_EMBED_QUANTIZE_SQL = r"""
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
m AS (SELECT vec_id, v, len(v)::BIGINT AS n_dims,
             list_max(list_transform(v, x -> abs(x))) AS max_abs FROM e),
q AS (
  SELECT vec_id, n_dims, max_abs,
         list_transform(v, x -> greatest(-127, least(127,
             floor(x * (CASE WHEN max_abs > 0 THEN 127 / max_abs
                             ELSE 0 END) + 0.5)))) AS qs
  FROM m
)
SELECT vec_id, n_dims, max_abs,
       list_sum(qs)::BIGINT AS q_sum,
       list_min(qs)::BIGINT AS q_min,
       list_max(qs)::BIGINT AS q_max,
       len(list_filter(qs, x -> x <> 0))::BIGINT AS q_nonzero
FROM q
"""

# per-language top-3 by quality: same float op sequence as _TEXT_QUALITY_SQL
_TOP_DOCS_PER_LANG_SQL = f"""
WITH q AS (
  SELECT doc_id, quality FROM ({_TEXT_QUALITY_SQL})
),
ranked AS (
  SELECT d.lang, q.doc_id, q.quality,
         row_number() OVER (PARTITION BY d.lang
                            ORDER BY q.quality DESC, q.doc_id ASC)::INTEGER
           AS lang_rank
  FROM q JOIN documents d ON d.doc_id = q.doc_id
)
SELECT lang, doc_id, quality, lang_rank FROM ranked WHERE lang_rank <= 3
"""

_LANGID_CONFUSION_SQL = f"""
WITH pred AS (
  SELECT doc_id, lang_pred FROM ({_TEXT_LANGID_SQL})
)
SELECT d.lang, p.lang_pred, count(*)::BIGINT AS n
FROM pred p JOIN documents d ON d.doc_id = p.doc_id
GROUP BY d.lang, p.lang_pred
"""

# deterministic weighted interleave: slot priority = src_rank · (L // w)
# with L a common multiple of the weights (order is the exact rational
# r/w, so ANY common multiple yields the same order; weights are 1..3 by
# construction → 6)
_MIX_CORPORA_SQL = r"""
WITH r AS (
  SELECT doc_id, source,
         (row_number() OVER (PARTITION BY source ORDER BY doc_id)
          - 1)::BIGINT AS src_rank
  FROM documents
),
p AS (
  SELECT doc_id, source, src_rank,
         (src_rank * (6 // ((CAST(substr(source, 4) AS INT) % 3) + 1)))::BIGINT
           AS prio
  FROM r
)
SELECT doc_id, source, src_rank,
       (row_number() OVER (ORDER BY prio, source, src_rank) - 1)::BIGINT
         AS mix_order
FROM p
"""

# CCNet head/middle/tail: (row_number()-1)*3 // count over the unigram
# scores — identical integer arithmetic to rank_buckets' prefix-sum rank;
# the ORDER BY (mean_token_freq, doc_id) tie-break matches the engine's
# composite micro-score|id sort key (monotone bijection)
_QUALITY_BUCKETS_SQL = f"""
WITH scored AS (
  SELECT doc_id, mean_token_freq FROM ({_TEXT_UNIGRAM_SQL})
),
rn AS (
  SELECT doc_id, mean_token_freq,
         (row_number() OVER (ORDER BY mean_token_freq, doc_id) - 1)::BIGINT
           AS doc_rank,
         count(*) OVER ()::BIGINT AS total
  FROM scored
)
SELECT doc_id, mean_token_freq, doc_rank,
       (doc_rank * 3 // total)::BIGINT AS bucket
FROM rn
"""

# mirrors stages/heavyhitters.cms_cells: row j's counter for word w is
# int(md5(w)[8j:8j+8], 16) % 16384 (the Bloom-probe hex slicing); cells are
# the nonzero (row, pos) sums — all-integer, bit-exact.
_WORDS_CMS_SQL = r"""
WITH words AS (
  SELECT unnest(regexp_extract_all(text, '\S+')) AS w FROM documents
),
wc AS (SELECT w, count(*)::BIGINT AS c FROM words GROUP BY w),
cells AS (
  SELECT j::BIGINT AS row_j,
         ('0x' || substr(md5(w), 1 + 8 * j, 8))::BIGINT % 16384 AS pos,
         c
  FROM wc, unnest([0, 1, 2, 3]) AS pr(j)
)
SELECT row_j, pos, sum(c)::BIGINT AS cnt FROM cells GROUP BY row_j, pos
"""

_BPE_PAIR_COUNTS_SQL = r"""
WITH words AS (
  SELECT unnest(regexp_extract_all(text, '\S+')) AS w FROM documents
),
pairs AS (
  SELECT substring(w, i, 2) AS pair
  FROM (SELECT w, unnest(generate_series(1, length(w) - 1)) AS i FROM words)
),
counts AS (SELECT pair, count(*)::BIGINT AS cnt FROM pairs GROUP BY 1),
ranked AS (
  SELECT *, row_number() OVER (ORDER BY cnt DESC, pair ASC)::INTEGER AS rank
  FROM counts
)
SELECT rank, pair, cnt FROM ranked WHERE rank <= 20
"""

_CORPUS_TOP_WORDS_SQL = r"""
WITH words AS (
  SELECT unnest(regexp_extract_all(text, '\S+')) AS w FROM documents
),
counts AS (SELECT w AS word, count(*)::BIGINT AS "count" FROM words GROUP BY w),
ranked AS (
  SELECT *, row_number() OVER (ORDER BY "count" DESC, word ASC)::INTEGER
    AS rank
  FROM counts
)
SELECT rank, word, "count" FROM ranked WHERE rank <= 20
"""

_TEXT_BIGRAM_SQL = r"""
WITH lw AS (SELECT doc_id, regexp_extract_all(text, '\S+') AS l FROM documents),
words AS (SELECT doc_id, unnest(l) AS w, generate_subscripts(l, 1) AS pos FROM lw),
bi AS (
  SELECT a.doc_id, a.w || chr(31) || b.w AS bg
  FROM words a JOIN words b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
),
model AS (SELECT bg, count(*) AS c FROM bi GROUP BY bg)
SELECT bi.doc_id,
       count(*) AS n_bigrams,
       sum(model.c)::BIGINT AS sum_freq,
       0::BIGINT AS oov_count,
       floor(sum(model.c)::DOUBLE / count(*) * 1000000 + 0.5) / 1000000
         AS mean_bigram_freq
FROM bi JOIN model USING (bg)
GROUP BY bi.doc_id
"""

_TEXT_REPETITION_SQL = r"""
WITH lw AS (SELECT doc_id, regexp_extract_all(text, '\S+') AS l FROM documents),
words AS (SELECT doc_id, unnest(l) AS w, generate_subscripts(l, 1) AS pos FROM lw),
wc AS (SELECT doc_id, w, count(*) AS c FROM words GROUP BY doc_id, w),
wstat AS (
  SELECT doc_id, sum(c)::BIGINT AS n_words,
         count(*)::BIGINT AS n_distinct_words, max(c)::BIGINT AS top_word_count
  FROM wc GROUP BY doc_id
),
bi AS (
  SELECT a.doc_id, a.w || chr(31) || b.w AS bg
  FROM words a JOIN words b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
),
bc AS (SELECT doc_id, bg, count(*) AS c FROM bi GROUP BY doc_id, bg),
bstat AS (
  SELECT doc_id, sum(c)::BIGINT AS n_bigrams,
         count(*)::BIGINT AS n_distinct_bigrams, max(c)::BIGINT AS top_bigram_count
  FROM bc GROUP BY doc_id
)
SELECT w.doc_id, w.n_words, w.n_distinct_words, w.top_word_count,
       COALESCE(b.n_bigrams, 0)::BIGINT AS n_bigrams,
       COALESCE(b.n_distinct_bigrams, 0)::BIGINT AS n_distinct_bigrams,
       COALESCE(b.top_bigram_count, 0)::BIGINT AS top_bigram_count,
       floor((w.n_words - w.n_distinct_words)::DOUBLE / w.n_words
             * 1000000 + 0.5) / 1000000 AS dup_word_frac,
       floor(w.top_word_count::DOUBLE / w.n_words * 1000000 + 0.5) / 1000000
         AS top_word_frac,
       floor(COALESCE(b.n_bigrams - b.n_distinct_bigrams, 0)::DOUBLE
             / greatest(COALESCE(b.n_bigrams, 0), 1) * 1000000 + 0.5) / 1000000
         AS dup_bigram_frac,
       floor(COALESCE(b.top_bigram_count, 0)::DOUBLE
             / greatest(COALESCE(b.n_bigrams, 0), 1) * 1000000 + 0.5) / 1000000
         AS top_bigram_frac
FROM wstat w LEFT JOIN bstat b USING (doc_id)
"""

_STRATIFIED_SAMPLE_SQL = r"""
WITH h AS (
  SELECT doc_id, lang,
         substr(md5('strat' || CAST(doc_id AS VARCHAR)), 1, 8) AS hx
  FROM documents
),
r AS (
  SELECT doc_id, lang,
         row_number() OVER (PARTITION BY lang ORDER BY hx, doc_id)::INTEGER
           AS sample_rank
  FROM h
)
SELECT doc_id, lang, sample_rank FROM r WHERE sample_rank <= 10
"""

_EVENT_QUANTILES_SQL = r"""
WITH ranked AS (
  SELECT event_type, value,
         row_number() OVER (PARTITION BY event_type ORDER BY value) AS rn,
         count(*) OVER (PARTITION BY event_type) AS cnt
  FROM events
)
SELECT event_type, q.q, ranked.value AS quantile_value, cnt::BIGINT AS n
FROM ranked, (VALUES (0.25), (0.5), (0.75), (0.9)) AS q(q)
WHERE rn = greatest(1, ceil(q.q * cnt))::BIGINT
"""

_ANN_RADIUS_SQL = r"""
WITH q AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 8),
scored AS (
  SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id,
         round(list_cosine_similarity(q.embedding::DOUBLE[],
                                      e.embedding::DOUBLE[]), 6) AS cos_sim
  FROM q CROSS JOIN embeddings e WHERE e.vec_id <> q.vec_id
),
ranked AS (
  SELECT *, row_number() OVER (
      PARTITION BY query_id ORDER BY cos_sim DESC, neighbor_id ASC
  )::INTEGER AS rank
  FROM scored WHERE cos_sim >= 0.2
)
SELECT query_id, rank, neighbor_id, cos_sim FROM ranked WHERE rank <= 5
"""

_EMB_BUCKET4_EXPR = (
    "("
    + " + ".join(
        f"CASE WHEN embedding[{i + 1}] > 0 THEN {1 << i} ELSE 0 END"
        for i in range(4)
    )
    + ")"
)

# NOTE: the Ray side buckets queries on their *unit* vector — same sign
# pattern as the raw vector, so raw-vector bucketing here is equivalent.
_ANN_TOPK_LSH_SQL = f"""
WITH b AS (
  SELECT vec_id, embedding, {_EMB_BUCKET4_EXPR} AS bucket FROM embeddings
),
q AS (SELECT * FROM b WHERE vec_id < 8),
scored AS (
  SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id,
         round(list_cosine_similarity(q.embedding::DOUBLE[],
                                      e.embedding::DOUBLE[]), 6) AS cos_sim
  FROM q JOIN b e ON e.bucket = q.bucket AND e.vec_id <> q.vec_id
),
ranked AS (
  SELECT *, row_number() OVER (
      PARTITION BY query_id ORDER BY cos_sim DESC, neighbor_id ASC
  )::INTEGER AS rank
  FROM scored
)
SELECT query_id, rank, neighbor_id, cos_sim FROM ranked WHERE rank <= 5
"""

# IVF coarse quantizer: centroids = first 8 vectors; cell = argmax rounded
# cosine with ties to the lowest centroid id (np.argmax picks the first max)
# inverted index: distinct (word, doc) pairs, postings = ordered joined ids
_TEXT_POSTINGS_SQL = r"""
WITH pairs AS (
  SELECT DISTINCT doc_id, w AS word
  FROM (SELECT doc_id, unnest(regexp_extract_all(text, '\S+')) AS w
        FROM documents)
)
SELECT word, count(*)::BIGINT AS df,
       string_agg(doc_id, '|' ORDER BY doc_id) AS postings
FROM pairs GROUP BY word HAVING count(*) >= 2
"""

# shard manifest: md5 hash-space shard of doc_id (sources/export), token
# counts whitespace; all-integer
_SHARD_MANIFEST_SQL = r"""
SELECT (('0x' || substr(md5('shard' || doc_id::VARCHAR), 1, 8))::BIGINT
        % 16)::INTEGER AS shard,
       count(*)::BIGINT AS n_docs,
       sum(len(regexp_extract_all(text, '\S+')))::BIGINT AS n_tokens
FROM documents GROUP BY 1
"""

# concat-and-chunk packing: exclusive window prefix-sum of whitespace token
# counts in doc_id order; integer-only
_PACK_SEQUENCES_SQL = r"""
WITH t AS (
  SELECT doc_id,
         len(regexp_extract_all(text, '\S+'))::BIGINT AS n_tokens
  FROM documents
),
s AS (
  SELECT doc_id, n_tokens,
         (sum(n_tokens) OVER (ORDER BY doc_id
             ROWS UNBOUNDED PRECEDING) - n_tokens)::BIGINT AS "offset"
  FROM t
)
SELECT doc_id, n_tokens, "offset",
       ("offset" // 1024)::BIGINT AS pack_id,
       ("offset" % 1024)::BIGINT AS offset_in_pack
FROM s
"""

# per-pack shard-balance report over the pack assignment
_PACK_STATS_SQL = "SELECT pack_id, count(*)::BIGINT AS n_docs, " \
    "sum(n_tokens)::BIGINT AS pack_tokens, " \
    "sum(CASE WHEN offset_in_pack + n_tokens > 1024 THEN 1 ELSE 0 " \
    "END)::BIGINT AS n_straddle FROM (" + _PACK_SEQUENCES_SQL + \
    ") GROUP BY pack_id"


# curriculum variant: the same window arithmetic over the corpus ordered
# (mean_token_freq DESC, doc_id ASC) — stages/packing.pack_curriculum
# corpus data card: every aggregate integer-derived; mean uses the
# engine's floor(x*1e6+0.5) rounding; length() == byte length on ASCII
# graph data card: subselects over the full nodes/edges derivations;
# dyadic edge weights (k*0.5) make weight*2 an exact integer
# systematic weighted sampling: window prefix-sum + the same integer
# target-count formula c(x) = clamp(((2kx + W-1)//W)//2, 0, k)
_WEIGHTED_SAMPLE_SQL = r"""
WITH t AS (
  SELECT doc_id,
         len(regexp_extract_all(text, '\S+'))::BIGINT AS n_tokens
  FROM documents
),
s AS (
  SELECT doc_id, n_tokens,
         (sum(n_tokens) OVER (ORDER BY doc_id
              ROWS UNBOUNDED PRECEDING) - n_tokens)::BIGINT AS o,
         (sum(n_tokens) OVER ())::BIGINT AS w_total
  FROM t
),
p AS (
  SELECT doc_id, n_tokens,
         (least(100, greatest(0, ((200 * (o + n_tokens) + w_total - 1)
                                  // w_total) // 2))
          - least(100, greatest(0, ((200 * o + w_total - 1)
                                    // w_total) // 2)))::BIGINT AS n_picks
  FROM s
)
SELECT doc_id, n_tokens, n_picks FROM p WHERE n_picks >= 1
"""


_GRAPH_SUMMARY_SQL = f"""
SELECT (SELECT count(*) FROM ({_NODES_SQL}))::BIGINT AS n_nodes,
       (SELECT count(*) FROM ({_EDGES_SQL}))::BIGINT AS n_edges,
       (SELECT sum(mention_count) FROM ({_NODES_SQL}))::BIGINT
         AS node_mentions,
       (SELECT sum(mention_count) FROM ({_EDGES_SQL}))::BIGINT
         AS edge_mentions,
       (SELECT sum((weight * 2)::BIGINT) FROM ({_EDGES_SQL}))::BIGINT
         AS total_weight_x2
"""

# events data card: exact distincts, epoch-us bounds, integer-cent sum
_EVENTS_SUMMARY_SQL = r"""
SELECT count(*)::BIGINT AS n_events,
       count(DISTINCT user_id)::BIGINT AS distinct_users,
       count(DISTINCT event_type)::BIGINT AS distinct_event_types,
       epoch_us(min(ts))::BIGINT AS min_ts_us,
       epoch_us(max(ts))::BIGINT AS max_ts_us,
       sum(floor(value * 100 + 0.5)::BIGINT)::BIGINT AS total_value_cents
FROM events
"""


_CORPUS_SUMMARY_SQL = r"""
WITH t AS (
  SELECT doc_id,
         len(regexp_extract_all(text, '\S+'))::BIGINT AS n_tokens,
         length(text)::BIGINT AS n_chars
  FROM documents
),
w AS (
  SELECT count(DISTINCT x.w)::BIGINT AS distinct_words
  FROM (SELECT unnest(regexp_extract_all(text, '\S+')) AS w
        FROM documents) x
)
SELECT count(*)::BIGINT AS n_docs,
       sum(n_tokens)::BIGINT AS total_tokens,
       max(n_tokens)::BIGINT AS max_doc_tokens,
       floor(sum(n_tokens)::DOUBLE / count(*) * 1000000 + 0.5) / 1000000
         AS mean_doc_tokens,
       sum(n_chars)::BIGINT AS total_chars,
       (SELECT distinct_words FROM w) AS distinct_words
FROM t
"""


_CURRICULUM_PACK_SQL = f"""
WITH u AS (
  SELECT doc_id, n_tokens::BIGINT AS n_tokens, mean_token_freq
  FROM ({_TEXT_UNIGRAM_SQL})
),
s AS (
  SELECT doc_id, n_tokens, mean_token_freq,
         (sum(n_tokens) OVER (ORDER BY mean_token_freq DESC, doc_id ASC
             ROWS UNBOUNDED PRECEDING) - n_tokens)::BIGINT AS "offset"
  FROM u
)
SELECT doc_id, n_tokens, mean_token_freq, "offset",
       ("offset" // 1024)::BIGINT AS pack_id,
       ("offset" % 1024)::BIGINT AS offset_in_pack
FROM s
"""

# SemDeDup oracle: cluster assignment (same CTE as embed_clusters), then
# within-cluster lower-id pairs with rounded cos ≥ 0.35; dup_of = min id
_DEDUP_SEMANTIC_SQL = r"""
WITH cents AS (
  SELECT vec_id AS ci, embedding AS cvec FROM embeddings WHERE vec_id < 8
),
ranked AS (
  SELECT e.vec_id, c.ci, row_number() OVER (
      PARTITION BY e.vec_id
      ORDER BY round(list_cosine_similarity(e.embedding::DOUBLE[],
                                            c.cvec::DOUBLE[]), 6) DESC,
               c.ci ASC
  ) AS rn
  FROM embeddings e CROSS JOIN cents c
),
cl AS (SELECT vec_id, ci AS cluster_id FROM ranked WHERE rn = 1),
pairs AS (
  SELECT a.vec_id AS vec_id, b.vec_id AS lo,
         round(list_cosine_similarity(ea.embedding::DOUBLE[],
                                      eb.embedding::DOUBLE[]), 6) AS cs
  FROM cl a
  JOIN cl b ON a.cluster_id = b.cluster_id AND a.vec_id > b.vec_id
  JOIN embeddings ea ON ea.vec_id = a.vec_id
  JOIN embeddings eb ON eb.vec_id = b.vec_id
),
best AS (
  SELECT vec_id, lo, cs,
         row_number() OVER (PARTITION BY vec_id ORDER BY lo ASC) AS rn
  FROM pairs WHERE cs >= 0.35
)
SELECT vec_id, lo AS dup_of, cs AS cos_sim FROM best WHERE rn = 1
"""

# nearest-centroid assignment: centroids = embeddings with vec_id < 8
# (centroid index == vec_id), ties break to the lowest cluster id
_EMBED_CLUSTERS_SQL = r"""
WITH cents AS (
  SELECT vec_id AS ci, embedding AS cvec FROM embeddings WHERE vec_id < 8
),
scored AS (
  SELECT e.vec_id, c.ci,
         round(list_cosine_similarity(e.embedding::DOUBLE[],
                                      c.cvec::DOUBLE[]), 6) AS cos_sim
  FROM embeddings e CROSS JOIN cents c
),
ranked AS (
  SELECT *, row_number() OVER (
      PARTITION BY vec_id ORDER BY cos_sim DESC, ci ASC
  ) AS rn
  FROM scored
)
SELECT vec_id, ci::INTEGER AS cluster_id, cos_sim
FROM ranked WHERE rn = 1
"""

# mirrors stages/quantize.pq_codes / pq_ann_topk: subspace s of a 64-dim
# vector is elements [16s+1 : 16s+16] (1-based inclusive slice); distances
# quantize to integer micro-units floor(d*1e6 + 0.5) BEFORE any compare or
# sum, so assignment (integer argmin, ties -> lower centroid id) and the
# ADC distance (integer sum of squared LUT entries) are bit-exact.
_PQ_CTES = r"""cents AS (
  SELECT s.j AS s, c.vec_id AS ci,
         (c.embedding::DOUBLE[])[s.j*16+1 : s.j*16+16] AS cvec
  FROM (SELECT unnest([0,1,2,3]) AS j) s
  CROSS JOIN (SELECT * FROM embeddings WHERE vec_id < 8) c
),
vsub AS (
  SELECT e.vec_id, s.j AS s,
         (e.embedding::DOUBLE[])[s.j*16+1 : s.j*16+16] AS v
  FROM embeddings e CROSS JOIN (SELECT unnest([0,1,2,3]) AS j) s
),
dists AS (
  SELECT v.vec_id, v.s, c.ci,
         floor(list_distance(v.v, c.cvec) * 1000000 + 0.5)::BIGINT AS m
  FROM vsub v JOIN cents c ON v.s = c.s
),
codes AS (
  SELECT vec_id, s, ci AS code FROM (
    SELECT *, row_number() OVER (
        PARTITION BY vec_id, s ORDER BY m ASC, ci ASC) AS rn
    FROM dists) WHERE rn = 1
)"""

_EMBED_PQ_CODES_SQL = "WITH " + _PQ_CTES + r"""
SELECT vec_id,
       max(CASE WHEN s = 0 THEN code END)::BIGINT AS code_0,
       max(CASE WHEN s = 1 THEN code END)::BIGINT AS code_1,
       max(CASE WHEN s = 2 THEN code END)::BIGINT AS code_2,
       max(CASE WHEN s = 3 THEN code END)::BIGINT AS code_3
FROM codes GROUP BY vec_id
"""

_ANN_TOPK_PQ_SQL = "WITH " + _PQ_CTES + r""",
lut AS (SELECT s, ci, m * m AS sq FROM dists WHERE vec_id = 0),
adist AS (
  SELECT c.vec_id, sum(l.sq)::BIGINT AS adist
  FROM codes c JOIN lut l ON c.s = l.s AND c.code = l.ci
  WHERE c.vec_id <> 0
  GROUP BY c.vec_id
)
SELECT row_number() OVER (ORDER BY adist ASC, vec_id ASC)::INTEGER AS rank,
       vec_id, adist
FROM adist ORDER BY rank LIMIT 5
"""

# IVF-PQ: the IVF cell CTE (icents/cells) composed with the PQ adist
# algebra; nprobe=1 — each query scans exactly its own cell
_ANN_TOPK_IVFPQ_SQL = "WITH " + _PQ_CTES + r""",
icents AS (
  SELECT vec_id AS ci, embedding AS cvec FROM embeddings WHERE vec_id < 8
),
cells AS (
  SELECT e.vec_id,
         (SELECT c.ci FROM icents c
          ORDER BY round(list_cosine_similarity(e.embedding::DOUBLE[],
                                                c.cvec::DOUBLE[]), 6) DESC,
                   c.ci ASC
          LIMIT 1) AS cell
  FROM embeddings e
),
lut AS (SELECT vec_id AS qid, s, ci, m * m AS sq FROM dists WHERE vec_id < 4),
qcell AS (SELECT vec_id AS qid, cell FROM cells WHERE vec_id < 4),
adist AS (
  SELECT l.qid AS query_id, c.vec_id, sum(l.sq)::BIGINT AS adist
  FROM codes c
  JOIN cells ce ON ce.vec_id = c.vec_id
  JOIN qcell q ON ce.cell = q.cell
  JOIN lut l ON l.qid = q.qid AND c.s = l.s AND c.code = l.ci
  WHERE c.vec_id <> l.qid
  GROUP BY l.qid, c.vec_id
),
ranked AS (
  SELECT query_id, vec_id, adist, row_number() OVER (
      PARTITION BY query_id ORDER BY adist ASC, vec_id ASC
  )::INTEGER AS rank
  FROM adist
)
SELECT query_id, rank, vec_id, adist FROM ranked WHERE rank <= 5
"""


# the multi-query ADC twin: one LUT per query id < 4, the same integer
# micro-distance algebra, rank per query (quantize.pq_ann_topk n_queries>1)
_ANN_TOPK_PQ_MULTI_SQL = "WITH " + _PQ_CTES + r""",
lut AS (SELECT vec_id AS qid, s, ci, m * m AS sq FROM dists WHERE vec_id < 4),
adist AS (
  SELECT l.qid AS query_id, c.vec_id, sum(l.sq)::BIGINT AS adist
  FROM codes c JOIN lut l ON c.s = l.s AND c.code = l.ci
  WHERE c.vec_id <> l.qid
  GROUP BY l.qid, c.vec_id
),
ranked AS (
  SELECT query_id, vec_id, adist, row_number() OVER (
      PARTITION BY query_id ORDER BY adist ASC, vec_id ASC
  )::INTEGER AS rank
  FROM adist
)
SELECT query_id, rank, vec_id, adist FROM ranked WHERE rank <= 5
"""

_ANN_TOPK_IVF_SQL = r"""
WITH cents AS (
  SELECT vec_id AS ci, embedding AS cvec FROM embeddings WHERE vec_id < 8
),
cells AS (
  SELECT e.vec_id, e.embedding,
         (SELECT c.ci FROM cents c
          ORDER BY round(list_cosine_similarity(e.embedding::DOUBLE[],
                                                c.cvec::DOUBLE[]), 6) DESC,
                   c.ci ASC
          LIMIT 1) AS cell
  FROM embeddings e
),
q AS (SELECT * FROM cells WHERE vec_id < 8),
scored AS (
  SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id,
         round(list_cosine_similarity(q.embedding::DOUBLE[],
                                      e.embedding::DOUBLE[]), 6) AS cos_sim
  FROM q JOIN cells e ON e.cell = q.cell AND e.vec_id <> q.vec_id
),
ranked AS (
  SELECT *, row_number() OVER (
      PARTITION BY query_id ORDER BY cos_sim DESC, neighbor_id ASC
  )::INTEGER AS rank
  FROM scored
)
SELECT query_id, rank, neighbor_id, cos_sim FROM ranked WHERE rank <= 5
"""

# mirrors sources/io.flat_documents_as_interleaved (one image span per full
# 40 words, span_index = 1 + k) + stages/multimodal.MediaFeaturizer fake
# features (md5 digest bytes)
_MEDIA_FEATURES_SQL = r"""
WITH docs AS (
  SELECT 'doc-' || doc_id::VARCHAR AS did,
         len(regexp_extract_all(text, '\S+')) // 40 AS n_img
  FROM documents
),
media AS (
  SELECT did, (k + 1)::INTEGER AS span_index,
         'media://' || did || '/' || k::VARCHAR AS ref
  FROM docs, unnest(range(0, n_img)) AS u(k)
)
SELECT did AS doc_id, span_index, 'image' AS kind, ref AS media_ref,
       (64 + ('0x' || substr(md5(ref), 1, 2))::INTEGER % 192)::INTEGER AS width,
       (64 + ('0x' || substr(md5(ref), 3, 2))::INTEGER % 192)::INTEGER AS height,
       ('0x' || substr(md5(ref), 5, 2))::INTEGER AS f0,
       ('0x' || substr(md5(ref), 7, 2))::INTEGER AS f1,
       ('0x' || substr(md5(ref), 9, 2))::INTEGER AS f2,
       ('0x' || substr(md5(ref), 11, 2))::INTEGER AS f3
FROM media
"""

# leakage-safe split oracle: the dedup_clusters derivation with the
# split_assign md5-range formula applied to cluster_id instead of doc_id
_SPLIT_LEAKAGE_SAFE_SQL = "SELECT doc_id, cluster_id, CASE WHEN ('0x' || substr(md5('split' || cluster_id::VARCHAR), 1, 8))::BIGINT < 3435973836 THEN 'train' WHEN ('0x' || substr(md5('split' || cluster_id::VARCHAR), 1, 8))::BIGINT < 3865470566 THEN 'val' ELSE 'test' END AS split FROM (" + _DEDUP_CLUSTERS_SQL + ")"


# the media_decode oracle recomputes the features the engine obtains by
# actually DECODING synthesized P6 bytes (mediadec.synthesize_ppm):
# constant-channel images make floor channel means == the md5 bytes and
# the spread == greatest-least — pure integer arithmetic on both sides
_MEDIA_DECODE_SQL = r"""
WITH docs AS (
  SELECT 'doc-' || doc_id::VARCHAR AS did,
         len(regexp_extract_all(text, '\S+')) // 40 AS n_img
  FROM documents
),
media AS (
  SELECT did, (k + 1)::INTEGER AS span_index,
         'media://' || did || '/' || k::VARCHAR AS ref
  FROM docs, unnest(range(0, n_img)) AS u(k)
),
b AS (
  SELECT did, span_index, ref, (span_index - 1) % 4 AS par,
         ('0x' || substr(md5(ref), 1, 2))::INTEGER AS b0,
         ('0x' || substr(md5(ref), 3, 2))::INTEGER AS b1,
         ('0x' || substr(md5(ref), 5, 2))::INTEGER AS b2,
         ('0x' || substr(md5(ref), 7, 2))::INTEGER AS b3,
         ('0x' || substr(md5(ref), 9, 2))::INTEGER AS b4,
         ('0x' || substr(md5(ref), 11, 2))::INTEGER AS b5,
         ('0x' || substr(md5(ref), 13, 2))::INTEGER AS b6,
         ('0x' || substr(md5(ref), 15, 2))::INTEGER AS b7
  FROM media
)
-- slot cycle: par 0 = 8-bit P6 PPM, par 1 = PCM-16 WAV, par 2 = 16-bit
-- P5 PGM (constant sample b2·256+b7), par 3 = multi-data-chunk WAV
-- (same sample stream as par 1, so the audio case is shared)
SELECT did AS doc_id, span_index,
       CASE WHEN par % 2 = 1 THEN 'audio' ELSE 'image' END AS kind,
       ref AS media_ref,
       CASE WHEN par % 2 = 1 THEN 80
            ELSE 4 + b0 % 13 END::INTEGER AS width,
       CASE WHEN par % 2 = 1 THEN 16 + b5 % 64
            ELSE 4 + b1 % 13 END::INTEGER AS height,
       CASE WHEN par % 2 = 1 THEN 1
            WHEN par = 2 THEN b2 * 256 + b7
            ELSE b2 END::INTEGER AS f0,
       CASE WHEN par % 2 = 1 THEN b6
            WHEN par = 2 THEN b2 * 256 + b7
            ELSE b3 END::INTEGER AS f1,
       CASE WHEN par % 2 = 1 THEN b6
            WHEN par = 2 THEN b2 * 256 + b7
            ELSE b4 END::INTEGER AS f2,
       CASE WHEN par % 2 = 1 OR par = 2 THEN 0
            ELSE greatest(b2, b3, b4) - least(b2, b3, b4)
       END::INTEGER AS f3
FROM b
"""

# independent SQL derivation of the interleaved span sequence (the
# flat_documents_as_interleaved rule): one text span at order 0, one image
# span per full 40 words at order k+1 — fingerprinted exactly like
# q_span_check's engine-side md5
_SPAN_CHECK_SQL = r"""
WITH docs AS (
  SELECT 'doc-' || doc_id::VARCHAR AS did, text,
         len(regexp_extract_all(text, '\S+')) // 40 AS n_img
  FROM documents
),
spans AS (
  SELECT did, 0 AS ord,
         'text' || chr(1) || text || chr(1) || '' || chr(1) || '0' AS part
  FROM docs
  UNION ALL
  SELECT did, k + 1,
         'image' || chr(1) || '' || chr(1) || 'media://' || did || '/' || k::VARCHAR
           || chr(1) || (k + 1)::VARCHAR
  FROM docs, unnest(range(0, n_img)) AS u(k)
)
SELECT did AS doc_id,
       count(*) AS n_spans,
       md5(string_agg(part, chr(2) ORDER BY ord)) AS span_fp
FROM spans GROUP BY did
"""


# event-time oracles: integer-cent sums (float sums are order-dependent);
# window ids are pure epoch-µs arithmetic on both sides
# mirrors stages/hll.py hll_registers: bucket = first 12 bits of
# md5('hll' || value), rank = 49 - bit_length of the next 48 bits (49 for
# zero); length(bin(w)) is DuckDB's bit_length.  All-int64 — bit-exact.
_EVENTS_HLL_SQL = r"""
WITH v AS (SELECT DISTINCT user_id::VARCHAR AS s FROM events
           WHERE user_id IS NOT NULL),
h AS (SELECT md5('hll' || s) AS h FROM v),
parts AS (
  SELECT ('0x' || substr(h, 1, 3))::BIGINT AS bucket,
         ('0x' || substr(h, 4, 12))::BIGINT AS w
  FROM h
)
SELECT bucket,
       max(CASE WHEN w = 0 THEN 49 ELSE 49 - length(bin(w)) END)::BIGINT
         AS max_rank
FROM parts GROUP BY bucket
"""

_EVENTS_RUNNING_SQL = r"""
WITH e AS (
  SELECT event_id, user_id, ts,
         floor(value * 100 + 0.5)::BIGINT AS cents
  FROM events)
SELECT event_id, user_id,
       (sum(cents) OVER (PARTITION BY user_id ORDER BY ts, event_id
                         ROWS UNBOUNDED PRECEDING))::BIGINT AS cum_cents,
       (row_number() OVER (PARTITION BY user_id
                           ORDER BY ts, event_id))::BIGINT AS seq,
       coalesce(epoch_us(ts) - epoch_us(lag(ts) OVER (
           PARTITION BY user_id ORDER BY ts, event_id)), -1)::BIGINT
           AS gap_us,
       coalesce(epoch_us(lead(ts) OVER (
           PARTITION BY user_id ORDER BY ts, event_id)) - epoch_us(ts),
           -1)::BIGINT AS lead_us
FROM e
"""

_JOIN_ORDER_LINEITEM_SQL = r"""
SELECT l_orderkey,
       l_linenumber::BIGINT AS l_linenumber,
       (floor(l_extendedprice * 100 + 0.5)::BIGINT
        * (100 - floor(l_discount * 100 + 0.5)::BIGINT))::BIGINT AS disc_c2,
       o_orderpriority
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
"""

_ORDERS_BIG_LINE_SQL = r"""
SELECT o_orderkey, o_orderpriority,
       floor(o_totalprice * 100 + 0.5)::BIGINT AS total_cents
FROM orders o
WHERE EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity >= 45)
"""

_ORDERS_NO_BIG_LINE_SQL = r"""
SELECT o_orderkey, o_orderpriority,
       floor(o_totalprice * 100 + 0.5)::BIGINT AS total_cents
FROM orders o
WHERE NOT EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity >= 45)
"""

_WINDOW_DISTINCT_SQL = r"""
SELECT (epoch_us(ts) // 3600000000) * 3600000000 AS window_start_us,
       count(*)::BIGINT AS n_events,
       count(DISTINCT user_id)::BIGINT AS n_users
FROM events
GROUP BY 1
"""

_WINDOW_TUMBLING_SQL = r"""
SELECT (epoch_us(ts) // 3600000000) * 3600000000 AS window_start_us,
       event_type,
       count(*) AS n_events,
       sum(floor(value * 100 + 0.5)::BIGINT)::BIGINT AS sum_value_cents
FROM events
GROUP BY 1, 2
"""

_WINDOW_HOPPING_SQL = r"""
WITH e AS (
  SELECT epoch_us(ts) AS t, floor(value * 100 + 0.5)::BIGINT AS cents FROM events
),
hops AS (
  SELECT ((t - 3600000000) // 900000000 + 1) * 900000000 + k * 900000000
           AS window_start_us,
         cents, t
  FROM e, unnest(range(0, 4)) AS u(k)
)
SELECT window_start_us, count(*) AS n_events, sum(cents)::BIGINT AS sum_value_cents
FROM hops WHERE window_start_us <= t
GROUP BY 1
"""

_EVENTS_TRENDING_SQL = r"""
WITH kv AS (
  SELECT (epoch_us(ts) // 86400000000) * 86400000000 AS w,
         CAST(regexp_extract(props, '"k": (\d+)', 1) AS BIGINT) AS k
  FROM events
),
counts AS (SELECT w, k, count(*)::BIGINT AS cnt FROM kv GROUP BY 1, 2),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY w
                               ORDER BY cnt DESC, k ASC)::INTEGER AS rank
  FROM counts
)
SELECT r.w AS window_start_us, r.rank, r.k, r.cnt,
       COALESCE(p.cnt, 0)::BIGINT AS prev_cnt,
       (r.cnt - COALESCE(p.cnt, 0))::BIGINT AS delta
FROM ranked r
LEFT JOIN counts p ON p.k = r.k AND p.w = r.w - 86400000000
WHERE r.rank <= 5
ORDER BY window_start_us, rank
"""

_SESSION_EVENTS_SQL = r"""
WITH e AS (
  SELECT event_id, user_id, epoch_us(ts) AS t,
         CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER w > 1800000000
              OR lag(epoch_us(ts)) OVER w IS NULL THEN 1 ELSE 0 END AS brk
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
)
SELECT event_id, user_id,
       (sum(brk) OVER (PARTITION BY user_id ORDER BY t, event_id
                       ROWS UNBOUNDED PRECEDING) - 1)::INTEGER
         AS session_index
FROM e
"""

_EVENTS_FUNNEL_SQL = r"""
WITH s0 AS (
  SELECT user_id, min(epoch_us(ts)) AS t FROM events
  WHERE event_type = 'view' GROUP BY 1
),
s1 AS (
  SELECT e.user_id, min(epoch_us(e.ts)) AS t
  FROM events e JOIN s0 USING (user_id)
  WHERE e.event_type = 'click' AND epoch_us(e.ts) > s0.t
    AND epoch_us(e.ts) <= s0.t + 86400000000
  GROUP BY e.user_id
),
s2 AS (
  SELECT e.user_id, min(epoch_us(e.ts)) AS t
  FROM events e JOIN s1 USING (user_id) JOIN s0 USING (user_id)
  WHERE e.event_type = 'purchase' AND epoch_us(e.ts) > s1.t
    AND epoch_us(e.ts) <= s0.t + 86400000000
  GROUP BY e.user_id
)
SELECT * FROM (
  SELECT 1::BIGINT AS step, 'view' AS event_type,
         count(*)::BIGINT AS n_users FROM s0
  UNION ALL
  SELECT 2::BIGINT, 'click', count(*)::BIGINT FROM s1
  UNION ALL
  SELECT 3::BIGINT, 'purchase', count(*)::BIGINT FROM s2
) ORDER BY step
"""

_EVENTS_RETENTION_SQL = r"""
WITH up AS (
  SELECT DISTINCT user_id,
         (epoch_us(ts) // 604800000000) * 604800000000 AS period_us
  FROM events
),
coh AS (SELECT user_id, min(period_us) AS cohort_us FROM up GROUP BY 1)
SELECT c.cohort_us, u.period_us, count(*)::BIGINT AS n_users
FROM up u JOIN coh c USING (user_id)
GROUP BY 1, 2 ORDER BY 1, 2
"""

_SESSIONS_SQL = r"""
WITH e AS (
  SELECT user_id, epoch_us(ts) AS t,
         CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER w > 1800000000
              OR lag(epoch_us(ts)) OVER w IS NULL THEN 1 ELSE 0 END AS brk
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts))
),
s AS (
  SELECT user_id, t,
         sum(brk) OVER (PARTITION BY user_id ORDER BY t
                        ROWS UNBOUNDED PRECEDING) - 1 AS session_index
  FROM e
)
SELECT user_id, session_index::INTEGER AS session_index,
       count(*) AS n_events, min(t) AS start_us, max(t) AS end_us
FROM s GROUP BY user_id, session_index
"""

_ASOF_JOIN_SQL = r"""
SELECT e.event_id, e.user_id,
       (SELECT m.event_id FROM events m
        WHERE m.user_id = e.user_id AND m.event_type = 'error'
          AND (m.ts < e.ts OR (m.ts = e.ts AND m.event_id <= e.event_id))
        ORDER BY m.ts DESC, m.event_id DESC LIMIT 1) AS mark_event_id
FROM events e
"""

_PRICING_SUMMARY_SQL = r"""
SELECT l_returnflag, l_linestatus,
       sum(CAST(l_quantity AS BIGINT))::BIGINT AS sum_qty,
       sum(floor(l_extendedprice*100 + 0.5)::BIGINT)::BIGINT
         AS sum_base_cents,
       sum(floor(l_extendedprice*100 + 0.5)::BIGINT
           * (100 - floor(l_discount*100 + 0.5)::BIGINT))::BIGINT
         AS sum_disc_cents_h,
       count(*)::BIGINT AS n_rows
FROM lineitem
GROUP BY l_returnflag, l_linestatus
"""

_EVENTS_PIVOT_SQL = r"""
SELECT user_id,
       sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)::BIGINT
         AS n_click,
       sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)::BIGINT
         AS n_error,
       sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)::BIGINT
         AS n_purchase,
       sum(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END)::BIGINT
         AS n_signup,
       sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)::BIGINT
         AS n_view,
       sum(floor(value * 100 + 0.5)::BIGINT)::BIGINT AS total_cents
FROM events GROUP BY user_id
"""

# user × type grid with zero-count cells, like the melted pivot
_EVENTS_UNPIVOT_SQL = r"""
WITH c AS (SELECT user_id, event_type, count(*)::BIGINT AS n
           FROM events GROUP BY user_id, event_type),
u AS (SELECT DISTINCT user_id FROM events),
t(event_type) AS (VALUES ('click'), ('error'), ('purchase'),
                         ('signup'), ('view'))
SELECT u.user_id, t.event_type, coalesce(c.n, 0)::BIGINT AS n
FROM u CROSS JOIN t
LEFT JOIN c ON c.user_id = u.user_id AND c.event_type = t.event_type
"""

# level = GROUPING(flag, status): 0 finest, 1 = per-flag subtotal,
# 3 = grand total — identical bitmask on both sides
_PRICING_ROLLUP_SQL = r"""
SELECT l_returnflag, l_linestatus,
       sum(CAST(l_quantity AS BIGINT))::BIGINT AS sum_qty,
       sum(floor(l_extendedprice*100 + 0.5)::BIGINT)::BIGINT
         AS sum_base_cents,
       sum(floor(l_extendedprice*100 + 0.5)::BIGINT
           * (100 - floor(l_discount*100 + 0.5)::BIGINT))::BIGINT
         AS sum_disc_cents_h,
       count(*)::BIGINT AS n_rows,
       grouping(l_returnflag, l_linestatus)::BIGINT AS level
FROM lineitem
GROUP BY ROLLUP(l_returnflag, l_linestatus)
"""

_PRICING_CUBE_SQL = r"""
SELECT l_returnflag, l_linestatus,
       sum(CAST(l_quantity AS BIGINT))::BIGINT AS sum_qty,
       sum(floor(l_extendedprice*100 + 0.5)::BIGINT)::BIGINT
         AS sum_base_cents,
       sum(floor(l_extendedprice*100 + 0.5)::BIGINT
           * (100 - floor(l_discount*100 + 0.5)::BIGINT))::BIGINT
         AS sum_disc_cents_h,
       count(*)::BIGINT AS n_rows,
       grouping(l_returnflag, l_linestatus)::BIGINT AS level
FROM lineitem
GROUP BY CUBE(l_returnflag, l_linestatus)
"""

_REVENUE_BY_NATION_SQL = r"""
SELECT n.n_name,
       sum(floor(o.o_totalprice*100 + 0.5)::BIGINT)::BIGINT
         AS revenue_cents,
       count(*)::BIGINT AS n_orders
FROM orders o
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
GROUP BY n.n_name
"""

# TPC-H Q3 shape: cutoff 1998-06-01 (epoch_us 896659200000000), segment
# BUILDING; revenue is the same integer product as the engine, the top-10
# boundary is deterministic via the (rev DESC, date, orderkey) tie-break
_TOP_REVENUE_ORDERS_SQL = r"""
WITH l AS (
  SELECT l_orderkey,
         (floor(l_extendedprice*100 + 0.5)::BIGINT
          * (100 - floor(l_discount*100 + 0.5)::BIGINT)) AS rc
  FROM lineitem WHERE l_shipdate > TIMESTAMP '1998-06-01'
)
SELECT o.o_orderkey AS o_orderkey,
       sum(l.rc)::BIGINT AS revenue_c2,
       epoch_us(o.o_orderdate)::BIGINT AS o_orderdate_us
FROM orders o
JOIN customer c ON c.c_custkey = o.o_custkey
                AND c.c_mktsegment = 'BUILDING'
JOIN l ON l.l_orderkey = o.o_orderkey
WHERE o.o_orderdate < TIMESTAMP '1998-06-01'
GROUP BY o.o_orderkey, o.o_orderdate
ORDER BY revenue_c2 DESC, o_orderdate_us, o_orderkey
LIMIT 10
"""

# inclusive lookback [ts - 300s, ts]; integer count → bit-exact
_RANGE_JOIN_SQL = r"""
SELECT e.event_id, e.user_id,
       (SELECT count(*)::BIGINT FROM events m
        WHERE m.user_id = e.user_id AND m.event_type = 'error'
          AND m.ts <= e.ts
          AND m.ts >= e.ts - INTERVAL 300 SECOND) AS n_marks
FROM events e
"""


# degree = 0 per node row + 1 per incident edge endpoint, over the same
# graph the kg_nodes/kg_edges oracles define
_KG_DEGREES_SQL = _PRELUDE + r"""
, nodes_real AS (SELECT DISTINCT upper(wo.w) AS entity_id FROM words wo
                 JOIN gaz g ON wo.w = g.w),
eps AS (
  SELECT s AS ep FROM (SELECT DISTINCT s, o FROM relk)
  UNION ALL
  SELECT o FROM (SELECT DISTINCT s, o FROM relk)
),
all_nodes AS (
  SELECT entity_id FROM nodes_real
  UNION
  SELECT ep FROM eps
)
SELECT n.entity_id,
       (SELECT count(*) FROM eps e WHERE e.ep = n.entity_id) AS degree
FROM all_nodes n
"""


# nodes + distinct directed edges of the same canonical graph, shared by the
# two whole-graph analytics oracles below
_GRAPH_TOPOLOGY_CTE = _PRELUDE + r"""
, edges_d AS (SELECT DISTINCT s AS src, o AS tgt FROM relk),
allnodes AS (
  SELECT DISTINCT name AS node FROM ents
  UNION
  SELECT src FROM edges_d
  UNION
  SELECT tgt FROM edges_d
)"""


def _pagerank_sql(iters: int = 3, seed_list: str | None = None) -> str:
    """Unrolled fixed-point integer PageRank (stages/graphalg.pagerank):
    all-int64 arithmetic — floor-division contributions, integer sums — so
    the comparison is bit-exact with no float-order caveats at all.
    ``seed_list`` (a SQL tuple literal) switches to the personalized
    variant: initial mass and the teleport base restrict to the seeds."""
    if seed_list is None:
        r0_expr = "1000000::BIGINT"
        base_expr = "150000"
    else:
        r0_expr = f"(CASE WHEN node IN {seed_list} THEN 1000000 ELSE 0 END)::BIGINT"
        base_expr = f"(CASE WHEN n.node IN {seed_list} THEN 150000 ELSE 0 END)"
    sql = _GRAPH_TOPOLOGY_CTE + f""",
outd AS (SELECT src, count(*)::BIGINT AS d FROM edges_d GROUP BY src),
r0 AS (SELECT node, {r0_expr} AS pr FROM allnodes)"""
    for i in range(1, iters + 1):
        sql += f""",
c{i} AS (
  SELECT e.tgt AS node, sum((85 * r.pr) // (100 * o.d))::BIGINT AS c
  FROM edges_d e
  JOIN r{i - 1} r ON r.node = e.src
  JOIN outd o ON o.src = e.src
  GROUP BY e.tgt
),
r{i} AS (
  SELECT n.node, ({base_expr} + COALESCE(c.c, 0))::BIGINT AS pr
  FROM allnodes n LEFT JOIN c{i} c ON c.node = n.node
)"""
    return sql + f"\nSELECT node AS entity_id, pr AS pagerank FROM r{iters}"


def _kcore_sql(k: int = 2, rounds: int = 8) -> str:
    """Unrolled simultaneous (Jacobi) k-core peel
    (stages/graphalg.kcore): each round keeps the edges whose BOTH
    endpoints have degree ≥ k over the previous round's edge set; the
    engine bounds its peel at the same ``rounds``, and extra rounds past
    the fixpoint are no-ops, so the comparison is exact either way.

    Every round CTE is MATERIALIZED: DuckDB inlines CTEs by default, and
    each round references the previous one 3× — inlined, the unrolled
    plan re-evaluates e0 ~5^rounds times and exhausts file handles
    re-scanning the parquet views."""
    sql = _GRAPH_TOPOLOGY_CTE + """,
e0 AS MATERIALIZED (
  SELECT DISTINCT least(src, tgt) AS u, greatest(src, tgt) AS v
  FROM edges_d WHERE src <> tgt
)"""
    for i in range(1, rounds + 1):
        sql += f""",
d{i - 1} AS MATERIALIZED (
  SELECT x, count(*)::BIGINT AS c FROM (
    SELECT u AS x FROM e{i - 1} UNION ALL SELECT v FROM e{i - 1}
  ) GROUP BY x
),
e{i} AS MATERIALIZED (
  SELECT e.u, e.v FROM e{i - 1} e
  JOIN d{i - 1} du ON du.x = e.u
  JOIN d{i - 1} dv ON dv.x = e.v
  WHERE du.c >= {k} AND dv.c >= {k}
)"""
    return sql + f"""
SELECT x AS entity_id, count(*)::BIGINT AS core_degree FROM (
  SELECT u AS x FROM e{rounds} UNION ALL SELECT v FROM e{rounds}
) GROUP BY x"""


_KG_KCORE_SQL = _kcore_sql(2, 8)

_KG_PAGERANK_SQL = _pagerank_sql(3)
# personalized variant seeded with the retrieval path's low-level keywords
_KG_PPR_SQL = _pagerank_sql(3, seed_list="('SPARK','CUSTOMER','VECTOR')")

# per-node triangle counts: undirected simple edges, each triangle credits
# all three corners; enumeration order (id-sorted here, degree-sorted in the
# engine) cannot change the integer counts
_KG_TRIANGLES_SQL = _GRAPH_TOPOLOGY_CTE + r""",
und AS (
  SELECT DISTINCT least(src, tgt) AS u, greatest(src, tgt) AS v
  FROM edges_d WHERE src <> tgt
),
tri AS (
  SELECT e1.u AS a, e1.v AS b, e2.v AS c
  FROM und e1 JOIN und e2 ON e2.u = e1.v
       JOIN und e3 ON e3.u = e1.u AND e3.v = e2.v
),
corners AS (
  SELECT a AS node FROM tri
  UNION ALL SELECT b FROM tri
  UNION ALL SELECT c FROM tri
)
SELECT n.node AS entity_id, coalesce(cnt.c, 0)::BIGINT AS triangles
FROM allnodes n
LEFT JOIN (SELECT node, count(*) AS c FROM corners GROUP BY node) cnt
  ON cnt.node = n.node
"""

# shared-neighbor Jaccard: the wedge self-join counts |N(x)∩N(y)| exactly
# like the engine's per-center pair emission; degrees over the symmetrized
# distinct simple edge set; the ratio is the oracle-stable floor(v·10⁶+0.5)
_KG_NEIGHBOR_JACCARD_SQL = _GRAPH_TOPOLOGY_CTE + r""",
undj AS (
  SELECT DISTINCT least(src, tgt) AS u, greatest(src, tgt) AS v
  FROM edges_d WHERE src <> tgt
),
symj AS (SELECT u AS a, v AS b FROM undj UNION ALL SELECT v, u FROM undj),
degj AS (SELECT a, count(*)::BIGINT AS d FROM symj GROUP BY a),
commonj AS (
  SELECT s1.b AS x, s2.b AS y, count(*)::BIGINT AS c
  FROM symj s1 JOIN symj s2 ON s2.a = s1.a AND s1.b < s2.b
  GROUP BY s1.b, s2.b
)
SELECT c.x AS entity_x, c.y AS entity_y, c.c AS common_neighbors,
       dx.d AS deg_x, dy.d AS deg_y,
       floor(c.c / (dx.d + dy.d - c.c) * 1000000 + 0.5) / 1000000 AS jaccard
FROM commonj c
JOIN degj dx ON dx.a = c.x
JOIN degj dy ON dy.a = c.y
"""

# lift = N·|D(x,y)| / (|D(x)|·|D(y)|), D() = distinct source docs from
# relationship evidence only (= the engine's edge source_ids); op sequence
# matches graphalg.edge_lift.finish exactly: N·xy / (ds·dt) · 1e6 + 0.5,
# floor, /1e6 — one double division, every other term integer-derived.
_KG_EDGE_LIFT_SQL = _PRELUDE + r""",
epairs AS (SELECT DISTINCT s, o, did FROM relk),
exy AS (SELECT s, o, count(*)::BIGINT AS docs_xy FROM epairs GROUP BY s, o),
incl AS (
  SELECT e, count(DISTINCT did)::BIGINT AS docs_e FROM (
    SELECT s AS e, did FROM epairs UNION ALL SELECT o AS e, did FROM epairs
  ) GROUP BY e
)
SELECT x.s AS src, x.o AS tgt, x.docs_xy,
       i1.docs_e AS docs_src, i2.docs_e AS docs_tgt,
       floor((SELECT count(*)::DOUBLE FROM documents) * x.docs_xy::DOUBLE
             / (i1.docs_e::DOUBLE * i2.docs_e::DOUBLE) * 1e6 + 0.5) / 1e6
         AS lift
FROM exy x
JOIN incl i1 ON i1.e = x.s
JOIN incl i2 ON i2.e = x.o
"""

# ---------------------------------------------------------------------------
# alias-resolution (merge_entities) oracles: name-gram candidates ≥ 0.1 →
# min-id component labels → relabel + re-group.  Mirrors the engine's
# graph_to_partials re-entry exactly: merged lists order by (list position,
# text) with duplicate texts keeping their min position; a group with any
# real constituent drops all placeholder content (J3 upgrade-in-place); the
# type vote recounts over relabeled mentions (equal to summing the stored
# tallies); weights/mention counts add.
# ---------------------------------------------------------------------------

_MERGED_CTE = _PRELUDE + r""",
edges_d AS (SELECT DISTINCT s AS src, o AS tgt FROM relk),
allnodes AS (
  SELECT DISTINCT name AS node FROM ents
  UNION SELECT src FROM edges_d
  UNION SELECT tgt FROM edges_d
),
glm AS (SELECT node AS gname,
               generate_series(1, greatest(length(node) - 2, 1)) AS il
        FROM allnodes),
gim AS (SELECT gname, unnest(il) AS i FROM glm),
gramsm AS (SELECT DISTINCT gname, substr(gname, i::INT, 3) AS g FROM gim),
gsizes AS (SELECT gname, count(*)::BIGINT AS n FROM gramsm GROUP BY gname),
candm AS (
  SELECT g1.gname AS a, g2.gname AS b, count(*)::BIGINT AS c
  FROM gramsm g1 JOIN gramsm g2 ON g2.g = g1.g AND g1.gname < g2.gname
  GROUP BY g1.gname, g2.gname
),
accepted AS (
  SELECT p.a, p.b
  FROM candm p
  JOIN gsizes sa ON sa.gname = p.a
  JOIN gsizes sb ON sb.gname = p.b
  WHERE p.c / (sa.n + sb.n - p.c) >= 0.1
),
symp AS (SELECT a AS x, b AS y FROM accepted
         UNION ALL SELECT b, a FROM accepted),
reachm AS (
  WITH RECURSIVE r(src, dst) AS (
    SELECT DISTINCT x, x FROM symp
    UNION
    SELECT r.src, s.y FROM r JOIN symp s ON r.dst = s.x
  )
  SELECT src, min(dst) AS canon FROM r GROUP BY src
),
cmap AS (SELECT src AS name, canon FROM reachm WHERE src <> canon),
node_descs AS (SELECT name, did FROM ents GROUP BY name, did),
nodes_real AS (SELECT e.name, count(*)::BIGINT AS mc FROM ents e
               GROUP BY e.name),
real_dent AS (
  SELECT name, name || ' appears in ' || did AS text,
         row_number() OVER (PARTITION BY name ORDER BY did) AS pos
  FROM node_descs
),
real_sent AS (
  SELECT name, did || '-chunk-0' AS text,
         row_number() OVER (PARTITION BY name ORDER BY did) AS pos
  FROM (SELECT DISTINCT name, did FROM ents)
),
epsm AS (
  SELECT did, s AS ep, descr, occ FROM relk
  UNION ALL
  SELECT did, o AS ep, descr, occ FROM relk
),
ph_epsm AS (SELECT * FROM epsm
            WHERE ep NOT IN (SELECT name FROM nodes_real)),
ph_dent AS (
  SELECT ep AS name, descr AS text,
         row_number() OVER (PARTITION BY ep ORDER BY o) AS pos
  FROM (SELECT ep, descr, min(occ) AS o FROM ph_epsm GROUP BY ep, descr)
),
ph_sent AS (
  SELECT ep AS name, did || '-chunk-0' AS text,
         row_number() OVER (PARTITION BY ep ORDER BY did) AS pos
  FROM (SELECT DISTINCT ep, did FROM ph_epsm)
),
ngroup AS (
  SELECT coalesce(c.canon, n.node) AS cid, n.node AS name
  FROM allnodes n LEFT JOIN cmap c ON c.name = n.node
),
gstat AS (
  SELECT g.cid,
         sum(coalesce(nr.mc, 0))::BIGINT AS mention_count,
         bool_or(nr.mc IS NOT NULL) AS has_real
  FROM ngroup g LEFT JOIN nodes_real nr ON nr.name = g.name
  GROUP BY g.cid
)"""

_KG_MERGED_NODES_SQL = _MERGED_CTE + r""",
votesm AS (
  SELECT coalesce(c.canon, e.name) AS cid, e.typ, count(*)::BIGINT AS v
  FROM ents e LEFT JOIN cmap c ON c.name = e.name
  GROUP BY 1, 2
),
winnerm AS (
  SELECT cid, typ FROM (
    SELECT cid, typ,
           row_number() OVER (PARTITION BY cid
                              ORDER BY v DESC, typ ASC) AS rn
    FROM votesm) WHERE rn = 1
),
-- merge key = (original constituent name, list position): prior occs are
-- unique per (name, pos) so merged entries concatenate constituent lists
-- in name order (engine _prior_occ_entries with row_keys); chr(31) < every
-- name character, so the joined string compares as the tuple
dkeep AS (
  SELECT g.cid, d.text,
         d.name || chr(31) || lpad(d.pos::VARCHAR, 10, '0') AS mk
  FROM ngroup g JOIN gstat s ON s.cid = g.cid
  JOIN real_dent d ON d.name = g.name
  WHERE s.has_real
  UNION ALL
  SELECT g.cid, d.text,
         d.name || chr(31) || lpad(d.pos::VARCHAR, 10, '0') AS mk
  FROM ngroup g JOIN gstat s ON s.cid = g.cid
  JOIN ph_dent d ON d.name = g.name
  WHERE NOT s.has_real
),
dmin AS (SELECT cid, text, min(mk) AS mk FROM dkeep GROUP BY cid, text),
skeep AS (
  SELECT g.cid, d.text,
         d.name || chr(31) || lpad(d.pos::VARCHAR, 10, '0') AS mk
  FROM ngroup g JOIN gstat s ON s.cid = g.cid
  JOIN real_sent d ON d.name = g.name
  WHERE s.has_real
  UNION ALL
  SELECT g.cid, d.text,
         d.name || chr(31) || lpad(d.pos::VARCHAR, 10, '0') AS mk
  FROM ngroup g JOIN gstat s ON s.cid = g.cid
  JOIN ph_sent d ON d.name = g.name
  WHERE NOT s.has_real
),
smin AS (SELECT cid, text, min(mk) AS mk FROM skeep GROUP BY cid, text)
SELECT s.cid AS entity_id,
       coalesce(w.typ, 'UNKNOWN') AS entity_type,
       s.mention_count,
       (SELECT string_agg(text, '<SEP>' ORDER BY mk)
        FROM dmin d WHERE d.cid = s.cid) AS descriptions,
       (SELECT string_agg(text, '<SEP>' ORDER BY mk)
        FROM smin x WHERE x.cid = s.cid) AS source_ids
FROM gstat s LEFT JOIN winnerm w ON w.cid = s.cid
"""

_KG_MERGED_EDGES_SQL = _MERGED_CTE + r""",
edge_aggm AS (
  SELECT s, o,
         sum(CASE WHEN r = 0 THEN 1.0 ELSE 0.5 END)::DOUBLE AS weight,
         count(*)::BIGINT AS mc
  FROM relk GROUP BY s, o
),
edge_dent AS (
  SELECT s, o, descr AS text,
         row_number() OVER (PARTITION BY s, o ORDER BY occ) AS pos
  FROM (SELECT s, o, descr, min(occ) AS occ FROM relk GROUP BY s, o, descr)
),
edge_kent AS (
  SELECT s, o, kw AS text,
         row_number() OVER (PARTITION BY s, o ORDER BY occ) AS pos
  FROM (
    SELECT s, o, kw, min(occ || '|' || j) AS occ FROM (
      SELECT s, o, 'CO_OCCURS' AS kw, 0 AS j, occ FROM relk WHERE r = 0
      UNION ALL
      SELECT s, o, 'ADJACENT', 1, occ FROM relk WHERE r = 0
      UNION ALL
      SELECT s, o, 'NEAR', 0, occ FROM relk WHERE r = 1
    ) GROUP BY s, o, kw)
),
edge_sent AS (
  SELECT s, o, did || '-chunk-0' AS text,
         row_number() OVER (PARTITION BY s, o ORDER BY did) AS pos
  FROM (SELECT DISTINCT s, o, did FROM relk)
),
erel AS (
  SELECT coalesce(cs.canon, e.s) AS src, coalesce(co.canon, e.o) AS tgt,
         e.s, e.o, e.weight, e.mc
  FROM edge_aggm e
  LEFT JOIN cmap cs ON cs.name = e.s
  LEFT JOIN cmap co ON co.name = e.o
),
estat AS (
  SELECT src, tgt, sum(weight)::DOUBLE AS weight,
         sum(mc)::BIGINT AS mention_count
  FROM erel GROUP BY src, tgt
),
-- merge key = (original src, original tgt, list position), the engine's
-- unique prior-occ ordering for relabeled edge rows
edmin AS (
  SELECT er.src, er.tgt, d.text,
         min(er.s || chr(31) || er.o || chr(31) ||
             lpad(d.pos::VARCHAR, 10, '0')) AS mk
  FROM erel er JOIN edge_dent d ON d.s = er.s AND d.o = er.o
  GROUP BY er.src, er.tgt, d.text
),
ekmin AS (
  SELECT er.src, er.tgt, k.text,
         min(er.s || chr(31) || er.o || chr(31) ||
             lpad(k.pos::VARCHAR, 10, '0')) AS mk
  FROM erel er JOIN edge_kent k ON k.s = er.s AND k.o = er.o
  GROUP BY er.src, er.tgt, k.text
),
esmin AS (
  SELECT er.src, er.tgt, x.text,
         min(er.s || chr(31) || er.o || chr(31) ||
             lpad(x.pos::VARCHAR, 10, '0')) AS mk
  FROM erel er JOIN edge_sent x ON x.s = er.s AND x.o = er.o
  GROUP BY er.src, er.tgt, x.text
)
SELECT es.src, es.tgt, es.weight, es.mention_count,
       (SELECT string_agg(text, '<SEP>' ORDER BY mk)
        FROM edmin d WHERE d.src = es.src AND d.tgt = es.tgt) AS descriptions,
       (SELECT string_agg(text, '<SEP>' ORDER BY mk)
        FROM ekmin k WHERE k.src = es.src AND k.tgt = es.tgt) AS keywords,
       (SELECT string_agg(text, '<SEP>' ORDER BY mk)
        FROM esmin x WHERE x.src = es.src AND x.tgt = es.tgt) AS source_ids
FROM estat es
"""


# char-trigram Jaccard between entity names: DISTINCT grams per name
# (whole string when shorter than 3 — greatest(len-2, 1) makes substr
# return it), within-gram self-join counts the intersection, float division
# only at the final ratio (the engine's exact double op sequence)
_ENTITY_NAME_PAIRS_SQL = _GRAPH_TOPOLOGY_CTE + r""",
gl AS (SELECT node AS name,
              generate_series(1, greatest(length(node) - 2, 1)) AS il
       FROM allnodes),
gi AS (SELECT name, unnest(il) AS i FROM gl),
grams AS (SELECT DISTINCT name, substr(name, i::INT, 3) AS g FROM gi),
sizes AS (SELECT name, count(*)::BIGINT AS n FROM grams GROUP BY name),
pairsj AS (
  SELECT g1.name AS a, g2.name AS b, count(*)::BIGINT AS c
  FROM grams g1 JOIN grams g2 ON g2.g = g1.g AND g1.name < g2.name
  GROUP BY g1.name, g2.name
)
SELECT p.a, p.b, p.c / (sa.n + sb.n - p.c) AS jaccard
FROM pairsj p
JOIN sizes sa ON sa.name = p.a
JOIN sizes sb ON sb.name = p.b
"""

# undirected reachability closure → min reachable node = the component's
# min-id label (stages/graphalg.components semantics; same recursive-CTE
# shape as the dedup_clusters oracle)
_KG_COMPONENTS_SQL = _GRAPH_TOPOLOGY_CTE + r""",
edges2 AS (
  SELECT src AS s, tgt AS d FROM edges_d
  UNION ALL SELECT tgt, src FROM edges_d
),
reach AS (
  WITH RECURSIVE r(src, dst) AS (
    SELECT node, node FROM allnodes
    UNION
    SELECT r.src, e.d FROM r JOIN edges2 e ON r.dst = e.s
  )
  SELECT * FROM r
)
SELECT src AS entity_id, min(dst) AS component_id FROM reach GROUP BY src
"""

# mirrors stages/graphalg.hop_distance: bounded-depth BFS from the retrieval
# seeds over the undirected canonical graph; hops = min over paths.  The
# recursive CTE's UNION (set semantics) dedupes (node, d) pairs, and d < 3
# bounds the walk; min(d) per node is the BFS distance.
_KG_SSSP_SQL = _GRAPH_TOPOLOGY_CTE + r""",
ew AS (
  SELECT s AS src, o AS tgt,
         sum(CASE WHEN r = 0 THEN 2 ELSE 1 END)::BIGINT AS w2
  FROM relk GROUP BY s, o
),
undw AS (
  SELECT src AS a, tgt AS b, w2 FROM ew
  UNION ALL SELECT tgt, src, w2 FROM ew
),
walk AS (
  WITH RECURSIVE w(node, c, h) AS (
    SELECT node, 0::BIGINT, 0 FROM allnodes
    WHERE node IN ('SPARK','CUSTOMER','VECTOR')
    UNION
    SELECT e.b, w.c + e.w2, w.h + 1 FROM w JOIN undw e ON w.node = e.a
    WHERE w.h < 3
  )
  SELECT * FROM w
)
SELECT node AS entity_id, min(c)::BIGINT AS dist_half FROM walk GROUP BY node
"""

_KG_HOPS_SQL = _GRAPH_TOPOLOGY_CTE + r""",
edges2 AS (
  SELECT src AS s, tgt AS d FROM edges_d
  UNION ALL SELECT tgt, src FROM edges_d
),
walk AS (
  WITH RECURSIVE w(node, d) AS (
    SELECT node, 0 FROM allnodes
    WHERE node IN ('SPARK','CUSTOMER','VECTOR')
    UNION
    SELECT e.d, w.d + 1 FROM w JOIN edges2 e ON w.node = e.s WHERE w.d < 3
  )
  SELECT * FROM w
)
SELECT node AS entity_id, min(d)::BIGINT AS hops FROM walk GROUP BY node
"""


# ---------------------------------------------------------------------------
# oracle SQL for the retrieval path — built over the same graph the
# kg_nodes/kg_edges oracles define (nested CTEs on the shared prelude)
# ---------------------------------------------------------------------------

_LOW_KW_SQL = "('SPARK','CUSTOMER','VECTOR')"
_HIGH_KW_LIST = "['NEAR']"

_CTX_BASE = f"""
WITH nodes AS ({_NODES_SQL}),
edges AS ({_EDGES_SQL}),
deg AS (
  SELECT entity_id, count(*) AS degree FROM (
    SELECT src AS entity_id FROM edges UNION ALL SELECT tgt FROM edges
  ) GROUP BY entity_id
)
"""

_CTX_LOCAL_ENTITIES_SQL = _CTX_BASE + f"""
, sel AS (
  SELECT n.entity_id, n.entity_type, n.mention_count,
         coalesce(d.degree, 0) AS degree
  FROM nodes n LEFT JOIN deg d USING (entity_id)
  WHERE n.entity_id IN {_LOW_KW_SQL}
)
SELECT row_number() OVER (ORDER BY degree DESC, entity_id ASC)::INTEGER AS rank,
       entity_id, entity_type, degree, mention_count
FROM sel
"""

_CTX_LOCAL_RELATIONSHIPS_SQL = _CTX_BASE + f"""
SELECT row_number() OVER (ORDER BY weight DESC, src ASC, tgt ASC)::INTEGER AS rank,
       src, tgt, weight, mention_count
FROM edges
WHERE src IN {_LOW_KW_SQL} OR tgt IN {_LOW_KW_SQL}
"""

_CTX_LOCAL_SOURCES_SQL = _CTX_BASE + f"""
, refs AS (
  SELECT unnest(string_split(source_ids, '<SEP>')) AS source_id
  FROM nodes WHERE entity_id IN {_LOW_KW_SQL}
),
counts AS (
  SELECT source_id, count(*) AS ref_count FROM refs GROUP BY source_id
)
SELECT row_number() OVER (ORDER BY ref_count DESC, source_id ASC)::INTEGER AS rank,
       source_id, ref_count
FROM counts
"""

_CTX_GLOBAL_EDGES_SQL = _CTX_BASE + f"""
SELECT row_number() OVER (ORDER BY weight DESC, src ASC, tgt ASC)::INTEGER AS rank,
       src, tgt, weight, mention_count
FROM edges
WHERE len(list_intersect(string_split(keywords, '<SEP>'), {_HIGH_KW_LIST})) > 0
"""

_CTX_GLOBAL_ENTITIES_SQL = _CTX_BASE + f"""
, matched AS (
  SELECT * FROM edges
  WHERE len(list_intersect(string_split(keywords, '<SEP>'), {_HIGH_KW_LIST})) > 0
),
eps AS (
  SELECT entity_id, count(*) AS edge_hits FROM (
    SELECT src AS entity_id FROM matched UNION ALL SELECT tgt FROM matched
  ) GROUP BY entity_id
),
sel AS (
  SELECT e.entity_id, coalesce(d.degree, 0) AS degree, e.edge_hits
  FROM eps e LEFT JOIN deg d USING (entity_id)
)
SELECT row_number() OVER (ORDER BY degree DESC, entity_id ASC)::INTEGER AS rank,
       entity_id, degree, edge_hits
FROM sel
"""

# RRF fusion of the two entity rankings (pipelines/query.py fused_entities):
# contributions are INTEGER floor divisions (1000000 // (60 + rank)), so the
# sum is order-independent and matches the Ray side bit-exactly.
_CTX_FUSED_ENTITIES_SQL = _CTX_BASE + f"""
, loc AS (
  SELECT entity_id,
         row_number() OVER (ORDER BY degree DESC, entity_id ASC) AS r
  FROM (SELECT n.entity_id, coalesce(d.degree, 0) AS degree
        FROM nodes n LEFT JOIN deg d USING (entity_id)
        WHERE n.entity_id IN {_LOW_KW_SQL})
),
matched AS (
  SELECT * FROM edges
  WHERE len(list_intersect(string_split(keywords, '<SEP>'), {_HIGH_KW_LIST})) > 0
),
glb AS (
  SELECT entity_id,
         row_number() OVER (ORDER BY degree DESC, entity_id ASC) AS r
  FROM (SELECT e.entity_id, coalesce(d.degree, 0) AS degree
        FROM (SELECT entity_id FROM (
                SELECT src AS entity_id FROM matched
                UNION ALL SELECT tgt FROM matched) GROUP BY entity_id) e
        LEFT JOIN deg d USING (entity_id))
),
contribs AS (
  SELECT entity_id, 1000000 // (60 + r) AS c FROM loc
  UNION ALL
  SELECT entity_id, 1000000 // (60 + r) FROM glb
)
SELECT row_number() OVER (ORDER BY s DESC, entity_id ASC)::INTEGER AS rank,
       entity_id, s::BIGINT AS rrf_score
FROM (SELECT entity_id, sum(c) AS s FROM contribs GROUP BY entity_id)
"""


def queries() -> dict[str, Callable[[str], Any]]:
    return {
        # The first 50 entries ARE the driver's correctness window:
        # curated so every operator FAMILY has at least one value-oracled
        # representative inside it (kg core, graph analytics, dedup incl.
        # span/semantic/distributed-cluster, packing, export, text
        # analysis, retrieval fusion, sampling, LM, scrub, BPE, ANN+PQ,
        # quantize, multimodal, query ctx, span invariant, windows,
        # sessions, asof, funnel, trending, sketches, relational
        # join+cube+rollup, decontam).  Everything after slot 50 is the
        # family tail, still verified by tools/check_oracle.py.
        # r5 rotation (VERDICT r4 #2): seven thrice-driver-green rows
        # (kg_triples, kg_degrees, dedup_exact, text_tfidf, ann_topk,
        # media_features, split_assign) moved to the tail so seven
        # never-driver-verified family mates (ann_topk_lsh/ivf,
        # media_decode, split_leakage_safe, events_retention,
        # session_events_salted, pricing_rollup) earn driver rows.
        "kg_nodes": q_kg_nodes,
        "kg_nodes_deleted": q_kg_nodes_deleted,
        "kg_nodes_updated": q_kg_nodes_updated,
        "kg_diff": q_kg_diff,
        "kg_edges": q_kg_edges,
        "kg_merged_nodes": q_kg_merged_nodes,
        "kg_merged_edges": q_kg_merged_edges,
        "chunks": q_chunks,
        "mentions": q_mentions,
        "kg_pagerank": q_kg_pagerank,
        "kg_components": q_kg_components,
        "entity_name_pairs": q_entity_name_pairs,
        "dedup_minhash_lsh": q_dedup_minhash_lsh,
        "dedup_clusters_dist": q_dedup_clusters_dist,
        "dedup_spans": q_dedup_spans,
        "dedup_semantic": q_dedup_semantic,
        "pack_sequences": q_pack_sequences,
        "shard_manifest": q_shard_manifest,
        "text_postings": q_text_postings,
        "text_stats": q_text_stats,
        "text_bm25": q_text_bm25,
        "hybrid_topk": q_hybrid_topk,
        "corpus_diff": q_corpus_diff,
        "curate": q_curate,
        "split_leakage_safe": q_split_leakage_safe,
        "text_unigram": q_text_unigram,
        "scrub": q_scrub,
        "bpe_pair_counts": q_bpe_pair_counts,
        "ann_radius": q_ann_radius,
        "ann_topk_lsh": q_ann_topk_lsh,
        "ann_topk_ivf": q_ann_topk_ivf,
        "ann_topk_pq": q_ann_topk_pq,
        "embed_quantize": q_embed_quantize,
        "media_decode": q_media_decode,
        "ctx_local_entities": q_ctx_local_entities,
        "ctx_local_sources": q_ctx_local_sources,
        "ctx_fused_entities": q_ctx_fused_entities,
        "span_check": q_span_check,
        "window_tumbling": q_window_tumbling,
        "sessions_salted": q_sessions_salted,
        "session_events_salted": q_session_events_salted,
        "asof_join": q_asof_join,
        "events_funnel": q_events_funnel,
        "events_retention": q_events_retention,
        "events_trending": q_events_trending,
        "events_hll": q_events_hll,
        "top_revenue_orders": q_top_revenue_orders,
        "pricing_cube": q_pricing_cube,
        "pricing_rollup": q_pricing_rollup,
        "decontam_multi": q_decontam_multi,
        # ---- end of driver window ----
        "kg_triples": q_kg_triples,
        "kg_degrees": q_kg_degrees,
        "kg_ppr": q_kg_ppr,
        "kg_hops": q_kg_hops,
        "kg_sssp": q_kg_sssp,
        "kg_triangles": q_kg_triangles,
        "kg_kcore": q_kg_kcore,
        "kg_neighbor_jaccard": q_kg_neighbor_jaccard,
        "kg_edge_lift": q_kg_edge_lift,
        "dedup_exact": q_dedup_exact,
        "dedup_simhash": q_dedup_simhash,
        "dedup_jaccard": q_dedup_jaccard,
        "dedup_embedding": q_dedup_embedding,
        "dedup_clusters": q_dedup_clusters,
        "dedup_keep_best": q_dedup_keep_best,
        "winnow_fp": q_winnow_fp,
        "text_tfidf": q_text_tfidf,
        "text_quality": q_text_quality,
        "text_langid": q_text_langid,
        "text_fingerprint": q_text_fingerprint,
        "hash_sample": q_hash_sample,
        "split_assign": q_split_assign,
        "ann_topk": q_ann_topk,
        "embed_clusters": q_embed_clusters,
        "media_features": q_media_features,
        "ctx_local_relationships": q_ctx_local_relationships,
        "ctx_global_edges": q_ctx_global_edges,
        "ctx_global_entities": q_ctx_global_entities,
        "entity_ann": q_entity_ann,
        "window_distinct": q_window_distinct,
        "window_hopping": q_window_hopping,
        "sessions": q_sessions,
        "range_join": q_range_join,
        "events_running": q_events_running,
        "pricing_summary": q_pricing_summary,
        "events_pivot": q_events_pivot,
        "events_unpivot": q_events_unpivot,
        "revenue_by_nation": q_revenue_by_nation,
        "join_order_lineitem": q_join_order_lineitem,
        "join_order_lineitem_salted": q_join_order_lineitem_salted,
        "orders_with_big_line": q_orders_with_big_line,
        "orders_no_big_line": q_orders_no_big_line,
        "asof_salted": q_asof_salted,
        "session_events": q_session_events,
        "importance_weights": q_importance_weights,
        "quality_buckets": q_quality_buckets,
        "embed_pq_codes": q_embed_pq_codes,
        "top_docs_per_lang": q_top_docs_per_lang,
        "langid_confusion": q_langid_confusion,
        "mix_corpora": q_mix_corpora,
        "text_bigram": q_text_bigram,
        "corpus_top_words": q_corpus_top_words,
        "words_cms": q_words_cms,
        "text_repetition": q_text_repetition,
        "stratified_sample": q_stratified_sample,
        "event_quantiles": q_event_quantiles,
        "decontam": q_decontam,
        "decontam_bloom": q_decontam_bloom,
        "chunks_by_handler": q_chunks_by_handler,
        "chunks_router_default": q_chunks_router_default,
        "chunk_embeddings": q_chunk_embeddings,
        "ann_topk_pq_multi": q_ann_topk_pq_multi,
        "curriculum_pack": q_curriculum_pack,
        "corpus_summary": q_corpus_summary,
        "graph_summary": q_graph_summary,
        "events_summary": q_events_summary,
        "weighted_sample": q_weighted_sample,
        "ann_topk_ivfpq": q_ann_topk_ivfpq,
        "pack_stats": q_pack_stats,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "kg_nodes": _NODES_SQL,
        # the retained-corpus graph: the delete path must equal a full
        # SQL rebuild over documents with doc_id >= 10
        "kg_nodes_deleted": _NODES_SQL.replace(
            "FROM documents", "FROM documents WHERE doc_id >= 10", 1),
        # the spliced corpus: docs 0-9 carry the TEXT of docs 10-19
        "kg_nodes_updated": _NODES_SQL.replace(
            "FROM documents\n)",
            r"""FROM documents WHERE doc_id >= 10
  UNION ALL
  SELECT printf('doc-%09d', doc_id - 10) AS did,
         regexp_extract_all(text, '\S+') AS toks
  FROM documents WHERE doc_id >= 10 AND doc_id < 20
)""", 1),
        "kg_diff": f"""
WITH o_raw AS ({_NODES_SQL}),
n_raw AS ({_NODES_SQL.replace(
    "FROM documents", "FROM documents WHERE doc_id >= 10", 1)}),
o AS (SELECT entity_id, entity_type || '|' || mention_count::VARCHAR
             || '|' || descriptions || '|' || source_ids AS t FROM o_raw),
n AS (SELECT entity_id, entity_type || '|' || mention_count::VARCHAR
             || '|' || descriptions || '|' || source_ids AS t FROM n_raw),
j AS (
  SELECT coalesce(o.entity_id, n.entity_id) AS entity_id,
         CASE WHEN o.entity_id IS NULL THEN 'added'
              WHEN n.entity_id IS NULL THEN 'removed'
              WHEN o.t = n.t THEN 'unchanged' ELSE 'changed' END AS status
  FROM o FULL OUTER JOIN n ON o.entity_id = n.entity_id)
SELECT entity_id, status FROM j WHERE status <> 'unchanged'
""",
        "kg_edges": _EDGES_SQL,
        "kg_triples": _TRIPLES_SQL,
        "kg_merged_nodes": _KG_MERGED_NODES_SQL,
        "kg_merged_edges": _KG_MERGED_EDGES_SQL,
        "chunks": _CHUNKS_SQL,
        "chunks_router_default": _CHUNKS_ROUTER_DEFAULT_SQL,
        "mentions": _MENTIONS_SQL,
        "kg_degrees": _KG_DEGREES_SQL,
        "kg_pagerank": _KG_PAGERANK_SQL,
        "kg_ppr": _KG_PPR_SQL,
        "kg_components": _KG_COMPONENTS_SQL,
        "kg_hops": _KG_HOPS_SQL,
        "kg_sssp": _KG_SSSP_SQL,
        "kg_triangles": _KG_TRIANGLES_SQL,
        "kg_kcore": _KG_KCORE_SQL,
        "kg_neighbor_jaccard": _KG_NEIGHBOR_JACCARD_SQL,
        "kg_edge_lift": _KG_EDGE_LIFT_SQL,
        "entity_name_pairs": _ENTITY_NAME_PAIRS_SQL,
        "dedup_exact": _DEDUP_EXACT_SQL,
        "dedup_minhash_lsh": _DEDUP_MINHASH_SQL,
        "dedup_simhash": _DEDUP_SIMHASH_SQL,
        "dedup_jaccard": _DEDUP_JACCARD_SQL,
        "dedup_embedding": _DEDUP_EMBEDDING_SQL,
        "dedup_clusters": _DEDUP_CLUSTERS_SQL,
        "dedup_keep_best": _DEDUP_KEEP_BEST_SQL,
        "dedup_spans": _DEDUP_SPANS_SQL,
        "winnow_fp": _WINNOW_FP_SQL,
        "dedup_semantic": _DEDUP_SEMANTIC_SQL,
        "pack_sequences": _PACK_SEQUENCES_SQL,
        "curriculum_pack": _CURRICULUM_PACK_SQL,
        "corpus_summary": _CORPUS_SUMMARY_SQL,
        "graph_summary": _GRAPH_SUMMARY_SQL,
        "events_summary": _EVENTS_SUMMARY_SQL,
        "weighted_sample": _WEIGHTED_SAMPLE_SQL,
        "ann_topk_ivfpq": _ANN_TOPK_IVFPQ_SQL,
        "pack_stats": _PACK_STATS_SQL,
        "shard_manifest": _SHARD_MANIFEST_SQL,
        "text_postings": _TEXT_POSTINGS_SQL,
        "text_stats": _TEXT_STATS_SQL,
        "text_quality": _TEXT_QUALITY_SQL,
        "text_langid": _TEXT_LANGID_SQL,
        "text_fingerprint": _TEXT_FINGERPRINT_SQL,
        "text_tfidf": _TEXT_TFIDF_SQL,
        "text_bm25": _TEXT_BM25_SQL,
        "hybrid_topk": _HYBRID_TOPK_SQL,
        "corpus_diff": _CORPUS_DIFF_SQL,
        "curate": _CURATE_SQL,
        "split_assign": _SPLIT_ASSIGN_SQL,
        "hash_sample": _HASH_SAMPLE_SQL,
        "ann_topk": _ANN_TOPK_SQL,
        "ann_topk_lsh": _ANN_TOPK_LSH_SQL,
        "ann_topk_ivf": _ANN_TOPK_IVF_SQL,
        "embed_clusters": _EMBED_CLUSTERS_SQL,
        "media_features": _MEDIA_FEATURES_SQL,
        "media_decode": _MEDIA_DECODE_SQL,
        "split_leakage_safe": _SPLIT_LEAKAGE_SAFE_SQL,
        "span_check": _SPAN_CHECK_SQL,
        "window_distinct": _WINDOW_DISTINCT_SQL,
        "events_hll": _EVENTS_HLL_SQL,
        "window_tumbling": _WINDOW_TUMBLING_SQL,
        "window_hopping": _WINDOW_HOPPING_SQL,
        "sessions": _SESSIONS_SQL,
        "asof_join": _ASOF_JOIN_SQL,
        "range_join": _RANGE_JOIN_SQL,
        "events_running": _EVENTS_RUNNING_SQL,
        "pricing_summary": _PRICING_SUMMARY_SQL,
        "pricing_rollup": _PRICING_ROLLUP_SQL,
        "pricing_cube": _PRICING_CUBE_SQL,
        "events_pivot": _EVENTS_PIVOT_SQL,
        "events_unpivot": _EVENTS_UNPIVOT_SQL,
        "revenue_by_nation": _REVENUE_BY_NATION_SQL,
        "top_revenue_orders": _TOP_REVENUE_ORDERS_SQL,
        "join_order_lineitem": _JOIN_ORDER_LINEITEM_SQL,
        "join_order_lineitem_salted": _JOIN_ORDER_LINEITEM_SQL,
        "orders_with_big_line": _ORDERS_BIG_LINE_SQL,
        "orders_no_big_line": _ORDERS_NO_BIG_LINE_SQL,
        "sessions_salted": _SESSIONS_SQL,
        "asof_salted": _ASOF_JOIN_SQL,
        "events_funnel": _EVENTS_FUNNEL_SQL,
        "events_retention": _EVENTS_RETENTION_SQL,
        "session_events": _SESSION_EVENTS_SQL,
        "session_events_salted": _SESSION_EVENTS_SQL,
        "events_trending": _EVENTS_TRENDING_SQL,
        "ann_radius": _ANN_RADIUS_SQL,
        "text_unigram": _TEXT_UNIGRAM_SQL,
        "importance_weights": _IMPORTANCE_WEIGHTS_SQL,
        "quality_buckets": _QUALITY_BUCKETS_SQL,
        "embed_quantize": _EMBED_QUANTIZE_SQL,
        "embed_pq_codes": _EMBED_PQ_CODES_SQL,
        "ann_topk_pq": _ANN_TOPK_PQ_SQL,
        "ann_topk_pq_multi": _ANN_TOPK_PQ_MULTI_SQL,
        "top_docs_per_lang": _TOP_DOCS_PER_LANG_SQL,
        "langid_confusion": _LANGID_CONFUSION_SQL,
        "mix_corpora": _MIX_CORPORA_SQL,
        "text_bigram": _TEXT_BIGRAM_SQL,
        "corpus_top_words": _CORPUS_TOP_WORDS_SQL,
        "bpe_pair_counts": _BPE_PAIR_COUNTS_SQL,
        "words_cms": _WORDS_CMS_SQL,
        "text_repetition": _TEXT_REPETITION_SQL,
        "stratified_sample": _STRATIFIED_SAMPLE_SQL,
        "event_quantiles": _EVENT_QUANTILES_SQL,
        "decontam": _DECONTAM_SQL,
        "decontam_multi": _DECONTAM_MULTI_SQL,
        "decontam_bloom": _DECONTAM_BLOOM_SQL,
        "scrub": _SCRUB_SQL,
        "dedup_clusters_dist": _DEDUP_CLUSTERS_SQL,
        "ctx_local_entities": _CTX_LOCAL_ENTITIES_SQL,
        "ctx_local_relationships": _CTX_LOCAL_RELATIONSHIPS_SQL,
        "ctx_local_sources": _CTX_LOCAL_SOURCES_SQL,
        "ctx_global_edges": _CTX_GLOBAL_EDGES_SQL,
        "ctx_global_entities": _CTX_GLOBAL_ENTITIES_SQL,
        "ctx_fused_entities": _CTX_FUSED_ENTITIES_SQL,
    }
