"""The flagship pipeline: interleaved documents → knowledge graph.

Dataflow (all lazy, streaming, Arrow-batch):

    read documents → Chunker (actor pool, flat-map)
                   → Extractor (actor pool, mentions with gleaning)
                   → canonicalize (combiner → salted merge → final merge)
                   → DescriptionSummarizer (overflow rows only)
                   → graph table (kind ∈ {node, edge})

``Handler`` mirrors the reference's DocumentHandler surface
(reference insert.go:21-46, handler/default.go:15-47): chunk sizes, glean
count, summaries cap, per-stage concurrency — plus our engine knobs
(tokenizer, rule set, salt buckets).

``run_kg`` is the checkpointed entry: the narrow expensive stages run per
input shard with manifests (state/manifest.py) so a killed run resumes by
skipping completed shards; the wide canonicalize shuffle re-runs over the
checkpointed mentions (pure + cheap relative to extraction).
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

import pyarrow.compute as pc
import ray.data

from ..sources import io as table_io
from ..stages.canonicalize import (
    _merge_and_finalize,
    canonicalize,
    combine_mentions,
)
from ..stages.chunker import Chunker, ChunkerConfig
from ..stages.extractor import Extractor
from ..stages.summarize import (
    DEFAULT_MAX_SUMMARIES_TOKEN_LENGTH,
    ChatSummarizer,
    DescriptionSummarizer,
)
from ..state import manifest as mf


@dataclass
class Handler:
    """Pipeline configuration (the reference's DocumentHandler, as data)."""

    chunk_max_tokens: int = 1024          # reference handler/default.go:41
    chunk_overlap_tokens: int = 128       # reference handler/default.go:42
    tokenizer: str = "regex"
    rules: str = "pattern"                # extraction rule set
    glean_count: int = 1
    max_summaries_token_length: int = DEFAULT_MAX_SUMMARIES_TOKEN_LENGTH
    # Chat(messages) -> str seam for LLM summaries (reference T4,
    # insert.go:692-723); None keeps the deterministic summarizer
    summarize_chat_fn: object | None = None
    salt_buckets: int = 8
    # first-K-by-occurrence cap on accumulated desc/keyword/source lists
    # during canonicalization (0 = exact; see canonicalize.merge_cap) —
    # bounds hot-key row width at scale; the summarizer's token cap is the
    # user-visible bound, this keeps the shuffle from paying for rows the
    # summarizer would drop anyway
    merge_cap: int = 512
    content_mode: str = "spans"           # "spans" | "text" (flat table)
    # canonicalize merge execution: "sorted" (one exchange, segment merge)
    # or "groupby" (two grouped exchanges) — equivalent output, measured
    # winner depends on key cardinality vs corpus volume (BASELINE.md)
    canonicalize_strategy: str = "sorted"
    doc_id_format: str = "{}"
    # physical knobs — autoscaling (min, max) actor pools: a FIXED pool of
    # size k on a node with ~k CPUs starves the upstream read tasks of CPU
    # and deadlocks the stream; min=1 always leaves headroom.  None → size
    # the max to the cluster at pipeline-build time (_pool below), so the
    # same Handler scales from 8 to 32+ CPUs without retuning.
    chunker_concurrency: int | tuple[int, int] | None = None
    extractor_concurrency: int | tuple[int, int] | None = None
    batch_size: int = 256                 # documents per chunker batch
    # mentions per COMBINER task (map_batches bundles upstream blocks to
    # this size).  This is the merge_cap compression window: the combiner
    # caps each key's occurrence lists PER BATCH, so shipped bytes through
    # the merge exchange ≈ (#batches × keys × cap), not the raw mention
    # volume.  Fine-grained upstream blocks (the chunk/extract granularity
    # fix) made 65536-row bundles ~2 blocks wide and the cap never fired —
    # the r3 scale leg shipped all 4.7 GB of occurrences through the sort
    # (423 s).  1M-row bundles restore ~12× pre-shuffle compression while
    # still yielding ≥ cluster-CPU tasks at ≥32M mentions.
    mention_batch_size: int = 1 << 20
    # fused flagship path: chunk → extract → combine inside ONE actor call,
    # so raw chunk and mention rows never round-trip the object store (the
    # unfused pipeline ships ~33 mention rows per doc — strings — between
    # three unfused operators; at 12M docs that is tens of GB of store
    # traffic the combiner immediately compresses away).  Output is
    # bit-identical: combine/merge are associative over global occurrence
    # keys, so batching boundaries cannot change the result (equivalence
    # tested).  The DEFAULT flagship path (measured at 12M docs / 32 cpus:
    # 130.6 s fused vs 162.1 s unfused, work-cpu 2760 vs 3713 — the
    # interchange was pure bandwidth demand).  The staged/checkpointed
    # path (run_kg) materializes chunks and mentions on purpose and does
    # not route through it.
    fused: bool = True
    # documents per fused call — sized so mentions-per-combine stays near
    # mention_batch_size (the merge_cap compression window; small windows
    # never fire the cap and ship every occurrence through the sort).
    # Measured bracket at 12M docs / 32 cpus: 16k = 156 s, 32k = 136 s,
    # 64k = 131 s; at 8 cpus 64k = 329 s vs 16k = 364 s — big batches win
    # once the task count clears ~4× the actor pool.
    fused_batch_docs: int = 1 << 16
    extra: dict = field(default_factory=dict)


def _fused_pool(configured) -> tuple[int, int]:
    from ..pool import auto_pool

    # r3 measured a 24-actor/node bandwidth saturation wall for this
    # stage; the r4 occ-byte cut (canonicalize._lp_digits) halved the
    # stage's string traffic and moved the wall past the core count —
    # re-measured bracket at 12M docs / 32 cpus: 24 actors = 82.5 s
    # (work 1728), 28 = 80.6 s (1780), 32 = 70.7 s (1720); at 8 cpus
    # 8 actors = 185.7 s vs 7 = 205.0 s.  Full width now wins at every
    # point with FLAT work-cpu, so the default is frac 1.0 with a
    # 32/node cap; autoscaling (hi//2, hi) keeps read tasks scheduled
    # (the round-1 fixed-pool deadlock rule).
    frac = float(os.environ.get("GRAFT_FUSED_POOL_FRAC", "1.0"))
    cap = int(os.environ.get("GRAFT_FUSED_POOL_CAP", "32"))
    return auto_pool(configured, frac, per_node_cap=cap)


def _pool(configured, frac: float) -> tuple[int, int]:
    """Autoscaling pool bounds: max = frac × cluster CPUs (≥2), leaving the
    remaining cores for upstream read/shuffle tasks; min pre-warms half the
    pool.  Shared logic lives in ``go_light_rag_ray.pool.auto_pool`` (the
    ANN/dedup/encode stages size themselves the same way)."""
    from ..pool import auto_pool

    return auto_pool(configured, frac)


def _chunker_cfg(handler: Handler) -> ChunkerConfig:
    return ChunkerConfig(
        max_tokens=handler.chunk_max_tokens,
        overlap_tokens=handler.chunk_overlap_tokens,
        tokenizer=handler.tokenizer,
        content_mode=handler.content_mode,
        doc_id_format=handler.doc_id_format,
    )


def chunk_documents(docs: ray.data.Dataset, handler: Handler) -> ray.data.Dataset:
    cfg = _chunker_cfg(handler)
    return docs.map_batches(
        Chunker,
        fn_constructor_kwargs={"config": cfg},
        batch_format="pyarrow",
        batch_size=handler.batch_size,
        # chunking is ~3x the extractor's CPU (233 vs 81 cpu-s per 1M
        # docs, measured r3) — give it the larger pool share
        concurrency=_pool(handler.chunker_concurrency, 0.5),
    )


def extract_mentions(chunks: ray.data.Dataset, handler: Handler) -> ray.data.Dataset:
    return chunks.map_batches(
        Extractor,
        fn_constructor_kwargs={"rules": handler.rules, "glean_count": handler.glean_count},
        batch_format="pyarrow",
        batch_size=handler.batch_size,
        concurrency=_pool(handler.extractor_concurrency, 0.25),
    )


def build_graph(mentions: ray.data.Dataset, handler: Handler) -> ray.data.Dataset:
    graph = canonicalize(
        mentions,
        salt_buckets=handler.salt_buckets,
        batch_size=handler.mention_batch_size,
        merge_cap=handler.merge_cap,
        strategy=handler.canonicalize_strategy,
    )
    return _summarize_stage(graph, handler)


def _summarize_stage(graph: ray.data.Dataset, handler: Handler) -> ray.data.Dataset:
    if handler.max_summaries_token_length <= 0:
        return graph
    kwargs = {"max_tokens": handler.max_summaries_token_length,
              "tokenizer": handler.tokenizer}
    cls = DescriptionSummarizer
    if handler.summarize_chat_fn is not None:
        cls = ChatSummarizer
        kwargs["chat_fn"] = handler.summarize_chat_fn
    return graph.map_batches(
        cls, fn_constructor_kwargs=kwargs, batch_format="pyarrow",
        concurrency=(1, 2),
    )


class FusedExtractCombine:
    """chunk → extract → combine inside ONE actor call.

    The unfused flagship ships every chunk row and every raw mention row
    (~33 string rows per doc) through the object store between three
    operators Ray Data cannot fuse (distinct actor pools / task pools),
    then the combiner compresses them to a few partial rows per key.  At
    12M docs that interchange is tens of GB of store write+read — pure
    memory-bandwidth demand on data that never survives the next stage.
    Fusing chains the same three kernels over the same batches in-heap, so
    the only store traffic the narrow phase produces is combiner partials.

    Correctness: stage-A partials merge associatively over global
    occurrence keys ``(doc_id, order_index, mention_index)``, so the
    different batching boundary (docs-per-call instead of
    mentions-per-bundle) cannot change the merged graph — equivalence is
    asserted row-for-row in test_fused.  The combiner's bandwidth-width
    cap (canonicalize._combine_width) is inherently respected: the
    hash-aggregate is ~1/3 of each fused task's wall, so expected
    concurrent combines ≈ pool/3, under the measured 8-per-node wall.
    """

    def __init__(self, config: ChunkerConfig, rules: str, glean_count: int,
                 salt_buckets: int, merge_cap: int) -> None:
        self._chunk = Chunker(config=config)
        self._extract = Extractor(rules=rules, glean_count=glean_count)
        self._salt = salt_buckets
        self._cap = merge_cap
        # closed-vocabulary rule sets skip the mention-table round trip
        # entirely (stages/wc_fused.py: extract+combine in the packed-int
        # domain, strings built only for surviving entries) — partial-row
        # identical to the generic path, asserted in test_fused
        self._deep = rules == "word_cooccurrence"
        self._glean = glean_count > 0

    def __call__(self, batch):
        chunks = self._chunk(batch)
        if self._deep:
            from ..stages.wc_fused import word_cooccurrence_partials

            return word_cooccurrence_partials(
                chunks, self._salt, self._cap, glean=self._glean)
        return combine_mentions(self._extract(chunks), self._salt, self._cap)


def fused_partials(docs: ray.data.Dataset, handler: Handler) -> ray.data.Dataset:
    """documents → combiner partials via the fused actor stage."""
    return docs.map_batches(
        FusedExtractCombine,
        fn_constructor_kwargs={
            "config": _chunker_cfg(handler),
            "rules": handler.rules,
            "glean_count": handler.glean_count,
            "salt_buckets": handler.salt_buckets,
            "merge_cap": handler.merge_cap,
        },
        batch_format="pyarrow",
        batch_size=handler.fused_batch_docs,
        # the fused stage is the ONLY heavy phase (no downstream combiner
        # tasks competing for cores), so it takes 0.9 of the cores, capped
        # at 24 actors per node — the measured memory-bandwidth saturation
        # of the fused kernel chain (see pool.auto_pool's numbers); (1, N)
        # autoscaling keeps read tasks alive (the round-1 deadlock rule).
        # GRAFT_FUSED_POOL_FRAC is the A/B probe knob.
        concurrency=_fused_pool(handler.chunker_concurrency),
    )


def kg_pipeline(docs: ray.data.Dataset, handler: Handler) -> ray.data.Dataset:
    """documents → graph, fully lazy (no checkpoint)."""
    if handler.fused:
        graph = _merge_and_finalize(
            fused_partials(docs, handler), handler.salt_buckets,
            handler.merge_cap, handler.canonicalize_strategy)
        return _summarize_stage(graph, handler)
    return build_graph(extract_mentions(chunk_documents(docs, handler), handler), handler)


def kg_pipeline_incremental(
    docs: ray.data.Dataset, prior_graph: ray.data.Dataset, handler: Handler
) -> ray.data.Dataset:
    """Incremental insert: new documents merged into a prior graph snapshot
    (the reference's re-run-Insert upsert path, insert.go:499-623) as one
    shuffle — snapshot rows re-enter as partials, no per-key lookups.
    For ordered corpus splits this is exactly associative:
    ``incremental(graph(part1), part2) == graph(part1 ∪ part2)``.

    For documents whose ids interleave EXISTING ones use
    ``insert_documents`` (affected-key rebuild replaying real occ keys)
    — prior re-entry here sorts before all new occurrences, so only
    tail appends reproduce the one-shot merge order exactly.
    """
    from ..stages.canonicalize import canonicalize_incremental

    if handler.fused:
        new_side = fused_partials(docs, handler)
    else:
        new_side = extract_mentions(chunk_documents(docs, handler), handler)
    graph = canonicalize_incremental(
        new_side,
        prior_graph,
        salt_buckets=handler.salt_buckets,
        batch_size=handler.mention_batch_size,
        merge_cap=handler.merge_cap,
        pre_combined=handler.fused,
    )
    return _summarize_stage(graph, handler)


def delete_documents(
    prior_graph: ray.data.Dataset,
    mentions: ray.data.Dataset,
    doc_ids: list[str],
    handler: Handler,
    new_mentions: ray.data.Dataset | None = None,
) -> ray.data.Dataset:
    """Incremental DELETE — one pruned, shuffle-free scan of the mention
    stream + O(affected keys) of real rebuild work; the corpus itself is
    never re-chunked, re-extracted, or re-shuffled.

    The snapshot alone cannot be subtracted (merge_cap drops history;
    occ keys are not stored per list item), but canonicalization is a
    pure per-key function of its mention multiset (the determinism
    invariant test_properties proves), so removing documents only
    changes the keys those documents touched:

    1. the deleted docs' mentions name the AFFECTED keys — their entity
       names (node keys), their (src, tgt) pairs (edge keys), and those
       pairs' endpoints (placeholder contributions).  A delete batch is
       small by assumption, so the key set collects to the driver and
       broadcasts (the decontam/ANN small-side idiom);
    2. the retained mention stream filters to rows touching an affected
       key — entity name in the node set; relationship pair in the pair
       set OR an endpoint in the node set (such edges feed placeholder
       partials even when their own pair is unaffected);
    3. ONE canonicalize over that slice rebuilds the affected keys from
       scratch; by-product rows for unaffected keys (step 2's endpoint
       rule emits their edges; placeholder nodes of retained endpoints)
       are dropped;
    4. result = prior rows of unaffected keys ∪ rebuilt affected rows.

    Row-for-row equal to the full rebuild over the retained corpus
    (test_delete), for the cost of the affected slice.  ``mentions`` is
    the corpus mention stream (persisted by staged ingest, or recomputed
    deterministically via extract_mentions(chunk_documents(...))).

    ``new_mentions`` turns the delete into an UPDATE: replacement
    documents' mentions join the rebuild — their keys enter the affected
    set and their rows union into the relevant slice, so
    ``update == full rebuild over (corpus ∖ old) ∪ new`` exactly, even
    for middle-of-corpus replacements (the rebuild replays REAL occ
    keys; incremental insert alone cannot do this, its prior re-entry
    sorts before ALL new occurrences).  See ``update_documents``."""
    import pyarrow as pa
    import ray

    from ..stages.canonicalize import canonicalize

    del_arr = pa.array(sorted(set(doc_ids)), pa.string())

    def _pairkey(src, tgt):
        return pc.binary_join_element_wise(src, tgt, "\x00")

    node_set: set[str] = set()
    pair_set: set[str] = set()

    def _distinct_keys(b: pa.Table) -> pa.Table:
        """Mention rows → DISTINCT affected keys, inside the dataset.

        The driver only ever receives unique (type, key) rows per batch —
        never raw mention rows (a 1% delete at 10M docs is 3.3M mention
        rows but only vocabulary-many distinct keys; collecting the rows
        cost ~1.1 GB driver RSS in the r5 probe)."""
        is_ent = pc.equal(b.column("kind"), "entity")
        ent = b.filter(is_ent)
        rel = b.filter(pc.invert(is_ent))
        src = rel.column("src").combine_chunks()
        tgt = rel.column("tgt").combine_chunks()
        nodes = pc.unique(pa.concat_arrays(
            [ent.column("name").combine_chunks(), src, tgt]))
        pairs = pc.unique(_pairkey(src, tgt))
        return pa.table({
            "t": pa.array(["n"] * len(nodes) + ["p"] * len(pairs),
                          pa.string()),
            "k": pa.concat_arrays([nodes, pairs]),
        })

    def _gather_keys(ds: ray.data.Dataset) -> None:
        for r in ds.map_batches(
                _distinct_keys, batch_format="pyarrow").take_all():
            (node_set if r["t"] == "n" else pair_set).add(r["k"])

    if len(del_arr):                # pure inserts skip the retraction scan
        _gather_keys(mentions.map_batches(
            lambda b: b.filter(
                pc.is_in(b.column("doc_id"), value_set=del_arr)),
            batch_format="pyarrow",
        ).select_columns(["kind", "name", "src", "tgt"]))
    if new_mentions is not None:    # bounded: the update batch's keys
        _gather_keys(new_mentions.select_columns(
            ["kind", "name", "src", "tgt"]))
    if not node_set and not pair_set:
        return prior_graph
    sets_ref = ray.put((pa.array(sorted(node_set), pa.string()),
                        pa.array(sorted(pair_set), pa.string())))

    def relevant(b: pa.Table) -> pa.Table:
        nodes, pairs = ray.get(sets_ref)
        keep_doc = pc.invert(pc.is_in(b.column("doc_id"),
                                      value_set=del_arr))
        is_ent = pc.equal(b.column("kind"), "entity")
        ent_hit = pc.and_(is_ent, pc.is_in(b.column("name"),
                                           value_set=nodes))
        pk = _pairkey(b.column("src"), b.column("tgt"))
        rel_hit = pc.and_(
            pc.invert(is_ent),
            pc.or_(pc.is_in(pk, value_set=pairs),
                   pc.or_(pc.is_in(b.column("src"), value_set=nodes),
                          pc.is_in(b.column("tgt"), value_set=nodes))))
        return b.filter(pc.and_(keep_doc, pc.or_(ent_hit, rel_hit)))

    relevant_stream = mentions.map_batches(relevant,
                                           batch_format="pyarrow")
    if new_mentions is not None:
        # every new-mention key is in the affected set by construction,
        # so the whole new side joins the rebuild
        relevant_stream = relevant_stream.union(new_mentions)
    rebuilt = canonicalize(
        relevant_stream,
        salt_buckets=handler.salt_buckets,
        batch_size=handler.mention_batch_size,
        merge_cap=handler.merge_cap,
        strategy=handler.canonicalize_strategy,
    )

    def affected_only(b: pa.Table) -> pa.Table:
        nodes, pairs = ray.get(sets_ref)
        is_node = pc.equal(b.column("kind"), "node")
        keep = pc.if_else(
            is_node,
            pc.is_in(b.column("entity_id"), value_set=nodes),
            pc.is_in(_pairkey(b.column("src"), b.column("tgt")),
                     value_set=pairs))
        return b.filter(keep)

    def unaffected_only(b: pa.Table) -> pa.Table:
        nodes, pairs = ray.get(sets_ref)
        is_node = pc.equal(b.column("kind"), "node")
        drop = pc.if_else(
            is_node,
            pc.is_in(b.column("entity_id"), value_set=nodes),
            pc.is_in(_pairkey(b.column("src"), b.column("tgt")),
                     value_set=pairs))
        return b.filter(pc.invert(drop))

    rebuilt = _summarize_stage(
        rebuilt.map_batches(affected_only, batch_format="pyarrow"), handler)
    kept = prior_graph.map_batches(unaffected_only, batch_format="pyarrow")
    return kept.union(rebuilt)


def update_documents(
    prior_graph: ray.data.Dataset,
    mentions: ray.data.Dataset,
    new_docs: ray.data.Dataset,
    handler: Handler,
) -> ray.data.Dataset:
    """Incremental UPDATE: replace documents in place — the delete path
    with the replacements' mentions joining the affected-key rebuild.
    Exact for ANY position in the corpus (update == full rebuild over
    (corpus ∖ old) ∪ new, test_delete), which incremental insert alone
    cannot achieve: its prior-snapshot re-entry sorts before all new
    occurrences, so only tail appends replay the one-shot merge order.
    The documents' ids identify what is being replaced (the corpus
    primary key); ``new_docs`` carries the replacement rows under the
    SAME ids."""
    new_mentions = extract_mentions(
        chunk_documents(new_docs, handler), handler).materialize()
    # ids from the DOCUMENT rows, not the mentions: a replacement doc
    # with zero mentions must still retract its old version.  Integer
    # ids (flat corpora) format exactly as the chunker does, so they
    # match the mention stream's string ids
    raw_ids = {r["doc_id"] for r in new_docs.select_columns(
        ["doc_id"]).take_all()}
    doc_ids = sorted(
        x if isinstance(x, str) else handler.doc_id_format.format(x)
        for x in raw_ids)
    return delete_documents(prior_graph, mentions, doc_ids, handler,
                            new_mentions=new_mentions)


def insert_documents(
    prior_graph: ray.data.Dataset,
    mentions: ray.data.Dataset,
    new_docs: ray.data.Dataset,
    handler: Handler,
) -> ray.data.Dataset:
    """Position-independent incremental INSERT: the affected-key rebuild
    with an EMPTY delete set.

    ``kg_pipeline_incremental`` (snapshot rows re-enter as partials) is
    exact only for ordered splits — prior re-entry sorts before ALL new
    occurrences, so a document inserted mid-corpus would merge its
    descriptions/keywords in the wrong order vs a full rebuild.  This
    path instead rebuilds ONLY the keys the new documents touch, from
    retained + new mentions replaying their REAL occ keys
    ``(doc_id, order_index, mention_index)``, so it equals the full
    rebuild over ``corpus ∪ new`` row-for-row at ANY insert position
    (test_incremental middle-of-corpus case).

    Cost: one pruned scan of the corpus mention stream + canonicalize
    over the affected slice — prefer ``kg_pipeline_incremental`` for
    tail appends (no corpus scan); use this when new doc ids interleave
    existing ones.  ``mentions`` is the corpus mention stream (persisted
    by staged ingest or recomputed deterministically)."""
    new_mentions = extract_mentions(
        chunk_documents(new_docs, handler), handler).materialize()
    return delete_documents(prior_graph, mentions, [], handler,
                            new_mentions=new_mentions)


def nodes_view(graph: ray.data.Dataset) -> ray.data.Dataset:
    return graph.filter(expr="kind == 'node'").select_columns(
        ["entity_id", "entity_type", "descriptions", "source_ids", "mention_count"]
    )


def edges_view(graph: ray.data.Dataset) -> ray.data.Dataset:
    return graph.filter(expr="kind == 'edge'").select_columns(
        ["src", "tgt", "weight", "descriptions", "keywords", "source_ids", "mention_count"]
    )


def triples_view(graph: ray.data.Dataset) -> ray.data.Dataset:
    """Parity view: (subj, pred, obj); pred = first keyword in canonical order."""

    def to_triples(batch):
        batch = batch.filter(pc.equal(batch.column("kind"), "edge"))
        kws = batch.column("keywords")
        pred = pc.list_element(kws, 0) if len(batch) else kws.combine_chunks()
        import pyarrow as pa

        return pa.Table.from_pydict(
            {
                "subj": batch.column("src").to_pylist(),
                "pred": pred.to_pylist() if len(batch) else [],
                "obj": batch.column("tgt").to_pylist(),
            },
            schema=pa.schema([("subj", pa.string()), ("pred", pa.string()), ("obj", pa.string())]),
        )

    return graph.map_batches(to_triples, batch_format="pyarrow")


def ingest_prechunked(
    content_chunks: ray.data.Dataset, handler: Handler
) -> ray.data.Dataset:
    """Externally pre-chunked content → graph (reference ``InsertChunks``,
    insert.go:67-100, over the richer ContentChunk provenance schema,
    rag.go:138-159).

    Accepts rows shaped ``(id, content_id, chunk_index, text, ...)`` —
    extra provenance columns (text_hash, offsets, origin) pass through
    untouched upstream and are simply not consumed here.  The rows are
    adapted to the engine's chunk schema (content_id → doc_id, chunk_index
    → order_index; chunk ids keep the external id so source_ids in the
    graph reference the caller's identifiers), then flow through the same
    extract → canonicalize path as internally-chunked documents.
    """
    import pyarrow as pa

    from ..tokenizer import get_tokenizer

    tok = get_tokenizer(handler.tokenizer)

    def adapt(b: pa.Table) -> pa.Table:
        from ..schemas import CHUNKS_SCHEMA

        ids = b.column("id").to_pylist()
        content_ids = b.column("content_id").to_pylist()
        idxs = b.column("chunk_index").to_pylist()
        texts = b.column("text").to_pylist()
        return pa.Table.from_pydict(
            {
                "chunk_id": [str(i) for i in ids],
                "doc_id": [str(c) for c in content_ids],
                "order_index": [int(i) for i in idxs],
                "content": [t or "" for t in texts],
                "token_size": [tok.count(t or "") for t in texts],
            },
            schema=CHUNKS_SCHEMA,
        )

    chunks = content_chunks.map_batches(adapt, batch_format="pyarrow")
    return build_graph(extract_mentions(chunks, handler), handler)


def stage_chunks(
    input_path: str,
    ckpt_dir: str,
    handler: Handler,
    n_shards: int = 4,
    flat_adapter: bool = False,
) -> list[str]:
    """Phase 1 of the staged two-phase ingest (reference ``InsertChunk``,
    insert.go:102-140): chunk documents and persist the chunks WITHOUT
    running extraction.  Each input shard writes
    ``<ckpt>/chunks/shard=<id>/`` plus a manifest; the manifest set IS the
    reference's ``unprocessed`` queue — a staged shard without a matching
    ``processed`` marker is pending.  Returns the staged shard ids.
    """
    fragments = table_io.list_input_fragments(input_path)
    shards = mf.plan_shards(fragments, n_shards)
    staged = []
    for shard_id in mf.pending_shards(ckpt_dir, shards, stage="staged"):
        frags = shards[shard_id]
        docs = table_io.read_documents(frags)
        if flat_adapter:
            docs = docs.map_batches(
                table_io.flat_documents_as_interleaved, batch_format="pyarrow"
            )
        chunks = chunk_documents(docs, handler)
        out = mf.shard_out_dir(ckpt_dir, "chunks", shard_id)
        chunks.write_parquet(out)
        mf.write_manifest(
            ckpt_dir,
            mf.ShardManifest(
                shard_id=shard_id,
                input_fragments=frags,
                fingerprint=mf.shard_fingerprint(frags),
                counters={"fragments": len(frags)},
            ),
            stage="staged",
        )
        staged.append(shard_id)
    return staged


def process_staged(ckpt_dir: str, handler: Handler) -> ray.data.Dataset:
    """Phase 2 (reference ``ProcessUnprocessedChunk``, insert.go:142-171):
    extract + canonicalize over every staged chunk shard.  The doc id is a
    carried column — no parsing it back out of the chunk id (the
    reference's ``"-chunk-"`` split, insert.go:156-162, is the latent-bug
    path our schema design removes)."""
    chunks = ray.data.read_parquet(os.path.join(ckpt_dir, "chunks"))
    return build_graph(extract_mentions(chunks, handler), handler)


def write_graph(
    graph: ray.data.Dataset,
    out_dir: str,
    num_buckets: int = 16,
    lineage: dict | None = None,
) -> dict:
    """Materialize the graph into partitioned node/edge tables + manifest
    (reference S6/S7 sinks, kuzu.go:203-252 / neo.go:193-249, re-expressed
    as table writes).

    Layout (resumable — a directory per hash bucket, never one giant file)::

        <out_dir>/nodes/bucket=<h>/*.parquet    keyed on entity_id
        <out_dir>/edges/bucket=<h>/*.parquet    keyed on (src, tgt)
        <out_dir>/GRAPH-MANIFEST.json           lineage + counter metrics

    The bucket is a crc32 of the natural key, so point lookups and
    incremental re-writes touch one bucket, and a re-run overwrites
    partition directories idempotently.  Returns the manifest dict.
    """
    import json

    import pyarrow as pa

    def bucketize(key_cols):
        def f(b: pa.Table) -> pa.Table:
            import numpy as np
            import pyarrow.compute as pc

            from ..hashutil import crc32_vec

            joined = (b.column(key_cols[0]) if len(key_cols) == 1 else
                      pc.binary_join_element_wise(
                          *(pc.cast(b.column(c), pa.string())
                            for c in key_cols), "|"))
            buckets = (crc32_vec(joined) % num_buckets).astype(np.int32)
            return b.append_column("bucket", pa.array(buckets, pa.int32()))
        return f

    nodes = nodes_view(graph).map_batches(
        bucketize(["entity_id"]), batch_format="pyarrow"
    )
    edges = edges_view(graph).map_batches(
        bucketize(["src", "tgt"]), batch_format="pyarrow"
    )
    # idempotent overwrite: parquet writes append into existing dirs, so a
    # re-run must clear the table dirs first (the manifest is only replaced
    # after both writes land, so a killed re-run is detectable)
    import shutil

    for sub in ("nodes", "edges"):
        shutil.rmtree(os.path.join(out_dir, sub), ignore_errors=True)
    table_io.write_table(nodes, os.path.join(out_dir, "nodes"),
                         partition_cols=["bucket"])
    table_io.write_table(edges, os.path.join(out_dir, "edges"),
                         partition_cols=["bucket"])

    n_nodes = ray.data.read_parquet(os.path.join(out_dir, "nodes")).count()
    n_edges = ray.data.read_parquet(os.path.join(out_dir, "edges")).count()
    manifest = {
        "lineage": lineage or {},
        "code_version": mf.CODE_VERSION,
        "num_buckets": num_buckets,
        "counters": {"nodes": n_nodes, "edges": n_edges},
    }
    tmp = os.path.join(out_dir, ".GRAPH-MANIFEST.tmp")
    with open(tmp, "w") as f:
        json.dump(manifest, f, indent=1)
    os.replace(tmp, os.path.join(out_dir, "GRAPH-MANIFEST.json"))
    return manifest


def read_graph(out_dir: str) -> tuple[ray.data.Dataset, ray.data.Dataset]:
    """Read back a materialized graph: (nodes, edges) Datasets."""
    return (
        ray.data.read_parquet(os.path.join(out_dir, "nodes")),
        ray.data.read_parquet(os.path.join(out_dir, "edges")),
    )


def run_kg(
    input_path: str,
    ckpt_dir: str,
    handler: Handler,
    n_shards: int = 4,
    flat_adapter: bool = False,
) -> ray.data.Dataset:
    """Checkpointed end-to-end run; returns the (lazy) graph dataset.

    Narrow stages are executed per input shard with manifests; on resume
    only pending shards are recomputed.  The aggregate reads the mentions
    checkpoint (a much smaller table than the input).
    """
    fragments = table_io.list_input_fragments(input_path)
    shards = mf.plan_shards(fragments, n_shards)
    for shard_id in mf.pending_shards(ckpt_dir, shards):
        frags = shards[shard_id]
        docs = table_io.read_documents(frags)
        if flat_adapter:
            docs = docs.map_batches(
                table_io.flat_documents_as_interleaved, batch_format="pyarrow"
            )
        mentions = extract_mentions(chunk_documents(docs, handler), handler)
        out = mf.shard_out_dir(ckpt_dir, "mentions", shard_id)
        mentions.write_parquet(out)
        mf.write_manifest(
            ckpt_dir,
            mf.ShardManifest(
                shard_id=shard_id,
                input_fragments=frags,
                fingerprint=mf.shard_fingerprint(frags),
                counters={"fragments": len(frags)},
            ),
        )
    mentions = ray.data.read_parquet(os.path.join(ckpt_dir, "mentions"))
    return build_graph(mentions, handler)
