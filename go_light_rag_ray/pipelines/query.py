"""Retrieval path: keyword-driven local/global context assembly over the
canonical graph (reference query.go:92-190, SURVEY.md §3.2).

The reference's Query flow is: LLM keyword extraction → vector top-k seed
entities/edges → batch graph lookups (J4/J5) → 1-hop expansion (J6) →
degree (A4) and source-refcount (A5) ranking → CSV context rendering (M12).
Here the same flow is a dataflow over the ``graph`` Dataset:

- keyword extraction is the deterministic rule analog of the LLM call
  (high-level = relationship vocabulary, low-level = entity gazetteer —
  mirroring prompt.go:205-270's high/low split);
- the vector top-k seed is replaced by exact keyword match on entity ids /
  edge keyword lists (the hermetic stand-in, SURVEY.md §7.0);
- degree / refcount are distributed aggregates; the final ranked context is
  tiny (it feeds a prompt), so ranking happens in one ``map_groups`` group
  — the wide work stays distributed, only the ≤k-row tail is single-group.

Ranks are deterministic: (score desc, id asc) — the reference's map-
iteration rank order is nondeterministic in Go (SURVEY.md §2.5 A6); we
define the tie-break.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
import ray.data
import ray.data.aggregate as agg

from ..stages.extractor import WORD_ENTITY_TYPES, WORD_REL_VOCAB

# deterministic keyword-extraction rule (the LLM stand-in): low-level =
# gazetteer entity words, high-level = glean-round relationship keyword
DEFAULT_LOW_LEVEL = ("SPARK", "CUSTOMER", "VECTOR")
DEFAULT_HIGH_LEVEL = ("NEAR",)

# the edge-keyword vocabulary the extractor emits (stages/extractor.py
# word_cooccurrence rules); high-level query words are matched against it
EDGE_KEYWORDS = ("CO_OCCURS", "ADJACENT", "NEAR")


def keyword_extract(
    query_text: str, history: str = ""
) -> tuple[list[str], list[str]]:
    """(query, conversation history) → (high_level, low_level) keywords
    (reference query.go:104-145: the keyword prompt receives BOTH the
    current query and the rendered history, prompt.go:53-59; rule analog).
    Low-level = entity-gazetteer hits; high-level = relationship-vocabulary
    or edge-keyword hits.  Query words rank before history words; order is
    first occurrence, duplicates dropped."""
    words = [w.lower() for w in query_text.split()]
    words += [w.lower() for w in history.split()]
    low: list[str] = []
    high: list[str] = []
    for w in words:
        if w in WORD_ENTITY_TYPES:
            if w.upper() not in low:
                low.append(w.upper())
        elif (w in WORD_REL_VOCAB) or w.upper() in EDGE_KEYWORDS:
            if w.upper() not in high:
                high.append(w.upper())
    return high, low


def keyword_extract_chat(
    chat_fn, query_text: str, history: str = "",
    goal: str = "", examples: tuple = (),
) -> tuple[list[str], list[str]]:
    """LLM-backed keyword extraction through the Chat seam (reference
    query.go:119-145): render the keyword prompt with query + history,
    one chat turn, scrub + parse ``{"high_level_keywords": [...],
    "low_level_keywords": [...]}``."""
    from ..stages.chat import render_keyword_prompt
    from ..stages.llm_io import parse_keyword_response

    prompt = render_keyword_prompt(query_text, history, goal, examples)
    return parse_keyword_response(chat_fn([prompt]))


def _nodes(graph: ray.data.Dataset) -> ray.data.Dataset:
    return graph.filter(expr="kind == 'node'")


def _edges(graph: ray.data.Dataset) -> ray.data.Dataset:
    return graph.filter(expr="kind == 'edge'")


def degrees(graph: ray.data.Dataset) -> ray.data.Dataset:
    """(entity_id, degree): incident edge count, 0-degree nodes included
    (reference A4, neo.go:410-472 OPTIONAL MATCH count)."""

    def unpivot(b: pa.Table) -> pa.Table:
        is_edge = pc.equal(b.column("kind"), "edge")
        edges, nodes = b.filter(is_edge), b.filter(pc.invert(is_edge))
        ent = pa.concat_arrays(
            [nodes.column("entity_id").combine_chunks(),
             edges.column("src").combine_chunks(),
             edges.column("tgt").combine_chunks()]
        )
        inc = pa.concat_arrays(
            [pa.nulls(len(nodes), pa.int64()).fill_null(0),
             pa.nulls(2 * len(edges), pa.int64()).fill_null(1)]
        )
        return pa.Table.from_arrays([ent, inc], names=["entity_id", "inc"])

    return (
        graph.map_batches(unpivot, batch_format="pyarrow")
        .groupby("entity_id")
        .aggregate(agg.Sum("inc", alias_name="degree"))
    )


def _rank_single_group(ds: ray.data.Dataset, sort_keys: list[tuple[str, bool]],
                       out_cols: list[str]) -> ray.data.Dataset:
    """Assign rank 1..n over the (small) context rows: constant-key
    map_groups with a defined multi-column order."""

    def add_key(b: pa.Table) -> pa.Table:
        return b.append_column("_g", pa.nulls(len(b), pa.int32()).fill_null(0))

    def rank(group: pa.Table) -> pa.Table:
        order = [(c, "descending" if desc else "ascending") for c, desc in sort_keys]
        group = group.sort_by(order)
        n = len(group)
        out = group.select(out_cols)
        return out.add_column(0, pa.field("rank", pa.int32()),
                              pa.array(range(1, n + 1), pa.int32()))

    return (
        ds.map_batches(add_key, batch_format="pyarrow")
        .groupby("_g")
        .map_groups(rank, batch_format="pyarrow")
    )



def _filter_isin(ds: ray.data.Dataset, col: str, values: list[str]) -> ray.data.Dataset:
    """Vectorized membership filter (pc.is_in, no per-row Python)."""
    vset = pa.array(sorted(values), pa.string())

    def f(b: pa.Table) -> pa.Table:
        return b.filter(pc.is_in(b.column(col), value_set=vset))

    return ds.map_batches(f, batch_format="pyarrow")


def _filter_list_intersects(ds: ray.data.Dataset, col: str, values: list[str]) -> ray.data.Dataset:
    """Keep rows whose list<string> column intersects ``values``: flatten →
    is_in → any per list (vectorized via list value counts)."""
    vset = pa.array(sorted(values), pa.string())

    def f(b: pa.Table) -> pa.Table:
        lists = b.column(col).combine_chunks()
        if isinstance(lists, pa.ChunkedArray):
            lists = lists.combine_chunks()
        flat_hit = pc.is_in(pc.list_flatten(lists), value_set=vset)
        # per-row any(): sum hits within each list via list offsets
        import numpy as np

        offsets = lists.offsets.to_numpy()
        hits = np.asarray(flat_hit.to_numpy(zero_copy_only=False), dtype=np.int64)
        csum = np.concatenate([[0], np.cumsum(hits)])
        per_row = (csum[offsets[1:]] - csum[offsets[:-1]]) > 0
        return b.filter(pa.array(per_row))

    return ds.map_batches(f, batch_format="pyarrow")


def local_entities(graph: ray.data.Dataset, low_keywords: list[str]) -> ray.data.Dataset:
    """Seed entities for the local context: keyword-matched nodes ranked by
    (degree desc, entity_id asc) (reference query.go:202-264).

    Degree and node attributes come from ONE unpivot + groupby pass — no
    join: node rows carry (type, mention_count, inc=0), edge endpoints
    carry inc=1; Max folds the unique node row's attributes through (every
    entity has exactly one node row; "" sorts below any real type)."""
    kw = sorted(set(low_keywords))
    vset = pa.array(kw, pa.string())

    def unpivot(b: pa.Table) -> pa.Table:
        is_edge = pc.equal(b.column("kind"), "edge")
        edges, nodes = b.filter(is_edge), b.filter(pc.invert(is_edge))
        nodes = nodes.filter(pc.is_in(nodes.column("entity_id"), value_set=vset))
        edges = edges.filter(
            pc.or_(pc.is_in(edges.column("src"), value_set=vset),
                   pc.is_in(edges.column("tgt"), value_set=vset))
        )
        # matched endpoints only (degree of a seed = its incident edges)
        src = edges.column("src").combine_chunks()
        tgt = edges.column("tgt").combine_chunks()
        src_hit = src.filter(pc.is_in(src, value_set=vset))
        tgt_hit = tgt.filter(pc.is_in(tgt, value_set=vset))
        n_nodes, n_eps = len(nodes), len(src_hit) + len(tgt_hit)
        ent = pa.concat_arrays(
            [nodes.column("entity_id").combine_chunks(), src_hit, tgt_hit]
        )
        typ = pa.concat_arrays(
            [nodes.column("entity_type").combine_chunks(),
             pa.nulls(n_eps, pa.string()).fill_null("")]
        )
        mc = pa.concat_arrays(
            [nodes.column("mention_count").combine_chunks(),
             pa.nulls(n_eps, pa.int64()).fill_null(0)]
        )
        inc = pa.concat_arrays(
            [pa.nulls(n_nodes, pa.int64()).fill_null(0),
             pa.nulls(n_eps, pa.int64()).fill_null(1)]
        )
        return pa.Table.from_arrays(
            [ent, typ, mc, inc],
            names=["entity_id", "entity_type", "mention_count", "inc"],
        )

    merged = (
        graph.map_batches(unpivot, batch_format="pyarrow")
        .groupby("entity_id")
        .aggregate(
            agg.Max("entity_type", alias_name="entity_type"),
            agg.Max("mention_count", alias_name="mention_count"),
            agg.Sum("inc", alias_name="degree"),
        )
    )
    # entities seen only as endpoints of matched edges (no seed node row)
    # carry type "": drop them — seeds must be keyword-matched nodes
    merged = merged.filter(expr="entity_type != ''")
    return _rank_single_group(
        merged, [("degree", True), ("entity_id", False)],
        ["entity_id", "entity_type", "degree", "mention_count"],
    )


def local_relationships(graph: ray.data.Dataset, low_keywords: list[str]) -> ray.data.Dataset:
    """1-hop edges of the seed entities ranked by (weight desc, src, tgt)
    (reference query.go:349-417 ranked relationships)."""
    kw = set(low_keywords)
    edges = _edges(graph)

    def f(b: pa.Table) -> pa.Table:
        vset = pa.array(sorted(kw), pa.string())
        hit = pc.or_(pc.is_in(b.column("src"), value_set=vset),
                     pc.is_in(b.column("tgt"), value_set=vset))
        return b.filter(hit)

    edges = edges.map_batches(f, batch_format="pyarrow")
    return _rank_single_group(
        edges, [("weight", True), ("src", False), ("tgt", False)],
        ["src", "tgt", "weight", "mention_count"],
    )


def local_sources(graph: ray.data.Dataset, low_keywords: list[str]) -> ray.data.Dataset:
    """Chunk refcounts across seed entities' source_ids, ranked desc
    (reference A5, query.go:419-478)."""
    kw = set(low_keywords)
    nodes = _filter_isin(_nodes(graph), "entity_id", list(kw))

    def explode(b: pa.Table) -> pa.Table:
        sids = b.column("source_ids").to_pylist()
        flat = [s for row in sids for s in row]
        return pa.Table.from_pydict({"source_id": pa.array(flat, pa.string())})

    counts = (
        nodes.map_batches(explode, batch_format="pyarrow")
        .groupby("source_id")
        .aggregate(agg.Count(alias_name="ref_count"))
    )
    return _rank_single_group(
        counts, [("ref_count", True), ("source_id", False)],
        ["source_id", "ref_count"],
    )


def global_edges(graph: ray.data.Dataset, high_keywords: list[str]) -> ray.data.Dataset:
    """Global context seed: edges whose keyword list intersects the
    high-level keywords, ranked by (weight desc, src, tgt)
    (reference query.go:266-347)."""
    kw = set(high_keywords)
    edges = _filter_list_intersects(_edges(graph), "keywords", list(kw))
    return _rank_single_group(
        edges, [("weight", True), ("src", False), ("tgt", False)],
        ["src", "tgt", "weight", "mention_count"],
    )


def global_entities(graph: ray.data.Dataset, high_keywords: list[str]) -> ray.data.Dataset:
    """Endpoint entities of the global edges ranked by (degree desc, id)
    (reference query.go:480-517)."""
    vset = pa.array(sorted(set(high_keywords)), pa.string())

    def unpivot(b: pa.Table) -> pa.Table:
        import numpy as np

        edges = b.filter(pc.equal(b.column("kind"), "edge"))
        lists = edges.column("keywords").combine_chunks()
        flat_hit = pc.is_in(pc.list_flatten(lists), value_set=vset)
        offsets = lists.offsets.to_numpy()
        hits = np.asarray(flat_hit.to_numpy(zero_copy_only=False), dtype=np.int64)
        csum = np.concatenate([[0], np.cumsum(hits)])
        matched = ((csum[offsets[1:]] - csum[offsets[:-1]]) > 0).astype(np.int64)
        ent = pa.concat_arrays(
            [edges.column("src").combine_chunks(),
             edges.column("tgt").combine_chunks()]
        )
        hit = pa.array(np.concatenate([matched, matched]), pa.int64())
        inc = pa.nulls(len(ent), pa.int64()).fill_null(1)
        return pa.Table.from_arrays([ent, inc, hit],
                                    names=["entity_id", "inc", "hit"])

    # one shuffle: degree over ALL edges and hit-count over matched edges
    # fold in the same groupby (no join)
    merged = (
        graph.map_batches(unpivot, batch_format="pyarrow")
        .groupby("entity_id")
        .aggregate(
            agg.Sum("inc", alias_name="degree"),
            agg.Sum("hit", alias_name="edge_hits"),
        )
        .filter(expr="edge_hits > 0")
    )
    return _rank_single_group(
        merged, [("degree", True), ("entity_id", False)],
        ["entity_id", "degree", "edge_hits"],
    )


def fused_entities(
    graph: ray.data.Dataset,
    low_keywords: list[str],
    high_keywords: list[str],
    k: int = 60,
    scale: int = 1_000_000,
) -> ray.data.Dataset:
    """Reciprocal-rank fusion of the local and global entity rankings —
    the standard hybrid-retrieval merge (Cormack et al. 2009, RRF) over
    the two context lists the reference assembles separately
    (query.go:202-264 local seeds, query.go:480-517 global endpoints;
    LightRAG's hybrid mode interleaves both into the final context).

    score(e) = Σ_lists scale // (k + rank_e) — INTEGER floor-division
    contributions, so summation order never matters and the DuckDB
    oracle matches bit-exactly (no float accumulation anywhere).

    Scale shape: both inputs are keyword-scoped context lists (small by
    construction — the keyword match prunes at the unpivot), so the
    fusion itself is one union + one groupby-sum + the shared rank pass;
    the heavy work (degree aggregation over all edges) stays inside the
    two upstream single-shuffle rankings."""

    def contrib(b: pa.Table) -> pa.Table:
        import numpy as np

        r = b.column("rank").to_numpy().astype(np.int64)
        c = np.int64(scale) // (r + np.int64(k))
        return pa.Table.from_pydict({
            "entity_id": b.column("entity_id"),
            "c": pa.array(c, pa.int64()),
        })

    loc = local_entities(graph, low_keywords).map_batches(
        contrib, batch_format="pyarrow")
    glo = global_entities(graph, high_keywords).map_batches(
        contrib, batch_format="pyarrow")
    summed = loc.union(glo).groupby("entity_id").aggregate(
        agg.Sum("c", alias_name="rrf_score"))
    return _rank_single_group(
        summed, [("rrf_score", True), ("entity_id", False)],
        ["entity_id", "rrf_score"],
    )


def entity_similarity(
    graph: ray.data.Dataset, dims: int = 32, k: int = 3, sign_bits: int = 2,
) -> ray.data.Dataset:
    """Entity vector search over the graph (reference J7's entity
    collection: chromem.go:99-112 embeds name+descriptions per entity):
    encode node content with the embedding actor pool, then approximate
    cosine top-k neighbors per entity via ``similarity.ann_self_topk_lsh``
    — the same sign-LSH bucketed self-ANN that scales to 10^9 nodes (one
    keyed shuffle, per-bucket matmul, never an all-pairs single group).
    Returns (entity_id, rank, neighbor_id, cos_sim).
    """
    from ..stages.encode import encode_graph_content
    from ..stages.similarity import ann_self_topk_lsh

    emb = encode_graph_content(_nodes(graph), dims=dims)
    return ann_self_topk_lsh(
        emb, k=k, sign_bits=sign_bits, id_col="chunk_id", vec_col="vector",
        out_id_name="entity_id",
    )


# ---------------------------------------------------------------------------
# CSV context rendering (reference M12, query.go:563-592, 601-686)
# ---------------------------------------------------------------------------

def _csv_quote(v) -> str:
    """Go %q-style quoting (reference query.go:669-686)."""
    s = str(v)
    return '"' + s.replace("\\", "\\\\").replace('"', '\\"') + '"'


def render_csv_section(title: str, tbl: pa.Table) -> str:
    """One ranked CSV block: header row then numbered rows, matching the
    reference's section shape (query.go:601-666)."""
    lines = [f"-----{title}-----", "```csv"]
    cols = tbl.column_names
    lines.append(",".join(_csv_quote(c) for c in cols))
    for row in tbl.to_pylist():
        lines.append(",".join(_csv_quote(row[c]) for c in cols))
    lines.append("```")
    return "\n".join(lines)


def extract_query_and_histories(
    conversations: list[dict],
) -> tuple[str, list[dict]]:
    """Latest user message + preceding history (reference
    extractQueryAndHistories, query.go:192-200): scan backwards for the
    last role == "user" turn; everything before it is history.  Raises
    ``ValueError`` when no user message exists (the reference's error
    path, query_test.go no-user-message case)."""
    for i in range(len(conversations) - 1, -1, -1):
        if conversations[i].get("role") == "user":
            return conversations[i].get("message", ""), conversations[:i]
    raise ValueError("no user message found")


def render_history(histories: list[dict]) -> str:
    """QueryConversation.String() lines joined (reference query.go:113-118,
    595-597: ``role: %s, content: %s`` per turn)."""
    return "\n".join(
        f"role: {h.get('role', '')}, content: {h.get('message', '')}"
        for h in histories
    )


def query(graph: ray.data.Dataset, conversations: list[dict]) -> str:
    """Full Query analog (reference query.go:92-190): conversations →
    keyword extraction (query + rendered history, query.go:113-118) →
    local + global contexts → rendered CSV sections
    (QueryResult.String())."""
    query_text, histories = extract_query_and_histories(conversations)
    return render_query_result(
        query_context(graph, query_text, render_history(histories)))


def query_context(
    graph: ray.data.Dataset, query_text: str, history: str = ""
) -> dict[str, pa.Table]:
    """Full Query flow: keywords → local + global context tables."""
    high, low = keyword_extract(query_text, history)
    out: dict[str, pa.Table] = {}
    if low:
        out["local_entities"] = pa.Table.from_pylist(
            local_entities(graph, low).take_all())
        out["local_relationships"] = pa.Table.from_pylist(
            local_relationships(graph, low).take_all())
        out["local_sources"] = pa.Table.from_pylist(
            local_sources(graph, low).take_all())
    if high:
        out["global_edges"] = pa.Table.from_pylist(
            global_edges(graph, high).take_all())
        out["global_entities"] = pa.Table.from_pylist(
            global_entities(graph, high).take_all())
    return out


def render_query_result(contexts: dict[str, pa.Table]) -> str:
    """QueryResult.String() analog: the CSV sections concatenated."""
    return "\n".join(
        render_csv_section(name.replace("_", " ").title(), tbl)
        for name, tbl in contexts.items()
    )
