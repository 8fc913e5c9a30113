"""Entity canonicalization + edge dedup as a salted two-stage groupby-aggregate.

Replaces the reference's racy per-key read-modify-write upsert-merge
(reference insert.go:499-690) with a *pure deterministic aggregation* over
all mentions (SURVEY.md §7.0):

* node merge (J1): descriptions/source-ids ordered-distinct by first
  occurrence (reference appendIfUnique, rag.go:230-235) where occurrence
  order is the carried key ``(doc_id, order_index, mention_index)`` — never
  physical block order; entity type = most-frequent mention type with a
  *lexicographic* tie-break (the reference's Go-map iteration tie-break,
  rag.go:237-258, is non-deterministic; we define it);
* edge merge (J2): weight is additive across mentions
  (insert.go:595, 609-615); descriptions/keywords ordered-distinct;
* dangling-endpoint placeholders (J3, insert.go:625-663) are folded into
  the same shuffle: every relationship mention also emits two low-priority
  "endpoint" node partials; at finalize a key with zero real entity
  mentions becomes an UNKNOWN placeholder built from the endpoint partials
  — no separate anti-join pass.

Scale design: stage A pre-aggregates inside ``map_batches`` (≤ 1 partial
row per key per batch — this is the combiner that keeps the shuffle small);
stage B merges partials grouped by ``(key, salt)`` where the salt spreads a
hot key's partials over ``salt_buckets`` groups (F6 skew fixture: identical
output at salt 1/8/64); stage C performs the final merge per key and
finalizes node/edge rows.  One logical shuffle key family is used
throughout: ``(kind, k1, k2)``.
"""

from __future__ import annotations

import zlib

import pyarrow as pa

from .. import GRAPH_FIELD_SEPARATOR

_OCC_ENTRY = pa.struct([pa.field("occ", pa.string()), pa.field("text", pa.string())])
_OCC_LIST = pa.list_(_OCC_ENTRY)

PARTIALS_SCHEMA = pa.schema(
    [
        pa.field("kind", pa.string()),   # "node" | "edge"
        pa.field("k1", pa.string()),     # entity name / edge src
        pa.field("k2", pa.string()),     # "" / edge tgt
        pa.field("salt", pa.int32()),
        pa.field("types", pa.list_(pa.string())),
        pa.field("type_counts", pa.list_(pa.int64())),
        pa.field("weight", pa.float64()),
        pa.field("mention_count", pa.int64()),
        pa.field("descs", _OCC_LIST),
        pa.field("kws", _OCC_LIST),
        pa.field("srcids", _OCC_LIST),
        pa.field("ph_descs", _OCC_LIST),
        pa.field("ph_srcids", _OCC_LIST),
    ]
)

GRAPH_SCHEMA = pa.schema(
    [
        pa.field("kind", pa.string()),   # "node" | "edge"
        pa.field("entity_id", pa.string()),
        pa.field("entity_type", pa.string()),
        pa.field("src", pa.string()),
        pa.field("tgt", pa.string()),
        pa.field("weight", pa.float64()),
        pa.field("descriptions", pa.list_(pa.string())),
        pa.field("keywords", pa.list_(pa.string())),
        pa.field("source_ids", pa.list_(pa.string())),
        pa.field("mention_count", pa.int64()),
    ]
)


def occ_key(doc_id: str, order_index: int, mention_index: int) -> str:
    """Lexicographically tuple-ordered occurrence key (NUL-separated)."""
    return f"{doc_id}\x00{order_index:010d}\x00{mention_index:010d}"


class _State:
    __slots__ = ("types", "weight", "mention_count", "descs", "kws", "srcids",
                 "ph_descs", "ph_srcids")

    def __init__(self) -> None:
        self.types: dict[str, int] = {}
        self.weight = 0.0
        self.mention_count = 0
        self.descs: dict[str, str] = {}      # text -> min occ
        self.kws: dict[str, str] = {}
        self.srcids: dict[str, str] = {}
        self.ph_descs: dict[str, str] = {}
        self.ph_srcids: dict[str, str] = {}


def _acc(d: dict[str, str], text: str, occ: str) -> None:
    prev = d.get(text)
    if prev is None or occ < prev:
        d[text] = occ


def combine_mentions(batch: pa.Table, salt_buckets: int = 8,
                     merge_cap: int = 0) -> pa.Table:
    """Stage A: mentions batch → ≤1 partial row per (key, kind) per batch."""
    states: dict[tuple[str, str, str], _State] = {}

    def get(kind: str, k1: str, k2: str) -> _State:
        key = (kind, k1, k2)
        st = states.get(key)
        if st is None:
            st = states[key] = _State()
        return st

    n = batch.num_rows
    col = {name: batch.column(name).to_pylist() for name in
           ("doc_id", "chunk_id", "order_index", "mention_index", "kind",
            "name", "type", "src", "tgt", "description", "keywords", "weight")}
    for i in range(n):
        occ = occ_key(col["doc_id"][i], col["order_index"][i], col["mention_index"][i])
        chunk_id = col["chunk_id"][i]
        if col["kind"][i] == "entity":
            st = get("node", col["name"][i], "")
            t = col["type"][i]
            st.types[t] = st.types.get(t, 0) + 1
            st.mention_count += 1
            _acc(st.descs, col["description"][i], occ)
            _acc(st.srcids, chunk_id, occ)
        else:
            src, tgt, desc = col["src"][i], col["tgt"][i], col["description"][i]
            st = get("edge", src, tgt)
            st.weight += col["weight"][i]
            st.mention_count += 1
            _acc(st.descs, desc, occ)
            _acc(st.srcids, chunk_id, occ)
            for j, kw in enumerate(col["keywords"][i]):
                _acc(st.kws, kw, f"{occ}\x00{j:04d}")
            for endpoint in (src, tgt):
                ph = get("node", endpoint, "")
                _acc(ph.ph_descs, desc, occ)
                _acc(ph.ph_srcids, chunk_id, occ)

    return _states_to_table(states, salt_buckets, merge_cap)


def _cap_dict(d: dict[str, str], cap: int) -> dict[str, str]:
    """Keep the ``cap`` entries with the smallest occurrence keys.

    Top-K-by-occ is associative under merge (every element of the global
    first-K is inside the first-K of the partial it came from), so applying
    the cap at every stage is exact for first-K semantics.  cap=0 = exact
    full accumulation (the oracle mode); cap>0 bounds hot-key row width at
    web scale (SURVEY.md §7.3 "very wide rows") — the reference's own cap
    is the summarize-if-long pass, which only ever reads a bounded prefix.
    """
    if not cap or len(d) <= cap:
        return d
    return dict(sorted(d.items(), key=lambda kv: kv[1])[:cap])


def _states_to_table(states: dict, salt_buckets: int, merge_cap: int = 0) -> pa.Table:
    cols: dict[str, list] = {name: [] for name in PARTIALS_SCHEMA.names}
    for (kind, k1, k2), st in states.items():
        # Salt derives from the *content* of the partial (min occ), not the
        # key, so a hot key's partials from different batches spread across
        # salt buckets while remaining deterministic.
        any_occ = min(
            list(st.descs.values()) + list(st.ph_descs.values()) + ["\x7f"]
        )
        salt = zlib.crc32(f"{k1}|{k2}|{any_occ}".encode()) % max(1, salt_buckets)
        cols["kind"].append(kind)
        cols["k1"].append(k1)
        cols["k2"].append(k2)
        cols["salt"].append(salt)
        cols["types"].append(list(st.types.keys()))
        cols["type_counts"].append(list(st.types.values()))
        cols["weight"].append(st.weight)
        cols["mention_count"].append(st.mention_count)
        for field, d in (
            ("descs", st.descs), ("kws", st.kws), ("srcids", st.srcids),
            ("ph_descs", st.ph_descs), ("ph_srcids", st.ph_srcids),
        ):
            d = _cap_dict(d, merge_cap)
            cols[field].append([{"occ": occ, "text": t} for t, occ in d.items()])
    return pa.Table.from_pydict(cols, schema=PARTIALS_SCHEMA)


def _merge_rows(batch: pa.Table) -> _State:
    """Merge all partial rows of one key (or one (key, salt)) into a state.

    Vectorized: the occ-lists are flattened once and reduced with Arrow's
    C++ hash-aggregate (min occ per text / sum count per type) — the
    per-entry Python dict path cost ~10s per million entries and dominated
    the whole canonicalize shuffle before this.
    """
    import pyarrow.compute as pc

    st = _State()
    st.weight = pc.sum(batch.column("weight")).as_py() or 0.0
    st.mention_count = pc.sum(batch.column("mention_count")).as_py() or 0

    types = pc.list_flatten(batch.column("types").combine_chunks())
    if len(types):
        counts = pc.list_flatten(batch.column("type_counts").combine_chunks())
        agg = (
            pa.table({"t": types, "c": counts})
            .group_by("t")
            .aggregate([("c", "sum")])
        )
        st.types = dict(
            zip(agg.column("t").to_pylist(), agg.column("c_sum").to_pylist())
        )

    for field, d in (
        ("descs", st.descs), ("kws", st.kws), ("srcids", st.srcids),
        ("ph_descs", st.ph_descs), ("ph_srcids", st.ph_srcids),
    ):
        flat = pc.list_flatten(batch.column(field).combine_chunks())
        if not len(flat):
            continue
        agg = (
            pa.table({"text": pc.struct_field(flat, "text"),
                      "occ": pc.struct_field(flat, "occ")})
            .group_by("text")
            .aggregate([("occ", "min")])
        )
        d.update(zip(agg.column("text").to_pylist(),
                     agg.column("occ_min").to_pylist()))
    return st


def merge_partials_group(batch: pa.Table, merge_cap: int = 0) -> pa.Table:
    """Stage B: per (kind, k1, k2, salt) group → one partial row."""
    st = _merge_rows(batch)
    states = {(batch.column("kind")[0].as_py(),
               batch.column("k1")[0].as_py(),
               batch.column("k2")[0].as_py()): st}
    return _states_to_table(states, salt_buckets=1, merge_cap=merge_cap)


def _ordered(d: dict[str, str]) -> list[str]:
    return [t for t, _ in sorted(d.items(), key=lambda kv: kv[1])]


def finalize_group(batch: pa.Table, merge_cap: int = 0) -> pa.Table:
    """Stage C: per (kind, k1, k2) group → one finalized node/edge row.

    Re-applies ``merge_cap`` after the final merge: merging capped partials
    yields up to (groups × cap) entries, and only a final re-cap restores
    the exact global first-K (top-K merge needs the cap at EVERY combine,
    including the last — caught by the hypothesis associativity property).
    """
    kind = batch.column("kind")[0].as_py()
    k1 = batch.column("k1")[0].as_py()
    k2 = batch.column("k2")[0].as_py()
    st = _merge_rows(batch)

    def ordered(d):
        vals = _ordered(d)
        return vals[:merge_cap] if merge_cap else vals

    row: dict[str, object] = {
        "kind": kind, "entity_id": "", "entity_type": "", "src": "", "tgt": "",
        "weight": 0.0, "descriptions": [], "keywords": [], "source_ids": [],
        "mention_count": st.mention_count,
    }
    if kind == "node":
        row["entity_id"] = k1
        if st.mention_count > 0:
            # mode with lexicographic tie-break (deterministic A1)
            row["entity_type"] = min(
                st.types.items(), key=lambda kv: (-kv[1], kv[0])
            )[0]
            row["descriptions"] = ordered(st.descs)
            row["source_ids"] = ordered(st.srcids)
        else:
            row["entity_type"] = "UNKNOWN"
            row["descriptions"] = ordered(st.ph_descs)
            row["source_ids"] = ordered(st.ph_srcids)
    else:
        row["src"], row["tgt"] = k1, k2
        row["weight"] = st.weight
        row["descriptions"] = ordered(st.descs)
        row["keywords"] = ordered(st.kws)
        row["source_ids"] = ordered(st.srcids)
    return pa.Table.from_pydict({k: [v] for k, v in row.items()}, schema=GRAPH_SCHEMA)


def canonicalize(mentions, salt_buckets: int = 8, batch_size: int = 8192,
                 merge_cap: int = 0):
    """mentions Dataset → combined graph Dataset (kind ∈ {node, edge}).

    Three stages: vectorized combiner (stateless map_batches), salted
    partial merge (groupby shuffle 1), final merge (groupby shuffle 2 over
    the already-compressed partials).

    ``merge_cap`` bounds every accumulated list to its first-``cap``
    entries by occurrence at every stage (associative, deterministic);
    0 = exact full accumulation.  At web scale a hot entity would otherwise
    accumulate one description per mentioning document — unbounded row
    width the summarizer only bounds AFTER the shuffle has paid for it.
    """
    partials = mentions.map_batches(
        lambda b: combine_mentions(b, salt_buckets, merge_cap),
        batch_format="pyarrow",
        batch_size=batch_size,
    )
    return _merge_and_finalize(partials, salt_buckets, merge_cap)


def _merge_and_finalize(partials, salt_buckets: int, merge_cap: int):
    """Stages B + C over a partials Dataset (shared by the fresh and the
    incremental path)."""
    if salt_buckets > 1:
        partials = partials.groupby(["kind", "k1", "k2", "salt"]).map_groups(
            lambda g: merge_partials_group(g, merge_cap),
            batch_format="pyarrow",
        )
    return partials.groupby(["kind", "k1", "k2"]).map_groups(
        lambda g: finalize_group(g, merge_cap), batch_format="pyarrow"
    )


# occ prefix that sorts before any real occurrence key (real keys start
# with a doc-id character > NUL), so prior-snapshot content keeps its order
# and new mentions append after it — the reference's read-existing-first
# appendIfUnique semantics (insert.go:522-534)
_PRIOR_OCC_PREFIX = "\x00prior\x00"


def _prior_occ(i: int) -> str:
    return f"{_PRIOR_OCC_PREFIX}{i:010d}"


def graph_to_partials(batch: pa.Table, salt_buckets: int = 8) -> pa.Table:
    """Prior graph snapshot rows → partial rows, re-entering the shuffle.

    Incremental-insert semantics vs the reference (insert.go:499-623):
    weight is additive on top of the stored edge weight; stored
    descriptions/keywords/source_ids come first in merge order; the stored
    entity type re-enters the mode vote weighted by the stored
    mention_count (the reference votes it once per upsert call — ours is
    the associative choice so that canonicalize(part1) ⊕ part2 ==
    canonicalize(part1 ∪ part2) for ordered splits).  UNKNOWN placeholders
    re-enter as placeholder (ph_*) partials, so they upgrade in place when
    real mentions for the name later arrive.
    """
    states: dict[tuple[str, str, str], _State] = {}
    n = batch.num_rows
    col = {name: batch.column(name).to_pylist() for name in
           ("kind", "entity_id", "entity_type", "src", "tgt", "weight",
            "descriptions", "keywords", "source_ids", "mention_count")}
    for i in range(n):
        kind = col["kind"][i]
        if kind == "node":
            key = ("node", col["entity_id"][i], "")
        else:
            key = ("edge", col["src"][i], col["tgt"][i])
        st = states.setdefault(key, _State())
        mc = col["mention_count"][i]
        placeholder = kind == "node" and col["entity_type"][i] == "UNKNOWN" and mc == 0
        st.mention_count += mc
        st.weight += col["weight"][i]
        if kind == "node" and not placeholder:
            t = col["entity_type"][i]
            st.types[t] = st.types.get(t, 0) + max(1, mc)
        descs_d = st.ph_descs if placeholder else st.descs
        srcs_d = st.ph_srcids if placeholder else st.srcids
        for j, d in enumerate(col["descriptions"][i]):
            _acc(descs_d, d, _prior_occ(j))
        for j, s in enumerate(col["source_ids"][i]):
            _acc(srcs_d, s, _prior_occ(j))
        for j, kw in enumerate(col["keywords"][i]):
            _acc(st.kws, kw, _prior_occ(j))
    return _states_to_table(states, salt_buckets)


def canonicalize_incremental(mentions, prior_graph, salt_buckets: int = 8,
                             batch_size: int = 8192, merge_cap: int = 0):
    """Incremental insert: new mentions merged with a prior graph snapshot
    in ONE shuffle — the reference's point-lookup upsert loop becomes a
    union of partials (new combiner output ∪ snapshot partials) flowing
    through the same salted merge + finalize.  No join, no per-key reads.
    """
    new_partials = mentions.map_batches(
        lambda b: combine_mentions(b, salt_buckets, merge_cap),
        batch_format="pyarrow",
        batch_size=batch_size,
    )
    prior_partials = prior_graph.map_batches(
        lambda b: graph_to_partials(b, salt_buckets),
        batch_format="pyarrow",
    )
    return _merge_and_finalize(new_partials.union(prior_partials),
                               salt_buckets, merge_cap)


def sep_join(values: list[str]) -> str:
    """Render the reference's ``<SEP>``-joined string form (insert.go:538,623)."""
    return GRAPH_FIELD_SEPARATOR.join(values)
