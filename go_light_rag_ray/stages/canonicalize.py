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

import numpy as np
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
        # full type-vote tally (nodes only; parallel lists ordered by
        # (-count, name)).  entity_type is the argmax, but the snapshot
        # keeps the minority counts so an incremental re-insert re-enters
        # the vote EXACTLY — without these, mixed-type entities could elect
        # a different type in incremental(graph(p1), p2) vs graph(p1 ∪ p2).
        pa.field("type_names", pa.list_(pa.string())),
        pa.field("type_votes", pa.list_(pa.int64())),
    ]
)


def occ_key(doc_id: str, order_index: int, mention_index: int) -> str:
    """Lexicographically tuple-ordered occurrence key.

    ``doc_id ++ NUL ++ lp(order) ++ lp(mention)`` where ``lp`` is the
    length-prefixed decimal encoding (one byte = digit count, then the
    digits): prefix-free and order-preserving — a longer number has a
    higher first byte, equal lengths compare digit-wise — so concatenated
    fields compare exactly like the (doc, order, mention) tuple while
    costing ~3-4 bytes per field instead of a fixed 11-byte zero pad.
    Occ strings are ~half the canonicalize exchange (measured sf0.1:
    5.3 of 9.8 MB), so their width is shuffle bandwidth at scale."""
    o, m = str(order_index), str(mention_index)
    return f"{doc_id}\x00{chr(len(o))}{o}{chr(len(m))}{m}"


# single-byte length prefixes for 1..20-digit decimals (int64 max is 19)
_LEN_CHARS = pa.array([chr(i) for i in range(1, 21)], pa.string())


def _lp_digits(col) -> pa.Array:
    """Vectorized length-prefixed decimal encoding of non-negative ints."""
    import pyarrow.compute as pc

    if isinstance(col, np.ndarray):
        col = pa.array(col)
    digits = pc.cast(col, pa.string())
    if isinstance(digits, pa.ChunkedArray):
        digits = digits.combine_chunks()
    prefix = _LEN_CHARS.take(pc.subtract(pc.binary_length(digits), 1))
    return pc.binary_join_element_wise(prefix, digits, "")


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


def _occ_strings(batch: pa.Table) -> pa.Array:
    """Vectorized ``occ_key`` over the whole batch."""
    import pyarrow.compute as pc

    return pc.binary_join_element_wise(
        batch.column("doc_id"),
        pc.binary_join_element_wise(
            _lp_digits(batch.column("order_index")),
            _lp_digits(batch.column("mention_index")), ""),
        "\x00",
    ).combine_chunks()


def _dedup_entries(tbl: pa.Table, keys: list[str], sort: bool = True):
    """(keys…, text, occ) rows → per-key (occ_list, text_list, occ floor).

    Two Arrow hash-aggregates replace the per-row Python dict path: level 1
    dedupes (keys, text) keeping the min occ; level 2 packs parallel
    occ/text lists per key plus the per-key min occ (the salt seed).
    Sorted by the keys so parallel aggregates over the same key set align
    row-for-row."""
    lvl1 = tbl.group_by(keys + ["text"]).aggregate([("occ", "min")])
    lvl2 = (
        pa.table({**{k: lvl1.column(k) for k in keys},
                  "occ": lvl1.column("occ_min"), "text": lvl1.column("text")})
        .group_by(keys)
        .aggregate([("occ", "list"), ("text", "list"), ("occ", "min")])
    )
    if sort:
        lvl2 = lvl2.sort_by([(k, "ascending") for k in keys])
    return lvl2  # columns: keys…, occ_list, text_list, occ_min


def _occ_list_col(lvl2: pa.Table, cap: int) -> pa.ListArray:
    """Parallel (occ_list, text_list) columns → one list<struct{occ,text}>
    column, built from offsets + a flat ``make_struct`` (no Python rows).

    ``cap`` > 0 keeps the cap entries with the smallest occs per row,
    fully vectorized: ONE Arrow (parent, occ) sort over the flattened
    elements + a positional mask per parent run.  (The previous
    ``to_pylist`` round trip was fine while over-cap rows were rare, but
    large combiner bundles — the merge_cap pre-shuffle compression — make
    EVERY hot key exceed the cap, and per-element Python cost ~40µs×rows:
    the 1M-doc scale leg spent 168 s here.)"""
    import numpy as np
    import pyarrow.compute as pc

    ol = lvl2.column("occ_list").combine_chunks()
    tl = lvl2.column("text_list").combine_chunks()
    lens = pc.list_value_length(ol).to_numpy(zero_copy_only=False).astype(np.int64)
    flat_occ = pc.list_flatten(ol)
    flat_txt = pc.list_flatten(tl)
    if cap and (lens > cap).any():
        n = len(lens)
        total = int(lens.sum())
        parent = np.repeat(np.arange(n, dtype=np.int64), lens)
        srt = pa.table({
            "p": pa.array(parent), "occ": flat_occ,
            "i": pa.array(np.arange(total, dtype=np.int64)),
        }).sort_by([("p", "ascending"), ("occ", "ascending")])
        starts = np.concatenate(([0], np.cumsum(lens)))[:-1]
        pos = np.arange(total) - np.repeat(starts, lens)
        sel = pa.array(
            srt.column("i").to_numpy(zero_copy_only=False)[pos < cap])
        flat_occ = flat_occ.take(sel)
        flat_txt = flat_txt.take(sel)
        lens = np.minimum(lens, cap)
    offsets = pa.array(np.concatenate(([0], np.cumsum(lens))), pa.int32())
    flat = pc.make_struct(flat_occ, flat_txt, field_names=["occ", "text"])
    return pa.ListArray.from_arrays(offsets, flat)


def _empty_occ_col(n: int) -> pa.ListArray:
    import numpy as np
    import pyarrow.compute as pc

    flat = pc.make_struct(pa.array([], pa.string()), pa.array([], pa.string()),
                          field_names=["occ", "text"])
    return pa.ListArray.from_arrays(
        pa.array(np.zeros(n + 1, dtype=np.int32)), flat)


def _empty_list_col(n: int, value_type: pa.DataType) -> pa.ListArray:
    import numpy as np

    return pa.ListArray.from_arrays(
        pa.array(np.zeros(n + 1, dtype=np.int32)), pa.array([], value_type))


def _salt_col(k1, k2, occ_mins, salt_buckets: int) -> pa.Array:
    """crc32(k1|k2|occ_min) % buckets — the join is an Arrow kernel and the
    crc a table-driven numpy recurrence (``hashutil.crc32_vec``, bit-equal
    to zlib.crc32, so salt assignment is unchanged)."""
    import pyarrow.compute as pc

    from ..hashutil import crc32_vec

    m = max(1, salt_buckets)
    if not isinstance(occ_mins, (pa.Array, pa.ChunkedArray)):
        occ_mins = pa.array(list(occ_mins), pa.string())
    joined = pc.binary_join_element_wise(
        pc.cast(k1, pa.string()), pc.cast(k2, pa.string()),
        pc.cast(occ_mins, pa.string()), "|",
    )
    return pa.array((crc32_vec(joined) % m).astype(np.int32), pa.int32())


def _partial_rows(kind: str, k1: pa.Array, k2, *, salt_buckets: int,
                  occ_min=None, types=None, type_counts=None, weight=None,
                  mention_count=None, descs=None, kws=None, srcids=None,
                  ph_descs=None, ph_srcids=None) -> pa.Table:
    """One contribution table in PARTIALS_SCHEMA; unspecified fields get
    empty/zero defaults.  Salt derives from each row's own content floor
    (min occ), keeping hot keys spread and the output deterministic."""
    import numpy as np

    n = len(k1)
    if k2 is None:
        k2 = pa.array([""] * n, pa.string())
    cols = {
        "kind": pa.array([kind] * n, pa.string()),
        "k1": k1,
        "k2": k2,
        "salt": _salt_col(k1, k2,
                          occ_min if occ_min is not None else ["\x7f"] * n,
                          salt_buckets),
        "types": types if types is not None else _empty_list_col(n, pa.string()),
        "type_counts": (type_counts if type_counts is not None
                        else _empty_list_col(n, pa.int64())),
        "weight": (weight if weight is not None
                   else pa.array(np.zeros(n), pa.float64())),
        "mention_count": (mention_count if mention_count is not None
                          else pa.array(np.zeros(n, dtype=np.int64))),
        "descs": descs if descs is not None else _empty_occ_col(n),
        "kws": kws if kws is not None else _empty_occ_col(n),
        "srcids": srcids if srcids is not None else _empty_occ_col(n),
        "ph_descs": ph_descs if ph_descs is not None else _empty_occ_col(n),
        "ph_srcids": ph_srcids if ph_srcids is not None else _empty_occ_col(n),
    }
    return pa.Table.from_pydict(cols).cast(PARTIALS_SCHEMA)


# ---------------------------------------------------------------------------
# packed-int combiner kernel
# ---------------------------------------------------------------------------
# The combiner's cost is hash-aggregation over (key, text, occ) STRINGS; at
# 32 concurrent 1M-row tasks per node those string passes saturate memory
# bandwidth (measured r3: 61 s/task mean vs 3.9 s single-process, RAM idle).
# This kernel hashes each distinct string ONCE (sorted-unique rank encode /
# dictionary encode), runs every group_by over int64 columns, and
# materializes strings only for the ≤ ~100k surviving entries.  Occurrence
# keys pack (doc_rank, order_index, mention_index[, kw_pos]) into one int64
# whose numeric order equals the occ STRING order (rank codes are string
# ranks; the \x00 separator is below every id byte, so joined-string order
# == tuple order).  Within-list entry order is canonical (occ-ascending) —
# the merge stages key every combine on occ, so list order is semantically
# inert, but a defined order keeps runs reproducible.


def _bitwidth(maxval: int) -> int:
    return max(1, int(maxval).bit_length())


def _sorted_unique(col) -> pa.Array:
    import pyarrow.compute as pc

    u = pc.unique(col)
    return u.take(pc.array_sort_indices(u))


def _rank_codes(col, value_set: pa.Array) -> np.ndarray:
    import pyarrow.compute as pc

    return pc.index_in(col, value_set=value_set).cast(pa.int64()).to_numpy(
        zero_copy_only=False)


class _IntEnc:
    """Per-batch integer encoding of keys / texts / occurrence tuples.

    ``ok`` is False when the batch cannot be packed (nulls in key columns
    or id widths over 62 bits) — the caller then uses the string kernel.
    """

    def __init__(self, batch: pa.Table):
        import pyarrow.compute as pc

        self.ok = False
        if any(batch.column(c).null_count
               for c in ("doc_id", "name", "src", "tgt", "description",
                         "chunk_id", "order_index", "mention_index")):
            return
        doc = batch.column("doc_id").combine_chunks()
        self.docs_u = _sorted_unique(doc)
        order = batch.column("order_index").to_numpy(
            zero_copy_only=False).astype(np.int64)
        ment = batch.column("mention_index").to_numpy(
            zero_copy_only=False).astype(np.int64)
        if order.min(initial=0) < 0 or ment.min(initial=0) < 0:
            return
        max_pos = int(pc.max(
            pc.list_value_length(batch.column("keywords"))).as_py() or 0)
        bd = _bitwidth(len(self.docs_u) - 1)
        bo = _bitwidth(int(order.max(initial=0)))
        bm = _bitwidth(int(ment.max(initial=0)))
        self.bp = _bitwidth(max(0, max_pos - 1))
        # the length-prefixed occ encoding orders correctly at any width;
        # this guard is only the 62-bit int packing budget
        if bd + bo + bm + self.bp > 62:
            return
        self.bo, self.bm = bo, bm
        rank = _rank_codes(doc, self.docs_u)
        self.occ = (rank << (bo + bm)) | (order << bm) | ment
        # one shared node-key space over name/src/tgt: rank codes order
        # exactly like the strings, so sort_by(code) == sort_by(key)
        self.keys_u = _sorted_unique(pa.concat_arrays([
            batch.column(c).combine_chunks() for c in ("name", "src", "tgt")]))
        self.bk = _bitwidth(len(self.keys_u) - 1)
        if 2 * self.bk > 62:
            return
        self.name = _rank_codes(batch.column("name"), self.keys_u)
        self.src = _rank_codes(batch.column("src"), self.keys_u)
        self.tgt = _rank_codes(batch.column("tgt"), self.keys_u)
        denc = batch.column("description").combine_chunks().dictionary_encode()
        self.desc_u = denc.dictionary
        self.desc = denc.indices.cast(pa.int64()).to_numpy(zero_copy_only=False)
        cenc = batch.column("chunk_id").combine_chunks().dictionary_encode()
        self.chunk_u = cenc.dictionary
        self.chunk = cenc.indices.cast(pa.int64()).to_numpy(zero_copy_only=False)
        self.ok = True

    def decode_key(self, codes: np.ndarray) -> pa.Array:
        return self.keys_u.take(pa.array(codes, pa.int64()))

    def decode_occ(self, occ: np.ndarray, kw: bool = False) -> pa.Array:
        import pyarrow.compute as pc

        pos = None
        if kw:
            pos = occ & ((1 << self.bp) - 1)
            occ = occ >> self.bp
        bo, bm = self.bo, self.bm
        rank = occ >> (bo + bm)
        order = (occ >> bm) & ((1 << bo) - 1)
        ment = occ & ((1 << bm) - 1)
        base = pc.binary_join_element_wise(
            self.docs_u.take(pa.array(rank, pa.int64())),
            pc.binary_join_element_wise(
                _lp_digits(order), _lp_digits(ment), ""),
            "\x00")
        if pos is None:
            return base
        return pc.binary_join_element_wise(base, _lp_digits(pos), "")


def _dedup_int(k: np.ndarray, t: np.ndarray, o: np.ndarray) -> pa.Table:
    """Int twin of ``_dedup_entries``: per-key (text-code list, occ list,
    occ min), sorted by key code — two int64 hash-aggregates."""
    lvl1 = (pa.table({"k": k, "t": t, "o": o})
            .group_by(["k", "t"]).aggregate([("o", "min")]))
    return (pa.table({"k": lvl1.column("k"), "t": lvl1.column("t"),
                      "o": lvl1.column("o_min")})
            .group_by("k")
            .aggregate([("o", "list"), ("t", "list"), ("o", "min")])
            .sort_by("k"))  # k, o_list, t_list, o_min


def _occ_struct_col(lvl2: pa.Table, cap: int, enc: _IntEnc,
                    text_dict: pa.Array, kw: bool = False):
    """Int (o_list, t_list) → capped, occ-sorted list<struct{occ,text}>
    plus the decoded per-key min-occ strings (the salt seeds)."""
    import pyarrow.compute as pc

    ol = lvl2.column("o_list").combine_chunks()
    tl = lvl2.column("t_list").combine_chunks()
    lens = pc.list_value_length(ol).to_numpy(zero_copy_only=False).astype(np.int64)
    flat_o = pc.list_flatten(ol).to_numpy(zero_copy_only=False)
    flat_t = pc.list_flatten(tl).to_numpy(zero_copy_only=False)
    n = len(lens)
    total = int(lens.sum())
    parent = np.repeat(np.arange(n, dtype=np.int64), lens)
    order = np.lexsort((flat_o, parent))  # canonical within-list occ order
    flat_o = flat_o[order]
    flat_t = flat_t[order]
    if cap and (lens > cap).any():
        starts = np.concatenate(([0], np.cumsum(lens)))[:-1]
        pos = np.arange(total) - np.repeat(starts, lens)
        keep = pos < cap
        flat_o = flat_o[keep]
        flat_t = flat_t[keep]
        lens = np.minimum(lens, cap)
    offsets = pa.array(np.concatenate(([0], np.cumsum(lens))), pa.int32())
    flat = pc.make_struct(
        enc.decode_occ(flat_o, kw=kw),
        text_dict.take(pa.array(flat_t, pa.int64())),
        field_names=["occ", "text"])
    col = pa.ListArray.from_arrays(offsets, flat)
    occ_min = enc.decode_occ(
        lvl2.column("o_min").to_numpy(zero_copy_only=False), kw=kw)
    return col, occ_min


def _combine_mentions_int(batch: pa.Table, salt_buckets: int,
                          merge_cap: int) -> pa.Table | None:
    import pyarrow.compute as pc

    if batch.num_rows == 0:
        return _states_to_table({}, salt_buckets, merge_cap)
    enc = _IntEnc(batch)
    if not enc.ok:
        return None

    ent_m = pc.equal(batch.column("kind"), "entity").combine_chunks().to_numpy(
        zero_copy_only=False)
    rel_m = ~ent_m
    parts: list[pa.Table] = []

    if ent_m.any():
        nk = enc.name[ent_m]
        occ = enc.occ[ent_m]
        tenc = batch.column("type").combine_chunks().dictionary_encode()
        tcodes = tenc.indices.cast(pa.int64()).to_numpy(
            zero_copy_only=False)[ent_m]
        tally = (pa.table({"k": nk, "t": tcodes})
                 .group_by(["k", "t"]).aggregate([("t", "count")])
                 .group_by("k")
                 .aggregate([("t", "list"), ("t_count", "list"),
                             ("t_count", "sum")])
                 .sort_by("k"))
        descs = _dedup_int(nk, enc.desc[ent_m], occ)
        srcs = _dedup_int(nk, enc.chunk[ent_m], occ)
        dcol, d_min = _occ_struct_col(descs, merge_cap, enc, enc.desc_u)
        scol, _ = _occ_struct_col(srcs, merge_cap, enc, enc.chunk_u)
        tlist = tally.column("t_list").combine_chunks()
        type_lists = pa.ListArray.from_arrays(
            tlist.offsets, tenc.dictionary.take(pc.list_flatten(tlist)))
        parts.append(_partial_rows(
            "node",
            enc.decode_key(tally.column("k").to_numpy(zero_copy_only=False)),
            None, salt_buckets=salt_buckets, occ_min=d_min,
            types=type_lists,
            type_counts=tally.column("t_count_list").combine_chunks(),
            mention_count=tally.column("t_count_sum").combine_chunks(),
            descs=dcol, srcids=scol,
        ))

    if rel_m.any():
        sk = enc.src[rel_m]
        tk = enc.tgt[rel_m]
        ek = (sk << enc.bk) | tk  # rank-code packing: int order == (src, tgt)
        occ = enc.occ[rel_m]
        w = batch.column("weight").to_numpy(zero_copy_only=False)[rel_m]
        sums = (pa.table({"e": ek, "w": w})
                .group_by("e").aggregate([("w", "sum"), ("w", "count")])
                .sort_by("e"))
        edescs = _dedup_int(ek, enc.desc[rel_m], occ)
        esrcs = _dedup_int(ek, enc.chunk[rel_m], occ)
        e_codes = sums.column("e").to_numpy(zero_copy_only=False)
        edcol, ed_min = _occ_struct_col(edescs, merge_cap, enc, enc.desc_u)
        escol, _ = _occ_struct_col(esrcs, merge_cap, enc, enc.chunk_u)
        parts.append(_partial_rows(
            "edge", enc.decode_key(e_codes >> enc.bk),
            enc.decode_key(e_codes & ((1 << enc.bk) - 1)),
            salt_buckets=salt_buckets, occ_min=ed_min,
            weight=sums.column("w_sum").combine_chunks(),
            mention_count=sums.column("w_count").combine_chunks(),
            descs=edcol, srcids=escol,
        ))

        kw_col = batch.column("keywords").combine_chunks().filter(
            pa.array(rel_m))
        flat = pc.list_flatten(kw_col)
        if len(flat):
            kenc = flat.dictionary_encode()
            kcodes = kenc.indices.cast(pa.int64()).to_numpy(zero_copy_only=False)
            par = pc.list_parent_indices(kw_col).to_numpy(zero_copy_only=False)
            lens = pc.list_value_length(kw_col).to_numpy(zero_copy_only=False)
            lens = np.nan_to_num(lens).astype(np.int64)
            pos = np.arange(int(lens.sum())) - np.repeat(
                np.cumsum(lens) - lens, lens)
            kocc = (occ[par] << enc.bp) | pos
            kagg = _dedup_int(ek[par], kcodes, kocc)
            kcol, k_min = _occ_struct_col(kagg, merge_cap, enc,
                                          kenc.dictionary, kw=True)
            ke = kagg.column("k").to_numpy(zero_copy_only=False)
            parts.append(_partial_rows(
                "edge", enc.decode_key(ke >> enc.bk),
                enc.decode_key(ke & ((1 << enc.bk) - 1)),
                salt_buckets=salt_buckets, occ_min=k_min, kws=kcol,
            ))

        # dangling-endpoint placeholder partials: both endpoints
        ep_k = np.concatenate([sk, tk])
        ep_occ = np.concatenate([occ, occ])
        phd = _dedup_int(ep_k, np.concatenate([enc.desc[rel_m]] * 2), ep_occ)
        phs = _dedup_int(ep_k, np.concatenate([enc.chunk[rel_m]] * 2), ep_occ)
        pdcol, pd_min = _occ_struct_col(phd, merge_cap, enc, enc.desc_u)
        pscol, _ = _occ_struct_col(phs, merge_cap, enc, enc.chunk_u)
        parts.append(_partial_rows(
            "node",
            enc.decode_key(phd.column("k").to_numpy(zero_copy_only=False)),
            None, salt_buckets=salt_buckets, occ_min=pd_min,
            ph_descs=pdcol, ph_srcids=pscol,
        ))

    return pa.concat_tables(parts) if parts else _states_to_table(
        {}, salt_buckets, merge_cap)


def combine_mentions(batch: pa.Table, salt_buckets: int = 8,
                     merge_cap: int = 0) -> pa.Table:
    """Stage A: mentions batch → a few partial rows per distinct key.

    Dispatcher: the packed-int kernel (``_combine_mentions_int``) handles
    every realistic batch — it encodes keys / texts / occurrence tuples to
    integers once, runs ALL hash-aggregates over ints, and decodes only the
    few surviving entries.  Measured on the 1M-row scale bundle it is ~2.7×
    the string kernel in CPU and touches ~4× fewer bytes, which moves the
    memory-bandwidth saturation point of concurrent combiner tasks (the r3
    scaling bottleneck) correspondingly higher.  Falls back to the string
    kernel only when a batch's id widths overflow the 62-bit occ packing
    (pathological order/mention indices)."""
    fast = _combine_mentions_int(batch, salt_buckets, merge_cap)
    if fast is not None:
        return fast
    return _combine_mentions_str(batch, salt_buckets, merge_cap)


def _combine_mentions_str(batch: pa.Table, salt_buckets: int = 8,
                          merge_cap: int = 0) -> pa.Table:
    """String-keyed combiner kernel (fallback; see ``combine_mentions``).

    Fully vectorized: every reduction (dedupe-by-text keeping the min
    occurrence, type tallies, weight sums) is an Arrow C++ hash-aggregate
    over the whole batch and the output table is assembled column-wise —
    no Python loop touches a mention.  Each key emits up to three partial
    rows per batch (entity-side, placeholder-side, keyword-side) instead
    of exactly one; the salted merge stages combine them identically, and
    the shuffled volume is unchanged (same entries, same dedup)."""
    import pyarrow.compute as pc

    if batch.num_rows == 0:
        return _states_to_table({}, salt_buckets, merge_cap)

    occ = _occ_strings(batch)
    is_ent = pc.equal(batch.column("kind"), "entity").combine_chunks()
    ents = batch.append_column("_occ", occ).filter(is_ent)
    rels = batch.append_column("_occ", occ).filter(pc.invert(is_ent))
    parts: list[pa.Table] = []

    if len(ents):
        tally = (
            pa.table({"name": ents.column("name"), "type": ents.column("type")})
            .group_by(["name", "type"])
            .aggregate([("type", "count")])
            .group_by("name")
            .aggregate([("type", "list"), ("type_count", "list"),
                        ("type_count", "sum")])
            .sort_by("name")
        )
        descs = _dedup_entries(
            pa.table({"name": ents.column("name"),
                      "text": ents.column("description"),
                      "occ": ents.column("_occ")}), ["name"])
        srcs = _dedup_entries(
            pa.table({"name": ents.column("name"),
                      "text": ents.column("chunk_id"),
                      "occ": ents.column("_occ")}), ["name"])
        # identical key sets (every entity row has a name/desc/chunk), all
        # sorted by name → column-aligned
        parts.append(_partial_rows(
            "node", tally.column("name").combine_chunks(), None,
            salt_buckets=salt_buckets,
            occ_min=descs.column("occ_min").combine_chunks(),
            types=tally.column("type_list").combine_chunks(),
            type_counts=tally.column("type_count_list").combine_chunks(),
            mention_count=tally.column("type_count_sum").combine_chunks(),
            descs=_occ_list_col(descs, merge_cap),
            srcids=_occ_list_col(srcs, merge_cap),
        ))

    if len(rels):
        sums = (
            pa.table({"src": rels.column("src"), "tgt": rels.column("tgt"),
                      "weight": rels.column("weight")})
            .group_by(["src", "tgt"])
            .aggregate([("weight", "sum"), ("weight", "count")])
            .sort_by([("src", "ascending"), ("tgt", "ascending")])
        )
        edescs = _dedup_entries(
            pa.table({"src": rels.column("src"), "tgt": rels.column("tgt"),
                      "text": rels.column("description"),
                      "occ": rels.column("_occ")}), ["src", "tgt"])
        esrcs = _dedup_entries(
            pa.table({"src": rels.column("src"), "tgt": rels.column("tgt"),
                      "text": rels.column("chunk_id"),
                      "occ": rels.column("_occ")}), ["src", "tgt"])
        parts.append(_partial_rows(
            "edge", sums.column("src").combine_chunks(),
            sums.column("tgt").combine_chunks(),
            salt_buckets=salt_buckets,
            occ_min=edescs.column("occ_min").combine_chunks(),
            weight=sums.column("weight_sum").combine_chunks(),
            mention_count=sums.column("weight_count").combine_chunks(),
            descs=_occ_list_col(edescs, merge_cap),
            srcids=_occ_list_col(esrcs, merge_cap),
        ))

        # keywords: flatten with parent row + within-list position suffix;
        # key set is the SUBSET of edges with ≥1 keyword → own partial rows
        kw_col = rels.column("keywords").combine_chunks()
        flat = pc.list_flatten(kw_col)
        if len(flat):
            import numpy as np

            par = pc.list_parent_indices(kw_col)
            lens = pc.list_value_length(kw_col).to_numpy(zero_copy_only=False)
            lens = np.nan_to_num(lens).astype(np.int64)
            pos = np.arange(int(lens.sum())) - np.repeat(
                np.cumsum(lens) - lens, lens)
            kocc = pc.binary_join_element_wise(
                rels.column("_occ").combine_chunks().take(par),
                _lp_digits(pos), "",
            )
            kagg = _dedup_entries(
                pa.table({"src": rels.column("src").combine_chunks().take(par),
                          "tgt": rels.column("tgt").combine_chunks().take(par),
                          "text": flat, "occ": kocc}), ["src", "tgt"])
            parts.append(_partial_rows(
                "edge", kagg.column("src").combine_chunks(),
                kagg.column("tgt").combine_chunks(),
                salt_buckets=salt_buckets,
                occ_min=kagg.column("occ_min").combine_chunks(),
                kws=_occ_list_col(kagg, merge_cap),
            ))

        # dangling-endpoint placeholder partials: both endpoints of every
        # relationship mention
        ep_name = pa.concat_arrays([rels.column("src").combine_chunks(),
                                    rels.column("tgt").combine_chunks()])
        ep_occ = pa.concat_arrays([rels.column("_occ").combine_chunks()] * 2)
        phd = _dedup_entries(
            pa.table({"name": ep_name,
                      "text": pa.concat_arrays(
                          [rels.column("description").combine_chunks()] * 2),
                      "occ": ep_occ}), ["name"])
        phs = _dedup_entries(
            pa.table({"name": ep_name,
                      "text": pa.concat_arrays(
                          [rels.column("chunk_id").combine_chunks()] * 2),
                      "occ": ep_occ}), ["name"])
        parts.append(_partial_rows(
            "node", phd.column("name").combine_chunks(), None,
            salt_buckets=salt_buckets,
            occ_min=phd.column("occ_min").combine_chunks(),
            ph_descs=_occ_list_col(phd, merge_cap),
            ph_srcids=_occ_list_col(phs, merge_cap),
        ))

    return pa.concat_tables(parts) if parts else _states_to_table(
        {}, salt_buckets, merge_cap)


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


# below this many flattened entries, a Python dict merge beats Arrow's
# per-call kernel overhead (~5 group_by dispatches ≈ 100 ms vs ~0.2 ms of
# dict ops for a typical salt group — measured 109 s of aggregate CPU for
# 1152 stage-B groups before this fast path)
_SMALL_GROUP_ENTRIES = 20_000


def _merge_rows(batch: pa.Table) -> _State:
    """Merge all partial rows of one key (or one (key, salt)) into a state.

    Hybrid: small groups (the overwhelmingly common case — a salt group
    holds a handful of combiner partials) merge via plain dicts; large
    groups (hot keys at web scale) flatten once and reduce with Arrow's
    C++ hash-aggregate (min occ per text / sum count per type), which is
    ~10× faster per entry at millions of entries.
    """
    import pyarrow.compute as pc

    st = _State()
    occ_cols = ("descs", "kws", "srcids", "ph_descs", "ph_srcids")
    n_entries = batch.num_rows + sum(
        pc.sum(pc.list_value_length(batch.column(c))).as_py() or 0
        for c in occ_cols
    )
    if n_entries <= _SMALL_GROUP_ENTRIES:
        weight = 0.0
        mention_count = 0
        dicts = {c: getattr(st, c) for c in occ_cols}
        cols = {c: batch.column(c).to_pylist() for c in
                occ_cols + ("types", "type_counts", "weight", "mention_count")}
        for i in range(batch.num_rows):
            weight += cols["weight"][i]
            mention_count += cols["mention_count"][i]
            for t, c in zip(cols["types"][i], cols["type_counts"][i]):
                st.types[t] = st.types.get(t, 0) + c
            for name, d in dicts.items():
                for e in cols[name][i]:
                    _acc(d, e["text"], e["occ"])
        st.weight = weight
        st.mention_count = mention_count
        return st

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
        "type_names": [], "type_votes": [],
    }
    if kind == "node":
        row["entity_id"] = k1
        if st.mention_count > 0:
            # mode with lexicographic tie-break (deterministic A1)
            tally = sorted(st.types.items(), key=lambda kv: (-kv[1], kv[0]))
            row["entity_type"] = tally[0][0]
            row["type_names"] = [t for t, _ in tally]
            row["type_votes"] = [c for _, c in tally]
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
                 merge_cap: int = 0, strategy: str = "sorted"):
    """mentions Dataset → combined graph Dataset (kind ∈ {node, edge}).

    Three stages: vectorized combiner (stateless map_batches), then the
    segment merge — one sort on ``(kind, k1, k2, salt)`` followed by a
    block-level vectorized merge + finalize (``strategy="sorted"``, the
    default) or the legacy two-shuffle ``groupby().map_groups`` path
    (``strategy="groupby"``, kept for row-for-row equivalence tests).

    ``merge_cap`` bounds every accumulated list to its first-``cap``
    entries by occurrence at every stage (associative, deterministic);
    0 = exact full accumulation.  At web scale a hot entity would otherwise
    accumulate one description per mentioning document — unbounded row
    width the summarizer only bounds AFTER the shuffle has paid for it.

    The combiner task pool is CAPPED (``_combine_width``): the kernel is a
    chain of 1M-row Arrow hash-aggregates — memory-bandwidth-bound, not
    CPU-bound — and at 32 concurrent tasks per node the per-task wall blew
    up ~8× (61 s mean vs 7 s at 8-way on identical bundles, measured r3;
    RAM was plentiful, so this is cache/bandwidth saturation, the classic
    hash-aggregate scaling wall).  8 tasks per node saturate the memory
    system; the freed CPU slots pipeline the upstream chunk/extract actors
    instead of fighting the combiner for bandwidth.
    """
    partials = mentions.map_batches(
        lambda b: combine_mentions(b, salt_buckets, merge_cap),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=_combine_width(),
    )
    return _merge_and_finalize(partials, salt_buckets, merge_cap, strategy)


def _combine_width() -> int:
    """Max concurrent combiner tasks: ~8 per node's worth of CPUs, never
    more than the cluster's CPUs.

    The cap is the measured IN-PIPELINE memory-bandwidth saturation point
    per memory system (node) — an ABSOLUTE task count, not a CPU
    fraction.  Standalone-probe trap, measured twice in r3: the packed-int
    kernel alone (K procs × 1M-row bundle, idle box) peaks at K=24
    (5.7 bundles/s vs 2.85 at K=8), but inside the pipeline the chunker /
    extractor actors share the same memory channels, and the quiet-host
    12M-doc A/B at 32 cpus reads width 8 = 166 s / 3,894 work-cpu-s vs
    width 24 = 199 s / 5,106 work-cpu-s (stall cycles count as cpu time)
    and width 4 = 241 s (pipeline starves, idle 3,819 cpu-s).  Tune the
    cap only against the full pipeline; ``$GRAFT_COMBINE_WIDTH`` overrides
    for A/B probes."""
    import os

    env = os.environ.get("GRAFT_COMBINE_WIDTH")
    if env:
        return max(2, int(env))
    try:
        import ray

        cpus = int(ray.cluster_resources().get("CPU", 8))
    except Exception:
        cpus = 8
    return max(2, min(8 * max(1, cpus // 32 + (1 if cpus % 32 else 0)),
                      cpus))


_KEY_COLS = ["kind", "k1", "k2"]


def _sort_width(total_bytes: int = 0) -> int:
    """Target partition count for the canonicalize sort.

    Floor: 4× cluster CPUs (parallelism scales with cluster size while the
    sort's N² shuffle-object count stays bounded — N map partitions each
    split into N ranges, ~1 ms per object; 420 fine-grained partial blocks
    cost 176k objects / 178 s for 221k rows before this coalesce).
    Ceiling guard: never coalesce below ~64 MB per block, so web-scale
    partials keep block sizes the object store can move."""
    try:
        import ray

        cpus = (int(ray.cluster_resources().get("CPU", 8))
                if ray.is_initialized() else 8)
    except Exception:
        cpus = 8
    return max(4, 4 * cpus, int(total_bytes // (64 << 20)))


def _merge_and_finalize(partials, salt_buckets: int, merge_cap: int,
                        strategy: str = "sorted"):
    """Stages B + C over a partials Dataset (shared by the fresh and the
    incremental path).

    ``sorted`` (default): ONE range-partitioning sort on ``(kind, k1, k2,
    salt)`` — salt stays in the sort key so a hot key's partials spread
    over ``salt_buckets`` range boundaries exactly as they spread over
    groupby reducers before — then each block merges ALL of its complete
    key runs with whole-table Arrow hash-aggregates (one kernel dispatch
    per column per BLOCK, not per group) and finalizes them in a narrow
    vectorized pass.  Only the first/last run of each block (the runs that
    can straddle a block split) route through a single small consolidation
    task (the ``sortagg`` boundary-fix pattern).  Replaces two sort-based
    groupby exchanges + ~4 ms/group of per-group Arrow table construction
    with one exchange + per-block kernels.

    ``groupby``: the legacy per-group path (two shuffles); retained as the
    semantics reference for equivalence tests.
    """
    if strategy == "groupby":
        if salt_buckets > 1:
            partials = partials.groupby(
                ["kind", "k1", "k2", "salt"]).map_groups(
                lambda g: merge_partials_group(g, merge_cap),
                batch_format="pyarrow",
            )
        return partials.groupby(_KEY_COLS).map_groups(
            lambda g: finalize_group(g, merge_cap), batch_format="pyarrow"
        )

    # Ray's sort exchanges blocks quadratically in partition count (each of
    # N map partitions splits into N ranges → N² shuffle objects at ~1 ms
    # apiece).  Combiner output rides the upstream task granularity, which
    # can be very fine (measured: 420 partial blocks of ~500 rows → 176k
    # shuffle objects → a 178 s sort for 221k rows).  Coalesce the
    # pre-compressed partials to a cluster-sized width first — one linear
    # pass over data the sort was about to move anyway.
    partials = partials.materialize()
    width = _sort_width(partials.size_bytes() or 0)
    if partials.num_blocks() > width:
        partials = partials.repartition(width)
    merged = (
        partials.sort([*_KEY_COLS, "salt"])
        .map_batches(lambda b: _merge_block_sorted(b, merge_cap),
                     batch_format="pyarrow", batch_size=None)
        .materialize()
    )
    graph = (
        merged.filter(expr="_final == 1")
        .drop_columns(["_final"])
        .map_batches(_finalize_table, batch_format="pyarrow")
    )

    # boundary runs are ≤2 per block by construction — consolidate into ONE
    # narrow task (a groupby here costs a whole extra exchange), re-merge
    # with the same vectorized run-reduce over a locally-sorted batch, and
    # finalize.  NOTE the same bound sortagg documents: every hot key that
    # straddles blocks pays its final combine in this task — identical to
    # the legacy stage-C group for that key, minus the per-key parallelism
    # across DIFFERENT hot keys (acceptable: rows here are pre-compressed
    # per-block partials, ≤ 2 × blocks).
    def fix(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return _empty_graph_table()
        b = b.sort_by([(k, "ascending") for k in _KEY_COLS])
        starts, ends = _block_runs(b, _KEY_COLS)
        return _finalize_table(_merge_sorted_runs(b, starts, ends, merge_cap))

    boundary = (
        merged.filter(expr="_final == 0")
        .drop_columns(["_final"])
        .repartition(1)
        .map_batches(fix, batch_format="pyarrow", batch_size=None)
    )
    return graph.union(boundary)


# ---------------------------------------------------------------------------
# sorted segment-merge kernels (vectorized stages B + C)
# ---------------------------------------------------------------------------

_OCC_FIELDS = ("descs", "kws", "srcids", "ph_descs", "ph_srcids")


def _block_runs(b: pa.Table, keys: list[str]) -> tuple[np.ndarray, np.ndarray]:
    from .sortagg import _runs

    return _runs(b, keys)


def _empty_graph_table() -> pa.Table:
    return pa.Table.from_pydict(
        {n: pa.array([], GRAPH_SCHEMA.field(n).type)
         for n in GRAPH_SCHEMA.names}, schema=GRAPH_SCHEMA)


def _run_offsets(run_ids: np.ndarray, nruns: int) -> pa.Array:
    """Sorted element→run ids → list offsets (one list per run, empties
    included)."""
    counts = np.bincount(run_ids, minlength=nruns)
    return pa.array(np.concatenate(([0], np.cumsum(counts))).astype(np.int32),
                    pa.int32())


def _merge_occ_runs(col, row_run: np.ndarray, nruns: int,
                    cap: int) -> pa.ListArray:
    """Segment-merge one list<struct{occ,text}> column: per (run, text) keep
    the min occ, order each run's entries by occ (occs are unique per
    (key, field, text) by construction), apply the first-``cap`` cap."""
    import pyarrow.compute as pc

    col = col.combine_chunks()
    flat = pc.list_flatten(col)
    if len(flat) == 0:
        return _empty_occ_col(nruns)
    par = pc.list_parent_indices(col).to_numpy(zero_copy_only=False)
    agg = (
        pa.table({"r": pa.array(row_run[par], pa.int64()),
                  "text": pc.struct_field(flat, "text"),
                  "occ": pc.struct_field(flat, "occ")})
        .group_by(["r", "text"])
        .aggregate([("occ", "min")])
        .sort_by([("r", "ascending"), ("occ_min", "ascending")])
    )
    r = agg.column("r").to_numpy(zero_copy_only=False)
    occ = agg.column("occ_min").combine_chunks()
    text = agg.column("text").combine_chunks()
    if cap:
        new = np.concatenate(([True], r[1:] != r[:-1]))
        starts = np.flatnonzero(new)
        pos = np.arange(len(r)) - starts[np.cumsum(new) - 1]
        keep = pos < cap
        idx = pa.array(np.flatnonzero(keep), pa.int64())
        r = r[keep]
        occ = occ.take(idx)
        text = text.take(idx)
    flat_out = pc.make_struct(occ, text, field_names=["occ", "text"])
    return pa.ListArray.from_arrays(_run_offsets(r, nruns), flat_out)


def _merge_types_runs(types_col, counts_col, row_run: np.ndarray,
                      nruns: int) -> tuple[pa.ListArray, pa.ListArray]:
    """Segment-merge the parallel (types, type_counts) lists: per (run,
    type) sum of votes, entries ordered by type name (the finalize tally
    re-orders by (-votes, name), so intra-partial order is cosmetic)."""
    import pyarrow.compute as pc

    types_col = types_col.combine_chunks()
    t = pc.list_flatten(types_col)
    if len(t) == 0:
        return (_empty_list_col(nruns, pa.string()),
                _empty_list_col(nruns, pa.int64()))
    par = pc.list_parent_indices(types_col).to_numpy(zero_copy_only=False)
    agg = (
        pa.table({"r": pa.array(row_run[par], pa.int64()), "t": t,
                  "c": pc.list_flatten(counts_col.combine_chunks())})
        .group_by(["r", "t"])
        .aggregate([("c", "sum")])
        .sort_by([("r", "ascending"), ("t", "ascending")])
    )
    offsets = _run_offsets(agg.column("r").to_numpy(zero_copy_only=False),
                           nruns)
    return (pa.ListArray.from_arrays(offsets, agg.column("t").combine_chunks()),
            pa.ListArray.from_arrays(
                offsets,
                pc.cast(agg.column("c_sum").combine_chunks(), pa.int64())))


def _merge_sorted_runs(b: pa.Table, starts: np.ndarray, ends: np.ndarray,
                       merge_cap: int) -> pa.Table:
    """Merge every key run of a (kind, k1, k2)-sorted partials block into
    one PARTIALS_SCHEMA row — all runs at once, no per-group dispatch."""
    nruns = len(starts)
    row_run = np.repeat(np.arange(nruns, dtype=np.int64), ends - starts)
    starts_idx = pa.array(starts, pa.int64())
    types, type_counts = _merge_types_runs(
        b.column("types"), b.column("type_counts"), row_run, nruns)
    cols = {
        "kind": b.column("kind").combine_chunks().take(starts_idx),
        "k1": b.column("k1").combine_chunks().take(starts_idx),
        "k2": b.column("k2").combine_chunks().take(starts_idx),
        # salt has done its job (it was part of the range-partition key);
        # carry the first value so the schema round-trips
        "salt": b.column("salt").combine_chunks().take(starts_idx),
        "types": types,
        "type_counts": type_counts,
        # weights are dyadic rationals (0.5/1.0 mention weights), so the
        # reduceat order is bit-irrelevant — same invariant the oracle SQL
        # relies on
        "weight": pa.array(
            np.add.reduceat(
                b.column("weight").to_numpy(zero_copy_only=False), starts),
            pa.float64()),
        "mention_count": pa.array(
            np.add.reduceat(
                b.column("mention_count").to_numpy(zero_copy_only=False),
                starts).astype(np.int64),
            pa.int64()),
    }
    for f in _OCC_FIELDS:
        cols[f] = _merge_occ_runs(b.column(f), row_run, nruns, merge_cap)
    return pa.Table.from_pydict(cols).cast(PARTIALS_SCHEMA)


def _merge_block_sorted(b: pa.Table, merge_cap: int) -> pa.Table:
    """Stage B+C map task: merge all complete runs of a sorted block;
    ``_final`` = 0 marks the first/last run (possible straddlers)."""
    if b.num_rows == 0:
        cols = {n: pa.array([], PARTIALS_SCHEMA.field(n).type)
                for n in PARTIALS_SCHEMA.names}
        cols["_final"] = pa.array([], pa.int8())
        return pa.Table.from_pydict(cols)
    starts, ends = _block_runs(b, _KEY_COLS)
    out = _merge_sorted_runs(b, starts, ends, merge_cap)
    interior = np.ones(len(starts), dtype=bool)
    interior[0] = False
    interior[-1] = False
    return out.append_column(
        "_final", pa.array(interior.astype(np.int8), pa.int8()))


def _texts_col(col) -> pa.ListArray:
    """list<struct{occ,text}> (already occ-ordered + capped by the merge) →
    list<string> of the texts, structure preserved."""
    import pyarrow.compute as pc

    col = col.combine_chunks()
    lens = pc.list_value_length(col).to_numpy(zero_copy_only=False)
    offsets = pa.array(
        np.concatenate(([0], np.cumsum(lens))).astype(np.int32), pa.int32())
    return pa.ListArray.from_arrays(
        offsets, pc.struct_field(pc.list_flatten(col), "text"))


def _const_str(value: str, n: int):
    return pa.array(np.full(n, value, dtype=object), pa.string())


def _finalize_table(m: pa.Table) -> pa.Table:
    """Merged partials (ONE row per key) → GRAPH_SCHEMA rows, vectorized.

    Semantics identical to ``finalize_group`` (the per-group reference
    implementation, kept for tests): nodes with real mentions take the
    type-vote argmax under a (-votes, name) order and their entity-side
    lists; zero-mention nodes become UNKNOWN placeholders built from the
    ``ph_*`` lists (J3); edges carry summed weight + desc/kw/src lists.
    List ordering (by occurrence key) and the merge cap were already
    applied by the segment merge.
    """
    import pyarrow.compute as pc

    if m.num_rows == 0:
        return _empty_graph_table()
    kind = m.column("kind")
    mc = m.column("mention_count")
    out: list[pa.Table] = []

    edges = m.filter(pc.equal(kind, "edge"))
    if edges.num_rows:
        n = edges.num_rows
        out.append(pa.Table.from_pydict({
            "kind": _const_str("edge", n),
            "entity_id": _const_str("", n),
            "entity_type": _const_str("", n),
            "src": edges.column("k1"),
            "tgt": edges.column("k2"),
            "weight": edges.column("weight"),
            "descriptions": _texts_col(edges.column("descs")),
            "keywords": _texts_col(edges.column("kws")),
            "source_ids": _texts_col(edges.column("srcids")),
            "mention_count": edges.column("mention_count"),
            "type_names": _empty_list_col(n, pa.string()),
            "type_votes": _empty_list_col(n, pa.int64()),
        }).cast(GRAPH_SCHEMA))

    real = m.filter(pc.and_(pc.equal(kind, "node"), pc.greater(mc, 0)))
    if real.num_rows:
        n = real.num_rows
        types_col = real.column("types").combine_chunks()
        tally = (
            pa.table({
                "r": pc.list_parent_indices(types_col),
                "t": pc.list_flatten(types_col),
                "v": pc.list_flatten(
                    real.column("type_counts").combine_chunks()),
            })
            .sort_by([("r", "ascending"), ("v", "descending"),
                      ("t", "ascending")])
        )
        offsets = _run_offsets(
            tally.column("r").to_numpy(zero_copy_only=False), n)
        names = tally.column("t").combine_chunks()
        # every real node has ≥1 type vote, so each run is non-empty and
        # offsets[:-1] indexes its argmax (first entry under (-v, t) order)
        winner_idx = pa.array(
            np.asarray(offsets)[:-1].astype(np.int64), pa.int64())
        out.append(pa.Table.from_pydict({
            "kind": _const_str("node", n),
            "entity_id": real.column("k1"),
            "entity_type": names.take(winner_idx),
            "src": _const_str("", n),
            "tgt": _const_str("", n),
            "weight": pa.array(np.zeros(n), pa.float64()),
            "descriptions": _texts_col(real.column("descs")),
            "keywords": _empty_list_col(n, pa.string()),
            "source_ids": _texts_col(real.column("srcids")),
            "mention_count": real.column("mention_count"),
            "type_names": pa.ListArray.from_arrays(offsets, names),
            "type_votes": pa.ListArray.from_arrays(
                offsets,
                pc.cast(tally.column("v").combine_chunks(), pa.int64())),
        }).cast(GRAPH_SCHEMA))

    ph = m.filter(pc.and_(pc.equal(kind, "node"), pc.less_equal(mc, 0)))
    if ph.num_rows:
        n = ph.num_rows
        out.append(pa.Table.from_pydict({
            "kind": _const_str("node", n),
            "entity_id": ph.column("k1"),
            "entity_type": _const_str("UNKNOWN", n),
            "src": _const_str("", n),
            "tgt": _const_str("", n),
            "weight": pa.array(np.zeros(n), pa.float64()),
            "descriptions": _texts_col(ph.column("ph_descs")),
            "keywords": _empty_list_col(n, pa.string()),
            "source_ids": _texts_col(ph.column("ph_srcids")),
            "mention_count": ph.column("mention_count"),
            "type_names": _empty_list_col(n, pa.string()),
            "type_votes": _empty_list_col(n, pa.int64()),
        }).cast(GRAPH_SCHEMA))

    return (pa.concat_tables(out) if out else _empty_graph_table())


# occ prefix that sorts before any real occurrence key (real keys start
# with a doc-id character > NUL), so prior-snapshot content keeps its order
# and new mentions append after it — the reference's read-existing-first
# appendIfUnique semantics (insert.go:522-534)
_PRIOR_OCC_PREFIX = "\x00prior\x00"


def _prior_occ(i: int) -> str:
    return f"{_PRIOR_OCC_PREFIX}{i:010d}"


def _prior_occ_entries(col, row_keys=None) -> pa.ListArray:
    """list<string> → list<struct{occ,text}> where each element's occ is
    ``\\x00prior\\x00[<row_key>\\x00]<position>`` — vectorized (offsets
    arithmetic + one string join; no Python loop over the prior graph).

    ``row_keys`` (per-row strings — the row's ORIGINAL surface key) makes
    prior occs UNIQUE ACROSS ROWS: when alias resolution
    (``merge_entities``) relabels two prior rows onto one key, their
    entries merge in (original key, position) order instead of colliding
    on equal positional occs (an equal-occ tie falls back to dict
    insertion order — physical-order-dependent, the exact class the
    determinism invariant forbids).  For single-prior-row merges
    (incremental insert) the key is constant per row, so entry order and
    every output are unchanged."""
    import pyarrow.compute as pc

    col = col.combine_chunks()
    lens = pc.list_value_length(col).to_numpy(zero_copy_only=False)
    lens = np.nan_to_num(lens).astype(np.int64)
    total = int(lens.sum())
    if total == 0:
        return _empty_occ_col(len(lens))
    offsets = pa.array(
        np.concatenate(([0], np.cumsum(lens))).astype(np.int32), pa.int32())
    pos = np.arange(total) - np.repeat(np.cumsum(lens) - lens, lens)
    pos_str = pc.ascii_lpad(pc.cast(pa.array(pos), pa.string()), 10, "0")
    if row_keys is None:
        occ = pc.binary_join_element_wise(
            _const_str(_PRIOR_OCC_PREFIX, total), pos_str, "")
    else:
        keys_arr = pc.cast(row_keys, pa.string())
        if isinstance(keys_arr, pa.ChunkedArray):
            keys_arr = keys_arr.combine_chunks()
        keys = keys_arr.to_numpy(zero_copy_only=False)
        key_rep = pa.array(np.repeat(keys, lens), pa.string())
        occ = pc.binary_join_element_wise(
            _const_str(_PRIOR_OCC_PREFIX, total), key_rep,
            _const_str("\x00", total), pos_str, "")
    flat = pc.make_struct(occ, pc.list_flatten(col),
                          field_names=["occ", "text"])
    return pa.ListArray.from_arrays(offsets, flat)


def _occ_min_prior(desc_col) -> pa.Array:
    """Per-row salt seed: the min occ a prior row's content will carry —
    ``_prior_occ(0)`` when it has descriptions, else the empty floor
    (matches ``_states_to_table``'s ``any_occ`` over descs + ph_descs)."""
    import pyarrow.compute as pc

    return pc.if_else(pc.greater(pc.list_value_length(desc_col), 0),
                      pa.scalar(_prior_occ(0)), pa.scalar("\x7f"))


def graph_to_partials(batch: pa.Table, salt_buckets: int = 8) -> pa.Table:
    """Prior graph snapshot rows → partial rows, re-entering the shuffle.

    Incremental-insert semantics vs the reference (insert.go:499-623):
    weight is additive on top of the stored edge weight; stored
    descriptions/keywords/source_ids come first in merge order (their occ
    keys are ``\\x00prior\\x00``-prefixed, sorting before every real
    occurrence); the stored per-type vote tally (``type_names``/
    ``type_votes``) re-enters the mode vote EXACTLY (the reference votes
    the winner once per upsert call — ours is the associative choice so
    that canonicalize(part1) ⊕ part2 == canonicalize(part1 ∪ part2) for
    ordered splits, including entities whose mentions carry mixed types).
    UNKNOWN placeholders re-enter as placeholder (ph_*) partials, so they
    upgrade in place when real mentions for the name later arrive.

    Fully vectorized: snapshots are one row per key by construction, so
    each prior row maps to exactly one partial row (the downstream merge
    folds any cross-block duplicates) — at web scale the whole prior graph
    flows through here, so no per-row Python.
    """
    import pyarrow.compute as pc

    if batch.num_rows == 0:
        return _states_to_table({}, salt_buckets)
    kind = batch.column("kind").combine_chunks()
    is_node = pc.equal(kind, "node")
    mc = batch.column("mention_count")
    has_tally = "type_names" in batch.column_names
    is_ph = pc.and_(
        pc.and_(is_node,
                pc.equal(batch.column("entity_type"), "UNKNOWN")),
        pc.equal(mc, 0))
    parts: list[pa.Table] = []

    real = batch.filter(pc.and_(is_node, pc.invert(is_ph)))
    if real.num_rows:
        n = real.num_rows
        if has_tally:
            names = real.column("type_names").combine_chunks()
            votes = real.column("type_votes").combine_chunks()
            legacy = pc.equal(pc.list_value_length(names), 0)
            if pc.any(legacy).as_py():
                # legacy snapshot rows without tally columns: winner ×
                # max(1, mention_count) as a single-entry tally
                one = pa.array(np.arange(n + 1, dtype=np.int32), pa.int32())
                names = pc.if_else(
                    legacy,
                    pa.ListArray.from_arrays(
                        one, real.column("entity_type").combine_chunks()),
                    names)
                votes = pc.if_else(
                    legacy,
                    pa.ListArray.from_arrays(
                        one, pc.cast(pc.max_element_wise(
                            real.column("mention_count").combine_chunks(),
                            1), pa.int64())),
                    votes)
        else:
            one = pa.array(np.arange(n + 1, dtype=np.int32), pa.int32())
            names = pa.ListArray.from_arrays(
                one, real.column("entity_type").combine_chunks())
            votes = pa.ListArray.from_arrays(
                one, pc.cast(pc.max_element_wise(
                    real.column("mention_count").combine_chunks(), 1),
                    pa.int64()))
        parts.append(_partial_rows(
            "node", real.column("entity_id").combine_chunks(), None,
            salt_buckets=salt_buckets,
            occ_min=_occ_min_prior(real.column("descriptions")),
            types=names, type_counts=votes,
            weight=real.column("weight").combine_chunks(),
            mention_count=real.column("mention_count").combine_chunks(),
            descs=_prior_occ_entries(real.column("descriptions"),
                                      real.column("entity_id")),
            kws=_prior_occ_entries(real.column("keywords"),
                                   real.column("entity_id")),
            srcids=_prior_occ_entries(real.column("source_ids"),
                                      real.column("entity_id")),
        ))

    ph = batch.filter(is_ph)
    if ph.num_rows:
        parts.append(_partial_rows(
            "node", ph.column("entity_id").combine_chunks(), None,
            salt_buckets=salt_buckets,
            occ_min=_occ_min_prior(ph.column("descriptions")),
            weight=ph.column("weight").combine_chunks(),
            mention_count=ph.column("mention_count").combine_chunks(),
            kws=_prior_occ_entries(ph.column("keywords"),
                                   ph.column("entity_id")),
            ph_descs=_prior_occ_entries(ph.column("descriptions"),
                                        ph.column("entity_id")),
            ph_srcids=_prior_occ_entries(ph.column("source_ids"),
                                         ph.column("entity_id")),
        ))

    edges = batch.filter(pc.invert(is_node))
    if edges.num_rows:
        ekey = pc.binary_join_element_wise(
            edges.column("src").combine_chunks(),
            edges.column("tgt").combine_chunks(), "\x00")
        parts.append(_partial_rows(
            "edge", edges.column("src").combine_chunks(),
            edges.column("tgt").combine_chunks(),
            salt_buckets=salt_buckets,
            occ_min=_occ_min_prior(edges.column("descriptions")),
            weight=edges.column("weight").combine_chunks(),
            mention_count=edges.column("mention_count").combine_chunks(),
            descs=_prior_occ_entries(edges.column("descriptions"), ekey),
            kws=_prior_occ_entries(edges.column("keywords"), ekey),
            srcids=_prior_occ_entries(edges.column("source_ids"), ekey),
        ))

    return (pa.concat_tables(parts) if parts
            else _states_to_table({}, salt_buckets))


def canonicalize_incremental(mentions, prior_graph, salt_buckets: int = 8,
                             batch_size: int = 8192, merge_cap: int = 0,
                             strategy: str = "sorted",
                             pre_combined: bool = False):
    """Incremental insert: new mentions merged with a prior graph snapshot
    in ONE shuffle — the reference's point-lookup upsert loop becomes a
    union of partials (new combiner output ∪ snapshot partials) flowing
    through the same salted merge + finalize.  No join, no per-key reads.

    ``pre_combined=True`` accepts stage-A PARTIALS instead of raw
    mentions (the fused chunk→extract→combine path, pipelines/kg.py) and
    skips the combiner here — the merge algebra is identical.
    """
    if pre_combined:
        new_partials = mentions
    else:
        new_partials = mentions.map_batches(
            lambda b: combine_mentions(b, salt_buckets, merge_cap),
            batch_format="pyarrow",
            batch_size=batch_size,
            concurrency=_combine_width(),
        )
    prior_partials = prior_graph.map_batches(
        lambda b: graph_to_partials(b, salt_buckets),
        batch_format="pyarrow",
    )
    return _merge_and_finalize(new_partials.union(prior_partials),
                               salt_buckets, merge_cap, strategy)


def sep_join(values: list[str]) -> str:
    """Render the reference's ``<SEP>``-joined string form (insert.go:538,623)."""
    return GRAPH_FIELD_SEPARATOR.join(values)


def merge_entities(
    graph,
    pairs,
    threshold: float = 0.0,
    score_col: str = "jaccard",
    salt_buckets: int = 8,
    merge_cap: int = 0,
    strategy: str = "sorted",
    max_driver_pairs: int = 2_000_000,
    cc_local_threshold: int = 1 << 20,
):
    """Alias resolution over the canonical graph: accepted entity pairs →
    one merged graph with unified ids.

    The reference canonicalizes only by EXACT normalized name
    (insert.go:454-520); this is the fuzzy complement — feed it candidate
    pairs from ``stages/linking.name_gram_pairs`` (string side) or
    ``graphalg.neighbor_jaccard`` (structural side) and every connected
    component of accepted pairs collapses onto its lexicographically
    smallest member.  Semantics come FOR FREE from the incremental-insert
    machinery: relabeled graph rows re-enter the shuffle as prior-snapshot
    partials (``graph_to_partials``), so description/keyword/source lists
    merge position-ordered with text tie-break, type-vote tallies sum
    before the argmax, weights and mention counts add, and a placeholder
    merging into a real entity upgrades in place (its ph_* content drops
    exactly as J3 prescribes).  Edges re-point at the merged ids and
    co-located duplicates fold in the same pass.

    Distributed shape: component labeling delegates to the dedup
    clustering engine; the alias map (only entities whose id CHANGES) is
    broadcast once via ``ray.put`` — it is bounded by 2·|accepted pairs|,
    the small side by construction (an accept set that rivals the entity
    table is a linking-threshold bug, not a data size) — and the relabel +
    re-merge is one vectorized ``index_in`` map followed by the standard
    salted merge.  ``pairs`` rows below ``threshold`` on ``score_col`` are
    ignored (0.0 accepts every candidate row).
    """
    import pyarrow.compute as pc
    import ray

    from .dedup import cluster_duplicates

    if threshold > 0.0:
        pairs = pairs.map_batches(
            lambda b: b.filter(
                pc.greater_equal(b.column(score_col), threshold)),
            batch_format="pyarrow")

    def endpoints(b: pa.Table) -> pa.Table:
        return pa.table({"entity_id": pa.concat_arrays([
            pc.cast(b.column("a").combine_chunks(), pa.string()),
            pc.cast(b.column("b").combine_chunks(), pa.string())])})

    ends = pairs.map_batches(endpoints, batch_format="pyarrow")
    labels = cluster_duplicates(
        ends, pairs, id_col="entity_id",
        max_driver_pairs=max_driver_pairs,
        cc_local_threshold=cc_local_threshold)
    amap: dict[str, str] = {}
    for r in labels.take_all():  # the small side: linked aliases only
        if r["doc_id"] != r["cluster_id"]:
            amap[r["doc_id"]] = r["cluster_id"]
    if not amap:
        return graph

    old = sorted(amap)
    map_ref = ray.put(pa.table({
        "old": pa.array(old, pa.string()),
        "new": pa.array([amap[k] for k in old], pa.string()),
    }))

    # partials FIRST: graph_to_partials embeds each row's ORIGINAL surface
    # key in its prior occ strings (the deterministic cross-constituent
    # merge order), THEN the partial keys relabel — relabeling the graph
    # rows first would stamp every constituent with the merged id and
    # collide the occs again
    def relabel(b: pa.Table) -> pa.Table:
        m = ray.get(map_ref)
        o, nw = m.column("old").combine_chunks(), m.column("new")
        for name in ("k1", "k2"):
            col = b.column(name).combine_chunks()
            idx = pc.index_in(col, o)
            repl = pc.take(nw, idx).combine_chunks()
            b = b.set_column(
                b.column_names.index(name), name,
                pc.if_else(pc.is_valid(idx), repl, col))
        return b

    prior = graph.map_batches(
        lambda b: graph_to_partials(b, salt_buckets),
        batch_format="pyarrow",
    ).map_batches(relabel, batch_format="pyarrow")
    return _merge_and_finalize(prior, salt_buckets, merge_cap, strategy)
