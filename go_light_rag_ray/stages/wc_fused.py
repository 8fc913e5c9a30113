"""Deep-fused combiner kernel for the word-co-occurrence rule set:
chunks → stage-A partials WITHOUT materializing the mention table.

The generic fused path (kg.FusedExtractCombine) runs three kernels per
batch: extract (builds a ~4.6 KB/doc mention table — 2.35 M rows / 323 MB
per 64 k-doc batch, every name/description/keyword as a full string) then
combine (which immediately dictionary-encodes those strings back to
integers, aggregates, and decodes the ≤ ~300 surviving rows).  At high
actor counts per node that round trip is pure memory-bandwidth demand on
data that never leaves the task — the measured cause of the 32-way
work-cpu inflation in the scaling bracket.

This kernel exploits what the generic path cannot assume: for a closed
rule vocabulary every extracted string is a FUNCTION of small codes —

    entity name/type   = f(word code)            (12-word gazetteer)
    description        = f(key codes, doc)       ("A co-occurs with B in d")
    keywords           = constants per round
    source chunk id    = the chunk row's own id

so extraction and combination both run in the packed-int domain: word
codes via one ``index_in`` against the sorted vocabulary, and every
(key, text-identity, occurrence) dedup as ONE ``np.sort`` of a packed
int64 whose low bits are the occ (min-occ per (key, text) = first of
run — no hash aggregation at all).  Strings are built ONLY for entries
that survive the per-batch dedup + merge_cap.  Output is partial-row
identical to ``combine_mentions(word_cooccurrence_batch(chunks))`` —
asserted row-for-row in test_fused — so every downstream merge/finalize
stage and the driver's kg_* value oracles are unchanged.

Generic rule sets (LLM extraction, pattern rules) keep the generic path;
``kg.FusedExtractCombine`` dispatches here only for
``rules="word_cooccurrence"`` and falls back when a batch overflows the
62-bit packing budget (``word_cooccurrence_partials`` returns None).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .canonicalize import (
    _bitwidth,
    _IntEnc,
    _partial_rows,
    _states_to_table,
)
from .extractor import WORD_ENTITY_TYPES, WORD_REL_VOCAB

# sorted lowercase relationship vocabulary; all-ASCII-lowercase, so the
# uppercase surface keys sort in the same order and code rank == key rank
_VOCAB = sorted(WORD_REL_VOCAB)
_VOCAB_ARR = pa.array(_VOCAB, pa.string())
_VOCAB_UPPER = pa.array([w.upper() for w in _VOCAB], pa.string())
_IS_ENTITY = np.array([w in WORD_ENTITY_TYPES for w in _VOCAB])
_TYPE_OF = pa.array(
    [WORD_ENTITY_TYPES.get(w, "") for w in _VOCAB], pa.string())
_NV = len(_VOCAB)
_KEY_BITS = _bitwidth(_NV - 1)

_ADJ_KWS = ["CO_OCCURS", "ADJACENT"]
_GLEAN_KWS = ["NEAR"]
_KW_DICT = pa.array(_ADJ_KWS + _GLEAN_KWS, pa.string())
_ADJ_VERB = " co-occurs with "
_GLEAN_VERB = " near "


class _OccCodec:
    """The occ-int layout of ``_IntEnc`` over this batch's docs; decode is
    borrowed unbound from ``_IntEnc`` so the string form stays identical."""

    def __init__(self, docs_u: pa.Array, max_order: int, max_mi: int):
        self.docs_u = docs_u
        self.bo = _bitwidth(max_order)
        self.bm = _bitwidth(max_mi)
        self.bp = 1          # kw position ∈ {0, 1}
        self.bits = _bitwidth(max(0, len(docs_u) - 1)) + self.bo + self.bm

    def pack(self, d: np.ndarray, order: np.ndarray, mi: np.ndarray):
        return (d << (self.bo + self.bm)) | (order << self.bm) | mi

    decode = _IntEnc.decode_occ


def _dedup_runs(key: np.ndarray, t: np.ndarray, occ: np.ndarray,
                tb: int, ob: int, cap: int):
    """(key, text-code, occ) streams → per-key occ-ordered capped entry
    runs, via two plain int64 sorts (no hash aggregation):

    1. sort ``key·t·occ`` packed — first element of each (key, t) run is
       its min occ (level-1 dedup);
    2. sort survivors as ``key·occ·t`` packed — per-key entries land in
       occ order (the canonical within-list order) and the first entry
       of each key run is the key's occ floor (the salt seed).

    Returns (k_unique, lens, t_flat, occ_flat, occ_min) with the
    merge_cap already applied positionally."""
    if len(key) == 0:
        z = np.empty(0, np.int64)
        return z, z, z, z, z
    pack = (key << np.int64(tb + ob)) | (t << np.int64(ob)) | occ
    s = np.sort(pack)
    kt = s >> np.int64(ob)
    first = np.empty(len(s), bool)
    first[0] = True
    np.not_equal(kt[1:], kt[:-1], out=first[1:])
    sel = s[first]
    o1 = sel & np.int64((1 << ob) - 1)
    t1 = (sel >> np.int64(ob)) & np.int64((1 << tb) - 1)
    k1 = sel >> np.int64(tb + ob)
    pack2 = (k1 << np.int64(ob + tb)) | (o1 << np.int64(tb)) | t1
    s2 = np.sort(pack2)
    k2 = s2 >> np.int64(ob + tb)
    first2 = np.empty(len(s2), bool)
    first2[0] = True
    np.not_equal(k2[1:], k2[:-1], out=first2[1:])
    starts = np.flatnonzero(first2)
    lens = np.diff(np.append(starts, len(s2)))
    occ_f = (s2 >> np.int64(tb)) & np.int64((1 << ob) - 1)
    t_f = s2 & np.int64((1 << tb) - 1)
    k_u = k2[starts]
    occ_min = occ_f[starts]
    if cap and (lens > cap).any():
        pos = np.arange(len(s2)) - np.repeat(starts, lens)
        keep = pos < cap
        occ_f = occ_f[keep]
        t_f = t_f[keep]
        lens = np.minimum(lens, cap)
    return k_u, lens, t_f, occ_f, occ_min


def _occ_col(k_u, lens, t_f, occ_f, codec: _OccCodec, text_fn,
             kw: bool = False) -> pa.ListArray:
    offsets = pa.array(np.concatenate(([0], np.cumsum(lens))), pa.int32())
    flat = pc.make_struct(
        codec.decode(occ_f, kw=kw),
        text_fn(t_f, np.repeat(k_u, lens)),
        field_names=["occ", "text"])
    return pa.ListArray.from_arrays(offsets, flat)


def word_cooccurrence_partials(
    chunks: pa.Table, salt_buckets: int, merge_cap: int, glean: bool = True,
) -> pa.Table | None:
    """Chunks → PARTIALS_SCHEMA rows, or None when the batch overflows the
    packing budget (caller falls back to the generic extract+combine)."""
    if chunks.num_rows == 0:
        return _states_to_table({}, salt_buckets, merge_cap)

    n_rows = chunks.num_rows
    doc_ids = pc.cast(chunks.column("doc_id"), pa.string()).combine_chunks()
    chunk_ids = pc.cast(chunks.column("chunk_id"), pa.string()).combine_chunks()
    orders_row = chunks.column("order_index").to_numpy(
        zero_copy_only=False).astype(np.int64)
    if orders_row.min(initial=0) < 0:
        return None

    # chunk-row → doc rank (sorted-unique ranks: int order == string order)
    docs_u = pc.unique(doc_ids)
    docs_u = docs_u.take(pc.array_sort_indices(docs_u))
    d_row = pc.index_in(doc_ids, value_set=docs_u).cast(pa.int64()).to_numpy(
        zero_copy_only=False)
    cenc = chunk_ids.dictionary_encode()
    chunk_u = cenc.dictionary
    c_row = cenc.indices.cast(pa.int64()).to_numpy(zero_copy_only=False)
    bc = _bitwidth(max(1, len(chunk_u) - 1))

    # ---- flat word stream → codes (the only corpus-sized string pass) ---
    words = pc.ascii_split_whitespace(
        pc.cast(chunks.column("content"), pa.string())).combine_chunks()
    flat_all = pc.list_flatten(words)
    lens_all = pc.list_value_length(words).to_numpy(zero_copy_only=False)
    lens_all = np.nan_to_num(lens_all).astype(np.int64)
    par_all = np.repeat(np.arange(n_rows), lens_all)
    code_all = pc.index_in(flat_all, value_set=_VOCAB_ARR).cast(
        pa.int64()).fill_null(-1).to_numpy(zero_copy_only=False)
    nonempty = pc.not_equal(flat_all, "").to_numpy(zero_copy_only=False)
    keep = np.nonzero(nonempty)[0]
    code = code_all[keep]
    par = par_all[keep]
    is_rel = code >= 0

    # ---- mention selections (identical to word_cooccurrence_batch) ------
    ent_mask = is_rel & _IS_ENTITY[np.maximum(code, 0)]
    ent_sel = np.nonzero(ent_mask)[0]

    def pairs_at(dist: int) -> np.ndarray:
        if len(par) <= dist:
            return np.array([], dtype=np.int64)
        same_chunk = par[:-dist] == par[dist:]
        both = is_rel[:-dist] & is_rel[dist:]
        differ = code[:-dist] != code[dist:]
        return np.nonzero(same_chunk & both & differ)[0]

    adj_sel = pairs_at(1)
    glean_sel = pairs_at(2) if glean else np.array([], dtype=np.int64)

    ent_par = par[ent_sel]
    adj_par = par[adj_sel]
    glean_par = par[glean_sel]
    ent_counts = np.bincount(ent_par, minlength=n_rows)
    adj_counts = np.bincount(adj_par, minlength=n_rows)

    def cumcount(g: np.ndarray) -> np.ndarray:
        if len(g) == 0:
            return np.array([], dtype=np.int64)
        change = np.r_[True, g[1:] != g[:-1]]
        starts = np.nonzero(change)[0]
        return np.arange(len(g)) - np.repeat(
            starts, np.diff(np.r_[starts, len(g)]))

    ent_mi = cumcount(ent_par)
    adj_mi = ent_counts[adj_par] + cumcount(adj_par)
    glean_mi = (ent_counts[glean_par] + adj_counts[glean_par]
                + cumcount(glean_par))

    max_mi = max((int(a.max()) for a in (ent_mi, adj_mi, glean_mi)
                  if len(a)), default=0)
    codec = _OccCodec(docs_u, int(orders_row.max(initial=0)), max_mi)
    nd = len(docs_u)
    bd = _bitwidth(max(1, nd - 1))
    ob = codec.bits
    # Every _dedup_runs pack below must fit 62 bits (sign-safe int64 sort).
    # Widest by family: ph desc = KB + (ek + verb + doc) = 3KB + 1 + bd;
    # edge srcid = ek + chunk = 2KB + bc; kw = ek + 2 + (occ·pos) pos bit.
    # The ent packs (KB + bd / KB + bc) are strictly narrower.
    if max(3 * _KEY_BITS + 1 + bd,
           2 * _KEY_BITS + bc,
           2 * _KEY_BITS + 3) + ob > 62:
        return None

    ent_occ = codec.pack(d_row[ent_par], orders_row[ent_par], ent_mi)
    adj_occ = codec.pack(d_row[adj_par], orders_row[adj_par], adj_mi)
    glean_occ = codec.pack(d_row[glean_par], orders_row[glean_par], glean_mi)

    parts: list[pa.Table] = []

    def key_str(codes: np.ndarray) -> pa.Array:
        return _VOCAB_UPPER.take(pa.array(codes, pa.int64()))

    def chunk_text(t: np.ndarray, _k: np.ndarray) -> pa.Array:
        return chunk_u.take(pa.array(t, pa.int64()))

    # ---- entity partials -------------------------------------------------
    if len(ent_sel):
        nk = code[ent_sel]
        # type tally: one type per gazetteer word → per-key single entry
        ks, counts = np.unique(nk, return_counts=True)
        one = pa.array(np.arange(len(ks) + 1, dtype=np.int32))
        type_lists = pa.ListArray.from_arrays(
            one, _TYPE_OF.take(pa.array(ks, pa.int64())))
        count_lists = pa.ListArray.from_arrays(
            one, pa.array(counts.astype(np.int64)))

        def ent_desc_fn(t: np.ndarray, k: np.ndarray) -> pa.Array:
            return pc.binary_join_element_wise(
                key_str(k), " appears in ",
                docs_u.take(pa.array(t, pa.int64())), "")

        dk, dl, dt, do, dmin = _dedup_runs(
            nk, d_row[ent_par], ent_occ, bd, ob, merge_cap)
        sk, sl, st, so, _ = _dedup_runs(
            nk, c_row[ent_par], ent_occ, bc, ob, merge_cap)
        # every entity mention carries desc+srcid+type → identical sorted
        # key sets across the three aggregations
        parts.append(_partial_rows(
            "node", key_str(ks), None, salt_buckets=salt_buckets,
            occ_min=codec.decode(dmin),
            types=type_lists, type_counts=count_lists,
            mention_count=pa.array(counts.astype(np.int64)),
            descs=_occ_col(dk, dl, dt, do, codec, ent_desc_fn),
            srcids=_occ_col(sk, sl, st, so, codec, chunk_text),
        ))

    # ---- edge + keyword + placeholder partials ---------------------------
    n_adj, n_glean = len(adj_sel), len(glean_sel)
    if n_adj + n_glean:
        src_c = np.concatenate([code[adj_sel], code[glean_sel]])
        tgt_c = np.concatenate([code[adj_sel + 1], code[glean_sel + 2]])
        rel_par = np.concatenate([adj_par, glean_par])
        occ = np.concatenate([adj_occ, glean_occ])
        verb = np.concatenate([np.zeros(n_adj, np.int64),
                               np.ones(n_glean, np.int64)])
        w = np.concatenate([np.full(n_adj, 1.0), np.full(n_glean, 0.5)])
        ek = (src_c << _KEY_BITS) | tgt_c
        d = d_row[rel_par]
        c = c_row[rel_par]
        # desc identity for a fixed pair = (verb, doc); for a fixed
        # endpoint it additionally needs the pair itself
        t_desc = (verb << np.int64(bd)) | d
        t_ph = (((ek << np.int64(1)) | verb) << np.int64(bd)) | d
        tb_desc = 1 + bd
        tb_ph = 2 * _KEY_BITS + 1 + bd

        def edge_desc(t: np.ndarray, pair: np.ndarray) -> pa.Array:
            vb = t >> np.int64(bd)
            dd = t & np.int64((1 << bd) - 1)
            verbs = pa.array(np.where(vb == 1, _GLEAN_VERB, _ADJ_VERB),
                             pa.string())
            return pc.binary_join_element_wise(
                key_str(pair >> _KEY_BITS), verbs,
                key_str(pair & ((1 << _KEY_BITS) - 1)), " in ",
                docs_u.take(pa.array(dd, pa.int64())), "")

        def ph_desc(t: np.ndarray, _k: np.ndarray) -> pa.Array:
            return edge_desc(t & np.int64((1 << tb_desc) - 1), t >> np.int64(tb_desc))

        # weight sum + mention count per pair: bincount over ≤ NV² bins
        # (dyadic weights — summation order is bit-irrelevant)
        nbins = 1 << (2 * _KEY_BITS)
        wsum = np.bincount(ek, weights=w, minlength=nbins)
        wcnt = np.bincount(ek, minlength=nbins)
        e_codes = np.flatnonzero(wcnt)

        dk, dl, dt, do, dmin = _dedup_runs(
            ek, t_desc, occ, tb_desc, ob, merge_cap)
        sk, sl, st, so, _ = _dedup_runs(ek, c, occ, bc, ob, merge_cap)
        parts.append(_partial_rows(
            "edge", key_str(e_codes >> _KEY_BITS),
            key_str(e_codes & ((1 << _KEY_BITS) - 1)),
            salt_buckets=salt_buckets, occ_min=codec.decode(dmin),
            weight=pa.array(wsum[e_codes], pa.float64()),
            mention_count=pa.array(wcnt[e_codes].astype(np.int64)),
            descs=_occ_col(dk, dl, dt, do, codec, edge_desc),
            srcids=_occ_col(sk, sl, st, so, codec, chunk_text),
        ))

        # keywords: adj mentions carry [CO_OCCURS, ADJACENT], glean [NEAR]
        kw_ek = np.concatenate([np.repeat(ek[:n_adj], 2), ek[n_adj:]])
        kw_t = np.concatenate([np.tile(np.array([0, 1], np.int64), n_adj),
                               np.full(n_glean, 2, np.int64)])
        kw_pos = np.concatenate([np.tile(np.array([0, 1], np.int64), n_adj),
                                 np.zeros(n_glean, np.int64)])
        kw_occ = (np.concatenate([np.repeat(occ[:n_adj], 2), occ[n_adj:]])
                  << np.int64(codec.bp)) | kw_pos
        kk, kl, kt, ko, kmin = _dedup_runs(
            kw_ek, kw_t, kw_occ, 2, ob + codec.bp, merge_cap)
        parts.append(_partial_rows(
            "edge", key_str(kk >> _KEY_BITS),
            key_str(kk & ((1 << _KEY_BITS) - 1)),
            salt_buckets=salt_buckets, occ_min=codec.decode(kmin, kw=True),
            kws=_occ_col(
                kk, kl, kt, ko, codec,
                lambda t, k: _KW_DICT.take(pa.array(t, pa.int64())),
                kw=True),
        ))

        # dangling-endpoint placeholders: both endpoints, edge desc/srcid
        ep_k = np.concatenate([src_c, tgt_c])
        ep_occ = np.concatenate([occ, occ])
        pk, pl, pt, po, pmin = _dedup_runs(
            ep_k, np.concatenate([t_ph] * 2), ep_occ, tb_ph, ob, merge_cap)
        qk, ql, qt, qo, _ = _dedup_runs(
            ep_k, np.concatenate([c] * 2), ep_occ, bc, ob, merge_cap)
        parts.append(_partial_rows(
            "node", key_str(pk), None,
            salt_buckets=salt_buckets, occ_min=codec.decode(pmin),
            ph_descs=_occ_col(pk, pl, pt, po, codec, ph_desc),
            ph_srcids=_occ_col(qk, ql, qt, qo, codec, chunk_text),
        ))

    return (pa.concat_tables(parts) if parts
            else _states_to_table({}, salt_buckets, merge_cap))
