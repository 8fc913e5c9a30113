"""Vectorized extraction kernel for the word-co-occurrence rule set.

The per-row rule engine (``WordCooccurrenceRules.extract_rounds``) walks
every word of every chunk in Python — ~125 s of aggregate CPU per million
documents in the scaling run, the second-largest stage cost.  This kernel
computes the IDENTICAL mentions table (bit-exact per the driver's
``mentions`` value oracle, including per-chunk ``mention_index``
sequencing) from Arrow/numpy primitives:

* words: ``ascii_split_whitespace`` → flattened stream + parent row index;
* entity mentions: ``index_in`` against the gazetteer, descriptions built
  with one ``binary_join_element_wise``;
* CO_OCCURS / NEAR pairs: shifted-mask comparisons on the flat stream
  (parent equality keeps pairs inside their chunk);
* ``mention_index``: per-chunk cumcounts with entity < adjacent < glean
  ordering, matching ``extract_rounds``'s accumulation order exactly.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .extractor import MENTIONS_SCHEMA, WORD_ENTITY_TYPES, WORD_REL_VOCAB

_ENTITY_WORDS = list(WORD_ENTITY_TYPES)
_ENTITY_TYPES = [WORD_ENTITY_TYPES[w] for w in _ENTITY_WORDS]
_ENTITY_UPPER = [w.upper() for w in _ENTITY_WORDS]
_REL_WORDS = sorted(WORD_REL_VOCAB)
_REL_UPPER = {w: w.upper() for w in _REL_WORDS}


def _const_list_col(n: int, values: list[str]) -> pa.ListArray:
    """n rows, each the same small list of strings."""
    k = len(values)
    if k == 0:
        offsets = pa.array(np.zeros(n + 1, dtype=np.int32))
        return pa.ListArray.from_arrays(offsets, pa.array([], pa.string()))
    offsets = pa.array(np.arange(0, (n + 1) * k, k, dtype=np.int32))
    flat = pa.array(np.tile(np.array(values, dtype=object), n), pa.string())
    return pa.ListArray.from_arrays(offsets, flat)


def _cumcount(group_ids: np.ndarray) -> np.ndarray:
    """Per-group 0..k-1 counters over a group-sorted id array."""
    if len(group_ids) == 0:
        return np.array([], dtype=np.int64)
    change = np.r_[True, group_ids[1:] != group_ids[:-1]]
    starts = np.nonzero(change)[0]
    return np.arange(len(group_ids)) - np.repeat(
        starts, np.diff(np.r_[starts, len(group_ids)]))


def word_cooccurrence_batch(batch: pa.Table, glean: bool = True) -> pa.Table:
    n_rows = batch.num_rows
    if n_rows == 0:
        return MENTIONS_SCHEMA.empty_table()

    # Ray Data ships these as large_string; normalize so every downstream
    # kernel (binary_join_element_wise in particular) sees plain string
    doc_ids = pc.cast(batch.column("doc_id"), pa.string()).combine_chunks()
    chunk_ids = pc.cast(batch.column("chunk_id"), pa.string()).combine_chunks()
    orders = batch.column("order_index").combine_chunks()

    words = pc.ascii_split_whitespace(
        pc.cast(batch.column("content"), pa.string())
    ).combine_chunks()
    # ascii_split_whitespace emits empty strings around leading/trailing
    # whitespace — drop them from the flat stream (``\S+`` semantics)
    flat_all = pc.list_flatten(words)
    lens_all = pc.list_value_length(words).to_numpy(zero_copy_only=False)
    lens_all = np.nan_to_num(lens_all).astype(np.int64)
    par_all = np.repeat(np.arange(n_rows), lens_all)
    nonempty = pc.not_equal(flat_all, "").to_numpy(zero_copy_only=False)
    keep = np.nonzero(nonempty)[0]
    flat = flat_all.take(pa.array(keep))
    par = par_all[keep]

    # ---- entity mentions (round 0, word order) -------------------------
    ent_idx = pc.index_in(flat, pa.array(_ENTITY_WORDS)).to_numpy(
        zero_copy_only=False)
    ent_mask = ~np.isnan(ent_idx) if ent_idx.dtype.kind == "f" else ent_idx >= 0
    ent_sel = np.nonzero(ent_mask)[0]
    ent_lookup = ent_idx[ent_sel].astype(np.int64)
    ent_par = par[ent_sel]
    ent_names = pa.array(np.array(_ENTITY_UPPER, dtype=object)[ent_lookup],
                         pa.string())
    ent_types = pa.array(np.array(_ENTITY_TYPES, dtype=object)[ent_lookup],
                         pa.string())
    ent_docs = doc_ids.take(pa.array(ent_par))
    ent_desc = pc.binary_join_element_wise(ent_names, " appears in ",
                                           ent_docs, "")

    # ---- pairs ---------------------------------------------------------
    is_rel = pc.is_in(flat, value_set=pa.array(_REL_WORDS)).to_numpy(
        zero_copy_only=False).astype(bool)

    def pairs_at(dist: int):
        if len(par) <= dist:
            return np.array([], dtype=np.int64)
        same_chunk = par[:-dist] == par[dist:]
        both = is_rel[:-dist] & is_rel[dist:]
        differ = pc.not_equal(
            flat.slice(0, len(par) - dist), flat.slice(dist)
        ).to_numpy(zero_copy_only=False).astype(bool)
        return np.nonzero(same_chunk & both & differ)[0]

    def rel_part(sel: np.ndarray, dist: int, kws: list[str], weight: float,
                 verb: str):
        a = flat.take(pa.array(sel))
        b = flat.take(pa.array(sel + dist))
        ua = pc.ascii_upper(a)
        ub = pc.ascii_upper(b)
        p = par[sel]
        docs = doc_ids.take(pa.array(p))
        desc = pc.binary_join_element_wise(ua, verb, ub, " in ", docs, "")
        return p, ua, ub, desc, kws, weight

    adj_sel = pairs_at(1)
    glean_sel = pairs_at(2) if glean else np.array([], dtype=np.int64)

    # ---- per-chunk mention_index sequencing ----------------------------
    ent_counts = np.bincount(ent_par, minlength=n_rows)
    adj_par = par[adj_sel]
    adj_counts = np.bincount(adj_par, minlength=n_rows)
    ent_mi = _cumcount(ent_par)
    adj_mi = ent_counts[adj_par] + _cumcount(adj_par)
    glean_par = par[glean_sel]
    glean_mi = (ent_counts[glean_par] + adj_counts[glean_par]
                + _cumcount(glean_par))

    # ---- assemble ------------------------------------------------------
    def part(p, mi, kind, name, typ, src, tgt, desc, kws, weight):
        m = len(p)
        empty = pa.array([""] * m, pa.string())
        return pa.Table.from_pydict({
            "doc_id": doc_ids.take(pa.array(p)),
            "chunk_id": chunk_ids.take(pa.array(p)),
            "order_index": pc.cast(orders.take(pa.array(p)), pa.int32()),
            "mention_index": pa.array(mi.astype(np.int32)),
            "kind": pa.array([kind] * m, pa.string()),
            "name": name if name is not None else empty,
            "type": typ if typ is not None else empty,
            "src": src if src is not None else empty,
            "tgt": tgt if tgt is not None else empty,
            "description": desc,
            "keywords": _const_list_col(m, kws),
            "weight": pa.array(np.full(m, weight)),
        }, schema=MENTIONS_SCHEMA)

    parts = [part(ent_par, ent_mi, "entity", ent_names, ent_types,
                  None, None, ent_desc, [], 0.0)]
    if len(adj_sel):
        p, ua, ub, desc, kws, w = rel_part(
            adj_sel, 1, ["CO_OCCURS", "ADJACENT"], 1.0, " co-occurs with ")
        parts.append(part(p, adj_mi, "relationship", None, None, ua, ub,
                          desc, kws, w))
    if len(glean_sel):
        p, ua, ub, desc, kws, w = rel_part(
            glean_sel, 2, ["NEAR"], 0.5, " near ")
        parts.append(part(p, glean_mi, "relationship", None, None, ua, ub,
                          desc, kws, w))
    return pa.concat_tables(parts)
