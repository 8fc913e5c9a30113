"""Exact substring (duplicate-span) dedup: find maximal duplicated token
spans across the corpus, Lee et al. 2021 ("Deduplicating Training Data
Makes Language Models Better") style.

The reference deduplicates whole chunks by content hash (storage KV ids,
reference storage/storage.go); a web-scale training-data pipeline also
needs SUB-document dedup: any positional k-gram that occurs ≥2 times
anywhere in the corpus marks its token range, and overlapping/adjacent
ranges merge into maximal removable spans per document.

Shape (all-Arrow, one sort, no joins):

1. ``positional_kgrams`` — map_batches: tokenize (whitespace, matching the
   ``\\S+`` oracle), build every positional k-gram with VECTORIZED Arrow
   kernels (k shifted takes of the flat token array +
   ``binary_join_element_wise``; no per-gram Python), hash each gram to 64
   bits with a (crc32, fnv1a64) pair — two structurally INDEPENDENT
   vectorized kernels (O(bytes) numpy, no per-row Python).  Rows ≈ corpus
   tokens; the gram string itself never
   leaves the task — only the 8-byte hash, doc_id and position shuffle.
2. ``sortagg.sorted_attach_count`` on the gram hash — the segment-reduce
   layer (gram cardinality ≈ token count, far beyond the ~10⁷-group point
   where per-group dispatch loses; CLAUDE.md measured rule) — then
   ``filter(count ≥ 2)``: every duplicated occurrence, join-free.
3. ``duplicate_spans`` — per-doc interval union: sort hit positions, merge
   intervals where ``start ≤ running_max_end + 1`` (numpy
   ``maximum.accumulate`` / ``reduceat``; no per-row Python).  Grouped by
   doc via ``map_groups`` — doc cardinality sits well below the segment
   switch point at test scale; at 10⁹+ docs route through a
   (doc_id, pos)-sorted segment pass instead (same switch as
   ``textstats.tfidf_top_terms``).

64-bit gram hashing note: the key is crc32 in the high 32 bits and an
xor-folded FNV-1a-64 in the low 32.  The two kernels are structurally
independent (CRC is GF(2)-linear and incremental — ``crc(m+s)`` is a
function of ``crc(m)`` alone, so a SALTED second crc pass adds ZERO
strength; FNV is multiplicative mod 2**64), giving a true ~64-bit key: at
10⁹ corpus grams the collision expectation is ~0.03 pairs — acceptable for
dedup (a collision only over-marks one span) and deterministic
run-to-run.  The DuckDB oracle compares gram STRINGS, so the bit-exact
gate also certifies the hash is collision-free on the test corpora (the
original double-crc construction FAILED that gate with one real collision
at 23k grams — see tests/test_spandedup.py).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from ..hashutil import crc32_vec, fnv1a64_vec
from . import sortagg

__all__ = ["positional_kgrams", "duplicate_gram_hits", "duplicate_spans",
           "winnow_fingerprints"]

DEFAULT_K = 8


def _flat_tokens(col: pa.ChunkedArray) -> tuple[pa.Array, np.ndarray]:
    """Whitespace-tokenize a string column with Arrow kernels → (flat token
    array, per-row token counts).  Bit-identical to per-row ``str.split()``
    (== the oracle's ``\\S+``): ``ascii_split_whitespace`` emits empty
    strings around leading/trailing whitespace, so those are dropped from
    the flat stream before re-deriving per-row counts."""
    words = pc.ascii_split_whitespace(
        pc.fill_null(pc.cast(col, pa.string()), "")).combine_chunks()
    n = len(words)
    flat_all = pc.list_flatten(words)
    lens_all = pc.list_value_length(words).to_numpy(zero_copy_only=False)
    lens_all = np.nan_to_num(lens_all).astype(np.int64)
    keep_mask = pc.not_equal(flat_all, "").to_numpy(zero_copy_only=False)
    keep = np.flatnonzero(keep_mask)
    flat = flat_all.take(pa.array(keep))
    par = np.repeat(np.arange(n), lens_all)[keep]
    return flat, np.bincount(par, minlength=n).astype(np.int64)


def _gram_hash64(grams: pa.Array) -> pa.Array:
    """crc32 (high 32) ‖ xor-folded fnv1a64 (low 32) → int64 bit-pattern.

    Two INDEPENDENT hash families — see the module docstring for why two
    salted crc passes are not independent (they collide in lockstep)."""
    h1 = crc32_vec(grams).astype(np.uint64)
    f = fnv1a64_vec(grams)
    h2 = (f ^ (f >> np.uint64(32))) & np.uint64(0xFFFFFFFF)
    return pa.array(((h1 << np.uint64(32)) | h2).view(np.int64))


def positional_kgrams(
    docs: ray.data.Dataset, k: int = DEFAULT_K
) -> ray.data.Dataset:
    """→ (gh:int64, doc_id, pos:int64): every positional k-word gram.

    Docs with fewer than ``k`` tokens emit nothing.  Tokenization is
    whitespace-split (== the oracle's ``regexp_extract_all(text,'\\S+')``).
    """

    def grams(b: pa.Table) -> pa.Table:
        flat, lens = _flat_tokens(b.column("text"))
        n_grams = np.maximum(lens - k + 1, 0)
        total = int(n_grams.sum())
        empty = pa.Table.from_pydict({
            "gh": pa.array([], pa.int64()),
            "doc_id": pa.array([], b.schema.field("doc_id").type),
            "pos": pa.array([], pa.int64()),
        })
        if total == 0:
            return empty
        doc_start = np.concatenate(([0], np.cumsum(lens)))[:-1]
        gram_cum = np.concatenate(([0], np.cumsum(n_grams)))[:-1]
        doc_idx = np.repeat(np.arange(len(lens)), n_grams)
        # position of each gram inside its doc, then its flat-array start
        pos = np.arange(total, dtype=np.int64) - np.repeat(gram_cum, n_grams)
        start = np.repeat(doc_start, n_grams) + pos
        parts = [flat.take(pa.array(start + j)) for j in range(k)]
        gram = pc.binary_join_element_wise(*parts, " ")
        return pa.Table.from_pydict({
            "gh": _gram_hash64(gram),
            "doc_id": b.column("doc_id").take(pa.array(doc_idx)),
            "pos": pa.array(pos),
        })

    return docs.select_columns(["doc_id", "text"]).map_batches(
        grams, batch_format="pyarrow"
    )


def duplicate_gram_hits(
    docs: ray.data.Dataset, k: int = DEFAULT_K
) -> ray.data.Dataset:
    """→ (doc_id, pos) of every k-gram occurrence whose gram appears ≥2
    times in the corpus (including twice within one document)."""
    grams = positional_kgrams(docs, k=k)
    counted = sortagg.sorted_attach_count(grams, ["gh"], "gcount")
    return counted.filter(expr="gcount >= 2").select_columns(
        ["doc_id", "pos"]
    )


def duplicate_spans(
    docs: ray.data.Dataset, k: int = DEFAULT_K
) -> ray.data.Dataset:
    """→ (doc_id, span_start, span_end, span_len): maximal duplicated token
    spans — the union of [pos, pos+k-1] over duplicated occurrences, with
    overlapping/adjacent intervals merged.  Integer-only → bit-exact vs the
    gaps-and-islands SQL oracle."""
    hits = duplicate_gram_hits(docs, k=k)

    # interval union over |docs|-cardinality groups: docs hash into a
    # BOUNDED number of groups (4×CPUs — never one Ray group per doc, the
    # measured ~10µs/group dispatch wall) and every doc merges in ONE
    # vectorized pass: per-doc position offsets lift the intervals onto
    # disjoint ranges so one global maximum.accumulate does the
    # gaps-and-islands scan for all docs at once.  Positions must fit
    # 2^40 tokens/doc — comfortably true for any document.
    from .funnel import _bucket_of, _nbuckets

    nb = _nbuckets()
    OFF = np.int64(1) << 40

    def add_bucket(b: pa.Table) -> pa.Table:
        col = b.column("doc_id")
        if pa.types.is_integer(col.type):
            h = col.to_numpy(zero_copy_only=False).astype(np.int64)
        else:  # string doc ids: vectorized crc32, no per-row Python
            from ..hashutil import crc32_vec

            h = crc32_vec(pc.cast(col, pa.string())).astype(np.int64)
        return b.append_column(
            "gb", pa.array(_bucket_of(h, nb), pa.int64()))

    def merge_bucket(g: pa.Table) -> pa.Table:
        d = g.column("doc_id").to_numpy(zero_copy_only=False)
        pos = g.column("pos").to_numpy(zero_copy_only=False)
        order = np.lexsort((pos, d))
        d, pos = d[order], pos[order]
        seg_new = np.concatenate(([True], d[1:] != d[:-1]))
        seg_id = np.cumsum(seg_new) - 1
        sp = pos + seg_id * OFF
        ends = sp + k - 1
        cmax = np.maximum.accumulate(ends)
        new = np.ones(len(sp), dtype=bool)
        new[1:] = sp[1:] > cmax[:-1] + 1   # cross-doc gap ≫ 1 ⇒ always new
        starts_idx = np.flatnonzero(new)
        span_start = pos[starts_idx]
        span_end = (np.maximum.reduceat(ends, starts_idx)
                    - seg_id[starts_idx] * OFF)
        return pa.Table.from_pydict({
            "doc_id": pa.array(d[starts_idx],
                               g.schema.field("doc_id").type),
            "span_start": pa.array(span_start, pa.int64()),
            "span_end": pa.array(span_end, pa.int64()),
            "span_len": pa.array(span_end - span_start + 1, pa.int64()),
        })

    return (
        hits.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("gb")
        .map_groups(merge_bucket, batch_format="pyarrow")
    )


def winnow_fingerprints(
    docs: ray.data.Dataset, k: int = 4, w: int = 4
) -> ray.data.Dataset:
    """Winnowing document fingerprints (Schleimer/Wilkerson/Aiken 2003, the
    MOSS local fingerprinting scheme): → (doc_id, pos:int64, gh:string).

    Every window of ``w`` consecutive positional k-gram hashes selects its
    MINIMUM hash, ties broken by the RIGHTMOST position (robust winnowing);
    the distinct selected (position, hash) pairs are the document's
    fingerprint set.  Guarantees: every shared substring of length
    ≥ ``k + w - 1`` tokens contributes at least one matching fingerprint in
    both documents, while only ~2/(w+1) of grams are kept — the standard
    local sampling for span-level near-dup detection at corpus scale
    (complements ``duplicate_spans``'s exact every-gram pass).

    Hashes are md5 hex (the dedup-family convention) so the DuckDB oracle
    reproduces the SELECTION bit-exactly: min over hex strings == min over
    the 128-bit value.  Docs with fewer than ``k + w - 1`` tokens have no
    full window and emit nothing — full windows only, mirrored by the
    oracle.

    Scale shape: one stateless ``map_batches`` — grams built with the same
    vectorized shifted-take kernel as ``positional_kgrams``, one md5 per
    gram (the minhash cost model), window minima via a strided
    sliding-window view over the batch-flat hash array with cross-doc
    windows masked out; NO shuffle at all (fingerprints are per-doc).
    Downstream consumers group by ``gh`` to find cross-doc matches — the
    same ``sorted_attach_count`` pattern as ``duplicate_gram_hits``.
    """
    import hashlib

    def fp(b: pa.Table) -> pa.Table:
        empty = pa.Table.from_pydict({
            "doc_id": pa.array([], b.schema.field("doc_id").type),
            "pos": pa.array([], pa.int64()),
            "gh": pa.array([], pa.string()),
        })
        flat, lens = _flat_tokens(b.column("text"))
        n_grams = np.maximum(lens - k + 1, 0)
        total = int(n_grams.sum())
        if total == 0:
            return empty
        doc_start = np.concatenate(([0], np.cumsum(lens)))[:-1]
        gram_cum = np.concatenate(([0], np.cumsum(n_grams)))[:-1]
        doc_idx = np.repeat(np.arange(len(lens)), n_grams)
        pos = np.arange(total, dtype=np.int64) - np.repeat(gram_cum, n_grams)
        start = np.repeat(doc_start, n_grams) + pos
        parts = [flat.take(pa.array(start + j)) for j in range(k)]
        gram = pc.binary_join_element_wise(*parts, " ")
        hashes = np.array(
            [hashlib.md5(g.encode()).hexdigest()
             for g in gram.to_pylist()], dtype="<U32")
        if total < w:
            return empty
        # rank-encode the hex hashes (np.unique sorts lexicographically, so
        # int ranks are order-isomorphic to the 128-bit values — numpy has
        # no min-reduction over string dtypes)
        _, codes = np.unique(hashes, return_inverse=True)
        codes = codes.astype(np.int64)
        # windows over the batch-flat code array; a window is valid iff its
        # first and last gram belong to the same doc (full windows only)
        view = np.lib.stride_tricks.sliding_window_view(codes, w)
        valid = doc_idx[: total - w + 1] == doc_idx[w - 1:]
        if not valid.any():
            return empty
        vwin = view[valid]
        winmin = vwin.min(axis=1)
        # rightmost position attaining the minimum (robust winnowing)
        eq_rev = vwin[:, ::-1] == winmin[:, None]
        off = (w - 1) - np.argmax(eq_rev, axis=1)
        sel = np.flatnonzero(valid) + off
        uniq = np.unique(sel)
        return pa.Table.from_pydict({
            "doc_id": b.column("doc_id").take(pa.array(doc_idx[uniq])),
            "pos": pa.array(pos[uniq], pa.int64()),
            "gh": pa.array(hashes[uniq], pa.string()),
        })

    return docs.select_columns(["doc_id", "text"]).map_batches(
        fp, batch_format="pyarrow"
    )
