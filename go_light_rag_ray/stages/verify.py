"""Span-sequence invariant check (BASELINE.json input_hint per-row invariant).

Every pipeline that touches ``documents`` must preserve per-row sequence
equality of ``(kind, text, media_ref, order)``.  The engine never mutates
``spans`` — stages read text spans and carry the column through — and this
verifier proves it: it fingerprints each row's span sequence on both sides
and anti-joins the fingerprints.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data


def span_fingerprint_batch(batch: pa.Table) -> pa.Table:
    """Per-row sha256 over the span sequence.

    The fingerprint input assembles in Arrow C++ (flatten the struct list,
    join each span's fields, re-list and join per row); sha256 itself is
    one minimal per-row call over zero-copy memoryview slices and the hex
    column builds from the packed digests without per-row Python strings —
    the sampling-md5 pattern (r4 VERDICT note #3: the old per-span Python
    loop read 30.8 s / 10M docs)."""
    n = batch.num_rows
    if n == 0:
        return pa.Table.from_pydict(
            {"doc_id": batch.column("doc_id"),
             "span_fp": pa.array([], pa.string())})
    spans = batch.column("spans").combine_chunks()
    flat = spans.flatten()     # struct array of all spans, slice-safe
    lens = pc.list_value_length(spans).fill_null(0).to_numpy(
        zero_copy_only=False).astype(np.int64)
    total = int(lens.sum())
    starts = np.concatenate(([0], np.cumsum(lens)))[:-1]
    order = np.arange(total, dtype=np.int64) - np.repeat(starts, lens)
    order_tok = pc.binary_join_element_wise(
        pc.cast(pa.array(order), pa.string()),
        pa.scalar("\x01", pa.string()), "")
    # nulls render as a sentinel no real span string can contain, so a
    # null<->"" (or null<->"None") mutation still flips the fingerprint —
    # the old per-row loop conflated null with the literal string "None"
    _NULL = "\x7f\x00null\x00\x7f"
    part = pc.binary_join_element_wise(
        pc.cast(flat.field("kind"), pa.string()).fill_null(_NULL),
        pc.cast(flat.field("text"), pa.string()).fill_null(_NULL),
        pc.cast(flat.field("media_ref"), pa.string()).fill_null(_NULL),
        order_tok, "\x00")
    per_row = pc.binary_join(
        pa.ListArray.from_arrays(
            pa.array(np.concatenate(([0], np.cumsum(lens))), pa.int32()),
            part.combine_chunks() if isinstance(part, pa.ChunkedArray)
            else part),
        "")
    per_row = (per_row.combine_chunks()
               if isinstance(per_row, pa.ChunkedArray) else per_row)
    voff = per_row.offset
    b_offs = np.frombuffer(per_row.buffers()[1], np.int32)[voff:voff + n + 1]
    mv = memoryview(per_row.buffers()[2])
    sha = hashlib.sha256
    digests = b"".join(
        sha(mv[b_offs[j]:b_offs[j + 1]]).digest() for j in range(n))
    import binascii

    hx = binascii.hexlify(digests)
    out_offs = np.arange(0, 64 * (n + 1), 64, dtype=np.int32)
    fps = pa.StringArray.from_buffers(
        n, pa.py_buffer(out_offs.tobytes()), pa.py_buffer(hx))
    return pa.Table.from_pydict(
        {"doc_id": batch.column("doc_id"), "span_fp": fps})


def verify_spans(input_ds: ray.data.Dataset, output_ds: ray.data.Dataset) -> dict:
    """Compare per-row span fingerprints; returns counts (mismatched == 0 ⇔ pass).

    Fully distributed: both sides fingerprint in parallel, co-shuffle ONCE
    on a bounded doc_id hash bucket (4×CPUs groups — never one group per
    document), and each bucket resolves every one of its doc_ids in one
    vectorized pass.  The driver only ever sees ≤ n_buckets partial-count
    rows — O(1) driver memory for a pass/fail bit at any corpus size.
    A doc matches iff it appears EXACTLY once per side with equal
    fingerprints (doc_ids are unique per side by contract)."""
    from .funnel import _bucket_of, _nbuckets

    nb = _nbuckets()

    def tag(side: int):
        def fn(b: pa.Table) -> pa.Table:
            from ..hashutil import fnv1a64_vec

            t = span_fingerprint_batch(b)
            key = pc.cast(t.column("doc_id"), pa.string()).combine_chunks()
            h = fnv1a64_vec(key).view(np.int64) if t.num_rows else \
                np.empty(0, np.int64)
            return t.append_column(
                "side", pa.array(np.full(t.num_rows, side, np.int8))
            ).append_column("bucket", pa.array(_bucket_of(h, nb), pa.int64()))
        return fn

    def bucket_compare(group: pa.Table) -> pa.Table:
        s = group.sort_by([("doc_id", "ascending"), ("side", "ascending")])
        n = s.num_rows
        did = pc.cast(s.column("doc_id"), pa.string()).combine_chunks()
        new = np.ones(n, bool)
        if n > 1:
            new[1:] = pc.not_equal(
                did.slice(1), did.slice(0, n - 1)
            ).to_numpy(zero_copy_only=False)
        starts = np.flatnonzero(new)
        run_len = np.diff(np.append(starts, n))
        side = s.column("side").to_numpy(zero_copy_only=False)
        fp = s.column("span_fp").combine_chunks()
        pair = starts[run_len == 2]
        good = np.zeros(len(pair), bool)
        if len(pair):
            good = (side[pair] == 0) & (side[pair + 1] == 1)
            good &= pc.equal(
                fp.take(pa.array(pair)), fp.take(pa.array(pair + 1))
            ).to_numpy(zero_copy_only=False)
        return pa.Table.from_pydict({
            "n_docs": pa.array([len(starts)], pa.int64()),
            "matched": pa.array([int(good.sum())], pa.int64()),
        })

    both = (
        input_ds.map_batches(tag(0), batch_format="pyarrow")
        .union(output_ds.map_batches(tag(1), batch_format="pyarrow"))
        .groupby("bucket")
        .map_groups(bucket_compare, batch_format="pyarrow")
    )
    parts = both.take_all()  # ≤ n_buckets rows
    n_docs = sum(r["n_docs"] for r in parts)
    matched = sum(r["matched"] for r in parts)
    mismatched = n_docs - matched
    return {"rows": n_docs, "mismatched": mismatched, "ok": mismatched == 0}
