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
    doc_ids = batch.column("doc_id").to_pylist()
    spans = batch.column("spans").to_pylist()
    fps = []
    for row in spans:
        h = hashlib.sha256()
        for order, s in enumerate(row):
            h.update(f"{s['kind']}\x00{s['text']}\x00{s['media_ref']}\x00{order}\x01".encode())
        fps.append(h.hexdigest())
    return pa.Table.from_pydict({"doc_id": doc_ids, "span_fp": fps})


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
