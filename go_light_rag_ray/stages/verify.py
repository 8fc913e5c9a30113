"""Span-sequence invariant check (BASELINE.json input_hint per-row invariant).

Every pipeline that touches ``documents`` must preserve per-row sequence
equality of ``(kind, text, media_ref, order)``.  The engine never mutates
``spans`` — stages read text spans and carry the column through — and this
verifier proves it: it fingerprints each row's span sequence on both sides
and anti-joins the fingerprints.
"""

from __future__ import annotations

import hashlib

import pyarrow as pa
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
    """Compare per-row span fingerprints; returns counts (mismatched == 0 ⇔ pass)."""
    a = input_ds.map_batches(span_fingerprint_batch, batch_format="pyarrow").to_pandas()
    b = output_ds.map_batches(span_fingerprint_batch, batch_format="pyarrow").to_pandas()
    merged = a.merge(b, on="doc_id", how="outer", suffixes=("_in", "_out"), indicator=True)
    mismatched = int(
        ((merged["_merge"] != "both") | (merged["span_fp_in"] != merged["span_fp_out"])).sum()
    )
    return {"rows": len(merged), "mismatched": mismatched, "ok": mismatched == 0}
