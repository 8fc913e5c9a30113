"""Embedding quantization: symmetric int8 per-vector scaling.

Vector stores ship embeddings quantized (Milvus/FAISS SQ8: one scale per
vector, elements rounded to int8) — at 100 TB the 4× storage/bandwidth cut
is the difference between an index that fits in cluster RAM and one that
doesn't.  The reference's Milvus backend would apply this inside the
store; an engine owning its vectors applies it as a narrow stage.

``quantize_embeddings`` is a stateless vectorized ``map_batches`` (fuses
with the read, no shuffle): per vector, ``scale = qmax / max|x|`` and
``q_i = clip(floor(x_i · scale + 0.5), -qmax, qmax)``.  The returned
per-vector summary is INTEGER-derived (sum / min / max / nonzero count of
the quantized codes, plus ``max_abs`` which is an input element upcast
f32→f64 — exact), so the DuckDB oracle matches bit-for-bit with zero
float-order caveats; the quantized codes themselves ride along as
``list<int8>`` for downstream sinks.

All arithmetic runs on the flattened element stream (offsets +
``np.repeat`` segment ops) — no Python loop over vectors.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

__all__ = ["quantize_embeddings"]


def quantize_embeddings(
    embeddings: ray.data.Dataset,
    bits: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> ray.data.Dataset:
    """→ (vec_id, n_dims, max_abs, q_sum, q_min, q_max, q_nonzero, q) with
    q = the int8 (or int16 for bits>8) codes.  All-zero vectors quantize
    to all-zero codes (scale 0 guard)."""
    qmax = (1 << (bits - 1)) - 1
    code_type = pa.int8() if bits <= 8 else pa.int16()

    def quant(b: pa.Table) -> pa.Table:
        vecs = b.column(vec_col).combine_chunks()
        lens = pc.list_value_length(vecs).to_numpy(zero_copy_only=False)
        lens = np.nan_to_num(lens).astype(np.int64)
        n = len(lens)
        flat = pc.list_flatten(vecs).to_numpy(zero_copy_only=False)
        flat = np.asarray(flat, dtype=np.float64)  # f32→f64 is exact
        starts = np.concatenate(([0], np.cumsum(lens)))[:-1]
        absflat = np.abs(flat)
        max_abs = np.zeros(n, dtype=np.float64)
        if len(flat):
            np.maximum.at(max_abs, np.repeat(np.arange(n), lens), absflat)
        safe = np.where(max_abs > 0, max_abs, 1.0)
        scale = np.where(max_abs > 0, qmax / safe, 0.0)
        q = np.floor(flat * np.repeat(scale, lens) + 0.5)
        q = np.clip(q, -qmax, qmax).astype(np.int64)
        row = np.repeat(np.arange(n), lens)
        q_sum = np.zeros(n, dtype=np.int64)
        np.add.at(q_sum, row, q)
        q_min = np.zeros(n, dtype=np.int64)
        q_max = np.zeros(n, dtype=np.int64)
        if len(flat):
            np.minimum.at(q_min, row, q)
            np.maximum.at(q_max, row, q)
        q_nonzero = np.zeros(n, dtype=np.int64)
        np.add.at(q_nonzero, row, (q != 0).astype(np.int64))
        offsets = pa.array(
            np.concatenate(([0], np.cumsum(lens))).astype(np.int32),
            pa.int32())
        codes = pa.ListArray.from_arrays(
            offsets, pa.array(q, pa.int64()).cast(code_type))
        return pa.Table.from_pydict({
            "vec_id": b.column(id_col),
            "n_dims": pa.array(lens, pa.int64()),
            "max_abs": pa.array(max_abs, pa.float64()),
            "q_sum": pa.array(q_sum, pa.int64()),
            "q_min": pa.array(q_min, pa.int64()),
            "q_max": pa.array(q_max, pa.int64()),
            "q_nonzero": pa.array(q_nonzero, pa.int64()),
            "q": codes,
        })

    return embeddings.map_batches(quant, batch_format="pyarrow")
