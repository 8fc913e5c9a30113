"""HyperLogLog distinct-count sketch with integer-exact registers.

The mergeable approximate companion to the exact two-level count-distinct
(``stages/windows.window_distinct``): at 100 TB a "distinct users / tokens
over the whole corpus" answer should cost ONE narrow scan and a
4096-row shuffle, not an exact distinct over 10¹¹ values.  Flajolet et
al. 2007's estimator; md5 is the engine's one hashing story (CLAUDE.md),
so the sketch is deterministic and replayable.

Register layout (hex-digit aligned so DuckDB replicates it exactly):
``h = md5(salt ‖ value)``; bucket = first 3 hex chars (12 bits, m = 4096
registers); rank source w = next 12 hex chars (48 bits); rank =
leading-zero bits of w + 1 = ``49 - bit_length(w)`` (49 when w = 0).

The REGISTERS are the oracle surface — pure int64 (bucket, max_rank)
rows, bit-exact against SQL (``length(bin(w))`` is DuckDB's bit_length)
— while the float estimator stays a driver-side function over the ≤4096
rows.  Registers merge by per-bucket max, so partial sketches from
shards/windows/checkpoints combine associatively (tested).

Scale shape: per-batch partial registers (≤ m rows emitted per batch,
computed over the batch's UNIQUE values) → one tiny groupby-max.  No
shuffle ever sees a raw value.
"""

from __future__ import annotations

import hashlib
import math

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data
import ray.data.aggregate as agg

HLL_P_BITS = 12          # 4096 buckets (3 hex chars)
HLL_M = 1 << HLL_P_BITS
HLL_MAX_RANK = 49        # 48-bit rank source


def hll_registers(
    ds: ray.data.Dataset, col: str, salt: str = "hll",
) -> ray.data.Dataset:
    """Sketch a column into (bucket, max_rank) int64 register rows.
    Buckets never touched by any value are absent (rank 0 implied)."""

    def partial(b: pa.Table) -> pa.Table:
        vals = pc.unique(pc.cast(b.column(col), pa.string()))
        regs: dict[int, int] = {}
        for v in vals.to_pylist():
            if v is None:
                continue
            h = hashlib.md5((salt + v).encode()).hexdigest()
            bkt = int(h[:3], 16)
            w = int(h[3:15], 16)
            rank = HLL_MAX_RANK - w.bit_length() if w else HLL_MAX_RANK
            if regs.get(bkt, 0) < rank:
                regs[bkt] = rank
        items = sorted(regs.items())
        return pa.Table.from_pydict({
            "bucket": pa.array([k for k, _ in items], pa.int64()),
            "max_rank": pa.array([r for _, r in items], pa.int64()),
        })

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("bucket")
        .aggregate(agg.Max("max_rank", alias_name="max_rank"))
    )


def hll_merge(*sketches: ray.data.Dataset) -> ray.data.Dataset:
    """Associative register merge: union + per-bucket max.  Partial
    sketches from shards / time windows / checkpoints combine exactly."""
    out = sketches[0]
    for s in sketches[1:]:
        out = out.union(s)
    return out.groupby("bucket").aggregate(
        agg.Max("max_rank", alias_name="max_rank"))


def hll_estimate(registers: ray.data.Dataset) -> float:
    """Bias-corrected HLL cardinality estimate over a register table
    (driver-side floats over ≤ m rows — deliberately outside the oracle
    surface; the registers themselves are the exact artifact)."""
    rows = registers.take_all()
    m = HLL_M
    ranks = np.zeros(m, dtype=np.int64)
    for r in rows:
        ranks[r["bucket"]] = r["max_rank"]
    alpha = 0.7213 / (1.0 + 1.079 / m)
    e = alpha * m * m / np.sum(np.power(2.0, -ranks.astype(np.float64)))
    zeros = int(np.count_nonzero(ranks == 0))
    if e <= 2.5 * m and zeros > 0:
        e = m * math.log(m / zeros)  # linear counting, small range
    return float(e)
