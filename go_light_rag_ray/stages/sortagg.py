"""Sorted-run aggregation: exact groupby-count for HIGH-CARDINALITY keys.

Ray's sort-based ``groupby().aggregate()`` pays per-group overhead
(~10µs/group) — at millions of mostly-size-1 groups the aggregate costs 10×
the sort itself.  This operator computes the same result as::

    ds.groupby(keys).aggregate(Count, Max(carry)...)

by (1) globally sorting on the keys (range partition → a key occupies one
block, except where Ray splits a range's output into several physical
blocks), (2) counting runs per block with one vectorized ``np.diff`` pass,
and (3) routing ONLY the first/last run of each block — the runs that could
straddle a block split — through a tiny conventional groupby.  Interior
runs are final immediately.  Measured 15 s → 1.6 s on 1.27M rows / 1.13M
groups (BASELINE.md).

``carry`` columns must be constant within a key (they ride along on the
run's first row; the boundary aggregate uses Max, which equals the constant).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data
import ray.data.aggregate as agg


def sorted_count(
    ds: ray.data.Dataset,
    keys: list[str],
    carry: list[str] | None = None,
    min_cols: list[str] | None = None,
    count_name: str = "common",
) -> ray.data.Dataset:
    """→ one row per distinct key: keys..., ``count_name``, carry columns
    (constant within key), ``min_cols`` (per-group minimum)."""
    carry = carry or []
    min_cols = min_cols or []
    value_cols = [*carry, *min_cols]

    def runs(b: pa.Table) -> pa.Table:
        n = len(b)
        if n == 0:
            cols = {k: pa.array([], b.schema.field(k).type) for k in keys}
            cols[count_name] = pa.array([], pa.int64())
            for c in value_cols:
                cols[c] = pa.array([], b.schema.field(c).type)
            cols["_final"] = pa.array([], pa.int8())
            return pa.Table.from_pydict(cols)
        key_arrs = [b.column(k).to_numpy(zero_copy_only=False) for k in keys]
        new = np.zeros(n, dtype=bool)
        new[0] = True
        for arr in key_arrs:
            new[1:] |= arr[1:] != arr[:-1]
        starts = np.flatnonzero(new)
        ends = np.concatenate([starts[1:], [n]])
        counts = (ends - starts).astype(np.int64)
        is_boundary = np.zeros(len(starts), dtype=bool)
        is_boundary[0] = True
        is_boundary[-1] = True
        cols = {k: pa.array(arr[starts]) for k, arr in zip(keys, key_arrs)}
        cols[count_name] = pa.array(counts, pa.int64())
        for c in carry:
            cols[c] = pa.array(
                b.column(c).to_numpy(zero_copy_only=False)[starts]
            )
        for c in min_cols:
            vals = b.column(c).to_numpy(zero_copy_only=False)
            cols[c] = pa.array(np.minimum.reduceat(vals, starts))
        cols["_final"] = pa.array((~is_boundary).astype(np.int8), pa.int8())
        return pa.Table.from_pydict(cols)

    # batch_size=None → one batch per physical block, preserving the sorted
    # range partitioning the boundary logic relies on
    reduced = (
        ds.sort(keys)
        .map_batches(runs, batch_format="pyarrow", batch_size=None)
        .materialize()
    )
    finals = reduced.filter(expr="_final == 1").select_columns(
        [*keys, count_name, *value_cols]
    )
    boundary = (
        reduced.filter(expr="_final == 0")
        .groupby(keys)
        .aggregate(
            agg.Sum(count_name, alias_name=count_name),
            *[agg.Max(c, alias_name=c) for c in carry],
            *[agg.Min(c, alias_name=c) for c in min_cols],
        )
        .select_columns([*keys, count_name, *value_cols])
    )
    return finals.union(boundary)
