"""Exact per-key quantiles of a numeric column (distribution profiling).

Curation pipelines threshold on distribution cut-points — "drop docs below
the 25th percentile of quality per language", "alert when a feed's p90
latency shifts" — so the engine needs a quantile operator whose answers are
EXACT and deterministic, not a sampled sketch.

Semantics (shared verbatim with the SQL oracle so results are bit-exact):
for each key with n values, quantile q = the element at 1-based rank
``max(1, ceil(q·n))`` of the value-sorted run.  The emitted value is a
PICKED element (no interpolation arithmetic), so float equality is exact.

Two executions, same one-``groupby(key)``-shuffle shape:

- ``strategy="exact"`` (default, the oracle): each group's values move to
  one worker; the kernel is a single ``np.sort`` + fancy-index.
  Partitioning assumption: a key's values fit one worker — fine for
  low-cardinality dimension keys (event type, language, source).
- ``strategy="sketch"``: the web-scale path for huge/skewed groups.  Each
  BATCH builds a capacity-k KLL sketch per key it sees (``stages/kll.py``),
  so only O(k) floats per (key, batch) enter the shuffle regardless of
  group width; the per-key merge concatenates level buffers and compacts
  once.  Rank error is O(n/k) (property-tested); same output schema, same
  rank convention.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

__all__ = ["group_quantiles", "DEFAULT_QS"]

DEFAULT_QS = (0.25, 0.5, 0.75, 0.9)


def group_quantiles(
    ds: ray.data.Dataset,
    key_col: str,
    value_col: str,
    qs: tuple[float, ...] = DEFAULT_QS,
    strategy: str = "exact",
    sketch_k: int = 200,
) -> ray.data.Dataset:
    """→ one row per (key, q): (key_col, q, quantile_value, n)."""
    qarr = list(qs)
    if strategy == "sketch":
        return _sketch_quantiles(ds, key_col, value_col, qarr, sketch_k)

    def quantiles(g: pd.DataFrame) -> pd.DataFrame:
        v = np.sort(g[value_col].to_numpy(dtype=np.float64))
        n = len(v)
        # rank arithmetic in IEEE double, the same ops as the SQL oracle's
        # greatest(1, ceil(q * n)) — identical results for identical inputs
        idx = [max(1, math.ceil(q * n)) - 1 for q in qarr]
        return pd.DataFrame({
            key_col: [g[key_col].iloc[0]] * len(qarr),
            "q": np.array(qarr, dtype=np.float64),
            "quantile_value": v[idx],
            "n": np.full(len(qarr), n, dtype=np.int64),
        })

    return ds.groupby(key_col).map_groups(quantiles)


def _sketch_quantiles(
    ds: ray.data.Dataset, key_col: str, value_col: str,
    qarr: list[float], k: int,
) -> ray.data.Dataset:
    """Per-batch per-key KLL partials → per-key merge + query."""
    from .kll import KLL, kll_merge_packed, kll_pack

    def build(b: pa.Table) -> pa.Table:
        keys_out, ns, sizes_out, items_out = [], [], [], []
        # group the batch's values by key with one Arrow hash-aggregate,
        # then one sketch build per key PRESENT IN THIS BATCH (bounded by
        # the batch's distinct keys, not the group width)
        grouped = (
            pa.table({"k": b.column(key_col), "v": b.column(value_col)})
            .group_by("k")
            .aggregate([("v", "list")])
        )
        kcol = grouped.column("k")
        vcol = grouped.column("v_list")
        for i in range(grouped.num_rows):
            s = KLL(k)
            s.update(np.asarray(vcol[i].as_py(), np.float64))
            n, sizes, flat = kll_pack(s)
            keys_out.append(kcol[i].as_py())
            ns.append(n)
            sizes_out.append(sizes)
            items_out.append(flat)
        return pa.Table.from_pydict({
            key_col: pa.array(keys_out, b.schema.field(key_col).type),
            "n": pa.array(ns, pa.int64()),
            "level_sizes": pa.array(sizes_out, pa.list_(pa.int32())),
            "items": pa.array(items_out, pa.list_(pa.float64())),
        })

    partials = ds.map_batches(build, batch_format="pyarrow")

    def finalize(g: pd.DataFrame) -> pd.DataFrame:
        packed = list(zip(g["n"], g["level_sizes"], g["items"]))
        s = kll_merge_packed(packed, k)
        return pd.DataFrame({
            key_col: [g[key_col].iloc[0]] * len(qarr),
            "q": np.array(qarr, dtype=np.float64),
            "quantile_value": [s.quantile(q) for q in qarr],
            "n": np.full(len(qarr), s.n, dtype=np.int64),
        })

    return partials.groupby(key_col).map_groups(finalize)
