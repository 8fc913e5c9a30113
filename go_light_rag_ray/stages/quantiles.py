"""Exact per-key quantiles of a numeric column (distribution profiling).

Curation pipelines threshold on distribution cut-points — "drop docs below
the 25th percentile of quality per language", "alert when a feed's p90
latency shifts" — so the engine needs a quantile operator whose answers are
EXACT and deterministic, not a sampled sketch.

Semantics (shared verbatim with the SQL oracle so results are bit-exact):
for each key with n values, quantile q = the element at 1-based rank
``max(1, ceil(q·n))`` of the value-sorted run.  The emitted value is a
PICKED element (no interpolation arithmetic), so float equality is exact.

Distributed shape: ONE ``groupby(key)`` shuffle; inside each group the
kernel is a single ``np.sort`` + fancy-index — vectorized, no row loops.
Partitioning assumption: a key's values fit one worker (quantile keys are
low-cardinality dimensions — event type, language, source — with bounded
group width; this is the exact path).  At web scale with huge or skewed
groups, swap the exact kernel for a mergeable sketch (t-digest / KLL) built
per batch and merged per key — same one-shuffle shape, bounded state; the
exact kernel stays as the oracle.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import ray.data

__all__ = ["group_quantiles", "DEFAULT_QS"]

DEFAULT_QS = (0.25, 0.5, 0.75, 0.9)


def group_quantiles(
    ds: ray.data.Dataset,
    key_col: str,
    value_col: str,
    qs: tuple[float, ...] = DEFAULT_QS,
) -> ray.data.Dataset:
    """→ one row per (key, q): (key_col, q, quantile_value, n)."""
    qarr = list(qs)

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
