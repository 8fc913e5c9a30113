"""Deterministic sampling / split assignment.

Training-data pipelines need reproducible, coordination-free sampling:
every worker must agree on a row's fate without a shuffle or a shared RNG.
Both operators key off md5 of the row id — a pure per-row function, exactly
replicable in SQL, stable across runs/cluster sizes/block layouts (which
``ray.data.Dataset.random_sample`` is not).

- ``split_assign``: train/val/test by hash range (the canonical eval-split
  assignment; fractions are exact rational bounds on the first 8 hex chars).
- ``hash_sample``: keep a deterministic ~fraction of rows, optionally
  salted so different sampling passes are independent.
"""

from __future__ import annotations

import hashlib

import pyarrow as pa
import ray.data

HASH_SPACE = 1 << 32  # first 8 hex chars of md5


def _bucket(key: str, salt: str) -> int:
    return int(hashlib.md5(f"{salt}{key}".encode()).hexdigest()[:8], 16)


def split_assign(
    ds: ray.data.Dataset,
    id_col: str = "doc_id",
    train: float = 0.8,
    val: float = 0.1,
    salt: str = "split",
) -> ray.data.Dataset:
    """→ input rows + a ``split`` column ∈ {train, val, test}.

    Thresholds are integer bucket bounds (train < t1 ≤ val < t2 ≤ test), so
    assignment is exact and identical in the SQL oracle.
    """
    t1 = int(train * HASH_SPACE)
    t2 = int((train + val) * HASH_SPACE)

    def assign(b: pa.Table) -> pa.Table:
        ids = b.column(id_col).to_pylist()
        splits = []
        for i in ids:
            h = _bucket(str(i), salt)
            splits.append("train" if h < t1 else "val" if h < t2 else "test")
        return b.append_column("split", pa.array(splits, pa.string()))

    return ds.map_batches(assign, batch_format="pyarrow")


def hash_sample(
    ds: ray.data.Dataset,
    fraction: float,
    id_col: str = "doc_id",
    salt: str = "sample",
) -> ray.data.Dataset:
    """Keep rows whose hash bucket falls under ``fraction`` — deterministic,
    stable under repartitioning, independent per ``salt``."""
    t = int(fraction * HASH_SPACE)

    def keep(b: pa.Table) -> pa.Table:
        ids = b.column(id_col).to_pylist()
        mask = pa.array([_bucket(str(i), salt) < t for i in ids])
        return b.filter(mask)

    return ds.map_batches(keep, batch_format="pyarrow")
