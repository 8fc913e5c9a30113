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


def stratified_sample(
    ds: ray.data.Dataset,
    group_col: str,
    n_per_group: int,
    id_col: str = "doc_id",
    salt: str = "strat",
    rank_name: str = "sample_rank",
) -> ray.data.Dataset:
    """Deterministic N-per-group sample: each group's first ``n_per_group``
    rows under (md5(salt+id), id) order, with a 1-based ``rank_name``.

    The per-group choice is a pure function of the row ids — reproducible
    across runs, cluster sizes and block layouts, and exactly replicable in
    SQL (`row_number() OVER (PARTITION BY g ORDER BY substr(md5(..),1,8),
    id)`).  The per-group head runs through ``sortagg.sorted_topk`` (one
    sort, vectorized segment limit), so group cardinality can be
    web-scale — no per-group Python, no driver-side collection.
    """
    from .sortagg import sorted_topk

    def add_hash(b: pa.Table) -> pa.Table:
        ids = b.column(id_col).to_pylist()
        hx = [hashlib.md5(f"{salt}{i}".encode()).hexdigest()[:8] for i in ids]
        return b.append_column("_strat_h", pa.array(hx, pa.string()))

    hashed = ds.map_batches(add_hash, batch_format="pyarrow")
    out = sorted_topk(hashed, keys=[group_col], order_by=["_strat_h", id_col],
                      k=n_per_group, rank_name=rank_name)
    return out.drop_columns(["_strat_h"])


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
