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


def _salted_arr(keys, salt: str) -> pa.Array:
    """Arrow-vectorized ``salt + str(key)``: rendering (int → decimal
    string) and the salt prefix run in Arrow C++."""
    import pyarrow.compute as pc

    arr = keys.combine_chunks() if isinstance(keys, pa.ChunkedArray) else keys
    joined = pc.binary_join_element_wise(
        pa.scalar(salt, pa.string()), pc.cast(arr, pa.string()), "")
    if isinstance(joined, pa.ChunkedArray):
        joined = joined.combine_chunks()
    return joined


def _md5_digests4(keys, salt: str) -> tuple[int, bytes]:
    """(n, packed first-4-byte md5 digests) for every ``salt + str(key)``.

    md5 itself cannot vectorize (the oracle contract pins the hash — see
    CLAUDE.md), so the digest loop stays per row, but stripped to one
    minimal statement over zero-copy memoryview slices of the joined
    buffer; the f-string / hexdigest / int-parse overhead of the naive
    loop is gone (~5-7× measured)."""
    import numpy as np

    joined = _salted_arr(keys, salt)
    n = len(joined)
    if n == 0:
        return 0, b""
    voff = joined.offset
    offs = np.frombuffer(joined.buffers()[1], np.int32)[voff:voff + n + 1]
    mv = memoryview(joined.buffers()[2])
    md5 = hashlib.md5
    return n, b"".join(
        md5(mv[offs[j]:offs[j + 1]]).digest()[:4] for j in range(n))


def _bucket_batch(keys, salt: str):
    """md5 bucket for every key in one pass: uint32 of the first 4 digest
    bytes == ``int(hexdigest()[:8], 16)`` == the oracle's
    ``substr(md5(salt || id), 1, 8)``.  For runs that don't need oracle
    parity, ``hash_fn="fnv1a64"`` below is fully vectorized."""
    import numpy as np

    n, digests = _md5_digests4(keys, salt)
    if n == 0:
        return np.empty(0, np.uint32)
    return np.frombuffer(digests, ">u4").astype(np.uint32)


def _fnv1a64_batch(keys, salt: str):
    """``hashutil.fnv1a64_vec`` over ``salt + str(key)`` with a splitmix64
    finalizer, top 32 bits as the bucket — the documented production fast
    path (``hash_fn="fnv1a64"``): no per-row Python at all, but NOT the
    oracle's md5, so only for runs that don't need SQL-oracle parity.

    The finalizer matters: raw FNV-1a top bits are visibly non-uniform on
    short sequential keys (a 2000-id split read 0.695 where 0.8 was asked;
    mixed, it reads 0.80±0.01)."""
    import numpy as np

    from ..hashutil import fnv1a64_vec

    joined = _salted_arr(keys, salt)
    if len(joined) == 0:
        return np.empty(0, np.uint32)
    h = fnv1a64_vec(joined)
    with np.errstate(over="ignore"):
        # splitmix64 finalizer (Steele et al., public domain constants)
        h ^= h >> np.uint64(33)
        h *= np.uint64(0xFF51AFD7ED558CCD)
        h ^= h >> np.uint64(33)
        h *= np.uint64(0xC4CEB9FE1A85EC53)
        h ^= h >> np.uint64(33)
    return (h >> np.uint64(32)).astype(np.uint32)


def _md5_hex8_batch(keys, salt: str) -> pa.Array:
    """First 8 hex chars of md5(salt+key) per row as a StringArray, built
    without per-row Python strings: one hexlify over the packed digests,
    fixed-stride offsets."""
    import binascii

    import numpy as np

    n, digests = _md5_digests4(keys, salt)
    hx = binascii.hexlify(digests)
    out_offs = np.arange(0, 8 * (n + 1), 8, dtype=np.int32)
    return pa.StringArray.from_buffers(
        n, pa.py_buffer(out_offs.tobytes()), pa.py_buffer(hx))


_BUCKET_FNS = {"md5": _bucket_batch, "fnv1a64": _fnv1a64_batch}
_SPLIT_LABELS = pa.array(["train", "val", "test"], pa.string())


def split_assign(
    ds: ray.data.Dataset,
    id_col: str = "doc_id",
    train: float = 0.8,
    val: float = 0.1,
    salt: str = "split",
    hash_fn: str = "md5",
) -> ray.data.Dataset:
    """→ input rows + a ``split`` column ∈ {train, val, test}.

    Thresholds are integer bucket bounds (train < t1 ≤ val < t2 ≤ test), so
    assignment is exact and identical in the SQL oracle (``hash_fn="md5"``,
    the default; ``"fnv1a64"`` is the vectorized production mode without
    oracle parity).
    """
    t1 = int(train * HASH_SPACE)
    t2 = int((train + val) * HASH_SPACE)
    bucket = _BUCKET_FNS[hash_fn]

    def assign(b: pa.Table) -> pa.Table:
        h = bucket(b.column(id_col), salt)
        code = (h >= t1).astype("int32") + (h >= t2)
        return b.append_column(
            "split", _SPLIT_LABELS.take(pa.array(code)))

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
        return b.append_column(
            "_strat_h", _md5_hex8_batch(b.column(id_col), salt))

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
        mask = pa.array(_bucket_batch(b.column(id_col), salt) < t)
        return b.filter(mask)

    return ds.map_batches(keep, batch_format="pyarrow")


def mix_corpora(
    docs: ray.data.Dataset,
    weights: dict[str, int],
    source_col: str = "source",
    id_col: str = "doc_id",
) -> ray.data.Dataset:
    """Deterministic weighted corpus interleave — the domain-mixing order a
    training run consumes (the data-mixture step of every LLM corpus recipe,
    e.g. The Pile / LLaMA source weighting), with NO randomness: a source
    with weight w receives w slots per weight-sum window, in a fixed,
    reproducible order.

    Each doc gets its 0-based rank r within its source (by ``id_col``) and
    the global slot priority ``r · (W // w_source)`` with W = lcm of all
    weights — the exact-rational comparison r₁/w₁ < r₂/w₂ in pure int64
    (ties break by (source, r)).  ``mix_order`` = the global rank under
    that priority.  All-integer, so the SQL window oracle is bit-exact.

    Distributed shape: two prefix-sum scans (each ONE global sort + the
    per-block-summary pass, stages/packing.prefix_sum) and one segment
    broadcast for the per-source base — no driver-side data beyond one row
    per block, no joins.  ``weights`` (a handful of source labels) rides
    into tasks as plain ints.
    """
    import math

    import numpy as np
    import pyarrow.compute as pc

    from .packing import prefix_sum
    from .sortagg import sorted_attach_first

    if not weights:
        raise ValueError("weights must map every source label to an int ≥ 1")
    lcm = 1
    for w in weights.values():
        if w < 1:
            raise ValueError("weights must be ≥ 1")
        lcm = math.lcm(lcm, w)
    quota = {s: lcm // w for s, w in weights.items()}

    def key1(b: pa.Table) -> pa.Table:
        ids = b.column(id_col)
        id_str = pc.cast(ids, pa.string())
        if pa.types.is_integer(ids.type):
            # numeric ids order NUMERICALLY in the oracle's window — pad so
            # string order matches (ids ≥ 0, the corpus invariant)
            id_str = pc.ascii_lpad(id_str, 19, "0")
        key = pc.binary_join_element_wise(
            pc.cast(b.column(source_col), pa.string()), id_str, "\x1f")
        return pa.table({
            "doc_id": ids,
            "source": pc.cast(b.column(source_col), pa.string()),
            "_k": key,
            "_one": pa.array(np.ones(len(b), dtype=np.int64)),
        })

    # global index under (source, doc_id) order → per-source rank via the
    # segment broadcast of each source's first global index
    gidx = prefix_sum(
        docs.select_columns([id_col, source_col]).map_batches(
            key1, batch_format="pyarrow"),
        "_k", "_one", out_col="_g")

    def mark(b: pa.Table) -> pa.Table:
        return b.append_column("_m", b.column("_g"))

    based = sorted_attach_first(
        gidx.map_batches(mark, batch_format="pyarrow"),
        ["source"], "_m", "_g", attach_name="_base")

    def priority(b: pa.Table) -> pa.Table:
        g = b.column("_g").to_numpy(zero_copy_only=False)
        base = b.column("_base").to_numpy(zero_copy_only=False)
        r = g - base
        srcs = b.column("source").to_pylist()
        missing = {s for s in srcs if s not in quota}
        if missing:
            raise ValueError(
                f"sources without a weight: {sorted(missing)[:5]}")
        q = np.array([quota[s] for s in srcs], dtype=np.int64)
        prio = r * q
        key = pc.binary_join_element_wise(
            pc.ascii_lpad(pc.cast(pa.array(prio), pa.string()), 19, "0"),
            b.column("source").combine_chunks(),
            pc.ascii_lpad(pc.cast(pa.array(r), pa.string()), 19, "0"), "\x1f")
        return pa.table({
            "doc_id": b.column("doc_id"),
            "source": b.column("source"),
            "src_rank": pa.array(r, pa.int64()),
            "_k2": key,
            "_one": pa.array(np.ones(len(b), dtype=np.int64)),
        })

    mixed = prefix_sum(
        based.map_batches(priority, batch_format="pyarrow"),
        "_k2", "_one", out_col="mix_order")
    return mixed.drop_columns(["_k2", "_one"])


def split_by_cluster(
    clusters: ray.data.Dataset,
    cluster_col: str = "cluster_id",
    train: float = 0.8,
    val: float = 0.1,
    salt: str = "split",
    hash_fn: str = "md5",
) -> ray.data.Dataset:
    """Leakage-safe train/val/test split: hash the duplicate-CLUSTER id,
    not the document id, so every member of a near-duplicate cluster
    lands in the same split — the standard guard against train→test
    contamination via near-duplicates (the reason decontamination
    pipelines dedup before splitting).

    Input is the `(doc_id, cluster_id)` table `dedup.cluster_duplicates`
    emits (cluster_id = smallest member id; singletons are their own
    cluster, so unclustered corpora degrade exactly to ``split_assign``).
    One stateless ``map_batches`` — the cluster table streams, nothing
    materializes."""
    t1 = int(train * HASH_SPACE)
    t2 = int((train + val) * HASH_SPACE)
    bucket = _BUCKET_FNS[hash_fn]

    def assign(b: pa.Table) -> pa.Table:
        h = bucket(b.column(cluster_col), salt)
        code = (h >= t1).astype("int32") + (h >= t2)
        return b.append_column(
            "split", _SPLIT_LABELS.take(pa.array(code)))

    return clusters.map_batches(assign, batch_format="pyarrow")


def systematic_weighted_sample(
    ds: ray.data.Dataset,
    weight_col: str,
    k: int,
    id_col: str = "doc_id",
) -> ray.data.Dataset:
    """Deterministic weighted sampling: k systematic picks proportional
    to an integer weight (token counts, quality scores scaled to ints) —
    the classic systematic/stratified draw over the cumulative weight
    line, targets at ``t_j = ((2j+1)·W) // (2k)``.

    No randomness, stable under repartitioning, and ALL-INTEGER: a row
    with exclusive weight offset ``o`` and weight ``w`` is picked
    ``c(o+w) − c(o)`` times where ``c(x) = clamp(((2kx + W−1)//W)//2,
    0, k)`` — the closed-form count of targets below x (heavy rows can
    be picked multiple times, the standard multiplicity).  Exactly
    replicable as a SQL window sum + the same integer formula.

    Distributed shape: ONE ``prefix_sum`` (global sort + per-block
    summaries) and a stateless vectorized pass; rows with
    ``n_picks ≥ 1`` survive.  Raises on negative weights; returns empty
    when the total weight is zero."""
    import numpy as np

    from .packing import prefix_sum

    if k < 1:
        raise ValueError(f"k must be ≥ 1, got {k}")

    summed = prefix_sum(ds, id_col, weight_col, out_col="_off",
                        total_col="_W")

    def pick(b: pa.Table) -> pa.Table:
        w = b.column(weight_col).to_numpy(zero_copy_only=False)
        if len(w) and w.min() < 0:
            raise ValueError("weights must be ≥ 0")
        off = b.column("_off").to_numpy(zero_copy_only=False)
        total = b.column("_W").to_numpy(zero_copy_only=False)
        W = int(total[0]) if len(total) else 0
        out = b.drop_columns(["_off", "_W"])
        if W == 0 or len(w) == 0:
            return out.append_column(
                "n_picks", pa.array(np.zeros(len(w), np.int64))
            ).filter(pa.array(np.zeros(len(w), bool)))

        def c(x):
            return np.minimum(k, np.maximum(
                0, ((2 * k * x + W - 1) // W) // 2))

        n_picks = (c(off + w) - c(off)).astype(np.int64)
        keep = n_picks >= 1
        return out.append_column(
            "n_picks", pa.array(n_picks)).filter(pa.array(keep))

    return summed.map_batches(pick, batch_format="pyarrow")
