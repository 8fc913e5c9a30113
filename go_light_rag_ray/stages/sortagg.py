"""Sorted-run aggregation: exact per-group reductions for HIGH-CARDINALITY keys.

Ray's sort-based ``groupby().aggregate()`` / ``map_groups`` pay per-group
overhead (~10µs/group) — at millions of mostly-size-1 groups the dispatch
costs 10× the sort itself.  Every operator here computes the same result as
a conventional groupby by (1) globally sorting on the keys (range partition
→ a key occupies one block, except where Ray splits a range's output into
several physical blocks), (2) reducing runs per block with vectorized
numpy/Arrow kernels, and (3) routing ONLY the first/last run of each block —
the runs that could straddle a block split — through a tiny conventional
grouped fallback.  Interior runs are final immediately.  Measured 15 s →
1.6 s on 1.27M rows / 1.13M groups for the count case (BASELINE.md).

The family (this is the engine's segment-reduce layer):

- ``sorted_count``        — groupby-count (+ constant carries, per-group min)
- ``sorted_reduce``       — general scalar reductions: count/sum/min/max/first
- ``sorted_topk``         — per-key first-k rows under an order (segment limit)
- ``sorted_collect``      — per-key sorted (optionally distinct) value list
- ``sorted_attach_count`` — attach the group size to EVERY row (segment
  broadcast of count; the join-free ``df``-attach shape)
- ``sorted_attach_first`` — attach the key's first-row value under an
  order to EVERY row (segment broadcast of a per-key scalar; the
  join-free "lookup a per-key attribute" shape, e.g. PageRank shipping
  each node's rank onto its out-edges)

``carry`` columns must be constant within a key (they ride along on the
run's first row; the boundary aggregate uses Max, which equals the constant).

Partitioning caveat: Ray's sort ships N² shuffle objects (N map partitions
× N ranges, ~1 ms apiece), so a caller holding an extremely fine-grained
dataset (blocks ≫ cluster CPUs) should coalesce it to a cluster-sized
width before calling in here — see ``canonicalize._sort_width`` for the
measured pattern (420 blocks → 176k objects → 178 s for 221k rows).  The
operators here don't coalesce internally because their callers' inputs are
normally read- or shuffle-produced blocks already near the block target.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data


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
    out_cols = [*keys, count_name, *value_cols]
    finals = reduced.filter(expr="_final == 1").select_columns(out_cols)

    # boundary partials are ≤2 per block — consolidate into ONE narrow task
    # (a groupby here costs a whole extra exchange per call) and merge with
    # the same vectorized run-reduce over a locally-sorted batch
    def merge_batch(b: pa.Table) -> pa.Table:
        if len(b) == 0:
            cols = {k: pa.array([], b.schema.field(k).type) for k in keys}
            cols[count_name] = pa.array([], pa.int64())
            for c in value_cols:
                cols[c] = pa.array([], b.schema.field(c).type)
            return pa.Table.from_pydict(cols)
        b = b.sort_by([(k, "ascending") for k in keys])
        starts, _ = _runs(b, keys)
        starts_idx = pa.array(starts, pa.int64())
        cols = {k: b.column(k).take(starts_idx) for k in keys}
        cols[count_name] = pa.array(
            np.add.reduceat(
                b.column(count_name).to_numpy(zero_copy_only=False), starts),
            pa.int64())
        for c in carry:  # constant within key: first value is the constant
            cols[c] = b.column(c).take(starts_idx)
        for c in min_cols:
            cols[c] = pa.array(
                np.minimum.reduceat(
                    b.column(c).to_numpy(zero_copy_only=False), starts),
                b.schema.field(c).type)
        return pa.Table.from_pydict(cols)

    boundary = (
        reduced.filter(expr="_final == 0")
        .repartition(1)
        .map_batches(merge_batch, batch_format="pyarrow", batch_size=None)
        .select_columns(out_cols)
    )
    return finals.union(boundary)


# ---------------------------------------------------------------------------
# the generalized segment-reduce family
# ---------------------------------------------------------------------------

def _np_col(b: pa.Table, name: str) -> np.ndarray:
    return b.column(name).to_numpy(zero_copy_only=False)


def _runs(b: pa.Table, keys: list[str]) -> tuple[np.ndarray, np.ndarray]:
    """(starts, ends) of equal-key runs in a block (block is key-sorted)."""
    n = len(b)
    new = np.zeros(n, dtype=bool)
    new[0] = True
    for k in keys:
        arr = _np_col(b, k)
        new[1:] |= arr[1:] != arr[:-1]
    starts = np.flatnonzero(new)
    ends = np.concatenate([starts[1:], [n]])
    return starts, ends


def sorted_reduce(
    ds: ray.data.Dataset,
    keys: list[str],
    ops: list[tuple[str, str, str]],
    order_col: str | None = None,
    order_descending: bool = False,
) -> ray.data.Dataset:
    """General per-key scalar reductions without per-group dispatch.

    ``ops`` is ``[(op, col, alias), ...]`` with op ∈ {count, sum, min, max,
    first}.  ``first`` returns the column value of the key's first row under
    ``(keys, order_col)`` order and REQUIRES ``order_col`` to make that row
    unique per key (e.g. a one-hot marker or a strictly-ordered column);
    ``first`` works for any column type including lists.  min/max/sum run as
    ``np.ufunc.reduceat`` over sorted runs — numeric or (for min/max)
    python-comparable object dtypes.  Same boundary-run fix as
    ``sorted_count``: interior runs are final, first/last runs of each block
    merge through a tiny conventional groupby (≤2 partials per block).
    """
    aliases = [a for _, _, a in ops]
    if any(op == "first" for op, _, _ in ops) and order_col is None:
        raise ValueError("'first' ops require order_col")
    sort_keys = [*keys] + ([order_col] if order_col else [])
    sort_desc = [False] * len(keys) + ([order_descending] if order_col else [])
    out_cols = [*keys, *aliases]

    def reduce_block(b: pa.Table) -> pa.Table:
        n = len(b)
        if n == 0:
            cols = {k: pa.array([], b.schema.field(k).type) for k in keys}
            for op, col, alias in ops:
                cols[alias] = pa.array(
                    [], pa.int64() if op == "count" else b.schema.field(col).type)
            if order_col:
                cols["_ord"] = pa.array([], b.schema.field(order_col).type)
            cols["_final"] = pa.array([], pa.int8())
            return pa.Table.from_pydict(cols)
        starts, ends = _runs(b, keys)
        nruns = len(starts)
        is_boundary = np.zeros(nruns, dtype=bool)
        is_boundary[0] = True
        is_boundary[-1] = True
        starts_idx = pa.array(starts, pa.int64())
        cols = {k: b.column(k).take(starts_idx) for k in keys}
        for op, col, alias in ops:
            if op == "count":
                cols[alias] = pa.array((ends - starts).astype(np.int64), pa.int64())
            elif op == "first":
                cols[alias] = b.column(col).take(starts_idx)
            else:
                vals = _np_col(b, col)
                red = {"sum": np.add, "min": np.minimum, "max": np.maximum}[op]
                cols[alias] = pa.array(red.reduceat(vals, starts),
                                       b.schema.field(col).type)
        if order_col:
            cols["_ord"] = b.column(order_col).take(starts_idx)
        cols["_final"] = pa.array((~is_boundary).astype(np.int8), pa.int8())
        return pa.Table.from_pydict(cols)

    reduced = (
        ds.sort(sort_keys, descending=sort_desc)
        .map_batches(reduce_block, batch_format="pyarrow", batch_size=None)
        .materialize()
    )
    finals = reduced.filter(expr="_final == 1").select_columns(out_cols)

    # boundary partials are ≤2 per block by construction — consolidate into
    # ONE narrow task (no shuffle: a groupby here costs a whole extra
    # exchange per call, measured ~1s of fixed overhead even on 257 rows)
    # and merge with the same vectorized run-reduce, now over a sorted batch.
    def merge_batch(b: pa.Table) -> pa.Table:
        if len(b) == 0:
            cols = {k: pa.array([], b.schema.field(k).type) for k in keys}
            for op, col, alias in ops:
                cols[alias] = pa.array([], b.schema.field(alias).type)
            return pa.Table.from_pydict(cols)
        spec = [(k, "ascending") for k in keys]
        if order_col:
            spec.append(("_ord",
                         "descending" if order_descending else "ascending"))
        b = b.sort_by(spec)
        starts, ends = _runs(b, keys)
        starts_idx = pa.array(starts, pa.int64())
        cols = {k: b.column(k).take(starts_idx) for k in keys}
        for op, col, alias in ops:
            a = b.column(alias)
            if op == "first":
                # partials sorted best-_ord-first within each key
                cols[alias] = a.take(starts_idx)
            else:
                vals = a.to_numpy(zero_copy_only=False)
                red = {"count": np.add, "sum": np.add, "min": np.minimum,
                       "max": np.maximum}[op]
                cols[alias] = pa.array(red.reduceat(vals, starts), a.type)
        return pa.Table.from_pydict(cols)

    boundary = (
        reduced.filter(expr="_final == 0")
        .repartition(1)
        .map_batches(merge_batch, batch_format="pyarrow", batch_size=None)
        .select_columns(out_cols)
    )
    return finals.union(boundary)


def sorted_topk(
    ds: ray.data.Dataset,
    keys: list[str],
    order_by: list[str],
    k: int,
    descending: list[bool] | None = None,
    rank_name: str | None = None,
) -> ray.data.Dataset:
    """Per-key first ``k`` rows under ``order_by`` (segment limit).

    ``(keys, order_by)`` must totally order rows within a key (include a
    unique tie-break column) so ranks are deterministic.  Interior runs emit
    their first k rows directly (position-in-run < k, one vectorized pass);
    boundary runs route only their block-local first-k rows — any row deeper
    than k in its block portion has ≥k globally-earlier rows, so pruning is
    lossless — through a per-key re-sort + head.  Output: the input columns
    (+ ``rank_name`` 1..k as int32 if requested).
    """
    desc_order = list(descending) if descending else [False] * len(order_by)
    sort_keys = [*keys, *order_by]
    sort_desc = [False] * len(keys) + desc_order
    sort_spec = [(c, "descending" if d else "ascending")
                 for c, d in zip(order_by, desc_order)]

    def head_block(b: pa.Table) -> pa.Table:
        n = len(b)
        if n == 0:
            out = b
            if rank_name:
                out = out.append_column(rank_name, pa.array([], pa.int32()))
            return out.append_column("_final", pa.array([], pa.int8()))
        starts, ends = _runs(b, keys)
        nruns = len(starts)
        counts = ends - starts
        run_id = np.repeat(np.arange(nruns), counts)
        pos = np.arange(n) - starts[run_id]
        interior = np.ones(nruns, dtype=bool)
        interior[0] = False
        interior[-1] = False
        keep = pos < k
        idx = np.flatnonzero(keep)
        out = b.take(pa.array(idx, pa.int64()))
        if rank_name:
            out = out.append_column(
                rank_name, pa.array((pos[idx] + 1).astype(np.int32), pa.int32()))
        out = out.append_column(
            "_final", pa.array(interior[run_id][idx].astype(np.int8), pa.int8()))
        return out

    headed = (
        ds.sort(sort_keys, descending=sort_desc)
        .map_batches(head_block, batch_format="pyarrow", batch_size=None)
        .materialize()
    )
    finals_names = [c for c in headed.schema().names if c != "_final"]
    finals = headed.filter(expr="_final == 1").select_columns(finals_names)

    # boundary rows are ≤2k per block (block-local heads) — one narrow task,
    # re-sorted and re-headed per key without a shuffle
    key_spec = [(c, "ascending") for c in keys]

    def head_batch(b: pa.Table) -> pa.Table:
        if len(b) == 0:
            return b
        b = b.sort_by(key_spec + sort_spec)
        starts, ends = _runs(b, keys)
        counts = ends - starts
        run_id = np.repeat(np.arange(len(starts)), counts)
        pos = np.arange(len(b)) - starts[run_id]
        idx = np.flatnonzero(pos < k)
        out = b.take(pa.array(idx, pa.int64()))
        if rank_name:
            out = out.set_column(
                out.column_names.index(rank_name), rank_name,
                pa.array((pos[idx] + 1).astype(np.int32), pa.int32()))
        return out

    boundary = (
        headed.filter(expr="_final == 0")
        .repartition(1)
        .map_batches(head_batch, batch_format="pyarrow", batch_size=None)
        .select_columns(finals_names)
    )
    return finals.union(boundary)


def sorted_collect(
    ds: ray.data.Dataset,
    keys: list[str],
    value_col: str,
    list_name: str,
    distinct: bool = False,
) -> ray.data.Dataset:
    """Per-key ascending-sorted value list (optionally distinct) — the
    segment list-collect.  Interior runs build their ``ListArray`` straight
    from the block's sorted values (offsets arithmetic, zero Python);
    boundary runs emit block-local partial lists that a tiny per-key merge
    concatenates/re-sorts.  Output: one row per key, ``list_name`` =
    list<value type>."""
    sort_keys = [*keys, value_col]

    def collect_block(b: pa.Table) -> pa.Table:
        vtype = b.schema.field(value_col).type
        n = len(b)
        if n == 0:
            cols = {k: pa.array([], b.schema.field(k).type) for k in keys}
            cols[list_name] = pa.array([], pa.list_(vtype))
            cols["_final"] = pa.array([], pa.int8())
            return pa.Table.from_pydict(cols)
        starts, ends = _runs(b, keys)
        nruns = len(starts)
        is_boundary = np.zeros(nruns, dtype=bool)
        is_boundary[0] = True
        is_boundary[-1] = True
        vals = b.column(value_col).combine_chunks()
        if distinct:
            vstarts, _ = _runs(b, sort_keys)
            run_of_kept = np.searchsorted(starts, vstarts, side="right") - 1
            offsets = np.concatenate(
                [[0], np.cumsum(np.bincount(run_of_kept, minlength=nruns))])
            values_arr = vals.take(pa.array(vstarts, pa.int64()))
        else:
            offsets = np.concatenate([[0], np.cumsum(ends - starts)])
            values_arr = vals
        lists = pa.ListArray.from_arrays(
            pa.array(offsets, pa.int32()), values_arr)
        starts_idx = pa.array(starts, pa.int64())
        cols = {k: b.column(k).take(starts_idx) for k in keys}
        cols[list_name] = lists
        cols["_final"] = pa.array((~is_boundary).astype(np.int8), pa.int8())
        return pa.Table.from_pydict(cols)

    collected = (
        ds.sort(sort_keys)
        .map_batches(collect_block, batch_format="pyarrow", batch_size=None)
        .materialize()
    )
    out_cols = [*keys, list_name]
    finals = collected.filter(expr="_final == 1").select_columns(out_cols)

    # boundary partial lists (≤2 per block) consolidate into one narrow
    # task; per-key merge re-sorts the concatenated elements (partials are
    # few and already sorted, so this is near-linear)
    def merge_batch(b: pa.Table) -> pa.Table:
        vtype = b.schema.field(list_name).type.value_type
        if len(b) == 0:
            cols = {k: pa.array([], b.schema.field(k).type) for k in keys}
            cols[list_name] = pa.array([], pa.list_(vtype))
            return pa.Table.from_pydict(cols)
        b = b.sort_by([(k, "ascending") for k in keys])
        starts, _ = _runs(b, keys)
        lists = b.column(list_name).to_pylist()
        bounds = np.concatenate([starts, [len(b)]])
        merged = []
        for i in range(len(starts)):
            elems: list = []
            for sub in lists[bounds[i]:bounds[i + 1]]:
                elems.extend(sub)
            merged.append(sorted(set(elems)) if distinct else sorted(elems))
        cols = {k: b.column(k).take(pa.array(starts, pa.int64()))
                for k in keys}
        cols[list_name] = pa.array(merged, pa.list_(vtype))
        return pa.Table.from_pydict(cols)

    boundary = (
        collected.filter(expr="_final == 0")
        .repartition(1)
        .map_batches(merge_batch, batch_format="pyarrow", batch_size=None)
        .select_columns(out_cols)
    )
    return finals.union(boundary)


def sorted_attach_count(
    ds: ray.data.Dataset, keys: list[str], count_name: str,
) -> ray.data.Dataset:
    """Attach each key's group size to EVERY row of the group (the join-free
    ``df``-attach / segment broadcast of count).  Interior-run rows get
    their run length directly; boundary-run rows re-group per key and take
    ``len(group)`` — so a single hot key spanning many blocks pays one
    conventional group (same bound as a groupby().map_groups attach)."""

    def attach_block(b: pa.Table) -> pa.Table:
        n = len(b)
        if n == 0:
            return (b.append_column(count_name, pa.array([], pa.int64()))
                     .append_column("_final", pa.array([], pa.int8())))
        starts, ends = _runs(b, keys)
        nruns = len(starts)
        counts = ends - starts
        interior = np.ones(nruns, dtype=bool)
        interior[0] = False
        interior[-1] = False
        run_id = np.repeat(np.arange(nruns), counts)
        out = b.append_column(
            count_name, pa.array(counts[run_id].astype(np.int64), pa.int64()))
        return out.append_column(
            "_final", pa.array(interior[run_id].astype(np.int8), pa.int8()))

    attached = (
        ds.sort(keys)
        .map_batches(attach_block, batch_format="pyarrow", batch_size=None)
        .materialize()
    )
    out_names = [c for c in attached.schema().names if c != "_final"]
    finals = attached.filter(expr="_final == 1").select_columns(out_names)

    # boundary-run rows consolidate into one narrow task and get their true
    # group size from a run-length pass (no shuffle).  NOTE: a single hot
    # key spanning many blocks routes all its rows through this task — the
    # same bound a groupby().map_groups attach pays on that key.
    def fix_batch(b: pa.Table) -> pa.Table:
        if len(b) == 0:
            return b
        b = b.sort_by([(k, "ascending") for k in keys])
        starts, ends = _runs(b, keys)
        counts = ends - starts
        run_id = np.repeat(np.arange(len(starts)), counts)
        return b.set_column(
            b.column_names.index(count_name), count_name,
            pa.array(counts[run_id].astype(np.int64), pa.int64()))

    boundary = (
        attached.filter(expr="_final == 0")
        .repartition(1)
        .map_batches(fix_batch, batch_format="pyarrow", batch_size=None)
        .select_columns(out_names)
    )
    return finals.union(boundary)

def sorted_attach_first(
    ds: ray.data.Dataset,
    keys: list[str],
    value_col: str,
    order_col: str,
    attach_name: str,
    order_descending: bool = False,
) -> ray.data.Dataset:
    """Attach the key's FIRST row's ``value_col`` (under ``(keys,
    order_col)`` order) to EVERY row of the key — the segment broadcast of a
    per-key scalar, i.e. a join-free per-key attribute lookup.  The carrier
    row must be unique per key under ``order_col`` (e.g. a one-hot marker
    column); all other rows receive its value.  Interior runs read their
    run's first row directly; boundary-run rows (first/last run per block)
    consolidate into one narrow task and re-attach after a local re-sort —
    same hot-key bound as ``sorted_attach_count``."""
    sort_keys = [*keys, order_col]
    sort_desc = [False] * len(keys) + [order_descending]

    def attach_block(b: pa.Table) -> pa.Table:
        n = len(b)
        if n == 0:
            vtype = b.schema.field(value_col).type
            return (b.append_column(attach_name, pa.array([], vtype))
                     .append_column("_final", pa.array([], pa.int8())))
        starts, ends = _runs(b, keys)
        nruns = len(starts)
        counts = ends - starts
        interior = np.ones(nruns, dtype=bool)
        interior[0] = False
        interior[-1] = False
        run_id = np.repeat(np.arange(nruns), counts)
        first_idx = pa.array(starts[run_id], pa.int64())
        out = b.append_column(attach_name, b.column(value_col).take(first_idx))
        return out.append_column(
            "_final", pa.array(interior[run_id].astype(np.int8), pa.int8()))

    attached = (
        ds.sort(sort_keys, descending=sort_desc)
        .map_batches(attach_block, batch_format="pyarrow", batch_size=None)
        .materialize()
    )
    out_names = [c for c in attached.schema().names if c != "_final"]
    finals = attached.filter(expr="_final == 1").select_columns(out_names)

    spec = [(k, "ascending") for k in keys] + [
        (order_col, "descending" if order_descending else "ascending")]

    def fix_batch(b: pa.Table) -> pa.Table:
        if len(b) == 0:
            return b
        b = b.sort_by(spec)
        starts, ends = _runs(b, keys)
        run_id = np.repeat(np.arange(len(starts)), ends - starts)
        first_idx = pa.array(starts[run_id], pa.int64())
        return b.set_column(
            b.column_names.index(attach_name), attach_name,
            b.column(value_col).take(first_idx))

    boundary = (
        attached.filter(expr="_final == 0")
        .repartition(1)
        .map_batches(fix_batch, batch_format="pyarrow", batch_size=None)
        .select_columns(out_names)
    )
    return finals.union(boundary)
