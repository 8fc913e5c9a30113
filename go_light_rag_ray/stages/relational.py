"""Relational operators over the TPC-H-ish tables: broadcast equi-join,
big-big shuffle join / semi-join, and partial-aggregate groupby — the
patterns every wide relational plan at 100 TB reduces to.

- ``broadcast_join``: the small side (dimension table) is collected ONCE,
  shipped via ``ray.put``, and probed inside ``map_batches`` with Arrow
  ``index_in`` + ``take`` — no shuffle of the big side at all.  This is the
  engine's general answer to Dataset.join (which shuffles both sides and,
  per CLAUDE.md, breaks on empty blocks): any dimension that fits a worker
  heap joins for the cost of one broadcast.
- ``pricing_summary``: the TPC-H Q1 shape — per-batch vectorized partial
  aggregation (one Arrow group_by per batch) into a tiny final groupby, so
  the exchange carries #batches × #groups rows instead of the fact table.

Money stays in integer cents (``floor(x*100 + 0.5)``, the engine's
tie-stable quantization) so every sum is bit-exact against the DuckDB
oracle regardless of accumulation order.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data
import ray.data.aggregate as agg


def _cents(col: pa.ChunkedArray) -> np.ndarray:
    return np.floor(col.to_numpy(zero_copy_only=False) * 100 + 0.5).astype(
        np.int64)


def broadcast_join(
    big: ray.data.Dataset,
    small: pa.Table,
    key_big: str,
    key_small: str,
    payload_cols: list[str],
    how: str = "inner",
) -> ray.data.Dataset:
    """Equi-join ``big`` against an in-memory dimension table.

    ``small`` is put in the object store once; every task reads the SAME
    copy (zero-copy Arrow) and probes it with ``index_in`` — a vectorized
    hash lookup, no Python loop, no shuffle.  ``how="inner"`` drops probe
    misses; ``"left"`` keeps them with null payloads.  Duplicate keys on
    the small side are a caller error (first match wins, as index_in
    returns the first position)."""
    small_ref = ray.put(small.combine_chunks())

    def probe(b: pa.Table) -> pa.Table:
        dim = ray.get(small_ref)
        idx = pc.index_in(b.column(key_big), value_set=dim.column(key_small))
        if how == "inner":
            keep = pc.is_valid(idx)
            b = b.filter(keep)
            idx = idx.filter(keep)
        out = b
        for col in payload_cols:
            out = out.append_column(col, pc.take(dim.column(col), idx))
        return out

    return big.map_batches(probe, batch_format="pyarrow")


def _n_buckets(configured: int | None) -> int:
    """Bucket count for the co-partitioned join shuffle.

    Default 4× cluster CPUs (≥32): enough buckets that every core gets
    work and stragglers amortize, few enough that the per-group dispatch
    tax is noise.  At 100 TB the caller sizes this so |input|/buckets
    fits a worker heap — buckets is the ONLY memory knob the join has."""
    if configured:
        return int(configured)
    try:
        if ray.is_initialized():
            return max(32, 4 * int(ray.cluster_resources().get("CPU", 8)))
    except Exception:
        pass
    return 32


def _bucket_of(keys: np.ndarray, buckets: int) -> np.ndarray:
    """Fibonacci multiplicative hash over int64 keys — vectorized,
    deterministic, uniform even for dense sequential key spaces (TPC-H
    orderkeys), unlike ``k % B`` which aliases strided keys."""
    h = keys.astype(np.uint64, copy=False) * np.uint64(0x9E3779B97F4A7C15)
    return ((h >> np.uint64(17)) % np.uint64(buckets)).astype(np.int64)


def shuffle_join(
    left: ray.data.Dataset,
    right: ray.data.Dataset,
    key_left: str,
    key_right: str,
    payload_left: list[str],
    payload_right: list[str],
    how: str = "inner",
    buckets: int | None = None,
    salt: int = 0,
    bucket_reduce=None,
) -> ray.data.Dataset:
    """Big-big equi-join: neither side fits a worker heap, so neither can
    broadcast.  ONE co-partitioning shuffle: both sides are padded to a
    shared (key, bucket, side, payloads…) schema, unioned, and
    hash-partitioned by ``bucket = fib_hash(key) % B``; every bucket group
    then runs a single vectorized Arrow (Acero) hash join between its two
    sides.  The group count is the BOUNDED bucket count, never the key
    cardinality — no ~10µs/group tax on millions of join keys (CLAUDE.md),
    and no reliance on ``Dataset.join``'s empty-block fragility.

    Integer keys only (the engine's id discipline).  Duplicate keys on
    both sides produce the full cross-product within the key, exactly like
    SQL.

    Skew: one key's rows co-locate in one bucket — fine for
    bounded-multiplicity facts (≤7 lineitems per order).  For a WHALE key
    on the left side, pass ``salt = S > 1``: left rows spread across S
    sub-buckets of their key's bucket and the right side is replicated
    into all S (the classic salted join — shuffles S× the right bytes,
    splits the whale's work S ways).  Every left row still meets each
    matching right row exactly once, so the output row SET is identical
    to the unsalted path for both join types (value-oracled, like
    ``sessions_salted``).

    ``how``: "inner", "left" (left rows without a match keep null
    payloads) or "outer" (full outer: unmatched rows of BOTH sides
    survive with null payloads from the other side; the key column is
    coalesced).  Output columns: ``key_left`` + ``payload_left`` +
    ``payload_right``.  "outer" is incompatible with ``salt > 1``: the
    right side is replicated S×, so an unmatched right row would emit S
    copies.

    ``bucket_reduce``: optional Arrow-table → Arrow-table reduction applied
    to each bucket's joined rows INSIDE the same ``map_groups`` task.  The
    co-shuffle already routes every row of a join key to one bucket, so any
    per-key aggregate (and any per-bucket partial of a global reduction,
    e.g. a top-k) is complete there — fusing it in avoids a whole extra
    groupby/sort exchange over the join output.  Incompatible with
    ``salt > 1`` (a salted key's rows span S sub-buckets, so no per-key
    reduction is complete in one).
    """
    if bucket_reduce is not None and salt > 1:
        raise ValueError("bucket_reduce requires unsalted buckets")
    if how == "outer" and salt > 1:
        raise ValueError("outer join requires unsalted buckets")
    n_b = _n_buckets(buckets)
    n_s = max(1, int(salt))
    lt = dict(zip(left.schema().names, left.schema().types))
    rt = dict(zip(right.schema().names, right.schema().types))
    payload = ([(c, lt[c], 0) for c in payload_left]
               + [(c, rt[c], 1) for c in payload_right])

    def pad(side: int, key: str):
        def fn(b: pa.Table) -> pa.Table:
            if n_s > 1 and side == 1:
                # replicate the right side into every salt sub-bucket
                b = b.take(np.repeat(np.arange(len(b)), n_s))
            k = pc.cast(b.column(key), pa.int64()).combine_chunks()
            bkt = _bucket_of(k.to_numpy(zero_copy_only=False), n_b)
            if n_s > 1:
                # right side is row-major replicated, so arange % n_s puts
                # one copy of each right row in every sub-bucket; left rows
                # spread arbitrarily (any single sub-bucket is correct)
                bkt = bkt * n_s + np.arange(len(b), dtype=np.int64) % n_s
            cols: dict = {
                "__k": k,
                "__b": pa.array(bkt),
                "__s": pa.array(np.full(len(b), side, np.int8)),
            }
            for c, t, s in payload:
                cols[c] = (b.column(c) if s == side
                           else pa.nulls(len(b), t))
            return pa.Table.from_pydict(cols)
        return fn

    both = (left.map_batches(pad(0, key_left), batch_format="pyarrow")
            .union(right.map_batches(pad(1, key_right),
                                     batch_format="pyarrow")))
    join_type = {"inner": "inner", "left": "left outer",
                 "outer": "full outer"}[how]
    out_cols = [key_left] + payload_left + payload_right

    def join_bucket(g: pa.Table) -> pa.Table:
        s = g.column("__s").to_numpy(zero_copy_only=False)
        l_tbl = (g.filter(pa.array(s == 0))
                 .select(["__k"] + payload_left).combine_chunks())
        r_tbl = (g.filter(pa.array(s == 1))
                 .select(["__k"] + payload_right).combine_chunks())
        j = l_tbl.join(r_tbl, keys="__k", join_type=join_type,
                       coalesce_keys=True)
        j = j.rename_columns([key_left if c == "__k" else c
                              for c in j.column_names])
        j = j.select(out_cols)
        return bucket_reduce(j) if bucket_reduce is not None else j

    return (both.groupby("__b")
            .map_groups(join_bucket, batch_format="pyarrow"))


def shuffle_semi_join(
    probe: ray.data.Dataset,
    keys: ray.data.Dataset,
    key_probe: str,
    key_build: str,
    anti: bool = False,
    buckets: int | None = None,
    salt: int = 0,
) -> ray.data.Dataset:
    """Distributed semi-join (``anti=False``: keep probe rows whose key
    appears in ``keys``) / anti-join (``anti=True``: keep rows whose key
    does NOT) when the key side is too big to broadcast.  Same bucketed
    co-shuffle as ``shuffle_join`` but the build side ships ONLY its key
    column, pre-deduplicated per batch (the per-batch combiner pattern),
    and the probe side passes through row-for-row — no multiplicity, no
    payload padding cost beyond the nulls.

    ``salt = S > 1`` is the whale-probe-key twin (same contract as
    ``shuffle_join``'s): probe rows spread across S sub-buckets of their
    key's bucket, the (deduped, key-only) build side replicates into all
    S — each probe row still meets its key exactly once, so the output
    row set is identical to the unsalted path.
    """
    n_b = _n_buckets(buckets)
    n_s = max(1, int(salt))
    probe_cols = list(probe.schema().names)
    probe_types = dict(zip(probe.schema().names, probe.schema().types))

    def pad_probe(b: pa.Table) -> pa.Table:
        k = pc.cast(b.column(key_probe), pa.int64()).combine_chunks()
        bkt = _bucket_of(k.to_numpy(zero_copy_only=False), n_b)
        if n_s > 1:
            bkt = bkt * n_s + np.arange(len(b), dtype=np.int64) % n_s
        cols = {"__b": pa.array(bkt),
                "__s": pa.array(np.zeros(len(b), np.int8))}
        for c in probe_cols:
            cols[c] = b.column(c)
        return pa.Table.from_pydict(cols)

    def pad_keys(b: pa.Table) -> pa.Table:
        k = pc.unique(pc.cast(b.column(key_build), pa.int64()))
        if n_s > 1:
            k = k.take(np.repeat(np.arange(len(k)), n_s))
        bkt = _bucket_of(k.to_numpy(zero_copy_only=False), n_b)
        if n_s > 1:
            bkt = bkt * n_s + np.arange(len(k), dtype=np.int64) % n_s
        cols = {"__b": pa.array(bkt),
                "__s": pa.array(np.ones(len(k), np.int8))}
        for c in probe_cols:
            cols[c] = (k if c == key_probe
                       else pa.nulls(len(k), probe_types[c]))
        return pa.Table.from_pydict(cols)

    both = (probe.map_batches(pad_probe, batch_format="pyarrow")
            .union(keys.map_batches(pad_keys, batch_format="pyarrow")))

    def filter_bucket(g: pa.Table) -> pa.Table:
        s = g.column("__s").to_numpy(zero_copy_only=False)
        rows = g.filter(pa.array(s == 0))
        build = g.filter(pa.array(s == 1)).column(key_probe)
        hit = pc.is_in(rows.column(key_probe),
                       value_set=build.combine_chunks())
        keep = pc.invert(hit) if anti else hit
        return rows.filter(keep).select(probe_cols)

    return (both.groupby("__b")
            .map_groups(filter_bucket, batch_format="pyarrow"))


def top_revenue_orders(
    customer: ray.data.Dataset,
    orders: ray.data.Dataset,
    lineitem: ray.data.Dataset,
    segment: str = "BUILDING",
    cutoff_us: int = 896659200000000,  # 1998-06-01 UTC, mid-range of the data
    k: int = 10,
    semi_broadcast_cap: int = 2_000_000,
) -> ray.data.Dataset:
    """TPC-H Q3 shape — the full relational plan in one composition:
    segment-filtered customers semi-join orders (date-pruned), lineitem
    (date-pruned, per-batch revenue combiner) shuffle-joins the surviving
    orders, a keyed sum re-aggregates revenue per order, and a sort+limit
    takes the global top-k.

    Scale shape: every filter runs at the pruned read; lineitem reduces to
    ≤ |orderkeys per batch| partial rows BEFORE the join shuffle; the
    per-order revenue sum and a bounded top-k partial run INSIDE the join
    bucket (``bucket_reduce``), so only buckets × k rows survive the join
    and the final merge is one vectorized sort over that bounded set.
    The customer semi-join is adaptive (the BFS-frontier pattern): a
    segment whose key count fits ``semi_broadcast_cap`` ships ONCE via
    ``ray.put`` and filters orders inside the prep map (zero extra
    shuffle); a bigger segment goes through ``shuffle_semi_join``.
    Revenue is the integer product price_cents × (100 − discount_hundredths)
    so the oracle matches bit-exactly in any accumulation order; the top-k
    boundary is made deterministic by the (rev DESC, date, orderkey)
    tie-break."""

    def prep_orders(b: pa.Table) -> pa.Table:
        odate = pc.cast(b.column("o_orderdate"), pa.int64())
        t = pa.table({
            "o_orderkey": b.column("o_orderkey"),
            "o_custkey": b.column("o_custkey"),
            "odate_us": odate,
        })
        return t.filter(pc.less(odate, pa.scalar(cutoff_us, pa.int64())))

    def prep_lineitem(b: pa.Table) -> pa.Table:
        ship = pc.cast(b.column("l_shipdate"), pa.int64())
        b = b.filter(pc.greater(ship, pa.scalar(cutoff_us, pa.int64())))
        price_c = _cents(b.column("l_extendedprice"))
        disc_h = _cents(b.column("l_discount"))
        t = pa.table({
            "l_orderkey": b.column("l_orderkey"),
            "rev_c2": pa.array(price_c * (100 - disc_h), pa.int64()),
        })
        # per-batch combiner: one partial row per orderkey per batch
        g = t.group_by("l_orderkey").aggregate([("rev_c2", "sum")])
        return g.rename_columns(["l_orderkey", "rev_c2"])

    def seg_filter(b: pa.Table) -> pa.Table:
        return (b.filter(pc.equal(b.column("c_mktsegment"), segment))
                .select(["c_custkey"]))

    cust_keys = customer.map_batches(seg_filter, batch_format="pyarrow")
    # the path probe counts WITHOUT shipping rows (an over-cap segment
    # would otherwise materialize cap+1 Python dicts on the driver just
    # to be discarded); only a confirmed-small segment is collected
    n_seg = (cust_keys.limit(semi_broadcast_cap + 1).count()
             if semi_broadcast_cap > 0 else semi_broadcast_cap + 1)
    if n_seg <= semi_broadcast_cap:
        keys_ref = ray.put(pa.Table.from_pylist(
            cust_keys.take_all(),
            schema=pa.schema([("c_custkey", pa.int64())])
        ).column("c_custkey").combine_chunks())

        def prep_orders_bcast(b: pa.Table) -> pa.Table:
            t = prep_orders(b)
            return t.filter(pc.is_in(t.column("o_custkey"),
                                     value_set=ray.get(keys_ref)))

        ord_seg = orders.map_batches(prep_orders_bcast,
                                     batch_format="pyarrow")
    else:
        ord_f = orders.map_batches(prep_orders, batch_format="pyarrow")
        ord_seg = shuffle_semi_join(ord_f, cust_keys, "o_custkey",
                                    "c_custkey")
    li = lineitem.map_batches(prep_lineitem, batch_format="pyarrow")

    _SORT = [("revenue_c2", "descending"), ("o_orderdate_us", "ascending"),
             ("o_orderkey", "ascending")]

    def agg_topk(j: pa.Table) -> pa.Table:
        # the bucket holds EVERY row of its orderkeys, so the per-order
        # revenue sum is complete here; emit only the bucket's top-k —
        # a bounded partial (buckets × k rows total survive the join)
        g = j.group_by("l_orderkey").aggregate(
            [("rev_c2", "sum"), ("odate_us", "max")])
        g = g.rename_columns(
            ["o_orderkey", "revenue_c2", "o_orderdate_us"]).select(
            ["o_orderkey", "revenue_c2", "o_orderdate_us"])
        return g.take(pc.sort_indices(g, sort_keys=_SORT)[:k])

    partials = shuffle_join(li, ord_seg, "l_orderkey", "o_orderkey",
                            ["rev_c2"], ["odate_us"],
                            bucket_reduce=agg_topk)
    # final merge: ≤ buckets × k rows — one vectorized Arrow sort on the
    # driver, the same bounded-small-side pattern as running_totals'
    # block summaries
    merged = pa.Table.from_pylist(
        partials.take_all(),
        schema=pa.schema([("o_orderkey", pa.int64()),
                          ("revenue_c2", pa.int64()),
                          ("o_orderdate_us", pa.int64())]))
    top = merged.take(pc.sort_indices(merged, sort_keys=_SORT)[:k])
    return ray.data.from_arrow(top)


def pivot_counts(
    ds: ray.data.Dataset,
    key_col: str,
    type_col: str,
    types: list[str],
    cents_col: str | None = None,
) -> ray.data.Dataset:
    """PIVOT: one wide row per key with a count column per ``types`` value
    (plus an integer-cents total of ``cents_col`` if given) — the
    long→wide reshape every analytics stack ships.

    Shape: per-batch combiner factorizes the key ONCE (``np.unique``) and
    builds every per-type count with one boolean mask + ``bincount`` — a
    batch reduces to ≤ |keys in batch| wide partial rows before the ONLY
    exchange, a keyed sum over already-wide integers.  Rows whose type is
    outside ``types`` still count toward the key's row presence (a key
    with only unlisted types emits an all-zero row, exactly like SQL's
    GROUP BY over the full table)."""
    out_counts = [f"n_{t}" for t in types]

    def combine(b: pa.Table) -> pa.Table:
        keys = b.column(key_col).to_numpy(zero_copy_only=False)
        uk, inv = np.unique(keys, return_inverse=True)
        tv = b.column(type_col).to_numpy(zero_copy_only=False)
        cols = {key_col: pa.array(uk, pa.int64())}
        for t, name in zip(types, out_counts):
            cols[name] = pa.array(np.bincount(
                inv[tv == t], minlength=len(uk)).astype(np.int64))
        if cents_col is not None:
            # int64 end-to-end (bincount's float64 weights would break
            # the bit-exact contract past 2^53): segment-sum over
            # inv-sorted cents — every uk has ≥1 row by construction
            cents = _cents(b.column(cents_col))
            if len(uk) == 0:
                sums = np.zeros(0, dtype=np.int64)
            else:
                order = np.argsort(inv, kind="stable")
                starts = np.flatnonzero(np.concatenate(
                    ([True], inv[order][1:] != inv[order][:-1])))
                sums = np.add.reduceat(cents[order], starts)
            cols["total_cents"] = pa.array(sums, pa.int64())
        return pa.Table.from_pydict(cols)

    aggs = [agg.Sum(c, alias_name=c) for c in out_counts]
    if cents_col is not None:
        aggs.append(agg.Sum("total_cents", alias_name="total_cents"))
    return (ds.map_batches(combine, batch_format="pyarrow")
            .groupby(key_col)
            .aggregate(*aggs))


def unpivot(
    ds: ray.data.Dataset,
    key_col: str,
    value_cols: list[str],
    var_col: str = "variable",
    val_col: str = "value",
    var_names: list[str] | None = None,
) -> ray.data.Dataset:
    """UNPIVOT / melt — the wide→long inverse of ``pivot_counts``: each
    input row fans out to one (key, variable, value) row per
    ``value_cols`` entry.  A stateless narrow map (C projections
    concatenated per batch, no shuffle at all); values are cast to int64
    (this engine's measure discipline)."""
    names = var_names or value_cols

    def melt(b: pa.Table) -> pa.Table:
        parts = []
        for c, nm in zip(value_cols, names):
            parts.append(pa.table({
                key_col: b.column(key_col),
                var_col: pa.array(np.full(len(b), nm), pa.string()),
                val_col: pc.cast(b.column(c), pa.int64()),
            }))
        return pa.concat_tables(parts)

    return ds.map_batches(melt, batch_format="pyarrow")


def _pricing_partial(b: pa.Table) -> pa.Table:
    """Finest-grain per-batch combiner shared by pricing_summary and
    pricing_rollup: ≤6 partial rows per batch, integer measures only."""
    price_c = _cents(b.column("l_extendedprice"))
    disc_h = _cents(b.column("l_discount"))  # discount in hundredths
    qty = b.column("l_quantity").to_numpy(zero_copy_only=False).astype(
        np.int64)
    t = pa.table({
        "l_returnflag": b.column("l_returnflag"),
        "l_linestatus": b.column("l_linestatus"),
        "qty": pa.array(qty, pa.int64()),
        "base_c": pa.array(price_c, pa.int64()),
        "disc_c2": pa.array(price_c * (100 - disc_h), pa.int64()),
        "one": pa.array(np.ones(len(b), np.int64)),
    })
    g = t.group_by(["l_returnflag", "l_linestatus"]).aggregate(
        [("qty", "sum"), ("base_c", "sum"), ("disc_c2", "sum"),
         ("one", "sum")])
    return g.rename_columns(
        ["l_returnflag", "l_linestatus", "qty", "base_c", "disc_c2",
         "cnt"])


def pricing_summary(lineitem: ray.data.Dataset) -> ray.data.Dataset:
    """TPC-H Q1 shape: per (l_returnflag, l_linestatus) — row count,
    summed quantity, summed base price (cents), and summed discounted
    price in cents·hundredths (price_cents × (100 − discount_hundredths),
    kept as an integer PRODUCT so no division order can diverge).

    Partial-aggregate pattern: each batch reduces to ≤ |groups| rows with
    one Arrow ``group_by`` (6 groups for TPC-H data), then one tiny keyed
    groupby merges the partials — the exchange is #batches × 6 rows."""
    return (
        lineitem.select_columns(
            ["l_returnflag", "l_linestatus", "l_quantity",
             "l_extendedprice", "l_discount"])
        .map_batches(_pricing_partial, batch_format="pyarrow")
        .groupby(["l_returnflag", "l_linestatus"])
        .aggregate(agg.Sum("qty", alias_name="sum_qty"),
                   agg.Sum("base_c", alias_name="sum_base_cents"),
                   agg.Sum("disc_c2", alias_name="sum_disc_cents_h"),
                   agg.Sum("cnt", alias_name="n_rows"))
    )


def pricing_rollup(
    lineitem: ray.data.Dataset, cube: bool = False
) -> ray.data.Dataset:
    """GROUP BY ROLLUP(l_returnflag, l_linestatus) — the OLAP subtotal
    ladder, computed the scale-right way: ONE fact scan produces
    finest-grain per-batch partials (the pricing_summary combiner),
    MATERIALIZED once (#batches × 6 rows — tiny at any corpus size), and
    each coarser grouping set re-aggregates those partials; the fact table
    is never re-read and never re-shuffled.  ``level`` is the grouping
    bitmask exactly as SQL's GROUPING(): 0 = (flag, status), 1 = (flag),
    3 = grand total.  Aggregated-out key columns are NULL, as in SQL.
    ``cube=True`` adds the remaining grouping set of the full CUBE
    lattice — level 2 = (status) — from the SAME materialized partials
    (still one fact scan; a d-key cube is 2^d re-aggregations of the
    tiny partial table, never of the facts)."""

    partials = (lineitem.select_columns(
        ["l_returnflag", "l_linestatus", "l_quantity",
         "l_extendedprice", "l_discount"])
        .map_batches(_pricing_partial, batch_format="pyarrow")
        .materialize())
    if partials.count() == 0:
        # SQL's ROLLUP/CUBE grand total survives an empty table: one
        # level-3 row with NULL sums and count 0
        return ray.data.from_arrow(pa.table({
            "l_returnflag": pa.nulls(1, pa.string()),
            "l_linestatus": pa.nulls(1, pa.string()),
            "sum_qty": pa.nulls(1, pa.int64()),
            "sum_base_cents": pa.nulls(1, pa.int64()),
            "sum_disc_cents_h": pa.nulls(1, pa.int64()),
            "n_rows": pa.array([0], pa.int64()),
            "level": pa.array([3], pa.int64()),
        }))
    aggs = lambda: (agg.Sum("qty", alias_name="sum_qty"),  # noqa: E731
                    agg.Sum("base_c", alias_name="sum_base_cents"),
                    agg.Sum("disc_c2", alias_name="sum_disc_cents_h"),
                    agg.Sum("cnt", alias_name="n_rows"))
    meas = ["sum_qty", "sum_base_cents", "sum_disc_cents_h", "n_rows"]

    def shape(level: int, has_flag: bool, has_status: bool):
        def fn(b: pa.Table) -> pa.Table:
            n = len(b)
            return pa.table({
                "l_returnflag": (b.column("l_returnflag") if has_flag
                                 else pa.nulls(n, pa.string())),
                "l_linestatus": (b.column("l_linestatus") if has_status
                                 else pa.nulls(n, pa.string())),
                **{m: b.column(m) for m in meas},
                "level": pa.array(np.full(n, level, np.int64)),
            })
        return fn

    finest = (partials.groupby(["l_returnflag", "l_linestatus"])
              .aggregate(*aggs())
              .map_batches(shape(0, True, True), batch_format="pyarrow"))
    mid = (partials.groupby("l_returnflag").aggregate(*aggs())
           .map_batches(shape(1, True, False), batch_format="pyarrow"))

    def const_key(b: pa.Table) -> pa.Table:
        return b.append_column("_g", pa.array(
            np.zeros(len(b), np.int8)))

    total = (partials.map_batches(const_key, batch_format="pyarrow")
             .groupby("_g").aggregate(*aggs())
             .map_batches(shape(3, False, False), batch_format="pyarrow"))
    out = finest.union(mid).union(total)
    if cube:
        mid2 = (partials.groupby("l_linestatus").aggregate(*aggs())
                .map_batches(shape(2, False, True), batch_format="pyarrow"))
        out = out.union(mid2)
    return out


def revenue_by_nation(
    orders: ray.data.Dataset,
    customer: pa.Table,
    nation: pa.Table,
) -> ray.data.Dataset:
    """Orders enriched by TWO chained broadcast joins (customer →
    nationkey → nation name), then the partial-agg groupby: per nation,
    order count and total revenue in cents.  The fact table never
    shuffles; the exchange carries #batches × #nations rows."""
    cust = pa.table({
        "c_custkey": customer.column("c_custkey"),
        "c_nationkey": customer.column("c_nationkey"),
    })
    nat = pa.table({
        "n_nationkey": nation.column("n_nationkey"),
        "n_name": nation.column("n_name"),
    })
    joined = broadcast_join(
        orders.select_columns(["o_custkey", "o_totalprice"]),
        cust, "o_custkey", "c_custkey", ["c_nationkey"])
    joined = broadcast_join(
        joined, nat, "c_nationkey", "n_nationkey", ["n_name"])

    def partial(b: pa.Table) -> pa.Table:
        t = pa.table({
            "n_name": b.column("n_name"),
            "rev_c": pa.array(_cents(b.column("o_totalprice")), pa.int64()),
            "one": pa.array(np.ones(len(b), np.int64)),
        })
        g = t.group_by("n_name").aggregate([("rev_c", "sum"), ("one", "sum")])
        return g.rename_columns(["n_name", "rev_c", "cnt"])

    return (
        joined.map_batches(partial, batch_format="pyarrow")
        .groupby("n_name")
        .aggregate(agg.Sum("rev_c", alias_name="revenue_cents"),
                   agg.Sum("cnt", alias_name="n_orders"))
    )
