"""Relational operators over the TPC-H-ish tables: broadcast equi-join and
partial-aggregate groupby — the two patterns every wide relational plan at
100 TB reduces to.

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


def pricing_summary(lineitem: ray.data.Dataset) -> ray.data.Dataset:
    """TPC-H Q1 shape: per (l_returnflag, l_linestatus) — row count,
    summed quantity, summed base price (cents), and summed discounted
    price in cents·hundredths (price_cents × (100 − discount_hundredths),
    kept as an integer PRODUCT so no division order can diverge).

    Partial-aggregate pattern: each batch reduces to ≤ |groups| rows with
    one Arrow ``group_by`` (6 groups for TPC-H data), then one tiny keyed
    groupby merges the partials — the exchange is #batches × 6 rows."""

    def partial(b: pa.Table) -> pa.Table:
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

    return (
        lineitem.select_columns(
            ["l_returnflag", "l_linestatus", "l_quantity",
             "l_extendedprice", "l_discount"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby(["l_returnflag", "l_linestatus"])
        .aggregate(agg.Sum("qty", alias_name="sum_qty"),
                   agg.Sum("base_c", alias_name="sum_base_cents"),
                   agg.Sum("disc_c2", alias_name="sum_disc_cents_h"),
                   agg.Sum("cnt", alias_name="n_rows"))
    )


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
