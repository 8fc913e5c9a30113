"""Broadcast equi-join + partial-aggregate relational operators."""

import numpy as np
import pyarrow as pa
import ray.data

from go_light_rag_ray.stages.relational import (
    broadcast_join,
    pricing_summary,
    revenue_by_nation,
)


def test_broadcast_join_inner_and_left():
    big = ray.data.from_arrow(pa.table({
        "k": pa.array([1, 2, 3, 2, 9], pa.int64()),
        "v": pa.array([10, 20, 30, 21, 99], pa.int64()),
    }))
    dim = pa.table({"dk": pa.array([1, 2, 3], pa.int64()),
                    "name": pa.array(["a", "b", "c"])})
    inner = broadcast_join(big, dim, "k", "dk", ["name"]).take_all()
    assert sorted((r["k"], r["name"]) for r in inner) == [
        (1, "a"), (2, "b"), (2, "b"), (3, "c")]
    left = broadcast_join(big, dim, "k", "dk", ["name"], how="left").take_all()
    assert len(left) == 5
    assert [r["name"] for r in left if r["k"] == 9] == [None]


def test_pricing_summary_exact_cents():
    li = ray.data.from_arrow(pa.table({
        "l_returnflag": ["A", "A", "R"],
        "l_linestatus": ["F", "F", "O"],
        "l_quantity": pa.array([2.0, 3.0, 4.0], pa.float64()),
        "l_extendedprice": pa.array([10.05, 0.07, 99.999], pa.float64()),
        "l_discount": pa.array([0.05, 0.0, 0.10], pa.float64()),
    }))
    rows = {(r["l_returnflag"], r["l_linestatus"]): r
            for r in pricing_summary(li).take_all()}
    af = rows[("A", "F")]
    assert af["sum_qty"] == 5 and af["n_rows"] == 2
    assert af["sum_base_cents"] == 1005 + 7
    assert af["sum_disc_cents_h"] == 1005 * 95 + 7 * 100
    ro = rows[("R", "O")]
    assert ro["sum_base_cents"] == 10000           # 99.999 → 10000 cents
    assert ro["sum_disc_cents_h"] == 10000 * 90


def test_revenue_by_nation_chained_broadcast():
    orders = ray.data.from_arrow(pa.table({
        "o_custkey": pa.array([1, 1, 2, 3], pa.int64()),
        "o_totalprice": pa.array([1.00, 2.50, 4.00, 8.00], pa.float64()),
    }))
    customer = pa.table({
        "c_custkey": pa.array([1, 2, 3], pa.int64()),
        "c_nationkey": pa.array([10, 10, 20], pa.int64()),
    })
    nation = pa.table({
        "n_nationkey": pa.array([10, 20], pa.int64()),
        "n_name": pa.array(["FR", "JP"]),
    })
    rows = {r["n_name"]: r
            for r in revenue_by_nation(orders, customer, nation).take_all()}
    assert rows["FR"]["revenue_cents"] == 100 + 250 + 400
    assert rows["FR"]["n_orders"] == 3
    assert rows["JP"]["revenue_cents"] == 800 and rows["JP"]["n_orders"] == 1
