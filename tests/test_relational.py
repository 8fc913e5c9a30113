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


def test_shuffle_join_inner_duplicates_both_sides():
    from go_light_rag_ray.stages.relational import shuffle_join

    left = ray.data.from_arrow(pa.table({
        "k": pa.array([1, 1, 2, 3, 7], pa.int64()),
        "lv": pa.array([10, 11, 20, 30, 70], pa.int64()),
    })).repartition(3)
    right = ray.data.from_arrow(pa.table({
        "rk": pa.array([1, 2, 2, 9], pa.int64()),
        "rv": pa.array(["a", "b", "c", "z"]),
    })).repartition(2)
    got = sorted((r["k"], r["lv"], r["rv"]) for r in shuffle_join(
        left, right, "k", "rk", ["lv"], ["rv"], buckets=5).take_all())
    # full cross-product within each key, SQL semantics
    assert got == [(1, 10, "a"), (1, 11, "a"), (2, 20, "b"), (2, 20, "c")]


def test_shuffle_join_left_keeps_misses():
    from go_light_rag_ray.stages.relational import shuffle_join

    left = ray.data.from_arrow(pa.table({
        "k": pa.array([1, 7], pa.int64()),
        "lv": pa.array([10, 70], pa.int64()),
    }))
    right = ray.data.from_arrow(pa.table({
        "rk": pa.array([1], pa.int64()),
        "rv": pa.array(["a"]),
    }))
    got = sorted(((r["k"], r["rv"]) for r in shuffle_join(
        left, right, "k", "rk", ["lv"], ["rv"], how="left",
        buckets=4).take_all()), key=lambda x: x[0])
    assert got == [(1, "a"), (7, None)]


def test_shuffle_semi_and_anti_join():
    from go_light_rag_ray.stages.relational import shuffle_semi_join

    probe = ray.data.from_arrow(pa.table({
        "k": pa.array([1, 2, 3, 4], pa.int64()),
        "v": pa.array(["w", "x", "y", "z"]),
    })).repartition(2)
    keys = ray.data.from_arrow(pa.table({
        "bk": pa.array([2, 2, 4, 8], pa.int64()),
    })).repartition(2)
    semi = sorted(r["k"] for r in shuffle_semi_join(
        probe, keys, "k", "bk", buckets=3).take_all())
    anti = sorted(r["k"] for r in shuffle_semi_join(
        probe, keys, "k", "bk", anti=True, buckets=3).take_all())
    assert semi == [2, 4] and anti == [1, 3]


def test_shuffle_join_matches_duckdb_at_scale():
    """500-key join with per-key multiplicity on both sides vs DuckDB."""
    import duckdb

    from go_light_rag_ray.stages.relational import shuffle_join

    rng = np.random.default_rng(7)
    lk = rng.integers(0, 500, 3000).astype(np.int64)
    rk = rng.integers(0, 600, 900).astype(np.int64)
    lt = pa.table({"k": lk, "lv": np.arange(3000, dtype=np.int64)})
    rt = pa.table({"rk": rk, "rv": np.arange(900, dtype=np.int64)})
    ds = shuffle_join(
        ray.data.from_arrow(lt).repartition(7),
        ray.data.from_arrow(rt).repartition(4),
        "k", "rk", ["lv"], ["rv"], buckets=13)
    got = sorted((r["k"], r["lv"], r["rv"]) for r in ds.take_all())
    con = duckdb.connect()
    con.register("l", lt)
    con.register("r", rt)
    want = sorted(map(tuple, con.execute(
        "SELECT k, lv, rv FROM l JOIN r ON k = rk").fetchall()))
    assert got == want


def test_shuffle_join_salted_identical_to_unsalted():
    """Whale key (one key = 60% of left rows): the salted path must emit
    exactly the unsalted row set, for inner AND left joins."""
    from go_light_rag_ray.stages.relational import shuffle_join

    rng = np.random.default_rng(11)
    lk = np.where(rng.random(2000) < 0.6, 42,
                  rng.integers(0, 300, 2000)).astype(np.int64)
    rk = np.concatenate([np.full(3, 42), rng.integers(0, 350, 200)]
                        ).astype(np.int64)
    lt = pa.table({"k": lk, "lv": np.arange(2000, dtype=np.int64)})
    rt = pa.table({"rk": rk, "rv": np.arange(203, dtype=np.int64)})
    for how in ("inner", "left"):
        plain = sorted((r["k"], r["lv"], r["rv"]) for r in shuffle_join(
            ray.data.from_arrow(lt).repartition(5),
            ray.data.from_arrow(rt).repartition(3),
            "k", "rk", ["lv"], ["rv"], how=how, buckets=11).take_all())
        salted = sorted((r["k"], r["lv"], r["rv"]) for r in shuffle_join(
            ray.data.from_arrow(lt).repartition(5),
            ray.data.from_arrow(rt).repartition(3),
            "k", "rk", ["lv"], ["rv"], how=how, buckets=11,
            salt=4).take_all())
        assert salted == plain, how


def test_top_revenue_orders_q3_matches_duckdb():
    """TPC-H Q3 composition on a synthetic 3-table fixture vs DuckDB,
    including the deterministic (rev DESC, date, orderkey) tie-break."""
    import duckdb

    from go_light_rag_ray.stages.relational import top_revenue_orders

    rng = np.random.default_rng(3)
    n_cust, n_ord, n_li = 40, 300, 1200
    segs = ["BUILDING", "AUTOMOBILE", "MACHINERY"]
    cust = pa.table({
        "c_custkey": np.arange(n_cust, dtype=np.int64),
        "c_mktsegment": pa.array([segs[i % 3] for i in range(n_cust)]),
    })
    day_us = 86_400_000_000
    cutoff_us = 500 * day_us
    odate = rng.integers(0, 1000, n_ord) * day_us
    orders = pa.table({
        "o_orderkey": np.arange(n_ord, dtype=np.int64),
        "o_custkey": rng.integers(0, n_cust, n_ord).astype(np.int64),
        "o_orderdate": pa.array(odate, pa.timestamp("us")),
    })
    # duplicate revenue values force ties at the top-k boundary
    price = rng.integers(1, 5, n_li) * 100.0
    li = pa.table({
        "l_orderkey": rng.integers(0, n_ord, n_li).astype(np.int64),
        "l_shipdate": pa.array(rng.integers(0, 1000, n_li) * day_us,
                               pa.timestamp("us")),
        "l_extendedprice": pa.array(price, pa.float64()),
        "l_discount": pa.array(rng.integers(0, 3, n_li) / 100.0,
                               pa.float64()),
    })
    got = [(r["o_orderkey"], r["revenue_c2"], r["o_orderdate_us"])
           for r in top_revenue_orders(
               ray.data.from_arrow(cust).repartition(3),
               ray.data.from_arrow(orders).repartition(4),
               ray.data.from_arrow(li).repartition(5),
               segment="BUILDING", cutoff_us=cutoff_us, k=10).take_all()]
    con = duckdb.connect()
    con.register("customer", cust)
    con.register("orders", orders)
    con.register("lineitem", li)
    want = [tuple(r) for r in con.execute(f"""
        WITH l AS (
          SELECT l_orderkey,
                 (floor(l_extendedprice*100 + 0.5)::BIGINT
                  * (100 - floor(l_discount*100 + 0.5)::BIGINT)) AS rc
          FROM lineitem WHERE epoch_us(l_shipdate) > {cutoff_us})
        SELECT o.o_orderkey, sum(l.rc)::BIGINT AS revenue_c2,
               epoch_us(o.o_orderdate)::BIGINT AS o_orderdate_us
        FROM orders o
        JOIN customer c ON c.c_custkey = o.o_custkey
                        AND c.c_mktsegment = 'BUILDING'
        JOIN l ON l.l_orderkey = o.o_orderkey
        WHERE epoch_us(o.o_orderdate) < {cutoff_us}
        GROUP BY o.o_orderkey, o.o_orderdate
        ORDER BY revenue_c2 DESC, o_orderdate_us, o_orderkey
        LIMIT 10""").fetchall()]
    assert got == want


def test_top_revenue_orders_semi_paths_identical():
    """Broadcast and shuffle semi-join paths emit the identical top-k."""
    from go_light_rag_ray.stages.relational import top_revenue_orders

    rng = np.random.default_rng(5)
    day_us = 86_400_000_000
    cust = pa.table({
        "c_custkey": np.arange(20, dtype=np.int64),
        "c_mktsegment": pa.array(
            ["BUILDING" if i % 2 else "MACHINERY" for i in range(20)]),
    })
    orders = pa.table({
        "o_orderkey": np.arange(100, dtype=np.int64),
        "o_custkey": rng.integers(0, 20, 100).astype(np.int64),
        "o_orderdate": pa.array(rng.integers(0, 400, 100) * day_us,
                                pa.timestamp("us")),
    })
    li = pa.table({
        "l_orderkey": rng.integers(0, 100, 400).astype(np.int64),
        "l_shipdate": pa.array(rng.integers(0, 400, 400) * day_us,
                               pa.timestamp("us")),
        "l_extendedprice": pa.array(rng.integers(1, 90, 400) * 1.0,
                                    pa.float64()),
        "l_discount": pa.array(np.zeros(400), pa.float64()),
    })
    args = (ray.data.from_arrow(cust).repartition(2),
            ray.data.from_arrow(orders).repartition(3),
            ray.data.from_arrow(li).repartition(4))
    kw = dict(segment="BUILDING", cutoff_us=200 * day_us, k=5)
    bcast = [tuple(r.values()) for r in
             top_revenue_orders(*args, **kw).take_all()]
    shuf = [tuple(r.values()) for r in
            top_revenue_orders(*args, **kw, semi_broadcast_cap=0)
            .take_all()]
    assert bcast == shuf and len(bcast) == 5


def test_shuffle_join_bucket_reduce_rejects_salt():
    """A salted key's rows span S sub-buckets, so no per-key reduction is
    complete in one — the combination must be refused loudly."""
    import pytest

    from go_light_rag_ray.stages.relational import shuffle_join

    t = pa.table({"k": pa.array([1], pa.int64()),
                  "v": pa.array([1], pa.int64())})
    ds = ray.data.from_arrow(t)
    with pytest.raises(ValueError, match="bucket_reduce"):
        shuffle_join(ds, ds, "k", "k", ["v"], [], salt=2,
                     bucket_reduce=lambda x: x)


def test_shuffle_join_full_outer_matches_duckdb():
    """Unmatched rows of BOTH sides survive with nulls; key coalesced."""
    import duckdb

    from go_light_rag_ray.stages.relational import shuffle_join

    rng = np.random.default_rng(13)
    lk = rng.integers(0, 40, 120).astype(np.int64)
    rk = rng.integers(20, 60, 80).astype(np.int64)
    lt = pa.table({"k": lk, "lv": np.arange(120, dtype=np.int64)})
    rt = pa.table({"rk": rk, "rv": np.arange(80, dtype=np.int64)})
    ds = shuffle_join(
        ray.data.from_arrow(lt).repartition(4),
        ray.data.from_arrow(rt).repartition(3),
        "k", "rk", ["lv"], ["rv"], how="outer", buckets=7)
    got = sorted(((r["k"], r["lv"], r["rv"]) for r in ds.take_all()),
                 key=lambda t: tuple(-1 if v is None else v for v in t))
    con = duckdb.connect()
    con.register("l", lt)
    con.register("r", rt)
    want = sorted(map(tuple, con.execute(
        "SELECT coalesce(k, rk) AS k, lv, rv FROM l FULL OUTER JOIN r "
        "ON k = rk").fetchall()),
        key=lambda t: tuple(-1 if v is None else v for v in t))
    assert got == want


def test_pricing_rollup_subtotal_ladder():
    """Each rollup level must be an exact re-aggregation of the finer
    one, with SQL's GROUPING() bitmask levels and NULLed-out keys."""
    li = ray.data.from_arrow(pa.table({
        "l_returnflag": ["A", "A", "R", "R"],
        "l_linestatus": ["F", "O", "F", "F"],
        "l_quantity": pa.array([1.0, 2.0, 3.0, 4.0], pa.float64()),
        "l_extendedprice": pa.array([10.0, 20.0, 30.0, 40.0], pa.float64()),
        "l_discount": pa.array([0.0, 0.1, 0.0, 0.05], pa.float64()),
    })).repartition(3)
    from go_light_rag_ray.stages.relational import pricing_rollup

    rows = pricing_rollup(li).take_all()
    by_level = {}
    for r in rows:
        by_level.setdefault(r["level"], []).append(r)
    assert len(by_level[0]) == 3 and len(by_level[1]) == 2
    assert len(by_level[3]) == 1
    total = by_level[3][0]
    assert total["l_returnflag"] is None and total["l_linestatus"] is None
    assert total["sum_qty"] == 10 and total["n_rows"] == 4
    mid = {r["l_returnflag"]: r for r in by_level[1]}
    assert mid["A"]["sum_qty"] == 3 and mid["R"]["sum_qty"] == 7
    assert mid["A"]["l_linestatus"] is None
    fine_a = [r for r in by_level[0] if r["l_returnflag"] == "A"]
    assert sum(r["sum_base_cents"] for r in fine_a) == \
        mid["A"]["sum_base_cents"]


def test_shuffle_semi_join_salted_identical():
    """Whale probe key: the salted semi/anti paths must emit exactly the
    unsalted row sets."""
    from go_light_rag_ray.stages.relational import shuffle_semi_join

    rng = np.random.default_rng(17)
    pk = np.where(rng.random(1500) < 0.5, 7,
                  rng.integers(0, 200, 1500)).astype(np.int64)
    probe = pa.table({"k": pk, "v": np.arange(1500, dtype=np.int64)})
    keys = pa.table({"bk": np.concatenate(
        [[7], rng.integers(0, 250, 60)]).astype(np.int64)})
    for anti in (False, True):
        plain = sorted((r["k"], r["v"]) for r in shuffle_semi_join(
            ray.data.from_arrow(probe).repartition(5),
            ray.data.from_arrow(keys).repartition(2),
            "k", "bk", anti=anti, buckets=11).take_all())
        salted = sorted((r["k"], r["v"]) for r in shuffle_semi_join(
            ray.data.from_arrow(probe).repartition(5),
            ray.data.from_arrow(keys).repartition(2),
            "k", "bk", anti=anti, buckets=11, salt=4).take_all())
        assert plain == salted and len(plain) > 0


def test_pivot_counts_wide_rows():
    """Wide per-key type counts; keys with only unlisted types emit an
    all-zero row; cents total is integer-exact."""
    from go_light_rag_ray.stages.relational import pivot_counts

    ev = ray.data.from_arrow(pa.table({
        "user_id": pa.array([1, 1, 2, 2, 3], pa.int64()),
        "event_type": ["click", "view", "click", "click", "other"],
        "value": pa.array([1.005, 2.0, 0.5, 0.25, 9.99], pa.float64()),
    })).repartition(3)
    rows = {r["user_id"]: r for r in pivot_counts(
        ev, "user_id", "event_type", ["click", "view"],
        cents_col="value").take_all()}
    assert rows[1]["n_click"] == 1 and rows[1]["n_view"] == 1
    # 1.005 is binary 1.00499…, so floor(x*100+0.5) = 100 on BOTH the
    # engine and DuckDB — the shared-op-sequence contract, not a bug
    assert rows[1]["total_cents"] == 300
    assert rows[2]["n_click"] == 2 and rows[2]["n_view"] == 0
    assert rows[3]["n_click"] == 0 and rows[3]["n_view"] == 0
    assert rows[3]["total_cents"] == 999


def test_unpivot_inverts_pivot():
    """melt(pivot(x)) reproduces the per-(key, type) counts, zero cells
    included."""
    from go_light_rag_ray.stages.relational import pivot_counts, unpivot

    ev = ray.data.from_arrow(pa.table({
        "user_id": pa.array([1, 1, 2], pa.int64()),
        "event_type": ["click", "view", "click"],
        "value": pa.array([1.0, 1.0, 1.0], pa.float64()),
    }))
    wide = pivot_counts(ev, "user_id", "event_type", ["click", "view"])
    long = sorted((r["user_id"], r["event_type"], r["n"]) for r in unpivot(
        wide, "user_id", ["n_click", "n_view"], var_col="event_type",
        val_col="n", var_names=["click", "view"]).take_all())
    assert long == [(1, "click", 1), (1, "view", 1),
                    (2, "click", 1), (2, "view", 0)]


def test_pricing_rollup_empty_input_grand_total():
    """SQL's ROLLUP emits one level-3 row (NULL sums, count 0) on an
    empty table — the engine must match."""
    li = ray.data.from_arrow(pa.table({
        "l_returnflag": pa.array([], pa.string()),
        "l_linestatus": pa.array([], pa.string()),
        "l_quantity": pa.array([], pa.float64()),
        "l_extendedprice": pa.array([], pa.float64()),
        "l_discount": pa.array([], pa.float64()),
    }))
    from go_light_rag_ray.stages.relational import pricing_rollup

    rows = pricing_rollup(li).take_all()
    assert len(rows) == 1
    r = rows[0]
    assert r["level"] == 3 and r["n_rows"] == 0
    assert r["sum_qty"] is None and r["l_returnflag"] is None


def test_pricing_cube_adds_status_grouping_set():
    import pyarrow as pa
    import ray.data
    from go_light_rag_ray.stages.relational import pricing_rollup

    li = ray.data.from_arrow(pa.table({
        "l_returnflag": ["A", "A", "R"],
        "l_linestatus": ["O", "F", "O"],
        "l_quantity": [1.0, 2.0, 3.0],
        "l_extendedprice": [10.0, 20.0, 30.0],
        "l_discount": [0.0, 0.0, 0.0],
    }))
    rows = pricing_rollup(li, cube=True).take_all()
    by_level = {}
    for r in rows:
        by_level.setdefault(r["level"], []).append(r)
    assert sorted(by_level) == [0, 1, 2, 3]
    # level 2 = status-only grouping set (flag NULL)
    lvl2 = {r["l_linestatus"]: r for r in by_level[2]}
    assert set(lvl2) == {"O", "F"}
    assert all(r["l_returnflag"] is None for r in by_level[2])
    assert lvl2["O"]["sum_qty"] == 4 and lvl2["O"]["n_rows"] == 2
    assert lvl2["F"]["sum_qty"] == 2
    # rollup subset unchanged
    assert len(by_level[0]) == 3 and len(by_level[1]) == 2
    assert by_level[3][0]["n_rows"] == 3
