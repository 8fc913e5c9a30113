"""sorted_count: exact equivalence with groupby-aggregate on random data."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data
import ray.data.aggregate as agg

from go_light_rag_ray.stages.sortagg import sorted_count


@pytest.mark.parametrize("n,blocks", [(1000, 1), (5000, 8), (20000, 16)])
def test_sorted_count_matches_groupby(ray_session, n, blocks):
    rng = np.random.default_rng(n)
    a = rng.integers(0, n // 3, size=n)          # duplicate-heavy keys
    b = rng.integers(0, 4, size=n)
    carry = (a * 1000 + b).astype(np.int64)      # constant within key
    ds = ray.data.from_arrow(pa.table({
        "a": a, "b": b, "sizes": carry
    })).repartition(blocks)
    got = sorted_count(ds, keys=["a", "b"], carry=["sizes"]).to_pandas()
    want = (
        ds.groupby(["a", "b"]).aggregate(
            agg.Count(alias_name="common"),
            agg.Max("sizes", alias_name="sizes"))
        .to_pandas()[got.columns]
    )
    got = got.sort_values(["a", "b"]).reset_index(drop=True)
    want = want.sort_values(["a", "b"]).reset_index(drop=True)
    assert got.equals(want)


def test_sorted_count_single_hot_key(ray_session):
    """One key larger than any block: every block's runs are boundary."""
    ds = ray.data.from_arrow(pa.table({
        "a": [7] * 5000, "b": [1] * 5000, "sizes": [99] * 5000
    })).repartition(8)
    rows = sorted_count(ds, keys=["a", "b"], carry=["sizes"]).take_all()
    assert rows == [{"a": 7, "b": 1, "common": 5000, "sizes": 99}]


# ---------------------------------------------------------------------------
# the generalized segment-reduce family
# ---------------------------------------------------------------------------

from go_light_rag_ray.stages.sortagg import (  # noqa: E402
    sorted_attach_count,
    sorted_collect,
    sorted_reduce,
    sorted_topk,
)


def _fixture(n: int, blocks: int, n_keys: int):
    rng = np.random.default_rng(n * 7 + blocks)
    key = rng.integers(0, n_keys, size=n).astype(np.int64)
    val = rng.integers(-50, 1000, size=n).astype(np.int64)
    ds = ray.data.from_arrow(pa.table({"key": key, "val": val}))
    return ds.repartition(blocks), key, val


@pytest.mark.parametrize("n,blocks,n_keys", [(3000, 1, 40), (8000, 7, 2500),
                                             (5000, 6, 2)])
def test_sorted_reduce_matches_pandas(ray_session, n, blocks, n_keys):
    import pandas as pd

    ds, key, val = _fixture(n, blocks, n_keys)
    got = sorted_reduce(
        ds, ["key"],
        ops=[("count", "val", "cnt"), ("sum", "val", "s"),
             ("min", "val", "lo"), ("max", "val", "hi")],
    ).to_pandas().sort_values("key").reset_index(drop=True)
    df = pd.DataFrame({"key": key, "val": val})
    want = (df.groupby("key")["val"].agg(cnt="count", s="sum", lo="min",
                                         hi="max")
            .reset_index().sort_values("key").reset_index(drop=True))
    assert got[["key", "cnt", "s", "lo", "hi"]].equals(
        want[["key", "cnt", "s", "lo", "hi"]])


def test_sorted_reduce_first_by_marker(ray_session):
    """'first' under a one-hot descending marker picks the marked row —
    the label-propagation gather shape (self row carries the payload)."""
    n, n_keys = 6000, 900
    rng = np.random.default_rng(11)
    key = rng.integers(0, n_keys, size=n).astype(np.int64)
    # exactly one marked row per key, carrying a recognizable payload
    first_pos = {k: int(np.flatnonzero(key == k)[0]) for k in np.unique(key)}
    marker = np.zeros(n, dtype=np.int8)
    payload = rng.integers(0, 10, size=n).astype(np.int64)
    for k, i in first_pos.items():
        marker[i] = 1
        payload[i] = 100000 + k
    ds = ray.data.from_arrow(pa.table(
        {"key": key, "marker": marker, "payload": payload})).repartition(5)
    rows = sorted_reduce(
        ds, ["key"], ops=[("first", "payload", "p"), ("max", "payload", "m")],
        order_col="marker", order_descending=True,
    ).take_all()
    assert len(rows) == len(first_pos)
    for r in rows:
        assert r["p"] == 100000 + r["key"]


@pytest.mark.parametrize("k,blocks", [(1, 4), (3, 1), (5, 9)])
def test_sorted_topk_matches_pandas(ray_session, k, blocks):
    import pandas as pd

    n, n_keys = 7000, 300
    rng = np.random.default_rng(k * 13 + blocks)
    key = rng.integers(0, n_keys, size=n).astype(np.int64)
    score = np.round(rng.random(size=n), 3)
    tie = np.arange(n, dtype=np.int64)  # unique tie-break
    ds = ray.data.from_arrow(pa.table(
        {"key": key, "score": score, "tie": tie})).repartition(blocks)
    got = sorted_topk(
        ds, ["key"], order_by=["score", "tie"], k=k,
        descending=[True, False], rank_name="rank",
    ).to_pandas().sort_values(["key", "rank"]).reset_index(drop=True)
    df = pd.DataFrame({"key": key, "score": score, "tie": tie})
    df = df.sort_values(["key", "score", "tie"],
                        ascending=[True, False, True])
    want = df.groupby("key").head(k).copy()
    want["rank"] = want.groupby("key").cumcount().astype("int32") + 1
    want = want.sort_values(["key", "rank"]).reset_index(drop=True)
    assert got[["key", "score", "tie", "rank"]].equals(
        want[["key", "score", "tie", "rank"]])


@pytest.mark.parametrize("distinct", [False, True])
def test_sorted_collect_matches_python(ray_session, distinct):
    n, n_keys = 6000, 700
    rng = np.random.default_rng(5 if distinct else 6)
    key = rng.integers(0, n_keys, size=n).astype(np.int64)
    val = rng.integers(0, 25, size=n).astype(np.int64)  # heavy dup values
    ds = ray.data.from_arrow(pa.table({"key": key, "val": val})).repartition(6)
    rows = sorted_collect(ds, ["key"], "val", "vals",
                          distinct=distinct).take_all()
    want: dict[int, list[int]] = {}
    for kk, vv in zip(key.tolist(), val.tolist()):
        want.setdefault(kk, []).append(vv)
    assert len(rows) == len(want)
    for r in rows:
        exp = sorted(set(want[r["key"]])) if distinct else sorted(want[r["key"]])
        assert r["vals"] == exp


def test_sorted_attach_count_matches_pandas(ray_session):
    import pandas as pd

    n, n_keys = 9000, 1200
    rng = np.random.default_rng(21)
    key = rng.integers(0, n_keys, size=n).astype(np.int64)
    val = np.arange(n, dtype=np.int64)
    ds = ray.data.from_arrow(pa.table({"key": key, "val": val})).repartition(7)
    got = sorted_attach_count(ds, ["key"], "df").to_pandas() \
        .sort_values("val").reset_index(drop=True)
    df = pd.DataFrame({"key": key, "val": val})
    df["df"] = df.groupby("key")["key"].transform("count")
    want = df.sort_values("val").reset_index(drop=True)
    assert got[["key", "val", "df"]].equals(want[["key", "val", "df"]])


def test_segment_family_hot_key(ray_session):
    """A single key spanning every block: all runs boundary, still exact."""
    n = 4000
    val = np.arange(n, dtype=np.int64)
    ds = ray.data.from_arrow(pa.table(
        {"key": np.zeros(n, dtype=np.int64), "val": val})).repartition(8)
    red = sorted_reduce(ds, ["key"], ops=[("count", "val", "c"),
                                          ("sum", "val", "s"),
                                          ("min", "val", "lo")]).take_all()
    assert red == [{"key": 0, "c": n, "s": int(val.sum()), "lo": 0}]
    top = sorted_topk(ds, ["key"], ["val"], k=3, rank_name="r").take_all()
    top.sort(key=lambda r: r["r"])
    assert [(r["val"], r["r"]) for r in top] == [(0, 1), (1, 2), (2, 3)]
    att = sorted_attach_count(ds, ["key"], "cnt").take_all()
    assert len(att) == n and all(r["cnt"] == n for r in att)
    col = sorted_collect(ds, ["key"], "val", "vals").take_all()
    assert len(col) == 1 and col[0]["vals"] == val.tolist()
