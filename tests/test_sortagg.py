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
