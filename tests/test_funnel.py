"""Funnel + cohort retention (stages/funnel.py)."""

import datetime as dt

import pyarrow as pa
import ray.data

from go_light_rag_ray.stages.funnel import funnel_counts, retention_cohorts

T0 = dt.datetime(2024, 1, 1)
US = 1_000_000
BASE = int(T0.timestamp()) * US


def _events(rows):
    """rows: (event_id, t_seconds, user_id, event_type)."""
    return ray.data.from_arrow(pa.table({
        "event_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array([T0 + dt.timedelta(seconds=r[1]) for r in rows],
                       pa.timestamp("us")),
        "user_id": pa.array([r[2] for r in rows], pa.int64()),
        "event_type": pa.array([r[3] for r in rows], pa.string()),
        "value": pa.array([0.0] * len(rows), pa.float64()),
    }))


def _funnel_dict(ds):
    return {r["step"]: (r["event_type"], r["n_users"])
            for r in ds.take_all()}


def test_funnel_order_matters():
    ev = _events([
        # user 1: full ordered funnel
        (0, 10, 1, "view"), (1, 20, 1, "click"), (2, 30, 1, "purchase"),
        # user 2: click BEFORE the first view — never advances past view
        (3, 50, 2, "click"), (4, 60, 2, "view"),
        # user 3: view then purchase, no click — stops at step 1
        (5, 10, 3, "view"), (6, 40, 3, "purchase"),
        # user 4: no view at all — not even step 1
        (7, 5, 4, "click"), (8, 15, 4, "purchase"),
    ])
    out = _funnel_dict(funnel_counts(ev, steps=("view", "click", "purchase")))
    assert out[1] == ("view", 3)
    assert out[2] == ("click", 1)
    assert out[3] == ("purchase", 1)


def test_funnel_equal_ts_does_not_advance():
    # click at EXACTLY the view's timestamp: strict > means no advance
    ev = _events([(0, 10, 1, "view"), (1, 10, 1, "click"),
                  (2, 10, 2, "view"), (3, 11, 2, "click")])
    out = _funnel_dict(funnel_counts(ev, steps=("view", "click")))
    assert out[1] == ("view", 2)
    assert out[2] == ("click", 1)


def test_funnel_uses_earliest_first_step():
    # user 1's SECOND view is followed by a click, but the funnel anchors
    # on the EARLIEST view — the click after it still counts
    ev = _events([(0, 10, 1, "view"), (1, 100, 1, "view"),
                  (2, 50, 1, "click")])
    out = _funnel_dict(funnel_counts(ev, steps=("view", "click")))
    assert out[2] == ("click", 1)


def test_funnel_conversion_window():
    ev = _events([
        # user 1 converts within the hour
        (0, 0, 1, "view"), (1, 100, 1, "click"),
        # user 2 clicks 2h after the first view — outside within_s=3600
        (2, 0, 2, "view"), (3, 7200, 2, "click"),
        # user 3: a later view would be in-window, but the anchor is the
        # FIRST view, so the click at t=8000 (first view t=0) is out
        (4, 0, 3, "view"), (5, 7000, 3, "view"), (6, 8000, 3, "click"),
    ])
    out = _funnel_dict(funnel_counts(ev, steps=("view", "click"),
                                     within_s=3600))
    assert out[1] == ("view", 3)
    assert out[2] == ("click", 1)
    # unbounded: everyone converts
    out0 = _funnel_dict(funnel_counts(ev, steps=("view", "click")))
    assert out0[2] == ("click", 3)


def test_funnel_zero_rows_still_emits_all_steps():
    ev = _events([(0, 10, 1, "view")])
    out = _funnel_dict(funnel_counts(ev, steps=("view", "click", "purchase")))
    assert out == {1: ("view", 1), 2: ("click", 0), 3: ("purchase", 0)}


def test_retention_matrix():
    day = 86400
    ev = _events([
        # user 1: first event day 0, active days 0 and 2
        (0, 10, 1, "view"), (1, 2 * day + 5, 1, "click"),
        # user 2: first event day 1 (cohort = day 1), active days 1, 2
        (2, day + 3, 2, "view"), (3, 2 * day + 9, 2, "view"),
        # user 3: only day 0
        (4, 20, 3, "purchase"),
    ])
    cells = {(r["cohort_us"], r["period_us"]): r["n_users"]
             for r in retention_cohorts(ev, period_s=day).take_all()}
    d = day * US
    assert cells[(BASE, BASE)] == 2                 # users 1, 3 in cohort day0
    assert cells[(BASE, BASE + 2 * d)] == 1         # user 1 returns day 2
    assert cells[(BASE + d, BASE + d)] == 1         # user 2 cohort day1
    assert cells[(BASE + d, BASE + 2 * d)] == 1     # user 2 active day 2
    assert len(cells) == 4


def test_retention_dedups_within_period():
    day = 86400
    # many events in one period still count the user once
    ev = _events([(i, i, 7, "view") for i in range(5)])
    cells = retention_cohorts(ev, period_s=day).take_all()
    assert len(cells) == 1 and cells[0]["n_users"] == 1


def test_funnel_rejects_repeated_steps():
    import pytest

    import pyarrow as pa
    import ray.data

    ev = ray.data.from_arrow(pa.table({
        "user_id": pa.array([1], pa.int64()),
        "event_type": pa.array(["view"], pa.string()),
        "ts": pa.array([0], pa.timestamp("us")),
    }))
    with pytest.raises(ValueError, match="distinct"):
        funnel_counts(ev, steps=("view", "view", "purchase"))
