"""Event-time operators: tumbling/hopping windows, sessions, as-of join."""

import datetime as dt

import pyarrow as pa
import ray.data

from go_light_rag_ray.stages.windows import (
    asof_join_latest,
    hopping_window_agg,
    sessionize,
    tumbling_window_agg,
)

T0 = dt.datetime(2024, 1, 1)


def _events(rows):
    return ray.data.from_arrow(pa.table({
        "event_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array([T0 + dt.timedelta(seconds=r[1]) for r in rows],
                       pa.timestamp("us")),
        "user_id": pa.array([r[2] for r in rows], pa.int64()),
        "event_type": pa.array([r[3] for r in rows], pa.string()),
        "value": pa.array([r[4] for r in rows], pa.float64()),
    }))


def test_tumbling_window():
    ev = _events([
        (0, 10, 1, "click", 1.25),
        (1, 20, 1, "click", 2.50),
        (2, 3700, 1, "click", 4.00),   # next hour
        (3, 30, 2, "view", 0.10),
    ])
    rows = {(r["window_start_us"], r["event_type"]): r
            for r in tumbling_window_agg(ev, window_s=3600).take_all()}
    base = int(T0.timestamp()) * 1_000_000
    assert rows[(base, "click")]["n_events"] == 2
    assert rows[(base, "click")]["sum_value_cents"] == 375
    assert rows[(base + 3600_000_000, "click")]["n_events"] == 1
    assert rows[(base, "view")]["sum_value_cents"] == 10


def test_hopping_window_covers_each_event_w_over_h_times():
    ev = _events([(0, 5000, 1, "click", 1.00)])
    rows = hopping_window_agg(ev, window_s=3600, hop_s=900).take_all()
    assert len(rows) == 4                      # 3600/900 windows cover it
    assert all(r["n_events"] == 1 and r["sum_value_cents"] == 100 for r in rows)
    starts = sorted(r["window_start_us"] for r in rows)
    assert starts[-1] - starts[0] == 3 * 900_000_000
    t_us = int(T0.timestamp()) * 1_000_000 + 5000 * 1_000_000
    assert all(s <= t_us < s + 3600_000_000 for s in starts)


def test_sessionize_gap_breaks():
    ev = _events([
        (0, 0, 1, "click", 0.0),
        (1, 100, 1, "click", 0.0),
        (2, 100 + 1801, 1, "click", 0.0),   # gap > 1800s → new session
        (3, 50, 2, "view", 0.0),
    ])
    rows = sessionize(ev, gap_s=1800).take_all()
    u1 = sorted([r for r in rows if r["user_id"] == 1],
                key=lambda r: r["session_index"])
    assert [(r["session_index"], r["n_events"]) for r in u1] == [(0, 2), (1, 1)]
    base = int(T0.timestamp()) * 1_000_000
    assert u1[0]["start_us"] == base and u1[0]["end_us"] == base + 100_000_000
    assert len([r for r in rows if r["user_id"] == 2]) == 1


def test_asof_join_latest_mark():
    ev = _events([
        (0, 0, 1, "click", 0.0),     # before any error → NULL
        (1, 10, 1, "error", 0.0),
        (2, 20, 1, "click", 0.0),    # → error 1
        (3, 30, 1, "error", 0.0),    # mark itself → 3
        (4, 40, 1, "click", 0.0),    # → error 3
        (5, 40, 2, "click", 0.0),    # other user, no error → NULL
    ])
    rows = {r["event_id"]: r["mark_event_id"]
            for r in asof_join_latest(ev, mark_type="error").take_all()}
    assert rows == {0: None, 1: 1, 2: 1, 3: 3, 4: 3, 5: None}


def _whale_events(ray_session):
    """Two users; user 1 is a 'whale' with events spanning many buckets,
    sessions crossing bucket boundaries, and sparse error marks."""
    import numpy as np

    rng = np.random.RandomState(7)
    ts, uid, eid, etype = [], [], [], []
    base = 1_700_000_000_000_000
    k = 0
    for u, n in ((1, 400), (2, 40)):
        t = base
        for i in range(n):
            # gaps: mostly small, occasionally > 30 min (session break),
            # clustered near 3600s bucket boundaries too
            t += int(rng.choice([60, 300, 2400, 3900]) * 1e6)
            ts.append(t)
            uid.append(u)
            eid.append(k)
            etype.append("error" if rng.rand() < 0.07 else "view")
            k += 1
    return ray.data.from_arrow(pa.table({
        "event_id": pa.array(eid, pa.int64()),
        "user_id": pa.array(uid, pa.int64()),
        "ts": pa.array(ts, pa.timestamp("us")),
        "event_type": pa.array(etype, pa.string()),
    }))


def test_sessionize_whale_salting_identical(ray_session):
    from go_light_rag_ray.stages.windows import sessionize

    ev = _whale_events(ray_session)
    plain = sorted(
        (r["user_id"], r["session_index"], r["n_events"], r["start_us"],
         r["end_us"]) for r in sessionize(ev, gap_s=1800).take_all())
    salted = sorted(
        (r["user_id"], r["session_index"], r["n_events"], r["start_us"],
         r["end_us"]) for r in sessionize(ev, gap_s=1800,
                                          salt_bucket_s=3600).take_all())
    assert plain == salted


def test_asof_whale_salting_identical(ray_session):
    from go_light_rag_ray.stages.windows import asof_join_latest

    ev = _whale_events(ray_session)
    plain = sorted(
        (r["event_id"], r["user_id"], r["mark_event_id"])
        for r in asof_join_latest(ev).take_all())
    salted = sorted(
        (r["event_id"], r["user_id"], r["mark_event_id"])
        for r in asof_join_latest(ev, salt_bucket_s=3600).take_all())
    assert plain == salted


def test_tumbling_distinct_users(ray_session):
    import pyarrow as pa
    import ray.data

    from go_light_rag_ray.stages.windows import tumbling_distinct_users

    # two windows of 10 s; user u1 repeats within window 0
    ev = ray.data.from_arrow(pa.table({
        "ts": pa.array([1_000_000, 2_000_000, 3_000_000, 11_000_000,
                        12_000_000], pa.timestamp("us")),
        "user_id": ["u1", "u1", "u2", "u2", "u3"],
    })).repartition(3)
    out = {r["window_start_us"]: r
           for r in tumbling_distinct_users(ev, window_s=10).take_all()}
    assert out[0]["n_events"] == 3 and out[0]["n_users"] == 2
    assert out[10_000_000]["n_events"] == 2 and out[10_000_000]["n_users"] == 2


def test_range_join_count_window_edges():
    from go_light_rag_ray.stages.windows import range_join_count

    ev = _events([
        (0, 0, 1, "error", 0.0),
        (1, 100, 1, "click", 0.0),      # error@0 in [t-300, t] → 1
        (2, 300, 1, "click", 0.0),      # errors @0 (inclusive edge) + @250 → 2
        (3, 301, 1, "click", 0.0),      # error@0 now out; error@250 in → 1
        (4, 250, 1, "error", 0.0),      # error counts ITSELF + error@0 → 2
        (5, 100, 2, "click", 0.0),      # other user sees no errors → 0
        (6, 550, 1, "click", 0.0),      # error@250 in window (300s) → 1
    ])
    got = {r["event_id"]: r["n_marks"]
           for r in range_join_count(ev, "error", window_s=300).take_all()}
    assert got == {0: 1, 1: 1, 2: 2, 3: 1, 4: 2, 5: 0, 6: 1}


def test_range_join_count_matches_bruteforce_across_buckets():
    # events straddling many W-buckets; brute-force O(n²) reference
    from go_light_rag_ray.stages.windows import range_join_count

    rows, eid = [], 0
    for u in (1, 2):
        for s in (0, 7, 290, 300, 305, 599, 600, 601, 900, 1499, 1500, 2100):
            rows.append((eid, s + u, u, "error" if (eid % 3 == 0) else "click",
                         0.0))
            eid += 1
    got = {r["event_id"]: r["n_marks"]
           for r in range_join_count(_events(rows), "error",
                                     window_s=300).take_all()}
    w_us = 300 * 1_000_000

    def us(s):
        return int(T0.timestamp()) * 1_000_000 + s * 1_000_000

    for e_id, e_s, e_u, _, _ in rows:
        want = sum(1 for (m_id, m_s, m_u, m_t, _) in rows
                   if m_u == e_u and m_t == "error"
                   and us(e_s) - w_us <= us(m_s) <= us(e_s))
        assert got[e_id] == want, (e_id, got[e_id], want)
    assert len(got) == len(rows)


def test_running_totals_single_user_order():
    from go_light_rag_ray.stages.windows import running_totals

    ev = _events([
        (0, 10, 1, "click", 1.25),
        (1, 20, 1, "click", 2.50),
        (2, 5, 1, "view", 0.10),       # earliest by ts, despite higher id
    ])
    rows = {r["event_id"]: r for r in running_totals(ev).take_all()}
    assert rows[2]["seq"] == 1 and rows[2]["cum_cents"] == 10
    assert rows[2]["gap_us"] == -1 and rows[2]["lead_us"] == 5_000_000
    assert rows[0]["seq"] == 2 and rows[0]["cum_cents"] == 135
    assert rows[0]["gap_us"] == 5_000_000
    assert rows[0]["lead_us"] == 10_000_000
    assert rows[1]["seq"] == 3 and rows[1]["cum_cents"] == 385
    assert rows[1]["gap_us"] == 10_000_000 and rows[1]["lead_us"] == -1


def test_running_totals_cross_block_carry_matches_duckdb():
    """Force many tiny blocks so users straddle block boundaries: the
    per-block carry chain must reproduce DuckDB's window functions
    bit-for-bit."""
    import duckdb

    from go_light_rag_ray.stages.windows import running_totals

    rows = []
    eid = 0
    for u in range(5):
        for j in range(40):
            # interleave insert order; ts strides differ per user
            rows.append((eid, 17 + j * (u + 3), u, "click",
                         round((eid % 97) * 0.13, 2)))
            eid += 1
    tbl = pa.table({
        "event_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array([T0 + dt.timedelta(seconds=r[1]) for r in rows],
                       pa.timestamp("us")),
        "user_id": pa.array([r[2] for r in rows], pa.int64()),
        "event_type": pa.array([r[3] for r in rows], pa.string()),
        "value": pa.array([r[4] for r in rows], pa.float64()),
    })
    ev = ray.data.from_arrow(tbl).repartition(23)
    got = running_totals(ev).to_pandas().sort_values("event_id")

    con = duckdb.connect()
    con.register("events", tbl)
    want = con.execute("""
        WITH e AS (
          SELECT event_id, user_id, ts,
                 floor(value * 100 + 0.5)::BIGINT AS cents
          FROM events)
        SELECT event_id, user_id,
               (sum(cents) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                 ROWS UNBOUNDED PRECEDING))::BIGINT
                   AS cum_cents,
               (row_number() OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id))::BIGINT AS seq,
               coalesce(epoch_us(ts) - epoch_us(lag(ts) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id)), -1)::BIGINT
                   AS gap_us,
               coalesce(epoch_us(lead(ts) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id))
                   - epoch_us(ts), -1)::BIGINT AS lead_us
        FROM e ORDER BY event_id
    """).df()
    for col in ["event_id", "user_id", "cum_cents", "seq", "gap_us",
                "lead_us"]:
        assert list(got[col]) == list(want[col]), col


def test_session_assign_matches_sessionize():
    from go_light_rag_ray.stages.windows import session_assign
    ev = _events([
        (0, 10, 1, "click", 0.0), (1, 100, 1, "view", 0.0),
        (2, 5000, 1, "click", 0.0),          # gap > 1800 → session 1
        (3, 5100, 1, "view", 0.0),
        (4, 50, 2, "view", 0.0),             # user 2, one session
    ])
    rows = {r["event_id"]: (r["user_id"], r["session_index"])
            for r in session_assign(ev, gap_s=1800).take_all()}
    assert rows == {0: (1, 0), 1: (1, 0), 2: (1, 1), 3: (1, 1), 4: (2, 0)}


def test_session_assign_salted_identical():
    from go_light_rag_ray.stages.windows import session_assign
    day = 86400
    rows = []
    eid = 0
    # user 1: sessions crossing day-bucket boundaries (fusing), plus
    # in-bucket gaps; user 2: a whale-ish run of small gaps over 3 days
    for t in [10, 200, day - 100, day + 100, day + 5000,
              2 * day - 50, 2 * day + 1000]:
        rows.append((eid, t, 1, "click", 0.0)); eid += 1
    for t in range(0, 3 * day, 7000):
        rows.append((eid, t, 2, "view", 0.0)); eid += 1
    ev = _events(rows)
    want = {r["event_id"]: r["session_index"]
            for r in session_assign(ev, gap_s=1800).take_all()}
    got = {r["event_id"]: r["session_index"]
           for r in session_assign(ev, gap_s=1800,
                                   salt_bucket_s=day).take_all()}
    assert got == want
    # and the per-event labels agree with sessionize's session table
    sess = {(r["user_id"], r["session_index"]): r["n_events"]
            for r in sessionize(ev, gap_s=1800).take_all()}
    from collections import Counter
    lab = Counter()
    for r in session_assign(ev, gap_s=1800).take_all():
        lab[(r["user_id"], r["session_index"])] += 1
    assert dict(lab) == sess


def test_window_trending():
    from go_light_rag_ray.stages.windows import window_trending
    import pyarrow as pa
    import ray.data

    day = 86400

    def ev(eid, t, k):
        return (eid, t, 1, "view", 0.0, '{"k": %d}' % k)

    rows = [
        # day 0: k=7 ×3, k=2 ×2, k=9 ×1
        ev(0, 10, 7), ev(1, 20, 7), ev(2, 30, 7),
        ev(3, 40, 2), ev(4, 50, 2), ev(5, 60, 9),
        # day 1: k=2 ×3 (prev 2), k=5 ×2 (prev 0), k=7 ×1 (prev 3)
        ev(6, day + 10, 2), ev(7, day + 20, 2), ev(8, day + 30, 2),
        ev(9, day + 40, 5), ev(10, day + 50, 5), ev(11, day + 60, 7),
    ]
    ds = ray.data.from_arrow(pa.table({
        "event_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array([T0 + dt.timedelta(seconds=r[1]) for r in rows],
                       pa.timestamp("us")),
        "user_id": pa.array([r[2] for r in rows], pa.int64()),
        "event_type": pa.array([r[3] for r in rows], pa.string()),
        "value": pa.array([r[4] for r in rows], pa.float64()),
        "props": pa.array([r[5] for r in rows], pa.string()),
    }))
    out = window_trending(ds, window_s=day, k_top=2).take_all()
    base = int(T0.timestamp()) * 1_000_000
    d_us = day * 1_000_000
    got = [(r["window_start_us"], r["rank"], r["k"], r["cnt"],
            r["prev_cnt"], r["delta"]) for r in out]
    assert got == [
        (base, 1, 7, 3, 0, 3),
        (base, 2, 2, 2, 0, 2),
        (base + d_us, 1, 2, 3, 2, 1),
        (base + d_us, 2, 5, 2, 0, 2),
    ]


def test_window_trending_distributed_matches_local():
    from go_light_rag_ray.stages.windows import window_trending
    import pyarrow as pa
    import ray.data

    day = 86400
    rows = []
    eid = 0
    for dday in range(3):
        for k, reps in [(1, 4 + dday), (2, 3), (9, 1 + 2 * dday)]:
            for _ in range(reps):
                rows.append((eid, dday * day + eid % 1000, k)); eid += 1
    ds = ray.data.from_arrow(pa.table({
        "event_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array([T0 + dt.timedelta(seconds=r[1]) for r in rows],
                       pa.timestamp("us")),
        "user_id": pa.array([1] * len(rows), pa.int64()),
        "event_type": pa.array(["view"] * len(rows), pa.string()),
        "value": pa.array([0.0] * len(rows), pa.float64()),
        "props": pa.array(['{"k": %d}' % r[2] for r in rows], pa.string()),
    }))

    def key(r):
        return (r["window_start_us"], r["rank"], r["k"], r["cnt"],
                r["prev_cnt"], r["delta"])
    local = sorted(map(key, window_trending(ds, day, k_top=2).take_all()))
    dist = sorted(map(key, window_trending(
        ds, day, k_top=2, local_threshold=0).take_all()))
    assert local == dist and len(local) == 6


def test_window_trending_huge_keys_and_fine_grid():
    # keys >= 2^39 and a 60 s window grid (grid index ~29M > 2^24):
    # the dense-rank composite must not collide — local == distributed
    from go_light_rag_ray.stages.windows import window_trending
    import pyarrow as pa
    import ray.data

    w = 60
    big = 1 << 45
    rows = []
    eid = 0
    for widx in range(3):
        for k, reps in [(big + 1, 3), (big + (1 << 40), 2), (7, 1 + widx)]:
            for j in range(reps):
                rows.append((eid, widx * w + j, k)); eid += 1
    ds = ray.data.from_arrow(pa.table({
        "event_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array([T0 + dt.timedelta(seconds=r[1]) for r in rows],
                       pa.timestamp("us")),
        "user_id": pa.array([1] * len(rows), pa.int64()),
        "event_type": pa.array(["view"] * len(rows), pa.string()),
        "value": pa.array([0.0] * len(rows), pa.float64()),
        "props": pa.array(['{"k": %d}' % r[2] for r in rows], pa.string()),
    }))

    def key(r):
        return (r["window_start_us"], r["rank"], r["k"], r["cnt"],
                r["prev_cnt"], r["delta"])
    local = sorted(map(key, window_trending(ds, w, k_top=3).take_all()))
    dist = sorted(map(key, window_trending(
        ds, w, k_top=3, local_threshold=0).take_all()))
    assert local == dist
    # spot-check one prev-window carry on a huge key
    by = {(r[0], r[2]): r for r in local}
    base = int(T0.timestamp()) * 1_000_000
    w_us = w * 1_000_000
    assert by[(base + w_us, big + 1)][4] == 3      # prev_cnt from window 0
    assert by[(base + 2 * w_us, 7)][4] == 2        # 7: 1 → 2 → 3


def test_events_summary_hand_computed(ray_session):
    import pyarrow as pa
    import ray.data

    from go_light_rag_ray.stages.windows import events_summary

    ev = ray.data.from_arrow(pa.table({
        "ts": pa.array([1_000_000, 2_000_000, 3_000_000, 2_500_000],
                       pa.timestamp("us")),
        "user_id": pa.array([1, 2, 1, None], pa.int64()),
        "event_type": ["a", "b", "a", "a"],
        "value": [1.005, 2.0, 0.004, 10.0],
    })).repartition(2)
    row = events_summary(ev).take_all()[0]
    assert row["n_events"] == 4
    assert row["distinct_users"] == 2            # null excluded
    assert row["distinct_event_types"] == 2
    assert (row["min_ts_us"], row["max_ts_us"]) == (1_000_000, 3_000_000)
    # cents: floor(v*100+0.5) -> 100 + 200 + 0 + 1000 (1.005 is
    # 1.00499... in float64 — the same op sequence on both sides is the
    # contract, not decimal-string rounding)
    assert row["total_value_cents"] == 1300
