"""Windowed / event-time operators over the ``events`` table.

Ray Data has no windowed aggregates, sessionization, or as-of joins; the
reference has no streaming ops at all (SURVEY.md §2.9).  A web-scale
training-data pipeline needs them (log bucketing, session corpus
construction, point-in-time feature joins), so they are built here from
Ray Data primitives with their partitioning assumptions documented:

- tumbling / hopping windows: the window id is a pure function of the
  timestamp → assign in ``map_batches``, then ONE keyed groupby; hopping
  windows flat-map each event to its ⌈W/H⌉ windows first.
- sessionization: partitioned by ``user_id`` (groupby), sorted sweep inside
  the group; assumes one user's events fit one group (true unless a single
  user exceeds a block — salt by day for such whales).
- as-of join: union both sides with a side tag, partition by ``user_id``,
  per-group time-sorted sweep carrying the latest right-side row — the
  standard distributed as-of pattern (no cross join, no per-row lookup).

Monetary sums use integer cents so the DuckDB oracle matches exactly
(float sums are order-dependent across backends).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data
import ray.data.aggregate as agg

US = 1_000_000  # microseconds per second


def _epoch_us(ts_col: pa.ChunkedArray) -> np.ndarray:
    return pc.cast(ts_col, pa.int64()).to_numpy(zero_copy_only=False)


def _cents(value_col: pa.ChunkedArray) -> np.ndarray:
    # floor(v*100 + 0.5): the SAME IEEE op sequence the DuckDB oracle runs
    # (np.round is half-to-even, DuckDB round() is half-away-from-zero —
    # either alone would silently diverge on exact .5 inputs).
    return np.floor(value_col.to_numpy() * 100 + 0.5).astype(np.int64)


def _carry_latest(eid: np.ndarray, is_mark: np.ndarray) -> np.ndarray:
    """Forward-carry of the most recent mark's event id over a sweep-ordered
    group: the id at position i of the last mark at-or-before i, -1 before
    any mark.  ``np.maximum.accumulate`` over mark POSITIONS (monotone in
    sweep order — mark ids themselves need not be) then one gather; no
    per-event Python loop."""
    n = len(eid)
    if n == 0:
        return np.empty(0, dtype=np.int64)
    pos = np.where(is_mark, np.arange(n), -1)
    carry = np.maximum.accumulate(pos)
    return np.where(carry >= 0, eid[np.maximum(carry, 0)], -1).astype(np.int64)


def tumbling_window_agg(
    events: ray.data.Dataset, window_s: int = 3600
) -> ray.data.Dataset:
    """Per (window, event_type): count + exact integer-cent value sum.
    Returns (window_start_us, event_type, n_events, sum_value_cents)."""
    w_us = window_s * US

    def assign(b: pa.Table) -> pa.Table:
        ts = _epoch_us(b.column("ts"))
        cents = _cents(b.column("value"))
        return pa.Table.from_pydict(
            {"window_start_us": pa.array((ts // w_us) * w_us, pa.int64()),
             "event_type": b.column("event_type").combine_chunks(),
             "cents": pa.array(cents, pa.int64())}
        )

    return (
        events.map_batches(assign, batch_format="pyarrow")
        .groupby(["window_start_us", "event_type"])
        .aggregate(
            agg.Count(alias_name="n_events"),
            agg.Sum("cents", alias_name="sum_value_cents"),
        )
    )


def tumbling_distinct_users(
    events: ray.data.Dataset, window_s: int = 3600
) -> ray.data.Dataset:
    """Per tumbling window: event count + DISTINCT user count →
    (window_start_us, n_events, n_users).

    Count-distinct is the shuffle-hostile aggregate (raw values must
    co-locate); the scale shape is the standard two-level reduction:

    1. per-batch combiner — one Arrow hash-aggregate to ≤1 row per
       (window, user) per batch carrying the local event count, so the
       shuffle moves ≤ |windows|·|users| rows, not |events|;
    2. one ``sorted_reduce`` over the (window, user) pair key (the
       high-cardinality step — zero per-group Python) summing the counts;
    3. a small conventional groupby over the already-distinct pairs
       (|windows| groups) for the final (n_events, n_users).
    """
    w_us = window_s * US

    def pairs(b: pa.Table) -> pa.Table:
        ts = _epoch_us(b.column("ts"))
        t = pa.table({
            "window_start_us": pa.array((ts // w_us) * w_us, pa.int64()),
            "user_id": b.column("user_id").combine_chunks(),
        })
        g = t.group_by(["window_start_us", "user_id"]).aggregate(
            [("user_id", "count")])
        return pa.table({
            "window_start_us": g.column("window_start_us"),
            "user_id": g.column("user_id"),
            "c": pc.cast(g.column("user_id_count"), pa.int64()),
        })

    from .sortagg import sorted_reduce

    wu = sorted_reduce(
        events.map_batches(pairs, batch_format="pyarrow"),
        ["window_start_us", "user_id"], ops=[("sum", "c", "c")])

    def ones(b: pa.Table) -> pa.Table:
        return b.append_column(
            "_u", pa.array(np.ones(len(b), dtype=np.int64)))

    return (
        wu.map_batches(ones, batch_format="pyarrow")
        .groupby("window_start_us")
        .aggregate(
            agg.Sum("c", alias_name="n_events"),
            agg.Sum("_u", alias_name="n_users"),
        )
    )


def hopping_window_agg(
    events: ray.data.Dataset, window_s: int = 3600, hop_s: int = 900
) -> ray.data.Dataset:
    """Overlapping (sliding) windows: each event lands in every window of
    length ``window_s`` starting at a ``hop_s`` boundary that covers it.
    Returns (window_start_us, n_events, sum_value_cents)."""
    w_us, h_us = window_s * US, hop_s * US

    def assign(b: pa.Table) -> pa.Table:
        ts = _epoch_us(b.column("ts"))
        cents = _cents(b.column("value"))
        # vectorized ⌈W/H⌉-way expansion: each event joins every hop-aligned
        # window [first, last] covering it — np.repeat + per-group offsets,
        # no Python loop (this stage sees the full event stream).
        first = ((ts - w_us) // h_us + 1) * h_us
        last = (ts // h_us) * h_us
        counts = (last - first) // h_us + 1  # ≥1 since w_us ≥ h_us
        offsets = np.arange(counts.sum()) - np.repeat(
            np.cumsum(counts) - counts, counts
        )
        return pa.Table.from_pydict(
            {"window_start_us": pa.array(
                np.repeat(first, counts) + offsets * h_us, pa.int64()),
             "cents": pa.array(np.repeat(cents, counts), pa.int64())}
        )

    return (
        events.map_batches(assign, batch_format="pyarrow")
        .groupby("window_start_us")
        .aggregate(
            agg.Count(alias_name="n_events"),
            agg.Sum("cents", alias_name="sum_value_cents"),
        )
    )


def _multi_user_sessions(
    u: np.ndarray, ts: np.ndarray, seg_new: np.ndarray, gap_us: int,
):
    """Vectorized gap-session extraction for MANY users in one sorted
    array: ``seg_new`` marks segment starts (user or (user, bucket)
    changes); a session starts at a segment start or when the in-segment
    gap exceeds ``gap_us``.  Returns per-session (user, seg-rebased
    session index, n_events, start_ts, end_ts) — no per-user Python."""
    n = len(u)
    brk = seg_new | np.concatenate(([False], np.diff(ts) > gap_us))
    s_starts = np.flatnonzero(brk)
    s_ends = np.concatenate((s_starts[1:] - 1, [n - 1]))
    seg_ids = (np.cumsum(seg_new) - 1)[s_starts]       # nondecreasing
    base = np.searchsorted(seg_ids, seg_ids, side="left")
    sidx = np.arange(len(s_starts)) - base             # rebased per segment
    return (u[s_starts], sidx, (s_ends - s_starts + 1).astype(np.int64),
            ts[s_starts], ts[s_ends])


def sessionize(
    events: ray.data.Dataset, gap_s: int = 1800, salt_bucket_s: int = 0
) -> ray.data.Dataset:
    """Gap-based sessions per user: a new session starts when the time
    since the previous event exceeds ``gap_s``.  Returns
    (user_id, session_index, n_events, start_us, end_us).

    Scale shape (measured: per-user ``map_groups`` at 150k users never
    finished a 10M-event probe — Ray's ~10µs/group dispatch × |users|):
    users hash into a BOUNDED number of groups (4×CPUs) and every user in
    a group resolves in ONE vectorized pass (global break scan, run
    rebasing) — ``_multi_user_sessions``.

    ``salt_bucket_s`` > 0 is the whale-user path: no single group may
    hold one user's whole history, so pass 1 co-shuffles by
    hash(user, time-bucket) and emits per-bucket session SUMMARIES
    (tiny); pass 2 co-shuffles the summaries by user hash and fuses
    sessions whose cross-bucket gap ≤ ``gap_s`` — also vectorized across
    users.  The gap rule is associative over time-ordered segments, so
    the salted output is IDENTICAL to the unsalted one (tested).  Pick
    ``salt_bucket_s`` ≫ ``gap_s`` (e.g. a day)."""
    from .funnel import _bucket_of, _nbuckets

    gap_us = gap_s * US
    nb = _nbuckets()

    if not salt_bucket_s:
        def prep(b: pa.Table) -> pa.Table:
            uid = b.column("user_id").to_numpy(zero_copy_only=False)
            return pa.Table.from_pydict(
                {"u": pa.array(uid.astype(np.int64), pa.int64()),
                 "t": pa.array(_epoch_us(b.column("ts")), pa.int64()),
                 "gb": pa.array(_bucket_of(uid, nb), pa.int64())})

        def bucket_sessions(group: pa.Table) -> pa.Table:
            u = group.column("u").to_numpy(zero_copy_only=False)
            t = group.column("t").to_numpy(zero_copy_only=False)
            order = np.lexsort((t, u))
            u, t = u[order], t[order]
            seg_new = np.concatenate(([True], u[1:] != u[:-1]))
            su, sidx, cnt, st, en = _multi_user_sessions(u, t, seg_new, gap_us)
            return pa.Table.from_pydict(
                {"user_id": pa.array(su, pa.int64()),
                 "session_index": pa.array(sidx.astype(np.int32), pa.int32()),
                 "n_events": pa.array(cnt, pa.int64()),
                 "start_us": pa.array(st, pa.int64()),
                 "end_us": pa.array(en, pa.int64())})

        return (
            events.select_columns(["user_id", "ts"])
            .map_batches(prep, batch_format="pyarrow")
            .groupby("gb")
            .map_groups(bucket_sessions, batch_format="pyarrow")
        )

    b_us = salt_bucket_s * US

    def prep2(b: pa.Table) -> pa.Table:
        uid = b.column("user_id").to_numpy(zero_copy_only=False)
        ts = _epoch_us(b.column("ts"))
        tb = ts // b_us
        return pa.Table.from_pydict(
            {"u": pa.array(uid.astype(np.int64), pa.int64()),
             "t": pa.array(ts, pa.int64()),
             "tb": pa.array(tb, pa.int64()),
             "gb": pa.array(_bucket_of(uid * 1_000_003 + tb, nb), pa.int64())})

    def bucket_summaries(group: pa.Table) -> pa.Table:
        u = group.column("u").to_numpy(zero_copy_only=False)
        t = group.column("t").to_numpy(zero_copy_only=False)
        tb = group.column("tb").to_numpy(zero_copy_only=False)
        order = np.lexsort((t, tb, u))
        u, t, tb = u[order], t[order], tb[order]
        seg_new = np.concatenate(
            ([True], (u[1:] != u[:-1]) | (tb[1:] != tb[:-1])))
        su, _, cnt, st, en = _multi_user_sessions(u, t, seg_new, gap_us)
        return pa.Table.from_pydict(
            {"u": pa.array(su, pa.int64()),
             "n_events": pa.array(cnt, pa.int64()),
             "start_us": pa.array(st, pa.int64()),
             "end_us": pa.array(en, pa.int64()),
             "ugb": pa.array(_bucket_of(su, nb), pa.int64())})

    def merge_users(group: pa.Table) -> pa.Table:
        """Fuse cross-bucket session summaries, vectorized across the
        group's users: a summary fuses with its predecessor when the gap
        ≤ ``gap_us`` (time-disjoint buckets ⇒ the predecessor's end is
        the running max end)."""
        u = group.column("u").to_numpy(zero_copy_only=False)
        c = group.column("n_events").to_numpy(zero_copy_only=False)
        s = group.column("start_us").to_numpy(zero_copy_only=False)
        e = group.column("end_us").to_numpy(zero_copy_only=False)
        order = np.lexsort((s, u))
        u, c, s, e = u[order], c[order], s[order], e[order]
        new_user = np.concatenate(([True], u[1:] != u[:-1]))
        fuse = np.concatenate(([False], (s[1:] - e[:-1]) <= gap_us))
        fuse &= ~new_user
        gstart = ~fuse
        g_idx = np.flatnonzero(gstart)
        gu = u[g_idx]
        n_events = np.add.reduceat(c, g_idx)
        start = s[g_idx]
        end = np.maximum.reduceat(e, g_idx)
        g_new_user = new_user[g_idx]
        run = np.cumsum(g_new_user) - 1
        base = np.flatnonzero(g_new_user)[run]
        sidx = (np.arange(len(g_idx)) - base).astype(np.int32)
        return pa.Table.from_pydict(
            {"user_id": pa.array(gu, pa.int64()),
             "session_index": pa.array(sidx, pa.int32()),
             "n_events": pa.array(n_events, pa.int64()),
             "start_us": pa.array(start, pa.int64()),
             "end_us": pa.array(end, pa.int64())})

    return (
        events.select_columns(["user_id", "ts"])
        .map_batches(prep2, batch_format="pyarrow")
        .groupby("gb")
        .map_groups(bucket_summaries, batch_format="pyarrow")
        .groupby("ugb")
        .map_groups(merge_users, batch_format="pyarrow")
    )


def _multi_user_carry(
    eid: np.ndarray, is_mark: np.ndarray, seg_new: np.ndarray,
) -> np.ndarray:
    """``_carry_latest`` across MANY segments in one sorted array: the id
    of the last mark at-or-before each position WITHIN its segment, -1
    before any mark.  Segment resets via a run-start validity check on the
    global position carry — no per-segment Python."""
    n = len(eid)
    if n == 0:
        return np.empty(0, dtype=np.int64)
    pos = np.where(is_mark, np.arange(n), -1)
    carry = np.maximum.accumulate(pos)
    run_id = np.cumsum(seg_new) - 1
    run_start = np.flatnonzero(seg_new)[run_id]
    valid = carry >= run_start
    return np.where(valid, eid[np.maximum(carry, 0)], -1).astype(np.int64)


def asof_join_latest(
    events: ray.data.Dataset,
    mark_type: str = "error",
    salt_bucket_s: int = 0,
) -> ray.data.Dataset:
    """Point-in-time self as-of join: for every event, the id of the user's
    most recent ``mark_type`` event at-or-before it (NULL if none).

    Distributed pattern: users hash into a bounded number of groups
    (4×CPUs — never one Ray group per user, the measured 150k-user
    dispatch wall) and every user sweeps in ONE vectorized time-sorted
    carry (``_multi_user_carry``) — never a cross join.  Ties on equal
    timestamps break toward the mark with the larger event_id (latest id).
    Returns (event_id, user_id, mark_event_id nullable).

    ``salt_bucket_s`` > 0 is the whale-user path: the sweep partitions by
    hash(user, time-bucket); rows resolved inside their bucket ship
    straight to the output, and only the UNRESOLVED head of each bucket
    (events before the bucket's first mark) re-groups by user hash
    together with tiny per-bucket last-mark summaries, where the same
    vectorized carry (summaries sorted after their bucket's rows) fixes
    them.  The second pass is bounded by marks' sparsity, not the whale's
    volume; output identical to the unsalted path (tested)."""
    from .funnel import _bucket_of, _nbuckets

    nb = _nbuckets()

    if salt_bucket_s:
        return _asof_join_salted(events, mark_type, salt_bucket_s, nb)

    def prep(b: pa.Table) -> pa.Table:
        uid = b.column("user_id").to_numpy(zero_copy_only=False)
        is_mark = pc.equal(b.column("event_type"), mark_type).to_numpy(
            zero_copy_only=False)
        return pa.Table.from_pydict(
            {"event_id": b.column("event_id").combine_chunks(),
             "u": pa.array(uid.astype(np.int64), pa.int64()),
             "t": pa.array(_epoch_us(b.column("ts")), pa.int64()),
             "m": pa.array(is_mark.astype(np.int8), pa.int8()),
             "gb": pa.array(_bucket_of(uid, nb), pa.int64())})

    def sweep(group: pa.Table) -> pa.Table:
        u = group.column("u").to_numpy(zero_copy_only=False)
        t = group.column("t").to_numpy(zero_copy_only=False)
        eid = group.column("event_id").to_numpy(zero_copy_only=False)
        m = group.column("m").to_numpy(zero_copy_only=False).astype(bool)
        order = np.lexsort((eid, t, u))
        u, eid, m = u[order], eid[order], m[order]
        seg_new = np.concatenate(([True], u[1:] != u[:-1]))
        out = _multi_user_carry(eid, m, seg_new)
        return pa.Table.from_pydict(
            {"event_id": pa.array(eid, pa.int64()),
             "user_id": pa.array(u, pa.int64()),
             "mark_event_id": pa.array(out, pa.int64(), mask=out < 0)})

    return (
        events.select_columns(["event_id", "user_id", "ts", "event_type"])
        .map_batches(prep, batch_format="pyarrow")
        .groupby("gb")
        .map_groups(sweep, batch_format="pyarrow")
    )


def _asof_join_salted(
    events: ray.data.Dataset, mark_type: str, salt_bucket_s: int, nb: int,
) -> ray.data.Dataset:
    from .funnel import _bucket_of

    b_us = salt_bucket_s * US

    def prep(b: pa.Table) -> pa.Table:
        uid = b.column("user_id").to_numpy(zero_copy_only=False)
        ts = _epoch_us(b.column("ts"))
        tb = ts // b_us
        is_mark = pc.equal(b.column("event_type"), mark_type).to_numpy(
            zero_copy_only=False)
        return pa.Table.from_pydict(
            {"event_id": b.column("event_id").combine_chunks(),
             "u": pa.array(uid.astype(np.int64), pa.int64()),
             "t": pa.array(ts, pa.int64()),
             "tb": pa.array(tb, pa.int64()),
             "m": pa.array(is_mark.astype(np.int8), pa.int8()),
             "gb": pa.array(_bucket_of(uid * 1_000_003 + tb, nb), pa.int64())})

    def bucket_sweep(group: pa.Table) -> pa.Table:
        """Per (user, time-bucket) segment, vectorized across the group's
        segments: resolved rows (kind=0, mark ≥ 0), unresolved rows
        (kind=0, mark=-1), plus ≤1 summary row per segment (kind=1)
        carrying its LAST mark for the per-user carry fix."""
        u = group.column("u").to_numpy(zero_copy_only=False)
        t = group.column("t").to_numpy(zero_copy_only=False)
        tb = group.column("tb").to_numpy(zero_copy_only=False)
        eid = group.column("event_id").to_numpy(zero_copy_only=False)
        m = group.column("m").to_numpy(zero_copy_only=False).astype(bool)
        order = np.lexsort((eid, t, tb, u))
        u, t, tb, eid, m = u[order], t[order], tb[order], eid[order], m[order]
        seg_new = np.concatenate(
            ([True], (u[1:] != u[:-1]) | (tb[1:] != tb[:-1])))
        out = _multi_user_carry(eid, m, seg_new)
        seg_start = np.flatnonzero(seg_new)
        seg_end = np.concatenate((seg_start[1:] - 1, [len(u) - 1]))
        latest = out[seg_end]           # last mark per segment (-1 if none)
        has = latest >= 0
        rows = pa.Table.from_pydict(
            {"kind": pa.array(np.zeros(len(u), np.int8), pa.int8()),
             "event_id": pa.array(eid, pa.int64()),
             "user_id": pa.array(u, pa.int64()),
             "bucket": pa.array(tb, pa.int64()),
             "mark_event_id": pa.array(out, pa.int64())})
        summ = pa.Table.from_pydict(
            {"kind": pa.array(np.ones(int(has.sum()), np.int8), pa.int8()),
             "event_id": pa.array(latest[has], pa.int64()),
             "user_id": pa.array(u[seg_start][has], pa.int64()),
             "bucket": pa.array(tb[seg_start][has], pa.int64()),
             "mark_event_id": pa.array(latest[has], pa.int64())})
        return pa.concat_tables([rows, summ])

    swept = (
        events.select_columns(["event_id", "user_id", "ts", "event_type"])
        .map_batches(prep, batch_format="pyarrow")
        .groupby("gb")
        .map_groups(bucket_sweep, batch_format="pyarrow")
        .materialize()
    )

    def finalize(b: pa.Table) -> pa.Table:
        marks = b.column("mark_event_id").to_numpy(zero_copy_only=False)
        return pa.Table.from_pydict(
            {"event_id": b.column("event_id").combine_chunks(),
             "user_id": b.column("user_id").combine_chunks(),
             "mark_event_id": pa.array(marks, pa.int64(), mask=marks < 0)})

    resolved = swept.filter(
        expr="kind == 0 and mark_event_id >= 0"
    ).map_batches(finalize, batch_format="pyarrow")

    def add_ugb(b: pa.Table) -> pa.Table:
        u = b.column("user_id").to_numpy(zero_copy_only=False)
        return b.append_column("ugb", pa.array(_bucket_of(u, nb), pa.int64()))

    def carry_fix(group: pa.Table) -> pa.Table:
        """Unresolved rows + summaries only, vectorized across users: sort
        (user, bucket, kind) so a bucket's summary lands AFTER its own
        rows (rows must only see strictly earlier buckets), then the same
        position-carry resolves every row."""
        kind = group.column("kind").to_numpy(zero_copy_only=False)
        u = group.column("user_id").to_numpy(zero_copy_only=False)
        tb = group.column("bucket").to_numpy(zero_copy_only=False)
        eid = group.column("event_id").to_numpy(zero_copy_only=False)
        order = np.lexsort((kind, tb, u))
        kind, u, tb, eid = kind[order], u[order], tb[order], eid[order]
        seg_new = np.concatenate(([True], u[1:] != u[:-1]))
        out = _multi_user_carry(eid, kind == 1, seg_new)
        is_row = kind == 0
        marks = out[is_row]
        return pa.Table.from_pydict(
            {"event_id": pa.array(eid[is_row], pa.int64()),
             "user_id": pa.array(u[is_row], pa.int64()),
             "mark_event_id": pa.array(marks, pa.int64(), mask=marks < 0)})

    fixed = (
        swept.filter(expr="kind == 1 or mark_event_id < 0")
        .map_batches(add_ugb, batch_format="pyarrow")
        .groupby("ugb")
        .map_groups(carry_fix, batch_format="pyarrow")
    )
    return resolved.union(fixed)


def range_join_count(
    events: ray.data.Dataset,
    mark_type: str = "error",
    window_s: int = 300,
) -> ray.data.Dataset:
    """Bounded-range interval join: for every event, how many ``mark_type``
    events of the SAME user fall in the lookback window
    ``[ts - window_s, ts]`` (inclusive both ends — a mark event counts
    itself).  Returns (event_id, user_id, n_marks int64).

    Neither Ray Data nor the reference has a range/interval join
    (SURVEY.md §2.9); at scale the classic implementation is the
    bounded-interval bucket replication pattern:

    - every event lands in time bucket ``floor(ts / W)``;
    - every MARK additionally replicates to bucket+1 — a window of width
      W crosses at most one bucket boundary, so 2 copies always suffice
      (this is the partitioning assumption: window length must be ≤ the
      bucket width, which holds by construction here since bucket = W);
    - the (user, time-bucket) pairs hash into a BOUNDED number of Ray
      groups (4×CPUs — never one group per pair, the measured ~10µs/group
      dispatch wall), and one vectorized sweep counts EVERY probe's
      in-window marks at once: each probe contributes an OPEN point at
      ``t−W`` (before equal-t marks) and a CLOSE point at ``t`` (after
      equal-t marks), everything sorts by (segment, t, tag), and the
      count is the running-mark-prefix difference close − open — the
      plane-sweep equivalent of the per-group double bisect, with no
      per-segment Python.

    Counts are integers, so the DuckDB oracle (LEFT JOIN ... BETWEEN)
    matches bit-exactly.
    """
    from .funnel import _bucket_of, _nbuckets

    w_us = window_s * US
    nb = _nbuckets()

    def add_bucket(b: pa.Table) -> pa.Table:
        ts = _epoch_us(b.column("ts"))
        eid = b.column("event_id").combine_chunks()
        uid = b.column("user_id").combine_chunks()
        u_np = uid.to_numpy(zero_copy_only=False).astype(np.int64)
        is_mark = pc.equal(b.column("event_type"), mark_type).to_numpy(
            zero_copy_only=False)
        bucket = ts // w_us
        base = pa.Table.from_pydict(
            {"event_id": eid, "user_id": uid,
             "ts_us": pa.array(ts, pa.int64()),
             "bucket": pa.array(bucket, pa.int64()),
             # role: 0 = probe event, 1 = probe that is also a mark
             "role": pa.array(is_mark.astype(np.int8), pa.int8()),
             "gb": pa.array(
                 _bucket_of(u_np * 1_000_003 + bucket, nb), pa.int64())}
        )
        # marks replicate to the NEXT bucket as mark-only rows (role=2)
        midx = np.nonzero(is_mark)[0]
        if len(midx):
            rep = pa.Table.from_pydict(
                {"event_id": pc.take(eid, pa.array(midx, pa.int64())),
                 "user_id": pc.take(uid, pa.array(midx, pa.int64())),
                 "ts_us": pa.array(ts[midx], pa.int64()),
                 "bucket": pa.array(bucket[midx] + 1, pa.int64()),
                 "role": pa.array(np.full(len(midx), 2, np.int8), pa.int8()),
                 "gb": pa.array(
                     _bucket_of(u_np[midx] * 1_000_003 + bucket[midx] + 1,
                                nb), pa.int64())}
            )
            return pa.concat_tables([base, rep])
        return base

    def count_group(group: pa.Table) -> pa.Table:
        u = group.column("user_id").to_numpy(zero_copy_only=False)
        tb = group.column("bucket").to_numpy(zero_copy_only=False)
        ts = group.column("ts_us").to_numpy(zero_copy_only=False)
        eid = group.column("event_id").to_numpy(zero_copy_only=False)
        role = group.column("role").to_numpy(zero_copy_only=False)
        order = np.lexsort((ts, tb, u))
        u, tb, ts, eid, role = (u[order], tb[order], ts[order], eid[order],
                                role[order])
        seg_new = np.concatenate(
            ([True], (u[1:] != u[:-1]) | (tb[1:] != tb[:-1])))
        seg = np.cumsum(seg_new) - 1
        probe = role != 2
        p_idx = np.flatnonzero(probe)
        m_idx = np.flatnonzero(role != 0)
        np_, nm = len(p_idx), len(m_idx)
        # plane-sweep points: (seg, t, tag, payload) — tag 0 open (t−W,
        # before equal-t marks), 1 mark, 2 close (t, after equal-t marks)
        s_all = np.concatenate((seg[p_idx], seg[m_idx], seg[p_idx]))
        t_all = np.concatenate((ts[p_idx] - w_us, ts[m_idx], ts[p_idx]))
        tag = np.concatenate((np.zeros(np_, np.int8),
                              np.ones(nm, np.int8),
                              np.full(np_, 2, np.int8)))
        payload = np.concatenate((np.arange(np_), np.full(nm, -1),
                                  np.arange(np_)))
        sweep = np.lexsort((tag, t_all, s_all))
        tag_s, pay_s = tag[sweep], payload[sweep]
        prefix = np.cumsum(tag_s == 1)
        counts = np.zeros(np_, dtype=np.int64)
        counts[pay_s[tag_s == 2]] = prefix[tag_s == 2]
        counts[pay_s[tag_s == 0]] -= prefix[tag_s == 0]
        return pa.Table.from_pydict(
            {"event_id": pa.array(eid[p_idx].astype(np.int64), pa.int64()),
             "user_id": pa.array(u[p_idx].astype(np.int64), pa.int64()),
             "n_marks": pa.array(counts, pa.int64())}
        )

    return (
        events.select_columns(["event_id", "user_id", "ts", "event_type"])
        .map_batches(add_bucket, batch_format="pyarrow")
        .groupby("gb")
        .map_groups(count_group, batch_format="pyarrow")
    )


def running_totals(events: ray.data.Dataset) -> ray.data.Dataset:
    """Per-key running aggregates — the keyed streaming scan (SQL window
    functions over an unbounded-preceding frame; Ray Data and the reference
    both lack it, SURVEY.md §2.9).  For every event, in ``(ts, event_id)``
    order within its user: the cumulative value sum (integer cents), the
    1-based per-user sequence number (ROW_NUMBER), the gap in
    microseconds since the user's previous event (LAG; -1 on a user's
    first event), and the gap until the user's next event (LEAD; -1 on
    the last).  Returns (event_id, user_id, cum_cents, seq, gap_us,
    lead_us).

    Distributed shape — ONE range sort + a two-pass block scan, the keyed
    generalization of ``packing.prefix_sum``:

    1. sort by (user_id, ts_us, event_id); range partitioning makes every
       block a contiguous slice of the global order, so a user's rows span
       a consecutive run of blocks;
    2. per block, ONE summary row: the block's first composite key plus the
       first-user and last-user segment subtotals (sum, count, last ts).
       Only the ≤2 users touching a block boundary ever need cross-block
       correction, so the summary side is O(blocks) — thousands of rows at
       100 TB, never per-user or per-row state;
    3. the driver chains the summaries in key order, carrying one
       (user, sum, count, last_ts) tuple, and broadcasts per-block
       carry-ins via ``ray.put``; a second vectorized pass computes local
       segment cumsums (global ``np.cumsum`` minus each segment's base)
       and adds the carry to the first segment only.  The SAME summary
       chain yields LEAD for free: block i's successor row is block
       i+1's first key, so each block gets its neighbor's (user, ts) as
       a backward carry and only its LAST row ever needs it.

    Unlike ``sessionize``/``asof_join_latest`` this needs NO whale salting:
    there is no per-user group — a user whose history spans a thousand
    blocks costs exactly one carry hand-off per block boundary.

    All-integer arithmetic (cents, counts, epoch-µs), so the DuckDB window
    oracle matches bit-exactly.
    """

    def prep(b: pa.Table) -> pa.Table:
        return pa.Table.from_pydict({
            "event_id": b.column("event_id").combine_chunks(),
            "user_id": b.column("user_id").combine_chunks(),
            "ts_us": pa.array(_epoch_us(b.column("ts")), pa.int64()),
            "cents": pa.array(_cents(b.column("value")), pa.int64()),
        })

    s = (events.select_columns(["event_id", "ts", "user_id", "value"])
         .map_batches(prep, batch_format="pyarrow")
         .sort(["user_id", "ts_us", "event_id"])
         .materialize())

    def summarize(b: pa.Table) -> pa.Table:
        cols = ["fk_user", "fk_ts", "fk_eid", "first_user", "first_total",
                "first_count", "last_user", "last_total", "last_count",
                "last_ts"]
        if len(b) == 0:
            return pa.Table.from_pydict(
                {c: pa.array([], pa.int64()) for c in cols})
        u = b.column("user_id").to_numpy(zero_copy_only=False)
        v = b.column("cents").to_numpy(zero_copy_only=False)
        t = b.column("ts_us").to_numpy(zero_copy_only=False)
        e = b.column("event_id").to_numpy(zero_copy_only=False)
        n = len(u)
        head = u != u[0]
        fs_end = int(np.argmax(head)) if head.any() else n
        tail = u[::-1] != u[-1]
        ls_start = n - (int(np.argmax(tail)) if tail.any() else n)
        vals = [int(u[0]), int(t[0]), int(e[0]), int(u[0]),
                int(v[:fs_end].sum()), fs_end, int(u[-1]),
                int(v[ls_start:].sum()), n - ls_start, int(t[-1])]
        return pa.Table.from_pydict(
            {c: pa.array([x], pa.int64()) for c, x in zip(cols, vals)})

    # one summary row per block → tiny driver-side table even at web scale
    summaries = s.map_batches(
        summarize, batch_format="pyarrow", batch_size=None).take_all()
    summaries.sort(key=lambda r: (r["fk_user"], r["fk_ts"], r["fk_eid"]))
    carries: dict = {}
    cur_user, tot, cnt, last_ts = None, 0, 0, -1
    for r in summaries:
        fk = (r["fk_user"], r["fk_ts"], r["fk_eid"])
        if cur_user is not None and r["first_user"] == cur_user:
            carries[fk] = (tot, cnt, last_ts)
            if r["first_user"] == r["last_user"]:
                # single-user block: the last segment IS the whole block
                tot += r["last_total"]
                cnt += r["last_count"]
                last_ts = r["last_ts"]
                continue
        else:
            carries[fk] = (0, 0, -1)
        cur_user = r["last_user"]
        tot, cnt, last_ts = r["last_total"], r["last_count"], r["last_ts"]
    # backward neighbor map: block i's global successor row IS block i+1's
    # first key — O(blocks) like the forward carries
    nxt: dict = {}
    for i in range(len(summaries) - 1):
        cur_s, nxt_s = summaries[i], summaries[i + 1]
        nxt[(cur_s["fk_user"], cur_s["fk_ts"], cur_s["fk_eid"])] = (
            nxt_s["fk_user"], nxt_s["fk_ts"])
    carries_ref = ray.put((carries, nxt))

    out_schema = pa.schema([
        ("event_id", pa.int64()), ("user_id", pa.int64()),
        ("cum_cents", pa.int64()), ("seq", pa.int64()),
        ("gap_us", pa.int64()), ("lead_us", pa.int64())])

    def attach(b: pa.Table) -> pa.Table:
        if len(b) == 0:
            return out_schema.empty_table()
        u = b.column("user_id").to_numpy(zero_copy_only=False)
        v = b.column("cents").to_numpy(zero_copy_only=False)
        t = b.column("ts_us").to_numpy(zero_copy_only=False)
        e = b.column("event_id").to_numpy(zero_copy_only=False)
        n = len(u)
        seg_start = np.concatenate(([True], u[1:] != u[:-1]))
        seg_id = np.cumsum(seg_start) - 1
        start_idx = np.flatnonzero(seg_start)
        cs = np.cumsum(v, dtype=np.int64)
        base = (cs[start_idx] - v[start_idx])[seg_id]
        cum = cs - base
        seq = np.arange(n, dtype=np.int64) - start_idx[seg_id] + 1
        gap = np.empty(n, dtype=np.int64)
        gap[1:] = t[1:] - t[:-1]
        gap[start_idx] = -1
        lead = np.empty(n, dtype=np.int64)
        lead[:-1] = t[1:] - t[:-1]
        seg_end = np.concatenate((start_idx[1:] - 1, [n - 1]))
        lead[seg_end] = -1
        all_carries, all_nxt = ray.get(carries_ref)
        fk = (int(u[0]), int(t[0]), int(e[0]))
        c_tot, c_cnt, c_ts = all_carries[fk]
        first_len = int(start_idx[1]) if len(start_idx) > 1 else n
        if c_cnt:
            cum[:first_len] += c_tot
            seq[:first_len] += c_cnt
            gap[0] = t[0] - c_ts
        nxt_row = all_nxt.get(fk)
        if nxt_row is not None and nxt_row[0] == int(u[-1]):
            lead[-1] = nxt_row[1] - t[-1]
        return pa.Table.from_pydict({
            "event_id": pa.array(e, pa.int64()),
            "user_id": pa.array(u, pa.int64()),
            "cum_cents": pa.array(cum, pa.int64()),
            "seq": pa.array(seq, pa.int64()),
            "gap_us": pa.array(gap, pa.int64()),
            "lead_us": pa.array(lead, pa.int64())})

    return s.map_batches(attach, batch_format="pyarrow", batch_size=None)


def session_assign(
    events: ray.data.Dataset, gap_s: int = 1800, salt_bucket_s: int = 0,
) -> ray.data.Dataset:
    """Per-EVENT session membership: every event labeled with its user's
    gap-session index — the join of the raw stream back onto ``sessionize``
    without a join.  Returns (event_id, user_id, session_index).

    Scale shape (measured: per-user ``map_groups`` at 150k users never
    finished a 10M-event probe — Ray's ~10µs/group dispatch × |users|;
    this shape ran it in seconds): hash users into a BOUNDED number of
    groups (4×CPUs, the funnel/retention co-shuffle) and resolve every
    user in one vectorized pass per group — global break scan
    (``diff > gap`` OR user change), run-rebased cumsum.

    ``salt_bucket_s`` > 0 is the whale path: no single group may hold one
    user's whole history, so pass 1 co-shuffles by hash(user, time-bucket)
    and emits LOCAL indexes plus one summary row per (user, bucket); pass
    2 co-shuffles the summaries (tiny) by user and computes each bucket's
    global index OFFSET vectorized (exclusive session-count cumsum minus
    fuse corrections, rebased per user run); pass 3 re-shuffles events +
    offset markers on the pass-1 key and adds the segment-leading offset.
    Nothing materializes on the driver; the event stream moves twice.
    Output identical to the unsalted path (tested across fusing bucket
    boundaries)."""
    from .funnel import _bucket_of, _nbuckets

    gap_us = gap_s * US
    nb = _nbuckets()

    if not salt_bucket_s:
        def prep(b: pa.Table) -> pa.Table:
            uid = b.column("user_id").to_numpy(zero_copy_only=False)
            return pa.Table.from_pydict(
                {"event_id": b.column("event_id").combine_chunks(),
                 "u": pa.array(uid.astype(np.int64), pa.int64()),
                 "t": pa.array(_epoch_us(b.column("ts")), pa.int64()),
                 "gb": pa.array(_bucket_of(uid, nb), pa.int64())})

        def bucket_scan(group: pa.Table) -> pa.Table:
            u = group.column("u").to_numpy(zero_copy_only=False)
            t = group.column("t").to_numpy(zero_copy_only=False)
            e = group.column("event_id").to_numpy(zero_copy_only=False)
            order = np.lexsort((e, t, u))
            u, t, e = u[order], t[order], e[order]
            new_user = np.concatenate(([True], u[1:] != u[:-1]))
            brk = new_user | np.concatenate(([False], np.diff(t) > gap_us))
            sid = np.cumsum(brk) - 1  # global session run id
            starts = np.flatnonzero(new_user)
            run_id = np.cumsum(new_user) - 1
            session_index = (sid - sid[starts][run_id]).astype(np.int32)
            return pa.Table.from_pydict(
                {"event_id": pa.array(e, pa.int64()),
                 "user_id": pa.array(u, pa.int64()),
                 "session_index": pa.array(session_index, pa.int32())})

        return (
            events.select_columns(["event_id", "user_id", "ts"])
            .map_batches(prep, batch_format="pyarrow")
            .groupby("gb")
            .map_groups(bucket_scan, batch_format="pyarrow")
        )

    b_us = salt_bucket_s * US

    def prep2(b: pa.Table) -> pa.Table:
        uid = b.column("user_id").to_numpy(zero_copy_only=False)
        ts = _epoch_us(b.column("ts"))
        tb = ts // b_us
        return pa.Table.from_pydict(
            {"event_id": b.column("event_id").combine_chunks(),
             "u": pa.array(uid.astype(np.int64), pa.int64()),
             "t": pa.array(ts, pa.int64()),
             "tb": pa.array(tb, pa.int64()),
             "gb": pa.array(_bucket_of(uid * 1_000_003 + tb, nb), pa.int64())})

    def _segments(u: np.ndarray, tb: np.ndarray) -> np.ndarray:
        return np.concatenate(
            ([True], (u[1:] != u[:-1]) | (tb[1:] != tb[:-1])))

    def pass1(group: pa.Table) -> pa.Table:
        """Events with LOCAL indexes (kind=1) + one summary row per
        (user, time-bucket) segment (kind=0)."""
        u = group.column("u").to_numpy(zero_copy_only=False)
        t = group.column("t").to_numpy(zero_copy_only=False)
        tb = group.column("tb").to_numpy(zero_copy_only=False)
        e = group.column("event_id").to_numpy(zero_copy_only=False)
        order = np.lexsort((e, t, tb, u))
        u, t, tb, e = u[order], t[order], tb[order], e[order]
        seg = _segments(u, tb)
        brk = seg | np.concatenate(([False], np.diff(t) > gap_us))
        sid = np.cumsum(brk) - 1
        starts = np.flatnonzero(seg)
        run_id = np.cumsum(seg) - 1
        local = (sid - sid[starts][run_id]).astype(np.int64)
        ends = np.concatenate((starts[1:] - 1, [len(u) - 1]))
        n_sessions = local[ends] + 1
        ev = pa.Table.from_pydict(
            {"kind": pa.array(np.ones(len(u), np.int8), pa.int8()),
             "u": pa.array(u, pa.int64()), "tb": pa.array(tb, pa.int64()),
             "event_id": pa.array(e, pa.int64()),
             "v1": pa.array(local, pa.int64()),
             "v2": pa.array(np.zeros(len(u), np.int64), pa.int64())})
        sm = pa.Table.from_pydict(
            {"kind": pa.array(np.zeros(len(starts), np.int8), pa.int8()),
             "u": pa.array(u[starts], pa.int64()),
             "tb": pa.array(tb[starts], pa.int64()),
             "event_id": pa.array(n_sessions, pa.int64()),  # n_sessions
             "v1": pa.array(t[starts], pa.int64()),         # first_start
             "v2": pa.array(t[ends], pa.int64())})          # last_end
        return pa.concat_tables([ev, sm])

    tagged = (
        events.select_columns(["event_id", "user_id", "ts"])
        .map_batches(prep2, batch_format="pyarrow")
        .groupby("gb")
        .map_groups(pass1, batch_format="pyarrow")
        .materialize()
    )

    def add_user_gb(b: pa.Table) -> pa.Table:
        u = b.column("u").to_numpy(zero_copy_only=False)
        return b.append_column("ugb", pa.array(_bucket_of(u, nb), pa.int64()))

    def pass2(group: pa.Table) -> pa.Table:
        """Summaries → per-(user, bucket) global offsets, vectorized:
        offs = exclusive cumsum of n_sessions minus fuse corrections,
        rebased at each user run start."""
        u = group.column("u").to_numpy(zero_copy_only=False)
        tb = group.column("tb").to_numpy(zero_copy_only=False)
        ns = group.column("event_id").to_numpy(zero_copy_only=False)
        fs = group.column("v1").to_numpy(zero_copy_only=False)
        le = group.column("v2").to_numpy(zero_copy_only=False)
        order = np.lexsort((tb, u))
        u, tb, ns, fs, le = u[order], tb[order], ns[order], fs[order], le[order]
        new_user = np.concatenate(([True], u[1:] != u[:-1]))
        # fuse: this bucket's first session continues the previous
        # bucket's last (never at a user's first bucket)
        fuse = np.concatenate(([False], (fs[1:] - le[:-1]) <= gap_us))
        fuse &= ~new_user
        excl_n = np.concatenate(([0], np.cumsum(ns)[:-1]))
        cum_fuse = np.cumsum(fuse.astype(np.int64))
        raw = excl_n - cum_fuse
        starts = np.flatnonzero(new_user)
        run_id = np.cumsum(new_user) - 1
        offs = raw - raw[starts][run_id]
        return pa.Table.from_pydict(
            {"kind": pa.array(np.zeros(len(u), np.int8), pa.int8()),
             "u": pa.array(u, pa.int64()), "tb": pa.array(tb, pa.int64()),
             "event_id": pa.array(np.zeros(len(u), np.int64), pa.int64()),
             "v1": pa.array(offs, pa.int64()),
             "v2": pa.array(np.zeros(len(u), np.int64), pa.int64())})

    offsets = (
        tagged.filter(expr="kind == 0")
        .map_batches(add_user_gb, batch_format="pyarrow")
        .groupby("ugb")
        .map_groups(pass2, batch_format="pyarrow")
        .select_columns(["kind", "u", "tb", "event_id", "v1", "v2"])
    )

    ev_rows = tagged.filter(expr="kind == 1")

    def regb(b: pa.Table) -> pa.Table:
        u = b.column("u").to_numpy(zero_copy_only=False)
        tb = b.column("tb").to_numpy(zero_copy_only=False)
        return b.append_column(
            "gb2", pa.array(_bucket_of(u * 1_000_003 + tb, nb), pa.int64()))

    def pass3(group: pa.Table) -> pa.Table:
        """Offset marker leads each (u, tb) segment (kind 0 sorts first);
        every event row adds its segment's offset to the local index."""
        kind = group.column("kind").to_numpy(zero_copy_only=False)
        u = group.column("u").to_numpy(zero_copy_only=False)
        tb = group.column("tb").to_numpy(zero_copy_only=False)
        e = group.column("event_id").to_numpy(zero_copy_only=False)
        v1 = group.column("v1").to_numpy(zero_copy_only=False)
        order = np.lexsort((kind, tb, u))
        kind, u, tb, e, v1 = (kind[order], u[order], tb[order], e[order],
                              v1[order])
        seg = _segments(u, tb)
        starts = np.flatnonzero(seg)
        run_id = np.cumsum(seg) - 1
        seg_off = v1[starts][run_id]  # marker row leads its segment
        is_ev = kind == 1
        return pa.Table.from_pydict(
            {"event_id": pa.array(e[is_ev], pa.int64()),
             "user_id": pa.array(u[is_ev], pa.int64()),
             "session_index": pa.array(
                 (v1[is_ev] + seg_off[is_ev]).astype(np.int32), pa.int32())})

    return (
        ev_rows.union(offsets)
        .map_batches(regb, batch_format="pyarrow")
        .groupby("gb2")
        .map_groups(pass3, batch_format="pyarrow")
    )


def window_trending(
    events: ray.data.Dataset,
    window_s: int = 86400,
    k_top: int = 5,
    props_key: str = "k",
    local_threshold: int = 1 << 20,
) -> ray.data.Dataset:
    """Trending property keys per window — the dashboarding composite:
    per ``window_s`` window, the ``k_top`` most frequent values of the
    ``props_key`` JSON field (count desc, key asc), each with the count
    it had in the PREVIOUS window (0 if absent) and the integer delta.
    Returns (window_start_us, rank, k, cnt, prev_cnt, delta).

    Scale shape: vectorized JSON field extraction (one Arrow
    ``extract_regex`` — props never leave the batch) + batch-local
    (window, key) count combiner → one groupby at window×key (not event)
    cardinality → per-window top-k (``sortagg.sorted_topk``) → the
    previous-window lookup as a JOIN-FREE segment attach: every count row
    re-keys to (key, window+W) as a marker and ``sorted_attach_first``
    hands each selected row its marker's count.  All-integer."""
    import ray.data.aggregate as agg

    from .sortagg import sorted_attach_first, sorted_topk

    w_us = window_s * US
    pat = '"' + props_key + '": (?P<v>\\d+)'

    def prep(b: pa.Table) -> pa.Table:
        ts = _epoch_us(b.column("ts"))
        ext = pc.extract_regex(b.column("props"), pat)
        kv = pc.cast(pc.struct_field(ext, 0), pa.int64())
        t = pa.table({
            "w": pa.array((ts // w_us) * w_us, pa.int64()),
            "k": kv,
        }).group_by(["w", "k"]).aggregate([("k", "count")])
        return pa.table({
            "w": t.column("w"), "k": t.column("k"),
            "c": pc.cast(t.column("k_count"), pa.int64()),
        })

    counts = (
        events.select_columns(["ts", "props"])
        .map_batches(prep, batch_format="pyarrow")
        .groupby(["w", "k"])
        .aggregate(agg.Sum("c", alias_name="cnt"))
        .materialize()
    )

    if counts.count() <= local_threshold:
        # the (window × key) table is tiny after the combiner — the
        # distributed finish would pay ~4 fixed execution rounds
        # (top-k segment-reduce + attach sort + final sort) of pure
        # scheduling; one vectorized task is bit-identical (the same
        # adaptive switch as the graph operators' local paths).
        def local_finish(b: pa.Table) -> pa.Table:
            w = b.column("w").to_numpy(zero_copy_only=False)
            kk = b.column("k").to_numpy(zero_copy_only=False)
            c = b.column("cnt").to_numpy(zero_copy_only=False)
            order = np.lexsort((kk, -c, w))
            w, kk, c = w[order], kk[order], c[order]
            new_w = np.concatenate(([True], w[1:] != w[:-1]))
            starts = np.flatnonzero(new_w)
            run_id = np.cumsum(new_w) - 1
            rank = np.arange(len(w)) - starts[run_id] + 1
            keep = rank <= k_top
            # previous-window lookup: one sorted composite-key bisect.
            # Dense-rank BOTH columns first (unique-inverse), so the
            # packed composite is bounded by n_rows² regardless of raw
            # key / epoch magnitude — no 2^24/2^39 overflow window.
            grid = w // w_us
            ku, k_inv = np.unique(kk, return_inverse=True)
            gu, g_inv = np.unique(grid, return_inverse=True)
            G = np.int64(len(gu)) + 1  # rank len(gu) = "absent" sentinel
            comp = k_inv.astype(np.int64) * G + g_inv
            kidx = np.argsort(comp)
            comp_s, c_s = comp[kidx], c[kidx]
            qg = grid[keep] - 1
            gq = np.searchsorted(gu, qg)
            gq_hit = (gq < len(gu)) & (gu[np.minimum(gq, len(gu) - 1)] == qg)
            q = k_inv[keep].astype(np.int64) * G + np.where(gq_hit, gq, len(gu))
            j = np.searchsorted(comp_s, q)
            j_ok = (j < len(comp_s)) & (comp_s[np.minimum(j, len(comp_s) - 1)] == q)
            prev = np.where(j_ok, c_s[np.minimum(j, len(comp_s) - 1)], 0)
            cnt_keep = c[keep]
            return pa.Table.from_pydict(
                {"window_start_us": pa.array(w[keep], pa.int64()),
                 "rank": pa.array(rank[keep].astype(np.int32), pa.int32()),
                 "k": pa.array(kk[keep], pa.int64()),
                 "cnt": pa.array(cnt_keep, pa.int64()),
                 "prev_cnt": pa.array(prev.astype(np.int64), pa.int64()),
                 "delta": pa.array(cnt_keep - prev, pa.int64())})

        return counts.repartition(1).map_batches(
            local_finish, batch_format="pyarrow", batch_size=None)

    top = sorted_topk(counts, ["w"], order_by=["cnt", "k"], k=k_top,
                      descending=[True, False], rank_name="rank")

    def row_side(b: pa.Table) -> pa.Table:
        n = len(b)
        return pa.Table.from_pydict(
            {"k": b.column("k"), "w": b.column("w"),
             "rank": b.column("rank"),
             "cnt": b.column("cnt"),
             "_carrier": pa.nulls(n, pa.int8()).fill_null(1),
             "mk": pa.nulls(n, pa.int64()).fill_null(0)})

    def marker_side(b: pa.Table) -> pa.Table:
        n = len(b)
        w = b.column("w").to_numpy(zero_copy_only=False)
        c = b.column("cnt").to_numpy(zero_copy_only=False)
        return pa.Table.from_pydict(
            {"k": b.column("k"),
             "w": pa.array(w + w_us, pa.int64()),   # claims the NEXT window
             "rank": pa.array(np.zeros(n, np.int32), pa.int32()),
             "cnt": pa.array(np.zeros(n, np.int64), pa.int64()),
             "_carrier": pa.nulls(n, pa.int8()).fill_null(0),
             "mk": pa.array(c + 1, pa.int64())})    # +1: 0 = "no marker"

    att = sorted_attach_first(
        top.map_batches(row_side, batch_format="pyarrow")
        .union(counts.map_batches(marker_side, batch_format="pyarrow")),
        ["k", "w"], value_col="mk", order_col="_carrier",
        attach_name="prev_mk")

    def finish(b: pa.Table) -> pa.Table:
        rows = b.filter(pc.equal(b.column("_carrier"), 1))
        prev = rows.column("prev_mk").to_numpy(zero_copy_only=False)
        prev = np.where(prev > 0, prev - 1, 0).astype(np.int64)
        cnt = rows.column("cnt").to_numpy(zero_copy_only=False)
        return pa.Table.from_pydict(
            {"window_start_us": rows.column("w"),
             "rank": pc.cast(rows.column("rank"), pa.int32()),
             "k": rows.column("k"),
             "cnt": pa.array(cnt, pa.int64()),
             "prev_cnt": pa.array(prev, pa.int64()),
             "delta": pa.array(cnt - prev, pa.int64())})

    return att.map_batches(finish, batch_format="pyarrow").sort(
        ["window_start_us", "rank"])


def events_summary(events: ray.data.Dataset) -> ray.data.Dataset:
    """One-row events data card: ``(n_events, distinct_users,
    distinct_event_types, min_ts_us, max_ts_us, total_value_cents)``.

    Scalar aggregates come from one scan with ONE partial row per block;
    the two exact distinct counts ride a single tagged-distinct exchange
    (per-batch ``unique`` partials → one groupby → per-block count
    partials), the window_distinct two-level shape — shuffled volume is
    the distinct-key count, never the event count.  Values sum as exact
    integer cents (``floor(v·100 + 0.5)``, the event-oracle rule)."""
    import numpy as np

    def partial(b: pa.Table) -> pa.Table:
        if len(b) == 0:
            return pa.table({c: pa.array([], pa.int64()) for c in
                             ("n_events", "min_ts_us", "max_ts_us",
                              "total_value_cents")})
        ts = b.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
        v = b.column("value").to_numpy(zero_copy_only=False)
        cents = np.floor(v * 100 + 0.5).astype(np.int64)
        return pa.table({
            "n_events": pa.array([len(b)], pa.int64()),
            "min_ts_us": pa.array([int(ts.min())], pa.int64()),
            "max_ts_us": pa.array([int(ts.max())], pa.int64()),
            "total_value_cents": pa.array([int(cents.sum())], pa.int64()),
        })

    parts = events.select_columns(["ts", "value"]).map_batches(
        partial, batch_format="pyarrow").take_all()

    def dkeys(b: pa.Table) -> pa.Table:
        u = pc.unique(pc.drop_null(b.column("user_id"))).cast(pa.string())
        t = pc.unique(pc.drop_null(b.column("event_type"))).cast(pa.string())
        return pa.table({
            "t": pa.array(["u"] * len(u) + ["e"] * len(t), pa.string()),
            "k": pa.concat_arrays([u, t]),
        })

    def tag_counts(b: pa.Table) -> pa.Table:
        g = b.group_by("t").aggregate([("t", "count")])
        return pa.table({"t": g.column("t"),
                         "c": pc.cast(g.column("t_count"), pa.int64())})

    dist = (events.select_columns(["user_id", "event_type"])
            .map_batches(dkeys, batch_format="pyarrow")
            .groupby(["t", "k"]).count()
            .map_batches(tag_counts, batch_format="pyarrow").take_all())
    n_users = sum(r["c"] for r in dist if r["t"] == "u")
    n_types = sum(r["c"] for r in dist if r["t"] == "e")
    if not parts:
        parts = [{"n_events": 0, "min_ts_us": 0, "max_ts_us": 0,
                  "total_value_cents": 0}]
    return ray.data.from_arrow(pa.table({
        "n_events": pa.array([sum(r["n_events"] for r in parts)], pa.int64()),
        "distinct_users": pa.array([n_users], pa.int64()),
        "distinct_event_types": pa.array([n_types], pa.int64()),
        "min_ts_us": pa.array([min(r["min_ts_us"] for r in parts)],
                              pa.int64()),
        "max_ts_us": pa.array([max(r["max_ts_us"] for r in parts)],
                              pa.int64()),
        "total_value_cents": pa.array(
            [sum(r["total_value_cents"] for r in parts)], pa.int64()),
    }))
