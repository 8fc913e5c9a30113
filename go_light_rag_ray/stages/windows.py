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


def sessionize(
    events: ray.data.Dataset, gap_s: int = 1800, salt_bucket_s: int = 0
) -> ray.data.Dataset:
    """Gap-based sessions per user: a new session starts when the time
    since the previous event exceeds ``gap_s``.  Returns
    (user_id, session_index, n_events, start_us, end_us).

    ``salt_bucket_s`` > 0 is the whale-user path: events partition by
    (user, time-bucket) so no single group holds a whale's entire history;
    per-bucket session SUMMARIES (tiny) then merge per user in a second
    groupby, fusing sessions whose cross-bucket gap ≤ ``gap_s``.  The gap
    rule is associative over time-ordered segments, so the salted output
    is IDENTICAL to the unsalted one (tested), with the heavy pass bounded
    by bucket size.  Pick ``salt_bucket_s`` ≫ ``gap_s`` (e.g. a day)."""
    gap_us = gap_s * US

    def sessions_of(ts: np.ndarray):
        breaks = np.nonzero(np.diff(ts) > gap_us)[0]
        starts = np.concatenate([[0], breaks + 1])
        ends = np.concatenate([breaks, [len(ts) - 1]])
        return starts, ends

    def emit(uid: int, starts, ends, ts) -> pa.Table:
        n = len(starts)
        return pa.Table.from_pydict(
            {"user_id": pa.array([uid] * n, pa.int64()),
             "session_index": pa.array(np.arange(n), pa.int32()),
             "n_events": pa.array(ends - starts + 1, pa.int64()),
             "start_us": pa.array(ts[starts], pa.int64()),
             "end_us": pa.array(ts[ends], pa.int64())}
        )

    if not salt_bucket_s:
        def sessions(group: pa.Table) -> pa.Table:
            uid = group.column("user_id")[0].as_py()
            ts = np.sort(_epoch_us(group.column("ts")))
            starts, ends = sessions_of(ts)
            return emit(uid, starts, ends, ts)

        return (
            events.select_columns(["user_id", "ts"])
            .groupby("user_id")
            .map_groups(sessions, batch_format="pyarrow")
        )

    b_us = salt_bucket_s * US

    def add_bucket(b: pa.Table) -> pa.Table:
        ts = _epoch_us(b.column("ts"))
        return pa.Table.from_pydict(
            {"user_id": b.column("user_id").combine_chunks(),
             "ts_us": pa.array(ts, pa.int64()),
             "bucket": pa.array(ts // b_us, pa.int64())}
        )

    def bucket_sessions(group: pa.Table) -> pa.Table:
        uid = group.column("user_id")[0].as_py()
        ts = np.sort(group.column("ts_us").to_numpy())
        starts, ends = sessions_of(ts)
        n = len(starts)
        return pa.Table.from_pydict(
            {"user_id": pa.array([uid] * n, pa.int64()),
             "n_events": pa.array(ends - starts + 1, pa.int64()),
             "start_us": pa.array(ts[starts], pa.int64()),
             "end_us": pa.array(ts[ends], pa.int64())}
        )

    def merge_user(group: pa.Table) -> pa.Table:
        uid = group.column("user_id")[0].as_py()
        order = np.argsort(group.column("start_us").to_numpy())
        s = group.column("start_us").to_numpy()[order]
        e = group.column("end_us").to_numpy()[order]
        c = group.column("n_events").to_numpy()[order]
        out_s, out_e, out_c = [s[0]], [e[0]], [int(c[0])]
        for i in range(1, len(s)):
            if s[i] - out_e[-1] <= gap_us:
                out_e[-1] = max(out_e[-1], int(e[i]))
                out_c[-1] += int(c[i])
            else:
                out_s.append(int(s[i]))
                out_e.append(int(e[i]))
                out_c.append(int(c[i]))
        n = len(out_s)
        return pa.Table.from_pydict(
            {"user_id": pa.array([uid] * n, pa.int64()),
             "session_index": pa.array(np.arange(n), pa.int32()),
             "n_events": pa.array(out_c, pa.int64()),
             "start_us": pa.array(out_s, pa.int64()),
             "end_us": pa.array(out_e, pa.int64())}
        )

    return (
        events.select_columns(["user_id", "ts"])
        .map_batches(add_bucket, batch_format="pyarrow")
        .groupby(["user_id", "bucket"])
        .map_groups(bucket_sessions, batch_format="pyarrow")
        .groupby("user_id")
        .map_groups(merge_user, batch_format="pyarrow")
    )


def asof_join_latest(
    events: ray.data.Dataset,
    mark_type: str = "error",
    salt_bucket_s: int = 0,
) -> ray.data.Dataset:
    """Point-in-time self as-of join: for every event, the id of the user's
    most recent ``mark_type`` event at-or-before it (NULL if none).

    Distributed pattern: partition by user, per-group time-sorted sweep
    carrying the running latest mark — never a cross join.  Ties on equal
    timestamps break toward the mark with the larger event_id (latest id).
    Returns (event_id, user_id, mark_event_id nullable).

    ``salt_bucket_s`` > 0 is the whale-user path: the sweep partitions by
    (user, time-bucket); rows resolved inside their bucket ship straight
    to the output, and only the UNRESOLVED head of each bucket (events
    before the bucket's first mark) re-groups per user together with tiny
    per-bucket last-mark summaries, where a prefix-carry fixes them.  The
    second group's size is bounded by marks' sparsity, not the whale's
    volume; output is identical to the unsalted path (tested)."""
    if salt_bucket_s:
        return _asof_join_salted(events, mark_type, salt_bucket_s)

    def sweep(group: pa.Table) -> pa.Table:
        uid = group.column("user_id")[0].as_py()
        ts = _epoch_us(group.column("ts"))
        eid = group.column("event_id").to_numpy()
        is_mark = pc.equal(
            group.column("event_type"), mark_type
        ).to_numpy(zero_copy_only=False)
        order = np.lexsort((eid, ts))
        eid, is_mark = eid[order], is_mark[order]
        out = _carry_latest(eid, is_mark)
        res = pa.Table.from_pydict(
            {"event_id": pa.array(eid, pa.int64()),
             "user_id": pa.array([uid] * len(eid), pa.int64()),
             "mark_event_id": pa.array(out, pa.int64(), mask=out < 0)}
        )
        return res

    return (
        events.select_columns(["event_id", "user_id", "ts", "event_type"])
        .groupby("user_id")
        .map_groups(sweep, batch_format="pyarrow")
    )


def _asof_join_salted(
    events: ray.data.Dataset, mark_type: str, salt_bucket_s: int
) -> ray.data.Dataset:
    b_us = salt_bucket_s * US

    def add_bucket(b: pa.Table) -> pa.Table:
        ts = _epoch_us(b.column("ts"))
        return pa.Table.from_pydict(
            {"event_id": b.column("event_id").combine_chunks(),
             "user_id": b.column("user_id").combine_chunks(),
             "ts_us": pa.array(ts, pa.int64()),
             "bucket": pa.array(ts // b_us, pa.int64()),
             "event_type": b.column("event_type").combine_chunks()}
        )

    def bucket_sweep(group: pa.Table) -> pa.Table:
        """Rows resolved within the bucket (kind=0, mark ≥ 0), unresolved
        rows (kind=0, mark=-1), plus ≤1 summary row (kind=1) carrying the
        bucket's LAST mark for the per-user prefix carry."""
        uid = group.column("user_id")[0].as_py()
        bucket = group.column("bucket")[0].as_py()
        ts = group.column("ts_us").to_numpy()
        eid = group.column("event_id").to_numpy()
        is_mark = pc.equal(
            group.column("event_type"), mark_type
        ).to_numpy(zero_copy_only=False)
        order = np.lexsort((eid, ts))
        eid, is_mark = eid[order], is_mark[order]
        out = _carry_latest(eid, is_mark)
        latest = int(out[-1]) if len(out) else -1
        rows = {
            "kind": [0] * len(eid), "event_id": eid.tolist(),
            "user_id": [uid] * len(eid), "bucket": [bucket] * len(eid),
            "mark_event_id": out.tolist(),
        }
        if latest >= 0:
            rows["kind"].append(1)
            rows["event_id"].append(int(latest))
            rows["user_id"].append(uid)
            rows["bucket"].append(bucket)
            rows["mark_event_id"].append(int(latest))
        return pa.Table.from_pydict(
            {"kind": pa.array(rows["kind"], pa.int8()),
             "event_id": pa.array(rows["event_id"], pa.int64()),
             "user_id": pa.array(rows["user_id"], pa.int64()),
             "bucket": pa.array(rows["bucket"], pa.int64()),
             "mark_event_id": pa.array(rows["mark_event_id"], pa.int64())}
        )

    swept = (
        events.select_columns(["event_id", "user_id", "ts", "event_type"])
        .map_batches(add_bucket, batch_format="pyarrow")
        .groupby(["user_id", "bucket"])
        .map_groups(bucket_sweep, batch_format="pyarrow")
        .materialize()
    )

    def finalize(b: pa.Table) -> pa.Table:
        marks = b.column("mark_event_id").to_numpy(zero_copy_only=False)
        return pa.Table.from_pydict(
            {"event_id": b.column("event_id").combine_chunks(),
             "user_id": b.column("user_id").combine_chunks(),
             "mark_event_id": pa.array(marks, pa.int64(), mask=marks < 0)}
        )

    resolved = swept.filter(
        expr="kind == 0 and mark_event_id >= 0"
    ).map_batches(finalize, batch_format="pyarrow")

    def carry_fix(group: pa.Table) -> pa.Table:
        """Per user, over unresolved rows + summaries only: the latest
        mark of any EARLIER bucket resolves each unresolved row."""
        kinds = group.column("kind").to_numpy(zero_copy_only=False)
        buckets = group.column("bucket").to_numpy(zero_copy_only=False)
        eids = group.column("event_id").to_numpy(zero_copy_only=False)
        uid = group.column("user_id")[0].as_py()
        sum_idx = np.nonzero(kinds == 1)[0]
        sum_order = np.argsort(buckets[sum_idx], kind="stable")
        sum_buckets = buckets[sum_idx][sum_order]
        sum_eids = eids[sum_idx][sum_order]
        row_idx = np.nonzero(kinds == 0)[0]
        # last summary from a strictly earlier bucket (vectorized bisect)
        j = np.searchsorted(sum_buckets, buckets[row_idx], side="left")
        marks = np.where(
            j > 0, sum_eids[np.maximum(j - 1, 0)], -1).astype(np.int64)
        return pa.Table.from_pydict(
            {"event_id": pa.array(eids[row_idx].astype(np.int64), pa.int64()),
             "user_id": pa.array([uid] * len(row_idx), pa.int64()),
             "mark_event_id": pa.array(marks, pa.int64(), mask=marks < 0)}
        )

    fixed = (
        swept.filter(expr="kind == 1 or mark_event_id < 0")
        .groupby("user_id")
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
    - ONE keyed shuffle on (user, bucket), then a per-group vectorized
      double bisect (``np.searchsorted`` over the group's sorted mark
      timestamps) counts each event's in-window marks — O((n+m)·log m)
      per group, never a cross join, never a whale-sized group (group
      size is bounded by one user's traffic per W seconds, not their
      whole history).

    Counts are integers, so the DuckDB oracle (LEFT JOIN ... BETWEEN)
    matches bit-exactly.
    """
    w_us = window_s * US

    def add_bucket(b: pa.Table) -> pa.Table:
        ts = _epoch_us(b.column("ts"))
        eid = b.column("event_id").combine_chunks()
        uid = b.column("user_id").combine_chunks()
        is_mark = pc.equal(b.column("event_type"), mark_type).to_numpy(
            zero_copy_only=False)
        bucket = ts // w_us
        base = pa.Table.from_pydict(
            {"event_id": eid, "user_id": uid,
             "ts_us": pa.array(ts, pa.int64()),
             "bucket": pa.array(bucket, pa.int64()),
             # role: 0 = probe event, 1 = mark available to this bucket
             "role": pa.array(is_mark.astype(np.int8), pa.int8())}
        )
        # marks replicate to the NEXT bucket as mark-only rows (role=1,
        # not probes there); within their own bucket they are both probe
        # and mark, encoded role=1 on the original row
        midx = np.nonzero(is_mark)[0]
        if len(midx):
            rep = pa.Table.from_pydict(
                {"event_id": pc.take(eid, pa.array(midx, pa.int64())),
                 "user_id": pc.take(uid, pa.array(midx, pa.int64())),
                 "ts_us": pa.array(ts[midx], pa.int64()),
                 "bucket": pa.array(bucket[midx] + 1, pa.int64()),
                 "role": pa.array(np.full(len(midx), 2, np.int8), pa.int8())}
            )
            return pa.concat_tables([base, rep])
        return base

    def count_group(group: pa.Table) -> pa.Table:
        uid = group.column("user_id")[0].as_py()
        ts = group.column("ts_us").to_numpy()
        eid = group.column("event_id").to_numpy()
        role = group.column("role").to_numpy()
        bucket = group.column("bucket")[0].as_py()
        # probes: original rows only (role 0/1) that BELONG to this bucket
        probe = role != 2
        mark_ts = np.sort(ts[role != 0])  # marks: originals + replicas
        e_ts, e_id = ts[probe], eid[probe]
        hi = np.searchsorted(mark_ts, e_ts, side="right")
        lo = np.searchsorted(mark_ts, e_ts - w_us, side="left")
        n = len(e_ts)
        return pa.Table.from_pydict(
            {"event_id": pa.array(e_id.astype(np.int64), pa.int64()),
             "user_id": pa.array([uid] * n, pa.int64()),
             "n_marks": pa.array((hi - lo).astype(np.int64), pa.int64())}
        )

    return (
        events.select_columns(["event_id", "user_id", "ts", "event_type"])
        .map_batches(add_bucket, batch_format="pyarrow")
        .groupby(["user_id", "bucket"])
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
    without running a join.  Returns (event_id, user_id, session_index).

    Unsalted: one keyed shuffle per user, vectorized break-scan inside the
    group (``np.diff > gap``; ties impossible — ts are unique per user in
    µs, and equal-ts events would share a session anyway since diff 0 ≤
    gap).

    ``salt_bucket_s`` > 0 is the whale path, the assignment twin of
    ``sessionize``'s salted variant: events partition by (user,
    time-bucket) and get LOCAL session indexes; per-bucket first/last
    session summaries (tiny) merge per user on a second pass that yields
    each bucket's global index OFFSET (how many sessions end in earlier
    buckets, minus 1 when the bucket's first local session fuses with the
    previous bucket's last).  The offsets broadcast back via ``ray.put``
    and a second bucket-keyed pass adds them — the heavy data moves
    exactly once, summaries are O(user·buckets).  Output identical to the
    unsalted path (tested)."""
    gap_us = gap_s * US

    def local_index(ts_sorted: np.ndarray) -> np.ndarray:
        if len(ts_sorted) == 0:
            return np.empty(0, dtype=np.int32)
        brk = np.concatenate(
            ([0], (np.diff(ts_sorted) > gap_us).astype(np.int32)))
        return np.cumsum(brk, dtype=np.int32)

    if not salt_bucket_s:
        def assign(group: pa.Table) -> pa.Table:
            uid = group.column("user_id")[0].as_py()
            ts = _epoch_us(group.column("ts"))
            eid = group.column("event_id").to_numpy(zero_copy_only=False)
            order = np.lexsort((eid, ts))
            idx = local_index(ts[order])
            return pa.Table.from_pydict(
                {"event_id": pa.array(eid[order], pa.int64()),
                 "user_id": pa.array([uid] * len(eid), pa.int64()),
                 "session_index": pa.array(idx, pa.int32())})

        return (
            events.select_columns(["event_id", "user_id", "ts"])
            .groupby("user_id")
            .map_groups(assign, batch_format="pyarrow")
        )

    import ray

    b_us = salt_bucket_s * US

    def add_bucket(b: pa.Table) -> pa.Table:
        ts = _epoch_us(b.column("ts"))
        return pa.Table.from_pydict(
            {"event_id": b.column("event_id").combine_chunks(),
             "user_id": b.column("user_id").combine_chunks(),
             "ts_us": pa.array(ts, pa.int64()),
             "bucket": pa.array(ts // b_us, pa.int64())})

    prepped = (
        events.select_columns(["event_id", "user_id", "ts"])
        .map_batches(add_bucket, batch_format="pyarrow")
        .materialize()
    )

    # pass 1: per-(user, bucket) session summaries — (n_sessions, first/last
    # session start+end ts) only, never the events
    def bucket_summary(group: pa.Table) -> pa.Table:
        uid = group.column("user_id")[0].as_py()
        bucket = group.column("bucket")[0].as_py()
        ts = np.sort(group.column("ts_us").to_numpy(zero_copy_only=False))
        idx = local_index(ts)
        n = int(idx[-1]) + 1 if len(idx) else 0
        first_end = int(ts[np.searchsorted(idx, 0, side="right") - 1])
        return pa.Table.from_pydict(
            {"user_id": pa.array([uid], pa.int64()),
             "bucket": pa.array([bucket], pa.int64()),
             "n_sessions": pa.array([n], pa.int64()),
             "first_start": pa.array([int(ts[0])], pa.int64()),
             "first_end": pa.array([first_end], pa.int64()),
             "last_start": pa.array(
                 [int(ts[np.searchsorted(idx, idx[-1], side="left")])],
                 pa.int64()),
             "last_end": pa.array([int(ts[-1])], pa.int64())})

    summaries = (
        prepped.groupby(["user_id", "bucket"])
        .map_groups(bucket_summary, batch_format="pyarrow")
        .take_all()
    )
    # per user in bucket order: offset(bucket) = sessions completed before
    # it, minus 1 if its first session fuses with the previous bucket's last
    summaries.sort(key=lambda r: (r["user_id"], r["bucket"]))
    offsets: dict = {}
    cur_user, total, prev_end = None, 0, -1
    for r in summaries:
        if r["user_id"] != cur_user:
            cur_user, total, prev_end = r["user_id"], 0, -1
        fuse = prev_end >= 0 and r["first_start"] - prev_end <= gap_us
        offsets[(r["user_id"], r["bucket"])] = total - int(fuse)
        total = offsets[(r["user_id"], r["bucket"])] + r["n_sessions"]
        prev_end = r["last_end"]
    off_ref = ray.put(offsets)

    # pass 2: same co-shuffle key, local indexes + broadcast offset
    def bucket_assign(group: pa.Table) -> pa.Table:
        uid = group.column("user_id")[0].as_py()
        bucket = group.column("bucket")[0].as_py()
        ts = group.column("ts_us").to_numpy(zero_copy_only=False)
        eid = group.column("event_id").to_numpy(zero_copy_only=False)
        order = np.lexsort((eid, ts))
        idx = local_index(ts[order])
        off = ray.get(off_ref)[(uid, bucket)]
        return pa.Table.from_pydict(
            {"event_id": pa.array(eid[order], pa.int64()),
             "user_id": pa.array([uid] * len(eid), pa.int64()),
             "session_index": pa.array(
                 (idx.astype(np.int64) + off).astype(np.int32), pa.int32())})

    return (
        prepped.groupby(["user_id", "bucket"])
        .map_groups(bucket_assign, batch_format="pyarrow")
    )
