"""Funnel and cohort-retention analytics over the ``events`` stream.

Two classic event-analytics operators that neither Ray Data nor the
reference provides (SURVEY.md §2.9 streaming gap, same family as
``windows.py``); both are staples of a web-scale event pipeline:

- **funnel**: how many users complete each ordered prefix of a step
  sequence (first ``view``, then the first ``click`` strictly after it,
  then the first ``purchase`` strictly after that, …).  Per-user state is
  inherently sequential, so the distributed shape is the bucketed user
  co-shuffle: hash users into a bounded number of buckets (groups stay
  cluster-sized no matter the user count — never one Ray group per user,
  the ~10µs/group tax), then ONE vectorized multi-user pass per bucket
  (lexsort + ``np.minimum.reduceat`` per step — no Python loop over users
  or events), then a K-row global sum.
- **retention**: the cohort matrix — users grouped by the period of their
  first event, counted in every period they were active.  Per-batch
  Arrow-distinct (user, period) combiner keeps the shuffle at
  |users|×|periods| (not event) cardinality; the same user co-shuffle
  broadcasts each user's cohort to their active periods without a join.

Both outputs are pure integer counts over integer epoch-µs thresholds, so
the DuckDB oracles match bit-exactly (no float anywhere).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data
import ray.data.aggregate as agg

__all__ = ["funnel_counts", "retention_cohorts"]

_INF = np.iinfo(np.int64).max
# Knuth multiplicative mix for the user→bucket assignment; results are
# invariant to the bucket count (counts are summed across buckets), so the
# constant only needs to spread whale-adjacent ids.
_MIX = np.int64(2654435761)


def _nbuckets() -> int:
    cpus = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
    return max(16, 4 * cpus)


def _bucket_of(uid: np.ndarray, nb: int) -> np.ndarray:
    return ((uid.astype(np.int64) * _MIX) & np.int64(0x7FFFFFFF)) % nb


def _epoch_us(ts_col: pa.ChunkedArray) -> np.ndarray:
    return pc.cast(ts_col, pa.int64()).to_numpy(zero_copy_only=False)


def funnel_counts(
    events: ray.data.Dataset,
    steps: tuple[str, ...] = ("view", "click", "purchase"),
    within_s: int = 0,
) -> ray.data.Dataset:
    """→ (step 1..K, event_type, n_users): users whose events contain the
    step sequence in strict time order — step k counts users with some
    ``steps[k]`` event strictly after their earliest completion time of
    steps[0..k-1] (the standard first-touch funnel; ties on equal
    timestamps do NOT advance the funnel, matching the oracle's ``>``).
    ``within_s`` > 0 is the conversion window: every later step must also
    land at-or-before ``first_step_ts + within_s`` (the usual funnel
    horizon; 0 = unbounded).

    Scale shape: the event stream is filtered to funnel steps at the read
    (K/|types| of the rows), shuffled ONCE by user bucket, and each bucket
    resolves all its users in K vectorized passes.
    """
    if len(set(steps)) != len(steps):
        # pc.index_in maps every occurrence of a repeated type onto its
        # FIRST step index, which would silently collapse the funnel
        raise ValueError(f"funnel steps must be distinct, got {steps!r}")
    w_us = within_s * 1_000_000
    step_arr = pa.array(steps, pa.string())
    K = len(steps)
    nb = _nbuckets()

    def prep(b: pa.Table) -> pa.Table:
        sidx = pc.index_in(b.column("event_type"), value_set=step_arr)
        keep = pc.is_valid(sidx)
        uid = pc.filter(b.column("user_id"), keep).to_numpy(zero_copy_only=False)
        return pa.Table.from_pydict({
            "u": pa.array(uid.astype(np.int64), pa.int64()),
            "s": pc.cast(pc.filter(sidx, keep), pa.int8()),
            "t": pa.array(
                _epoch_us(pc.filter(b.column("ts"), keep)), pa.int64()),
            "bucket": pa.array(_bucket_of(uid, nb), pa.int64()),
        })

    def bucket_funnel(group: pa.Table) -> pa.Table:
        u = group.column("u").to_numpy(zero_copy_only=False)
        s = group.column("s").to_numpy(zero_copy_only=False)
        t = group.column("t").to_numpy(zero_copy_only=False)
        order = np.lexsort((t, u, s))  # primary s, then u, then t
        u, s, t = u[order], s[order], t[order]
        users = np.unique(u)
        counts = np.zeros(K, dtype=np.int64)
        thr = np.full(len(users), _INF, dtype=np.int64)
        deadline = np.full(len(users), _INF, dtype=np.int64)
        for k in range(K):
            lo = np.searchsorted(s, k, side="left")
            hi = np.searchsorted(s, k, side="right")
            uk, tk = u[lo:hi], t[lo:hi]
            if len(uk) == 0:
                thr[:] = _INF
                break
            run_starts = np.flatnonzero(
                np.concatenate(([True], uk[1:] != uk[:-1])))
            if k == 0:
                new_thr = np.full(len(users), _INF, dtype=np.int64)
                new_thr[np.searchsorted(users, uk[run_starts])] = tk[run_starts]
                if w_us:
                    deadline = np.where(
                        new_thr < _INF, new_thr + w_us, _INF)
            else:
                # first step-k ts strictly after the user's current
                # threshold (and within the conversion window): qualifying
                # rows keep their ts, others become +inf; segment-min per
                # user run == the earliest qualifier
                uidx = np.searchsorted(users, uk)
                ok = (tk > thr[uidx]) & (tk <= deadline[uidx])
                cand = np.where(ok, tk, _INF)
                seg_min = np.minimum.reduceat(cand, run_starts)
                new_thr = np.full(len(users), _INF, dtype=np.int64)
                new_thr[np.searchsorted(users, uk[run_starts])] = seg_min
            thr = new_thr
            counts[k] = int((thr < _INF).sum())
            if counts[k] == 0:
                break
        return pa.Table.from_pydict({
            "step": pa.array(np.arange(1, K + 1, dtype=np.int64), pa.int64()),
            "event_type": step_arr,
            "n": pa.array(counts, pa.int64()),
        })

    # zero seed: every step emits a row even when no user reaches it
    seed = ray.data.from_arrow(pa.Table.from_pydict({
        "step": pa.array(np.arange(1, K + 1, dtype=np.int64), pa.int64()),
        "event_type": step_arr,
        "n": pa.array(np.zeros(K, dtype=np.int64), pa.int64()),
    }))

    partials = (
        events.select_columns(["user_id", "ts", "event_type"])
        .map_batches(prep, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(bucket_funnel, batch_format="pyarrow")
    )
    return (
        partials.union(seed)
        .groupby(["step", "event_type"])
        .aggregate(agg.Sum("n", alias_name="n_users"))
        .sort("step")
    )


def retention_cohorts(
    events: ray.data.Dataset, period_s: int = 7 * 86400
) -> ray.data.Dataset:
    """→ (cohort_us, period_us, n_users): the retention matrix.  A user's
    cohort is the period (``period_s``-wide epoch bucket) of their first
    event; the user counts toward every (cohort, period) cell of a period
    they were active in (including the cohort period itself).

    Scale shape: per-batch Arrow-distinct (user, period) combiner → one
    user-bucket co-shuffle → per-bucket vectorized cohort broadcast
    (lexsort + run boundaries; a user's min period IS their cohort) +
    local Arrow partial counts → a small (periods²) global sum.
    """
    p_us = period_s * 1_000_000
    nb = _nbuckets()

    def prep(b: pa.Table) -> pa.Table:
        ts = _epoch_us(b.column("ts"))
        t = pa.table({
            "u": pc.cast(b.column("user_id"), pa.int64()),
            "p": pa.array((ts // p_us) * p_us, pa.int64()),
        })
        g = t.group_by(["u", "p"]).aggregate([])  # batch-local distinct
        uid = g.column("u").to_numpy(zero_copy_only=False)
        return pa.table({
            "u": g.column("u"), "p": g.column("p"),
            "bucket": pa.array(_bucket_of(uid, nb), pa.int64()),
        })

    def bucket_cells(group: pa.Table) -> pa.Table:
        u = group.column("u").to_numpy(zero_copy_only=False)
        p = group.column("p").to_numpy(zero_copy_only=False)
        order = np.lexsort((p, u))
        u, p = u[order], p[order]
        # cross-batch dedup of (u, p) pairs
        keep = np.concatenate(([True], (u[1:] != u[:-1]) | (p[1:] != p[:-1])))
        u, p = u[keep], p[keep]
        run_starts = np.flatnonzero(np.concatenate(([True], u[1:] != u[:-1])))
        run_lens = np.diff(np.concatenate((run_starts, [len(u)])))
        cohort = np.repeat(p[run_starts], run_lens)  # min period per user
        local = pa.table({
            "cohort_us": pa.array(cohort, pa.int64()),
            "period_us": pa.array(p, pa.int64()),
        }).group_by(["cohort_us", "period_us"]).aggregate([("period_us", "count")])
        return pa.table({
            "cohort_us": local.column("cohort_us"),
            "period_us": local.column("period_us"),
            "n": pc.cast(local.column("period_us_count"), pa.int64()),
        })

    return (
        events.select_columns(["user_id", "ts"])
        .map_batches(prep, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(bucket_cells, batch_format="pyarrow")
        .groupby(["cohort_us", "period_us"])
        .aggregate(agg.Sum("n", alias_name="n_users"))
        .sort(["cohort_us", "period_us"])
    )
