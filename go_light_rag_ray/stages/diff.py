"""Corpus snapshot diff: added / removed / changed docs between crawls.

The incremental-ingest primitive: before re-running a 100 TB pipeline on
a new crawl, compute which documents actually changed and process only
those (the engine's staged-ingest/checkpoint machinery — state/manifest —
then skips the rest).  Never ships text across the wire: each side
reduces to ``(doc_id, md5(text))`` rows in ONE scan, and the diff is a
single id-keyed groupby with scalar aggregates (side-sum + per-side hash
max) — no joins, no per-group Python, ~40 bytes/doc through the shuffle.

Status semantics (hash equality stands in for text equality):
``added`` — id only in the new snapshot; ``removed`` — only in the old;
``changed`` — in both with differing content hash; ``unchanged`` rows are
dropped unless ``include_unchanged``.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data
import ray.data.aggregate as agg

__all__ = ["corpus_diff"]


def corpus_diff(
    old: ray.data.Dataset,
    new: ray.data.Dataset,
    id_col: str = "doc_id",
    text_col: str = "text",
    include_unchanged: bool = False,
) -> ray.data.Dataset:
    """Diff two corpus snapshots by content hash.  ``id_col`` must be
    unique within each snapshot (it is the corpus primary key; the
    side-sum coding 1/2/3 relies on at most one row per side).  Returns
    ``(doc_id, status)``."""

    def reduce_side(side_flag: int):
        def f(b: pa.Table) -> pa.Table:
            texts = b.column(text_col).to_pylist()
            hashes = [hashlib.md5((t or "").encode()).hexdigest()
                      for t in texts]
            n = len(b)
            empty = pa.nulls(n, pa.string()).fill_null("")
            h = pa.array(hashes, pa.string())
            return pa.Table.from_pydict({
                id_col: b.column(id_col),
                "side": pa.nulls(n, pa.int64()).fill_null(side_flag),
                "h_old": h if side_flag == 1 else empty,
                "h_new": h if side_flag == 2 else empty,
            })
        return f

    both = (
        old.map_batches(reduce_side(1), batch_format="pyarrow")
        .union(new.map_batches(reduce_side(2), batch_format="pyarrow"))
        .groupby(id_col)
        .aggregate(
            agg.Sum("side", alias_name="sides"),
            agg.Max("h_old", alias_name="h_old"),
            agg.Max("h_new", alias_name="h_new"),
        )
    )

    def status(b: pa.Table) -> pa.Table:
        sides = b.column("sides").to_numpy(zero_copy_only=False)
        same = pc.equal(b.column("h_old"), b.column("h_new")).to_numpy(
            zero_copy_only=False).astype(bool)
        st = np.where(
            sides == 2, "added",
            np.where(sides == 1, "removed",
                     np.where(same, "unchanged", "changed")))
        out = pa.Table.from_pydict({
            id_col: b.column(id_col),
            "status": pa.array(st.tolist(), pa.string()),
        })
        if include_unchanged:
            return out
        return out.filter(pc.not_equal(out.column("status"), "unchanged"))

    return both.map_batches(status, batch_format="pyarrow")
