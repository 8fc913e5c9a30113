"""Corpus-level heavy hitters (top-k terms), exact + sketch.

The global "what dominates this corpus" question (stop-word discovery,
boilerplate detection, tokenizer-vocab seeding) at two scales:

- ``corpus_top_words`` (exact, the oracle): per-batch Arrow hash-count
  partials → one ``groupby(word).sum`` shuffle at vocabulary (not token)
  cardinality → global top-k by (count desc, word asc).  The final rank is
  a ``sort().limit(k)`` over vocabulary-sized rows — tiny.
- ``MisraGries`` (the sketch path): the classic deterministic heavy-hitters
  summary (Misra & Gries 1982).  Capacity-m counters guarantee every term
  with true frequency > n/(m+1) survives, and estimates undercount by at
  most n/(m+1).  Sketches MERGE by counter addition + decrement of the
  (m+1)-th largest (Agarwal et al., PODS'12 mergeable-summaries result),
  so per-batch sketches combine associatively without ever shuffling the
  token stream — the path when even the vocabulary is too wide to shuffle.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data
import ray.data.aggregate as agg

from .lm import _flat_words

__all__ = ["corpus_top_words", "MisraGries", "mg_top_words",
           "cms_cells", "cms_estimate", "CMS_WIDTH", "CMS_DEPTH"]


def corpus_top_words(
    docs: ray.data.Dataset, k: int = 20, text_col: str = "text",
) -> ray.data.Dataset:
    """→ (rank 1..k, word, count): the corpus's k most frequent words,
    ties broken by ascending word."""

    def partial(b: pa.Table) -> pa.Table:
        flat, _ = _flat_words(b, text_col)
        t = pa.table({"word": flat}).group_by("word").aggregate(
            [("word", "count")])
        return pa.table({"word": t.column("word"),
                         "c": pc.cast(t.column("word_count"), pa.int64())})

    counts = (
        docs.map_batches(partial, batch_format="pyarrow")
        .groupby("word")
        .aggregate(agg.Sum("c", alias_name="count"))
    )
    top = counts.sort(["count", "word"], descending=[True, False]).limit(k)

    def rank_block(b: pa.Table) -> pa.Table:
        # limit(k) yields a single ≤k-row block; rank = position
        return pa.table({
            "rank": pa.array(np.arange(1, b.num_rows + 1, dtype=np.int32),
                             pa.int32()),
            "word": b.column("word"),
            "count": pc.cast(b.column("count"), pa.int64()),
        })

    return top.repartition(1).map_batches(rank_block, batch_format="pyarrow",
                                          batch_size=None)


class MisraGries:
    """Capacity-m Misra-Gries counter summary over a term stream."""

    def __init__(self, m: int = 64) -> None:
        self.m = int(m)
        self.counters: dict[str, int] = {}
        self.n = 0

    def update(self, words: list[str], counts: np.ndarray | None = None) -> None:
        """Batch update from (word, count) pairs (pre-aggregated is fine —
        MG is additive in counts)."""
        cs = counts if counts is not None else np.ones(len(words), np.int64)
        for w, c in zip(words, cs):
            c = int(c)
            self.n += c
            if w in self.counters:
                self.counters[w] += c
            elif len(self.counters) < self.m:
                self.counters[w] = c
            else:
                # decrement-all by the incoming weight, bounded by the
                # smallest counter (vectorized equivalent of c unit steps)
                dec = min(c, min(self.counters.values()))
                self.counters = {w2: c2 - dec
                                 for w2, c2 in self.counters.items()
                                 if c2 - dec > 0}
                if c - dec > 0:
                    self.counters[w] = c - dec

    def merge(self, other: "MisraGries") -> "MisraGries":
        """Counter addition, then shrink back to m by subtracting the
        (m+1)-th largest value — the mergeable-summaries combine rule."""
        for w, c in other.counters.items():
            self.counters[w] = self.counters.get(w, 0) + c
        self.n += other.n
        if len(self.counters) > self.m:
            vals = sorted(self.counters.values(), reverse=True)
            cut = vals[self.m]
            self.counters = {w: c - cut for w, c in self.counters.items()
                             if c - cut > 0}
        return self

    def top(self, k: int) -> list[tuple[str, int]]:
        return sorted(self.counters.items(), key=lambda wc: (-wc[1], wc[0]))[:k]


def mg_top_words(
    docs: ray.data.Dataset, k: int = 20, m: int = 1024,
    text_col: str = "text",
) -> list[tuple[str, int]]:
    """Sketch-path top-k: per-batch MG sketches (built from Arrow-counted
    partials, so the Python loop runs per DISTINCT word per batch) reduced
    on the driver — O(batches × m) counters move, never the token stream.
    Estimates undercount by ≤ n/(m+1); any word with share > 1/(m+1)
    is guaranteed present."""

    def build(b: pa.Table) -> pa.Table:
        flat, _ = _flat_words(b, text_col)
        t = pa.table({"w": flat}).group_by("w").aggregate([("w", "count")])
        s = MisraGries(m)
        s.update(t.column("w").to_pylist(),
                 t.column("w_count").to_numpy(zero_copy_only=False))
        words = list(s.counters)
        return pa.table({
            "n": pa.array([s.n], pa.int64()),
            "words": pa.array([words], pa.list_(pa.string())),
            "counts": pa.array([[s.counters[w] for w in words]],
                               pa.list_(pa.int64())),
        })

    merged = MisraGries(m)
    for row in docs.map_batches(build, batch_format="pyarrow").iter_rows():
        part = MisraGries(m)
        part.counters = dict(zip(row["words"],
                                 (int(c) for c in row["counts"])))
        part.n = int(row["n"])
        merged.merge(part)
    return merged.top(k)


# ---------------------------------------------------------------------------
# Count-Min sketch (Cormode & Muthukrishnan 2005)
# ---------------------------------------------------------------------------

CMS_DEPTH = 4          # md5's 32 hex chars = 4 disjoint 8-hex row hashes
CMS_WIDTH = 1 << 14    # 16384 counters/row → 512 KiB of int64 total


def _cms_positions(word: str, width: int, depth: int) -> list[int]:
    """Row j's counter = int(md5(w)[8j : 8j+8], 16) % width — hex-aligned
    so the DuckDB oracle replicates every position (the same slicing as
    the Bloom decontam probes)."""
    import hashlib

    h = hashlib.md5(word.encode()).hexdigest()
    return [int(h[8 * j: 8 * j + 8], 16) % width for j in range(depth)]


def cms_cells(
    docs: ray.data.Dataset,
    text_col: str = "text",
    width: int = CMS_WIDTH,
    depth: int = CMS_DEPTH,
) -> ray.data.Dataset:
    """Count-Min sketch of the corpus word stream as nonzero cells
    ``(row_j, pos, cnt)`` — the mergeable frequency-estimate companion to
    MisraGries (which keeps only the heavy survivors; CMS answers point
    queries for EVERY word with additive error ≤ n/width at depth-many
    independent chances).

    Scale shape: each batch folds its word counts into a local
    (depth × width) array and emits only nonzero cells — emission is
    bounded by depth·width per batch no matter the token count — and one
    cell-keyed groupby-sum folds batches.  Cells merge across corpora /
    snapshots by the same sum.  All-integer → bit-exact oracle."""

    def partial(b: pa.Table) -> pa.Table:
        flat, _ = _flat_words(b, text_col)
        grid = np.zeros((depth, width), dtype=np.int64)
        if len(flat):
            vc = flat.value_counts()
            words = vc.field("values").to_pylist()
            counts = vc.field("counts").to_numpy(zero_copy_only=False)
            for w, c in zip(words, counts):
                for j, pos in enumerate(_cms_positions(w, width, depth)):
                    grid[j, pos] += int(c)
        jj, pp = np.nonzero(grid)
        return pa.Table.from_pydict({
            "row_j": pa.array(jj.astype(np.int64), pa.int64()),
            "pos": pa.array(pp.astype(np.int64), pa.int64()),
            "cnt": pa.array(grid[jj, pp], pa.int64()),
        })

    return (
        docs.map_batches(partial, batch_format="pyarrow")
        .groupby(["row_j", "pos"])
        .aggregate(agg.Sum("cnt", alias_name="cnt"))
    )


def cms_estimate(
    cells: ray.data.Dataset, word: str,
    width: int = CMS_WIDTH, depth: int = CMS_DEPTH,
) -> int:
    """Point frequency estimate: min over rows of the word's counter
    (driver-side over the ≤ depth·width-row cell table)."""
    want = {(j, pos) for j, pos in
            enumerate(_cms_positions(word, width, depth))}
    vals = {j: 0 for j in range(depth)}
    for r in cells.take_all():
        if (r["row_j"], r["pos"]) in want:
            vals[r["row_j"]] = r["cnt"]
    return min(vals.values())
