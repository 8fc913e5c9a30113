"""Mergeable KLL quantile sketch — the web-scale path for ``quantiles.py``.

Karnin, Lang & Liberty, "Optimal Quantile Approximation in Streams"
(FOCS'16): a hierarchy of level buffers where level h holds items of
weight 2^h; when a level overflows, its sorted buffer is COMPACTED — every
other element survives and is promoted one level up (weight doubles).
Rank error is O(n/k) for sketch capacity k, and two sketches merge by
levelwise concatenation + re-compaction, which is exactly the shape a
distributed engine needs: build per batch, merge per key, query once.

This implementation is deliberately small and deterministic-per-build-order
(the compaction coin is a counter parity, not an RNG): identical inputs in
identical order give identical sketches; across different block layouts the
ESTIMATES may differ within the error bound, which is the documented
contract of the approximate path (the exact path in ``quantiles.py`` is the
oracle).

Row representation for transport through Arrow tables: ONE row per sketch,
``(n int64, level_sizes list<int32>, items list<double>)`` — see
``kll_pack`` / ``kll_merge_packed``.
"""

from __future__ import annotations

import numpy as np

__all__ = ["KLL", "kll_pack", "kll_merge_packed"]


class KLL:
    """Capacity-k KLL sketch over float64 items."""

    def __init__(self, k: int = 200) -> None:
        self.k = int(k)
        self.levels: list[np.ndarray] = [np.empty(0, np.float64)]
        self.n = 0
        self._coin = 0

    # -- size budget: level h (from the TOP) gets k * (2/3)^depth, min 2 --
    def _cap(self, level: int) -> int:
        depth = len(self.levels) - 1 - level
        return max(2, int(self.k * (2.0 / 3.0) ** depth))

    def _size(self) -> int:
        return sum(len(b) for b in self.levels)

    def update(self, values: np.ndarray) -> None:
        v = np.asarray(values, np.float64)
        v = v[~np.isnan(v)]
        if len(v) == 0:
            return
        self.levels[0] = np.concatenate([self.levels[0], v])
        self.n += len(v)
        self._compress()

    def _compress(self) -> None:
        while self._size() > sum(self._cap(h) for h in range(len(self.levels))):
            for h in range(len(self.levels)):
                if len(self.levels[h]) > self._cap(h):
                    buf = np.sort(self.levels[h])
                    # keep alternating elements; the surviving parity flips
                    # each compaction (the derandomized coin)
                    start = self._coin & 1
                    self._coin += 1
                    promoted = buf[start::2]
                    self.levels[h] = np.empty(0, np.float64)
                    if h + 1 == len(self.levels):
                        self.levels.append(np.empty(0, np.float64))
                    self.levels[h + 1] = np.concatenate(
                        [self.levels[h + 1], promoted])
                    break
            else:
                break

    def merge(self, other: "KLL") -> "KLL":
        while len(self.levels) < len(other.levels):
            self.levels.append(np.empty(0, np.float64))
        for h, buf in enumerate(other.levels):
            if len(buf):
                self.levels[h] = np.concatenate([self.levels[h], buf])
        self.n += other.n
        self._compress()
        return self

    def quantile(self, q: float) -> float:
        """Value whose weighted rank ≈ max(1, ceil(q·n)) — the same rank
        convention as the exact path."""
        items = np.concatenate(self.levels)
        weights = np.concatenate([
            np.full(len(buf), 1 << h, np.int64)
            for h, buf in enumerate(self.levels)
        ])
        order = np.argsort(items, kind="stable")
        items, weights = items[order], weights[order]
        target = max(1, int(np.ceil(q * self.n)))
        idx = int(np.searchsorted(np.cumsum(weights), target))
        return float(items[min(idx, len(items) - 1)])


def kll_pack(sketch: KLL) -> tuple[int, list[int], list[float]]:
    """→ (n, per-level sizes, flat item stream) — one Arrow row per sketch.

    ``n`` travels explicitly: compaction drops an odd element's weight, so
    recomputing n from item weights would drift; the true count must ride
    along for exact rank targets."""
    sizes = [len(buf) for buf in sketch.levels]
    flat = (np.concatenate(sketch.levels) if sketch._size()
            else np.empty(0, np.float64))
    return sketch.n, sizes, flat.tolist()


def kll_merge_packed(
    packed: list[tuple[int, list[int], list[float]]], k: int = 200,
) -> KLL:
    """Merge transported sketches: levelwise concatenation + one compress."""
    s = KLL(k)
    for n, sizes, flat in packed:
        flat = np.asarray(flat, np.float64)
        off = 0
        for level, sz in enumerate(sizes):
            if sz == 0:
                off += sz
                continue
            while len(s.levels) <= level:
                s.levels.append(np.empty(0, np.float64))
            s.levels[level] = np.concatenate(
                [s.levels[level], flat[off:off + sz]])
            off += sz
        s.n += n
    s._compress()
    return s
