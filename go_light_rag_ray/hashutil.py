"""Vectorized hashing kernels shared by the salting / bucketing stages.

``crc32_vec`` computes ``zlib.crc32`` for every element of an Arrow
binary/string array with NO per-row Python: the classic table-driven CRC
recurrence runs once per BYTE POSITION (vectorized across all rows still
active at that position), so cost is O(total bytes) with ~max_len numpy
steps — for the short natural keys the engine salts/buckets on (entity ids,
``k1|k2|occ`` strings) that is a few dozen vector ops per batch regardless
of row count.  Output is bit-identical to ``zlib.crc32`` (tested), so
switching the call sites changes neither salt assignment nor bucket layout.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _make_table() -> np.ndarray:
    table = np.empty(256, dtype=np.uint32)
    for i in range(256):
        c = np.uint32(i)
        for _ in range(8):
            c = (c >> np.uint32(1)) ^ (
                np.uint32(0xEDB88320) * (c & np.uint32(1)))
        table[i] = c
    return table


_CRC_TABLE = _make_table()


def _byte_view(arr: pa.Array | pa.ChunkedArray):
    """(starts, lens, data) int64/uint8 views over a binary/string array."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    if pa.types.is_string(arr.type):
        arr = arr.cast(pa.binary())
    elif pa.types.is_large_string(arr.type):
        arr = arr.cast(pa.large_binary())
    n = len(arr)
    off_dtype = (np.int64 if pa.types.is_large_binary(arr.type)
                 else np.int32)
    offsets = np.frombuffer(arr.buffers()[1], dtype=off_dtype)[
        arr.offset : arr.offset + n + 1].astype(np.int64)
    data = np.frombuffer(arr.buffers()[2], dtype=np.uint8)
    return offsets[:-1], offsets[1:] - offsets[:-1], data


def crc32_vec(arr: pa.Array | pa.ChunkedArray) -> np.ndarray:
    """Per-element ``zlib.crc32`` of a binary/string Arrow array → uint32."""
    n = len(arr)
    if n == 0:
        return np.empty(0, dtype=np.uint32)
    starts, lens, data = _byte_view(arr)
    crc = np.full(n, 0xFFFFFFFF, dtype=np.uint32)
    for j in range(int(lens.max())):
        active = np.flatnonzero(lens > j)
        byte = data[starts[active] + j].astype(np.uint32)
        c = crc[active]
        crc[active] = (c >> np.uint32(8)) ^ _CRC_TABLE[(c ^ byte) & 0xFF]
    return crc ^ np.uint32(0xFFFFFFFF)


def fnv1a64_vec(arr: pa.Array | pa.ChunkedArray) -> np.ndarray:
    """Per-element 64-bit FNV-1a of a binary/string Arrow array → uint64.

    Same vectorized byte-position recurrence as ``crc32_vec`` but
    MULTIPLICATIVE mod 2**64 — structurally independent of CRC's GF(2)
    linearity.  That independence is load-bearing: CRC is incremental
    (``crc(m + s)`` is a function of ``crc(m)`` alone), so ``crc32(g1) ==
    crc32(g2)`` forces EVERY suffix/prefix-salted crc pair to collide too —
    a "64-bit" key built from two salted crc32 passes has only 32 bits of
    strength (one real collision observed at 23k grams, sf0.001).  A
    (crc32, fnv1a64) pair collides jointly with ~2**-64 probability.
    """
    n = len(arr)
    if n == 0:
        return np.empty(0, dtype=np.uint64)
    starts, lens, data = _byte_view(arr)
    prime = np.uint64(0x100000001B3)
    h = np.full(n, 0xCBF29CE484222325, dtype=np.uint64)
    with np.errstate(over="ignore"):
        for j in range(int(lens.max())):
            active = np.flatnonzero(lens > j)
            byte = data[starts[active] + j].astype(np.uint64)
            h[active] = (h[active] ^ byte) * prime
    return h
