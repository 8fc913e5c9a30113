"""crc32_vec must be bit-identical to zlib.crc32 — salt assignment and
bucket layout depend on it."""

import zlib

import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from go_light_rag_ray.hashutil import crc32_vec


def test_crc32_vec_matches_zlib_basic():
    vals = [b"", b"a", b"hello|world|occ", b"\x00\xff\x7f", b"x" * 300]
    got = crc32_vec(pa.array(vals, pa.binary()))
    assert [int(v) for v in got] == [zlib.crc32(v) for v in vals]


def test_crc32_vec_string_and_chunked():
    vals = ["entity|X|00017", "", "café", "a|b|c" * 40]
    arr = pa.chunked_array([pa.array(vals[:2]), pa.array(vals[2:])])
    got = crc32_vec(arr)
    assert [int(v) for v in got] == [zlib.crc32(v.encode()) for v in vals]


def test_crc32_vec_sliced_array_offset():
    arr = pa.array([b"skip", b"keep1", b"keep22"], pa.binary()).slice(1)
    got = crc32_vec(arr)
    assert [int(v) for v in got] == [zlib.crc32(b"keep1"), zlib.crc32(b"keep22")]


@settings(max_examples=50, deadline=None)
@given(st.lists(st.binary(min_size=0, max_size=64), min_size=1, max_size=32))
def test_crc32_vec_matches_zlib_property(vals):
    got = crc32_vec(pa.array(vals, pa.binary()))
    assert [int(v) for v in got] == [zlib.crc32(v) for v in vals]


def _fnv1a64_scalar(b: bytes) -> int:
    h = 0xCBF29CE484222325
    for byte in b:
        h = ((h ^ byte) * 0x100000001B3) & 0xFFFFFFFFFFFFFFFF
    return h


def test_fnv1a64_vec_matches_scalar():
    from go_light_rag_ray.hashutil import fnv1a64_vec

    vals = [b"", b"a", b"hello world", b"\x00\xff\x7f", b"x" * 300]
    got = fnv1a64_vec(pa.array(vals, pa.binary()))
    assert [int(v) for v in got] == [_fnv1a64_scalar(v) for v in vals]


@settings(max_examples=50, deadline=None)
@given(st.lists(st.binary(min_size=0, max_size=64), min_size=1, max_size=32))
def test_fnv1a64_vec_matches_scalar_property(vals):
    from go_light_rag_ray.hashutil import fnv1a64_vec

    got = fnv1a64_vec(pa.array(vals, pa.binary()))
    assert [int(v) for v in got] == [_fnv1a64_scalar(v) for v in vals]


def test_gram_hash64_splits_real_crc_collision():
    """Regression: these two sf0.001 grams COLLIDE on zlib.crc32, and CRC's
    incremental property (crc(m+s) is a function of crc(m) alone) forces
    every suffix-salted crc pair to collide in lockstep — the original
    "64-bit" double-crc gram key had only 32 bits of strength and marked a
    phantom duplicate span (dedup_spans 47 vs oracle 45 rows).  The
    (crc32, fnv1a64) key must separate them."""
    import zlib

    from go_light_rag_ray.stages.spandedup import _gram_hash64

    g1 = "slow small filter customer line the batch value"
    g2 = "stream batch window column customer table filter small"
    assert zlib.crc32(g1.encode()) == zlib.crc32(g2.encode())
    salted1 = zlib.crc32((g1 + "\x02").encode())
    salted2 = zlib.crc32((g2 + "\x02").encode())
    assert salted1 == salted2  # the lockstep collision that broke the key
    h = _gram_hash64(pa.array([g1, g2]))
    assert h[0].as_py() != h[1].as_py()
