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
