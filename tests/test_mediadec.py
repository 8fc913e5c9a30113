"""Real media decode (stages/mediadec.py): bytes-in → features-out for
the dependency-free formats, plus the actor stage over a Ray dataset."""

import struct

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from go_light_rag_ray.stages.mediadec import (
    RawMediaFeaturizer,
    decode_image,
    decode_wav_pcm,
    image_features,
    synthesize_ppm,
)


def _ppm(w, h, px):
    return b"P6\n# comment\n" + f"{w} {h}\n255\n".encode() + px.tobytes()


def _bmp24(px, bottom_up=True):
    h, w, _ = px.shape
    stride = (w * 3 + 3) // 4 * 4
    rows = np.zeros((h, stride), np.uint8)
    bgr = px[:, :, ::-1]
    rows[:, : w * 3] = bgr.reshape(h, w * 3)
    if bottom_up:
        rows = rows[::-1]
    data = rows.tobytes()
    header = (b"BM" + struct.pack("<IHHI", 54 + len(data), 0, 0, 54)
              + struct.pack("<IiiHHIIiiII", 40, w, h if bottom_up else -h,
                            1, 24, 0, len(data), 2835, 2835, 0, 0))
    return header + data


def _wav(rate, ch, samples):
    data = samples.astype("<i2").tobytes()
    fmt = struct.pack("<HHIIHH", 1, ch, rate, rate * ch * 2, ch * 2, 16)
    body = b"fmt " + struct.pack("<I", len(fmt)) + fmt \
        + b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body


def test_ppm_roundtrip_with_comments():
    px = np.arange(5 * 3 * 3, dtype=np.uint8).reshape(3, 5, 3)
    w, h, got = decode_image(_ppm(5, 3, px))
    assert (w, h) == (5, 3) and np.array_equal(got, px)


def test_pgm_gray_replicates():
    g = np.arange(12, dtype=np.uint8).reshape(3, 4, 1)
    buf = b"P5\n4 3\n255\n" + g.tobytes()
    w, h, got = decode_image(buf)
    assert (w, h) == (4, 3)
    assert np.array_equal(got, np.repeat(g, 3, axis=2))


@pytest.mark.parametrize("bottom_up", [True, False])
def test_bmp24_roundtrip(bottom_up):
    px = np.random.default_rng(7).integers(
        0, 256, (4, 5, 3), dtype=np.uint8)
    w, h, got = decode_image(_bmp24(px, bottom_up))
    assert (w, h) == (5, 4) and np.array_equal(got, px)


def test_wav_pcm16():
    s = np.array([0, 100, -200, 300, -32768, 32767], np.int16)
    rate, ch, got = decode_wav_pcm(_wav(8000, 2, s))
    assert rate == 8000 and ch == 2 and np.array_equal(got, s)


@pytest.mark.parametrize("bad", [
    b"", b"GIF89a....", b"P6\n5 3\n70000\n" + b"\0" * 100,
    b"P6\n5 3\n255\n" + b"\0" * 10,           # truncated raster
    b"BM" + b"\0" * 60,                        # bpp 0
    b"RIFF\0\0\0\0WAVEdata\0\0\0\0",           # no fmt
])
def test_corrupt_raises(bad):
    with pytest.raises(ValueError):
        if bad[:4] == b"RIFF":
            decode_wav_pcm(bad)
        else:
            decode_image(bad)


def test_synthesize_ppm_decodes_to_md5_features():
    import hashlib

    ref = "media://doc-42/0"
    d = hashlib.md5(ref.encode()).digest()
    w, h, px = decode_image(synthesize_ppm(ref))
    assert (w, h) == (4 + d[0] % 13, 4 + d[1] % 13)
    f0, f1, f2, f3 = image_features(px)
    assert (f0, f1, f2) == (d[2], d[3], d[4])
    assert f3 == max(d[2], d[3], d[4]) - min(d[2], d[3], d[4])


def test_raw_featurizer_stage_mixed_and_skip(ray_session):
    px = np.full((2, 3, 3), 10, np.uint8)
    px[:, :, 1] = 40          # means (10, 40, 10) → spread 30
    rows = pa.table({
        "doc_id": pa.array(["a", "b", "c", "d"], pa.string()),
        "span_index": pa.array([1, 2, 1, 1], pa.int32()),
        "kind": pa.array(["image", "image", "audio", "image"], pa.string()),
        "media_ref": pa.array(["r1", "r2", "r3", "r4"], pa.string()),
        "payload": pa.array([_ppm(3, 2, px), _bmp24(px),
                             _wav(8000, 1, np.array([3, -3, 3, -3], np.int16)),
                             b"corrupt"], pa.binary()),
    })
    ds = ray.data.from_arrow(rows)
    out = {r["doc_id"]: r for r in ds.map_batches(
        RawMediaFeaturizer, fn_constructor_kwargs={"on_error": "skip"},
        batch_format="pyarrow", concurrency=1, batch_size=2).take_all()}
    assert set(out) == {"a", "b", "c"}          # corrupt row skipped
    for did in ("a", "b"):                       # PPM and BMP agree
        r = out[did]
        assert (r["width"], r["height"]) == (3, 2)
        assert (r["f0"], r["f1"], r["f2"], r["f3"]) == (10, 40, 10, 30)
    r3 = out["c"]
    assert (r3["width"], r3["height"]) == (80, 4)
    assert (r3["f0"], r3["f1"], r3["f2"], r3["f3"]) == (1, 3, 3, 0)
    # strict mode raises on the corrupt payload
    with pytest.raises(Exception):
        ds.map_batches(RawMediaFeaturizer, batch_format="pyarrow",
                       concurrency=1).take_all()


def test_synthesize_wav_decodes_to_md5_features():
    import hashlib

    ref = "media://doc-7/1"
    d = hashlib.md5(ref.encode()).digest()
    from go_light_rag_ray.stages.mediadec import synthesize_wav

    rate, ch, samples = decode_wav_pcm(synthesize_wav(ref))
    assert rate == 8000 and ch == 1
    assert len(samples) == 16 + d[5] % 64
    assert (samples == d[6]).all()


# ---- r5 extensions: 16-bit PNM, multi-data-chunk WAV, corrupt fuzz ----


def test_pgm16_roundtrip_big_endian():
    vals = np.array([[0, 1, 255], [256, 65535, 4660]], np.uint16)
    buf = b"P5\n3 2\n65535\n" + vals.astype(">u2").tobytes()
    w, h, got = decode_image(buf)
    assert (w, h) == (3, 2) and got.dtype == np.uint16
    assert np.array_equal(got, np.repeat(vals[:, :, None], 3, axis=2))


def test_ppm16_color_roundtrip():
    px = np.arange(2 * 2 * 3, dtype=np.uint16).reshape(2, 2, 3) * 300
    buf = b"P6\n2 2\n65535\n" + px.astype(">u2").tobytes()
    w, h, got = decode_image(buf)
    assert (w, h) == (2, 2) and np.array_equal(got, px)


def test_synthesize_pgm16_decodes_to_md5_features():
    import hashlib

    from go_light_rag_ray.stages.mediadec import synthesize_pgm16

    ref = "media://doc-9/2"
    d = hashlib.md5(ref.encode()).digest()
    w, h, px = decode_image(synthesize_pgm16(ref))
    assert (w, h) == (4 + d[0] % 13, 4 + d[1] % 13)
    val = d[2] * 256 + d[7]
    assert image_features(px) == (val, val, val, 0)


def test_wav_multichunk_concatenates_in_order():
    from go_light_rag_ray.stages.mediadec import synthesize_wav

    s = np.array([5, -6, 7, -8, 9], np.int16)
    # hand-build a two-data-chunk RIFF: [5,-6] + [7,-8,9]
    fmt = struct.pack("<HHIIHH", 1, 1, 8000, 16000, 2, 16)
    body = (b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", 4) + s[:2].astype("<i2").tobytes()
            + b"data" + struct.pack("<I", 6) + s[2:].astype("<i2").tobytes())
    buf = b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body
    rate, ch, got = decode_wav_pcm(buf)
    assert np.array_equal(got, s)
    # synthesized multi-chunk == single-chunk sample stream
    for ref in ("media://doc-1/3", "media://doc-2/7", ""):
        _, _, one = decode_wav_pcm(synthesize_wav(ref))
        _, _, two = decode_wav_pcm(synthesize_wav(ref, n_chunks=2))
        _, _, many = decode_wav_pcm(synthesize_wav(ref, n_chunks=9999))
        assert np.array_equal(one, two) and np.array_equal(one, many)


@pytest.mark.parametrize("bad", [
    b"P5\n3 2\n65535\n" + b"\0" * 11,      # 16-bit raster truncated (needs 12)
    b"P6\n2 2\n65536\n" + b"\0" * 24,      # maxval out of spec
    b"P5\n2 2\n",                          # header ends mid-token stream
    b"P5\n# only a comment",               # comment then EOF
    b"P6\n2 -2\n255\n" + b"\0" * 12,       # negative height
    b"P6\nab cd\n255\n" + b"\0" * 12,      # non-numeric tokens
])
def test_corrupt_pnm_fuzz(bad):
    with pytest.raises(ValueError):
        decode_image(bad)


def test_featurizer_new_formats_strict_and_skip(ray_session):
    from go_light_rag_ray.stages.mediadec import synthesize_pgm16, synthesize_wav

    rows = pa.table({
        "doc_id": pa.array(["a", "b", "c", "d"], pa.string()),
        "span_index": pa.array([3, 4, 1, 2], pa.int32()),
        "kind": pa.array(["image", "audio", "image", "audio"], pa.string()),
        "media_ref": pa.array(["r1", "r2", "r3", "r4"], pa.string()),
        "payload": pa.array([
            synthesize_pgm16("r1"),
            synthesize_wav("r2", n_chunks=3),
            b"P5\n2 2\n65535\n\0\0\0",        # truncated 16-bit raster
            b"RIFF\x04\x00\x00\x00WAVE",      # chunkless RIFF
        ], pa.binary()),
    })
    import hashlib

    ds = ray.data.from_arrow(rows)
    out = {r["doc_id"]: r for r in ds.map_batches(
        RawMediaFeaturizer, fn_constructor_kwargs={"on_error": "skip"},
        batch_format="pyarrow", concurrency=1, batch_size=2).take_all()}
    assert set(out) == {"a", "b"}
    d1 = hashlib.md5(b"r1").digest()
    v = d1[2] * 256 + d1[7]
    assert (out["a"]["f0"], out["a"]["f3"]) == (v, 0)
    d2 = hashlib.md5(b"r2").digest()
    assert out["b"]["height"] == 16 + d2[5] % 64
    assert (out["b"]["f1"], out["b"]["f2"]) == (d2[6], d2[6])
    with pytest.raises(Exception):
        ds.map_batches(RawMediaFeaturizer, batch_format="pyarrow",
                       concurrency=1).take_all()
