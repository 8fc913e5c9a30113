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
