"""Real media decode for dependency-free formats (no PIL / torchaudio).

``multimodal.MediaFeaturizer(backend="real")`` is environment-blocked
(PIL/av absent).  This module closes the gap for the formats that need
NO external library: binary PPM/PGM images (P6/P5), uncompressed 24-bit
BMP, and PCM-16 WAV — parsed with numpy + struct only.  The
``RawMediaFeaturizer`` actor stage consumes actual binary payloads and
emits the same ``MEDIA_FEATURES_SCHEMA`` as the fake backend, so the
Ray-side plumbing (span explode → actor pool → stable schema) is shared
and the decode itself is REAL, tested bytes-in → features-out.

Feature definition (integer-exact, so a SQL oracle can replicate it):
    f0, f1, f2 = floor mean of the R, G, B channel   (sum // count)
    f3         = max(f0,f1,f2) - min(f0,f1,f2)       (channel spread)
Audio (WAV): width = sample_rate // 100, height = n_frames,
    f0 = n_channels, f1 = floor mean |sample|, f2 = max |sample|, f3 = 0.

``synthesize_ppm`` builds a deterministic P6 payload from a media ref
(dimensions and constant channel values from the ref's md5 — the same
derivation family as the fake featurizer), which makes the END-TO-END
real-decode pipeline value-oracle-able: the oracle recomputes the
expected features from md5 arithmetic while the engine actually encodes
and then DECODES real PPM bytes (`media_decode` query).
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np
import pyarrow as pa

from .multimodal import MEDIA_FEATURES_SCHEMA

__all__ = ["decode_image", "decode_wav_pcm", "RawMediaFeaturizer",
           "synthesize_ppm", "synthesize_pgm16", "synthesize_wav",
           "image_features"]

_WS = b" \t\r\n"


def _pnm_tokens(buf: bytes, n: int) -> tuple[list[int], int]:
    """Read ``n`` ASCII integer tokens after the magic, skipping
    whitespace and ``#`` comment lines; returns (values, data_offset)
    where data_offset is the byte right after the single whitespace that
    terminates the last token (the PNM spec's raster start)."""
    vals: list[int] = []
    i = 2  # past magic
    while len(vals) < n:
        while i < len(buf) and buf[i] in _WS:
            i += 1
        if i < len(buf) and buf[i] == ord("#"):
            while i < len(buf) and buf[i] != ord("\n"):
                i += 1
            continue
        j = i
        while j < len(buf) and buf[j] not in _WS:
            j += 1
        if j == i:
            raise ValueError("truncated PNM header")
        try:
            vals.append(int(buf[i:j]))
        except ValueError as exc:
            raise ValueError(f"bad PNM header token {buf[i:j]!r}") from exc
        i = j
    if i >= len(buf) or buf[i] not in _WS:
        raise ValueError("PNM raster must follow a whitespace byte")
    return vals, i + 1


def decode_image(buf: bytes) -> tuple[int, int, np.ndarray]:
    """bytes → (width, height, HxWx3 uint8 array).

    Supports binary PPM (P6), binary PGM (P5, gray replicated to 3
    channels) and uncompressed 24-bit BMP (BITMAPINFOHEADER, bottom-up
    or top-down).  Raises ValueError on anything else or on truncation.
    """
    if len(buf) >= 2 and buf[:2] in (b"P6", b"P5"):
        ch = 3 if buf[:2] == b"P6" else 1
        (w, h, maxval), off = _pnm_tokens(buf, 3)
        if w <= 0 or h <= 0 or not (0 < maxval < 65536):
            raise ValueError(f"unsupported PNM geometry {w}x{h}/{maxval}")
        data = np.frombuffer(buf, np.uint8, offset=off)
        if maxval > 255:
            # 16-bit PNM: 2 bytes per sample, MOST significant first (spec)
            need = w * h * ch * 2
            if len(data) < need:
                raise ValueError("truncated PNM raster")
            flat = ((data[0:need:2].astype(np.uint16) << 8)
                    | data[1:need:2]).reshape(h, w, ch)
        else:
            need = w * h * ch
            if len(data) < need:
                raise ValueError("truncated PNM raster")
            flat = data[:need].reshape(h, w, ch)
        if ch == 1:
            flat = np.repeat(flat, 3, axis=2)
        return w, h, flat
    if len(buf) >= 54 and buf[:2] == b"BM":
        data_off, = struct.unpack_from("<I", buf, 10)
        w, h_signed = struct.unpack_from("<ii", buf, 18)
        bpp, = struct.unpack_from("<H", buf, 28)
        comp, = struct.unpack_from("<I", buf, 30)
        if bpp != 24 or comp != 0 or w <= 0 or h_signed == 0:
            raise ValueError(f"unsupported BMP (bpp={bpp}, comp={comp})")
        h = abs(h_signed)
        stride = (w * 3 + 3) // 4 * 4
        need = stride * h
        data = np.frombuffer(buf, np.uint8, offset=data_off)
        if len(data) < need:
            raise ValueError("truncated BMP raster")
        rows = data[:need].reshape(h, stride)[:, : w * 3].reshape(h, w, 3)
        if h_signed > 0:            # bottom-up storage
            rows = rows[::-1]
        return w, h, rows[:, :, ::-1]   # BGR → RGB
    raise ValueError("unknown image format (supported: P6/P5 PNM, 24-bit BMP)")


def decode_wav_pcm(buf: bytes) -> tuple[int, int, np.ndarray]:
    """bytes → (sample_rate, n_channels, int16 samples [frames×channels]).
    PCM-16 RIFF/WAVE only; raises ValueError otherwise."""
    if len(buf) < 12 or buf[:4] != b"RIFF" or buf[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    i = 12
    fmt = None
    data_parts: list[bytes] = []
    while i + 8 <= len(buf):
        cid = buf[i:i + 4]
        size, = struct.unpack_from("<I", buf, i + 4)
        body = buf[i + 8: i + 8 + size]
        if cid == b"fmt " and fmt is None:
            fmt = body
        elif cid == b"data":
            # streaming writers emit several data chunks — the sample
            # stream is their in-order concatenation
            data_parts.append(body)
        i += 8 + size + (size & 1)
    data = b"".join(data_parts) if data_parts else None
    if fmt is None or data is None or len(fmt) < 16:
        raise ValueError("missing fmt/data chunk")
    audio_fmt, n_ch, rate = struct.unpack_from("<HHI", fmt, 0)
    bits, = struct.unpack_from("<H", fmt, 14)
    if audio_fmt != 1 or bits != 16 or n_ch < 1:
        raise ValueError(f"unsupported WAV (fmt={audio_fmt}, bits={bits})")
    samples = np.frombuffer(data, "<i2")
    return rate, n_ch, samples


def image_features(px: np.ndarray) -> tuple[int, int, int, int]:
    """(f0, f1, f2, f3): floor channel means + channel spread —
    integer-exact (sum // count), replicable in SQL."""
    n = px.shape[0] * px.shape[1]
    means = [int(px[:, :, c].sum(dtype=np.int64)) // n for c in range(3)]
    return means[0], means[1], means[2], max(means) - min(means)


def synthesize_wav(ref: str, n_chunks: int = 1) -> bytes:
    """Deterministic mono PCM-16 WAV from a media ref: 8 kHz,
    16 + d[5]%64 frames of the constant sample d[6] (md5 bytes) — decoded
    features are md5 arithmetic a SQL oracle can recompute while the
    engine round-trips real RIFF/WAVE bytes.

    ``n_chunks > 1`` splits the SAME sample stream over that many ``data``
    chunks (the streaming-writer layout): the decoder concatenates them,
    so features are identical to the single-chunk payload — which keeps
    the oracle case shared."""
    d = hashlib.md5((ref or "").encode()).digest()
    n = 16 + d[5] % 64
    samples = np.full(n, d[6], "<i2").tobytes()
    fmt = struct.pack("<HHIIHH", 1, 1, 8000, 16000, 2, 16)
    body = b"fmt " + struct.pack("<I", len(fmt)) + fmt
    k = max(1, min(n_chunks, n))
    step = (len(samples) // 2 // k) * 2 or 2
    cuts = [*range(0, len(samples), step)][:k] + [len(samples)]
    for a, bnd in zip(cuts[:-1], cuts[1:]):
        part = samples[a:bnd]
        body += b"data" + struct.pack("<I", len(part)) + part
    return b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body


def synthesize_pgm16(ref: str) -> bytes:
    """Deterministic 16-bit binary PGM (P5, maxval 65535) from a media
    ref: dimensions 4+d0%13 × 4+d1%13, constant sample d2·256 + d7 stored
    big-endian per the PNM spec — decoded features (gray replicated to 3
    channels: f0=f1=f2=sample, f3=0) are md5 arithmetic for the oracle."""
    d = hashlib.md5((ref or "").encode()).digest()
    w, h = 4 + d[0] % 13, 4 + d[1] % 13
    val = d[2] * 256 + d[7]
    px = np.full((h, w), val, ">u2")
    header = b"P5\n# synthesized from " + (ref or "").encode() + b"\n" \
        + f"{w} {h}\n65535\n".encode()
    return header + px.tobytes()


def synthesize_ppm(ref: str) -> bytes:
    """Deterministic tiny P6 payload from a media ref: dimensions
    4+d0%13 × 4+d1%13, constant channels (d2, d3, d4) where d = md5(ref)
    bytes — so decoded features are md5 arithmetic a SQL oracle can
    recompute while the engine round-trips REAL image bytes.  A comment
    line in the header exercises the parser."""
    d = hashlib.md5((ref or "").encode()).digest()
    w, h = 4 + d[0] % 13, 4 + d[1] % 13
    px = np.empty((h, w, 3), np.uint8)
    px[:, :, 0], px[:, :, 1], px[:, :, 2] = d[2], d[3], d[4]
    header = b"P6\n# synthesized from " + (ref or "").encode() + b"\n" \
        + f"{w} {h}\n255\n".encode()
    return header + px.tobytes()


class RawMediaFeaturizer:
    """Actor-pool stage: (doc_id, span_index, kind, media_ref,
    payload: binary) → MEDIA_FEATURES_SCHEMA, decoding REAL bytes.

    Decode is inherently per-blob, so the loop is per payload with numpy
    doing the pixel math; pass a small ``batch_size`` to ``map_batches``
    when payloads are large (binary batches × concurrency must fit the
    worker heap).  ``on_error="raise"`` (default) propagates corrupt
    blobs; ``on_error="skip"`` drops them (resumable-ingest mode)."""

    def __init__(self, on_error: str = "raise") -> None:
        if on_error not in ("raise", "skip"):
            raise ValueError(f"on_error must be raise|skip, got {on_error!r}")
        self.on_error = on_error

    def __call__(self, b: pa.Table) -> pa.Table:
        payloads = b.column("payload").to_pylist()
        kinds = b.column("kind").to_pylist()
        keep, w, h, f = [], [], [], [[] for _ in range(4)]
        for i, (kind, buf) in enumerate(zip(kinds, payloads)):
            try:
                if kind == "audio":
                    rate, n_ch, samples = decode_wav_pcm(buf or b"")
                    a = np.abs(samples.astype(np.int64))
                    w.append(rate // 100)
                    h.append(len(samples) // n_ch)
                    f[0].append(n_ch)
                    f[1].append(int(a.sum()) // max(1, len(a)))
                    f[2].append(int(a.max(initial=0)))
                    f[3].append(0)
                else:
                    iw, ih, px = decode_image(buf or b"")
                    f0, f1, f2, f3 = image_features(px)
                    w.append(iw)
                    h.append(ih)
                    for k, v in enumerate((f0, f1, f2, f3)):
                        f[k].append(v)
            except ValueError:
                if self.on_error == "raise":
                    raise
                continue
            keep.append(i)
        idx = pa.array(keep, pa.int64())
        cols = {
            "doc_id": b.column("doc_id").take(idx),
            "span_index": b.column("span_index").take(idx),
            "kind": b.column("kind").take(idx),
            "media_ref": b.column("media_ref").take(idx),
            "width": pa.array(w, pa.int32()),
            "height": pa.array(h, pa.int32()),
        }
        for k in range(4):
            cols[f"f{k}"] = pa.array(f[k], pa.int32())
        return pa.Table.from_pydict(cols, schema=MEDIA_FEATURES_SCHEMA)
