"""Baseline JPEG codec (operators/jpeg_native.py): round trips vs the
standards-conforming encoder across 4:4:4 / 4:2:0 / grayscale /
restart-marker streams, a HAND-BUILT single-block fixture that pins
the bit-level format (canonical Huffman codes, zigzagged DQT, marker
layout) independently of the encoder, loud failures on
progressive/truncated/16-bit payloads, and the distributed
decode_media_native lane.
"""

from __future__ import annotations

import struct

import numpy as np
import pytest

from saurav_nayak_recipe_etl_project_spark.operators.jpeg_native import (
    _AC_L,
    _DC_L,
    _QL_BASE,
    _ZIGZAG,
    decode_jpeg,
    encode_jpeg,
)


def _gradient(h, w):
    """Smooth test image: JPEG is built for this; quantization error
    stays small so the round-trip bound is tight and meaningful."""
    y = np.linspace(0, 255, h)[:, None]
    x = np.linspace(0, 255, w)[None, :]
    r = y * np.ones_like(x)
    g = np.ones_like(y) * x
    b = (y + x) / 2
    return np.clip(np.stack([r, g, b], axis=-1), 0, 255).astype(np.uint8)


def test_flat_color_roundtrip_tight():
    img = np.full((16, 24, 3), (90, 140, 200), dtype=np.uint8)
    out = decode_jpeg(encode_jpeg(img, quality=90))
    assert out.shape == img.shape
    # flat image -> DC-only blocks; error is just DC quantization +
    # color-convert rounding
    assert np.abs(out.astype(int) - img.astype(int)).max() <= 4


def test_gradient_roundtrip_444():
    for h, w in [(8, 8), (17, 23), (32, 48)]:
        img = _gradient(h, w)
        out = decode_jpeg(encode_jpeg(img, quality=95))
        assert out.shape == (h, w, 3)
        err = np.abs(out.astype(int) - img.astype(int))
        assert err.mean() <= 3.0, (h, w, err.mean())
        assert err.max() <= 20, (h, w, err.max())


def test_gradient_roundtrip_420_subsampled():
    img = _gradient(33, 47)  # forces luma/chroma edge padding
    out = decode_jpeg(encode_jpeg(img, quality=95, subsample=True))
    assert out.shape == img.shape
    err = np.abs(out.astype(int) - img.astype(int))
    assert err.mean() <= 4.0, err.mean()
    assert err.max() <= 40, err.max()  # chroma is 2x2-averaged


def test_grayscale_roundtrip():
    g = _gradient(24, 16)[:, :, 0]
    out = decode_jpeg(encode_jpeg(g, quality=95))
    assert out.shape == (24, 16, 3)
    assert np.array_equal(out[:, :, 0], out[:, :, 1])  # replicated
    err = np.abs(out[:, :, 0].astype(int) - g.astype(int))
    assert err.mean() <= 2.0, err.mean()
    assert err.max() <= 12, err.max()


def test_restart_markers_roundtrip():
    img = _gradient(32, 64)
    plain = encode_jpeg(img, quality=90)
    rst = encode_jpeg(img, quality=90, restart_interval=2)
    assert b"\xff\xdd" in rst and b"\xff\xdd" not in plain  # DRI present
    assert b"\xff\xd0" in rst                               # RST0 present
    assert np.array_equal(decode_jpeg(rst), decode_jpeg(plain))


def _huff_bits(bits, huffval, symbol):
    """Independent canonical-code derivation for the fixture (spec
    C.2, re-implemented in the test so a transcription slip in the
    module's table constants cannot self-confirm)."""
    code, k = 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            if huffval[k] == symbol:
                return format(code, f"0{length}b")
            code += 1
            k += 1
        code <<= 1
    raise AssertionError(f"symbol {symbol} not in table")


def test_hand_built_single_block_fixture():
    """A baseline JPEG built BYTE BY BYTE in the test: one 8x8
    grayscale block, DC diff 0, immediate EOB -> every pixel must
    decode to exactly 128. Pins marker layout, zigzag DQT storage,
    canonical Huffman assignment, scan padding, and the level shift
    without touching encode_jpeg."""
    q = np.array(_QL_BASE, dtype=np.uint8)          # quality-50 table
    zz = q[np.array(_ZIGZAG)]                       # raster -> zigzag
    # DC size-0 symbol then AC EOB, padded with 1-bits to a byte
    bits = _huff_bits(*_DC_L, 0) + _huff_bits(*_AC_L, 0x00)
    bits += "1" * (-len(bits) % 8)
    scan = bytes(int(bits[i:i + 8], 2) for i in range(0, len(bits), 8))
    blob = (
        b"\xff\xd8"
        + b"\xff\xdb" + struct.pack(">HB", 67, 0) + zz.tobytes()
        + b"\xff\xc0" + struct.pack(">HBHHB", 11, 8, 8, 8, 1)
        + bytes([1, 0x11, 0])
        + b"\xff\xc4" + struct.pack(">HB", 19 + len(_DC_L[1]), 0x00)
        + bytes(_DC_L[0]) + bytes(_DC_L[1])
        + b"\xff\xc4" + struct.pack(">HB", 19 + len(_AC_L[1]), 0x10)
        + bytes(_AC_L[0]) + bytes(_AC_L[1])
        + b"\xff\xda" + struct.pack(">HB", 8, 1) + bytes([1, 0x00])
        + bytes([0, 63, 0])
        + scan
        + b"\xff\xd9"
    )
    out = decode_jpeg(blob)
    assert out.shape == (8, 8, 3)
    assert np.all(out == 128), out[:, :, 0]


def test_fill_bytes_before_markers_are_skipped():
    """T.81 B.1.1.2: 0xFF fill bytes may pad before any marker — a
    conforming third-party stream with padding must decode identically
    (r11 review finding: the parser raised 'marker 0xFFFF')."""
    img = _gradient(16, 16)
    blob = encode_jpeg(img, quality=90)
    # inject fill bytes before the SOF0 marker
    i = blob.find(b"\xff\xc0")
    padded = blob[:i] + b"\xff\xff\xff" + blob[i:]
    assert np.array_equal(decode_jpeg(padded), decode_jpeg(blob))


def test_decode_fails_loudly():
    img = _gradient(16, 16)
    blob = bytearray(encode_jpeg(img, quality=90))
    # progressive frame marker
    prog = bytes(blob).replace(b"\xff\xc0", b"\xff\xc2", 1)
    with pytest.raises(ValueError, match="progressive"):
        decode_jpeg(prog)
    # truncation (EOI gone)
    with pytest.raises(ValueError):
        decode_jpeg(bytes(blob[:-4]))
    # not a JPEG at all
    with pytest.raises(ValueError, match="SOI"):
        decode_jpeg(b"\x89PNG\r\n\x1a\nnope")
    # 16-bit quantization table precision
    i = bytes(blob).find(b"\xff\xdb")
    hacked = bytearray(blob)
    hacked[i + 4] = 0x10                       # pq=1 (16-bit)
    with pytest.raises(ValueError, match="16-bit"):
        decode_jpeg(bytes(hacked))


def test_decode_media_native_jpeg_lane(spark):
    from saurav_nayak_recipe_etl_project_spark.operators.multimodal import (
        decode_media_native,
    )

    img = _gradient(24, 32)
    rows = [
        (1, bytearray(encode_jpeg(img, quality=95)), "image/jpeg"),
        (2, bytearray(encode_jpeg(img[:, :, 0], quality=95)),
         "image/jpeg"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, blob binary, mime string")
    got = {r["doc_id"]: r for r in decode_media_native(df).collect()}
    assert got[1]["width"] == 32 and got[1]["height"] == 24
    m = img.reshape(-1, 3).mean(axis=0)
    assert abs(got[1]["mean_r"] - m[0]) <= 3
    assert abs(got[1]["mean_g"] - m[1]) <= 3
    assert abs(got[1]["mean_b"] - m[2]) <= 3
    # grayscale jpeg decodes with replicated channels
    assert abs(got[2]["mean_r"] - got[2]["mean_b"]) < 1e-9


def test_multi_scan_sos_rejected_loudly():
    """ADVICE r11: a baseline JPEG whose SOS lists FEWER components
    than the SOF (legal multi-scan sequential form) must raise the
    documented ValueError, not KeyError mid-setup."""
    img = _gradient(16, 16)
    blob = bytes(encode_jpeg(img, quality=90))
    i = blob.find(b"\xff\xda")
    # original SOS payload: len(2) ns(1)=3 then 3×(cid, tabs) + 3 tail
    # bytes; rebuild it listing only the FIRST component (ns=1)
    ns = blob[i + 4]
    assert ns == 3
    comp0 = blob[i + 5:i + 7]
    tail = blob[i + 5 + 2 * ns:i + 5 + 2 * ns + 3]
    new_payload = bytes([1]) + comp0 + tail
    new_len = struct.pack(">H", 2 + len(new_payload))
    hacked = (blob[:i + 2] + new_len + new_payload
              + blob[i + 5 + 2 * ns + 3:])
    with pytest.raises(ValueError, match="multi-scan"):
        decode_jpeg(hacked)


def test_truncated_segment_header_rejected_loudly():
    """ADVICE r11: a stream cut mid-segment-header (or a segment whose
    declared length overruns the buffer) raises ValueError, never
    struct.error."""
    img = _gradient(16, 16)
    blob = bytes(encode_jpeg(img, quality=90))
    i = blob.find(b"\xff\xc0")
    # cut right after the SOF0 marker bytes: no room for the length
    with pytest.raises(ValueError, match="truncated"):
        decode_jpeg(blob[:i + 2])
    # keep the length field but cut inside the declared payload
    with pytest.raises(ValueError, match="truncated inside segment"):
        decode_jpeg(blob[:i + 5])
    # fill bytes pushing the length field past the buffer end: the
    # loop-top pos+4 guard can't see it, the header bounds check must
    with pytest.raises(ValueError, match="truncated in segment header"):
        decode_jpeg(blob[:i] + b"\xff\xff\xff\xff\xc0")
