"""Native (library-free) media decode: the BMP/WAV decoders must
round-trip their own standards-conforming encoders bit-exactly,
reproduce independently computed pixel/sample statistics through the
distributed mapInPandas lane, and fail loudly on malformed or
unsupported payloads.
"""

from __future__ import annotations

import numpy as np
import pytest

from saurav_nayak_recipe_etl_project_spark.operators.multimodal import (
    decode_bmp,
    decode_media_native,
    decode_wav_pcm16,
    encode_bmp,
    encode_wav_pcm16,
)


def _rng_img(seed, h, w):
    return np.random.default_rng(seed).integers(
        0, 256, size=(h, w, 3), dtype=np.uint8
    )


def test_bmp_roundtrip_exact():
    for seed, (h, w) in enumerate([(5, 7), (1, 1), (16, 3), (9, 32)]):
        img = _rng_img(seed, h, w)
        blob = encode_bmp(img)
        assert blob[:2] == b"BM"
        out = decode_bmp(blob)
        assert out.shape == (h, w, 3)
        assert np.array_equal(out, img)  # padding/BGR/bottom-up undone


def test_wav_roundtrip_exact():
    rng = np.random.default_rng(7)
    s = rng.integers(-(2**15), 2**15, size=1234, dtype=np.int16)
    rate, out = decode_wav_pcm16(encode_wav_pcm16(s, 8000))
    assert rate == 8000
    assert np.array_equal(out, s)
    # odd-sized chunk padding path: 1 sample = 2 bytes (even), so
    # splice a LIST chunk of odd size before data to walk alignment
    blob = encode_wav_pcm16(s[:3], 44100)
    head, rest = blob[:12], blob[12:]
    spliced = head + b"LIST\x03\x00\x00\x00abc\x00" + rest
    rate2, out2 = decode_wav_pcm16(spliced)
    assert rate2 == 44100 and np.array_equal(out2, s[:3])


def test_decode_media_native_distributed(spark):
    rows = []
    truths = {}
    for i in range(6):
        img = _rng_img(100 + i, 4 + i, 9 - i)
        rows.append((i, bytearray(encode_bmp(img)), "image/bmp"))
        m = img.reshape(-1, 3).mean(axis=0)
        truths[i] = ("bmp", img.shape, m)
    rng = np.random.default_rng(42)
    for i in range(6, 10):
        s = rng.integers(-(2**15), 2**15, size=50 * i, dtype=np.int16)
        rows.append((i, bytearray(encode_wav_pcm16(s)), "audio/wav"))
        truths[i] = ("wav", len(s),
                     float(np.sqrt((s.astype(np.float64) ** 2).mean())))
    df = spark.createDataFrame(
        rows, "doc_id long, blob binary, mime string"
    ).repartition(4)
    got = {r["doc_id"]: r for r in decode_media_native(df).collect()}
    assert len(got) == 10
    for i, t in truths.items():
        r = got[i]
        if t[0] == "bmp":
            assert (r["height"], r["width"]) == t[1][:2]
            assert abs(r["mean_r"] - t[2][0]) < 1e-9
            assert abs(r["mean_g"] - t[2][1]) < 1e-9
            assert abs(r["mean_b"] - t[2][2]) < 1e-9
            assert r["sample_rate"] is None
        else:
            assert r["n_samples"] == t[1]
            assert abs(r["rms"] - t[2]) < 1e-9
            assert r["sample_rate"] == 16000
            assert r["width"] is None


def test_decoders_fail_loudly():
    img = _rng_img(0, 3, 3)
    good = encode_bmp(img)
    with pytest.raises(ValueError, match="magic"):
        decode_bmp(b"XX" + good[2:])
    with pytest.raises(ValueError, match="truncated"):
        decode_bmp(good[:-4])
    with pytest.raises(ValueError, match="RIFF"):
        decode_wav_pcm16(b"not a wav at all")
    wav = bytearray(encode_wav_pcm16(np.zeros(4, dtype=np.int16)))
    wav[20] = 3  # fmt code -> IEEE float
    with pytest.raises(ValueError, match="unsupported WAV"):
        decode_wav_pcm16(bytes(wav))


def test_decode_media_native_rejects_unknown_mime(spark):
    df = spark.createDataFrame(
        [(1, bytearray(b"\x89PNG\r\n"), "image/png")],
        "doc_id long, blob binary, mime string",
    )
    with pytest.raises(Exception, match="no native decoder"):
        decode_media_native(df).collect()
