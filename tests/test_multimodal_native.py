"""Native (library-free) media decode: the BMP/PNG/WAV decoders must
round-trip their own standards-conforming encoders bit-exactly,
reproduce independently computed pixel/sample statistics through the
distributed mapInPandas lane, and fail loudly on malformed or
unsupported payloads. PNG chunk CRCs are verified with stdlib
zlib.crc32 and the deflate stream with stdlib zlib — independent of
the decoder's own arithmetic.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from saurav_nayak_recipe_etl_project_spark.operators.multimodal import (
    PNG_SIG,
    decode_bmp,
    decode_media_native,
    decode_png,
    decode_wav_pcm16,
    encode_bmp,
    encode_png,
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


def test_png_roundtrip_every_filter():
    # all five PNG row filters are valid encodings of the same image;
    # each exercises a distinct unfiltering recurrence in the decoder
    for row_filter in range(5):
        for seed, (h, w) in enumerate([(6, 5), (1, 1), (11, 17)]):
            img = _rng_img(10 * row_filter + seed, h, w)
            blob = encode_png(img, row_filter=row_filter)
            assert blob[:8] == PNG_SIG
            out = decode_png(blob)
            assert out.shape == (h, w, 3)
            assert np.array_equal(out, img), f"filter {row_filter}"


def test_png_structure_is_standard():
    # chunk walk with stdlib-only tools: signature, IHDR fields,
    # CRC32s, and a deflate stream that stdlib zlib inflates to the
    # spec's (stride+1)*h scanline bytes
    img = _rng_img(3, 4, 7)
    blob = encode_png(img, row_filter=4)
    assert blob[:8] == PNG_SIG
    pos, chunks = 8, []
    while pos < len(blob):
        size, ctype = struct.unpack_from(">I4s", blob, pos)
        body = blob[pos + 8: pos + 8 + size]
        crc = struct.unpack_from(">I", blob, pos + 8 + size)[0]
        assert zlib.crc32(ctype + body) == crc
        chunks.append((ctype, body))
        pos += 12 + size
    assert [c for c, _ in chunks] == [b"IHDR", b"IDAT", b"IEND"]
    w, h, depth, ct, comp, filt, inter = struct.unpack(
        ">IIBBBBB", chunks[0][1]
    )
    assert (w, h, depth, ct, comp, filt, inter) == (7, 4, 8, 2, 0, 0, 0)
    raw = zlib.decompress(chunks[1][1])
    assert len(raw) == (7 * 3 + 1) * 4


def test_png_rgba_alpha_dropped():
    # hand-build an 8-bit RGBA (color type 6) PNG with filter-0 rows;
    # the decoder must unfilter at bpp=4 and return the RGB planes
    rng = np.random.default_rng(5)
    rgba = rng.integers(0, 256, size=(3, 4, 4), dtype=np.uint8)
    raw = b"".join(b"\x00" + rgba[y].tobytes() for y in range(3))
    ihdr = struct.pack(">IIBBBBB", 4, 3, 8, 6, 0, 0, 0)

    def chunk(ctype, data):
        return (struct.pack(">I", len(data)) + ctype + data
                + struct.pack(">I", zlib.crc32(ctype + data)))

    blob = (PNG_SIG + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(raw)) + chunk(b"IEND", b""))
    out = decode_png(blob)
    assert np.array_equal(out, rgba[:, :, :3])


def test_png_fails_loudly():
    img = _rng_img(0, 3, 3)
    good = encode_png(img)
    with pytest.raises(ValueError, match="signature"):
        decode_png(b"XXXXXXXX" + good[8:])
    corrupt = bytearray(good)
    corrupt[20] ^= 0xFF  # flip an IHDR byte -> CRC mismatch
    with pytest.raises(ValueError, match="CRC"):
        decode_png(bytes(corrupt))
    pal = bytearray(good)
    pal[25] = 3  # color type -> palette
    pal[29:33] = struct.pack(
        ">I", zlib.crc32(bytes(pal[12:29]))
    )  # re-sign IHDR so the CRC gate passes and the TYPE gate fires
    with pytest.raises(ValueError, match="unsupported PNG"):
        decode_png(bytes(pal))


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
    for i in range(10, 14):
        img = _rng_img(200 + i, 3 + i, 20 - i)
        rows.append((i, bytearray(encode_png(img, row_filter=i % 5)),
                     "image/png"))
        m = img.reshape(-1, 3).mean(axis=0)
        truths[i] = ("png", img.shape, m)
    df = spark.createDataFrame(
        rows, "doc_id long, blob binary, mime string"
    ).repartition(4)
    got = {r["doc_id"]: r for r in decode_media_native(df).collect()}
    assert len(got) == 14
    for i, t in truths.items():
        r = got[i]
        if t[0] in ("bmp", "png"):
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
    # WebP is still the PIL-gated lane (baseline JPEG went native in
    # r11 — tests/test_jpeg_native.py), never silent
    df = spark.createDataFrame(
        [(1, bytearray(b"RIFF\x00\x00\x00\x00WEBP"), "image/webp")],
        "doc_id long, blob binary, mime string",
    )
    with pytest.raises(Exception, match="no native decoder"):
        decode_media_native(df).collect()
    # a truncated JPEG routes to the NATIVE decoder now and still
    # fails loudly there
    trunc = spark.createDataFrame(
        [(1, bytearray(b"\xff\xd8\xff\xe0"), "image/jpeg")],
        "doc_id long, blob binary, mime string",
    )
    with pytest.raises(Exception, match="truncated"):
        decode_media_native(trunc).collect()


def test_audio_frame_features_parseval_and_roundtrip(spark, sf_dir):
    """The Haar filterbank is energy-preserving (unnormalized:
    low + high == 2 * energy per frame), zero crossings are bounded
    by the frame length, and the readout is deterministic across
    runs (the RIFF round trip inside the operator is lossless)."""
    from pyspark.sql import functions as F

    from saurav_nayak_recipe_etl_project_spark.operators.multimodal import (
        AUDIO_FRAME,
        audio_frame_features,
        attach_blobs,
    )
    from saurav_nayak_recipe_etl_project_spark.sources.catalog import (
        load_table,
    )

    docs = load_table(spark, "documents", sf_dir).filter(
        F.length("text") > 0).limit(50)
    out = audio_frame_features(attach_blobs(docs))
    bad = out.filter(
        (F.col("low_energy") + F.col("high_energy"))
        != 2 * F.col("energy")).count()
    assert bad == 0
    assert out.filter(F.col("zero_crossings") >= AUDIO_FRAME).count() == 0
    a = sorted(tuple(r) for r in out.collect())
    b = sorted(tuple(r) for r in
               audio_frame_features(attach_blobs(docs)).collect())
    assert a == b and len(a) == 50 * 4
