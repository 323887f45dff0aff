"""Pure-stdlib media codecs: roundtrips and format edges (no Spark)."""

import struct
import zlib

import numpy as np
import pytest

from peri_spark.functions.codecs import (decode_bmp, decode_image,
                                         decode_png, decode_ppm, decode_wav,
                                         encode_png, encode_wav_pcm16,
                                         resize_nearest, sniff_format)


def _img(h=13, w=17, c=3, seed=7):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=(h, w, c), dtype=np.uint8)


def test_png_roundtrip_rgb_and_gray_and_alpha():
    for c in (1, 2, 3, 4):
        a = _img(c=c, seed=c)
        b = decode_png(encode_png(a))
        assert b.shape == a.shape and (b == a).all()


def test_png_decodes_all_filter_types():
    """Hand-build a PNG using filters 1-4 (encode_png only emits 0)."""
    a = _img(h=4, w=6, c=3, seed=3)
    stride, bpp = 6 * 3, 3
    prev = np.zeros(stride, dtype=np.int32)
    raw = b""
    for y, ftype in enumerate([1, 2, 3, 4]):
        line = a[y].reshape(-1).astype(np.int32)
        enc = np.empty(stride, dtype=np.int32)
        for x in range(stride):
            left = line[x - bpp] if x >= bpp else 0
            up = prev[x]
            ul = prev[x - bpp] if x >= bpp else 0
            if ftype == 1:
                pred = left
            elif ftype == 2:
                pred = up
            elif ftype == 3:
                pred = (left + up) >> 1
            else:
                p = left + up - ul
                pa, pb, pc = abs(p - left), abs(p - up), abs(p - ul)
                pred = left if pa <= pb and pa <= pc else \
                    (up if pb <= pc else ul)
            enc[x] = (line[x] - pred) & 0xFF
        raw += bytes([ftype]) + enc.astype(np.uint8).tobytes()
        prev = line

    def chunk(ctype, data):
        body = ctype + data
        return (struct.pack(">I", len(data)) + body
                + struct.pack(">I", zlib.crc32(body) & 0xFFFFFFFF))

    payload = (b"\x89PNG\r\n\x1a\n"
               + chunk(b"IHDR", struct.pack(">IIBBBBB", 6, 4, 8, 2, 0, 0, 0))
               + chunk(b"IDAT", zlib.compress(raw))
               + chunk(b"IEND", b""))
    out = decode_png(payload)
    assert (out == a).all()


def test_png_rejects_bad_depth_and_truncation():
    a = _img()
    good = encode_png(a)
    with pytest.raises(ValueError):
        decode_png(b"NOTAPNG" + good)
    bad_depth = bytearray(good)
    bad_depth[24] = 16  # IHDR bit-depth byte
    # CRC is not re-verified; depth check fires first
    with pytest.raises(ValueError, match="bit depth"):
        decode_png(bytes(bad_depth))


def test_bmp_decode_bottom_up_with_padding():
    """5-px-wide 24-bit BMP: stride pads to 16 bytes; stored bottom-up."""
    a = _img(h=3, w=5, c=3, seed=11)
    stride = (5 * 3 + 3) & ~3
    rows = b""
    for y in range(2, -1, -1):               # bottom-up
        line = a[y][:, ::-1].tobytes()       # RGB → BGR
        rows += line + b"\x00" * (stride - len(line))
    header = (b"BM" + struct.pack("<IHHI", 54 + len(rows), 0, 0, 54)
              + struct.pack("<IiiHHIIiiII", 40, 5, 3, 1, 24, 0,
                            len(rows), 0, 0, 0, 0))
    out = decode_bmp(header + rows)
    assert out.shape == (3, 5, 3) and (out == a).all()


def test_ppm_p6_and_pgm_p5_with_comment():
    a = _img(h=4, w=3, c=3, seed=5)
    p6 = b"P6\n# a comment\n3 4\n255\n" + a.tobytes()
    assert (decode_ppm(p6) == a).all()
    g = _img(h=2, w=7, c=1, seed=6)
    p5 = b"P5 7 2 255\n" + g.tobytes()
    assert (decode_ppm(p5) == g).all()


def test_wav_roundtrip_mono_and_stereo():
    rng = np.random.default_rng(9)
    mono = rng.integers(-32768, 32767, size=2000, dtype=np.int16)
    s, rate = decode_wav(encode_wav_pcm16(mono, 16000))
    assert rate == 16000 and s.shape == (2000, 1) and (s[:, 0] == mono).all()
    stereo = rng.integers(-32768, 32767, size=(500, 2), dtype=np.int16)
    s2, r2 = decode_wav(encode_wav_pcm16(stereo, 44100))
    assert r2 == 44100 and (s2 == stereo).all()


def test_sniff_and_dispatch():
    a = _img(h=2, w=2)
    png = encode_png(a)
    assert sniff_format(png) == "png"
    assert sniff_format(b"RIFF\x00\x00\x00\x00WAVE") == "wav"
    assert sniff_format(b"\xff\xd8\xff\xe0jfif") is None  # JPEG: no codec
    assert (decode_image(png) == a).all()
    with pytest.raises(ValueError, match="no stdlib codec"):
        decode_image(b"\xff\xd8\xff\xe0 jpeg bytes")


def test_resize_nearest_fit_and_exact():
    a = _img(h=40, w=60, c=3)
    fit = resize_nearest(a, 30, 30)           # aspect-fit: 30x20
    assert fit.shape == (20, 30, 3)
    up = resize_nearest(a, 120, 120)          # never upscales under fit
    assert up.shape == (40, 60, 3)
    exact = resize_nearest(a, 7, 5, fit=False)
    assert exact.shape == (5, 7, 3)
    # downscale by exact 2x == strided sampling
    half = resize_nearest(a, 30, 20, fit=False)
    assert (half == a[::2, ::2]).all()
