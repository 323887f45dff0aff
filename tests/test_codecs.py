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
    assert sniff_format(b"\xff\xd8\xff\xe0jfif") == "jpeg"
    assert (decode_image(png) == a).all()
    # corrupt JPEG stream: real codec rejects it (→ operator fallback)
    with pytest.raises(ValueError, match="truncated JPEG"):
        decode_image(b"\xff\xd8\xff\xe0 jpeg bytes")
    with pytest.raises(ValueError, match="no stdlib codec"):
        decode_image(b"\x00\x01\x02\x03 unknown bytes")


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


# ---------------------------------------------------------------------------
# GIF
# ---------------------------------------------------------------------------

def _pal_frames(n_frames, h, w, n_colors=12, seed=7):
    rng = np.random.default_rng(seed)
    pal = rng.integers(0, 256, size=(n_colors, 3), dtype=np.uint8)
    return [pal[rng.integers(0, n_colors, size=(h, w))]
            for _ in range(n_frames)]


def test_gif_animated_roundtrip_and_times():
    from peri_spark.functions.codecs import decode_gif_frames, encode_gif
    frames = _pal_frames(5, 17, 23)
    g = encode_gif(frames, [100, 200, 0, 50, 300])
    from peri_spark.functions.codecs import sniff_format
    assert sniff_format(g) == "gif"
    dec = decode_gif_frames(g)
    # display-start times are the cumulative delays of PRIOR frames
    assert [t for t, _ in dec] == [0, 100, 300, 300, 350]
    for (_, got), want in zip(dec, frames):
        assert (got == want).all()


def test_gif_lzw_4096_table_clear_roundtrip():
    from peri_spark.functions.codecs import (_gif_lzw_decode,
                                             _gif_lzw_encode,
                                             decode_gif_frames, encode_gif)
    rng = np.random.default_rng(1)
    # 256-color noise forces the code table to 4096 → mid-stream clear
    pal = np.stack([np.arange(256)] * 3, axis=1).astype(np.uint8)
    big = pal[rng.integers(0, 256, size=(120, 130))]
    assert (decode_gif_frames(encode_gif([big], [100]))[0][1] == big).all()
    idx = rng.integers(0, 4, size=20000).tolist()
    assert _gif_lzw_decode(_gif_lzw_encode(idx, 2), 2) == idx


def test_gif_transparency_and_disposal_composite():
    """Hand-built 2-frame GIF: frame 2 is a 2x2 overlay at (1,1) whose
    transparent pixels must show frame 1 underneath; disposal=2 after
    frame 2 is irrelevant to the captured composites."""
    import struct as st

    from peri_spark.functions.codecs import (_gif_lzw_encode,
                                             decode_gif_frames)
    pal = [(255, 0, 0), (0, 255, 0), (0, 0, 255), (9, 9, 9)]
    out = bytearray(b"GIF89a")
    out += st.pack("<HHBBB", 4, 4, 0x80 | 1, 0, 0)   # 4x4, GCT of 4
    out += bytes(c for rgb in pal for c in rgb)
    def img_block(left, top, w, h, indices, gce=None):
        blk = bytearray()
        if gce is not None:
            blk += b"\x21\xf9\x04" + gce + b"\x00"
        blk += b"\x2c" + st.pack("<HHHHB", left, top, w, h, 0)
        blk.append(2)                                 # min code size
        lzw = _gif_lzw_encode(indices, 2)
        blk.append(len(lzw)); blk += lzw; blk += b"\x00"
        return blk
    # frame 1: full 4x4 of color 1, delay 100ms
    out += img_block(0, 0, 4, 4, [1] * 16,
                     gce=st.pack("<BHB", 0 << 2, 10, 0))
    # frame 2: 2x2 at (1,1) = [2, transparent(idx 3), 3-as-transparent?]
    # transparent idx=3, disposal=2, delay 100ms
    out += img_block(1, 1, 2, 2, [2, 3, 3, 2],
                     gce=st.pack("<BHB", (2 << 2) | 1, 10, 3))
    out += b"\x3b"
    dec = decode_gif_frames(bytes(out))
    assert len(dec) == 2 and [t for t, _ in dec] == [0, 100]
    f1, f2 = dec[0][1], dec[1][1]
    assert (f1 == (0, 255, 0)).all()
    assert tuple(f2[1, 1]) == (0, 0, 255)             # color 2 painted
    assert tuple(f2[1, 2]) == (0, 255, 0)             # transparent → f1
    assert tuple(f2[2, 1]) == (0, 255, 0)
    assert tuple(f2[2, 2]) == (0, 0, 255)
    assert tuple(f2[0, 0]) == (0, 255, 0)             # outside overlay


def test_gif_interlaced_frame_decodes():
    """Interlaced flag: rows arrive in 4-pass order and must be
    rearranged back."""
    import struct as st

    from peri_spark.functions.codecs import (_gif_lzw_encode,
                                             decode_gif_frames)
    h, w = 11, 3
    rng = np.random.default_rng(3)
    img = rng.integers(0, 4, size=(h, w))
    pal = [(0, 0, 0), (10, 10, 10), (20, 20, 20), (30, 30, 30)]
    # emit rows in interlace pass order
    order = ([r for r in range(0, h, 8)] + [r for r in range(4, h, 8)]
             + [r for r in range(2, h, 4)] + [r for r in range(1, h, 2)])
    seq = [int(v) for r in order for v in img[r]]
    out = bytearray(b"GIF89a")
    out += st.pack("<HHBBB", w, h, 0x80 | 1, 0, 0)
    out += bytes(c for rgb in pal for c in rgb)
    out += b"\x2c" + st.pack("<HHHHB", 0, 0, w, h, 0x40)  # interlaced
    out.append(2)
    lzw = _gif_lzw_encode(seq, 2)
    out.append(len(lzw)); out += lzw; out += b"\x00\x3b"
    got = decode_gif_frames(bytes(out))[0][1]
    expect = np.array(pal, dtype=np.uint8)[img]
    assert (got == expect).all()


def test_decode_image_gif_first_frame():
    from peri_spark.functions.codecs import decode_gif_frames, decode_image, encode_gif
    frames = _pal_frames(2, 6, 5, seed=9)
    g = encode_gif(frames, [50, 50])
    assert (decode_image(g) == frames[0]).all()


def test_wav_truncated_data_chunk_and_empty_raise():
    from peri_spark.functions.codecs import decode_wav, encode_wav_pcm16
    wav = encode_wav_pcm16(np.arange(100, dtype=np.int16), 8000)
    with pytest.raises(ValueError, match="truncated WAV data chunk"):
        decode_wav(wav[:-50])      # declared data size > available bytes
    with pytest.raises(ValueError, match="no samples"):
        decode_wav(encode_wav_pcm16(np.zeros(0, dtype=np.int16), 8000))


def test_gif_lzw_rejects_out_of_range_code():
    from peri_spark.functions.codecs import _gif_lzw_decode
    # min_code=2, width=3: clear(4)=0b100 then 7=0b111 → byte 0x3C;
    # code 7 exceeds the 6-entry table and is not the KwKwK code
    with pytest.raises(ValueError, match="corrupt LZW"):
        _gif_lzw_decode(b"\x3c", 2)


def test_gif_frame_overhanging_screen_is_clipped():
    """A 3x3 frame at (2,2) on a 4x4 screen: renderers clip; so do we."""
    import struct as st

    from peri_spark.functions.codecs import (_gif_lzw_encode,
                                             decode_gif_frames)
    pal = [(0, 0, 0), (255, 255, 255), (7, 7, 7), (8, 8, 8)]
    out = bytearray(b"GIF89a")
    out += st.pack("<HHBBB", 4, 4, 0x80 | 1, 0, 0)
    out += bytes(c for rgb in pal for c in rgb)
    out += b"\x2c" + st.pack("<HHHHB", 2, 2, 3, 3, 0)
    out.append(2)
    lzw = _gif_lzw_encode([1] * 9, 2)
    out.append(len(lzw)); out += lzw; out += b"\x00\x3b"
    frame = decode_gif_frames(bytes(out))[0][1]
    assert frame.shape == (4, 4, 3)
    assert (frame[2:, 2:] == 255).all()       # visible 2x2 painted
    assert (frame[:2, :] == 0).all()          # rest untouched


def test_encode_gif_rejects_mismatched_frame_shapes():
    from peri_spark.functions.codecs import encode_gif
    a = np.zeros((4, 4, 3), dtype=np.uint8)
    b = np.zeros((2, 2, 3), dtype=np.uint8)
    with pytest.raises(ValueError, match="share one"):
        encode_gif([a, b], [10, 10])


def _png_chunk(ctype, data):
    import struct as st
    import zlib as zl
    body = ctype + data
    return (st.pack(">I", len(data)) + body
            + st.pack(">I", zl.crc32(body) & 0xFFFFFFFF))


def test_png_paletted_with_and_without_trns():
    import struct as st
    import zlib as zl

    from peri_spark.functions.codecs import decode_png
    rng = np.random.default_rng(21)
    pal = rng.integers(0, 256, size=(5, 3), dtype=np.uint8)
    idx = rng.integers(0, 5, size=(7, 9)).astype(np.uint8)
    raw = b"".join(b"\x00" + idx[y].tobytes() for y in range(7))
    sig = b"\x89PNG\r\n\x1a\n"
    ihdr = st.pack(">IIBBBBB", 9, 7, 8, 3, 0, 0, 0)
    base = (sig + _png_chunk(b"IHDR", ihdr)
            + _png_chunk(b"PLTE", pal.tobytes()))
    tail = _png_chunk(b"IDAT", zl.compress(raw)) + _png_chunk(b"IEND", b"")
    out = decode_png(base + tail)
    assert out.shape == (7, 9, 3) and (out == pal[idx]).all()
    trns = bytes([0, 128, 255])  # alpha for palette entries 0-2
    out_a = decode_png(base + _png_chunk(b"tRNS", trns) + tail)
    assert out_a.shape == (7, 9, 4)
    assert (out_a[:, :, :3] == pal[idx]).all()
    expect_a = np.array([0, 128, 255, 255, 255], dtype=np.uint8)[idx]
    assert (out_a[:, :, 3] == expect_a).all()


def test_png_adam7_interlaced_roundtrip():
    import struct as st
    import zlib as zl

    from peri_spark.functions.codecs import _ADAM7, decode_png
    rng = np.random.default_rng(23)
    img = rng.integers(0, 256, size=(10, 13, 3), dtype=np.uint8)
    # serialize the 7 passes with filter-0 scanlines
    raw = bytearray()
    for x0, y0, dx, dy in _ADAM7:
        sub = img[y0::dy, x0::dx]
        for row in sub:
            raw += b"\x00" + row.tobytes()
    sig = b"\x89PNG\r\n\x1a\n"
    ihdr = st.pack(">IIBBBBB", 13, 10, 8, 2, 0, 0, 1)  # interlace=1
    png = (sig + _png_chunk(b"IHDR", ihdr)
           + _png_chunk(b"IDAT", zl.compress(bytes(raw)))
           + _png_chunk(b"IEND", b""))
    assert (decode_png(png) == img).all()


def test_bmp_32bit_bgra():
    import struct as st

    from peri_spark.functions.codecs import decode_bmp
    rng = np.random.default_rng(29)
    rgb = rng.integers(0, 256, size=(3, 5, 3), dtype=np.uint8)
    h, w = 3, 5
    bgra = np.dstack([rgb[:, :, ::-1],
                      np.full((h, w, 1), 200, dtype=np.uint8)])
    data = bgra[::-1].tobytes()                  # bottom-up, stride = w*4
    hdr = (b"BM" + st.pack("<IHHI", 54 + len(data), 0, 0, 54)
           + st.pack("<IiiHHIIiiII", 40, w, h, 1, 32, 0,
                     len(data), 0, 0, 0, 0))
    out = decode_bmp(hdr + data)
    assert out.shape == (3, 5, 3) and (out == rgb).all()
