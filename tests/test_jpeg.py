"""JPEG codec tests, baseline + progressive (pure stdlib+numpy).

The codec backs `codecs.decode_image` for the most common scraped-corpus
image format; these tests pin the roundtrip error bounds, the sampling /
restart-marker variants, the progressive (SOF2) decoder's pixel-exact
parity with baseline decode of the same quantized coefficients, and the
strict rejection of streams outside both (arithmetic → ValueError →
multimodal operators fall back).
"""

import numpy as np
import pytest

from peri_spark.functions.jpeg import (decode_jpeg, encode_jpeg,
                                       encode_jpeg_progressive)
from peri_spark.functions.codecs import decode_image, sniff_format


def _rgb(h, w):
    y, x = np.mgrid[0:h, 0:w]
    return np.stack([(x * 4) % 256, (y * 5) % 256, ((x + y) * 3) % 256],
                    axis=-1).astype(np.uint8)


@pytest.mark.parametrize("h,w", [(1, 1), (7, 9), (16, 16), (45, 62)])
@pytest.mark.parametrize("subsample", [False, True])
def test_roundtrip_rgb(h, w, subsample):
    img = _rgb(h, w)
    enc = encode_jpeg(img, quality=85, subsample=subsample)
    assert sniff_format(enc) == "jpeg"
    dec = decode_jpeg(enc)
    assert dec.shape == (h, w, 3) and dec.dtype == np.uint8
    # smooth-gradient content: lossy error stays small
    assert np.abs(dec.astype(int) - img.astype(int)).mean() < 12


def test_quality_monotone():
    img = _rgb(45, 62)
    errs, sizes = [], []
    for q in (30, 60, 90):
        enc = encode_jpeg(img, quality=q)
        sizes.append(len(enc))
        errs.append(np.abs(decode_jpeg(enc).astype(int)
                           - img.astype(int)).mean())
    assert sizes[0] < sizes[2]          # higher quality → bigger stream
    assert errs[0] > errs[2]            # …and lower error


def test_grayscale_roundtrip():
    y, x = np.mgrid[0:33, 0:41]
    g = ((x * 3 + y * 2) % 256).astype(np.uint8)
    dec = decode_jpeg(encode_jpeg(g, quality=90))
    assert dec.shape == (33, 41, 1)
    assert np.abs(dec[:, :, 0].astype(int) - g.astype(int)).mean() < 3


def test_restart_intervals():
    img = _rgb(50, 70)
    plain = decode_jpeg(encode_jpeg(img, 85, subsample=True))
    rst = decode_jpeg(encode_jpeg(img, 85, subsample=True,
                                  restart_interval=3))
    # restart markers change the stream, not the decoded pixels
    assert (plain == rst).all()


def test_decode_image_dispatches_jpeg():
    img = _rgb(12, 10)
    dec = decode_image(encode_jpeg(img, quality=95))
    assert dec.shape == (12, 10, 3)
    assert np.abs(dec.astype(int) - img.astype(int)).mean() < 3


def test_arithmetic_rejected():
    enc = bytearray(encode_jpeg(_rgb(16, 16), 85))
    i = enc.find(b"\xff\xc0")
    enc[i + 1] = 0xC9  # SOF0 → SOF9 (arithmetic sequential)
    with pytest.raises(ValueError, match="non-baseline"):
        decode_jpeg(bytes(enc))


def _textured(h, w, c=3, seed=7):
    rng = np.random.RandomState(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    base = (128 + 90 * np.sin(xx / 7.0) * np.cos(yy / 11.0))[:, :, None]
    img = np.clip(base + rng.randint(-25, 25, (h, w, c)),
                  0, 255).astype(np.uint8)
    return img if c > 1 else img[:, :, 0]


@pytest.mark.parametrize("h,w,c,sub", [
    (16, 16, 1, False), (24, 17, 1, False), (32, 32, 3, False),
    (40, 33, 3, True), (19, 45, 3, "422")])
def test_progressive_matches_baseline_exactly(h, w, c, sub):
    """SOF2 transmits the same quantized coefficients as SOF0, so the
    decodes must be PIXEL-IDENTICAL — any refinement-bit or EOB-run
    bug in the progressive decoder breaks exact equality somewhere."""
    img = _textured(h, w, c)
    base = decode_jpeg(encode_jpeg(img, 85, sub))
    prog = decode_jpeg(encode_jpeg_progressive(img, 85, sub))
    assert np.array_equal(base, prog)


def test_progressive_scan_script_variants():
    img = _textured(48, 41, 3)
    base = decode_jpeg(encode_jpeg(img, 85, True))
    # restart markers inside progressive scans
    assert np.array_equal(base, decode_jpeg(
        encode_jpeg_progressive(img, 85, True, restart_interval=3)))
    # spectral selection only (no successive approximation)
    sc = [((0, 1, 2), 0, 0, 0, 0), ((0,), 1, 63, 0, 0),
          ((1,), 1, 63, 0, 0), ((2,), 1, 63, 0, 0)]
    assert np.array_equal(base, decode_jpeg(
        encode_jpeg_progressive(img, 85, True, scans=sc)))
    # deep successive approximation (3 refinement passes on luma AC)
    sc = [((0, 1, 2), 0, 0, 0, 3), ((0, 1, 2), 0, 0, 1, 2),
          ((0, 1, 2), 0, 0, 1, 1), ((0, 1, 2), 0, 0, 1, 0),
          ((0,), 1, 63, 0, 3), ((0,), 1, 63, 3, 2),
          ((0,), 1, 63, 2, 1), ((0,), 1, 63, 1, 0),
          ((1,), 1, 63, 0, 2), ((1,), 1, 63, 2, 1), ((1,), 1, 63, 1, 0),
          ((2,), 1, 63, 0, 1), ((2,), 1, 63, 1, 0)]
    assert np.array_equal(base, decode_jpeg(
        encode_jpeg_progressive(img, 85, True, scans=sc)))


def test_progressive_bands_sa_restart_422():
    img = _textured(30, 55, 3, seed=11)
    base = decode_jpeg(encode_jpeg(img, 70, "422"))
    sc = [((0, 1, 2), 0, 0, 0, 1),
          ((0,), 1, 2, 0, 1), ((0,), 3, 10, 0, 1), ((0,), 11, 63, 0, 1),
          ((1,), 1, 63, 0, 0), ((2,), 1, 63, 0, 0),
          ((0, 1, 2), 0, 0, 1, 0),
          ((0,), 1, 2, 1, 0), ((0,), 3, 10, 1, 0), ((0,), 11, 63, 1, 0)]
    assert np.array_equal(base, decode_jpeg(encode_jpeg_progressive(
        img, 70, "422", scans=sc, restart_interval=2)))


def test_progressive_gray_restart_every_block():
    g = _textured(25, 25, 1)
    assert np.array_equal(
        decode_jpeg(encode_jpeg(g, 60)),
        decode_jpeg(encode_jpeg_progressive(g, 60, restart_interval=1)))


def test_progressive_through_decode_image():
    """codecs.decode_image dispatches progressive JPEG transparently."""
    img = _textured(20, 20, 3)
    assert np.array_equal(
        decode_image(encode_jpeg(img, 85)),
        decode_image(encode_jpeg_progressive(img, 85)))


def test_truncated_rejected():
    enc = encode_jpeg(_rgb(16, 16), 85)
    with pytest.raises(ValueError):
        decode_jpeg(enc[:40])
    with pytest.raises(ValueError):
        decode_jpeg(b"\xff\xd8\xff\xe0 jpeg bytes")


# --- externally-shaped stream variants (review regressions) ---------------

def test_fill_bytes_before_marker_accepted():
    # T.81 B.1.1.2: any number of 0xFF fill bytes may precede a marker
    img = _rgb(16, 16)
    enc = encode_jpeg(img, quality=90)
    i = enc.find(b"\xff\xda")           # pad just before SOS
    padded = enc[:i] + b"\xff\xff\xff" + enc[i:]
    dec = decode_jpeg(padded)
    assert np.abs(dec.astype(int) - img.astype(int)).mean() < 3


def test_truncated_dht_raises_valueerror():
    enc = bytearray(encode_jpeg(_rgb(16, 16), 85))
    i = enc.find(b"\xff\xc4")
    # shrink the DHT segment length so the bits array is cut short
    enc[i + 2:i + 4] = (10).to_bytes(2, "big")
    with pytest.raises(ValueError):
        decode_jpeg(bytes(enc))


def test_scan_component_mismatch_raises_valueerror():
    enc = bytearray(encode_jpeg(_rgb(16, 16), 85))
    i = enc.find(b"\xff\xda")
    enc[i + 5] = 9          # first scan component id: 1 → 9 (not in SOF)
    with pytest.raises(ValueError, match="omits|corrupt"):
        decode_jpeg(bytes(enc))


def test_huffman_lut_cached_across_decodes():
    from peri_spark.functions.jpeg import _huff_lut
    before = _huff_lut.cache_info().hits
    decode_jpeg(encode_jpeg(_rgb(8, 8), 85))
    decode_jpeg(encode_jpeg(_rgb(9, 9), 85))
    assert _huff_lut.cache_info().hits > before


@pytest.mark.parametrize("h,w", [(7, 9), (16, 16), (45, 61)])
def test_422_roundtrip(h, w):
    # exercises the decoder's (2, 1) sampling path, which 444/420
    # fixtures never hit
    img = _rgb(h, w)
    enc = encode_jpeg(img, quality=90, subsample="422")
    dec = decode_jpeg(enc)
    assert dec.shape == (h, w, 3)
    assert np.abs(dec.astype(int) - img.astype(int)).mean() < 12


def test_unknown_subsample_mode_rejected():
    with pytest.raises(ValueError, match="subsampling"):
        encode_jpeg(_rgb(8, 8), subsample="411")
