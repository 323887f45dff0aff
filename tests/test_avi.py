"""MJPEG AVI container codec tests (pure stdlib+numpy, no Spark)."""

import numpy as np
import pytest

from peri_spark.functions.codecs import (decode_avi_frames,
                                         encode_avi_mjpeg, sniff_format)


def _frame(i, h=24, w=32):
    y, x = np.mgrid[0:h, 0:w]
    return np.stack([(x * 3 + i * 20) % 256, (y * 5) % 256,
                     ((x + y) * 2) % 256], axis=-1).astype(np.uint8)


def test_roundtrip_timestamps_and_pixels():
    frames = [_frame(i) for i in range(5)]
    avi = encode_avi_mjpeg(frames, fps=4.0, quality=90)
    assert sniff_format(avi) == "avi"
    dec = decode_avi_frames(avi)
    assert [t for t, _ in dec] == [0, 250, 500, 750, 1000]
    for (_, d), orig in zip(dec, frames):
        assert d.shape == (24, 32, 3)
        assert np.abs(d.astype(int) - orig.astype(int)).mean() < 5


def test_single_frame_and_odd_dims():
    dec = decode_avi_frames(encode_avi_mjpeg([_frame(0, h=17, w=31)],
                                             fps=10.0))
    assert len(dec) == 1 and dec[0][0] == 0
    assert dec[0][1].shape == (17, 31, 3)


def test_rejects_non_avi_and_truncated():
    with pytest.raises(ValueError, match="not an AVI"):
        decode_avi_frames(b"RIFF\x00\x00\x00\x00WAVE")
    avi = encode_avi_mjpeg([_frame(0)], fps=10.0)
    with pytest.raises(ValueError):
        decode_avi_frames(avi[:60])


def test_rejects_non_mjpeg_handler():
    avi = bytearray(encode_avi_mjpeg([_frame(0)], fps=10.0))
    i = avi.find(b"vidsMJPG")
    assert i > 0
    avi[i + 4:i + 8] = b"H264"
    with pytest.raises(ValueError, match="handler"):
        decode_avi_frames(bytes(avi))


def test_empty_and_mismatched_encode_rejected():
    with pytest.raises(ValueError, match="at least one"):
        encode_avi_mjpeg([], fps=10.0)
    with pytest.raises(ValueError, match="share one shape"):
        encode_avi_mjpeg([_frame(0, h=8, w=8), _frame(1, h=9, w=8)],
                         fps=10.0)


def test_idx1_ignored_sequential_scan():
    # corrupt the idx1 chunk body — frames must still decode
    avi = bytearray(encode_avi_mjpeg([_frame(i) for i in range(3)],
                                     fps=10.0))
    i = avi.find(b"idx1")
    avi[i + 8:i + 12] = b"\xff\xff\xff\xff"
    assert len(decode_avi_frames(bytes(avi))) == 3


# --- externally-shaped stream variants (review regressions) ---------------

def _chunk(fcc, body):
    import struct
    return fcc + struct.pack("<I", len(body)) + body \
        + (b"\x00" if len(body) & 1 else b"")


def _rebuild_movi(avi, new_body):
    """Swap the movi LIST's body (after the 'movi' kind) and fix sizes."""
    import struct
    i = avi.find(b"movi") - 8
    (old_size,) = struct.unpack_from("<I", avi, i + 4)
    old_total = 8 + old_size + (old_size & 1)
    new = avi[:i] + _chunk(b"LIST", b"movi" + new_body) + avi[i + old_total:]
    return new[:4] + __import__("struct").pack("<I", len(new) - 8) + new[8:]


def test_dropped_frame_slots_keep_timestamps():
    from peri_spark.functions.avi import scan_avi_frames
    avi = encode_avi_mjpeg([_frame(0), _frame(1)], fps=10.0)
    j0, j1 = [j for _, j in scan_avi_frames(avi)]
    # frame0, dropped slot, frame1: frame1 appears at 200ms, not 100ms
    body = _chunk(b"00dc", j0) + _chunk(b"00dc", b"") + _chunk(b"00dc", j1)
    dec = decode_avi_frames(_rebuild_movi(avi, body))
    assert [t for t, _ in dec] == [0, 200]


def test_rec_list_grouping_with_dropped_frame():
    from peri_spark.functions.avi import scan_avi_frames
    avi = encode_avi_mjpeg([_frame(0), _frame(1)], fps=10.0)
    j0, j1 = [j for _, j in scan_avi_frames(avi)]
    rec = _chunk(b"LIST", b"rec " + _chunk(b"00dc", j0)
                 + _chunk(b"00dc", b"") + _chunk(b"00dc", j1))
    dec = decode_avi_frames(_rebuild_movi(avi, rec))
    assert [t for t, _ in dec] == [0, 200]
    assert dec[0][1].shape == (24, 32, 3)


def test_scan_does_not_decode():
    from peri_spark.functions.avi import scan_avi_frames
    frames = [_frame(i) for i in range(3)]
    avi = encode_avi_mjpeg(frames, fps=10.0)
    scanned = scan_avi_frames(avi)
    assert all(isinstance(j, bytes) and j[:3] == b"\xff\xd8\xff"
               for _, j in scanned)


def test_audio_stream_roundtrip():
    from peri_spark.functions.avi import decode_avi_audio, scan_avi_frames
    rng = np.random.default_rng(3)
    tone = rng.integers(-20000, 20000, size=(4000, 2), dtype=np.int16)
    avi = encode_avi_mjpeg([_frame(i) for i in range(3)], fps=10.0,
                           audio=(tone, 16000))
    s, rate = decode_avi_audio(avi)
    assert rate == 16000 and s.shape == (4000, 2) and (s == tone).all()
    # video stream untouched by the interleaved audio chunk
    assert len(scan_avi_frames(avi)) == 3


def test_audio_stream_missing_or_compressed():
    from peri_spark.functions.avi import decode_avi_audio
    plain = encode_avi_mjpeg([_frame(0)], fps=10.0)
    with pytest.raises(ValueError, match="no PCM audio"):
        decode_avi_audio(plain)
    withau = bytearray(encode_avi_mjpeg([_frame(0)], fps=10.0,
                                        audio=(np.zeros(100, np.int16),
                                               8000)))
    i = withau.find(b"auds")
    # strf follows strh: flip wFormatTag 1 -> 85 (MP3)
    j = withau.find(b"strf", i)
    withau[j + 8] = 85
    with pytest.raises(ValueError, match="format tag"):
        decode_avi_audio(bytes(withau))


def test_audio_zero_channels_is_valueerror():
    from peri_spark.functions.avi import decode_avi_audio
    avi = bytearray(encode_avi_mjpeg([_frame(0)], fps=10.0,
                                     audio=(np.zeros(64, np.int16),
                                            8000)))
    i = avi.find(b"strf", avi.find(b"auds"))
    avi[i + 10:i + 12] = (0).to_bytes(2, "little")   # nChannels = 0
    with pytest.raises(ValueError):
        decode_avi_audio(bytes(avi))


def test_audio_skips_compressed_stream_to_pcm():
    # stream layout: auds MP3 (tag 85) first, then auds PCM16 — the
    # decoder must keep walking to the decodable stream
    import struct as _s
    from peri_spark.functions.avi import decode_avi_audio

    def chunk(fcc, body):
        return fcc + _s.pack("<I", len(body)) + body \
            + (b"\x00" if len(body) & 1 else b"")

    def lst(kind, body):
        return chunk(b"LIST", kind + body)

    tone = np.arange(100, dtype=np.int16)
    strh_a = b"auds" + bytes(4) + _s.pack(
        "<IHHIIIIIIII4h", 0, 0, 0, 0, 1, 8000, 0, 100, 200,
        0xFFFFFFFF, 2, 0, 0, 0, 0)
    strf_mp3 = _s.pack("<HHIIHH", 85, 1, 8000, 16000, 2, 16)
    strf_pcm = _s.pack("<HHIIHH", 1, 1, 8000, 16000, 2, 16)
    avih = _s.pack("<14I", 100000, 0, 0, 0x10, 0, 0, 2, 0, 0, 0,
                   0, 0, 0, 0)
    hdrl = lst(b"hdrl", chunk(b"avih", avih)
               + lst(b"strl", chunk(b"strh", strh_a)
                     + chunk(b"strf", strf_mp3))
               + lst(b"strl", chunk(b"strh", strh_a)
                     + chunk(b"strf", strf_pcm)))
    movi = lst(b"movi", chunk(b"01wb", tone.tobytes()))
    body = b"AVI " + hdrl + movi
    avi = b"RIFF" + _s.pack("<I", len(body)) + body
    s, rate = decode_avi_audio(avi)
    assert rate == 8000 and (s[:, 0] == tone).all()
