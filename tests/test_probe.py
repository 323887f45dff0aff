"""Header-only media probing: every container format, no decode."""

import struct

import numpy as np
import pytest

from peri_spark.functions.codecs import (encode_avi_mjpeg, encode_gif,
                                         encode_jpeg, encode_png,
                                         encode_wav_pcm16)
from peri_spark.functions.probe import probe_media


def _rgb(h=24, w=32):
    g = np.random.default_rng(0).integers(0, 200, size=(h, w),
                                          dtype=np.uint8)
    return np.stack([g, g, g], axis=-1)


def _box(name, body):
    return struct.pack(">I", len(body) + 8) + name + body


def _mp4(ver=0):
    if ver == 0:
        mvhd = _box(b"mvhd", bytes(12) + struct.pack(">II", 1000, 5500)
                    + bytes(80))
        tkhd = _box(b"tkhd", bytes(76)
                    + struct.pack(">II", 640 << 16, 360 << 16))
    else:
        mvhd = _box(b"mvhd", b"\x01" + bytes(19)
                    + struct.pack(">IQ", 600, 3300) + bytes(80))
        tkhd = _box(b"tkhd", b"\x01" + bytes(87)
                    + struct.pack(">II", 1920 << 16, 1080 << 16))
    stsd = _box(b"stsd", bytes(8) + _box(b"avc1", bytes(70)))
    trak = _box(b"trak", tkhd + _box(b"mdia", _box(b"minf",
                                                   _box(b"stbl", stsd))))
    return _box(b"ftyp", b"isom" + bytes(8)) + _box(b"moov", mvhd + trak)


def test_probe_images():
    rgb = _rgb()
    assert probe_media(encode_png(rgb)) == {
        "format": "png", "width": 32, "height": 24}
    j = probe_media(encode_jpeg(rgb, 85))
    assert (j["format"], j["width"], j["height"], j["codec"]) \
        == ("jpeg", 32, 24, "baseline")
    p6 = b"P6\n# c\n32 24\n255\n" + bytes(32 * 24 * 3)
    assert probe_media(p6)["width"] == 32
    bmp = b"BM" + struct.pack("<IHHI", 26, 0, 0, 26) \
        + struct.pack("<Iii", 40, 32, 24)
    assert probe_media(bmp) == {"format": "bmp", "width": 32,
                                "height": 24}


def test_probe_gif_animation():
    gif = encode_gif([_rgb()] * 3, [100, 150, 200])
    info = probe_media(gif)
    assert info["frames"] == 3
    assert info["duration_ms"] == 450
    assert (info["width"], info["height"]) == (32, 24)


def test_probe_wav_duration():
    wav = encode_wav_pcm16(np.zeros(24000, dtype=np.int16), 16000)
    info = probe_media(wav)
    assert info["sample_rate"] == 16000 and info["channels"] == 1
    assert info["duration_ms"] == 1500


def test_probe_avi():
    info = probe_media(encode_avi_mjpeg([_rgb()] * 5, fps=10.0))
    assert info["codec"] == "MJPG" and info["frames"] == 5
    assert info["duration_ms"] == 500
    assert (info["width"], info["height"]) == (32, 24)


@pytest.mark.parametrize("ver,w,dur", [(0, 640, 5500), (1, 1920, 5500)])
def test_probe_mp4_box_walk(ver, w, dur):
    info = probe_media(_mp4(ver))
    assert info["format"] == "mp4"
    assert info["width"] == w
    assert info["duration_ms"] == dur


def test_probe_progressive_jpeg_reports_sof():
    enc = bytearray(encode_jpeg(_rgb(), 85))
    i = enc.find(b"\xff\xc0")
    enc[i + 1] = 0xC2
    # probe reads the header even though decode would refuse the scan
    assert probe_media(bytes(enc))["codec"] == "sof2"


def test_probe_errors():
    for bad in (None, b"", b"garbage", b"\x89PNG\r\n\x1a\n short"):
        with pytest.raises(ValueError):
            probe_media(bad)


def test_probe_metadata_operator(spark):
    from pyspark.sql import types as T
    from peri_spark.functions.probe import probe_metadata
    schema = T.StructType([
        T.StructField("media_id", T.LongType()),
        T.StructField("payload", T.BinaryType()),
    ])
    df = spark.createDataFrame([
        (1, bytearray(encode_png(_rgb()))),
        (2, bytearray(_mp4())),
        (3, bytearray(b"not media")),
        (4, None),
    ], schema)
    out = {r.media_id: r for r in probe_metadata(df).collect()}
    assert out[1].format == "png" and out[1].width == 32
    assert out[2].format == "mp4" and out[2].duration_ms == 5500 \
        and out[2].codec == "avc1"
    assert out[3].error is not None and out[3].format is None
    assert "null payload" in out[4].error


def test_probe_avi_with_audio():
    import numpy as np
    avi = encode_avi_mjpeg([_rgb()] * 2, fps=4.0,
                           audio=(np.zeros(800, dtype=np.int16), 8000))
    info = probe_media(avi)
    assert info["codec"] == "MJPG"
    assert info["sample_rate"] == 8000 and info["channels"] == 1


# --- hostile/corrupt header regressions (second review pass) --------------

def test_probe_implausible_png_dims_rejected():
    # IHDR claiming a ~4-billion-pixel-wide image: corrupt, not a dim
    hdr = (b"\x89PNG\r\n\x1a\n" + struct.pack(">I", 13) + b"IHDR"
           + struct.pack(">II", 0xFFFFFFF0, 24) + bytes(5) + bytes(4))
    with pytest.raises(ValueError, match="implausible"):
        probe_media(hdr)


def test_probe_negative_bmp_width_rejected():
    bmp = b"BM" + struct.pack("<IHHI", 26, 0, 0, 26) \
        + struct.pack("<Iii", 40, -32, 24)
    with pytest.raises(ValueError, match="implausible BMP"):
        probe_media(bmp)


def test_probe_gif_walk_capped():
    from peri_spark.functions.probe import _probe_gif
    gif = encode_gif([_rgb()] * 3, [100, 100, 100])
    # a 64-byte cap stops the frame walk but keeps header dims
    info = _probe_gif(gif, scan_limit=64)
    assert (info["width"], info["height"]) == (32, 24)
    assert "frames" not in info and "duration_ms" not in info


def test_probe_metadata_hostile_header_is_error_row(spark):
    from pyspark.sql import types as T
    from peri_spark.functions.probe import probe_metadata
    hdr = (b"\x89PNG\r\n\x1a\n" + struct.pack(">I", 13) + b"IHDR"
           + struct.pack(">II", 0xFFFFFFF0, 24) + bytes(5) + bytes(4))
    schema = T.StructType([T.StructField("media_id", T.LongType()),
                           T.StructField("payload", T.BinaryType())])
    df = spark.createDataFrame([(1, bytearray(hdr)),
                                (2, bytearray(encode_png(_rgb())))],
                               schema)
    out = {r.media_id: r for r in probe_metadata(df).collect()}
    # the hostile row errors; the batch survives and the good row lands
    assert out[1].error is not None and "implausible" in out[1].error
    assert out[2].width == 32 and out[2].error is None
