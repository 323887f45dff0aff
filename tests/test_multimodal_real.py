"""Multimodal operators with REAL stdlib codecs: decode dispatch, true
resize, WAV audio features — plus the documented fallback for formats
without a pure-stdlib codec (JPEG et al.)."""

import numpy as np
import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from peri_spark.functions.codecs import (decode_png, encode_png,
                                         encode_wav_pcm16, resize_nearest)


def _media_df(spark, rows):
    schema = T.StructType([
        T.StructField("media_id", T.LongType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField("meta", T.StructType([
            T.StructField("mime", T.StringType()),
            T.StructField("width", T.IntegerType()),
            T.StructField("height", T.IntegerType()),
            T.StructField("duration_ms", T.LongType()),
        ])),
    ])
    return spark.createDataFrame(rows, schema)


def _img(h, w, seed=0):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)


def test_decode_features_real_png_vs_fallback(spark):
    from peri_spark.functions.multimodal import decode_features
    a = _img(10, 8, seed=1)
    png = encode_png(a)
    jpegish = b"\xff\xd8\xff\xe0" + bytes(range(200))
    df = _media_df(spark, [
        (1, bytearray(png), ("image/png", 8, 10, None)),
        (2, bytearray(jpegish), ("image/jpeg", None, None, None)),
        (3, None, (None, None, None, None)),
    ])
    out = {r.media_id: r for r in decode_features(df).collect()}
    # real decode: first three dims are w, h, c; stats match numpy
    f = out[1].features
    assert out[1].error is None
    assert f[0] == 8.0 and f[1] == 10.0 and f[2] == 3.0
    assert f[3] == pytest.approx(float(a.mean()) / 255.0, abs=1e-6)
    assert f[4] == pytest.approx(float(a.std()) / 255.0, abs=1e-6)
    # no stdlib JPEG codec → deterministic byte-histogram fallback
    assert out[2].error is None
    assert len(out[2].features) == 8
    assert sum(out[2].features) == pytest.approx(1.0, abs=1e-4)
    # null payload → captured per-row error, batch survives
    assert out[3].features is None and "null payload" in out[3].error


def test_resize_images_real_png_roundtrip(spark):
    from peri_spark.functions.multimodal import resize_images
    a = _img(40, 60, seed=2)
    df = _media_df(spark, [(1, bytearray(encode_png(a)),
                            ("image/png", 60, 40, None))])
    r = resize_images(df, 30, 30).collect()[0]
    assert r.error is None
    assert (r.width, r.height) == (30, 20)  # aspect-fit inside 30x30
    back = decode_png(bytes(r.payload))
    assert back.shape == (20, 30, 3)
    assert (back == resize_nearest(a, 30, 30)).all()


def test_resize_images_fallback_for_unknown_format(spark):
    from peri_spark.functions.multimodal import resize_images
    payload = b"\xff\xd8\xff\xe0" + bytes(1000)  # JPEG-ish, no codec
    df = _media_df(spark, [(7, bytearray(payload),
                            ("image/jpeg", 100, 50, None))])
    r = resize_images(df, 50, 50).collect()[0]
    # documented fallback: metadata rewritten, payload byte-budgeted
    assert r.error is None
    assert (r.width, r.height) == (50, 25)
    assert len(r.payload) == max(int(len(payload) * (50 * 25) / (100 * 50)), 1)


def test_audio_features_wav(spark):
    from peri_spark.functions.multimodal import audio_features
    t = np.arange(16000, dtype=np.float64) / 16000.0
    tone = (np.sin(2 * np.pi * 440 * t) * 20000).astype(np.int16)
    wav = encode_wav_pcm16(tone, 16000)
    df = _media_df(spark, [
        (1, bytearray(wav), ("audio/wav", None, None, None)),
        (2, bytearray(b"not audio"), (None, None, None, None)),
    ])
    out = {r.media_id: r for r in audio_features(df).collect()}
    r1 = out[1]
    assert r1.error is None
    assert r1.duration_ms == 1000 and r1.rate_hz == 16000
    assert r1.n_channels == 1
    expected_rms = float(np.sqrt((tone.astype(np.float64) ** 2).mean()))
    assert r1.rms == pytest.approx(expected_rms, rel=1e-6)
    # 440 Hz sine crosses zero ~880 times/sec
    assert r1.zero_crossing_rate == pytest.approx(880.0 / 16000.0, rel=0.01)
    assert out[2].error is not None


def test_stub_aliases_still_importable(spark):
    """API continuity: the round-2/3 *_stub names keep working."""
    from peri_spark.functions.multimodal import (decode_features_stub,
                                                 resize_stub)
    a = _img(6, 6, seed=3)
    df = _media_df(spark, [(1, bytearray(encode_png(a)),
                            ("image/png", 6, 6, None))])
    assert decode_features_stub(df).count() == 1
    assert resize_stub(df, 3, 3).count() == 1


def test_frame_sample_animated_gif(spark):
    from peri_spark.functions.codecs import decode_gif_frames, encode_gif
    from peri_spark.functions.multimodal import frame_sample
    rng = np.random.default_rng(11)
    pal = rng.integers(0, 256, size=(8, 3), dtype=np.uint8)
    frames = [pal[rng.integers(0, 8, size=(9, 12))] for _ in range(4)]
    g = encode_gif(frames, [100, 100, 100, 100])   # starts 0,100,200,300
    static = encode_gif([frames[0]], [0])
    df = _media_df(spark, [
        (1, bytearray(g), ("image/gif", 12, 9, 400)),
        (2, bytearray(static), ("image/gif", 12, 9, None)),
        (3, bytearray(b"\x00\x00\x00\x18ftypmp42"), ("video/mp4", None, None, 5000)),
        (4, None, (None, None, None, None)),
    ])
    out = frame_sample(df, every_ms=150).collect()
    anim = sorted([r for r in out if r.media_id == 1],
                  key=lambda r: r.frame_ms)
    # ts = 0,150,300 → on-screen frames 0, 1, 3
    assert [r.frame_ms for r in anim] == [0, 150, 300]
    for r, fidx in zip(anim, (0, 1, 3)):
        assert r.error is None and (r.width, r.height) == (12, 9)
        assert (decode_png(bytes(r.payload)) == frames[fidx]).all()
    stat = [r for r in out if r.media_id == 2]
    assert len(stat) == 1 and stat[0].frame_ms == 0
    assert (decode_png(bytes(stat[0].payload)) == frames[0]).all()
    mp4 = [r for r in out if r.media_id == 3]
    assert len(mp4) == 1 and "no stdlib frame codec" in mp4[0].error
    nul = [r for r in out if r.media_id == 4]
    assert len(nul) == 1 and "null payload" in nul[0].error


def test_decode_and_resize_accept_gif(spark):
    from peri_spark.functions.codecs import encode_gif
    from peri_spark.functions.multimodal import decode_features, resize_images
    rng = np.random.default_rng(13)
    pal = rng.integers(0, 256, size=(6, 3), dtype=np.uint8)
    img = pal[rng.integers(0, 6, size=(20, 30))]
    g = encode_gif([img], [0])
    df = _media_df(spark, [(1, bytearray(g), ("image/gif", 30, 20, None))])
    f = decode_features(df).collect()[0]
    assert f.error is None and f.features[:3] == [30.0, 20.0, 3.0]
    r = resize_images(df, 15, 15).collect()[0]
    assert r.error is None and (r.width, r.height) == (15, 10)
    assert decode_png(bytes(r.payload)).shape == (10, 15, 3)


def test_unsupported_variant_falls_back_not_errors(spark):
    """Sniffed-but-undecodable payloads (32-bit BMP, corrupt PNG) keep
    the pre-codec fallback contract: histogram features / byte-budget
    resize with error=None — the schema never forks mid-corpus."""
    from peri_spark.functions.multimodal import decode_features, resize_images
    bmp32 = b"BM" + bytes(100)                   # undecodable BMP-sniffed
    bad_png = b"\x89PNG\r\n\x1a\n" + bytes(30)   # corrupt PNG-sniffed
    df = _media_df(spark, [
        (1, bytearray(bmp32), ("image/bmp", 10, 10, None)),
        (2, bytearray(bad_png), ("image/png", 8, 4, None)),
    ])
    feats = {r.media_id: r for r in decode_features(df).collect()}
    for mid in (1, 2):
        assert feats[mid].error is None
        assert len(feats[mid].features) == 8     # histogram arity
    rs = {r.media_id: r for r in resize_images(df, 5, 5).collect()}
    assert rs[1].error is None and (rs[1].width, rs[1].height) == (5, 5)
    assert rs[2].error is None and (rs[2].width, rs[2].height) == (5, 2)


def test_audio_features_empty_wav_is_error_row(spark):
    from peri_spark.functions.multimodal import audio_features
    empty = encode_wav_pcm16(np.zeros(0, dtype=np.int16), 8000)
    df = _media_df(spark, [(1, bytearray(empty), ("audio/wav", None, None, None))])
    r = audio_features(df).collect()[0]
    assert r.error is not None and "no samples" in r.error
    assert r.rms is None                          # never NaN


def test_decode_features_real_jpeg(spark):
    from peri_spark.functions.multimodal import decode_features
    from peri_spark.functions.codecs import decode_jpeg, encode_jpeg
    a = _img(24, 18, seed=5)
    enc = encode_jpeg(a, quality=90)
    df = _media_df(spark, [(1, bytearray(enc),
                            ("image/jpeg", 18, 24, None))])
    r = decode_features(df).collect()[0]
    assert r.error is None
    f = r.features
    # real pixel stats over the LOSSY decode (not the source array)
    dec = decode_jpeg(enc).astype(np.float64)
    assert (f[0], f[1], f[2]) == (18.0, 24.0, 3.0)
    assert f[3] == pytest.approx(float(dec.mean()) / 255.0, abs=1e-6)
    assert f[4] == pytest.approx(float(dec.std()) / 255.0, abs=1e-6)


def test_resize_images_jpeg_stays_jpeg(spark):
    from peri_spark.functions.multimodal import resize_images
    from peri_spark.functions.codecs import (decode_jpeg, encode_jpeg,
                                             sniff_format)
    a = _img(40, 60, seed=6)
    df = _media_df(spark, [(1, bytearray(encode_jpeg(a, quality=90)),
                            ("image/jpeg", 60, 40, None))])
    r = resize_images(df, 30, 30).collect()[0]
    assert r.error is None
    assert (r.width, r.height) == (30, 20)        # aspect-fit
    assert sniff_format(bytes(r.payload)) == "jpeg"
    back = decode_jpeg(bytes(r.payload))
    assert back.shape == (20, 30, 3)


def test_frame_sample_mjpeg_avi(spark):
    from peri_spark.functions.multimodal import frame_sample
    from peri_spark.functions.codecs import decode_png, encode_avi_mjpeg

    def fr(i):
        y, x = np.mgrid[0:16, 0:20]
        return np.stack([(x * 2 + i * 30) % 256, (y * 4) % 256,
                         ((x + y)) % 256], axis=-1).astype(np.uint8)

    frames = [fr(i) for i in range(4)]          # 4 fps → 0,250,500,750ms
    avi = encode_avi_mjpeg(frames, fps=4.0, quality=92)
    df = _media_df(spark, [
        (1, bytearray(avi), ("video/x-msvideo", 20, 16, 1000)),
        (2, bytearray(b"\x00\x00\x00\x18ftypmp42"), ("video/mp4", None, None, None)),
    ])
    rows = frame_sample(df, every_ms=500).collect()
    ok = sorted([r for r in rows if r.media_id == 1],
                key=lambda r: r.frame_ms)
    # clip spans [0, 750]: samples at 0 and 500 → frames 0 and 2
    assert [r.frame_ms for r in ok] == [0, 500]
    assert all(r.error is None for r in ok)
    for r, want in zip(ok, (frames[0], frames[2])):
        got = decode_png(bytes(r.payload))
        assert got.shape == (16, 20, 3)
        assert np.abs(got.astype(int) - want.astype(int)).mean() < 5
    err = [r for r in rows if r.media_id == 2]
    assert len(err) == 1 and "no stdlib frame codec" in err[0].error


def test_audio_features_from_avi(spark):
    from peri_spark.functions.multimodal import audio_features
    from peri_spark.functions.codecs import encode_avi_mjpeg
    t = np.arange(8000, dtype=np.float64) / 8000.0
    tone = (np.sin(2 * np.pi * 440 * t) * 20000).astype(np.int16)
    frame = _img(16, 16, seed=9)
    avi = encode_avi_mjpeg([frame, frame], fps=2.0, audio=(tone, 8000))
    df = _media_df(spark, [(1, bytearray(avi),
                            ("video/x-msvideo", 16, 16, 1000))])
    r = audio_features(df).collect()[0]
    assert r.error is None
    assert r.rate_hz == 8000 and r.n_channels == 1
    assert r.duration_ms == 1000
    assert r.rms == pytest.approx(20000 / np.sqrt(2), rel=0.01)


def test_partition_for_decode_sizes_and_clusters(spark):
    from peri_spark.functions.multimodal import partition_for_decode
    from pyspark.sql import types as T
    rng = np.random.default_rng(13)
    rows = [(i, bytearray(bytes(int(size))))
            for i, size in enumerate([100] * 40 + [1_000_000] * 6)]
    rows.append((99, None))
    schema = T.StructType([T.StructField("media_id", T.LongType()),
                           T.StructField("payload", T.BinaryType())])
    df = spark.createDataFrame(rows, schema)
    out = partition_for_decode(df, target_mb_per_partition=2,
                               min_partitions=3)
    assert out.count() == 47                   # row-preserving
    assert out.rdd.getNumPartitions() >= 3
    # size-clustering: the big payloads land together, apart from the
    # small ones (range partitioning on octet_length)
    sizes_by_part = (out.rdd.mapPartitions(
        lambda it: [sorted({0 if r.payload is None
                            else len(r.payload) for r in it})])
        .collect())
    for sizes in sizes_by_part:
        assert len(sizes) <= 2                 # never a wide size mix
    # executed plan uses range partitioning, not round robin
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "rangepartitioning" in plan.lower()


def test_partition_for_decode_identical_sizes_still_spread(spark):
    from peri_spark.functions.multimodal import partition_for_decode
    from pyspark.sql import types as T
    # 60 identical-size payloads: one size class, but the hash
    # sub-buckets must still spread them (the range-on-size design
    # collapsed this corpus into a single partition)
    rows = [(i, bytearray(bytes([i % 251]) * 100_000))
            for i in range(60)]
    schema = T.StructType([T.StructField("media_id", T.LongType()),
                           T.StructField("payload", T.BinaryType())])
    df = spark.createDataFrame(rows, schema)
    out = partition_for_decode(df, target_mb_per_partition=1)
    assert out.count() == 60
    counts = (out.rdd.mapPartitions(lambda it: [sum(1 for _ in it)])
              .collect())
    nonempty = [c for c in counts if c]
    assert len(nonempty) >= 4          # ~6 MB corpus / 1 MB target
    assert max(nonempty) <= 30         # no single-partition collapse
