"""Multimodal operators under Structured Streaming: the mapInPandas
probe/decode/audio operators are stateless row transforms, so they run
unchanged over a file-source stream (availableNow trigger) — a media
ingestion pipeline can probe-filter and feature-extract in-stream
before anything lands in the corpus."""

import numpy as np
import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from peri_spark.functions.codecs import (encode_avi_mjpeg, encode_jpeg,
                                         encode_png, encode_wav_pcm16)


@pytest.fixture()
def media_dir(spark, tmp_path):
    src = str(tmp_path / "media_in")
    rng = np.random.default_rng(17)
    g = rng.integers(0, 200, size=(24, 32), dtype=np.uint8)
    rgb = np.stack([g, g, g], axis=-1)
    tone = (np.sin(np.arange(8000) / 8000.0 * 2 * np.pi * 440)
            * 12000).astype(np.int16)
    rows = [
        (1, bytearray(encode_png(rgb))),
        (2, bytearray(encode_jpeg(rgb, 85))),
        (3, bytearray(encode_wav_pcm16(tone, 8000))),
        (4, bytearray(encode_avi_mjpeg([rgb, rgb], fps=2.0,
                                       audio=(tone, 8000)))),
        (5, bytearray(b"not media at all")),
    ]
    schema = T.StructType([T.StructField("media_id", T.LongType()),
                           T.StructField("payload", T.BinaryType())])
    spark.createDataFrame(rows, schema).write.mode("overwrite") \
        .parquet(src)
    return src


def _read_stream(spark, src):
    batch = spark.read.parquet(src)
    return spark.readStream.schema(batch.schema).parquet(src)


def _drain(stream, name):
    q = (stream.writeStream.format("memory").queryName(name)
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(120)


def test_probe_metadata_in_stream(spark, media_dir):
    from peri_spark.functions.probe import probe_metadata
    _drain(probe_metadata(_read_stream(spark, media_dir)),
           "media_probe_stream")
    out = {r.media_id: r
           for r in spark.sql("select * from media_probe_stream")
           .collect()}
    assert out[1].format == "png" and out[1].width == 32
    assert out[2].format == "jpeg"
    assert out[3].format == "wav" and out[3].sample_rate == 8000
    assert out[4].format == "avi" and out[4].codec == "MJPG"
    assert out[5].error is not None
    # batch parity: the same operator over a static read agrees
    static = {r.media_id: r
              for r in probe_metadata(
                  spark.read.parquet(media_dir)).collect()}
    for k, r in out.items():
        assert (r.format, r.width, r.height) == \
            (static[k].format, static[k].width, static[k].height)


def test_decode_features_in_stream_filtered_by_probe(spark, media_dir):
    from peri_spark.functions.multimodal import decode_features
    # the streaming shape of a real pipeline: decode features in-stream,
    # only rows that decode (images) yield non-null features
    _drain(decode_features(_read_stream(spark, media_dir)),
           "media_decode_stream")
    rows = {r.media_id: r
            for r in spark.sql("select * from media_decode_stream")
            .collect()}
    assert rows[1].error is None and len(rows[1].features) == 8
    assert rows[2].error is None
    # real pixel dims lead the image feature vectors
    assert (rows[1].features[0], rows[1].features[1]) == (32.0, 24.0)
    # non-image payloads keep the schema: histogram fallback, arity 8
    assert rows[5].error is None and len(rows[5].features) == 8
    assert rows[4].error is None and len(rows[4].features) == 8
