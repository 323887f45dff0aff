"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride as ``binary`` columns with a metadata struct.
The Spark-side plumbing — schemas, batch iteration via ``mapInPandas``,
partition sizing — is real and tested; the actual codec work is STUBBED
(``decode_stub``) because no image/audio libraries exist in this
container. Swap ``_decode_image_bytes`` for a PIL/ffmpeg call and nothing
else changes.

Scale notes: mapInPandas streams Arrow batches, so a 100 TB binary corpus
never materializes per-executor beyond one batch
(spark.sql.execution.arrow.maxRecordsPerBatch); repartition by size bucket
before heavy decode so batch wall-times stay uniform.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = ["MEDIA_SCHEMA", "attach_media_metadata", "decode_features_stub",
           "frame_sample_stub"]

MEDIA_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType()),
    T.StructField("kind", T.StringType()),        # image | audio | video
    T.StructField("payload", T.BinaryType()),
    T.StructField("meta", T.StructType([
        T.StructField("mime", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("duration_ms", T.LongType()),
    ])),
])


def attach_media_metadata(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Cheap JVM-side metadata: payload size + sha256 (no decode)."""
    return df.withColumn("payload_bytes", F.octet_length(F.col(payload_col))) \
             .withColumn("payload_sha256", F.sha2(F.col(payload_col), 256))


def _decode_image_bytes(payload: bytes, meta) -> list[float]:
    """STUB — deterministic fake 'decode' so the pipeline shape is testable.

    Real implementation: PIL.Image.open(io.BytesIO(payload)) → resize →
    np.asarray → feature extraction. Not available in this container.
    """
    if payload is None:
        raise ValueError("null payload")
    # deterministic 8-dim byte-histogram "feature" (stands in for a model)
    buckets = [0.0] * 8
    for b in payload[:4096]:
        buckets[b % 8] += 1.0
    total = sum(buckets) or 1.0
    return [round(x / total, 6) for x in buckets]


def decode_features_stub(df: DataFrame, payload_col: str = "payload",
                         id_col: str = "media_id",
                         batch_size_hint: int = 256) -> DataFrame:
    """mapInPandas feature extraction: (id, features array<double>, error).

    Errors are captured per row (never fail the batch) — a corrupt blob in
    a 100 TB corpus must not kill a 6-hour job.
    """
    out_schema = T.StructType([
        T.StructField("media_id", T.LongType()),
        T.StructField("features", T.ArrayType(T.DoubleType())),
        T.StructField("error", T.StringType()),
    ])

    def run(batches: Iterator) -> Iterator:
        import pandas as pd
        for pdf in batches:
            ids, feats, errs = [], [], []
            for mid, payload in zip(pdf[id_col], pdf[payload_col]):
                ids.append(mid)
                try:
                    feats.append(_decode_image_bytes(
                        bytes(payload) if payload is not None else None, None))
                    errs.append(None)
                except Exception as e:  # capture, don't fail the batch
                    feats.append(None)
                    errs.append(str(e))
            yield pd.DataFrame(
                {"media_id": ids, "features": feats, "error": errs})

    return (df.select(id_col, payload_col)
            .mapInPandas(run, schema=out_schema))


def frame_sample_stub(df: DataFrame, payload_col: str = "payload",
                      id_col: str = "media_id", every_ms: int = 1000) -> DataFrame:
    """Video frame sampling plumbing: one output row per sampled frame.

    STUB: emits deterministic frame offsets from meta.duration_ms; a real
    build would seek/decode via ffmpeg inside the same mapInPandas shape.
    """
    frames = F.sequence(
        F.lit(0), F.greatest(F.coalesce(F.col("meta.duration_ms"), F.lit(0))
                             - 1, F.lit(0)), F.lit(every_ms))
    return (df.select(F.col(id_col), F.explode(frames).alias("frame_ms"))
            .withColumn("frame_key",
                        F.concat_ws(":", F.col(id_col).cast("string"),
                                    F.col("frame_ms").cast("string"))))
