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
           "resize_stub", "frame_sample_stub"]

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


def resize_stub(df: DataFrame, target_w: int, target_h: int,
                payload_col: str = "payload",
                id_col: str = "media_id") -> DataFrame:
    """Image-resize plumbing: (id, payload, meta', error) with meta
    width/height rewritten to the target box (aspect preserved —
    fit-inside), payload re-emitted at the proportional byte budget.

    STUB codec: the "resampled" payload is the original byte stream
    truncated to ``ceil(len · target_area / source_area)`` bytes —
    deterministic, size-plausible, and exercising the real contract
    (binary in → smaller binary out + corrected metadata) so batch
    sizing, schema, and error capture are all testable. A real build
    replaces ``_resize_bytes`` with PIL ``Image.resize`` and nothing
    else changes.
    """
    out_schema = T.StructType([
        T.StructField("media_id", T.LongType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("error", T.StringType()),
    ])

    def _resize_bytes(payload: bytes, w, h):
        if payload is None:
            raise ValueError("null payload")
        if not w or not h or w <= 0 or h <= 0:
            raise ValueError(f"bad source dims {w}x{h}")
        scale = min(target_w / w, target_h / h, 1.0)  # never upscale
        nw, nh = max(int(w * scale), 1), max(int(h * scale), 1)
        keep = max(int(len(payload) * (nw * nh) / (w * h)), 1)
        return payload[:keep], nw, nh

    def run(batches: Iterator) -> Iterator:
        import pandas as pd
        for pdf in batches:
            ids, outs, ws, hs, errs = [], [], [], [], []
            for mid, payload, w, h in zip(pdf[id_col], pdf[payload_col],
                                          pdf["__w"], pdf["__h"]):
                ids.append(mid)
                try:
                    p, nw, nh = _resize_bytes(
                        bytes(payload) if payload is not None else None,
                        None if pd.isna(w) else int(w),
                        None if pd.isna(h) else int(h))
                    outs.append(p)
                    ws.append(nw)
                    hs.append(nh)
                    errs.append(None)
                except Exception as e:  # capture, don't fail the batch
                    outs.append(None)
                    ws.append(None)
                    hs.append(None)
                    errs.append(str(e))
            yield pd.DataFrame({"media_id": ids, "payload": outs,
                                "width": ws, "height": hs, "error": errs})

    return (df.select(F.col(id_col), F.col(payload_col),
                      F.col("meta.width").alias("__w"),
                      F.col("meta.height").alias("__h"))
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
