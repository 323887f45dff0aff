"""Multimodal columns: opaque binary payloads + typed metadata, with
REAL stdlib codecs where the format allows.

Images/audio/video ride as ``binary`` columns with a metadata struct.
The Spark-side plumbing — schemas, batch iteration via ``mapInPandas``,
partition sizing, per-row error capture — is real and tested. Codec
work dispatches on magic bytes (``codecs.sniff_format``):

- PNG / BMP / PPM-PGM / GIF / baseline-JPEG images: REAL decode, true
  nearest-neighbor resize, re-encode (pure stdlib ``zlib``/``struct``
  + numpy — ``functions/codecs.py``, ``functions/jpeg.py``).
- WAV audio: REAL PCM16 decode → duration/rms/zero-crossing features.
- Progressive JPEG / MP4 / everything else: the documented
  deterministic fallback (byte-histogram features, byte-budget
  "resize") — those variants genuinely need PIL/ffmpeg, absent in this
  container. Swap the fallback branch for a PIL/ffmpeg call and
  nothing else changes.

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

__all__ = ["MEDIA_SCHEMA", "attach_media_metadata", "decode_features",
           "decode_features_stub", "resize_images", "resize_stub",
           "audio_features", "frame_sample", "frame_sample_stub",
           "partition_for_decode", "image_phash", "image_duplicate_pairs"]

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


def partition_for_decode(df: DataFrame, payload_col: str = "payload",
                         target_mb_per_partition: int = 64,
                         min_partitions: int | None = None) -> DataFrame:
    """Repartition a binary-payload frame so each partition holds
    payloads of ONE power-of-two size class totalling roughly
    ``target_mb_per_partition`` — a 4 KB thumbnail and a 40 MB clip
    never share an Arrow batch, and no partition drags a multi-target
    byte pile, so mapInPandas decode wall-times stay uniform.

    Layout is sized by one tiny aggregate (bytes per size class, ≤ ~40
    groups, map-side partials): class c gets ``ceil(bytes_c / target)``
    sub-buckets, rows spread across them by payload hash, and the dense
    (class, sub) → partition-index map is built driver-side, then
    applied with ``repartitionByRange`` over the index so one output
    partition ≈ one bucket. This is byte-balanced without a global
    cumulative sum (which would need a single-partition window — the
    100 TB anti-pattern). Null payloads land in class 0 together.
    """
    size = F.coalesce(F.octet_length(F.col(payload_col)), F.lit(0))
    cls = F.floor(F.log2(F.greatest(size, F.lit(1)))).cast("int")
    per_class = {int(r["cls"]): int(r["bytes"])
                 for r in df.groupBy(cls.alias("cls"))
                 .agg(F.sum(size).alias("bytes")).collect()}
    target = max(target_mb_per_partition, 1) * 1_000_000
    part_base: dict[int, int] = {}
    nsub: dict[int, int] = {}
    n_parts = 0
    for c in sorted(per_class):
        part_base[c] = n_parts
        nsub[c] = max(-(-per_class[c] // target), 1)
        n_parts += nsub[c]
    n_parts = max(n_parts, min_partitions or 1, 1)
    base_map = F.create_map(*[F.lit(x) for c in part_base
                              for x in (c, part_base[c])])
    nsub_map = F.create_map(*[F.lit(x) for c in nsub
                              for x in (c, nsub[c])])
    row_hash = F.coalesce(F.xxhash64(F.col(payload_col)), F.lit(0))
    part_idx = base_map[cls] + F.pmod(row_hash, nsub_map[cls])
    return (df.repartitionByRange(n_parts, part_idx.alias("__part"))
            if per_class else df)


def _decode_image_bytes(payload: bytes, meta) -> list[float]:
    """8-dim image feature vector.

    REAL decode for PNG/BMP/PPM/GIF/JPEG incl. progressive
    (codecs.decode_image): [w, h, channels, mean/255, std/255,
    p25/255, p75/255, nonzero_fraction]. Formats with no stdlib codec
    (MP4) fall back to the deterministic 8-bucket byte histogram —
    same arity, so downstream schemas never fork.
    """
    if payload is None:
        raise ValueError("null payload")
    from .codecs import DECODABLE_IMAGE_FORMATS, decode_image, sniff_format
    if sniff_format(payload) in DECODABLE_IMAGE_FORMATS:
        try:
            import numpy as np
            a = decode_image(payload)
            h, w, c = a.shape
            f = a.astype(np.float64)
            return [float(w), float(h), float(c),
                    round(float(f.mean()) / 255.0, 6),
                    round(float(f.std()) / 255.0, 6),
                    round(float(np.percentile(f, 25)) / 255.0, 6),
                    round(float(np.percentile(f, 75)) / 255.0, 6),
                    round(float((a > 0).mean()), 6)]
        except Exception:
            # unsupported variant (paletted/interlaced PNG, 32-bit
            # BMP, …) or corrupt stream: fall back exactly as the
            # pre-codec contract did — same arity, schema never forks
            pass
    # fallback: deterministic byte-histogram "feature" (no stdlib codec)
    buckets = [0.0] * 8
    for b in payload[:4096]:
        buckets[b % 8] += 1.0
    total = sum(buckets) or 1.0
    return [round(x / total, 6) for x in buckets]


def decode_features(df: DataFrame, payload_col: str = "payload",
                    id_col: str = "media_id",
                    batch_size_hint: int = 256) -> DataFrame:
    """mapInPandas feature extraction: (id, features array<double>, error).

    Real pixel statistics for PNG/BMP/PPM payloads, byte-histogram
    fallback otherwise (see ``_decode_image_bytes``). Errors are captured
    per row (never fail the batch) — a corrupt blob in a 100 TB corpus
    must not kill a 6-hour job.
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


# API continuity: the round-2/3 name keeps working (the decode became
# real for stdlib-codec formats; the JPEG-et-al fallback is unchanged)
decode_features_stub = decode_features


def resize_images(df: DataFrame, target_w: int, target_h: int,
                  payload_col: str = "payload",
                  id_col: str = "media_id") -> DataFrame:
    """Image resize: (id, payload, width, height, error), aspect
    preserved (fit-inside, never upscaled).

    REAL path for PNG/BMP/PPM/GIF/baseline-JPEG payloads: decode →
    nearest-neighbor resample (deterministic numpy indexing) → re-encode
    (JPEG in → JPEG out, everything else → PNG, so the payload's mime
    stays truthful). Formats with no stdlib codec keep the documented
    byte-budget fallback
    (payload truncated to ``len · target_area / source_area`` using the
    caller-provided meta dims) so the contract — binary in → smaller
    binary out + corrected metadata — holds corpus-wide. A real build
    swaps the fallback branch for PIL ``Image.resize``; nothing else
    changes.
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
        from .codecs import (DECODABLE_IMAGE_FORMATS, decode_image,
                             encode_jpeg, encode_png, resize_nearest,
                             sniff_format)
        fmt = sniff_format(payload)
        if fmt in DECODABLE_IMAGE_FORMATS:
            try:
                # REAL path: true dims come from the pixels, not the meta
                out = resize_nearest(decode_image(payload),
                                     target_w, target_h)
                nh, nw = out.shape[:2]
                if fmt == "jpeg":
                    return encode_jpeg(out), nw, nh
                return encode_png(out), nw, nh
            except Exception:
                pass  # unsupported variant/corrupt → byte-budget fallback
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

    # meta is OPTIONAL: the real codec path reads dims from the pixels;
    # only the no-codec fallback needs meta.width/height (absent meta →
    # those rows get a per-row "bad source dims" error, not a crash)
    if "meta" in df.columns:
        w_col = F.col("meta.width").alias("__w")
        h_col = F.col("meta.height").alias("__h")
    else:
        w_col = F.lit(None).cast("int").alias("__w")
        h_col = F.lit(None).cast("int").alias("__h")
    return (df.select(F.col(id_col), F.col(payload_col), w_col, h_col)
            .mapInPandas(run, schema=out_schema))


# API continuity alias (see decode_features_stub)
resize_stub = resize_images


def audio_features(df: DataFrame, payload_col: str = "payload",
                   id_col: str = "media_id") -> DataFrame:
    """REAL audio features via mapInPandas: (id, duration_ms, rate_hz,
    n_channels, rms, zero_crossing_rate, error).

    PCM16 RIFF/WAVE decoded with the stdlib codec
    (``codecs.decode_wav``); AVI containers yield their first PCM16
    'auds' stream (``codecs.decode_avi_audio``). Other payloads produce
    a per-row error (no fake numbers for audio — compressed formats
    need ffmpeg).
    """
    out_schema = T.StructType([
        T.StructField("media_id", T.LongType()),
        T.StructField("duration_ms", T.LongType()),
        T.StructField("rate_hz", T.IntegerType()),
        T.StructField("n_channels", T.IntegerType()),
        T.StructField("rms", T.DoubleType()),
        T.StructField("zero_crossing_rate", T.DoubleType()),
        T.StructField("error", T.StringType()),
    ])

    def run(batches: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        from .codecs import decode_avi_audio, decode_wav, sniff_format
        for pdf in batches:
            rows = {k: [] for k in ("media_id", "duration_ms", "rate_hz",
                                    "n_channels", "rms",
                                    "zero_crossing_rate", "error")}
            for mid, payload in zip(pdf[id_col], pdf[payload_col]):
                rows["media_id"].append(mid)
                try:
                    if payload is None:
                        raise ValueError("null payload")
                    payload = bytes(payload)
                    if sniff_format(payload) == "avi":
                        s, rate = decode_avi_audio(payload)
                    else:
                        s, rate = decode_wav(payload)
                    mono = s.astype(np.float64).mean(axis=1)
                    zc = (float(np.count_nonzero(
                        np.signbit(mono[1:]) != np.signbit(mono[:-1])))
                        / max(len(mono) - 1, 1))
                    rows["duration_ms"].append(
                        int(round(len(s) * 1000.0 / rate)))
                    rows["rate_hz"].append(rate)
                    rows["n_channels"].append(int(s.shape[1]))
                    rows["rms"].append(
                        float(np.sqrt((s.astype(np.float64) ** 2).mean())))
                    rows["zero_crossing_rate"].append(zc)
                    rows["error"].append(None)
                except Exception as e:  # capture, don't fail the batch
                    for k in ("duration_ms", "rate_hz", "n_channels",
                              "rms", "zero_crossing_rate"):
                        rows[k].append(None)
                    rows["error"].append(str(e))
            yield pd.DataFrame(rows)

    return (df.select(id_col, payload_col)
            .mapInPandas(run, schema=out_schema))


def frame_sample_stub(df: DataFrame, payload_col: str = "payload",
                      id_col: str = "media_id", every_ms: int = 1000) -> DataFrame:
    """Frame-sampling *offset plumbing* (kept for API continuity): one
    row per sampled offset from meta.duration_ms, no pixel decode. For
    real per-frame pixels over animated GIF see ``frame_sample``.
    """
    frames = F.sequence(
        F.lit(0), F.greatest(F.coalesce(F.col("meta.duration_ms"), F.lit(0))
                             - 1, F.lit(0)), F.lit(every_ms))
    return (df.select(F.col(id_col), F.explode(frames).alias("frame_ms"))
            .withColumn("frame_key",
                        F.concat_ws(":", F.col(id_col).cast("string"),
                                    F.col("frame_ms").cast("string"))))


def frame_sample(df: DataFrame, every_ms: int = 1000,
                 payload_col: str = "payload",
                 id_col: str = "media_id") -> DataFrame:
    """REAL frame sampling via mapInPandas: one row per sampled frame —
    (id, frame_ms, payload PNG, width, height, error).

    Two multi-frame formats have pure-stdlib codecs and take the real
    path: animated GIF (``codecs.decode_gif_frames``: variable-width
    LZW, disposal, transparency, interlace) and MJPEG AVI
    (``codecs.decode_avi_frames``: RIFF container + per-frame baseline
    JPEG). The frame on-screen at each multiple of ``every_ms`` within
    the clip's duration is re-encoded as PNG. A zero-duration (static)
    GIF yields its single frame at t=0. Formats that genuinely need
    ffmpeg (MP4…) produce a per-row error — no fake frames. Output
    fan-out is bounded by duration/every_ms per payload, streamed per
    Arrow batch.
    """
    out_schema = T.StructType([
        T.StructField("media_id", T.LongType()),
        T.StructField("frame_ms", T.LongType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("error", T.StringType()),
    ])

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        from .avi import scan_avi_frames
        from .codecs import (decode_gif_frames, decode_jpeg, encode_png,
                             sniff_format)
        for pdf in batches:
            rows = {k: [] for k in ("media_id", "frame_ms", "payload",
                                    "width", "height", "error")}

            def emit(mid, t, payload, w, h, err):
                rows["media_id"].append(mid)
                rows["frame_ms"].append(t)
                rows["payload"].append(payload)
                rows["width"].append(w)
                rows["height"].append(h)
                rows["error"].append(err)

            for mid, payload in zip(pdf[id_col], pdf[payload_col]):
                try:
                    if payload is None:
                        raise ValueError("null payload")
                    payload = bytes(payload)
                    fmt = sniff_format(payload)
                    if fmt == "gif":
                        # GIF frames composite (disposal/transparency),
                        # so every frame must decode up front
                        decoded = decode_gif_frames(payload)
                        if not decoded:
                            raise ValueError("GIF with no frames")
                        starts = [t for t, _ in decoded]

                        def get_img(fi, _d=decoded):
                            return _d[fi][1]
                    elif fmt == "avi":
                        # MJPEG frames are independent: scan the
                        # container only, decode just the sampled
                        # frames (memory bounded by sampled count)
                        scanned = scan_avi_frames(payload)
                        starts = [t for t, _ in scanned]

                        def get_img(fi, _s=scanned):
                            return decode_jpeg(_s[fi][1])
                    else:
                        raise ValueError(
                            f"no stdlib frame codec for format "
                            f"{fmt or 'unknown'}")
                    # frame i is on screen over [t_i, t_{i+1});
                    # the clip ends when the last frame appears
                    ts = (range(0, starts[-1] + 1, every_ms)
                          if starts[-1] else [0])
                    fi = 0
                    png_cache: dict[int, tuple] = {}  # frame idx →
                    # (PNG, w, h): many sampling instants can land on
                    # one long frame, and it decodes/encodes only once
                    for t in ts:
                        while fi + 1 < len(starts) and starts[fi + 1] <= t:
                            fi += 1
                        if fi not in png_cache:
                            img = get_img(fi)
                            png_cache[fi] = (encode_png(img),
                                             int(img.shape[1]),
                                             int(img.shape[0]))
                        png, fw, fh = png_cache[fi]
                        emit(mid, t, png, fw, fh, None)
                except Exception as e:  # capture, don't fail the batch
                    emit(mid, None, None, None, None, str(e))
            yield pd.DataFrame(rows)

    return (df.select(id_col, payload_col)
            .mapInPandas(run, schema=out_schema))


def image_phash(df: DataFrame, payload_col: str = "payload",
                id_col: str = "media_id",
                hash_size: int = 8) -> DataFrame:
    """Perceptual dHash per image: (media_id, phash, error).

    dHash (difference hash, public algorithm): decode → luma grayscale
    (Rec.601 weights) → nearest-resize to ``(hash_size+1) × hash_size``
    with no aspect fit → horizontal gradient sign bits, packed row-major
    into a 64-bit signed int (``hash_size=8``). Robust to re-encoding,
    resizing, and mild color shifts — the near-dup signal an image
    corpus dedups on. Decode is the REAL stdlib codec path
    (PNG/BMP/PPM/GIF/baseline-JPEG); undecodable payloads yield a NULL
    hash and a per-row ``error`` (never fail the batch).

    One Arrow-batched mapInPandas pass, map-side only; feed the result
    to :func:`peri_spark.functions.hamming_duplicate_pairs`
    (``nbits=hash_size*hash_size``) for banded near-dup pairs without an
    all-pairs join.
    """
    import numpy as np

    from .codecs import decode_image, resize_nearest

    nbits = hash_size * hash_size
    assert nbits <= 64, "hash_size > 8 does not fit a 64-bit column"
    out_schema = T.StructType([
        T.StructField("media_id", T.LongType()),
        T.StructField("phash", T.LongType()),
        T.StructField("error", T.StringType()),
    ])

    def _one(payload: bytes) -> int:
        arr = decode_image(payload).astype(np.float64)
        if arr.ndim == 2:
            gray = arr
        else:
            c = arr.shape[2]
            gray = (arr[..., 0] if c == 1 else
                    0.299 * arr[..., 0] + 0.587 * arr[..., 1]
                    + 0.114 * arr[..., 2])
        small = resize_nearest(gray[..., None], hash_size + 1, hash_size,
                               fit=False)[..., 0]
        bits = (small[:, 1:] > small[:, :-1]).astype(np.uint64).ravel()
        v = 0
        for i, bit in enumerate(bits.tolist()):
            v |= bit << i
        if v >= 1 << 63:   # two's complement into a signed long column
            v -= 1 << 64
        return v

    def run(batches: Iterator) -> Iterator:
        import pandas as pd
        for pdf in batches:
            ids, hs, errs = [], [], []
            for mid, payload in zip(pdf[id_col], pdf[payload_col]):
                ids.append(mid)
                try:
                    hs.append(_one(bytes(payload)) if payload is not None
                              else None)
                    errs.append(None if payload is not None
                                else "null payload")
                except Exception as e:
                    hs.append(None)
                    errs.append(str(e))
            yield pd.DataFrame({"media_id": ids, "phash": hs,
                                "error": errs})

    return df.select(id_col, payload_col).mapInPandas(run,
                                                      schema=out_schema)


def image_duplicate_pairs(df: DataFrame, payload_col: str = "payload",
                          id_col: str = "media_id",
                          max_hamming: int = 6, hash_size: int = 8,
                          max_bucket_size: int | None = 10000,
                          dropped_counter: dict | None = None
                          ) -> DataFrame:
    """Near-duplicate IMAGE pairs end-to-end: dHash → banded Hamming
    join → exact popcount verify. Returns (id_a, id_b, hamming).

    Composition of :func:`image_phash` (one map-side Arrow decode pass)
    and :func:`peri_spark.functions.hamming_duplicate_pairs` (exact-
    guarantee band LSH) — the corpus's binary payloads never shuffle,
    only 16-byte (id, hash) rows do. ``max_hamming=6`` of 64 bits is the
    usual re-encode/resize tolerance for dHash; undecodable rows drop
    out (their hash is NULL).
    """
    from .dedup import hamming_duplicate_pairs

    hashes = (image_phash(df, payload_col, id_col, hash_size)
              .where(F.col("phash").isNotNull()))
    return hamming_duplicate_pairs(
        hashes, "phash", "media_id", max_hamming=max_hamming,
        nbits=hash_size * hash_size, max_bucket_size=max_bucket_size,
        dropped_counter=dropped_counter)
