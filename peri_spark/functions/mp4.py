"""MP4 (ISO BMFF) sample-table parsing — real frame offsets, no codec.

``probe.py`` walks moov for metadata; this module goes one level deeper
and reconstructs the full per-sample map of the first VIDEO track from
the stbl tables alone (ISO/IEC 14496-12 §8.5–8.7, the public spec):

- ``stsz``  per-sample byte sizes (or one uniform size)
- ``stsc``  sample→chunk runs (first_chunk, samples_per_chunk)
- ``stco``/``co64``  chunk byte offsets (32/64-bit)
- ``stts``  decode-time deltas → per-sample timestamps
- ``stss``  sync (key) sample numbers; absent → every sample is sync

That yields ``(sample_idx, offset, size, t_ms, is_sync)`` — enough to
SLICE each coded frame's exact bytes out of mdat for routing, sharding,
sync-frame selection and per-frame size/bitrate statistics at corpus
scale, all without touching a video decoder. Actual H.264/H.265 pixel
decode stays out of scope (documented fallback — no pure-stdlib path),
so ``multimodal.frame_sample`` still reports a per-row error for MP4
pixels; what this closes is the PLUMBING: the byte ranges are real.

Reference parity anchor: the reference's media utilities expose frame
index/byte-range metadata without decoding; this is the Spark-side
equivalent (mapInPandas over Arrow batches, per-row error capture).
"""

from __future__ import annotations

import struct
from typing import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import types as T

__all__ = ["scan_mp4_samples", "mp4_sample_index"]

_CONTAINERS = {b"moov", b"trak", b"mdia", b"minf", b"stbl"}


def _boxes(p: bytes, lo: int, hi: int):
    """Yield (fourcc, body_start, box_end) for the boxes in [lo, hi)."""
    pos = lo
    while pos + 8 <= hi:
        (size,) = struct.unpack_from(">I", p, pos)
        box = p[pos + 4:pos + 8]
        body = pos + 8
        if size == 1:
            if pos + 16 > hi:
                return
            (size,) = struct.unpack_from(">Q", p, pos + 8)
            body = pos + 16
        elif size == 0:
            size = hi - pos
        if size < 8 or pos + size > hi:
            return
        yield box, body, pos + size
        pos += size


def _find(p: bytes, lo: int, hi: int, path: tuple[bytes, ...]):
    """All body ranges reached by a container path like (moov, trak)."""
    if not path:
        yield lo, hi
        return
    for box, body, end in _boxes(p, lo, hi):
        if box == path[0]:
            yield from _find(p, body, end, path[1:])


def scan_mp4_samples(payload: bytes) -> list[dict]:
    """Per-sample map of the first video track: list of dicts with
    ``sample_idx`` (0-based), ``offset``, ``size``, ``t_ms``
    (decode time, media timescale → ms), ``is_sync``.

    Raises ``ValueError`` on non-MP4 bytes, MP4s without a video
    track, or inconsistent sample tables (truncated moov).
    """
    try:
        return _scan_mp4_samples(payload)
    except (struct.error, IndexError) as e:
        # a table whose declared count outruns the actual moov bytes
        # surfaces as struct.error deep in unpack_from; the documented
        # contract is ValueError (same wrap as jpeg.decode_jpeg)
        raise ValueError(f"corrupt MP4 sample tables: {e}") from e


def _scan_mp4_samples(payload: bytes) -> list[dict]:
    p = payload
    if len(p) < 16 or p[4:8] != b"ftyp":
        raise ValueError("not an ISO BMFF (ftyp) stream")
    for trak_lo, trak_hi in _find(p, 0, len(p), (b"moov", b"trak")):
        # handler: video tracks carry hdlr handler_type 'vide'
        handler = None
        timescale = None
        for mdia_lo, mdia_hi in _find(p, trak_lo, trak_hi, (b"mdia",)):
            for box, body, end in _boxes(p, mdia_lo, mdia_hi):
                if box == b"hdlr" and body + 12 <= end:
                    handler = p[body + 8:body + 12]
                elif box == b"mdhd" and body + 4 <= end:
                    ver = p[body]
                    off = body + (20 if ver == 1 else 12)
                    if off + 4 <= end:
                        (timescale,) = struct.unpack_from(">I", p, off)
        if handler != b"vide":
            continue
        stbl = next(_find(p, trak_lo, trak_hi,
                          (b"mdia", b"minf", b"stbl")), None)
        if stbl is None:
            raise ValueError("video trak without stbl")
        tables: dict[bytes, tuple[int, int]] = {}
        for box, body, end in _boxes(p, *stbl):
            tables[box] = (body, end)

        def full(box: bytes):
            if box not in tables:
                return None
            body, end = tables[box]
            return body + 4, end          # skip version/flags

        # sizes
        r = full(b"stsz")
        if r is None:
            raise ValueError("stbl without stsz")
        body, end = r
        uniform, count = struct.unpack_from(">II", p, body)
        # Untrusted declared counts are bounded against the payload
        # BEFORE any expansion (advice r5): a crafted count near 2^32
        # would otherwise allocate tens of GB / emit billions of rows
        # instead of failing fast as a corrupt-table ValueError.
        if count > len(p):
            raise ValueError(
                f"stsz sample count {count} exceeds payload size")
        if uniform:
            sizes = [uniform] * count
        else:
            if body + 8 + 4 * count > end:
                raise ValueError("stsz table exceeds its box")
            sizes = list(struct.unpack_from(f">{count}I", p, body + 8))
        # chunk offsets
        if b"stco" in tables:
            body, end = full(b"stco")
            (n,) = struct.unpack_from(">I", p, body)
            if body + 4 + 4 * n > end:
                raise ValueError("stco table exceeds its box")
            chunk_offsets = list(struct.unpack_from(f">{n}I", p, body + 4))
        elif b"co64" in tables:
            body, end = full(b"co64")
            (n,) = struct.unpack_from(">I", p, body)
            if body + 4 + 8 * n > end:
                raise ValueError("co64 table exceeds its box")
            chunk_offsets = list(struct.unpack_from(f">{n}Q", p, body + 4))
        else:
            raise ValueError("stbl without stco/co64")
        # sample->chunk runs
        r = full(b"stsc")
        if r is None:
            raise ValueError("stbl without stsc")
        body, end = r
        (n,) = struct.unpack_from(">I", p, body)
        if body + 4 + 12 * n > end:
            raise ValueError("stsc table exceeds its box")
        runs = [struct.unpack_from(">III", p, body + 4 + 12 * i)
                for i in range(n)]
        # per-chunk samples_per_chunk, expanded across chunks
        spc = []
        for i, (first, per, _sdi) in enumerate(runs):
            last = (runs[i + 1][0] - 1 if i + 1 < len(runs)
                    else len(chunk_offsets))
            spc.extend([per] * (last - first + 1))
        # decode-time deltas
        deltas: list[int] = []
        r = full(b"stts")
        if r is not None:
            body, end = r
            (n,) = struct.unpack_from(">I", p, body)
            if body + 4 + 8 * n > end:
                raise ValueError("stts table exceeds its box")
            for i in range(n):
                cnt, d = struct.unpack_from(">II", p, body + 4 + 8 * i)
                # total stts entries are bounded by the stsz sample
                # count — a crafted run count cannot balloon the list
                if len(deltas) + cnt > count:
                    raise ValueError(
                        "stts entry total exceeds stsz sample count")
                deltas.extend([d] * cnt)
        # sync table
        sync: set[int] | None = None
        r = full(b"stss")
        if r is not None:
            body, end = r
            (n,) = struct.unpack_from(">I", p, body)
            if body + 4 + 4 * n > end:
                raise ValueError("stss table exceeds its box")
            sync = set(struct.unpack_from(f">{n}I", p, body + 4))

        out = []
        idx = 0
        dts = 0
        for ci, coff in enumerate(chunk_offsets):
            if ci >= len(spc):
                break
            pos = coff
            for _ in range(spc[ci]):
                if idx >= len(sizes):
                    break
                t_ms = (dts * 1000.0 / timescale) if timescale else None
                out.append({
                    "sample_idx": idx,
                    "offset": pos,
                    "size": sizes[idx],
                    "t_ms": t_ms,
                    "is_sync": (sync is None) or (idx + 1 in sync),
                })
                pos += sizes[idx]
                if idx < len(deltas):
                    dts += deltas[idx]
                idx += 1
        if idx != len(sizes):
            raise ValueError(
                f"inconsistent sample tables: stsz says {len(sizes)} "
                f"samples, chunk map yields {idx}")
        return out
    raise ValueError("MP4 with no video track")


def mp4_sample_index(df: DataFrame, payload_col: str = "payload",
                     id_col: str = "media_id",
                     sync_only: bool = False) -> DataFrame:
    """Explode each MP4 payload into its real per-frame byte map:
    ``(media_id, sample_idx, offset, size, t_ms, is_sync, error)`` —
    one row per video sample (``sync_only=True`` keeps key frames, the
    rows a thumbnail/shard router actually fetches). mapInPandas over
    Arrow batches; a corrupt payload yields one error row, never a
    failed batch. Fan-out is the payload's sample count; pair with
    ``multimodal.partition_for_decode`` when payload sizes are skewed.
    """
    out_schema = T.StructType([
        T.StructField("media_id", T.LongType()),
        T.StructField("sample_idx", T.IntegerType()),
        T.StructField("offset", T.LongType()),
        T.StructField("size", T.LongType()),
        T.StructField("t_ms", T.DoubleType()),
        T.StructField("is_sync", T.BooleanType()),
        T.StructField("error", T.StringType()),
    ])
    keys = ("media_id", "sample_idx", "offset", "size", "t_ms",
            "is_sync", "error")

    def run(batches: Iterator) -> Iterator:
        import pandas as pd
        for pdf in batches:
            rows = {k: [] for k in keys}

            def emit(mid, s, err):
                rows["media_id"].append(mid)
                rows["sample_idx"].append(
                    s["sample_idx"] if s else None)
                rows["offset"].append(s["offset"] if s else None)
                rows["size"].append(s["size"] if s else None)
                rows["t_ms"].append(s["t_ms"] if s else None)
                rows["is_sync"].append(s["is_sync"] if s else None)
                rows["error"].append(err)

            for mid, payload in zip(pdf[id_col], pdf[payload_col]):
                try:
                    if payload is None:
                        raise ValueError("null payload")
                    for s in scan_mp4_samples(bytes(payload)):
                        if sync_only and not s["is_sync"]:
                            continue
                        emit(mid, s, None)
                except Exception as e:     # capture, don't fail batch
                    emit(mid, None, str(e))
            yield pd.DataFrame(rows)

    return (df.select(id_col, payload_col)
            .mapInPandas(run, schema=out_schema))
