"""Header-only media probing: format, dimensions, duration — no decode.

A 100 TB scraped corpus needs to filter by resolution/duration/codec
BEFORE paying any decode cost. Every common container puts that
metadata in fixed header structures, so probing reads a few hundred
bytes per payload: PNG IHDR, JPEG SOFn, GIF screen descriptor (+ frame
delays), BMP/PPM headers, WAV fmt/data chunks, AVI hdrl, and the MP4
(ISO BMFF) moov/mvhd/tkhd box tree — the one format whose FRAMES need
ffmpeg still yields width/height/duration from plain box walking.

``probe_media`` is a pure bytes→dict function (executor-safe);
``probe_metadata`` is the mapInPandas operator emitting one typed row
per payload with per-row error capture.

Parity note: the reference (zoedsoupe/peri) has no media layer; this
backs the SURVEY.md multimodal directive.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

__all__ = ["probe_media", "probe_metadata"]


def _probe_png(p: bytes) -> dict:
    if len(p) < 24 or p[12:16] != b"IHDR":
        raise ValueError("truncated PNG header")
    w, h = struct.unpack(">II", p[16:24])
    return {"format": "png", "width": w, "height": h}


def _probe_gif(p: bytes, scan_limit: int = 1 << 20) -> dict:
    if len(p) < 10:
        raise ValueError("truncated GIF header")
    w, h = struct.unpack("<HH", p[6:10])
    # walk blocks for frame count + total animation duration: graphic
    # control extensions carry per-frame delay in 1/100 s. The walk is
    # capped (``scan_limit`` bytes, default 1 MiB) so probing a huge
    # animation stays O(limit), not O(payload) — past the cap the
    # dims are still reported and frames/duration are omitted.
    pos = 13 + (3 * (2 << (p[10] & 0x07)) if p[10] & 0x80 else 0)
    frames = 0
    duration_ms = 0
    delay = 0
    while pos < len(p):
        if pos > scan_limit:
            return {"format": "gif", "width": w, "height": h}
        b = p[pos]
        if b == 0x3B:                      # trailer
            break
        if b == 0x21:                      # extension
            if pos + 2 > len(p):
                break
            if p[pos + 1] == 0xF9 and pos + 6 <= len(p):
                delay = struct.unpack("<H", p[pos + 4:pos + 6])[0] * 10
            pos += 2
            while pos < len(p) and p[pos]:
                pos += 1 + p[pos]
            pos += 1
        elif b == 0x2C:                    # image descriptor
            frames += 1
            duration_ms += delay
            delay = 0
            if pos + 10 > len(p):
                break
            pos += 10
            if p[pos - 1] & 0x80:          # local palette
                pos += 3 * (2 << (p[pos - 1] & 0x07))
            pos += 1                       # LZW min code size
            while pos < len(p) and p[pos]:
                pos += 1 + p[pos]
            pos += 1
        else:
            break
    return {"format": "gif", "width": w, "height": h,
            "frames": frames or None,
            "duration_ms": duration_ms if frames > 1 else None}


def _probe_jpeg(p: bytes) -> dict:
    pos = 2
    while pos + 4 <= len(p):
        if p[pos] != 0xFF:
            raise ValueError("bad JPEG marker sync")
        m = p[pos + 1]
        if m == 0xFF:
            pos += 1
            continue
        pos += 2
        if m in (0xD8, 0x01) or 0xD0 <= m <= 0xD7:
            continue
        if m in (0xD9, 0xDA):
            break
        seglen = struct.unpack(">H", p[pos:pos + 2])[0]
        if 0xC0 <= m <= 0xCF and m not in (0xC4, 0xC8, 0xCC):
            _prec, h, w = struct.unpack(">BHH", p[pos + 2:pos + 7])
            return {"format": "jpeg", "width": w, "height": h,
                    "codec": "baseline" if m == 0xC0 else f"sof{m - 0xC0}"}
        pos += seglen
    raise ValueError("JPEG with no frame header")


def _probe_bmp(p: bytes) -> dict:
    if len(p) < 26:
        raise ValueError("truncated BMP header")
    w, h = struct.unpack("<ii", p[18:26])
    if w <= 0:                 # height may be negative (top-down rows)
        raise ValueError("implausible BMP width")
    return {"format": "bmp", "width": w, "height": abs(h)}


def _probe_ppm(p: bytes) -> dict:
    fields = []
    pos = 2
    while len(fields) < 2 and pos < min(len(p), 512):
        while pos < len(p) and p[pos:pos + 1].isspace():
            pos += 1
        if p[pos:pos + 1] == b"#":
            while pos < len(p) and p[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < len(p) and p[pos:pos + 1].isdigit():
            pos += 1
        if pos == start:
            break
        fields.append(int(p[start:pos]))
    if len(fields) < 2:
        raise ValueError("truncated PPM header")
    return {"format": "ppm", "width": fields[0], "height": fields[1]}


def _probe_wav(p: bytes) -> dict:
    pos = 12
    rate = channels = bits = None
    data_len = None
    while pos + 8 <= len(p):
        fcc = p[pos:pos + 4]
        (size,) = struct.unpack_from("<I", p, pos + 4)
        if fcc == b"fmt " and size >= 16:
            _fmt, channels, rate = struct.unpack_from("<HHI", p, pos + 8)
            bits = struct.unpack_from("<H", p, pos + 22)[0]
        elif fcc == b"data":
            data_len = size
        pos += 8 + size + (size & 1)
    if rate is None:
        raise ValueError("WAV with no fmt chunk")
    out = {"format": "wav", "sample_rate": rate, "channels": channels}
    if data_len is not None and rate and channels and bits:
        out["duration_ms"] = int(data_len * 8000
                                 / (rate * channels * bits))
    return out


def _probe_avi(p: bytes) -> dict:
    from .avi import _parse_container
    avih, streams, _movi = _parse_container(p)
    out = {"format": "avi"}
    if avih:
        usec, nframes, w, h = avih[0], avih[4], avih[8], avih[9]
        out["width"], out["height"] = w, h
        if usec and nframes:
            out["duration_ms"] = int(usec * nframes / 1000)
            out["frames"] = nframes
    for st in streams:
        if st["type"] == b"vids" and "codec" not in out:
            out["codec"] = st["handler"] \
                .decode("ascii", "replace").strip("\x00 ")
        elif st["type"] == b"auds" and "sample_rate" not in out \
                and len(st["strf"]) >= 8:
            _tag, ch, rate = struct.unpack_from("<HHI", st["strf"])
            out["sample_rate"] = rate
            out["channels"] = ch
    return out


def _probe_mp4(p: bytes) -> dict:
    """ISO BMFF box walk: mvhd → duration, tkhd (video track) → dims,
    stsd → sample entry fourcc. No codec work, pure structure."""
    out = {"format": "mp4"}

    def walk(lo: int, hi: int, depth: int = 0):
        pos = lo
        while pos + 8 <= hi and depth < 8:
            (size,) = struct.unpack_from(">I", p, pos)
            box = p[pos + 4:pos + 8]
            body = pos + 8
            if size == 1:                  # 64-bit largesize
                if pos + 16 > hi:
                    break
                (size,) = struct.unpack_from(">Q", p, pos + 8)
                body = pos + 16
            elif size == 0:                # to end of enclosing box
                size = hi - pos
            if size < 8 or pos + size > hi:
                break
            end = pos + size
            if box in (b"moov", b"trak", b"mdia", b"minf", b"stbl"):
                walk(body, end, depth + 1)
            elif box == b"mvhd" and "duration_ms" not in out:
                ver = p[body]
                if ver == 1:
                    scale, dur = struct.unpack_from(">IQ", p, body + 20)
                else:
                    scale, dur = struct.unpack_from(">II", p, body + 12)
                if scale:
                    out["duration_ms"] = int(dur * 1000 / scale)
            elif box == b"tkhd" and "width" not in out:
                # dims sit after ver/flags + times/id/duration + layer/
                # volume + matrix: offset 76 (v0) / 88 (v1)
                ver = p[body]
                off = body + (88 if ver == 1 else 76)
                if off + 8 <= end:
                    w16, h16 = struct.unpack_from(">II", p, off)
                    if w16 and h16:        # 16.16 fixed point
                        out["width"] = w16 >> 16
                        out["height"] = h16 >> 16
            elif box == b"stsd" and "codec" not in out:
                if body + 16 <= end:
                    out["codec"] = p[body + 12:body + 16] \
                        .decode("ascii", "replace").strip("\x00 ")
            pos = end

    walk(0, len(p))
    if len(out) == 1:
        raise ValueError("MP4 with no moov metadata")
    return out


def probe_media(payload: bytes) -> dict:
    """Sniff + header-parse one payload → dict with ``format`` plus any
    of width/height/duration_ms/frames/sample_rate/channels/codec.
    Raises ValueError for unrecognized or truncated headers."""
    if payload is None:
        raise ValueError("null payload")
    from .codecs import sniff_format
    fmt = sniff_format(payload)
    if fmt is None and len(payload) >= 12 \
            and payload[4:8] == b"ftyp":
        fmt = "mp4"
    probes = {"png": _probe_png, "gif": _probe_gif, "jpeg": _probe_jpeg,
              "bmp": _probe_bmp, "ppm": _probe_ppm, "wav": _probe_wav,
              "avi": _probe_avi, "mp4": _probe_mp4}
    if fmt not in probes:
        raise ValueError("unrecognized media format")
    try:
        out = probes[fmt](payload)
    except (struct.error, IndexError) as e:
        raise ValueError(f"truncated {fmt} header: {e}") from e
    # plausibility gate: header ints are attacker-controlled; a field
    # that cannot fit the operator's int32/int64 output columns (or is
    # non-positive) means a corrupt header, not a 4-billion-pixel image
    # — surface it as a per-row error instead of letting the Arrow
    # serializer wrap or kill the batch
    for k in ("width", "height", "frames", "sample_rate", "channels"):
        v = out.get(k)
        if v is not None and not 1 <= v <= 2**31 - 1:
            raise ValueError(f"implausible {fmt} header: {k}={v}")
    v = out.get("duration_ms")
    if v is not None and not 0 <= v <= 2**63 - 1:
        raise ValueError(f"implausible {fmt} header: duration_ms={v}")
    return out


def probe_metadata(df, payload_col: str = "payload",
                   id_col: str = "media_id"):
    """mapInPandas probe: (id, format, width, height, duration_ms,
    frames, sample_rate, channels, codec, error) — one row per payload,
    header bytes only, per-row error capture (a corrupt blob must not
    kill the batch)."""
    from pyspark.sql import types as T

    out_schema = T.StructType([
        T.StructField("media_id", T.LongType()),
        T.StructField("format", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("duration_ms", T.LongType()),
        T.StructField("frames", T.IntegerType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("channels", T.IntegerType()),
        T.StructField("codec", T.StringType()),
        T.StructField("error", T.StringType()),
    ])
    cols = ["format", "width", "height", "duration_ms", "frames",
            "sample_rate", "channels", "codec"]

    def run(batches: Iterator) -> Iterator:
        import pandas as pd
        for pdf in batches:
            rows = {k: [] for k in ["media_id", *cols, "error"]}
            for mid, payload in zip(pdf[id_col], pdf[payload_col]):
                rows["media_id"].append(mid)
                try:
                    info = probe_media(
                        bytes(payload) if payload is not None else None)
                    for k in cols:
                        rows[k].append(info.get(k))
                    rows["error"].append(None)
                except Exception as e:     # capture, don't fail batch
                    for k in cols:
                        rows[k].append(None)
                    rows["error"].append(str(e))
            yield pd.DataFrame(rows)

    return (df.select(id_col, payload_col)
            .mapInPandas(run, schema=out_schema))
