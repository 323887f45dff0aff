"""Motion-JPEG AVI container decode + encode in pure stdlib + numpy.

AVI is a plain RIFF container; an MJPEG stream is just one baseline
JPEG per frame (decoded by ``functions/jpeg.py``) — so the simplest
real video format needs no ffmpeg. This backs ``frame_sample`` for
``video/x-msvideo`` payloads: the container is parsed for the video
stream's frame rate and the ``movi`` chunks yield (timestamp_ms,
pixels) frames exactly like the animated-GIF path.

Container support: 'hdrl' main + stream headers (the first 'vids'
stream wins), word-aligned '##dc'/'##db' movi chunks, optional idx1
(ignored — chunks are scanned sequentially, which also tolerates
truncated indexes). Non-MJPEG codecs (DIB, H.264, …) raise ValueError
→ the multimodal operators surface a per-row error, no fake frames.

Like the sibling codecs this is executor-side work over Arrow batches;
per-payload cost is bounded by total pixel count.

Parity note: the reference (zoedsoupe/peri) has no media layer; this
backs the SURVEY.md multimodal directive.
"""

from __future__ import annotations

import struct

import numpy as np

from .jpeg import decode_jpeg, encode_jpeg

__all__ = ["decode_avi_frames", "scan_avi_frames", "decode_avi_audio",
           "encode_avi_mjpeg"]


def _chunks(buf: bytes, pos: int, end: int):
    """Yield (fourcc, body_start, body_size) over a RIFF chunk run;
    chunks are word-aligned (odd sizes padded with one byte)."""
    while pos + 8 <= end:
        fcc = buf[pos:pos + 4]
        (size,) = struct.unpack_from("<I", buf, pos + 4)
        body = pos + 8
        if body + size > end:
            raise ValueError("truncated AVI chunk")
        yield fcc, body, size
        pos = body + size + (size & 1)


def _parse_container(payload: bytes):
    """Single shared walk of the AVI container structure used by the
    frame scan, the audio decode, and the header probe — so bounds
    handling and stream indexing can never drift between them.

    Returns (avih_fields, streams, movi) where avih_fields is the
    unpacked main header ints (possibly empty), streams is a list of
    {"type", "handler", "scale", "rate", "length", "strf"} dicts in
    container order, and movi = (start, end) of the movi LIST body.
    """
    if len(payload) < 12 or payload[:4] != b"RIFF" \
            or payload[8:12] != b"AVI ":
        raise ValueError("not an AVI payload")
    end = min(8 + struct.unpack_from("<I", payload, 4)[0], len(payload))
    avih: tuple = ()
    streams: list[dict] = []
    movi = None
    for fcc, body, size in _chunks(payload, 12, end):
        if fcc != b"LIST":
            continue
        kind = payload[body:body + 4]
        if kind == b"hdrl":
            for f2, b2, s2 in _chunks(payload, body + 4, body + size):
                if f2 == b"avih" and s2 >= 40:
                    avih = struct.unpack_from("<10I", payload, b2)
                elif f2 == b"LIST" and payload[b2:b2 + 4] == b"strl":
                    st: dict = {"type": None, "handler": b"",
                                "scale": 0, "rate": 0, "length": 0,
                                "strf": b""}
                    streams.append(st)
                    for f3, b3, s3 in _chunks(payload, b2 + 4, b2 + s2):
                        if f3 == b"strh" and s3 >= 32:
                            st["type"] = payload[b3:b3 + 4]
                            st["handler"] = payload[b3 + 4:b3 + 8]
                            st["scale"], st["rate"] = struct.unpack_from(
                                "<II", payload, b3 + 20)
                            st["length"] = struct.unpack_from(
                                "<I", payload, b3 + 32)[0] \
                                if s3 >= 36 else 0
                        elif f3 == b"strf":
                            st["strf"] = payload[b3:b3 + s3]
        elif kind == b"movi":
            movi = (body + 4, body + size)
    return avih, streams, movi


def _movi_stream_chunks(payload: bytes, movi: tuple, stream_no: int,
                        suffixes: tuple):
    """Yield (body, size) for one stream's movi chunks (including
    zero-size dropped-frame placeholders), recursing one level into
    'rec ' LIST groupings."""
    want = b"%02d" % stream_no
    for fcc, body, size in _chunks(payload, movi[0], movi[1]):
        if fcc == b"LIST":
            for f2, b2, s2 in _chunks(payload, body + 4, body + size):
                if f2[:2] == want and f2[2:4] in suffixes:
                    yield b2, s2
        elif fcc[:2] == want and fcc[2:4] in suffixes:
            yield body, size


def scan_avi_frames(payload: bytes) -> list[tuple[int, bytes]]:
    """Parse an MJPEG AVI container → [(timestamp_ms, jpeg_bytes), …]
    WITHOUT decoding pixels — MJPEG frames are independent, so callers
    that sample (``frame_sample``) decode only the frames they keep,
    bounding memory by sampled count instead of clip pixel count.

    Slot i is on screen over [i·dt, (i+1)·dt) where dt comes from the
    video stream header (dwScale/dwRate), falling back to the main
    header's microseconds-per-frame. A zero-size chunk is a dropped
    capture frame: the previous frame persists through that slot (its
    slot still advances the clock). Raises ValueError for non-AVI
    payloads and non-MJPEG video streams.
    """
    avih, streams, movi = _parse_container(payload)
    stream_no = next((i for i, s in enumerate(streams)
                      if s["type"] == b"vids"), None)
    if stream_no is None:
        raise ValueError("AVI with no video stream")
    st = streams[stream_no]
    if st["handler"].upper() not in (b"MJPG", b"JPEG",
                                     b"\x00\x00\x00\x00"):
        raise ValueError("no stdlib codec for AVI video "
                         f"handler {st['handler']!r}")
    if movi is None:
        raise ValueError("AVI with no movi data")
    if st["rate"] > 0 and st["scale"] > 0:
        dt_ms = 1000.0 * st["scale"] / st["rate"]
    elif avih and avih[0] > 0:
        dt_ms = avih[0] / 1000.0       # microseconds per frame
    else:
        raise ValueError("AVI with no frame timing")

    frames: list[tuple[int, bytes]] = []
    slot = 0   # advances on EVERY video chunk incl. zero-size dropped
    # frames, so timestamps stay aligned to the stream clock
    for body, size in _movi_stream_chunks(payload, movi, stream_no,
                                          (b"dc", b"db")):
        if size:
            frames.append((int(round(slot * dt_ms)),
                           payload[body:body + size]))
        slot += 1
    if not frames:
        raise ValueError("AVI with no video frames")
    return frames


def decode_avi_frames(payload: bytes) -> list[tuple[int, np.ndarray]]:
    """Parse an MJPEG AVI → [(timestamp_ms, uint8 (H, W, C)), …] with
    every frame decoded. See ``scan_avi_frames`` for the lazy container
    scan (preferred when only a subset of frames is needed)."""
    return [(t, decode_jpeg(j)) for t, j in scan_avi_frames(payload)]


def decode_avi_audio(payload: bytes) -> tuple[np.ndarray, int]:
    """Extract the first PCM16 'auds' stream → (int16 (n, channels),
    rate_hz) — same shape contract as ``codecs.decode_wav``. Raises
    ValueError for non-AVI payloads and when no PCM16 stream exists
    (compressed-only audio reports the first stream's format tag).
    """
    _, streams, movi = _parse_container(payload)
    stream_no = None
    rate = channels = None
    bad = None
    for i, st in enumerate(streams):
        if st["type"] != b"auds" or len(st["strf"]) < 16:
            continue
        tag, ch, hz = struct.unpack_from("<HHI", st["strf"])
        bits = struct.unpack_from("<H", st["strf"], 14)[0]
        if tag == 1 and bits == 16 and ch >= 1 and hz >= 1:
            stream_no, channels, rate = i, ch, hz
            break                      # first DECODABLE stream wins
        if bad is None:
            bad = (tag, bits)
    if stream_no is None:
        if bad is not None:
            raise ValueError("no stdlib codec for AVI audio format "
                             f"tag {bad[0]} ({bad[1]}-bit)")
        raise ValueError("AVI with no PCM audio stream")
    if movi is None:
        raise ValueError("AVI with no movi data")
    pieces = [payload[body:body + size]
              for body, size in _movi_stream_chunks(
                  payload, movi, stream_no, (b"wb",)) if size]
    if not pieces:
        raise ValueError("AVI audio stream with no data chunks")
    raw = b"".join(pieces)
    frame_bytes = 2 * channels
    raw = raw[:len(raw) - (len(raw) % frame_bytes)]
    if not raw:
        raise ValueError("AVI audio stream with no samples")
    return (np.frombuffer(raw, dtype="<i2").reshape(-1, channels),
            rate)


def encode_avi_mjpeg(frames: list[np.ndarray], fps: float = 10.0,
                     quality: int = 85,
                     audio: tuple[np.ndarray, int] | None = None) -> bytes:
    """Encode uint8 (H, W, 3) frames → a minimal MJPEG AVI (fixture /
    sink use). All frames must share one shape; ``fps`` sets the stream
    dwRate/dwScale timing the decoder reads back. ``audio`` optionally
    adds a PCM16 'auds' stream as (int16 samples (n,) or (n, ch),
    rate_hz)."""
    if not frames:
        raise ValueError("encode_avi_mjpeg wants at least one frame")
    h, w = frames[0].shape[:2]
    for f in frames:
        if f.shape[:2] != (h, w):
            raise ValueError("all AVI frames must share one shape")
    jpegs = [encode_jpeg(np.asarray(f, dtype=np.uint8), quality=quality)
             for f in frames]

    def chunk(fcc: bytes, body: bytes) -> bytes:
        return fcc + struct.pack("<I", len(body)) + body \
            + (b"\x00" if len(body) & 1 else b"")

    def list_chunk(kind: bytes, body: bytes) -> bytes:
        return chunk(b"LIST", kind + body)

    rate = max(int(round(fps * 1000)), 1)
    scale = 1000
    n_streams = 2 if audio is not None else 1
    avih = struct.pack("<14I", int(1_000_000 / fps), 0, 0, 0x10,
                       len(frames), 0, n_streams, 0, w, h, 0, 0, 0, 0)
    strh = b"vids" + b"MJPG" + struct.pack(
        "<IHHIIIIIIII4h", 0, 0, 0, 0, scale, rate, 0, len(frames),
        max(len(j) for j in jpegs), 0xFFFFFFFF & -1, 0,
        0, 0, w, h)
    strf = struct.pack("<IiiHH4sIiiII", 40, w, h, 1, 24, b"MJPG",
                       w * h * 3, 0, 0, 0, 0)
    strl_v = list_chunk(b"strl", chunk(b"strh", strh)
                        + chunk(b"strf", strf))
    strl_a = b""
    audio_chunk = b""
    if audio is not None:
        samples, arate = audio
        s = np.asarray(samples, dtype=np.int16)
        if s.ndim == 1:
            s = s[:, None]
        ch = s.shape[1]
        block = 2 * ch
        strh_a = b"auds" + bytes(4) + struct.pack(
            "<IHHIIIIIIII4h", 0, 0, 0, 0, 1, arate, 0, len(s),
            len(s) * block, 0xFFFFFFFF, block, 0, 0, 0, 0)
        strf_a = struct.pack("<HHIIHH", 1, ch, arate, arate * block,
                             block, 16)
        strl_a = list_chunk(b"strl", chunk(b"strh", strh_a)
                            + chunk(b"strf", strf_a))
        audio_chunk = chunk(b"01wb", s.tobytes())
    hdrl = list_chunk(b"hdrl", chunk(b"avih", avih) + strl_v + strl_a)
    movi_body = audio_chunk + b"".join(chunk(b"00dc", j) for j in jpegs)
    movi = list_chunk(b"movi", movi_body)
    # idx1: offsets are relative to the start of 'movi' kind fourcc
    idx = b""
    off = 4 + len(audio_chunk)
    for j in jpegs:
        idx += b"00dc" + struct.pack("<III", 0x10, off, len(j))
        off += 8 + len(j) + (len(j) & 1)
    body = b"AVI " + hdrl + movi + chunk(b"idx1", idx)
    return b"RIFF" + struct.pack("<I", len(body)) + body
