"""Real pure-stdlib/numpy media codecs for the multimodal operators.

The container has no PIL/ffmpeg, but PNG, BMP, PPM/PGM, WAV, GIF and
baseline JPEG need nothing beyond ``zlib``/``struct`` (stdlib) and
numpy — so the formats a scraped corpus actually contains get REAL
decode/encode/resize here, and the multimodal mapInPandas operators
(functions/multimodal.py) dispatch on magic bytes: real codec when the
payload is one of these formats, the documented deterministic fallback
for everything else (MP4 pixel decode stays a fallback — H.264/5
genuinely need the external libraries; progressive JPEG decodes for
real since round 5).

All functions are plain bytes/ndarray transforms — no Spark imports —
so they run inside Arrow batches on executors with zero driver state.

Parity note: the reference (zoedsoupe/peri) has no media layer; this
module backs the SURVEY.md LLM-pipeline multimodal directive.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

from .avi import (decode_avi_audio, decode_avi_frames,  # noqa: F401
                  encode_avi_mjpeg, scan_avi_frames)
from .jpeg import decode_jpeg, encode_jpeg  # noqa: F401 (re-export)

__all__ = [
    "sniff_format", "decode_image", "encode_png", "resize_nearest",
    "decode_png", "decode_bmp", "decode_ppm", "decode_wav",
    "encode_wav_pcm16", "decode_gif_frames", "encode_gif",
    "decode_jpeg", "encode_jpeg", "decode_avi_frames",
    "scan_avi_frames", "decode_avi_audio", "encode_avi_mjpeg",
    "DECODABLE_IMAGE_FORMATS",
]

# the formats decode_image can really decode — the multimodal operators
# dispatch on this ONE set (adding a codec here enables it everywhere)
DECODABLE_IMAGE_FORMATS = frozenset({"png", "bmp", "ppm", "gif", "jpeg"})

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def sniff_format(payload: bytes) -> str | None:
    """Magic-byte format sniff:
    'png' | 'bmp' | 'ppm' | 'wav' | 'gif' | 'jpeg' | 'avi' | None."""
    if not payload:
        return None
    if payload[:8] == _PNG_SIG:
        return "png"
    if payload[:6] in (b"GIF87a", b"GIF89a"):
        return "gif"
    if payload[:3] == b"\xff\xd8\xff":
        return "jpeg"
    if payload[:2] == b"BM":
        return "bmp"
    if payload[:2] in (b"P5", b"P6"):
        return "ppm"
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        return "wav"
    if payload[:4] == b"RIFF" and payload[8:12] == b"AVI ":
        return "avi"
    return None


# ---------------------------------------------------------------------------
# PNG
# ---------------------------------------------------------------------------

def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def _png_unfilter(raw: bytes, pos: int, height: int, width: int,
                  channels: int) -> tuple[np.ndarray, int]:
    """Reverse PNG scanline filters over one (sub)image starting at
    ``raw[pos]``; returns ((H, W, C) uint8, next pos)."""
    stride = width * channels
    if len(raw) - pos < height * (stride + 1):
        raise ValueError("short PNG pixel data")
    out = np.empty((height, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    bpp = channels
    for y in range(height):
        ftype = raw[pos]
        line = bytearray(raw[pos + 1:pos + 1 + stride])
        pos += 1 + stride
        if ftype == 1:        # Sub
            for x in range(bpp, stride):
                line[x] = (line[x] + line[x - bpp]) & 0xFF
        elif ftype == 2:      # Up
            line = bytearray(
                (np.frombuffer(bytes(line), dtype=np.uint8) + prev)
                .astype(np.uint8).tobytes())
        elif ftype == 3:      # Average
            for x in range(stride):
                left = line[x - bpp] if x >= bpp else 0
                line[x] = (line[x] + ((left + int(prev[x])) >> 1)) & 0xFF
        elif ftype == 4:      # Paeth
            for x in range(stride):
                left = line[x - bpp] if x >= bpp else 0
                ul = int(prev[x - bpp]) if x >= bpp else 0
                line[x] = (line[x]
                           + _paeth(left, int(prev[x]), ul)) & 0xFF
        elif ftype != 0:
            raise ValueError(f"bad PNG filter {ftype}")
        prev = np.frombuffer(bytes(line), dtype=np.uint8)
        out[y] = prev
    return out.reshape(height, width, channels), pos


# Adam7 interlace passes: (x_start, y_start, x_step, y_step)
_ADAM7 = ((0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
          (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2))


def decode_png(payload: bytes) -> np.ndarray:
    """Decode PNG → uint8 array (H, W, C). Supports bit depth 8, color
    types 0 (gray), 2 (RGB), 3 (palette, + tRNS alpha → RGBA),
    4 (gray+alpha), 6 (RGBA), and Adam7 interlacing — i.e. everything
    ``encode_png`` and common tool exports produce except 1/2/4/16-bit
    depths."""
    if payload[:8] != _PNG_SIG:
        raise ValueError("not a PNG")
    pos, width, height, channels, color = 8, None, None, None, None
    interlace = 0
    plte, trns = None, None
    idat = b""
    while pos + 8 <= len(payload):
        (length,), ctype = struct.unpack(">I", payload[pos:pos + 4]), \
            payload[pos + 4:pos + 8]
        data = payload[pos + 8:pos + 8 + length]
        pos += 12 + length  # length + type + data + crc
        if ctype == b"IHDR":
            width, height, depth, color, _comp, _filt, interlace = \
                struct.unpack(">IIBBBBB", data)
            if depth != 8:
                raise ValueError(f"unsupported PNG bit depth {depth}")
            channels = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}.get(color)
            if channels is None:
                raise ValueError(f"unsupported PNG color type {color}")
        elif ctype == b"PLTE":
            plte = np.frombuffer(data, dtype=np.uint8).reshape(-1, 3)
        elif ctype == b"tRNS":
            trns = np.frombuffer(data, dtype=np.uint8)
        elif ctype == b"IDAT":
            idat += data
        elif ctype == b"IEND":
            break
    if width is None or not idat:
        raise ValueError("truncated PNG")
    raw = zlib.decompress(idat)
    if interlace:  # Adam7: 7 independently-filtered sub-images
        img = np.zeros((height, width, channels), dtype=np.uint8)
        at = 0
        for x0, y0, dx, dy in _ADAM7:
            pw = (width - x0 + dx - 1) // dx
            ph = (height - y0 + dy - 1) // dy
            if pw <= 0 or ph <= 0:
                continue
            sub, at = _png_unfilter(raw, at, ph, pw, channels)
            img[y0::dy, x0::dx] = sub
    else:
        img, _ = _png_unfilter(raw, 0, height, width, channels)
    if color == 3:  # palette indices → RGB(A)
        if plte is None:
            raise ValueError("paletted PNG without PLTE")
        idx = np.clip(img[:, :, 0], 0, len(plte) - 1)
        rgb = plte[idx]
        if trns is not None:
            alpha = np.full(len(plte), 255, dtype=np.uint8)
            alpha[:len(trns)] = trns
            return np.dstack([rgb, alpha[idx]])
        return rgb
    return img


def encode_png(arr: np.ndarray) -> bytes:
    """Encode uint8 (H, W) or (H, W, C∈{1,2,3,4}) → PNG bytes (filter 0,
    one zlib stream). Deterministic: fixed compression level 6."""
    a = np.asarray(arr, dtype=np.uint8)
    if a.ndim == 2:
        a = a[:, :, None]
    h, w, c = a.shape
    color = {1: 0, 2: 4, 3: 2, 4: 6}[c]
    raw = b"".join(b"\x00" + a[y].tobytes() for y in range(h))
    comp = zlib.compress(raw, 6)

    def chunk(ctype: bytes, data: bytes) -> bytes:
        body = ctype + data
        return (struct.pack(">I", len(data)) + body
                + struct.pack(">I", zlib.crc32(body) & 0xFFFFFFFF))

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    return (_PNG_SIG + chunk(b"IHDR", ihdr) + chunk(b"IDAT", comp)
            + chunk(b"IEND", b""))


# ---------------------------------------------------------------------------
# BMP (24-bit uncompressed BI_RGB) and PPM/PGM (binary)
# ---------------------------------------------------------------------------

def decode_bmp(payload: bytes) -> np.ndarray:
    """Decode 24-bit uncompressed BMP → uint8 (H, W, 3) RGB."""
    if payload[:2] != b"BM":
        raise ValueError("not a BMP")
    data_off = struct.unpack("<I", payload[10:14])[0]
    hdr_size = struct.unpack("<I", payload[14:18])[0]
    if hdr_size < 40:
        raise ValueError("unsupported BMP header")
    w, h = struct.unpack("<ii", payload[18:26])
    planes, depth = struct.unpack("<HH", payload[26:30])
    comp = struct.unpack("<I", payload[30:34])[0]
    # 24-bit BI_RGB, or 32-bit BI_RGB / BI_BITFIELDS with the standard
    # BGRA layout (the overwhelmingly common 32-bit export)
    if not ((depth == 24 and comp == 0)
            or (depth == 32 and comp in (0, 3))):
        raise ValueError(f"unsupported BMP depth={depth} comp={comp}")
    bypp = depth // 8
    flipped = h > 0
    h = abs(h)
    stride = (w * bypp + 3) & ~3
    px = np.frombuffer(payload, dtype=np.uint8,
                       count=stride * h, offset=data_off)
    rows = px.reshape(h, stride)[:, :w * bypp].reshape(h, w, bypp)
    if bypp == 4:                    # BGRA → RGB (alpha dropped)
        rows = rows[:, :, :3]
    if flipped:                      # BMP stores bottom-up
        rows = rows[::-1]
    return rows[:, :, ::-1].copy()   # BGR → RGB


def decode_ppm(payload: bytes) -> np.ndarray:
    """Decode binary PPM (P6) / PGM (P5), maxval ≤255."""
    magic = payload[:2]
    if magic not in (b"P5", b"P6"):
        raise ValueError("not a binary PPM/PGM")
    # header: magic, whitespace-separated w h maxval (comments allowed)
    vals, pos = [], 2
    while len(vals) < 3:
        while pos < len(payload) and payload[pos:pos + 1].isspace():
            pos += 1
        if payload[pos:pos + 1] == b"#":
            while pos < len(payload) and payload[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos:pos + 1].isspace():
            pos += 1
        vals.append(int(payload[start:pos]))
    pos += 1  # single whitespace after maxval
    w, h, maxval = vals[0], vals[1], vals[2]
    if maxval > 255:
        raise ValueError("16-bit PPM unsupported")
    c = 3 if magic == b"P6" else 1
    px = np.frombuffer(payload, dtype=np.uint8, count=w * h * c, offset=pos)
    return px.reshape(h, w, c).copy()


# ---------------------------------------------------------------------------
# WAV (PCM 16-bit)
# ---------------------------------------------------------------------------

def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """Decode RIFF/WAVE PCM16 → (samples int16 (n, channels), rate_hz)."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a WAV")
    pos, rate, channels, bits, data = 12, None, None, None, None
    while pos + 8 <= len(payload):
        cid = payload[pos:pos + 4]
        size = struct.unpack("<I", payload[pos + 4:pos + 8])[0]
        body = payload[pos + 8:pos + 8 + size]
        pos += 8 + size + (size & 1)
        if cid == b"fmt ":
            fmt, channels, rate = struct.unpack("<HHI", body[:8])
            bits = struct.unpack("<H", body[14:16])[0]
            if fmt != 1 or bits != 16:
                raise ValueError(f"unsupported WAV fmt={fmt} bits={bits}")
        elif cid == b"data":
            if len(body) < size:
                raise ValueError(
                    f"truncated WAV data chunk: {len(body)} of {size} bytes")
            data = body
    if rate is None or data is None:
        raise ValueError("truncated WAV")
    n = len(data) // (2 * channels)
    if n == 0:
        raise ValueError("WAV with no samples")
    samples = np.frombuffer(data, dtype="<i2", count=n * channels)
    return samples.reshape(n, channels).copy(), rate


def encode_wav_pcm16(samples: np.ndarray, rate_hz: int) -> bytes:
    """Encode int16 (n,) or (n, channels) → RIFF/WAVE PCM16 bytes."""
    a = np.asarray(samples, dtype="<i2")
    if a.ndim == 1:
        a = a[:, None]
    n, ch = a.shape
    data = a.tobytes()
    fmt = struct.pack("<HHIIHH", 1, ch, rate_hz, rate_hz * ch * 2, ch * 2, 16)
    body = (b"WAVEfmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(data)) + data)
    return b"RIFF" + struct.pack("<I", len(body)) + body


# ---------------------------------------------------------------------------
# Decode dispatch + resize
# ---------------------------------------------------------------------------

def decode_image(payload: bytes) -> np.ndarray:
    """Dispatch on magic bytes → uint8 (H, W, C). Raises ValueError for
    formats without a pure-stdlib codec (MP4, …) and for the JPEG
    variants outside baseline/progressive DCT (arithmetic, 12-bit)."""
    fmt = sniff_format(payload)
    if fmt == "png":
        return decode_png(payload)
    if fmt == "bmp":
        return decode_bmp(payload)
    if fmt == "ppm":
        return decode_ppm(payload)
    if fmt == "jpeg":
        return decode_jpeg(payload)
    if fmt == "gif":  # still image = first composited frame
        frames = decode_gif_frames(payload)
        if not frames:
            raise ValueError("GIF with no frames")
        return frames[0][1]
    raise ValueError(f"no stdlib codec for format {fmt or 'unknown'}")


def resize_nearest(arr: np.ndarray, target_w: int, target_h: int,
                   fit: bool = True) -> np.ndarray:
    """Nearest-neighbor resize (deterministic, pure numpy indexing).

    ``fit=True`` preserves aspect ratio inside the target box and never
    upscales (the multimodal resize contract); ``fit=False`` maps to the
    exact target dims."""
    h, w = arr.shape[:2]
    if fit:
        scale = min(target_w / w, target_h / h, 1.0)
        tw, th = max(int(w * scale), 1), max(int(h * scale), 1)
    else:
        tw, th = max(target_w, 1), max(target_h, 1)
    ys = np.minimum((np.arange(th) * (h / th)).astype(np.int64), h - 1)
    xs = np.minimum((np.arange(tw) * (w / tw)).astype(np.int64), w - 1)
    return arr[ys][:, xs]


# ---------------------------------------------------------------------------
# GIF (87a/89a) — animated frame decode + LZW encode
# ---------------------------------------------------------------------------
# The one multi-frame format a pure-stdlib codec can fully handle, which
# makes video-style frame sampling REAL (multimodal.frame_sample):
# variable-width LZW, local/global palettes, transparency, disposal
# methods 0-3, interlacing. Python-loop LZW is fine here: work is
# bounded per payload and runs inside executor Arrow batches.

def _gif_lzw_decode(data: bytes, min_code_size: int) -> list[int]:
    clear, eoi = 1 << min_code_size, (1 << min_code_size) + 1
    table = [[i] for i in range(clear)] + [None, None]
    width = min_code_size + 1
    out: list[int] = []
    prev: list[int] | None = None
    acc = nbits = 0
    for byte in data:
        acc |= byte << nbits
        nbits += 8
        while nbits >= width:
            code = acc & ((1 << width) - 1)
            acc >>= width
            nbits -= width
            if code == clear:
                table = [[i] for i in range(clear)] + [None, None]
                width = min_code_size + 1
                prev = None
                continue
            if code == eoi:
                return out
            if prev is None:
                if code >= len(table) or table[code] is None:
                    raise ValueError(f"corrupt LZW stream: code {code}")
                entry = table[code]
            elif code < len(table) and table[code] is not None:
                entry = table[code]
                table.append(prev + [entry[0]])
            elif code == len(table):  # the only valid KwKwK code
                entry = prev + [prev[0]]
                table.append(entry)
            else:  # out-of-range ≠ KwKwK: garbage, not pixels
                raise ValueError(f"corrupt LZW stream: code {code} "
                                 f"with table size {len(table)}")
            out.extend(entry)
            prev = entry
            if len(table) == (1 << width) and width < 12:
                width += 1
    return out


def _gif_lzw_encode(indices: list[int], min_code_size: int) -> bytes:
    clear, eoi = 1 << min_code_size, (1 << min_code_size) + 1
    codes: list[tuple[int, int]] = []  # (code, width-at-emit)
    table = {(i,): i for i in range(clear)}
    next_code = eoi + 1
    width = min_code_size + 1
    codes.append((clear, width))
    buf: tuple[int, ...] = ()
    for idx in indices:
        cand = buf + (idx,)
        if cand in table:
            buf = cand
            continue
        codes.append((table[buf], width))
        table[cand] = next_code
        next_code += 1
        if next_code > (1 << width) and width < 12:
            width += 1
        if next_code >= (1 << 12):
            codes.append((clear, width))
            table = {(i,): i for i in range(clear)}
            next_code = eoi + 1
            width = min_code_size + 1
        buf = (idx,)
    if buf:
        codes.append((table[buf], width))
    codes.append((eoi, width))
    acc = nbits = 0
    out = bytearray()
    for code, w in codes:
        acc |= code << nbits
        nbits += w
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


_GIF_INTERLACE = ((0, 8), (4, 8), (2, 4), (1, 2))


def decode_gif_frames(payload: bytes) -> list[tuple[int, np.ndarray]]:
    """Decode an (animated) GIF into ``[(t_ms, frame)]`` where ``t_ms``
    is the frame's display-start time (cumulative delays) and ``frame``
    is the COMPOSITED uint8 (H, W, 3) canvas at that instant."""
    if payload[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF")
    W, H, packed, bg_idx, _ar = struct.unpack("<HHBBB", payload[6:13])
    pos = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        gct = np.frombuffer(payload[pos:pos + 3 * n],
                            dtype=np.uint8).reshape(n, 3)
        pos += 3 * n
    canvas = np.zeros((H, W, 3), dtype=np.uint8)
    if gct is not None and bg_idx < len(gct):
        canvas[:, :] = gct[bg_idx]
    frames: list[tuple[int, np.ndarray]] = []
    t_ms = 0
    delay_ms, transp, disposal = 0, None, 0

    def _subblocks(p: int) -> tuple[bytes, int]:
        chunks = []
        while True:
            ln = payload[p]
            p += 1
            if ln == 0:
                return b"".join(chunks), p
            chunks.append(payload[p:p + ln])
            p += ln

    while pos < len(payload):
        b0 = payload[pos]
        pos += 1
        if b0 == 0x3B:  # trailer
            break
        if b0 == 0x21:  # extension
            label = payload[pos]
            pos += 1
            if label == 0xF9:  # graphic control
                blk, pos = _subblocks(pos)
                gc_packed, delay_cs, t_idx = struct.unpack("<BHB", blk[:4])
                disposal = (gc_packed >> 2) & 0x07
                transp = t_idx if gc_packed & 0x01 else None
                delay_ms = delay_cs * 10
            else:  # comment / app / plain-text: skip
                _, pos = _subblocks(pos)
            continue
        if b0 != 0x2C:
            raise ValueError(f"bad GIF block 0x{b0:02x} at {pos - 1}")
        left, top, fw, fh, ipacked = struct.unpack("<HHHHB",
                                                   payload[pos:pos + 9])
        pos += 9
        pal = gct
        if ipacked & 0x80:
            n = 2 << (ipacked & 0x07)
            pal = np.frombuffer(payload[pos:pos + 3 * n],
                                dtype=np.uint8).reshape(n, 3)
            pos += 3 * n
        if pal is None:
            raise ValueError("GIF frame without a color table")
        min_code = payload[pos]
        pos += 1
        data, pos = _subblocks(pos)
        decoded = _gif_lzw_decode(data, min_code)
        if len(decoded) < fw * fh:
            raise ValueError(f"truncated GIF image data: "
                             f"{len(decoded)} of {fw * fh} pixels")
        idx = np.asarray(decoded, dtype=np.int32)[:fw * fh].reshape(fh, fw)
        if ipacked & 0x40:  # deinterlace
            ordered = np.empty_like(idx)
            r = 0
            for start, step in _GIF_INTERLACE:
                rows = range(start, fh, step)
                ordered[list(rows)] = idx[r:r + len(rows)]
                r += len(rows)
            idx = ordered
        # clip frames that overhang the logical screen (renderers clip;
        # such slightly out-of-spec GIFs are common in scraped corpora)
        ch, cw = max(min(fh, H - top), 0), max(min(fw, W - left), 0)
        idx = idx[:ch, :cw]
        prev_region = canvas[top:top + ch, left:left + cw].copy()
        region = pal[np.clip(idx, 0, len(pal) - 1)]
        if transp is not None:
            mask = (idx == transp)[:, :, None]
            region = np.where(mask, canvas[top:top + ch, left:left + cw],
                              region)
        canvas[top:top + ch, left:left + cw] = region
        frames.append((t_ms, canvas.copy()))
        t_ms += delay_ms
        if disposal == 2:  # restore to background
            bg = gct[bg_idx] if (gct is not None and bg_idx < len(gct)) \
                else np.zeros(3, dtype=np.uint8)
            canvas[top:top + ch, left:left + cw] = bg
        elif disposal == 3:  # restore to previous
            canvas[top:top + ch, left:left + cw] = prev_region
        delay_ms, transp, disposal = 0, None, 0
    return frames


def encode_gif(frames: list[np.ndarray], delays_ms: list[int]) -> bytes:
    """Encode uint8 (H, W, 3) frames as an animated GIF89a (real LZW,
    one global palette built from the frames; ≤256 distinct colors)."""
    if not frames or len(frames) != len(delays_ms):
        raise ValueError("frames/delays mismatch")
    H, W = frames[0].shape[:2]
    if any(f.shape != frames[0].shape for f in frames):
        raise ValueError("all frames must share one (H, W, 3) shape")
    flat = np.concatenate([f.reshape(-1, 3) for f in frames])
    colors, inverse = np.unique(flat, axis=0, return_inverse=True)
    if len(colors) > 256:
        raise ValueError(f"{len(colors)} colors > 256; quantize first")
    depth = max(int(np.ceil(np.log2(max(len(colors), 2)))), 1)
    n_pal = 1 << depth
    pal = np.zeros((n_pal, 3), dtype=np.uint8)
    pal[:len(colors)] = colors
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", W, H, 0x80 | (depth - 1), 0, 0)
    out += pal.tobytes()
    per_frame = W * H
    min_code = max(depth, 2)
    for i, (frame, delay) in enumerate(zip(frames, delays_ms)):
        out += b"\x21\xf9\x04" + struct.pack("<BHB", 0, delay // 10, 0) \
            + b"\x00"
        out += b"\x2c" + struct.pack("<HHHHB", 0, 0, W, H, 0)
        out.append(min_code)
        idx = inverse[i * per_frame:(i + 1) * per_frame].tolist()
        lzw = _gif_lzw_encode(idx, min_code)
        for off in range(0, len(lzw), 255):
            chunk = lzw[off:off + 255]
            out.append(len(chunk))
            out += chunk
        out.append(0)
    out.append(0x3B)
    return bytes(out)
