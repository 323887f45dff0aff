"""Baseline JPEG (JFIF) decode + encode in pure stdlib + numpy.

Baseline sequential DCT JPEG is a fully-specified bitstream (ITU T.81):
Huffman entropy coding, 8x8 DCT blocks, YCbCr with optional chroma
subsampling. Nothing in it needs a native library — only careful bit
I/O and an (I)DCT, which numpy expresses as two small matrix products
per block. This module backs ``codecs.decode_image`` for the single
most common scraped-corpus image format; arithmetic-coded / 12-bit /
hierarchical JPEGs raise ValueError (→ the multimodal operators fall
back).

Decoder supports: SOF0 (baseline) and SOF2 (progressive: spectral
selection + successive approximation per Annex G — DC/AC first and
refinement scans, EOB runs, non-interleaved AC grids), 1 or 3
components, any h/v sampling factors up to 2 (4:4:4, 4:2:2, 4:2:0),
restart intervals, multiple DQT/DHT segments, byte stuffing. Encoders
emit single-scan interleaved SOF0 (Annex-K tables, quality-scaled) or
scripted multi-scan SOF2; both transmit identical quantized
coefficients, so their decodes are pixel-identical — the progressive
decoder's parity gate.

Like the sibling GIF/PNG codecs this is executor-side work over Arrow
batches; per-payload cost is bounded by pixel count (vectorized per
8x8 block column, Python loop only over blocks).

Parity note: the reference (zoedsoupe/peri) has no media layer; this
backs the SURVEY.md multimodal directive.
"""

from __future__ import annotations

import functools
import re
import struct

import numpy as np

__all__ = ["decode_jpeg", "encode_jpeg", "encode_jpeg_progressive"]

# ---------------------------------------------------------------------------
# Tables (ITU T.81 Annex K)
# ---------------------------------------------------------------------------

_ZZ = np.array([
    0,  1,  8, 16,  9,  2,  3, 10, 17, 24, 32, 25, 18, 11,  4,  5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13,  6,  7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63])

_QT_LUM = np.array([
    16, 11, 10, 16, 24, 40, 51, 61, 12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56, 14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77, 24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101, 72, 92, 95, 98, 112, 100, 103, 99])

_QT_CHR = np.array([
    17, 18, 24, 47, 99, 99, 99, 99, 18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99, 47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99])

# (bits[1..16], values) — Annex K.3
_DC_LUM = ([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
           list(range(12)))
_DC_CHR = ([0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
           list(range(12)))
_AC_LUM = ([0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D], [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
    0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
    0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
    0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
    0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
    0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
    0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
    0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
    0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA])
_AC_CHR = ([0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77], [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
    0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
    0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
    0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
    0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
    0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
    0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
    0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
    0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
    0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
    0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
    0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA])

# 8x8 DCT-II basis: F = A @ f @ A.T, f = A.T @ F @ A
_A = np.array([[(np.sqrt(1 / 8) if u == 0 else 0.5)
                * np.cos((2 * x + 1) * u * np.pi / 16)
                for x in range(8)] for u in range(8)])


def _build_huff(bits: list[int], vals: list[int]):
    """Canonical JPEG Huffman: returns (decode map {(len, code): sym},
    encode map {sym: (code, len)})."""
    dec, enc = {}, {}
    code, k = 0, 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            sym = vals[k]
            dec[(ln, code)] = sym
            enc[sym] = (code, ln)
            code += 1
            k += 1
        code <<= 1
    return dec, enc


# ---------------------------------------------------------------------------
# Bit I/O
# ---------------------------------------------------------------------------

# a marker is FF followed by anything but a stuffed 00 or a restart code
_MARKER_RE = re.compile(b"\xff[^\x00\xd0-\xd7]")
_RST_RE = re.compile(b"\xff[\xd0-\xd7]")


def _entropy_segments(data: bytes, pos: int) -> list[bytes]:
    """Slice the scan's entropy data out of ``data`` starting at ``pos``,
    split it on restart markers, and un-stuff 0xFF00 → 0xFF once up
    front — the per-bit reader then never inspects markers."""
    return _entropy_span(data, pos)[0]


def _entropy_span(data: bytes, pos: int) -> tuple[list[bytes], int]:
    """(_entropy_segments result, position of the terminating marker)
    — progressive decoding resumes the marker walk there."""
    m = _MARKER_RE.search(data, pos)
    end = m.start() if m else len(data)
    return ([s.replace(b"\xff\x00", b"\xff")
             for s in _RST_RE.split(data[pos:end])], end)


@functools.lru_cache(maxsize=64)
def _huff_lut(bits: bytes, vals: bytes) -> list[int]:
    """16-bit peek lookup table from a DHT spec: entry = (code_len << 8)
    | symbol, 0 = invalid prefix. Cached on the raw wire bytes — real
    corpora overwhelmingly ship the identical Annex-K tables, so the
    65536-slot list builds once per executor, not once per image."""
    if len(bits) != 16 or len(vals) != sum(bits):
        raise ValueError("truncated JPEG DHT segment")
    lut = np.zeros(65536, dtype=np.int32)
    code, k = 0, 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            lo = code << (16 - ln)
            lut[lo:lo + (1 << (16 - ln))] = (ln << 8) | vals[k]
            code += 1
            k += 1
        code <<= 1
    return lut.tolist()        # Python list indexing beats np scalar


# ---------------------------------------------------------------------------
# Decoder
# ---------------------------------------------------------------------------

def decode_jpeg(payload: bytes) -> np.ndarray:
    """Decode baseline (SOF0) or progressive (SOF2) JFIF → uint8
    (H, W, 3) RGB or (H, W, 1) gray. Raises ValueError for corrupt/
    truncated streams and the variants outside those (arithmetic,
    12-bit, hierarchical, lossless)."""
    try:
        return _decode_jpeg(payload)
    except (struct.error, IndexError, KeyError) as e:
        # short segments surface as struct/index errors deep in the
        # parse; the documented contract is ValueError
        raise ValueError(f"corrupt JPEG stream: {e}") from e


def _decode_jpeg(payload: bytes) -> np.ndarray:
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG")
    pos = 2
    qts: dict[int, np.ndarray] = {}
    dc_tabs: dict[int, list] = {}
    ac_tabs: dict[int, list] = {}
    comps = None
    h = w = None
    restart = 0
    prog = False
    prog_state = None
    while pos + 4 <= len(payload):
        if payload[pos] != 0xFF:
            raise ValueError(f"bad JPEG marker sync at {pos}")
        m = payload[pos + 1]
        if m == 0xFF:          # T.81 B.1.1.2: optional fill bytes
            pos += 1
            continue
        pos += 2
        if m in (0xD8, 0x01) or 0xD0 <= m <= 0xD7:
            continue
        if m == 0xD9:
            break
        seglen = struct.unpack(">H", payload[pos:pos + 2])[0]
        seg = payload[pos + 2:pos + seglen]
        if m == 0xDB:                                # DQT
            o = 0
            while o < len(seg):
                pq, tq = seg[o] >> 4, seg[o] & 0x0F
                if pq != 0:
                    raise ValueError("16-bit quant tables unsupported")
                if len(seg) < o + 65:
                    raise ValueError("truncated JPEG DQT segment")
                tab = np.frombuffer(seg[o + 1:o + 65], dtype=np.uint8)
                qts[tq] = tab.astype(np.int32)
                o += 65
        elif m == 0xC4:                              # DHT
            o = 0
            while o < len(seg):
                tc, th = seg[o] >> 4, seg[o] & 0x0F
                bits = bytes(seg[o + 1:o + 17])
                nv = sum(bits)
                vals = bytes(seg[o + 17:o + 17 + nv])
                (dc_tabs if tc == 0 else ac_tabs)[th] = \
                    _huff_lut(bits, vals)
                o += 17 + nv
        elif m in (0xC0, 0xC2):       # SOF0 baseline / SOF2 progressive
            prog = (m == 0xC2)
            _prec, h, w, nc = struct.unpack(">BHHB", seg[:6])
            comps = []
            for i in range(nc):
                cid, samp, tq = seg[6 + 3 * i:9 + 3 * i]
                comps.append({"id": cid, "h": samp >> 4, "v": samp & 0x0F,
                              "tq": tq})
        elif m in (0xC1, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA,
                   0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError(f"non-baseline JPEG (SOF{m - 0xC0})")
        elif m == 0xDD:                              # DRI
            restart = struct.unpack(">H", seg[:2])[0]
        elif m == 0xDA:                              # SOS → entropy data
            if comps is None:
                raise ValueError("JPEG SOS before SOF")
            ns = seg[0]
            if prog:
                if prog_state is None:
                    prog_state = _prog_init(comps, h, w, qts)
                sel = []
                for i in range(ns):
                    cs, tt = seg[1 + 2 * i], seg[2 + 2 * i]
                    sel.append((cs, tt >> 4, tt & 0x0F))
                ss, se = seg[1 + 2 * ns], seg[2 + 2 * ns]
                ahal = seg[3 + 2 * ns]
                pos = _decode_prog_scan(
                    payload, pos + seglen, prog_state, sel, ss, se,
                    ahal >> 4, ahal & 0x0F, dc_tabs, ac_tabs, restart)
                continue
            if ns != len(comps):
                raise ValueError("non-interleaved JPEG scan unsupported")
            sel = {}
            for i in range(ns):
                cs, tt = seg[1 + 2 * i], seg[2 + 2 * i]
                sel[cs] = (tt >> 4, tt & 0x0F)
            for c in comps:
                if c["id"] not in sel:
                    raise ValueError("JPEG scan omits a SOF component")
                c["td"], c["ta"] = sel[c["id"]]
            return _decode_scan(payload, pos + seglen, comps, qts,
                                dc_tabs, ac_tabs, h, w, restart)
        pos += seglen
    if prog and prog_state is not None:
        return _prog_finish(prog_state)
    raise ValueError("truncated JPEG: no scan")


def _decode_scan(data, pos, comps, qts, dc_tabs, ac_tabs, h, w, restart):
    """Entropy-decode the interleaved scan.

    The Python loop only walks Huffman symbols (LUT peek + magnitude
    bits) and appends sparse (flat_index, value) coefficient triplets;
    dequantization, the IDCT, and block placement all happen ONCE per
    component as batched numpy ops over an (n_blocks, 8, 8) tensor."""
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    if hmax > 2 or vmax > 2 or any(c["h"] not in (1, 2) or
                                   c["v"] not in (1, 2) for c in comps):
        raise ValueError("sampling factors beyond 2 unsupported")
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    for c in comps:
        c["bw"] = mcux * c["h"]
        c["bh"] = mcuy * c["v"]
        c["pred"] = 0
        c["nb"] = 0          # blocks decoded so far (MCU-interleaved)
        c["idx"] = []        # flat coefficient index: block*64 + zigzag k
        c["val"] = []
        c["rows"] = []       # block grid position per decoded block
        c["cols"] = []
        if c["tq"] not in qts:
            raise ValueError("missing quant table")
        dct = dc_tabs.get(c["td"])
        act = ac_tabs.get(c["ta"])
        if dct is None or act is None:
            raise ValueError("missing Huffman table")
        c["dct"], c["act"] = dct, act
    segments = _entropy_segments(data, pos)
    seg_i = 0
    # inlined MSB-first bit reader (method calls cost more than the
    # arithmetic at ~400 K symbols/megapixel): fill the accumulator to
    # 32 bits once per symbol — a 16-bit LUT peek plus a ≤16-bit
    # magnitude read then never needs a mid-symbol refill
    dbuf = segments[0]
    dlen = len(dbuf)
    dpos = 0
    acc = 0
    nbits = 0
    n_mcu = mcux * mcuy
    for mi in range(n_mcu):
        if restart and mi and mi % restart == 0:
            seg_i += 1
            if seg_i >= len(segments):
                raise ValueError("corrupt JPEG: missing restart marker")
            dbuf = segments[seg_i]
            dlen = len(dbuf)
            dpos = 0
            acc = 0
            nbits = 0
            for c in comps:
                c["pred"] = 0
        my, mx = divmod(mi, mcux)
        for c in comps:
            dct, act = c["dct"], c["act"]
            idx, val = c["idx"], c["val"]
            pred = c["pred"]
            for by in range(c["v"]):
                for bx in range(c["h"]):
                    base = c["nb"] * 64
                    c["nb"] += 1
                    c["rows"].append(my * c["v"] + by)
                    c["cols"].append(mx * c["h"] + bx)
                    while nbits < 32:
                        acc = (acc << 8) | (dbuf[dpos]
                                            if dpos < dlen else 0xFF)
                        dpos += 1
                        nbits += 8
                    e = dct[(acc >> (nbits - 16)) & 0xFFFF]
                    if not e:
                        raise ValueError("corrupt JPEG: bad Huffman code")
                    nbits -= e >> 8
                    s = e & 0xFF
                    if s:
                        nbits -= s
                        v = (acc >> nbits) & ((1 << s) - 1)
                        pred += v if v >= (1 << (s - 1)) \
                            else v - (1 << s) + 1
                    idx.append(base)
                    val.append(pred)
                    k = 1
                    while k < 64:
                        while nbits < 32:
                            acc = (acc << 8) | (dbuf[dpos]
                                                if dpos < dlen else 0xFF)
                            dpos += 1
                            nbits += 8
                        acc &= (1 << nbits) - 1
                        e = act[(acc >> (nbits - 16)) & 0xFFFF]
                        if not e:
                            raise ValueError(
                                "corrupt JPEG: bad Huffman code")
                        nbits -= e >> 8
                        rs = e & 0xFF
                        ss = rs & 0x0F
                        if ss == 0:
                            if rs == 0xF0:
                                k += 16        # ZRL
                                continue
                            break              # EOB
                        k += rs >> 4
                        if k > 63:
                            raise ValueError("corrupt JPEG: AC overrun")
                        nbits -= ss
                        v = (acc >> nbits) & ((1 << ss) - 1)
                        idx.append(base + k)
                        val.append(v if v >= (1 << (ss - 1))
                                   else v - (1 << ss) + 1)
                        k += 1
            c["pred"] = pred
    for c in comps:
        nb = c["nb"]
        coefs = np.zeros(nb * 64, dtype=np.int32)
        coefs[np.asarray(c["idx"], dtype=np.int64)] = c["val"]
        c["coefs"] = coefs
    return _reconstruct(comps, qts, h, w, hmax, vmax)


def _prog_init(comps, h, w, qts):
    """Allocate the cross-scan coefficient state for a progressive
    (SOF2) stream: per component a dense zigzag coefficient list over
    the FULL MCU-padded block grid (interleaved DC scans address it in
    MCU order, non-interleaved AC scans address the component's own
    ceil-sized sub-grid with the same row stride)."""
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    if hmax > 2 or vmax > 2 or any(c["h"] not in (1, 2) or
                                   c["v"] not in (1, 2) for c in comps):
        raise ValueError("sampling factors beyond 2 unsupported")
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    for c in comps:
        c["bw"] = mcux * c["h"]
        c["bh"] = mcuy * c["v"]
        # non-interleaved grid: ceil over the COMPONENT dimensions
        # (T.81 A.2.2), a sub-grid of the MCU-padded one
        c["bw_ni"] = -(-(-(-w * c["h"] // hmax)) // 8)
        c["bh_ni"] = -(-(-(-h * c["v"] // vmax)) // 8)
        c["nb"] = c["bw"] * c["bh"]
        c["cf"] = [0] * (c["nb"] * 64)     # list: fastest scatter writes
    return {"comps": comps, "h": h, "w": w, "hmax": hmax, "vmax": vmax,
            "mcux": mcux, "mcuy": mcuy, "qts": qts}


def _prog_finish(state):
    comps = state["comps"]
    for c in comps:
        c["coefs"] = np.asarray(c["cf"], dtype=np.int32)
        grid_rows = np.repeat(np.arange(c["bh"]), c["bw"])
        grid_cols = np.tile(np.arange(c["bw"]), c["bh"])
        c["rows"] = grid_rows
        c["cols"] = grid_cols
    return _reconstruct(comps, state["qts"], state["h"], state["w"],
                        state["hmax"], state["vmax"])


def _decode_prog_scan(data, pos, state, sel, ss, se, ah, al,
                      dc_tabs, ac_tabs, restart):
    """One progressive scan (T.81 Annex G Huffman procedures: DC/AC ×
    first/refinement, EOB runs, restart intervals). Returns the
    position of the marker terminating the scan's entropy data.
    Plain bit-reader loop — progressive files are the rare tail of a
    scraped corpus, so clarity wins over the baseline path's inlining.
    """
    comps = state["comps"]
    by_id = {c["id"]: c for c in comps}
    scomps = []
    for cs, td, ta in sel:
        if cs not in by_id:
            raise ValueError("JPEG scan selects unknown component")
        scomps.append((by_id[cs], td, ta))
    segments, end = _entropy_span(data, pos)
    seg_i = 0
    dbuf = segments[0]
    dlen = len(dbuf)
    dpos = 0
    acc = 0
    nbits = 0

    def fill():
        nonlocal acc, nbits, dpos
        while nbits < 32:
            acc = (acc << 8) | (dbuf[dpos] if dpos < dlen else 0xFF)
            dpos += 1
            nbits += 8
        acc &= (1 << nbits) - 1

    def bits(n):
        nonlocal acc, nbits
        if n == 0:
            return 0
        fill()
        nbits -= n
        return (acc >> nbits) & ((1 << n) - 1)

    def huff(lut):
        nonlocal acc, nbits
        fill()
        e = lut[(acc >> (nbits - 16)) & 0xFFFF]
        if not e:
            raise ValueError("corrupt JPEG: bad Huffman code")
        nbits -= e >> 8
        return e & 0xFF

    def next_segment():
        nonlocal seg_i, dbuf, dlen, dpos, acc, nbits
        seg_i += 1
        if seg_i >= len(segments):
            raise ValueError("corrupt JPEG: missing restart marker")
        dbuf = segments[seg_i]
        dlen = len(dbuf)
        dpos = 0
        acc = 0
        nbits = 0

    def extend(v, s):
        return v if v >= (1 << (s - 1)) else v - (1 << s) + 1

    if ss == 0:                                      # DC scan
        if se != 0:
            raise ValueError("progressive DC scan with Se != 0")
        interleaved = len(scomps) > 1
        preds = [0] * len(scomps)
        luts = []
        for c, td, _ta in scomps:
            if ah == 0:
                lut = dc_tabs.get(td)
                if lut is None:
                    raise ValueError("missing Huffman table")
                luts.append(lut)
            else:
                luts.append(None)
        if interleaved:
            n_units = state["mcux"] * state["mcuy"]
        else:
            c0 = scomps[0][0]
            n_units = c0["bw_ni"] * c0["bh_ni"]
        for ui in range(n_units):
            if restart and ui and ui % restart == 0:
                next_segment()
                preds = [0] * len(scomps)
            for si, (c, _td, _ta) in enumerate(scomps):
                cf = c["cf"]
                bw = c["bw"]
                if interleaved:
                    my, mx = divmod(ui, state["mcux"])
                    blocks = [((my * c["v"] + by) * bw
                               + (mx * c["h"] + bx))
                              for by in range(c["v"])
                              for bx in range(c["h"])]
                else:
                    row, col = divmod(ui, c["bw_ni"])
                    blocks = [row * bw + col]
                for b in blocks:
                    base = b * 64
                    if ah == 0:
                        s = huff(luts[si])
                        diff = extend(bits(s), s) if s else 0
                        preds[si] += diff
                        cf[base] = preds[si] << al
                    else:
                        if bits(1):
                            cf[base] |= (1 << al)
        return end

    # AC scan: always non-interleaved (T.81 G.1.1.1.1)
    if len(scomps) != 1:
        raise ValueError("progressive AC scan with multiple components")
    c, _td, ta = scomps[0]
    lut = ac_tabs.get(ta)
    if lut is None:
        raise ValueError("missing Huffman table")
    cf = c["cf"]
    bw = c["bw"]
    n_units = c["bw_ni"] * c["bh_ni"]
    eobrun = 0
    p1 = 1 << al
    m1 = -p1
    for ui in range(n_units):
        if restart and ui and ui % restart == 0:
            next_segment()
            eobrun = 0
        row, col = divmod(ui, c["bw_ni"])
        base = (row * bw + col) * 64
        if ah == 0:                                  # AC first scan
            if eobrun:
                eobrun -= 1
                continue
            k = ss
            while k <= se:
                sym = huff(lut)
                r, s = sym >> 4, sym & 0x0F
                if s == 0:
                    if r == 15:                      # ZRL
                        k += 16
                        continue
                    eobrun = (1 << r) - 1            # EOBn
                    if r:
                        eobrun += bits(r)
                    break
                k += r
                if k > se:
                    raise ValueError("corrupt JPEG: AC overrun")
                cf[base + k] = extend(bits(s), s) << al
                k += 1
        else:                                        # AC refinement
            k = ss
            if eobrun == 0:
                while k <= se:
                    sym = huff(lut)
                    r, s = sym >> 4, sym & 0x0F
                    newval = 0
                    if s == 0:
                        if r < 15:                   # EOBn (incl. this
                            eobrun = 1 << r          # block's tail)
                            if r:
                                eobrun += bits(r)
                            break
                        # r == 15: run of 16 zero-history coefficients
                    else:
                        if s != 1:
                            raise ValueError(
                                "corrupt JPEG: AC refinement size != 1")
                        newval = p1 if bits(1) else m1
                    while k <= se:
                        v = cf[base + k]
                        if v:
                            if bits(1) and not (v & p1):
                                cf[base + k] = v + (p1 if v >= 0 else m1)
                        else:
                            if r == 0:
                                if newval:
                                    cf[base + k] = newval
                                k += 1
                                break
                            r -= 1
                        k += 1
            if eobrun:
                while k <= se:
                    v = cf[base + k]
                    if v and bits(1) and not (v & p1):
                        cf[base + k] = v + (p1 if v >= 0 else m1)
                    k += 1
                eobrun -= 1
    return end


def _reconstruct(comps, qts, h, w, hmax, vmax):
    """Shared decode tail: per-component dense zigzag coefficients
    (``coefs``: flat nb×64 int32, block order given by ``rows``/
    ``cols``) → dequantize → batched IDCT → upsample → color. Both the
    baseline scan and the progressive coefficient accumulator end
    here, so progressive output is bit-identical to a baseline
    encoding of the same quantized coefficients."""
    zz = _ZZ
    a32 = _A.astype(np.float32)
    planes = []
    for c in comps:
        nb = c["nb"]
        coefs = c["coefs"]
        # q arrives zigzag-ordered (DQT wire order), coefs are zigzag
        # too: dequantize then scatter every block to natural order
        deq = (coefs.reshape(nb, 64)
               * qts[c["tq"]][None, :]).astype(np.float32)
        nat = np.zeros((nb, 64), dtype=np.float32)
        nat[:, zz] = deq
        f = a32.T @ nat.reshape(nb, 8, 8) @ a32   # batched IDCT
        grid = np.empty((c["bh"], c["bw"], 8, 8), dtype=np.float32)
        grid[c["rows"], c["cols"]] = f
        p = grid.transpose(0, 2, 1, 3).reshape(c["bh"] * 8, c["bw"] * 8)
        p += 128.5            # +0.5: clip-and-truncate rounds to nearest
        if c["h"] < hmax or c["v"] < vmax:
            p = np.repeat(np.repeat(p, vmax // c["v"], axis=0),
                          hmax // c["h"], axis=1)
        planes.append(p[:h, :w])
    if len(planes) == 1:
        return np.clip(planes[0], 0, 255).astype(np.uint8)[:, :, None]
    y, cb, cr = planes
    cb -= 128.0               # the +128.5 bias leaves the rounding half
    cr -= 128.0
    out = np.empty((h, w, 3), dtype=np.uint8)
    out[:, :, 0] = np.clip(y + np.float32(1.402) * (cr - np.float32(0.5)),
                           0, 255).astype(np.uint8)
    out[:, :, 1] = np.clip(y - np.float32(0.344136) * (cb - np.float32(0.5))
                           - np.float32(0.714136) * (cr - np.float32(0.5)),
                           0, 255).astype(np.uint8)
    out[:, :, 2] = np.clip(y + np.float32(1.772) * (cb - np.float32(0.5)),
                           0, 255).astype(np.uint8)
    return out


# ---------------------------------------------------------------------------
# Encoder
# ---------------------------------------------------------------------------

def _mag(v: int) -> tuple[int, int]:
    """(size, magnitude bits) for a signed coefficient."""
    if v == 0:
        return 0, 0
    a = abs(v)
    s = a.bit_length()
    return s, (v if v > 0 else v + (1 << s) - 1)


def _scale_qt(base: np.ndarray, quality: int) -> np.ndarray:
    quality = min(max(quality, 1), 100)
    sf = 5000 // quality if quality < 50 else 200 - 2 * quality
    return np.clip((base * sf + 50) // 100, 1, 255).astype(np.int32)


def _encode_prepare(arr: np.ndarray, quality: int,
                    subsample: bool | str):
    """Shared encoder front half: color transform, subsampling, padding,
    batched FDCT + quantization. Returns everything either entropy
    back-end (baseline MCU loop / progressive scan script) needs."""
    a = np.asarray(arr, dtype=np.uint8)
    if a.ndim == 2:
        a = a[:, :, None]
    h, w, nc = a.shape
    if nc not in (1, 3):
        raise ValueError("encode_jpeg wants 1 or 3 channels")
    qt_l = _scale_qt(_QT_LUM, quality)
    qt_c = _scale_qt(_QT_CHR, quality)
    if nc == 1:
        planes = [a[:, :, 0].astype(np.float64)]
        samps = [(1, 1)]
    else:
        rf, gf, bf = (a[:, :, i].astype(np.float64) for i in range(3))
        y = 0.299 * rf + 0.587 * gf + 0.114 * bf
        cb = -0.168736 * rf - 0.331264 * gf + 0.5 * bf + 128
        cr = 0.5 * rf - 0.418688 * gf - 0.081312 * bf + 128
        mode = {False: "444", True: "420"}.get(subsample, subsample)
        if mode == "420":
            # pad to even dims then 2x2 mean
            ph, pw = (h + 1) & ~1, (w + 1) & ~1
            def pad2(p):
                return np.pad(p, ((0, ph - h), (0, pw - w)), mode="edge")
            cb = pad2(cb).reshape(ph // 2, 2, pw // 2, 2).mean(axis=(1, 3))
            cr = pad2(cr).reshape(ph // 2, 2, pw // 2, 2).mean(axis=(1, 3))
            samps = [(2, 2), (1, 1), (1, 1)]
        elif mode == "422":
            # horizontal-only 2x mean (chroma halves in width)
            pw = (w + 1) & ~1
            def padw(p):
                return np.pad(p, ((0, 0), (0, pw - w)), mode="edge")
            cb = padw(cb).reshape(h, pw // 2, 2).mean(axis=2)
            cr = padw(cr).reshape(h, pw // 2, 2).mean(axis=2)
            samps = [(2, 1), (1, 1), (1, 1)]
        elif mode == "444":
            samps = [(1, 1), (1, 1), (1, 1)]
        else:
            raise ValueError(f"unknown subsampling mode {subsample!r}")
        planes = [y, cb, cr]
    hmax = max(s[0] for s in samps)
    vmax = max(s[1] for s in samps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    zz = _ZZ
    # pad planes to full block grid
    padded = []
    for p, (sh, sv) in zip(planes, samps):
        tw, th = mcux * sh * 8, mcuy * sv * 8
        ph0, pw0 = p.shape
        padded.append(np.pad(p, ((0, th - ph0), (0, tw - pw0)),
                             mode="edge"))
    # batched forward DCT + quantization per component: the Python MCU
    # loop below only does Huffman emission over plain-int lists
    a32 = _A.astype(np.float32)
    comp_zs = []      # per component: zigzag int rows, raster block order
    comp_bw = []      # blocks per grid row
    for p, (sh, sv), qt in zip(padded, samps,
                               [qt_l] + [qt_c] * (len(planes) - 1)):
        th, tw = p.shape
        gh, gw = th // 8, tw // 8
        blocks = (p.astype(np.float32) - np.float32(128.0)) \
            .reshape(gh, 8, gw, 8).transpose(0, 2, 1, 3) \
            .reshape(gh * gw, 8, 8)
        F = a32 @ blocks @ a32.T
        qc = np.round(F.reshape(-1, 64)
                      / qt.astype(np.float32)[None, :]).astype(np.int32)
        comp_zs.append(qc[:, zz].tolist())
        comp_bw.append(gw)
    return dict(h=h, w=w, nc=nc, samps=samps, qt_l=qt_l, qt_c=qt_c,
                hmax=hmax, vmax=vmax, mcux=mcux, mcuy=mcuy,
                comp_zs=comp_zs, comp_bw=comp_bw)


def _jfif_headers(prep, sof_marker: int) -> bytearray:
    """SOI + JFIF + DQT + SOFn header bytes shared by both encoders."""
    zz = _ZZ
    out = bytearray(b"\xff\xd8")
    out += _seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += _seg(0xDB, bytes([0x00])
                + bytes(prep["qt_l"].reshape(64)[zz].astype(np.uint8)))
    if prep["nc"] == 3:
        out += _seg(0xDB, bytes([0x01])
                    + bytes(prep["qt_c"].reshape(64)[zz]
                            .astype(np.uint8)))
    sof = struct.pack(">BHHB", 8, prep["h"], prep["w"], prep["nc"])
    for i, (sh, sv) in enumerate(prep["samps"]):
        sof += bytes([i + 1, (sh << 4) | sv, 0 if i == 0 else 1])
    out += _seg(sof_marker, sof)
    return out


def _seg(marker: int, body: bytes) -> bytes:
    return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body


def _dht_seg(tc, th, bits, vals) -> bytes:
    return _seg(0xC4, bytes([(tc << 4) | th]) + bytes(bits) + bytes(vals))


def encode_jpeg(arr: np.ndarray, quality: int = 85,
                subsample: bool | str = False,
                restart_interval: int = 0) -> bytes:
    """Encode uint8 (H, W), (H, W, 1) or (H, W, 3) → baseline JFIF.
    ``subsample``: False/"444" → 4:4:4, True/"420" → 4:2:0,
    "422" → horizontal-only chroma halving;
    ``restart_interval`` emits DRI + RSTn every N MCUs."""
    prep = _encode_prepare(arr, quality, subsample)
    h, w, nc = prep["h"], prep["w"], prep["nc"]
    samps = prep["samps"]
    mcux, mcuy = prep["mcux"], prep["mcuy"]
    comp_zs, comp_bw = prep["comp_zs"], prep["comp_bw"]
    dc_l = _build_huff(*_DC_LUM)[1]
    ac_l = _build_huff(*_AC_LUM)[1]
    dc_c = _build_huff(*_DC_CHR)[1]
    ac_c = _build_huff(*_AC_CHR)[1]
    out = bytearray()
    acc = 0
    nacc = 0
    pred = [0] * nc
    for mi in range(mcux * mcuy):
        if restart_interval and mi and mi % restart_interval == 0:
            if nacc & 7:                       # pad to byte with 1-bits
                padn = 8 - (nacc & 7)
                acc = (acc << padn) | ((1 << padn) - 1)
                nacc += padn
            while nacc >= 8:
                b = (acc >> (nacc - 8)) & 0xFF
                out.append(b)
                if b == 0xFF:
                    out.append(0x00)
                nacc -= 8
            acc = 0
            out += bytes([0xFF,
                          0xD0 + ((mi // restart_interval - 1) % 8)])
            pred = [0] * nc
        my, mx = divmod(mi, mcux)
        for ci, (sh, sv) in enumerate(samps):
            zs = comp_zs[ci]
            gw = comp_bw[ci]
            dct_, act_ = (dc_l, ac_l) if ci == 0 else (dc_c, ac_c)
            for by in range(sv):
                for bx in range(sh):
                    row = zs[(my * sv + by) * gw + (mx * sh + bx)]
                    v0 = row[0]
                    diff = v0 - pred[ci]
                    pred[ci] = v0
                    s, m = _mag(diff)
                    code, ln = dct_[s]
                    acc = (acc << ln) | code
                    nacc += ln
                    if s:
                        acc = (acc << s) | m
                        nacc += s
                    run = 0
                    for k in range(1, 64):
                        v = row[k]
                        if v == 0:
                            run += 1
                            continue
                        while run >= 16:
                            code, ln = act_[0xF0]    # ZRL
                            acc = (acc << ln) | code
                            nacc += ln
                            run -= 16
                        a = v if v > 0 else -v
                        s = a.bit_length()
                        m = v if v > 0 else v + (1 << s) - 1
                        code, ln = act_[(run << 4) | s]
                        acc = (acc << ln) | code
                        nacc += ln
                        acc = (acc << s) | m
                        nacc += s
                        run = 0
                    if run:
                        code, ln = act_[0x00]        # EOB
                        acc = (acc << ln) | code
                        nacc += ln
                    while nacc >= 8:
                        b = (acc >> (nacc - 8)) & 0xFF
                        out.append(b)
                        if b == 0xFF:
                            out.append(0x00)
                        nacc -= 8
                    acc &= (1 << nacc) - 1
    if nacc & 7:
        padn = 8 - (nacc & 7)
        acc = (acc << padn) | ((1 << padn) - 1)
        nacc += padn
    while nacc >= 8:
        b = (acc >> (nacc - 8)) & 0xFF
        out.append(b)
        if b == 0xFF:
            out.append(0x00)
        nacc -= 8
    scan = out          # entropy-coded scan bytes (``out`` is rebound
    # below to the file assembly buffer)

    out = _jfif_headers(prep, 0xC0)
    out += _dht_seg(0, 0, *_DC_LUM) + _dht_seg(1, 0, *_AC_LUM)
    if nc == 3:
        out += _dht_seg(0, 1, *_DC_CHR) + _dht_seg(1, 1, *_AC_CHR)
    if restart_interval:
        out += _seg(0xDD, struct.pack(">H", restart_interval))
    sos = bytes([nc])
    for i in range(nc):
        sos += bytes([i + 1, 0x00 if i == 0 else 0x11])
    sos += bytes([0, 63, 0])
    out += _seg(0xDA, sos)
    out += scan
    out += b"\xff\xd9"
    return bytes(out)


# ---------------------------------------------------------------------------
# Progressive encoder (T.81 Annex G.2 Huffman procedures)
# ---------------------------------------------------------------------------

# AC tables for progressive scans must cover EOBn (r<<4 for r=1..14)
# and refinement symbols, which the Annex-K baseline tables omit. A
# fixed uniform canonical table — all 255 used symbols at 8 bits —
# is valid (Kraft sum 255/256, the all-ones code stays reserved) and
# keeps the encoder table-free; compression is secondary to having a
# fully-exercised decoder-side bitstream.
_PROG_AC = ([0, 0, 0, 0, 0, 0, 0, 255, 0, 0, 0, 0, 0, 0, 0, 0],
            list(range(255)))


class _BitW:
    """MSB-first bit emitter with JPEG byte stuffing."""

    __slots__ = ("out", "acc", "nacc")

    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nacc = 0

    def put(self, code: int, ln: int):
        if ln == 0:
            return
        self.acc = (self.acc << ln) | code
        self.nacc += ln
        while self.nacc >= 8:
            b = (self.acc >> (self.nacc - 8)) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)
            self.nacc -= 8
        self.acc &= (1 << self.nacc) - 1

    def flush(self):
        if self.nacc:
            pad = 8 - self.nacc
            self.put((1 << pad) - 1, pad)


def _pt(v: int, al: int) -> int:
    """AC point transform: divide by 2^Al truncating toward zero
    (T.81 G.1.1.2.2 — DC uses an arithmetic shift instead)."""
    return v >> al if v >= 0 else -((-v) >> al)


def encode_jpeg_progressive(arr: np.ndarray, quality: int = 85,
                            subsample: bool | str = False,
                            scans: list | None = None,
                            restart_interval: int = 0) -> bytes:
    """Encode uint8 (H, W[, C]) → progressive (SOF2) JFIF.

    Transmits the SAME quantized coefficients as :func:`encode_jpeg`
    reordered into progressive scans, so ``decode_jpeg`` must produce
    pixel-identical output for both encodings — the parity test the
    progressive decoder is held to. The default scan script exercises
    every Annex-G scan kind: interleaved DC first with successive
    approximation, spectral-selection AC bands, DC refinement, and AC
    refinement (EOB runs + buffered correction bits).

    ``scans``: optional list of ``(comp_indices, Ss, Se, Ah, Al)``;
    progressive rules apply (DC scans may interleave, AC scans are
    single-component, refinements shift Al by one).
    """
    prep = _encode_prepare(arr, quality, subsample)
    nc = prep["nc"]
    samps = prep["samps"]
    mcux, mcuy = prep["mcux"], prep["mcuy"]
    comp_zs, comp_bw = prep["comp_zs"], prep["comp_bw"]
    h, w = prep["h"], prep["w"]
    hmax = prep["hmax"]
    vmax = prep["vmax"]
    if scans is None:
        if nc == 1:
            scans = [((0,), 0, 0, 0, 1),
                     ((0,), 1, 5, 0, 2), ((0,), 6, 63, 0, 2),
                     ((0,), 0, 0, 1, 0),
                     ((0,), 1, 63, 2, 1), ((0,), 1, 63, 1, 0)]
        else:
            scans = [((0, 1, 2), 0, 0, 0, 1),
                     ((0,), 1, 5, 0, 2),
                     ((2,), 1, 63, 0, 1), ((1,), 1, 63, 0, 1),
                     ((0,), 6, 63, 0, 2),
                     ((0, 1, 2), 0, 0, 1, 0),
                     ((0,), 1, 63, 2, 1),
                     ((2,), 1, 63, 1, 0), ((1,), 1, 63, 1, 0),
                     ((0,), 1, 63, 1, 0)]
    dc_enc = [_build_huff(*(_DC_LUM if ci == 0 else _DC_CHR))[1]
              for ci in range(nc)]
    ac_enc = _build_huff(*_PROG_AC)[1]
    # non-interleaved grids per component
    ni = []
    for ci, (sh, sv) in enumerate(samps):
        cw = -(-w * sh // hmax)
        ch = -(-h * sv // vmax)
        ni.append((-(-cw // 8), -(-ch // 8)))

    out = _jfif_headers(prep, 0xC2)
    for ci in range(nc):
        out += _dht_seg(0, 0 if ci == 0 else 1,
                        *(_DC_LUM if ci == 0 else _DC_CHR))
        if ci < 2:
            out += _dht_seg(1, ci, *_PROG_AC)

    if restart_interval:
        out += _seg(0xDD, struct.pack(">H", restart_interval))
    for comp_idx, ss, se, ah, al in scans:
        bw_sc = _BitW()
        if ss == 0:
            _enc_dc_scan(bw_sc, comp_idx, samps, comp_zs, comp_bw,
                         mcux, mcuy, ni, dc_enc, ah, al,
                         restart_interval)
        else:
            if len(comp_idx) != 1:
                raise ValueError("AC scans are single-component")
            _enc_ac_scan(bw_sc, comp_idx[0], comp_zs, comp_bw, ni,
                         ac_enc, ss, se, ah, al, restart_interval)
        bw_sc.flush()
        sos = bytes([len(comp_idx)])
        for ci in comp_idx:
            td = 0 if ci == 0 else 1
            ta = 0 if ci == 0 else 1
            sos += bytes([ci + 1, (td << 4) | ta])
        sos += bytes([ss, se, (ah << 4) | al])
        out += _seg(0xDA, sos)
        out += bw_sc.out
    out += b"\xff\xd9"
    return bytes(out)


def _enc_dc_scan(bw, comp_idx, samps, comp_zs, comp_bw, mcux, mcuy,
                 ni, dc_enc, ah, al, restart=0):
    interleaved = len(comp_idx) > 1
    if interleaved:
        units = mcux * mcuy
    else:
        units = ni[comp_idx[0]][0] * ni[comp_idx[0]][1]
    preds = {ci: 0 for ci in comp_idx}
    for ui in range(units):
        if restart and ui and ui % restart == 0:
            bw.flush()
            bw.out += bytes([0xFF,
                             0xD0 + ((ui // restart - 1) % 8)])
            preds = {ci: 0 for ci in comp_idx}
        for ci in comp_idx:
            sh, sv = samps[ci]
            zs = comp_zs[ci]
            gw = comp_bw[ci]
            if interleaved:
                my, mx = divmod(ui, mcux)
                blocks = [(my * sv + by) * gw + (mx * sh + bx)
                          for by in range(sv) for bx in range(sh)]
            else:
                row, col = divmod(ui, ni[ci][0])
                blocks = [row * gw + col]
            for b in blocks:
                dc = zs[b][0] >> al          # arithmetic shift (DC)
                if ah == 0:
                    diff = dc - preds[ci]
                    preds[ci] = dc
                    s, m = _mag(diff)
                    code, ln = dc_enc[ci][s]
                    bw.put(code, ln)
                    if s:
                        bw.put(m, s)
                else:
                    bw.put(dc & 1, 1)


def _enc_ac_scan(bw, ci, comp_zs, comp_bw, ni, ac_enc, ss, se, ah, al,
                 restart=0):
    zs = comp_zs[ci]
    gw = comp_bw[ci]
    nw, nh = ni[ci]
    eobrun = 0
    pend: list[int] = []       # correction bits deferred with EOB runs

    def emit_eobrun():
        nonlocal eobrun
        if eobrun:
            r = eobrun.bit_length() - 1
            code, ln = ac_enc[r << 4]
            bw.put(code, ln)
            if r:
                bw.put(eobrun - (1 << r), r)
            for bit in pend:
                bw.put(bit, 1)
            pend.clear()
            eobrun = 0

    for ui in range(nw * nh):
        if restart and ui and ui % restart == 0:
            emit_eobrun()
            bw.flush()
            bw.out += bytes([0xFF, 0xD0 + ((ui // restart - 1) % 8)])
        row_i, col = divmod(ui, nw)
        coefs = zs[row_i * gw + col]
        if ah == 0:                                  # AC first scan
            vals = [_pt(coefs[k], al) for k in range(ss, se + 1)]
            if not any(vals):
                eobrun += 1
                if eobrun == 0x7FFF:
                    emit_eobrun()
                continue
            emit_eobrun()
            run = 0
            last_nz = max(i for i, v in enumerate(vals) if v)
            for i, v in enumerate(vals[:last_nz + 1]):
                if v == 0:
                    run += 1
                    continue
                while run >= 16:
                    code, ln = ac_enc[0xF0]          # ZRL
                    bw.put(code, ln)
                    run -= 16
                s, m = _mag(v)
                code, ln = ac_enc[(run << 4) | s]
                bw.put(code, ln)
                bw.put(m, s)
                run = 0
            if last_nz < se - ss:                    # trailing zeros
                eobrun = 1
        else:                                        # AC refinement
            absv = [abs(coefs[k]) >> al for k in range(ss, se + 1)]
            eob_pos = -1
            for i, t in enumerate(absv):
                if t == 1:
                    eob_pos = i
            r = 0
            br: list[int] = []
            for i, t in enumerate(absv):
                if t == 0:
                    r += 1
                    continue
                while r > 15 and i <= eob_pos:
                    emit_eobrun()
                    code, ln = ac_enc[0xF0]
                    bw.put(code, ln)
                    r -= 16
                    for bit in br:
                        bw.put(bit, 1)
                    br = []
                if t > 1:                  # history coef: correction bit
                    br.append(t & 1)
                    continue
                emit_eobrun()              # newly-nonzero coefficient
                code, ln = ac_enc[(r << 4) | 1]
                bw.put(code, ln)
                bw.put(1 if coefs[ss + i] > 0 else 0, 1)
                for bit in br:
                    bw.put(bit, 1)
                br = []
                r = 0
            if r > 0 or br:
                eobrun += 1
                pend.extend(br)
                if eobrun == 0x7FFF:
                    emit_eobrun()
    emit_eobrun()
