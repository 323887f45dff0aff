"""MP4 sample-table parsing: synthesized ISO BMFF fixtures (the
container lacks media libraries, so the MP4 is hand-built from the
public ISO/IEC 14496-12 box layout — deterministic, valid structure)."""

import struct

import pytest

from peri_spark.functions.mp4 import mp4_sample_index, scan_mp4_samples


def _box(fourcc: bytes, body: bytes) -> bytes:
    return struct.pack(">I", len(body) + 8) + fourcc + body


def _full(fourcc: bytes, body: bytes) -> bytes:
    return _box(fourcc, b"\x00\x00\x00\x00" + body)


SIZES = [10, 7, 9, 4, 6]


def _mp4(with_stss=True, co64=False, uniform=False) -> bytes:
    ftyp = _box(b"ftyp", b"isom" + b"\x00\x00\x02\x00" + b"isomiso2")
    frames = b"".join(bytes([65 + i]) * s for i, s in enumerate(SIZES))
    mdat = _box(b"mdat", frames)
    mdat_body = len(ftyp) + 8
    # chunk 1 = samples 1-2, chunk 2 = samples 3-5
    chunk_offs = [mdat_body, mdat_body + SIZES[0] + SIZES[1]]
    mdhd = _full(b"mdhd", struct.pack(">IIII", 0, 0, 1000, 200))
    hdlr = _full(b"hdlr", struct.pack(">I", 0) + b"vide" + b"\x00" * 12)
    stts = _full(b"stts", struct.pack(">III", 1, len(SIZES), 40))
    stsc = _full(b"stsc", struct.pack(">I", 2)
                 + struct.pack(">III", 1, 2, 1)
                 + struct.pack(">III", 2, 3, 1))
    if uniform:
        stsz = _full(b"stsz", struct.pack(">II", 8, len(SIZES)))
    else:
        stsz = _full(b"stsz", struct.pack(">II", 0, len(SIZES))
                     + struct.pack(f">{len(SIZES)}I", *SIZES))
    if co64:
        stco = _full(b"co64", struct.pack(">I", 2)
                     + struct.pack(">QQ", *chunk_offs))
    else:
        stco = _full(b"stco", struct.pack(">I", 2)
                     + struct.pack(">II", *chunk_offs))
    stbl_parts = [stts, stsc, stsz, stco]
    if with_stss:
        stbl_parts.append(_full(b"stss", struct.pack(">III", 2, 1, 4)))
    stbl = _box(b"stbl", b"".join(stbl_parts))
    minf = _box(b"minf", stbl)
    mdia = _box(b"mdia", mdhd + hdlr + minf)
    trak = _box(b"trak", mdia)
    moov = _box(b"moov", trak)
    return ftyp + mdat + moov


def test_scan_samples_offsets_sizes_times_sync():
    samples = scan_mp4_samples(_mp4())
    assert [s["size"] for s in samples] == SIZES
    assert [s["t_ms"] for s in samples] == [0.0, 40.0, 80.0, 120.0, 160.0]
    assert [s["is_sync"] for s in samples] == [True, False, False,
                                              True, False]
    # chunk 1 packs samples 0-1 back to back; chunk 2 samples 2-4
    offs = [s["offset"] for s in samples]
    assert offs[1] == offs[0] + SIZES[0]
    assert offs[2] == offs[0] + SIZES[0] + SIZES[1]
    assert offs[3] == offs[2] + SIZES[2]
    # the byte ranges really address the frame bytes in mdat
    p = _mp4()
    for i, s in enumerate(samples):
        frame = p[s["offset"]:s["offset"] + s["size"]]
        assert frame == bytes([65 + i]) * SIZES[i]


def test_scan_samples_variants():
    # no stss -> every sample sync; co64 offsets; uniform stsz
    assert all(s["is_sync"] for s in scan_mp4_samples(_mp4(False)))
    assert [s["offset"] for s in scan_mp4_samples(_mp4(co64=True))] \
        == [s["offset"] for s in scan_mp4_samples(_mp4())]
    assert [s["size"] for s in scan_mp4_samples(_mp4(uniform=True))] \
        == [8] * 5


def test_scan_samples_rejects_garbage():
    with pytest.raises(ValueError, match="ftyp"):
        scan_mp4_samples(b"RIFF" + b"\x00" * 32)
    # audio-only: hdlr says 'soun'
    p = _mp4().replace(b"vide", b"soun")
    with pytest.raises(ValueError, match="no video track"):
        scan_mp4_samples(p)


def test_mp4_sample_index_spark(spark):
    rows = [(1, _mp4()), (2, b"\x00\x00\x00\x08ftypcorrupt"),
            (3, None)]
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    out = mp4_sample_index(df).collect()
    ok = [r for r in out if r.error is None]
    bad = [r for r in out if r.error is not None]
    assert len(ok) == 5 and {r.media_id for r in ok} == {1}
    assert {r.media_id for r in bad} == {2, 3}
    sync = mp4_sample_index(df, sync_only=True).collect()
    assert [r.sample_idx for r in sync if r.error is None] == [0, 3]


def test_scan_samples_truncated_table_raises_valueerror():
    """Review finding r5: a declared sample count that outruns the moov
    bytes must surface as ValueError (the documented contract), not
    struct.error."""
    p = bytearray(_mp4())
    i = p.find(b"stsz")
    # stsz body: ver/flags(4) uniform(4) count(4) — inflate the count
    struct.pack_into(">I", p, i + 4 + 8, 1000)
    # r6: the bounds guard now rejects the table before the unpack can
    # hit the payload end — still the documented ValueError contract
    with pytest.raises(ValueError, match="corrupt MP4|exceeds"):
        scan_mp4_samples(bytes(p))


def test_crafted_giant_counts_fail_fast():
    """r6 (advice r5): untrusted declared counts must raise ValueError
    BEFORE any expansion — a stsz uniform count near 2^32 or an stts
    run-count blowup must never allocate GB-sized lists."""
    def patched(orig: bytes, needle: bytes, repl: bytes) -> bytes:
        assert orig.count(needle) == 1
        return orig.replace(needle, repl)

    # uniform stsz with a ~4B sample count
    good = _mp4(uniform=True)
    bad = patched(good,
                  _full(b"stsz", struct.pack(">II", 8, len(SIZES))),
                  _full(b"stsz", struct.pack(">II", 8, 0xFFFF0000)))
    with pytest.raises(ValueError, match="exceeds payload size"):
        scan_mp4_samples(bad)

    # stts whose single run claims far more entries than stsz samples
    good = _mp4()
    bad = patched(good,
                  _full(b"stts", struct.pack(">III", 1, len(SIZES), 40)),
                  _full(b"stts", struct.pack(">III", 1, 0x7FFFFFFF, 40)))
    with pytest.raises(ValueError, match="exceeds stsz sample count"):
        scan_mp4_samples(bad)

    # stsc run count larger than its box
    good = _mp4()
    bad = patched(good,
                  _full(b"stsc", struct.pack(">I", 2)
                        + struct.pack(">III", 1, 2, 1)
                        + struct.pack(">III", 2, 3, 1)),
                  _full(b"stsc", struct.pack(">I", 0x01000000)
                        + struct.pack(">III", 1, 2, 1)
                        + struct.pack(">III", 2, 3, 1)))
    with pytest.raises(ValueError, match="exceeds its box"):
        scan_mp4_samples(bad)
