"""Perceptual image dHash + exact-guarantee Hamming band join."""

import numpy as np
import pytest

from peri_spark.functions import (hamming_duplicate_pairs,
                                  image_duplicate_pairs, image_phash)
from peri_spark.functions.codecs import encode_png


def _img(seed: int, w: int = 64, h: int = 48) -> np.ndarray:
    rng = np.random.RandomState(seed)
    base = rng.randint(0, 255, size=(h, w, 3), dtype=np.uint8)
    # smooth horizontally so the gradient bits carry structure
    return ((base.astype(np.int64)
             + np.linspace(0, 200, w).astype(np.int64)[None, :, None])
            % 256).astype(np.uint8)


def _png(seed: int, tweak: int = 0) -> bytes:
    arr = _img(seed)
    if tweak:
        arr = arr.copy()
        arr[0, 0, 0] ^= tweak  # single-pixel perturbation
    return encode_png(arr)


def _brute(hashes, max_hamming):
    out = set()
    items = sorted(hashes.items())
    for i, (ida, ha) in enumerate(items):
        for idb, hb in items[i + 1:]:
            if bin((ha ^ hb) & ((1 << 64) - 1)).count("1") <= max_hamming:
                out.add((ida, idb))
    return out


def test_image_phash_stable_and_discriminative(spark):
    rows = [(1, _png(7)), (2, _png(7)),          # identical bytes
            (3, _png(7, tweak=255)),             # one-pixel change
            (4, _png(99)), (5, None)]
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    got = {r.media_id: r for r in image_phash(df).collect()}
    assert got[1].phash == got[2].phash
    ham13 = bin((got[1].phash ^ got[3].phash) & ((1 << 64) - 1)).count("1")
    ham14 = bin((got[1].phash ^ got[4].phash) & ((1 << 64) - 1)).count("1")
    assert ham13 <= 6                 # near-dup: tiny Hamming distance
    assert ham14 > 10                 # unrelated: far apart
    assert got[5].phash is None and got[5].error == "null payload"


def test_image_phash_format_invariant(spark):
    # same pixels encoded as PNG and PPM must hash identically
    from peri_spark.functions.codecs import decode_image
    arr = _img(3)
    ppm = b"P6\n%d %d\n255\n" % (arr.shape[1], arr.shape[0]) \
        + arr.tobytes()
    assert np.array_equal(decode_image(ppm), arr)
    df = spark.createDataFrame([(1, encode_png(arr)), (2, ppm)],
                               "media_id long, payload binary")
    got = {r.media_id: r.phash for r in image_phash(df).collect()}
    assert got[1] == got[2]


def test_hamming_pairs_equal_brute_force(spark):
    rng = np.random.RandomState(0)
    hashes = {}
    hid = 0
    for c in range(8):                      # 8 clusters of 3
        base = int(rng.randint(0, 2 ** 62, dtype=np.int64))
        for member in range(3):
            h = base
            for _ in range(member * 2):     # flip 0/2/4 random bits
                h ^= 1 << int(rng.randint(0, 64))
            hashes[hid] = h
            hid += 1
    signed = {k: (v if v < 2 ** 63 else v - 2 ** 64)
              for k, v in hashes.items()}
    df = spark.createDataFrame(list(signed.items()), "id long, h long")
    got = {(r.id_a, r.id_b)
           for r in hamming_duplicate_pairs(df, "h", "id",
                                            max_hamming=5).collect()}
    assert got == _brute(signed, 5)


def test_hamming_pairs_nbits_matters(spark):
    # 60-bit hashes: with nbits=60 the bands stay discriminative
    rows = [(i, (i * 0x9E3779B97F4A7) & ((1 << 60) - 1)) for i in range(40)]
    rows.append((100, rows[0][1] ^ (1 << 5)))      # planted near-dup
    df = spark.createDataFrame(rows, "id long, h long")
    got = hamming_duplicate_pairs(df, "h", "id", max_hamming=2,
                                  nbits=60).collect()
    assert {(r.id_a, r.id_b, r.hamming) for r in got} == {(0, 100, 1)}


def test_hamming_bucket_cap_discloses_drops(spark):
    # constant hashes: one degenerate bucket per band; cap drops them all
    df = spark.createDataFrame([(i, 7) for i in range(50)], "id long, h long")
    ctr = {}
    got = hamming_duplicate_pairs(df, "h", "id", max_hamming=1,
                                  max_bucket_size=10,
                                  dropped_counter=ctr).count()
    assert got == 0
    assert ctr["n_dropped_rows"] == 50 * 2  # 2 bands at max_hamming=1
    assert ctr["n_hot_buckets"] == 2


def test_image_duplicate_pairs_end_to_end(spark):
    rows = [(1, _png(7)), (2, _png(7, tweak=255)), (3, _png(7, tweak=128)),
            (4, _png(42)), (5, b"not an image")]
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    pairs = {(r.id_a, r.id_b)
             for r in image_duplicate_pairs(df, max_hamming=6).collect()}
    assert pairs == {(1, 2), (1, 3), (2, 3)}
