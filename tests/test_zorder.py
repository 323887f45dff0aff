"""with_zorder Morton keys: bit layout, clamping, multi-dim locality."""

import glob

import pyarrow.parquet as pq
import pytest

from peri_spark.sources import with_zorder, write_clustered


def test_known_interleave(spark):
    df = spark.createDataFrame([(3, 1), (0, 0), (3, 3)], "x long, y long")
    out = with_zorder(df, ["x", "y"], bits=2, bounds={"x": (0, 3),
                                                      "y": (0, 3)})
    got = {(r.x, r.y): r["__z"] for r in out.collect()}
    # bit b of col i lands at b*2+i: x=11,y=01 -> 0b0111
    assert got[(3, 1)] == 0b0111
    assert got[(0, 0)] == 0
    assert got[(3, 3)] == 0b1111


def test_nulls_and_out_of_bounds_clamp(spark):
    df = spark.createDataFrame([(None, 5), (99, 5), (-7, 5)],
                               "x long, y long")
    out = with_zorder(df, ["x", "y"], bits=2,
                      bounds={"x": (0, 3), "y": (5, 5)})
    # y is constant -> contributes no bits; x: NULL->0, clamp to [0,3]
    got = [r["__z"] for r in out.collect()]
    assert got[0] == 0
    assert got[1] == 0b0101          # x=3 (clamped high)
    assert got[2] == 0               # clamped low


def test_bits_budget_validated(spark):
    df = spark.createDataFrame([(1, 1)], "x long, y long")
    with pytest.raises(ValueError):
        with_zorder(df, ["x", "y"], bits=32)
    with pytest.raises(ValueError):
        with_zorder(df, [], bits=4)


def test_zorder_files_are_compact_in_both_dims(spark, tmp_path):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    z = with_zorder(docs, ["doc_id", "n_chars"], bits=10)
    out = str(tmp_path / "z")
    write_clustered(z, out, "__z", num_files=8)
    n_rows, glo_id, glo_ch = docs.count(), [], []
    areas = []
    for f in sorted(glob.glob(f"{out}/part-*.parquet")):
        t = pq.read_table(f, columns=["doc_id", "n_chars"])
        ids = t.column("doc_id").to_pylist()
        chs = t.column("n_chars").to_pylist()
        areas.append((max(ids) - min(ids) + 1) * (max(chs) - min(chs) + 1))
        glo_id += [min(ids), max(ids)]
        glo_ch += [min(chs), max(chs)]
    global_area = ((max(glo_id) - min(glo_id) + 1)
                   * (max(glo_ch) - min(glo_ch) + 1))
    nf = len(areas)
    assert nf >= 4
    # every file's bounding box must cover far less than the whole
    # plane: Z-order guarantees ~1/nf area per file up to fringe slop
    avg_area = sum(areas) / nf
    assert avg_area < global_area / nf * 4, (areas, global_area)
    # and a point query on BOTH dims prunes most files
    hit = sum(1 for f in sorted(glob.glob(f"{out}/part-*.parquet"))
              for t in [pq.read_table(f, columns=["doc_id", "n_chars"])]
              if min(t.column("doc_id").to_pylist()) <= 100
              <= max(t.column("doc_id").to_pylist())
              and min(t.column("n_chars").to_pylist()) <= 300
              <= max(t.column("n_chars").to_pylist()))
    assert hit <= nf // 2
