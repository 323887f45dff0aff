"""write_clustered layout writer: disjoint per-file key ranges, sorted
rows, prunable scans."""

import glob

import pyarrow.parquet as pq
import pytest

from peri_spark.sources import write_clustered


def test_files_own_disjoint_sorted_ranges(spark, tmp_path):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    out = str(tmp_path / "clustered")
    write_clustered(docs, out, "doc_id", num_files=4)

    files = sorted(glob.glob(f"{out}/part-*.parquet"))
    assert 2 <= len(files) <= 4
    ranges = []
    for f in files:
        t = pq.read_table(f, columns=["doc_id"])
        ids = t.column("doc_id").to_pylist()
        assert ids == sorted(ids), "rows inside a file must be sorted"
        ranges.append((min(ids), max(ids)))
    ranges.sort()
    for (lo1, hi1), (lo2, hi2) in zip(ranges, ranges[1:]):
        assert hi1 < lo2, f"file ranges overlap: {ranges}"

    back = spark.read.parquet(out)
    assert back.count() == docs.count()


def test_secondary_sort_and_validation(spark, tmp_path):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    out = str(tmp_path / "bylang")
    write_clustered(docs, out, "lang", sort_by=["lang", "doc_id"],
                    num_files=3)
    f = sorted(glob.glob(f"{out}/part-*.parquet"))[0]
    rows = pq.read_table(f, columns=["lang", "doc_id"]).to_pylist()
    keys = [(r["lang"], r["doc_id"]) for r in rows]
    assert keys == sorted(keys)


def test_rejects_empty_cluster_key(spark, tmp_path):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    with pytest.raises(ValueError):
        write_clustered(docs, str(tmp_path / "x"), [])
