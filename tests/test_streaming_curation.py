"""Curation operators under Structured Streaming: quality_filter,
repetition_stats (both fold variants) and redact_text are stateless
row transforms, so a curation pipeline can score/scrub in-stream before
anything lands in the corpus — results must be row-identical to the
batch run over the same files."""

import pytest

from peri_spark.functions import quality_filter, redact_text, repetition_stats

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs_dir(spark, tmp_path_factory):
    # readStream needs a DIRECTORY source; the testdata table is one file
    out = str(tmp_path_factory.mktemp("docs_stream") / "documents")
    spark.read.parquet(f"{SF_DIR}/documents.parquet") \
        .write.mode("overwrite").parquet(out)
    return out


@pytest.fixture(scope="module")
def docs_batch(spark, docs_dir):
    return spark.read.parquet(docs_dir)


def _stream(spark, batch, docs_dir):
    return spark.readStream.schema(batch.schema).parquet(docs_dir)


def _drain(stream, name):
    q = (stream.writeStream.format("memory").queryName(name)
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(120)


def _rows(spark, name):
    return sorted(map(tuple, spark.sql(f"SELECT * FROM {name}").collect()))


@pytest.mark.parametrize("arrow", [False, True])
def test_quality_filter_stream_matches_batch(spark, docs_batch, docs_dir, arrow):
    name = f"qf_stream_{int(arrow)}"
    _drain(quality_filter(_stream(spark, docs_batch, docs_dir), "text", "doc_id",
                          arrow=arrow), name)
    got = _rows(spark, name)
    want = sorted(map(tuple, quality_filter(docs_batch, "text", "doc_id",
                                            arrow=arrow).collect()))
    assert got == want and len(got) > 0


def test_repetition_stats_stream_matches_batch(spark, docs_batch, docs_dir):
    _drain(repetition_stats(_stream(spark, docs_batch, docs_dir), "text", "doc_id",
                            n=2, arrow=True), "rep_stream")
    got = _rows(spark, "rep_stream")
    want = sorted(map(tuple, repetition_stats(docs_batch, "text", "doc_id",
                                              n=2).collect()))
    assert got == want and len(got) > 0


def test_redact_text_stream_matches_batch(spark, docs_batch, docs_dir):
    _drain(redact_text(_stream(spark, docs_batch, docs_dir), "text"),
           "redact_stream")
    got = _rows(spark, "redact_stream")
    want = sorted(map(tuple, redact_text(docs_batch, "text").collect()))
    assert got == want and len(got) > 0


def test_scan_secrets_stream_matches_batch(spark, docs_batch, docs_dir):
    from peri_spark.functions import scan_secrets
    _drain(scan_secrets(_stream(spark, docs_batch, docs_dir), "text"),
           "secrets_stream")
    got = _rows(spark, "secrets_stream")
    want = sorted(map(tuple, scan_secrets(docs_batch, "text").collect()))
    assert got == want and len(got) > 0


def test_code_shape_stream_matches_batch(spark, docs_batch, docs_dir):
    from peri_spark.functions import code_shape_stats
    _drain(code_shape_stats(_stream(spark, docs_batch, docs_dir), "text"),
           "shape_stream")
    got = _rows(spark, "shape_stream")
    want = sorted(map(tuple, code_shape_stats(docs_batch, "text").collect()))
    assert got == want and len(got) > 0


def test_strip_data_uris_stream_matches_batch(spark, docs_batch, docs_dir):
    from peri_spark.functions import strip_data_uris
    _drain(strip_data_uris(_stream(spark, docs_batch, docs_dir), "text"),
           "strip_stream")
    got = _rows(spark, "strip_stream")
    want = sorted(map(tuple, strip_data_uris(docs_batch, "text").collect()))
    assert got == want and len(got) > 0


def test_code_profile_stream_matches_batch(spark, docs_batch, docs_dir):
    """The fused one-scan profile is a stateless projection, so an
    ingestion stream can compute EVERY per-file signal before anything
    lands in the corpus — row-identical to batch."""
    from pyspark.sql import functions as F

    from peri_spark.functions import code_profile

    def prep(df):
        return df.select(
            F.concat(F.lit("src/f"), F.col("doc_id").cast("string"),
                     F.lit(".py")).alias("path"),
            F.col("text").alias("content"))

    batch = (code_profile(prep(docs_batch), "path", "content")
             .drop("imported_modules"))   # arrays: compare via json
    _drain(code_profile(prep(_stream(spark, docs_batch, docs_dir)),
                        "path", "content").drop("imported_modules"),
           "profile_stream")
    got = _rows(spark, "profile_stream")
    want = sorted(map(tuple, batch.collect()))
    assert got == want and len(got) == 500
