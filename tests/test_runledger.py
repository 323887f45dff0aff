"""Run ledger: checkpoint, resume-by-anti-join, lineage fingerprints."""

from pyspark.sql import functions as F

from peri_spark.runledger import RunLedger, schema_fingerprint


def test_fingerprint_stable_and_sensitive():
    s1 = {"a": ("required", "string"), "b": ("integer", ("gte", 0))}
    s2 = {"b": ("integer", ("gte", 0)), "a": ("required", "string")}
    s3 = {"a": ("required", "string"), "b": ("integer", ("gte", 1))}
    assert schema_fingerprint(s1) == schema_fingerprint(s2)  # order-free
    assert schema_fingerprint(s1) != schema_fingerprint(s3)


def test_ledger_resume_cycle(spark, tmp_path):
    path = str(tmp_path / "ledger")
    led = RunLedger(spark, path, schema_fp="abc", input_snapshot="in1")
    inv = spark.createDataFrame([("p1",), ("p2",), ("p3",)],
                                "partition_id string")
    assert led.pending(inv).count() == 3
    led.record("p1", "completed", 100, 2, 1.5, {"x": 1})
    led.record("p2", "failed", 0, 0, 0.1)
    pend = {r.partition_id for r in led.pending(inv).collect()}
    assert pend == {"p2", "p3"}  # failed partitions stay pending

    # a NEW ledger instance (fresh run / post-crash) sees the same state
    led2 = RunLedger(spark, path, schema_fp="abc", input_snapshot="in1")
    assert {r.partition_id for r in led2.pending(inv).collect()} == {"p2", "p3"}

    # different schema fingerprint → nothing is considered done (lineage)
    led3 = RunLedger(spark, path, schema_fp="zzz", input_snapshot="in1")
    assert led3.pending(inv).count() == 3

    led2.record("p2", "completed", 50, 0, 0.7)
    led2.record("p3", "completed", 70, 1, 0.9)
    assert led2.pending(inv).count() == 0
    m = led2.metrics().where(F.col("status") == "completed")
    assert m.count() == 3
