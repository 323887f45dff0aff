"""Round-2 regression tests: ValidationSuite fused-path parity (composite
FK nulls, configured drift baseline, multiple uniqueness key sets, gated
driver collect), de-skewed dedup, LSH hot-bucket cap, one-job
validate_job execution, anchored :time, and PandasFn ABI fixes."""

import uuid

import pytest
from pyspark.sql import functions as F

import peri_spark as ps
from peri_spark.suite import ValidationSuite


@pytest.fixture(scope="module")
def facts(spark):
    rows = []
    for i in range(400):
        grp = f"g{i % 4}"
        # composite FK: (a, b); row i%10==3 has a set but b null → NOT a
        # violation; i%10==7 has both set but unmatched → violation
        a = None if i % 10 == 4 else f"a{i % 5}"
        b = None if i % 10 == 3 else f"b{i % 5}"
        if i % 10 == 7:
            a, b = "aX", "bX"
        val = float(i % 50)
        rows.append((grp, a, b, val, i))
    return spark.createDataFrame(
        rows, "grp string, fka string, fkb string, val double, id long")


@pytest.fixture(scope="module")
def dim(spark):
    return spark.createDataFrame(
        [(f"a{i}", f"b{i}") for i in range(5)], "pa string, pb string")


SCHEMA = {"val": ("float", ("gte", 0.0)), "grp": ("required", "string")}


def _suite(facts, dim, baseline=None):
    return (ValidationSuite(SCHEMA, mode="permissive")
            .with_stats(["grp", "val"])
            .with_uniqueness(["id"])
            .with_uniqueness(["grp", "fka"], salt_buckets=4)
            .with_referential(["fka", "fkb"], dim, ["pa", "pb"])
            .with_drift("val", "grp", lo=0.0, hi=50.0, buckets=5,
                        baseline=baseline)
            .with_partitioning("grp"))


def test_fused_matches_sequential_composite_fk_and_dual_uniqueness(
        spark, facts, dim):
    fused = _suite(facts, dim).run_fused(facts)
    seq = _suite(facts, dim)._run_sequential(facts, eager=True)
    # composite FK: rows with ANY null FK column are not violations
    assert (fused.counters["n_ref_violations:fka,fkb"]
            == seq.counters["n_ref_violations:fka,fkb"]
            == facts.where("fka = 'aX'").count())
    # lazily-built violating rows agree with the fused counter
    assert (fused.referential["fka,fkb"].count()
            == fused.counters["n_ref_violations:fka,fkb"])
    # two uniqueness key sets — independent results, independent counters
    assert set(fused.duplicates) == {"id", "grp,fka"}
    assert fused.counters["n_duplicate_keys:id"] == 0
    assert (fused.counters["n_duplicate_keys:grp,fka"]
            == seq.counters["n_duplicate_keys:grp,fka"] > 0)
    assert fused.counters["n_rows"] == seq.counters["n_rows"] == 400
    assert fused.counters["n_bad_rows"] == seq.counters["n_bad_rows"]


def test_fused_uses_configured_drift_baseline(spark, facts, dim):
    from peri_spark.constraints import chi_square_drift
    from peri_spark.constraints.drift import histogram

    # a deliberately skewed baseline (all mass in bucket 0) must flip the
    # drifted verdicts vs the self-derived pooled histogram
    skewed = facts.where("val < 10")
    baseline = histogram(skewed, "val", 0.0, 50.0, 5)
    fused = _suite(facts, dim, baseline=baseline).run_fused(facts)
    direct = chi_square_drift(facts, "val", "grp", 0.0, 50.0, 5,
                              baseline=baseline)
    f = {r["group"]: (r["n"], round(r["chi2"], 4), r["drifted"])
         for r in fused.drift.collect()}
    d = {r["group"]: (r["n"], round(r["chi2"], 4), r["drifted"])
         for r in direct.collect()}
    assert f == d
    # and the self-baseline fused result differs (sanity that the test bites)
    selfb = _suite(facts, dim).run_fused(facts)
    s = {r["group"]: round(r["chi2"], 4) for r in selfb.drift.collect()}
    assert s != {g: c for g, (_n, c, _dr) in f.items()}


def test_fused_distributed_derivation_above_collect_threshold(
        spark, facts, dim):
    suite = _suite(facts, dim)
    suite.derive_collect_threshold = 3  # force the distributed path
    fused = suite.run_fused(facts)
    ref = _suite(facts, dim).run_fused(facts)
    assert fused.counters["n_rows"] == ref.counters["n_rows"]
    assert fused.counters["n_bad_rows"] == ref.counters["n_bad_rows"]
    assert (fused.counters["n_ref_violations:fka,fkb"]
            == ref.counters["n_ref_violations:fka,fkb"])
    assert ({r["group"]: r["drifted"] for r in fused.drift.collect()}
            == {r["group"]: r["drifted"] for r in ref.drift.collect()})


def test_fused_stats_match_separate_scan(spark, facts, dim):
    """Opt-in sketch-merged fused stats reproduce the separate
    pruned-scan stage (exact for nulls/min/max/avg; HLL estimates are
    exact at this cardinality)."""
    from peri_spark.constraints import column_stats

    fused = (_suite(facts, dim)
             .with_stats(["grp", "val"], fused=True).run_fused(facts))
    assert fused.timings.get("stats") is not None
    expect = {r["column"]: r for r in
              column_stats(facts, ["grp", "val"],
                           exact_distinct=True).collect()}
    got = {r["column"]: r for r in fused.stats.collect()}
    assert set(got) == {"grp", "val"}
    for c in ("grp", "val"):
        e, gt = expect[c], got[c]
        assert gt["n_rows"] == e["n_rows"] and gt["n_null"] == e["n_null"]
        assert gt["min_value"] == e["min_value"]
        assert gt["max_value"] == e["max_value"]
        assert abs(gt["avg_len"] - e["avg_len"]) < 1e-9
        assert gt["n_distinct"] == e["n_distinct"]
    # stats columns not in the annotated frame → falls back to the
    # separate scan, still correct
    s2 = (ValidationSuite(SCHEMA, mode="strict")
          .with_stats(["id"]).with_partitioning("grp"))
    # strict mode drops id unless declared+partition col present; grp is
    # partitioned so keep schema minimal
    r2 = s2.run_fused(facts.select("grp", "val", "id"))
    assert {r["column"] for r in r2.stats.collect()} == {"id"}


def test_fused_exact_distinct_grouping_sets(spark, facts, dim):
    """exact_distinct=True: EXACT n_distinct fused into the single
    scan+shuffle via GROUPING SETS; counters/verdicts/drift unchanged."""
    from peri_spark.constraints import column_stats

    suite = (_suite(facts, dim)
             .with_stats(["grp", "val"], fused=True, exact_distinct=True))
    fused = suite.run_fused(facts)
    expect = {r["column"]: r for r in
              column_stats(facts, ["grp", "val"],
                           exact_distinct=True).collect()}
    got = {r["column"]: r for r in fused.stats.collect()}
    for c in ("grp", "val"):
        e, gt = expect[c], got[c]
        assert gt["n_rows"] == e["n_rows"] and gt["n_null"] == e["n_null"]
        assert gt["min_value"] == e["min_value"]
        assert gt["max_value"] == e["max_value"]
        assert abs(gt["avg_len"] - e["avg_len"]) < 1e-9
        assert gt["n_distinct"] == e["n_distinct"]  # exact, not estimate
    ref = _suite(facts, dim).run_fused(facts)
    assert fused.counters["n_rows"] == ref.counters["n_rows"]
    assert fused.counters["n_bad_rows"] == ref.counters["n_bad_rows"]
    assert (fused.counters["n_ref_violations:fka,fkb"]
            == ref.counters["n_ref_violations:fka,fkb"])
    assert ({r["group"]: r["drifted"] for r in fused.drift.collect()}
            == {r["group"]: r["drifted"] for r in ref.drift.collect()})
    # plan shape: ONE Expand feeding a hash-based partial aggregate
    # (fixed-width buffers — no SortAggregate demotion, no corpus sort),
    # exactly one corpus exchange (counter groups + map-side-deduped
    # values share it, keyed by the grouping id), no Python
    g, *_ = suite.fused_grouped_plan(facts)
    p = g._jdf.queryExecution().executedPlan().toString()
    assert "Expand" in p
    assert "SortAggregate" not in p and "HashAggregate" in p
    corpus_exchanges = [l for l in p.splitlines()
                        if "Exchange hashpartitioning" in l
                        and "spark_grouping_id" in l]
    assert len(corpus_exchanges) == 1
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p
    # distributed derivation path agrees too
    suite2 = (_suite(facts, dim)
              .with_stats(["grp", "val"], fused=True, exact_distinct=True))
    suite2.derive_collect_threshold = 3
    f2 = suite2.run_fused(facts)
    assert ({r["column"]: r["n_distinct"] for r in f2.stats.collect()}
            == {c: got[c]["n_distinct"] for c in got})
    assert f2.counters["n_rows"] == ref.counters["n_rows"]


def test_uniqueness_hash_prefilter_exact(spark, facts, dim):
    """hash_prefilter plan returns the identical duplicate set: phase-1
    hash counts only gate candidates; exact keys re-counted in phase 2."""
    from peri_spark.constraints import uniqueness_violations

    base = {tuple(r) for r in
            uniqueness_violations(facts, ["grp", "fka"]).collect()}
    pre = {tuple(r) for r in
           uniqueness_violations(facts, ["grp", "fka"],
                                 hash_prefilter=True).collect()}
    assert pre == base and len(pre) > 0
    # phase-1 shuffle carries the 8-byte hash, not the key strings
    plan = (uniqueness_violations(facts, ["grp", "fka"],
                                  hash_prefilter=True)
            ._jdf.queryExecution().optimizedPlan().toString())
    assert "xxhash64" in plan
    # suite wiring: with_uniqueness(..., hash_prefilter=True) matches too
    s = (ValidationSuite(SCHEMA, mode="permissive")
         .without_stats()
         .with_uniqueness(["grp", "fka"], hash_prefilter=True)
         .with_partitioning("grp"))
    r = s.run_fused(facts)
    assert r.counters["n_duplicate_keys:grp,fka"] == len(base)


# ---------------------------------------------------------------------------
# dedup de-skew
# ---------------------------------------------------------------------------


def test_exact_duplicates_no_collect_list_and_hot_digest(spark):
    from peri_spark.functions import exact_duplicates

    # non-foldable text (a literal would constant-fold the digest away
    # and degenerate the plan); 99% of rows share ONE hot digest
    big = spark.range(100_000).select(
        F.col("id"),
        F.when(F.col("id") % 100 != 0, F.lit("identical boilerplate"))
         .otherwise(F.concat(F.lit("u"), F.col("id").cast("string")))
         .alias("text"))
    pairs = exact_duplicates(big, "text", "id")
    opt = pairs._jdf.queryExecution().optimizedPlan().toString()
    assert "collect_list" not in opt
    # the hot digest reduces via a hash aggregate + a streaming join
    # back — NO Window (a window would buffer the whole digest group in
    # one task) and no array materialization on a single reducer
    # (VERDICT r02 #2)
    assert "Window" not in opt
    phys = pairs._jdf.queryExecution().executedPlan().toString()
    assert "HashAggregate" in phys and "Window" not in phys
    # ONE corpus scan + ONE shuffle: both join inputs hang off the same
    # repartition(__h) exchange; AQE stage reuse dedupes them in the
    # EXECUTED plan (broadcast disabled = the at-scale join shape)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        pairs2 = exact_duplicates(big, "text", "id")
        rows = pairs2.collect()
        final = pairs2._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    assert "isFinalPlan=true" in final
    assert "ReusedExchange" in final          # sha256 pass runs ONCE
    assert len(rows) == 99_000 - 1
    # min id in the hot-digest group is 1 (id 0 has unique text "u0")
    r = pairs.where(F.col("dup_id") == 77).collect()[0]
    assert r["canonical_id"] == 1 and r["n"] == 99_000


def test_exact_duplicates_small_correctness(spark):
    from peri_spark.functions import exact_duplicates

    df = spark.createDataFrame(
        [(1, "x"), (2, "x"), (3, "y"), (4, "x"), (5, None)],
        "id long, text string")
    got = {(r["canonical_id"], r["dup_id"], r["n"])
           for r in exact_duplicates(df, "text", "id").collect()}
    assert got == {(1, 2, 3), (1, 4, 3)}


def test_lsh_hot_bucket_cap(spark):
    from peri_spark.functions import lsh_duplicate_pairs

    # 20k identical docs: every band bucket is degenerate → capped join
    # completes without a quadratic pair blowup (uncapped: 16×20k² pairs)
    big = spark.range(20_000).select(
        F.col("id"),
        F.lit("the same license header text for everyone here").alias("t"))
    dropped = {}
    pairs = lsh_duplicate_pairs(big, "t", "id", threshold=0.5,
                                n_hashes=16, bands=4,
                                max_bucket_size=100,
                                dropped_counter=dropped)
    assert pairs.count() == 0
    assert dropped["n_hot_buckets"] == 4          # one per band
    assert dropped["n_dropped_rows"] == 4 * 20_000


def test_lsh_cap_keeps_normal_buckets(spark):
    from peri_spark.functions import lsh_duplicate_pairs

    docs = [(i, f"completely unique document number {i} with words "
             f"{i * 7} {i * 13} {i * 31}") for i in range(50)]
    docs += [(1000, docs[0][1]), (1001, docs[1][1])]  # planted dups
    df = spark.createDataFrame(docs, "id long, t string")
    pairs = lsh_duplicate_pairs(df, "t", "id", threshold=0.9,
                                max_bucket_size=10)
    got = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
    assert {(0, 1000), (1, 1001)} <= got


# ---------------------------------------------------------------------------
# one-job validate_job
# ---------------------------------------------------------------------------


def _job_count(spark, df, ledger, output):
    import sys
    sys.path.insert(0, "/root/repo")
    from jobs.validate_job import run_pending

    sc = spark.sparkContext
    group = f"jobcount-{uuid.uuid4().hex[:8]}"
    sc.setJobGroup(group, "count jobs")
    try:
        summary = run_pending(spark, df, SCHEMA, "grp", "permissive",
                              ledger, output)
    finally:
        sc.setLocalProperty("spark.jobGroup.id", None)
    return len(sc.statusTracker().getJobIdsForGroup(group)), summary


def test_validate_job_job_count_constant_in_partitions(spark, tmp_path):
    from peri_spark.runledger import RunLedger

    def mkdf(nparts):
        return spark.range(1000).select(
            (F.col("id") % nparts).cast("string").alias("grp"),
            (F.col("id").cast("double") - 5.0).alias("val"))

    n4, s4 = _job_count(spark, mkdf(4),
                        RunLedger(spark, str(tmp_path / "l4")), None)
    n16, s16 = _job_count(spark, mkdf(16),
                          RunLedger(spark, str(tmp_path / "l16")), None)
    assert s4["n_partitions"] == 4 and s16["n_partitions"] == 16
    assert s4["n_rows"] == s16["n_rows"] == 1000
    # the whole run is a CONSTANT number of Spark jobs — no per-partition
    # driver loop (4× the partitions, same job count)
    assert n16 == n4


def test_validate_job_resume_touches_only_pending(spark, tmp_path):
    import sys
    sys.path.insert(0, "/root/repo")
    from jobs.validate_job import run_pending
    from peri_spark.runledger import RunLedger, schema_fingerprint

    ledger_path = str(tmp_path / "ledger")
    out = str(tmp_path / "out")
    df = spark.range(100).select(
        (F.col("id") % 5).cast("string").alias("grp"),
        (F.col("id").cast("double") - 50.0).alias("val"))  # half violate
    fp = schema_fingerprint(SCHEMA)

    led = RunLedger(spark, ledger_path, schema_fp=fp, input_snapshot="in1")
    s1 = run_pending(spark, df, SCHEMA, "grp", "permissive", led, out)
    assert s1["n_partitions"] == 5

    # resume with the same lineage: nothing pending → zero partitions
    led2 = RunLedger(spark, ledger_path, schema_fp=fp, input_snapshot="in1")
    s2 = run_pending(spark, df, SCHEMA, "grp", "permissive", led2, out,
                     resume=True)
    assert s2["n_partitions"] == 0

    # new partitions appear → only they are validated on resume
    df2 = df.union(spark.range(100, 140).select(
        F.lit("g_new").alias("grp"), F.col("id").cast("double").alias("val")))
    led3 = RunLedger(spark, ledger_path, schema_fp=fp, input_snapshot="in1")
    s3 = run_pending(spark, df2, SCHEMA, "grp", "permissive", led3, out,
                     resume=True)
    assert s3["n_partitions"] == 1 and s3["n_rows"] == 40

    # violations output is partition-laid-out (partitionBy write)
    import os
    assert any(d.startswith("__pid=") for d in
               os.listdir(f"{out}/violations"))


# ---------------------------------------------------------------------------
# :time anchoring + PandasFn ABI
# ---------------------------------------------------------------------------


def test_time_directive_anchored_and_range_checked(spark):
    df = spark.createDataFrame(
        [(1, "12:00:00"), (2, "23:59:59.123"), (3, "99:99:99"),
         (4, "12:00:00garbage"), (5, "7:00:00"), (6, None)],
        "id long, t string")
    res = ps.validate(df, {"t": "time"}, mode="permissive")
    bad = {r["id"] for r in res.invalid.select("id").collect()}
    assert bad == {3, 4, 5}


def test_pandasfn_transform_two_arg_abi(spark):
    from peri_spark.dsl import PandasFn

    def add_flag(values, root):
        # root arrives as a pandas DataFrame of the row's columns
        return values + ":" + root["lang"]

    df = spark.createDataFrame([("a", "en"), ("b", "es")],
                               "name string, lang string")
    out = ps.validate(
        df, {"name": ("string", ("transform", PandasFn(add_flag))),
             "lang": "string"},
        mode="permissive").valid
    assert {r["name"] for r in out.collect()} == {"a:en", "b:es"}


def test_pandasfn_custom_two_arg_and_single_python_eval(spark):
    from peri_spark.dsl import PandasFn

    def check(values, root):
        return values <= root["cap"], "exceeds cap"

    df = spark.createDataFrame([(5, 10), (20, 10)], "v long, cap long")
    res = ps.validate(df, {"v": ("custom", PandasFn(check)),
                           "cap": "integer"}, mode="permissive")
    assert {r["v"] for r in res.invalid.collect()} == {20}
    # the UDF result struct is referenced twice (ok + message) but must
    # evaluate in ONE ArrowEvalPython round-trip (Catalyst dedups it)
    plan = res.annotated._jdf.queryExecution().executedPlan().toString()
    assert plan.count("ArrowEvalPython") == 1


# ---------------------------------------------------------------------------
# sources: Iceberg/catalog identifier vs parquet path resolution


def test_load_table_parquet_path(spark):
    from peri_spark.sources import load_table
    df = load_table(spark, "/root/testdata/sf0.001/documents.parquet")
    assert df.count() > 0


def test_load_table_catalog_identifier(spark):
    from peri_spark.sources import is_table_identifier, load_table
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    docs.createOrReplaceTempView("src_docs_view")
    assert is_table_identifier("src_docs_view")
    assert not is_table_identifier("/tmp/x.parquet")
    # same DSv2 catalog resolve path an Iceberg catalog table goes through
    assert load_table(spark, "src_docs_view").count() == docs.count()


def test_load_table_snapshot_pin_requires_identifier(spark):
    import pytest as _pytest
    from peri_spark.sources import load_table
    with _pytest.raises(ValueError):
        load_table(spark, "/tmp/some/path", snapshot_id=3)


def test_current_snapshot_id_none_without_iceberg(spark):
    from peri_spark.sources import current_snapshot_id
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    docs.createOrReplaceTempView("src_docs_view2")
    assert current_snapshot_id(spark, "src_docs_view2") is None
    assert current_snapshot_id(
        spark, "/root/testdata/sf0.001/documents.parquet") is None


def test_resume_pins_ledger_recorded_snapshot(spark, tmp_path):
    """--resume must revalidate the snapshot the interrupted run
    recorded, not whatever the table moved to since."""
    from peri_spark.runledger import RunLedger

    path = str(tmp_path / "ledger")
    led = RunLedger(spark, path, schema_fp="fp1",
                    input_snapshot="cat.db.files@7")
    v = spark.createDataFrame([("p1", 10, 0, True)],
                              "partition_id string, n_rows long, "
                              "n_violations long, passed boolean")
    led.record_batch(v, wall_seconds=1.0)
    # a later run against a NEWER snapshot of the same table
    led2 = RunLedger(spark, path, schema_fp="fp1",
                     input_snapshot="cat.db.files@9")
    led2.record_batch(v, wall_seconds=1.0)
    assert RunLedger.last_recorded_snapshot(
        spark, path, "fp1", "cat.db.files") == 9
    # different schema or input → no pin
    assert RunLedger.last_recorded_snapshot(
        spark, path, "other_fp", "cat.db.files") is None
    assert RunLedger.last_recorded_snapshot(
        spark, path, "fp1", "cat.db.other") is None
    assert RunLedger.last_recorded_snapshot(
        spark, str(tmp_path / "missing"), "fp1", "cat.db.files") is None


def test_winnow_drops_null_text(spark):
    from peri_spark.functions import winnow_fingerprints

    df = spark.createDataFrame(
        [(1, "the quick brown fox jumps over it"), (2, None)],
        "id long, t string")
    rows = winnow_fingerprints(df, "t", "id").collect()
    assert [r["id"] for r in rows] == [1]


def test_pandasfn_two_arity_custom_without_root_raises():
    from peri_spark.compiler import Ctx, compile_node
    from peri_spark.dsl import PandasFn, parse
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    node = parse(("custom", PandasFn(lambda s, root: (s.notna(), "bad"),
                                     returns="boolean")))
    ctx = Ctx(root=lambda n: F.col(n), key="x", root_fields=())
    with pytest.raises(NotImplementedError, match="root columns"):
        compile_node(node, F.col("x"), T.StringType(), ctx)


def test_pandasfn_defaulted_root_param_still_compiles():
    """fn(s, root=None) is callable 1-ary — the compile-time guard must
    key off REQUIRED arity, not raw parameter count."""
    from peri_spark.compiler import Ctx, compile_node
    from peri_spark.dsl import PandasFn, parse
    from pyspark.sql import types as T

    node = parse(("custom", PandasFn(lambda s, root=None: (s.notna(), "bad"),
                                     returns="boolean")))
    ctx = Ctx(root=lambda n: F.col(n), key="x", root_fields=())
    compiled = compile_node(node, F.col("x"), T.StringType(), ctx)
    assert compiled is not None  # no NotImplementedError


def test_validate_job_null_partition_fresh_vs_resume(spark, tmp_path):
    """Rows with a NULL partition value must be validated identically by
    fresh and resumed runs (sentinel id, semi-join matches, ledger keyed)."""
    from jobs.validate_job import run_pending
    from peri_spark.runledger import RunLedger, schema_fingerprint

    df = spark.createDataFrame(
        [(None, -1.0), (None, 2.0), ("g1", 3.0), ("g1", -4.0)],
        "grp string, val double")
    fp = schema_fingerprint(SCHEMA)
    lp = str(tmp_path / "ledger")
    led = RunLedger(spark, lp, schema_fp=fp, input_snapshot="in1")
    s1 = run_pending(spark, df, SCHEMA, "grp", "permissive", led,
                     str(tmp_path / "out"))
    assert s1["n_partitions"] == 2 and s1["n_rows"] == 4
    # resume over the same data: the null partition is checkpointed too
    led2 = RunLedger(spark, lp, schema_fp=fp, input_snapshot="in1")
    s2 = run_pending(spark, df, SCHEMA, "grp", "permissive", led2,
                     str(tmp_path / "out"), resume=True)
    assert s2["n_partitions"] == 0 and s2["n_rows"] == 0
