"""metric_anomalies run-history tests."""

import pytest

from peri_spark.constraints import metric_anomalies


def _history(spark):
    rows = []
    # stable series: 100 +/- small jitter, latest in-family
    for d, v in enumerate([100.0, 102.0, 98.0, 101.0, 100.0]):
        rows.append(("rows", "p0", d, v))
    # spiking series: latest is 10x the history
    for d, v in enumerate([10.0, 11.0, 9.0, 10.0, 100.0]):
        rows.append(("rows", "p1", d, v))
    # constant series that moves: zero variance, any change flags
    for d, v in enumerate([5.0, 5.0, 5.0, 5.0, 6.0]):
        rows.append(("viol", "p0", d, v))
    # short history -> NULL verdict
    rows += [("viol", "p1", 0, 1.0), ("viol", "p1", 1, 50.0)]
    return spark.createDataFrame(
        rows, "metric string, part string, run int, value double")


def test_zscore_method(spark):
    out = metric_anomalies(_history(spark), ["metric", "part"], "run")
    got = {(r.metric, r.part): r for r in out.collect()}
    ok = got[("rows", "p0")]
    assert ok.is_anomaly is False and ok.latest_run == 4
    assert ok.n_prior == 4 and ok.latest_value == 100.0
    spike = got[("rows", "p1")]
    assert spike.is_anomaly is True and spike.deviation > 3
    const = got[("viol", "p0")]
    assert const.is_anomaly is True and const.deviation is None
    short = got[("viol", "p1")]
    assert short.is_anomaly is None and short.n_prior == 1


def test_rate_method(spark):
    out = metric_anomalies(_history(spark), ["metric", "part"], "run",
                           method="rate", threshold=0.5)
    got = {(r.metric, r.part): r for r in out.collect()}
    spike = got[("rows", "p1")]      # 10 -> 100 = +900%
    assert spike.is_anomaly is True and spike.baseline == 10.0
    assert spike.deviation == pytest.approx(9.0)
    ok = got[("rows", "p0")]         # 101 -> 100 = -1%
    assert ok.is_anomaly is False and ok.baseline == 101.0


def test_null_values_ignored_and_method_validated(spark):
    df = _history(spark).union(
        _history(spark).limit(1).selectExpr(
            "metric", "part", "99 as run", "CAST(NULL AS DOUBLE) as value"))
    out = metric_anomalies(df, ["metric", "part"], "run")
    got = {(r.metric, r.part): r for r in out.collect()}
    # the NULL row at run 99 must not become the latest
    assert got[("rows", "p0")].latest_run == 4
    with pytest.raises(ValueError, match="unknown method"):
        metric_anomalies(df, ["metric"], "run", method="iqr")


def test_single_exchange_plan(spark):
    plan = metric_anomalies(_history(spark), ["metric", "part"], "run") \
        ._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1
    assert "BatchEvalPython" not in plan


def test_runledger_anomalies_end_to_end(spark, tmp_path):
    """Three healthy runs then a collapsed-row-count run: the ledger's
    own anomaly view must flag n_rows for the bad partition only."""
    from peri_spark.runledger import RunLedger
    path = str(tmp_path / "ledger")
    for day, rows_p0 in enumerate([1000, 1010, 990, 100]):
        led = RunLedger(spark, path, schema_fp="fp", input_snapshot="s")
        led.record("p0", "completed", rows_p0, rows_p0 // 100, 1.0)
        led.record("p1", "completed", 500, 5, 1.0)
    out = RunLedger(spark, path).anomalies(threshold=2.0, min_history=2)
    got = {(r.partition_id, r.metric): r for r in out.collect()}
    assert got[("p0", "n_rows")].is_anomaly is True
    assert got[("p0", "n_rows")].latest_value == 100.0
    assert got[("p1", "n_rows")].is_anomaly is False
    assert got[("p1", "n_violations")].is_anomaly is False
