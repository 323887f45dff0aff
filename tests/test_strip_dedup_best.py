"""strip_data_uris and quality-aware cluster dedup."""

from peri_spark.functions import (deduplicate_by_clusters_best,
                                  strip_data_uris)


def test_strip_data_uris(spark):
    blob = "A" * 60
    rows = [
        (0, f'see <img src="data:image/png;base64,{blob}==">'),
        (1, "plain prose, no blobs"),
        (2, f"data:font/woff2;base64,{blob} and data:image/gif;base64,{blob}"),
        (3, "short icon data:image/png;base64,QUJD stays"),   # < 40 chars
        (4, None),
    ]
    df = spark.createDataFrame(rows, "id long, text string")
    got = {r.id: r for r in strip_data_uris(df, "text").collect()}
    assert got[0].n_data_uris == 1 and "[DATA_URI]" in got[0].text_stripped
    assert "base64" not in got[0].text_stripped
    assert got[0].data_uri_chars == len(f"data:image/png;base64,{blob}==")
    assert got[1].n_data_uris == 0 and got[1].data_uri_chars == 0
    assert got[2].n_data_uris == 2
    assert got[3].n_data_uris == 0 and "QUJD" in got[3].text_stripped
    assert got[4].n_data_uris is None


def test_strip_plan_is_projection_only(spark):
    df = spark.createDataFrame([(1, "x")], "id long, text string")
    plan = strip_data_uris(df, "text") \
        ._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan and "BatchEvalPython" not in plan


def _corpus_and_clusters(spark):
    rows = [(1, 10.0), (2, 30.0), (3, 30.0), (4, 5.0), (9, 1.0)]
    df = spark.createDataFrame(rows, "id long, score double")
    clusters = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 1)], "id long, cluster_id long")
    return df, clusters


def test_dedup_best_keeps_highest_score(spark):
    df, clusters = _corpus_and_clusters(spark)
    kept = {r.id for r in
            deduplicate_by_clusters_best(df, "id", clusters,
                                         "score").collect()}
    # cluster {1,2,3}: scores 10/30/30 -> keep id=2 (tie broken low id);
    # 4 and 9 are singletons (absent from clusters) and survive
    assert kept == {2, 4, 9}


def test_dedup_best_vs_keep_min(spark):
    from peri_spark.functions import deduplicate_by_clusters
    df, clusters = _corpus_and_clusters(spark)
    kept_min = {r.id for r in
                deduplicate_by_clusters(df, "id", clusters).collect()}
    assert kept_min == {1, 4, 9}   # min-id canonical, quality-blind
