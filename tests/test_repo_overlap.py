"""repo_overlap_pairs fork-detection tests."""

import pytest
from pyspark.sql import functions as F

from peri_spark.functions import repo_overlap_pairs


def _corpus(spark):
    rows = []
    # parent repo: files 0..9
    rows += [("parent", f"d{i}") for i in range(10)]
    # fork: 9 of parent's files + 3 new -> containment 0.9 vs parent
    rows += [("fork", f"d{i}") for i in range(9)]
    rows += [("fork", f"x{i}") for i in range(3)]
    # unrelated repo, one incidental shared file
    rows += [("other", "d0"), ("other", "y1"), ("other", "y2")]
    # boilerplate digest shared by EVERYONE (df too high under cap 3)
    rows += [(r, "boiler") for r in ("parent", "fork", "other", "solo")]
    rows += [("solo", "z1")]
    return spark.createDataFrame(rows, "repo string, digest string")


def test_fork_detected_boilerplate_pruned(spark):
    out = {(r.group_a, r.group_b): r for r in repo_overlap_pairs(
        _corpus(spark), "repo", "digest",
        min_overlap=0.5, max_digest_df=3).collect()}
    pair = out[("fork", "parent")]
    # 9 shared real files; boilerplate digest (df=4 > cap) never counts
    assert pair.n_shared == 9
    # sizes count ALL distinct files (parent 11 incl boiler), so
    # overlap = 9/11 — pruning affects only the candidate join
    assert pair.overlap == pytest.approx(round(9 / 11, 4))
    assert (pair.size_a, pair.size_b) == (13, 11)
    assert ("other", "parent") not in out          # 1/4 below threshold
    assert not [k for k in out if "solo" in k]     # boiler-only overlap


def test_overlap_threshold_and_duplicate_rows(spark):
    df = _corpus(spark).union(_corpus(spark))      # dup rows collapse
    out = repo_overlap_pairs(df, "repo", "digest",
                             min_overlap=0.5, max_digest_df=3)
    assert out.count() == 1                        # still just the fork pair


def test_fork_pairs_compose_with_cluster_dedup(spark):
    """Fork families collapse to one canonical repo via the existing
    pairs -> connected-components pipeline (string ids work: the
    component minimum is lexicographic)."""
    from peri_spark.functions import near_dup_clusters
    pairs = repo_overlap_pairs(_corpus(spark), "repo", "digest",
                               min_overlap=0.5, max_digest_df=3) \
        .select(F.col("group_a").alias("id_a"),
                F.col("group_b").alias("id_b"))
    labels = {r.id: r.cluster_id for r in near_dup_clusters(pairs).collect()}
    assert labels == {"fork": "fork", "parent": "fork"}
