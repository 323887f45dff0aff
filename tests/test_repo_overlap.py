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


def test_pruned_digest_disclosure(spark):
    counter = {}
    repo_overlap_pairs(_corpus(spark), "repo", "digest",
                       min_overlap=0.5, max_digest_df=3,
                       dropped_counter=counter).collect()
    # the boilerplate digest (df=4) is the one pruned past the cap
    assert counter == {"n_pruned_digests": 1, "n_pruned_rows": 4}


def _fork_family(spark, n_forks=300, n_shared=40):
    """A mega-fork family: every fork carries the parent's n_shared
    files (df = n_forks+1, far past any sane digest cap) plus one
    private file."""
    rows = [("parent", f"d{i}") for i in range(n_shared)]
    for f in range(n_forks):
        rows += [(f"fork{f:04d}", f"d{i}") for i in range(n_shared)]
        rows.append((f"fork{f:04d}", f"p{f}"))
    rows += [("loner", "q1"), ("loner", "q2")]
    return spark.createDataFrame(rows, "repo string, digest string")


def test_minhash_path_finds_family_the_capped_exact_path_cannot(spark):
    """VERDICT r04 #4: with a planted fork family wider than the digest
    cap, the exact path df-prunes every shared digest (disclosed) and
    goes blind; the signature path recovers the family with bounded
    intermediate rows and honest containment estimates."""
    from peri_spark.functions import repo_overlap_pairs_minhash
    fam = _fork_family(spark)
    counter = {}
    exact = repo_overlap_pairs(fam, "repo", "digest", min_overlap=0.5,
                               max_digest_df=100,
                               dropped_counter=counter).collect()
    assert exact == []                       # family invisible to exact
    assert counter["n_pruned_digests"] == 40  # ...and disclosed
    assert counter["n_pruned_rows"] == 40 * 301

    est = {(r.group_a, r.group_b): r
           for r in repo_overlap_pairs_minhash(
               fam, "repo", "digest", min_overlap=0.5).collect()}
    # every fork pairs with the parent; loner pairs with nobody
    parent_pairs = [k for k in est if "parent" in k]
    assert len(parent_pairs) == 300
    assert not [k for k in est if "loner" in k]
    r = est[("fork0000", "parent")]
    # fork size 41, parent 40, true shared 40 -> overlap 1.0; the
    # signature estimate must land within estimator error of it
    assert (r.size_a, r.size_b) == (41, 40)
    assert r.overlap >= 0.8
    # pairs among forks are real too (containment ~40/41)
    assert est[("fork0000", "fork0001")].overlap >= 0.8


def test_minhash_path_no_digest_join_in_plan(spark):
    """The signature path's physical plan must contain NO join keyed on
    the digest column — the whole point is that digests never pair."""
    from peri_spark.functions import repo_overlap_pairs_minhash
    fam = _fork_family(spark, n_forks=20, n_shared=10)
    out = repo_overlap_pairs_minhash(fam, "repo", "digest",
                                     min_overlap=0.5)
    rows = out.collect()
    assert rows  # sanity: family found
    # structural guarantee: bands_df carries only (id, band, band_hash),
    # so no plan node CAN join digests; assert the output schema too
    assert set(out.columns) == {"group_a", "group_b", "n_shared",
                                "size_a", "size_b", "overlap"}
