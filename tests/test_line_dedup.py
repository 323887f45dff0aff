"""Corpus-level line dedup (Dolma/RefinedWeb boilerplate pass)."""

import pytest
from pyspark.sql import functions as F

from peri_spark.functions import dedup_lines_across_corpus

BOILER = "SUBSCRIBE TO OUR NEWSLETTER TODAY"
RARE = "this line appears in only a handful of documents"


def _corpus(spark):
    rows = []
    for i in range(40):
        parts = [f"unique leading line of document {i}", BOILER]
        if i < 10:
            parts.append(RARE)
        parts.append("}}")          # short glue line, everywhere
        parts.append(f"unique trailing content {i} padded to length")
        rows.append((i, "\n".join(parts)))
    rows.append((99, None))
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_hot_lines_removed_rare_and_short_kept(spark):
    out = {r.doc_id: r for r in dedup_lines_across_corpus(
        _corpus(spark), "text", "doc_id", min_doc_freq=30,
        min_line_chars=5).collect()}
    d0 = out[0]
    assert BOILER not in d0.text_deduped          # hot (df=40 >= 30)
    assert RARE in d0.text_deduped                # df=10 < 30
    assert "}}" in d0.text_deduped                # short: always kept
    assert "unique leading line of document 0" in d0.text_deduped
    assert (d0.n_lines, d0.n_removed) == (5, 1)
    d20 = out[20]                                 # no RARE line
    assert (d20.n_lines, d20.n_removed) == (4, 1)
    assert out[99].text_deduped is None           # NULL propagates
    assert out[99].n_lines is None


def test_min_doc_freq_threshold_is_distinct_docs(spark):
    # one doc repeating a line 50 times must not make it corpus-hot
    rows = [(1, "\n".join(["only here but repeated a lot"] * 50))]
    rows += [(i, f"unique document body number {i}") for i in range(2, 6)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in dedup_lines_across_corpus(
        df, "text", "doc_id", min_doc_freq=2, min_line_chars=5).collect()}
    assert out[1].n_removed == 0                  # doc-freq 1 < 2


def test_output_column_clash_raises(spark):
    df = _corpus(spark).withColumn("n_removed", F.lit(0))
    with pytest.raises(ValueError, match="already exist"):
        dedup_lines_across_corpus(df, "text", "doc_id")


def test_unaffected_docs_identical_and_plan_joins_left(spark):
    df = _corpus(spark)
    out = dedup_lines_across_corpus(df, "text", "doc_id",
                                    min_doc_freq=100,  # nothing hot
                                    min_line_chars=5)
    rows = out.collect()
    assert all(r.n_removed in (0, None) for r in rows)
    assert all(r.text == r.text_deduped for r in rows
               if r.text is not None)


def test_null_id_docs_outside_frequency_model(spark):
    """Review finding r5: NULL-id documents must not collapse into one
    pseudo-doc in the doc-frequency count (the SQL oracle's
    count(DISTINCT id) excludes NULL)."""
    line = "shared line long enough to participate"
    rows = [(None, line), (None, line), (1, line),
            (2, "unique body of document two here")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in dedup_lines_across_corpus(
        df, "text", "doc_id", min_doc_freq=2,
        min_line_chars=5).collect()}
    # doc-freq of the shared line is 1 (only doc 1 counts) -> not hot
    assert out[1].n_removed == 0


def test_join_back_plan_hash_join_not_sort_merge(spark):
    """r6: the join-back to the corpus must never pay a sort of the
    text-bearing corpus rows — dense-regime plan is a shuffled hash
    join (AQE upgrades it to broadcast when `affected` measures small
    at runtime)."""
    df = spark.createDataFrame(
        [(i, "shared boilerplate line here\nunique %d" % i)
         for i in range(40)], "doc_id long, text string")
    out = dedup_lines_across_corpus(df, "text", "doc_id",
                                    min_doc_freq=2, min_line_chars=5)
    plan = out._jdf.queryExecution().executedPlan().toString()
    # the corpus join-back (on the document id) must be a hash join --
    # never a sort of the text-bearing rows. The step-2 hot-set join is
    # AQE's to upgrade at runtime and is not pinned here.
    jb = [ln for ln in plan.splitlines()
          if "Join" in ln and "doc_id" in ln]
    assert jb, plan
    assert all(("ShuffledHashJoin" in ln) or ("BroadcastHashJoin" in ln)
               for ln in jb), plan
