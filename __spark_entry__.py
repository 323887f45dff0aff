"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship validation pipeline at sf0.001.
``queries()`` exposes one callable per implemented operator (SURVEY.md §2 /
§2.6); ``oracle_sql()`` gives the DuckDB-equivalent SQL. The oracle SQL for
row-level validation is *generated from the same schema AST* the Spark plan
compiles from (peri_spark.oracle), so both engines answer from one
definition.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from peri_spark import validate
from peri_spark import oracle as po
from peri_spark.constraints import (chi_square_drift, column_stats,
                                    referential_violations,
                                    uniqueness_violations)
from peri_spark.generator import (FLAGSHIP_SCHEMA, code_files_sql,
                                  register_code_files)

_ID = ["repo", "path", "commit"]


def _violations_flat(df: DataFrame, schema, id_cols) -> DataFrame:
    res = validate(df, schema, mode="permissive")
    v = res.violations(*id_cols)  # violation path arrives as err_path (clash)
    return v.select(*id_cols, "key",
                    F.array_join("err_path", "/").alias("err_path"), "message")


def _code_files(spark: SparkSession, sf_dir: str) -> DataFrame:
    return register_code_files(spark, sf_dir, scale=1)


# ---------------------------------------------------------------------------


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: full validation-suite violations over code_files @ sf0.001."""
    df = _code_files(spark, "/root/testdata/sf0.001")
    res = validate(df, FLAGSHIP_SCHEMA, mode="permissive")
    return res.violations("repo", "path", "commit")


# ---------------------------------------------------------------------------
# queries: (spark, sf_dir) -> DataFrame   |   oracle: DuckDB SQL
# ---------------------------------------------------------------------------

def q_flagship_violations(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = _code_files(spark, sf_dir)
    return _violations_flat(df, FLAGSHIP_SCHEMA, _ID)


def q_flagship_valid(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = _code_files(spark, sf_dir)
    return validate(df, FLAGSHIP_SCHEMA).valid


def q_stats_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    s = column_stats(docs, ["doc_id", "text", "lang", "n_chars"],
                     exact_distinct=True)
    return s.select("column", "n_rows", "n_null",
                    F.round("null_rate", 6).alias("null_rate"),
                    "min_value", "max_value",
                    F.round("avg_len", 4).alias("avg_len"), "n_distinct")


def q_uniqueness_code_files(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = _code_files(spark, sf_dir)
    return uniqueness_violations(df, _ID, salt_buckets=8)


def q_referential_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = _code_files(spark, sf_dir)
    dim = (spark.read.parquet(f"{sf_dir}/documents.parquet")
           .select("lang").dropDuplicates())
    bad = referential_violations(df, "lang", dim, "lang", broadcast=True)
    return (bad.groupBy("lang").agg(F.count(F.lit(1)).alias("n_bad")))


def q_referential_lineitem_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    bad = referential_violations(li, "l_orderkey", orders, "o_orderkey",
                                 broadcast=True)
    return bad.select("l_orderkey", "l_linenumber")


def q_drift_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    d = chi_square_drift(docs, "n_chars", "source", lo=0.0, hi=2048.0,
                         buckets=8)
    return d.select(F.col("group").alias("grp"), "n",
                    F.round("chi2", 4).alias("chi2"), "drifted")


def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = _code_files(spark, sf_dir)
    return (df.where(F.col("content").isNotNull())
            .groupBy(F.md5("content").alias("content_hash"))
            .agg(F.count(F.lit(1)).alias("n_copies"))
            .where(F.col("n_copies") > 1))


def q_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return docs.select(
        "doc_id",
        F.size(F.split(F.trim("text"), r"\s+")).cast("long").alias("n_tokens"))


def q_text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    toks = F.size(F.split(F.trim("text"), r"\s+"))
    return docs.select(
        "doc_id",
        F.length("text").cast("long").alias("len_chars"),
        toks.cast("long").alias("n_tokens"),
        F.round(F.length("text") / toks, 4).alias("avg_token_len"),
        (F.length("text") == F.col("n_chars")).alias("n_chars_consistent"))


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "flagship_violations": q_flagship_violations,
        "flagship_valid": q_flagship_valid,
        "stats_documents": q_stats_documents,
        "uniqueness_code_files": q_uniqueness_code_files,
        "referential_lang": q_referential_lang,
        "referential_lineitem_orders": q_referential_lineitem_orders,
        "drift_documents": q_drift_documents,
        "dedup_exact": q_dedup_exact,
        "token_count": q_token_count,
        "text_quality": q_text_quality,
    }


# ---------------------------------------------------------------------------

_CF = f"({code_files_sql('duckdb')})"


def oracle_sql() -> dict[str, str]:
    flagship_viol = po.violations_sql(
        FLAGSHIP_SCHEMA, f"{_CF} AS code_files", _ID)
    flagship_valid = po.valid_rows_sql(
        FLAGSHIP_SCHEMA, f"{_CF} AS code_files",
        ["repo", "path", "commit", "lang", "content"])
    stats = """
    SELECT "column", n_rows, n_null, round(n_null * 1.0 / n_rows, 6) AS null_rate,
           min_value, max_value, round(avg_len, 4) AS avg_len, n_distinct
    FROM (
      SELECT 'doc_id' AS "column", count(*) AS n_rows,
             count(*) FILTER (WHERE doc_id IS NULL) AS n_null,
             CAST(min(doc_id) AS STRING) AS min_value,
             CAST(max(doc_id) AS STRING) AS max_value,
             avg(doc_id) AS avg_len, count(DISTINCT doc_id) AS n_distinct
      FROM documents
      UNION ALL
      SELECT 'text', count(*), count(*) FILTER (WHERE text IS NULL),
             CAST(min(text) AS STRING), CAST(max(text) AS STRING),
             avg(length(text)), count(DISTINCT text) FROM documents
      UNION ALL
      SELECT 'lang', count(*), count(*) FILTER (WHERE lang IS NULL),
             CAST(min(lang) AS STRING), CAST(max(lang) AS STRING),
             avg(length(lang)), count(DISTINCT lang) FROM documents
      UNION ALL
      SELECT 'n_chars', count(*), count(*) FILTER (WHERE n_chars IS NULL),
             CAST(min(n_chars) AS STRING), CAST(max(n_chars) AS STRING),
             avg(n_chars), count(DISTINCT n_chars) FROM documents
    )
    """
    uniq = f"""
    SELECT repo, path, "commit", CAST(count(*) AS BIGINT) AS n_dups
    FROM {_CF} AS code_files
    GROUP BY 1, 2, 3 HAVING count(*) > 1
    """
    ref_lang = f"""
    SELECT lang, count(*) AS n_bad FROM {_CF} AS code_files
    WHERE lang IS NOT NULL
      AND lang NOT IN (SELECT DISTINCT lang FROM documents WHERE lang IS NOT NULL)
    GROUP BY 1
    """
    ref_li = """
    SELECT l_orderkey, l_linenumber FROM lineitem l
    WHERE l.l_orderkey IS NOT NULL
      AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)
    """
    drift = """
    WITH nn AS (
      SELECT source AS grp,
             CAST(least(greatest(floor((n_chars - 0.0) / 256.0), 0), 7) AS INT) AS bucket
      FROM documents WHERE n_chars IS NOT NULL
    ),
    base AS (SELECT bucket, count(*) * 1.0 / (SELECT count(*) FROM nn) AS p
             FROM nn GROUP BY bucket),
    obs AS (SELECT grp, bucket, count(*) AS obs FROM nn GROUP BY 1, 2),
    tot AS (SELECT grp, sum(obs) AS total FROM obs GROUP BY 1),
    grid AS (
      SELECT t.grp, b.bucket, t.total, b.p, COALESCE(o.obs, 0) AS obs,
             t.total * b.p AS expected
      FROM tot t CROSS JOIN base b
      LEFT JOIN obs o ON o.grp = t.grp AND o.bucket = b.bucket
    )
    SELECT grp, CAST(max(total) AS BIGINT) AS n,
           round(sum((obs - expected) * (obs - expected) / expected), 4) AS chi2,
           sum((obs - expected) * (obs - expected) / expected) > {crit} AS drifted
    FROM grid WHERE expected > 0 GROUP BY grp
    """.format(crit=repr(__import__("peri_spark.constraints.drift",
                                    fromlist=["chi2_critical"])
                         .chi2_critical(7, 0.01)))
    dedup = f"""
    SELECT md5(content) AS content_hash, count(*) AS n_copies
    FROM {_CF} AS code_files WHERE content IS NOT NULL
    GROUP BY 1 HAVING count(*) > 1
    """
    tokens = r"""
    SELECT doc_id, length(string_split_regex(trim(text), '\s+')) AS n_tokens
    FROM documents
    """
    quality = r"""
    SELECT doc_id, length(text) AS len_chars,
           length(string_split_regex(trim(text), '\s+')) AS n_tokens,
           round(length(text) * 1.0 / length(string_split_regex(trim(text), '\s+')), 4)
             AS avg_token_len,
           length(text) = n_chars AS n_chars_consistent
    FROM documents
    """
    return {
        "flagship_violations": flagship_viol,
        "flagship_valid": flagship_valid,
        "stats_documents": stats,
        "uniqueness_code_files": uniq,
        "referential_lang": ref_lang,
        "referential_lineitem_orders": ref_li,
        "drift_documents": drift,
        "dedup_exact": dedup,
        "token_count": tokens,
        "text_quality": quality,
    }
