"""Deterministic synthetic ``code_files`` table (FIXTURES.md §F1).

The north-rule input is an Iceberg table of source-code repositories
``(repo, path, commit, lang, content)``. This module derives that table
*deterministically* from the driver-generated ``documents`` parquet via a
single SQL template that both Spark SQL and DuckDB can execute — so the
DuckDB oracle sees byte-identical inputs (md5/substr/concat/% are
engine-portable).

Dirt injection (all keyed off ``doc_id`` — reproducible at any SF):
- skew: doc_id%100 < 40 → two giant "bigorg/monorepo{0,1}" repos (~40% of rows)
- ~0.5% non-enum ``lang`` (doc_id%211=5 → 'klingon')
- ~0.6% malformed commit (doc_id%157=9 → 'BADCOMMIT', fails ^[0-9a-f]{40}$)
- ~0.3% null content (doc_id%333=7)
- empty path (doc_id%100=99 → '' fails min-length 1)
- ~0.4% duplicated (repo,path,commit) keys (rows doc_id%250=11 unioned twice)
- ``scale`` fan-out: each document row becomes ``scale`` files with distinct
  paths (cross join with a sequence — pure Spark/DuckDB exprs, no driver loop)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

__all__ = ["CODE_FILES_SQL", "code_files_sql", "code_files",
           "FLAGSHIP_SCHEMA", "LANG_ENUM", "register_code_files"]

LANG_ENUM = ["en", "es", "de", "fr", "zh"]  # documents.lang domain

# {q} = identifier quote ("`" Spark, '"' DuckDB); {docs} = documents relation;
# {copies} = per-document fan-out relation producing column cp (0..scale-1)
_TEMPLATE = """
SELECT
  CASE WHEN (doc_id * 31 + cp) % 100 < 40
       THEN 'bigorg/monorepo' || CAST((doc_id + cp) % 2 AS STRING)
       ELSE 'org' || CAST((doc_id * 7 + cp) % 23 AS STRING)
            || '/repo' || CAST((doc_id * 13 + cp) % 97 AS STRING)
  END AS repo,
  CASE WHEN (doc_id + cp) % 100 = 99 THEN ''
       ELSE 'src/m' || CAST(doc_id % 13 AS STRING) || '/f'
            || CAST(doc_id AS STRING) || '_' || CAST(cp AS STRING) || '.py'
  END AS path,
  CASE WHEN (doc_id + cp) % 157 = 9 THEN 'BADCOMMIT'
       ELSE md5(CAST(doc_id AS STRING) || ':' || CAST(cp AS STRING))
            || substr(md5(CAST(doc_id + cp + 1 AS STRING)), 1, 8)
  END AS {q}commit{q},
  CASE WHEN (doc_id + cp) % 211 = 5 THEN 'klingon' ELSE lang END AS lang,
  CASE WHEN (doc_id + cp) % 333 = 7 THEN NULL ELSE text END AS content
FROM {docs}
CROSS JOIN {copies}
"""

_DUP_SUFFIX = " WHERE (doc_id + cp) % 250 = 11"


def code_files_sql(dialect: str = "spark", scale: int = 1,
                   docs: str = "documents") -> str:
    """The full code_files derivation as one SQL string for ``dialect``."""
    if dialect == "spark":
        q = "`"
        copies = f"(SELECT explode(sequence(0, {scale - 1})) AS cp)"
    elif dialect == "duckdb":
        q = '"'
        copies = f"(SELECT unnest(range({scale})) AS cp)"
    else:
        raise ValueError(dialect)
    base = _TEMPLATE.format(q=q, docs=docs, copies=copies)
    return f"{base} UNION ALL {base} {_DUP_SUFFIX}"


CODE_FILES_SQL = code_files_sql("duckdb")  # oracle-side default


def code_files(spark: SparkSession, sf_dir: str, scale: int = 1) -> DataFrame:
    """Build the code_files DataFrame from ``{sf_dir}/documents.parquet``."""
    spark.read.parquet(f"{sf_dir}/documents.parquet") \
        .createOrReplaceTempView("documents")
    return spark.sql(code_files_sql("spark", scale))


def register_code_files(spark: SparkSession, sf_dir: str, scale: int = 1,
                        view: str = "code_files") -> DataFrame:
    df = code_files(spark, sf_dir, scale)
    df.createOrReplaceTempView(view)
    return df


# The flagship Peri schema over code_files (FIXTURES.md §F1).
FLAGSHIP_SCHEMA = {
    "repo": ("required", ("string", ("regex", r"^[\w.-]+/[\w.-]+$"))),
    "path": ("required", ("string", [("min", 1), ("max", 4096)])),
    "commit": ("required", ("string", ("regex", r"^[0-9a-f]{40}$"))),
    "lang": ("enum", LANG_ENUM),
    "content": ("required", "string"),
}
