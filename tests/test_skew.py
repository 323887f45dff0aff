"""Skew handling: salted joins produce identical results to plain joins;
salted repartition spreads hot keys across partitions."""

from pyspark.sql import functions as F

from peri_spark.generator import code_files
from peri_spark.skew import salted_repartition, salted_shuffle_join

SF = "/root/testdata/sf0.001"


def test_code_files_is_skewed_by_construction(spark):
    df = code_files(spark, SF)
    top = (df.groupBy("repo").count().orderBy(F.desc("count")).limit(2)
           .agg(F.sum("count")).collect()[0][0])
    total = df.count()
    assert top / total > 0.3  # two monorepos hold a big share (FIXTURES F1)


def test_salted_shuffle_join_matches_plain_join(spark):
    df = code_files(spark, SF)
    dim = (df.groupBy("repo").count()
           .select("repo", (F.col("count") * 0).alias("zero")))
    plain = df.join(dim, "repo").groupBy("repo").count()
    salted = salted_shuffle_join(df, dim, "repo", buckets=8) \
        .groupBy("repo").count()
    a = sorted((r.repo, r["count"]) for r in plain.collect())
    b = sorted((r.repo, r["count"]) for r in salted.collect())
    assert a == b


def test_salted_repartition_spreads_hot_key(spark):
    df = code_files(spark, SF)
    hot = df.where(F.col("repo").startswith("bigorg/"))
    # plain repartition by repo: each hot repo lands in ONE partition
    plain_parts = (hot.repartition(16, "repo")
                   .select(F.spark_partition_id().alias("p"), "repo")
                   .groupBy("repo").agg(F.count_distinct("p").alias("np"))
                   .collect())
    assert all(r.np == 1 for r in plain_parts)
    salted_parts = (salted_repartition(hot, ["repo"], buckets=16,
                                       num_partitions=64)
                    .select(F.spark_partition_id().alias("p"), "repo")
                    .groupBy("repo").agg(F.count_distinct("p").alias("np"))
                    .collect())
    assert all(r.np >= 6 for r in salted_parts)  # spread over many partitions


def test_salted_repartition_deterministic(spark):
    df = code_files(spark, SF)
    a = salted_repartition(df, ["repo"], 8).select("__salt", "path").collect()
    b = salted_repartition(df, ["repo"], 8).select("__salt", "path").collect()
    assert sorted(map(str, a)) == sorted(map(str, b))
