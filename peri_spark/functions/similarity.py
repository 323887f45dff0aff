"""Similarity search over embedding columns (array<float>).

- ``cosine_topk_for_query``: brute-force top-k for one query vector —
  the exact baseline. One scan, dot products via ``zip_with``/``aggregate``
  (JVM), top-k via ``orderBy.limit`` (Spark's TakeOrderedAndProject — a
  per-partition heap + driver merge, no full sort).
- ``brute_force_topk``: k-NN for every row of a (small, broadcast) query
  set against the corpus — one broadcast nested-loop + per-query window
  top-k. Exact; O(n·q).
- ``hyperplane_lsh_topk``: the scale path — random-hyperplane sign-bit
  buckets (map-side), candidates from bucket collisions only, exact cosine
  re-rank. Recall tunable by ``planes`` (fewer planes → bigger buckets).
  An IVF variant would k-means the corpus; hyperplane LSH needs no
  training pass, which suits an append-only 100 TB corpus better.
"""

from __future__ import annotations

import numpy as np

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["normalize_embeddings", "cosine_topk_for_query",
           "brute_force_topk", "hyperplane_lsh_topk"]


def _dot(a: Column, b: Column) -> Column:
    # cast per-element to double BEFORE multiply: float*float loses bits
    # and wouldn't reproduce against a double-arithmetic oracle
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0), lambda acc, v: acc + v)


def _norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(
        a, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double")))


def _cosine(a: Column, b: Column) -> Column:
    return _dot(a, b) / (_norm(a) * _norm(b))


def normalize_embeddings(df: DataFrame, vec_col: str) -> DataFrame:
    """L2-normalize once up front so cosine becomes a plain dot product
    (saves two norms per comparison in every downstream join)."""
    v = F.col(vec_col)
    return df.withColumn(
        vec_col, F.transform(v, lambda x: x / _norm(v)))


def cosine_topk_for_query(df: DataFrame, vec_col: str, id_col: str,
                          query: list[float], k: int = 10) -> DataFrame:
    """Exact top-k rows by cosine similarity to a literal query vector."""
    q = F.lit([float(x) for x in query])
    sim = _cosine(F.col(vec_col), q)
    return (df.select(F.col(id_col).alias("id"),
                      F.round(sim, 6).alias("cosine"))
            .orderBy(F.desc("cosine"), F.asc("id"))
            .limit(k))


def brute_force_topk(corpus: DataFrame, queries: DataFrame,
                     vec_col: str, id_col: str, k: int = 10) -> DataFrame:
    """Exact k-NN of each query row against the corpus.

    The query side broadcasts; corpus scans once. Returns
    (query_id, id, cosine, rank).
    """
    q = F.broadcast(queries.select(F.col(id_col).alias("query_id"),
                                   F.col(vec_col).alias("__qv")))
    joined = corpus.select(F.col(id_col).alias("id"),
                           F.col(vec_col).alias("__cv")).crossJoin(q)
    sim = joined.select(
        "query_id", "id",
        F.round(_cosine(F.col("__cv"), F.col("__qv")), 6).alias("cosine"))
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("id"))
    return (sim.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k))


def _planes(dim: int, n_planes: int, seed: int) -> list[list[float]]:
    rng = np.random.RandomState(seed)
    return rng.standard_normal((n_planes, dim)).round(6).tolist()


def _bucket_col(vec: Column, n_planes: int, seed: int, dim: int = 64) -> Column:
    """Sign-bit bucket id from ``n_planes`` random hyperplanes (JVM only)."""
    planes = _planes(dim, n_planes, seed)
    bits = [F.when(_dot(vec, F.lit(p)) >= 0, F.lit(1 << i)).otherwise(F.lit(0))
            for i, p in enumerate(planes)]
    out = bits[0]
    for b in bits[1:]:
        out = out + b
    return out.cast("long")


def hyperplane_lsh_topk(corpus: DataFrame, queries: DataFrame,
                        vec_col: str, id_col: str, k: int = 10,
                        planes: int = 8, seed: int = 42,
                        dim: int = 64, multiprobe: int = 0) -> DataFrame:
    """Approximate k-NN: hyperplane buckets → exact cosine inside buckets.

    ``multiprobe=m`` also probes the m single-bit-flip neighbor buckets of
    each query (recall boost without more planes). Returns
    (query_id, id, cosine, rank) — rank within retrieved candidates.
    """
    c = corpus.select(F.col(id_col).alias("id"), F.col(vec_col).alias("__cv"),
                      _bucket_col(F.col(vec_col), planes, seed, dim)
                      .alias("bucket"))
    qb = queries.select(F.col(id_col).alias("query_id"),
                        F.col(vec_col).alias("__qv"),
                        _bucket_col(F.col(vec_col), planes, seed, dim)
                        .alias("bucket"))
    if multiprobe > 0:
        probes = F.array(
            F.col("bucket"),
            *[F.col("bucket").bitwiseXOR(F.lit(1 << i))
              for i in range(min(multiprobe, planes))])
        qb = qb.select("query_id", "__qv",
                       F.explode(probes).alias("bucket"))
    q = F.broadcast(qb)
    cand = c.join(q, "bucket").select(
        "query_id", "id",
        F.round(_cosine(F.col("__cv"), F.col("__qv")), 6).alias("cosine"))
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("id"))
    return (cand.dropDuplicates(["query_id", "id"])
            .withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k))
