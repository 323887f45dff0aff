"""Similarity search over embedding columns (array<float>).

- ``cosine_topk_for_query``: brute-force top-k for one query vector —
  the exact baseline. One scan, dot products via ``zip_with``/``aggregate``
  (JVM), top-k via ``orderBy.limit`` (Spark's TakeOrderedAndProject — a
  per-partition heap + driver merge, no full sort).
- ``brute_force_topk``: k-NN for every row of a (small) query set
  against the corpus — one Arrow-batched corpus pass scoring every
  query per batch + per-query window top-k. Exact; O(n·q).
- ``hyperplane_lsh_topk``: a scale path — random-hyperplane sign-bit
  buckets (map-side), candidates from bucket collisions only, exact cosine
  re-rank. Recall tunable by ``planes`` (fewer planes → bigger buckets).
  Training-free, which suits an append-only 100 TB corpus.
- ``ivf_topk`` (+``train_ivf_centroids``): the other scale path — an
  IVF index: k-means cells trained on a bounded driver-side sample,
  map-side cell assignment, per-query ``nprobe`` nearest cells probed,
  exact cosine re-rank. Cells adapt to the data distribution (better
  recall on clustered corpora); the training pass must be re-run as the
  corpus drifts, so prefer LSH when the corpus is append-heavy and
  IVF when it is read-heavy and clustered.

Execution note (round-6 optimization; guide §4.2): the per-pair dot
products, hyperplane sign bits, and centroid assignments previously ran
as JVM higher-order functions (``zip_with`` + ``aggregate``). Spark HOF
lambdas are CodegenFallback — every element evaluates interpreted with
boxing, and every pair allocates an intermediate array — which made the
O(n·q) / O(Σ|cell|²) kernels allocation-bound (semantic_dedup measured
134 rows/s). They now run as Arrow-batched numpy kernels that reproduce
the JVM arithmetic BIT-FOR-BIT: the JVM fold is a sequential
left-to-right double sum seeded with 0.0, which numpy's
``np.add.accumulate`` over a zero-prepended product row replicates
exactly (same IEEE operations in the same order — verified against the
HOF path and the DuckDB oracle, whose ``list_sum`` folds the same way).
Corpus-side annotations (cell / bucket) additionally bypass pandas and
read the Arrow ListArray's flat buffers directly
(:func:`_vec_annotate_arrow`); the per-pair re-rank stays a pandas UDF
because it lives inside join projections. The JVM HOF helpers are
retained below both as the documentation of the semantics and for
composition sites that stay plan-only (``cosine_topk_for_query``,
``_ivf_probes`` on the tiny query side).
"""

from __future__ import annotations

import numpy as np

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["normalize_embeddings", "cosine_topk_for_query",
           "brute_force_topk", "hyperplane_lsh_topk",
           "deterministic_kmeans", "train_ivf_centroids", "ivf_topk",
           "semantic_dedup"]


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


def _sim(a: Column, b: Column, assume_normalized: bool) -> Column:
    """Cosine similarity; on pre-normalized vectors (see
    ``normalize_embeddings``) it is the plain dot product — two fewer
    O(d) aggregate HOFs per candidate pair in the re-rank joins."""
    return _dot(a, b) if assume_normalized else _cosine(a, b)


# ---------------------------------------------------------------------------
# Arrow-batched exact twins of the JVM HOF kernels.
#
# Bit-parity contract (every function below): the JVM fold
#   aggregate(zip_with(a, b, (x, y) -> double(x) * double(y)), 0.0, +)
# evaluates ((0.0 + p0) + p1) + ... in element order, all float64.
# numpy replica: prepend a literal 0.0 column to the product matrix and
# np.add.accumulate along the row — identical IEEE adds in identical
# order (the leading 0.0 also pins the JVM's `0.0 + (-0.0) == +0.0`
# signed-zero behavior). Length-mismatched pairs (zip_with pads with
# NULL → NULL product → NULL sum) and NULL vectors map to None.
#
# The closures below deliberately capture only plain values (floats,
# lists, ndarrays) and import numpy/pandas inside the function body, so
# cloudpickle ships them fully by value — Python workers never need
# peri_spark importable (same pattern as minhash_signatures).
# ---------------------------------------------------------------------------


def _seq_dot_code():
    """Source-of-truth numpy kernel, inlined into every UDF closure."""

    def _seq_rows(P):
        import numpy as np
        n, d = P.shape
        S = np.empty((n, d + 1), dtype=np.float64)
        S[:, 0] = 0.0
        S[:, 1:] = P
        return np.add.accumulate(S, axis=1)[:, -1]

    return _seq_rows


def _pair_sim(a: Column, b: Column, assume_normalized: bool) -> Column:
    """Arrow-batched exact twin of ``_sim`` for joined pair columns.

    The UDF computes only the three folds (dot, ‖a‖, ‖b‖ — or 1.0 for
    the normalized path); the division stays a JVM expression so its
    corner behavior is exactly the HOF formulation's — including that
    under Spark 4's ANSI default a zero norm raises DIVIDE_BY_ZERO in
    BOTH formulations (tested). ``x / (1.0 * 1.0) == x`` exactly, so
    the normalized path is still the plain dot."""
    from pyspark.sql.functions import pandas_udf
    _seq = _seq_dot_code()
    norm = not assume_normalized

    def _batch(a, b):
        import numpy as np
        import pandas as pd
        n = len(a)
        la = np.fromiter((-1 if v is None else len(v) for v in a.values),
                         dtype=np.int64, count=n)
        lb = np.fromiter((-1 if v is None else len(v) for v in b.values),
                         dtype=np.int64, count=n)
        dot = np.full(n, np.nan)
        na = np.ones(n)
        nb = np.ones(n)
        ok = (la >= 0) & (la == lb)
        if ok.any():
            for ln in np.unique(la[ok]):
                m = ok & (la == ln)
                cnt = int(m.sum())
                A = (np.stack(list(a.values[m])).astype(np.float64)
                     if ln else np.zeros((cnt, 0)))
                B = (np.stack(list(b.values[m])).astype(np.float64)
                     if ln else np.zeros((cnt, 0)))
                dot[m] = _seq(A * B)
                if norm:
                    na[m] = np.sqrt(_seq(A * A))
                    nb[m] = np.sqrt(_seq(B * B))
        if norm:
            na = np.where(ok, na, np.nan)
            nb = np.where(ok, nb, np.nan)
        return pd.DataFrame({"dot": dot, "na": na, "nb": nb})

    u = pandas_udf(_batch, "dot double, na double, nb double")
    s = u(a, b)
    return s["dot"] / (s["na"] * s["nb"])


def _vec_annotate_arrow(df: DataFrame, out_name: str,
                        matrix: "np.ndarray", mode: str) -> DataFrame:
    """Annotate a two-column (id, vec) frame with a per-row vector
    statistic computed straight off the Arrow ListArray's flat
    values+offsets buffers (round-6): no per-row pandas ndarray
    materialization on either boundary — the whole batch's linear
    algebra runs as a handful of numpy ops.

    ``mode="cell"``: nearest-row-of-``matrix`` id (first-min argmin
    over the exact sequential sqdist fold) — NULL for NULL vectors or
    length mismatch, like the JVM formulation.
    ``mode="bucket"``: sign-bit bucket over ``matrix`` rows as
    hyperplanes — 0 for NULL/mismatch (every JVM ``when`` is NULL).

    Fold-order note: the sums here omit the JVM's leading 0.0 seed;
    that changes only the SIGN of an all-zero sum, and both argmin and
    ``>= 0`` compare ±0.0 equal — decisions are bit-identical.
    """
    fields = df.schema.fields
    assert len(fields) == 2, [f.name for f in fields]
    id_f, vec_f = fields
    out_t = "int" if mode == "cell" else "long"
    out_ddl = (f"{id_f.name} {id_f.dataType.simpleString()}, "
               f"{vec_f.name} {vec_f.dataType.simpleString()}, "
               f"{out_name} {out_t}")
    M = np.ascontiguousarray(matrix, dtype=np.float64)
    kdim = M.shape[1]
    weights = (1 << np.arange(M.shape[0], dtype=np.int64))

    def gen(batches):
        import numpy as np
        import pyarrow as pa
        import pyarrow.compute as pc
        for rb in batches:
            n = rb.num_rows
            if n == 0:
                continue
            col = rb.column(1)
            lens = np.asarray(
                col.value_lengths().fill_null(-1), dtype=np.int64)
            valid = lens == kdim
            m = int(valid.sum())
            if m:
                sub = col.filter(pa.array(valid))
                flat = pc.list_flatten(sub).to_numpy(
                    zero_copy_only=False).astype(np.float64, copy=False)
                V = flat.reshape(m, kdim)
            if mode == "cell":
                out = np.full(n, None, dtype=object)
                if m:
                    D = np.empty((m, len(M)), dtype=np.float64)
                    for k in range(len(M)):
                        diff = V - M[k][None, :]
                        D[:, k] = np.add.accumulate(
                            diff * diff, axis=1)[:, -1] if kdim \
                            else 0.0
                    cells = np.argmin(D, axis=1)
                    out[np.nonzero(valid)[0]] = cells
                arr = pa.array(out.tolist(), type=pa.int32())
            else:
                out = np.zeros(n, dtype=np.int64)
                if m:
                    bits = np.empty((m, len(M)), dtype=bool)
                    for k in range(len(M)):
                        bits[:, k] = (np.add.accumulate(
                            V * M[k][None, :], axis=1)[:, -1]
                            if kdim else 0.0) >= 0.0
                    out[np.nonzero(valid)[0]] = bits @ weights
                arr = pa.array(out, type=pa.int64())
            yield pa.RecordBatch.from_arrays(
                [rb.column(0), rb.column(1), arr],
                [id_f.name, vec_f.name, out_name])

    return df.mapInArrow(gen, out_ddl)


def normalize_embeddings(df: DataFrame, vec_col: str) -> DataFrame:
    """L2-normalize once up front so cosine becomes a plain dot product
    (saves two norms per comparison in every downstream join — pass
    ``assume_normalized=True`` to the top-k functions to claim it).

    Arrow-batched numpy with the exact-order norm fold (see module
    docstring); each element divides by the same double the JVM
    ``transform`` would use, so outputs are bit-identical to the HOF
    formulation (and to the DuckDB oracle)."""
    from pyspark.sql.functions import pandas_udf
    _seq = _seq_dot_code()

    def _batch(v):
        import numpy as np
        import pandas as pd
        lens = v.map(lambda x: -1 if x is None else len(x))
        out = np.full(len(v), None, dtype=object)
        vals = lens.values >= 0
        if vals.any():
            for ln in np.unique(lens.values[vals]):
                m = (lens.values == ln)
                V = (np.stack(v.values[m]).astype(np.float64)
                     if ln else np.zeros((int(m.sum()), 0)))
                nrm = np.sqrt(_seq(V * V))
                with np.errstate(divide="ignore", invalid="ignore"):
                    N = V / nrm[:, None]
                for j, row in zip(np.nonzero(m)[0], N):
                    out[j] = row
        return pd.Series(out)

    f = pandas_udf(_batch, "array<double>")
    return df.withColumn(vec_col, f(F.col(vec_col)))


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
                     vec_col: str, id_col: str, k: int = 10,
                     assume_normalized: bool = False) -> DataFrame:
    """Exact k-NN of each query row against the corpus.

    The query set collects to the driver (it was broadcast whole in the
    join formulation anyway) and every corpus batch scores ALL queries
    in one Arrow pass — numpy does the q·n·d multiply-adds in C instead
    of one interpreted HOF fold per pair. Returns
    (query_id, id, cosine, rank). ``assume_normalized=True`` (vectors
    already L2-normalized, e.g. via ``normalize_embeddings``) ranks by
    the dot product alone — same ordering, two fewer norm aggregates
    per pair. Cosines are bit-identical to the join formulation (exact
    sequential fold; rounding stays in the JVM).
    """
    _seq = _seq_dot_code()
    qrows = queries.select(F.col(id_col).alias("query_id"),
                           F.col(vec_col).alias("__qv")).collect()
    qids = [r["query_id"] for r in qrows]
    qvecs = [None if r["__qv"] is None
             else np.asarray(r["__qv"], dtype=np.float64) for r in qrows]
    norm = not assume_normalized
    qnorms = [np.nan if qv is None
              else float(np.sqrt(_seq((qv * qv)[None, :])[0]))
              for qv in qvecs]

    id_ddl = corpus.schema[id_col].dataType.simpleString()
    q_ddl = queries.schema[id_col].dataType.simpleString()
    # the division (and its NaN/Inf corner semantics) stays in the JVM;
    # the Arrow boundary only carries the three fold results per pair
    out_schema = f"query_id {q_ddl}, id {id_ddl}, dot double, " \
                 "na double, nq double"

    def gen(batches):
        import numpy as np
        import pandas as pd
        for pdf in batches:
            vs = pdf["__cv"]
            n = len(pdf)
            lens = np.fromiter(
                (-1 if v is None else len(v) for v in vs.values),
                dtype=np.int64, count=n)
            norms = {}
            parts = []
            for qid, qv, qn in zip(qids, qvecs, qnorms):
                dot = np.full(n, np.nan)
                na = np.ones(n)
                if qv is not None:
                    m = lens == len(qv)
                    if m.any():
                        V = (np.stack(list(vs.values[m]))
                             .astype(np.float64)
                             if len(qv) else np.zeros((int(m.sum()), 0)))
                        dot[m] = _seq(V * qv[None, :])
                        if norm:
                            if len(qv) not in norms:
                                norms[len(qv)] = (m, np.sqrt(_seq(V * V)))
                            na[m] = norms[len(qv)][1]
                    if norm:
                        na = np.where(m, na, np.nan)
                elif norm:
                    na = np.full(n, np.nan)
                parts.append(pd.DataFrame({
                    "query_id": [qid] * n, "id": pdf["id"],
                    "dot": dot, "na": na,
                    "nq": np.full(n, qn if norm else 1.0)}))
            if parts:
                yield pd.concat(parts, ignore_index=True)

    sim = (corpus.select(F.col(id_col).alias("id"),
                         F.col(vec_col).alias("__cv"))
           .mapInPandas(gen, out_schema)
           .select("query_id", "id",
                   F.round(F.col("dot") / (F.col("na") * F.col("nq")), 6)
                   .alias("cosine")))
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


def deterministic_kmeans(vecs: np.ndarray, n_centroids: int = 16,
                         iters: int = 5, seed: int = 42) -> list[list[float]]:
    """Plain Lloyd iterations, fully deterministic (seeded init, fixed
    iteration count, first-min argmin tiebreak) — the same centroids
    reproduce in any engine, which is what lets the DuckDB oracle check
    ``ivf_topk`` end-to-end. Centroids round to 6dp so they embed as
    exact literals on both sides."""
    vecs = np.asarray(vecs, dtype=np.float64)
    rng = np.random.RandomState(seed)
    idx = rng.choice(len(vecs), size=min(n_centroids, len(vecs)),
                     replace=False)
    cent = vecs[idx].copy()
    for _ in range(iters):
        d = ((vecs[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
        assign = d.argmin(axis=1)
        for ci in range(len(cent)):
            members = vecs[assign == ci]
            if len(members):
                cent[ci] = members.mean(axis=0)
    return cent.round(6).tolist()


def train_ivf_centroids(df: DataFrame, vec_col: str, id_col: str,
                        n_centroids: int = 16, train_limit: int = 2048,
                        iters: int = 5, seed: int = 42) -> list[list[float]]:
    """Driver-side IVF training on a bounded deterministic sample: the
    ``train_limit`` lowest-id vectors (TakeOrderedAndProject — a heap,
    never a full sort) collect to the driver and k-means there. At
    corpus scale the training set stays O(train_limit); the expensive
    parts (assignment, probing) remain distributed in ``ivf_topk``."""
    rows = (df.select(F.col(id_col).alias("i"), F.col(vec_col).alias("v"))
            .orderBy("i").limit(train_limit).collect())
    vecs = np.array([[float(x) for x in r["v"]] for r in rows])
    return deterministic_kmeans(vecs, n_centroids, iters, seed)


def _sqdist(vec: Column, c: list[float]) -> Column:
    # sequential left-fold of (x-y)² in element order: bit-identical to
    # DuckDB's list_sum over the same doubles, so argmin assignment
    # cannot diverge between engine and oracle
    return F.aggregate(
        F.zip_with(vec, F.lit([float(x) for x in c]),
                   lambda x, y: (x.cast("double") - y) *
                                (x.cast("double") - y)),
        F.lit(0.0), lambda acc, v: acc + v)


def _ivf_assign(vec: Column, centroids: list[list[float]]) -> Column:
    """Nearest-centroid id (0-based), first-min tiebreak — JVM only."""
    d = F.array(*[_sqdist(vec, c) for c in centroids])
    return (F.array_position(d, F.array_min(d)) - 1).cast("int")


def _ivf_probes(vec: Column, centroids: list[list[float]],
                nprobe: int) -> Column:
    """The ``nprobe`` nearest centroid ids, by (distance, cid)."""
    s = F.array(*[F.struct(_sqdist(vec, c).alias("d"),
                           F.lit(i).alias("c"))
                  for i, c in enumerate(centroids)])
    return F.transform(F.slice(F.array_sort(s), 1, nprobe),
                       lambda x: x["c"])


def ivf_topk(corpus: DataFrame, queries: DataFrame, vec_col: str,
             id_col: str, centroids: list[list[float]], k: int = 10,
             nprobe: int = 3, assume_normalized: bool = False) -> DataFrame:
    """Approximate k-NN via an IVF (inverted-file) index: corpus vectors
    partition into nearest-centroid cells, each query probes its
    ``nprobe`` nearest cells, exact cosine re-ranks the candidates.

    The scale shape mirrors ``hyperplane_lsh_topk``: cell assignment is
    one map-side Arrow-batched pass over the corpus (no shuffle), the
    query side — exploded to (query, cell) probes — broadcasts, and the
    candidate join carries only probed cells' rows into the re-rank.
    Assignment and re-rank cosines are bit-identical to the JVM HOF
    formulation (exact sequential folds — see module docstring), so the
    DuckDB oracle is unchanged. Unlike hyperplane buckets, cells adapt
    to the data distribution (training via ``train_ivf_centroids``),
    trading a bounded driver-side training pass for better recall on
    clustered corpora; see the module docstring for when the
    training-free LSH variant is preferable.
    Returns (query_id, id, cosine, rank).
    """
    c = _vec_annotate_arrow(
        corpus.select(F.col(id_col).alias("id"),
                      F.col(vec_col).alias("__cv")),
        "cell", np.asarray(centroids, dtype=np.float64), "cell")
    qb = queries.select(F.col(id_col).alias("query_id"),
                        F.col(vec_col).alias("__qv"),
                        F.explode(_ivf_probes(F.col(vec_col), centroids,
                                              nprobe)).alias("cell"))
    cand = c.join(F.broadcast(qb), "cell").select(
        "query_id", "id",
        F.round(_pair_sim(F.col("__cv"), F.col("__qv"),
                          assume_normalized), 6).alias("cosine"))
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("id"))
    return (cand.dropDuplicates(["query_id", "id"])
            .withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k))


def _java_order_key(ids, sample):
    """Sort key matching the JVM's ``<`` on the id column: numerics
    compare numerically; strings compare by UTF-16 code units (Java
    ``String.compareTo``), which ``encode('utf-16-be')`` byte order
    reproduces exactly (including surrogate-pair ordering)."""
    if isinstance(sample, str):
        return ids.map(lambda s: s.encode("utf-16-be", "surrogatepass"))
    return ids


def semantic_dedup(df: DataFrame, vec_col: str, id_col: str,
                   centroids: list[list[float]], threshold: float = 0.95,
                   max_cell_size: int = 10_000,
                   assume_normalized: bool = False,
                   eager: bool = True) -> DataFrame:
    """SemDeDup-style embedding-cluster dedup (Abbas et al. 2023,
    arXiv:2303.09540): assign every vector to its nearest k-means cell,
    compare pairs ONLY within a cell, and drop each vector that has a
    lower-id neighbor with cosine ≥ ``threshold`` (the deterministic
    keep-min canonical rule). Returns the surviving ``(id, cell)`` rows.

    Scale shape (round-6 rewrite; guide §4.2): cell assignment is one
    map-side Arrow pass (no shuffle); the within-cell comparison is a
    ``groupBy(cell).applyInPandas`` — the corpus shuffles ONCE on the
    cell id (id + vector, no pair explosion) and each cell's Σ|cell|²
    dot products run as tiled numpy matrix ops instead of a JVM
    self-join evaluating one interpreted fold per pair (measured 134
    rows/s → the join never materializes pair rows at all now). Cells
    above ``max_cell_size`` are kept UN-deduped rather than exploding
    the quadratic cost (the cap mirrors ``embedding_duplicate_pairs``),
    enforced inside the grouped kernel. Train ``centroids`` via
    :func:`train_ivf_centroids`; more centroids → smaller cells →
    cheaper cells but more near-duplicates split across cell borders
    (the SemDeDup trade).

    Decision parity: the JVM formulation compared
    ``round(sim, 6) >= threshold`` with Spark's HALF_UP decimal round.
    The kernel computes the exact-order dot (bit-identical to the HOF
    fold), screens with a ±1e-6 band around the threshold, and only
    pairs inside the band replay Spark's exact
    ``BigDecimal(Double.toString(x)).setScale(6, HALF_UP)`` via Python
    ``decimal`` (shortest round-trip repr == Double.toString) — so the
    kept/dropped decision is identical for every possible input, and
    the DuckDB oracle is unchanged.
    """
    from pyspark.storagelevel import StorageLevel

    norm = not assume_normalized
    _seq = _seq_dot_code()
    thr = float(threshold)
    id_ddl = df.schema[id_col].dataType.simpleString()

    c = _vec_annotate_arrow(
        df.select(F.col(id_col).alias("id"), F.col(vec_col).alias("__v")),
        "cell", np.asarray(centroids, dtype=np.float64), "cell")
    if eager:
        # the assignment pass feeds both the grouped kernel and the
        # survivor anti-join; persist it once, materialize the (small)
        # survivor set, release. ``eager=False`` keeps the whole plan
        # lazy for inspection/composition at the cost of recomputing
        # the assignment on each consuming action.
        c = c.persist(StorageLevel.MEMORY_AND_DISK)

    def find_dups(pdf):
        import numpy as np
        import pandas as pd
        empty = pd.DataFrame({"id": pd.Series([], dtype=pdf["id"].dtype)})
        # NULL cells never joined in the pair formulation; over-cap
        # cells pass through un-deduped
        if pdf["cell"].isna().any() or not (2 <= len(pdf) <= max_cell_size):
            return empty
        # rows with NULL id never satisfy `a.id > b.id`; NULL vectors
        # yield NULL sim — neither can drop nor be dropped
        ok = pdf["id"].notna() & pdf["__v"].notna()
        pdf = pdf[ok]
        if len(pdf) < 2:
            return empty
        key = _java_order_key(pdf["id"], pdf["id"].iloc[0])
        order = np.argsort(key.values, kind="stable")
        keys = key.values[order]
        ids = pdf["id"].values[order]
        V = np.stack(list(pdf["__v"].values[order])).astype(np.float64)
        n, d = V.shape
        if norm:
            nrm = np.sqrt(_seq(V * V))
        # for row i (ascending id), eligible partners are strictly
        # lower ids: positions [0, lt_i) — computed on the Java-order
        # key so ties (equal ids) are excluded exactly like `a.id > b.id`
        lt = np.searchsorted(keys, keys, side="left")
        dup = np.zeros(n, dtype=bool)
        lo, hi = thr - 1.1e-6, thr + 1.1e-6  # exact-check band

        def decide(x):
            # Spark round(x, 6) >= threshold, HALF_UP — exact replay
            from decimal import ROUND_HALF_UP, Decimal
            if x != x:  # NaN
                return False
            r = float(Decimal(repr(x)).quantize(
                Decimal("0.000001"), rounding=ROUND_HALF_UP))
            return r >= thr

        # tile so each (b, n, d) product tensor stays ~16 MB; the
        # accumulate runs straight on the products (no zero-prepend:
        # the JVM's 0.0 seed only changes the SIGN of an all-zero sum,
        # and ±0.0 compare equal in every threshold decision)
        tile = max(1, int(2_000_000 // max(n * d, 1)))
        for i0 in range(1, n, tile):
            i1 = min(i0 + tile, n)
            rows = np.arange(i0, i1)[lt[i0:i1] > 0]
            if not len(rows):
                continue
            if d == 0:
                dots = np.zeros((len(rows), n))
            else:
                prod = V[rows][:, None, :] * V[None, :, :]   # (b, n, d)
                dots = np.add.accumulate(prod, axis=2)[:, :, -1]
            if norm:
                with np.errstate(divide="ignore", invalid="ignore"):
                    dots = dots / (nrm[rows][:, None] * nrm[None, :])
            for bi, i in enumerate(rows):
                cand = dots[bi, :lt[i]]
                if (cand > hi).any():
                    dup[i] = True
                    continue
                band = cand[(cand >= lo) & (cand <= hi)]
                if len(band) and any(decide(float(x)) for x in band):
                    dup[i] = True
        return pd.DataFrame({"id": pd.Series(ids[dup],
                                             dtype=pdf["id"].dtype)})

    dups = (c.groupBy("cell")
            .applyInPandas(find_dups, schema=f"id {id_ddl}"))
    out = c.join(dups, "id", "left_anti").select("id", "cell")
    if not eager:
        return out
    out = out.localCheckpoint(eager=True)
    c.unpersist()
    return out


def hyperplane_lsh_topk(corpus: DataFrame, queries: DataFrame,
                        vec_col: str, id_col: str, k: int = 10,
                        planes: int = 8, seed: int = 42,
                        dim: int = 64, multiprobe: int = 0,
                        assume_normalized: bool = False) -> DataFrame:
    """Approximate k-NN: hyperplane buckets → exact cosine inside buckets.

    ``multiprobe=m`` also probes the m single-bit-flip neighbor buckets of
    each query (recall boost without more planes). Bucket bits and
    re-rank cosines run Arrow-batched with exact-fold parity (module
    docstring). Returns (query_id, id, cosine, rank) — rank within
    retrieved candidates.
    """
    P = np.asarray(_planes(dim, planes, seed), dtype=np.float64)
    c = _vec_annotate_arrow(
        corpus.select(F.col(id_col).alias("id"),
                      F.col(vec_col).alias("__cv")), "bucket", P, "bucket")
    qb = _vec_annotate_arrow(
        queries.select(F.col(id_col).alias("query_id"),
                       F.col(vec_col).alias("__qv")), "bucket", P, "bucket")
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
        F.round(_pair_sim(F.col("__cv"), F.col("__qv"),
                          assume_normalized), 6).alias("cosine"))
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("id"))
    return (cand.dropDuplicates(["query_id", "id"])
            .withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k))
