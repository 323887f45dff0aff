"""Input-table resolution: Iceberg catalog tables, catalog tables, paths.

The north-rule deployment target is an Iceberg table of source-code
repositories. Iceberg reaches Spark through the DataSourceV2 catalog API,
so *reading* one is just ``spark.read.table("catalog.db.files")`` — the
engine needs no Iceberg-specific scan code: partition pruning, column
pruning, and predicate pushdown all flow through the same DSv2 scan
contract this module's plans already rely on. What this module adds:

- one resolver (``load_table``) so jobs accept an Iceberg/catalog table
  identifier or a parquet path interchangeably;
- snapshot pinning (``snapshot_id`` / ``as_of``) for reproducible
  validation runs — the run ledger records the snapshot so a --resume
  continues against the SAME table state even if the table moved on;
- ``current_snapshot_id`` read from the table's ``.snapshots`` metadata
  table when the catalog exposes one (Iceberg does; plain catalogs
  don't → None).

The sandbox container has no Iceberg runtime jar, so tests exercise the
identifier path through the built-in ``spark_catalog`` (same DSv2 resolve
path) and the pinning/metadata branches are gated on capability, not on
import guesses.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = ["load_table", "current_snapshot_id", "is_table_identifier",
           "write_clustered", "with_zorder"]

# dotted word-char parts: `db.table`, `catalog.db.table`, `t`. Anything
# else (spaces, quotes, parens, semicolons) is NOT an identifier — it
# neither resolves as a catalog table nor reaches interpolated SQL.
_IDENT_RE = re.compile(r"^\w+(\.\w+)*$")

# a slash-free DOTTED ref whose last part is a known data-file extension
# is a relative file path, not a `db.table` identifier (`--input
# documents.parquet` must read the file, as it did pre-round-2). A
# dotless ref is always an identifier — a table legitimately named
# `csv` or `json` must not be rerouted to the filesystem, and the
# classification must never depend on what happens to exist in the
# driver's cwd (no os.path probing).
_FILE_EXTS = {"parquet", "csv", "json", "orc", "avro", "txt", "tsv"}


def is_table_identifier(ref: str) -> bool:
    """A table identifier (``db.table``, ``catalog.db.table``) rather than
    a filesystem path: dotted word-char parts only — no slashes, no URI
    scheme, and no data-file extension as the final dotted part."""
    if not _IDENT_RE.match(ref):
        return False
    parts = ref.rsplit(".", 1)
    return not (len(parts) == 2 and parts[1].lower() in _FILE_EXTS)


def _quoted(ref: str) -> str:
    """Backtick-quote each dotted part, so an identifier-shaped ref keeps
    identifier semantics when interpolated into pinned-snapshot SQL."""
    return ".".join(f"`{part}`" for part in ref.split("."))


def load_table(spark: SparkSession, ref: str,
               snapshot_id: int | None = None,
               as_of: str | None = None) -> DataFrame:
    """Resolve ``ref`` to a DataFrame.

    - ``catalog.db.table`` identifiers load via the session catalog
      (Iceberg tables included — their catalog implements the same DSv2
      ``loadTable``); ``snapshot_id``/``as_of`` pin the Iceberg snapshot
      (``VERSION AS OF`` / ``TIMESTAMP AS OF``) so a resumed run
      revalidates the exact table state the ledger recorded.
    - anything else is a filesystem path: the reader dispatches on the
      file extension (parquet default; csv/tsv/json/orc/avro/txt get
      their matching reader — a ``.csv`` ref must not be handed to the
      parquet reader, ADVICE r03 #1). Extensionless paths (directories,
      the Iceberg-warehouse substitution) read as parquet.
    """
    if is_table_identifier(ref):
        if snapshot_id is not None:
            return spark.sql(
                f"SELECT * FROM {_quoted(ref)} "
                f"VERSION AS OF {int(snapshot_id)}")
        if as_of is not None:
            # string literal — timestamps come from the ledger, not users,
            # but quote defensively anyway
            ts = as_of.replace("'", "''")
            return spark.sql(
                f"SELECT * FROM {_quoted(ref)} TIMESTAMP AS OF '{ts}'")
        return spark.read.table(ref)
    if snapshot_id is not None or as_of is not None:
        raise ValueError(
            "snapshot pinning requires a catalog table identifier; "
            f"got path {ref!r}")
    base = ref.rstrip("/").rsplit("/", 1)[-1]
    ext = base.rsplit(".", 1)[-1].lower() if "." in base else ""
    if ext == "csv":
        return spark.read.option("header", "true").csv(ref)
    if ext == "tsv":
        return (spark.read.option("header", "true")
                .option("sep", "\t").csv(ref))
    if ext == "json":
        return spark.read.json(ref)
    if ext == "orc":
        return spark.read.orc(ref)
    if ext == "avro":
        return spark.read.format("avro").load(ref)
    if ext == "txt":
        return spark.read.text(ref)
    return spark.read.parquet(ref)


def write_clustered(df: DataFrame, path: str, cluster_by: list[str] | str,
                    sort_by: list[str] | str | None = None,
                    num_files: int | None = None,
                    mode: str = "error") -> None:
    """Write ``df`` as range-clustered, sorted parquet.

    ``repartitionByRange(cluster_by)`` gives every output file a
    CONTIGUOUS, (nearly) disjoint slice of the cluster-key space and
    ``sortWithinPartitions`` orders rows inside each file — so parquet
    row-group min/max statistics prune point/range scans on those keys
    to a handful of files, and a downstream sort-merge join on the
    cluster key skips its sort. This is the layout step a validation
    pipeline runs once so every nightly query after it reads less.

    Scale notes: repartitionByRange samples the key distribution
    (reservoir per partition) to build balanced range bounds, so a
    skewed key still yields even file sizes — the shuffle is the price
    of the layout and is paid once. ``num_files`` defaults to the
    session's shuffle parallelism. Rows with NULL cluster keys sort
    first into the lowest range (Spark NULLS FIRST), keeping them
    co-located rather than scattered.
    """
    cb = [cluster_by] if isinstance(cluster_by, str) else list(cluster_by)
    if not cb:
        raise ValueError("cluster_by must be non-empty")
    sb = ([sort_by] if isinstance(sort_by, str) else list(sort_by or [])) \
        or cb
    out = (df.repartitionByRange(num_files, *cb) if num_files
           else df.repartitionByRange(*cb))
    out.sortWithinPartitions(*sb).write.mode(mode).parquet(path)


def with_zorder(df: DataFrame, cols: list[str], bits: int = 12,
                out_col: str = "__z",
                bounds: dict[str, tuple[float, float]] | None = None
                ) -> DataFrame:
    """Append a Z-order (Morton) key interleaving ``bits`` bits of each
    numeric column in ``cols`` — the multi-dimensional companion to
    :func:`write_clustered`: range-clustering on ONE key gives perfect
    pruning on that key and none on others; clustering on the Z key
    gives good pruning on EVERY participating column at once (each
    file's rows are close in all dimensions), which is what a table
    queried by both `repo` activity and `n_chars` ranges needs.

    Each value is min-max normalized to ``[0, 2^bits)`` (bounds from
    one tiny agg unless supplied — supply them for stability across
    incremental writes, else tomorrow's new max reshuffles today's
    keys), then bit b of column i lands at position ``b*len(cols)+i``.
    Everything is integer/double Column arithmetic inside whole-stage
    codegen: no UDF, no shuffle; the shuffle happens (once) in the
    write_clustered call that consumes the key. NULLs map to slot 0,
    co-locating them with the lowest range.

    ``bits * len(cols)`` must fit a signed long (≤ 62).
    """
    if not cols or len(cols) < 1:
        raise ValueError("cols must be non-empty")
    if bits * len(cols) > 62:
        raise ValueError(f"bits*len(cols) = {bits * len(cols)} exceeds 62")
    if bounds is None:
        row = df.agg(*[f for c in cols for f in
                       (F.min(F.col(c).cast("double")).alias(f"{c}__lo"),
                        F.max(F.col(c).cast("double")).alias(f"{c}__hi"))]
                     ).collect()[0]
        bounds = {c: (row[f"{c}__lo"], row[f"{c}__hi"]) for c in cols}
    top = (1 << bits) - 1
    n = len(cols)
    z = F.lit(0).cast("long")
    for i, c in enumerate(cols):
        lo, hi = bounds[c]
        if lo is None or hi is None or hi <= lo:
            q = F.lit(0).cast("long")  # constant/NULL column: no bits
        else:
            scaled = ((F.col(c).cast("double") - F.lit(float(lo)))
                      * F.lit(top / (float(hi) - float(lo))))
            # floor, not cast: CAST(double AS BIGINT) truncates in Spark
            # but rounds in DuckDB — floor() agrees everywhere
            q = F.coalesce(
                F.least(F.greatest(F.floor(scaled), F.lit(0)),
                        F.lit(top)),
                F.lit(0)).cast("long")
        for b in range(bits):
            bit = F.shiftright(q, b).bitwiseAND(F.lit(1))
            z = z.bitwiseOR(F.shiftleft(bit, b * n + i))
    return df.withColumn(out_col, z)


def current_snapshot_id(spark: SparkSession, ref: str) -> int | None:
    """The table's current Iceberg snapshot id, or None when the source
    has no snapshot metadata (plain catalog tables, parquet paths).

    Recorded into the run ledger at job start so ``--resume`` can pin
    ``VERSION AS OF`` and per-partition verdicts stay consistent across
    an interrupted run even if the table receives commits in between.
    """
    if not is_table_identifier(ref):
        return None
    try:
        row = (spark.read.table(f"{ref}.snapshots")
               .orderBy("committed_at", ascending=False)
               .select("snapshot_id").limit(1).collect())
        return int(row[0]["snapshot_id"]) if row else None
    except Exception:
        return None  # not an Iceberg table — no snapshot concept
