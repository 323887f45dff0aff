"""Referential-integrity stage: FK → dimension anti-joins.

Small dimension → ``broadcast()`` hint (map-side hash join, no shuffle of
the 100 TB fact side). Large dimension → shuffle anti-join; AQE converts
to broadcast at runtime if the dim side turns out small, and splits skewed
partitions (spark.sql.adaptive.skewJoin).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["referential_violations"]


def referential_violations(fact: DataFrame, fk: list[str] | str,
                           dim: DataFrame, pk: list[str] | str | None = None,
                           broadcast: bool = True,
                           as_violations: bool = False,
                           id_cols: list[str] | None = None) -> DataFrame:
    """Fact rows whose FK has no match in the dimension (left_anti)."""
    fk = [fk] if isinstance(fk, str) else list(fk)
    pk = fk if pk is None else ([pk] if isinstance(pk, str) else list(pk))
    keys = dim.select(*[F.col(p).alias(f) for p, f in zip(pk, fk)]).dropDuplicates()
    if broadcast:
        keys = F.broadcast(keys)
    # null-FK rows are not referential violations (nil passes, Peri semantics)
    cond = None
    for f in fk:
        c = F.col(f).isNotNull()
        cond = c if cond is None else cond & c
    missing = fact.where(cond).join(keys, on=fk, how="left_anti")
    if not as_violations:
        return missing
    fk_txt = ", ".join(fk)
    sel = list(id_cols or [])
    return missing.select(
        *sel,
        F.array(*[F.lit(k) for k in fk]).alias("path"),
        F.lit(fk_txt).alias("key"),
        F.concat(F.lit(f"({fk_txt})=("),
                 F.concat_ws(", ", *[F.col(k).cast("string") for k in fk]),
                 F.lit(") has no match in dimension")).alias("message"),
        F.to_json(F.struct(
            *[F.col(k).cast("string").alias(k) for k in fk])).alias("content"))
