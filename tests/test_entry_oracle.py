"""Driver-contract parity: every queries() entry must match its oracle_sql()
on sf0.01, mimicking the driver's row-count + schema + value-hash check."""

import math
import sys

import duckdb
import pytest

sys.path.insert(0, "/root/repo")
import __spark_entry__ as entrymod  # noqa: E402

SF_DIR = "/root/testdata/sf0.01"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return con


def _norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return round(v, 6)
    if isinstance(v, bool):
        return bool(v)
    return v


def _row_key(row, cols):
    return tuple(_norm(row[c]) for c in cols)


def compare(spark, duck, name, registry=None, oracles=None):
    q = (registry or entrymod.queries())[name]
    sql = (oracles or entrymod.oracle_sql())[name]
    sdf = q(spark, SF_DIR)
    spark_rows = [r.asDict() for r in sdf.collect()]
    orc = duck.execute(sql)
    cols = [d[0] for d in orc.description]
    duck_rows = [dict(zip(cols, r)) for r in orc.fetchall()]
    assert sorted(sdf.columns) == sorted(cols), \
        f"{name}: columns {sorted(sdf.columns)} != {sorted(cols)}"
    key_cols = sorted(cols)
    s = sorted(_row_key(r, key_cols) for r in spark_rows)
    d = sorted(_row_key(r, key_cols) for r in duck_rows)
    assert len(s) == len(d), f"{name}: rowcount {len(s)} != {len(d)}"
    mism = [i for i, (a, b) in enumerate(zip(s, d)) if a != b][:3]
    assert not mism, (
        f"{name}: first mismatches "
        + "; ".join(f"spark={s[i]} duck={d[i]}" for i in mism))


@pytest.mark.parametrize("name", sorted(
    set(entrymod.queries_full()) & set(entrymod.oracle_sql_full())))
def test_query_matches_oracle(spark, duck, name):
    """Per-operator parity over the FULL registry: a failure names the
    single operator, not its whole composite family."""
    compare(spark, duck, name,
            entrymod.queries_full(), entrymod.oracle_sql_full())


@pytest.mark.parametrize("name", sorted(entrymod.COMPOSITES))
def test_composite_matches_oracle(spark, duck, name):
    """The DRIVER surface: each consolidated contract row must match its
    UNION-ALL oracle exactly as the driver will check it."""
    compare(spark, duck, name)


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0


def test_all_queries_have_oracle_or_are_documented():
    missing = set(entrymod.queries_full()) - set(entrymod.oracle_sql_full())
    # non-SQL-expressible ops may omit oracles; keep the list deliberate
    assert missing == entrymod.NO_ORACLE, \
        f"undocumented oracle omissions: {missing ^ entrymod.NO_ORACLE}"
    assert (set(entrymod.queries()) - set(entrymod.oracle_sql())
            == entrymod.NO_ORACLE)


@pytest.mark.parametrize("name", sorted(
    set(entrymod.queries_full()) - set(entrymod.oracle_sql_full())))
def test_no_oracle_queries_run(spark, name):
    """Rows-only check for deliberately non-SQL-expressible queries."""
    df = entrymod.queries_full()[name](spark, SF_DIR)
    assert df.count() >= 0 and len(df.columns) > 0


def test_contract_fits_driver_window():
    """VERDICT r04 #7: the artifact-coverage regression class (r3: 2
    dropped rows, r4: 82) must not recur. The driver records ~the first
    50 queries() entries; the whole contract must fit with headroom,
    and every full-registry operator must be covered exactly once."""
    contract = entrymod.queries()
    assert len(contract) <= entrymod.DRIVER_WINDOW
    full = set(entrymod.queries_full())
    covered = list(entrymod.STANDALONE) + [
        m for ms in entrymod.COMPOSITES.values() for m in ms]
    assert len(covered) == len(set(covered)), "operator covered twice"
    assert set(covered) == full, (
        f"uncovered: {full - set(covered)}; stale: {set(covered) - full}")
    # the rows VERDICT r04 requires restored by name stay standalone
    for must in ("validate_events", "defaults_transform_orders",
                 "either_customer", "ngram_jaccard", "near_dup_clusters",
                 "embedding_dups"):
        assert must in contract


def test_bad_row_predicate_matches_violations(duck):
    """bad_row_predicate_sql is the row-level OR of violations_sql's
    per-check conditions: the bad-id sets must coincide exactly."""
    from peri_spark import oracle as po
    pred = po.bad_row_predicate_sql(entrymod.EVENTS_SCHEMA)
    viol = po.violations_sql(entrymod.EVENTS_SCHEMA, "events", ["event_id"])
    bad_ids = {r[0] for r in duck.execute(
        f"SELECT event_id FROM events WHERE {pred}").fetchall()}
    viol_ids = {r[0] for r in duck.execute(
        f"SELECT DISTINCT event_id FROM ({viol})").fetchall()}
    assert bad_ids == viol_ids and bad_ids
