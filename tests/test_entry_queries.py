"""Driver-contract parity: every queries() entry vs its oracle_sql() twin,
side-by-side Spark vs DuckDB on sf0.001 (mimics the driver's
CORRECTNESS check: row count + column names + order-insensitive values)."""

import math

import duckdb
import pytest

import __spark_entry__ as entry_mod

SF = "/root/testdata/sf0.001"
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    return con


def _norm_cell(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return round(v, 4)
    if hasattr(v, "isoformat"):
        return v.isoformat()[:19]
    if isinstance(v, bool):
        return bool(v)
    return v


def _rowset(cols, rows):
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(
        tuple(_norm_cell(r[i]) for i in idx) for r in rows
    ), [cols[i] for i in idx]


QUERIES = entry_mod.queries()
ORACLES = entry_mod.oracle_sql()


def test_every_oracle_has_a_query():
    assert set(ORACLES) <= set(QUERIES)


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_query_matches_oracle(name, spark, duck):
    q = QUERIES[name]
    sdf = q(spark, SF)
    scols = sdf.columns
    srows = [tuple(r) for r in sdf.collect()]
    res = duck.execute(ORACLES[name])
    dcols = [d[0] for d in res.description]
    drows = res.fetchall()
    sset, scols_sorted = _rowset(scols, srows)
    dset, dcols_sorted = _rowset(dcols, drows)
    assert scols_sorted == dcols_sorted, f"{name}: column names differ"
    assert len(sset) == len(dset), f"{name}: row count {len(sset)} vs {len(dset)}"
    mism = [i for i, (a, b) in enumerate(zip(sset, dset)) if a != b]
    assert not mism, (
        f"{name}: {len(mism)} row mismatches; first: spark={sset[mism[0]]} "
        f"duck={dset[mism[0]]}"
    )


@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLES)))
def test_rows_only_queries_run(name, spark):
    df = QUERIES[name](spark, SF)
    assert df.count() >= 0
    assert df.columns


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert "avg_quality" in df.columns
