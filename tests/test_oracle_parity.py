"""Replicates the driver's correctness gate: every ``queries()`` entry
with an ``oracle_sql()`` twin must match DuckDB on row count, column
names, and (order-insensitively) values at sf0.01.

Every entry has a value oracle (oracle_sql() covers queries() 1:1
since round 4); any future rows-only entry would fall back to an
executability + non-degenerate output + determinism check.
"""

import math
import os

import duckdb
import pytest

import __spark_entry__ as entry_mod

SF_DIR = os.environ.get("SPARK_GRAFT_PARITY_SF", "/root/testdata/sf0.01")

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    for t in TABLES:
        p = f"{SF_DIR}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    return con


def canon(v):
    import decimal

    if v is None:
        return "NULL"
    if isinstance(v, decimal.Decimal):
        v = float(v)
    if isinstance(v, bool):
        return str(int(v))
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # normalize -0.0 / int-valued floats; queries pre-round, so 1e-9
        # quantization only collapses representation noise
        q = round(v, 9)
        if q == int(q):
            return str(int(q))
        return repr(q)
    if isinstance(v, int):
        return str(v)
    return str(v)


def spark_rows(spark, name):
    df = entry_mod.queries()[name](spark, SF_DIR)
    cols = sorted(df.columns)
    rows = [tuple(canon(r[c]) for c in cols) for r in df.collect()]
    return cols, sorted(rows)


def duck_rows(ddb, name):
    sql = entry_mod.oracle_sql()[name]
    cur = ddb.execute(sql)
    colnames = [d[0] for d in cur.description]
    data = cur.fetchall()
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    cols = [colnames[i] for i in order]
    rows = [tuple(canon(row[i]) for i in order) for row in data]
    return cols, sorted(rows)


ORACLE_QUERIES = sorted(entry_mod.oracle_sql().keys())
ROWS_ONLY = sorted(set(entry_mod.queries()) - set(entry_mod.oracle_sql()))


def test_every_query_key_is_known():
    assert set(entry_mod.oracle_sql()) <= set(entry_mod.queries())


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_parity(spark, ddb, name):
    s_cols, s_rows = spark_rows(spark, name)
    d_cols, d_rows = duck_rows(ddb, name)
    assert s_cols == d_cols, f"{name}: column mismatch {s_cols} vs {d_cols}"
    assert len(s_rows) == len(d_rows), (
        f"{name}: row count {len(s_rows)} vs {len(d_rows)}"
    )
    mism = [(a, b) for a, b in zip(s_rows, d_rows) if a != b][:5]
    assert not mism, f"{name}: first value mismatches: {mism}"


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_queries_run_and_are_deterministic(spark, name):
    fn = entry_mod.queries()[name]
    df1 = fn(spark, SF_DIR)
    rows1 = sorted(tuple(map(str, r)) for r in df1.collect())
    rows2 = sorted(tuple(map(str, r)) for r in fn(spark, SF_DIR).collect())
    assert rows1 == rows2
    assert len(rows1) > 0


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    assert df.count() > 0
    assert set(df.columns) == {"doc_id", "text"}
