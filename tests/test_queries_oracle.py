"""Every ``queries()`` entry vs its DuckDB ``oracle_sql()`` twin.

Emulates the driver's correctness gate (row-count + schema-width +
order-insensitive exact value comparison after the in-query rounding) at
sf0.001 so regressions surface before the driver runs sf0.01.
"""

from __future__ import annotations

import math

import duckdb
import pytest

import __spark_entry__ as entrymod

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def ddb(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def _canon(rows, cols):
    """Order-insensitive canonical form: sort columns by name, then rows."""
    idx = sorted(range(len(cols)), key=lambda i: cols[i])

    def norm(v):
        # strict: exact float equality — the in-query round(x, 6) must make
        # both engines produce bit-identical doubles, like the driver's hash
        if v is None:
            return ("\x00null",)
        if isinstance(v, float):
            if math.isnan(v):
                return ("\x00nan",)
            return ("f", v)
        if isinstance(v, bool):
            return ("b", v)
        if isinstance(v, int):
            return ("i", v)
        return ("s", str(v))

    return sorted(tuple(norm(r[i]) for i in idx) for r in rows)


ORACLES = entrymod.oracle_sql()
ALL_QUERIES = entrymod.queries()


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_query_matches_duckdb(spark, sf_dir, ddb, name):
    sdf = ALL_QUERIES[name](spark, sf_dir)
    s_cols = [c.lower() for c in sdf.columns]
    s_rows = [tuple(r) for r in sdf.collect()]

    res = ddb.execute(ORACLES[name])
    d_cols = [c[0].lower() for c in res.description]
    d_rows = res.fetchall()

    assert sorted(s_cols) == sorted(d_cols), f"{name}: column names differ"
    assert len(s_rows) == len(d_rows), f"{name}: row count {len(s_rows)} != {len(d_rows)}"
    assert _canon(s_rows, s_cols) == _canon(d_rows, d_cols), f"{name}: values differ"


@pytest.mark.parametrize("name", sorted(set(ALL_QUERIES) - set(ORACLES)))
def test_rows_only_queries_run(spark, sf_dir, name):
    """Non-SQL-expressible entries at least run and return a stable schema."""
    sdf = ALL_QUERIES[name](spark, sf_dir)
    rows = sdf.collect()
    assert len(sdf.columns) > 0
    assert isinstance(rows, list)


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert set(df.columns) == {"name", "rank"}
    # ranks sum to 1 (PageRank mass conservation)
    assert abs(sum(r["rank"] for r in rows) - 1.0) < 1e-9
