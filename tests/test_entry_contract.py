"""Driver-contract self-check: every queries() entry vs its oracle_sql()
via DuckDB at sf0.01 — row count + order-insensitive value comparison,
mimicking the driver's CORRECTNESS gate."""

from __future__ import annotations

import datetime
import math
import os
from decimal import Decimal

import duckdb
import pytest

import __spark_entry__ as entry_mod

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR_TEST", "/root/testdata/sf0.01")

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def _norm(v):
    if isinstance(v, Decimal):
        v = float(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return round(v, 6)
    if isinstance(v, datetime.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, bool):
        return int(v)
    return v


def _spark_rows(df):
    cols = sorted(df.columns)
    return sorted(
        tuple(_norm(r[c]) for c in cols) for r in df.collect()
    ), cols


def _duck_rows(con, sql):
    rel = con.sql(sql)
    cols = rel.columns
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    rows = rel.fetchall()
    return sorted(
        tuple(_norm(r[i]) for i in order) for r in rows
    ), sorted(cols)


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    return con


@pytest.mark.parametrize("name", sorted(entry_mod.oracle_sql().keys()))
def test_query_matches_oracle(spark, duck, name):
    q = entry_mod.queries()[name]
    got, got_cols = _spark_rows(q(spark, SF_DIR))
    exp, exp_cols = _duck_rows(duck, entry_mod.oracle_sql()[name])
    assert got_cols == exp_cols, f"{name}: columns {got_cols} vs {exp_cols}"
    assert len(got) == len(exp), f"{name}: {len(got)} rows vs {len(exp)}"
    mismatches = [i for i, (g, e) in enumerate(zip(got, exp)) if g != e]
    assert not mismatches, (
        f"{name}: {len(mismatches)} mismatched rows; first: "
        f"{got[mismatches[0]]} vs {exp[mismatches[0]]}"
    )


@pytest.mark.parametrize(
    "name",
    [n for n in entry_mod.queries() if n not in entry_mod.oracle_sql()],
)
def test_rows_only_queries_run(spark, name):
    df = entry_mod.queries()[name](spark, SF_DIR)
    assert df.count() >= 0
    assert df.schema is not None


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    assert df.count() > 0
