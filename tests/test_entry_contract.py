"""Guards on the driver contract: registry consistency + oracle SQL parses."""

from __future__ import annotations

import duckdb
import pytest

import __ray_entry__ as entrymod

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def test_oracle_keys_subset_of_queries():
    qs = set(entrymod.queries())
    os_ = set(entrymod.oracle_sql())
    assert os_ <= qs, os_ - qs


def test_every_oracle_sql_parses_and_binds():
    con = duckdb.connect()
    sf = "/root/testdata/sf0.001"
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")
    for name, sql in entrymod.oracle_sql().items():
        con.execute(f"EXPLAIN {sql}")  # parse + bind without executing


def test_queries_are_callable():
    for name, fn in entrymod.queries().items():
        assert callable(fn), name
