"""Guard: no DuckDB oracle may emit HUGEINT/DECIMAL output columns.

Round-4 post-mortem (VERDICT.md r4): three driver gates went hash-red solely
because DuckDB's ``sum()`` returns HUGEINT and the driver's value hasher
canonicalizes HUGEINT differently from Spark's BIGINT even when the values
are bit-identical.  DOUBLE is fine (several r4 gates hash green with DOUBLE
columns); the poison types are the ones Spark has no counterpart for:
HUGEINT and DECIMAL.  Every oracle's *final* output schema is type-checked
here by binding (not executing) the SQL against the sf0.001 views, so a
future ``sum(...)`` added without a CAST fails this test instead of a
driver round.
"""

from __future__ import annotations

import duckdb
import pytest

import __spark_entry__ as E

TABLES = (
    "region nation customer supplier part orders lineitem "
    "events documents embeddings"
).split()

SF_DIR = "/root/testdata/sf0.001"

BANNED = ("HUGEINT", "DECIMAL")


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{SF_DIR}/{t}.parquet')"
        )
    return c


def test_every_query_has_oracle_or_is_declared():
    """queries() and oracle_sql() keys line up (oracle-less entries are the
    declared rows-only checks; there must be no oracle without a query)."""
    qs = set(E.queries())
    os_ = set(E.oracle_sql())
    assert os_ <= qs, f"oracles without queries: {sorted(os_ - qs)}"


def test_no_hugeint_or_decimal_in_any_oracle(con):
    offenders = {}
    for name, sql in E.oracle_sql().items():
        rel = con.sql(sql)  # binds + plans; does not execute
        types = [str(t).upper() for t in rel.types]
        bad = [
            (c, t)
            for c, t in zip(rel.columns, types)
            if any(b in t for b in BANNED)
        ]
        if bad:
            offenders[name] = bad
    assert not offenders, (
        "oracle output columns with driver-hash-unsafe types "
        f"(wrap in CAST(... AS BIGINT)): {offenders}"
    )
