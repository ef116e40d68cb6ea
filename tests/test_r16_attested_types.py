"""r16 invariant: no oracle emits a DuckDB HUGEINT (or unsigned
wide) output column.

Mechanism (VERDICT r15 task #1, registry._ORACLE_BIGINT_COLS): the
driver's result hash canonicalizes HUGEINT differently from BIGINT —
pandas/Arrow renders HUGEINT as float64/decimal128 — so an oracle
HUGEINT column hashes red on the driver even when every value matches
Spark's BIGINT exactly. Every r11–r15 driver hash mismatch had a
HUGEINT oracle column; no driver-green query ever did. This test pins
the registry-wide invariant so a future uncast ``sum()`` cannot
reintroduce a latent driver red.
"""

from __future__ import annotations

import os

import duckdb
import pytest

from etl_mp_transactions_spark import registry

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR_SMALL", "/root/testdata/sf0.001")

_BANNED = ("HUGEINT", "UHUGEINT", "UBIGINT", "UINTEGER", "USMALLINT")


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in [
        "region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents", "embeddings",
    ]:
        p = f"{SF_DIR}/{t}.parquet"
        src = f"{p}/*.parquet" if os.path.isdir(p) else p
        c.sql(f"CREATE VIEW {t} AS SELECT * FROM '{src}'")
    return c


def test_no_hugeint_oracle_columns(con):
    oracles = registry.oracle_sql()
    offenders: list[tuple[str, list[tuple[str, str]]]] = []
    for name, sql in oracles.items():
        rel = con.sql(f"SELECT * FROM ({sql}) __t LIMIT 0")
        wide = [
            (c, str(t))
            for c, t in zip(rel.columns, rel.types)
            if any(b in str(t) for b in _BANNED)
        ]
        if wide:
            offenders.append((name, wide))
    assert not offenders, (
        "oracle output columns typed HUGEINT/unsigned-wide (driver "
        "hash canonicalization red, see registry._ORACLE_BIGINT_COLS): "
        f"{offenders}"
    )


def test_bigint_cols_map_matches_registry(con):
    """Every _ORACLE_BIGINT_COLS entry names a real query and real
    columns (the * REPLACE wrapper would otherwise fail only at
    driver time)."""
    oracles = registry.oracle_sql()
    for name, cols in registry._ORACLE_BIGINT_COLS.items():
        assert name in oracles, name
        rel = con.sql(f"SELECT * FROM ({oracles[name]}) __t LIMIT 0")
        for c in cols:
            assert c in rel.columns, (name, c)
            i = rel.columns.index(c)
            assert str(rel.types[i]) == "BIGINT", (name, c, rel.types[i])
