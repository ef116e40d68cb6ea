"""End-to-end golden test: hand-built bronze-shaped nested rows →
silver, asserting the *intended* semantics where the reference is
buggy (SURVEY.md §7): per-row metadata maps (not the shared-dict bug),
user_id populated (not the silent '' default), empty-metadata rows
survive (explode_outer semantics, not inner-UNNEST row loss)."""

import pytest
from pyspark.sql import Row
from pyspark.sql import types as T

from etl_mp_transactions_spark.operators.silver import silver_transactions

BRONZE_SCHEMA = T.StructType([
    T.StructField("userId", T.StringType()),
    T.StructField("companyId", T.StringType()),
    T.StructField("payload", T.ArrayType(T.StructType([
        T.StructField("header", T.StructType([
            T.StructField("account_number", T.StringType()),
            T.StructField("account_alias", T.StringType()),
            T.StructField("currency", T.StringType()),
            T.StructField("timeframe", T.StringType()),
            T.StructField("report_date", T.StringType()),
            T.StructField("bank", T.StringType()),
            T.StructField("extraction_timestamp", T.TimestampNTZType()),
        ])),
        T.StructField("lines", T.ArrayType(T.StructType([
            T.StructField("checksum", T.StringType()),
            T.StructField("date", T.StringType()),
            T.StructField("concept", T.StringType()),
            T.StructField("amount", T.DoubleType()),
            T.StructField("remaining", T.DoubleType()),
            T.StructField("metadata", T.ArrayType(T.StructType([
                T.StructField("key", T.StringType()),
                T.StructField("value", T.StringType()),
            ]))),
        ]))),
    ]))),
    T.StructField("year", T.IntegerType()),
    T.StructField("month", T.IntegerType()),
    T.StructField("day", T.IntegerType()),
    T.StructField("company_id", T.StringType()),
])

import datetime

HEADER = Row(
    account_number="ACC1", account_alias="al", currency="EUR",
    timeframe="DAILY", report_date="2024-11-24", bank="B1",
    extraction_timestamp=datetime.datetime(2024, 11, 24),
)


def _mk_bronze(spark, lines, user="user-1", company="comp-1"):
    row = Row(
        userId=user, companyId=company,
        payload=[Row(header=HEADER, lines=lines)],
        year=2024, month=11, day=24, company_id=company,
    )
    return spark.createDataFrame([row], BRONZE_SCHEMA)


def _line(checksum, date="24-11-2024", concept="c", amount=10.0,
          remaining=1.5, metadata=()):
    return Row(checksum=checksum, date=date, concept=concept, amount=amount,
               remaining=remaining,
               metadata=[Row(key=k, value=v) for k, v in metadata])


def test_per_row_metadata_not_shared(spark):
    bronze = _mk_bronze(spark, [
        _line("a", metadata=[("k1", "v1")]),
        _line("b", metadata=[("k2", "v2")]),
        _line("c", metadata=[]),
    ])
    out = {r["checksum"]: r["metadata"] for r in silver_transactions(bronze).collect()}
    # intent: each row keeps ONLY its own pairs (reference bug: union-of-all)
    assert out["a"] == {"k1": "v1"}
    assert out["b"] == {"k2": "v2"}
    assert out["c"] == {}  # empty-metadata row SURVIVES (explode_outer intent)


def test_user_id_populated_and_defaults(spark):
    bronze = _mk_bronze(spark, [_line("a", concept=None, amount=None)])
    row = silver_transactions(bronze).first()
    assert row["user_id"] == "user-1"  # reference silently defaults to ''
    assert row["concept"] == ""
    assert row["amount"] == 0.0
    assert row["transaction_date"] == "2024-11-24"
    assert row["created_at"] == "2024-11-24T00:00:00"


def test_metadata_f5_guard_drops_empty_keys(spark):
    bronze = _mk_bronze(spark, [_line("a", metadata=[("k", "v"), ("", "x"), ("y", "")])])
    row = silver_transactions(bronze).first()
    assert row["metadata"] == {"k": "v"}


def test_partition_binding_filters(spark):
    bronze = _mk_bronze(spark, [_line("a")])
    assert silver_transactions(bronze, partitions={"year": 2024}).count() == 1
    assert silver_transactions(bronze, partitions={"year": 1999}).count() == 0


def test_etl_checksum_is_md5_of_raw_fields(spark):
    import hashlib
    bronze = _mk_bronze(spark, [_line("a", date="24-11-2024", concept="c",
                                      amount=10.0, remaining=1.5)])
    row = silver_transactions(bronze).first()
    expected = hashlib.md5(b"24-11-2024c10.001.50").hexdigest()
    assert row["etl_checksum"] == expected
