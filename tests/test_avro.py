"""Avro source (S3) conformance: the pure-Python container codec
(sources/avro_py.py) against itself, against the bundled JVM Avro
reader (cross-implementation — the strongest spec check available
offline), and through the Spark Python DataSource fallback."""

import os

import pytest

from etl_mp_transactions_spark.sources.avro_py import (
    read_container,
    register_avro_datasource,
    write_container,
)

SCHEMA = {
    "type": "record",
    "name": "t",
    "fields": [
        {"name": "a", "type": "long"},
        {"name": "s", "type": ["null", "string"]},
        {"name": "x", "type": "double"},
        {"name": "flag", "type": "boolean"},
    ],
}
ROWS = [(1, "hi", 1.5, True), (2, None, -0.25, False), (3, "", 0.0, True)]


@pytest.mark.parametrize("codec", ["null", "deflate"])
def test_python_roundtrip(tmp_path, codec):
    p = str(tmp_path / "x.avro")
    write_container(p, SCHEMA, ROWS, codec=codec)
    assert list(read_container(p)) == ROWS


@pytest.mark.parametrize("codec", ["null", "deflate"])
def test_jvm_reader_reads_python_writer(spark, tmp_path, codec):
    # cross-implementation check: files from the from-scratch encoder
    # must parse with the reference JVM decoder, blocks, sync and all
    p = str(tmp_path / "x.avro")
    write_container(p, SCHEMA, ROWS, codec=codec)
    got = sorted(
        map(
            tuple,
            spark.read.format("org.apache.spark.sql.avro.AvroFileFormat")
            .load(p)
            .collect(),
        )
    )
    assert got == sorted(ROWS)


def test_python_datasource_fallback(spark, tmp_path):
    # the jar-less path: avro_py DataSource, one partition per file
    for i in range(3):
        write_container(
            str(tmp_path / f"part-{i}.avro"),
            SCHEMA,
            [(i * 10 + j, f"s{j}", float(j), j % 2 == 0) for j in range(5)],
        )
    fmt = register_avro_datasource(spark)
    df = spark.read.format(fmt).options(path=str(tmp_path)).load()
    assert df.rdd.getNumPartitions() == 3
    assert df.count() == 15
    assert set(df.columns) == {"a", "s", "x", "flag"}
    got = {r["a"] for r in df.collect()}
    assert got == {i * 10 + j for i in range(3) for j in range(5)}


def test_multi_block_files(tmp_path):
    p = str(tmp_path / "x.avro")
    rows = [(i, f"v{i}", i / 7.0, i % 3 == 0) for i in range(10_000)]
    write_container(p, SCHEMA, rows, block_rows=512)
    assert list(read_container(p)) == rows


def test_union_null_branch_not_first(tmp_path):
    # ["string","null"] puts null at branch 1: the encoder must pick
    # the branch by type, not assume null is index 0 (a wrong index
    # makes the decoder read the next field's bytes as the string)
    schema = {
        "type": "record",
        "name": "t",
        "fields": [
            {"name": "s", "type": ["string", "null"]},
            {"name": "a", "type": "long"},
        ],
    }
    rows = [("hi", 1), (None, 2), ("bye", 3)]
    p = str(tmp_path / "x.avro")
    write_container(p, schema, rows)
    assert list(read_container(p)) == rows


def test_union_without_null_branch_rejects_none(tmp_path):
    import io

    from etl_mp_transactions_spark.sources.avro_py import _encode_value

    with pytest.raises(ValueError, match="no null branch"):
        _encode_value(io.BytesIO(), ["string", "long"], None)


def test_pre_epoch_timestamp_roundtrip(tmp_path):
    # int(total_seconds()) truncates toward zero while .microsecond is
    # always positive — pre-1970 values used to corrupt by up to ~2s
    from datetime import datetime

    schema = {
        "type": "record",
        "name": "t",
        "fields": [
            {"name": "ts", "type": {"type": "long", "logicalType": "timestamp-micros"}},
        ],
    }
    rows = [
        (datetime(1969, 12, 31, 23, 59, 59, 500000),),
        (datetime(1969, 12, 31, 23, 59, 59, 0),),
        (datetime(1945, 5, 8, 1, 2, 3, 999999),),
        (datetime(1970, 1, 1, 0, 0, 0, 1),),
        (datetime(2024, 6, 1, 12, 0, 0, 123456),),
    ]
    p = str(tmp_path / "x.avro")
    write_container(p, schema, rows)
    assert list(read_container(p)) == rows


def test_read_avro_ntz_is_session_tz_independent(spark, tmp_path):
    # both read paths must return the UTC wall clock as TIMESTAMP_NTZ
    # even when the session timezone is not UTC
    from datetime import datetime

    from etl_mp_transactions_spark.sources.avro import read_avro

    schema = {
        "type": "record",
        "name": "t",
        "fields": [
            {"name": "ts", "type": {"type": "long", "logicalType": "timestamp-micros"}},
        ],
    }
    want = datetime(2024, 6, 1, 12, 30, 45, 123456)
    p = str(tmp_path / "x.avro")
    write_container(p, schema, [(want,)])
    old = spark.conf.get("spark.sql.session.timeZone")
    try:
        spark.conf.set("spark.sql.session.timeZone", "America/New_York")
        df = read_avro(spark, p)
        assert df.schema["ts"].dataType.typeName() == "timestamp_ntz"
        assert df.collect()[0]["ts"] == want
    finally:
        spark.conf.set("spark.sql.session.timeZone", old)


def test_sync_marker_never_all_zero(tmp_path):
    # an all-zero sync is ambiguous with the metadata-map terminator
    # byte that precedes it and breaks split-seeking readers
    p = str(tmp_path / "x.avro")
    write_container(p, SCHEMA, ROWS)
    data = open(p, "rb").read()
    import hashlib
    import json

    sync = hashlib.md5(json.dumps(SCHEMA).encode()).digest()
    assert sync in data and sync != b"\x00" * 16
