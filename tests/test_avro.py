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
