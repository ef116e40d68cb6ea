"""Pure-Python Avro Object Container File codec + Spark 4 Python
DataSource — a runnable S3 (Avro source) without the spark-avro jar.

The reference reads Avro blobs record-at-a-time with fastavro
(``/root/reference/etl/extraction/avro.py:6-16``). The first-choice
Spark-native equivalent is the external spark-avro module; this
environment has no jar and no network, so this module implements the
documented subset of the **public Apache Avro 1.11 spec**
(https://avro.apache.org/docs/1.11.1/specification/ — object container
files, binary encoding) from scratch:

- container framing: ``Obj\\x01`` magic, file-metadata map
  (``avro.schema`` JSON, ``avro.codec``), 16-byte sync marker, blocks
  of (count, byte-size, payload, sync);
- codecs: ``null`` and ``deflate`` (raw RFC-1951 via zlib, wbits=-15);
- binary encoding: zigzag varint int/long, IEEE-754 LE float/double,
  length-prefixed string/bytes, boolean byte, records as concatenated
  fields, unions as (branch index, value) — enough for flat event
  records with nullable fields, incl. the ``timestamp-micros`` logical
  type (→ TIMESTAMP_NTZ, wall-clock UTC like the rest of the engine).

Spark integration is the Spark 4 Python DataSource API: one input
partition per file (executors decode independently; no driver-side
file reading). Honest scale note: Python record decode is the slow
path — this source exists so a jar-less deployment can still *run*
Avro ingestion end-to-end; a cluster with spark-avro available should
prefer it (sources/avro.py reads it when present).
"""

from __future__ import annotations

import io
import json
import os
import struct
import zlib
from datetime import datetime, timedelta

MAGIC = b"Obj\x01"
_EPOCH = datetime(1970, 1, 1)


# ---------- binary primitives (Avro spec "Binary encoding") ----------


def _write_long(out: io.BytesIO, v: int) -> None:
    v = (v << 1) ^ (v >> 63)  # zigzag
    while (v & ~0x7F) != 0:
        out.write(bytes([(v & 0x7F) | 0x80]))
        v >>= 7
    out.write(bytes([v]))


def _read_long(buf, pos: int) -> tuple[int, int]:
    shift, acc = 0, 0
    while True:
        b = buf[pos]
        pos += 1
        acc |= (b & 0x7F) << shift
        if not b & 0x80:
            break
        shift += 7
    return (acc >> 1) ^ -(acc & 1), pos  # un-zigzag


def _write_bytes(out: io.BytesIO, b: bytes) -> None:
    _write_long(out, len(b))
    out.write(b)


def _read_bytes(buf, pos: int) -> tuple[bytes, int]:
    n, pos = _read_long(buf, pos)
    return bytes(buf[pos : pos + n]), pos + n


# ---------- schema-directed encode/decode ----------


def _encode_value(out: io.BytesIO, typ, v) -> None:
    if isinstance(typ, list):  # union: branch index then value
        want = "null" if v is None else "non-null"
        branch = next(
            (
                i
                for i, t in enumerate(typ)
                if (_type_name(t) == "null") == (v is None)
            ),
            None,
        )
        if branch is None:
            raise ValueError(f"union {typ!r} has no {want} branch")
        _write_long(out, branch)
        if v is not None:
            _encode_value(out, typ[branch], v)
        return
    name = _type_name(typ)
    if name == "null":
        return
    if name == "boolean":
        out.write(b"\x01" if v else b"\x00")
    elif name in ("int", "long"):
        if isinstance(typ, dict) and typ.get("logicalType") == "timestamp-micros":
            # timedelta components are floored, so this is exact for
            # pre-epoch datetimes too (int(total_seconds()) truncates
            # toward zero and would mis-encode them by up to ~2s)
            d = v - _EPOCH
            v = (d.days * 86_400 + d.seconds) * 1_000_000 + d.microseconds
        _write_long(out, int(v))
    elif name == "float":
        out.write(struct.pack("<f", v))
    elif name == "double":
        out.write(struct.pack("<d", v))
    elif name == "string":
        _write_bytes(out, v.encode("utf-8"))
    elif name == "bytes":
        _write_bytes(out, v)
    elif name == "record":
        for f, fv in zip(typ["fields"], v):
            _encode_value(out, f["type"], fv)
    else:
        raise NotImplementedError(f"avro type {name!r} not in the supported subset")


def _decode_value(buf, pos: int, typ):
    if isinstance(typ, list):
        branch, pos = _read_long(buf, pos)
        t = typ[branch]
        if _type_name(t) == "null":
            return None, pos
        return _decode_value(buf, pos, t)
    name = _type_name(typ)
    if name == "null":
        return None, pos
    if name == "boolean":
        return buf[pos] == 1, pos + 1
    if name in ("int", "long"):
        v, pos = _read_long(buf, pos)
        if isinstance(typ, dict) and typ.get("logicalType") == "timestamp-micros":
            return _EPOCH + timedelta(microseconds=v), pos
        return v, pos
    if name == "float":
        return struct.unpack_from("<f", buf, pos)[0], pos + 4
    if name == "double":
        return struct.unpack_from("<d", buf, pos)[0], pos + 8
    if name == "string":
        b, pos = _read_bytes(buf, pos)
        return b.decode("utf-8"), pos
    if name == "bytes":
        return _read_bytes(buf, pos)
    if name == "record":
        row = []
        for f in typ["fields"]:
            v, pos = _decode_value(buf, pos, f["type"])
            row.append(v)
        return tuple(row), pos
    raise NotImplementedError(f"avro type {name!r} not in the supported subset")


def _type_name(typ) -> str:
    if isinstance(typ, dict):
        return typ["type"]
    return typ


# ---------- container files ----------


def write_container(
    path: str, schema: dict, rows, codec: str = "deflate", sync: bytes | None = None,
    block_rows: int = 4096,
) -> None:
    """Write rows (tuples in schema field order) as one container file.

    The sync marker is md5(schema JSON) by default: deterministic (the
    spec's random marker would make output bytes unstable) but never
    all-zeros — an all-zero marker is ambiguous with the metadata
    map's 0x00 terminator that immediately precedes it, which breaks
    split-seeking readers that scan for the first marker occurrence
    (Spark's AvroFileFormat does)."""
    if sync is None:
        import hashlib

        sync = hashlib.md5(json.dumps(schema).encode()).digest()
    with open(path, "wb") as f:
        f.write(MAGIC)
        meta = {
            "avro.schema": json.dumps(schema).encode(),
            "avro.codec": codec.encode(),
        }
        out = io.BytesIO()
        _write_long(out, len(meta))
        for k, v in sorted(meta.items()):
            _write_bytes(out, k.encode())
            _write_bytes(out, v)
        _write_long(out, 0)  # end of metadata map
        f.write(out.getvalue())
        f.write(sync)

        batch: list = []

        def flush():
            if not batch:
                return
            body = io.BytesIO()
            for row in batch:
                _encode_value(body, schema, row)
            payload = body.getvalue()
            if codec == "deflate":
                c = zlib.compressobj(wbits=-15)
                payload = c.compress(payload) + c.flush()
            head = io.BytesIO()
            _write_long(head, len(batch))
            _write_long(head, len(payload))
            f.write(head.getvalue())
            f.write(payload)
            f.write(sync)
            batch.clear()

        for row in rows:
            batch.append(row)
            if len(batch) >= block_rows:
                flush()
        flush()


def read_container(path: str):
    """Yield rows (tuples in schema field order); returns via generator
    attribute-free design — call read_schema for the schema."""
    with open(path, "rb") as f:
        data = f.read()
    schema, pos, sync = _parse_header(data)
    while pos < len(data):
        count, pos = _read_long(data, pos)
        size, pos = _read_long(data, pos)
        payload = data[pos : pos + size]
        pos += size
        if data[pos : pos + 16] != sync:
            raise ValueError(f"bad sync marker in {path!r}")
        pos += 16
        codec = schema.get("__codec__", "null")
        if codec == "deflate":
            payload = zlib.decompress(payload, wbits=-15)
        p = 0
        for _ in range(count):
            row, p = _decode_value(payload, p, schema["__schema__"])
            yield row


def read_schema(path: str) -> dict:
    with open(path, "rb") as f:
        head = f.read(1 << 16)
    schema, _, _ = _parse_header(head)
    return schema["__schema__"]


def _parse_header(data: bytes):
    if data[:4] != MAGIC:
        raise ValueError("not an Avro object container file")
    pos, meta = 4, {}
    n, pos = _read_long(data, pos)
    while n != 0:
        if n < 0:  # negative count = abs(count) with byte size prefix
            n = -n
            _, pos = _read_long(data, pos)
        for _ in range(n):
            k, pos = _read_bytes(data, pos)
            v, pos = _read_bytes(data, pos)
            meta[k.decode()] = v
        n, pos = _read_long(data, pos)
    sync = data[pos : pos + 16]
    pos += 16
    return (
        {
            "__schema__": json.loads(meta["avro.schema"].decode()),
            "__codec__": meta.get("avro.codec", b"null").decode(),
        },
        pos,
        sync,
    )


# ---------- Spark 4 Python DataSource ----------


def _avro_to_ddl(schema: dict) -> str:
    """Map the supported Avro record subset to a Spark DDL schema."""
    prim = {
        "boolean": "boolean", "int": "int", "long": "long", "float": "float",
        "double": "double", "string": "string", "bytes": "binary",
    }

    def one(typ) -> str:
        if isinstance(typ, list):
            non_null = [t for t in typ if _type_name(t) != "null"]
            return one(non_null[0])
        if isinstance(typ, dict):
            if typ.get("logicalType") == "timestamp-micros":
                return "timestamp_ntz"
            return prim[typ["type"]]
        return prim[typ]

    cols = ", ".join(f"{f['name']} {one(f['type'])}" for f in schema["fields"])
    return cols


def register_avro_datasource(spark) -> str:
    """Register the `avro_py` format; returns the format name.
    Usage: spark.read.format('avro_py').schema(ddl).load(dir)."""
    from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

    class _AvroFilePartition(InputPartition):
        def __init__(self, path: str):
            self.path = path

    class _AvroReader(DataSourceReader):
        def __init__(self, options):
            self.path = options.get("path")

        def partitions(self):
            if os.path.isdir(self.path):
                files = sorted(
                    os.path.join(self.path, f)
                    for f in os.listdir(self.path)
                    if f.endswith(".avro")
                )
            else:
                files = [self.path]
            # one partition per container file: executors decode
            # independently; nothing is read on the driver
            return [_AvroFilePartition(p) for p in files]

        def read(self, partition):
            yield from read_container(partition.path)

    class AvroPyDataSource(DataSource):
        @classmethod
        def name(cls):
            return "avro_py"

        def schema(self):
            path = self.options.get("path")
            first = path
            if os.path.isdir(path):
                cand = sorted(f for f in os.listdir(path) if f.endswith(".avro"))
                if not cand:
                    raise ValueError(f"no .avro files under {path!r}")
                first = os.path.join(path, cand[0])
            return _avro_to_ddl(read_schema(first))

        def reader(self, schema):
            return _AvroReader(self.options)

    spark.dataSource.register(AvroPyDataSource)
    return "avro_py"
