"""Malformed-input robustness: PERMISSIVE-mode corrupt-record capture
for JSON and CSV sources — the production answer to 'one bad row must
not kill (or silently vanish from) a 100 TB load'.

The reference's only guard is request-level null checks
(/root/reference/main.py:57-67); a bad row inside a file would raise
mid-batch. The engine policy mirrors the C3 quarantine design
(operators/quarantine.py): parse what parses, capture what doesn't in
`_corrupt_record`, route the quarantine branch — never drop silently,
never abort the batch.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StringType, StructField, StructType


def _write(path: str, lines: list[str]) -> str:
    with open(path, "w") as fh:
        fh.write("\n".join(lines) + "\n")
    return path


def test_json_permissive_quarantine(spark, tmp_path):
    src = _write(
        os.path.join(str(tmp_path), "rows.jsonl"),
        [
            '{"id": 1, "name": "ok"}',
            '{"id": 2, "name": "also ok"}',
            '{"id": "NOT A NUMBER", "name": "type clash"}',
            "{this is not json at all",
            '{"id": 5, "name": "fine"}',
        ],
    )
    schema = StructType(
        [
            StructField("id", LongType()),
            StructField("name", StringType()),
            StructField("_corrupt_record", StringType()),
        ]
    )
    df = (
        spark.read.schema(schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .json(src)
        .cache()  # required: corrupt-record column + raw-record queries
    )
    good = df.filter(F.col("_corrupt_record").isNull()).select("id", "name")
    bad = df.filter(F.col("_corrupt_record").isNotNull())
    assert sorted(r.id for r in good.collect()) == [1, 2, 5]
    assert bad.count() == 2  # type clash + unparseable both captured
    raw = [r["_corrupt_record"] for r in bad.collect()]
    assert any("NOT A NUMBER" in s for s in raw)
    assert any("not json at all" in s for s in raw)
    df.unpersist()


def test_json_failfast_raises(spark, tmp_path):
    src = _write(
        os.path.join(str(tmp_path), "rows_ff.jsonl"),
        ['{"id": 1}', "{broken"],
    )
    schema = StructType([StructField("id", LongType())])
    import pytest

    # surfaces as Py4JJavaError (SparkException: Malformed records ...)
    # from the JVM collect — assert on the message, not the wrapper type
    with pytest.raises(Exception, match="FAILFAST|[Mm]alformed"):
        spark.read.schema(schema).option("mode", "FAILFAST").json(src).collect()


def test_csv_permissive_quarantine(spark, tmp_path):
    src = _write(
        os.path.join(str(tmp_path), "rows.csv"),
        [
            "id,amount",
            "1,10.5",
            "2,not_a_number",
            "3,30.25",
        ],
    )
    # CSV type clash surfaces when the target type is non-string; use a
    # two-pass contract: read raw, cast with try_cast, quarantine nulls
    # that were non-null raw — deterministic and engine-portable
    raw = (
        spark.read.schema(
            StructType(
                [StructField("id", LongType()), StructField("amount", StringType())]
            )
        )
        .option("header", "true")
        .csv(src)
    )
    typed = raw.withColumn("amount_d", F.expr("try_cast(amount AS DOUBLE)"))
    good = typed.filter(F.col("amount_d").isNotNull())
    quarantined = typed.filter(
        F.col("amount").isNotNull() & F.col("amount_d").isNull()
    )
    assert sorted(r.id for r in good.collect()) == [1, 3]
    assert [r.id for r in quarantined.collect()] == [2]
