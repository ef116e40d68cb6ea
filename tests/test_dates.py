"""C2/C3 date-normalization unit tests — the FIXTURES.md §3 corpus.
The try-order IS the semantics (reference transactions.py:57-89)."""

from pyspark.sql import functions as F

from etl_mp_transactions_spark.functions.dates import (
    normalize_date_multiformat,
    strict_midnight_timestamp,
)

CASES = [
    ("2024-11-24", "2024-11-24"),   # %Y-%m-%d first
    ("24-11-2024", "2024-11-24"),   # fallback %d-%m-%Y
    ("03-04-2025", "2025-04-03"),   # dd-mm precedence on ambiguity
    ("2024/11/24", "2024-11-24"),   # %Y/%m/%d
    ("24/11/2024", "2024-11-24"),   # %d/%m/%Y
    ("11/24/2024", "11/24/2024"),   # US format fails -> passthrough
    ("garbage", "garbage"),         # no match -> passthrough
    ("31-04-2024", "31-04-2024"),   # invalid calendar date -> passthrough
    (None, None),                   # null guard
]


def test_normalize_corpus(spark):
    df = spark.createDataFrame([(c[0],) for c in CASES], "s string")
    out = df.select("s", normalize_date_multiformat("s").alias("n")).collect()
    got = {r["s"]: r["n"] for r in out}
    for inp, expected in CASES:
        assert got[inp] == expected, f"{inp!r}: {got[inp]!r} != {expected!r}"


def test_strict_midnight(spark):
    cases = [
        ("2024-11-24", "2024-11-24T00:00:00"),
        ("24/11/2024", "2024-11-24T00:00:00"),
        ("11/24/2024", None),  # engine policy: null+quarantine, not raise
        ("garbage", None),
    ]
    df = spark.createDataFrame([(c[0],) for c in cases], "s string")
    out = {r["s"]: r["t"] for r in df.select(
        "s", strict_midnight_timestamp("s").alias("t")).collect()}
    for inp, expected in cases:
        assert out[inp] == expected


def test_passthrough_keeps_column_string_typed(spark):
    df = spark.createDataFrame([("11/24/2024",)], "s string")
    out = df.select(normalize_date_multiformat("s").alias("n"))
    assert dict(out.dtypes)["n"] == "string"
    assert out.select(F.col("n")).first()["n"] == "11/24/2024"
