"""capped_bucket (operators/textdedup.py): the LSH band-bucket cap
must be LOUD — the DuckDB oracles join uncapped, so a silently
dropped row is a silent correctness divergence at whatever SF first
overflows. error mode raises, drop mode keeps the documented
bounded-loss behavior, and under-cap inputs pass through untouched."""

import pytest
from pyspark.sql import functions as F

from etl_mp_transactions_spark.operators.textdedup import capped_bucket


def _buckets(spark):
    # bucket "big" holds 6 rows, bucket "small" holds 2
    rows = [("big", f"k{i}") for i in range(6)] + [
        ("small", f"k{i}") for i in range(2)
    ]
    return spark.createDataFrame(rows, ["band_key", "sk"])


def test_under_cap_passthrough(spark):
    df = _buckets(spark)
    out = capped_bucket(df, "band_key", "sk", cap=10)
    assert out.count() == 8
    assert "_bpos" not in out.columns


def test_overflow_raises_in_error_mode(spark):
    df = _buckets(spark)
    out = capped_bucket(df, "band_key", "sk", cap=4)
    with pytest.raises(Exception, match="exceeded cap 4"):
        out.count()


def test_overflow_drops_in_drop_mode(spark):
    df = _buckets(spark)
    out = capped_bucket(df, "band_key", "sk", cap=4, on_overflow="drop")
    got = {
        (r["band_key"], r["sk"]) for r in out.collect()
    }
    # first 4 of "big" in deterministic sk order + all of "small"
    assert got == {("big", f"k{i}") for i in range(4)} | {
        ("small", "k0"),
        ("small", "k1"),
    }


def test_unknown_mode_rejected(spark):
    with pytest.raises(ValueError, match="on_overflow"):
        capped_bucket(_buckets(spark), "band_key", "sk", 4, "warn")
