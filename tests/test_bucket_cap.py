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


# --- candidate-volume guards (VERDICT r12 tasks #6/#8) -------------


def _degenerate_sets(spark, n_sets):
    # every set shares the same 3-token vocabulary: the worst case
    # the sf10 sweep measured (871M candidates) in miniature
    rows = [
        ("en", "web", i, ["aa", "bb", "cc"], 3) for i in range(n_sets)
    ]
    return spark.createDataFrame(
        rows, "lang string, source string, sid long,"
        " tokens array<string>, n long"
    )


def test_containment_prefix_guard_trips_on_degenerate_corpus(spark):
    from etl_mp_transactions_spark.operators.containment import (
        pairs_prefix,
    )

    sets = _degenerate_sets(spark, 40)  # est = 3*40^2 = 4800 > 64*40
    with pytest.raises(ValueError, match="candidate-volume bound"):
        pairs_prefix(sets, on_overflow="error")


def test_containment_bitmap_guard_trips_on_degenerate_corpus(spark):
    from etl_mp_transactions_spark.operators.containment import (
        pairs_bitmap,
    )

    sets = _degenerate_sets(spark, 100)  # est = 100^2 > 64*100
    with pytest.raises(ValueError, match="candidate-volume bound"):
        pairs_bitmap(sets, 3, on_overflow="error")


def test_containment_guard_flags_but_completes_by_default(spark, capfd):
    from etl_mp_transactions_spark.operators.containment import (
        containment_set_pairs,
    )

    sets = _degenerate_sets(spark, 40)
    out = containment_set_pairs(sets, force="prefix")  # flag mode
    assert out.count() > 0  # identical-token sets all pass containment
    assert "candidate-volume bound" in capfd.readouterr().err


def test_containment_guard_quiet_under_budget(spark, capfd):
    from etl_mp_transactions_spark.operators.containment import (
        pairs_prefix,
    )

    rows = [("en", "web", i, [f"t{i}a", f"t{i}b"], 2) for i in range(20)]
    sets = spark.createDataFrame(
        rows, "lang string, source string, sid long,"
        " tokens array<string>, n long"
    )
    pairs_prefix(sets, on_overflow="error").count()  # no trip
    assert "candidate-volume" not in capfd.readouterr().err


def test_bcast_baseline_ceiling_raises_loudly(spark, monkeypatch):
    from etl_mp_transactions_spark.operators import ann

    emb = spark.range(20).selectExpr(
        "id AS vec_id",
        "transform(sequence(1, 4), j -> cast(j AS double)) AS embedding",
    )
    monkeypatch.setattr(ann, "BCAST_MAX_ROWS", 10)
    with pytest.raises(ValueError, match="BCAST_MAX_ROWS"):
        ann.cosine_topk_bcast(emb, k=2)
