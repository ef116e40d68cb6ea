"""R1 batch exactly-once: the persisted seen-keys protocol must be
idempotent across re-runs (SURVEY.md §7 'idempotent re-runs are a
test, not a hope')."""

import pytest

from etl_mp_transactions_spark.operators.seen_keys import SeenKeysStore


@pytest.fixture
def store(spark, tmp_path):
    return SeenKeysStore(spark, str(tmp_path / "seen"), key="checksum")


def _batch(spark, keys):
    return spark.createDataFrame([(k, f"payload-{k}") for k in keys],
                                 "checksum string, body string")


def test_first_batch_all_new(spark, store):
    out = store.process(_batch(spark, ["a", "b", "c"]))
    assert {r["checksum"] for r in out.collect()} == {"a", "b", "c"}


def test_replay_contributes_zero(spark, store):
    store.process(_batch(spark, ["a", "b"]))
    replay = store.process(_batch(spark, ["a", "b"]))
    assert replay.count() == 0


def test_partial_overlap(spark, store):
    store.process(_batch(spark, ["a", "b"]))
    out = store.process(_batch(spark, ["b", "c", "d"]))
    assert {r["checksum"] for r in out.collect()} == {"c", "d"}


def test_first_wins_within_batch(spark, store):
    df = spark.createDataFrame(
        [("a", "x"), ("a", "y"), ("b", "z")], "checksum string, body string")
    out = store.process(df)
    assert out.count() == 2  # one row per key survives
