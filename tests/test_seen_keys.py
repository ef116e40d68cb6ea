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


def test_retention_compaction(spark, tmp_path):
    """TTL analog (module docstring): compact drops keys whose latest
    seen_at is older than now - retention, keeps NULL-seen_at keys
    forever, coalesces files, and an expired key is re-admitted."""
    import os
    from datetime import datetime, timedelta

    from pyspark.sql import functions as F

    path = str(tmp_path / "store")
    st = SeenKeysStore(spark, path)
    t_old = datetime(2024, 1, 1)
    t_new = datetime(2024, 1, 20)
    now = datetime(2024, 1, 25)
    st.process(_batch(spark, ["a", "b"]), seen_at=t_old)
    st.process(_batch(spark, ["b", "c"]), seen_at=t_new)  # b already seen
    st.process(_batch(spark, ["d"]))  # no TTL: persists forever
    assert st.seen().count() == 4
    n_files_before = sum(
        1 for f in os.listdir(path) if f.endswith(".parquet")
    )
    stats = st.compact(retention=timedelta(days=20), now=now)
    # cutoff Jan-05: "a" expires (seen Jan-01); "b" survives via its
    # LATEST sighting?  No: b's only committed row is t_old (second
    # batch anti-joined it away), so b expires too; c at t_new and
    # NULL-ttl d survive
    assert stats == {"kept": 2, "dropped": 2}
    kept = {r["checksum"] for r in st.seen().collect()}
    assert kept == {"c", "d"}
    n_files_after = sum(
        1 for f in os.listdir(path) if f.endswith(".parquet")
    )
    assert n_files_after == 1 and n_files_before > 1
    # expired keys re-admit (Redis-after-TTL); live keys still dedupe
    again = st.process(_batch(spark, ["a", "c"]), seen_at=now)
    assert {r["checksum"] for r in again.collect()} == {"a"}


def test_compact_requires_now_with_retention(spark, tmp_path):
    from datetime import timedelta

    import pytest

    st = SeenKeysStore(spark, str(tmp_path / "s2"))
    with pytest.raises(ValueError, match="now"):
        st.compact(retention=timedelta(days=1))


def test_compact_empty_store_noop(spark, tmp_path):
    st = SeenKeysStore(spark, str(tmp_path / "s3"))
    assert st.compact() == {"kept": 0, "dropped": 0}


def test_reader_mid_swap_sees_old_without_mutating(spark, tmp_path):
    """ADVICE r10: a reader landing in compact's mid-swap instant
    (live path missing, generation parked at .old) must read the
    parked data WITHOUT renaming it back — reader-initiated recovery
    is what stranded a racing compact's new generation."""
    import os

    st = SeenKeysStore(spark, str(tmp_path / "s4"))
    st.process(_batch(spark, ["a", "b"]))
    os.rename(st.path, st.path + ".old")  # the mid-swap window
    assert {r["checksum"] for r in st.table().collect()} == {"a", "b"}
    assert not os.path.isdir(st.path)  # reader did NOT mutate
    assert os.path.isdir(st.path + ".old")
    # filter_new (reader path) still dedupes against the parked gen
    out = st.filter_new(_batch(spark, ["a", "c"]))
    assert {r["checksum"] for r in out.collect()} == {"c"}
    assert not os.path.isdir(st.path)


def test_writer_recovers_parked_generation(spark, tmp_path):
    """A WRITE entry point heals the crash window: .old renames back
    to the live path before the append, so nothing re-admits."""
    import os

    st = SeenKeysStore(spark, str(tmp_path / "s5"))
    st.process(_batch(spark, ["a", "b"]))
    os.rename(st.path, st.path + ".old")
    out = st.process(_batch(spark, ["a", "c"]))
    assert {r["checksum"] for r in out.collect()} == {"c"}
    assert os.path.isdir(st.path) and not os.path.isdir(st.path + ".old")
    assert st.filter_new(_batch(spark, ["a", "b", "c"])).count() == 0


def test_compact_tolerates_restored_destination(spark, tmp_path, monkeypatch):
    """ADVICE r10: if a legacy reader restores .old to the live path
    between compact's two renames, compact must replace the restored
    (superseded) generation and land the rewrite, not raise."""
    import os

    st = SeenKeysStore(spark, str(tmp_path / "s6"))
    st.process(_batch(spark, ["a", "b"]))
    st.process(_batch(spark, ["c"]))
    real_rename = os.rename
    raced = {"done": False}

    def racing_rename(src, dst):
        if (not raced["done"] and src.endswith(".compacting")
                and dst == st.path):
            raced["done"] = True
            # the racing reader's recovery fires first
            real_rename(st.path + ".old", st.path)
        real_rename(src, dst)

    monkeypatch.setattr(os, "rename", racing_rename)
    stats = st.compact()
    assert raced["done"] and stats["kept"] == 3
    assert {r["checksum"] for r in st.seen().collect()} == {"a", "b", "c"}
