"""Pins for the linkage family. The critical one: the PPJoin prune
stack (asymmetric prefixes + positional filter) must be LOSSLESS —
the registry query's output is compared against the naive all-pairs
exact Jaccard join on the small SF."""

from pyspark.sql import Window
from pyspark.sql import functions as F

from etl_mp_transactions_spark.queries.linkage import (
    SETSIM_THETA,
    cdc_merge_apply,
    ohlc_bars,
    setsim_prefix_join,
)


def test_setsim_equals_bruteforce(spark, sf_dir):
    got = {
        (r.d1, r.d2): (r.inter, r.n1, r.n2)
        for r in setsim_prefix_join(spark, sf_dir).collect()
    }
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    toks = F.filter(
        F.split(F.lower(F.col("text")), r"\s+"), lambda x: x != F.lit("")
    )
    d = docs.select("doc_id", toks.alias("l")).filter(F.size("l") >= 3)
    sets = {
        r.doc_id: set(
            " ".join(t)
            for t in zip(r.l, r.l[1:], r.l[2:])
        )
        for r in d.collect()
    }
    ids = sorted(sets)
    want = {}
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            a, b = sets[ids[i]], sets[ids[j]]
            inter = len(a & b)
            union = len(a) + len(b) - inter
            if union and inter / union >= SETSIM_THETA:
                want[(ids[i], ids[j])] = (inter, len(a), len(b))
    assert got == want
    assert want, "small-SF corpus should contain at least one match"


def test_cdc_merge_semantics(spark, sf_dir):
    out = cdc_merge_apply(spark, sf_dir)
    rows = out.collect()
    by_op = {}
    for r in rows:
        by_op.setdefault(r.op, []).append(r)
    # keeps are unchanged
    assert all(r.new_cents == r.old_cents for r in by_op.get("keep", []))
    # inserts have no prior state
    assert all(r.old_cents is None for r in by_op.get("insert", []))
    # updates replace the balance
    assert all(
        r.old_cents is not None for r in by_op.get("update", [])
    )
    # one output row per key, deletes absent
    keys = [r.c_custkey for r in rows]
    assert len(keys) == len(set(keys))
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    w_latest = (
        ev.withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("user_id").orderBy(
                    F.desc("ts"), F.desc("event_id")
                )
            ),
        )
        .filter("rn = 1")
        .filter("event_type = 'error'")
    )
    deleted = {r.user_id for r in w_latest.collect()}
    assert deleted.isdisjoint(set(keys))


def test_ohlc_invariants(spark, sf_dir):
    rows = ohlc_bars(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.low_cents <= r.open_cents <= r.high_cents
        assert r.low_cents <= r.close_cents <= r.high_cents
        assert r.n_events >= 1
