"""Partition-count invariance for the round-9 registry queries:
identical results under 3 vs 17 shuffle partitions at sf0.001 (the
r5b/r6/r7 blanket contract — the determinism class the
single-partitioning oracle can't see).

The streaming pair r17/r18 is excluded (checkpointed streams, pinned
by their stream==batch oracles — the r16 precedent). The interesting
members: hard_negative_mining_full's per-(band, bucket) candidate cap
and struct-max argmax, and seen_keys_retention_roundtrip's anti-join
+ compaction chain, must not depend on the ambient partitioning."""

import math

import pytest

from etl_mp_transactions_spark.registry import queries

R9_QUERIES = [
    "hard_negative_mining_full",
    "seen_keys_retention_roundtrip",
    "hll_from_definition",
    "ndcg_ranking_eval",
]


def _norm(v):
    if isinstance(v, float):
        return math.nan if math.isnan(v) else round(v, 12)
    return v


def _multiset(df):
    rows = [tuple(_norm(v) for v in r) for r in df.collect()]
    return sorted(map(repr, rows))


@pytest.mark.parametrize("name", R9_QUERIES)
def test_partition_invariance_r9(spark, sf_dir, name):
    fn = queries()[name]
    old = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "3")
        a = _multiset(fn(spark, sf_dir))
        spark.conf.set("spark.sql.shuffle.partitions", "17")
        b = _multiset(fn(spark, sf_dir))
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)
    assert a == b, f"{name}: results depend on shuffle partitioning"
