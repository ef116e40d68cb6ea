"""Whole-registry partition-count invariance: every batch query must
return identical results under 3 vs 17 shuffle partitions at
sf0.001 — the determinism class a single-partitioning oracle run
cannot see (order-dependent float accumulation, physical-order rank
ties, first/last leaking partition layout).

Streaming entries (r1–r10) are excluded: they spin real streams with
checkpoints, and their determinism is pinned by the dedicated
stream==batch equivalence tests instead. The r5b-focused sweep in
test_r5b_invariance.py is subsumed but kept (it runs the newest, most
at-risk queries in isolation for fast failure localization)."""

import math

import pytest

from etl_mp_transactions_spark.registry import queries

_EXCLUDE = {
    # streaming twins: real streams; pinned by stream==batch tests
    "r1_stream_dedup",
    "r6_stream_tumbling",
    "r7_stream_upsert",
    "r8_stream_session",
    "r9_stream_continuous_agg",
    "r10_stream_stream_join",
    "r11_stream_sliding",
    "r12_stream_static_enrich",
    "r13_stream_custom_state",
    # incremental MV refresh: writes/reads its own state parquet —
    # pinned by its dedicated refresh-equivalence test
    "incremental_mv_refresh",
}

_MAY_BE_EMPTY = {
    # the DOULION-sampled supplier graph keeps ~2 edges at sf0.001,
    # so its 2-core is legitimately empty
    "kcore_decomposition",
    # selective TPC-H predicates with no qualifying rows at sf0.001
    # (nation-pair / min-cost-region / value-threshold filters); all
    # three return rows at the gate SFs — verified invariant here,
    # just empty
    "q2_min_cost_supplier",
    "q7_volume_shipping",
    "q11_important_stock",
}

_NAMES = sorted(set(queries()) - _EXCLUDE)


def _norm(v):
    if isinstance(v, float):
        return math.nan if math.isnan(v) else round(v, 12)
    return v


def _multiset(df):
    return sorted(
        repr(tuple(_norm(v) for v in r)) for r in df.collect()
    )


@pytest.mark.parametrize("name", _NAMES)
def test_partition_invariance(spark, sf_dir, name):
    fn = queries()[name]
    old = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "3")
        a = _multiset(fn(spark, sf_dir))
        spark.conf.set("spark.sql.shuffle.partitions", "17")
        b = _multiset(fn(spark, sf_dir))
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)
    assert a == b
    if name not in _MAY_BE_EMPTY:
        assert a, f"{name} returned no rows at the test SF"
