"""Blanket partition-count invariance for every r5b registry query:
identical results under 3 vs 17 shuffle partitions at sf0.001.

This is the determinism class the oracle can't see (it runs one
partitioning): order-dependent float accumulation, rank ties broken
by physical row order, first/last semantics leaking partition layout.
seasonal_decompose failed exactly this way before its integer
reformulation — this sweep pins the whole batch."""

import math

import pytest

from etl_mp_transactions_spark.registry import queries

R5B_QUERIES = [
    "bm25_scoring",
    "pmi_collocations",
    "vocab_coverage",
    "graph_triangle_count",
    "bfs_shortest_path",
    "markov_transitions",
    "seasonal_decompose",
    "bpe_merge_step",
    "setsim_prefix_join",
    "ohlc_bars",
    "cdc_merge_apply",
    "woe_information_value",
    "skyline_frontier",
    "association_rules",
    "random_projection_jl",
    "attribution_last_touch",
    "graph_modularity",
    "ab_test_zscores",
    "time_decay_scores",
    "target_encoding",
    "key_skew_report",
    "kcore_decomposition",
    "event_trigram_paths",
    "conversion_latency",
    "population_stability_index",
    "benford_audit",
]


def _norm(v):
    if isinstance(v, float):
        return math.nan if math.isnan(v) else round(v, 12)
    return v


def _multiset(df):
    rows = [tuple(_norm(v) for v in r) for r in df.collect()]
    return sorted(map(repr, rows))


@pytest.mark.parametrize("name", R5B_QUERIES)
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
    # at sf0.001 the DOULION-sampled supplier graph keeps ~2 edges, so
    # its 2-core is legitimately empty — the invariance check above
    # still ran; everything else must produce rows
    if name != "kcore_decomposition":
        assert a, f"{name} returned no rows at the test SF"
