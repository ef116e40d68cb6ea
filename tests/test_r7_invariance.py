"""Blanket partition-count invariance for every round-7 registry
query: identical results under 3 vs 17 shuffle partitions at
sf0.001 (same contract as tests/test_r5b/r6_invariance.py — the
determinism class the single-partitioning oracle can't see).

r16 (streaming) is excluded — it runs a real checkpointed stream and
is pinned by its stream==batch oracle (the r11/r14 precedent). The
distranks-backed queries (rfm, histogram, percentiles, vocab
coverage, curriculum) are the interesting members: their two-phase
range ranks must not depend on the ambient shuffle-partition
setting, including the round-7 cross-branch-consistency fix."""

import math

import pytest

from etl_mp_transactions_spark.registry import queries

R7_QUERIES = [
    "rfm_segmentation",
    "histogram_equidepth",
    "percentile_latency_bands",
    "pareto_concentration",
    "vocab_coverage",
    "exact_global_percentiles",
    "curriculum_interleave",
    "doremi_domain_reweight",
    "s12_csv_quarantine",
    "k1_silver_roundtrip",
    "k1_compaction_roundtrip",
    "k1_schema_evolution_roundtrip",
    "k2_bus_roundtrip",
    "hard_negative_mining",
    "ndcg_ranking_eval",
    "dedup_incremental_new_vs_old",
    "attribution_position_based",
    "quantile_sketch_merge",
    "text_rake_keywords",
    "corpus_datacard",
    "dedup_containment_nearsubset",
]


def _norm(v):
    if isinstance(v, float):
        return math.nan if math.isnan(v) else round(v, 12)
    return v


def _multiset(df):
    rows = [tuple(_norm(v) for v in r) for r in df.collect()]
    return sorted(map(repr, rows))


@pytest.mark.parametrize("name", R7_QUERIES)
def test_partition_invariance_r7(spark, sf_dir, name):
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
    assert a, f"{name} returned no rows at the test SF"
