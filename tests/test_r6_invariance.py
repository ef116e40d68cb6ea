"""Blanket partition-count invariance for every round-6 registry
query: identical results under 3 vs 17 shuffle partitions at
sf0.001 (same contract as tests/test_r5b_invariance.py — the
determinism class the single-partitioning oracle can't see).

Streaming entries (r14/r15) are excluded: they run real streams with
checkpoints and are pinned by their stream==batch oracles instead
(the r11 precedent). global_sequence_ids is INCLUDED even though it
repartitions by range internally — global ids must not depend on the
ambient shuffle-partition setting."""

import math

import pytest

from etl_mp_transactions_spark.registry import queries

R6_QUERIES = [
    "item_cooccurrence_topk",
    "als_user_half_step",
    "crossval_fold_encoding",
    "gini_best_split",
    "naive_bayes_confusion",
    "kmeans_lloyd_step",
    "sif_embedding",
    "gram_matrix",
    "holt_linear_forecast",
    "dbscan_clusters",
    "bpe_encode_tokens",
    "fifo_cost_matching",
    "pvm_decomposition",
    "backtest_naive_mae",
    "bitmask_user_journeys",
    "global_sequence_ids",
    "s10_gzip_jsonl_scan",
    "kaplan_meier_survival",
    "erasure_cascade_audit",
    "retention_policy_sweep",
    "symspell_correction",
    "poisson_bootstrap_ci",
    "point_in_polygon_join",
    "impute_missing_values",
    "winsorize_amounts",
    "logistic_newton_steps",
    "hash_chain_audit",
    "golden_record_survivorship",
    "lm_perplexity_heldout",
    "conformal_prediction_interval",
    "multimodal_wht_spectrum",
    "s11_xml_scan",
    "isotonic_calibration",
]


def _norm(v):
    if isinstance(v, float):
        return math.nan if math.isnan(v) else round(v, 12)
    return v


def _multiset(df):
    rows = [tuple(_norm(v) for v in r) for r in df.collect()]
    return sorted(map(repr, rows))


@pytest.mark.parametrize("name", R6_QUERIES)
def test_partition_invariance_r6(spark, sf_dir, name):
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
    # kaplan_meier can be empty only if every customer is censored,
    # which the orders-based tenure definition rules out at all SFs;
    # everything in the batch must produce rows
    assert a, f"{name} returned no rows at the test SF"
