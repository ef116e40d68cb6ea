"""Semantic invariants for the retrieval + analytics2 registry
queries — properties the oracle's value-equality can't express
(monotonicity, probability mass, estimator consistency)."""

import math

from pyspark.sql import functions as F


def test_vocab_coverage_monotone(spark, sf_dir):
    from etl_mp_transactions_spark.queries.retrieval import vocab_coverage

    rows = sorted(
        vocab_coverage(spark, sf_dir).collect(), key=lambda r: r.k
    )
    assert rows, "coverage curve must be non-empty"
    covs = [r.coverage_ppm for r in rows]
    assert all(b >= a for a, b in zip(covs, covs[1:]))
    # the full-vocabulary row always present, with coverage exactly 1
    assert rows[-1].k == rows[-1].vocab_size
    assert covs[-1] == 1_000_000
    assert all(0 < c <= 1_000_000 for c in covs)


def test_markov_rows_are_distributions(spark, sf_dir):
    from etl_mp_transactions_spark.queries.analytics2 import (
        markov_transitions,
    )

    out = (
        markov_transitions(spark, sf_dir)
        .groupBy("prev_type")
        .agg(
            F.sum("p_next_ppm").alias("mass_ppm"),
            F.sum("n").alias("n"),
            F.count("*").alias("k"),
        )
        .collect()
    )
    assert out
    for r in out:
        # each row's ppm share is floor-truncated, so the mass sums to
        # 1e6 minus at most one ppm per sibling row
        assert 1_000_000 - r.k < r.mass_ppm <= 1_000_000, r
        assert r.n > 0


def test_bm25_scores_positive_and_sorted(spark, sf_dir):
    from etl_mp_transactions_spark.queries.retrieval import bm25_scoring

    rows = bm25_scoring(spark, sf_dir).collect()
    assert 0 < len(rows) <= 20
    scores = [r.bm25_nano for r in rows]
    assert all(s > 0 for s in scores)
    assert scores == sorted(scores, reverse=True)


def test_bpe_merge_counts_match_manual(spark):
    """Handcrafted corpus: pair counts weighted by word frequency.
    'aa aa ab' → words {aa:2, ab:1}; pairs: (a,a)=2, (a,b)=1."""
    from etl_mp_transactions_spark.queries import analytics2  # noqa: F401
    from etl_mp_transactions_spark.registry import queries

    import tempfile, os

    with tempfile.TemporaryDirectory() as d:
        docs = spark.createDataFrame(
            [(1, "aa aa ab", "en", "t", 8)],
            "doc_id long, text string, lang string, source string,"
            " n_chars long",
        )
        docs.write.parquet(os.path.join(d, "documents.parquet"))
        out = {
            (r.a, r.b): r.n
            for r in queries()["bpe_merge_step"](spark, d).collect()
        }
    assert out == {("a", "a"): 2, ("a", "b"): 1}


def test_seasonal_decompose_residuals_sum_small(spark, sf_dir):
    """Residuals of a centered MA must roughly cancel: the corpus-wide
    mean residual is orders of magnitude below the mean daily value."""
    from etl_mp_transactions_spark.queries.analytics2 import (
        seasonal_decompose,
    )

    rows = seasonal_decompose(spark, sf_dir).collect()
    assert len(rows) == 7
    total_days = sum(r.n_days for r in rows)
    mean_resid = (
        sum(r.avg_residual_microcents * r.n_days for r in rows) / total_days
    )
    mean_value = sum(r.avg_microcents * r.n_days for r in rows) / total_days
    assert abs(mean_resid) < 0.05 * mean_value
