"""Property pins for queries/segmentation.py and textspans.py beyond
the exact-value oracle: structural invariants that must hold at any
SF (NTILE balance, quartile coverage, span well-formedness)."""

from pyspark.sql import functions as F


def test_equidepth_buckets_balanced(spark, sf_dir):
    from etl_mp_transactions_spark.queries.segmentation import (
        histogram_equidepth,
    )

    rows = histogram_equidepth(spark, sf_dir).collect()
    assert [r.bucket for r in rows] == list(range(1, 11))
    counts = [r.n for r in rows]
    assert max(counts) - min(counts) <= 1  # ANSI NTILE rule
    # boundaries are non-decreasing across buckets
    for a, b in zip(rows, rows[1:]):
        assert a.hi_cents <= b.lo_cents

def test_rfm_quartiles_cover_and_balance(spark, sf_dir):
    from etl_mp_transactions_spark.queries.segmentation import (
        rfm_segmentation,
    )

    df = rfm_segmentation(spark, sf_dir)
    per = (
        df.groupBy("r_score").count().orderBy("r_score").collect()
    )
    assert [r.r_score for r in per] == [1, 2, 3, 4]
    counts = [r["count"] for r in per]
    assert max(counts) - min(counts) <= 1
    assert df.filter(
        (F.col("m_score") < 1) | (F.col("m_score") > 4)
    ).count() == 0


def test_adamic_adar_scores_positive_and_ordered(spark, sf_dir):
    from etl_mp_transactions_spark.queries.segmentation import (
        adamic_adar_linkpred,
    )

    rows = adamic_adar_linkpred(spark, sf_dir).collect()
    assert rows, "expected candidate pairs"
    for r in rows:
        assert r.c1 < r.c2
        assert r.score_nano > 0
        assert r.common_parts >= 1
    scores = [r.score_nano for r in rows]
    assert scores == sorted(scores, reverse=True)


def test_duplicate_spans_wellformed(spark, sf_dir):
    from etl_mp_transactions_spark.queries.textspans import (
        duplicate_ngram_spans,
        NGRAM,
    )

    rows = duplicate_ngram_spans(spark, sf_dir).collect()
    assert rows, "expected duplicated spans in the synthetic corpus"
    for r in rows:
        # each span covers at least one full n-gram and spans never
        # exceed the document
        assert r.dup_tokens >= NGRAM
        assert r.dup_tokens <= r.n_tokens
        assert 0 < r.dup_ppm <= 1_000_000
        assert r.dup_spans >= 1


def test_percentile_bands_bracket_and_order(spark, sf_dir):
    from etl_mp_transactions_spark.queries.sampling2 import (
        percentile_latency_bands,
    )

    rows = percentile_latency_bands(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.p50_days <= r.p90_days <= r.p99_days
        assert r.n > 0


def test_weighted_sample_prefers_heavy_orders(spark, sf_dir):
    import duckdb

    from etl_mp_transactions_spark.queries.sampling2 import (
        weighted_sample_ares,
        SAMPLE_K,
    )

    rows = weighted_sample_ares(spark, sf_dir).collect()
    assert len(rows) == min(
        SAMPLE_K,
        duckdb.connect()
        .execute(f"SELECT count(*) FROM '{sf_dir}/orders.parquet'")
        .fetchone()[0],
    )
    con = duckdb.connect()
    mean_all = con.execute(
        f"SELECT avg(o_totalprice) FROM '{sf_dir}/orders.parquet'"
    ).fetchone()[0]
    con.close()
    mean_sample = sum(r.weight_cents for r in rows) / len(rows) / 100.0
    # weighted sampling must pull the sample mean above the
    # population mean (weights ARE the values; deterministic hashes)
    assert mean_sample > mean_all
