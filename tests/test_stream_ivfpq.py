"""Streaming IVF-PQ ingest (r19): the stream==batch pin as a local
test — the final streamed index must equal the batch
ivfpq_incremental_encode output bit for bit (same frozen books, same
arriving slice; the replay file in the registry query's construction
must contribute zero) — plus rerun determinism across fresh
workdirs/checkpoints."""

from etl_mp_transactions_spark.registry import queries


def _rows(df):
    return sorted(
        (r["vec_id"], r["cid"], r["pq_code"], r["distortion"])
        for r in df.collect()
    )


def test_stream_equals_batch(spark, sf_dir):
    stream = _rows(queries()["r19_stream_ivfpq_ingest"](spark, sf_dir))
    batch = _rows(queries()["ivfpq_incremental_encode"](spark, sf_dir))
    assert stream == batch and len(stream) > 0
    # replay contributed zero: one index row per arriving vector
    assert len({v for v, *_ in stream}) == len(stream)


def test_rerun_is_deterministic(spark, sf_dir):
    fn = queries()["r19_stream_ivfpq_ingest"]
    assert _rows(fn(spark, sf_dir)) == _rows(fn(spark, sf_dir))


def _served(df):
    return sorted(
        (r["query_id"], r["vec_id"], r["exact_d2"], r["rank"])
        for r in df.collect()
    )


def test_stream_rerank_equals_batch(spark, sf_dir):
    """r21 (16th stream==batch pin): the streamed refined serving
    result must equal the batch ivfpq_rerank_topk bit for bit, with
    the replay file contributing zero (exactly 5 rows per query)."""
    stream = _served(queries()["r21_stream_rerank_serving"](spark, sf_dir))
    batch = _served(queries()["ivfpq_rerank_topk"](spark, sf_dir))
    assert stream == batch and len(stream) > 0
    from collections import Counter

    per_q = Counter(q for q, *_ in stream)
    assert set(per_q.values()) == {5}


def test_stream_rerank_rerun_is_deterministic(spark, sf_dir):
    fn = queries()["r21_stream_rerank_serving"]
    assert _served(fn(spark, sf_dir)) == _served(fn(spark, sf_dir))


def _fused_rows(df):
    return sorted(
        (
            r["query_id"],
            r["doc_id"],
            r["r_lex"],
            r["r_sem"],
            r["rrf_nano"],
            r["fused_rank"],
        )
        for r in df.collect()
    )


def test_stream_hybrid_equals_batch(spark, sf_dir):
    """r23 (18th stream==batch pin): the streamed hybrid serving
    result must equal the batch hybrid_rrf_fusion bit for bit, with
    the replay file contributing zero (each query served exactly
    once: fused ranks unique per query)."""
    stream = _fused_rows(
        queries()["r23_stream_hybrid_serving"](spark, sf_dir)
    )
    batch = _fused_rows(queries()["hybrid_rrf_fusion"](spark, sf_dir))
    assert stream == batch and len(stream) > 0
    seen = set()
    for q, _, _, _, _, fr in stream:
        assert (q, fr) not in seen, "replay double-served a query"
        seen.add((q, fr))
