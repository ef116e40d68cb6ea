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
