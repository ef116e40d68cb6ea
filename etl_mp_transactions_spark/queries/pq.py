"""Product-quantization registry queries (operators/pq.py): exact
integer PQ encode (codes + distortion) and the ADC top-k scan, both
with full-value DuckDB oracles reproducing the entire pipeline —
md5-rank seed codebooks, subspace argmin with k-asc tiebreak, 4-bit
nibble packing, and LUT-summed asymmetric distances."""

from __future__ import annotations

from pyspark.sql import functions as F  # noqa: F401 (parity imports)

from etl_mp_transactions_spark.operators import pq
from etl_mp_transactions_spark.registry import query
from etl_mp_transactions_spark.sources.tables import load_table

_PQ_CTES = f"""q AS (
      SELECT vec_id,
             list_transform(embedding,
                            x -> CAST(round(x * 1e6) AS BIGINT)) AS qv
      FROM embeddings
    ),
    seeds AS (
      SELECT row_number() OVER (
               ORDER BY md5(vec_id::VARCHAR || '{pq.SEED_TAG}'), vec_id)
             - 1 AS k,
             qv AS cqv
      FROM q
      QUALIFY row_number() OVER (
               ORDER BY md5(vec_id::VARCHAR || '{pq.SEED_TAG}'), vec_id)
              <= {pq.PQ_KS}
    ),
    sub AS (
      SELECT q.vec_id, s.k, mm.m,
             CAST(list_sum(list_transform(
               generate_series(1, {pq.PQ_SUB}),
               j -> (q.qv[mm.m * {pq.PQ_SUB} + j]
                     - s.cqv[mm.m * {pq.PQ_SUB} + j])
                  * (q.qv[mm.m * {pq.PQ_SUB} + j]
                     - s.cqv[mm.m * {pq.PQ_SUB} + j]))) AS BIGINT) AS d2
      FROM q
      CROSS JOIN seeds s
      CROSS JOIN (SELECT unnest(generate_series(0, {pq.PQ_M - 1})) AS m) mm
    ),
    codes AS (
      SELECT vec_id, m, k AS code, d2
      FROM sub
      QUALIFY row_number() OVER (PARTITION BY vec_id, m
                                 ORDER BY d2, k) = 1
    )"""


@query(
    "pq_encode",
    f"""
    WITH {_PQ_CTES}
    SELECT vec_id,
           CAST(sum(CAST(code AS BIGINT) * (CAST(1 AS BIGINT) << (4 * m)))
                AS BIGINT) AS pq_code,
           CAST(sum(d2) AS BIGINT) AS distortion
    FROM codes
    GROUP BY vec_id
    ORDER BY vec_id
    """,
)
def pq_encode(spark, sf_dir):
    """PQ codes for every embedding (operators/pq.py module
    docstring): M={pq.PQ_M} subspaces x KS={pq.PQ_KS} md5-seeded
    codewords, exact BIGINT subspace argmin (k-asc tiebreak),
    little-endian 4-bit nibble packing, per-vector distortion. 64x
    smaller than the raw vectors — the memory path a 100 TB ANN
    deployment actually ships."""
    _, packed = pq.pq_encode(load_table(spark, sf_dir, "embeddings"))
    return packed.orderBy("vec_id")


@query(
    "pq_adc_topk",
    f"""
    WITH {_PQ_CTES},
    qv AS (
      SELECT vec_id AS query_id, qv AS qqv FROM q
      ORDER BY vec_id LIMIT 1
    ),
    lut AS (
      SELECT qv.query_id, s.k AS code, mm.m,
             CAST(list_sum(list_transform(
               generate_series(1, {pq.PQ_SUB}),
               j -> (qv.qqv[mm.m * {pq.PQ_SUB} + j]
                     - s.cqv[mm.m * {pq.PQ_SUB} + j])
                  * (qv.qqv[mm.m * {pq.PQ_SUB} + j]
                     - s.cqv[mm.m * {pq.PQ_SUB} + j]))) AS BIGINT) AS ld2
      FROM qv
      CROSS JOIN seeds s
      CROSS JOIN (SELECT unnest(generate_series(0, {pq.PQ_M - 1})) AS m) mm
    ),
    scored AS (
      SELECT l.query_id, c.vec_id,
             CAST(sum(l.ld2) AS BIGINT) AS adc_d2
      FROM codes c JOIN lut l ON l.m = c.m AND l.code = c.code
      GROUP BY 1, 2
    )
    SELECT query_id, vec_id, adc_d2,
           CAST(row_number() OVER (ORDER BY adc_d2, vec_id) AS BIGINT)
             AS rank
    FROM scored
    ORDER BY adc_d2, vec_id
    LIMIT 10
    """,
)
def pq_adc_topk(spark, sf_dir):
    """ADC top-10 for the deterministic query vector (min vec_id):
    one broadcast M x KS lookup table, a linear scan over the packed
    codes (the original vectors are never touched), exact integer
    approximate distances with (distance, vec_id) tiebreak. The scan
    shape a compressed 100 TB corpus serves queries from."""
    out = pq.pq_adc_topk(load_table(spark, sf_dir, "embeddings"), 10)
    return out.withColumn("rank", F.col("rank").cast("bigint"))
