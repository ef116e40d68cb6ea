"""IVF-PQ registry queries (operators/ivfpq.py): the composite
coarse-list + residual-PQ index — exact-integer encode (list id,
packed code, distortion) and the nprobe-probed ADC top-k scan —
each with a full-value DuckDB oracle reproducing the entire
pipeline: md5-rank coarse seeds, argmin list assignment, residual
codebooks, subspace argmin encode, per-list query LUTs, probed
code-scan sum."""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from etl_mp_transactions_spark.operators import ivfpq
from etl_mp_transactions_spark.operators.pq import PQ_KS, PQ_M, PQ_SUB
from etl_mp_transactions_spark.registry import query
from etl_mp_transactions_spark.sources.tables import load_table

_DIM = PQ_M * PQ_SUB


def materialize_ctes(sql: str) -> str:
    """Force DuckDB to evaluate every CTE in ``sql`` once. DuckDB
    (1.0) inlines a CTE at EVERY reference site; the IVF-PQ chains
    reference each stage (books, residuals, codes, ground truth)
    several times, and the Lloyd-trained variants nest generations,
    so inlining replays the whole pipeline per reference —
    exponentially for the unrolled training loop (the sf0.1 gate's
    dominant cost, VERDICT r10 task #3). ``AS MATERIALIZED`` is
    semantically neutral; the rewrite is textual and safe here
    because in these generated statements ` AS (` only ever opens a
    CTE body (derived tables are aliased without AS, and window /
    function syntax never matches ` AS (`). Idempotent. Guarded
    (ADVICE r11): every rewrite site must look like a top-level CTE
    head — ``WITH name AS (`` or ``, name AS (`` (optionally with a
    column list) — so a future ``WINDOW w AS (...)`` or other
    non-CTE ` AS (` construct fails loudly instead of being silently
    rewritten into invalid SQL."""
    for m in _AS_PAREN.finditer(sql):
        head = sql[max(0, m.start() - 160) : m.end()]
        if not _CTE_HEAD.search(head):
            raise AssertionError(
                "materialize_ctes: non-CTE ' AS (' at offset"
                f" {m.start()}: ...{head[-80:]!r}"
            )
    return sql.replace(" AS (", " AS MATERIALIZED (")


_AS_PAREN = re.compile(r" AS \(")
# a CTE head: WITH/comma, identifier, optional (col, ...) list
_CTE_HEAD = re.compile(
    r"(?:\bWITH\b|,)\s*[A-Za-z_][A-Za-z0-9_]*\s*(?:\([^()]*\))?\s+AS \(\Z"
)


def _ivfpq_ctes(base_pred: str = "TRUE", target_pred: str = "TRUE") -> str:
    """The full IVF-PQ pipeline as DuckDB CTEs, parametrized by which
    vectors FIT the codebooks (``base_pred``) and which are ENCODED
    (``target_pred``). The flagship queries use TRUE/TRUE (fit on
    everything, encode everything); the incremental-ingest query fits
    on the base slice and encodes only the arriving slice against
    those frozen books."""
    return f"""q AS (
      SELECT vec_id,
             list_transform(embedding,
                            x -> CAST(round(x * 1e6) AS BIGINT)) AS qv
      FROM embeddings
    ),
    qb AS (SELECT * FROM q WHERE {base_pred}),
    qt AS (SELECT * FROM q WHERE {target_pred}),
    cb AS (
      SELECT row_number() OVER (
               ORDER BY md5(vec_id::VARCHAR || '{ivfpq.COARSE_TAG}'),
                        vec_id) - 1 AS c,
             qv AS ccqv
      FROM qb
      QUALIFY row_number() OVER (
               ORDER BY md5(vec_id::VARCHAR || '{ivfpq.COARSE_TAG}'),
                        vec_id) <= {ivfpq.IVFPQ_KC}
    ),
    asgb AS (
      SELECT vec_id, c AS cid, ccqv FROM (
        SELECT qb.vec_id, cb.c, cb.ccqv,
               CAST(list_sum(list_transform(
                 generate_series(1, {_DIM}),
                 j -> (qb.qv[j] - cb.ccqv[j])
                    * (qb.qv[j] - cb.ccqv[j]))) AS BIGINT) AS cd2
        FROM qb CROSS JOIN cb
        QUALIFY row_number() OVER (PARTITION BY qb.vec_id
                                   ORDER BY cd2, cb.c) = 1
      )
    ),
    rvb AS (
      SELECT a.vec_id, a.cid,
             list_transform(generate_series(1, {_DIM}),
                            j -> qb.qv[j] - a.ccqv[j]) AS rqv
      FROM asgb a JOIN qb USING (vec_id)
    ),
    pb AS (
      SELECT row_number() OVER (
               ORDER BY md5(vec_id::VARCHAR || '{ivfpq.RESID_TAG}'),
                        vec_id) - 1 AS k,
             rqv AS pcqv
      FROM rvb
      QUALIFY row_number() OVER (
               ORDER BY md5(vec_id::VARCHAR || '{ivfpq.RESID_TAG}'),
                        vec_id) <= {PQ_KS}
    ),
    asg AS (
      SELECT vec_id, c AS cid, ccqv FROM (
        SELECT qt.vec_id, cb.c, cb.ccqv,
               CAST(list_sum(list_transform(
                 generate_series(1, {_DIM}),
                 j -> (qt.qv[j] - cb.ccqv[j])
                    * (qt.qv[j] - cb.ccqv[j]))) AS BIGINT) AS cd2
        FROM qt CROSS JOIN cb
        QUALIFY row_number() OVER (PARTITION BY qt.vec_id
                                   ORDER BY cd2, cb.c) = 1
      )
    ),
    rv AS (
      SELECT a.vec_id, a.cid,
             list_transform(generate_series(1, {_DIM}),
                            j -> qt.qv[j] - a.ccqv[j]) AS rqv
      FROM asg a JOIN qt USING (vec_id)
    ),
    sub AS (
      SELECT rv.vec_id, rv.cid, pb.k, mm.m,
             CAST(list_sum(list_transform(
               generate_series(1, {PQ_SUB}),
               j -> (rv.rqv[mm.m * {PQ_SUB} + j]
                     - pb.pcqv[mm.m * {PQ_SUB} + j])
                  * (rv.rqv[mm.m * {PQ_SUB} + j]
                     - pb.pcqv[mm.m * {PQ_SUB} + j]))) AS BIGINT) AS d2
      FROM rv CROSS JOIN pb
      CROSS JOIN (SELECT unnest(generate_series(0, {PQ_M - 1})) AS m) mm
    ),
    codes AS (
      SELECT vec_id, cid, m, k AS code, d2
      FROM sub
      QUALIFY row_number() OVER (PARTITION BY vec_id, m
                                 ORDER BY d2, k) = 1
    )"""


_IVFPQ_CTES = _ivfpq_ctes()

# incremental ingest split: the base slice fits the codebooks, the
# arriving slice (1 in 8 by vec_id) encodes against them frozen
_BASE_PRED = "vec_id % 8 <> 0"
_ARRIVING_PRED = "vec_id % 8 = 0"


@query(
    "ivfpq_encode",
    materialize_ctes(f"""
    WITH {_IVFPQ_CTES}
    SELECT vec_id,
           CAST(any_value(cid) AS BIGINT) AS cid,
           CAST(sum(CAST(code AS BIGINT) * (CAST(1 AS BIGINT) << (4 * m)))
                AS BIGINT) AS pq_code,
           CAST(sum(d2) AS BIGINT) AS distortion
    FROM codes
    GROUP BY vec_id
    ORDER BY vec_id
    """),
)
def ivfpq_encode(spark, sf_dir):
    """IVF-PQ encode of every embedding (operators/ivfpq.py module
    docstring): exact-integer coarse assignment into KC={ivfpq.IVFPQ_KC}
    inverted lists, residual PQ codes (M={PQ_M} x KS={PQ_KS}, shared
    codebook, k-asc tiebreak), nibble-packed word + distortion. The
    (list id, 32-bit code) pair is the ENTIRE per-vector state a
    100 TB ANN deployment keeps hot."""
    _, packed = ivfpq.ivfpq_encode(load_table(spark, sf_dir, "embeddings"))
    return packed.select(
        "vec_id",
        F.col("cid").cast("long").alias("cid"),
        "pq_code",
        "distortion",
    ).orderBy("vec_id")


@query(
    "ivfpq_adc_topk",
    materialize_ctes(f"""
    WITH {_IVFPQ_CTES},
    qv1 AS (
      SELECT vec_id AS query_id, qv AS qqv FROM q
      ORDER BY vec_id LIMIT 1
    ),
    probe AS (
      SELECT query_id, c AS cid, qqv, ccqv FROM (
        SELECT qv1.query_id, cb.c, qv1.qqv, cb.ccqv,
               CAST(list_sum(list_transform(
                 generate_series(1, {_DIM}),
                 j -> (qv1.qqv[j] - cb.ccqv[j])
                    * (qv1.qqv[j] - cb.ccqv[j]))) AS BIGINT) AS cd2
        FROM qv1 CROSS JOIN cb
        QUALIFY row_number() OVER (PARTITION BY qv1.query_id
                                   ORDER BY cd2, cb.c)
                <= {ivfpq.IVFPQ_NPROBE}
      )
    ),
    lut AS (
      SELECT p.query_id, p.cid, pb.k AS code, mm.m,
             CAST(list_sum(list_transform(
               generate_series(1, {PQ_SUB}),
               j -> ((p.qqv[mm.m * {PQ_SUB} + j]
                      - p.ccqv[mm.m * {PQ_SUB} + j])
                     - pb.pcqv[mm.m * {PQ_SUB} + j])
                  * ((p.qqv[mm.m * {PQ_SUB} + j]
                      - p.ccqv[mm.m * {PQ_SUB} + j])
                     - pb.pcqv[mm.m * {PQ_SUB} + j]))) AS BIGINT) AS ld2
      FROM probe p CROSS JOIN pb
      CROSS JOIN (SELECT unnest(generate_series(0, {PQ_M - 1})) AS m) mm
    ),
    scored AS (
      SELECT l.query_id, c.vec_id, c.cid,
             CAST(sum(l.ld2) AS BIGINT) AS adc_d2
      FROM codes c
      JOIN lut l ON l.cid = c.cid AND l.m = c.m AND l.code = c.code
      GROUP BY 1, 2, 3
    )
    SELECT query_id, vec_id, CAST(cid AS BIGINT) AS cid, adc_d2,
           CAST(row_number() OVER (ORDER BY adc_d2, vec_id) AS BIGINT)
             AS rank
    FROM scored
    ORDER BY adc_d2, vec_id
    LIMIT 10
    """),
)
def ivfpq_adc_topk(spark, sf_dir):
    """ADC top-10 for the deterministic query vector (min vec_id)
    over its {ivfpq.IVFPQ_NPROBE} nearest inverted lists: one
    broadcast nprobe x M x KS lookup table of per-list residual
    subspace distances, a hash-join scan of ONLY the probed lists'
    packed codes, exact integer distances with (distance, vec_id)
    tiebreak. Vectors outside the probed lists are never read — the
    n*nprobe/KC query cost that makes 100 TB similarity serving
    tractable."""
    out = ivfpq.ivfpq_adc_topk(load_table(spark, sf_dir, "embeddings"), 10)
    return out


@query(
    "ivfpq_incremental_encode",
    materialize_ctes(f"""
    WITH {_ivfpq_ctes(_BASE_PRED, _ARRIVING_PRED)}
    SELECT vec_id,
           CAST(any_value(cid) AS BIGINT) AS cid,
           CAST(sum(CAST(code AS BIGINT) * (CAST(1 AS BIGINT) << (4 * m)))
                AS BIGINT) AS pq_code,
           CAST(sum(d2) AS BIGINT) AS distortion
    FROM codes
    GROUP BY vec_id
    ORDER BY vec_id
    """),
)
def ivfpq_incremental_encode(spark, sf_dir):
    """Incremental IVF-PQ ingest (operators/ivfpq.py
    encode_against_books): codebooks are fitted on the base slice
    ({_BASE_PRED}) and FROZEN; the arriving slice ({_ARRIVING_PRED})
    encodes against them — per-batch work is |batch| x (KC + KS)
    regardless of corpus size and no previously assigned code ever
    changes, which is how a production ANN index actually ingests
    (the dedup_incremental_new_vs_old pattern applied to the vector
    index). Output: packed codes of the arriving batch only."""
    emb = load_table(spark, sf_dir, "embeddings")
    base = emb.filter(F.expr(_BASE_PRED))
    arriving = emb.filter(F.expr(_ARRIVING_PRED))
    cb = ivfpq.coarse_books(base)
    pb = ivfpq.residual_books(ivfpq.coarse_assign(base, cb))
    _, packed = ivfpq.encode_against_books(arriving, cb, pb)
    return packed.select(
        "vec_id",
        F.col("cid").cast("long").alias("cid"),
        "pq_code",
        "distortion",
    ).orderBy("vec_id")


@query(
    "ivfpq_adc_batch",
    materialize_ctes(f"""
    WITH {_IVFPQ_CTES},
    qset AS (
      SELECT vec_id AS query_id, qv AS qqv FROM (
        SELECT vec_id, qv,
               md5(vec_id::VARCHAR || '{ivfpq.QUERY_TAG}') AS sk
        FROM q
      )
      QUALIFY row_number() OVER (ORDER BY sk, vec_id)
              <= {ivfpq.IVFPQ_QBATCH}
    ),
    probe AS (
      SELECT query_id, c AS cid, qqv, ccqv FROM (
        SELECT qs.query_id, cb.c, qs.qqv, cb.ccqv,
               CAST(list_sum(list_transform(
                 generate_series(1, {_DIM}),
                 j -> (qs.qqv[j] - cb.ccqv[j])
                    * (qs.qqv[j] - cb.ccqv[j]))) AS BIGINT) AS cd2
        FROM qset qs CROSS JOIN cb
        QUALIFY row_number() OVER (PARTITION BY qs.query_id
                                   ORDER BY cd2, cb.c)
                <= {ivfpq.IVFPQ_NPROBE}
      )
    ),
    lut AS (
      SELECT p.query_id, p.cid, pb.k AS code, mm.m,
             CAST(list_sum(list_transform(
               generate_series(1, {PQ_SUB}),
               j -> ((p.qqv[mm.m * {PQ_SUB} + j]
                      - p.ccqv[mm.m * {PQ_SUB} + j])
                     - pb.pcqv[mm.m * {PQ_SUB} + j])
                  * ((p.qqv[mm.m * {PQ_SUB} + j]
                      - p.ccqv[mm.m * {PQ_SUB} + j])
                     - pb.pcqv[mm.m * {PQ_SUB} + j]))) AS BIGINT) AS ld2
      FROM probe p CROSS JOIN pb
      CROSS JOIN (SELECT unnest(generate_series(0, {PQ_M - 1})) AS m) mm
    ),
    scored AS (
      SELECT l.query_id, c.vec_id,
             CAST(sum(l.ld2) AS BIGINT) AS adc_d2
      FROM codes c
      JOIN lut l ON l.cid = c.cid AND l.m = c.m AND l.code = c.code
      GROUP BY 1, 2
    )
    SELECT query_id, vec_id, adc_d2,
           CAST(rank AS BIGINT) AS rank
    FROM (SELECT query_id, vec_id, adc_d2,
                 row_number() OVER (PARTITION BY query_id
                                    ORDER BY adc_d2, vec_id) AS rank
          FROM scored)
    WHERE rank <= 5
    ORDER BY query_id, rank
    """),
)
def ivfpq_adc_batch(spark, sf_dir):
    """Batched ADC serving (operators/ivfpq.py ivfpq_adc_batch): a
    deterministic {ivfpq.IVFPQ_QBATCH}-query batch each searches its
    {ivfpq.IVFPQ_NPROBE} nearest inverted lists, per-query exact
    integer top-5. The combined lookup table is bounded by the BATCH
    (batch x nprobe x M x KS rows), so it broadcasts and the scan is
    one map-side hash join over the probed lists' codes — per-batch
    work ∝ corpus x nprobe/KC at any corpus size, the production
    serving shape (queries arrive in bounded batches; the quadratic
    'every vector queries every list' is exactly what this avoids)."""
    return ivfpq.ivfpq_adc_batch(load_table(spark, sf_dir, "embeddings"), 5)
