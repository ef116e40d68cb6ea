"""Dimensionality reduction for the embedding column: deterministic
Johnson–Lindenstrauss random projection (Achlioptas database-friendly
±1 matrix — public construction), 64 → 16 dims.

The projection matrix is derived once at import from md5(j:i) parity
(no RNG, no state: the same Python constant is inlined into BOTH the
Spark expression and the DuckDB oracle SQL, so the gate checks every
projected coordinate bit-for-bit). Each output coordinate is a
sum over the 64 input dims — exact BIGINT after the single per-
coordinate quantization, so accumulation order is free. Each engine
gets the representation it executes well: Spark hoists the quantized
array once per row and unrolls the ±1 add chain in codegen; the
oracle unrolls the whole chain textually (DuckDB's lambda fold was
10× slower). The 1/√16 scale is a power of two (exact).

Scale shape: map-only — zero shuffles, zero Python; 16 fused
expression trees per row inside whole-stage codegen. The matrix is a
compile-time literal, not a joined table, so at 100 TB this runs at
scan speed (the right way to project billions of embeddings; a
joined/broadcast matrix would add an exchange for no reason at k·d =
1024 constants).

tests/test_embeddings2.py checks the JL property itself: projected
pairwise distances concentrate around the originals.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from etl_mp_transactions_spark.functions.bigratio import scaled_div_sql
from etl_mp_transactions_spark.queries.ivfpq_q import materialize_ctes
from etl_mp_transactions_spark.registry import query
from etl_mp_transactions_spark.sources.tables import load_table

IN_DIM = 64
OUT_DIM = 16


def _sign(j: int, i: int) -> int:
    """±1 from md5 parity — identical constant in both engines."""
    h = hashlib.md5(f"{j}:{i}".encode()).hexdigest()
    return 1 if int(h[:2], 16) % 2 == 0 else -1


SIGNS = [[_sign(j, i) for i in range(IN_DIM)] for j in range(OUT_DIM)]


def _oracle_sql() -> str:
    # unrolled left-associated chain: ((t1 + t2) + t3) + … is the
    # identical fold order in both engines' parsers, and vectorizes
    # (a lambda list_reduce was 10× slower on the DuckDB side)
    dims = []
    for j in range(OUT_DIM):
        chain = " + ".join(
            f"({s} * CAST(round(embedding[{i + 1}]::DOUBLE * 1e6)"
            f" AS BIGINT))"
            for i, s in enumerate(SIGNS[j])
        )
        # /4 in micro units == *250 in nano units — exact integer
        dims.append(f"(({chain}) * 250) AS y{j}_nano")
    cols = ",\n           ".join(dims)
    return f"""
    SELECT vec_id, label,
           {cols}
    FROM embeddings
    """


@query("random_projection_jl", _oracle_sql())
def random_projection_jl(spark, sf_dir):
    """Project every embedding through the fixed ±1 JL matrix; output
    one row per vector with the 16 projected coordinates (wide form —
    the shape the downstream ANN/cluster steps consume)."""
    emb = load_table(spark, sf_dir, "embeddings")
    # r15 float purge: quantize each coordinate to exact micro ints
    # FIRST (tie-safe single-op round), then the ±1 fold is an exact
    # BIGINT sum in any order; /4 in micro == *250 in nano, exact.
    #
    # r15 perf (guide §1.2 per-task work): quantize the 64 coordinates
    # ONCE per row into an intermediate array column — the 16 output
    # dims then just index it with inlined ±1 signs. The naive layout
    # re-evaluated round(embedding[i]*1e6) inside every output dim
    # (1024 round+cast ops per row where 64 suffice); the hoisted
    # array is referenced 16×, which stops CollapseProject from
    # inlining it back, so codegen evaluates the transform() exactly
    # once per row. Integer sums are order-free, so the unrolled add
    # chain stays bit-identical to the oracle's.
    q = emb.select(
        "vec_id",
        "label",
        F.expr(
            "transform(embedding,"
            " x -> CAST(round(CAST(x AS DOUBLE) * 1e6) AS BIGINT))"
        ).alias("_q"),
    )
    cols = [F.col("vec_id"), F.col("label")]
    for j in range(OUT_DIM):
        y = None
        for i, s in enumerate(SIGNS[j]):
            t = F.element_at(F.col("_q"), i + 1)
            t = t if s == 1 else -t
            y = t if y is None else y + t
        cols.append((y * F.lit(250)).alias(f"y{j}_nano"))
    return q.select(*cols)


@query(
    "sif_embedding",
    materialize_ctes(f"""
    WITH tok AS (
      SELECT doc_id, u.w
      FROM documents, unnest(string_split(text, ' ')) AS u(w)
      WHERE u.w <> ''
    ),
    cw AS (SELECT w, count(*) AS c_w FROM tok GROUP BY 1),
    tt AS (SELECT count(*) AS t FROM tok),
    wt AS (
      SELECT w, {scaled_div_sql("t", "(t + 1000 * c_w)", 10**9, "duck")}
               AS nw
      FROM cw CROSS JOIN tt
    ),
    dt AS (SELECT doc_id, w, count(*) AS cnt FROM tok GROUP BY 1, 2)
    SELECT dt.doc_id, CAST(u.k AS INTEGER) AS dim,
           CAST(sum(dt.cnt * wt.nw *
                    CASE WHEN substr(md5(dt.w || '|' || u.k::VARCHAR), 1, 1)
                         IN ('0','1','2','3','4','5','6','7')
                         THEN 1 ELSE -1 END) AS BIGINT) AS comp
    FROM dt
    JOIN wt ON wt.w = dt.w,
    unnest(generate_series(0, 7)) AS u(k)
    GROUP BY 1, 2
    ORDER BY 1, 2
    """),
)
def sif_embedding(spark, sf_dir):
    """SIF-style document embeddings computed entirely in-engine
    (Arora et al. 2017, "A simple but tough-to-beat baseline for
    sentence embeddings", ICLR — public): each word gets a
    deterministic 8-dim ±1 hash vector (sign = first md5 hex digit
    of 'word|dim') and an inverse-frequency weight a/(a + p_w) with
    a = 1e-3, expressed as aT/(aT + c_w) and rounded once to integer
    nano-units; the document vector is the exact BIGINT sum of
    cnt·weight·sign per dimension — order-free, no float
    accumulation.

    Scale: token counts are two uniform-key shuffles; the
    vocabulary-sized weight table joins on the uniform token key —
    NEVER broadcast (the ngram_lm_quality lesson, ADVICE r5); the
    8-dim explosion is a constant fan-out before the final groupBy.
    Cites the reference's TF-IDF weighting surface (src/ai.py:21-25)
    as the ancestor of in-engine text weighting."""
    docs = load_table(spark, sf_dir, "documents")
    tok = (
        docs.select(
            "doc_id", F.explode(F.split(F.col("text"), " ")).alias("w")
        )
        .filter(F.col("w") != "")
    )
    cw = tok.groupBy("w").agg(F.count("*").alias("c_w"))
    tt = tok.agg(F.count("*").alias("t"))
    # a/(a+p_w) = t/(t + 1000·c_w): exact trunc nano via the bigratio
    # limb kernel (r15 float purge; ceiling t + 1000·c_w < 1e14,
    # PORTABILITY.md)
    wt = cw.crossJoin(F.broadcast(tt)).select(
        "w",
        F.expr(
            scaled_div_sql("t", "(t + 1000 * c_w)", 10**9, "spark")
        ).alias("nw"),
    )
    dt = tok.groupBy("doc_id", "w").agg(F.count("*").alias("cnt"))
    sign = F.when(
        F.substring(
            F.md5(F.concat(F.col("w"), F.lit("|"), F.col("k").cast("string"))),
            1, 1,
        ).isin(*"01234567"),
        1,
    ).otherwise(-1)
    return (
        dt.join(wt, "w")
        .select(
            "doc_id", "cnt", "nw", "w",
            F.explode(F.sequence(F.lit(0), F.lit(7))).alias("k"),
        )
        .groupBy("doc_id", F.col("k").cast("int").alias("dim"))
        .agg(
            F.sum(F.col("cnt") * F.col("nw") * sign).cast("bigint").alias("comp")
        )
        .orderBy("doc_id", "dim")
    )


@query(
    "gram_matrix",
    """
    WITH q AS (
      SELECT list_transform(embedding,
                            x -> CAST(round(x * 1e6) AS BIGINT)) AS qv
      FROM embeddings
    )
    SELECT CAST(i.i - 1 AS INTEGER) AS i, CAST(j.j - 1 AS INTEGER) AS j,
           CAST(sum(q.qv[i.i] * q.qv[j.j]) AS BIGINT) AS g
    FROM q,
         unnest(generate_series(1, len(q.qv))) AS i(i),
         unnest(generate_series(1, len(q.qv))) AS j(j)
    GROUP BY 1, 2
    ORDER BY 1, 2
    """,
)
def gram_matrix(spark, sf_dir):
    """Exact Gram matrix X^T X of the (micro-unit-quantized)
    embedding corpus — the distributed-linear-algebra shape every
    covariance / PCA / linear-probe pipeline needs. The Spark side is
    the 100 TB plan: each partition computes its LOCAL 64x64 integer
    Gram with one numpy int64 matmul inside Arrow ``mapInPandas``
    (output: 4096 rows per partition, CONSTANT in the row count),
    then one groupBy sums partials — communication is
    O(partitions x d^2), never O(rows). Products and sums stay in
    BIGINT (|q| <= 1e6 => per-cell partial <= 1e12 x rows — far from
    2^63 at any tested SF); quantization makes the sum order-free, so
    the map-side partial aggregation is exact, not approximate. The
    oracle is the direct per-vector outer-product expansion. The
    per-partition numpy matmul is a deliberate Arrow boundary (the
    PLANS.md ``py`` class): a pure-expression dim x dim explode would
    ship O(rows x d^2) tuples through the shuffle instead."""
    import numpy as np
    import pandas as pd

    emb = load_table(spark, sf_dir, "embeddings")
    d = 64

    def partial_gram(batches):
        acc = np.zeros((d, d), dtype=np.int64)
        for pdf in batches:
            if not len(pdf):
                continue
            # half-away-from-zero to match SQL round() (np.round is
            # IEEE half-to-even — a 0.5e-6 tie would diverge from the
            # DuckDB oracle and the sibling kmeans_lloyd_step)
            scaled = np.stack(
                [np.asarray(v, dtype=np.float64) for v in pdf["embedding"]]
            ) * 1e6
            m = (
                np.floor(np.abs(scaled) + 0.5) * np.sign(scaled)
            ).astype(np.int64)
            acc += m.T @ m
        ii, jj = np.meshgrid(range(d), range(d), indexing="ij")
        yield pd.DataFrame(
            {
                "i": ii.ravel().astype("int32"),
                "j": jj.ravel().astype("int32"),
                "g": acc.ravel(),
            }
        )

    partials = emb.select("embedding").mapInPandas(
        partial_gram, schema="i int, j int, g long"
    )
    return (
        partials.groupBy("i", "j")
        .agg(F.sum("g").cast("bigint").alias("g"))
        .orderBy("i", "j")
    )
