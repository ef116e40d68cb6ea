"""Similarity-family registry queries: the J2 anomaly join (scalable +
reference-exact modes) and embedding ANN search (SURVEY.md §2.3 J2,
§2.6 C11-C14, §2.9).
"""

from __future__ import annotations

from etl_mp_transactions_spark.operators import ann, anomaly
from etl_mp_transactions_spark.queries.ivfpq_q import materialize_ctes
from etl_mp_transactions_spark.registry import query
from etl_mp_transactions_spark.sources.tables import load_table

# J2 similarity blend in SQL — component order must match the Spark
# expression exactly for bit-identical doubles.
_J2_SIM = """0.8 * (len(list_intersect(a.tokens, b.tokens))::DOUBLE
                 / len(list_distinct(list_concat(a.tokens, b.tokens))))
 + 0.1 * (CASE WHEN greatest(abs(a.n_chars), abs(b.n_chars)) = 0 THEN 1.0
               ELSE 1 - abs(a.n_chars - b.n_chars)::DOUBLE
                        / greatest(abs(a.n_chars), abs(b.n_chars)) END)
 + 0.1 * (CASE WHEN a.lang = b.lang THEN 1.0 ELSE 0.0 END)"""


@query(
    "j2_anomaly_pairs",
    f"""
    WITH toks AS (
      SELECT doc_id, lang, source, n_chars,
             list_distinct(string_split_regex(text, '\\s+')) AS tokens
      FROM documents
    )
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           {_J2_SIM} AS similarity_score
    FROM toks a
    JOIN toks b ON a.source = b.source AND a.doc_id < b.doc_id
    WHERE {_J2_SIM} >= 0.9
    """,
)
def j2_anomaly_pairs(spark, sf_dir):
    """J2 scalable mode: weighted similarity blend (0.8 text-Jaccard +
    0.1 relative-numeric + 0.1 exact-match) ≥ 0.9 over source-blocked
    pairs. The reference's O(n·m) loop with per-pair TF-IDF refits
    (src/ai.py:42-60) becomes one blocked join in codegen."""
    return anomaly.anomaly_pairs(load_table(spark, sf_dir, "documents"))


# the 2-doc TF-IDF cosine in closed form (see operators/anomaly.py
# tfidf_pair_scores_sparse), ALL-INTEGER since r15 (float purge): the
# idf constant ships as a nano integer literal, norms become exact
# nano int64s, the pair norm product goes through the bigratio
# even-shift reduction + integer sqrt, and the score is an exact
# trunc ppm via the limb scaled_div. Method error ≤ ~4e-7 of the
# sklearn cosine (PORTABILITY.md); identical in both engines.
_C2_NANO = int(round(anomaly.IDF1_SQ * 1e9))


def _tfidf_ppm_tail(engine: str) -> str:
    from etl_mp_transactions_spark.functions.bigratio import (
        isqrt_sql,
        pow10_sql,
        red_cols_even,
        scaled_div_sql,
    )

    big = (
        "CAST(na AS HUGEINT) * nb"
        if engine == "duck"
        else "CAST(na AS DECIMAL(18,0)) * CAST(nb AS DECIMAL(18,0))"
    )
    v = red_cols_even("v", "v", engine)
    d = "//" if engine == "duck" else "div"
    return f"""
    norms AS (
      SELECT doc_a, doc_b, dot,
             sh_a * 1000000000 + (s2_a - sh_a) * {_C2_NANO} AS na,
             sh_b * 1000000000 + (s2_b - sh_b) * {_C2_NANO} AS nb
      FROM pairs0
    ),
    prod AS (
      SELECT doc_a, doc_b, dot, {big} AS v FROM norms
    ),
    redd AS (
      SELECT doc_a, doc_b, dot,
             {v[0][1]} AS v_hi, {v[1][1]} AS v_sh
      FROM prod
    ),
    rooted AS (
      SELECT doc_a, doc_b, dot,
             {isqrt_sql("v_hi", engine)}
               * {pow10_sql(f"v_sh {d} 2", engine)} AS rt
      FROM redd
    ),
    scored AS (
      SELECT doc_a, doc_b,
             {scaled_div_sql("dot", "rt", 10**15, engine, 10**15)}
               AS tfidf_cosine_ppm
      FROM rooted
    )
    SELECT doc_a, doc_b, tfidf_cosine_ppm
    FROM scored WHERE tfidf_cosine_ppm >= 900000
    """


@query(
    "j2_tfidf_exact_pairs",
    materialize_ctes(f"""
    WITH tok AS (
      SELECT doc_id, source, t.token AS token, count(*)::BIGINT AS tf
      FROM documents,
           unnest(regexp_extract_all(lower(text), '\\b\\w\\w+\\b')) AS t(token)
      GROUP BY doc_id, source, t.token
    ),
    s AS (SELECT doc_id, sum(tf * tf)::BIGINT AS s2 FROM tok GROUP BY doc_id),
    p AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             sum(a.tf * b.tf)::BIGINT AS dot,
             sum(a.tf * a.tf)::BIGINT AS sh_a,
             sum(b.tf * b.tf)::BIGINT AS sh_b
      FROM tok a
      JOIN tok b ON a.source = b.source AND a.token = b.token
                AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    ),
    pairs0 AS (
      SELECT p.doc_a, p.doc_b, p.dot, p.sh_a, p.sh_b,
             sa.s2 AS s2_a, sb.s2 AS s2_b
      FROM p
      JOIN s sa ON sa.doc_id = p.doc_a
      JOIN s sb ON sb.doc_id = p.doc_b
    ),{_tfidf_ppm_tail("duck")}
    """),
)
def j2_tfidf_exact_pairs(spark, sf_dir):
    """J2 exactness mode: the reference's per-pair 2-document TF-IDF
    cosine (sklearn semantics) in closed form over a sparse token
    join — all-JVM, no per-pair text shipping, and since r15 an
    ALL-INTEGER ppm score (block comment above). The pandas-UDF
    formula path (anomaly.tfidf_pair_scores) remains as the
    unit-test ground truth (tests/test_anomaly.py)."""
    docs = load_table(spark, sf_dir, "documents")
    scored = anomaly.tfidf_pair_scores_sparse(docs)
    scored.createOrReplaceTempView("pairs0")
    return spark.sql("WITH " + _tfidf_ppm_tail("spark").lstrip())


@query(
    "ann_cosine_topk",
    """
    SELECT a.vec_id, b.vec_id AS neighbor_id,
           row_number() OVER (
             PARTITION BY a.vec_id
             ORDER BY list_cosine_similarity(a.embedding::DOUBLE[],
                                             b.embedding::DOUBLE[]) DESC,
                      b.vec_id
           ) AS rank
    FROM embeddings a JOIN embeddings b ON a.vec_id <> b.vec_id
    QUALIFY rank <= 10
    """,
)
def ann_cosine_topk(spark, sf_dir):
    """Exact cosine top-10 per vector via the 2-D tiled cogroup block
    matmul (operators/ann.py): no driver collect, no corpus broadcast,
    per-task memory bounded by the grid — the distributed-exact shape.
    O(n²) compute by definition of exact; the LSH/IVF variants are the
    sub-linear paths."""
    return ann.cosine_topk(load_table(spark, sf_dir, "embeddings"), k=10)


@query(
    "ann_lsh_bucketed",
    """
    WITH b AS (
      SELECT vec_id, embedding,
             concat(
               CASE WHEN embedding[1] >= 0 THEN '1' ELSE '0' END,
               CASE WHEN embedding[2] >= 0 THEN '1' ELSE '0' END,
               CASE WHEN embedding[3] >= 0 THEN '1' ELSE '0' END,
               CASE WHEN embedding[4] >= 0 THEN '1' ELSE '0' END,
               CASE WHEN embedding[5] >= 0 THEN '1' ELSE '0' END,
               CASE WHEN embedding[6] >= 0 THEN '1' ELSE '0' END,
               CASE WHEN embedding[7] >= 0 THEN '1' ELSE '0' END,
               CASE WHEN embedding[8] >= 0 THEN '1' ELSE '0' END
             ) AS bucket
      FROM embeddings
    )
    SELECT a.vec_id, a.bucket, b.vec_id AS neighbor_id,
           row_number() OVER (
             PARTITION BY a.vec_id
             ORDER BY list_cosine_similarity(a.embedding::DOUBLE[],
                                             b.embedding::DOUBLE[]) DESC,
                      b.vec_id
           ) AS rank
    FROM b a JOIN b b ON a.bucket = b.bucket AND a.vec_id <> b.vec_id
    QUALIFY rank <= 3
    """,
)
def ann_lsh_bucketed(spark, sf_dir):
    """Sign-bucket LSH ANN: candidates restricted to the 8-bit sign-
    pattern bucket, top-3 within bucket. The bucket key shuffle replaces
    the crossJoin — the 100 TB shape."""
    return ann.cosine_topk_lsh(load_table(spark, sf_dir, "embeddings"), k=3, n_bits=8)


@query(
    "embedding_neardup",
    """
    SELECT a.vec_id AS vec_a, b.vec_id AS vec_b
    FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
    WHERE list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) >= 0.35
    """,
)
def embedding_neardup(spark, sf_dir):
    """Embedding-cosine near-dup pairs (≥ 0.35 — chosen at ~p99.9 of
    the corpus cosine distribution so the result is small but
    non-empty), exact. 0.35 sits in the random-similarity tail where
    no LSH family is both selective and complete (recall math in
    operators/ann.py), so the implementation is the triangular tiled
    cogroup join: every tile pair scored in exactly one task, O(n·G)
    replication, no CartesianProduct in the plan. Cos values excluded
    from output: thresholds are engine-portable, raw float sums are
    not guaranteed to be."""
    pairs = ann.neardup_pairs(load_table(spark, sf_dir, "embeddings"), threshold=0.35)
    return pairs.select("vec_a", "vec_b")


def _band_sql(b: int, slot: int = 8) -> str:
    """Full slot-width (8-bit) sign string for band b; the bands CTE
    slices it to the corpus-adaptive bit count."""
    bits = " || ".join(
        f"(CASE WHEN embedding[{b * slot + i + 1}] >= 0 THEN '1' ELSE '0' END)"
        for i in range(slot)
    )
    return f"SELECT vec_id, {b} AS b, {bits} AS sig8 FROM embeddings"


_BANDS_SQL = "\n      UNION ALL ".join(_band_sql(b) for b in range(8))


@query(
    "embedding_neardup_banded",
    f"""
    WITH params AS (
      SELECT least(8, greatest(4,
               CAST(length(bin(greatest(count(*), 2) - 1)) - 8 AS INT))) AS bits
      FROM embeddings
    ),
    sigs AS (
      {_BANDS_SQL}
    ),
    bands AS (
      SELECT vec_id, b, substr(sig8, 1, (SELECT bits FROM params)) AS bkey
      FROM sigs
    ),
    cand AS (
      SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b
      FROM bands a
      JOIN bands b ON a.b = b.b AND a.bkey = b.bkey AND a.vec_id < b.vec_id
    )
    SELECT c.vec_a, c.vec_b
    FROM cand c
    JOIN embeddings va ON va.vec_id = c.vec_a
    JOIN embeddings vb ON vb.vec_id = c.vec_b
    WHERE list_cosine_similarity(va.embedding::DOUBLE[], vb.embedding::DOUBLE[])
            >= 0.45
    """,
)
def embedding_neardup_banded(spark, sf_dir):
    """Hyperplane-banded near-dup (8 bands × corpus-adaptive sign
    bits, exact-verify at cos ≥ 0.45): the sub-quadratic LSH index
    shape for the high-similarity dedup regime. Band width grows with
    log2(corpus) (operators/ann.adaptive_band_bits — the r5 fix for
    measured 74x-at-10x-rows quadratic candidate growth at fixed
    r=4), holding per-bucket occupancy roughly constant. Banding and
    the bit-count formula are deterministic and mirrored in the
    oracle (a SQL scalar computes the identical bits), so candidates
    — and therefore results — are bit-identical across engines;
    recall vs the exact join is 1−(1−p^r)⁸ (at the cos≈0.9 regime
    this index is for: 0.998 at r=4, 0.93 at r=8 — buy it back with
    more bands, not wider ones; measured vs `neardup_pairs` in
    tests/test_ann_scale.py)."""
    pairs = ann.neardup_pairs_banded(
        load_table(spark, sf_dir, "embeddings"), threshold=0.45, n_bits=None,
        n_bands=8,
    )
    return pairs.select("vec_a", "vec_b")


@query(
    "semantic_dedup",
    f"""
    WITH RECURSIVE params AS (
      SELECT least(8, greatest(4,
               CAST(length(bin(greatest(count(*), 2) - 1)) - 8 AS INT))) AS bits
      FROM embeddings
    ),
    sigs AS (
      {_BANDS_SQL}
    ),
    bands AS (
      SELECT vec_id, b, substr(sig8, 1, (SELECT bits FROM params)) AS bkey
      FROM sigs
    ),
    cand AS (
      SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b
      FROM bands a
      JOIN bands b ON a.b = b.b AND a.bkey = b.bkey AND a.vec_id < b.vec_id
    ),
    pairs AS (
      SELECT c.vec_a, c.vec_b
      FROM cand c
      JOIN embeddings va ON va.vec_id = c.vec_a
      JOIN embeddings vb ON vb.vec_id = c.vec_b
      WHERE list_cosine_similarity(va.embedding::DOUBLE[], vb.embedding::DOUBLE[])
              >= 0.45
    ),
    edges AS (
      SELECT vec_a AS a, vec_b AS b FROM pairs
      UNION
      SELECT vec_b AS a, vec_a AS b FROM pairs
    ),
    reach(a, b) AS (
      SELECT a, b FROM edges
      UNION
      SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a
    ),
    comp AS (
      SELECT a AS vec_id, least(a, min(b)) AS rep FROM reach GROUP BY a
    )
    SELECT e.vec_id,
           coalesce(c.rep, e.vec_id) AS rep_id,
           (coalesce(c.rep, e.vec_id) = e.vec_id) AS kept
    FROM embeddings e LEFT JOIN comp c ON c.vec_id = e.vec_id
    """,
)
def semantic_dedup(spark, sf_dir):
    """SemDeDup-style semantic deduplication over the embedding
    corpus, end to end: LSH-banded candidate pairs (corpus-adaptive
    sign-bit bands) → exact cosine verification (≥ 0.45) → transitive
    closure (min-label propagation + pointer jumping) → keep ONE
    representative per semantic cluster (min vec_id; singletons keep
    themselves). Output is the full dedup decision table
    (vec_id, rep_id, kept) a training pipeline joins against its
    corpus to drop semantic near-duplicates.

    The oracle replays the identical pipeline in SQL — adaptive-bits
    scalar, band join, cosine verify, recursive-CTE reachability
    closure — so cluster assignments and keep decisions are checked
    exactly. Scale: pairs are band-bounded (see adaptive_band_bits),
    closure is O(log n) rounds over edge-touching nodes only;
    singletons (the overwhelming majority) never enter the loop."""
    from pyspark.sql import functions as F

    from etl_mp_transactions_spark.operators import ann
    from etl_mp_transactions_spark.operators.components import connected_components

    emb = load_table(spark, sf_dir, "embeddings")
    pairs = ann.neardup_pairs_banded(emb, threshold=0.45, n_bits=None).select(
        "vec_a", "vec_b"
    )
    comp = connected_components(
        emb, pairs, node_col="vec_id", src_col="vec_a", dst_col="vec_b"
    )
    return comp.select(
        "vec_id",
        F.col("component").alias("rep_id"),
        (F.col("component") == F.col("vec_id")).alias("kept"),
    )
