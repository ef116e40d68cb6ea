"""Embedding-training + recommender EVALUATION operators (SURVEY.md
§2.9 LLM-pipeline extensions): hard-negative mining for contrastive
training, and exact NDCG@k ranking evaluation.

- hard_negative_mining: for each anchor vector, the most similar
  corpus vector with a DIFFERENT label — the pair a contrastive /
  metric-learning run trains against (the "hardest negative", public
  technique from the triplet-loss literature, Schroff 2015). Anchors
  are a deterministic FIXED-SIZE subset (vec_id % stride, capped at
  MAX_ANCHORS — a stride alone scales anchors WITH the corpus and
  turns the mine quadratic: the 10x sweep measured 27.6x before the
  cap, 1.0x after), the eval-set shape; similarity is the exact
  integer dot product of micro-unit
  quantized vectors (the kmeans_lloyd_step policy) so argmax is
  engine-exact with a vec_id tiebreak. Scale: anchors broadcast
  against the corpus — O(|corpus| · |anchors| · d) with bounded
  anchors. The eval-set contract only; the mining operator is below.
- hard_negative_mining_full: EVERY vector is an anchor; candidates
  come from the deterministic corpus-adaptive sign-bit LSH bands
  (operators/ann.hard_negatives_banded), cross-label only, with the
  same exact integer argmax verify — work ~ n x bucket occupancy,
  never n^2, no corpus-proportional broadcast.
- ndcg_ranking_eval: exact NDCG@8 per customer for the global
  popularity ranking (top-8 parts by total quantity) scored against
  what each customer actually bought. The log2 position discounts are
  PRE-COMPUTED Python literals injected into BOTH engines (libm log2
  of 3,5,6,7 is not guaranteed bit-identical across engines — the
  only portable float is the one neither engine computes), so DCG and
  ideal-DCG are pure integer dot products; NDCG emerges as ppm via
  floor division. Scale: one popularity aggregate (8-row broadcast),
  one fact join, an 8-row-per-customer ideal sort window. FIXED-COST
  AUDIT (r9): warm execution is ~2.0s at sf0.1 and the single-shot
  sweep number carries ~2.5s of per-query fixed cost on top — ~0.5s
  py4j plan construction + parquet footer reads, ~0.4s Catalyst
  optimize, and first-execution codegen/AQE finalization — not data
  work (the flat 0.84x ratio across the 10x step in BENCH_SCALE_r7
  was exactly this fixed floor). The r9 rewrite folded dcg and idcg
  into ONE pass (both sums from the same windowed frame: 38 -> 16
  exchanges, 10 -> 2 windows); the remaining execution is dominated
  by the data-proportional bought aggregate (lineitem join orders),
  which is the irreducible fact scan.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from etl_mp_transactions_spark.operators import ann
from etl_mp_transactions_spark.queries.similarity import _BANDS_SQL
from etl_mp_transactions_spark.registry import query
from etl_mp_transactions_spark.sources.tables import load_table

ANCHOR_STRIDE = 50
MAX_ANCHORS = 40  # hard cap: anchors stay CONSTANT as the corpus grows
NDCG_K = 8
# round(1e9 / log2(i+1)) for ranks i=1..8 — computed once in Python,
# used as literals by both engines (module docstring)
DCG_W = (
    1000000000,
    630929754,
    500000000,
    430676558,
    386852807,
    356207187,
    333333333,
    315464877,
)


@query(
    "hard_negative_mining",
    f"""
    WITH q AS (
      SELECT vec_id, label,
             list_transform(embedding,
                            x -> CAST(round(x * 1e6) AS BIGINT)) AS qv
      FROM embeddings
    ),
    anchors AS (
      SELECT vec_id AS anchor_id, label AS anchor_label, qv AS aqv
      FROM q WHERE vec_id % {ANCHOR_STRIDE} = 0
        AND vec_id < {ANCHOR_STRIDE} * {MAX_ANCHORS}
    ),
    pairs AS (
      SELECT a.anchor_id, a.anchor_label, c.vec_id, c.label,
             (SELECT CAST(sum(a.aqv[u.pos] * c.qv[u.pos]) AS BIGINT)
              FROM unnest(generate_series(1, len(c.qv))) AS u(pos))
               AS qdot
      FROM anchors a JOIN q c ON c.label <> a.anchor_label
    ),
    best AS (
      SELECT anchor_id, anchor_label, vec_id, label, qdot,
             row_number() OVER (PARTITION BY anchor_id
                                ORDER BY qdot DESC, vec_id) AS rn
      FROM pairs
    )
    SELECT anchor_id, anchor_label,
           vec_id AS negative_id, label AS negative_label, qdot
    FROM best WHERE rn = 1
    ORDER BY anchor_id
    """,
)
def hard_negative_mining(spark, sf_dir):
    """Hardest cross-label negative per anchor (module docstring):
    exact integer argmax-dot with vec_id tiebreak."""
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.select(
        "vec_id",
        "label",
        F.expr(
            "transform(embedding, x -> cast(round(x * 1e6) as bigint))"
        ).alias("qv"),
    )
    anchors = q.filter(
        (F.col("vec_id") % ANCHOR_STRIDE == 0)
        & (F.col("vec_id") < ANCHOR_STRIDE * MAX_ANCHORS)
    ).select(
        F.col("vec_id").alias("anchor_id"),
        F.col("label").alias("anchor_label"),
        F.col("qv").alias("aqv"),
    )
    qdot = F.expr(
        "aggregate(zip_with(aqv, qv, (a, b) -> a * b),"
        " cast(0 as bigint), (acc, x) -> acc + x)"
    )
    pairs = (
        q.join(
            F.broadcast(anchors),
            F.col("label") != F.col("anchor_label"),
        )
        .withColumn("qdot", qdot)
    )
    w = Window.partitionBy("anchor_id").orderBy(
        F.desc("qdot"), F.asc("vec_id")
    )
    return (
        pairs.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "anchor_id",
            "anchor_label",
            F.col("vec_id").alias("negative_id"),
            F.col("label").alias("negative_label"),
            "qdot",
        )
        .orderBy("anchor_id")
    )


_W_CASE_SQL = "CASE rank " + " ".join(
    f"WHEN {i + 1} THEN {w}" for i, w in enumerate(DCG_W)
) + " END"


@query(
    "ndcg_ranking_eval",
    f"""
    WITH pop AS (
      SELECT l_partkey AS part,
             row_number() OVER (
               ORDER BY sum(CAST(round(l_quantity) AS BIGINT)) DESC,
                        l_partkey) AS rank
      FROM lineitem GROUP BY l_partkey
      ORDER BY rank LIMIT {NDCG_K}
    ),
    bought AS (
      SELECT o.o_custkey AS custkey, l.l_partkey AS part,
             CAST(sum(CAST(round(l.l_quantity) AS BIGINT)) AS BIGINT)
               AS rel
      FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      GROUP BY 1, 2
    ),
    scored AS (
      SELECT c.c_custkey AS custkey, p.rank,
             COALESCE(b.rel, 0) AS rel,
             {_W_CASE_SQL} AS w
      FROM customer c CROSS JOIN pop p
      LEFT JOIN bought b
        ON b.custkey = c.c_custkey AND b.part = p.part
    ),
    ideal AS (
      SELECT custkey, rel,
             row_number() OVER (PARTITION BY custkey
                                ORDER BY rel DESC, rank) AS irank
      FROM scored
    ),
    dcg AS (
      SELECT custkey, CAST(sum(rel * w) AS BIGINT) AS dcg_nano
      FROM scored GROUP BY custkey
    ),
    idcg AS (
      SELECT i.custkey,
             CAST(sum(i.rel * ({_W_CASE_SQL.replace("rank", "irank")}))
                  AS BIGINT) AS idcg_nano
      FROM ideal i GROUP BY i.custkey
    )
    SELECT d.custkey, d.dcg_nano, g.idcg_nano,
           CASE WHEN g.idcg_nano > 0
                THEN d.dcg_nano * 1000000 // g.idcg_nano
                ELSE 0 END AS ndcg_ppm
    FROM dcg d JOIN idcg g ON d.custkey = g.custkey
    ORDER BY d.custkey
    """,
)
def ndcg_ranking_eval(spark, sf_dir):
    """Exact NDCG@{NDCG_K} of the global-popularity ranking per
    customer (module docstring): literal integer discounts, integer
    relevance (bought quantity), ppm output."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    qty = F.round(F.col("l_quantity"), 0).cast("bigint")
    # pop appears twice below but costs one scan: the two subtrees
    # are identical, so Spark plans a ReusedExchange for the second
    # reference (verified in the formatted plan; a driver-side
    # materialization of the 8-row head was tried and only added a
    # separate job)
    pop = (
        li.groupBy(F.col("l_partkey").alias("part"))
        .agg(F.sum(qty).alias("tq"))
        .orderBy(F.desc("tq"), F.asc("part"))
        .limit(NDCG_K)
        .select(
            "part",
            F.row_number()
            .over(Window.orderBy(F.desc("tq"), F.asc("part")))
            .alias("rank"),
        )
    )
    bought = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy(
            F.col("o_custkey").alias("custkey"),
            F.col("l_partkey").alias("part"),
        )
        .agg(F.sum(qty).alias("rel"))
    )
    # single pass (fixed-cost audit, VERDICT r7 #5 / r8 #7): the
    # oracle's dcg/idcg CTEs each re-derive `scored`, and a literal
    # translation made Spark compute the lineitem aggregates TWICE
    # and join the halves (38-exchange plan). Both sums come out of
    # ONE frame instead: carry the position weight w through the
    # ideal-rank window, aggregate sum(rel*w) and sum(rel*iw) in the
    # same groupBy — one crossJoin, one bought join, one window, one
    # aggregate, and no dcg-idcg join. Values are unchanged (the
    # oracle still says it the two-CTE way).
    w_expr = F.expr(_W_CASE_SQL)
    scored = (
        cust.select(F.col("c_custkey").alias("custkey"))
        .crossJoin(F.broadcast(pop))
        .join(bought.join(F.broadcast(pop), "part"),
              ["custkey", "rank"], "left")
        .select(
            "custkey",
            "rank",
            F.coalesce(F.col("rel"), F.lit(0)).alias("rel"),
            w_expr.alias("w"),
        )
    )
    wid = Window.partitionBy("custkey").orderBy(
        F.desc("rel"), F.asc("rank")
    )
    ideal = scored.withColumn(
        "irank", F.row_number().over(wid)
    ).withColumn("iw", F.expr(_W_CASE_SQL.replace("rank", "irank")))
    return (
        ideal.groupBy("custkey")
        .agg(
            F.sum(F.col("rel") * F.col("w")).cast("bigint").alias("dcg_nano"),
            F.sum(F.col("rel") * F.col("iw")).cast("bigint").alias("idcg_nano"),
        )
        .select(
            "custkey",
            "dcg_nano",
            "idcg_nano",
            F.when(
                F.col("idcg_nano") > 0,
                F.expr("div(dcg_nano * 1000000, idcg_nano)"),
            )
            .otherwise(F.lit(0))
            .cast("bigint")
            .alias("ndcg_ppm"),
        )
        .orderBy("custkey")
    )

@query(
    "hard_negative_mining_full",
    f"""
    WITH params AS (
      SELECT least(8, greatest(4,
               CAST(length(bin(greatest(count(*), 2) - 1)) - 8 AS INT))) AS bits
      FROM embeddings
    ),
    sigs AS (
      {_BANDS_SQL}
    ),
    labs AS (SELECT vec_id, label FROM embeddings),
    bands AS (
      -- labels ride the band rows: comparing labels via two separate
      -- labs joins let the optimizer reorder to the labs x labs
      -- INEQUALITY join (n^2 = 4e8 rows at sf1 — the 75 GB DuckDB
      -- spill, r12); with the label on each side of the equi-join,
      -- a.label <> nb.label is a plain post-join filter
      SELECT s.vec_id, s.b,
             substr(s.sig8, 1, (SELECT bits FROM params)) AS bkey,
             l.label
      FROM sigs s JOIN labs l ON l.vec_id = s.vec_id
    ),
    q AS (
      SELECT vec_id, label,
             list_transform(embedding,
                            x -> CAST(round(x * 1e6) AS BIGINT)) AS qv
      FROM embeddings
    ),
    negb AS (
      -- candidate-side bucket cap, mirrored bit-for-bit with the
      -- engine (operators/ann.MINE_BUCKET_CAP): deterministic
      -- vec_id order per (band, bucket)
      SELECT vec_id, b, bkey, label
      FROM (SELECT vec_id, b, bkey, label,
                   row_number() OVER (PARTITION BY b, bkey
                                      ORDER BY vec_id) AS p
            FROM bands)
      WHERE p <= {ann.MINE_BUCKET_CAP}
    ),
    cand AS (
      SELECT DISTINCT a.vec_id AS anchor_id, nb.vec_id AS negative_id
      FROM bands a
      JOIN negb nb ON a.b = nb.b AND a.bkey = nb.bkey
      WHERE a.label <> nb.label
    ),
    scored AS (
      -- in-row list arithmetic, NOT a correlated unnest subquery:
      -- the correlated form materialized |cand| x 64 rows and
      -- filled 75 GB of DuckDB spill at sf1 (r12); identical BIGINTs
      SELECT c.anchor_id, qa.label AS anchor_label,
             c.negative_id, qn.label AS negative_label,
             CAST(list_sum(list_transform(generate_series(1, 64),
                    j -> qa.qv[j] * qn.qv[j])) AS BIGINT) AS qdot
      FROM cand c
      JOIN q qa ON qa.vec_id = c.anchor_id
      JOIN q qn ON qn.vec_id = c.negative_id
    ),
    best AS (
      SELECT anchor_id, anchor_label, negative_id, negative_label, qdot,
             row_number() OVER (PARTITION BY anchor_id
                                ORDER BY qdot DESC, negative_id) AS rn
      FROM scored
    )
    SELECT anchor_id, anchor_label, negative_id, negative_label, qdot
    FROM best WHERE rn = 1
    ORDER BY anchor_id
    """,
)
def hard_negative_mining_full(spark, sf_dir):
    """Full-corpus hard-negative mining — EVERY vector is an anchor
    (operators/ann.hard_negatives_banded): candidates from the
    deterministic 8-band corpus-adaptive sign-bit LSH (the
    embedding_neardup_banded index, oracle-mirrored bit-for-bit),
    cross-label only, argmax by exact integer micro-unit dot with
    vec_id tiebreak. Anchors with no cross-label band collision emit
    nothing (documented LSH-miner semantics). The fixed-40-anchor
    exact variant (``hard_negative_mining``) stays as the eval-set
    contract; this is the mining operator its docstring previously
    only promised. Scale: band equi-join + per-anchor bounded window,
    no corpus broadcast, no crossJoin — work ~ n x bucket occupancy."""
    return ann.hard_negatives_banded(
        load_table(spark, sf_dir, "embeddings"), n_bits=None, n_bands=8
    ).orderBy("anchor_id")

