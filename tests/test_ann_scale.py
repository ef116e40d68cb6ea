"""Scale-shape and equivalence tests for the reworked ANN family
(VERDICT r1 items 2-3): the distributed implementations must produce
the same answers as the small-corpus baselines, and their physical
plans must not contain the scale-killer nodes (CartesianProduct /
BroadcastNestedLoopJoin / full-corpus collect)."""

import numpy as np
from pyspark.sql import functions as F

from etl_mp_transactions_spark.operators.ann import (
    cosine_topk,
    cosine_topk_bcast,
    neardup_pairs,
    neardup_pairs_banded,
)
from etl_mp_transactions_spark.operators.ivf import (
    ivf_topk,
    kmeans_centroids,
    seed_centroids,
)
from etl_mp_transactions_spark.sources.tables import load_table


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _no_cartesian(plan: str):
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_neardup_plan_has_no_cartesian(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    plan = _plan(neardup_pairs(emb, threshold=0.35))
    _no_cartesian(plan)
    assert "FlatMapCoGroupsInPandas" in plan


def test_cosine_topk_plan_has_no_cartesian(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    plan = _plan(cosine_topk(emb, k=5))
    _no_cartesian(plan)
    assert "FlatMapCoGroupsInPandas" in plan


def test_banded_neardup_plan_has_no_cartesian(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    _no_cartesian(_plan(neardup_pairs_banded(emb, threshold=0.45)))


def test_ivf_plan_has_no_cartesian(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    _no_cartesian(_plan(ivf_topk(emb, 3, 8, 2)))


def test_tiled_topk_equals_broadcast_blas(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    tiled = sorted(map(tuple, cosine_topk(emb, k=7).collect()))
    bcast = sorted(map(tuple, cosine_topk_bcast(emb, k=7).collect()))
    assert tiled == bcast


def test_tiled_topk_grid_invariance(spark, sf_dir):
    # the tiling grid is a physical choice — results must not depend on it
    emb = load_table(spark, sf_dir, "embeddings").limit(200)
    a = sorted(map(tuple, cosine_topk(emb, k=4, n_tiles=3, n_query_chunks=2).collect()))
    b = sorted(map(tuple, cosine_topk(emb, k=4, n_tiles=8, n_query_chunks=5).collect()))
    assert a == b


def _bruteforce_pairs(emb_df, threshold):
    rows = emb_df.select("vec_id", "embedding").collect()
    ids = np.array([r["vec_id"] for r in rows], dtype="int64")
    M = np.vstack([np.asarray(r["embedding"], dtype=np.float64) for r in rows])
    M /= np.linalg.norm(M, axis=1, keepdims=True)
    S = M @ M.T
    out = set()
    ai, bi = np.nonzero(S >= threshold)
    for x, y in zip(ids[ai], ids[bi]):
        if x < y:
            out.add((int(x), int(y)))
    return out


def test_tiled_neardup_matches_bruteforce(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    got = {
        (r["vec_a"], r["vec_b"])
        for r in neardup_pairs(emb, threshold=0.3).collect()
    }
    assert got == _bruteforce_pairs(emb, 0.3)


def test_tiled_neardup_no_duplicate_pairs(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    out = neardup_pairs(emb, threshold=0.25).select("vec_a", "vec_b")
    assert out.count() == out.distinct().count()


def test_banded_neardup_is_subset_with_expected_recall(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    exact = _bruteforce_pairs(emb, 0.4)
    banded = {
        (r["vec_a"], r["vec_b"])
        for r in neardup_pairs_banded(emb, threshold=0.4).collect()
    }
    assert banded <= exact  # precision 1: banding only drops, never invents
    # recall formula: 1-(1-p^4)^8, p = 1-acos(0.4)/pi ~= 0.63 -> ~0.81;
    # assert a loose floor (the corpus tail sits near the threshold)
    if exact:
        assert len(banded) / len(exact) >= 0.5


def test_seed_centroids_bounded_and_deterministic(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    cids1, c1 = seed_centroids(emb, 8)
    cids2, c2 = seed_centroids(emb, 8)
    assert len(cids1) == 8 and c1.shape[0] == 8
    assert list(cids1) == sorted(cids1)  # ascending for argmax tie-break
    assert list(cids1) == list(cids2) and np.array_equal(c1, c2)


def test_ivf_kmeans_mode_recall(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings").limit(200)
    exact = {
        (r["vec_id"], r["neighbor_id"]) for r in cosine_topk(emb, k=5).collect()
    }
    cents = kmeans_centroids(emb, n_centroids=8, fit_sample=200)
    approx = {
        (r["vec_id"], r["neighbor_id"])
        for r in ivf_topk(emb, k_neighbors=5, n_centroids=8, nprobe=4,
                          centroids=cents).collect()
    }
    recall = len(exact & approx) / len(exact)
    assert recall > 0.7, f"recall {recall:.2f}"


def test_adaptive_band_bits_edges():
    """Corpus-adaptive LSH band width: clamped, monotone, and stable
    at exact power-of-two boundaries (where a log2 ulp could bite)."""
    from etl_mp_transactions_spark.operators.ann import adaptive_band_bits

    assert adaptive_band_bits(0) == 4
    assert adaptive_band_bits(1) == 4
    assert adaptive_band_bits(2_000) == 4      # sf0.1 corpus -> legacy width
    assert adaptive_band_bits(20_000) == 7     # sf1 corpus
    assert adaptive_band_bits(10**9) == 8      # clamped at slot width
    # exact powers of two: ceil(log2(2^k)) must be k, not k+1
    assert adaptive_band_bits(256 * 32) == 5
    assert adaptive_band_bits(256 * 64) == 6
    # monotone non-decreasing
    prev = 0
    for n in (10, 100, 1_000, 5_000, 50_000, 500_000, 5_000_000):
        b = adaptive_band_bits(n)
        assert b >= prev
        prev = b


def test_hard_negatives_banded_contract(spark, sf_dir):
    """Full-corpus miner (operators/ann.hard_negatives_banded): one
    row per emitting anchor, negative is cross-label, qdot equals the
    exact integer dot of the named pair, and the mined qdot never
    exceeds the true full-scan hardest negative (candidates are a
    subset of all cross-label pairs); where the true hardest negative
    shares a band with its anchor, the miner must find exactly it."""
    from pyspark.sql import functions as F

    from etl_mp_transactions_spark.operators.ann import (
        hard_negatives_banded,
    )

    emb = load_table(spark, sf_dir, "embeddings").limit(300)
    mined = hard_negatives_banded(emb).cache()
    n_anchors = mined.count()
    assert n_anchors > 0
    assert mined.select("anchor_id").distinct().count() == n_anchors
    assert mined.filter(
        F.col("anchor_label") == F.col("negative_label")
    ).count() == 0
    # exact full-scan hardest negative per anchor (brute force)
    q = emb.select(
        "vec_id",
        "label",
        F.expr(
            "transform(embedding, x -> cast(round(x * 1e6) as bigint))"
        ).alias("qv"),
    )
    qdot = F.expr(
        "aggregate(zip_with(aqv, nqv, (a, b) -> a * b),"
        " cast(0 as bigint), (acc, x) -> acc + x)"
    )
    brute = (
        q.select(
            F.col("vec_id").alias("anchor_id"),
            F.col("label").alias("al"),
            F.col("qv").alias("aqv"),
        )
        .join(
            q.select(
                F.col("vec_id").alias("negative_id"),
                F.col("label").alias("nl"),
                F.col("qv").alias("nqv"),
            ),
            F.col("al") != F.col("nl"),
        )
        .withColumn("qdot", qdot)
        .groupBy("anchor_id")
        .agg(F.max("qdot").alias("best_qdot"))
    )
    joined = mined.join(brute, "anchor_id").cache()
    assert joined.filter(F.col("qdot") > F.col("best_qdot")).count() == 0
    # qdot integrity: re-derive the dot for each mined pair
    rederived = (
        mined.join(
            q.select(F.col("vec_id").alias("anchor_id"), F.col("qv").alias("aqv")),
            "anchor_id",
        )
        .join(
            q.select(F.col("vec_id").alias("negative_id"), F.col("qv").alias("nqv")),
            "negative_id",
        )
        .withColumn("qdot2", qdot)
    )
    assert rederived.filter(F.col("qdot") != F.col("qdot2")).count() == 0
    mined.unpersist()
    joined.unpersist()
