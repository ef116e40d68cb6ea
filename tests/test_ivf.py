"""IVF ANN: determinism and recall vs the exact brute-force baseline."""

from etl_mp_transactions_spark.operators.ann import cosine_topk
from etl_mp_transactions_spark.operators.ivf import ivf_topk
from etl_mp_transactions_spark.sources.tables import load_table


def test_ivf_deterministic(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    r1 = sorted(map(tuple, ivf_topk(emb, 3, 8, 2).collect()))
    r2 = sorted(map(tuple, ivf_topk(emb, 3, 8, 2).collect()))
    assert r1 == r2


def test_ivf_recall_vs_bruteforce(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings").limit(200)
    exact = {
        (r["vec_id"], r["neighbor_id"])
        for r in cosine_topk(emb, k=5).collect()
    }
    approx = {
        (r["vec_id"], r["neighbor_id"])
        for r in ivf_topk(emb, k_neighbors=5, n_centroids=8, nprobe=4).collect()
    }
    recall = len(exact & approx) / len(exact)
    # nprobe=4 of 8 lists with the unrefined hash-seed quantizer
    # (random Voronoi): slightly below the kmeans-refined mode, which
    # is floor-0.7-tested in test_ann_scale.test_ivf_kmeans_mode_recall
    assert recall > 0.6, f"recall {recall:.2f}"


def test_ivf_full_probe_equals_bruteforce(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings").limit(150)
    exact = sorted(map(tuple, cosine_topk(emb, k=3).collect()))
    full = sorted(
        map(tuple, ivf_topk(emb, k_neighbors=3, n_centroids=6, nprobe=6).collect())
    )
    assert exact == full  # probing every list == exact search
