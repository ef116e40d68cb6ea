"""IVF (inverted-file) ANN index — the classic scale path for
similarity search when brute force stops fitting (SURVEY.md §2.9).

Build: k-means coarse quantizer (numpy, deterministic init = first k
corpus rows, fixed iteration count — reproducible across runs/engines),
then an inverted list per centroid. Search: score a query against the
`nprobe` nearest centroids' lists only — cost drops from O(n) to
O(n·nprobe/k) per query at some recall loss (tunable via nprobe).

Distribution model: centroids (k×d) and the packed per-cluster
matrices are broadcast; query partitions stream through mapInPandas.
That matches a 100 TB corpus as long as the *index* (vectors live in
the lists) fits executor memory — past that, the inverted lists become
a partitioned table joined on the probed centroid id, same code shape
with a shuffle instead of a broadcast.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame


def _kmeans(M: np.ndarray, k: int, iters: int = 10) -> np.ndarray:
    """Deterministic k-means on L2-normalized rows (cosine ≡ dot)."""
    centroids = M[:k].copy()
    for _ in range(iters):
        assign = np.argmax(M @ centroids.T, axis=1)
        for c in range(k):
            members = M[assign == c]
            if len(members):
                v = members.mean(axis=0)
                n = np.linalg.norm(v)
                if n > 0:
                    centroids[c] = v / n
    return centroids


def ivf_topk(
    embeddings: DataFrame,
    k_neighbors: int = 5,
    n_centroids: int = 16,
    nprobe: int = 4,
    id_col: str = "vec_id",
) -> DataFrame:
    """(vec_id, neighbor_id, rank): top-k by cosine among the nprobe
    nearest inverted lists."""
    import pandas as pd

    spark = embeddings.sparkSession
    corpus = embeddings.select(id_col, "embedding").toPandas()
    ids = corpus[id_col].to_numpy(dtype="int64")
    M = np.vstack([np.asarray(v, dtype=np.float64) for v in corpus["embedding"]])
    M /= np.linalg.norm(M, axis=1, keepdims=True)

    centroids = _kmeans(M, n_centroids)
    assign = np.argmax(M @ centroids.T, axis=1)
    lists = {
        c: (ids[assign == c], M[assign == c]) for c in range(n_centroids)
    }
    bc = spark.sparkContext.broadcast((centroids, lists))

    def search(batches):
        cents, inv = bc.value
        for pdf in batches:
            q_ids = pdf[id_col].to_numpy(dtype="int64")
            Q = np.vstack([np.asarray(v, dtype=np.float64) for v in pdf["embedding"]])
            Q /= np.linalg.norm(Q, axis=1, keepdims=True)
            probe = np.argsort(-(Q @ cents.T), axis=1)[:, :nprobe]
            out_v, out_n, out_r = [], [], []
            for row, qid in enumerate(q_ids):
                cand_ids = np.concatenate([inv[c][0] for c in probe[row]])
                cand_mat = np.vstack([inv[c][1] for c in probe[row]])
                sims = cand_mat @ Q[row]
                mask = cand_ids != qid
                cand_ids, sims = cand_ids[mask], sims[mask]
                order = np.lexsort((cand_ids, -sims))[:k_neighbors]
                out_v.extend([qid] * len(order))
                out_n.extend(cand_ids[order])
                out_r.extend(range(1, len(order) + 1))
            yield pd.DataFrame(
                {"vec_id": out_v, "neighbor_id": out_n, "rank": out_r}
            )

    return embeddings.select(id_col, "embedding").mapInPandas(
        search, "vec_id long, neighbor_id long, rank long"
    )
