"""Graph-based ANN (the NSW/HNSW paradigm, Malkov & Yashunin 2016)
over the embedding corpus: an exact integer-L2 kNN graph plus greedy
best-first search, completing the ANN family's paradigm coverage
(brute-force / LSH / IVF / PQ / IVF-PQ / graph) — SURVEY.md §2.9; no
reference counterpart, north-star additions.

- ``graph_ann_greedy_search``: build the degree-8 kNN graph (exact
  quantized-L2 top-8 per node), then walk it: from a deterministic
  entry point (the smallest corpus id ≠ query), T = 8 unrolled hops,
  each moving to the best of {current} ∪ neighbors(current) by exact
  d2 to the query — monotone by construction (the current node is
  always a candidate), so the walk never cycles. Output: the full
  hop trajectory per query.
- ``graph_ann_search_verdict``: the honest quality report — final
  node vs the TRUE nearest neighbor (exact corpus argmin), with the
  found_exact verdict and the hop at which the walk converged. Greedy
  search on a plain kNN graph is NOT guaranteed to find the true NN
  (that is the point of HNSW's hierarchy); the verdict measures how
  often it does on this corpus, per query, exactly.
- r13 completes the family's production lifecycle on the IVF-seeded
  build below: ``graph_ann_ivf_build`` / ``graph_ann_ivf_verdict``
  (~linear build + edge-recall audit), ``graph_ann_incremental_insert``
  (frozen-books insert == rebuild) with its streaming twin
  ``r25_stream_graph_insert`` (20th stream==batch pin),
  ``graph_ann_index_roundtrip`` (persist/reload serving),
  ``graph_ann_filtered_walk`` (label-filtered search from the walk's
  visited set, vs the exact filtered NN), and
  ``graph_ann_hier_assign_audit`` (two-level coarse-assignment
  go/no-go with exact agreement + work counters).

Exactness: vectors quantized to micro ints (the pq.py contract), all
distances exact BIGINT (d2 ≤ 64·(2.4e6)² ≈ 3.7e14), ties broken by
node id, entry and walk fully deterministic. The Spark kNN build is a
2-D tiled cogroup (the operators/ann.cosine_topk shape) with an int64
numpy Gram per cell — |a−b|² = |a|² + |b|² − 2ab with every product
≤ 64·1.44e12 ≈ 9.2e13, exact in int64 — so graph edges match the
DuckDB n² QUALIFY oracle bit for bit.

Scale shape (100 TB): TWO builds. The exact O(n²) build
(``graph_ann_greedy_search``/``graph_ann_search_verdict``) is the
small-SF ground truth — evenly distributed (tile pairs, no
CartesianProduct) but quadratic, kept for verification. The SCALE
PATH is the IVF-seeded build (``graph_ann_ivf_build``/
``graph_ann_ivf_verdict``/``graph_ann_incremental_insert``, VERDICT
r12 tasks #3/#4): candidate edges only within nprobe=2 probed coarse
lists sized for ~256-member occupancy (KC = max(8, ⌈n/256⌉)), so
edge work is ~n·nprobe·256 — linear in n — with per-query edge
recall against the exact top-8 carried in-result. The graph (n·8
rows) is the persisted index artifact, localCheckpoint-ed here (the
bounded-materialization class: it IS the index); each hop is a
broadcast of the ≤|Q|-row frontier joined into the graph — per-hop
work O(|Q|·degree), independent of n, the defining property of graph
ANN serving."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from etl_mp_transactions_spark.queries.ivfpq_q import materialize_ctes
from etl_mp_transactions_spark.registry import query
from etl_mp_transactions_spark.sources.tables import load_table

_NQ = 8  # query batch: ids 0..7 (the hybrid/sem-arm contract)
_DEG = 8  # kNN graph out-degree
_HOPS = 8  # unrolled greedy hops
_DIM = 64


# ---------------------------------------------------------------- DuckDB

_L2 = (
    "CAST(list_sum(list_transform(generate_series(1, 64),"
    " j -> ({a}[j] - {b}[j]) * ({a}[j] - {b}[j]))) AS BIGINT)"
)


# IVF-seeded build parameters (VERDICT r12 task #3): coarse lists
# sized for ~bounded bucket occupancy so candidate-edge work is
# ~linear in n (nprobe·bucket per node), not n².
_GANN_TAG = ":gann-coarse-1"
_GANN_BUCKET = 256  # target coarse-list occupancy
_GANN_KC_MIN = 8
_GANN_NPROBE = 2  # probed lists per node (boundary recall)


def _ivf_knn_ctes(base_pred: str = "TRUE") -> str:
    """DuckDB twin of the IVF-seeded kNN-graph build, as CTE text
    (expects ``qv`` defined): md5-rank coarse seeds over the
    ``base_pred`` slice (KC = max(8, ⌈n/256⌉), data-derived in SQL so
    both engines agree at every SF), every node assigned to its
    nprobe nearest lists (exact integer d2, c-asc tiebreak),
    candidate edges = probed-list cohabitants by primary assignment,
    exact top-{_DEG} per node. Defines ``knn(src, dst, d2, rnk)``."""
    d2vc = _L2.format(a="v.qv", b="cb.ccqv")
    d2ab = _L2.format(a="a.qv", b="b.qv")
    rn_seed = (
        f"row_number() OVER (ORDER BY md5(vec_id::VARCHAR ||"
        f" '{_GANN_TAG}'), vec_id)"
    )
    return f"""qb AS (SELECT * FROM qv WHERE {base_pred}),
    cb AS (
      SELECT {rn_seed} - 1 AS c, qv AS ccqv
      FROM qb
      QUALIFY {rn_seed} <= (
        SELECT greatest({_GANN_KC_MIN},
                        (count(*) + {_GANN_BUCKET - 1}) // {_GANN_BUCKET})
        FROM qb)
    ),
    asg AS (
      SELECT vec_id, c, pr FROM (
        SELECT v.vec_id, cb.c,
               row_number() OVER (PARTITION BY v.vec_id
                                  ORDER BY {d2vc}, cb.c) AS pr
        FROM qv v CROSS JOIN cb
      ) WHERE pr <= {_GANN_NPROBE}
    ),
    mem AS (SELECT vec_id, c FROM asg WHERE pr = 1),
    gcand AS (
      SELECT p.vec_id AS src, m.vec_id AS dst
      FROM asg p JOIN mem m ON m.c = p.c AND m.vec_id <> p.vec_id
    ),
    knn AS (
      SELECT src, dst, d2,
             row_number() OVER (PARTITION BY src
                                ORDER BY d2, dst) AS rnk
      FROM (
        SELECT g.src, g.dst, {d2ab} AS d2
        FROM gcand g
        JOIN qv a ON a.vec_id = g.src
        JOIN qv b ON b.vec_id = g.dst
      )
      QUALIFY rnk <= {_DEG}
    )"""


def _graph_ctes(knn_ctes: str | None = None) -> str:
    """Walk CTEs over a kNN graph: ``knn_ctes`` supplies the CTE text
    defining ``knn(src, dst, …)`` (default: the exact n² build — the
    small-SF ground truth; the IVF-seeded build is the scale path)."""
    d2_ab = _L2.format(a="a.qv", b="b.qv")
    d2_node = _L2.format(a="v.qv", b="qs.qqv")
    if knn_ctes is None:
        knn_ctes = f"""knn AS (
      SELECT src, dst FROM (
        SELECT a.vec_id AS src, b.vec_id AS dst,
               row_number() OVER (PARTITION BY a.vec_id
                                  ORDER BY {d2_ab}, b.vec_id) AS rnk
        FROM qv a JOIN qv b ON a.vec_id <> b.vec_id
      ) WHERE rnk <= {_DEG}
    )"""
    hops = []
    for t in range(1, _HOPS + 1):
        hops.append(f""",
    cand{t} AS (
      SELECT query_id, node FROM hop{t - 1}
      UNION ALL
      SELECT h.query_id, g.dst AS node
      FROM hop{t - 1} h JOIN knn g ON g.src = h.node
    ),
    hop{t} AS (
      SELECT query_id, CAST({t} AS BIGINT) AS hop, node, d2 FROM (
        SELECT c.query_id, c.node, {_L2.format(a="v.qv", b="qs.qqv")} AS d2,
               row_number() OVER (PARTITION BY c.query_id
                                  ORDER BY {_L2.format(a="v.qv", b="qs.qqv")},
                                           c.node) AS rn
        FROM cand{t} c
        JOIN qv v ON v.vec_id = c.node
        JOIN qs ON qs.query_id = c.query_id
        WHERE c.node <> c.query_id
      ) WHERE rn = 1
    )""")
    return f"""qv AS (
      SELECT vec_id,
             list_transform(embedding,
                            x -> CAST(round(x * 1e6) AS BIGINT)) AS qv
      FROM embeddings
    ),
    qs AS (
      SELECT vec_id AS query_id, qv AS qqv FROM qv WHERE vec_id < {_NQ}
    ),
    {knn_ctes},
    entry AS (
      SELECT qs.query_id, min(v.vec_id) AS node
      FROM qs CROSS JOIN qv v WHERE v.vec_id <> qs.query_id
      GROUP BY 1
    ),
    hop0 AS (
      SELECT e.query_id, CAST(0 AS BIGINT) AS hop, e.node,
             {d2_node} AS d2
      FROM entry e
      JOIN qv v ON v.vec_id = e.node
      JOIN qs ON qs.query_id = e.query_id
    ){"".join(hops)},
    trajectory AS (
      {" UNION ALL ".join(f"SELECT query_id, hop, node, d2 FROM hop{t}" for t in range(_HOPS + 1))}
    )"""


_SEARCH_SQL = materialize_ctes(
    f"""WITH {_graph_ctes()}
    SELECT query_id, hop, node AS node_id, d2 FROM trajectory"""
)

_VERDICT_SQL = materialize_ctes(
    f"""WITH {_graph_ctes()},
    exactnn AS (
      SELECT query_id, node AS exact_nn, d2 AS exact_d2 FROM (
        SELECT qs.query_id, v.vec_id AS node,
               {_L2.format(a="v.qv", b="qs.qqv")} AS d2,
               row_number() OVER (PARTITION BY qs.query_id
                                  ORDER BY {_L2.format(a="v.qv", b="qs.qqv")},
                                           v.vec_id) AS rn
        FROM qs CROSS JOIN qv v WHERE v.vec_id <> qs.query_id
      ) WHERE rn = 1
    ),
    fin AS (
      SELECT query_id, node AS final_node, d2 AS final_d2
      FROM hop{_HOPS}
    ),
    conv AS (
      SELECT t.query_id, CAST(min(t.hop) AS BIGINT) AS converged_hop
      FROM trajectory t JOIN fin f ON f.query_id = t.query_id
                                  AND t.d2 = f.final_d2
      GROUP BY 1
    )
    SELECT f.query_id, f.final_node, f.final_d2,
           e.exact_nn, e.exact_d2,
           f.final_d2 = e.exact_d2 AS found_exact,
           c.converged_hop
    FROM fin f
    JOIN exactnn e ON e.query_id = f.query_id
    JOIN conv c ON c.query_id = f.query_id"""
)


# ----------------------------------------------------------------- Spark


def _quantized(emb: DataFrame) -> DataFrame:
    return emb.select(
        "vec_id",
        F.expr(
            "transform(embedding, x -> cast(round(x * 1e6) as bigint))"
        ).alias("qv"),
    )


def l2_knn_graph(
    emb: DataFrame, deg: int = _DEG, n_tiles: int = 8, n_chunks: int = 4
) -> DataFrame:
    """(src, dst): exact quantized-L2 top-``deg`` per node via the 2-D
    tiled cogroup (operators/ann.cosine_topk shape) with an int64
    numpy Gram per cell — every distance exact, no CartesianProduct,
    per-task memory bounded by the grid."""
    return l2_knn_topk(emb, emb, deg, n_tiles, n_chunks).select(
        "src", "dst"
    )


def _knn_cell_kernel(deg: int):
    """Per-cell exact top-``deg`` kernel shared by the tiled exact
    build and the IVF-bucketed build: left frame (vec_id, qv, …),
    right frame (nid, nqv, …) → (src, dst, d2) rows, self excluded,
    (d2, dst) tiebreak, int64-exact distances, query side blocked at
    512 rows to bound the per-task distance matrix."""
    import numpy as np
    import pandas as pd

    def local_knn(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        if not len(left) or not len(right):
            return pd.DataFrame(
                {"src": pd.Series(dtype="int64"),
                 "dst": pd.Series(dtype="int64"),
                 "d2": pd.Series(dtype="int64")}
            )
        # float64 matmul is EXACT here and hits BLAS (numpy int64
        # matmul is scalar loops, ~20× slower): every product ≤
        # (2.4e6)² ≈ 5.8e12 and every 64-term sum ≤ 64·that ≈
        # 3.7e14 < 2^53, so each d2 is an exactly-representable
        # integer; the int64 cast below is lossless.
        A = np.stack(left["qv"].to_numpy()).astype(np.float64)
        B = np.stack(right["nqv"].to_numpy()).astype(np.float64)
        src_ids = left["vec_id"].to_numpy()
        dst_ids = right["nid"].to_numpy()
        bn = (B * B).sum(axis=1)
        rows = []
        k = min(deg + 1, B.shape[0])  # +1: self may be in the cell
        for lo in range(0, A.shape[0], 512):
            Ab = A[lo : lo + 512]
            d2 = (
                (Ab * Ab).sum(axis=1)[:, None]
                + bn[None, :]
                - 2 * (Ab @ B.T)
            ).astype(np.int64)
            for r in range(d2.shape[0]):
                row = d2[r]
                if k < row.shape[0]:
                    # argpartition prunes, then an exact (d2, dst)
                    # lexsort over everything <= the k-th value keeps
                    # boundary ties deterministic
                    part = np.argpartition(row, k - 1)[:k]
                    thr = row[part].max()
                    sel = np.nonzero(row <= thr)[0]
                else:
                    sel = np.arange(row.shape[0])
                order = sel[np.lexsort((dst_ids[sel], row[sel]))][:k]
                sid = src_ids[lo + r]
                for c in order:
                    if dst_ids[c] != sid:
                        rows.append((sid, dst_ids[c], row[c]))
        return pd.DataFrame(rows, columns=["src", "dst", "d2"]).astype(
            "int64"
        )

    return local_knn


def l2_knn_topk(
    queries_emb: DataFrame,
    corpus_emb: DataFrame,
    deg: int = _DEG,
    n_tiles: int = 8,
    n_chunks: int = 4,
) -> DataFrame:
    """(src, dst, d2): exact top-``deg`` corpus neighbors per query
    vector (self excluded) — the generalized tiled build; queries and
    corpus may be different frames (the incremental-insert shapes)."""
    q = _quantized(corpus_emb)
    qq = _quantized(queries_emb)
    corpus = q.select(
        F.col("vec_id").alias("nid"),
        F.col("qv").alias("nqv"),
        F.pmod(F.col("vec_id"), F.lit(n_tiles)).cast("int").alias("ct"),
        F.explode(F.sequence(F.lit(0), F.lit(n_chunks - 1))).alias("qt"),
    )
    queries = qq.select(
        "*",
        F.pmod(F.col("vec_id"), F.lit(n_chunks)).cast("int").alias("qt"),
        F.explode(F.sequence(F.lit(0), F.lit(n_tiles - 1))).alias("ct"),
    )

    cand = (
        queries.groupBy("qt", "ct")
        .cogroup(corpus.groupBy("qt", "ct"))
        .applyInPandas(
            _knn_cell_kernel(deg), "src long, dst long, d2 long"
        )
    )
    w = Window.partitionBy("src").orderBy("d2", "dst")
    return (
        cand.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= deg)
        .select("src", "dst", "d2")
    )


def _d2_expr() -> F.Column:
    return F.expr(
        "aggregate(zip_with(qv, qqv, (x, y) -> (x - y) * (x - y)),"
        " 0L, (a, v) -> a + v)"
    )


def _trajectory(
    spark: SparkSession, sf_dir: str, knn: DataFrame | None = None
) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    q = _quantized(emb)
    qs = q.filter(F.col("vec_id") < _NQ).select(
        F.col("vec_id").alias("query_id"), F.col("qv").alias("qqv")
    )
    # the graph IS the index artifact — one bounded materialization
    if knn is None:
        knn = l2_knn_graph(emb)
    knn = knn.select("src", "dst").localCheckpoint()
    entry = (
        q.crossJoin(F.broadcast(qs.select("query_id")))
        .filter(F.col("vec_id") != F.col("query_id"))
        .groupBy("query_id")
        .agg(F.min("vec_id").alias("node"))
    )

    def scored(cands: DataFrame) -> DataFrame:
        # cands: (query_id, node); pick per-query argmin d2 to query
        return (
            cands.filter(F.col("node") != F.col("query_id"))
            .join(q.select(F.col("vec_id").alias("node"), "qv"), "node")
            .join(F.broadcast(qs), "query_id")
            .select("query_id", "node", _d2_expr().alias("d2"))
        )

    w = Window.partitionBy("query_id").orderBy("d2", "node")
    hop = (
        scored(entry)
        .select(
            "query_id", F.lit(0).cast("long").alias("hop"), "node", "d2"
        )
        .localCheckpoint()
    )
    traj = hop
    for t in range(1, _HOPS + 1):
        frontier = hop.select("query_id", "node")
        cands = frontier.unionByName(
            F.broadcast(frontier)
            .join(knn, frontier["node"] == knn["src"])
            .select("query_id", F.col("dst").alias("node"))
        )
        hop = (
            scored(cands)
            .withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select(
                "query_id",
                F.lit(t).cast("long").alias("hop"),
                "node",
                "d2",
            )
            .localCheckpoint()  # per-hop plan cut (frontier reused 2x)
        )
        traj = traj.unionByName(hop)
    return traj


@query("graph_ann_greedy_search", _SEARCH_SQL)
def graph_ann_greedy_search(spark, sf_dir):
    """Greedy best-first walk over the exact degree-8 kNN graph: the
    full hop-0..8 trajectory per query (monotone d2 by construction —
    the current node is always a candidate)."""
    return _trajectory(spark, sf_dir).select(
        "query_id", "hop", F.col("node").alias("node_id"), "d2"
    )


@query("graph_ann_search_verdict", _VERDICT_SQL)
def graph_ann_search_verdict(spark, sf_dir):
    """Per-query search-quality report: final node vs the true nearest
    neighbor (found_exact), plus the hop where the walk converged —
    the honest measure of plain-kNN-graph greedy search (no HNSW
    hierarchy)."""
    traj = _trajectory(spark, sf_dir).localCheckpoint()
    return _verdict_frame(spark, sf_dir, traj)


def _verdict_frame(spark, sf_dir, traj) -> DataFrame:
    """(query_id, final_node, final_d2, exact_nn, exact_d2,
    found_exact, converged_hop) from a finished walk trajectory —
    shared by the exact-build and IVF-build verdict queries."""
    emb = load_table(spark, sf_dir, "embeddings")
    q = _quantized(emb)
    qs = q.filter(F.col("vec_id") < _NQ).select(
        F.col("vec_id").alias("query_id"), F.col("qv").alias("qqv")
    )
    w = Window.partitionBy("query_id").orderBy("d2", "node")
    exactnn = (
        q.select(F.col("vec_id").alias("node"), "qv")
        .crossJoin(F.broadcast(qs))
        .filter(F.col("node") != F.col("query_id"))
        .select("query_id", "node", _d2_expr().alias("d2"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "query_id",
            F.col("node").alias("exact_nn"),
            F.col("d2").alias("exact_d2"),
        )
    )
    fin = traj.filter(F.col("hop") == _HOPS).select(
        "query_id",
        F.col("node").alias("final_node"),
        F.col("d2").alias("final_d2"),
    )
    conv = (
        traj.join(F.broadcast(fin), "query_id")
        .filter(F.col("d2") == F.col("final_d2"))
        .groupBy("query_id")
        .agg(F.min("hop").cast("long").alias("converged_hop"))
    )
    return (
        fin.join(exactnn, "query_id")
        .join(conv, "query_id")
        .select(
            "query_id",
            "final_node",
            "final_d2",
            "exact_nn",
            "exact_d2",
            (F.col("final_d2") == F.col("exact_d2")).alias("found_exact"),
            "converged_hop",
        )
    )


# ------------------------------------------------- IVF-seeded build
# (VERDICT r12 tasks #3/#4 — the scale-safe plan the module docstring
# promised): seed candidate edges from IVF coarse lists instead of
# all pairs. Coarse seeds are md5-rank picks (the operators/ivfpq.py
# coarse_books shape) but with KC = max(8, ceil(n/256)) so list
# occupancy stays ~bounded as n grows; every node probes its
# nprobe=2 nearest lists and considers only their members (by
# primary assignment) as edge candidates → candidate work ≈
# n·nprobe·256, LINEAR in n (vs the exact build's n²). Assignment
# is one vectorized n×KC scan (n·KC/…= n²/256 long-term; a
# production deployment replaces it with a tree/HNSW over the
# centroids — documented in SCALE.md). Edge quality is measured, not
# assumed: graph_ann_ivf_verdict carries per-query edge recall
# against the exact top-8 (bounded: exact GT computed for the |Q|=8
# query nodes only, O(|Q|·n)).


def gann_books(emb: DataFrame):
    """KC×DIM int64 coarse-centroid matrix: md5-rank seed pick over
    the quantized corpus, KC = max(8, ceil(n/256)) (parameter-bounded
    collect — the books ARE the index's coarse quantizer; row order
    c = 0..KC−1 matches the oracle's row_number() − 1)."""
    import numpy as np

    q = _quantized(emb)
    n = q.count()
    kc = max(_GANN_KC_MIN, (n + _GANN_BUCKET - 1) // _GANN_BUCKET)
    rows = (
        q.select(
            "vec_id",
            "qv",
            F.md5(
                F.concat(F.col("vec_id").cast("string"), F.lit(_GANN_TAG))
            ).alias("sk"),
        )
        .orderBy("sk", "vec_id")
        .limit(kc)
        .collect()
    )
    rows.sort(key=lambda r: (r["sk"], r["vec_id"]))
    return np.array([list(r["qv"]) for r in rows], dtype=np.int64)


def _probes_df(emb: DataFrame, books, nprobe: int) -> DataFrame:
    """(vec_id, c, qv): each vector's ``nprobe`` nearest coarse lists
    — ONE vectorized mapInPandas pass (numpy n_batch×KC exact int64
    distances, stable argsort ⇒ c-asc tiebreak, matching the oracle's
    (cd2, c) ordering); no shuffle, no row explosion."""
    import numpy as np
    import pandas as pd

    # exact-in-float64 BLAS distances (see _knn_cell_kernel: every
    # term < 2^53, so D holds exact integers)
    B = books.astype(np.float64)
    bn = (B * B).sum(axis=1)

    def fn(it):
        for pdf in it:
            if not len(pdf):
                continue
            V = np.stack(pdf["qv"].to_numpy()).astype(np.float64)
            D = (V * V).sum(axis=1)[:, None] + bn[None, :] - 2 * (V @ B.T)
            idx = np.argsort(D, axis=1, kind="stable")[:, :nprobe]
            out = pdf.loc[pdf.index.repeat(idx.shape[1])].copy()
            out["c"] = idx.reshape(-1).astype("int32")
            out["pr"] = np.tile(
                np.arange(1, idx.shape[1] + 1), len(pdf)
            ).astype("int32")
            yield out[["vec_id", "c", "pr", "qv"]]

    # micro-quantized components fit int32 (|qv| ≤ 2.4e6 < 2^31):
    # halving the Arrow payload halves the dominant build cost (the
    # probes frame's ser/de + checkpoint), and at 100 TB halves the
    # shuffled index-build bytes; the kernels stack to float64 anyway
    q32 = _quantized(emb).select(
        "vec_id", F.col("qv").cast("array<int>").alias("qv")
    )
    return q32.mapInPandas(fn, "vec_id long, c int, pr int, qv array<int>")


def ivf_knn_topk(
    queries_emb: DataFrame,
    corpus_emb: DataFrame,
    books,
    deg: int = _DEG,
    nprobe: int = _GANN_NPROBE,
) -> DataFrame:
    """(src, dst, d2): per query node, exact top-``deg`` among the
    corpus members (by primary assignment) of its ``nprobe`` probed
    coarse lists — the IVF-seeded candidate generation. One shuffle
    of n·(nprobe+1) rows by list id; per-list exact numpy kernel
    (the shared ``_knn_cell_kernel``); per-node global top-deg over
    ≤ nprobe·deg survivors. A (src, dst) pair cannot repeat: dst has
    exactly one primary list."""
    if queries_emb is corpus_emb:
        # self-build: ONE assignment pass serves both sides (probe
        # rank 1 IS the primary assignment) — the n-row probes frame
        # is cut so the cogroup's two inputs don't recompute it
        p = _probes_df(queries_emb, books, nprobe).localCheckpoint()
        qf = p.select("vec_id", "c", "qv")
        mf = p.filter(F.col("pr") == 1).select(
            F.col("vec_id").alias("nid"), "c", F.col("qv").alias("nqv")
        )
    else:
        qf = _probes_df(queries_emb, books, nprobe).select(
            "vec_id", "c", "qv"
        )
        mf = _probes_df(corpus_emb, books, 1).select(
            F.col("vec_id").alias("nid"), "c", F.col("qv").alias("nqv")
        )
    cand = (
        qf.groupBy("c")
        .cogroup(mf.groupBy("c"))
        .applyInPandas(_knn_cell_kernel(deg), "src long, dst long, d2 long")
    )
    w = Window.partitionBy("src").orderBy("d2", "dst")
    return (
        cand.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= deg)
        .select("src", "dst", "d2")
    )


_QV_CTE = """qv AS (
      SELECT vec_id,
             list_transform(embedding,
                            x -> CAST(round(x * 1e6) AS BIGINT)) AS qv
      FROM embeddings
    )"""

_IVF_BUILD_SQL = materialize_ctes(
    f"""WITH {_QV_CTE},
    {_ivf_knn_ctes()}
    SELECT src, dst, d2, CAST(rnk AS BIGINT) AS rnk FROM knn"""
)


@query("graph_ann_ivf_build", _IVF_BUILD_SQL)
def graph_ann_ivf_build(spark, sf_dir):
    """The IVF-seeded kNN-graph build (section comment): every edge
    exact within the probed-list candidate set, candidate work
    ~linear in n. This is the graph the at-scale walk serves from;
    the exact n² build stays as small-SF ground truth
    (graph_ann_greedy_search) and as the verdict's per-query recall
    reference."""
    emb = load_table(spark, sf_dir, "embeddings")
    books = gann_books(emb)
    w = Window.partitionBy("src").orderBy("d2", "dst")
    return (
        ivf_knn_topk(emb, emb, books)
        .withColumn("rnk", F.row_number().over(w).cast("long"))
        .select("src", "dst", "d2", "rnk")
    )


_IVF_VERDICT_SQL = materialize_ctes(
    f"""WITH {_graph_ctes(_ivf_knn_ctes())},
    exactnn AS (
      SELECT query_id, node AS exact_nn, d2 AS exact_d2 FROM (
        SELECT qs.query_id, v.vec_id AS node,
               {_L2.format(a="v.qv", b="qs.qqv")} AS d2,
               row_number() OVER (PARTITION BY qs.query_id
                                  ORDER BY {_L2.format(a="v.qv", b="qs.qqv")},
                                           v.vec_id) AS rn
        FROM qs CROSS JOIN qv v WHERE v.vec_id <> qs.query_id
      ) WHERE rn = 1
    ),
    exact8 AS (
      SELECT query_id, node FROM (
        SELECT qs.query_id, v.vec_id AS node,
               row_number() OVER (PARTITION BY qs.query_id
                                  ORDER BY {_L2.format(a="v.qv", b="qs.qqv")},
                                           v.vec_id) AS rn
        FROM qs CROSS JOIN qv v WHERE v.vec_id <> qs.query_id
      ) WHERE rn <= {_DEG}
    ),
    recall AS (
      SELECT e.query_id, CAST(count(k.dst) AS BIGINT) AS edge_recall8
      FROM exact8 e
      LEFT JOIN knn k ON k.src = e.query_id AND k.dst = e.node
      GROUP BY 1
    ),
    fin AS (
      SELECT query_id, node AS final_node, d2 AS final_d2
      FROM hop{_HOPS}
    ),
    conv AS (
      SELECT t.query_id, CAST(min(t.hop) AS BIGINT) AS converged_hop
      FROM trajectory t JOIN fin f ON f.query_id = t.query_id
                                  AND t.d2 = f.final_d2
      GROUP BY 1
    )
    SELECT f.query_id, f.final_node, f.final_d2,
           e.exact_nn, e.exact_d2,
           f.final_d2 = e.exact_d2 AS found_exact,
           c.converged_hop, r.edge_recall8
    FROM fin f
    JOIN exactnn e ON e.query_id = f.query_id
    JOIN conv c ON c.query_id = f.query_id
    JOIN recall r ON r.query_id = f.query_id"""
)


@query("graph_ann_ivf_verdict", _IVF_VERDICT_SQL)
def graph_ann_ivf_verdict(spark, sf_dir):
    """Honest quality report of the IVF-seeded graph, in the
    graph_ann_search_verdict shape plus per-query EDGE RECALL: the
    same greedy walk over the IVF-built graph, final node vs the
    true NN (exact corpus argmin — bounded, |Q|=8 queries only), and
    edge_recall8 = |ivf edges of the query node ∩ its exact top-8|
    (the ivfpq_recall_at5 discipline applied to graph edges). The
    walk is the existing O(|Q|·degree·hops) serving path; only the
    build changed — ~linear candidate work instead of n²."""
    emb = load_table(spark, sf_dir, "embeddings")
    books = gann_books(emb)
    knn = ivf_knn_topk(emb, emb, books).localCheckpoint()
    return _ivf_verdict_from(spark, sf_dir, knn)


def _ivf_verdict_from(spark, sf_dir, knn) -> DataFrame:
    """Walk + verdict + edge recall over a supplied IVF graph frame —
    shared by the direct and the persist/reload round-trip paths."""
    emb = load_table(spark, sf_dir, "embeddings")
    traj = _trajectory(spark, sf_dir, knn=knn).localCheckpoint()
    verdict = _verdict_frame(spark, sf_dir, traj)
    exact8 = l2_knn_topk(emb.filter(F.col("vec_id") < _NQ), emb).select(
        F.col("src").alias("query_id"), F.col("dst").alias("node")
    )
    # only the |Q| query nodes' edges matter for recall — filter
    # BEFORE broadcast (≤ |Q|·deg rows, never the whole graph)
    hits = knn.filter(F.col("src") < _NQ).select(
        F.col("src").alias("query_id"),
        F.col("dst").alias("node"),
        F.lit(1).alias("hit"),
    )
    recall = (
        exact8.join(F.broadcast(hits), ["query_id", "node"], "left")
        .groupBy("query_id")
        .agg(
            F.sum(F.coalesce(F.col("hit"), F.lit(0)))
            .cast("long")
            .alias("edge_recall8")
        )
    )
    return verdict.join(recall, "query_id")


_BASE_PRED = "vec_id % 10 <> 7"

_INCR_SQL = materialize_ctes(
    f"""WITH {_QV_CTE},
    {_ivf_knn_ctes(base_pred=_BASE_PRED)}
    SELECT src, dst, CAST(rnk AS BIGINT) AS rnk FROM knn"""
)


@query("graph_ann_incremental_insert", _INCR_SQL)
def graph_ann_incremental_insert(spark, sf_dir):
    """Graph-index maintenance — incremental INSERT pinned as
    insert == frozen-books rebuild (the FAISS ``add`` semantics; the
    graph-family sibling of ivfpq_upsert_serve), REWORKED in r13 to
    the IVF-seeded build (VERDICT r12 task #4 — the previous exact
    version was arrivals × full corpus, measured 34× at a 10× step):
    ~10% of vectors (vec_id % 10 == 7) arrive AFTER the base graph
    is built; the coarse books are FROZEN from the base corpus (a
    production index does not re-pick centroids on insert). Arriving
    nodes probe their nprobe lists and edge against the members;
    each base node re-ranks over (its old edges ∪ the arrivals in
    its probed lists) — an EXACT identity with frozen books, since
    the rebuild's candidate set for any node is exactly the union.
    The oracle IS the frozen-books rebuild; work is ~linear in
    n + arrivals."""
    emb = load_table(spark, sf_dir, "embeddings")
    base = emb.filter(F.expr(_BASE_PRED))
    arriving = emb.filter(~F.expr(_BASE_PRED))
    books = gann_books(base)
    w = Window.partitionBy("src").orderBy("d2", "dst")
    base_graph = ivf_knn_topk(base, base, books)
    base_cand = ivf_knn_topk(base, arriving, books)
    upd = (
        base_graph.unionByName(base_cand)
        .withColumn("rnk", F.row_number().over(w).cast("long"))
        .filter(F.col("rnk") <= _DEG)
    )
    arr_edges = ivf_knn_topk(arriving, emb, books).withColumn(
        "rnk", F.row_number().over(w).cast("long")
    )
    return upd.select("src", "dst", "rnk").unionByName(
        arr_edges.select("src", "dst", "rnk")
    )


# ------------------------------------------ two-level assignment audit
# The IVF build's one honest caveat (SCALE.md r13) is the flat n×KC
# coarse-assignment scan — n²/256 long-term. The standard fix is a
# hierarchy over the centroids (FAISS IMI / HNSW-quantizer): probe a
# √KC-sized top level, then scan only the centroids in the probed
# super-lists. This audit query runs BOTH assignments in one corpus
# pass and reports exactly what the hierarchy trades: per-node
# agreement with the flat argmin (basis points) and the exact
# centroid-evaluation counts — the measured evidence for (or against)
# switching the build's assignment at a given corpus. Everything is
# deterministic (md5-rank super seeds, exact integer distances,
# c-asc tiebreaks) with a full DuckDB twin.

_GANN_SUPER_TAG = ":gann-super-1"
_GANN_SUPER_PROBE = 2


def _hier_audit_sql() -> str:
    d2 = "CAST(list_sum(list_transform(generate_series(1, 64), j -> ({a}[j] - {b}[j]) * ({a}[j] - {b}[j]))) AS BIGINT)"
    d2_cs = d2.format(a="cb.ccqv", b="sb.scqv")
    d2_vs = d2.format(a="v.qv", b="sb.scqv")
    d2_vc = d2.format(a="v.qv", b="cb.ccqv")
    rn_seed = (
        f"row_number() OVER (ORDER BY md5(vec_id::VARCHAR ||"
        f" '{_GANN_TAG}'), vec_id)"
    )
    rn_super = (
        f"row_number() OVER (ORDER BY md5(c::VARCHAR ||"
        f" '{_GANN_SUPER_TAG}'), c)"
    )
    return materialize_ctes(f"""WITH {_QV_CTE},
    cb AS (
      SELECT {rn_seed} - 1 AS c, qv AS ccqv
      FROM qv
      QUALIFY {rn_seed} <= (
        SELECT greatest({_GANN_KC_MIN},
                        (count(*) + {_GANN_BUCKET - 1}) // {_GANN_BUCKET})
        FROM qv)
    ),
    ks AS (
      SELECT greatest(2, CAST(ceil(sqrt(count(*))) AS BIGINT)) AS ks1
      FROM cb
    ),
    sb AS (
      SELECT {rn_super} - 1 AS s, c AS sc, ccqv AS scqv
      FROM cb
      QUALIFY {rn_super} <= (SELECT ks1 FROM ks)
    ),
    casg AS (
      SELECT c, s FROM (
        SELECT cb.c, sb.s,
               row_number() OVER (PARTITION BY cb.c
                                  ORDER BY {d2_cs}, sb.s) AS rn
        FROM cb CROSS JOIN sb
      ) WHERE rn = 1
    ),
    nprob AS (
      SELECT vec_id, s FROM (
        SELECT v.vec_id, sb.s,
               row_number() OVER (PARTITION BY v.vec_id
                                  ORDER BY {d2_vs}, sb.s) AS pr
        FROM qv v CROSS JOIN sb
      ) WHERE pr <= {_GANN_SUPER_PROBE}
    ),
    flat AS (
      SELECT vec_id, c AS flat_c FROM (
        SELECT v.vec_id, cb.c,
               row_number() OVER (PARTITION BY v.vec_id
                                  ORDER BY {d2_vc}, cb.c) AS rn
        FROM qv v CROSS JOIN cb
      ) WHERE rn = 1
    ),
    hier AS (
      SELECT vec_id, c AS hier_c, cnt FROM (
        SELECT p.vec_id, cb.c,
               row_number() OVER (PARTITION BY p.vec_id
                                  ORDER BY {d2_vc}, cb.c) AS rn,
               count(*) OVER (PARTITION BY p.vec_id) AS cnt
        FROM nprob p
        JOIN casg ca ON ca.s = p.s
        JOIN cb ON cb.c = ca.c
        JOIN qv v ON v.vec_id = p.vec_id
      ) WHERE rn = 1
    )
    SELECT CAST(count(*) AS BIGINT) AS n,
           (SELECT CAST(count(*) AS BIGINT) FROM cb) AS kc,
           (SELECT ks1 FROM ks) AS ks1,
           CAST(sum(CASE WHEN f.flat_c = h.hier_c
                    THEN 1 ELSE 0 END) AS BIGINT) AS agree,
           (sum(CASE WHEN f.flat_c = h.hier_c THEN 1 ELSE 0 END)
            * 10000) // count(*) AS agree_bp,
           CAST(count(*) AS BIGINT)
             * (SELECT count(*) FROM cb) AS evals_flat,
           (SELECT ks1 FROM ks) * CAST(count(*) AS BIGINT)
             + CAST(sum(h.cnt) AS BIGINT) AS evals_hier
    FROM flat f JOIN hier h USING (vec_id)""")


@query("graph_ann_hier_assign_audit", _hier_audit_sql())
def graph_ann_hier_assign_audit(spark, sf_dir):
    """Two-level coarse-assignment audit (section comment): md5-rank
    ⌈√KC⌉ super-seeds among the KC centroids, assign each centroid to
    its nearest super-list, probe each node's top-2 super-lists, and
    argmin only over their member centroids. ONE vectorized corpus
    pass computes BOTH assignments per node (exact float64-integer
    distances, c-asc tiebreaks) and map-side-combines three counters;
    the result row carries the agreement rate (basis points) and the
    exact centroid-evaluation counts of each strategy — at 100 TB
    this is the audit a deployment runs on a sample before switching
    the index build to hierarchical assignment. Measured on THIS
    corpus (sf10: kc=782, ks1=28): agree_bp ≈ 2500 at a 9.3× eval
    saving — the synthetic embeddings are near-uniform random, the
    known worst case for centroid hierarchies (many near-equidistant
    centroids), so the audit correctly says DON'T switch here; on a
    clustered real corpus the same audit reads high agreement. The
    honest-verdict discipline: the query measures the trade, it does
    not assume it."""
    import math

    import numpy as np
    import pandas as pd

    emb = load_table(spark, sf_dir, "embeddings")
    books = gann_books(emb)
    kc = books.shape[0]
    s_int = math.isqrt(kc)
    ks1 = max(2, s_int if s_int * s_int == kc else s_int + 1)
    import hashlib

    order = sorted(
        range(kc),
        key=lambda c: (
            hashlib.md5(f"{c}{_GANN_SUPER_TAG}".encode()).hexdigest(),
            c,
        ),
    )[:ks1]
    Bf = books.astype(np.float64)
    S = Bf[order]
    # each centroid's super list ((d2, s) argmin; stable = s-asc ties)
    dcs = ((Bf[:, None, :] - S[None, :, :]) ** 2).sum(axis=2)
    super_of_c = dcs.argmin(axis=1)
    sup_mask = np.zeros((ks1, kc), dtype=bool)
    sup_mask[super_of_c, np.arange(kc)] = True
    bn = (Bf * Bf).sum(axis=1)
    sn = (S * S).sum(axis=1)

    def fn(it):
        for pdf in it:
            if not len(pdf):
                continue
            V = np.stack(pdf["qv"].to_numpy()).astype(np.float64)
            D = (V * V).sum(axis=1)[:, None] + bn[None, :] - 2 * (V @ Bf.T)
            flat = D.argmin(axis=1)  # first min = lowest c on ties
            Ds = (V * V).sum(axis=1)[:, None] + sn[None, :] - 2 * (V @ S.T)
            top2 = np.argsort(Ds, axis=1, kind="stable")[
                :, :_GANN_SUPER_PROBE
            ]
            rowmask = sup_mask[top2[:, 0]]
            for j in range(1, top2.shape[1]):
                rowmask = rowmask | sup_mask[top2[:, j]]
            Dm = np.where(rowmask, D, np.inf)
            hier = Dm.argmin(axis=1)
            yield pd.DataFrame(
                {
                    "cnt": [len(pdf)],
                    "agree": [int((flat == hier).sum())],
                    "cands": [int(rowmask.sum())],
                }
            )

    q32 = _quantized(emb).select(
        "vec_id", F.col("qv").cast("array<int>").alias("qv")
    )
    parts = q32.mapInPandas(fn, "cnt long, agree long, cands long")
    return parts.agg(
        F.sum("cnt").alias("n_"),
        F.sum("agree").alias("agree_"),
        F.sum("cands").alias("cands_"),
    ).select(
        F.col("n_").alias("n"),
        F.lit(kc).cast("long").alias("kc"),
        F.lit(ks1).cast("long").alias("ks1"),
        F.col("agree_").alias("agree"),
        F.expr("div(agree_ * 10000, n_)").alias("agree_bp"),
        (F.col("n_") * F.lit(kc)).cast("long").alias("evals_flat"),
        (F.col("n_") * F.lit(ks1) + F.col("cands_"))
        .cast("long")
        .alias("evals_hier"),
    )


@query("r25_stream_graph_insert", _INCR_SQL)
def r25_stream_graph_insert(spark, sf_dir):
    """Streaming IVF-graph maintenance (20th stream==batch pin;
    streaming/filesource.stream_graph_insert_run): coarse books are
    FROZEN from the base slice ({_BASE_PRED}); the arriving slice
    streams in as four mtime-ordered files — one micro-batch each —
    plus a replay of the first file that must contribute zero (the
    already-a-member anti-join + per-batch partition overwrite, the
    r17/r19 no-ledger construction). The graph state is per-batch
    IMMUTABLE top-8 edge fragments; the final per-src re-rank over
    all fragments must equal the batch frozen-books rebuild bit for
    bit — the SAME oracle as graph_ann_incremental_insert."""
    import os
    import shutil
    import uuid

    from etl_mp_transactions_spark.streaming import filesource
    from etl_mp_transactions_spark.workdirs import run_dir

    emb = load_table(spark, sf_dir, "embeddings")
    work = run_dir("r25_graph")
    stage = os.path.join(work, "in")
    os.makedirs(stage, exist_ok=True)
    arriving = emb.filter(~F.expr(_BASE_PRED)).withColumn(
        "g", F.expr("(vec_id div 10) % 4")
    )
    t0 = 1700000000
    for g in range(4):
        tmp = os.path.join(work, f"tmp{g}")
        arriving.filter(F.col("g") == g).drop("g").coalesce(1).write.mode(
            "overwrite"
        ).parquet(tmp)
        part = next(
            f for f in os.listdir(tmp)
            if f.endswith(".parquet") and not f.startswith("_")
        )
        dst = os.path.join(stage, f"f{g}.parquet")
        shutil.move(os.path.join(tmp, part), dst)
        os.utime(dst, (t0 + 10 * g, t0 + 10 * g))
    rp = os.path.join(stage, f"replay-{uuid.uuid4().hex[:8]}.parquet")
    shutil.copy(os.path.join(stage, "f0.parquet"), rp)
    os.utime(rp, (t0 + 40, t0 + 40))
    base = emb.filter(F.expr(_BASE_PRED))
    books = gann_books(base)
    return filesource.stream_graph_insert_run(
        spark,
        stage,
        os.path.join(work, "ckpt"),
        os.path.join(work, "state"),
        base,
        books,
    )


@query("graph_ann_index_roundtrip", _IVF_VERDICT_SQL)
def graph_ann_index_roundtrip(spark, sf_dir):
    """Graph-index artifact round trip (the ivfpq_index_roundtrip
    discipline applied to the graph family): build the IVF-seeded
    graph, PERSIST it as the parquet index artifact, reload it cold,
    and serve the full walk + verdict + edge-recall path from the
    reloaded frame. The oracle is the direct path's — byte-identical
    serving from a reloaded artifact is the pinned property (a
    deployed graph index is always served from storage, never from
    the builder's memory)."""
    import os

    from etl_mp_transactions_spark.workdirs import run_dir

    emb = load_table(spark, sf_dir, "embeddings")
    books = gann_books(emb)
    art = os.path.join(run_dir("gann_idx"), "graph")
    ivf_knn_topk(emb, emb, books).write.mode("overwrite").parquet(art)
    reloaded = spark.read.schema("src long, dst long, d2 long").parquet(
        art
    )
    return _ivf_verdict_from(spark, sf_dir, reloaded)


# ------------------------------------------------- filtered walk
# Metadata-filtered graph search, post-filter flavor: walk the
# UNFILTERED graph (the serving path already pinned above), then
# answer the filtered query from the walk's VISITED SET — the
# candidates the walk actually scored. The honest question this
# answers (the ivfpq_filtered_* sibling): how often does the
# unfiltered walk's neighborhood contain the true label-matching
# nearest neighbor? Production systems that need guarantees expand
# neighbor lists under the filter (ACORN); this measures whether
# that machinery is even needed at a given selectivity.

_FILT_WALK_SQL = materialize_ctes(
    f"""WITH {_graph_ctes(_ivf_knn_ctes())},
    visited AS (
      SELECT DISTINCT query_id, node FROM (
        SELECT query_id, node FROM trajectory
        UNION ALL
        SELECT t.query_id, k.dst AS node
        FROM trajectory t JOIN knn k ON k.src = t.node
      )
    ),
    qlab AS (
      SELECT vec_id AS query_id, label AS ql FROM embeddings
      WHERE vec_id < {_NQ}
    ),
    filt AS (
      SELECT query_id, node, d2 FROM (
        SELECT w.query_id, w.node,
               {_L2.format(a="v.qv", b="qs.qqv")} AS d2,
               row_number() OVER (PARTITION BY w.query_id
                                  ORDER BY {_L2.format(a="v.qv", b="qs.qqv")},
                                           w.node) AS rn
        FROM visited w
        JOIN embeddings e ON e.vec_id = w.node
        JOIN qlab q ON q.query_id = w.query_id AND e.label = q.ql
        JOIN qv v ON v.vec_id = w.node
        JOIN qs ON qs.query_id = w.query_id
        WHERE w.node <> w.query_id
      ) WHERE rn = 1
    ),
    exactf AS (
      SELECT query_id, node, d2 FROM (
        SELECT qs.query_id, v.vec_id AS node,
               {_L2.format(a="v.qv", b="qs.qqv")} AS d2,
               row_number() OVER (PARTITION BY qs.query_id
                                  ORDER BY {_L2.format(a="v.qv", b="qs.qqv")},
                                           v.vec_id) AS rn
        FROM qs
        JOIN qlab q ON q.query_id = qs.query_id
        JOIN embeddings e ON e.label = q.ql
        JOIN qv v ON v.vec_id = e.vec_id
        WHERE v.vec_id <> qs.query_id
      ) WHERE rn = 1
    )
    SELECT q.query_id, CAST(q.ql AS BIGINT) AS qlabel,
           f.node AS filt_node, f.d2 AS filt_d2,
           e.node AS exact_filt_nn, e.d2 AS exact_filt_d2,
           f.d2 = e.d2 AS found_exact
    FROM qlab q
    LEFT JOIN filt f USING (query_id)
    LEFT JOIN exactf e USING (query_id)"""
)


@query("graph_ann_filtered_walk", _FILT_WALK_SQL)
def graph_ann_filtered_walk(spark, sf_dir):
    """Label-filtered search over the IVF graph (section comment):
    the unfiltered greedy walk's visited set (hop nodes ∪ their
    neighbor lists — everything the walk scored), post-filtered to
    the query's label, argmin — reported against the exact filtered
    NN (bounded GT: |Q|·n label-matching argmin). found_exact
    measures per query whether post-filtering the walk suffices at
    this selectivity or ACORN-style filtered expansion is needed."""
    emb = load_table(spark, sf_dir, "embeddings")
    books = gann_books(emb)
    knn = ivf_knn_topk(emb, emb, books).select("src", "dst").localCheckpoint()
    traj = _trajectory(spark, sf_dir, knn=knn).localCheckpoint()
    q = _quantized(emb)
    qs = q.filter(F.col("vec_id") < _NQ).select(
        F.col("vec_id").alias("query_id"), F.col("qv").alias("qqv")
    )
    qlab = emb.filter(F.col("vec_id") < _NQ).select(
        F.col("vec_id").alias("query_id"), F.col("label").alias("ql")
    )
    visited = (
        traj.select("query_id", "node")
        .unionByName(
            F.broadcast(traj.select("query_id", "node"))
            .join(knn, traj["node"] == knn["src"])
            .select("query_id", F.col("dst").alias("node"))
        )
        .distinct()
    )
    lab = emb.select(F.col("vec_id").alias("node"), "label")
    w = Window.partitionBy("query_id").orderBy("d2", "node")
    filt = (
        visited.join(lab, "node")
        .join(F.broadcast(qlab), "query_id")
        .filter(
            (F.col("label") == F.col("ql"))
            & (F.col("node") != F.col("query_id"))
        )
        .join(q.select(F.col("vec_id").alias("node"), "qv"), "node")
        .join(F.broadcast(qs), "query_id")
        .select("query_id", "node", _d2_expr().alias("d2"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "query_id",
            F.col("node").alias("filt_node"),
            F.col("d2").alias("filt_d2"),
        )
    )
    exactf = (
        q.select(F.col("vec_id").alias("node"), "qv")
        .join(lab, "node")
        .crossJoin(F.broadcast(qs.join(qlab, "query_id")))
        .filter(
            (F.col("label") == F.col("ql"))
            & (F.col("node") != F.col("query_id"))
        )
        .select("query_id", "node", _d2_expr().alias("d2"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "query_id",
            F.col("node").alias("exact_filt_nn"),
            F.col("d2").alias("exact_filt_d2"),
        )
    )
    return (
        qlab.select("query_id", F.col("ql").cast("long").alias("qlabel"))
        .join(filt, "query_id", "left")
        .join(exactf, "query_id", "left")
        .select(
            "query_id",
            "qlabel",
            "filt_node",
            "filt_d2",
            "exact_filt_nn",
            "exact_filt_d2",
            (F.col("filt_d2") == F.col("exact_filt_d2")).alias(
                "found_exact"
            ),
        )
    )
