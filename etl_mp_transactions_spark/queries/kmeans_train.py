"""Full k-means training over the embeddings table (SURVEY.md §2.9 ML
family): kmeans_lloyd_step (queries/mlops.py) is ONE exact Lloyd
iteration; this runs the whole training — md5 seeds → KM_ITERS
refinement steps → final assignment — with the per-step inertia
TRAJECTORY carried in-result, so k-means' defining property (total
distortion weakly decreases every iteration, up to the <1-per-dim
floor rounding of integer means) is driver-checkable, not just
test-asserted.

Machinery is operators/ivfpq_train.py lloyd_refine_coarse verbatim
(exact BIGINT distances, floor-division means, empty-cluster carry,
K-row freeze collects between steps) pointed at K_CLUSTERS generic
clusters instead of IVF coarse lists; the DuckDB oracle replays the
unrolled loop with the shared _coarse_iter_sql-style CTEs.

Scale: each step is one n×K broadcast-argmin stream + one 64-sum
grouped aggregate, both map-side combined; the corpus never
shuffles; the only collects are the K-row freezes (documented
bounded class). Fixed iteration count is the standard production
shape — convergence monitoring reads the inertia column this query
already outputs.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_mp_transactions_spark.operators import ivfpq_train
from etl_mp_transactions_spark.operators.pq import PQ_M, PQ_SUB, _quantized
from etl_mp_transactions_spark.queries.ivfpq_train_q import (
    _FDIV,
    _L2,
)
from etl_mp_transactions_spark.registry import query
from etl_mp_transactions_spark.sources.tables import load_table

KM_K = 8
KM_ITERS = 3
KM_SEED_TAG = ":kmtrain-seed-1"
_DIM = PQ_M * PQ_SUB


def _iter_sql(t: int) -> str:
    """One unrolled Lloyd step kb{t-1} → kb{t} plus that step's
    assignment stats (kst{t} carries per-cluster counts; kin{t} the
    step's total inertia BEFORE the update — the trajectory value)."""
    d2 = _L2.format(dim=_DIM, a="q.qv", b="b.ckv", off="")
    fd = _FDIV.format(s="s", n="n")
    return f"""
    kasg{t} AS (
      SELECT vec_id, c, d2 FROM (
        SELECT q.vec_id, b.c, {d2} AS d2
        FROM q CROSS JOIN kb{t - 1} b
        QUALIFY row_number() OVER (PARTITION BY q.vec_id
                                   ORDER BY d2, b.c) = 1
      )
    ),
    kin{t} AS (SELECT CAST(sum(d2) AS BIGINT) AS inertia FROM kasg{t}),
    kst{t} AS (
      SELECT a.c, u.pos,
             CAST(sum(q.qv[u.pos]) AS BIGINT) AS s,
             CAST(count(*) AS BIGINT) AS n
      FROM kasg{t} a JOIN q USING (vec_id),
           unnest(generate_series(1, {_DIM})) AS u(pos)
      GROUP BY 1, 2
    ),
    knew{t} AS (
      SELECT c, list({fd} ORDER BY pos) AS nqv
      FROM kst{t} GROUP BY c
    ),
    kb{t} AS (
      SELECT b.c, coalesce(w.nqv, b.ckv) AS ckv
      FROM kb{t - 1} b LEFT JOIN knew{t} w USING (c)
    )"""


def _kmeans_ctes() -> str:
    parts = [f"""q AS (
      SELECT vec_id,
             list_transform(embedding,
                            x -> CAST(round(x * 1e6) AS BIGINT)) AS qv
      FROM embeddings
    ),
    kb0 AS (
      SELECT row_number() OVER (
               ORDER BY md5(vec_id::VARCHAR || '{KM_SEED_TAG}'),
                        vec_id) - 1 AS c,
             qv AS ckv
      FROM q
      QUALIFY row_number() OVER (
               ORDER BY md5(vec_id::VARCHAR || '{KM_SEED_TAG}'),
                        vec_id) <= {KM_K}
    )"""]
    parts.extend(_iter_sql(t) for t in range(1, KM_ITERS + 1))
    # final assignment against the trained centroids
    d2 = _L2.format(dim=_DIM, a="q.qv", b="b.ckv", off="")
    parts.append(f"""kfin AS (
      SELECT vec_id, c, d2 FROM (
        SELECT q.vec_id, b.c, {d2} AS d2
        FROM q CROSS JOIN kb{KM_ITERS} b
        QUALIFY row_number() OVER (PARTITION BY q.vec_id
                                   ORDER BY d2, b.c) = 1
      )
    )""")
    return ",".join(parts)


_TRAJ_UNION = " UNION ALL ".join(
    f"SELECT {t} AS step, inertia FROM kin{t}"
    for t in range(1, KM_ITERS + 1)
)


@query(
    "kmeans_train_trajectory",
    f"""
    WITH {_kmeans_ctes()},
    traj AS (
      {_TRAJ_UNION}
      UNION ALL
      SELECT {KM_ITERS + 1} AS step,
             CAST(sum(d2) AS BIGINT) AS inertia
      FROM kfin
    )
    SELECT CAST(step AS BIGINT) AS step, inertia,
           inertia <= coalesce(lag(inertia) OVER (ORDER BY step),
                               inertia) AS monotone
    FROM traj
    ORDER BY step
    """,
)
def kmeans_train_trajectory(spark, sf_dir):
    """The full k-means training trajectory: inertia of the
    assignment against the books of every iteration (step t = against
    kb{{t-1}}, the value Lloyd's update then improves; the last row is
    the final trained assignment), plus the per-step ``monotone``
    flag — k-means' convergence guarantee as a driver-checked value.
    Exact BIGINT inertia; DuckDB replays the whole unrolled loop."""
    emb = load_table(spark, sf_dir, "embeddings")
    q = _quantized(emb, "vec_id")
    seq = _books_seq(spark, sf_dir, emb)
    rows = []
    for t in range(1, KM_ITERS + 2):
        books = seq[t - 1]
        d2 = F.expr(_L2_SPARK.format(a="qv", b="ckv"))
        asg = (
            q.crossJoin(F.broadcast(books))
            .select("vec_id", "c", d2.alias("d2"))
            .groupBy("vec_id")
            .agg(F.min(F.struct("d2", "c")).alias("b"))
            .select(F.col("b.d2").alias("d2"))
        )
        rows.append(
            asg.agg(F.sum("d2").cast("bigint").alias("inertia")).select(
                F.lit(t).cast("bigint").alias("step"), "inertia"
            )
        )
    from functools import reduce

    from pyspark.sql import DataFrame, Window

    traj = reduce(DataFrame.unionAll, rows)
    w = Window.orderBy("step")
    return traj.select(
        "step",
        "inertia",
        (
            F.col("inertia")
            <= F.coalesce(F.lag("inertia").over(w), F.col("inertia"))
        ).alias("monotone"),
    ).orderBy("step")


_L2_SPARK = (
    "aggregate(zip_with({a}, {b}, (x, y) -> (x - y) * (x - y)),"
    " cast(0 as bigint), (acc, v) -> acc + v)"
)


def _seed_books(emb):
    q = _quantized(emb, "vec_id")
    rows = (
        q.select(
            "vec_id",
            "qv",
            F.md5(
                F.concat(F.col("vec_id").cast("string"), F.lit(KM_SEED_TAG))
            ).alias("sk"),
        )
        .orderBy("sk", "vec_id")
        .limit(KM_K)
        .collect()
    )
    rows.sort(key=lambda r: (r["sk"], r["vec_id"]))
    return emb.sparkSession.createDataFrame(
        [(c, list(r["qv"])) for c, r in enumerate(rows)],
        "c int, ckv array<bigint>",
    )


# (applicationId, sf_dir) -> [step-0 seed rows, step-1 rows, …,
# step-KM_ITERS rows]: the trained-book memo pattern
# (operators/ivfpq_train.py _BOOK_MEMO) for the k-means family. Every
# step is already a bounded K-row collect (the freeze the unrolled
# oracle mirrors), so memoizing the rows adds nothing the training
# doesn't already hold on the driver; trajectory and assign otherwise
# each replay the identical seed collect + KM_ITERS Lloyd collects
# per call.
_BOOKS_MEMO: dict = {}


def _books_seq(spark, sf_dir, emb) -> list:
    """The per-step trained books [seeds, kb1, …, kb{KM_ITERS}] as
    DataFrames, computed once per (session, corpus)."""
    key = (spark.sparkContext.applicationId, sf_dir)
    got = _BOOKS_MEMO.get(key)
    if got is None:
        q = _quantized(emb, "vec_id")
        books = _seed_books(emb)
        got = [[(r[0], list(r[1])) for r in books.collect()]]
        for _ in range(KM_ITERS):
            books = _one_step(q, books)
            got.append([(r[0], list(r[1])) for r in books.collect()])
        _BOOKS_MEMO[key] = got
    return [
        spark.createDataFrame(rows, "c int, ckv array<bigint>")
        for rows in got
    ]


def _one_step(q, books):
    """One exact Lloyd step on (c, ckv) books — the
    operators/ivfpq_train.py lloyd_refine_coarse body under this
    module's column names (frozen via the bounded K-row collect)."""
    d2 = F.expr(_L2_SPARK.format(a="qv", b="ckv"))
    asg = (
        q.crossJoin(F.broadcast(books))
        .select("vec_id", "qv", "c", d2.alias("d2"))
        .groupBy("vec_id")
        .agg(
            F.min(F.struct("d2", "c")).alias("b"),
            F.first("qv").alias("qv"),
        )
        .select(F.col("b.c").alias("c"), "qv")
    )
    upd = asg.groupBy("c").agg(
        F.count("*").cast("bigint").alias("n"),
        *[
            F.sum(F.expr(f"qv[{i}]")).cast("bigint").alias(f"s{i}")
            for i in range(_DIM)
        ],
    )
    newv = F.array(
        *[ivfpq_train._fdiv(F.col(f"s{i}"), F.col("n")) for i in range(_DIM)]
    )
    out = books.join(upd, "c", "left").select(
        "c",
        F.when(F.col("n").isNull(), F.col("ckv"))
        .otherwise(newv)
        .alias("ckv"),
    )
    rows = out.collect()
    rows.sort(key=lambda r: r[0])
    return q.sparkSession.createDataFrame(
        [(r[0], list(r[1])) for r in rows], "c int, ckv array<bigint>"
    )


@query(
    "kmeans_train_assign",
    f"""
    WITH {_kmeans_ctes()}
    SELECT vec_id, CAST(c AS BIGINT) AS cluster, d2 AS dist2
    FROM kfin
    ORDER BY vec_id
    """,
)
def kmeans_train_assign(spark, sf_dir):
    """Per-vector cluster assignment against the TRAINED centroids
    ({KM_ITERS} exact Lloyd steps from md5 seeds) with the exact
    squared distance — the deployable clustering (embedding-space
    corpus partitioning for semantic dedup / curriculum bucketing).
    kmeans_lloyd_step pins one iteration; this pins the trained
    endpoint."""
    emb = load_table(spark, sf_dir, "embeddings")
    q = _quantized(emb, "vec_id")
    books = _books_seq(spark, sf_dir, emb)[-1]
    d2 = F.expr(_L2_SPARK.format(a="qv", b="ckv"))
    return (
        q.crossJoin(F.broadcast(books))
        .select("vec_id", "c", d2.alias("d2"))
        .groupBy("vec_id")
        .agg(F.min(F.struct("d2", "c")).alias("b"))
        .select(
            "vec_id",
            F.col("b.c").cast("bigint").alias("cluster"),
            F.col("b.d2").alias("dist2"),
        )
        .orderBy("vec_id")
    )
