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
    Exact BIGINT inertia; DuckDB replays the whole unrolled loop.

    r16 pass structure: the training passes already assign every
    vector against kb{{t-1}}, so each step's inertia is the sum of the
    per-cluster d2 sums the update aggregate collects anyway — steps
    1..{KM_ITERS} cost ZERO extra passes, and only the final-books
    assignment (step {KM_ITERS + 1}) runs one more corpus aggregate.
    The former shape re-ran one full argmin pass per trajectory row
    on top of the training's own passes."""
    emb = load_table(spark, sf_dir, "embeddings")
    # one scan+quantize per call: the seed TakeOrdered and every
    # Lloyd-step aggregate read the materialized quantized corpus
    # (lazy localCheckpoint) instead of re-scanning parquet per job
    q = _quantized(emb, "vec_id").localCheckpoint(eager=False)
    _seq, inertias = _train_books(q)
    final_books = _seq[-1]
    from etl_mp_transactions_spark.functions.literalframe import (
        literal_frame,
    )

    # one JVM-literal frame of the training-step inertias (not one
    # pickled-row frame per step) unioned with the single computed
    # final-assignment aggregate
    train_rows = literal_frame(
        spark,
        list(enumerate(inertias, start=1)),
        "step bigint, inertia bigint",
    )
    d2 = _argmin_struct(final_books)["d2"]
    final_row = (
        q.select(d2.alias("d2"))
        .agg(F.sum("d2").cast("bigint").alias("inertia"))
        .select(
            F.lit(KM_ITERS + 1).cast("bigint").alias("step"), "inertia"
        )
    )
    from pyspark.sql import Window

    traj = train_rows.unionAll(final_row)
    w = Window.orderBy("step")
    return traj.select(
        "step",
        "inertia",
        (
            F.col("inertia")
            <= F.coalesce(F.lag("inertia").over(w), F.col("inertia"))
        ).alias("monotone"),
    ).orderBy("step")


def _seed_rows(q) -> list[tuple[int, list[int]]]:
    """The KM_K md5-rank seed books as collected (c, ckv) rows
    (TakeOrderedAndProject + bounded K-row collect) over the
    quantized corpus ``q``."""
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
    return [(c, [int(x) for x in r["qv"]]) for c, r in enumerate(rows)]


def _argmin_struct(books_rows: list[tuple[int, list[int]]]):
    """struct(d2, c) of the nearest book as a LITERAL-books column
    expression (r16, guide §2.4): ``array_min`` over the per-book
    exact d2 structs is field-lexicographic — (d2 asc, c asc) — the
    exact tiebreak of the former ``min(struct(d2, c))`` aggregate,
    with NO n×K crossJoin and NO corpus groupBy(vec_id) shuffle: the
    assignment becomes a map-only projection (the books are already
    driver rows from the inter-step freeze, so injecting them as
    literals is the pca/ivfpq literal-projection pattern)."""
    lit = "array(" + ", ".join(
        f"named_struct('c', {c}, 'ckv', array("
        + ", ".join(f"{x}L" for x in ckv)
        + "))"
        for c, ckv in books_rows
    ) + ")"
    d2 = (
        "aggregate(zip_with(qv, b.ckv, (x, y) -> (x - y) * (x - y)),"
        " cast(0 as bigint), (acc, v) -> acc + v)"
    )
    return F.expr(
        f"array_min(transform({lit},"
        f" b -> named_struct('d2', {d2}, 'c', b.c)))"
    )


def _py_fdiv(s: int, n: int) -> int:
    """Python twin of operators/ivfpq_train._fdiv (exact floor
    division via the snapped numerator): for n > 0 both reduce to
    floor(s / n), which Python's ``//`` computes exactly."""
    return s // n


def _one_step_rows(
    q, rows: list[tuple[int, list[int]]]
) -> tuple[list[tuple[int, list[int]]], int]:
    """One exact Lloyd step over literal books ``rows`` → (new rows,
    pre-update inertia). ONE corpus aggregate produces the per-cluster
    counts, d2 sums AND per-dim sums (map-side combined to K groups);
    the floor-division means run on the collected K rows (the same
    bounded freeze the former shape collected) and the step's inertia
    is the total of the per-cluster d2 sums — an exact BIGINT
    regrouping of the former global sum."""
    best = _argmin_struct(rows)
    asg = q.select(
        best["c"].alias("c"), best["d2"].alias("d2"), "qv"
    )
    upd = asg.groupBy("c").agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("d2").cast("bigint").alias("sd2"),
        *[
            F.sum(F.expr(f"qv[{i}]")).cast("bigint").alias(f"s{i}")
            for i in range(_DIM)
        ],
    )
    urows = {int(r["c"]): r for r in upd.collect()}
    inertia = sum(int(r["sd2"]) for r in urows.values())
    new_rows = []
    for c, ckv in rows:
        r = urows.get(c)
        if r is None:  # empty cluster keeps its previous centroid
            new_rows.append((c, ckv))
        else:
            n = int(r["n"])
            new_rows.append(
                (c, [_py_fdiv(int(r[f"s{i}"]), n) for i in range(_DIM)])
            )
    return new_rows, inertia


def _train_books(q) -> tuple[list[list[tuple[int, list[int]]]], list[int]]:
    """([seed rows, kb1 rows, …, kb{KM_ITERS} rows], [inertia_1..
    inertia_{KM_ITERS}]) — the full training, computed fresh from the
    corpus on EVERY call (the r15 cross-query _BOOKS_MEMO is removed
    per VERDICT r15 task #2). KM_ITERS+1 corpus passes total: one
    seed TakeOrdered + one fused assign/update aggregate per step."""
    rows = _seed_rows(q)
    seq = [rows]
    inertias: list[int] = []
    for _ in range(KM_ITERS):
        rows, inertia = _one_step_rows(q, rows)
        seq.append(rows)
        inertias.append(inertia)
    return seq, inertias


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
    # one scan+quantize per call: the seed TakeOrdered and every
    # Lloyd-step aggregate read the materialized quantized corpus
    # (lazy localCheckpoint) instead of re-scanning parquet per job
    q = _quantized(emb, "vec_id").localCheckpoint(eager=False)
    books = _train_books(q)[0][-1]
    # literal-books argmin: map-only projection, no crossJoin row
    # blowup and no corpus groupBy(vec_id) shuffle (r16, guide §2.4);
    # the only remaining exchange is the declared ORDER BY
    best = _argmin_struct(books)
    return q.select(
        "vec_id",
        best["c"].cast("bigint").alias("cluster"),
        best["d2"].alias("dist2"),
    ).orderBy("vec_id")
