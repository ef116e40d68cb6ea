"""Exact-arithmetic PCA over the embedding corpus: top principal
direction by unrolled power iteration on the normalized covariance
scatter, and extreme-example selection along that axis (SURVEY.md
§2.9 training-pipeline extensions — the eigen-decomposition side of
the distributed-linear-algebra family started by gram_matrix; no
reference counterpart, north-star additions).

Exactness design (PORTABILITY.md): the pipeline is integer end to end
except three sanctioned float classes, each IEEE-deterministic across
engines:

1. CAST(BIGINT AS DOUBLE) is correctly rounded by IEEE 754 even when
   the integer exceeds 2^53, so the centered scatter
   Md_ij = G_ij − s_i·s_j/n (whose exact integer form n·G − s·s would
   overflow BIGINT beyond n ≈ 3000) is computed in doubles from exact
   integer inputs with identical expression shape in both engines —
   identical doubles, no overflow at any n.
2. Every normalization is ONE double divide (+ multiply + round) on
   exact-representable operands: the scatter is max-normalized to
   ±1e6 (``mn``), the matvec result w (≤ 64·1e6·1e6 = 6.4e13 < 2^53,
   exact BIGINT from an order-free integer sum) is max-normalized to
   ±1e6 (``wm``) so its norm² Σwm² ≤ 6.4e13 stays an exact BIGINT,
   and the unit step divides by sqrt(n2) — sqrt is correctly rounded
   BY THE IEEE STANDARD (PORTABILITY.md), so it stays engine-side.
3. The Rayleigh-quotient report is one final nano-rounded ratio of
   two exact BIGINT dot products.

Power iteration: v0 = uniform, T = 8 unrolled steps of
v ← normalize(Mn·v) with v held in micro units (±1e6); the result is
sign-canonicalized (first nonzero component positive). Zero-guards
(mw = 0, n2 = 0) keep degenerate inputs deterministic.

Scale shape (100 TB):
- the only corpus-sized work is the Gram/column-sum pass, reused from
  embeddings2.gram_matrix: per-partition 64×64 int64 numpy matmuls
  inside Arrow mapInPandas, communication O(partitions·d²) never
  O(rows); column sums are one map-side-combined posexplode agg;
- everything after is d² = 4096 rows: the 8 iterations run on a
  localCheckpoint-ed scatter (one bounded materialization, so the
  loop replans over 4096 rows instead of replaying the corpus pass);
- the projection query injects the learned 64-dim direction and the
  64 column sums as LITERAL arrays (the documented parameter-bounded
  collect class, same as the k-means freezes): the corpus pass is
  then ONE scan with an order-free integer fold per row and a
  TakeOrderedAndProject top-k — no shuffle, no window;
- the projection's integer bound: |n·q − s|·|vk| ≤ 64·(n·6e5)·1e3
  stays under 2^63 to n ≈ 2·10^8 vectors per... the per-element
  product, summed over 64 dims — documented at the expression site.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from etl_mp_transactions_spark.queries.ivfpq_q import materialize_ctes
from etl_mp_transactions_spark.registry import query
from etl_mp_transactions_spark.sources.tables import load_table
from etl_mp_transactions_spark.functions.literalframe import literal_frame

_DIM = 64
_ITERS = 8


# ---------------------------------------------------------------- DuckDB


def _scatter_ctes() -> str:
    """q → gram + column sums → centered scatter (double, exact-input)
    → max-normalized integer scatter ``mn`` (i, j 0-based)."""
    return """q AS (
      SELECT list_transform(embedding,
                            x -> CAST(round(x * 1e6) AS BIGINT)) AS qv
      FROM embeddings
    ),
    nrow AS (SELECT count(*)::BIGINT AS n FROM q),
    g AS (
      SELECT i.i - 1 AS i, j.j - 1 AS j,
             CAST(sum(q.qv[i.i] * q.qv[j.j]) AS BIGINT) AS g
      FROM q,
           unnest(generate_series(1, 64)) AS i(i),
           unnest(generate_series(1, 64)) AS j(j)
      GROUP BY 1, 2
    ),
    s AS (
      SELECT i.i - 1 AS i, CAST(sum(q.qv[i.i]) AS BIGINT) AS s
      FROM q, unnest(generate_series(1, 64)) AS i(i)
      GROUP BY 1
    ),
    md AS (
      SELECT g.i, g.j,
             CAST(g.g AS DOUBLE)
               - CAST(si.s AS DOUBLE) * CAST(sj.s AS DOUBLE)
                 / CAST(nr.n AS DOUBLE) AS md
      FROM g
      JOIN s si ON si.i = g.i
      JOIN s sj ON sj.i = g.j
      CROSS JOIN nrow nr
    ),
    mx AS (SELECT max(abs(md)) AS mx FROM md),
    mn AS (
      SELECT i, j,
             CASE WHEN mx.mx = 0 THEN 0
                  ELSE CAST(round(1e6 * (md.md / mx.mx)) AS BIGINT)
             END AS mn
      FROM md CROSS JOIN mx
    )"""


def _iter_ctes(k: int) -> str:
    """One power-iteration step: integer matvec → max-normalize →
    exact norm² → micro-unit step."""
    return f""",
    w{k} AS (
      SELECT m.i, CAST(sum(m.mn * p.v) AS BIGINT) AS w
      FROM mn m JOIN it{k - 1} p ON p.i = m.j GROUP BY 1
    ),
    mw{k} AS (SELECT max(abs(w)) AS mw FROM w{k}),
    wm{k} AS (
      SELECT w.i,
             CASE WHEN mw.mw = 0 THEN w.w
                  ELSE CAST(round(1e6 * (CAST(w.w AS DOUBLE)
                                         / CAST(mw.mw AS DOUBLE)))
                       AS BIGINT) END AS wm
      FROM w{k} w CROSS JOIN mw{k} mw
    ),
    n2{k} AS (SELECT CAST(sum(wm * wm) AS BIGINT) AS n2 FROM wm{k}),
    it{k} AS (
      SELECT wm.i,
             CASE WHEN n.n2 = 0 THEN wm.wm
                  ELSE CAST(round(1e6 * (CAST(wm.wm AS DOUBLE)
                                         / sqrt(CAST(n.n2 AS DOUBLE))))
                       AS BIGINT) END AS v
      FROM wm{k} wm CROSS JOIN n2{k} n
    )"""


def _power_ctes() -> str:
    its = "".join(_iter_ctes(k) for k in range(1, _ITERS + 1))
    t = _ITERS
    return f"""{_scatter_ctes()},
    it0 AS (
      SELECT i.i - 1 AS i, CAST(1000000 AS BIGINT) AS v
      FROM unnest(generate_series(1, 64)) AS i(i)
    ){its},
    wf AS (
      SELECT m.i, CAST(sum(m.mn * p.v) AS BIGINT) AS w
      FROM mn m JOIN it{t} p ON p.i = m.j GROUP BY 1
    ),
    mwf AS (SELECT max(abs(w)) AS mw FROM wf),
    wmf AS (
      SELECT w.i,
             CASE WHEN mw.mw = 0 THEN w.w
                  ELSE CAST(round(1e6 * (CAST(w.w AS DOUBLE)
                                         / CAST(mw.mw AS DOUBLE)))
                       AS BIGINT) END AS wm
      FROM wf w CROSS JOIN mwf mw
    ),
    rq AS (
      SELECT CAST(round(1e9 * (CAST(sum(p.v * wm.wm) AS DOUBLE)
                               / CAST(sum(p.v * p.v) AS DOUBLE)))
             AS BIGINT) AS rq_nano
      FROM it{t} p JOIN wmf wm ON wm.i = p.i
    ),
    sgn AS (
      SELECT CASE WHEN v < 0 THEN -1 ELSE 1 END AS sg
      FROM it{t} WHERE v <> 0 ORDER BY i LIMIT 1
    ),
    vfin AS (
      SELECT i AS dim,
             v * coalesce((SELECT sg FROM sgn), 1) AS v_micro
      FROM it{t}
    )"""


# ----------------------------------------------------------------- Spark


def _round_half_up(x: float) -> int:
    """Exact twin of Spark's ``round(double)`` (java.math.BigDecimal
    HALF_UP over the shortest round-trip decimal repr): Python
    ``repr`` and Java ``Double.toString`` both emit a decimal that
    uniquely identifies the double, and any such repr of d ≠ k.5 lies
    strictly on d's side of every .5/.0 boundary (boundaries are
    themselves representable doubles), so the HALF_UP decision is
    repr-independent — the same argument PORTABILITY.md makes for the
    half-away numpy rounding."""
    from decimal import ROUND_HALF_UP, Decimal

    return int(
        Decimal(repr(x)).quantize(Decimal(1), rounding=ROUND_HALF_UP)
    )


def _scatter_stats(
    spark: SparkSession, sf_dir: str
) -> tuple[list[list[int]], list[int], int]:
    """(g[64][64], s[64], n): the exact integer Gram matrix, column
    sums, and row count of the quantized corpus in ONE Arrow
    mapInPandas pass (r16, guide §1.2/§5: the former shape ran the
    gram pass, a posexplode column-sum pass, and a count as separate
    jobs). Per-partition local numpy int64 matmul — communication
    O(partitions·d²), never O(rows); the d²+d+1 result rows are the
    documented parameter-bounded collect class. Encoding: (i, j, g)
    cells, (i, -1, s_i) column sums, (-1, -1, n)."""
    import numpy as np
    import pandas as pd

    emb = load_table(spark, sf_dir, "embeddings")
    d = _DIM

    def partial(batches):
        acc = np.zeros((d, d), dtype=np.int64)
        s = np.zeros(d, dtype=np.int64)
        n = 0
        for pdf in batches:
            if not len(pdf):
                continue
            # half-away-from-zero to match SQL round() (np.round is
            # IEEE half-to-even — a 0.5e-6 tie would diverge)
            scaled = np.stack(
                [np.asarray(v, dtype=np.float64) for v in pdf["embedding"]]
            ) * 1e6
            m = (
                np.floor(np.abs(scaled) + 0.5) * np.sign(scaled)
            ).astype(np.int64)
            acc += m.T @ m
            s += m.sum(axis=0)
            n += len(pdf)
        ii, jj = np.meshgrid(range(d), range(d), indexing="ij")
        yield pd.DataFrame(
            {
                "i": np.concatenate(
                    [ii.ravel(), np.arange(d), [-1]]
                ).astype("int32"),
                "j": np.concatenate(
                    [jj.ravel(), np.full(d, -1), [-1]]
                ).astype("int32"),
                "g": np.concatenate([acc.ravel(), s, [n]]),
            }
        )

    rows = (
        emb.select("embedding")
        .mapInPandas(partial, schema="i int, j int, g long")
        .groupBy("i", "j")
        .agg(F.sum("g").cast("bigint").alias("g"))
        .collect()
    )
    g = [[0] * d for _ in range(d)]
    s = [0] * d
    n = 0
    for r in rows:
        if r["i"] == -1:
            n = int(r["g"])
        elif r["j"] == -1:
            s[r["i"]] = int(r["g"])
        else:
            g[r["i"]][r["j"]] = int(r["g"])
    return g, s, n


def _power_direction_py(
    spark: SparkSession, sf_dir: str
) -> tuple[list[tuple[int, int]], int, list[int], int]:
    """(vfin rows, rq_nano, column sums, n): the full power iteration
    as ONE corpus pass plus an exact driver-side fold over the
    parameter-bounded scatter (r16, VERDICT r15 task #3: the former
    shape ran ~30 blocking 64-row jobs — 8 step checkpoints, per-step
    max/norm broadcasts, sign/collect jobs — all scheduler overhead,
    no data). Recomputed from parquet on EVERY call (the r15
    _DIRECTION_MEMO is removed per VERDICT r15 task #2).

    Exactness: the fold replays the retired Spark plan op for op —
    integer matvecs on Python ints (order-free exact), IEEE-double
    ratios on float(int) casts (correctly rounded, same as
    CAST(BIGINT AS DOUBLE)), math.sqrt (correctly rounded by IEEE),
    and HALF_UP rounding via ``_round_half_up`` — and the DuckDB
    oracle still replays the unrolled loop independently, so the
    equivalence is value-pinned at both SFs, not assumed."""
    g, s, n = _scatter_stats(spark, sf_dir)
    d = _DIM
    # centered scatter in doubles from exact integer inputs, then
    # max-normalized to ±1e6 ints (same op order as the oracle CTEs)
    md = [
        [float(g[i][j]) - float(s[i]) * float(s[j]) / float(n) for j in range(d)]
        for i in range(d)
    ]
    mx = max(abs(md[i][j]) for i in range(d) for j in range(d))
    mn = [
        [
            0 if mx == 0 else _round_half_up(1e6 * (md[i][j] / mx))
            for j in range(d)
        ]
        for i in range(d)
    ]
    v = [1_000_000] * d

    def _step(v: list[int]) -> tuple[list[int], list[int]]:
        w = [sum(mn[i][j] * v[j] for j in range(d)) for i in range(d)]
        mw = max(abs(x) for x in w)
        wm = [
            x if mw == 0 else _round_half_up(1e6 * (float(x) / float(mw)))
            for x in w
        ]
        n2 = sum(x * x for x in wm)
        import math

        nxt = [
            x
            if n2 == 0
            else _round_half_up(1e6 * (float(x) / math.sqrt(float(n2))))
            for x in wm
        ]
        return nxt, wm

    for _ in range(_ITERS):
        v, _wm = _step(v)
    _nxt, wmf = _step(v)
    num = sum(v[i] * wmf[i] for i in range(d))
    den = sum(v[i] * v[i] for i in range(d))
    rq_nano = _round_half_up(1e9 * (float(num) / float(den)))
    sg = next((1 if x > 0 else -1 for x in v if x != 0), 1)
    vfin = [(i, v[i] * sg) for i in range(d)]
    return vfin, rq_nano, s, n


def _power_direction(
    spark: SparkSession, sf_dir: str
) -> tuple[DataFrame, DataFrame]:
    """Returns (vfin(dim, v_micro), rq(rq_nano)) — the canonicalized
    direction and its Rayleigh-quotient report, computed fresh from
    parquet per call (_power_direction_py)."""
    vrows, rq_nano, _s, _n = _power_direction_py(spark, sf_dir)
    return (
        literal_frame(spark, vrows, "dim int, v_micro long"),
        literal_frame(spark, [(rq_nano,)], "rq_nano long"),
    )


@query(
    "pca_power_direction",
    materialize_ctes(
        f"""WITH {_power_ctes()}
    SELECT f.dim, f.v_micro, r.rq_nano
    FROM vfin f CROSS JOIN rq r"""
    ),
)
def pca_power_direction(spark, sf_dir):
    """Top principal direction of the embedding corpus: 8 unrolled
    power-iteration steps on the max-normalized covariance scatter,
    micro-unit components, sign-canonicalized, with the nano Rayleigh
    quotient carried on every row (the convergence/eigenvalue
    report)."""
    vfin, rq = _power_direction(spark, sf_dir)
    return vfin.crossJoin(F.broadcast(rq)).select(
        "dim", "v_micro", "rq_nano"
    )


@query(
    "pca_extreme_projection",
    materialize_ctes(
        f"""WITH {_power_ctes()},
    vk AS (
      SELECT dim,
             CAST(round(CAST(v_micro AS DOUBLE) / 1e3) AS BIGINT) AS vk
      FROM vfin
    ),
    q2 AS (
      SELECT vec_id,
             list_transform(embedding,
                            x -> CAST(round(x * 1e6) AS BIGINT)) AS qv
      FROM embeddings
    ),
    proj AS (
      SELECT q2.vec_id,
             CAST(sum((nr.n * q2.qv[d.i] - s.s) * vk.vk) AS BIGINT)
               AS proj
      FROM q2
      CROSS JOIN nrow nr,
           unnest(generate_series(1, 64)) AS d(i)
      JOIN s ON s.i = d.i - 1
      JOIN vk ON vk.dim = d.i - 1
      GROUP BY 1
    ),
    tops AS (
      SELECT vec_id, proj, 'top' AS side,
             CAST(row_number() OVER (ORDER BY proj DESC, vec_id)
                  AS BIGINT) AS rank
      FROM proj ORDER BY proj DESC, vec_id LIMIT 10
    ),
    bots AS (
      SELECT vec_id, proj, 'bottom' AS side,
             CAST(row_number() OVER (ORDER BY proj ASC, vec_id)
                  AS BIGINT) AS rank
      FROM proj ORDER BY proj ASC, vec_id LIMIT 10
    )
    SELECT vec_id, proj, side, rank FROM tops
    UNION ALL
    SELECT vec_id, proj, side, rank FROM bots"""
    ),
)
def pca_extreme_projection(spark, sf_dir):
    """Extreme examples along the principal axis: exact integer
    projection proj = Σ_j (n·q_j − s_j)·vk_j (direction descaled to
    kilo units; |term| ≤ 64·n·6e5·1e3 — BIGINT-safe past 10^8 rows),
    top-10 and bottom-10 with ranks. The direction, column sums, and
    n are injected as LITERALS after the parameter-bounded collects
    (module docstring), so the corpus pass is one scan with an
    order-free integer fold and a TakeOrderedAndProject — no shuffle,
    no window."""
    # ONE corpus pass for direction + column sums + n (r16: the
    # former shape re-ran a posexplode column-sum pass and a count
    # after the direction's own scatter pass), then one scored scan
    vrows, _rq_nano, s, n = _power_direction_py(spark, sf_dir)
    vk = [0] * _DIM
    for dim, v in vrows:
        # half-AWAY rounding on the exact integer (ADVICE r12):
        # python round() is half-even and would diverge from the
        # oracle's SQL round() whenever v_micro ≡ ±500 (mod 1000)
        vk[dim] = (abs(v) + 500) // 1000 * (1 if v >= 0 else -1)
    emb = load_table(spark, sf_dir, "embeddings")
    qv = emb.select(
        "vec_id",
        F.expr(
            "transform(embedding, x -> cast(round(x * 1e6) as bigint))"
        ).alias("qv"),
    )
    # proj = Σ_j (n·q_j − s_j)·vk_j = n·Σ_j q_j·vk_j − Σ_j s_j·vk_j:
    # exact integer regrouping (distributivity — no rounding anywhere
    # in the chain), with the second term a Python-int CONSTANT and
    # the first a zip_with fold. The former spelling indexed the s/vk
    # LITERAL arrays inside the lambda ((acc, j) -> ... s[j] * vk[j]),
    # which Catalyst does not constant-fold inside lambda bodies — the
    # 64-literal arrays were rebuilt per element per row (measured
    # 3.15s vs 0.20s for this scan at sf0.1).
    svk = sum(int(s[j]) * vk[j] for j in range(_DIM))
    vk_arr = "array(" + ", ".join(f"{x}L" for x in vk) + ")"
    proj = qv.select(
        "vec_id",
        F.expr(
            f"{n}L * aggregate(zip_with(qv, {vk_arr}, (q, v) -> q * v),"
            f" 0L, (acc, x) -> acc + x) - {svk}L"
        ).alias("proj"),
    )
    def _side(df: DataFrame, order: list, label: str) -> DataFrame:
        # TakeOrderedAndProject for the corpus-wide top-k, then the
        # rank window runs over the 10 surviving rows only
        w = Window.orderBy(*order)
        return (
            df.orderBy(*order)
            .limit(10)
            .select(
                "vec_id",
                "proj",
                F.lit(label).alias("side"),
                F.row_number().over(w).cast("long").alias("rank"),
            )
        )

    tops = _side(proj, [F.desc("proj"), F.asc("vec_id")], "top")
    bots = _side(proj, [F.asc("proj"), F.asc("vec_id")], "bottom")
    return tops.unionByName(bots)
