"""Sketch family, part 2 (SURVEY.md §2.9): HyperLogLog implemented
from its published definition (Flajolet et al. 2007), and the
rolling-distinct DAU/MAU activity metrics.

hll_from_definition completes the from-definition sketch quartet
(KMV / Count-Min / Bloom / HLL). The whole sketch is integer-exact:

- register index j = h % 64, remainder w = h // 64 (26 bits);
- rank rho = 27 − bit_length(w), with bit_length computed as
  Σ (w ≥ 2^i) over i=0..25 — a sum of boolean integers, NOT
  floor(log2(w)) (float log at exact powers of two is the classic
  cross-engine trap);
- registers M[j] = max(rho): a 64-row grid via one groupBy;
- the harmonic sum Σ 2^(−M[j]) is carried as the exact integer
  numerator Σ 2^(27−M[j]) over the fixed denominator 2^27, so the
  only float op is the single final α·m²·2^27/S formula (plus the
  standard linear-counting branch for small cardinalities, also one
  expression on exact operands).

dau_mau_rolling computes exact 30-day rolling distinct users WITHOUT
a range join (Spark would nested-loop it): each (day, user) fact
explodes into the ≤30 future cover-days it supports — a bounded
fan-out map — then one distinct + count per cover day. At 100 TB the
fan-out is a fixed 30× on the *per-day-distinct* (already deduped)
stream, shuffled once on the uniform (day, user) key. This is the
standard scale rewrite of COUNT(DISTINCT) OVER RANGE, which neither
Spark nor most engines support natively.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_mp_transactions_spark.registry import query
from etl_mp_transactions_spark.sources.tables import load_table

HLL_M = 64  # registers (p = 6)
HLL_ALPHA = 0.709  # published alpha_64
_WBITS = 26  # 32-bit hash minus 6 index bits
_BL_SUM_SQL = " + ".join(
    f"CASE WHEN w >= {1 << i} THEN 1 ELSE 0 END" for i in range(_WBITS)
)
_BL_SUM_SPARK = " + ".join(
    f"CASE WHEN w >= {1 << i} THEN 1 ELSE 0 END" for i in range(_WBITS)
)
# linear-counting estimate round(m*ln(m/v)) has exactly 64 possible
# inputs (v = empty registers, 1..64) -- precompute them ONCE in
# Python with exact rational arithmetic (exactmath.ln_frac: no libm
# even on the generating box, so the literals are identical in every
# environment) and inject into BOTH engines (the codebase's ndcg
# discount-table rule, hardened per VERDICT r11 task #2)
from fractions import Fraction as _Fr

from etl_mp_transactions_spark.functions.exactmath import ln_frac as _lnf

_LC_EST = tuple(
    int(HLL_M * _lnf(_Fr(HLL_M, v)) + _Fr(1, 2))
    for v in range(1, HLL_M + 1)
)
_LC_CASE = (
    "CASE {v} "
    + " ".join(f"WHEN {i + 1} THEN {e}" for i, e in enumerate(_LC_EST))
    + " END"
)


@query(
    "hll_from_definition",
    f"""
    WITH hashed AS (
      SELECT DISTINCT
             ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 8))::BIGINT AS h
      FROM events
    ),
    jw AS (
      SELECT h % {HLL_M} AS j, h // {HLL_M} AS w FROM hashed
    ),
    ranked AS (
      SELECT j, w, {_WBITS + 1} - ({_BL_SUM_SQL}) AS rho FROM jw
    ),
    regs AS (
      SELECT j, max(rho) AS m_j FROM ranked GROUP BY j
    ),
    s AS (
      -- empty registers carry M[j]=0 and contribute 2^0 = 1 each to
      -- the harmonic sum, i.e. 2^27 to the integer numerator
      SELECT sum(CAST(1 AS BIGINT) << ({_WBITS + 1} - m_j))
             + ({HLL_M} - count(*)) * {1 << (_WBITS + 1)} AS s_num,
             count(*) AS regs_used
      FROM regs
    ),
    exact AS (SELECT count(DISTINCT user_id) AS exact_distinct FROM events)
    SELECT {HLL_M} AS m,
           {HLL_M} - s.regs_used AS v_empty,
           s.s_num,
           CAST(round(
             CASE WHEN ({HLL_ALPHA} * {HLL_M} * {HLL_M}
                        * {1 << (_WBITS + 1)}) / s.s_num
                       <= 2.5 * {HLL_M}
                       AND {HLL_M} - s.regs_used > 0
                  THEN {_LC_CASE.format(v=f"({HLL_M} - s.regs_used)")}
                  ELSE ({HLL_ALPHA} * {HLL_M} * {HLL_M}
                        * {1 << (_WBITS + 1)}) / s.s_num
             END) AS BIGINT) AS est_distinct,
           e.exact_distinct
    FROM s CROSS JOIN exact e
    """,
)
def hll_from_definition(spark, sf_dir):
    """HyperLogLog cardinality estimate of distinct purchasing users
    (module docstring): 64 integer registers, exact integer harmonic
    numerator, one final float formula with the linear-counting
    small-range branch. The exact distinct count rides along to show
    the error."""
    ev = load_table(spark, sf_dir, "events")
    hashed = (
        ev.select("user_id")
        .distinct()
        .select(
            F.conv(
                F.substring(F.md5(F.col("user_id").cast("string")), 1, 8),
                16,
                10,
            )
            .cast("bigint")
            .alias("h")
        )
        .distinct()
    )
    jw = hashed.select(
        (F.col("h") % HLL_M).alias("j"),
        F.expr(f"div(h, {HLL_M})").alias("w"),
    )
    ranked = jw.select(
        "j", F.expr(f"{_WBITS + 1} - ({_BL_SUM_SPARK})").alias("rho")
    )
    regs = ranked.groupBy("j").agg(F.max("rho").alias("m_j"))
    # empty registers carry M[j]=0 → 2^0 = 1 each in the harmonic
    # sum (2^27 in the integer numerator)
    s = regs.agg(
        (
            F.sum(
                F.expr(f"shiftleft(cast(1 as bigint), {_WBITS + 1} - m_j)")
            )
            + (HLL_M - F.count("*")) * (1 << (_WBITS + 1))
        ).alias("s_num"),
        F.count("*").alias("regs_used"),
    )
    exact = ev.agg(F.countDistinct("user_id").alias("exact_distinct"))
    raw = (
        F.lit(HLL_ALPHA * HLL_M * HLL_M * (1 << (_WBITS + 1)))
        / F.col("s_num")
    )
    v_empty = F.lit(HLL_M) - F.col("regs_used")
    lc = F.lit(None).cast("bigint")
    for v, e in enumerate(_LC_EST, start=1):
        lc = F.when(v_empty == v, F.lit(e).cast("bigint")).otherwise(lc)
    est = F.when(
        (raw <= 2.5 * HLL_M) & (v_empty > 0), lc
    ).otherwise(F.round(raw, 0).cast("bigint"))
    return s.crossJoin(F.broadcast(exact)).select(
        F.lit(HLL_M).alias("m"),
        v_empty.alias("v_empty"),
        "s_num",
        est.alias("est_distinct"),
        "exact_distinct",
    )


@query(
    "dau_mau_rolling",
    """
    WITH ud AS (
      SELECT DISTINCT CAST(date_trunc('day', ts) AS DATE) AS day, user_id
      FROM events
    ),
    bounds AS (SELECT max(day) AS maxd FROM ud),
    cover AS (
      SELECT DISTINCT
             CAST(unnest(generate_series(ud.day, least(
               ud.day + INTERVAL 29 DAY,
               (SELECT maxd FROM bounds)::TIMESTAMP), INTERVAL 1 DAY))
               AS DATE) AS cday,
             ud.user_id
      FROM ud
    ),
    mau AS (
      SELECT cday, count(DISTINCT user_id) AS mau FROM cover GROUP BY cday
    ),
    dau AS (
      SELECT day, count(*) AS dau FROM ud GROUP BY day
    )
    SELECT CAST(d.day AS VARCHAR) AS day, d.dau, m.mau,
           d.dau * 1000000 // m.mau AS stickiness_micro
    FROM dau d JOIN mau m ON m.cday = d.day
    ORDER BY d.day
    """,
)
def dau_mau_rolling(spark, sf_dir):
    """Exact DAU / 30-day-rolling MAU / stickiness per observed day
    (module docstring): bounded 30× fan-out of the per-day-distinct
    user stream instead of a range join; floor-divided micro-unit
    stickiness. Only observed days are reported (inner join), so the
    output is gap-free in the metric but not padded."""
    ev = load_table(spark, sf_dir, "events")
    ud = ev.select(
        F.date_trunc("day", F.col("ts")).cast("date").alias("day"),
        "user_id",
    ).distinct()
    bounds = ud.agg(F.max("day").alias("maxd"))
    cover = (
        ud.crossJoin(F.broadcast(bounds))
        .select(
            F.explode(
                F.sequence(
                    F.col("day"),
                    F.least(F.date_add(F.col("day"), 29), F.col("maxd")),
                )
            ).alias("cday"),
            "user_id",
        )
        .distinct()
    )
    mau = cover.groupBy("cday").agg(
        F.countDistinct("user_id").alias("mau")
    )
    dau = ud.groupBy("day").agg(F.count("*").alias("dau"))
    return (
        dau.join(mau, dau.day == mau.cday)
        .select(
            F.col("day").cast("string").alias("day"),
            "dau",
            "mau",
            F.expr("div(dau * 1000000, mau)").alias("stickiness_micro"),
        )
        .orderBy("day")
    )


QSK_B = 256  # equi-width buckets
QSK_SHARDS = 8


@query(
    "quantile_sketch_merge",
    f"""
    WITH pts AS (
      SELECT CAST(round(l_extendedprice * 100) AS BIGINT) AS cents,
             l_orderkey % {QSK_SHARDS} AS shard
      FROM lineitem
    ),
    rng AS (
      SELECT min(cents) AS lo, max(cents) AS hi FROM pts
    ),
    bucketed AS (
      SELECT p.shard,
             least({QSK_B} - 1,
                   (p.cents - r.lo) * {QSK_B} // (r.hi - r.lo + 1))
               AS b
      FROM pts p CROSS JOIN rng r
    ),
    shard_hist AS (
      SELECT shard, b, CAST(count(*) AS BIGINT) AS c
      FROM bucketed GROUP BY shard, b
    ),
    merged AS (
      SELECT b, CAST(sum(c) AS BIGINT) AS c FROM shard_hist GROUP BY b
    ),
    cum AS (
      SELECT b, c,
             sum(c) OVER (ORDER BY b) AS cumc,
             sum(c) OVER () AS n
      FROM merged
    ),
    picks AS (
      SELECT max(n) AS n,
             min(CASE WHEN cumc * 100 >= n * 50 THEN b END) AS b50,
             min(CASE WHEN cumc * 100 >= n * 90 THEN b END) AS b90,
             min(CASE WHEN cumc * 100 >= n * 99 THEN b END) AS b99
      FROM cum
    )
    SELECT p.n,
           r.lo + p.b50 * (r.hi - r.lo + 1) // {QSK_B} AS p50_lo_cents,
           r.lo + p.b90 * (r.hi - r.lo + 1) // {QSK_B} AS p90_lo_cents,
           r.lo + p.b99 * (r.hi - r.lo + 1) // {QSK_B} AS p99_lo_cents,
           (r.hi - r.lo + 1 + {QSK_B} - 1) // {QSK_B} AS max_err_cents
    FROM picks p CROSS JOIN rng r
    """,
)
def quantile_sketch_merge(spark, sf_dir):
    """Mergeable equi-width quantile sketch — the sketch family the
    KMV/HLL/count-min trio was missing. Each shard (synthetic:
    l_orderkey % {QSK_SHARDS}, standing in for executor partials)
    builds a {QSK_B}-bucket integer histogram; histograms MERGE by
    plain addition (groupBy sum — associative and commutative, so the
    shard/partition layout can never change the answer), and
    approximate quantiles read off the merged cumulative histogram as
    the first bucket reaching rank ceil(q·n). The answer carries its
    own error contract: a quantile estimate is the bucket's lower
    bound, off by at most one bucket width (max_err_cents in-result).
    At 100 TB this is the two-pass percentile plan that needs NO
    range shuffle at all — one min/max scan, one bucket-count scan,
    {QSK_B} rows to the driver — the cheap alternative to
    exact_global_percentiles when a bounded error is acceptable.
    All arithmetic exact BIGINT in both engines."""
    li = load_table(spark, sf_dir, "lineitem")
    pts = li.select(
        F.round(F.col("l_extendedprice") * 100, 0)
        .cast("bigint")
        .alias("cents"),
        (F.col("l_orderkey") % QSK_SHARDS).alias("shard"),
    )
    rng = pts.agg(F.min("cents").alias("lo"), F.max("cents").alias("hi"))
    width = F.col("hi") - F.col("lo") + 1
    bucketed = pts.crossJoin(F.broadcast(rng)).select(
        "shard",
        F.least(
            F.lit(QSK_B - 1),
            F.expr(f"div((cents - lo) * {QSK_B}, hi - lo + 1)"),
        ).alias("b"),
    )
    shard_hist = bucketed.groupBy("shard", "b").agg(
        F.count("*").cast("bigint").alias("c")
    )
    merged = shard_hist.groupBy("b").agg(F.sum("c").alias("c"))
    from pyspark.sql import Window

    # <=256-row cumulative table — bounded by construction
    wcum = Window.orderBy("b").rowsBetween(Window.unboundedPreceding, 0)
    cum = merged.select(
        "b",
        F.sum("c").over(wcum).alias("cumc"),
        F.sum("c").over(Window.partitionBy()).alias("n"),
    )

    def pick(q_pct):
        return F.min(
            F.when(
                F.col("cumc") * 100 >= F.col("n") * q_pct, F.col("b")
            )
        )

    picks = cum.agg(
        F.max("n").alias("n"),
        pick(50).alias("b50"),
        pick(90).alias("b90"),
        pick(99).alias("b99"),
    )
    return picks.crossJoin(F.broadcast(rng)).select(
        "n",
        (F.col("lo") + F.expr(f"div(b50 * (hi - lo + 1), {QSK_B})")).alias(
            "p50_lo_cents"
        ),
        (F.col("lo") + F.expr(f"div(b90 * (hi - lo + 1), {QSK_B})")).alias(
            "p90_lo_cents"
        ),
        (F.col("lo") + F.expr(f"div(b99 * (hi - lo + 1), {QSK_B})")).alias(
            "p99_lo_cents"
        ),
        F.expr(f"div(hi - lo + 1 + {QSK_B} - 1, {QSK_B})").alias(
            "max_err_cents"
        ),
    )
