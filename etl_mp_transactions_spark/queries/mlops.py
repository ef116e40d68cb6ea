"""In-engine classical-ML training operators (SURVEY.md §2.9
extensions — the model-fitting counterpart of the feature-engineering
family in queries/features.py).

A 100 TB training-data pipeline doesn't just *prepare* features — the
cheap classical fits (fold-safe encodings, decision stumps, Naive
Bayes, k-means steps) run inside the engine too, because they are
pure counting/aggregation problems. All four operators here follow
the repo's exactness contracts:

- crossval_fold_encoding: K-fold leakage-free target encoding — the
  encoding each fold sees is computed from the OTHER folds only
  (full-table stats minus own-fold stats; one groupBy, no per-fold
  re-scans). Fold assignment is the repo's md5 parity hash. The
  encoding is ONE final float expression over exact integer counts.
- gini_best_split: exact decision stump — candidate thresholds are
  the distinct feature bands, left/right class counts come from ONE
  cumulative window over the sorted band histogram, and the weighted
  Gini impurity is one identical-text float expression per split
  (numerator/denominator both from exact BIGINTs).
- naive_bayes_confusion: multinomial NB with add-one smoothing,
  trained and scored in-engine. Per-token log-likelihoods use the
  repo's nano-nat integer pattern (per-term float ln → immediate
  round to integer nano-nats → exact order-free BIGINT sums), so
  per-doc scores are exact integers and the argmax is deterministic.
- kmeans_lloyd_step: one exact Lloyd iteration on the embeddings
  table — md5-selected seed centroids, micro-unit integer
  quantization, exact BIGINT squared distances (zip_with fold, no
  dim explosion on the Spark side), argmin with id tiebreak, and
  floor-division integer centroid updates via the sign-safe
  (a - pmod(a,b)) / b formula (both engines' % follows the dividend
  sign, so pmod is written out explicitly).

Scale: every operator is groupBy/window/broadcast-shaped. The only
cross joins are against k=8 centroids and the class list (|classes|
rows) — bounded model state, the legitimate broadcast class. Nothing
grows faster than the input row count.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from etl_mp_transactions_spark.registry import query
from etl_mp_transactions_spark.sources.tables import load_table

N_FOLDS = 5
SMOOTH_M = 20
K_CLUSTERS = 8


@query(
    "crossval_fold_encoding",
    f"""
    WITH base AS (
      SELECT o_orderpriority AS category,
             CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS y,
             ('0x' || substr(md5(o_orderkey::VARCHAR || ':cv-seed-1'), 1, 8))::BIGINT
               % {N_FOLDS} AS fold
      FROM orders
    ),
    fc AS (
      SELECT fold, category, count(*) AS n_fc, sum(y) AS s_fc
      FROM base GROUP BY 1, 2
    ),
    c AS (SELECT category, sum(n_fc) AS n_c, sum(s_fc) AS s_c FROM fc GROUP BY 1),
    f AS (SELECT fold, sum(n_fc) AS n_f, sum(s_fc) AS s_f FROM fc GROUP BY 1),
    g AS (SELECT sum(n_fc) AS n_all, sum(s_fc) AS s_all FROM fc)
    SELECT fc.fold, fc.category,
           CAST(fc.n_fc AS BIGINT) AS n_fc,
           CAST(c.n_c - fc.n_fc AS BIGINT) AS oof_n,
           CAST(c.s_c - fc.s_fc AS BIGINT) AS oof_pos,
           round(((c.s_c - fc.s_fc)
                  + {SMOOTH_M}.0 * ((g.s_all - f.s_f)
                                    / CAST(g.n_all - f.n_f AS DOUBLE)))
                 / CAST((c.n_c - fc.n_fc) + {SMOOTH_M} AS DOUBLE), 9) AS enc
    FROM fc JOIN c USING (category) JOIN f USING (fold) CROSS JOIN g
    ORDER BY fold, category
    """,
)
def crossval_fold_encoding(spark, sf_dir):
    """Leakage-free 5-fold smoothed target encoding of order
    priority against the 'fulfilled' target (module docstring):
    enc(fold, cat) = (oof_pos + m·oof_prior) / (oof_n + m), every
    count exact, one final float per cell."""
    o = load_table(spark, sf_dir, "orders")
    fold = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.col("o_orderkey").cast("string"),
                               F.lit(":cv-seed-1"))), 1, 8),
            16, 10,
        ).cast("bigint") % N_FOLDS
    )
    base = o.select(
        F.col("o_orderpriority").alias("category"),
        F.when(F.col("o_orderstatus") == "F", 1).otherwise(0).alias("y"),
        fold.alias("fold"),
    )
    fc = base.groupBy("fold", "category").agg(
        F.count("*").alias("n_fc"), F.sum("y").alias("s_fc")
    )
    c = fc.groupBy("category").agg(
        F.sum("n_fc").alias("n_c"), F.sum("s_fc").alias("s_c")
    )
    f = fc.groupBy("fold").agg(
        F.sum("n_fc").alias("n_f"), F.sum("s_fc").alias("s_f")
    )
    g = fc.agg(F.sum("n_fc").alias("n_all"), F.sum("s_fc").alias("s_all"))
    oof_prior = (F.col("s_all") - F.col("s_f")) / (
        F.col("n_all") - F.col("n_f")
    ).cast("double")
    enc = F.round(
        ((F.col("s_c") - F.col("s_fc")) + F.lit(float(SMOOTH_M)) * oof_prior)
        / ((F.col("n_c") - F.col("n_fc")) + F.lit(SMOOTH_M)).cast("double"),
        9,
    )
    return (
        fc.join(F.broadcast(c), "category")
        .join(F.broadcast(f), "fold")
        .crossJoin(F.broadcast(g))
        .select(
            "fold",
            "category",
            F.col("n_fc").cast("bigint").alias("n_fc"),
            (F.col("n_c") - F.col("n_fc")).cast("bigint").alias("oof_n"),
            (F.col("s_c") - F.col("s_fc")).cast("bigint").alias("oof_pos"),
            enc.alias("enc"),
        )
        .orderBy("fold", "category")
    )


@query(
    "gini_best_split",
    """
    WITH base AS (
      SELECT CAST(floor(c_acctbal / 500.0) AS BIGINT) AS band,
             CASE WHEN c_mktsegment = 'BUILDING' THEN 1 ELSE 0 END AS pos
      FROM customer
    ),
    hist AS (
      SELECT band, count(*) AS n, sum(pos) AS p FROM base GROUP BY band
    ),
    cum AS (
      SELECT band,
             CAST(sum(n) OVER (ORDER BY band) AS BIGINT) AS n_left,
             CAST(sum(p) OVER (ORDER BY band) AS BIGINT) AS pos_left,
             CAST(sum(n) OVER () AS BIGINT) AS n_all,
             CAST(sum(p) OVER () AS BIGINT) AS p_all
      FROM hist
    ),
    cand AS (
      SELECT band AS threshold_band, n_left, pos_left,
             n_all - n_left AS n_right, p_all - pos_left AS pos_right,
             round(
               ((n_all - n_left)
                  * (n_left*n_left - pos_left*pos_left
                     - (n_left-pos_left)*(n_left-pos_left))
                + n_left
                  * ((n_all-n_left)*(n_all-n_left)
                     - (p_all-pos_left)*(p_all-pos_left)
                     - ((n_all-n_left)-(p_all-pos_left))
                       * ((n_all-n_left)-(p_all-pos_left))))
               / (1.0 * n_all * n_left * (n_all - n_left)), 9) AS gini
      FROM cum WHERE n_left < n_all
    )
    SELECT threshold_band, n_left, pos_left, n_right, pos_right, gini,
           CAST(row_number() OVER (ORDER BY gini, threshold_band) AS BIGINT) AS rk
    FROM cand
    ORDER BY threshold_band
    """,
)
def gini_best_split(spark, sf_dir):
    """Exact decision stump on customer balance bands vs the
    BUILDING segment (module docstring): cumulative band histogram →
    per-split integer class counts → one identical-text weighted-Gini
    float per candidate; rk=1 is the best split."""
    cust = load_table(spark, sf_dir, "customer")
    base = cust.select(
        F.floor(F.col("c_acctbal") / F.lit(500.0)).cast("bigint").alias("band"),
        F.when(F.col("c_mktsegment") == "BUILDING", 1).otherwise(0).alias("pos"),
    )
    hist = base.groupBy("band").agg(
        F.count("*").alias("n"), F.sum("pos").alias("p")
    )
    wcum = Window.orderBy("band").rowsBetween(Window.unboundedPreceding, 0)
    wall = Window.partitionBy()
    cum = hist.select(
        "band",
        F.sum("n").over(wcum).cast("bigint").alias("n_left"),
        F.sum("p").over(wcum).cast("bigint").alias("pos_left"),
        F.sum("n").over(wall).cast("bigint").alias("n_all"),
        F.sum("p").over(wall).cast("bigint").alias("p_all"),
    )
    nl, pl = F.col("n_left"), F.col("pos_left")
    na, pa = F.col("n_all"), F.col("p_all")
    nr, pr = na - nl, pa - pl
    num = nr * (nl * nl - pl * pl - (nl - pl) * (nl - pl)) + nl * (
        nr * nr - pr * pr - (nr - pr) * (nr - pr)
    )
    cand = cum.filter(nl < na).select(
        F.col("band").alias("threshold_band"),
        nl.alias("n_left"),
        pl.alias("pos_left"),
        nr.alias("n_right"),
        pr.alias("pos_right"),
        F.round(num / (F.lit(1.0) * na * nl * nr), 9).alias("gini"),
    )
    return (
        cand.withColumn(
            "rk",
            F.row_number()
            .over(Window.orderBy("gini", "threshold_band"))
            .cast("bigint"),
        )
        .orderBy("threshold_band")
    )


@query(
    "naive_bayes_confusion",
    """
    WITH tok AS (
      SELECT doc_id, lang, u.w
      FROM documents, unnest(string_split(text, ' ')) AS u(w)
      WHERE u.w <> ''
    ),
    cw AS (SELECT lang AS k, w, count(*) AS c_kw FROM tok GROUP BY 1, 2),
    ck AS (SELECT k, sum(c_kw) AS c_k FROM cw GROUP BY 1),
    voc AS (SELECT count(DISTINCT w) AS v FROM tok),
    nd AS (SELECT lang AS k, count(DISTINCT doc_id) AS nd_k FROM tok GROUP BY 1),
    ntot AS (SELECT count(DISTINCT doc_id) AS n FROM tok),
    dt AS (
      SELECT doc_id, lang AS actual, w, count(*) AS cnt
      FROM tok GROUP BY 1, 2, 3
    ),
    scored AS (
      SELECT dt.doc_id, dt.actual, ck.k,
             sum(dt.cnt * CAST(round(1e9 * ln(
                   (COALESCE(cw.c_kw, 0) + 1)
                   / CAST(ck.c_k + voc.v AS DOUBLE))) AS BIGINT)) AS ll
      FROM dt
      CROSS JOIN ck CROSS JOIN voc
      LEFT JOIN cw ON cw.k = ck.k AND cw.w = dt.w
      GROUP BY 1, 2, 3
    ),
    full_score AS (
      SELECT s.doc_id, s.actual, s.k,
             s.ll + CAST(round(1e9 * ln(nd.nd_k / CAST(ntot.n AS DOUBLE)))
                         AS BIGINT) AS score
      FROM scored s JOIN nd ON nd.k = s.k CROSS JOIN ntot
    ),
    pred AS (
      SELECT doc_id, actual, k AS predicted
      FROM full_score
      QUALIFY row_number() OVER (PARTITION BY doc_id
                                 ORDER BY score DESC, k) = 1
    )
    SELECT actual, predicted, CAST(count(*) AS BIGINT) AS n_docs
    FROM pred GROUP BY 1, 2
    ORDER BY actual, predicted
    """,
)
def naive_bayes_confusion(spark, sf_dir):
    """Multinomial Naive Bayes (add-one smoothing) trained and
    scored in-engine over documents, reported as a lang × predicted
    confusion matrix (module docstring). Per-token log-likelihood
    contributions are rounded to integer nano-nats BEFORE summation
    so per-doc class scores are exact, order-free BIGINTs; the argmax
    tiebreaks on class name."""
    docs = load_table(spark, sf_dir, "documents")
    tok = (
        docs.select(
            "doc_id", "lang", F.explode(F.split(F.col("text"), " ")).alias("w")
        )
        .filter(F.col("w") != "")
    )
    cw = tok.groupBy(F.col("lang").alias("k"), "w").agg(
        F.count("*").alias("c_kw")
    )
    ck = cw.groupBy("k").agg(F.sum("c_kw").alias("c_k"))
    voc = tok.agg(F.countDistinct("w").alias("v"))
    nd = tok.groupBy(F.col("lang").alias("k")).agg(
        F.countDistinct("doc_id").alias("nd_k")
    )
    ntot = tok.agg(F.countDistinct("doc_id").alias("n"))
    dt = tok.groupBy(
        "doc_id", F.col("lang").alias("actual"), "w"
    ).agg(F.count("*").alias("cnt"))
    term = F.round(
        F.lit(1e9)
        * F.log(
            (F.coalesce(F.col("c_kw"), F.lit(0)) + 1)
            / (F.col("c_k") + F.col("v")).cast("double")
        )
    ).cast("bigint")
    cw2 = cw.select(
        F.col("k").alias("cw_k"), F.col("w").alias("cw_w"), "c_kw"
    )
    scored = (
        dt.crossJoin(F.broadcast(ck))
        .crossJoin(F.broadcast(voc))
        .join(
            F.broadcast(cw2),
            (F.col("cw_k") == F.col("k")) & (F.col("cw_w") == F.col("w")),
            "left",
        )
        .groupBy("doc_id", "actual", "k")
        .agg(F.sum(F.col("cnt") * term).alias("ll"))
    )
    prior = F.round(
        F.lit(1e9) * F.log(F.col("nd_k") / F.col("n").cast("double"))
    ).cast("bigint")
    full_score = (
        scored.join(F.broadcast(nd), "k")
        .crossJoin(F.broadcast(ntot))
        .select("doc_id", "actual", "k", (F.col("ll") + prior).alias("score"))
    )
    wdoc = Window.partitionBy("doc_id").orderBy(F.col("score").desc(), "k")
    pred = (
        full_score.withColumn("rn", F.row_number().over(wdoc))
        .filter(F.col("rn") == 1)
        .select("actual", F.col("k").alias("predicted"))
    )
    return (
        pred.groupBy("actual", "predicted")
        .agg(F.count("*").cast("bigint").alias("n_docs"))
        .orderBy("actual", "predicted")
    )


@query(
    "kmeans_lloyd_step",
    f"""
    WITH q AS (
      SELECT vec_id,
             list_transform(embedding,
                            x -> CAST(round(x * 1e6) AS BIGINT)) AS qv
      FROM embeddings
    ),
    seeds AS (
      SELECT vec_id, qv,
             row_number() OVER (
               ORDER BY md5(vec_id::VARCHAR || ':km-seed-1'), vec_id) - 1 AS c
      FROM q
      QUALIFY row_number() OVER (
               ORDER BY md5(vec_id::VARCHAR || ':km-seed-1'), vec_id)
              <= {K_CLUSTERS}
    ),
    asg AS (
      SELECT q.vec_id, q.qv, s.c,
             CAST(list_sum(list_transform(
               generate_series(1, len(q.qv)),
               i -> (q.qv[i] - s.qv[i]) * (q.qv[i] - s.qv[i]))) AS BIGINT)
               AS d2
      FROM q CROSS JOIN seeds s
      QUALIFY row_number() OVER (PARTITION BY q.vec_id
                                 ORDER BY d2, s.c) = 1
    ),
    stats AS (
      SELECT c, CAST(count(*) AS BIGINT) AS n_members,
             CAST(sum(d2) AS BIGINT) AS inertia
      FROM asg GROUP BY c
    ),
    dims AS (
      SELECT a.c, u.pos, CAST(sum(a.qv[u.pos]) AS BIGINT) AS s
      FROM asg a, unnest(generate_series(1, len(a.qv))) AS u(pos)
      GROUP BY 1, 2
    )
    SELECT d.c AS cluster, CAST(d.pos AS INTEGER) AS pos,
           (d.s - ((d.s % st.n_members) + st.n_members) % st.n_members)
             // st.n_members AS centroid_q,
           st.n_members, st.inertia
    FROM dims d JOIN stats st USING (c)
    ORDER BY cluster, pos
    """,
)
def kmeans_lloyd_step(spark, sf_dir):
    """One exact Lloyd iteration on the embeddings table (module
    docstring): md5-picked seed centroids, micro-unit integer
    vectors, exact BIGINT distances via a zip_with fold (no dim
    explosion in the assignment), argmin with centroid-id tiebreak,
    then per-dim floor-division centroid updates and per-cluster
    exact inertia."""
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.select(
        "vec_id",
        F.expr(
            "transform(embedding, x -> cast(round(x * 1e6) as bigint))"
        ).alias("qv"),
    )
    # seed pick = TakeOrderedAndProject (orderBy().limit(k)) + a
    # bounded K-row collect — the operators/ivf.py seed_centroids
    # shape — NOT a global row_number window over the whole corpus
    seed_rows = (
        q.select(
            "vec_id",
            "qv",
            F.md5(
                F.concat(F.col("vec_id").cast("string"), F.lit(":km-seed-1"))
            ).alias("sk"),
        )
        .orderBy("sk", "vec_id")
        .limit(K_CLUSTERS)
        .collect()
    )
    seed_rows.sort(key=lambda r: (r["sk"], r["vec_id"]))
    seeds = spark.createDataFrame(
        [(i, list(r["qv"])) for i, r in enumerate(seed_rows)],
        "c int, cqv array<bigint>",
    )
    d2 = F.expr(
        "aggregate(zip_with(qv, cqv, (a, b) -> (a - b) * (a - b)),"
        " cast(0 as bigint), (acc, x) -> acc + x)"
    )
    wvec = Window.partitionBy("vec_id").orderBy("d2", "c")
    asg = (
        q.crossJoin(F.broadcast(seeds))
        .withColumn("d2", d2)
        .withColumn("rn", F.row_number().over(wvec))
        .filter(F.col("rn") == 1)
        .select("vec_id", "qv", "c", "d2")
    )
    stats = asg.groupBy("c").agg(
        F.count("*").cast("bigint").alias("n_members"),
        F.sum("d2").cast("bigint").alias("inertia"),
    )
    dims = (
        asg.select("c", F.posexplode("qv").alias("pos0", "val"))
        .groupBy("c", (F.col("pos0") + 1).alias("pos"))
        .agg(F.sum("val").cast("bigint").alias("s"))
    )
    s, n = F.col("s"), F.col("n_members")
    centroid = (s - ((s % n) + n) % n) / n
    return (
        dims.join(F.broadcast(stats), "c")
        .select(
            F.col("c").alias("cluster"),
            F.col("pos").cast("int").alias("pos"),
            centroid.cast("bigint").alias("centroid_q"),
            "n_members",
            "inertia",
        )
        .orderBy("cluster", "pos")
    )


@query(
    "kaplan_meier_survival",
    """
    WITH bounds AS (SELECT max(o_orderdate) AS mx FROM orders),
    lt AS (
      SELECT o_custkey,
             CAST(max(o_orderdate) AS DATE)
               - CAST(min(o_orderdate) AS DATE) AS lifetime,
             CASE WHEN max(o_orderdate) > (SELECT mx FROM bounds)
                               - INTERVAL 90 DAY
                  THEN 0 ELSE 1 END AS churned
      FROM orders GROUP BY o_custkey
    ),
    totals AS (SELECT CAST(count(*) AS BIGINT) AS n_users FROM lt),
    byday AS (
      SELECT lifetime,
             CAST(count(*) AS BIGINT) AS cnt_all,
             CAST(sum(churned) AS BIGINT) AS d
      FROM lt GROUP BY 1
    ),
    risk AS (
      SELECT lifetime, d,
             (SELECT n_users FROM totals)
               - CAST(coalesce(sum(cnt_all) OVER (ORDER BY lifetime
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                       0) AS BIGINT) AS n
      FROM byday
    ),
    ev AS (
      SELECT lifetime, d, n,
             1.0::DOUBLE - CAST(d AS DOUBLE) / CAST(n AS DOUBLE) AS factor
      FROM risk WHERE d > 0
    ),
    ser AS (
      SELECT list(lifetime ORDER BY lifetime) AS ts_,
             list(d ORDER BY lifetime) AS ds,
             list(n ORDER BY lifetime) AS ns,
             list(factor ORDER BY lifetime) AS fs
      FROM ev
    )
    SELECT ts_[u.i] AS lifetime_days, ds[u.i] AS d, ns[u.i] AS n,
           list_reduce(list_prepend(1.0::DOUBLE, fs[1:u.i]),
                       (a, x) -> a * x) AS survival
    FROM ser, unnest(generate_series(1, len(fs))) AS u(i)
    ORDER BY lifetime_days
    """,
)
def kaplan_meier_survival(spark, sf_dir):
    """Kaplan-Meier survival curve of customer TENURE (first order →
    last order, in days; Kaplan & Meier 1958, public) with right-
    censoring: a customer churns at their last order unless it falls
    within 90 days of the corpus end (still active => censored).
    Order dates span ~6 years with ~7-month gaps, so the curve mixes
    real events and a censored tail (the events table's uniform
    activity censors EVERYONE — a vacuous curve, hence orders). Risk sets and event counts are exact
    integers from one grouped pass + a cumulative window; each step
    factor (1 - d/n) is ONE identical-text float division; the
    survival curve is a strict left PRODUCT fold over the ordered
    factors (seed 1.0), bit-identical across engines by the
    ewma/holt fold contract — no rounding slack. The O(steps^2)
    prefix refold is calendar-bounded (distinct churn days), not
    corpus-bounded."""
    o = load_table(spark, sf_dir, "orders")
    bounds = o.agg(F.max("o_orderdate").alias("mx"))
    lt = (
        o.crossJoin(F.broadcast(bounds))
        .groupBy("o_custkey")
        .agg(
            F.datediff(
                F.max("o_orderdate").cast("date"),
                F.min("o_orderdate").cast("date"),
            ).alias("lifetime"),
            F.when(
                F.max("o_orderdate")
                > F.first("mx") - F.expr("INTERVAL 90 DAY"),
                0,
            )
            .otherwise(1)
            .alias("churned"),
        )
    )
    totals = lt.agg(F.count("*").cast("bigint").alias("n_users"))
    byday = lt.groupBy("lifetime").agg(
        F.count("*").cast("bigint").alias("cnt_all"),
        F.sum("churned").cast("bigint").alias("d"),
    )
    wprev = Window.orderBy("lifetime").rowsBetween(
        Window.unboundedPreceding, -1
    )
    risk = byday.crossJoin(F.broadcast(totals)).select(
        "lifetime",
        "d",
        (
            F.col("n_users")
            - F.coalesce(F.sum("cnt_all").over(wprev), F.lit(0))
        ).cast("bigint").alias("n"),
    )
    evd = risk.filter(F.col("d") > 0).withColumn(
        "factor",
        F.lit(1.0) - F.col("d").cast("double") / F.col("n").cast("double"),
    )
    ser = evd.agg(
        F.expr(
            "transform(array_sort(collect_list(struct(lifetime, d, n,"
            " factor))), x -> x)"
        ).alias("s")
    ).filter(F.size("s") > 0)
    # (sequence(1, 0) DESCENDS in Spark; the filter above keeps the
    # all-censored corner from indexing an empty array)
    idx = F.sequence(F.lit(1), F.size("s"))
    rows = ser.select(
        F.explode(
            F.transform(
                idx,
                lambda i: F.struct(
                    F.element_at("s", i)["lifetime"].alias("lifetime_days"),
                    F.element_at("s", i)["d"].alias("d"),
                    F.element_at("s", i)["n"].alias("n"),
                    F.aggregate(
                        F.slice(
                            F.expr("transform(s, x -> x.factor)"), F.lit(1), i
                        ),
                        F.lit(1.0),
                        lambda a, x: a * x,
                    ).alias("survival"),
                ),
            )
        ).alias("r")
    )
    return rows.select("r.*").orderBy("lifetime_days")


@query(
    "conformal_prediction_interval",
    """
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS day,
             sum(CAST(round(value * 100) AS BIGINT)) AS cents
      FROM events GROUP BY 1, 2
    ),
    seq AS (
      SELECT event_type, day, cents,
             row_number() OVER (PARTITION BY event_type ORDER BY day) AS rk,
             count(*) OVER (PARTITION BY event_type) AS n,
             lag(cents, 7) OVER (PARTITION BY event_type ORDER BY day)
               AS pred
      FROM daily
    ),
    scored AS (
      SELECT event_type, rk, n, abs(cents - pred) AS resid,
             CASE WHEN rk <= (7 * n) // 10 THEN 'cal' ELSE 'test' END AS split
      FROM seq WHERE pred IS NOT NULL
    ),
    cal AS (
      SELECT event_type, resid,
             row_number() OVER (PARTITION BY event_type ORDER BY resid) AS rr,
             count(*) OVER (PARTITION BY event_type) AS m
      FROM scored WHERE split = 'cal'
    ),
    qhat AS (
      SELECT event_type, m, resid AS q_cents
      FROM cal
      WHERE rr = least(m, CAST(ceil(0.9 * (m + 1)) AS BIGINT))
    )
    SELECT s.event_type, q.m AS n_calibration, q.q_cents,
           CAST(count(*) AS BIGINT) AS n_test,
           CAST(sum(CASE WHEN s.resid <= q.q_cents THEN 1 ELSE 0 END)
                AS BIGINT) AS n_covered,
           round(sum(CASE WHEN s.resid <= q.q_cents THEN 1 ELSE 0 END)
                 / (1.0 * count(*)), 6) AS coverage
    FROM scored s JOIN qhat q USING (event_type)
    WHERE s.split = 'test'
    GROUP BY 1, 2, 3
    ORDER BY 1
    """,
)
def conformal_prediction_interval(spark, sf_dir):
    """Split-conformal prediction intervals (Vovk et al.; Lei et al.
    2018 — public) around the seasonal-naive daily-revenue forecast:
    per type, the first 70% of forecastable days calibrate, q_hat is
    the EXACT ceil(0.9·(m+1))-th smallest absolute residual (integer
    cents, rank-based — no interpolation ambiguity), and the held-out
    tail reports its empirical coverage against [pred ± q_hat]. The
    conformal guarantee (coverage ≳ 90% under exchangeability) is a
    distribution-free wrapper any in-engine model here could use.
    Scale: two windows per type + one rank selection — calendar-
    bounded state, corpus-linear scans."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.to_date("ts").alias("day")
    ).agg(F.sum(F.round(F.col("value") * 100).cast("bigint")).alias("cents"))
    wt = Window.partitionBy("event_type").orderBy("day")
    wn = Window.partitionBy("event_type")
    seq = daily.select(
        "event_type",
        "cents",
        F.row_number().over(wt).alias("rk"),
        F.count("*").over(wn).alias("n"),
        F.lag("cents", 7).over(wt).alias("pred"),
    )
    scored = seq.filter(F.col("pred").isNotNull()).select(
        "event_type",
        "rk",
        "n",
        F.abs(F.col("cents") - F.col("pred")).alias("resid"),
        F.when(F.col("rk") <= F.expr("div(7 * n, 10)"), "cal")
        .otherwise("test")
        .alias("split"),
    )
    cal = scored.filter(F.col("split") == "cal").select(
        "event_type",
        "resid",
        F.row_number()
        .over(Window.partitionBy("event_type").orderBy("resid"))
        .alias("rr"),
        F.count("*")
        .over(Window.partitionBy("event_type"))
        .alias("m"),
    )
    qhat = cal.filter(
        F.col("rr")
        == F.least(
            F.col("m"), F.ceil(F.lit(0.9) * (F.col("m") + 1)).cast("bigint")
        )
    ).select("event_type", "m", F.col("resid").alias("q_cents"))
    test = scored.filter(F.col("split") == "test")
    covered = F.sum(
        F.when(F.col("resid") <= F.col("q_cents"), 1).otherwise(0)
    )
    return (
        test.join(F.broadcast(qhat), "event_type")
        .groupBy("event_type", F.col("m").alias("n_calibration"), "q_cents")
        .agg(
            F.count("*").cast("bigint").alias("n_test"),
            covered.cast("bigint").alias("n_covered"),
            F.round(covered / (F.lit(1.0) * F.count("*")), 6).alias(
                "coverage"
            ),
        )
        .orderBy("event_type")
    )


ISO_BINS = 40
ISO_VMAX = 600.0  # fixed value-domain cap (observed max ~560 at sf0.1)


@query(
    "isotonic_calibration",
    f"""
    WITH ev AS (
      SELECT LEAST(CAST(floor(value * {ISO_BINS} / {ISO_VMAX}) AS BIGINT),
                   {ISO_BINS} - 1) AS bin,
             CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
      FROM events WHERE value IS NOT NULL
    ),
    b AS (
      SELECT bin, count(*)::BIGINT AS n, sum(y)::BIGINT AS s
      FROM ev GROUP BY bin
    ),
    p AS (
      SELECT bin, n, s,
             sum(s) OVER (ORDER BY bin) AS cs,
             sum(n) OVER (ORDER BY bin) AS cn
      FROM b
    ),
    pairs AS (
      SELECT pj.bin AS j, pk.bin AS k,
             (pk.cs - (pj.cs - pj.s))::DOUBLE
               / (pk.cn - (pj.cn - pj.n)) AS r
      FROM p pj JOIN p pk ON pj.bin <= pk.bin
    ),
    m AS (
      SELECT j, k, min(r) OVER (PARTITION BY j ORDER BY k DESC) AS mr
      FROM pairs
    ),
    f AS (SELECT k AS bin, max(mr) AS fit FROM m GROUP BY k)
    SELECT b.bin, b.n, b.s,
           round(b.s::DOUBLE / b.n, 12) AS raw_rate,
           round(f.fit, 12) AS iso_rate
    FROM b JOIN f USING (bin)
    """,
)
def isotonic_calibration(spark, sf_dir):
    """Exact isotonic regression (PAVA) of purchase rate vs the event
    value — the calibration step that turns any monotone score into
    calibrated probabilities. Instead of the sequential
    pool-adjacent-violators loop (inherently serial, driver-bound),
    this computes the CLOSED FORM of the isotonic solution:

        fitted[i] = max_{j<=i} min_{k>=i} mean(y[j..k])

    over B=40 fixed-width value bins, which is model-state-sized work
    (B^2 candidate means) after ONE data-scale aggregation. Binning is
    a stateless per-row expression (floor over a fixed domain — no
    global sort, unlike ntile), so the only shuffle that sees data
    volume is the 40-key groupBy with map-side partial aggregation.

    Exactness: every candidate mean is one division of exact BIGINT
    prefix-sum differences — both engines compute the identical IEEE
    double per (num, den) pair, so the min/max lattice over them is
    engine-portable; rounding happens once at output. The Spark pair
    generation uses explode(sequence(0, k)) + an equi-join instead of
    the oracle's inequality join, keeping the physical plan free of
    nested-loop joins even on the model-state table.

    Cross-checked in tests/test_mlops.py against a classic sequential
    weighted-PAVA re-derivation (stack algorithm) — the max-min form
    and the pooling loop must agree to the last rounded digit."""
    ev = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull())
        .select(
            F.least(
                F.floor(F.col("value") * ISO_BINS / F.lit(ISO_VMAX)).cast(
                    "bigint"
                ),
                F.lit(ISO_BINS - 1),
            ).alias("bin"),
            F.when(F.col("event_type") == "purchase", 1)
            .otherwise(0)
            .alias("y"),
        )
    )
    b = ev.groupBy("bin").agg(
        F.count("*").alias("n"), F.sum("y").alias("s")
    )
    # prefix sums over the B-row model table (single-partition window
    # on bounded model state — the calendar-dim-sized class)
    wp = Window.orderBy("bin").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    p = b.select(
        "bin",
        "n",
        "s",
        F.sum("s").over(wp).alias("cs"),
        F.sum("n").over(wp).alias("cn"),
    )
    pk = p.select(F.col("bin").alias("k"), "cs", "cn")
    pj = p.select(
        F.col("bin").alias("j"),
        (F.col("cs") - F.col("s")).alias("cs0"),
        (F.col("cn") - F.col("n")).alias("cn0"),
    )
    pairs = (
        pk.select(
            "k",
            "cs",
            "cn",
            F.explode(F.sequence(F.lit(0), F.col("k"))).alias("j"),
        )
        .join(pj, "j")
        .select(
            "j",
            "k",
            (
                (F.col("cs") - F.col("cs0")).cast("double")
                / (F.col("cn") - F.col("cn0"))
            ).alias("r"),
        )
    )
    wm = (
        Window.partitionBy("j")
        .orderBy(F.col("k").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    m = pairs.select("k", F.min("r").over(wm).alias("mr"))
    f = m.groupBy("k").agg(F.max("mr").alias("fit"))
    return b.join(f, b["bin"] == f["k"]).select(
        "bin",
        "n",
        "s",
        F.round(F.col("s").cast("double") / F.col("n"), 12).alias(
            "raw_rate"
        ),
        F.round("fit", 12).alias("iso_rate"),
    )
