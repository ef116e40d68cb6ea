"""Graph analytics round 3 + sequence/funnel analytics: k-core
peeling (the third exact iterative-algorithm oracle after PageRank
and BFS), event trigram path mining, and conversion-latency medians
(SURVEY.md §2.9 extensions).

k-core exactness: peeling is pure integer arithmetic — no floats at
all — so the DuckDB oracle replays the IDENTICAL fixed number of peel
rounds as chained CTEs and the gate value-checks every surviving
node's residual degree. Fixed rounds (6) is the distributed contract:
each round is one degree aggregation + one semi-join (the Pregel-style
peel), and 6 rounds of 2-core peeling converge on this graph family
(verified by the convergence test in tests/test_graph3.py — round 6
output equals round 5's, i.e. a fixpoint, so 'bounded rounds' is not
an approximation here).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from etl_mp_transactions_spark.operators import graphops
from etl_mp_transactions_spark.registry import query
from etl_mp_transactions_spark.sources.tables import load_table

KCORE_K = 2
KCORE_ROUNDS = 6


def _kcore_sql() -> str:
    # edges: DOULION-sampled supplier co-occurrence (the graph2 edge
    # builder — sampling keeps the oracle sf-independent-fast);
    # bidirected for degree counting
    # AS MATERIALIZED: without it DuckDB re-inlines the lineitem
    # self-join into every peel round's reference chain (measured
    # 122s → ~8s at sf0.01)
    head = f"""
    WITH co AS MATERIALIZED (
      SELECT a.l_suppkey AS s1, b.l_suppkey AS s2
      FROM lineitem a
      JOIN lineitem b
        ON a.l_orderkey = b.l_orderkey AND a.l_suppkey < b.l_suppkey
      GROUP BY 1, 2
      HAVING count(*) >= 2
    ),
    samp AS MATERIALIZED (
      SELECT s1, s2 FROM co
      WHERE ('0x' || substr(md5(s1::VARCHAR || ':' || s2::VARCHAR), 1, 8))
              ::BIGINT % 16 = 0
    ),
    e0 AS MATERIALIZED (
      SELECT s1 AS u, s2 AS v FROM samp
      UNION ALL SELECT s2 AS u, s1 AS v FROM samp
    )"""
    rounds = []
    prev = "e0"
    for r in range(1, KCORE_ROUNDS + 1):
        rounds.append(f"""
    d{r} AS (SELECT u, count(*)::BIGINT AS deg FROM {prev} GROUP BY u),
    keep{r} AS (SELECT u FROM d{r} WHERE deg >= {KCORE_K}),
    e{r} AS MATERIALIZED (
      SELECT e.u, e.v FROM {prev} e
      JOIN keep{r} ku ON e.u = ku.u
      JOIN keep{r} kv ON e.v = kv.u
    )""")
        prev = f"e{r}"
    return (
        head
        + ","
        + ",".join(rounds)
        + f"""
    SELECT u AS node, count(*)::BIGINT AS residual_deg
    FROM {prev} GROUP BY u
    """
    )


@query("kcore_decomposition", _kcore_sql())
def kcore_decomposition(spark, sf_dir):
    """{KCORE_K}-core of the sampled supplier co-occurrence graph via
    6 peel rounds (degree < k nodes removed each round, edges
    restricted to survivors). Output: surviving nodes with residual
    degree — value-oracled exactly via the unrolled-CTE replay.

    Per round: one degree agg + two semi-joins, all on uniform node
    keys; state is the shrinking edge list (checkpointed per round so
    lineage stays flat)."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey"
    )
    a, b = li.alias("a"), li.alias("b")
    co = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_suppkey") < F.col("b.l_suppkey")),
        )
        .groupBy(
            F.col("a.l_suppkey").alias("s1"),
            F.col("b.l_suppkey").alias("s2"),
        )
        .agg(F.count("*").alias("cnt"))
        .filter(F.col("cnt") >= 2)
        .select("s1", "s2")
    )
    edge_hash = F.conv(
        F.substring(
            F.md5(
                F.concat(
                    F.col("s1").cast("string"),
                    F.lit(":"),
                    F.col("s2").cast("string"),
                )
            ),
            1,
            8,
        ),
        16,
        10,
    ).cast("long")
    samp = co.filter(edge_hash % 16 == 0)
    edges = samp.select(
        F.col("s1").alias("u"), F.col("s2").alias("v")
    ).unionAll(
        samp.select(F.col("s2").alias("u"), F.col("s1").alias("v"))
    )
    peeled = graphops.kcore_peel(edges, KCORE_K, KCORE_ROUNDS)
    return peeled.groupBy(F.col("u").alias("node")).agg(
        F.count("*").alias("residual_deg")
    )


@query(
    "event_trigram_paths",
    """
    WITH seq AS (
      SELECT event_type AS e3,
             lag(event_type, 1) OVER w AS e2,
             lag(event_type, 2) OVER w AS e1
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT e1 || '>' || e2 || '>' || e3 AS path,
           count(*)::BIGINT AS n
    FROM seq WHERE e1 IS NOT NULL
    GROUP BY 1
    ORDER BY n DESC, path LIMIT 20
    """,
)
def event_trigram_paths(spark, sf_dir):
    """Top-20 three-step behavioral paths (event-type trigrams over
    per-user time-ordered streams) — the path-mining complement to
    markov_transitions. One lag window shuffled on user_id; path
    vocabulary is |types|³ ≤ 125, so the count agg is tiny."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        F.col("event_type").alias("e3"),
        F.lag("event_type", 1).over(w).alias("e2"),
        F.lag("event_type", 2).over(w).alias("e1"),
    ).filter(F.col("e1").isNotNull())
    return (
        seq.select(
            F.concat_ws(">", "e1", "e2", "e3").alias("path")
        )
        .groupBy("path")
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), "path")
        .limit(20)
    )


@query(
    "conversion_latency",
    """
    WITH firsts AS (
      SELECT user_id,
             min(CASE WHEN event_type = 'view' THEN ts END) AS t_view,
             min(CASE WHEN event_type = 'purchase' THEN ts END) AS t_buy
      FROM events GROUP BY user_id
    ),
    lat AS (
      SELECT user_id, user_id % 2 AS cohort,
             epoch_us(t_buy) - epoch_us(t_view) AS us
      FROM firsts
      WHERE t_view IS NOT NULL AND t_buy IS NOT NULL AND t_buy >= t_view
    ),
    ranked AS (
      SELECT cohort, us,
             row_number() OVER (PARTITION BY cohort
                                ORDER BY us, user_id) AS rn,
             count(*) OVER (PARTITION BY cohort) AS n
      FROM lat
    )
    SELECT cohort, max(n)::BIGINT AS n_converted,
           max(CASE WHEN rn = (n + 1) // 2 THEN us END)
             AS median_latency_us
    FROM ranked GROUP BY cohort
    """,
)
def conversion_latency(spark, sf_dir):
    """Median time from first 'view' to first 'purchase' per
    experiment cohort (exact lower median over BIGINT microseconds —
    microsecond arithmetic because truncate-to-seconds-then-subtract
    and subtract-then-truncate disagree by 1s on sub-second
    timestamps; the mad_outliers house recipe with user_id tiebreak).
    Funnel timing — the metric behind 'did the new flow convert
    faster'. One groupBy on user_id + a cohort-partitioned rank
    window."""
    ev = load_table(spark, sf_dir, "events")
    firsts = ev.groupBy("user_id").agg(
        F.min(
            F.when(F.col("event_type") == "view", F.col("ts"))
        ).alias("t_view"),
        F.min(
            F.when(F.col("event_type") == "purchase", F.col("ts"))
        ).alias("t_buy"),
    )
    lat = firsts.filter(
        F.col("t_view").isNotNull()
        & F.col("t_buy").isNotNull()
        & (F.col("t_buy") >= F.col("t_view"))
    ).select(
        "user_id",
        (F.col("user_id") % 2).alias("cohort"),
        (
            F.unix_micros(F.col("t_buy").cast("timestamp"))
            - F.unix_micros(F.col("t_view").cast("timestamp"))
        ).alias("us"),
    )
    w = Window.partitionBy("cohort").orderBy("us", "user_id")
    wc = Window.partitionBy("cohort")
    ranked = lat.select(
        "cohort",
        "us",
        F.row_number().over(w).alias("rn"),
        F.count("*").over(wc).alias("n"),
    )
    return ranked.groupBy("cohort").agg(
        F.max("n").alias("n_converted"),
        F.max(
            F.when(
                F.col("rn") == ((F.col("n") + 1) / 2).cast("long"),
                F.col("us"),
            )
        ).alias("median_latency_us"),
    )
