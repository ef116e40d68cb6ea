"""Incremental-maintenance surfaces: materialized-view refresh from
mergeable partial aggregates, and mergeable distinct-count sketches
(SURVEY.md §2.9 / §2.5 extensions).

At 100 TB the recurring-aggregation cost model is everything: a daily
"orders by year/status" rollup must cost O(delta), not O(history).
Both queries here pin the *algebraic* property that makes that true —
the state is a mergeable partial (sum/count pairs, HLL sketches), so
refresh = merge(stored_state, delta_partials), never a rescan.

The reference has no analog (every request recomputes from BigQuery);
this is the engine generalization its checksum seen-set (R1) hints at.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from etl_mp_transactions_spark.registry import query
from etl_mp_transactions_spark.sources.tables import load_table

_CUTOFF = "1997-01-01 00:00:00"


@query(
    "incremental_mv_refresh",
    f"""
    SELECT year(o_orderdate) AS o_year, o_orderstatus,
           count(*)::BIGINT AS n_orders,
           CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS DOUBLE) / 100
             AS total_price,
           CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS DOUBLE)
             / count(*) / 100 AS avg_price
    FROM orders
    GROUP BY 1, 2
    """,
)
def incremental_mv_refresh(spark, sf_dir):
    """Materialized-view incremental refresh: the stored state is the
    *partial* aggregate (count + BIGINT-cents sum per group) computed
    from history (o_orderdate < {_CUTOFF!r}) and persisted to parquet;
    the refresh merges the delta slice's partials into it with one
    group-by — history is never rescanned. AVG is derived at read time
    from the mergeable pair (sum, count); all money stays in exact
    int64 cents so merge order cannot drift the result.

    The oracle is the full recompute over all of `orders` — equality
    IS the correctness statement (incremental == full).

    Scale: refresh cost ∝ delta bytes + |state| (group-cardinality-
    bounded, ≪ fact table); the merge shuffles on the group key only.
    On a real deployment the state parquet is a table-format MERGE
    target; the algebra is identical."""
    o = load_table(spark, sf_dir, "orders")
    cutoff = F.lit(_CUTOFF).cast("timestamp_ntz")
    cents = F.round(F.col("o_totalprice") * 100).cast("bigint")

    def partials(df):
        return (
            df.groupBy(
                F.year("o_orderdate").alias("o_year"),
                F.col("o_orderstatus"),
            ).agg(
                F.count("*").alias("n_orders"),
                F.sum(cents).alias("sum_cents"),
            )
        )

    from etl_mp_transactions_spark.workdirs import run_dir

    # private uuid-keyed run dir with age-based GC: concurrent
    # invocations at the same SF (driver correctness + bench can
    # overlap) must not race on shared state, and repeated sweeps must
    # not leak one state dir per run (ADVICE r4)
    state_dir = os.path.join(run_dir("mv_state"), "state")
    # build + persist the historical state (one-time cost in a real
    # deployment; re-staged per run here so the query is self-contained)
    partials(o.filter(F.col("o_orderdate") < cutoff)).write.mode(
        "overwrite"
    ).parquet(state_dir)

    stored = spark.read.parquet(state_dir)
    delta = partials(o.filter(F.col("o_orderdate") >= cutoff))
    merged = (
        stored.unionByName(delta)
        .groupBy("o_year", "o_orderstatus")
        .agg(
            F.sum("n_orders").alias("n_orders"),
            F.sum("sum_cents").alias("sum_cents"),
        )
    )
    return merged.select(
        "o_year",
        "o_orderstatus",
        "n_orders",
        (F.col("sum_cents").cast("double") / 100).alias("total_price"),
        (F.col("sum_cents").cast("double") / F.col("n_orders") / 100).alias(
            "avg_price"
        ),
    )


@query(
    "hll_sketch_rollup",
    """
    SELECT event_type,
           count(DISTINCT user_id)::BIGINT AS exact_users,
           TRUE AS within_5pct
    FROM events
    GROUP BY event_type
    """,
)
def hll_sketch_rollup(spark, sf_dir):
    """Mergeable distinct-count sketches (Apache DataSketches HLL,
    built into Spark 4): per-(event_type, hour) partial sketches are
    UNIONED up to event_type — the two-level rollup a 100 TB pipeline
    stores (daily partials, merged on demand) instead of re-scanning
    raw events per question. The estimate is pinned *in the result*:
    `within_5pct` asserts |est − exact| / exact < 0.05 per group, so
    the oracle (exact distinct + literal TRUE) fails if the sketch
    config ever degrades — same bounds-in-result pattern as
    approx_distinct_bounds/approx_topk_bounds.

    Scale: partials shuffle once on the fine key, the union shuffles
    sketch *bytes* (kilobytes/group), and no exact distinct state ever
    materializes — that exact branch below exists only to feed the
    local pin."""
    ev = load_table(spark, sf_dir, "events")
    partials = ev.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("hr")
    ).agg(F.hll_sketch_agg("user_id", F.lit(14)).alias("sketch"))
    rolled = partials.groupBy("event_type").agg(
        F.hll_sketch_estimate(F.hll_union_agg("sketch")).alias("est_users")
    )
    exact = ev.groupBy("event_type").agg(
        F.count_distinct("user_id").alias("exact_users")
    )
    return (
        rolled.join(exact, "event_type")
        .select(
            "event_type",
            "exact_users",
            (
                F.abs(F.col("est_users") - F.col("exact_users"))
                / F.col("exact_users")
                < 0.05
            ).alias("within_5pct"),
        )
    )


@query(
    "dq_expectations",
    """
    SELECT 'orderkey_unique' AS check_name,
           (SELECT count(*) FROM (
              SELECT o_orderkey FROM orders
              GROUP BY o_orderkey HAVING count(*) > 1))::BIGINT AS n_violations
    UNION ALL
    SELECT 'custkey_not_null',
           (SELECT count(*) FROM orders WHERE o_custkey IS NULL)::BIGINT
    UNION ALL
    SELECT 'custkey_fk_customer',
           (SELECT count(*) FROM orders o
            WHERE NOT EXISTS (SELECT 1 FROM customer c
                              WHERE c.c_custkey = o.o_custkey))::BIGINT
    UNION ALL
    SELECT 'status_accepted_values',
           (SELECT count(*) FROM orders
            WHERE o_orderstatus NOT IN ('F', 'O', 'P'))::BIGINT
    UNION ALL
    SELECT 'totalprice_non_negative',
           (SELECT count(*) FROM orders WHERE o_totalprice < 0)::BIGINT
    """,
)
def dq_expectations(spark, sf_dir):
    """Data-quality expectation suite (the dbt-test / Great-
    Expectations shape): uniqueness, not-null, referential integrity,
    accepted values, and range checks over `orders`, emitted as one
    (check_name, n_violations) audit table — the contract gate a
    pipeline runs before publishing a partition.

    Scale: each check is the cheapest plan for its class — the unique
    check is one agg on the key (count>1 groups), the FK check a
    broadcast left-anti against the dim, the rest map-side conditional
    sums fused into ONE scan via sum(CASE) so three row-level checks
    cost a single pass. Violation counts (not booleans) so the audit
    quantifies damage; zero rows is never silently conflated with
    'check did not run'."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")

    dupes = (
        o.groupBy("o_orderkey")
        .agg(F.count("*").alias("n"))
        .filter(F.col("n") > 1)
        .agg(F.count("*").alias("n_violations"))
        .select(F.lit("orderkey_unique").alias("check_name"), "n_violations")
    )
    fk = (
        o.join(F.broadcast(c.select("c_custkey")),
               o.o_custkey == F.col("c_custkey"), "left_anti")
        .agg(F.count("*").alias("n_violations"))
        .select(F.lit("custkey_fk_customer").alias("check_name"), "n_violations")
    )
    # three row-level checks in one scan: conditional sums
    rowchecks = o.agg(
        F.sum(F.when(F.col("o_custkey").isNull(), 1).otherwise(0)).alias("nn"),
        F.sum(
            F.when(~F.col("o_orderstatus").isin("F", "O", "P"), 1).otherwise(0)
        ).alias("av"),
        F.sum(F.when(F.col("o_totalprice") < 0, 1).otherwise(0)).alias("rng"),
    )
    row_long = rowchecks.selectExpr(
        """stack(3,
             'custkey_not_null', nn,
             'status_accepted_values', av,
             'totalprice_non_negative', rng) AS (check_name, n_violations)"""
    ).select("check_name", F.col("n_violations").cast("long"))
    return dupes.unionByName(row_long).unionByName(fk)
