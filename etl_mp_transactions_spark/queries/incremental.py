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
import tempfile

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

    import uuid

    # run-keyed dir: concurrent invocations at the same SF (driver
    # correctness + bench can overlap) must not race on shared state
    sf_tag = os.path.basename(sf_dir.rstrip("/")) or "sf"
    state_dir = os.path.join(
        tempfile.gettempdir(), f"sg_mv_state_{sf_tag}_{uuid.uuid4().hex[:8]}"
    )
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
