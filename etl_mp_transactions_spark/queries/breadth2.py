"""Breadth batch 3 (SURVEY.md §2.5/§2.8/§2.9): approximate-distinct
with asserted error bounds, exact percentile gating, an SCD2 history
builder, and a grouped-agg pandas UDAF with exact integer parity.
"""

# NB: no `from __future__ import annotations` here — it would turn the
# grouped-agg pandas UDAF's type hints into strings, which pandas_udf
# cannot resolve for signature inference (UNSUPPORTED_SIGNATURE).

from pyspark.sql import functions as F

from etl_mp_transactions_spark.registry import query
from etl_mp_transactions_spark.sources.tables import load_table


@query(
    "approx_distinct_bounds",
    """
    SELECT event_type,
           count(DISTINCT user_id)::BIGINT AS exact_users,
           TRUE AS approx_within_15pct
    FROM events
    GROUP BY event_type
    """,
)
def approx_distinct_bounds(spark, sf_dir):
    """HyperLogLog++ distinct-count sketch vs the exact count, with
    the 15% error envelope asserted *inside the result* (3× the
    rsd=0.05 target): the oracle pins `TRUE`, so a sketch drifting out
    of its bound fails the gate rather than a unit test. Sketches are
    the 100 TB path for distinct-user metrics — mergeable partials, no
    distinct shuffle of raw ids; the exact count here is the local
    verification cost, not part of the production plan."""
    ev = load_table(spark, sf_dir, "events")
    agg = ev.groupBy("event_type").agg(
        F.count_distinct("user_id").alias("exact_users"),
        F.approx_count_distinct("user_id", rsd=0.05).alias("approx_users"),
    )
    within = (
        F.abs(F.col("approx_users") - F.col("exact_users"))
        <= F.col("exact_users") * F.lit(0.15)
    )
    return agg.select(
        "event_type", "exact_users", within.alias("approx_within_15pct")
    )


@query(
    "quality_percentile_gate",
    """
    WITH q AS (
      SELECT doc_id, lang,
             len(string_split_regex(text, '\\s+'))::BIGINT AS n_tokens
      FROM documents
    ),
    r AS (
      SELECT doc_id, lang, n_tokens,
             percent_rank() OVER (PARTITION BY lang ORDER BY n_tokens)
               AS length_pr,
             cume_dist() OVER (PARTITION BY lang ORDER BY n_tokens)
               AS length_cd
      FROM q
    )
    SELECT doc_id, lang, n_tokens, length_pr, length_cd
    FROM r
    WHERE length_pr >= 0.25
    """,
)
def quality_percentile_gate(spark, sf_dir):
    """Per-language percentile gate: drop the shortest quartile of
    documents per lang — the distribution-relative filter used when
    absolute thresholds can't transfer across languages. percent_rank
    and cume_dist are rank-based (tie-stable, deterministic without a
    tiebreak column). One window shuffle on lang; the rank sort is
    per-group local."""
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    n_tokens = F.size(F.split(F.col("text"), r"\s+")).cast("long")
    q = docs.select("doc_id", "lang", n_tokens.alias("n_tokens"))
    w = Window.partitionBy("lang").orderBy("n_tokens")
    r = q.select(
        "doc_id",
        "lang",
        "n_tokens",
        F.percent_rank().over(w).alias("length_pr"),
        F.cume_dist().over(w).alias("length_cd"),
    )
    return r.filter(F.col("length_pr") >= 0.25)


@query(
    "scd2_customer_history",
    """
    SELECT o_custkey AS custkey,
           o_orderstatus AS status,
           o_orderdate AS valid_from,
           lead(o_orderdate) OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
           ) AS valid_to,
           (lead(o_orderdate) OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
           ) IS NULL) AS is_current
    FROM orders
    """,
)
def scd2_customer_history(spark, sf_dir):
    """SCD type-2 dimension build from an event stream: each change
    record becomes an effective-dated row — valid_from = its date,
    valid_to = the next change's date (NULL = current). The lead()
    window is the whole operator; at scale this is one shuffle on the
    business key and a per-key local sort, the standard
    history-table materialization."""
    from pyspark.sql import Window

    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    nxt = F.lead("o_orderdate").over(w)
    return o.select(
        F.col("o_custkey").alias("custkey"),
        F.col("o_orderstatus").alias("status"),
        F.col("o_orderdate").alias("valid_from"),
        nxt.alias("valid_to"),
        nxt.isNull().alias("is_current"),
    )


@query(
    "xor_checksum_udaf",
    """
    SELECT o_orderstatus,
           bit_xor(('0x' || substr(md5(o_orderkey::VARCHAR), 1, 8))::BIGINT)
             AS xor_checksum,
           count(*) AS n
    FROM orders
    GROUP BY o_orderstatus
    """,
)
def xor_checksum_udaf(spark, sf_dir):
    """§2.8 extension surface: a grouped-agg pandas UDAF (Arrow-
    batched) implementing BIT_XOR, an aggregate Spark lacks as a
    built-in. XOR of per-row md5-prefix ints gives an order-
    independent content checksum per group — exact int64 parity with
    DuckDB's native bit_xor. Scale note, stated honestly: Spark does
    NOT map-side-combine pandas UDAFs — every raw row crosses the
    group exchange — so at 100 TB a two-phase form (per-partition XOR
    via mapInPandas, then a tiny final group) is the right plan; this
    query demonstrates the §2.8 UDAF extension point itself."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("long")
    def bit_xor_agg(v: pd.Series) -> int:
        import numpy as np

        return int(np.bitwise_xor.reduce(v.to_numpy(dtype="int64")))

    # grouped-agg pandas UDFs cannot share an agg() with built-in
    # aggregates (INVALID_PANDAS_UDF_PLACEMENT), so the row count is a
    # second Arrow UDAF in the same exchange
    @pandas_udf("long")
    def count_agg(v: pd.Series) -> int:
        return len(v)

    o = load_table(spark, sf_dir, "orders")
    h = F.conv(F.substring(F.md5(F.col("o_orderkey").cast("string")), 1, 8), 16, 10).cast(
        "long"
    )
    return (
        o.select("o_orderstatus", h.alias("h"))
        .groupBy("o_orderstatus")
        .agg(
            bit_xor_agg(F.col("h")).alias("xor_checksum"),
            count_agg(F.col("h")).alias("n"),
        )
    )


@query(
    "json_array_roundtrip",
    """
    SELECT user_id, count(*) AS n,
           min(event_id) AS min_id, max(event_id) AS max_id
    FROM events
    GROUP BY user_id
    """,
)
def json_array_roundtrip(spark, sf_dir):
    """Nested-JSON-array processing (C5/C6 extended): per-user event
    arrays serialized with to_json, parsed back with a typed
    from_json(array<struct>) schema, exploded, and re-aggregated. The
    oracle aggregates the raw table directly — equality proves the
    serialize→parse round trip is lossless, without brittle
    JSON-string comparison across engines."""
    from pyspark.sql import types as T

    ev = load_table(spark, sf_dir, "events")
    arr_schema = T.ArrayType(T.StructType([T.StructField("event_id", T.LongType())]))
    agg = ev.groupBy("user_id").agg(
        F.to_json(F.sort_array(F.collect_list(F.struct("event_id")))).alias("j")
    )
    parsed = agg.select(
        "user_id", F.explode(F.from_json("j", arr_schema)).alias("x")
    )
    return parsed.groupBy("user_id").agg(
        F.count("*").alias("n"),
        F.min("x.event_id").alias("min_id"),
        F.max("x.event_id").alias("max_id"),
    )


@query(
    "unpivot_measures",
    """
    SELECT l_orderkey, l_linenumber, measure, value
    FROM (
      SELECT l_orderkey, l_linenumber, 'qty' AS measure,
             CAST(l_quantity AS DOUBLE) AS value FROM lineitem
      UNION ALL
      SELECT l_orderkey, l_linenumber, 'price', l_extendedprice FROM lineitem
      UNION ALL
      SELECT l_orderkey, l_linenumber, 'discount', l_discount FROM lineitem
    )
    WHERE value > 0.05
    """,
)
def unpivot_measures(spark, sf_dir):
    """§2.5 unpivot (wide→long): three measure columns melted into
    (measure, value) rows via the native unpivot operator — the
    inverse of pivot_event_types. Map-only: Spark expands rows inside
    the scan projection, no shuffle and no triple-scan (the oracle's
    UNION ALL spelling reads the table three times; the engine reads
    it once)."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.select(
            "l_orderkey",
            "l_linenumber",
            F.col("l_quantity").cast("double").alias("qty"),
            F.col("l_extendedprice").alias("price"),
            F.col("l_discount").alias("discount"),
        )
        .unpivot(
            ["l_orderkey", "l_linenumber"],
            ["qty", "price", "discount"],
            "measure",
            "value",
        )
        .filter(F.col("value") > 0.05)
    )
