"""Additional surface breadth: IVF ANN (rows-only), pivot, posexplode,
and array-function composition — each mirroring a common production
query shape."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_mp_transactions_spark.operators.ivf import ivf_topk
from etl_mp_transactions_spark.registry import query
from etl_mp_transactions_spark.sources.tables import load_table


@query("ann_ivf")  # rows-only: numpy k-means index is not SQL-expressible
def ann_ivf(spark, sf_dir):
    """IVF ANN: deterministic k-means coarse quantizer + nprobe
    inverted-list search. Recall vs brute force asserted in
    tests/test_ivf.py."""
    return ivf_topk(
        load_table(spark, sf_dir, "embeddings"),
        k_neighbors=5,
        n_centroids=16,
        nprobe=4,
    )


@query(
    "pivot_event_types",
    """
    SELECT user_id,
           COUNT(*) FILTER (WHERE event_type = 'click') AS click,
           COUNT(*) FILTER (WHERE event_type = 'view') AS view,
           COUNT(*) FILTER (WHERE event_type = 'purchase') AS purchase,
           COUNT(*) FILTER (WHERE event_type = 'signup') AS signup,
           COUNT(*) FILTER (WHERE event_type = 'error') AS error
    FROM events GROUP BY user_id
    """,
)
def pivot_event_types(spark, sf_dir):
    """Pivot (long→wide) with an explicit value list — one hash agg,
    no second shuffle; the oracle is the equivalent conditional
    aggregation."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy("user_id")
        .pivot("event_type", ["click", "view", "purchase", "signup", "error"])
        .count()
        .na.fill(0)
    )


@query(
    "posexplode_tokens",
    """
    SELECT doc_id, i - 1 AS pos, toks[i] AS tok
    FROM (SELECT doc_id, string_split_regex(text, '\\s+') AS toks FROM documents),
         unnest(generate_series(1, len(toks))) AS t(i)
    WHERE i <= 5
    """,
)
def posexplode_tokens(spark, sf_dir):
    """Positional flatten (posexplode ≅ UNNEST WITH ORDINALITY)."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select(
            "doc_id", F.posexplode(F.split("text", r"\s+")).alias("pos", "tok")
        )
        .filter(F.col("pos") < 5)
        .withColumn("pos", F.col("pos").cast("long"))
    )


@query(
    "array_function_breadth",
    """
    WITH t AS (SELECT doc_id, string_split_regex(text, '\\s+') AS toks FROM documents)
    SELECT doc_id,
           array_to_string(toks[1:3], ' ') AS head3,
           array_to_string(list_sort(list_distinct(toks))[1:3], ',') AS first_sorted,
           len(list_filter(toks, x -> length(x) > 4)) AS n_long,
           list_sum(list_transform(toks, x -> length(x))) AS total_chars
    FROM t
    """,
)
def array_function_breadth(spark, sf_dir):
    """slice / sort / distinct / filter / transform / aggregate over
    token arrays — the §2.6 'library breadth' row exercised in one
    projection."""
    docs = load_table(spark, sf_dir, "documents")
    toks = F.split("text", r"\s+")
    return docs.select(
        "doc_id",
        F.array_join(F.slice(toks, 1, 3), " ").alias("head3"),
        F.array_join(
            F.slice(F.array_sort(F.array_distinct(toks)), 1, 3), ","
        ).alias("first_sorted"),
        F.size(F.filter(toks, lambda x: F.length(x) > 4)).cast("long").alias("n_long"),
        F.aggregate(
            F.transform(toks, lambda x: F.length(x).cast("long")),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        ).alias("total_chars"),
    )
