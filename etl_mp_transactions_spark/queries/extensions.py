"""Modern-Spark extension surfaces (§2.8): the VARIANT semi-structured
type and Python UDTFs (user-defined *table* functions).

Both are Spark-4 API families a user migrating off the reference would
expect the engine to speak: VARIANT is the open-ended-JSON column type
(parse once, extract typed paths lazily — the shredded successor to
get_json_object string re-parsing), and UDTFs are the row→rows
extension point (the reference's plugin transforms, SURVEY §2.8, when
one input row fans out to many).
"""

from __future__ import annotations

import uuid

from pyspark.sql import functions as F

from etl_mp_transactions_spark.registry import query
from etl_mp_transactions_spark.sources.tables import load_table


@query(
    "variant_json_stats",
    """
    SELECT event_type,
           count(*) AS n,
           sum(json_extract(props, '$.k')::BIGINT) AS sum_k,
           min(json_extract(props, '$.k')::BIGINT) AS min_k,
           max(json_extract(props, '$.k')::BIGINT) AS max_k
    FROM events GROUP BY event_type
    """,
)
def variant_json_stats(spark, sf_dir):
    """VARIANT ingestion: parse the free-form props JSON into a
    VARIANT column once, then extract a typed path with
    try_variant_get. Unlike get_json_object (string re-parse per
    extraction), VARIANT parses at ingest into a binary form and
    each path extraction is a cheap traversal — the right shape when
    one JSON column feeds many downstream extractions. The agg after
    extraction is an ordinary hash agg."""
    ev = load_table(spark, sf_dir, "events")
    k = F.try_variant_get(F.parse_json("props"), "$.k", "long")
    return (
        ev.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum("k").alias("sum_k"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
        )
    )


@query(
    "udtf_trigram_stats",
    r"""
    WITH toks AS (
      SELECT doc_id,
             list_filter(string_split_regex(lower(text), '\s+'),
                         x -> x <> '') AS l
      FROM documents
    )
    SELECT doc_id,
           (length(l) - 2)::BIGINT AS n_grams,
           length(list_distinct(list_transform(
             list_zip(l[1:length(l)-2], l[2:length(l)-1], l[3:length(l)]),
             z -> z[1] || ' ' || z[2] || ' ' || z[3])))::BIGINT
             AS n_distinct_grams
    FROM toks WHERE length(l) >= 3
    """,
)
def udtf_trigram_stats(spark, sf_dir):
    """Python UDTF (§2.8 row→rows extension point): an Arrow-optimized
    table function emitting per-document trigram stats, invoked via
    SQL LATERAL — the API a plugin author uses when a transform fans
    one row out to N and can't be a scalar UDF. The JVM-only
    expression twin exists (text_top_bigrams builds n-grams with
    slice+zip_with); this entry covers the extension *API*: batch-
    bounded Arrow transfer, typed return schema, lateral
    correlation. Emitting the aggregate (not every gram) keeps the
    Python→JVM transfer to one row per doc."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="n_grams: long, n_distinct_grams: long", useArrow=True)
    class TrigramStats:
        def eval(self, text: str):
            toks = [t for t in (text or "").lower().split() if t]
            if len(toks) < 3:
                return
            grams = [
                " ".join(toks[i : i + 3]) for i in range(len(toks) - 2)
            ]
            yield len(grams), len(set(grams))

    name = f"trigram_stats_{uuid.uuid4().hex[:8]}"
    spark.udtf.register(name, TrigramStats)
    docs = load_table(spark, sf_dir, "documents")
    view = f"docs_{uuid.uuid4().hex[:8]}"
    docs.createOrReplaceTempView(view)
    return spark.sql(
        f"""
        SELECT d.doc_id, t.n_grams, t.n_distinct_grams
        FROM {view} AS d, LATERAL {name}(d.text) AS t
        """
    )


@query(
    "approx_topk_bounds",
    r"""
    WITH t AS (
      SELECT unnest(list_filter(string_split_regex(lower(text), '\s+'),
                                x -> x <> '')) AS tok
      FROM documents
    )
    SELECT tok, count(*) AS n, TRUE AS sketch_exact
    FROM t GROUP BY tok
    ORDER BY n DESC, tok LIMIT 5
    """,
)
def approx_topk_bounds(spark, sf_dir):
    """Frequent-items sketch (approx_top_k) with its claim verified
    in-result, approx_distinct_bounds-style: the sketch's top-5 terms
    are joined back to the exact counts and `sketch_exact` pins that
    the sketch count equals the exact count (guaranteed here because
    the vocabulary fits the sketch's tracked capacity — the regime
    where DataSketches frequent-items is exact). At 100 TB vocab ≫
    capacity: counts become (count, error-bound) pairs and this flag
    would assert the bound instead; the sketch stays one mergeable
    partial per partition vs the exact path's full token shuffle."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        F.explode(F.split(F.lower("text"), r"\s+")).alias("tok")
    ).filter(F.col("tok") != "")
    sk = toks.agg(F.expr("approx_top_k(tok, 5)").alias("t")).select(
        F.explode("t").alias("e")
    ).select(F.col("e.item").alias("tok"), F.col("e.count").alias("sketch_n"))
    exact = toks.groupBy("tok").agg(F.count("*").alias("n"))
    return (
        exact.join(F.broadcast(sk), "tok")
        .select("tok", "n", (F.col("sketch_n") == F.col("n")).alias("sketch_exact"))
    )


@query(
    "recursive_hierarchy_rollup",
    """
    WITH RECURSIVE walk(custkey, acctbal, anc, depth) AS (
      SELECT c_custkey, c_acctbal, c_custkey, 0 FROM customer
      UNION ALL
      SELECT custkey, acctbal, anc // 10, depth + 1
      FROM walk WHERE anc >= 10
    )
    SELECT anc AS root, depth, count(*) AS n,
           CAST(SUM(CAST(acctbal AS DECIMAL(18,2))) AS DOUBLE)
             AS total_balance
    FROM walk WHERE anc < 10
    GROUP BY 1, 2
    """,
)
def recursive_hierarchy_rollup(spark, sf_dir):
    """Native recursive CTE (§2.5 modern-SQL surface, Spark 4):
    hierarchical rollup over a synthetic decimal-digit forest
    (parent(k) = k div 10) — each customer walks to its single-digit
    root, then (root, depth) levels aggregate counts and balances.
    The recursion is ACYCLIC and depth-bounded by key width (≤7
    levels), which is exactly the regime Spark's UNION ALL-only
    recursion supports: each iteration is one self-join step and the
    fixpoint is reached when no row has anc >= 10. Cyclic closures
    (dedup_components) deliberately stay on the iterative
    pointer-jumping operator — UNION ALL recursion cannot terminate
    on cycles; the two entries document the boundary."""
    c = load_table(spark, sf_dir, "customer")
    view = f"cust_{uuid.uuid4().hex[:8]}"
    c.createOrReplaceTempView(view)
    return spark.sql(
        f"""
        WITH RECURSIVE walk(custkey, acctbal, anc, depth) AS (
          SELECT c_custkey, c_acctbal, c_custkey, 0 FROM {view}
          UNION ALL
          SELECT custkey, acctbal, anc div 10, depth + 1
          FROM walk WHERE anc >= 10
        )
        SELECT anc AS root, depth, count(*) AS n,
               CAST(SUM(CAST(acctbal AS DECIMAL(18,2))) AS DOUBLE)
                 AS total_balance
        FROM walk WHERE anc < 10
        GROUP BY 1, 2
        """
    )


@query(
    "sql_frontend_mix",
    """
    SELECT l.l_returnflag, l.l_linestatus,
           count(*)::BIGINT AS n_lines,
           count(DISTINCT o.o_custkey)::BIGINT AS n_customers,
           SUM(CAST(ROUND(l.l_quantity) AS BIGINT))::BIGINT AS sum_qty,
           SUM(CAST(ROUND(l.l_extendedprice * 100) AS BIGINT))::BIGINT
             AS sum_price_cents
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    WHERE o.o_orderdate < TIMESTAMP '1997-06-01 00:00:00'
    GROUP BY 1, 2
    """,
)
def sql_frontend_mix(spark, sf_dir):
    """The ANSI-SQL front end as a first-class entry point: tables
    registered as temp views, the query submitted as SQL text through
    ``spark.sql`` — same Catalyst plan, pruning, and broadcast
    behavior as the DataFrame API (they converge on one logical
    plan). All sums in exact BIGINT units so the text can be
    near-identical on both engines. A user of the reference's
    SQL-embedded style (etl/extraction/bigquery.py:19-46) can run SQL
    strings directly against this engine."""
    for t in ("lineitem", "orders"):
        load_table(spark, sf_dir, t).createOrReplaceTempView(f"sqlfe_{t}")
    return spark.sql(
        """
        SELECT l.l_returnflag, l.l_linestatus,
               count(*) AS n_lines,
               count(DISTINCT o.o_custkey) AS n_customers,
               SUM(CAST(ROUND(l.l_quantity) AS BIGINT)) AS sum_qty,
               SUM(CAST(ROUND(l.l_extendedprice * 100) AS BIGINT))
                 AS sum_price_cents
        FROM sqlfe_lineitem l JOIN sqlfe_orders o
          ON l.l_orderkey = o.o_orderkey
        WHERE o.o_orderdate < TIMESTAMP_NTZ '1997-06-01 00:00:00'
        GROUP BY 1, 2
        """
    )
