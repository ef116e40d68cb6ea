"""Data-reconciliation operator family (SURVEY.md §2.9 extensions):
Merkle-style checksum table diff and largest-remainder stratified
sample allocation.

table_diff_recon is the anti-entropy pattern every replicated ETL
needs (and the scale path for the reference's "compare against the
already-loaded set" idea, etl/filters/checksum_bigquery.py:16-74):
instead of comparing tables row-by-row, both sides reduce to 256
bucket digests (order-free BIGINT sums of per-row hashes, bucketed
by key hash). Equal digests prove equal buckets without moving rows;
only differing buckets would be re-scanned at row granularity. At
100 TB the digest pass is one map-side-combined aggregation to a
constant-size result per side — the comparison itself is free.

The "remote" snapshot here is derived from orders by two
deterministic in-query mutations (delete every 97th key, bump price
one cent on every 89th) so the expected diff is provable; the
operator logic is snapshot-agnostic.

stratified_allocation is Hamilton's largest-remainder apportionment:
floor the proportional quotas, then hand the leftover units to the
largest remainders (ties by stratum name). Pure integer arithmetic —
quota comparisons use n_i·N mod T, never a float — and the output
provably sums to exactly N (test-pinned).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from etl_mp_transactions_spark.registry import query
from etl_mp_transactions_spark.sources.tables import load_table

DIFF_BUCKETS = 256
SAMPLE_N = 1000


@query(
    "table_diff_recon",
    f"""
    WITH a AS (
      SELECT o_orderkey AS k, o_orderstatus AS st,
             CAST(round(o_totalprice * 100) AS BIGINT) AS cents
      FROM orders
    ),
    b AS (
      SELECT k, st,
             CASE WHEN k % 89 = 0 THEN cents + 1 ELSE cents END AS cents
      FROM a WHERE k % 97 <> 0
    ),
    da AS (
      SELECT ('0x' || substr(md5(CAST(k AS VARCHAR)), 1, 8))::BIGINT
               % {DIFF_BUCKETS} AS bucket,
             count(*) AS n_a,
             sum(('0x' || substr(md5(CAST(k AS VARCHAR) || '|' || st || '|'
                                      || CAST(cents AS VARCHAR)), 1, 12))::BIGINT)
               AS digest_a
      FROM a GROUP BY 1
    ),
    db AS (
      SELECT ('0x' || substr(md5(CAST(k AS VARCHAR)), 1, 8))::BIGINT
               % {DIFF_BUCKETS} AS bucket,
             count(*) AS n_b,
             sum(('0x' || substr(md5(CAST(k AS VARCHAR) || '|' || st || '|'
                                      || CAST(cents AS VARCHAR)), 1, 12))::BIGINT)
               AS digest_b
      FROM b GROUP BY 1
    )
    SELECT (SELECT count(*) FROM da) AS buckets_a,
           (SELECT count(*) FROM da JOIN db USING (bucket)
             WHERE da.n_a = db.n_b AND da.digest_a = db.digest_b)
             AS buckets_equal,
           (SELECT count(*) FROM da JOIN db USING (bucket)
             WHERE da.n_a <> db.n_b OR da.digest_a <> db.digest_b)
             AS buckets_diff,
           (SELECT count(*) FROM a WHERE k % 97 = 0) AS rows_deleted,
           (SELECT count(*) FROM b WHERE k % 89 = 0) AS rows_updated
    """,
)
def table_diff_recon(spark, sf_dir):
    """Merkle-style reconciliation of two order snapshots (module
    docstring): 256 bucket digests per side — (row count, order-free
    sum of 48-bit row hashes) — joined once; the expected
    delete/update row counts ride along for the audit."""
    orders = load_table(spark, sf_dir, "orders")
    a = orders.select(
        F.col("o_orderkey").alias("k"),
        F.col("o_orderstatus").alias("st"),
        F.round(F.col("o_totalprice") * 100, 0)
        .cast("bigint")
        .alias("cents"),
    )
    b = a.filter(F.col("k") % 97 != 0).select(
        "k",
        "st",
        F.when(F.col("k") % 89 == 0, F.col("cents") + 1)
        .otherwise(F.col("cents"))
        .alias("cents"),
    )

    def digests(df, cnt_name, dig_name):
        bucket = (
            F.conv(
                F.substring(F.md5(F.col("k").cast("string")), 1, 8), 16, 10
            ).cast("bigint")
            % DIFF_BUCKETS
        )
        row_hash = F.conv(
            F.substring(
                F.md5(
                    F.concat_ws(
                        "|",
                        F.col("k").cast("string"),
                        F.col("st"),
                        F.col("cents").cast("string"),
                    )
                ),
                1,
                12,
            ),
            16,
            10,
        ).cast("bigint")
        return df.groupBy(bucket.alias("bucket")).agg(
            F.count("*").alias(cnt_name),
            F.sum(row_hash).alias(dig_name),
        )

    da = digests(a, "n_a", "digest_a")
    db = digests(b, "n_b", "digest_b")
    joined = da.join(db, "bucket")
    eq = (F.col("n_a") == F.col("n_b")) & (
        F.col("digest_a") == F.col("digest_b")
    )
    return (
        da.agg(F.count("*").alias("buckets_a"))
        .crossJoin(
            joined.agg(
                F.sum(eq.cast("bigint")).alias("buckets_equal"),
                F.sum((~eq).cast("bigint")).alias("buckets_diff"),
            )
        )
        .crossJoin(
            a.filter(F.col("k") % 97 == 0).agg(
                F.count("*").alias("rows_deleted")
            )
        )
        .crossJoin(
            b.filter(F.col("k") % 89 == 0).agg(
                F.count("*").alias("rows_updated")
            )
        )
    )


@query(
    "stratified_allocation",
    f"""
    WITH strata AS (
      SELECT c_mktsegment AS stratum, count(*) AS n_i
      FROM customer GROUP BY 1
    ),
    tot AS (SELECT sum(n_i) AS t, count(*) AS n_strata FROM strata),
    quota AS (
      SELECT s.stratum, s.n_i, tot.t,
             (s.n_i * {SAMPLE_N}) // tot.t AS base_alloc,
             (s.n_i * {SAMPLE_N}) % tot.t AS remainder_num
      FROM strata s CROSS JOIN tot
    ),
    ranked AS (
      SELECT stratum, n_i, t, base_alloc, remainder_num,
             row_number() OVER (ORDER BY remainder_num DESC, stratum ASC)
               AS rem_rank,
             {SAMPLE_N} - sum(base_alloc) OVER () AS leftover
      FROM quota
    )
    SELECT stratum, n_i, base_alloc, remainder_num,
           CASE WHEN rem_rank <= leftover THEN 1 ELSE 0 END AS extra,
           base_alloc + CASE WHEN rem_rank <= leftover THEN 1 ELSE 0 END
             AS alloc
    FROM ranked
    ORDER BY stratum
    """,
)
def stratified_allocation(spark, sf_dir):
    """Hamilton largest-remainder allocation of a {SAMPLE_N}-row
    sample across market segments (module docstring): floor-divided
    base quotas plus one extra unit to the largest integer
    remainders; Σ alloc == N exactly."""
    cust = load_table(spark, sf_dir, "customer")
    strata = cust.groupBy(
        F.col("c_mktsegment").alias("stratum")
    ).agg(F.count("*").alias("n_i"))
    tot = strata.agg(F.sum("n_i").alias("t"))
    quota = strata.crossJoin(F.broadcast(tot)).select(
        "stratum",
        "n_i",
        "t",
        F.expr(f"div(n_i * {SAMPLE_N}, t)").alias("base_alloc"),
        (F.col("n_i") * SAMPLE_N % F.col("t")).alias("remainder_num"),
    )
    ranked = quota.select(
        "*",
        F.row_number()
        .over(Window.orderBy(F.desc("remainder_num"), F.asc("stratum")))
        .alias("rem_rank"),
        (SAMPLE_N - F.sum("base_alloc").over(Window.partitionBy())).alias(
            "leftover"
        ),
    )
    extra = F.when(
        F.col("rem_rank") <= F.col("leftover"), 1
    ).otherwise(0)
    return ranked.select(
        "stratum",
        "n_i",
        "base_alloc",
        "remainder_num",
        extra.alias("extra"),
        (F.col("base_alloc") + extra).alias("alloc"),
    ).orderBy("stratum")


@query(
    "table_diff_drilldown",
    f"""
    WITH a AS (
      SELECT o_orderkey AS k, o_orderstatus AS st,
             CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
             ('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 8))::BIGINT
               % {DIFF_BUCKETS} AS bucket
      FROM orders
    ),
    b AS (
      SELECT k, st,
             CASE WHEN k % 89 = 0 THEN cents + 1 ELSE cents END AS cents,
             bucket
      FROM a WHERE k % 97 <> 0
    ),
    da AS (
      SELECT bucket, count(*) AS n,
             sum(('0x' || substr(md5(CAST(k AS VARCHAR) || '|' || st || '|'
                                      || CAST(cents AS VARCHAR)), 1, 12))::BIGINT)
               AS dig
      FROM a GROUP BY bucket
    ),
    db AS (
      SELECT bucket, count(*) AS n,
             sum(('0x' || substr(md5(CAST(k AS VARCHAR) || '|' || st || '|'
                                      || CAST(cents AS VARCHAR)), 1, 12))::BIGINT)
               AS dig
      FROM b GROUP BY bucket
    ),
    diff_buckets AS (
      SELECT da.bucket FROM da JOIN db USING (bucket)
      WHERE da.n <> db.n OR da.dig <> db.dig
    ),
    a_in AS (SELECT a.* FROM a JOIN diff_buckets d ON a.bucket = d.bucket),
    b_in AS (SELECT b.* FROM b JOIN diff_buckets d ON b.bucket = d.bucket),
    rows_diff AS (
      SELECT coalesce(a_in.k, b_in.k) AS k,
             CASE WHEN b_in.k IS NULL THEN 'deleted'
                  WHEN a_in.cents <> b_in.cents OR a_in.st <> b_in.st
                    THEN 'updated'
             END AS change
      FROM a_in FULL OUTER JOIN b_in ON a_in.k = b_in.k
      WHERE b_in.k IS NULL
         OR a_in.cents <> b_in.cents OR a_in.st <> b_in.st
    )
    SELECT change, count(*) AS n_rows,
           min(k) AS min_key, max(k) AS max_key
    FROM rows_diff
    GROUP BY change
    ORDER BY change
    """,
)
def table_diff_drilldown(spark, sf_dir):
    """The row-granularity second phase of the Merkle reconciliation
    (table_diff_recon finds WHICH buckets differ; this re-scans ONLY
    those buckets at row level). A full-outer join keyed on the
    order key, restricted by a semi-join to the differing buckets,
    classifies each divergent row as deleted or updated; output is
    the per-class count with the affected key range. At 100 TB the
    re-scan touches diff_buckets/256 of the data — the entire point
    of the digest phase."""
    orders = load_table(spark, sf_dir, "orders")
    bucket = (
        F.conv(
            F.substring(F.md5(F.col("k").cast("string")), 1, 8), 16, 10
        ).cast("bigint")
        % DIFF_BUCKETS
    )
    a = orders.select(
        F.col("o_orderkey").alias("k"),
        F.col("o_orderstatus").alias("st"),
        F.round(F.col("o_totalprice") * 100, 0)
        .cast("bigint")
        .alias("cents"),
    ).withColumn("bucket", bucket)
    b = a.filter(F.col("k") % 97 != 0).select(
        "k",
        "st",
        F.when(F.col("k") % 89 == 0, F.col("cents") + 1)
        .otherwise(F.col("cents"))
        .alias("cents"),
        "bucket",
    )
    row_hash = F.conv(
        F.substring(
            F.md5(
                F.concat_ws(
                    "|",
                    F.col("k").cast("string"),
                    F.col("st"),
                    F.col("cents").cast("string"),
                )
            ),
            1,
            12,
        ),
        16,
        10,
    ).cast("bigint")

    def digest(df):
        return df.groupBy("bucket").agg(
            F.count("*").alias("n"), F.sum(row_hash).alias("dig")
        )

    da, db = digest(a), digest(b)
    diff_buckets = (
        da.alias("da")
        .join(db.alias("db"), "bucket")
        .filter(
            (F.col("da.n") != F.col("db.n"))
            | (F.col("da.dig") != F.col("db.dig"))
        )
        .select("bucket")
    )
    a_in = a.join(F.broadcast(diff_buckets), "bucket")
    b_in = b.join(F.broadcast(diff_buckets), "bucket")
    joined = a_in.alias("x").join(
        b_in.alias("y"), F.col("x.k") == F.col("y.k"), "full_outer"
    )
    change = F.when(F.col("y.k").isNull(), "deleted").when(
        (F.col("x.cents") != F.col("y.cents"))
        | (F.col("x.st") != F.col("y.st")),
        "updated",
    )
    rows_diff = joined.select(
        F.coalesce(F.col("x.k"), F.col("y.k")).alias("k"),
        change.alias("change"),
    ).filter(F.col("change").isNotNull())
    return (
        rows_diff.groupBy("change")
        .agg(
            F.count("*").alias("n_rows"),
            F.min("k").alias("min_key"),
            F.max("k").alias("max_key"),
        )
        .orderBy("change")
    )
