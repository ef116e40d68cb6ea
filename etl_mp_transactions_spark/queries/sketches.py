"""Sketch-algorithm operator family (SURVEY.md §2.9 extensions):
K-Minimum-Values distinct estimation, Count-Min-Sketch heavy-hitter
estimates, and Bloom-filter join pruning.

Why these, and why they oracle exactly: the repo already ships exact
`approx_distinct_bounds` / `approx_topk_bounds` pins around Spark's
built-in HLL++/frequent-items; this module implements the *sketches
themselves* from their published definitions, with deterministic md5
hashing, so every number in the output — sketch cell values, final
estimates, false-positive counts — is bit-reproducible and checked by
a DuckDB oracle computing the same closed form. Integer-only
arithmetic end to end (hash values, bucket sums, floor-divided
estimates): no float drift surface.

Scale story per operator:
- KMV is *algebraic*: partial state = the k smallest hashes of a
  partition, merge = union + re-take-k. The formulation here (global
  window over distinct hashes) is the oracle-friendly spelling; the
  per-group variant shipped keeps the window partitioned by the group
  key, so at 100 TB each group's top-k runs inside its own hash
  partition after one uniform shuffle (same shape as w2_topk).
- CMS is a d×w grid of SUMs — pure partial aggregation, one shuffle
  on (row, bucket), grid size is constant (d·w cells) regardless of
  input rows. The point-query join against the grid broadcasts the
  constant-size grid.
- Bloom pruning is the classic semi-join reduction: the bit-position
  set built from the dimension side is value-cardinality-sized (m
  bits max), broadcast to the fact side; the fact side never
  shuffles. False positives are *counted against the exact semi-join*
  in the same query, so the oracle pins both the filter and its
  error.

Reference tie-in: the reference's two-phase checksum dedup
(etl/filters/checksum_bigquery.py:16-74) is exactly a semi-join
reduction problem — Bloom pruning is the scale-path generalization of
its "fetch the set, test membership" pattern.

Hash parity recipe (established in training_ops.py): Spark
``conv(substring(md5(x),1,8),16,10)::bigint`` equals DuckDB
``('0x'||substr(md5(x),1,8))::BIGINT`` — 32-bit uniform values.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from etl_mp_transactions_spark.registry import query
from etl_mp_transactions_spark.sources.tables import load_table

KMV_K = 32
CMS_DEPTH = 3
CMS_WIDTH = 64
BLOOM_BITS = 1024
BLOOM_HASHES = 3
HASH_SPACE = 1 << 32  # md5-derived 8-hex-char values are uniform in [0, 2^32)


def _h32(col, seed: str = ""):
    """32-bit deterministic hash, parity with the DuckDB oracle form."""
    s = F.concat(col.cast("string"), F.lit(seed)) if seed else col.cast("string")
    return F.conv(F.substring(F.md5(s), 1, 8), 16, 10).cast("bigint")


@query(
    "kmv_distinct_estimate",
    f"""
    WITH hashed AS (
      SELECT event_type,
             ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 8))::BIGINT AS h
      FROM events
      GROUP BY event_type, user_id
    ),
    ranked AS (
      SELECT event_type, h,
             row_number() OVER (PARTITION BY event_type ORDER BY h) AS rn
      FROM (SELECT DISTINCT event_type, h FROM hashed)
    ),
    kth AS (
      SELECT event_type,
             max(CASE WHEN rn = {KMV_K} THEN h END) AS kth_hash,
             count(*) AS n_hashes
      FROM ranked
      WHERE rn <= {KMV_K}
      GROUP BY event_type
    ),
    exact AS (
      SELECT event_type, count(DISTINCT user_id) AS exact_distinct
      FROM events GROUP BY event_type
    )
    SELECT k.event_type,
           k.kth_hash,
           CASE WHEN k.kth_hash IS NULL THEN k.n_hashes
                ELSE ({KMV_K} - 1) * {HASH_SPACE} // k.kth_hash
           END AS est_distinct,
           e.exact_distinct
    FROM kth k JOIN exact e ON k.event_type = e.event_type
    ORDER BY k.event_type
    """,
)
def kmv_distinct_estimate(spark, sf_dir):
    """K-Minimum-Values distinct-count estimate per event_type
    (Bar-Yossef et al. 2002): hash the keys uniformly into [0, 2^32),
    keep the k smallest distinct hashes; if the k-th smallest is h_k,
    the estimate is (k-1)·2^32/h_k (floor-divided — integer output).
    Groups with fewer than k distinct keys fall back to the exact
    hash count (the standard small-cardinality rule). The exact
    distinct count rides along so the artifact shows the error."""
    ev = load_table(spark, sf_dir, "events")
    hashed = (
        ev.groupBy("event_type", "user_id")
        .agg(F.lit(1).alias("_one"))
        .select("event_type", _h32(F.col("user_id")).alias("h"))
        .distinct()
    )
    w = Window.partitionBy("event_type").orderBy("h")
    ranked = hashed.withColumn("rn", F.row_number().over(w)).filter(
        F.col("rn") <= KMV_K
    )
    kth = ranked.groupBy("event_type").agg(
        F.max(F.when(F.col("rn") == KMV_K, F.col("h"))).alias("kth_hash"),
        F.count("*").alias("n_hashes"),
    )
    est = F.when(F.col("kth_hash").isNull(), F.col("n_hashes")).otherwise(
        F.expr(f"div(({KMV_K} - 1) * cast({HASH_SPACE} as bigint), kth_hash)")
    )
    exact = ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("exact_distinct")
    )
    return (
        kth.select("event_type", "kth_hash", est.alias("est_distinct"))
        .join(exact, "event_type")
        .orderBy("event_type")
        .select("event_type", "kth_hash", "est_distinct", "exact_distinct")
    )


@query(
    "countmin_heavy_hitters",
    f"""
    WITH cells AS (
      SELECT d.seed,
             ('0x' || substr(md5(CAST(e.user_id AS VARCHAR) || ':cms' || d.seed), 1, 8))::BIGINT
               % {CMS_WIDTH} AS bucket,
             count(*) AS cell_count
      FROM events e
      CROSS JOIN (SELECT * FROM (VALUES (0), (1), (2)) AS t(seed)) d
      GROUP BY 1, 2
    ),
    exact AS (
      SELECT user_id, count(*) AS exact_count
      FROM events GROUP BY user_id
      ORDER BY exact_count DESC, user_id
      LIMIT 10
    ),
    probes AS (
      SELECT x.user_id, x.exact_count, d.seed,
             ('0x' || substr(md5(CAST(x.user_id AS VARCHAR) || ':cms' || d.seed), 1, 8))::BIGINT
               % {CMS_WIDTH} AS bucket
      FROM exact x
      CROSS JOIN (SELECT * FROM (VALUES (0), (1), (2)) AS t(seed)) d
    )
    SELECT p.user_id, p.exact_count, min(c.cell_count) AS cms_estimate
    FROM probes p
    JOIN cells c ON c.seed = p.seed AND c.bucket = p.bucket
    GROUP BY p.user_id, p.exact_count
    ORDER BY p.exact_count DESC, p.user_id
    """,
)
def countmin_heavy_hitters(spark, sf_dir):
    """Count-Min Sketch (Cormode & Muthukrishnan 2005) point-query
    estimates for the 10 highest-frequency users: a d=3 × w=64 grid
    of bucket sums (one shuffle, constant-size result), probed by the
    exact top-10 — each estimate is the min over the d rows of the
    key's bucket sums, always ≥ the exact count. The probe join
    broadcasts the constant-size grid."""
    ev = load_table(spark, sf_dir, "events")
    seeds = spark.range(CMS_DEPTH).select(F.col("id").cast("int").alias("seed"))
    cells = (
        ev.crossJoin(F.broadcast(seeds))
        .select(
            "seed",
            (
                F.conv(
                    F.substring(
                        F.md5(
                            F.concat(
                                F.col("user_id").cast("string"),
                                F.lit(":cms"),
                                F.col("seed").cast("string"),
                            )
                        ),
                        1,
                        8,
                    ),
                    16,
                    10,
                ).cast("bigint")
                % CMS_WIDTH
            ).alias("bucket"),
        )
        .groupBy("seed", "bucket")
        .agg(F.count("*").alias("cell_count"))
    )
    exact = (
        ev.groupBy("user_id")
        .agg(F.count("*").alias("exact_count"))
        .orderBy(F.desc("exact_count"), F.asc("user_id"))
        .limit(10)
    )
    probes = exact.crossJoin(F.broadcast(seeds)).select(
        "user_id",
        "exact_count",
        "seed",
        (
            F.conv(
                F.substring(
                    F.md5(
                        F.concat(
                            F.col("user_id").cast("string"),
                            F.lit(":cms"),
                            F.col("seed").cast("string"),
                        )
                    ),
                    1,
                    8,
                ),
                16,
                10,
            ).cast("bigint")
            % CMS_WIDTH
        ).alias("bucket"),
    )
    return (
        probes.join(F.broadcast(cells), ["seed", "bucket"])
        .groupBy("user_id", "exact_count")
        .agg(F.min("cell_count").alias("cms_estimate"))
        .orderBy(F.desc("exact_count"), F.asc("user_id"))
        .select("user_id", "exact_count", "cms_estimate")
    )


@query(
    "bloom_filter_prune",
    f"""
    WITH dim AS (
      SELECT c_custkey FROM customer WHERE c_acctbal > 7500
    ),
    bits AS (
      SELECT DISTINCT
             ('0x' || substr(md5(CAST(c_custkey AS VARCHAR) || ':bloom' || s.seed), 1, 8))::BIGINT
               % {BLOOM_BITS} AS pos
      FROM dim
      CROSS JOIN (SELECT * FROM (VALUES (0), (1), (2)) AS t(seed)) s
    ),
    fact_keys AS (
      SELECT DISTINCT o_custkey FROM orders
    ),
    fact_pos AS (
      SELECT f.o_custkey,
             ('0x' || substr(md5(CAST(f.o_custkey AS VARCHAR) || ':bloom' || s.seed), 1, 8))::BIGINT
               % {BLOOM_BITS} AS pos
      FROM fact_keys f
      CROSS JOIN (SELECT * FROM (VALUES (0), (1), (2)) AS t(seed)) s
    ),
    candidates AS (
      SELECT fp.o_custkey
      FROM fact_pos fp JOIN bits b ON fp.pos = b.pos
      GROUP BY fp.o_custkey
      HAVING count(*) = {BLOOM_HASHES}
    )
    SELECT (SELECT count(*) FROM fact_keys) AS fact_distinct_keys,
           (SELECT count(*) FROM dim) AS dim_keys,
           (SELECT count(*) FROM bits) AS bits_set,
           (SELECT count(*) FROM candidates) AS bloom_pass,
           (SELECT count(*) FROM candidates c
             JOIN dim d ON c.o_custkey = d.c_custkey) AS true_members,
           (SELECT count(*) FROM candidates c
             WHERE NOT EXISTS (SELECT 1 FROM dim d WHERE d.c_custkey = c.o_custkey))
             AS false_positives
    """,
)
def bloom_filter_prune(spark, sf_dir):
    """Bloom-filter semi-join reduction (Bloom 1970): hash the
    qualifying dimension keys (rich customers) into an m=1024-bit
    filter with 3 hash functions; test each distinct fact key and
    keep those whose 3 positions are all set. The output is the audit
    row — bits set, keys passing, true members, false positives —
    with the exact semi-join computed alongside so the FP count is
    oracle-pinned. The bit-position set is ≤ m rows and broadcast;
    the fact side is pruned without shuffling. This is the scale
    path for the reference's checksum-set membership filter
    (etl/filters/checksum_bigquery.py:16-74)."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    seeds = spark.range(BLOOM_HASHES).select(
        F.col("id").cast("int").alias("seed")
    )
    dim = cust.filter(F.col("c_acctbal") > 7500).select("c_custkey")

    def pos(key_col):
        return (
            F.conv(
                F.substring(
                    F.md5(
                        F.concat(
                            key_col.cast("string"),
                            F.lit(":bloom"),
                            F.col("seed").cast("string"),
                        )
                    ),
                    1,
                    8,
                ),
                16,
                10,
            ).cast("bigint")
            % BLOOM_BITS
        )

    bits = (
        dim.crossJoin(F.broadcast(seeds))
        .select(pos(F.col("c_custkey")).alias("pos"))
        .distinct()
    )
    fact_keys = orders.select("o_custkey").distinct()
    fact_pos = fact_keys.crossJoin(F.broadcast(seeds)).select(
        "o_custkey", pos(F.col("o_custkey")).alias("pos")
    )
    candidates = (
        fact_pos.join(F.broadcast(bits), "pos")
        .groupBy("o_custkey")
        .agg(F.count("*").alias("nset"))
        .filter(F.col("nset") == BLOOM_HASHES)
        .select("o_custkey")
    )
    true_members = candidates.join(dim, candidates.o_custkey == dim.c_custkey, "semi")
    false_pos = candidates.join(dim, candidates.o_custkey == dim.c_custkey, "anti")
    return (
        fact_keys.agg(F.count("*").alias("fact_distinct_keys"))
        .crossJoin(dim.agg(F.count("*").alias("dim_keys")))
        .crossJoin(bits.agg(F.count("*").alias("bits_set")))
        .crossJoin(candidates.agg(F.count("*").alias("bloom_pass")))
        .crossJoin(true_members.agg(F.count("*").alias("true_members")))
        .crossJoin(false_pos.agg(F.count("*").alias("false_positives")))
    )
