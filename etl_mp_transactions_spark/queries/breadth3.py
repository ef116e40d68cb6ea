"""Breadth batch 4: time-series gap-fill, interval-sweep concurrency,
bigram vocabulary, and deterministic dataset sharding.

These extend the §2.5 window/§2.9 curation families with the remaining
shapes a production analytics + training-data pipeline hits: calendar
densification (reporting over sparse facts), interval algebra (peak
concurrent load), n-gram vocabulary construction, and content-addressed
shard layout for training-data writes.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from etl_mp_transactions_spark.registry import query
from etl_mp_transactions_spark.sources.tables import load_table


@query(
    "timeseries_gapfill",
    """
    WITH daily AS (
      SELECT event_type, date_trunc('day', ts)::DATE AS d, count(*) AS n,
             CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
      FROM events GROUP BY 1, 2
    ),
    spans AS (
      SELECT event_type, min(d) AS lo,
             date_diff('day', min(d), max(d)) AS span
      FROM daily GROUP BY 1
    ),
    cal AS (
      SELECT s.event_type, (s.lo + to_days(u.i::INT))::DATE AS d
      FROM spans s, LATERAL (SELECT unnest(range(0, s.span + 1)) AS i) u
    )
    SELECT cal.event_type, strftime(cal.d, '%Y-%m-%d') AS d,
           coalesce(daily.n, 0) AS n,
           coalesce(daily.total_value, 0.0) AS total_value
    FROM cal LEFT JOIN daily USING (event_type, d)
    """,
)
def timeseries_gapfill(spark, sf_dir):
    """Calendar densification (gap-fill): daily event counts per type
    with missing days materialized as zero rows — the resample step
    every sparse-fact reporting query needs (a day with no 'error'
    events must still chart as 0, not vanish).

    Scale shape: one hash agg on (type, day); the calendar is built by
    exploding a per-type [min, max] span — a dim of |types| rows, so
    the explode is negligible and the fill join broadcasts. The fact
    table is never exploded; at 100 TB the cost stays the one agg."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.date_trunc("day", "ts").cast("date").alias("d")
    ).agg(
        F.count("*").alias("n"),
        F.sum(F.col("value").cast("decimal(18,2)"))
        .cast("double")
        .alias("total_value"),
    )
    spans = daily.groupBy("event_type").agg(F.min("d").alias("lo"), F.max("d").alias("hi"))
    cal = spans.select(
        "event_type",
        F.explode(F.sequence("lo", "hi", F.expr("interval 1 day"))).alias("d"),
    )
    return (
        cal.join(F.broadcast(daily), ["event_type", "d"], "left")
        # DATE rendered as ISO string: date-typed outputs compare
        # unstably across engines' pandas exports (repo convention)
        .select(
            "event_type",
            F.date_format("d", "yyyy-MM-dd").alias("d"),
            F.coalesce("n", F.lit(0)).alias("n"),
            F.coalesce("total_value", F.lit(0.0)).alias("total_value"),
        )
    )


@query(
    "interval_concurrency",
    """
    WITH pts AS (
      SELECT event_type, ts AS t, 1 AS delta FROM events
      UNION ALL
      SELECT event_type, ts + INTERVAL 5 MINUTE, -1 FROM events
    ),
    run AS (
      SELECT event_type,
             sum(delta) OVER (PARTITION BY event_type ORDER BY t, delta
                              ROWS BETWEEN UNBOUNDED PRECEDING
                              AND CURRENT ROW) AS c
      FROM pts
    )
    SELECT event_type, max(c)::BIGINT AS max_concurrent
    FROM run GROUP BY 1
    """,
)
def interval_concurrency(spark, sf_dir):
    """Interval algebra via the sweep-line trick: peak concurrent
    5-minute sessions per event type. Each interval [ts, ts+5m)
    becomes a +1 at start and a -1 at end; a running sum ordered by
    (time, delta) is the live count, and its max is peak concurrency —
    no interval self-join (the naive O(n²) formulation).

    Ordering note: `delta` as tiebreak closes intervals before opening
    ones at the same instant (half-open semantics), and within a tie
    group all deltas are equal so the running-sum *multiset* — hence
    the max — is deterministic. One exchange on event_type; the sort
    is per-partition."""
    ev = load_table(spark, sf_dir, "events")
    starts = ev.select(
        "event_type", F.col("ts").alias("t"), F.lit(1).alias("delta")
    )
    ends = ev.select(
        "event_type",
        (F.col("ts") + F.expr("interval 5 minutes")).alias("t"),
        F.lit(-1).alias("delta"),
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("t", "delta")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    run = starts.unionByName(ends).select(
        "event_type", F.sum("delta").over(w).alias("c")
    )
    return run.groupBy("event_type").agg(
        F.max("c").cast("long").alias("max_concurrent")
    )


@query(
    "text_top_bigrams",
    r"""
    WITH toks AS (
      SELECT doc_id,
             list_filter(string_split_regex(lower(text), '\s+'),
                         x -> x <> '') AS l
      FROM documents
    ),
    big AS (
      SELECT doc_id,
             unnest(list_zip(l[1:length(l)-1], l[2:length(l)])) AS z
      FROM toks WHERE length(l) >= 2
    )
    SELECT z[1] || ' ' || z[2] AS bigram, count(*) AS n
    FROM big GROUP BY 1
    ORDER BY n DESC, bigram LIMIT 20
    """,
)
def text_top_bigrams(spark, sf_dir):
    """Bigram vocabulary head: top-20 word bigrams across the corpus —
    the first step of phrase-vocab/tokenizer-merge construction.
    Bigrams are built inside the projection (slice + zip_with, no
    Python), exploded once, then one hash agg; top-k compiles to
    TakeOrderedAndProject, so only 20 rows per partition survive the
    final exchange."""
    docs = load_table(spark, sf_dir, "documents")
    toks = F.filter(
        F.split(F.lower(F.col("text")), r"\s+"), lambda x: x != F.lit("")
    )
    d = docs.select(toks.alias("l")).filter(F.size("l") >= 2)
    bigrams = F.zip_with(
        F.slice("l", 1, F.size("l") - 1),
        F.slice("l", 2, F.size("l") - 1),
        lambda a, b: F.concat_ws(" ", a, b),
    )
    return (
        d.select(F.explode(bigrams).alias("bigram"))
        .groupBy("bigram")
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), "bigram")
        .limit(20)
    )


@query(
    "dataset_shard_assign",
    """
    WITH sharded AS (
      SELECT ('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::BIGINT % 64
               AS shard,
             doc_id, n_chars
      FROM documents
    )
    SELECT shard, count(*) AS n_docs,
           sum(n_chars) AS total_chars,
           min(doc_id) AS min_doc, max(doc_id) AS max_doc
    FROM sharded GROUP BY shard
    """,
)
def dataset_shard_assign(spark, sf_dir):
    """Deterministic content-addressed sharding: shard =
    md5(doc_id) % 64 — the layout step that turns a curated corpus
    into stable, reproducible training shards (same inputs → same
    shard membership, independent of partitioning or cluster size,
    unlike hash(id) which is engine-specific).

    At write time this becomes `repartition(64, shard)` +
    `partitionBy(shard)` with maxRecordsPerFile bounding file sizes;
    md5 spreads uniformly so shards are balanced by construction.
    The query returns the per-shard manifest (counts, char totals,
    id range) — the sanity report a shard-writing job emits."""
    docs = load_table(spark, sf_dir, "documents")
    shard = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10)
        .cast("long")
        % 64
    )
    return (
        docs.select(shard.alias("shard"), "doc_id", "n_chars")
        .groupBy("shard")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
            F.min("doc_id").alias("min_doc"),
            F.max("doc_id").alias("max_doc"),
        )
    )


@query(
    "rolling_time_window",
    """
    SELECT o_custkey, o_orderkey, o_orderdate,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate
             RANGE BETWEEN INTERVAL 7 DAY PRECEDING AND CURRENT ROW
           ) AS DOUBLE) AS rolling_7d,
           COUNT(*) OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate
             RANGE BETWEEN INTERVAL 7 DAY PRECEDING AND CURRENT ROW
           ) AS n_7d
    FROM orders
    """,
)
def rolling_time_window(spark, sf_dir):
    """Time-RANGE window frame (§2.5, the frame kind w4's ROWS frames
    don't cover): per-customer 7-day rolling order total. The frame is
    value-based — all orders within 7 days, however many rows — so
    ties share a frame and the sum is deterministic. Spark expresses
    RANGE over time as rangeBetween on epoch seconds (same inclusive
    [t-7d, t] semantics as the SQL INTERVAL frame). One shuffle on
    custkey; the frame scan is a per-key sliding accumulator."""
    o = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        # ntz → ltz → epoch seconds (UTC session, instant-preserving);
        # ntz has no direct numeric cast
        .orderBy(F.col("o_orderdate").cast("timestamp").cast("long"))
        .rangeBetween(-7 * 86400, 0)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .over(w)
        .cast("double")
        .alias("rolling_7d"),
        F.count("*").over(w).alias("n_7d"),
    )


@query(
    "percentile_bounds",
    """
    SELECT o_orderstatus,
           quantile_cont(o_totalprice, 0.5) AS p50_exact,
           quantile_cont(o_totalprice, 0.95) AS p95_exact,
           TRUE AS approx_within_5pct
    FROM orders GROUP BY 1
    """,
)
def percentile_bounds(spark, sf_dir):
    """Exact interpolated percentiles (bit-identical to DuckDB's
    quantile_cont — both linear-interpolate between order statistics)
    next to the approx_percentile sketch, with the sketch's 5% error
    envelope asserted inside the result, approx_distinct_bounds-style.
    The exact form sorts per group (the verification cost); the sketch
    is the 100 TB path — mergeable KLL-style partials, no global
    sort."""
    o = load_table(spark, sf_dir, "orders")
    agg = o.groupBy("o_orderstatus").agg(
        F.expr("percentile(o_totalprice, 0.5)").alias("p50_exact"),
        F.expr("percentile(o_totalprice, 0.95)").alias("p95_exact"),
        F.expr("approx_percentile(o_totalprice, 0.5, 1000)").alias("p50_approx"),
        F.expr("approx_percentile(o_totalprice, 0.95, 1000)").alias("p95_approx"),
    )
    within = (
        F.abs(F.col("p50_approx") - F.col("p50_exact"))
        <= F.col("p50_exact") * F.lit(0.05)
    ) & (
        F.abs(F.col("p95_approx") - F.col("p95_exact"))
        <= F.col("p95_exact") * F.lit(0.05)
    )
    return agg.select(
        "o_orderstatus", "p50_exact", "p95_exact", within.alias("approx_within_5pct")
    )


@query(
    "value_histogram",
    """
    SELECT floor(o_totalprice / 50000)::BIGINT AS bucket,
           count(*) AS n,
           min(o_totalprice) AS lo,
           max(o_totalprice) AS hi
    FROM orders GROUP BY 1
    """,
)
def value_histogram(spark, sf_dir):
    """Equi-width value histogram: fixed-width binning as a map-only
    projection + one hash agg — the distribution profile every
    quality dashboard draws. Bucket math stays in the scan projection
    (floor of a double division by an exactly-representable width), so
    the whole query is scan → partial agg → 1 small exchange."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.select(
            F.floor(F.col("o_totalprice") / 50000).cast("long").alias("bucket"),
            "o_totalprice",
        )
        .groupBy("bucket")
        .agg(
            F.count("*").alias("n"),
            F.min("o_totalprice").alias("lo"),
            F.max("o_totalprice").alias("hi"),
        )
    )


@query(
    "epoch_shuffle_order",
    """
    WITH keyed AS (
      SELECT doc_id, md5('7-' || doc_id::VARCHAR) AS k,
             ('0x' || substr(md5('7-' || doc_id::VARCHAR), 1, 8))::BIGINT % 16
               AS shard
      FROM documents
    )
    SELECT doc_id, shard,
           row_number() OVER (PARTITION BY shard ORDER BY k, doc_id) AS pos
    FROM keyed
    """,
)
def epoch_shuffle_order(spark, sf_dir):
    """Deterministic epoch shuffle: training-data loaders need a
    reproducible pseudo-random order per epoch — md5(seed || doc_id)
    as the sort key gives the same permutation on any engine/cluster
    size (unlike rand(), whose stream is partitioning-dependent).

    The permutation is materialized as (shard, pos): shard from the
    key prefix, position by a PER-SHARD window — no global row_number
    (which would serialize through one partition). Readers consume
    shards in index order; changing the seed re-deals both shard
    membership and intra-shard order. One window shuffle on shard."""
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    k = F.md5(F.concat(F.lit("7-"), F.col("doc_id").cast("string")))
    keyed = docs.select(
        "doc_id",
        k.alias("k"),
        (F.conv(F.substring(k, 1, 8), 16, 10).cast("long") % 16).alias("shard"),
    )
    w = Window.partitionBy("shard").orderBy("k", "doc_id")
    return keyed.select(
        "doc_id", "shard", F.row_number().over(w).alias("pos")
    )
