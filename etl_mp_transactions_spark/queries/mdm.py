"""Master-data-management operators (SURVEY.md §2.9 extensions):
golden-record survivorship — the merge step every entity-resolution
pipeline needs after matching.

The repo's matching surface (phonetic_match_pairs, dedup_components,
cluster_representatives) produces CLUSTERS; survivorship builds the
one golden record per cluster with per-FIELD rules — the standard
MDM rulebook (public: survivorship / record consolidation in any MDM
text): take-highest for balances, most-frequent (mode) for
categorical fields with a deterministic tiebreak, and
source-of-truth provenance ids for audit. Clusters here are
deterministic 5-member groups (div(custkey, 5) — a stand-in for the
matcher's output, keeping the oracle self-contained); every rule is
exact: max/mode over integers and strings, all ties broken by key.

Scale: one groupBy per cluster with struct-max aggregations — the
argmax-by-struct trick (max of (value, key) pairs) avoids windows
entirely, so survivorship is a single shuffle on the cluster key.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_mp_transactions_spark.functions.exactmath import (
    LN2_NANO,
    exp2_nano_sql,
    ln_nano_sql,
)
from etl_mp_transactions_spark.registry import query
from etl_mp_transactions_spark.sources.tables import load_table


@query(
    "golden_record_survivorship",
    """
    WITH members AS (
      SELECT c_custkey // 5 AS cluster, c_custkey, c_name,
             CAST(round(c_acctbal * 100) AS BIGINT) AS cents,
             c_nationkey, c_mktsegment
      FROM customer
    ),
    seg_counts AS (
      SELECT cluster, c_mktsegment, count(*) AS n
      FROM members GROUP BY 1, 2
    ),
    seg_mode AS (
      SELECT cluster, c_mktsegment AS seg_golden
      FROM (SELECT cluster, c_mktsegment,
                   row_number() OVER (PARTITION BY cluster
                                      ORDER BY n DESC, c_mktsegment) AS rk
            FROM seg_counts)
      WHERE rk = 1
    ),
    golden AS (
      SELECT cluster,
             CAST(count(*) AS BIGINT) AS n_members,
             max(cents) AS balance_golden,
             arg_max(c_name, (cents + 100000) * 100000000 + c_custkey)
               AS name_golden,
             arg_max(c_custkey, (cents + 100000) * 100000000 + c_custkey)
               AS name_source,
             max(c_custkey) AS latest_source
      FROM members GROUP BY cluster
    )
    SELECT g.cluster, g.n_members, g.balance_golden,
           g.name_golden, g.name_source, g.latest_source, s.seg_golden
    FROM golden g JOIN seg_mode s USING (cluster)
    ORDER BY g.cluster
    """,
)
def golden_record_survivorship(spark, sf_dir):
    """Golden record per cluster with per-field survivorship rules
    (module docstring): balance = take-highest, name = value of the
    highest-balance member (struct-argmax, custkey tiebreak) with its
    provenance id, segment = mode with name tiebreak, latest_source =
    max key. One shuffle on the cluster key; the mode needs its own
    (cluster, value) count pass."""
    cust = load_table(spark, sf_dir, "customer")
    members = cust.select(
        F.expr("div(c_custkey, 5)").alias("cluster"),
        "c_custkey",
        "c_name",
        F.round(F.col("c_acctbal") * 100).cast("bigint").alias("cents"),
        "c_nationkey",
        "c_mktsegment",
    )
    seg_counts = members.groupBy("cluster", "c_mktsegment").agg(
        F.count("*").alias("n")
    )
    from pyspark.sql import Window

    wseg = Window.partitionBy("cluster").orderBy(
        F.desc("n"), "c_mktsegment"
    )
    seg_mode = (
        seg_counts.withColumn("rk", F.row_number().over(wseg))
        .filter(F.col("rk") == 1)
        .select("cluster", F.col("c_mktsegment").alias("seg_golden"))
    )
    # composite (cents, custkey) order key: DuckDB 1.0's arg_max has
    # no struct-ordered overload, so both engines rank by the same
    # collision-free BIGINT (cents bounded above -1e5; custkey < 1e8
    # at every tested SF — asserted by the test)
    golden = members.groupBy("cluster").agg(
        F.count("*").cast("bigint").alias("n_members"),
        F.max("cents").alias("balance_golden"),
        F.expr(
            "max_by(c_name, (cents + 100000) * 100000000 + c_custkey)"
        ).alias("name_golden"),
        F.expr(
            "max_by(c_custkey, (cents + 100000) * 100000000 + c_custkey)"
        ).alias("name_source"),
        F.max("c_custkey").alias("latest_source"),
    )
    return (
        golden.join(seg_mode, "cluster")
        .select(
            "cluster", "n_members", "balance_golden", "name_golden",
            "name_source", "latest_source", "seg_golden",
        )
        .orderBy("cluster")
    )


@query(
    "lm_perplexity_heldout",
    f"""
    WITH d AS (
      SELECT doc_id, string_split(text, ' ') AS ws,
             ('0x' || substr(md5(doc_id::VARCHAR || ':split-seed-1'), 1, 8))::BIGINT
               % 10 AS fold
      FROM documents
    ),
    bi AS (
      SELECT doc_id, fold, ws[t.i] AS w1, ws[t.i + 1] AS w2
      FROM d, unnest(generate_series(1, len(ws) - 1)) AS t(i)
      WHERE ws[t.i] <> '' AND ws[t.i + 1] <> ''
    ),
    cw2 AS (
      SELECT w1, w2, CAST(count(*) AS BIGINT) AS c2
      FROM bi WHERE fold < 8 GROUP BY 1, 2
    ),
    cw1 AS (SELECT w1, CAST(sum(c2) AS BIGINT) AS c1 FROM cw2 GROUP BY 1),
    voc AS (
      SELECT count(*) AS v FROM (
        SELECT w1 AS w FROM bi WHERE fold < 8
        UNION SELECT w2 AS w FROM bi WHERE fold < 8)
    ),
    test AS (SELECT doc_id, w1, w2 FROM bi WHERE fold >= 8),
    scored AS (
      SELECT t.doc_id,
             CAST(count(*) AS BIGINT) AS n_bigrams,
             CAST(sum({ln_nano_sql("coalesce(c.c2, 0) + 1", "duck")}
                      - {ln_nano_sql("coalesce(u.c1, 0) + voc.v", "duck")})
               AS BIGINT) AS ll_nano
      FROM test t
      LEFT JOIN cw2 c ON c.w1 = t.w1 AND c.w2 = t.w2
      LEFT JOIN cw1 u ON u.w1 = t.w1
      CROSS JOIN voc
      GROUP BY 1
    ),
    avgd AS (
      SELECT doc_id, n_bigrams, ll_nano,
             (-ll_nano + n_bigrams // 2) // n_bigrams AS nll_nano
      FROM scored
    )
    SELECT doc_id, n_bigrams, ll_nano,
           round({exp2_nano_sql("nll_nano", str(LN2_NANO), "duck")}
                 / 1e9, 6) AS perplexity
    FROM avgd
    ORDER BY doc_id
    """,
)
def lm_perplexity_heldout(spark, sf_dir):
    """Held-out bigram-LM perplexity — the evaluation metric that
    ties the repo's dataset_split (same md5 ':split-seed-1' hash;
    folds 0-7 train, 8-9 test) to its LM family (ngram_lm_quality's
    add-one smoothing): bigram counts fit on TRAIN only, each test
    doc scored as an exact nano-nat BIGINT log-likelihood (per-bigram
    exactmath integer-ln — order-free sums, no engine ln()), and
    perplexity from the EXP2 literal grid on the exact nano mean NLL
    (no engine exp() — VERDICT r11 task #2). Unseen contexts fall
    back to ln(1 / (0 + V)) exactly as add-one smoothing prescribes.

    Scale: bigram and context tables join on uniform token keys —
    vocabulary-sized tables are SHUFFLE-joined, never broadcast (the
    ngram_lm_quality / ADVICE-r5 lesson); only the scalar vocab size
    broadcasts."""
    docs = load_table(spark, sf_dir, "documents")
    d = docs.select(
        "doc_id",
        F.split("text", " ").alias("ws"),
        (
            F.conv(
                F.substring(
                    F.md5(F.concat(F.col("doc_id").cast("string"),
                                   F.lit(":split-seed-1"))), 1, 8),
                16, 10,
            ).cast("bigint")
            % 10
        ).alias("fold"),
    )
    bi = (
        d.select(
            "doc_id",
            "fold",
            F.explode(
                F.expr(
                    "transform(sequence(1, size(ws) - 1),"
                    " i -> struct(element_at(ws, i) AS w1,"
                    "             element_at(ws, i + 1) AS w2))"
                )
            ).alias("b"),
        )
        .select("doc_id", "fold", "b.w1", "b.w2")
        .filter((F.col("w1") != "") & (F.col("w2") != ""))
    )
    train = bi.filter(F.col("fold") < 8)
    cw2 = train.groupBy("w1", "w2").agg(
        F.count("*").cast("bigint").alias("c2")
    )
    cw1 = cw2.groupBy("w1").agg(F.sum("c2").cast("bigint").alias("c1"))
    voc = (
        train.select(F.col("w1").alias("w"))
        .union(train.select(F.col("w2").alias("w")))
        .distinct()
        .agg(F.count("*").alias("v"))
    )
    test = bi.filter(F.col("fold") >= 8).select("doc_id", "w1", "w2")
    # per-bigram log-prob via the exactmath integer-ln kernel, and
    # perplexity via the EXP2 grid on the exact nano mean NLL — no
    # engine evaluates ln()/exp() (VERDICT r11 task #2)
    term = F.expr(
        f"({ln_nano_sql('coalesce(c2, 0) + 1', 'spark')}"
        f" - {ln_nano_sql('coalesce(c1, 0) + v', 'spark')})"
    )
    scored = (
        test.join(cw2, ["w1", "w2"], "left")
        .join(cw1, "w1", "left")
        .crossJoin(F.broadcast(voc))
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("bigint").alias("n_bigrams"),
            F.sum(term).cast("bigint").alias("ll_nano"),
        )
    )
    ppl = F.round(
        F.expr(
            exp2_nano_sql("nll_nano", str(LN2_NANO), "spark")
        )
        / 1e9,
        6,
    )
    return (
        scored.withColumn(
            "nll_nano",
            F.expr("(-ll_nano + n_bigrams div 2) div n_bigrams"),
        )
        .select("doc_id", "n_bigrams", "ll_nano", ppl.alias("perplexity"))
        .orderBy("doc_id")
    )
