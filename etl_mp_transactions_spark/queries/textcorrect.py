"""Text correction + resampling statistics (SURVEY.md §2.9
extensions): symmetric-delete spell correction, and a deterministic
Poisson-bootstrap confidence interval.

symspell_correction is the SymSpell shape (Garbe's symmetric-delete
algorithm, public): instead of scanning the vocabulary per query
term (or generating O(|w|·26) insert/replace candidates), BOTH sides
generate only single-character DELETIONS — a typo and its correction
collide on a shared deletion variant, so candidate generation is a
plain equi-join on the variant key. Typos here are synthesized
deterministically from the vocabulary itself (drop the md5-chosen
character), so the operator is self-validating: the corrector should
recover the original word unless the typo collides with a closer or
more frequent vocab entry — ambiguity resolves by (frequency DESC,
word ASC), exact and deterministic. Verification is
levenshtein(typo, candidate) <= 1 — the repo's phonetics.py already
pinned cross-engine levenshtein parity.

poisson_bootstrap_ci is the distributed bootstrap (Poisson
bootstrap / bag-of-little-bootstraps lineage, public — Kleiner et
al. 2014): resample weights are Poisson(1) draws, approximated by a
deterministic md5-hash inverse-CDF lookup (weights 0..5; the
repo's A-Res precedent for hash-seeded pseudo-randomness, stated
honestly: production uses true randomness, the engine mechanics are
identical). B=32 resamples of total daily purchase revenue run as
ONE scan: each row contributes weight(row, b)·cents to resample b
via a bounded 32-way explode, all-integer sums; the interval bounds
are exact order statistics over the 32 resample totals — ranks
4 and 29 of 32 (10% trimmed each side, an ~80% central interval;
B would need to be >=40 before rank-based 2.5%/97.5% bounds are
even expressible).

Scale: the deletion join is |vocab|·avg_len rows on uniform variant
keys; the bootstrap is a constant 32× fan-out into a uniform-key
groupBy — both corpus-linear.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from etl_mp_transactions_spark.registry import query
from etl_mp_transactions_spark.sources.tables import load_table

N_BOOT = 32
# inverse CDF of Poisson(1) over 1e6 hash buckets: P(0)=.3679 P(1)=.3679
# P(2)=.1839 P(3)=.0613 P(4)=.0153 P(5)=tail
_POIS_EDGES = (367879, 735759, 919699, 980830, 996154)


@query(
    "symspell_correction",
    """
    WITH vocab AS (
      SELECT u.w AS word, CAST(count(*) AS BIGINT) AS freq
      FROM documents, unnest(string_split(text, ' ')) AS u(w)
      WHERE u.w <> '' GROUP BY 1
    ),
    typos AS (
      SELECT word AS original,
             substr(word, 1,
                    CAST(('0x' || substr(md5(word || ':typo'), 1, 8))::BIGINT
                         % length(word) AS INTEGER))
             || substr(word,
                       CAST(('0x' || substr(md5(word || ':typo'), 1, 8))::BIGINT
                            % length(word) AS INTEGER) + 2) AS typo
      FROM vocab WHERE length(word) >= 3
    ),
    tvar AS (
      SELECT DISTINCT original, typo, v.var
      FROM typos, unnest(list_prepend(typo,
             list_transform(generate_series(1, length(typo)),
               i -> substr(typo, 1, i - 1) || substr(typo, i + 1)))) AS v(var)
    ),
    vvar AS (
      SELECT DISTINCT word, freq, v.var
      FROM vocab, unnest(list_prepend(word,
             list_transform(generate_series(1, length(word)),
               i -> substr(word, 1, i - 1) || substr(word, i + 1)))) AS v(var)
    ),
    cand AS (
      SELECT DISTINCT t.original, t.typo, v.word AS candidate, v.freq
      FROM tvar t JOIN vvar v USING (var)
      WHERE levenshtein(t.typo, v.word) <= 1
    ),
    best AS (
      SELECT original, typo, candidate, freq,
             row_number() OVER (PARTITION BY typo
                                ORDER BY freq DESC, candidate) AS rk
      FROM cand
    )
    SELECT original, typo, candidate AS corrected, freq AS corrected_freq,
           CASE WHEN candidate = original THEN 1 ELSE 0 END AS recovered
    FROM best WHERE rk = 1
    ORDER BY original, typo
    """,
)
def symspell_correction(spark, sf_dir):
    """Symmetric-delete spell correction over the corpus vocabulary
    (module docstring): deterministic synthesized typos, deletion-
    variant equi-join candidate generation, levenshtein<=1 verify,
    (freq DESC, word) tiebreak."""
    docs = load_table(spark, sf_dir, "documents")
    vocab = (
        docs.select(F.explode(F.split("text", " ")).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count("*").cast("bigint").alias("freq"))
    )
    pos = (
        F.conv(
            F.substring(F.md5(F.concat(F.col("word"), F.lit(":typo"))), 1, 8),
            16, 10,
        ).cast("bigint")
        % F.length("word")
    ).cast("int")
    typos = (
        vocab.filter(F.length("word") >= 3)
        .select(F.col("word").alias("original"), pos.alias("p"))
        .select(
            "original",
            F.concat(
                F.expr("substr(original, 1, p)"),
                F.expr("substr(original, p + 2)"),
            ).alias("typo"),
        )
    )

    def deletions(col):
        return F.expr(
            f"array_prepend(transform(sequence(1, length({col})),"
            f" i -> concat(substr({col}, 1, i - 1), substr({col}, i + 1))),"
            f" {col})"
        )

    tvar = typos.select(
        "original", "typo", F.explode(deletions("typo")).alias("var")
    ).distinct()
    vvar = vocab.select(
        "word", "freq", F.explode(deletions("word")).alias("var")
    ).distinct()
    cand = (
        tvar.join(vvar, "var")
        .filter(F.levenshtein(F.col("typo"), F.col("word")) <= 1)
        .select(
            "original", "typo", F.col("word").alias("candidate"), "freq"
        )
        .distinct()
    )
    w = Window.partitionBy("typo").orderBy(F.desc("freq"), "candidate")
    return (
        cand.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select(
            "original",
            "typo",
            F.col("candidate").alias("corrected"),
            F.col("freq").alias("corrected_freq"),
            F.when(F.col("candidate") == F.col("original"), 1)
            .otherwise(0)
            .alias("recovered"),
        )
        .orderBy("original", "typo")
    )


def _pois_case_sql(expr: str) -> str:
    e = _POIS_EDGES
    return (
        f"CASE WHEN {expr} < {e[0]} THEN 0 WHEN {expr} < {e[1]} THEN 1 "
        f"WHEN {expr} < {e[2]} THEN 2 WHEN {expr} < {e[3]} THEN 3 "
        f"WHEN {expr} < {e[4]} THEN 4 ELSE 5 END"
    )


@query(
    "poisson_bootstrap_ci",
    f"""
    WITH ev AS (
      SELECT event_id, CAST(round(value * 100) AS BIGINT) AS cents
      FROM events WHERE event_type = 'purchase'
    ),
    weighted AS (
      SELECT b.b,
             sum({_pois_case_sql(
                 "('0x' || substr(md5(event_id::VARCHAR || ':boot' "
                 "|| b.b::VARCHAR), 1, 8))::BIGINT % 1000000")}
                 * cents) AS total
      FROM ev CROSS JOIN (SELECT unnest(generate_series(0, {N_BOOT - 1})) AS b) b
      GROUP BY 1
    ),
    ranked AS (
      SELECT total, row_number() OVER (ORDER BY total) AS rk FROM weighted
    )
    SELECT
      (SELECT CAST(sum(cents) AS BIGINT) FROM ev) AS observed_total,
      (SELECT CAST(min(total) AS BIGINT) FROM weighted) AS boot_min,
      (SELECT CAST(max(total) AS BIGINT) FROM weighted) AS boot_max,
      (SELECT CAST(total AS BIGINT) FROM ranked WHERE rk = 1 + ({N_BOOT} * 100) // 1000)
        AS ci_lo,
      (SELECT CAST(total AS BIGINT) FROM ranked WHERE rk = {N_BOOT} - ({N_BOOT} * 100) // 1000)
        AS ci_hi
    """,
)
def poisson_bootstrap_ci(spark, sf_dir):
    """Deterministic Poisson-bootstrap CI for total purchase revenue
    (module docstring): 32 hash-seeded Poisson(1)-weighted resamples
    in ONE scan (bounded 32-way fan-out), exact integer resample
    totals, percentile bounds by exact order statistics."""
    ev = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_type") == "purchase")
        .select(
            "event_id",
            F.round(F.col("value") * 100).cast("bigint").alias("cents"),
        )
    )
    b = spark.range(N_BOOT).select(F.col("id").cast("bigint").alias("b"))
    hash_expr = (
        "conv(substring(md5(concat(cast(event_id as string), ':boot',"
        " cast(b as string))), 1, 8), 16, 10) % 1000000"
    )
    weight = F.expr(_pois_case_sql(f"cast({hash_expr} as bigint)"))
    weighted = (
        ev.crossJoin(F.broadcast(b))
        .groupBy("b")
        .agg(F.sum(weight * F.col("cents")).alias("total"))
    )
    ranked = weighted.select(
        "total", F.row_number().over(Window.orderBy("total")).alias("rk")
    )
    lo_rk = 1 + (N_BOOT * 100) // 1000
    hi_rk = N_BOOT - (N_BOOT * 100) // 1000
    observed = ev.agg(F.sum("cents").cast("bigint").alias("observed_total"))
    stats = weighted.agg(
        F.min("total").cast("bigint").alias("boot_min"),
        F.max("total").cast("bigint").alias("boot_max"),
    )
    lo = ranked.filter(F.col("rk") == lo_rk).select(
        F.col("total").cast("bigint").alias("ci_lo")
    )
    hi = ranked.filter(F.col("rk") == hi_rk).select(
        F.col("total").cast("bigint").alias("ci_hi")
    )
    return (
        observed.crossJoin(F.broadcast(stats))
        .crossJoin(F.broadcast(lo))
        .crossJoin(F.broadcast(hi))
    )
