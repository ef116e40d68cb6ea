"""Composed corpus-curation pipeline query (SURVEY.md §2.9) with a
full DuckDB oracle: quality gate → exact dedup → MinHash near-dup
removal → token accounting in one DAG. Every stage's SQL is IMPORTED
from the per-stage oracle modules (queries/text.py quality blend,
queries/dedup.py minhash CTE chain) — the composed oracle cannot drift
from the per-stage ones."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_mp_transactions_spark.operators.curation import curate_corpus
from etl_mp_transactions_spark.queries.dedup import minhash_band_ctes
from etl_mp_transactions_spark.queries.text import QUALITY_FEATURES_SQL, QUALITY_SQL
from etl_mp_transactions_spark.registry import query
from etl_mp_transactions_spark.sources.tables import load_table

_QUALITY_MIN = 0.45

_ORACLE = f"""
WITH q AS (
  SELECT doc_id, text, lang, source, {QUALITY_SQL} AS quality
  FROM ({QUALITY_FEATURES_SQL}
        FROM (SELECT doc_id, text, lang, source FROM documents))
),
qf AS (SELECT * FROM q WHERE quality >= {_QUALITY_MIN}),
ex AS (
  SELECT doc_id, text, lang, source, quality FROM (
    SELECT *, MIN(doc_id) OVER (PARTITION BY md5(text)) AS canon FROM qf
  ) WHERE doc_id = canon
),
{minhash_band_ctes("ex")},
removed AS (
  SELECT DISTINCT c.doc_b
  FROM cand c
  JOIN sigs sa ON sa.doc_id = c.doc_a
  JOIN sigs sb ON sb.doc_id = c.doc_b
  WHERE len(list_filter(generate_series(1, 16), i -> sa.sig[i] = sb.sig[i])) / 16.0 >= 0.9
)
SELECT e.doc_id, e.lang, e.source,
       len(regexp_extract_all(e.text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')) AS bpe_tokens,
       e.quality
FROM ex e
LEFT JOIN removed r ON e.doc_id = r.doc_b
WHERE r.doc_b IS NULL
"""


@query("corpus_curation", _ORACLE)
def corpus_curation(spark, sf_dir):
    """Composed §2.9 pipeline: quality ≥ 0.45 → exact dedup (min
    doc_id per content hash) → MinHash near-dup removal (est-Jaccard
    ≥ 0.9, drop-every-doc_b) → BPE-ish token accounting."""
    return curate_corpus(
        load_table(spark, sf_dir, "documents"),
        quality_min=_QUALITY_MIN,
        neardup_threshold=0.9,
    )


@query(
    "corpus_datacard",
    """
    WITH base AS (
      SELECT source, lang, n_chars,
             len(list_filter(string_split_regex(text, '\\s+'),
                             x -> x <> '')) AS n_tok,
             md5(text) AS ch
      FROM documents
    ),
    dup AS (
      SELECT source, ch, CAST(count(*) AS BIGINT) AS copies
      FROM base GROUP BY source, ch
    ),
    dupagg AS (
      SELECT source,
             CAST(sum(CASE WHEN copies > 1 THEN copies ELSE 0 END)
                  AS BIGINT) AS n_dup_docs
      FROM dup GROUP BY source
    )
    SELECT b.source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(b.n_tok) AS BIGINT) AS total_tokens,
           CAST(sum(b.n_chars) AS BIGINT) AS total_chars,
           CAST(count(DISTINCT b.lang) AS BIGINT) AS n_langs,
           max(d.n_dup_docs) AS n_exact_dup_docs,
           max(d.n_dup_docs) * 1000000 // count(*) AS dup_ppm,
           CAST(sum(b.n_chars) AS BIGINT) * 1000000
             // CAST(sum(b.n_tok) AS BIGINT) AS chars_per_tok_micro
    FROM base b JOIN dupagg d ON d.source = b.source
    GROUP BY b.source
    ORDER BY b.source
    """,
)
def corpus_datacard(spark, sf_dir):
    """The dataset-card summary every corpus release ships (size,
    composition, duplication, token economics) as ONE exact query:
    per source — doc/token/char totals, language spread, exact-dup
    document count (docs whose content hash repeats within the
    source) with ppm rate, and mean chars-per-token in micro units.
    All integers; the dup stage is one uniform content-hash groupBy.
    Scale: two shuffles (hash groupBy + source rollup) regardless of
    corpus size — the report a 100 TB curation run prints last."""
    docs = load_table(spark, sf_dir, "documents")
    base = docs.select(
        "source",
        "lang",
        "n_chars",
        F.size(
            F.filter(
                F.split(F.col("text"), r"\s+"), lambda x: x != F.lit("")
            )
        ).alias("n_tok"),
        F.md5("text").alias("ch"),
    )
    dup = base.groupBy("source", "ch").agg(
        F.count("*").cast("bigint").alias("copies")
    )
    dupagg = dup.groupBy("source").agg(
        F.sum(
            F.when(F.col("copies") > 1, F.col("copies")).otherwise(0)
        )
        .cast("bigint")
        .alias("n_dup_docs")
    )
    return (
        base.join(dupagg, "source")
        .groupBy("source")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.sum("n_tok").cast("bigint").alias("total_tokens"),
            F.sum("n_chars").cast("bigint").alias("total_chars"),
            F.countDistinct("lang").cast("bigint").alias("n_langs"),
            F.max("n_dup_docs").alias("n_exact_dup_docs"),
        )
        .select(
            "source",
            "n_docs",
            "total_tokens",
            "total_chars",
            "n_langs",
            "n_exact_dup_docs",
            F.expr("div(n_exact_dup_docs * 1000000, n_docs)").alias(
                "dup_ppm"
            ),
            F.expr("div(total_chars * 1000000, total_tokens)").alias(
                "chars_per_tok_micro"
            ),
        )
        .orderBy("source")
    )
