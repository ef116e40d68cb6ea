"""Composed corpus-curation pipeline query (SURVEY.md §2.9) with a
full DuckDB oracle: quality gate → exact dedup → MinHash near-dup
removal → token accounting in one DAG. Every stage's SQL is IMPORTED
from the per-stage oracle modules (queries/text.py quality blend,
queries/dedup.py minhash CTE chain) — the composed oracle cannot drift
from the per-stage ones."""

from __future__ import annotations

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
