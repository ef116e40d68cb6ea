"""Composed corpus-curation pipeline query (SURVEY.md §2.9) with a
full DuckDB oracle: quality gate → exact dedup → MinHash near-dup
removal → token accounting in one DAG. The oracle rebuilds every stage
from the flat `documents` table with the same md5-portable hashing the
per-stage oracles use (queries/text.py, queries/dedup.py)."""

from __future__ import annotations

from etl_mp_transactions_spark.operators.curation import curate_corpus
from etl_mp_transactions_spark.queries.text import _STOPS
from etl_mp_transactions_spark.registry import query
from etl_mp_transactions_spark.sources.tables import load_table

_QUALITY_MIN = 0.45
_MH_HASH = "('0x' || substr(md5(tok || '#' || (h // 4)), 1 + 8 * (h % 4), 8))::BIGINT"

_ORACLE = f"""
WITH q AS (
  SELECT doc_id, text, lang, source,
         0.4 * (CASE WHEN len(string_split_regex(text, '\\s+')) = 0 THEN NULL
                     ELSE len(list_filter(string_split_regex(text, '\\s+'),
                                          t -> list_contains([{_STOPS}], t)))::DOUBLE
                          / len(string_split_regex(text, '\\s+')) END)
           + 0.3 * least(len(string_split_regex(text, '\\s+')) / 100.0, 1.0)
           + 0.3 * (1.0 - CASE WHEN length(text) = 0 THEN NULL
                               ELSE len(regexp_extract_all(text, '[^\\w\\s]'))::DOUBLE
                                    / length(text) END) AS quality
  FROM documents
),
qf AS (SELECT * FROM q WHERE quality >= {_QUALITY_MIN}),
ex AS (
  SELECT doc_id, text, lang, source, quality FROM (
    SELECT *, MIN(doc_id) OVER (PARTITION BY md5(text)) AS canon FROM qf
  ) WHERE doc_id = canon
),
toks AS (SELECT doc_id, list_distinct(string_split_regex(text, '\\s+')) AS tokens FROM ex),
tok AS (SELECT doc_id, unnest(tokens) AS tok FROM toks),
hashes AS (
  SELECT doc_id, h, MIN({_MH_HASH}) AS mh
  FROM tok, unnest(generate_series(0, 15)) AS t(h)
  GROUP BY doc_id, h
),
sigs AS (SELECT doc_id, list(mh ORDER BY h) AS sig FROM hashes GROUP BY doc_id),
bands AS (
  SELECT doc_id, sig, b,
         md5(array_to_string(sig[1 + 8*b : 8 + 8*b], ',')) AS band_key
  FROM sigs, unnest([0, 1]) AS t(b)
),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bands a
  JOIN bands b ON a.band_key = b.band_key AND a.doc_id < b.doc_id
),
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
    ≥ 0.9, keep-smallest-id) → BPE-ish token accounting."""
    return curate_corpus(
        load_table(spark, sf_dir, "documents"),
        quality_min=_QUALITY_MIN,
        neardup_threshold=0.9,
    )
