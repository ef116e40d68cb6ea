"""Corpus curation: the composed training-data pipeline (SURVEY.md
§2.9) — quality gate → exact dedup → MinHash near-dup removal → token
accounting, as ONE declarative DAG.

This is the shape a 100 TB pretraining-corpus build actually runs:
every stage is a a map-only scan or a hash-shuffle on a uniform key
(content hash / signature key), and the near-dup stage inherits the
distinct-signature collapse from operators/textdedup.py, so duplicate-
heavy corpora never hit a quadratic doc-level join. Canonicalization
drops every doc that near-dup-pairs with ANY smaller-id doc (pairs are
emitted doc_a < doc_b; every doc_b occurrence is dropped, whether or
not its doc_a itself survives). On transitive chains (1,2)+(2,3) this
removes 2 AND 3 — more aggressive than connected-component
canonicalization, and exactly what the oracle mirrors.

Reference parity note: the reference has no corpus pipeline; this
composes the §2.9 north-star extensions mandated by BASELINE.json.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from etl_mp_transactions_spark.operators import textdedup, textstats


def curate_corpus(
    docs: DataFrame,
    quality_min: float = 0.45,
    neardup_threshold: float = 0.9,
) -> DataFrame:
    """documents → curated corpus manifest
    (doc_id, lang, source, bpe_tokens, quality).

    Stages: (1) heuristic quality score ≥ quality_min (map-only);
    (2) exact dedup — min doc_id per md5(text) wins (one hash shuffle);
    (3) MinHash+LSH near-dup removal at est-Jaccard ≥ neardup_threshold
    among survivors — drop every doc_b of a qualifying pair (see module
    docstring for the transitive-chain behavior);
    (4) BPE-ish token accounting for the kept docs (map-only).
    """
    q = textstats.quality_score(docs).filter(F.col("quality") >= quality_min)

    w = Window.partitionBy(F.md5("text"))
    ex = (
        q.withColumn("_canon", F.min("doc_id").over(w))
        .filter(F.col("doc_id") == F.col("_canon"))
        .drop("_canon")
    )
    # ex feeds both the near-dup arm (signature build) and the final
    # anti-join + token accounting; without a cut the scan->quality->
    # window chain re-executes per reference (18 parquet scans in the
    # r15 before-plan). One localCheckpoint per call bounds it to a
    # single pass — LAZY since r16 (materialized by the first job
    # that reaches it; saves the extra blocking materialization job,
    # measured A-B-A neutral-to-slightly-better at sf0.1). At 100 TB
    # this holds the exact-dedup survivors (with text) on executor
    # storage — the same single materialization a real curation run
    # writes between stages; on a real cluster prefer a reliable
    # checkpoint dir (executor loss kills localCheckpoint lineage).
    ex = ex.localCheckpoint(eager=False)

    removed = (
        textdedup.minhash_lsh_pairs(ex, threshold=neardup_threshold)
        .select(F.col("doc_b").alias("doc_id"))
        .distinct()
    )
    kept = ex.join(removed, "doc_id", "left_anti")

    return textstats.token_counts(kept).select(
        "doc_id", "lang", "source", "bpe_tokens", "quality"
    )
