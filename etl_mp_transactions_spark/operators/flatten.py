"""Bronze flatten: the S1/J3 lateral-unnest scan re-expressed in Spark.

Reference: a 3-level ``UNNEST(payload) / UNNEST(payload.lines) /
UNNEST(lines.metadata)`` with inner-join semantics
(``/root/reference/etl/extraction/bigquery.py:37-40``) — rows whose
``metadata`` array is empty vanish. That row loss is a bug class, not a
feature: the engine default keeps the line row and carries metadata as a
MAP column (built via ``map_from_entries`` on the *unexploded* array),
which both preserves rows and deletes a whole shuffle — the reference
has to re-group exploded metadata back into a dict per transaction
(A2, ``transactions.py:11-18,44``); we never un-nest it in the first
place. ``explode_metadata=True`` reproduces the reference's exact inner
UNNEST for parity testing.

Scale: flatten is a pure map stage — explode × explode inside one
whole-stage-codegen span, no shuffle, embarrassingly parallel over
parquet row groups. Nested-schema pruning (session.py) keeps the scan
reading only referenced leaf fields of ``payload``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def flatten_bronze(bronze: DataFrame, explode_metadata: bool = False) -> DataFrame:
    """payload[]/lines[] → one row per line; metadata as MAP (default).

    Output columns: userId, companyId, year, month, day, company_id,
    header.* (struct), line fields (checksum, date, concept, amount,
    remaining), metadata (map<string,string> or exploded key/value).
    """
    p = bronze.select(
        "userId",
        "companyId",
        "year",
        "month",
        "day",
        "company_id",
        F.explode("payload").alias("p"),
    )
    lines = p.select(
        "userId",
        "companyId",
        "year",
        "month",
        "day",
        "company_id",
        F.col("p.header").alias("header"),
        F.explode("p.lines").alias("l"),
    )
    flat = lines.select(
        "userId",
        "companyId",
        "year",
        "month",
        "day",
        "company_id",
        "header",
        F.col("l.checksum").alias("checksum"),
        F.col("l.date").alias("date"),
        F.col("l.concept").alias("concept"),
        F.col("l.amount").alias("amount"),
        F.col("l.remaining").alias("remaining"),
        F.col("l.metadata").alias("metadata_entries"),
    )
    if explode_metadata:
        # exact reference semantics: inner UNNEST — empty arrays drop rows
        return flat.select(
            "*", F.explode("metadata_entries").alias("m")
        ).select(
            flat.columns[:-1]
            + [
                F.col("m.key").alias("metadata_key"),
                F.col("m.value").alias("metadata_value"),
            ]
        )
    # engine default: keep the row; F5 guard (both key and value truthy)
    kept = F.filter(
        "metadata_entries",
        lambda e: e.key.isNotNull()
        & (e.key != "")
        & e.value.isNotNull()
        & (e.value != ""),
    )
    return flat.withColumn("metadata", F.map_from_entries(kept)).drop(
        "metadata_entries"
    )
