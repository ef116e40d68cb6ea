"""Silver transactions: the flagship end-to-end transform.

Composes the reference's whole per-file pipeline (SURVEY.md §3.1/§7
step 2) as ONE declarative DataFrame plan: partition filter (F1) →
flatten (S1/J3) → aliasing projection (P1) → per-column defaults (P2) →
md5 etl_checksum (C1) → multi-format date normalization (C2) → strict
created_at render (C3) → per-transaction metadata map (A2 *intent* —
the reference's shared-dict bug is deliberately not reproduced, SURVEY
§7) → 16-column silver row (FIXTURES.md §2).

The whole thing is a shuffle-free map pipeline over the bronze scan —
scan → explode → project fuse into a single WholeStageCodegen span, so
on a 1000-executor cluster this runs at parquet-scan speed with zero
exchange. Reference files for parity: etl/transformations/
transactions.py:7-50, etl/extraction/bigquery.py:16-49.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from etl_mp_transactions_spark.functions.checksums import etl_checksum
from etl_mp_transactions_spark.functions.dates import (
    normalize_date_multiformat,
    strict_midnight_timestamp,
)
from etl_mp_transactions_spark.operators.flatten import flatten_bronze


def silver_transactions(
    bronze: DataFrame,
    partitions: dict | None = None,
    metadata_as_kv_string: bool = False,
) -> DataFrame:
    """bronze (nested) → silver (flat, typed) transactions.

    partitions: optional {year, month, day, company_id} predicate — the
    reference's per-file partition binding (F1); expressed as a filter
    so Catalyst turns it into partition pruning on a partitioned source.

    metadata_as_kv_string: render the metadata map as a sorted
    'k=v;k=v' string — canonical, order-insensitive form used by the
    DuckDB oracle comparison (maps hash unstably across engines).
    """
    df = bronze
    if partitions:
        for k, v in partitions.items():
            df = df.filter(F.col(k) == F.lit(v))

    flat = flatten_bronze(df)

    # P2 defaults: '' for strings, 0 for numerics (transactions.py:28-45)
    s = F.lit("")
    silver = flat.select(
        F.col("checksum"),
        etl_checksum("date", "concept", "amount", "remaining").alias("etl_checksum"),
        F.coalesce(F.col("concept"), s).alias("concept"),
        F.coalesce(F.col("amount"), F.lit(0.0)).alias("amount"),
        F.coalesce(F.col("header.account_number"), s).alias("account_number"),
        F.coalesce(F.col("header.bank"), s).alias("bank"),
        F.coalesce(F.col("header.account_alias"), s).alias("account_alias"),
        F.coalesce(F.col("header.currency"), s).alias("currency"),
        F.coalesce(F.col("header.timeframe"), s).alias("report_type"),
        F.col("header.extraction_timestamp").alias("extraction_date"),
        F.coalesce(F.col("userId"), s).alias("user_id"),
        # sourced from the record-level companyId field, as the
        # reference does (transactions.py:36) — NOT from the company_id
        # partition column, which is a path-derived value that may
        # lawfully differ from the payload on a misfiled object
        F.coalesce(F.col("companyId"), s).alias("company_id"),
        normalize_date_multiformat("date").alias("transaction_date"),
        F.coalesce(F.col("remaining"), F.lit(0.0)).alias("reported_remaining"),
        strict_midnight_timestamp(F.col("header.report_date")).alias("created_at"),
        F.col("metadata"),
    )

    if metadata_as_kv_string:
        entries = F.transform(
            F.map_entries("metadata"),
            lambda e: F.concat(e.key, F.lit("="), e.value),
        )
        silver = silver.withColumn(
            "metadata_kv", F.array_join(F.array_sort(entries), ";")
        ).drop("metadata")
    return silver
