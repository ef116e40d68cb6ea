"""Quarantine routing (SURVEY.md §2.6 C3 policy made actionable).

The reference RAISES on an unparseable report_date (transactions.py:
88-89) — one bad row kills the file's whole batch. Engine policy:
parse failures become nulls (functions/dates.py), and this operator
routes rows into (valid, quarantined) streams so the good 99.99% land
while the bad rows are preserved — with a reason column — for
inspection/replay. At 100 TB, failing a job on row 73 billion is not
an error-handling strategy.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

def _rules():
    """Silver-row validity rules: (name, predicate-for-INVALID).
    Built lazily — Column construction needs an active session."""
    return [
        ("unparseable_created_at", F.col("created_at").isNull()),
        ("unparseable_transaction_date",
         F.try_to_date("transaction_date", "yyyy-MM-dd").isNull()),
        ("missing_checksum", F.col("checksum").isNull() | (F.col("checksum") == "")),
        ("nonpositive_amount_with_remaining",
         (F.col("amount") <= 0) & (F.col("reported_remaining") <= 0)),
    ]


def split_quarantine(silver: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(valid, quarantined): quarantined rows carry a `reasons` array
    naming every failed rule. One pass — the reason expression is
    computed once and both outputs filter on it (Catalyst shares the
    scan via the same source plan)."""
    reasons = F.filter(
        F.array(
            *[
                F.when(pred, F.lit(name)).otherwise(F.lit(None))
                for name, pred in _rules()
            ]
        ),
        lambda x: x.isNotNull(),
    )
    tagged = silver.withColumn("reasons", reasons)
    valid = tagged.filter(F.size("reasons") == 0).drop("reasons")
    quarantined = tagged.filter(F.size("reasons") > 0)
    return valid, quarantined


def write_with_quarantine(
    silver: DataFrame, valid_path: str, quarantine_path: str
) -> tuple[int, int]:
    """Route and persist both streams; returns (n_valid, n_quarantined)."""
    valid, quarantined = split_quarantine(silver)
    valid.persist()
    quarantined.persist()
    try:
        n_v, n_q = valid.count(), quarantined.count()
        from etl_mp_transactions_spark.sinks.writers import write_silver_partitioned

        write_silver_partitioned(valid, valid_path)
        quarantined.withColumn(
            "reasons", F.array_join("reasons", ";")
        ).write.mode("append").parquet(quarantine_path)
        return n_v, n_q
    finally:
        valid.unpersist()
        quarantined.unpersist()
