"""As-of (backward) join — an operator Spark's DataFrame API lacks
natively (pandas-on-Spark has merge_asof; plain SQL does not).

Implementation is the canonical scale shape: tag both sides, UNION on
the key, one sort-window per key with last(..., ignorenulls) carrying
the most recent right-side row forward, then keep left rows. ONE
shuffle on the join key, no range-explosion, no per-key collect —
survives arbitrarily large sides (contrast a naive
``left.join(right, key).filter(r.ts <= l.ts)`` + argmax, which is
quadratic per key on dup-heavy keys).

Right-side rows sort BEFORE left rows at equal timestamps (side tag is
the secondary sort key), giving the standard inclusive `r.ts <= l.ts`
semantics that DuckDB's ASOF JOIN implements — the oracle for
queries/asof_q.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join_backward(
    left: DataFrame,
    right: DataFrame,
    by: list[str],
    on: str,
    right_payload: list[str],
    prefix: str = "asof_",
) -> DataFrame:
    """For each left row, attach the right row with the largest
    ``on`` ≤ left's ``on`` within the same ``by`` group (left join:
    unmatched rows keep null payload).

    right_payload: right-side columns to carry (appear as
    f"{prefix}{col}"; the match timestamp as f"{prefix}{on}").
    """
    payload = F.struct(
        F.col(on).alias(on), *[F.col(c).alias(c) for c in right_payload]
    )
    payload_type = right.select(payload.alias("_p")).schema[0].dataType

    # a NULL-timestamp right row can never be "the latest at-or-before"
    # (ASOF semantics: NULL matches nothing) — but nulls sort FIRST in
    # the ascending window, so without this filter such a row's payload
    # would be carried to every left row that has no real match
    right = right.filter(F.col(on).isNotNull())

    l = left.select(
        *by,
        F.col(on).alias("_ts"),
        F.lit(1).alias("_side"),
        F.struct(*[F.col(c) for c in left.columns]).alias("_l"),
        F.lit(None).cast(payload_type).alias("_r"),
    )
    r = right.select(
        *by,
        F.col(on).alias("_ts"),
        F.lit(0).alias("_side"),
        F.lit(None).cast(l.schema["_l"].dataType).alias("_l"),
        payload.alias("_r"),
    )
    # _r as the final sort key makes ties deterministic: right rows
    # sharing a timestamp sort by their payload struct (field-order
    # lexicographic), so last() always carries the max-payload row
    # instead of whichever row the shuffle happened to order last
    w = (
        Window.partitionBy(*by)
        .orderBy("_ts", "_side", "_r")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = (
        l.unionByName(r)
        .withColumn("_m", F.last("_r", ignorenulls=True).over(w))
        .filter(F.col("_side") == 1)
    )
    out = matched.select(
        *[F.col(f"_l.{c}").alias(c) for c in left.columns],
        F.col(f"_m.{on}").alias(f"{prefix}{on}"),
        *[F.col(f"_m.{c}").alias(f"{prefix}{c}") for c in right_payload],
    )
    return out
