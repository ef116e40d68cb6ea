"""Bounded-interval (range) join — pairs left rows with right rows
whose timestamp falls in [left_ts + lower, left_ts + upper) within the
same key group.

Scale shape: the naive form is an equi-join on the key followed by the
range predicate — on dup-heavy keys that is quadratic per key and the
range filter runs post-explosion. The standard fix (used by every
engine with a real range-join rule, e.g. Databricks' range-join
optimization): bucketize time into width = (upper - lower) windows,
join on (key, bucket) with the LEFT side exploded to the 2 candidate
buckets its window can overlap, then apply the exact range predicate.
Pair candidates are bounded by bucket occupancy, not key cardinality,
and the join stays a hash equi-join Catalyst can plan normally.

All bucket arithmetic is integer microseconds with a true floor
division (Spark's `div` truncates toward zero, which mis-buckets
negative values — e.g. a lower bound reaching before the 1970 epoch),
so bucket edges are exact for any timestamp — no double rounding at
boundaries and no positive-range assumption.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from etl_mp_transactions_spark.functions.dates import ntz_micros


def range_join_interval(
    left: DataFrame,
    right: DataFrame,
    by: list[str],
    left_ts: str,
    right_ts: str,
    lower_us: int,
    upper_us: int,
) -> DataFrame:
    """Inner-join left×right on ``by`` where
    right_ts ∈ [left_ts + lower_us, left_ts + upper_us)  (microsecond
    bounds, lower inclusive / upper exclusive). Columns: all left
    columns + all right columns (caller aliases to avoid collisions).
    """
    if upper_us <= lower_us:
        raise ValueError("upper_us must be > lower_us")
    width = upper_us - lower_us

    def fdiv(e: str) -> str:
        # exact integer floor division: `div` truncates toward zero,
        # wrong for negative numerators (pre-epoch instants)
        return f"(({e}) div {width}) - (CASE WHEN ({e}) % {width} < 0 THEN 1 ELSE 0 END)"

    # wall-clock-only epoch micros (functions/dates.py::ntz_micros) —
    # a cast("timestamp") here would make bucket edges depend on the
    # session timezone across DST gaps
    l_us = ntz_micros(left_ts)
    r_us = ntz_micros(right_ts)

    l = left.withColumn("_lus", l_us).withColumn(
        "_bucket",
        F.explode(
            F.sequence(
                F.expr(fdiv(f"_lus + {lower_us}")),
                F.expr(fdiv(f"_lus + {upper_us}")),
            )
        ),
    )
    r = right.withColumn("_rus", r_us).withColumn(
        "_bucket", F.expr(fdiv("_rus"))
    )
    joined = l.join(r, [*by, "_bucket"]).filter(
        (F.col("_rus") >= F.col("_lus") + F.lit(lower_us))
        & (F.col("_rus") < F.col("_lus") + F.lit(upper_us))
    )
    return joined.drop("_lus", "_rus", "_bucket")
