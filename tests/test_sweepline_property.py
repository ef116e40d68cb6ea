"""Property test: sweep-line peak concurrency == brute-force check at
every event boundary, over random interval sets (half-open [s, s+D)
semantics, tie-heavy inputs included)."""

from hypothesis import given, settings, strategies as st

from pyspark.sql import Window
from pyspark.sql import functions as F

DUR = 5  # interval length in abstract time units


def brute_force_peak(starts):
    """Max over all boundary instants t of |{s : s <= t < s + DUR}|.

    The maximum of a piecewise-constant count is attained at some
    start instant, so probing starts suffices."""
    return max(sum(1 for s in starts if s <= t < s + DUR) for t in set(starts))


def sweep_line_peak(spark, starts):
    df = spark.createDataFrame([(s,) for s in starts], "t long")
    pts = df.select("t", F.lit(1).alias("delta")).unionByName(
        df.select((F.col("t") + DUR).alias("t"), F.lit(-1).alias("delta"))
    )
    w = (
        Window.orderBy("t", "delta")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    run = pts.select(F.sum("delta").over(w).alias("c"))
    return run.agg(F.max("c")).collect()[0][0]


@settings(max_examples=12, deadline=None)
@given(
    st.lists(st.integers(min_value=0, max_value=20), min_size=1, max_size=12)
)
def test_sweep_line_matches_brute_force(spark, starts):
    assert sweep_line_peak(spark, starts) == brute_force_peak(starts)
