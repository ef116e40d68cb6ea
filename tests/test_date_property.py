"""Property-based parity: the Spark date-normalization expression must
agree with a literal Python re-implementation of the reference
algorithm (transactions.py:57-89) on arbitrary inputs — not just the
curated corpus. Hypothesis drives formats, separators, garbage, and
calendar edge cases through both."""

from datetime import datetime

from hypothesis import given, settings, strategies as st

from etl_mp_transactions_spark.functions.dates import normalize_date_multiformat


import re

# day/month accept 1-2 digits, matching the reference's strptime
# ('5-6-2024' normalizes); years are contractually 4-digit and nonzero
# (Python datetime has no year 0; java.time does — both passthrough)
_SHAPES = [
    (re.compile(r"^(?!0000)\d{4}-\d{1,2}-\d{1,2}$"), "%Y-%m-%d"),
    (re.compile(r"^\d{1,2}-\d{1,2}-(?!0000)\d{4}$"), "%d-%m-%Y"),
    (re.compile(r"^(?!0000)\d{4}/\d{1,2}/\d{1,2}$"), "%Y/%m/%d"),
    (re.compile(r"^\d{1,2}/\d{1,2}/(?!0000)\d{4}$"), "%d/%m/%Y"),
]


def reference_normalize(date_str):
    """Port of the reference's fix_date try-order and
    return-input-on-failure, restricted to the strict fixed-width
    shapes the engine/oracle parse (see _SHAPES note)."""
    if date_str is None:
        return None
    for shape, fmt in _SHAPES:
        if not shape.match(date_str):
            continue
        try:
            return datetime.strptime(date_str, fmt).strftime("%Y-%m-%d")
        except ValueError:
            continue
    return date_str


dates = st.dates(min_value=datetime(1000, 1, 1).date(),
                 max_value=datetime(9999, 12, 31).date())
fmt_names = st.sampled_from(["%Y-%m-%d", "%d-%m-%Y", "%Y/%m/%d", "%d/%m/%Y",
                             "%m/%d/%Y", "%m-%d-%Y"])
garbage = st.text(
    alphabet="0123456789-/abz ", min_size=0, max_size=14)

unpadded = st.builds(
    lambda d, f: f.format(d=d.day, m=d.month, y=d.year),
    dates,
    st.sampled_from(
        ["{y:04d}-{m}-{d}", "{d}-{m}-{y:04d}", "{y:04d}/{m}/{d}", "{d}/{m}/{y:04d}",
         "{m}/{d}/{y:04d}"]
    ),
)

inputs = st.one_of(
    st.builds(lambda d, f: d.strftime(f), dates, fmt_names),
    unpadded,
    garbage,
)


@settings(max_examples=100, deadline=None)
@given(st.lists(inputs, min_size=1, max_size=40, unique=True))
def test_spark_matches_reference_python(spark, batch):
    df = spark.createDataFrame([(s,) for s in batch], "s string")
    got = {
        r["s"]: r["n"]
        for r in df.select("s", normalize_date_multiformat("s").alias("n")).collect()
    }
    for s in batch:
        assert got[s] == reference_normalize(s), f"input {s!r}"
