"""Property-based parity: the Spark date-normalization expression must
agree with a literal Python re-implementation of the reference
algorithm (transactions.py:57-89) on arbitrary inputs — not just the
curated corpus. Hypothesis drives formats, separators, garbage, and
calendar edge cases through both."""

from datetime import datetime

from hypothesis import given, settings, strategies as st

from etl_mp_transactions_spark.functions.dates import normalize_date_multiformat


def reference_normalize(date_str):
    """Faithful port of the reference's fix_date (dispatch on
    separator, try-order, return-input-on-failure) with the strict
    4-digit-year behavior our engine and oracle share (Python's %Y
    accepts 1-3-digit years; java.time and DuckDB do not — SURVEY §7
    documents the divergence; the fixture only emits 4-digit years)."""
    if date_str is None:
        return None
    fmts = []
    if "-" in date_str:
        fmts = [("%Y-%m-%d", 4), ("%d-%m-%Y", 2)]
    elif "/" in date_str:
        parts = date_str.split("/")
        if len(parts[0]) == 4:
            fmts = [("%Y/%m/%d", 4)]
        elif len(parts) == 3 and len(parts[-1]) == 4:
            fmts = [("%d/%m/%Y", 2)]
    for fmt, first_width in fmts:
        token = date_str.split("-" if "-" in date_str else "/")[0]
        if len(token) != first_width:
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

inputs = st.one_of(
    st.builds(lambda d, f: d.strftime(f), dates, fmt_names),
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
