"""Date normalization expressions (SURVEY.md §2.6 C2/C3).

Reference semantics (``/root/reference/etl/transformations/transactions.py:57-89``):
a multi-format precedence chain — ``%Y-%m-%d`` then ``%d-%m-%Y`` for
'-'-separated, ``%Y/%m/%d`` then ``%d/%m/%Y`` for '/'-separated — and
**on failure the input string passes through unchanged**.

Spark-first form: a regex shape dispatch over ``try_to_date`` parses,
accepting 1-2-digit day/month like the reference's strptime (property-
tested against a literal Python port in tests/test_date_property.py).
The one documented divergence: years must be 4 digits and nonzero —
Python's %Y would also take 1-3-digit years, which are outside the
data contract and would make the separator shapes ambiguous.
Everything stays inside whole-stage codegen — no UDF, no Python.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# try-order IS the semantics: yyyy-MM-dd before dd-MM-yyyy, etc.
_FORMATS = ["yyyy-MM-dd", "dd-MM-yyyy", "yyyy/MM/dd", "dd/MM/yyyy"]


def normalize_date_multiformat(col: Column | str) -> Column:
    """C2: normalize a mixed-format date string to '%Y-%m-%d'.

    Unparseable inputs (including the reference's famous ``11/24/2024``
    US-format case, where month=24 fails ``dd/MM/yyyy``) pass through
    unchanged, matching ``transactions.py:79-81``.
    """
    c = F.col(col) if isinstance(col, str) else col
    # regex pre-dispatch: pick the single format whose shape matches,
    # then one try_to_date. Equivalent to the coalesce-over-all-formats
    # chain (the strict parser rejects shape mismatches anyway) but
    # avoids 3 exception-driven parse failures per row — parse
    # exceptions dominate the cost of the multi-format chain.
    # Day/month accept 1-2 digits ('5-6-2024'), as the reference's
    # strptime does; years are contractually 4-digit (the reference's
    # %Y would also take 1-3-digit years — out of the data contract,
    # and rejected here so the shapes stay unambiguous).
    # (?!0000): java.time parses proleptic year 0; the reference's
    # Python datetime raises on it (min year 1) — keep it passthrough
    parsed = (
        F.when(c.rlike(r"^(?!0000)\d{4}-\d{1,2}-\d{1,2}$"),
               F.date_format(F.try_to_date(c, "yyyy-M-d"), "yyyy-MM-dd"))
        .when(c.rlike(r"^\d{1,2}-\d{1,2}-(?!0000)\d{4}$"),
              F.date_format(F.try_to_date(c, "d-M-yyyy"), "yyyy-MM-dd"))
        .when(c.rlike(r"^(?!0000)\d{4}/\d{1,2}/\d{1,2}$"),
              F.date_format(F.try_to_date(c, "yyyy/M/d"), "yyyy-MM-dd"))
        .when(c.rlike(r"^\d{1,2}/\d{1,2}/(?!0000)\d{4}$"),
              F.date_format(F.try_to_date(c, "d/M/yyyy"), "yyyy-MM-dd"))
    )
    return F.coalesce(parsed, c)


def strict_midnight_timestamp(col: Column | str) -> Column:
    """C3: strict parse ('%Y-%m-%d' then '%d/%m/%Y') → "yyyy-MM-dd'T'00:00:00".

    The reference *raises* on failure (``transactions.py:88-89``); engine
    policy (SURVEY.md §2.6) is null-out instead of failing the job —
    callers quarantine nulls.
    """
    c = F.col(col) if isinstance(col, str) else col
    parsed = (
        F.when(c.rlike(r"^(?!0000)\d{4}-\d{1,2}-\d{1,2}$"), F.try_to_date(c, "yyyy-M-d"))
        .when(c.rlike(r"^\d{1,2}/\d{1,2}/(?!0000)\d{4}$"), F.try_to_date(c, "d/M/yyyy"))
    )
    return F.date_format(parsed, "yyyy-MM-dd'T'00:00:00")


def render_date_mixed_format(date_col: Column | str, variant_col: Column | str) -> Column:
    """Fixture helper: render a date into one of 5 wire formats by variant id.

    Variant 4 is the deliberately-hostile US ``MM/dd/yyyy`` form — for
    days > 12 it survives normalization unchanged, which is the
    pass-through path the reference exhibits.
    """
    d = F.col(date_col) if isinstance(date_col, str) else date_col
    v = F.col(variant_col) if isinstance(variant_col, str) else variant_col
    return (
        F.when(v == 0, F.date_format(d, "yyyy-MM-dd"))
        .when(v == 1, F.date_format(d, "dd-MM-yyyy"))
        .when(v == 2, F.date_format(d, "yyyy/MM/dd"))
        .when(v == 3, F.date_format(d, "dd/MM/yyyy"))
        .otherwise(F.date_format(d, "MM/dd/yyyy"))
    )


def ntz_micros(col: Column | str) -> Column:
    """Microseconds since epoch of a TIMESTAMP_NTZ column, computed
    wall-clock-only (`timestampdiff` between two NTZ values). A
    `cast("timestamp")` detour would re-interpret the wall time in the
    session timezone — non-linear across DST gaps — so results would
    depend on `spark.sql.session.timeZone` for externally-created
    sessions; this stays identical under any timezone."""
    c = F.col(col) if isinstance(col, str) else col
    return F.timestamp_diff(
        "MICROSECOND", F.lit("1970-01-01 00:00:00").cast("timestamp_ntz"), c
    )
