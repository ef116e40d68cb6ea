"""Row-checksum expressions (SURVEY.md §2.6 C1).

The reference computes ``md5(f"{date}{concept}{amount}{remaining}")``
over *raw* (pre-normalization) strings with Python ``str()`` numerics
(``/root/reference/etl/transformations/transactions.py:21-22``). Python
``str(float)`` and Spark's double→string cast can disagree, so the
engine defines the checksum input format explicitly (SURVEY.md §7 risk
policy): money renders as fixed-point 2-dp via DECIMAL(18,2). The same
rule is encoded in the DuckDB oracle, so checksums are byte-equal across
engines.

All expressions are built-ins — md5/concat run inside whole-stage
codegen; the checksum of 100 TB of rows is a pure map stage.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def money_str(col: Column | str) -> Column:
    """Canonical 2-dp string rendering of a money value ('123.45')."""
    c = F.col(col) if isinstance(col, str) else col
    return c.cast("decimal(18,2)").cast("string")


def etl_checksum(
    date_raw: Column | str,
    concept: Column | str,
    amount: Column | str,
    remaining: Column | str,
) -> Column:
    """C1: md5 over (raw date ‖ concept ‖ amount ‖ remaining)."""
    cols = [
        (F.col(x) if isinstance(x, str) else x) for x in (date_raw, concept)
    ]
    return F.md5(F.concat(cols[0], cols[1], money_str(amount), money_str(remaining)))


def line_checksum(orderkey: Column | str, linenumber: Column | str) -> Column:
    """Source-assigned line id for the bronze fixture: md5('<ok>-<ln>')."""
    ok = F.col(orderkey) if isinstance(orderkey, str) else orderkey
    ln = F.col(linenumber) if isinstance(linenumber, str) else linenumber
    return F.md5(F.concat(ok.cast("string"), F.lit("-"), ln.cast("string")))
