from etl_mp_transactions_spark.functions.dates import (
    normalize_date_multiformat,
    strict_midnight_timestamp,
    render_date_mixed_format,
)
from etl_mp_transactions_spark.functions.checksums import (
    money_str,
    etl_checksum,
    line_checksum,
)

__all__ = [
    "normalize_date_multiformat",
    "strict_midnight_timestamp",
    "render_date_mixed_format",
    "money_str",
    "etl_checksum",
    "line_checksum",
]
