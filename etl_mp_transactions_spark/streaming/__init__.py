from etl_mp_transactions_spark.streaming.filesource import (
    stream_files_available_now,
    stream_dedup_run,
    stream_windowed_counts_run,
)

__all__ = [
    "stream_files_available_now",
    "stream_dedup_run",
    "stream_windowed_counts_run",
]
