from etl_mp_transactions_spark.sources.tables import TABLE_NAMES, load_table, register_views
from etl_mp_transactions_spark.sources.bronze import build_bronze

__all__ = ["TABLE_NAMES", "load_table", "register_views", "build_bronze"]
