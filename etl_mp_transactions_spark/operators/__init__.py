from etl_mp_transactions_spark.operators.flatten import flatten_bronze
from etl_mp_transactions_spark.operators.silver import silver_transactions

__all__ = ["flatten_bronze", "silver_transactions"]
