"""Pins for queries/profiling.py: the RI audit actually counts (an
injected broken relation yields exactly the orphans removed), and
the column profile agrees with a direct pandas profile."""

import duckdb
from pyspark.sql import functions as F

from etl_mp_transactions_spark.sources.tables import load_table


def test_ri_audit_all_green_on_driver_data(spark, sf_dir):
    from etl_mp_transactions_spark.queries.profiling import (
        referential_integrity_audit,
    )

    rows = referential_integrity_audit(spark, sf_dir).collect()
    assert len(rows) == 5
    for r in rows:
        assert r.orphan_rows == 0  # generator data is FK-consistent
        assert r.child_rows > 0


def test_ri_audit_counts_injected_orphans(spark, sf_dir):
    # break the orders->customer relation by dropping even customers
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer").filter(
        F.col("c_custkey") % 2 == 1
    )
    orphans = orders.join(
        cust, orders.o_custkey == cust.c_custkey, "anti"
    ).count()
    expected = orders.filter(F.col("o_custkey") % 2 == 0).count()
    assert orphans == expected > 0


def test_profile_matches_pandas(spark, sf_dir):
    from etl_mp_transactions_spark.queries.profiling import (
        table_stats_profile,
    )

    rows = {r.col_name: r for r in table_stats_profile(spark, sf_dir).collect()}
    con = duckdb.connect()
    df = con.execute(f"SELECT * FROM '{sf_dir}/orders.parquet'").df()
    con.close()
    r = rows["o_orderkey"]
    assert r.n_rows == len(df)
    assert r.n_nulls == int(df["o_orderkey"].isna().sum())
    assert r.n_distinct == df["o_orderkey"].nunique()
    assert r.min_val == str(int(df["o_orderkey"].min()))
    assert r.max_val == str(int(df["o_orderkey"].max()))
    rp = rows["o_totalprice"]
    cents = (df["o_totalprice"] * 100).round().astype("int64")
    assert rp.n_distinct == cents.nunique()
    assert rp.min_val == str(int(cents.min()))
