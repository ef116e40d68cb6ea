"""Independent cross-checks for queries/regression.py and
reconcile.py: OLS against numpy's least-squares solver (different
algorithm — QR, not Cramer), reconciliation against directly-counted
mutations, allocation against Hamilton's invariants."""

import duckdb
import numpy as np


def test_ols_matches_numpy_lstsq(spark, sf_dir):
    from etl_mp_transactions_spark.queries.regression import (
        ols_multifeature,
    )

    rows = {r.grp: r for r in ols_multifeature(spark, sf_dir).collect()}
    con = duckdb.connect()
    df = con.execute(
        f"""SELECT l_returnflag AS grp,
                   CAST(l_quantity AS BIGINT) AS x1,
                   CAST(round(l_tax * 10000) AS BIGINT) AS x2,
                   CAST(round(l_extendedprice * 100) AS BIGINT) AS y
            FROM '{sf_dir}/lineitem.parquet'"""
    ).df()
    con.close()
    for grp, g in df.groupby("grp"):
        X = np.column_stack(
            [np.ones(len(g)), g["x1"].to_numpy(), g["x2"].to_numpy()]
        ).astype(float)
        beta, *_ = np.linalg.lstsq(X, g["y"].to_numpy(dtype=float), rcond=None)
        r = rows[grp]
        assert r.n == len(g)
        # nano-unit ints since r15 (float purge); the reduced-product
        # Cramer's documented method error is ~1e-8 relative
        for got_nano, want in zip(
            (r.b_intercept_nano, r.b_quantity_nano, r.b_taxbp_nano),
            beta,
        ):
            got = got_nano / 1e9
            assert abs(got - want) < 1e-4 * max(1.0, abs(want))


def test_table_diff_counts_expected_mutations(spark, sf_dir):
    from etl_mp_transactions_spark.queries.reconcile import (
        table_diff_recon,
    )

    r = table_diff_recon(spark, sf_dir).first()
    con = duckdb.connect()
    dels, upds = con.execute(
        f"""SELECT count(*) FILTER (o_orderkey % 97 = 0),
                   count(*) FILTER (o_orderkey % 97 <> 0
                                    AND o_orderkey % 89 = 0)
            FROM '{sf_dir}/orders.parquet'"""
    ).fetchone()
    con.close()
    assert r.rows_deleted == dels
    assert r.rows_updated == upds
    assert r.buckets_equal + r.buckets_diff <= r.buckets_a
    # a mutated snapshot must surface at least one differing bucket
    assert (dels + upds == 0) or r.buckets_diff > 0


def test_stratified_allocation_sums_to_n(spark, sf_dir):
    from etl_mp_transactions_spark.queries.reconcile import (
        stratified_allocation,
        SAMPLE_N,
    )

    rows = stratified_allocation(spark, sf_dir).collect()
    assert sum(r.alloc for r in rows) == SAMPLE_N
    for r in rows:
        # quota error of largest-remainder is < 1 unit per stratum
        assert r.alloc in (r.base_alloc, r.base_alloc + 1)


def test_cusum_is_argmax_of_reference_series(spark, sf_dir):
    from etl_mp_transactions_spark.queries.regression import (
        cusum_changepoint,
    )

    r = cusum_changepoint(spark, sf_dir).first()
    con = duckdb.connect()
    df = con.execute(
        f"""SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
                   sum(CAST(round(value * 100) AS BIGINT)) AS cents
            FROM '{sf_dir}/events.parquet'
            WHERE event_type = 'purchase' GROUP BY 1 ORDER BY day"""
    ).df()
    con.close()
    x = df["cents"].to_numpy(dtype=object)
    n, s = len(x), int(df["cents"].sum())
    prefix = np.cumsum(x)
    dev = [abs(int(n) * int(p) - (t + 1) * s) for t, p in enumerate(prefix)]
    best = int(np.argmax(dev))
    assert r.cusum_abs_num == dev[best]
    assert r.change_idx == best + 1
    assert str(df["day"].iloc[best])[:10] == r.change_day
