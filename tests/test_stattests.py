"""Independent cross-checks for queries/stattests.py: each statistic
is recomputed here with a *different* formulation (pandas/numpy dense
ranks, ECDF arrays, outer-product expected counts) over the same
parquet, so agreement is evidence of the math, not of the shared SQL
shape the DuckDB oracle already pins."""

import duckdb
import numpy as np
import pandas as pd


def _purchases(sf_dir):
    con = duckdb.connect()
    df = con.execute(
        f"""SELECT user_id % 2 AS variant,
                   CAST(round(value * 100) AS BIGINT) AS cents
            FROM '{sf_dir}/events.parquet'
            WHERE event_type = 'purchase'"""
    ).df()
    con.close()
    return df


def test_mann_whitney_matches_midrank_reference(spark, sf_dir):
    from etl_mp_transactions_spark.queries.stattests import mann_whitney_u

    r = mann_whitney_u(spark, sf_dir).first()
    df = _purchases(sf_dir)
    ranks = df["cents"].rank(method="average")
    r0 = float(ranks[df["variant"] == 0].sum())
    n0 = int((df["variant"] == 0).sum())
    n1 = int((df["variant"] == 1).sum())
    assert (r.n0, r.n1) == (n0, n1)
    assert r.r0_x2 == int(round(2 * r0))
    u0 = r0 - n0 * (n0 + 1) / 2
    assert r.u0_x2 == int(round(2 * u0))
    assert r.u0_x2 + r.u1_x2 == 2 * n0 * n1


def test_ks_matches_ecdf_reference(spark, sf_dir):
    from etl_mp_transactions_spark.queries.stattests import ks_two_sample

    r = ks_two_sample(spark, sf_dir).first()
    df = _purchases(sf_dir)
    x0 = np.sort(df.loc[df["variant"] == 0, "cents"].to_numpy())
    x1 = np.sort(df.loc[df["variant"] == 1, "cents"].to_numpy())
    support = np.unique(np.concatenate([x0, x1]))
    f0 = np.searchsorted(x0, support, side="right")
    f1 = np.searchsorted(x1, support, side="right")
    d_num = int(np.max(np.abs(f0 * len(x1) - f1 * len(x0))))
    assert r.d_num == d_num
    assert r.d_micro == d_num * 1_000_000 // (len(x0) * len(x1))


def test_chi_square_matches_outer_product_reference(spark, sf_dir):
    from etl_mp_transactions_spark.queries.stattests import (
        chi_square_independence,
    )

    r = chi_square_independence(spark, sf_dir).first()
    con = duckdb.connect()
    df = con.execute(
        f"SELECT o_orderpriority AS pri, o_orderstatus AS st "
        f"FROM '{sf_dir}/orders.parquet'"
    ).df()
    con.close()
    ct = pd.crosstab(df["pri"], df["st"]).to_numpy(dtype=float)
    exp = np.outer(ct.sum(axis=1), ct.sum(axis=0)) / ct.sum()
    chi2 = float((np.round((ct - exp) ** 2 / exp * 1e9)).sum())
    assert r.n_total == int(ct.sum())
    assert r.dof == (ct.shape[0] - 1) * (ct.shape[1] - 1)
    assert r.chi2_nano == int(chi2)


def test_acf_lag_zero_identity_and_bounds(spark, sf_dir):
    from etl_mp_transactions_spark.queries.stattests import (
        autocorrelation_acf,
    )

    rows = autocorrelation_acf(spark, sf_dir).collect()
    assert [r.lag for r in rows] == list(range(1, 8))
    for r in rows:
        assert -1.0 <= r.acf <= 1.0
        assert r.np == r.n - r.lag
