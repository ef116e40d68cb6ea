"""stats_via_sums all-integer reformulation (r15 float purge):
cross-check the micro/ppm integer outputs against a numpy
re-derivation on the raw table, within the documented bigratio
method error (≤ ~2e-7 relative for the isqrt reduction + 1 trunc)."""

import numpy as np

from etl_mp_transactions_spark.registry import queries


def test_stats_via_sums_vs_numpy(spark, sf_dir):
    got = (
        queries()["stats_via_sums"](spark, sf_dir)
        .toPandas()
        .set_index("l_returnflag")
    )
    li = (
        spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        .select("l_returnflag", "l_quantity", "l_extendedprice")
        .toPandas()
    )
    assert len(got) > 0
    for flag, g in li.groupby("l_returnflag"):
        x = np.round(g.l_quantity * 100).astype(np.int64)
        y = np.round(g.l_extendedprice * 100).astype(np.int64)
        r = got.loc[flag]
        assert r["n"] == len(g)
        # mean: exact trunc of (Σx·1e4 / n)
        assert r["mean_qty_micro"] == (int(x.sum()) * 10**4) // len(g)
        # stddev/corr: within reduction error of the float truth
        std_micro = float(x.std(ddof=0)) * 1e4
        assert abs(r["stddev_pop_qty_micro"] - std_micro) <= max(
            3e-7 * std_micro, 2.0
        )
        corr_ppm = float(np.corrcoef(x, y)[0, 1]) * 1e6
        assert abs(r["corr_qty_price_ppm"] - corr_ppm) <= 3.0
