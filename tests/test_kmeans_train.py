"""Full k-means training (queries/kmeans_train.py): the inertia
trajectory must be strictly informative (first step >> trained),
monotone flags all true, and the final assignment consistent."""

from etl_mp_transactions_spark.queries.kmeans_train import KM_ITERS, KM_K
from etl_mp_transactions_spark.registry import queries


def test_trajectory_monotone_and_improving(spark, sf_dir):
    rows = queries()["kmeans_train_trajectory"](spark, sf_dir).collect()
    assert [r["step"] for r in rows] == list(range(1, KM_ITERS + 2))
    assert all(r["monotone"] for r in rows)
    inertias = [r["inertia"] for r in rows]
    assert inertias == sorted(inertias, reverse=True)
    # training must achieve a REAL reduction, not rounding noise
    assert inertias[-1] < inertias[0] * 0.8, inertias


def test_final_assignment_consistent(spark, sf_dir):
    traj = queries()["kmeans_train_trajectory"](spark, sf_dir).collect()
    rows = queries()["kmeans_train_assign"](spark, sf_dir).collect()
    assert len({r["cluster"] for r in rows}) <= KM_K
    assert all(0 <= r["cluster"] < KM_K for r in rows)
    assert all(r["dist2"] >= 0 for r in rows)
    # the trajectory's final row IS the trained assignment's inertia
    assert sum(r["dist2"] for r in rows) == traj[-1]["inertia"]
