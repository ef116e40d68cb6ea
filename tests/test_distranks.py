"""Distributed ranking primitives (operators/distranks.py): density,
exactness vs the single-window reference, and the chained-call
partition-consistency regression.

The regression this file exists for: three chained global_row_number
calls over a customer-facts frame produced DUPLICATE ranks at sf0.1
(nd(rn) = 14702 of 14999) because Catalyst planned the rows branch
and the offset branch of one call as two separate range exchanges
with independently sampled boundaries. The localCheckpoint inside the
primitives pins a single shared partitioning; this test chains three
rankings and asserts every rank column is a dense permutation.
"""

from pyspark.sql import Window
from pyspark.sql import functions as F

from etl_mp_transactions_spark.operators.distranks import (
    global_order_stats,
    global_row_number,
    global_running_sum,
    ntile_from_rank,
)
from etl_mp_transactions_spark.sources.tables import load_table


def _facts(spark, sf_dir):
    return (
        load_table(spark, sf_dir, "orders")
        .groupBy(F.col("o_custkey").alias("custkey"))
        .agg(
            F.count("*").alias("frequency"),
            F.sum(
                F.round(F.col("o_totalprice") * 100, 0).cast("bigint")
            ).alias("cents"),
        )
    )


def test_chained_rankings_stay_dense(spark, sf_dir):
    facts = _facts(spark, sf_dir)
    r = global_row_number(facts, [F.asc("custkey")], out_col="a_rn")
    r = global_row_number(
        r, [F.desc("frequency"), F.asc("custkey")], out_col="b_rn"
    )
    r = global_row_number(
        r, [F.desc("cents"), F.asc("custkey")], out_col="c_rn"
    )
    row = r.agg(
        F.count("*").alias("n"),
        *[
            x
            for c in ("a_rn", "b_rn", "c_rn")
            for x in (
                F.max(c).alias(f"max_{c}"),
                F.countDistinct(c).alias(f"nd_{c}"),
                F.min(c).alias(f"min_{c}"),
            )
        ],
    ).collect()[0]
    n = row["n"]
    for c in ("a_rn", "b_rn", "c_rn"):
        assert row[f"min_{c}"] == 1
        assert row[f"max_{c}"] == n
        assert row[f"nd_{c}"] == n  # dense permutation, no corruption


def test_global_row_number_matches_single_window(spark, sf_dir):
    facts = _facts(spark, sf_dir)
    two_phase = global_row_number(
        facts, [F.desc("cents"), F.asc("custkey")], out_col="rn"
    ).select("custkey", "rn")
    reference = facts.select(
        "custkey",
        F.row_number()
        .over(Window.orderBy(F.desc("cents"), F.asc("custkey")))
        .alias("rn"),
    )
    assert two_phase.exceptAll(reference).count() == 0
    assert reference.exceptAll(two_phase).count() == 0


def test_running_sum_and_order_stats_match_window(spark, sf_dir):
    facts = _facts(spark, sf_dir)
    order = [F.asc("cents"), F.asc("custkey")]
    cum = global_running_sum(facts, "cents", order, out_col="cum")
    ref = facts.select(
        "custkey",
        F.sum("cents")
        .over(
            Window.orderBy(*order).rowsBetween(
                Window.unboundedPreceding, 0
            )
        )
        .alias("cum"),
    )
    assert cum.select("custkey", "cum").exceptAll(ref).count() == 0
    stats = global_order_stats(
        facts, order, {"k": F.lit(1), "cum": F.col("cents")}
    )
    assert (
        stats.select("custkey", "cum").exceptAll(ref).count() == 0
    )
    n = facts.count()
    assert stats.agg(F.max("k")).collect()[0][0] == n


def test_ntile_matches_ansi_window(spark, sf_dir):
    facts = _facts(spark, sf_dir)
    n = facts.agg(F.count("*").alias("n"))
    for k in (3, 4, 7):
        mine = (
            global_row_number(
                facts, [F.asc("cents"), F.asc("custkey")], out_col="rn"
            )
            .crossJoin(F.broadcast(n))
            .select(
                "custkey",
                ntile_from_rank(F.col("rn"), F.col("n"), k).alias("t"),
            )
        )
        ref = facts.select(
            "custkey",
            F.ntile(k)
            .over(Window.orderBy(F.asc("cents"), F.asc("custkey")))
            .alias("t"),
        )
        assert mine.exceptAll(ref).count() == 0, k


def test_table_materialization_matches_local(spark, sf_dir, tmp_path):
    # materialize="table" (reliable storage for real clusters; the
    # localCheckpoint substitute) must produce IDENTICAL ranks and
    # running sums, including under the chained-call regression shape
    spark.conf.set(
        "spark.etlmp.distranks.materializeDir", str(tmp_path)
    )
    try:
        facts = _facts(spark, sf_dir)
        order = [F.desc("cents"), F.asc("custkey")]
        loc = global_row_number(
            facts, order, out_col="rn", materialize="local"
        )
        tab = global_row_number(
            facts, order, out_col="rn", materialize="table"
        )
        assert loc.exceptAll(tab).count() == 0
        assert tab.exceptAll(loc).count() == 0
        # chained through the table path: ranks stay dense
        r = global_row_number(
            tab,
            [F.desc("frequency"), F.asc("custkey")],
            out_col="rn2",
            materialize="table",
        )
        row = r.agg(
            F.count("*").alias("n"),
            F.countDistinct("rn2").alias("nd"),
            F.max("rn2").alias("mx"),
        ).collect()[0]
        assert row["nd"] == row["n"] == row["mx"]
        cum_l = global_running_sum(
            facts, "cents", order, out_col="cum", materialize="local"
        ).select("custkey", "cum")
        cum_t = global_running_sum(
            facts, "cents", order, out_col="cum", materialize="table"
        ).select("custkey", "cum")
        assert cum_l.exceptAll(cum_t).count() == 0
        stats_t = global_order_stats(
            facts,
            order,
            {"k": F.lit(1), "cum": F.col("cents")},
            materialize="table",
        )
        assert (
            stats_t.select("custkey", "cum").exceptAll(cum_l).count()
            == 0
        )
    finally:
        spark.conf.unset("spark.etlmp.distranks.materializeDir")
