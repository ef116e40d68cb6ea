"""Pins for the mining family: the sweep skyline must equal the
textbook NOT-EXISTS dominance definition, and on handcrafted points
with known frontiers; association rules must satisfy the support/
confidence identities."""

from pyspark.sql import functions as F

from etl_mp_transactions_spark.queries.mining import (
    association_rules,
    skyline_frontier,
)


def test_skyline_equals_naive_not_exists(spark, sf_dir):
    got = {
        (r.p_partkey, r.price_cents, r.p_size)
        for r in skyline_frontier(spark, sf_dir).collect()
    }
    pts = (
        spark.read.parquet(f"{sf_dir}/part.parquet")
        .select(
            "p_partkey",
            F.round(F.col("p_retailprice") * 100, 0)
            .cast("bigint")
            .alias("price_cents"),
            "p_size",
        )
    )
    pts.createOrReplaceTempView("skyline_pts")
    naive = spark.sql(
        """
        SELECT p.p_partkey, p.price_cents, p.p_size
        FROM skyline_pts p
        WHERE NOT EXISTS (
          SELECT 1 FROM skyline_pts q
          WHERE q.price_cents <= p.price_cents AND q.p_size <= p.p_size
            AND (q.price_cents < p.price_cents OR q.p_size < p.p_size)
        )
        """
    )
    want = {
        (r.p_partkey, r.price_cents, r.p_size) for r in naive.collect()
    }
    assert got == want and got


def test_skyline_handcrafted(spark, tmp_path):
    # frontier of {(1,9),(2,5),(3,5),(5,2),(6,1),(6,3)} minimizing both
    # is {(1,9),(2,5),(5,2),(6,1)}; (3,5) dominated by (2,5); (6,3)
    # by (6,1) and (5,2). Duplicate of a frontier point stays.
    rows = [
        (1, 1.0, 9), (2, 2.0, 5), (3, 3.0, 5),
        (4, 5.0, 2), (5, 6.0, 1), (6, 6.0, 3), (7, 2.0, 5),
    ]
    d = str(tmp_path / "sf")
    spark.createDataFrame(
        [(k, f"n{k}", "b", "t", s, p) for k, p, s in rows],
        "p_partkey long, p_name string, p_brand string, p_type string,"
        " p_size int, p_retailprice double",
    ).write.parquet(f"{d}/part.parquet")
    got = {
        (r.p_partkey)
        for r in skyline_frontier(spark, d).collect()
    }
    assert got == {1, 2, 7, 4, 5}


def test_association_rule_identities(spark, sf_dir):
    rows = association_rules(spark, sf_dir).collect()
    assert 0 < len(rows) <= 20
    for r in rows:
        assert r.x < r.y
        assert r.n_xy >= 2
        assert r.n_xy <= min(r.n_x, r.n_y)
        assert r.confidence_ppm == (r.n_xy * 1_000_000) // r.n_x
        assert r.lift_ppm > 0
