"""Pins for queries/warehouse.py: PIT coverage/leakage properties
and engine-neutral calendar arithmetic against python's datetime."""

import datetime

import duckdb


def test_pit_join_covers_every_shipment_after_first_version(spark, sf_dir):
    from etl_mp_transactions_spark.queries.warehouse import (
        pit_snapshot_join,
    )

    rows = pit_snapshot_join(spark, sf_dir).collect()
    assert rows
    con = duckdb.connect()
    # every shipment at/after its customer's first order date matches
    # EXACTLY ONE version (half-open intervals tile the timeline), so
    # the PIT total equals this direct count
    expected = con.execute(
        f"""WITH first_v AS (
              SELECT o_custkey, min(o_orderdate) AS f
              FROM '{sf_dir}/orders.parquet' GROUP BY o_custkey
            )
            SELECT count(*)
            FROM '{sf_dir}/lineitem.parquet' l
            JOIN '{sf_dir}/orders.parquet' o ON l.l_orderkey = o.o_orderkey
            JOIN first_v fv ON fv.o_custkey = o.o_custkey
            WHERE l.l_shipdate >= fv.f"""
    ).fetchone()[0]
    con.close()
    assert sum(r.n_lines for r in rows) == expected


def test_calendar_dow_matches_python_datetime(spark, sf_dir):
    from etl_mp_transactions_spark.queries.warehouse import (
        calendar_dim_build,
    )

    rows = calendar_dim_build(spark, sf_dir).collect()
    assert rows
    prev = None
    for r in rows:
        d = datetime.date.fromisoformat(r.day)
        assert r.dow_mon0 == d.weekday()  # python: 0 = Monday
        assert r.epoch_day == (d - datetime.date(1970, 1, 1)).days
        assert r.quarter == (d.month - 1) // 3 + 1
        nxt = d + datetime.timedelta(days=1)
        assert r.is_month_end == (1 if nxt.day == 1 else 0)
        if prev is not None:  # contiguous, no gaps
            assert r.epoch_day == prev + 1
        prev = r.epoch_day


def test_weighted_median_minimizes_weighted_distance(spark, sf_dir):
    import duckdb

    from etl_mp_transactions_spark.queries.analytics4 import (
        weighted_median,
    )

    rows = weighted_median(spark, sf_dir).collect()
    con = duckdb.connect()
    for r in rows:
        df = con.execute(
            f"""SELECT CAST(round(l_extendedprice * 100) AS BIGINT) AS c,
                       CAST(l_quantity AS BIGINT) AS w
                FROM '{sf_dir}/lineitem.parquet'
                WHERE l_returnflag = '{r.grp}' ORDER BY c"""
        ).df()
        cum = df["w"].cumsum()
        total = int(df["w"].sum())
        assert r.total_w == total
        # first value where cumulative weight reaches half
        idx = int((2 * cum >= total).idxmax())
        assert r.wmedian_cents == int(df["c"].iloc[idx])
    con.close()


def test_pareto_top80_is_minimal_cover(spark, sf_dir):
    import duckdb

    from etl_mp_transactions_spark.queries.analytics4 import (
        pareto_concentration,
    )

    rows = pareto_concentration(spark, sf_dir).collect()
    con = duckdb.connect()
    for r in rows:
        df = con.execute(
            f"""SELECT sum(CAST(round(o.o_totalprice * 100) AS BIGINT)) AS cents
                FROM '{sf_dir}/orders.parquet' o
                JOIN '{sf_dir}/customer.parquet' c
                  ON o.o_custkey = c.c_custkey
                WHERE c.c_mktsegment = '{r.segment}'
                GROUP BY o.o_custkey ORDER BY cents DESC"""
        ).df()
        assert r.n_customers == len(df)
        top = df["cents"].iloc[: r.n_top80].sum()
        # covers >= 80% AND one fewer would not
        assert 5 * int(top) >= 4 * r.total_cents
        if r.n_top80 > 1:
            assert (
                5 * int(df["cents"].iloc[: r.n_top80 - 1].sum())
                < 4 * r.total_cents
            )
    con.close()
