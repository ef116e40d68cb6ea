"""Pins for queries/folds.py: the clamped fold against a plain
python loop, and runs-test counts against an independent pass."""

import duckdb


def _events(sf_dir):
    con = duckdb.connect()
    df = con.execute(
        f"""SELECT user_id, event_type,
                   CAST(round(value * 100) AS BIGINT) AS cents, ts, event_id
            FROM '{sf_dir}/events.parquet'
            ORDER BY user_id, ts, event_id"""
    ).df()
    con.close()
    return df


def test_clamped_balance_matches_python_fold(spark, sf_dir):
    from etl_mp_transactions_spark.queries.folds import (
        clamped_running_balance,
        BALANCE_CAP,
    )

    rows = {r.user_id: r for r in clamped_running_balance(spark, sf_dir).collect()}
    df = _events(sf_dir)
    for uid, g in df.groupby("user_id"):
        bal = 0
        for _, e in g.iterrows():
            delta = e.cents if e.event_type == "purchase" else -e.cents
            bal = max(0, min(BALANCE_CAP, bal + delta))
        r = rows[uid]
        assert r.final_balance_cents == bal
        assert r.n_events == len(g)
        assert 0 <= r.final_balance_cents <= BALANCE_CAP


def test_runs_test_counts(spark, sf_dir):
    from etl_mp_transactions_spark.queries.folds import (
        runs_test_randomness,
    )

    r = runs_test_randomness(spark, sf_dir).first()
    con = duckdb.connect()
    daily = con.execute(
        f"""SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
                   sum(CAST(round(value * 100) AS BIGINT)) AS cents
            FROM '{sf_dir}/events.parquet'
            WHERE event_type = 'purchase' GROUP BY 1 ORDER BY day"""
    ).df()
    con.close()
    vals = daily["cents"].tolist()
    m = sorted(vals)[(len(vals) - 1) // 2]  # exact lower median
    seq = [1 if v > m else 0 for v in vals]
    n_runs = 1 + sum(1 for a, b in zip(seq, seq[1:]) if a != b)
    assert r.n_above == sum(seq)
    assert r.n_below == len(seq) - sum(seq)
    assert r.n_runs == n_runs
    assert abs(r.z_score) < 10  # sanity: finite, plausible magnitude
