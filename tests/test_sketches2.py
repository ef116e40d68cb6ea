"""Cross-checks for queries/sketches2.py and the diff drilldown:
HLL against a pure-Python register simulation (same hash, different
code path), DAU/MAU against a brute-force pandas window, drilldown
counts against the digest-phase expectations."""

import hashlib

import duckdb


def _h32(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)


def test_hll_registers_match_python_simulation(spark, sf_dir):
    from etl_mp_transactions_spark.queries.sketches2 import (
        hll_from_definition,
        HLL_M,
        _WBITS,
    )

    r = hll_from_definition(spark, sf_dir).first()
    con = duckdb.connect()
    users = [
        u[0]
        for u in con.execute(
            f"SELECT DISTINCT user_id FROM '{sf_dir}/events.parquet'"
        ).fetchall()
    ]
    con.close()
    regs = {}
    for u in users:
        h = _h32(str(u))
        j, w = h % HLL_M, h // HLL_M
        rho = _WBITS + 1 - w.bit_length()
        regs[j] = max(regs.get(j, 0), rho)
    s_num = sum(1 << (_WBITS + 1 - m) for m in regs.values()) + (
        HLL_M - len(regs)
    ) * (1 << (_WBITS + 1))
    assert r.s_num == s_num
    assert r.v_empty == HLL_M - len(regs)
    assert r.exact_distinct == len(users)
    # estimator sanity: within the published ~13% (1.04/sqrt(64))
    # error band times 3 (deterministic hashes — not a flake)
    assert abs(r.est_distinct - len(users)) < 0.4 * len(users)


def test_dau_mau_against_bruteforce(spark, sf_dir):
    from etl_mp_transactions_spark.queries.sketches2 import (
        dau_mau_rolling,
    )

    rows = {r.day: r for r in dau_mau_rolling(spark, sf_dir).collect()}
    con = duckdb.connect()
    ud = con.execute(
        f"""SELECT DISTINCT CAST(date_trunc('day', ts) AS DATE) AS day,
                   user_id
            FROM '{sf_dir}/events.parquet'"""
    ).df()
    con.close()
    days = sorted(ud["day"].unique())
    for d in days:
        dau = int((ud["day"] == d).sum())
        lo = d - __import__("pandas").Timedelta(days=29)
        mau = int(
            ud.loc[(ud["day"] >= lo) & (ud["day"] <= d), "user_id"]
            .nunique()
        )
        r = rows[str(d)[:10]]
        assert (r.dau, r.mau) == (dau, mau)
        assert r.stickiness_micro == dau * 1_000_000 // mau
    assert rows.keys() == {str(d)[:10] for d in days}


def test_drilldown_counts_match_recon_phase(spark, sf_dir):
    from etl_mp_transactions_spark.queries.reconcile import (
        table_diff_recon,
        table_diff_drilldown,
    )

    recon = table_diff_recon(spark, sf_dir).first()
    drill = {
        r.change: r for r in table_diff_drilldown(spark, sf_dir).collect()
    }
    assert drill["deleted"].n_rows == recon.rows_deleted
    assert drill["updated"].n_rows == recon.rows_updated
    for r in drill.values():
        assert r.min_key <= r.max_key
