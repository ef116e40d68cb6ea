"""Independent cross-checks for gram_matrix (embeddings2.py),
bpe_encode_tokens (tokenize.py), and als_user_half_step (recsys.py)."""

import numpy as np
import pytest

from etl_mp_transactions_spark.registry import queries


@pytest.fixture(scope="module")
def q():
    return queries()


def test_gram_matrix_vs_numpy(spark, sf_dir, q):
    pdf = q["gram_matrix"](spark, sf_dir).toPandas()
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").toPandas()
    m = np.stack(
        [
            np.round(np.asarray(v, dtype=np.float64) * 1e6).astype(np.int64)
            for v in emb["embedding"]
        ]
    )
    g = m.T @ m
    got = pdf.pivot(index="i", columns="j", values="g").to_numpy()
    assert got.shape == g.shape
    assert (got == g).all()
    # symmetry and PSD diagonal
    assert (g == g.T).all() and (np.diag(g) >= 0).all()


def test_bpe_encode_tokens_vs_python(spark, sf_dir, q):
    from etl_mp_transactions_spark.queries.tokenize import MERGES

    pdf = q["bpe_encode_tokens"](spark, sf_dir).toPandas()

    def encode(word):
        syms = list(word)
        for x, y in MERGES:
            out = []
            for s in syms:
                if out and out[-1] == x and s == y:
                    out[-1] = x + y
                else:
                    out.append(s)
            syms = out
        return syms

    for r in pdf.itertuples():
        expect = encode(r.word)
        assert r.tokens.split(" ") == expect, r.word
        assert r.n_tokens == len(expect)
    # concatenation is lossless: tokens rebuild the word
    for r in pdf.itertuples():
        assert "".join(r.tokens.split(" ")) == r.word


def test_bpe_table_word_merges_fully(spark, sf_dir, q):
    pdf = q["bpe_encode_tokens"](spark, sf_dir).toPandas()
    if "table" in set(pdf["word"]):
        row = pdf[pdf["word"] == "table"].iloc[0]
        assert row["tokens"] == "table" and row["n_tokens"] == 1


def test_als_half_step_vs_numpy_solve(spark, sf_dir, q):
    from etl_mp_transactions_spark.queries.recsys import ALS_LAMBDA_A

    pdf = q["als_user_half_step"](spark, sf_dir).toPandas()
    assert len(pdf) > 0
    for r in pdf.head(50).itertuples():
        a = np.array(
            [
                [r.a11 + ALS_LAMBDA_A, r.a12],
                [r.a12, r.a22 + ALS_LAMBDA_A],
            ],
            dtype=np.float64,
        )
        b = np.array([r.b1, r.b2], dtype=np.float64)
        u = np.linalg.solve(a, b)
        # nano-unit trunc of the exact Cramer ratio (r15 float purge)
        assert abs(r.u1_nano - u[0] * 1e9) < 2.0
        assert abs(r.u2_nano - u[1] * 1e9) < 2.0
    # gram invariants: a11, a22 >= 0 and Cauchy-Schwarz on a12
    assert (pdf["a11"] >= 0).all() and (pdf["a22"] >= 0).all()
    assert (
        pdf["a12"].astype(float) ** 2
        <= pdf["a11"].astype(float) * pdf["a22"].astype(float) + 1e-9
    ).all()


def test_kaplan_meier_vs_python(spark, sf_dir, q):
    """Manual KM estimator over (tenure, churn) re-derivation."""
    pdf = q["kaplan_meier_survival"](spark, sf_dir).toPandas()
    o = spark.read.parquet(f"{sf_dir}/orders.parquet").toPandas()
    import pandas as pd

    g = o.groupby("o_custkey")["o_orderdate"].agg(["min", "max"])
    mx = o["o_orderdate"].max()
    lifetime = (g["max"].dt.floor("D") - g["min"].dt.floor("D")).dt.days
    churned = (g["max"] <= mx - pd.Timedelta(days=90)).astype(int)
    df = pd.DataFrame({"lt": lifetime, "ch": churned})
    n_total = len(df)
    byday = (
        df.groupby("lt")
        .agg(cnt=("ch", "size"), d=("ch", "sum"))
        .sort_index()
    )
    surv, rows, at_risk = 1.0, [], n_total
    for t, r in byday.iterrows():
        if r["d"] > 0:
            surv = surv * (1.0 - float(r["d"]) / float(at_risk))
            rows.append((t, int(r["d"]), int(at_risk), surv))
        at_risk -= int(r["cnt"])
    got = [
        (int(r.lifetime_days), int(r.d), int(r.n), r.survival)
        for r in pdf.itertuples()
    ]
    assert len(got) == len(rows)
    for a, b in zip(got, rows):
        assert a[:3] == b[:3]
        assert a[3] == b[3]  # bit-identical fold contract
    # survival is monotone nonincreasing in (0, 1]
    sv = pdf["survival"].to_numpy()
    assert (sv[:-1] >= sv[1:]).all() and (sv > 0).all() and (sv <= 1).all()


def test_symspell_recovers_most_typos(spark, sf_dir, q):
    pdf = q["symspell_correction"](spark, sf_dir).toPandas()
    assert len(pdf) > 0
    # deletion-variant candidate generation must recover the original
    # unless a more frequent levenshtein<=1 neighbor wins the tiebreak
    assert pdf["recovered"].mean() >= 0.5
    for r in pdf.itertuples():
        assert _lev(r.typo, r.corrected) <= 1


def _lev(a, b):
    dp = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        prev, dp[0] = dp[0], i
        for j, cb in enumerate(b, 1):
            prev, dp[j] = dp[j], min(
                dp[j] + 1, dp[j - 1] + 1, prev + (ca != cb)
            )
    return dp[-1]


def test_poisson_bootstrap_weights_vs_python(spark, sf_dir, q):
    import hashlib

    from etl_mp_transactions_spark.queries.textcorrect import (
        _POIS_EDGES,
        N_BOOT,
    )

    pdf = q["poisson_bootstrap_ci"](spark, sf_dir).toPandas()
    r = pdf.iloc[0]
    assert r["boot_min"] <= r["ci_lo"] <= r["ci_hi"] <= r["boot_max"]
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").toPandas()
    ev = ev[ev["event_type"] == "purchase"]
    cents = (ev["value"] * 100).round().astype("int64")

    def weight(eid, b):
        h = int(
            hashlib.md5(f"{eid}:boot{b}".encode()).hexdigest()[:8], 16
        ) % 1_000_000
        for w, edge in enumerate(_POIS_EDGES):
            if h < edge:
                return w
        return 5

    totals = sorted(
        sum(
            weight(eid, b) * c
            for eid, c in zip(ev["event_id"], cents)
        )
        for b in range(N_BOOT)
    )
    assert r["boot_min"] == totals[0] and r["boot_max"] == totals[-1]
    assert r["ci_lo"] == totals[1 + (N_BOOT * 100) // 1000 - 1]
    assert r["ci_hi"] == totals[N_BOOT - (N_BOOT * 100) // 1000 - 1]
    assert r["observed_total"] == cents.sum()


def test_logistic_newton_vs_python(spark, sf_dir, q):
    """Exact re-derivation of the 3-step nano-integer Newton
    trajectory in python — grid-sigmoid contributions from the
    shared logistic.py 401-entry table (no transcendental in any of
    the three engines)."""
    import math

    from etl_mp_transactions_spark.functions.i128 import delta_py
    from etl_mp_transactions_spark.queries.logistic import sig_pn_py

    pdf = q["logistic_newton_steps"](spark, sf_dir).toPandas()
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet").toPandas()
    x = (cust["c_acctbal"] / 500.0).apply(math.floor).astype(int)
    y = (cust["c_mktsegment"] == "BUILDING").astype(int)
    b0 = b1 = 0
    last = None
    for _ in range(3):
        g0 = g1 = h00 = h01 = h11 = 0
        for xi, yi in zip(x, y):
            pn = sig_pn_py(b0 + b1 * xi)
            h = (pn * (10**9 - pn) + 500_000_000) // 10**9
            g0 += yi * 10**9 - pn
            g1 += (yi * 10**9 - pn) * xi
            h00 += h
            h01 += h * xi
            h11 += h * xi * xi
        den = h00 * h11 - h01 * h01  # exact python ints throughout
        b0 += delta_py(g0 * h11 - g1 * h01, den)
        b1 += delta_py(g1 * h00 - g0 * h01, den)
        last = (g0, g1, h00, h01, h11)
    r = pdf.iloc[0]
    # the Cramer solve is pure-int64 deterministic in all three
    # engines (i128.delta_py is the shared quantized contract)
    assert (int(r.b0_nano), int(r.b1_nano)) == (b0, b1)
    assert (
        int(r.last_g0), int(r.last_g1), int(r.last_h00),
        int(r.last_h01), int(r.last_h11),
    ) == last


def test_golden_record_survivorship_rules(spark, sf_dir, q):
    pdf = q["golden_record_survivorship"](spark, sf_dir).toPandas()
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet").toPandas()
    cust["cents"] = (cust["c_acctbal"] * 100).round().astype("int64")
    cust["cluster"] = cust["c_custkey"] // 5
    assert (cust["c_custkey"] < 100_000_000).all()  # order-key headroom
    for cl, g in cust.groupby("cluster"):
        row = pdf[pdf["cluster"] == cl].iloc[0]
        assert row["balance_golden"] == g["cents"].max()
        best = g.sort_values(["cents", "c_custkey"]).iloc[-1]
        assert row["name_golden"] == best["c_name"]
        assert row["name_source"] == best["c_custkey"]
        assert row["latest_source"] == g["c_custkey"].max()
        mode = (
            g.groupby("c_mktsegment").size()
            .reset_index(name="n")
            .sort_values(["n", "c_mktsegment"], ascending=[False, True])
            .iloc[0]["c_mktsegment"]
        )
        assert row["seg_golden"] == mode
