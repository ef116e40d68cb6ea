"""Independent python cross-checks for sif_embedding (embeddings2.py)
and holt_linear_forecast (folds.py)."""

import hashlib
from collections import Counter

import numpy as np
import pytest

from etl_mp_transactions_spark.registry import queries


@pytest.fixture(scope="module")
def q():
    return queries()


def test_sif_embedding_vs_python(spark, sf_dir, q):
    pdf = q["sif_embedding"](spark, sf_dir).toPandas()
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").toPandas()
    toks = {
        int(r.doc_id): [w for w in r.text.split(" ") if w != ""]
        for r in docs.itertuples()
    }
    cw = Counter(w for ws in toks.values() for w in ws)
    total = sum(cw.values())
    # r15 float purge: exact trunc nano weight t·1e9/(t + 1000·c) —
    # the bigratio scaled_div twin in python big-int arithmetic
    nw = {
        w: (total * 10**9) // (total + 1000 * c)
        for w, c in cw.items()
    }

    def sign(w, k):
        h = hashlib.md5(f"{w}|{k}".encode()).hexdigest()[0]
        return 1 if h in "01234567" else -1

    expect = {}
    for d, ws in toks.items():
        dc = Counter(ws)
        for k in range(8):
            expect[(d, k)] = sum(c * nw[w] * sign(w, k) for w, c in dc.items())
    got = {(int(r.doc_id), int(r.dim)): int(r.comp) for r in pdf.itertuples()}
    assert got == expect


def test_holt_linear_forecast_vs_python(spark, sf_dir, q):
    pdf = q["holt_linear_forecast"](spark, sf_dir).toPandas()
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").toPandas()
    ev["day"] = ev["ts"].dt.floor("D")
    ev["cents"] = (ev["value"] * 100).round().astype("int64")
    daily = (
        ev.groupby(["event_type", "day"])["cents"].sum().reset_index()
    )
    for r in pdf.itertuples():
        ys = (
            daily[daily["event_type"] == r.event_type]
            .sort_values("day")["cents"]
            .astype(float)
            .tolist()
        )
        assert len(ys) == r.n_days and len(ys) >= 2
        l, b = ys[0], ys[1] - ys[0]
        for x in ys[2:]:
            l_new = 0.3 * x + 0.7 * (l + b)
            b = 0.1 * ((0.3 * x + 0.7 * (l + b)) - l) + 0.9 * b
            l = l_new
        # bit-identical fold contract: exact equality, no tolerance
        assert r.level == l and r.trend == b
        assert r.forecast_1 == l + b and r.forecast_7 == l + 7 * b
    # every multi-day type is present
    counts = daily.groupby("event_type").size()
    assert set(pdf["event_type"]) == set(counts[counts >= 2].index)


def test_holt_two_point_series_returns_seed(spark, q, tmp_path):
    """A 2-day series must return the seed state untouched:
    level = y1, trend = y2 - y1 (empty fold)."""
    import pandas as pd

    df = pd.DataFrame(
        {
            "event_id": [1, 2],
            "ts": pd.to_datetime(["2024-01-01 01:00", "2024-01-02 01:00"]),
            "user_id": [1, 1],
            "event_type": ["solo", "solo"],
            "value": [10.0, 30.0],
            "props": ["{}", "{}"],
        }
    )
    p = str(tmp_path / "events.parquet")
    df.to_parquet(p)
    # stage a minimal sf dir with just events
    import shutil

    sfd = tmp_path / "sf"
    sfd.mkdir()
    shutil.copy(p, sfd / "events.parquet")
    out = q["holt_linear_forecast"](spark, str(sfd)).toPandas()
    assert len(out) == 1
    r = out.iloc[0]
    assert r["level"] == 1000.0 and r["trend"] == 2000.0
    assert r["forecast_1"] == 3000.0


def test_bitmask_journeys_decode_consistency(spark, sf_dir, q):
    pdf = q["bitmask_user_journeys"](spark, sf_dir).toPandas()
    for r in pdf.itertuples():
        # popcount of mask == n_types == len(decoded list)
        assert bin(int(r.mask)).count("1") == r.n_types
        assert len(r.types_csv.split(",")) == r.n_types
    assert pdf["mask"].is_unique


def test_global_sequence_ids_strided(spark, sf_dir, q):
    pdf = q["global_sequence_ids"](spark, sf_dir).toPandas()
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    n = li.count()
    import numpy as np

    assert (np.diff(pdf["seq"].to_numpy()) == 997).all()
    assert pdf["seq"].iloc[0] == 1
    assert len(pdf) == (n + 996) // 997


def test_erasure_cascade_invariants(spark, sf_dir, q):
    pdf = q["erasure_cascade_audit"](spark, sf_dir).toPandas()
    assert (pdf["orphans_after"] == 0).all()
    assert (pdf["rows_after"] == pdf["rows_before"] - pdf["rows_deleted"]).all()
    assert set(pdf["table_name"]) == {"customer", "orders", "lineitem"}


def test_impute_missing_values_semantics(spark, sf_dir, q):
    import numpy as np

    pdf = q["impute_missing_values"](spark, sf_dir).toPandas()
    # observed rows keep their own value; missing rows get the median
    miss = pdf[pdf["is_missing"] == 1]
    assert (miss["imputed_cents"] == miss["seg_median"]).all()
    # the median is the exact lower median of OBSERVED values per seg
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet").toPandas()
    cents = (cust["c_acctbal"] * 100).round().astype("int64")
    obs = pdf[pdf["is_missing"] == 0].set_index("c_custkey")
    cust = cust.set_index("c_custkey")
    for seg, g in pdf.groupby("seg"):
        vals = sorted(
            int(cents.loc[i])
            for i in g.loc[g["is_missing"] == 0, "c_custkey"]
        )
        assert g["seg_median"].iloc[0] == vals[(len(vals) - 1) // 2]
    assert 0.02 < pdf["is_missing"].mean() < 0.25


def test_winsorize_amounts_invariants(spark, sf_dir, q):
    pdf = q["winsorize_amounts"](spark, sf_dir).toPandas()
    assert (pdf["p01"] <= pdf["p99"]).all()
    # at most ~1% clamped each side (rank-ceil: <= n/100 + 1)
    assert (pdf["n_clamped_low"] <= pdf["n_rows"] * 0.011 + 1).all()
    assert (pdf["n_clamped_high"] <= pdf["n_rows"] * 0.011 + 1).all()
    assert (
        pdf["winsorized_sum_cents"]
        >= pdf["p01"] * pdf["n_rows"]
    ).all()
    assert (
        pdf["winsorized_sum_cents"]
        <= pdf["p99"] * pdf["n_rows"]
    ).all()


def test_hash_chain_audit_vs_python_and_tamper(spark, sf_dir, q):
    import hashlib

    pdf = q["hash_chain_audit"](spark, sf_dir).toPandas()
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").toPandas()
    ev["day"] = ev["ts"].dt.floor("D").dt.strftime("%Y-%m-%d")
    ev["cents"] = (ev["value"] * 100).round().astype("int64")
    for r in pdf.itertuples():
        g = ev[ev["day"] == r.day].sort_values("event_id")
        acc = "genesis"
        for e in g.itertuples():
            d = hashlib.md5(
                f"{e.event_id}|{e.event_type}|{e.cents}".encode()
            ).hexdigest()
            acc = hashlib.md5((acc + d).encode()).hexdigest()
        assert acc == r.chain_head and len(g) == r.n_records
    # tamper-evidence: flipping one record's cents changes the head
    r0 = pdf.iloc[0]
    g = ev[ev["day"] == r0["day"]].sort_values("event_id")
    acc = "genesis"
    for i, e in enumerate(g.itertuples()):
        cents = e.cents + (1 if i == len(g) // 2 else 0)
        d = hashlib.md5(
            f"{e.event_id}|{e.event_type}|{cents}".encode()
        ).hexdigest()
        acc = hashlib.md5((acc + d).encode()).hexdigest()
    assert acc != r0["chain_head"]


def test_wht_spectrum_parseval_and_numpy(spark, sf_dir, q):
    import numpy as np

    pdf = q["multimodal_wht_spectrum"](spark, sf_dir).toPandas()
    assert len(pdf) > 0
    assert (pdf["parseval_ok"] == 1).all()
    assert (pdf["spec_energy"] == 16 * pdf["time_energy"]).all()
    # H is orthogonal with H H^T = 16 I — verify the matrix itself
    n = 16
    h = np.array(
        [[1 if bin(i & j).count("1") % 2 == 0 else -1 for j in range(n)]
         for i in range(n)]
    )
    assert (h @ h.T == n * np.eye(n, dtype=int)).all()
