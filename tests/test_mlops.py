"""Invariant + independent cross-checks for queries/recsys.py and
queries/mlops.py (the in-engine classical-ML batch)."""

import hashlib

import numpy as np
import pandas as pd
import pytest

from etl_mp_transactions_spark.registry import queries

K_CLUSTERS = 8


@pytest.fixture(scope="module")
def q():
    return queries()


def test_item_cooccurrence_topk_invariants(spark, sf_dir, q):
    pdf = q["item_cooccurrence_topk"](spark, sf_dir).toPandas()
    if len(pdf):
        assert (pdf["cooc"] >= 2).all()
        assert (pdf["rk"] >= 1).all() and (pdf["rk"] <= 3).all()
        assert (pdf["cosine_ppm"] > 0).all()
        assert (pdf["cosine_ppm"] <= 1_000_000).all()
        # cosine_ppm = trunc(cooc*1e6/sqrt(n_i*n_j)) within the
        # documented <=2e-7-relative isqrt reduction error
        expect = pdf["cooc"] * 1e6 / np.sqrt(
            pdf["n_item"] * pdf["n_partner"]
        )
        assert (np.abs(pdf["cosine_ppm"] - expect) <= 2.5).all()
        # per-item ranks are 1..k without gaps
        for _, g in pdf.groupby("item"):
            assert sorted(g["rk"]) == list(range(1, len(g) + 1))


def test_crossval_fold_encoding_leakage_free(spark, sf_dir, q):
    pdf = q["crossval_fold_encoding"](spark, sf_dir).toPandas()
    assert set(pdf["fold"]).issubset(set(range(5)))
    assert ((pdf["enc_ppm"] >= 0) & (pdf["enc_ppm"] <= 1_000_000)).all()
    # out-of-fold counts exclude own fold: per category,
    # oof_n + n_fc is constant (== category total) across folds
    for _, g in pdf.groupby("category"):
        totals = g["oof_n"] + g["n_fc"]
        assert totals.nunique() == 1


def test_gini_best_split_invariants(spark, sf_dir, q):
    pdf = q["gini_best_split"](spark, sf_dir).toPandas()
    assert (pdf["rk"] == 1).sum() == 1
    n_total = pdf["n_left"] + pdf["n_right"]
    assert n_total.nunique() == 1
    assert pdf["n_left"].is_monotonic_increasing
    assert (
        (pdf["gini_nano"] >= 0) & (pdf["gini_nano"] <= 500_000_000)
    ).all()
    # recompute weighted gini from the exact counts; nano units within
    # the documented reduction error (sub-ppm) plus trunc
    nl, pl = pdf["n_left"].astype(float), pdf["pos_left"].astype(float)
    nr, pr = pdf["n_right"].astype(float), pdf["pos_right"].astype(float)
    n = nl + nr
    gl = 1 - (pl / nl) ** 2 - ((nl - pl) / nl) ** 2
    gr = 1 - (pr / nr) ** 2 - ((nr - pr) / nr) ** 2
    expect = ((nl / n) * gl + (nr / n) * gr) * 1e9
    assert (np.abs(pdf["gini_nano"] - expect) <= 1_000).all()


def test_naive_bayes_confusion_totals(spark, sf_dir, q):
    pdf = q["naive_bayes_confusion"](spark, sf_dir).toPandas()
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    assert pdf["n_docs"].sum() == docs.count()
    langs = {r[0] for r in docs.select("lang").distinct().collect()}
    assert set(pdf["actual"]).issubset(langs)
    assert set(pdf["predicted"]).issubset(langs)


def test_kmeans_lloyd_step_vs_numpy(spark, sf_dir, q):
    """Full independent re-derivation: quantize, pick md5 seeds,
    assign by exact integer distance, floor-divide centroids."""
    pdf = q["kmeans_lloyd_step"](spark, sf_dir).toPandas()
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").toPandas()
    qv = {
        int(r.vec_id): np.array(
            [int(round(float(x) * 1e6)) for x in r.embedding], dtype=object
        )
        for r in emb.itertuples()
    }
    seeds_order = sorted(
        qv, key=lambda v: (hashlib.md5(f"{v}:km-seed-1".encode()).hexdigest(), v)
    )[:K_CLUSTERS]
    centroids = {c: qv[vid] for c, vid in enumerate(seeds_order)}
    assign, inertia = {}, {c: 0 for c in centroids}
    members = {c: [] for c in centroids}
    for vid, v in qv.items():
        best = min(
            centroids, key=lambda c: (int(((v - centroids[c]) ** 2).sum()), c)
        )
        assign[vid] = best
        members[best].append(v)
        inertia[best] += int(((v - centroids[best]) ** 2).sum())
    rows = []
    for c in sorted(members):
        if not members[c]:
            continue
        n = len(members[c])
        s = np.stack(members[c]).sum(axis=0)
        for pos0, sv in enumerate(s):
            sv = int(sv)
            rows.append(
                {
                    "cluster": c,
                    "pos": pos0 + 1,
                    "centroid_q": (sv - ((sv % n) + n) % n) // n,
                    "n_members": n,
                    "inertia": inertia[c],
                }
            )
    expect = pd.DataFrame(rows)
    got = pdf.sort_values(["cluster", "pos"]).reset_index(drop=True)
    expect = expect.sort_values(["cluster", "pos"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got.astype("int64"), expect.astype("int64"), check_dtype=False
    )


def test_conformal_interval_guarantee_shape(spark, sf_dir, q):
    pdf = q["conformal_prediction_interval"](spark, sf_dir).toPandas()
    assert len(pdf) > 0
    assert (pdf["q_cents"] >= 0).all()
    assert (pdf["n_covered"] <= pdf["n_test"]).all()
    assert (
        (pdf["coverage_ppm"] >= 0) & (pdf["coverage_ppm"] <= 1_000_000)
    ).all()
    # exact integer ppm of the in-result counts (no float on the path)
    assert (
        pdf["coverage_ppm"]
        == (pdf["n_covered"] * 1_000_000) // pdf["n_test"]
    ).all()
    # rank formula: qhat index = min(m, ceil(0.9*(m+1))) is within range
    import math

    for r in pdf.itertuples():
        k = min(r.n_calibration, math.ceil(0.9 * (r.n_calibration + 1)))
        assert 1 <= k <= r.n_calibration


def test_isotonic_vs_sequential_pava(spark, sf_dir, q):
    pdf = (
        q["isotonic_calibration"](spark, sf_dir)
        .toPandas()
        .sort_values("bin")
        .reset_index(drop=True)
    )
    # classic sequential weighted PAVA (pooling stack) re-derivation;
    # exact-integer violation test (s1/n1 >= s2/n2 <=> s1*n2 >= s2*n1)
    blocks2, lens = [], []
    for _, row in pdf.iterrows():
        blocks2.append((int(row["s"]), int(row["n"])))
        lens.append(1)
        while len(blocks2) >= 2 and (
            blocks2[-2][0] * blocks2[-1][1]
            >= blocks2[-1][0] * blocks2[-2][1]
        ):
            s2, n2 = blocks2.pop()
            s1, n1 = blocks2.pop()
            blocks2.append((s1 + s2, n1 + n2))
            lens[-2] += lens[-1]
            lens.pop()
    # floor commutes with the finite min/max lattice, so the engine's
    # ppm fit must equal floor(1e6 · exact block mean) per bin
    expect = []
    for (s, n), ln in zip(blocks2, lens):
        expect.extend([(s * 1_000_000) // n] * ln)
    got = [int(v) for v in pdf["iso_rate_ppm"]]
    assert got == expect
    # monotone nondecreasing and mass-conserving per pooled block
    assert all(b >= a for a, b in zip(got, got[1:]))
