"""Exact numpy replay of the PCA power-iteration pipeline (queries/
pca.py): the engine result must equal a from-scratch int64/float64
re-implementation bit for bit — quantization, scatter, max-normalize,
8 iterations, sign canonicalization, and the extreme projections."""

import numpy as np
import pandas as pd

from etl_mp_transactions_spark.queries.pca import (
    _DIM,
    _ITERS,
    pca_extreme_projection,
    pca_power_direction,
)


def _round_half_away(x):
    # SQL round() semantics (same contract as the gram_matrix numpy
    # partial: np.round is half-even and would diverge)
    return (np.floor(np.abs(x) + 0.5) * np.sign(x)).astype(np.int64)


def _replay(sf_dir):
    emb = pd.read_parquet(f"{sf_dir}/embeddings.parquet")
    X = np.stack([np.asarray(v, dtype=np.float64) for v in emb["embedding"]])
    q = _round_half_away(X * 1e6)
    n = q.shape[0]
    g = q.T.astype(np.int64) @ q.astype(np.int64)
    s = q.sum(axis=0, dtype=np.int64)
    md = g.astype(np.float64) - np.outer(
        s.astype(np.float64), s.astype(np.float64)
    ) / float(n)
    mx = np.abs(md).max()
    mn = (
        _round_half_away(1e6 * (md / mx))
        if mx != 0
        else np.zeros_like(g, dtype=np.int64)
    )
    v = np.full(_DIM, 1_000_000, dtype=np.int64)

    def step(v):
        w = mn @ v  # exact int64 (<= 64 * 1e6 * 1e6)
        mw = np.abs(w).max()
        wm = w if mw == 0 else _round_half_away(1e6 * (w.astype(np.float64) / float(mw)))
        n2 = int((wm.astype(object) ** 2).sum())
        if n2 == 0:
            return wm, wm
        nxt = _round_half_away(
            1e6 * (wm.astype(np.float64) / np.sqrt(float(n2)))
        )
        return nxt, wm

    for _ in range(_ITERS):
        v, _ = step(v)
    _, wmf = step(v)
    num = int((v.astype(object) * wmf.astype(object)).sum())
    den = int((v.astype(object) ** 2).sum())
    rq = int(_round_half_away(np.array([1e9 * (num / den)]))[0])
    nz = v[v != 0]
    sg = 1 if len(nz) == 0 or nz[0] > 0 else -1
    return q, n, s, v * sg, rq


def test_pca_direction_matches_numpy_replay(spark, sf_dir):
    _, _, _, v, rq = _replay(sf_dir)
    rows = {r.dim: (r.v_micro, r.rq_nano) for r in
            pca_power_direction(spark, sf_dir).collect()}
    assert len(rows) == _DIM
    for d in range(_DIM):
        assert rows[d] == (v[d], rq), (d, rows[d], (v[d], rq))


def test_pca_extremes_match_numpy_replay(spark, sf_dir):
    q, n, s, v, _ = _replay(sf_dir)
    vk = _round_half_away(v.astype(np.float64) / 1e3)
    proj = ((n * q - s).astype(np.int64) @ vk).astype(np.int64)
    ids = np.arange(len(proj))
    order_top = sorted(zip(proj, ids), key=lambda t: (-t[0], t[1]))[:10]
    order_bot = sorted(zip(proj, ids), key=lambda t: (t[0], t[1]))[:10]
    expected = {
        ("top", r + 1): (int(i), int(p))
        for r, (p, i) in enumerate(order_top)
    } | {
        ("bottom", r + 1): (int(i), int(p))
        for r, (p, i) in enumerate(order_bot)
    }
    got = {
        (r.side, r.rank): (r.vec_id, r.proj)
        for r in pca_extreme_projection(spark, sf_dir).collect()
    }
    assert got == expected


def test_pca_direction_is_unit_and_converged(spark, sf_dir):
    rows = pca_power_direction(spark, sf_dir).collect()
    norm2 = sum((r.v_micro / 1e6) ** 2 for r in rows)
    assert abs(norm2 - 1.0) < 1e-4  # micro-quantization error only
    # sign canonicalization: first nonzero component positive
    first = min((r for r in rows if r.v_micro != 0), key=lambda r: r.dim)
    assert first.v_micro > 0
    # the Rayleigh quotient of a converged direction on the
    # max-normalized scatter is positive (top eigenvalue dominates)
    assert rows[0].rq_nano > 0
