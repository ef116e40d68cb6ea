"""The JL projection must actually be a JL projection: pairwise
squared distances in the projected 16-dim space concentrate around
the original 64-dim distances (Achlioptas ±1 guarantee), and the
matrix itself is a balanced deterministic constant."""

import math

from etl_mp_transactions_spark.queries.embeddings2 import (
    IN_DIM,
    OUT_DIM,
    SIGNS,
    random_projection_jl,
)


def test_sign_matrix_shape_and_balance():
    assert len(SIGNS) == OUT_DIM and all(len(r) == IN_DIM for r in SIGNS)
    flat = [s for row in SIGNS for s in row]
    assert set(flat) == {-1, 1}
    # md5 parity should be near-balanced; a degenerate all-one matrix
    # would silently break the distance guarantee
    assert 0.35 < flat.count(1) / len(flat) < 0.65


def test_distance_preservation(spark, sf_dir):
    rows = random_projection_jl(spark, sf_dir).limit(40).collect()
    emb = {
        r.vec_id: r.embedding
        for r in spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        .limit(200)
        .collect()
    }
    # y{j}_nano are exact nano-unit integers (r15 float purge)
    proj = {
        r.vec_id: [getattr(r, f"y{j}_nano") / 1e9 for j in range(OUT_DIM)]
        for r in rows
        if r.vec_id in emb
    }
    ids = sorted(proj)[:20]
    ratios = []
    for a in range(len(ids)):
        for b in range(a + 1, len(ids)):
            xa, xb = emb[ids[a]], emb[ids[b]]
            pa, pb = proj[ids[a]], proj[ids[b]]
            d_orig = sum((float(u) - float(v)) ** 2 for u, v in zip(xa, xb))
            d_proj = sum((u - v) ** 2 for u, v in zip(pa, pb))
            if d_orig > 1e-12:
                ratios.append(d_proj / d_orig)
    assert len(ratios) > 100
    mean = sum(ratios) / len(ratios)
    # unbiased estimator: E[ratio] = 1; k=16 gives σ ≈ sqrt(2/16) ≈ .35
    assert 0.75 < mean < 1.25
    sd = math.sqrt(sum((r - mean) ** 2 for r in ratios) / len(ratios))
    assert sd < 0.6
