"""Pins for queries/spatial.py: grid blocking completeness against a
brute-force O(n^2) distance check, and quantile-normalization rank
properties."""

import hashlib

import duckdb
import numpy as np


def _coord(key, seed, mod=1_000_000):
    return int(hashlib.md5(f"{key}{seed}".encode()).hexdigest()[:8], 16) % mod


def test_grid_blocking_finds_exactly_bruteforce_pairs(spark, sf_dir):
    from etl_mp_transactions_spark.queries.spatial import (
        spatial_cell_join,
        EPS,
        TOP_PAIRS,
    )

    rows = spatial_cell_join(spark, sf_dir).collect()
    con = duckdb.connect()
    keys = [
        k[0]
        for k in con.execute(
            f"SELECT c_custkey FROM '{sf_dir}/customer.parquet'"
        ).fetchall()
    ]
    con.close()
    pts = {k: (_coord(k, ":x"), _coord(k, ":y")) for k in keys}
    ks = sorted(pts)
    xs = np.array([pts[k][0] for k in ks])
    ys = np.array([pts[k][1] for k in ks])
    brute = []
    for i, k in enumerate(ks):
        d2 = (xs[i + 1 :] - xs[i]) ** 2 + (ys[i + 1 :] - ys[i]) ** 2
        for j in np.nonzero(d2 <= EPS * EPS)[0]:
            a, b = sorted((k, ks[i + 1 + int(j)]))
            brute.append((int(d2[j]), a, b))
    brute.sort()
    expected = brute[:TOP_PAIRS]
    got = [(r.dist2, min(r.c1, r.c2), max(r.c1, r.c2)) for r in rows]
    assert got == expected  # blocking is complete AND duplicate-free


def test_quantile_normalization_bounds(spark, sf_dir):
    from etl_mp_transactions_spark.queries.spatial import (
        embedding_quantile_normalize,
    )

    rows = embedding_quantile_normalize(spark, sf_dir).collect()
    assert rows
    # across the corpus, each dimension's min rank maps to 0 and max
    # rank to 1e6 — so the column-wise extremes must be hit
    assert min(r.min_norm for r in rows) == 0
    assert max(r.max_norm for r in rows) == 1_000_000
    for r in rows:
        assert 0 <= r.min_norm <= r.max_norm <= 1_000_000
        assert len(r.norm_checksum) == 32
