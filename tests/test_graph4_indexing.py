"""Property pins for queries/graph4.py and indexing.py beyond the
exact-value oracle."""

import duckdb


def test_hits_scores_bounded_and_cover_graph(spark, sf_dir):
    from etl_mp_transactions_spark.queries.graph4 import (
        hits_hubs_authorities,
        GRID,
    )

    rows = hits_hubs_authorities(spark, sf_dir).collect()
    hubs = [r for r in rows if r.side == "hub"]
    auths = [r for r in rows if r.side == "auth"]
    assert hubs and auths
    con = duckdb.connect()
    nc, ns = con.execute(
        f"""SELECT count(DISTINCT o_custkey),
                   (SELECT count(DISTINCT l_suppkey)
                    FROM '{sf_dir}/lineitem.parquet' l
                    JOIN '{sf_dir}/orders.parquet' o
                      ON o.o_orderkey = l.l_orderkey)
            FROM '{sf_dir}/orders.parquet'"""
    ).fetchone()
    con.close()
    assert len(hubs) == nc
    assert len(auths) == ns
    for r in rows:
        # rescale invariant: score in (0, GRID]
        assert 0 < r.score <= GRID
    # the max of each side sits exactly at the grid top when the
    # rescale divisor is > 1 (it is for this graph: sums >> GRID)
    assert max(r.score for r in auths) <= GRID


def test_inverted_index_postings_shape(spark, sf_dir):
    from etl_mp_transactions_spark.queries.indexing import (
        inverted_index_build,
        POSTINGS_K,
    )

    rows = inverted_index_build(spark, sf_dir).collect()
    assert rows
    for r in rows:
        posts = r.top_postings.split(",")
        assert 1 <= len(posts) <= POSTINGS_K
        tfs = [int(p.split(":")[1]) for p in posts]
        assert tfs == sorted(tfs, reverse=True)  # tf-desc ordering
        assert r.df >= len(posts)
        assert r.cf >= sum(tfs)


def test_quantization_error_small_relative_to_scale(spark, sf_dir):
    from etl_mp_transactions_spark.queries.indexing import (
        embedding_quantization,
    )

    rows = embedding_quantization(spark, sf_dir).collect()
    assert rows
    for r in rows:
        # int8 reconstruction error per element is <= (scale/2)^2;
        # with unit-ish embeddings scale<=2/127, so the per-vector
        # total stays far below 1e12 pico (= 1.0) — catches any
        # scale/rounding regression by orders of magnitude
        assert 0 <= r.total_err_pico < r.n_vecs * 10**12
