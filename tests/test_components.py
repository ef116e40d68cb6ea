"""Connected components: label propagation vs known component structure."""

import pytest

from etl_mp_transactions_spark.operators.components import connected_components


def _cc(spark, nodes, edges):
    n = spark.createDataFrame([(x,) for x in nodes], "doc_id long")
    e = spark.createDataFrame(edges or [(None, None)], "doc_a long, doc_b long").filter(
        "doc_a IS NOT NULL"
    )
    return {
        r["doc_id"]: r["component"] for r in connected_components(n, e).collect()
    }


def test_chain_and_singleton(spark):
    # 1-2-3 chain + 4-5 pair + 6 singleton
    got = _cc(spark, [1, 2, 3, 4, 5, 6], [(2, 3), (1, 2), (4, 5)])
    assert got == {1: 1, 2: 1, 3: 1, 4: 4, 5: 4, 6: 6}


def test_min_id_flows_against_edge_direction(spark):
    # min label must propagate both ways regardless of pair orientation
    got = _cc(spark, [10, 11, 12], [(12, 11), (11, 10)])
    assert got == {10: 10, 11: 10, 12: 10}


def test_long_chain_converges(spark):
    n = 40
    got = _cc(spark, list(range(n)), [(i, i + 1) for i in range(n - 1)])
    assert set(got.values()) == {0}


def test_no_edges(spark):
    got = _cc(spark, [7, 8], [])
    assert got == {7: 7, 8: 8}
