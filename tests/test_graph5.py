"""Label propagation (queries/graph5.py): an independent pure-Python
replay of the exact synchronous recurrence (vote count desc, label
asc tiebreak) must reproduce Spark's per-node communities — a third
engine beyond the DuckDB oracle — plus structural invariants and the
blanket partition-count invariance contract."""

from collections import Counter, defaultdict

import pytest
from pyspark.sql import functions as F

from etl_mp_transactions_spark.queries.graph5 import (
    LPA_MIN_COOCCUR,
    N_LPA_ROUNDS,
)
from etl_mp_transactions_spark.registry import queries
from etl_mp_transactions_spark.sources.tables import load_table


def _python_lpa(pairs):
    adj = defaultdict(list)
    for u, v in pairs:
        adj[u].append(v)
        adj[v].append(u)
    lab = {n: n for n in adj}
    for _ in range(N_LPA_ROUNDS):
        nxt = {}
        for n, nbrs in adj.items():
            votes = Counter(lab[v] for v in nbrs)
            nxt[n] = min(votes, key=lambda l: (-votes[l], l))
        lab = nxt
    return lab


def _cooccur_pairs(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey"
    )
    a, b = li.alias("a"), li.alias("b")
    rows = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_suppkey") < F.col("b.l_suppkey")),
        )
        .groupBy(
            F.col("a.l_suppkey").alias("s1"),
            F.col("b.l_suppkey").alias("s2"),
        )
        .agg(F.count("*").alias("cnt"))
        .filter(F.col("cnt") >= LPA_MIN_COOCCUR)
        .collect()
    )
    return [(r["s1"], r["s2"]) for r in rows]


def test_matches_pure_python_replay(spark, sf_dir):
    got = {
        r["node"]: (r["community"], r["community_size"])
        for r in queries()["label_propagation_communities"](
            spark, sf_dir
        ).collect()
    }
    lab = _python_lpa(_cooccur_pairs(spark, sf_dir))
    sizes = Counter(lab.values())
    want = {n: (l, sizes[l]) for n, l in lab.items()}
    assert got == want


def test_structural_invariants(spark, sf_dir):
    df = queries()["label_propagation_communities"](spark, sf_dir)
    rows = df.collect()
    nodes = {r["node"] for r in rows}
    assert len(rows) == len(nodes)  # one row per node
    # every community label is itself a graph node (labels only ever
    # copy existing node ids)
    assert {r["community"] for r in rows} <= nodes


def test_partition_invariance(spark, sf_dir):
    fn = queries()["label_propagation_communities"]
    old = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "3")
        a = sorted(map(tuple, fn(spark, sf_dir).collect()))
        spark.conf.set("spark.sql.shuffle.partitions", "17")
        b = sorted(map(tuple, fn(spark, sf_dir).collect()))
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)
    assert a == b
