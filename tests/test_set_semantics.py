"""SQL set-operation semantics on constructed overlap cases the
testdata never exercises (c_mktsegment is single-valued per customer,
so the union branches of set_ops can never share an element there).
These tests drive the PRODUCTION expression (set_ops_expr) — a
regression back to bag semantics fails here even though the oracle
gate can't see it."""

from etl_mp_transactions_spark.queries.relational import set_ops_expr


def test_union_then_except_set_semantics(spark):
    a = spark.createDataFrame([(1,), (2,)], "k long")
    b = spark.createDataFrame([(1,), (2,)], "k long")
    u = spark.createDataFrame([(1,), (3,)], "k long")
    d = spark.createDataFrame([(1,)], "k long")
    # ((A ∩ B) ∪ C) \ D with 1 ∈ A∩B, 1 ∈ C, 1 ∈ D → 1 must vanish
    out = sorted(r["k"] for r in set_ops_expr(a, b, u, d).collect())
    assert out == [2, 3]


def test_except_removes_all_duplicates(spark):
    x = spark.createDataFrame([(1,), (1,), (2,)], "k long")
    d = spark.createDataFrame([(1,)], "k long")
    assert sorted(r["k"] for r in x.subtract(d).collect()) == [2]


def test_output_is_deduplicated(spark):
    a = spark.createDataFrame([(5,), (5,)], "k long")
    b = spark.createDataFrame([(5,)], "k long")
    u = spark.createDataFrame([(5,), (6,)], "k long")
    d = spark.createDataFrame([], "k long")
    out = sorted(r["k"] for r in set_ops_expr(a, b, u, d).collect())
    assert out == [5, 6]
