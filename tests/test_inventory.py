"""Independent python queue-walk cross-check for fifo_cost_matching
(queries/inventory.py) plus invariants for pvm_decomposition and
backtest_naive_mae (queries/analytics4.py)."""

from collections import defaultdict, deque

import pytest

from etl_mp_transactions_spark.registry import queries


@pytest.fixture(scope="module")
def q():
    return queries()


def test_fifo_matching_vs_queue_walk(spark, sf_dir, q):
    """The set-based interval-overlap FIFO must equal an imperative
    FIFO queue walk exactly."""
    pdf = q["fifo_cost_matching"](spark, sf_dir).toPandas()
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").toPandas()
    li["qty"] = li["l_quantity"].round().astype("int64")
    li = li.sort_values(["l_shipdate", "l_orderkey", "l_linenumber"])
    buys, sells = defaultdict(deque), defaultdict(list)
    for r in li.itertuples():
        if r.l_returnflag == "N":
            buys[r.l_partkey].append([r.l_orderkey, r.l_linenumber, r.qty])
        elif r.l_returnflag == "R":
            sells[r.l_partkey].append((r.l_orderkey, r.l_linenumber, r.qty))
    expect = []
    for part in sells:
        bq = buys[part]
        for so, sl, sq in sells[part]:
            need = sq
            while need > 0 and bq:
                bo, bl, avail = bq[0]
                take = min(need, avail)
                expect.append((part, bo, bl, so, sl, take))
                need -= take
                if take == avail:
                    bq.popleft()
                else:
                    bq[0][2] -= take
    expect_set = {t for t in expect}
    got_set = {
        (r.part, r.buy_order, r.buy_line, r.sell_order, r.sell_line,
         r.matched_qty)
        for r in pdf.itertuples()
    }
    assert got_set == expect_set
    # conservation: matched qty per part never exceeds either side
    tot = pdf.groupby("part")["matched_qty"].sum()
    bsum = li[li["l_returnflag"] == "N"].groupby("l_partkey")["qty"].sum()
    ssum = li[li["l_returnflag"] == "R"].groupby("l_partkey")["qty"].sum()
    for part, m in tot.items():
        assert m <= bsum.get(part, 0) and m <= ssum.get(part, 0)
        assert m == min(bsum.get(part, 0), ssum.get(part, 0))


def test_pvm_effects_sum_to_delta(spark, sf_dir, q):
    pdf = q["pvm_decomposition"](spark, sf_dir).toPandas()
    if len(pdf):
        resid = (
            pdf["volume_effect_cents"]
            + pdf["price_effect_cents"]
            - pdf["delta_cents"]
        ).abs()
        assert (resid <= 1).all()  # integer rounding of two halves


def test_backtest_mae_nonnegative_and_counts(spark, sf_dir, q):
    pdf = q["backtest_naive_mae"](spark, sf_dir).toPandas()
    assert (pdf["mae_naive_millicents"] >= 0).all()
    assert (pdf["n_snaive"] <= pdf["n_naive"]).all()
    assert (
        pdf["abs_err_naive"] >= pdf["n_naive"] * 0
    ).all()
