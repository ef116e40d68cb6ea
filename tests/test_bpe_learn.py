"""BPE learn loop (queries/tokenize.py bpe_learn_vocab): a pure-Python
replay of Sennrich Algorithm 1 under the declared determinism rules
(overlapping zip pair counts, (support desc, lhs, rhs) argmax,
leftmost-greedy application) must reproduce Spark's merge table, and
re-running must be partition-invariant."""

from collections import Counter

from pyspark.sql import functions as F

from etl_mp_transactions_spark.queries.tokenize import N_LEARN
from etl_mp_transactions_spark.registry import queries
from etl_mp_transactions_spark.sources.tables import load_table


def _python_bpe(wcnt):
    segs = {w: list(w) for w in wcnt}
    table = []
    for rank in range(1, N_LEARN + 1):
        pairs = Counter()
        for w, syms in segs.items():
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] += wcnt[w]
        (lhs, rhs), support = min(
            pairs.items(), key=lambda kv: (-kv[1], kv[0])
        )
        table.append((rank, lhs, rhs, lhs + rhs, support))
        for w, syms in segs.items():
            out = []
            for s in syms:
                if out and out[-1] == lhs and s == rhs:
                    out[-1] = lhs + rhs
                else:
                    out.append(s)
            segs[w] = out
    return table


def test_matches_pure_python_replay(spark, sf_dir):
    rows = (
        load_table(spark, sf_dir, "documents")
        .select(F.explode(F.split("text", " ")).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .count()
        .collect()
    )
    wcnt = {r["word"]: r["count"] for r in rows}
    want = _python_bpe(wcnt)
    got = [
        (r["rank"], r["lhs"], r["rhs"], r["merged"], r["support"])
        for r in queries()["bpe_learn_vocab"](spark, sf_dir).collect()
    ]
    assert got == want


def test_partition_invariance(spark, sf_dir):
    fn = queries()["bpe_learn_vocab"]
    old = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "3")
        a = [tuple(r) for r in fn(spark, sf_dir).collect()]
        spark.conf.set("spark.sql.shuffle.partitions", "17")
        b = [tuple(r) for r in fn(spark, sf_dir).collect()]
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)
    assert a == b and len(a) == N_LEARN
