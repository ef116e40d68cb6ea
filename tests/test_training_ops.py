"""Training-ops batch 2: repetition metrics, n-gram builder, split
determinism — edge cases the oracle corpus doesn't contain."""

import pytest
from pyspark.sql import functions as F

from etl_mp_transactions_spark.operators.textstats import (
    repetition_metrics,
    word_ngrams,
)


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def test_repetition_metrics_values(spark):
    out = {
        r["doc_id"]: r
        for r in repetition_metrics(
            _docs(spark, ["a a a a b", "a b c d e", "x y x y x y"])
        ).collect()
    }
    # doc0: 'a'×4 of 5 words; 2-grams [a a, a a, a a, a b] → 4 total 2 distinct
    assert out[0]["top_word_frac"] == pytest.approx(0.8)
    assert out[0]["dup_2gram_frac"] == pytest.approx(0.5)
    # doc1: all unique
    assert out[1]["top_word_frac"] == pytest.approx(0.2)
    assert out[1]["dup_2gram_frac"] == 0.0
    assert out[1]["dup_3gram_frac"] == 0.0
    # doc2: [x y, y x, x y, y x, x y] → 5 total 2 distinct
    assert out[2]["dup_2gram_frac"] == pytest.approx(0.6)
    # trigrams [x y x, y x y, x y x, y x y] → 4 total 2 distinct
    assert out[2]["dup_3gram_frac"] == pytest.approx(0.5)


def test_repetition_metrics_degenerate_docs(spark):
    # empty and single-word docs must not hit negative slice lengths
    out = {
        r["doc_id"]: r
        for r in repetition_metrics(_docs(spark, ["", "word", "a b"])).collect()
    }
    assert out[0]["dup_2gram_frac"] == 0.0 and out[0]["dup_3gram_frac"] == 0.0
    assert out[1]["n_words"] == 1 and out[1]["dup_3gram_frac"] == 0.0
    assert out[2]["dup_2gram_frac"] == 0.0 and out[2]["dup_3gram_frac"] == 0.0


def test_word_ngrams_builder(spark):
    docs = _docs(spark, ["a b c d", "a b", ""])
    out = {
        r["doc_id"]: r["g"]
        for r in docs.select("doc_id", word_ngrams(docs, 3).alias("g")).collect()
    }
    assert out[0] == ["a b c", "b c d"]
    assert out[1] == []  # shorter than n
    assert out[2] == []


def test_dataset_split_deterministic_and_complete(spark):
    from etl_mp_transactions_spark.registry import queries

    q = queries()["dataset_split"]
    a = {(r["doc_id"], r["split"]) for r in q(spark, "/root/testdata/sf0.001").collect()}
    b = {(r["doc_id"], r["split"]) for r in q(spark, "/root/testdata/sf0.001").collect()}
    assert a == b and len(a) > 0
    splits = {s for _, s in a}
    assert splits <= {"train", "val", "test"}


def test_repetition_metrics_property_vs_python(spark):
    # property parity: the let-bound expression pipeline must equal a
    # literal Python implementation on arbitrary small word lists
    from collections import Counter

    from hypothesis import given, settings, strategies as st

    word = st.sampled_from(["a", "b", "ab", "xyz", "q"])

    def py_metrics(words):
        total = len(words)
        top = max(Counter(words).values()) if total else 0
        g2 = [f"{words[i]} {words[i+1]}" for i in range(total - 1)]
        g3 = [f"{words[i]} {words[i+1]} {words[i+2]}" for i in range(total - 2)]

        def dup(g):
            return (len(g) - len(set(g))) / len(g) if g else 0.0

        return (
            total,
            top / total if total else 0.0,
            dup(g2),
            dup(g3),
        )

    @settings(max_examples=12, deadline=None)
    @given(st.lists(st.lists(word, min_size=1, max_size=12), min_size=1, max_size=6))
    def check(docs_words):
        texts = [" ".join(ws) for ws in docs_words]
        rows = repetition_metrics(
            spark.createDataFrame(
                [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
            )
        ).collect()
        got = {
            r["doc_id"]: (
                r["n_words"],
                r["top_word_frac"],
                r["dup_2gram_frac"],
                r["dup_3gram_frac"],
            )
            for r in rows
        }
        for i, ws in enumerate(docs_words):
            want = py_metrics(ws)
            assert got[i][0] == want[0]
            for g, w in zip(got[i][1:], want[1:]):
                assert abs(g - w) < 1e-12, (i, ws, got[i], want)

    check()
