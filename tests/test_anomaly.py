"""C11-C14 similarity semantics: the per-pair 2-doc TF-IDF cosine must
match the reference's sklearn construction (src/ai.py:21-25), and the
C12 zero-division policy is sim=1.0 at (0,0) where the reference
crashes (SURVEY.md §2.6)."""

import math

import pytest
from pyspark.sql import functions as F

from etl_mp_transactions_spark.operators.anomaly import (
    _pair_tfidf_cosine,
    anomaly_pairs,
    relative_similarity,
    exact_similarity,
    tfidf_pair_scores,
)


def test_tfidf_identical_docs():
    assert _pair_tfidf_cosine("hello world", "hello world") == pytest.approx(1.0)


def test_tfidf_disjoint_docs():
    assert _pair_tfidf_cosine("aa bb cc", "dd ee ff") == pytest.approx(0.0)


def test_tfidf_matches_sklearn_formula():
    # hand-computed: docs "aa bb" / "aa cc"; shared term aa idf=1,
    # unique terms idf=ln(3/2)+1
    u = math.log(3.0 / 2.0) + 1.0
    v1 = [1.0, u, 0.0]   # aa, bb, cc
    v2 = [1.0, 0.0, u]
    dot = 1.0
    n = math.sqrt(1 + u * u)
    assert _pair_tfidf_cosine("aa bb", "aa cc") == pytest.approx(dot / (n * n))


def test_tfidf_sklearn_token_pattern_drops_single_chars():
    # sklearn default token_pattern requires 2+ word chars
    assert _pair_tfidf_cosine("a b c", "a b c") == pytest.approx(0.0)


def test_c12_zero_division_policy(spark):
    df = spark.createDataFrame([(0.0, 0.0), (2.0, 1.0), (-2.0, 2.0)], "a double, b double")
    out = df.select(relative_similarity(F.col("a"), F.col("b")).alias("s")).collect()
    assert out[0]["s"] == 1.0          # both zero -> 1.0 (reference: crash)
    assert out[1]["s"] == pytest.approx(0.5)
    assert out[2]["s"] == pytest.approx(-1.0)  # sign-opposed: 1 - 4/2


def test_c13_exact(spark):
    df = spark.createDataFrame([("x", "x"), ("x", "y")], "a string, b string")
    out = [r["s"] for r in df.select(exact_similarity(F.col("a"), F.col("b")).alias("s")).collect()]
    assert out == [1.0, 0.0]


def test_anomaly_pairs_identical_docs_score_one(spark):
    docs = spark.createDataFrame(
        [(1, "foo bar baz", "en", "s1", 11), (2, "foo bar baz", "en", "s1", 11),
         (3, "zzz yyy xxx www", "de", "s1", 15)],
        "doc_id long, text string, lang string, source string, n_chars long")
    out = anomaly_pairs(docs, threshold=0.9).collect()
    assert len(out) == 1
    assert (out[0]["doc_a"], out[0]["doc_b"]) == (1, 2)
    assert out[0]["similarity_score"] == pytest.approx(1.0)


def test_tfidf_pair_scores_udf_matches_local(spark):
    docs = spark.createDataFrame(
        [(1, "foo bar baz", "s1"), (2, "foo bar qux", "s1")],
        "doc_id long, text string, source string")
    out = tfidf_pair_scores(docs, block_cols=("source",)).collect()
    assert len(out) == 1
    assert out[0]["tfidf_cosine"] == pytest.approx(
        _pair_tfidf_cosine("foo bar baz", "foo bar qux"))


def test_tfidf_sparse_matches_pair_formula(spark):
    # the closed-form sparse token join must agree with the literal
    # per-pair sklearn formula on every blocked pair (float association
    # differs, so 1e-9 tolerance rather than equality)
    from etl_mp_transactions_spark.operators.anomaly import tfidf_pair_scores_sparse

    rows = [
        (1, "foo bar baz foo", "s1"),
        (2, "foo bar qux", "s1"),
        (3, "foo foo foo bar bar baz", "s1"),
        (4, "completely different words here", "s1"),
        (5, "foo bar baz foo", "s2"),  # other block: must not pair with 1-4
        (6, "foo bar baz", "s2"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string")
    got = {
        (r["doc_a"], r["doc_b"]): r["tfidf_cosine"]
        for r in tfidf_pair_scores_sparse(docs).collect()
    }
    texts = {d: t for d, t, _ in rows}
    blocks = {d: s for d, _, s in rows}
    import itertools

    for a, b in itertools.combinations(sorted(texts), 2):
        if blocks[a] != blocks[b]:
            assert (a, b) not in got
            continue
        want = _pair_tfidf_cosine(texts[a], texts[b])
        if want == 0.0:
            # sparse form emits only pairs sharing >= 1 token
            assert got.get((a, b), 0.0) == 0.0
        else:
            assert got[(a, b)] == pytest.approx(want, abs=1e-9), (a, b)
