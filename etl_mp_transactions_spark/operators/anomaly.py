"""Anomaly/similarity join (SURVEY.md §2 J2, C11-C14).

The reference detects "anomalies" by scoring all row pairs with a
weighted blend — TF-IDF cosine for strings, relative diff for numerics,
exact match otherwise, threshold ≥ 0.9 (``/root/reference/src/ai.py:
10-60``) — an O(n·m) nested loop that re-fits a vectorizer per pair.

Two engine modes:

- ``anomaly_pairs``: the scalable form — blocked pair generation, all
  similarity components as built-in expressions (set-Jaccard for text:
  the documented semantic substitution for per-pair TF-IDF, SURVEY §7).
  Pure codegen; the block join is the only shuffle.

- ``tfidf_pair_scores``: exactness mode — replicates the reference's
  per-pair 2-document TF-IDF cosine bit-for-bit (smooth-idf, l2 norm,
  sklearn token pattern) as an Arrow-vectorized pandas UDF. Python
  touches each *pair* once per batch — no per-pair refit overhead, but
  still the slow path; use only where reference-exact scores matter.

C12 zero-division policy: sim = 1.0 when both values are 0 (the
reference crashes there; SURVEY §2.6 C12).
"""

from __future__ import annotations

import math
import re

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

# reference weights (src/ai.py:11-17) re-keyed for the documents table
TEXT_W, NUM_W, EXACT_W = 0.8, 0.1, 0.1
THRESHOLD = 0.9


def relative_similarity(a: Column, b: Column) -> Column:
    """C12: 1 - |a-b| / max(|a|,|b|); 1.0 when both are zero."""
    denom = F.greatest(F.abs(a), F.abs(b))
    return F.when(denom == 0, F.lit(1.0)).otherwise(1 - F.abs(a - b) / denom)


def exact_similarity(a: Column, b: Column) -> Column:
    """C13: 1.0 on equality else 0.0 — including when either side is
    NULL (a bare `==` yields NULL there, which would null the whole
    blended score and silently drop the pair; SQL CASE gives 0.0)."""
    return F.coalesce((a == b).cast("double"), F.lit(0.0))


def anomaly_pairs(
    docs: DataFrame,
    threshold: float = THRESHOLD,
    block_cols: tuple[str, ...] = ("source",),
) -> DataFrame:
    """J2 scalable mode over `documents`: weighted blend of
    0.8·jaccard(text) + 0.1·relative(n_chars) + 0.1·exact(lang)."""
    from etl_mp_transactions_spark.operators.textdedup import (
        blocked_pairs,
        hashed_token_sets,
    )

    # int64 token hashes: pair-quadratic set intersection over longs,
    # not strings (Jaccard value unchanged — see hashed_token_sets)
    pairs = blocked_pairs(
        hashed_token_sets(docs),
        block_cols,
        {"tokens": "tok", "n_chars": "nc", "lang": "lang"},
    )
    # the whole blend is let-bound on the intersect size: the threshold
    # filter gets pushed into the join condition by Catalyst, and
    # without the binding every reference would re-run array_intersect
    # per candidate pair (~3× the runtime, measured)
    from etl_mp_transactions_spark.operators.textdedup import let1

    # Length-ratio prefilter (classic set-similarity-join prune):
    # J(A,B) ≤ min(|A|,|B|)/max(|A|,|B|), and the blend needs
    # J ≥ (threshold − NUM_W·rel − EXACT_W·exact)/TEXT_W, so any pair
    # whose size ratio falls below that bound can't pass. Pure integer/
    # double comparisons — Catalyst pushes it into the join, pruning
    # most pairs BEFORE the O(|A|+|B|) array_intersect runs. The 1e-9
    # slack keeps the prune strictly conservative under fp rounding;
    # results are provably unchanged.
    j_min = (
        F.lit(threshold)
        - F.lit(NUM_W) * relative_similarity(F.col("nc_a"), F.col("nc_b"))
        - F.lit(EXACT_W) * exact_similarity(F.col("lang_a"), F.col("lang_b"))
    ) / F.lit(TEXT_W)
    pairs = pairs.filter(
        F.least(F.size("tok_a"), F.size("tok_b")).cast("double")
        >= (j_min - F.lit(1e-9)) * F.greatest(F.size("tok_a"), F.size("tok_b"))
    )

    sizes = F.size("tok_a") + F.size("tok_b")
    # association order (t + r) + e matches the SQL oracle bit-for-bit
    sim = let1(
        F.size(F.array_intersect("tok_a", "tok_b")),
        lambda i: (
            F.lit(TEXT_W) * (i / (sizes - i))
            + F.lit(NUM_W) * relative_similarity(F.col("nc_a"), F.col("nc_b"))
        )
        + F.lit(EXACT_W) * exact_similarity(F.col("lang_a"), F.col("lang_b")),
    )
    from etl_mp_transactions_spark.operators.textdedup import filter_above_join

    return filter_above_join(
        pairs.withColumn("similarity_score", sim),
        F.col("similarity_score") >= threshold,
    ).select("doc_a", "doc_b", "similarity_score")


# --- exactness mode: per-pair 2-document TF-IDF cosine (C11) ---

_TOKEN_RE = re.compile(r"(?u)\b\w\w+\b")  # sklearn TfidfVectorizer default


def _pair_tfidf_cosine(s1: str, s2: str) -> float:
    """Cosine of TF-IDF vectors fit on the 2-doc corpus [s1, s2],
    replicating sklearn defaults: smooth idf = ln((1+n)/(1+df)) + 1
    with n=2, raw term counts, l2 normalization (src/ai.py:21-25)."""
    t1 = _TOKEN_RE.findall((s1 or "").lower())
    t2 = _TOKEN_RE.findall((s2 or "").lower())
    if not t1 or not t2:
        return 0.0
    vocab = set(t1) | set(t2)
    c1 = {w: 0 for w in vocab}
    c2 = {w: 0 for w in vocab}
    for w in t1:
        c1[w] += 1
    for w in t2:
        c2[w] += 1
    dot = n1 = n2 = 0.0
    for w in vocab:
        df = (c1[w] > 0) + (c2[w] > 0)
        idf = math.log(3.0 / (1.0 + df)) + 1.0
        v1, v2 = c1[w] * idf, c2[w] * idf
        dot += v1 * v2
        n1 += v1 * v1
        n2 += v2 * v2
    if n1 == 0 or n2 == 0:
        return 0.0
    return dot / math.sqrt(n1 * n2)


def _make_pair_udf():
    # created lazily with an explicit DataType: a module-level
    # pandas_udf("double") would re-parse DDL at executor import time,
    # where no SparkContext exists
    from pyspark.sql.types import DoubleType

    @pandas_udf(DoubleType())
    def pair_tfidf_cosine_udf(s1: pd.Series, s2: pd.Series) -> pd.Series:
        return pd.Series(
            [_pair_tfidf_cosine(a, b) for a, b in zip(s1, s2)], dtype="float64"
        )

    return pair_tfidf_cosine_udf


def tfidf_pair_scores(
    docs: DataFrame, block_cols: tuple[str, ...] = ("source",)
) -> DataFrame:
    """J2 exactness mode: blocked pairs scored with the reference's
    per-pair TF-IDF cosine. Arrow batches cross the Python boundary
    once per ~10k pairs (session conf), not once per pair."""
    from etl_mp_transactions_spark.operators.textdedup import blocked_pairs

    pairs = blocked_pairs(docs, block_cols, {"text": "text"})
    udf = _make_pair_udf()
    return pairs.select(
        "doc_a",
        "doc_b",
        udf(F.col("text_a"), F.col("text_b")).alias("tfidf_cosine"),
    )


# (ln(3/2)+1)² — the squared idf of a token present in exactly one of
# the two documents (smooth idf, n=2, df=1). Embedded as the same
# decimal literal in the SQL oracle so both engines parse the
# identical double.
IDF1_SQ = 1.9753321701094941


def tfidf_pair_scores_sparse(docs: DataFrame, block_col: str = "source") -> DataFrame:
    """Per-pair 2-document TF-IDF cosine (C11) in closed form, fully
    JVM-side — the distributed-exact shape of ``tfidf_pair_scores``.

    For a 2-doc fit with sklearn defaults the idf is bimodal: 1.0 for
    tokens in both docs, ln(1.5)+1 for tokens in one. So with raw term
    counts tf, letting dot = Σ_shared tfa·tfb, sh = Σ_shared tf² and
    S = Σ_all tf² (a per-doc constant):

        cos(a,b) = dot / sqrt((sh_a + (S_a−sh_a)·c²)·(sh_b + (S_b−sh_b)·c²))

    where c² = IDF1_SQ. Every sum is an exact int64, so the one float
    expression at the end is bit-identical across engines — unlike the
    pandas-UDF path this mode is DuckDB-oracle-checkable.

    Physical shape: tokenize once per document (not once per pair),
    one (block, token) self-join producing a row per *shared* token
    occurrence, one groupBy(pair). No text bytes are replicated across
    pairs and no Python runs. Worst case is Σ_t df(t)² rows — a
    stopword shared by every doc in a block costs |block|² rows, the
    inherent cost of exact all-pairs scoring; the scalable screen for
    100 TB corpora is `anomaly_pairs` / the LSH dedup family, with
    this as the exact verifier on their candidates.

    Reference parity: src/ai.py:21-25 (per-pair TfidfVectorizer fit);
    equivalence with the literal formula is asserted to 1e-9 in
    tests/test_anomaly.py (float association differs, values agree).
    """
    # split-on-\W+ then length>=2 yields exactly the \b\w\w+\b token
    # multiset (maximal >=2-char word-char runs) at ~3x the throughput
    # of regexp_extract_all with boundary assertions; equivalence is
    # pinned by tests/test_anomaly.py and the DuckDB oracle, which
    # still tokenizes with the literal sklearn pattern.
    tf = (
        docs.select(
            "doc_id",
            block_col,
            F.explode(F.split(F.lower(F.col("text")), r"\W+")).alias("token"),
        )
        .filter(F.length("token") >= 2)
        .groupBy("doc_id", block_col, "token")
        .agg(F.count("*").alias("tf"))
        # tf feeds three consumers (both join sides + the per-doc norm);
        # without this Spark re-tokenizes the corpus three times. At
        # scale the cache is distinct (doc, token) pairs — far smaller
        # than the corpus — and spills to disk if needed.
        .persist()
    )
    s = tf.groupBy("doc_id").agg(F.sum(F.col("tf") * F.col("tf")).alias("s2"))

    a = tf.select(
        F.col("doc_id").alias("doc_a"),
        F.col(block_col).alias("__blk"),
        "token",
        F.col("tf").alias("tf_a"),
    )
    b = tf.select(
        F.col("doc_id").alias("doc_b"),
        F.col(block_col).alias("__blk_b"),
        F.col("token").alias("__tok_b"),
        F.col("tf").alias("tf_b"),
    )
    pair = (
        a.join(
            b,
            (F.col("__blk") == F.col("__blk_b"))
            & (F.col("token") == F.col("__tok_b"))
            & (F.col("doc_a") < F.col("doc_b")),
        )
        .groupBy("doc_a", "doc_b")
        .agg(
            F.sum(F.col("tf_a") * F.col("tf_b")).alias("dot"),
            F.sum(F.col("tf_a") * F.col("tf_a")).alias("sh_a"),
            F.sum(F.col("tf_b") * F.col("tf_b")).alias("sh_b"),
        )
    )
    pair = pair.join(
        s.select(F.col("doc_id").alias("doc_a"), F.col("s2").alias("s2_a")), "doc_a"
    ).join(s.select(F.col("doc_id").alias("doc_b"), F.col("s2").alias("s2_b")), "doc_b")
    c2 = F.lit(IDF1_SQ)
    cos = F.col("dot").cast("double") / F.sqrt(
        (F.col("sh_a") + (F.col("s2_a") - F.col("sh_a")) * c2)
        * (F.col("sh_b") + (F.col("s2_b") - F.col("sh_b")) * c2)
    )
    # the exact integer sums ride along so oracle-facing callers can
    # derive an all-integer score (queries/similarity.py r15 float
    # purge); the float column stays as the sklearn-formula twin for
    # the UDF ground-truth tests
    return pair.select(
        "doc_a", "doc_b", cos.alias("tfidf_cosine"),
        "dot", "sh_a", "sh_b", "s2_a", "s2_b",
    )
