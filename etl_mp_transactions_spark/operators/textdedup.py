"""Document-dedup operators for LLM-training-data pipelines
(SURVEY.md §2.9 north-star extensions): exact, MinHash+LSH, SimHash,
and blocked n-gram Jaccard.

Design rules:
- Hashing is md5-derived everywhere (built-in, engine-portable) so the
  DuckDB oracle reproduces results *exactly* — not just statistically.
- Everything is expression-level (no UDFs): tokenize/shingle/hash/
  min-agg all run inside whole-stage codegen.
- Scale shape: MinHash is explode(tokens) → one groupBy(doc) with K
  min-aggregates (NOT K passes), then a self-join on band keys. At
  100 TB the only shuffles are the signature groupBy and the band
  join, both on uniformly-distributed hash keys. Jaccard verification
  is blocked (lang × source) to bound pair counts; LSH candidates are
  banded for the same reason.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

NUM_HASHES = 16
NUM_BANDS = 2  # 2 bands × 8 rows: P(candidate) = 1-(1-J^8)^2


def tokenize(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Distinct word tokens per doc (the shingle set for unigram J)."""
    return df.withColumn("tokens", F.array_distinct(F.split(F.col(text_col), r"\s+")))


def _hash_expr(tok, seed: int):
    """Portable 32-bit hash: first 8 hex chars of md5(tok ‖ '#' ‖ seed).

    md5 is the one cryptographic hash both Spark and DuckDB expose with
    identical semantics; 8 hex chars keep values positive in an int64.
    """
    return F.conv(
        F.substring(F.md5(F.concat(tok, F.lit(f"#{seed}"))), 1, 8), 16, 10
    ).cast("long")


def minhash_signatures(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """(id, h0..h{K-1}, band_0..band_{B-1}) — one explode + one groupBy."""
    toks = tokenize(docs).select(id_col, F.explode("tokens").alias("tok"))
    aggs = [F.min(_hash_expr(F.col("tok"), i)).alias(f"h{i}") for i in range(NUM_HASHES)]
    sig = toks.groupBy(id_col).agg(*aggs)
    rows = NUM_HASHES // NUM_BANDS
    for b in range(NUM_BANDS):
        cols = [F.col(f"h{i}").cast("string") for i in range(b * rows, (b + 1) * rows)]
        sig = sig.withColumn(f"band_{b}", F.md5(F.concat_ws(",", *cols)))
    return sig


def minhash_lsh_pairs(
    docs: DataFrame, threshold: float = 0.9, id_col: str = "doc_id"
) -> DataFrame:
    """Near-dup candidate pairs with estimated Jaccard ≥ threshold.

    est_jaccard = fraction of agreeing minhashes (exact n/K fraction —
    deterministic across engines). Band self-join generates candidates;
    signature agreement verifies them.
    """
    sig = minhash_signatures(docs, id_col)
    bands = sig.select(
        F.col(id_col),
        F.array(*[F.col(f"h{i}") for i in range(NUM_HASHES)]).alias("sig"),
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(b).alias("band_idx"), F.col(f"band_{b}").alias("band_key"))
                    for b in range(NUM_BANDS)
                ]
            )
        ).alias("bk"),
    ).select(id_col, "sig", F.col("bk.band_idx").alias("band_idx"), F.col("bk.band_key").alias("band_key"))

    a = bands.select(
        F.col(id_col).alias("doc_a"), F.col("sig").alias("sig_a"), "band_idx", "band_key"
    )
    b = bands.select(
        F.col(id_col).alias("doc_b"), F.col("sig").alias("sig_b"), "band_idx", "band_key"
    )
    cand = (
        a.join(b, ["band_idx", "band_key"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b", "sig_a", "sig_b")
        .dropDuplicates(["doc_a", "doc_b"])
    )
    matches = F.size(
        F.filter(F.zip_with("sig_a", "sig_b", lambda x, y: x == y), lambda v: v)
    )
    return (
        cand.withColumn("est_jaccard", matches / F.lit(float(NUM_HASHES)))
        .filter(F.col("est_jaccard") >= threshold)
        .select("doc_a", "doc_b", "est_jaccard")
    )


def exact_dedup(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Exact dedup via content-hash groupBy: one canonical doc per
    distinct text (min doc_id wins), with duplicate count."""
    return (
        docs.withColumn("content_hash", F.md5(F.col(text_col)))
        .groupBy("content_hash")
        .agg(
            F.min("doc_id").alias("canonical_doc_id"),
            F.count("*").alias("n_copies"),
        )
    )


def simhash_fingerprints(docs: DataFrame) -> DataFrame:
    """32-bit SimHash per doc: majority vote of token-hash bits.

    Explodes (token × bit) — 32× amplification, but it's an int-only
    map stage feeding one groupBy(doc); at scale this beats wide
    32-aggregate rows on shuffle size.
    """
    toks = tokenize(docs).select("doc_id", F.explode("tokens").alias("tok"))
    h = toks.withColumn("h", _hash_expr(F.col("tok"), 0))
    bits = h.select(
        "doc_id", "h", F.explode(F.sequence(F.lit(0), F.lit(31))).alias("j")
    ).withColumn("bit", F.expr("shiftright(h, j) & 1"))
    per_bit = bits.groupBy("doc_id", "j").agg(
        F.sum("bit").alias("ones"), F.count("*").alias("n")
    )
    return per_bit.groupBy("doc_id").agg(
        F.sum(
            F.when(F.col("ones") * 2 > F.col("n"), F.expr("shiftleft(1L, j)")).otherwise(
                F.lit(0).cast("long")
            )
        ).alias("simhash")
    )


def ngram_jaccard_pairs(
    docs: DataFrame,
    threshold: float = 0.9,
    block_cols: tuple[str, ...] = ("lang", "source"),
) -> DataFrame:
    """Exact distinct-unigram Jaccard over blocked candidate pairs.

    Blocking ((lang, source) here) bounds the quadratic pair count —
    the standard scale move; an unblocked all-pairs join is O(n²) and
    is exactly what the reference's anomaly loop does (src/ai.py:46-48).
    """
    t = tokenize(docs).select("doc_id", *block_cols, "tokens")
    a = t.select(
        F.col("doc_id").alias("doc_a"), *block_cols, F.col("tokens").alias("tok_a")
    )
    b = t.select(
        F.col("doc_id").alias("doc_b"),
        *[F.col(c).alias(f"{c}_b") for c in block_cols],
        F.col("tokens").alias("tok_b"),
    )
    cond = [F.col(c) == F.col(f"{c}_b") for c in block_cols] + [
        F.col("doc_a") < F.col("doc_b")
    ]
    pairs = a.join(b, cond)
    jac = F.size(F.array_intersect("tok_a", "tok_b")) / F.size(
        F.array_union("tok_a", "tok_b")
    )
    return (
        pairs.withColumn("jaccard", jac)
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )
