"""Adversarial Zipf-skew stress for the LSH band join (VERDICT r4 #6).

The r4 cap test used 2000 identical docs; this one models the
realistic 100 TB failure mode: a large corpus whose duplicate-group
sizes follow a Zipf law (a few templates duplicated tens of thousands
of times, a long tail of near-unique docs). The properties under
test:

1. distinct-signature collapse — all pair-quadratic work must run at
   the distinct-signature level, so a 100k-doc corpus with 2000
   distinct texts does band-join work for 2000 signatures, not 100k
   docs;
2. bounded candidate counts — sig-level band candidates stay ≤
   Σ bucket² over capped buckets, far below doc-level quadratic;
3. bounded wall-time — the full operator (signatures + band join +
   verification) completes in seconds on 100k docs, which it cannot
   do if any stage degraded to doc-level pair work.

Identical-signature doc pairs are *output*, not *work*: enumerating
them is inherently quadratic in group size (a 12.8k-dup group IS 82M
pairs), so the scale path for exact-dup-heavy corpora is group-level
dedup (dedup_exact / dedup_components), and this test exercises the
operator with threshold > 1.0 — the branch that returns only
cross-signature pairs — to measure the machinery without asking for
a combinatorially large output.
"""

import math
import time

from pyspark.sql import functions as F

from etl_mp_transactions_spark.operators import textdedup

N_DOCS = 100_000
N_DISTINCT = 2_000
ZIPF_S = 1.0


def _zipf_corpus(spark):
    """100k docs over 2000 distinct texts, group sizes ~ Zipf(s=1):
    rank-1 text ≈ 12.8k copies, median rank a handful. Texts share a
    15-token prefix (so signatures are close and band buckets get hot
    across DIFFERENT signatures — the adversarial part) plus 3 unique
    tokens per rank (so signatures are distinct across ranks)."""
    weights = [1.0 / (r + 1) ** ZIPF_S for r in range(N_DISTINCT)]
    total = sum(weights)
    cum, acc = [], 0.0
    for w in weights:
        acc += w / total
        cum.append(acc)
    common = " ".join(f"w{i}" for i in range(15))
    base = [f"{common} u{r}a u{r}b u{r}c" for r in range(N_DISTINCT)]
    rows = []
    rank = 0
    for i in range(N_DOCS):
        u = (i + 0.5) / N_DOCS
        while cum[rank] < u:
            rank += 1
        rows.append((i, base[rank]))
    assert rank == N_DISTINCT - 1, "inverse-CDF walk must exhaust all ranks"
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_zipf_skew_band_join_bounded(spark):
    docs = _zipf_corpus(spark)
    t0 = time.time()

    # 1) distinct-signature collapse: 100k docs -> exactly 2000 sigs
    sig = textdedup.minhash_signatures(docs)
    hcols = [F.col(f"h{i}").cast("string") for i in range(textdedup.NUM_HASHES)]
    sigk = sig.withColumn("sk", F.md5(F.concat_ws(",", *hcols)))
    n_sigs = sigk.select("sk").distinct().count()
    # ≤: identical texts MUST share a signature (the collapse). A few
    # distinct-but-close texts (J≈0.71 here) legitimately agree on all
    # 16 minhashes (P≈0.005/pair) and merge — estimator semantics, so
    # tolerate ~2% merging but fail if collapse stopped working.
    assert N_DISTINCT * 0.9 <= n_sigs <= N_DISTINCT

    # 2) candidate-count ceiling: band candidates over distinct sigs,
    # with the default cap, stay below cap-bounded quadratic-in-sigs —
    # and orders of magnitude below doc-level pair counts
    cap = 2048
    uniq = sigk.dropDuplicates(["sk"])
    bands = uniq.select(
        "sk",
        F.explode(
            F.array(*[F.col(f"band_{b}") for b in range(textdedup.NUM_BANDS)])
        ).alias("band_key"),
    )
    bucket_sizes = [r["n"] for r in bands.groupBy("band_key").agg(
        F.count("*").alias("n")).collect()]
    ceiling = sum(min(n, cap) * (min(n, cap) - 1) // 2 for n in bucket_sizes)
    n_cand = (
        bands.select(F.col("sk").alias("sk_a"), "band_key")
        .join(bands.select(F.col("sk").alias("sk_b"), "band_key"), "band_key")
        .filter(F.col("sk_a") < F.col("sk_b"))
        .select("sk_a", "sk_b").distinct().count()
    )
    assert n_cand <= ceiling
    # sig-level candidates must be ≪ doc-level quadratic (100k² / 2);
    # with 2000 sigs the hard ceiling is 2000*1999/2
    assert n_cand <= N_DISTINCT * (N_DISTINCT - 1) // 2

    # 3) full operator wall-time on all 100k docs (cross-sig branch):
    # every stage — signatures, band join, zip_with verification,
    # doc expansion — runs; only the combinatorial identical-pair
    # enumeration is excluded (threshold > 1 selects the cross branch)
    n_cross = textdedup.minhash_lsh_pairs(docs, threshold=1.01).count()
    assert n_cross == 0  # est_jaccard can never exceed 1.0
    elapsed = time.time() - t0
    # quadratic degradation would put this in hours; the linear path
    # runs in well under a minute even on the 4-thread test session
    assert elapsed < 180, f"skew stress took {elapsed:.0f}s — quadratic blowup?"

    # sanity on the fixture itself: the skew is real (hot group ≈
    # N/H_K, i.e. thousands of identical docs)
    hot = docs.groupBy("text").count().agg(F.max("count")).collect()[0][0]
    assert hot > N_DOCS / (math.log(N_DISTINCT) + 1) / 2
