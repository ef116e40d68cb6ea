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


def let1(bound, fn):
    """Let-binding for one expensive sub-expression: evaluate `bound`
    once, reference it many times inside `fn` via a lambda variable.

    Spark has no WITH-expression at the API level, and when a filter on
    a computed column is pushed into a join condition every reference
    re-evaluates the sub-expression (no CSE on interpreted higher-order
    functions). transform() over a 1-element array gives the binding:
    the lambda argument is computed exactly once per row.
    """
    return F.element_at(F.transform(F.array(bound), fn), 1)


def filter_above_join(df: DataFrame, cond) -> DataFrame:
    """Apply a selective filter WITHOUT letting Catalyst push it into
    an upstream join condition.

    For pair-scoring joins the score filter is exactly the expensive
    expression; pushed into a BroadcastHashJoin condition it is
    re-evaluated per probe×bucket row (and interpreted, since
    higher-order functions don't codegen) — measured ~3× slower than
    scoring once above the join. Appending `+ 0*rand(42)` marks the
    predicate nondeterministic, which pins the Filter above the join
    while leaving its value bit-identical (0*rand ≡ 0.0).
    """
    return df.filter(cond | (F.lit(0.0) * F.rand(42) > F.lit(1.0)))


def blocked_pairs(
    df: DataFrame,
    block_cols: tuple[str, ...],
    payload_cols: dict[str, str],
    id_col: str = "doc_id",
) -> DataFrame:
    """Canonical blocked self-join pair generator used by every
    pair-quadratic operator (Jaccard verify, similarity blends,
    edit-distance, TF-IDF scoring).

    payload_cols: {source_col: suffix_base} — each carried column c
    appears as f"{base}_a" / f"{base}_b" on the pair row. Ids appear
    as doc_a/doc_b with doc_a < doc_b.

    The repartition on the block key both co-locates each block and
    acts as a materialization barrier: without it CollapseProject
    inlines upstream per-doc projections (tokenize+hash) into the join
    output and recomputes them per PAIR.
    """
    t = df.select(id_col, *block_cols, *payload_cols).repartition(
        *[F.col(c) for c in block_cols]
    )
    a = t.select(
        F.col(id_col).alias("doc_a"),
        *block_cols,
        *[F.col(c).alias(f"{base}_a") for c, base in payload_cols.items()],
    )
    b = t.select(
        F.col(id_col).alias("doc_b"),
        *[F.col(c).alias(f"__b_{c}") for c in block_cols],
        *[F.col(c).alias(f"{base}_b") for c, base in payload_cols.items()],
    )
    cond = [F.col(c) == F.col(f"__b_{c}") for c in block_cols] + [
        F.col("doc_a") < F.col("doc_b")
    ]
    return a.join(b, cond).drop(*[f"__b_{c}" for c in block_cols])


def tokenize(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Distinct word tokens per doc (the shingle set for unigram J)."""
    return df.withColumn("tokens", F.array_distinct(F.split(F.col(text_col), r"\s+")))


def hashed_token_sets(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Distinct tokens as int64 hashes (md5-derived, portable).

    Set operations over long arrays are far cheaper than over string
    arrays — pair-quadratic stages (Jaccard verification, similarity
    blends) should intersect hashes, not strings. Jaccard over the
    hashed sets equals Jaccard over the token sets absent 32-bit
    collisions inside one pair's union (vanishingly unlikely at
    realistic per-doc vocabulary sizes).
    """
    toks = F.array_distinct(F.split(F.col(text_col), r"\s+"))
    hashed = F.transform(
        toks, lambda t: F.conv(F.substring(F.md5(t), 1, 8), 16, 10).cast("long")
    )
    return df.withColumn("tokens", hashed)


def _hash_expr(tok, seed: int):
    """Portable 32-bit hash: first 8 hex chars of md5(tok ‖ '#' ‖ seed).

    md5 is the one cryptographic hash both Spark and DuckDB expose with
    identical semantics; 8 hex chars keep values positive in an int64.
    """
    return F.conv(
        F.substring(F.md5(F.concat(tok, F.lit(f"#{seed}"))), 1, 8), 16, 10
    ).cast("long")


def minhash_signatures(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """(id, h0..h{K-1}, band_0..band_{B-1}) — one explode + one groupBy.

    Hash family i is chunk (i mod 4) of md5(tok ‖ '#' ‖ i div 4): one
    md5 digest yields four independent 32-bit values, so K hashes cost
    K/4 digests per token — md5 is the dominant cost of the signature
    stage. The digests are projected once before the groupBy so the
    min-aggregates only slice strings.
    """
    toks = tokenize(docs).select(id_col, F.explode("tokens").alias("tok"))
    n_digests = (NUM_HASHES + 3) // 4
    toks = toks.select(
        id_col,
        *[
            F.md5(F.concat(F.col("tok"), F.lit(f"#{g}"))).alias(f"d{g}")
            for g in range(n_digests)
        ],
    )
    # min over the raw hex chunk: lexicographic order of fixed-width
    # lowercase hex == numeric order, so conv() runs once per doc per
    # hash after aggregation instead of once per token per hash
    aggs = [
        F.min(F.substring(F.col(f"d{i // 4}"), 1 + 8 * (i % 4), 8)).alias(f"hx{i}")
        for i in range(NUM_HASHES)
    ]
    sig = toks.groupBy(id_col).agg(*aggs)
    sig = sig.select(
        id_col,
        *[
            F.conv(F.col(f"hx{i}"), 16, 10).cast("long").alias(f"h{i}")
            for i in range(NUM_HASHES)
        ],
    )
    rows = NUM_HASHES // NUM_BANDS
    for b in range(NUM_BANDS):
        cols = [F.col(f"h{i}").cast("string") for i in range(b * rows, (b + 1) * rows)]
        sig = sig.withColumn(f"band_{b}", F.md5(F.concat_ws(",", *cols)))
    return sig


def capped_bucket(
    df: DataFrame,
    bucket_col: str,
    order_col: str,
    cap: int,
    on_overflow: str = "error",
) -> DataFrame:
    """Per-bucket row cap for LSH band joins, with LOUD overflow.

    A band bucket with B rows costs B^2 join work, so callers cap it.
    But the cap exists only on the Spark side — the DuckDB oracles
    join uncapped — so a silently-dropped row is a silent correctness
    divergence at whatever SF first overflows. Two modes:

    - ``on_overflow="error"`` (default): nothing is dropped; any row
      past the cap raises through ``assert_true`` with a message
      naming the fix (raise the cap or switch modes). The cap becomes
      a detector: tested SFs sit far below it, and the first corpus
      that doesn't fails fast instead of diverging.
    - ``on_overflow="drop"``: the documented bounded-loss behavior
      for adversarial production corpora (each bucket keeps its first
      ``cap`` rows in deterministic ``order_col`` order; rows past it
      lose only that band's candidacy — other bands still vote).
    """
    from pyspark.sql.window import Window

    w = Window.partitionBy(bucket_col).orderBy(order_col)
    pos = df.withColumn("_bpos", F.row_number().over(w))
    if on_overflow == "drop":
        out = pos.filter(F.col("_bpos") <= cap)
    elif on_overflow == "error":
        out = pos.filter(
            F.assert_true(
                F.col("_bpos") <= F.lit(cap),
                F.lit(
                    f"LSH band bucket exceeded cap {cap}: candidates"
                    " would be silently lost vs the uncapped oracle;"
                    " raise the cap or pass on_overflow='drop'"
                ),
            ).isNull()
        )
    else:
        raise ValueError(
            f"unknown on_overflow mode {on_overflow!r}"
            " (expected 'error' or 'drop')"
        )
    return out.drop("_bpos")


def minhash_lsh_pairs(
    docs: DataFrame,
    threshold: float = 0.9,
    id_col: str = "doc_id",
    band_bucket_cap: int = 2048,
    cap_overflow: str = "error",
) -> DataFrame:
    """Near-dup candidate pairs with estimated Jaccard ≥ threshold.

    est_jaccard = fraction of agreeing minhashes (exact n/K fraction —
    deterministic across engines). Band self-join generates candidates;
    signature agreement verifies them.

    Scale shape: all pair-quadratic work (band join, zip_with verify)
    runs at the DISTINCT-SIGNATURE level, not the doc level. Dup-heavy
    corpora collapse massively there (sf0.1: 5000 docs → 2249 sigs,
    2.55M doc-level band candidates → ~10⁴ sig-level ones). Identical-
    signature pairs need no verification (est ≡ 1.0); qualifying
    cross-signature pairs expand back to doc pairs via hash joins on
    the signature key — codegen-friendly, no per-pair array work, and
    no final pair-level dropDuplicates shuffle (each doc has exactly
    one signature, so expanded pairs are unique by construction).

    band_bucket_cap bounds the pathological case — a band bucket with
    B distinct signatures costs B² join work, and an adversarial
    near-identical corpus can put ALL signatures in one bucket. Each
    bucket keeps only its first `cap` signatures (row_number over the
    deterministic sk order), so per-bucket work is ≤ cap² no matter
    the corpus. The default cap is far above any honest bucket
    (sf0.1 max observed: 79). With cap_overflow="error" (default) the
    cap is a DETECTOR: overflow raises via capped_bucket instead of
    silently diverging from the uncapped oracle; pass
    cap_overflow="drop" for the bounded-loss production behavior
    (rows past the cap lose only that band's candidacy — other bands
    still vote; identical-signature pairs are unaffected, handled
    before banding).
    """
    sig = minhash_signatures(docs, id_col)
    hcols = [F.col(f"h{i}").cast("string") for i in range(NUM_HASHES)]
    sigk = sig.withColumn("sk", F.md5(F.concat_ws(",", *hcols)))
    # The signature table is referenced ~8x below (members twice per
    # pair side, uniq for bands and sigs) and Catalyst does not reuse
    # the groupBy subtree across those branches: without a cut the
    # tokenize->md5->min-agg chain (and the upstream scan) re-executes
    # per reference. localCheckpoint materializes the K+2-column
    # signature rows once per CALL (inside the timed region — nothing
    # survives across invocations); LAZY since r16 (first consumer
    # job materializes it; saves the blocking materialization job,
    # A-B-A neutral at sf0.1). At 100 TB this is the guide-§8
    # "lightweight proxy" table (~150 B/doc, no text); on a real
    # cluster prefer a reliable checkpoint dir over executor-local
    # blocks.
    sigk = sigk.localCheckpoint(eager=False)
    members = sigk.select("sk", F.col(id_col))
    uniq = sigk.dropDuplicates(["sk"])

    # 1) identical-signature pairs: all 16 hashes agree, est ≡ 1.0
    same = (
        members.select("sk", F.col(id_col).alias("doc_a"))
        .join(members.select("sk", F.col(id_col).alias("doc_b")), "sk")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b", F.lit(1.0).alias("est_jaccard"))
    )

    # 2) cross-signature candidates: band join over distinct signatures
    # (a doc pair shares a band iff its signatures do, so sig-level
    # candidacy is exactly doc-level candidacy)
    bands = uniq.select(
        "sk",
        F.explode(
            F.array(*[F.col(f"band_{b}") for b in range(NUM_BANDS)])
        ).alias("band_key"),
    )
    if band_bucket_cap is not None:
        bands = capped_bucket(
            bands, "band_key", "sk", band_bucket_cap, cap_overflow
        )
    cand = (
        bands.select(F.col("sk").alias("sk_a"), "band_key")
        .join(bands.select(F.col("sk").alias("sk_b"), "band_key"), "band_key")
        .filter(F.col("sk_a") < F.col("sk_b"))
        .select("sk_a", "sk_b")
        .dropDuplicates(["sk_a", "sk_b"])
    )
    sigs = uniq.select(
        "sk", F.array(*[F.col(f"h{i}") for i in range(NUM_HASHES)]).alias("sig")
    )
    # no broadcast hint: distinct-signature cardinality scales with the
    # corpus (could be billions at 100 TB) — AQE broadcasts it anyway
    # when it's actually small, and falls back to a shuffle join when
    # it isn't
    cand = cand.join(
        sigs.select(F.col("sk").alias("sk_a"), F.col("sig").alias("sig_a")), "sk_a"
    ).join(
        sigs.select(F.col("sk").alias("sk_b"), F.col("sig").alias("sig_b")), "sk_b"
    )
    matches = F.size(
        F.filter(F.zip_with("sig_a", "sig_b", lambda x, y: x == y), lambda v: v)
    )
    qual = filter_above_join(
        cand.withColumn("est_jaccard", matches / F.lit(float(NUM_HASHES))),
        F.col("est_jaccard") >= threshold,
    ).select("sk_a", "sk_b", "est_jaccard")

    # 3) expand qualifying signature pairs back to doc pairs; docs from
    # different signatures, so least/greatest restores doc_a < doc_b
    cross = (
        qual.join(
            members.select(F.col("sk").alias("sk_a"), F.col(id_col).alias("da")),
            "sk_a",
        )
        .join(
            members.select(F.col("sk").alias("sk_b"), F.col(id_col).alias("db")),
            "sk_b",
        )
        .select(
            F.least("da", "db").alias("doc_a"),
            F.greatest("da", "db").alias("doc_b"),
            "est_jaccard",
        )
    )
    if threshold <= 1.0:
        return same.unionAll(cross)
    return cross


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


def simhash_fingerprints(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """32-bit SimHash per doc: majority vote of token-hash bits.

    Explodes (token × bit) — 32× amplification, but it's an int-only
    map stage feeding one groupBy(doc); at scale this beats wide
    32-aggregate rows on shuffle size.
    """
    toks = tokenize(docs).select(id_col, F.explode("tokens").alias("tok"))
    h = toks.withColumn("h", _hash_expr(F.col("tok"), 0))
    bits = h.select(
        id_col, "h", F.explode(F.sequence(F.lit(0), F.lit(31))).alias("j")
    ).withColumn("bit", F.expr("shiftright(h, j) & 1"))
    per_bit = bits.groupBy(id_col, "j").agg(
        F.sum("bit").alias("ones"), F.count("*").alias("n")
    )
    return per_bit.groupBy(id_col).agg(
        F.sum(
            F.when(F.col("ones") * 2 > F.col("n"), F.expr("shiftleft(1L, j)")).otherwise(
                F.lit(0).cast("long")
            )
        ).alias("simhash")
    )


def simhash_hamming_pairs(
    docs: DataFrame, max_hamming: int = 3, id_col: str = "doc_id"
) -> DataFrame:
    """Near-dup pairs with hamming(simhash_a, simhash_b) ≤ max_hamming.

    Scale shape (pigeonhole banding, the standard SimHash dedup index):
    split the 32-bit fingerprint into (max_hamming+1) chunks — any pair
    within distance k must agree EXACTLY on at least one chunk, so the
    quadratic stage is a per-chunk equality self-join, never all-pairs.
    As with MinHash LSH, the band join and xor/bit_count verification
    run at the DISTINCT-fingerprint level; identical-fingerprint pairs
    (hamming 0) and verified cross-fingerprint pairs expand back to doc
    pairs via hash joins on the fingerprint value.
    """
    fp = simhash_fingerprints(docs, id_col)  # (id_col, simhash)
    uniq = fp.select("simhash").distinct()

    # 1) identical fingerprints: hamming ≡ 0
    same = (
        fp.select("simhash", F.col(id_col).alias("doc_a"))
        .join(fp.select("simhash", F.col(id_col).alias("doc_b")), "simhash")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b", F.lit(0).cast("int").alias("hamming"))
    )

    # 2) cross-fingerprint candidates: agree on ≥1 of k+1 bit-chunks
    nchunks = max_hamming + 1
    width = 32 // nchunks
    widths = [width + (1 if c < 32 % nchunks else 0) for c in range(nchunks)]
    offs = [sum(widths[:c]) for c in range(nchunks)]
    chunk_structs = F.array(
        *[
            F.struct(
                F.lit(c).alias("c"),
                (
                    F.shiftright(F.col("simhash"), offs[c])
                    % F.lit(2 ** widths[c])
                ).alias("v"),
            )
            for c in range(nchunks)
        ]
    )
    chunks = uniq.select("simhash", F.explode(chunk_structs).alias("ch")).select(
        "simhash", F.col("ch.c").alias("c"), F.col("ch.v").alias("v")
    )
    cand = (
        chunks.select(F.col("simhash").alias("fa"), "c", "v")
        .join(chunks.select(F.col("simhash").alias("fb"), "c", "v"), ["c", "v"])
        .filter(F.col("fa") < F.col("fb"))
        .select("fa", "fb")
        .dropDuplicates(["fa", "fb"])
    )
    qual = cand.withColumn(
        "hamming", F.bit_count(F.expr("fa ^ fb")).cast("int")
    ).filter(F.col("hamming") <= max_hamming)

    # 3) expand back to doc pairs
    cross = (
        qual.join(fp.select(F.col("simhash").alias("fa"), F.col(id_col).alias("da")), "fa")
        .join(fp.select(F.col("simhash").alias("fb"), F.col(id_col).alias("db")), "fb")
        .select(
            F.least("da", "db").alias("doc_a"),
            F.greatest("da", "db").alias("doc_b"),
            "hamming",
        )
    )
    return same.unionAll(cross)


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
    pairs = blocked_pairs(
        hashed_token_sets(docs), block_cols, {"tokens": "tok"}
    )
    # Length-ratio prefilter: J(A,B) ≤ min(|A|,|B|)/max(|A|,|B|), so a
    # pair whose size ratio is below threshold can't qualify. Integer
    # comparison only — pushes into the join and prunes most pairs
    # before the O(|A|+|B|) intersect (1e-9 slack keeps it strictly
    # conservative under fp rounding; results provably unchanged).
    pairs = pairs.filter(
        F.least(F.size("tok_a"), F.size("tok_b")).cast("double")
        >= F.lit(threshold - 1e-9) * F.greatest(F.size("tok_a"), F.size("tok_b"))
    )
    # |A∪B| = |A|+|B|-|A∩B| for distinct arrays, and the intersect is
    # let-bound so the threshold filter (which Catalyst pushes into the
    # join condition) still computes it once per pair
    sizes = F.size("tok_a") + F.size("tok_b")
    jac = let1(
        F.size(F.array_intersect("tok_a", "tok_b")),
        lambda i: i / (sizes - i),
    )
    return filter_above_join(
        pairs.withColumn("jaccard", jac), F.col("jaccard") >= threshold
    ).select("doc_a", "doc_b", "jaccard")
