"""Dedup-family registry queries: exact, MinHash+LSH, SimHash, n-gram
Jaccard (SURVEY.md §2.9) — every one with a full DuckDB oracle, made
possible by md5-derived portable hashing (operators/textdedup.py).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_mp_transactions_spark.operators import containment, textdedup
from etl_mp_transactions_spark.registry import query
from etl_mp_transactions_spark.sources.tables import load_table

# shared oracle fragments — single source for every hash recipe; the
# composed-pipeline oracle (queries/curation.py) imports these, so a
# change here propagates to every oracle that embeds the stage
def _toks(src: str = "documents") -> str:
    return (
        "SELECT doc_id, list_distinct(string_split_regex(text, '\\s+'))"
        f" AS tokens FROM {src}"
    )


_TOKS = _toks()
_HASH = "('0x' || substr(md5(tok || '#' || {seed}), 1, 8))::BIGINT"
# minhash family i = 32-bit chunk (i%4) of digest md5(tok||'#'||i//4)
_MH_HASH = "('0x' || substr(md5(tok || '#' || (h // 4)), 1 + 8 * (h % 4), 8))::BIGINT"


def minhash_band_ctes(src: str = "documents") -> str:
    """CTE chain `toks → tok → hashes → sigs → bands → cand` computing
    16-perm minhash signatures + 2×8 LSH band candidates over ``src``
    (which must expose doc_id + text). Callers append their own WITH
    prefix and SELECT."""
    return f"""toks AS ({_toks(src)}),
    tok AS (SELECT doc_id, unnest(tokens) AS tok FROM toks),
    hashes AS (
      SELECT doc_id, h, MIN({_MH_HASH}) AS mh
      FROM tok, unnest(generate_series(0, 15)) AS t(h)
      GROUP BY doc_id, h
    ),
    sigs AS (SELECT doc_id, list(mh ORDER BY h) AS sig FROM hashes GROUP BY doc_id),
    bands AS (
      SELECT doc_id, sig, b,
             md5(array_to_string(sig[1 + 8*b : 8 + 8*b], ',')) AS band_key
      FROM sigs, unnest([0, 1]) AS t(b)
    ),
    cand AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM bands a
      JOIN bands b ON a.band_key = b.band_key AND a.doc_id < b.doc_id
    )"""


@query(
    "dedup_exact",
    """
    SELECT md5(text) AS content_hash,
           MIN(doc_id) AS canonical_doc_id,
           COUNT(*) AS n_copies
    FROM documents
    GROUP BY md5(text)
    """,
)
def dedup_exact(spark, sf_dir):
    """Exact dedup: content-hash groupBy, first-doc-wins. One shuffle
    on a uniform hash key — the 100 TB-safe shape."""
    return textdedup.exact_dedup(load_table(spark, sf_dir, "documents"))


@query(
    "dedup_minhash_lsh",
    f"""
    WITH {minhash_band_ctes("documents")}
    SELECT c.doc_a, c.doc_b,
           len(list_filter(generate_series(1, 16), i -> sa.sig[i] = sb.sig[i])) / 16.0
             AS est_jaccard
    FROM cand c
    JOIN sigs sa ON sa.doc_id = c.doc_a
    JOIN sigs sb ON sb.doc_id = c.doc_b
    WHERE len(list_filter(generate_series(1, 16), i -> sa.sig[i] = sb.sig[i])) / 16.0 >= 0.9
    """,
)
def dedup_minhash_lsh(spark, sf_dir):
    """MinHash (16 perms) + LSH (2 bands × 8 rows) near-dup pairs at
    est-Jaccard ≥ 0.9. shingle→minhash→band→bucket-join, all in
    codegen; the only shuffles are the signature groupBy and the band
    self-join."""
    return textdedup.minhash_lsh_pairs(
        load_table(spark, sf_dir, "documents"), threshold=0.9
    )


_SIMHASH_CTE = f"""
    WITH toks AS ({_TOKS}),
    tok AS (SELECT doc_id, unnest(tokens) AS tok FROM toks),
    h AS (SELECT doc_id, {_HASH.format(seed="0")} AS h FROM tok),
    bits AS (
      SELECT doc_id, j, SUM((h >> j) & 1) AS ones, COUNT(*) AS n
      FROM h, unnest(generate_series(0, 31)) AS t(j)
      GROUP BY doc_id, j
    ),
    s AS (
      SELECT doc_id,
             SUM(CASE WHEN ones * 2 > n THEN (1::BIGINT << j) ELSE 0 END)::BIGINT
               AS simhash
      FROM bits GROUP BY doc_id
    )"""


@query(
    "dedup_simhash",
    f"""
    {_SIMHASH_CTE}
    SELECT doc_id, simhash FROM s
    """,
)
def dedup_simhash(spark, sf_dir):
    """32-bit SimHash fingerprints (majority vote over token-hash
    bits) — the constant-size signature for hamming-distance near-dup."""
    return textdedup.simhash_fingerprints(load_table(spark, sf_dir, "documents"))


@query(
    "dedup_simhash_hamming",
    f"""
    {_SIMHASH_CTE}
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           bit_count(xor(a.simhash, b.simhash))::INT AS hamming
    FROM s a JOIN s b ON a.doc_id < b.doc_id
    WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
    """,
)
def dedup_simhash_hamming(spark, sf_dir):
    """SimHash near-dup pairs at hamming ≤ 3 via pigeonhole banding
    (4 bit-chunks; a qualifying pair must agree exactly on ≥1 chunk) —
    the quadratic stage runs per-chunk at the distinct-fingerprint
    level, never all-pairs. The oracle does the O(n²) join directly."""
    return textdedup.simhash_hamming_pairs(
        load_table(spark, sf_dir, "documents"), max_hamming=3
    )


@query(
    "dedup_ngram_jaccard",
    """
    WITH toks AS (
      SELECT doc_id, lang, source,
             list_distinct(string_split_regex(text, '\\s+')) AS tokens
      FROM documents
    )
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           len(list_intersect(a.tokens, b.tokens))::DOUBLE
             / len(list_distinct(list_concat(a.tokens, b.tokens))) AS jaccard
    FROM toks a
    JOIN toks b ON a.lang = b.lang AND a.source = b.source AND a.doc_id < b.doc_id
    WHERE len(list_intersect(a.tokens, b.tokens))::DOUBLE
            / len(list_distinct(list_concat(a.tokens, b.tokens))) >= 0.9
    """,
)
def dedup_ngram_jaccard(spark, sf_dir):
    """Exact unigram-set Jaccard ≥ 0.9 over (lang, source)-blocked
    pairs — the verification stage behind LSH candidates; blocking
    bounds the O(n²) pair count at scale."""
    return textdedup.ngram_jaccard_pairs(
        load_table(spark, sf_dir, "documents"), threshold=0.9
    )


@query(
    "dedup_incremental_new_vs_old",
    f"""
    WITH {minhash_band_ctes("documents")},
    exact AS (
      SELECT n.doc_id, min(o.doc_id) AS matched_old_id
      FROM documents n JOIN documents o
        ON md5(n.text) = md5(o.text)
       AND n.doc_id % 5 = 0 AND o.doc_id % 5 <> 0
      GROUP BY n.doc_id
    ),
    nearc AS (
      SELECT DISTINCT bn.doc_id AS new_id, bo.doc_id AS old_id
      FROM bands bn JOIN bands bo ON bn.band_key = bo.band_key
      WHERE bn.doc_id % 5 = 0 AND bo.doc_id % 5 <> 0
    ),
    near AS (
      SELECT c.new_id AS doc_id, min(c.old_id) AS matched_old_id
      FROM nearc c
      JOIN sigs sa ON sa.doc_id = c.new_id
      JOIN sigs sb ON sb.doc_id = c.old_id
      WHERE len(list_filter(generate_series(1, 16),
                            i -> sa.sig[i] = sb.sig[i])) / 16.0 >= 0.9
        AND c.new_id NOT IN (SELECT doc_id FROM exact)
      GROUP BY c.new_id
    )
    SELECT doc_id, 'exact' AS dup_kind, matched_old_id FROM exact
    UNION ALL
    SELECT doc_id, 'near' AS dup_kind, matched_old_id FROM near
    ORDER BY doc_id
    """,
)
def dedup_incremental_new_vs_old(spark, sf_dir):
    """Incremental ingest dedup — the shape a continuously-crawled
    corpus actually runs: dedupe the NEW batch (doc_id % 5 = 0, the
    arriving 20%) against the EXISTING corpus, never the corpus
    against itself. Two stages, each work-proportional to the BATCH:
    exact content-hash equi-join (uniform md5 key), then MinHash band
    join restricted to new-vs-old pairs AT THE DISTINCT-SIGNATURE
    LEVEL — identical-signature matches resolve by a plain sk join
    (est ≡ 1.0, no verification), cross-signature candidates band-join
    distinct signatures with a per-bucket cap, and doc-level results
    re-expand through hash joins on sk. The doc-level band join this
    replaced measured 546s at sf1 on the dup-heavy scale corpus
    (buckets hold doc COPIES, so candidates went quadratic); the
    signature-level join re-measured 11.3s (1.6x at the 10x step) — the same
    distinct-signature-collapse lesson dedup_minhash_lsh encodes. At
    100 TB the old side's signature/band table is the persisted index
    a crawler maintains incrementally. Exact matches are excluded
    from the near stage (anti-join), and each flagged doc reports its
    smallest matching old doc id for canonical attribution."""
    docs = load_table(spark, sf_dir, "documents")
    is_new = F.col("doc_id") % 5 == 0
    newd = docs.filter(is_new).select(
        "doc_id", F.md5("text").alias("ch")
    )
    oldd = docs.filter(~is_new).select(
        F.col("doc_id").alias("old_id"), F.md5("text").alias("ch")
    )
    exact = newd.join(oldd, "ch").groupBy("doc_id").agg(
        F.min("old_id").alias("matched_old_id")
    )

    sig = textdedup.minhash_signatures(docs)
    hcols = [F.col(f"h{i}").cast("string") for i in range(16)]
    sigk = sig.withColumn("sk", F.md5(F.concat_ws(",", *hcols)))
    sig_arr = F.array(*[F.col(f"h{i}") for i in range(16)])
    old_m = sigk.filter(~is_new).select(
        "sk", F.col("doc_id").alias("old_id")
    )
    # identical-signature new-vs-old matches: est = 16/16, always >= t
    ident_min = old_m.groupBy("sk").agg(
        F.min("old_id").alias("ident_old")
    )
    # cross-signature candidates at the DISTINCT-SIGNATURE level (the
    # dedup_minhash_lsh lesson: dup-heavy corpora collapse by orders
    # of magnitude before any band join — the raw doc-level band join
    # measured 546s at sf1, the signature-level one is corpus-linear)
    uniq_new = sigk.filter(is_new).dropDuplicates(["sk"]).select(
        "sk", sig_arr.alias("sig"), "band_0", "band_1"
    )
    uniq_old = sigk.filter(~is_new).dropDuplicates(["sk"]).select(
        F.col("sk").alias("osk"),
        sig_arr.alias("osig"),
        "band_0",
        "band_1",
    )
    bandx = F.explode(F.array("band_0", "band_1")).alias("band_key")
    bn = uniq_new.select("sk", "sig", bandx)
    bo = uniq_old.select("osk", "osig", bandx)
    # per-bucket cap per side, LOUD on overflow: the oracle joins
    # uncapped, so a dropped row would be a silent divergence — the
    # default mode raises instead (textdedup.capped_bucket; honest
    # buckets are far below 2048, production adversarial corpora can
    # opt into on_overflow="drop" bounded loss)
    cap = 2048
    bn = textdedup.capped_bucket(bn, "band_key", "sk", cap)
    bo = textdedup.capped_bucket(bo, "band_key", "osk", cap)
    agree = F.size(
        F.filter(
            F.expr("zip_with(sig, osig, (a, b) -> a = b)"),
            lambda x: x,
        )
    )
    cross = (
        bn.join(bo, "band_key")
        .filter(F.col("sk") != F.col("osk"))
        .dropDuplicates(["sk", "osk"])
        .withColumn("est", agree / F.lit(16.0))
        .filter(F.col("est") >= 0.9)
        .select("sk", "osk")
    )
    cross_min = (
        cross.join(
            old_m.select(F.col("sk").alias("osk"), "old_id"), "osk"
        )
        .groupBy("sk")
        .agg(F.min("old_id").alias("cross_old"))
    )
    near_sk = (
        sigk.filter(is_new)
        .select("doc_id", "sk")
        .join(ident_min, "sk", "left")
        .join(cross_min, "sk", "left")
        .select(
            "doc_id",
            F.least(
                F.coalesce("ident_old", "cross_old"),
                F.coalesce("cross_old", "ident_old"),
            ).alias("matched_old_id"),
        )
        .filter(F.col("matched_old_id").isNotNull())
    )
    near = near_sk.join(exact.select("doc_id"), "doc_id", "left_anti")
    return (
        exact.select(
            "doc_id", F.lit("exact").alias("dup_kind"), "matched_old_id"
        )
        .unionByName(
            near.select(
                "doc_id",
                F.lit("near").alias("dup_kind"),
                "matched_old_id",
            )
        )
        .orderBy("doc_id")
    )


@query(
    "dedup_containment_nearsubset",
    """
    WITH toks AS (
      SELECT doc_id, lang, source,
             list_distinct(string_split_regex(text, '\\s+')) AS tokens
      FROM documents
    ),
    pairs AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             CAST(len(list_intersect(a.tokens, b.tokens)) AS BIGINT)
               AS inter,
             CAST(len(a.tokens) AS BIGINT) AS na,
             CAST(len(b.tokens) AS BIGINT) AS nb
      FROM toks a
      JOIN toks b ON a.lang = b.lang AND a.source = b.source
                 AND a.doc_id < b.doc_id
    )
    SELECT doc_a, doc_b,
           inter * 1000000 // na AS containment_a_ppm,
           inter * 1000000 // nb AS containment_b_ppm
    FROM pairs
    WHERE inter * 10 >= na * 9 OR inter * 10 >= nb * 9
    """,
)
def dedup_containment_nearsubset(spark, sf_dir):
    """Near-SUBSET duplication: containment C(A|B) = |A∩B| / |A| ≥
    0.9 in either direction over (lang, source)-blocked pairs — the
    asymmetric measure that catches a document embedded inside a
    longer one, which symmetric Jaccard structurally misses (a 100-
    token doc inside a 1000-token doc has J ≈ 0.1 but C = 1.0; this
    is how benchmark pages hide inside crawl dumps). The threshold
    compares as the exact rational 10·inter ≥ 9·|A| — no float
    anywhere; outputs are floor-ppm. The pair stage runs at the
    DISTINCT-TOKEN-SET level (set id = md5 of the sorted token
    array): identical sets resolve to containment 1.0 with no
    verification; cross-set pairs come from the ADAPTIVE engine in
    operators/containment.py — a dictionary-bitmap popcount blocked
    join when block vocabularies are small (this corpus family:
    ~31-token blocks, where the TRUE answer is dense — measured
    output grows ~102× at a 10× data step, so pair enumeration is
    output-bound and the win is a ~free per-pair verify plus a G×G
    grid split for task parallelism) and an asymmetric PPJoin
    prefix inverted index for Zipfian vocabularies (lossless:
    inter ≥ ⌈0.9·ns⌉ forces a shared token among the smaller side's
    rarest ns − ⌈0.9·ns⌉ + 1; length-ratio pruning stays unsound for
    containment, the prefix bound is the sound replacement). Both
    paths are exact and pinned equal by tests; doc pairs re-expand
    through hash joins with orientation-correct ppm values. Lineage
    at the 10× step on the dup-heavy scale corpus: doc-level blocked
    join 57.7s / 21.3× → r7 set-level blocked join 20.4s / 4.6× →
    adaptive bitmap pair stage 12.7s / 1.47x (BENCH_SCALE_r8.json)."""
    docs = load_table(spark, sf_dir, "documents")
    toks, sets = containment.doc_token_sets(docs)
    members = toks.select("lang", "source", "sid", "doc_id")
    # identical token sets: containment 1.0 both ways, no verify
    same = (
        members.select("lang", "source", "sid", F.col("doc_id").alias("doc_a"))
        .join(
            members.select(
                "lang", "source", "sid", F.col("doc_id").alias("doc_b")
            ),
            ["lang", "source", "sid"],
        )
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select(
            "doc_a",
            "doc_b",
            F.lit(1000000).cast("bigint").alias("containment_a_ppm"),
            F.lit(1000000).cast("bigint").alias("containment_b_ppm"),
        )
    )
    # adaptive pair stage: dictionary-bitmap popcount on small-vocab
    # blocks, asymmetric prefix index on Zipfian vocabularies — both
    # exact; see operators/containment.py
    setpairs = containment.containment_set_pairs(sets)
    ma = members.select(
        "lang", "source", F.col("sid").alias("sid_a"), F.col("doc_id").alias("da")
    )
    mb = members.select(
        "lang", "source", F.col("sid").alias("sid_b"), F.col("doc_id").alias("db")
    )
    cross = (
        setpairs.join(ma, ["lang", "source", "sid_a"])
        .join(mb, ["lang", "source", "sid_b"])
        .select(
            F.least("da", "db").alias("doc_a"),
            F.greatest("da", "db").alias("doc_b"),
            # orientation: containment_a belongs to doc_a's set
            F.when(
                F.col("da") < F.col("db"),
                F.expr("div(inter * 1000000, na)"),
            )
            .otherwise(F.expr("div(inter * 1000000, nb)"))
            .alias("containment_a_ppm"),
            F.when(
                F.col("da") < F.col("db"),
                F.expr("div(inter * 1000000, nb)"),
            )
            .otherwise(F.expr("div(inter * 1000000, na)"))
            .alias("containment_b_ppm"),
        )
    )
    return same.unionByName(cross)
