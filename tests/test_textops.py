"""Dedup + ANN + text-stats operator semantics on constructed inputs
(the testdata corpus has no true duplicates; these do)."""

import pytest
from pyspark.sql import functions as F

from etl_mp_transactions_spark.operators import ann, textdedup, textstats


def _docs(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long")


def test_exact_dedup_groups_identical_texts(spark):
    docs = _docs(spark, [(1, "same text", "en", "s", 9),
                         (2, "same text", "en", "s", 9),
                         (3, "other", "en", "s", 5)])
    out = {r["canonical_doc_id"]: r["n_copies"]
           for r in textdedup.exact_dedup(docs).collect()}
    assert out == {1: 2, 3: 1}


def test_minhash_identical_docs_est_one(spark):
    docs = _docs(spark, [(1, "aa bb cc dd ee ff gg hh", "en", "s", 1),
                         (2, "aa bb cc dd ee ff gg hh", "en", "s", 1),
                         (3, "qq ww rr tt yy uu ii oo", "en", "s", 1)])
    pairs = textdedup.minhash_lsh_pairs(docs, threshold=0.9).collect()
    assert [(p["doc_a"], p["doc_b"], p["est_jaccard"]) for p in pairs] == [(1, 2, 1.0)]


def test_simhash_identical_docs_equal_fingerprints(spark):
    docs = _docs(spark, [(1, "aa bb cc", "en", "s", 1),
                         (2, "aa bb cc", "en", "s", 1),
                         (3, "xx yy zz", "en", "s", 1)])
    fp = {r["doc_id"]: r["simhash"] for r in
          textdedup.simhash_fingerprints(docs).collect()}
    assert fp[1] == fp[2]
    assert fp[1] != fp[3]
    assert 0 <= fp[1] < 2 ** 32


def test_simhash_hamming_pairs_matches_brute_force(spark, sf_dir):
    """Pigeonhole banding must find EVERY pair within max_hamming —
    compare against the all-pairs xor/bit_count join."""
    from etl_mp_transactions_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    banded = {
        (r["doc_a"], r["doc_b"], r["hamming"])
        for r in textdedup.simhash_hamming_pairs(docs, max_hamming=3).collect()
    }
    fp = textdedup.simhash_fingerprints(docs)
    a = fp.select(F.col("doc_id").alias("doc_a"), F.col("simhash").alias("fa"))
    b = fp.select(F.col("doc_id").alias("doc_b"), F.col("simhash").alias("fb"))
    brute = {
        (r["doc_a"], r["doc_b"], r["hamming"])
        for r in a.crossJoin(b)
        .filter(F.col("doc_a") < F.col("doc_b"))
        .withColumn("hamming", F.bit_count(F.expr("fa ^ fb")).cast("int"))
        .filter(F.col("hamming") <= 3)
        .collect()
    }
    assert banded == brute
    assert len(brute) > 0


def test_ngram_jaccard_blocked_pairs(spark):
    docs = _docs(spark, [(1, "aa bb cc dd", "en", "s1", 1),
                         (2, "aa bb cc ee", "en", "s1", 1),
                         (3, "aa bb cc dd", "en", "OTHER", 1)])  # other block
    pairs = textdedup.ngram_jaccard_pairs(docs, threshold=0.5).collect()
    assert [(p["doc_a"], p["doc_b"]) for p in pairs] == [(1, 2)]
    assert pairs[0]["jaccard"] == pytest.approx(3 / 5)


def test_ann_topk_known_geometry(spark):
    vecs = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.9, 0.1]), (3, [0.0, 1.0]), (4, [-1.0, 0.0])],
        "vec_id long, embedding array<float>")
    out = ann.cosine_topk(vecs, k=1).collect()
    best = {r["vec_id"]: r["neighbor_id"] for r in out}
    assert best[1] == 2 and best[2] == 1  # nearest by cosine
    assert best[4] == 3   # -x: least-bad is orthogonal y, not x or near-x


def test_lang_id_markers(spark):
    docs = _docs(spark, [(1, "the cat of the house", "en", "s", 1),
                         (2, "el perro de la casa", "es", "s", 1),
                         (3, "qwerty zxcvb", "zh", "s", 1)])
    out = {r["doc_id"]: r["predicted_lang"]
           for r in textstats.lang_id(docs).collect()}
    assert out == {1: "en", 2: "es", 3: "und"}


def test_quality_monotonic_in_stopwords(spark):
    docs = _docs(spark, [(1, "the of and is a", "en", "s", 1),
                         (2, "zz qq ww ee rr", "en", "s", 1)])
    out = {r["doc_id"]: r["quality"] for r in textstats.quality_score(docs).collect()}
    assert out[1] > out[2]


def test_fingerprint_normalizes(spark):
    docs = _docs(spark, [(1, "Hello,   World!", "en", "s", 1),
                         (2, "hello world", "en", "s", 1)])
    fp = {r["doc_id"]: r["fingerprint"] for r in textstats.fingerprint(docs).collect()}
    assert fp[1] == fp[2]


def test_minhash_band_bucket_cap_bounds_adversarial_corpus(spark):
    # near-identical corpus: every doc shares 40 tokens and adds one
    # unique token, so signatures are distinct-but-close and most pile
    # into a handful of band buckets — the quadratic LSH pathology.
    common = " ".join(f"w{i}" for i in range(40))
    docs = spark.createDataFrame(
        [(i, f"{common} uniq{i}") for i in range(2000)], "doc_id long, text string"
    )
    sig = textdedup.minhash_signatures(docs)
    bucket_sizes = (
        sig.dropDuplicates([f"h{i}" for i in range(16)])  # distinct signatures
        .select(F.explode(F.array("band_0", "band_1")).alias("bk"))
        .groupBy("bk").count()
    )
    max_bucket = bucket_sizes.agg(F.max("count")).collect()[0][0]
    assert max_bucket > 50, "fixture failed to create a pathological bucket"

    # default mode: overflow is LOUD (the oracle joins uncapped, so a
    # silent drop is a silent divergence — capped_bucket policy)
    import pytest

    with pytest.raises(Exception, match="exceeded cap 50"):
        textdedup.minhash_lsh_pairs(
            docs, threshold=0.9, band_bucket_cap=50
        ).collect()
    # opt-in bounded loss: the cap only drops candidates, never
    # invents them
    capped = textdedup.minhash_lsh_pairs(
        docs, threshold=0.9, band_bucket_cap=50, cap_overflow="drop"
    )
    uncapped = textdedup.minhash_lsh_pairs(docs, threshold=0.9, band_bucket_cap=None)
    got_c = {(r["doc_a"], r["doc_b"]) for r in capped.collect()}
    got_u = {(r["doc_a"], r["doc_b"]) for r in uncapped.collect()}
    assert got_c <= got_u


def test_winnowing_shares_hashes_on_common_run(spark):
    """The winnowing guarantee: two documents sharing a long word run
    share at least one selected hash; unrelated documents share none
    (with overwhelming probability at 32-bit hashes)."""
    from etl_mp_transactions_spark.operators.textstats import winnow_fingerprint

    common = "the quick brown fox jumps over the lazy dog again and again"
    docs = spark.createDataFrame(
        [
            (1, f"intro words here {common} closing remark"),
            (2, f"{common} totally different tail content follows now"),
            (3, "unrelated text about database engines and shuffles forever"),
        ],
        "doc_id long, text string",
    )
    # inspect the internal selected sets via the public columns: equal
    # fp_digest is too strong (tails differ), so re-derive the sets
    from pyspark.sql import functions as F

    sel = (
        winnow_fingerprint(docs)
        .select("doc_id", "n_selected", "fp_digest")
        .collect()
    )
    assert all(r.n_selected > 0 for r in sel)

    # set-level assertion through a self-join on exploded minima:
    # recompute with the operator's internals exposed
    norm = F.trim(F.regexp_replace(F.lower(F.col("text")), r"[^a-z0-9]+", " "))
    words = F.split(norm, " ")
    n3 = F.greatest(F.size(words) - 2, F.lit(0))
    sh = F.zip_with(
        F.zip_with(
            F.slice(words, 1, n3), F.slice(words, 2, n3),
            lambda a, b: F.concat(a, F.lit(" "), b),
        ),
        F.slice(words, 3, n3),
        lambda ab, c: F.concat(ab, F.lit(" "), c),
    )
    hashes = docs.select(
        "doc_id",
        F.explode(
            F.transform(
                sh, lambda g: F.conv(F.substring(F.md5(g), 1, 8), 16, 10)
            )
        ).alias("h"),
    )
    a = hashes.alias("a")
    b = hashes.alias("b")
    shared = (
        a.join(b, (F.col("a.h") == F.col("b.h")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy("a.doc_id", "b.doc_id")
        .count()
        .collect()
    )
    got = {(r[0], r[1]) for r in shared}
    assert (1, 2) in got          # common run -> shared shingle hashes
    assert (1, 3) not in got and (2, 3) not in got
