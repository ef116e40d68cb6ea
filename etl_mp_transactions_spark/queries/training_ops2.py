"""Training-data curation batch 5 (SURVEY.md §2.9): corpus-fit
n-gram language-model quality scoring, temperature-weighted source
mixture sampling, and space-filling-curve layout keys.

All three are LLM-pipeline staples the reference lacks (its only
text scoring is the per-pair TF-IDF of src/ai.py:21-25); each is
expressed relationally so the DuckDB oracle checks exact values.

Float policy (r12): LM log-probs are exactmath integer-ln nano terms
multiplied by exact int64 counts and summed as BIGINTs — order-free
and transcendental-free (PORTABILITY.md); the reported average is one
final deterministic division rounded to 9 dp. All counts stay BIGINT
end-to-end.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from etl_mp_transactions_spark.functions.exactmath import ln_nano_sql
from etl_mp_transactions_spark.queries.ivfpq_q import materialize_ctes
from etl_mp_transactions_spark.registry import query
from etl_mp_transactions_spark.sources.tables import load_table


def _word_bigrams(text_col: Column) -> Column:
    """All adjacent whitespace-token bigrams (occurrences, NOT
    distinct — LM counts need the multiset), as 'w1 w2' strings."""
    words = F.split(text_col, r"\s+")
    glen = F.greatest(F.size(words) - 1, F.lit(0))
    return F.zip_with(
        F.slice(words, 1, glen),
        F.slice(words, 2, glen),
        lambda a, b: F.concat(a, F.lit(" "), b),
    )


@query(
    "ngram_lm_quality",
    materialize_ctes(rf"""
    WITH toks AS (
      SELECT doc_id, string_split_regex(text, '\s+') AS words
      FROM documents
    ),
    occ AS (
      SELECT doc_id, g.gram AS gram, count(*)::BIGINT AS c
      FROM (SELECT doc_id,
                   list_transform(generate_series(1, len(words) - 1),
                                  i -> words[i] || ' ' || words[i + 1])
                     AS grams
            FROM toks), unnest(grams) AS g(gram)
      GROUP BY 1, 2
    ),
    model AS (
      SELECT gram, split_part(gram, ' ', 1) AS w1, sum(c)::BIGINT AS cg
      FROM occ GROUP BY 1, 2
    ),
    ctx AS (SELECT w1, sum(cg)::BIGINT AS cw FROM model GROUP BY 1),
    v AS (
      SELECT count(DISTINCT u.token)::BIGINT AS vocab
      FROM toks, unnest(words) AS u(token)
    )
    SELECT o.doc_id,
           sum(o.c)::BIGINT AS n_bigrams,
           sum(o.c * ({ln_nano_sql("m.cg + 1", "duck")}
                      - {ln_nano_sql("x.cw + v.vocab", "duck")}))
             // sum(o.c) AS avg_logprob_nano
    FROM occ o
    JOIN model m USING (gram)
    JOIN ctx x ON m.w1 = x.w1
    CROSS JOIN v
    GROUP BY o.doc_id
    """),
)
def ngram_lm_quality(spark, sf_dir):
    """Perplexity-proxy quality score: fit a bigram LM on the corpus
    itself (add-one smoothing, P(w2|w1) = (C(w1 w2)+1)/(C(w1·)+V))
    and score each document by its mean bigram log-probability —
    gibberish/boilerplate scores far below fluent text. The KenLM
    step of production pipelines, reduced to exact relational algebra.

    Scale shape: one shuffle to count (doc, gram) occurrences, one
    gram-keyed agg for the model (vocab²-bounded, ≪ corpus), and a
    scalar-vocab broadcast crossJoin. The left-context table is
    VOCABULARY-sized — it grows with the corpus, so it is NOT
    broadcast-hinted (ADVICE r4): the ctx join runs as a hash join on
    w1, co-partitionable with the model's gram→w1 derivation. The
    scoring join is gram-partitioned — corpus-linear, and a hot gram
    contributes one model row, not a pair blowup."""
    docs = load_table(spark, sf_dir, "documents")
    occ = (
        docs.select(
            "doc_id", F.explode(_word_bigrams(F.col("text"))).alias("gram")
        )
        .groupBy("doc_id", "gram")
        .agg(F.count("*").alias("c"))
    )
    model = occ.groupBy("gram").agg(
        F.sum("c").alias("cg")
    ).withColumn("w1", F.substring_index(F.col("gram"), " ", 1))
    ctx = model.groupBy("w1").agg(F.sum("cg").alias("cw"))
    vocab = (
        docs.select(
            F.explode(F.split(F.col("text"), r"\s+")).alias("token")
        )
        .agg(F.count_distinct("token").alias("vocab"))
    )
    # per-bigram log-prob as an exactmath nano integer: the per-doc
    # accumulation becomes an exact BIGINT sum — order-independent
    # AND transcendental-free (previously a float ln() sum)
    term = F.col("c") * F.expr(
        f"({ln_nano_sql('cg + 1', 'spark')}"
        f" - {ln_nano_sql('cw + vocab', 'spark')})"
    )
    return (
        occ.join(model.select("gram", "cg", "w1"), "gram")
        .join(ctx, "w1")
        .crossJoin(F.broadcast(vocab))
        .withColumn("__term", term)
        .groupBy("doc_id")
        .agg(
            F.sum("c").alias("n_bigrams"),
            # exact nano integer mean log-prob (r15 float purge):
            # BIGINT term sum, one trunc-div (negative-safe — both
            # engines truncate toward zero)
            F.expr("div(sum(__term), sum(c))").alias(
                "avg_logprob_nano"
            ),
        )
    )


def _mix_rate_ctes(engine: str) -> str:
    """Shared-text all-integer temperature-mix rate table (r15 float
    purge): sqrt weights via the bigratio even-shift reduction +
    exact integer sqrt (micro units), exact BIGINT weight total
    (order-free), the per-source rate as a nano integer through the
    pow10 ladder, capped at 1e9. The keep predicate then becomes the
    EXACT integer comparison h·1e9 < rate_nano·2^32 — the sampled
    row set is engine-identical by construction, not merely
    1-ulp-improbable."""
    from etl_mp_transactions_spark.functions.bigratio import (
        isqrt_sql,
        pow10_sql,
        ratio_pow10_sql,
        red_cols,
        red_cols_even,
    )

    d = "//" if engine == "duck" else "div"
    if engine == "duck":
        v = "CAST(n_docs AS HUGEINT) * 1000000000000"
        dd = "CAST(z_micro AS HUGEINT) * n_docs"
    else:
        v = (
            "CAST(n_docs AS DECIMAL(14,0))"
            " * CAST(1000000000000 AS DECIMAL(13,0))"
        )
        dd = (
            "CAST(z_micro AS DECIMAL(18,0))"
            " * CAST(n_docs AS DECIMAL(14,0))"
        )
    vr = red_cols_even("v", "v", engine)
    drc = red_cols("dd", "dd", engine)
    rate = ratio_pow10_sql(
        "(200 * wgt_micro)",
        "greatest(dd_hi, 1)",
        "(9 - dd_sh)",
        engine,
        e_min=-18,
        e_max=9,
    )
    return f"""
    w0 AS (SELECT source, n_docs, {v} AS v FROM n),
    w1 AS (
      SELECT source, n_docs,
             {vr[0][1]} AS v_hi, {vr[1][1]} AS v_sh
      FROM w0
    ),
    w AS (
      SELECT source, n_docs,
             {isqrt_sql("v_hi", engine)}
               * {pow10_sql(f"v_sh {d} 2", engine)} AS wgt_micro
      FROM w1
    ),
    z AS (SELECT CAST(sum(wgt_micro) AS BIGINT) AS z_micro FROM w),
    dn AS (
      SELECT source, n_docs, wgt_micro, {dd} AS dd
      FROM w CROSS JOIN z
    ),
    drd AS (
      SELECT source, n_docs, wgt_micro,
             {drc[0][1]} AS dd_hi, {drc[1][1]} AS dd_sh
      FROM dn
    ),
    r AS (
      SELECT source, n_docs,
             least(1000000000, {rate}) AS rate_nano
      FROM drd
    )"""


@query(
    "source_temperature_mix",
    materialize_ctes(f"""
    WITH n AS (
      SELECT source, count(*)::BIGINT AS n_docs FROM documents GROUP BY 1
    ),{_mix_rate_ctes("duck")}
    SELECT d.doc_id, d.source, r.rate_nano AS sampling_rate_nano
    FROM documents d JOIN r ON d.source = r.source
    WHERE ('0x' || substr(md5(d.doc_id::VARCHAR || ':mix-seed-1'), 1, 8))::BIGINT
          * 1000000000 < r.rate_nano * 4294967296
    """),
)
def source_temperature_mix(spark, sf_dir):
    """Temperature-weighted source mixture (T=0.5, target 200 docs):
    per-source keep rate ∝ n_s^T / n_s, so small sources are
    up-weighted relative to their share — the standard multilingual /
    multi-source rebalancing step. Membership is a salted content
    hash (reproducible across runs, engines, partitionings), never
    rand().

    Scale: the rate table is one tiny per-source agg broadcast back;
    the keep decision is map-only. r15 float purge: the rate is an
    exact nano integer (_mix_rate_ctes) and the keep predicate is the
    exact integer comparison h·1e9 < rate_nano·2^32 — the sampled row
    set is engine-identical by CONSTRUCTION, not merely
    1-ulp-improbable."""
    docs = load_table(spark, sf_dir, "documents")
    n = docs.groupBy("source").agg(F.count("*").alias("n_docs"))
    n.createOrReplaceTempView("n")
    r = spark.sql(
        "WITH " + _mix_rate_ctes("spark").lstrip() + " SELECT * FROM r"
    )
    h = F.conv(
        F.substring(
            F.md5(
                F.concat(F.col("doc_id").cast("string"), F.lit(":mix-seed-1"))
            ),
            1,
            8,
        ),
        16,
        10,
    ).cast("bigint")
    return (
        docs.join(F.broadcast(r.select("source", "rate_nano")), "source")
        .filter(h * F.lit(1000000000) < F.col("rate_nano") * F.lit(4294967296))
        .select(
            "doc_id",
            "source",
            F.col("rate_nano").alias("sampling_rate_nano"),
        )
    )


def zorder_key(x: Column, y: Column, bits: int = 10) -> Column:
    """Morton interleave of two `bits`-bit columns (x even positions,
    y odd) — statically unrolled so the whole key is one codegen'd
    expression, no higher-order functions."""
    z = F.lit(0).cast("bigint")
    for i in range(bits):
        z = (
            z
            + F.shiftleft(F.shiftright(x, i).bitwiseAND(F.lit(1)), 2 * i)
            + F.shiftleft(F.shiftright(y, i).bitwiseAND(F.lit(1)), 2 * i + 1)
        )
    return z


@query(
    "zorder_curve_key",
    """
    SELECT event_id,
           user_id % 1024 AS x,
           event_id % 1024 AS y,
           list_sum(list_transform(generate_series(0, 9),
             i -> (((user_id % 1024 >> i) & 1) << (2 * i))
                + (((event_id % 1024 >> i) & 1) << (2 * i + 1))))::BIGINT
             AS zkey
    FROM events
    """,
)
def zorder_curve_key(spark, sf_dir):
    """Z-order (Morton) curve key over two dimensions — the layout
    primitive behind multi-column data clustering: range-partitioning
    and sorting by the interleaved key keeps files narrow in BOTH
    dimensions at once, so min/max file pruning works for predicates
    on either column (tests/test_scale_features.py measures the
    locality on real files). Pure bit arithmetic, map-only, identical
    in both engines."""
    ev = load_table(spark, sf_dir, "events")
    x = (F.col("user_id") % 1024).cast("bigint")
    y = (F.col("event_id") % 1024).cast("bigint")
    zkey = zorder_key(x, y, bits=10)
    return ev.select(
        "event_id",
        x.alias("x"),
        y.alias("y"),
        zkey.cast("bigint").alias("zkey"),
    )


@query(
    "text_winnowing",
    r"""
    WITH n AS (
      SELECT doc_id,
             string_split(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')), ' ')
               AS w
      FROM documents
    ),
    h AS (
      SELECT doc_id,
             list_transform(generate_series(1, len(w) - 2),
               i -> ('0x' || substr(md5(w[i] || ' ' || w[i+1] || ' ' || w[i+2]), 1, 8))::BIGINT)
               AS hashes
      FROM n
    ),
    m AS (
      SELECT doc_id,
             list_sort(list_distinct(
               list_transform(generate_series(1, len(hashes) - 3),
                 j -> list_min(hashes[j:j+3])))) AS sel
      FROM h
    )
    SELECT doc_id, len(sel)::BIGINT AS n_selected,
           md5(array_to_string(sel, ',')) AS fp_digest
    FROM m
    """,
)
def text_winnowing(spark, sf_dir):
    """Winnowing rolling-hash fingerprint (MOSS): word 3-shingle
    hashes, window-4 minima, sorted-distinct selection digest — the
    fingerprint family's substring-robust member (two docs sharing a
    long substring share selected hashes; whole-doc md5 shares
    nothing). Map-only expressions; see operators/textstats.
    winnow_fingerprint for the guarantee."""
    from etl_mp_transactions_spark.operators.textstats import winnow_fingerprint

    docs = load_table(spark, sf_dir, "documents")
    return winnow_fingerprint(docs).select("doc_id", "n_selected", "fp_digest")


@query(
    "winnow_candidate_pairs",
    r"""
    WITH n AS (
      SELECT doc_id,
             string_split(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')), ' ')
               AS w
      FROM documents
    ),
    h AS (
      SELECT doc_id,
             list_transform(generate_series(1, len(w) - 2),
               i -> ('0x' || substr(md5(w[i] || ' ' || w[i+1] || ' ' || w[i+2]), 1, 8))::BIGINT)
               AS hashes
      FROM n
    ),
    sel AS (
      SELECT doc_id, unnest(list_distinct(
               list_transform(generate_series(1, len(hashes) - 3),
                 j -> list_min(hashes[j:j+3])))) AS fp
      FROM h
    )
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           count(*)::BIGINT AS shared_fps
    FROM sel a JOIN sel b ON a.fp = b.fp AND a.doc_id < b.doc_id
    GROUP BY 1, 2
    HAVING count(*) >= 3
    """,
)
def winnow_candidate_pairs(spark, sf_dir):
    """The winnowing pipeline's load-bearing step (MOSS candidate
    generation): documents sharing ≥3 selected fingerprints are
    near-dup/plagiarism candidates. Same physical family as the LSH
    band join — explode the selected set, one shuffle on the
    fingerprint key, count per pair — so cost scales with Σ df(fp)²
    over SELECTED hashes only (~1/window of all shingles), not with
    corpus². Downstream exact verification would reuse
    dedup_ngram_jaccard on these pairs."""
    from etl_mp_transactions_spark.operators.textstats import winnow_fingerprint

    docs = load_table(spark, sf_dir, "documents")
    # distinct-signature collapse (the textdedup move): all pair-
    # quadratic work runs on DISTINCT selected-sets, not docs — a
    # dup-heavy corpus (the realistic one; this fixture included)
    # collapses by orders of magnitude before the self-join, and
    # identical-signature doc pairs skip the join entirely (they share
    # exactly n_selected fingerprints by definition).
    # eager localCheckpoint, not .persist(): the selection is reused by
    # five downstream branches, but a registry-level persist leaks
    # cached blocks for the whole session (CacheManager holds DF cache
    # entries until an explicit unpersist no caller can safely place).
    # localCheckpoint materializes once into RDD blocks that the
    # ContextCleaner frees when the result DataFrame is GC'd — same
    # compute-once property, no session-lifetime footprint. (Local-
    # checkpoint blocks are not fault-tolerant to executor loss; for
    # this intra-query reuse a lost block just recomputes the query.)
    docsig = (
        winnow_fingerprint(docs, keep_selected=True)
        .select("doc_id", "fp_digest", "n_selected", "selected")
        .localCheckpoint(eager=True)
    )
    sigs = (
        docsig.groupBy("fp_digest")
        .agg(F.first("selected").alias("selected"), F.first("n_selected").alias("n_selected"))
    )
    sig_sel = sigs.select(
        F.col("fp_digest").alias("sig"), F.explode("selected").alias("fp")
    )
    sa = sig_sel.select(F.col("sig").alias("sig_a"), "fp")
    sb = sig_sel.select(F.col("sig").alias("sig_b"), F.col("fp").alias("fp_b"))
    sig_pairs = (
        sa.join(sb, (F.col("fp") == F.col("fp_b")) & (F.col("sig_a") < F.col("sig_b")))
        .groupBy("sig_a", "sig_b")
        .agg(F.count("*").alias("shared_fps"))
        .filter(F.col("shared_fps") >= 3)
    )
    da = docsig.select(F.col("doc_id").alias("id_a"), F.col("fp_digest").alias("sig_a"))
    db = docsig.select(F.col("doc_id").alias("id_b"), F.col("fp_digest").alias("sig_b"))
    cross = (
        sig_pairs.join(da, "sig_a")
        .join(db, "sig_b")
        .select(
            F.least("id_a", "id_b").alias("doc_a"),
            F.greatest("id_a", "id_b").alias("doc_b"),
            "shared_fps",
        )
    )
    intra = (
        docsig.alias("x")
        .join(
            docsig.alias("y"),
            (F.col("x.fp_digest") == F.col("y.fp_digest"))
            & (F.col("x.doc_id") < F.col("y.doc_id")),
        )
        .filter(F.col("x.n_selected") >= 3)
        .select(
            F.col("x.doc_id").alias("doc_a"),
            F.col("y.doc_id").alias("doc_b"),
            F.col("x.n_selected").alias("shared_fps"),
        )
    )
    return cross.unionByName(intra)
