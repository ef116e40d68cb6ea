"""Corpus retrieval / statistics operators: BM25 relevance scoring,
PMI collocation mining, and tokenizer-vocabulary coverage curves
(SURVEY.md §2.9 training-pipeline extensions — the IR/statistics side
of corpus curation; no reference counterpart, north-star additions).

Exactness design (shared with stats.py / graph.py): every statistic is
derived from exact BIGINT counts (tf, df, N, doc length, bigram
counts); the only float operations are final ratios/logs applied to
identical operands in the same expression shape in both engines, then
rounded to 12 digits — far above 1-ulp engine noise, far below any
semantic tolerance for a relevance score or a PMI value.

Scale shape:
- BM25 filters the exploded token stream to the literal query-term set
  *before* any shuffle, so the per-(doc,term) aggregation state is
  |terms|·|matching docs|, not corpus-sized; the df/idf side is
  |terms| rows (broadcast); the doc-length side is one map-side
  column. One corpus scan, two small shuffles.
- PMI shuffles unigram and bigram counts on the word keys (uniform
  hash keys); the count tables join on w1/w2 without broadcast —
  vocabulary-sized tables must shuffle-join, not broadcast (the
  ngram_lm_quality lesson, ADVICE r4). Scalar totals ride a
  single-row broadcast (documented-acceptable class).
- vocab_coverage runs one global window over the *vocabulary* (not
  the corpus): Heaps' law makes |vocab| ≈ O(corpus^0.5), so the
  single-partition rank is bounded; at true 100 TB scale swap it for
  the two-phase range-partitioned cumulative sum (repartitionByRange
  on (n DESC, word) + per-partition offsets) — same results, noted
  here so the single window is a measured choice, not an oversight.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from etl_mp_transactions_spark.functions.exactmath import ln_nano_sql
from etl_mp_transactions_spark.queries.ivfpq_q import materialize_ctes
from etl_mp_transactions_spark.registry import query
from etl_mp_transactions_spark.sources.tables import load_table

# Fixed retrieval query for the BM25 demo — literal in both engines.
BM25_TERMS = ["hash", "join", "stream", "vector"]
BM25_K1 = 1.2
BM25_B = 0.75

_TERMS_SQL = ", ".join(f"'{t}'" for t in BM25_TERMS)

# r15 float purge: the BM25 term score is an exact rational once the
# denominators are cleared — with k1 = 6/5, b = 3/4 and scale S = 10,
#   s = idf·tf·(k1+1)/(tf + k1(1-b) + k1·b·dl·N/sumdl)
#     = (S·(k1+1)·tf·idf_nano·sumdl)
#       / (S·tf·sumdl + S·k1(1-b)·sumdl + S·k1·b·dl·N)   [nano units]
# i.e. num = 22·tf·idf_nano·sumdl over D = 10·tf·sumdl + 3·sumdl
# + 9·dl·N — all exact integers. The per-doc score is then an exact
# BIGINT sum of term scores (order-free: integer addition commutes),
# which retires the r13 ordered-float-fold workaround entirely.
from fractions import Fraction as _Fr

_S = 10
assert (_Fr(_S) * _Fr(6, 5) * _Fr(1, 4)).denominator == 1
_C_NUM = int(_Fr(_S) * (_Fr(6, 5) + 1))        # 22
_C_TF = _S                                     # 10
_C_CONST = int(_Fr(_S) * _Fr(6, 5) * _Fr(1, 4))  # 3
_C_DL = int(_Fr(_S) * _Fr(6, 5) * _Fr(3, 4))   # 9


def _bm25_tail(engine: str) -> str:
    from etl_mp_transactions_spark.functions.bigratio import (
        ratio_pow10_sql,
        red_cols,
    )

    if engine == "duck":
        big_num = (
            f"CAST({_C_NUM} * tf * idf_nano AS HUGEINT) * sum_dl"
        )
        big_d = (
            f"CAST({_C_TF} * tf AS HUGEINT) * sum_dl"
            f" + CAST({_C_CONST} AS HUGEINT) * sum_dl"
            f" + CAST({_C_DL} AS HUGEINT) * dl * n_docs"
        )
    else:
        big_num = (
            f"CAST({_C_NUM} * tf * idf_nano AS DECIMAL(16,0))"
            f" * CAST(sum_dl AS DECIMAL(16,0))"
        )
        big_d = (
            f"CAST({_C_TF} * tf AS DECIMAL(8,0))"
            f" * CAST(sum_dl AS DECIMAL(16,0))"
            f" + CAST({_C_CONST} AS DECIMAL(2,0))"
            f" * CAST(sum_dl AS DECIMAL(16,0))"
            f" + CAST({_C_DL} * dl AS DECIMAL(12,0))"
            f" * CAST(n_docs AS DECIMAL(14,0))"
        )
    nr = red_cols("num0", "nm", engine)
    dr = red_cols("den0", "dn", engine)
    return f"""
    big AS (
      SELECT doc_id, term, {big_num} AS num0, {big_d} AS den0
      FROM scored0
    ),
    redd AS (
      SELECT doc_id, term,
             {nr[0][1]} AS nm_hi, {nr[1][1]} AS nm_sh,
             {dr[0][1]} AS dn_hi, {dr[1][1]} AS dn_sh
      FROM big
    ),
    sterm AS (
      SELECT doc_id,
             {ratio_pow10_sql("nm_hi", "greatest(dn_hi, 1)",
                              "(nm_sh - dn_sh)", engine,
                              e_min=-18, e_max=18)} AS s_nano
      FROM redd
    ),
    folded AS (
      SELECT doc_id, CAST(sum(s_nano) AS BIGINT) AS bm25_nano
      FROM sterm GROUP BY doc_id
    )
    SELECT doc_id, bm25_nano
    FROM folded
    ORDER BY bm25_nano DESC, doc_id LIMIT 20
    """


def _tokens_expr():
    """lower → split on whitespace → drop empties (the corpus-wide
    tokenization contract shared with text.py / breadth3.py)."""
    return F.filter(
        F.split(F.lower(F.col("text")), r"\s+"), lambda x: x != F.lit("")
    )


@query(
    "bm25_scoring",
    materialize_ctes(rf"""
    WITH toks AS (
      SELECT doc_id,
             list_filter(string_split_regex(lower(text), '\s+'),
                         x -> x <> '') AS l
      FROM documents
    ),
    dl AS (SELECT doc_id, len(l)::BIGINT AS dl FROM toks),
    corpus AS (
      SELECT count(*)::BIGINT AS n_docs,
             sum(dl)::BIGINT AS sum_dl
      FROM dl
    ),
    tf AS (
      SELECT doc_id, t AS term, count(*)::BIGINT AS tf
      FROM (SELECT doc_id, unnest(l) AS t FROM toks)
      WHERE t IN ({_TERMS_SQL})
      GROUP BY doc_id, t
    ),
    df AS (
      SELECT term, count(DISTINCT doc_id)::BIGINT AS df
      FROM tf GROUP BY term
    ),
    scored0 AS (
      SELECT tf.doc_id, tf.term, tf.tf, dl.dl, c.n_docs, c.sum_dl,
             ({ln_nano_sql("2 * c.n_docs + 2", "duck")}
               - {ln_nano_sql("2 * df.df + 1", "duck")}) AS idf_nano
      FROM tf
      JOIN df ON tf.term = df.term
      JOIN dl ON tf.doc_id = dl.doc_id
      CROSS JOIN corpus c
    ),{_bm25_tail("duck")}
    """),
)
def bm25_scoring(spark, sf_dir):
    """Okapi BM25 top-20 docs for a fixed query-term set.

    Plan: one corpus scan → token explode filtered to the 4 literal
    terms *inside the projection* (the post-explode filter keeps only
    query-term rows, so the (doc,term) agg and everything downstream
    is tiny) → broadcast the |terms|-row df table and the single-row
    corpus stats → TakeOrderedAndProject for the top-k.
    """
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select("doc_id", _tokens_expr().alias("l"))
    dl = toks.select("doc_id", F.size("l").cast("long").alias("dl"))
    corpus = dl.agg(
        F.count("*").alias("n_docs"), F.sum("dl").alias("sum_dl")
    )
    tf = (
        toks.select("doc_id", F.explode("l").alias("term"))
        .filter(F.col("term").isin(BM25_TERMS))
        .groupBy("doc_id", "term")
        .agg(F.count("*").alias("tf"))
    )
    df = tf.groupBy("term").agg(
        F.count_distinct("doc_id").alias("df")
    )
    # idf = ln(1+(N-df+.5)/(df+.5)) == ln((2N+2)/(2df+1)): exactmath
    # integer-ln difference; the term score is the exact cleared-
    # denominator rational (module block comment) through bigratio —
    # no float op anywhere (r15 float purge)
    scored0 = (
        tf.join(F.broadcast(df), "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(corpus))
        .select(
            "doc_id", "term", "tf", "dl", "n_docs", "sum_dl",
            F.expr(
                f"({ln_nano_sql('2 * n_docs + 2', 'spark')}"
                f" - {ln_nano_sql('2 * df + 1', 'spark')})"
            ).alias("idf_nano"),
        )
    )
    scored0.createOrReplaceTempView("scored0")
    return spark.sql("WITH " + _bm25_tail("spark").lstrip())


@query(
    "pmi_collocations",
    rf"""
    WITH toks AS (
      SELECT doc_id,
             list_filter(string_split_regex(lower(text), '\s+'),
                         x -> x <> '') AS l
      FROM documents
    ),
    uni AS (
      SELECT t AS w, count(*)::BIGINT AS n
      FROM (SELECT unnest(l) AS t FROM toks) GROUP BY t
    ),
    tot AS (
      SELECT sum(n)::BIGINT AS n_uni,
             (SELECT count(*) FROM (
                SELECT unnest(list_zip(l[1:length(l)-1], l[2:length(l)]))
                FROM toks WHERE length(l) >= 2))::BIGINT AS n_bi
      FROM uni
    ),
    bi AS (
      SELECT z[1] AS w1, z[2] AS w2, count(*)::BIGINT AS n_xy
      FROM (SELECT unnest(list_zip(l[1:length(l)-1], l[2:length(l)])) AS z
            FROM toks WHERE length(l) >= 2)
      GROUP BY 1, 2
      HAVING count(*) >= 5
    ),
    sc AS (
      SELECT w1, w2, n_xy,
             ({ln_nano_sql("n_xy", "duck")}
              + 2 * {ln_nano_sql("t.n_uni", "duck")}
              - {ln_nano_sql("t.n_bi", "duck")}
              - {ln_nano_sql("u1.n", "duck")}
              - {ln_nano_sql("u2.n", "duck")}) AS pmi_nano
      FROM bi
      JOIN uni u1 ON bi.w1 = u1.w
      JOIN uni u2 ON bi.w2 = u2.w
      CROSS JOIN tot t
    )
    SELECT w1, w2, n_xy, pmi_nano
    FROM sc
    ORDER BY pmi_nano DESC, w1, w2
    LIMIT 20
    """,
)
def pmi_collocations(spark, sf_dir):
    """Top-20 pointwise-mutual-information word collocations
    (min support 5) — the phrase-mining step of tokenizer/vocab
    construction (word2phrase, NPMI collocation extraction).

    Plan: one corpus scan builds unigram and bigram count tables
    (uniform word-hash shuffle keys); bigrams shuffle-join the
    vocabulary-sized unigram table on w1 then w2 — deliberately NOT
    broadcast (vocab grows with the corpus; the ngram_lm_quality
    lesson); scalar totals are a single-row broadcast. Top-k is
    TakeOrderedAndProject.
    """
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(_tokens_expr().alias("l"))
    uni = (
        toks.select(F.explode("l").alias("w"))
        .groupBy("w")
        .agg(F.count("*").alias("n"))
    )
    pairs = toks.filter(F.size("l") >= 2).select(
        F.explode(
            F.zip_with(
                F.slice("l", 1, F.size("l") - 1),
                F.slice("l", 2, F.size("l") - 1),
                lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
            )
        ).alias("z")
    )
    bi = (
        pairs.select("z.w1", "z.w2")
        .groupBy("w1", "w2")
        .agg(F.count("*").alias("n_xy"))
        .filter(F.col("n_xy") >= 5)
    )
    tot = uni.agg(F.sum("n").alias("n_uni")).crossJoin(
        pairs.agg(F.count("*").alias("n_bi"))
    )
    u1 = uni.select(F.col("w").alias("w1"), F.col("n").alias("n1"))
    u2 = uni.select(F.col("w").alias("w2"), F.col("n").alias("n2"))
    # pmi = ln(n_xy·n_uni² / (n_bi·n1·n2)) as an exact nano integer
    # (five exactmath integer-ln terms — no engine ln(); the factors
    # are kept separate so every ln argument stays < 2^50)
    pmi_nano = F.expr(
        f"({ln_nano_sql('n_xy', 'spark')}"
        f" + 2 * {ln_nano_sql('n_uni', 'spark')}"
        f" - {ln_nano_sql('n_bi', 'spark')}"
        f" - {ln_nano_sql('n1', 'spark')}"
        f" - {ln_nano_sql('n2', 'spark')})"
    )
    return (
        bi.join(u1, "w1")
        .join(u2, "w2")
        .crossJoin(F.broadcast(tot))
        .select("w1", "w2", "n_xy", pmi_nano.alias("pmi_nano"))
        .orderBy(F.desc("pmi_nano"), "w1", "w2")
        .limit(20)
    )


VOCAB_KS = [5, 10, 20, 100, 1000]
_KS_SQL = ", ".join(str(k) for k in VOCAB_KS)


@query(
    "vocab_coverage",
    rf"""
    WITH toks AS (
      SELECT unnest(list_filter(string_split_regex(lower(text), '\s+'),
                                x -> x <> '')) AS t
      FROM documents
    ),
    uni AS (SELECT t AS w, count(*)::BIGINT AS n FROM toks GROUP BY t),
    ranked AS (
      SELECT w, n,
             row_number() OVER (ORDER BY n DESC, w) AS rk,
             sum(n) OVER (ORDER BY n DESC, w
                          ROWS BETWEEN UNBOUNDED PRECEDING
                          AND CURRENT ROW)::BIGINT AS cum_n,
             sum(n) OVER ()::BIGINT AS total_n,
             count(*) OVER ()::BIGINT AS vocab_size
      FROM uni
    )
    SELECT rk AS k, cum_n, vocab_size,
           (cum_n * 1000000) // total_n AS coverage_ppm
    FROM ranked WHERE rk IN ({_KS_SQL}) OR rk = vocab_size
    """,
)
def vocab_coverage(spark, sf_dir):
    """Tokenizer-vocabulary coverage curve: for vocab sizes K on a
    log-ish grid (plus the full-vocabulary row, coverage = 1.0), the
    fraction of all corpus tokens covered by the K most frequent words
    (the sizing curve behind choosing a tokenizer vocab / OOV budget).

    The rank runs over the *vocabulary* (Heaps-sublinear but still
    millions of terms at 100 TB), so it executes as the two-phase
    range-partitioned rank+cumsum in ONE pass
    (operators/distranks.global_order_stats) — no single-partition
    window; totals ride a single-row scalar broadcast.
    """
    from etl_mp_transactions_spark.operators.distranks import (
        global_order_stats,
    )

    docs = load_table(spark, sf_dir, "documents")
    uni = (
        docs.select(F.explode(_tokens_expr()).alias("w"))
        .groupBy("w")
        .agg(F.count("*").alias("n"))
    )
    totals = uni.agg(
        F.sum("n").alias("total_n"),
        F.count("*").alias("vocab_size"),
    )
    ranked = global_order_stats(
        uni,
        [F.desc("n"), F.asc("w")],
        {"k": F.lit(1), "cum_n": F.col("n")},
    ).crossJoin(F.broadcast(totals))
    return ranked.filter(
        F.col("k").isin(VOCAB_KS) | (F.col("k") == F.col("vocab_size"))
    ).select(
        "k",
        "cum_n",
        "vocab_size",
        # exact ppm, never a rounded double on the result path (r15
        # float purge); ceiling cum_n·1e6 < 2^63 ⇒ ≤ 9.2e12 tokens,
        # documented in PORTABILITY.md
        F.expr("div(cum_n * 1000000, total_n)").alias("coverage_ppm"),
    )
