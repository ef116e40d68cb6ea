"""Text-analysis registry queries (SURVEY.md §2.9): language ID,
quality scoring, token counting, fingerprinting — all oracle-checked.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_mp_transactions_spark.operators import textstats
from etl_mp_transactions_spark.registry import query
from etl_mp_transactions_spark.sources.tables import load_table


def _markers_sql(lang: str) -> str:
    ws = ", ".join(f"'{w}'" for w in textstats.LANG_MARKERS[lang])
    return (
        f"len(list_filter(string_split_regex(text, '\\s+'),"
        f" t -> list_contains([{ws}], t)))"
    )


_LANGS = list(textstats.LANG_MARKERS)
_SCORES = ",\n           ".join(f"{_markers_sql(l)} AS score_{l}" for l in _LANGS)
_BEST = "greatest(" + ", ".join(f"score_{l}" for l in _LANGS) + ")"
_PRED = (
    "CASE WHEN " + _BEST + " = 0 THEN 'und' "
    + " ".join(f"WHEN score_{l} = {_BEST} THEN '{l}'" for l in _LANGS)
    + " END"
)


@query(
    "text_lang_id",
    f"""
    SELECT doc_id, lang, {_PRED} AS predicted_lang,
           score_en, score_es, score_de, score_fr, score_zh
    FROM (SELECT doc_id, lang, {_SCORES} FROM documents)
    """,
)
def text_lang_id(spark, sf_dir):
    """Language ID via marker-stopword argmax — map-only scan."""
    docs = load_table(spark, sf_dir, "documents")
    out = textstats.lang_id(docs)
    return out.select(
        "doc_id", "lang", "predicted_lang", *[f"score_{l}" for l in _LANGS]
    )


_STOPS = ", ".join(f"'{w}'" for w in textstats.STOPWORDS)

# single-source quality blend (imported by queries/curation.py so the
# composed-pipeline oracle can never drift from this per-stage one)
QUALITY_SQL = f"""0.4 * (CASE WHEN n_tokens = 0 THEN NULL
                       ELSE stop_n::DOUBLE / n_tokens END)
             + 0.3 * least(n_tokens / 100.0, 1.0)
             + 0.3 * (1.0 - CASE WHEN text_len = 0 THEN NULL
                                 ELSE punct::DOUBLE / text_len END)"""

QUALITY_FEATURES_SQL = f"""SELECT *,
             len(string_split_regex(text, '\\s+')) AS n_tokens,
             length(text) AS text_len,
             len(regexp_extract_all(text, '[^\\w\\s]')) AS punct,
             len(list_filter(string_split_regex(text, '\\s+'),
                             t -> list_contains([{_STOPS}], t))) AS stop_n"""


@query(
    "text_quality",
    f"""
    WITH t AS (
      {QUALITY_FEATURES_SQL} FROM (SELECT doc_id, text FROM documents)
    )
    SELECT doc_id, n_tokens,
           CASE WHEN n_tokens = 0 THEN NULL
                ELSE (text_len - (n_tokens - 1))::DOUBLE / n_tokens END AS mean_token_len,
           CASE WHEN n_tokens = 0 THEN NULL
                ELSE stop_n::DOUBLE / n_tokens END AS stopword_ratio,
           CASE WHEN text_len = 0 THEN NULL
                ELSE punct::DOUBLE / text_len END AS punct_ratio,
           {QUALITY_SQL} AS quality
    FROM t
    """,
)
def text_quality(spark, sf_dir):
    """Quality features + blended score per document."""
    docs = load_table(spark, sf_dir, "documents")
    return textstats.quality_score(docs).select(
        "doc_id", "n_tokens", "mean_token_len", "stopword_ratio", "punct_ratio",
        "quality",
    )


@query(
    "text_token_counts",
    """
    SELECT doc_id,
           len(string_split_regex(text, '\\s+')) AS ws_tokens,
           len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')) AS bpe_tokens
    FROM documents
    """,
)
def text_token_counts(spark, sf_dir):
    """Whitespace + BPE-ish token counting."""
    return textstats.token_counts(load_table(spark, sf_dir, "documents")).select(
        "doc_id", "ws_tokens", "bpe_tokens"
    )


@query(
    "text_fingerprint",
    """
    SELECT doc_id,
           md5(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'))) AS fingerprint
    FROM documents
    """,
)
def text_fingerprint(spark, sf_dir):
    """Canonical-form md5 fingerprint per document."""
    return textstats.fingerprint(load_table(spark, sf_dir, "documents")).select(
        "doc_id", "fingerprint"
    )


@query(
    "text_top_terms",
    """
    SELECT tok, COUNT(*) AS n_docs
    FROM (SELECT doc_id, unnest(list_distinct(string_split_regex(text, '\\s+'))) AS tok
          FROM documents)
    GROUP BY tok
    ORDER BY n_docs DESC, tok
    LIMIT 20
    """,
)
def text_top_terms(spark, sf_dir):
    """Document-frequency top terms (the corpus-level IDF build side —
    generalization of C11's vectorizer fit, SURVEY §2.6)."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        F.explode(F.array_distinct(F.split("text", r"\s+"))).alias("tok")
    )
    return (
        toks.groupBy("tok")
        .agg(F.count("*").alias("n_docs"))
        .orderBy(F.desc("n_docs"), "tok")
        .limit(20)
    )


@query(
    "text_chunking",
    """
    SELECT doc_id,
           ((s - 1) // 8)::BIGINT AS chunk_idx,
           array_to_string(toks[s : s + 15], ' ') AS chunk_text,
           len(toks[s : s + 15])::BIGINT AS n_chunk_tokens
    FROM (
      SELECT doc_id, string_split_regex(text, '\\s+') AS toks FROM documents
    ), unnest(generate_series(1, greatest(len(toks), 1), 8)) AS t(s)
    """,
)
def text_chunking(spark, sf_dir):
    """Overlapping token-window chunking (16-token windows, stride 8)
    — map-only explode, the LLM-pretraining preprocessing step."""
    docs = load_table(spark, sf_dir, "documents")
    return textstats.chunk_documents(
        docs, chunk_tokens=16, stride=8
    ).select("doc_id", "chunk_idx", "chunk_text", "n_chunk_tokens")


@query(
    "sequence_packing",
    """
    SELECT doc_id, source, n_tokens,
           ((cum_incl - n_tokens) // 2048)::BIGINT AS bin_id
    FROM (
      SELECT doc_id, source,
             len(string_split_regex(text, '\\s+'))::BIGINT AS n_tokens,
             SUM(len(string_split_regex(text, '\\s+')))
               OVER (PARTITION BY source ORDER BY doc_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_incl
      FROM documents
    )
    """,
)
def sequence_packing(spark, sf_dir):
    """Greedy contiguous sequence packing into 2048-token bins per
    source — one window sum, the fixed-context batch-building step."""
    docs = load_table(spark, sf_dir, "documents")
    return textstats.pack_sequences(docs, budget=2048, by="source").select(
        "doc_id", "source", "n_tokens", "bin_id"
    )


RAKE_STOPS = ("a", "the", "and", "of", "to", "in", "value", "table", "row")
RAKE_TOP = 15
_RAKE_STOP_SQL = ", ".join(f"'{w}'" for w in RAKE_STOPS)


@query(
    "text_rake_keywords",
    f"""
    WITH toks AS (
      SELECT doc_id, string_split(lower(text), ' ') AS ws
      FROM documents
    ),
    pos AS (
      SELECT doc_id, u.i, toks.ws[u.i] AS w
      FROM toks, unnest(generate_series(1, len(ws))) AS u(i)
      WHERE toks.ws[u.i] <> ''
    ),
    nonstop AS (
      SELECT doc_id, i, w,
             i - row_number() OVER (PARTITION BY doc_id ORDER BY i)
               AS grp
      FROM pos WHERE w NOT IN ({_RAKE_STOP_SQL})
    ),
    phrases AS (
      SELECT doc_id, grp,
             string_agg(w, ' ' ORDER BY i) AS phrase,
             CAST(count(*) AS BIGINT) AS plen
      FROM nonstop GROUP BY doc_id, grp
    ),
    pwords AS (
      SELECT p.phrase, p.plen, u.w
      FROM phrases p, unnest(string_split(p.phrase, ' ')) AS u(w)
    ),
    stats AS (
      SELECT w, CAST(count(*) AS BIGINT) AS freq,
             CAST(sum(plen) AS BIGINT) AS degree
      FROM pwords GROUP BY w
    ),
    scored AS (
      SELECT pw.phrase,
             CAST(sum(s.degree * 1000000000 // s.freq) AS BIGINT)
               AS score_nano
      FROM (SELECT DISTINCT phrase FROM phrases) dp
      JOIN pwords pw ON pw.phrase = dp.phrase
      JOIN stats s ON s.w = pw.w
      GROUP BY pw.phrase
      -- a distinct phrase's words counted once per occurrence IN the
      -- phrase: pwords repeats per (doc, grp) occurrence, so divide
      -- by the occurrence count
    ),
    occ AS (
      SELECT phrase, CAST(count(*) AS BIGINT) AS n_occurrences
      FROM phrases GROUP BY phrase
    )
    SELECT s.phrase AS phrase, o.n_occurrences,
           s.score_nano // o.n_occurrences AS score_nano
    FROM scored s JOIN occ o ON o.phrase = s.phrase
    ORDER BY score_nano DESC, s.phrase
    LIMIT {RAKE_TOP}
    """,
)
def text_rake_keywords(spark, sf_dir):
    """RAKE keyword extraction (Rose et al. 2010, public): candidate
    phrases are maximal stopword-free token runs (gaps-and-islands
    per doc: island id = position − non-stop row_number, a per-doc
    partitioned window), each word scores degree/freq (degree =
    Σ length of phrases containing it), and a phrase scores the sum
    of its word scores. Scores are exact nano-unit integers (floor
    division — the picorank policy); the per-occurrence word sum for
    a repeated phrase divides back by its occurrence count, so the
    result is occurrence-invariant. The stoplist is corpus-
    appropriate (the fixture's high-frequency function-ish tokens).
    Scale: corpus-linear explodes + uniform-key groupBys; the only
    global step is the top-{RAKE_TOP} TakeOrdered."""
    docs = load_table(spark, sf_dir, "documents")
    pos = docs.select(
        "doc_id",
        F.posexplode(F.split(F.lower("text"), " ")).alias("i0", "w"),
    ).filter(F.col("w") != "").select(
        "doc_id", (F.col("i0") + 1).alias("i"), "w"
    )
    from pyspark.sql import Window

    wdoc = Window.partitionBy("doc_id").orderBy("i")
    nonstop = pos.filter(~F.col("w").isin(*RAKE_STOPS)).withColumn(
        "grp", F.col("i") - F.row_number().over(wdoc)
    )
    phrases = nonstop.groupBy("doc_id", "grp").agg(
        F.expr(
            "array_join(transform(array_sort(collect_list(struct(i, w))),"
            " s -> s.w), ' ')"
        ).alias("phrase"),
        F.count("*").cast("bigint").alias("plen"),
    )
    pwords = phrases.select(
        "phrase", "plen", F.explode(F.split("phrase", " ")).alias("w")
    )
    stats = pwords.groupBy("w").agg(
        F.count("*").cast("bigint").alias("freq"),
        F.sum("plen").cast("bigint").alias("degree"),
    )
    scored = (
        pwords.join(stats, "w")
        .groupBy("phrase")
        .agg(
            F.sum(F.expr("div(degree * 1000000000, freq)"))
            .cast("bigint")
            .alias("score_sum")
        )
    )
    occ = phrases.groupBy("phrase").agg(
        F.count("*").cast("bigint").alias("n_occurrences")
    )
    return (
        scored.join(occ, "phrase")
        .select(
            "phrase",
            "n_occurrences",
            F.expr("div(score_sum, n_occurrences)").alias("score_nano"),
        )
        .orderBy(F.desc("score_nano"), F.asc("phrase"))
        .limit(RAKE_TOP)
    )
