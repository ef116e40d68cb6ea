"""Training-data pipeline operators, batch 2 (SURVEY.md §2.9):
Gopher-style repetition filtering, deterministic dataset splitting,
per-group sampling, and benchmark decontamination.

These are the curation steps a 100 TB pretraining pipeline runs after
dedup: drop repetitious documents, carve train/val/test determinist-
ically, cap per-source contributions, and remove documents that leak
evaluation data. All oracle-checked; hashes use the repo's md5 parity
form (Spark conv(substring(md5,1,8),16,10) == DuckDB
('0x'||substr(md5,1,8))::BIGINT).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_mp_transactions_spark.operators import textstats
from etl_mp_transactions_spark.registry import query
from etl_mp_transactions_spark.sources.tables import load_table

# keep-thresholds sit inside the corpus' observed metric range
# (top_word_frac ~0.03-0.30, dup_2gram_frac ~0-0.13) so both verdicts
# occur; real Gopher thresholds are looser because natural text is
# less repetitious than this synthetic vocab
_TOP_W, _DUP2, _MIN_WORDS = 0.15, 0.06, 15


@query(
    "gopher_repetition",
    f"""
    WITH m AS (
      SELECT doc_id,
             string_split_regex(text, '\\s+') AS words
      FROM documents
    ),
    r AS (
      SELECT doc_id,
             len(words) AS n_words,
             CASE WHEN len(words) > 0 THEN
               list_max(list_transform(list_distinct(words),
                        x -> len(list_filter(words, y -> y = x))))::DOUBLE
               / len(words)
             ELSE 0.0 END AS top_word_frac,
             CASE WHEN len(words) >= 2 THEN
               (len(g2) - len(list_distinct(g2)))::DOUBLE / len(g2)
             ELSE 0.0 END AS dup_2gram_frac,
             CASE WHEN len(words) >= 3 THEN
               (len(g3) - len(list_distinct(g3)))::DOUBLE / len(g3)
             ELSE 0.0 END AS dup_3gram_frac
      FROM (
        SELECT doc_id, words,
               list_transform(generate_series(1, len(words) - 1),
                              i -> words[i] || ' ' || words[i + 1]) AS g2,
               list_transform(generate_series(1, len(words) - 2),
                              i -> words[i] || ' ' || words[i + 1] || ' '
                                   || words[i + 2]) AS g3
        FROM m
      )
    )
    SELECT doc_id, n_words, top_word_frac, dup_2gram_frac, dup_3gram_frac,
           (top_word_frac <= {_TOP_W} AND dup_2gram_frac <= {_DUP2}
            AND n_words >= {_MIN_WORDS}) AS keep
    FROM r
    """,
)
def gopher_repetition(spark, sf_dir):
    """Gopher-style repetition filter: top-word fraction + duplicate
    2/3-gram fractions with a keep verdict. Map-only expression scan
    (operators/textstats.repetition_metrics) — no shuffle at any SF."""
    docs = load_table(spark, sf_dir, "documents")
    m = textstats.repetition_metrics(docs)
    keep = (
        (F.col("top_word_frac") <= _TOP_W)
        & (F.col("dup_2gram_frac") <= _DUP2)
        & (F.col("n_words") >= _MIN_WORDS)
    )
    return m.select(
        "doc_id", "n_words", "top_word_frac", "dup_2gram_frac", "dup_3gram_frac",
        keep.alias("keep"),
    )


@query(
    "dataset_split",
    """
    SELECT doc_id,
           CASE WHEN b < 80 THEN 'train' WHEN b < 90 THEN 'val'
                ELSE 'test' END AS split
    FROM (
      SELECT doc_id,
             ('0x' || substr(md5(doc_id::VARCHAR || ':split-seed-1'), 1, 8))::BIGINT
               % 100 AS b
      FROM documents
    )
    """,
)
def dataset_split(spark, sf_dir):
    """Deterministic 80/10/10 train/val/test split by salted content
    hash — reproducible across runs, engines, and repartitions (the
    property rand()-based splits lack). Map-only; the split column
    can feed a partitioned writer without any shuffle."""
    docs = load_table(spark, sf_dir, "documents")
    b = F.conv(
        F.substring(F.md5(F.concat(F.col("doc_id").cast("string"), F.lit(":split-seed-1"))), 1, 8),
        16,
        10,
    ).cast("bigint") % 100
    split = (
        F.when(b < 80, "train").when(b < 90, "val").otherwise("test")
    )
    return docs.select("doc_id", split.alias("split"))


@query(
    "per_group_sample",
    """
    SELECT doc_id, lang, source
    FROM (
      SELECT doc_id, lang, source,
             row_number() OVER (
               PARTITION BY lang, source
               ORDER BY md5(doc_id::VARCHAR || ':sample-seed-1'), doc_id
             ) AS rn
      FROM documents
    )
    WHERE rn <= 5
    """,
)
def per_group_sample(spark, sf_dir):
    """Deterministic per-(lang, source) cap: keep 5 documents per
    group, chosen by salted-hash order — the source-balancing step
    that stops one crawl dump from dominating a mixture. One window
    shuffle on the group key; at scale the hash-order sort is
    per-group local (no global sort)."""
    docs = load_table(spark, sf_dir, "documents")
    from pyspark.sql import Window

    h = F.md5(F.concat(F.col("doc_id").cast("string"), F.lit(":sample-seed-1")))
    w = Window.partitionBy("lang", "source").orderBy(h, F.col("doc_id"))
    return (
        docs.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 5)
        .select("doc_id", "lang", "source")
    )


@query(
    "decontamination_overlap",
    """
    WITH g AS (
      SELECT doc_id, source, unnest(list_distinct(
               list_transform(generate_series(1, len(words) - 2),
                              i -> words[i] || ' ' || words[i + 1] || ' '
                                   || words[i + 2]))) AS gram
      FROM (SELECT doc_id, source,
                   string_split_regex(text, '\\s+') AS words
            FROM documents)
    ),
    bench AS (SELECT DISTINCT gram FROM g WHERE source = 'src0')
    SELECT g.doc_id, count(DISTINCT g.gram)::BIGINT AS shared_grams
    FROM g JOIN bench USING (gram)
    WHERE g.source <> 'src0'
    GROUP BY g.doc_id
    """,
)
def decontamination_overlap(spark, sf_dir):
    """Benchmark decontamination: training documents sharing any word
    3-gram with the held-out set (source='src0' stands in for an eval
    benchmark; real pipelines use 8-13-grams — this corpus' docs are
    short). Shape: distinct n-grams exploded, one shuffle on the gram
    key, semi-join against the benchmark gram set, count per doc.
    Gram-partitioned, so it scales with corpus size, not corpus²; a
    hot gram is bounded by being *distinct* per doc."""
    docs = load_table(spark, sf_dir, "documents")
    grams = docs.select(
        "doc_id",
        "source",
        F.explode(textstats.word_ngrams(docs, 3)).alias("gram"),
    )
    bench = grams.filter(F.col("source") == "src0").select("gram").distinct()
    return (
        grams.filter(F.col("source") != "src0")
        .join(bench, "gram", "left_semi")
        .groupBy("doc_id")
        .agg(F.count_distinct("gram").alias("shared_grams"))
    )


@query(
    "dedup_components",
    """
    WITH RECURSIVE toks AS (
      SELECT doc_id, lang, source,
             list_distinct(string_split_regex(text, '\\s+')) AS tokens
      FROM documents
    ),
    pairs AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM toks a
      JOIN toks b ON a.lang = b.lang AND a.source = b.source
                 AND a.doc_id < b.doc_id
      WHERE len(list_intersect(a.tokens, b.tokens))::DOUBLE
              / len(list_distinct(list_concat(a.tokens, b.tokens))) >= 0.9
    ),
    edges AS (
      SELECT doc_a AS a, doc_b AS b FROM pairs
      UNION
      SELECT doc_b AS a, doc_a AS b FROM pairs
    ),
    reach(a, b) AS (
      SELECT a, b FROM edges
      UNION
      SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a
    ),
    comp AS (
      SELECT a AS doc_id, least(a, min(b)) AS component
      FROM reach GROUP BY a
    )
    SELECT d.doc_id, coalesce(c.component, d.doc_id) AS component
    FROM documents d LEFT JOIN comp c ON c.doc_id = d.doc_id
    """,
)
def dedup_components(spark, sf_dir):
    """Transitive closure of exact-Jaccard near-dup pairs: every doc
    labeled with min(doc_id) of its duplicate cluster (singletons keep
    their own id) — the stage that turns pair emitters into a usable
    keep-one-per-cluster dedup. Iterative min-label propagation
    (operators/components.py); oracle is a DuckDB recursive-CTE
    reachability closure over the identical edge set."""
    from etl_mp_transactions_spark.operators import textdedup
    from etl_mp_transactions_spark.operators.components import connected_components

    docs = load_table(spark, sf_dir, "documents")
    edges = textdedup.ngram_jaccard_pairs(docs, threshold=0.9).select(
        "doc_a", "doc_b"
    )
    return connected_components(docs, edges)


@query(
    "pii_redaction",
    """
    WITH raw AS (
      SELECT c_custkey,
             'contact ' || lower(c_name) || '@example.com or +1-555-'
               || lpad((c_custkey % 10000)::VARCHAR, 4, '0')
               || ' re account ' || c_acctbal AS note
      FROM customer
    )
    SELECT c_custkey,
           regexp_replace(
             regexp_replace(note, '[a-z0-9#]+@[a-z.]+', '<EMAIL>', 'g'),
             '\\+1-555-[0-9]{4}', '<PHONE>', 'g') AS note_redacted,
           len(regexp_extract_all(note, '[a-z0-9#]+@[a-z.]+'))::BIGINT
             + len(regexp_extract_all(note, '\\+1-555-[0-9]{4}'))::BIGINT
             AS n_redactions,
           substr(md5(c_custkey::VARCHAR || ':pii-salt-1'), 1, 16) AS pseudonym
    FROM raw
    """,
)
def pii_redaction(spark, sf_dir):
    """PII scrubbing for training corpora: regex redaction of emails
    and phone numbers (synthesized deterministically into the fixture
    text — the corpus itself contains none) plus salted-hash
    pseudonymization of the subject key. Map-only scan; the redaction
    count rides along so a quality gate can drop documents where
    scrubbing density is suspicious. Patterns are kept in the
    RE2∩Java-regex common subset so both engines execute the same
    automaton."""
    c = load_table(spark, sf_dir, "customer")
    note = F.concat(
        F.lit("contact "),
        F.lower(F.col("c_name")),
        F.lit("@example.com or +1-555-"),
        F.lpad((F.col("c_custkey") % 10000).cast("string"), 4, "0"),
        F.lit(" re account "),
        F.col("c_acctbal").cast("string"),
    )
    email_re = "[a-z0-9#]+@[a-z.]+"
    phone_re = r"\+1-555-[0-9]{4}"
    redacted = F.regexp_replace(
        F.regexp_replace(note, email_re, "<EMAIL>"), phone_re, "<PHONE>"
    )
    n_red = (
        F.size(F.regexp_extract_all(note, F.lit(email_re), F.lit(0))).cast("long")
        + F.size(F.regexp_extract_all(note, F.lit(phone_re), F.lit(0))).cast("long")
    )
    pseudo = F.substring(
        F.md5(F.concat(F.col("c_custkey").cast("string"), F.lit(":pii-salt-1"))), 1, 16
    )
    return c.select(
        "c_custkey",
        redacted.alias("note_redacted"),
        n_red.alias("n_redactions"),
        pseudo.alias("pseudonym"),
    )


@query(
    "cluster_representatives",
    """
    WITH RECURSIVE toks AS (
      SELECT doc_id, lang, source,
             list_distinct(string_split_regex(text, '\\s+')) AS tokens
      FROM documents
    ),
    pairs AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM toks a
      JOIN toks b ON a.lang = b.lang AND a.source = b.source
                 AND a.doc_id < b.doc_id
      WHERE len(list_intersect(a.tokens, b.tokens))::DOUBLE
              / len(list_distinct(list_concat(a.tokens, b.tokens))) >= 0.9
    ),
    edges AS (
      SELECT doc_a AS a, doc_b AS b FROM pairs
      UNION
      SELECT doc_b AS a, doc_a AS b FROM pairs
    ),
    reach(a, b) AS (
      SELECT a, b FROM edges
      UNION
      SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a
    ),
    comp AS (
      SELECT a AS doc_id, least(a, min(b)) AS component
      FROM reach GROUP BY a
    ),
    labeled AS (
      SELECT d.doc_id, coalesce(c.component, d.doc_id) AS component,
             d.n_chars
      FROM documents d LEFT JOIN comp c ON c.doc_id = d.doc_id
    )
    SELECT doc_id, component, n_chars
    FROM (
      SELECT *, row_number() OVER (
        PARTITION BY component ORDER BY n_chars DESC, doc_id
      ) AS rn
      FROM labeled
    ) WHERE rn = 1
    """,
)
def cluster_representatives(spark, sf_dir):
    """The last stage of the dedup story: pairs → transitive clusters
    → ONE kept document per cluster (longest doc wins, doc_id breaks
    ties) — what a curation pipeline actually emits downstream.
    Composition: ngram_jaccard_pairs → connected_components
    (pointer-jumping) → per-component argmax window. The argmax is
    one window shuffle on the component key; cluster sizes are
    near-dup group sizes (small), so no skew concern."""
    from pyspark.sql import Window

    from etl_mp_transactions_spark.operators import textdedup
    from etl_mp_transactions_spark.operators.components import connected_components

    docs = load_table(spark, sf_dir, "documents")
    edges = textdedup.ngram_jaccard_pairs(docs, threshold=0.9).select(
        "doc_a", "doc_b"
    )
    labeled = connected_components(docs, edges).join(
        docs.select("doc_id", "n_chars"), "doc_id"
    )
    w = Window.partitionBy("component").orderBy(
        F.desc("n_chars"), "doc_id"
    )
    return (
        labeled.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("doc_id", "component", "n_chars")
    )
