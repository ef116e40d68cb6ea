"""Index-construction operator family (SURVEY.md §2.9 extensions):
inverted-index build with bounded posting lists, and int8 embedding
quantization with an exact reconstruction-error audit.

inverted_index_build is the IR-side complement to bm25_scoring
(retrieval.py): instead of scoring a fixed query, it materializes the
index itself — per term: document frequency, collection frequency,
and the top-5 posting list rendered canonically ('doc:tf,…', ordered
by tf desc then doc asc). Posting-list truncation happens via a
per-term window BEFORE the string aggregation, so the quadratic-ish
collect only ever sees ≤5 rows per term. One shuffle on the term key
(uniform); the per-term window partitions by term — fully parallel.

embedding_quantization is the storage-path operator every 100 TB
embedding corpus runs: symmetric int8 quantization (scale =
max|x|/127 per vector) with the squared reconstruction error
reported per label. Determinism: the per-vector max is a comparison
(no accumulation); each element's error is one float expression on
identical operands snapped to a ×1e12 integer grid; the per-label
sum is then an order-free BIGINT sum (picorank policy). The
element-level work is expression-only (explode + arithmetic), no
UDFs.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from etl_mp_transactions_spark.registry import query
from etl_mp_transactions_spark.sources.tables import load_table

POSTINGS_K = 5


@query(
    "inverted_index_build",
    f"""
    WITH toks AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS term
      FROM documents
    ),
    tf AS (
      SELECT term, doc_id, count(*) AS tf
      FROM toks GROUP BY term, doc_id
    ),
    stats AS (
      SELECT term, count(*) AS df, sum(tf) AS cf
      FROM tf GROUP BY term
    ),
    ranked AS (
      SELECT term, doc_id, tf,
             row_number() OVER (PARTITION BY term
                                ORDER BY tf DESC, doc_id ASC) AS rn
      FROM tf
    ),
    postings AS (
      SELECT term,
             string_agg(CAST(doc_id AS VARCHAR) || ':' || CAST(tf AS VARCHAR),
                        ',' ORDER BY rn) AS top_postings
      FROM ranked WHERE rn <= {POSTINGS_K}
      GROUP BY term
    )
    SELECT s.term, s.df, s.cf, p.top_postings
    FROM stats s JOIN postings p ON s.term = p.term
    ORDER BY s.term
    """,
)
def inverted_index_build(spark, sf_dir):
    """Inverted index over the documents corpus (module docstring):
    per term df/cf plus the canonical top-{POSTINGS_K} posting
    string."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.explode(F.split(F.col("text"), " ")).alias("term")
    )
    tf = toks.groupBy("term", "doc_id").agg(F.count("*").alias("tf"))
    stats = tf.groupBy("term").agg(
        F.count("*").alias("df"), F.sum("tf").alias("cf")
    )
    ranked = tf.withColumn(
        "rn",
        F.row_number().over(
            Window.partitionBy("term").orderBy(
                F.desc("tf"), F.asc("doc_id")
            )
        ),
    ).filter(F.col("rn") <= POSTINGS_K)
    postings = (
        ranked.select(
            "term",
            "rn",
            F.concat_ws(
                ":", F.col("doc_id").cast("string"), F.col("tf").cast("string")
            ).alias("p"),
        )
        .groupBy("term")
        .agg(
            F.expr(
                "array_join(transform(array_sort(collect_list(struct(rn, p)))"
                ", x -> x.p), ',')"
            ).alias("top_postings")
        )
    )
    return (
        stats.join(postings, "term")
        .select("term", "df", "cf", "top_postings")
        .orderBy("term")
    )


@query(
    "embedding_quantization",
    """
    WITH scaled AS (
      SELECT vec_id, label, embedding,
             CAST(list_max(list_transform(embedding, x -> abs(x)))
                  AS DOUBLE) AS maxabs
      FROM embeddings
    ),
    elems AS (
      SELECT vec_id, label, maxabs,
             CAST(unnest(embedding) AS DOUBLE) AS x
      FROM scaled
    ),
    err AS (
      SELECT vec_id, label,
             CASE WHEN maxabs = 0 THEN 0
                  ELSE CAST(round(
                    (x - round(x / (maxabs / CAST(127 AS DOUBLE)))
                       * (maxabs / CAST(127 AS DOUBLE)))
                    * (x - round(x / (maxabs / CAST(127 AS DOUBLE)))
                       * (maxabs / CAST(127 AS DOUBLE)))
                    * 1e12) AS BIGINT)
             END AS err_pico
      FROM elems
    )
    SELECT label,
           count(DISTINCT vec_id) AS n_vecs,
           sum(err_pico) AS total_err_pico
    FROM err
    GROUP BY label
    ORDER BY label
    """,
)
def embedding_quantization(spark, sf_dir):
    """Symmetric int8 quantization audit per label (module
    docstring): squared reconstruction error of round(x/scale)·scale,
    scale = max|x|/127 per vector, snapped to pico units before the
    order-free sum."""
    emb = load_table(spark, sf_dir, "embeddings")
    scaled = emb.select(
        "vec_id",
        "label",
        "embedding",
        F.expr("array_max(transform(embedding, x -> abs(x)))")
        .cast("double")
        .alias("maxabs"),
    )
    elems = scaled.select(
        "vec_id",
        "label",
        "maxabs",
        F.explode("embedding").alias("xf"),
    ).withColumn("x", F.col("xf").cast("double"))
    scale = F.col("maxabs") / 127.0
    e = F.col("x") - F.round(F.col("x") / scale, 0) * scale
    err_pico = F.when(F.col("maxabs") == 0, F.lit(0)).otherwise(
        F.round(e * e * 1e12, 0).cast("bigint")
    )
    return (
        elems.select("vec_id", "label", err_pico.alias("err_pico"))
        .groupBy("label")
        .agg(
            F.countDistinct("vec_id").alias("n_vecs"),
            F.sum("err_pico").alias("total_err_pico"),
        )
        .orderBy("label")
    )
