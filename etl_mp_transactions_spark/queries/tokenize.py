"""BPE tokenization applied fully in-engine (SURVEY.md §2.9 text
analysis — the encode-side complement of bpe_merge_step in
queries/analytics2.py, which LEARNS one merge from pair counts).

bpe_encode_tokens applies a fixed, rank-ordered merge table to every
vocabulary word as a chain of left-to-right greedy array folds: one
fold per merge, each rebuilding the symbol list (append, or replace
the tail symbol when (tail, next) matches the merge — the leftmost-
first semantics of the reference BPE implementations, Sennrich et
al. 2016, public). The operator is defined as *rank-ordered full
passes* (merge k applied everywhere before merge k+1 is considered),
which is the classic learn-time application order.

Exactness: pure string/array expressions end-to-end; both engines
fold the identical CASE logic left-to-right. DuckDB 1.0 has only
2-arg list_reduce (first element seeds the accumulator), so symbols
are wrapped into single-element lists to unify accumulator/element
types; Spark uses aggregate() with an empty-array seed. Outputs
(token lists) are compared, not intermediate representations.

Scale: the fold is per-WORD (bounded by word length), run once per
distinct vocabulary word — the classic tokenize-the-vocab-then-join
shape: per-word work is O(|word| x |merges|) over the vocabulary,
never over the corpus; the corpus only contributes exact occurrence
counts via one uniform-key groupBy.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_mp_transactions_spark.registry import query
from etl_mp_transactions_spark.sources.tables import load_table

MERGES = [
    ("t", "a"),
    ("ta", "b"),
    ("tab", "l"),
    ("tabl", "e"),
    ("a", "n"),
]


def _duck_merge_cte(idx: int, x: str, y: str, src: str) -> str:
    return f"""
    m{idx} AS (
      SELECT word, n_occurrences,
             list_reduce(
               list_transform(syms, s -> [s]),
               (acc, e) -> CASE WHEN acc[-1] = '{x}' AND e[1] = '{y}'
                                THEN list_append(acc[1:len(acc)-1], '{x}{y}')
                                ELSE list_append(acc, e[1]) END
             ) AS syms
      FROM {src}
    )"""


def _oracle() -> str:
    ctes = []
    src = "chars"
    for i, (x, y) in enumerate(MERGES):
        ctes.append(_duck_merge_cte(i, x, y, src))
        src = f"m{i}"
    return f"""
    WITH tok AS (
      SELECT u.w AS word
      FROM documents, unnest(string_split(text, ' ')) AS u(w)
      WHERE u.w <> ''
    ),
    vocab AS (
      SELECT word, CAST(count(*) AS BIGINT) AS n_occurrences
      FROM tok GROUP BY 1
    ),
    chars AS (
      SELECT word, n_occurrences,
             list_transform(generate_series(1, length(word)),
                            i -> word[i]) AS syms
      FROM vocab
    ),{",".join(ctes)}
    SELECT word, n_occurrences,
           CAST(len(syms) AS BIGINT) AS n_tokens,
           array_to_string(syms, ' ') AS tokens
    FROM {src}
    ORDER BY word
    """


def _spark_merge(x: str, y: str) -> str:
    return (
        "aggregate(syms, cast(array() as array<string>),"
        f" (acc, s) -> CASE WHEN size(acc) > 0 AND element_at(acc, -1) = '{x}'"
        f" AND s = '{y}'"
        f" THEN concat(slice(acc, 1, size(acc) - 1), array('{x}{y}'))"
        " ELSE concat(acc, array(s)) END)"
    )


@query("bpe_encode_tokens", _oracle())
def bpe_encode_tokens(spark, sf_dir):
    """Apply the fixed rank-ordered BPE merge table to the corpus
    vocabulary (module docstring): per-word chained greedy folds,
    exact corpus occurrence counts, final token list + count per
    word."""
    docs = load_table(spark, sf_dir, "documents")
    tok = (
        docs.select(F.explode(F.split(F.col("text"), " ")).alias("word"))
        .filter(F.col("word") != "")
    )
    vocab = tok.groupBy("word").agg(
        F.count("*").cast("bigint").alias("n_occurrences")
    )
    out = vocab.withColumn(
        "syms",
        F.expr("transform(sequence(1, length(word)), i -> substring(word, i, 1))"),
    )
    for x, y in MERGES:
        out = out.withColumn("syms", F.expr(_spark_merge(x, y)))
    return out.select(
        "word",
        "n_occurrences",
        F.size("syms").cast("bigint").alias("n_tokens"),
        F.array_join("syms", " ").alias("tokens"),
    ).orderBy("word")
