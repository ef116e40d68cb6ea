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


# ---------------------------------------------------------------------------
# BPE vocabulary LEARNING loop (Sennrich et al. 2016 Algorithm 1, public):
# bpe_merge_step (queries/analytics2.py) learns ONE merge and
# bpe_encode_tokens above applies a FIXED table; this is the missing
# piece — the iterative learn loop itself, N_LEARN rounds of
# (weighted adjacent-pair count -> argmax pair -> greedy re-segment),
# output = the learned rank-ordered merge table.
#
# Determinism: the argmax pair breaks ties (count desc, lhs asc, rhs
# asc) — a total order, so both engines learn the identical table.
# Pair counts are the textbook zip(symbols, symbols[1:]) overlapping
# counts; application is the same leftmost-greedy fold as
# bpe_encode_tokens, with the learned pair referenced as row COLUMNS
# inside the lambda (1-row cross join) instead of plan-time literals.
#
# Scale shape per round: pair counting is one vocabulary-sized
# explode + map-side-combined groupBy; the winner is TakeOrdered(1)
# (never a global sort); application is a per-word bounded fold under
# a 1-row broadcast. The corpus contributes only the one-off word
# count. Each round's re-segmented vocabulary is referenced twice by
# the next round (pair counts + application), so rounds are cut with
# the RDD-roundtrip + persist of queries/wordpiece.py (vocabulary-
# sized rows; 2^rounds analyzer blowup otherwise — the HITS lesson).
# ---------------------------------------------------------------------------

N_LEARN = 6


def _learn_round_sql(k: int) -> str:
    return f"""
    p{k} AS (
      SELECT pr[1] AS lhs, pr[2] AS rhs,
             CAST(sum(n_occurrences) AS BIGINT) AS support
      FROM (
        SELECT n_occurrences,
               unnest(list_transform(generate_series(1, len(syms) - 1),
                                     i -> [syms[i], syms[i + 1]])) AS pr
        FROM m{k - 1}
      )
      GROUP BY 1, 2
    ),
    w{k} AS (
      SELECT {k} AS rank, lhs, rhs, lhs || rhs AS merged, support
      FROM p{k} ORDER BY support DESC, lhs, rhs LIMIT 1
    ),
    m{k} AS (
      SELECT m.word, m.n_occurrences,
             list_reduce(
               list_transform(m.syms, s -> [s]),
               (acc, e) -> CASE WHEN acc[-1] = w.lhs AND e[1] = w.rhs
                                THEN list_append(acc[1:len(acc)-1],
                                                 w.lhs || w.rhs)
                                ELSE list_append(acc, e[1]) END
             ) AS syms
      FROM m{k - 1} m CROSS JOIN w{k} w
    )"""


def _learn_oracle() -> str:
    rounds = ",".join(_learn_round_sql(k) for k in range(1, N_LEARN + 1))
    final = " UNION ALL ".join(
        f"SELECT * FROM w{k}" for k in range(1, N_LEARN + 1)
    )
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
    m0 AS (
      SELECT word, n_occurrences,
             list_transform(generate_series(1, length(word)),
                            i -> word[i]) AS syms
      FROM vocab
    ),{rounds}
    SELECT CAST(rank AS BIGINT) AS rank, lhs, rhs, merged, support
    FROM ({final})
    ORDER BY rank
    """


_LEARN_APPLY = (
    "aggregate(syms, cast(array() as array<string>),"
    " (acc, s) -> CASE WHEN size(acc) > 0 AND element_at(acc, -1) = lhs"
    " AND s = rhs"
    " THEN concat(slice(acc, 1, size(acc) - 1), array(concat(lhs, rhs)))"
    " ELSE concat(acc, array(s)) END)"
)


@query("bpe_learn_vocab", _learn_oracle())
def bpe_learn_vocab(spark, sf_dir):
    """Learn the first N_LEARN BPE merges from the corpus vocabulary
    (block comment above): weighted overlapping-pair counts, total-
    order argmax, leftmost-greedy re-segmentation per round. Output
    the rank-ordered merge table (rank, lhs, rhs, merged, support)."""
    docs = load_table(spark, sf_dir, "documents")
    tok = (
        docs.select(F.explode(F.split(F.col("text"), " ")).alias("word"))
        .filter(F.col("word") != "")
    )
    m = tok.groupBy("word").agg(
        F.count("*").cast("bigint").alias("n_occurrences")
    ).withColumn(
        "syms",
        F.expr(
            "transform(sequence(1, length(word)),"
            " i -> substring(word, i, 1))"
        ),
    )

    # r16 optimization (guide §4/§5): each learning round cut the
    # re-segmented vocabulary with a Python-RDD roundtrip
    # (createDataFrame(df.rdd) + persist + count — a JVM→Python→JVM
    # crossing per round) and kept the round's winner as a PLAN, so
    # the final union re-ran every round's pair aggregation a second
    # time at collection. The merge recurrence is inherently
    # sequential (round k's counts depend on round k-1's merge), so
    # the rounds stay; the plumbing is now: lineage cut with an
    # in-JVM localCheckpoint, the single winner row collected once
    # per round (bounded: ONE row — the quality-Newton bounded-
    # collect discipline) and replayed as literals, and the output
    # assembled as a literal frame — same rows, same schema, half
    # the per-round jobs and zero Python crossings.
    from etl_mp_transactions_spark.functions.literalframe import (
        literal_frame,
    )

    m = m.localCheckpoint(eager=True)
    won = []
    for k in range(1, N_LEARN + 1):
        pairs = (
            m.select(
                "n_occurrences",
                F.explode(
                    F.expr(
                        # the size guard keeps sequence() off
                        # descending ranges on 1-symbol words
                        "CASE WHEN size(syms) >= 2 THEN"
                        " transform(sequence(1, size(syms) - 1),"
                        " i -> struct(syms[i - 1] AS lhs, syms[i] AS rhs))"
                        " ELSE array() END"
                    )
                ).alias("pr"),
            )
            .groupBy(F.col("pr.lhs").alias("lhs"), F.col("pr.rhs").alias("rhs"))
            .agg(F.sum("n_occurrences").cast("bigint").alias("support"))
        )
        row = (
            pairs.orderBy(F.desc("support"), "lhs", "rhs")
            .limit(1)
            .collect()
        )[0]
        won.append(
            (k, row["lhs"], row["rhs"], row["lhs"] + row["rhs"],
             row["support"])
        )
        m = (
            m.withColumn("lhs", F.lit(row["lhs"]))
            .withColumn("rhs", F.lit(row["rhs"]))
            .withColumn("syms", F.expr(_LEARN_APPLY))
            .select("word", "n_occurrences", "syms")
            .localCheckpoint(eager=True)
        )
    return literal_frame(
        spark,
        won,
        "rank bigint, lhs string, rhs string, merged string,"
        " support bigint",
    ).orderBy("rank")
