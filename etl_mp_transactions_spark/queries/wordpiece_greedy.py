"""WordPiece greedy longest-match-first segmentation (Wu et al. 2016
/ BERT's tokenizer, public) — the third major subword family next to
BPE (queries/tokenize.py, merge-rule replay) and unigram-Viterbi
(queries/wordpiece.py, global-cost DP): at each position take the
LONGEST vocabulary piece that matches, with POSITIONAL vocabulary
membership — a piece seen at word starts is an initial piece, a piece
seen elsewhere is a continuation piece (BERT's ``##`` distinction,
rendered literally in the output path).

Exactness: greedy needs no costs at all — the only statistic is
vocabulary membership (substring support ≥ MIN_PIECE_COUNT, singles
always kept, split by initial/continuation position), so the whole
segmentation is deterministic integer/string work both engines
reproduce bit-for-bit. Matching can never fail: every single char at
position j of a surviving word is itself a supported length-1 piece
at that position class.

The greedy loop unrolls over STEPS (not end positions — each step
advances every unfinished word by exactly one piece, ≥1 char, so
MAX_WORD_LEN steps suffice). Per step: finished words carry; others
join the positional candidate table on (word, st = pos + 1) and a
per-word max(len) argmax picks the longest match. Rounds are cut
with the queries/wordpiece.py RDD-roundtrip (the carry + advance
union reads the previous round twice — 2^rounds analyzer growth
otherwise).

Scale: one corpus-linear word count; the candidate table and every
greedy round are distinct-word/vocabulary-sized; per-round work is
one hash join + one grouped max with map-side combine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from etl_mp_transactions_spark.queries.wordpiece import (
    MAX_PIECE_LEN,
    MAX_WORD_LEN,
    MIN_PIECE_COUNT,
    _pieces_df,
    _wcnt_df,
)
from etl_mp_transactions_spark.registry import query
from etl_mp_transactions_spark.sources.tables import load_table

_GSTATE_SCHEMA = "word string, pos int, path string"

_GBASE_CTES = f"""wcnt AS MATERIALIZED (
      SELECT word, CAST(count(*) AS BIGINT) AS cnt
      FROM (SELECT unnest(string_split(text, ' ')) AS word
            FROM documents)
      WHERE word <> ''
      GROUP BY word
    ),
    pos AS (SELECT unnest(generate_series(1, {MAX_WORD_LEN})) AS st),
    plen AS (SELECT unnest(generate_series(1, {MAX_PIECE_LEN})) AS len),
    pieces AS MATERIALIZED (
      SELECT w.word, pos.st, plen.len,
             substr(w.word, pos.st, plen.len) AS piece, w.cnt
      FROM wcnt w CROSS JOIN pos CROSS JOIN plen
      WHERE pos.st + plen.len - 1 <= length(w.word)
    ),
    vinit AS MATERIALIZED (
      SELECT piece FROM pieces WHERE st = 1
      GROUP BY piece
      HAVING sum(cnt) >= {MIN_PIECE_COUNT} OR length(piece) = 1
    ),
    vcont AS MATERIALIZED (
      SELECT piece FROM pieces WHERE st > 1
      GROUP BY piece
      HAVING sum(cnt) >= {MIN_PIECE_COUNT} OR length(piece) = 1
    ),
    gcand AS MATERIALIZED (
      SELECT DISTINCT p.word, p.st, p.len, p.piece
      FROM pieces p
      WHERE (p.st = 1 AND p.piece IN (SELECT piece FROM vinit))
         OR (p.st > 1 AND p.piece IN (SELECT piece FROM vcont))
    ),
    g0 AS (SELECT word, 0 AS pos, '' AS path FROM wcnt)"""


def _gstep_sql(k: int) -> str:
    return f"""
    g{k} AS MATERIALIZED (
      SELECT word, pos, path FROM (
        SELECT p.word, p.pos, p.path
        FROM g{k - 1} p JOIN wcnt w ON w.word = p.word
        WHERE p.pos = length(w.word)
        UNION ALL
        SELECT word, pos, path FROM (
          SELECT c.word, c.st + c.len - 1 AS pos,
                 CASE WHEN p.path = '' THEN c.piece
                      ELSE p.path || '|##' || c.piece END AS path
          FROM gcand c
          JOIN g{k - 1} p ON p.word = c.word AND c.st = p.pos + 1
          QUALIFY row_number() OVER (PARTITION BY c.word
                                     ORDER BY c.len DESC) = 1
        )
      )
    )"""


_GREEDY_CTES = (
    _GBASE_CTES
    + ","
    + ",".join(_gstep_sql(k) for k in range(1, MAX_WORD_LEN + 1))
    + f""",
    gseg AS (
      SELECT g.word, g.path
      FROM g{MAX_WORD_LEN} g JOIN wcnt w
        ON w.word = g.word AND g.pos = length(w.word)
    )"""
)

_N_PIECES_G = (
    "CAST(length(path) - length(replace(path, '|', '')) + 1 AS BIGINT)"
)


@query(
    "wordpiece_greedy_segment",
    f"""
    WITH {_GREEDY_CTES}
    SELECT word,
           path AS segmentation,
           {_N_PIECES_G} AS n_pieces,
           CAST(length(path) - length(replace(path, '#', ''))
                AS BIGINT) // 2 AS n_continuations
    FROM gseg
    ORDER BY word
    """,
)
def wordpiece_greedy_segment(spark, sf_dir):
    """Greedy longest-match-first WordPiece segmentation of every
    distinct corpus word (module docstring): positional vocabulary
    (initial vs ``##`` continuation pieces, support ≥
    {MIN_PIECE_COUNT}, singles kept), one longest-match step per
    round, continuations rendered with the literal ``##`` marker.
    Output per word: the segmentation, total pieces, continuation
    count. A pure-python greedy replay cross-checks in
    tests/test_wordpiece_greedy.py."""
    docs = load_table(spark, sf_dir, "documents")
    wcnt = _wcnt_df(docs)
    pieces = _pieces_df(wcnt)
    vinit = (
        pieces.filter(F.col("st") == 1)
        .groupBy("piece")
        .agg(F.sum("cnt").alias("sup"))
        .filter(
            (F.col("sup") >= MIN_PIECE_COUNT) | (F.length("piece") == 1)
        )
        .select("piece")
    )
    vcont = (
        pieces.filter(F.col("st") > 1)
        .groupBy("piece")
        .agg(F.sum("cnt").alias("sup"))
        .filter(
            (F.col("sup") >= MIN_PIECE_COUNT) | (F.length("piece") == 1)
        )
        .select("piece")
    )
    gcand = (
        pieces.filter(F.col("st") == 1)
        .join(vinit, "piece")
        .unionAll(pieces.filter(F.col("st") > 1).join(vcont, "piece"))
        .select("word", "st", "len", "piece")
        .distinct()
    )
    # r16 optimization (guide §1.2/§4, the r15 viterbi fold applied
    # to the greedy loop): the previous shape unrolled MAX_WORD_LEN
    # rounds of (hash join + per-word longest-match window), each cut
    # with a Python-RDD roundtrip + persist + count — ~10 blocking
    # jobs crossing JVM→Python→JVM per call. Greedy is embarrassingly
    # per-word, so the whole longest-match recurrence runs as ONE
    # `aggregate()` fold over that word's candidate array instead:
    # per step, the filtered candidates all share st = pos+1 and a
    # (word, st, len) triple names a unique substring (distinct'd),
    # so `array_max` over struct(len, st, piece) IS the old
    # row_number-over-len-desc longest match, tie-free. The
    # single-element transform binds the argmax once; an overlong
    # word (none at MAX_WORD_LEN = observed corpus max) nulls out
    # via array_max(empty) and drops at the pos = length(word)
    # filter, exactly as it dropped out of the old pos==wl join.
    cands = gcand.groupBy("word").agg(
        F.collect_list(F.struct("len", "st", "piece")).alias("cs")
    )
    step = f"""
      aggregate(
        sequence(1, {MAX_WORD_LEN}),
        named_struct('pos', 0, 'path', ''),
        (acc, i) -> if(acc.pos = length(word),
          acc,
          transform(
            array(array_max(filter(cs, c -> c.st = acc.pos + 1))),
            b -> named_struct(
              'pos', acc.pos + b.len,
              'path', if(acc.path = '', b.piece,
                         concat(acc.path, '|##', b.piece))))[0]))"""
    gseg = (
        cands.withColumn("res", F.expr(step))
        .filter(F.col("res.pos") == F.length("word"))
        .select("word", F.col("res.path").alias("path"))
    )
    return gseg.select(
        "word",
        F.col("path").alias("segmentation"),
        F.expr(_N_PIECES_G).alias("n_pieces"),
        F.expr(
            "cast(length(path) - length(replace(path, '#', ''))"
            " as bigint) div 2"
        ).alias("n_continuations"),
    ).orderBy("word")
