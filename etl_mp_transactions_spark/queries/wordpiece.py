"""Unigram-Viterbi subword segmentation (Kudo 2018, "Subword
regularization" — the SentencePiece unigram model's Viterbi decode,
public) as exact-value-oracled registry queries: learn a piece
vocabulary from the corpus, DP-segment every distinct word, then
tokenize every document through the learned segmentation.

Exactness design: the unigram LM minimizes sum(−log p(piece)) —
irrational, un-oracle-able. This variant declares the exact-integer
surrogate cost(piece) = length(bin(N ÷ pcount)) — the bit-length of
the inverse relative frequency, i.e. ⌊log2⌋+1 computed as a STRING
LENGTH of the binary rendering (both engines' ``bin()`` agree
bit-for-bit; no libm anywhere — the sketches2 ln-table rule). A
naive "maximize summed piece support" objective is degenerate
(count(xy) ≤ min(count(x), count(y)), so all-singles always wins);
minimizing inverse-frequency bit-lengths reproduces the real model's
MDL behavior — frequent long pieces beat runs of singles.

Viterbi ties break to the lexicographically SMALLEST path, riding
the min() for free: each DP state is one string key
``lpad(cost) || '#' || path`` whose ordinary string min IS the
(cost, path) lexicographic argmin — no structs, no floats, binary
collation in both engines. Optimal substructure survives the
tiebreak: two distinct paths to the same position are never
prefix-comparable (same covered chars, different separator
placement), so any shared suffix's winner is decided inside the
prefix.

The DP unrolls over end positions 1..MAX_WORD_LEN as chained
aggregates (the pagerank/kcore/HITS unroll trick — recursive CTEs
forbid per-round GROUP BY). MAX_WORD_LEN = 10 (observed corpus max
8 + slack; longer words would drop out of BOTH engines identically —
a corpus-declared bound, asserted in tests).

Scale shape: word counting is one corpus-linear groupBy with
map-side combine; everything after runs on the DISTINCT-WORD table
(piece generation is distinct_words × ≤ MAX_WORD_LEN × MAX_PIECE_LEN
rows; each DP round is one hash join + one grouped min). Each round
is referenced by up to MAX_PIECE_LEN later rounds, so rounds are cut
with an RDD-roundtrip + persist (vocabulary-sized rows; plain
``localCheckpoint`` trips a Spark 4.1 ``key not found`` analyzer bug
on unions of checkpointed round plans, and persist alone leaves
~4^rounds analyzer cost — measured 41s → 10s at sf0.001; a cluster
substitutes a reliable checkpoint, the operators/distranks.py
materialize note). Document tokenization re-joins the segmentation
table on word — shuffle hash join, deliberately NOT force-broadcast:
at web scale the distinct-word table is millions of rows (AQE may
still elect broadcast when it measures small — the right call either
way).

Reference parity: none — §2.9 training-data mandate (token counting
/ BPE-ish segmentation family, alongside queries/tokenize.py).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from etl_mp_transactions_spark.registry import query
from etl_mp_transactions_spark.sources.tables import load_table

MAX_WORD_LEN = 10
MAX_PIECE_LEN = 4
MIN_PIECE_COUNT = 2  # pieces below this support are dropped (len>1)
_SC_W = 8  # lpad width of the cost prefix in the DP key
_STATE_SCHEMA = "word string, pos int, cost bigint, path string"


def _prev_union_sql(i: int) -> str:
    js = range(max(0, i - MAX_PIECE_LEN), i)
    return " UNION ALL ".join(f"SELECT * FROM b{j}" for j in js)


def _round_sql(i: int) -> str:
    return f"""
    b{i} AS MATERIALIZED (
      SELECT word, {i} AS pos,
             CAST(substr(mk, 1, {_SC_W}) AS BIGINT) AS cost,
             substr(mk, {_SC_W + 2}) AS path
      FROM (
        SELECT c.word,
               min(lpad(CAST(p.cost + c.pcost AS VARCHAR), {_SC_W}, '0')
                   || '#'
                   || CASE WHEN p.path = '' THEN c.piece
                           ELSE p.path || '|' || c.piece END) AS mk
        FROM cand c
        JOIN ({_prev_union_sql(i)}) p
          ON p.word = c.word AND p.pos = c.st - 1
        WHERE c.st + c.len - 1 = {i}
        GROUP BY c.word
      )
    )"""


_BASE_CTES = f"""wcnt AS MATERIALIZED (
      SELECT word, CAST(count(*) AS BIGINT) AS cnt
      FROM (SELECT unnest(string_split(text, ' ')) AS word
            FROM documents)
      WHERE word <> ''
      GROUP BY word
    ),
    pos AS (SELECT unnest(generate_series(1, {MAX_WORD_LEN})) AS st),
    plen AS (SELECT unnest(generate_series(1, {MAX_PIECE_LEN})) AS len),
    vocab0 AS MATERIALIZED (
      SELECT piece, CAST(sum(cnt) AS BIGINT) AS pcount
      FROM (
        SELECT substr(w.word, pos.st, plen.len) AS piece, w.cnt
        FROM wcnt w CROSS JOIN pos CROSS JOIN plen
        WHERE pos.st + plen.len - 1 <= length(w.word)
      )
      GROUP BY piece
      HAVING sum(cnt) >= {MIN_PIECE_COUNT} OR length(piece) = 1
    ),
    vocab AS MATERIALIZED (
      SELECT piece, pcount,
             CAST(length(bin((SELECT sum(pcount) FROM vocab0) // pcount))
                  AS BIGINT) AS pcost
      FROM vocab0
    ),
    cand AS MATERIALIZED (
      SELECT w.word, pos.st, plen.len, v.piece, v.pcost
      FROM wcnt w CROSS JOIN pos CROSS JOIN plen
      JOIN vocab v ON v.piece = substr(w.word, pos.st, plen.len)
      WHERE pos.st + plen.len - 1 <= length(w.word)
    ),
    b0 AS (SELECT word, 0 AS pos, CAST(0 AS BIGINT) AS cost, '' AS path
           FROM wcnt),"""

_SEG_CTES = (
    _BASE_CTES
    + ",".join(_round_sql(i) for i in range(1, MAX_WORD_LEN + 1))
    + f""",
    ball AS ({" UNION ALL ".join(f"SELECT * FROM b{i}"
                                 for i in range(1, MAX_WORD_LEN + 1))}),
    seg AS (
      SELECT b.word, b.cost, b.path
      FROM ball b JOIN wcnt w
        ON w.word = b.word AND b.pos = length(w.word)
    )"""
)

_N_PIECES = (
    "CAST(length(path) - length(replace(path, '|', '')) + 1 AS BIGINT)"
)


@query(
    "viterbi_segment_vocab",
    f"""
    WITH {_SEG_CTES}
    SELECT word,
           CAST(length(word) AS BIGINT) AS n_chars,
           path AS segmentation,
           cost AS total_cost,
           {_N_PIECES} AS n_pieces
    FROM seg
    ORDER BY word
    """,
)
def viterbi_segment_vocab(spark, sf_dir):
    """Viterbi segmentation of every distinct corpus word (module
    docstring): vocabulary = substrings of length ≤{MAX_PIECE_LEN}
    with corpus support ≥{MIN_PIECE_COUNT} (singles always kept), DP
    minimizes total bit-length cost with the string-key (cost, path)
    argmin. Output one row per word: its segmentation, total cost,
    and piece count."""
    seg = _segments(spark, sf_dir)
    return seg.select(
        "word",
        F.length("word").cast("bigint").alias("n_chars"),
        F.col("path").alias("segmentation"),
        F.col("cost").alias("total_cost"),
        F.expr(_N_PIECES).alias("n_pieces"),
    ).orderBy("word")


@query(
    "viterbi_tokenize_docs",
    f"""
    WITH {_SEG_CTES},
    segn AS (
      SELECT word, cost, {_N_PIECES} AS np
      FROM seg
    ),
    docw AS (
      SELECT doc_id, word FROM (
        SELECT doc_id, unnest(string_split(text, ' ')) AS word
        FROM documents
      ) WHERE word <> ''
    )
    SELECT d.doc_id,
           CAST(count(*) AS BIGINT) AS n_words,
           CAST(sum(s.np) AS BIGINT) AS n_pieces,
           CAST(sum(s.cost) AS BIGINT) AS cost_sum
    FROM docw d JOIN segn s ON s.word = d.word
    GROUP BY d.doc_id
    ORDER BY d.doc_id
    """,
)
def viterbi_tokenize_docs(spark, sf_dir):
    """Tokenize every document through the learned Viterbi
    segmentation: per document, word count, total subword pieces, and
    total encoding cost (the corpus-compressibility signal quality
    pipelines gate on). The segmentation table joins on word as a
    shuffle hash join (module docstring); the per-doc aggregate is
    map-side combined."""
    docs = load_table(spark, sf_dir, "documents")
    seg = _segments(spark, sf_dir).select(
        "word",
        "cost",
        F.expr(_N_PIECES).alias("np"),
    )
    docw = (
        docs.select(
            "doc_id", F.explode(F.split("text", " ")).alias("word")
        )
        .filter(F.col("word") != "")
    )
    return (
        docw.join(seg, "word")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("bigint").alias("n_words"),
            F.sum("np").cast("bigint").alias("n_pieces"),
            F.sum("cost").cast("bigint").alias("cost_sum"),
        )
        .orderBy("doc_id")
    )


def _segments(spark, sf_dir) -> DataFrame:
    """(word, cost, path): the Viterbi DP over the distinct-word
    table — corpus-linear word count, then ≤ MAX_WORD_LEN unrolled
    rounds of (hash join + grouped string-min) on distinct words
    only. Round states are cut via RDD roundtrip + persist (module
    docstring)."""

    def cut(df: DataFrame) -> DataFrame:
        out = spark.createDataFrame(df.rdd, _STATE_SCHEMA).persist()
        out.count()
        return out

    docs = load_table(spark, sf_dir, "documents")
    wcnt = _wcnt_df(docs)
    pieces = _pieces_df(wcnt)
    vocab0 = _vocab0_df(pieces)
    # single-row vocabulary mass (documented bounded scalar class —
    # the HITS max-scalar shape)
    nmass = vocab0.agg(F.sum("pcount").alias("n"))
    vocab = vocab0.crossJoin(F.broadcast(nmass)).select(
        "piece",
        F.length(F.bin(F.expr("div(n, pcount)"))).cast("bigint").alias(
            "pcost"
        ),
    )
    cand = (
        pieces.select("word", "st", "len", "piece")
        .join(vocab, "piece")
        .localCheckpoint(eager=True)
    )
    b = [
        cut(
            wcnt.select(
                "word",
                F.lit(0).alias("pos"),
                F.lit(0).cast("bigint").alias("cost"),
                F.lit("").alias("path"),
            )
        )
    ]
    for i in range(1, MAX_WORD_LEN + 1):
        prev = reduce(
            DataFrame.unionAll,
            b[max(0, i - MAX_PIECE_LEN): i],
        ).alias("p")
        ci = cand.filter(
            F.col("st") + F.col("len") - 1 == F.lit(i)
        ).alias("c")
        key = F.concat(
            F.lpad(
                (F.col("p.cost") + F.col("c.pcost")).cast("string"),
                _SC_W,
                "0",
            ),
            F.lit("#"),
            F.when(F.col("p.path") == "", F.col("c.piece")).otherwise(
                F.concat(F.col("p.path"), F.lit("|"), F.col("c.piece"))
            ),
        )
        bi = (
            ci.join(
                prev,
                (F.col("p.word") == F.col("c.word"))
                & (F.col("p.pos") == F.col("c.st") - 1),
            )
            .groupBy(F.col("c.word").alias("word"))
            .agg(F.min(key).alias("mk"))
            .select(
                "word",
                F.lit(i).alias("pos"),
                F.expr(f"cast(substring(mk, 1, {_SC_W}) as bigint)").alias(
                    "cost"
                ),
                F.expr(f"substring(mk, {_SC_W + 2})").alias("path"),
            )
        )
        b.append(cut(bi))
    ball = reduce(DataFrame.unionAll, b[1:])
    return ball.alias("b").join(
        wcnt.alias("w"),
        (F.col("w.word") == F.col("b.word"))
        & (F.col("b.pos") == F.length(F.col("w.word"))),
    ).select("b.word", "b.cost", "b.path")


def _wcnt_df(docs: DataFrame) -> DataFrame:
    """Distinct-word counts: ONE corpus-linear groupBy; everything
    downstream is vocabulary-sized (checkpointed for reuse)."""
    return (
        docs.select(F.explode(F.split("text", " ")).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count("*").cast("bigint").alias("cnt"))
        .localCheckpoint(eager=True)
    )


def _pieces_df(wcnt: DataFrame) -> DataFrame:
    return (
        wcnt.select(
            "word",
            "cnt",
            F.explode(
                F.sequence(F.lit(1), F.lit(MAX_WORD_LEN))
            ).alias("st"),
        )
        .select(
            "word",
            "cnt",
            "st",
            F.explode(
                F.sequence(F.lit(1), F.lit(MAX_PIECE_LEN))
            ).alias("len"),
        )
        .filter(F.col("st") + F.col("len") - 1 <= F.length("word"))
        .withColumn("piece", F.expr("substring(word, st, len)"))
    )


def _vocab0_df(pieces: DataFrame) -> DataFrame:
    return (
        pieces.groupBy("piece")
        .agg(F.sum("cnt").cast("bigint").alias("pcount"))
        .filter(
            (F.col("pcount") >= MIN_PIECE_COUNT)
            | (F.length("piece") == 1)
        )
    )


@query(
    "viterbi_em_recount",
    f"""
    WITH {_SEG_CTES},
    used AS (
      SELECT u.piece,
             CAST(sum(w.cnt) AS BIGINT) AS used_count
      FROM (SELECT word, unnest(string_split(path, '|')) AS piece
            FROM seg) u
      JOIN wcnt w ON w.word = u.word
      GROUP BY u.piece
    )
    SELECT u.piece,
           v.pcount AS old_support,
           u.used_count,
           CAST(length(bin((SELECT sum(used_count) FROM used)
                           // u.used_count)) AS BIGINT) AS new_cost
    FROM used u JOIN vocab0 v ON v.piece = u.piece
    ORDER BY u.piece
    """,
)
def viterbi_em_recount(spark, sf_dir):
    """Hard-EM M-step of unigram-LM tokenizer training (Kudo 2018 §3
    — this variant recounts from the 1-best Viterbi segmentation
    rather than forward-backward expectations, the classic hard-EM
    simplification): every corpus word's chosen pieces are recounted
    weighted by word frequency, producing the updated vocabulary —
    pieces NEVER chosen by any segmentation drop out entirely (the
    EM pruning step that shrinks a seed vocabulary toward the final
    tokenizer), and each survivor gets its re-derived bit-length
    cost over the new usage mass. Output per surviving piece:
    substring-count support (round 0), usage count, new cost.

    Scale: one corpus-linear word count; the segmentation explode and
    recount run on the vocabulary-sized segmentation table with
    map-side-combined sums; the usage mass is a single-row scalar."""
    docs = load_table(spark, sf_dir, "documents")
    wcnt = _wcnt_df(docs)
    vocab0 = _vocab0_df(_pieces_df(wcnt))
    seg = _segments(spark, sf_dir)
    used = (
        seg.join(wcnt, "word")
        .select(
            "cnt",
            F.explode(F.split("path", r"\|")).alias("piece"),
        )
        .groupBy("piece")
        .agg(F.sum("cnt").cast("bigint").alias("used_count"))
    )
    nmass = used.agg(F.sum("used_count").alias("n2"))
    return (
        used.join(vocab0, "piece")
        .crossJoin(F.broadcast(nmass))
        .select(
            "piece",
            F.col("pcount").alias("old_support"),
            "used_count",
            F.length(F.bin(F.expr("div(n2, used_count)")))
            .cast("bigint")
            .alias("new_cost"),
        )
        .orderBy("piece")
    )
