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


from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from etl_mp_transactions_spark.queries.ivfpq_q import materialize_ctes
from etl_mp_transactions_spark.registry import query
from etl_mp_transactions_spark.sources.tables import load_table

MAX_WORD_LEN = 10
MAX_PIECE_LEN = 4
MIN_PIECE_COUNT = 2  # pieces below this support are dropped (len>1)
_SC_W = 8  # lpad width of the cost prefix in the DP key

# lpad silently TRUNCATES (identically in Spark and DuckDB) when the
# printed cost outgrows _SC_W digits — a silent wrong-argmin class the
# oracle cannot catch because both engines corrupt the same way. Pin
# the bound at import: per-piece cost = bit-length of (mass // pcount)
# <= 64, so the worst path cost is MAX_WORD_LEN * 64.
assert MAX_WORD_LEN * 64 < 10**_SC_W, (
    "DP cost can overflow the lpad width: raise _SC_W before raising "
    "MAX_WORD_LEN or changing the cost function"
)


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
    materialize_ctes(f"""
    WITH {_SEG_CTES}
    SELECT word,
           CAST(length(word) AS BIGINT) AS n_chars,
           path AS segmentation,
           cost AS total_cost,
           {_N_PIECES} AS n_pieces
    FROM seg
    ORDER BY word
    """),
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
    materialize_ctes(f"""
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
    """),
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
    table with substring-support costs — corpus-linear word count,
    then the _segments_from_vocab DP."""
    docs = load_table(spark, sf_dir, "documents")
    wcnt = _wcnt_df(docs)
    vocab0 = _vocab0_df(_pieces_df(wcnt))
    # single-row vocabulary mass (documented bounded scalar class —
    # the HITS max-scalar shape)
    nmass = vocab0.agg(F.sum("pcount").alias("n"))
    vocab = vocab0.crossJoin(F.broadcast(nmass)).select(
        "piece",
        F.length(F.bin(F.expr("div(n, pcount)"))).cast("bigint").alias(
            "pcost"
        ),
    )
    return _segments_from_vocab(spark, wcnt, vocab)


def _segments_from_vocab(
    spark, wcnt: DataFrame, vocab: DataFrame
) -> DataFrame:
    """(word, cost, path): the Viterbi DP against an ARBITRARY piece
    vocabulary (piece, pcost), as ONE expression-level DP.

    r15 optimization (guide §1.2 "the distributed algorithm" + §4
    "eliminate the Python boundary"): the previous shape unrolled
    MAX_WORD_LEN rounds of (hash join + grouped string-min), each cut
    with an RDD roundtrip + persist + count — ~22 blocking jobs PER
    segmentation, each crossing JVM→Python→JVM (the cut was needed
    because round i's plan references up to MAX_PIECE_LEN prior
    rounds, so uncut lineage grows ~4^rounds). The word-level DP is
    embarrassingly per-word, so the whole recurrence runs as a single
    `aggregate()` higher-order expression over end positions instead:
    per word, collect its (st, len, pcost, piece) candidates once
    (one hash join + one groupBy), then fold positions 1..MAX_WORD_LEN
    carrying the per-position best-state array. Zero extra jobs, zero
    Python crossings, no lineage growth — and the arithmetic is
    BIT-IDENTICAL: the same lpad(cost)‖'#'‖path string keys, the same
    binary-collation min (array_min == grouped min over the same
    candidate set), the same empty-path handling (prev pos 0 ⇔ st=1).
    Words longer than MAX_WORD_LEN fall out via try_element_at → NULL,
    exactly as they fell out of the old pos==length(word) join.

    The EM loop calls this once per training iteration; measured
    (sf0.1, solo): viterbi_em_train 27.7s → see OPTIMIZATION_r15.md.
    """
    pieces = _pieces_df(wcnt)
    cand = pieces.select("word", "st", "len", "piece").join(vocab, "piece")
    cands = cand.groupBy("word").agg(
        F.collect_list(F.struct("st", "len", "pcost", "piece")).alias("cs")
    )
    mk0 = "0" * _SC_W + "#"  # pos-0 sentinel: cost 0, empty path
    dp = f"""
      aggregate(
        sequence(1, {MAX_WORD_LEN}),
        array('{mk0}'),
        (acc, i) -> concat(acc, array(
          array_min(transform(
            filter(cs, c -> c.st + c.len - 1 = i
                        AND element_at(acc, c.st) IS NOT NULL),
            c -> concat(
              lpad(cast(cast(substring(element_at(acc, c.st), 1, {_SC_W})
                             AS BIGINT) + c.pcost AS STRING),
                   {_SC_W}, '0'),
              '#',
              CASE WHEN c.st = 1 THEN c.piece
                   ELSE concat(substring(element_at(acc, c.st),
                                         {_SC_W + 2}),
                               '|', c.piece) END)))))
      )"""
    return (
        cands.select(
            "word",
            F.expr(f"try_element_at({dp}, length(word) + 1)").alias("mk"),
        )
        .filter(F.col("mk").isNotNull())
        .select(
            "word",
            F.expr(f"cast(substring(mk, 1, {_SC_W}) as bigint)").alias(
                "cost"
            ),
            F.expr(f"substring(mk, {_SC_W + 2})").alias("path"),
        )
    )


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
    materialize_ctes(f"""
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
    """),
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


# ---------------------------------------------------------------------
# Full unigram-EM training loop (Kudo 2018 §3 complete): segment →
# hard-EM recount → prune toward a target vocabulary → recompute costs,
# repeated EM_ITERS times, then a final segmentation with the trained
# vocabulary. viterbi_segment_vocab/viterbi_em_recount above are ONE
# iteration of this loop; these queries run the whole training.
# Pruning keeps ALL single-char pieces (coverage: every word stays
# segmentable) plus the top KEEP_PCT% of multi-char pieces by
# (usage DESC, piece ASC) — the deterministic integer surrogate of
# Kudo's likelihood-loss pruning. Unused singles carry usage
# max(used, 1) so their cost stays defined (the real model's epsilon
# floor). Every quantity is an exact integer, so DuckDB replays all
# EM_ITERS + 1 unrolled DPs bit-for-bit.

EM_ITERS = 2
KEEP_PCT = 60  # multi-char pieces surviving each prune round


def _round_sql_g(s: str, i: int) -> str:
    """_round_sql with suffixed CTE names (cand_{s}, b{s}_{i}) so
    several DPs — one per EM iteration — coexist in one statement."""
    js = range(max(0, i - MAX_PIECE_LEN), i)
    prev = " UNION ALL ".join(f"SELECT * FROM b{s}_{j}" for j in js)
    return f"""
    b{s}_{i} AS MATERIALIZED (
      SELECT word, {i} AS pos,
             CAST(substr(mk, 1, {_SC_W}) AS BIGINT) AS cost,
             substr(mk, {_SC_W + 2}) AS path
      FROM (
        SELECT c.word,
               min(lpad(CAST(p.cost + c.pcost AS VARCHAR), {_SC_W}, '0')
                   || '#'
                   || CASE WHEN p.path = '' THEN c.piece
                           ELSE p.path || '|' || c.piece END) AS mk
        FROM cand_{s} c
        JOIN ({prev}) p
          ON p.word = c.word AND p.pos = c.st - 1
        WHERE c.st + c.len - 1 = {i}
        GROUP BY c.word
      )
    )"""


def _dp_ctes(s: str, vocab_cte: str) -> str:
    """One full Viterbi DP (cand → b{s}_0..b{s}_N → seg_{s}) against
    the pieces of ``vocab_cte`` (piece, pcost)."""
    rounds = ",".join(_round_sql_g(s, i) for i in range(1, MAX_WORD_LEN + 1))
    ball = " UNION ALL ".join(
        f"SELECT * FROM b{s}_{i}" for i in range(1, MAX_WORD_LEN + 1)
    )
    return f"""cand_{s} AS MATERIALIZED (
      SELECT w.word, pos.st, plen.len, v.piece, v.pcost
      FROM wcnt w CROSS JOIN pos CROSS JOIN plen
      JOIN {vocab_cte} v ON v.piece = substr(w.word, pos.st, plen.len)
      WHERE pos.st + plen.len - 1 <= length(w.word)
    ),
    b{s}_0 AS (SELECT word, 0 AS pos, CAST(0 AS BIGINT) AS cost, '' AS path
               FROM wcnt),{rounds},
    ball_{s} AS ({ball}),
    seg_{s} AS (
      SELECT b.word, b.cost, b.path
      FROM ball_{s} b JOIN wcnt w
        ON w.word = b.word AND b.pos = length(w.word)
    )"""


def _em_step_ctes(t: int) -> str:
    """EM iteration t: recount from seg_{t}, prune, recompute costs
    into v{t + 1}c (the vocab the NEXT DP runs against)."""
    return f"""used_{t} AS MATERIALIZED (
      SELECT u.piece, CAST(sum(w.cnt) AS BIGINT) AS ucount
      FROM (SELECT word, unnest(string_split(path, '|')) AS piece
            FROM seg_{t}) u
      JOIN wcnt w ON w.word = u.word
      GROUP BY u.piece
    ),
    kept_{t} AS MATERIALIZED (
      SELECT piece, ucount FROM (
        SELECT s.piece, s.ucount,
               row_number() OVER (ORDER BY s.ucount DESC, s.piece) AS rn,
               (SELECT count(*) FROM used_{t}
                WHERE length(piece) > 1) AS nm
        FROM used_{t} s WHERE length(s.piece) > 1)
      WHERE rn * 100 <= nm * {KEEP_PCT}
      UNION ALL
      SELECT v.piece,
             greatest(coalesce(u.ucount, CAST(0 AS BIGINT)),
                      CAST(1 AS BIGINT)) AS ucount
      FROM (SELECT piece FROM vocab0 WHERE length(piece) = 1) v
      LEFT JOIN used_{t} u USING (piece)
    ),
    v{t + 1}c AS MATERIALIZED (
      SELECT piece, ucount,
             CAST(length(bin((SELECT sum(ucount) FROM kept_{t})
                             // ucount)) AS BIGINT) AS pcost
      FROM kept_{t}
    )"""


def _em_ctes() -> str:
    """The full training chain: v1c = substring-support costs, then
    EM_ITERS × (DP against v{t}c → recount → prune → v{t+1}c), then
    the FINAL DP (seg_{EM_ITERS + 1}) against the trained vocab."""
    parts = [
        _BASE_CTES.rstrip().rstrip(","),
        f"""v1c AS MATERIALIZED (
      SELECT piece, pcount AS ucount,
             CAST(length(bin((SELECT sum(pcount) FROM vocab0) // pcount))
                  AS BIGINT) AS pcost
      FROM vocab0
    )""",
    ]
    for t in range(1, EM_ITERS + 1):
        parts.append(_dp_ctes(str(t), f"v{t}c"))
        parts.append(_em_step_ctes(t))
    parts.append(_dp_ctes(str(EM_ITERS + 1), f"v{EM_ITERS + 1}c"))
    return ",".join(parts)


_EM_CTES = _em_ctes()


def _costify(kept: DataFrame) -> DataFrame:
    """(piece, ucount, pcost): bit-length inverse-frequency costs over
    the kept mass (single-row scalar crossJoin — the HITS shape)."""
    nmass = kept.agg(F.sum("ucount").alias("n"))
    return kept.crossJoin(F.broadcast(nmass)).select(
        "piece",
        "ucount",
        F.length(F.bin(F.expr("div(n, ucount)"))).cast("bigint").alias(
            "pcost"
        ),
    )


def _recount_df(seg: DataFrame, wcnt: DataFrame) -> DataFrame:
    return (
        seg.join(wcnt, "word")
        .select("cnt", F.explode(F.split("path", r"\|")).alias("piece"))
        .groupBy("piece")
        .agg(F.sum("cnt").cast("bigint").alias("ucount"))
    )


def _prune_df(used: DataFrame, vocab0: DataFrame) -> DataFrame:
    """Keep top KEEP_PCT% multi-char pieces by (usage DESC, piece ASC)
    plus every single (usage floored at 1). The rank window is global
    but runs on the VOCABULARY-sized table (bounded-table class)."""
    from pyspark.sql.window import Window

    multi = used.filter(F.length("piece") > 1)
    w = Window.orderBy(F.col("ucount").desc(), "piece")
    nm = multi.agg((F.count("*") * KEEP_PCT).alias("thr"))
    kept_multi = (
        multi.withColumn("rn", F.row_number().over(w))
        .crossJoin(F.broadcast(nm))
        .filter(F.col("rn") * 100 <= F.col("thr"))
        .select("piece", "ucount")
    )
    singles = (
        vocab0.filter(F.length("piece") == 1)
        .select("piece")
        .join(used, "piece", "left")
        .select(
            "piece",
            F.greatest(
                F.coalesce(F.col("ucount"), F.lit(0).cast("bigint")),
                F.lit(1).cast("bigint"),
            ).alias("ucount"),
        )
    )
    return kept_multi.unionAll(singles)


def _em_trained(spark, sf_dir) -> tuple[DataFrame, DataFrame, DataFrame]:
    """(final_vocab, final_seg, wcnt) after EM_ITERS train rounds +
    the final segmentation pass."""
    docs = load_table(spark, sf_dir, "documents")
    wcnt = _wcnt_df(docs)
    vocab0 = _vocab0_df(_pieces_df(wcnt))
    cur = _costify(
        vocab0.select("piece", F.col("pcount").alias("ucount"))
    ).localCheckpoint(eager=True)
    for _ in range(EM_ITERS):
        seg = _segments_from_vocab(spark, wcnt, cur.select("piece", "pcost"))
        used = _recount_df(seg, wcnt)
        cur = _costify(_prune_df(used, vocab0)).localCheckpoint(eager=True)
    final_seg = _segments_from_vocab(
        spark, wcnt, cur.select("piece", "pcost")
    )
    return cur, final_seg, wcnt


@query(
    "viterbi_em_vocab",
    materialize_ctes(f"""
    WITH {_EM_CTES}
    SELECT piece, ucount, pcost,
           CAST(length(piece) AS BIGINT) AS piece_len
    FROM v{EM_ITERS + 1}c
    ORDER BY piece
    """),
)
def viterbi_em_vocab(spark, sf_dir):
    """The TRAINED unigram vocabulary after {EM_ITERS} full EM rounds
    (module EM section): per surviving piece, its hard-EM usage mass,
    its re-derived bit-length cost, and its length. This is the
    Kudo-2018 training loop completed — viterbi_em_recount is one
    M-step of it; here segment→recount→prune→recost chains until the
    vocabulary shrinks toward the target (KEEP_PCT={KEEP_PCT}%% of
    multi-char pieces per round, singles always kept)."""
    cur, _, _ = _em_trained(spark, sf_dir)
    return cur.select(
        "piece",
        "ucount",
        "pcost",
        F.length("piece").cast("bigint").alias("piece_len"),
    ).orderBy("piece")


@query(
    "viterbi_em_train",
    materialize_ctes(f"""
    WITH {_EM_CTES}
    SELECT word,
           path AS segmentation,
           cost AS total_cost,
           {_N_PIECES} AS n_pieces
    FROM seg_{EM_ITERS + 1}
    ORDER BY word
    """),
)
def viterbi_em_train(spark, sf_dir):
    """Full unigram-EM tokenizer training (Kudo 2018 §3 complete,
    VERDICT r9 task #3): {EM_ITERS} rounds of Viterbi-segment →
    hard-EM recount → prune-to-target → recost, then every distinct
    corpus word segmented through the TRAINED vocabulary. Exact
    integer end-to-end — the oracle replays all {EM_ITERS + 1}
    unrolled DPs; a python trajectory replay cross-checks the loop in
    tests/test_wordpiece_em.py. Scale: one corpus-linear word count,
    then everything runs on the distinct-word/vocabulary tables (the
    _segments shape, {EM_ITERS + 1}×)."""
    _, final_seg, _ = _em_trained(spark, sf_dir)
    return final_seg.select(
        "word",
        F.col("path").alias("segmentation"),
        F.col("cost").alias("total_cost"),
        F.expr(_N_PIECES).alias("n_pieces"),
    ).orderBy("word")


@query(
    "viterbi_em_tokenize_docs",
    materialize_ctes(f"""
    WITH {_EM_CTES},
    segn AS (
      SELECT word, cost, {_N_PIECES} AS np
      FROM seg_{EM_ITERS + 1}
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
    """),
)
def viterbi_em_tokenize_docs(spark, sf_dir):
    """Tokenize every document through the EM-TRAINED vocabulary —
    the deployment step of the training loop (viterbi_tokenize_docs
    uses the round-0 substring-support costs; this uses the
    vocabulary after {EM_ITERS} EM rounds, i.e. what the trained
    tokenizer actually emits): per document, word count, total
    subword pieces, and total encoding cost under the trained model.
    Same corpus-linear shape — the trained segmentation table joins
    on word (shuffle hash join), per-doc sums map-side combined."""
    docs = load_table(spark, sf_dir, "documents")
    _, final_seg, _ = _em_trained(spark, sf_dir)
    segn = final_seg.select(
        "word", "cost", F.expr(_N_PIECES).alias("np")
    )
    docw = (
        docs.select(
            "doc_id", F.explode(F.split("text", " ")).alias("word")
        )
        .filter(F.col("word") != "")
    )
    return (
        docw.join(segn, "word")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("bigint").alias("n_words"),
            F.sum("np").cast("bigint").alias("n_pieces"),
            F.sum("cost").cast("bigint").alias("cost_sum"),
        )
        .orderBy("doc_id")
    )
