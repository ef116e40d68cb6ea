"""Greedy WordPiece segmentation (queries/wordpiece_greedy.py): a
pure-python longest-match-first replay with the positional
(initial/continuation) vocabulary must reproduce Spark's output
exactly, plus reconstruction and greedy-definition invariants."""

from collections import Counter

from pyspark.sql import functions as F

from etl_mp_transactions_spark.queries.wordpiece import (
    MAX_PIECE_LEN,
    MIN_PIECE_COUNT,
)
from etl_mp_transactions_spark.registry import queries
from etl_mp_transactions_spark.sources.tables import load_table


def _word_counts(spark, sf_dir):
    rows = (
        load_table(spark, sf_dir, "documents")
        .select(F.explode(F.split("text", " ")).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .count()
        .collect()
    )
    return {r["word"]: r["count"] for r in rows}


def _vocabs(wcnt):
    init, cont = Counter(), Counter()
    for w, c in wcnt.items():
        for st in range(len(w)):
            for ln in range(1, MAX_PIECE_LEN + 1):
                if st + ln <= len(w):
                    p = w[st:st + ln]
                    (init if st == 0 else cont)[p] += c
    vi = {p for p, c in init.items() if c >= MIN_PIECE_COUNT or len(p) == 1}
    vc = {p for p, c in cont.items() if c >= MIN_PIECE_COUNT or len(p) == 1}
    return vi, vc


def _greedy(word, vi, vc):
    pos, parts = 0, []
    while pos < len(word):
        vocab = vi if pos == 0 else vc
        ln = min(MAX_PIECE_LEN, len(word) - pos)
        while ln >= 1 and word[pos:pos + ln] not in vocab:
            ln -= 1
        assert ln >= 1, (word, pos)
        parts.append(
            word[pos:pos + ln] if pos == 0 else "##" + word[pos:pos + ln]
        )
        pos += ln
    return "|".join(parts)


def test_matches_python_greedy_replay(spark, sf_dir):
    wcnt = _word_counts(spark, sf_dir)
    vi, vc = _vocabs(wcnt)
    want = {w: _greedy(w, vi, vc) for w in wcnt}
    rows = queries()["wordpiece_greedy_segment"](spark, sf_dir).collect()
    got = {r["word"]: r["segmentation"] for r in rows}
    assert got == want
    for r in rows:
        parts = r["segmentation"].split("|")
        assert r["n_pieces"] == len(parts)
        assert r["n_continuations"] == sum(
            1 for p in parts if p.startswith("##")
        )
        # reconstruction: strip continuation markers
        assert "".join(p.lstrip("#") if i else p
                       for i, p in enumerate(parts)) == r["word"]
        # greedy definition: first piece is the longest vi-prefix
        first = parts[0]
        for ln in range(len(first) + 1, MAX_PIECE_LEN + 1):
            if ln <= len(r["word"]):
                assert r["word"][:ln] not in vi
