"""Full unigram-EM training loop (queries/wordpiece.py EM section): a
pure-Python replay of the whole trajectory — seed costs, EM_ITERS ×
(Viterbi segment → hard-EM recount → prune → recost), final
segmentation — must reproduce Spark's trained vocabulary and final
segmentations exactly (a third engine beyond the DuckDB oracle), plus
loop invariants: singles always survive, vocabulary shrinks, every
word stays segmentable."""

from collections import Counter

from pyspark.sql import functions as F

from etl_mp_transactions_spark.queries.wordpiece import (
    EM_ITERS,
    KEEP_PCT,
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


def _viterbi(wcnt, cost):
    """Exact DP per word against an arbitrary cost table:
    (total_cost, lexicographically-smallest path)."""
    out = {}
    for w in wcnt:
        dp = [None] * (len(w) + 1)
        dp[0] = (0, "")
        for i in range(1, len(w) + 1):
            best = None
            for ln in range(1, min(MAX_PIECE_LEN, i) + 1):
                p = w[i - ln:i]
                if p not in cost or dp[i - ln] is None:
                    continue
                pc, pp = dp[i - ln]
                cand = (pc + cost[p], pp + "|" + p if pp else p)
                if best is None or cand < best:
                    best = cand
            dp[i] = best
        out[w] = dp[len(w)]
    return out


def _python_em(wcnt):
    """Literal replay of the EM loop's integer contract."""
    pieces = Counter()
    for w, c in wcnt.items():
        for st in range(len(w)):
            for ln in range(1, MAX_PIECE_LEN + 1):
                if st + ln <= len(w):
                    pieces[w[st:st + ln]] += c
    vocab0 = {
        p: c
        for p, c in pieces.items()
        if c >= MIN_PIECE_COUNT or len(p) == 1
    }
    singles = {p for p in vocab0 if len(p) == 1}
    cur = dict(vocab0)  # piece -> ucount
    for _ in range(EM_ITERS):
        n = sum(cur.values())
        cost = {p: len(bin(n // c)) - 2 for p, c in cur.items()}
        segs = _viterbi(wcnt, cost)
        used = Counter()
        for w, (_, path) in segs.items():
            for p in path.split("|"):
                used[p] += wcnt[w]
        multi = sorted(
            ((p, c) for p, c in used.items() if len(p) > 1),
            key=lambda x: (-x[1], x[0]),
        )
        nm = len(multi)
        kept = {
            p: c
            for rn, (p, c) in enumerate(multi, start=1)
            if rn * 100 <= nm * KEEP_PCT
        }
        for p in singles:
            kept[p] = max(used.get(p, 0), 1)
        cur = kept
    n = sum(cur.values())
    cost = {p: len(bin(n // c)) - 2 for p, c in cur.items()}
    return cur, cost, _viterbi(wcnt, cost)


def test_em_vocab_matches_python_trajectory(spark, sf_dir):
    wcnt = _word_counts(spark, sf_dir)
    ucount, cost, _ = _python_em(wcnt)
    rows = queries()["viterbi_em_vocab"](spark, sf_dir).collect()
    got_u = {r["piece"]: r["ucount"] for r in rows}
    got_c = {r["piece"]: r["pcost"] for r in rows}
    assert got_u == ucount
    assert got_c == cost


def test_em_segmentations_match_python_trajectory(spark, sf_dir):
    wcnt = _word_counts(spark, sf_dir)
    _, _, segs = _python_em(wcnt)
    got = {
        r["word"]: (r["total_cost"], r["segmentation"])
        for r in queries()["viterbi_em_train"](spark, sf_dir).collect()
    }
    assert got == segs


def test_em_invariants(spark, sf_dir):
    wcnt = _word_counts(spark, sf_dir)
    vocab_rows = queries()["viterbi_em_vocab"](spark, sf_dir).collect()
    seg_rows = queries()["viterbi_em_train"](spark, sf_dir).collect()
    trained = {r["piece"] for r in vocab_rows}
    # every single-char piece the corpus contains survives training
    seen_chars = {ch for w in wcnt for ch in w}
    assert seen_chars <= trained
    # the vocabulary SHRANK vs the substring-support seed
    seed_rows = queries()["viterbi_segment_vocab"](spark, sf_dir).collect()
    seed_pieces = set()
    for r in seed_rows:
        seed_pieces.update(r["segmentation"].split("|"))
    n_seed_vocab = len(
        {
            w[st:st + ln]
            for w, c in wcnt.items()
            for st in range(len(w))
            for ln in range(1, MAX_PIECE_LEN + 1)
            if st + ln <= len(w)
        }
    )
    assert len(trained) < n_seed_vocab
    # every word segmented, reconstruction holds, pieces ∈ vocab
    assert len(seg_rows) == len(wcnt)
    for r in seg_rows:
        parts = r["segmentation"].split("|")
        assert "".join(parts) == r["word"]
        assert all(p in trained for p in parts)
